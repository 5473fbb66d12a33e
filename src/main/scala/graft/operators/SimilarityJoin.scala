package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.config._
import graft.core._

/** join.similar — similarity JOIN between two tables (training-data
  * extension; the reference has no joins at all). The canonical use is
  * benchmark DECONTAMINATION: `mode = "anti"` keeps only the left
  * (training) documents that near-match NO right (benchmark) document —
  * the contamination filter every serious pre-training pipeline runs.
  * `semi` keeps the matching rows instead (overlap audit), `pairs` emits
  * (left_id, right_id, score) for inspection.
  *
  * Methods:
  *  - `minhash` (text): word-shingle MinHash signatures on BOTH sides,
  *    LSH band join (candidates only from equal (band, band-hash)
  *    buckets — the two corpora are never cross-joined), signature-
  *    agreement prefilter, exact-Jaccard verify at `threshold`.
  *  - `embedding` (vectors): hyperplane signatures, pigeonhole block
  *    join, exact-cosine verify. `blocking = "bands"` switches to banded
  *    LSH (independent `bands` × `band_planes`-bit signatures, candidate
  *    on exact band agreement) — the corpus-scale blocking, see
  *    dedup.embedding.
  *
  * Scale shape mirrors the dedup family (same helpers): each side is
  * exact-collapsed to distinct-content representatives first, so g
  * copies of boilerplate on the left × h on the right cost one
  * representative pair instead of g·h bucket pairs; matches expand back
  * through the (id → representative) mapping afterwards. The banded join
  * carries only (id, sig) — shingle arrays / vectors re-join by id for
  * the surviving candidates.
  */
object SimilarJoinOp extends Stage {
  val name = "join.similar"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val left = ctx.input(0)
    val right = ctx.input(1)
    val mode = cfg.strOr("mode", "pairs") match {
      case ok @ ("pairs" | "semi" | "anti") => ok
      case other => throw new GraftConfigError(s"join.similar mode must be pairs|semi|anti, got '$other'")
    }
    val leftId = cfg.strOr("left_id", cfg.strOr("id_column", "id"))
    val rightId = cfg.strOr("right_id", cfg.strOr("id_column", "id"))

    val pairs = cfg.strOr("method", "minhash") match {
      case "minhash"   => minhashPairs(ctx, left, right, leftId, rightId)
      case "embedding" => embeddingPairs(ctx, left, right, leftId, rightId)
      case other => throw new GraftConfigError(s"join.similar method must be minhash|embedding, got '$other'")
    }

    mode match {
      case "pairs" => pairs
      case "semi" | "anti" =>
        val matched = pairs.select(F.col("left_id")).distinct()
        left.join(matched, left(leftId) === matched("left_id"),
          if (mode == "semi") "left_semi" else "left_anti")
    }
  }

  /** (representatives (id, key), mapping (orig id → representative id)) —
    * one content-key shuffle, persisted because reps and mapping both
    * filter it. */
  private def collapse(df: DataFrame, id: String, key: Column,
      release: (() => Unit) => Unit): (DataFrame, DataFrame) = {
    val keyed = df.select(F.col(id).alias("id"), key.alias("_key"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_key")
    val withRep = StageContext.pinWith(release, keyed.withColumn("_rep", F.min("id").over(w)))
    val reps = withRep.filter(F.col("id") === F.col("_rep")).select("id", "_key")
    val mapping = withRep.select(F.col("id").alias("orig_id"), F.col("_rep").alias("rep_id"))
    (reps, mapping)
  }

  /** Expand representative-level pairs back to original ids. */
  private def expand(repPairs: DataFrame, mapL: DataFrame, mapR: DataFrame,
      score: String): DataFrame =
    repPairs
      .join(mapL, repPairs("rep_l") === mapL("rep_id"))
      .select(F.col("orig_id").alias("left_id"), F.col("rep_r"), F.col(score))
      .join(mapR, F.col("rep_r") === mapR("rep_id"))
      .select(F.col("left_id"), F.col("orig_id").alias("right_id"), F.col(score))

  private def minhashPairs(ctx: StageContext, left: DataFrame, right: DataFrame,
      leftId: String, rightId: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
    val cfg = ctx.cfg
    val leftText = cfg.strOr("left_text", cfg.strOr("text_column", "text"))
    val rightText = cfg.strOr("right_text", cfg.strOr("text_column", "text"))
    val n = cfg.longOr("shingle_size", 3L).toInt
    val k = cfg.longOr("num_hashes", 128L).toInt
    val bands = cfg.longOr("bands", 32L).toInt
    val threshold = cfg.doubleOr("threshold", 0.8)
    val seed = cfg.longOr("seed", 42L)
    if (k % bands != 0) throw new GraftConfigError(s"num_hashes=$k must divide evenly into bands=$bands")
    val r = k / bands

    def prepare(df: DataFrame, id: String, text: String) = {
      val (reps, mapping) = collapse(df, id, F.col(text), ctx.deferToCleanup)
      val hashed = ctx.pin(reps.select(F.col("id"),
          Shingles.shingleHashes(F.col("_key"), n).alias("shingles"))
        .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), k, seed)))
      (hashed, mapping)
    }
    val (hl, mapL) = prepare(left, leftId, leftText)
    val (hr, mapR) = prepare(right, rightId, rightText)

    def banded(hashed: DataFrame, side: String) =
      hashed.select(F.col("id").alias(s"rep_$side"), F.col("sig").alias(s"sig_$side"),
        F.posexplode(F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
          b => F.xxhash64(F.concat_ws("_", F.slice(F.col("sig"), b * F.lit(r) + 1, F.lit(r)))))))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")

    val agreement = F.aggregate(
      F.zip_with(F.col("sig_l"), F.col("sig_r"), (x, y) => F.when(x === y, 1).otherwise(0)),
      F.lit(0), (acc, v) => acc + v).cast("double") / k

    val candidates = banded(hl, "l").join(banded(hr, "r"), Seq("band_idx", "band_hash"))
      .dropDuplicates("rep_l", "rep_r")
      .filter(agreement >= math.max(0.0, threshold - 0.3))
      .select("rep_l", "rep_r")

    val verified = candidates
      .join(hl.select(F.col("id").alias("rep_l"), F.col("shingles").alias("sh_l")), "rep_l")
      .join(hr.select(F.col("id").alias("rep_r"), F.col("shingles").alias("sh_r")), "rep_r")
      .withColumn("jaccard", F.call_function("jaccard_sim", F.col("sh_l"), F.col("sh_r")))
      .filter(F.col("jaccard") >= threshold)
      .select("rep_l", "rep_r", "jaccard")

    expand(verified, mapL, mapR, "jaccard")
  }

  private def embeddingPairs(ctx: StageContext, left: DataFrame, right: DataFrame,
      leftId: String, rightId: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
    val cfg = ctx.cfg
    val leftVec = cfg.strOr("left_vector", cfg.strOr("vector_column", "embedding"))
    val rightVec = cfg.strOr("right_vector", cfg.strOr("vector_column", "embedding"))
    val threshold = cfg.doubleOr("threshold", 0.9)
    val planes = cfg.longOr("planes", 32L).toInt
    val blocks = cfg.longOr("blocks", 4L).toInt
    val seed = cfg.longOr("seed", 42L)
    val banded = cfg.strOr("blocking", "pigeonhole") match {
      case "pigeonhole" => false
      case "bands"      => true
      case other => throw new GraftConfigError(
        s"join.similar: blocking must be pigeonhole|bands, got '$other'")
    }
    // planes/blocks only shape the pigeonhole layout; a leftover pigeonhole
    // value must not reject a banded config that never uses it
    if (!banded && planes % blocks != 0)
      throw new GraftConfigError(s"planes=$planes must divide evenly into blocks=$blocks")
    val bits = if (banded) 0 else planes / blocks
    val nBands = cfg.longOr("bands", 16L).toInt
    val bandR = cfg.longOr("band_planes", 16L).toInt
    if (banded && nBands < 1) throw new GraftConfigError(
      s"join.similar: bands must be >= 1, got $nBands")
    if (banded && (bandR < 1 || bandR > 63)) throw new GraftConfigError(
      s"join.similar: band_planes must be in [1, 63], got $bandR")
    val dimL = vecDim(left, leftVec)
    val dimR = vecDim(right, rightVec)
    if (dimL != dimR)
      throw new GraftConfigError(s"embedding dims differ: left $dimL vs right $dimR")

    // content key for exact collapse = the vector itself (distinct vectors)
    def prepare(df: DataFrame, id: String, vec: String) = {
      val (reps, mapping) = collapse(df, id, F.col(vec).cast("array<float>"), ctx.deferToCleanup)
      val keyed = reps.select(F.col("id"), F.col("_key").alias("vec"))
      val sigged = ctx.pin(
        if (banded) keyed.withColumn("bsig",
          DedupEmbeddingOp.bandSignatures(F.col("vec"), dimL, nBands, bandR, seed))
        else keyed.withColumn("sig",
          DedupEmbeddingOp.hyperplaneSig(F.col("vec"), dimL, planes, seed)))
      (sigged, mapping)
    }
    val (sl, mapL) = prepare(left, leftId, leftVec)
    val (sr, mapR) = prepare(right, rightId, rightVec)

    def blocked(sigged: DataFrame, side: String) =
      sigged.select(F.col("id").alias(s"rep_$side"),
        if (banded) F.posexplode(F.col("bsig"))
        else F.posexplode(F.array((0 until blocks).map(b =>
          F.shiftrightunsigned(F.col("sig"), b * bits)
            .bitwiseAND(F.lit((1L << bits) - 1))): _*)))
        .withColumnRenamed("pos", "block_idx").withColumnRenamed("col", "block_val")

    val candidates = blocked(sl, "l").join(blocked(sr, "r"), Seq("block_idx", "block_val"))
      .dropDuplicates("rep_l", "rep_r")
      .select("rep_l", "rep_r")

    val verified = candidates
      .join(sl.select(F.col("id").alias("rep_l"), F.col("vec").alias("v_l")), "rep_l")
      .join(sr.select(F.col("id").alias("rep_r"), F.col("vec").alias("v_r")), "rep_r")
      .withColumn("cosine",
        DedupEmbeddingOp.cosine(F.col("v_l").cast("array<double>"), F.col("v_r").cast("array<double>")))
      .filter(F.col("cosine") >= threshold)
      .select("rep_l", "rep_r", "cosine")

    expand(verified, mapL, mapR, "cosine")
  }

  private def vecDim(df: DataFrame, vec: String): Int = {
    val head = df.select(F.size(F.col(vec))).head()
    if (head.isNullAt(0)) throw new GraftConfigError(s"join.similar: vector column '$vec' is empty")
    head.getInt(0)
  }
}
