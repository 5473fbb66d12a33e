package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types.LongType
import graft.config._
import graft.core._

/** Shared text→shingle machinery for the dedup family. Everything is
  * native Spark SQL functions (codegen'd, no UDFs in the hot path):
  * tokens → word n-gram shingles → xxhash64 shingle hashes.
  */
object Shingles {
  /** lowercase, collapse whitespace, split to words */
  def tokens(text: Column): Column =
    F.split(F.trim(F.regexp_replace(F.lower(text), "\\s+", " ")), " ")

  /** word n-gram shingles as strings: transform over a sequence of offsets */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks)))
      .otherwise(
        F.transform(
          F.sequence(F.lit(0), F.size(toks) - n),
          i => F.concat_ws(" ", F.slice(toks, i + 1, F.lit(n)))))
  }

  /** distinct xxhash64 of each shingle */
  def shingleHashes(text: Column, n: Int): Column =
    F.array_distinct(F.transform(wordShingles(text, n), s => F.xxhash64(s)))

  /** MinHash signature: k universal-hash permutations h_i(x)=(a_i*x+b_i) mod p,
    * signature[i] = min over shingle hashes. Coefficients are seeded —
    * deterministic across runs/executors. p = 2^31-1 (Mersenne) keeps
    * a*x < 2^62: no long overflow under Spark 4's default ANSI mode. */
  final val MersennePrime = 2147483647L // 2^31 - 1
  def minhashCoefficients(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
                 math.abs(rnd.nextLong()) % MersennePrime))
  }
  def minhashSignature(hashes: Column, k: Int, seed: Long): Column = {
    val coeffs = minhashCoefficients(k, seed)
    val p = F.lit(MersennePrime)
    F.array(coeffs.map { case (a, b) =>
      F.array_min(F.transform(hashes,
        x => F.pmod(F.pmod(x, p) * F.lit(a) + F.lit(b), p)))
    }: _*)
  }
}

/** dedup.exact — exact duplicate removal by hash-groupBy on content columns
  * (training-data extension). `keep` = any (dropDuplicates, map-side
  * partial-agg — the cheapest) | first/last by `order_by` (window, one
  * shuffle). At 100 TB: one shuffle on a 64-bit content hash, no sort.
  */
object DedupExactOp extends Stage {
  val name = "dedup.exact"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val df = ctx.primary
    val cols = ctx.cfg.strListOr("columns", df.columns.toVector)
    ctx.cfg.strOr("keep", "any") match {
      case "any" => df.dropDuplicates(cols)
      case keep @ ("first" | "last") =>
        val orderBy = ctx.cfg.strList("order_by") // required for determinism
        val ord = if (keep == "last") orderBy.map(F.col(_).desc) else orderBy.map(F.col(_).asc)
        val w = Window.partitionBy(cols.map(F.col): _*).orderBy(ord: _*)
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") === 1).drop("_rn")
      case other => throw new GraftConfigError(s"unknown keep '$other'")
    }
  }
}

/** dedup.minhash — near-duplicate removal via MinHash + LSH banding
  * (training-data extension; the standard web-scale text-dedup pipeline):
  *
  *   shingle(n words) → xxhash64 → minhash signature (k) → b bands of r
  *   rows → band-bucket self-join (candidates) → exact Jaccard verify on
  *   shingle sets → drop the higher-id doc of each verified pair.
  *
  * Scale: candidates come only from equal (band_idx, band_hash) buckets —
  * the self-join shuffles on the band key, never crossing the full corpus.
  * Signature/banding are pure native exprs (codegen). Verification joins
  * shingle arrays only for candidate pairs. One documented approximation:
  * duplicate CLUSTERS are resolved pair-wise (no transitive closure) —
  * a doc is dropped if it near-matches ANY lower-id doc.
  *
  * Config: id_column, text_column, shingle_size=3, num_hashes=128,
  * bands=32, threshold=0.8 (Jaccard).
  */
object DedupMinHashOp extends Stage {
  val name = "dedup.minhash"
  val kind = StageKind.Transform

  /** ids to drop (one column `id`) — exposed for tests/metrics. */
  def duplicateIds(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val id = cfg.str("id_column")
    val text = cfg.str("text_column")
    val n = cfg.longOr("shingle_size", 3L).toInt
    val k = cfg.longOr("num_hashes", 128L).toInt
    val bands = cfg.longOr("bands", 32L).toInt
    val threshold = cfg.doubleOr("threshold", 0.8)
    val seed = cfg.longOr("seed", 42L)
    if (k % bands != 0) throw new GraftConfigError(s"num_hashes=$k must divide evenly into bands=$bands")
    val r = k / bands

    val df = ctx.primary
    val hashed = df.select(F.col(id).alias("id"),
        Shingles.shingleHashes(F.col(text), n).alias("shingles"))
      .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), k, seed))

    // explode signature into b band hashes
    val banded = hashed.select(F.col("id"), F.col("shingles"),
      F.posexplode(F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
        b => F.xxhash64(F.concat_ws("_", F.slice(F.col("sig"), b * F.lit(r) + 1, F.lit(r)))))))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")

    val lhs = banded.select(F.col("band_idx"), F.col("band_hash"),
      F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    val rhs = banded.select(F.col("band_idx"), F.col("band_hash"),
      F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))

    val candidates = lhs.join(rhs, Seq("band_idx", "band_hash"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    val verified = candidates.withColumn("jaccard",
        F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double") /
        F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))))
      .filter(F.col("jaccard") >= threshold)

    verified.select(F.col("id_b").alias("id")).distinct()
  }

  def apply(ctx: StageContext): DataFrame = {
    val id = ctx.cfg.str("id_column")
    val dups = duplicateIds(ctx)
    ctx.primary.join(F.broadcast(dups), ctx.primary(id) === dups("id"), "left_anti")
  }
}

/** dedup.simhash — near-dup removal via 64-bit SimHash + Hamming-distance
  * LSH (training-data extension). SimHash bit j = sign of Σ tokens
  * (weight +1/-1 by token-hash bit j). Pigeonhole blocking: split 64 bits
  * into (maxDistance+1) blocks — two docs within hamming d share at least
  * one exact block → candidates come from equal-block buckets only.
  * Verify with bit_count(xor) <= d. All native exprs except the signature
  * fold (one scalar UDF per doc — cheap, not per-pair).
  */
object DedupSimHashOp extends Stage {
  val name = "dedup.simhash"
  val kind = StageKind.Transform

  private val simhashUdf = F.udf { toks: Seq[String] =>
    val counts = new Array[Int](64)
    toks.foreach { t =>
      // xxhash-free stable 64-bit string hash (FNV-1a)
      var h = 0xcbf29ce484222325L
      t.foreach { c => h ^= c.toLong; h *= 0x100000001b3L }
      var j = 0
      while (j < 64) { if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1; j += 1 }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  def withSignature(df: DataFrame, id: String, text: String): DataFrame =
    df.select(F.col(id).alias("id"), simhashUdf(Shingles.tokens(F.col(text))).alias("sig"))

  def duplicateIds(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val id = cfg.str("id_column")
    val text = cfg.str("text_column")
    val maxDist = cfg.longOr("max_distance", 3L).toInt
    val blocks = maxDist + 1
    val width = 64 / blocks

    val sigs = withSignature(ctx.primary, id, text)
    // block j = bits [j*width, (j+1)*width) (last block takes the remainder)
    val blocked = sigs.select(F.col("id"), F.col("sig"),
      F.posexplode(F.array((0 until blocks).map { j =>
        val w = if (j == blocks - 1) 64 - j * width else width
        F.shiftrightunsigned(F.col("sig"), j * width)
          .bitwiseAND(F.lit(if (w == 64) -1L else (1L << w) - 1L))
      }: _*)))
      .withColumnRenamed("pos", "block_idx").withColumnRenamed("col", "block_val")

    val lhs = blocked.select(F.col("block_idx"), F.col("block_val"), F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    val rhs = blocked.select(F.col("block_idx"), F.col("block_val"), F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    lhs.join(rhs, Seq("block_idx", "block_val"))
      .filter(F.col("id_a") < F.col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .filter(F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= maxDist)
      .select(F.col("id_b").alias("id")).distinct()
  }

  def apply(ctx: StageContext): DataFrame = {
    val id = ctx.cfg.str("id_column")
    val dups = duplicateIds(ctx)
    ctx.primary.join(F.broadcast(dups), ctx.primary(id) === dups("id"), "left_anti")
  }
}

/** dedup.ngram — n-gram Jaccard near-dup removal. Candidate generation
  * reuses a SMALL minhash signature purely for blocking (bands of the
  * full corpus never cross-join); verification is the EXACT n-gram Jaccard.
  * Differs from dedup.minhash in that the verify set is character n-grams
  * (robust to word-boundary edits) and the threshold applies to the exact
  * similarity, making blocking purely a recall knob.
  */
object DedupNgramOp extends Stage {
  val name = "dedup.ngram"
  val kind = StageKind.Transform

  /** character n-gram hashes of normalized text (dynamic substring position
    * requires the SQL-expr form of transform). */
  def charNgramHashes(textCol: String, n: Int): Column =
    F.expr(s"array_distinct(transform(" +
      s"sequence(1, greatest(1, length(regexp_replace(lower($textCol), '\\\\s+', ' ')) - ${n - 1})), " +
      s"i -> xxhash64(substring(regexp_replace(lower($textCol), '\\\\s+', ' '), i, $n))))")

  def duplicateIds(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val id = cfg.str("id_column")
    val text = cfg.str("text_column")
    val n = cfg.longOr("ngram_size", 5L).toInt
    val threshold = cfg.doubleOr("threshold", 0.7)
    val bands = cfg.longOr("bands", 16L).toInt
    val r = 2
    val seed = cfg.longOr("seed", 7L)

    val withGrams = ctx.primary.select(F.col(id).alias("id"),
      charNgramHashes(text, n).alias("grams"))

    val sig = Shingles.minhashSignature(F.col("grams"), bands * r, seed)
    val banded = withGrams.withColumn("sig", sig)
      .select(F.col("id"), F.col("grams"),
        F.posexplode(F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
          b => F.xxhash64(F.concat_ws("_", F.slice(F.col("sig"), b * F.lit(r) + 1, F.lit(r)))))))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")

    val lhs = banded.select(F.col("band_idx"), F.col("band_hash"), F.col("id").alias("id_a"), F.col("grams").alias("g_a"))
    val rhs = banded.select(F.col("band_idx"), F.col("band_hash"), F.col("id").alias("id_b"), F.col("grams").alias("g_b"))
    lhs.join(rhs, Seq("band_idx", "band_hash"))
      .filter(F.col("id_a") < F.col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("g_a"), F.col("g_b"))).cast("double") /
        F.size(F.array_union(F.col("g_a"), F.col("g_b"))))
      .filter(F.col("jaccard") >= threshold)
      .select(F.col("id_b").alias("id")).distinct()
  }

  def apply(ctx: StageContext): DataFrame = {
    val id = ctx.cfg.str("id_column")
    val dups = duplicateIds(ctx)
    ctx.primary.join(F.broadcast(dups), ctx.primary(id) === dups("id"), "left_anti")
  }
}

/** dedup.embedding — near-dup removal by embedding cosine similarity
  * (training-data extension). Candidates via random-hyperplane LSH (h
  * seeded hyperplanes → h-bit signature → bucket join on signature
  * prefix-blocks, pigeonhole like simhash); verify exact cosine ≥
  * threshold; drop higher id. Dot products are native
  * aggregate(zip_with(...)) — no UDF.
  */
object DedupEmbeddingOp extends Stage {
  val name = "dedup.embedding"
  val kind = StageKind.Transform

  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      F.aggregate(F.zip_with(x, y, (p, q) => p * q), F.lit(0.0), (acc, v) => acc + v)
    def norm(x: Column) = F.sqrt(F.aggregate(
      F.transform(x, v => v * v), F.lit(0.0), (acc, v) => acc + v))
    dot(a, b) / (norm(a) * norm(b))
  }

  /** h-bit hyperplane signature of a float-array column (seeded, dim known) */
  def hyperplaneSig(vec: Column, dim: Int, h: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(h, dim)(rnd.nextGaussian())
    val bits = (0 until h).map { i =>
      val plane = F.array(planes(i).map(F.lit): _*)
      val dot = F.aggregate(F.zip_with(vec.cast("array<double>"), plane, (a, b) => a * b),
        F.lit(0.0), (acc, v) => acc + v)
      F.when(dot >= 0, F.lit(1L)).otherwise(F.lit(0L)) * F.lit(1L << i)
    }
    bits.reduce(_ + _)
  }

  def duplicateIds(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val id = cfg.str("id_column")
    val vecCol = cfg.str("vector_column")
    val threshold = cfg.doubleOr("threshold", 0.95)
    val h = cfg.longOr("num_planes", 16L).toInt
    val blocks = cfg.longOr("blocks", 4L).toInt
    val seed = cfg.longOr("seed", 11L)
    val dim = ctx.primary.select(F.size(F.col(vecCol))).head().getInt(0)
    val width = h / blocks

    val sigs = ctx.primary.select(F.col(id).alias("id"), F.col(vecCol).alias("vec"))
      .withColumn("sig", hyperplaneSig(F.col("vec"), dim, h, seed))
    val blocked = sigs.select(F.col("id"), F.col("vec"),
      F.posexplode(F.array((0 until blocks).map { j =>
        F.shiftrightunsigned(F.col("sig"), j * width).bitwiseAND(F.lit((1L << width) - 1L))
      }: _*)))
      .withColumnRenamed("pos", "block_idx").withColumnRenamed("col", "block_val")

    val lhs = blocked.select(F.col("block_idx"), F.col("block_val"), F.col("id").alias("id_a"), F.col("vec").alias("v_a"))
    val rhs = blocked.select(F.col("block_idx"), F.col("block_val"), F.col("id").alias("id_b"), F.col("vec").alias("v_b"))
    lhs.join(rhs, Seq("block_idx", "block_val"))
      .filter(F.col("id_a") < F.col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(F.col("v_a").cast("array<double>"), F.col("v_b").cast("array<double>")))
      .filter(F.col("cos") >= threshold)
      .select(F.col("id_b").alias("id")).distinct()
  }

  def apply(ctx: StageContext): DataFrame = {
    val id = ctx.cfg.str("id_column")
    val dups = duplicateIds(ctx)
    ctx.primary.join(F.broadcast(dups), ctx.primary(id) === dups("id"), "left_anti")
  }
}
