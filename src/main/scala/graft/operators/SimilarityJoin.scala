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
  * `index_path` replaces the second input with a PREBUILT index corpus
  * (`index.build type=minhash` for method=minhash; `type=lsh`, either
  * layout, for method=embedding): match new rows against everything
  * already ingested without rescanning or re-hashing it — signature
  * parameters come from the index meta, conflicts fail loud, and the
  * banded layout probes only colliding (band, pband) partitions.
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
    val mode = cfg.strOr("mode", "pairs") match {
      case ok @ ("pairs" | "semi" | "anti") => ok
      case other => throw new GraftConfigError(s"join.similar mode must be pairs|semi|anti, got '$other'")
    }
    val leftId = cfg.strOr("left_id", cfg.strOr("id_column", "id"))
    val rightId = cfg.strOr("right_id", cfg.strOr("id_column", "id"))
    // right side: a second input, or a prebuilt index (`index_path`) — the
    // "match new rows against everything already ingested" probe
    val indexPath = cfg.strOpt("index_path")
    if (indexPath.isDefined && ctx.inputs.size > 1) throw new GraftConfigError(
      "join.similar: give EITHER a second (right) input or index_path, not both")

    val pairs = (cfg.strOr("method", "minhash"), indexPath) match {
      case ("minhash", None)      => minhashPairs(ctx, left, ctx.input(1), leftId, rightId)
      case ("embedding", None)    => embeddingPairs(ctx, left, ctx.input(1), leftId, rightId)
      case ("minhash", Some(p))   => minhashIndexPairs(ctx, left, leftId, p)
      case ("embedding", Some(p)) => embeddingIndexPairs(ctx, left, leftId, p)
      case (other, _) => throw new GraftConfigError(s"join.similar method must be minhash|embedding, got '$other'")
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
    val blocking = cfg.strOr("blocking", "pigeonhole")
    if (!Set("pigeonhole", "bands", "ivf").contains(blocking))
      throw new GraftConfigError(
        s"join.similar: blocking must be pigeonhole|bands|ivf, got '$blocking'")
    val banded = blocking == "bands"
    // planes/blocks only shape the pigeonhole layout; a leftover pigeonhole
    // value must not reject a banded/ivf config that never uses it
    if (blocking == "pigeonhole" && planes % blocks != 0)
      throw new GraftConfigError(s"planes=$planes must divide evenly into blocks=$blocks")
    val bits = if (banded) 0 else planes / blocks
    val nBands = cfg.longOr("bands", 16L).toInt
    val bandR = cfg.longOr("band_planes", 16L).toInt
    if (banded && nBands < 1) throw new GraftConfigError(
      s"join.similar: bands must be >= 1, got $nBands")
    if (banded && (bandR < 1 || bandR > 63)) throw new GraftConfigError(
      s"join.similar: band_planes must be in [1, 63], got $bandR")
    // an EMPTY side is legal input (a benchmark slice filtered to nothing,
    // a first-ever batch) and can produce no pairs — short-circuit before
    // the dimension probe, which needs a row
    val (dimLOpt, dimROpt) = (vecDim(left, leftVec), vecDim(right, rightVec))
    if (dimLOpt.isEmpty || dimROpt.isEmpty)
      return ctx.spark.createDataFrame(
        ctx.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("left_id", left.schema(leftId).dataType),
          org.apache.spark.sql.types.StructField("right_id", right.schema(rightId).dataType),
          org.apache.spark.sql.types.StructField("cosine", org.apache.spark.sql.types.DoubleType))))
    val (dimL, dimR) = (dimLOpt.get, dimROpt.get)
    if (dimL != dimR)
      throw new GraftConfigError(s"embedding dims differ: left $dimL vs right $dimR")

    // blocking=ivf (SemDeDup-style cluster blocking, see dedup.embedding):
    // candidates are same-cell cross pairs under ONE shared coarse
    // quantizer — quantizer_path reuses a prebuilt ivf/ivfpq index;
    // otherwise seeded in-op Lloyd's trained on the RIGHT (corpus) side's
    // bounded sample, the side the left rows are being matched against.
    // nlist = 1 is exhaustive (the similar_join_embedding_ivf gate).
    val ivfCents: Array[Array[Double]] =
      if (blocking != "ivf") null
      else cfg.strOpt("quantizer_path") match {
        case Some(p) =>
          IndexMaintenance.recoverSwap(p)
          if (!GraftFs.exists(s"$p/centroids")) throw new GraftPlanError(
            s"join.similar: no ivf/ivfpq index at '$p' — quantizer_path needs " +
            "an index.build type=ivf|ivfpq index")
          IvfCentroids.load(ctx.spark, p, "join.similar blocking=ivf").map(_._2.toArray)
        case None =>
          val nlist = cfg.longOr("nlist", 16L).toInt
          if (nlist < 1) throw new GraftConfigError(
            s"join.similar: nlist must be >= 1, got $nlist")
          val maxTrain = cfg.longOr("max_train", 10000L).toInt
          // Pq.trainSample: deterministic uniform draw (a plain limit
          // would train on the first rows in plan order — one domain's
          // slice of a sorted corpus)
          val sample = Pq.trainSample(
            right.filter(F.col(rightVec).isNotNull), F.col(rightVec), maxTrain, seed)
          if (sample.isEmpty) Array(Array.fill(math.max(1, dimL))(0.0))
          else Pq.lloyd(sample, nlist, Pq.TrainIters, seed)
      }
    val assignCell = if (ivfCents == null) null else F.udf { v: Seq[Float] =>
      Pq.nearest(ivfCents, v.map(_.toDouble).toArray)
    }

    // content key for exact collapse = the vector itself (distinct vectors)
    def prepare(df: DataFrame, id: String, vec: String) = {
      val (reps, mapping) = collapse(df, id, F.col(vec).cast("array<float>"), ctx.deferToCleanup)
      val keyed = reps.select(F.col("id"), F.col("_key").alias("vec"))
      val sigged = ctx.pin(blocking match {
        case "ivf" => keyed.withColumn("cell", assignCell(F.col("vec")))
        case "bands" => keyed.withColumn("bsig",
          DedupEmbeddingOp.bandSignatures(F.col("vec"), dimL, nBands, bandR, seed))
        case _ => keyed.withColumn("sig",
          DedupEmbeddingOp.hyperplaneSig(F.col("vec"), dimL, planes, seed))
      })
      (sigged, mapping)
    }
    val (sl, mapL) = prepare(left, leftId, leftVec)
    val (sr, mapR) = prepare(right, rightId, rightVec)

    def blocked(sigged: DataFrame, side: String) =
      if (blocking == "ivf")
        sigged.select(F.col("id").alias(s"rep_$side"),
          F.lit(0).alias("block_idx"), F.col("cell").cast("long").alias("block_val"))
      else sigged.select(F.col("id").alias(s"rep_$side"),
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

  /** None = the side has no rows (caller short-circuits); a present row
    * with a null vector is still a loud error. */
  private def vecDim(df: DataFrame, vec: String): Option[Int] =
    df.select(F.size(F.col(vec))).head(1).headOption.map { head =>
      if (head.isNullAt(0))
        throw new GraftConfigError(s"join.similar: vector column '$vec' is empty")
      head.getInt(0)
    }

  /** `index_path` (method=minhash): the right side is an `index.build
    * type=minhash` corpus — match the left rows against everything
    * already ingested without rescanning or re-hashing it. Signature
    * parameters come from the index meta (explicit conflicting keys fail
    * loud); the left side still exact-collapses to representatives and
    * expands matches back, the index side is used as-is (it stores every
    * ingested row). Same snapshot/placeholder contract as the
    * dedup.minhash index probe. */
  private def minhashIndexPairs(ctx: StageContext, left: DataFrame, leftId: String,
      path: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
    val cfg = ctx.cfg
    val spark = ctx.spark
    val leftText = cfg.strOr("left_text", cfg.strOr("text_column", "text"))
    val threshold = cfg.doubleOr("threshold", 0.8)
    val explainOnly = cfg.boolOr("_explain_only", false)
    val metaExists = GraftFs.isDir(s"$path/meta")
    val placeholder = explainOnly && !metaExists
    if (!placeholder && !metaExists) throw new GraftPlanError(
      s"join.similar: no minhash index at $path — run index.build type=minhash first")
    val (n, k, bands, seed) =
      if (placeholder)
        (cfg.longOr("shingle_size", 3L).toInt, cfg.longOr("num_hashes", 128L).toInt,
         cfg.longOr("bands", 32L).toInt, cfg.longOr("seed", 42L))
      else {
        val meta = spark.read.parquet(s"$path/meta").head()
        if (!meta.schema.fieldNames.contains("shingle_size")) throw new GraftConfigError(
          s"join.similar: the index at $path is not a minhash index — " +
          "method=minhash probes an index.build type=minhash corpus")
        val vals = (meta.getAs[Int]("shingle_size"), meta.getAs[Int]("num_hashes"),
          meta.getAs[Int]("bands"), meta.getAs[Long]("seed"))
        Seq(("shingle_size", vals._1.toLong), ("num_hashes", vals._2.toLong),
            ("bands", vals._3.toLong), ("seed", vals._4)).foreach { case (key, v) =>
          cfg.longOpt(key).filter(_ != v).foreach(conflicting =>
            throw new GraftConfigError(s"join.similar: $key = $conflicting conflicts " +
              s"with the index at $path ($key = $v) — cross matches would silently miss"))
        }
        vals
      }
    val r = k / bands

    val (reps, mapping) = collapse(left, leftId, F.col(leftText), ctx.deferToCleanup)
    val hashed = ctx.pin(reps.select(F.col("id"),
        Shingles.shingleHashes(F.col("_key"), n).alias("shingles"))
      .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), k, seed)))

    val corpusSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", left.schema(leftId).dataType),
      org.apache.spark.sql.types.StructField("shingles",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.types.StructField("sig",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
    val index =
      if (placeholder) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], corpusSchema)
      else IndexSnapshot.read(spark, IndexSnapshot.corpusDir(path),
        s"join.similar: no minhash index at $path — run index.build type=minhash first",
        corpusSchema)
    val scored = LshVerify.verifiedCrossPairsScored(hashed, index, bands, r, k, threshold)
    scored.join(mapping, scored("id_l") === mapping("rep_id"))
      .select(F.col("orig_id").alias("left_id"), F.col("id_r").alias("right_id"),
        F.col("jaccard"))
  }

  /** `index_path` (method=embedding): the right side is an `index.build
    * type=lsh` corpus, either layout — pigeonhole (block, pbucket) with
    * the Hamming prefilter, or bands (band, pband) on exact band
    * agreement — detected from the index meta, exactly like the
    * dedup.embedding index probe, but emitting scored PAIRS instead of
    * dropping ids. `right_id` / `right_vector` name the indexed columns. */
  private def embeddingIndexPairs(ctx: StageContext, left: DataFrame, leftId: String,
      path: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
    val cfg = ctx.cfg
    val spark = ctx.spark
    val leftVec = cfg.strOr("left_vector", cfg.strOr("vector_column", "embedding"))
    val rId = cfg.strOr("right_id", cfg.strOr("id_column", "id"))
    val rVec = cfg.strOr("right_vector", cfg.strOr("vector_column", "embedding"))
    val threshold = cfg.doubleOr("threshold", 0.9)
    val explainOnly = cfg.boolOr("_explain_only", false)
    val metaExists = GraftFs.isDir(s"$path/meta")
    val placeholder = explainOnly && !metaExists
    if (!placeholder && !metaExists) throw new GraftPlanError(
      s"join.similar: no lsh index at $path — run index.build type=lsh first")
    val bandsLayout =
      if (placeholder) cfg.strOr("blocking", "pigeonhole") == "bands"
      else spark.read.parquet(s"$path/meta").schema.fieldNames.contains("band_planes")
    cfg.strOpt("blocking").foreach { b =>
      val layoutName = if (bandsLayout) "bands" else "pigeonhole"
      if (metaExists && b != layoutName) throw new GraftConfigError(
        s"join.similar: blocking = $b conflicts with the index at $path, which is " +
        s"$layoutName-partitioned — the index layout decides the probe blocking")
    }
    // placeholder (explain-only) path: an empty left still needs SOME dim
    // for the signature expression it never evaluates
    def dimOf: Int = cfg.longOpt("dim").map(_.toInt)
      .orElse(vecDim(left, leftVec)).getOrElse(1)

    val (reps, mapping) = collapse(left, leftId, F.col(leftVec).cast("array<float>"),
      ctx.deferToCleanup)
    val keyed = reps.select(F.col("id"), F.col("_key").alias("vec"))

    import org.apache.spark.sql.types._
    def emptyIndex(extra: Seq[StructField]): DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField(rId, left.schema(leftId).dataType),
        StructField(rVec, left.schema(leftVec).dataType)) ++ extra))

    val pairs =
      if (bandsLayout) {
        val (bands, r, seed, dim, pd) =
          if (placeholder)
            (cfg.longOr("bands", 16L).toInt, cfg.longOr("band_planes", 16L).toInt,
             cfg.longOr("seed", 42L), dimOf, cfg.longOr("partition_dirs", 64L).toInt)
          else {
            val meta = spark.read.parquet(s"$path/meta").head()
            val vals = (meta.getAs[Int]("bands"), meta.getAs[Int]("band_planes"),
              meta.getAs[Long]("seed"), meta.getAs[Int]("dim"), meta.getAs[Int]("pbuckets"))
            Seq(("bands", vals._1.toLong), ("band_planes", vals._2.toLong), ("seed", vals._3),
                ("dim", vals._4.toLong), ("partition_dirs", vals._5.toLong))
              .foreach { case (key, v) =>
                cfg.longOpt(key).filter(_ != v).foreach(conflicting =>
                  throw new GraftConfigError(s"join.similar: $key = $conflicting conflicts " +
                    s"with the index at $path ($key = $v)"))
              }
            vals
          }
        val sigs = ctx.pin(keyed.withColumn("bsig",
          DedupEmbeddingOp.bandSignatures(F.col("vec"), dim, bands, r, seed)))
        val blockedL = sigs.select(F.col("id").alias("id_l"), F.col("vec").alias("v_l"),
            F.posexplode(F.col("bsig")).as(Seq("band", "bsig")))
          .withColumn("band", F.col("band").cast("int"))
          .withColumn("pband", (F.col("bsig") % pd).cast("int"))
        val index =
          if (placeholder) emptyIndex(Seq(StructField("bsig", LongType),
            StructField("band", IntegerType), StructField("pband", IntegerType),
            StructField("ingest_tag", StringType)))
          else IndexSnapshot.read(spark, IndexSnapshot.corpusDir(path),
            s"join.similar: no lsh index at $path — run index.build type=lsh first",
            emptyIndex(Seq.empty).schema, basePath = true)
        val idxSide = index.select(F.col("band"), F.col("pband"), F.col("bsig"),
          F.col(rId).alias("id_r"), F.col(rVec).alias("v_r"))
        blockedL.join(idxSide, Seq("band", "pband", "bsig"))
          .withColumn("cosine", DedupEmbeddingOp.cosine(
            F.col("v_l").cast("array<double>"), F.col("v_r").cast("array<double>")))
          .filter(F.col("cosine") >= threshold)
          .select("id_l", "id_r", "cosine")
          .dropDuplicates("id_l", "id_r") // one row per pair across band collisions
      } else {
        val (h, blocks, seed, dim, pd) =
          if (placeholder)
            (cfg.longOr("planes", 32L).toInt, cfg.longOr("blocks", 4L).toInt,
             cfg.longOr("seed", 42L), dimOf, cfg.longOr("partition_dirs", 64L).toInt)
          else {
            val meta = spark.read.parquet(s"$path/meta").head()
            if (!meta.schema.fieldNames.contains("pbuckets")) throw new GraftConfigError(
              s"join.similar: the index at $path predates the (block, pbucket) layout — " +
              "rebuild it with index.build type=lsh mode=overwrite")
            val vals = (meta.getAs[Int]("num_planes"), meta.getAs[Int]("blocks"),
              meta.getAs[Long]("seed"), meta.getAs[Int]("dim"), meta.getAs[Int]("pbuckets"))
            Seq(("planes", vals._1.toLong), ("blocks", vals._2.toLong), ("seed", vals._3),
                ("dim", vals._4.toLong), ("partition_dirs", vals._5.toLong))
              .foreach { case (key, v) =>
                cfg.longOpt(key).filter(_ != v).foreach(conflicting =>
                  throw new GraftConfigError(s"join.similar: $key = $conflicting conflicts " +
                    s"with the index at $path ($key = $v)"))
              }
            vals
          }
        val width = h / blocks
        val maxBits = DedupEmbeddingOp.maxBitsFor(h, threshold)
        val sigs = ctx.pin(keyed.withColumn("sig",
          DedupEmbeddingOp.hyperplaneSig(F.col("vec"), dim, h, seed)))
        val blockedL = sigs.select(F.col("id").alias("id_l"), F.col("sig").alias("sig_l"),
            F.col("vec").alias("v_l"),
            F.posexplode(DedupEmbeddingOp.blockKeys(F.col("sig"), blocks, width)))
          .withColumnRenamed("pos", "block").withColumnRenamed("col", "bucket")
          .withColumn("block", F.col("block").cast("int"))
          .withColumn("pbucket", (F.col("bucket") % pd).cast("int"))
        val index =
          if (placeholder) emptyIndex(Seq(StructField("block", IntegerType),
            StructField("pbucket", IntegerType), StructField("bucket", LongType)))
          else IndexSnapshot.read(spark, IndexSnapshot.corpusDir(path),
            s"join.similar: no lsh index at $path — run index.build type=lsh first",
            emptyIndex(Seq.empty).schema, basePath = true)
        val idxSide = index.select(F.col("block"), F.col("pbucket"), F.col("bucket"),
          F.col(rId).alias("id_r"), F.col(rVec).alias("v_r"))
          .withColumn("sig_r", DedupEmbeddingOp.hyperplaneSig(F.col("v_r"), dim, h, seed))
        blockedL.join(idxSide, Seq("block", "pbucket", "bucket"))
          .filter(F.bit_count(F.col("sig_l").bitwiseXOR(F.col("sig_r"))) <= maxBits)
          .withColumn("cosine", DedupEmbeddingOp.cosine(
            F.col("v_l").cast("array<double>"), F.col("v_r").cast("array<double>")))
          .filter(F.col("cosine") >= threshold)
          .select("id_l", "id_r", "cosine")
          .dropDuplicates("id_l", "id_r")
      }
    pairs.join(mapping, pairs("id_l") === mapping("rep_id"))
      .select(F.col("orig_id").alias("left_id"), F.col("id_r").alias("right_id"),
        F.col("cosine"))
  }
}
