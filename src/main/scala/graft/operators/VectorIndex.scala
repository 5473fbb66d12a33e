package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** Shared IVF centroid machinery: one loader (with the loud empty-table
  * check) and one bounded nearest-cells selection, used by the quantizer
  * append path and every ivf probe (knn.ivf, knn.join mode=ivf). */
private[operators] object IvfCentroids {
  import org.apache.spark.ml.linalg.{Vector, Vectors}

  /** (cell, centroid) sorted by cell. An IVF index whose centroids table
    * is EMPTY is unusable (appends can't assign, probes would silently
    * degrade to dim = 0) — fail loud instead. Listing-keyed cached
    * (IndexMeta): probe loops re-read a table that only a rebuild — which
    * writes fresh part files — can change; callers treat the array as
    * read-only. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String,
      op: String): Array[(Int, Vector)] =
    IndexMeta.cached(s"$path/centroids") {
      val cents = spark.read.parquet(s"$path/centroids")
        .select("cell", "centroid").collect()
        .map(r => (r.getInt(0), Vectors.dense(r.getSeq[Double](1).toArray)))
        .sortBy(_._1)
      if (cents.isEmpty) throw new GraftConfigError(
        s"$op: the index at $path has no centroids — rebuild with " +
        "index.build type=ivf mode=overwrite")
      cents
    }

  /** One-nearest-cell assignment UDF over a BROADCAST centroid table —
    * the corpus-wide map pass of every ivf build/append/inline-probe. The
    * centroid array used to ride the UDF closure, re-shipped with every
    * stage's task binary (nlist·dim doubles per launch); a broadcast ships
    * it once per executor (guide §3.1's small-side discipline applied to
    * the task payload — r14, VERDICT item 8). The arithmetic is UNCHANGED:
    * the same [[nearest]] over the same `Vectors.sqdist`, with the
    * float→double widening done by an exact while-loop instead of the
    * boxing `v.map(_.toDouble)` — assignments are bit-identical
    * (IvfAssignSpec pins it). */
  def assignUdf(spark: org.apache.spark.sql.SparkSession,
      cents: Array[(Int, Vector)]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(cents)
    F.udf { v: Seq[Float] =>
      val arr = new Array[Double](v.length)
      var i = 0
      while (i < arr.length) { arr(i) = v(i).toDouble; i += 1 }
      nearest(bc.value, Vectors.dense(arr), 1)(0)
    }
  }

  /** Cell ids of the `nprobe` euclidean-nearest centroids to `q`, nearest
    * first — bounded insertion selection (O(nlist·nprobe) with nprobe
    * tiny), not a full nlist sort per query row. Ties keep the
    * lower-cell-id centroid, matching the stable sort this replaces. */
  def nearest(cents: Array[(Int, Vector)], q: Vector, nprobe: Int): Array[Int] = {
    val n = math.min(nprobe, cents.length)
    val bestD = Array.fill(n)(Double.MaxValue)
    val bestId = new Array[Int](n)
    var i = 0
    while (i < cents.length) {
      val d = Vectors.sqdist(cents(i)._2, q)
      if (d < bestD(n - 1)) {
        var j = n - 1
        while (j > 0 && bestD(j - 1) > d) {
          bestD(j) = bestD(j - 1); bestId(j) = bestId(j - 1); j -= 1
        }
        bestD(j) = d; bestId(j) = cents(i)._1
      }
      i += 1
    }
    bestId
  }
}

/** index.build — persist a vector index so ANN probes prune I/O instead of
  * scanning the corpus (round-1 review: knn.ivf re-trained its quantizer
  * inside every query — correct, but the index belongs OUTSIDE the query
  * at 100 TB).
  *
  * `type = "ivf"` (default) — layout under `path`:
  *   corpus/    the input rows + `cell` (nearest-centroid id), written
  *              `partitionBy("cell")` — a probe filtering `cell IN (...)`
  *              becomes parquet PARTITION PRUNING: nprobe/nlist of the
  *              bytes are read, visible as PartitionFilters in the scan
  *   centroids/ (cell INT, centroid ARRAY<DOUBLE>) — nlist rows, tiny;
  *              probes rank these driver-side to pick cells
  * The quantizer is MLlib KMeans on a bounded sample (`max_train`), the
  * standard IVF recipe: centroid quality needs a sample, assignment is one
  * broadcast-model map pass over the full corpus.
  *
  * `type = "lsh"` — the classic multi-probe LSH table layout: each row's
  * hyperplane signature (num_planes bits, same machinery as
  * dedup.embedding) splits into `blocks` bucket keys and the row is
  * written once PER BLOCK, partitioned by (block, bucket % partition_dirs)
  * with the exact bucket as a data column — storage amplification =
  * blocks, dir count bounded by blocks × partition_dirs REGARDLESS of
  * signature width; probes prune on the partition key and apply the exact
  * bucket equality as a residual scan filter. meta/ records (num_planes,
  * blocks, seed, dim, pbuckets) so probes regenerate identical planes
  * and dir keys.
  *
  * Rebuild = re-run with mode=overwrite (default). Pass-through stage:
  * returns its input, so it composes mid-pipeline like table.write.
  */
object IndexBuildOp extends Stage {
  val name = "index.build"
  // Transform, not Sink: the DAG compiler defers Sink side effects until
  // after every plan is composed, but a downstream knn probe must LIST the
  // index files at plan time — index.build is a materialization barrier
  // that runs eagerly during plan composition and passes its input through.
  val kind = StageKind.Transform

  /** The bands-layout bucket-occupancy advisory, pure so the threshold
    * logic is spec-testable: ~rows/2^band_planes vectors share each
    * per-band bucket, candidate pairs grow linearly with that occupancy
    * (ScaleProbe 1M-2M rungs: 258 → 1007 cross pairs per probe row as
    * occupancy quadrupled), and past ~1000 rows/bucket the banded probe's
    * selectivity advantage over a flat scan is gone. Returns the warning
    * line to emit, or None while occupancy is healthy. */
  private[graft] def bandsOccupancyWarning(rows: Long, bandPlanes: Int): Option[String] = {
    val occupancy = rows.toDouble / (1L << bandPlanes)
    if (occupancy <= 1000.0) None
    else {
      // smallest band_planes that brings occupancy back under 1000
      val needed = math.min(63,
        math.ceil(math.log(rows / 1000.0) / math.log(2.0)).toInt)
      Some(s"[graft] index.build blocking=bands: ~$rows vectors over " +
        s"2^$bandPlanes buckets per band = ~${math.round(occupancy)} rows/bucket — " +
        "banded-probe candidates grow linearly with occupancy and past ~1000 " +
        "rows/bucket the probe degrades toward a scan; rebuild with " +
        s"band_planes >= $needed (see docs/BENCH_NOTES.md, ANN 1M-2M rungs)")
    }
  }

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    // CLI `explain` must stay read-only: skip the eager build (the plan
    // shown is the pass-through input; the probe stage will list whatever
    // index already exists on disk, or fail loudly when run for real)
    if (cfg.boolOr("_explain_only", false)) return ctx.primary
    val mode = cfg.strOr("mode", "overwrite")
    def build(): Unit = {
      // a previous index.compact may have died mid-swap: repair before any
      // meta validation or corpus write (an append into the missing-corpus
      // window would fork a generation the repair would discard). Inside
      // the lease — an unleased repairer racing a live swap-mode compact's
      // two-rename window would "repair" a protocol mid-flight.
      cfg.strOpt("path").foreach(p => IndexMaintenance.recoverSwap(p))
      // a rebuild invalidates the recorded compacted generation (index.stats
      // would otherwise count the fresh corpus as zero appends-since-compact)
      // AND any generation-pointer state (the fresh corpus writes to the
      // classic dir; a surviving pointer would alias it to a stale gen)
      if (mode == "overwrite")
        cfg.strOpt("path").foreach { p =>
          GraftFs.deleteIfExists(s"$p/compact.gen")
          IndexSnapshot.resetGenerations(p)
        }
      cfg.strOr("type", "ivf") match {
        case "ivf" => buildIvf(ctx)
        case "ivfpq" => PqIndex.build(ctx)
        case "lsh" => buildLsh(ctx)
        case "minhash" => buildMinhash(ctx)
        case "ngram" => buildNgram(ctx)
        case "simhash" => buildSimhash(ctx)
        case "exact" => buildExact(ctx)
        case other => throw new GraftConfigError(
          s"index.build type must be ivf|ivfpq|lsh|minhash|ngram|simhash|exact, got '$other'")
      }
    }
    // BOTH modes claim the shared writer lease. Append is the same
    // batch-appender class as the dedup index_append fires (its write
    // must not land inside a concurrent compact's rewrite window).
    // Overwrite is a REBUILD by explicit intent — but rebuilding an index
    // a live stream is appending to, or whose generational compact is
    // mid-rewrite, is the same corruption class (resetGenerations would
    // delete the compact's in-progress generation, and the compact's
    // later pointer commit would alias the fresh corpus to a deleted
    // dir) — so it too must fail loud while another writer is live.
    cfg.strOpt("path") match {
      case Some(p) =>
        graft.streaming.IngestLease.withBatchLease(p, s"index.build mode=$mode")(build())
      case None => build()
    }
    ctx.primary
  }

  /** `type = "minhash"` — the text-dedup signature index: one pass hashes
    * every document once (shingles + MinHash signature, the CPU-heavy
    * step) and persists the narrow (id, sig, shingles) rows under
    * `corpus/`, with the signature parameters under `meta/` so probes
    * regenerate identical hashing. `dedup.minhash index_path = ...` then
    * dedups NEW batches against the corpus without ever rescanning or
    * re-hashing old text — the incremental-ingestion path at 100 TB.
    * Indexes ALL input rows (not survivors of any dedup): a future batch
    * must match documents that were themselves duplicates, exactly as a
    * full-corpus pairwise pass would. Bands derive from the signature at
    * probe time (narrow exprs) instead of being stored ×bands. */
  private def buildMinhash(ctx: StageContext): Unit = {
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val id = cfg.strOr("id_column", "doc_id")
    val text = cfg.strOr("text_column", "text")
    val n = cfg.longOr("shingle_size", 3L).toInt
    val k = cfg.longOr("num_hashes", 128L).toInt
    val bands = cfg.longOr("bands", 32L).toInt
    val seed = cfg.longOr("seed", 42L)
    val mode = cfg.strOr("mode", "overwrite")
    if (k % bands != 0) throw new GraftConfigError(
      s"index.build type=minhash: num_hashes=$k must divide evenly into bands=$bands")

    val spark = ctx.spark
    // append must extend the EXISTING signature space: silently writing new
    // meta over an old corpus (or appending differently-hashed rows) would
    // make every cross match against the old portion miss
    if (mode == "append" &&
        GraftFs.isDir(IndexSnapshot.corpusDir(path)) &&
        !GraftFs.isDir(s"$path/meta"))
      throw new GraftConfigError(
        s"index.build type=minhash mode=append: $path has a corpus but no meta (a crashed " +
        "earlier build?) — parameters cannot be validated; rebuild with mode=overwrite")
    if (mode == "append" &&
        GraftFs.isDir(s"$path/meta")) {
      val m = IndexMeta.head(spark, s"$path/meta")
      val existing = (m.getAs[Int]("shingle_size"), m.getAs[Int]("num_hashes"),
        m.getAs[Int]("bands"), m.getAs[Long]("seed"))
      if (existing != ((n, k, bands, seed))) throw new GraftConfigError(
        s"index.build type=minhash mode=append: parameters (shingle_size=$n, " +
        s"num_hashes=$k, bands=$bands, seed=$seed) differ from the existing index " +
        s"at $path $existing — appending would mix incompatible signatures")
    }

    Parallelize(ctx)
      .select(F.col(id).alias("id"),
        Shingles.shingleHashes(F.col(text), n).alias("shingles"))
      .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), k, seed))
      .write.mode(mode).parquet(IndexSnapshot.corpusDir(path))

    // one-row table the driver already holds — write it driver-side
    // (DriverParquet) instead of scheduling a Spark job for it
    DriverParquet.overwrite(s"$path/meta", Seq(
      DriverParquet.I32("shingle_size", Seq(n)), DriverParquet.I32("num_hashes", Seq(k)),
      DriverParquet.I32("bands", Seq(bands)), DriverParquet.I64("seed", Seq(seed))))
  }

  // package-visible: index.compact's retrain_if rebuilds through this
  // entry under its OWN already-held lease (the public apply would
  // re-claim the same lease file and fail loud against itself)
  private[operators] def buildIvf(ctx: StageContext): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val vecCol = cfg.strOr("vector_column", "embedding")
    val mode = cfg.strOr("mode", "overwrite")
    // mode=append must NOT retrain: a second quantizer would append a
    // second centroid set (duplicate cell ids pointing at different
    // centers) and assign the new rows inconsistently with the old —
    // probes would silently lose recall. Appending re-uses the FROZEN
    // first-build quantizer: assign to the existing centroids, grow only
    // the cell-partitioned corpus.
    if (mode == "append") return appendIvf(ctx)
    if (mode != "overwrite") throw new GraftConfigError(
      s"index.build: mode must be overwrite|append, got '$mode'")
    val nlist = cfg.longOr("nlist", 16L).toInt
    val seed = cfg.longOr("seed", 11L)
    val maxTrain = cfg.longOr("max_train", 100000L).toInt

    // r13: the coarse quantizer trains DRIVER-SIDE on the bounded uniform
    // draw (Pq.trainSample — one shared TakeOrdered job with the pmod key,
    // footer prefilter, and starved-draw fallback; Pq.lloyd — the same
    // seeded Lloyd's the ivfpq codebooks already use). The sample is
    // capped at max_train BY CONSTRUCTION, so training is driver-scale
    // work at any corpus size (100k × 64 dims ≈ 50 MB), while the old
    // distributed MLlib KMeans paid ~18 scheduler jobs per fit against a
    // cached sample — measured 1.2 s of the knn_ivf_exhaustive gate's
    // 1.66 s job wall (GateAudit r13) that a 2,000-row fixture cannot
    // amortize and a 100 TB corpus never needed (the draw, not the fit,
    // is the distributed part). Assignment stays one broadcast map pass.
    val sample = Pq.trainSample(ctx.primary, F.col(vecCol), maxTrain, seed)
    if (sample.isEmpty)
      throw new GraftPlanError("index.build type=ivf: empty input, nothing to train the quantizer on")
    val centsArr = Pq.lloyd(sample, nlist, Pq.TrainIters, seed)
    val cents = centsArr.zipWithIndex.map { case (c, i) => (i, Vectors.dense(c)) }
    val assign = IvfCentroids.assignUdf(ctx.spark, cents)
    // co-locate cells before the partitioned write (one file per
    // populated cell instead of input_partitions × cells droplets)
    ctx.primary.withColumn("cell", assign(F.col(vecCol).cast("array<float>")))
      .repartition(F.col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(IndexSnapshot.corpusDir(path))

    // nlist driver-held rows — driver-side write, no Spark job
    DriverParquet.overwrite(s"$path/centroids", Seq(
      DriverParquet.I32("cell", centsArr.indices),
      DriverParquet.DblArr("centroid", centsArr.map(_.toSeq).toSeq)))
    Pq.warnCellSkew(ctx.spark, path, "index.build type=ivf", nlist)
  }

  /** mode=append for type=ivf: assign new rows to the EXISTING centroids
    * (broadcast into one UDF — nlist rows) and append to the
    * cell-partitioned corpus; the quantizer stays frozen at first build,
    * so old and new rows share one consistent cell space and every probe
    * (`knn.ivf`, `knn.join`) sees the union. Centroid quality for rows far
    * from the training distribution is the standard IVF drift trade-off —
    * rebuild with mode=overwrite to retrain. */
  private def appendIvf(ctx: StageContext): Unit = {
    import org.apache.spark.ml.linalg.Vectors
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val vecCol = cfg.strOr("vector_column", "embedding")
    val spark = ctx.spark
    if (!GraftFs.isDir(s"$path/centroids"))
      throw new GraftConfigError(
        s"index.build type=ivf mode=append: no existing index at $path — the quantizer " +
        "is frozen at first build (appending re-uses its centroids so cell assignment " +
        "stays consistent); run mode=overwrite first")
    val cents = IvfCentroids.load(spark, path, "index.build type=ivf mode=append")
    val dim = cents.head._2.size
    ctx.primary.select(F.size(F.col(vecCol))).head(1).headOption.foreach { r =>
      if (r.getInt(0) != dim) throw new GraftConfigError(
        s"index.build type=ivf mode=append: input vectors have length ${r.getInt(0)} " +
        s"but the index at $path was built with dim = $dim")
    }
    val assign = IvfCentroids.assignUdf(spark, cents)
    // the shared batch-appender lease is claimed by the mode=append
    // dispatch in apply() — one claim for every family's append write
    ctx.primary.withColumn("cell", assign(F.col(vecCol).cast("array<float>")))
      .repartition(F.col("cell"))
      .write.mode("append").partitionBy("cell").parquet(IndexSnapshot.corpusDir(path))
    Pq.warnCellSkew(spark, path, "index.build type=ivf mode=append", cents.length)
  }

  /** `type = "exact"` — the exact-dedup key set: distinct 128-bit md5
    * content keys over `columns` (DedupExactOp.contentKey), for
    * `dedup.exact index_path = ...` — a new batch drops already-ingested
    * rows via one anti-join on narrow keys, never re-reading old data. */
  /** char-n-gram minhash index (the dedup.ngram signature space): same
    * flat (id, shingles, sig) corpus as type=minhash, but shingles are
    * character n-gram hashes and the signature width is bands ×
    * rows_per_band — meta records (ngram_size, bands, rows_per_band,
    * seed) so probes regenerate identical signatures. */
  private def buildNgram(ctx: StageContext): Unit = {
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val id = cfg.strOr("id_column", "doc_id")
    val text = cfg.strOr("text_column", "text")
    val n = cfg.longOr("ngram_size", 5L).toInt
    val bands = cfg.longOr("bands", 8L).toInt
    val r = cfg.longOr("rows_per_band", 6L).toInt
    val seed = cfg.longOr("seed", 7L)
    val mode = cfg.strOr("mode", "overwrite")
    val spark = ctx.spark
    if (mode == "append" &&
        GraftFs.isDir(IndexSnapshot.corpusDir(path)) &&
        !GraftFs.isDir(s"$path/meta"))
      throw new GraftConfigError(
        s"index.build type=ngram mode=append: $path has a corpus but no meta (a crashed " +
        "earlier build?) — parameters cannot be validated; rebuild with mode=overwrite")
    if (mode == "append" &&
        GraftFs.isDir(s"$path/meta")) {
      val m = IndexMeta.head(spark, s"$path/meta")
      val existing = (m.getAs[Int]("ngram_size"), m.getAs[Int]("bands"),
        m.getAs[Int]("rows_per_band"), m.getAs[Long]("seed"))
      if (existing != ((n, bands, r, seed))) throw new GraftConfigError(
        s"index.build type=ngram mode=append: parameters (ngram_size=$n, bands=$bands, " +
        s"rows_per_band=$r, seed=$seed) differ from the existing index at $path " +
        s"$existing — appending would mix incompatible signatures")
    }
    Parallelize(ctx)
      .select(F.col(id).alias("id"),
        DedupNgramOp.charNgramHashes(text, n).alias("shingles"))
      .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), bands * r, seed))
      .write.mode(mode).parquet(IndexSnapshot.corpusDir(path))
    DriverParquet.overwrite(s"$path/meta", Seq(
      DriverParquet.I32("ngram_size", Seq(n)), DriverParquet.I32("bands", Seq(bands)),
      DriverParquet.I32("rows_per_band", Seq(r)), DriverParquet.I64("seed", Seq(seed))))
  }

  /** simhash index: flat (id, sig) 64-bit signatures — the signature has
    * no tunable parameters (FNV token hashes, fixed 64 bits), so meta is
    * just the family marker; max_distance is a PROBE-time knob. */
  private def buildSimhash(ctx: StageContext): Unit = {
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val id = cfg.strOr("id_column", "doc_id")
    val text = cfg.strOr("text_column", "text")
    val mode = cfg.strOr("mode", "overwrite")
    val spark = ctx.spark
    if (mode == "append" &&
        GraftFs.isDir(IndexSnapshot.corpusDir(path)) &&
        !GraftFs.isDir(s"$path/meta"))
      throw new GraftConfigError(
        s"index.build type=simhash mode=append: $path has a corpus but no meta (a crashed " +
        "earlier build?) — rebuild with mode=overwrite")
    DedupSimHashOp.withSignature(Parallelize(ctx), id, text)
      .write.mode(mode).parquet(IndexSnapshot.corpusDir(path))
    DriverParquet.overwrite(s"$path/meta",
      Seq(DriverParquet.Bool("simhash", Seq(true))))
  }

  private def buildExact(ctx: StageContext): Unit = {
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val cols = cfg.strListOr("columns", ctx.primary.columns.toVector)
    val mode = cfg.strOr("mode", "overwrite")
    val spark = ctx.spark
    if (mode == "append" &&
        GraftFs.isDir(IndexSnapshot.corpusDir(path)) &&
        !GraftFs.isDir(s"$path/meta"))
      throw new GraftConfigError(
        s"index.build type=exact mode=append: $path has a corpus but no meta (a crashed " +
        "earlier build?) — parameters cannot be validated; rebuild with mode=overwrite")
    if (mode == "append" &&
        GraftFs.isDir(s"$path/meta")) {
      val m = IndexMeta.head(spark, s"$path/meta")
      val existing = m.getSeq[String](m.fieldIndex("columns")).toVector
      if (existing != cols.toVector) throw new GraftConfigError(
        s"index.build type=exact mode=append: columns ${cols.mkString(", ")} differ " +
        s"from the existing index at $path (${existing.mkString(", ")}) — keys would never match")
    }
    ctx.primary.select(DedupExactOp.contentKey(cols).alias("key")).distinct()
      .write.mode(mode).parquet(IndexSnapshot.corpusDir(path))
    DriverParquet.overwrite(s"$path/meta",
      Seq(DriverParquet.StrArr("columns", Seq(cols))))
  }

  private def buildLsh(ctx: StageContext): Unit = ctx.cfg.strOr("blocking", "pigeonhole") match {
    case "pigeonhole" => buildLshPigeonhole(ctx)
    case "bands"      => buildLshBands(ctx)
    case other => throw new GraftConfigError(
      s"index.build type=lsh: blocking must be pigeonhole|bands, got '$other'")
  }

  /** `blocking = "bands"` — the banded-LSH corpus layout, composing the two
    * flagship scale features (corpus-scale blocking × corpus-lifetime
    * incremental probing): each row's `bands` independent `band_planes`-bit
    * hyperplane signatures (DedupEmbeddingOp.bandSignatures) write the row
    * once PER BAND, partitioned by (band, bsig % partition_dirs,
    * ingest_tag) with the exact band signature as a data column — the same
    * dir-count-decoupling trick as the pigeonhole layout (partition dirs
    * bounded by bands × partition_dirs regardless of 2^band_planes), plus a
    * THIRD partition level `ingest_tag`: batch builds/appends land under
    * `ingest_tag=base`, and stream.ingest micro-batches land under
    * `ingest_tag=sb-…` via dynamic partition overwrite — probes still prune
    * on the leading (band, pband) keys while streaming retries stay
    * idempotent, which is what lets stream.ingest carry embeddings (the
    * flat per-batch append dirs of the other families would break banded
    * partition pruning). meta/ records (bands, band_planes, seed, dim,
    * pbuckets); probes detect the layout by the `band_planes` field. */
  private def buildLshBands(ctx: StageContext): Unit = {
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val vecCol = cfg.strOr("vector_column", "embedding")
    val bands = cfg.longOr("bands", 16L).toInt
    val r = cfg.longOr("band_planes", 16L).toInt
    val seed = cfg.longOr("seed", 11L)
    val mode = cfg.strOr("mode", "overwrite")
    val pdirs = cfg.longOr("partition_dirs", 64L).toInt
    if (bands < 1) throw new GraftConfigError(
      s"index.build type=lsh blocking=bands: bands must be >= 1, got $bands")
    if (r < 1 || r > 63) throw new GraftConfigError(
      s"index.build type=lsh blocking=bands: band_planes must be in [1, 63], got $r")
    if (pdirs < 1) throw new GraftConfigError("partition_dirs must be >= 1")

    val dim = ctx.primary.select(F.size(F.col(vecCol))).head(1).headOption match {
      case Some(row) => row.getInt(0)
      case None => throw new GraftPlanError("index.build type=lsh: empty input, cannot infer dim")
    }
    val spark = ctx.spark
    if (mode == "append" &&
        GraftFs.isDir(IndexSnapshot.corpusDir(path)) &&
        !GraftFs.isDir(s"$path/meta"))
      throw new GraftConfigError(
        s"index.build type=lsh mode=append: $path has a corpus but no meta (a crashed " +
        "earlier build?) — parameters cannot be validated; rebuild with mode=overwrite")
    if (mode == "append" &&
        GraftFs.isDir(s"$path/meta")) {
      val m = IndexMeta.head(spark, s"$path/meta")
      if (!m.schema.fieldNames.contains("band_planes")) throw new GraftConfigError(
        s"index.build type=lsh blocking=bands mode=append: the index at $path is " +
        "pigeonhole-partitioned — appending banded signatures would mix incompatible " +
        "layouts; rebuild with mode=overwrite")
      val existing = (m.getAs[Int]("bands"), m.getAs[Int]("band_planes"),
        m.getAs[Long]("seed"), m.getAs[Int]("dim"), m.getAs[Int]("pbuckets"))
      if (existing != ((bands, r, seed, dim, pdirs))) throw new GraftConfigError(
        s"index.build type=lsh blocking=bands mode=append: parameters (bands=$bands, " +
        s"band_planes=$r, seed=$seed, dim=$dim, partition_dirs=$pdirs) differ from the " +
        s"existing index at $path $existing — appending would mix incompatible signatures")
    }

    val bsig = DedupEmbeddingOp.bandSignatures(F.col(vecCol), dim, bands, r, seed,
      ndExplode = true)
    val exploded = ctx.primary.withColumn("_bsig", bsig)
      .select(F.col("*"), F.posexplode(F.col("_bsig")).as(Seq("band", "bsig")))
      .drop("_bsig")
      .withColumn("band", F.col("band").cast("int"))
      .withColumn("pband", (F.col("bsig") % pdirs).cast("int"))
      .withColumn("ingest_tag", F.lit("base"))
    // co-locate each dir key before the partitioned write (see pigeonhole)
    exploded.repartition(F.col("band"), F.col("pband"))
      .write.mode(mode).partitionBy("band", "pband", "ingest_tag").parquet(IndexSnapshot.corpusDir(path))

    DriverParquet.overwrite(s"$path/meta", Seq(
      DriverParquet.I32("bands", Seq(bands)), DriverParquet.I32("band_planes", Seq(r)),
      DriverParquet.I64("seed", Seq(seed)), DriverParquet.I32("dim", Seq(dim)),
      DriverParquet.I32("pbuckets", Seq(pdirs))))

    // occupancy guidance (measurement-backed, BENCH_NOTES r11 ANN rungs):
    // per-bucket candidate growth is LINEAR in corpus size at fixed
    // band_planes, so a corpus that outgrows its bucket space quietly
    // turns banded probes into scans. One parquet-footer count (metadata
    // only, the index.stats trick) prices the whole corpus post-write —
    // append mode included, since occupancy is a property of the total.
    // r13: the count comes from the footers DRIVER-SIDE (IndexSnapshot
    // .footerRows) — the old spark.read.parquet(...).count() scheduled a
    // full Spark job over every corpus file just to re-learn numbers the
    // footers already hold (~0.3 s of fixed job cost per build at gate
    // scale; a listing-priced metadata read at any scale).
    try {
      // r14: bounded-sample estimate — the exact footer sum reads EVERY
      // corpus file's footer on the driver, a metadata storm per build at
      // 10^5+ files; the advisory threshold only needs the magnitude
      val files = IndexSnapshot.filesWithLen(IndexSnapshot.corpusDir(path),
        s"index.build: no corpus at $path")
      if (files.nonEmpty) {
        val sigRows = IndexSnapshot.footerRowsEstimate(files)
        IndexBuildOp.bandsOccupancyWarning(sigRows / math.max(1, bands), r)
          .foreach(System.err.println)
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[graft] index.build occupancy check skipped: ${e.getMessage}") }
  }

  private def buildLshPigeonhole(ctx: StageContext): Unit = {
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val vecCol = cfg.strOr("vector_column", "embedding")
    val h = cfg.longOr("num_planes", 16L).toInt
    val blocks = cfg.longOr("blocks", 4L).toInt
    val seed = cfg.longOr("seed", 11L)
    val mode = cfg.strOr("mode", "overwrite")
    // partition DIRS per block — decoupled from the bucket space: the
    // exact bucket is a data column and the dir key is bucket % P, so
    // signature width buys prefilter selectivity without exploding the
    // file system (2^width dirs of tiny files at small corpora; millions
    // of dirs at wide signatures). Probes prune on (block, pbucket) and
    // the residual bucket equality rides the scan.
    val pdirs = cfg.longOr("partition_dirs", 64L).toInt
    val width = h / blocks
    if (h % blocks != 0) throw new GraftConfigError("num_planes must be divisible by blocks")
    if (h > 64) throw new GraftConfigError(
      s"num_planes = $h exceeds 64: signatures pack into one 64-bit long, and " +
      "further planes would silently alias (shift amounts wrap mod 64)")
    if (width > 16) throw new GraftConfigError(
      s"num_planes/blocks = $width bits per block; cap is 16 — raise blocks or lower num_planes")
    if (pdirs < 1) throw new GraftConfigError("partition_dirs must be >= 1")

    val dim = ctx.primary.select(F.size(F.col(vecCol))).head(1).headOption match {
      case Some(r) => r.getInt(0)
      case None    => throw new GraftPlanError("index.build type=lsh: empty input, cannot infer dim")
    }
    val spark = ctx.spark
    if (mode == "append" &&
        GraftFs.isDir(IndexSnapshot.corpusDir(path)) &&
        !GraftFs.isDir(s"$path/meta"))
      throw new GraftConfigError(
        s"index.build type=lsh mode=append: $path has a corpus but no meta (a crashed " +
        "earlier build?) — parameters cannot be validated; rebuild with mode=overwrite")
    if (mode == "append" &&
        GraftFs.isDir(s"$path/meta")) {
      val m = IndexMeta.head(spark, s"$path/meta")
      if (m.schema.fieldNames.contains("band_planes")) throw new GraftConfigError(
        s"index.build type=lsh mode=append: the index at $path is bands-partitioned — " +
        "append with blocking = \"bands\", or rebuild with mode=overwrite")
      if (!m.schema.fieldNames.contains("pbuckets")) throw new GraftConfigError(
        s"index.build type=lsh mode=append: the index at $path predates the " +
        "(block, pbucket) layout — rebuild with mode=overwrite")
      val existing = (m.getAs[Int]("num_planes"), m.getAs[Int]("blocks"),
        m.getAs[Long]("seed"), m.getAs[Int]("dim"), m.getAs[Int]("pbuckets"))
      if (existing != ((h, blocks, seed, dim, pdirs))) throw new GraftConfigError(
        s"index.build type=lsh mode=append: parameters (num_planes=$h, blocks=$blocks, " +
        s"seed=$seed, dim=$dim, partition_dirs=$pdirs) differ from the existing index " +
        s"at $path $existing — appending would mix incompatible signatures")
    }

    val sig = DedupEmbeddingOp.hyperplaneSig(F.col(vecCol), dim, h, seed,
      ndExplode = true)
    val exploded = ctx.primary.withColumn("_sig", sig)
      .select(F.col("*"), F.posexplode(
        DedupEmbeddingOp.blockKeys(F.col("_sig"), blocks, width)).as(Seq("block", "bucket")))
      .drop("_sig")
      .withColumn("pbucket", (F.col("bucket") % pdirs).cast("int"))
    // co-locate each dir key before the partitioned write: without this
    // every INPUT partition emits a file into every populated dir —
    // input_partitions × blocks × pdirs tiny files vs one per dir
    exploded.repartition(F.col("block"), F.col("pbucket"))
      .write.mode(mode).partitionBy("block", "pbucket").parquet(IndexSnapshot.corpusDir(path))

    DriverParquet.overwrite(s"$path/meta", Seq(
      DriverParquet.I32("num_planes", Seq(h)), DriverParquet.I32("blocks", Seq(blocks)),
      DriverParquet.I64("seed", Seq(seed)), DriverParquet.I32("dim", Seq(dim)),
      DriverParquet.I32("pbuckets", Seq(pdirs))))
  }
}
