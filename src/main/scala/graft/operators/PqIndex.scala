package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import graft.config._
import graft.core._

/** Product quantization (PQ) for the IVF index — `index.build type=ivfpq`
  * and the ADC probe path of `knn.ivf`.
  *
  * The scale problem this solves: an IVF-flat index stores raw vectors, so
  * every probe reads 4·dim bytes per candidate row. At 100 TB of
  * embeddings that scan I/O — not the centroid ranking — is the cost. PQ
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011; the faiss IVFPQ layout) compresses each vector to `m` bytes:
  * the residual (vector − its cell centroid) splits into `m` subspaces and
  * each subspace slice is replaced by the id of its nearest entry in a
  * per-subspace codebook of `ksub ≤ 256` centers. A query then scores
  * candidates by Asymmetric Distance Computation (ADC): one m×ksub table of
  * partial dot products is built driver-side per query, and scoring a row
  * is m byte-indexed lookups instead of dim multiplies.
  *
  * Spark-first layout (all under `path`):
  *   corpus/    the input rows + `cell` + `pq_codes` (BINARY, m bytes) +
  *              `pq_vnorm` (DOUBLE, the exact vector norm — cosine needs
  *              it and one double per row is noise), partitionBy(cell).
  *              The raw vector column is KEPT in the same parquet: parquet
  *              is columnar, so the ADC scan that selects only
  *              (id, cell, pq_codes, pq_vnorm) never reads the vector
  *              bytes (column pruning IS the 4·dim/m I/O win, pinned in
  *              PqIndexSpec), while the exact rerank re-reads the vector
  *              column for just the candidate ids from the same pruned
  *              partitions — no second copy of the corpus.
  *   centroids/ (cell, centroid) — same shape as type=ivf, so
  *              index.compact, index.stats and the crash-swap repair all
  *              work unchanged.
  *   pq/        (subspace, code, center ARRAY<DOUBLE>) — m·ksub rows, tiny.
  *   meta/      (nlist, m, ksub, dim, seed).
  *
  * Training runs driver-side on a bounded sample (`max_train`, default
  * 10k): seeded Lloyd's iterations for the coarse quantizer and each
  * subspace codebook. That is the standard recipe (codebook quality needs
  * a sample, not the corpus) and keeps the whole build ONE distributed
  * encode pass over the input; nothing driver-side grows with the corpus.
  *
  * Probe contract (`knn.ivf` auto-detects `pq/`): rank centroids, prune to
  * `nprobe` cells (parquet partition pruning, same as IVF-flat), ADC-score
  * the pruned slice reading only the narrow columns, keep the top
  * `rerank·k` candidates, then re-score exactly (cosine on the raw vector
  * column, broadcast-joined on id) and return the top k. `rerank = 0`
  * skips the exact pass and returns rounded ADC scores (approximate —
  * rows-only gate territory). With nprobe = nlist and rerank·k ≥ the
  * corpus size the result is EXACTLY brute force, which is what the
  * knn_ivfpq_exhaustive gate pins against the DuckDB oracle.
  *
  * Reference scope note: conveyor has no vector indexes at all — this op,
  * like the rest of the index family, is part of the training-data
  * pipeline surface the brief asks for beyond reference parity.
  */
private[graft] object Pq {

  /** Deterministic Lloyd's k-means on a bounded in-memory sample. Seeded
    * k-means++ init over distinct points (k clamps to the distinct count —
    * duplicating a center would just split ties unstably); empty clusters
    * keep their previous center. Returns exactly `kEff` centers. */
  def lloyd(points: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "lloyd: empty sample")
    val dim = points(0).length
    // Array equality is by reference — dedupe by content
    val distinct = points.map(_.toSeq).distinct.map(_.toArray)
    val kEff = math.min(k, distinct.length)
    val rnd = new scala.util.Random(seed)
    // seeded k-means++ init (r13; was a shuffled draw): each next center
    // is drawn with probability ∝ squared distance to the nearest chosen
    // center — the standard spread-out init. Deterministic (seeded RNG,
    // sequential scan), O(kEff · n · dim) on a sample bounded by
    // max_train. Measurably better pruned recall than the shuffle init on
    // the same draw (AnnRecallSpec fixture: shuffle init read ivf
    // recall@10 = 0.59 where MLlib's k-means|| read 0.64; ++ init
    // recovers the spread the shuffle draw loses when two initial
    // centers land close together).
    def sqd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < dim) { val d = a(j) - b(j); s += d * d; j += 1 }
      s
    }
    val centers = new Array[Array[Double]](kEff)
    centers(0) = distinct(rnd.nextInt(distinct.length)).clone()
    val d2 = Array.fill(distinct.length)(Double.MaxValue)
    var ci = 1
    while (ci < kEff) {
      var i = 0
      var total = 0.0
      while (i < distinct.length) {
        val d = sqd(distinct(i), centers(ci - 1))
        if (d < d2(i)) d2(i) = d
        total += d2(i)
        i += 1
      }
      var pick = -1
      if (total > 0.0) {
        val target = rnd.nextDouble() * total
        var acc = 0.0
        i = 0
        while (i < distinct.length && pick < 0) {
          acc += d2(i)
          if (acc >= target && d2(i) > 0.0) pick = i
          i += 1
        }
      }
      if (pick < 0) {
        // numerically-degenerate tail (all remaining mass ~0): first
        // not-yet-chosen distinct point keeps the init total and
        // deterministic — distinct points guarantee one exists
        i = 0
        while (i < distinct.length && pick < 0) {
          if (d2(i) > 0.0) pick = i
          i += 1
        }
        if (pick < 0) pick = ci // unreachable with distinct points
      }
      centers(ci) = distinct(pick).clone()
      ci += 1
    }

    val assign = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      // assignment
      var i = 0
      while (i < points.length) {
        assign(i) = nearest(centers, points(i))
        i += 1
      }
      // update
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Int](kEff)
      i = 0
      while (i < points.length) {
        val c = assign(i); val p = points(i)
        var d = 0
        while (d < dim) { sums(c)(d) += p(d); d += 1 }
        counts(c) += 1
        i += 1
      }
      var c = 0
      while (c < kEff) {
        if (counts(c) > 0) {
          var d = 0
          while (d < dim) { centers(c)(d) = sums(c)(d) / counts(c); d += 1 }
        } // empty cluster: keep the previous center
        c += 1
      }
      it += 1
    }
    centers
  }

  /** Index of the L2-nearest center — ties keep the lower index, so
    * encode/probe decisions are deterministic. */
  def nearest(centers: Array[Array[Double]], p: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      var d = 0.0; var j = 0; val ctr = centers(c)
      while (j < p.length) { val x = p(j) - ctr(j); d += x * x; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Per-subspace codebooks over residual samples: codebooks(s)(code) is
    * the center of subspace s. Each subspace trains from its own slice
    * with its own derived seed. */
  def trainCodebooks(residuals: Array[Array[Double]], m: Int, ksub: Int,
      iters: Int, seed: Long): Array[Array[Array[Double]]] = {
    val dim = residuals(0).length
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val slice = residuals.map(r => java.util.Arrays.copyOfRange(r, s * dsub, (s + 1) * dsub))
      lloyd(slice, ksub, iters, seed + 7919L * (s + 1))
    }
  }

  /** Encode one vector: (cell, m-byte codes, exact norm). `cents` is the
    * coarse centroid array indexed by cell id. */
  def encode(v: Array[Double], cents: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): (Int, Array[Byte], Double) = {
    val cell = nearest(cents, v)
    val ctr = cents(cell)
    val dim = v.length
    val m = codebooks.length
    val dsub = dim / m
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val slice = new Array[Double](dsub)
      var j = 0
      while (j < dsub) { slice(j) = v(s * dsub + j) - ctr(s * dsub + j); j += 1 }
      codes(s) = (nearest(codebooks(s), slice) & 0xFF).toByte
      s += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j) * v(j); j += 1 }
    (cell, codes, math.sqrt(norm))
  }

  val TrainIters = 15

  /** Deterministic UNIFORM training draw for every quantizer/codebook
    * trainer. `df.limit(n)` takes the FIRST rows in plan order — a real
    * curated corpus is almost never in random order (it is sorted or
    * partitioned by source, domain, or time), so a plain limit trains the
    * quantizer on one domain's slice: coarse centroids crowd that domain,
    * the rest of the corpus piles into few cells, and every cell-pruned
    * probe loses selectivity. Ordering by a seeded content hash of the
    * vector de-correlates the draw from storage order while staying
    * deterministic (same rows + seed → same sample, any partitioning).
    * Cost: one TakeOrdered over the projected vector column — a bounded
    * per-partition top-k with an n·maxTrain driver merge, the same price
    * class as the limit it replaces plus the scan it was already paying.
    * The hash is the tie-order too (second key = the vector itself, so
    * even a 64-bit collision at the cutoff stays deterministic).
    *
    * r13: ONE canonical draw for every trainer (ivf, ivfpq, the in-op
    * codebook trainers) — the draw key is the hash folded into [0, 2^40)
    * and the footer-priced prefilter from the old MLlib path moved in
    * here: when the input is a pure parquet scan whose row count the
    * footers give for free (MixOp.scanRowCount) and it far exceeds the
    * sample, only rows whose key falls in the first 2·maxTrain/n of the
    * key space reach the TakeOrdered — the global top-maxTrain keys all
    * sit under that threshold except with probability e^(-maxTrain/4)
    * ≈ 0, so the draw is unchanged, but the top-k heap sees ~2·maxTrain
    * rows instead of the corpus (at 100 TB the draw costs a filtered
    * scan, not a corpus-wide heap). Duplicate vectors share one key, so
    * a duplicate-heavy corpus can starve the filtered draw — a short
    * filtered result falls back to the unfiltered draw (the detection is
    * free: the collected array length is the row count). Known cost
    * limitation, not a correctness one: the keep threshold is sized from
    * the FOOTER row count, which includes null-vector rows the isNotNull
    * filter drops — a null-heavy corpus therefore tends to run the
    * filtered draw short and pay both scans; the fallback keeps the draw
    * itself exact. */
  def trainSample(df: DataFrame, vec: org.apache.spark.sql.Column,
      maxTrain: Int, seed: Long): Array[Array[Double]] = {
    val projected = df.select(vec.cast("array<double>").alias("_v"))
      .filter(F.col("_v").isNotNull)
    val u = F.pmod(F.xxhash64(F.lit(seed), F.col("_v")), F.lit(1L << 40))
    def draw(src: DataFrame): Array[Array[Double]] =
      src.orderBy(u, F.col("_v")).limit(maxTrain)
        .collect().map(_.getSeq[Double](0).toArray)
    val filtered = MixOp.scanRowCount(df) match {
      case Some(nRows) if nRows > 4L * maxTrain =>
        val keep = math.max(1L,
          ((1L << 40).toDouble * 2.0 * maxTrain / nRows).toLong)
        Some(draw(projected.filter(u < F.lit(keep))))
      case _ => None
    }
    filtered match {
      case Some(s) if s.length >= maxTrain => s
      case _ => draw(projected)
    }
  }

  /** ivf/ivfpq cell-skew advisory — the cell-layout sibling of the bands
    * bucket-occupancy warning. A healthy coarse quantizer spreads the
    * corpus ~1/nlist per cell; when the hottest cell holds many multiples
    * of that share, fixed-nprobe probes lose recall balance (hot cells
    * dominate every candidate set, cold cells prune to nothing) — the
    * observable symptom of a quantizer trained on a non-uniform sample.
    * Pure, so the threshold is unit-testable. Returns the stderr line to
    * emit, or None while the spread is healthy. */
  def cellSkewWarning(op: String, cellRows: Iterable[Long], nlist: Int): Option[String] = {
    val total = cellRows.sum
    if (total == 0 || nlist <= 1) return None
    val maxRows = cellRows.max
    val ratio = maxRows.toDouble * nlist / total // 1.0 = perfectly balanced
    if (ratio <= 4.0) None
    else Some(
      f"[graft] $op: hottest cell holds $maxRows of $total corpus rows — " +
      f"${ratio}%.1fx the balanced 1/$nlist share. The coarse quantizer is " +
      "skewed (typical cause: training sample not representative of the " +
      "corpus); probes at fixed nprobe lose recall balance. Retrain with " +
      "mode=overwrite (larger max_train helps), or raise nlist.")
  }

  /** Per-cell corpus row counts straight from the parquet footers of the
    * cell-partitioned layout (`corpus/cell=N/part-*.parquet`) — metadata
    * only, O(files) driver reads, the same trick as index.stats. Files not
    * under a cell= dir (none in the ivf/ivfpq layout) are ignored. */
  def cellOccupancy(spark: SparkSession, corpusDir: String): Map[Int, Long] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val byCell = IndexSnapshot.files(corpusDir, s"cellOccupancy: no corpus at $corpusDir")
      .flatMap { f =>
        GraftFs.relativize(corpusDir, f).split('/')
          .find(_.startsWith("cell=")).map(_.stripPrefix("cell=").toInt -> f)
      }
    // footer opens are independent small reads dominated by per-open
    // latency (an nlist-cell index is >= nlist files) — read them on a
    // bounded driver pool instead of one at a time, same trick a parquet
    // scan's own footer phase uses. Runs after EVERY ivf/ivfpq build and
    // append, so this latency is on the build path, not just in stats.
    def rowsOf(f: String): Long = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).sum
      finally r.close()
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(1, byCell.size)))
    try {
      val counted = byCell.map { case (cell, f) =>
        cell -> pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = rowsOf(f)
        })
      }
      counted.groupBy(_._1).map { case (cell, fs) =>
        cell -> fs.map(_._2.get()).sum
      }
    } finally pool.shutdown()
  }

  /** Emit the cell-skew advisory for the index at `root` (ivf/ivfpq
    * layouts), swallowing measurement failures the way the bands advisory
    * does — guidance must never fail a build. Runs after every corpus
    * write, append included: occupancy is a property of the total. */
  def warnCellSkew(spark: SparkSession, root: String, op: String, nlist: Int): Unit =
    try {
      val occ = cellOccupancy(spark, IndexSnapshot.corpusDir(root))
      if (occ.nonEmpty) cellSkewWarning(op, occ.values, nlist).foreach(System.err.println)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[graft] $op cell-skew check skipped: ${e.getMessage}") }
}

private[graft] object PqIndex {
  import org.apache.spark.ml.linalg.Vectors

  /** The indexed vector column recorded at build time; "embedding" for
    * indexes predating the field. */
  def metaVectorColumn(meta: org.apache.spark.sql.Row): String =
    if (meta.schema.fieldNames.contains("vector_column"))
      meta.getAs[String]("vector_column")
    else "embedding"

  /** Listing-keyed cached like IvfCentroids.load — a probe loop must not
    * re-collect the m·ksub codebook table per query; read-only. */
  def loadCodebooks(spark: SparkSession, path: String,
      op: String): Array[Array[Array[Double]]] =
    IndexMeta.cached(s"$path/pq") {
      val rows = spark.read.parquet(s"$path/pq")
        .select("subspace", "code", "center").collect()
      if (rows.isEmpty) throw new GraftConfigError(
        s"$op: the index at $path has an empty pq/ codebook dir — rebuild with " +
        "index.build type=ivfpq mode=overwrite")
      val m = rows.map(_.getInt(0)).max + 1
      val books = Array.ofDim[Array[Array[Double]]](m)
      rows.groupBy(_.getInt(0)).foreach { case (s, rs) =>
        books(s) = rs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      }
      books
    }

  /** Column-chunk COMPRESSED bytes for the top-level columns in `cols`,
    * straight from the parquet footers — the bytes a column-pruned scan of
    * these files actually reads. Used by ScaleProbe's ivfpq rungs and by
    * index.stats' pq_scan_ratio (the per-index, measured version of the
    * BENCH_NOTES scan-bytes claim). O(files) driver footer reads. */
  def columnChunkBytes(spark: SparkSession, files: Seq[String],
      cols: Set[String]): Long = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala)
        .filter(c => cols.contains(c.getPath.iterator.next()))
        .map(_.getTotalSize).sum
      finally r.close()
    }.sum
  }

  /** index.build type=ivfpq. mode=overwrite trains; mode=append reuses the
    * FROZEN quantizer + codebooks (retraining either would fork the code
    * space — old rows' codes would decode against new codebooks). */
  def build(ctx: StageContext): Unit = {
    val cfg = ctx.cfg
    if (cfg.strOr("mode", "overwrite") == "append") return append(ctx)
    if (cfg.strOr("mode", "overwrite") != "overwrite") throw new GraftConfigError(
      s"index.build: mode must be overwrite|append, got '${cfg.strOr("mode", "")}'")
    val path = cfg.str("path")
    val vecCol = cfg.strOr("vector_column", "embedding")
    val nlist = cfg.longOr("nlist", 16L).toInt
    val m = cfg.longOr("m", 8L).toInt
    val ksub = cfg.longOr("ksub", 256L).toInt
    val seed = cfg.longOr("seed", 11L)
    val maxTrain = cfg.longOr("max_train", 10000L).toInt
    if (nlist < 1) throw new GraftConfigError("index.build type=ivfpq: nlist must be >= 1")
    if (m < 1) throw new GraftConfigError("index.build type=ivfpq: m must be >= 1")
    if (ksub < 2 || ksub > 256) throw new GraftConfigError(
      s"index.build type=ivfpq: ksub must be in [2, 256] (codes are one byte per subspace), got $ksub")
    Seq("cell", "pq_codes", "pq_vnorm").foreach(c =>
      if (ctx.primary.columns.contains(c)) throw new GraftConfigError(
        s"index.build type=ivfpq: input already has a '$c' column — rename it; " +
        "the index layout reserves cell/pq_codes/pq_vnorm"))

    val sample = Pq.trainSample(ctx.primary, F.col(vecCol), maxTrain, seed)
    if (sample.isEmpty) throw new GraftPlanError(
      "index.build type=ivfpq: empty input, nothing to train the quantizer on")
    val dim = sample(0).length
    if (dim % m != 0) throw new GraftConfigError(
      s"index.build type=ivfpq: vector dim $dim is not divisible by m=$m subquantizers")

    val cents = Pq.lloyd(sample, nlist, Pq.TrainIters, seed)
    val residuals = sample.map { v =>
      val c = cents(Pq.nearest(cents, v))
      Array.tabulate(dim)(j => v(j) - c(j))
    }
    val books = Pq.trainCodebooks(residuals, m, ksub, Pq.TrainIters, seed)

    writeCorpus(ctx, path, vecCol, cents, books, "overwrite")
    Pq.warnCellSkew(ctx.spark, path, "index.build type=ivfpq", cents.length)

    // centroids / codebooks / meta are driver-held, bounded tables (nlist,
    // m·ksub, 1 rows) — driver-side parquet writes, no Spark jobs
    DriverParquet.overwrite(s"$path/centroids", Seq(
      DriverParquet.I32("cell", cents.indices),
      DriverParquet.DblArr("centroid", cents.map(_.toSeq).toSeq)))
    val flat = books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (ctr, code) => (s, code, ctr.toSeq) }
    }.toSeq
    DriverParquet.overwrite(s"$path/pq", Seq(
      DriverParquet.I32("subspace", flat.map(_._1)),
      DriverParquet.I32("code", flat.map(_._2)),
      DriverParquet.DblArr("center", flat.map(_._3))))
    // ksub records the EFFECTIVE codebook size (lloyd clamps to the
    // distinct sample count), so probes and appends see the truth;
    // vector_column is a fact of the index — appends and probes resolve
    // the corpus-side column from here, not from per-query config
    DriverParquet.overwrite(s"$path/meta", Seq(
      DriverParquet.I32("nlist", Seq(nlist)), DriverParquet.I32("m", Seq(m)),
      DriverParquet.I32("ksub", Seq(books(0).length)), DriverParquet.I32("dim", Seq(dim)),
      DriverParquet.I64("seed", Seq(seed)), DriverParquet.Str("vector_column", Seq(vecCol))))
  }

  private def append(ctx: StageContext): Unit = {
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val spark = ctx.spark
    if (!GraftFs.isDir(s"$path/pq") || !GraftFs.isDir(s"$path/centroids") ||
        !GraftFs.isDir(s"$path/meta"))
      throw new GraftConfigError(
        s"index.build type=ivfpq mode=append: no complete ivfpq index at $path " +
        "(quantizer and codebooks are frozen at first build); run mode=overwrite first")
    val meta = IndexMeta.head(spark, s"$path/meta")
    // the corpus-side column name is a fact of the index; explicit config
    // may rename the INPUT's column but defaults follow the meta
    val vecCol = cfg.strOpt("vector_column").getOrElse(metaVectorColumn(meta))
    val (mM, mKsub, mDim, mSeed) = (meta.getAs[Int]("m"), meta.getAs[Int]("ksub"),
      meta.getAs[Int]("dim"), meta.getAs[Long]("seed"))
    // validate only the knobs the caller explicitly passed — the stored
    // values are facts of the frozen index, not re-derivable inputs
    cfg.longOpt("m").foreach(v => if (v.toInt != mM) throw new GraftConfigError(
      s"index.build type=ivfpq mode=append: m=$v differs from the index at $path (m=$mM)"))
    cfg.longOpt("ksub").foreach(v => if (v.toInt != mKsub) throw new GraftConfigError(
      s"index.build type=ivfpq mode=append: ksub=$v differs from the index at $path (ksub=$mKsub)"))
    cfg.longOpt("seed").foreach(v => if (v != mSeed) throw new GraftConfigError(
      s"index.build type=ivfpq mode=append: seed=$v differs from the index at $path (seed=$mSeed)"))
    ctx.primary.select(F.size(F.col(vecCol))).head(1).headOption.foreach { r =>
      if (r.getInt(0) != mDim) throw new GraftConfigError(
        s"index.build type=ivfpq mode=append: input vectors have length ${r.getInt(0)} " +
        s"but the index at $path was built with dim = $mDim")
    }
    Seq("cell", "pq_codes", "pq_vnorm").foreach(c =>
      if (ctx.primary.columns.contains(c)) throw new GraftConfigError(
        s"index.build type=ivfpq: input already has a '$c' column — rename it; " +
        "the index layout reserves cell/pq_codes/pq_vnorm"))
    val cents = IvfCentroids.load(spark, path, "index.build type=ivfpq mode=append")
      .map(_._2.toArray)
    val books = loadCodebooks(spark, path, "index.build type=ivfpq mode=append")
    writeCorpus(ctx, path, vecCol, cents, books, "append")
    Pq.warnCellSkew(ctx.spark, path, "index.build type=ivfpq mode=append", cents.length)
  }

  /** The one distributed pass: encode every row (cell + codes + norm) and
    * write cell-partitioned. Both the centroid array and the codebooks are
    * small (nlist·dim + m·ksub·dsub doubles) and ride the UDF closure —
    * an executor-side broadcast, nothing scales with the corpus. */
  private def writeCorpus(ctx: StageContext, path: String, vecCol: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      mode: String): Unit = {
    // centroids AND codebooks (m·ksub·dsub doubles — the heavy payload)
    // broadcast instead of closure-shipped per task binary; same Pq.encode
    val bcC = ctx.spark.sparkContext.broadcast(cents)
    val bcB = ctx.spark.sparkContext.broadcast(books)
    val enc = F.udf { v: Seq[Double] =>
      val (cell, codes, norm) = Pq.encode(v.toArray, bcC.value, bcB.value)
      (cell, codes, norm)
    }
    ctx.primary
      .withColumn("_enc", enc(F.col(vecCol).cast("array<double>")))
      .withColumn("cell", F.col("_enc._1"))
      .withColumn("pq_codes", F.col("_enc._2"))
      .withColumn("pq_vnorm", F.col("_enc._3"))
      .drop("_enc")
      .repartition(F.col("cell"))
      .write.mode(mode).partitionBy("cell").parquet(IndexSnapshot.corpusDir(path))
  }

  /** Single-query ADC probe for knn.ivf (index_path with a pq/ dir).
    * Output contract matches knn.ivf exactly: (idCol, cosine) top-k. */
  def probeSingle(ctx: StageContext, path: String, idCol: String,
      k: Int, nprobe0: Int, q: Seq[Double]): DataFrame = {
    val cfg = ctx.cfg
    val spark = ctx.spark
    val rerank = cfg.longOr("rerank", 4L).toInt
    if (rerank < 0) throw new GraftConfigError(
      s"knn.ivf: rerank must be >= 0 (0 = return ADC scores unreranked), got $rerank")
    val meta = IndexMeta.head(spark, s"$path/meta")
    val m = meta.getAs[Int]("m")
    val dim = meta.getAs[Int]("dim")
    // the corpus-side rerank column is a fact of the index, not a probe
    // knob — ignore the query side's vector_column naming here
    val corpusVec = metaVectorColumn(meta)
    if (q.length != dim) throw new GraftConfigError(
      s"knn.ivf: query vector has length ${q.length} but the index at $path has dim = $dim")
    val centsT = IvfCentroids.load(spark, path, "knn.ivf")
    val cents = centsT.map(_._2.toArray)
    val books = loadCodebooks(spark, path, "knn.ivf")
    val dsub = dim / m
    val qa = q.toArray
    val nprobe = math.min(nprobe0, cents.length)
    val probed = IvfCentroids.nearest(centsT, Vectors.dense(qa), nprobe)

    // driver-side ADC tables for THIS query: dot(q, centroid[cell]) per
    // cell, and dot(q_s, codebook[s][code]) per (subspace, code) — nlist +
    // m·ksub doubles, rebuilt per query, never touching the corpus
    val dotQC: Array[Double] = cents.map { c =>
      var d = 0.0; var j = 0
      while (j < dim) { d += qa(j) * c(j); j += 1 }
      d
    }
    val table: Array[Array[Double]] = Array.tabulate(m) { s =>
      books(s).map { ctr =>
        var d = 0.0; var j = 0
        while (j < dsub) { d += qa(s * dsub + j) * ctr(j); j += 1 }
        d
      }
    }
    var qn = 0.0
    qa.foreach(x => qn += x * x)
    val qnorm = math.sqrt(qn)

    val adc = F.udf { (cell: Int, codes: Array[Byte], vnorm: Double) =>
      if (vnorm == 0.0 || qnorm == 0.0) 0.0
      else {
        var dot = dotQC(cell)
        var s = 0
        while (s < m) { dot += table(s)(codes(s) & 0xFF); s += 1 }
        dot / (qnorm * vnorm)
      }
    }

    val corpus = spark.read.parquet(IndexSnapshot.corpusDir(path))
      .filter(F.col("cell").isin(probed.map(_.asInstanceOf[Any]): _*))
    // narrow scan: id + cell + codes + norm ONLY — parquet column pruning
    // keeps the raw vector bytes unread (PqIndexSpec pins the ReadSchema)
    val scored = corpus.select(F.col(idCol), F.col("cell"),
        F.col("pq_codes"), F.col("pq_vnorm"))
      .withColumn("_approx", adc(F.col("cell"), F.col("pq_codes"), F.col("pq_vnorm")))

    graft.functions.GraftFunctions.ensureRegistered(spark)
    val qLit = F.array(q.map(F.lit): _*)
    if (rerank == 0) {
      scored.orderBy(F.col("_approx").desc, F.col(idCol).asc).limit(k)
        .select(F.col(idCol), F.round(F.col("_approx"), 6).alias("cosine"))
    } else {
      // candidates by ADC, then EXACT cosine on just those ids — the raw
      // vector column is read only here, for rerank·k rows' worth of the
      // already-pruned cells, broadcast-joined (candidates are tiny)
      val cand = scored.orderBy(F.col("_approx").desc, F.col(idCol).asc)
        .limit(math.min(Int.MaxValue.toLong, rerank.toLong * k).toInt)
        .select(F.col(idCol))
      val cos = F.call_function("cosine_sim",
        F.col(corpusVec).cast("array<double>"), qLit)
      corpus.select(F.col(idCol), F.col(corpusVec))
        .join(F.broadcast(cand), Seq(idCol))
        .withColumn("cosine", F.round(cos, 6))
        .select(F.col(idCol), F.col("cosine"))
        .orderBy(F.col("cosine").desc, F.col(idCol).asc)
        .limit(k)
    }
  }
}
