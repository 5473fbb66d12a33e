package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types.LongType
import graft.config._
import graft.core._
import scala.jdk.CollectionConverters._

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

  /** stable FNV-1a over a string — used by the single-pass shingle UDFs;
    * the specific hash does not matter for Jaccard (distinct counts are
    * hash-invariant modulo 64-bit collisions), only determinism does. */
  @inline def fnv1a(s: CharSequence): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** distinct hashes of word n-gram shingles — ONE pass per doc in a UDF
    * (the expression form re-walks the token array per shingle, interpreted). */
  def shingleHashes(text: Column, n: Int): Column = {
    val udf = F.udf { t: String =>
      if (t == null) Array.empty[Long]
      else {
        val toks = t.toLowerCase.trim.split("\\s+")
        val set = new java.util.LinkedHashSet[Long]()
        if (toks.length < n) set.add(fnv1a(toks.mkString(" ")))
        else {
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i <= toks.length - n) {
            sb.setLength(0)
            var j = 0
            while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
            set.add(fnv1a(sb))
            i += 1
          }
        }
        val out = new Array[Long](set.size)
        val it = set.iterator(); var i = 0
        while (it.hasNext) { out(i) = it.next(); i += 1 }
        out
      }
    }
    udf(text)
  }

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
  /** Single-pass UDF, not k chained array_min(transform(...)) exprs:
    * Catalyst higher-order functions evaluate INTERPRETED per element, so
    * k=128 separate traversals of a 400-hash array cost ~100x a tight JVM
    * loop computing all k minima in one pass. Values are identical to the
    * expression form (same seeded coefficients, same pmod arithmetic). */
  def minhashSignature(hashes: Column, k: Int, seed: Long): Column = {
    // r14: native codegen expression (graft.functions.MinhashSignature) —
    // integer arithmetic identical to the scala UDF it replaced, minus the
    // per-row Seq[Long] boxing on |shingles| elements per document.
    graft.functions.GraftFunctions.ensureRegistered(
      org.apache.spark.sql.SparkSession.active)
    F.call_function("minhash_sig", hashes, F.lit(k), F.lit(seed))
  }
}

/** Shared LSH candidate→verify machinery for minhash/ngram dedup.
  *
  * Scale shape (the part that survives 100 TB):
  *  1. band-bucket self-join carries ONLY (id, sig) — the k-int signature,
  *     never the wide shingle arrays, so the candidate shuffle is narrow;
  *  2. cheap prefilter: minhash signature agreement (unbiased Jaccard
  *     estimator, k samples) must reach threshold - 0.3 (>= 4 sigma at
  *     k >= 32) — kills the mid-similarity candidate mass that a shared
  *     vocabulary produces, without touching shingle arrays;
  *  3. exact Jaccard verify re-joins shingle arrays BY ID only for the
  *     few surviving pairs.
  */
/** Collapse rows whose similarity KEY (text / vector) is bit-identical to
  * one representative (min id) BEFORE any LSH pairing. Training corpora are
  * dominated by exact copies, and a duplicate group of size g lands in the
  * same buckets and emits O(g²) candidate pairs; one hash shuffle on the
  * key finds the group in linear time and LSH then runs on DISTINCT keys
  * only. Identical keys have identical similarity to everything else, so
  * this is semantics-preserving for every downstream pair decision.
  */
object ExactCollapse {
  /** df must carry (idCol, keyCol). Returns (representatives, dropped ids
    * as one column `id`). The collapsed frame is persisted: both outputs
    * filter the same one-shuffle window pass, and without the persist each
    * branch would re-execute the scan + key shuffle.
    *
    * `rank`: optional survivor key (smaller struct wins lexicographically,
    * see DedupRank) — the representative becomes the group's BEST member
    * instead of its min id, so rep-level comparisons downstream are
    * best-vs-best. */
  def apply(df: DataFrame, idCol: String, keyCol: String,
            rank: Option[Column] = None,
            release: (() => Unit) => Unit = StageContext.KeepPinned): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
    val withRep = rank match {
      case None => df.withColumn("_rep_id", F.min(idCol).over(w))
      case Some(key) => df
        .withColumn("_rep_id", F.min(F.struct(key.alias("k"), F.col(idCol).alias("i")))
          .over(w).getField("i"))
    }
    val persisted = StageContext.pinWith(release, withRep)
    val dups = persisted.filter(F.col(idCol) =!= F.col("_rep_id"))
      .select(F.col(idCol).alias("id"))
    val reps = persisted.filter(F.col(idCol) === F.col("_rep_id")).drop("_rep_id")
    (reps, dups)
  }
}

/** Survivor-policy key for the near-dup families: `keep_by = <numeric
  * column>` keeps the highest-value duplicate (`keep_best = min` flips
  * it) instead of the lowest id — "keep the best-quality copy", the
  * production pick rule. The key is a struct ordered so SMALLER =
  * SURVIVOR: (±value, id), ties break to the lower id, and when every
  * value ties the behavior is exactly the default min-id policy. */
object DedupRank {
  def keyFor(cfg: graft.config.Cfg, idCol: String): Option[Column] =
    cfg.strOpt("keep_by").map { c =>
      val v = F.col(c).cast("double")
      val oriented = cfg.strOr("keep_best", "max") match {
        case "max" => -v
        case "min" => v
        case other => throw new GraftConfigError(
          s"keep_best must be max|min, got '$other'")
      }
      // nulls always lose: a null key sorts AFTER every real value
      F.coalesce(oriented, F.lit(Double.MaxValue))
    }

  /** (id, __rank) frame for pair-level decisions. */
  def ranks(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.select(F.col(idCol).alias("id"),
      F.struct(key.alias("k"), F.col(idCol).alias("i")).alias("__rank"))
}

/** Final pair → drop-set reduction, shared by every dedup family.
  *
  * - pairwise (default): drop `id_b` of every verified pair — a doc
  *   survives unless it DIRECTLY matches a lower-id doc. The documented
  *   approximation: in a chain a~c, b~c with a≁b, both a and b survive.
  * - `transitive = true`: connected components over the verified pairs by
  *   iterative min-label propagation (labels only decrease, so the sum is
  *   a monotone convergence witness) — exactly one doc (the component's
  *   min id) survives per near-dup cluster, the semantics large-scale
  *   training-data dedup pipelines standardize on. Iterations ∝ component
  *   diameter (tiny for dup clusters); each is two keyed joins, fully
  *   distributed.
  */
object DedupPairs {
  def dropped(pairs: DataFrame, transitive: Boolean): DataFrame =
    dropped(pairs, transitive, None)

  def dropped(pairs: DataFrame, transitive: Boolean,
              ranks: Option[DataFrame]): DataFrame =
    dropped(pairs, transitive, ranks, StageContext.KeepPinned)

  /** `ranks`: optional (id, __rank) survivor keys (DedupRank) — per pair
    * the LARGER rank drops (pairwise), or the component keeps only its
    * rank-minimal member (transitive). Absent = the default min-id
    * policy, byte-identical to before. */
  def dropped(pairs: DataFrame, transitive: Boolean, ranks: Option[DataFrame],
              release: (() => Unit) => Unit): DataFrame =
    (transitive, ranks) match {
      case (true, None)     => transitiveDropped(pairs, release)
      case (false, None)    => pairs.select(F.col("id_b").alias("id")).distinct()
      case (true, Some(r))  => transitiveRankedDropped(pairs, r, release)
      case (false, Some(r)) =>
        pairs
          .join(r.select(F.col("id").alias("id_a"), F.col("__rank").alias("__ra")), Seq("id_a"))
          .join(r.select(F.col("id").alias("id_b"), F.col("__rank").alias("__rb")), Seq("id_b"))
          .select(F.when(F.col("__ra") <= F.col("__rb"), F.col("id_b"))
            .otherwise(F.col("id_a")).alias("id"))
          .distinct()
    }

  /** Connected components with ranked survivors: labels are the rank
    * structs themselves (min propagates the component's best member);
    * convergence by changed-row count — rank keys are not numeric, so
    * the unranked path's monotone checksum does not apply. */
  private def transitiveRankedDropped(pairs0: DataFrame, ranks: DataFrame,
      release: (() => Unit) => Unit): DataFrame = {
    val pairs = StageContext.pinWith(release, pairs0.select("id_a", "id_b"))
    val edges = StageContext.pinWith(release, pairs.unionByName(
      pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))))
    var labels = StageContext.pinWith(release, pairs.select(F.col("id_a").alias("id"))
      .unionByName(pairs.select(F.col("id_b").alias("id"))).distinct()
      .join(ranks, Seq("id"))
      .select(F.col("id"), F.col("__rank").alias("label")))
    var iter = 0
    var done = labels.isEmpty
    while (!done && iter < 30) {
      val nbr = edges
        .join(labels.select(F.col("id").alias("id_b"), F.col("label").alias("_nbl")), Seq("id_b"))
        .groupBy("id_a").agg(F.min("_nbl").alias("_nbr"))
        .withColumnRenamed("id_a", "id")
      // pinWith on every generation: loop intermediates release eagerly
      // below (the registered release then double-unpersists — a no-op),
      // and the FINAL generation, which the returned plan reads, releases
      // when the surrounding pipeline finishes
      val next = StageContext.pinWith(release, labels.join(nbr, Seq("id"), "left")
        .select(F.col("id"),
          F.least(F.col("label"), F.coalesce(F.col("_nbr"), F.col("label"))).alias("label")))
      val changed = next.alias("n")
        .join(labels.alias("p"), F.col("n.id") === F.col("p.id"))
        .filter(F.col("n.label") =!= F.col("p.label")).limit(1).count()
      labels.unpersist(blocking = false)
      labels = next
      done = changed == 0
      iter += 1
    }
    labels.filter(F.col("label").getField("i") =!= F.col("id")).select("id")
  }

  def transitiveDropped(pairs0: DataFrame): DataFrame =
    transitiveDropped(pairs0, StageContext.KeepPinned)

  def transitiveDropped(pairs0: DataFrame,
      release: (() => Unit) => Unit): DataFrame = {
    val pairs = StageContext.pinWith(release, pairs0.select("id_a", "id_b"))
    val edges = StageContext.pinWith(release, pairs.unionByName(
      pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))))
    var labels = StageContext.pinWith(release, pairs.select(F.col("id_a").alias("id"))
      .unionByName(pairs.select(F.col("id_b").alias("id"))).distinct()
      .withColumn("label", F.col("id")))
    def checksum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var sum = checksum(labels)
    var iter = 0
    var done = sum.signum() == 0 && labels.isEmpty
    while (!done && iter < 30) {
      val nbr = edges
        .join(labels.select(F.col("id").alias("id_b"), F.col("label").alias("_nbl")), Seq("id_b"))
        .groupBy("id_a").agg(F.min("_nbl").alias("_nbr"))
        .withColumnRenamed("id_a", "id")
      val next = StageContext.pinWith(release, labels.join(nbr, Seq("id"), "left")
        .select(F.col("id"),
          F.least(F.col("label"), F.coalesce(F.col("_nbr"), F.col("label"))).alias("label")))
      val nextSum = checksum(next)
      labels.unpersist(blocking = false)
      labels = next
      done = nextSum.compareTo(sum) == 0
      sum = nextSum
      iter += 1
    }
    labels.filter(F.col("id") =!= F.col("label")).select("id")
  }
}

object LshVerify {
  /** signature-agreement prefilter headroom: a candidate must estimate at
    * least threshold - this before its shingles are ever touched (>= 4
    * sigma of the k-sample Jaccard estimator at k >= 32). Shared by the
    * self-join and cross-join paths — they MUST agree or the
    * incremental-vs-full-corpus equivalence breaks. */
  private val PrefilterSlack = 0.3

  /** (band_idx, band_hash, id_<side>) keys for the LSH bucket join — one
    * NARROW row per (doc, band). The signature itself does NOT ride the
    * band join (r13, guide §2.3 "project before the exchange"): sig is a
    * 128-long array (~1 KB) and the join shuffles rows × bands of them,
    * so carrying it multiplied the exchange bytes ~40× over the
    * (band_idx, band_hash, id) key rows; sigs and shingles re-attach by
    * id only for the candidates that survive the band-collision dedup. */
  private def bandedKeys(df: DataFrame, bands: Int, r: Int, side: String): DataFrame =
    df.select(F.col("id").alias(s"id_$side"),
      F.posexplode(F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
        b => F.xxhash64(F.concat_ws("_", F.slice(F.col("sig"), b * F.lit(r) + 1, F.lit(r)))))))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
      .select(s"id_$side", "band_idx", "band_hash")

  /** unbiased k-sample Jaccard estimate from signature agreement */
  private def sigAgreement(a: Column, b: Column, k: Int): Column =
    F.aggregate(F.zip_with(a, b, (x, y) => F.when(x === y, 1).otherwise(0)),
      F.lit(0), (acc, v) => acc + v).cast("double") / k

  /** sig + shingles re-attach and the agreement→exact-Jaccard verify
    * ladder over narrow (idL, idR) candidates. One hash join per side
    * attaches BOTH columns; the agreement prefilter and the exact verify
    * land in one codegen'd conjunction (inner filter first — Catalyst's
    * CombineFilters keeps the evaluation order, so jaccard_sim still only
    * runs on prefilter survivors). */
  private def verify(candidates: DataFrame, left: DataFrame, right: DataFrame,
      lId: String, rId: String, k: Int, threshold: Double): DataFrame =
    candidates
      .join(left.select(F.col("id").alias(lId), F.col("sig").alias("_sg_l"),
        F.col("shingles").alias("sh_l")), lId)
      .join(right.select(F.col("id").alias(rId), F.col("sig").alias("_sg_r"),
        F.col("shingles").alias("sh_r")), rId)
      .filter(sigAgreement(F.col("_sg_l"), F.col("_sg_r"), k) >=
        math.max(0.0, threshold - PrefilterSlack))
      .withColumn("jaccard", F.call_function("jaccard_sim", F.col("sh_l"), F.col("sh_r")))
      .filter(F.col("jaccard") >= threshold)

  /** input: (id, shingles, sig). Returns verified near-dup PAIRS
    * (id_a < id_b); reduce with DedupPairs.dropped. */
  def verifiedPairs(hashed: DataFrame, bands: Int, r: Int, k: Int, threshold: Double): DataFrame = {
    val candidates = bandedKeys(hashed, bands, r, "a")
      .join(bandedKeys(hashed, bands, r, "b"), Seq("band_idx", "band_hash"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    verify(candidates, hashed, hashed, "id_a", "id_b", k, threshold)
      .select("id_a", "id_b")
  }

  /** Cross-frame variant: verified near-dup pairs BETWEEN two pre-hashed
    * frames (both (id, shingles, sig) under the same signature config) —
    * the incremental-dedup probe shape: `left` = the new batch, `right` =
    * the persisted corpus index. Same banding/prefilter/verify ladder as
    * the self-join; candidate rows stay narrow (ids + sigs), shingles
    * join back by id only for surviving candidates. Returns (id_l, id_r). */
  def verifiedCrossPairs(left: DataFrame, right: DataFrame,
      bands: Int, r: Int, k: Int, threshold: Double): DataFrame =
    verifiedCrossPairsScored(left, right, bands, r, k, threshold)
      .select("id_l", "id_r")

  /** As [[verifiedCrossPairs]] but keeps the exact Jaccard — the
    * join.similar index-probe shape, where the score is part of the
    * output rather than just the drop criterion. */
  def verifiedCrossPairsScored(left: DataFrame, right: DataFrame,
      bands: Int, r: Int, k: Int, threshold: Double): DataFrame = {
    val candidates = bandedKeys(left, bands, r, "l")
      .join(bandedKeys(right, bands, r, "r"), Seq("band_idx", "band_hash"))
      .select("id_l", "id_r")
      .dropDuplicates("id_l", "id_r")
    verify(candidates, left, right, "id_l", "id_r", k, threshold)
      .select("id_l", "id_r", "jaccard")
  }

  /** exact Jaccard over (already-distinct) hash arrays — hash-set loop
    * instead of interpreted array_intersect/array_union per pair. */
  val jaccardUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    F.udf { (a: Seq[Long], b: Seq[Long]) =>
      val sa = new java.util.HashSet[java.lang.Long](a.length * 2)
      a.foreach(sa.add(_))
      val sb = new java.util.HashSet[java.lang.Long](b.length * 2)
      var inter = 0
      b.foreach { x => if (sb.add(x) && sa.contains(x)) inter += 1 }
      val union = sa.size + sb.size - inter
      if (union == 0) 1.0 else inter.toDouble / union
    }
}

/** Spread a (possibly single-partition) input across all cores before a
  * CPU-bound per-row stage. `parallelism` config overrides; a no-op when
  * the frame already has enough partitions. */
object Parallelize {
  def apply(ctx: StageContext): DataFrame = {
    val want = ctx.cfg.longOr("parallelism",
      ctx.spark.sparkContext.defaultParallelism.toLong).toInt
    val df = ctx.primary
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
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

  /** 128-bit content key over the dedup columns — md5 (not xxhash64) so
    * collisions are out of reach at any corpus size where a 64-bit
    * birthday bound is not (~4B rows). Each column contributes a
    * FIXED-WIDTH token — 'n' for null, 'v' + md5(value) otherwise — and
    * the key is the md5 of the token concatenation: no input byte
    * sequence can shift a column boundary (a separator-join would let
    * ("x<sep>y","z") alias ("x","y<sep>z")) and no value can impersonate
    * null (a sentinel would collide with a literal occurrence of
    * itself). */
  private[operators] def contentKey(cols: Seq[String]): Column =
    F.md5(F.concat(cols.map { c =>
      F.when(F.col(c).isNull, F.lit("n"))
        .otherwise(F.concat(F.lit("v"), F.md5(F.col(c).cast("string").cast("binary"))))
    }: _*).cast("binary"))

  def apply(ctx: StageContext): DataFrame = {
    ctx.cfg.strOpt("index_path") match {
      case None       => dedupBatch(ctx)
      case Some(path) =>
        // keep=last would pick the batch's newest copy and the index
        // anti-join would then silently invert that to index-wins — the
        // half-applied-policy trap dedup.minhash rejects too
        if (ctx.cfg.strOr("keep", "any") == "last") throw new GraftConfigError(
          "dedup.exact: keep=last is not supported with index_path — the index " +
          "(already-ingested rows) always wins, which contradicts keep-the-latest; " +
          "use keep=first|any")
        incremental(ctx, path, dedupBatch(ctx))
    }
  }

  private def dedupBatch(ctx: StageContext): DataFrame = {
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

  /** `index_path` — drop batch rows whose content key is already in an
    * `index.build type=exact` corpus (after the within-batch keep rule):
    * exact dedup of a new ingestion batch against everything already
    * ingested, via one anti-join on narrow 128-bit keys — the corpus
    * text itself is never read again. Same snapshot/append contract as
    * dedup.minhash index_path: the file list is fixed at plan time, and
    * `index_append = true` adds the survivors' keys on pipeline success. */
  private def incremental(ctx: StageContext, path: String, batchDeduped: DataFrame): DataFrame = {
    val cfg = ctx.cfg
    val spark = ctx.spark
    val cols = cfg.strListOr("columns", ctx.primary.columns.toVector)
    // missing index under CLI explain → empty placeholder (the earlier
    // skipped index.build barrier would have created it); see minhash
    val placeholder = cfg.boolOr("_explain_only", false) &&
      !GraftFs.isDir(s"$path/meta")
    if (!placeholder) {
      if (!GraftFs.isDir(s"$path/meta"))
        throw new GraftPlanError(
          s"dedup.exact: no exact-dedup index at $path — run index.build type=exact first")
      val metaRow = IndexMeta.head(spark, s"$path/meta")
      val metaCols = metaRow.getSeq[String](metaRow.fieldIndex("columns")).toVector
      if (metaCols != cols.toVector) throw new GraftConfigError(
        s"dedup.exact: columns ${cols.mkString(", ")} conflict with the index at $path " +
        s"(built over ${metaCols.mkString(", ")}) — keys would never match")
    }

    val streamTag = cfg.strOpt("_stream_batch_tag")
    val corpusSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType)))
    val index =
      if (placeholder) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], corpusSchema)
      else IndexSnapshot.read(spark, IndexSnapshot.corpusDir(path),
        s"dedup.exact: no exact-dedup index at $path — run index.build type=exact first",
        corpusSchema, excludeDir = streamTag)
    val keyed = batchDeduped.withColumn("_key", contentKey(cols))
    val result = keyed
      .join(index.select(F.col("key").alias("_key")), Seq("_key"), "left_anti")

    if (cfg.boolOr("index_append", false)) {
      IndexSnapshot.claimAppend(ctx, "dedup.exact", path)
      if (!cfg.boolOr("_explain_only", false))
        DeferredAppend(ctx, path, streamTag,
          result.select(F.col("_key").alias("key")).distinct()) { rows =>
          rows.withColumn("_key", contentKey(cols))
            .select(F.col("_key").alias("key")).distinct()
        }
    }
    result.drop("_key")
  }
}

/** Driver-side cache of index `meta/` tables, keyed by the dir's file
  * listing (names + lengths): every incremental probe reads one tiny
  * 1-row parquet per invocation, which in a streaming query means one
  * Spark job PER MICRO-BATCH for a table that cannot change while the
  * query holds the index lease. A driver FS listing (no job) detects the
  * only way the meta can legitimately change — a rebuild writes fresh
  * part-file names — and invalidates; everything else is served from
  * memory. Bounded: one small Row per distinct index path per JVM. */
private[graft] object IndexMeta {
  /** LRU-bounded: entries hold not just 1-row meta Rows but full IVF
    * centroid tables and m·ksub PQ codebooks — a long-lived session
    * touching many indexes must not grow driver memory without bound. 64
    * indexes × the largest payload class (a few MB of centroids) keeps the
    * cache useful for every realistic probe loop while capping the worst
    * case; eviction just means the next probe re-pays one small load job. */
  private val MaxEntries = 64
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (String, Any)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Any)]): Boolean =
        size() > MaxEntries
    })

  private def listing(dir: String): String =
    GraftFs.listFilesRec(dir).map { case (f, len) => s"$f:$len" }.sorted.mkString("|")

  /** Listing-keyed driver cache for any small loaded artifact of an index
    * subdirectory (meta rows, centroid tables, PQ codebooks): each load is
    * a Spark job, and probe LOOPS (knn batches, index.recall's q probes,
    * every micro-batch of a stream) re-pay it per call for tables that
    * only change when a rebuild writes fresh part files — which the
    * listing detects for one driver FS list, no job. A throwing load is
    * not cached (empty-table errors stay loud per call). */
  def cached[T](dir: String)(load: => T): T =
    cachedAs(dir, "")(load)

  /** As [[cached]], but namespaced: two different payloads of the SAME
    * directory (head() Rows vs schema field sets) must not share a cache
    * slot. The listing key is always taken on the real `dir`. */
  private def cachedAs[T](dir: String, ns: String)(load: => T): T = {
    val key = GraftFs.qualified(dir) + ns
    val lst = listing(dir)
    val hit = cache.get(key)
    if (hit != null && hit._1 == lst) hit._2.asInstanceOf[T]
    else {
      val v = load
      cache.put(key, (lst, v))
      v
    }
  }

  def head(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.Row =
    cached(dir)(spark.read.parquet(dir).head())

  /** Field names of a meta table from the parquet FOOTER alone — a
    * driver-side schema read, no Spark job and no row materialization, for
    * callers that dispatch on which fields exist (index family detection)
    * rather than on values. Works on a zero-row meta table too, where
    * head() would throw. */
  def schemaFields(spark: org.apache.spark.sql.SparkSession, dir: String): Set[String] =
    cachedAs(dir, "#schema")(spark.read.parquet(dir).schema.fieldNames.toSet)
}

/** Plan-time snapshot of an index corpus directory: parquet dir reads
  * re-list at execution, so an `index_append` firing before the result is
  * consumed would otherwise let a batch match itself. */
private[graft] object IndexSnapshot {
  /** Active corpus directory of the index at `root`. Classic layout: the
    * `corpus` dir. Generation-pointer layout (what `index.compact` commits
    * on stores WITHOUT atomic rename — see DESIGN_NOTES "Object-store
    * commit semantics"): `corpus.ptr` names the live `corpus-NNNNNN`
    * generation, and this resolver is the ONE place every reader, append,
    * and maintenance verb goes through, so the pointer commit (a single
    * small-file PUT, atomic everywhere) switches all of them at once. */
  def corpusDir(root: String): String = {
    val ptr = s"$root/corpus.ptr"
    if (GraftFs.isFile(ptr)) {
      val gen = GraftFs.readString(ptr).trim
      if (gen.isEmpty || gen.contains('/') || !gen.startsWith("corpus-"))
        throw new GraftPlanError(
          s"index at $root: corpus.ptr names '$gen' — not a corpus-NNNNNN generation")
      s"$root/$gen"
    } else s"$root/corpus"
  }

  /** Drop generation-layout state on a mode=overwrite rebuild: the fresh
    * corpus writes to the classic dir, so a surviving pointer would alias
    * the new index to a stale generation. */
  def resetGenerations(root: String): Unit = {
    GraftFs.deleteIfExists(s"$root/corpus.ptr")
    GraftFs.listDirNames(root).filter(_.startsWith("corpus-"))
      .foreach(g => GraftFs.deleteRec(s"$root/$g"))
  }

  /** One appender per index per pipeline run: each `index_append` stage
    * snapshots the corpus file list at plan time and fires its append only
    * after all sinks succeed, so two appenders in one pipeline would each
    * miss the other's survivors and both append — duplicates would enter
    * the index with no warning. Claimed at PLAN time so `explain` rejects
    * the pipeline too. */
  def claimAppend(ctx: graft.core.StageContext, op: String, path: String): Unit = {
    val key = "index_append:" + GraftFs.qualified(path)
    if (!ctx.claimOnce(key)) throw new GraftConfigError(
      s"$op: two stages in one pipeline register index_append = true for the index at " +
      s"$path — each snapshots the corpus before the other's deferred append fires, so " +
      "neither batch dedups against the other's survivors and duplicates silently enter " +
      "the index; run the batches as separate pipeline runs (one appender per index per run)")
  }

  /** Append `df` to the flat corpus dir. Batch mode (no tag): a plain
    * parquet append under the shared batch/maintenance lease — the
    * success-deferral already guarantees it fires at most once per run;
    * the lease keeps it out of a concurrent compact's rewrite window (and
    * off an index a live stream.ingest holds). Streaming mode (tag set):
    * OVERWRITE of `corpus/<tag>/` — a micro-batch retry re-lands its
    * append idempotently instead of duplicating it, and the paired
    * `excludeDir` probe filter keeps the retry from self-matching first;
    * the streaming query holds the lease for its whole lifetime, so no
    * per-batch claim here. */
  def append(df: DataFrame, corpusDir: String, streamTag: Option[String]): Unit = {
    // appending into the missing-corpus window of a crashed compact would
    // fork a fresh corpus that the repair would then discard — repair
    // first, INSIDE the lease for the batch path (an unleased repairer
    // racing a live swap-mode compact's two-rename window would "repair"
    // a protocol mid-flight); the streaming path runs under its query's
    // lease already
    val parent = GraftFs.path(corpusDir).getParent
    streamTag match {
      case None =>
        val root = if (parent != null) parent.toString else corpusDir
        graft.streaming.IngestLease.withBatchLease(root, "index_append") {
          if (parent != null) IndexMaintenance.recoverSwap(parent.toString)
          df.write.mode("append").parquet(corpusDir)
        }
      case Some(tag) =>
        if (parent != null) IndexMaintenance.recoverSwap(parent.toString)
        df.write.mode("overwrite").parquet(s"$corpusDir/$tag")
    }
  }

  /** Snapshot-read the corpus as parquet, treating a part-file-less dir as
    * an EMPTY index of `emptySchema` (index.build over empty input writes
    * only _SUCCESS; `spark.read.parquet()` with zero paths would fail with
    * an unrelated 'unable to infer schema'). `basePath` set = recover the
    * partition dirs' columns (the lsh layout). */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String, missingMsg: String,
           emptySchema: org.apache.spark.sql.types.StructType,
           basePath: Boolean = false, excludeDir: Option[String] = None): DataFrame = {
    val fs = files(dir, missingMsg, excludeDir)
    if (fs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
    else {
      val reader = spark.read
      // basePath must be qualified the same way as the listed file paths
      // (which come back fully qualified from the Hadoop listing) or
      // partition-column recovery misses
      (if (basePath) reader.option("basePath", GraftFs.qualified(dir)) else reader)
        .parquet(fs: _*)
    }
  }

  /** `excludeDir`: skip part files under a subdirectory with this exact
    * name — the streaming-ingest retry shape: a re-run micro-batch must
    * not probe against its OWN failed-attempt append (`corpus/<tag>/`) or
    * every row would self-match and the retry would emit nothing. */
  def files(dir: String, missingMsg: String, excludeDir: Option[String] = None): Vector[String] =
    filesWithLen(dir, missingMsg, excludeDir).map(_._1)

  /** Same snapshot listing with file lengths — one recursive Hadoop
    * listFiles call (a single namenode iterator / object-store LIST, not a
    * per-directory walk), so fragmentation stats come for free. */
  def filesWithLen(dir: String, missingMsg: String,
      excludeDir: Option[String] = None): Vector[(String, Long)] = {
    val p = GraftFs.path(dir)
    // a previous index.compact may have died mid-swap — repair before
    // listing, so no reader observes a missing/partial corpus generation
    if (p.getName == "corpus" && p.getParent != null)
      IndexMaintenance.recoverSwap(p.getParent.toString)
    if (!GraftFs.isDir(dir)) throw new GraftPlanError(missingMsg)
    GraftFs.listFilesRec(dir).filter { case (f, _) =>
      val name = f.substring(f.lastIndexOf('/') + 1)
      name.startsWith("part-") && name.endsWith(".parquet") &&
      // skip Spark's uncommitted output (_temporary attempt dirs from a
      // crashed append/build) and any other hidden dirs — committed
      // part files live DIRECTLY under the corpus dir
      !GraftFs.relativize(dir, f).split('/').exists { s =>
        s.startsWith("_") || s.startsWith(".") || excludeDir.contains(s)
      }
    }
  }

  /** ADVISORY row-count estimate from a BOUNDED footer sample: read at
    * most `maxFooters` footers and extrapolate by byte share. At gate
    * scale (files <= maxFooters) this is exact — identical to
    * [[footerRows]]; at 100 TB (10^5-10^6 corpus files) the exact sum
    * would be a driver metadata storm on every build, and the occupancy
    * advisory only needs the magnitude (its threshold is a power of two).
    * Deterministic: the sample is the lexicographic head of the sorted
    * listing. */
  def footerRowsEstimate(filesWithLen: Seq[(String, Long)],
      maxFooters: Int = 1024): Long = {
    if (filesWithLen.isEmpty) return 0L
    if (filesWithLen.size <= maxFooters) return footerRows(filesWithLen.map(_._1))
    val sorted = filesWithLen.sortBy(_._1)
    val sample = sorted.take(maxFooters)
    val sampleRows = footerRows(sample.map(_._1))
    val sampleBytes = math.max(1L, sample.map(_._2).sum)
    val totalBytes = filesWithLen.map(_._2).sum
    math.round(sampleRows.toDouble * totalBytes / sampleBytes)
  }

  /** Total row count of `files` straight from the parquet footers —
    * metadata only, pooled driver reads (the index.stats / cellOccupancy
    * trick), ZERO Spark jobs. Replaces `spark.read.parquet(...).count()`
    * on advisory paths: a count() plans and schedules a whole Spark job
    * over every file to learn numbers the footers already hold. */
  def footerRows(files: Seq[String]): Long = {
    import scala.jdk.CollectionConverters._
    if (files.isEmpty) return 0L
    val conf = GraftFs.hadoopConf
    def rowsOf(f: String): Long = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).sum
      finally r.close()
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, files.size))
    try files.map(f => pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = rowsOf(f)
    })).map(_.get()).sum
    finally pool.shutdown()
  }
}

/** Success-deferred index append with the STREAMING read-back shortcut,
  * shared by the flat-layout dedup families (exact/minhash/ngram/simhash;
  * dedup.embedding's banded partitioned write has its own copy of the same
  * idea). Batch mode pins the plan-side survivors frame and appends it on
  * success. Streaming mode (`_stream_readback_dir` set by the sink)
  * instead re-reads the batch's just-written output partition inside the
  * deferred action — one columnar scan of exactly the survivor rows,
  * replacing a re-run of the whole probe DAG (the r12 job-count work) —
  * and re-derives the index rows from it: signatures are deterministic
  * functions of the content, so derive(written rows) ≡ the plan-side
  * signature frame. It is also the stronger consistency statement (the
  * index grows by what the output durably holds), and an all-duplicates
  * batch (no partition written) appends nothing at zero jobs. */
private[graft] object DeferredAppend {
  def apply(ctx: graft.core.StageContext, path: String, streamTag: Option[String],
      planSurvivors: => DataFrame)(derive: DataFrame => DataFrame): Unit = {
    val readback = ctx.cfg.strOpt("_stream_readback_dir").filter(_ => streamTag.isDefined)
    readback match {
      case Some(rb) =>
        ctx.deferToSuccess { () =>
          if (GraftFs.isDir(rb) &&
              GraftFs.listFilesRec(rb).exists(_._1.endsWith(".parquet"))) {
            val rows = ctx.spark.read.parquet(rb)
              .select(ctx.primary.columns.map(F.col).toIndexedSeq: _*)
            IndexSnapshot.append(derive(rows), IndexSnapshot.corpusDir(path), streamTag)
          }
        }
      case None =>
        val pinned = ctx.pin(planSurvivors)
        ctx.deferToSuccess(() =>
          IndexSnapshot.append(pinned, IndexSnapshot.corpusDir(path), streamTag))
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
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
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

    // small source files arrive as 1-2 partitions; the signature loop is
    // CPU-bound per row, so spread it across the cluster first
    val rankKey = DedupRank.keyFor(cfg, "id")
    val base = Parallelize(ctx).select(
      Seq(F.col(id).alias("id"), F.col(text).alias("_txt")) ++
        cfg.strOpt("keep_by").map(F.col): _*)
    val (reps, exactDups) = ExactCollapse(base, "id", "_txt", rankKey, ctx.deferToCleanup)
    val hashed = ctx.pin(reps.select(F.col("id"),
        Shingles.shingleHashes(F.col("_txt"), n).alias("shingles"))
      .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), k, seed)))

    exactDups.unionByName(DedupPairs.dropped(
      LshVerify.verifiedPairs(hashed, bands, r, k, threshold),
      cfg.boolOr("transitive", false),
      rankKey.map(DedupRank.ranks(base, "id", _)), ctx.deferToCleanup)).distinct()
  }

  def apply(ctx: StageContext): DataFrame = {
    val id = ctx.cfg.str("id_column")
    val dups = ctx.cfg.strOpt("index_path") match {
      case Some(path) => incrementalDuplicateIds(ctx, path)
      case None       => duplicateIds(ctx)
    }
    ctx.primary.join(dups, ctx.primary(id) === dups("id"), "left_anti")
  }

  /** `index_path` mode — dedup THIS batch against a persisted
    * `index.build type=minhash` corpus (plus within-batch pairs) without
    * rescanning or re-hashing old text: the incremental-ingestion shape.
    * Signature parameters come from the index's meta (a conflicting
    * explicit config fails loud — mixed parameters would silently miss
    * every cross match). A batch doc drops when it near-matches ANY
    * indexed doc (the already-ingested corpus always wins — it cannot be
    * un-ingested) or any lower-id batch doc (the pairwise rule). With
    * batch ids above index ids this equals the full-corpus pairwise pass
    * — the correctness gate pins exactly that equivalence. keep_by /
    * transitive are batch-internal policies that cannot reach into an
    * immutable index — rejected loudly rather than half-applied.
    *
    * `index_append = true` registers a deferred write (fires only after
    * the surrounding pipeline's sinks succeed, kafka-commit style) adding
    * the batch's surviving representatives to `corpus/` — the next batch
    * then dedups against them too. */
  private def incrementalDuplicateIds(ctx: StageContext, path: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
    val cfg = ctx.cfg
    val spark = ctx.spark
    val id = cfg.str("id_column")
    val text = cfg.str("text_column")
    // value checks, not key-presence: an explicit transitive = false IS
    // the behavior this mode implements
    if (cfg.has("keep_by") || cfg.boolOr("transitive", false))
      throw new GraftConfigError(
        "dedup.minhash: keep_by / transitive=true are not supported with index_path " +
        "(the index is immutable — only the pairwise min-id policy is well-defined)")

    // CLI explain of a pipeline whose EARLIER index.build stage would have
    // created the index (the barrier is skipped under explain): plan
    // against an empty placeholder index with config-default parameters
    // instead of failing — same contract as kafka.consume's missing-topic
    // placeholder
    val explainOnly = cfg.boolOr("_explain_only", false)
    val placeholder = explainOnly &&
      !GraftFs.isDir(s"$path/meta")
    val (n, k, bands, seed) =
      if (placeholder)
        (cfg.longOr("shingle_size", 3L).toInt, cfg.longOr("num_hashes", 128L).toInt,
         cfg.longOr("bands", 32L).toInt, cfg.longOr("seed", 42L))
      else {
        if (!GraftFs.isDir(s"$path/meta"))
          throw new GraftPlanError(
            s"dedup.minhash: no minhash index at $path — run index.build type=minhash first")
        val meta = IndexMeta.head(spark, s"$path/meta")
        val vals = (meta.getAs[Int]("shingle_size"), meta.getAs[Int]("num_hashes"),
          meta.getAs[Int]("bands"), meta.getAs[Long]("seed"))
        Seq(("shingle_size", vals._1.toLong), ("num_hashes", vals._2.toLong),
            ("bands", vals._3.toLong), ("seed", vals._4)).foreach { case (key, v) =>
          cfg.longOpt(key).filter(_ != v).foreach(conflicting =>
            throw new GraftConfigError(s"dedup.minhash: $key = $conflicting conflicts with " +
              s"the index at $path ($key = $v) — cross matches would silently miss"))
        }
        vals
      }
    val threshold = cfg.doubleOr("threshold", 0.8)
    val r = k / bands

    val base = Parallelize(ctx).select(F.col(id).alias("id"), F.col(text).alias("_txt"))
    val (reps, exactDups) = ExactCollapse(base, "id", "_txt", None, ctx.deferToCleanup)
    val hashed = ctx.pin(reps.select(F.col("id"),
        Shingles.shingleHashes(F.col("_txt"), n).alias("shingles"))
      .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), k, seed)))

    // SNAPSHOT the corpus file list now: parquet dir reads re-list at
    // execution, so an index_append firing before the result is consumed
    // (direct mode, or a second sink) would otherwise make the batch
    // match ITSELF in the index and drop everything
    val streamTag = cfg.strOpt("_stream_batch_tag")
    val corpusSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", hashed.schema("id").dataType),
      org.apache.spark.sql.types.StructField("shingles",
        org.apache.spark.sql.types.ArrayType(LongType)),
      org.apache.spark.sql.types.StructField("sig",
        org.apache.spark.sql.types.ArrayType(LongType))))
    val index =
      if (placeholder) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], corpusSchema)
      else IndexSnapshot.read(spark, IndexSnapshot.corpusDir(path),
        s"dedup.minhash: no minhash index at $path — run index.build type=minhash first",
        corpusSchema, excludeDir = streamTag)
    val vsIndex = LshVerify.verifiedCrossPairs(hashed, index, bands, r, k, threshold)
      .select(F.col("id_l").alias("id"))
    val inBatch = DedupPairs.dropped(
      LshVerify.verifiedPairs(hashed, bands, r, k, threshold),
      transitive = false, None, ctx.deferToCleanup)
    val dropped = exactDups.unionByName(vsIndex).unionByName(inBatch).distinct()

    if (cfg.boolOr("index_append", false)) {
      IndexSnapshot.claimAppend(ctx, "dedup.minhash", path)
      // survivors' representatives join the index only once the pipeline
      // durably wrote its outputs — a failed run must not grow the index
      if (!cfg.boolOr("_explain_only", false))
        DeferredAppend(ctx, path, streamTag,
          hashed.join(dropped, Seq("id"), "left_anti")) { rows =>
          rows.select(F.col(id).alias("id"),
              Shingles.shingleHashes(F.col(text), n).alias("shingles"))
            .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), k, seed))
        }
    }
    dropped
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

  /** pigeonhole (block_idx, block_val) explode of (id, sig) rows —
    * blocks = maxDist+1, so two sigs within hamming maxDist share at
    * least one exact block. Shared by the self-join and the index probe
    * (block j = bits [j·width, (j+1)·width), last block takes the
    * remainder). */
  private def blockedSigs(sigs: DataFrame, maxDist: Int, side: String): DataFrame = {
    val blocks = maxDist + 1
    val width = 64 / blocks
    sigs.select(F.col("id").alias(s"id_$side"), F.col("sig").alias(s"sig_$side"),
      F.posexplode(F.array((0 until blocks).map { j =>
        val w = if (j == blocks - 1) 64 - j * width else width
        F.shiftrightunsigned(F.col("sig"), j * width)
          .bitwiseAND(F.lit(if (w == 64) -1L else (1L << w) - 1L))
      }: _*)))
      .withColumnRenamed("pos", "block_idx").withColumnRenamed("col", "block_val")
  }

  /** verified near-dup pairs (id_a < id_b) of one (id, sig) frame */
  private def selfNearPairs(sigs: DataFrame, maxDist: Int): DataFrame =
    blockedSigs(sigs, maxDist, "a").join(blockedSigs(sigs, maxDist, "b"),
        Seq("block_idx", "block_val"))
      .filter(F.col("id_a") < F.col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .filter(F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= maxDist)
      .select("id_a", "id_b")

  def duplicateIds(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val id = cfg.str("id_column")
    val text = cfg.str("text_column")
    val maxDist = cfg.longOr("max_distance", 3L).toInt

    val rankKey = DedupRank.keyFor(cfg, "id")
    val base = Parallelize(ctx).select(
      Seq(F.col(id).alias("id"), F.col(text).alias("_txt")) ++
        cfg.strOpt("keep_by").map(F.col): _*)
    val (reps, exactDups) = ExactCollapse(base, "id", "_txt", rankKey, ctx.deferToCleanup)
    val sigs = withSignature(reps, "id", "_txt")
    exactDups.unionByName(DedupPairs.dropped(selfNearPairs(sigs, maxDist),
      cfg.boolOr("transitive", false),
      rankKey.map(DedupRank.ranks(base, "id", _)), ctx.deferToCleanup)).distinct()
  }

  /** `index_path` — dedup THIS batch against an `index.build type=simhash`
    * corpus (plus within-batch pairs): the hamming sibling of the
    * incremental family — same contract (plan-time corpus snapshot,
    * success-deferred index_append, streaming batch-tag exclusion).
    * The signature has no tunable parameters, so there is no param
    * conflict to reject; `max_distance` is a probe-time knob and may
    * differ per batch. Candidates come from the pigeonhole cross join
    * on narrow (id, 64-bit sig) rows — the index is never rescanned. */
  private def incrementalDuplicateIds(ctx: StageContext, path: String): DataFrame = {
    val cfg = ctx.cfg
    val spark = ctx.spark
    val id = cfg.str("id_column")
    val text = cfg.str("text_column")
    if (cfg.has("keep_by") || cfg.boolOr("transitive", false))
      throw new GraftConfigError(
        "dedup.simhash: keep_by / transitive=true are not supported with index_path " +
        "(the index is immutable — only the pairwise min-id policy is well-defined)")
    val maxDist = cfg.longOr("max_distance", 3L).toInt
    val explainOnly = cfg.boolOr("_explain_only", false)
    val placeholder = explainOnly &&
      !GraftFs.isDir(s"$path/meta")
    if (!placeholder) {
      if (!GraftFs.isDir(s"$path/meta"))
        throw new GraftPlanError(
          s"dedup.simhash: no simhash index at $path — run index.build type=simhash first")
      val meta = IndexMeta.head(spark, s"$path/meta")
      if (!meta.schema.fieldNames.contains("simhash")) throw new GraftConfigError(
        s"dedup.simhash: the index at $path is not a simhash index — probe it with the " +
        "matching dedup family")
    }

    val base = Parallelize(ctx).select(F.col(id).alias("id"), F.col(text).alias("_txt"))
    val (reps, exactDups) = ExactCollapse(base, "id", "_txt", None, ctx.deferToCleanup)
    val sigs = ctx.pin(withSignature(reps, "id", "_txt"))

    val streamTag = cfg.strOpt("_stream_batch_tag")
    val corpusSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", sigs.schema("id").dataType),
      org.apache.spark.sql.types.StructField("sig", LongType)))
    val index =
      if (placeholder) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], corpusSchema)
      else IndexSnapshot.read(spark, IndexSnapshot.corpusDir(path),
        s"dedup.simhash: no simhash index at $path — run index.build type=simhash first",
        corpusSchema, excludeDir = streamTag)
    val vsIndex = blockedSigs(sigs, maxDist, "l")
      .join(blockedSigs(index, maxDist, "r"), Seq("block_idx", "block_val"))
      .filter(F.bit_count(F.col("sig_l").bitwiseXOR(F.col("sig_r"))) <= maxDist)
      .select(F.col("id_l").alias("id")).distinct()
    val inBatch = DedupPairs.dropped(selfNearPairs(sigs, maxDist),
      transitive = false, None, ctx.deferToCleanup)
    val dropped = exactDups.unionByName(vsIndex).unionByName(inBatch).distinct()

    if (cfg.boolOr("index_append", false)) {
      IndexSnapshot.claimAppend(ctx, "dedup.simhash", path)
      if (!explainOnly)
        DeferredAppend(ctx, path, streamTag,
          sigs.join(dropped, Seq("id"), "left_anti")) { rows =>
          withSignature(rows.select(F.col(id).alias("id"), F.col(text).alias("_txt")),
            "id", "_txt")
        }
    }
    dropped
  }

  def apply(ctx: StageContext): DataFrame = {
    val id = ctx.cfg.str("id_column")
    val dups = ctx.cfg.strOpt("index_path") match {
      case Some(path) => incrementalDuplicateIds(ctx, path)
      case None       => duplicateIds(ctx)
    }
    ctx.primary.join(dups, ctx.primary(id) === dups("id"), "left_anti")
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

  /** distinct character n-gram hashes of whitespace-normalized text — one
    * rolling pass per doc (the expression form re-normalizes the string per
    * gram, interpreted). */
  def charNgramHashes(textCol: String, n: Int): Column = {
    val udf = F.udf { t: String =>
      if (t == null) Array.empty[Long]
      else {
        val norm = t.toLowerCase.replaceAll("\\s+", " ")
        val set = new java.util.LinkedHashSet[Long]()
        if (norm.length <= n) set.add(Shingles.fnv1a(norm))
        else {
          var i = 0
          while (i <= norm.length - n) {
            set.add(Shingles.fnv1a(norm.subSequence(i, i + n)))
            i += 1
          }
        }
        val out = new Array[Long](set.size)
        val it = set.iterator(); var i = 0
        while (it.hasNext) { out(i) = it.next(); i += 1 }
        out
      }
    }
    udf(F.col(textCol))
  }

  def duplicateIds(ctx: StageContext): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
    val cfg = ctx.cfg
    val id = cfg.str("id_column")
    val text = cfg.str("text_column")
    val n = cfg.longOr("ngram_size", 5L).toInt
    val threshold = cfg.doubleOr("threshold", 0.7)
    val bands = cfg.longOr("bands", 8L).toInt
    // r=6: char n-grams of docs sharing a vocabulary sit at J~0.3-0.5, and
    // band-collision probability J^r must crush that mass (0.4^6 = 0.4%)
    // while keeping real near-dups (J>=0.9 -> P_band=53%, over 8 bands
    // recall ~99.8%).
    val r = cfg.longOr("rows_per_band", 6L).toInt
    val seed = cfg.longOr("seed", 7L)

    val rankKey = DedupRank.keyFor(cfg, "id")
    val base = Parallelize(ctx).select(
      Seq(F.col(id).alias("id"), F.col(text).alias("_txt")) ++
        cfg.strOpt("keep_by").map(F.col): _*)
    val (reps, exactDups) = ExactCollapse(base, "id", "_txt", rankKey, ctx.deferToCleanup)
    val hashed = ctx.pin(reps.select(F.col("id"),
      charNgramHashes("_txt", n).alias("shingles"))
      .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), bands * r, seed)))
    exactDups.unionByName(DedupPairs.dropped(
      LshVerify.verifiedPairs(hashed, bands, r, bands * r, threshold),
      cfg.boolOr("transitive", false),
      rankKey.map(DedupRank.ranks(base, "id", _)), ctx.deferToCleanup)).distinct()
  }

  /** `index_path` — dedup THIS batch against an `index.build type=ngram`
    * corpus (plus within-batch pairs): the char-gram sibling of
    * dedup.minhash index_path — identical contract (plan-time corpus
    * snapshot, param-conflict rejection, success-deferred index_append,
    * streaming batch-tag exclusion), same narrow banded cross join via
    * LshVerify.verifiedCrossPairs; only the shingle function and the
    * (bands × rows_per_band) signature space differ. */
  private def incrementalDuplicateIds(ctx: StageContext, path: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
    val cfg = ctx.cfg
    val spark = ctx.spark
    val id = cfg.str("id_column")
    val text = cfg.str("text_column")
    if (cfg.has("keep_by") || cfg.boolOr("transitive", false))
      throw new GraftConfigError(
        "dedup.ngram: keep_by / transitive=true are not supported with index_path " +
        "(the index is immutable — only the pairwise min-id policy is well-defined)")
    val explainOnly = cfg.boolOr("_explain_only", false)
    val placeholder = explainOnly &&
      !GraftFs.isDir(s"$path/meta")
    val (n, bands, r, seed) =
      if (placeholder)
        (cfg.longOr("ngram_size", 5L).toInt, cfg.longOr("bands", 8L).toInt,
         cfg.longOr("rows_per_band", 6L).toInt, cfg.longOr("seed", 7L))
      else {
        if (!GraftFs.isDir(s"$path/meta"))
          throw new GraftPlanError(
            s"dedup.ngram: no ngram index at $path — run index.build type=ngram first")
        val meta = IndexMeta.head(spark, s"$path/meta")
        if (!meta.schema.fieldNames.contains("ngram_size")) throw new GraftConfigError(
          s"dedup.ngram: the index at $path is not an ngram index — probe it with the " +
          "matching dedup family")
        val vals = (meta.getAs[Int]("ngram_size"), meta.getAs[Int]("bands"),
          meta.getAs[Int]("rows_per_band"), meta.getAs[Long]("seed"))
        Seq(("ngram_size", vals._1.toLong), ("bands", vals._2.toLong),
            ("rows_per_band", vals._3.toLong), ("seed", vals._4)).foreach { case (key, v) =>
          cfg.longOpt(key).filter(_ != v).foreach(conflicting =>
            throw new GraftConfigError(s"dedup.ngram: $key = $conflicting conflicts with " +
              s"the index at $path ($key = $v) — cross matches would silently miss"))
        }
        vals
      }
    val threshold = cfg.doubleOr("threshold", 0.7)
    val k = bands * r

    val base = Parallelize(ctx).select(F.col(id).alias("id"), F.col(text).alias("_txt"))
    val (reps, exactDups) = ExactCollapse(base, "id", "_txt", None, ctx.deferToCleanup)
    val hashed = ctx.pin(reps.select(F.col("id"),
        charNgramHashes("_txt", n).alias("shingles"))
      .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), k, seed)))

    val streamTag = cfg.strOpt("_stream_batch_tag")
    val corpusSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", hashed.schema("id").dataType),
      org.apache.spark.sql.types.StructField("shingles",
        org.apache.spark.sql.types.ArrayType(LongType)),
      org.apache.spark.sql.types.StructField("sig",
        org.apache.spark.sql.types.ArrayType(LongType))))
    val index =
      if (placeholder) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], corpusSchema)
      else IndexSnapshot.read(spark, IndexSnapshot.corpusDir(path),
        s"dedup.ngram: no ngram index at $path — run index.build type=ngram first",
        corpusSchema, excludeDir = streamTag)
    val vsIndex = LshVerify.verifiedCrossPairs(hashed, index, bands, r, k, threshold)
      .select(F.col("id_l").alias("id"))
    val inBatch = DedupPairs.dropped(
      LshVerify.verifiedPairs(hashed, bands, r, k, threshold),
      transitive = false, None, ctx.deferToCleanup)
    val dropped = exactDups.unionByName(vsIndex).unionByName(inBatch).distinct()

    if (cfg.boolOr("index_append", false)) {
      IndexSnapshot.claimAppend(ctx, "dedup.ngram", path)
      if (!explainOnly)
        DeferredAppend(ctx, path, streamTag,
          hashed.join(dropped, Seq("id"), "left_anti")) { rows =>
          rows.select(F.col(id).alias("id"),
              charNgramHashes(text, n).alias("shingles"))
            .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), k, seed))
        }
    }
    dropped
  }

  def apply(ctx: StageContext): DataFrame = {
    val id = ctx.cfg.str("id_column")
    val dups = ctx.cfg.strOpt("index_path") match {
      case Some(path) => incrementalDuplicateIds(ctx, path)
      case None       => duplicateIds(ctx)
    }
    ctx.primary.join(dups, ctx.primary(id) === dups("id"), "left_anti")
  }
}

/** dedup.embedding — near-dup removal by embedding cosine similarity
  * (training-data extension). Candidates via random-hyperplane LSH (h
  * seeded hyperplanes → h-bit signature → bucket join on signature
  * prefix-blocks, pigeonhole like simhash); verify exact cosine ≥
  * threshold; drop higher id.
  *
  * Two blocking schemes: the default `pigeonhole` guarantees recall
  * within the Hamming prefilter bound but its block width is capped at
  * ~π/angle bits by that guarantee, so bucket candidates are N²/2^width
  * with a CONSTANT reduction — fine at fixture scale, quadratic at
  * corpus scale (measured: 22.8M bucket pairs at 50k random docs,
  * BENCH_NOTES r6). `blocking = "bands"` switches to banded LSH
  * (`bands` independent `band_planes`-bit signatures, candidate on exact
  * band agreement — the minhash-banding shape): random collisions fall
  * as 2^-band_planes per band, a free knob (≈ log2 corpus size), at the
  * price of probabilistic recall 1-(1-p^r)^b for borderline pairs
  * (p = 1-acos(cos)/π; ~1 for exact/near-exact copies).
  */
object DedupEmbeddingOp extends Stage {
  val name = "dedup.embedding"
  val kind = StageKind.Transform

  /** tight-loop cosine UDF (double arrays) — kept for spec parity checks;
    * plan-side verification goes through the codegen'd `cosine_sim`
    * Catalyst expression instead (identical math: min-length loop,
    * dot/(|a||b|)), which fuses into WholeStageCodegen and skips the
    * per-row Seq boxing this UDF pays. */
  val cosineUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    F.udf { (a: Seq[Double], b: Seq[Double]) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  /** callers must GraftFunctions.ensureRegistered the session first */
  def cosine(a: Column, b: Column): Column = F.call_function("cosine_sim", a, b)

  /** the `blocks` bucket keys of a signature column — THE block-key
    * expression: index.build type=lsh, the self-join, the index probe and
    * index_append must all agree or buckets silently miss. */
  def blockKeys(sig: Column, blocks: Int, width: Int): Column =
    F.array((0 until blocks).map { j =>
      F.shiftrightunsigned(sig, j * width).bitwiseAND(F.lit((1L << width) - 1L))
    }: _*)

  /** Hamming prefilter bound: a pair at cosine >= threshold differs on an
    * expected h·acos(cos)/π bits; allow +4σ so recall stays ~1 while a
    * random pair (expected h/2 differing bits) is almost surely cut
    * before the exact-cosine verify. */
  def maxBitsFor(h: Int, threshold: Double): Int = {
    val expBits = h * (math.acos(math.min(1.0, threshold)) / math.Pi)
    math.ceil(expBits + 4 * math.sqrt(h) / 2).toInt
  }

  /** h-bit hyperplane signature of a float-array column (seeded, dim known);
    * one pass over the vector computing all h dots.
    *
    * `ndExplode = true` marks the UDF non-deterministic — REQUIRED at the
    * sites that posexplode the signature's block keys WITHOUT a persist in
    * between (index builds and appends): InferFiltersFromGenerate infers
    * `size(keys(UDF(v))) > 0 AND isnotnull(...)` below the Generate, and
    * the pushed filter re-evaluates the UDF — measured 3 evaluations per
    * row on the bands build (guide §4.4; BandsBuildProbe: the sig pass
    * alone 0.6 s, with the explode 1.7-2.0 s on identical data). The
    * values are deterministic either way — the flag only stops the
    * optimizer duplicating the expression. Probe paths keep the default:
    * a non-deterministic projection would block partition-filter pushdown
    * past it (PushPredicateThroughNonJoin requires every project field
    * deterministic), which the index-side scans rely on. */
  def hyperplaneSig(vec: Column, dim: Int, h: Int, seed: Long,
      ndExplode: Boolean = false): Column = {
    // r14: native codegen expression (graft.functions.HyperplaneSignature)
    // — bit-identical planes/arithmetic to the scala UDF it replaced, at
    // ~30x less per-row cost (SigPerfProbe; SignatureExpressionSpec pins
    // value equality). Registered idempotently on the active session.
    graft.functions.GraftFunctions.ensureRegistered(
      org.apache.spark.sql.SparkSession.active)
    F.call_function("hyperplane_sig", vec.cast("array<float>"),
      F.lit(dim), F.lit(h), F.lit(seed), F.lit(ndExplode))
  }

  /** `bands` independent r-bit hyperplane signatures (one pass over the
    * vector computing all bands·r dots) — the banded-LSH blocking for
    * `blocking = "bands"`: each band is its own r-plane signature, a
    * candidate needs ONE band to agree EXACTLY. Unlike the pigeonhole
    * blocks (which slice a single h-bit sig and are capped at
    * ~π/angle useful bits per block by the exact-block recall guarantee),
    * band width r is a free knob: random-pair collisions fall as 2^-r per
    * band, so r ≈ log2(corpus size) keeps the candidate set linear at any
    * scale. Recall is probabilistic — 1-(1-p^r)^bands with
    * p = 1-acos(cos)/π — ~1 for exact/near-exact copies and tunable via
    * `bands` for borderline pairs.
    *
    * `ndExplode`: see [[hyperplaneSig]] — set at un-persisted explode
    * sites (builds/appends) to stop InferFiltersFromGenerate tripling the
    * UDF; values identical either way. */
  def bandSignatures(vec: Column, dim: Int, bands: Int, r: Int, seed: Long,
      ndExplode: Boolean = false): Column = {
    // r14: native codegen expression (graft.functions.BandSignatures) —
    // see hyperplaneSig above; bit-identical values, ~30x less per-row
    // boundary cost than the scala UDF.
    graft.functions.GraftFunctions.ensureRegistered(
      org.apache.spark.sql.SparkSession.active)
    F.call_function("band_sigs", vec.cast("array<float>"),
      F.lit(dim), F.lit(bands), F.lit(r), F.lit(seed), F.lit(ndExplode))
  }

  def duplicateIds(ctx: StageContext): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
    val cfg = ctx.cfg
    val id = cfg.str("id_column")
    val vecCol = cfg.str("vector_column")
    // 32 planes / 4 blocks = 8-bit blocks → 256 buckets per block: keeps
    // bucket population ~N/256 so the self-join stays near-linear (16-bit
    // sigs with 4-bit blocks put ~N/16 rows in every bucket → quadratic).
    val threshold = cfg.doubleOr("threshold", 0.95)
    val h = cfg.longOr("num_planes", 32L).toInt
    val blocks = cfg.longOr("blocks", 4L).toInt
    // same loud check as index.build type=lsh / dedup.minhash: a
    // non-divisible width would silently ignore the trailing plane bits
    if (cfg.strOr("blocking", "pigeonhole") == "pigeonhole" && h % blocks != 0)
      throw new GraftConfigError(
        s"dedup.embedding: num_planes=$h must divide evenly into blocks=$blocks")
    val seed = cfg.longOr("seed", 11L)
    val dim = cfg.longOpt("dim").map(_.toInt).getOrElse(
      ctx.primary.select(F.size(F.col(vecCol))).head(1)
        .headOption.map(_.getInt(0)).getOrElse(0))   // empty corpus → no-op
    val width = h / blocks

    val maxBits = maxBitsFor(h, threshold)

    val rankKey = DedupRank.keyFor(cfg, "id")
    val base = Parallelize(ctx).select(
      Seq(F.col(id).alias("id"), F.col(vecCol).alias("vec")) ++
        cfg.strOpt("keep_by").map(F.col): _*)
    val (reps, exactDups) = ExactCollapse(base, "id", "vec", rankKey, ctx.deferToCleanup)
    val nearPairs = cfg.strOr("blocking", "pigeonhole") match {
      case "pigeonhole" =>
        val sigs = ctx.pin(reps
          .withColumn("sig", hyperplaneSig(F.col("vec"), dim, h, seed)))
        selfNearPairs(sigs, blocks, width, maxBits, threshold)
      case "bands" =>
        // the 100 TB blocking (see ScaleProbe / BENCH_NOTES r6): pigeonhole
        // candidates are N²/2^width with width CAPPED by the recall
        // guarantee, so at corpus scale buckets go quadratic; banded LSH
        // trades the guarantee for a free-width knob (random collisions
        // 2^-r per band; pick band_planes ≈ log2 corpus size)
        val bands = cfg.longOr("bands", 16L).toInt
        val r = cfg.longOr("band_planes", 16L).toInt
        if (bands < 1) throw new GraftConfigError(
          s"dedup.embedding: bands must be >= 1, got $bands")
        if (r < 1 || r > 63) throw new GraftConfigError(
          s"dedup.embedding: band_planes must be in [1, 63], got $r")
        val sigs = ctx.pin(reps
          .withColumn("bsig", bandSignatures(F.col("vec"), dim, bands, r, seed)))
        bandedSelfNearPairs(sigs, threshold)
      case "ivf" =>
        // SemDeDup-style cluster blocking (Abbas et al. 2023): candidates
        // are same-cell pairs under a coarse quantizer — Σ n_c² over
        // cells ≈ N²/nlist when balanced, so nlist is the corpus-scale
        // knob the way band_planes is for bands. Near-dup pairs SPLIT by a
        // cell boundary are missed by design (the documented recall trade
        // of cluster blocking); nlist = 1 is the exhaustive setting — the
        // dedup_embedding_ivf gate pins it against the full-corpus oracle.
        // Quantizer: `quantizer_path` reuses a prebuilt index.build
        // type=ivf|ivfpq coarse quantizer (frozen — cells consistent with
        // cluster.assign tags and every knn probe of that index);
        // otherwise seeded in-op Lloyd's on a bounded sample.
        val nlist = cfg.longOr("nlist", 16L).toInt
        if (nlist < 1) throw new GraftConfigError(
          s"dedup.embedding: nlist must be >= 1, got $nlist")
        val cents: Array[Array[Double]] = cfg.strOpt("quantizer_path") match {
          case Some(p) =>
            IndexMaintenance.recoverSwap(p)
            if (!GraftFs.exists(s"$p/centroids")) throw new GraftPlanError(
              s"dedup.embedding: no ivf/ivfpq index at '$p' — quantizer_path needs " +
              "an index.build type=ivf|ivfpq index")
            IvfCentroids.load(ctx.spark, p, "dedup.embedding blocking=ivf").map(_._2.toArray)
          case None =>
            val maxTrain = cfg.longOr("max_train", 10000L).toInt
            // Pq.trainSample: deterministic uniform draw (a plain limit
            // would train on the first rows in plan order — one domain's
            // slice of a sorted corpus)
            val sample = Pq.trainSample(reps, F.col("vec"), maxTrain, seed)
            if (sample.isEmpty) Array(Array.fill(math.max(1, dim))(0.0)) // empty corpus: no pairs
            else Pq.lloyd(sample, nlist, Pq.TrainIters, seed)
        }
        // broadcast the centroid table instead of closure-shipping it with
        // every task binary (same math — see IvfCentroids.assignUdf)
        val bcCents = ctx.spark.sparkContext.broadcast(cents)
        val assign = F.udf { v: Seq[Float] =>
          val arr = new Array[Double](v.length)
          var i = 0
          while (i < arr.length) { arr(i) = v(i).toDouble; i += 1 }
          Pq.nearest(bcCents.value, arr)
        }
        val sigs = ctx.pin(reps
          .withColumn("cell", assign(F.col("vec").cast("array<float>"))))
        cellSelfNearPairs(sigs, threshold)
      case other => throw new GraftConfigError(
        s"dedup.embedding: blocking must be pigeonhole|bands|ivf, got '$other'")
    }
    exactDups.unionByName(DedupPairs.dropped(nearPairs,
      cfg.boolOr("transitive", false),
      rankKey.map(DedupRank.ranks(base, "id", _)), ctx.deferToCleanup)).distinct()
  }

  /** blocked self-join over (id, vec, sig) reps → verified cosine pairs
    * (id_a < id_b). Candidate pairs stay NARROW (ids + 64-bit sigs, no
    * vectors): the bucket self-join and pair dedup shuffle ~24 B/row
    * instead of two full embedding payloads per row; vectors re-attach
    * only to surviving candidates — an equi-join on id that AQE turns
    * into a broadcast when the corpus is small and a plain hash join
    * keyed on id when it isn't (never force-broadcast the corpus: at
    * 100 TB the candidate list is the small side). */
  private def selfNearPairs(sigs: DataFrame, blocks: Int, width: Int,
      maxBits: Int, threshold: Double): DataFrame = {
    val blocked = sigs.select(F.col("id"), F.col("sig"),
      F.posexplode(blockKeys(F.col("sig"), blocks, width)))
      .withColumnRenamed("pos", "block_idx").withColumnRenamed("col", "block_val")

    val lhs = blocked.select(F.col("block_idx"), F.col("block_val"), F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    val rhs = blocked.select(F.col("block_idx"), F.col("block_val"), F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    val candidates = lhs.join(rhs, Seq("block_idx", "block_val"))
      .filter(F.col("id_a") < F.col("id_b"))
      // cheap codegen'd signature-agreement prefilter before any shuffle
      .filter(F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= maxBits)
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    verifyCosine(candidates, sigs.select(F.col("id"), F.col("vec")), threshold)
  }

  /** cluster-blocked self-join over (id, vec, cell) reps → verified cosine
    * pairs (id_a < id_b). Same narrow-candidate discipline; each row
    * carries exactly ONE cell so every candidate pair arises once (no
    * dedup exchange), and the exact-cosine verify re-attaches vectors to
    * candidates only. */
  private def cellSelfNearPairs(sigs: DataFrame, threshold: Double): DataFrame = {
    val lhs = sigs.select(F.col("cell"), F.col("id").alias("id_a"))
    val rhs = sigs.select(F.col("cell"), F.col("id").alias("id_b"))
    val candidates = lhs.join(rhs, Seq("cell"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b")
    verifyCosine(candidates, sigs.select(F.col("id"), F.col("vec")), threshold)
  }

  /** banded-LSH self-join over (id, vec, bsig) reps → verified cosine
    * pairs (id_a < id_b). Same narrow-candidate discipline as
    * selfNearPairs; no Hamming prefilter (exact band agreement IS the
    * filter — candidates are sparse by construction at any corpus size),
    * exact cosine verifies every candidate. */
  private def bandedSelfNearPairs(sigs: DataFrame, threshold: Double): DataFrame = {
    val blocked = sigs.select(F.col("id"), F.posexplode(F.col("bsig")))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_val")
    val lhs = blocked.select(F.col("band_idx"), F.col("band_val"), F.col("id").alias("id_a"))
    val rhs = blocked.select(F.col("band_idx"), F.col("band_val"), F.col("id").alias("id_b"))
    val candidates = lhs.join(rhs, Seq("band_idx", "band_val"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    verifyCosine(candidates, sigs.select(F.col("id"), F.col("vec")), threshold)
  }

  /** exact-cosine verify of narrow (id_a, id_b) candidates: vectors
    * re-attach by id only for surviving candidates (AQE broadcasts the
    * candidate list when small; never force-broadcast the corpus). */
  private def verifyCosine(candidates: DataFrame, vecs: DataFrame,
      threshold: Double): DataFrame =
    candidates
      .join(vecs.withColumnRenamed("id", "id_a").withColumnRenamed("vec", "v_a"), Seq("id_a"))
      .join(vecs.withColumnRenamed("id", "id_b").withColumnRenamed("vec", "v_b"), Seq("id_b"))
      .withColumn("cos", cosine(F.col("v_a").cast("array<double>"), F.col("v_b").cast("array<double>")))
      .filter(F.col("cos") >= threshold)
      .select("id_a", "id_b")

  /** `index_path` — dedup THIS batch against an `index.build type=lsh`
    * corpus (plus within-batch pairs): the embedding sibling of
    * dedup.minhash index_path, completing the incremental-ingestion
    * triple (exact / minhash / embedding). The batch's block keys join
    * the (block, bucket)-partitioned index — only colliding buckets are
    * read — index-side signatures are recomputed ONLY for the rows those
    * buckets hold (the index stores rows once per block; sigs are
    * h·dim dot products, cheap next to shipping them ×blocks), the
    * Hamming prefilter prunes on narrow sigs, and exact cosine verifies
    * the survivors. Same snapshot / meta-validation / success-deferred
    * `index_append` / explain-placeholder contract as the minhash path;
    * keep_by and transitive=true are rejected (index wins, pairwise only).
    * Appending requires the batch to carry the index's row columns. */
  private def incrementalDuplicateIds(ctx: StageContext, path: String): DataFrame = {
    val cfg = ctx.cfg
    if (cfg.has("keep_by") || cfg.boolOr("transitive", false))
      throw new GraftConfigError(
        "dedup.embedding: keep_by / transitive=true are not supported with index_path " +
        "(the index is immutable — only the pairwise min-id policy is well-defined)")
    // the index's own meta decides the probe blocking: a `band_planes`
    // field marks the banded layout (index.build type=lsh blocking=bands),
    // anything else is the pigeonhole (block, pbucket) layout. An explicit
    // `blocking` key that contradicts the layout fails loud instead of
    // silently probing with mismatched signatures.
    val explainOnly = cfg.boolOr("_explain_only", false)
    val metaExists =
      GraftFs.isDir(s"$path/meta")
    if (!metaExists && !explainOnly)
      throw new GraftPlanError(
        s"dedup.embedding: no lsh index at $path — run index.build type=lsh first")
    val bandsLayout =
      if (!metaExists) cfg.strOr("blocking", "pigeonhole") == "bands" // explain placeholder
      else IndexMeta.schemaFields(ctx.spark, s"$path/meta").contains("band_planes")
    cfg.strOpt("blocking").foreach { b =>
      val layoutName = if (bandsLayout) "bands" else "pigeonhole"
      if (metaExists && b != layoutName) throw new GraftConfigError(
        s"dedup.embedding: blocking = $b conflicts with the index at $path, which is " +
        s"$layoutName-partitioned — the index layout decides the probe blocking")
    }
    if (bandsLayout) incrementalBandedIds(ctx, path)
    else incrementalPigeonholeIds(ctx, path)
  }

  /** Banded incremental probe — the composition of the two flagship scale
    * features: `blocking=bands` (candidate reduction 2^band_planes per
    * band, the corpus-scale knob) probing an `index.build type=lsh
    * blocking=bands` corpus (probe-don't-rescan, the corpus-lifetime
    * knob). The batch's band signatures join ONLY the colliding
    * (band, pband) index partitions on exact band agreement — no Hamming
    * prefilter needed, band equality IS the filter — and exact cosine
    * verifies every candidate. Streaming (`_stream_batch_tag` set): the
    * index snapshot excludes this batch's own `ingest_tag=<tag>` partition
    * dirs (retry self-match exclusion) and the append lands via dynamic
    * partition overwrite of exactly those dirs — idempotent, which is what
    * makes dedup=embedding streamable where the flat append-dir layouts
    * are not. */
  private def incrementalBandedIds(ctx: StageContext, path: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
    val cfg = ctx.cfg
    val spark = ctx.spark
    val id = cfg.str("id_column")
    val vecCol = cfg.str("vector_column")
    val threshold = cfg.doubleOr("threshold", 0.95)
    val explainOnly = cfg.boolOr("_explain_only", false)
    val placeholder = explainOnly &&
      !GraftFs.isDir(s"$path/meta")
    val streamTag = cfg.strOpt("_stream_batch_tag")
    val (bands, r, seed, dim, pdirs) =
      if (placeholder)
        (cfg.longOr("bands", 16L).toInt, cfg.longOr("band_planes", 16L).toInt,
         cfg.longOr("seed", 11L),
         cfg.longOpt("dim").map(_.toInt).getOrElse(
           ctx.primary.select(F.size(F.col(vecCol))).head(1)
             .headOption.map(_.getInt(0)).getOrElse(0)),
         cfg.longOr("partition_dirs", 64L).toInt)
      else {
        val meta = IndexMeta.head(spark, s"$path/meta")
        val vals = (meta.getAs[Int]("bands"), meta.getAs[Int]("band_planes"),
          meta.getAs[Long]("seed"), meta.getAs[Int]("dim"), meta.getAs[Int]("pbuckets"))
        Seq(("bands", vals._1.toLong), ("band_planes", vals._2.toLong), ("seed", vals._3),
            ("dim", vals._4.toLong), ("partition_dirs", vals._5.toLong))
          .foreach { case (key, v) =>
            cfg.longOpt(key).filter(_ != v).foreach(conflicting =>
              throw new GraftConfigError(s"dedup.embedding: $key = $conflicting conflicts " +
                s"with the index at $path ($key = $v) — cross matches would silently miss"))
          }
        vals
      }
    // batch-dim-vs-index-dim loud failure, same contract as the pigeonhole
    // probe (bandSignatures truncates at min(dim, v.length)); skipped under
    // explain (no upstream jobs) and on later micro-batches of a stream
    // whose first batch already validated (`_dim_checked` — the check is a
    // one-row sample, so repeating it per batch buys nothing but a job)
    if (!placeholder && !explainOnly && !cfg.boolOr("_dim_checked", false))
      ctx.primary.select(F.size(F.col(vecCol)).as("_sz")).filter(F.col("_sz") >= 0)
        .head(1).headOption.map(_.getInt(0)).filter(_ != dim).foreach(bd =>
          throw new GraftConfigError(
            s"dedup.embedding: batch vectors in '$vecCol' have length $bd but the index " +
            s"at $path was built with dim = $dim — signatures would silently mismatch"))

    val base = Parallelize(ctx).select(F.col(id).alias("id"), F.col(vecCol).alias("vec"))
    val (reps, exactDups) = ExactCollapse(base, "id", "vec", None, ctx.deferToCleanup)
    val sigs = ctx.pin(reps
      .withColumn("bsig", bandSignatures(F.col("vec"), dim, bands, r, seed)))

    val corpusSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(id, ctx.primary.schema(id).dataType),
      org.apache.spark.sql.types.StructField(vecCol, ctx.primary.schema(vecCol).dataType),
      org.apache.spark.sql.types.StructField("bsig", LongType),
      org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("pband", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("ingest_tag", org.apache.spark.sql.types.StringType)))
    val index =
      if (placeholder) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], corpusSchema)
      else IndexSnapshot.read(spark, IndexSnapshot.corpusDir(path),
        s"dedup.embedding: no lsh index at $path — run index.build type=lsh first",
        corpusSchema, basePath = true,
        excludeDir = streamTag.map(tg => s"ingest_tag=$tg"))

    // same narrow-shape discipline as the pigeonhole probe: the batch (the
    // small side) carries its vector through the band join, every joined
    // row verifies directly — no candidate dedup shuffle, no re-attach
    // joins; a pair colliding in several bands recomputes one cosine per
    // collision. pband in the join key is redundant given bsig, but it is
    // the PARTITION column — pruning skips index dirs the batch never hits.
    val batchBlocked = sigs.select(F.col("id").alias("id_l"), F.col("vec").alias("v_l"),
        F.posexplode(F.col("bsig")).as(Seq("band", "bsig")))
      .withColumn("band", F.col("band").cast("int"))
      .withColumn("pband", (F.col("bsig") % pdirs).cast("int"))
    val idxSide = index.select(F.col("band"), F.col("pband"), F.col("bsig"),
      F.col(id).alias("id_r"), F.col(vecCol).alias("v_r"))
    val crossDropped = batchBlocked.join(idxSide, Seq("band", "pband", "bsig"))
      .withColumn("cos", cosine(F.col("v_l").cast("array<double>"), F.col("v_r").cast("array<double>")))
      .filter(F.col("cos") >= threshold)
      .select(F.col("id_l").alias("id")).distinct()

    val inBatch = DedupPairs.dropped(bandedSelfNearPairs(sigs, threshold),
      transitive = false, None, ctx.deferToCleanup)
    val dropped = exactDups.unionByName(crossDropped).unionByName(inBatch).distinct()

    if (cfg.boolOr("index_append", false)) IndexSnapshot.claimAppend(ctx, "dedup.embedding", path)
    if (cfg.boolOr("index_append", false) && !explainOnly) {
      val idxCols = index.columns
        .filterNot(c => c == "band" || c == "pband" || c == "bsig" || c == "ingest_tag")
        .toVector
      if (idxCols.sorted != ctx.primary.columns.toVector.sorted) throw new GraftConfigError(
        s"dedup.embedding index_append: batch columns (${ctx.primary.columns.mkString(", ")}) " +
        s"must match the index row columns (${idxCols.mkString(", ")})")
      def blocked(rows: DataFrame) = rows
        .withColumn("_bsig", bandSignatures(F.col(vecCol), dim, bands, r, seed,
          ndExplode = true))
        .select(F.col("*"), F.posexplode(F.col("_bsig")).as(Seq("band", "bsig")))
        .drop("_bsig")
        .withColumn("band", F.col("band").cast("int"))
        .withColumn("pband", (F.col("bsig") % pdirs).cast("int"))
        .withColumn("ingest_tag", F.lit(streamTag.getOrElse("base")))
      // STREAMING read-back: by the time the deferred append fires, the
      // sink has durably written this batch's survivors to its own output
      // partition — re-reading that partition (one columnar scan of
      // exactly the survivor rows) replaces re-running the whole probe
      // DAG (anti-join against the dropped set and everything under it),
      // which at gate scale was roughly half the micro-batch's Spark
      // jobs. It is also the stronger consistency statement: the index
      // grows by what the OUTPUT actually holds. Batch mode keeps the
      // plan-side anti-join (there is no written partition to read).
      val readbackDir = cfg.strOpt("_stream_readback_dir").filter(_ => streamTag.isDefined)
      val pinnedAppend = readbackDir match {
        case Some(_) => null // built lazily inside the closure, post-write
        case None => ctx.pin(blocked(ctx.primary.join(dropped,
          ctx.primary(id) === dropped("id"), "left_anti")))
      }
      // batch: plain append (at-most-once via success deferral); streaming:
      // dynamic partition OVERWRITE of this batch's own (band, pband, tag)
      // dirs — a replayed micro-batch re-lands identical rows idempotently
      ctx.deferToSuccess { () =>
        val co = readbackDir match {
          case Some(rb) =>
            // an all-duplicates batch writes no partition at all — and
            // appends nothing (skips the write job entirely)
            if (!GraftFs.isDir(rb) ||
                !GraftFs.listFilesRec(rb).exists(_._1.endsWith(".parquet"))) null
            else blocked(spark.read.parquet(rb).select(
              ctx.primary.columns.map(F.col).toIndexedSeq: _*))
              .repartition(F.col("band"), F.col("pband"))
          case None => pinnedAppend.repartition(F.col("band"), F.col("pband"))
        }
        def land(): Unit = if (co != null) {
          // crash repair inside the claim (see IndexSnapshot.append)
          IndexMaintenance.recoverSwap(path)
          val w = streamTag match {
            case None    => co.write.mode("append")
            case Some(_) => co.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          }
          w.partitionBy("band", "pband", "ingest_tag").parquet(IndexSnapshot.corpusDir(path))
        }
        // batch appends take the shared batch/maintenance lease; a
        // streaming tag means the query already holds it for its lifetime
        if (streamTag.isEmpty)
          graft.streaming.IngestLease.withBatchLease(path, "dedup.embedding index_append")(land())
        else land()
      }
    }
    dropped
  }

  private def incrementalPigeonholeIds(ctx: StageContext, path: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(ctx.spark)
    val cfg = ctx.cfg
    val spark = ctx.spark
    val id = cfg.str("id_column")
    val vecCol = cfg.str("vector_column")
    if (cfg.strOpt("_stream_batch_tag").isDefined)
      throw new GraftConfigError(
        "dedup.embedding: streaming ingestion needs a bands-partitioned index " +
        "(index.build type=lsh blocking=bands) — the pigeonhole layout has no " +
        "per-batch idempotent append target")
    val threshold = cfg.doubleOr("threshold", 0.95)

    val explainOnly = cfg.boolOr("_explain_only", false)
    val placeholder = explainOnly &&
      !GraftFs.isDir(s"$path/meta")
    val (h, blocks, seed, dim, pdirs) =
      if (placeholder)
        (cfg.longOr("num_planes", 32L).toInt, cfg.longOr("blocks", 4L).toInt,
         cfg.longOr("seed", 11L),
         // explicit dim wins; only probe the input when it is absent —
         // explain should not run upstream jobs the config makes avoidable
         cfg.longOpt("dim").map(_.toInt).getOrElse(
           ctx.primary.select(F.size(F.col(vecCol))).head(1).headOption.map(_.getInt(0)).getOrElse(0)),
         cfg.longOr("partition_dirs", 64L).toInt)
      else {
        if (!GraftFs.isDir(s"$path/meta"))
          throw new GraftPlanError(
            s"dedup.embedding: no lsh index at $path — run index.build type=lsh first")
        val meta = IndexMeta.head(spark, s"$path/meta")
        if (!meta.schema.fieldNames.contains("pbuckets")) throw new GraftConfigError(
          s"dedup.embedding: the index at $path predates the (block, pbucket) layout — " +
          "rebuild it with index.build type=lsh mode=overwrite")
        val vals = (meta.getAs[Int]("num_planes"), meta.getAs[Int]("blocks"),
          meta.getAs[Long]("seed"), meta.getAs[Int]("dim"), meta.getAs[Int]("pbuckets"))
        Seq(("num_planes", vals._1.toLong), ("blocks", vals._2.toLong), ("seed", vals._3),
            ("dim", vals._4.toLong), ("partition_dirs", vals._5.toLong))
          .foreach { case (key, v) =>
            cfg.longOpt(key).filter(_ != v).foreach(conflicting =>
              throw new GraftConfigError(s"dedup.embedding: $key = $conflicting conflicts " +
                s"with the index at $path ($key = $v) — cross matches would silently miss"))
          }
        vals
      }
    // the batch's actual vector length must equal the index dim:
    // hyperplaneSig truncates at min(dim, v.length), so a mismatched
    // batch would silently compute signatures over a prefix and miss
    // cross matches instead of failing loud. One-row probe, same as the
    // non-incremental path's dim inference; skipped under explain (no
    // upstream jobs) — the probe-vs-meta check then runs at execution —
    // and on later micro-batches of a stream whose first batch validated
    // (`_dim_checked`; the pigeonhole layout rejects streaming anyway, so
    // this is for contract symmetry with the banded path).
    if (!placeholder && !explainOnly && !cfg.boolOr("_dim_checked", false))
      ctx.primary.select(F.size(F.col(vecCol)).as("_sz")).filter(F.col("_sz") >= 0)
        .head(1).headOption.map(_.getInt(0)).filter(_ != dim).foreach(bd =>
          throw new GraftConfigError(
            s"dedup.embedding: batch vectors in '$vecCol' have length $bd but the index " +
            s"at $path was built with dim = $dim — signatures would silently mismatch"))
    val width = h / blocks
    val maxBits = maxBitsFor(h, threshold)

    val base = Parallelize(ctx).select(F.col(id).alias("id"), F.col(vecCol).alias("vec"))
    val (reps, exactDups) = ExactCollapse(base, "id", "vec", None, ctx.deferToCleanup)
    val sigs = ctx.pin(reps.withColumn("sig", hyperplaneSig(F.col("vec"), dim, h, seed)))

    val corpusSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(id, ctx.primary.schema(id).dataType),
      org.apache.spark.sql.types.StructField(vecCol, ctx.primary.schema(vecCol).dataType),
      org.apache.spark.sql.types.StructField("block", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("pbucket", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("bucket", LongType)))
    val index =
      if (placeholder) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], corpusSchema)
      else IndexSnapshot.read(spark, IndexSnapshot.corpusDir(path),
        s"dedup.embedding: no lsh index at $path — run index.build type=lsh first",
        corpusSchema, basePath = true)

    // the batch side carries its vector THROUGH the bucket join (the batch
    // is the small side of the incremental shape — vec × blocks rows),
    // and every joined row is verified directly: no candidate
    // dropDuplicates (a wide extra shuffle; and deduping (id_l, id_r)
    // alone would pick an arbitrary vector when an appended index holds
    // one id twice) and no re-attach joins. A pair colliding in several
    // blocks recomputes one cosine per collision — cheap next to
    // shuffling vector payloads again; the only exchange is the bucket
    // join itself, on the pruned index slice.
    val batchBlocked = sigs.select(F.col("id").alias("id_l"), F.col("sig").alias("sig_l"),
      F.col("vec").alias("v_l"),
      F.posexplode(blockKeys(F.col("sig"), blocks, width)))
      .withColumnRenamed("pos", "block").withColumnRenamed("col", "bucket")
      .withColumn("block", F.col("block").cast("int"))
      .withColumn("pbucket", (F.col("bucket") % pdirs).cast("int"))

    val idxSide = index.select(F.col("block"), F.col("pbucket"), F.col("bucket"),
      F.col(id).alias("id_r"), F.col(vecCol).alias("v_r"))
      .withColumn("sig_r", hyperplaneSig(F.col("v_r"), dim, h, seed))

    // pbucket in the join key is redundant given bucket, but it is the
    // PARTITION column — dynamic pruning can skip index dirs the batch
    // never touches
    val crossDropped = batchBlocked.join(idxSide, Seq("block", "pbucket", "bucket"))
      .filter(F.bit_count(F.col("sig_l").bitwiseXOR(F.col("sig_r"))) <= maxBits)
      .withColumn("cos", cosine(F.col("v_l").cast("array<double>"), F.col("v_r").cast("array<double>")))
      .filter(F.col("cos") >= threshold)
      .select(F.col("id_l").alias("id")).distinct()

    val inBatch = DedupPairs.dropped(
      selfNearPairs(sigs, blocks, width, maxBits, threshold),
      transitive = false, None, ctx.deferToCleanup)
    val dropped = exactDups.unionByName(crossDropped).unionByName(inBatch).distinct()

    if (cfg.boolOr("index_append", false)) IndexSnapshot.claimAppend(ctx, "dedup.embedding", path)
    if (cfg.boolOr("index_append", false) && !explainOnly) {
      val idxCols = index.columns
        .filterNot(c => c == "block" || c == "bucket" || c == "pbucket").toVector
      if (idxCols.sorted != ctx.primary.columns.toVector.sorted) throw new GraftConfigError(
        s"dedup.embedding index_append: batch columns (${ctx.primary.columns.mkString(", ")}) " +
        s"must match the index row columns (${idxCols.mkString(", ")})")
      val survivorRows = ctx.primary.join(dropped,
        ctx.primary(id) === dropped("id"), "left_anti")
      val blockedRows = survivorRows
        .withColumn("_sig", hyperplaneSig(F.col(vecCol), dim, h, seed,
          ndExplode = true))
        .select(F.col("*"), F.posexplode(blockKeys(F.col("_sig"), blocks, width))
          .as(Seq("block", "bucket")))
        .drop("_sig")
        .withColumn("pbucket", (F.col("bucket") % pdirs).cast("int"))
      val pinnedAppend = ctx.pin(blockedRows)
      // same dir co-location as index.build type=lsh: one appended file
      // per populated dir, not one per (task × dir)
      ctx.deferToSuccess(() =>
        graft.streaming.IngestLease.withBatchLease(path, "dedup.embedding index_append") {
          pinnedAppend.repartition(F.col("block"), F.col("pbucket"))
            .write.mode("append").partitionBy("block", "pbucket").parquet(IndexSnapshot.corpusDir(path))
        })
    }
    dropped
  }

  def apply(ctx: StageContext): DataFrame = {
    val id = ctx.cfg.str("id_column")
    val dups = ctx.cfg.strOpt("index_path") match {
      case Some(path) => incrementalDuplicateIds(ctx, path)
      case None       => duplicateIds(ctx)
    }
    ctx.primary.join(dups, ctx.primary(id) === dups("id"), "left_anti")
  }
}
