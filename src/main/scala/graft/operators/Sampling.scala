package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** sample.apply — row sampling (training-data extension; the reference has
  * no sampling at all). Bernoulli and per-stratum fractions are a single
  * codegen'd filter on a seeded CONTENT-hash draw (no shuffle, no driver
  * state, deterministic across partitionings — see rankKey/drawExpr);
  * with_replacement keeps Dataset.sample's per-partition RNG (a
  * multiplicity draw has no content-hash analog). STRATIFIED fractions
  * (`by` + `fractions`) fix class imbalance at source scale instead of
  * after a full materialization.
  *
  * fractions keys are matched against the stratum column cast to string
  * (TOML table keys are strings); `default_fraction` covers unlisted
  * strata (absent = dropped).
  */
object SampleOp extends Stage {
  val name = "sample.apply"
  val kind = StageKind.Transform

  /** Seeded rank/draw keys as a CONTENT hash (xxhash64(seed, row
    * columns)), not `rand(seed)` — rand seeds per PARTITION, so a
    * "deterministic" sample silently changed with the input's physical
    * partitioning (partition count is a cluster-config fact at 100 TB,
    * not a data fact; the stratified ScalaCheck property caught a
    * repartition(7) flipping the selection). The hash is a pure function
    * of row content + seed — identical across partitionings, engines,
    * and runs — the same determinism design split.apply and
    * shuffle.apply already use. The trade, documented: byte-identical
    * duplicate rows draw the SAME value (correlated selection), where
    * rand drew them independently. Map-typed columns are unhashable in
    * Spark and are skipped; only if NO column is hashable do the draws
    * fall back to rand's fixed-partitioning determinism. */
  private def hashableCols(df: DataFrame): Seq[org.apache.spark.sql.Column] = {
    def hashable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    // backtick-quoted so literal dots in column names (JSON flattening)
    // resolve as column references, not struct access
    df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => F.col("`" + f.name.replace("`", "``") + "`")).toSeq
  }

  /** The shared seeded content hash. `salt` is the stage id: two sample
    * stages chained in one pipeline (both on the default seed) must draw
    * INDEPENDENTLY — unsalted, every row surviving the first stage's
    * `u < 0.5` would automatically survive the second's, making it a
    * no-op. Stage ids are pipeline-definition facts (TOML stage names,
    * "anon" for direct invocation), so the salt never varies run-to-run. */
  private def contentHash(cols: Seq[org.apache.spark.sql.Column], seed: Long,
      salt: String): org.apache.spark.sql.Column =
    F.xxhash64(F.lit(seed) +: F.lit(salt) +: cols: _*)

  private def rankKey(df: DataFrame, seed: Long, salt: String): org.apache.spark.sql.Column = {
    val cols = hashableCols(df)
    if (cols.isEmpty) F.rand(seed)
    else contentHash(cols, seed, salt)
  }

  /** Uniform [0, 1) draw per row from the content hash — the Bernoulli /
    * per-stratum-fraction selector. 32-bit resolution (hash mod 2^32 /
    * 2^32): fraction granularity of ~2.3e-10, bias-free since 2^64 is an
    * exact multiple of 2^32. */
  private def drawExpr(df: DataFrame, seed: Long, salt: String): Option[org.apache.spark.sql.Column] = {
    val cols = hashableCols(df)
    if (cols.isEmpty) None
    else Some(F.pmod(contentHash(cols, seed, salt), F.lit(1L << 32))
      .cast("double") / (1L << 32).toDouble)
  }

  /** Exact-k selection WITHOUT a k-scaled driver merge: a bit-prefix
    * histogram descent over the 64-bit rank hash. Each level buckets the
    * candidate range by the next 16 hash bits and pulls a <= 65536-row
    * (bucket, count) histogram to the driver — after at most 4 levels the
    * exact k-th smallest rank value is known, and the result is a pure
    * codegen'd filter `rank < T` plus an exact trim of the rows AT the
    * threshold (almost surely byte-identical duplicates, since distinct
    * rows collide on the 64-bit hash with ~2^-64 probability). Driver
    * memory is O(65536) and per-level work is one filtered aggregate
    * scan, both independent of k — the shape that still works when k is
    * hundreds of millions on a 1000-executor cluster, where
    * TakeOrderedAndProject's k·partitions driver merge would OOM.
    *
    * Unsigned-order trick: the hash is a signed Long; orderBy compares
    * signed. Biasing by XOR with Long.MinValue maps signed order onto
    * unsigned order, so bucket indices (unsigned shifts of the biased
    * value) descend in exactly orderBy's order, and the final threshold
    * is compared back in the rank domain with plain signed `<`.
    *
    * Early exits: k >= n returns the frame unchanged (one histogram
    * pass); a quota landing exactly on a bucket edge returns the
    * pure-filter form with no boundary trim.
    */
  private def thresholdSelectK(ranked: DataFrame, key: String, k: Long): DataFrame = {
    val biased = F.col(key).bitwiseXOR(F.lit(Long.MinValue))
    var prefix = 0L  // biased bits above the current level, i.e. biased >>> (shift+16)
    var kRem = k     // rows still needed from within the current prefix range
    val shifts = Seq(48, 32, 16, 0)
    // the descent's arithmetic assumes its <= 5 scans see IDENTICAL
    // contents — pin the key column (one long per row, the narrowest
    // possible projection) for the descent's lifetime so a
    // non-deterministic upstream (a with_replacement sample stage, source
    // files changing mid-run) cannot shift counts between levels. The
    // returned plan filters the ORIGINAL frame, so the pin never outlives
    // this call. Persist is best-effort (lost executors recompute), so
    // the level loop below still bounds-checks and fails loud on an
    // inconsistent scan instead of indexing past the histogram.
    val keys = ranked.select(F.col(key))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    for (shift <- shifts) {
      val local = F.shiftrightunsigned(biased, shift).bitwiseAND(F.lit(0xFFFFL))
      val subset =
        if (shift == 48) keys
        else keys.filter(F.shiftrightunsigned(biased, shift + 16) === F.lit(prefix))
      val hist = subset.groupBy(local.as("_b")).agg(F.count(F.lit(1)).as("_c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      if (shift == 48 && hist.map(_._2).sum <= k) return ranked // k >= n: keep all
      // boundary bucket: first whose cumulative count reaches kRem
      var cum = 0L; var i = 0
      while (i < hist.length && cum + hist(i)._2 < kRem) { cum += hist(i)._2; i += 1 }
      if (i >= hist.length) throw new GraftConfigError(
        s"sample.apply: the rank column changed between threshold passes " +
        s"(level shift=$shift saw fewer rows than the previous level " +
        "promised) — the source is non-deterministic across scans; " +
        "materialize it (or drop the upstream with_replacement stage) " +
        "before exact-k sampling above count_cutoff")
      val (b, cnt) = hist(i)
      kRem -= cum
      prefix = (prefix << 16) | b
      if (kRem == cnt) {
        // quota lands on the bucket edge: threshold = bucket's top value
        val hiBiased = (prefix << shift) | ((1L << shift) - 1)
        return ranked.filter(F.col(key) <= F.lit(hiBiased ^ Long.MinValue))
      }
      // else kRem < cnt: descend into bucket b (next level's prefix)
    }
    } finally keys.unpersist()
    // prefix is now the full 64-bit biased value of the k-th boundary
    // hash; kRem rows of it are still owed (1 <= kRem < its multiplicity)
    val t = prefix ^ Long.MinValue
    if (kRem > Int.MaxValue) throw new GraftConfigError(
      s"sample.apply: more than ${Int.MaxValue} byte-identical rows share the " +
      s"k-th boundary hash ($t) — deduplicate or add a distinguishing column")
    ranked.filter(F.col(key) < F.lit(t))
      .union(ranked.filter(F.col(key) === F.lit(t)).limit(kRem.toInt))
  }

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val seed = cfg.longOr("seed", 42L)
    val salt = ctx.stageId
    val df = ctx.primary
    cfg.strOpt("by") match {
      case Some(stratum) if cfg.has("counts") || cfg.has("default_count") || cfg.has("count") =>
        // STRATIFIED EXACT-k ("exactly 10k eval docs PER LANGUAGE"): rank
        // rows within each stratum by a seeded uniform key and keep the k
        // smallest — one window (`row_number` over partitionBy(stratum)),
        // no driver work, no per-stratum jobs. The shuffle is a single
        // hash partition on the stratum key; giant strata pay one
        // per-partition sort, which is the irreducible cost of an exact
        // per-stratum quota. `counts` maps stratum (string key, like
        // `fractions`) → k; `default_count` (or bare `count` as the
        // uniform shorthand) covers unlisted strata, absent = dropped —
        // mirroring sampleBy's treatment of unlisted strata.
        if (cfg.has("fractions") || cfg.has("fraction")) throw new GraftConfigError(
          "sample.apply: give either counts (exact-k per stratum) or fractions, not both")
        if (cfg.boolOr("with_replacement", false)) throw new GraftConfigError(
          "sample.apply: counts (exact-k) does not support with_replacement")
        if (cfg.has("counts") && cfg.has("count")) throw new GraftConfigError(
          "sample.apply: give either a 'counts' table or a uniform 'count', not both")
        val perStratum: Map[String, Long] = cfg.tblOpt("counts")
          .map(t => t.table.keys.map(k => k -> t.longOr(k, 0L)).toMap)
          .getOrElse(Map.empty)
        val dflt: Option[Long] = cfg.longOpt("default_count").orElse(cfg.longOpt("count"))
        (perStratum.values ++ dflt).foreach(k => if (k < 0) throw new GraftConfigError(
          s"sample.apply: per-stratum count must be >= 0, got $k"))
        val key = s"_stratum_${stratum}"
        val rank = "_sample_rank"
        val rn = "_sample_rn"
        // try_element_at, not element_at: under spark.sql.ansi.enabled a
        // missing map key makes element_at THROW (MAP_KEY_DOES_NOT_EXIST)
        // instead of yielding the null this coalesce exists to catch —
        // the default_count fallback must apply in both modes
        val kExpr = F.coalesce(
          (if (perStratum.isEmpty) F.lit(null).cast("long")
           else F.try_element_at(
             F.map(perStratum.toSeq.sortBy(_._1)
               .flatMap { case (s, k) => Seq(F.lit(s), F.lit(k)) }: _*),
             F.col(key))) +:
          dflt.map(d => F.lit(d)).toSeq :+ F.lit(0L): _*)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(key).orderBy(F.col(rank))
        df.withColumn(key, F.col(stratum).cast("string"))
          .withColumn(rank, rankKey(df, seed, salt))
          .withColumn(rn, F.row_number().over(w))
          .filter(F.col(rn) <= kExpr)
          .drop(key, rank, rn)
      case Some(stratum) =>
        // STRATIFIED FRACTIONS as one expression filter: draw(row) <
        // fraction(stratum), with the per-stratum fraction a map-literal
        // lookup and default_fraction the coalesce fallback. No
        // sampleBy, so no stratum-universe collect — the old
        // implementation listed every distinct stratum on the driver to
        // feed sampleBy's map (bounded by max_strata, failing loud on
        // high-cardinality keys); the expression form needs no universe
        // at all, works at any stratum cardinality, and is deterministic
        // across partitionings (sampleBy's rand is per-partition).
        val fr = cfg.tblOpt("fractions").getOrElse(
          throw new GraftConfigError(
            "sample.apply with 'by' requires a 'fractions' table (or 'counts'/" +
            "'default_count' for exact-k per stratum)"))
        val dflt = cfg.doubleOr("default_fraction", 0.0)
        val explicit = fr.table.keys.map(k => k -> fr.doubleOr(k, dflt)).toMap
        (explicit.values ++ Seq(dflt)).foreach(f =>
          if (f < 0.0 || f > 1.0) throw new GraftConfigError(
            s"sample.apply: fractions must be in [0, 1], got $f"))
        val key = s"_stratum_${stratum}"
        val keyed = df.withColumn(key, F.col(stratum).cast("string"))
        val fracExpr = F.coalesce(
          (if (explicit.isEmpty) F.lit(null).cast("double")
           else F.try_element_at(
             F.map(explicit.toSeq.sortBy(_._1)
               .flatMap { case (s, f) => Seq(F.lit(s), F.lit(f)) }: _*),
             F.col(key))) +: Seq(F.lit(dflt)): _*)
        // draw over `keyed` (original columns + the string-cast stratum
        // key): the key column is always hashable, so even a frame whose
        // data columns are all map-typed keeps the deterministic draw
        val draw = drawExpr(keyed, seed, salt).getOrElse(F.rand(seed))
        keyed.filter(draw < fracExpr).drop(key)
      case None =>
        cfg.longOpt("count") match {
          case Some(k) =>
            // EXACT-k uniform sample ("give me exactly 10k eval docs"):
            // rank every row by a seeded uniform key and keep the k
            // smallest. For small k, Catalyst plans orderBy+limit as
            // TakeOrderedAndProject — per-partition bounded k-heaps +
            // one k·partitions merge, never a global sort — the
            // distributed reservoir shape. That merge materializes
            // k·partitions rows ON THE DRIVER, which stops being a
            // reservoir at eval-set scale (k in the hundreds of
            // millions at 100 TB), so above `count_cutoff` (default
            // 10M) the draw switches to a two-pass threshold
            // selection (see thresholdSelectK) with O(65536) driver
            // memory regardless of k — which also lifts the old
            // k <= Int.MaxValue ceiling (limit() takes an Int; the
            // threshold path never calls limit(k)).
            // The key is the content hash (see rankKey), so the draw is
            // deterministic across partitionings, not just within one;
            // hash ties at the k boundary are broken arbitrarily and
            // only matter for byte-identical colliding rows.
            if (cfg.has("fraction")) throw new GraftConfigError(
              "sample.apply: give either 'count' (exact-k) or 'fraction', not both")
            if (k < 0) throw new GraftConfigError(
              s"sample.apply: count must be >= 0, got $k")
            if (cfg.boolOr("with_replacement", false)) throw new GraftConfigError(
              "sample.apply: count (exact-k) does not support with_replacement")
            val cutoff = cfg.longOr("count_cutoff", 10000000L)
            if (cutoff < 0) throw new GraftConfigError(
              s"sample.apply: count_cutoff must be >= 0, got $cutoff")
            val key = "_sample_rank"
            val cols = hashableCols(df)
            if (cols.isEmpty) {
              // rand-fallback rank (no hashable column): rand is only
              // partition-deterministic, so the multi-pass threshold
              // scan cannot reuse it — keep the single-pass top-k
              if (k > Int.MaxValue) throw new GraftConfigError(
                s"sample.apply: count > ${Int.MaxValue} needs the content-hash " +
                "draw (two-pass threshold selection), but no column of this " +
                "frame is hashable (all map-typed)")
              df.withColumn(key, F.rand(seed))
                .orderBy(F.col(key)).limit(k.toInt).drop(key)
            } else if (k <= cutoff && k <= Int.MaxValue) {
              df.withColumn(key, contentHash(cols, seed, salt))
                .orderBy(F.col(key)).limit(k.toInt).drop(key)
            } else {
              thresholdSelectK(
                df.withColumn(key, contentHash(cols, seed, salt)), key, k)
                .drop(key)
            }
          case None =>
            val frac = cfg.doubleOr("fraction", 0.1)
            if (cfg.boolOr("with_replacement", false)) {
              // a multiplicity draw (Poisson, mean = fraction — fraction
              // > 1 is legitimate upsampling here) has no single-pass
              // content-hash analog — keep Dataset.sample's RNG
              if (frac < 0.0) throw new GraftConfigError(
                s"sample.apply: fraction must be >= 0, got $frac")
              df.sample(true, frac, seed)
            } else {
              if (frac < 0.0 || frac > 1.0) throw new GraftConfigError(
                s"sample.apply: fraction must be in [0, 1], got $frac")
              drawExpr(df, seed, salt) match {
                case Some(u) => df.filter(u < F.lit(frac)) // deterministic Bernoulli
                case None    => df.sample(false, frac, seed)
              }
            }
        }
    }
  }
}

/** split.apply — DETERMINISTIC hash split (train/test/holdout). Row routing
  * is a pure function of the key columns (+ salt): xxhash64 mod 100 <
  * percent. Unlike sample(), the same row lands on the same side across
  * runs, machines, and partitionings — the property a reproducible
  * train/eval split needs — and the complement (`partition = "test"`)
  * is exactly the other side with zero coordination. Narrow (no shuffle).
  */
object SplitOp extends Stage {
  val name = "split.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val keys = cfg.strList("columns")
    val pct = cfg.longOr("percent", 80L)
    if (pct < 0 || pct > 100) throw new GraftConfigError(s"percent must be 0-100, got $pct")
    val salt = cfg.strOr("salt", "graft")
    val bucket = F.pmod(
      F.xxhash64(F.lit(salt) +: keys.map(F.col): _*), F.lit(100L))
    cfg.strOr("partition", "train") match {
      case "train" => ctx.primary.filter(bucket < pct)
      case "test"  => ctx.primary.filter(bucket >= pct)
      case other   => throw new GraftConfigError(s"partition must be train|test, got '$other'")
    }
  }
}

/** shuffle.apply — DETERMINISTIC global shuffle, the final step of a
  * training-data pipeline (corpora must be well-mixed before sequence
  * packing/sharding, and the shuffle must be reproducible from a seed).
  * Orders by xxhash64(seed, key columns) with the key columns as
  * tiebreak, so the permutation is a pure function of (seed, data):
  * re-runs, partition layouts and cluster sizes all produce the same
  * order. One range-partitioned sort shuffle — the scale-correct way to
  * shuffle 100 TB (never sample-into-memory, never rand() which breaks
  * retry determinism: a recomputed task would re-draw).
  */
object ShuffleOp extends Stage {
  val name = "shuffle.apply"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val seed = ctx.cfg.longOr("seed", 42L)
    val cols = ctx.cfg.strListOr("columns", df.columns.toVector)
    cols.filterNot(df.columns.contains).foreach(c =>
      throw new GraftConfigError(s"shuffle.apply: unknown column '$c'"))
    val keyCols = cols.map(df(_))
    // tiebreak through the REMAINING columns too: with a non-unique key
    // subset, (hash, keys) alone leaves ties whose relative order would
    // depend on the partition layout — the full-row tiebreak makes the
    // permutation observably deterministic (fully identical rows may
    // still swap, which no downstream consumer can distinguish)
    val rest = df.columns.filterNot(cols.contains).map(df(_)).toSeq
    df.orderBy((F.xxhash64(F.lit(seed) +: keyCols: _*) +: (keyCols ++ rest)): _*)
  }
}
