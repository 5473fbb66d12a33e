package graft
// (shuffle determinism tests live at the bottom of this spec)

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators._

/** sample.apply / split.apply / sketch aggregates. */
class SamplingAggSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1L to 2000L).toDF("id")
    .withColumn("cls", (F.col("id") % 4).cast("int"))

  test("sample.apply: seeded Bernoulli is reproducible and near the fraction") {
    def run() = SampleOp(StageContext.one(spark, ids, Cfg.of(
      "fraction" -> 0.25, "seed" -> 13))).select("id").as[Long].collect().toSet
    val a = run(); val b = run()
    assert(a === b, "same seed must give the same sample")
    assert(math.abs(a.size - 500) < 120, s"got ${a.size}, expected ~500")
  }

  test("sample.apply stratified: per-class fractions with default") {
    val out = SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls", "seed" -> 5,
      "fractions" -> Map("0" -> 0.5, "1" -> 0.1),
      "default_fraction" -> 0.9)))
    val byCls = out.groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(math.abs(byCls(0) - 250) < 90)
    assert(math.abs(byCls(1) - 50) < 45)
    assert(math.abs(byCls.getOrElse(2, 0L) - 450) < 90)   // default 0.9 of 500
  }

  test("sample.apply stratified exact-k: counts table, default_count, determinism") {
    // ids: 500 rows per class 0..3
    val out = SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls", "seed" -> 5,
      "counts" -> Map("0" -> 100L, "1" -> 7L),
      "default_count" -> 3L)))
    val byCls = out.groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byCls === Map(0 -> 100L, 1 -> 7L, 2 -> 3L, 3 -> 3L),
      "exact per-stratum quotas, default for unlisted strata")
    // sampled rows are distinct source rows
    assert(out.select("id").distinct().count() === out.count())
    // deterministic for a fixed input partitioning
    def again() = SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls", "seed" -> 5, "counts" -> Map("0" -> 100L, "1" -> 7L),
      "default_count" -> 3L))).select("id").as[Long].collect().sorted.toSeq
    assert(again() === again())
    // k >= stratum size keeps the whole stratum (the identity the gate pins)
    val all = SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls", "seed" -> 5, "default_count" -> 100000L)))
    assert(all.count() === 2000L)
    // no default → unlisted strata are dropped (sampleBy parity)
    val only0 = SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls", "seed" -> 5, "counts" -> Map("0" -> 10L))))
    assert(only0.select("cls").distinct().as[Int].collect().toSeq === Seq(0))
    assert(only0.count() === 10L)
    // bare `count` with `by` = uniform per-stratum quota shorthand
    val uniform = SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls", "seed" -> 5, "count" -> 4L)))
    assert(uniform.groupBy("cls").count().select("count").as[Long]
      .collect().toSeq === Seq.fill(4)(4L))
    // loud rejections
    intercept[GraftConfigError](SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls", "counts" -> Map("0" -> 1L), "fractions" -> Map("0" -> 0.5)))))
    intercept[GraftConfigError](SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls", "counts" -> Map("0" -> 1L), "count" -> 5L))))
    intercept[GraftConfigError](SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls", "counts" -> Map("0" -> -2L)))))
    intercept[GraftConfigError](SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls", "count" -> 5L, "with_replacement" -> true))))
  }

  test("stratified exact-k properties: random strata/counts hold the quota invariants") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random populations over ≤6 strata and random quota tables — the
    // three invariants the two gates cannot pin by example alone:
    //   (1) per-stratum output size = min(quota, stratum size), with
    //       counts-over-default precedence and unlisted-strata-drop;
    //   (2) determinism: same seed ⇒ same ROWS (not just sizes), under a
    //       different physical partitioning of the same input;
    //   (3) bare `count` ≡ default_count as the uniform shorthand.
    val popGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 5), Gen.choose(0L, 10000L)))
    val quotaGen = Gen.mapOf(Gen.zip(
      Gen.choose(0, 5).map(_.toString), Gen.choose(0L, 12L)))
    val caseGen = Gen.zip(popGen, quotaGen, Gen.option(Gen.choose(0L, 12L)))
    val cases = (0 until 12).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(7L + i)))
    for (((pop, quotas, dflt), i) <- cases.zipWithIndex) {
      val df = pop.zipWithIndex
        .map { case ((cls, noise), j) => (j.toLong, cls, noise) }
        .toDF("id", "cls", "noise")
      val base = Seq[(String, Any)]("by" -> "cls", "seed" -> (100L + i))
      val cfg: Seq[(String, Any)] =
        (if (quotas.nonEmpty) base :+ ("counts" -> quotas) else base) ++
        dflt.map(d => "default_count" -> d).toSeq
      if (quotas.isEmpty && dflt.isEmpty) {
        // config contract: counts-mode needs at least one quota source
        intercept[GraftConfigError](SampleOp(StageContext.one(spark, df,
          Cfg.of(("count" -> -1L) +: base: _*))))
      } else {
        def run(input: org.apache.spark.sql.DataFrame) =
          SampleOp(StageContext.one(spark, input, Cfg.of(cfg: _*)))
            .select("id", "cls").as[(Long, Int)].collect().toVector
        val got = run(df)
        // (1) quota arithmetic per stratum
        val popSizes = pop.groupBy(_._1).map { case (c, xs) => c -> xs.size.toLong }
        val outSizes = got.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
        for ((c, n) <- popSizes) {
          val quota = quotas.get(c.toString).orElse(dflt).getOrElse(0L)
          assert(outSizes.getOrElse(c, 0L) === math.min(quota, n),
            s"case $i stratum $c: pop $n quota $quota")
        }
        assert(got.map(_._1).distinct.size === got.size, "no duplicated rows")
        // (2) same seed, different physical partitioning ⇒ same rows
        val again = run(df.repartition(7, F.col("noise")))
        assert(again.sortBy(_._1) === got.sortBy(_._1),
          s"case $i: result must be deterministic under repartition")
        // (3) bare count ≡ default_count when no counts table competes
        if (quotas.isEmpty && dflt.isDefined) {
          val viaCount = SampleOp(StageContext.one(spark, df, Cfg.of(
            "by" -> "cls", "seed" -> (100L + i), "count" -> dflt.get)))
            .select("id").as[Long].collect().toVector.sorted
          assert(viaCount === got.map(_._1).sorted, s"case $i: count ≡ default_count")
        }
      }
    }
  }

  test("chained sample stages draw independently; dotted columns and upsampling survive") {
    // the content hash is salted with the stage id: two fraction=0.5
    // stages in one pipeline must compose to ~0.25, not be a no-op
    // (unsalted, every row passing stage 1's u < 0.5 passes stage 2's)
    def stage(df: org.apache.spark.sql.DataFrame, id: String) =
      SampleOp(StageContext(spark, Seq("in" -> df),
        Cfg.of("fraction" -> 0.5, "seed" -> 42), id))
    val once = stage(ids, "s1")
    val twice = stage(once, "s2")
    val n2 = twice.count()
    assert(math.abs(n2 - 500L) < 120, s"two chained 0.5 samples ≈ 0.25, got $n2")
    // a literal dot in a column name must hash as a column reference,
    // not parse as struct access
    val dotted = ids.withColumnRenamed("id", "a.b")
    val dn = SampleOp(StageContext.one(spark, dotted,
      Cfg.of("fraction" -> 0.3, "seed" -> 3))).count()
    assert(math.abs(dn - 600L) < 140)
    // with_replacement upsampling: fraction > 1 is a Poisson mean, legal
    val up = SampleOp(StageContext.one(spark, ids,
      Cfg.of("fraction" -> 2.0, "with_replacement" -> true, "seed" -> 3))).count()
    assert(math.abs(up - 4000L) < 500, s"mean-2 Poisson over 2000 rows, got $up")
    // ...but a Bernoulli fraction > 1 is still rejected loud
    intercept[GraftConfigError](SampleOp(StageContext.one(spark, ids,
      Cfg.of("fraction" -> 2.0))))
  }

  test("ANSI mode: missing map keys coalesce to defaults instead of throwing") {
    // the three map-literal lookups (stratified quotas/fractions, kafka
    // offset frontiers) all use try_element_at because under
    // spark.sql.ansi.enabled element_at THROWS MAP_KEY_DOES_NOT_EXIST for
    // a missing key — the coalesce fallback must apply in both modes.
    // ISOLATED in its own session: flipping the conf on the shared
    // session races concurrently-running suites (sbt runs suites in
    // parallel, and size(null)/cast semantics change under ANSI)
    val ansi = spark.newSession()
    ansi.conf.set("spark.sql.ansi.enabled", "true")
    import ansi.implicits._
    val aIds = (1L to 2000L).toDF("id")
      .withColumn("cls", (F.col("id") % 4).cast("int"))
    // stratum '3' has no entry in counts → default_count applies
    val k = SampleOp(StageContext.one(ansi, aIds, Cfg.of(
      "by" -> "cls", "seed" -> 5, "counts" -> Map("0" -> 7L),
      "default_count" -> 3L)))
      .groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(k(0) === 7L)
    assert(Seq(1, 2, 3).forall(c => k(c) === 3L), s"default quota under ANSI: $k")
    // unlisted stratum under fractions → default_fraction applies
    val f = SampleOp(StageContext.one(ansi, aIds, Cfg.of(
      "by" -> "cls", "seed" -> 5, "fractions" -> Map("0" -> 1.0),
      "default_fraction" -> 0.0)))
    assert(f.select("cls").distinct().collect().map(_.getInt(0)).toSeq === Seq(0))
    // kafka: a consume resuming from a committed frontier where a NEW
    // partition has no committed offset must read it from 0, not throw
    val root = java.nio.file.Files.createTempDirectory("graft_ansi_k").toString
    graft.operators.KafkaProduceSink(StageContext.one(ansi,
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("name", "v"),
      Cfg.of("path" -> root, "topic" -> "t", "key_field" -> "name",
        "num_partitions" -> 3)))
    graft.operators.KafkaLog.commit(root, "g", "t", Map(0 -> 1L))
    val again = graft.operators.KafkaConsumeSource(StageContext(ansi, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "t", "group_id" -> "g",
        "max_messages" -> 0L), "k"))
    assert(again.count() >= 2L, "partitions without committed offsets read from 0")
  }

  test("sample.apply count: > Int.MaxValue routes to the threshold path, not overflow") {
    // the r9 contract rejected k > Int.MaxValue because orderBy+limit
    // takes an Int; the threshold path has no limit(k), so a giant k is
    // now legal — here k >= n, so the draw is the identity (and the old
    // silent-overflow hazard is pinned gone by the exact count)
    assert(SampleOp(StageContext.one(spark, ids, Cfg.of(
      "count" -> 3000000000L))).count() === 2000L)
    // ...but the rand-fallback rank (no hashable column) cannot do the
    // multi-pass threshold scan, and still fails loud past Int.MaxValue
    val mapsOnly = ids.select(F.map(F.lit("k"), F.col("id")).as("m"))
    val e = intercept[GraftConfigError](SampleOp(StageContext.one(spark, mapsOnly,
      Cfg.of("count" -> 3000000000L))))
    assert(e.getMessage.contains("hashable"))
  }

  test("sample.apply count: threshold path selects the IDENTICAL row set as top-k") {
    // the two-pass threshold selection (histogram descent + boundary
    // trim) must be a pure optimization: for every k, the selected row
    // set equals the orderBy+limit path's (both rank by the same content
    // hash; 64-bit hashes over distinct rows make the boundary tie-free).
    // count_cutoff is forced low so k straddles it both ways, including
    // k=cutoff (last top-k k) and k=cutoff+1 (first threshold k).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = org.scalacheck.Gen.zip(
      Gen.choose(1L, 400L),        // population size
      Gen.choose(0L, 450L),        // k (may exceed n)
      Gen.choose(1L, 9999L))       // seed
    val cases = (0 until 24).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(31L + i)))
    assert(cases.size >= 20, "generator must produce cases")
    for (((n, k, seed), i) <- cases.zipWithIndex) {
      val df = (1L to n).toDF("id").withColumn("v", F.col("id") * 17 % 23)
        .repartition(1 + (i % 5))
      def run(cutoff: Long) = SampleOp(StageContext.one(spark, df, Cfg.of(
        "count" -> k, "seed" -> seed, "count_cutoff" -> cutoff)))
        .select("id").as[Long].collect().sorted.toSeq
      val topk = run(Long.MaxValue)   // always orderBy+limit
      val thresh = run(0L)            // always threshold descent
      assert(thresh === topk, s"case $i: n=$n k=$k seed=$seed")
      assert(topk.size === math.min(n, k))
    }
    // byte-identical duplicates at the boundary: the trim keeps exactly
    // k rows (the duplicate rows are interchangeable, so set-of-rows
    // equality is the multiset size + membership)
    val dup = (1L to 50L).flatMap(i => Seq.fill(4)(i % 7)).toDF("id")
    val got = SampleOp(StageContext.one(spark, dup, Cfg.of(
      "count" -> 9L, "seed" -> 3, "count_cutoff" -> 0L)))
    assert(got.count() === 9L, "boundary trim lands exactly on k despite duplicate hashes")
    val viaTopk = SampleOp(StageContext.one(spark, dup, Cfg.of(
      "count" -> 9L, "seed" -> 3)))
    assert(got.select("id").as[Long].collect().sorted.toSeq ===
      viaTopk.select("id").as[Long].collect().sorted.toSeq,
      "duplicate-row boundary: same multiset either path")
  }

  test("sample.apply count above cutoff: no TakeOrderedAndProject, no k-scaled driver state") {
    // the scale contract itself: above count_cutoff the plan must not
    // contain the per-partition-heap + driver-merge operator — the
    // result is codegen'd filters (plus a limit over ONLY the boundary
    // hash's rows), so driver memory is O(65536) however large k is
    val big = (0L until 5000L).toDF("id")
    val out = SampleOp(StageContext.one(spark, big, Cfg.of(
      "count" -> 1000L, "seed" -> 7, "count_cutoff" -> 10L)))
    val planStr = out.queryExecution.executedPlan.toString
    assert(!planStr.contains("TakeOrderedAndProject"),
      planStr.linesIterator.take(6).mkString("\n"))
    assert(out.count() === 1000L)
    // determinism across physical partitionings holds on this path too
    def run(parts: Int) = SampleOp(StageContext.one(spark,
      big.repartition(parts), Cfg.of(
      "count" -> 1000L, "seed" -> 7, "count_cutoff" -> 10L)))
      .select("id").as[Long].collect().sorted.toSeq
    assert(run(3) === run(17))
  }

  test("sample.apply stratified: default_fraction needs no stratum universe — any cardinality") {
    // the expression-filter form (draw < fraction(stratum)) replaced the
    // old sampleBy path, whose default_fraction had to COLLECT every
    // distinct stratum to the driver (bounded by max_strata, failing loud
    // at high cardinality). `id` has 2000 distinct strata; no collect, no
    // bound, and named-fraction precedence still applies
    val out = SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "id", "seed" -> 5, "fractions" -> Map("1" -> 1.0),
      "default_fraction" -> 0.2)))
    assert(out.filter(F.col("id") === 1L).count() === 1L, "named stratum kept at 1.0")
    val rest = out.filter(F.col("id") =!= 1L).count()
    assert(math.abs(rest - 400L) < 90, s"default 0.2 of 1999 single-row strata, got $rest")
    // explicit fractions only (no default) drop unlisted strata
    val only = SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "id", "seed" -> 5, "fractions" -> Map("1" -> 1.0))))
    assert(only.count() === 1L)
    // out-of-range fractions are rejected loud
    intercept[GraftConfigError](SampleOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "id", "fractions" -> Map("1" -> 1.5)))))
    intercept[GraftConfigError](SampleOp(StageContext.one(spark, ids, Cfg.of(
      "fraction" -> -0.1))))
  }

  test("sample.apply fraction draws are deterministic across partitionings") {
    // the content-hash draw makes Bernoulli and stratified fractions pure
    // functions of (row, seed): the same rows survive no matter how the
    // input is physically partitioned — rand(seed)-based sampling changed
    // with partition count, which is a cluster-config fact, not a data fact
    def bern(df: org.apache.spark.sql.DataFrame) =
      SampleOp(StageContext.one(spark, df, Cfg.of("fraction" -> 0.3, "seed" -> 9)))
        .select("id").as[Long].collect().toSet
    val b1 = bern(ids)
    assert(bern(ids.repartition(13)) === b1)
    assert(bern(ids.repartition(1)) === b1)
    def strat(df: org.apache.spark.sql.DataFrame) =
      SampleOp(StageContext.one(spark, df, Cfg.of(
        "by" -> "cls", "seed" -> 9,
        "fractions" -> Map("0" -> 0.5, "1" -> 0.1), "default_fraction" -> 0.8)))
        .select("id").as[Long].collect().toSet
    val s1 = strat(ids)
    assert(strat(ids.repartition(13, F.col("id"))) === s1)
    // a different seed draws a different sample (the hash is salted)
    val other = SampleOp(StageContext.one(spark, ids, Cfg.of(
      "fraction" -> 0.3, "seed" -> 10))).select("id").as[Long].collect().toSet
    assert(other !== b1)
  }

  test("content-hash draw trade: duplicate groups select all-or-nothing; tie-break restores independence") {
    // the documented trade of the content-hash draw (Sampling.scala
    // rankKey doc): byte-identical rows share a hash, so a Bernoulli
    // fraction selects each DUPLICATE GROUP as a unit — and the
    // documented escape hatch (add a distinguishing column, e.g. a
    // stable row id) restores row-level independence. Property-tested
    // over random duplicate multiplicities and fractions.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(1, 6)),   // multiplicity per duplicate group
      Gen.choose(0.2, 0.8),                   // fraction
      Gen.choose(1L, 9999L))                  // seed
    val cases = (0 until 10).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(97L + i)))
    assert(cases.size >= 8)
    for ((((mults, frac, seed)), i) <- cases.zipWithIndex) {
      // d duplicate groups: group g appears mults(g) times, byte-identical
      val rows = mults.zipWithIndex.flatMap { case (m, g) =>
        Seq.fill(m)(s"group_$g")
      }
      val df = rows.toDF("text").repartition(1 + (i % 4))
      val kept = SampleOp(StageContext.one(spark, df, Cfg.of(
        "fraction" -> frac, "seed" -> seed)))
        .groupBy("text").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // (1) all-or-nothing per group: a kept group keeps EVERY copy
      for ((g, m) <- mults.zipWithIndex.map { case (m, g) => (s"group_$g", m.toLong) })
        assert(!kept.contains(g) || kept(g) === m,
          s"case $i: group $g kept ${kept.getOrElse(g, 0L)} of $m copies — " +
          "duplicate groups must select as a unit")
    }
    // (2) the escape hatch: a distinct tie-break column makes copies of
    // the same text draw independently — across many groups of 8 copies
    // at fraction 0.5, SOME group must split (all-or-nothing would keep
    // 0 or 8 of every group; P[no split across 60 groups] ≈ 2·0.5^8·60 ≈ 0)
    val withId = (0 until 60).flatMap(g => (0 until 8).map(c => (s"group_$g", g * 8L + c)))
      .toDF("text", "row_id")
    val keptId = SampleOp(StageContext.one(spark, withId, Cfg.of(
      "fraction" -> 0.5, "seed" -> 11)))
      .groupBy("text").count().collect().map(r => r.getLong(1))
    assert(keptId.exists(c => c > 0 && c < 8),
      "tie-break column must restore row-level independence (some group splits)")
    // and the overall rate still tracks the fraction
    val total = keptId.sum
    assert(math.abs(total - 240L) < 70, s"0.5 of 480 rows, got $total")
  }

  test("split.apply: train/test partition the table deterministically") {
    def part(p: String) = SplitOp(StageContext.one(spark, ids, Cfg.of(
      "columns" -> Seq("id"), "percent" -> 80, "partition" -> p)))
      .select("id").as[Long].collect().toSet
    val train = part("train"); val test = part("test")
    assert(train.intersect(test).isEmpty)
    assert(train.size + test.size === 2000)
    assert(math.abs(train.size - 1600) < 120)
    assert(part("train") === train, "hash split must be run-stable")
    intercept[GraftConfigError](SplitOp(StageContext.one(spark, ids,
      Cfg.of("columns" -> Seq("id"), "percent" -> 101))))
  }

  test("approx_count_distinct within rsd; count_distinct exact; percentile_approx") {
    val g = GroupByOp(StageContext.one(spark, ids, Cfg.of(
      "by" -> "cls",
      "aggregations" -> Seq(
        Map("column" -> "id", "operation" -> "count_distinct", "output_column" -> "exact"),
        Map("column" -> "id", "operation" -> "approx_count_distinct",
          "output_column" -> "approx", "rsd" -> 0.02),
        Map("column" -> "id", "operation" -> "percentile_approx",
          "output_column" -> "p50", "p" -> 0.5, "accuracy" -> 10000)))))
    g.collect().foreach { r =>
      val exact = r.getAs[Long]("exact")
      val approx = r.getAs[Long]("approx")
      assert(exact === 500L)
      assert(math.abs(approx - exact) <= exact * 0.06,
        s"approx $approx vs exact $exact")
      // ids per class are an arithmetic sequence; exact median is the
      // 250th/251st element ±accuracy slack
      assert(math.abs(r.getAs[Long]("p50") - 1000L) <= 16L)
    }
  }

  test("shuffle.apply: deterministic permutation, seed-sensitive, content-preserving") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"row$i")).toDF("id", "v")
    def order(seed: Long, parts: Int): Seq[Long] =
      graft.operators.ShuffleOp(graft.core.StageContext.one(spark, df.repartition(parts),
        graft.config.Cfg.of("seed" -> seed, "columns" -> Seq("id"))))
        .select("id").as[Long].collect().toSeq
    val a = order(7, 4)
    assert(a === order(7, 9), "same seed must give the same order across partition layouts")
    assert(a.sorted === (1L to 200L), "shuffle must preserve content")
    assert(a !== (1L to 200L).toSeq, "shuffle must actually permute")
    assert(a !== order(8, 4), "different seeds must permute differently")
    intercept[graft.config.GraftConfigError] {
      graft.operators.ShuffleOp(graft.core.StageContext.one(spark, df,
        graft.config.Cfg.of("columns" -> Seq("nope"))))
    }
  }

  test("shuffle.apply: non-unique key columns stay deterministic (full-row tiebreak)") {
    import spark.implicits._
    val df = (1L to 120L).map(i => (i % 5, i)).toDF("grp", "id")
    def order(parts: Int): Seq[Long] =
      graft.operators.ShuffleOp(graft.core.StageContext.one(spark, df.repartition(parts),
        graft.config.Cfg.of("seed" -> 3, "columns" -> Seq("grp"))))
        .select("id").as[Long].collect().toSeq
    assert(order(2) === order(11),
      "rows tied on (hash, grp) must order by the remaining columns, not partition layout")
  }
  test("sample.apply count: exactly k distinct rows, bounded top-k plan, loud rejections") {
    val ids = (0L until 5000L).toDF("id")
    val out = SampleOp(StageContext.one(spark, ids, Cfg.of("count" -> 100, "seed" -> 7)))
    val got = out.select("id").as[Long].collect()
    assert(got.length === 100 && got.distinct.length === 100)
    // deterministic for a fixed input partitioning
    val again = SampleOp(StageContext.one(spark, ids, Cfg.of("count" -> 100, "seed" -> 7)))
      .select("id").as[Long].collect()
    assert(got.sorted.toSeq === again.sorted.toSeq)
    // a different seed draws a different set
    val other = SampleOp(StageContext.one(spark, ids, Cfg.of("count" -> 100, "seed" -> 8)))
      .select("id").as[Long].collect()
    assert(got.sorted.toSeq !== other.sorted.toSeq)
    // k >= rows returns everything
    assert(SampleOp(StageContext.one(spark, ids, Cfg.of("count" -> 9999)))
      .count() === 5000L)
    // plan: TakeOrderedAndProject (per-partition heaps), never a global sort
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("TakeOrderedAndProject"), planStr.linesIterator.take(4).mkString("\n"))
    intercept[GraftConfigError](SampleOp(StageContext.one(spark, ids, Cfg.of(
      "count" -> 10, "fraction" -> 0.5))))
    intercept[GraftConfigError](SampleOp(StageContext.one(spark, ids, Cfg.of(
      "count" -> 10, "with_replacement" -> true))))
    intercept[GraftConfigError](SampleOp(StageContext.one(spark, ids, Cfg.of(
      "count" -> -1))))
  }
}

