package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.{GraftPlanError, StageContext}
import graft.operators.{CompressibilityOp, DecontaminateOp, TopKOp}

/** topk.approx (Misra-Gries heavy hitters), the decontaminate Bloom
  * prefilter, and text.compressibility. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def wordsDf(words: Seq[String]) = words.toDF("w")

  test("exact regime (capacity >= distincts) matches groupBy exactly") {
    val data = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      Seq.fill(20)("d") ++ Seq.fill(5)("e")
    val got = TopKOp(StageContext.one(spark, wordsDf(scala.util.Random.shuffle(data)),
      Cfg.of("column" -> "w", "k" -> 3, "capacity" -> 100)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // N=125, capacity=100 → bound floor(125/100)=1 rides on count_max
    assert(got.toSeq === Seq(("a", 50L, 51L), ("b", 30L, 31L), ("c", 20L, 21L)))
  }

  test("ties at the k boundary break deterministically on term asc") {
    val data = Seq.fill(10)("z") ++ Seq.fill(10)("a") ++ Seq.fill(10)("m") ++ Seq("x")
    val got = TopKOp(StageContext.one(spark, wordsDf(data),
      Cfg.of("column" -> "w", "k" -> 2, "capacity" -> 100)))
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("a", "m"))
  }

  test("approximate regime: MG bounds hold and heavy values are guaranteed") {
    // one skewed partition: 1000 distinct light values + 3 heavy ones,
    // capacity 50 forces constant eviction
    val heavy = Seq.fill(400)("hh1") ++ Seq.fill(300)("hh2") ++ Seq.fill(200)("hh3")
    val light = (1 to 1000).map(i => s"w$i")
    val all = scala.util.Random.shuffle(heavy ++ light)
    val df = wordsDf(all).repartition(1)
    val truth = all.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val n = all.size.toLong
    val cap = 50
    val got = TopKOp(StageContext.one(spark, df,
      Cfg.of("column" -> "w", "k" -> 10, "capacity" -> cap)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every estimate is an underestimate, and count_max bounds the truth
    got.foreach { case (w, c, cMax) =>
      assert(c <= truth(w), s"$w overestimated")
      assert(truth(w) <= cMax, s"$w true count ${truth(w)} above bound $cMax")
      assert(cMax === c + n / cap)
    }
    // classical MG guarantee: true count > N/capacity → must be reported
    val reported = got.map(_._1).toSet
    Seq("hh1", "hh2", "hh3").foreach(h =>
      assert(reported.contains(h), s"heavy hitter $h (true=${truth(h)}, N/cap=${n / cap}) missing"))
  }

  test("tokenize mode counts whitespace tokens without materializing them") {
    val docs = Seq("The quick brown fox", "the   QUICK fox", "fox").toDF("text")
    val got = TopKOp(StageContext.one(spark, docs,
      Cfg.of("column" -> "text", "tokenize" -> true, "k" -> 2, "capacity" -> 100)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("fox", 3L), ("quick", 2L)))
  }

  test("tokenize skips empty/whitespace-only docs instead of counting \"\"") {
    // a cleaned corpus full of emptied docs must not surface "" as a
    // heavy hitter (nor inflate N)
    val docs = (Seq.fill(50)("") ++ Seq.fill(20)("   ") ++ Seq.fill(3)("word")).toDF("text")
    val got = TopKOp(StageContext.one(spark, docs,
      Cfg.of("column" -> "text", "tokenize" -> true, "k" -> 5, "capacity" -> 100)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("word", 3L, 3L)), got.mkString(","))
  }

  test("nulls are skipped; config errors are loud") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("w")
    val got = TopKOp(StageContext.one(spark, df,
      Cfg.of("column" -> "w", "k" -> 5, "capacity" -> 10)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a", 2L), ("b", 1L)))
    intercept[GraftConfigError](TopKOp(StageContext.one(spark, df,
      Cfg.of("column" -> "w", "k" -> 20, "capacity" -> 10))))
    intercept[GraftPlanError](TopKOp(StageContext.one(spark, df,
      Cfg.of("column" -> "nope"))))
  }

  test("summary output + topk.merge equals the one-pass top-k (exact regime)") {
    val batch1 = (Seq.fill(30)("a") ++ Seq.fill(10)("b") ++ Seq.fill(5)("c")).toDF("w")
    val batch2 = (Seq.fill(5)("a") ++ Seq.fill(25)("b") ++ Seq.fill(8)("d")).toDF("w")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TopKOp(StageContext.one(spark, df,
        Cfg.of("column" -> "w", "capacity" -> 100, "output" -> "summary")))
    // the summary frame round-trips through parquet (the incremental path)
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch")
    sketch(batch1).write.parquet(s"$dir/b1")
    val merged = graft.operators.TopKMergeOp(StageContext(spark, Seq(
      "b1" -> spark.read.parquet(s"$dir/b1"), "b2" -> sketch(batch2)),
      Cfg.of("k" -> 3)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // direct one-pass over the union: a=35, b=35, c=5, d=8; N=83, bound 0
    assert(merged.toSeq === Seq(("a", 35L, 35L), ("b", 35L, 35L), ("d", 8L, 8L)))
  }

  test("topk.merge rejects mismatched capacities and non-summary frames") {
    def sk(cap: Int) = graft.operators.TopKOp(StageContext.one(spark,
      Seq("x", "y").toDF("w"),
      Cfg.of("column" -> "w", "capacity" -> cap, "output" -> "summary")))
    intercept[GraftConfigError](graft.operators.TopKMergeOp(StageContext(spark,
      Seq("a" -> sk(100), "b" -> sk(200)), Cfg.of("k" -> 5))).collect())
    intercept[GraftPlanError](graft.operators.TopKMergeOp(StageContext(spark,
      Seq("a" -> Seq("x").toDF("w")), Cfg.of("k" -> 5))))
  }

  test("decontaminate bloom prefilter is bit-identical to the exact path") {
    val train = (1L to 60L).map(i =>
      (i, if (i % 5 == 0) s"the shared leaked benchmark sentence number ${i % 3} repeated verbatim here"
          else s"unique training document $i with its own words ${i * 7} ${i * 13}"))
      .toDF("doc_id", "text")
    val bench = (0L to 2L).map(j =>
      (100L + j, s"the shared leaked benchmark sentence number $j repeated verbatim here"))
      .toDF("doc_id", "text")
    def run(bloom: Boolean) = DecontaminateOp(StageContext(spark, Seq(
      "train" -> train, "bench" -> bench), Cfg.of(
      "id_column" -> "doc_id", "column" -> "text", "n" -> 8,
      "mode" -> "annotate", "bloom" -> bloom)))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_matched_ngrams"),
        r.getAs[Boolean]("contaminated")))
    val exact = run(bloom = false)
    val bloomed = run(bloom = true)
    assert(bloomed === exact)
    assert(exact.count(_._3) === 12, "every 5th doc shares benchmark 8-grams")
  }

  test("group_by: independent per-group sketches, per-group bounds and ranking") {
    val data =
      Seq.fill(50)(("s1", "a")) ++ Seq.fill(30)(("s1", "b")) ++ Seq.fill(10)(("s1", "c")) ++
      Seq.fill(5)(("s2", "a")) ++ Seq.fill(40)(("s2", "z")) ++ Seq.fill(20)(("s2", "y"))
    val df = scala.util.Random.shuffle(data).toDF("src", "w")
    val got = TopKOp(StageContext.one(spark, df, Cfg.of(
      "column" -> "w", "group_by" -> "src", "k" -> 2, "capacity" -> 100)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // exact regime; bound uses each group's OWN total (s1: N=90, s2: N=65
    // → floor(N/100) = 0 for both)
    assert(got.toSeq === Seq(
      ("s1", "a", 50L, 50L), ("s1", "b", 30L, 30L),
      ("s2", "z", 40L, 40L), ("s2", "y", 20L, 20L)))
    // approximate regime per group: bounds hold within each group alone
    val heavy = Seq.fill(300)(("g1", "hh")) ++ (1 to 500).map(i => ("g1", s"w$i")) ++
      Seq.fill(10)(("g2", "only"))
    val adf = scala.util.Random.shuffle(heavy).toDF("src", "w").repartition(1)
    val agot = TopKOp(StageContext.one(spark, adf, Cfg.of(
      "column" -> "w", "group_by" -> "src", "k" -> 3, "capacity" -> 50)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val g1 = agot.filter(_._1 == "g1")
    assert(g1.map(_._2).contains("hh"), "per-group heavy hitter must be reported")
    g1.foreach { case (_, w, c, cMax) =>
      val truth = if (w == "hh") 300L else 1L
      assert(c <= truth && truth <= cMax, s"group bound violated for $w: $c..$cMax vs $truth")
      assert(cMax === c + 800L / 50L, "bound must use g1's own N, not the frame total")
    }
    // g2 untouched by g1's evictions: tiny group stays exact
    assert(agot.filter(_._1 == "g2").toSeq === Seq(("g2", "only", 10L, 10L)))
  }

  test("grouped summaries merge per group; group sets must agree") {
    val b1 = (Seq.fill(30)(("s1", "a")) ++ Seq.fill(10)(("s2", "x"))).toDF("src", "w")
    val b2 = (Seq.fill(5)(("s1", "a")) ++ Seq.fill(25)(("s2", "x")) ++
      Seq.fill(8)(("s2", "q"))).toDF("src", "w")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      TopKOp(StageContext.one(spark, df, Cfg.of(
        "column" -> "w", "group_by" -> "src", "capacity" -> 100, "output" -> "summary")))
    val merged = graft.operators.TopKMergeOp(StageContext(spark, Seq(
      "b1" -> sketch(b1), "b2" -> sketch(b2)), Cfg.of("k" -> 2)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(merged.toSeq === Seq(
      ("s1", "a", 35L), ("s2", "x", 35L), ("s2", "q", 8L)))
    // a grouped and an ungrouped summary cannot merge
    val flat = TopKOp(StageContext.one(spark, b1, Cfg.of(
      "column" -> "w", "capacity" -> 100, "output" -> "summary")))
    intercept[GraftPlanError](graft.operators.TopKMergeOp(StageContext(spark, Seq(
      "g" -> sketch(b2), "f" -> flat), Cfg.of("k" -> 2))))
    // reserved/overlapping group names fail loud
    intercept[GraftConfigError](TopKOp(StageContext.one(spark,
      b1.withColumnRenamed("src", "count"), Cfg.of(
        "column" -> "w", "group_by" -> "count"))))
    intercept[GraftConfigError](TopKOp(StageContext.one(spark, b1, Cfg.of(
      "column" -> "w", "group_by" -> "w"))))
  }

  test("compressibility: boilerplate << prose << incompressible, empty is null") {
    val rnd = new scala.util.Random(7)
    val docs = Seq(
      ("rep", "spam spam spam " * 200),
      ("prose", "The quick brown fox jumps over the lazy dog while seventeen " +
        "curious students watched from behind the old wooden fence near the river. " * 8),
      ("junk", Array.fill(3000)(rnd.nextPrintableChar()).mkString),
      ("empty", "")).toDF("id", "text")
    val got = CompressibilityOp(StageContext.one(spark, docs, Cfg.of("column" -> "text")))
      .collect().map(r => r.getString(0) -> Option(r.getAs[java.lang.Double]("compression_ratio")))
      .toMap
    assert(got("empty").isEmpty)
    val (rep, prose, junk) = (got("rep").get, got("prose").get, got("junk").get)
    assert(rep < 0.1, s"repetitive text should compress hard, got $rep")
    assert(rep < prose && prose < junk, s"ordering violated: $rep, $prose, $junk")
    assert(junk > 0.5, s"random text should barely compress, got $junk")
  }
}
