package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression tests: the scale properties the engine is
  * designed around, asserted on real gate queries so they can't silently
  * regress. Uses the sf0.001 test tables (plan shape, not timing).
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.sparkPlan.toString
  }

  test("q3: filters are pushed to both fact scans") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate")
      || p.matches("(?s).*PushedFilters: \\[.*l_shipdate.*"), p.take(2000))
    assert(p.matches("(?s).*PushedFilters: \\[.*o_orderdate.*"), "orders filter not pushed")
    assert(p.matches("(?s).*PushedFilters: \\[.*c_mktsegment.*"), "customer filter not pushed")
  }

  test("projection prunes the parquet ReadSchema") {
    val p = plan("select_proj")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      p.take(1500))
  }

  test("dimension joins broadcast; the fact side never exchanges pre-join") {
    val p = plan("join_cust_nation_region")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "dim join degenerated to SMJ")
  }

  test("exact-k above count_cutoff: the threshold-descent gate has no TakeOrderedAndProject") {
    // the sample_exact_count_threshold gate forces count_cutoff below k,
    // so the draw must plan as codegen'd hash filters (+ the boundary
    // union/limit), never the k-scaled TakeOrdered driver merge
    val p = plan("sample_exact_count_threshold")
    assert(!p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.matches("(?s).*Sort .*global=true.*"), "no global sort either")
  }

  test("js.eval with a declared schema stays ONE plan — no RDD-scan boundary") {
    // the declared-schema path must use from_json, not
    // spark.read.json(dataset): the reader converts to an RDD, which both
    // plans the upstream eagerly at compose time and hides it behind a
    // "Scan ExistingRDD" the optimizer can't see through (r11 finding:
    // 3.9 s of the corpus example's 5.3 s compile was this boundary)
    val p = plan("js_eval_transform")
    assert(!p.contains("ExistingRDD"), p.take(1500))
    assert(p.contains("from_json"), "declared-schema js.eval should parse via from_json")
    // the parquet source is visible IN the same plan tree as the JS stage
    assert(p.contains("Scan parquet"), p.take(1500))
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("groupby aggregates partially before the exchange") {
    val p = plan("groupby_basic")
    assert(p.matches("(?s).*partial_sum.*Exchange.*") ||
      p.matches("(?s).*HashAggregate.*partial.*"), p.take(1500))
  }

  test("no similarity operator ever plans a cartesian/nested-loop join") {
    for (q <- Seq("dedup_embedding", "dedup_embedding_bands", "dedup_minhash",
                  "dedup_ngram", "knn_lsh", "decontaminate_embedding")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop")
    }
  }

  test("as-of join is one exchange + one sort + one window over the union") {
    val p = plan("asof_prev_order")
    // the right side's groupBy adds its own exchange; the asof core adds
    // exactly one more + a single Window node
    assert("Window".r.findAllIn(p).length === 1, p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2, p.take(2000))
  }

  test("range join bucket decomposition stays an equi hash join") {
    val p = plan("range_join_bands")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("dedup.lines: anti-join removal, no cartesian, bounded exchanges") {
    val p = plan("dedup_lines")
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("CartesianProduct"), "dedup.lines plans a cartesian")
    // line-frequency agg + reassembly + removal join: the collection
    // itself is never exchanged more than these
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 4, p.take(3000))
  }

  test("mongodb updateOne: the min-key probe broadcasts, never SMJ/cartesian") {
    val p = plan("mongo_update_one")
    assert(!p.contains("SortMergeJoin"), "first-match probe degenerated to SMJ:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2000)) // 1-row agg side joins via broadcast
  }

  test("mongodb updateMany/deleteMany are pure narrow rewrites (zero exchange)") {
    for (q <- Seq("mongo_update_many", "mongo_delete_many")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles a pure rewrite:\n" + p.take(2000))
    }
  }

  test("url.normalize and text.normalize stay pure projections (zero exchange)") {
    for (q <- Seq("url_normalize", "text_normalize")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles a projection:\n" + p.take(2000))
    }
  }

  test("topk.approx never shuffles the raw stream — summaries only") {
    val p = plan("topk_tokens")
    // the only hash exchange carries the per-partition sketch rows into
    // the merge agg (plus a single-row broadcast for the N bound); the
    // token stream itself lives and dies inside mapPartitions
    assert(p.contains("MapPartitions"), p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1, p.take(3000))
    assert(!p.contains("CartesianProduct"), "bound join degenerated")
  }

  test("fraction sampling is one codegen'd filter — zero exchange, zero driver state") {
    // the content-hash draw (xxhash64 over seed+salt+columns) plans as a
    // plain Filter over the scan: no shuffle for Bernoulli, no shuffle
    // for the stratified expression filter (the old sampleBy path was
    // also narrow, but its default_fraction COLLECTED the stratum
    // universe — the plan here proves no such job exists), and the
    // stratified-edges gate reads the quota from a map literal in-row
    val p = plan("sample_bernoulli")
    assert(p.contains("xxhash64"), p.take(1500))
    assert(!p.contains("Exchange"), "Bernoulli sample must not shuffle:\n" + p.take(2000))
    val ps = plan("sample_stratified_fraction_edges")
    assert(!ps.contains("Exchange"),
      "stratified fraction filter must not shuffle:\n" + ps.take(2000))
    assert(!ps.contains("rand("), "no partition-seeded RNG in the stratified draw")
    // exact-k per stratum: the ONE hash exchange is the stratum window —
    // the irreducible cost of an exact quota — and nothing else
    val pk = plan("sample_stratified_count")
    assert("Exchange hashpartitioning".r.findAllIn(pk).length <= 2, pk.take(3000))
  }

  test("bloom decontamination filters under the gram semi-join") {
    val p = plan("decontaminate_bloom")
    // the broadcast-Bloom UDF prefilter must sit below the LeftSemi join
    // (candidate slice reaches the join, not the full exploded corpus)
    val semiAt = p.indexOf("LeftSemi")
    val bloomAt = p.indexOf("Filter UDF(__gram")
    assert(semiAt >= 0, p.take(2000))
    // printed tree is top-down: a child of the join appears LATER
    assert(bloomAt > semiAt, "Bloom prefilter missing or above the semi-join:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }
}
