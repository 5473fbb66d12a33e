package graft

/** Driver-contract invariants: entry() smoke (rows > 0 — the exact check
  * the driver runs), every oracle key has a query, no duplicate query
  * names across the registries. */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq ===
      Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_price", "cnt"))
  }

  test("oracleSql keys are a subset of queries; names are unique") {
    val qs = SparkEntry.queries
    val extra = SparkEntry.oracleSql.keySet.diff(qs.keySet)
    assert(extra.isEmpty, s"oracles without queries: $extra")
    // Map construction dedupes silently — catch collisions at the source
    val names = Seq(
      graft.queries.RelationalQueries.all, graft.queries.JoinQueries.all,
      graft.queries.AdvancedJoinQueries.all, graft.queries.ExtensionQueries.all,
      graft.queries.PipelineQueries.all, graft.queries.MongoWriteQueries.all)
      .flatten.map(_.name)
    val dups = names.diff(names.distinct).distinct
    assert(dups.isEmpty, s"duplicate gate names: $dups")
    assert(names.size === qs.size)
  }
}
