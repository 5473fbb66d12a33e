package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.config.Cfg
import graft.core.StageContext
import graft.streaming.{StatefulAggOp, StreamDedupOp}

/** dedup.stream / aggregate.stateful — cross-batch state semantics. */
class StatefulSpec extends SparkSpec {

  test("dedup.stream drops duplicates across micro-batches within the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "id", "payload")
    val deduped = StreamDedupOp(StageContext.one(spark, df, Cfg.of(
      "columns" -> Seq("id"), "watermark_column" -> "ts", "delay" -> "10 minutes")))
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("sdedup_out").start()
    try {
      def t(m: String) = java.sql.Timestamp.valueOf(s"2026-01-01 10:$m:00")
      mem.addData((t("00"), 1L, "a"), (t("01"), 2L, "b"), (t("01"), 1L, "a-dup"))
      q.processAllAvailable()
      mem.addData((t("02"), 2L, "b-dup"), (t("03"), 3L, "c"))   // 2 seen in batch 1
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM sdedup_out ORDER BY id").collect().map(_.getLong(0)).toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dedup.stream on a batch frame = plain dropDuplicates") {
    import spark.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("id", "v")
    val out = StreamDedupOp(StageContext.one(spark, df, Cfg.of("columns" -> Seq("id"))))
    assert(out.count() === 2L)
  }

  test("aggregate.stateful keeps running per-key totals across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Double)]
    val df = mem.toDF().toDF("k", "v")
    val agg = StatefulAggOp(StageContext.one(spark, df, Cfg.of(
      "key_column" -> "k", "value_column" -> "v",
      "operation" -> "sum", "output_column" -> "total")))
    val q = agg.writeStream.outputMode("update").format("memory")
      .queryName("sstate_out").start()
    try {
      mem.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
      q.processAllAvailable()
      mem.addData(("a", 4.0))   // second batch folds into existing state
      q.processAllAvailable()
      // update-mode memory sink appends every emission; running totals are
      // monotonic for positive v, so max = the current state per key
      val last = spark.sql("SELECT k, max(total) FROM sstate_out GROUP BY k ORDER BY k")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(last === Seq(("a", 7.0), ("b", 10.0)))
    } finally q.stop()
  }

  test("aggregate.stateful batch parity: count/avg/min/max") {
    import spark.implicits._
    val df = Seq(("a", 2.0), ("a", 6.0), ("b", 5.0)).toDF("k", "v")
    def run(op: String) =
      StatefulAggOp(StageContext.one(spark, df, Cfg.of(
        "key_column" -> "k", "value_column" -> "v", "operation" -> op)))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(run("count") === Map("a" -> 2.0, "b" -> 1.0))
    assert(run("avg") === Map("a" -> 4.0, "b" -> 5.0))
    assert(run("min") === Map("a" -> 2.0, "b" -> 5.0))
    assert(run("max") === Map("a" -> 6.0, "b" -> 5.0))
  }

  test("aggregate.stateful engine=tws matches mgws on every op (batch)") {
    import spark.implicits._
    val df = Seq(("a", 2.0), ("a", 6.0), ("b", 5.0), ("c", -1.0)).toDF("k", "v")
    for (op <- Seq("count", "sum", "avg", "min", "max")) {
      def run(engine: String) =
        StatefulAggOp(StageContext.one(spark, df, Cfg.of(
          "key_column" -> "k", "value_column" -> "v", "operation" -> op,
          "engine" -> engine)))
          .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(run("tws") === run("mgws"), s"op=$op")
    }
  }

  test("window.apply streams per-key tumbling windows across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, Long)]
      val df = mem.toDF().toDF("user", "n")
      val win = graft.streaming.CountWindowOp(StageContext.one(spark, df, Cfg.of(
        "type" -> "tumbling", "size" -> 2, "group_by" -> Seq("user"))))
      val q = win.writeStream.outputMode("append").format("memory")
        .queryName("cw_out").start()
      try {
        mem.addData(("a", 1L), ("a", 2L), ("b", 1L))
        q.processAllAvailable()
        mem.addData(("a", 3L), ("b", 2L), ("b", 3L))  // counts continue per key
        q.processAllAvailable()
        val got = spark.sql("SELECT user, n, window_id FROM cw_out ORDER BY user, n")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got === Seq(
          ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L),   // a's 3rd record opens window 1
          ("b", 1L, 0L), ("b", 2L, 0L), ("b", 3L, 1L)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("window.apply batch group_by matches per-key window arithmetic; keyless streaming runs one implicit key") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L)).toDF("user", "seq")
    val win = graft.streaming.CountWindowOp(StageContext.one(spark, df, Cfg.of(
      "type" -> "tumbling", "size" -> 2, "group_by" -> Seq("user"), "order_by" -> Seq("seq"))))
    val got = win.collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("window_id"))).sorted
    assert(got.toSeq === Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L), ("b", 10L, 0L)))

    // per-key session in batch
    val sess = graft.streaming.CountWindowOp(StageContext.one(spark, df, Cfg.of(
      "type" -> "session", "gap" -> 0.5, "group_by" -> Seq("user"),
      "order_by" -> Seq("seq"), "gap_column" -> "seq")))
    val sids = sess.collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("window_id"))).sorted
    assert(sids.toSeq === Seq(("a", 1L, 0L), ("a", 2L, 1L), ("a", 3L, 2L), ("b", 10L, 0L)))

    // keyless streaming: one implicit key, per-batch order_by sort, count
    // continues across micro-batches (tws needs the RocksDB state store)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val sdf = mem.toDF().toDF("user", "n")
    val kw = graft.streaming.CountWindowOp(StageContext.one(spark, sdf, Cfg.of(
      "type" -> "tumbling", "size" -> 2, "order_by" -> Seq("n"))))
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = kw.writeStream.outputMode("append").format("memory")
        .queryName("cw_keyless").start()
      try {
        mem.addData(("c", 3L), ("a", 1L), ("b", 2L)) // batch sorts by n
        q.processAllAvailable()
        mem.addData(("d", 4L))                       // 4th record → window 1
        q.processAllAvailable()
        val got = spark.sql("SELECT n, window_id FROM cw_keyless ORDER BY n")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got === Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("aggregate.stateful engine=tws streams with the RocksDB state store") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, Double)]
      val df = mem.toDF().toDF("k", "v")
      val agg = StatefulAggOp(StageContext.one(spark, df, Cfg.of(
        "key_column" -> "k", "value_column" -> "v", "operation" -> "sum",
        "output_column" -> "total", "engine" -> "tws")))
      val q = agg.writeStream.outputMode("update").format("memory")
        .queryName("tws_out").start()
      try {
        mem.addData(("a", 1.0), ("b", 10.0))
        q.processAllAvailable()
        mem.addData(("a", 4.0))
        q.processAllAvailable()
        val last = spark.sql("SELECT k, max(total) FROM tws_out GROUP BY k ORDER BY k")
          .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
        assert(last === Seq(("a", 5.0), ("b", 10.0)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
