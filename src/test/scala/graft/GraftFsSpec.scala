package graft

import org.apache.spark.sql.{functions => F}
import graft.config.Cfg
import graft.core.{GraftFs, GraftPlanError, StageContext}
import graft.operators.{DedupExactOp, IndexBuildOp, IndexCompactOp, IndexSnapshot,
  IndexStatsOp, KafkaConsumeSource, KafkaProduceSink}

/** The Hadoop FileSystem seam: every index / ingest / kafka-log path goes
  * through GraftFs, so cluster stores (hdfs://, s3a://) resolve the same
  * way Spark's own readers do. Local evidence: the full index lifecycle —
  * build, probe, append, stats, compact — runs against SCHEME-QUALIFIED
  * `file:` paths (the Hadoop local FS implementation, not java.nio), and
  * the object-store guard fails loud with its own message rather than a
  * connector lookup error. */
class GraftFsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("qualified / relativize / listFilesRec round-trip bare and file: paths") {
    val dir = tmp("gfs_rt")
    GraftFs.mkdirs(s"$dir/a/b")
    GraftFs.writeString(s"$dir/a/b/x.txt", "hello")
    // bare and file:-qualified spellings are the same identity
    assert(GraftFs.qualified(dir) === GraftFs.qualified(s"file:$dir"))
    assert(GraftFs.isDir(s"file:$dir/a"))
    assert(GraftFs.readString(s"file:$dir/a/b/x.txt") === "hello")
    val listed = GraftFs.listFilesRec(dir)
    assert(listed.map(_._1.endsWith("a/b/x.txt")) === Vector(true))
    assert(listed.head._2 === 5L)
    assert(GraftFs.relativize(dir, listed.head._1) === "a/b/x.txt")
    assert(GraftFs.relativize(s"file:$dir", listed.head._1) === "a/b/x.txt")
  }

  test("writeStringCommit replaces content atomically and leaves no tmp litter") {
    val dir = tmp("gfs_commit")
    GraftFs.writeStringCommit(s"$dir/m.json", "one")
    assert(GraftFs.readString(s"$dir/m.json") === "one")
    GraftFs.writeStringCommit(s"$dir/m.json", "two")
    assert(GraftFs.readString(s"$dir/m.json") === "two")
    assert(GraftFs.listNames(dir) === Vector("m.json"))
  }

  test("rename refuses an existing destination instead of nesting into it") {
    val dir = tmp("gfs_ren")
    // Hadoop's raw FileSystem.rename moves src INTO an existing dst DIR
    // (dst/<srcName>, returning true) — in the concurrent crash-swap
    // repair race that nests the losing generation inside the winner's
    // corpus and listings silently duplicate rows. GraftFs.rename must
    // report the lost race instead.
    GraftFs.mkdirs(s"$dir/src")
    GraftFs.writeString(s"$dir/src/data.txt", "v1")
    GraftFs.mkdirs(s"$dir/dst")
    GraftFs.writeString(s"$dir/dst/data.txt", "v2")
    assert(!GraftFs.rename(s"$dir/src", s"$dir/dst"))
    assert(GraftFs.readString(s"$dir/src/data.txt") === "v1", "loser's source intact")
    assert(GraftFs.readString(s"$dir/dst/data.txt") === "v2", "winner's content intact")
    assert(!GraftFs.exists(s"$dir/dst/src"), "no nested generation")
    // an existing destination FILE is refused too (POSIX rename(2) would
    // silently replace it)
    GraftFs.writeString(s"$dir/f1", "a")
    GraftFs.writeString(s"$dir/f2", "b")
    assert(!GraftFs.rename(s"$dir/f1", s"$dir/f2"))
    assert(GraftFs.readString(s"$dir/f2") === "b")
    // a normal move still succeeds
    assert(GraftFs.rename(s"$dir/src", s"$dir/moved"))
    assert(GraftFs.readString(s"$dir/moved/data.txt") === "v1")
    assert(!GraftFs.exists(s"$dir/src"))
  }

  test("createExclusive claims exactly once; the slot reopens after delete") {
    val dir = tmp("gfs_excl")
    assert(GraftFs.createExclusive(s"$dir/claim", "me"))
    assert(!GraftFs.createExclusive(s"$dir/claim", "you"), "second claim loses")
    assert(GraftFs.readString(s"$dir/claim") === "me", "loser did not clobber the winner")
    GraftFs.deleteIfExists(s"$dir/claim")
    assert(GraftFs.createExclusive(s"$dir/claim", "again"))
    assert(GraftFs.readString(s"$dir/claim") === "again")
  }

  test("claim primitives under real concurrency: one winner across simultaneous attempts") {
    // the two atomic building blocks of the lease protocol, raced for
    // real (no object monitor in the way — this is what holds across
    // PROCESSES on file:/hdfs:):
    // (1) createExclusive — N simultaneous claims, exactly one creates
    val dir = tmp("gfs_race")
    val n = 16
    val winners = new java.util.concurrent.atomic.AtomicInteger(0)
    val winnerIds = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val ts = (0 until n).map { i =>
      new Thread(() => {
        barrier.await()
        if (GraftFs.createExclusive(s"$dir/claim", s"owner=$i")) {
          winners.incrementAndGet(); winnerIds.add(i)
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(winners.get() === 1, "exactly one exclusive create wins")
    assert(GraftFs.readString(s"$dir/claim") === s"owner=${winnerIds.peek()}",
      "the file holds the winner's content, unclobbered")
    // (2) rename-aside takeover — N racers move the same stale file to
    // distinct destinations; at most one move succeeds
    GraftFs.writeString(s"$dir/stale", "old-holder")
    val moved = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier2 = new java.util.concurrent.CyclicBarrier(n)
    val ts2 = (0 until n).map { i =>
      new Thread(() => {
        barrier2.await()
        if (GraftFs.rename(s"$dir/stale", s"$dir/aside-$i")) moved.incrementAndGet()
      })
    }
    ts2.foreach(_.start()); ts2.foreach(_.join())
    assert(moved.get() === 1, "exactly one takeover move wins")
    assert(!GraftFs.exists(s"$dir/stale"))
  }

  test("writeStringCommit keeps the destination continuously present across commits") {
    // the commit installs by rename-OVER-destination (no delete-then-rename
    // window): locally that is one atomic rename(2); observable here as
    // content flipping old→new with the file present before and after
    val dir = tmp("gfs_commit2")
    val f = s"$dir/corpus.ptr"
    GraftFs.writeStringCommit(f, "corpus-000001")
    for (i <- 2 to 6) {
      GraftFs.writeStringCommit(f, f"corpus-$i%06d")
      assert(GraftFs.exists(f))
      assert(GraftFs.readString(f) === f"corpus-$i%06d")
    }
    assert(GraftFs.listNames(dir) === Vector("corpus.ptr"), "no tmp litter")
  }

  test("writeStringCommit is concurrently readable: no torn reads, no checksum desync") {
    // regression for a measured failure: ChecksumFileSystem renames a
    // committed file's data and its .crc shadow as TWO separate ops, so
    // readers racing a commit storm paired new data with the old crc and
    // the MAJORITY of reads died with ChecksumException. GraftFs string
    // files now write through the raw (checksum-free) local twin, making
    // rename(2) the only visible transition — under the same storm every
    // read must succeed and see a committed value.
    val dir = tmp("gfs_commitrace")
    val f = s"$dir/ptr"
    GraftFs.writeStringCommit(f, "gen-0")
    @volatile var stop = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val readers = (0 until 3).map { _ =>
      new Thread(() => {
        while (!stop) {
          try {
            val v = GraftFs.readString(f)
            reads.incrementAndGet()
            if (!v.startsWith("gen-")) failures.add(s"torn content: '$v'")
          } catch { case e: Exception =>
            failures.add(e.getClass.getSimpleName + ": " + e.getMessage) }
        }
      })
    }
    readers.foreach(_.start())
    try (1 to 800).foreach(i => GraftFs.writeStringCommit(f, s"gen-$i"))
    finally { stop = true; readers.foreach(_.join()) }
    assert(failures.isEmpty, s"${failures.size} failed reads, first: ${failures.peek()}")
    assert(reads.get() > 0)
    assert(GraftFs.readString(f) === "gen-800")
  }

  test("renameIsAtomic: file/hdfs yes, s3a/gs no; guard message names the scheme") {
    assert(GraftFs.renameIsAtomic("/tmp/idx"))
    assert(GraftFs.renameIsAtomic("file:/tmp/idx"))
    assert(GraftFs.renameIsAtomic("hdfs://nn:8020/idx"))
    assert(!GraftFs.renameIsAtomic("s3a://bucket/idx"))
    assert(!GraftFs.renameIsAtomic("gs://bucket/idx"))
    val e = intercept[GraftPlanError] {
      GraftFs.requireAtomicRename("s3a://bucket/idx", "index.compact")
    }
    assert(e.getMessage.contains("s3a"))
    assert(e.getMessage.contains("atomic"))
  }

  test("index lifecycle end-to-end on scheme-qualified file: paths") {
    val idx = s"file:${tmp("gfs_idx")}/exact"
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    IndexBuildOp(StageContext.one(spark, docs, Cfg.of(
      "type" -> "exact", "path" -> idx, "columns" -> Seq("text"))))
    // probe: batch with one known duplicate, appending the survivor
    val batch = Seq((10L, "alpha"), (11L, "delta")).toDF("doc_id", "text")
    val survivors = DedupExactOp(StageContext.one(spark, batch, Cfg.of(
      "columns" -> Seq("text"), "index_path" -> idx, "index_append" -> true)))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors === Seq(11L))
    // the appended key is visible to the next probe
    val batch2 = Seq((20L, "delta"), (21L, "epsilon")).toDF("doc_id", "text")
    val survivors2 = DedupExactOp(StageContext.one(spark, batch2, Cfg.of(
      "columns" -> Seq("text"), "index_path" -> idx)))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors2 === Seq(21L))
    // stats + compact run through the same qualified root
    val statsBefore = IndexStatsOp(StageContext.one(spark, docs, Cfg.of("path" -> idx)))
      .select("rows", "files").as[(Long, Long)].head()
    assert(statsBefore._1 === 4L) // 3 built + 1 appended key
    IndexCompactOp(StageContext.one(spark, docs, Cfg.of("path" -> idx)))
    val statsAfter = IndexStatsOp(StageContext.one(spark, docs, Cfg.of("path" -> idx)))
      .select("rows", "files", "appends_since_compact").as[(Long, Long, Long)].head()
    assert(statsAfter._1 === 4L)
    assert(statsAfter._2 === 1L, "compacted to one file")
    assert(statsAfter._3 === 0L, "fresh compact.gen covers the whole generation")
    // probe result identical after compact
    val survivors3 = DedupExactOp(StageContext.one(spark, batch2, Cfg.of(
      "columns" -> Seq("text"), "index_path" -> idx)))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors3 === Seq(21L))
  }

  test("stream.ingest runs end-to-end on scheme-qualified file: paths (index, output, checkpoint, lease)") {
    import org.apache.spark.sql.{functions => F}
    val base = tmp("gfs_stream")
    val idx = s"file:$base/idx"
    val out = s"file:$base/out"
    val incoming = s"$base/in" // local staging for the file source
    val seed = Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(-0.5f)))
      .toDF("vec_id", "embedding")
    graft.operators.IndexBuildOp(StageContext.one(spark, seed, Cfg.of(
      "type" -> "lsh", "blocking" -> "bands", "path" -> idx,
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "bands" -> 4, "band_planes" -> 4, "seed" -> 11, "partition_dirs" -> 2)))
    // batch: one dup of the seed corpus, one novel vector
    Seq((10L, Array.fill(8)(0.5f)), (11L, Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(incoming)
    val stream = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .parquet(incoming)
    graft.streaming.StreamIngestSink(StageContext.one(spark, stream, Cfg.of(
      "path" -> out, "index_path" -> idx, "dedup" -> "embedding",
      "trigger" -> "available_now", "id_column" -> "vec_id",
      "vector_column" -> "embedding", "threshold" -> 0.95)))
    val got = spark.read.parquet(out).select("vec_id").as[Long].collect().toSeq
    assert(got === Seq(11L), "dup dropped against the qualified index, novel survived")
    // lease lived under the qualified index root and was released
    assert(!GraftFs.exists(s"$idx/ingest.lease"))
    // the index grew through the qualified path — a second batch with a
    // copy of the survivor drops it
    val batch2 = Seq((20L, Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)))
      .toDF("vec_id", "embedding")
    val later = graft.operators.DedupEmbeddingOp(StageContext.one(spark, batch2, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "threshold" -> 0.95, "index_path" -> idx)))
    assert(later.count() === 0)
  }

  test("excel.write and json.read format=dataframe accept scheme-qualified paths (seam stragglers)") {
    import graft.operators.{ExcelReadSource, ExcelWriteSink}
    import graft.sources.JsonSource
    val dir = tmp("gfs_straggler")
    // excel.write streams its zip container through GraftFs.createStream
    val xlsx = s"file:$dir/report.xlsx"
    val df = Seq(("a", 1L), ("b", 2L)).toDF("name", "v")
    ExcelWriteSink(StageContext.one(spark, df, Cfg.of("path" -> xlsx)))
    val back = ExcelReadSource(StageContext(spark, Seq.empty,
      Cfg.of("path" -> s"$dir/report.xlsx"), "x"))
    assert(back.count() === 2L)
    assert(back.columns.toSeq === Seq("name", "v"))
    // json.read format=dataframe reads its driver-side config file through
    // GraftFs.readString
    GraftFs.writeString(s"$dir/cols.json", """{"a": [1, 2, 3], "b": ["x", "y", "z"]}""")
    val jdf = JsonSource(StageContext(spark, Seq.empty,
      Cfg.of("path" -> s"file:$dir/cols.json", "format" -> "dataframe"), "j"))
    assert(jdf.count() === 3L)
    assert(jdf.select("b").as[String].collect().sorted.toSeq === Seq("x", "y", "z"))
  }

  test("kafka produce/consume round-trips on a scheme-qualified file: log root") {
    val root = s"file:${tmp("gfs_kafka")}/log"
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("name", "v")
    KafkaProduceSink(StageContext.one(spark, df, Cfg.of(
      "path" -> root, "topic" -> "t", "key_field" -> "name")))
    val got = KafkaConsumeSource(StageContext(spark, Seq.empty, Cfg.of(
      "path" -> root, "topic" -> "t", "group_id" -> "g", "max_messages" -> 0L), "k"))
    assert(got.count() === 3L)
    assert(got.select("name").as[String].collect().sorted.toSeq === Seq("a", "b", "c"))
  }
}
