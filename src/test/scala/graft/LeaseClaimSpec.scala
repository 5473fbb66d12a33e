package graft

import graft.core.{GraftFs, GraftPlanError}
import graft.streaming.IngestLease

/** Failure injection for [[LeaseClaimSpec]]'s release-failure test: a
  * RawLocalFileSystem whose `open` of a lease file throws while the flag
  * is up. `open` (not `delete`) is the injected fault because releaseAt's
  * read-back runs BEFORE its beat-cancel — the path the r10 verdict
  * flagged as untested is the catch block that must still cancel the
  * holder's own heartbeat when the release's FS work dies. */
object FlakyLeaseReads {
  @volatile var enabled = false
}

class MockFlakyFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.Path
  override def getScheme: String = "mockflaky"
  override def getUri: java.net.URI = java.net.URI.create("mockflaky:///")
  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    if (FlakyLeaseReads.enabled && f.getName.endsWith(".lease"))
      throw new java.io.IOException(s"injected transient read failure for $f")
    super.open(f, bufferSize)
  }
}

/** The r10 verdict's task 1: the three lease-lifecycle behaviors that
  * shipped untested — the object-store conditional-put claim emulation
  * (GraftFs.createExclusive's settle window), the batch-writer-deposed
  * failure, and the release-failure heartbeat cancel — plus pins for the
  * r11 identity hardening (boot nonce, machine-scoped liveness proof). */
class LeaseClaimSpec extends SparkSpec {

  private def registerScheme(scheme: String, impl: Class[_]): Unit = {
    spark.sparkContext.hadoopConfiguration.set(s"fs.$scheme.impl", impl.getName)
    GraftFs.hadoopConf.set(s"fs.$scheme.impl", impl.getName)
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Same derivation as IngestLease.hostId (private there): hostname plus
    * a machine-id fragment — the spec needs it to forge same-machine and
    * collided-hostname owners. */
  private def localHostId: String = {
    val host = java.net.InetAddress.getLocalHost.getHostName
    val p = java.nio.file.Paths.get("/etc/machine-id")
    val mid =
      if (java.nio.file.Files.isReadable(p))
        new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8).trim.take(8)
      else "nomid"
    s"$host+$mid"
  }

  private def deadPid: Long =
    (900000L to 990000L).find(p => {
      val h = ProcessHandle.of(p)
      !h.isPresent || !h.get().isAlive
    }).get

  test("object-store claim race: at most one STABLE winner per settle window") {
    registerScheme("mocks3", classOf[MockS3FileSystem])
    val root = tmp("mocks3_claimrace")
    val prev = GraftFs.claimSettleMs
    GraftFs.claimSettleMs = 100L
    try {
      var totalWins = 0
      for (round <- 0 until 12) {
        val path = s"mocks3:$root/claim-$round.lease"
        val n = 16
        val gate = new java.util.concurrent.CountDownLatch(1)
        val won = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val threads = (0 until n).map { t =>
          val th = new Thread(() => {
            gate.await()
            try { if (GraftFs.createExclusive(path, s"claimant-$t")) won.add(t) }
            catch { case e: Exception => errors.add(e.toString) }
          }, s"claim-race-$round-$t")
          th.start(); th
        }
        gate.countDown()
        threads.foreach(_.join(30000))
        assert(errors.isEmpty, s"round $round: claim threads died: $errors")
        import scala.jdk.CollectionConverters._
        val winners = won.asScala.toSeq
        assert(winners.size <= 1,
          s"round $round: TWO stable claims past one settle window: $winners")
        winners.foreach { w =>
          assert(GraftFs.readString(path) === s"claimant-$w",
            s"round $round: stable winner $w does not own the final body")
          totalWins += 1
        }
      }
      // all-lose rounds are legal (torn interleavings demote everyone) but
      // a harness where NOBODY ever wins proves nothing
      assert(totalWins >= 1, "no round produced a stable winner — harness broken")
    } finally GraftFs.claimSettleMs = prev
  }

  test("a claim overwritten inside the settle window is demoted") {
    registerScheme("mocks3", classOf[MockS3FileSystem])
    val path = s"mocks3:${tmp("mocks3_demote")}/claim.lease"
    val prev = GraftFs.claimSettleMs
    GraftFs.claimSettleMs = 400L
    try {
      import scala.concurrent.ExecutionContext.Implicits.global
      val claim = scala.concurrent.Future(GraftFs.createExclusive(path, "original"))
      // wait for the claimant's FULL body, not mere existence: racing the
      // PUT mid-flight tears the mock store's bytes ("racer" over a
      // half-landed "original" read back as "racernal" once under a loaded
      // suite) and that interleaving is not what this test exercises — the
      // demotion contract starts from a LANDED claim overwritten inside
      // the settle window
      val deadline = System.currentTimeMillis() + 5000
      def landed(): Boolean = GraftFs.isFile(path) &&
        (try GraftFs.readString(path) == "original"
         catch { case scala.util.control.NonFatal(_) => false })
      while (!landed() && System.currentTimeMillis() < deadline)
        Thread.sleep(5)
      assert(landed(), "claimant never PUT its full body")
      // the racing PUT lands inside the 400ms settle window
      GraftFs.writeString(path, "racer")
      val stable = scala.concurrent.Await.result(
        claim, scala.concurrent.duration.Duration(30, "s"))
      assert(!stable, "a claim overwritten inside the settle window must demote")
      assert(GraftFs.readString(path) === "racer")
    } finally GraftFs.claimSettleMs = prev
  }

  test("batch writer deposed mid-write fails the call instead of returning success") {
    val dir = tmp("lease_deposed")
    val lf = s"$dir/${IngestLease.IndexLeaseName}"
    val foreign = "checkpoint=foreign-ck\nquery=spec\nowner=elsewhere+nomid/1/deadbeef"
    val e = intercept[GraftPlanError] {
      IngestLease.withBatchLease(dir, "spec.batch", staleMs = 300L) {
        // simulate a legitimate reclaim: a foreign body keeps landing on
        // the lease until the beat's court observes it and deposes us
        val deadline = System.currentTimeMillis() + 10000
        while (IngestLease.beating(dir) && System.currentTimeMillis() < deadline) {
          GraftFs.writeString(lf, foreign)
          Thread.sleep(10)
        }
        assert(!IngestLease.beating(dir), "court never deposed the batch writer")
        "completed-anyway"
      }
    }
    assert(e.getMessage.contains("reclaimed mid-write"))
    assert(e.getMessage.contains("VERIFY"), "message must tell the caller to verify before retrying")
    // the new holder's lease survives the deposed writer's release
    assert(GraftFs.readString(lf).contains("checkpoint=foreign-ck"))
  }

  test("a release whose FS read dies still cancels the holder's beat; the lease ages out") {
    registerScheme("mockflaky", classOf[MockFlakyFileSystem])
    val dir = s"mockflaky:${tmp("lease_flaky")}"
    val lf = s"$dir/${IngestLease.IndexLeaseName}"
    val prev = GraftFs.claimSettleMs
    GraftFs.claimSettleMs = 10L
    try {
      IngestLease.acquire(dir, "ck-one", "q1", staleMs = 500L, "spec")
      assert(IngestLease.beating(dir))
      FlakyLeaseReads.enabled = true
      try IngestLease.release(dir, "ck-one") finally FlakyLeaseReads.enabled = false
      // the delete never ran (read-back died first) but OUR beat must be
      // cancelled — an un-cancelled beat would refresh the orphan forever
      assert(!IngestLease.beating(dir),
        "failed release left the holder's heartbeat running")
      assert(GraftFs.isFile(lf), "injected failure should have prevented the delete")
      // with the beat dead the orphan ages out: a foreign claimant waits
      // out staleMs and reclaims
      Thread.sleep(700)
      IngestLease.acquire(dir, "ck-two", "q2", staleMs = 500L, "spec")
      assert(IngestLease.beating(dir))
      assert(GraftFs.readString(lf).contains("checkpoint=ck-two"))
      IngestLease.release(dir, "ck-two")
      assert(!GraftFs.isFile(lf))
    } finally GraftFs.claimSettleMs = prev
  }

  test("liveness shortcut: dead same-machine pid reclaims instantly; collided hostname or wrong nonce waits") {
    val dir = tmp("lease_identity")
    val lf = s"$dir/${IngestLease.IndexLeaseName}"
    // (1) crash restart: same checkpoint, owner provably dead on THIS
    // machine (hostId matches, pid gone) → no-wait reclaim despite a
    // fresh mtime and a huge staleMs
    GraftFs.writeString(lf, s"checkpoint=ck\nquery=q\nowner=$localHostId/$deadPid/feedface")
    val t0 = System.currentTimeMillis()
    IngestLease.acquire(dir, "ck", "q", staleMs = 600000L, "spec")
    assert(System.currentTimeMillis() - t0 < 10000)
    IngestLease.release(dir, "ck")
    // (2) hostname collision: same hostname but a DIFFERENT machine id —
    // the pid being locally absent must NOT prove the remote holder dead
    val host = java.net.InetAddress.getLocalHost.getHostName
    GraftFs.writeString(lf, s"checkpoint=ck\nquery=q\nowner=$host+zzzzzzzz/$deadPid/feedface")
    val e1 = intercept[GraftPlanError](
      IngestLease.acquire(dir, "ck", "q", staleMs = 600000L, "spec"))
    assert(e1.getMessage.contains("held by another live writer"))
    // (3) pid reuse: our own live pid under a different boot nonce is a
    // DIFFERENT JVM — identity equality must not fire
    GraftFs.writeString(lf, s"checkpoint=ck\nquery=q\nowner=$localHostId/${ProcessHandle.current().pid()}/00000000")
    val e2 = intercept[GraftPlanError](
      IngestLease.acquire(dir, "ck", "q", staleMs = 600000L, "spec"))
    assert(e2.getMessage.contains("held by another live writer"))
    GraftFs.deleteIfExists(lf)
  }

  test("unsynchronized acquire: N threads racing a cold start — exactly one wins, losers refused loud") {
    // acquire no longer serializes same-JVM claimants on the IngestLease
    // monitor (the settle sleep would stall every heartbeat) — so the FS
    // claim primitives are the only mutual exclusion. Race real acquire
    // calls: exactly one must hold the lease, every loser must throw the
    // live-writer refusal (or the non-convergence error), and the beat
    // must front the winner's identity.
    val dir = tmp("lease_acquire_race")
    val n = 8
    val gate = new java.util.concurrent.CountDownLatch(1)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val threads = (0 until n).map { t =>
      val th = new Thread(() => {
        gate.await()
        try {
          IngestLease.acquire(dir, s"ck-race-$t", s"q$t", staleMs = 600000L, "spec")
          outcomes.add((t, "won"))
        } catch {
          case e: GraftPlanError => outcomes.add((t,
            if (e.getMessage.contains("held by another live writer")) "refused"
            else if (e.getMessage.contains("did not converge")) "contended"
            else s"unexpected: ${e.getMessage}"))
        }
      }, s"acquire-race-$t")
      th.start(); th
    }
    gate.countDown()
    threads.foreach(_.join(30000))
    import scala.jdk.CollectionConverters._
    val byOutcome = outcomes.asScala.toVector.groupBy(_._2)
    assert(byOutcome.getOrElse("won", Vector.empty).size === 1,
      s"exactly one claimant must win: $byOutcome")
    assert(outcomes.size() === n, s"a racer died silently: $byOutcome")
    assert((byOutcome.keySet - "won" - "refused" - "contended").isEmpty,
      s"unexpected outcomes: $byOutcome")
    val winner = byOutcome("won").head._1
    val body = GraftFs.readString(s"$dir/${IngestLease.IndexLeaseName}")
    assert(body.contains(s"checkpoint=ck-race-$winner"),
      "the lease must name the winning claimant")
    assert(IngestLease.beating(dir), "the winner's heartbeat must be live")
    IngestLease.release(dir, s"ck-race-$winner")
    assert(!IngestLease.beating(dir))
  }
}
