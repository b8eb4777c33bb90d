package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.apache.spark.sql.types._
import graft.sources.{FlightsV2BatchWrite, FlightsV2TaskCommit}
import scala.jdk.CollectionConverters._

/** Manifest-lock protocol under contention: concurrent committers
  * never drop each other's published files, an orphaned lock (dead
  * committer) is stolen by exactly one successor, and a committer that
  * stalls past the steal horizon FAILS its commit instead of
  * clobbering the stealer's manifest.
  */
class FlightsV2LockRaceSpec extends SparkSpecBase {

  private val schema = StructType(Seq(StructField("icao24", StringType)))

  private def tmpDir() =
    Files.createTempDirectory("graft-flights-race").toString

  private def manifestEntries(dir: String): Seq[String] =
    Files.readAllLines(Paths.get(dir).resolve("_manifest")).asScala.toSeq
      .filter(_.nonEmpty).map(_.split("\t")(0))

  private def residue(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("_manifest.") && n != "_manifest")
      .toSeq

  test("concurrent appenders each publish all their files — none dropped") {
    val dir = tmpDir()
    val committers = 8
    val filesEach = 3
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until committers).map { c =>
      new Thread(() => {
        try {
          val bw = new FlightsV2BatchWrite(dir, schema, replace = false)
          val msgs = (0 until filesEach).map { f =>
            FlightsV2TaskCommit(s"part-$c-$f.jsonl", 1L)
          }.toArray[org.apache.spark.sql.connector.write.WriterCommitMessage]
          bw.commit(msgs)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(errs.isEmpty, s"commit failed under contention: ${errs.asScala}")
    val entries = manifestEntries(dir)
    assert(entries.size == committers * filesEach &&
      entries.distinct.size == entries.size,
      s"manifest dropped or duplicated files: $entries")
    assert(residue(dir).isEmpty,
      s"lock/tmp residue left behind: ${residue(dir)}")
  }

  test("an orphaned lock is stolen and committers proceed — " +
      "exactly one manifest, no residue") {
    val dir = tmpDir()
    Files.createDirectories(Paths.get(dir))
    // a dead committer's lock: bogus owner token, mtime past the horizon
    val lock = Paths.get(dir).resolve("_manifest.lock")
    Files.write(lock, "deadbeef".getBytes("UTF-8"))
    Files.setLastModifiedTime(lock,
      FileTime.fromMillis(System.currentTimeMillis() - 60000L))

    val committers = 6
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until committers).map { c =>
      new Thread(() => {
        try {
          new FlightsV2BatchWrite(dir, schema, replace = false)
            .commit(Array(FlightsV2TaskCommit(s"part-$c-0.jsonl", 1L)))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(errs.isEmpty, s"steal path broke a commit: ${errs.asScala}")
    val entries = manifestEntries(dir)
    assert(entries.size == committers && entries.distinct.size == committers,
      s"files dropped after steal: $entries")
    assert(residue(dir).isEmpty,
      s"steal left lock/tombstone residue: ${residue(dir)}")
  }

  test("a stealer that raced a faster stealer RESTORES the fresh lock " +
      "it grabbed — the winner keeps mutual exclusion, the loser retries") {
    val dir = tmpDir()
    Files.createDirectories(Paths.get(dir))
    val lock = Paths.get(dir).resolve("_manifest.lock")
    // a dead committer's stale lock
    Files.write(lock, "deadbeef".getBytes("UTF-8"))
    Files.setLastModifiedTime(lock,
      FileTime.fromMillis(System.currentTimeMillis() - 60000L))

    // Committer B passes the age check on the stale lock; in the window
    // before its tombstone move, a faster stealer wins the steal and
    // CREATE_NEWs its own fresh lock ("victor"). B's ATOMIC_MOVE then
    // grabs that LIVE lock — the interleaving where a delete instead of
    // a restore would unlock victor's critical section for a third
    // party and spuriously fail victor's ownership re-check.
    val swapped = new java.util.concurrent.atomic.AtomicBoolean(false)
    class RacedStealer extends FlightsV2BatchWrite(
        dir, schema, replace = false) {
      override protected def beforeSteal(): Unit =
        if (swapped.compareAndSet(false, true)) {
          Files.delete(lock)
          Files.write(lock, "victor".getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
        }
    }
    @volatile var bFailure: Throwable = null
    val b = new Thread(() => {
      try new RacedStealer()
        .commit(Array(FlightsV2TaskCommit("part-b-0.jsonl", 1L)))
      catch { case t: Throwable => bFailure = t }
    })
    b.start()
    // B must RESTORE victor's lock with its token intact, not delete it
    val deadline = System.currentTimeMillis() + 10000
    var restored = false
    while (!restored && System.currentTimeMillis() < deadline) {
      restored = swapped.get && Files.exists(lock) &&
        (try new String(Files.readAllBytes(lock), "UTF-8") == "victor"
         catch { case _: java.io.IOException => false })
      if (!restored) Thread.sleep(20)
    }
    assert(restored,
      "raced stealer deleted (or never restored) the live lock it grabbed")
    // victor finishes and releases; B then acquires and commits normally
    Files.delete(lock)
    b.join(60000)
    assert(bFailure == null, s"raced stealer must retry, not fail: $bFailure")
    assert(manifestEntries(dir) == Seq("part-b-0.jsonl"),
      s"manifest after raced steal: ${manifestEntries(dir)}")
    assert(residue(dir).isEmpty,
      s"residue after raced steal: ${residue(dir)}")
  }

  test("a FRESHLY orphaned lock is stolen within one commit attempt: " +
      "the acquire budget outlasts the steal horizon") {
    // A lock bearing a dead owner's token with a current mtime (the
    // raced-steal restore path can produce exactly this) only ages
    // past the horizon after `steal.ms`. With a horizon LONGER than
    // the old fixed 10 s retry budget, the old loop exhausted its
    // retries and failed; the budget must instead outlast the horizon
    // so the orphan is stolen inside this same commit attempt.
    val dir = tmpDir()
    Files.createDirectories(Paths.get(dir))
    val prev = sys.props.get("graft.flights.lock.steal.ms")
    sys.props("graft.flights.lock.steal.ms") = "11000"
    try {
      val lock = Paths.get(dir).resolve("_manifest.lock")
      Files.write(lock, "deadbeef".getBytes("UTF-8")) // fresh mtime
      new FlightsV2BatchWrite(dir, schema, replace = false)
        .commit(Array(FlightsV2TaskCommit("part-o-0.jsonl", 1L)))
      assert(manifestEntries(dir) == Seq("part-o-0.jsonl"),
        s"manifest after orphan steal: ${manifestEntries(dir)}")
      assert(residue(dir).isEmpty,
        s"residue after orphan steal: ${residue(dir)}")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.flights.lock.steal.ms") = v
        case None => sys.props -= "graft.flights.lock.steal.ms"
      }
    }
  }

  test("a committer stalled past the steal horizon fails its commit " +
      "instead of dropping the stealer's files") {
    val dir = tmpDir()
    val prev = sys.props.get("graft.flights.lock.steal.ms")
    sys.props("graft.flights.lock.steal.ms") = "200"
    try {
      val reached = new CountDownLatch(1)
      val resume = new CountDownLatch(1)
      // committer A: acquires the lock, stages its manifest, then
      // stalls inside the critical section (a GC pause / FS stall)
      class StallingWrite extends FlightsV2BatchWrite(
          dir, schema, replace = false) {
        override protected def beforePublish(): Unit = {
          reached.countDown()
          resume.await(30, TimeUnit.SECONDS)
        }
      }
      @volatile var aFailure: Throwable = null
      val a = new Thread(() => {
        try new StallingWrite()
          .commit(Array(FlightsV2TaskCommit("part-a-0.jsonl", 1L)))
        catch { case t: Throwable => aFailure = t }
      })
      a.start()
      assert(reached.await(30, TimeUnit.SECONDS), "A never entered commit")

      // committer B arrives, waits out the 200 ms horizon, steals the
      // orphan-looking lock, and publishes
      new FlightsV2BatchWrite(dir, schema, replace = false)
        .commit(Array(FlightsV2TaskCommit("part-b-0.jsonl", 1L)))

      // A resumes: its ownership re-check must fail the commit
      resume.countDown()
      a.join(60000)
      assert(aFailure != null &&
        aFailure.isInstanceOf[java.util.ConcurrentModificationException],
        s"stalled committer must fail, got: $aFailure")

      // B's published file survives; A's was never published
      val entries = manifestEntries(dir)
      assert(entries == Seq("part-b-0.jsonl"),
        s"stealer's manifest was clobbered: $entries")
      assert(residue(dir).isEmpty,
        s"residue after stolen commit: ${residue(dir)}")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.flights.lock.steal.ms") = v
        case None => sys.props -= "graft.flights.lock.steal.ms"
      }
    }
  }
}
