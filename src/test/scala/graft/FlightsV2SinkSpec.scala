package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.{FlightsV2BatchWrite, FlightsV2TaskCommit, FlightsV2Writer}
import scala.jdk.CollectionConverters._

/** DSv2 write path: manifest-commit protocol — only driver-committed
  * task files become visible; orphans and aborts never do.
  */
class FlightsV2SinkSpec extends SparkSpecBase {

  private def tmpDir() =
    Files.createTempDirectory("graft-flights").toString

  private def manifestFiles(dir: String): Seq[(String, Long)] =
    Files.readAllLines(Paths.get(dir).resolve("_manifest")).asScala.toSeq
      .filter(_.nonEmpty)
      .map { l => val Array(f, n) = l.split("\t"); (f, n.toLong) }

  private def manifestRows(dir: String): Seq[String] =
    manifestFiles(dir).flatMap { case (f, _) =>
      Files.readAllLines(Paths.get(dir).resolve(f)).asScala
    }

  test("batch write commits a manifest naming exactly the task files") {
    import SparkTestSession.spark.implicits._
    val dir = tmpDir()
    val df = Seq(
      ("ab0001", 12L, Some(3.5)),
      ("cd0002", 7L, None),
      ("ef0003", 99L, Some(-1.25)))
      .toDF("icao24", "duration", "score").repartition(2)
    df.write.format("graft-flights").option("path", dir)
      .mode("append").save()

    val files = manifestFiles(dir)
    assert(files.map(_._2).sum == 3L)
    val rows = manifestRows(dir)
    assert(rows.size == 3)
    assert(rows.exists(r => r.contains("\"icao24\":\"cd0002\"") &&
      r.contains("\"score\":null")))
    assert(rows.exists(_.contains("\"score\":-1.25")))
    // every manifest-listed file exists; no extra data files claimed
    files.foreach { case (f, _) =>
      assert(Files.exists(Paths.get(dir).resolve(f)))
    }
  }

  test("an uncommitted (orphan) task attempt never becomes visible") {
    import SparkTestSession.spark.implicits._
    val dir = tmpDir()
    val schema = StructType(Seq(StructField("icao24", StringType)))
    // simulate a zombie attempt: writes a file, never task-commits
    val zombie = new FlightsV2Writer(dir, schema, partitionId = 0,
      taskId = 999999L, jobToken = "test0000")
    zombie.write(InternalRow(UTF8String.fromString("zz9999")))
    // (no commit — the attempt dies here, leaving the orphan file)

    Seq("ab0001", "cd0002").toDF("icao24")
      .write.format("graft-flights").option("path", dir)
      .mode("append").save()

    val rows = manifestRows(dir)
    assert(rows.size == 2 && !rows.exists(_.contains("zz9999")),
      s"orphan attempt leaked into visible data: $rows")
  }

  test("task abort removes its temp file") {
    val dir = tmpDir()
    val schema = StructType(Seq(StructField("icao24", StringType)))
    val w = new FlightsV2Writer(dir, schema, partitionId = 3, taskId = 7L, jobToken = "test0000")
    w.write(InternalRow(UTF8String.fromString("ab0001")))
    w.abort()
    assert(Files.list(Paths.get(dir)).iterator().asScala.isEmpty,
      "aborted task left files behind")
  }

  test("job abort deletes committed task files; manifest never appears") {
    val dir = tmpDir()
    val schema = StructType(Seq(StructField("icao24", StringType)))
    val w = new FlightsV2Writer(dir, schema, partitionId = 0, taskId = 1L, jobToken = "test0000")
    w.write(InternalRow(UTF8String.fromString("ab0001")))
    val msg = w.commit()
    new FlightsV2BatchWrite(dir, schema).abort(Array(msg))
    assert(!Files.exists(Paths.get(dir).resolve(
      msg.asInstanceOf[FlightsV2TaskCommit].file)))
    assert(!Files.exists(Paths.get(dir).resolve("_manifest")))
  }

  test("append merges with the previously committed manifest") {
    import SparkTestSession.spark.implicits._
    val dir = tmpDir()
    Seq("a", "b", "c").toDF("icao24")
      .write.format("graft-flights").option("path", dir)
      .mode("append").save()
    Seq("d", "e").toDF("icao24")
      .write.format("graft-flights").option("path", dir)
      .mode("append").save()
    val rows = manifestRows(dir)
    assert(rows.size == 5,
      s"append must accumulate, not replace: $rows")
    assert(manifestFiles(dir).map(_._2).sum == 5L)
  }

  test("two applications appending with the same task ids cannot " +
      "clobber each other's committed files") {
    // taskIds restart per SparkContext: simulate app A and app B whose
    // partition-0 task both get taskId 0 — only the job token keeps
    // their file names (and thus their committed data) apart
    val dir = tmpDir()
    val schema = StructType(Seq(StructField("icao24", StringType)))
    def appRun(token: String, value: String): Unit = {
      val w = new FlightsV2Writer(dir, schema, partitionId = 0,
        taskId = 0L, jobToken = token)
      w.write(InternalRow(UTF8String.fromString(value)))
      val msg = w.commit()
      new FlightsV2BatchWrite(dir, schema, replace = false)
        .commit(Array(msg))
    }
    appRun("appa0001", "aa0001")
    appRun("appb0002", "bb0002")
    val rows = manifestRows(dir)
    assert(rows.exists(_.contains("aa0001")) &&
      rows.exists(_.contains("bb0002")),
      s"an application's committed rows vanished: $rows")
    assert(!Files.exists(Paths.get(dir).resolve("_manifest.lock")),
      "commit left its lock behind")
  }

  test("control characters in values are escaped — JSONL framing holds") {
    import SparkTestSession.spark.implicits._
    val dir = tmpDir()
    Seq("AB\nCD", "tab\there", "quote\"slash\\").toDF("icao24")
      .write.format("graft-flights").option("path", dir)
      .mode("append").save()
    val rows = manifestRows(dir)
    // one physical line per record — a raw newline would split one
    assert(rows.size == 3, s"framing broken: $rows")
    assert(rows.exists(_.contains("AB\\nCD")))
    assert(rows.exists(_.contains("tab\\there")))
    assert(rows.exists(_.contains("quote\\\"slash\\\\")))
  }

  test("overwrite atomically replaces the manifest") {
    import SparkTestSession.spark.implicits._
    val dir = tmpDir()
    Seq("a", "b", "c").toDF("icao24")
      .write.format("graft-flights").option("path", dir)
      .mode("append").save()
    assert(manifestRows(dir).size == 3)
    Seq("x").toDF("icao24")
      .write.format("graft-flights").option("path", dir)
      .mode("overwrite").save()
    val rows = manifestRows(dir)
    assert(rows.size == 1 && rows.head.contains("\"icao24\":\"x\""))
  }
}
