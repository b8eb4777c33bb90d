package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{BooleanType, NumericType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DataSource V2 WRITE path with a real commit protocol — the
  * connector-shaped completion of the reference's MongoDB sink slot
  * (`complete_flights/db.py:42-79`): where `TimeSeriesSink` mirrors
  * the reference's best-effort batched `insert_many`, this sink shows
  * how an engine-native writer makes the same sink EXACTLY-ONCE under
  * task retries and job failure:
  *
  *  - each task's `DataWriter` writes to a private temp file and
  *    reports it in its `WriterCommitMessage` — nothing a task wrote
  *    is visible until the DRIVER commits;
  *  - `BatchWrite.commit` publishes the manifest atomically (write
  *    `_manifest.tmp`, then rename): readers either see the whole
  *    committed write or none of it;
  *  - speculative/retried task attempts produce orphan temp files
  *    that are simply never referenced by the manifest — duplicate
  *    attempts cannot duplicate data;
  *  - `abort` (task- or job-level) deletes temp output.
  *
  * Rows are written as JSON lines (the content format stands in for a
  * DB wire protocol; the COMMIT protocol is the point).
  */
class FlightsV2Sink extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-flights"

  // write-only: schema comes from the DataFrame being written
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FlightsV2Table(schema, new CaseInsensitiveStringMap(properties))
}

class FlightsV2Table(schema0: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsWrite {

  override def name(): String = "graft_flights"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite mode arrives as truncate(): replace the manifest;
      // append (no truncate call) must MERGE with the existing one
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new FlightsV2BatchWrite(options.get("path"), info.schema(),
            replace)
      }
    }
}

case class FlightsV2TaskCommit(file: String, rows: Long)
  extends WriterCommitMessage

class FlightsV2BatchWrite(path: String, schema: StructType,
    replace: Boolean = true)
  extends BatchWrite {
  require(path != null && path.nonEmpty, "graft-flights requires a path")

  // Job-unique token baked into every file name: taskIds restart per
  // SparkContext, so "part-<pid>-<tid>" alone is only unique within
  // one application — a SECOND application appending to the same path
  // would truncate and rewrite files the first one already committed
  // (and the carried-forward manifest would list them twice). This is
  // the same role Spark's own file commit protocol gives its jobId.
  private val jobToken = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new FlightsV2WriterFactory(path, schema, jobToken)

  /** Atomic publish: the manifest names exactly the files of the
    * winning task attempts; orphans from failed/speculative attempts
    * stay unreferenced. Write-then-rename so a reader never observes a
    * half-written manifest.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    val fresh = messages.collect {
      case FlightsV2TaskCommit(f, n) => s"$f\t$n"
    }
    // The rename makes the manifest atomic for READERS; committers
    // must additionally be mutually exclusive, because append's
    // read-modify-write would otherwise let two concurrent jobs each
    // carry the same prior forward and the second rename drop the
    // first job's files. A create-exclusive lock file serializes them
    // (bounded wait, then fail the commit — Spark surfaces the error).
    // The lock records its owner's jobToken; a lock older than
    // `lockStealAfterMillis` is presumed orphaned by a dead committer
    // (e.g. kill -9 between createFile and the finally-delete) and is
    // stolen, so automated jobs recover without manual intervention.
    // A live committer normally holds the lock only for the
    // microseconds of the manifest read-modify-rename, far below the
    // steal horizon — but a stall (GC pause, FS hiccup, huge prior
    // manifest) can push it past the horizon, so the steps below are
    // written so that losing the lock mid-commit FAILS this commit
    // rather than silently dropping the stealer's published files.
    // Honest limit: plain file primitives have no atomic
    // compare-and-rename, so check-then-act windows of a few
    // microseconds remain (ownership re-check → publish rename;
    // token read → release delete). Reaching one requires a SECOND
    // independent >30s stall inside that window after already
    // stalling past the horizon once; the design goal is that every
    // practically reachable interleaving degrades to a failed commit,
    // never to silent file loss.
    val lock = dir.resolve("_manifest.lock")
    var acquired = false
    var attempts = 0
    // The retry budget must OUTLAST the steal horizon: an orphaned
    // lock bearing a dead owner's token (e.g. re-created by the
    // raced-steal restore path below after its live owner moved on)
    // only becomes stealable once its age crosses the horizon, so a
    // wait shorter than the horizon could exhaust its retries against
    // a lock nobody will ever release — a liveness failure one more
    // sleep would have resolved. Horizon + a few sleeps of margin,
    // floored at 10 s for spec-shrunk horizons.
    val sleepMs = 100L
    val deadline = System.currentTimeMillis() + math.max(10000L,
      FlightsV2BatchWrite.lockStealAfterMillis + 10 * sleepMs)
    while (!acquired && System.currentTimeMillis() < deadline) {
      try {
        java.nio.file.Files.write(lock, jobToken.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          try {
            val age = System.currentTimeMillis() -
              java.nio.file.Files.getLastModifiedTime(lock).toMillis
            if (age > FlightsV2BatchWrite.lockStealAfterMillis) {
              // Single-winner steal: ATOMIC_MOVE the stale lock to a
              // job-unique tombstone. Exactly one racing stealer's
              // rename succeeds (the rest get NoSuchFileException and
              // just retry); only the winner deletes. A plain
              // deleteIfExists here would race: stealer A could
              // delete-and-recreate between B's age check and B's
              // delete, and B would then remove A's LIVE lock.
              val tomb = dir.resolve(s"_manifest.lock.stolen-$jobToken")
              beforeSteal()
              java.nio.file.Files.move(lock, tomb,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              // rename preserves mtime — re-check it on the tombstone.
              // If the age check and the rename raced another stealer
              // (stale lock deleted + fresh lock CREATE_NEWed in
              // between), the file we moved is a committer's LIVE lock,
              // and deleting it would unlock that committer's critical
              // section for a third party. RESTORE it with a
              // NON-replacing move: if the name is still free, the
              // owner gets its lock back untouched (content and mtime
              // preserved) and never notices. If a third committer
              // CREATE_NEWed in the meantime, the restore throws and we
              // just drop the tombstone — the displaced owner then
              // fails at its pre-publish ownership re-check: a
              // spurious, SAFE failure, never silent file loss. (A
              // replacing ATOMIC_MOVE restore would be WORSE than
              // deleting: it could clobber that third lock and let the
              // wrong committer pass its ownership check.)
              val tombAge = System.currentTimeMillis() -
                java.nio.file.Files.getLastModifiedTime(tomb).toMillis
              if (tombAge > FlightsV2BatchWrite.lockStealAfterMillis)
                java.nio.file.Files.delete(tomb) // confirmed stale
              else {
                try java.nio.file.Files.move(tomb, lock) // no REPLACE
                catch {
                  case _: java.io.IOException =>
                    java.nio.file.Files.deleteIfExists(tomb)
                }
              }
            }
          } catch {
            case _: java.io.IOException => () // lost the steal race — retry
          }
          attempts += 1; Thread.sleep(sleepMs)
      }
    }
    if (!acquired) throw new IllegalStateException(
      s"could not acquire $lock after ${attempts} attempts (waited " +
        "past the steal horizon) — another committer holds it live")
    try {
      // append semantics: carry the previously committed files forward;
      // overwrite (truncate) starts the manifest from this job alone
      val prior = dir.resolve("_manifest")
      val lines =
        if (replace || !java.nio.file.Files.exists(prior)) fresh.toSeq
        else java.nio.file.Files.readAllLines(prior)
          .asScala.toSeq.filter(_.nonEmpty) ++ fresh
      // job-unique tmp name: two committers racing on a shared
      // `_manifest.tmp` could interleave write/rename and publish a
      // torn manifest even with the lock correct
      val tmp = dir.resolve(s"_manifest.tmp-$jobToken")
      java.nio.file.Files.write(tmp,
        lines.mkString("\n").getBytes("UTF-8"))
      beforePublish()
      // Ownership re-verification: if we stalled past the steal
      // horizon, another committer has (correctly) stolen the lock and
      // may have published a manifest our `lines` doesn't contain —
      // renaming now would drop its files. Fail this commit instead;
      // Spark surfaces the error and the caller retries the job.
      val owner =
        try new String(java.nio.file.Files.readAllBytes(lock), "UTF-8")
        catch { case _: java.io.IOException => "" }
      if (owner != jobToken) {
        java.nio.file.Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"manifest lock for $path was stolen mid-commit (held past " +
            s"${FlightsV2BatchWrite.lockStealAfterMillis} ms); failing " +
            "this commit to avoid dropping a concurrent job's files")
      }
      java.nio.file.Files.move(tmp, dir.resolve("_manifest"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally {
      // token-checked release, like abort(): after a steal, the lock
      // on disk belongs to someone else — an unconditional delete here
      // would unlock the stealer's critical section for a third party
      try {
        val owner = new String(
          java.nio.file.Files.readAllBytes(lock), "UTF-8")
        if (owner == jobToken) java.nio.file.Files.deleteIfExists(lock)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Test seam: invoked after the new manifest content is staged but
    * before the ownership re-check and publish rename. Race specs
    * override this to stall a committer deterministically inside the
    * critical section.
    */
  protected def beforePublish(): Unit = ()

  /** Test seam: invoked after the stale-age check passes but before
    * the tombstone move — the exact window where a racing stealer can
    * have already replaced the stale lock with a fresh live one. Race
    * specs override this to force that interleaving deterministically.
    */
  protected def beforeSteal(): Unit = ()

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.collect { case FlightsV2TaskCommit(f, _) =>
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(path).resolve(f))
    }
    // if this job died while holding the manifest lock, free it so the
    // next committer doesn't have to wait out the steal horizon; only
    // OUR lock is touched (token check) — a concurrent committer's
    // live lock stays
    val lock = java.nio.file.Paths.get(path).resolve("_manifest.lock")
    try {
      val owner = new String(
        java.nio.file.Files.readAllBytes(lock), "UTF-8")
      if (owner == jobToken) java.nio.file.Files.deleteIfExists(lock)
    } catch { case _: java.io.IOException => () }
  }
}

object FlightsV2BatchWrite {
  /** A `_manifest.lock` older than this is treated as orphaned by a
    * dead committer and stolen. Manifest commits hold the lock for
    * well under a millisecond, so 30 s is conservatively safe.
    * Overridable via system property for race specs that need the
    * horizon inside test time.
    */
  def lockStealAfterMillis: Long =
    sys.props.get("graft.flights.lock.steal.ms")
      .map(_.toLong).getOrElse(30000L)
}

class FlightsV2WriterFactory(
    path: String, schema: StructType, jobToken: String)
  extends DataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FlightsV2Writer(path, schema, partitionId, taskId, jobToken)
}

/** Task-private temp file named by (partition, task attempt) — two
  * attempts of the same partition write DIFFERENT files and only the
  * committed one enters the manifest.
  */
object FlightsV2Writer {
  /** Full JSON string escaping — backslash, quote, AND control
    * characters; a raw newline in a value would split one record
    * across two physical lines and corrupt the JSONL framing.
    */
  def escapeJson(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\\' => b.append("\\\\")
        case '"' => b.append("\\\"")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case x if x < ' ' => b.append(f"\\u${x.toInt}%04x")
        case x => b.append(x)
      }
      i += 1
    }
    b.toString
  }
}

class FlightsV2Writer(
    path: String, schema: StructType,
    partitionId: Int, taskId: Long, jobToken: String)
  extends DataWriter[InternalRow] {

  private val fileName = f"part-$partitionId%05d-$taskId-$jobToken.jsonl"
  private val target = {
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    dir.resolve(fileName)
  }
  private val out = java.nio.file.Files.newBufferedWriter(target)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    // typed JSON rendering (numbers/booleans bare, everything else a
    // quoted string); the content format stands in for a DB wire
    // protocol — the commit protocol is the point
    val kv = schema.fields.indices.map { i =>
      val f = schema.fields(i)
      val v =
        if (record.isNullAt(i)) "null"
        else f.dataType match {
          case _: NumericType | BooleanType =>
            val s = record.get(i, f.dataType).toString
            // JSON has no NaN/Infinity literal — a bare one makes the
            // whole line unparseable for strict readers. Quote them
            // (Jackson's non-numeric-number convention).
            if (s == "NaN" || s.endsWith("Infinity")) "\"" + s + "\""
            else s
          case _ =>
            "\"" + FlightsV2Writer.escapeJson(
              String.valueOf(record.get(i, f.dataType))) + "\""
        }
      "\"" + f.name + "\":" + v
    }
    out.write(kv.mkString("{", ",", "}"))
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    FlightsV2TaskCommit(fileName, rows)
  }

  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(target)
  }

  override def close(): Unit = ()
}
