package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict to named queries (local dev loop)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.ts is parquet TIMESTAMP(NANOS) — read as long
      // nanos (Spark has no nanosecond timestamp type).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    val failed = scala.collection.mutable.ListBuffer[String]()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Oracle-less queries: print WHY rows-only is the ceiling (each is
    // approximate by construction) and which green exact companion +
    // spec pins its behavior. NOT written into outDir — the compare
    // harness globs outDir/* as query results and a stray file breaks
    // the whole gate.
    SparkEntry.noOracleRationale.toSeq.sortBy(_._1)
      .foreach { case (name, why) =>
        System.err.println(s"[verify] no-oracle $name: $why")
      }
    spark.stop()
    // Loud-failure gate: a declared query that errs must redden the
    // round, not shrink it (r10: 27 queries silently vanished from the
    // artifact and the remaining 80/80 read as all-green). Nonzero exit
    // + an unmissable summary line make the shrink machine-checkable.
    val written = selected.size - failed.size
    System.err.println(
      s"[verify] written $written/${selected.size}" +
        (if (failed.nonEmpty) s", FAILED: ${failed.sorted.mkString(", ")}"
         else ""))
    if (failed.nonEmpty) sys.exit(1)
  }
}
