package graft.examples

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: times named SparkEntry queries (all if no names
  * given) twice each — first run shows plan-compile cost, second shows
  * steady-state throughput — and prints the formatted plan with -x.
  *
  * Usage: runMain graft.examples.Prof [-sf dir] [-x] [name...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.sliding(2).collectFirst {
      case Array("-sf", d) => d }.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("-x")
    val names = args.filterNot(_.startsWith("-"))
      .filterNot(a => a != sfDir && args.contains("-sf") &&
        args(args.indexOf("-sf") + 1) == a)
      .filter(SparkEntry_has)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    // Same block hygiene as Bench: without it, r2 of any query that
    // persist()s silently reuses r1's cache through the CacheManager's
    // canonicalized-plan match and reports a number the bench will
    // never reproduce.
    def dropBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    val targets =
      if (names.nonEmpty) names.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    targets.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[prof] $name r$r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        dropBlocks()
      }
    }
    spark.stop()
  }

  private def SparkEntry_has(n: String): Boolean =
    graft.SparkEntry.queries.contains(n)
}
