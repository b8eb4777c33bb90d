package graft.examples

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: per-JOB wall-time decomposition of one query run — where
  * a multi-job operator (lifecycle inserts, iterative graph rounds)
  * actually spends its time. Prints each job's duration, stage count,
  * task count and the first line of its call site.
  *
  * Usage: runMain graft.examples.JobProf [-sf dir] <name>...
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.sliding(2).collectFirst {
      case Array("-sf", d) => d }.getOrElse("/root/testdata/sf0.1")
    val names = args.filterNot(_.startsWith("-"))
      .filter(a => !(args.contains("-sf") &&
        args(args.indexOf("-sf") + 1) == a))
      .filter(graft.SparkEntry.queries.contains)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    case class J(id: Int, start: Long, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var site: String)
    val jobs = scala.collection.mutable.LinkedHashMap[Int, J]()
    val stageJob = scala.collection.mutable.HashMap[Int, Int]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) jobs.synchronized {
          val site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          jobs(e.jobId) = J(e.jobId, e.time,
            stages = e.stageIds.size, site = site)
          e.stageIds.foreach(sid => stageJob(sid) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (record) jobs.synchronized {
          jobs.get(e.jobId).foreach(_.end = e.time)
        }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit =
        if (record) jobs.synchronized {
          val si = e.stageInfo
          stageJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += si.numTasks
            val nm = si.name.take(60)
            if (!j.site.contains(nm))
              j.site = (j.site + " | " + nm).take(240)
          }
        }
    })

    def dropBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      dropBlocks()
      jobs.synchronized { jobs.clear(); stageJob.clear() }
      record = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      record = false
      println(f"[jobprof] $name total ${dt}%.3f s, ${jobs.size} jobs")
      var prevEnd = 0L
      jobs.synchronized(jobs.values.toSeq).sortBy(_.start).foreach { j =>
        val gap = if (prevEnd == 0L) 0.0 else (j.start - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, j.end)
        println(f"[jobprof]   job ${j.id}%3d ${(j.end - j.start) / 1e3}%7.3f s  gap ${gap}%6.3f s  stages ${j.stages}%2d tasks ${j.tasks}%4d  ${j.site}")
      }
      dropBlocks()
    }
    spark.stop()
  }
}
