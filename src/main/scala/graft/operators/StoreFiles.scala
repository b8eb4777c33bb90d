package graft.operators

import org.apache.spark.sql.SparkSession

/** Filesystem access shared by the persisted ANN stores
  * ([[KnnBeam.BandIndex]] and [[EdgeStore]]) so the two stores'
  * storage plumbing stays one definition. The swap protocols stay
  * store-specific on purpose — whole-store swap for compact,
  * per-bucket park-and-swap for edge deltas — but both resolve their
  * filesystem here.
  */
private[operators] object StoreFiles {
  def fs(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
}
