package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructType}

/** Source/sink edge of the engine — all I/O lives here, the jobs stay
  * pure (reference: src/plugins/common/s3.py:88-117,
  * src/plugins/scripts/opensky/client.py:20-41,
  * src/plugins/scripts/complete_flights/db.py:42-79).
  */
object Sources {

  /** Raised when a decoded payload does not match the declared schema
    * (reference: common/exceptions.py via opensky/transformers.py:44-47).
    */
  final class InvalidResponseError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** Raised when the persisted state lacks required columns
    * (reference: opensky/transformers.py:64-65).
    */
  final class InvalidSource(msg: String) extends RuntimeException(msg)

  /** S4: Parquet scan with missing→empty-with-declared-schema fallback —
    * a missing state file means "first ever batch", not an error
    * (reference: common/s3.py:88-106, opensky/transformers.py:60-66).
    */
  def readParquetOrEmpty(
      spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) {
      // Read the file's own schema first — forcing the declared schema
      // would silently null out missing columns instead of failing the
      // reference's required-columns check.
      val df = spark.read.parquet(path)
      requireColumns(df, schema.fieldNames)
      df.select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    } else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
  }

  /** F6: schema validation — analysis-time in Spark. */
  def requireColumns(df: DataFrame, required: Seq[String]): Unit = {
    val missing = required.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new InvalidSource(
        s"Latest source dataframe lacks required columns: ${missing.mkString(",")}")
  }

  /** S2: decode an OpenSky states payload (seq of 17-element rows) onto
    * the fixed 17-column schema; shape mismatch fails fast
    * (reference: opensky/transformers.py:37-58).
    */
  def statesFromRows(spark: SparkSession, rows: Seq[Seq[Any]]): DataFrame = {
    val fields = Schemas.states17.fields
    rows.foreach { r =>
      if (r.length != fields.length)
        throw new InvalidResponseError(
          s"states row has ${r.length} fields, expected ${fields.length}")
      // cell TYPES are part of the decode gate too: an unchecked
      // mismatch (an Int where the schema says LongType) would pass
      // createDataFrame lazily and surface as an executor-side
      // "not a valid external type" crash deep inside the merge job
      // instead of the decode-time InvalidResponseError promised here
      var i = 0
      while (i < fields.length) {
        val ok = r(i) match {
          case null => true
          case _: java.lang.Long => fields(i).dataType == LongType
          case _: java.lang.Double => fields(i).dataType == DoubleType
          case _: String => fields(i).dataType == StringType
          case _: java.lang.Boolean => fields(i).dataType == BooleanType
          case _: java.lang.Integer => fields(i).dataType == IntegerType
          case _ => false
        }
        if (!ok)
          throw new InvalidResponseError(
            s"states cell ${fields(i).name} has ${r(i).getClass.getSimpleName}, " +
              s"expected ${fields(i).dataType.simpleString}")
        i += 1
      }
    }
    val rdd = spark.sparkContext.parallelize(rows.map(Row.fromSeq))
    spark.createDataFrame(rdd, Schemas.states17)
  }

  /** P1: project the raw snapshot to the 4-column working subset. */
  def projectStates(states17: DataFrame): DataFrame =
    states17.select("icao24", "last_contact", "velocity", "vertical_rate")

  /** S1 file twin: replay states snapshots from JSON lines with the
    * declared 17-column schema; malformed rows fail fast like the
    * reference's InvalidResponseError (reference:
    * opensky/transformers.py:44-47).
    */
  def readStatesJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.states17)
      .option("mode", "FAILFAST")
      .json(path)

  /** The S3 CSV gate's reader, shared by the local-path and
    * HTTP-fetched variants so inference rules can never diverge.
    */
  private def metadataCsvReader(spark: SparkSession) =
    spark.read.option("header", "true").option("inferSchema", "true")
      // pandas read_csv infers only numeric types — date-like strings
      // stay strings. Spark's date/timestamp inference would silently
      // retype `built` and diverge, so pin both to strict formats a
      // bare date can't match.
      .option("preferDate", "false")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
      .option("inferTimestampNTZType", "false")

  /** S3: aircraft-database CSV scan (header, inferred types) —
    * the only inferred-schema read in the engine
    * (reference: opensky/client.py:37-41).
    */
  def readMetadataCsv(spark: SparkSession, path: String): DataFrame =
    metadataCsvReader(spark).csv(path)

  /** Same gate over already-fetched CSV content (the HTTP dimension
    * path): parsed from a distributed Dataset[String] — a driver-local
    * temp file would be unreadable from executors on a real cluster.
    */
  def readMetadataCsvContent(spark: SparkSession, content: String): DataFrame = {
    import spark.implicits._
    metadataCsvReader(spark)
      .csv(spark.createDataset(content.linesIterator.toSeq))
  }

  /** S5: full-overwrite state write — idempotent per input
    * (reference: common/s3.py:108-117).
    */
  def writeState(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S6: completed-flights sink — append-mode parquet partitioned by
    * landing date; partition pruning makes the reference's 365-day TTL a
    * cheap partition-drop instead of a row-level delete
    * (reference: complete_flights/db.py:42-79).
    *
    * Empty batches are SKIPPED, like the reference: appending one
    * would write only _SUCCESS — no part files, no schema — and a
    * consumer reading the sink before the first real append (or after
    * retention dropped every partition) would crash with "Unable to
    * infer schema".
    *
    * `landed_date` derives in the SESSION time zone; compute any
    * retention horizon (RetentionJob.dropExpired's `today`) in the
    * same zone — every in-repo entry point pins UTC.
    */
  def writeFlights(flights: DataFrame, path: String): Unit =
    if (!flights.isEmpty) {
      flights
        .withColumn("landed_date",
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("landed_at")))
        .write.mode("append").partitionBy("landed_date").parquet(path)
    }
}
