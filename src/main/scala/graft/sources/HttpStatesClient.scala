package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.{Schemas, Sources}

/** S1 live path: HTTP client for the states API and the metadata CSV —
  * the reference's client behavior (reference: opensky/client.py:20-41)
  * behind the same decode gate the replay paths use: Basic-auth header,
  * 5 s timeout, `X-Rate-Limit-Remaining` logged on every response, and
  * any non-200 raising `InvalidResponseError` with the status code.
  *
  * The snapshot fetch is deliberately DRIVER-side: one bounded snapshot
  * (~15k rows / cycle) is the API's unit of work, and an HTTP endpoint
  * cannot be split. Scale-out happens immediately downstream — the
  * decoded payload becomes a distributed DataFrame via
  * `Sources.statesFromRows`, sharing every shape/type validation with
  * the replay and DSv2 paths, so live and replayed cycles are
  * indistinguishable to the engine.
  */
final class HttpStatesClient(
    baseUrl: String,
    auth: Option[String] = None,
    timeoutMillis: Long = 5000L,
    log: String => Unit = s => Console.err.println(s"[http-states] $s")) {

  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMillis))
    .build()

  /** GET with auth + timeout; logs the rate-limit header; non-200 →
    * InvalidResponseError (reference: opensky/client.py:20-35).
    */
  def get(url: String): String = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMillis))
      .GET()
    auth.foreach(a => b.header("Authorization", s"Basic $a"))
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    val rl = resp.headers().firstValue("X-Rate-Limit-Remaining")
    log(s"Rate limit remaining: ${if (rl.isPresent) rl.get else "unknown"}")
    if (resp.statusCode() != 200)
      throw new Sources.InvalidResponseError(
        s"Failed to fetch states, status code: ${resp.statusCode()}")
    resp.body()
  }

  /** One live snapshot, decoded to the 17-column states DataFrame. */
  def fetchStates(spark: SparkSession): DataFrame =
    HttpStatesClient.decodeStatesPayload(spark, get(s"$baseUrl/api/states/all"))

  /** Dimension CSV over HTTP (reference: opensky/client.py:37-41):
    * fetched once on the driver (a bounded dimension), then parsed as a
    * distributed Dataset[String] through the standard S3 CSV gate —
    * same inference rules as the local-file path, and no driver-local
    * temp file that cluster executors could not read.
    */
  def fetchMetadataCsv(
      spark: SparkSession,
      path: String = "/datasets/metadata/aircraftDatabase.csv"): DataFrame =
    Sources.readMetadataCsvContent(spark, get(s"$baseUrl$path"))
}

object HttpStatesClient {
  private val mapper = new ObjectMapper()

  /** Decode the `{"time": …, "states": [[…17 values…], …]}` payload
    * into the fixed 17-column DataFrame. Null-safe per cell; row-shape
    * mismatches fail fast inside `statesFromRows` exactly like the
    * replay path (reference: opensky/transformers.py:37-58).
    */
  def decodeStatesPayload(spark: SparkSession, json: String): DataFrame = {
    val root =
      try mapper.readTree(json)
      catch {
        case e: Exception =>
          throw new Sources.InvalidResponseError(
            s"states payload is not valid JSON: ${e.getMessage}", e)
      }
    val states = root.get("states")
    if (states == null || !states.isArray)
      throw new Sources.InvalidResponseError(
        "states payload lacks a 'states' array")
    val fields = Schemas.states17.fields
    val rows = (0 until states.size()).map { i =>
      val arr = states.get(i)
      // Reject wrong-arity rows here, not downstream: coercing
      // out-of-range cells as strings only to have statesFromRows
      // reject the row is wasted work with a less precise error.
      if (arr.size() != fields.length)
        throw new Sources.InvalidResponseError(
          s"states row $i has ${arr.size()} fields, expected ${fields.length}")
      (0 until arr.size()).map(j => coerce(arr.get(j), fields(j).dataType))
    }
    Sources.statesFromRows(spark, rows)
  }

  /** STRICT cell decode: Jackson's asLong()/asDouble()/asBoolean()
    * return 0/0.0/false for non-convertible nodes, which would turn a
    * malformed cell (e.g. last_contact: "n/a") into the pipeline's
    * "absent this batch" sentinel and silently mis-sessionize the
    * flight — while the replay path (FAILFAST json read) rejects the
    * same data. Live and replayed cycles must fail identically.
    */
  private def coerce(v: JsonNode, dt: DataType): Any = {
    def bad(expected: String) =
      throw new Sources.InvalidResponseError(
        s"states cell is not $expected: ${v.getNodeType} '${v.toString.take(40)}'")
    if (v == null || v.isNull) null
    else dt match {
      case StringType =>
        if (!v.isTextual && !v.isNumber) bad("a string")
        v.asText()
      case LongType =>
        if (!v.canConvertToLong) bad("an integral number")
        v.asLong()
      case DoubleType =>
        if (!v.isNumber) bad("a number")
        v.asDouble()
      case BooleanType =>
        if (!v.isBoolean) bad("a boolean")
        v.asBoolean()
      case IntegerType =>
        if (!v.canConvertToInt) bad("a 32-bit integer")
        v.asInt()
      case other =>
        throw new Sources.InvalidResponseError(
          s"unsupported states column type $other")
    }
  }
}
