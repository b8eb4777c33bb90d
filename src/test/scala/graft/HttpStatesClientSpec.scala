package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.sources.HttpStatesClient

/** The live S1 HTTP path against an in-process stub server: auth
  * header, rate-limit logging, non-200 error, timeout, payload decode
  * through the shared 17-column gate, and the CSV dimension fetch.
  */
class HttpStatesClientSpec extends SparkSpecBase with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  @volatile private var lastAuth: Option[String] = None

  private val statesJson =
    """{"time": 1700000123, "states": [
      |["abc123", "GRF001  ", "Utopia", 1700000100, 1700000120,
      | 8.5, 47.3, 1200.5, false, 185.2, 90.0, 5.5, null, 1250.0,
      | "7000", false, 0],
      |["def456", null, "Utopia", null, 1700000121,
      | null, null, null, true, 0.0, null, 0.0, null, null,
      | null, false, 0]
      |]}""".stripMargin

  private def respond(ex: HttpExchange, code: Int, body: String,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/states/all", (ex: HttpExchange) => {
      lastAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      respond(ex, 200, statesJson,
        Map("X-Rate-Limit-Remaining" -> "3999"))
    })
    server.createContext("/broken", (ex: HttpExchange) =>
      respond(ex, 503, "upstream unavailable"))
    server.createContext("/malformed", (ex: HttpExchange) =>
      respond(ex, 200, """{"time": 1, "states": [["only", "five", "fields", 1, 2]]}"""))
    server.createContext("/slow", (ex: HttpExchange) => {
      Thread.sleep(2000)
      respond(ex, 200, statesJson)
    })
    server.createContext("/datasets/metadata/aircraftDatabase.csv",
      (ex: HttpExchange) => respond(ex, 200,
        "icao24,model,built\nabc123,A320,2001-04-05\ndef456,B738,1999-01-02\n"))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  test("fetchStates sends Basic auth, logs the rate limit, and decodes " +
      "the payload through the 17-column gate") {
    val logged = scala.collection.mutable.Buffer[String]()
    val client = new HttpStatesClient(base, auth = Some("dXNlcjpwYXNz"),
      log = logged += _)
    val df = client.fetchStates(spark)
    assert(lastAuth.contains("Basic dXNlcjpwYXNz"))
    assert(logged.exists(_.contains("Rate limit remaining: 3999")))
    assert(df.schema == Schemas.states17)
    val rows = df.orderBy("icao24").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "abc123")
    assert(rows(0).getLong(4) == 1700000120L)
    assert(rows(0).getDouble(9) == 185.2)
    assert(rows(1).isNullAt(1), "null callsign must decode to null")
    assert(rows(1).getBoolean(8), "on_ground boolean must decode")
  }

  test("a non-200 response raises InvalidResponseError with the status") {
    val client = new HttpStatesClient(base)
    val e = intercept[Sources.InvalidResponseError] {
      client.get(s"$base/broken")
    }
    assert(e.getMessage.contains("503"))
  }

  test("a wrong-arity states row fails fast like the replay path") {
    val client = new HttpStatesClient(base)
    val body = client.get(s"$base/malformed")
    val e = intercept[Sources.InvalidResponseError] {
      HttpStatesClient.decodeStatesPayload(spark, body)
    }
    assert(e.getMessage.contains("expected 17"))
  }

  test("a malformed cell fails fast instead of coercing to a zero " +
      "sentinel") {
    // Jackson's asLong would turn "n/a" into 0 — the pipeline's
    // "absent this batch" sentinel — silently mis-sessionizing the
    // flight; the decode must fail like the FAILFAST replay path
    val cells = "\"ab1\", \"CALL\", \"DE\", \"n/a\"" +
      (", null" * 13)
    val payload = s"""{"time": 1, "states": [[$cells]]}"""
    val e = intercept[Sources.InvalidResponseError] {
      HttpStatesClient.decodeStatesPayload(spark, payload)
    }
    assert(e.getMessage.contains("integral number"), e.getMessage)
  }

  test("a response slower than the timeout raises a timeout") {
    val client = new HttpStatesClient(base, timeoutMillis = 200L)
    intercept[java.net.http.HttpTimeoutException] {
      client.get(s"$base/slow")
    }
  }

  test("non-JSON payload raises InvalidResponseError, not a parser crash") {
    intercept[Sources.InvalidResponseError] {
      HttpStatesClient.decodeStatesPayload(spark, "<html>oops</html>")
    }
    intercept[Sources.InvalidResponseError] {
      HttpStatesClient.decodeStatesPayload(spark, """{"time": 1}""")
    }
  }

  test("the metadata CSV fetch reads through the standard CSV gate") {
    val client = new HttpStatesClient(base)
    val df = client.fetchMetadataCsv(spark)
    assert(df.columns.toSeq == Seq("icao24", "model", "built"))
    assert(df.count() == 2)
    // pandas-parity inference: date-like strings stay strings
    assert(df.schema("built").dataType ==
      org.apache.spark.sql.types.StringType)
  }
}
