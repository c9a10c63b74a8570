package graft.chstub

import java.io.{ByteArrayOutputStream, OutputStream}
import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The stub engine behind an actual HTTP endpoint — the reference's
  * transport is HTTP POST with the statement as the request body
  * (ClickHouse HTTP interface, public docs). A statement the engine
  * rejects returns 400 with the parser message, like the endpoint's
  * DB::Exception text; `select exists(…)` probes answer "0"/"1" in the
  * body. Running the sink through this (instead of calling the engine
  * directly) additionally round-trips the statement TEXT through a real
  * wire encode/decode. */
final class ChStubHttp(val engine: ChStubEngine) extends AutoCloseable {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (exchange: HttpExchange) => handle(exchange))
  server.start()

  def port: Int = server.getAddress.getPort

  private def handle(ex: HttpExchange): Unit = {
    val body = {
      val buf = new ByteArrayOutputStream()
      val in = ex.getRequestBody
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      new String(buf.toByteArray, UTF_8)
    }
    val (code, resp) =
      try {
        if (body.trim.toLowerCase.startsWith("select")) (200, engine.query(body))
        else { engine.execute(body); (200, "") }
      } catch {
        case e: IllegalArgumentException => (400, s"DB::Exception: ${e.getMessage}")
        case scala.util.control.NonFatal(e) => (500, s"DB::Exception: $e")
      }
    val bytes = resp.getBytes(UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val out: OutputStream = ex.getResponseBody
      out.write(bytes)
      out.close()
    }
    ex.close()
  }

  /** Client side: POST one statement; non-200 throws with the endpoint's
    * message (the sink's retry/error path sees a real failure). */
  def post(sql: String): String = {
    val conn = URI.create(s"http://127.0.0.1:$port/").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    val out = conn.getOutputStream
    out.write(sql.getBytes(UTF_8))
    out.close()
    val code = conn.getResponseCode
    val stream = if (code == 200) conn.getInputStream else conn.getErrorStream
    val resp =
      if (stream == null) ""
      else new String(stream.readAllBytes(), UTF_8)
    if (code != 200)
      throw new IllegalStateException(s"HTTP $code from stub: $resp")
    resp
  }

  def execute(sql: String): Unit = { val _ = post(sql) }

  override def close(): Unit = server.stop(0)
}
