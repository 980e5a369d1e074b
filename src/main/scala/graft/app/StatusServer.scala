package graft.app

import graft.streaming.CdcPipeline
import java.net.InetSocketAddress

/** Monitoring/control HTTP surface (SURVEY.md §2 O14, mirrors
  * WebController.java:25-83): `GET /status` per-reader JSON,
  * `GET /config` warnings + consumer ids, `POST /stop` graceful stop.
  * Zero-dependency (JDK HttpServer).
  */
class StatusServer(port: Int, warnings: Seq[String],
    consumers: Seq[String], onStop: () => Unit) {

  private val server =
    com.sun.net.httpserver.HttpServer.create(new InetSocketAddress(port), 0)

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
      code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }

  def start(): Unit = {
    server.createContext("/status",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        respond(ex, 200, CdcPipeline.statusJson))
    server.createContext("/config",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        def q(s: String) = "\"" + s.replace("\\", "\\\\")
          .replace("\"", "\\\"") + "\""
        respond(ex, 200,
          s"""{"warnings":${warnings.map(q).mkString("[", ",", "]")},""" +
            s""""readers":${consumers.map(q).mkString("[", ",", "]")}}""")
      })
    server.createContext("/stop",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        respond(ex, 200, """{"stopping":true}""")
        onStop()
      })
    server.setExecutor(null)
    server.start()
  }

  def stop(): Unit = server.stop(0)
}
