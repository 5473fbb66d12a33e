package graft.operators

import org.apache.spark.sql.DataFrame
import graft.config._
import graft.core._
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI
import java.time.Duration

/** http.get/post/put/patch/delete — source-mode HTTP (reference
  * plugins/conveyor-plugin-http/src/lib.rs:29-341): one request on the
  * driver; JSON array response → rows, JSON object → one row. Unlike
  * http.fetch (per-row enrichment on executors) this is a SOURCE — one
  * call, so driver-side is the correct locality. `mock_response` supplies
  * the body offline (zero-egress environment).
  */
class HttpSource(method: String) extends Stage {
  val name = s"http.${method.toLowerCase}"
  val kind = StageKind.Source

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val url = cfg.str("url")
    val body: String = cfg.strOpt("mock_response") match {
      case Some(mock) => mock
      case None =>
        val client = HttpClient.newBuilder()
          .connectTimeout(Duration.ofMillis(cfg.longOr("timeout_ms", 30000L))).build()
        val b = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofMillis(cfg.longOr("timeout_ms", 30000L)))
        cfg.tblOpt("headers").foreach(_.table.foreach {
          case (k, CStr(v)) => b.header(k, v)
          case _ =>
        })
        val req = method match {
          case "GET" => b.GET().build()
          case "DELETE" => b.DELETE().build()
          case m => b.method(m, cfg.strOpt("body")
            .map(HttpRequest.BodyPublishers.ofString)
            .getOrElse(HttpRequest.BodyPublishers.noBody())).build()
        }
        client.send(req, HttpResponse.BodyHandlers.ofString()).body()
    }
    import ctx.spark.implicits._
    // array → rows; object → single row (Spark JSON reader handles both
    // with multiLine-style whole-document parsing)
    ctx.spark.read.option("multiLine", true).json(Seq(body).toDS)
  }
}

object HttpGetSource extends HttpSource("GET")
object HttpPostSource extends HttpSource("POST")
object HttpPutSource extends HttpSource("PUT")
object HttpPatchSource extends HttpSource("PATCH")
object HttpDeleteSource extends HttpSource("DELETE")
