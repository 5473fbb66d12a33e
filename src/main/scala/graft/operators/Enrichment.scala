package graft.operators

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.config._
import graft.core._
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI
import java.time.Duration
import java.util.concurrent.{CompletableFuture, Semaphore}

/** Handlebars-lite template renderer: `{{ field }}` → row value
  * (reference uses full Handlebars but every example/doc only exercises
  * plain field substitution — http_fetch.rs:156-599, ai.rs:426-591).
  */
object Template {
  private val re = "\\{\\{\\s*([A-Za-z_][A-Za-z0-9_.]*)\\s*\\}\\}".r
  def render(tpl: String, row: Row): String = {
    val idx = row.schema.fieldNames.zipWithIndex.toMap
    re.replaceAllIn(tpl, m => {
      val field = m.group(1)
      val v = idx.get(field).map(i => if (row.isNullAt(i)) "" else row.get(i).toString)
      java.util.regex.Matcher.quoteReplacement(v.getOrElse(m.matched))
    })
  }
}

/** Per-partition launch pacer for enrichment requests. `concurrency`
  * bounds how many requests are IN FLIGHT; this bounds how many are
  * LAUNCHED per second — without it, 1000 executors × fast responses
  * hammer a real API at whatever rate the semaphore refills. Strict
  * interval pacing (no burst): request i may launch no earlier than
  * i/ratePerSec seconds after the first. The bound is per PARTITION —
  * aggregate cluster rate = partitions × rate_limit_per_sec, which is the
  * number to budget against a provider's account-level limit.
  */
object RequestPacer {
  def make(ratePerSec: Option[Double]): () => Unit = ratePerSec match {
    case Some(r) if r > 0 =>
      val intervalNanos = math.max(1L, (1e9 / r).toLong)
      new (() => Unit) {
        private var next = System.nanoTime()
        def apply(): Unit = {
          val now = System.nanoTime()
          if (next > now) {
            val waitNs = next - now
            Thread.sleep(waitNs / 1000000L, (waitNs % 1000000L).toInt)
          }
          next = math.max(now, next) + intervalNanos
        }
      }
    case _ => () => ()
  }
}

/** http.fetch — per-row or batch HTTP enrichment (reference
  * src/modules/transforms/http_fetch.rs:156-599): URL/body are `{{field}}`
  * templates, response body stored into `result_field` (null on error —
  * request failures never fail the pipeline), methods GET/POST/PUT/PATCH/
  * DELETE, custom headers, 30 s timeout.
  *
  * Scale design (replaces the reference's tokio buffer_unordered, SURVEY
  * §4.2.3): mapPartitions with ONE pooled async HttpClient per executor and
  * a semaphore bounding in-flight requests per partition (`concurrency`,
  * default 10). Work distributes across executors; total parallelism =
  * partitions × concurrency, with no driver involvement.
  * `rate_limit_per_sec` additionally paces LAUNCHES per partition (see
  * [[RequestPacer]]) — in-flight bounds alone do not cap requests/sec
  * against a real API when responses are fast and partitions are many.
  *
  * Offline testing: `mock = true` short-circuits the network and returns a
  * deterministic JSON echo of the rendered URL after `mock_latency_ms` —
  * this powers the BENCH concurrency demo without egress.
  */
object HttpFetchOp extends Stage {
  val name = "http.fetch"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val urlTpl = cfg.str("url")
    val method = cfg.strOr("method", "GET").toUpperCase
    val bodyTpl = cfg.strOpt("body")
    val resultField = cfg.strOr("result_field", "http_result")
    val headers = cfg.tblOpt("headers").map(_.table.collect { case (k, CStr(v)) => k -> v }).getOrElse(Map.empty)
    val timeoutMs = cfg.longOr("timeout_ms", 30000L)
    val concurrency = cfg.longOr("concurrency", 10L).toInt
    val rateLimit = cfg.doubleOpt("rate_limit_per_sec")
    val mock = cfg.boolOr("mock", false)
    val mockLatencyMs = cfg.longOr("mock_latency_ms", 0L)
    val mode = cfg.strOr("mode", "per_row")

    val df = ctx.primary
    val outSchema = StructType(df.schema.fields :+ StructField(resultField, StringType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)

    mode match {
      case "batch" =>
        // single request on the driver, response broadcast as a literal col
        val resp =
          if (mock) { Thread.sleep(mockLatencyMs); s"""{"mock":true,"url":"$urlTpl"}""" }
          else try {
            val client = HttpClient.newBuilder().connectTimeout(Duration.ofMillis(timeoutMs)).build()
            val b = HttpRequest.newBuilder(URI.create(urlTpl)).timeout(Duration.ofMillis(timeoutMs))
            headers.foreach { case (k, v) => b.header(k, v) }
            val req = method match {
              case "GET" => b.GET().build()
              case m => b.method(m, bodyTpl.map(HttpRequest.BodyPublishers.ofString)
                .getOrElse(HttpRequest.BodyPublishers.noBody())).build()
            }
            client.send(req, HttpResponse.BodyHandlers.ofString()).body()
          } catch { case _: Exception => null }
        df.withColumn(resultField, F.lit(resp))

      case "per_row" =>
        df.mapPartitions { rows =>
          val sem = new Semaphore(concurrency)
          val pace = RequestPacer.make(rateLimit)
          lazy val client = HttpClient.newBuilder()
            .connectTimeout(Duration.ofMillis(timeoutMs)).build()
          val futures = rows.map { row =>
            sem.acquire()
            pace()
            val url = Template.render(urlTpl, row)
            val fut: CompletableFuture[String] =
              if (mock) CompletableFuture.supplyAsync { () =>
                Thread.sleep(mockLatencyMs)
                s"""{"mock":true,"url":"$url"}"""
              }
              else {
                try {
                  val b = HttpRequest.newBuilder(URI.create(url)).timeout(Duration.ofMillis(timeoutMs))
                  headers.foreach { case (k, v) => b.header(k, v) }
                  val req = method match {
                    case "GET" => b.GET().build()
                    case m => b.method(m, bodyTpl.map(t => HttpRequest.BodyPublishers.ofString(Template.render(t, row)))
                      .getOrElse(HttpRequest.BodyPublishers.noBody())).build()
                  }
                  client.sendAsync(req, HttpResponse.BodyHandlers.ofString())
                    .thenApply[String](r => r.body())
                    .exceptionally(_ => null)
                } catch { case _: Exception => CompletableFuture.completedFuture(null: String) }
              }
            fut.whenComplete((_, _) => sem.release())
            (row, fut)
          }.toVector // materialize partition's futures (bounded by semaphore)
          futures.iterator.map { case (row, fut) =>
            val result = try fut.get() catch { case _: Exception => null }
            Row.fromSeq(row.toSeq :+ result)
          }
        }(enc)

      case other => throw new GraftConfigError(s"unknown http.fetch mode '$other'")
    }
  }
}

/** ai.generate — per-row LLM enrichment (reference src/modules/transforms/
  * ai.rs:426-591: providers openai/anthropic/openrouter/ollama behind REST;
  * prompt is a row template; appends a string response column; api key from
  * env var). Same mapPartitions harness as http.fetch; `mock = true`
  * substitutes a deterministic response (no egress in this environment —
  * provider endpoints are exercised only for request-shape correctness in
  * unit tests).
  */
object AiGenerateOp extends Stage {
  val name = "ai.generate"
  val kind = StageKind.Transform

  def requestBody(provider: String, model: String, prompt: String, maxTokens: Long, temperature: Double): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    provider match {
      case "anthropic" =>
        s"""{"model":"${esc(model)}","max_tokens":$maxTokens,"temperature":$temperature,"messages":[{"role":"user","content":"${esc(prompt)}"}]}"""
      case "openai" | "openrouter" =>
        s"""{"model":"${esc(model)}","max_tokens":$maxTokens,"temperature":$temperature,"messages":[{"role":"user","content":"${esc(prompt)}"}]}"""
      case "ollama" =>
        s"""{"model":"${esc(model)}","prompt":"${esc(prompt)}","stream":false}"""
      case other => throw new GraftConfigError(s"unknown provider '$other'")
    }
  }

  def endpoint(provider: String, baseUrl: Option[String]): String = provider match {
    case "openai"     => baseUrl.getOrElse("https://api.openai.com") + "/v1/chat/completions"
    case "anthropic"  => baseUrl.getOrElse("https://api.anthropic.com") + "/v1/messages"
    case "openrouter" => baseUrl.getOrElse("https://openrouter.ai/api") + "/v1/chat/completions"
    case "ollama"     => baseUrl.getOrElse("http://localhost:11434") + "/api/generate"
    case other => throw new GraftConfigError(s"unknown provider '$other'")
  }

  /** Per-provider API-version request header: (header name, default
    * value) — the public, vendor-documented header the reference sends
    * verbatim (ai.rs:203); override per pipeline with `api_version` /
    * `api_version_header`. (A literal, deliberately: see
    * docs/DESIGN_NOTES.md "provider version headers".) */
  val versionHeaders: Map[String, (String, String)] =
    Map("anthropic" -> ("anthropic-version", "2023-06-01"))

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val provider = cfg.str("provider")
    val model = cfg.str("model")
    val promptTpl = cfg.str("prompt")
    val out = cfg.str("output_column")
    val maxTokens = cfg.longOr("max_tokens", 1024L)
    val temperature = cfg.doubleOr("temperature", 0.7)
    val apiKeyEnv = cfg.strOpt("api_key_env")
    val baseUrl = cfg.strOpt("api_base_url")
    val mock = cfg.boolOr("mock", false)
    val concurrency = cfg.longOr("concurrency", 4L).toInt
    val rateLimit = cfg.doubleOpt("rate_limit_per_sec")
    val url = endpoint(provider, baseUrl)
    val apiKey = apiKeyEnv.flatMap(sys.env.get)
    val versionHeader: Option[(String, String)] = versionHeaders.get(provider)
      .map { case (h, dflt) =>
        (cfg.strOr("api_version_header", h), cfg.strOr("api_version", dflt)) }

    val df = ctx.primary
    val outSchema = StructType(df.schema.fields :+ StructField(out, StringType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)

    df.mapPartitions { rows =>
      lazy val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
      val sem = new Semaphore(concurrency)
      val pace = RequestPacer.make(rateLimit)
      val futures = rows.map { row =>
        val prompt = Template.render(promptTpl, row)
        sem.acquire()
        pace()
        val fut: CompletableFuture[String] =
          if (mock) CompletableFuture.completedFuture(s"[mock:$provider/$model] $prompt")
          else try {
            val body = requestBody(provider, model, prompt, maxTokens, temperature)
            val b = HttpRequest.newBuilder(URI.create(url))
              .timeout(Duration.ofSeconds(120))
              .header("content-type", "application/json")
            provider match {
              case "anthropic" => apiKey.foreach(k => b.header("x-api-key", k))
              case _ => apiKey.foreach(k => b.header("authorization", s"Bearer $k"))
            }
            versionHeader.foreach { case (h, v) => b.header(h, v) }
            client.sendAsync(b.POST(HttpRequest.BodyPublishers.ofString(body)).build(),
                HttpResponse.BodyHandlers.ofString())
              .thenApply[String](r => r.body()).exceptionally(_ => null)
          } catch { case _: Exception => CompletableFuture.completedFuture(null: String) }
        fut.whenComplete((_, _) => sem.release())
        (row, fut)
      }.toVector
      futures.iterator.map { case (row, fut) =>
        Row.fromSeq(row.toSeq :+ (try fut.get() catch { case _: Exception => null }))
      }
    }(enc)
  }
}
