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

/** ai.embed — per-row embedding generation, the missing first step of the
  * vector pipeline (ai.embed → index.build type=ivf|ivfpq|lsh → knn/dedup).
  * The reference stops at text generation (ai.rs has no embeddings
  * transform); this is part of the training-data surface the brief asks
  * for beyond parity. Same mapPartitions + bounded-async harness as
  * http.fetch / ai.generate.
  *
  * Providers (public, vendor-documented REST shapes): `openai` /
  * `openrouter` POST {base}/v1/embeddings {"model","input"} → float array
  * at data[0].embedding; `ollama` POST {base}/api/embeddings
  * {"model","prompt"} → at embedding. `anthropic` fails loud (no public
  * embeddings endpoint — its docs direct to third-party embedders).
  * Responses parse executor-side with the in-repo JSON parser
  * (graft.js.JsValue.parseJson); a malformed response yields null, the
  * harness's uniform failure value.
  *
  * `mock = true` (this zero-egress environment): a DETERMINISTIC unit
  * vector of `dim` (default 64) derived from the text bytes via
  * splitmix64 — same text, same vector, on any partitioning — so whole
  * offline pipelines (embed → index → probe) run and their downstream
  * stages stay plan-identical to production.
  */
object AiEmbedOp extends Stage {
  val name = "ai.embed"
  val kind = StageKind.Transform

  def endpoint(provider: String, baseUrl: Option[String]): String = provider match {
    case "openai"     => baseUrl.getOrElse("https://api.openai.com") + "/v1/embeddings"
    case "openrouter" => baseUrl.getOrElse("https://openrouter.ai/api") + "/v1/embeddings"
    case "ollama"     => baseUrl.getOrElse("http://localhost:11434") + "/api/embeddings"
    case "anthropic"  => throw new GraftConfigError(
      "ai.embed: provider 'anthropic' has no public embeddings endpoint — " +
      "use openai, openrouter, or ollama")
    case other => throw new GraftConfigError(s"unknown provider '$other'")
  }

  def requestBody(provider: String, model: String, text: String): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    provider match {
      case "openai" | "openrouter" =>
        s"""{"model":"${esc(model)}","input":"${esc(text)}"}"""
      case "ollama" =>
        s"""{"model":"${esc(model)}","prompt":"${esc(text)}"}"""
      case other => throw new GraftConfigError(s"unknown provider '$other'")
    }
  }

  /** Embedding array out of a provider response body; null on any
    * mismatch (the harness's uniform failure value — same contract as
    * http.fetch's null on transport failure). */
  def parseEmbedding(provider: String, body: String): Array[Float] = {
    import graft.js._
    try {
      def field(v: JsVal, k: String): JsVal = v match {
        case o: JsObj => o.fields.getOrElse(k, JsUndefined)
        case _ => JsUndefined
      }
      val root = JsVal.parseJson(body)
      val arr = provider match {
        case "ollama" => field(root, "embedding")
        case _ => field(root, "data") match {
          case a: JsArr if a.items.nonEmpty => field(a.items(0), "embedding")
          case _ => JsUndefined
        }
      }
      arr match {
        case a: JsArr if a.items.nonEmpty && a.items.forall(_.isInstanceOf[JsNum]) =>
          a.items.map(_.asInstanceOf[JsNum].d.toFloat).toArray
        case _ => null
      }
    } catch { case _: Exception => null }
  }

  /** Deterministic mock embedding: splitmix64 stream seeded from the text
    * bytes, unit-normalized. Pure content function — independent of row
    * order, partitioning, and session. */
  def mockVec(text: String, dim: Int): Array[Float] = {
    var h = 0x9E3779B97F4A7C15L
    text.getBytes("UTF-8").foreach { b =>
      h = (h ^ (b & 0xFFL)) * 0xBF58476D1CE4E5B9L
    }
    val v = new Array[Double](dim)
    var s = h
    var i = 0
    var norm = 0.0
    while (i < dim) {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      v(i) = (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      norm += v(i) * v(i)
      i += 1
    }
    val n = math.sqrt(norm)
    // all-zero draw is impossible (splitmix64 outputs are equidistributed),
    // but guard the division anyway
    if (n == 0.0) v.map(_ => 0f) else v.map(x => (x / n).toFloat)
  }

  def apply(ctx: StageContext): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val cfg = ctx.cfg
    val provider = cfg.strOr("provider", "openai")
    val column = cfg.strOr("column", "text")
    val out = cfg.strOr("output_column", "embedding")
    val mock = cfg.boolOr("mock", false)
    val dim = cfg.longOr("dim", 64L).toInt
    if (dim < 1) throw new GraftConfigError(s"ai.embed: dim must be >= 1, got $dim")
    val df = ctx.primary
    if (!df.columns.contains(column)) throw new GraftPlanError(
      s"ai.embed: column '$column' not found (has: ${df.columns.mkString(", ")})")
    if (df.columns.contains(out)) throw new GraftConfigError(
      s"ai.embed: output_column '$out' already exists — rename one side")

    if (mock) {
      // mock is a pure codegen-friendly projection, no harness needed
      val mk = F.udf { t: String => if (t == null) null else mockVec(t, dim) }
      return df.withColumn(out, mk(F.col(column)))
    }

    val model = cfg.str("model")
    val apiKey = cfg.strOpt("api_key_env").flatMap(sys.env.get)
    val url = endpoint(provider, cfg.strOpt("api_base_url"))
    val concurrency = cfg.longOr("concurrency", 4L).toInt
    val rateLimit = cfg.doubleOpt("rate_limit_per_sec")
    val outSchema = StructType(df.schema.fields :+
      StructField(out, ArrayType(FloatType), nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val colIdx = df.schema.fieldIndex(column)

    df.mapPartitions { rows =>
      lazy val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
      val sem = new Semaphore(concurrency)
      val pace = RequestPacer.make(rateLimit)
      val futures = rows.map { row =>
        sem.acquire()
        pace()
        val text = if (row.isNullAt(colIdx)) null else row.getString(colIdx)
        val fut: CompletableFuture[String] =
          if (text == null) CompletableFuture.completedFuture(null: String)
          else try {
            val b = HttpRequest.newBuilder(URI.create(url))
              .timeout(Duration.ofSeconds(120))
              .header("content-type", "application/json")
            apiKey.foreach(k => b.header("authorization", s"Bearer $k"))
            client.sendAsync(
                b.POST(HttpRequest.BodyPublishers.ofString(
                  requestBody(provider, model, text))).build(),
                HttpResponse.BodyHandlers.ofString())
              .thenApply[String](r => r.body()).exceptionally(_ => null)
          } catch { case _: Exception => CompletableFuture.completedFuture(null: String) }
        fut.whenComplete((_, _) => sem.release())
        (row, fut)
      }.toVector
      futures.iterator.map { case (row, fut) =>
        val body = try fut.get() catch { case _: Exception => null }
        val emb = if (body == null) null else parseEmbedding(provider, body)
        Row.fromSeq(row.toSeq :+ emb)
      }
    }(enc)
  }
}
