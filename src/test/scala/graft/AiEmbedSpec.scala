package graft

import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.{AiEmbedOp, IndexBuildOp, KnnBruteForceOp, KnnIvfOp}

/** ai.embed — provider request/response shapes (offline, literal bodies),
  * deterministic mock vectors, and the end-to-end offline vector pipeline
  * (embed → index.build type=ivfpq → knn.ivf ≡ brute force). */
class AiEmbedSpec extends SparkSpec {

  private def docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  // ---- pure shapes ----

  test("request bodies per provider") {
    val o = AiEmbedOp.requestBody("openai", "text-embedding-3-small", "hi \"there\"\n")
    assert(o.contains("\"input\":\"hi \\\"there\\\"\\n\"") && o.contains("\"model\":\"text-embedding-3-small\""))
    val l = AiEmbedOp.requestBody("ollama", "nomic-embed-text", "p")
    assert(l.contains("\"prompt\":\"p\""))
    intercept[GraftConfigError](AiEmbedOp.requestBody("bad", "m", "t"))
  }

  test("endpoints: anthropic has no embeddings API and fails loud") {
    assert(AiEmbedOp.endpoint("openai", None).endsWith("/v1/embeddings"))
    assert(AiEmbedOp.endpoint("ollama", Some("http://h:1")) === "http://h:1/api/embeddings")
    val e = intercept[GraftConfigError](AiEmbedOp.endpoint("anthropic", None))
    assert(e.getMessage.contains("no public embeddings endpoint"))
  }

  test("response parsing: openai and ollama shapes; garbage yields null") {
    val openai = """{"object":"list","data":[{"object":"embedding","index":0,
      |"embedding":[0.1,-0.25,3]}],"model":"m","usage":{"prompt_tokens":2}}""".stripMargin
    assert(AiEmbedOp.parseEmbedding("openai", openai).toSeq === Seq(0.1f, -0.25f, 3f))
    val ollama = """{"embedding":[1,2,0.5]}"""
    assert(AiEmbedOp.parseEmbedding("ollama", ollama).toSeq === Seq(1f, 2f, 0.5f))
    assert(AiEmbedOp.parseEmbedding("openai", "not json") === null)
    assert(AiEmbedOp.parseEmbedding("openai", """{"data":[]}""") === null)
    assert(AiEmbedOp.parseEmbedding("openai",
      """{"data":[{"embedding":["a"]}]}""") === null)
    assert(AiEmbedOp.parseEmbedding("ollama", """{"embedding":[]}""") === null)
  }

  test("mock vectors are deterministic unit vectors, independent of partitioning") {
    val v1 = AiEmbedOp.mockVec("some document text", 64)
    val v2 = AiEmbedOp.mockVec("some document text", 64)
    assert(v1.toSeq === v2.toSeq)
    assert(v1.length === 64)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
    assert(AiEmbedOp.mockVec("other text", 64).toSeq !== v1.toSeq)
    // through the operator, across different partitionings
    val a = AiEmbedOp(StageContext.one(spark, docs, Cfg.of(
      "mock" -> true, "dim" -> 32)))
      .select("doc_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val b = AiEmbedOp(StageContext.one(spark, docs.repartition(7), Cfg.of(
      "mock" -> true, "dim" -> 32)))
      .select("doc_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(a === b)
    assert(a.values.forall(_.length === 32))
  }

  test("null text embeds to null; output collision fails loud") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, null: String)).toDF("doc_id", "text")
    val out = AiEmbedOp(StageContext.one(spark, df, Cfg.of("mock" -> true, "dim" -> 8)))
      .collect().map(r => (r.getLong(0), r.isNullAt(2))).toMap
    assert(out === Map(1L -> false, 2L -> true))
    val e = intercept[GraftConfigError] {
      AiEmbedOp(StageContext.one(spark, df.withColumn("embedding",
        org.apache.spark.sql.functions.lit(1)), Cfg.of("mock" -> true)))
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("offline vector pipeline: embed -> ivfpq index -> knn.ivf equals brute force") {
    val embedded = AiEmbedOp(StageContext.one(spark, docs, Cfg.of(
      "mock" -> true, "dim" -> 32)))
      .select("doc_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_embed_pq").toString
    IndexBuildOp(StageContext.one(spark, embedded, Cfg.of(
      "type" -> "ivfpq", "path" -> dir, "vector_column" -> "embedding",
      "nlist" -> 8, "m" -> 8, "ksub" -> 16, "seed" -> 11)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaIndex = rows(KnnIvfOp(StageContext.one(spark, embedded, Cfg.of(
      "query_id" -> 0, "id_column" -> "doc_id", "k" -> 10,
      "nprobe" -> 8, "rerank" -> 100, "index_path" -> dir))))
    val brute = rows(KnnBruteForceOp(StageContext.one(spark, embedded, Cfg.of(
      "query_id" -> 0, "id_column" -> "doc_id", "k" -> 10))))
    assert(viaIndex === brute)
    assert(viaIndex.head._1 === 0L && viaIndex.head._2 === 1.0)
  }
}
