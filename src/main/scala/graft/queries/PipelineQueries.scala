package graft.queries

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, PipelineConfig}
import graft.core.{DagCompiler, Registry, StageContext}
import graft.operators._

/** End-to-end queries that exercise the TOML front-end + DagCompiler (the
  * whole reference-compatible pipeline path), plus the row-level UDF stages
  * (crypto round-trip, mocked http enrichment) — each still oracle-checked.
  */
object PipelineQueries {

  /** Compile a TOML pipeline over the test data and return a stage's plan. */
  private def runToml(s: org.apache.spark.sql.SparkSession, toml: String, output: String) = {
    val pc = PipelineConfig.fromString(toml)
    new DagCompiler(Registry.withDefaults).compilePlans(s, pc)(output)
  }

  val all: Seq[QueryDef] = Seq(

    // The reference quick-start shape (README.md:35-72): source → filter →
    // groupby → sort, declared entirely in TOML, compiled to ONE plan.
    QueryDef("pipeline_toml_linear",
      """SELECT l_returnflag, sum(l_quantity) AS total_qty, count(l_quantity) AS cnt
        |FROM lineitem WHERE l_quantity >= 30
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      runToml(s,
        s"""
           |[pipeline]
           |name = "quickstart"
           |
           |[global]
           |log_level = "warn"
           |
           |[global.variables]
           |data_dir = "$d"
           |
           |[[stages]]
           |id = "load"
           |function = "table.read"
           |[stages.config]
           |dir = "{{data_dir}}"
           |table = "lineitem"
           |
           |[[stages]]
           |id = "big"
           |function = "filter.apply"
           |inputs = ["load"]
           |[stages.config]
           |column = "l_quantity"
           |operator = ">="
           |value = 30
           |
           |[[stages]]
           |id = "agg"
           |function = "groupby.apply"
           |inputs = ["big"]
           |[stages.config]
           |by = "l_returnflag"
           |aggregations = [
           |  { column = "l_quantity", operation = "sum", output_column = "total_qty" },
           |  { column = "l_quantity", operation = "count", output_column = "cnt" },
           |]
           |
           |[[stages]]
           |id = "rank"
           |function = "sort.apply"
           |inputs = ["agg"]
           |[stages.config]
           |by = "l_returnflag"
           |""".stripMargin, "rank")
    },

    // fan-out DAG: one source feeding two branches, then a join fan-in —
    // exercises memoized plan reuse (reference clones frames per consumer)
    QueryDef("pipeline_toml_fanout",
      """SELECT a.o_orderpriority, a.n_all, b.n_big
        |FROM (SELECT o_orderpriority, count(*) AS n_all FROM orders GROUP BY 1) a
        |JOIN (SELECT o_orderpriority, count(*) AS n_big FROM orders
        |      WHERE o_totalprice > 200000 GROUP BY 1) b
        |USING (o_orderpriority)""".stripMargin) { (s, d) =>
      runToml(s,
        s"""
           |[pipeline]
           |name = "fanout"
           |
           |[[stages]]
           |id = "orders"
           |function = "table.read"
           |config = { dir = "$d", table = "orders" }
           |
           |[[stages]]
           |id = "all_counts"
           |function = "groupby.apply"
           |inputs = ["orders"]
           |[stages.config]
           |by = "o_orderpriority"
           |aggregations = [{ column = "o_orderkey", operation = "count", output_column = "n_all" }]
           |
           |[[stages]]
           |id = "big"
           |function = "filter.apply"
           |inputs = ["orders"]
           |config = { column = "o_totalprice", operator = ">", value = 200000 }
           |
           |[[stages]]
           |id = "big_counts"
           |function = "groupby.apply"
           |inputs = ["big"]
           |[stages.config]
           |by = "o_orderpriority"
           |aggregations = [{ column = "o_orderkey", operation = "count", output_column = "n_big" }]
           |
           |[[stages]]
           |id = "joined"
           |function = "join.apply"
           |inputs = ["all_counts", "big_counts"]
           |config = { on = "o_orderpriority", broadcast = "right" }
           |""".stripMargin, "joined")
        .select("o_orderpriority", "n_all", "n_big")
    },

    // sub-pipeline composition with the reference's discarded-output bug FIXED
    QueryDef("pipeline_toml_nested",
      "SELECT n_name FROM nation WHERE n_regionkey = 0 ORDER BY n_name") { (s, d) =>
      runToml(s,
        s"""
           |[pipeline]
           |name = "outer"
           |
           |[[stages]]
           |id = "sub"
           |function = "stage.pipeline"
           |[stages.config]
           |inline = '''
           |[pipeline]
           |name = "inner"
           |[[stages]]
           |id = "nation"
           |function = "table.read"
           |config = { dir = "$d", table = "nation" }
           |[[stages]]
           |id = "r0"
           |function = "filter.apply"
           |inputs = ["nation"]
           |config = { column = "n_regionkey", operator = "==", value = 0 }
           |'''
           |
           |[[stages]]
           |id = "names"
           |function = "select.apply"
           |inputs = ["sub"]
           |config = { columns = "n_name" }
           |
           |[[stages]]
           |id = "sorted"
           |function = "sort.apply"
           |inputs = ["names"]
           |config = { by = "n_name" }
           |""".stripMargin, "sorted")
    },

    // crypto round-trip: decrypt(encrypt(x)) == x, all three algorithms
    // exercised in specs; the gate checks aes-256-gcm end-to-end
    QueryDef("crypto_roundtrip",
      "SELECT c_custkey, c_name AS roundtrip FROM customer") { (s, d) =>
      val key32 = "0123456789abcdef0123456789abcdef"
      val enc = EncryptOp(StageContext.one(s, QueryDef.t(s, d, "customer"), Cfg.of(
        "column" -> "c_name", "key" -> key32, "output_column" -> "enc")))
      val dec = DecryptOp(StageContext.one(s, enc, Cfg.of(
        "column" -> "enc", "key" -> key32, "output_column" -> "roundtrip")))
      dec.select("c_custkey", "roundtrip")
    },

    // http.fetch mock mode: deterministic echo of the templated URL —
    // proves template rendering + the mapPartitions harness end-to-end
    QueryDef("http_fetch_mock",
      """SELECT n_nationkey,
        |  '{"mock":true,"url":"https://api.example.com/nations/' || n_nationkey || '"}' AS http_result
        |FROM nation""".stripMargin) { (s, d) =>
      HttpFetchOp(StageContext.one(s, QueryDef.t(s, d, "nation"), Cfg.of(
        "url" -> "https://api.example.com/nations/{{n_nationkey}}",
        "mock" -> true, "concurrency" -> 8)))
        .select("n_nationkey", "http_result")
    },

    // BASELINE.md target #2: executor-side partition-parallel IO gives the
    // reference's claimed >=10x concurrency speedup. 64 rows against a
    // mocked 60 ms "API": sequential = 1 partition x concurrency 1
    // (64 x 60 ms ~= 3.8 s); parallel = 8 partitions x concurrency 8 = 64
    // in flight, one ~60 ms wave plus scheduling overhead (~13x).
    // BENCH_r{N}.json shows both timings; results are identical and
    // oracle-checked.
    QueryDef("enrich_sequential",
      """SELECT c_custkey,
        |  '{"mock":true,"url":"https://api.example.com/c/' || c_custkey || '"}' AS http_result
        |FROM customer WHERE c_custkey <= 64""".stripMargin) { (s, d) =>
      HttpFetchOp(StageContext.one(s,
        QueryDef.t(s, d, "customer").filter(F.col("c_custkey") <= 64).coalesce(1), Cfg.of(
          "url" -> "https://api.example.com/c/{{c_custkey}}",
          "mock" -> true, "mock_latency_ms" -> 60, "concurrency" -> 1)))
        .select("c_custkey", "http_result")
    },
    QueryDef("enrich_parallel",
      """SELECT c_custkey,
        |  '{"mock":true,"url":"https://api.example.com/c/' || c_custkey || '"}' AS http_result
        |FROM customer WHERE c_custkey <= 64""".stripMargin) { (s, d) =>
      HttpFetchOp(StageContext.one(s,
        QueryDef.t(s, d, "customer").filter(F.col("c_custkey") <= 64).repartition(8), Cfg.of(
          "url" -> "https://api.example.com/c/{{c_custkey}}",
          "mock" -> true, "mock_latency_ms" -> 60, "concurrency" -> 8)))
        .select("c_custkey", "http_result")
    },

    // ai.generate mock mode: deterministic templated response
    QueryDef("ai_generate_mock",
      """SELECT r_regionkey,
        |  '[mock:openai/test-model] Summarize region ' || r_name AS summary
        |FROM region""".stripMargin) { (s, d) =>
      AiGenerateOp(StageContext.one(s, QueryDef.t(s, d, "region"), Cfg.of(
        "provider" -> "openai", "model" -> "test-model",
        "prompt" -> "Summarize region {{r_name}}",
        "output_column" -> "summary", "mock" -> true)))
        .select("r_regionkey", "summary")
    },

    // the offline vector pipeline end-to-end: ai.embed (deterministic mock
    // vectors) -> index.build type=ivfpq -> knn.ivf with covering rerank.
    // Rows-only: the vectors are engine-defined (splitmix64 mock), so no
    // SQL oracle can reproduce them — the exhaustive-parity property is
    // pinned in AiEmbedSpec instead (index probe == brute force over the
    // same embedded frame).
    QueryDef.noOracle("ai_embed_knn") { (s, d) =>
      val embedded = AiEmbedOp(StageContext.one(s, QueryDef.t(s, d, "documents"), Cfg.of(
        "mock" -> true, "dim" -> 32)))
        .select("doc_id", "embedding")
      val idx = java.nio.file.Files.createTempDirectory("graft_embed_idx").toString
      IndexBuildOp(StageContext.one(s, embedded, Cfg.of(
        "type" -> "ivfpq", "path" -> idx, "vector_column" -> "embedding",
        "nlist" -> 16, "m" -> 8, "ksub" -> 16, "seed" -> 11)))
      KnnIvfOp(StageContext.one(s, embedded, Cfg.of(
        "query_id" -> 0, "id_column" -> "doc_id", "k" -> 10,
        "nprobe" -> 4, "rerank" -> 4, "index_path" -> idx)))
    }
  )
}
