package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators._

class CryptoSpec extends SparkSpec {
  import spark.implicits._

  private val key16 = "0123456789abcdef"
  private val key32 = "0123456789abcdef0123456789abcdef"

  private def sensitive = Seq(
    ("a@x.com", "4111-1111", "123-45-6789"),
    ("b@y.org", "5500-0004", "987-65-4321")).toDF("email", "credit_card", "ssn")

  test("round-trip for all three algorithms") {
    for ((alg, key) <- Seq("aes-128-gcm" -> key16, "aes-256-gcm" -> key32,
                           "chacha20-poly1305" -> key32)) {
      val enc = EncryptOp(StageContext.one(spark, sensitive, Cfg.of(
        "column" -> "ssn", "key" -> key, "algorithm" -> alg, "output_column" -> "e")))
      val dec = DecryptOp(StageContext.one(spark, enc, Cfg.of(
        "column" -> "e", "key" -> key, "algorithm" -> alg, "output_column" -> "d")))
      val rows = dec.select("ssn", "d").collect()
      assert(rows.forall(r => r.getString(0) == r.getString(1)), s"round-trip failed for $alg")
    }
  }

  test("wire format: base64(12-byte nonce || ciphertext+tag), unique nonces") {
    val enc = EncryptOp(StageContext.one(spark, sensitive, Cfg.of(
      "column" -> "ssn", "key" -> key32, "output_column" -> "e")))
    val vals = enc.select("e").collect().map(_.getString(0))
    vals.foreach { v =>
      val bytes = java.util.Base64.getDecoder.decode(v)
      // 12 nonce + plaintext + 16 GCM tag
      assert(bytes.length >= 12 + 16)
    }
    // re-encrypting produces different ciphertexts (random nonce per value)
    val enc2 = EncryptOp(StageContext.one(spark, sensitive, Cfg.of(
      "column" -> "ssn", "key" -> key32, "output_column" -> "e")))
    assert(enc.select("e").head().getString(0) != enc2.select("e").head().getString(0))
  }

  test("default output column name is {col}_encrypted") {
    val enc = EncryptOp(StageContext.one(spark, sensitive, Cfg.of(
      "column" -> "email", "key" -> key32)))
    assert(enc.columns.contains("email_encrypted"))
  }

  test("wrong key / corrupt input decrypt to null, never throw") {
    val enc = EncryptOp(StageContext.one(spark, sensitive, Cfg.of(
      "column" -> "ssn", "key" -> key32, "output_column" -> "e")))
    val wrongKey = DecryptOp(StageContext.one(spark, enc, Cfg.of(
      "column" -> "e", "key" -> "ffffffffffffffffffffffffffffffff", "output_column" -> "d")))
    assert(wrongKey.select("d").collect().forall(_.isNullAt(0)))
    val garbage = Seq("not-base64!!", "aGVsbG8=").toDF("e")
    val dec = DecryptOp(StageContext.one(spark, garbage, Cfg.of(
      "column" -> "e", "key" -> key32, "output_column" -> "d")))
    assert(dec.select("d").collect().forall(_.isNullAt(0)))
  }

  test("key length validated per algorithm (reference encrypt.rs:198-206)") {
    intercept[GraftConfigError](EncryptOp(StageContext.one(spark, sensitive,
      Cfg.of("column" -> "ssn", "key" -> "short", "algorithm" -> "aes-256-gcm"))))
    intercept[GraftConfigError](EncryptOp(StageContext.one(spark, sensitive,
      Cfg.of("column" -> "ssn", "key" -> key32, "algorithm" -> "aes-128-gcm"))))
    intercept[GraftConfigError](EncryptOp(StageContext.one(spark, sensitive,
      Cfg.of("column" -> "ssn", "key" -> key32, "algorithm" -> "rot13"))))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
  private def docs = Seq(
    (0L, base),
    (1L, base),                                   // exact dup of 0
    (2L, base.replace("quick", "rapid")),         // near dup of 0
    (3L, "completely different content about spark catalyst optimizer rules and physical plans"),
    (4L, "yet another unrelated document mentioning parquet files and shuffle partitions today"))
    .toDF("doc_id", "text")

  test("dedup.exact drops exact duplicates only") {
    val out = DedupExactOp(StageContext.one(spark, docs, Cfg.of(
      "columns" -> Seq("text"), "keep" -> "first", "order_by" -> Seq("doc_id"))))
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 2L, 3L, 4L))
  }

  test("dedup.minhash drops exact and near duplicates, keeps distinct docs") {
    val out = DedupMinHashOp(StageContext.one(spark, docs, Cfg.of(
      "id_column" -> "doc_id", "text_column" -> "text",
      "shingle_size" -> 2, "num_hashes" -> 64, "bands" -> 32, "threshold" -> 0.5)))
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 3L, 4L))
  }

  test("dedup.simhash drops near-identical, keeps distinct") {
    val out = DedupSimHashOp(StageContext.one(spark, docs, Cfg.of(
      "id_column" -> "doc_id", "text_column" -> "text", "max_distance" -> 6)))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L))          // exact dup must go (hamming 0)
    assert(kept.contains(0L) && kept.contains(3L) && kept.contains(4L))
  }

  test("dedup.ngram drops near duplicates by char-ngram jaccard") {
    val out = DedupNgramOp(StageContext.one(spark, docs, Cfg.of(
      "id_column" -> "doc_id", "text_column" -> "text",
      "ngram_size" -> 4, "bands" -> 16, "threshold" -> 0.6)))
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 3L, 4L))
  }

  test("dedup.embedding drops cosine-near vectors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.01f, 0.0f, 0.0f)),  // ~same direction as 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = DedupEmbeddingOp(StageContext.one(spark, vecs, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "threshold" -> 0.99, "num_planes" -> 16, "blocks" -> 8)))
    assert(out.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 2L, 3L))
  }

  test("dedup.embedding blocking=bands: same drops, banded candidates, rejections") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.01f, 0.0f, 0.0f)),  // ~same direction as 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)))     // exact copy of 2
      .toDF("vec_id", "embedding")
    def run(extra: (String, Any)*) =
      DedupEmbeddingOp(StageContext.one(spark, vecs, Cfg.of(
        (Seq[(String, Any)]("id_column" -> "vec_id", "vector_column" -> "embedding",
          "threshold" -> 0.99, "blocking" -> "bands", "seed" -> 3) ++ extra): _*)))
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    // near-exact pair (0,1) and exact pair (2,4): p^r per band ≈ 1 for
    // both, so banded recall matches pigeonhole here
    assert(run() === Seq(0L, 2L, 3L))
    // keep_by / transitive plumbing is shared with pigeonhole
    assert(run("transitive" -> true) === Seq(0L, 2L, 3L))
    // rejections: bad blocking name, band_planes out of range, and
    // bands blocking against a pigeonhole-partitioned index
    intercept[graft.config.GraftConfigError] { run("blocking" -> "nope") }
    // pigeonhole rejects a non-divisible width loudly (trailing plane
    // bits would silently be ignored); bands never uses num_planes/blocks
    intercept[graft.config.GraftConfigError] {
      DedupEmbeddingOp(StageContext.one(spark, vecs, Cfg.of(
        "id_column" -> "vec_id", "vector_column" -> "embedding",
        "num_planes" -> 30, "blocks" -> 4)))
    }
    assert(run("num_planes" -> 30, "blocks" -> 4) === Seq(0L, 2L, 3L))
    intercept[graft.config.GraftConfigError] { run("band_planes" -> 64) }
    intercept[graft.config.GraftConfigError] { run("bands" -> 0) }
    // blocking=bands WITH index_path is supported since r7 (the banded
    // incremental probe — BandedIndexSpec), so a missing index is now the
    // ordinary loud plan error, not a config rejection
    intercept[graft.core.GraftPlanError] {
      DedupEmbeddingOp(StageContext.one(spark, vecs, Cfg.of(
        "id_column" -> "vec_id", "vector_column" -> "embedding",
        "blocking" -> "bands", "index_path" -> "/tmp/no_such_index")))
    }
  }

  test("transitive=true collapses chained near-dups to one representative") {
    // chain: v1 ~ v3 and v2 ~ v3 but v1 !~ v2 (15° / 15° / 30° apart,
    // threshold 0.95: cos15°=0.966 ≥ t, cos30°=0.866 < t)
    val a15 = math.toRadians(15); val a30 = math.toRadians(30)
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(math.cos(a30).toFloat, math.sin(a30).toFloat, 0.0f, 0.0f)),
      (3L, Array(math.cos(a15).toFloat, math.sin(a15).toFloat, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    def run(extra: (String, Any)*) =
      DedupEmbeddingOp(StageContext.one(spark, vecs, Cfg.of(
        (Seq[(String, Any)]("id_column" -> "vec_id", "vector_column" -> "embedding",
          "threshold" -> 0.95, "num_planes" -> 32, "blocks" -> 4, "seed" -> 11) ++ extra): _*)))
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    // pairwise: only direct matches of a lower id drop → v3 dropped (1~3),
    // v2 SURVIVES (its only match is v3, which is higher-id)
    assert(run() === Seq(1L, 2L, 4L))
    // transitive: {1,2,3} is one component via the chain → min id survives
    assert(run("transitive" -> true) === Seq(1L, 4L))
  }
}

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("langid identifies real sentences per language") {
    val df = Seq(
      (1L, "the cat sat on the mat and it was happy with this"),
      (2L, "der Hund ist nicht mit der Katze auf das Sofa gegangen"),
      (3L, "le chat est dans la maison et il est content pour les enfants"),
      (4L, "el perro es un animal y la casa es grande para los gatos"),
      (5L, "zzz qqq xxx www")).toDF("id", "text")
    val out = LangIdOp(StageContext.one(spark, df, Cfg.of("column" -> "text")))
      .select("id", "lang_pred").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en"); assert(out(2L) == "de")
    assert(out(3L) == "fr"); assert(out(4L) == "es")
    assert(out(5L) == "und")
  }

  test("text stats compute expected values") {
    val df = Seq((1L, "Hello world, this has 7 words!")).toDF("id", "text")
    val r = TextStatsOp(StageContext.one(spark, df, Cfg.of("column" -> "text"))).head()
    assert(r.getAs[Long]("n_chars_calc") == 30L)
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Double]("punct_ratio") > 0.0)
    assert(r.getAs[Double]("digit_ratio") > 0.0)
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq((1L, "tokenization splits longwords")).toDF("id", "text")
    val r = TokenCountOp(StageContext.one(spark, df, Cfg.of("column" -> "text"))).head()
    assert(r.getAs[Long]("ws_tokens") == 3L)
    // tokenization -> toke|niza|tion(3) ; splits -> spli|ts(2) ; longwords -> long|word|s(3)
    assert(r.getAs[Long]("bpeish_tokens") == 8L)
  }

  test("quality score in [0,1]; clean prose scores higher than noise") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and this is a fine sentence with many of the words that people use"),
      (2L, "@@@@ #### 1234 5678 !!!! %%%% ^^^^ &&&& **** ((((")).toDF("id", "text")
    val out = QualityScoreOp(StageContext.one(spark, df, Cfg.of("column" -> "text")))
      .select("id", "quality").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(1L) > out(2L))
  }

  test("fingerprint is whitespace/case-normalized and deterministic") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world"), (3L, "different")).toDF("id", "text")
    val out = FingerprintOp(StageContext.one(spark, df, Cfg.of("column" -> "text")))
      .select("id", "fingerprint").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("knn bruteforce returns self first, correct ordering") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = KnnBruteForceOp(StageContext.one(spark, vecs, Cfg.of(
      "query_id" -> 0, "k" -> 3))).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(out(0).getDouble(1) == 1.0)
  }

  test("knn lsh finds the near neighbor of the query") {
    val vecs = (0L to 50L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 7.0 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = KnnBruteForceOp(StageContext.one(spark, vecs, Cfg.of("query_id" -> 0, "k" -> 3)))
      .collect().map(_.getLong(0)).toSet
    val approx = KnnLshOp(StageContext.one(spark, vecs, Cfg.of(
      "query_id" -> 0, "k" -> 10, "num_planes" -> 16, "blocks" -> 8)))
      .collect().map(_.getLong(0)).toSet
    assert(approx.contains(0L))             // query itself always in its own buckets
    assert((exact & approx).size >= 2)      // decent recall on tiny data
  }

  test("knn ivf: full probe equals brute force; partial probe keeps the query's cell") {
    val vecs = (0L to 50L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 7.0 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = KnnBruteForceOp(StageContext.one(spark, vecs, Cfg.of("query_id" -> 0, "k" -> 5)))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // nprobe = nlist probes every cell -> must match brute force exactly
    val full = KnnIvfOp(StageContext.one(spark, vecs, Cfg.of(
      "query_id" -> 0, "k" -> 5, "nlist" -> 4, "nprobe" -> 4, "seed" -> 3)))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === exact)
    // partial probe always includes the query's own cell -> self is top-1
    val partial = KnnIvfOp(StageContext.one(spark, vecs, Cfg.of(
      "query_id" -> 0, "k" -> 5, "nlist" -> 8, "nprobe" -> 2, "seed" -> 3)))
      .collect().map(_.getLong(0)).toSeq
    assert(partial.head === 0L)
  }

  test("binary meta sniffs magic numbers") {
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2)
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A)
    val df = Seq((1L, jpeg), (2L, png), (3L, "plain".getBytes)).toDF("id", "blob")
    val out = graft.multimodal.BinaryMetaOp(StageContext.one(spark, df, Cfg.of("column" -> "blob")))
      .select("id", "blob_type", "blob_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("jpeg", 6L))
    assert(out(2L) == ("png", 6L))
    assert(out(3L) == ("unknown", 5L))
  }

  test("media features: deterministic stub vectors with declared dim") {
    val df = Seq((1L, "blob-a".getBytes), (2L, "blob-a".getBytes), (3L, "blob-b".getBytes))
      .toDF("id", "blob")
    val out = graft.multimodal.FeatureExtractOp(StageContext.one(spark, df, Cfg.of(
      "column" -> "blob", "feature_dim" -> 16)))
      .select("id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out.values.forall(_.size == 16))
    assert(out(1L) == out(2L))  // same bytes → same features
    assert(out(1L) != out(3L))
  }
}

class CosineExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim native expression: correct values, stays in WholeStageCodegen") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (1L, Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)),
      (3L, Array(3.0, 4.0, 0.0), Array(6.0, 8.0, 0.0))).toDF("id", "a", "b")
    val out = df.selectExpr("id", "cosine_sim(a, b) AS c").orderBy("id")
    val vals = out.collect().map(_.getDouble(1)).toSeq
    assert(math.abs(vals(0) - 1.0) < 1e-12)
    assert(math.abs(vals(1)) < 1e-12)
    assert(math.abs(vals(2) - 1.0) < 1e-12)
    // codegen check on a non-foldable source (a local Seq constant-folds
    // into LocalTableScan — which itself proves interpreted eval works):
    // the projection with cosine_sim stays inside one WholeStageCodegen span
    // arrays built from scalar exprs (array-of-lambdas like transform()
    // are CodegenFallback and would break the span regardless of cosine_sim)
    val a = F.array((0 until 16).map(j => F.sin(F.col("id") + F.lit(j))): _*)
    val b = F.array((0 until 16).map(j => F.cos(F.col("id") + F.lit(j))): _*)
    val big = spark.range(100).select(F.col("id"), a.alias("a"), b.alias("b"))
      .selectExpr("id", "cosine_sim(a, b) AS c")
    assert(big.count() == 100)
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val codegenSpans = big.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w.toString
    }
    assert(codegenSpans.exists(_.contains("cosine_sim")),
      s"cosine_sim not inside a WholeStageCodegen span:\n${big.queryExecution.executedPlan}")
    // null propagation
    val withNull = Seq((1L, null.asInstanceOf[Array[Double]], Array(1.0))).toDF("id", "a", "b")
    assert(withNull.selectExpr("cosine_sim(a, b)").head().isNullAt(0))
  }

  test("cosine_sim matches the tight-loop UDF bit for bit") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 3.7 + j)),
        Array.tabulate(16)(j => math.cos(i * 1.3 + j)))
    }.toDF("id", "a", "b")
    val expr = vecs.selectExpr("id", "cosine_sim(a, b) AS c").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaUdf = vecs.select($"id",
      graft.operators.DedupEmbeddingOp.cosineUdf($"a", $"b").alias("c")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(expr == viaUdf) // identical accumulation order -> identical bits
  }
}
