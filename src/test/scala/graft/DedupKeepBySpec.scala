package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators._

/** keep_by survivor policy for the near-dup families: the
  * highest-quality duplicate survives (ties → lower id) instead of the
  * lowest id, across exact groups, pairwise drops, and transitive
  * components. */
class DedupKeepBySpec extends SparkSpec {
  import spark.implicits._

  private val longA = (1 to 30).map(i => s"atok$i").mkString(" ")
  private val longB = (1 to 30).map(i => s"btok$i").mkString(" ")

  // 1,2 exact dups (quality favors 2); 3,4 near dups (quality favors 4);
  // 10 unrelated
  private def docs = Seq(
    (1L, longA, 1.0), (2L, longA, 9.0),
    (3L, longB + " x", 5.0), (4L, longB + " y", 7.0),
    (10L, "completely different words entirely unrelated content here", 3.0)
  ).toDF("doc_id", "text", "quality")

  private def minhash(df: org.apache.spark.sql.DataFrame, cfg: (String, Any)*) =
    DedupMinHashOp(StageContext.one(spark, df, Cfg.of(Seq[(String, Any)](
      "id_column" -> "doc_id", "text_column" -> "text",
      "threshold" -> 0.8) ++ cfg: _*)))
      .select("doc_id").as[Long].collect().sorted.toSeq

  test("keep_by keeps the best exact copy and the best near-dup") {
    assert(minhash(docs) === Seq(1L, 3L, 10L)) // default: min ids
    assert(minhash(docs, "keep_by" -> "quality") === Seq(2L, 4L, 10L))
    assert(minhash(docs, "keep_by" -> "quality", "keep_best" -> "min") ===
      Seq(1L, 3L, 10L))
    intercept[GraftConfigError](minhash(docs, "keep_by" -> "quality", "keep_best" -> "most"))
  }

  test("quality ties fall back to the min-id policy exactly") {
    val flat = docs.withColumn("quality", F.lit(1.0))
    assert(minhash(flat, "keep_by" -> "quality") === minhash(flat))
  }

  test("transitive components keep exactly the best member") {
    // 5~6~7 one chain (all pairwise-near here), qualities favor 6
    val chain = Seq(
      (5L, longB + " p", 1.0), (6L, longB + " q", 9.0), (7L, longB + " r", 2.0),
      (10L, "completely different words entirely unrelated content here", 3.0)
    ).toDF("doc_id", "text", "quality")
    assert(minhash(chain, "transitive" -> true) === Seq(5L, 10L))
    assert(minhash(chain, "transitive" -> true, "keep_by" -> "quality") ===
      Seq(6L, 10L))
  }

  test("keep_by works across the other near-dup families") {
    val pair = Seq(
      (1L, longB + " m", 1.0), (2L, longB + " n", 8.0),
      (10L, "completely different words entirely unrelated content here", 3.0)
    ).toDF("doc_id", "text", "quality")
    val ngram = DedupNgramOp(StageContext.one(spark, pair, Cfg.of(
      "id_column" -> "doc_id", "text_column" -> "text",
      "threshold" -> 0.7, "keep_by" -> "quality")))
      .select("doc_id").as[Long].collect().sorted
    assert(ngram === Array(2L, 10L))
    val simhash = DedupSimHashOp(StageContext.one(spark, pair, Cfg.of(
      "id_column" -> "doc_id", "text_column" -> "text",
      "max_distance" -> 10L, "keep_by" -> "quality")))
      .select("doc_id").as[Long].collect().sorted
    assert(simhash === Array(2L, 10L))
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f, 0.0f), 1.0), (2L, Array(1.0f, 0.0f, 0.01f), 8.0),
      (10L, Array(0.0f, 1.0f, 0.0f), 3.0)
    ).toDF("vec_id", "embedding", "quality")
    val emb = DedupEmbeddingOp(StageContext.one(spark, vecs, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "threshold" -> 0.95, "dim" -> 3, "keep_by" -> "quality")))
      .select("vec_id").as[Long].collect().sorted
    assert(emb === Array(2L, 10L))
  }

  test("transitive keep_by matches brute-force argmax over random qualities") {
    // fixed near-dup clusters, randomized qualities: component survivor
    // must always be the (max quality, min id) member
    val clusters = Seq(Seq(1L, 2L, 3L), Seq(4L, 5L), Seq(6L))
    val texts = Map(
      1L -> (longA + " a1"), 2L -> (longA + " a2"), 3L -> (longA + " a3"),
      4L -> (longB + " b1"), 5L -> (longB + " b2"),
      6L -> "completely different words entirely unrelated content here")
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val quality = texts.keys.map(id => id -> rnd.nextInt(3).toDouble).toMap
      val df = texts.toSeq.map { case (id, t) => (id, t, quality(id)) }
        .toDF("doc_id", "text", "quality")
      val expected = clusters.map(c =>
        c.map(id => (-quality(id), id)).min._2).sorted
      val got = minhash(df, "transitive" -> true, "keep_by" -> "quality")
      assert(got === expected, s"trial $trial qualities=$quality")
    }
  }

  test("null quality always loses") {
    val withNull = Seq(
      (1L, longA, Some(5.0)), (2L, longA, None: Option[Double]),
      (10L, "completely different words entirely unrelated content here", Some(1.0))
    ).toDF("doc_id", "text", "quality")
    assert(minhash(withNull, "keep_by" -> "quality") === Seq(1L, 10L))
  }
}
