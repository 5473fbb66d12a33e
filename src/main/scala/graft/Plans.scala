package graft

import org.apache.spark.sql.SparkSession

/** Regenerate docs/PLANS.md: formatted physical plans for the headline
  * operators, the artifact behind the scale claims (pushdown, broadcast,
  * partition pruning, no single-partition exchanges).
  *
  * Run: `sbt "runMain graft.Plans [sfDir] [outFile]"`
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outFile = if (args.length > 1) args(1) else "docs/PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val picks = Seq(
      "q3_shipping_priority" -> "scan → 3-way join → agg → top-k: filters pushed to both fact scans, dimension joins broadcast, TakeOrderedAndProject (no global sort)",
      "asof_prev_order" -> "as-of join: ONE exchange + one sort over the tagged union, single Window node carries all right columns",
      "dedup_minhash" -> "MinHash LSH: banded candidate join on narrow (id, sig) pairs — no cartesian anywhere",
      "knn_ivf_indexed" -> "prebuilt IVF probe: cell IN (...) lands in PartitionFilters — nprobe/nlist of the bytes read",
      "window_count_keyed" -> "per-key count windows: one hash exchange on the key, sort within partitions",
      "rollup_grouping_id" -> "rollup + grouping_id: single Expand + hash aggregate",
      "zorder_then_agg" -> "z-order then agg: one range exchange for the Morton clustering, partial aggregation before the final exchange",
      "quality_perplexity" -> "unigram-LM scoring: vocabulary aggregate with map-side partial combine, 1-row grand-total broadcast, word-key scoring join, doc-id reassembly — no driver collection, no retraining loop",
      "decontaminate_ngram" -> "exact n-gram decontamination: benchmark grams distinct-collapse and BROADCAST to the exploded training side (left-semi), per-doc count, stats-only join-back — the corpus never shuffles whole rows through the gram join",
      "importance_weights" -> "DSIR scoring: two feature-count aggregates (partial combine before each exchange), bucket weight table broadcast to the (id, bucket) stream, per-doc integer sum, stats-only join-back",
      "profile_orders" -> "per-column profiling, exact OPT-IN path (multi-distinct plans a single Expand), unpivoted by one generator — no self-join, no per-column jobs",
      "profile_defaults" -> "per-column profiling, DEFAULT path: HLL distinct + GK-sketch quantiles — fixed-size mergeable buffers, no Expand, no global value buffering",
      "pipeline_corpus_e2e" -> "15-stage corpus-cleaning TOML (incl. the Lee-et-al ExactSubstr step) as ONE plan: fan-out stages (docs, benchmark, annotated) persist once at MEMORY_AND_DISK so bpe.train's compose-time vocab collect and the final sink share the cleaning chain instead of re-running it (r4: 9.7 s → ~5 s with the extra stage)",
      "substring_dedup_remove" -> "exact substring dedup: one fused window-hash UDF pass, one shuffle of narrow (hash, doc, start) rows with map-side partial min/count, duplicated hashes only join back, per-doc rebuild — no cartesian, no wide-row shuffle",
      "quality_score" -> "quality-classifier scoring: explode → BROADCAST vocab join → per-doc quantized-long sum → sigmoid; the corpus never collects, the model is vocab-sized",
      "topk_tokens" -> "Misra-Gries heavy hitters over tokens: the raw token stream exists only inside mapPartitions — the ONLY exchange carries bounded per-partition summary rows into the merge aggregate, then a 1-row broadcast for the N/capacity bound and a top-k",
      "decontaminate_bloom" -> "Bloom-prefiltered decontamination: the broadcast Bloom UDF filter sits UNDER the gram semi-join, so only the ~FPP candidate slice of the exploded corpus reaches the join — results bit-identical to the exact path (same oracle)",
      "dedup_minhash_incremental" -> "incremental dedup against a persisted minhash index: the new batch's banded sigs join the index's (narrow ids+sigs, file list snapshot at plan time), shingles re-attach by id only for surviving candidates — old text is never rescanned or re-hashed",
      "dedup_embedding_bands" -> "banded-LSH embedding dedup (the corpus-scale blocking, BENCH_NOTES r6): band-bucket equi self-join on narrow (band, bucket, id) rows — reduction 2^band_planes per band, a free knob the pigeonhole layout lacks — vectors re-attach by id only for the sparse candidates, exact-cosine verify codegen'd",
      "dedup_embedding_bands_incremental" -> "the r7 composition — banded blocking × incremental index: the batch's band signatures equi-join the bands-partitioned corpus on (band, pband, bsig); (band, pband) are PARTITION columns so the scan prunes to colliding dirs, exact band agreement is the only candidate filter, exact cosine verifies. NOTE (r6 finding 3): index probes verify every band collision instead of pair-deduping first — a pair colliding in c bands costs c codegen'd cosines, which beats an extra shuffle of (id, id) candidates at every scale we measured (ScaleProbe r7); knn.join's index modes follow the same rule since r7 — duplicates collapse inside the bounded per-partition heaps (TreeSet insert) and on the |Q|·partitions·k merged heap output, never via a candidate-stream dedup exchange",
      "knn_join_ivf_exhaustive" -> "batch ANN against the IVF index: each query explodes to its nprobe nearest cells (centroids broadcast in one UDF), the distinct probed cells become a STATIC cell IN (...) partition filter on the scan (PartitionFilters — nprobe/nlist of the bytes), the cell equi-join scores only the pruned slice, per-partition bounded k-heaps truncate before the single exchange",
      "sample_stratified_count" -> "stratified EXACT-k sampling (r8): one hash exchange on the stratum key, one window sort carrying the seeded rand rank, row_number <= per-stratum quota (counts map broadcast as a literal MAP lookup) — no driver work, no per-stratum jobs; the irreducible cost of an exact per-stratum quota is that single stratum-keyed sort"
    )

    val sb = new StringBuilder
    sb ++= "# Physical plans of the headline operators\n\n"
    sb ++= s"Generated by `sbt \"runMain graft.Plans\"` against `$sfDir`.\n"
    sb ++= "Regenerate after touching any of these operators.\n"
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()   // materialize AQE final plan
      sb ++= s"\n## $name\n\n$why\n\n```\n"
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(12000)
      sb ++= "\n```\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"[plans] wrote $outFile")
    spark.stop()
  }
}
