package graft.core

import graft.config.GraftConfigError

/** name → Stage dispatch, mirroring the reference's ModuleRegistry
  * (src/core/registry.rs:23-42, canonical names src/modules/mod.rs:16-120).
  * The reference's FFI/WASM operator plugins are built-ins here; RUNTIME
  * extensibility (third-party stages, reference src/plugin_loader.rs)
  * arrives through `withPlugins` — ServiceLoader over `global.plugins`
  * jars/classes (see [[PluginLoader]]) — with per-stage provenance.
  */
final class Registry(entries: Map[String, Stage], val provenance: Map[String, String]) {
  def this(entries: Map[String, Stage]) =
    this(entries, entries.map { case (k, _) => k -> "builtin" })
  def resolve(function: String): Stage =
    entries.getOrElse(function,
      throw new GraftConfigError(
        s"unknown function '$function'; available: ${entries.keys.toSeq.sorted.mkString(", ")}. " +
        "Third-party stages load via [global] plugins = [\"/path/to/plugin.jar\"|\"com.example.PluginClass\"]"))
  def contains(function: String): Boolean = entries.contains(function)
  def names: Seq[String] = entries.keys.toSeq.sorted
  def add(stage: Stage): Registry = add(stage, "builtin")
  def add(stage: Stage, from: String): Registry =
    new Registry(entries + (stage.name -> stage), provenance + (stage.name -> from))

  /** Register `global.plugins` stages. A plugin may not shadow an existing
    * registration — a pipeline that silently swaps `filter.apply` for
    * third-party code is a debugging trap, so collisions fail loud. */
  def withPlugins(specs: Seq[String]): Registry =
    PluginLoader.load(specs).foldLeft(this) { case (reg, (stage, from)) =>
      if (reg.contains(stage.name))
        throw new GraftConfigError(s"plugin stage '${stage.name}' (from $from) collides with " +
          s"an existing registration (${reg.provenance(stage.name)}); rename the plugin stage")
      reg.add(stage, from)
    }
}

object Registry {
  import graft.operators._
  import graft.sources._
  import graft.sinks._
  import graft.streaming._

  def builtins: Seq[Stage] = Seq(
    // sources (reference §2.1)
    CsvSource, JsonSource, StdinSource, ParquetSource, TableSource, InlineSource,
    // sinks (reference §2.2)
    CsvSink, JsonSink, StdoutSink, ParquetSink, NoopSink, TableSink,
    // relational transforms (reference §2.3)
    FilterOp, SelectOp, MapOp, GroupByOp, ReduceOp, SortOp, DistinctOp,
    ChunkOp, JsonExtractOp, ValidateOp, ProfileOp, ExplodeOp, LimitOp, SampleOp, SplitOp, ShuffleOp,
    RepartitionOp,
    ZOrderOp,
    // streaming (reference §2.4 + §2.1 unregistered sources + event-time upgrades)
    CountWindowOp, AggregateStreamOp, TimeWindowOp, SessionWindowOp,
    StreamDedupOp, StatefulAggOp,
    FileStreamSource, RateStreamSource, StdinStreamSource, StreamWriteSink,
    StreamIngestSink, StreamSketchSink,
    // connectors (reference §2.6-2.7; all native — file-backed offline modes)
    KafkaConsumeSource, KafkaProduceSink, KafkaStreamSource, KafkaCompactOp,
    KafkaStatsOp,
    MongoFindSource, MongoFindOneSource,
    MongoAggregateSource, MongoToObjectIdOp, MongoNormalizeOp, JsEvalOp,
    MongoInsertOneOp, MongoInsertManyOp, MongoUpdateOneOp, MongoUpdateManyOp,
    MongoDeleteOneOp, MongoDeleteManyOp, MongoReplaceOneOp, MongoReplaceManyOp,
    MongoBulkWriteOp,
    ExcelReadSource, ExcelWriteSink,
    // http source family (reference conveyor-plugin-http, implemented natively)
    HttpGetSource, HttpPostSource, HttpPutSource, HttpPatchSource, HttpDeleteSource,
    // reference-name aliases
    new AliasStage("file.watch", FileStreamSource),
    new AliasStage("stdout_stream.write", StreamWriteSink)) ++ Seq(
    // multi-input extensions (SURVEY §2.8)
    JoinOp, UnionOp, IntersectOp, ExceptOp, WindowFnOp, PivotOp,
    AsofJoinOp, RangeJoinOp, CubeOp, SimilarJoinOp, DecontaminateOp,
    DecontaminateEmbeddingOp, MixOp,
    ImportanceSampleOp,
    // row-level transforms (reference §2.5)
    EncryptOp, DecryptOp, HttpFetchOp, AiGenerateOp, AiEmbedOp, ClusterAssignOp,
    // training-data extensions
    DedupExactOp, DedupMinHashOp, DedupSimHashOp, DedupNgramOp, DedupEmbeddingOp,
    TextStatsOp, LangIdOp, QualityScoreOp, TokenCountOp, FingerprintOp,
    RedactOp, RepetitionOp, PackOp, ShardWriteOp, HtmlStripOp, DedupLinesOp, SubstringDedupOp, UrlNormalizeOp,
    TextNormalizeOp, BpeTrainOp, BpeTokenizeOp, GopherQualityOp, LineFilterOp,
    TopKOp, TopKMergeOp, CompressibilityOp,
    PerplexityOp, ChunkTextOp, SentencesOp, QualityClassifierTrainOp, QualityClassifierScoreOp,
    KnnBruteForceOp, KnnJoinOp, KnnLshOp, KnnIvfOp, IndexBuildOp, IndexCompactOp, IndexStatsOp, IndexRecallOp,
    IngestCompactOp, IngestStatsOp,
    graft.multimodal.BinaryMetaOp, graft.multimodal.FeatureExtractOp,
    graft.multimodal.ImageDecodeOp, graft.multimodal.AudioDecodeOp,
    // composition
    SubPipelineOp
  )

  def withDefaults: Registry =
    new Registry(builtins.map(s => s.name -> s).toMap)

  /** The registry a pipeline config asks for: builtins + its
    * `[global] plugins = [...]` entries. */
  def forPipeline(pc: graft.config.PipelineConfig): Registry =
    withDefaults.withPlugins(pc.global.plugins)
}
