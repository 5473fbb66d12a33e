package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types._
import graft.config._
import graft.core._

/** Multimodal plumbing (training-data extension): image/audio/video travel
  * as opaque `binary` columns with typed metadata. The DECODE step is a
  * clearly-marked STUB (no image/audio libs in this container) — everything
  * around it (schema, batch shape, partition sizing, the mapPartitions
  * harness a real decoder plugs into) is real and tested.
  */

/** binary.meta — per-blob metadata: size, magic-number sniff, content hash.
  * Pure native exprs; at scale this is the cheap pre-filter before any
  * expensive decode (drop corrupt/oversized blobs early, before shuffle).
  */
object BinaryMetaOp extends Stage {
  val name = "binary.meta"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val c = F.col(ctx.cfg.str("column"))
    val hexPrefix = F.hex(F.substring(c, 1, 4))
    ctx.primary
      .withColumn("blob_size", F.length(c).cast("long"))
      .withColumn("blob_hash", F.xxhash64(c))
      .withColumn("blob_type",
        F.when(hexPrefix.startsWith("FFD8FF"), "jpeg")
         .when(hexPrefix.startsWith("89504E47"), "png")
         .when(hexPrefix.startsWith("47494638"), "gif")
         .when(hexPrefix.startsWith("52494646"), "riff-wav-avi")
         .when(hexPrefix.startsWith("664C6143"), "flac")
         .when(hexPrefix.startsWith("1A45DFA3"), "mkv-webm")
         .otherwise("unknown"))
  }
}

/** media.features — batched feature extraction over binary blobs via
  * mapPartitions (the Scala analog of mapInPandas: iterator-of-batches in,
  * iterator-of-rows out, one decoder init per partition).
  *
  * STUB DECODE: `decodeToFeatures` derives a deterministic pseudo-feature
  * vector from the blob bytes (seeded by content hash) — the real decoder
  * (JPEG decode → resize → embed, PCM decode → mel spectrogram, …) replaces
  * exactly that one function; the Spark-side contract (schema
  * `features array<float>`, `feature_dim`, per-partition init, bounded
  * batch memory) is the part under test.
  */
object FeatureExtractOp extends Stage {
  val name = "media.features"
  val kind = StageKind.Transform

  /** STUB — stand-in for a real image/audio decoder + feature extractor. */
  def decodeToFeatures(blob: Array[Byte], dim: Int): Array[Float] = {
    var h = 0xcbf29ce484222325L
    blob.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    val out = new Array[Float](dim)
    var i = 0
    var s = h
    while (i < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L // splitmix-ish
      out(i) = ((s >>> 40).toInt / 16777216.0f) - 0.5f
      i += 1
    }
    out
  }

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val col = cfg.str("column")
    val dim = cfg.longOr("feature_dim", 64L).toInt
    val df = ctx.primary
    val colIdx = df.schema.fieldIndex(col)
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // real impl: initialize the decoder ONCE per partition here
      rows.map { row =>
        val blob = if (row.isNullAt(colIdx)) null else row.getAs[Array[Byte]](colIdx)
        val feats = if (blob == null) null else decodeToFeatures(blob, dim)
        Row.fromSeq(row.toSeq :+ feats)
      }
    }(enc)
  }
}
