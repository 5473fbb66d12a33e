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
  * REAL decode for images and PCM audio on pure-JDK codecs (see
  * [[MediaCodec]]): images (PNG/JPEG/BMP/GIF) → g×g grayscale tiny-image
  * descriptor; WAV/AIFF/AU → windowed RMS energy. `kind` selects: `auto`
  * (default — sniff, decode, fall back), `image`, `audio` (null features
  * when the blob doesn't decode as the requested kind), or `stub`.
  *
  * STUB fallback: video and unknown formats derive a deterministic
  * pseudo-feature vector from the content hash — the only remaining
  * stand-in (no video codec ships in the JDK), clearly isolated here.
  */
object FeatureExtractOp extends Stage {
  val name = "media.features"
  val kind = StageKind.Transform

  /** STUB — stand-in for formats without a JDK codec (video, exotic). */
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
    val kindSel = cfg.strOr("kind", "auto")
    if (!Set("auto", "image", "audio", "stub").contains(kindSel))
      throw new GraftConfigError(s"media.features kind must be auto|image|audio|stub, got '$kindSel'")
    val df = ctx.primary
    val colIdx = df.schema.fieldIndex(col)
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val blob = if (row.isNullAt(colIdx)) null else row.getAs[Array[Byte]](colIdx)
        val feats: Array[Float] =
          if (blob == null) null
          else kindSel match {
            case "image" => MediaCodec.decodeImage(blob)
              .map(MediaCodec.tinyImageFeatures(_, dim)).orNull
            case "audio" => MediaCodec.decodeAudio(blob)
              .map(m => MediaCodec.rmsFeatures(m.samples, dim)).orNull
            case "stub"  => decodeToFeatures(blob, dim)
            case _ =>       // auto: sniff magic, then decode, then stub
              (if (MediaCodec.looksLikeImage(blob))
                 MediaCodec.decodeImage(blob).map(MediaCodec.tinyImageFeatures(_, dim))
               else if (MediaCodec.looksLikeAudio(blob))
                 MediaCodec.decodeAudio(blob).map(m => MediaCodec.rmsFeatures(m.samples, dim))
               else None)
                .getOrElse(decodeToFeatures(blob, dim))
          }
        Row.fromSeq(row.toSeq :+ feats)
      }
    }(enc)
  }
}
