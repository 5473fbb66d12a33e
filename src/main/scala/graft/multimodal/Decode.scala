package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types._
import graft.config._
import graft.core._

/** REAL media decode on pure-JDK codecs — no external image/audio libs
  * needed: javax.imageio decodes PNG/JPEG/BMP/GIF/WBMP and
  * javax.sound.sampled parses WAV/AIFF/AU PCM. Video (and exotic codecs)
  * remain the one stubbed family, now clearly isolated in
  * [[FeatureExtractOp.decodeToFeatures]]'s fallback.
  *
  * Shared harness shape: mapPartitions, decoder state per partition,
  * `null` row output columns on undecodable blobs (corrupt data must not
  * kill a 100 TB job — filter on the null afterwards; binary.meta is the
  * cheap pre-filter).
  */
object MediaCodec {
  /** Magic-number sniff — lets `auto` mode skip codec attempts entirely on
    * blobs that cannot be media (a failed ImageIO probe still costs reader
    * discovery per call; over millions of text blobs that dominates). */
  def looksLikeImage(b: Array[Byte]): Boolean = b.length >= 4 && (
    (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||  // png
    (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) || // jpeg
    (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||          // gif
    (b(0) == 'B' && b(1) == 'M'))                                          // bmp
  def looksLikeAudio(b: Array[Byte]): Boolean = b.length >= 4 && (
    (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||          // wav
    (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||          // aiff
    (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))            // au

  /** Decode an image blob → (width, height, channels, BufferedImage). */
  def decodeImage(blob: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob)))
    catch { case _: Exception => None }

  def resize(img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Tiny-image descriptor: g×g bilinear grayscale thumbnail, row-major,
    * values in [0,1]; the first `dim` cells (g = ceil(sqrt(dim))). The
    * classic cheap near-dup / similarity feature for images. */
  def tinyImageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    val thumb = resize(img, g, g)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val rgb = thumb.getRGB(i % g, i / g)
      val r = (rgb >> 16) & 0xff; val gr = (rgb >> 8) & 0xff; val b = rgb & 0xff
      out(i) = (0.299f * r + 0.587f * gr + 0.114f * b) / 255.0f
      i += 1
    }
    out
  }

  final case class AudioMeta(sampleRate: Float, channels: Int, frames: Long,
      samples: Array[Float])

  /** Decode a WAV/AIFF/AU PCM blob → metadata + mono samples in [-1,1]. */
  def decodeAudio(blob: Array[Byte]): Option[AudioMeta] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        val fmt = in.getFormat
        val bytes = in.readAllBytes()
        val ch = fmt.getChannels
        val bps = fmt.getSampleSizeInBits / 8
        if (bps != 2 && bps != 1) return None   // 8/16-bit PCM only
        val frameCount = bytes.length / (bps * ch)
        val mono = new Array[Float](frameCount)
        val be = fmt.isBigEndian
        var f = 0
        while (f < frameCount) {
          var acc = 0.0f
          var c = 0
          while (c < ch) {
            val off = (f * ch + c) * bps
            val v =
              if (bps == 2) {
                val s = if (be) ((bytes(off) << 8) | (bytes(off + 1) & 0xff))
                        else ((bytes(off + 1) << 8) | (bytes(off) & 0xff))
                s.toShort / 32768.0f
              } else (((bytes(off) & 0xff) - 128) / 128.0f)
            acc += v; c += 1
          }
          mono(f) = acc / ch; f += 1
        }
        Some(AudioMeta(fmt.getSampleRate, ch, frameCount.toLong, mono))
      } finally in.close()
    } catch { case _: Exception => None }

  /** RMS energy over `dim` equal windows — the cheap audio descriptor. */
  def rmsFeatures(samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    val win = math.max(1, samples.length / dim)
    var w = 0
    while (w < dim) {
      val from = w * win
      val until = if (w == dim - 1) samples.length else math.min(samples.length, from + win)
      var acc = 0.0
      var i = from
      while (i < until) { acc += samples(i) * samples(i); i += 1 }
      out(w) = if (until > from) math.sqrt(acc / (until - from)).toFloat else 0.0f
      w += 1
    }
    out
  }
}

/** image.decode — decode an image binary column (PNG/JPEG/BMP/GIF via
  * javax.imageio): adds img_width, img_height, img_channels (nulls when
  * undecodable); `resize = [w, h]` additionally emits `thumb` — the
  * PNG-encoded bilinear-resized image, ready for a downstream embed step.
  */
object ImageDecodeOp extends Stage {
  val name = "image.decode"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val col = cfg.str("column")
    val resizeTo: Option[(Int, Int)] = cfg.arrOpt("resize").map {
      case Vector(CLong(w), CLong(h)) => (w.toInt, h.toInt)
      case o => throw new GraftConfigError(s"resize: expected [w, h], got $o")
    }
    val df = ctx.primary
    val colIdx = df.schema.fieldIndex(col)
    val extra = Seq(
      StructField("img_width", IntegerType, nullable = true),
      StructField("img_height", IntegerType, nullable = true),
      StructField("img_channels", IntegerType, nullable = true)) ++
      resizeTo.map(_ => StructField("thumb", BinaryType, nullable = true))
    val outSchema = StructType(df.schema.fields ++ extra)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val blob = if (row.isNullAt(colIdx)) null else row.getAs[Array[Byte]](colIdx)
        val img = Option(blob).flatMap(MediaCodec.decodeImage)
        val base = img match {
          case Some(i) =>
            Seq(i.getWidth, i.getHeight, i.getColorModel.getNumComponents)
          case None => Seq(null, null, null)
        }
        val thumb = resizeTo.map { case (w, h) =>
          img.map(i => MediaCodec.pngBytes(MediaCodec.resize(i, w, h))).orNull
        }
        Row.fromSeq(row.toSeq ++ base ++ thumb.toSeq)
      }
    }(enc)
  }
}

/** audio.decode — parse a WAV/AIFF/AU PCM binary column via
  * javax.sound.sampled: adds sample_rate (double), audio_channels,
  * n_frames, duration_s (nulls when undecodable).
  */
object AudioDecodeOp extends Stage {
  val name = "audio.decode"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val col = ctx.cfg.str("column")
    val df = ctx.primary
    val colIdx = df.schema.fieldIndex(col)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", DoubleType, nullable = true),
      StructField("audio_channels", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("duration_s", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val blob = if (row.isNullAt(colIdx)) null else row.getAs[Array[Byte]](colIdx)
        Option(blob).flatMap(MediaCodec.decodeAudio) match {
          case Some(m) =>
            // Seq[Any] — a plain Seq would numerically widen Int/Long to Double
            Row.fromSeq(row.toSeq ++ Seq[Any](m.sampleRate.toDouble, m.channels, m.frames,
              m.frames / m.sampleRate.toDouble))
          case None => Row.fromSeq(row.toSeq ++ Seq(null, null, null, null))
        }
      }
    }(enc)
  }
}
