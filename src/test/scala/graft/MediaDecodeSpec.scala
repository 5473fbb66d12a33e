package graft

import org.apache.spark.sql.{functions => F}
import graft.config.Cfg
import graft.core.StageContext
import graft.multimodal._

/** Real JDK-codec media decode: image.decode, audio.decode, and
  * media.features' image/audio paths. */
class MediaDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (seed * 2654435761L).toInt + x * 65536 + y * 256)
    MediaCodec.pngBytes(img)
  }

  private def wav(frames: Int, rate: Float, freq: Double): Array[Byte] = {
    val data = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * 16000).toInt.toShort
      data(i * 2) = (s & 0xff).toByte
      data(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("image.decode reads real PNG dimensions; corrupt blobs yield nulls") {
    val df = Seq(
      (1L, png(12, 7, 1)),
      (2L, png(3, 9, 2)),
      (3L, "not an image".getBytes)
    ).toDF("id", "blob")
    val out = ImageDecodeOp(StageContext.one(spark, df, Cfg.of("column" -> "blob")))
      .select("id", "img_width", "img_height", "img_channels")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
      .sortBy(_._1)
    assert(out(0) === ((1L, Some(12), Some(7), Some(3))))
    assert(out(1) === ((2L, Some(3), Some(9), Some(3))))
    assert(out(2) === ((3L, None, None, None)))
  }

  test("image.decode resize emits a decodable thumbnail of the target size") {
    val df = Seq((1L, png(32, 16, 5))).toDF("id", "blob")
    val out = ImageDecodeOp(StageContext.one(spark, df, Cfg.of(
      "column" -> "blob", "resize" -> Seq(8L, 4L))))
      .select("thumb").head().getAs[Array[Byte]](0)
    val back = MediaCodec.decodeImage(out).get
    assert(back.getWidth === 8 && back.getHeight === 4)
  }

  test("audio.decode parses WAV PCM metadata; RMS features track loudness") {
    val df = Seq(
      (1L, wav(8000, 8000f, 440.0)),   // 1 s of 440 Hz
      (2L, "junk".getBytes)
    ).toDF("id", "blob")
    val out = AudioDecodeOp(StageContext.one(spark, df, Cfg.of("column" -> "blob")))
      .select("id", "sample_rate", "audio_channels", "n_frames", "duration_s")
      .collect().sortBy(_.getLong(0))
    assert(out(0).getDouble(1) === 8000.0)
    assert(out(0).getInt(2) === 1)
    assert(out(0).getLong(3) === 8000L)
    assert(math.abs(out(0).getDouble(4) - 1.0) < 1e-9)
    assert(out(1).isNullAt(1) && out(1).isNullAt(4))

    // sine RMS ≈ amplitude/sqrt(2) = (16000/32768)/1.414 ≈ 0.345
    val feats = FeatureExtractOp(StageContext.one(spark,
      Seq((1L, wav(8000, 8000f, 440.0))).toDF("id", "blob"),
      Cfg.of("column" -> "blob", "kind" -> "audio", "feature_dim" -> 8)))
      .select("features").head().getSeq[Float](0)
    assert(feats.length === 8)
    assert(feats.forall(v => v > 0.3f && v < 0.4f), feats.mkString(","))
  }

  test("media.features auto: image → tiny-image grayscale in [0,1], not the stub") {
    val blob = png(20, 20, 9)
    val df = Seq((1L, blob)).toDF("id", "blob")
    def run(kind: String) = FeatureExtractOp(StageContext.one(spark, df, Cfg.of(
      "column" -> "blob", "kind" -> kind, "feature_dim" -> 16)))
      .select("features").head().getSeq[Float](0)
    val auto = run("auto"); val image = run("image"); val stub = run("stub")
    assert(auto === image)
    assert(auto !== stub)
    assert(auto.forall(v => v >= 0.0f && v <= 1.0f))
    // unknown format falls back to the stub path
    val junk = Seq((1L, "??".getBytes)).toDF("id", "blob")
    val fb = FeatureExtractOp(StageContext.one(spark, junk, Cfg.of(
      "column" -> "blob", "feature_dim" -> 16))).select("features").head().getSeq[Float](0)
    assert(fb.length === 16)
  }
}
