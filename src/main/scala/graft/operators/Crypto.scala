package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._
import java.security.SecureRandom
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, IvParameterSpec, SecretKeySpec}
import java.util.Base64

/** encrypt.apply / decrypt.apply — per-value authenticated encryption of a
  * string column (reference src/modules/transforms/encrypt.rs:57-552,
  * decrypt.rs): algorithms aes-128-gcm / aes-256-gcm (default) /
  * chacha20-poly1305; key = UTF-8 string of EXACTLY 16/32/32 bytes
  * (encrypt.rs:198-206 validates length); random 12-byte nonce per value;
  * wire format = base64(nonce ‖ ciphertext+tag) (encrypt.rs:321-325).
  * Decrypt returns null per value on failure (reference behavior).
  *
  * JDK implementation: AES/GCM/NoPadding and the JDK-11+ native
  * ChaCha20-Poly1305 cipher — byte-compatible with the reference's RustCrypto
  * output (same AEAD constructions), verified by round-trip specs.
  * Implemented as a Scala UDF (side-effecting RNG — not codegen material;
  * perf-noncritical per SURVEY §4.2.2).
  */
object CryptoCore {
  final val NonceLen = 12

  def keySize(algorithm: String): Int = algorithm match {
    case "aes-128-gcm" => 16
    case "aes-256-gcm" => 32
    case "chacha20-poly1305" => 32
    case other => throw new GraftConfigError(s"unknown algorithm '$other' (aes-128-gcm|aes-256-gcm|chacha20-poly1305)")
  }

  def validateKey(algorithm: String, key: String): Array[Byte] = {
    val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val want = keySize(algorithm)
    if (bytes.length != want)
      throw new GraftConfigError(s"$algorithm requires a key of exactly $want bytes, got ${bytes.length}")
    bytes
  }

  private def cipher(algorithm: String, mode: Int, key: Array[Byte], nonce: Array[Byte]): Cipher =
    algorithm match {
      case "aes-128-gcm" | "aes-256-gcm" =>
        val c = Cipher.getInstance("AES/GCM/NoPadding")
        c.init(mode, new SecretKeySpec(key, "AES"), new GCMParameterSpec(128, nonce))
        c
      case "chacha20-poly1305" =>
        val c = Cipher.getInstance("ChaCha20-Poly1305")
        c.init(mode, new SecretKeySpec(key, "ChaCha20"), new IvParameterSpec(nonce))
        c
    }

  def encryptValue(algorithm: String, key: Array[Byte], rng: SecureRandom, plaintext: String): String = {
    val nonce = new Array[Byte](NonceLen)
    rng.nextBytes(nonce)
    val ct = cipher(algorithm, Cipher.ENCRYPT_MODE, key, nonce)
      .doFinal(plaintext.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Byte](NonceLen + ct.length)
    System.arraycopy(nonce, 0, out, 0, NonceLen)
    System.arraycopy(ct, 0, out, NonceLen, ct.length)
    Base64.getEncoder.encodeToString(out)
  }

  /** null on any per-value failure (bad base64, short buffer, auth fail) —
    * reference decrypt semantics. */
  def decryptValue(algorithm: String, key: Array[Byte], encoded: String): String =
    try {
      val all = Base64.getDecoder.decode(encoded)
      if (all.length < NonceLen + 16) null
      else {
        val nonce = java.util.Arrays.copyOfRange(all, 0, NonceLen)
        val ct = java.util.Arrays.copyOfRange(all, NonceLen, all.length)
        new String(cipher(algorithm, Cipher.DECRYPT_MODE, key, nonce).doFinal(ct),
          java.nio.charset.StandardCharsets.UTF_8)
      }
    } catch { case _: Exception => null }
}

object EncryptOp extends Stage {
  val name = "encrypt.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val column = cfg.str("column")
    val algorithm = cfg.strOr("algorithm", "aes-256-gcm")
    val key = CryptoCore.validateKey(algorithm, cfg.str("key"))
    val out = cfg.strOr("output_column", s"${column}_encrypted")
    // lazy per-executor RNG (SecureRandom is not serializable-safe to share)
    val enc = F.udf { (s: String) =>
      if (s == null) null
      else CryptoCore.encryptValue(algorithm, key, CryptoRng.get(), s)
    }
    ctx.primary.withColumn(out, enc(F.col(column)))
  }
}

/** per-thread SecureRandom holder for executor-side UDF use */
object CryptoRng {
  private val tl = new ThreadLocal[SecureRandom] {
    override def initialValue(): SecureRandom = new SecureRandom()
  }
  def get(): SecureRandom = tl.get()
}

object DecryptOp extends Stage {
  val name = "decrypt.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val column = cfg.str("column")
    val algorithm = cfg.strOr("algorithm", "aes-256-gcm")
    val key = CryptoCore.validateKey(algorithm, cfg.str("key"))
    val out = cfg.strOr("output_column", s"${column}_decrypted")
    val dec = F.udf { (s: String) =>
      if (s == null) null else CryptoCore.decryptValue(algorithm, key, s)
    }
    ctx.primary.withColumn(out, dec(F.col(column)))
  }
}
