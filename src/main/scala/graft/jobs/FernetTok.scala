package graft.jobs

import java.nio.ByteBuffer
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import javax.crypto.{Cipher, Mac}

/** Fernet token encrypt/decrypt (the reference's `encrypt_tok` /
  * `decrypt_tok`, `utils.py:1941-1950`, which wrap the public Fernet
  * spec via the `cryptography` package) — pure JDK crypto, no
  * dependencies.
  *
  * Fernet (github.com/fernet/spec): the 32-byte key is base64url
  * encoded; bytes 0-15 sign (HMAC-SHA256), bytes 16-31 encrypt
  * (AES-128-CBC, PKCS7). A token is
  * base64url(0x80 || ts(8 BE, seconds) || iv(16) || ciphertext || hmac(32))
  * with the HMAC taken over everything before it. Decrypt verifies the
  * version byte, the HMAC (constant-time), and optionally a TTL before
  * unpadding.
  *
  * This is a driver-side utility (token plumbing around job submission),
  * not a relational operator — it deliberately has no Spark surface.
  */
object FernetTok {
  private val Version: Byte = 0x80.toByte

  private def keyBytes(key: String): (Array[Byte], Array[Byte]) = {
    val k = Base64.getUrlDecoder.decode(key)
    require(k.length == 32, s"fernet key must decode to 32 bytes, got ${k.length}")
    (k.slice(0, 16), k.slice(16, 32))
  }

  private def hmac(signKey: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(signKey, "HmacSHA256"))
    mac.doFinal(data)
  }

  /** Deterministic form — explicit timestamp (epoch seconds) and IV so
    * tokens are reproducible and spec-pinnable; the random overload
    * below is the production entry point.
    */
  def encryptAt(key: String, cleartext: String, timestampSec: Long,
                iv: Array[Byte]): String = {
    require(iv.length == 16, "fernet IV is 16 bytes")
    val (signKey, encKey) = keyBytes(key)
    val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding") // PKCS5 == PKCS7 for 16B blocks
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(encKey, "AES"),
      new IvParameterSpec(iv))
    val ct = cipher.doFinal(cleartext.getBytes("UTF-8"))
    val body = ByteBuffer.allocate(1 + 8 + 16 + ct.length)
      .put(Version).putLong(timestampSec).put(iv).put(ct).array()
    val mac = hmac(signKey, body)
    Base64.getUrlEncoder.encodeToString(body ++ mac)
  }

  def encrypt(key: String, cleartext: String): String = {
    val iv = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(iv)
    encryptAt(key, cleartext, System.currentTimeMillis() / 1000L, iv)
  }

  /** Decrypt and verify; `ttlSec` (with `nowSec`) enforces token age the
    * way the reference's Airflow deployment can. Throws
    * IllegalArgumentException on any integrity failure — callers treat a
    * bad token as a bad request, not a crash.
    */
  def decrypt(key: String, token: String, ttlSec: Option[Long] = None,
              nowSec: Long = System.currentTimeMillis() / 1000L): String = {
    val (signKey, encKey) = keyBytes(key)
    val raw = Base64.getUrlDecoder.decode(token)
    require(raw.length >= 1 + 8 + 16 + 32, "fernet token too short")
    require(raw(0) == Version, "bad fernet version byte")
    val body = raw.dropRight(32)
    val mac = raw.takeRight(32)
    require(MessageDigest.isEqual(hmac(signKey, body), mac), "fernet HMAC mismatch")
    val ts = ByteBuffer.wrap(raw, 1, 8).getLong
    ttlSec.foreach { ttl =>
      require(nowSec - ts <= ttl, "fernet token expired")
      require(ts - 60 <= nowSec, "fernet token timestamp too far in the future")
    }
    val iv = raw.slice(9, 25)
    val ct = raw.slice(25, raw.length - 32)
    val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(encKey, "AES"),
      new IvParameterSpec(iv))
    new String(cipher.doFinal(ct), "UTF-8")
  }

  def generateKey(): String = {
    val k = new Array[Byte](32)
    new java.security.SecureRandom().nextBytes(k)
    Base64.getUrlEncoder.encodeToString(k)
  }
}
