package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

class FernetTokSpec extends AnyFunSuite {
  // the public fernet spec's own test vector (github.com/fernet/spec,
  // generate.json/verify.json): secret, iv 00..0f, ts 1985-10-26T01:20:00-07:00.
  // The expected token was independently re-derived here with OpenSSL
  // (aes-128-cbc + hmac-sha256 over the assembled body) and matches the
  // spec repo's published token byte for byte.
  private val secret = "cw_0x689RpI-jtRR7oE8h_eQsKImvJapLeSbXpwF4e4="
  private val specToken =
    "gAAAAAAdwJ6wAAECAwQFBgcICQoLDA0ODy021cpGVWKZ_eEwCGM4BLLF_5CV9dOPmrhuVUPgJobwOz7JcbmrR64jVmpU4IwqDA=="
  private val specTs = 499162800L
  private val specIv = Array.tabulate[Byte](16)(_.toByte)

  test("encryptAt reproduces the fernet spec vector byte for byte") {
    assert(FernetTok.encryptAt(secret, "hello", specTs, specIv) == specToken)
  }

  test("decrypt verifies and recovers the spec vector; ttl honored at spec's now") {
    assert(FernetTok.decrypt(secret, specToken) == "hello")
    // verify.json: now = ts + 1s, ttl 60 -> valid
    assert(FernetTok.decrypt(secret, specToken, Some(60L), specTs + 1) == "hello")
    // invalid.json's expired case: same token far past its ttl
    val ex = intercept[IllegalArgumentException](
      FernetTok.decrypt(secret, specToken, Some(60L), specTs + 61))
    assert(ex.getMessage.contains("expired"))
  }

  test("integrity: flipped ciphertext bit and wrong version are rejected") {
    val raw = java.util.Base64.getUrlDecoder.decode(specToken)
    raw(30) = (raw(30) ^ 1).toByte // inside ciphertext -> HMAC must fail
    val tampered = java.util.Base64.getUrlEncoder.encodeToString(raw)
    assert(intercept[IllegalArgumentException](FernetTok.decrypt(secret, tampered))
      .getMessage.contains("HMAC"))
    val raw2 = java.util.Base64.getUrlDecoder.decode(specToken)
    raw2(0) = 0x81.toByte
    val badVer = java.util.Base64.getUrlEncoder.encodeToString(raw2)
    assert(intercept[IllegalArgumentException](FernetTok.decrypt(secret, badVer))
      .getMessage.contains("version"))
  }

  test("random-key round trip, unicode payload, generated keys distinct") {
    val key = FernetTok.generateKey()
    val msg = "tøk-πayload é中"
    assert(FernetTok.decrypt(key, FernetTok.encrypt(key, msg)) == msg)
    assert(FernetTok.generateKey() != key)
  }
}
