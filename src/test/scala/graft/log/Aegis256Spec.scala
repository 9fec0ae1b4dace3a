package graft.log

import org.scalatest.funsuite.AnyFunSuite

/** AEGIS-256 pinned to the public draft-irtf-cfrg-aegis-aead test
  * vectors (A.3 "AEGIS-256 Test Vectors", 128-bit tags) — the cipher
  * the reference uses first (storage/src/record/encryption.rs:9-12,
  * format 0x01). Covers empty, block-aligned, and partial-block
  * messages, AD absorption, tamper rejection on ciphertext / AD /
  * tag / nonce / key, and random-length round-trips.
  */
class Aegis256Spec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def toHex(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString

  private val key = hex(
    "1001000000000000000000000000000000000000000000000000000000000000")
  private val nonce = hex(
    "1000020000000000000000000000000000000000000000000000000000000000")

  test("draft A.3 test vector 1: single zero block, empty AD") {
    val (ct, tag) = Aegis256.encryptDetached(
      key, nonce, Array.empty, hex("00000000000000000000000000000000"))
    assert(toHex(ct) == "754fc3d8c973246dcc6d741412a4b236")
    assert(toHex(tag) == "3fe91994768b332ed7f570a19ec5896e")
  }

  test("draft A.3 test vector 2: empty message, empty AD") {
    val (ct, tag) = Aegis256.encryptDetached(
      key, nonce, Array.empty, Array.empty)
    assert(ct.isEmpty)
    assert(toHex(tag) == "e3def978a0f054afd1e761d7553afba3")
  }

  test("draft A.3 test vector 3: two blocks with AD") {
    val ad = hex("0001020304050607")
    val msg = hex("000102030405060708090a0b0c0d0e0f" +
      "101112131415161718191a1b1c1d1e1f")
    val (ct, tag) = Aegis256.encryptDetached(key, nonce, ad, msg)
    assert(toHex(ct) ==
      "f373079ed84b2709faee373584585d60accd191db310ef5d8b11833df9dec711")
    assert(toHex(tag) == "8d86f91ee606e9ff26a01b64ccbdd91d")
    // and decrypt round-trips
    val back = Aegis256.decryptDetached(key, nonce, ad, ct, tag)
    assert(back.exists(_.sameElements(msg)))
  }

  test("draft A.3 test vector 4: partial final block (14 bytes)") {
    val ad = hex("0001020304050607")
    val msg = hex("000102030405060708090a0b0c0d")
    val (ct, tag) = Aegis256.encryptDetached(key, nonce, ad, msg)
    assert(toHex(ct) == "f373079ed84b2709faee37358458")
    assert(toHex(tag) == "c60b9c2d33ceb058f96e6dd03c215652")
    val back = Aegis256.decryptDetached(key, nonce, ad, ct, tag)
    assert(back.exists(_.sameElements(msg)))
  }

  test("tamper rejection: flipped ciphertext bit, truncated/altered AD, bad tag") {
    val ad = hex("0001020304050607")
    val msg = hex("000102030405060708090a0b0c0d0e0f" +
      "101112131415161718191a1b1c1d1e1f")
    val (ct, tag) = Aegis256.encryptDetached(key, nonce, ad, msg)

    val ctBad = ct.clone(); ctBad(5) = (ctBad(5) ^ 0x01).toByte
    assert(Aegis256.decryptDetached(key, nonce, ad, ctBad, tag).isEmpty)

    assert(Aegis256.decryptDetached(key, nonce, ad.dropRight(1), ct, tag).isEmpty)
    val adBad = ad.clone(); adBad(0) = (adBad(0) ^ 0x80).toByte
    assert(Aegis256.decryptDetached(key, nonce, adBad, ct, tag).isEmpty)

    val tagBad = tag.clone(); tagBad(15) = (tagBad(15) ^ 0x01).toByte
    assert(Aegis256.decryptDetached(key, nonce, ad, ct, tagBad).isEmpty)

    val nonceBad = nonce.clone(); nonceBad(0) = (nonceBad(0) ^ 0x01).toByte
    assert(Aegis256.decryptDetached(key, nonceBad, ad, ct, tag).isEmpty)

    val keyBad = key.clone(); keyBad(31) = (keyBad(31) ^ 0x01).toByte
    assert(Aegis256.decryptDetached(keyBad, nonce, ad, ct, tag).isEmpty)
  }

  test("round-trip across every message length 0..64 and AD length 0..33") {
    // deterministic byte patterns (no RNG: lengths are the coverage)
    for (mLen <- 0 to 64; aLen <- Seq(0, 1, 15, 16, 17, 33)) {
      val msg = Array.tabulate(mLen)(i => (i * 7 + mLen).toByte)
      val ad = Array.tabulate(aLen)(i => (i * 13 + aLen).toByte)
      val (ct, tag) = Aegis256.encryptDetached(key, nonce, ad, msg)
      assert(ct.length == mLen)
      val back = Aegis256.decryptDetached(key, nonce, ad, ct, tag)
      assert(back.exists(_.sameElements(msg)), s"mLen=$mLen aLen=$aLen")
    }
  }

  test("RecordCipher framing: format byte dispatch, both ciphers, JCE cross-check") {
    val k = Array.tabulate(32)(i => (i + 1).toByte)
    val aad = RecordCipher.aad("b", "s")
    for (algo <- CipherAlgo.All) {
      val spec = CipherSpec(algo, k)
      val enc = RecordCipher.encrypt(spec, aad, "hello-world".getBytes)
      assert(enc(0) == algo.formatId)
      assert(enc.length == 1 + algo.nonceLen + 11 + RecordCipher.TagLen)
      // decrypt needs only the key: algorithm comes from the format byte
      assert(new String(RecordCipher.decrypt(k, aad, enc)) == "hello-world")
      // wrong AAD is an auth failure, not garbage
      assertThrows[javax.crypto.AEADBadTagException](
        RecordCipher.decrypt(k, RecordCipher.aad("b", "other"), enc))
      // unknown format id rejected
      val badFmt = enc.clone(); badFmt(0) = 0x7f
      assertThrows[javax.crypto.AEADBadTagException](
        RecordCipher.decrypt(k, aad, badFmt))
    }
    // AES-GCM arm must interoperate with plain JCE over the framing:
    // strip format byte and decrypt nonce||ct||tag externally
    val encG = RecordCipher.encrypt(CipherSpec(CipherAlgo.Aes256Gcm, k),
      aad, "jce-interop".getBytes)
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(k, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, encG, 1, 12))
    c.updateAAD(aad)
    assert(new String(c.doFinal(encG, 13, encG.length - 13)) == "jce-interop")
  }

  test("RecordCipher.resolve mirrors the reference's EncryptionSpec::resolve") {
    val k = Array.fill(32)(1.toByte)
    assert(RecordCipher.resolve(None, Some(k)) == Right(None))
    assert(RecordCipher.resolve(None, None) == Right(None))
    assert(RecordCipher.resolve(Some(CipherAlgo.Aegis256), Some(k))
      .exists(_.exists(_.algo == CipherAlgo.Aegis256)))
    assert(RecordCipher.resolve(Some(CipherAlgo.Aegis256), None)
      .swap.exists(_.contains("missing encryption key")))
    assert(RecordCipher.resolve(Some(CipherAlgo.Aes256Gcm), Some(Array.fill(16)(1.toByte)))
      .swap.exists(_.contains("invalid encryption key length")))
    // wire names round-trip (config JSON codec relies on these)
    for (a <- CipherAlgo.All)
      assert(CipherAlgo.fromWire(a.wireName).contains(a))
  }
}
