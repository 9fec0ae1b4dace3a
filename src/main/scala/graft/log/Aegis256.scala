package graft.log

/** AEGIS-256 authenticated encryption (128-bit tag), pure JVM.
  *
  * The reference's PRIMARY record cipher
  * (storage/src/record/encryption.rs:9-12: format 0x01, 32-byte nonce,
  * 16-byte tag), previously a documented deviation here because no
  * JCE provider ships it. Implemented from the public specification
  * (draft-irtf-cfrg-aegis-aead): a 6-block AES-round state machine —
  *
  *   Update(M): S'0 = AESRound(S5, S0 ^ M); S'i = AESRound(S(i-1), Si)
  *   keystream  z = S1 ^ S4 ^ S5 ^ (S2 & S3)
  *   init: S = [k0^n0, k1^n1, C1, C0, k0^C0, k1^C1], then
  *         4 x Update(k0), Update(k1), Update(k0^n0), Update(k1^n1)
  *   finalize: t = S3 ^ (LE64(ad_bits) || LE64(msg_bits)),
  *             7 x Update(t), tag = S0^...^S5
  *
  * AESRound(in, rk) = MixColumns(ShiftRows(SubBytes(in))) ^ rk — the
  * AESENC primitive — implemented with the classic public T-table
  * formulation over 4 big-endian column ints. Spec test vectors are
  * pinned in Aegis256Spec; decrypt is constant-time-compared on the
  * tag and never releases plaintext on failure.
  *
  * Throughput is JVM-table-bound (~hundreds of MB/s), fine for the
  * record-encryption path whose unit is a <=1 MiB batch; the AES-GCM
  * sibling stays the JCE/AES-NI + Spark-codegen fast path.
  */
object Aegis256 {

  val KeyLen = 32
  val NonceLen = 32
  val TagLen = 16

  // ---- AES round via T-tables (public-domain construction) ----

  private val SBox: Array[Int] = {
    // generate the AES S-box from the field inverse + affine map so no
    // 256-literal table needs hand-checking
    val inv = new Array[Int](256)
    // brute-force inverses in GF(2^8) mod x^8+x^4+x^3+x+1
    def mul(a0: Int, b0: Int): Int = {
      var a = a0; var b = b0; var r = 0
      while (b != 0) {
        if ((b & 1) != 0) r ^= a
        a <<= 1
        if ((a & 0x100) != 0) a ^= 0x11b
        b >>= 1
      }
      r
    }
    for (x <- 1 until 256; y <- 1 until 256 if mul(x, y) == 1) inv(x) = y
    val out = new Array[Int](256)
    for (x <- 0 until 256) {
      val i = inv(x)
      def rot(v: Int, n: Int): Int = ((v << n) | (v >>> (8 - n))) & 0xff
      out(x) = (i ^ rot(i, 1) ^ rot(i, 2) ^ rot(i, 3) ^ rot(i, 4) ^ 0x63) & 0xff
    }
    out
  }

  private val (te0, te1, te2, te3): (Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val t0 = new Array[Int](256); val t1 = new Array[Int](256)
    val t2 = new Array[Int](256); val t3 = new Array[Int](256)
    def x2(s: Int): Int = { val d = s << 1; if ((d & 0x100) != 0) (d ^ 0x11b) & 0xff else d }
    for (b <- 0 until 256) {
      val s = SBox(b)
      val s2 = x2(s)
      val s3 = s2 ^ s
      t0(b) = (s2 << 24) | (s << 16) | (s << 8) | s3
      t1(b) = (s3 << 24) | (s2 << 16) | (s << 8) | s
      t2(b) = (s << 24) | (s3 << 16) | (s2 << 8) | s
      t3(b) = (s << 24) | (s << 16) | (s3 << 8) | s2
    }
    (t0, t1, t2, t3)
  }

  /** One 128-bit block as 4 big-endian column ints. */
  private type Blk = Array[Int]

  private def blk(b: Array[Byte], off: Int): Blk = Array(
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff),
    ((b(off + 4) & 0xff) << 24) | ((b(off + 5) & 0xff) << 16) | ((b(off + 6) & 0xff) << 8) | (b(off + 7) & 0xff),
    ((b(off + 8) & 0xff) << 24) | ((b(off + 9) & 0xff) << 16) | ((b(off + 10) & 0xff) << 8) | (b(off + 11) & 0xff),
    ((b(off + 12) & 0xff) << 24) | ((b(off + 13) & 0xff) << 16) | ((b(off + 14) & 0xff) << 8) | (b(off + 15) & 0xff))

  private def unblk(x: Blk, out: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < 4) {
      out(off + 4 * i) = (x(i) >>> 24).toByte
      out(off + 4 * i + 1) = (x(i) >>> 16).toByte
      out(off + 4 * i + 2) = (x(i) >>> 8).toByte
      out(off + 4 * i + 3) = x(i).toByte
      i += 1
    }
  }

  private def xorB(a: Blk, b: Blk): Blk =
    Array(a(0) ^ b(0), a(1) ^ b(1), a(2) ^ b(2), a(3) ^ b(3))

  /** AESENC: MixColumns(ShiftRows(SubBytes(in))) ^ rk. */
  private def aesRound(in: Blk, rk: Blk): Blk = Array(
    te0((in(0) >>> 24) & 0xff) ^ te1((in(1) >>> 16) & 0xff) ^
      te2((in(2) >>> 8) & 0xff) ^ te3(in(3) & 0xff) ^ rk(0),
    te0((in(1) >>> 24) & 0xff) ^ te1((in(2) >>> 16) & 0xff) ^
      te2((in(3) >>> 8) & 0xff) ^ te3(in(0) & 0xff) ^ rk(1),
    te0((in(2) >>> 24) & 0xff) ^ te1((in(3) >>> 16) & 0xff) ^
      te2((in(0) >>> 8) & 0xff) ^ te3(in(1) & 0xff) ^ rk(2),
    te0((in(3) >>> 24) & 0xff) ^ te1((in(0) >>> 16) & 0xff) ^
      te2((in(1) >>> 8) & 0xff) ^ te3(in(2) & 0xff) ^ rk(3))

  // spec constants C0, C1 (Fibonacci bytes)
  private val C0: Blk = blk(Array(0x00, 0x01, 0x01, 0x02, 0x03, 0x05, 0x08,
    0x0d, 0x15, 0x22, 0x37, 0x59, 0x90, 0xe9, 0x79, 0x62).map(_.toByte), 0)
  private val C1: Blk = blk(Array(0xdb, 0x3d, 0x18, 0x55, 0x6d, 0xc2, 0x2f,
    0xf1, 0x20, 0x11, 0x31, 0x42, 0x73, 0xb5, 0x28, 0xdd).map(_.toByte), 0)

  private final class State(key: Array[Byte], nonce: Array[Byte]) {
    require(key.length == KeyLen, s"AEGIS-256 key must be 32 bytes")
    require(nonce.length == NonceLen, s"AEGIS-256 nonce must be 32 bytes")
    private val k0 = blk(key, 0)
    private val k1 = blk(key, 16)
    private val n0 = blk(nonce, 0)
    private val n1 = blk(nonce, 16)
    var s: Array[Blk] = Array(
      xorB(k0, n0), xorB(k1, n1), C1.clone(), C0.clone(),
      xorB(k0, C0), xorB(k1, C1))
    (0 until 4).foreach { _ =>
      update(k0); update(k1); update(xorB(k0, n0)); update(xorB(k1, n1))
    }

    def update(m: Blk): Unit = {
      val t = Array(
        aesRound(s(5), xorB(s(0), m)),
        aesRound(s(0), s(1)),
        aesRound(s(1), s(2)),
        aesRound(s(2), s(3)),
        aesRound(s(3), s(4)),
        aesRound(s(4), s(5)))
      s = t
    }

    def z(): Blk = Array(
      s(1)(0) ^ s(4)(0) ^ s(5)(0) ^ (s(2)(0) & s(3)(0)),
      s(1)(1) ^ s(4)(1) ^ s(5)(1) ^ (s(2)(1) & s(3)(1)),
      s(1)(2) ^ s(4)(2) ^ s(5)(2) ^ (s(2)(2) & s(3)(2)),
      s(1)(3) ^ s(4)(3) ^ s(5)(3) ^ (s(2)(3) & s(3)(3)))

    def absorb(ad: Array[Byte]): Unit = {
      var off = 0
      while (off + 16 <= ad.length) { update(blk(ad, off)); off += 16 }
      if (off < ad.length) {
        val pad = new Array[Byte](16)
        System.arraycopy(ad, off, pad, 0, ad.length - off)
        update(blk(pad, 0))
      }
    }

    def finalizeTag(adLen: Long, msgLen: Long): Array[Byte] = {
      // t = S3 ^ (LE64(ad_bits) || LE64(msg_bits))
      val u = new Array[Byte](16)
      val adBits = adLen * 8
      val msgBits = msgLen * 8
      var i = 0
      while (i < 8) {
        u(i) = (adBits >>> (8 * i)).toByte
        u(8 + i) = (msgBits >>> (8 * i)).toByte
        i += 1
      }
      val t = xorB(s(3), blk(u, 0))
      (0 until 7).foreach(_ => update(t))
      val tag = xorB(xorB(xorB(s(0), s(1)), xorB(s(2), s(3))), xorB(s(4), s(5)))
      val out = new Array[Byte](16)
      unblk(tag, out, 0)
      out
    }
  }

  /** Detached encrypt: returns (ciphertext, tag16). */
  def encryptDetached(key: Array[Byte], nonce: Array[Byte], ad: Array[Byte],
                      plain: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val st = new State(key, nonce)
    st.absorb(ad)
    val ct = new Array[Byte](plain.length)
    var off = 0
    while (off + 16 <= plain.length) {
      val xi = blk(plain, off)
      unblk(xorB(xi, st.z()), ct, off)
      st.update(xi)
      off += 16
    }
    if (off < plain.length) {
      val rem = plain.length - off
      val pad = new Array[Byte](16)
      System.arraycopy(plain, off, pad, 0, rem)
      val xi = blk(pad, 0)
      val block = new Array[Byte](16)
      unblk(xorB(xi, st.z()), block, 0)
      System.arraycopy(block, 0, ct, off, rem)
      st.update(xi)
    }
    (ct, st.finalizeTag(ad.length.toLong, plain.length.toLong))
  }

  /** Detached decrypt; None on tag mismatch (plaintext never released). */
  def decryptDetached(key: Array[Byte], nonce: Array[Byte], ad: Array[Byte],
                      ct: Array[Byte], tag: Array[Byte]): Option[Array[Byte]] = {
    val st = new State(key, nonce)
    st.absorb(ad)
    val plain = new Array[Byte](ct.length)
    var off = 0
    while (off + 16 <= ct.length) {
      val xi = xorB(blk(ct, off), st.z())
      unblk(xi, plain, off)
      st.update(xi)
      off += 16
    }
    if (off < ct.length) {
      val rem = ct.length - off
      val z = st.z()
      val cpad = new Array[Byte](16)
      System.arraycopy(ct, off, cpad, 0, rem)
      val block = new Array[Byte](16)
      unblk(xorB(blk(cpad, 0), z), block, 0)
      System.arraycopy(block, 0, plain, off, rem)
      // spec: zero the keystream tail of the partial block before the
      // state update (the padded plaintext block, not c ^ z beyond rem)
      val padded = new Array[Byte](16)
      System.arraycopy(plain, off, padded, 0, rem)
      st.update(blk(padded, 0))
    }
    val expect = st.finalizeTag(ad.length.toLong, ct.length.toLong)
    if (java.security.MessageDigest.isEqual(expect, tag)) Some(plain) else None
  }
}
