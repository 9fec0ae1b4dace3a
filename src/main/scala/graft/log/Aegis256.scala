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
  * The state is one flat Array[Int](24) (6 blocks x 4 columns) double-
  * buffered against a twin array, and the bulk encrypt/decrypt loops
  * are allocation-free (constant-index loads, T-table lookups, stores)
  * — the earlier formulation allocated ~10 four-int arrays per 16-byte
  * block and was GC-bound at ~70 MiB/s; this one is table-bound.
  * AES-GCM remains the JCE/AES-NI fast path where basin policy allows.
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

  @inline private def load32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  @inline private def store32(v: Int, b: Array[Byte], off: Int): Unit = {
    b(off) = (v >>> 24).toByte
    b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte
    b(off + 3) = v.toByte
  }

  // spec constants C0, C1 (Fibonacci bytes)
  private val C0: Array[Byte] = Array(0x00, 0x01, 0x01, 0x02, 0x03, 0x05,
    0x08, 0x0d, 0x15, 0x22, 0x37, 0x59, 0x90, 0xe9, 0x79, 0x62).map(_.toByte)
  private val C1: Array[Byte] = Array(0xdb, 0x3d, 0x18, 0x55, 0x6d, 0xc2,
    0x2f, 0xf1, 0x20, 0x11, 0x31, 0x42, 0x73, 0xb5, 0x28, 0xdd).map(_.toByte)

  /** One AESRound from `in[ii..ii+3]` with round key (rk0..rk3) into
    * `out[oi..oi+3]`. Constant small indices — bounds checks hoist.
    */
  @inline private def aesInto(out: Array[Int], oi: Int, in: Array[Int], ii: Int,
                              rk0: Int, rk1: Int, rk2: Int, rk3: Int): Unit = {
    val i0 = in(ii); val i1 = in(ii + 1); val i2 = in(ii + 2); val i3 = in(ii + 3)
    out(oi) = te0((i0 >>> 24) & 0xff) ^ te1((i1 >>> 16) & 0xff) ^
      te2((i2 >>> 8) & 0xff) ^ te3(i3 & 0xff) ^ rk0
    out(oi + 1) = te0((i1 >>> 24) & 0xff) ^ te1((i2 >>> 16) & 0xff) ^
      te2((i3 >>> 8) & 0xff) ^ te3(i0 & 0xff) ^ rk1
    out(oi + 2) = te0((i2 >>> 24) & 0xff) ^ te1((i3 >>> 16) & 0xff) ^
      te2((i0 >>> 8) & 0xff) ^ te3(i1 & 0xff) ^ rk2
    out(oi + 3) = te0((i3 >>> 24) & 0xff) ^ te1((i0 >>> 16) & 0xff) ^
      te2((i1 >>> 8) & 0xff) ^ te3(i2 & 0xff) ^ rk3
  }

  /** The 6x128-bit state: flat [s0c0..s0c3, s1c0.., ..., s5c3], double-
    * buffered so one Update is 6 aesInto calls and a reference swap —
    * zero allocation after construction.
    */
  private final class State(key: Array[Byte], nonce: Array[Byte]) {
    require(key.length == KeyLen, "AEGIS-256 key must be 32 bytes")
    require(nonce.length == NonceLen, "AEGIS-256 nonce must be 32 bytes")
    var s = new Array[Int](24)
    private var t = new Array[Int](24)

    private val k00 = load32(key, 0); private val k01 = load32(key, 4)
    private val k02 = load32(key, 8); private val k03 = load32(key, 12)
    private val k10 = load32(key, 16); private val k11 = load32(key, 20)
    private val k12 = load32(key, 24); private val k13 = load32(key, 28)
    private val kn00 = k00 ^ load32(nonce, 0); private val kn01 = k01 ^ load32(nonce, 4)
    private val kn02 = k02 ^ load32(nonce, 8); private val kn03 = k03 ^ load32(nonce, 12)
    private val kn10 = k10 ^ load32(nonce, 16); private val kn11 = k11 ^ load32(nonce, 20)
    private val kn12 = k12 ^ load32(nonce, 24); private val kn13 = k13 ^ load32(nonce, 28)

    // init: S = [k0^n0, k1^n1, C1, C0, k0^C0, k1^C1]
    s(0) = kn00; s(1) = kn01; s(2) = kn02; s(3) = kn03
    s(4) = kn10; s(5) = kn11; s(6) = kn12; s(7) = kn13
    s(8) = load32(C1, 0); s(9) = load32(C1, 4); s(10) = load32(C1, 8); s(11) = load32(C1, 12)
    s(12) = load32(C0, 0); s(13) = load32(C0, 4); s(14) = load32(C0, 8); s(15) = load32(C0, 12)
    s(16) = k00 ^ load32(C0, 0); s(17) = k01 ^ load32(C0, 4)
    s(18) = k02 ^ load32(C0, 8); s(19) = k03 ^ load32(C0, 12)
    s(20) = k10 ^ load32(C1, 0); s(21) = k11 ^ load32(C1, 4)
    s(22) = k12 ^ load32(C1, 8); s(23) = k13 ^ load32(C1, 12)
    locally {
      var i = 0
      while (i < 4) {
        update(k00, k01, k02, k03); update(k10, k11, k12, k13)
        update(kn00, kn01, kn02, kn03); update(kn10, kn11, kn12, kn13)
        i += 1
      }
    }

    def update(m0: Int, m1: Int, m2: Int, m3: Int): Unit = {
      val s = this.s; val t = this.t
      aesInto(t, 0, s, 20, s(0) ^ m0, s(1) ^ m1, s(2) ^ m2, s(3) ^ m3)
      aesInto(t, 4, s, 0, s(4), s(5), s(6), s(7))
      aesInto(t, 8, s, 4, s(8), s(9), s(10), s(11))
      aesInto(t, 12, s, 8, s(12), s(13), s(14), s(15))
      aesInto(t, 16, s, 12, s(16), s(17), s(18), s(19))
      aesInto(t, 20, s, 16, s(20), s(21), s(22), s(23))
      this.s = t; this.t = s
    }

    def absorb(ad: Array[Byte]): Unit = {
      var off = 0
      while (off + 16 <= ad.length) {
        update(load32(ad, off), load32(ad, off + 4),
          load32(ad, off + 8), load32(ad, off + 12))
        off += 16
      }
      if (off < ad.length) {
        val pad = new Array[Byte](16)
        System.arraycopy(ad, off, pad, 0, ad.length - off)
        update(load32(pad, 0), load32(pad, 4), load32(pad, 8), load32(pad, 12))
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
      val t0 = s(12) ^ load32(u, 0); val t1 = s(13) ^ load32(u, 4)
      val t2 = s(14) ^ load32(u, 8); val t3 = s(15) ^ load32(u, 12)
      i = 0
      while (i < 7) { update(t0, t1, t2, t3); i += 1 }
      val out = new Array[Byte](16)
      store32(s(0) ^ s(4) ^ s(8) ^ s(12) ^ s(16) ^ s(20), out, 0)
      store32(s(1) ^ s(5) ^ s(9) ^ s(13) ^ s(17) ^ s(21), out, 4)
      store32(s(2) ^ s(6) ^ s(10) ^ s(14) ^ s(18) ^ s(22), out, 8)
      store32(s(3) ^ s(7) ^ s(11) ^ s(15) ^ s(19) ^ s(23), out, 12)
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
    val bulkEnd = plain.length - (plain.length & 15)
    while (off < bulkEnd) {
      val s = st.s
      val x0 = load32(plain, off); val x1 = load32(plain, off + 4)
      val x2 = load32(plain, off + 8); val x3 = load32(plain, off + 12)
      // z = S1 ^ S4 ^ S5 ^ (S2 & S3)
      store32(x0 ^ s(4) ^ s(16) ^ s(20) ^ (s(8) & s(12)), ct, off)
      store32(x1 ^ s(5) ^ s(17) ^ s(21) ^ (s(9) & s(13)), ct, off + 4)
      store32(x2 ^ s(6) ^ s(18) ^ s(22) ^ (s(10) & s(14)), ct, off + 8)
      store32(x3 ^ s(7) ^ s(19) ^ s(23) ^ (s(11) & s(15)), ct, off + 12)
      st.update(x0, x1, x2, x3)
      off += 16
    }
    if (off < plain.length) {
      val rem = plain.length - off
      val pad = new Array[Byte](16)
      System.arraycopy(plain, off, pad, 0, rem)
      val s = st.s
      val x0 = load32(pad, 0); val x1 = load32(pad, 4)
      val x2 = load32(pad, 8); val x3 = load32(pad, 12)
      val block = new Array[Byte](16)
      store32(x0 ^ s(4) ^ s(16) ^ s(20) ^ (s(8) & s(12)), block, 0)
      store32(x1 ^ s(5) ^ s(17) ^ s(21) ^ (s(9) & s(13)), block, 4)
      store32(x2 ^ s(6) ^ s(18) ^ s(22) ^ (s(10) & s(14)), block, 8)
      store32(x3 ^ s(7) ^ s(19) ^ s(23) ^ (s(11) & s(15)), block, 12)
      System.arraycopy(block, 0, ct, off, rem)
      st.update(x0, x1, x2, x3)
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
    val bulkEnd = ct.length - (ct.length & 15)
    while (off < bulkEnd) {
      val s = st.s
      val x0 = load32(ct, off) ^ s(4) ^ s(16) ^ s(20) ^ (s(8) & s(12))
      val x1 = load32(ct, off + 4) ^ s(5) ^ s(17) ^ s(21) ^ (s(9) & s(13))
      val x2 = load32(ct, off + 8) ^ s(6) ^ s(18) ^ s(22) ^ (s(10) & s(14))
      val x3 = load32(ct, off + 12) ^ s(7) ^ s(19) ^ s(23) ^ (s(11) & s(15))
      store32(x0, plain, off); store32(x1, plain, off + 4)
      store32(x2, plain, off + 8); store32(x3, plain, off + 12)
      st.update(x0, x1, x2, x3)
      off += 16
    }
    if (off < ct.length) {
      val rem = ct.length - off
      val s = st.s
      val cpad = new Array[Byte](16)
      System.arraycopy(ct, off, cpad, 0, rem)
      val block = new Array[Byte](16)
      store32(load32(cpad, 0) ^ s(4) ^ s(16) ^ s(20) ^ (s(8) & s(12)), block, 0)
      store32(load32(cpad, 4) ^ s(5) ^ s(17) ^ s(21) ^ (s(9) & s(13)), block, 4)
      store32(load32(cpad, 8) ^ s(6) ^ s(18) ^ s(22) ^ (s(10) & s(14)), block, 8)
      store32(load32(cpad, 12) ^ s(7) ^ s(19) ^ s(23) ^ (s(11) & s(15)), block, 12)
      System.arraycopy(block, 0, plain, off, rem)
      // spec: zero the keystream tail of the partial block before the
      // state update (the padded plaintext block, not c ^ z beyond rem)
      val padded = new Array[Byte](16)
      System.arraycopy(plain, off, padded, 0, rem)
      st.update(load32(padded, 0), load32(padded, 4),
        load32(padded, 8), load32(padded, 12))
    }
    val expect = st.finalizeTag(ad.length.toLong, ct.length.toLong)
    if (java.security.MessageDigest.isEqual(expect, tag)) Some(plain) else None
  }
}
