package graft.log

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}

import org.scalatest.funsuite.AnyFunSuite

/** Unit contracts for the S2S frame codec (api/src/v1/stream/
  * s2s.rs:11-116 framing; the e2e_http_s2s oracle proves the session
  * behavior end-to-end, this spec pins the byte-level codec edges the
  * oracle can't reach):
  *
  *  - framing round-trips, flag-byte layout, terminal status bytes;
  *  - the 1 KiB compression threshold is exact on both sides of the
  *    boundary and gated on negotiation;
  *  - clean EOF at a frame boundary is None, but EOF ANYWHERE inside
  *    a frame — length prefix included — throws (a torn session must
  *    never read as a clean close, the same discipline the SSE route
  *    gets from the `\n\n` event boundary);
  *  - decode enforces the 2 MiB frame cap and the decompressed-payload
  *    cap (zip-bomb guard) on both the gzip and zstd arms;
  *  - the Accept-Encoding negotiation prefers zstd over gzip, exactly
  *    the reference's order (from_accept_encoding_prefers_zstd /
  *    falls_back_to_gzip / defaults_to_none, s2s.rs:523-551);
  *  - encode refuses a frame beyond the cap rather than emitting one
  *    the peer must kill the session over.
  */
class S2sCodecSpec extends AnyFunSuite {

  private def enc(payload: Array[Byte], gzipOk: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    S2sCodec.writeFrame(bos, payload, gzipOk)
    bos.toByteArray
  }

  private def dec(bytes: Array[Byte]): Option[S2sCodec.Frame] =
    S2sCodec.readFrame(new ByteArrayInputStream(bytes))

  test("regular frame round-trips; wire layout is [3B len][flags][payload]") {
    val payload = "hello frames".getBytes("UTF-8")
    val wire = enc(payload, gzipOk = false)
    // length prefix covers flags + payload, excludes itself
    val len = ((wire(0) & 0xff) << 16) | ((wire(1) & 0xff) << 8) | (wire(2) & 0xff)
    assert(len == 1 + payload.length)
    assert((wire(3) & 0xff) == 0) // not terminal, compression none
    val f = dec(wire).get
    assert(!f.terminal && f.compression == S2sCodec.CompNone)
    assert(f.payload.sameElements(payload))
  }

  test("compression threshold is exactly 1 KiB and gated on negotiation") {
    val under = Array.fill[Byte](S2sCodec.CompressionThreshold - 1)('a')
    val at = Array.fill[Byte](S2sCodec.CompressionThreshold)('a')
    // below threshold: plain even when gzip is negotiated
    assert(dec(enc(under, gzipOk = true)).get.compression == S2sCodec.CompNone)
    // at threshold with negotiation: gzip flag on the wire, payload
    // decodes back byte-identical
    val zf = dec(enc(at, gzipOk = true)).get
    assert(zf.compression == S2sCodec.CompGzip)
    assert(zf.payload.sameElements(at))
    // at threshold WITHOUT negotiation: stays plain
    assert(dec(enc(at, gzipOk = false)).get.compression == S2sCodec.CompNone)
  }

  test("gzip actually shrinks the wire for a compressible >=1 KiB payload") {
    val payload = Array.fill[Byte](64 * 1024)('x')
    assert(enc(payload, gzipOk = true).length < payload.length / 4)
  }

  test("terminal frame carries the 2-byte status + body, never compressed") {
    val bos = new ByteArrayOutputStream()
    S2sCodec.writeTerminal(bos, 412, """{"seq_num_mismatch":7}""")
    val f = dec(bos.toByteArray).get
    assert(f.terminal && f.status == 412)
    assert(f.payloadUtf8 == """{"seq_num_mismatch":7}""")
    assert(f.compression == S2sCodec.CompNone)
  }

  test("Accept-Encoding negotiation: gzip token anywhere in the list, q-params tolerated") {
    assert(S2sCodec.gzipNegotiated(Some("gzip")))
    assert(S2sCodec.gzipNegotiated(Some("deflate, gzip;q=0.8, br")))
    assert(S2sCodec.gzipNegotiated(Some("GZIP")))
    assert(!S2sCodec.gzipNegotiated(Some("deflate, br")))
    assert(!S2sCodec.gzipNegotiated(None))
    // a zstd-only offer is not a gzip offer (the full negotiation
    // picks zstd there — see the preference-matrix test)
    assert(!S2sCodec.gzipNegotiated(Some("zstd")))
  }

  test("negotiation preference matrix: zstd > gzip > none (from_accept_encoding, s2s.rs:67-83)") {
    // the reference's own from_accept_encoding_prefers_zstd fixture:
    // zstd wins even listed after gzip, and br is ignored
    assert(S2sCodec.negotiated(Some("gzip, zstd, br")) == S2sCodec.CompZstd)
    assert(S2sCodec.negotiated(Some("zstd")) == S2sCodec.CompZstd)
    assert(S2sCodec.negotiated(Some("ZSTD;q=0.5")) == S2sCodec.CompZstd)
    // from_accept_encoding_falls_back_to_gzip
    assert(S2sCodec.negotiated(Some("gzip;q=0.8, deflate")) == S2sCodec.CompGzip)
    // from_accept_encoding_defaults_to_none
    assert(S2sCodec.negotiated(None) == S2sCodec.CompNone)
    assert(S2sCodec.negotiated(Some("deflate, br")) == S2sCodec.CompNone)
  }

  test("clean EOF at a frame boundary is None; back-to-back frames stream") {
    val bos = new ByteArrayOutputStream()
    S2sCodec.writeFrame(bos, "one".getBytes, gzipOk = false)
    S2sCodec.writeFrame(bos, "two".getBytes, gzipOk = false)
    val in = new ByteArrayInputStream(bos.toByteArray)
    assert(S2sCodec.readFrame(in).get.payloadUtf8 == "one")
    assert(S2sCodec.readFrame(in).get.payloadUtf8 == "two")
    assert(S2sCodec.readFrame(in).isEmpty)
  }

  test("EOF inside a frame throws — torn mid-payload, mid-flags, and mid-length-prefix") {
    val whole = enc("a torn session must be loud".getBytes, gzipOk = false)
    // every strict prefix except the empty one is a torn stream: the
    // length prefix itself torn (1-2 bytes) must NOT read as clean EOF
    for (cut <- 1 until whole.length)
      assertThrows[EOFException](dec(whole.take(cut)))
    // the empty prefix IS the clean boundary
    assert(dec(Array.emptyByteArray).isEmpty)
  }

  test("decode rejects a frame beyond the 2 MiB cap without reading its body") {
    // forged header claiming MaxFrameBytes+1: reject on the prefix alone
    val over = S2sCodec.MaxFrameBytes + 1
    val hdr = Array[Byte](((over >> 16) & 0xff).toByte,
      ((over >> 8) & 0xff).toByte, (over & 0xff).toByte)
    val ex = intercept[java.io.IOException](dec(hdr))
    assert(ex.getMessage.contains("exceeds decode limit"))
    // a zero-length frame (shorter than its own flag byte) is also junk
    assertThrows[java.io.IOException](dec(Array[Byte](0, 0, 0)))
  }

  /** Forge a compressed frame BYPASSING writeFrame — the encoder now
    * refuses oversized payloads outright (the reference's encode-side
    * MAX_DECOMPRESSED_PAYLOAD_BYTES check), so a bomb for the decoder
    * tests must be built by hand, the way a malicious peer would. */
  private def forge(payload: Array[Byte], algo: Int): Array[Byte] = {
    val comp = new ByteArrayOutputStream()
    val cs: java.io.OutputStream =
      if (algo == S2sCodec.CompGzip) new java.util.zip.GZIPOutputStream(comp)
      else new com.github.luben.zstd.ZstdOutputStream(comp)
    cs.write(payload); cs.close()
    val wire = comp.toByteArray
    val len = wire.length + 1
    val bos = new ByteArrayOutputStream()
    bos.write((len >> 16) & 0xff); bos.write((len >> 8) & 0xff)
    bos.write(len & 0xff); bos.write(algo << 5)
    bos.write(wire)
    bos.toByteArray
  }

  test("decompressed-payload cap: a gzip bomb inside a small frame is refused") {
    // 8 MiB of zeros gzips to a few KiB — the FRAME passes the wire
    // cap, the EXPANSION must not
    val bomb = forge(new Array[Byte](8 * 1024 * 1024), S2sCodec.CompGzip)
    assert(bomb.length < 64 * 1024, "fixture: the bomb must be small on the wire")
    val ex = intercept[java.io.IOException](dec(bomb))
    assert(ex.getMessage.contains("exceeds limit"))
  }

  test("encode refuses a compressible payload beyond the decompressed cap") {
    // pre-fix, this encoded into a tiny valid frame the peer must kill
    // the session over at decode time (ADVICE r19: s2s.rs compress())
    assertThrows[IllegalArgumentException](
      enc(new Array[Byte](S2sCodec.MaxFrameBytes + 1), gzipOk = true))
  }

  test("encode refuses an uncompressible frame beyond the cap") {
    assertThrows[IllegalArgumentException](
      enc(new Array[Byte](S2sCodec.MaxFrameBytes), gzipOk = false))
  }

  test("zstd frames round-trip with flag 1, threshold-gated like gzip") {
    val at = Array.fill[Byte](S2sCodec.CompressionThreshold)('a')
    val bos = new ByteArrayOutputStream()
    S2sCodec.writeFrame(bos, at, S2sCodec.CompZstd)
    val wire = bos.toByteArray
    // compression bits of the flag byte carry 1 (s2s.rs CompressionAlgorithm::Zstd = 1)
    assert(((wire(3) & 0xff) >> 5) == S2sCodec.CompZstd)
    val f = dec(wire).get
    assert(f.compression == S2sCodec.CompZstd && f.payload.sameElements(at))
    // below threshold: plain even when zstd is negotiated
    val under = Array.fill[Byte](S2sCodec.CompressionThreshold - 1)('a')
    val bos2 = new ByteArrayOutputStream()
    S2sCodec.writeFrame(bos2, under, S2sCodec.CompZstd)
    assert(dec(bos2.toByteArray).get.compression == S2sCodec.CompNone)
  }

  test("decompressed-payload cap holds on the zstd arm too") {
    val bomb = forge(new Array[Byte](8 * 1024 * 1024), S2sCodec.CompZstd)
    assert(bomb.length < 64 * 1024, "fixture: the bomb must be small on the wire")
    val ex = intercept[java.io.IOException](dec(bomb))
    assert(ex.getMessage.contains("exceeds limit"))
  }
}
