package graft.log

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}

/** The S2S framed session codec — the reference's binary wire format
  * for append/read sessions (api/src/v1/stream/s2s.rs:11-56), byte-
  * exact framing:
  *
  * {{{
  *   REGULAR:  [3-byte BE length][1 flag byte][payload]
  *   TERMINAL: [3-byte BE length][1 flag byte][2-byte BE HTTP status][JSON body]
  *   length = flags + payload (excludes the length prefix itself)
  *   flags  = T CC xxxxx — bit7 terminal; bits6-5 compression
  *            (0 none, 1 zstd, 2 gzip); low 5 reserved zero
  * }}}
  *
  * Per-frame compression applies when the payload reaches 1 KiB
  * (COMPRESSION_THRESHOLD_BYTES) and the peer negotiated an algorithm
  * via Accept-Encoding (s2s.rs:66-83 from_accept_encoding — zstd wins
  * over gzip, exactly the reference's preference order; zstd rides
  * the zstd-jni codec already on the Spark classpath); frames are
  * capped at 2 MiB compressed AND decompressed (MAX_FRAME_BYTES /
  * MAX_DECOMPRESSED_PAYLOAD_BYTES).
  *
  * Two payload encodings ride these frames, selected by content
  * type: `s2s/proto` — the reference's prost-shaped protobuf
  * messages (AppendInput in, AppendAck / ReadBatch out), encoded by
  * [[ProtoCodec]] — and `s2s/json`, a retained extension carrying
  * the repo's v1 JSON shapes (the same bodies the unary routes
  * speak). Terminal frames carry 2-byte status + JSON in both modes,
  * exactly as in the reference (s2s.rs TERMINAL layout).
  */
object S2sCodec {

  val ContentType = "s2s/json"
  /** The reference's framed content type (mime.rs:48-51 is_s2s_proto). */
  val ProtoContentType = "s2s/proto"

  val CompressionThreshold = 1024
  val MaxFrameBytes: Int = 2 * 1024 * 1024

  val CompNone = 0
  val CompZstd = 1
  val CompGzip = 2

  /** One decoded frame. `compression` is the algorithm that was on
    * the wire (payload arrives decompressed); specs use it to pin the
    * >1 KiB gzip contract. */
  final case class Frame(terminal: Boolean, compression: Int,
                         payload: Array[Byte], status: Int = 0) {
    def payloadUtf8: String = new String(payload, "UTF-8")
  }

  /** The negotiated per-frame algorithm from Accept-Encoding —
    * s2s.rs:67-83 from_accept_encoding, exactly its preference order:
    * a zstd token ANYWHERE in the list wins immediately, gzip is the
    * fallback, identity otherwise. Returns one of [[CompZstd]] /
    * [[CompGzip]] / [[CompNone]]. */
  def negotiated(acceptEncoding: Option[String]): Int = {
    var gzip = false
    acceptEncoding.foreach(_.split(',').foreach { enc =>
      val token = enc.trim.split(';').head.trim
      if (token.equalsIgnoreCase("zstd")) return CompZstd
      else if (token.equalsIgnoreCase("gzip")) gzip = true
    })
    if (gzip) CompGzip else CompNone
  }

  /** True iff the peer's Accept-Encoding carries a gzip token — the
    * gzip half of [[negotiated]]; kept as the boolean form the client
    * helpers and specs use. */
  def gzipNegotiated(acceptEncoding: Option[String]): Boolean =
    acceptEncoding.exists(_.split(',').exists(
      _.trim.split(';').head.trim.equalsIgnoreCase("gzip")))

  private def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val g = new GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }

  def zstd(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val z = new ZstdOutputStream(bos)
    z.write(data); z.close()
    bos.toByteArray
  }

  /** Bounded streaming inflate shared by the gzip and zstd arms:
    * expansion beyond `cap` throws rather than materializing a
    * decompression bomb (the reference's read_to_end_limited,
    * s2s.rs:146-162). */
  private def inflateBounded(in: InputStream, cap: Int,
                             hint: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.min(math.max(hint, 64), cap))
    val buf = new Array[Byte](8192)
    var total = 0
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      if (total > cap)
        throw new java.io.IOException("decompressed payload exceeds limit")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** Bounded gunzip, shared with the unary routes' request-
    * decompression layer (handlers/v1/mod.rs:30-33
    * RequestDecompressionLayer). */
  private[log] def gunzip(data: Array[Byte], cap: Int): Array[Byte] =
    inflateBounded(new GZIPInputStream(new ByteArrayInputStream(data)),
      cap, data.length * 2)

  /** Bounded zstd inflate — the RequestDecompressionLayer's zstd arm
    * (lite/Cargo.toml decompression-zstd) and the frame decoder's
    * CompZstd arm share it. */
  def unzstd(data: Array[Byte], cap: Int): Array[Byte] =
    inflateBounded(new ZstdInputStream(new ByteArrayInputStream(data)),
      cap, data.length * 2)

  private def header(flags: Int, bodyLen: Int): Array[Byte] = {
    val len = bodyLen + 1 // flags byte rides inside the length
    require(len <= MaxFrameBytes, s"frame exceeds ${MaxFrameBytes}B limit")
    Array[Byte](((len >> 16) & 0xff).toByte, ((len >> 8) & 0xff).toByte,
      (len & 0xff).toByte, flags.toByte)
  }

  /** Encode one regular frame; compresses with the negotiated
    * algorithm iff the payload reaches the 1 KiB threshold
    * (s2s.rs:104-116 compress). `algo` is one of [[CompNone]] /
    * [[CompZstd]] / [[CompGzip]] — typically [[negotiated]]'s pick. */
  def writeFrame(os: OutputStream, payload: Array[Byte],
                 algo: Int): Unit = {
    // encode-side decompressed cap, mirroring the reference's compress()
    // rejecting payloads over MAX_DECOMPRESSED_PAYLOAD_BYTES (s2s.rs):
    // without it a highly compressible >cap payload encodes into a
    // valid small frame the peer must kill the session over at decode
    require(payload.length <= MaxFrameBytes,
      s"payload exceeds ${MaxFrameBytes}B decompressed limit")
    val (comp, wire) =
      if (payload.length < CompressionThreshold || algo == CompNone)
        (CompNone, payload)
      else if (algo == CompZstd) (CompZstd, zstd(payload))
      else (CompGzip, gzip(payload))
    os.write(header(comp << 5, wire.length))
    os.write(wire)
    os.flush()
  }

  /** Boolean form kept for the gzip-only client helpers and specs. */
  def writeFrame(os: OutputStream, payload: Array[Byte],
                 gzipOk: Boolean): Unit =
    writeFrame(os, payload, if (gzipOk) CompGzip else CompNone)

  /** Encode the terminal frame: 2-byte HTTP status + JSON body
    * (never compressed — error bodies are small). */
  def writeTerminal(os: OutputStream, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    os.write(header(0x80, 2 + b.length))
    os.write((status >> 8) & 0xff); os.write(status & 0xff)
    os.write(b)
    os.flush()
  }

  /** None on EOF before the FIRST byte (a clean boundary); throws on
    * EOF after a partial read — a length prefix torn mid-way is a torn
    * session, not a clean close. */
  private def readFully(in: InputStream, n: Int): Option[Array[Byte]] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) {
        if (off == 0) return None
        throw new EOFException("stream torn mid-frame")
      }
      off += r
    }
    Some(buf)
  }

  /** Decode the next frame; None on clean EOF at a frame boundary.
    * EOF inside a frame — including inside the 3-byte length prefix —
    * throws (a torn session): the caller must not mistake a truncated
    * stream for a clean end. */
  def readFrame(in: InputStream): Option[Frame] = {
    val hdr = readFully(in, 3).getOrElse(return None)
    val len = ((hdr(0) & 0xff) << 16) | ((hdr(1) & 0xff) << 8) | (hdr(2) & 0xff)
    if (len > MaxFrameBytes)
      throw new java.io.IOException(s"frame of $len B exceeds decode limit")
    if (len < 1) throw new java.io.IOException("frame shorter than its flag byte")
    val body = readFully(in, len).getOrElse(
      throw new EOFException("stream torn mid-frame"))
    val flags = body(0) & 0xff
    val terminal = (flags & 0x80) != 0
    val comp = (flags >> 5) & 0x3
    if (terminal) {
      if (len < 3) throw new java.io.IOException("terminal frame missing status")
      val status = ((body(1) & 0xff) << 8) | (body(2) & 0xff)
      Some(Frame(terminal = true, comp,
        java.util.Arrays.copyOfRange(body, 3, len), status))
    } else {
      val raw = java.util.Arrays.copyOfRange(body, 1, len)
      val payload = comp match {
        case CompNone => raw
        case CompGzip => gunzip(raw, MaxFrameBytes)
        case CompZstd => unzstd(raw, MaxFrameBytes)
        case other =>
          throw new java.io.IOException(s"unsupported compression flag $other")
      }
      Some(Frame(terminal = false, comp, payload))
    }
  }
}
