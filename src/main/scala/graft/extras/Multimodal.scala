package graft.extras

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Images/audio/video are opaque `binary` columns with typed metadata.
  * The Spark-side plumbing — schema, partition-sized batch processing,
  * executor-local decoder state — is real, and so is the image-header
  * codec: `ImageHeaderDecoder` parses PNG IHDR, JPEG SOF markers, and
  * GIF logical-screen descriptors from the raw bytes, pure JVM, no
  * native libs. Full-pixel decode is REAL both for uncompressed
  * 24-bit BMP (`BmpPixelDecoder` — padding, bottom-up rows, BGR,
  * per-pixel stats) and for compressed PNG/JPEG/GIF
  * (`ImageIoPixelDecoder` — the JDK ships those ImageIO readers).
  * Video frame extraction is REAL for uncompressed AVI
  * (`AviFrameDecoder` — RIFF walk, every-Nth-frame sampling,
  * per-frame DIB pixel decode) AND for MJPEG AVI
  * (`MjpegFrameDecoder` — every movi chunk a standalone JPEG through
  * the same ImageIO reader), so compressed video decode is honest
  * too. Inter-frame codecs (H.264 etc.) genuinely need ffmpeg
  * (absent from the JVM) and surface as `ok = false`, never a fake
  * answer.
  *
  * Scale notes: decode runs via `mapPartitions` so per-partition
  * decoder init is amortized (the Scala analog of `mapInPandas`
  * batching); keep `spark.sql.files.maxPartitionBytes` sized so one
  * partition of blobs fits executor memory; blobs over ~256 MB should
  * be pointered (path column) rather than inlined.
  */
object Multimodal {

  final case class MediaMeta(
      byteLen: Long, format: String, width: Int, height: Int, ok: Boolean)

  /** REAL image-header codec: extracts (format, width, height) from
    * the magic bytes of the three formats whose headers are trivially
    * parseable without a codec library. Malformed/truncated/unknown
    * bytes come back `ok = false`, never an exception — a 100 TB
    * corpus always contains garbage rows.
    */
  final class ImageHeaderDecoder {
    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    def decode(bytes: Array[Byte]): MediaMeta = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = MediaMeta(n, "unknown", 0, 0, ok = false)
      if (n < 10) return bad

      // PNG: 8-byte signature, first chunk must be IHDR
      // (width/height big-endian at offsets 16/20)
      val isPng = bytes(0) == 0x89.toByte && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G' && bytes(4) == 0x0d &&
        bytes(5) == 0x0a && bytes(6) == 0x1a && bytes(7) == 0x0a
      if (isPng) {
        if (bytes.length < 24 || bytes(12) != 'I' || bytes(13) != 'H' ||
            bytes(14) != 'D' || bytes(15) != 'R') return bad
        return MediaMeta(n, "png", be32(bytes, 16).toInt, be32(bytes, 20).toInt,
          ok = true)
      }

      // JPEG: SOI then marker segments; dimensions live in the first
      // SOF frame header (precision u8, height u16be, width u16be)
      if (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte) {
        var i = 2
        while (i + 3 < bytes.length) {
          if (bytes(i) != 0xff.toByte) return bad
          val marker = bytes(i + 1) & 0xff
          if (marker == 0xff) { i += 1 } // fill byte
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
            i += 2 // standalone marker, no length
          } else {
            val len = be16(bytes, i + 2)
            if (len < 2 || i + 2 + len > bytes.length) return bad
            val isSof = marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof) {
              if (len < 7) return bad
              return MediaMeta(n, "jpg",
                be16(bytes, i + 7), be16(bytes, i + 5), ok = true)
            }
            i += 2 + len
          }
        }
        return bad
      }

      // GIF: "GIF87a"/"GIF89a", logical screen w/h little-endian at 6/8
      // (13-byte minimum: header + logical screen descriptor)
      if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
          bytes(5) == 'a') {
        if (bytes.length < 13) return bad
        return MediaMeta(n, "gif", le16(bytes, 6), le16(bytes, 8), ok = true)
      }

      bad
    }
  }

  /** Deterministic fixture builders: minimal VALID file headers with
    * the requested dimensions, so oracle queries can check the parsed
    * values arithmetically while the decoder does real byte parsing.
    */
  object ImageBytes {
    def png(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(24)
      out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      out.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      out.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(2 + 4 + 2 + 11)
      out.put(Array(0xff, 0xd8).map(_.toByte))                  // SOI
      out.put(Array(0xff, 0xfe, 0x00, 0x02).map(_.toByte))      // COM, empty
      out.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11)     // SOF0
      out.put(8.toByte).putShort(h.toShort).putShort(w.toShort) // P, H, W
      out.put(1.toByte).put(Array(0x01, 0x11, 0x00).map(_.toByte))
      out.array()
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(13)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("GIF89a".getBytes("US-ASCII"))
      out.putShort(w.toShort).putShort(h.toShort)
      out.put(Array(0x00, 0x00, 0x00).map(_.toByte))
      out.array()
    }

    /** COMPLETE uncompressed 24-bit bottom-up BMP whose pixel (x, y)
      * is the fixed arithmetic pattern
      *   r = (5x + 17y + 3·id) % 256
      *   g = (11x + 3y + 2·id) % 256
      *   b = (7x + 13y + id) % 256
      * so an oracle can recompute every pixel statistic from (w, h,
      * id) alone while the decoder does real byte parsing (padding,
      * bottom-up rows, BGR order included).
      */
    def bmp(w: Int, h: Int, id: Long): Array[Byte] = {
      val stride = ((w * 3 + 3) / 4) * 4
      val size = 54 + stride * h
      val out = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(size)
        .putShort(0).putShort(0).putInt(54)                 // file header
      out.putInt(40).putInt(w).putInt(h).putShort(1)
        .putShort(24).putInt(0).putInt(stride * h)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)      // info header
      var fileRow = 0
      while (fileRow < h) {
        val y = h - 1 - fileRow // bottom-up
        var x = 0
        while (x < w) {
          out.put((((x * 7 + y * 13 + id) % 256).toInt).toByte)      // B
          out.put((((x * 11 + y * 3 + 2 * id) % 256).toInt).toByte)  // G
          out.put((((x * 5 + y * 17 + 3 * id) % 256).toInt).toByte)  // R
          x += 1
        }
        var p = w * 3
        while (p < stride) { out.put(0.toByte); p += 1 }
        fileRow += 1
      }
      out.array()
    }

    /** Real 24-bit BMP with a QUADRATIC pixel pattern — the near-dup
      * fixture for perceptual hashing. `bmp`'s linear pattern has
      * constant gradients, so every image in that family shares
      * almost the same dHash (review-caught on the first
      * mm12 fixture: cross-pattern Hamming was LOWER than
      * intra-cluster); per-image curvature coefficients (ca, cb, cc)
      * make patterns structurally distinct, while `delta` is a
      * uniform brightness regrade that dHash should (nearly) ignore.
      *   r = (ca·x² + cb·y² + cc·xy + 7x + 13y + base + delta) % 256
      *   g = (cb·x² + ca·y² + cc·xy + 3x +  5y + 2·base + delta) % 256
      *   b = ((ca+cb)·x² + cc·y² + 5x + 11y + 3·base + delta) % 256
      */
    def bmpQuad(w: Int, h: Int, ca: Int, cb: Int, cc: Int,
                base: Int, delta: Int,
                topDown: Boolean = false): Array[Byte] = {
      val stride = ((w * 3 + 3) / 4) * 4
      val size = 54 + stride * h
      val out = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(size)
        .putShort(0).putShort(0).putInt(54)
      // negative height = top-down row order: SAME pixels, different
      // bytes — the container-level re-encode that perceptual dedup
      // must collapse (e2e_stream_image_dedup's collision fixture)
      out.putInt(40).putInt(w).putInt(if (topDown) -h else h).putShort(1)
        .putShort(24).putInt(0).putInt(stride * h)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var fileRow = 0
      while (fileRow < h) {
        val y = if (topDown) fileRow else h - 1 - fileRow
        var x = 0
        while (x < w) {
          val b = ((ca + cb) * x * x + cc * y * y + 5 * x + 11 * y +
            3 * base + delta) % 256
          val g = (cb * x * x + ca * y * y + cc * x * y + 3 * x + 5 * y +
            2 * base + delta) % 256
          val r = (ca * x * x + cb * y * y + cc * x * y + 7 * x + 13 * y +
            base + delta) % 256
          out.put(b.toByte).put(g.toByte).put(r.toByte)
          x += 1
        }
        var p = w * 3
        while (p < stride) { out.put(0.toByte); p += 1 }
        fileRow += 1
      }
      out.array()
    }

    /** COMPLETE real PNG with the same arithmetic pixel pattern as
      * `bmp` (r = (5x+17y+3id)%256, g = (11x+3y+2id)%256,
      * b = (7x+13y+id)%256), encoded through the JDK's ImageIO PNG
      * writer. PNG is lossless, so any correct decoder recovers the
      * pattern bit-exactly — the oracle recomputes the stats from
      * (w, h, id) alone without ever seeing the compressed bytes
      * (whose length IS encoder-dependent, hence not oracled).
      */
    def pngFull(w: Int, h: Int, id: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((x * 5 + y * 17 + 3 * id) % 256).toInt
          val g = ((x * 11 + y * 3 + 2 * id) % 256).toInt
          val b = ((x * 7 + y * 13 + id) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** COMPLETE real GIF with the same pattern — lossless BY
      * CONSTRUCTION: the fixture images have ≤ w·h ≤ 72 distinct
      * colors, well under GIF's 256-entry palette, so encoding via an
      * exact-palette TYPE_BYTE_INDEXED image makes the JDK GIF writer
      * a bijection on these pixels (setRGB's nearest-palette-entry
      * lookup hits an exact entry for every pixel). Proves the GIF
      * reader path of ImageIoPixelDecoder on genuine pixel data, not
      * just headers.
      */
    def gifFull(w: Int, h: Int, id: Long): Array[Byte] = {
      def rgbAt(x: Int, y: Int): Int = {
        val r = ((x * 5 + y * 17 + 3 * id) % 256).toInt
        val g = ((x * 11 + y * 3 + 2 * id) % 256).toInt
        val b = ((x * 7 + y * 13 + id) % 256).toInt
        (r << 16) | (g << 8) | b
      }
      val colors = (for (y <- 0 until h; x <- 0 until w) yield rgbAt(x, y))
        .distinct.toArray
      val icm = new java.awt.image.IndexColorModel(8, colors.length,
        colors.map(c => ((c >> 16) & 0xff).toByte),
        colors.map(c => ((c >> 8) & 0xff).toByte),
        colors.map(c => (c & 0xff).toByte))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgbAt(x, y)); x += 1 }
        y += 1
      }
      // Interlace must be EXPLICITLY disabled: the JDK GIF writer
      // interlaces by default, and the JDK reader de-interlaces
      // heights < 8 incorrectly (rows come back in interlace storage
      // order — found by the mm8 oracle on every h=4 fixture).
      // Non-interlaced round-trips are exact at every size.
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
  }

  final case class AudioMeta(
      byteLen: Long, sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Long, ok: Boolean)

  /** REAL audio-header codec: walks a WAV file's RIFF chunk list and
    * extracts (sample rate, channels, bits/sample) from `fmt ` and the
    * sample count from `data` size / block align. Pure JVM, tolerant
    * of unknown chunks between them (LIST, cue, etc.); malformed or
    * truncated bytes come back `ok = false`, never an exception.
    */
  final class AudioHeaderDecoder {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    def decode(bytes: Array[Byte]): AudioMeta = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = AudioMeta(n, 0, 0, 0, 0L, ok = false)
      if (n < 12 || !tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE")) return bad
      var i = 12
      var rate = 0; var ch = 0; var bits = 0; var blockAlign = 0
      var dataLen = -1L
      while (i >= 0 && i + 8 <= bytes.length && (rate == 0 || dataLen < 0)) {
        val len = le32(bytes, i + 4) // unsigned 32-bit as Long
        if (tag(bytes, i, "fmt ")) {
          if (len < 16 || i + 8 + 16 > bytes.length) return bad
          ch = le16(bytes, i + 10)
          rate = le32(bytes, i + 12).toInt
          blockAlign = le16(bytes, i + 20)
          bits = le16(bytes, i + 22)
        } else if (tag(bytes, i, "data")) {
          dataLen = len
        }
        // Advance in LONG arithmetic: a hostile length near 2^32
        // truncated to Int goes negative, which would spin the walk
        // in place or drive the index below zero. Chunks are
        // word-aligned (odd sizes carry a pad byte); a next offset
        // past the buffer simply ends the walk — a data chunk's
        // payload is allowed to be absent (header-only blobs), its
        // length field already read.
        val next = i.toLong + 8L + len + (len & 1L)
        i = if (next > bytes.length.toLong) -1 else next.toInt
      }
      if (rate <= 0 || ch <= 0 || blockAlign <= 0 || dataLen < 0) bad
      else AudioMeta(n, rate, ch, bits, dataLen / blockAlign, ok = true)
    }
  }

  /** Minimal VALID 16-bit PCM WAV header (44 bytes + no payload — the
    * `data` length field carries the sample count; oracle queries
    * check the parsed values arithmetically).
    */
  object AudioBytes {
    def wav(sampleRate: Int, channels: Int, nSamples: Long): Array[Byte] = {
      val blockAlign = channels * 2 // 16-bit PCM
      val dataLen = nSamples * blockAlign
      val out = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt((36 + dataLen).toInt)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1) // PCM
      out.putShort(channels.toShort)
      out.putInt(sampleRate)
      out.putInt(sampleRate * blockAlign) // byte rate
      out.putShort(blockAlign.toShort)
      out.putShort(16) // bits per sample
      out.put("data".getBytes("US-ASCII")).putInt(dataLen.toInt)
      out.array()
    }

    /** COMPLETE 16-bit PCM WAV — header, a LIST chunk between `fmt `
      * and `data` (exercises the chunk walk's skip-by-size path), and
      * the full interleaved payload. Flat interleaved sample j carries
      * ((7*j + 3*id) % 4096) - 2048, so oracle queries recompute every
      * sample statistic arithmetically from (rate, ch, frames, id).
      * Total size = 56 + frames*channels*2 bytes.
      */
    def wavPcm(sampleRate: Int, channels: Int, frames: Long,
               id: Long): Array[Byte] = {
      val blockAlign = channels * 2
      val dataLen = frames * blockAlign
      val out = java.nio.ByteBuffer.allocate((56 + dataLen).toInt)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt((48 + dataLen).toInt)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1) // PCM
      out.putShort(channels.toShort)
      out.putInt(sampleRate)
      out.putInt(sampleRate * blockAlign)
      out.putShort(blockAlign.toShort)
      out.putShort(16)
      out.put("LIST".getBytes("US-ASCII")).putInt(4)
      out.put("INFO".getBytes("US-ASCII"))
      out.put("data".getBytes("US-ASCII")).putInt(dataLen.toInt)
      val total = frames * channels
      var j = 0L
      while (j < total) {
        out.putShort((((7 * j + 3 * id) % 4096) - 2048).toShort)
        j += 1
      }
      out.array()
    }

    /** `wavPcm` with every sample multiplied by an integer gain — the
      * volume-regrade fixture for audio fingerprinting (gain ≤ 8
      * keeps ±2048·8 inside 16-bit). An integer-scaled signal scales
      * every WHT coefficient by exactly the same factor, so
      * magnitude-comparison fingerprint bits are EXACTLY invariant.
      * `step` sets the sawtooth rate: the default 7 never wraps
      * inside a 64-sample window, which makes every clip a linear
      * ramp with the SAME spectrum shape (the first mm13 fixture
      * collapsed to one signature this way) — fingerprint fixtures
      * must pass a per-pattern step so wrap counts, and thus
      * spectra, differ.
      */
    def wavPcmScaled(sampleRate: Int, channels: Int, frames: Long,
                     id: Long, gain: Int, step: Long = 7L): Array[Byte] = {
      val blockAlign = channels * 2
      val dataLen = frames * blockAlign
      val out = java.nio.ByteBuffer.allocate((56 + dataLen).toInt)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt((48 + dataLen).toInt)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1)
      out.putShort(channels.toShort)
      out.putInt(sampleRate)
      out.putInt(sampleRate * blockAlign)
      out.putShort(blockAlign.toShort)
      out.putShort(16)
      out.put("LIST".getBytes("US-ASCII")).putInt(4)
      out.put("INFO".getBytes("US-ASCII"))
      out.put("data".getBytes("US-ASCII")).putInt(dataLen.toInt)
      val total = frames * channels
      var j = 0L
      while (j < total) {
        out.putShort((gain * (((step * j + 3 * id) % 4096) - 2048)).toShort)
        j += 1
      }
      out.array()
    }
  }

  final case class VideoMeta(
      byteLen: Long, timescale: Long, durationMs: Long,
      width: Int, height: Int, ok: Boolean)

  /** REAL video-container codec: walks MP4 (ISO BMFF) boxes —
    * big-endian size+fourcc — finds `moov`, reads the movie timescale
    * and duration from `mvhd` (version 0) and the presentation
    * dimensions from the first `trak`'s `tkhd` (16.16 fixed point).
    * Pure JVM; unknown boxes are skipped by size; malformed or
    * truncated bytes come back `ok = false`, never an exception.
    */
  final class VideoHeaderDecoder {
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def fourcc(b: Array[Byte], i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    def decode(bytes: Array[Byte]): VideoMeta = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = VideoMeta(n, 0L, 0L, 0, 0, ok = false)
      if (n < 16) return bad
      // find the top-level moov box
      var i = 0
      var moovStart = -1; var moovEnd = -1
      while (i + 8 <= bytes.length && moovStart < 0) {
        val size = be32(bytes, i)
        if (size < 8 || i + size > bytes.length) return bad
        if (fourcc(bytes, i + 4, "moov")) {
          moovStart = i + 8; moovEnd = i + size.toInt
        }
        i += size.toInt
      }
      if (moovStart < 0) return bad
      // walk moov children: mvhd for timescale/duration, trak>tkhd for dims
      var timescale = 0L; var duration = -1L; var w = 0; var h = 0
      var j = moovStart
      while (j + 8 <= moovEnd) {
        val size = be32(bytes, j)
        if (size < 8 || j + size > moovEnd) return bad
        if (fourcc(bytes, j + 4, "mvhd")) {
          // The box's OWN declared size must cover the fields read
          // (v0 mvhd: version/flags + ctime/mtime + timescale +
          // duration = 20 payload bytes → size ≥ 28). Bounding
          // against moovEnd alone would let an undersized mvhd with
          // trailing sibling bytes parse the NEXT box as
          // timescale/duration and come back ok=true with garbage.
          // size ≥ 28 also implies j+28 ≤ j+size ≤ moovEnd.
          if (size < 28 || bytes(j + 8) != 0) return bad // version 0 only
          timescale = be32(bytes, j + 20)
          duration = be32(bytes, j + 24)
        } else if (fourcc(bytes, j + 4, "trak") && w == 0) {
          var k = j + 8
          val trakEnd = j + size.toInt
          while (k + 8 <= trakEnd && w == 0) {
            val ts = be32(bytes, k)
            if (ts < 8 || k + ts > trakEnd) return bad
            if (fourcc(bytes, k + 4, "tkhd")) {
              // v0 tkhd: 84-byte payload; width/height 16.16 at 76/80.
              // As with mvhd, the box's own size must cover the reads
              // (ts ≥ 92 ⇒ k+92 ≤ k+ts ≤ trakEnd).
              if (ts < 92 || bytes(k + 8) != 0) return bad
              w = (be32(bytes, k + 8 + 76) >> 16).toInt
              h = (be32(bytes, k + 8 + 80) >> 16).toInt
            }
            k += ts.toInt
          }
        }
        j += size.toInt
      }
      if (timescale <= 0 || duration < 0) bad
      else VideoMeta(n, timescale, duration * 1000L / timescale, w, h, ok = true)
    }
  }

  /** Minimal VALID MP4: ftyp + moov(mvhd v0 + trak(tkhd v0)). */
  object VideoBytes {
    def mp4(timescale: Long, duration: Long, w: Int, h: Int): Array[Byte] = {
      val ftyp = java.nio.ByteBuffer.allocate(16)
      ftyp.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0x200)
      val mvhd = java.nio.ByteBuffer.allocate(8 + 100)
      mvhd.putInt(108).put("mvhd".getBytes("US-ASCII"))
        .putInt(0)                        // version 0 + flags
        .putInt(0).putInt(0)              // ctime, mtime
        .putInt(timescale.toInt).putInt(duration.toInt)
      mvhd.position(8 + 100)              // rest zeros (rate..next_track_id)
      val tkhd = java.nio.ByteBuffer.allocate(8 + 84)
      tkhd.putInt(92).put("tkhd".getBytes("US-ASCII"))
        .putInt(0)                        // version 0 + flags
      tkhd.position(8 + 76)
      tkhd.putInt(w << 16).putInt(h << 16)
      val trak = java.nio.ByteBuffer.allocate(8 + 92)
      trak.putInt(100).put("trak".getBytes("US-ASCII")).put(tkhd.array())
      val moov = java.nio.ByteBuffer.allocate(8 + 108 + 100)
      moov.putInt(8 + 108 + 100).put("moov".getBytes("US-ASCII"))
        .put(mvhd.array()).put(trak.array())
      ftyp.array() ++ moov.array()
    }
  }

  /** Shared decode plumbing: id + blob through a per-partition decoder
    * instance (the mapPartitions batch shape all three codecs use).
    */
  private def decodePartitions[M <: Product : scala.reflect.runtime.universe.TypeTag](
      df: DataFrame, binaryCol: String, idCol: String,
      mkDecoder: () => Array[Byte] => M): Dataset[(Long, M)] = {
    import df.sparkSession.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.product[M])
    df.select(col(idCol).cast("long"), col(binaryCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = mkDecoder() // init once per partition
        it.map { case (id, bytes) => (id, decode(bytes)) }
      }
  }

  /** Decode a binary column into typed video metadata with the REAL
    * MP4 box walker, one decoder instance per partition.
    */
  def decodeVideoMeta(df: DataFrame, binaryCol: String, idCol: String): DataFrame =
    decodePartitions[VideoMeta](df, binaryCol, idCol,
      () => new VideoHeaderDecoder().decode _)
      .select(col("_1").as(idCol),
        col("_2.timescale").as("timescale"), col("_2.durationMs").as("duration_ms"),
        col("_2.width").as("width"), col("_2.height").as("height"),
        col("_2.ok").as("ok"))

  /** Decode a binary column into typed audio metadata with the REAL
    * RIFF parser, one decoder instance per partition.
    */
  def decodeAudioMeta(df: DataFrame, binaryCol: String, idCol: String): DataFrame =
    decodePartitions[AudioMeta](df, binaryCol, idCol,
      () => new AudioHeaderDecoder().decode _)
      .select(col("_1").as(idCol),
        col("_2.sampleRate").as("sample_rate"), col("_2.channels").as("channels"),
        col("_2.bitsPerSample").as("bits"), col("_2.nSamples").as("n_samples"),
        col("_2.ok").as("ok"))

  /** Decode a binary column into typed metadata with the REAL header
    * parser, one decoder instance per partition.
    */
  def decodeMeta(df: DataFrame, binaryCol: String, idCol: String): DataFrame =
    decodePartitions[MediaMeta](df, binaryCol, idCol,
      () => new ImageHeaderDecoder().decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"), col("_2.format").as("format"),
        col("_2.width").as("width"), col("_2.height").as("height"),
        col("_2.ok").as("ok"))

  /** Frame-sampling shape: explode k deterministic "frames" per blob —
    * the partition/batch shape of video frame extraction.
    */
  def sampleFrames(df: DataFrame, binaryCol: String, idCol: String,
                   k: Int): DataFrame =
    df.select(col(idCol), octet_length(col(binaryCol)).as("byte_len"))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("frame_offset", col("frame_idx") * (col("byte_len") / k).cast("long"))

  // -------------------------------------------------------------------------
  // FULL-PIXEL decode — real pixels, not a stub. Two independent
  // codecs: a hand-rolled one for uncompressed 24-bit BMP
  // (BITMAPINFOHEADER, BI_RGB — this section), and ImageIoPixelDecoder
  // below for compressed PNG/JPEG/GIF via the JDK's ImageIO readers.
  // The per-pixel feature-extraction path — channel sums, luma
  // histogram, row-order-sensitive corner probe, padding handling —
  // is exercised on genuine decoded bytes in both.
  // -------------------------------------------------------------------------

  /** Exact integer pixel statistics: channel sums and a 4-bin luma
    * histogram are order-invariant sums (mergeable across partitions);
    * `cornerR` is the red channel at image coordinate (0,0) — the
    * one value that is WRONG if bottom-up row order or row padding is
    * mishandled, which the order-invariant sums cannot detect.
    */
  final case class PixelStats(
      byteLen: Long, width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long,
      luma0: Long, luma1: Long, luma2: Long, luma3: Long,
      cornerR: Int, ok: Boolean)

  /** REAL pixel codec for uncompressed 24-bit BMP: parses the file
    * header (pixel-array offset), the info header (dims, bit count,
    * compression), then walks every pixel honoring 4-byte row padding
    * and bottom-up (height > 0) vs top-down (height < 0) row order.
    * Malformed, truncated, or non-BI_RGB-24 bytes come back
    * `ok = false`, never an exception.
    */
  final class BmpPixelDecoder {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    private def bad(n: Long) = PixelStats(n, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, ok = false)

    def decode(bytes: Array[Byte]): PixelStats = {
      if (bytes == null) return bad(0)
      val n = bytes.length.toLong
      if (n < 54 || bytes(0) != 'B' || bytes(1) != 'M') return bad(n)
      val pixOff = le32(bytes, 10)
      val hdrSize = le32(bytes, 14)
      val w = le32(bytes, 18)
      val hRaw = le32(bytes, 22)
      val bitCount = le16(bytes, 28)
      val compression = le32(bytes, 30)
      val h = math.abs(hRaw)
      val topDown = hRaw < 0
      // bounds before any multiplication can be trusted: dims are
      // attacker-controlled ints (cap well under sqrt(Long.Max)).
      // h <= 0, not h == 0: math.abs(Int.MinValue) is still negative,
      // so an 0x80000000 height would pass an equality check, skip
      // the pixel loop entirely, and return garbage flagged ok=true
      // (review-caught)
      if (hdrSize < 40 || bitCount != 24 || compression != 0 ||
          w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
          pixOff < 54 || pixOff > n) return bad(n)
      val stride = ((w * 3 + 3) / 4) * 4
      if (pixOff.toLong + stride.toLong * h > n) return bad(n)
      var sumR = 0L; var sumG = 0L; var sumB = 0L
      val luma = new Array[Long](4)
      var cornerR = 0
      var fileRow = 0
      while (fileRow < h) {
        val y = if (topDown) fileRow else h - 1 - fileRow
        val rowBase = pixOff + fileRow * stride
        var x = 0
        while (x < w) {
          val i = rowBase + x * 3
          val b = bytes(i) & 0xff
          val g = bytes(i + 1) & 0xff
          val r = bytes(i + 2) & 0xff
          sumR += r; sumG += g; sumB += b
          luma(((r * 299 + g * 587 + b * 114) / 1000) >> 6) += 1
          if (x == 0 && y == 0) cornerR = r
          x += 1
        }
        fileRow += 1
      }
      PixelStats(n, w, h, sumR, sumG, sumB,
        luma(0), luma(1), luma(2), luma(3), cornerR, ok = true)
    }
  }

  /** Perceptual difference-hash (dHash) of a decoded image: luma
    * averaged over a 9-column x 8-row grid, each bit = "is cell (gx,gy)
    * brighter than its right neighbor". Uniform brightness shifts leave
    * the comparisons — and so the hash — unchanged, which is exactly
    * why pipelines dedup re-encoded/re-graded images with it. All
    * integer: cell means never materialize, the comparison
    * cross-multiplies luma sums by the neighbor cell's pixel count
    * (lsumA·nB > lsumB·nA), so the SQL oracle reproduces every bit.
    */
  final case class DHash(byteLen: Long, width: Int, height: Int,
                         hash: Long, ok: Boolean)

  /** Same hardened BMP walk as BmpPixelDecoder, accumulating per-grid-
    * cell luma sums instead of global stats. Grid mapping gx = x·9/w,
    * gy = y·8/h (integer division) — identical in the oracle.
    */
  final class BmpDHashDecoder {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def bad(n: Long) = DHash(n, 0, 0, 0L, ok = false)

    def decode(bytes: Array[Byte]): DHash = {
      if (bytes == null) return bad(0)
      val n = bytes.length.toLong
      if (n < 54 || bytes(0) != 'B' || bytes(1) != 'M') return bad(n)
      val pixOff = le32(bytes, 10)
      val hdrSize = le32(bytes, 14)
      val w = le32(bytes, 18)
      val hRaw = le32(bytes, 22)
      val bitCount = le16(bytes, 28)
      val compression = le32(bytes, 30)
      val h = math.abs(hRaw)
      val topDown = hRaw < 0
      if (hdrSize < 40 || bitCount != 24 || compression != 0 ||
          w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
          pixOff < 54 || pixOff > n) return bad(n)
      // the 9x8 grid needs at least one pixel per cell
      if (w < 9 || h < 8) return bad(n)
      val stride = ((w * 3 + 3) / 4) * 4
      if (pixOff.toLong + stride.toLong * h > n) return bad(n)
      val lsum = Array.ofDim[Long](9, 8)
      val cnt = Array.ofDim[Long](9, 8)
      var fileRow = 0
      while (fileRow < h) {
        val y = if (topDown) fileRow else h - 1 - fileRow
        val gy = y * 8 / h
        val rowBase = pixOff + fileRow * stride
        var x = 0
        while (x < w) {
          val i = rowBase + x * 3
          val b = bytes(i) & 0xff
          val g = bytes(i + 1) & 0xff
          val r = bytes(i + 2) & 0xff
          val gx = x * 9 / w
          lsum(gx)(gy) += r * 299L + g * 587L + b * 114L
          cnt(gx)(gy) += 1L
          x += 1
        }
        fileRow += 1
      }
      // 63 comparison bits, not 64: the hash stays in [0, 2^63) so
      // signed-BIGINT shift arithmetic is identical in the SQL oracle
      // (DuckDB raises on 1<<63); the dropped last comparison costs
      // nothing for blocking or distance.
      var hash = 0L
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8 && gy * 8 + gx < 63) {
          if (lsum(gx)(gy) * cnt(gx + 1)(gy) >
              lsum(gx + 1)(gy) * cnt(gx)(gy))
            hash |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      DHash(n, w, h, hash, ok = true)
    }
  }

  /** Decode a binary image column into per-image dHashes — one
    * 5-column row per blob leaves the executor.
    */
  def decodeBmpDHash(df: DataFrame, binaryCol: String, idCol: String): DataFrame =
    decodePartitions[DHash](df, binaryCol, idCol,
      () => new BmpDHashDecoder().decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.width").as("width"), col("_2.height").as("height"),
        col("_2.hash").as("hash"), col("_2.ok").as("ok"))

  /** Decode a binary column into per-image pixel statistics with the
    * REAL BMP codec, one decoder instance per partition — the same
    * batch shape as the header codecs; at 100 TB the blobs stream
    * through executors and only the 12-column stats rows shuffle.
    */
  def decodeBmpPixels(df: DataFrame, binaryCol: String, idCol: String): DataFrame =
    decodePartitions[PixelStats](df, binaryCol, idCol,
      () => new BmpPixelDecoder().decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.width").as("width"), col("_2.height").as("height"),
        col("_2.sumR").as("sum_r"), col("_2.sumG").as("sum_g"),
        col("_2.sumB").as("sum_b"),
        col("_2.luma0").as("luma0"), col("_2.luma1").as("luma1"),
        col("_2.luma2").as("luma2"), col("_2.luma3").as("luma3"),
        col("_2.cornerR").as("corner_r"), col("_2.ok").as("ok"))

  /** REAL compressed-image pixel codec, pure JVM: PNG/JPEG/GIF/BMP
    * decode through `javax.imageio` (those readers ship in the JDK —
    * no native libs), extracting the same exact-integer PixelStats as
    * BmpPixelDecoder. PNG/GIF/BMP are lossless, so decoded pixels are
    * bit-exact and oracle-checkable arithmetically; JPEG decodes
    * deterministically but lossily, so only its dimensions are
    * oracle-grade. Malformed/unknown bytes come back `ok = false`,
    * never an exception. One instance per partition; ImageIO's
    * temp-file cache is disabled so executors never touch scratch
    * disk for in-memory blobs.
    */
  final class ImageIoPixelDecoder {
    javax.imageio.ImageIO.setUseCache(false)
    private def bad(n: Long) =
      PixelStats(n, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, ok = false)

    def decode(bytes: Array[Byte]): PixelStats = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      if (n == 0) return bad(n)
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) return bad(n) // no registered reader claimed it
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0 || w > (1 << 16) || h > (1 << 16)) return bad(n)
        var sumR = 0L; var sumG = 0L; var sumB = 0L
        val luma = new Array[Long](4)
        // row-at-a-time bulk getRGB: bounded scratch (one int row), no
        // per-pixel virtual dispatch into the color model
        val row = new Array[Int](w)
        var cornerR = 0
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sumR += r; sumG += g; sumB += b
            luma(((r * 299 + g * 587 + b * 114) / 1000) >> 6) += 1
            if (x == 0 && y == 0) cornerR = r
            x += 1
          }
          y += 1
        }
        PixelStats(n, w, h, sumR, sumG, sumB,
          luma(0), luma(1), luma(2), luma(3), cornerR, ok = true)
      } catch {
        case scala.util.control.NonFatal(_) => bad(n)
      }
    }
  }

  /** Decode a binary column of compressed images (PNG/JPEG/GIF/BMP)
    * into per-image pixel statistics via ImageIO — same partition
    * shape as decodeBmpPixels.
    */
  def decodeImagePixels(df: DataFrame, binaryCol: String, idCol: String): DataFrame =
    decodePartitions[PixelStats](df, binaryCol, idCol,
      () => new ImageIoPixelDecoder().decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.width").as("width"), col("_2.height").as("height"),
        col("_2.sumR").as("sum_r"), col("_2.sumG").as("sum_g"),
        col("_2.sumB").as("sum_b"),
        col("_2.luma0").as("luma0"), col("_2.luma1").as("luma1"),
        col("_2.luma2").as("luma2"), col("_2.luma3").as("luma3"),
        col("_2.cornerR").as("corner_r"), col("_2.ok").as("ok"))

  // -------------------------------------------------------------------------
  // FULL-SAMPLE audio decode — the audio sibling of BmpPixelDecoder:
  // 16-bit PCM needs no codec library, so the per-sample
  // feature-extraction path (energy, peak, zero-crossing rate, channel
  // de-interleaving) runs on genuine decoded samples, not header
  // fields. Compressed codecs (MP3/AAC) remain header-only
  // (environment-limited: no codec libs in this container).
  // -------------------------------------------------------------------------

  /** Exact integer sample statistics. `sumAll`/`sumSqAll`/`peakAbs`
    * are order-invariant (mergeable across partitions);
    * `zeroCrossCh0` counts sign flips between CONSECUTIVE channel-0
    * frames — the one stat that is wrong if interleaving or sample
    * order is mishandled, which order-invariant sums cannot detect.
    */
  final case class PcmStats(
      byteLen: Long, sampleRate: Int, channels: Int, nFrames: Long,
      sumAll: Long, sumSqAll: Long, peakAbs: Int, zeroCrossCh0: Long,
      ok: Boolean)

  /** The shared full-payload RIFF/WAVE walk: chunk list (tolerant of
    * unknown chunks between `fmt ` and `data`), 16-bit integer PCM
    * only, payload fully present. One parser for the three decoders
    * that read sample bytes (stats, WHT spectrum, fingerprint), so
    * the malformed-input surface is hardened exactly once.
    */
  private[extras] object WavHeader {
    final case class Info(rate: Int, ch: Int, blockAlign: Int,
                          dataOff: Long, dataLen: Long) {
      def frames: Long = dataLen / blockAlign
    }
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    def parse(bytes: Array[Byte]): Option[Info] = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      if (n < 12 || !tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE"))
        return None
      var i = 12
      var rate = 0; var ch = 0; var bits = 0; var blockAlign = 0
      var dataOff = -1L; var dataLen = -1L
      while (i >= 0 && i + 8 <= bytes.length && (rate == 0 || dataOff < 0)) {
        val len = le32(bytes, i + 4)
        if (tag(bytes, i, "fmt ")) {
          if (len < 16 || i + 8 + 16 > bytes.length) return None
          ch = le16(bytes, i + 10)
          rate = le32(bytes, i + 12).toInt
          blockAlign = le16(bytes, i + 20)
          bits = le16(bytes, i + 22)
        } else if (tag(bytes, i, "data")) {
          dataOff = i + 8L
          dataLen = len
        }
        // LONG arithmetic: hostile 32-bit lengths must not wrap (same
        // rationale as AudioHeaderDecoder's walk)
        val next = i.toLong + 8L + len + (len & 1L)
        i = if (next > bytes.length.toLong) -1 else next.toInt
      }
      // the PAYLOAD must be fully present — these decoders read every
      // sample byte
      if (rate <= 0 || ch <= 0 || bits != 16 || blockAlign != ch * 2 ||
          dataOff < 0 || dataLen < 0 || dataOff + dataLen > n) None
      else Some(Info(rate, ch, blockAlign, dataOff, dataLen))
    }
  }

  /** REAL PCM codec: the shared WavHeader walk, then every
    * little-endian signed sample decoded into exact integer stats.
    * Malformed, truncated, or non-16-bit bytes come back `ok = false`,
    * never an exception.
    */
  final class WavPcmDecoder {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    def decode(bytes: Array[Byte]): PcmStats = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = PcmStats(n, 0, 0, 0L, 0L, 0L, 0, 0L, ok = false)
      val info = WavHeader.parse(bytes) match {
        case None => return bad
        case Some(v) => v
      }
      val rate = info.rate; val ch = info.ch
      val dataOff = info.dataOff
      val frames = info.frames
      val total = frames * ch
      var sum = 0L; var sumSq = 0L; var peak = 0; var zc = 0L
      var havePrev = false; var prevNeg = false
      var j = 0L
      while (j < total) {
        // signed 16-bit: sign-extend via toShort (abs of -32768 is
        // 32768 — already an Int here, no MinValue trap)
        val v = le16(bytes, (dataOff + 2 * j).toInt).toShort.toInt
        sum += v; sumSq += v.toLong * v
        val a = math.abs(v); if (a > peak) peak = a
        if (j % ch == 0) {
          val neg = v < 0
          if (havePrev && neg != prevNeg) zc += 1
          prevNeg = neg; havePrev = true
        }
        j += 1
      }
      PcmStats(n, rate, ch, frames, sum, sumSq, peak, zc, ok = true)
    }
  }

  /** Decode a binary column into per-clip PCM statistics with the REAL
    * WAV codec, one decoder instance per partition — blobs stream
    * through executors, only the 9-column stats rows come back.
    */
  def decodeWavPcm(df: DataFrame, binaryCol: String, idCol: String): DataFrame =
    decodePartitions[PcmStats](df, binaryCol, idCol,
      () => new WavPcmDecoder().decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.sampleRate").as("sample_rate"),
        col("_2.channels").as("channels"),
        col("_2.nFrames").as("n_frames"),
        col("_2.sumAll").as("sum_all"), col("_2.sumSqAll").as("sumsq_all"),
        col("_2.peakAbs").as("peak_abs"),
        col("_2.zeroCrossCh0").as("zc_ch0"), col("_2.ok").as("ok"))

  /** Integer-exact 64-point Walsh–Hadamard sequency analysis of a
    * clip's channel-0 PCM: 8 band energies over the natural-ordered
    * coefficients c_k = Σ_j v_j·(−1)^popcount(j∧k). All arithmetic is
    * 64-bit integer (|v|≤32768 ⇒ |c|≤2^21, Σc² ≤ 2^45), so Spark and
    * the SQL oracle agree bit-for-bit — the audio analog of the
    * integer-frozen pixel stats. ok=false mirrors WavPcmDecoder's
    * malformed-input contract plus a <64-mono-samples floor.
    */
  final case class SpectrumStats(
      byteLen: Long, sampleRate: Int, channels: Int,
      b0: Long, b1: Long, b2: Long, b3: Long,
      b4: Long, b5: Long, b6: Long, b7: Long, ok: Boolean)

  /** Re-walks the RIFF chunks like WavPcmDecoder, takes the FIRST 64
    * channel-0 samples, and runs the in-place fast Walsh–Hadamard
    * butterfly — O(N log N), the transform shape that still holds when
    * a clip is minutes long instead of 64 samples.
    */
  final class WavSpectrumDecoder {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    def decode(bytes: Array[Byte]): SpectrumStats = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = SpectrumStats(n, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, ok = false)
      val info = WavHeader.parse(bytes) match {
        case None => return bad
        case Some(v) => v
      }
      val rate = info.rate; val ch = info.ch; val dataOff = info.dataOff
      if (info.frames < 64) return bad
      val c = new Array[Long](64)
      var j = 0
      while (j < 64) {
        c(j) = le16(bytes, (dataOff + 2L * j * ch).toInt).toShort.toLong
        j += 1
      }
      // in-place fast Walsh–Hadamard butterfly (natural order)
      var h = 1
      while (h < 64) {
        var base = 0
        while (base < 64) {
          var k = base
          while (k < base + h) {
            val x = c(k); val y = c(k + h)
            c(k) = x + y; c(k + h) = x - y
            k += 1
          }
          base += h * 2
        }
        h *= 2
      }
      def band(b: Int): Long = {
        var e = 0L; var k = b * 8
        while (k < b * 8 + 8) { e += c(k) * c(k); k += 1 }
        e
      }
      SpectrumStats(n, rate, ch, band(0), band(1), band(2), band(3),
        band(4), band(5), band(6), band(7), ok = true)
    }
  }

  /** Haitsma–Kalker-style sign-bit audio fingerprint over the WHT
    * coefficients of the first 64 channel-0 samples: bit k (k < 63) =
    * |c_k| > |c_{k+1}|. Comparisons are scale-free — an integer volume
    * regrade multiplies every coefficient by the same gain and flips
    * no bit — and stay in [0, 2^63) for exact signed-BIGINT SQL
    * mirroring (same 63-bit contract as the image dHash).
    */
  final case class AudioFp(byteLen: Long, sampleRate: Int, channels: Int,
                           sig: Long, ok: Boolean)

  final class WavFingerprintDecoder {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    def decode(bytes: Array[Byte]): AudioFp = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = AudioFp(n, 0, 0, 0L, ok = false)
      val info = WavHeader.parse(bytes) match {
        case None => return bad
        case Some(v) => v
      }
      val rate = info.rate; val ch = info.ch; val dataOff = info.dataOff
      if (info.frames < 64) return bad
      val c = new Array[Long](64)
      var j = 0
      while (j < 64) {
        c(j) = le16(bytes, (dataOff + 2L * j * ch).toInt).toShort.toLong
        j += 1
      }
      var h = 1
      while (h < 64) {
        var base = 0
        while (base < 64) {
          var k = base
          while (k < base + h) {
            val x = c(k); val y = c(k + h)
            c(k) = x + y; c(k + h) = x - y
            k += 1
          }
          base += h * 2
        }
        h *= 2
      }
      var sig = 0L
      var k = 0
      while (k < 63) {
        if (math.abs(c(k)) > math.abs(c(k + 1))) sig |= 1L << k
        k += 1
      }
      AudioFp(n, rate, ch, sig, ok = true)
    }
  }

  /** Decode a binary audio column into per-clip fingerprints — one
    * 5-column row per blob leaves the executor.
    */
  def decodeWavFingerprint(df: DataFrame, binaryCol: String, idCol: String): DataFrame =
    decodePartitions[AudioFp](df, binaryCol, idCol,
      () => new WavFingerprintDecoder().decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.sampleRate").as("sample_rate"),
        col("_2.channels").as("channels"),
        col("_2.sig").as("sig"), col("_2.ok").as("ok"))

  /** Decode a binary audio column into per-clip Walsh–Hadamard band
    * energies — same partition-local streaming shape as decodeWavPcm.
    */
  def decodeWavSpectrum(df: DataFrame, binaryCol: String, idCol: String): DataFrame =
    decodePartitions[SpectrumStats](df, binaryCol, idCol,
      () => new WavSpectrumDecoder().decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.sampleRate").as("sample_rate"),
        col("_2.channels").as("channels"),
        col("_2.b0").as("b0"), col("_2.b1").as("b1"),
        col("_2.b2").as("b2"), col("_2.b3").as("b3"),
        col("_2.b4").as("b4"), col("_2.b5").as("b5"),
        col("_2.b6").as("b6"), col("_2.b7").as("b7"),
        col("_2.ok").as("ok"))

  // -------------------------------------------------------------------------
  // REAL video frame extraction — uncompressed AVI ('DIB ' codec).
  // mm4 walks MP4 box headers; this decodes actual FRAMES: RIFF/AVI
  // is the one mainstream video container whose uncompressed form
  // ('00db' chunks of raw bottom-up BGR DIBs) needs no codec library,
  // so frame sampling + per-frame pixel stats are honestly computable
  // pure-JVM. MJPEG AVI is additionally decodable pure-JVM
  // (MjpegFrameDecoder below — each chunk is a standalone JPEG for
  // the JDK's ImageIO reader); inter-frame codecs (H.264 etc.) still
  // need ffmpeg and come back ok=false.
  // -------------------------------------------------------------------------

  /** Exact integer per-frame pixel statistics (same stat set as
    * PixelStats so image and video share the oracle arithmetic).
    */
  final case class FrameStats(
      frameIdx: Int, sumR: Long, sumG: Long, sumB: Long,
      luma0: Long, luma1: Long, luma2: Long, luma3: Long, cornerR: Int)

  /** Result of walking one AVI blob: container metadata + the sampled
    * frames' stats. `nFrames` counts ALL video chunks in `movi`;
    * `frames` holds every `sampleEvery`-th one, pixel-decoded.
    */
  final case class AviFrames(
      byteLen: Long, width: Int, height: Int, nFrames: Int,
      frames: Seq[FrameStats], ok: Boolean)

  /** REAL AVI frame codec: verifies RIFF/'AVI ', walks `hdrl` to the
    * video stream's BITMAPINFOHEADER (`strl`→`strf`; 24-bit BI_RGB
    * only), then iterates the `movi` list's `00db`/`00dc` chunks,
    * honoring RIFF word alignment, and pixel-decodes every
    * `sampleEvery`-th frame — bottom-up row order, 4-byte row
    * padding, BGR channel order, exactly the DIB rules BmpPixelDecoder
    * proves on still images. Malformed, truncated, or codec-compressed
    * bytes come back `ok = false`, never an exception.
    *
    * Frame sampling happens INSIDE the byte walk: an unsampled frame
    * costs one chunk-header skip, no pixel reads — the shape that
    * matters when one blob holds thousands of frames.
    */
  /** Pass-1 of the AVI walk, shared by the frame-stats and
    * frame-dHash decoders: RIFF/'AVI ' validation, `hdrl`→`strl`→
    * `strf` for the video BITMAPINFOHEADER (24-bit BI_RGB only,
    * bounded dims), and the `movi` extent. None = malformed.
    */
  private[extras] object AviHeader {
    /** `codec` is "dib" (raw 24-bit BI_RGB bottom-up DIB frames),
      * "mjpg" (each movi chunk a standalone JPEG — decodable with the
      * JDK's own ImageIO JPEG reader, no ffmpeg), or "rle8"
      * (Microsoft RLE8, biCompression=BI_RLE8: 8-bit paletted frames
      * with run/absolute/EOL/EOB/delta opcodes — the one mainstream
      * INTER-FRAME codec whose spec is simple enough to decode pure
      * JVM; `palette` holds its 0xRRGGBB entries). */
    final case class Info(w: Int, h: Int, moviStart: Int, moviEnd: Int,
                          codec: String,
                          palette: Array[Int] = Array.emptyIntArray)
    /** 'MJPG' as a little-endian BITMAPINFOHEADER biCompression. */
    private val MjpgFourcc = 0x47504A4D
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    def parse(bytes: Array[Byte]): Option[Info] = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      if (n < 24 || !tag(bytes, 0, "RIFF") || !tag(bytes, 8, "AVI "))
        return None
      val riffEnd = math.min(n.toInt, 8 + le32(bytes, 4))
      var w = 0; var h = 0; var codec = ""
      var palette: Array[Int] = Array.emptyIntArray
      var i = 12
      var moviStart = -1; var moviEnd = -1
      while (i + 8 <= riffEnd) {
        val ck = le32(bytes, i + 4)
        if (ck < 0 || i + 8 + ck > riffEnd) return None
        if (tag(bytes, i, "LIST") && ck >= 4) {
          if (tag(bytes, i + 8, "hdrl")) {
            // walk hdrl children for LIST/strl, then strh+strf
            var j = i + 12
            val hdrlEnd = i + 8 + ck
            while (j + 8 <= hdrlEnd && w == 0) {
              val sk = le32(bytes, j + 4)
              if (sk < 0 || j + 8 + sk > hdrlEnd) return None
              if (tag(bytes, j, "LIST") && sk >= 4 && tag(bytes, j + 8, "strl")) {
                var k = j + 12
                val strlEnd = j + 8 + sk
                var isVids = false
                while (k + 8 <= strlEnd && w == 0) {
                  val ek = le32(bytes, k + 4)
                  if (ek < 0 || k + 8 + ek > strlEnd) return None
                  if (tag(bytes, k, "strh") && ek >= 8)
                    isVids = tag(bytes, k + 8, "vids")
                  else if (tag(bytes, k, "strf") && isVids) {
                    // BITMAPINFOHEADER: size/width/height/planes/
                    // bitCount/compression at 0/4/8/12/14/16
                    if (ek < 40) return None
                    val bw = le32(bytes, k + 8 + 4)
                    val bh = le32(bytes, k + 8 + 8)
                    val bits = le16(bytes, k + 8 + 14)
                    val comp = le32(bytes, k + 8 + 16)
                    // DIB frames are bottom-up (bh > 0) 24-bit BI_RGB;
                    // MJPG chunks carry their own dims in the JPEG.
                    // Dims are attacker-controlled — bound well under
                    // sqrt(Int.Max) before any stride multiplication.
                    if (bw <= 0 || bh <= 0 || bw > (1 << 14) ||
                        bh > (1 << 14))
                      return None
                    if (bits == 24 && comp == 0) codec = "dib"
                    else if (comp == MjpgFourcc) codec = "mjpg"
                    else if (bits == 8 && comp == 1) {
                      // BI_RLE8: palette follows the 40-byte header
                      // as RGBQUADs (B,G,R,reserved); biClrUsed at
                      // header offset 32, 0 meaning a full 256
                      codec = "rle8"
                      val used0 = le32(bytes, k + 8 + 32)
                      val used = if (used0 == 0) 256 else used0
                      if (used < 0 || used > 256 ||
                          ek < 40 + 4 * used) return None
                      palette = Array.tabulate(used) { pi =>
                        val o = k + 8 + 40 + 4 * pi
                        ((bytes(o + 2) & 0xff) << 16) |
                          ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
                      }
                    } else return None
                    w = bw; h = bh
                  }
                  k += 8 + ek + (ek & 1) // RIFF chunks are word-aligned
                }
              }
              j += 8 + sk + (sk & 1)
            }
          } else if (tag(bytes, i + 8, "movi")) {
            moviStart = i + 12; moviEnd = i + 8 + ck
          }
        }
        i += 8 + ck + (ck & 1)
      }
      if (w == 0 || moviStart < 0) None
      else Some(Info(w, h, moviStart, moviEnd, codec, palette))
    }
  }

  final class AviFrameDecoder(sampleEvery: Int) {
    require(sampleEvery >= 1)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    def decode(bytes: Array[Byte]): AviFrames = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = AviFrames(n, 0, 0, 0, Nil, ok = false)
      val info = AviHeader.parse(bytes) match {
        case None => return bad
        case Some(v) => v
      }
      if (info.codec != "dib") return bad // MJPEG -> MjpegFrameDecoder
      val w = info.w; val h = info.h
      val moviStart = info.moviStart; val moviEnd = info.moviEnd
      val stride = ((w * 3 + 3) / 4) * 4
      val frameBytes = stride * h
      // pass 2: walk movi chunks, decode every sampleEvery-th frame
      var frameIdx = 0
      val out = Seq.newBuilder[FrameStats]
      var p = moviStart
      while (p + 8 <= moviEnd) {
        val ck = le32(bytes, p + 4)
        if (ck < 0 || p + 8 + ck > moviEnd) return bad
        if (tag(bytes, p, "00db") || tag(bytes, p, "00dc")) {
          if (ck != frameBytes) return bad // compressed or torn frame
          if (frameIdx % sampleEvery == 0) {
            var sumR = 0L; var sumG = 0L; var sumB = 0L
            val luma = new Array[Long](4)
            var cornerR = 0
            var fileRow = 0
            while (fileRow < h) {
              val y = h - 1 - fileRow // DIB frames are bottom-up
              val rowBase = p + 8 + fileRow * stride
              var x = 0
              while (x < w) {
                val q = rowBase + x * 3
                val b = bytes(q) & 0xff
                val g = bytes(q + 1) & 0xff
                val r = bytes(q + 2) & 0xff
                sumR += r; sumG += g; sumB += b
                luma(((r * 299 + g * 587 + b * 114) / 1000) >> 6) += 1
                if (x == 0 && y == 0) cornerR = r
                x += 1
              }
              fileRow += 1
            }
            out += FrameStats(frameIdx, sumR, sumG, sumB,
              luma(0), luma(1), luma(2), luma(3), cornerR)
          }
          frameIdx += 1
        }
        p += 8 + ck + (ck & 1)
      }
      if (frameIdx == 0) bad
      else AviFrames(n, w, h, frameIdx, out.result(), ok = true)
    }
  }

  /** MS-RLE8 inter-frame video decode, pure JVM — the codec class the
    * DIB/MJPEG pair cannot represent: frames carry FORWARD state. An
    * RLE8 frame is opcodes over a persistent canvas of palette
    * indices:
    *
    *   count>0, idx         — paint `count` pixels of palette[idx]
    *   0x00 0x00            — end of line (rest of row UNTOUCHED)
    *   0x00 0x01            — end of bitmap (rest of frame UNTOUCHED)
    *   0x00 0x02 dx dy      — delta: skip right dx, up dy rows
    *                          (skipped pixels UNTOUCHED)
    *   0x00 n>=3, n indices — absolute run (word-aligned)
    *
    * "Untouched" means the PREDECESSOR FRAME's pixels show through —
    * the inter-frame carry this decoder exists for. Rows are
    * bottom-up like every DIB. Stats per sampled frame are the same
    * exact-integer set as AviFrameDecoder (palette-expanded RGB), so
    * image/dib-video/rle-video share the oracle arithmetic.
    * Malformed opcodes, out-of-canvas paints, truncated chunks →
    * ok = false, never an exception.
    */
  final class Rle8FrameDecoder(sampleEvery: Int) {
    require(sampleEvery >= 1)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    def decode(bytes: Array[Byte]): AviFrames = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = AviFrames(n, 0, 0, 0, Nil, ok = false)
      val info = AviHeader.parse(bytes) match {
        case None => return bad
        case Some(v) => v
      }
      if (info.codec != "rle8") return bad
      val w = info.w; val h = info.h
      val pal = info.palette
      // the persistent canvas: palette indices, file-row-major,
      // index 0 everywhere before the first frame (keyframes are
      // expected to cover it; an uncovered pixel is palette[0])
      val canvas = new Array[Byte](w * h)
      var frameIdx = 0
      val out = Seq.newBuilder[FrameStats]
      var p = info.moviStart
      while (p + 8 <= info.moviEnd) {
        val ck = le32(bytes, p + 4)
        if (ck < 0 || p + 8 + ck > info.moviEnd) return bad
        if (tag(bytes, p, "00dc") || tag(bytes, p, "00db")) {
          // apply this frame's opcodes to the canvas
          var q = p + 8
          val qEnd = p + 8 + ck
          var x = 0
          var yf = 0 // file row (bottom-up)
          var done = false
          while (!done) {
            if (q + 2 > qEnd) return bad // opcodes are 2-byte aligned
            val b0 = bytes(q) & 0xff
            val b1 = bytes(q + 1) & 0xff
            q += 2
            if (b0 > 0) { // encoded run
              if (yf >= h || x + b0 > w) return bad
              java.util.Arrays.fill(canvas, yf * w + x, yf * w + x + b0,
                b1.toByte)
              x += b0
            } else b1 match {
              case 0 => yf += 1; x = 0 // end of line
              case 1 => done = true    // end of bitmap
              case 2 =>                // delta
                if (q + 2 > qEnd) return bad
                x += bytes(q) & 0xff
                yf += bytes(q + 1) & 0xff
                q += 2
                if (x > w || yf > h) return bad
              case abs =>              // absolute mode, word-aligned
                val len = abs + (abs & 1)
                if (q + len > qEnd || yf >= h || x + abs > w) return bad
                var i2 = 0
                while (i2 < abs) {
                  canvas(yf * w + x + i2) = bytes(q + i2)
                  i2 += 1
                }
                q += len
                x += abs
            }
          }
          if (frameIdx % sampleEvery == 0) {
            var sumR = 0L; var sumG = 0L; var sumB = 0L
            val luma = new Array[Long](4)
            var cornerR = 0
            var yf2 = 0
            while (yf2 < h) {
              val y = h - 1 - yf2 // visual row
              var x2 = 0
              while (x2 < w) {
                val idx = canvas(yf2 * w + x2) & 0xff
                if (idx >= pal.length) return bad
                val rgb = pal(idx)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                sumR += r; sumG += g; sumB += b
                luma(((r * 299 + g * 587 + b * 114) / 1000) >> 6) += 1
                if (x2 == 0 && y == 0) cornerR = r
                x2 += 1
              }
              yf2 += 1
            }
            out += FrameStats(frameIdx, sumR, sumG, sumB,
              luma(0), luma(1), luma(2), luma(3), cornerR)
          }
          frameIdx += 1
        }
        p += 8 + ck + (ck & 1)
      }
      if (frameIdx == 0) bad
      else AviFrames(n, w, h, frameIdx, out.result(), ok = true)
    }
  }

  /** One sampled MJPEG frame: the JPEG's own decoded dims plus a
    * coarse mean-luma bucket (mean over all pixels, quantized to
    * 40-level bins). JPEG decode is lossy, so per-pixel sums are not
    * oracle arithmetic — but dims are exact and a solid-tone frame's
    * mean luma lands within ±2 of the encoded tone, far inside a
    * 40-wide bucket, so the bucket IS tolerance-free cross-engine
    * arithmetic.
    */
  final case class MjpegFrame(frameIdx: Int, frameW: Int, frameH: Int,
                              lumaBucket: Int)

  final case class MjpegFrames(
      byteLen: Long, width: Int, height: Int, nFrames: Int,
      frames: Seq[MjpegFrame], ok: Boolean)

  /** REAL codec-compressed video frame decode, pure JVM: MJPEG-in-AVI
    * ('MJPG' biCompression), where every `00dc` movi chunk is a
    * STANDALONE JPEG — the JDK's own ImageIO JPEG reader decodes it,
    * no ffmpeg. Same two-pass shape as AviFrameDecoder: AviHeader
    * walks the container once, then every `sampleEvery`-th chunk is
    * sliced and handed to ImageIO; unsampled frames cost one
    * chunk-header skip, no decode. Malformed containers, non-MJPEG
    * codecs, and undecodable chunk bytes come back `ok = false`,
    * never an exception. This retires the last multimodal stub: with
    * it, image (BMP/PNG/GIF/JPEG), audio (WAV/AIFF) and video
    * (DIB-AVI, MJPEG-AVI) all decode real payloads.
    */
  final class MjpegFrameDecoder(sampleEvery: Int) {
    require(sampleEvery >= 1)
    javax.imageio.ImageIO.setUseCache(false)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    def decode(bytes: Array[Byte]): MjpegFrames = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = MjpegFrames(n, 0, 0, 0, Nil, ok = false)
      val info = AviHeader.parse(bytes) match {
        case None => return bad
        case Some(v) => v
      }
      if (info.codec != "mjpg") return bad
      var frameIdx = 0
      val out = Seq.newBuilder[MjpegFrame]
      var p = info.moviStart
      while (p + 8 <= info.moviEnd) {
        val ck = le32(bytes, p + 4)
        if (ck < 0 || p + 8 + ck > info.moviEnd) return bad
        if (tag(bytes, p, "00dc") || tag(bytes, p, "00db")) {
          if (frameIdx % sampleEvery == 0) {
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes, p + 8, ck))
              if (img == null) return bad
              val fw = img.getWidth; val fh = img.getHeight
              if (fw <= 0 || fh <= 0 || fw > (1 << 14) || fh > (1 << 14))
                return bad
              var lsum = 0L
              val row = new Array[Int](fw)
              var y = 0
              while (y < fh) {
                img.getRGB(0, y, fw, 1, row, 0, fw)
                var x = 0
                while (x < fw) {
                  val rgb = row(x)
                  lsum += (((rgb >> 16) & 0xff) * 299 +
                    ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                  x += 1
                }
                y += 1
              }
              val mean = (lsum / (fw.toLong * fh)).toInt
              out += MjpegFrame(frameIdx, fw, fh, (mean + 20) / 40)
            } catch {
              case scala.util.control.NonFatal(_) => return bad
            }
          }
          frameIdx += 1
        }
        p += 8 + ck + (ck & 1)
      }
      if (frameIdx == 0) bad
      else MjpegFrames(n, info.w, info.h, frameIdx, out.result(), ok = true)
    }
  }

  /** Clip-level perceptual hash: per-sampled-frame dHash (identical
    * 9x8-grid integer rules as BmpDHashDecoder), then a MAJORITY vote
    * per bit across the sampled frames — the standard way a clip
    * signature absorbs per-frame noise. Same 63-bit positive-BIGINT
    * contract as the image/audio fingerprints.
    */
  final case class VideoHash(byteLen: Long, width: Int, height: Int,
                             nSampled: Int, hash: Long, ok: Boolean)

  final class AviDHashDecoder(sampleEvery: Int) {
    require(sampleEvery >= 1)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    def decode(bytes: Array[Byte]): VideoHash = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = VideoHash(n, 0, 0, 0, 0L, ok = false)
      val info = AviHeader.parse(bytes) match {
        case None => return bad
        case Some(v) => v
      }
      if (info.codec != "dib") return bad // MJPEG -> MjpegFrameDecoder
      val w = info.w; val h = info.h
      if (w < 9 || h < 8) return bad
      val stride = ((w * 3 + 3) / 4) * 4
      val frameBytes = stride * h
      val bitVotes = new Array[Int](63)
      var sampled = 0
      var frameIdx = 0
      var p = info.moviStart
      while (p + 8 <= info.moviEnd) {
        val ck = le32(bytes, p + 4)
        if (ck < 0 || p + 8 + ck > info.moviEnd) return bad
        if (tag(bytes, p, "00db") || tag(bytes, p, "00dc")) {
          if (ck != frameBytes) return bad // compressed or torn frame
          if (frameIdx % sampleEvery == 0) {
            val lsum = Array.ofDim[Long](9, 8)
            val cnt = Array.ofDim[Long](9, 8)
            var fileRow = 0
            while (fileRow < h) {
              val y = h - 1 - fileRow // DIB frames are bottom-up
              val gy = y * 8 / h
              val rowBase = p + 8 + fileRow * stride
              var x = 0
              while (x < w) {
                val q = rowBase + x * 3
                val b = bytes(q) & 0xff
                val g = bytes(q + 1) & 0xff
                val r = bytes(q + 2) & 0xff
                val gx = x * 9 / w
                lsum(gx)(gy) += r * 299L + g * 587L + b * 114L
                cnt(gx)(gy) += 1L
                x += 1
              }
              fileRow += 1
            }
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 8 && gy * 8 + gx < 63) {
                if (lsum(gx)(gy) * cnt(gx + 1)(gy) >
                    lsum(gx + 1)(gy) * cnt(gx)(gy))
                  bitVotes(gy * 8 + gx) += 1
                gx += 1
              }
              gy += 1
            }
            sampled += 1
          }
          frameIdx += 1
        }
        p += 8 + ck + (ck & 1)
      }
      if (sampled == 0) return bad
      var hash = 0L
      var k = 0
      while (k < 63) {
        if (2 * bitVotes(k) > sampled) hash |= 1L << k
        k += 1
      }
      VideoHash(n, w, h, sampled, hash, ok = true)
    }
  }

  /** Result of an integer box-filter downscale: output dims, per-
    * channel sums of the RESIZED image, and a position-weighted
    * checksum (weight 1 + ox + 8*oy per output pixel — the 8 multiplier
    * makes the weight INJECTIVE on the 8-wide output grid; 7 collided
    * for e.g. (7,0) vs (0,1), hiding a row-wrap stride bug,
    * review-caught) that catches a transposed, flipped, or
    * mis-strided resize which bare channel sums cannot.
    */
  final case class ResizedStats(byteLen: Long, outW: Int, outH: Int,
                                sumR: Long, sumG: Long, sumB: Long,
                                wsum: Long, ok: Boolean)

  /** REAL image resize: decode the BMP (same hardened walk as the
    * pixel decoders), then a `factor`x`factor` box-filter downscale in
    * EXACT integer arithmetic — each output pixel is the floor mean of
    * its box (sum div factor², every box full because dims must divide
    * evenly). The feature-extraction "resize" step of the multimodal
    * brief with bit-reproducible semantics the SQL oracle replays.
    */
  final class BmpResizeDecoder(factor: Int) {
    require(factor >= 1)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def bad(n: Long) = ResizedStats(n, 0, 0, 0, 0, 0, 0, ok = false)

    def decode(bytes: Array[Byte]): ResizedStats = {
      if (bytes == null) return bad(0)
      val n = bytes.length.toLong
      if (n < 54 || bytes(0) != 'B' || bytes(1) != 'M') return bad(n)
      val pixOff = le32(bytes, 10)
      val hdrSize = le32(bytes, 14)
      val w = le32(bytes, 18)
      val hRaw = le32(bytes, 22)
      val bitCount = le16(bytes, 28)
      val compression = le32(bytes, 30)
      val h = math.abs(hRaw)
      val topDown = hRaw < 0
      if (hdrSize < 40 || bitCount != 24 || compression != 0 ||
          w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
          pixOff < 54 || pixOff > n) return bad(n)
      if (w % factor != 0 || h % factor != 0) return bad(n)
      val stride = ((w * 3 + 3) / 4) * 4
      if (pixOff.toLong + stride.toLong * h > n) return bad(n)
      val ow = w / factor; val oh = h / factor
      // box sums per output pixel, channel-major boxes
      val boxR = Array.ofDim[Long](ow, oh)
      val boxG = Array.ofDim[Long](ow, oh)
      val boxB = Array.ofDim[Long](ow, oh)
      var fileRow = 0
      while (fileRow < h) {
        val y = if (topDown) fileRow else h - 1 - fileRow
        val oy = y / factor
        val rowBase = pixOff + fileRow * stride
        var x = 0
        while (x < w) {
          val i = rowBase + x * 3
          val ox = x / factor
          boxB(ox)(oy) += bytes(i) & 0xff
          boxG(ox)(oy) += bytes(i + 1) & 0xff
          boxR(ox)(oy) += bytes(i + 2) & 0xff
          x += 1
        }
        fileRow += 1
      }
      val area = factor.toLong * factor
      var sumR = 0L; var sumG = 0L; var sumB = 0L; var wsum = 0L
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          val r = boxR(ox)(oy) / area
          val g = boxG(ox)(oy) / area
          val b = boxB(ox)(oy) / area
          sumR += r; sumG += g; sumB += b
          wsum += (r + g + b) * (1L + ox + 8L * oy)
          ox += 1
        }
        oy += 1
      }
      ResizedStats(n, ow, oh, sumR, sumG, sumB, wsum, ok = true)
    }
  }

  /** Resize a binary image column with the REAL decoder — one 8-column
    * stats row per blob leaves the executor.
    */
  def decodeBmpResized(df: DataFrame, binaryCol: String, idCol: String,
                       factor: Int): DataFrame =
    decodePartitions[ResizedStats](df, binaryCol, idCol,
      () => new BmpResizeDecoder(factor).decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.outW").as("out_w"), col("_2.outH").as("out_h"),
        col("_2.sumR").as("sum_r2"), col("_2.sumG").as("sum_g2"),
        col("_2.sumB").as("sum_b2"),
        col("_2.wsum").as("wsum"), col("_2.ok").as("ok"))

  /** Result of integer decimation: the output rate/frame count and
    * exact stats of the RESAMPLED channel-0 signal (sum, sum of
    * squares, position-weighted checksum — the 1+j weight catches a
    * phase-shifted or reversed decimation).
    */
  final case class ResampledStats(byteLen: Long, inRate: Int,
                                  outRate: Int, outFrames: Long,
                                  sum2: Long, sumSq2: Long, wsum: Long,
                                  ok: Boolean)

  /** REAL audio downsampling: the shared WavHeader walk, then
    * decimation of channel 0 by `factor` with a box anti-alias — each
    * output sample is the truncated mean of its `factor` consecutive
    * input frames (exact integers, toward-zero division matching
    * SQL's //; trailing partial boxes dropped).
    * The audio analog of the mm16 image resize: the 44.1k->16k-style
    * preprocessing step with bit-reproducible semantics.
    */
  final class WavResampleDecoder(factor: Int) {
    require(factor >= 1)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    def decode(bytes: Array[Byte]): ResampledStats = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = ResampledStats(n, 0, 0, 0L, 0L, 0L, 0L, ok = false)
      val info = WavHeader.parse(bytes) match {
        case None => return bad
        case Some(v) => v
      }
      val outFrames = info.frames / factor
      if (outFrames == 0) return bad
      var sum2 = 0L; var sumSq2 = 0L; var wsum = 0L
      var o = 0L
      while (o < outFrames) {
        var acc = 0L
        var k = 0
        while (k < factor) {
          // channel-0 sample of input frame o*factor+k
          acc += le16(bytes,
            (info.dataOff + 2L * ((o * factor + k) * info.ch)).toInt)
            .toShort.toLong
          k += 1
        }
        // plain /, not floorDiv: DuckDB's integer // TRUNCATES toward
        // zero on negatives (-7//4 = -1), matching Java's / — a floor
        // here diverges by 1 on every negative box (verified against
        // the oracle both ways)
        val v = acc / factor
        sum2 += v; sumSq2 += v * v; wsum += v * (1L + o)
        o += 1
      }
      ResampledStats(n, info.rate, info.rate / factor, outFrames,
        sum2, sumSq2, wsum, ok = true)
    }
  }

  /** Resample a binary audio column — one 8-column stats row per clip
    * leaves the executor.
    */
  def decodeWavResampled(df: DataFrame, binaryCol: String, idCol: String,
                         factor: Int): DataFrame =
    decodePartitions[ResampledStats](df, binaryCol, idCol,
      () => new WavResampleDecoder(factor).decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.inRate").as("in_rate"), col("_2.outRate").as("out_rate"),
        col("_2.outFrames").as("out_frames"),
        col("_2.sum2").as("sum2"), col("_2.sumSq2").as("sumsq2"),
        col("_2.wsum").as("wsum"), col("_2.ok").as("ok"))

  /** One row per blob from the modality router: the sniffed type, the
    * modality-appropriate perceptual fingerprint, and the byte length.
    */
  final case class RoutedFp(byteLen: Long, modality: String,
                            fp: Long, ok: Boolean)

  /** Single-pass MODALITY ROUTER: sniff each blob's container magic
    * and dispatch to the matching perceptual-fingerprint decoder —
    * BMP → image dHash, RIFF/WAVE → audio WHT sign bits, RIFF/'AVI '
    * → majority frame dHash. This is the ingest shape a mixed
    * multimodal column needs at 100 TB: ONE partition pass, all
    * decoders instantiated once per partition, no per-type re-scan of
    * the blob store. Unrecognized or malformed blobs come back
    * modality='unknown', ok=false — marker rows, never exceptions —
    * keyed by a CONTENT hash (low 60 bits of md5), not a constant:
    * a dedup keyed on (modality, fp) must exact-dedup distinct junk,
    * never cross-collapse it onto one marker. Empty/null input is the
    * one fp=0 case (there are no bytes to key).
    */
  final class FingerprintRouter(videoSampleEvery: Int) {
    private val bmp = new BmpDHashDecoder()
    private val wav = new WavFingerprintDecoder()
    private val avi = new AviDHashDecoder(videoSampleEvery)
    private val md = java.security.MessageDigest.getInstance("MD5")
    private def tag(b: Array[Byte], i: Int, t: String): Boolean =
      b.length >= i + t.length &&
        (0 until t.length).forall(k => b(i + k) == t(k).toByte)
    /** Low 60 bits of md5 (first 15 hex chars) — positive, and
      * mirrorable in DuckDB as ('0x' || substr(md5(x),1,15))::UBIGINT. */
    private def contentKey(b: Array[Byte]): Long = {
      md.reset()
      val d = md.digest(b)
      java.lang.Long.parseLong(
        d.take(8).map(x => f"$x%02x").mkString.take(15), 16)
    }

    def decode(bytes: Array[Byte]): RoutedFp = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      if (bytes == null || n == 0) return RoutedFp(n, "unknown", 0L, ok = false)
      if (n < 12) return RoutedFp(n, "unknown", contentKey(bytes), ok = false)
      if (tag(bytes, 0, "BM")) {
        val r = bmp.decode(bytes)
        RoutedFp(n, "image", r.hash, r.ok)
      } else if (tag(bytes, 0, "RIFF") && tag(bytes, 8, "WAVE")) {
        val r = wav.decode(bytes)
        RoutedFp(n, "audio", r.sig, r.ok)
      } else if (tag(bytes, 0, "RIFF") && tag(bytes, 8, "AVI ")) {
        val r = avi.decode(bytes)
        RoutedFp(n, "video", r.hash, r.ok)
      } else RoutedFp(n, "unknown", contentKey(bytes), ok = false)
    }
  }

  /** Route a mixed binary column through the fingerprint dispatcher —
    * one 5-column row per blob leaves the executor.
    */
  def decodeRoutedFingerprint(df: DataFrame, binaryCol: String,
                              idCol: String,
                              videoSampleEvery: Int): DataFrame =
    decodePartitions[RoutedFp](df, binaryCol, idCol,
      () => new FingerprintRouter(videoSampleEvery).decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.modality").as("modality"),
        col("_2.fp").as("fp"), col("_2.ok").as("ok"))

  /** Decode a binary AVI column into per-clip majority dHashes. */
  def decodeAviDHash(df: DataFrame, binaryCol: String, idCol: String,
                     sampleEvery: Int): DataFrame =
    decodePartitions[VideoHash](df, binaryCol, idCol,
      () => new AviDHashDecoder(sampleEvery).decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.width").as("width"), col("_2.height").as("height"),
        col("_2.nSampled").as("n_sampled"),
        col("_2.hash").as("hash"), col("_2.ok").as("ok"))

  /** Builds a VALID uncompressed AVI: RIFF('AVI ') → LIST(hdrl:
    * avih + LIST(strl: strh 'vids'/'DIB ' + strf BITMAPINFOHEADER))
    * → LIST(movi: one '00db' raw-DIB chunk per frame). Frame f
    * carries the fixture pixel pattern shifted by (23f, 29f, 31f) so
    * per-frame stats differ and a frame-indexing bug is caught.
    */
  object VideoBytes2 {
    def aviDib(w: Int, h: Int, nFrames: Int, id: Long): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      val stride = ((w * 3 + 3) / 4) * 4
      val frameBytes = stride * h
      val moviSize = 4 + nFrames * (8 + frameBytes)
      val hdrlSize = 4 + (8 + 56) + (8 + 116)
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(t: String): Unit = buf.put(t.getBytes("US-ASCII"))
      fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
      fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
      fourcc("avih"); buf.putInt(56)
      buf.putInt(40000)            // usec/frame (25 fps)
        .putInt(0).putInt(0).putInt(0)
        .putInt(nFrames).putInt(0).putInt(1).putInt(frameBytes)
        .putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); buf.putInt(116); fourcc("strl")
      fourcc("strh"); buf.putInt(56)
      fourcc("vids"); fourcc("DIB ")
      buf.putInt(0).putInt(0).putInt(0)
        .putInt(1).putInt(25)      // scale=1, rate=25
        .putInt(0).putInt(nFrames).putInt(frameBytes)
        .putInt(-1).putInt(0)      // quality, sampleSize
        .putShort(0.toShort).putShort(0.toShort)
        .putShort(w.toShort).putShort(h.toShort) // rcFrame
      fourcc("strf"); buf.putInt(40)
      buf.putInt(40).putInt(w).putInt(h)
        .putShort(1.toShort).putShort(24.toShort)
        .putInt(0).putInt(frameBytes)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
      var f = 0
      while (f < nFrames) {
        fourcc("00db"); buf.putInt(frameBytes)
        var fileRow = 0
        while (fileRow < h) {
          val y = h - 1 - fileRow // bottom-up
          var x = 0
          while (x < w) {
            val r = ((5 * x + 17 * y + 3 * id + 23 * f) % 256).toInt
            val g = ((11 * x + 3 * y + 2 * id + 29 * f) % 256).toInt
            val b = ((7 * x + 13 * y + id + 31 * f) % 256).toInt
            buf.put(b.toByte).put(g.toByte).put(r.toByte)
            x += 1
          }
          var pad = w * 3
          while (pad < stride) { buf.put(0.toByte); pad += 1 }
          fileRow += 1
        }
        f += 1
      }
      buf.array()
    }

    /** A VALID MS-RLE8 AVI exercising every opcode family with real
      * inter-frame carry. Frame 0 is a keyframe (absolute-mode rows,
      * idx = (3x + 7yf + id) % 256, file rows bottom-up). Frame f>=1
      * repaints ONLY file row rf = f % h: an encoded run of 2
      * (idx = (13f + id) % 256) at x=0, a DELTA escape skipping
      * x=2,3 (those pixels show the PREDECESSOR frame through), then
      * count-1 runs (idx = (5x + 11f + id) % 256) to the row end;
      * all other rows carry whole. The palette is closed-form
      * (r,g,b)(i) = ((7i+3)%256, (5i+11)%256, (3i+17)%256), so every
      * decoded pixel — including the carried ones — is exact oracle
      * arithmetic.
      */
    def aviRle8(w: Int, h: Int, nFrames: Int, id: Long): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      require(w >= 6 && w < 256 && h >= 2 && nFrames >= 1)
      def frameChunk(f: Int): Array[Byte] = {
        val bb = scala.collection.mutable.ArrayBuffer.empty[Byte]
        def op(a: Int, b: Int): Unit = { bb += a.toByte; bb += b.toByte }
        if (f == 0) {
          var yf = 0
          while (yf < h) {
            op(0, w) // absolute mode, w >= 6 >= 3
            var x = 0
            while (x < w) { bb += (((3 * x + 7 * yf + id) % 256)).toByte; x += 1 }
            if ((w & 1) == 1) bb += 0 // word alignment
            op(0, 0) // EOL
            yf += 1
          }
          op(0, 1) // EOB
        } else {
          val rf = f % h
          var i = 0
          while (i < rf) { op(0, 0); i += 1 } // skip rows 0..rf-1 (carry)
          op(2, ((13 * f + id) % 256).toInt)  // run of 2 at x=0,1
          op(0, 2); op(2, 0)                  // delta: skip x=2,3 (carry)
          var x = 4
          while (x < w) { op(1, ((5 * x + 11 * f + id) % 256).toInt); x += 1 }
          op(0, 0) // EOL
          op(0, 1) // EOB
        }
        bb.toArray
      }
      val chunks = (0 until nFrames).map(frameChunk)
      val moviSize = 4 + chunks.map(c => 8 + c.length + (c.length & 1)).sum
      val strfSize = 40 + 4 * 256
      val strlSize = 4 + (8 + 56) + (8 + strfSize)
      val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(t: String): Unit = buf.put(t.getBytes("US-ASCII"))
      fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
      fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
      fourcc("avih"); buf.putInt(56)
      buf.putInt(40000)
        .putInt(0).putInt(0).putInt(0)
        .putInt(nFrames).putInt(0).putInt(1).putInt(w * h)
        .putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); buf.putInt(strlSize); fourcc("strl")
      fourcc("strh"); buf.putInt(56)
      fourcc("vids"); fourcc("MRLE")
      buf.putInt(0).putInt(0).putInt(0)
        .putInt(1).putInt(25)
        .putInt(0).putInt(nFrames).putInt(w * h)
        .putInt(-1).putInt(0)
        .putShort(0.toShort).putShort(0.toShort)
        .putShort(w.toShort).putShort(h.toShort)
      fourcc("strf"); buf.putInt(strfSize)
      buf.putInt(40).putInt(w).putInt(h)
        .putShort(1.toShort).putShort(8.toShort)
        .putInt(1)                      // biCompression = BI_RLE8
        .putInt(w * h)
        .putInt(0).putInt(0)
        .putInt(256)                    // biClrUsed
        .putInt(0)
      var pi = 0
      while (pi < 256) {               // RGBQUAD: B, G, R, reserved
        buf.put(((3 * pi + 17) % 256).toByte)
        buf.put(((5 * pi + 11) % 256).toByte)
        buf.put(((7 * pi + 3) % 256).toByte)
        buf.put(0.toByte)
        pi += 1
      }
      fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
      chunks.foreach { c =>
        fourcc("00dc"); buf.putInt(c.length)
        buf.put(c)
        if ((c.length & 1) == 1) buf.put(0.toByte)
      }
      buf.array()
    }

    /** A VALID MJPEG AVI: same RIFF skeleton as `aviDib` but the
      * stream fourcc / biCompression are 'MJPG' and every `00dc`
      * chunk is a standalone JDK-ImageIO-encoded JPEG. Frame f is a
      * SOLID gray of tone 40 + 40*((id+f)%5): solid tones survive
      * lossy JPEG within ±2 luma levels, so the decoder's 40-wide
      * luma bucket (= 1 + (id+f)%5) is exact oracle arithmetic while
      * the bytes are genuine compressed video.
      */
    def aviMjpeg(w: Int, h: Int, nFrames: Int, id: Long): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      val jpegs = (0 until nFrames).map { f =>
        val tone = (40 + 40 * ((id + f) % 5)).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g2 = img.createGraphics()
        g2.setColor(new java.awt.Color(tone, tone, tone))
        g2.fillRect(0, 0, w, h); g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
      val hdrlSize = 4 + (8 + 56) + (8 + 116)
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(t: String): Unit = buf.put(t.getBytes("US-ASCII"))
      fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
      fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
      fourcc("avih"); buf.putInt(56)
      buf.putInt(40000)            // usec/frame (25 fps)
        .putInt(0).putInt(0).putInt(0)
        .putInt(nFrames).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); buf.putInt(116); fourcc("strl")
      fourcc("strh"); buf.putInt(56)
      fourcc("vids"); fourcc("MJPG")
      buf.putInt(0).putInt(0).putInt(0)
        .putInt(1).putInt(25)      // scale=1, rate=25
        .putInt(0).putInt(nFrames).putInt(0)
        .putInt(-1).putInt(0)      // quality, sampleSize
        .putShort(0.toShort).putShort(0.toShort)
        .putShort(w.toShort).putShort(h.toShort) // rcFrame
      fourcc("strf"); buf.putInt(40)
      buf.putInt(40).putInt(w).putInt(h)
        .putShort(1.toShort).putShort(24.toShort)
        .putInt(0x47504A4D)        // biCompression = 'MJPG'
        .putInt(0)                 // biSizeImage (variable for MJPEG)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
      jpegs.foreach { j =>
        fourcc("00dc"); buf.putInt(j.length); buf.put(j)
        if ((j.length & 1) == 1) buf.put(0.toByte) // RIFF word align
      }
      buf.array()
    }

    /** `aviDib` with the QUADRATIC pixel family of ImageBytes.bmpQuad
      * (per-clip curvature => structurally distinct clips; uniform
      * `delta` => a brightness regrade dHash should absorb) plus the
      * (23f, 29f, 31f) per-frame channel shifts, so per-frame hashes
      * differ slightly and the majority vote has something to do.
      */
    def aviQuad(w: Int, h: Int, nFrames: Int, ca: Int, cb: Int, cc: Int,
                base: Int, delta: Int): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      val stride = ((w * 3 + 3) / 4) * 4
      val frameBytes = stride * h
      val moviSize = 4 + nFrames * (8 + frameBytes)
      val hdrlSize = 4 + (8 + 56) + (8 + 116)
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(t: String): Unit = buf.put(t.getBytes("US-ASCII"))
      fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
      fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
      fourcc("avih"); buf.putInt(56)
      buf.putInt(40000)
        .putInt(0).putInt(0).putInt(0)
        .putInt(nFrames).putInt(0).putInt(1).putInt(frameBytes)
        .putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); buf.putInt(116); fourcc("strl")
      fourcc("strh"); buf.putInt(56)
      fourcc("vids"); fourcc("DIB ")
      buf.putInt(0).putInt(0).putInt(0)
        .putInt(1).putInt(25)
        .putInt(0).putInt(nFrames).putInt(frameBytes)
        .putInt(-1).putInt(0)
        .putShort(0.toShort).putShort(0.toShort)
        .putShort(w.toShort).putShort(h.toShort)
      fourcc("strf"); buf.putInt(40)
      buf.putInt(40).putInt(w).putInt(h)
        .putShort(1.toShort).putShort(24.toShort)
        .putInt(0).putInt(frameBytes)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
      var f = 0
      while (f < nFrames) {
        fourcc("00db"); buf.putInt(frameBytes)
        var fileRow = 0
        while (fileRow < h) {
          val y = h - 1 - fileRow // bottom-up
          var x = 0
          while (x < w) {
            val r = (ca * x * x + cb * y * y + cc * x * y + 7 * x +
              13 * y + base + delta + 23 * f) % 256
            val g = (cb * x * x + ca * y * y + cc * x * y + 3 * x +
              5 * y + 2 * base + delta + 29 * f) % 256
            val b = ((ca + cb) * x * x + cc * y * y + 5 * x + 11 * y +
              3 * base + delta + 31 * f) % 256
            buf.put(b.toByte).put(g.toByte).put(r.toByte)
            x += 1
          }
          var pad = w * 3
          while (pad < stride) { buf.put(0.toByte); pad += 1 }
          fileRow += 1
        }
        f += 1
      }
      buf.array()
    }
  }

  /** Decode a binary column of AVI blobs into per-sampled-frame pixel
    * statistics with the REAL RIFF walker — one decoder instance per
    * partition, frames exploded executor-side so only stats rows ever
    * shuffle. Rejected blobs yield one `ok = false` marker row
    * (frame_idx = -1) so corrupt inputs stay visible downstream.
    */
  def decodeAviFrames(df: DataFrame, binaryCol: String, idCol: String,
                      sampleEvery: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binaryCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new AviFrameDecoder(sampleEvery)
        it.flatMap { case (id, bytes) =>
          val r = dec.decode(bytes)
          if (!r.ok)
            Iterator((id, r.byteLen, 0, 0, 0, -1, 0L, 0L, 0L,
              0L, 0L, 0L, 0L, 0, false))
          else r.frames.iterator.map(fs =>
            (id, r.byteLen, r.width, r.height, r.nFrames, fs.frameIdx,
              fs.sumR, fs.sumG, fs.sumB,
              fs.luma0, fs.luma1, fs.luma2, fs.luma3, fs.cornerR, true))
        }
      }
      .toDF(idCol, "byte_len", "width", "height", "n_frames", "frame_idx",
        "sum_r", "sum_g", "sum_b", "luma0", "luma1", "luma2", "luma3",
        "corner_r", "ok")
  }

  /** Decode a binary column of MS-RLE8 AVIs into one row per SAMPLED
    * frame — same stat schema as decodeAviFrames minus byte_len (RLE
    * payload sizes are encoder detail, not oracle arithmetic); the
    * decoder carries the canvas across frames, so a sampled frame's
    * stats reflect pixels painted by EARLIER unsampled frames.
    */
  def decodeRle8Frames(df: DataFrame, binaryCol: String, idCol: String,
                       sampleEvery: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binaryCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new Rle8FrameDecoder(sampleEvery)
        it.flatMap { case (id, bytes) =>
          val r = dec.decode(bytes)
          if (!r.ok)
            Iterator((id, 0, 0, 0, -1, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0, false))
          else r.frames.iterator.map(fs =>
            (id, r.width, r.height, r.nFrames, fs.frameIdx,
              fs.sumR, fs.sumG, fs.sumB,
              fs.luma0, fs.luma1, fs.luma2, fs.luma3, fs.cornerR, true))
        }
      }
      .toDF(idCol, "width", "height", "n_frames", "frame_idx",
        "sum_r", "sum_g", "sum_b", "luma0", "luma1", "luma2", "luma3",
        "corner_r", "ok")
  }

  /** Decode a binary column of MJPEG AVIs into one row per SAMPLED
    * frame (container dims, frame count, per-frame JPEG dims + luma
    * bucket); ok=false marker rows (frame_idx = -1) for undecodable
    * blobs. No byte_len column on purpose: JPEG payload sizes are
    * encoder-dependent, not oracle arithmetic.
    */
  def decodeMjpegFrames(df: DataFrame, binaryCol: String, idCol: String,
                        sampleEvery: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binaryCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new MjpegFrameDecoder(sampleEvery)
        it.flatMap { case (id, bytes) =>
          val r = dec.decode(bytes)
          if (!r.ok) Iterator((id, 0, 0, 0, -1, 0, 0, 0, false))
          else r.frames.iterator.map(f =>
            (id, r.width, r.height, r.nFrames, f.frameIdx,
              f.frameW, f.frameH, f.lumaBucket, true))
        }
      }
      .toDF(idCol, "width", "height", "n_frames", "frame_idx",
        "frame_w", "frame_h", "luma_bucket", "ok")
  }

  // -------------------------------------------------------------------------
  // AIFF — the second mainstream uncompressed audio container. WAV is
  // RIFF little-endian with an integer sample rate; AIFF is IFF
  // BIG-endian with the rate stored as an 80-bit IEEE 754 extended
  // float in the COMM chunk — the two encodings a real corpus's audio
  // actually arrives in, and exactly the byte-level details
  // (endianness, extended-float mantissa math) a decoder gets wrong
  // silently. Same PcmStats as the WAV path so the stats algebra is
  // shared.
  // -------------------------------------------------------------------------

  /** REAL AIFF codec: FORM/AIFF IFF walk (big-endian chunk sizes, odd
    * sizes word-padded), COMM parsed including the 80-bit extended-
    * float sample rate (sign + 15-bit exponent + explicit-1 64-bit
    * mantissa), SSND's offset/blockSize honored, then every 16-bit
    * big-endian PCM sample decoded into the shared PcmStats.
    * Malformed, truncated, or compressed (AIFC) bytes come back
    * `ok = false`, never an exception.
    */
  final class AiffPcmDecoder {
    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def tag(b: Array[Byte], i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    /** 80-bit extended float at offset i → integer sample rate.
      * value = mantissa × 2^(exp − 16383 − 63); the mantissa's top
      * bit is explicit. Rates are small integers, so the shift is
      * always rightward and exact — done in pure integer math.
      */
    private def extendedRate(b: Array[Byte], i: Int): Int = {
      val se = be16(b, i)
      if ((se & 0x8000) != 0) return -1 // negative rate: malformed
      val exp = se & 0x7fff
      var mant = 0L
      var k = 0
      while (k < 8) { mant = (mant << 8) | (b(i + 2 + k) & 0xffL); k += 1 }
      if (mant == 0L) return 0
      val shift = 16383 + 63 - exp
      if (shift < 0 || shift > 63) return -1 // out of integer range
      val r = mant >>> shift
      if (shift > 0 && (mant & ((1L << shift) - 1)) != 0) -1 // non-integer
      else if (r > Int.MaxValue) -1
      else r.toInt
    }

    def decode(bytes: Array[Byte]): PcmStats = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      def bad = PcmStats(n, 0, 0, 0L, 0L, 0L, 0, 0L, ok = false)
      if (n < 12 || !tag(bytes, 0, "FORM") || !tag(bytes, 8, "AIFF"))
        return bad
      val formEnd = math.min(n, 8 + be32(bytes, 4)).toInt
      var rate = 0; var ch = 0; var bits = 0; var commFrames = 0L
      var dataOff = -1L
      var i = 12
      while (i + 8 <= formEnd) {
        val ck = be32(bytes, i + 4)
        if (ck < 0 || i + 8 + ck > formEnd) return bad
        if (tag(bytes, i, "COMM")) {
          if (ck < 18) return bad
          ch = be16(bytes, i + 8)
          commFrames = be32(bytes, i + 10)
          bits = be16(bytes, i + 14)
          rate = extendedRate(bytes, i + 16)
        } else if (tag(bytes, i, "SSND")) {
          val off = be32(bytes, i + 8) // extra offset into sound data
          dataOff = i + 16 + off
        }
        i += (8 + ck + (ck & 1)).toInt // IFF chunks are word-aligned
      }
      if (rate <= 0 || ch <= 0 || bits != 16 || dataOff < 0 ||
          commFrames < 0) return bad
      val blockAlign = ch * 2
      if (dataOff + commFrames * blockAlign > n) return bad
      val total = commFrames * ch
      var sum = 0L; var sumSq = 0L; var peak = 0; var zc = 0L
      var havePrev = false; var prevNeg = false
      var j = 0L
      while (j < total) {
        val v = be16(bytes, (dataOff + 2 * j).toInt).toShort.toInt
        sum += v; sumSq += v.toLong * v
        val a = math.abs(v); if (a > peak) peak = a
        if (j % ch == 0) {
          val neg = v < 0
          if (havePrev && neg != prevNeg) zc += 1
          prevNeg = neg; havePrev = true
        }
        j += 1
      }
      PcmStats(n, rate, ch, commFrames, sum, sumSq, peak, zc, ok = true)
    }
  }

  /** COMPLETE AIFF: FORM(AIFF: COMM + SSND) with the fixture sample
    * pattern of AudioBytes.wavPcm, so WAV and AIFF oracles share the
    * sample arithmetic. Total size = 54 + frames*channels*2 bytes.
    */
  object AudioBytes2 {
    def aiff(sampleRate: Int, channels: Int, frames: Long,
             id: Long): Array[Byte] = {
      val dataLen = frames * channels * 2
      val out = java.nio.ByteBuffer.allocate((54 + dataLen).toInt)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      out.put("FORM".getBytes("US-ASCII")).putInt((46 + dataLen).toInt)
      out.put("AIFF".getBytes("US-ASCII"))
      out.put("COMM".getBytes("US-ASCII")).putInt(18)
      out.putShort(channels.toShort)
      out.putInt(frames.toInt)
      out.putShort(16)
      // 80-bit extended float: integer rate r = 1.m × 2^k
      val k = 63 - java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
      out.putShort((16383 + k).toShort)
      out.putLong(sampleRate.toLong << (63 - k))
      out.put("SSND".getBytes("US-ASCII")).putInt((8 + dataLen).toInt)
      out.putInt(0).putInt(0) // offset, blockSize
      val total = frames * channels
      var j = 0L
      while (j < total) {
        out.putShort((((7 * j + 3 * id) % 4096) - 2048).toShort)
        j += 1
      }
      out.array()
    }
  }

  /** Decode a binary column of AIFF clips into per-clip PCM statistics
    * with the REAL big-endian codec — same batch shape and same
    * 10-column output as decodeWavPcm.
    */
  def decodeAiffPcm(df: DataFrame, binaryCol: String, idCol: String): DataFrame =
    decodePartitions[PcmStats](df, binaryCol, idCol,
      () => new AiffPcmDecoder().decode _)
      .select(col("_1").as(idCol),
        col("_2.byteLen").as("byte_len"),
        col("_2.sampleRate").as("sample_rate"),
        col("_2.channels").as("channels"),
        col("_2.nFrames").as("n_frames"),
        col("_2.sumAll").as("sum_all"), col("_2.sumSqAll").as("sumsq_all"),
        col("_2.peakAbs").as("peak_abs"),
        col("_2.zeroCrossCh0").as("zc_ch0"), col("_2.ok").as("ok"))
}
