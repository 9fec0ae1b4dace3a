package graft.extras

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.extras.Multimodal._

/** Property round-trips for the pure-JVM media header codecs: encode
  * random parameters into minimal valid bytes, parse them back, and
  * require exact recovery — plus "never throws" on arbitrary garbage.
  * The fixed oracle queries (mm2-mm4) pin a handful of parameter
  * shapes; 1000 random cases per codec cover the boundary arithmetic
  * (16.16 fixed point, word alignment, block-align division).
  */
object CodecPropSpec extends Properties("MediaCodecs") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private val imageDec = new ImageHeaderDecoder
  private val audioDec = new AudioHeaderDecoder
  private val videoDec = new VideoHeaderDecoder

  private val dimGen = Gen.choose(1, 65535)
  private val dim32Gen = Gen.choose(1, 1 << 20)

  property("png round-trip") = forAll(dim32Gen, dim32Gen) { (w, h) =>
    val m = imageDec.decode(ImageBytes.png(w, h))
    m.ok && m.format == "png" && m.width == w && m.height == h
  }

  property("jpeg round-trip") = forAll(dimGen, dimGen) { (w, h) =>
    val m = imageDec.decode(ImageBytes.jpeg(w, h))
    m.ok && m.format == "jpg" && m.width == w && m.height == h
  }

  property("gif round-trip") = forAll(dimGen, dimGen) { (w, h) =>
    val m = imageDec.decode(ImageBytes.gif(w, h))
    m.ok && m.format == "gif" && m.width == w && m.height == h
  }

  property("wav round-trip") = forAll(
    Gen.choose(1, 384000), Gen.choose(1, 8), Gen.choose(0L, 1L << 24)) {
    (rate, ch, n) =>
      val m = audioDec.decode(AudioBytes.wav(rate, ch, n))
      m.ok && m.sampleRate == rate && m.channels == ch &&
        m.bitsPerSample == 16 && m.nSamples == n
  }

  property("mp4 round-trip") = forAll(
    Gen.choose(1L, 1000000L), Gen.choose(0L, 1L << 30),
    dimGen, dimGen) { (ts, dur, w, h) =>
      val m = videoDec.decode(VideoBytes.mp4(ts, dur, w, h))
      m.ok && m.timescale == ts && m.durationMs == dur * 1000L / ts &&
        m.width == w && m.height == h
  }

  private val garbageGen: Gen[Array[Byte]] =
    Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  property("garbage never throws, never ok-by-luck beyond magic collisions") =
    forAll(garbageGen) { bytes =>
      // random bytes essentially never begin with a full valid magic;
      // the invariant under test is total, exception-free decoding
      val a = imageDec.decode(bytes)
      val b = audioDec.decode(bytes)
      val c = videoDec.decode(bytes)
      (a != null) && (b != null) && (c != null)
    }

  // Valid magic + hostile payload — the adversarial class that fully
  // random bytes essentially never reach (they fail the magic check
  // in the first 12 bytes and skip the chunk/box walks entirely).
  // This is where length-field truncation bugs live: a chunk size
  // near 2^32 whose Int truncation is negative must neither spin the
  // walk in place nor drive the index negative.
  private val hostileWavGen: Gen[Array[Byte]] = for {
    payload <- Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
  } yield "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 0, 0) ++
    "WAVE".getBytes("US-ASCII") ++ payload

  private val hostileMp4Gen: Gen[Array[Byte]] = for {
    inner <- Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
  } yield {
    val moov = java.nio.ByteBuffer.allocate(8 + inner.length)
    moov.putInt(8 + inner.length).put("moov".getBytes("US-ASCII")).put(inner)
    VideoBytes.mp4(600L, 1L, 1, 1).take(16) ++ moov.array()
  }

  property("valid magic + hostile chunk list never throws, never hangs") =
    forAll(hostileWavGen, hostileMp4Gen) { (wav, mp4) =>
      (audioDec.decode(wav) != null) && (videoDec.decode(mp4) != null)
    }

  property("hostile length fields (0xFFFFFFxx) terminate the walk as malformed") =
    forAll(Gen.choose(0xFFFFFF00L, 0xFFFFFFFFL)) { len =>
      val bb = java.nio.ByteBuffer.allocate(20)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(12)
        .put("WAVE".getBytes("US-ASCII"))
        .put("JUNK".getBytes("US-ASCII")).putInt(len.toInt)
      !audioDec.decode(bb.array()).ok
    }

  property("truncation never throws") = forAll(
    Gen.choose(1L, 100000L), Gen.choose(0, 43)) { (n, k) =>
      val full = AudioBytes.wav(44100, 2, n)
      val t = audioDec.decode(full.take(k))
      val full2 = VideoBytes.mp4(600L, n, 640, 480)
      val t2 = videoDec.decode(full2.take(math.min(k * 5, full2.length - 1)))
      (t != null) && (t2 != null)
  }
}
