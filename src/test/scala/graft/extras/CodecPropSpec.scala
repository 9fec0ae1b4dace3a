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

  property("truncation never throws") = forAll(
    Gen.choose(1L, 100000L), Gen.choose(0, 43)) { (n, k) =>
      val full = AudioBytes.wav(44100, 2, n)
      val t = audioDec.decode(full.take(k))
      val full2 = VideoBytes.mp4(600L, n, 640, 480)
      val t2 = videoDec.decode(full2.take(math.min(k * 5, full2.length - 1)))
      (t != null) && (t2 != null)
  }
}
