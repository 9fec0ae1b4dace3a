package graft.queries

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Randomized coverage for the perceptual-fingerprint decoders the
  * deterministic CorpusOpsSpec fixtures can't sweep:
  *
  *   - total robustness: NO byte array may make any of the four new
  *     decoders throw (they are fed attacker-controlled blobs by
  *     contract — malformed input returns ok=false, never an
  *     exception);
  *   - the 63-bit contract: every produced hash/signature is
  *     non-negative (bit 63 never set), which is what makes the
  *     signed-BIGINT SQL mirror exact;
  *   - audio gain invariance over RANDOM (pid, step), not just the
  *     fixture's values: an integer-scaled signal must produce the
  *     IDENTICAL signature because every WHT coefficient scales by
  *     the same factor;
  *   - image regrade invariance over random wrap-free quad patterns
  *     at the 9x8 grid floor;
  *   - the video hash of frame 0 alone matches the 1-frame clip, for
  *     any clip length (sampling really is index-based, not
  *     byte-position-based).
  */
class FingerprintPropSpec extends Properties("Fingerprints") {

  import graft.extras.Multimodal

  private val anyBytes: Gen[Array[Byte]] =
    Gen.choose(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  /** Byte arrays that start with plausible container magics — the
    * walk-deep-then-fail paths plain random bytes rarely reach. */
  private val magicBytes: Gen[Array[Byte]] = for {
    magic <- Gen.oneOf("RIFF", "BM", "RIFFxxxxWAVE", "RIFFxxxxAVI ")
    tail <- anyBytes
  } yield magic.getBytes("US-ASCII") ++ tail

  property("no byte array makes any fingerprint decoder throw") =
    forAll(Gen.oneOf(anyBytes, magicBytes)) { bytes =>
      val bmp = new Multimodal.BmpDHashDecoder()
      val wav = new Multimodal.WavFingerprintDecoder()
      val spec = new Multimodal.WavSpectrumDecoder()
      val avi = new Multimodal.AviDHashDecoder(2)
      // the property is "every decode RETURNS" — ok is almost always
      // false for random bytes, and hashes respect the sign contract
      val r1 = bmp.decode(bytes); val r2 = wav.decode(bytes)
      val r3 = spec.decode(bytes); val r4 = avi.decode(bytes)
      r1.hash >= 0L && r2.sig >= 0L && r4.hash >= 0L &&
        (r3.ok || !r3.ok) && (r1.ok || !r1.ok)
    }

  property("audio signature is gain-invariant for random patterns") =
    forAll(Gen.choose(0L, 4095L), Gen.choose(1L, 2000L),
      Gen.oneOf(2, 3, 4, 8)) { (pid, step, gain) =>
      val dec = new Multimodal.WavFingerprintDecoder()
      val base = dec.decode(
        Multimodal.AudioBytes.wavPcmScaled(8000, 1, 100, pid, 1, step))
      val scaled = dec.decode(
        Multimodal.AudioBytes.wavPcmScaled(8000, 1, 100, pid, gain, step))
      base.ok && scaled.ok && base.sig == scaled.sig && base.sig >= 0L
    }

  property("image dHash is invariant under wrap-free regrades") =
    // zero curvature at 9x8: worst channel is b = 5x+11y+3*base+delta
    // <= 117 + 3*base + delta — base <= 30, delta <= 25 keeps every
    // channel under 256 (base=40, delta=30 DID wrap b — falsified)
    forAll(Gen.choose(0, 30), Gen.choose(1, 25)) { (base, delta) =>
      val dec = new Multimodal.BmpDHashDecoder()
      val a = dec.decode(Multimodal.ImageBytes.bmpQuad(9, 8, 0, 0, 0, base, 0))
      val b = dec.decode(
        Multimodal.ImageBytes.bmpQuad(9, 8, 0, 0, 0, base, delta))
      a.ok && b.ok && a.hash == b.hash && a.hash >= 0L
    }

  property("resize conserves mass: resized channel sums within floor slack") =
    // each output pixel floors a box mean, so the resized sum is
    // bounded by the original sum / area from above and loses at most
    // (area-1)/area per output pixel from below
    forAll(Gen.choose(0, 39), Gen.oneOf(1, 2, 4)) { (c, factor) =>
      val img = Multimodal.ImageBytes.bmpQuad(16, 16,
        1 + c % 5, 1 + c % 7, c % 3, 11 * c, c % 3)
      val rz = new Multimodal.BmpResizeDecoder(factor).decode(img)
      val px = new Multimodal.BmpPixelDecoder().decode(img)
      val area = factor.toLong * factor
      val nOut = (16L / factor) * (16L / factor)
      def ok(sumRz: Long, sumPx: Long): Boolean =
        sumRz * area <= sumPx && sumRz * area >= sumPx - nOut * (area - 1)
      rz.ok && px.ok && ok(rz.sumR, px.sumR) && ok(rz.sumG, px.sumG) &&
        ok(rz.sumB, px.sumB)
    }

  property("resample output length and rate scale exactly with the factor") =
    forAll(Gen.choose(0L, 4095L), Gen.oneOf(1, 2, 4, 5)) { (pid, factor) =>
      val clip = Multimodal.AudioBytes.wavPcm(8000, 1, 200, pid)
      val rs = new Multimodal.WavResampleDecoder(factor).decode(clip)
      rs.ok && rs.outFrames == 200 / factor && rs.outRate == 8000 / factor
    }

  property("video hash samples by frame INDEX: frame 0 of any clip == 1-frame clip") =
    forAll(Gen.choose(0, 39), Gen.choose(2, 6)) { (c, n) =>
      val single = new Multimodal.AviDHashDecoder(1)
        .decode(Multimodal.VideoBytes2.aviQuad(16, 16, 1,
          1 + c % 5, 1 + c % 7, c % 3, 11 * c, 0))
      // sampleEvery = n samples only frame 0 of the n-frame clip
      val firstOnly = new Multimodal.AviDHashDecoder(n)
        .decode(Multimodal.VideoBytes2.aviQuad(16, 16, n,
          1 + c % 5, 1 + c % 7, c % 3, 11 * c, 0))
      single.ok && firstOnly.ok && firstOnly.nSampled == 1 &&
        single.hash == firstOnly.hash
    }
}
