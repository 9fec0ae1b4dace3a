package graft.extras

import org.scalacheck.{Gen, Prop, Properties}

/** Property coverage for the MJPEG-AVI frame decoder over the fixture
  * builder's parameter space — dims (odd widths exercise the JPEG
  * block-edge path), frame counts, sample strides and ids — not just
  * the one mm18 fixture:
  *
  *  1. DECODE RECOVERS THE BUILDER'S ARITHMETIC: container dims,
  *     total frame count, the exact sampled index set
  *     (0 until n by stride), per-frame JPEG dims, and the solid
  *     tone's 40-wide luma bucket (lossy decode must stay within the
  *     bucket for every generated tone).
  *  2. TRUNCATION FAILS SOFT: any prefix of a valid MJPEG AVI decodes
  *     to ok=false, never an exception — the malformed-input contract
  *     every byte-walking decoder in Multimodal carries.
  */
class MjpegPropSpec extends Properties("MjpegAvi") {

  private val params: Gen[(Int, Int, Int, Int, Long)] = for {
    w <- Gen.choose(8, 40)
    h <- Gen.choose(8, 40)
    nf <- Gen.choose(1, 6)
    se <- Gen.choose(1, 3)
    id <- Gen.choose(0L, 1000L)
  } yield (w, h, nf, se, id)

  property("decode recovers dims, counts, sampling and tone buckets") =
    Prop.forAll(params) { case (w, h, nf, se, id) =>
      val bytes = Multimodal.VideoBytes2.aviMjpeg(w, h, nf, id)
      val r = new Multimodal.MjpegFrameDecoder(se).decode(bytes)
      val wantIdx = (0 until nf by se).toList
      r.ok && r.width == w && r.height == h && r.nFrames == nf &&
        r.frames.map(_.frameIdx).toList == wantIdx &&
        r.frames.forall(f =>
          f.frameW == w && f.frameH == h &&
            f.lumaBucket == 1 + ((id + f.frameIdx) % 5))
    }

  property("any truncation fails soft (ok=false, no exception)") =
    Prop.forAll(params, Gen.choose(0.0, 1.0)) {
      case ((w, h, nf, _, id), frac) =>
        val bytes = Multimodal.VideoBytes2.aviMjpeg(w, h, nf, id)
        val cut = (bytes.length * frac).toInt.min(bytes.length - 1)
        val r = new Multimodal.MjpegFrameDecoder(1).decode(bytes.take(cut))
        !r.ok
    }
}
