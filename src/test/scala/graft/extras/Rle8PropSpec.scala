package graft.extras

import org.scalacheck.{Gen, Prop, Properties}

/** Property coverage for the MS-RLE8 inter-frame decoder over the
  * fixture builder's parameter space — not just the one mm19 fixture:
  *
  *  1. DECODE EQUALS AN INDEPENDENT CANVAS SIMULATION: a
  *     straightforward mutable-canvas replay of the builder's frame
  *     recipe (keyframe paint, then per-frame row repaints with the
  *     delta-skipped carry pixels) must reproduce every sampled
  *     frame's channel sums, luma histogram and corner probe exactly.
  *     This pins the INTER-FRAME semantics — a decoder that resets
  *     its canvas per frame, mis-orders rows, or paints the
  *     delta-skipped pixels diverges for some (w, h, nf, id).
  *  2. TRUNCATION FAILS SOFT: any prefix decodes to ok=false, never
  *     an exception.
  */
class Rle8PropSpec extends Properties("Rle8Avi") {

  private val params: Gen[(Int, Int, Int, Int, Long)] = for {
    w <- Gen.choose(6, 20)
    h <- Gen.choose(2, 12)
    nf <- Gen.choose(1, 8)
    se <- Gen.choose(1, 3)
    id <- Gen.choose(0L, 1000L)
  } yield (w, h, nf, se, id)

  private def palR(i: Int) = (7 * i + 3) % 256
  private def palG(i: Int) = (5 * i + 11) % 256
  private def palB(i: Int) = (3 * i + 17) % 256

  property("decode equals an independent inter-frame canvas simulation") =
    Prop.forAll(params) { case (w, h, nf, se, id) =>
      val bytes = Multimodal.VideoBytes2.aviRle8(w, h, nf, id)
      val r = new Multimodal.Rle8FrameDecoder(se).decode(bytes)
      // independent simulation of the builder's recipe
      val canvas = Array.ofDim[Int](h, w)
      val want = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Long, Long, Long, Seq[Long], Int)]
      for (f <- 0 until nf) {
        if (f == 0) {
          for (yf <- 0 until h; x <- 0 until w)
            canvas(yf)(x) = ((3 * x + 7 * yf + id) % 256).toInt
        } else {
          val rf = f % h
          canvas(rf)(0) = ((13 * f + id) % 256).toInt
          canvas(rf)(1) = ((13 * f + id) % 256).toInt
          // x = 2, 3 delta-skipped: untouched (carry)
          for (x <- 4 until w) canvas(rf)(x) = ((5 * x + 11 * f + id) % 256).toInt
        }
        if (f % se == 0) {
          var sr = 0L; var sg = 0L; var sb = 0L
          val luma = new Array[Long](4)
          for (yf <- 0 until h; x <- 0 until w) {
            val i = canvas(yf)(x)
            val (cr, cg, cb) = (palR(i), palG(i), palB(i))
            sr += cr; sg += cg; sb += cb
            luma(((cr * 299 + cg * 587 + cb * 114) / 1000) >> 6) += 1
          }
          want += ((f, sr, sg, sb, luma.toSeq, palR(canvas(h - 1)(0))))
        }
      }
      r.ok && r.width == w && r.height == h && r.nFrames == nf &&
        r.frames.map(fs => (fs.frameIdx, fs.sumR, fs.sumG, fs.sumB,
          Seq(fs.luma0, fs.luma1, fs.luma2, fs.luma3), fs.cornerR)) == want.toSeq
    }

  property("any truncation fails soft (ok=false, no exception)") =
    Prop.forAll(params, Gen.choose(0.0, 1.0)) {
      case ((w, h, nf, _, id), frac) =>
        val bytes = Multimodal.VideoBytes2.aviRle8(w, h, nf, id)
        val cut = (bytes.length * frac).toInt.min(bytes.length - 1)
        val r = new Multimodal.Rle8FrameDecoder(1).decode(bytes.take(cut))
        !r.ok
    }
}
