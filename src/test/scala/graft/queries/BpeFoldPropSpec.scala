package graft.queries

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property coverage for the BPE merge fold's central claim
  * (PipelineOps.bpeLearnPlan): a single left fold that compares ONLY
  * the accumulator's last element — with no "just merged" flag —
  * implements leftmost-greedy non-overlapping pair replacement,
  * because after a merge the last element becomes l||r which can
  * never equal l again (r is nonempty).
  *
  * `foldModel` transliterates the Spark/DuckDB lambda; `scanModel`
  * is an independent formulation (explicit index scan with skip).
  * Run-heavy alphabets ({a,b}, words like "aaaa") are exactly where
  * an overlap bug would hide. The teeth: a WRONG fold that compares
  * the ORIGINAL previous symbol instead of the accumulator's last
  * element (i.e. one that re-merges into a just-merged pair) fails
  * these cases — "aaa" under (a,a) would yield [aa] with a consumed
  * twice instead of [aa, a].
  */
object BpeFoldModel {

  /** Transliteration of the aggregate(...) lambda in bpeLearnPlan. */
  def foldModel(syms: Vector[String], l: String, r: String): Vector[String] =
    syms.tail.foldLeft(Vector(syms.head)) { (acc, x) =>
      if (acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }

  /** Independent reference: explicit scan, leftmost-first,
    * non-overlapping (skip past each replacement). */
  def scanModel(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The broken variant the doc warns about: tracks the previous RAW
    * symbol, so a just-merged element can be consumed again. */
  def brokenFold(syms: Vector[String], l: String, r: String): Vector[String] = {
    var prevRaw = syms.head
    syms.tail.foldLeft(Vector(syms.head)) { (acc, x) =>
      val merged = prevRaw == l && x == r
      prevRaw = x
      if (merged) acc.init :+ (l + r) else acc :+ x
    }
  }
}

class BpeFoldPropSpec extends Properties("BpeFold") {
  import BpeFoldModel._

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private val symsGen: Gen[Vector[String]] = for {
    n <- Gen.choose(1, 16)
    // tiny alphabet + multi-char symbols: runs, overlaps, and
    // already-merged symbols that embed the pair as a substring
    syms <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "aa", "ba"))
  } yield syms.toVector

  private val pairGen: Gen[(String, String)] =
    Gen.oneOf(("a", "a"), ("a", "b"), ("b", "a"), ("a", "ab"),
      ("ab", "a"), ("aa", "a"), ("a", "aa"), ("ab", "ab"))

  property("fold == independent scan on run-heavy sequences") =
    forAll(symsGen, pairGen) { case (syms, (l, r)) =>
      foldModel(syms, l, r) == scanModel(syms, l, r)
    }

  property("merging never changes the concatenated text") =
    forAll(symsGen, pairGen) { case (syms, (l, r)) =>
      foldModel(syms, l, r).mkString == syms.mkString
    }

  property("teeth: the no-flag fold is NOT the broken prev-raw fold") =
    // existence proof that the properties discriminate: on "aaa"
    // under (a,a) the broken fold overlaps and loses a symbol
    {
      val syms = Vector("a", "a", "a")
      val good = foldModel(syms, "a", "a")
      val bad = brokenFold(syms, "a", "a")
      good == Vector("aa", "a") && bad != good
    }
}
