package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** A9 batcher semantics (sdk/src/batching.rs:186-266,138-159). */
class BatcherSpec extends AnyFunSuite {

  private def rec(n: Int): EnvelopeRecord =
    EnvelopeRecord(Nil, Array.fill(n)(1: Byte)) // metered = 8 + n

  test("packs greedily by count") {
    val b = new Batcher(maxRecords = 3)
    val Right(out) = b.batch(Seq.fill(7)(rec(1))): @unchecked
    assert(out.map(_.records.size) == Seq(3, 3, 1))
  }

  test("packs greedily by bytes; record that does not fit starts a new batch") {
    val b = new Batcher(maxBytes = 100)
    // metered sizes: 48, 48, 28 -> [48+48], [28]
    val Right(out) = b.batch(Seq(rec(40), rec(40), rec(20))): @unchecked
    assert(out.map(_.records.size) == Seq(2, 1))
  }

  test("oversize record errors") {
    val b = new Batcher(maxBytes = 50)
    assert(b.batch(Seq(rec(100))).isLeft)
  }

  test("match_seq_num auto-increments across emitted batches; token carried") {
    val b = new Batcher(maxRecords = 2, initialMatchSeqNum = Some(10),
      fencingToken = Some("tok"))
    val Right(out) = b.batch(Seq.fill(5)(rec(1))): @unchecked
    assert(out.map(_.matchSeqNum) == Seq(Some(10L), Some(12L), Some(14L)))
    assert(out.forall(_.fencingToken.contains("tok")))
  }

  test("batches integrate with store CAS chaining") {
    // emitted batches applied in order satisfy the CAS precondition
    val b = new Batcher(maxRecords = 2, initialMatchSeqNum = Some(0))
    val Right(out) = b.batch(Seq.fill(4)(rec(1))): @unchecked
    var tail = 0L
    out.foreach { in =>
      assert(in.matchSeqNum.contains(tail))
      tail += in.records.size
    }
  }
}
