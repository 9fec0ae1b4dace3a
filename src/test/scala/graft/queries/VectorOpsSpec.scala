package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantic guarantees of the vector operators beyond the DuckDB
  * hash-match: hard-negative mining's positives/negatives are the TRUE
  * per-label-class argmaxes (replayed driver-side over the raw
  * vectors), every anchor emits a row, and the semi-hard band is
  * consistent with the frozen ppm scores.
  */
class VectorOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("mine_hard_negatives: driver-side replay — true per-class argmaxes, " +
       "no anchor dropped, semi-hard band consistent") {
    val d = graft.TestData.requireSf("sf0.001")
    val rows = graft.SparkEntry.queries("mine_hard_negatives")(spark, d)
      .collect()
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def ppm(x: Double): Long = math.floor(x * 1000000 + 0.5).toLong
    val anchors = vecs.filter(_._1 < 64)
    assert(rows.length == anchors.length, "an anchor was silently dropped")
    val byId = rows.map(r => r.getAs[Long]("q_id") -> r).toMap
    anchors.foreach { case (qid, qlabel, vq) =>
      val r = byId(qid)
      def argmax(same: Boolean): (Long, Long) = vecs
        .filter { case (nid, nl, _) => nid != qid && (nl == qlabel) == same }
        .map { case (nid, _, ve) => (nid, ppm(cos(vq, ve))) }
        .minBy { case (nid, p) => (-p, nid) }
      val (posId, posPpm) = argmax(same = true)
      val (negId, negPpm) = argmax(same = false)
      assert(r.getAs[Long]("pos_id") == posId &&
        r.getAs[Long]("pos_ppm") == posPpm, s"anchor $qid positive: $r")
      assert(r.getAs[Long]("neg_id") == negId &&
        r.getAs[Long]("neg_ppm") == negPpm, s"anchor $qid negative: $r")
      assert(r.getAs[Long]("margin_ppm") == posPpm - negPpm)
      assert(r.getAs[Boolean]("semi_hard") ==
        (negPpm < posPpm && negPpm > posPpm - 100000L))
    }
    // the corpus must actually exercise the interesting band: at least
    // one semi-hard anchor and at least one negative margin (a
    // negative OUTRANKING the positive — the rows batch-hard mining
    // exists to find)
    assert(rows.exists(_.getAs[Boolean]("semi_hard")),
      "no semi-hard anchors on this corpus — band check is vacuous")
    assert(rows.exists(_.getAs[Long]("margin_ppm") < 0L),
      "no hard (negative-margin) anchors on this corpus")
  }
}
