package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** LSH candidate generation stays bounded under degenerate buckets —
  * the VERDICT-flagged boilerplate-cluster hotspot.
  */
class TextOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("band buckets above the cap are skipped; small buckets still pair") {
    import spark.implicits._
    // one degenerate bucket with 200 docs (boilerplate collision) and
    // one healthy bucket with 3 docs
    val bands = ((0 until 200).map(i => (0, "degenerate", i.toLong)) ++
      Seq((1, "ok", 500L), (1, "ok", 501L), (1, "ok", 502L)))
      .toDF("band", "band_key", "doc_id")
    val cands = TextOps.cappedCandidates(bands, TextOps.BandBucketCap).collect()
    // degenerate bucket contributes ZERO pairs (would have been 19900)
    assert(cands.length == 3)
    assert(cands.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((500L, 501L), (500L, 502L), (501L, 502L)))
  }

  test("buckets exactly at the cap still generate pairs") {
    import spark.implicits._
    val bands = (0 until TextOps.BandBucketCap.toInt)
      .map(i => (0, "full", i.toLong)).toDF("band", "band_key", "doc_id")
    val n = TextOps.cappedCandidates(bands, TextOps.BandBucketCap).count()
    val k = TextOps.BandBucketCap
    assert(n == k * (k - 1) / 2)
  }
}
