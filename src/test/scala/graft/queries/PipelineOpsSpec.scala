package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Connected-components label propagation: the corpus's near-dup
  * clusters are clique-ish (diameter ~1), so the oracle query never
  * exercises multi-round convergence — these fixtures do.
  */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val n = nodes.toDF("doc_id")
    val e = edges.toDF("a", "b")
    PipelineOps.connectedComponents(n, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain graph needs multiple propagation rounds and still converges") {
    // 0-1-2-3-4-5-6-7: diameter 7, min label must travel the length
    val labels = cc(0L to 7L, (0L to 6L).map(i => (i, i + 1)))
    assert(labels == (0L to 7L).map(_ -> 0L).toMap)
  }

  test("300-node chain converges within the round cap (pointer jumping)") {
    // Diameter 299: pure neighbor-min propagation would need 299
    // rounds and trip the 64-round invariant guard; the rep(rep(x))
    // shortcut halves the remaining depth each round, so this
    // converges in O(log n) rounds.
    val labels = cc(0L to 300L, (0L to 299L).map(i => (i, i + 1)))
    assert(labels.size == 301 && labels.values.forall(_ == 0L))
  }

  test("min label propagates AGAINST edge direction (undirected semantics)") {
    // edge written high->low only; without the bidirectional union the
    // min would never reach node 9
    val labels = cc(Seq(3L, 9L), Seq((9L, 3L)))
    assert(labels == Map(3L -> 3L, 9L -> 3L))
  }

  test("disjoint components keep distinct representatives; singletons self-label") {
    val labels = cc(
      Seq(1L, 2L, 3L, 10L, 11L, 99L),
      Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("cross-linked chains merge into one component") {
    // two chains joined mid-way: {0,1,2} + {10,11,12} with 2-11 bridge
    val labels = cc(
      Seq(0L, 1L, 2L, 10L, 11L, 12L),
      Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 12L), (2L, 11L)))
    assert(labels.values.toSet == Set(0L))
  }
}
