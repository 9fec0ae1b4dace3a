package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for selected queries to stdout, plus
  * quick pushdown/broadcast sanity markers. Usage:
  *   runMain graft.tools.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
        "r3_catchup", "m1_ops_per_minute", "dedup_minhash_lsh",
        "ann_bruteforce_topk")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r
        .findAllIn(plan).filterNot(_.contains("[]")).size
      val bcast = plan.split("\n").count(_.contains("BroadcastHashJoin"))
      val wsc = plan.split("\n").count(_.contains("WholeStageCodegen"))
      println(s"--- markers: pushedFilterScans=$pushed broadcastJoins=$bcast wholeStageCodegenSpans=$wsc")
    }
    spark.stop()
  }
}
