package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of dedup_cluster_cc: where do the seconds go —
  * edge building (minhash chain), bi materialization, propagation
  * rounds, or the final outer join?
  */
object ProfCC {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profcc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm the JVM/codegen paths
    graft.SparkEntry.queries("q1_pricing_summary")(spark, d).count()

    val edges = graft.queries.PipelineOps.nearDupEdges(spark, d)

    val labels = t("ccIncident (bi materialize + rounds)") {
      val l = graft.queries.PipelineOps.ccIncident(edges)
      l.count(); l
    }
    t("labels.count warm") { labels.count() }
    t("sizes only") {
      labels.groupBy("rep").agg(count(lit(1)).as("cluster_size"))
        .where(col("cluster_size") >= 2).count()
    }
    t("sizes + join + order") {
      val sized = labels.groupBy("rep").agg(count(lit(1)).as("cluster_size"))
        .where(col("cluster_size") >= 2)
      labels.join(sized, "rep").orderBy("doc_id").count()
    }
    t("sizes + join + order again") {
      val sized = labels.groupBy("rep").agg(count(lit(1)).as("cluster_size"))
        .where(col("cluster_size") >= 2)
      labels.join(sized, "rep").orderBy("doc_id").count()
    }

    spark.stop()
  }
}
