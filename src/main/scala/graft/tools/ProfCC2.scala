package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Finer-grained ccIncident phase timing than ProfCC: bi checkpoint,
  * labels0, each propagation round's checkpoint and isEmpty — the
  * numbers behind the r22 round-structure decision (VERDICT r21 #6).
  */
object ProfCC2 {
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
      println(f"[profcc2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    graft.SparkEntry.queries("q1_pricing_summary")(spark, d).count()
    // one full warm pass of the query under study
    graft.SparkEntry.queries("dedup_cluster_cc")(spark, d).count()

    (0 until 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val edges = graft.queries.PipelineOps.nearDupEdges(spark, d)
      val bi = t("bi checkpoint (edge pipeline)") {
        edges.select(explode(array(
            struct(col("a"), col("b")),
            struct(col("b").as("a"), col("a").as("b")))).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .repartition(col("a")).localCheckpoint()
      }
      var labels = t("labels0 checkpoint") {
        bi.select(col("a").as("doc_id")).distinct()
          .select(col("doc_id"), col("doc_id").as("rep")).localCheckpoint()
      }
      var converged = false
      var round = 0
      while (!converged && round < 8) {
        val viaNbr = bi.join(labels.select(col("doc_id").as("b"),
            col("rep").as("nrep")), "b")
          .groupBy(col("a").as("doc_id")).agg(min("nrep").as("nrep"))
        val half = labels.join(viaNbr, Seq("doc_id"))
          .select(col("doc_id"), least(col("rep"), col("nrep")).as("rep"),
            col("rep").as("prev"))
        val next = t(s"round $round checkpoint") {
          half.join(
              half.select(col("doc_id").as("rep"), col("rep").as("rrep")),
              Seq("rep"))
            .select(col("doc_id"), least(col("rep"), col("rrep")).as("rep"),
              (least(col("rep"), col("rrep")) < col("prev")).as("changed"))
            .localCheckpoint()
        }
        converged = t(s"round $round isEmpty") {
          next.where(col("changed")).isEmpty
        }
        labels = next.select("doc_id", "rep")
        round += 1
      }
      val sized = labels.groupBy("rep").agg(count(lit(1)).as("cluster_size"))
        .where(col("cluster_size") >= 2)
      t("consumers (sized join + orderBy count)") {
        labels.join(sized, "rep").orderBy("doc_id").count()
      }
    }
    spark.stop()
  }
}
