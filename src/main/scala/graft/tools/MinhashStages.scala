package graft.tools
object MinhashStages {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.queries.TextOps
    def time(label: String)(f: => Long): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime()-t0)/1e9, n) }
      println(f"$label%-28s median ${ts.map(_._1).sorted.apply(1)}%.2f s (n=${ts.head._2})")
    }
    val docsAug = TextOps.docsAug(spark, d)
    spark.read.parquet(s"$d/documents.parquet").count()
    time("docsAug scan")(docsAug.count())
    time("shingles")(TextOps.shingles(docsAug).count())
    time("bands (sig+explode)")(TextOps.minhashBands(TextOps.shingles(docsAug)).count())
    time("candidates")(TextOps.cappedCandidates(
      TextOps.minhashBands(TextOps.shingles(docsAug)), TextOps.BandBucketCap).count())
    spark.stop()
  }
}
