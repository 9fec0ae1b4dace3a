package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan dump for dedup_ngram_prefix including the INTERNED stage the
  * final plan's localCheckpoint hides: first the declared query's
  * formatted plan, then TextOps.hashedSurvivorPairs' plan (df pass,
  * canonical-order window, PPJoin filters, array_intersect gate —
  * where the xxhash64-long exchanges live).
  */
object PfxExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("========== dedup_ngram_prefix (final plan; upstream behind localCheckpoint scans) ==========")
    val df = graft.SparkEntry.queries("dedup_ngram_prefix")(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("========== dedup_ngram_prefix DOCSET BUILD (internedDocSets pre-checkpoint: scan -> xxhash64 -> collect_set) ==========")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val sh0 = graft.queries.TextOps.shingles(
      graft.queries.TextOps.docsAug(spark, sfDir))
    val docSetsPlan = sh0.select(col("doc_id"), xxhash64(col("sh")).as("h"))
      .groupBy("doc_id").agg(collect_set("h").as("hs"))
      .select(col("doc_id"), col("hs"), size(col("hs")).cast(LongType).as("n"))
    println(docSetsPlan.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("========== dedup_ngram_prefix INTERNED STAGE (hashedSurvivorPairs over internedDocSets) ==========")
    val stage = graft.queries.TextOps.hashedSurvivorPairs(
      graft.queries.TextOps.internedDocSets(sh0), 0.6)
    println(stage.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
