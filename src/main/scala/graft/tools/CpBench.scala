package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.log.StreamStore
import graft.model._

/** Ad-hoc profiler for the 10k-stream control-plane bench phase:
  * splits ingest into its Spark-stage and commit-loop parts so pool
  * sizing is measured, not guessed. Not part of the driver contract.
  */
object CpBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val cpus = if (args.length > 1) args(1) else "8"
    System.setProperty("graft.ingest.timing", "1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = if (args.length > 2) args(2).toInt else 2
    for (rep <- 0 until reps) {
      val root = java.nio.file.Files.createTempDirectory("graft-cpb").toString
      val st = new StreamStore(spark, root)
      st.catalog.createBasin("bench-basin",
        BasinConfig(defaultStreamConfig =
          StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
      val names = (0 until n).map(i => f"cp-$i%05d")
      val t0 = System.nanoTime()
      st.catalog.createStreams("bench-basin", names)
      val tCreate = (System.nanoTime() - t0) / 1e9
      val df = spark.range(n).select(
        lit("bench-basin").as("basin"),
        concat(lit("cp-"), format_string("%05d", col("id"))).as("stream"),
        (lit(1700000000000L) + col("id")).as("ts_client"),
        expr("CAST(NULL AS ARRAY<STRUCT<name: BINARY, value: BINARY>>)").as("headers"),
        expr("CAST(md5(CAST(id AS STRING)) AS BINARY)").as("body"),
        col("id").as("arrival"))
      val t1 = System.nanoTime()
      st.ingest(df)
      val tIngest = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      st.awaitStageGc() // join background stage GC before the rm below
      val tGc = (System.nanoTime() - t2) / 1e9
      println(f"[cpb] rep=$rep n=$n create=$tCreate%.2f s ingest=$tIngest%.2f s stage_gc_drain=$tGc%.2f s")
      // delete the 30k-file root NOW (parallel), not via a later rm:
      // accumulated roots distorted every subsequent fs measurement
      val rp = java.nio.file.Paths.get(root)
      val subs = java.nio.file.Files.walk(rp, 3).toArray.toSeq
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          rp.relativize(p).getNameCount == 3)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      subs.foreach(d => pool.submit(new Runnable {
        def run(): Unit = {
          java.nio.file.Files.walk(d).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.delete(f))
        }
      }))
      pool.shutdown()
      pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS)
      java.nio.file.Files.walk(rp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    spark.stop()
  }
}
