package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.log._
import graft.model._

/** Bench-scale reproduction of the 1 KiB plain-vs-encrypted ingest
  * phases (same bigDf shape as graft.Bench) for profiling the
  * encrypted-append throughput number in isolation at local[32].
  */
object BigEncProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def bigDf = spark.range(n).select(
      lit("bench-basin").as("basin"),
      concat(lit("s"), (col("id") % 8).cast("string")).as("stream"),
      (lit(1700000000000L) + col("id")).as("ts_client"),
      expr("CAST(NULL AS ARRAY<STRUCT<name: BINARY, value: BINARY>>)").as("headers"),
      expr("CAST(repeat(substr(md5(CAST(id AS STRING)), 1, 16), 64) AS BINARY)").as("body"),
      col("id").as("arrival"))
    def mkStore(cipher: Option[CipherAlgo]): StreamStore = {
      val root = java.nio.file.Files.createTempDirectory("bigenc").toString
      val st = new StreamStore(spark, root)
      st.catalog.createBasin("bench-basin", BasinConfig(
        defaultStreamConfig = StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite)),
        streamCipher = cipher))
      (0 until 8).foreach(i => st.catalog.createStream("bench-basin", s"s$i"))
      st
    }
    val key = Array.tabulate(32)(i => (i * 7 + 3).toByte)
    for (round <- 0 until 2) {
      val stP = mkStore(None)
      var t0 = System.nanoTime()
      stP.ingest(bigDf)
      println(f"[big] round=$round plain: ${n * 1040 / 1048576.0 / ((System.nanoTime() - t0) / 1e9)}%.1f MiB/s")
      val stE = mkStore(Some(CipherAlgo.Aegis256))
      t0 = System.nanoTime()
      stE.ingest(bigDf, cipher = Some(key))
      println(f"[big] round=$round enc:   ${n * 1040 / 1048576.0 / ((System.nanoTime() - t0) / 1e9)}%.1f MiB/s")
    }
    spark.stop()
  }
}
