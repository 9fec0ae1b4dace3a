package graft.tools

import org.apache.spark.sql.SparkSession
import graft.log.StreamStore
import graft.model._

/** Isolated unary-append ack-latency probe (the bench's ack phase
  * without the bench): N appends of 10 x 100 B records through the
  * full A1-A7 path on a fresh POSIX store, reporting the percentile
  * spread plus a DirectParquet-only baseline so "where did the p50
  * go" separates parquet+fsync cost from lock/manifest overhead.
  * Usage: runMain graft.tools.AckBench [nAppends]
  */
object AckBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-ack").toString
    val st = new StreamStore(spark, root)
    st.catalog.createBasin("bench-basin",
      BasinConfig(defaultStreamConfig =
        StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
    st.catalog.createStream("bench-basin", "ack")
    val batch = AppendInput(Seq.fill(10)(
      EnvelopeRecord(Nil, Array.fill(100)(42: Byte))))
    (0 until 10).foreach(_ => st.append("bench-basin", "ack", batch)) // warm
    val times = (0 until n).map { _ =>
      val t0 = System.nanoTime()
      st.append("bench-basin", "ack", batch)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    def p(q: Double) = times(math.min(times.size - 1, (q * times.size).toInt))
    println(f"[ack] n=$n p50=${p(0.5)}%.2f p90=${p(0.9)}%.2f p99=${p(0.99)}%.2f min=${times.head}%.2f max=${times.last}%.2f ms")
    // parquet-write-only baseline (same record shape, same dir tree)
    val recs = (0 until 10).map(i =>
      graft.log.DirectParquet.Rec(i, 1000L, Nil, Array.fill(100)(42: Byte), 108L))
    val wdir = s"$root/_probe"
    (0 until 10).foreach(_ => graft.log.DirectParquet.writeBatch(wdir, recs))
    val wt = (0 until n).map { _ =>
      val t0 = System.nanoTime()
      graft.log.DirectParquet.writeBatch(wdir, recs)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[ack] writeBatch-only p50=${wt(n / 2)}%.2f min=${wt.head}%.2f ms")
    spark.stop()
  }
}
