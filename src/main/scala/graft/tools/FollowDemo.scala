package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.log.StreamStore
import graft.model._

/** Live demo: append -> follow (custom seq-offset source) -> append
  * more -> observe, printing what a consumer sees.
  */
object FollowDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("follow-demo").toString
    val st = new StreamStore(spark, dir)
    st.catalog.createBasin("demo-basin1",
      BasinConfig(defaultStreamConfig =
        StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
    st.catalog.createStream("demo-basin1", "orders")
    def rec(s: String) = EnvelopeRecord(Seq(Header.utf8("k", "v")), s.getBytes)
    st.append("demo-basin1", "orders", AppendInput(Seq(rec("o1"), rec("o2"))))
    println("tail after 2 appends: " + st.checkTail("demo-basin1", "orders"))

    val q = graft.streaming.Follow.follow(st, "demo-basin1", "orders", fromSeq = 0)
      .writeStream.format("memory").queryName("demo")
      .outputMode("append").start()
    q.processAllAvailable()
    println("after catch-up:")
    spark.sql("SELECT seq_num, CAST(body AS STRING) body, metered_size FROM demo ORDER BY seq_num").show()
    st.append("demo-basin1", "orders", AppendInput(Seq(rec("o3"))))
    q.processAllAvailable()
    println("after live append:")
    spark.sql("SELECT seq_num, CAST(body AS STRING) body FROM demo ORDER BY seq_num").show()
    println("last progress endOffset: " + q.lastProgress.sources.head.endOffset)
    q.stop()
    spark.stop()
  }
}
