package graft.tools

import org.apache.spark.sql.SparkSession
import graft.log._
import graft.model._

/** Phase-level timing for the e2e_a13_encryption demo's engine calls —
  * attribution tool for the round-15 bench regression on that query.
  */
object A13Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[a13] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def rec(s: String) = EnvelopeRecord(Nil, s.getBytes)
    // two rounds: cold then warm
    for (round <- 0 to 1) {
      println(s"=== round $round ===")
      val root = java.nio.file.Files.createTempDirectory("a13-probe").toString
      val st = new StreamStore(spark, root)
      val key = Array.fill(32)(0x24.toByte)
      t("createBasins") {
        Seq(CipherAlgo.Aegis256 -> "enc-aegis-basin",
            CipherAlgo.Aes256Gcm -> "enc-gcm-basin").foreach { case (algo, basin) =>
          st.catalog.createBasin(basin, BasinConfig(
            defaultStreamConfig =
              StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite)),
            streamCipher = Some(algo)))
          st.catalog.createStream(basin, "enc")
        }
      }
      Seq("enc-aegis-basin", "enc-gcm-basin").foreach { basin =>
        t(s"append[$basin]") {
          st.append(basin, "enc", AppendInput(Seq(rec("secret-payload"))),
            Some(1000), Some(key))
        }
        t(s"visible.collect[$basin]") {
          st.visible(basin, "enc").collect().head
        }
        t(s"readBatch-goodkey[$basin]") {
          st.readBatch(basin, "enc",
            ReadSpec(ReadStart(ReadFrom.SeqNum(0))), cipher = Some(key))
            .toOption.get.head
        }
        t(s"readBatch-wrongkey[$basin]") {
          try {
            st.readBatch(basin, "enc", ReadSpec(ReadStart(ReadFrom.SeqNum(0))),
              cipher = Some(Array.fill(32)(0x25.toByte)))
          } catch { case _: Throwable => () }
        }
      }
      import spark.implicits._
      t("ingest-bulk-enc") {
        st.catalog.createStream("enc-aegis-basin", "bulk")
        val bulkDf = (0 until 4).map(i =>
            ("enc-aegis-basin", "bulk", Option(1000L + i), s"bulk-$i".getBytes, i.toLong))
          .toDF("basin", "stream", "ts_client", "body", "arrival")
          .withColumn("headers",
            org.apache.spark.sql.functions.expr(
              "CAST(NULL AS ARRAY<STRUCT<name: BINARY, value: BINARY>>)"))
          .select("basin", "stream", "ts_client", "headers", "body", "arrival")
        st.ingest(bulkDf, Some(2000L), cipher = Some(key))
      }
      t("readBatch-bulk") {
        st.readBatch("enc-aegis-basin", "bulk",
          ReadSpec(ReadStart(ReadFrom.SeqNum(0))), cipher = Some(key)).toOption.get
      }
    }
    spark.stop()
  }
}
