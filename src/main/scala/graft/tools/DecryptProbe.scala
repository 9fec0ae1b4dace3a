package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.log._
import graft.model._

/** In-plan decrypt throughput probe: ingests N x 1 KiB records into an
  * AEGIS-256 basin and times the decrypting read (the Bench
  * read_1kib_enc phase in isolation), printing MiB/s over metered
  * (plaintext) bytes. Also prints the physical plan so duplicate
  * decrypt expressions (a CollapseProject artifact) are visible.
  */
object DecryptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("dec-probe").toString
    val st = new StreamStore(spark, root)
    val key = Array.tabulate(32)(i => (i * 7 + 3).toByte)
    st.catalog.createBasin("probe-basin", BasinConfig(
      defaultStreamConfig = StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite)),
      streamCipher = Some(CipherAlgo.Aegis256)))
    (0 until 8).foreach(i => st.catalog.createStream("probe-basin", s"s$i"))
    import spark.implicits._
    val n = 256000
    val payload = "x" * 1016
    val df = (0 until n).map(i => ("probe-basin", s"s${i % 8}", 1000L + i, payload))
      .toDF("basin", "stream", "ts_client", "bs")
      .selectExpr("basin", "stream", "ts_client",
        "CAST(NULL AS ARRAY<STRUCT<name: BINARY, value: BINARY>>) AS headers",
        "CAST(bs AS BINARY) AS body", "CAST(ts_client AS BIGINT) AS arrival")
    // plain-ingest control (separate store, same df) to attribute the
    // enc-vs-plain delta with warm JIT
    val rootP = java.nio.file.Files.createTempDirectory("dec-probe-plain").toString
    val stP = new StreamStore(spark, rootP)
    stP.catalog.createBasin("probe-basin", BasinConfig(
      defaultStreamConfig = StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
    (0 until 8).foreach(i => stP.catalog.createStream("probe-basin", s"s$i"))
    val tP = System.nanoTime()
    stP.ingest(df)
    println(f"plain ingest: ${n * 1024 / 1048576.0 / ((System.nanoTime() - tP) / 1e9)}%.1f MiB/s")
    val tI = System.nanoTime()
    st.ingest(df, cipher = Some(key))
    println(f"enc ingest: ${n * 1024 / 1048576.0 / ((System.nanoTime() - tI) / 1e9)}%.1f MiB/s")
    val bytes = n.toLong * 1024
    def read() = (0 until 8).map(i =>
      RecordCipher.decryptRecords(st.visible("probe-basin", s"s$i"), key, "probe-basin", s"s$i"))
      .reduce(_ unionByName _)
    // warm
    read().agg(sum(octet_length(col("body")))).first()
    EnvelopeCodec.decryptCalls.reset()
    val t0 = System.nanoTime()
    val got = read().agg(sum(octet_length(col("body")))).first().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"decrypt read: ${bytes / 1048576.0 / sec}%.1f MiB/s (sum body bytes = $got) " +
      s"decrypts=${EnvelopeCodec.decryptCalls.sum()} rows=$n")
    EnvelopeCodec.decryptCalls.reset()
    val t1 = System.nanoTime()
    val cnt = read().where(octet_length(col("body")) > 0 && size(col("headers")) >= 0).count()
    val sec2 = (System.nanoTime() - t1) / 1e9
    println(f"decrypt read (headers+body referenced): ${bytes / 1048576.0 / sec2}%.1f MiB/s " +
      s"rows=$cnt decrypts=${EnvelopeCodec.decryptCalls.sum()}")
    // basin-wide single-scan shape (the Bench enc-read plan): one
    // decrypt project with stream-derived AAD, no per-stream unions
    def readBasin() = RecordCipher.decryptBasin(
      st.visibleBasin("probe-basin"), key, "probe-basin")
    readBasin().agg(sum(octet_length(col("body")))).first() // warm
    EnvelopeCodec.decryptCalls.reset()
    val t2 = System.nanoTime()
    val gotB = readBasin().agg(sum(octet_length(col("body")))).first().getLong(0)
    val sec3 = (System.nanoTime() - t2) / 1e9
    println(f"decrypt basin-wide read: ${bytes / 1048576.0 / sec3}%.1f MiB/s " +
      s"(sum body bytes = $gotB) decrypts=${EnvelopeCodec.decryptCalls.sum()} rows=$n")
    spark.stop()
  }
}
