package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.log._
import graft.model._

/** Control-plane-over-HTTP probe: the Bench cphttp phase in isolation
  * (create N streams, paged listing, one-record bulk ingest, check_tail
  * latencies, plus a serial 1k-getMeta round-trip timing), for
  * iterating on endpoint latency (TCP_NODELAY etc.) without a full
  * bench run.
  */
object CpHttpBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    System.setProperty("graft.ingest.timing", "1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (server, endpoint) = HttpObjectServer.start()
    try {
      val root = java.nio.file.Files.createTempDirectory("cphttp").toString
      val backend = HttpObjectBackend.install(root, endpoint)
      val st = new StreamStore(spark, root)
      st.catalog.createBasin("bench-basin", BasinConfig(
        defaultStreamConfig =
          StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
      // serial round-trip latency, 1k gets
      backend.putMeta(s"$root/ping.json", """{"p":1}""")
      val tp0 = System.nanoTime()
      (0 until 1000).foreach(_ => backend.getMeta(s"$root/ping.json", fresh = true))
      println(f"[cphttp] serial getMeta: ${(System.nanoTime() - tp0) / 1e6 / 1000}%.3f ms/rt")
      val names = (0 until n).map(i => f"hp-$i%05d")
      val t0 = System.nanoTime()
      st.catalog.createStreams("bench-basin", names)
      val tCreate = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      var after = ""; var listed = 0; var more = true
      while (more) {
        val p = st.catalog.listStreams("bench-basin", startAfter = after, limit = 1000)
        listed += p.items.size; after = p.items.last.name; more = p.hasMore
      }
      val tList = (System.nanoTime() - t1) / 1e9
      val df = spark.range(n).select(
        lit("bench-basin").as("basin"),
        concat(lit("hp-"), format_string("%05d", col("id"))).as("stream"),
        (lit(1700000000000L) + col("id")).as("ts_client"),
        expr("CAST(NULL AS ARRAY<STRUCT<name: BINARY, value: BINARY>>)").as("headers"),
        expr("CAST(md5(CAST(id AS STRING)) AS BINARY)").as("body"),
        col("id").as("arrival"))
      val t2 = System.nanoTime()
      st.ingest(df)
      val tIngest = (System.nanoTime() - t2) / 1e9
      val lat = (0 until 200).map { i =>
        val s = names(i * (n / 200) % n)
        val l0 = System.nanoTime()
        st.checkTail("bench-basin", s)
        (System.nanoTime() - l0) / 1e6
      }.sorted
      println(f"[cphttp] n=$n listed=$listed create=$tCreate%.2f list=$tList%.2f " +
        f"ingest=$tIngest%.2f checktail p50=${lat(100)}%.2f p99=${lat(198)}%.2f ms")
      // delete the ~30k-file root NOW: accumulated probe roots on the
      // disk-backed /tmp distorted every later fs measurement
      java.nio.file.Files.walk(java.nio.file.Paths.get(root))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    } finally { server.stop(0); spark.stop() }
  }
}
