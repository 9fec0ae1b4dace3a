package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.log.StreamStore
import graft.model._

/** Per-round benchmark. Reports, in one JSON line:
  * - per-query wall seconds over SPARK_GRAFT_SF_DIR (after a warm-up
  *   pass so JVM/session startup is not billed to the first query);
  * - an s2-bench-style workload (cli/src/bench.rs:239-247 format):
  *   sustained append MiB/s (bulk ingest path), catch-up read MiB/s,
  *   and unary append ack latency min/p50/p90/p99/max.
  */
object Bench {

  private def pct(sorted: Seq[Double], p: Double): Double =
    if (sorted.isEmpty) 0.0
    else sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- warm-up (not billed): session, codegen, parquet footers ----
    SparkEntry.queries("r1_check_tail")(spark, sfDir).count()
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()

    // ---- query timings ----
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ---- s2-style append/read workload over the events table ----
    val root = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val store = new StreamStore(spark, root)
    store.catalog.createBasin("bench-basin",
      BasinConfig(defaultStreamConfig =
        StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
    val ev = graft.queries.Records.events(spark, sfDir)
    val ingestDf = ev.select(
      lit("bench-basin").as("basin"),
      col("event_type").as("stream"),
      expr("ts div 1000000").as("ts_client"),
      expr("CAST(NULL AS ARRAY<STRUCT<name: BINARY, value: BINARY>>)").as("headers"),
      col("props").cast("binary").as("body"),
      col("event_id").as("arrival"))
    ev.select("event_type").distinct().collect().foreach(r =>
      store.catalog.createStream("bench-basin", r.getString(0)))

    // sustained append: bulk ingest path (the scale path)
    val tIngest0 = System.nanoTime()
    store.ingest(ingestDf)
    val ingestSec = (System.nanoTime() - tIngest0) / 1e9
    val (totalBytes, totalRecords) = {
      val r = spark.read.parquet(s"$root/data")
        .agg(sum("metered_size"), count(lit(1))).first()
      (r.getLong(0), r.getLong(1))
    }
    val appendMibps = totalBytes / 1048576.0 / ingestSec

    // catch-up read: full ordered scan back through the store
    val tRead0 = System.nanoTime()
    val readBytes = spark.read.parquet(s"$root/data")
      .sortWithinPartitions("stream", "seq_num")
      .agg(sum("metered_size")).first().getLong(0)
    val readSec = (System.nanoTime() - tRead0) / 1e9
    val readMibps = readBytes / 1048576.0 / readSec

    // s2-bench-style 1 KiB workload (cli/src/bench.rs generates record
    // bodies; MiB/s on the events table's 16-byte props is record-size
    // bound, so this phase measures throughput at the reference bench's
    // record scale): same row count as events, 8 streams, 1 KiB bodies.
    val nBig = ev.count()
    val root2 = java.nio.file.Files.createTempDirectory("graft-bench1k").toString
    val store2 = new StreamStore(spark, root2)
    store2.catalog.createBasin("bench-basin",
      BasinConfig(defaultStreamConfig =
        StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
    (0 until 8).foreach(i => store2.catalog.createStream("bench-basin", s"s$i"))
    val bigDf = spark.range(nBig).select(
      lit("bench-basin").as("basin"),
      concat(lit("s"), (col("id") % 8).cast("string")).as("stream"),
      (lit(1700000000000L) + col("id")).as("ts_client"),
      expr("CAST(NULL AS ARRAY<STRUCT<name: BINARY, value: BINARY>>)").as("headers"),
      expr("CAST(repeat(substr(md5(CAST(id AS STRING)), 1, 16), 64) AS BINARY)").as("body"),
      col("id").as("arrival"))
    val tBig0 = System.nanoTime()
    store2.ingest(bigDf)
    val bigSec = (System.nanoTime() - tBig0) / 1e9
    val bigBytes = spark.read.parquet(s"$root2/data")
      .agg(sum("metered_size")).first().getLong(0)
    val append1kMibps = bigBytes / 1048576.0 / bigSec
    val tBigR0 = System.nanoTime()
    spark.read.parquet(s"$root2/data")
      .sortWithinPartitions("stream", "seq_num")
      .agg(sum("metered_size"), count(lit(1))).first()
    val read1kMibps = bigBytes / 1048576.0 / ((System.nanoTime() - tBigR0) / 1e9)

    // unary append ack latency (small batches through the full A1-A7
    // path: validate -> fence/CAS -> assign -> parquet file -> manifest)
    val ackBatch = AppendInput(Seq.fill(10)(
      EnvelopeRecord(Nil, Array.fill(100)(42: Byte))))
    val acks = (0 until 30).map { _ =>
      val t0 = System.nanoTime()
      store.append("bench-basin", "click", ackBatch)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    val ack = Map(
      "min" -> acks.head, "p50" -> pct(acks, 0.50), "p90" -> pct(acks, 0.90),
      "p99" -> pct(acks, 0.99), "max" -> acks.last)

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val ackJson = Seq("min", "p50", "p90", "p99", "max")
      .map(k => "\"" + k + f"\":${ack(k)}%.1f").mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","append_mibps":$appendMibps%.3f,"read_mibps":$readMibps%.3f,"append_records_per_sec":${totalRecords / ingestSec}%.0f,"avg_record_bytes":${totalBytes / math.max(totalRecords, 1)},"ingest_sec":$ingestSec%.3f,"append_1kib_mibps":$append1kMibps%.3f,"read_1kib_mibps":$read1kMibps%.3f,"ack_latency_ms":$ackJson}""")
    spark.stop()
  }
}
