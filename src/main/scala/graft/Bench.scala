package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.log.StreamStore
import graft.model._

/** Per-round benchmark. Reports:
  * - per-query wall seconds over SPARK_GRAFT_SF_DIR (after a warm-up
  *   pass so JVM/session startup is not billed to the first query),
  *   raw AND calib-normalized (`queries_norm`);
  * - an s2-bench-style workload (cli/src/bench.rs:239-247 format):
  *   sustained append MiB/s (bulk ingest path), catch-up read MiB/s,
  *   and unary append ack latency min/p50/p90/p99/max.
  *
  * Output: the full JSON line (also persisted to BENCH_local.json),
  * then a compact map-free summary as the FINAL stdout line — the
  * driver's artifact keeps only a ~2000-char stdout tail, which the
  * summary always fits inside as one complete JSON object.
  */
object Bench {

  private def pct(sorted: Seq[Double], p: Double): Double =
    if (sorted.isEmpty) 0.0
    else sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))

  /** Single-core host-speed calibration: a fixed xorshift spin whose
    * wall time depends only on effective core speed (no allocation, no
    * I/O, fits in registers). Reported as `cpu_calib_sec` so
    * cross-round wall-clock comparisons can be discounted for
    * shared-host slowdown — round 11 measured a UNIFORM ~1.4×
    * wall+cpu elevation on completely untouched queries, which this
    * one number would have attributed to the host immediately.
    * min-of-3 rejects scheduler preemption spikes.
    */
  /** Quiet-host reference value of [[cpuCalibSec]] (measured on this
    * container idle, r11/r12). `queries_norm` = wall * (this / calib):
    * a run on a 1.4x-loaded host reports calib ~1.4x larger and its
    * normalized times scale back down, so cross-round comparisons of
    * `queries_norm` (BenchRegressionSpec, README round table) are
    * host-load-proof. */
  val CalibBaselineSec = 0.127

  /** Quiet-host reference value of [[parCalibSec]] (measured on this
    * container idle, r13). The round-12 driver run proved the scalar
    * probe alone is blind to exactly the contention that matters: its
    * calib read 1.01 (quiet) while the shuffle-heaviest queries ran
    * 2.5-6x their snapshot — multi-threaded scheduler + memory-
    * bandwidth contention does not slow a single register-resident
    * spin. This probe runs 16 threads each alloc+sorting a 16 MiB
    * long array, so core oversubscription and bandwidth pressure show
    * up in its wall time the way they show up in a shuffle stage. */
  val ParCalibBaselineSec = 0.309

  /** Cumulative stop-the-world GC seconds of this JVM (all collectors).
    * Recorded per query and per run so an anomalous driver artifact is
    * adjudicable FROM THE ARTIFACT (VERDICT r17 #2: same-code
    * process-CPU 7-49x on the shuffle-heavy tier with both calib
    * probes quiet is a GC/memory signature, but the artifact carried
    * no GC evidence — wall contention cannot inflate process-CPU 49x;
    * collector threads billing to the process can). */
  private[graft] def gcTimeSec(): Double =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1e3

  /** Peak heap usage (MiB) across all heap memory pools since start
    * (the JVM tracks pool peaks natively — no sampling thread). */
  private[graft] def heapPeakMb(): Long =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L))
      .sum / (1024 * 1024)

  /** Median fsync latency (ms) of 20 4-KiB write+fsync cycles — the
    * DISK-side calibration probe the CPU probes can't see. The
    * fs-heavy rows (cp10k ingest, ack latency, a8 serial, 1 KiB
    * append) are fsync-bound: a shared-host IO aftershock that
    * multiplies fsync 20x multiplies them too while cpu_calib reads
    * quiet (observed r18: fsync p50 0.5 ms -> 11 ms moved cp10k
    * ingest 12 s -> 88 s at cpu norm 0.94). Recording it makes the
    * artifact disk-adjudicable, same rationale as gc_sec.
    *
    * `dir` places the probe file on the SAME filesystem the bench
    * stores fsync to (r18 ADVICE: java.io.tmpdir can be a different
    * fs — often tmpfs — than the store root, in which case the probe
    * reads quiet while the data disk is saturated). null = tmpdir
    * (the standalone-tool form). */
  private[graft] def fsyncP50Ms(dir: java.nio.file.Path = null): Double = {
    val f =
      if (dir == null) java.nio.file.Files.createTempFile("graft-fsyncprobe", ".bin")
      else java.nio.file.Files.createTempFile(dir, "graft-fsyncprobe", ".bin")
    val buf = java.nio.ByteBuffer.allocate(4096)
    val lat = (0 until 20).map { _ =>
      buf.rewind()
      val t0 = System.nanoTime()
      val ch = java.nio.channels.FileChannel.open(f,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try { ch.write(buf); ch.force(true) } finally ch.close()
      (System.nanoTime() - t0) / 1e6
    }.sorted
    java.nio.file.Files.deleteIfExists(f)
    lat(lat.size / 2)
  }

  private[graft] def cpuCalibSec(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < (1 << 26)) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        i += 1
      }
      if (x == 42L) System.err.print("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm the JIT, unbilled
    Seq(once(), once(), once()).min
  }

  /** Parallel host-load probe (see [[ParCalibBaselineSec]]): wall time
    * for 16 concurrent alloc+fill+sort threads. min-of-3 after a JIT
    * warm pass, mirroring [[cpuCalibSec]]. */
  private[graft] def parCalibSec(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      val threads = (0 until 16).map { t =>
        val th = new Thread(() => {
          val rnd = new java.util.Random(t)
          val arr = Array.fill(1 << 21)(rnd.nextLong())
          java.util.Arrays.sort(arr)
          if (arr(0) == 42L) System.err.print("")
        })
        th.start(); th
      }
      threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    once()
    Seq(once(), once(), once()).min
  }

  // -------------------------------------------------------------------
  // Re-measurement environment (BenchRegressionSpec + Rm8Baseline tool)
  // -------------------------------------------------------------------

  /** The flag-confirmation session: local[8] so a re-measurement
    * doesn't commandeer the whole host mid-suite. getOrCreate — in a
    * test JVM an earlier suite's session may be inherited instead
    * (the structural skew the spec's sentinel scaling absorbs). */
  private[graft] def remeasureSession(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** min-of-3 (calib-normalized wall, process-cpu) for one query after
    * an unbilled warm pass — the single measurement definition behind
    * per-query flag confirmation, the AGGREGATE flag's sampled
    * re-measurement, and the `queries_rm8` snapshot baseline those
    * sampled sums compare against (same code = same environment
    * class, so baseline and live values are commensurable). None if
    * the query no longer exists. */
  private[graft] def minOf3Norm(spark: SparkSession, name: String,
                                sfDir: String): Option[(Double, Double)] = {
    val fn = SparkEntry.queries.getOrElse(name, return None)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    fn(spark, sfDir).count() // warm (JIT, plan cache)
    val passes = (0 until 3).map { _ =>
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
    }
    val normFactor = math.min(
      CalibBaselineSec / cpuCalibSec(), ParCalibBaselineSec / parCalibSec())
    Some((passes.map(_._1).min * normFactor, passes.map(_._2).min))
  }

  /** The AGGREGATE flag's deterministic re-measure sample: the top-n
    * snapshot queries by normalized cost (ties by name). Defined here
    * so the snapshot tool and the gate can never disagree on it. */
  private[graft] def rm8Sample(snapNorm: Map[String, Double],
                               n: Int = 16): Seq[String] =
    snapNorm.toSeq.sortBy { case (k, v) => (-v, k) }.take(n).map(_._1)

  /** JSON string literal with FULL escaping (backslash, quote, and all
    * control chars < 0x20 — exception messages routinely carry tabs
    * and CRs from plan fragments; one raw control char would make the
    * whole artifact unparseable, the exact failure this file's error
    * capture exists to prevent). Mirrors Verify's q().
    */
  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    // All bench JSON is built with f"" interpolators, which format
    // through the default locale — on a comma-decimal locale (de_DE)
    // the artifact would be invalid JSON. Pin ROOT once for the whole
    // process instead of per call site.
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // One parent directory for every store root this run creates, so
    // the fsync probe below measures the SAME filesystem the fs-heavy
    // phases fsync to (r18 ADVICE: tmpdir may be a different fs).
    val benchRoot = java.nio.file.Files.createTempDirectory("graft-bench-root")

    // ---- contamination probes, sampled BEFORE the run and at every
    // fs-heavy phase boundary, not just at artifact-write: the r18
    // driver artifact's end-of-run fsync probe read QUIET because the
    // IO aftershock that collapsed its serving rows had passed by
    // write time — a mid-run sample would have caught it. Same for
    // the CPU probes: par_calib at the END cannot prove the QUERY
    // phase was quiet. The artifact carries every sample plus the
    // MAX, and a quiet_host verdict computed from the worst sample.
    val fsyncSamples = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def sampleFsync(label: String): Double = {
      val v = fsyncP50Ms(benchRoot)
      fsyncSamples(label) = v
      v
    }
    def loadavg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadavgPre = loadavg()
    sampleFsync("pre")
    val cpuCalibPre = cpuCalibSec()
    val parCalibPre = parCalibSec()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- warm-up (not billed): session, codegen, parquet footers,
    // and the SHARED e2e fixture store — its one-time ingest was
    // otherwise billed to whichever e2e_store_* query ran first
    // (alphabetically e2e_store_read_limits), masking that query's
    // actual cost. Guarded: a warm-up failure (round 10: a testdata
    // schema drift broke every events-backed plan at analysis) must
    // cost its own queries' entries, never the whole artifact.
    def guard(what: String)(f: => Unit): Unit =
      try f catch { case e: Throwable =>
        System.err.println(s"bench warm-up '$what' failed: ${e.getClass.getSimpleName}: ${e.getMessage}") }
    guard("r1_check_tail")(SparkEntry.queries("r1_check_tail")(spark, sfDir).count())
    guard("q1_pricing_summary")(SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count())
    guard("e2e store fixture")(graft.queries.EngineOps.storeFor(spark, sfDir))
    // First spark.sql through a DSv2 catalog plugin pays one-time
    // session-catalog + parser + plugin-classloading init; round 12's
    // driver run showed e2e_sql_catalog 6.2x its snapshot with a quiet
    // scalar calib — exactly the first-use-init-inside-the-timed-region
    // signature. Pay it here, unbilled, through a throwaway plugin.
    guard("sql catalog init")(SparkEntry.queries("e2e_sql_catalog")(spark, sfDir).count())

    // ---- query timings ----
    // Median-of-3 wall time per query (with the median pass's
    // process-CPU seconds alongside). One wall sample proved
    // load-fragile (round 6: 2-5x phantom "regressions" a quiet re-run
    // erased); best-of-2 still let one lucky pass hide a contaminated
    // run (round 12: the driver's artifact tripped the regression gate
    // on 4 shuffle-heavy queries). The median rejects BOTH a one-off
    // contention spike and a one-off lucky-cache pass, and the CPU
    // seconds ride along because CPU barely moves under external load
    // — BenchRegressionSpec uses that to tell host contention (wall up,
    // cpu flat) from a real algorithmic regression (both up).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val queryErrors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timed(name: String,
              fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double, Double) = {
      val g0 = gcTimeSec()
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        // One bad query costs one entry (recorded by name in the JSON),
        // never the artifact — round 10's schema drift produced rc=1
        // and NO numbers at all.
        queryErrors.getOrElseUpdate(name,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}")
      }
      ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9,
        gcTimeSec() - g0)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val passes = Seq(timed(name, fn), timed(name, fn), timed(name, fn))
      name -> passes.sortBy(_._1)(Ordering.Double.TotalOrdering)(1) // median wall
    }
    sampleFsync("queries")

    // ---- s2-style append/read workload over the events table ----
    // The whole workload is fallible (it re-reads events.parquet and
    // drives the store end-to-end); compute it into a JSON fragment so
    // a failure here degrades to zeroed workload metrics + an error
    // note while the per-query timings above still ship.
    val workloadJson: String = try {
    val root = java.nio.file.Files.createTempDirectory(benchRoot, "graft-bench").toString
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

    // Catch-up reads carry the reference bench's integrity oracle
    // (cli/src/bench.rs:389-394): an md5 CHAIN over bodies per stream,
    // folded during an ordered per-partition consume, compared against
    // the chain of the source data in arrival order. A mismatch (or an
    // out-of-order delivery) flips `read_verified` — the read MiB/s is
    // measured on this verified ordered pass, so optimizer sort
    // elimination can't silently turn it into an unsorted-scan number.
    import spark.implicits._
    def streamChains(df: org.apache.spark.sql.DataFrame, orderCol: String)
        : Map[String, (String, Long, Long, Boolean)] =
      df.select(col("stream").cast("string").as("s"),
          col(orderCol).cast("long").as("ord"), col("body"))
        .repartition(col("s"))
        .sortWithinPartitions("s", "ord")
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val acc = scala.collection.mutable.LinkedHashMap
            .empty[String, (Array[Byte], Long, Long, Long, Boolean)]
          it.foreach { r =>
            val s = r.getString(0)
            val ord = r.getLong(1)
            val b = r.getAs[Array[Byte]](2)
            val (c0, n, bytes, last, ok) =
              acc.getOrElse(s, (Array.emptyByteArray, 0L, 0L, Long.MinValue, true))
            val len = if (b == null) 0L else b.length.toLong
            md.reset(); md.update(c0); if (b != null) md.update(b)
            acc(s) = (md.digest(), n + 1, bytes + len, ord, ok && ord > last)
          }
          acc.iterator.map { case (s, (c, n, bytes, _, ok)) =>
            (s, c.map(x => f"$x%02x").mkString, n, bytes, ok) }
        }
        .collect().map { case (s, c, n, bytes, ok) => s -> ((c, n, bytes, ok)) }.toMap

    // raw unordered scan throughput (no ordering claim), then the
    // ordered, chain-verified catch-up that backs read_mibps
    val tScan0 = System.nanoTime()
    val readBytes = spark.read.parquet(s"$root/data")
      .agg(sum("metered_size")).first().getLong(0)
    val scanMibps = readBytes / 1048576.0 / ((System.nanoTime() - tScan0) / 1e9)
    val tRead0 = System.nanoTime()
    val gotEvents = streamChains(spark.read.parquet(s"$root/data"), "seq_num")
    val readSec = (System.nanoTime() - tRead0) / 1e9
    val readMibps = readBytes / 1048576.0 / readSec
    val eventsVerified = {
      val exp = streamChains(ingestDf, "arrival")
      exp.keySet == gotEvents.keySet && exp.forall { case (s, (c, n, _, _)) =>
        val (gc, gn, _, gok) = gotEvents(s)
        gok && gc == c && gn == n
      }
    }

    // s2-bench-style 1 KiB workload (cli/src/bench.rs generates record
    // bodies; MiB/s on the events table's 16-byte props is record-size
    // bound, so this phase measures throughput at the reference bench's
    // record scale): same row count as events, 8 streams, 1 KiB bodies.
    val nBig = ev.count()
    val root2 = java.nio.file.Files.createTempDirectory(benchRoot, "graft-bench1k").toString
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

    // 1 KiB catch-up: same chain-verified ordered consume
    val expected = streamChains(bigDf, "arrival")
    val tBigR0 = System.nanoTime()
    val got = streamChains(spark.read.parquet(s"$root2/data"), "seq_num")
    val read1kSec = (System.nanoTime() - tBigR0) / 1e9
    val read1kMibps = bigBytes / 1048576.0 / read1kSec
    val readVerified = eventsVerified && expected.keySet == got.keySet &&
      expected.forall { case (s, (c, n, _, _)) =>
        val (gc, gn, _, gok) = got(s)
        gok && gc == c && gn == n
      }

    // encrypted 1 KiB workload (A13 at bench scale): same rows through
    // an AEGIS-256 basin — appends encrypt executor-side inside the
    // staged write, the catch-up decrypts via the codegen'd
    // record_decrypt plan column and must reproduce the PLAINTEXT
    // md5 chains (so `enc_verified` proves the full encrypt->decrypt
    // loop at throughput, not just that bytes moved). MiB/s stays
    // normalized to metered (= plaintext) bytes, so the enc/plain
    // ratio IS the cipher overhead.
    val root3 = java.nio.file.Files.createTempDirectory(benchRoot, "graft-bench1ke").toString
    val store3 = new StreamStore(spark, root3)
    store3.catalog.createBasin("bench-basin",
      BasinConfig(defaultStreamConfig =
        StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite)),
        streamCipher = Some(graft.log.CipherAlgo.Aegis256)))
    (0 until 8).foreach(i => store3.catalog.createStream("bench-basin", s"s$i"))
    val encKey = Array.tabulate(32)(i => (i * 7 + 3).toByte)
    val tEnc0 = System.nanoTime()
    store3.ingest(bigDf, cipher = Some(encKey))
    val encSec = (System.nanoTime() - tEnc0) / 1e9
    val encBytes = spark.read.parquet(s"$root3/data")
      .agg(sum("metered_size")).first().getLong(0)
    val append1kEncMibps = encBytes / 1048576.0 / encSec
    val tEncR0 = System.nanoTime()
    // basin-wide decrypting catch-up: ONE scan with a per-row AAD
    // derived from the stream column — the same plan shape as the
    // plaintext read above (never one union branch per stream)
    val decDf = graft.log.RecordCipher.decryptBasin(
      store3.visibleBasin("bench-basin"), encKey, "bench-basin")
    val gotEnc = streamChains(decDf, "seq_num")
    val read1kEncSec = (System.nanoTime() - tEncR0) / 1e9
    val read1kEncMibps = encBytes / 1048576.0 / read1kEncSec
    val encVerified = expected.keySet == gotEnc.keySet &&
      expected.forall { case (s, (c, n, _, _)) =>
        val (gc, gn, _, gok) = gotEnc(s)
        gok && gc == c && gn == n
      }

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
    val ackJson = Seq("min", "p50", "p90", "p99", "max")
      .map(k => "\"" + k + f"\":${ack(k)}%.1f").mkString("{", ",", "}")
    f""""append_mibps":$appendMibps%.3f,"read_mibps":$readMibps%.3f,"append_records_per_sec":${totalRecords / ingestSec}%.0f,"avg_record_bytes":${totalBytes / math.max(totalRecords, 1)},"ingest_sec":$ingestSec%.3f,"append_1kib_mibps":$append1kMibps%.3f,"read_1kib_mibps":$read1kMibps%.3f,"append_1kib_enc_mibps":$append1kEncMibps%.3f,"read_1kib_enc_mibps":$read1kEncMibps%.3f,"enc_verified":$encVerified,"read_scan_mibps":$scanMibps%.3f,"read_verified":$readVerified,"ack_latency_ms":$ackJson"""
    } catch { case e: Throwable =>
      val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}"
      System.err.println(s"bench workload failed: $msg")
      s""""append_mibps":0,"read_mibps":0,"read_verified":false,"workload_error":${jsonStr(msg)}"""
    }
    sampleFsync("workload")

    // ---- many-streams control plane (VERDICT r12 #7): 10k streams on
    // one basin — bulk create, full 10-page listing, check_tail p99
    // over a 200-stream sample, and one record through EVERY stream in
    // a single bulk ingest (the 10k-manifest commit fan-out). Proves
    // the hot paths stay flat in #streams: create is 64 shard writes,
    // a list page is bounded-heap work over cached shards, check_tail
    // is one cached manifest read, and the ingest commit loop is the
    // 16-way parallelMap. Guarded like the workload: a failure here
    // zeroes these keys, never the artifact.
    val controlPlaneJson: String = try {
      val rootCp = java.nio.file.Files.createTempDirectory(benchRoot, "graft-bench10k").toString
      val storeCp = new StreamStore(spark, rootCp)
      storeCp.catalog.createBasin("bench-basin",
        BasinConfig(defaultStreamConfig =
          StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
      val nStreams = 10000
      val names = (0 until nStreams).map(i => f"cp-$i%05d")
      val tCreate0 = System.nanoTime()
      storeCp.catalog.createStreams("bench-basin", names)
      val createSec = (System.nanoTime() - tCreate0) / 1e9
      val tList0 = System.nanoTime()
      var after = ""; var listed = 0; var more = true
      while (more) {
        val p = storeCp.catalog.listStreams("bench-basin",
          startAfter = after, limit = 1000)
        listed += p.items.size
        after = p.items.last.name
        more = p.hasMore
      }
      val listSec = (System.nanoTime() - tList0) / 1e9
      // one record through every stream, one bulk ingest job
      val cpDf = spark.range(nStreams).select(
        lit("bench-basin").as("basin"),
        concat(lit("cp-"), format_string("%05d", col("id"))).as("stream"),
        (lit(1700000000000L) + col("id")).as("ts_client"),
        expr("CAST(NULL AS ARRAY<STRUCT<name: BINARY, value: BINARY>>)").as("headers"),
        expr("CAST(md5(CAST(id AS STRING)) AS BINARY)").as("body"),
        col("id").as("arrival"))
      val tIng0 = System.nanoTime()
      storeCp.ingest(cpDf)
      val cpIngestSec = (System.nanoTime() - tIng0) / 1e9
      // check_tail p99 over a deterministic 200-stream sample
      val sample = (0 until 200).map(i => names(i * 50 % nStreams))
      val tails = sample.map { s =>
        val t0 = System.nanoTime()
        val t = storeCp.checkTail("bench-basin", s)
        val ms = (System.nanoTime() - t0) / 1e6
        (ms, t.seqNum)
      }
      require(tails.forall(_._2 == 1L), "10k-stream ingest lost a record")
      val lat = tails.map(_._1).sorted
      f""""cp10k_streams":$listed,"cp10k_create_sec":$createSec%.3f,"cp10k_list_pages_sec":$listSec%.3f,"cp10k_ingest_sec":$cpIngestSec%.3f,"cp10k_checktail_p50_ms":${pct(lat, 0.50)}%.2f,"cp10k_checktail_p99_ms":${pct(lat, 0.99)}%.2f"""
    } catch { case e: Throwable =>
      val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}"
      System.err.println(s"bench control-plane phase failed: $msg")
      s""""cp10k_streams":0,"cp10k_error":${jsonStr(msg)}"""
    }
    sampleFsync("cp10k")

    // ---- cp50k (round 19): one step up the control-plane fan-out
    // ceiling — 50k streams, one record each, ONE bulk ingest. The
    // r16 probe put this at ~29 s cold with the per-stream
    // manifest-commit loop dominating linearly; round 19 sharded the
    // `_state` dir (the CAS temp+rename and lock-file creation were
    // convoying on ONE parent directory's kernel mutex) and moved the
    // staged-dir sweep to a background GC worker. The GC drain is
    // measured honestly as its own key (it is real disk work — just
    // not on the ack path), and the next phase's fsync sample would
    // expose it if it bled over.
    val cp50kJson: String = try {
      val root50 = java.nio.file.Files.createTempDirectory(benchRoot, "graft-bench50k").toString
      val store50 = new StreamStore(spark, root50)
      store50.catalog.createBasin("bench-basin",
        BasinConfig(defaultStreamConfig =
          StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
      val n50 = 50000
      val names50 = (0 until n50).map(i => f"cq-$i%05d")
      val tC0 = System.nanoTime()
      store50.catalog.createStreams("bench-basin", names50)
      val create50Sec = (System.nanoTime() - tC0) / 1e9
      val df50 = spark.range(n50).select(
        lit("bench-basin").as("basin"),
        concat(lit("cq-"), format_string("%05d", col("id"))).as("stream"),
        (lit(1700000000000L) + col("id")).as("ts_client"),
        expr("CAST(NULL AS ARRAY<STRUCT<name: BINARY, value: BINARY>>)").as("headers"),
        expr("CAST(md5(CAST(id AS STRING)) AS BINARY)").as("body"),
        col("id").as("arrival"))
      val tI0 = System.nanoTime()
      store50.ingest(df50)
      val ingest50Sec = (System.nanoTime() - tI0) / 1e9
      val tG0 = System.nanoTime()
      store50.awaitStageGc()
      val gc50Sec = (System.nanoTime() - tG0) / 1e9
      val sample50 = (0 until 200).map(i => names50(i * 250 % n50))
      val tails50 = sample50.map { s =>
        val t0 = System.nanoTime()
        val t = store50.checkTail("bench-basin", s)
        ((System.nanoTime() - t0) / 1e6, t.seqNum)
      }
      require(tails50.forall(_._2 == 1L), "50k-stream ingest lost a record")
      val lat50 = tails50.map(_._1).sorted
      f""""cp50k_streams":$n50,"cp50k_create_sec":$create50Sec%.3f,"cp50k_ingest_sec":$ingest50Sec%.3f,"cp50k_stage_gc_sec":$gc50Sec%.3f,"cp50k_checktail_p50_ms":${pct(lat50, 0.50)}%.2f,"cp50k_checktail_p99_ms":${pct(lat50, 0.99)}%.2f"""
    } catch { case e: Throwable =>
      val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}"
      System.err.println(s"bench cp50k phase failed: $msg")
      s""""cp50k_streams":0,"cp50k_error":${jsonStr(msg)}"""
    }
    sampleFsync("cp50k")

    // ---- control plane over a REAL HTTP endpoint: the same flow at
    // the SAME 10k streams as the POSIX phase above, so the two
    // adapters' numbers are directly comparable. Every create/list/
    // commit/check_tail is an actual HTTP request, conditional puts
    // decided server-side; meta reads revalidate a client cache via
    // If-None-Match/304.
    val httpControlPlaneJson: String = try {
      val (server, endpoint) = graft.log.HttpObjectServer.start()
      try {
        val rootH = java.nio.file.Files.createTempDirectory(benchRoot, "graft-benchhttp").toString
        graft.log.HttpObjectBackend.install(rootH, endpoint)
        val storeH = new StreamStore(spark, rootH)
        storeH.catalog.createBasin("bench-basin",
          BasinConfig(defaultStreamConfig =
            StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
        val nH = 10000
        val namesH = (0 until nH).map(i => f"hp-$i%05d")
        val tC0 = System.nanoTime()
        storeH.catalog.createStreams("bench-basin", namesH)
        val hCreateSec = (System.nanoTime() - tC0) / 1e9
        val tL0 = System.nanoTime()
        var afterH = ""; var listedH = 0; var moreH = true
        while (moreH) {
          val p = storeH.catalog.listStreams("bench-basin",
            startAfter = afterH, limit = 1000)
          listedH += p.items.size
          afterH = p.items.last.name
          moreH = p.hasMore
        }
        val hListSec = (System.nanoTime() - tL0) / 1e9
        val hDf = spark.range(nH).select(
          lit("bench-basin").as("basin"),
          concat(lit("hp-"), format_string("%05d", col("id"))).as("stream"),
          (lit(1700000000000L) + col("id")).as("ts_client"),
          expr("CAST(NULL AS ARRAY<STRUCT<name: BINARY, value: BINARY>>)").as("headers"),
          expr("CAST(md5(CAST(id AS STRING)) AS BINARY)").as("body"),
          col("id").as("arrival"))
        val tI0 = System.nanoTime()
        storeH.ingest(hDf)
        val hIngestSec = (System.nanoTime() - tI0) / 1e9
        val sampleH = (0 until 200).map(i => namesH(i * 10 % nH))
        val tailsH = sampleH.map { s =>
          val t0 = System.nanoTime()
          val t = storeH.checkTail("bench-basin", s)
          ((System.nanoTime() - t0) / 1e6, t.seqNum)
        }
        require(tailsH.forall(_._2 == 1L), "http-endpoint ingest lost a record")
        val latH = tailsH.map(_._1).sorted
        // A8 pipelining vs the serial unary path, same endpoint: the
        // serial loop pays (manifest read + data PUT + CAS) per batch;
        // the session's group commit amortizes the barrier across the
        // backlog — this ratio is the pipelining win the reference
        // documents against object-storage latency (README:176).
        storeH.catalog.createStream("bench-basin", "a8-serial")
        storeH.catalog.createStream("bench-basin", "a8-pipe")
        val nBatches = 200
        val a8Batch = AppendInput(Seq.fill(10)(
          EnvelopeRecord(Nil, Array.fill(256)(7: Byte))))
        val tSer0 = System.nanoTime()
        (0 until nBatches).foreach(_ =>
          storeH.append("bench-basin", "a8-serial", a8Batch))
        val serialSec = (System.nanoTime() - tSer0) / 1e9
        val sessH = new graft.log.AppendSession(storeH, "bench-basin", "a8-pipe")
        val tPipe0 = System.nanoTime()
        val futsH = (0 until nBatches).map(_ => sessH.submit(a8Batch))
        import scala.concurrent.duration._
        futsH.foreach(f => require(
          scala.concurrent.Await.result(f, 120.seconds).isRight,
          "pipelined append failed"))
        val pipeSec = (System.nanoTime() - tPipe0) / 1e9
        sessH.close()
        require(storeH.checkTail("bench-basin", "a8-serial").seqNum == nBatches * 10L &&
          storeH.checkTail("bench-basin", "a8-pipe").seqNum == nBatches * 10L,
          "a8 workload lost records")
        val serialBps = nBatches / serialSec
        val pipeBps = nBatches / pipeSec
        f""""cphttp_streams":$listedH,"cphttp_create_sec":$hCreateSec%.3f,"cphttp_list_pages_sec":$hListSec%.3f,"cphttp_ingest_sec":$hIngestSec%.3f,"cphttp_checktail_p50_ms":${pct(latH, 0.50)}%.2f,"cphttp_checktail_p99_ms":${pct(latH, 0.99)}%.2f,"a8_http_serial_batches_per_sec":$serialBps%.1f,"a8_http_pipelined_batches_per_sec":$pipeBps%.1f,"a8_http_pipeline_speedup":${pipeBps / serialBps}%.2f"""
      } finally server.stop(0)
    } catch { case e: Throwable =>
      val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}"
      System.err.println(s"bench http control-plane phase failed: $msg")
      s""""cphttp_streams":0,"cphttp_error":${jsonStr(msg)}"""
    }
    sampleFsync("cphttp")

    val recordsApiJson: String = recordsApiPhaseJson(spark, benchRoot)
    sampleFsync("records_api")

    val qs = results.map { case (k, (w, _, _)) => "\"" + k + f"\":$w%.3f" }
      .mkString("{", ",", "}")
    val qsCpu = results.map { case (k, (_, c, _)) => "\"" + k + f"\":$c%.3f" }
      .mkString("{", ",", "}")
    val qsGc = results.map { case (k, (_, _, g)) => "\"" + k + f"\":$g%.3f" }
      .mkString("{", ",", "}")
    val errJson =
      if (queryErrors.isEmpty) ""
      else queryErrors.map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }
        .mkString(""","query_errors":{""", ",", "}")
    val total = results.map(_._2._1).sum
    val totalCpu = results.map(_._2._2).sum
    // run-level GC/heap evidence (VERDICT r17 #2): gc_sec is the
    // JVM's cumulative collection time at artifact-write (covers the
    // workload phases too, which run before this line), heap_max_mb
    // the native pool peak — both zero-cost bean reads
    val gcRunSec = gcTimeSec()
    val heapMaxMb = heapPeakMb()
    // post-run probe set, paired with the pre-run set sampled before
    // the warm-up; the fsync series additionally carries one sample
    // per fs-heavy phase boundary. fsync_p50_ms (the adjudication key
    // BASELINE.md's fs-heavy rule reads) is the MAX over all samples,
    // so an aftershock that ends mid-run can no longer hide behind a
    // quiet end-of-run probe — the hole the r18 artifact fell through.
    val fsyncPost = sampleFsync("post")
    val fsyncMs = fsyncSamples.values.max
    val calib = cpuCalibSec()
    val parCalib = parCalibSec()
    val loadavgPost = loadavg()
    // quiet-host verdict, computed from the WORST sample of each
    // probe: the thresholds are the r19 task's done-criteria (cpu
    // calib quiet band 0.13-0.16, par_calib quiet floor 0.309 with
    // ≤~0.5 acceptable, fsync quiet floor ~0.5 ms with ≤~1.5
    // acceptable). A non-quiet run says so IN the artifact rather
    // than shipping a silently-poisoned queries_norm map.
    val cpuCalibWorst = math.max(calib, cpuCalibPre)
    val parCalibWorst = math.max(parCalib, parCalibPre)
    val quietHost = cpuCalibWorst <= 0.20 && parCalibWorst <= 0.55 &&
      fsyncMs <= 2.0
    // Scope the note to what each tripped probe actually poisons: a
    // CPU probe or a query-sweep-bracketing fsync sample (pre /
    // queries) taints queries_norm; a later fsync sample taints only
    // the phases it brackets (each fs-heavy phase is judged by the
    // samples on its two sides). An unscoped "everything is
    // unreliable" would throw away the clean half of a half-clean run
    // — the exact information the per-phase samples exist to keep.
    val contaminationNote =
      if (quietHost) ""
      else {
        val phases = fsyncSamples.keys.toSeq
        val hotFsync = fsyncSamples.filter(_._2 > 2.0)
        def phasesTainted: Seq[String] = hotFsync.keys.toSeq.flatMap { k =>
          val i = phases.indexOf(k)
          // a hot sample taints the phase it closed and the one it opens
          Seq(k) ++ (if (i + 1 < phases.size) Seq(phases(i + 1)) else Nil)
        }.distinct
        val cpuTaint = cpuCalibWorst > 0.20 || parCalibWorst > 0.55
        val sweepTaint = cpuTaint ||
          hotFsync.contains("pre") || hotFsync.contains("queries")
        val reasons = Seq(
          if (cpuCalibWorst > 0.20) Seq(f"cpu_calib $cpuCalibWorst%.3f > 0.20") else Nil,
          if (parCalibWorst > 0.55) Seq(f"par_calib $parCalibWorst%.3f > 0.55 (core oversubscription — CPU-inflation-without-GC class)") else Nil,
          if (hotFsync.nonEmpty) Seq("fsync p50 hot at " + hotFsync.map {
            case (k, v) => f"$k=$v%.2f ms" }.mkString(", ") +
            " (IO aftershock — the bracketed phases' fs-heavy rows are incommensurable)") else Nil).flatten
        val scope =
          (if (sweepTaint) Seq("queries_norm unreliable") else Nil) ++
            (if (phasesTainted.nonEmpty)
               Seq("tainted phase boundaries: " + phasesTainted.mkString(", "))
             else Nil)
        s""","contamination_note":${jsonStr(
          "NOT fully quiet: " + reasons.mkString("; ") + ". Scope: " +
            (if (scope.isEmpty) "none beyond the flagged probes" else scope.mkString("; ")) +
            "; all other rows' bracketing samples read quiet")}"""
      }
    val probesJson =
      f""""fsync_p50_ms_pre":${fsyncSamples("pre")}%.2f,"fsync_p50_ms_post":$fsyncPost%.2f,"fsync_samples":${
        fsyncSamples.map { case (k, v) => "\"" + k + f"\":$v%.2f" }
          .mkString("{", ",", "}")},"cpu_calib_pre_sec":$cpuCalibPre%.4f,"par_calib_pre_sec":$parCalibPre%.4f,"loadavg_pre":$loadavgPre%.2f,"loadavg_post":$loadavgPost%.2f,"quiet_host":$quietHost$contaminationNote"""
    // Host-load-normalized wall times (see CalibBaselineSec /
    // ParCalibBaselineSec): the map BenchRegressionSpec gates on and
    // the README round table reports. Normalize by whichever probe saw
    // MORE host elevation (the smaller factor): the scalar probe is
    // blind to scheduler/bandwidth contention (round 12: calib 1.01 on
    // a run whose shuffle tier ran 3x slow), and a query can't be
    // slower than the worst contention either probe measured without
    // it being the query's own fault. Real regressions still fire —
    // the probes don't move when only a query's code slows down.
    val normFactor =
      math.min(CalibBaselineSec / calib, ParCalibBaselineSec / parCalib)
    val qsNorm = results.map { case (k, (w, _, _)) =>
      "\"" + k + f"\":${w * normFactor}%.3f" }.mkString("{", ",", "}")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","timing":"median-of-3","total_cpu_sec":$totalCpu%.3f,"gc_sec":$gcRunSec%.3f,"heap_max_mb":$heapMaxMb,"fsync_p50_ms":$fsyncMs%.2f,"cpu_calib_sec":$calib%.4f,"par_calib_sec":$parCalib%.4f,"calib_norm_factor":$normFactor%.4f,$probesJson,"queries":$qs,"queries_norm":$qsNorm,"queries_cpu_sec":$qsCpu,"queries_gc_sec":$qsGc$errJson,"sf":"$sfDir",$workloadJson,$controlPlaneJson,$cp50kJson,$httpControlPlaneJson,$recordsApiJson}"""
    // The driver captures only the LAST ~2000 chars of stdout, which
    // cannot hold a 186-query map (r11's artifact carried only the
    // alphabetic tail of one map). Persist the full line to a file, and
    // print TWO parseable lines: the full JSON, then a compact summary
    // WITHOUT the per-query maps as the final line — the summary fits
    // entirely inside any tail window, so the round artifact always
    // ends with one complete, parseable JSON object.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_local.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: java.io.IOException => () } // bench output must not fail on an unwritable cwd
    println(json)
    val summary =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","timing":"median-of-3","n_queries":${results.size},"n_query_errors":${queryErrors.size},"total_cpu_sec":$totalCpu%.3f,"gc_sec":$gcRunSec%.3f,"heap_max_mb":$heapMaxMb,"fsync_p50_ms":$fsyncMs%.2f,"cpu_calib_sec":$calib%.4f,"par_calib_sec":$parCalib%.4f,"calib_norm_factor":$normFactor%.4f,$probesJson,"queries_in":"BENCH_local.json","sf":"$sfDir",$workloadJson,$controlPlaneJson,$cp50kJson,$httpControlPlaneJson,$recordsApiJson}"""
    println(summary)
    spark.stop()
  }

  /** v1 records-API serving phase (round 17): the HTTP surface a
    * day-one client talks — concurrent unary append RPCs (JSON parse +
    * engine append + ack per request), one SSE catch-up session
    * through the ReadSession machine, and an integrity check that the
    * /v1/metrics meter counted exactly the RPCs served under load.
    * Factored out so the phase is testable without the 200-query
    * sweep (tools.RecordsApiProbe). */
  private[graft] def recordsApiPhaseJson(spark: SparkSession,
      parent: java.nio.file.Path = null): String = try {
      val rootR = (if (parent == null)
          java.nio.file.Files.createTempDirectory("graft-benchrecords")
        else java.nio.file.Files.createTempDirectory(parent, "graft-benchrecords"))
        .toString
      val storeR = new StreamStore(spark, rootR)
      storeR.catalog.createBasin("bench-basin",
        BasinConfig(defaultStreamConfig =
          StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
      val (serverR, epR) = graft.log.HttpRecordsServer.start(storeR)
      try {
        import graft.log.HttpRecordsClient
        val hdrR = Seq("s2-basin" -> "bench-basin")
        val nThreads = 8
        val perThread = 50
        val recsPerRpc = 10
        (0 until nThreads).foreach(i =>
          storeR.catalog.createStream("bench-basin", s"ra-$i"))
        val oneRec = s"""{"body":"${"x" * 256}"}"""
        val rpcBody = (s"""{"records":[""" +
          Seq.fill(recsPerRpc)(oneRec).mkString(",") + "]}").getBytes("UTF-8")
        val failures = new java.util.concurrent.atomic.AtomicInteger
        val tA0 = System.nanoTime()
        val threadsR = (0 until nThreads).map { i =>
          new Thread(() => (0 until perThread).foreach { _ =>
            val (c, _) = HttpRecordsClient.request("POST",
              s"$epR/v1/streams/ra-$i/records", hdrR, rpcBody)
            if (c != 200) failures.incrementAndGet()
          })
        }
        threadsR.foreach(_.start()); threadsR.foreach(_.join())
        val apSec = (System.nanoTime() - tA0) / 1e9
        val rpcs = nThreads * perThread
        require(failures.get() == 0, s"${failures.get()} append RPCs failed")
        require((0 until nThreads).forall(i => storeR
          .checkTail("bench-basin", s"ra-$i").seqNum == perThread * recsPerRpc),
          "records-api workload lost records")
        // SSE catch-up: one session draining a stream under a count
        // budget, terminal [DONE]. One unbilled warm pass first — the
        // phase may run on a cold session (RecordsApiProbe), where the
        // first read plan's codegen would be billed to the session.
        val sseWant = perThread * recsPerRpc
        HttpRecordsClient.readSse(
          s"$epR/v1/streams/ra-1/records?seq_num=0&count=$sseWant", hdrR)
        // serve the timed session from compacted storage — the
        // steady-state layout (50 per-RPC objects is the just-written
        // transient; T1 compaction folds them into scan-sized files)
        storeR.compact("bench-basin", "ra-0")
        val tS0 = System.nanoTime()
        val evs = HttpRecordsClient.readSse(
          s"$epR/v1/streams/ra-0/records?seq_num=0&count=$sseWant", hdrR)
        val sseSec = (System.nanoTime() - tS0) / 1e9
        // count records by their body field — the batch frame's tail
        // object also carries a seq_num, so seq_num occurrences
        // overcount by one per event
        val sseRecords = evs.collect { case e if e.event.contains("batch") =>
          """"body":"""".r.findAllIn(e.data).size }.sum
        require(evs.lastOption.exists(_.data == "[DONE]") &&
          sseRecords == sseWant, s"sse session delivered $sseRecords/$sseWant")
        // metrics integrity: the meter must have counted exactly the
        // append RPCs this phase issued
        val (mc, mb) = HttpRecordsClient.request("GET",
          s"$epR/v1/metrics?set=account-ops&start=0&end=${Long.MaxValue / 2000}")
        val metered = """\[\d+,([0-9.]+)\]""".r.findAllMatchIn(mb)
          .map(_.group(1).toDouble).sum
        require(mc == 200 && metered == rpcs.toDouble,
          s"metrics meter counted $metered of $rpcs append RPCs")
        // s2s/proto framed session throughput (round 18): one
        // pipelined binary append session (all batches in flight, acks
        // drained after) and one framed read session from compacted
        // storage — the wire a real SDK speaks, measured AFTER the
        // metering integrity check since framed appends meter too
        import graft.log.{ProtoCodec, S2sCodec}
        import graft.model.{AppendInput => MInput, EnvelopeRecord => MEnv}
        storeR.catalog.createStream("bench-basin", "ra-pb")
        val pbBatches = 100
        val pbFrame = ProtoCodec.encodeAppendInput(MInput(
          Seq.fill(recsPerRpc)(MEnv(Nil, ("x" * 256).getBytes("UTF-8"))),
          clientTimestamps = Seq.fill(recsPerRpc)(None)))
        val tP0 = System.nanoTime()
        val pbAcks = HttpRecordsClient.s2sAppendSessionRaw(
          s"$epR/v1/streams/ra-pb/records", hdrR,
          Seq.fill(pbBatches)(pbFrame), gzip = false,
          S2sCodec.ProtoContentType)
        val pbApSec = (System.nanoTime() - tP0) / 1e9
        require(pbAcks.size == pbBatches && pbAcks.forall(!_.terminal),
          s"framed-proto session acked ${pbAcks.size}/$pbBatches")
        storeR.compact("bench-basin", "ra-pb")
        val pbWant = pbBatches * recsPerRpc
        HttpRecordsClient.s2sReadSession( // unbilled codegen warm pass
          s"$epR/v1/streams/ra-pb/records?seq_num=0&count=$pbWant", hdrR,
          gzip = false, contentType = S2sCodec.ProtoContentType)
        val tR0 = System.nanoTime()
        val pbFrames = HttpRecordsClient.s2sReadSession(
          s"$epR/v1/streams/ra-pb/records?seq_num=0&count=$pbWant", hdrR,
          gzip = false, contentType = S2sCodec.ProtoContentType)
        val pbRdSec = (System.nanoTime() - tR0) / 1e9
        val pbRead = pbFrames.filterNot(_.terminal)
          .map(f => ProtoCodec.decodeReadBatch(f.payload)._1.size).sum
        require(pbRead == pbWant, s"framed-proto read $pbRead/$pbWant")
        f""""records_api_append_rps":${rpcs / apSec}%.1f,"records_api_append_mibps":${rpcs.toLong * recsPerRpc * (256 + 8) / apSec / 1048576}%.3f,"records_api_sse_records_per_sec":${sseRecords / sseSec}%.0f,"records_api_s2s_proto_batches_per_sec":${pbBatches / pbApSec}%.1f,"records_api_s2s_proto_read_records_per_sec":${pbRead / pbRdSec}%.0f,"records_api_metered_ok":true"""
      } finally serverR.stop(0)
    } catch { case e: Throwable =>
      val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}"
      System.err.println(s"bench records-api phase failed: $msg")
      s""""records_api_append_rps":0,"records_api_error":${jsonStr(msg)}"""
    }

}
