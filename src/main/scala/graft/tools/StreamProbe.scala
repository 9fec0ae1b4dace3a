package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Micro-batch cost breakdown for the streaming demo family (guide §1:
  * measure first). Runs the named queries (default: the e2e_stream_*
  * set) with a StreamingQueryListener attached and prints, per demo,
  * the median-of-3 wall plus every micro-batch's durationMs map
  * (addBatch / getBatch / latestOffset / walCommit / commitOffsets /
  * queryPlanning / triggerExecution) — the numbers that say whether
  * the family's floor is state-store lifecycles, WAL writes, planning,
  * or the batch jobs themselves.
  *
  *   runMain graft.tools.StreamProbe <sfDir> [query ...]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.filter(_.startsWith("e2e_stream_"))
        .toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val batches = new java.util.concurrent.atomic.AtomicInteger
    val durAcc = scala.collection.concurrent.TrieMap.empty[String, Long]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        batches.incrementAndGet()
        e.progress.durationMs.forEach((k, v) =>
          durAcc.updateWith(k) {
            case Some(a) => Some(a + v.longValue())
            case None => Some(v.longValue())
          })
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case None => println(s"[sp] $n: UNKNOWN QUERY")
        case Some(fn) =>
          fn(spark, sfDir).count() // warm
          batches.set(0); durAcc.clear()
          val walls = (0 until 3).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          Thread.sleep(100) // listener bus drain
          val med = walls.sorted.apply(1)
          val durs = durAcc.toSeq.sortBy(-_._2)
            .map { case (k, v) => s"$k=${v / 3}" }.mkString(" ")
          println(f"[sp] $n%-30s med=$med%5.2f s  batches=${batches.get / 3}%2d  " +
            s"avg-per-pass durationMs: $durs")
      }
    }
    spark.stop()
  }
}
