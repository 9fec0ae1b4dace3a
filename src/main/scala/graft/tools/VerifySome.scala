package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev harness: Verify for a subset of queries — dumps only the named
  * queries' parquet plus the full oracle_sql.json, so
  * scripts/check.py can gate just the operators under iteration.
  * Usage: runMain graft.tools.VerifySome <sfDir> <outDir> <name>...
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // CPU seconds alongside wall: wall >> cpu/32 under sandbox load is
    // contention, not a plan regression (same rationale as Bench's
    // queries_cpu_sec column)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    names.foreach { name =>
      val t0 = System.nanoTime()
      val c0 = osBean.getProcessCpuTime
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[vs] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s wall, " +
        f"${(osBean.getProcessCpuTime - c0) / 1e9}%.2f cpu-s")
    }
    graft.Verify.writeOracles(outDir)
    spark.stop()
  }
}
