package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs Bench's v1 records-API serving phase standalone — the phase
  * is self-contained (temp store + ephemeral server), so this probe
  * validates it in seconds instead of behind the full query sweep. */
object RecordsApiProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("{" + graft.Bench.recordsApiPhaseJson(spark) + "}")
    spark.stop()
  }
}
