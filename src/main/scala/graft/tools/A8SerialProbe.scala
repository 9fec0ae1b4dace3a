package graft.tools

import org.apache.spark.sql.SparkSession

import graft.log._
import graft.model._

/** Phase breakdown of serial unary appends over the HTTP object
  * endpoint — used to attribute the r17 a8-serial cost (the per-commit
  * re-sweep on object adapters). Prints per-phase totals for N serial
  * appends on a fresh endpoint-backed stream.
  */
object A8SerialProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (server, endpoint) = HttpObjectServer.start()
    val root = java.nio.file.Files.createTempDirectory("graft-a8probe").toString
    HttpObjectBackend.install(root, endpoint)
    val st = new StreamStore(spark, root)
    st.catalog.createBasin("bench-basin",
      BasinConfig(defaultStreamConfig =
        StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
    st.catalog.createStream("bench-basin", "a8")
    val batch = AppendInput(Seq.fill(10)(
      EnvelopeRecord(Nil, Array.fill(256)(7: Byte))))
    // warm
    (0 until 20).foreach(_ => st.append("bench-basin", "a8", batch))
    val t0 = System.nanoTime()
    (0 until n).foreach(_ => st.append("bench-basin", "a8", batch))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[a8probe] $n serial appends in $sec%.2f s -> ${n / sec}%.1f batches/s " +
      f"(${sec / n * 1000}%.2f ms/batch)")
    // component costs
    val backend = st.backend
    val gen = st.manifest("bench-basin", "a8").generation
    val genDir = java.nio.file.Paths.get(
      Layout.genDir(Catalog.canonicalRoot(root), "bench-basin", "a8", gen))
    val tL0 = System.nanoTime()
    var listed: Seq[java.nio.file.Path] = Nil
    (0 until 100).foreach(_ => listed = backend.listData(genDir))
    println(f"[a8probe] listData x100 (${listed.size} files): " +
      f"${(System.nanoTime() - tL0) / 1e6 / 100}%.2f ms/call")
    val tS0 = System.nanoTime()
    listed.foreach(p => FileIndex.tryStats(p.toString))
    println(f"[a8probe] tryStats over ${listed.size} files (cached): " +
      f"${(System.nanoTime() - tS0) / 1e6}%.2f ms total")
    server.stop(0)
    spark.stop()
  }
}
