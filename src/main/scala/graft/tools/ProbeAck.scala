package graft.tools
import graft.log.DirectParquet
object ProbeAck {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("probe-ack").toString
    val recs = (0 until 10).map(i =>
      DirectParquet.Rec(i, 1000L, Nil, Array.fill(100)(42: Byte), 108L))
    // warm
    (0 until 5).foreach(_ => DirectParquet.writeBatch(dir, recs))
    val times = (0 until 50).map { _ =>
      val t0 = System.nanoTime()
      DirectParquet.writeBatch(dir, recs)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[probe] writeBatch p50=${times(25)}%.1f ms min=${times.head}%.1f max=${times.last}%.1f")
  }
}
