package graft.tools

/** Single-thread AEGIS-256 core throughput probe (1 KiB records) —
  * the unit the A13 read path decrypts per record.
  */
object AegisBench {
  def main(args: Array[String]): Unit = {
    val key = Array.fill(32)(0x11.toByte)
    val nonce = Array.fill(32)(0x22.toByte)
    val ad = "basin stream".getBytes
    val plain = Array.tabulate(1024)(i => (i * 7).toByte)
    val (ct, tag) = graft.log.Aegis256.encryptDetached(key, nonce, ad, plain)
    var i = 0
    while (i < 20000) { graft.log.Aegis256.decryptDetached(key, nonce, ad, ct, tag); i += 1 }
    val n = 200000
    var t0 = System.nanoTime()
    i = 0; while (i < n) { graft.log.Aegis256.encryptDetached(key, nonce, ad, plain); i += 1 }
    val encSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    i = 0; while (i < n) { graft.log.Aegis256.decryptDetached(key, nonce, ad, ct, tag); i += 1 }
    val decSec = (System.nanoTime() - t0) / 1e9
    val mib = n * 1024.0 / 1048576.0
    println(f"enc ${mib / encSec}%.1f MiB/s  dec ${mib / decSec}%.1f MiB/s (1 KiB records, single thread)")
  }
}
