package graft.tools

import graft.log._

/** Per-record encrypt-path probe: RecordCipher.encryptEnvelope incl.
  * SecureRandom nonce generation, single-thread and 32-thread, to
  * attribute bulk-ingest encrypted-append throughput.
  */
object EncPathProbe {
  def main(args: Array[String]): Unit = {
    val key = Array.fill(32)(0x24.toByte)
    val spec = CipherSpec(CipherAlgo.Aegis256, key)
    val aad = RecordCipher.aad("b", "s")
    val body = Array.fill(1016)('x'.toByte)
    val n = 64000
    // warm
    (0 until 5000).foreach(_ => RecordCipher.encryptEnvelope(spec, aad, Nil, body))
    var t0 = System.nanoTime()
    (0 until n).foreach(_ => RecordCipher.encryptEnvelope(spec, aad, Nil, body))
    val oneT = n * 1024 / 1048576.0 / ((System.nanoTime() - t0) / 1e9)
    println(f"[enc] 1-thread envelope encrypt: $oneT%.1f MiB/s")
    t0 = System.nanoTime()
    val threads = (0 until 32).map { _ =>
      val t = new Thread(() =>
        (0 until n / 32).foreach(_ => RecordCipher.encryptEnvelope(spec, aad, Nil, body)))
      t.start(); t
    }
    threads.foreach(_.join())
    val eightT = n * 1024 / 1048576.0 / ((System.nanoTime() - t0) / 1e9)
    println(f"[enc] 32-thread envelope encrypt: $eightT%.1f MiB/s aggregate")
  }
}
