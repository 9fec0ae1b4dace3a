package graft.tools
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
object RawHttpProbe {
  def main(args: Array[String]): Unit = {
    val (server, endpoint) = graft.log.HttpObjectServer.start()
    try {
      val port = endpoint.split(':').last.toInt
      val b = new graft.log.HttpObjectBackend(endpoint)
      b.putMeta("/tmp/raw-probe/x.json", "{\"k\":1}")
      val sock = new Socket("127.0.0.1", port)
      sock.setTcpNoDelay(true)
      val out = sock.getOutputStream
      val in = sock.getInputStream
      val req = ("GET /meta/tmp/raw-probe/x.json HTTP/1.1\r\n" +
        "Host: 127.0.0.1\r\n\r\n").getBytes(UTF_8)
      val buf = new Array[Byte](4096)
      def once(): Unit = {
        out.write(req); out.flush()
        var seen = 0
        while (seen == 0) { seen = in.read(buf) }
      }
      once()
      val t0 = System.nanoTime()
      (0 until 1000).foreach(_ => once())
      println(f"[raw] keep-alive GET: ${(System.nanoTime() - t0) / 1e6 / 1000}%.3f ms/rt")

      // HttpURLConnection comparison (global keep-alive cache)
      val url = new java.net.URL(s"$endpoint/meta/tmp/raw-probe/x.json")
      def ucOnce(): Unit = {
        val c = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod("GET")
        val is = c.getInputStream
        while (is.read(buf) > 0) {}
        is.close()
      }
      ucOnce()
      val t1 = System.nanoTime()
      (0 until 1000).foreach(_ => ucOnce())
      println(f"[raw] HttpURLConnection GET: ${(System.nanoTime() - t1) / 1e6 / 1000}%.3f ms/rt")
      // java.net.http.HttpClient comparison
      val t2 = System.nanoTime()
      (0 until 500).foreach(_ => b.getMeta("/tmp/raw-probe/x.json", fresh = true))
      println(f"[raw] java.net.http client GET: ${(System.nanoTime() - t2) / 1e6 / 500}%.3f ms/rt")
      sock.close()
    } finally server.stop(0)
  }
}
