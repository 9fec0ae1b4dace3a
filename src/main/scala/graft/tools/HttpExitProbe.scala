package graft.tools

import java.nio.file.Files

/** Exit-hygiene probe: start the HTTP object server, run a client
  * round-trip, stop the server, and return from main — the process
  * must EXIT without System.exit (no non-daemon threads pinned by the
  * server pool or the JDK HttpClient). Run under `timeout` in CI-ish
  * checks; a hang here is the bug that would wedge Verify at exit.
  */
object HttpExitProbe {
  def main(args: Array[String]): Unit = {
    val (server, endpoint) = graft.log.HttpObjectServer.start()
    val root = Files.createTempDirectory("http-exit").toString
    val b = graft.log.HttpObjectBackend.install(root, endpoint)
    b.putMeta(s"$root/x.json", """{"k":1}""")
    assert(b.getMeta(s"$root/x.json", fresh = true).isDefined)
    server.stop(0)
    println("HttpExitProbe: done (JVM should now exit)")
  }
}
