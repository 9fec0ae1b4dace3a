package graft.log

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Network-fault injection for the HTTP object adapter — the repo's
  * analog of the reference's turmoil network (sim/src/net.rs: dropped
  * SYNs, lost responses, delays between the engine and its S3): a
  * localhost proxy in front of [[HttpObjectServer]] that forwards
  * verbatim but, per seeded decision, can
  *
  *  - **drop the request** (never forwarded; the client sees a closed
  *    connection — turmoil's lost SYN),
  *  - **drop the response** (forwarded and APPLIED server-side, reply
  *    swallowed — the S3 lost-response case every conditional-put
  *    client must survive),
  *  - **duplicate** the request (forwarded twice, client answered
  *    from the SECOND forward — the network-level replay: a
  *    conditional PUT's duplicate answers 412 even though the
  *    client's own write won),
  *  - **delay** the exchange by a few tens of ms.
  *
  * Determinism guarantee: each request IDENTITY (method + path +
  * conditional headers + put nonce) is faulted AT MOST ONCE — a
  * retried request is always forwarded clean — so any client with ≥2
  * bounded attempts provably makes progress, and suites running under
  * the proxy stay green by construction, not by seed luck. A `script`
  * hook overrides the seeded decision for directed scenarios and can
  * run a mid-outage action (e.g. a foreign write) while a response is
  * being swallowed.
  */
object NetFaultProxy {

  sealed trait Fault
  object Fault {
    case object None extends Fault
    case object DropRequest extends Fault
    case object DropResponse extends Fault
    /** Forward twice; answer the client from the second forward. */
    case object DuplicateAnswerSecond extends Fault
    case object Delay extends Fault
  }

  final class Controls(seed: Long) {
    @volatile var faultP: Double = 0.0 // probability a FIRST sighting is faulted
    @volatile var delayMs: Long = 20
    /** Directed override: (method, pathWithQuery, nonce) => fault.
      * Consulted before the seeded decision; return null to fall
      * through. */
    @volatile var script: (String, String, String) => Fault = null
    /** Runs while a DropResponse is in flight (after the forward
      * applied, before the client learns anything) — the foreign-
      * write-during-outage window. */
    @volatile var duringOutage: () => Unit = () => ()
    private[NetFaultProxy] val rnd = new java.util.Random(seed)
    private[NetFaultProxy] val seen = ConcurrentHashMap.newKeySet[String]()
    val injected = new java.util.concurrent.atomic.AtomicInteger(0)
    def reset(): Unit = { seen.clear(); script = null; duringOutage = () => (); faultP = 0.0 }
  }

  def start(target: String, seed: Long = 17L): (HttpServer, String, Controls) = {
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val controls = new Controls(seed)

    def forward(method: String, pathQ: String, headers: Seq[(String, String)],
                body: Array[Byte]): (Int, Array[Byte], Seq[(String, String)]) = {
      val c = new java.net.URL(target + pathQ).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      c.setRequestMethod(method)
      c.setConnectTimeout(5000)
      c.setReadTimeout(60000)
      headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
      if (body.nonEmpty || method == "PUT" || method == "POST") {
        c.setDoOutput(true)
        c.setFixedLengthStreamingMode(body.length)
        val os = c.getOutputStream
        try os.write(body) finally os.close()
      }
      val code = c.getResponseCode
      val is = if (code >= 400) c.getErrorStream else c.getInputStream
      val out = if (is == null) Array.emptyByteArray
                else try is.readAllBytes() finally is.close()
      val echo = Seq("ETag", "X-Put-Nonce", "X-Nonce-Applied",
        "S2-provision-result", "Content-Type").flatMap(h =>
        Option(c.getHeaderField(h)).map(h -> _))
      (code, out, echo)
    }

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => try {
      val method = ex.getRequestMethod
      val pathQ = ex.getRequestURI.getRawPath +
        Option(ex.getRequestURI.getRawQuery).map("?" + _).getOrElse("")
      // storage-backend protocol headers + the v1 records/catalog API's
      // (r17 task #4: the serving layer goes under the same proxy)
      val fwdHeaders = Seq("If-Match", "If-None-Match", "X-Put-Nonce",
        "X-Probe-Nonce", "Content-Type", "S2-basin", "S2-format",
        "S2-request-token", "S2-encryption-key", "Authorization",
        "Accept", "Last-Event-ID").flatMap(h =>
        Option(ex.getRequestHeaders.getFirst(h)).map(h -> _))
      val nonce = fwdHeaders.collectFirst { case ("X-Put-Nonce", v) => v }.getOrElse("")
      val body = ex.getRequestBody.readAllBytes()
      val identity = s"$method $pathQ ${fwdHeaders.mkString(",")} ${body.length}:${
        java.util.Arrays.hashCode(body)}"

      val fault: Fault = {
        val scripted = Option(controls.script).map(_(method, pathQ, nonce))
          .filter(_ != null)
        scripted.getOrElse {
          // at-most-once per identity: a retry is always clean
          if (controls.faultP > 0 && controls.seen.add(identity) &&
              controls.rnd.synchronized(controls.rnd.nextDouble()) < controls.faultP) {
            controls.rnd.synchronized(controls.rnd.nextInt(4)) match {
              case 0 => Fault.DropRequest
              case 1 => Fault.DropResponse
              case 2 => Fault.DuplicateAnswerSecond
              case _ => Fault.Delay
            }
          } else Fault.None
        }
      }

      fault match {
        case Fault.DropRequest =>
          controls.injected.incrementAndGet()
          controls.duringOutage() // the never-sent request's outage window
          ex.close() // never forwarded; client sees EOF
        case Fault.DropResponse =>
          controls.injected.incrementAndGet()
          forward(method, pathQ, fwdHeaders, body) // APPLIES server-side
          controls.duringOutage()
          ex.close() // reply swallowed
        case Fault.DuplicateAnswerSecond =>
          controls.injected.incrementAndGet()
          forward(method, pathQ, fwdHeaders, body)
          val (code, out, echo) = forward(method, pathQ, fwdHeaders, body)
          echo.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
          ex.sendResponseHeaders(code, if (out.isEmpty) -1 else out.length.toLong)
          if (out.nonEmpty) ex.getResponseBody.write(out)
          ex.close()
        case Fault.Delay | Fault.None =>
          if (fault == Fault.Delay) {
            controls.injected.incrementAndGet()
            Thread.sleep(controls.delayMs)
          }
          val (code, out, echo) = forward(method, pathQ, fwdHeaders, body)
          echo.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
          ex.sendResponseHeaders(code, if (out.isEmpty) -1 else out.length.toLong)
          if (out.nonEmpty) ex.getResponseBody.write(out)
          ex.close()
      }
    } catch { case _: Throwable => try ex.close() catch { case _: Throwable => () } })

    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32,
      r => { val t = new Thread(r, "net-fault-proxy"); t.setDaemon(true); t }))
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}", controls)
  }
}
