package graft.log

import java.net.{InetSocketAddress, URI, URLDecoder, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** A REAL-endpoint object store: a minimal localhost HTTP object
  * server plus a [[StorageBackend]] client that speaks to it — the
  * deployment-shaped sibling of the in-memory [[ObjectStoreBackend]]
  * simulation, mirroring the reference's HTTP object-store harness
  * (sim exposes its S3 over a socket so foreign processes hit real
  * request boundaries; here the JDK HttpServer plays that role with
  * zero added dependencies).
  *
  * The API is the S3 subset the commit protocol relies on:
  *
  *  - `PUT /meta/{key}` with `If-Match: etag` / `If-None-Match: *` /
  *    no precondition — conditional or unconditional metadata put;
  *    200 + `ETag` header, or 412 on precondition failure. The CAS
  *    decision is made ATOMICALLY inside the server's per-key
  *    compute, so N client PROCESSES get real read-modify-write
  *    safety — the property the single-JVM simulation could only
  *    assert in-process.
  *  - `GET /meta/{key}` → 200 body + ETag | 404;
  *    `DELETE /meta/{key}` → 204 (idempotent).
  *  - `PUT /data/{key}` raw bytes → the server materializes the
  *    object at its key path via temp + atomic rename and only then
  *    indexes it, so a lister NEVER observes a partial object (the
  *    atomic-whole-object-PUT contract; readers — Spark scans,
  *    parquet footers — then read the materialized local path exactly
  *    as they would read `s3a://` in production).
  *  - `GET /list?prefix=..&mode=data|subdirs|exists` — strongly
  *    consistent listing over the server's live index.
  *  - `GET /time?path=..` / `POST /touch?path=..&ms=..` — grace
  *    clocks (the one extension beyond S3's surface: the reference
  *    tracks last-modified server-side the same way, sim/src/s3.rs:69-71).
  *
  * Keys are canonical absolute paths (the backend registry's root
  * canonicalization), so one server instance serves any number of
  * roots ("buckets") at once.
  */
object HttpObjectServer {

  private final case class Obj(json: String, etag: String, putAtMs: Long)

  /** Start a server on an ephemeral localhost port; returns it and the
    * endpoint URI string. */
  def start(): (HttpServer, String) = {
    // TCP_NODELAY on the server's sockets: without it, small
    // keep-alive request/response pairs hit the classic Nagle +
    // delayed-ACK interaction — ~40 ms stalls per round trip
    // (measured: check_tail p99 46 ms, and a 2k-stream ingest's
    // serial planning reads stretched to minutes). The property is
    // read once by the JDK server implementation at socket accept.
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val meta = new ConcurrentHashMap[String, Obj]()
    val data = new ConcurrentHashMap[String, java.lang.Long]()
    val prefixClock = new ConcurrentHashMap[String, java.lang.Long]()

    def etagOf(json: String): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(json.getBytes(UTF_8)).take(16).map(b => f"${b & 0xff}%02x").mkString
    }
    def keyOf(ex: HttpExchange, root: String): String =
      URLDecoder.decode(ex.getRequestURI.getRawPath.stripPrefix(root), "UTF-8")
    def query(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
        .filter(_.contains('=')).map { kv =>
          val i = kv.indexOf('=')
          kv.take(i) -> URLDecoder.decode(kv.drop(i + 1), "UTF-8")
        }.toMap
    def respond(ex: HttpExchange, code: Int, body: Array[Byte] = Array.emptyByteArray,
                headers: Map[String, String] = Map.empty): Unit = {
      headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    // The JDK HttpServer swallows handler exceptions and leaves the
    // exchange unanswered — a missing query param would hang the
    // calling commit thread until its read timeout. Answer 500 loudly
    // instead (best-effort: headers may already be out).
    def safely(f: HttpExchange => Unit): com.sun.net.httpserver.HttpHandler =
      (ex: HttpExchange) => try f(ex) catch {
        case t: Throwable =>
          try respond(ex, 500,
            s"${t.getClass.getSimpleName}: ${t.getMessage}".getBytes(UTF_8))
          catch { case _: Throwable => ex.close() }
      }

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    server.createContext("/meta/", safely { ex =>
      val key = keyOf(ex, "/meta")
      ex.getRequestMethod match {
        case "GET" =>
          meta.get(key) match {
            case null => respond(ex, 404)
            case o =>
              // conditional GET: a revalidation hit skips the body
              // (and the client's re-parse) without weakening
              // consistency — the decision is the server's
              val inm = Option(ex.getRequestHeaders.getFirst("If-None-Match"))
              if (inm.contains(o.etag))
                respond(ex, 304, Array.emptyByteArray, Map("ETag" -> o.etag))
              else
                respond(ex, 200, o.json.getBytes(UTF_8), Map("ETag" -> o.etag))
          }
        case "DELETE" =>
          meta.remove(key); respond(ex, 204)
        case "PUT" =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val ifMatch = Option(ex.getRequestHeaders.getFirst("If-Match"))
          val ifNoneMatch = Option(ex.getRequestHeaders.getFirst("If-None-Match"))
          val next = Obj(body, etagOf(body), System.currentTimeMillis())
          // the CAS decision and the write are one atomic per-key step
          var ok = true
          meta.compute(key, (_, cur) => (ifMatch, ifNoneMatch) match {
            case (Some(tag), _) => // If-Match
              if (cur != null && cur.etag == tag) next else { ok = false; cur }
            case (None, Some("*")) => // If-None-Match: * (create)
              if (cur == null) next else { ok = false; cur }
            case _ => next // unconditional
          })
          if (ok) respond(ex, 200, Array.emptyByteArray, Map("ETag" -> next.etag))
          else respond(ex, 412)
        case _ => respond(ex, 405)
      }
    })

    server.createContext("/data/", safely { ex =>
      val key = keyOf(ex, "/data")
      ex.getRequestMethod match {
        case "PUT" =>
          val p = Paths.get(key)
          Files.createDirectories(p.getParent)
          val tmp = Files.createTempFile(p.getParent, ".put", ".tmp")
          val in = ex.getRequestBody
          Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
          Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          data.put(key, System.currentTimeMillis())
          respond(ex, 200)
        case "DELETE" =>
          data.remove(key)
          Files.deleteIfExists(Paths.get(key))
          respond(ex, 204)
        case _ => respond(ex, 405)
      }
    })

    server.createContext("/list", safely { ex =>
      val q = query(ex)
      val prefix = q("prefix").stripSuffix("/") + "/"
      val out = q.getOrElse("mode", "data") match {
        case "data" =>
          data.keySet.asScala.toSeq
            .filter(k => k.startsWith(prefix) && k.endsWith(".parquet") &&
              !k.substring(prefix.length).contains('/')).sorted
        case "subdirs" =>
          data.keySet.asScala.toSeq.filter(_.startsWith(prefix))
            .map(_.substring(prefix.length)).filter(_.contains('/'))
            .map(rest => rest.substring(0, rest.indexOf('/'))).distinct.sorted
        case "exists" =>
          if (data.keySet.asScala.exists(_.startsWith(prefix))) Seq("1") else Nil
      }
      respond(ex, 200, out.mkString("\n").getBytes(UTF_8))
    })

    server.createContext("/prefix", safely { ex => // DELETE /prefix?prefix=..
      val q = query(ex)
      val dir = q("prefix").stripSuffix("/")
      val prefix = dir + "/"
      data.keySet.asScala.filter(_.startsWith(prefix)).foreach { k =>
        data.remove(k)
        Files.deleteIfExists(Paths.get(k))
      }
      prefixClock.keySet.asScala.filter(p => p == dir || p.startsWith(prefix))
        .foreach(prefixClock.remove)
      val d = Paths.get(dir)
      if (Files.exists(d))
        try Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        catch { case _: java.io.IOException => () }
      respond(ex, 204)
    })

    server.createContext("/time", safely { ex =>
      val k = query(ex)("path").stripSuffix("/")
      val t = Option(prefixClock.get(k)).map(_.longValue())
        .orElse(Option(data.get(k)).map(_.longValue()))
        .orElse {
          val prefix = k + "/"
          val ts = data.asScala.collect {
            case (key, t0) if key.startsWith(prefix) => t0.longValue()
          }
          if (ts.isEmpty) None else Some(ts.max)
        }
      t match {
        case Some(ms) => respond(ex, 200, ms.toString.getBytes(UTF_8))
        case None => respond(ex, 404)
      }
    })

    server.createContext("/touch", safely { ex =>
      val q = query(ex)
      prefixClock.put(q("path").stripSuffix("/"), java.lang.Long.valueOf(q("ms").toLong))
      respond(ex, 204)
    })

    // a small pool: the commit protocol issues short blocking calls
    // from many driver threads (the 10k-stream ingest commits on a
    // 32-thread pool). DAEMON threads: HttpServer.stop() does not
    // shut the executor down, and a non-daemon pool would pin the
    // JVM open after the last demo/test finishes (observed: Verify
    // hanging at exit after e2e_http_object).
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32,
      r => { val t = new Thread(r, "http-object-server"); t.setDaemon(true); t }))
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}")
  }
}

/** [[StorageBackend]] client over [[HttpObjectServer]]'s API: every
  * protocol decision — conditional put, listing, grace clocks — is a
  * real HTTP round trip to the authoritative server, so N processes
  * sharing one endpoint get exactly the semantics N drivers get from
  * one bucket. Data objects are read back via their materialized key
  * paths (see the server doc).
  *
  * Transport is HttpURLConnection over the JDK's global keep-alive
  * connection cache — measured 0.85 ms/round-trip on localhost where
  * java.net.http's async machinery cost 2.6-7 ms per SYNCHRONOUS
  * small call (the commit path is thousands of serial metadata reads
  * during ingest planning, so per-call latency is the whole game).
  */
final class HttpObjectBackend(endpoint: String) extends StorageBackend {
  val name = "http-object"
  val supportsLegacyLayout = false
  val hasWriterMutex = false

  // the default keep-alive pool caps at 5 connections per host; the
  // ingest commit pool runs up to 48 concurrent protocol calls
  HttpObjectBackend.raiseConnectionCap()

  private def enc(k: String): String =
    URLEncoder.encode(k, "UTF-8").replace("+", "%20").replace("%2F", "/")

  private def norm(p: Path): String = ObjectKeys.norm(p)

  /** One HTTP exchange. Returns (status, body, etag). Streams are
    * fully drained and closed so the connection returns to the JDK
    * keep-alive cache. */
  private def exchange(method: String, url: String,
                       headers: Seq[(String, String)] = Nil,
                       body: Array[Byte] = null,
                       bodyFile: Path = null): (Int, Array[Byte], String) = {
    val c = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setRequestMethod(method)
    // bounded waits: a stalled endpoint must surface as an IO error,
    // not hang the 48-thread commit pool indefinitely (reads are
    // generous for large data PUT echoes; localhost p50 is sub-ms)
    c.setConnectTimeout(5000)
    c.setReadTimeout(60000)
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    if (body != null) {
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(body.length)
      val os = c.getOutputStream
      try os.write(body) finally os.close()
    } else if (bodyFile != null) {
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(Files.size(bodyFile))
      val os = c.getOutputStream
      try Files.copy(bodyFile, os) finally os.close()
    }
    val code = c.getResponseCode
    val is = if (code >= 400) c.getErrorStream else c.getInputStream
    val out =
      if (is == null) Array.emptyByteArray
      else try is.readAllBytes() finally is.close()
    (code, out, Option(c.getHeaderField("ETag")).getOrElse(""))
  }

  private def metaUrl(key: String): String = s"$endpoint/meta${enc(key)}"

  /** Client-side revalidation cache for meta reads: (json, etag) per
    * key, served only on a server-confirmed 304 — every read still
    * makes the round trip, so consistency is exactly the server's
    * (check_tail at 10k streams re-reads one manifest forever; the
    * cache spares the body transfer and the caller's re-parse).
    * Bounded like Catalog.objCache: cleared wholesale past 64k keys —
    * a refill costs one 200 per key, never a wrong answer. */
  private val metaCache = new ConcurrentHashMap[String, (String, String)]()

  def getMeta(key: String, fresh: Boolean): Option[(String, String)] = {
    val k = norm(Paths.get(key))
    val cached = metaCache.get(k)
    val hdr = cached match {
      case null => Nil
      case (_, tag) => Seq("If-None-Match" -> tag)
    }
    val (code, body, etag) = exchange("GET", metaUrl(k), hdr)
    // ONLY 404 means absent — mapping an unexpected 5xx to None would
    // serve a live stream as fresh/tail-0 to read paths
    if (code == 200) {
      val v = (new String(body, UTF_8), etag)
      if (metaCache.size > 65536) metaCache.clear()
      metaCache.put(k, v)
      Some(v)
    } else if (code == 304) Some(cached)
    else if (code == 404) { metaCache.remove(k); None }
    else throw new java.io.IOException(
      s"getMeta $key -> HTTP $code: ${new String(body, UTF_8).take(160)}")
  }

  def casMeta(key: String, json: String, ifMatch: Option[String]): Either[String, String] = {
    val hdr = ifMatch match {
      case Some(tag) => Seq("If-Match" -> tag)
      case None => Seq("If-None-Match" -> "*")
    }
    val k = norm(Paths.get(key))
    val (code, body, etag) = exchange("PUT", metaUrl(k),
      hdr, body = json.getBytes(UTF_8))
    // ONLY 412 is a CAS conflict (Left = "foreign commit won; rebase"
    // to Catalog.mutateDoc retry loops) — treating a persistent 5xx as
    // a conflict would spin those loops forever; throw instead
    if (code == 200) { metaCache.put(k, (json, etag)); Right(etag) }
    else if (code == 412) Left(s"precondition failed for $key (HTTP 412)")
    else throw new java.io.IOException(
      s"casMeta $key -> HTTP $code: ${new String(body, UTF_8).take(160)}")
  }

  def putMeta(key: String, json: String): Unit = {
    val k = norm(Paths.get(key))
    val (code, _, etag) = exchange("PUT", metaUrl(k),
      body = json.getBytes(UTF_8))
    require(code == 200, s"putMeta $key -> HTTP $code")
    metaCache.put(k, (json, etag))
  }

  def deleteMeta(key: String): Unit = {
    val k = norm(Paths.get(key))
    exchange("DELETE", metaUrl(k))
    metaCache.remove(k)
    ()
  }

  def withWriterMutex[A](lockKey: Path)(f: => A): A = f // no locks on object stores

  def putData(stagedLocal: Path, dest: Path): Unit = {
    val (code, _, _) = exchange("PUT", s"$endpoint/data${enc(norm(dest))}",
      bodyFile = stagedLocal)
    require(code == 200, s"putData $dest -> HTTP $code")
    Files.deleteIfExists(stagedLocal)
    ()
  }

  /** Crash-sim seam (BackendHarness): publish raw bytes as an object. */
  private[log] def putDataBytes(dest: Path, bytes: Array[Byte]): Unit = {
    val (code, _, _) = exchange("PUT", s"$endpoint/data${enc(norm(dest))}",
      body = bytes)
    require(code == 200, s"putDataBytes $dest -> HTTP $code")
  }

  private def list(mode: String, dir: Path): Seq[String] = {
    val (_, body, _) = exchange("GET",
      s"$endpoint/list?mode=$mode&prefix=${URLEncoder.encode(norm(dir), "UTF-8")}")
    val s = new String(body, UTF_8)
    if (s.isEmpty) Nil else s.split('\n').toSeq
  }

  def listData(dir: Path): Seq[Path] = list("data", dir).map(Paths.get(_))
  def listSubdirs(dir: Path): Seq[String] = list("subdirs", dir)
  def dataExists(dir: Path): Boolean = list("exists", dir).nonEmpty

  def deleteData(file: Path): Unit = {
    exchange("DELETE", s"$endpoint/data${enc(norm(file))}")
    ()
  }

  def deletePrefix(dir: Path): Unit = {
    exchange("DELETE",
      s"$endpoint/prefix?prefix=${URLEncoder.encode(norm(dir), "UTF-8")}")
    ()
  }

  def timeOf(path: Path): Option[Long] = {
    val (code, body, _) = exchange("GET",
      s"$endpoint/time?path=${URLEncoder.encode(norm(path), "UTF-8")}")
    if (code == 200) Some(new String(body, UTF_8).toLong) else None
  }

  def touch(path: Path, nowMs: Long): Unit = {
    exchange("POST",
      s"$endpoint/touch?path=${URLEncoder.encode(norm(path), "UTF-8")}&ms=$nowMs")
    ()
  }
}

object HttpObjectBackend {
  /** Raise the JDK keep-alive pool cap once per process (read at
    * first connection use; default 5 per host). */
  private lazy val raiseConnectionCap: () => Unit = {
    if (System.getProperty("http.maxConnections") == null)
      System.setProperty("http.maxConnections", "64")
    () => ()
  }

  /** Register an HTTP-endpoint backend for a root; every StreamStore /
    * Catalog constructed over the root in THIS process then routes all
    * protocol IO through the endpoint. Run from N processes against
    * one endpoint = N drivers on one bucket, for real. */
  def install(root: String, endpoint: String): HttpObjectBackend = {
    val b = new HttpObjectBackend(endpoint)
    StorageBackend.register(root, b)
    b
  }
}

/** Shared key canonicalization for object-semantics adapters — must
  * match the registry's root canonicalization (Catalog.canonicalRoot)
  * or symlink-aliased roots would generate disjoint key spaces (see
  * ObjectStoreBackend.norm's doc).
  */
private[log] object ObjectKeys {
  def norm(p: Path): String = {
    val abs = p.toAbsolutePath
    try abs.toRealPath().toString
    catch {
      case _: java.io.IOException =>
        val n = abs.normalize
        var existing = n.getParent
        while (existing != null && !Files.exists(existing))
          existing = existing.getParent
        if (existing == null) n.toString
        else {
          val real = existing.toRealPath()
          real.resolve(existing.relativize(n)).toString
        }
    }
  }
}
