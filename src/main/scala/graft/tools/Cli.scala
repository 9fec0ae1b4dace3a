package graft.tools

import java.io.PrintStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.util.Base64

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.log.HttpRecordsClient

/** Human front end over the HTTP surface — the analog of the
  * reference's `s2` CLI (`cli/src/cli.rs`): ls / create / config /
  * check-tail / append / cat / tail (-f via SSE) / trim / fence, with
  * the three record renderings of `cli/src/record_format.rs`
  * (text | json | base64). The CLI is deliberately a THIN client: every
  * operation is one of the server's existing v1 routes; trim and fence
  * ride the append route as command records exactly like the SDK
  * (command.rs:39-43 wire form).
  *
  * Output discipline matches the reference: record data and listings
  * go to stdout, status/confirmation lines to stderr
  * (main.rs eprintln "✓ ..." arms), command records under `--format
  * text` are DESCRIBED on stderr (`main.rs:765-795 write_record`)
  * because text bodies cannot carry headers.
  *
  * Config file (`config get/set/unset/ls`, config.rs): JSON at
  * `$GRAFT_CONFIG` (or `~/.config/graft/config.json`) holding
  * `endpoint` / `token` / `format` defaults; explicit flags win.
  */
object Cli {

  def main(args: Array[String]): Unit =
    sys.exit(run(args.toIndexedSeq,
      new PrintStream(Console.out, true, "UTF-8"),
      new PrintStream(Console.err, true, "UTF-8")))

  private final case class CliError(msg: String) extends RuntimeException(msg)

  // ----------------------------------------------------------------
  // Argument parsing (hand-rolled: no arg-parsing deps in build.sbt)
  // ----------------------------------------------------------------

  private final case class Parsed(cmd: String, positional: Vector[String],
                                  flags: Map[String, String],
                                  switches: Set[String])

  /** Flags that take a value; everything else `--x` is a switch. */
  private val valued = Set(
    "endpoint", "token", "format", "cacert", "config",
    "seq-num", "timestamp", "tail-offset", "count", "bytes", "until",
    "lines", "input", "output", "fencing-token", "match-seq-num",
    "prefix", "limit", "start-after", "wait",
    "expires-at", "scope", "set", "start", "end", "interval")
  private val aliases = Map("-s" -> "seq-num", "-n" -> "lines",
    "-b" -> "bytes", "-i" -> "input", "-o" -> "output", "-f" -> "follow")

  private def parseArgs(argv: Seq[String]): Parsed = {
    if (argv.isEmpty) throw CliError(usage)
    val cmd = argv.head
    var pos = Vector.empty[String]
    var flags = Map.empty[String, String]
    var switches = Set.empty[String]
    var i = 1
    while (i < argv.length) {
      val a = argv(i)
      val canon =
        if (a.startsWith("--")) a.drop(2)
        else aliases.getOrElse(a, if (a.startsWith("-") && a.length > 1) a.drop(1) else "")
      if (a.startsWith("-") && a.length > 1 && !a.forall(c => c.isDigit || c == '-')) {
        val (name, inline) = canon.indexOf('=') match {
          case -1 => (canon, None)
          case k => (canon.take(k), Some(canon.drop(k + 1)))
        }
        if (valued(name)) {
          val v = inline.getOrElse {
            i += 1
            if (i >= argv.length) throw CliError(s"--$name requires a value")
            argv(i)
          }
          flags += name -> v
        } else switches += name
      } else pos :+= a
      i += 1
    }
    Parsed(cmd, pos, flags, switches)
  }

  /** `s2://basin/stream`, `graft://basin/stream`, or plain
    * `basin/stream`; basin-only forms drop the `/stream` part. */
  private def parseUri(s: String): (String, Option[String]) = {
    val bare = s.stripPrefix("s2://").stripPrefix("graft://")
    bare.indexOf('/') match {
      case -1 => (bare, None)
      case i => (bare.take(i),
        Some(bare.drop(i + 1)).filter(_.nonEmpty))
    }
  }

  private def streamUri(p: Parsed): (String, String) =
    p.positional.headOption.map(parseUri) match {
      case Some((b, Some(st))) => (b, st)
      case _ => throw CliError(s"${p.cmd} needs an s2://{basin}/{stream} URI")
    }

  // ----------------------------------------------------------------
  // Config file
  // ----------------------------------------------------------------

  private def configPath(p: Parsed): Path =
    p.flags.get("config").map(Paths.get(_)).getOrElse {
      sys.env.get("GRAFT_CONFIG").map(Paths.get(_)).getOrElse(
        Paths.get(sys.props.getOrElse("user.home", "."),
          ".config", "graft", "config.json"))
    }

  private def loadConfig(path: Path): Map[String, String] =
    if (!Files.exists(path)) Map.empty
    else JsonMethods.parse(Files.readString(path)) match {
      case JObject(fields) => fields.collect {
        case (k, JString(v)) => k -> v
      }.toMap
      case _ => Map.empty
    }

  private def saveConfig(path: Path, cfg: Map[String, String]): Unit = {
    Files.createDirectories(path.getParent)
    val body = cfg.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${jsonEsc(k)}":"${jsonEsc(v)}""""
    }.mkString("{", ",", "}")
    Files.writeString(path, body + "\n")
  }

  // ----------------------------------------------------------------
  // Context: endpoint + auth + format resolved from flags/env/config
  // ----------------------------------------------------------------

  private final case class Ctx(endpoint: String, token: Option[String],
                               format: String,
                               out: PrintStream, err: PrintStream) {
    def hdrs: Seq[(String, String)] =
      token.map(t => "Authorization" -> s"Bearer $t").toSeq
    /** s2-format header: raw for text|json, base64 for binary-safe. */
    def wireBase64: Boolean = format == "base64"
    def wireHdrs: Seq[(String, String)] =
      hdrs :+ ("s2-format" -> (if (wireBase64) "base64" else "raw"))
  }

  private def ctxOf(p: Parsed, out: PrintStream, err: PrintStream): Ctx = {
    val cfg = loadConfig(configPath(p))
    val endpoint = p.flags.get("endpoint")
      .orElse(sys.env.get("GRAFT_ENDPOINT")).orElse(cfg.get("endpoint"))
      .getOrElse(throw CliError(
        "no endpoint: pass --endpoint, set GRAFT_ENDPOINT, or `config set endpoint <url>`"))
      .stripSuffix("/")
    val format = p.flags.get("format").orElse(cfg.get("format")).getOrElse("text")
    if (!Set("text", "json", "base64").contains(format))
      throw CliError(s"unknown --format: $format (text|json|base64)")
    // TLS trust: --cacert pins a PEM; --insecure trusts anything
    // (the reference's ssl-no-verify hint for --tls-self servers)
    if (p.flags.contains("cacert"))
      HttpRecordsClient.clientTls(Some(graft.log.Tls.clientContext(
        Files.readString(Paths.get(p.flags("cacert"))))))
    else if (p.switches("insecure"))
      HttpRecordsClient.clientTls(Some(graft.log.Tls.insecureClientContext()))
    Ctx(endpoint,
      p.flags.get("token").orElse(sys.env.get("GRAFT_TOKEN")).orElse(cfg.get("token")),
      format, out, err)
  }

  // ----------------------------------------------------------------
  // JSON helpers (shared shapes with the server wire format)
  // ----------------------------------------------------------------

  private def jsonEsc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jStr(v: JValue): Option[String] =
    v match { case JString(s) => Some(s); case _ => None }
  private def jLong(v: JValue): Option[Long] = v match {
    case JInt(n) => Some(n.toLong)
    case JLong(n) => Some(n)
    case _ => None
  }

  private def fail(status: Int, body: String): Nothing =
    throw CliError(s"HTTP $status: $body")

  private def get(ctx: Ctx, path: String,
                  extra: Seq[(String, String)] = Nil): JValue = {
    val (code, body, _) = HttpRecordsClient.requestAny(
      "GET", ctx.endpoint + path, ctx.hdrs ++ extra)
    if (code >= 300) fail(code, body)
    if (body.isEmpty) JNothing else JsonMethods.parse(body)
  }

  // ----------------------------------------------------------------
  // Record formatting (record_format.rs parity)
  // ----------------------------------------------------------------

  private def decodeWire(base64: Boolean, s: String): Array[Byte] =
    if (base64) Base64.getDecoder.decode(s) else s.getBytes(UTF_8)

  /** One wire record (seq_num/timestamp/headers-as-pairs/body) decoded
    * to bytes. */
  private final case class Rec(seqNum: Long, timestamp: Long,
                               headers: Seq[(Array[Byte], Array[Byte])],
                               body: Array[Byte]) {
    def isCommand: Boolean = headers.size == 1 && headers.head._1.isEmpty
  }

  private def recOf(j: JValue, wireBase64: Boolean): Rec = {
    val hs = j \ "headers" match {
      case JArray(pairs) => pairs.map {
        case JArray(List(JString(n), JString(v))) =>
          (decodeWire(wireBase64, n), decodeWire(wireBase64, v))
        case other => throw CliError(s"malformed header in response: $other")
      }
      case _ => Nil
    }
    Rec(
      jLong(j \ "seq_num").getOrElse(throw CliError("record without seq_num")),
      jLong(j \ "timestamp").getOrElse(0L),
      hs,
      jStr(j \ "body").map(decodeWire(wireBase64, _)).getOrElse(Array.emptyByteArray))
  }

  /** record_format.rs render: one line per record. `text` writes the
    * lossy-UTF-8 body (command records described on stderr instead —
    * main.rs:772-791); `json`/`base64` write the serialized record with
    * headers as [name, value] pairs, omitting empty headers/body. */
  private def writeRecord(ctx: Ctx, r: Rec): Unit = ctx.format match {
    case "text" =>
      if (r.isCommand) {
        val op = new String(r.headers.head._2, UTF_8)
        val desc = op match {
          case "fence" =>
            s"""new fencing token "${new String(r.body, UTF_8)}""""
          case "trim" if r.body.length >= 8 =>
            s"trim to ${java.nio.ByteBuffer.wrap(r.body, 0, 8).getLong}"
          case _ => "unknown command"
        }
        ctx.err.println(s"$desc // ${r.seqNum} @ ${r.timestamp}")
      } else ctx.out.println(new String(r.body, UTF_8))
    case fmt =>
      val b64 = fmt == "base64"
      def enc(b: Array[Byte]): String =
        if (b64) Base64.getEncoder.encodeToString(b)
        else new String(b, UTF_8)
      val hs = if (r.headers.isEmpty) ""
        else r.headers.map { case (n, v) =>
          s"""["${jsonEsc(enc(n))}","${jsonEsc(enc(v))}"]"""
        }.mkString(""","headers":[""", ",", "]")
      val body = if (r.body.isEmpty) ""
        else s""","body":"${jsonEsc(enc(r.body))}""""
      ctx.out.println(
        s"""{"seq_num":${r.seqNum},"timestamp":${r.timestamp}$hs$body}""")
  }

  /** Parse one input line into a WIRE record JSON fragment (the server
    * shares the CLI's pair-shaped headers, so json/base64 lines pass
    * through after validation). Returns None for blank lines. */
  private def parseLine(ctx: Ctx, line: String): Option[String] = {
    if (ctx.format == "text")
      return Some(s"""{"body":"${jsonEsc(line)}"}""")
    if (line.isBlank) return None
    val j = JsonMethods.parse(line)
    val hs = j \ "headers" match {
      case JArray(pairs) => pairs.map {
        case JArray(List(JString(n), JString(v))) =>
          s"""["${jsonEsc(n)}","${jsonEsc(v)}"]"""
        case other => throw CliError(s"malformed header: $other")
      } match {
        case Nil => ""
        case items => items.mkString(""","headers":[""", ",", "]")
      }
      case _ => ""
    }
    val body = jStr(j \ "body").map(b => s""","body":"${jsonEsc(b)}"""").getOrElse("")
    val ts = jLong(j \ "timestamp").map(t => s""","timestamp":$t""").getOrElse("")
    Some(s"""{${(ts + hs + body).stripPrefix(",")}}"""
      .replace("{}", """{"body":""}"""))
  }

  // ----------------------------------------------------------------
  // Commands
  // ----------------------------------------------------------------

  def run(argv: Seq[String], out: PrintStream, err: PrintStream): Int =
    try {
      val p = parseArgs(argv)
      p.cmd match {
        case "help" | "--help" | "-h" => out.println(usage); 0
        case "config" => configCmd(p, out, err)
        case other => apiCmd(p, other, out, err)
      }
    } catch {
      case CliError(msg) => err.println(s"error: $msg"); 1
      case e: java.io.IOException => err.println(s"error: ${e.getMessage}"); 1
    }

  private def configCmd(p: Parsed, out: PrintStream, err: PrintStream): Int = {
    val path = configPath(p)
    val cfg = loadConfig(path)
    p.positional.toList match {
      case "ls" :: Nil | Nil =>
        cfg.toSeq.sortBy(_._1).foreach { case (k, v) => out.println(s"$k=$v") }; 0
      case "get" :: k :: Nil =>
        cfg.get(k) match {
          case Some(v) => out.println(v); 0
          case None => err.println(s"error: $k not set"); 1
        }
      case "set" :: k :: v :: Nil =>
        saveConfig(path, cfg + (k -> v)); err.println(s"✓ $k set"); 0
      case "unset" :: k :: Nil =>
        saveConfig(path, cfg - k); err.println(s"✓ $k unset"); 0
      case other =>
        err.println(s"error: unknown config form: ${other.mkString(" ")}"); 1
    }
  }

  private def apiCmd(p: Parsed, cmd: String,
                     out: PrintStream, err: PrintStream): Int = {
    val ctx = ctxOf(p, out, err)
    cmd match {
      case "ls" => p.positional.headOption.map(parseUri) match {
        case None => listBasins(ctx, p)
        case Some((basin, None)) => listStreams(ctx, p, basin)
        case Some((basin, Some(st))) =>
          throw CliError(s"ls takes a basin, not a stream: $basin/$st")
      }
      case "list-basins" => listBasins(ctx, p)
      case "list-streams" =>
        listStreams(ctx, p, p.positional.headOption.map(parseUri(_)._1)
          .getOrElse(throw CliError("list-streams needs a basin")))

      case "create-basin" =>
        val basin = p.positional.headOption.getOrElse(throw CliError("basin required"))
        val (code, body, _) = HttpRecordsClient.requestAny("POST",
          s"${ctx.endpoint}/v1/basins", ctx.hdrs,
          s"""{"basin":"${jsonEsc(basin)}"}""".getBytes(UTF_8))
        if (code >= 300) fail(code, body)
        err.println("✓ Basin created"); 0
      case "delete-basin" =>
        val basin = p.positional.headOption.getOrElse(throw CliError("basin required"))
        val (code, body, _) = HttpRecordsClient.requestAny("DELETE",
          s"${ctx.endpoint}/v1/basins/${enc(basin)}", ctx.hdrs)
        if (code >= 300) fail(code, body)
        err.println("✓ Basin deletion requested"); 0
      case "get-basin-config" =>
        val basin = p.positional.headOption.getOrElse(throw CliError("basin required"))
        out.println(JsonMethods.compact(
          get(ctx, s"/v1/basins/${enc(basin)}"))); 0

      case "create-stream" =>
        val (basin, stream) = streamUri(p)
        val (code, body, _) = HttpRecordsClient.requestAny("POST",
          s"${ctx.endpoint}/v1/streams", ctx.hdrs :+ basinHdr(basin),
          s"""{"stream":"${jsonEsc(stream)}"}""".getBytes(UTF_8))
        if (code >= 300) fail(code, body)
        err.println("✓ Stream created"); 0
      case "delete-stream" =>
        val (basin, stream) = streamUri(p)
        val (code, body, _) = HttpRecordsClient.requestAny("DELETE",
          s"${ctx.endpoint}/v1/streams/$stream", ctx.hdrs :+ basinHdr(basin))
        if (code >= 300) fail(code, body)
        err.println("✓ Stream deletion requested"); 0
      case "get-stream-config" =>
        val (basin, stream) = streamUri(p)
        out.println(JsonMethods.compact(
          get(ctx, s"/v1/streams/$stream", Seq(basinHdr(basin))))); 0

      case "check-tail" =>
        val (basin, stream) = streamUri(p)
        val t = get(ctx, s"/v1/streams/$stream/records/tail",
          Seq(basinHdr(basin))) \ "tail"
        // the reference's format_position (main.rs:696-698)
        out.println(s"${jLong(t \ "seq_num").getOrElse(0L)} @ ${jLong(t \ "timestamp").getOrElse(0L)}")
        0

      case "fence" =>
        val (basin, stream) = streamUri(p)
        val token = p.positional.lift(1).getOrElse(throw CliError("fence needs a token (may be empty \"\")"))
        val rec = s"""{"headers":[["","fence"]],"body":"${jsonEsc(token)}"}"""
        val ack = appendWire(ctx, p, basin, stream, Seq(rec), forceRaw = true)
        err.println(s"✓ Fencing token set // ${posStr(ack \ "end")}"); 0
      case "trim" =>
        val (basin, stream) = streamUri(p)
        val seq = p.positional.lift(1).getOrElse(throw CliError("trim needs a seq_num"))
          .toLong
        val payload = java.nio.ByteBuffer.allocate(8).putLong(seq).array()
        val rec = s"""{"headers":[["","${"dHJpbQ==" /* "trim" */}"]],"body":"${Base64.getEncoder.encodeToString(payload)}"}"""
        val ack = appendWire(ctx, p, basin, stream, Seq(rec), forceBase64 = true)
        err.println(s"✓ Trim requested // ${posStr(ack \ "end")}"); 0

      case "append" =>
        val (basin, stream) = streamUri(p)
        val lines = p.flags.get("input") match {
          case None | Some("-") =>
            scala.io.Source.fromInputStream(System.in, "UTF-8").getLines()
          case Some(f) => scala.io.Source.fromFile(f, "UTF-8").getLines()
        }
        // batch in RECORD_BATCH_MAX-sized chunks like the SDK batcher
        var appended = 0L
        lines.flatMap(parseLine(ctx, _)).grouped(1000).foreach { batch =>
          val ack = appendWire(ctx, p, basin, stream, batch.toSeq)
          appended += batch.size
          err.println(s"✓ ${batch.size} records appended // ${posStr(ack \ "end")}")
        }
        if (appended == 0) err.println("✓ 0 records appended")
        0

      case "read" | "cat" =>
        val (basin, stream) = streamUri(p)
        val params = Seq(
          p.flags.get("seq-num").map(v => s"seq_num=$v"),
          p.flags.get("timestamp").map(v => s"timestamp=$v"),
          p.flags.get("tail-offset").map(v => s"tail_offset=$v"),
          p.flags.get("count").map(v => s"count=$v"),
          p.flags.get("bytes").map(v => s"bytes=$v"),
          p.flags.get("until").map(v => s"until=$v"),
          if (p.switches("clamp")) Some("clamp=true") else None).flatten
        val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
        val j = get(ctx, s"/v1/streams/$stream/records$q",
          basinHdr(basin) +: wireFmt(ctx))
        val recs = j \ "records" match { case JArray(rs) => rs; case _ => Nil }
        recs.foreach(r => writeRecord(ctx, recOf(r, wireB64(ctx))))
        0

      case "tail" =>
        val (basin, stream) = streamUri(p)
        val n = p.flags.get("lines").map(_.toLong).getOrElse(10L)
        val base = s"${ctx.endpoint}/v1/streams/$stream/records"
        if (!p.switches("follow")) {
          val j = get(ctx,
            s"/v1/streams/$stream/records?tail_offset=$n&count=$n&clamp=true",
            basinHdr(basin) +: wireFmt(ctx))
          val recs = j \ "records" match { case JArray(rs) => rs; case _ => Nil }
          recs.foreach(r => writeRecord(ctx, recOf(r, wireB64(ctx))))
          0
        } else {
          // -f: SSE follow from tail_offset=n, rendering each batch
          // event as it arrives (Last-Event-ID resumption is the
          // SDK/server contract; ^C — or a --count limit, which the
          // server honors by closing the session — ends the follow)
          // an explicit wait budget: a --count-bounded session defaults
          // to wait=0 server-side (api ReadEnd doc) and would close at
          // catch-up instead of following; 60 s is the server clamp
          val extra = p.flags.get("count").map(c => s"&count=$c").getOrElse("") +
            s"&wait=${p.flags.getOrElse("wait", "60")}"
          HttpRecordsClient.streamSse(s"$base?tail_offset=$n&clamp=true$extra",
            (ctx.hdrs :+ basinHdr(basin)) ++ wireFmt(ctx)) { ev =>
            if (ev.event.contains("batch") ||
                (ev.event.isEmpty && ev.data != "[DONE]")) {
              val j = JsonMethods.parse(ev.data)
              j \ "records" match {
                case JArray(rs) =>
                  rs.foreach(r => writeRecord(ctx, recOf(r, wireB64(ctx))))
                case _ => ()
              }
            } else if (ev.event.contains("error"))
              throw CliError(s"stream error: ${ev.data}")
            true
          }
          0
        }

      // ---- access tokens (cli.rs IssueAccessToken/ListAccessTokens/
      // RevokeAccessToken over the C7 registry routes) ----------------
      case "list-access-tokens" =>
        val q = Seq(
          p.flags.get("prefix").map(v => s"prefix=${enc(v)}"),
          p.flags.get("limit").map(v => s"limit=$v"),
          p.flags.get("start-after").map(v => s"start_after=${enc(v)}")
        ).flatten.mkString("&")
        val j = get(ctx, "/v1/access-tokens" + (if (q.isEmpty) "" else s"?$q"))
        j \ "access_tokens" match {
          case JArray(ts) => ts.foreach(t =>
            ctx.out.println(JsonMethods.compact(t)))
          case _ => ()
        }
        0
      case "issue-access-token" =>
        val id = p.positional.headOption.getOrElse(
          throw CliError("issue-access-token needs an id"))
        val exp = p.flags.get("expires-at")
          .map(t => s""","expires_at":"${jsonEsc(t)}"""").getOrElse("")
        val auto = if (p.switches("auto-prefix-streams"))
          ""","auto_prefix_streams":true""" else ""
        val scope = p.flags.getOrElse("scope", "{}")
        val (code, body, _) = HttpRecordsClient.requestAny("POST",
          s"${ctx.endpoint}/v1/access-tokens", ctx.hdrs,
          s"""{"id":"${jsonEsc(id)}"$exp$auto,"scope":$scope}"""
            .getBytes(UTF_8))
        if (code >= 300) fail(code, body)
        out.println(body) // {"access_token":"..."} — the secret, to stdout
        err.println("✓ Access token issued"); 0
      case "revoke-access-token" =>
        val id = p.positional.headOption.getOrElse(
          throw CliError("revoke-access-token needs an id"))
        val (code, body, _) = HttpRecordsClient.requestAny("DELETE",
          s"${ctx.endpoint}/v1/access-tokens/${enc(id)}", ctx.hdrs)
        if (code >= 300) fail(code, body)
        err.println("✓ Access token revoked"); 0

      // ---- metrics (cli.rs GetAccountMetrics/GetBasinMetrics/
      // GetStreamMetrics over /v1/metrics) -----------------------------
      case "get-account-metrics" | "get-basin-metrics" | "get-stream-metrics" =>
        val set = p.flags.getOrElse("set",
          throw CliError(s"$cmd needs --set <metric-set>"))
        val range = Seq(
          Some(s"set=${enc(set)}"),
          p.flags.get("start").map(v => s"start=$v"),
          p.flags.get("end").map(v => s"end=$v"),
          p.flags.get("interval").map(v => s"interval=${enc(v)}")
        ).flatten.mkString("&")
        val path = cmd match {
          case "get-account-metrics" => s"/v1/metrics?$range"
          case "get-basin-metrics" =>
            val basin = p.positional.headOption.map(parseUri(_)._1)
              .getOrElse(throw CliError("get-basin-metrics needs a basin"))
            s"/v1/metrics/${enc(basin)}?$range"
          case _ =>
            val (basin, stream) = streamUri(p)
            s"/v1/metrics/${enc(basin)}/$stream?$range"
        }
        out.println(JsonMethods.compact(get(ctx, path))); 0

      // ---- diff (cli.rs Diff / diff.rs): field-by-field comparison of
      // two basins or two streams. The server's config GETs return the
      // MERGED effective config (defaults applied), so the comparison
      // matches the reference's defaults-applied rule (diff.rs /
      // apply.rs:176-178) without client-side default tables. ----------
      case "diff" =>
        val (ua, ub) = (p.positional.lift(0), p.positional.lift(1)) match {
          case (Some(a), Some(b)) => (parseUri(a), parseUri(b))
          case _ => throw CliError("diff needs two s2:// URIs (basins or streams)")
        }
        def fetch(u: (String, Option[String])): JValue = u match {
          case (basin, None) => get(ctx, s"/v1/basins/${enc(basin)}")
          case (basin, Some(stream)) =>
            get(ctx, s"/v1/streams/$stream", Seq(basinHdr(basin)))
        }
        if (ua._2.isDefined != ub._2.isDefined)
          throw CliError("cannot diff a basin against a stream")
        // flatten to dotted paths so nested config fields line up
        def flatten(prefix: String, j: JValue): Map[String, String] = j match {
          case JObject(fields) => fields.flatMap { case (k, v) =>
            flatten(if (prefix.isEmpty) k else s"$prefix.$k", v)
          }.toMap
          case JNothing | JNull => Map.empty
          case leaf => Map(prefix -> JsonMethods.compact(leaf))
        }
        val (fa, fb) = (flatten("", fetch(ua)), flatten("", fetch(ub)))
        val changed = (fa.keySet ++ fb.keySet).toSeq.sorted.flatMap { k =>
          (fa.get(k), fb.get(k)) match {
            case (a, b) if a == b => None
            case (a, b) =>
              Some(s"~ $k: ${a.getOrElse("(unset)")} -> ${b.getOrElse("(unset)")}")
          }
        }
        if (changed.isEmpty) { err.println("✓ identical"); 0 }
        else { changed.foreach(out.println); 0 }

      // ---- apply (cli.rs Apply / apply.rs): ensure basins + streams
      // from a JSON spec via the idempotent PUT routes; prints the
      // reference's dry-run legend per entry (+ create, ~ ensure-
      // updated, = unchanged) from the server's s2-provision-result ----
      case "apply" =>
        val specPath = p.flags.get("input").orElse(p.positional.headOption)
          .getOrElse(throw CliError("apply needs a spec file (-i spec.json)"))
        val spec = JsonMethods.parse(Files.readString(Paths.get(specPath)))
        def provision(method: String, url: String,
                      body: Option[String],
                      extra: Seq[(String, String)]): String = {
          val (code, resp, hs) = HttpRecordsClient.requestAny(method, url,
            ctx.hdrs ++ extra, body.map(_.getBytes(UTF_8)).orNull)
          if (code >= 300) fail(code, resp)
          hs.firstValue("s2-provision-result").orElse("unknown") match {
            case "created" => "+"
            case "updated" => "~"
            case _ => "="
          }
        }
        spec \ "basins" match {
          case JArray(basins) => basins.foreach { b =>
            val name = jStr(b \ "name").getOrElse(
              throw CliError("basin entry without name"))
            val cfg = b \ "config" match {
              case JNothing => None
              case c => Some(JsonMethods.compact(c))
            }
            val mark = provision("PUT",
              s"${ctx.endpoint}/v1/basins/${enc(name)}", cfg, Nil)
            out.println(s"$mark s2://$name")
            b \ "streams" match {
              case JArray(streams) => streams.foreach { s0 =>
                val sn = jStr(s0 \ "name").getOrElse(
                  throw CliError("stream entry without name"))
                val scfg = s0 \ "config" match {
                  case JNothing => None
                  case c => Some(JsonMethods.compact(c))
                }
                val m2 = provision("PUT",
                  s"${ctx.endpoint}/v1/streams/$sn", scfg,
                  Seq(basinHdr(name)))
                out.println(s"$m2 s2://$name/$sn")
              }
              case _ => ()
            }
          }
          case _ => throw CliError("spec has no basins array")
        }
        0

      case "ping" =>
        val (code, body, _) = HttpRecordsClient.requestAny("GET",
          s"${ctx.endpoint}/ping", ctx.hdrs)
        if (code >= 300) fail(code, body)
        out.println(body); 0

      case other => throw CliError(s"unknown command: $other\n$usage")
    }
  }

  /** text mode rides base64 on the wire (binary-safe bodies), so the
    * DECODE flag must come from here, not from ctx.format alone. */
  private def wireB64(ctx: Ctx): Boolean =
    ctx.wireBase64 || ctx.format == "text"

  private def wireFmt(ctx: Ctx): Seq[(String, String)] =
    Seq("s2-format" -> (if (wireB64(ctx)) "base64" else "raw"))

  private def posStr(j: JValue): String =
    s"${jLong(j \ "seq_num").getOrElse(0L)} @ ${jLong(j \ "timestamp").getOrElse(0L)}"

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def basinHdr(basin: String): (String, String) = "s2-basin" -> basin

  private def appendWire(ctx: Ctx, p: Parsed, basin: String, stream: String,
                         recs: Seq[String], forceRaw: Boolean = false,
                         forceBase64: Boolean = false): JValue = {
    val cond =
      p.flags.get("fencing-token").map(t => s""","fencing_token":"${jsonEsc(t)}"""").getOrElse("") +
        p.flags.get("match-seq-num").map(n => s""","match_seq_num":$n""").getOrElse("")
    val body = s"""{"records":[${recs.mkString(",")}]$cond}"""
    val fmt = if (forceBase64) "base64"
      else if (forceRaw) "raw"
      else if (ctx.wireBase64) "base64" else "raw"
    val (code, resp, _) = HttpRecordsClient.requestAny("POST",
      s"${ctx.endpoint}/v1/streams/$stream/records",
      ctx.hdrs ++ Seq(basinHdr(basin), "s2-format" -> fmt,
        "Content-Type" -> "application/json"),
      body.getBytes(UTF_8))
    if (code >= 300) fail(code, resp)
    JsonMethods.parse(resp)
  }

  private def listBasins(ctx: Ctx, p: Parsed): Int = {
    val q = Seq(
      p.flags.get("prefix").map(v => s"prefix=${enc(v)}"),
      p.flags.get("limit").map(v => s"limit=$v"),
      p.flags.get("start-after").map(v => s"start_after=${enc(v)}")
    ).flatten.mkString("&")
    val j = get(ctx, "/v1/basins" + (if (q.isEmpty) "" else s"?$q"))
    j \ "basins" match {
      case JArray(bs) => bs.foreach(b => jStr(b \ "name").foreach(ctx.out.println))
      case _ => ()
    }
    0
  }

  private def listStreams(ctx: Ctx, p: Parsed, basin: String): Int = {
    val q = Seq(
      p.flags.get("prefix").map(v => s"prefix=${enc(v)}"),
      p.flags.get("limit").map(v => s"limit=$v"),
      p.flags.get("start-after").map(v => s"start_after=${enc(v)}")
    ).flatten.mkString("&")
    val j = get(ctx, "/v1/streams" + (if (q.isEmpty) "" else s"?$q"),
      Seq(basinHdr(basin)))
    j \ "streams" match {
      case JArray(ss) => ss.foreach(s => jStr(s \ "name").foreach(ctx.out.println))
      case _ => ()
    }
    0
  }

  private val usage: String =
    """usage: graft.tools.Cli <command> [args] [--endpoint URL] [--token T] [--format text|json|base64]
      |
      |  ls [s2://basin]                 list basins, or streams in a basin
      |  create-basin <basin>            create a basin
      |  delete-basin <basin>            delete a basin
      |  get-basin-config <basin>        print basin config JSON
      |  create-stream s2://b/s          create a stream
      |  delete-stream s2://b/s          delete a stream
      |  get-stream-config s2://b/s      print stream config JSON
      |  check-tail s2://b/s             print "<seq> @ <ts>"
      |  append s2://b/s [-i FILE]       append stdin/file lines as records
      |  read|cat s2://b/s [opts]        read records (--seq-num/--timestamp/
      |                                  --tail-offset, --count/--bytes/--until/--clamp)
      |  tail s2://b/s [-n N] [-f]       last N records; -f follows via SSE
      |  trim s2://b/s <seq>             set the trim point (command record)
      |  fence s2://b/s <token>          set the fencing token (command record)
      |  config ls|get K|set K V|unset K CLI config (~/.config/graft/config.json)
      |  list-access-tokens              list token registry entries
      |  issue-access-token <id>         [--expires-at T] [--scope JSON]
      |  revoke-access-token <id>        revoke a token
      |  get-account-metrics --set S     [--start --end --interval]
      |  get-basin-metrics <basin> --set S
      |  get-stream-metrics s2://b/s --set S
      |  diff <uriA> <uriB>              field diff of two basins/streams
      |  apply -i spec.json              ensure basins+streams from a spec
      |                                  (+ created, ~ updated, = unchanged)
      |  ping                            server liveness
      |
      |  --cacert PEM | --insecure       TLS trust for https endpoints
      |""".stripMargin
}
