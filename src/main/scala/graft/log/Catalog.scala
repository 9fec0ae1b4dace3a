package graft.log

import java.nio.file.Files
import graft.model._

/** Catalog entries. Configs are stored flattened as string maps to keep
  * the JSON schema trivial (json4s round-trip without custom
  * serializers for the ADTs).
  */
final case class BasinEntry(
    name: String,
    config: Map[String, String] = Map.empty,
    createdAt: Long,
    deletedAt: Option[Long] = None,
    idempotencyKey: Option[String] = None)

final case class StreamEntry(
    basin: String,
    name: String,
    config: Map[String, String] = Map.empty,
    createdAt: Long,
    deletedAt: Option[Long] = None,
    idempotencyKey: Option[String] = None)

/** Legacy single-file catalog layout; still parsed for one-time
  * migration to the sharded layout. */
final case class CatalogState(
    basins: List[BasinEntry] = Nil,
    streams: List[StreamEntry] = Nil)

/** On-disk shape of `basins.json`. */
final case class BasinsFile(basins: List[BasinEntry] = Nil)

/** On-disk shape of one `streams-NN.json` shard. */
final case class StreamShard(streams: List[StreamEntry] = Nil)

/** C8 — a placement location (api/src/v1/location.rs:1-24:
  * LocationInfo { name, is_private }).
  */
final case class LocationInfo(name: String, isPrivate: Boolean = false)

/** On-disk shape of `locations.json`: registered locations + the
  * account default. */
final case class LocationsFile(
    locations: List[LocationInfo] = Nil,
    default: Option[String] = None)

/** C7 — a persisted access token (common access.rs AccessTokenInfo;
  * api access.rs:166-178). Scope is stored flattened the same way
  * configs are (plain strings/bools, json4s round-trip without custom
  * serializers): each resource set as (kind, value) with kind in
  * none|exact|prefix, the three op-group rows as six flags, the
  * explicit op set by name.
  */
final case class TokenEntry(
    id: String,
    expiresAtMs: Option[Long] = None,
    autoPrefixStreams: Boolean = false,
    basinsKind: String = "none", basinsValue: String = "",
    streamsKind: String = "none", streamsValue: String = "",
    tokensKind: String = "none", tokensValue: String = "",
    accountRead: Boolean = false, accountWrite: Boolean = false,
    basinRead: Boolean = false, basinWrite: Boolean = false,
    streamRead: Boolean = false, streamWrite: Boolean = false,
    ops: List[String] = Nil,
    createdAt: Long = 0L) {

  def toToken: graft.model.AccessToken = {
    import graft.model._
    def rs(kind: String, value: String): ResourceSet = kind match {
      case "exact" => ResourceSet.Exact(value)
      case "prefix" => ResourceSet.Prefix(value)
      case _ => ResourceSet.None
    }
    AccessToken(id, AccessTokenScope(
      basins = rs(basinsKind, basinsValue),
      streams = rs(streamsKind, streamsValue),
      accessTokens = rs(tokensKind, tokensValue),
      opGroups = PermittedOperationGroups(accountRead, accountWrite,
        basinRead, basinWrite, streamRead, streamWrite),
      ops = ops.map(Op.withName).toSet),
      expiresAtMs, autoPrefixStreams)
  }
}

object TokenEntry {
  def from(t: graft.model.AccessToken, createdAt: Long): TokenEntry = {
    import graft.model._
    def flat(r: ResourceSet): (String, String) = r match {
      case ResourceSet.None => ("none", "")
      case ResourceSet.Exact(v) => ("exact", v)
      case ResourceSet.Prefix(p) => ("prefix", p)
    }
    val (bk, bv) = flat(t.scope.basins)
    val (sk, sv) = flat(t.scope.streams)
    val (tk, tv) = flat(t.scope.accessTokens)
    val g = t.scope.opGroups
    TokenEntry(t.id, t.expiresAtMs, t.autoPrefixStreams,
      bk, bv, sk, sv, tk, tv,
      g.accountRead, g.accountWrite, g.basinRead, g.basinWrite,
      g.streamRead, g.streamWrite,
      t.scope.ops.toList.map(_.toString).sorted, createdAt)
  }
}

/** On-disk shape of `access_tokens.json`. */
final case class TokensFile(tokens: List[TokenEntry] = Nil)

final case class Page[T](items: Seq[T], hasMore: Boolean)

sealed trait EnsureOutcome
object EnsureOutcome {
  case object Created extends EnsureOutcome
  case object Updated extends EnsureOutcome
  case object Noop extends EnsureOutcome
}

/** Flattened ser/de for StreamConfig (SURVEY §1.5). */
object ConfigCodec {
  def encode(c: StreamConfig): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    c.storageClass.foreach(v => b += "storage_class" ->
      (if (v == StorageClass.Standard) "standard" else "express"))
    c.retentionPolicy.foreach {
      case RetentionPolicy.Age(s) => b += "retention_age_secs" -> s.toString
      case RetentionPolicy.Infinite => b += "retention_age_secs" -> "infinite"
    }
    c.timestamping.foreach { t =>
      b += "timestamping_mode" -> (t.mode match {
        case TimestampingMode.ClientPrefer => "client-prefer"
        case TimestampingMode.ClientRequire => "client-require"
        case TimestampingMode.Arrival => "arrival"
      })
      b += "timestamping_uncapped" -> t.uncapped.toString
    }
    c.deleteOnEmpty.foreach(v => b += "delete_on_empty_min_age_secs" -> v.minAgeSeconds.toString)
    b.result()
  }

  def decode(m: Map[String, String]): StreamConfig = StreamConfig(
    storageClass = m.get("storage_class").map {
      case "standard" => StorageClass.Standard
      case _ => StorageClass.Express
    },
    retentionPolicy = m.get("retention_age_secs").map {
      case "infinite" => RetentionPolicy.Infinite
      case s => RetentionPolicy.Age(s.toLong)
    },
    timestamping = m.get("timestamping_mode").map { mode =>
      Timestamping(
        mode match {
          case "client-require" => TimestampingMode.ClientRequire
          case "arrival" => TimestampingMode.Arrival
          case _ => TimestampingMode.ClientPrefer
        },
        m.get("timestamping_uncapped").exists(_.toBoolean))
    },
    deleteOnEmpty = m.get("delete_on_empty_min_age_secs")
      .map(s => DeleteOnEmpty(s.toLong)))

  def encodeBasin(c: BasinConfig): Map[String, String] =
    encode(c.defaultStreamConfig) ++
      Map("create_stream_on_append" -> c.createStreamOnAppend.toString,
          "create_stream_on_read" -> c.createStreamOnRead.toString) ++
      c.streamCipher.map(a => "stream_cipher" -> a.wireName)

  def decodeBasin(m: Map[String, String]): BasinConfig = BasinConfig(
    decode(m),
    m.get("create_stream_on_append").exists(_.toBoolean),
    m.get("create_stream_on_read").exists(_.toBoolean),
    m.get("stream_cipher").flatMap(CipherAlgo.fromWire))
}

object Catalog {
  /** Fixed shard fan-out per basin. 64 keeps a 100k-stream basin's
    * shards at ~1.5k entries (≈150 KiB JSON) each — small enough that
    * a single-stream mutation is a near-constant write, large enough
    * that a full-basin list is 64 cached loads, not thousands.
    */
  val NumShards = 64

  /** Stable shard of a stream name (md5, not String.hashCode, so
    * sequential names like `s-1…s-N` spread evenly). */
  private[graft] def shardOf(stream: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (md.digest(stream.getBytes("UTF-8"))(0) & 0xff) % NumShards
  }

  /** JVM-global lock registry keyed by (canonical root, scope).
    *
    * Catalog mutations are read-modify-write over shared JSON files,
    * so the monitors MUST be shared by every Catalog instance over the
    * same root in this process (a StreamStore's catalog, the SQL
    * catalog plugin's, a scan's — each news its own instance):
    * per-instance monitors would let two instances interleave a
    * basins.json rewrite and lose one side's update. It also keeps the
    * migration's OS file lock single-entrant per JVM — a second
    * in-JVM `FileChannel.lock()` on one file throws
    * OverlappingFileLockException rather than waiting.
    */
  private val locks = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.WeakReference[Object]]()

  /** Counter-gating for the dead-ref sweep below, same discipline as
    * purgeDeadEntries: with >8192 LIVE monitors the size threshold
    * never clears, and an ungated `removeIf` would put a full-map
    * scan inside EVERY lock acquisition forever. At most one sweep
    * per 1024 acquisitions bounds the amortized cost regardless of
    * how many entries turn out to be collectable. */
  private val acquiresSinceSweep = new java.util.concurrent.atomic.AtomicLong

  @annotation.tailrec
  private[log] def globalLock(canonRoot: String, scope: String): Object = {
    if (locks.size > 8192 && acquiresSinceSweep.incrementAndGet() % 1024 == 0)
      locks.entrySet.removeIf(e => e.getValue.get == null)
    val key = canonRoot + "\u0000" + scope
    val ref = locks.computeIfAbsent(
      key, _ => new java.lang.ref.WeakReference(new Object))
    val o = ref.get
    if (o == null) { locks.remove(key, ref); globalLock(canonRoot, scope) }
    else o
  }

  /** Canonical form of a catalog root for JVM-global registry keys:
    * resolves symlinks (`toRealPath`) so two instances opening one
    * physical root via different symlinked paths share monitors and
    * cache entries. When the root does not exist yet (first
    * construction creates it), the deepest EXISTING ancestor is
    * resolved and the remainder appended lexically — so an instance
    * constructed before the directory exists and one constructed
    * after agree on the key even when an ancestor is a symlink
    * (plain lexical fallback would give them different keys and
    * split the control plane in two).
    */
  private[graft] def canonicalRoot(root: String): String = {
    // toRealPath on the RAW absolute path — never normalize() first:
    // lexical normalization folds '..' across symlinks ('/b/sym/../x'
    // is NOT '/b/x' when sym points elsewhere), which would key and
    // build the control plane under the wrong directory.
    val abs = java.nio.file.Paths.get(root).toAbsolutePath
    try abs.toRealPath().toString
    catch {
      case _: java.io.IOException =>
        // Root doesn't exist yet: resolve the deepest EXISTING
        // ancestor and append the remainder. The remainder is
        // normalized lexically — best effort, since a '..' behind a
        // not-yet-existing symlink cannot be resolved by anyone.
        val norm = abs.normalize
        var existing = norm.getParent
        while (existing != null && !Files.exists(existing))
          existing = existing.getParent
        if (existing == null) norm.toString
        else try existing.toRealPath()
          .resolve(existing.relativize(norm)).toString
        catch { case _: java.io.IOException => norm.toString }
    }
  }

  /** JVM-global (mtime, size)-keyed parse cache over control-plane
    * files, shared by every Catalog instance.
    *
    * Shared -- not per-instance -- because the LOCKS are shared: with a
    * per-instance cache, instance A's saveFile only refreshed A's own
    * cache, and a same-size rewrite landing within filesystem
    * timestamp granularity would let instance B serve its stale parse
    * (mtime+size unchanged) and then rewrite from it, losing A's
    * update despite the shared monitor. With one cache, A's saveFile
    * IS B's cache refresh.
    */
  /** Cache entry: (mtime, size, write-stamp-at-install, parsed value).
    * The stamp lets lock-free readers install with CAS against
    * concurrent writers — see loadCached. */
  private[log] val parseCache = scala.collection.concurrent.TrieMap
    .empty[String, (java.nio.file.attribute.FileTime, Long, Long, AnyRef)]

  /** Per-path monotonically increasing write stamp, bumped by every
    * saveFile BEFORE its cache refresh. An UNLOCKED reader (the read
    * paths take no monitor) records the stamp before parsing and
    * declines to cache if it moved: otherwise the reader could parse
    * the pre-write bytes, the writer could rewrite same-size within
    * filesystem timestamp granularity and refresh the cache, and the
    * reader's late put would clobber the fresh entry with a stale
    * parse under a matching (mtime, size) key — resurrecting the
    * lost-update this shared cache exists to prevent.
    */
  private[log] val writeStamps = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
  private[log] def writeStamp(path: String): java.util.concurrent.atomic.AtomicLong =
    writeStamps.computeIfAbsent(path, _ => new java.util.concurrent.atomic.AtomicLong)

  /** Opportunistic purge of parse-cache entries whose files are gone
    * (deleted basins, abandoned test roots) once the map gets large —
    * the same no-monotonic-growth discipline as the lock registry.
    *
    * Counter-gated to at most one sweep per 1024 saves: the sweep
    * stats every cached path, and with >4096 LIVE entries an
    * every-save sweep would put thousands of stat(2) calls inside
    * each catalog mutation forever (the threshold never clears when
    * the files all exist).
    *
    * writeStamps is deliberately NOT purged: a purged-and-recreated
    * stamp restarts at 0 and could climb back to a previously
    * observed value, letting a stale reader pass loadCached's
    * stamp-unmoved check and CAS its stale parse over a fresh one.
    * Monotonicity is the invariant; an AtomicLong per path ever
    * written is cheap.
    */
  /** Object-mode control-plane parse cache: path -> (etag, parsed).
    * Shared JVM-wide for the same reason parseCache is; correctness
    * rests on etag equality (content hash), not timestamps. */
  private[log] val objectParseCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, AnyRef)]

  /** Test-visible tally of control-plane document PARSES (cache
    * misses). CatalogShardSpec uses deltas of this to pin that
    * list-paging serves pages from the parse cache — the structural
    * guarantee that a 10k-stream basin's page N does not re-parse all
    * 64 shards (the failure mode if the cache keying broke).
    */
  private[log] val parseTally = new java.util.concurrent.atomic.AtomicLong

  private val savesSincePurge = new java.util.concurrent.atomic.AtomicLong
  private[log] def purgeDeadEntries(): Unit = {
    if (savesSincePurge.incrementAndGet() % 1024 == 0 && parseCache.size > 4096)
      parseCache.keys.foreach { k =>
        if (!Files.exists(java.nio.file.Paths.get(k))) parseCache.remove(k)
      }
  }
}

/** Control-plane catalog (SURVEY §2.4, C1-C6): basins and streams with
  * create/ensure/reconfigure/list/delete.
  *
  * Scale layout: `basins.json` holds the basin list; each basin's
  * streams live in 64 hash-sharded `<basin>/streams-NN.json` files. A
  * single-stream mutation loads and rewrites ONLY its shard (~1/64th
  * of one basin), where the old single-file layout serialized the
  * entire control plane on every mutation — at 100k streams an
  * O(100k) write per create/reconfigure. This is the file-granularity
  * analog of the reference's per-stream StreamMeta KV key
  * (lite/src/backend/kv/mod.rs:66-71) under serialized catalog
  * transactions (streams.rs:89,284): writers serialize per basin (plus
  * one lock for the basin list), and every control-plane file has an
  * (mtime, size)-keyed parse cache so reads cost a stat(2) unless a
  * foreign process wrote it.
  */
final class Catalog(root: String) {
  import Catalog.NumShards

  /** All registry keys and control-plane paths are built from the
    * canonical root so every instance over one physical root — however
    * spelled — shares the same monitors and parse-cache entries.
    */
  private val canonRoot = Catalog.canonicalRoot(root)

  // basin list + legacy migration; shared JVM-wide per root so
  // independent Catalog instances over one root serialize (see
  // Catalog.globalLock)
  private val lock = Catalog.globalLock(canonRoot, "__basins__")
  private def basinLock(basin: String): Object =
    Catalog.globalLock(canonRoot, "b\u0000" + basin)

  private val basinsPath = Layout.basinsPath(canonRoot)

  /** The physical-IO adapter governing this root — same resolution as
    * StreamStore's data plane, so a root with an object-semantics
    * backend installed gets an object-portable CONTROL plane too: the
    * reference keeps basin/stream metadata in the same object-backed
    * KV as records (lite/src/backend/kv/mod.rs:54-71, key types
    * BasinMeta/StreamMeta), and this catalog follows suit — every
    * document read comes from the backend and every mutation commits
    * through `casMeta` (conditional put), no file locks, no renames.
    * On POSIX the classic advisory path below (JVM monitors + atomic
    * rename + (mtime,size) parse cache) remains the fast path.
    */
  private val backend = StorageBackend.forRoot(root)
  private val objectMode = !backend.hasWriterMutex

  // JVM-global parse cache (see Catalog.parseCache for why it cannot
  // be per-instance)
  private def cache = Catalog.parseCache

  /** Object-mode parse cache: etag-keyed (etags are content hashes, so
    * a hit is exact). Lock-free: entries are only ever replaced with a
    * parse of the SAME etag'd bytes or newer bytes; a stale install
    * is corrected by the next read's etag mismatch. */
  private def objCache = Catalog.objectParseCache

  private def parseObj[A <: AnyRef: Manifest](key: String,
                                              json: String, etag: String): A =
    objCache.get(key) match {
      case Some((t, v)) if t == etag => v.asInstanceOf[A]
      case _ =>
        Catalog.parseTally.incrementAndGet()
        val v = Layout.fromJsonString[A](json)
        objCache.put(key, (etag, v))
        v
    }

  /** Serialized read-modify-write of ONE control-plane document; every
    * catalog mutation goes through here.
    *
    * `f` sees the current parse and returns (replacement, result);
    * `None` = read-only outcome, nothing written.
    *
    * POSIX: the JVM monitor the caller holds serializes in-process
    * writers; the write is an atomic rename (pre-existing semantics —
    * cross-process POSIX catalog mutation remains advisory, exactly
    * like before this abstraction).
    *
    * Object mode: load (json, etag) from the backend, apply `f`,
    * commit with `casMeta` — If-Match on the loaded etag, or
    * If-None-Match when the document did not exist. In-JVM writers
    * already serialize on the catalog monitors, so a precondition
    * failure means a FOREIGN driver committed between our load and
    * put: re-run `f` on the fresh parse (f is pure in the document)
    * and try again, bounded.
    */
  /** Test seam: runs between a mutation's document load and its
    * conditional put (object mode only), so specs can inject the
    * foreign-driver interleaving that forces the CAS-rebase path. */
  private[log] var beforeCatalogCas: () => Unit = () => ()

  /** objectParseCache growth bound (the POSIX parseCache has the same
    * discipline in Catalog.purgeDeadEntries): long-lived drivers that
    * create and delete many streams/basins would otherwise accumulate
    * dead-key parses forever. Same cadence (every 1024 saves, only
    * past 4096 entries), scoped to THIS root's prefix so one catalog
    * never evicts another root's live entries, and keyed on backend
    * absence — the authoritative "this document no longer exists". */
  private val objSavesSincePurge = new java.util.concurrent.atomic.AtomicLong
  private def purgeObjCache(): Unit = {
    if (objSavesSincePurge.incrementAndGet() % 1024 == 0 && objCache.size > 4096) {
      val prefix = canonRoot + "/"
      objCache.keys.foreach { k =>
        if (k.startsWith(prefix) && backend.getMeta(k, fresh = false).isEmpty)
          objCache.remove(k)
      }
    }
  }

  private def mutateDoc[A <: AnyRef: Manifest, R](path: java.nio.file.Path,
                                                  default: => A)
      (f: A => (Option[A], R)): R = {
    if (!objectMode) {
      val (next, r) = f(loadCached(path, default))
      next.foreach(saveFile(path, _))
      return r
    }
    val key = path.toString
    var attempts = 0
    while (attempts < 64) {
      val cur = backend.getMeta(key, fresh = true)
      val parsed = cur match {
        case Some((json, etag)) => parseObj[A](key, json, etag)
        case None => default
      }
      val (next, r) = f(parsed)
      next match {
        case None => return r
        case Some(doc) =>
          beforeCatalogCas()
          backend.casMeta(key, Layout.toJsonString(doc), cur.map(_._2)) match {
            case Right(tag) =>
              objCache.put(key, (tag, doc)); purgeObjCache(); return r
            case Left(_) => attempts += 1 // foreign commit won; rebase
          }
      }
    }
    throw new IllegalStateException(s"catalog CAS starvation on $key")
  }

  private def loadCached[A <: AnyRef: Manifest](path: java.nio.file.Path,
                                                default: => A): A = {
    if (objectMode) {
      // reads come from the backend's authoritative index (the local
      // mirror files are write-through copies for foreign read-only
      // tooling, never consulted here), cached by etag
      val key = path.toString
      return backend.getMeta(key, fresh = false) match {
        case Some((json, etag)) => parseObj[A](key, json, etag)
        case None => default
      }
    }
    if (!Files.exists(path)) { cache.remove(path.toString); return default }
    val key = path.toString
    val stamp0 = Catalog.writeStamp(key).get()
    val ft = Files.getLastModifiedTime(path)
    val size = Files.size(path)
    cache.get(key) match {
      case Some((t, s, _, v)) if t == ft && s == size => v.asInstanceOf[A]
      case _ =>
        Catalog.parseTally.incrementAndGet()
        val v = Layout.readJson[A](path).getOrElse(default)
        // Key the cache by the PRE-read stat: if a foreign process
        // replaces the file while we parse, the next call re-stats,
        // mismatches, and re-parses — keying by a post-read stat
        // would pair the new (mtime, size) with the old content and
        // serve it stale until the file changes again.
        //
        // Install with CAS against the in-JVM write stamp: this read
        // path holds no monitor, so a concurrent locked saveFile may
        // have rewritten the file (possibly same-size within mtime
        // granularity) and refreshed the cache while we parsed — an
        // unconditional put here would clobber that fresh entry with
        // our stale parse under a matching key. The entry we install
        // records stamp0; we only install over nothing (putIfAbsent)
        // or over an entry no newer than stamp0 (replace-CAS). A
        // writer's entry always carries a higher stamp and wins.
        val entry = (ft, size, stamp0, v: AnyRef)
        if (Catalog.writeStamp(key).get() == stamp0) {
          cache.get(key) match {
            case None => cache.putIfAbsent(key, entry)
            case Some(old) if old._3 <= stamp0 => cache.replace(key, old, entry)
            case _ => ()
          }
        }
        v
    }
  }

  private def saveFile[A <: AnyRef](path: java.nio.file.Path, v: A): Unit = {
    Layout.writeJson(path, v)
    val stamp = Catalog.writeStamp(path.toString).incrementAndGet()
    cache.put(path.toString,
      (Files.getLastModifiedTime(path), Files.size(path), stamp, v))
    Catalog.purgeDeadEntries()
  }

  /** One-time migration of a pre-shard single-file root: split
    * `catalog.json` into the sharded layout, then park the legacy file
    * under a `.pre-shard` name so the migration never re-runs.
    *
    * Serialized ACROSS PROCESSES by an OS file lock (two Catalog
    * instances constructed concurrently over one legacy root must not
    * both migrate — a slow loser would overwrite freshly mutated
    * shards with stale legacy content) and re-checked under the lock.
    * basins.json is written LAST, so any instance that observes it can
    * trust every shard is already in place. In-JVM racers serialize on
    * the global per-root monitor FIRST — OS file locks are per-JVM, so
    * without it the second instance's `ch.lock()` would throw
    * OverlappingFileLockException instead of waiting.
    */
  // POSIX-only by construction: object roots are born on the sharded
  // layout (the legacy single-file era predates the object adapter),
  // so the migration — and its OS file lock and renames — never runs
  // there. The `objectMode` guard makes that explicit rather than
  // relying on catalog.json never existing under an object root.
  if (!objectMode &&
      Files.exists(Layout.catalogPath(canonRoot)) && !Files.exists(basinsPath))
    Catalog.globalLock(canonRoot, "__migrate__").synchronized {
      val legacy = Layout.catalogPath(canonRoot)
      Files.createDirectories(legacy.getParent)
      val lockPath = legacy.resolveSibling("migrate.lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val fl = ch.lock()
        try {
          if (Files.exists(legacy) && !Files.exists(basinsPath)) {
            val st = Layout.readJson[CatalogState](legacy).getOrElse(CatalogState())
            st.streams.groupBy(s => (s.basin, Catalog.shardOf(s.name))).foreach {
              case ((b, sh), entries) =>
                saveFile(Layout.streamShardPath(canonRoot, b, sh), StreamShard(entries))
            }
            saveFile(basinsPath, BasinsFile(st.basins))
            Files.move(legacy, legacy.resolveSibling("catalog.json.pre-shard"))
          }
        } finally fl.release()
      } finally ch.close()
    }

  private def basinsFile(): BasinsFile = loadCached(basinsPath, BasinsFile())

  private def shard(basin: String, sh: Int): StreamShard =
    loadCached(Layout.streamShardPath(canonRoot, basin, sh), StreamShard())

  private def shardFor(basin: String,
                       stream: String): (java.nio.file.Path, StreamShard) = {
    val sh = Catalog.shardOf(stream)
    (Layout.streamShardPath(canonRoot, basin, sh), shard(basin, sh))
  }

  /** All of one basin's stream entries (64 cached shard loads). */
  private def basinStreams(basin: String): Iterator[StreamEntry] =
    (0 until NumShards).iterator.flatMap(sh => shard(basin, sh).streams)

  private def now(): Long = System.currentTimeMillis()

  /** Idempotency key = hash(requestToken, config) — ref resources.rs:69-103. */
  private def idemKey(token: String, config: Map[String, String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val payload = token + "\u0000" + config.toSeq.sorted.mkString("\u0001")
    md.digest(payload.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
  }

  // ---- basins ----

  def createBasin(name: String, config: BasinConfig = BasinConfig(),
                  requestToken: Option[String] = None): Either[String, BasinEntry] =
    lock.synchronized {
      if (!Caps.validBasinName(name)) Left(s"invalid basin name: $name")
      else {
        val enc = ConfigCodec.encodeBasin(config)
        val key = requestToken.map(idemKey(_, enc))
        mutateDoc(basinsPath, BasinsFile()) { st =>
          st.basins.find(b => b.name == name && b.deletedAt.isEmpty) match {
            case Some(existing) if key.isDefined && existing.idempotencyKey == key =>
              (None, Right(existing)) // idempotent retry
            case Some(_) => (None, Left("BasinAlreadyExists"))
            case None =>
              val e = BasinEntry(name, enc, now(), None, key)
              (Some(st.copy(basins = st.basins :+ e)), Right(e))
          }
        }
      }
    }

  def getBasin(name: String): Option[BasinEntry] =
    basinsFile().basins.find(b => b.name == name && b.deletedAt.isEmpty)

  def basinConfig(name: String): BasinConfig =
    getBasin(name).map(e => ConfigCodec.decodeBasin(e.config))
      .getOrElse(BasinConfig())

  /** Basin-level C3: create-or-update to the given config (PUT). */
  def ensureBasin(name: String, config: BasinConfig): Either[String, EnsureOutcome] =
    lock.synchronized {
      if (!Caps.validBasinName(name)) Left(s"invalid basin name: $name")
      else {
        val enc = ConfigCodec.encodeBasin(config)
        mutateDoc(basinsPath, BasinsFile()) { st =>
          st.basins.find(b => b.name == name && b.deletedAt.isEmpty) match {
            case Some(e) if e.config == enc => (None, Right(EnsureOutcome.Noop))
            case Some(e) =>
              (Some(st.copy(basins = st.basins.map(x =>
                if (x eq e) x.copy(config = enc) else x))),
                Right(EnsureOutcome.Updated))
            case None =>
              (Some(st.copy(basins = st.basins :+ BasinEntry(name, enc, now()))),
                Right(EnsureOutcome.Created))
          }
        }
      }
    }

  /** Basin-level C4: PATCH a live basin's config — the reference's
    * reconfigure_basin (lite/src/handlers/v1/basins.rs:264-274,
    * backend basins.rs:161-180); this is how create_stream_on_append
    * gets flipped without delete+recreate. Already-created streams are
    * unaffected; new defaults apply to later (auto-)creates.
    */
  def reconfigureBasin(name: String,
                       patch: BasinConfigPatch): Either[String, BasinConfig] =
    lock.synchronized {
      mutateDoc(basinsPath, BasinsFile()) { st =>
        st.basins.find(b => b.name == name && b.deletedAt.isEmpty) match {
          case None => (None, Left("BasinNotFound"))
          case Some(e) =>
            val updated = patch.applyTo(ConfigCodec.decodeBasin(e.config))
            (Some(st.copy(basins = st.basins.map(x =>
              if (x eq e) x.copy(config = ConfigCodec.encodeBasin(updated)) else x))),
              Right(updated))
        }
      }
    }

  // ---- streams ----

  /** C2: CreateOnly with idempotent retry on same token+config. */
  def createStream(basin: String, name: String,
                   config: StreamConfig = StreamConfig(),
                   requestToken: Option[String] = None): Either[String, StreamEntry] =
    basinLock(basin).synchronized {
      if (!Caps.validStreamName(name)) Left(s"invalid stream name: $name")
      else if (getBasin(basin).isEmpty) Left("BasinNotFound")
      else {
        val path = Layout.streamShardPath(canonRoot, basin, Catalog.shardOf(name))
        val enc = ConfigCodec.encode(config)
        val key = requestToken.map(idemKey(_, enc))
        mutateDoc(path, StreamShard()) { sh =>
          sh.streams.find(s => s.name == name && s.deletedAt.isEmpty) match {
            case Some(existing) if key.isDefined && existing.idempotencyKey == key =>
              (None, Right(existing))
            case Some(_) => (None, Left("StreamAlreadyExists"))
            case None =>
              val e = StreamEntry(basin, name, enc, now(), None, key)
              (Some(sh.copy(streams = sh.streams :+ e)), Right(e))
          }
        }
      }
    }

  /** Bulk create: at most one load + one save PER TOUCHED SHARD for N
    * streams (used by ingest auto-provisioning — per-stream
    * createStream would pay a shard rewrite N times). Existing live
    * streams are left untouched; invalid names are reported, valid
    * ones still commit.
    */
  def createStreams(basin: String, names: Seq[String],
                    config: StreamConfig = StreamConfig()): Either[String, Int] =
    basinLock(basin).synchronized {
      if (getBasin(basin).isEmpty) Left("BasinNotFound")
      else {
        val (valid0, invalid) = names.distinct.partition(Caps.validStreamName)
        val enc = ConfigCodec.encode(config)
        val t = now()
        var created = 0
        valid0.groupBy(Catalog.shardOf).foreach { case (shardNo, group) =>
          val path = Layout.streamShardPath(canonRoot, basin, shardNo)
          created += mutateDoc(path, StreamShard()) { sh =>
            val existing = sh.streams.iterator
              .filter(_.deletedAt.isEmpty).map(_.name).toSet
            val fresh = group.filterNot(existing)
            if (fresh.nonEmpty)
              (Some(sh.copy(streams = sh.streams ++
                fresh.map(n => StreamEntry(basin, n, enc, t)))), fresh.size)
            else (None, 0)
          }
        }
        if (invalid.nonEmpty) Left(s"invalid stream names: ${invalid.mkString(",")}")
        else Right(created)
      }
    }

  /** C3: create-or-update to the given config (PUT semantics). */
  def ensureStream(basin: String, name: String,
                   config: StreamConfig): Either[String, EnsureOutcome] =
    basinLock(basin).synchronized {
      if (getBasin(basin).isEmpty) Left("BasinNotFound")
      else {
        val path = Layout.streamShardPath(canonRoot, basin, Catalog.shardOf(name))
        val enc = ConfigCodec.encode(config)
        mutateDoc(path, StreamShard()) { sh =>
          sh.streams.find(s => s.name == name && s.deletedAt.isEmpty) match {
            case Some(e) if e.config == enc => (None, Right(EnsureOutcome.Noop))
            case Some(e) =>
              (Some(sh.copy(streams = sh.streams.map(x =>
                if (x eq e) x.copy(config = enc) else x))),
                Right(EnsureOutcome.Updated))
            case None =>
              (Some(sh.copy(streams = sh.streams :+
                StreamEntry(basin, name, enc, now()))),
                Right(EnsureOutcome.Created))
          }
        }
      }
    }

  /** C4: PATCH-style reconfigure via tri-state patch. */
  def reconfigureStream(basin: String, name: String,
                        patch: StreamConfigPatch): Either[String, StreamConfig] =
    basinLock(basin).synchronized {
      val path = Layout.streamShardPath(canonRoot, basin, Catalog.shardOf(name))
      mutateDoc(path, StreamShard()) { sh =>
        sh.streams.find(s => s.name == name && s.deletedAt.isEmpty) match {
          case None => (None, Left("StreamNotFound"))
          case Some(e) =>
            val updated = patch.applyTo(ConfigCodec.decode(e.config))
            (Some(sh.copy(streams = sh.streams.map(x =>
              if (x eq e) x.copy(config = ConfigCodec.encode(updated)) else x))),
              Right(updated))
        }
      }
    }

  /** C5: merged config (stream over basin defaults over system). */
  def streamConfig(basin: String, name: String): Option[StreamConfig] =
    getStream(basin, name)
      .map(e => ConfigCodec.decode(e.config)
        .mergedOver(basinConfig(basin).defaultStreamConfig)
        .mergedOver(StreamConfig.SystemDefault))

  def getStream(basin: String, name: String): Option[StreamEntry] =
    shardFor(basin, name)._2.streams
      .find(s => s.name == name && s.deletedAt.isEmpty)

  /** Bulk planning read: every LIVE stream's raw (unmerged) config in
    * one shard sweep — 64 cached/conditional-GET shard loads instead
    * of one point lookup per stream. The 10k-stream bulk-ingest
    * planning was paying 2 x 10k metadata round trips over an HTTP
    * endpoint for exactly this information (existence check + ts
    * config); merge over basin defaults caller-side like
    * [[streamConfig]] does. */
  def liveStreamConfigs(basin: String): Map[String, StreamConfig] =
    basinStreams(basin).filter(_.deletedAt.isEmpty)
      .map(e => e.name -> ConfigCodec.decode(e.config)).toMap

  /** C1: prefix + exclusive start_after + limit (≤1000), has_more.
    * Ref streams.rs:34-77, resources.rs:27-46.
    */
  def listStreams(basin: String, prefix: String = "",
                  startAfter: String = "", limit: Int = Caps.MaxListItems,
                  includeDeleted: Boolean = false): Page[StreamEntry] = {
    val n = math.min(limit, Caps.MaxListItems)
    // Bounded selection, not a full sort: keep the n+1 smallest
    // matching names in a size-capped max-heap while streaming the
    // (cached) shards. A page over a 100k-stream basin costs
    // O(streams * log page) with no page-sized^2 blowup across a full
    // pagination — and the shards themselves are parse-cached, so
    // page N is heap work over in-memory entries, not 64 re-parses
    // (CatalogShardSpec pins that with Catalog.parseTally).
    val heap = new java.util.PriorityQueue[StreamEntry](
      n + 1, Ordering.by[StreamEntry, String](_.name).reverse)
    basinStreams(basin).foreach { st =>
      if (st.name.startsWith(prefix) && st.name > startAfter &&
          (includeDeleted || st.deletedAt.isEmpty)) {
        if (heap.size < n + 1) heap.add(st)
        else if (st.name < heap.peek().name) { heap.poll(); heap.add(st) }
      }
    }
    val hasMore = heap.size > n
    if (hasMore) heap.poll() // drop the (n+1)-th sentinel
    val buf = new Array[StreamEntry](heap.size)
    var i = heap.size - 1
    while (i >= 0) { buf(i) = heap.poll(); i -= 1 } // max-heap drains descending
    Page(scala.collection.immutable.ArraySeq.unsafeWrapArray(buf), hasMore)
  }

  def listBasins(prefix: String = "", startAfter: String = "",
                 limit: Int = Caps.MaxListItems): Page[BasinEntry] = {
    val n = math.min(limit, Caps.MaxListItems)
    val all = basinsFile().basins
      .filter(b => b.name.startsWith(prefix) && b.name > startAfter &&
        b.deletedAt.isEmpty)
      .sortBy(_.name)
    Page(all.take(n), all.size > n)
  }

  // ---- locations (C8) ----
  //
  // The reference's surface is list/get-default/set-default over
  // account-level location rows (lite/src/handlers/v1/locations.rs:1-74;
  // types api/src/v1/location.rs). Lite itself stubs the handlers, so
  // the registry here is the minimal honest analog: locations are
  // config rows in the catalog, registered explicitly (the cloud
  // product provisions them account-level) and validated with the
  // reference's name rules (common/src/location.rs:8-45).

  private val locationsPath =
    java.nio.file.Paths.get(canonRoot, "_catalog", "locations.json")

  private def locationsFile(): LocationsFile =
    loadCached(locationsPath, LocationsFile())

  def listLocations(): Seq[LocationInfo] =
    locationsFile().locations.sortBy(_.name)

  /** Register a location (idempotent on same name+privacy). */
  def registerLocation(name: String,
                       isPrivate: Boolean = false): Either[String, LocationInfo] =
    lock.synchronized {
      if (!Caps.validLocationName(name)) Left(s"invalid location name: $name")
      else {
        mutateDoc(locationsPath, LocationsFile()) { st =>
          st.locations.find(_.name == name) match {
            case Some(l) if l.isPrivate == isPrivate => (None, Right(l))
            case Some(_) => (None, Left("LocationAlreadyExists"))
            case None =>
              val l = LocationInfo(name, isPrivate)
              (Some(st.copy(locations = st.locations :+ l)), Right(l))
          }
        }
      }
    }

  /** GET the default location; None until one is set. */
  def defaultLocation(): Option[LocationInfo] = {
    val st = locationsFile()
    st.default.flatMap(d => st.locations.find(_.name == d))
  }

  /** PUT the default location; must name a registered location. */
  def setDefaultLocation(name: String): Either[String, LocationInfo] =
    lock.synchronized {
      if (!Caps.validLocationName(name)) Left(s"invalid location name: $name")
      else {
        mutateDoc(locationsPath, LocationsFile()) { st =>
          st.locations.find(_.name == name) match {
            case None => (None, Left("LocationNotFound"))
            case Some(l) =>
              (Some(st.copy(default = Some(name))), Right(l))
          }
        }
      }
    }

  // ---- access tokens (C7 registry) ----
  //
  // The reference's serving surface is list/issue/revoke
  // (lite/src/handlers/v1/access_tokens.rs paths; lite stubs the
  // handlers — the cloud implements them). The registry persists
  // TokenEntry rows in one catalog file with the same mutateDoc
  // discipline as locations; authorization itself is the pure
  // model predicate (model/Access.scala), evaluated by callers.

  private val tokensPath =
    java.nio.file.Paths.get(canonRoot, "_catalog", "access_tokens.json")

  private def tokensFile(): TokensFile = loadCached(tokensPath, TokensFile())

  /** Issue: unique id (1-96 bytes, caps.rs MAX_ACCESS_TOKEN_ID_LEN);
    * auto_prefix_streams requires a prefix stream scope (api
    * access.rs:355-357 "which must be a prefix"). */
  def issueToken(t: graft.model.AccessToken): Either[String, TokenEntry] =
    lock.synchronized {
      if (!Caps.validAccessTokenId(t.id)) Left(s"invalid token id: ${t.id}")
      else if (t.autoPrefixStreams && !t.scope.streams.isInstanceOf[
        graft.model.ResourceSet.Prefix])
        Left("auto_prefix_streams requires a prefix stream scope")
      else mutateDoc(tokensPath, TokensFile()) { st =>
        st.tokens.find(_.id == t.id) match {
          case Some(_) => (None, Left("AccessTokenExists"))
          case None =>
            val e = TokenEntry.from(t, now())
            (Some(st.copy(tokens = st.tokens :+ e)), Right(e))
        }
      }
    }

  def getToken(id: String): Option[graft.model.AccessToken] =
    getTokenEntry(id).map(_.toToken)

  def getTokenEntry(id: String): Option[TokenEntry] =
    tokensFile().tokens.find(_.id == id)

  /** List with the standard prefix/start_after/limit page contract. */
  def listTokens(prefix: String = "", startAfter: String = "",
                 limit: Int = Caps.MaxListItems): Page[TokenEntry] = {
    val n = math.min(limit, Caps.MaxListItems)
    val all = tokensFile().tokens
      .filter(t => t.id.startsWith(prefix) && t.id > startAfter)
      .sortBy(_.id)
    Page(all.take(n), all.size > n)
  }

  /** Revoke: true when the token existed. */
  def revokeToken(id: String): Boolean = lock.synchronized {
    mutateDoc(tokensPath, TokensFile()) { st =>
      if (st.tokens.exists(_.id == id))
        (Some(st.copy(tokens = st.tokens.filterNot(_.id == id))), true)
      else (None, false)
    }
  }

  /** T4 part 1: soft delete (deleted_at set; physical reclaim is the
    * trim executor's job).
    */
  def markStreamDeleted(basin: String, name: String): Unit =
    basinLock(basin).synchronized {
      val path = Layout.streamShardPath(canonRoot, basin, Catalog.shardOf(name))
      mutateDoc(path, StreamShard()) { sh =>
        (Some(sh.copy(streams = sh.streams.map(s =>
          if (s.name == name && s.deletedAt.isEmpty)
            s.copy(deletedAt = Some(now())) else s))), ())
      }
    }

  /** Takes BOTH the basin-list lock and the basin's stream lock (in
    * that order — stream ops never take `lock`, so no cycle): a
    * createStream/ensureStream that already passed its liveness check
    * under basinLock finishes committing before the deletion lands,
    * and any later stream op observes deletedAt. Without the basin
    * lock, a stream could be committed into a just-deleted basin.
    */
  def markBasinDeleted(name: String): Unit = lock.synchronized {
    basinLock(name).synchronized {
      mutateDoc(basinsPath, BasinsFile()) { st =>
        (Some(st.copy(basins = st.basins.map(b =>
          if (b.name == name && b.deletedAt.isEmpty) b.copy(deletedAt = Some(now()))
          else b))), ())
      }
    }
  }

  def hardDeleteStream(basin: String, name: String): Unit =
    basinLock(basin).synchronized {
      val path = Layout.streamShardPath(canonRoot, basin, Catalog.shardOf(name))
      mutateDoc(path, StreamShard()) { sh =>
        (Some(sh.copy(streams = sh.streams.filterNot(_.name == name))), ())
      }
    }
}
