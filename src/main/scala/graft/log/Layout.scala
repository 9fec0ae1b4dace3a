package graft.log

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** On-disk layout of a stream store root:
  *
  * {{{
  * root/
  *   _catalog/basins.json                       — basin list
  *   _catalog/<basin>/streams-NN.json           — hash-sharded stream configs
  *   _state/<basin>/sNN/<escaped-stream>.json   — per-stream manifest
  *   data/basin=<basin>/stream=<escaped>/gen=N/ — record parquet files
  * }}}
  *
  * (Pre-shard roots used `_catalog/catalog.json` and a flat
  * `_state/<basin>/<escaped-stream>.json`; both are migrated — the
  * catalog eagerly at construction, manifests lazily per stream via
  * [[Layout.adoptLegacyState]].)
  *
  * The per-stream manifest is the analog of the reference's KV keys
  * StreamTailPosition / StreamFencingToken / StreamTrimPoint
  * (lite/src/backend/kv/mod.rs:73-83): the tail survives a full trim,
  * fencing token and trim point are recovered from it on open. All
  * manifest/catalog writes go through an atomic temp-file + rename, so
  * a committed manifest IS the durability barrier (SURVEY §4: commit =
  * durable replaces the reference's flush watermark machinery).
  */
object Layout {

  /** Escape a stream name into a pure-ASCII partition-path token.
    *
    * Escape char is `~` (`~XX` per UTF-8 byte) - deliberately NOT `%`:
    * `%` is in Spark's own partition-escaping set, so a `%`-encoded
    * value passed through `partitionBy` would be double-escaped.
    * `~` passes through Spark's writer verbatim, so directories written
    * via dynamic partitions and directories addressed by this layout
    * coincide, and non-ASCII names survive POSIX-locale filesystems.
    */
  def escape(name: String): String = {
    val sb = new StringBuilder
    name.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xff).toChar
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.')
        sb.append(c)
      else sb.append(f"~${b & 0xff}%02X")
    }
    sb.toString
  }

  def unescape(token: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < token.length) {
      val c = token.charAt(i)
      if (c == '~' && i + 3 <= token.length) {
        out.write(Integer.parseInt(token.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toInt); i += 1 }
    }
    new String(out.toByteArray, "UTF-8")
  }

  def dataDir(root: String, basin: String, stream: String): String =
    s"$root/data/basin=$basin/stream=${escape(stream)}"

  /** Generation subdirectory: the stream's live files sit under
    * `gen=<manifest.generation>`. Compaction writes the NEXT
    * generation beside the current one and flips the manifest pointer
    * (never moving or deleting live paths), so a reader plan created
    * before the flip keeps reading its old-generation file paths —
    * they stay on disk until the grace sweep — while every new plan
    * lists the new generation. The `gen=` spelling is deliberate:
    * basin-wide scans partition-discover it and prune by it.
    */
  def genDir(root: String, basin: String, stream: String, gen: Long): String =
    s"${dataDir(root, basin, stream)}/gen=$gen"

  /** All dirs a reader must list to see every durable row. Usually one
    * (the generation dir, or the legacy loose-file dir); TWO in the
    * interrupted-migration state — a crash mid-`migrateLegacyLocked`
    * leaves rows split between a partially-filled `gen=0` and leftover
    * loose files, and until some later write re-enters and finishes
    * the move, reads must take the union or silently lose the loose
    * remainder. Ordered legacy-first: the migration is an atomic
    * per-file rename, so a file a concurrent migration moves between
    * the two listings shows up in the gen=0 listing (callers dedupe by
    * file name preferring the later dir) rather than vanishing.
    *
    * Check order matters: gen-dir existence is sampled AFTER the
    * legacy listing. Sampling it before opens a race — a migration
    * that creates gen=0 and moves files between the two checks would
    * leave an unlocked reader seeing genExists=false + hasLoose=true
    * and serving ONLY the legacy dir, dropping the already-moved
    * files. Sampled after, any migration racing the listing has
    * necessarily created the gen dir by the time we look, so the
    * two-dir union covers its moves.
    */
  def resolveDataDirs(root: String, basin: String, stream: String,
                      gen: Long): Seq[String] = {
    val gd = genDir(root, basin, stream, gen)
    if (gen > 0) return Seq(gd)
    val legacy = Paths.get(dataDir(root, basin, stream))
    val hasLoose = Files.exists(legacy) && {
      val s = Files.list(legacy)
      try s.iterator().asScala.exists(p =>
        p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      finally s.close()
    }
    val genExists = Files.exists(Paths.get(gd))
    if (genExists && hasLoose) Seq(legacy.toString, gd)
    else if (hasLoose && !genExists) Seq(legacy.toString)
    else Seq(gd)
  }

  /** Hash-sharded like the catalog's stream shards, and for the same
    * physical reason at a different layer: every manifest commit
    * CREATES files in this directory (the CAS temp file + rename, the
    * lock file), and file creation serializes on the parent
    * directory's kernel mutex — with 50k streams in ONE `_state/
    * <basin>/` dir, a 48-way bulk-ingest commit loop convoys on that
    * mutex (measured: per-op thread time 20-40x the quiet syscall
    * cost). 64 shard dirs split the mutex 64 ways. Nothing ever LISTS
    * this tree (all access is by exact path through this function),
    * so the shape is free to choose for write concurrency. */
  def statePath(root: String, basin: String, stream: String): Path =
    Paths.get(root, "_state", basin, f"s${Catalog.shardOf(stream)}%02d",
      escape(stream) + ".json")

  /** Pre-shard (round <= 18) flat manifest location — read only by the
    * lazy migration below. */
  def legacyStatePath(root: String, basin: String, stream: String): Path =
    Paths.get(root, "_state", basin, escape(stream) + ".json")

  /** Lazy migration of a pre-shard manifest: when the sharded path is
    * absent but the flat legacy file exists, adopt it with an atomic
    * NON-replacing rename. Without this, a root written by an older
    * build reads every manifest as absent — tails reset to 0 and new
    * appends re-assign committed seq_nums (the catalog got an eager
    * one-time migration for the same transformation; manifests are
    * per-stream, so theirs is lazy and per-lookup).
    *
    * Races are settled by rename atomicity, no lock needed:
    *  - two adopters: one move wins, the loser's NoSuchFileException
    *    is swallowed and its caller re-reads the winner's file;
    *  - a concurrent writer that already created the sharded file
    *    (it would itself have adopted first, so this means the legacy
    *    file is a stale leftover of an interrupted r19-era run): the
    *    non-REPLACE move fails FileAlreadyExists and the stale flat
    *    file is parked, never clobbering the live manifest.
    *
    * Returns true iff the caller should re-read the sharded path.
    * POSIX-only physics (Files.move); object adapters guard on
    * supportsLegacyLayout and never call this.
    */
  def adoptLegacyState(root: String, basin: String, stream: String): Boolean = {
    val legacy = legacyStatePath(root, basin, stream)
    if (!Files.exists(legacy)) return false
    val sharded = statePath(root, basin, stream)

    def park(): Boolean = {
      // sharded manifest is live; park the stale flat file out of
      // the lookup path so this probe never re-fires
      try Files.move(legacy,
        legacy.resolveSibling(legacy.getFileName.toString + ".pre-shard"))
      catch { case _: java.io.IOException => () }
      false
    }

    // Deliberately NOT ATOMIC_MOVE: on Linux that flag maps straight to
    // rename(2), which silently REPLACES an existing target — exactly
    // the clobber this function must never do. The flag-less move keeps
    // rename atomicity on one filesystem but throws
    // FileAlreadyExistsException when the target is present. The
    // check-then-move window is closed by call order, not locks: every
    // commit path adopts BEFORE it can create the sharded file, so a
    // sharded file appearing concurrently was adopted from this same
    // legacy file — our move then fails NoSuchFile, never clobbering.
    if (Files.exists(sharded)) return park()
    try {
      Files.createDirectories(sharded.getParent)
      Files.move(legacy, sharded)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => park()
      case _: java.nio.file.NoSuchFileException => true // racer adopted it
      case _: java.io.IOException => false
    }
  }

  /** Manifest read with the lazy pre-shard adoption applied — the
    * entry point for POSIX-file readers outside StreamStore (the
    * streaming source plans against this). */
  def readManifestAdopting(root: String, basin: String,
                           stream: String): Option[StreamManifest] =
    readJson[StreamManifest](statePath(root, basin, stream)).orElse {
      if (adoptLegacyState(root, basin, stream))
        readJson[StreamManifest](statePath(root, basin, stream))
      else None
    }

  /** One bulk-ingest's private staged dir for a stream — sharded like
    * [[statePath]] so 32 staged-write tasks creating 50k stream dirs
    * don't convoy on one parent's kernel mutex (and the GC rmdirs
    * spread the same way). Private to the ingest that created
    * `stage`; never listed as a whole except by the GC sweep. */
  def stageDir(stage: String, basin: String, stream: String): String =
    s"$stage/basin=$basin/s${f"${Catalog.shardOf(stream)}%02d"}/stream=${escape(stream)}"

  /** Legacy (pre-shard) single-file catalog; read once for migration. */
  def catalogPath(root: String): Path =
    Paths.get(root, "_catalog", "catalog.json")

  /** Sharded control plane: one file for the basin list… */
  def basinsPath(root: String): Path =
    Paths.get(root, "_catalog", "basins.json")

  /** …and per-basin, hash-sharded stream files, so one stream's catalog
    * churn rewrites ~1/64th of one basin instead of the whole control
    * plane — the spirit of the reference's per-stream StreamMeta KV key
    * (lite/src/backend/kv/mod.rs:66-71) at file granularity.
    */
  def streamShardPath(root: String, basin: String, shard: Int): Path =
    Paths.get(root, "_catalog", escape(basin), f"streams-$shard%02d.json")

  implicit val formats: Formats = DefaultFormats

  /** Atomic JSON write: temp file in the same directory + atomic move. */
  def writeJson[A <: AnyRef](path: Path, value: A): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = Files.createTempFile(path.getParent, ".tmp", ".json")
    Files.writeString(tmp, Serialization.writePretty(value))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readJson[A: Manifest](path: Path): Option[A] =
    if (Files.exists(path))
      Some(JsonMethods.parse(Files.readString(path)).extract[A])
    else None

  def toJsonString[A <: AnyRef](value: A): String =
    Serialization.writePretty(value)

  def fromJsonString[A: Manifest](json: String): A =
    JsonMethods.parse(json).extract[A]
}

/** Durable per-stream state. `tailSeq`/`tailTs` = position of the next
  * record (never reset by trim); `trimPoint` = records below are
  * logically deleted (Long.MaxValue = terminal trim / stream deletion
  * pending, ref streamer.rs:872-884).
  */
final case class StreamManifest(
    tailSeq: Long = 0L,
    tailTs: Long = 0L,
    fencingToken: String = "",
    trimPoint: Long = 0L,
    deletionPending: Boolean = false,
    /** last streaming-ingest epoch committed for this stream (-1 =
      * none); makes micro-batch replay after a crash idempotent. */
    lastEpoch: Long = -1L,
    /** highest trim point already made physical by compaction — lets
      * the maintenance tick skip streams with nothing to reclaim (the
      * analog of the reference clearing StreamTrimPoint after the trim
      * executor runs, stream_trim.rs:120-152; our trimPoint must stay
      * as the monotone visibility floor, so reclamation is tracked
      * separately). Absent in old manifests ⇒ 0.
      */
    reclaimedTo: Long = 0L,
    /** current data generation — the `gen=N` subdirectory live reads
      * plan against. Bumped by compact() AFTER the rewritten files are
      * in place, so the flip is the commit point of a compaction and
      * old-generation paths outlive it for in-flight reader plans.
      * Absent in old manifests ⇒ 0.
      */
    generation: Long = 0L,
    version: Long = 0L)

/** Driver-side manifest read cache for the POSIX backend, keyed by
  * (mtime, size) — manifests are read on every append/read/metrics
  * call; with the cache a read is one stat(2) unless the file changed
  * (our own writers refresh eagerly; foreign processes are caught by
  * the mtime key). Since round 13 the cache stores the raw JSON plus
  * its content-hash etag (the POSIX stand-in for the object-store CAS
  * tag the commit protocol is written against); parsed manifests are
  * cached separately, keyed by etag, in [[ManifestCache.parse]].
  */
object ManifestCache {
  private val cache = scala.collection.concurrent.TrieMap
    .empty[String, (java.nio.file.attribute.FileTime, Long, String, String)]

  def etagOf(json: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(json.getBytes("UTF-8")).take(16)
      .map(b => f"${b & 0xff}%02x").mkString
  }

  /** Cached (json, etag); serves the cache when (mtime, size) match. */
  def read(path: Path): Option[(String, String)] = {
    if (!Files.exists(path)) { cache.remove(path.toString); return None }
    val ft = Files.getLastModifiedTime(path)
    val size = Files.size(path)
    cache.get(path.toString) match {
      case Some((t, s, json, etag)) if t == ft && s == size => Some((json, etag))
      case _ => readAt(path, ft, size)
    }
  }

  /** Authoritative (json, etag): always re-reads the bytes (commit
    * paths — a foreign write in the same mtime granule must be seen). */
  def readFresh(path: Path): Option[(String, String)] = {
    if (!Files.exists(path)) { cache.remove(path.toString); return None }
    readAt(path, Files.getLastModifiedTime(path), Files.size(path))
  }

  private def readAt(path: Path, ft: java.nio.file.attribute.FileTime,
                     size: Long): Option[(String, String)] =
    try {
      val json = Files.readString(path)
      val etag = etagOf(json)
      // keyed by the PRE-read stat: a replacement landing while we
      // read mismatches on the next stat and re-reads (see Catalog
      // .loadCached for the rationale)
      cache.put(path.toString, (ft, size, json, etag))
      Some((json, etag))
    } catch { case _: java.nio.file.NoSuchFileException => None }

  /** Refresh after our own atomic write; returns the etag. */
  def refresh(path: Path, json: String): String = {
    val etag = etagOf(json)
    cache.put(path.toString,
      (Files.getLastModifiedTime(path), Files.size(path), json, etag))
    etag
  }

  /** Test seam: prime the cache with a (possibly stale) manifest
    * against the file's CURRENT attributes — the deterministic
    * reproduction of the same-mtime-granule stale-serve corner
    * (GenerationSpec, StreamStoreSpec). */
  def put(path: Path, m: StreamManifest): Unit = {
    val json = Layout.toJsonString(m)
    cache.put(path.toString,
      (Files.getLastModifiedTime(path), Files.size(path), json, etagOf(json)))
  }

  /** Drop the entry (stream deleted). */
  def invalidate(path: Path): Unit = { cache.remove(path.toString); () }

  /** Parse cache keyed by etag (content-addressed, so a stale install
    * can never serve wrong content — at worst it costs a re-parse).
    * One entry per path. */
  private val parsed = scala.collection.concurrent.TrieMap
    .empty[String, (String, StreamManifest)]

  def parse(key: String, meta: Option[(String, String)]): StreamManifest =
    meta match {
      case None => StreamManifest()
      case Some((json, etag)) =>
        parsed.get(key) match {
          case Some((e, m)) if e == etag => m
          case _ =>
            val m = Layout.fromJsonString[StreamManifest](json)
            parsed.put(key, (etag, m))
            m
        }
    }
}
