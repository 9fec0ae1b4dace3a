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

final case class CatalogState(
    basins: List[BasinEntry] = Nil,
    streams: List[StreamEntry] = Nil)

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
          "create_stream_on_read" -> c.createStreamOnRead.toString)

  def decodeBasin(m: Map[String, String]): BasinConfig = BasinConfig(
    decode(m),
    m.get("create_stream_on_append").exists(_.toBoolean),
    m.get("create_stream_on_read").exists(_.toBoolean))
}

/** Control-plane catalog (SURVEY §2.4, C1-C6): basins and streams with
  * create/ensure/reconfigure/list/delete. Single-writer via a process
  * lock + atomic file swap — the analog of the reference's serialized
  * catalog transactions (lite/src/backend/streams.rs:89,284).
  */
final class Catalog(root: String) {
  private val lock = new Object
  private val path = Layout.catalogPath(root)

  /** Parsed-state cache keyed by (mtime, size) of the catalog file.
    * Every control-plane call used to re-parse the full JSON — an
    * O(catalog) driver cost on the append ack path at 10k+ streams.
    * With the cache a load is one stat(2) unless another process wrote
    * the file (same-JVM writers refresh the cache in save()).
    */
  @volatile private var cached: (Long, Long, CatalogState) = null

  private def load(): CatalogState = {
    if (!Files.exists(path)) return CatalogState()
    val mtime = Files.getLastModifiedTime(path).toMillis
    val size = Files.size(path)
    val c = cached
    if (c != null && c._1 == mtime && c._2 == size) c._3
    else {
      val st = Layout.readJson[CatalogState](path).getOrElse(CatalogState())
      cached = (mtime, size, st)
      st
    }
  }

  private def save(s: CatalogState): Unit = {
    Layout.writeJson(path, s)
    cached = (Files.getLastModifiedTime(path).toMillis, Files.size(path), s)
  }

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
        val st = load()
        val enc = ConfigCodec.encodeBasin(config)
        val key = requestToken.map(idemKey(_, enc))
        st.basins.find(b => b.name == name && b.deletedAt.isEmpty) match {
          case Some(existing) if key.isDefined && existing.idempotencyKey == key =>
            Right(existing) // idempotent retry
          case Some(_) => Left("BasinAlreadyExists")
          case None =>
            val e = BasinEntry(name, enc, now(), None, key)
            save(st.copy(basins = st.basins :+ e))
            Right(e)
        }
      }
    }

  def getBasin(name: String): Option[BasinEntry] =
    load().basins.find(b => b.name == name && b.deletedAt.isEmpty)

  def basinConfig(name: String): BasinConfig =
    getBasin(name).map(e => ConfigCodec.decodeBasin(e.config))
      .getOrElse(BasinConfig())

  /** Basin-level C3: create-or-update to the given config (PUT). */
  def ensureBasin(name: String, config: BasinConfig): Either[String, EnsureOutcome] =
    lock.synchronized {
      if (!Caps.validBasinName(name)) Left(s"invalid basin name: $name")
      else {
        val st = load()
        val enc = ConfigCodec.encodeBasin(config)
        st.basins.find(b => b.name == name && b.deletedAt.isEmpty) match {
          case Some(e) if e.config == enc => Right(EnsureOutcome.Noop)
          case Some(e) =>
            save(st.copy(basins = st.basins.map(x =>
              if (x eq e) x.copy(config = enc) else x)))
            Right(EnsureOutcome.Updated)
          case None =>
            save(st.copy(basins = st.basins :+ BasinEntry(name, enc, now())))
            Right(EnsureOutcome.Created)
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
      val st = load()
      st.basins.find(b => b.name == name && b.deletedAt.isEmpty) match {
        case None => Left("BasinNotFound")
        case Some(e) =>
          val updated = patch.applyTo(ConfigCodec.decodeBasin(e.config))
          save(st.copy(basins = st.basins.map(x =>
            if (x eq e) x.copy(config = ConfigCodec.encodeBasin(updated)) else x)))
          Right(updated)
      }
    }

  // ---- streams ----

  /** C2: CreateOnly with idempotent retry on same token+config. */
  def createStream(basin: String, name: String,
                   config: StreamConfig = StreamConfig(),
                   requestToken: Option[String] = None): Either[String, StreamEntry] =
    lock.synchronized {
      if (!Caps.validStreamName(name)) Left(s"invalid stream name: $name")
      else if (getBasin(basin).isEmpty) Left("BasinNotFound")
      else {
        val st = load()
        val enc = ConfigCodec.encode(config)
        val key = requestToken.map(idemKey(_, enc))
        st.streams.find(s => s.basin == basin && s.name == name && s.deletedAt.isEmpty) match {
          case Some(existing) if key.isDefined && existing.idempotencyKey == key =>
            Right(existing)
          case Some(_) => Left("StreamAlreadyExists")
          case None =>
            val e = StreamEntry(basin, name, enc, now(), None, key)
            save(st.copy(streams = st.streams :+ e))
            Right(e)
        }
      }
    }

  /** Bulk create: one load + one save for N streams (used by ingest
    * auto-provisioning — per-stream createStream would rewrite the
    * whole catalog N times). Existing live streams are left untouched;
    * invalid names are reported, valid ones still commit.
    */
  def createStreams(basin: String, names: Seq[String],
                    config: StreamConfig = StreamConfig()): Either[String, Int] =
    lock.synchronized {
      if (getBasin(basin).isEmpty) Left("BasinNotFound")
      else {
        val st = load()
        val existing = st.streams.iterator
          .filter(s => s.basin == basin && s.deletedAt.isEmpty)
          .map(_.name).toSet
        val (valid, invalid) = names.distinct.filterNot(existing)
          .partition(Caps.validStreamName)
        val enc = ConfigCodec.encode(config)
        val t = now()
        if (valid.nonEmpty)
          save(st.copy(streams = st.streams ++
            valid.map(n => StreamEntry(basin, n, enc, t))))
        if (invalid.nonEmpty) Left(s"invalid stream names: ${invalid.mkString(",")}")
        else Right(valid.size)
      }
    }

  /** C3: create-or-update to the given config (PUT semantics). */
  def ensureStream(basin: String, name: String,
                   config: StreamConfig): Either[String, EnsureOutcome] =
    lock.synchronized {
      if (getBasin(basin).isEmpty) Left("BasinNotFound")
      else {
        val st = load()
        val enc = ConfigCodec.encode(config)
        st.streams.find(s => s.basin == basin && s.name == name && s.deletedAt.isEmpty) match {
          case Some(e) if e.config == enc => Right(EnsureOutcome.Noop)
          case Some(e) =>
            save(st.copy(streams = st.streams.map(x =>
              if (x eq e) x.copy(config = enc) else x)))
            Right(EnsureOutcome.Updated)
          case None =>
            save(st.copy(streams = st.streams :+
              StreamEntry(basin, name, enc, now())))
            Right(EnsureOutcome.Created)
        }
      }
    }

  /** C4: PATCH-style reconfigure via tri-state patch. */
  def reconfigureStream(basin: String, name: String,
                        patch: StreamConfigPatch): Either[String, StreamConfig] =
    lock.synchronized {
      val st = load()
      st.streams.find(s => s.basin == basin && s.name == name && s.deletedAt.isEmpty) match {
        case None => Left("StreamNotFound")
        case Some(e) =>
          val updated = patch.applyTo(ConfigCodec.decode(e.config))
          save(st.copy(streams = st.streams.map(x =>
            if (x eq e) x.copy(config = ConfigCodec.encode(updated)) else x)))
          Right(updated)
      }
    }

  /** C5: merged config (stream over basin defaults over system). */
  def streamConfig(basin: String, name: String): Option[StreamConfig] =
    load().streams.find(s => s.basin == basin && s.name == name && s.deletedAt.isEmpty)
      .map(e => ConfigCodec.decode(e.config)
        .mergedOver(basinConfig(basin).defaultStreamConfig)
        .mergedOver(StreamConfig.SystemDefault))

  def getStream(basin: String, name: String): Option[StreamEntry] =
    load().streams.find(s => s.basin == basin && s.name == name && s.deletedAt.isEmpty)

  /** C1: prefix + exclusive start_after + limit (≤1000), has_more.
    * Ref streams.rs:34-77, resources.rs:27-46.
    */
  def listStreams(basin: String, prefix: String = "",
                  startAfter: String = "", limit: Int = Caps.MaxListItems,
                  includeDeleted: Boolean = false): Page[StreamEntry] = {
    val n = math.min(limit, Caps.MaxListItems)
    val all = load().streams
      .filter(s => s.basin == basin && s.name.startsWith(prefix) &&
        s.name > startAfter && (includeDeleted || s.deletedAt.isEmpty))
      .sortBy(_.name)
    Page(all.take(n), all.size > n)
  }

  def listBasins(prefix: String = "", startAfter: String = "",
                 limit: Int = Caps.MaxListItems): Page[BasinEntry] = {
    val n = math.min(limit, Caps.MaxListItems)
    val all = load().basins
      .filter(b => b.name.startsWith(prefix) && b.name > startAfter &&
        b.deletedAt.isEmpty)
      .sortBy(_.name)
    Page(all.take(n), all.size > n)
  }

  /** T4 part 1: soft delete (deleted_at set; physical reclaim is the
    * trim executor's job).
    */
  def markStreamDeleted(basin: String, name: String): Unit = lock.synchronized {
    val st = load()
    save(st.copy(streams = st.streams.map(s =>
      if (s.basin == basin && s.name == name && s.deletedAt.isEmpty)
        s.copy(deletedAt = Some(now())) else s)))
  }

  def markBasinDeleted(name: String): Unit = lock.synchronized {
    val st = load()
    save(st.copy(basins = st.basins.map(b =>
      if (b.name == name && b.deletedAt.isEmpty) b.copy(deletedAt = Some(now()))
      else b)))
  }

  def hardDeleteStream(basin: String, name: String): Unit = lock.synchronized {
    val st = load()
    save(st.copy(streams = st.streams.filterNot(s =>
      s.basin == basin && s.name == name)))
  }
}
