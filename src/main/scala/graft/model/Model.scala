package graft.model

/** Core data model of the stream engine.
  *
  * Semantics mirror the reference implementation (s2-streamstore/s2):
  * basins, streams, records (envelope | command), positions, metered
  * sizes and hard caps. See SURVEY.md §1. Reference anchors cited as
  * file:line point into /root/reference.
  */

/** A record header: raw name/value byte pairs. Names may repeat; order
  * is preserved. Ref: common/src/record/mod.rs:53-57.
  */
final case class Header(name: Array[Byte], value: Array[Byte]) {
  override def equals(o: Any): Boolean = o match {
    case h: Header =>
      java.util.Arrays.equals(name, h.name) &&
        java.util.Arrays.equals(value, h.value)
    case _ => false
  }
  override def hashCode: Int =
    31 * java.util.Arrays.hashCode(name) + java.util.Arrays.hashCode(value)
}

object Header {
  def utf8(name: String, value: String): Header =
    Header(name.getBytes("UTF-8"), value.getBytes("UTF-8"))
}

/** Position of a record in a stream. The stream *tail* is the position
  * of the next record to be assigned. Ref: common/src/record/mod.rs:14-29.
  */
final case class StreamPosition(seqNum: Long, timestamp: Long)

/** A not-yet-sequenced record body: envelope (data) or command. */
sealed trait Record {
  def meteredSize: Long
}

/** Data record: headers + opaque body.
  * Ref: common/src/record/envelope.rs:19-24.
  */
final case class EnvelopeRecord(headers: Seq[Header], body: Array[Byte])
    extends Record {
  /** 8 + 2*#headers + sum(len(name)+len(value)) + len(body).
    * Ref: common/src/record/envelope.rs:74-78.
    */
  def meteredSize: Long =
    8L + 2L * headers.size +
      headers.iterator.map(h => h.name.length.toLong + h.value.length).sum +
      body.length
}

/** In-band command: fence (set fencing token) or trim (drop prefix).
  * Wire form: exactly one header with empty name, value = op id, body =
  * payload. Ref: common/src/record/command.rs:39-43, record/mod.rs:89-103.
  */
sealed trait CommandRecord extends Record {
  def opId: String
  def payload: Array[Byte]
  /** 8 + 2 + len(op_id) + len(payload). Ref: command.rs:54-63. */
  def meteredSize: Long = 8L + 2L + opId.length + payload.length
  def toEnvelopeForm: EnvelopeRecord =
    EnvelopeRecord(Seq(Header(Array.emptyByteArray, opId.getBytes("UTF-8"))), payload)
}

final case class FenceCommand(token: String) extends CommandRecord {
  require(Caps.validFencingToken(token), s"invalid fencing token: $token")
  def opId = "fence"
  def payload: Array[Byte] = token.getBytes("UTF-8")
}

final case class TrimCommand(seqNum: Long) extends CommandRecord {
  def opId = "trim"
  /** 8-byte big-endian seq_num. Ref: command.rs:80-108. */
  def payload: Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(seqNum).array()
}

object CommandRecord {
  /** Detect + decode the command encoded as an envelope: exactly one
    * header, empty name. Ref: record/mod.rs:89-103.
    */
  def fromEnvelopeForm(e: EnvelopeRecord): Option[CommandRecord] =
    if (e.headers.size == 1 && e.headers.head.name.isEmpty) {
      new String(e.headers.head.value, "UTF-8") match {
        case "fence" =>
          val t = new String(e.body, "UTF-8")
          if (Caps.validFencingToken(t)) Some(FenceCommand(t)) else None
        case "trim" if e.body.length == 8 =>
          Some(TrimCommand(java.nio.ByteBuffer.wrap(e.body).getLong))
        case _ => None
      }
    } else None
}

/** A record after sequencing. Ref: common/src/record/mod.rs:120-152. */
final case class SequencedRecord(
    position: StreamPosition,
    headers: Seq[Header],
    body: Array[Byte]) {
  def seqNum: Long = position.seqNum
  def timestamp: Long = position.timestamp
}

/** Hard caps. Ref: common/src/caps.rs. */
object Caps {
  val MaxBatchRecords = 1000            // caps.rs:10
  val MaxBatchMeteredBytes = 1024 * 1024L // caps.rs:12-13 (1 MiB)
  val MaxRecordMeteredBytes = 1024 * 1024L
  val MaxListItems = 1000               // resources.rs:27-46
  val MaxFencingTokenBytes = 36         // record/fencing.rs:7
  val MinBasinNameLen = 8
  val MaxBasinNameLen = 48              // caps.rs:1-2
  val MaxStreamNameBytes = 512          // caps.rs:5-6
  val MaxLocationNameLen = 64           // caps.rs MAX_LOCATION_NAME_LEN

  def validFencingToken(t: String): Boolean =
    t.getBytes("UTF-8").length <= MaxFencingTokenBytes

  /** Basin: 8-48 chars, lowercase alnum + hyphen, alnum at both ends.
    * Ref: common/src/basin.rs:33-71.
    */
  def validBasinName(n: String): Boolean =
    n.length >= MinBasinNameLen && n.length <= MaxBasinNameLen &&
      n.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '-') &&
      n.head != '-' && n.last != '-'

  /** Stream: 1-512 bytes, not "." or "..". Ref: common/src/stream.rs:28-47. */
  def validStreamName(n: String): Boolean = {
    val len = n.getBytes("UTF-8").length
    len >= 1 && len <= MaxStreamNameBytes && n != "." && n != ".."
  }

  /** Access token id: 1-96 bytes (caps.rs MAX_ACCESS_TOKEN_ID_LEN). */
  def validAccessTokenId(id: String): Boolean = {
    val len = id.getBytes("UTF-8").length
    len >= 1 && len <= 96
  }

  /** Location: 1-64 chars of ASCII alnum + `:` `-` `.` (uppercase
    * allowed, multibyte rejected). Ref: common/src/location.rs:8-45.
    */
  def validLocationName(n: String): Boolean =
    n.length >= 1 && n.length <= MaxLocationNameLen &&
      n.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == ':' || c == '-' || c == '.')

  /** Batch validation for both append and read emission.
    * Ref: common/src/stream.rs:213-223,251-269.
    */
  def validateBatch(records: Seq[Record]): Either[String, Unit] = {
    if (records.isEmpty) Left("batch must be non-empty")
    else if (records.size > MaxBatchRecords)
      Left(s"batch exceeds $MaxBatchRecords records")
    else {
      records.find(_.meteredSize > MaxRecordMeteredBytes) match {
        case Some(_) => Left("record exceeds 1 MiB metered size")
        case None =>
          if (records.iterator.map(_.meteredSize).sum > MaxBatchMeteredBytes)
            Left("batch exceeds 1 MiB metered size")
          else records.collectFirst {
            // An empty header NAME is the command marker on the wire
            // (record/mod.rs:89-103): in any other shape the reference
            // rejects it at validation (envelope.rs:128-129 NameEmpty)
            // — and so must we, because downstream dispatch (A13
            // encrypt-vs-plaintext, R10 command filtering) classifies
            // records by that shape; an accepted empty-name USER
            // record would be stored cleartext on an encrypted basin
            // and silently dropped by ignoreCommands reads.
            case e: EnvelopeRecord
                if e.headers.exists(_.name.isEmpty) &&
                  CommandRecord.fromEnvelopeForm(e).isEmpty =>
              Left("empty header name (reserved for command records)")
          }.getOrElse(Right(()))
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Configuration model. Ref: common/src/config.rs.
// ---------------------------------------------------------------------------

sealed trait StorageClass
object StorageClass {
  case object Standard extends StorageClass
  case object Express extends StorageClass // default; config.rs:46-52
}

sealed trait RetentionPolicy
object RetentionPolicy {
  /** age in seconds, > 0. Default 7 days. Ref: config.rs:54-84. */
  final case class Age(seconds: Long) extends RetentionPolicy {
    require(seconds > 0, "retention age must be > 0")
  }
  case object Infinite extends RetentionPolicy
  val Default: RetentionPolicy = Age(7L * 24 * 3600)
}

sealed trait TimestampingMode
object TimestampingMode {
  /** Use client timestamp when present, else arrival time. */
  case object ClientPrefer extends TimestampingMode
  /** Error when client timestamp missing. */
  case object ClientRequire extends TimestampingMode
  /** Always arrival time. */
  case object Arrival extends TimestampingMode
}

/** Ref: config.rs:86-98. */
final case class Timestamping(
    mode: TimestampingMode = TimestampingMode.ClientPrefer,
    uncapped: Boolean = false)

/** minAge seconds; 0 = disabled. Ref: config.rs:100-109. */
final case class DeleteOnEmpty(minAgeSeconds: Long = 0)

final case class StreamConfig(
    storageClass: Option[StorageClass] = None,
    retentionPolicy: Option[RetentionPolicy] = None,
    timestamping: Option[Timestamping] = None,
    deleteOnEmpty: Option[DeleteOnEmpty] = None) {

  /** Layer this config over `defaults` (field-wise). Ref: config.rs:260-281. */
  def mergedOver(defaults: StreamConfig): StreamConfig = StreamConfig(
    storageClass.orElse(defaults.storageClass),
    retentionPolicy.orElse(defaults.retentionPolicy),
    timestamping.orElse(defaults.timestamping),
    deleteOnEmpty.orElse(defaults.deleteOnEmpty))

  def storageClassOrDefault: StorageClass =
    storageClass.getOrElse(StorageClass.Express)
  def retentionOrDefault: RetentionPolicy =
    retentionPolicy.getOrElse(RetentionPolicy.Default)
  def timestampingOrDefault: Timestamping =
    timestamping.getOrElse(Timestamping())
  def deleteOnEmptyOrDefault: DeleteOnEmpty =
    deleteOnEmpty.getOrElse(DeleteOnEmpty(0))
}

object StreamConfig {
  val SystemDefault: StreamConfig = StreamConfig(
    Some(StorageClass.Express),
    Some(RetentionPolicy.Default),
    Some(Timestamping()),
    Some(DeleteOnEmpty(0)))
}

/** PATCH-style tri-state: absent (keep), set-to-default (clear), set(v).
  * Ref: config.rs:119-136 (`Maybe<Option<T>>`).
  */
sealed trait Patch[+T]
object Patch {
  case object Keep extends Patch[Nothing]
  case object Clear extends Patch[Nothing]
  final case class Set[T](value: T) extends Patch[T]

  def apply[T](p: Patch[T], current: Option[T]): Option[T] = p match {
    case Keep => current
    case Clear => None
    case Set(v) => Some(v)
  }
}

final case class StreamConfigPatch(
    storageClass: Patch[StorageClass] = Patch.Keep,
    retentionPolicy: Patch[RetentionPolicy] = Patch.Keep,
    timestamping: Patch[Timestamping] = Patch.Keep,
    deleteOnEmpty: Patch[DeleteOnEmpty] = Patch.Keep) {
  def applyTo(c: StreamConfig): StreamConfig = StreamConfig(
    Patch(storageClass, c.storageClass),
    Patch(retentionPolicy, c.retentionPolicy),
    Patch(timestamping, c.timestamping),
    Patch(deleteOnEmpty, c.deleteOnEmpty))
}

final case class BasinConfig(
    defaultStreamConfig: StreamConfig = StreamConfig(),
    createStreamOnAppend: Boolean = false,
    createStreamOnRead: Boolean = false,
    /** Record cipher for the basin's streams (config.rs:323
      * `stream_cipher`); key material still arrives per-call. None =
      * plaintext even when a key is supplied (encryption.rs resolve).
      */
    streamCipher: Option[graft.log.CipherAlgo] = None)

/** PATCH-style basin reconfigure — how `create_stream_on_append` gets
  * flipped on a live basin (lite/src/handlers/v1/basins.rs:264-274,
  * backend basins.rs:161-180). The stream-default sub-config reuses the
  * C4 tri-state patch; Clear on a flag restores its default (false).
  */
final case class BasinConfigPatch(
    defaultStreamConfig: StreamConfigPatch = StreamConfigPatch(),
    createStreamOnAppend: Patch[Boolean] = Patch.Keep,
    createStreamOnRead: Patch[Boolean] = Patch.Keep,
    streamCipher: Patch[graft.log.CipherAlgo] = Patch.Keep) {
  def applyTo(c: BasinConfig): BasinConfig = BasinConfig(
    defaultStreamConfig.applyTo(c.defaultStreamConfig),
    Patch(createStreamOnAppend, Some(c.createStreamOnAppend)).getOrElse(false),
    Patch(createStreamOnRead, Some(c.createStreamOnRead)).getOrElse(false),
    Patch(streamCipher, c.streamCipher))
}

// ---------------------------------------------------------------------------
// Read model. Ref: common/src/stream.rs:309-340, common/src/read_extent.rs.
// ---------------------------------------------------------------------------

sealed trait ReadFrom
object ReadFrom {
  final case class SeqNum(n: Long) extends ReadFrom
  final case class Timestamp(t: Long) extends ReadFrom
  /** `tail - k`, saturating at 0. */
  final case class TailOffset(k: Long) extends ReadFrom
}

final case class ReadStart(from: ReadFrom, clamp: Boolean = false)

/** Count/bytes read limits; a record is included only if it fits BOTH
  * remaining count and remaining metered bytes.
  * Ref: common/src/read_extent.rs:18-136.
  */
final case class ReadLimit(count: Option[Long] = None, bytes: Option[Long] = None) {
  def admits(consumedCount: Long, consumedBytes: Long, recordBytes: Long): Boolean =
    count.forall(c => consumedCount < c) &&
      bytes.forall(b => consumedBytes + recordBytes <= b)
}

final case class ReadEnd(
    limit: ReadLimit = ReadLimit(),
    /** exclusive: stop before first record with timestamp >= until.
      * Ref: read_extent.rs:138-176. */
    until: Option[Long] = None)

final case class ReadSpec(start: ReadStart, end: ReadEnd = ReadEnd())

// ---------------------------------------------------------------------------
// Append model. Ref: common/src/stream.rs:289-301.
// ---------------------------------------------------------------------------

final case class AppendInput(
    records: Seq[Record],
    /** CAS: reject unless equal to the first assigned seq_num. */
    matchSeqNum: Option[Long] = None,
    fencingToken: Option[String] = None,
    /** client-provided timestamps aligned with records (None = unset) */
    clientTimestamps: Seq[Option[Long]] = Seq.empty)

final case class AppendAck(start: StreamPosition, end: StreamPosition, tail: StreamPosition)

sealed trait AppendError
object AppendError {
  final case class SeqNumMismatch(expected: Long, actual: Long) extends AppendError
  final case class FencingTokenMismatch(current: String) extends AppendError
  case object TimestampMissing extends AppendError
  final case class InvalidBatch(reason: String) extends AppendError
  /** Basin has a stream_cipher configured but key material is missing
    * or malformed (common/src/encryption.rs:91-104). */
  final case class EncryptionError(reason: String) extends AppendError
  case object StreamDeletionPending extends AppendError
  /** C6: the stream does not exist and the basin does not opt into
    * create_stream_on_append (ref core.rs:326-391). */
  case object StreamNotFound extends AppendError
}
