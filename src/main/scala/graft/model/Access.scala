package graft.model

/** C7 — access-token scope model (common/src/access.rs:132-244).
  *
  * Lite itself returns NotImplemented for token serving; the MODEL is
  * what carries semantics: resource sets (none/exact/prefix) per
  * basins/streams/tokens, read/write op groups, an explicit op set,
  * and auto_prefix_streams. Authorization is plain predicate
  * evaluation — no Spark needed (SURVEY §2.4).
  */
sealed trait ResourceSet {
  /** Does this set contain `name`? */
  def matches(name: String): Boolean = this match {
    case ResourceSet.None => false
    case ResourceSet.Exact(v) => name == v
    case ResourceSet.Prefix(p) => name.startsWith(p)
  }
}
object ResourceSet {
  case object None extends ResourceSet
  final case class Exact(value: String) extends ResourceSet
  /** Empty prefix matches everything. */
  final case class Prefix(prefix: String) extends ResourceSet

  /** Is every name `a` matches also matched by `b`? (None ⊆ all;
    * Exact(v) ⊆ b iff b matches v; Prefix(p) ⊆ Prefix(q) iff q is a
    * prefix of p — a prefix set is never inside an exact set.) */
  def subset(a: ResourceSet, b: ResourceSet): Boolean = (a, b) match {
    case (None, _) => true
    case (Exact(v), _) => b.matches(v)
    case (Prefix(p), Prefix(q)) => p.startsWith(q)
    case (Prefix(_), _) => false
  }
}

/** The 24 operations of the reference API surface (access.rs op enum). */
object Op extends Enumeration {
  val ListBasins, CreateBasin, DeleteBasin, ReconfigureBasin, GetBasinConfig,
      IssueAccessToken, RevokeAccessToken, ListAccessTokens,
      ListStreams, CreateStream, DeleteStream, GetStreamConfig,
      ReconfigureStream, CheckTail, Append, Read, Trim, Fence,
      AccountMetrics, BasinMetrics, StreamMetrics,
      ListLocations, GetLocation, SetDefaultLocation = Value

  val ReadGroup: Set[Value] = Set(ListBasins, GetBasinConfig, ListAccessTokens,
    ListStreams, GetStreamConfig, CheckTail, Read,
    AccountMetrics, BasinMetrics, StreamMetrics, ListLocations, GetLocation)
  val WriteGroup: Set[Value] = values.toSet -- ReadGroup

  /** Level scoping for the three op-group rows (access.rs
    * PermittedOperationGroups { account, basin, stream }): basin-level
    * groups cover stream management + basin metrics; stream-level
    * groups cover the data plane on a stream; the account row covers
    * everything (the top of the hierarchy). */
  val BasinLevel: Set[Value] = Set(ListStreams, CreateStream, DeleteStream,
    GetStreamConfig, ReconfigureStream, BasinMetrics)
  val StreamLevel: Set[Value] = Set(CheckTail, Append, Read, Trim, Fence,
    StreamMetrics)
}

/** Per-level read/write rows (common access.rs:206-217
  * PermittedOperationGroups { account, basin, stream:
  * ReadWritePermissions }). The account row spans all operations;
  * basin/stream rows span only their level's ops (Op.BasinLevel /
  * Op.StreamLevel).
  */
final case class PermittedOperationGroups(
    accountRead: Boolean = false, accountWrite: Boolean = false,
    basinRead: Boolean = false, basinWrite: Boolean = false,
    streamRead: Boolean = false, streamWrite: Boolean = false)

final case class AccessTokenScope(
    basins: ResourceSet = ResourceSet.None,
    streams: ResourceSet = ResourceSet.None,
    accessTokens: ResourceSet = ResourceSet.None,
    opGroups: PermittedOperationGroups = PermittedOperationGroups(),
    /** explicit op allow-list; empty = defer to groups */
    ops: Set[Op.Value] = Set.empty) {

  /** Union of explicit ops and group grants (api access.rs:383-384). */
  def allowsOp(op: Op.Value): Boolean =
    ops.contains(op) ||
      (opGroups.accountRead && Op.ReadGroup(op)) ||
      (opGroups.accountWrite && Op.WriteGroup(op)) ||
      (opGroups.basinRead && Op.BasinLevel(op) && Op.ReadGroup(op)) ||
      (opGroups.basinWrite && Op.BasinLevel(op) && Op.WriteGroup(op)) ||
      (opGroups.streamRead && Op.StreamLevel(op) && Op.ReadGroup(op)) ||
      (opGroups.streamWrite && Op.StreamLevel(op) && Op.WriteGroup(op))

  /** Scope subsetting for token issuance: a token may only mint
    * tokens whose effective grant is contained in its own — every
    * resource set inside the issuer's, every allowed operation also
    * allowed for the issuer. Without this, ops={IssueAccessToken}
    * alone is indirect full account access.
    */
  def within(outer: AccessTokenScope): Boolean =
    ResourceSet.subset(basins, outer.basins) &&
      ResourceSet.subset(streams, outer.streams) &&
      ResourceSet.subset(accessTokens, outer.accessTokens) &&
      Op.values.forall(op => !allowsOp(op) || outer.allowsOp(op))
}

final case class AccessToken(
    id: String,
    scope: AccessTokenScope,
    expiresAtMs: Option[Long] = None,
    /** if set, stream scope is interpreted as a forced prefix on every
      * stream the token touches (access.rs auto_prefix_streams) */
    autoPrefixStreams: Boolean = false) {
  require(id.getBytes("UTF-8").length <= 96, "token id must be <= 96 bytes")

  /** "A union of allowed operations and groups is used as an
    * effective set of allowed operations" (api access.rs:383-384):
    * the explicit op list and the group grants compose additively —
    * an explicit set does NOT mask the groups. */
  def opAllowed(op: Op.Value): Boolean = scope.allowsOp(op)

  def authorize(op: Op.Value, basin: String = "", stream: String = "",
                nowMs: Long = System.currentTimeMillis()): Boolean =
    expiresAtMs.forall(nowMs < _) &&
      opAllowed(op) &&
      (basin.isEmpty || scope.basins.matches(basin)) &&
      (stream.isEmpty || scope.streams.matches(stream))

  /** With auto_prefix_streams, the effective stream name a caller may
    * use is prefixed by the scope prefix.
    */
  def effectiveStreamName(requested: String): String = scope.streams match {
    case ResourceSet.Prefix(p) if autoPrefixStreams => p + requested
    case _ => requested
  }
}
