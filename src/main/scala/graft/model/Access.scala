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
}

final case class PermittedOperationGroups(
    accountRead: Boolean = false, accountWrite: Boolean = false)

final case class AccessTokenScope(
    basins: ResourceSet = ResourceSet.None,
    streams: ResourceSet = ResourceSet.None,
    accessTokens: ResourceSet = ResourceSet.None,
    opGroups: PermittedOperationGroups = PermittedOperationGroups(),
    /** explicit op allow-list; empty = defer to groups */
    ops: Set[Op.Value] = Set.empty)

final case class AccessToken(
    id: String,
    scope: AccessTokenScope,
    expiresAtMs: Option[Long] = None,
    /** if set, stream scope is interpreted as a forced prefix on every
      * stream the token touches (access.rs auto_prefix_streams) */
    autoPrefixStreams: Boolean = false) {
  require(id.getBytes("UTF-8").length <= 96, "token id must be <= 96 bytes")

  def opAllowed(op: Op.Value): Boolean =
    (scope.ops.nonEmpty && scope.ops.contains(op)) ||
      (scope.ops.isEmpty &&
        ((scope.opGroups.accountRead && Op.ReadGroup(op)) ||
         (scope.opGroups.accountWrite && Op.WriteGroup(op))))

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
