package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** C7 scope-model tests (common/src/access.rs:162-244). */
class AccessSpec extends AnyFunSuite {

  test("resource sets: none/exact/prefix; empty prefix matches all") {
    assert(!ResourceSet.None.matches("anything"))
    assert(ResourceSet.Exact("my-basin-x").matches("my-basin-x"))
    assert(!ResourceSet.Exact("my-basin-x").matches("my-basin-x2"))
    assert(ResourceSet.Prefix("logs-").matches("logs-2024"))
    assert(!ResourceSet.Prefix("logs-").matches("metrics-1"))
    assert(ResourceSet.Prefix("").matches("whatever"))
  }

  test("op groups: read group grants reads only") {
    val t = AccessToken("t1", AccessTokenScope(
      basins = ResourceSet.Prefix(""), streams = ResourceSet.Prefix(""),
      opGroups = PermittedOperationGroups(accountRead = true)))
    assert(t.authorize(Op.Read, "b", "s"))
    assert(t.authorize(Op.CheckTail, "b", "s"))
    assert(!t.authorize(Op.Append, "b", "s"))
    assert(!t.authorize(Op.DeleteStream, "b", "s"))
  }

  test("explicit ops UNION with groups (api access.rs:383-384: 'a " +
    "union of allowed operations and groups')") {
    val t = AccessToken("t2", AccessTokenScope(
      basins = ResourceSet.Prefix(""), streams = ResourceSet.Prefix(""),
      opGroups = PermittedOperationGroups(accountRead = true),
      ops = Set(Op.Append)))
    assert(t.authorize(Op.Append, "b", "s")) // from the explicit set
    assert(t.authorize(Op.Read, "b", "s"))   // from the read group
    assert(!t.authorize(Op.DeleteStream, "b", "s")) // in neither
  }

  test("basin/stream group rows are level-scoped: basin write grants " +
    "stream management but not the data plane or account ops") {
    val basinW = AccessToken("t2b", AccessTokenScope(
      basins = ResourceSet.Prefix(""), streams = ResourceSet.Prefix(""),
      opGroups = PermittedOperationGroups(basinWrite = true)))
    assert(basinW.authorize(Op.CreateStream, "b", "s"))
    assert(basinW.authorize(Op.DeleteStream, "b", "s"))
    assert(!basinW.authorize(Op.Append, "b", "s"))     // stream level
    assert(!basinW.authorize(Op.CreateBasin, "b"))     // account level
    assert(!basinW.authorize(Op.ListStreams, "b"))     // read, not write
    val streamR = AccessToken("t2c", AccessTokenScope(
      basins = ResourceSet.Prefix(""), streams = ResourceSet.Prefix(""),
      opGroups = PermittedOperationGroups(streamRead = true)))
    assert(streamR.authorize(Op.Read, "b", "s"))
    assert(streamR.authorize(Op.CheckTail, "b", "s"))
    assert(!streamR.authorize(Op.Append, "b", "s"))
    assert(!streamR.authorize(Op.ListStreams, "b"))    // basin level
  }

  test("scope restricts basin/stream; expiry enforced") {
    val t = AccessToken("t3", AccessTokenScope(
      basins = ResourceSet.Exact("prod-basin-1"),
      streams = ResourceSet.Prefix("app-"),
      opGroups = PermittedOperationGroups(accountRead = true, accountWrite = true)),
      expiresAtMs = Some(1000L))
    assert(t.authorize(Op.Append, "prod-basin-1", "app-events", nowMs = 500))
    assert(!t.authorize(Op.Append, "other-basin9", "app-events", nowMs = 500))
    assert(!t.authorize(Op.Append, "prod-basin-1", "sys-events", nowMs = 500))
    assert(!t.authorize(Op.Append, "prod-basin-1", "app-events", nowMs = 1000))
  }

  test("auto_prefix_streams rewrites the effective stream name") {
    val t = AccessToken("t4", AccessTokenScope(
      streams = ResourceSet.Prefix("tenant42-")), autoPrefixStreams = true)
    assert(t.effectiveStreamName("orders") == "tenant42-orders")
    val noAuto = t.copy(autoPrefixStreams = false)
    assert(noAuto.effectiveStreamName("orders") == "orders")
  }

  test("token id cap: 96 bytes (caps.rs:8)") {
    assertThrows[IllegalArgumentException](
      AccessToken("x" * 97, AccessTokenScope()))
  }
}
