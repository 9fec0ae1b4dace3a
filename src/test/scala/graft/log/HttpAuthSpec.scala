package graft.log

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.model._
import HttpRecordsClient.requestAny

/** Bearer enforcement over the v1 serving surface: the C7 scope model
  * gating every route (401 for missing/unknown/expired bearers, 403
  * for live-but-out-of-scope, per-route Operation mapping), plus
  * `auto_prefix_streams` namespacing at the serving edge — stream
  * name arguments prefixed before scope checks and dispatch, the
  * prefix stripped from listings (api access.rs:355-357).
  */
class HttpAuthSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Store with one scoped basin/stream and a guarded server; tokens
    * are seeded through the catalog (the operator bootstrap path —
    * token serving itself requires a token). */
  private def served(): (StreamStore, com.sun.net.httpserver.HttpServer, String) = {
    val st = new StreamStore(spark,
      Files.createTempDirectory("graft-http-auth").toString)
    st.catalog.createBasin("auth-basin-a1", BasinConfig(
      defaultStreamConfig =
        StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
    st.catalog.createStream("auth-basin-a1", "app-x")
    val (server, endpoint) = HttpRecordsServer.start(st, Some(120000L),
      requireAuth = true)
    (st, server, endpoint)
  }

  private def utf8(s: String) = s.getBytes("UTF-8")
  private def hdr(tok: String): Seq[(String, String)] =
    Seq("s2-basin" -> "auth-basin-a1", "Authorization" -> s"Bearer $tok")

  test("401 for missing, malformed, unknown, and expired bearers; " +
    "403 for live tokens whose scope excludes the op or resource") {
    val (st, server, ep) = served()
    try {
      st.catalog.issueToken(AccessToken("rw-tok", AccessTokenScope(
        basins = ResourceSet.Exact("auth-basin-a1"),
        streams = ResourceSet.Prefix("app-"),
        opGroups = PermittedOperationGroups(
          streamRead = true, streamWrite = true))))
      st.catalog.issueToken(AccessToken("old-tok", AccessTokenScope(
        basins = ResourceSet.Prefix(""), streams = ResourceSet.Prefix(""),
        opGroups = PermittedOperationGroups(accountRead = true,
          accountWrite = true)), expiresAtMs = Some(100000L))) // < pinned now

      val rec = s"$ep/v1/streams/app-x/records"
      val body = utf8("""{"records":[{"body":"a"}]}""")
      assert(requestAny("POST", rec, Seq("s2-basin" -> "auth-basin-a1"),
        body)._1 == 401) // no header
      assert(requestAny("POST", rec, Seq("s2-basin" -> "auth-basin-a1",
        "Authorization" -> "Basic xyz"), body)._1 == 401) // not bearer
      assert(requestAny("POST", rec, hdr("nope-tok"), body)._1 == 401)
      assert(requestAny("POST", rec, hdr("old-tok"), body)._1 == 401) // expired

      // in scope: append + read + tail all pass
      assert(requestAny("POST", rec, hdr("rw-tok"), body)._1 == 200)
      assert(requestAny("GET", s"$rec?seq_num=0", hdr("rw-tok"))._1 == 200)
      assert(requestAny("GET", s"$rec/tail", hdr("rw-tok"))._1 == 200)
      // out of scope: foreign stream prefix, foreign basin, basin-level op
      assert(requestAny("GET",
        s"$ep/v1/streams/sys-y/records?seq_num=0", hdr("rw-tok"))._1 == 403)
      assert(requestAny("POST", rec, Seq("s2-basin" -> "other-basin-b2",
        "Authorization" -> "Bearer rw-tok"), body)._1 == 403)
      assert(requestAny("DELETE", s"$ep/v1/streams/app-x",
        hdr("rw-tok"))._1 == 403) // DeleteStream is basin-level write
      assert(requestAny("GET", s"$ep/v1/basins", hdr("rw-tok"))._1 == 403)
    } finally server.stop(0)
  }

  test("explicit ops union with groups over HTTP, and account groups " +
    "gate the catalog routes") {
    val (st, server, ep) = served()
    try {
      st.catalog.issueToken(AccessToken("append-only", AccessTokenScope(
        basins = ResourceSet.Prefix(""), streams = ResourceSet.Prefix(""),
        ops = Set(Op.Append))))
      st.catalog.issueToken(AccessToken("acct-ro", AccessTokenScope(
        basins = ResourceSet.Prefix(""), streams = ResourceSet.Prefix(""),
        opGroups = PermittedOperationGroups(accountRead = true))))

      val rec = s"$ep/v1/streams/app-x/records"
      val body = utf8("""{"records":[{"body":"b"}]}""")
      assert(requestAny("POST", rec, hdr("append-only"), body)._1 == 200)
      assert(requestAny("GET", s"$rec?seq_num=0", hdr("append-only"))._1 == 403)

      // account read: list basins + read config, but no create
      assert(requestAny("GET", s"$ep/v1/basins",
        Seq("Authorization" -> "Bearer acct-ro"))._1 == 200)
      assert(requestAny("GET", s"$ep/v1/basins/auth-basin-a1",
        Seq("Authorization" -> "Bearer acct-ro"))._1 == 200)
      assert(requestAny("POST", s"$ep/v1/basins",
        Seq("Authorization" -> "Bearer acct-ro"),
        utf8("""{"basin":"auth-basin-c3"}"""))._1 == 403)
      // metrics are read-group ops
      assert(requestAny("GET", s"$ep/v1/metrics?set=account-ops",
        Seq("Authorization" -> "Bearer acct-ro"))._1 == 200)
    } finally server.stop(0)
  }

  test("auto_prefix_streams namespaces the serving edge: create and " +
    "append land on the prefixed stream, listings strip the prefix") {
    val (st, server, ep) = served()
    try {
      st.catalog.createStream("auth-basin-a1", "t1-existing")
      st.catalog.createStream("auth-basin-a1", "other-s")
      st.catalog.issueToken(AccessToken("tenant1", AccessTokenScope(
        basins = ResourceSet.Exact("auth-basin-a1"),
        streams = ResourceSet.Prefix("t1-"),
        opGroups = PermittedOperationGroups(
          basinRead = true, basinWrite = true,
          streamRead = true, streamWrite = true)),
        autoPrefixStreams = true))

      // create "orders" → physically t1-orders
      val (cc, cb, _) = requestAny("POST", s"$ep/v1/streams", hdr("tenant1"),
        utf8("""{"stream":"orders"}"""))
      assert(cc == 201, cb)
      assert(st.catalog.getStream("auth-basin-a1", "t1-orders").isDefined)
      assert(st.catalog.getStream("auth-basin-a1", "orders").isEmpty)

      // append through the unprefixed name; verify via the raw store
      val (ac, ab, _) = requestAny("POST",
        s"$ep/v1/streams/orders/records", hdr("tenant1"),
        utf8("""{"records":[{"body":"tenant-data"}]}"""))
      assert(ac == 200, ab)
      val got = st.readBatch("auth-basin-a1", "t1-orders",
        ReadSpec(ReadStart(ReadFrom.SeqNum(0)))).toOption.get
      assert(got.map(r => new String(r.body)) == Seq("tenant-data"))

      // listing strips the prefix and hides foreign streams
      val (_, lst, _) = requestAny("GET", s"$ep/v1/streams", hdr("tenant1"))
      assert(lst.contains(""""name":"orders"""") &&
        lst.contains(""""name":"existing"""") &&
        !lst.contains("other-s") && !lst.contains("t1-"), lst)

      // a name outside the tenant prefix is still authorized (it maps
      // INTO the prefix) but hits the namespaced absence: 404, not 403
      assert(requestAny("GET",
        s"$ep/v1/streams/zz/records?seq_num=0", hdr("tenant1"))._1 == 404)
    } finally server.stop(0)
  }

  test("in-band trim/fence commands on the append route require the " +
    "Trim/Fence ops, not just Append") {
    val (st, server, ep) = served()
    try {
      st.catalog.issueToken(AccessToken("append-only2", AccessTokenScope(
        basins = ResourceSet.Prefix(""), streams = ResourceSet.Prefix(""),
        ops = Set(Op.Append))))
      st.catalog.issueToken(AccessToken("maintainer", AccessTokenScope(
        basins = ResourceSet.Prefix(""), streams = ResourceSet.Prefix(""),
        ops = Set(Op.Append, Op.Trim, Op.Fence))))
      val rec = s"$ep/v1/streams/app-x/records"
      // seed three data records
      assert(requestAny("POST", rec, hdr("maintainer"),
        utf8("""{"records":[{"body":"a"},{"body":"b"},{"body":"c"}]}"""))._1 == 200)
      // trim command: single header ["", "trim"], body = 8-byte BE seq
      // (base64 format keeps the binary payload JSON-safe)
      val b64 = Seq("s2-format" -> "base64")
      val trimBody =
        """{"records":[{"headers":[["","dHJpbQ=="]],"body":"AAAAAAAAAAI="}]}"""
      val (t1, tb1, _) = requestAny("POST", rec, hdr("append-only2") ++ b64,
        utf8(trimBody))
      assert(t1 == 403, s"$t1 $tb1")
      val (t2, tb2, _) = requestAny("POST", rec, hdr("maintainer") ++ b64,
        utf8(trimBody))
      assert(t2 == 200, s"$t2 $tb2")
      assert(st.manifest("auth-basin-a1", "app-x").trimPoint == 2L)
      // fence: ["", "fence"], body = token bytes
      val fenceBody =
        """{"records":[{"headers":[["","ZmVuY2U="]],"body":"enp6"}]}"""
      assert(requestAny("POST", rec, hdr("append-only2") ++ b64,
        utf8(fenceBody))._1 == 403)
      assert(requestAny("POST", rec, hdr("maintainer") ++ b64,
        utf8(fenceBody))._1 == 200)
      assert(st.manifest("auth-basin-a1", "app-x").fencingToken == "zzz")
    } finally server.stop(0)
  }

  test("token management is resource-gated by the access_tokens set") {
    val (st, server, ep) = served()
    try {
      st.catalog.issueToken(AccessToken("mgr-sub", AccessTokenScope(
        accessTokens = ResourceSet.Prefix("sub-"),
        ops = Set(Op.IssueAccessToken, Op.RevokeAccessToken,
          Op.ListAccessTokens))))
      st.catalog.issueToken(AccessToken("mgr-none", AccessTokenScope(
        ops = Set(Op.IssueAccessToken))))

      val url = s"$ep/v1/access-tokens"
      def auth(t: String) = Seq("Authorization" -> s"Bearer $t")
      // in the managed prefix: allowed
      assert(requestAny("POST", url, auth("mgr-sub"),
        utf8("""{"id":"sub-a","scope":{}}"""))._1 == 201)
      // outside it: 403 despite holding the IssueAccessToken op
      assert(requestAny("POST", url, auth("mgr-sub"),
        utf8("""{"id":"other-a","scope":{}}"""))._1 == 403)
      assert(requestAny("POST", url, auth("mgr-none"),
        utf8("""{"id":"sub-b","scope":{}}"""))._1 == 403) // None set
      // listing is filtered to the managed prefix
      val (_, lst, _) = requestAny("GET", url, auth("mgr-sub"))
      assert(lst.contains("sub-a") && !lst.contains("mgr-none"), lst)
      // revoke gated the same way
      assert(requestAny("DELETE", s"$url/mgr-none", auth("mgr-sub"))._1 == 403)
      assert(requestAny("DELETE", s"$url/sub-a", auth("mgr-sub"))._1 == 204)
    } finally server.stop(0)
  }
}
