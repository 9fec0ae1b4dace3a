package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-round bench gate, environment-proof (VERDICT r12 "what's
  * wrong" #1): the round-11 version compared scalar-calib-normalized
  * wall alone and fired on the DRIVER'S OWN GREEN RUN — six queries
  * 2-6x their snapshot while the scalar CPU calib read 1.01. A
  * post-mortem against a quiet re-run of the identical code showed
  * WHY no single-number calibration could have saved it: the driver
  * host's contention was BURSTY, not uniform (median wall ratio over
  * 193 shared queries was 0.95 — the host was quiet on average — yet
  * six queries ran 2-6x), and the bursts inflated process-CPU right
  * along with wall (dedup_minhash_lsh: wall 3.2x AND cpu 5.5x on
  * byte-identical code — 32 threads of memory-bandwidth stalls bill
  * as CPU), so CPU corroboration cannot discriminate contention from
  * regression either.
  *
  * What actually survives that post-mortem:
  *
  *  - MEASUREMENT, not inference: Bench now times median-of-3 (a
  *    burst must span 2 of 3 passes to poison the median, where
  *    best-of-2 needed every pass) and normalizes by the worse of a
  *    scalar AND a 16-thread parallel probe (the latter sees
  *    scheduler/bandwidth contention the spin can't). Per-query
  *    verdicts are issued ONLY for artifacts produced by that
  *    measurement (`"timing":"median-of-3"`); the r12 artifact is
  *    the existence proof that best-of-2 per-query numbers cannot
  *    support a verdict, so old-format artifacts get the aggregate
  *    check only.
  *  - AGGREGATE backstop for every format: total normalized wall over
  *    shared queries > 1.4x snapshot total fires. Bursty contention
  *    is sparse (6/193 queries, total ratio 1.2x) and cancels in the
  *    total; a real broad regression or a wait-class regression
  *    (sleeps, lock convoys, spill) does not.
  *  - Per-query rule (trusted artifacts): normalized wall > 2.5x
  *    snapshot (above a 0.5 s floor) AND cpu > 2x (above 0.3 s) —
  *    cpu agreement is required not because it discriminates
  *    contention (it doesn't) but because a wall-only spike with
  *    FLAT cpu is provably scheduler delay, never code.
  *
  * The decision function is pure and tested three ways below: against
  * the live BENCH_local.json, against the committed round-12 driver
  * artifact (must NOT fire — the false positive that motivated this),
  * and against seeded synthetic regressions (must fire — teeth).
  *
  * The live test is a no-op when BENCH_local.json is absent (fresh
  * clone): it gates bench RUNS, not builds. After an intentional perf
  * change, refresh the snapshot from a quiet-host run
  * (scripts/bench_snapshot.json carries queries_norm AND
  * queries_cpu_sec).
  */
class BenchRegressionSpec extends AnyFunSuite {

  private def numMap(json: String, field: String): Map[String, Double] = {
    // dependency-free extraction (both files are machine-written
    // single-object JSON with flat numeric maps)
    val m = ("\"" + field + """"\s*:\s*\{([^}]*)\}""").r
      .findFirstMatchIn(json)
      .getOrElse(fail(s"no $field field")).group(1)
    """"([^"]+)"\s*:\s*"?(-?[0-9.]+)"?""".r.findAllMatchIn(m)
      .map(g => g.group(1) -> g.group(2).toDouble).toMap
  }

  /** The gate itself — pure so the fixture/teeth tests below exercise
    * the exact production decision, not a re-implementation.
    * `perQueryTrusted` = the artifact came from the median-of-3 +
    * dual-probe measurement (see class doc). */
  private def regressions(
      nowNorm: Map[String, Double], nowCpu: Map[String, Double],
      snapNorm: Map[String, Double], snapCpu: Map[String, Double],
      perQueryTrusted: Boolean): Seq[String] = {
    val wallFloor = 0.5 // seconds: sub-floor times are scheduler noise
    val cpuFloor = 0.3
    val perQuery = if (!perQueryTrusted) Nil
    else nowNorm.toSeq.sortBy(_._1).flatMap { case (q, t) =>
      (snapNorm.get(q), snapCpu.get(q), nowCpu.get(q)) match {
        case (Some(s), Some(sc), Some(c))
            if t > math.max(2.5 * s, wallFloor) &&
               c > math.max(2.0 * sc, cpuFloor) =>
          Some(f"$q: norm $t%.2f s vs $s%.2f s (${t / math.max(s, 1e-9)}%.1fx), cpu $c%.2f s vs $sc%.2f s (${c / math.max(sc, 1e-9)}%.1fx)")
        // snapshot predates cpu tracking for this query: wall-only
        case (Some(s), None, _) if t > math.max(2.5 * s, wallFloor) =>
          Some(f"$q: norm $t%.2f s vs snapshot $s%.2f s (no cpu baseline)")
        case _ => None
      }
    }
    val shared = nowNorm.keySet intersect snapNorm.keySet
    val nowTot = shared.toSeq.map(nowNorm).sum
    val snapTot = shared.toSeq.map(snapNorm).sum
    val aggregate =
      if (shared.nonEmpty && nowTot > 1.4 * snapTot)
        Seq(f"AGGREGATE: total norm wall $nowTot%.1f s vs snapshot $snapTot%.1f s over ${shared.size} shared queries — broad regression (bursty host contention measured ~1.2x on the r12 false positive, a real one doesn't cancel)")
      else Nil
    perQuery ++ aggregate
  }

  private def gate(artifactJson: String,
                   snap: (Map[String, Double], Map[String, Double])): Seq[String] =
    regressions(
      numMap(artifactJson, "queries_norm"),
      numMap(artifactJson, "queries_cpu_sec"),
      snap._1, snap._2,
      perQueryTrusted = artifactJson.contains("\"timing\":\"median-of-3\""))

  private def snapshot(): (Map[String, Double], Map[String, Double]) = {
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get("scripts/bench_snapshot.json"))
    (numMap(json, "queries_norm"),
      if (json.contains("\"queries_cpu_sec\"")) numMap(json, "queries_cpu_sec")
      else Map.empty)
  }

  test("no query regressed vs snapshot (per-query + aggregate gate)") {
    val local = java.nio.file.Paths.get("BENCH_local.json")
    assume(java.nio.file.Files.exists(local),
      "BENCH_local.json absent - bench has not run in this checkout")
    val localJson = java.nio.file.Files.readString(local)
    // an erroring query reports a near-zero wall and would sail under
    // every threshold — errors are failures here, not fast queries
    assert(!localJson.contains("\"query_errors\""),
      "bench recorded query errors — fix those before reading timings")
    val flagged = gate(localJson, snapshot())
    assert(flagged.isEmpty,
      s"bench regressions (re-audit or refresh snapshot):\n  " +
        flagged.mkString("\n  "))
  }

  test("gate does NOT fire on the round-12 driver artifact (bursty host contention)") {
    // The exact run that falsified the round-11 gate: six queries
    // 2-6.2x normalized under bursty, invisible-to-scalar-calib host
    // load, on code byte-identical to the snapshot's.
    val driver = java.nio.file.Files.readString(
      java.nio.file.Paths.get("scripts/bench_driver_r12.json"))
    val flagged = gate(driver, snapshot())
    assert(flagged.isEmpty,
      s"gate would have red-flagged the healthy r12 driver run:\n  " +
        flagged.mkString("\n  "))
  }

  test("gate KEEPS its teeth: seeded regressions fire") {
    val (snapNorm, snapCpu) = snapshot()
    assume(snapCpu.nonEmpty, "snapshot predates cpu tracking")
    // 1. a single-query 3x algorithmic regression (wall AND cpu rise)
    val q = snapNorm.filter { case (k, v) => v > 1.0 && snapCpu.contains(k) }
      .keys.toSeq.sorted.headOption.getOrElse(fail("no >1s query in snapshot"))
    val flagged = regressions(
      snapNorm.updated(q, snapNorm(q) * 3), snapCpu.updated(q, snapCpu(q) * 3),
      snapNorm, snapCpu, perQueryTrusted = true)
    assert(flagged.exists(_.startsWith(q + ":")),
      s"seeded 3x regression on $q not flagged: $flagged")
    // 2. a broad wait-class regression (everything 1.6x in wall only,
    //    cpu flat — sleeps/lock convoys/spill): aggregate catches it
    val waity = snapNorm.map { case (k, v) => k -> v * 1.6 }
    val waitFlags = regressions(waity, snapCpu, snapNorm, snapCpu,
      perQueryTrusted = true)
    assert(waitFlags.exists(_.startsWith("AGGREGATE")),
      s"broad wall-only regression not caught by aggregate backstop: $waitFlags")
    // 3. the same broad regression in an OLD-format artifact (per-query
    //    untrusted) must STILL fire through the aggregate
    val oldFmt = regressions(waity, snapCpu, snapNorm, snapCpu,
      perQueryTrusted = false)
    assert(oldFmt.exists(_.startsWith("AGGREGATE")),
      s"aggregate must not depend on artifact format: $oldFmt")
  }
}
