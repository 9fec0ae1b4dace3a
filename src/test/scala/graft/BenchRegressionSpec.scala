package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-round bench gate, host-load-proof (VERDICT r11 #4): compares
  * the CURRENT `BENCH_local.json`'s `queries_norm` (wall seconds
  * scaled by CalibBaselineSec / cpu_calib_sec, so a shared-host
  * slowdown cancels out) against the committed snapshot
  * `scripts/bench_snapshot.json`. A query whose NORMALIZED time
  * regressed more than 2x (above a 0.5 s noise floor) fails here with
  * its numbers — the same role PlanShapeSpec plays for plan shape,
  * but for measured wall time.
  *
  * The spec is a no-op when BENCH_local.json is absent (fresh clone):
  * it gates bench RUNS, not builds. After an intentional perf change,
  * refresh the snapshot from a quiet-host run.
  */
class BenchRegressionSpec extends AnyFunSuite {

  private def queriesNorm(json: String): Map[String, Double] = {
    // the one field this spec reads; a dependency-free extraction
    // (both files are machine-written single-object JSON)
    val m = """"queries_norm"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(json)
      .getOrElse(fail("no queries_norm field")).group(1)
    """"([^"]+)"\s*:\s*"?(-?[0-9.]+)"?""".r.findAllMatchIn(m)
      .map(g => g.group(1) -> g.group(2).toDouble).toMap
  }

  test("no query's calib-normalized wall time regressed >2x vs snapshot") {
    val local = java.nio.file.Paths.get("BENCH_local.json")
    assume(java.nio.file.Files.exists(local),
      "BENCH_local.json absent - bench has not run in this checkout")
    val localJson = java.nio.file.Files.readString(local)
    val now = queriesNorm(localJson)
    val snap = queriesNorm(java.nio.file.Files.readString(
      java.nio.file.Paths.get("scripts/bench_snapshot.json")))
    assert(now.nonEmpty && snap.nonEmpty)
    // an erroring query reports a near-zero wall and would sail under
    // every threshold — errors are failures here, not fast queries
    assert(!localJson.contains("\"query_errors\""),
      "bench recorded query errors — fix those before reading timings")
    val floor = 0.5 // seconds: sub-floor times are scheduler noise
    val regressed = now.toSeq.sortBy(_._1).flatMap { case (q, t) =>
      snap.get(q) match {
        case Some(s) if t > math.max(2 * s, floor) =>
          Some(f"$q: $t%.2f s vs snapshot $s%.2f s (${t / math.max(s, 1e-9)}%.1fx)")
        case _ => None
      }
    }
    assert(regressed.isEmpty,
      s"normalized bench regressions (re-audit or refresh snapshot):\n  " +
        regressed.mkString("\n  "))
  }
}
