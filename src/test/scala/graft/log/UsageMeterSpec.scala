package graft.log

import org.scalatest.funsuite.AnyFunSuite

/** UsageMeter bounds + re-bucketing arithmetic (the /v1/metrics
  * backing): minute-resolution cells, interval re-bucketing, window
  * filters, and the MaxCells horizon eviction (oldest minute drops;
  * the map never exceeds the cap by more than one in-flight insert).
  */
class UsageMeterSpec extends AnyFunSuite {

  test("series re-buckets minutes into hours and filters kind/basin/window") {
    val m = new UsageMeter
    // minutes 60, 120, 3660 (hour buckets 0, 0, 3600)
    m.record("append", "b1", "s1", 60000L, ops = 2, bytes = 100)
    m.record("append", "b1", "s2", 120000L, ops = 1, bytes = 50)
    m.record("append", "b2", "s1", 3660000L, ops = 4, bytes = 10)
    m.record("read", "b1", "s1", 60000L, ops = 9, bytes = 999)

    assert(m.series("append", None, None, 0, 7200, 60, wantBytes = false) ==
      Seq((60L, 2d), (120L, 1d), (3660L, 4d)))
    assert(m.series("append", None, None, 0, 7200, 3600, wantBytes = false) ==
      Seq((0L, 3d), (3600L, 4d)))
    assert(m.series("append", Some("b1"), None, 0, 7200, 3600, wantBytes = true) ==
      Seq((0L, 150d)))
    assert(m.series("append", Some("b1"), Some("s2"), 0, 7200, 60, wantBytes = false) ==
      Seq((120L, 1d)))
    // window end is exclusive at minute resolution
    assert(m.series("append", None, None, 0, 120, 60, wantBytes = false) ==
      Seq((60L, 2d)))
    assert(m.activeBasins(0, 7200) == Seq("b1", "b2"))
    assert(m.activeBasins(3000, 7200) == Seq("b2"))
  }

  test("a single-minute cell flood is refused past the hard cap — the " +
    "live minute is never wiped and existing counters keep counting") {
    val m = new UsageMeter
    val distinct = 2 * UsageMeter.MaxCells + 100
    (0 until distinct).foreach(s => m.record("append", "b", s"s$s", 0L))
    val total = m.series("append", Some("b"), None, 0, 60, 60,
      wantBytes = false).map(_._2).sum
    assert(total == 2d * UsageMeter.MaxCells) // overflow cells refused
    // an existing cell still counts after the flood
    m.record("append", "b", "s0", 0L, ops = 5)
    assert(m.series("append", Some("b"), Some("s0"), 0, 60, 60,
      wantBytes = false) == Seq((0L, 6d)))
  }

  test("cell count stays bounded: oldest minute evicted past MaxCells") {
    val m = new UsageMeter
    // MaxCells distinct (stream, minute) cells + one more minute
    val perMinute = 1000
    val minutes = UsageMeter.MaxCells / perMinute + 2
    (0 until minutes).foreach { min =>
      (0 until perMinute).foreach { s =>
        m.record("append", "b", s"s$s", min * 60000L)
      }
    }
    // the oldest minute's cells are gone; recent minutes survive
    assert(m.series("append", Some("b"), Some("s0"),
      0, 60, 60, wantBytes = false).isEmpty)
    assert(m.series("append", Some("b"), Some("s0"),
      (minutes - 1) * 60L, minutes * 60L, 60, wantBytes = false).nonEmpty)
  }
}
