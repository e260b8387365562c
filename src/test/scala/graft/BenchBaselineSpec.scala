package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins `bench_baseline.json` to the query registry — no Spark session,
  * runs in milliseconds, always on.
  *
  * The round-6 lesson encoded as a test: both 30 s+ perf regressions that
  * round shipped in queries that were REGISTERED without ever being
  * benched. Forcing every registry entry to carry a committed quiet-host
  * median means "add a query" and "measure the query" cannot be separated
  * again, and [[Bench]]'s spike adjudication has a baseline for every
  * name it can meet. */
class BenchBaselineSpec extends AnyFunSuite {

  test("bench_baseline.json exists, parses, and covers the registry exactly") {
    val f = new java.io.File(BenchBaseline.DefaultPath)
    assert(f.isFile, s"missing ${f.getAbsolutePath} — run the full Bench " +
      "on a quiet host and commit the medians")
    val base = BenchBaseline.load(BenchBaseline.DefaultPath)
    val registry = SparkEntry.queries.keySet
    val unbenched = registry -- base.keySet
    assert(unbenched.isEmpty,
      s"queries registered without a committed bench median: " +
        s"${unbenched.toSeq.sorted.mkString(", ")} — bench them at sf0.1 " +
        "and add the medians to bench_baseline.json")
    val stale = base.keySet -- registry
    assert(stale.isEmpty,
      s"baseline entries for unregistered queries: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
    base.foreach { case (name, v) =>
      assert(v > 0.0 && v < 60.0, s"$name baseline $v s is not a sane median")
    }
  }

  test("noise band: multiplicative for slow queries, absolute floor for fast ones") {
    assert(BenchBaseline.band(2.0) == 6.0)   // 3x dominates past 0.5 s
    assert(BenchBaseline.band(0.2) == 1.2)   // +1 s floor dominates below
    // the round-6 changepoints case self-adjudicates: 5.1 s vs the ~1.5 s
    // committed median is outside the band (re-measure), while its 1.85 s
    // re-measurement is inside (noise, not regression)
    assert(5.1 > BenchBaseline.band(1.5) && 1.85 <= BenchBaseline.band(1.5))
  }
}
