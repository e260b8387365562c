package graft

/** Committed quiet-host per-query bench medians + the noise band that
  * adjudicates spikes (round-6 verdict item 3).
  *
  * `bench_baseline.json` (repo root) holds the sf0.1/local[32] medians the
  * builder measured on a quiet host. [[Bench]] loads it per run: a query
  * whose fresh timing exceeds [[band]] of its baseline is RE-MEASURED with
  * more reps before the JSON line is emitted — a driver-host GC/neighbor
  * spike (BASELINE.md documents 2-10x swings on sub-second plans; round 6
  * spent a verdict item adjudicating a 5.1 s changepoints reading that
  * re-measured at 1.85 s) then self-resolves inside the bench artifact,
  * while a genuine regression stays loud. BenchBaselineSpec pins the file
  * to the query registry, so adding a query without benching it fails the
  * suite — the round-6 lesson (two 30 s+ regressions shipped in queries
  * that were never benched) as a test.
  */
object BenchBaseline {

  val DefaultPath = "bench_baseline.json"

  /** Noise band: a fresh timing within max(3x, +1 s) of baseline is
    * normal host noise. 3x covers the documented multiplicative swing on
    * short queries without letting a true 4x regression on a 2 s query
    * hide; the +1 s absolute floor keeps 0.1-0.3 s queries (where 3x is
    * still sub-second jitter) from flagging constantly. */
  def band(baseline: Double): Double = math.max(3.0 * baseline, baseline + 1.0)

  /** Minimal parser for the repo-controlled flat shape
    * `{"..meta..", "queries": {"name": sec, ...}}` — no JSON library in
    * the offline unmanaged classpath, and the file is ours, so a strict
    * extraction beats dragging a parser in. Returns empty on any shape
    * surprise rather than failing the bench run (the spec, not the bench,
    * is the gate that the file stays well-formed). */
  def parseQueries(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\"")
    if (start < 0) return Map.empty
    val open = json.indexOf('{', start)
    if (open < 0) return Map.empty
    val close = json.indexOf('}', open)
    if (close < 0) return Map.empty
    val body = json.substring(open + 1, close)
    val entry = """"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.eE+-]*)""".r
    entry.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def load(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.isFile) Map.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try parseQueries(src.mkString) finally src.close()
    }
  }
}
