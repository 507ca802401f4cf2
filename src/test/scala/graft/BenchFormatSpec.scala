package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the LAST ~2000 chars of the bench run's
  * stdout. BENCH_r05's full-precision JSON line overflowed that
  * window and lost its head ("metric"/"value" were cut off), so the
  * headline total vanished from the round record. These tests pin the
  * compact line's budget at the CURRENT query count — adding queries
  * without shrinking the format fails here, not silently in the next
  * round's bench capture.
  */
class BenchFormatSpec extends AnyFunSuite {

  // Worst-case realistic values: two-digit seconds for every query,
  // three-digit QPS, the real sf path the driver passes.
  private val results =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 12.345678901)
  // the stdout scalar set — headline pair is the overlap operating
  // point, with the plain-routed pair alongside; the remaining
  // secondary points (full/build) go only to BENCH_LOCAL.json
  private val scalars = Seq(
    "qps" -> 154.48194508680504, "recall" -> 0.9075,
    "qps_routed" -> 201.12345678, "recall_routed" -> 0.6875,
    "recall100" -> 0.6517,
    "latency_p50" -> 0.149634805, "latency_p95" -> 1.089050957,
    "latency_p99" -> 1.119355698, "steal_pct" -> 63.123456789,
    "cal_cores" -> 13.123456789, "cal_lo" -> 11.123456789,
    "cal_hi" -> 29.123456789, "gc_s" -> 123.123456789)
  private val sfDir = "/root/testdata/sf0.1"

  private def compactLine =
    Bench.renderLine(results, scalars, reps = 3, errors = Nil, sfDir, compact = true)

  test("compact line fits the driver's 2000-char tail with margin for sbt chrome") {
    // ~7 chars of "[info] " prefix + ~80 chars of sbt's trailing
    // "[success] Total time..." line share the window with the JSON.
    assert(compactLine.length <= 1900,
      s"compact bench line is ${compactLine.length} chars; " +
        "trim decimals or move fields to BENCH_LOCAL.json")
  }

  test("headline scalars trail the queries map so truncation can't eat them") {
    val line = compactLine
    val tail = line.substring(line.length - 450)
    for (k <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
        "\"qps\":", "\"recall\":", "\"latency_p99\":"))
      assert(tail.contains(k), s"$k not within the final 450 chars")
    assert(line.indexOf("\"queries\":") < line.indexOf("\"qps\":"))
  }

  test("compact query values are 10ms-resolution under 10s, 1s above") {
    assert(compactLine.contains("\"q1_agg\":12,")) // ≥10 s: whole seconds
    val small = Bench.renderLine(Seq("q_x" -> 1.234567), scalars, 3, Nil,
      sfDir, compact = true)
    assert(small.contains("\"q_x\":1.23")) // <10 s: 2 decimals
    assert(compactLine.contains("\"recall\":0.908")) // scalars keep 3 places
    val full = Bench.renderLine(results, scalars, 3, Nil, sfDir, compact = false)
    assert(full.contains("\"q1_agg\":12.345678901"))
    assert(full.contains("\"qps\":154.48194508680504"))
  }

  test("full form carries the per-query gc_ms and cal_series aux maps") {
    val full = Bench.renderLine(results, scalars, 3, Nil, sfDir,
      compact = false,
      aux = Seq("gc_ms" -> Seq("q1_agg" -> 321.0),
        "cal_series" -> Seq("text" -> 17.8)))
    assert(full.contains("\"gc_ms\":{\"q1_agg\":321.0}"))
    assert(full.contains("\"cal_series\":{\"text\":17.8}"))
    // aux maps sit between queries and the trailing scalars
    assert(full.indexOf("\"queries\":") < full.indexOf("\"gc_ms\":"))
    assert(full.indexOf("\"cal_series\":") < full.indexOf("\"metric\":"))
  }

  test("negative sentinel values print as-is and errors are listed") {
    val line = Bench.renderLine(Seq("q_x" -> -1.0), Seq("qps" -> -1.0),
      3, Seq("qps_probe"), sfDir, compact = true)
    assert(line.contains("\"q_x\":-1.0"))
    assert(line.contains("\"errors\":[\"qps_probe\"]"))
    // a failed query is excluded from the total, not summed at -1
    assert(line.contains("\"value\":0.00"))
  }
}
