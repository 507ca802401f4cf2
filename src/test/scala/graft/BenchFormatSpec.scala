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

  // 77 queries at sub-10s values stopped fitting the window around
  // r9 (the committed artifact's parsed:null — its captured tail
  // began MID-JSON), so the compact line is now BUDGET-FITTED: the
  // slowest entries are kept, the fastest dropped until it fits, and
  // the full map lives in BENCH_LOCAL.json. Distinct values so the
  // keep-the-slowest selection is observable.
  private val results = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
    .map { case (n, i) => n -> (0.2 + i * 0.1) }
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
    "cal_hi" -> 29.123456789, "gc_s" -> 123.123456789,
    "ts" -> 1776000000.123)
  private val sfDir = "/root/testdata/sf0.1"
  // worst-case self-defense payload: the full 10-entry re-measure cap
  private val remeasured = Seq("remeasured" ->
    SparkEntry.queries.keys.toSeq.sorted.take(10).map(_ -> 12.345678901))

  private def compactLine =
    Bench.renderCompactFitted(results, scalars, reps = 3, errors = Nil, sfDir,
      aux = remeasured)

  test("fitted line holds the budget for healthy, degraded, and pathological runs") {
    // ~7 chars of "[info] " prefix + ~80 chars of sbt's trailing
    // "[success] Total time..." line share the window with the JSON.
    for (v <- Seq(0.55, 1.234567891, 12.345678901)) {
      val line = Bench.renderCompactFitted(
        SparkEntry.queries.keys.toSeq.sorted.map(_ -> v), scalars,
        reps = 3, errors = Nil, sfDir, aux = remeasured)
      assert(line.length <= Bench.CompactBudget,
        s"fitted line is ${line.length} chars at uniform value $v")
    }
  }

  test("fitting keeps the slowest entries, counts the omitted, totals everything") {
    val line = compactLine
    assert(line.length <= Bench.CompactBudget)
    assert(line.contains("\"queries_omitted\":"),
      "77 distinct-value queries should overflow and omit some entries")
    // kept entries are the SLOWEST: the max-value query must be
    // present, the min-value one dropped
    val slowest = results.maxBy(_._2)._1
    val fastest = results.minBy(_._2)._1
    val queriesPart = line.substring(0, line.indexOf("\"remeasured\""))
    assert(queriesPart.contains("\"" + slowest + "\":"))
    assert(!queriesPart.contains("\"" + fastest + "\":"))
    // the total still covers ALL queries, not just the kept ones
    val total = results.map(_._2).sum
    assert(line.contains(f""""value":$total%.2f"""))
    // kept + omitted = all
    val kept = "\"(q[a-z0-9_]*)\":[0-9]".r
      .findAllMatchIn(line.substring(0, line.indexOf("\"remeasured\""))).length
    val omitted = "\"queries_omitted\":([0-9]+)".r
      .findFirstMatchIn(line).get.group(1).toInt
    assert(kept + omitted == results.length, s"kept $kept + omitted $omitted")
  }

  test("a small result set fits whole: nothing omitted, no omitted key") {
    val line = Bench.renderCompactFitted(results.take(20), scalars,
      reps = 3, errors = Nil, sfDir)
    assert(!line.contains("queries_omitted"))
    results.take(20).foreach { case (n, _) => assert(line.contains("\"" + n + "\":")) }
  }

  test("baseline gate block parses: every benched family and one row per query") {
    val Some((cal, rows)) = Bench.loadBaseline(): @unchecked
    // track the live surface, not a count: a new query without a
    // recorded gate row escapes the self-defense pass silently, and a
    // row for a deleted query is a stale claim
    assert(rows.keySet == SparkEntry.queries.keySet,
      s"gate rows vs queries: missing ${SparkEntry.queries.keySet -- rows.keySet}, " +
        s"stale ${rows.keySet -- SparkEntry.queries.keySet}")
    assert(rows("q1_agg") == 0.732)
    for (f <- Seq("relational", "sources", "multimodal", "text", "kmeans",
        "vector", "pq", "dedup", "hnsw", "vamana"))
      assert(cal.contains(f), s"family $f missing from baseline-gate cal")
    // a malformed/missing block must disable self-defense, not crash
    assert(Bench.loadBaseline("/nonexistent").isEmpty)
  }

  test("headline scalars trail the queries map so truncation can't eat them") {
    val line = compactLine
    val tail = line.substring(line.length - 450)
    for (k <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
        "\"qps\":", "\"recall\":", "\"latency_p99\":", "\"ts\":"))
      assert(tail.contains(k), s"$k not within the final 450 chars")
    assert(line.indexOf("\"queries\":") < line.indexOf("\"qps\":"))
  }


  test("compact query values are 10ms-resolution under 10s, 1s above") {
    val mixed = Bench.renderLine(
      Seq("q_x" -> 1.234567, "q_y" -> 12.345678901), scalars, 3, Nil,
      sfDir, compact = true)
    assert(mixed.contains("\"q_y\":12}")) // ≥10 s: whole seconds
    assert(mixed.contains("\"q_x\":1.23")) // <10 s: 2 decimals
    assert(mixed.contains("\"recall\":0.908")) // scalars keep 3 places
    assert(mixed.contains("\"ts\":1776000000,")) // run stamp: whole seconds
    val full = Bench.renderLine(Seq("q_y" -> 12.345678901), scalars, 3, Nil,
      sfDir, compact = false)
    assert(full.contains("\"q_y\":12.345678901"))
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
