package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the LAST ~2000 chars of the bench run's
  * stdout. BENCH_r05's full-precision JSON line overflowed that
  * window and lost its head ("metric"/"value" were cut off); the r10
  * artifact instead OMITTED 21 of 80 per-query rows to fit — the
  * official record stopped being self-contained. These tests pin the
  * round-11 contract: the compact line carries EVERY query row
  * (stripped keys, trimmed values) at the live surface plus headroom,
  * and the drop-from-the-bottom fallback stays dormant.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val results = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
    .map { case (n, i) => n -> (0.2 + i * 0.1) }
  // the compact scalar fragments as main() builds them, at worst-case
  // realistic widths (three-digit qps, sub-ms local latencies)
  private val scalars: Seq[(String, String)] = Seq(
    "qps" -> "[154,201]", "recall" -> "[0.908,0.688]",
    "recall100" -> "[0.652,0.997]",
    "lat_ms" -> "[150,1089,1119]",
    "llat_ms" -> "[0.84,1.11,1.24]",
    "cal" -> "[11.1,29.1]",
    "mbw" -> "[112,134]",
    "ts" -> "1776000000", "value_cal" -> "123.5",
    // worst case: the serving self-defense fired and rides the line
    "sv_re" -> "[154,1089,29.1]")
  private val sf = "sf0.1"
  // worst-case self-defense payload: the full 10-entry re-measure cap
  private val remeasured =
    SparkEntry.queries.keys.toSeq.sorted.take(10).map(_ -> 2.345678901)

  test("ZERO OMISSION: every query row fits the budget, with headroom for growth") {
    // two synthetic future queries of typical name length ride along
    // so the NEXT added operator doesn't silently re-enter omission
    // (the spec then fails at ADD time, forcing a format shrink,
    // never a silent row drop in a committed artifact)
    val headroom = Seq("q_future_alpha" -> 9.99, "q_future_beta_x" -> 9.99)
    // worst realistic widths: every value 4 chars ("9.99")
    for (v <- Seq(0.55, 1.234567891, 9.99)) {
      val rows = (SparkEntry.queries.keys.toSeq.sorted.map(_ -> v)) ++ headroom
      val line = Bench.renderCompactFitted(rows, scalars,
        reps = 3, errors = Nil, sf)
      assert(line.length <= Bench.CompactBudget,
        s"fitted line is ${line.length} chars at uniform value $v")
      assert(!line.contains("queries_omitted"),
        s"omission fallback engaged at uniform value $v — shrink the format")
      rows.foreach { case (n, _) =>
        assert(line.contains("\"" + Bench.compactKey(n) + "\":"),
          s"row $n missing from the compact line")
      }
    }
  }

  test("remeasured map rides along when it fits, is sacrificed before any query row") {
    val line = Bench.renderCompactFitted(results, scalars,
      reps = 3, errors = Nil, sf, remeasured = remeasured)
    assert(line.length <= Bench.CompactBudget)
    results.foreach { case (n, _) =>
      assert(line.contains("\"" + Bench.compactKey(n) + "\":")) }
    // squeeze the budget so remeasured + full rows can't coexist: the
    // re-measure map goes first, rows stay complete
    val squeezed = Bench.renderCompactFitted(results, scalars,
      reps = 3, errors = Nil, sf, remeasured = remeasured,
      budget = Bench.renderCompactFitted(results, scalars, 3, Nil, sf).length)
    assert(!squeezed.contains("remeasured"))
    assert(!squeezed.contains("queries_omitted"))
    results.foreach { case (n, _) =>
      assert(squeezed.contains("\"" + Bench.compactKey(n) + "\":")) }
  }

  test("pathological fallback: drops lowest-rank rows last, counts them, totals all") {
    val rank = results.map { case (n, v) => n -> v }.toMap
    val line = Bench.renderCompactFitted(results, scalars,
      reps = 3, errors = Nil, sf, budget = 900, rank = rank)
    assert(line.length <= 900)
    assert(line.contains("\"queries_omitted\":"))
    val slowest = results.maxBy(_._2)._1
    val fastest = results.minBy(_._2)._1
    assert(line.contains("\"" + Bench.compactKey(slowest) + "\":"))
    assert(!line.contains("\"" + Bench.compactKey(fastest) + "\":"))
    // the total still covers ALL queries, not just the kept ones
    val total = results.map(_._2).sum
    assert(line.contains(f""""value":$total%.2f"""))
  }

  test("compact keys strip the uniform q_ prefix; q1_agg stays itself") {
    assert(Bench.compactKey("q_dist_l2") == "ds_l2")
    assert(Bench.compactKey("q_dedup_cluster_rep") == "dd_clus_rep")
    assert(Bench.compactKey("q_knn_pq_trained") == "kn_pq_tr")
    assert(Bench.compactKey("q_dedup_substring") == "dd_substr")
    assert(Bench.compactKey("q_window") == "win")
    assert(Bench.compactKey("q_pack_chunks_bpe") == "pack_ch_bpe")
    assert(Bench.compactKey("q_overlap_serve") == "ovl_sv")
    assert(Bench.compactKey("q_vamana_search") == "vam_s")
    assert(Bench.compactKey("q1_agg") == "q1_agg")
    // the mapping is invertible over the live surface: no two queries
    // collapse onto one compact key, and no abbreviation code equals a
    // real unabbreviated prefix (else q_dd_x and q_dedup_x would merge)
    val keys = SparkEntry.queries.keys.toSeq.map(Bench.compactKey)
    assert(keys.distinct.size == keys.size)
    val codes = Bench.CompactAbbrev.map(_._2)
    val raw = SparkEntry.queries.keys.map(_.stripPrefix("q_"))
    assert(!codes.exists(c => raw.exists(_.startsWith(c))),
      "an abbreviation code collides with a real query prefix")
  }

  test("compact query values: 10ms resolution under 10s, trimmed, whole secs above") {
    assert(Bench.fmtQ(1.234567) == "1.23")
    assert(Bench.fmtQ(12.345678901) == "12")
    assert(Bench.fmtQ(0.30000001) == "0.3")
    assert(Bench.fmtQ(1.0) == "1")
    assert(Bench.fmtQ(0.004) == "0")
    assert(Bench.fmtQ(-1.0) == "-1.0") // error sentinel prints as-is
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

  test("serving self-defense: fires on forced degradation, stays dormant otherwise") {
    val base = Bench.loadServingBaseline()
    // the recorded operating point must exist and carry both knobs
    assert(base.get("qps").exists(_ > 0), s"serving baseline missing qps: $base")
    assert(base.get("lat_p95_ms").exists(_ > 0), s"missing lat_p95_ms: $base")
    val (bq, bp) = (base("qps"), base("lat_p95_ms") / 1000.0)
    // healthy run (at or above the operating point): dormant
    assert(!Bench.servingDegraded(bq, bp, base))
    assert(!Bench.servingDegraded(bq * 1.2, bp * 0.8, base))
    // boundary: a 25% qps drop or a 2x p95 is NOT yet a fire
    assert(!Bench.servingDegraded(bq * 0.76, bp, base))
    assert(!Bench.servingDegraded(bq, bp * 1.99, base))
    // forced degradation: the r14 episode's own numbers MUST fire
    assert(Bench.servingDegraded(145.0, 0.251,
      Map("qps" -> 181.0, "lat_p95_ms" -> 115.0)))
    // each trigger fires alone
    assert(Bench.servingDegraded(bq * 0.5, bp, base))
    assert(Bench.servingDegraded(bq, bp * 2.5, base))
    // failed probes (sentinel -1) and a missing baseline never fire
    assert(!Bench.servingDegraded(-1.0, -1.0, base))
    assert(!Bench.servingDegraded(10.0, 100.0, Map.empty))
    assert(Bench.loadServingBaseline("/nonexistent").isEmpty)
  }

  test("headline scalars trail the queries map so truncation can't eat them") {
    val line = Bench.renderCompactFitted(results, scalars,
      reps = 3, errors = Nil, sf, remeasured = remeasured)
    val tail = line.substring(line.length - 450)
    for (k <- Seq("\"metric\":\"total\"", "\"value\":", "\"value_cal\":",
        "\"unit\":\"sec\"", "\"qps\":", "\"recall\":", "\"llat_ms\":", "\"ts\":"))
      assert(tail.contains(k), s"$k not within the final 450 chars")
    assert(line.indexOf("\"queries\":") < line.indexOf("\"qps\":"))
  }

  test("compact line parses as JSON with the documented shapes") {
    import org.json4s._
    val line = Bench.renderCompactFitted(results, scalars,
      reps = 3, errors = Nil, sf, remeasured = remeasured)
    val jv = org.json4s.jackson.JsonMethods.parse(line)
    assert((jv \ "queries").isInstanceOf[JObject])
    assert((jv \ "lat_ms").isInstanceOf[JArray])
    assert((jv \ "recall100") match {
      case JArray(vs) => vs.length == 2
      case _ => false
    })
    assert((jv \ "unit") == JString("sec"))
  }

  test("full form carries the per-query gc_ms and cal_series aux maps") {
    val fullScalars = Seq("qps" -> 154.48194508680504, "ts" -> 1776000000.123)
    val full = Bench.renderLine(results, fullScalars, 3, Nil, "/root/testdata/sf0.1",
      aux = Seq("gc_ms" -> Seq("q1_agg" -> 321.0),
        "cal_series" -> Seq("text" -> 17.8)))
    assert(full.contains("\"gc_ms\":{\"q1_agg\":321.0}"))
    assert(full.contains("\"cal_series\":{\"text\":17.8}"))
    assert(full.contains("\"qps\":154.48194508680504"))
    // aux maps sit between queries and the trailing scalars
    assert(full.indexOf("\"queries\":") < full.indexOf("\"gc_ms\":"))
    assert(full.indexOf("\"cal_series\":") < full.indexOf("\"metric\":"))
  }

  test("negative sentinel values print as-is and errors are listed") {
    val line = Bench.renderCompactFitted(Seq("q_x" -> -1.0),
      Seq("qps" -> "-1.0"), 3, Seq("qps_probe"), sf)
    assert(line.contains("\"x\":-1.0"))
    assert(line.contains("\"errors\":[\"qps_probe\"]"))
    // a failed query is excluded from the total, not summed at -1
    assert(line.contains("\"value\":0.00"))
  }
}
