package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{KnnCand, TopKAgg, TopKBuf}

/** Property-based checks of the kernel data structures: the TopK
  * aggregator must agree with a global sort under ANY reduce/merge
  * split (Spark chooses partitioning arbitrarily, so associativity is
  * a correctness requirement, not a nicety). Uses seeded ScalaCheck
  * generators directly — deterministic across runs. */
class PropertySpec extends AnyFunSuite {

  private val cand = for {
    id <- Gen.chooseNum(0L, 50L)
    dist <- Gen.chooseNum(0, 20).map(_.toDouble) // deliberate ties
  } yield KnnCand(id, dist)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def viaSort(xs: Seq[KnnCand], k: Int): Seq[(Double, Long)] =
    xs.map(c => (c.dist, c.id)).sorted.take(k)

  private def bufToSeq(b: TopKBuf): Seq[(Double, Long)] =
    b.dists.zip(b.ids).toSeq

  test("reduce-only TopK == sort-take-k over 300 seeded cases") {
    for (s <- 1 to 300) {
      val xs = sample(Gen.listOf(cand), s)
      val k = 1 + s % 12
      val agg = new TopKAgg(k)
      val got = bufToSeq(xs.foldLeft(agg.zero)(agg.reduce))
      assert(got == viaSort(xs, k), s"seed $s k $k xs $xs")
    }
  }

  test("arbitrary merge splits give the same top-k as the global sort") {
    for (s <- 1 to 300) {
      val xs = sample(Gen.listOf(cand), 1000L + s)
      val k = 1 + s % 8
      val parts = 2 + s % 4
      val agg = new TopKAgg(k)
      val chunks = xs.grouped(math.max(1, (xs.size + parts - 1) / parts)).toSeq
      val merged = chunks
        .map(c => c.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(bufToSeq(merged) == viaSort(xs, k), s"seed $s k $k parts $parts")
    }
  }

  test("codePointCompare is a total order agreeing with UTF8String binary order") {
    import org.apache.spark.unsafe.types.UTF8String
    // strings mixing ASCII, U+E000-region BMP chars, and supplementary
    // (surrogate-pair) code points — exactly where String.compareTo
    // and UTF-8 binary order disagree
    val cp = Gen.oneOf(
      Gen.chooseNum(0x20, 0x7e), Gen.chooseNum(0xe000, 0xe010),
      Gen.chooseNum(0x1f600, 0x1f610))
    val str = Gen.listOf(cp).map(_.flatMap(Character.toChars(_).toSeq).mkString)
    for (s <- 1 to 300) {
      val a = sample(str, 4000L + s)
      val b = sample(str, 5000L + s)
      val got = math.signum(graft.functions.SharedHash.codePointCompare(a, b))
      val want = math.signum(
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b))).toDouble
      assert(got == want, s"seed $s a=${a.codePoints.toArray.toSeq} b=${b.codePoints.toArray.toSeq}")
    }
  }

  test("salted pair tasks partition every unordered pair exactly once") {
    // pure replication-rule check (mirrors Dedup.saltExplode): for any
    // member count and salt count, the task an unordered pair lands in
    // is unique and every pair is covered
    for (s <- 1 to 100) {
      val n = 2 + s % 40
      val ns = 1 + s % 8
      val ids = (0 until n).map(_.toLong * 3 + s)
      val tasks = ids.flatMap { id =>
        val u = (id % ns).toInt
        (0 until ns).map(x => ((math.min(u, x), math.max(u, x)), id, u))
      }
      val byTask = tasks.groupBy(_._1)
      val covered = scala.collection.mutable.Set.empty[(Long, Long)]
      byTask.foreach { case ((ti, tj), members) =>
        val pairs =
          if (ti == tj) {
            val ms = members.map(_._2).sorted
            for (i <- ms.indices; j <- (i + 1) until ms.length) yield (ms(i), ms(j))
          } else {
            val (si, sj) = members.partition(_._3 == ti)
            for (a <- si.map(_._2); b <- sj.map(_._2))
              yield (math.min(a, b), math.max(a, b))
          }
        pairs.foreach { p =>
          assert(!covered.contains(p), s"seed $s: pair $p emitted twice")
          covered += p
        }
      }
      assert(covered.size == n * (n - 1) / 2, s"seed $s: ${covered.size} pairs")
    }
  }

  test("jaccard/hellinger metric laws: identity, symmetry, [0,1] bounds, scale behavior") {
    import graft.index.Metric
    // non-negative weight vectors (the metrics' domain), including
    // zeros and ties; fixed dim so eval's offset form is exercised
    val vec = Gen.listOfN(6, Gen.chooseNum(0, 8).map(_.toFloat)).map(_.toArray)
    for (s <- 1 to 300) {
      val a = sample(vec, 7000L + s)
      val b = sample(vec, 8000L + s)
      // Jaccard identity is exact (min=max termwise); Hellinger's
      // outer sqrt amplifies the ~1e-16 Bhattacharyya-sum rounding to
      // ~1e-8, so its identity is near-zero, not zero (round(,4) in
      // the query layer absorbs it; the oracle replays the same
      // arithmetic)
      assert(Metric.Jaccard.eval(a, 0, a, 0, 6) == 0.0, s"jaccard identity, seed $s")
      assert(Metric.Hellinger.eval(a, 0, a, 0, 6) < 3e-8, s"hellinger identity, seed $s")
      for (m <- Seq(Metric.Jaccard, Metric.Hellinger)) {
        val dab = m.eval(a, 0, b, 0, 6)
        assert(dab == m.eval(b, 0, a, 0, 6), s"$m symmetry, seed $s")
        assert(dab >= 0.0 && dab <= 1.0, s"$m bounds $dab, seed $s")
      }
      // Hellinger is scale-invariant (distributions); Jaccard is not
      // (weights): pin both so the distinction never silently flips
      val a2 = a.map(_ * 4f)
      val hd = Metric.Hellinger.eval(a2, 0, b, 0, 6) -
        Metric.Hellinger.eval(a, 0, b, 0, 6)
      assert(math.abs(hd) < 1e-9, s"hellinger scale-invariance, seed $s")
      if (a.exists(_ > 0f) && b.exists(_ > 0f) && !a.sameElements(Array.fill(6)(0f))) {
        // scaling one side of a non-equal pair changes weighted Jaccard
        val j1 = Metric.Jaccard.eval(a, 0, b, 0, 6)
        val j2 = Metric.Jaccard.eval(a2, 0, b, 0, 6)
        if (j1 == 0.0) assert(j2 > 0.0, s"jaccard scale sensitivity, seed $s")
      }
    }
  }

  test("jensen-shannon metric laws: identity, symmetry, [0, √ln2] bounds, scale-invariance") {
    import graft.index.Metric
    val vec = Gen.listOfN(6, Gen.chooseNum(0, 8).map(_.toFloat)).map(_.toArray)
    val maxJs = math.sqrt(math.log(2.0))
    for (s <- 1 to 300) {
      val a = sample(vec, 7000L + s)
      val b = sample(vec, 8000L + s)
      // identity is exact: p == q termwise makes every ln(p/m) = ln 1
      // = 0, so the divergence sum is exactly 0 before the sqrt
      assert(Metric.JensenShannon.eval(a, 0, a, 0, 6) == 0.0, s"js identity, seed $s")
      val dab = Metric.JensenShannon.eval(a, 0, b, 0, 6)
      assert(dab == Metric.JensenShannon.eval(b, 0, a, 0, 6), s"js symmetry, seed $s")
      assert(dab >= 0.0 && dab <= maxJs + 1e-12, s"js bounds $dab, seed $s")
      // distributions: scaling raw weights is a no-op
      val a2 = a.map(_ * 4f)
      val jd = Metric.JensenShannon.eval(a2, 0, b, 0, 6) -
        Metric.JensenShannon.eval(a, 0, b, 0, 6)
      assert(math.abs(jd) < 1e-9, s"js scale-invariance, seed $s")
      // triangle inequality: JS distance (the sqrt of the divergence)
      // is a true metric (Endres & Schindelin 2003) — spot-pin it
      val c = sample(vec, 9000L + s)
      val dac = Metric.JensenShannon.eval(a, 0, c, 0, 6)
      val dcb = Metric.JensenShannon.eval(c, 0, b, 0, 6)
      assert(dab <= dac + dcb + 1e-9, s"js triangle, seed $s")
    }
  }

  test("compact bench line: parses as JSON with correct totals over seeded random runs") {
    // the committed artifact's renderer must never emit unparseable
    // output or a wrong total, whatever the run looked like — fuzz
    // the inputs the format was hand-tuned around
    import org.json4s._
    val rnd = new scala.util.Random(0x9E3779B9L)
    val names = SparkEntry.queries.keys.toSeq.sorted
    (1 to 50).foreach { caseNo =>
      val nQ = 1 + rnd.nextInt(names.length)
      val rows = rnd.shuffle(names).take(nQ).map { n =>
        // mix healthy, slow, and error-sentinel values
        n -> (rnd.nextInt(4) match {
          case 0 => -1.0
          case 1 => rnd.nextDouble() * 0.5
          case 2 => 1 + rnd.nextDouble() * 8
          case _ => 10 + rnd.nextDouble() * 200
        })
      }
      val errors = rows.filter(_._2 < 0).map(_._1)
      val remeasured = rnd.shuffle(rows).take(rnd.nextInt(6))
        .map { case (n, _) => n -> rnd.nextDouble() * 3 }
      val scalars = Seq("qps" -> "154", "recall" -> "0.908",
        "lat_ms" -> "[150,1089,1119]", "value_cal" -> "123.5")
      val line = Bench.renderCompactFitted(rows, scalars, 3, errors,
        "sf0.1", remeasured = remeasured)
      assert(line.length <= Bench.CompactBudget, s"case $caseNo: ${line.length}")
      val jv = org.json4s.jackson.JsonMethods.parse(line) // throws if malformed
      // "value" totals every NON-ERROR query, kept or omitted
      val total = rows.collect { case (_, v) if v >= 0 => v }.sum
      val got = (jv \ "value") match {
        case JDouble(d) => d
        case JInt(i) => i.toDouble
        case JDecimal(d) => d.toDouble
        case other => fail(s"case $caseNo: value is $other")
      }
      assert(math.abs(got - total) < 0.005 + total * 1e-9,
        s"case $caseNo: total $got vs $total")
      // kept rows + omitted count == all rows
      val kept = (jv \ "queries") match {
        case JObject(fs) => fs.length
        case _ => fail(s"case $caseNo: queries not an object")
      }
      val omitted = (jv \ "queries_omitted") match {
        case JInt(i) => i.toInt
        case JNothing => 0
        case other => fail(s"case $caseNo: queries_omitted $other")
      }
      assert(kept + omitted == rows.length, s"case $caseNo: $kept + $omitted")
    }
  }

  test("two-pointer intersect count == set intersection size") {
    val strs = Gen.listOf(Gen.oneOf("aa", "ab", "ba", "bb", "ca", "cb", "cc"))
    for (s <- 1 to 300) {
      val a = sample(strs, 2000L + s).distinct.sorted
      val b = sample(strs, 3000L + s).distinct.sorted
      var i = 0; var j = 0; var c = 0
      while (i < a.length && j < b.length) {
        val cmp = a(i).compareTo(b(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1 else j += 1
      }
      assert(c == (a.toSet & b.toSet).size, s"seed $s")
    }
  }
}
