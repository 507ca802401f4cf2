package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Ev, StreamOps}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("file-source windowed counts match the batch equivalent") {
    val stream = StreamOps.eventsStream(spark, SparkSpecBase.sf001)
    // complete mode: append would hold back windows newer than the
    // watermark (still open), undercounting vs batch
    val q = StreamOps.windowedCounts(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("winout").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("winout")
      .agg(sum($"n")).as[Long].head()
    val expected = operators.Relational
      .streamWindowBatch(spark, SparkSpecBase.sf001)
      .agg(sum($"n")).as[Long].head()
    assert(got == expected)
  }

  test("stateful sessionizer closes sessions on 30-min gaps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sessout").start()
    val m = 60L * 1000000
    // user 1: two sessions (gap 40 min); user 2: one open session
    mem.addData(
      Ev(1, 0 * m, "click", 1.0), Ev(1, 10 * m, "view", 1.0),
      Ev(1, 50 * m, "click", 1.0), // 40-min gap → closes session 1
      Ev(2, 0 * m, "click", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(1, 120 * m, "view", 1.0)) // 70-min gap → closes session 2
    q.processAllAvailable(); q.stop()
    val out = spark.table("sessout").as[(Long, Long, Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 0L, 10 * m, 2L), (1L, 50 * m, 50 * m, 1L)))
  }

  test("out-of-order event beyond the gap becomes its own session, not a merge") {
    // regression: a straggler arriving more than the gap BEFORE the
    // open session used to merge into it, stretching the live session
    // across a >gap silence the batch operator would never produce
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sessoo").start()
    val m = 60L * 1000000
    mem.addData(Ev(1, 0 * m, "click", 1.0), Ev(1, 50 * m, "click", 1.0))
    q.processAllAvailable() // session [0,0] closed; [50m] open
    mem.addData(Ev(1, 10 * m, "late", 1.0)) // >gap before open start
    q.processAllAvailable()
    mem.addData(Ev(1, 120 * m, "click", 1.0)) // closes the 50m session
    q.processAllAvailable(); q.stop()
    val out = spark.table("sessoo").as[(Long, Long, Long, Long)].collect().sorted
    // the straggler is a singleton; the open session stayed [50m,50m]
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 1L), (1L, 10 * m, 10 * m, 1L), (1L, 50 * m, 50 * m, 1L)),
      out.toSeq.toString)
  }

  test("co-batch stragglers within one gap of each other merge, as batch would") {
    // regression: two late events in the SAME micro-batch, each more
    // than the gap before the open session but within the gap of each
    // other, were emitted as separate singletons; batch sessionizes
    // them into one session — so must streaming's intra-batch closure
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sesscb").start()
    val m = 60L * 1000000
    mem.addData(Ev(1, 100 * m, "click", 1.0))
    q.processAllAvailable() // open session at 100m
    // both > gap before 100m; 10 min apart from each other
    mem.addData(Ev(1, 10 * m, "late", 1.0), Ev(1, 20 * m, "late", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(1, 200 * m, "click", 1.0)) // closes the 100m session
    q.processAllAvailable(); q.stop()
    val out = spark.table("sesscb").as[(Long, Long, Long, Long)].collect().sorted
    assert(out.toSeq == Seq(
      (1L, 10 * m, 20 * m, 2L), (1L, 100 * m, 100 * m, 1L)),
      out.toSeq.toString)
  }

  test("a straggler run that chains into the open session merges it whole") {
    // the bridge case: stragglers 60m,65m (> gap before the open 100m
    // session) plus 75m (within gap of both 65m and 100m) — batch
    // produces ONE session [60m,100m]; the interval-merge closure
    // must bridge identically instead of stranding [60,65]
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sessbr").start()
    val m = 60L * 1000000
    mem.addData(Ev(1, 100 * m, "click", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(1, 60 * m, "late", 1.0), Ev(1, 65 * m, "late", 1.0),
      Ev(1, 75 * m, "late", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(1, 200 * m, "click", 1.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("sessbr").as[(Long, Long, Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 60 * m, 100 * m, 4L)), out.toSeq.toString)
  }

  test("streaming select emits a rejected verdict for empty docs, not silence") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingSelect(mem.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("selempty").start()
    mem.addData((1L, "the quick brown fox " * 30), (2L, "   "), (3L, ""))
    q.processAllAvailable(); q.stop()
    val out = spark.table("selempty")
      .select($"doc_id", $"selected").as[(Long, Boolean)].collect().sorted
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L), out.toSeq.toString)
    assert(!out.find(_._1 == 2L).get._2 && !out.find(_._1 == 3L).get._2)
  }

  test("JVM substring window keys equal the batch expression on real corpus text") {
    // the streaming twin computes the 60-bit window key JVM-side;
    // the batch operator computes it as a Catalyst expression — this
    // pins them value-identical on actual documents (codepoint
    // walking, md5-of-UTF-8, 15-nibble parse)
    val docs = Tables.documents(spark, SparkSpecBase.sf01)
      .select($"doc_id", $"text").as[(Long, String)].collect().take(50)
    val W = 40
    docs.foreach { case (id, text) =>
      val jvm = operators.Dedup.substringWindowKeys(text).sorted.toSeq
      val sqlKeys =
        if (text.length < W) Seq.empty
        else Seq(text).toDF("text")
          .select($"text",
            explode(sequence(lit(1), length($"text") - (W - 1))).as("i"))
          .select(expr(
            s"cast(conv(substring(md5(substring(text, i, $W)), 1, 15), 16, 10) as bigint)"
          ).as("h"))
          .distinct().as[Long].collect().sorted.toSeq
      assert(jvm == sqlKeys, s"doc $id: JVM keys diverge from the batch expression")
    }
  }

  test("streaming substring-dedup flags exactly the docs with an earlier substring partner") {
    implicit val sqlCtx = spark.sqlContext
    // batch authority: the exact-substring pair list at sf0.01; the
    // stream's flagged-doc set must equal the set of docs appearing
    // as the LATER element of some batch pair (see the operator doc
    // for why that equality is exact, not a floor)
    val batchPairs = operators.Dedup.qDedupSubstring(spark, SparkSpecBase.sf01)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assume(batchPairs.nonEmpty, "no substring pairs at sf0.01 — corpus changed?")
    val expected = batchPairs.map(_._2).toSet
    val docs = Tables.documents(spark, SparkSpecBase.sf01)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingSubstringDedup(mem.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("substr_vs_batch").start()
    mem.addData(docs)
    q.processAllAvailable(); q.stop()
    val out = spark.table("substr_vs_batch")
      .select($"doc_id", $"matched_id").as[(Long, Long)].collect()
    out.foreach { case (d, k) => assert(k < d,
      s"keeper $k not earlier than flagged doc $d under sorted co-batch order") }
    val flagged = out.map(_._1).toSet
    assert(flagged == expected,
      s"flagged set diverged: missing ${(expected -- flagged).take(5)}, " +
        s"extra ${(flagged -- expected).take(5)}")
    operators.Dedup.release(spark)
  }

  test("streaming substring-dedup matches across batches against the first-seen keeper") {
    implicit val sqlCtx = spark.sqlContext
    val shared = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // exactly 40 chars
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingSubstringDedup(mem.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("substr_cross_batch").start()
    mem.addData((1L, s"prefix one $shared tail one"),
      (2L, "completely unrelated text with no common window at all.."))
    q.processAllAvailable()
    mem.addData((3L, s"другой контекст $shared and different ending"))
    q.processAllAvailable(); q.stop()
    val out = spark.table("substr_cross_batch")
      .select($"doc_id", $"matched_id").as[(Long, Long)].collect().toSet
    assert(out.contains((3L, 1L)), s"batch-2 doc not flagged against batch-1 keeper: $out")
    assert(!out.exists(_._1 == 2L), s"unrelated doc flagged: $out")
  }

  test("streaming near-dedup flags exact and near duplicates across batches, not unrelated docs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingNearDedup(mem.toDS().toDF("doc_id", "text"), tau = 0.35)
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup").start()
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val near = (1 to 60).map(i => if (i == 30) "CHANGED" else s"token$i").mkString(" ")
    val other = (1 to 60).map(i => s"word$i").mkString(" ")
    mem.addData((1L, base), (2L, other))
    q.processAllAvailable()
    // batch 2: exact dup of 1, near dup of 1, and a fresh unrelated doc
    mem.addData((3L, base), (4L, near), (5L, "completely different content entirely"))
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("neardup")
      .select($"doc_id", $"matched_id", $"est_jac")
      .as[(Long, Long, Double)].collect().toSet
    // exact duplicate: estimate is exactly 1.0, matched to the earlier doc
    assert(pairs.exists { case (d, m, e) => d == 3L && m == 1L && e == 1.0 },
      s"missing exact-dup pair in $pairs")
    // one-word edit of a 60-word doc: shingle Jaccard ≈ (58-3)/61 high;
    // the bottom-k estimate must clear tau and point at doc 1
    assert(pairs.exists { case (d, m, e) => d == 4L && m == 1L && e >= 0.35 },
      s"missing near-dup pair in $pairs")
    // unrelated docs never pair up
    assert(!pairs.exists { case (d, m, _) => Set(d, m).contains(2L) || Set(d, m).contains(5L) },
      s"false positive in $pairs")
  }

  test("streaming near-dedup catches every strong batch-verified pair on the real documents table") {
    implicit val sqlCtx = spark.sqlContext
    // batch authority: the minhash operator's exact-Jaccard verified
    // pairs at sf0.001. Strong pairs (jac >= 0.5) MUST surface from
    // the streaming twin fed the same corpus as one batch: the banding
    // is the shared constant, so any band collision batch saw, the
    // stream sees; tau sits at 0.2 so the bottom-k estimate of a
    // jac-0.5 pair clears it with ~3 sigma of estimator margin
    // (k=32 -> sigma ~ 0.09).
    val strong = operators.Dedup.verifiedPairs(spark, SparkSpecBase.sf001)
      .filter($"jac" >= 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assume(strong.nonEmpty, "no strong near-dup pairs at sf0.001 — corpus changed?")
    val docs = Tables.documents(spark, SparkSpecBase.sf001)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingNearDedup(mem.toDS().toDF("doc_id", "text"), tau = 0.2)
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_vs_batch").start()
    mem.addData(docs)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("neardup_vs_batch")
      .select($"doc_id", $"matched_id").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val missed = strong.filterNot { case (a, b) => streamed((a, b)) }
    // floor, not completeness: MaxKeepers bounds state per (band,
    // signature) slot BY CONTRACT, so a dup cluster larger than 8
    // exact copies can legitimately hide a pair whose earlier member
    // fell past the keeper cap. The current corpus misses zero; the
    // floor keeps the pin robust to a regenerated corpus with bigger
    // clusters without asserting a guarantee the operator never made.
    val recall = 1.0 - missed.length.toDouble / strong.length
    assert(recall >= 0.95,
      f"stream caught $recall%.3f of ${strong.length} strong batch pairs " +
        s"(missed ${missed.take(5).toSeq})")
    operators.Dedup.release(spark)
  }

  test("event-time TTL dedup: flags within the TTL, state expires past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    // 60-minute TTL, zero lateness so the watermark IS the max event time
    val q = StreamOps.streamingDedupTtl(
        mem.toDS().toDF("doc_id", "text", "ts"), ttlMs = 60 * 60000L,
        lateness = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_ttl").start()
    // within the TTL: identical flagging to the no-timeout form
    mem.addData((1L, "dup text", ts(60)), (2L, "dup text", ts(61)))
    q.processAllAvailable()
    // watermark jumps far past ts(1) + TTL …
    mem.addData((3L, "unrelated A", ts(400)))
    q.processAllAvailable()
    // … and the NEXT batch fires the expiry (timeouts evaluate against
    // the watermark set at the previous batch's close)
    mem.addData((4L, "unrelated B", ts(401)))
    q.processAllAvailable()
    // the re-arrival after expiry is a FRESH keeper, not a dup
    mem.addData((5L, "dup text", ts(402)))
    q.processAllAvailable()
    // and within the new slot's TTL, flagging works again
    mem.addData((6L, "dup text", ts(403)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("dedup_ttl")
      .select($"doc_id", $"keeper_id", $"is_dup")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, false), (2L, 1L, true), (3L, 3L, false), (4L, 4L, false),
      (5L, 5L, false), // state expired: fresh keeper, NOT flagged against 1
      (6L, 5L, true)), // new slot flags within its TTL
      out.toSeq.toString)
  }

  test("event-time TTL dedup: a late arrival never SHORTENS an already-set TTL") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    // 60-minute TTL with a wide lateness window so out-of-order events
    // are admitted. The keeper's newest event is ts(300), so its slot
    // must live until watermark > ts(360) — a LATE arrival at ts(185)
    // must not reset the expiry to ts(245) (the bug this pins: expiry
    // computed from only the current batch's max event time).
    val q = StreamOps.streamingDedupTtl(
        mem.toDS().toDF("doc_id", "text", "ts"), ttlMs = 60 * 60000L,
        lateness = "120 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_ttl_late").start()
    mem.addData((1L, "dup text", ts(300)))
    q.processAllAvailable() // watermark -> 180
    // late but admissible (185 >= watermark 180); slot newest stays 300
    mem.addData((2L, "dup text", ts(185)))
    q.processAllAvailable()
    // advance the watermark to 260 — past the BUGGY expiry (245) but
    // inside the correct one (360) — then let a batch evaluate timeouts
    mem.addData((3L, "unrelated A", ts(380)))
    q.processAllAvailable()
    mem.addData((4L, "unrelated B", ts(381)))
    q.processAllAvailable()
    // within TTL of the newest event (320 <= 360): must STILL flag
    mem.addData((5L, "dup text", ts(320)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("dedup_ttl_late")
      .select($"doc_id", $"keeper_id", $"is_dup")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, false),
      (2L, 1L, true),  // the late arrival itself flags normally
      (3L, 3L, false), (4L, 4L, false),
      (5L, 1L, true)), // slot survived: late event didn't shorten TTL
      out.toSeq.toString)
  }

  test("event-time TTL near-dedup: same banding within TTL, slots expire past it") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamOps.streamingNearDedupTtl(
        mem.toDS().toDF("doc_id", "text", "ts"), ttlMs = 60 * 60000L,
        tau = 0.35, lateness = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_ttl").start()
    mem.addData((1L, base, ts(60)))
    q.processAllAvailable()
    // within TTL: the exact dup flags against keeper 1
    mem.addData((2L, base, ts(61)))
    q.processAllAvailable()
    // advance the watermark far past the TTL, then let expiry fire
    mem.addData((3L, (1 to 60).map(i => s"word$i").mkString(" "), ts(400)))
    q.processAllAvailable()
    mem.addData((4L, (1 to 60).map(i => s"item$i").mkString(" "), ts(401)))
    q.processAllAvailable()
    // after expiry: the same content pairs with NOTHING (old slot gone)
    mem.addData((5L, base, ts(402)))
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("neardup_ttl")
      .select($"doc_id", $"matched_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 1L)), s"within-TTL dup not flagged: $pairs")
    assert(!pairs.exists(_._1 == 5L),
      s"doc 5 arrived after the slot's TTL and must start fresh: $pairs")
  }

  test("event-time TTL select: dup loses selection within TTL, regains it as a fresh keeper") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val good = "the quick brown fox jumps over the lazy dog " * 20
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamOps.streamingSelectTtl(
        mem.toDS().toDF("doc_id", "text", "ts"), ttlMs = 60 * 60000L,
        lateness = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("select_ttl").start()
    mem.addData((1L, good, ts(60)))
    q.processAllAvailable()
    // within the TTL the identical doc is a flagged dup, NOT selected
    mem.addData((2L, good, ts(61)))
    q.processAllAvailable()
    // advance the watermark far past the TTL, then let expiry fire
    mem.addData((3L, "unrelated filler words entirely here", ts(400)))
    q.processAllAvailable()
    mem.addData((4L, "another spacer document text", ts(401)))
    q.processAllAvailable()
    // expired slot: the same content is a FRESH keeper and selected
    mem.addData((5L, good, ts(402)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("select_ttl")
      .select($"doc_id", $"is_dup", $"selected")
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1)
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == ((false, true)), out.toSeq.toString)  // keeper, quality en
    assert(m(2L) == ((true, false)), out.toSeq.toString)  // in-TTL dup
    assert(m(5L) == ((false, true)), out.toSeq.toString)  // fresh after expiry
  }

  test("near-dedup bottom-k estimator: exact on small sets, in order, symmetric") {
    def sk(xs: Long*): Array[Long] = xs.toArray.distinct.sorted
    assert(StreamOps.bottomKJaccard(sk(1, 2, 3), sk(1, 2, 3)) === 1.0)
    assert(StreamOps.bottomKJaccard(sk(1, 2, 3, 4), sk(5, 6, 7, 8)) === 0.0)
    // |A∩B|=2, |A∪B|=4 → 0.5, exact below k
    assert(StreamOps.bottomKJaccard(sk(1, 2, 3), sk(2, 3, 9)) === 0.5)
    val a = sk((1L to 100L): _*)
    val b = sk((51L to 150L): _*)
    // true jac = 50/150 ≈ 0.333; k=32 smallest of union are 1..32, 14 shared? no:
    // union bottom-32 = 1..32, shared = 0 of those... estimator is rank-based:
    // shared among union bottom-k = |{51..100} ∩ {1..32}| = 0 → biased low here
    // by construction (disjoint low ranks) — assert only bounds + symmetry
    val e1 = StreamOps.bottomKJaccard(a, b)
    assert(e1 >= 0.0 && e1 <= 1.0 && e1 === StreamOps.bottomKJaccard(b, a))
  }

  test("streaming sessionizer == batch q_sessionize on closed sessions") {
    // the REAL events table through the stateful sessionizer: every
    // session the stream closes must match the batch window-lag
    // operator row for row; the one session per user the stream holds
    // open (no timeout flush — see the sessionize docstring) is each
    // user's LAST batch session
    val stream = StreamOps.eventsStream(spark, SparkSpecBase.sf001)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_type", $"value")
      .as[Ev]
    val q = StreamOps.sessionize(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessbatcheq").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sessbatcheq").as[(Long, Long, Long, Long)].collect()
      .map { case (u, s, e, n) => (u, s / 1000000, e / 1000000, n) }.toSet
    val batch = operators.Relational.sessionize(spark, SparkSpecBase.sf001)
      .select($"user_id", $"session_id", $"n_events", $"start_s", $"end_s")
      .as[(Long, Long, Long, Long, Long)].collect()
    val closed = batch.groupBy(_._1).values
      .flatMap(ss => ss.sortBy(_._2).dropRight(1).toSeq)
      .map { case (u, _, n, st, en) => (u, st, en, n) }.toSet
    assert(streamed == closed,
      s"streamed-only: ${(streamed -- closed).take(3)}; batch-only: ${(closed -- streamed).take(3)}")
  }

  test("streaming exact dedup flags duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingDedup(mem.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedupout").start()
    // batch 1: two copies of X (keeper = lower id) + unique Y
    mem.addData((5L, "text X"), (9L, "text X"), (7L, "text Y"))
    q.processAllAvailable()
    // batch 2: a late copy of X must be flagged against batch-1's keeper
    mem.addData((3L, "text Z"), (12L, "text X"))
    q.processAllAvailable(); q.stop()
    val out = spark.table("dedupout").as[(Long, Long, Boolean)].collect().sorted
    assert(out.toSeq == Seq(
      (3L, 3L, false), (5L, 5L, false), (7L, 7L, false),
      (9L, 5L, true), (12L, 5L, true)), out.toSeq.toString)
  }

  test("streaming pipeline select == batch q_pipeline_select on id-ordered ingest") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, SparkSpecBase.sf001)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)
    val (first, second) = docs.splitAt(docs.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingSelect(mem.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("selout").start()
    mem.addData(first.toIndexedSeq)   // two micro-batches: keeper state
    q.processAllAvailable()           // must carry across the boundary
    mem.addData(second.toIndexedSeq)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("selout")
      .filter($"selected").select($"doc_id").as[Long].collect().sorted
    val batch = operators.TextAnalysis.qPipelineSelect(spark, SparkSpecBase.sf001)
      .select($"doc_id").as[Long].collect().sorted
    assert(streamed.sameElements(batch),
      s"streaming ${streamed.length} vs batch ${batch.length}")
  }

  test("streaming semantic dedup flags cosine dups within a cell across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dim = 8
    // two far-apart centroids; vectors near each
    val cents = Array(
      (0, Array.fill(dim)(10f)), (1, Array.fill(dim)(-10f)))
    def near(base: Float, jitter: Float) =
      Array.tabulate(dim)(i => base + (if (i == 0) jitter else 0f))
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamOps.streamingSemanticDedup(
      mem.toDS().toDF("vec_id", "embedding"), cents, tau = 0.9)
      .writeStream.outputMode("append").format("memory")
      .queryName("semdup").start()
    mem.addData((1L, near(10f, 0.1f)), (2L, near(-10f, 0.1f)))
    q.processAllAvailable()
    // batch 2: a near-copy of 1 (same cell, cosine ~1), an opposite-
    // cell near-copy of 2, and an in-cell but DISSIMILAR vector
    val dissim = Array.tabulate(dim)(i => if (i % 2 == 0) 30f else -8f)
    mem.addData((3L, near(10f, 0.2f)), (4L, near(-10f, 0.3f)), (5L, dissim))
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("semdup")
      .select($"vec_id", $"matched_id", $"cell").as[(Long, Long, Int)]
      .collect().toSet
    assert(pairs.contains((3L, 1L, 0)), s"missing in-cell dup pair in $pairs")
    assert(pairs.contains((4L, 2L, 1)), s"missing cross-batch dup pair in $pairs")
    assert(!pairs.exists { case (a, b, _) => a == 5L || b == 5L },
      s"dissimilar vector flagged in $pairs")
  }

  test("event-time TTL semantic dedup: in-cell match within TTL, slots expire past it") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val dim = 8
    val cents = Array((0, Array.fill(dim)(10f)), (1, Array.fill(dim)(-10f)))
    def near(base: Float, jitter: Float) =
      Array.tabulate(dim)(i => base + (if (i == 0) jitter else 0f))
    val mem = MemoryStream[(Long, Array[Float], java.sql.Timestamp)]
    val q = StreamOps.streamingSemanticDedupTtl(
        mem.toDS().toDF("vec_id", "embedding", "ts"), cents,
        ttlMs = 60 * 60000L, tau = 0.9, lateness = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("semdup_ttl").start()
    mem.addData((1L, near(10f, 0.1f), ts(60)))
    q.processAllAvailable()
    // within TTL: the in-cell near-copy flags against keeper 1
    mem.addData((2L, near(10f, 0.2f), ts(61)))
    q.processAllAvailable()
    // advance the watermark far past cell 0's TTL through the OTHER
    // cell (touching cell 0 would refresh its newest-event time),
    // then let the expiry fire on the following batch
    mem.addData((3L, near(-10f, 0.2f), ts(400)))
    q.processAllAvailable()
    mem.addData((4L, near(-10f, 0.1f), ts(401)))
    q.processAllAvailable()
    // after expiry: the same vector pairs with NOTHING (slot gone)
    mem.addData((5L, near(10f, 0.3f), ts(402)))
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("semdup_ttl")
      .select($"vec_id", $"matched_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 1L)), s"within-TTL dup not flagged: $pairs")
    assert(!pairs.exists(_._1 == 5L),
      s"vector 5 arrived after the cell slot's TTL and must start fresh: $pairs")
  }

  test("streaming semantic dedup equals the batch within-cell pair set on the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    // unbounded keepers + one micro-batch: the streamed (arrival,
    // earlier-keeper) matches must be EXACTLY the batch operator's
    // within-cell cosine>=tau pair set (higher id flags against lower)
    val dir = SparkSpecBase.sf001
    val cents = operators.VectorQueries.seedCents(spark, dir)
    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamOps.streamingSemanticDedup(
      mem.toDS().toDF("vec_id", "embedding"), cents,
      tau = operators.Dedup.SemTau, maxKeepers = vecs.length)
      .writeStream.outputMode("append").format("memory")
      .queryName("semdup_vs_batch").start()
    mem.addData(vecs.toIndexedSeq)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("semdup_vs_batch")
      .select($"vec_id", $"matched_id").as[(Long, Long)].collect().toSet
    // batch authority, recomputed with the operator's own kernels
    val assign = operators.VectorQueries.ivfAssign(spark, dir)
      .as[(Long, Int)].collect().toMap
    val byId = vecs.toMap
    val expected = (for {
      (a, _) <- vecs; (b, _) <- vecs
      if a < b && assign(a) == assign(b) &&
        operators.Dedup.cosineSim(byId(a), byId(b)) >= operators.Dedup.SemTau
    } yield (b, a)).toSet
    assert(streamed == expected,
      s"streamed ${streamed.size} pairs != batch ${expected.size}: " +
        s"missing ${(expected -- streamed).take(5)}, " +
        s"extra ${(streamed -- expected).take(5)}")
  }

  test("streaming temperature select == batch q_sample_temperature on the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    // frozen profile trained on the SAME corpus the batch operator
    // rates — the equivalence contract: identical (doc, verdict) rows
    val profile = operators.TextAnalysis.temperatureProfile(
      Tables.documents(spark, SparkSpecBase.sf001))
    val docs = Tables.documents(spark, SparkSpecBase.sf001)
      .select($"doc_id", $"source").as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = docs.splitAt(docs.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingTemperatureSelect(
        mem.toDS().toDF("doc_id", "source"), profile)
      .writeStream.outputMode("append").format("memory")
      .queryName("tempsel").start()
    mem.addData(first.toIndexedSeq)   // two micro-batches: the verdict
    q.processAllAvailable()           // must not depend on arrival split
    mem.addData(second.toIndexedSeq)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("tempsel")
      .select($"doc_id", $"source", $"mix_w", $"samp_rate", $"sel")
      .as[(Long, String, Double, Double, Int)].collect().sortBy(_._1).toSeq
    val batch = operators.TextAnalysis.qSampleTemperature(spark, SparkSpecBase.sf001)
      .select($"doc_id", $"source", $"mix_w", $"samp_rate", $"sel")
      .as[(Long, String, Double, Double, Int)].collect().sortBy(_._1).toSeq
    assert(streamed == batch,
      s"streaming ${streamed.length} rows != batch ${batch.length}; " +
        s"first diff ${streamed.zip(batch).find(p => p._1 != p._2)}")
  }

  test("temperature select: unknown source rates 0; dedup form never re-spends budget") {
    implicit val sqlCtx = spark.sqlContext
    // web dominates chars, so tiny books caps at samp_rate 1.0
    // (0.5·4100·w_books/100 > 1) — a deterministic sel=1 for keepers
    val profile = operators.TextAnalysis.temperatureProfile(
      Seq((1L, "web", 4000L), (2L, "books", 100L))
        .toDF("doc_id", "source", "n_chars"))
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamOps.streamingTemperatureSelectDedup(
        mem.toDS().toDF("doc_id", "source", "text"), profile)
      .writeStream.outputMode("append").format("memory")
      .queryName("tempdedup").start()
    mem.addData((10L, "books", "dup text"), (11L, "wiki", "novel a"))
    q.processAllAvailable()
    mem.addData((12L, "books", "dup text")) // cross-batch duplicate
    q.processAllAvailable(); q.stop()
    val out = spark.table("tempdedup")
      .select($"doc_id", $"source", $"samp_rate", $"is_dup", $"sel")
      .as[(Long, String, Double, Boolean, Int)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    // books caps at rate 1.0 → keeper selected
    assert(byId(10L) == ((10L, "books", 1.0, false, 1)), byId(10L).toString)
    // unknown source: rate 0, never selected, loudly visible
    assert(byId(11L)._3 == 0.0 && byId(11L)._5 == 0, byId(11L).toString)
    // duplicate of 10 across the batch boundary: flagged, budget kept
    assert(byId(12L)._4 && byId(12L)._5 == 0, byId(12L).toString)
    // and the keeper's verdict matches the stateless form exactly
    val stateless = StreamOps.streamingTemperatureSelect(
      Seq((10L, "books")).toDF("doc_id", "source"), profile)
      .select($"sel").as[Int].head()
    assert(stateless == byId(10L)._5)
  }
}
