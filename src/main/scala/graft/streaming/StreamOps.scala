package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event record for typed stateful processing (µs epoch, matching the
  * batch-side `unix_micros` convention). */
case class Ev(user_id: Long, ts_us: Long, event_type: String, value: Double)

/** A closed user session emitted by the stateful sessionizer. */
case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/** One dedup decision from the streaming exact-dedup operator. */
case class DedupOut(doc_id: Long, keeper_id: Long, is_dup: Boolean)

/** One ingest-time selection verdict (streaming pipeline select). */
case class SelectOut(
    doc_id: Long, quality_score: Double, pred_lang: String,
    is_dup: Boolean, selected: Boolean)

/** One frozen-profile temperature-mixing verdict
  * ([[StreamOps.streamingTemperatureSelect]]). */
case class TempSelOut(
    doc_id: Long, source: String, mix_w: Double, samp_rate: Double, sel: Int)

/** [[TempSelOut]] with the exact-dedup keeper verdict folded in
  * ([[StreamOps.streamingTemperatureSelectDedup]]): a duplicate never
  * re-spends its source's budget. */
case class TempSelDedupOut(
    doc_id: Long, source: String, mix_w: Double, samp_rate: Double,
    is_dup: Boolean, sel: Int)

/** One near-dup candidate pair from the streaming MinHash operator:
  * `doc_id` arrived at or after `matched_id` and collided with it in
  * minhash band `band` with bottom-k-estimated Jaccard `est_jac`. */
case class NearDupOut(doc_id: Long, matched_id: Long, band: Int, est_jac: Double)

/** One matched semantic duplicate from
  * [[StreamOps.streamingSemanticDedup]]. */
case class SemDupOut(vec_id: Long, matched_id: Long, cell: Int, cos_sim: Double)

/** One exact-substring collision from the streaming substring-dedup
  * operator: `doc_id` shares the 40-character window keyed `h` with
  * the window's first-seen keeper `matched_id`. */
case class SubstrDupOut(doc_id: Long, matched_id: Long, h: Long)

/** One (band, signature)-keyed arrival for [[StreamOps.streamingNearDedup]]. */
private[streaming] case class BandRow(doc_id: Long, j: Int, sig: Long, sketch: Array[Long])

/** [[BandRow]] plus the event time the TTL variant expires against. */
private[streaming] case class BandRowTs(doc_id: Long, j: Int, sig: Long,
    sketch: Array[Long], ts: java.sql.Timestamp)

/** In-flight session state. */
case class SessionState(start_us: Long, last_us: Long, n: Long)

/** Structured Streaming operators over the events stream.
  *
  * The same transformations the batch queries run
  * ([[graft.operators.Relational.streamWindowBatch]] /
  * [[graft.operators.Relational.sessionize]]), expressed on an
  * unbounded stream: watermarked tumbling-window aggregation and a
  * `flatMapGroupsWithState` sessionizer with a 30-minute gap, emitting
  * sessions as they close. State is partitioned by user_id, so at
  * scale the state store shards across executors and each micro-batch
  * shuffles only new events — the streaming analog of the batch
  * window-partition design.
  */
object StreamOps {

  val GapUs: Long = 30L * 60 * 1000000

  /** File-based stream of the events table. The stream source needs an
    * explicit schema, and the driver's generator has shipped `ts` as
    * both TIMESTAMP(NANOS) (ns-as-long under the legacy conf) and
    * TIMESTAMP(MICROS) across rounds — so infer the schema with one
    * batch read of the same glob, then normalize exactly as the batch
    * reader does ([[graft.Tables.normalizeEventsTs]]). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source needs a directory; glob-filter to the events file
    val schema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    graft.Tables.normalizeEventsTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Watermarked tumbling-window counts per event type — the streaming
    * form of `q_stream_window`. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup — the ingest-time form of
    * [[graft.operators.Dedup.qDedupExact]]: state per content hash
    * remembers the first-seen keeper doc_id; every later arrival with
    * the same text is flagged a duplicate of that keeper (flagged, not
    * dropped, so downstream can count or reroute). State shards by
    * hash across executors and each micro-batch shuffles only its own
    * rows. Same state-retention contract as [[sessionize]]: no
    * timeout here (synchronous-drain friendly); at-scale deployments
    * use [[streamingDedupTtl]], the event-time-TTL form.
    *
    * Input: streaming (doc_id: long, text: string). Within one batch,
    * ties break to the lowest doc_id — the batch query's keeper rule. */
  def streamingDedup(docs: DataFrame): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), md5(col("text")).as("h")).as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, DedupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val ids = rows.map(_._1).toArray.sorted
          val keeper = state.getOption.getOrElse(ids.head)
          state.update(keeper)
          ids.iterator.map(id => DedupOut(id, keeper, id != keeper))
      }
  }

  /** Streaming exact-substring dedup — the ingest-time form of
    * [[graft.operators.Dedup.qDedupSubstring]] (the ExactSubstr
    * criterion): each arriving doc flat-maps to its distinct 40-char
    * window keys (the SAME 60-bit keys as the batch operator —
    * [[graft.operators.Dedup.substringWindowKeys]] is pinned
    * value-identical to the batch expression), state per window key
    * remembers the first-seen keeper doc_id, and every later arrival
    * holding that window emits a [[SubstrDupOut]] against the keeper.
    *
    * Contract vs the batch pair list: per window the stream flags
    * arrivals against the window's KEEPER only (exact-dedup
    * semantics, one long of state per distinct window — not the
    * all-pairs list the batch operator materializes), so the set of
    * docs flagged equals EXACTLY the set of docs with an
    * earlier-arriving substring partner: a batch pair (a, b), a < b,
    * shares a window whose keeper k ≤ a, so b is flagged (vs k); and
    * a flagged doc shares its window with its keeper, so it appears
    * as the later element of some batch pair. StreamingSpec pins that
    * set equality on the real documents table. State shards by window
    * key; within one batch ids process in sorted order, so the lowest
    * co-batch holder becomes keeper — the batch keeper rule. No state
    * timeout (synchronous-drain friendly); the event-time-TTL pattern
    * of [[streamingDedupTtl]] applies unchanged at scale. */
  def streamingSubstringDedup(docs: DataFrame): Dataset[SubstrDupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        graft.operators.Dedup.substringWindowKeys(text).iterator.map(h => (id, h))
      }
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, SubstrDupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (h: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val ids = rows.map(_._1).toArray.sorted
          val keeper = state.getOption.getOrElse(ids.head)
          state.update(keeper)
          ids.iterator.filter(_ != keeper)
            .map(id => SubstrDupOut(id, keeper, h))
      }
  }

  /** Bottom-k sketch size for [[streamingNearDedup]] — 32 longs of
    * state per keeper, independent of document length. */
  val SketchK = 32

  /** Keepers retained per (band, signature) state slot. Bounds state
    * at `MaxKeepers` sketches per distinct band value; an overflowing
    * slot stops ACCEPTING new keepers but keeps flagging arrivals
    * against the ones it holds (recall loss on pathological
    * collisions, never unbounded state). */
  val MaxKeepers = 8

  /** Streaming MinHash near-dedup — the ingest-time form of
    * [[graft.operators.Dedup.qDedupMinhash]]: each arriving doc is
    * shingled (word-3-grams) and banded with the SAME four minhash
    * permutations as the batch operator
    * ([[graft.operators.Dedup.MinhashPerms]] — shared constant, so
    * the two forms band identically); state per (band, signature)
    * remembers up to [[MaxKeepers]] first-seen docs as bottom-k
    * shingle sketches ([[SketchK]] smallest hashes — bounded,
    * length-independent state, unlike the full shingle sets the batch
    * verify step uses), and every later arrival colliding in a band
    * is emitted as a candidate PAIR when its bottom-k-estimated
    * Jaccard clears `tau`.
    *
    * Output is the candidate-pair stream, not a per-doc verdict: a
    * pair colliding in several bands emits once per band (Structured
    * Streaming cannot chain a per-doc aggregation behind
    * `flatMapGroupsWithState` without event-time windows), and
    * downstream sinks `dropDuplicates(doc_id, matched_id)` — the same
    * contract as the batch operator's band-candidate stage, where the
    * first-matching-band rule does the dedup instead. Within a batch,
    * docs process in id order, so co-batch pairs emit (later, earlier)
    * exactly like the batch `doc_a < doc_b` rule. Estimated (not
    * exact) Jaccard is the streaming trade: exact verification needs
    * the full shingle sets, whose state would grow with document
    * length; the bottom-k estimator's error is O(1/√k).
    * No state timeout (synchronous-drain friendly) — at-scale
    * deployments use [[streamingNearDedupTtl]], the event-time-TTL
    * form. */
  def streamingNearDedup(docs: DataFrame, tau: Double = 0.35): Dataset[NearDupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandedRows(docs, withTs = false)
      .select($"doc_id", $"j", $"sig", $"sketch").as[BandRow]
      .groupByKey(r => (r.j, r.sig))
      .flatMapGroupsWithState[List[(Long, Array[Long])], NearDupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[BandRow],
         state: GroupState[List[(Long, Array[Long])]]) =>
          val arrivals = rows.toArray.sortBy(_.doc_id)
          val (keepers, out) = nearDupMatch(state.getOption.getOrElse(Nil),
            arrivals.map(r => (r.doc_id, r.sketch)), key._1, tau)
          state.update(keepers)
          out.iterator
      }
  }

  /** Streaming SemDeDup — the ingest-time twin of
    * [[graft.operators.Dedup.qDedupSemantic]] (Abbas et al. 2023):
    * arrivals are assigned to their nearest centroid cell (the batch
    * operator's exact rule: L2 with sqrt, strict `<` over
    * id-ascending centroids → lowest cell wins ties), keyed by cell,
    * and flagged against up to `maxKeepers` held keeper vectors per
    * cell at cosine ≥ `tau` — the same keeper-slot state discipline
    * as [[streamingNearDedup]] (bounded per-cell state, re-ingested
    * ids never re-consume slots). Emits one row per (arrival, keeper)
    * semantic-duplicate match.
    *
    * `cents` is the frozen centroid set (at scale: the sampled
    * k-means centroids the batch pipeline trains — a stream can't
    * derive centroids from data it hasn't seen). With unbounded
    * keepers and a single micro-batch the emitted pair set equals the
    * batch operator's within-cell τ-pair set exactly (StreamingSpec
    * pins this on the real corpus); bounded keepers trade the tail of
    * each cell for O(cells·maxKeepers·dim) total state. */
  def streamingSemanticDedup(vecs: DataFrame,
      cents: Array[(Int, Array[Float])], tau: Double = 0.3,
      maxKeepers: Int = MaxKeepers): Dataset[SemDupOut] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    semCellAssigned(vecs, cents, withTs = false)
      .as[(Long, Array[Float], Int)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[List[(Long, Array[Float])], SemDupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cell: Int, rows: Iterator[(Long, Array[Float], Int)],
         state: GroupState[List[(Long, Array[Float])]]) =>
          val (keepers, out) = semMatch(state.getOption.getOrElse(Nil),
            rows.toArray.sortBy(_._1).map(r => (r._1, r._2)),
            cell, tau, maxKeepers)
          state.update(keepers)
          out.iterator
      }
  }

  /** Event-time-TTL semantic dedup — the at-scale ingest form, the
    * [[streamingNearDedupTtl]] discipline applied to cell-keyed
    * keeper vectors: input carries an event-time `ts` column, and a
    * cell's keeper slots EXPIRE once the watermark passes its newest
    * event + `ttlMs`. Matching within the TTL is identical to
    * [[streamingSemanticDedup]] (shared assignment expression +
    * [[semMatch]]); after expiry a re-arrival starts a fresh cell
    * slate — the bounded-state trade, explicit. */
  def streamingSemanticDedupTtl(vecs: DataFrame,
      cents: Array[(Int, Array[Float])], ttlMs: Long, tau: Double = 0.3,
      maxKeepers: Int = MaxKeepers,
      lateness: String = "10 minutes"): Dataset[SemDupOut] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    semCellAssigned(vecs, cents, withTs = true)
      .withWatermark("ts", lateness)
      .as[(Long, Array[Float], Int, java.sql.Timestamp)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[(List[(Long, Array[Float])], Long), SemDupOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (cell: Int, rows: Iterator[(Long, Array[Float], Int, java.sql.Timestamp)],
         state: GroupState[(List[(Long, Array[Float])], Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = rows.toArray.sortBy(_._1)
            val (prevKeepers, prevMax) =
              state.getOption.getOrElse((Nil, Long.MinValue))
            val (keepers, out) = semMatch(prevKeepers,
              arrivals.map(r => (r._1, r._2)), cell, tau, maxKeepers)
            val maxMs = math.max(prevMax, arrivals.map(_._4.getTime).max)
            state.update((keepers, maxMs))
            setEventTimeTtl(state, maxMs, ttlMs)
            out.iterator
          }
      }
  }

  /** Shared assignment projection of both semantic-dedup forms: the
    * batch operator's own codegen'd nearest-cell expression
    * ([[graft.functions.VectorExprs.nearestCell]] — bit-identical
    * rule, no serde boundary, and the `ts` column survives for the
    * TTL form's watermark). */
  private def semCellAssigned(vecs: DataFrame,
      cents: Array[(Int, Array[Float])], withTs: Boolean): DataFrame = {
    val cols = Seq(col("vec_id").cast("long").as("vec_id"), col("embedding"),
      graft.functions.VectorExprs.nearestCell(col("embedding"), cents.sortBy(_._1))
        .as("cell")) ++ (if (withTs) Seq(col("ts")) else Nil)
    vecs.select(cols: _*)
  }

  /** Keeper-slot matching shared by both semantic-dedup forms — the
    * [[nearDupMatch]] discipline over raw vectors + the batch cosine
    * kernel. */
  private def semMatch(keepers0: List[(Long, Array[Float])],
      arrivals: Seq[(Long, Array[Float])], cell: Int, tau: Double,
      maxKeepers: Int): (List[(Long, Array[Float])], Seq[SemDupOut]) = {
    var keepers = keepers0
    val out = Seq.newBuilder[SemDupOut]
    arrivals.foreach { case (id, v) =>
      keepers.foreach { case (kid, kv) =>
        if (kid != id) {
          val sim = graft.operators.Dedup.cosineSim(kv, v)
          if (sim >= tau)
            out += SemDupOut(id, kid, cell, math.rint(sim * 1e4) / 1e4)
        }
      }
      if (keepers.size < maxKeepers && !keepers.exists(_._1 == id))
        keepers = keepers :+ ((id, v))
    }
    (keepers, out.result())
  }

  /** The shared banding pipeline of both near-dedup forms: shingle →
    * bottom-k sketch → the batch operator's four minhash permutations
    * → one row per (band, signature). `withTs` threads the event-time
    * column through for the TTL variant's watermark/expiry. */
  private def bandedRows(docs: DataFrame, withTs: Boolean): DataFrame = {
    import graft.functions.SharedHash
    val perms = graft.operators.Dedup.MinhashPerms
    val sigCols = perms.zipWithIndex
      .map { case (p, j) => s"${SharedHash.sparkMinhash("sh", p)} AS sig_$j" }
    val stackArgs = perms.indices.map(j => s"$j, sig_$j").mkString(", ")
    val tsCol = if (withTs) Seq("ts") else Nil
    docs
      .withColumn("sh", graft.functions.HashExprs.wordShingleHashes(col("text"), 3))
      .filter(size(col("sh")) >= 1)
      // WordShingleHashes emits DISTINCT, ASCENDING-SORTED hashes
      // (TreeSet-built), so its k-prefix IS the bottom-k sketch — no
      // re-sort on the ingest hot path
      .withColumn("sketch", slice(col("sh"), 1, SketchK))
      .selectExpr(Seq("doc_id", "sketch") ++ tsCol ++ sigCols: _*)
      .selectExpr(Seq("doc_id", "sketch") ++ tsCol ++
        Seq(s"stack(${perms.size}, $stackArgs) AS (j, sig)"): _*)
  }

  /** Keeper-slot matching shared by both near-dedup forms: flag each
    * arrival against the held keepers, then admit it while slots
    * remain (never re-admitting a re-ingested doc_id). */
  private def nearDupMatch(keepers0: List[(Long, Array[Long])],
      arrivals: Seq[(Long, Array[Long])], band: Int, tau: Double)
      : (List[(Long, Array[Long])], Seq[NearDupOut]) = {
    var keepers = keepers0
    val out = Seq.newBuilder[NearDupOut]
    arrivals.foreach { case (id, sketch) =>
      keepers.foreach { case (kid, ksk) =>
        if (kid != id) {
          val est = bottomKJaccard(ksk, sketch)
          if (est >= tau) out += NearDupOut(id, kid, band, est)
        }
      }
      // a re-ingested doc_id must not re-consume keeper slots:
      // duplicate appends would fill the slot with copies of one
      // popular doc (starving every later genuine keeper) and
      // emit each match once per stored copy
      if (keepers.size < MaxKeepers && !keepers.exists(_._1 == id))
        keepers = keepers :+ ((id, sketch))
    }
    (keepers, out.result())
  }

  /** Event-time-TTL near-dedup — the at-scale ingest form the
    * NoTimeout variant's docs promise: input carries an event-time
    * `ts` column, and a (band, signature) slot EXPIRES once the
    * watermark passes its newest event + `ttlMs`. Flagging within the
    * TTL is identical to [[streamingNearDedup]] (same banding, same
    * keeper rule — both ride [[bandedRows]]/[[nearDupMatch]]); after
    * expiry a re-arrival starts a fresh slot, so a duplicate
    * separated from its original by more than the TTL of silence goes
    * unflagged — the bounded-state trade, explicit.
    *
    * Event-time (not processing-time) expiry is deliberate: timeouts
    * fire from watermark advancement CARRIED BY DATA, so synchronous
    * drains (`processAllAvailable`) still quiesce — the revert
    * rationale on [[sessionize]] doesn't apply.
    *
    * STATE-FORMAT NOTE (applies to this and [[streamingDedupTtl]]/
    * [[streamingSelectTtl]]): the late-arrival fix widened the
    * GroupState encoding to carry the newest-event time — here
    * `List → (List, Long)`, in the exact form `Long → (Long, Long)`.
    * A streaming query restarted from a checkpoint written by the
    * pre-fix code will fail or misdecode its state; discard such
    * checkpoints (or run the new query under a fresh
    * checkpointLocation). */
  def streamingNearDedupTtl(docs: DataFrame, ttlMs: Long, tau: Double = 0.35,
      lateness: String = "10 minutes"): Dataset[NearDupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandedRows(docs, withTs = true)
      .withWatermark("ts", lateness)
      .select($"doc_id", $"j", $"sig", $"sketch", $"ts").as[BandRowTs]
      .groupByKey(r => (r.j, r.sig))
      .flatMapGroupsWithState[(List[(Long, Array[Long])], Long), NearDupOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), rows: Iterator[BandRowTs],
         state: GroupState[(List[(Long, Array[Long])], Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = rows.toArray.sortBy(_.doc_id)
            val (prevKeepers, prevMax) =
              state.getOption.getOrElse((Nil, Long.MinValue))
            val (keepers, out) = nearDupMatch(prevKeepers,
              arrivals.map(r => (r.doc_id, r.sketch)), key._1, tau)
            val maxMs = math.max(prevMax, arrivals.map(_.ts.getTime).max)
            state.update((keepers, maxMs))
            setEventTimeTtl(state, maxMs, ttlMs)
            out.iterator
          }
      }
  }

  /** Event-time-TTL exact dedup — same contract as
    * [[streamingNearDedupTtl]]: keeper state per content hash expires
    * `ttlMs` past its newest event's time; within the TTL the keeper
    * rule is identical to [[streamingDedup]]. */
  def streamingDedupTtl(docs: DataFrame, ttlMs: Long,
      lateness: String = "10 minutes"): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), md5(col("text")).as("h"), col("ts"))
      .withWatermark("ts", lateness)
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Long), DedupOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arr = rows.toArray
            val ids = arr.map(_._1).sorted
            val (keeper, prevMax) =
              state.getOption.getOrElse((ids.head, Long.MinValue))
            val maxMs = math.max(prevMax, arr.map(_._3.getTime).max)
            state.update((keeper, maxMs))
            setEventTimeTtl(state, maxMs, ttlMs)
            ids.iterator.map(id => DedupOut(id, keeper, id != keeper))
          }
      }
  }

  /** Set state expiry to `ttlMs` past the group's newest event,
    * floored just above the current watermark —
    * `setTimeoutTimestamp` rejects timestamps at or below it (a group
    * whose only arrivals were almost-too-late events could otherwise
    * compute an already-passed expiry and crash the batch).
    *
    * `maxEventMs` must be the max event time over the group's WHOLE
    * lifetime, not just the current batch — every caller threads a
    * running max through its state — so a late out-of-order arrival
    * never shortens an already-set expiry (it would otherwise reset
    * the timeout to lateEvent + ttl, expiring the keeper up to the
    * watermark-lateness window early). */
  private def setEventTimeTtl(state: GroupState[_], maxEventMs: Long,
      ttlMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(maxEventMs + ttlMs, state.getCurrentWatermarkMs() + 1))

  /** Bottom-k Jaccard estimate over two ascending-sorted distinct
    * bottom-k sketches: among the k smallest hashes of the UNION,
    * the fraction present in both sets. Exact when both sets have
    * ≤ k elements; O(1/√k) error otherwise. */
  private[graft] def bottomKJaccard(a: Array[Long], b: Array[Long]): Double = {
    val k = SketchK
    var ia = 0; var ib = 0; var taken = 0; var shared = 0
    while (taken < k && (ia < a.length || ib < b.length)) {
      val va = if (ia < a.length) a(ia) else Long.MaxValue
      val vb = if (ib < b.length) b(ib) else Long.MaxValue
      if (va == vb) { shared += 1; ia += 1; ib += 1 }
      else if (va < vb) ia += 1
      else ib += 1
      taken += 1
    }
    if (taken == 0) 0.0 else shared.toDouble / taken
  }

  /** Ingest-time training-set selection — the streaming form of
    * [[graft.operators.TextAnalysis.qPipelineSelect]]: every micro-
    * batch is scored statelessly with the SAME quality/language
    * column helpers the batch operator uses (one shared projection,
    * [[graft.operators.TextAnalysis.scoreForSelect]], so the two
    * forms cannot drift), then the exact-dedup keeper state flags
    * duplicates across batches, and `selected` = keeper ∧ English ∧
    * quality ≥ 0.5. Docs are flagged, not dropped, so downstream can
    * count or reroute rejects.
    *
    * Keeper rule: first-seen content hash wins (lowest doc_id within
    * a batch) — identical to the batch min-doc_id rule whenever
    * ingest is id-ordered, the same contract as [[streamingDedup]].
    * State shards by content hash across executors. */
  def streamingSelect(docs: DataFrame): Dataset[SelectOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = graft.operators.TextAnalysis.scoreForSelect(docs)
      .as[(Long, String, Double, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, SelectOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String, Double, String)],
         state: GroupState[Long]) =>
          val sorted = rows.toArray.sortBy(_._1)
          val keeper = state.getOption.getOrElse(sorted.head._1)
          state.update(keeper)
          sorted.iterator.map { case (id, _, q, l) =>
            val dup = id != keeper
            SelectOut(id, q, l, dup, !dup && l == "en" && q >= 0.5)
          }
      }
    // scoreForSelect (via withQualityCols) drops empty/whitespace-only
    // docs from scoring; the flagged-not-dropped contract still owes
    // downstream a verdict row for them — rejected, stateless (an
    // empty doc can never be a keeper or selected). The predicate is
    // TextAnalysis's own complement expression, so the scored/empties
    // partition rides ONE tokenizer definition (incl. the NULL-text
    // rule) and every doc gets exactly one verdict row.
    val empties = docs
      .where(expr(graft.operators.TextAnalysis.NoWordsPredicate))
      .select(col("doc_id").cast("long")).as[Long]
      .map(id => SelectOut(id, 0.0, "und", is_dup = false, selected = false))
    scored.union(empties)
  }

  /** Event-time-TTL ingest selection — completes the TTL trio
    * ([[streamingDedupTtl]]/[[streamingNearDedupTtl]]): input carries
    * an event-time `ts` column; the keeper slot for a content hash
    * expires `ttlMs` past its newest event, after which a re-ingested
    * identical document becomes a fresh keeper (and `selected` again
    * if it passes the gates) instead of being flagged against a
    * long-gone original. Scoring rides the SAME shared projection as
    * the batch operator and [[streamingSelect]]
    * ([[graft.operators.TextAnalysis.scoreForSelect]] with the ts
    * column threaded through), so the three forms cannot drift. */
  def streamingSelectTtl(docs: DataFrame, ttlMs: Long,
      lateness: String = "10 minutes"): Dataset[SelectOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = graft.operators.TextAnalysis.scoreForSelect(docs, extra = Seq("ts"))
      .withWatermark("ts", lateness)
      .as[(Long, String, Double, String, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Long), SelectOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[(Long, String, Double, String, java.sql.Timestamp)],
         state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toArray.sortBy(_._1)
            val (keeper, prevMax) =
              state.getOption.getOrElse((sorted.head._1, Long.MinValue))
            val maxMs = math.max(prevMax, sorted.map(_._5.getTime).max)
            state.update((keeper, maxMs))
            setEventTimeTtl(state, maxMs, ttlMs)
            sorted.iterator.map { case (id, _, q, l, _) =>
              val dup = id != keeper
              SelectOut(id, q, l, dup, !dup && l == "en" && q >= 0.5)
            }
          }
      }
    // same empty-doc verdict contract as streamingSelect: stateless,
    // rejected, one row per doc
    val empties = docs
      .where(expr(graft.operators.TextAnalysis.NoWordsPredicate))
      .select(col("doc_id").cast("long")).as[Long]
      .map(id => SelectOut(id, 0.0, "und", is_dup = false, selected = false))
    scored.union(empties)
  }

  /** Ingest-time temperature mixing — the streaming twin of
    * [[graft.operators.TextAnalysis.qSampleTemperature]]. The
    * per-source rates are NOT recomputed per micro-batch: they come
    * FROZEN from a batch-trained `profile`
    * ([[graft.operators.TextAnalysis.temperatureProfile]] over the
    * profile corpus) — a training-data mix is a property of the
    * corpus the run was planned against, not of arrival order, and
    * per-batch totals would swing the rates batch to batch. Selection
    * is the SAME deterministic hash rate as the batch operator (one
    * shared expression, [[graft.operators.TextAnalysis.MixHashExpr]]),
    * so a doc's verdict is identical in both forms — StreamingSpec
    * pins row equality on the real corpus.
    *
    * Stateless and map-only (one broadcast-joined projection): no
    * state store, no shuffle of documents — the property that lets
    * this run at ingest line rate. A source absent from the profile
    * selects at rate 0 (unknown budget ⇒ keep nothing, loudly
    * visible in the samp_rate column, rather than guess). */
  def streamingTemperatureSelect(docs: DataFrame,
      profile: DataFrame): Dataset[TempSelOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val T = graft.operators.TextAnalysis
    docs.select(col("doc_id").cast("long").as("doc_id"), col("source"),
        expr(T.MixHashExpr).as("h"))
      .join(broadcast(profile), Seq("source"), "left")
      .select($"doc_id", $"source",
        coalesce($"mix_w", lit(0.0)).as("mix_w"),
        coalesce($"samp_rate", lit(0.0)).as("samp_rate"),
        when($"h" % T.MixHashMod < coalesce($"thr", lit(0L)), 1).otherwise(0)
          .cast("int").as("sel"))
      .as[TempSelOut]
  }

  /** [[streamingTemperatureSelect]] composed with the exact-dedup
    * keeper state ([[streamingDedup]]'s contract): a re-ingested
    * duplicate (same md5(text) as an earlier keeper) never re-spends
    * the source budget — its `sel` is forced 0 and `is_dup` marks
    * why. The rate verdict itself stays the frozen-profile hash rule,
    * so `sel` for keepers is byte-identical to the stateless form.
    * Input: streaming (doc_id, source, text). State: one long per
    * distinct content hash, sharded by hash across executors. */
  def streamingTemperatureSelectDedup(docs: DataFrame,
      profile: DataFrame): Dataset[TempSelDedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val T = graft.operators.TextAnalysis
    // ONE projection carries the rate verdict AND the content hash
    // (a join of the rated stream back onto `docs` would be a
    // stream-stream self-join — unsupported in append mode without
    // watermarks, and pointless when both sides are the same scan)
    val rated = docs.select(col("doc_id").cast("long").as("doc_id"),
        col("source"), expr(T.MixHashExpr).as("h"), md5(col("text")).as("ch"))
      .join(broadcast(profile), Seq("source"), "left")
      .select($"doc_id", $"source",
        coalesce($"mix_w", lit(0.0)).as("mix_w"),
        coalesce($"samp_rate", lit(0.0)).as("samp_rate"),
        when($"h" % T.MixHashMod < coalesce($"thr", lit(0L)), 1).otherwise(0)
          .cast("int").as("sel"), $"ch")
      .as[(Long, String, Double, Double, Int, String)]
    rated.groupByKey(_._6)
      .flatMapGroupsWithState[Long, TempSelDedupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String, Double, Double, Int, String)],
         state: GroupState[Long]) =>
          val sorted = rows.toArray.sortBy(_._1)
          val keeper = state.getOption.getOrElse(sorted.head._1)
          state.update(keeper)
          sorted.iterator.map { case (id, src, w, r, sel, _) =>
            val dup = id != keeper
            TempSelDedupOut(id, src, w, r, dup, if (dup) 0 else sel)
          }
      }
  }

  /** Stateful sessionizer: 30-minute inactivity gap. Each micro-batch
    * is fully gap-merged WITH the open interval: the group keeps a
    * sorted list of disjoint (> gap apart) session intervals, every
    * event extends the interval it falls within one gap of (possibly
    * bridging two intervals into one), and at batch end every
    * interval except the latest is emitted — the latest stays open in
    * state. Within a micro-batch this is EXACTLY the batch operator's
    * closure (co-batch stragglers that chain within the gap merge
    * into one session; a run of early events more than the gap before
    * everything else emits as its own session, not singletons).
    * The remaining, documented deviation is cross-batch only: an
    * already-emitted session cannot merge with a straggler arriving
    * in a LATER batch beyond the gap (the alternative,
    * watermark-buffered emission, holds every event until the
    * watermark passes).
    *
    * Known contract: the LAST session of a user who never returns is
    * held open in state (no timeout flush). A processing-time-timeout
    * flush was tried and reverted — with ProcessingTimeTimeout,
    * `processAllAvailable` never quiesces under Spark 4.1's
    * micro-batch engine, which breaks synchronous drains. At-scale
    * deployments should either watermark with an event-time-timeout
    * variant or close residual sessions in a final batch pass. */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val iv = scala.collection.mutable.ArrayBuffer.empty[SessionState]
          state.getOption.foreach(iv += _)
          for (e <- evs.toSeq.sortBy(_.ts_us)) {
            // first interval e could chain to (everything earlier ends
            // more than a gap before e)
            var i = 0
            while (i < iv.length && iv(i).last_us + GapUs < e.ts_us) i += 1
            if (i == iv.length) iv += SessionState(e.ts_us, e.ts_us, 1)
            else if (e.ts_us >= iv(i).start_us - GapUs) {
              // extends iv(i) (inside it or within one gap of it)
              iv(i) = SessionState(math.min(iv(i).start_us, e.ts_us),
                math.max(iv(i).last_us, e.ts_us), iv(i).n + 1)
              // the grown interval may now bridge into its successor
              while (i + 1 < iv.length &&
                  iv(i + 1).start_us - iv(i).last_us <= GapUs) {
                iv(i) = SessionState(iv(i).start_us,
                  math.max(iv(i).last_us, iv(i + 1).last_us),
                  iv(i).n + iv(i + 1).n)
                iv.remove(i + 1)
              }
            } else iv.insert(i, SessionState(e.ts_us, e.ts_us, 1))
          }
          val out = iv.dropRight(1)
            .map(s => SessionOut(user, s.start_us, s.last_us, s.n))
          iv.lastOption.foreach(state.update)
          out.iterator
      }
  }
}
