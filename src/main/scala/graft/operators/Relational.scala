package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational / analytics core: aggregation, multi-join with broadcast
  * dims, window functions, sessionization, as-of join, tumbling-window
  * event aggregation.
  *
  * Scale notes (100 TB):
  *  - `q1_agg` is a single hash aggregate with map-side partial
  *    aggregation; the shuffle carries only (group keys × partial
  *    state), never rows.
  *  - `q_join_topn` broadcasts every dimension table (nation,
  *    customer); only the lineitem⋈orders join shuffles, on the join
  *    key both sides already agree on.
  *  - Window queries partition by a high-cardinality key (suppkey /
  *    user_id) so the sort stays per-partition and parallel.
  *
  * Float policy: double aggregates are rounded identically in the
  * Spark query and the DuckDB oracle — 4 decimals normally, 2 for the
  * largest currency sums (Σ over 10⁵+ rows of ~10³ values), where
  * summation-order noise can approach the 1e-4 granularity.
  */
object Relational {

  /** PlanCache family tag (percentile ranged input). */
  private[graft] val Family = "relational"

  /** Drop the family's caches — see [[graft.PlanCache]]. */
  def release(s: SparkSession): Unit = graft.PlanCache.release(s, Family)

  /** TPC-H Q1-style pricing summary (filter pushdown + hash agg). */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_discount), 4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue by nation over one order-year; dims broadcast. */
  def joinTopN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
      .limit(10)
  }

  val joinTopNSql: String =
    """SELECT n_name,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name
      |LIMIT 10""".stripMargin

  /** Per-supplier running revenue + row rank (deterministic ordering
    * key: shipdate, orderkey, linenumber).
    *
    * r18: `rn <= 5` means only each supplier's FIRST five rows (by
    * the tie-free composite key) can reach the output, so the whole
    * rank+running-sum window collapses to the bounded
    * [[graft.operators.FirstKAgg]] partial aggregate. Even with
    * Spark's WindowGroupLimit pushdown the window form must SORT each
    * whole scan partition on the map side before the partial group
    * limit runs — a full per-task sort (and its spill risk) of every
    * input partition at 100 TB. The aggregate keeps ≤5 rows per
    * (suppkey, partition) in a bounded buffer instead: O(n·log k) per
    * task, no sort, and the same ≤k-rows-per-group exchange. The
    * running sum is accumulated left-to-right over the kept rows in
    * rank order — the exact addition order of the window frame — and
    * rounded by the same Spark round(…, 4). */
  def windowFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // l_shipdate is TIMESTAMP_NTZ; the NTZ→LTZ cast under the mains'
    // pinned UTC session timezone is a pure reinterpretation, so the
    // micros key orders exactly like the timestamp itself
    val top = TopK.firstK(5)(
      unix_micros($"l_shipdate".cast("timestamp_ltz")), $"l_orderkey",
      $"l_linenumber", $"l_extendedprice")
    Tables.lineitem(s, dir)
      .select($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
        $"l_extendedprice")
      .groupBy($"l_suppkey")
      .agg(top.as("t"))
      .select($"l_suppkey",
        posexplode(arrays_zip($"t.oks", $"t.lns", $"t.runs")))
      .select($"l_suppkey", ($"pos" + 1).cast("int").as("rn"),
        $"col.oks".as("l_orderkey"), $"col.lns".as("l_linenumber"),
        round($"col.runs", 4).as("running_rev"))
      .orderBy($"l_suppkey", $"rn")
  }

  /** The rank+running-sum window reference for [[windowFuncs]] —
    * exactly the oracle SQL's shape. Used by WindowCollapseSpec to pin
    * equivalence of the FirstKAgg form; not registered as a query. */
  private[graft] def windowFuncsWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_rev",
        round(sum($"l_extendedprice").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
      .filter($"rn" <= 5)
      .select($"l_suppkey", $"rn", $"l_orderkey", $"l_linenumber", $"running_rev")
      .orderBy($"l_suppkey", $"rn")
  }

  val windowFuncsSql: String =
    """WITH t AS (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    row_number() OVER w AS rn,
      |    round(sum(l_extendedprice) OVER (
      |      PARTITION BY l_suppkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_rev
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      |)
      |SELECT l_suppkey, rn, l_orderkey, l_linenumber, running_rev
      |FROM t WHERE rn <= 5
      |ORDER BY l_suppkey, rn""".stripMargin

  /** Sessionization: 30-minute inactivity gap splits a user's event
    * stream into sessions (lag + cumulative-sum of session starts). */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    Tables.events(s, dir)
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("prev_us", lag($"ts_us", 1).over(wOrd))
      .withColumn("is_new",
        when($"prev_us".isNull ||
          $"ts_us" - $"prev_us" > graft.streaming.StreamOps.GapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum($"is_new").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (min($"ts_us") / 1000000L).cast("long").as("start_s"),
        (max($"ts_us") / 1000000L).cast("long").as("end_s"))
      .orderBy($"user_id", $"session_id")
  }

  val sessionizeSql: String =
    s"""WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events
      |), m AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > ${graft.streaming.StreamOps.GapUs} THEN 1 ELSE 0 END AS is_new
      |  FROM e
      |), sflag AS (
      |  SELECT user_id, ts_us,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM m
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  CAST(floor(min(ts_us) / 1000000) AS BIGINT) AS start_s,
      |  CAST(floor(max(ts_us) / 1000000) AS BIGINT) AS end_s
      |FROM sflag GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Exact per-type value percentiles (p50/p95/p99) via rank selection:
    * percentile q = value at row_number ceil(q·n) in (value, event_id)
    * order — deterministic and engine-replayable, unlike approximate
    * sketches.
    *
    * Execution is distributed selection, NOT a window over the
    * low-cardinality `event_type` key (~5 types → 5 tasks sorting
    * everything — the r3 100 TB scale-killer):
    *   1. range-repartition by (event_type, value, event_id), sort
    *      within partitions — each partition sorts only its slice;
    *   2. per-(partition, type) row counts collected — O(partitions ×
    *      types) rows, independent of corpus size;
    *   3. from the counts: per-type totals n, target ranks ceil(q·n),
    *      and each partition's per-type global start rank, broadcast;
    *   4. a map-only second pass emits exactly the rows whose global
    *      rank is a target — ≤ 3 rows per type leave the executors.
    * The cached repartitioned input pins one partition layout across
    * both passes (range sampling is not stable across independent
    * materializations). The selected VALUE is rank-determined even
    * with duplicate values split across partitions: ties are broken by
    * event_id in the range key, and equal-value rows carry the same
    * value regardless of which one the rank lands on.
    * [[valuePctlWindow]] keeps the window form as the semantic spec;
    * ValuePctlSpec pins equivalence. */
  def valuePctl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ranged = graft.PlanCache.getOrBuild(s, Family, s"pctlRanged:$dir")(
      Tables.events(s, dir)
        .select($"event_type", $"value", $"event_id")
        .repartitionByRange($"event_type", $"value", $"event_id")
        .sortWithinPartitions($"event_type", $"value", $"event_id")
        .as[(String, Double, Long)])
    val counts: Array[(Int, String, Long)] = ranged.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (t, _, _) => m.update(t, m.getOrElse(t, 0L) + 1L) }
        m.iterator.map { case (t, c) => (pid, t, c) }
      }.collect()
    val nByType: Map[String, Long] =
      counts.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._3).sum }
    // target global ranks per type; several percentiles can land on
    // the same rank for small n, so ranks map to a LIST of labels
    val targets: Map[String, Map[Long, Seq[String]]] = nByType.map { case (t, n) =>
      val want = Seq(
        "p50" -> math.ceil(n * 0.5).toLong,
        "p95" -> math.ceil(n * 0.95).toLong,
        "p99" -> math.ceil(n * 0.99).toLong)
      t -> want.groupBy(_._2).map { case (r, qs) => r -> qs.map(_._1) }
    }
    val startRank: Map[(Int, String), Long] = counts.groupBy(_._2).iterator
      .flatMap { case (t, rows) =>
        var run = 0L
        rows.sortBy(_._1).iterator.map { case (pid, _, c) =>
          val entry = ((pid, t), run); run += c; entry
        }
      }.toMap
    val bcStart = s.sparkContext.broadcast(startRank)
    val bcTargets = s.sparkContext.broadcast(targets)
    val hits = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var curType: String = null
      var rank = 0L
      it.flatMap { case (t, v, _) =>
        if (t != curType) { curType = t; rank = bcStart.value.getOrElse((pid, t), 0L) }
        rank += 1
        bcTargets.value(t).getOrElse(rank, Nil).map(q => (t, q, v))
      }
    }
    val nDf = nByType.toSeq.toDF("event_type", "n_events")
    s.createDataset(hits).toDF("event_type", "q", "value")
      .groupBy($"event_type")
      .agg(
        round(max(when($"q" === "p50", $"value")), 4).as("p50"),
        round(max(when($"q" === "p95", $"value")), 4).as("p95"),
        round(max(when($"q" === "p99", $"value")), 4).as("p99"))
      .join(broadcast(nDf), "event_type")
      .select($"event_type", $"n_events", $"p50", $"p95", $"p99")
      .orderBy($"event_type")
  }

  /** The one-window semantic reference for [[valuePctl]] — exactly the
    * oracle SQL's shape. Used by ValuePctlSpec to pin equivalence of
    * the distributed-selection form; not registered as a query. */
  private[graft] def valuePctlWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    val wAll = Window.partitionBy($"event_type")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy($"event_type")
      .agg(
        max($"n").as("n_events"),
        round(max(when($"rn" === ceil($"n" * 0.5), $"value")), 4).as("p50"),
        round(max(when($"rn" === ceil($"n" * 0.95), $"value")), 4).as("p95"),
        round(max(when($"rn" === ceil($"n" * 0.99), $"value")), 4).as("p99"))
      .orderBy($"event_type")
  }

  val valuePctlSql: String =
    """WITH r AS (
      |  SELECT event_type, value, event_id,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |)
      |SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
      |  round(max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END), 4) AS p50,
      |  round(max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN value END), 4) AS p95,
      |  round(max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN value END), 4) AS p99
      |FROM r GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Conversion funnel: per user, the first `signup` and the first
    * `purchase` at-or-after it; completers within 24 h reported with
    * their latency — the ordered-sequence analytic every event
    * pipeline runs. Shape: two filtered hash aggregations joined on
    * user_id (both sides arrive hash-partitioned by user_id from
    * their own aggregation, so the joins add no extra exchange); no
    * windows, no per-event blow-up. */
  private val FunnelCapUs = 86400000000L // 24 h

  def funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros($"ts"))
    val first = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts_us").as("signup_us"))
    ev.filter($"event_type" === "purchase")
      .join(first, "user_id")
      .filter($"ts_us" >= $"signup_us")
      .groupBy($"user_id", $"signup_us").agg(min($"ts_us").as("purchase_us"))
      .withColumn("delta_us", $"purchase_us" - $"signup_us")
      .filter($"delta_us" <= FunnelCapUs)
      .orderBy($"user_id")
  }

  val funnelSql: String =
    s"""WITH s AS (
       |  SELECT user_id, min(epoch_us(ts)) AS signup_us
       |  FROM events WHERE event_type = 'signup' GROUP BY user_id
       |), p AS (
       |  SELECT e.user_id, s.signup_us, min(epoch_us(e.ts)) AS purchase_us
       |  FROM events e JOIN s USING (user_id)
       |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
       |  GROUP BY e.user_id, s.signup_us
       |)
       |SELECT user_id, signup_us, purchase_us,
       |  purchase_us - signup_us AS delta_us
       |FROM p WHERE purchase_us - signup_us <= $FunnelCapUs
       |ORDER BY user_id""".stripMargin

  /** As-of join: each purchase event matched to the latest strictly
    * earlier click of the same user.
    *
    * Implemented Spark-first as the sort-based union trick (tag both
    * sides, one window pass) instead of a join + per-key blow-up:
    * shuffle = one partition-by-user sort, no O(clicks×purchases)
    * intermediate. Clicks are deduped to max event_id per (user, ts)
    * so the tie rule is engine-independent.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros($"ts"))
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts_us")
      .agg(max($"event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us", $"event_id".as("purchase_id"))
    // kind 0 = purchase, 1 = click: at equal ts the click sorts AFTER
    // the purchase, so "rows preceding current" = strictly-earlier clicks.
    val tagged = purchases
      .select($"user_id", $"ts_us", lit(0).as("kind"), lit(null).cast("long").as("click_id"),
        $"purchase_id")
      .unionByName(clicks
        .select($"user_id", $"ts_us", lit(1).as("kind"), $"click_id",
          lit(null).cast("long").as("purchase_id")))
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click", last($"click_id", ignoreNulls = true).over(w))
      .filter($"purchase_id".isNotNull)
      .select($"user_id", $"purchase_id", $"last_click".as("click_id"))
      .orderBy($"user_id", $"purchase_id")
  }

  val asofJoinSql: String =
    """WITH c AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
      |), p AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id AS purchase_id
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.user_id AS user_id, p.purchase_id AS purchase_id, c.click_id AS click_id
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us > c.ts_us
      |ORDER BY user_id, purchase_id""".stripMargin

  /** Tumbling 1-hour windows per event type — the batch-equivalent of
    * the Structured Streaming pipeline in [[graft.streaming.StreamOps]]. */
  def streamWindowBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
      .orderBy($"window_start", $"event_type")
  }

  val streamWindowBatchSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      | count(*) AS n, round(sum(value), 4) AS total_value
      |FROM events
      |GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY window_start, event_type""".stripMargin

  /** Semi-structured props: JSON payload per event → typed extraction
    * + aggregate (the props column is schemaless by design; extraction
    * happens at scan time and stays in the projection). */
  def eventsJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        round(avg($"k"), 4).as("avg_k"))
      .orderBy($"event_type")
  }

  val eventsJsonSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 4) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Two-stage salted aggregation — the skew pattern: a hot group key
    * is split across 8 salt buckets for the first (heavy) aggregation,
    * then the tiny per-salt partials are combined. At 100 TB a skewed
    * event_type would otherwise pin one reducer; with the salt the
    * wide shuffle is uniform and the second stage moves 8 rows per
    * group. Results are identical to the direct aggregate — which is
    * exactly what the oracle checks. */
  def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("salt", pmod($"user_id", lit(8)))
      .groupBy($"event_type", $"salt")
      .agg(count(lit(1)).as("pn"), sum($"value").as("pv"))
      .groupBy($"event_type")
      .agg(sum($"pn").as("n"), round(sum($"pv"), 4).as("total_value"))
      .orderBy($"event_type")
  }

  val saltedAggSql: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 4) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_json" -> (eventsJson(_, _)),
    "q_salted_agg" -> (saltedAgg(_, _)),
    "q1_agg" -> (q1Agg(_, _)),
    "q_join_topn" -> (joinTopN(_, _)),
    "q_window" -> (windowFuncs(_, _)),
    "q_sessionize" -> (sessionize(_, _)),
    "q_funnel" -> (funnel(_, _)),
    "q_value_pctl" -> (valuePctl(_, _)),
    "q_asof_join" -> (asofJoin(_, _)),
    "q_stream_window" -> (streamWindowBatch(_, _)))

  val oracles: Map[String, String] = Map(
    "q_events_json" -> eventsJsonSql,
    "q_salted_agg" -> saltedAggSql,
    "q1_agg" -> q1AggSql,
    "q_join_topn" -> joinTopNSql,
    "q_window" -> windowFuncsSql,
    "q_sessionize" -> sessionizeSql,
    "q_funnel" -> funnelSql,
    "q_value_pctl" -> valuePctlSql,
    "q_asof_join" -> asofJoinSql,
    "q_stream_window" -> streamWindowBatchSql)
}
