package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.SparkSessionExtensions
import graft.index.Metric

/** Custom whole-operator kNN join: Catalyst logical node + planner
  * strategy + physical exec, registered via SparkSessionExtensions
  * (or lazily through `spark.experimental.extraStrategies`).
  *
  * Semantics: for every query row on the RIGHT (q_id, qv), find the k
  * nearest corpus rows on the LEFT (vec_id, embedding) under `metric`.
  *
  * Physical contract — the piece Spark's built-ins can't express: the
  * exec broadcasts the (small) query batch and streams corpus
  * partitions through a bounded per-query heap, emitting at most
  * k·|queries| rows PER PARTITION. The global merge is then the
  * declarative bounded TopK aggregate. So the full operator is
  *   KnnJoinExec (partition-local candidate pruning, custom)
  *   → ObjectHashAggregate(TopKAgg) (partial + final, built-in shape)
  * and the exchange after the scan carries k rows per (query,
  * partition) — independent of corpus size, the property that makes
  * the operator viable at 100 TB.
  */
case class KnnJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    k: Int,
    metric: String,
    excludeSelf: Boolean,
    // constructor param, NOT a val: exprIds must survive optimizer
    // copy()s or downstream references to q_id/nid/dist unbind
    output: Seq[Attribute]) extends BinaryNode {

  /** The exec reads children positionally, so every child column is
    * required: without this (the node has no Catalyst expressions, so
    * the default reference set is empty) ColumnPruning strips the
    * children down to nothing and the exec reads garbage rows. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  /** Output attrs originate here, not from children. */
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet

  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

case class KnnJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    k: Int,
    metric: Metric,
    excludeSelf: Boolean,
    output: Seq[Attribute]) extends BinaryExecNode {

  /** Positional reads below make schema assumptions — enforce them at
    * planning time the way checkInputDataTypes does for expressions:
    * an int id would be read as garbage long bits, a double embedding
    * as garbage floats, both SILENTLY wrong rather than failing. */
  private def requireSchema(plan: SparkPlan, side: String): Unit = {
    val t = plan.output.map(_.dataType)
    require(t.length >= 2 &&
        t(0) == org.apache.spark.sql.types.LongType &&
        t(1).isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
        t(1).asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType == org.apache.spark.sql.types.FloatType,
      s"knn join $side side must be (long id, array<float> vector); " +
        s"got ${plan.output.map(a => s"${a.name}: ${a.dataType.simpleString}").mkString(", ")}")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    require(k >= 1, s"knn join needs k >= 1, got $k")
    requireSchema(left, "corpus")
    requireSchema(right, "query")
    val kLoc = k
    val m = metric
    val excl = excludeSelf
    // query batch: bounded by contract (a serving batch), broadcast
    // once; null ids/vectors cannot join anything — skip them the way
    // nullSafeEval null-propagates in the expression kernels
    val queries: Array[(Long, Array[Float])] = right.executeCollect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map { r => (r.getLong(0), r.getArray(1).toFloatArray()) }
    val bc = sparkContext.broadcast(queries)
    left.execute().mapPartitions { it =>
      val qs = bc.value
      val nq = qs.length
      // bounded per-query heaps as sorted parallel arrays (k is small)
      val ids = Array.fill(nq)(new Array[Long](kLoc))
      val dists = Array.fill(nq)(Array.fill(kLoc)(Double.MaxValue))
      val sizes = new Array[Int](nq)
      // plain hasNext/next loop: the codegen stage's specialized
      // `foreach` hands out a row whose backing buffer proved unsafe to
      // read from this side (SIGSEGV/garbage under Spark 4.1's
      // push-based pipeline); pull-based iteration is stable
      while (it.hasNext) {
        val row = it.next()
        if (row.isNullAt(0) || row.isNullAt(1)) {
          // a corpus row with a null id or vector has no distance to
          // anything — skip it (null-propagation, not an executor NPE)
        } else {
        val id = row.getLong(0)
        val vec = row.getArray(1).toFloatArray()
        var qi = 0
        while (qi < nq) {
          if (excl && qs(qi)._1 == id) { qi += 1 }
          else {
          // explicit dim check (same contract as the VectorExprs
          // expressions): a longer query would silently drop its
          // extra dims, a shorter one would AIOOBE deep in Metric
          if (qs(qi)._2.length != vec.length)
            throw new IllegalArgumentException(
              s"knn join: query dim ${qs(qi)._2.length} != corpus dim " +
                s"${vec.length} (corpus id $id)")
          val d = m.eval(qs(qi)._2, 0, vec, 0, vec.length)
          val sz = sizes(qi)
          val di = dists(qi); val ii = ids(qi)
          // Double.compare keeps the order NaN-total (NaN sorts last)
          val cLast = java.lang.Double.compare(d, di(kLoc - 1))
          if (sz < kLoc || cLast < 0 || (cLast == 0 && id < ii(kLoc - 1))) {
            var lo = 0; var hi = math.min(sz, kLoc)
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              val cm = java.lang.Double.compare(di(mid), d)
              if (cm < 0 || (cm == 0 && ii(mid) < id)) lo = mid + 1 else hi = mid
            }
            val newSz = math.min(sz + 1, kLoc)
            var x = newSz - 1
            while (x > lo) { di(x) = di(x - 1); ii(x) = ii(x - 1); x -= 1 }
            if (lo < kLoc) { di(lo) = d; ii(lo) = id }
            sizes(qi) = newSz
          }
          qi += 1
          }
        }
        }
      }
      // downstream operators require UnsafeRow; project the generic rows
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(output.map(_.dataType).toArray)
      (0 until nq).iterator.flatMap { qi =>
        (0 until sizes(qi)).iterator.map { x =>
          proj(new GenericInternalRow(
            Array[Any](qs(qi)._1, ids(qi)(x), dists(qi)(x)))): InternalRow
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ KnnJoinPlan(l, r, k, m, excl, _) =>
      KnnJoinExec(planLater(l), planLater(r), k, Metric.byName(m), excl, p.output) :: Nil
    case _ => Nil
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`) — the static
  * registration path for BOTH the kNN planner strategy and the SQL
  * function surface ([[GraftFunctions]]); `KnnJoin.ensureRegistered`
  * / `GraftFunctions.registerAll` are the lazy runtime paths for
  * sessions graft didn't build. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => GraftStrategy)
    GraftFunctions.inject(e)
  }
}

object KnnJoin {
  def ensureRegistered(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(GraftStrategy))
      spark.experimental.extraStrategies = strategies :+ GraftStrategy
  }

  /** kNN join `corpus ⋈_knn queries`: corpus (vec_id, embedding) ×
    * queries (q_id, qv) → (q_id, rank, neighbor_id, dist) global
    * top-k. Candidate pruning runs in [[KnnJoinExec]]; the global
    * merge is the bounded TopK aggregate.
    *
    * KNOWN LIMITATION: a plan that references this result TWICE
    * (e.g. a self-join, or `recallDf`, which aggregates its exact
    * side and joins it back) fails analysis with "conflicting
    * references" — the analyzer's relation dedup cannot re-instance
    * the custom [[KnnJoinPlan]] node. Break the lineage first
    * (`.localCheckpoint()`, or a file round-trip) — PipelineDemo
    * step 6 shows the pattern. */
  def apply(corpus: DataFrame, queries: DataFrame, k: Int, metric: String,
      excludeSelf: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    ensureRegistered(spark)
    val l = corpus.select(corpus("vec_id"), corpus("embedding"))
    val r = queries.select(queries("q_id"), queries("qv"))
    val outAttrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = Seq(
      AttributeReference("q_id", LongType, nullable = false)(),
      AttributeReference("nid", LongType, nullable = false)(),
      AttributeReference("dist", DoubleType, nullable = false)())
    val partial = bridge.ofRows(spark,
      KnnJoinPlan(l.queryExecution.analyzed, r.queryExecution.analyzed, k, metric,
        excludeSelf, outAttrs))
    graft.operators.VectorQueries.topkExplode(partial, k)
  }
}
