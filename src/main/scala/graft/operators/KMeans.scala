package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorExprs._

/** Element-wise vector sum aggregator (map-side partial): the building
  * block of distributed Lloyd's — centroid recomputation shuffles one
  * partial (sum vector, count) per partition per cell, never the
  * points. */
class VectorSumAgg extends Aggregator[Array[Float], Array[Double], Array[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray
  override def reduce(b: Array[Double], a: Array[Float]): Array[Double] = {
    val out = if (b.length == 0) new Array[Double](a.length) else b
    var i = 0
    while (i < a.length) { out(i) += a(i); i += 1 }
    out
  }
  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1.length == 0) return b2
    if (b2.length == 0) return b1
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }
  override def finish(b: Array[Double]): Array[Double] = b
  override def bufferEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

/** Deterministic distributed k-means (Lloyd's): init = the k
  * lowest-id vectors, fixed iteration count, ties to the lower cell
  * id. This is the real IVF training path for the 100 TB index: each
  * iteration is one broadcast (centroids are k·dim doubles — tiny) +
  * one map-side-combined aggregation; points never shuffle.
  *
  * Fully deterministic → the DuckDB oracle replays both unrolled
  * iterations and the assignment hash-matches.
  */
object KMeans {

  private val K = 8
  private val Iters = 2

  /** One assignment pass: nearest centroid by L2, tie → lower cell.
    *
    * Centroids are k×dim floats riding inside the codegen'd
    * [[graft.functions.NearestCell]] expression, so assignment is a
    * map-only projection: points NEVER enter an Exchange, and (unlike
    * the earlier Dataset-encoder mapPartitions kernel) the scan stays
    * in whole-stage codegen with no serde boundary. NearestCell's
    * arithmetic is bit-identical to `Metric.L2.eval` (double
    * accumulation + sqrt) and its tie rule (strict `<` over
    * id-ascending centroids = lowest cell) matches the old
    * `min(struct(dist, cell))` plan and the DuckDB oracle replay. */
  private[graft] def assign(points: DataFrame, cents: Array[(Int, Array[Float])]): DataFrame =
    points.select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
      graft.functions.VectorExprs.nearestCell(col("embedding"), cents).as("cell"))

  /** Centroid recomputation via the partial vector-sum aggregate.
    * Sums run in DOUBLE over the float inputs in vec_id order within
    * each partition — cross-engine parity is guaranteed by rounding
    * at the END (assignment only compares distances, where the
    * summation-order noise is ~1e-13 of the values). */
  private def recompute(assigned: DataFrame): DataFrame =
    centroidsOf(assigned, "cell")

  /** Per-group mean embedding via the partial vector-sum aggregate —
    * (keyCol, cv: array<float>). ONE definition of the sum-then-
    * divide-then-FLOAT-round arithmetic, shared by Lloyd's recompute
    * and the outlier scorer so the cross-engine parity argument can
    * never drift between them. */
  private def centroidsOf(df: DataFrame, keyCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val vsum = org.apache.spark.sql.functions.udaf(new VectorSumAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    df.groupBy(col(keyCol))
      .agg(vsum($"embedding").as("sum"), count(lit(1)).as("n"))
      .select(col(keyCol),
        transform($"sum", x => (x / $"n").cast("float")).as("cv"))
  }

  /** k-means cell assignment after `Iters` Lloyd iterations.
    *
    * Per iteration: one zero-shuffle assignment pass + one map-side-
    * combined partial-sum aggregation whose shuffle carries k rows per
    * partition (never the points); the k×dim centroid table lives on
    * the driver between iterations — the canonical distributed
    * Lloyd's. */
  /** The trained centroid table after `Iters` Lloyd iterations —
    * k×dim floats held on the driver between iterations (the
    * canonical distributed Lloyd's loop). Shared by the assignment
    * query and the trained-IVF search path. */
  private[graft] def trainedCentroids(s: SparkSession, dir: String): Array[(Int, Array[Float])] = {
    import s.implicits._
    trainedCentroidsOf(
      Tables.embeddings(s, dir).select($"vec_id", $"embedding"), K, Iters)
  }

  /** [[trainedCentroids]] over ANY `(vec_id, embedding)` frame with a
    * caller-chosen k — the form other operators compose with (e.g.
    * [[Dedup.semDeDupCapped]]'s clustering stage). Seeding and the
    * per-iteration shape are identical: k lowest-id vectors, then
    * `iters` rounds of zero-shuffle assignment + map-side-combined
    * k-row recompute. */
  private[graft] def trainedCentroidsOf(points: DataFrame, k: Int,
      iters: Int): Array[(Int, Array[Float])] = {
    val s = points.sparkSession
    import s.implicits._
    // same spelling as the oracle (WHERE vec_id < k): a pushed-down
    // scan filter, not a global sort+limit
    var cents: Array[(Int, Array[Float])] = points.filter($"vec_id" < k)
      .select($"vec_id".cast("int"), $"embedding")
      .as[(Int, Array[Float])].collect().sortBy(_._1)
    if (cents.length < k) {
      // ids are non-contiguous or offset (a sampled corpus): the
      // cheap pushdown under-seeds, so fall back to the k lowest ids
      // globally — a sort+limit over a narrow frame, paid only on
      // the rare path. Re-key seeds 0..k-1 so cells stay dense.
      cents = points.orderBy($"vec_id").limit(k)
        .select($"vec_id".cast("int"), $"embedding")
        .as[(Int, Array[Float])].collect().sortBy(_._1)
        .zipWithIndex.map { case ((_, e), i) => (i, e) }
      require(cents.length == k,
        s"k-means needs >= $k points, frame has ${cents.length}")
    }
    for (_ <- 0 until iters) {
      val assigned = assign(points, cents)
      cents = recompute(assigned).as[(Int, Array[Float])].collect().sortBy(_._1)
    }
    cents
  }

  def qKmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val points = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    // final assignment against the last recomputed centroids
    assign(points, trainedCentroids(s, dir)).select($"vec_id", $"cell").orderBy($"vec_id")
  }

  /** DuckDB replay: both Lloyd iterations unrolled. Centroid averages
    * are computed per (cell, dimension) over unnested positions —
    * same double math as the Spark aggregator up to summation order
    * (assignment argmins are insensitive at these magnitudes). */
  /** DuckDB CTE chain replaying both Lloyd iterations: c0 (seed
    * cents) → a1 → c1 → a2 → c2 (trained cents, FLOAT-rounded like
    * the Spark array<float>) → fin (final assignment). Shared by the
    * assignment oracle and the trained-IVF search oracle. */
  /** Embedding dimensionality, single-sourced into every oracle SQL
    * below — the Spark side adapts to the actual array length, but a
    * DuckDB unnest(range(...)) cannot; if testdata dim ever changes,
    * change THIS constant (a stale value reads as a false correctness
    * failure on q_kmeans/q_embed_outlier/q_knn_ivf_trained with no
    * pointer to the real cause). */
  private[graft] val Dim = 64

  private[graft] val kmeansCtes: String = {
    // centroids round-trip through FLOAT exactly as the Spark side's
    // array<float> columns do, so both engines measure distances to
    // identically-rounded centroids
    def assignFrom(centsRel: String): String =
      s"""SELECT vec_id, embedding, cell FROM (
         |  SELECT e.vec_id, e.embedding, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(c.cv AS DOUBLE[])), c.cell) AS rn
         |  FROM embeddings e CROSS JOIN $centsRel c
         |) WHERE rn = 1""".stripMargin
    def recomputeFrom(assignRel: String): String =
      s"""SELECT cell,
         |  list(avg_v ORDER BY d)::FLOAT[] AS cv
         |FROM (
         |  SELECT cell, d, avg(embedding[d + 1]::DOUBLE) AS avg_v
         |  FROM $assignRel, unnest(range(0, $Dim)) AS t(d)
         |  GROUP BY cell, d
         |) GROUP BY cell""".stripMargin
    s"""c0 AS (
       |  SELECT vec_id::INTEGER AS cell, embedding AS cv
       |  FROM embeddings WHERE vec_id < $K
       |), a1 AS (${assignFrom("c0")}),
       |c1 AS (${recomputeFrom("a1")}),
       |a2 AS (${assignFrom("c1")}),
       |c2 AS (${recomputeFrom("a2")}),
       |fin AS (${assignFrom("c2")})""".stripMargin
  }

  val qKmeansSql: String =
    s"""WITH $kmeansCtes
       |SELECT vec_id, cell FROM fin ORDER BY vec_id""".stripMargin

  /** Embedding outlier scoring: distance of each vector to its own
    * label's centroid, worst 20 reported — the embedding-QA pass a
    * training pipeline runs to catch mislabeled/corrupt vectors. Same
    * partial vector-sum aggregation as Lloyd's; one extra broadcast
    * join to score. */
  def qEmbedOutlier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val cents = centroidsOf(emb, "label")
    emb.join(broadcast(cents), "label")
      .select($"vec_id", $"label", round(l2Dist($"embedding", $"cv"), 4).as("centroid_dist"))
      .orderBy($"centroid_dist".desc, $"vec_id")
      .limit(20)
  }

  val qEmbedOutlierSql: String =
    s"""WITH cents AS (
      |  SELECT label, list(avg_v ORDER BY d)::FLOAT[] AS cv
      |  FROM (
      |    SELECT label, d, avg(embedding[d + 1]::DOUBLE) AS avg_v
      |    FROM embeddings, unnest(range(0, $Dim)) AS t(d)
      |    GROUP BY label, d
      |  ) GROUP BY label
      |)
      |SELECT vec_id, e.label AS label,
      |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(c.cv AS DOUBLE[])), 4) AS centroid_dist
      |FROM embeddings e JOIN cents c ON c.label = e.label
      |ORDER BY centroid_dist DESC, vec_id
      |LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmeans" -> (qKmeans(_, _)),
    "q_embed_outlier" -> (qEmbedOutlier(_, _)))
  val oracles: Map[String, String] = Map(
    "q_kmeans" -> qKmeansSql,
    "q_embed_outlier" -> qEmbedOutlierSql)
}
