package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorExprs._

/** Product quantization (PQ) — the compression scheme the DiskANN
  * paper (Subramanya et al., NeurIPS'19 §3) pairs with the Vamana
  * graph the reference implements: the vector is split into `M`
  * subspaces, each subvector replaced by the id of its nearest
  * codebook entry, and query-time distances become `M` table lookups
  * (asymmetric distance computation, ADC) instead of a dim-length
  * float loop. At 100 TB this is the difference between holding f32
  * vectors (dim·4 bytes) and PQ codes (M bytes — 32× smaller at
  * dim=64, M=8) in executor memory during candidate generation.
  *
  * Everything here is deterministic and oracle-replayable (SURVEY.md
  * §5): codebooks are the subvector slices of the `Ksub` lowest-id
  * vectors (the same seed-centroid rule as `q_ivf_assign`; the
  * trained form lives in the index kernel, [[graft.index.PqCodebook]],
  * where recall — not hash parity — is the contract), argmin ties go
  * to the lower code, and every double accumulation is left-to-right
  * in both engines.
  *
  * Scale shape: codebooks are M·Ksub·SubDim floats — broadcast;
  * encoding is a zero-shuffle mapPartitions kernel (same shape as
  * [[KMeans.assign]]); the ADC candidate loop is a broadcast join of
  * the tiny query-LUT set against the codes scan with the codegen'd
  * [[graft.functions.PqAdcDistance]] inside; rerank reads only the
  * Cand·|queries| surviving rows' full vectors.
  */
object PQ {

  /** PlanCache family tag (corpus PQ codes). */
  private[graft] val Family = "pq"

  /** Drop the family's caches — see [[graft.PlanCache]]. Also clears
    * the trained-codebook memo: it is keyed by dir with no session
    * tie, so a corpus regenerated in-place within one JVM (the
    * test-fixture overwrite pattern) would otherwise keep serving
    * stale trained codebooks while the code tables rebuilt against
    * fresh data. */
  def release(s: SparkSession): Unit = {
    graft.PlanCache.release(s, Family)
    trainedCbCache.clear()
    trainedResCbCache.clear()
    resCbCache.clear()
  }

  private[graft] val M = 8       // subspaces
  private[graft] val SubDim = 8  // dims per subspace (dim 64 / M)
  private[graft] val Ksub = 16   // codebook entries per subspace
  private val Cand = 50          // ADC candidates reranked per query
  private[operators] val K = 10

  /** Pack Ksub seed vectors (position-indexed) into the flat codebook
    * layout cb[(s·Ksub + j)·SubDim + i] — entry j of subspace s is the
    * s-th SubDim-slice of seed j. Shared by the raw-vector and
    * residual codebooks. */
  private[graft] def packCodebooks(seeds: Array[Array[Float]]): Array[Float] = {
    require(seeds.length == Ksub, s"need $Ksub seed vectors, found ${seeds.length}")
    val out = new Array[Float](M * Ksub * SubDim)
    var sub = 0
    while (sub < M) {
      var j = 0
      while (j < Ksub) {
        System.arraycopy(seeds(j), sub * SubDim, out, (sub * Ksub + j) * SubDim, SubDim)
        j += 1
      }
      sub += 1
    }
    out
  }

  /** Seed codebooks: entry j of subspace s is the s-th SubDim-slice of
    * the embedding with vec_id == j (j < Ksub). */
  private[graft] def codebooks(s: SparkSession, dir: String): Array[Float] = {
    import s.implicits._
    packCodebooks(Tables.embeddings(s, dir).filter($"vec_id" < Ksub)
      .select($"vec_id".cast("int"), $"embedding")
      .as[(Int, Array[Float])].collect().sortBy(_._1).map(_._2))
  }

  /** Squared L2 between subvector `sub` of `v` and codebook entry
    * (sub, j) — double, left-to-right, the exact order the oracle's
    * ordered list reduce replays. */
  @inline private def subSqL2(v: Array[Float], sub: Int, cb: Array[Float], j: Int): Double = {
    val vOff = sub * SubDim
    val cOff = (sub * Ksub + j) * SubDim
    var acc = 0.0; var i = 0
    while (i < SubDim) {
      val d = v(vOff + i).toDouble - cb(cOff + i).toDouble
      acc += d * d; i += 1
    }
    acc
  }

  /** ADC lookup table of `v` against codebook `cb`: M·Ksub doubles,
    * lut[sub·Ksub + j] = squared L2 between v's sub-th slice and
    * codebook entry (sub, j). One definition shared by every ADC
    * query-side kernel. */
  private[graft] def lutOf(v: Array[Float], cb: Array[Float]): Array[Double] = {
    val lut = new Array[Double](M * Ksub)
    var sub = 0
    while (sub < M) {
      var j = 0
      while (j < Ksub) { lut(sub * Ksub + j) = subSqL2(v, sub, cb, j); j += 1 }
      sub += 1
    }
    lut
  }

  /** PQ-encode: per subspace the argmin codebook entry (tie → lower
    * code). Returns codes and the per-subspace quantization error. */
  private[graft] def encodeOne(v: Array[Float], cb: Array[Float]): (Array[Int], Array[Double]) = {
    val codes = new Array[Int](M)
    val errs = new Array[Double](M)
    var sub = 0
    while (sub < M) {
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < Ksub) {
        val d = subSqL2(v, sub, cb, j)
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(sub) = best; errs(sub) = bestD
      sub += 1
    }
    (codes, errs)
  }

  /** (vec_id, codes) for the whole corpus — broadcast codebooks +
    * zero-shuffle mapPartitions, cached so the encode runs once per
    * (plan, JVM) across bench repetitions and the query subset. */
  private def codesDf(s: SparkSession, dir: String): DataFrame =
    // memoized via PlanCache, NOT plan-keyed `.cache()`: the
    // mapPartitions closure captures a fresh Broadcast each call, so
    // canonicalized-plan matching never reused the entry and every
    // bench rep registered a new corpus-sized copy (the r6 ensemble-
    // collapse accumulation, one leak per invocation)
    graft.PlanCache.getOrBuild(s, Family, s"codes:$dir") {
      import s.implicits._
      val bc = s.sparkContext.broadcast(codebooks(s, dir))
      Tables.embeddings(s, dir).select($"vec_id", $"embedding")
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val cb = bc.value
          it.map { case (id, v) => (id, encodeOne(v, cb)._1) }
        }
        .toDF("vec_id", "codes")
    }

  /** `q_pq_encode`: PQ codes + per-subspace squared quantization error
    * for every vector — one row per (vector, subspace), fully
    * hash-verified against the DuckDB replay of the same argmin. */
  def qPqEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(codebooks(s, dir))
    Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cb = bc.value
        it.flatMap { case (id, v) =>
          val (codes, errs) = encodeOne(v, cb)
          (0 until M).iterator.map { sub =>
            (id, sub, codes(sub), math.rint(errs(sub) * 1e4) / 1e4)
          }
        }
      }
      .toDF("vec_id", "sub", "code", "sub_err")
      .orderBy($"vec_id", $"sub")
  }

  /** (vec_id, codes, cell) — [[codesDf]] co-located with its IVF cell
    * assignment, memoized like [[resCodesDf]] (which has carried its
    * cell since birth): a disk-resident IVF+PQ tier stores codes
    * INSIDE their cell's inverted list, so the serving path never
    * pays a corpus-to-corpus join per query batch. Before this memo,
    * [[qKnnIvfPq]] recomputed the full IVF assignment (a corpus scan
    * × NCELLS centroid distances) AND shuffled both corpus sides
    * through the vec_id equi-join on every evaluation. */
  private def cellCodesDf(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(s, Family, s"cellcodes:$dir") {
      codesDf(s, dir).join(VectorQueries.ivfAssign(s, dir), "vec_id")
    }

  /** Shared oracle CTE fragment: cb = (sub, j, cv) seed codebooks,
    * enc = per-(vec_id, sub) argmin code. Double math matches the
    * Scala kernel term for term (ordered prepend-reduce = the
    * left-to-right while loop). */
  private[graft] def encodeCtesOn(src: String): String =
    s"""cb AS (
       |  SELECT CAST(t.s AS INTEGER) AS sub, CAST(vec_id AS INTEGER) AS j,
       |    embedding[t.s * $SubDim + 1 : t.s * $SubDim + $SubDim] AS cv
       |  FROM $src, unnest(range(0, $M)) AS t(s)
       |  WHERE vec_id < $Ksub
       |), sv AS (
       |  SELECT vec_id, CAST(t.s AS INTEGER) AS sub,
       |    embedding[t.s * $SubDim + 1 : t.s * $SubDim + $SubDim] AS v
       |  FROM $src, unnest(range(0, $M)) AS t(s)
       |), encd AS (
       |  SELECT sv.vec_id, sv.sub, cb.j,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, $SubDim + 1),
       |      i -> (sv.v[i]::DOUBLE - cb.cv[i]::DOUBLE) * (sv.v[i]::DOUBLE - cb.cv[i]::DOUBLE))),
       |      (acc, x) -> acc + x) AS dd
       |  FROM sv JOIN cb ON cb.sub = sv.sub
       |), enc AS (
       |  SELECT vec_id, sub, j AS code, dd FROM (
       |    SELECT vec_id, sub, j, dd,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd, j) AS rn
       |    FROM encd
       |  ) WHERE rn = 1
       |)""".stripMargin

  private val encodeCtes: String = encodeCtesOn("embeddings")

  val qPqEncodeSql: String =
    s"""WITH $encodeCtes
       |SELECT vec_id, sub, code, round(dd, 4) AS sub_err
       |FROM enc ORDER BY vec_id, sub""".stripMargin

  /** `q_knn_pq`: the full PQ search pipeline — encode the corpus,
    * build each query's M×Ksub ADC lookup table, rank all candidates
    * by ADC distance ([[graft.functions.PqAdcDistance]], codegen'd),
    * keep the top `Cand`, rerank those with exact full-precision L2 —
    * hash-verified end-to-end against the DuckDB replay of the whole
    * chain. The plan shape is the 100 TB one: codes scan × broadcast
    * query LUTs, bounded TopK merge, rerank join touches only
    * Cand·|queries| full vectors. */
  def qKnnPq(s: SparkSession, dir: String): DataFrame =
    adcSearch(s, dir, codebooks(s, dir), codesDf(s, dir))

  /** The ADC pipeline tail shared by the seed and trained variants:
    * per-query LUTs against `cbArr`, codegen'd m-lookup candidate
    * scan over `codes`, bounded top-Cand merge, exact rerank. */
  private def adcSearch(s: SparkSession, dir: String,
      cbArr: Array[Float], codes: DataFrame): DataFrame =
    adcSearchOn(s, Tables.embeddings(s, dir), cbArr, codes)

  /** [[adcSearch]] over an arbitrary `(vec_id, embedding)` frame —
    * queries are the `vec_id % 50` subset of `emb`, rerank reads full
    * vectors from `emb`. Lets the OPQ chain run the identical
    * pipeline over the rotated corpus ([[Opq]]). */
  private[graft] def adcSearchOn(s: SparkSession, emb: DataFrame,
      cbArr: Array[Float], codes: DataFrame): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cbArr)

    // per-query ADC lookup tables (M·Ksub doubles each — tiny)
    val luts = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cb = bc.value
        it.map { case (qid, qv) => (qid, lutOf(qv, cb)) }
      }
      .toDF("q_id", "lut")

    // ADC candidate generation: codes scan × broadcast LUTs, codegen'd
    // m-lookup distance, bounded top-Cand merge
    val adc = codes.select($"vec_id".as("nid"), $"codes".as("nc"))
      .join(broadcast(luts))
      .filter($"nid" =!= $"q_id")
      .select($"q_id", $"nid", pqAdcDist($"lut", $"nc", Ksub).as("adc_d"))
    val tk = TopK.topk(Cand)
    val cand = adc.groupBy($"q_id").agg(tk($"nid", $"adc_d").as("tk"))
      .select($"q_id", explode($"tk.ids").as("nid"))

    // full-precision rerank of the surviving candidates only
    val q = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val candQ = cand.join(q, "q_id")
    val d = emb.select($"vec_id".as("nid"), $"embedding".as("v"))
      .join(broadcast(candQ), "nid")
      .select($"q_id", $"nid", l2Dist($"qv", $"v").as("dist"))
    VectorQueries.topkExplode(d, K)
  }

  // --------------------------------------------------- trained chain

  private[graft] val TrainIters = 2

  /** Trained-codebook memo — M·Ksub·SubDim floats per sf dir, fully
    * deterministic, so a JVM-lifetime memo is safe and spares every
    * bench rep the two training rounds' jobs. */
  private val trainedCbCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Float]]

  /** Trained codebooks: [[TrainIters]] rounds of DISTRIBUTED
    * per-subspace Lloyd over the corpus, seeded from the same Ksub
    * lowest-id vectors as [[codebooks]] (Jégou et al., TPAMI 2011
    * §IV-A: trained codebooks are what makes ADC competitive; DiskANN
    * §3 trains its PQ the same way). Assignment is a broadcast-
    * codebook flatMap scan (zero shuffle); recompute is one map-side-
    * combined groupBy over (sub, code, pos) — M·Ksub·SubDim rows
    * collected per round, the same driver-bounded footprint as
    * [[KMeans.trainedCentroids]]. Centroids round-trip through FLOAT
    * exactly like the kmeans oracle convention (the rounding absorbs
    * distributed-summation order noise), and a code that captures no
    * vectors keeps its previous entry — both mirrored in the DuckDB
    * replay, so the whole train→encode→ADC→rerank chain is
    * hash-checked. The in-memory sampled trainer for the serving tier
    * is [[graft.index.PqCodebook]]; this is the gate-replayable
    * distributed form. */
  private[graft] def trainedCodebooks(s: SparkSession, dir: String): Array[Float] =
    trainedCbCache.getOrElseUpdate(dir, {
      import s.implicits._
      lloydRounds(s, Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])],
        codebooks(s, dir))
    })

  /** The shared [[TrainIters]]-round distributed per-subspace Lloyd
    * trainer behind [[trainedCodebooks]] (raw vectors) and
    * [[trainedResCodebooks]] (residuals) — see [[trainedCodebooks]]
    * for the full protocol notes. */
  private[graft] def lloydRounds(s: SparkSession,
      vecs: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      seed: Array[Float]): Array[Float] = {
    import s.implicits._
    var cb = seed
    for (_ <- 0 until TrainIters) {
      val bc = s.sparkContext.broadcast(cb)
      val avgRows = vecs.flatMap { case (_, v) =>
          val c = bc.value
          (0 until M).iterator.map { sub =>
            var best = 0; var bestD = Double.MaxValue; var j = 0
            while (j < Ksub) {
              val d = subSqL2(v, sub, c, j)
              if (d < bestD) { bestD = d; best = j }
              j += 1
            }
            (sub, best, v.slice(sub * SubDim, (sub + 1) * SubDim))
          }
        }
        .toDF("sub", "code", "v")
        .select($"sub", $"code", posexplode($"v"))
        .toDF("sub", "code", "pos", "x")
        .groupBy($"sub", $"code", $"pos")
        .agg(avg($"x".cast("double")).cast("float").as("m"))
        .as[(Int, Int, Int, Float)].collect()
      val next = cb.clone() // empty codes keep their previous entry
      for ((sub, code, pos, mF) <- avgRows)
        next((sub * Ksub + code) * SubDim + pos) = mF
      cb = next
      bc.unpersist(blocking = false)
    }
    cb
  }

  private def trainedCodesDf(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(s, Family, s"trainedCodes:$dir") {
      import s.implicits._
      val bc = s.sparkContext.broadcast(trainedCodebooks(s, dir))
      Tables.embeddings(s, dir).select($"vec_id", $"embedding")
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val cb = bc.value
          it.map { case (id, v) => (id, encodeOne(v, cb)._1) }
        }
        .toDF("vec_id", "codes")
    }

  /** `q_knn_pq_trained`: the [[qKnnPq]] pipeline on TRAINED codebooks
    * — distributed Lloyd training, encode, ADC, exact rerank, the
    * whole chain hash-verified against the DuckDB replay (both Lloyd
    * rounds unrolled in SQL, the way `q_knn_ivf_trained` replays
    * trained IVF). */
  def qKnnPqTrained(s: SparkSession, dir: String): DataFrame =
    adcSearch(s, dir, trainedCodebooks(s, dir), trainedCodesDf(s, dir))

  /** DuckDB CTE chain: cb0 (seed) → [encd/asg/cagg/cb]×TrainIters —
    * argmin assignment carrying the subvector, per-(sub, code, pos)
    * double average FLOAT-rounded, empty codes inheriting the prior
    * entry via the left join. */
  private[graft] def trainedCbCtesOn(src: String): String = {
    def round(n: Int): String = {
      val prev = s"cb${n - 1}"
      s"""encd$n AS (
         |  SELECT sv.vec_id, sv.sub, sv.v, cb.j,
         |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, $SubDim + 1),
         |      i -> (sv.v[i]::DOUBLE - cb.cv[i]::DOUBLE) * (sv.v[i]::DOUBLE - cb.cv[i]::DOUBLE))),
         |      (acc, x) -> acc + x) AS dd
         |  FROM sv JOIN $prev cb ON cb.sub = sv.sub
         |), asg$n AS (
         |  SELECT vec_id, sub, v, j FROM (
         |    SELECT vec_id, sub, v, j,
         |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd, j) AS rn
         |    FROM encd$n
         |  ) WHERE rn = 1
         |), cagg$n AS (
         |  SELECT sub, j, list(avg_v ORDER BY d)::FLOAT[] AS cv
         |  FROM (
         |    SELECT sub, j, t.d AS d, avg(v[t.d + 1]::DOUBLE) AS avg_v
         |    FROM asg$n, unnest(range(0, $SubDim)) AS t(d)
         |    GROUP BY sub, j, t.d
         |  ) GROUP BY sub, j
         |), cb$n AS (
         |  SELECT p.sub, p.j, coalesce(c.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN cagg$n c ON c.sub = p.sub AND c.j = p.j
         |)""".stripMargin
    }
    s"""cb0 AS (
       |  SELECT CAST(t.s AS INTEGER) AS sub, CAST(vec_id AS INTEGER) AS j,
       |    embedding[t.s * $SubDim + 1 : t.s * $SubDim + $SubDim] AS cv
       |  FROM $src, unnest(range(0, $M)) AS t(s)
       |  WHERE vec_id < $Ksub
       |), sv AS (
       |  SELECT vec_id, CAST(t.s AS INTEGER) AS sub,
       |    embedding[t.s * $SubDim + 1 : t.s * $SubDim + $SubDim] AS v
       |  FROM $src, unnest(range(0, $M)) AS t(s)
       |),
       |${(1 to TrainIters).map(round).mkString(",\n")}""".stripMargin
  }

  private val trainedCbCtes: String = trainedCbCtesOn("embeddings")

  /** The full trained-codebook statement over an arbitrary source —
    * "" and "embeddings" give [[qKnnPqTrainedSql]]; [[Opq]] passes
    * its rotated-corpus CTEs (`q_knn_opq_trained`). */
  private[graft] def knnPqTrainedSqlOn(extraCtes: String, src: String): String = {
    val cbT = s"cb$TrainIters"
    s"""WITH $extraCtes${trainedCbCtesOn(src)},
       |encdT AS (
       |  SELECT sv.vec_id, sv.sub, cb.j,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, $SubDim + 1),
       |      i -> (sv.v[i]::DOUBLE - cb.cv[i]::DOUBLE) * (sv.v[i]::DOUBLE - cb.cv[i]::DOUBLE))),
       |      (acc, x) -> acc + x) AS dd
       |  FROM sv JOIN $cbT cb ON cb.sub = sv.sub
       |), encT AS (
       |  SELECT vec_id, sub, j AS code FROM (
       |    SELECT vec_id, sub, j,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd, j) AS rn
       |    FROM encdT
       |  ) WHERE rn = 1
       |), q AS (
       |  SELECT vec_id AS q_id, embedding AS qv
       |  FROM $src WHERE vec_id % 50 = 0
       |), qs AS (
       |  SELECT q_id, CAST(t.s AS INTEGER) AS sub,
       |    qv[t.s * $SubDim + 1 : t.s * $SubDim + $SubDim] AS v
       |  FROM q, unnest(range(0, $M)) AS t(s)
       |), lut AS (
       |  SELECT q_id, cb.sub, cb.j AS code,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, $SubDim + 1),
       |      i -> (qs.v[i]::DOUBLE - cb.cv[i]::DOUBLE) * (qs.v[i]::DOUBLE - cb.cv[i]::DOUBLE))),
       |      (acc, x) -> acc + x) AS d
       |  FROM qs JOIN $cbT cb ON cb.sub = qs.sub
       |), adc AS (
       |  SELECT l.q_id, e.vec_id AS nid,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(l.d ORDER BY l.sub)),
       |      (acc, x) -> acc + x) AS adc_d
       |  FROM encT e JOIN lut l ON l.sub = e.sub AND l.code = e.code
       |  WHERE e.vec_id <> l.q_id
       |  GROUP BY l.q_id, e.vec_id
       |), cand AS (
       |  SELECT q_id, nid FROM (
       |    SELECT q_id, nid,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adc_d, nid) AS rn
       |    FROM adc
       |  ) WHERE rn <= $Cand
       |), d AS (
       |  SELECT c.q_id, c.nid,
       |    list_distance(CAST(eq.embedding AS DOUBLE[]), CAST(en.embedding AS DOUBLE[])) AS dist
       |  FROM cand c
       |  JOIN $src eq ON eq.vec_id = c.q_id
       |  JOIN $src en ON en.vec_id = c.nid
       |), r AS (
       |  SELECT q_id, nid, dist,
       |    row_number() OVER (PARTITION BY q_id ORDER BY dist, nid) AS rn
       |  FROM d
       |)
       |SELECT q_id, CAST(rn AS INTEGER) AS rank, nid AS neighbor_id, round(dist, 4) AS dist
       |FROM r WHERE rn <= $K ORDER BY q_id, rank""".stripMargin
  }

  val qKnnPqTrainedSql: String = knnPqTrainedSqlOn("", "embeddings")

  /** The full seed-codebook encode→LUT→ADC→rerank statement over an
    * arbitrary source CTE/table `src` (must expose `vec_id,
    * embedding`), with `extraCtes` prepended — "" and "embeddings"
    * give [[qKnnPqSql]]; [[Opq]] passes its rotated-corpus CTEs. */
  private[graft] def knnPqSqlOn(extraCtes: String, src: String): String =
    s"""WITH $extraCtes${encodeCtesOn(src)},
       |q AS (
       |  SELECT vec_id AS q_id, embedding AS qv
       |  FROM $src WHERE vec_id % 50 = 0
       |), qs AS (
       |  SELECT q_id, CAST(t.s AS INTEGER) AS sub,
       |    qv[t.s * $SubDim + 1 : t.s * $SubDim + $SubDim] AS v
       |  FROM q, unnest(range(0, $M)) AS t(s)
       |), lut AS (
       |  SELECT q_id, cb.sub, cb.j AS code,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, $SubDim + 1),
       |      i -> (qs.v[i]::DOUBLE - cb.cv[i]::DOUBLE) * (qs.v[i]::DOUBLE - cb.cv[i]::DOUBLE))),
       |      (acc, x) -> acc + x) AS d
       |  FROM qs JOIN cb ON cb.sub = qs.sub
       |), adc AS (
       |  SELECT l.q_id, e.vec_id AS nid,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(l.d ORDER BY l.sub)),
       |      (acc, x) -> acc + x) AS adc_d
       |  FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
       |  WHERE e.vec_id <> l.q_id
       |  GROUP BY l.q_id, e.vec_id
       |), cand AS (
       |  SELECT q_id, nid FROM (
       |    SELECT q_id, nid,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adc_d, nid) AS rn
       |    FROM adc
       |  ) WHERE rn <= $Cand
       |), d AS (
       |  SELECT c.q_id, c.nid,
       |    list_distance(CAST(eq.embedding AS DOUBLE[]), CAST(en.embedding AS DOUBLE[])) AS dist
       |  FROM cand c
       |  JOIN $src eq ON eq.vec_id = c.q_id
       |  JOIN $src en ON en.vec_id = c.nid
       |), r AS (
       |  SELECT q_id, nid, dist,
       |    row_number() OVER (PARTITION BY q_id ORDER BY dist, nid) AS rn
       |  FROM d
       |)
       |SELECT q_id, CAST(rn AS INTEGER) AS rank, nid AS neighbor_id, round(dist, 4) AS dist
       |FROM r WHERE rn <= $K ORDER BY q_id, rank""".stripMargin

  val qKnnPqSql: String = knnPqSqlOn("", "embeddings")

  /** `q_knn_ivfpq` — the IVF+ADC composition (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011 §IV:
    * an inverted file restricts the candidate set, PQ codes rank it;
    * the residual-free `by_residual=false` variant — codes encode raw
    * vectors, so both stages reuse this file's oracle-replayable
    * seed-codebook encode). The 100 TB serving arithmetic multiplies
    * the two reductions: candidate generation touches nprobe/ncells
    * of the corpus (partition pruning) AND reads M bytes per
    * candidate instead of dim·4 (PQ codes) — cells×codes is the scan
    * footprint a disk-resident billion-vector tier actually pays.
    * Chain: probe ranking (same seed cells + L2 rule as `q_knn_ivf`)
    * → ADC scan of probed cells only (codegen'd
    * [[graft.functions.PqAdcDistance]]) → bounded top-`Cand` → exact
    * full-precision rerank. Fully deterministic → fully hash-checked
    * end to end, like both parents. */
  def qKnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val bc = s.sparkContext.broadcast(codebooks(s, dir))
    // query set served from the shared tier (VectorQueries.queriesDf)
    val queries = VectorQueries.queriesDf(s, dir)

    // probe ranking: NPROBE nearest seed cells per query (q_knn_ivf's
    // exact rule), served from the shared tier
    // ([[VectorQueries.cachedSeedProbes]])
    val probes = VectorQueries.cachedSeedProbes(s, dir)
      .select($"q_id", $"cell")

    // per-query ADC LUTs (M·Ksub doubles), carried with the probe rows
    val luts = queries.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cb = bc.value
        it.map { case (qid, qv) => (qid, lutOf(qv, cb)) }
      }
      .toDF("q_id", "lut")
    val probeLuts = probes.join(luts, "q_id")

    // ADC over PROBED cells only: codes carry their cell assignment
    // ([[cellCodesDf]] — co-located where both are stored together,
    // as a real layout does), then the tiny (q, cell, lut) set
    // broadcasts against it
    val adc = cellCodesDf(s, dir)
      .select($"vec_id".as("nid"), $"codes".as("nc"), $"cell")
      .join(broadcast(probeLuts), "cell")
      .filter($"nid" =!= $"q_id")
      .select($"q_id", $"nid", pqAdcDist($"lut", $"nc", Ksub).as("adc_d"))
    val tk = TopK.topk(Cand)
    val cand = adc.groupBy($"q_id").agg(tk($"nid", $"adc_d").as("tk"))
      .select($"q_id", explode($"tk.ids").as("nid"))

    // full-precision rerank of the surviving candidates only
    val candQ = cand.join(queries, "q_id")
    val d = Tables.embeddings(s, dir).select($"vec_id".as("nid"), $"embedding".as("v"))
      .join(broadcast(candQ), "nid")
      .select($"q_id", $"nid", l2Dist($"qv", $"v").as("dist"))
    VectorQueries.topkExplode(d, K)
  }

  val qKnnIvfPqSql: String =
    s"""WITH $encodeCtes,
       |cents AS (
       |  SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < ${VectorQueries.NCELLS}
       |), assign_d AS (
       |  SELECT e.vec_id, cell,
       |    list_distance(CAST(e.embedding AS DOUBLE[]), cv) AS dist
       |  FROM embeddings e CROSS JOIN cents
       |), assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |    FROM assign_d) WHERE rn = 1
       |), q AS (
       |  SELECT vec_id AS q_id, embedding AS qemb,
       |    CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id % 50 = 0
       |), probes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q_id, cell,
       |      row_number() OVER (PARTITION BY q_id ORDER BY list_distance(qv, cv), cell) AS rn
       |    FROM q CROSS JOIN cents) WHERE rn <= ${VectorQueries.NPROBE}
       |), qs AS (
       |  SELECT q_id, CAST(t.s AS INTEGER) AS sub,
       |    qemb[t.s * $SubDim + 1 : t.s * $SubDim + $SubDim] AS v
       |  FROM q, unnest(range(0, $M)) AS t(s)
       |), lut AS (
       |  SELECT q_id, cb.sub, cb.j AS code,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, $SubDim + 1),
       |      i -> (qs.v[i]::DOUBLE - cb.cv[i]::DOUBLE) * (qs.v[i]::DOUBLE - cb.cv[i]::DOUBLE))),
       |      (acc, x) -> acc + x) AS d
       |  FROM qs JOIN cb ON cb.sub = qs.sub
       |), adc AS (
       |  SELECT l.q_id, e.vec_id AS nid,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(l.d ORDER BY l.sub)),
       |      (acc, x) -> acc + x) AS adc_d
       |  FROM enc e
       |  JOIN assign a ON a.vec_id = e.vec_id
       |  JOIN probes p ON p.cell = a.cell
       |  JOIN lut l ON l.q_id = p.q_id AND l.sub = e.sub AND l.code = e.code
       |  WHERE e.vec_id <> l.q_id
       |  GROUP BY l.q_id, e.vec_id
       |), cand AS (
       |  SELECT q_id, nid FROM (
       |    SELECT q_id, nid,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adc_d, nid) AS rn
       |    FROM adc
       |  ) WHERE rn <= $Cand
       |), d AS (
       |  SELECT c.q_id, c.nid,
       |    list_distance(CAST(eq.embedding AS DOUBLE[]), CAST(en.embedding AS DOUBLE[])) AS dist
       |  FROM cand c
       |  JOIN embeddings eq ON eq.vec_id = c.q_id
       |  JOIN embeddings en ON en.vec_id = c.nid
       |), r AS (
       |  SELECT q_id, nid, dist,
       |    row_number() OVER (PARTITION BY q_id ORDER BY dist, nid) AS rn
       |  FROM d
       |)
       |SELECT q_id, CAST(rn AS INTEGER) AS rank, nid AS neighbor_id, round(dist, 4) AS dist
       |FROM r WHERE rn <= $K ORDER BY q_id, rank""".stripMargin

  // ------------------------------------------------- residual IVF+PQ

  /** (vec_id, cell, rv): each vector's residual against its ASSIGNED
    * cell centroid — FLOAT subtraction (`zip_with`, codegen'd), which
    * the oracle replays as DuckDB FLOAT minus FLOAT (both IEEE-754
    * single ops, so the residuals are bit-identical cross-engine).
    * The join shape is the layout a real system stores anyway: cell
    * assignment rides with the codes, centroids broadcast. */
  private def residualsDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = Tables.embeddings(s, dir)
      .filter($"vec_id" < VectorQueries.NCELLS)
      .select($"vec_id".as("cell"), $"embedding".as("cv"))
    Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      .join(VectorQueries.ivfAssign(s, dir), "vec_id")
      .join(broadcast(cents), "cell")
      .select($"vec_id", $"cell",
        zip_with($"embedding", $"cv", (a, b) => a - b).as("rv"))
  }

  /** Residual codebooks: the Ksub seeds are the RESIDUALS of vectors
    * NCELLS ≤ vec_id < NCELLS+Ksub (entry j ← vec_id NCELLS+j). The
    * raw-vector seed rule (vec_id < Ksub) would collide with the IVF
    * seed centroids (vec_id < NCELLS): each such vector is assigned
    * to its own cell at distance zero, so every codebook entry would
    * be the zero vector. Seeding from the next Ksub ids keeps the
    * deterministic oracle-replayable rule with non-degenerate
    * entries. */
  private def resCodebooks(s: SparkSession, dir: String): Array[Float] =
    // memoized (r18): the vec_id range filter cannot push through the
    // opaque KMeans.assign kernel inside residualsDf, so every call
    // paid a full-corpus IVF assignment + join to collect Ksub seed
    // rows — and qKnnIvfPqRes calls this once per evaluation. Same
    // JVM-lifetime + release rationale as [[trainedResCbCache]].
    resCbCache.getOrElseUpdate(dir, {
      import s.implicits._
      packCodebooks(residualsDf(s, dir)
        .filter($"vec_id" >= VectorQueries.NCELLS &&
          $"vec_id" < VectorQueries.NCELLS + Ksub)
        .select($"vec_id".cast("int"), $"rv")
        .as[(Int, Array[Float])].collect().sortBy(_._1).map(_._2))
    })

  private val resCbCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Float]]

  /** (vec_id, cell, codes) — residual-PQ codes for the whole corpus,
    * memoized like [[codesDf]] (same Broadcast-capture rationale). */
  private def resCodesDf(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(s, Family, s"rescodes:$dir") {
      import s.implicits._
      val bc = s.sparkContext.broadcast(resCodebooks(s, dir))
      residualsDf(s, dir)
        .select($"vec_id", $"cell".cast("long").as("cell"), $"rv")
        .as[(Long, Long, Array[Float])]
        .mapPartitions { it =>
          val cb = bc.value
          it.map { case (id, cell, rv) => (id, cell, encodeOne(rv, cb)._1) }
        }
        .toDF("vec_id", "cell", "codes")
    }

  /** `q_knn_ivfpq_res` — residual-encoded IVF+PQ (Jégou et al., IEEE
    * TPAMI 2011 §IV-A, `by_residual=true`): codes quantize x − c(x)
    * instead of x, and each query builds one LUT PER PROBED CELL from
    * its own residual q − c against the residual codebooks. Because
    * q − x = (q − c) − (x − c) exactly, residual ADC approximates the
    * true distance with only the quantization error of the RESIDUAL —
    * whose spread shrinks as ncells grows — where the residual-free
    * form's error is the quantization error of the raw vector. That
    * is what preserves recall at large cell counts (the 100 TB
    * regime); [[qKnnIvfPq]] stays as the cheaper one-LUT-per-query
    * variant. Scale shape is the parent's: broadcasts are query-set-
    * sized (LUTs grow ×nprobe, still tiny), the corpus-side scan is
    * cell-restricted, TopK bounded, rerank touches Cand·|queries|
    * full vectors. Fully deterministic → fully hash-checked end to
    * end. */
  def qKnnIvfPqRes(s: SparkSession, dir: String): DataFrame =
    resAdcSearch(s, dir, resCodebooks(s, dir), resCodesDf(s, dir))

  /** The residual-ADC pipeline tail shared by the seed and trained
    * variants ([[qKnnIvfPqRes]] / [[qKnnIvfPqResTrained]]): probe
    * ranking, one residual LUT per (query, probed cell) against
    * `cbArr`, cell-restricted codegen'd ADC over `codes`, bounded
    * top-Cand merge, exact rerank — the residual twin of
    * [[adcSearch]]. */
  private def resAdcSearch(s: SparkSession, dir: String,
      cbArr: Array[Float], codes: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // query set served from the shared tier (VectorQueries.queriesDf)
    val queries = VectorQueries.queriesDf(s, dir)
    val cents = Tables.embeddings(s, dir)
      .filter($"vec_id" < VectorQueries.NCELLS)
      .select($"vec_id".as("cell"), $"embedding".as("cv"))

    // probe ranking: identical rule to qKnnIvfPq / q_knn_ivf, served
    // from the shared tier ([[VectorQueries.cachedSeedProbes]]); qv
    // rides with the probe rows, so no join back to the query set
    val probes = VectorQueries.cachedSeedProbes(s, dir)

    // one LUT per (query, probed cell): the query's residual against
    // THAT cell's centroid, tabled against the residual codebooks
    val bcR = s.sparkContext.broadcast(cbArr)
    val qres = probes.join(broadcast(cents), "cell")
      .select($"q_id", $"cell".cast("long").as("cell"),
        zip_with($"qv", $"cv", (a, b) => a - b).as("qrv"))
    val probeLuts = qres.as[(Long, Long, Array[Float])]
      .mapPartitions { it =>
        val cb = bcR.value
        it.map { case (qid, cell, qrv) => (qid, cell, lutOf(qrv, cb)) }
      }
      .toDF("q_id", "cell", "lut")

    // ADC over probed cells only — codes already carry their cell
    val adc = codes
      .select($"vec_id".as("nid"), $"codes".as("nc"), $"cell")
      .join(broadcast(probeLuts), "cell")
      .filter($"nid" =!= $"q_id")
      .select($"q_id", $"nid", pqAdcDist($"lut", $"nc", Ksub).as("adc_d"))
    val tk = TopK.topk(Cand)
    val cand = adc.groupBy($"q_id").agg(tk($"nid", $"adc_d").as("tk"))
      .select($"q_id", explode($"tk.ids").as("nid"))

    // full-precision rerank of the surviving candidates only
    val candQ = cand.join(queries, "q_id")
    val d = Tables.embeddings(s, dir).select($"vec_id".as("nid"), $"embedding".as("v"))
      .join(broadcast(candQ), "nid")
      .select($"q_id", $"nid", l2Dist($"qv", $"v").as("dist"))
    VectorQueries.topkExplode(d, K)
  }

  private val Dim = M * SubDim

  /** Trained-residual memo — same JVM-lifetime rationale (and the
    * same [[release]] clear hook) as [[trainedCbCache]]. */
  private val trainedResCbCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Float]]

  /** Trained RESIDUAL codebooks: [[TrainIters]] rounds of the same
    * distributed per-subspace Lloyd ([[lloydRounds]]) over the
    * per-cell residuals x − c(x), seeded from [[resCodebooks]] —
    * Jégou et al. TPAMI 2011 §IV-A's production configuration
    * (`by_residual=true` WITH a trained product quantizer): the
    * codebook spends its entries on the within-cell noise scale,
    * which is what preserves ADC recall as ncells grows (the 100 TB
    * regime; ResidualPqSpec records the 0.866-vs-0.144 candidate-
    * recall win on clustered data). One codebook SHARED across
    * cells, as §IV-A trains it — per-cell codebooks would multiply
    * codebook storage ×ncells for no §IV-A mandate. */
  private[graft] def trainedResCodebooks(s: SparkSession, dir: String): Array[Float] =
    trainedResCbCache.getOrElseUpdate(dir, {
      import s.implicits._
      lloydRounds(s,
        residualsDf(s, dir).select($"vec_id", $"rv").as[(Long, Array[Float])],
        resCodebooks(s, dir))
    })

  /** (vec_id, cell, codes) under the TRAINED residual codebooks —
    * memoized like [[resCodesDf]]. */
  private def trainedResCodesDf(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(s, Family, s"trainedRescodes:$dir") {
      import s.implicits._
      val bc = s.sparkContext.broadcast(trainedResCodebooks(s, dir))
      residualsDf(s, dir)
        .select($"vec_id", $"cell".cast("long").as("cell"), $"rv")
        .as[(Long, Long, Array[Float])]
        .mapPartitions { it =>
          val cb = bc.value
          it.map { case (id, cell, rv) => (id, cell, encodeOne(rv, cb)._1) }
        }
        .toDF("vec_id", "cell", "codes")
    }

  /** `q_knn_ivfpq_res_trained`: the [[qKnnIvfPqRes]] pipeline on
    * TRAINED residual codebooks — the full production IVF+PQ (Jégou
    * §IV-A): coarse cells restrict the scan, Lloyd-trained residual
    * codebooks rank it, exact rerank finishes. Both Lloyd rounds are
    * unrolled in the DuckDB oracle (the `q_knn_pq_trained`
    * technique), so the whole train→encode→probe→ADC→rerank chain is
    * hash-verified. */
  def qKnnIvfPqResTrained(s: SparkSession, dir: String): DataFrame =
    resAdcSearch(s, dir, trainedResCodebooks(s, dir), trainedResCodesDf(s, dir))

  /** Shared residual-chain CTE prefix (both residual variants):
    * cents/assign/resv = per-vector residuals, rcb0 = the SEED
    * residual codebook, rsv = per-(vec, sub) residual subvectors. */
  private val resChainCtes: String =
    s"""cents AS (
       |  SELECT vec_id AS cell, embedding AS cvf, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < ${VectorQueries.NCELLS}
       |), assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), cv), cell) AS rn
       |    FROM embeddings e CROSS JOIN cents) WHERE rn = 1
       |), resv AS (
       |  SELECT e.vec_id, a.cell,
       |    list_transform(range(1, ${Dim + 1}), i -> e.embedding[i] - c.cvf[i]) AS rv
       |  FROM embeddings e
       |  JOIN assign a ON a.vec_id = e.vec_id
       |  JOIN cents c ON c.cell = a.cell
       |), rcb0 AS (
       |  SELECT CAST(t.s AS INTEGER) AS sub,
       |    CAST(r.vec_id - ${VectorQueries.NCELLS} AS INTEGER) AS j,
       |    r.rv[t.s * $SubDim + 1 : t.s * $SubDim + $SubDim] AS cv
       |  FROM resv r, unnest(range(0, $M)) AS t(s)
       |  WHERE r.vec_id >= ${VectorQueries.NCELLS}
       |    AND r.vec_id < ${VectorQueries.NCELLS + Ksub}
       |), rsv AS (
       |  SELECT vec_id, cell, CAST(t.s AS INTEGER) AS sub,
       |    rv[t.s * $SubDim + 1 : t.s * $SubDim + $SubDim] AS v
       |  FROM resv, unnest(range(0, $M)) AS t(s)
       |)""".stripMargin

  /** One Lloyd round over the residual subvectors, rcb{n-1} → rcb{n}
    * — the residual twin of [[trainedCbCtes]]'s round generator
    * (argmin assignment, per-(sub, code, pos) double average
    * FLOAT-rounded, empty codes inheriting via the left join). */
  private def resLloydRound(n: Int): String = {
    val prev = s"rcb${n - 1}"
    s"""rtencd$n AS (
       |  SELECT r.vec_id, r.sub, r.v, cb.j,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${SubDim + 1}),
       |      i -> (r.v[i]::DOUBLE - cb.cv[i]::DOUBLE) * (r.v[i]::DOUBLE - cb.cv[i]::DOUBLE))),
       |      (acc, x) -> acc + x) AS dd
       |  FROM rsv r JOIN $prev cb ON cb.sub = r.sub
       |), rtasg$n AS (
       |  SELECT vec_id, sub, v, j FROM (
       |    SELECT vec_id, sub, v, j,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd, j) AS rn
       |    FROM rtencd$n
       |  ) WHERE rn = 1
       |), rtcagg$n AS (
       |  SELECT sub, j, list(avg_v ORDER BY d)::FLOAT[] AS cv
       |  FROM (
       |    SELECT sub, j, t.d AS d, avg(v[t.d + 1]::DOUBLE) AS avg_v
       |    FROM rtasg$n, unnest(range(0, $SubDim)) AS t(d)
       |    GROUP BY sub, j, t.d
       |  ) GROUP BY sub, j
       |), rcb$n AS (
       |  SELECT p.sub, p.j, coalesce(c.cv, p.cv) AS cv
       |  FROM $prev p LEFT JOIN rtcagg$n c ON c.sub = p.sub AND c.j = p.j
       |)""".stripMargin
  }

  /** The residual-ADC tail against codebook CTE `rcb` — encode,
    * probe, per-(query, cell) residual LUTs, cell-joined ADC,
    * top-Cand, exact rerank. */
  private def resTailSql(rcb: String): String =
    s"""rencd AS (
       |  SELECT rsv.vec_id, rsv.cell, rsv.sub, $rcb.j,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${SubDim + 1}),
       |      i -> (rsv.v[i]::DOUBLE - $rcb.cv[i]::DOUBLE) * (rsv.v[i]::DOUBLE - $rcb.cv[i]::DOUBLE))),
       |      (acc, x) -> acc + x) AS dd
       |  FROM rsv JOIN $rcb ON $rcb.sub = rsv.sub
       |), renc AS (
       |  SELECT vec_id, cell, sub, j AS code FROM (
       |    SELECT vec_id, cell, sub, j,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd, j) AS rn
       |    FROM rencd) WHERE rn = 1
       |), q AS (
       |  SELECT vec_id AS q_id, embedding AS qemb, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id % 50 = 0
       |), probes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q_id, cell,
       |      row_number() OVER (PARTITION BY q_id ORDER BY list_distance(qv, cv), cell) AS rn
       |    FROM q CROSS JOIN cents) WHERE rn <= ${VectorQueries.NPROBE}
       |), qres AS (
       |  SELECT p.q_id, p.cell,
       |    list_transform(range(1, ${Dim + 1}), i -> q.qemb[i] - c.cvf[i]) AS qrv
       |  FROM probes p
       |  JOIN q ON q.q_id = p.q_id
       |  JOIN cents c ON c.cell = p.cell
       |), qrs AS (
       |  SELECT q_id, cell, CAST(t.s AS INTEGER) AS sub,
       |    qrv[t.s * $SubDim + 1 : t.s * $SubDim + $SubDim] AS v
       |  FROM qres, unnest(range(0, $M)) AS t(s)
       |), rlut AS (
       |  SELECT q_id, qrs.cell, $rcb.sub, $rcb.j AS code,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${SubDim + 1}),
       |      i -> (qrs.v[i]::DOUBLE - $rcb.cv[i]::DOUBLE) * (qrs.v[i]::DOUBLE - $rcb.cv[i]::DOUBLE))),
       |      (acc, x) -> acc + x) AS d
       |  FROM qrs JOIN $rcb ON $rcb.sub = qrs.sub
       |), adc AS (
       |  SELECT l.q_id, e.vec_id AS nid,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(l.d ORDER BY l.sub)),
       |      (acc, x) -> acc + x) AS adc_d
       |  FROM renc e
       |  JOIN rlut l ON l.cell = e.cell AND l.sub = e.sub AND l.code = e.code
       |  WHERE e.vec_id <> l.q_id
       |  GROUP BY l.q_id, e.vec_id
       |), cand AS (
       |  SELECT q_id, nid FROM (
       |    SELECT q_id, nid,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adc_d, nid) AS rn
       |    FROM adc) WHERE rn <= $Cand
       |), d AS (
       |  SELECT c.q_id, c.nid,
       |    list_distance(CAST(eq.embedding AS DOUBLE[]), CAST(en.embedding AS DOUBLE[])) AS dist
       |  FROM cand c
       |  JOIN embeddings eq ON eq.vec_id = c.q_id
       |  JOIN embeddings en ON en.vec_id = c.nid
       |), r AS (
       |  SELECT q_id, nid, dist,
       |    row_number() OVER (PARTITION BY q_id ORDER BY dist, nid) AS rn
       |  FROM d
       |)
       |SELECT q_id, CAST(rn AS INTEGER) AS rank, nid AS neighbor_id, round(dist, 4) AS dist
       |FROM r WHERE rn <= $K ORDER BY q_id, rank""".stripMargin

  val qKnnIvfPqResSql: String =
    s"""WITH $resChainCtes,
       |${resTailSql("rcb0")}""".stripMargin

  val qKnnIvfPqResTrainedSql: String =
    s"""WITH $resChainCtes,
       |${(1 to TrainIters).map(resLloydRound).mkString(",\n")},
       |${resTailSql(s"rcb$TrainIters")}""".stripMargin

  // ------------------------------------------------- two-tier file serving

  /** One single-file index per (sf dir, JVM) for [[qPqServe]] — the
    * build-once/serve-many contract every index query here follows. */
  private val serveFile = scala.collection.concurrent.TrieMap.empty[String, String]

  private[operators] def cachedServeFile(s: SparkSession, dir: String): String =
    serveFile.getOrElseUpdate(dir, {
      val sf = dir.replaceAll(".*/", "")
      val path = graft.TempCleanup.onExit(
        s"/tmp/graft_pqserve_${sf}_${s.sparkContext.applicationId}.idx")
      val p = graft.index.VamanaParams(metric = "cosine")
      // merged build, not numShards=1: a monolithic kernel build is a
      // single task, which the sf10 rehearsal (2M vectors) caught
      // running one core for hours while 31 idled. buildMerged keeps
      // every build task ~50k rows and unions the overlap-2 adjacency
      // into the same single-graph shape this single-file tier needs;
      // small corpora (n ≤ 50k) still take the monolithic kernel path
      // byte-for-byte.
      val emb = Tables.embeddings(s, dir)
      val shards = graft.index.VamanaIndex.mergedShards(emb.count())
      val idx = graft.index.VamanaIndex.buildMerged(emb, p, shards)
      graft.index.SingleFileIndex.export(idx, p, path)
      path
    })

  /** `q_pq_serve`: the DiskANN two-tier serving mode over the
    * reference-layout single file — PQ codes resident in executor
    * memory steer the traversal, exact distances come off the mmap
    * only for adjacency and the final rerank
    * ([[graft.index.SingleFileIndex.servePq]]). Rows-only in the
    * driver gate (the PQ-steered candidate set is approximate);
    * recall and exact-rerank-parity floors are pinned in
    * SingleFileIndexSpec. */
  def qPqServe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = VectorQueries.queriesDf(s, dir)
    graft.index.SingleFileIndex.servePq(
      qs, cachedServeFile(s, dir), K, beamWidth = 64)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pq_encode" -> (qPqEncode(_, _)),
    "q_knn_pq" -> (qKnnPq(_, _)),
    "q_knn_pq_trained" -> (qKnnPqTrained(_, _)),
    "q_knn_ivfpq" -> (qKnnIvfPq(_, _)),
    "q_knn_ivfpq_res" -> (qKnnIvfPqRes(_, _)),
    "q_knn_ivfpq_res_trained" -> (qKnnIvfPqResTrained(_, _)),
    "q_pq_serve" -> (qPqServe(_, _)))
  val oracles: Map[String, String] = Map(
    "q_pq_encode" -> qPqEncodeSql,
    "q_knn_pq" -> qKnnPqSql,
    "q_knn_pq_trained" -> qKnnPqTrainedSql,
    "q_knn_ivfpq" -> qKnnIvfPqSql,
    "q_knn_ivfpq_res" -> qKnnIvfPqResSql,
    "q_knn_ivfpq_res_trained" -> qKnnIvfPqResTrainedSql)
}
