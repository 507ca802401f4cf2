package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorExprs._

/** Optimized Product Quantization (OPQ, Ge et al., CVPR'13 /
  * TPAMI'14): rotate the space with a learned orthonormal matrix `R`
  * before PQ so the variance (and thus quantization error) is
  * balanced across the M subspaces, then run the unchanged PQ
  * encode→ADC→rerank chain on `R·x`. This is the parametric variant
  * (OPQ-P, §5 of the paper): eigendecompose the data covariance and
  * allocate eigen-dimensions to subspaces balancing the per-subspace
  * eigenvalue product — closed-form, no alternating optimization, and
  * the production default in public ANN libraries when data is
  * roughly Gaussian.
  *
  * Like the BPE vocabulary ([[TextAnalysis.BpeMerges]]), the rotation
  * is LEARNED OFFLINE ([[graft.examples.OpqTrain]] — distributed
  * moment scan, driver-local 64×64 Jacobi eigendecomposition) and
  * ships as a frozen resource (`opq_rotation.txt`), the way FAISS
  * persists a trained `OPQMatrix`. Everything downstream is therefore
  * deterministic and oracle-replayable: the DuckDB oracle carries the
  * same float literals and replays rotation (double left-to-right
  * accumulation, FLOAT-rounded outputs), encode, ADC and rerank term
  * for term.
  *
  * Scale shape: the rotation is dim² floats (16 KiB) — broadcast; the
  * rotate pass is a zero-shuffle mapPartitions projection, folded
  * into the same scan that PQ-encodes, so OPQ costs ONE extra
  * dim²-flop kernel per vector at 100 TB and nothing in shuffle.
  *
  * Reference anchor: the reference engine quantizes raw slices
  * (rust-diskann's PQ path); OPQ is the published upgrade the same
  * codebook budget buys when the embedding covariance is anisotropic.
  */
object Opq {

  /** PlanCache family tag (rotated corpus + codes). */
  private[graft] val Family = "opq"

  def release(s: SparkSession): Unit = {
    graft.PlanCache.release(s, Family)
    trainedRotCbCache.clear()
  }

  private[graft] val Dim = PQ.M * PQ.SubDim // 64

  // ------------------------------------------------------- training

  /** Mean + covariance accumulated in vec_id order (caller sorts) —
    * driver-local by design: the trainer's distributed step is the
    * scan that delivers the vectors; the 64×64 second-moment matrix
    * is the only state. Returns (count, mean, covariance row-major).
    */
  private[graft] def moments(vecs: Iterator[Array[Float]]): (Long, Array[Double], Array[Double]) =
    momentsOf(vecs, Dim)

  /** Dimension-parametric [[moments]] — the serving-tier form
    * ([[trainRotation]]); Jacobi is O(n³·sweeps), so keep n ≲ 256
    * driver-side (beyond that, real systems call LAPACK). */
  private[graft] def momentsOf(vecs: Iterator[Array[Float]], n: Int): (Long, Array[Double], Array[Double]) = {
    val sum = new Array[Double](n)
    val xx = new Array[Double](n * n)
    var cnt = 0L
    vecs.foreach { v =>
      require(v.length == n, s"dim ${v.length} != $n")
      var i = 0
      while (i < n) {
        val xi = v(i).toDouble
        sum(i) += xi
        var j = 0
        while (j < n) { xx(i * n + j) += xi * v(j).toDouble; j += 1 }
        i += 1
      }
      cnt += 1
    }
    require(cnt > 1, "need at least 2 vectors")
    val mean = sum.map(_ / cnt)
    val cov = new Array[Double](n * n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        cov(i * n + j) = xx(i * n + j) / cnt - mean(i) * mean(j)
        j += 1
      }
      i += 1
    }
    (cnt, mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric n×n matrix —
    * textbook (Golub & Van Loan §8.5): sweep all (p,q) pairs, each
    * rotation zeroing a(p,q), until the off-diagonal Frobenius mass
    * is numerically zero. Returns (eigenvalues, eigenvectors
    * column-major: V(i*n+k) = component i of eigenvector k), with
    * A = V · diag(λ) · Vᵀ. dim 64 → ~8 sweeps, microseconds.
    *
    * `maxSweeps`: full convergence (the default 64 — the committed
    * 64-dim artifact's rule, NEVER change it for that path) vs a
    * FIXED sweep budget for high-dim rehearsal/serving-tier training:
    * at dim 1536 one sweep is ~116 GB of strided row+column traffic
    * and full convergence is tens of sweeps, while OPQ only needs the
    * variance roughly balanced — a handful of sweeps captures nearly
    * all of the off-diagonal reduction (measured at HiDimSpec's OPQ
    * datapoint), and a fixed budget stays deterministic. */
  private[graft] def jacobiEigen(aIn: Array[Double], n: Int,
      maxSweeps: Int = 64): (Array[Double], Array[Double]) = {
    val a = aIn.clone()
    val v = new Array[Double](n * n)
    var i = 0
    while (i < n) { v(i * n + i) = 1.0; i += 1 }
    def off(): Double = {
      var s = 0.0; var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) { val x = a(p * n + q); s += 2 * x * x; q += 1 }
        p += 1
      }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > 1e-20) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p * n + q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q * n + q) - a(p * n + p)) / (2.0 * apq)
            // tan of the rotation angle — the smaller root, |t| <= 1
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // update A = Jᵀ A J on rows/cols p, q
            var k = 0
            while (k < n) {
              val akp = a(k * n + p); val akq = a(k * n + q)
              a(k * n + p) = c * akp - s * akq
              a(k * n + q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p * n + k); val aqk = a(q * n + k)
              a(p * n + k) = c * apk - s * aqk
              a(q * n + k) = s * apk + c * aqk
              k += 1
            }
            // accumulate V = V · J
            k = 0
            while (k < n) {
              val vkp = v(k * n + p); val vkq = v(k * n + q)
              v(k * n + p) = c * vkp - s * vkq
              v(k * n + q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = new Array[Double](n)
    i = 0
    while (i < n) { eig(i) = a(i * n + i); i += 1 }
    (eig, v)
  }

  /** Eigenvalue allocation (Ge et al. §5 "eigenvalue allocation"):
    * visit eigen-dims in descending-λ order; each goes to the
    * non-full bucket with the smallest current log-product of
    * eigenvalues (tie → lowest bucket). Balances per-subspace
    * variance products, which is what equalizes per-subspace
    * quantization error under a shared code budget. Returns, per
    * output slot j (bucket-major), the eigen index it carries. */
  private[graft] def allocate(eig: Array[Double], m: Int, subDim: Int): Array[Int] = {
    val order = eig.indices.sortBy(i => (-eig(i), i))
    val logSum = new Array[Double](m)
    val buckets = Array.fill(m)(Vector.empty[Int])
    order.foreach { e =>
      var best = -1; var bestLs = Double.MaxValue
      var b = 0
      while (b < m) {
        // an EMPTY bucket ranks below any partial product (−∞, not
        // log 1 = 0): with eigenvalues < 1 — every near-unit-scale
        // embedding corpus — partial log-products are negative, so
        // treating empty as 0 sent EVERY leading eigendirection into
        // bucket 0 until it filled (measured: all four factors of a
        // rank-4 corpus in one subspace, rotated PQ error WORSE than
        // raw). Spreading the m largest eigenvalues first is what the
        // paper's λ > 1 setting gets implicitly, and it makes the
        // greedy scale-invariant in effect.
        val ls = if (buckets(b).isEmpty) Double.NegativeInfinity else logSum(b)
        if (buckets(b).length < subDim && ls < bestLs) {
          bestLs = ls; best = b
        }
        b += 1
      }
      buckets(best) :+= e
      logSum(best) += math.log(math.max(eig(e), 1e-12))
    }
    buckets.flatten.toArray
  }

  /** Assemble the flat out-major rotation: rot(j·Dim + i) = weight of
    * input i in output j, output slot j carrying eigenvector
    * `order(j)` — i.e. y = Pᵀ·Uᵀ·x with P the allocation permutation.
    * FLOAT-rounded: this is the exact artifact both engines replay. */
  private[graft] def buildRotation(eigvecs: Array[Double], order: Array[Int]): Array[Float] =
    buildRotationOf(eigvecs, order, Dim)

  private[graft] def buildRotationOf(eigvecs: Array[Double], order: Array[Int],
      n: Int): Array[Float] = {
    require(order.length == n)
    val rot = new Array[Float](n * n)
    var j = 0
    while (j < n) {
      val k = order(j)
      var i = 0
      while (i < n) { rot(j * n + i) = eigvecs(i * n + k).toFloat; i += 1 }
      j += 1
    }
    rot
  }

  /** One-call dimension-parametric OPQ-P trainer — the serving-tier
    * form (the gated queries use the frozen 64-dim artifact; a
    * serve-time index over a real-dim corpus trains its own rotation
    * the same way it trains its [[graft.index.PqCodebook]]):
    * covariance → cyclic Jacobi → eigenvalue allocation → out-major
    * rotation. Deterministic for a fixed input order. Driver-side
    * Jacobi is O(n³·sweeps), so the dim is bounded (beyond ~512 a
    * real system calls LAPACK — documented, not hidden). */
  def trainRotation(vecs: Array[Array[Float]], m: Int,
      maxSweeps: Int = 64): Array[Float] = {
    require(vecs.nonEmpty, "empty training set")
    val n = vecs.head.length
    require(n % m == 0, s"dim $n not divisible by m=$m")
    // Jacobi at the 1536-dim serving shape is memory-bound (one sweep
    // ≈ 116 GB of row+column traffic): with the open-ended default
    // budget past dim 512 this two-sided path measures >20 min per
    // decomposition, so ROUTE to the memory-local one-sided form
    // ([[trainRotationHiDim]]) instead of stalling. Callers wanting
    // two-sided Jacobi at high dim must pass an explicit small budget
    // (HiDimSpec trains at 6); call LAPACK in a real deployment past
    // ~2048.
    require(n <= 2048, s"driver-side Jacobi is O(n^3); dim $n exceeds the 2048 bound")
    if (n > 512 && maxSweeps >= 64)
      return trainRotationHiDim(vecs, m)
    val (_, _, cov) = momentsOf(vecs.iterator, n)
    val (eig, v) = jacobiEigen(cov, n, maxSweeps)
    buildRotationOf(v, allocate(eig, m, n / m), n)
  }

  /** One-sided (Hestenes) Jacobi eigendecomposition of the SAMPLE
    * COVARIANCE, for the high-dim serving tier — the memory-LOCAL
    * formulation: instead of rotating an n×n covariance (whose
    * column updates at dim 1536 are 12 KB-strided — one TLB-hostile
    * walk per element, measured >20 min/decomposition on a
    * page-walk-throttled host), rotate COLUMN PAIRS of the centered
    * sample matrix itself. Every touched vector (two data columns of
    * `rows` doubles, two basis rows of n doubles) is CONTIGUOUS, so
    * the sweep streams at memory bandwidth. Identity: orthogonalizing
    * the columns of the centered X finds V with X·V = U·Σ, i.e. V =
    * eigenvectors of XᵀX/rows and λ_k = ‖(X·V)_k‖²/rows. Returns the
    * [[jacobiEigen]] layout: (eigenvalues, eigvecs with V(i*n+k) =
    * component i of eigenvector k). Deterministic: cyclic pair order,
    * fixed sweep budget, rotation skips on |a_pq| ≤ 1e-12·√(a_pp·a_qq).
    */
  private[graft] def hestenesEigen(data: Array[Array[Float]], n: Int,
      maxSweeps: Int): (Array[Double], Array[Double]) = {
    val rows = data.length
    require(rows > 1, "need at least 2 sample vectors")
    val mean = new Array[Double](n)
    data.foreach { v =>
      require(v.length == n, s"dim ${v.length} != $n")
      var i = 0
      while (i < n) { mean(i) += v(i); i += 1 }
    }
    var i = 0
    while (i < n) { mean(i) /= rows; i += 1 }
    // column-major centered sample: cols(j) is contiguous
    val cols = Array.tabulate(n) { j =>
      val c = new Array[Double](rows)
      var r = 0
      while (r < rows) { c(r) = data(r)(j).toDouble - mean(j); r += 1 }
      c
    }
    // basis accumulator, one ROW per eigenvector (contiguous updates)
    val vrows = Array.tabulate(n) { j =>
      val b = new Array[Double](n); b(j) = 1.0; b
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var k = 0
      while (k < a.length) { s += a(k) * b(k); k += 1 }
      s
    }
    var sweep = 0
    var rotated = 1
    while (sweep < maxSweeps && rotated > 0) {
      rotated = 0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val cp = cols(p); val cq = cols(q)
          val app = dot(cp, cp); val aqq = dot(cq, cq); val apq = dot(cp, cq)
          if (math.abs(apq) > 1e-12 * math.sqrt(app * aqq)) {
            rotated += 1
            val tau = (aqq - app) / (2.0 * apq)
            val t = math.signum(tau) match {
              case 0.0 => 1.0 / (tau + math.sqrt(1.0 + tau * tau))
              case sg => sg / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            }
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var r = 0
            while (r < rows) {
              val x = cp(r); val y = cq(r)
              cp(r) = c * x - s * y
              cq(r) = s * x + c * y
              r += 1
            }
            val vp = vrows(p); val vq = vrows(q)
            var k = 0
            while (k < n) {
              val x = vp(k); val y = vq(k)
              vp(k) = c * x - s * y
              vq(k) = s * x + c * y
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = Array.tabulate(n)(j => dot(cols(j), cols(j)) / rows)
    val v = new Array[Double](n * n)
    var k = 0
    while (k < n) {
      var ii = 0
      while (ii < n) { v(ii * n + k) = vrows(k)(ii); ii += 1 }
      k += 1
    }
    (eig, v)
  }

  /** [[trainRotation]] for the HIGH-DIM serving tier: same moments →
    * eigen → allocation chain, but the eigensolver is the
    * memory-local [[hestenesEigen]] over the (centered) sample — the
    * form that stays tractable at the reference's 1536-dim serving
    * shape (HiDimSpec records the wall time and the error/recall
    * deltas). The frozen 64-dim gate artifact keeps the original
    * [[jacobiEigen]] path so its byte-exact reproduction pin never
    * moves. */
  def trainRotationHiDim(vecs: Array[Array[Float]], m: Int,
      maxSweeps: Int = 12): Array[Float] = {
    require(vecs.nonEmpty, "empty training set")
    val n = vecs.head.length
    require(n % m == 0, s"dim $n not divisible by m=$m")
    require(n <= 4096, s"driver-side one-sided Jacobi: dim $n exceeds the 4096 bound")
    val (eig, v) = hestenesEigen(vecs, n, maxSweeps)
    buildRotationOf(v, allocate(eig, m, n / m), n)
  }

  /** Dimension-parametric [[rotate]]. */
  private[graft] def rotateOf(v: Array[Float], rot: Array[Float], n: Int): Array[Float] = {
    val out = new Array[Float](n)
    var j = 0
    while (j < n) {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += rot(j * n + i).toDouble * v(i).toDouble; i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    out
  }

  // ------------------------------------------------ frozen rotation

  /** The committed rotation (out-major flat, [[Dim]]²) — learned once
    * from the sf0.1 corpus by [[graft.examples.OpqTrain]]. */
  lazy val Rotation: Array[Float] = {
    val in = getClass.getResourceAsStream("/graft/opq_rotation.txt")
    require(in != null, "missing resource graft/opq_rotation.txt — run graft.examples.OpqTrain")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val r = src.getLines().filter(_.nonEmpty)
        .flatMap(_.split(" ").iterator.map(_.toFloat)).toArray
      require(r.length == Dim * Dim, s"rotation has ${r.length} entries, want ${Dim * Dim}")
      r
    } finally src.close()
  }

  /** y_j = Σᵢ rot(j·Dim+i)·x_i — double accumulation left-to-right
    * over i, FLOAT-rounded per output coordinate; the DuckDB replay
    * is the same ordered prepend-reduce. */
  private[graft] def rotate(v: Array[Float], rot: Array[Float]): Array[Float] =
    rotateOf(v, rot, Dim)

  /** Rotated corpus `(vec_id, embedding)` — broadcast rotation,
    * zero-shuffle mapPartitions, memoized per (dir, session) like
    * [[PQ.codesDf]]. */
  private[graft] def rotatedEmbeddings(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(s, Family, s"rotated:$dir") {
      import s.implicits._
      val bc = s.sparkContext.broadcast(Rotation)
      Tables.embeddings(s, dir).select($"vec_id", $"embedding")
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val r = bc.value
          it.map { case (id, v) => (id, rotate(v, r)) }
        }
        .toDF("vec_id", "embedding")
    }

  /** Seed codebooks over the ROTATED corpus — same rule as
    * [[PQ.codebooks]] (subvector slices of the Ksub lowest-id
    * vectors), applied after rotation so codebooks live in the space
    * they quantize. */
  private[graft] def rotatedCodebooks(s: SparkSession, dir: String): Array[Float] = {
    import s.implicits._
    val rot = Rotation
    PQ.packCodebooks(Tables.embeddings(s, dir).filter($"vec_id" < PQ.Ksub)
      .select($"vec_id".cast("int"), $"embedding")
      .as[(Int, Array[Float])].collect().sortBy(_._1).map(p => rotate(p._2, rot)))
  }

  private def rotatedCodesDf(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(s, Family, s"codes:$dir") {
      import s.implicits._
      val bc = s.sparkContext.broadcast(rotatedCodebooks(s, dir))
      rotatedEmbeddings(s, dir)
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val cb = bc.value
          it.map { case (id, v) => (id, PQ.encodeOne(v, cb)._1) }
        }
        .toDF("vec_id", "codes")
    }

  // --------------------------------------------------------- queries

  /** `q_opq_encode`: OPQ codes + per-subspace quantization error for
    * every vector — `q_pq_encode` on the rotated corpus, fully
    * hash-verified (the oracle rotates with the same float literals
    * and replays the argmin). */
  def qOpqEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(rotatedCodebooks(s, dir))
    rotatedEmbeddings(s, dir)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cb = bc.value
        it.flatMap { case (id, v) =>
          val (codes, errs) = PQ.encodeOne(v, cb)
          (0 until PQ.M).iterator.map { sub =>
            (id, sub, codes(sub), math.rint(errs(sub) * 1e4) / 1e4)
          }
        }
      }
      .toDF("vec_id", "sub", "code", "sub_err")
      .orderBy($"vec_id", $"sub")
  }

  /** `q_knn_opq`: the full OPQ search chain — rotate, seed-codebook
    * encode, ADC candidate scan, exact rerank in the rotated space
    * (R is orthonormal, so rotated-L2 IS L2 up to float rounding;
    * staying in one space keeps the chain hash-checkable end to
    * end). Identical pipeline and plan shape to `q_knn_pq` — the
    * rotation adds one broadcast projection to the encode scan. */
  def qKnnOpq(s: SparkSession, dir: String): DataFrame =
    PQ.adcSearchOn(s, rotatedEmbeddings(s, dir),
      rotatedCodebooks(s, dir), rotatedCodesDf(s, dir))

  // ---------------------------------------------------- trained OPQ

  /** Trained-on-rotated codebook memo — the [[PQ.trainedCodebooks]]
    * convention (deterministic, JVM-lifetime, cleared on release).
    * Keyed by dir ONLY (not per-session like [[graft.PlanCache]]),
    * which assumes a dir's corpus is IMMUTABLE within a JVM lifetime
    * — true for every caller here (testdata dirs never mutate; the
    * mains are one-shot). [[release]] clears it for all dirs; that
    * over-clearing is harmless because the entries are deterministic
    * recomputes, never stale state. A caller that rewrites a corpus
    * in place must release() in between. */
  private val trainedRotCbCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Float]]

  /** Codebooks from [[PQ.TrainIters]] distributed Lloyd rounds over
    * the ROTATED corpus, seeded from [[rotatedCodebooks]] — OPQ-P's
    * full production configuration (Ge et al. §5 pair the learned
    * rotation with k-means-trained sub-codebooks; FAISS ships exactly
    * this as OPQMatrix + trained ProductQuantizer). */
  private[graft] def trainedRotatedCodebooks(s: SparkSession, dir: String): Array[Float] =
    trainedRotCbCache.getOrElseUpdate(dir, {
      import s.implicits._
      PQ.lloydRounds(s, rotatedEmbeddings(s, dir).as[(Long, Array[Float])],
        rotatedCodebooks(s, dir))
    })

  private def trainedRotCodesDf(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(s, Family, s"codesT:$dir") {
      import s.implicits._
      val bc = s.sparkContext.broadcast(trainedRotatedCodebooks(s, dir))
      rotatedEmbeddings(s, dir)
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val cb = bc.value
          it.map { case (id, v) => (id, PQ.encodeOne(v, cb)._1) }
        }
        .toDF("vec_id", "codes")
    }

  /** `q_knn_opq_trained`: the q_knn_opq chain on TRAINED codebooks —
    * rotate, two distributed Lloyd rounds in the rotated space, ADC,
    * exact rerank; both Lloyd rounds unrolled in the DuckDB oracle on
    * the rotated CTE (the q_knn_pq_trained technique), so the full
    * production configuration is hash-gated end to end. */
  def qKnnOpqTrained(s: SparkSession, dir: String): DataFrame =
    PQ.adcSearchOn(s, rotatedEmbeddings(s, dir),
      trainedRotatedCodebooks(s, dir), trainedRotCodesDf(s, dir))

  lazy val qKnnOpqTrainedSql: String = PQ.knnPqTrainedSqlOn(rotatedCtes, "re")

  // --------------------------------------- binary (sign-bit) quantization

  private val BinCand = 50
  private val K = 10

  /** Sign-bit codes of the corpus — one 62-bit word per vector (the
    * [[VectorQueries.sparkBitCode]] pack), memoized per
    * (dir, session).
    *
    * RAW vectors, not rotated, by MEASUREMENT: sign bits want
    * ISOTROPIC variance (every bit equally informative — RaBitQ [Gao
    * & Long, SIGMOD'24] applies a RANDOM rotation to get it), while
    * the committed OPQ rotation is eigenvalue-ALLOCATED PCA, which
    * concentrates variance per dimension. On this corpus the OPQ
    * rotation measurably HURT binary candidate recall (0.67 vs 0.71
    * raw, top-50 candidates at sf0.01), and r17 extended the finding
    * to the RANDOM rotation too (0.59 — the corpus-independent
    * hyperplane-LSH floor; this synthetic corpus is axis-structured,
    * so the raw axes are already better-than-random hyperplanes).
    * The raw pack stays the default; the rotated variant ships as
    * [[qKnnBinaryRot]] — the safe choice for corpora that are NOT
    * axis-friendly (sparse stress: raw 0.14 vs rotated 0.55,
    * OpqSpec). */
  private def bitCodes(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(s, Family, s"bits:$dir") {
      import s.implicits._
      Tables.embeddings(s, dir)
        .select($"vec_id", expr(VectorQueries.sparkBitCode).as("code"))
    }

  /** (vec_id, code, cell) — [[bitCodes]] co-located with its IVF cell
    * assignment, memoized like PQ's cellCodesDf / resCodesDf: a
    * disk-resident IVF×binary tier stores the sign words inside their
    * cell's inverted list, so the serving path never pays the
    * per-evaluation corpus assignment + corpus-to-corpus join
    * [[qKnnIvfBinary]] used to run. */
  private def cellBitCodes(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(s, Family, s"cellbits:$dir") {
      bitCodes(s, dir).join(VectorQueries.ivfAssign(s, dir), "vec_id")
    }

  /** `q_knn_binary`: 1-bit-per-dimension quantized search — sign-bit
    * codes (hyperplane LSH, Charikar STOC'02; the compression tier
    * RaBitQ builds its estimator on), Hamming candidate scan over one
    * packed 62-bit word per vector, exact rerank of the survivors.
    * The deepest compression tier in the family — 8 code bytes TOTAL
    * per vector at dim 64 — and the Hamming scan is one xor+popcount
    * per candidate, the cheapest candidate kernel a 100 TB scan can
    * run (no LUT, cache-line friendly). Plan shape = q_knn_pq's
    * (codes scan × broadcast query codes, bounded TopK, rerank
    * touches only Cand·|queries| full vectors). */
  def qKnnBinary(s: SparkSession, dir: String): DataFrame =
    knnBinaryOn(s, dir, bitCodes(s, dir))

  /** The shared sign-bit chain over ANY coded frame `(vec_id, code)`:
    * Hamming candidate scan vs broadcast query words, bounded
    * top-[[BinCand]], exact L2 rerank on the RAW corpus (rotations
    * are orthonormal, so raw-space rerank is the right final metric
    * for every code variant — and it keeps the output dist column
    * byte-comparable across variants). */
  private def knnBinaryOn(s: SparkSession, dir: String, coded: DataFrame): DataFrame = {
    import s.implicits._
    val q = coded.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"code".as("qc"))
    val h = coded.select($"vec_id".as("nid"), $"code".as("nc"))
      .join(broadcast(q))
      .filter($"nid" =!= $"q_id")
      .select($"q_id", $"nid",
        bit_count($"nc".bitwiseXOR($"qc")).cast("double").as("hdist"))
    val tk = TopK.topk(BinCand)
    val cand = h.groupBy($"q_id").agg(tk($"nid", $"hdist").as("tk"))
      .select($"q_id", explode($"tk.ids").as("nid"))
    val emb = Tables.embeddings(s, dir)
    val qv = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val d = emb.select($"vec_id".as("nid"), $"embedding".as("v"))
      .join(broadcast(cand.join(qv, "q_id")), "nid")
      .select($"q_id", $"nid", l2Dist($"qv", $"v").as("dist"))
    VectorQueries.topkExplode(d, K)
  }

  /** DuckDB replay of the [[knnBinaryOn]] chain — the q_dist_hamming
    * oracle's 62-bit pack over `codeSrc` (raw `embeddings`, or a
    * rotated CTE prepended via `ctePrefix`), Hamming candidate
    * ranking (ties → lower id, the TopK rule), exact rerank on the
    * RAW corpus. */
  private def knnBinarySqlOn(ctePrefix: String, codeSrc: String): String =
    s"""WITH ${ctePrefix}coded AS (
       |  SELECT vec_id,
       |    CAST(list_sum(list_transform(range(0, 62),
       |      i -> CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS code
       |  FROM $codeSrc
       |), q AS (
       |  SELECT vec_id AS q_id, code AS qc FROM coded WHERE vec_id % 50 = 0
       |), h AS (
       |  SELECT q.q_id, c.vec_id AS nid, bit_count(xor(c.code, q.qc)) AS hd
       |  FROM coded c CROSS JOIN q WHERE c.vec_id <> q.q_id
       |), cand AS (
       |  SELECT q_id, nid FROM (
       |    SELECT q_id, nid,
       |      row_number() OVER (PARTITION BY q_id ORDER BY hd, nid) AS rn
       |    FROM h
       |  ) WHERE rn <= $BinCand
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

  lazy val qKnnBinarySql: String = knnBinarySqlOn("", "embeddings")

  // --------------------------- randomly-rotated sign bits (RaBitQ-style)

  /** Seed of the frozen random rotation — part of the artifact
    * contract the way [[PQ.Ksub]] seeding is. */
  private[graft] val BinRotSeed = 0x9a17b2c4e01dL

  /** Deterministic random orthonormal matrix: splitmix64 →
    * Box–Muller Gaussians (StrictMath throughout, so the draw is
    * bit-identical on every JVM/platform) → modified Gram–Schmidt in
    * double → FLOAT-rounded out-major flat. This is RaBitQ's
    * pre-conditioner (Gao & Long, SIGMOD'24: sign-bit codes estimate
    * angles well only when variance is ISOTROPIC; a random rotation
    * delivers isotropy corpus-independently — unlike the OPQ
    * rotation, whose eigenvalue allocation CONCENTRATES variance and
    * measurably hurt binary recall here, the negative finding at
    * [[bitCodes]]). */
  private[graft] def randomRotationOf(n: Int, seed: Long): Array[Float] = {
    var z = seed
    def nextLong(): Long = {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    def unit(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
    def gauss(): Double = {
      val u1 = 1.0 - unit() // (0, 1] — log never sees 0
      val u2 = unit()
      StrictMath.sqrt(-2.0 * StrictMath.log(u1)) *
        StrictMath.cos(2.0 * StrictMath.PI * u2)
    }
    val rows = Array.fill(n)(Array.fill(n)(gauss()))
    var j = 0
    while (j < n) {
      var k = 0
      while (k < j) {
        var dot = 0.0; var i = 0
        while (i < n) { dot += rows(j)(i) * rows(k)(i); i += 1 }
        i = 0
        while (i < n) { rows(j)(i) -= dot * rows(k)(i); i += 1 }
        k += 1
      }
      var nrm = 0.0; var i = 0
      while (i < n) { nrm += rows(j)(i) * rows(j)(i); i += 1 }
      nrm = StrictMath.sqrt(nrm)
      // n iid Gaussians are degenerate with probability 0; a seed
      // that hit it would need a different seed, loudly
      require(nrm > 1e-9, s"degenerate Gaussian draw at row $j (seed $seed)")
      i = 0
      while (i < n) { rows(j)(i) /= nrm; i += 1 }
      j += 1
    }
    val out = new Array[Float](n * n)
    j = 0
    while (j < n) {
      var i = 0
      while (i < n) { out(j * n + i) = rows(j)(i).toFloat; i += 1 }
      j += 1
    }
    out
  }

  /** The frozen random rotation ([[Dim]]², ~16 KiB — broadcast). */
  lazy val BinRotation: Array[Float] = randomRotationOf(Dim, BinRotSeed)

  /** Sign-bit codes of the RANDOMLY-ROTATED corpus — the RaBitQ-tier
    * code: rotate is the same zero-shuffle mapPartitions kernel as
    * [[rotatedEmbeddings]], the pack is [[VectorQueries.sparkBitCode]]
    * unchanged. */
  private def rotBitCodes(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(s, Family, s"binrot:$dir") {
      import s.implicits._
      val bc = s.sparkContext.broadcast(BinRotation)
      Tables.embeddings(s, dir).select($"vec_id", $"embedding")
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val r = bc.value
          it.map { case (id, v) => (id, rotate(v, r)) }
        }
        .toDF("vec_id", "embedding")
        .select($"vec_id", expr(VectorQueries.sparkBitCode).as("code"))
    }

  /** `q_knn_binary_rot`: sign-bit search after the frozen RANDOM
    * rotation — the RaBitQ configuration of the binary tier. Same
    * storage (one 62-bit word/vector), same Hamming scan and raw-
    * space rerank as [[qKnnBinary]]; the rotation costs one
    * broadcast dim²-flop kernel folded into the coding scan, nothing
    * in shuffle.
    *
    * What the rotation buys — MEASURED, both directions (OpqSpec):
    * it makes the code's quality CORPUS-INDEPENDENT, at the price of
    * corpus-specific structure the raw axes may already capture. On
    * the bench corpus (axis-structured synthetic) raw wins: 0.71 vs
    * 0.59 candidate recall@50→10 at sf0.01 — the rotated figure is
    * the hyperplane-LSH floor any rotation of any corpus gets. On an
    * axis-PATHOLOGICAL corpus (6-of-64 sparse, where zero and
    * negative coordinates collapse into the same bit) the raw pack
    * craters to 0.14 while the rotated one holds 0.55 — the 4×
    * insurance RaBitQ's preconditioner exists for. Production rule:
    * raw for corpora validated axis-friendly, rotated as the safe
    * default for unknown/sparse/adversarial embeddings. */
  def qKnnBinaryRot(s: SparkSession, dir: String): DataFrame =
    knnBinaryOn(s, dir, rotBitCodes(s, dir))

  /** DuckDB replay of [[qKnnBinaryRot]] — the rotation literals
    * replayed like OPQ's, then the binary chain on the rotated CTE
    * (rerank stays on raw `embeddings`). */
  lazy val qKnnBinaryRotSql: String =
    knnBinarySqlOn(rotationCtes(BinRotation), "re")

  /** `q_knn_ivf_binary` — the two reductions COMPOSED (the IVF+PQ
    * pattern with sign codes in place of ADC): probe ranking
    * restricts candidates to nprobe/ncells of the corpus (partition
    * pruning) AND each candidate costs one xor+popcount over an
    * 8-byte word. At the billion-vector tier this is the cheapest
    * honest first pass there is — cells×words is the scan footprint,
    * and the word fits the cache line the id already occupies. Chain:
    * probe ranking (q_knn_ivf's exact rule) → Hamming scan of probed
    * cells only → bounded top-Cand → exact rerank; fully
    * deterministic → fully hash-checked like both parents. */
  def qKnnIvfBinary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // query set served from the shared tier (VectorQueries.queriesDf)
    val queries = VectorQueries.queriesDf(s, dir)
    // probe ranking (q_knn_ivf's exact rule), served from the shared
    // tier ([[VectorQueries.cachedSeedProbes]])
    val probes = VectorQueries.cachedSeedProbes(s, dir)
      .select($"q_id", $"cell")
    // the query's own sign word rides with its probe rows (tiny set)
    val probeQ = probes.join(
      bitCodes(s, dir).filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_id"), $"code".as("qc")), "q_id")
    val h = cellBitCodes(s, dir)
      .select($"vec_id".as("nid"), $"code".as("nc"), $"cell")
      .join(broadcast(probeQ), "cell")
      .filter($"nid" =!= $"q_id")
      .select($"q_id", $"nid",
        bit_count($"nc".bitwiseXOR($"qc")).cast("double").as("hdist"))
    val tk = TopK.topk(BinCand)
    val cand = h.groupBy($"q_id").agg(tk($"nid", $"hdist").as("tk"))
      .select($"q_id", explode($"tk.ids").as("nid"))
    val d = Tables.embeddings(s, dir).select($"vec_id".as("nid"), $"embedding".as("v"))
      .join(broadcast(cand.join(queries, "q_id")), "nid")
      .select($"q_id", $"nid", l2Dist($"qv", $"v").as("dist"))
    VectorQueries.topkExplode(d, K)
  }

  /** DuckDB replay of [[qKnnIvfBinary]] — the q_knn_ivf probe CTEs
    * composed with the binary pack/Hamming/rerank chain. */
  lazy val qKnnIvfBinarySql: String =
    s"""WITH coded AS (
       |  SELECT vec_id,
       |    CAST(list_sum(list_transform(range(0, 62),
       |      i -> CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS code
       |  FROM embeddings
       |), cents AS (
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
       |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id % 50 = 0
       |), probes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q_id, cell,
       |      row_number() OVER (PARTITION BY q_id ORDER BY list_distance(qv, cv), cell) AS rn
       |    FROM q CROSS JOIN cents) WHERE rn <= ${VectorQueries.NPROBE}
       |), h AS (
       |  SELECT p.q_id, c.vec_id AS nid, bit_count(xor(c.code, qc.code)) AS hd
       |  FROM coded c
       |  JOIN assign a ON a.vec_id = c.vec_id
       |  JOIN probes p ON p.cell = a.cell
       |  JOIN coded qc ON qc.vec_id = p.q_id
       |  WHERE c.vec_id <> p.q_id
       |), cand AS (
       |  SELECT q_id, nid FROM (
       |    SELECT q_id, nid,
       |      row_number() OVER (PARTITION BY q_id ORDER BY hd, nid) AS rn
       |    FROM h
       |  ) WHERE rn <= $BinCand
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

  // --------------------------------------------------------- oracles

  /** Rotated-corpus CTEs: `rot` carries a rotation as ONE flat
    * FLOAT[] literal (the same decimal strings the Scala side binds —
    * both engines see identical floats); `re` rebuilds each rotated
    * vector with the kernel's ordered double reduce. */
  private def rotationCtes(rot: Array[Float]): String = {
    val lit = rot.map(_.toString).mkString("[", ", ", "]")
    s"""rot AS (SELECT $lit::FLOAT[] AS rm),
       |re AS MATERIALIZED (
       |  SELECT vec_id, list_transform(range(0, $Dim), j ->
       |    CAST(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${Dim + 1}),
       |      i -> rm[j * $Dim + i]::DOUBLE * embedding[i]::DOUBLE)),
       |      (acc, x) -> acc + x) AS FLOAT)) AS embedding
       |  FROM embeddings, rot
       |),
       |""".stripMargin
  }

  /** The frozen OPQ rotation's CTEs ([[rotationCtes]] of
    * [[Rotation]]). */
  private def rotatedCtes: String = rotationCtes(Rotation)

  lazy val qOpqEncodeSql: String =
    s"""WITH ${rotatedCtes}${PQ.encodeCtesOn("re")}
       |SELECT vec_id, sub, code, round(dd, 4) AS sub_err
       |FROM enc ORDER BY vec_id, sub""".stripMargin

  lazy val qKnnOpqSql: String = PQ.knnPqSqlOn(rotatedCtes, "re")

  /** `q_bin_serve`: the binary-steered twin of `q_pq_serve` — sign-bit
    * words resident in executor memory (RaBitQ rotation, the same
    * frozen-seed preconditioner as [[qKnnBinaryRot]]) steer the
    * mmap'd traversal of the SAME cached single file the PQ tier
    * serves ([[graft.index.SingleFileIndex.serveBinary]]); exact
    * rerank off the file. Rows-only in the driver gate (the
    * Hamming-steered candidate set is approximate); determinism,
    * exact-rerank parity, recall floors, and the matched-bytes
    * ADC-vs-binary measurement are pinned in SingleFileIndexSpec /
    * HiDimSpec (BASELINE "Binary vs ADC file-tier steering"). */
  def qBinServe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = VectorQueries.queriesDf(s, dir)
    graft.index.SingleFileIndex.serveBinary(
      qs, PQ.cachedServeFile(s, dir), PQ.K, beamWidth = 64)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_opq_encode" -> (qOpqEncode(_, _)),
    "q_knn_opq" -> (qKnnOpq(_, _)),
    "q_knn_opq_trained" -> (qKnnOpqTrained(_, _)),
    "q_knn_binary" -> (qKnnBinary(_, _)),
    "q_knn_binary_rot" -> (qKnnBinaryRot(_, _)),
    "q_knn_ivf_binary" -> (qKnnIvfBinary(_, _)),
    "q_bin_serve" -> (qBinServe(_, _)))
  lazy val oracles: Map[String, String] = Map(
    "q_opq_encode" -> qOpqEncodeSql,
    "q_knn_opq" -> qKnnOpqSql,
    "q_knn_opq_trained" -> qKnnOpqTrainedSql,
    "q_knn_binary" -> qKnnBinarySql,
    "q_knn_binary_rot" -> qKnnBinaryRotSql,
    "q_knn_ivf_binary" -> qKnnIvfBinarySql)
}
