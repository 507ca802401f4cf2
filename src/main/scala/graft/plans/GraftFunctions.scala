package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions._

/** SQL registration of every graft Catalyst expression, so the whole
  * function surface is callable from `spark.sql(...)` / `expr(...)`
  * by name — the same way the reference exposes its distance kernels
  * as plain library calls (anndists strategy objects, reference
  * lib.rs:7-8). Two entry paths:
  *
  *  - static: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (or `builder.withExtensions(new GraftExtensions)`) injects the
  *    functions at session build, alongside the kNN planner strategy;
  *  - runtime: [[registerAll]] adds them to an already-running
  *    session's `FunctionRegistry` (idempotent — safe to call from
  *    every query that needs the SQL names).
  *
  * Parameterized expressions (`ksub`, `planes`, `n`) take their
  * parameter as an integer LITERAL argument — the value shapes the
  * generated code, so it cannot be a runtime column.
  *
  * [[graft.functions.NearestCell]] is deliberately absent: its
  * centroid table is a runtime Scala array (broadcast from a KMeans
  * fit), not literal-expressible SQL — the Column API
  * (`VectorExprs.nearestCell`) is its only entry point.
  */
object GraftFunctions {

  private def intLit(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) =>
      // a bigint literal like 2^32+k must not silently truncate to k
      require(v.isValidInt, s"$fn: $arg literal $v is out of Int range")
      v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal (it parameterizes codegen), got $other")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Seq[Expression] = {
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")
    args
  }

  private def binary(name: String, usage: String,
      f: (Expression, Expression) => Expression): (String, String, Seq[Expression] => Expression) =
    (name, usage, args => { val a = arity(name, 2, args); f(a(0), a(1)) })

  private def unary(name: String, usage: String,
      f: Expression => Expression): (String, String, Seq[Expression] => Expression) =
    (name, usage, args => f(arity(name, 1, args).head))

  /** (sql name, usage doc, builder) for every SQL-expressible graft
    * expression. Names equal each expression's `prettyName`, so
    * `.explain` output and the SQL surface agree. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    binary("graft_l2_distance",
      "(a, b) - Euclidean distance between two array<float> vectors", L2Distance),
    binary("graft_l1_distance",
      "(a, b) - Manhattan distance between two array<float> vectors", L1Distance),
    binary("graft_linf_distance",
      "(a, b) - Chebyshev (max-coordinate) distance between two array<float> vectors",
      LinfDistance),
    binary("graft_cosine_distance",
      "(a, b) - cosine distance (1 - cosine similarity) between two array<float> vectors",
      CosineDistance),
    binary("graft_dot_product",
      "(a, b) - dot product of two array<float> vectors", DotProduct),
    binary("graft_jaccard_distance",
      "(a, b) - generalized (weighted) Jaccard distance over non-negative array<float> weights",
      JaccardDistance),
    binary("graft_hellinger_distance",
      "(a, b) - Hellinger distance between two array<float> discrete distributions",
      HellingerDistance),
    binary("graft_js_distance",
      "(a, b) - Jensen-Shannon distance between two array<float> discrete distributions",
      JensenShannonDistance),
    binary("graft_int_sql2_distance",
      "(a, b) - exact integer squared-L2 distance between two array<int> (u8 code) vectors, as double",
      IntSqL2Distance),
    binary("graft_sorted_intersect_count",
      "(a, b) - intersection size of two SORTED array<string> sets via a linear merge",
      SortedIntersectCount),
    ("graft_pq_adc_distance",
      "(lut, codes, ksub) - asymmetric PQ distance: sum lut[m*ksub + codes[m]]; ksub is an int literal",
      args => { val a = arity("graft_pq_adc_distance", 3, args)
        PqAdcDistance(a(0), a(1), intLit("graft_pq_adc_distance", "ksub", a(2))) }),
    ("graft_lsh_bucket",
      "(v, planes) - random-hyperplane LSH bucket of an array<float> vector; planes is an int literal",
      args => { val a = arity("graft_lsh_bucket", 2, args)
        LshBucket(a(0), intLit("graft_lsh_bucket", "planes", a(1))) }),
    unary("graft_u8_to_floats",
      "(codes) - widen a binary of unsigned bytes to array<float> (lossless; 0..255 exact)",
      U8CodesToFloats),
    unary("graft_roll_hash",
      "(s) - deterministic polynomial rolling hash of a string (mod 1e9+7)", RollingHash),
    unary("graft_simhash62",
      "(hashes) - 62-bit SimHash code over an array<bigint> of token hashes", SimHash62),
    unary("graft_token_hashes",
      "(s) - per-token rolling hashes of a space-tokenized string, as array<bigint>", TokenHashes),
    ("graft_word_shingle_hashes",
      "(s, n) - hashes of the n-word shingles of a string; n is an int literal",
      args => { val a = arity("graft_word_shingle_hashes", 2, args)
        WordShingleHashes(a(0), intLit("graft_word_shingle_hashes", "n", a(1))) }),
    ("graft_char_ngrams_sorted",
      "(s, n) - the distinct char n-grams of a string, sorted (UTF-8 order); n is an int literal",
      args => { val a = arity("graft_char_ngrams_sorted", 2, args)
        CharNGramsSorted(a(0), intLit("graft_char_ngrams_sorted", "n", a(1))) }))

  private def strLit(fn: String, arg: String, e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  /** The kNN TABLE function — the whole-operator analog of the scalar
    * registry above, so `spark.sql` users can run the custom top-k
    * join by name (the reference exposes search as a first-class call,
    * lib.rs:635-696):
    *
    * {{{
    *   SELECT * FROM graft_knn('corpus_view', 'query_view', 10, 'cosine')
    * }}}
    *
    * Arguments are literals: two table/view names (corpus must expose
    * (vec_id, embedding: array<float>), queries (q_id, qv)), k, and
    * the metric name. The builder resolves the names through the
    * active session's catalog and returns the ANALYZED
    * [[KnnJoinPlan]]-based plan — broadcast query batch, per-partition
    * bounded heaps, global TopK merge; plan shape (no cartesian)
    * pinned in SqlSurfaceSpec. Output: (q_id, rank, neighbor_id,
    * dist). */
  val tableBuilders: Seq[(String, String, Seq[Expression]
      => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    ("graft_knn",
      "(corpus_table, query_table, k, metric[, exclude_self]) - top-k nearest corpus rows " +
        "per query row; corpus is (vec_id, embedding: array<float>), queries (q_id, qv); " +
        "all args literals",
      args => {
        require(args.length == 4 || args.length == 5,
          s"graft_knn expects 4 or 5 arguments, got ${args.length}")
        val excludeSelf = args.length == 5 && (args(4) match {
          case Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_knn: exclude_self must be a boolean literal, got $other")
        })
        val spark = SparkSession.active
        val corpus = spark.table(strLit("graft_knn", "corpus_table", args(0)))
        val queries = spark.table(strLit("graft_knn", "query_table", args(1)))
        KnnJoin(corpus, queries, intLit("graft_knn", "k", args(2)),
          strLit("graft_knn", "metric", args(3)), excludeSelf).queryExecution.analyzed
      }))

  private def info(name: String, usage: String): ExpressionInfo =
    // the 11-arg constructor is the only non-deprecated one carrying
    // usage text; "" group/since etc. take the built-in defaults
    new ExpressionInfo(getClass.getCanonicalName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Static injection path — called by [[GraftExtensions]]. */
  def inject(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, usage, b) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), b))
    }
    tableBuilders.foreach { case (name, usage, b) =>
      e.injectTableFunction((FunctionIdentifier(name), info(name, usage), b))
    }
  }

  /** Runtime path for sessions graft didn't build (mirrors
    * `KnnJoin.ensureRegistered`). Idempotent: already-registered names
    * are left alone, so repeated calls (one per q_sql_* invocation)
    * don't churn the registry. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, usage, b) =>
      val ident = FunctionIdentifier(name)
      if (!reg.functionExists(ident))
        reg.registerFunction(ident, info(name, usage), b)
    }
    val treg = spark.sessionState.tableFunctionRegistry
    tableBuilders.foreach { case (name, usage, b) =>
      val ident = FunctionIdentifier(name)
      if (!treg.functionExists(ident))
        treg.registerFunction(ident, info(name, usage), b)
    }
  }
}
