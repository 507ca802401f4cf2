package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs._

class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
    (2L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
    (3L, Array(1f, 1f, 1f), Array(1f, 1f, 1f))
  ).toDF("id", "a", "b")

  test("l2 distance") {
    val r = df.select($"id", l2Dist($"a", $"b").as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(r(1L) - math.sqrt(2.0)) < 1e-12)
    assert(math.abs(r(2L) - math.sqrt(27.0)) < 1e-12)
    assert(r(3L) == 0.0)
  }

  test("cosine distance") {
    val r = df.select($"id", cosineDist($"a", $"b").as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(r(1L) - 1.0) < 1e-12) // orthogonal
    assert(math.abs(r(3L)) < 1e-12) // identical direction
  }

  test("l1 and linf distances") {
    val l1 = df.select($"id", l1Dist($"a", $"b").as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(l1(1L) == 2.0 && l1(2L) == 9.0 && l1(3L) == 0.0)
    val li = df.select($"id", linfDist($"a", $"b").as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(li(1L) == 1.0 && li(2L) == 3.0 && li(3L) == 0.0)
    // interpreted (nullSafeEval) == codegen on real embeddings
    val emb = Tables.embeddings(spark, SparkSpecBase.sf001).limit(50)
      .select($"embedding".as("a"), reverse($"embedding").as("b"))
    val viaHof = emb.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> abs(cast(x as double) - cast(y as double))), 0D, (acc, v) -> acc + v) AS l1",
      "array_max(zip_with(a, b, (x, y) -> abs(cast(x as double) - cast(y as double)))) AS li")
      .as[(Double, Double)].collect()
    val native = emb.select(l1Dist($"a", $"b"), linfDist($"a", $"b"))
      .as[(Double, Double)].collect()
    viaHof.zip(native).foreach { case ((h1, hi), (n1, ni)) =>
      assert(math.abs(h1 - n1) < 1e-9 && hi == ni)
    }
  }

  test("dot product") {
    val r = df.select($"id", dotProduct($"a", $"b").as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r(1L) == 0.0 && r(2L) == 32.0 && r(3L) == 3.0)
  }

  test("jaccard and hellinger distances: hand values, kernel parity, zero vectors") {
    // generalized Jaccard: 1 − Σmin/Σmax over non-negative weights
    val j = df.select($"id", jaccardDist($"a", $"b").as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(j(1L) == 1.0)                        // disjoint support
    assert(math.abs(j(2L) - (1.0 - 6.0 / 15.0)) < 1e-12)
    assert(j(3L) == 0.0)                        // identical
    // Hellinger over self-normalized |x|: identical DISTRIBUTIONS
    // (row 3, and row 2's (1,2,3) vs (4,5,6) are NOT proportional)
    val h = df.select($"id", hellingerDist($"a", $"b").as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h(1L) == 1.0)                        // disjoint support
    assert(h(3L) == 0.0)                        // same distribution
    val bc2 = math.sqrt((1.0 / 6) * (4.0 / 15)) +
      math.sqrt((2.0 / 6) * (5.0 / 15)) + math.sqrt((3.0 / 6) * (6.0 / 15))
    assert(math.abs(h(2L) - math.sqrt(1.0 - bc2)) < 1e-12)
    // proportional vectors are the same distribution → distance 0
    val prop = Seq((Array(1f, 2f, 1f), Array(2f, 4f, 2f))).toDF("a", "b")
    assert(prop.select(hellingerDist($"a", $"b")).as[Double].head() < 1e-7)
    // zero vectors: both-zero → 0; one-zero → jaccard 1 (disjoint),
    // hellinger 1 (no distribution vs a distribution) — never NaN
    val z = Seq(
      (1L, Array(0f, 0f), Array(0f, 0f)),
      (2L, Array(0f, 0f), Array(1f, 2f))).toDF("id", "a", "b")
    val zj = z.select($"id", jaccardDist($"a", $"b")).as[(Long, Double)].collect().toMap
    val zh = z.select($"id", hellingerDist($"a", $"b")).as[(Long, Double)].collect().toMap
    assert(zj(1L) == 0.0 && zj(2L) == 1.0)
    assert(zh(1L) == 0.0 && zh(2L) == 1.0)
    // graph-kernel Metric members mirror the expressions exactly
    import graft.index.Metric
    for ((_, a, b) <- Seq((1L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
        (2L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)))) {
      assert(Metric.Jaccard.eval(a, 0, b, 0, 3) ==
        Seq((a, b)).toDF("a", "b").select(jaccardDist($"a", $"b")).as[Double].head())
      assert(Metric.Hellinger.eval(a, 0, b, 0, 3) ==
        Seq((a, b)).toDF("a", "b").select(hellingerDist($"a", $"b")).as[Double].head())
    }
    assert(Metric.byName("jaccard") eq Metric.Jaccard)
    assert(Metric.byName("hellinger") eq Metric.Hellinger)
  }

  test("jensen-shannon distance: hand values, kernel parity, zero vectors") {
    // disjoint supports reach the metric's maximum √(ln 2); identical
    // distributions (incl. proportional raw vectors) are 0
    val df = Seq(
      (1L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (2L, Array(1f, 1f, 0f), Array(1f, 3f, 0f)),
      (3L, Array(1f, 2f, 1f), Array(2f, 4f, 2f))).toDF("id", "a", "b")
    val j = df.select($"id", jsDist($"a", $"b").as("d")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(j(1L) - math.sqrt(math.log(2.0))) < 1e-12)
    assert(j(3L) < 1e-7)
    // hand value: p=(.5,.5), q=(.25,.75), m=(.375,.625)
    val hand = math.sqrt(0.5 * (
      0.5 * math.log(0.5 / 0.375) + 0.25 * math.log(0.25 / 0.375) +
        0.5 * math.log(0.5 / 0.625) + 0.75 * math.log(0.75 / 0.625)))
    assert(math.abs(j(2L) - hand) < 1e-12, s"${j(2L)} vs $hand")
    // zero vectors: both-zero → 0; one-zero → √(ln 2) — never NaN
    val z = Seq(
      (1L, Array(0f, 0f), Array(0f, 0f)),
      (2L, Array(0f, 0f), Array(1f, 2f))).toDF("id", "a", "b")
    val zj = z.select($"id", jsDist($"a", $"b")).as[(Long, Double)].collect().toMap
    assert(zj(1L) == 0.0 && zj(2L) == math.sqrt(math.log(2.0)))
    // graph-kernel Metric member mirrors the expression exactly
    import graft.index.Metric
    for ((_, a, b) <- Seq((1L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
        (2L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)))) {
      assert(Metric.JensenShannon.eval(a, 0, b, 0, 3) ==
        Seq((a, b)).toDF("a", "b").select(jsDist($"a", $"b")).as[Double].head())
    }
    assert(Metric.byName("js") eq Metric.JensenShannon)
  }

  test("interpreted eval matches codegen") {
    // force interpreted path via filter on the expression vs projected value
    val proj = df.select(l2Dist($"a", $"b").as("d")).as[Double].collect().sorted
    val expected = Array(0.0, math.sqrt(2.0), math.sqrt(27.0))
    proj.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("integer squared-L2: native == interpreted HOF, long accumulation") {
    val idf = Seq(
      (1L, Array(1, 2, 3), Array(4, 6, 3)),
      (2L, Array(255, 0, 128), Array(0, 255, 128)),
      (3L, Array(7, 7, 7), Array(7, 7, 7))
    ).toDF("id", "a", "b")
    val r = idf.select($"id", intSqL2Dist($"a", $"b").as("d"),
        expr("CAST(aggregate(zip_with(a, b, (x, y) -> CAST((x - y) * (x - y) AS BIGINT)), " +
          "0L, (acc, e) -> acc + e) AS DOUBLE)").as("hof"))
      .collect()
    r.foreach(row => assert(row.getDouble(1) == row.getDouble(2),
      s"id ${row.getLong(0)}: native ${row.getDouble(1)} vs hof ${row.getDouble(2)}"))
    val m = r.map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(m(1L) == 25.0 && m(2L) == 2 * 255.0 * 255.0 && m(3L) == 0.0)
  }

  test("SQL registration works") {
    // a FRESH session: register() installs TEMP functions that would
    // shadow the injected GraftFunctions registry (and its stricter
    // literal checks) for every later suite sharing the session
    val fresh = spark.newSession()
    register(fresh)
    // temp views belong to a session's own catalog — create the probe
    // data in the fresh one
    import fresh.implicits._
    Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b")
      .createOrReplaceTempView("vex")
    val n = fresh.sql("SELECT graft_cosine_distance(a, b) AS d FROM vex").count()
    assert(n == 1)
    // l1/linf were the only expressions missing from the registry
    assert(fresh.sql("SELECT graft_l1_distance(a, b) FROM vex").count() == 1)
    assert(fresh.sql("SELECT graft_linf_distance(a, b) FROM vex").count() == 1)
    // the legacy literal rule matches the injected registry's: a
    // bigint out of Int range fails loudly, never truncates
    val e = intercept[Exception] {
      fresh.sql("SELECT graft_lsh_bucket(array(1.0F), 4294967296)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("out of Int range")), e.toString)
  }

  test("NearestCell rejects a vector whose dim differs from the centroids'") {
    import spark.implicits._
    val cents = Array((0, Array(0f, 0f)), (1, Array(1f, 1f)))
    val bad = Seq(Tuple1(Array(0.5f, 0.5f, 0.5f))).toDF("v")
    val e = intercept[Exception] {
      bad.select(graft.functions.VectorExprs.nearestCell($"v", cents)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("centroid dim") ||
      Option(e.getCause).exists(_.getMessage.contains("centroid dim")),
      s"unexpected: $e")
  }

  test("native LshBucket == interpreted SQL HOF fragment on real embeddings") {
    import org.apache.spark.sql.functions.expr
    val emb = Tables.embeddings(spark, SparkSpecBase.sf001)
    Seq(6, 16).foreach { planes =>
      val cmp = emb.select(
        lshBucket($"embedding", planes).as("native"),
        expr(operators.VectorQueries.sparkLshBucketN(planes)).as("sql")).collect()
      cmp.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"planes=$planes: ${r.getLong(0)} vs ${r.getLong(1)}"))
    }
  }

  test("every graft expression codegen-compiles in a bare UnsafeProjection") {
    // Outside whole-stage codegen, GenerateUnsafeProjection's apply
    // method takes its input row as a PARAMETER NAMED `i`
    // (CodegenContext.INPUT_ROW) — a template declaring `int i` shadows
    // it, Janino rejects the class, and Spark silently drops the whole
    // projection (every expression in it!) to interpreted mode. r9
    // caught exactly that in Verify's logs. Generating directly (no
    // interpreted fallback layer) makes the failure loud.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types._
    val fa = BoundReference(0, ArrayType(FloatType), nullable = true)
    val fb = BoundReference(1, ArrayType(FloatType), nullable = true)
    val ia = BoundReference(0, ArrayType(IntegerType), nullable = true)
    val da = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val sa = BoundReference(0, ArrayType(StringType), nullable = true)
    val sb = BoundReference(1, ArrayType(StringType), nullable = true)
    val exprs = Seq(
      graft.functions.L2Distance(fa, fb),
      graft.functions.L1Distance(fa, fb),
      graft.functions.LinfDistance(fa, fb),
      graft.functions.CosineDistance(fa, fb),
      graft.functions.DotProduct(fa, fb),
      graft.functions.JaccardDistance(fa, fb),
      graft.functions.HellingerDistance(fa, fb),
      graft.functions.JensenShannonDistance(fa, fb),
      graft.functions.IntSqL2Distance(ia, BoundReference(1, ArrayType(IntegerType), nullable = true)),
      graft.functions.PqAdcDistance(da, BoundReference(1, ArrayType(IntegerType), nullable = true), 4),
      graft.functions.NearestCell(fa, Array(0, 1), Array(Array(0f, 0f), Array(1f, 1f))),
      graft.functions.LshBucket(fa, 8),
      graft.functions.SortedIntersectCount(sa, sb))
    exprs.foreach { e =>
      // throws CompileException on any name collision / codegen bug
      GenerateUnsafeProjection.generate(Seq(e))
    }
  }
}
