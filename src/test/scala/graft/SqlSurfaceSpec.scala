package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashExprs, SetExprs, VectorExprs}

/** The SQL function surface (graft.plans.GraftFunctions): every graft
  * Catalyst expression callable by name from `spark.sql`, via BOTH
  * registration paths — static `spark.sql.extensions` injection
  * (SparkSpecBase builds its session with GraftExtensions) and the
  * runtime `registerAll` fallback — and result-identical to the
  * Column API entry points. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark

  test("static injection: a FRESH session resolves every graft function without registerAll") {
    // newSession() rebuilds SessionState from the session's injected
    // extensions — runtime registerFunction calls from other suites
    // don't leak into it, so resolution here proves the static path
    val fresh = spark.newSession()
    graft.plans.GraftFunctions.builders.foreach { case (name, _, _) =>
      assert(fresh.catalog.functionExists(name), s"$name not injected via extensions")
    }
    // and it is usable end to end, not just listed
    val row = fresh.sql(
      "SELECT graft_l2_distance(array(0.0F, 3.0F), array(4.0F, 3.0F)) AS d").head()
    assert(row.getDouble(0) === 4.0)
  }

  test("registerAll is idempotent and registers on a session graft didn't build") {
    val fresh = spark.newSession()
    graft.plans.GraftFunctions.registerAll(fresh)
    graft.plans.GraftFunctions.registerAll(fresh) // second call: no-op, no throw
    assert(fresh.sql("SELECT graft_roll_hash('ab') AS h").head().getLong(0) ===
      (('a'.toInt * 31L + 'b'.toInt) % 1000000007L))
  }

  test("SQL names compute the same values as the Column API") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f, -3.0f, 0.5f), Array(0.5f, -1.0f, 2.0f, 4.0f), "the quick brown fox", "the quick brown dog"),
      (2L, Array(0.0f, 0.0f, 1.0f, -1.0f), Array(1.0f, 1.0f, 1.0f, 1.0f), "pack my box", "pack my box")
    ).toDF("id", "va", "vb", "ta", "tb").cache()
    df.createOrReplaceTempView("sql_surface_probe")

    val viaSql = spark.sql("""
      SELECT id,
        graft_l2_distance(va, vb) AS l2,
        graft_l1_distance(va, vb) AS l1,
        graft_linf_distance(va, vb) AS linf,
        graft_cosine_distance(va, vb) AS cos,
        graft_dot_product(va, vb) AS dot,
        graft_hellinger_distance(va, vb) AS hel,
        graft_lsh_bucket(va, 8) AS bucket,
        graft_roll_hash(ta) AS fp,
        graft_token_hashes(ta) AS th,
        graft_simhash62(graft_token_hashes(ta)) AS code,
        graft_word_shingle_hashes(ta, 2) AS sh,
        graft_sorted_intersect_count(
          graft_char_ngrams_sorted(ta, 3), graft_char_ngrams_sorted(tb, 3)) AS shared
      FROM sql_surface_probe ORDER BY id""").collect()

    val viaCol = df.select($"id",
        VectorExprs.l2Dist($"va", $"vb").as("l2"),
        VectorExprs.l1Dist($"va", $"vb").as("l1"),
        VectorExprs.linfDist($"va", $"vb").as("linf"),
        VectorExprs.cosineDist($"va", $"vb").as("cos"),
        VectorExprs.dotProduct($"va", $"vb").as("dot"),
        VectorExprs.hellingerDist($"va", $"vb").as("hel"),
        VectorExprs.lshBucket($"va", 8).as("bucket"),
        HashExprs.rollHash($"ta").as("fp"),
        HashExprs.tokenHashes($"ta").as("th"),
        HashExprs.simHash62(HashExprs.tokenHashes($"ta")).as("code"),
        HashExprs.wordShingleHashes($"ta", 2).as("sh"),
        SetExprs.sortedIntersectCount(
          HashExprs.charNGramsSorted($"ta", 3), HashExprs.charNGramsSorted($"tb", 3)).as("shared"))
      .orderBy($"id").collect()

    assert(viaSql.toSeq === viaCol.toSeq)
    df.unpersist()
  }

  test("graft_knn table function: SQL text runs the custom kNN operator, plan-shape pinned") {
    import spark.implicits._
    val fresh = spark.newSession()
    // corpus: 4 unit-ish vectors on a line; queries: 2 of them
    Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f)), (3L, Array(10.0f, 0.0f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("knn_corpus_probe")
    Seq((0L, Array(0.0f, 0.0f)), (3L, Array(10.0f, 0.0f)))
      .toDF("q_id", "qv").createOrReplaceTempView("knn_query_probe")
    // static injection: the fresh session resolves the TABLE function
    // without registerAll — but the temp views live in the ORIGINAL
    // session's catalog, so run the query there after registerAll
    assert(fresh.catalog.functionExists("graft_knn"),
      "graft_knn not injected via extensions")
    graft.plans.GraftFunctions.registerAll(spark)
    val df = spark.sql(
      "SELECT * FROM graft_knn('knn_corpus_probe', 'knn_query_probe', 2, 'l2', true)")
    val rows = df.orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      (0L, 1, 1L, 1.0), (0L, 2, 2L, 2.0),
      (3L, 1, 2L, 8.0), (3L, 2, 1L, 9.0)))
    // plan shape: the custom exec + bounded TopK aggregate, NO
    // cartesian/BNLJ — the property that makes the operator viable
    // physical nodes print without their Exec suffix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("KnnJoin"), plan.take(800))
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(800))
    // literal checks fail loudly, same contract as the scalar registry
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_knn('knn_corpus_probe', 'knn_query_probe', 2, 'nosuch')")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("nosuch") || m.contains("metric")), e.toString)
  }

  test("int-typed kernels: graft_int_sql2_distance and graft_pq_adc_distance from SQL") {
    val sq = spark.sql(
      "SELECT graft_int_sql2_distance(array(1, 2, 3), array(4, 0, 3)) AS d").head().getDouble(0)
    assert(sq === 9.0 + 4.0) // (1-4)^2 + (2-0)^2 + 0
    // u8 widen: unsigned semantics — byte 0xFF is 255.0f, not -1.0f
    val widened = spark.sql(
      "SELECT graft_u8_to_floats(unhex('00FF7F80')) AS v").head()
      .getSeq[Float](0)
    assert(widened === Seq(0.0f, 255.0f, 127.0f, 128.0f))
    // lut laid out [m][ksub]: m=0 row (0,1), m=1 row (10,20); codes (1,0)
    val adc = spark.sql(
      "SELECT graft_pq_adc_distance(array(0.0D, 1.0D, 10.0D, 20.0D), array(1, 0), 2) AS d")
      .head().getDouble(0)
    assert(adc === 1.0 + 10.0)
  }

  test("codegen parameters are range-checked: oversized planes and bigint truncation fail loudly") {
    def failsWith(sql: String, needle: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains(needle)), s"for [$sql] got: $e")
    }
    // planes > 64 would silently alias onto low bits without the guard
    failsWith("SELECT graft_lsh_bucket(array(1.0F), 80)", "planes must be in [1, 64]")
    // 2^32 parses as a bigint literal; truncation would yield planes=0
    failsWith("SELECT graft_lsh_bucket(array(1.0F), 4294967296)", "out of Int range")
  }

  test("codegen parameters must be literals — a column argument fails loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_lsh_bucket(array(1.0F), CAST(id AS INT)) FROM range(1)").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => String.valueOf(c.getMessage).contains("integer literal")),
      s"unexpected failure: $e")
  }
}
