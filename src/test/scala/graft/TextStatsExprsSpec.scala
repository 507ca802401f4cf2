package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.functions.TextStatsExprs

/** Pins the r18 single-pass text-stat expressions to the aggregate
  * forms they replaced (the forms the DuckDB oracles still evaluate):
  * same five repetition counts, same entropy, on the real sf0.001
  * corpus plus adversarial edges (single word, all-same, unicode,
  * repeated bigrams). The rewritten queries q_text_repetition /
  * q_text_entropy keep their oracles unchanged, so the driver's hash
  * gate is the end-to-end proof; this spec is the unit-level pin. */
class TextStatsExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val wordsExpr = "filter(split(text, ' '), w -> w != '')"

  private def repetitionAggregate(docs: DataFrame): DataFrame = {
    // the pre-r18 explode/groupBy form, verbatim
    val grams = docs
      .withColumn("words", expr(wordsExpr))
      .filter(size($"words") >= 1)
      .select($"doc_id", explode(expr(
        """concat(
          |  transform(words, w -> struct(1 AS t, w AS g)),
          |  CASE WHEN size(words) >= 2 THEN
          |    transform(sequence(0, size(words) - 2),
          |      i -> struct(2 AS t, concat(element_at(words, i+1), ' ', element_at(words, i+2)) AS g))
          |  ELSE cast(array() AS array<struct<t: int, g: string>>) END)""".stripMargin))
        .as("gr"))
      .select($"doc_id", $"gr.t", $"gr.g")
    grams.groupBy($"doc_id", $"t", $"g").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(
        sum(when($"t" === 1, $"cnt")).cast("int").as("nw"),
        count(when($"t" === 1, true)).cast("int").as("ndw"),
        max(when($"t" === 1, $"cnt")).cast("int").as("topw"),
        coalesce(sum(when($"t" === 2, $"cnt")), lit(0L)).cast("int").as("nbg"),
        coalesce(max(when($"t" === 2, $"cnt")), lit(0L)).cast("int").as("topbg"))
  }

  private def repetitionNative(docs: DataFrame): DataFrame =
    docs.withColumn("words", expr(wordsExpr))
      .filter(size($"words") >= 1)
      .select($"doc_id",
        TextStatsExprs.repetitionStats($"words").as("st"))
      .select($"doc_id", $"st.n_words".as("nw"), $"st.n_distinct".as("ndw"),
        $"st.top_word".as("topw"), $"st.n_bigrams".as("nbg"),
        $"st.top_bigram".as("topbg"))

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val left = a.orderBy("doc_id").collect().toSeq
    val right = b.orderBy("doc_id").collect().toSeq
    assert(left.size == right.size, s"row counts: ${left.size} vs ${right.size}")
    left.zip(right).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  private val edges = Seq(
    (1L, "one"),
    (2L, "a a a a"),
    (3L, "a b a b a"),
    (4L, "x y z"),
    (5L, "héllo wörld héllo wörld héllo"),
    (6L, "𝄞clef 𝄞clef plain"),
    (7L, "  padded   spaces  "),
    (8L, "same same same different same same"))

  test("repetition stats: native single pass == aggregate form on sf0.001") {
    val docs = Tables.documents(spark, SparkSpecBase.sf001).select($"doc_id", $"text")
    assertSameRows(repetitionAggregate(docs), repetitionNative(docs))
  }

  test("repetition stats: native single pass == aggregate form on edge docs") {
    val docs = edges.toDF("doc_id", "text")
    assertSameRows(repetitionAggregate(docs), repetitionNative(docs))
  }

  private def entropyAggregate(docs: DataFrame): DataFrame = {
    val cnt = docs
      .filter(length($"text") >= 1)
      .select($"doc_id", explode(split($"text", "")).as("c"))
      .groupBy($"doc_id", $"c").agg(count(lit(1)).cast("double").as("n"))
    cnt.groupBy($"doc_id")
      .agg(round(
        log2(sum($"n")) - sum($"n" * log2($"n")) / sum($"n"), 4)
        .as("char_entropy"))
  }

  private def entropyNative(docs: DataFrame): DataFrame =
    docs.filter(length($"text") >= 1)
      .select($"doc_id",
        round(TextStatsExprs.charEntropy($"text"), 4).as("char_entropy"))

  test("char entropy: native single pass == aggregate form on sf0.001") {
    val docs = Tables.documents(spark, SparkSpecBase.sf001).select($"doc_id", $"text")
    assertSameRows(entropyAggregate(docs), entropyNative(docs))
  }

  test("char entropy: native single pass == aggregate form on edge docs") {
    val docs = (edges :+ (9L, "aaaa") :+ (10L, "ab") :+ (11L, "𝄞𝄞a"))
      .toDF("doc_id", "text")
    assertSameRows(entropyAggregate(docs), entropyNative(docs))
  }

  test("punct count: native == size(regexp_extract_all) on sf0.001 + edges") {
    val corpus = spark.read.parquet(s"${SparkSpecBase.sf001}/documents.parquet")
      .select($"doc_id", $"text").filter($"text".isNotNull)
    val edgeDocs = Seq(
      (1001L, ""), (1002L, "abc 123"), (1003L, "a,b.c!?"),
      (1004L, "ALL CAPS AND ÜNICODE"), (1005L, "𝄞𝄞a b𝄞"),
      (1006L, "   "), (1007L, "!@#$%^&*()"))
      .toDF("doc_id", "text")
    Seq(corpus, edgeDocs).foreach { docs =>
      val both = docs.select($"doc_id",
        size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)")).as("re"),
        TextStatsExprs.punctCount($"text").as("nat"))
      val bad = both.filter($"re" =!= $"nat").collect()
      assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
    }
  }

  /** The boilerplate aggregation tail over a per-(doc, gram-key,
    * count) table: whatever 64-bit key the scan emits, the output
    * depends only on the key's EQUALITY classes — so equal outputs
    * here prove the native gram keys (and their in-expression
    * within-doc counts) group exactly like the gram-string chain's. */
  private def boilerAgg(perDocGram: DataFrame): DataFrame = {
    val boilerGrams = perDocGram.groupBy($"gh").agg(count(lit(1)).as("n_docs"))
      .filter($"n_docs" >= 2).select($"gh")
    perDocGram.join(boilerGrams.withColumn("is_boiler", lit(true)), Seq("gh"), "left")
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_grams"),
        sum(when($"is_boiler", $"cnt").otherwise(lit(0L))).as("n_boiler"))
      .select($"doc_id", $"n_grams", $"n_boiler",
        round($"n_boiler".cast("double") / $"n_grams".cast("double"), 4).as("boiler_frac"))
  }

  test("word gram counts: grouping equivalence vs the gram-string chain (sf0.001 + edges)") {
    val corpus = Tables.documents(spark, SparkSpecBase.sf001).select($"doc_id", $"text")
    val edgeDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox sat still"),
      (3L, "short one two"), // < 4 words → no grams on either side
      (4L, ""), (5L, "   "), (6L, "a a a a a a"),
      (7L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (8L, "héllo wörld 𝄞clef again héllo wörld 𝄞clef again"),
      (9L, "  padded   spaces make four words  "),
      (10L, null.asInstanceOf[String])).toDF("doc_id", "text")
    Seq(corpus, edgeDocs).foreach { docs =>
      // the pre-r18 chain, verbatim: gram strings, xxhash64, then the
      // (doc, gram) count aggregate the expression now runs in place
      val ref = docs.withColumn("words", expr(wordsExpr))
        .filter(size($"words") >= 4)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, size(words) - 3), i -> concat_ws(' ', slice(words, i, 4)))"))
          .as("gram"))
        .select($"doc_id", xxhash64($"gram").as("gh"))
        .groupBy($"doc_id", $"gh").agg(count(lit(1)).as("cnt"))
      val nat = docs.select($"doc_id",
        explode(graft.functions.HashExprs.wordGramCounts($"text", 4)).as("g"))
        .select($"doc_id", $"g.gh".as("gh"), $"g.cnt".as("cnt"))
      assertSameRows(boilerAgg(ref), boilerAgg(nat))
      // the expression's counts must also BE counts (multiplicities),
      // not just group consistently: totals per doc match the
      // position count of the reference chain
      val refTot = ref.groupBy($"doc_id").agg(sum($"cnt").as("t"))
      val natTot = nat.groupBy($"doc_id").agg(sum($"cnt").as("t"))
      assertSameRows(refTot, natTot)
    }
  }

  private def tokenStatsLegacy(docs: DataFrame): DataFrame =
    docs.withColumn("words", expr(wordsExpr))
      .select(
        $"doc_id",
        size($"words").as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("n_alpha_tokens"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_num_tokens"),
        size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)")).as("n_punct"),
        expr("aggregate(transform(words, w -> cast(ceil(length(w) / 4.0) as bigint)), 0L, (a, x) -> a + x)")
          .as("n_bpe_est"))

  private def tokenStatsNative(docs: DataFrame): DataFrame =
    docs.select($"doc_id", TextStatsExprs.tokenStats($"text").as("st"))
      .select($"doc_id", $"st.n_ws_tokens".as("n_ws_tokens"),
        $"st.n_alpha_tokens".as("n_alpha_tokens"),
        $"st.n_num_tokens".as("n_num_tokens"),
        $"st.n_punct".as("n_punct"), $"st.n_bpe_est".as("n_bpe_est"))

  test("token stats: native single pass == projection form on sf0.001 + edges") {
    val corpus = Tables.documents(spark, SparkSpecBase.sf001).select($"doc_id", $"text")
    val edgeDocs = Seq(
      (1L, "plain words only here"),
      (2L, "abc123def 45x 6 7890"), // alpha/num runs inside one word
      (3L, ""), (4L, "   "), (5L, "a"),
      (6L, "UPPER Case Is Punct 123"),
      (7L, "héllo wörld 𝄞clef"), // multi-byte + supplementary planes
      (8L, "  padded   spaces  and!punct?runs!!"),
      (9L, "exactly4 len8word0 abcdefghijk")).toDF("doc_id", "text")
    Seq(corpus, edgeDocs).foreach { docs =>
      assertSameRows(tokenStatsLegacy(docs), tokenStatsNative(docs))
    }
  }

  /** The bigram-LL tail over a (doc_id, h1, h12) key stream — output
    * depends only on the keys' equality classes, so equal outputs
    * prove the native bigram keys group like the words-array chain. */
  private def bigramLl(bg: DataFrame): DataFrame = {
    val c12 = bg.groupBy($"h1", $"h12").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy($"h1").agg(sum($"c12").as("c1"))
    bg.join(c12, Seq("h1", "h12")).join(c1, Seq("h1"))
      .withColumn("lp", log($"c12".cast("double") / $"c1".cast("double")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(avg($"lp"), 4).as("avg_logp"))
  }

  test("word bigram hashes: grouping equivalence vs the words-array chain (sf0.001 + edges)") {
    val corpus = Tables.documents(spark, SparkSpecBase.sf001).select($"doc_id", $"text")
    val edgeDocs = Seq(
      (1L, "the cat sat on the cat mat"),
      (2L, "the cat"), (3L, "one"), (4L, ""), (5L, "   "),
      (6L, "a a a a"), (7L, "héllo wörld héllo wörld 𝄞clef"),
      (8L, "  padded   spaces two words  "),
      (9L, null.asInstanceOf[String])).toDF("doc_id", "text")
    Seq(corpus, edgeDocs).foreach { docs =>
      val ref = docs.withColumn("words", expr(wordsExpr))
        .filter(size($"words") >= 2)
        .select($"doc_id", explode(expr(
          """transform(sequence(0, size(words) - 2),
            |  i -> struct(element_at(words, i+1) AS w1, element_at(words, i+2) AS w2))""".stripMargin))
          .as("bg"))
        .select($"doc_id", xxhash64($"bg.w1").as("h1"),
          xxhash64($"bg.w1", $"bg.w2").as("h12"))
      val nat = docs.select($"doc_id",
        explode(graft.functions.HashExprs.wordBigramHashes($"text")).as("bg"))
        .select($"doc_id", $"bg.h1".as("h1"), $"bg.h12".as("h12"))
      assertSameRows(bigramLl(ref), bigramLl(nat))
    }
  }

  // the operator-side stopword lists, spelled locally so the spec
  // still detects a drift in the operator's own lists
  private val specLangs: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "que"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist", "nicht", "mit"))
  private def inList(wordVar: String, ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString(s"$wordVar IN (", ", ", ")")

  test("word/lang stats: native single pass == words-array chain (sf0.001 + edges)") {
    val corpus = Tables.documents(spark, SparkSpecBase.sf001).select($"doc_id", $"text")
    val edgeDocs = Seq(
      (1L, "the cat and the dog in la la land"),
      (2L, "el que la un de"), // words shared across es/fr lists
      (3L, "der die und das"), (4L, "no stopwords here xyz"),
      (5L, "a"), (6L, "héllo wörld 𝄞clef the"),
      (7L, "  the   and  padded  "), (8L, "is it that the of to in and"))
      .toDF("doc_id", "text")
    Seq(corpus, edgeDocs).foreach { docs =>
      val legacy = docs.withColumn("words", expr(wordsExpr))
        .filter(size($"words") >= 1)
        .select(Seq($"doc_id",
          size($"words").as("n_words"),
          expr("aggregate(transform(words, w -> cast(length(w) as bigint)), 0L, (a, x) -> a + x)")
            .as("sum_word_len")) ++
          specLangs.map { case (l, ws) =>
            expr(s"size(filter(words, w -> ${inList("w", ws)}))").as(s"hits_$l")
          }: _*)
      val nat = docs.select($"doc_id",
        TextStatsExprs.wordLangStats($"text", specLangs.map(_._2)).as("wst"))
        .filter($"wst.n_words" >= 1)
        .select(Seq($"doc_id", $"wst.n_words".as("n_words"),
          $"wst.sum_word_len".as("sum_word_len")) ++
          specLangs.zipWithIndex.map { case ((l, _), i) =>
            element_at($"wst.hits", i + 1).as(s"hits_$l")
          }: _*)
      assertSameRows(legacy, nat)
    }
  }

  test("null text: tokenStats/wordLangStats return NULL; the corpus guarantees non-null text") {
    // documented divergence (r18 advice item): the legacy
    // size(regexp_extract_all(...)) projections returned -1 counts
    // (and pred_lang 'und') for null text under
    // spark.sql.legacy.sizeOfNull, while the native expressions
    // propagate NULL. No declared query observes the difference
    // because the documents corpus never carries a null text — both
    // facts are pinned here so a corpus change that breaks the
    // guarantee fails loudly instead of silently shifting semantics.
    val nullDoc = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = nullDoc.select(
      TextStatsExprs.tokenStats($"text").as("st"),
      TextStatsExprs.wordLangStats($"text", specLangs.map(_._2)).as("wst")).head()
    assert(r.isNullAt(0), "tokenStats(null) must be NULL")
    assert(r.isNullAt(1), "wordLangStats(null) must be NULL")
    Seq(SparkSpecBase.sf001, SparkSpecBase.sf01).foreach { sf =>
      assert(Tables.documents(spark, sf).filter($"text".isNull).count() == 0,
        s"corpus at $sf carries null text — the non-null guarantee broke")
    }
  }

  test("rewritten queries keep exactly one exchange before the presentation sort") {
    // plan-shape pin for the r18 rewrite: scan → project → sort; the
    // only Exchange left is the orderBy's range partitioning
    Seq(
      operators.TextAnalysis.qTextRepetition(spark, SparkSpecBase.sf001),
      operators.TextAnalysis.qTextEntropy(spark, SparkSpecBase.sf001)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
      assert(!plan.contains("Generate"), s"explode survived the rewrite:\n$plan")
    }
  }
}
