package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{HashExprs, SharedHash}

/** Pins the native hash expressions to the SQL fragments they replace
  * (which are in turn what the DuckDB oracle evaluates). */
class HashExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("native RollingHash == SQL aggregate fragment") {
    val df = Seq("hello world", "a", "", "spark graft", "zzz 123 !?")
      .toDF("s").filter(length($"s") >= 1)
    val both = df.select(
      HashExprs.rollHash($"s").as("native"),
      expr(SharedHash.sparkRoll("s")).as("sql")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("native tokenize/shingle/ngram extractors == SQL forms on real documents") {
    val docs = Tables.documents(spark, SparkSpecBase.sf001)
    val cmp = docs.select(
      HashExprs.tokenHashes($"text").as("th_native"),
      expr(s"transform(filter(split(text, ' '), w -> w != ''), w -> ${SharedHash.sparkRoll("w")})").as("th_sql"),
      sort_array(HashExprs.wordShingleHashes($"text", 3)).as("sh_native"),
      // testdata docs all have ≥3 words, so the unguarded sequence is safe
      expr(
        s"""sort_array(array_distinct(transform(
           |  transform(sequence(0, size(filter(split(text, ' '), w -> w != '')) - 3),
           |    i -> concat_ws(' ', slice(filter(split(text, ' '), w -> w != ''), i + 1, 3))),
           |  s -> ${SharedHash.sparkRoll("s")})))""".stripMargin).as("sh_sql"),
      HashExprs.charNGramsSorted($"text", 3).as("g3_native"),
      expr("array_sort(array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))))").as("g3_sql")
    ).collect()
    cmp.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "token hashes differ")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), "shingle hashes differ")
      assert(r.getSeq[String](4) == r.getSeq[String](5), "ngrams differ")
    }
  }

  test("ngram collation is code-point order even for surrogate-range text") {
    // U+1F600 (surrogate pair in UTF-16) must sort ABOVE U+E000-U+FFFF
    // in code-point order; JVM String order would invert them. The
    // producer (CharNGramsSorted), Spark's array_sort, and the merge
    // consumers (SortedIntersectCount, SharedHash.codePointCompare)
    // must all agree on one collation.
    val tricky = "ab😀c" // a, U+E000, b, U+1F600, c
    val native = Seq(tricky).toDF("text")
      .select(HashExprs.charNGramsSorted($"text", 2).as("native"))
      .collect()(0).getSeq[String](0)
    // self-intersection through the binary merge sees every element —
    // fails if the array order disagrees with UTF8String.compareTo
    val selfCount = Seq(tricky).toDF("text")
      .select(graft.functions.SetExprs.sortedIntersectCount(
        HashExprs.charNGramsSorted($"text", 2),
        HashExprs.charNGramsSorted($"text", 2)).as("c"))
      .collect()(0).getInt(0)
    assert(selfCount == native.size)
    // kernel comparator sees the produced array as strictly ascending
    native.sliding(2).foreach {
      case Seq(x, y) => assert(functions.SharedHash.codePointCompare(x, y) < 0, s"$x !< $y")
      case _ =>
    }
  }

  test("ngrams step by code point, not UTF-16 unit (no split surrogates)") {
    // "ab😀cd" = 5 code points but 6 UTF-16 units; unit-stepping would
    // emit 4 grams including two lone-surrogate strings — the oracle's
    // character-based substring yields exactly these 3
    val grams = Seq("ab😀cd").toDF("text")
      .select(HashExprs.charNGramsSorted($"text", 3).as("g"))
      .collect()(0).getSeq[String](0)
    assert(grams == Seq("ab😀", "b😀c", "😀cd"), grams.toString)
  }

  test("packed ngrams are order-isomorphic and injective vs the string form") {
    // the packed form must be the string form under the 21-bit
    // code-point packing, ELEMENTWISE — same distinct count
    // (injectivity on real grams) and same rank order (so the long
    // merge visits exactly the pairs the codePointCompare merge
    // would). Surrogate text included: packing sorts U+1F600 above
    // U+E000 like UTF8-binary order does, unlike JVM String order.
    def pack(g: String): Long = {
      var acc = 0L; var i = 0
      while (i < g.length) {
        val cp = g.codePointAt(i); acc = (acc << 21) | cp.toLong
        i += Character.charCount(cp)
      }
      acc
    }
    val texts = Seq("the quick brown fox", "abb😀c😀x", "aaa", "ab",
      "", "ααβγ mixed ascii", "😀😀😀😀")
    for (n <- 1 to 3) {
      val rows = texts.toDF("text").select(
        HashExprs.charNGramsSorted($"text", n).as("s"),
        HashExprs.charNGramsPacked($"text", n).as("p")).collect()
      rows.zip(texts).foreach { case (r, t) =>
        val s = r.getSeq[String](0); val p = r.getSeq[Long](1)
        assert(p.size == s.size, s"distinct count diverged on '$t' n=$n")
        assert(p == s.map(pack), s"order/values diverged on '$t' n=$n")
        assert(p == p.sorted, s"packed array not ascending on '$t' n=$n")
      }
    }
  }

  test("native SimHash62 == SQL fragment on token hashes") {
    val df = Seq("the quick brown fox", "spark spark spark streams", "one")
      .toDF("text")
      .withColumn("words", split($"text", " "))
      .withColumn("th", transform($"words", w => HashExprs.rollHash(w)))
    val both = df.select(
      HashExprs.simHash62($"th").as("native"),
      expr(SharedHash.sparkSimhash("th")).as("sql")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("native SimHash62 == SQL fragment when the hash array holds nulls") {
    // IF((shiftright(NULL, b) & 1) = 1, 1, -1) takes the else branch
    // in both engines (a null hash votes -1 per bit); the native
    // kernel must agree, not return NULL
    val df = Seq(1).toDF("one")
      .withColumn("th", expr("array(123456789012L, CAST(NULL AS BIGINT), 9876543210L)"))
    val r = df.select(
      HashExprs.simHash62($"th").as("native"),
      expr(SharedHash.sparkSimhash("th")).as("sql")).head()
    assert(!r.isNullAt(0), "native returned NULL for a null-bearing array")
    assert(r.getLong(0) == r.getLong(1), r.toString)
  }

  test("substring window keys hash the STORED bytes — parity with the SQL spelling on malformed UTF-8") {
    // the native walk hashes raw UTF8String byte slices (r19); the SQL
    // spelling md5(substring(text, i, W)) slices the same stored bytes,
    // so the two must agree even when the bytes are NOT well-formed
    // UTF-8 (a String round-trip would replace the bad byte and
    // diverge). Construct invalid bytes via binary→string cast, which
    // wraps without validation.
    val w = 3
    val bad: Array[Array[Byte]] = Array(
      "abcdef".getBytes("UTF-8"),
      Array('a'.toByte, 0xC3.toByte, 0x28.toByte, 'b'.toByte, 'c'.toByte), // truncated 2-byte seq
      Array(0xE2.toByte, 0x82.toByte, 'x'.toByte, 'y'.toByte, 'z'.toByte), // truncated 3-byte seq
      Array('q'.toByte, 0xFF.toByte, 0xFE.toByte, 'r'.toByte, 's'.toByte), // bare invalid lead bytes
      Array('t'.toByte, 0xF0.toByte, 0x9D.toByte)) // multi-byte cut at end of text
    val df = bad.toSeq.toDF("b").select($"b".cast("string").as("text"))
    val rows = df.select(
      sort_array(HashExprs.substrWindowKeys($"text", w)).as("native"),
      expr(
        s"""sort_array(array_distinct(CASE WHEN char_length(text) >= $w
           |  THEN transform(sequence(1, char_length(text) - ${w - 1}),
           |    i -> cast(conv(substring(md5(substring(text, i, $w)), 1, 15), 16, 10) as bigint))
           |  ELSE cast(array() as array<bigint>) END))
           |""".stripMargin).as("sql")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }
}
