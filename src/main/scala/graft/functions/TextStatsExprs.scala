package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document text statistics (optimization round 18).
  *
  * Both expressions replace an explode → per-(doc, gram) hash
  * aggregate → per-doc hash aggregate chain (two Exchanges carrying a
  * gram-cardinality row stream) with ONE projection evaluated inside
  * the scan stage: every statistic here is a function of a single
  * row, so shipping the grams through two shuffles bought nothing but
  * exchange cost — guide §2.4 ("remove shuffles outright"). The
  * shuffle count per query drops from 3 to 1 (only the final
  * presentation orderBy remains) at ANY scale, which is the
  * difference between a corpus-sized shuffle and none at 100 TB.
  *
  * Semantics are EXACT — no hashing, no approximation. Equality of
  * the emitted counts with the aggregate form is pinned in
  * TextStatsExprsSpec against the original explode/groupBy chain, and
  * the unchanged DuckDB oracles hash-match the rewritten queries.
  *
  * CodegenFallback is deliberate, matching [[HashExprs]]: one call
  * per row; all per-token work happens in tight JVM loops inside.
  */

/** struct(n_words, n_distinct, top_word, n_bigrams, top_bigram) over
  * a words array — the five integers behind q_text_repetition.
  *
  * n_words   = |words| (with multiplicity)
  * n_distinct= distinct words
  * top_word  = highest multiplicity of any word
  * n_bigrams = |words|-1 (0 for a single-word doc)
  * top_bigram= highest multiplicity of any adjacent pair (0 if none)
  *
  * Pair equality: the aggregate form counted bigrams as the joined
  * string `w_i ‖ ' ' ‖ w_{i+1}`; words come from split-on-space with
  * empties removed, so no word contains a space and the join is
  * injective — componentwise equality used here is the same relation.
  *
  * Distinct/top counts come from sorting (binary UTF8String order)
  * and run-scanning — exact, allocation-bounded by the row. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_repetition_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_word", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // a null element cannot occur from the words expression
      // (filter(split(...))) but the type allows it; treat null as a
      // distinct sentinel exactly like the aggregate form did (NULL
      // grouped as its own key)
      words(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val sorted = words.clone()
    java.util.Arrays.sort(sorted, UTF8NullsFirst)
    var ndw = 0; var topw = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && UTF8NullsFirst.compare(sorted(j), sorted(i)) == 0) j += 1
      ndw += 1
      if (j - i > topw) topw = j - i
      i = j
    }
    var topbg = 0
    val nbg = math.max(n - 1, 0)
    if (nbg > 0) {
      // sort bigram START INDICES by (w(i), w(i+1)); adjacent-equal
      // runs in that order are exactly the equal-bigram groups
      val idx = new Array[Integer](nbg)
      i = 0
      while (i < nbg) { idx(i) = Integer.valueOf(i); i += 1 }
      val cmp = new java.util.Comparator[Integer] {
        def compare(a: Integer, b: Integer): Int = {
          val c1 = UTF8NullsFirst.compare(words(a), words(b))
          if (c1 != 0) c1 else UTF8NullsFirst.compare(words(a + 1), words(b + 1))
        }
      }
      java.util.Arrays.sort(idx, cmp)
      i = 0
      while (i < nbg) {
        var j = i + 1
        while (j < nbg && cmp.compare(idx(j), idx(i)) == 0) j += 1
        if (j - i > topbg) topbg = j - i
        i = j
      }
    }
    InternalRow(n, ndw, topw, nbg, topbg)
  }

  private object UTF8NullsFirst extends java.util.Comparator[UTF8String] {
    def compare(a: UTF8String, b: UTF8String): Int =
      if (a eq null) { if (b eq null) 0 else -1 }
      else if (b eq null) 1
      else a.compareTo(b)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shannon entropy (bits) over a string's code points — the scalar
  * behind q_text_entropy, un-rounded (the query applies the same
  * `round(x, 4)` as before).
  *
  * Identity used by the aggregate form, reproduced exactly:
  * −Σ (n/t)·log2(n/t) = log2(t) − Σ n·log2(n) / t. log2 is
  * `StrictMath.log(x) / StrictMath.log(2)` — bit-for-bit what Spark's
  * Log2 expression computes (verified against the 4.1.2 bytecode), so
  * the only difference from the aggregate form is double addition
  * order in Σ n·log2(n), the same order freedom the hash aggregate
  * already had. Counting splits on code points, matching
  * `split(text, '')` (Java regex is code-point aware). */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_char_entropy"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  private val Ln2 = java.lang.StrictMath.log(2.0)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    // collect code points, sort, run-scan — exact counts, no hashing
    var cps = new Array[Int](math.min(n, 16).max(1))
    var len = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (len == cps.length) cps = java.util.Arrays.copyOf(cps, len * 2)
      cps(len) = cp; len += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps, 0, len)
    val t = len.toDouble
    var acc = 0.0
    i = 0
    while (i < len) {
      var j = i + 1
      while (j < len && cps(j) == cps(i)) j += 1
      val cnt = (j - i).toDouble
      acc += cnt * (java.lang.StrictMath.log(cnt) / Ln2)
      i = j
    }
    java.lang.StrictMath.log(t) / Ln2 - acc / t
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of code points outside [a-z0-9 ] — exactly the matches of
  * `regexp_extract_all(text, '[^a-z0-9 ]', 0)` (Java regex character
  * classes match one CODE POINT, as does this loop), but counted in
  * place: the regexp form materializes a one-char UTF8String per
  * punctuation hit into an array that only ever feeds size(), ~|text|
  * small allocations per document on punctuation-heavy corpora. Feeds
  * the punct_ratio of q_text_quality / q_pipeline_select / the
  * streaming select twin (one shared definition, withQualityCols). */
case class PunctCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_punct_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    var cnt = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val in = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == ' '
      if (!in) cnt += 1
      i += Character.charCount(cp)
    }
    cnt
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** struct(n_ws_tokens, n_alpha_tokens, n_num_tokens, n_punct,
  * n_bpe_est) — the five q_text_tokens statistics in ONE pass over
  * the text's code points. The projection form evaluated THREE
  * `regexp_extract_all` calls (each materializing an array of match
  * UTF8Strings only to size() it), a split+filter words array, and an
  * `aggregate(transform(...))` pair of boxed lambdas per document.
  * Semantics reproduced exactly:
  *
  * n_ws_tokens    = runs of non-space (split-on-' ' with empties
  *                  dropped — words)
  * n_alpha_tokens = maximal runs of [a-z]   (regexp '[a-z]+')
  * n_num_tokens   = maximal runs of [0-9]   (regexp '[0-9]+')
  * n_punct        = code points outside [a-z0-9 ] ([[PunctCount]])
  * n_bpe_est      = Σ_words ceil(len_codepoints(word)/4) as a long
  *
  * Java regex character classes match one code point, and Spark's
  * `length`/`substring` count code points, so the single code-point
  * walk here is the same character model all five legacy expressions
  * used. Equality pinned in TextStatsExprsSpec on the corpus +
  * edges; the DuckDB oracle (unchanged) hash-checks end to end. */
case class TokenStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_token_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_ws_tokens", IntegerType, nullable = false),
    StructField("n_alpha_tokens", IntegerType, nullable = false),
    StructField("n_num_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_bpe_est", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    var nWs = 0; var nAlpha = 0; var nNum = 0; var nPunct = 0
    var nBpe = 0L
    var wordLen = 0  // code points of the current word (0 = not in one)
    var inAlpha = false; var inNum = false
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val isAlpha = cp >= 'a' && cp <= 'z'
      val isNum = cp >= '0' && cp <= '9'
      val isSpace = cp == ' '
      if (!isAlpha && !isNum && !isSpace) nPunct += 1
      if (isAlpha && !inAlpha) nAlpha += 1
      if (isNum && !inNum) nNum += 1
      inAlpha = isAlpha; inNum = isNum
      if (isSpace) {
        if (wordLen > 0) { nWs += 1; nBpe += (wordLen + 3L) / 4L; wordLen = 0 }
      } else wordLen += 1
      i += Character.charCount(cp)
    }
    if (wordLen > 0) { nWs += 1; nBpe += (wordLen + 3L) / 4L }
    InternalRow(nWs, nAlpha, nNum, nPunct, nBpe)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** struct(n_words, sum_word_len, hits: array<int>) — the word-derived
  * inputs of the quality/lang scoring chains in ONE pass over the raw
  * UTF-8 bytes: word count, Σ per-word code-point lengths (the
  * avg_word_len numerator), and per-stopword-list hit counts (one
  * array slot per list, in constructor order). Replaces, per
  * document: the split+filter words ARRAY, an `aggregate(transform(
  * words, length))` boxed-lambda pair, and ONE `size(filter(words,
  * w -> w IN (...)))` pass per language (5 such passes across the
  * quality+lang chain). Word boundaries are byte-level split on 0x20
  * with empties dropped (== `filter(split(text, ' '), w -> w !=
  * '')`); word length counts code points (non-continuation UTF-8
  * bytes — what Spark's `length` counts); stopword match is exact
  * byte equality (all lists are ASCII). Equality with the legacy
  * column chain is pinned in TextStatsExprsSpec; the DuckDB oracles
  * (unchanged) hash-check end to end. */
case class WordLangStats(child: Expression, langs: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {
  require(langs.nonEmpty, s"$prettyName needs at least one stopword list")
  override def prettyName: String = "graft_word_lang_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  // (langIdx, bytes) flattened, grouped by word length for a cheap
  // candidate scan — the lists are tiny (8 ASCII words per language)
  @transient private lazy val byLen: Map[Int, Array[(Int, Array[Byte])]] =
    langs.zipWithIndex.flatMap { case (ws, li) =>
      ws.map(w => (li, w.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
    }.groupBy(_._2.length).map { case (l, xs) => l -> xs.toArray }

  override def nullSafeEval(v: Any): Any = {
    import org.apache.spark.unsafe.Platform
    val s = v.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    var nWords = 0
    var sumLen = 0L
    val hits = new Array[Int](langs.length)
    var i = 0
    while (i < nb) {
      while (i < nb && Platform.getByte(base, off + i) == 0x20) i += 1
      val start = i
      var cps = 0
      while (i < nb && Platform.getByte(base, off + i) != 0x20) {
        // count code points: every byte that is not a continuation
        if ((Platform.getByte(base, off + i) & 0xC0) != 0x80) cps += 1
        i += 1
      }
      if (i > start) {
        nWords += 1
        sumLen += cps
        val wlen = i - start
        byLen.get(wlen) match {
          case Some(cands) =>
            var c = 0
            while (c < cands.length) {
              val (li, wb) = cands(c)
              var j = 0
              while (j < wlen && Platform.getByte(base, off + start + j) == wb(j)) j += 1
              if (j == wlen) hits(li) += 1
              c += 1
            }
          case None =>
        }
      }
    }
    InternalRow(nWords, sumLen,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hits))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextStatsExprs {
  def repetitionStats(c: Column): Column =
    bridge.column(RepetitionStats(bridge.expression(c)))
  def charEntropy(c: Column): Column =
    bridge.column(CharEntropy(bridge.expression(c)))
  def punctCount(c: Column): Column =
    bridge.column(PunctCount(bridge.expression(c)))
  def tokenStats(c: Column): Column =
    bridge.column(TokenStats(bridge.expression(c)))
  def wordLangStats(c: Column, langs: Seq[Seq[String]]): Column =
    bridge.column(WordLangStats(bridge.expression(c), langs))
}
