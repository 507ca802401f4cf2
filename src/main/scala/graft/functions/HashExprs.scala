package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the [[SharedHash]] fragments for hot paths.
  *
  * Semantics are IDENTICAL to the SQL fragments (and therefore to the
  * DuckDB oracle): the SQL `aggregate(transform(...))` spelling costs
  * one boxed lambda call per character/bit — tens of millions of
  * interpreter dispatches per scan at sf0.1 — while these do the same
  * fold in one JVM call per value. `HashExprsSpec` pins the
  * equivalence against the SQL fragments.
  *
  * CodegenFallback is deliberate: RollingHash mostly runs inside
  * `transform(...)` lambdas (never codegen'd anyway), and SimHash62 is
  * one call per row.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_roll_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    // (acc*31 + codepoint) mod 1e9+7, matching ascii(substring(s,i,1))
    val s = v.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % SharedHash.P
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 62-bit SimHash over an array of token hashes (with multiplicity):
  * bit b set iff Σ_tokens (((h>>b)&1)==1 ? 1 : -1) > 0. */
case class SimHash62(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_simhash62"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](62)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // a null ELEMENT votes −1 on every bit — matching the SQL
      // fragment this expression pins equivalence to EXACTLY:
      // `IF((shiftright(NULL, b) & 1) = 1, 1, -1)` takes the else
      // branch in both Spark and DuckDB (an earlier revision returned
      // NULL here, which the fragments never do — a silent native-vs-
      // oracle divergence on arrays with null hashes)
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 62) { counts(b) -= 1; b += 1 }
      } else {
      val h = arr.getLong(i)
      var b = 0
      while (b < 62) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      }
      i += 1
    }
    var code = 0L
    var b = 0
    while (b < 62) {
      if (counts(b) > 0) code |= (1L << b)
      b += 1
    }
    code
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Tokenize-and-hash in one pass: equivalent to
  * `transform(filter(split(text, ' '), w -> w != ''), w -> roll(w))`
  * (multiplicity and order preserved) without one boxed lambda call
  * per token and per character. */
case class TokenHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_token_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // growable primitive buffer — no per-token boxing
    var out = new Array[Long](64)
    var len = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        var acc = 0L
        while (i < n && s.charAt(i) != ' ') {
          val cp = s.codePointAt(i)
          acc = (acc * 31 + cp) % SharedHash.P
          i += Character.charCount(cp)
        }
        if (len == out.length) out = java.util.Arrays.copyOf(out, len * 2)
        out(len) = acc; len += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(out, len))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct hashes of word n-gram shingles, one pass over the text:
  * equivalent to `array_distinct(transform(<n-word shingles joined by
  * ' '>, s -> roll(s)))` — the shingle hash is computed incrementally
  * from the token stream (a shingle's string is tok_i ‖ ' ' ‖ … ‖
  * tok_{i+n-1}, so its rolling hash is a fold over those chars), no
  * shingle strings are materialized. Output sorted ascending. */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  // SQL-registered, so arbitrary n reaches this constructor: n = 0
  // walks the gram loop off the offsets array (AIOOBE) or emits the
  // empty-shingle hash — reject it here, loudly
  require(n >= 1, s"$prettyName needs n >= 1, got $n")
  override def prettyName: String = "graft_word_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // tokenize
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) toks += s.substring(start, i)
    }
    val set = new java.util.TreeSet[java.lang.Long]()
    var t = 0
    while (t + n <= toks.length) {
      var acc = 0L
      var j = 0
      while (j < n) {
        if (j > 0) acc = (acc * 31 + ' '.toInt) % SharedHash.P
        val w = toks(t + j)
        var c = 0
        while (c < w.length) {
          val cp = w.codePointAt(c)
          acc = (acc * 31 + cp) % SharedHash.P
          c += Character.charCount(cp)
        }
        j += 1
      }
      set.add(acc)
      t += 1
    }
    val arr = new Array[Long](set.size)
    val it = set.iterator(); var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-doc 64-bit word n-gram keys WITH within-doc counts, one pass
  * over the raw UTF-8 bytes: array<struct<gh, cnt>> sorted by gh —
  * the boilerplate detector's per-(doc, gram) count table computed
  * inside the scan. Replaces BOTH the
  * `explode(transform(sequence(1, size(words)-n+1), i ->
  * concat_ws(' ', slice(words, i, n))))` + `xxhash64(gram)` chain
  * (which allocated a slice array AND a gram string per position to
  * feed a hash that never leaves the query — only gram EQUALITY
  * matters downstream, counts in, counts out, and the oracle works
  * on gram strings) and the `groupBy(doc_id, gh).count()` aggregate
  * that followed it: within-doc repeat counting is per-row work, so
  * doing it here removes the corpus-scaled (doc, gram) Exchange
  * outright (guide §2.4) — the gram table is born pre-collapsed.
  *
  * Tokenization is byte-level split on 0x20 with empties dropped —
  * identical word boundaries to `filter(split(text, ' '), w -> w !=
  * '')`, since a space byte is never part of a multi-byte UTF-8
  * sequence. Key = XXH64 fold of the n per-word XXH64s; words cannot
  * contain the joiner, so word sequences map injectively to gram
  * strings and hash-equality classes equal gram-string equality
  * classes up to 2^-64 collisions (the same class the old 64-bit
  * xxhash64(gram) lived in). Docs with fewer than n words yield the
  * empty array (the old chain's `filter(size(words) >= n)`). */
case class WordGramCounts(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"$prettyName needs n >= 1, got $n")
  override def prettyName: String = "graft_word_gram_counts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("gh", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val s = v.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    var wh = new Array[Long](16)
    var nw = 0
    var i = 0
    while (i < nb) {
      while (i < nb && Platform.getByte(base, off + i) == 0x20) i += 1
      val start = i
      while (i < nb && Platform.getByte(base, off + i) != 0x20) i += 1
      if (i > start) {
        if (nw == wh.length) wh = java.util.Arrays.copyOf(wh, nw * 2)
        wh(nw) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        nw += 1
      }
    }
    if (nw < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val hs = new Array[Long](nw - n + 1)
    var g = 0
    while (g + n <= nw) {
      var acc = 42L
      var j = 0
      while (j < n) { acc = XXH64.hashLong(wh(g + j), acc); j += 1 }
      hs(g) = acc
      g += 1
    }
    // sort + run-length count: the per-doc (gram, count) table with a
    // deterministic (ascending gh) element order, no hash map
    java.util.Arrays.sort(hs)
    val out = new scala.collection.mutable.ArrayBuffer[Any](hs.length)
    var r = 0
    while (r < hs.length) {
      val h = hs(r)
      var c = 0L
      while (r < hs.length && hs(r) == h) { c += 1; r += 1 }
      out += org.apache.spark.sql.catalyst.InternalRow(h, c)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-position bigram model keys array<struct<h1, h12>> — the
  * q_text_bigram_ll key stream in one pass over the raw UTF-8 bytes.
  * Replaces the `transform(sequence(0, size(words)-2), i ->
  * struct(element_at(...), element_at(...)))` explode feeding
  * `xxhash64(w1)` / `xxhash64(w1, w2)`: one struct of two string refs
  * and three boxed lambda dispatches per bigram, with both words
  * re-hashed at every position they appear in. Here every word is
  * XXH64-hashed ONCE (byte-level split on 0x20, empties dropped —
  * identical boundaries to `filter(split(text, ' '), w -> w != '')`),
  * h1 = hash(w_i), h12 = an XXH64 fold of the two word hashes. The
  * keys never leave the query (the model aggregates and the scoring
  * join only need equality), and a count merges across a collision
  * only if two bigrams collide in h12 AND share h1 — the same ≪ 2^-64
  * class the old xxhash64 keys lived in. Fewer than 2 words → empty
  * array (the old chain's `filter(size(words) >= 2)`). */
case class WordBigramHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_word_bigram_hashes"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h12", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val s = v.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    var wh = new Array[Long](16)
    var nw = 0
    var i = 0
    while (i < nb) {
      while (i < nb && Platform.getByte(base, off + i) == 0x20) i += 1
      val start = i
      while (i < nb && Platform.getByte(base, off + i) != 0x20) i += 1
      if (i > start) {
        if (nw == wh.length) wh = java.util.Arrays.copyOf(wh, nw * 2)
        wh(nw) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        nw += 1
      }
    }
    if (nw < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val out = new Array[Any](nw - 1)
    var g = 0
    while (g + 2 <= nw) {
      out(g) = org.apache.spark.sql.catalyst.InternalRow(
        wh(g), XXH64.hashLong(wh(g + 1), wh(g)))
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The 60-bit md5-prefix window key walk shared by the batch
  * expressions below and the streaming twin
  * ([[graft.operators.Dedup.substringWindowKeys]] delegates here):
  * value-identical to the SQL spelling
  * `cast(conv(substring(md5(substring(text, i, W)), 1, 15), 16, 10)
  * as bigint)` — Spark's `substring` counts code points and its
  * `md5` hashes UTF-8 bytes, so the walk is codepoint-offset based
  * over ONE encoding of the text (UTF-8 concatenates exactly per
  * code point, so every window is a contiguous byte slice) and the
  * key is the digest's first 15 hex nibbles as an integer.
  * StreamingSpec pins the equality against the SQL spelling on real
  * corpus text. The engines must agree bit-exactly (the DuckDB
  * oracle computes the same md5 key, so a ~2^-60 collision hits both
  * sides identically), which is why this is the one gram family that
  * canNOT swap in a cheaper hash. */
private[graft] object Md5WindowKeys {
  /** String entry (streaming twin) — round-trips through UTF8String
    * so both callers hash the identical encoding (lone surrogates
    * become the 1-byte '?' replacement in both, so the offsets and
    * digests agree with the batch expression path). */
  def perPosition(text: String, w: Int): Array[Long] =
    perPosition(UTF8String.fromString(text), w)

  /** Per-position keys over the STORED UTF-8 bytes, multiplicity
    * preserved; empty if the text has fewer than `w` code points.
    * Hashing the raw UTF8String bytes (r19, advice item) does two
    * things: it drops the UTF-16 decode + re-encode round-trip the
    * old String path paid per document, and it makes the slices
    * byte-identical to the SQL spelling `md5(substring(text, i, W))`
    * even for non-well-formed UTF-8 — Spark's `substring` walks the
    * stored bytes with the same lead-byte widths used here, so the
    * oracle-parity claim no longer rests on a well-formed-corpus
    * assumption. */
  def perPosition(text: UTF8String, w: Int): Array[Long] = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // codepoint start offsets via UTF-8 lead-byte widths — the exact
    // walk UTF8String.substring performs (numBytesForFirstByte maps
    // invalid lead bytes to width 1, as Spark does)
    val bOff = new Array[Int](nBytes + 1)
    var bi = 0
    var nCp = 0
    while (bi < nBytes) {
      bOff(nCp) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      nCp += 1
    }
    if (nCp < w) return Array.empty
    // a trailing truncated multi-byte sequence can step past the end;
    // clamp so the last window's slice stays in bounds (Spark's
    // substring clamps the same way)
    bOff(nCp) = nBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](nCp - w + 1)
    var i = 0
    while (i + w <= nCp) {
      md.reset()
      md.update(bytes, bOff(i), bOff(i + w) - bOff(i))
      val d = md.digest()
      // first 15 hex nibbles = bytes 0-6 plus byte 7's high nibble
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >> 4)
      out(i) = v
      i += 1
    }
    out
  }

  /** Distinct keys in first-occurrence order (the streaming twin's
    * historical contract). */
  def distinctFirstOccurrence(text: String, w: Int): Array[Long] =
    distinctFirstOccurrence(UTF8String.fromString(text), w)

  def distinctFirstOccurrence(text: UTF8String, w: Int): Array[Long] = {
    val all = perPosition(text, w)
    if (all.isEmpty) return all
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < all.length) {
      if (seen.add(all(i))) out += all(i)
      i += 1
    }
    out.toArray
  }
}

/** DISTINCT 60-bit md5-prefix window keys of every `w`-codepoint
  * sliding window — the batch windowKeys scan of the exact-substring
  * dedup family in one pass: replaces
  * `explode(sequence(...))` carrying the text through the Generate,
  * a per-window `substring` slice, Spark `md5`'s 32-char hex string,
  * a `substring(hex)` and a `conv` parse per position, AND the
  * per-doc DISTINCT that followed (dedup happens in the walk). Key
  * values are bit-identical to the SQL spelling ([[Md5WindowKeys]]),
  * so oracle parity is untouched. */
case class SubstrWindowKeys(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1, s"$prettyName needs w >= 1, got $w")
  override def prettyName: String = "graft_substr_window_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Md5WindowKeys.distinctFirstOccurrence(v.asInstanceOf[UTF8String], w))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [[SubstrWindowKeys]]' per-position twin (multiplicity preserved,
  * position = array index + 1 under `posexplode`) — the cut-list
  * builder's occurrence stream. */
case class SubstrWindowKeyArray(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1, s"$prettyName needs w >= 1, got $w")
  override def prettyName: String = "graft_substr_window_key_array"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Md5WindowKeys.perPosition(v.asInstanceOf[UTF8String], w))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct character n-grams — n counts CODE POINTS (grams step by
  * code point, matching the oracle's character-based substring; UTF-16
  * unit stepping would split surrogate pairs on non-BMP text) —
  * sorted in UTF8 binary (= Unicode code point) order: the SAME
  * collation [[SortedIntersectCount]] merges in and Spark's
  * `array_sort` sorts strings in, so sortedness is consistent for ALL
  * inputs including surrogate-range text (JVM String order would
  * diverge there: UTF-16 code units place supplementary characters
  * below U+E000..U+FFFF). Consumers merging the decoded JVM strings
  * must compare code points ([[SharedHash.codePointCompare]]), not
  * String.compareTo. */
case class CharNGramsSorted(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  // SQL-registered, so arbitrary n reaches this constructor: n = 0
  // walks the gram loop off the offsets array (AIOOBE) or emits the
  // empty-shingle hash — reject it here, loudly
  require(n >= 1, s"$prettyName needs n >= 1, got $n")
  override def prettyName: String = "graft_char_ngrams_sorted"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // grams advance by CODE POINT, not UTF-16 unit: unit-stepping
    // splits surrogate pairs (lone surrogates get replaced by
    // UTF8String.fromString) and disagrees with the oracle's
    // character-based substring for any non-BMP text
    val starts = {
      val b = new Array[Int](s.length)
      var cnt = 0; var i = 0
      while (i < s.length) {
        b(cnt) = i; cnt += 1
        i += Character.charCount(s.codePointAt(i))
      }
      (b, cnt)
    }
    val (off, cp) = starts
    val set = new java.util.TreeSet[UTF8String]()
    var g = 0
    while (g + n <= cp) {
      val end = if (g + n < cp) off(g + n) else s.length
      set.add(UTF8String.fromString(s.substring(off(g), end)))
      g += 1
    }
    val arr = new Array[AnyRef](set.size)
    val it = set.iterator(); var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [[CharNGramsSorted]]'s packed-long twin: each distinct n-gram
  * (n ≤ 3) packs its code points into ONE long — 21 bits per code
  * point (max U+10FFFF < 2²¹), highest-order gram position in the
  * highest bits — and the array sorts ascending numerically. The
  * packing is INJECTIVE (fixed n, fixed-width fields) and
  * ORDER-ISOMORPHIC to the string form's UTF8-binary order (both
  * are lexicographic in code points for equal-length grams), so a
  * two-pointer merge over two packed arrays visits exactly the
  * pairs the string merge would — same intersection counts, same
  * Jaccard, byte-identical query output — while each gram costs 8 B
  * instead of a pointer + UTF8String, and each comparison is one
  * long compare instead of a byte-wise scan. At pair-generation
  * scale (the gram array rides the skew-guard shuffle ×salt and the
  * merge runs per candidate pair) that is the dominant shuffle and
  * CPU term of exact-Jaccard dedup. */
case class CharNGramsPacked(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 3, s"$prettyName packs 21-bit code points into a long: n must be 1..3, got $n")
  override def prettyName: String = "graft_char_ngrams_packed"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // code-point stepping, same contract as CharNGramsSorted
    val cps = {
      val b = new Array[Int](s.length)
      var cnt = 0; var i = 0
      while (i < s.length) {
        b(cnt) = s.codePointAt(i); cnt += 1
        i += Character.charCount(b(cnt - 1))
      }
      (b, cnt)
    }
    val (cp, m) = cps
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Long](0))
    val packed = new Array[Long](m - n + 1)
    var g = 0
    while (g + n <= m) {
      var acc = 0L
      var j = 0
      while (j < n) { acc = (acc << 21) | cp(g + j).toLong; j += 1 }
      packed(g) = acc
      g += 1
    }
    java.util.Arrays.sort(packed)
    // in-place dedup of the sorted grams
    var w = 1; var r = 1
    while (r < packed.length) {
      if (packed(r) != packed(w - 1)) { packed(w) = packed(r); w += 1 }
      r += 1
    }
    val out = if (w == packed.length) packed else java.util.Arrays.copyOf(packed, w)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashExprs {
  def rollHash(c: Column): Column = bridge.column(RollingHash(bridge.expression(c)))
  def simHash62(c: Column): Column = bridge.column(SimHash62(bridge.expression(c)))
  def tokenHashes(c: Column): Column = bridge.column(TokenHashes(bridge.expression(c)))
  def wordShingleHashes(c: Column, n: Int): Column =
    bridge.column(WordShingleHashes(bridge.expression(c), n))
  def wordGramCounts(c: Column, n: Int): Column =
    bridge.column(WordGramCounts(bridge.expression(c), n))
  def wordBigramHashes(c: Column): Column =
    bridge.column(WordBigramHashes(bridge.expression(c)))
  def substrWindowKeys(c: Column, w: Int): Column =
    bridge.column(SubstrWindowKeys(bridge.expression(c), w))
  def substrWindowKeyArray(c: Column, w: Int): Column =
    bridge.column(SubstrWindowKeyArray(bridge.expression(c), w))
  def charNGramsSorted(c: Column, n: Int): Column =
    bridge.column(CharNGramsSorted(bridge.expression(c), n))
  def charNGramsPacked(c: Column, n: Int): Column =
    bridge.column(CharNGramsPacked(bridge.expression(c), n))
}
