package graft.functions

/** One generator, two dialects: deterministic hashing/fingerprint SQL
  * fragments emitted for BOTH Spark SQL and DuckDB, so the engine and
  * the correctness oracle compute bit-identical values (SURVEY.md §5).
  *
  * Base hash: left-fold polynomial rolling hash
  * `h = fold(chars, 0, (acc, c) => (acc*31 + c) mod 1e9+7)` — pure
  * integer arithmetic, representable in either engine, no dependence
  * on engine-specific hash builtins (Spark murmur3 vs DuckDB's hash
  * would never agree).
  */
object SharedHash {
  val P = 1000000007L

  /** Unicode code-point order over JVM strings — equals UTF-8 binary
    * order (what UTF8String.compareTo, Spark's array_sort, and
    * [[graft.functions.SortedIntersectCount]] use). String.compareTo
    * diverges for supplementary characters, whose UTF-16 surrogate
    * units sort below U+E000..U+FFFF; any kernel merging arrays
    * produced by [[graft.functions.CharNGramsSorted]] must use THIS
    * comparator. */
  def codePointCompare(a: String, b: String): Int = {
    // fast path: at the first differing UTF-16 unit, if neither unit
    // is in the surrogate range the unit order IS the code point
    // order — one branch per char for ASCII/BMP text, which is the
    // hot case in the dedup merge kernels
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i); val cb = b.charAt(i)
      if (ca != cb) {
        if (ca < 0xd800 && cb < 0xd800) return ca - cb
        return codePointCompareSlow(a, b, i)
      }
      i += 1
    }
    a.length - b.length
  }

  private def codePointCompareSlow(a: String, b: String, from: Int): Int = {
    // if the shared unit just before the first difference is a high
    // surrogate, it pairs in one string and dangles in the other —
    // decoding must start AT that unit or the comparison inverts
    // (e.g. U+10000 vs lone U+D800 followed by U+E000)
    val start =
      if (from > 0 && Character.isHighSurrogate(a.charAt(from - 1))) from - 1
      else from
    var i = start; var j = start
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** MinHash permutation parameters: h_j(x) = (a_j·x + b_j) mod P. */
  case class Perm(a: Long, b: Long)
  def perms(n: Int): Seq[Perm] = (0 until n).map(j => Perm(2L * j + 1, 7919L * j + 13))

  /** Rolling hash of string expression `e` (Spark SQL dialect). */
  def sparkRoll(e: String): String =
    s"aggregate(transform(sequence(1, length($e)), ci -> cast(ascii(substring($e, ci, 1)) as bigint)), " +
      s"0L, (acc, c) -> (acc * 31 + c) % ${P}L)"

  /** Rolling hash of string expression `e` (DuckDB dialect). */
  def duckRoll(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length($e) + 1), " +
      s"ci -> ascii(substring($e, ci, 1))::BIGINT)), (acc, c) -> (acc * 31 + c) % $P)"

  /** MinHash signature j over a bigint-array column `setCol`. */
  def sparkMinhash(setCol: String, p: Perm): String =
    s"array_min(transform($setCol, h -> (${p.a}L * h + ${p.b}L) % ${P}L))"

  def duckMinhash(setCol: String, p: Perm): String =
    s"list_min(list_transform($setCol, h -> (${p.a} * h + ${p.b}) % $P))"

  /** 62-bit SimHash over a bigint-array column of token hashes
    * (with multiplicity): bit b set iff Σ_tokens sign((h>>b)&1) > 0. */
  def sparkSimhash(thCol: String): String =
    s"""aggregate(transform(sequence(0, 61), b ->
       |  IF(aggregate(transform($thCol, h -> IF((shiftright(h, b) & 1) = 1, 1, -1)),
       |              0, (acc, x) -> acc + x) > 0,
       |     shiftleft(1L, b), 0L)),
       |0L, (acc, x) -> acc + x)""".stripMargin

  def duckSimhash(thCol: String): String =
    s"""CAST(list_sum(list_transform(range(0, 62), b ->
       |  CASE WHEN list_reduce(list_prepend(0, list_transform($thCol, h ->
       |         CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)),
       |       (acc, x) -> acc + x) > 0
       |  THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT)""".stripMargin
}
