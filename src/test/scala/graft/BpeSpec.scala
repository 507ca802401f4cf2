package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{BpeVocab, TextAnalysis}

/** The committed-vocab BPE tokenizer behind `q_text_tokens_bpe` /
  * `q_pack_chunks_bpe`.
  *
  * Pins:
  *  1. encode results on committed-vocab words (the vocab was learned
  *     from the sf0.1 corpus, so its words must compress to 1 token;
  *     strangers stay characters);
  *  2. the rank-map encode is EQUIVALENT to an independent vocab-scan
  *     batch encode (GPT-2 bpe.py's rule, written the slow way) on
  *     every distinct corpus word — the optimization adds nothing;
  *  3. the distributed query's totals equal a direct driver-side
  *     recount, so the memoized mapPartitions path adds nothing;
  *  4. the learner is deterministic frequency BPE (Sennrich 2016)
  *     with the lexicographic tie-break, saturates when no pairs
  *     remain, and RETRAINING over sf0.1 reproduces the committed
  *     merges artifact exactly.
  */
class BpeSpec extends AnyFunSuite {
  private val spark = SparkSpecBase.spark
  import spark.implicits._

  test("committed vocab compresses its own corpus words; strangers stay chars") {
    def n(w: String) = TextAnalysis.bpeTokens(w).length
    // full-word merge chains exist for these (see bpe_merges.txt)
    for (w <- Seq("customer", "window", "spark", "stream", "vector",
        "column", "filter", "table", "data", "value", "merge", "small",
        "group", "hash", "join", "sort", "order", "big", "up"))
      assert(n(w) == 1, s"$w → ${TextAnalysis.bpeTokens(w).mkString("|")}")
    assert(n("a") == 1)
    assert(n("") == 0)
    // 'z' never appears in the corpus alphabet: single-char tokens
    assert(TextAnalysis.bpeTokens("zzz").sameElements(Array("z", "z", "z")))
    // corpus words that did not make the 64-merge budget stay subword
    assert(TextAnalysis.bpeTokens("key").sameElements(Array("k", "e", "y")))
    // on an unseen compound the greedy rank order still finds the two
    // in-vocab halves — pinned so a vocab edit that changes it is
    // visible
    assert(TextAnalysis.bpeTokens("datatable").sameElements(
      Array("data", "table")))
  }

  /** Independent reference: vocab-scan batch BPE encode — each round
    * picks the lowest-rank applicable merge by scanning the merge
    * list in rank order and replaces ALL its non-overlapping
    * occurrences left-to-right (GPT-2 bpe.py's loop, written without
    * the rank map). */
  private def batchEncode(w: String): Array[String] = {
    var toks = w.map(_.toString).toArray
    var go = true
    while (go && toks.length > 1) {
      val mi = TextAnalysis.BpeMerges.indexWhere { case (l, r) =>
        toks.indices.init.exists(i => toks(i) == l && toks(i + 1) == r)
      }
      if (mi < 0) go = false
      else {
        val (l, r) = TextAnalysis.BpeMerges(mi)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
            out += l + r; i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.toArray
      }
    }
    toks
  }

  test("rank-map encode == independent vocab-scan batch encode on every distinct corpus word") {
    val words = Tables.documents(spark, SparkSpecBase.sf1)
      .select(explode(expr("filter(split(text, ' '), w -> w != '')")).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    for (w <- words)
      assert(TextAnalysis.bpeTokens(w).sameElements(batchEncode(w)),
        s"$w: rank-map ${TextAnalysis.bpeTokens(w).mkString("|")} vs " +
          s"vocab-scan ${batchEncode(w).mkString("|")}")
  }

  test("distributed query totals equal a driver-side recount") {
    val dir = SparkSpecBase.sf001
    val got = TextAnalysis.qTextTokensBpe(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = docs.map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      id -> (ws.length.toLong, ws.map(w => TextAnalysis.bpeTokens(w).length.toLong).sum)
    }.filter(_._2._1 > 0).toMap
    assert(got == want)
  }

  test("learner: deterministic, lexicographic tie-break, saturation stop") {
    // aaab×10 + ab×5: counts (a,a)=20 > (a,b)=15 → merge (a,a);
    // then (a,b)=15 > (aa,a)=10 → merge (a,b); then (aa,ab)=10;
    // then no pairs remain → stop at 3 despite the 100 budget
    val m = BpeVocab.learn(Array(("aaab", 10L), ("ab", 5L)), 100)
    assert(m == Vector("a" -> "a", "a" -> "b", "aa" -> "ab"), m.toString)
    // equal counts pick the lexicographically smallest pair
    val t = BpeVocab.learn(Array(("ba", 3L), ("ab", 3L)), 1)
    assert(t == Vector("a" -> "b"), t.toString)
  }

  test("retraining over sf0.1 reproduces the committed merges artifact; corpus saturates at 89") {
    val hist = Tables.documents(spark, SparkSpecBase.sf1)
      .select(explode(expr(TextAnalysis.WordsExpr)).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w"))
      .as[(String, Long)].collect()
    val relearned = BpeVocab.learn(hist, 64)
    assert(relearned == TextAnalysis.BpeMerges,
      "BpeTrain over sf0.1 no longer reproduces bpe_merges.txt — corpus " +
        "or learner drifted; re-run graft.examples.BpeTrain and re-commit")
    // the synthetic corpus holds 31 distinct words: full-frequency BPE
    // saturates at 89 merges (every word → one token). The committed
    // budget (64) deliberately sits below that so subword structure
    // survives — at a real corpus the budget is 32k+ and nothing in
    // the kernel, learner, or oracle changes (the encode is
    // vocab-size-independent via the rank map).
    val saturated = BpeVocab.learn(hist, 10000)
    assert(saturated.length == 89,
      s"sf0.1 saturation point moved: ${saturated.length} (was 89)")
    assert(saturated.take(64) == relearned,
      "budget-truncated learning must be a prefix of saturated learning")
  }
}
