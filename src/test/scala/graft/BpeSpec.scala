package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The committed-vocab BPE tokenizer behind `q_text_tokens_bpe`.
  *
  * Three pins:
  *  1. encode results on committed-vocab words (the vocab was learned
  *     from the sf0.01 corpus, so its own words must compress);
  *  2. the one-merge-at-a-time rule the oracle's recursive CTE
  *     replays is EQUIVALENT to the standard all-occurrences batch
  *     encode (Sennrich/GPT-2 style) on every distinct corpus word —
  *     the "real BPE" claim, not just self-consistency;
  *  3. the distributed query's totals equal a direct driver-side
  *     recount, so the memoized mapPartitions path adds nothing.
  */
class BpeSpec extends AnyFunSuite {
  private val spark = SparkSpecBase.spark
  import spark.implicits._

  test("committed vocab compresses its own corpus words; strangers stay chars") {
    def n(w: String) = TextAnalysis.bpeTokens(w).length
    // full-word merges exist for these (see BpeMerges)
    for (w <- Seq("customer", "column", "batch", "vector", "value",
        "table", "data", "merge", "filter", "small", "order", "key"))
      assert(n(w) == 1, s"$w → ${TextAnalysis.bpeTokens(w).mkString("|")}")
    assert(TextAnalysis.bpeTokens("big").sameElements(Array("b", "i", "g")))
    assert(n("a") == 1)
    assert(n("") == 0)
    // 'z' never appears in the corpus alphabet: single-char tokens
    assert(TextAnalysis.bpeTokens("zzz").sameElements(Array("z", "z", "z")))
    // on an unseen compound the greedy rank order merges ACROSS the
    // seam (the early (a,t) merge eats the boundary before the long
    // whole-word merges get a turn) — expected BPE behavior, pinned
    // so a vocab edit that changes it is visible
    assert(TextAnalysis.bpeTokens("datatable").sameElements(
      Array("d", "at", "at", "able")))
  }

  /** Standard batch BPE encode: each round picks the lowest-rank
    * applicable merge and replaces ALL its non-overlapping
    * occurrences left-to-right (GPT-2 bpe.py's loop). */
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

  test("one-at-a-time rule == standard batch encode on every distinct corpus word") {
    val words = Tables.documents(spark, SparkSpecBase.sf01)
      .select(explode(expr("filter(split(text, ' '), w -> w != '')")).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    for (w <- words)
      assert(TextAnalysis.bpeTokens(w).sameElements(batchEncode(w)),
        s"$w: one-at-a-time ${TextAnalysis.bpeTokens(w).mkString("|")} vs " +
          s"batch ${batchEncode(w).mkString("|")}")
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
}
