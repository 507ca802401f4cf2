package graft.operators

/** Offline BPE vocabulary learner — standard frequency BPE (Sennrich
  * et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"): start from code points, repeatedly merge the most
  * frequent adjacent token pair over the word histogram (ties broken
  * to the lexicographically smallest pair, so the learned table is
  * deterministic), applying each learned merge to ALL its occurrences
  * before the next count. Driven by [[graft.examples.BpeTrain]] over
  * a corpus word histogram; the output ships as the frozen
  * `bpe_merges.txt` resource [[TextAnalysis.BpeMerges]] loads — the
  * way production tokenizers ship a merges.txt artifact.
  *
  * Driver-local BY DESIGN: the input is the word HISTOGRAM (distinct
  * words × counts — ~10⁴–10⁵ entries for any corpus, bounded by
  * `maxWords` frequency cutoff), not the corpus. At 100 TB the
  * histogram aggregation is the distributed step (one groupBy) and
  * this loop is still a laptop-sized job — which is exactly how
  * production vocabs are trained.
  */
object BpeVocab {

  private def codePoints(w: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val c = w.codePointAt(i)
      val n = Character.charCount(c)
      b += w.substring(i, i + n)
      i += n
    }
    b.result()
  }

  /** Learn up to `nMerges` merges from (word, count) rows. Stops early
    * when no adjacent pair remains (every word fully merged). */
  def learn(wordCounts: Array[(String, Long)], nMerges: Int): Vector[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      wordCounts.filter(_._1.nonEmpty).map { case (w, c) => (codePoints(w), c) }
    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val counts = new java.util.HashMap[String, Long]()
      // pair key "l r" — tokens are space-free by construction (words
      // come from a space split), so the separator is unambiguous
      words.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          counts.merge(toks(i) + " " + toks(i + 1), c, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestKey: String = null
        var bestCount = -1L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > bestCount ||
              (e.getValue == bestCount && e.getKey.compareTo(bestKey) < 0)) {
            bestKey = e.getKey; bestCount = e.getValue
          }
        }
        val sep = bestKey.indexOf(' ')
        val l = bestKey.substring(0, sep)
        val r = bestKey.substring(sep + 1)
        merges += ((l, r))
        // apply to all non-overlapping occurrences, left-to-right —
        // the same batch rule the encoder runs at inference
        words = words.map { case (toks, c) =>
          var has = false
          var i = 0
          while (!has && i < toks.length - 1) {
            if (toks(i) == l && toks(i + 1) == r) has = true
            i += 1
          }
          if (!has) (toks, c)
          else {
            val out = Array.newBuilder[String]
            i = 0
            while (i < toks.length) {
              if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
                out += l + r; i += 2
              } else { out += toks(i); i += 1 }
            }
            (out.result(), c)
          }
        }
        step += 1
      }
    }
    merges.result()
  }
}
