package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline BPE vocabulary training run — produces the frozen
  * `bpe_merges.txt` artifact [[graft.operators.TextAnalysis.BpeMerges]]
  * ships. Usage:
  *
  *   runMain graft.examples.BpeTrain <sfDir> <outFile> [nMerges] [maxWords]
  *
  * Distributed step: one scan → word explode → count aggregate,
  * truncated to the `maxWords` most frequent distinct words
  * (frequency cutoff — the standard vocab-training bound). Local
  * step: [[graft.operators.BpeVocab.learn]] over that histogram.
  * Deterministic end to end (exact counts, lexicographic tie-break),
  * so re-running over the same corpus reproduces the committed
  * artifact byte-for-byte. */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BpeTrain <sfDir> <outFile> [nMerges] [maxWords]")
    val sfDir = args(0)
    val out = args(1)
    val nMerges = if (args.length > 2) args(2).toInt else 1024
    val maxWords = if (args.length > 3) args(3).toInt else 65536
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-bpe-train")
      .getOrCreate()
    import spark.implicits._
    val hist = graft.Tables.documents(spark, sfDir)
      .select(explode(expr(graft.operators.TextAnalysis.WordsExpr)).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w"))
      .limit(maxWords)
      .as[(String, Long)].collect()
    System.err.println(s"[bpe-train] histogram: ${hist.length} distinct words, " +
      s"${hist.map(_._2).sum} occurrences")
    val t0 = System.nanoTime()
    val merges = graft.operators.BpeVocab.learn(hist, nMerges)
    System.err.println(f"[bpe-train] learned ${merges.length} merges in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    val body = merges.map { case (l, r) => s"$l $r" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      body.getBytes("UTF-8"))
    System.err.println(s"[bpe-train] wrote $out")
    spark.stop()
  }
}
