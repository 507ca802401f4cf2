package graft

/** Transient r18 diagnostic (run manually): split q_dedup_simhash's
  * wall into its mechanical phases at bench scale/cores, to decide
  * whether the saltedPairs machinery (pre-count job, typed
  * groupByKey shuffle+sort, presentation orderBy) or the popcount
  * kernel owns the time. GRAFT_TEST_CPUS=32 matches the bench. */
object DedupPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($r)")
    }
    // warm like the bench family does
    operators.Dedup.warm(spark, dir)
    // full query, twice (the second is the bench's warm-rep shape)
    time("q_dedup_simhash full #1") {
      operators.Dedup.qDedupSimhash(spark, dir).queryExecution.toRdd.count() }
    time("q_dedup_simhash full #2") {
      operators.Dedup.qDedupSimhash(spark, dir).queryExecution.toRdd.count() }
    // phase splits on the same cached codes the query uses
    val coded = operators.Dedup.simhashCodes(spark, dir)
    time("codes count (cached)") { coded.count() }
    val bandExprs = (0 until 4)
      .map(b => s"$b, shiftright(code, ${16 * b}) & 65535").mkString(", ")
    val bands = coded.selectExpr("doc_id", "code",
      s"stack(4, $bandExprs) AS (b, band)")
    time("bands materialize") { bands.queryExecution.toRdd.count() }
    val rows = bands
      .select(concat_ws("|", $"b", $"band").as("block"), $"doc_id",
        struct($"b", $"code").as("payload"))
      .as[(String, Long, (Int, Long))]
    time("saltExplode count+collect") {
      operators.Dedup.saltExplode(rows, 8192, 32).rdd.partitions.length }
    time("pairs (no orderBy)") {
      operators.Dedup.saltedPairs(rows, cap = 8192) {
        case ((ida, (b, ca)), (idb, (_, cb))) =>
          val xor = ca ^ cb
          val h = java.lang.Long.bitCount(xor)
          if (h > 3) None
          else {
            var first = 0
            while (((xor >>> (16 * first)) & 0xffffL) != 0L) first += 1
            if (first == b) Some((ida, idb, h)) else None
          }
      }.queryExecution.toRdd.count()
    }
    time("full #3 (with orderBy)") {
      operators.Dedup.qDedupSimhash(spark, dir).queryExecution.toRdd.count() }
  }
}
