package graft

/** Transient r18 diagnostic: split the multimodal rows' wall between
  * the in-plan P6 payload synthesis (md5-hex repeat + unhex), the
  * Dataset decode boundary, and the real raster work. */
object MmPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.spark
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($r)")
    }
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    // warm JVM/codegen
    time("meta warm") { run(multimodal.Multimodal.qMmMeta(spark, dir)) }
    time("qMmMeta") { run(multimodal.Multimodal.qMmMeta(spark, dir)) }
    time("qMmFrames") { run(multimodal.Multimodal.qMmFrames(spark, dir)) }
    time("qMmFeatures") { run(multimodal.Multimodal.qMmFeatures(spark, dir)) }
    time("qMmResize") { run(multimodal.Multimodal.qMmResize(spark, dir)) }
    // synthesis alone: meta columns + payload bytes, materialized
    time("metaFrame only") { run(multimodal.Multimodal.metaFrameProbe(spark, dir)) }
    time("payloadFrame only") { run(multimodal.Multimodal.payloadFrameProbe(spark, dir)) }
    time("payload length only") {
      run(multimodal.Multimodal.payloadFrameProbe(spark, dir)
        .select(col("doc_id"), length(col("payload")))) }
  }
}
