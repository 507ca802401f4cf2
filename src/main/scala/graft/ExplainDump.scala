package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Dev/judge tool: dump `.explain("formatted")` for every declared
  * query to `<outDir>/<name>_<suffix>.txt` — the plan-shape evidence
  * the optimization rounds commit (plans/r18/...). Construction-time
  * driver work (Lloyd iterations, file export) runs as in Bench, so
  * the dumped plan is the one the timed run executes; the dump itself
  * never materializes the query.
  *
  * usage: runMain graft.ExplainDump <sfDir> <outDir> <suffix> [q1,q2,...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3 || args.length > 4) {
      System.err.println(
        "usage: graft.ExplainDump <sfDir> <outDir> <suffix> [only1,only2,...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix) = args.take(3)
    val subset: Option[Set[String]] =
      if (args.length == 4) Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    subset.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown queries in subset: ${unknown.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => subset.forall(_.contains(n)))
    var failed = 0
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        // checkpointed queries' public plans truncate to
        // `Scan ExistingRDD`; dump the pre-checkpoint kernel chain too
        operators.Dedup.preCheckpointPlans.get(name).foreach { pre =>
          Files.write(Paths.get(outDir, s"${name}_pre_$suffix.txt"),
            pre(spark, sfDir).queryExecution.explainString(FormattedMode)
              .getBytes("UTF-8"))
        }
        println(f"[explain] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[explain] $name FAILED: " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
