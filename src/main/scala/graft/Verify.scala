package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [only1,only2,...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args.take(2)
    // optional dev-loop subset (the driver always passes 2 args): run
    // only the named queries; the dumped inventory shrinks to match so
    // check.py's completeness pass doesn't flag the skipped ones
    val subset: Option[Set[String]] =
      if (args.length == 3) Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    subset.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown queries in subset: ${unknown.mkString(", ")}")
    }
    def selected(name: String): Boolean = subset.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // hash-agg headroom for query-set-sized TopK groups — see the
      // rationale at the Bench builder (Bench.scala); 128 Ki clears
      // a ×1000 rehearsal's 40k-query set (see the Bench builder)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      // multi-query sessions accumulate completed queries' shuffle
      // files until the driver GCs (30-min default) — rehearsal-SF
      // dumps run long enough to ENOSPC; see the Bench builder note
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // start from a CLEAN dump state: a failing query must leave a
    // missing directory, never a stale one from a previous run that a
    // comparator would read as a false PASS. Deletion is surgical —
    // only this run's query names and the two manifest files — so a
    // typo'd outDir (a workspace, the sf dir itself) is never
    // recursively wiped.
    val outFile = new java.io.File(outDir)
    outFile.mkdirs()
    SparkEntry.queries.keys.filter(selected).foreach { name =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outFile, name))
    }
    Seq("oracle_sql.json", "queries.json").foreach { f =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outFile, f))
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          // per-query wall time on stderr: the scale-rehearsal loop
          // greps these to spot nonlinear blowups (a query that runs
          // 0.3 s at sf0.1 and 400 s at sf10 is a collapse, not load)
          System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
        } catch { case e: Throwable =>
          // e.toString, not getMessage: an NPE's message is null and
          // "[verify] q failed: null" is undiagnosable in the dev loop
          System.err.println(s"[verify] $name failed: ${e.toString}")
          failed += name
        }
      }
    }
    // loud end-of-run verdict: a family-wide reader breakage (r8: all
    // 7 events queries) must be one unmissable line, not 7 stack
    // traces scrolled past 10k INFO lines. check.py independently
    // FAILs every inventory entry with no dump, so the gate stays red
    // even if this line is ignored.
    val nRun = SparkEntry.queries.keys.count(selected)
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] RED: ${failed.size}/$nRun queries " +
          s"produced no dump: ${failed.sorted.mkString(", ")}")
    else
      System.err.println(s"[verify] all $nRun queries dumped")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // full query inventory, so the comparator can detect a query that
    // produced NO dump at all (rows-only queries are not in
    // oracle_sql.json — without this list their crash is invisible)
    val inventory = SparkEntry.queries.keys.filter(selected).toSeq.sorted
      .map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/queries.json"), inventory)
    spark.stop()
  }
}
