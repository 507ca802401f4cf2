package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.index.{VamanaIndex, VamanaParams}
import graft.sources.VecsFormats

/** The engine's front door — one runnable pipeline composing the
  * surfaces a real training-data user chains, the way the reference's
  * demo example is its front door (reference examples/demo.rs):
  *
  *   1. SELECT: quality-score, language-gate, and exact-dedup the
  *      documents table (the batch selection pipeline,
  *      [[graft.operators.TextAnalysis.qPipelineSelect]]), then drop
  *      SemDeDup non-keepers ([[graft.operators.Dedup.qDedupSemantic]]
  *      — embedding-space duplicates survive text dedup) and draw the
  *      temperature-mixed sample
  *      ([[graft.operators.TextAnalysis.qSampleTemperature]]) — the
  *      r16 stages in the order a training-data pipeline runs them.
  *   2. INTERCHANGE: export the selected vectors as sharded `.fvecs`
  *      (executor-parallel) and read them back through the DataSource
  *      V2 connector — ids become POSITIONAL, the benchmark formats'
  *      convention.
  *   3. INDEX: capped overlap-2 Vamana build
  *      ([[VamanaIndex.buildOverlappedCapped]] — the skew-safe
  *      boundary-replicated tier), persisted with
  *      [[VamanaIndex.save]] (metadata.json carries the k→(tier,
  *      nprobe, beam) serving schedule + pivot routing), reloaded
  *      from disk.
  *   4. SERVE: pivot-routed probed search over the RELOADED index at
  *      nprobe = half the shards, next to the full (all-shard)
  *      search — the schedule's trade, live.
  *   5. EVALUATE: exact ground truth through the custom kNN operator
  *      ([[graft.plans.KnnJoin]]), exported to `.ivecs`, read back
  *      via `spark.read.format("ivecs")`, and both serving modes
  *      scored against the FILE — the reference's benchmark protocol
  *      (examples/diskann_sift.rs:58-98).
  *   6. FILTER: the label-stitched tier
  *      ([[graft.index.StitchedIndex]]) built over the labeled
  *      table, persisted `partitionBy("label")`, reloaded, and a
  *      label-filtered search scored against the exact FILTERED
  *      truth — predicate serving at a plain beam.
  *
  * Run: `sbt "runMain graft.examples.PipelineDemo [sfDir] [workDir]"`
  * — minutes at the default sf0.01. PipelineDemoSpec drives the same
  * entry at sf0.001 and pins the selection counts and recall floors.
  */
object PipelineDemo {

  case class Result(
      nDocs: Long, nSelected: Long, nAfterSem: Long, nAfterMix: Long,
      nVectors: Long, nShards: Int,
      recallRouted: Double, recallFull: Double, nQueries: Long,
      schedule: String, recallFiltered: Double, filteredLabel: Int)

  def run(spark: SparkSession, sfDir: String, workDir: String): Result = {
    import spark.implicits._
    val k = 10
    val params = VamanaParams(maxDegree = 24, buildBeamWidth = 48,
      passes = 1, metric = "cosine")

    // -- 1. selection: dedup keeper ∧ English ∧ quality ≥ 0.5
    val nDocs = Tables.documents(spark, sfDir).count()
    val textSelected = graft.operators.TextAnalysis.qPipelineSelect(spark, sfDir)
      .select($"doc_id")
    val nTextSelected = textSelected.count()

    // -- 1b. semantic dedup (SemDeDup): drop the non-keeper members
    // of every embedding-space duplicate group — the r16 stage a
    // training-data pipeline runs AFTER text filters (near-identical
    // meaning survives exact/fuzzy text dedup)
    val semDrops = graft.operators.Dedup.qDedupSemantic(spark, sfDir)
      .filter($"keep" === 0).select($"vec_id".as("doc_id"))
    val afterSem = textSelected.join(semDrops, Seq("doc_id"), "left_anti")
    val nAfterSem = afterSem.count()

    // -- 1c. temperature mixing: the chars^0.7 source schedule's
    // deterministic hash-rate draw — what the run actually feeds
    val mixKeep = graft.operators.TextAnalysis.qSampleTemperature(spark, sfDir)
      .filter($"sel" === 1).select($"doc_id")
    val selected = afterSem.join(mixKeep, Seq("doc_id"), "left_semi")

    // -- 2. interchange: selected vectors → sharded fvecs → DSv2 read
    val corpusSel = Tables.embeddings(spark, sfDir)
      .join(selected, $"vec_id" === $"doc_id")
      .select($"vec_id", $"embedding")
    val fvecsDir = s"$workDir/corpus.fvecs.d"
    VecsFormats.writeFvecsSharded(corpusSel, fvecsDir, shards = 4)
    // read-back ids are positional 0..n-1 — every later step (index,
    // ground-truth file) shares that id space
    val corpus = spark.read.format("fvecs").load(fvecsDir)
      .select($"vec_id", $"embedding")
    val n = corpus.count()

    // -- 3. index: capped overlap-2 build, persisted + reloaded
    val shards = 4
    val (idx, split) = VamanaIndex.buildOverlappedCapped(
      corpus, params, shards, overlap = 2)
    val idxDir = s"$workDir/index"
    VamanaIndex.save(idx, params, idxDir, split)
    val reloaded = VamanaIndex.load(spark, idxDir).persist()
    val pivots = VamanaIndex.loadPivots(spark, idxDir)
    val schedule = VamanaIndex.loadServingSchedule(idxDir)

    // -- 4. serve: routed (nprobe = shards/2) vs full, off the RELOADED index
    val queries = corpus.filter($"vec_id" % 25 === 0)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val beam = math.max(64, 2 * k)
    val routed = VamanaIndex.searchProbed(reloaded, queries, k, beam, params,
      nprobe = shards / 2, excludeSelf = true, pivots = Some(pivots),
      distinctMerge = true)
    // "full" = probe every shard; an overlapped index needs the
    // id-DISTINCT merge (a replicated neighbor arrives from every
    // shard that holds it and would otherwise fill top-k slots twice)
    val full = VamanaIndex.searchProbed(reloaded, queries, k, beam, params,
      nprobe = shards, excludeSelf = true, pivots = Some(pivots),
      distinctMerge = true)

    // -- 5. evaluate vs the ivecs ground-truth FILE (ids are already
    // positional, so neighbor ids ARE file positions)
    val exact = graft.plans.KnnJoin(
      corpus, queries.toSeq.toDF("q_id", "qv"), k, params.metric,
      excludeSelf = true)
    val gtPath = s"$workDir/groundtruth.ivecs"
    VecsFormats.writeIvecs(
      exact.groupBy($"q_id".as("query_id"))
        .agg(array_sort(collect_list(struct($"rank",
          $"neighbor_id".cast("int").as("nid")))).as("rp"))
        .select($"query_id", expr("transform(rp, x -> x.nid)").as("neighbors")),
      gtPath)
    val qid = queries.map(_._1).sorted.zipWithIndex
      .map { case (q, r) => (r.toLong, q) }.toSeq.toDF("qrank", "q_id")
    val fileGt = spark.read.format("ivecs").load(gtPath)
      .select($"query_id".as("qrank"), explode($"neighbors").as("nid"))
      .select($"qrank", $"nid".cast("long").as("neighbor_id"))
      .join(qid, Seq("qrank")).select($"q_id", $"neighbor_id")
    def recallOf(approx: DataFrame): Double =
      VamanaIndex.recallDf(approx, fileGt).head().getDouble(0)

    // -- 6. filtered serving: the label-stitched tier, persisted
    // partitioned-by-label and reloaded — a predicate query at a
    // PLAIN beam against exactly its label's graphs
    val emb = Tables.embeddings(spark, sfDir)
    val target = 3
    val stitched = graft.index.StitchedIndex.build(
      emb.select($"vec_id", $"embedding"), emb.select($"vec_id", $"label"),
      params, targetShardRows = 2000)
    val stitchedDir = s"$workDir/stitched"
    graft.index.StitchedIndex.save(stitched, params, stitchedDir,
      targetShardRows = 2000)
    val sReloaded = graft.index.StitchedIndex.load(spark, stitchedDir)
    val fQueries = emb.filter($"vec_id" % 25 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val filtered = graft.index.StitchedIndex.search(
      sReloaded, fQueries, k, beam, params, target)
    // localCheckpoint: recallDf references its exact side twice, and
    // the analyzer cannot self-dedup the custom KnnJoin logical plan
    // (step 5 never hits this because the ivecs file round-trip
    // breaks the lineage there)
    val filteredGt = graft.plans.KnnJoin(
      emb.filter($"label" === target).select($"vec_id", $"embedding"),
      fQueries.toSeq.toDF("q_id", "qv"), k, params.metric,
      excludeSelf = false)
      .select($"q_id", $"neighbor_id")
      .localCheckpoint()
    val recallFiltered = VamanaIndex.recallDf(filtered, filteredGt)
      .head().getDouble(0)

    val res = Result(nDocs, nTextSelected, nAfterSem, selected.count(),
      n, shards,
      recallOf(routed), recallOf(full), queries.length.toLong, schedule,
      recallFiltered, target)
    reloaded.unpersist()
    res
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val workDir = args.lift(1).getOrElse(
      graft.TempCleanup.onExit(s"/tmp/graft_demo_${System.nanoTime()}"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(workDir))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = run(spark, sfDir, workDir)
      println(s"[demo] documents: ${r.nDocs} -> selected ${r.nSelected} " +
        s"(dedup + lang + quality) -> ${r.nAfterSem} (semantic dedup) " +
        s"-> ${r.nAfterMix} (temperature mix)")
      println(s"[demo] indexed ${r.nVectors} vectors, ${r.nShards} shards " +
        s"(capped overlap-2), saved + reloaded from $workDir/index")
      println(s"[demo] serving schedule: ${r.schedule}")
      println(s"[demo] recall@10 vs ivecs ground-truth file " +
        s"(${r.nQueries} queries): routed(nprobe=${r.nShards / 2}) " +
        f"${r.recallRouted}%.4f, full ${r.recallFull}%.4f")
      println(s"[demo] stitched filtered serving (label=${r.filteredLabel}, " +
        f"plain beam): recall@10 ${r.recallFiltered}%.4f vs exact filtered truth")
    } finally spark.stop()
  }
}
