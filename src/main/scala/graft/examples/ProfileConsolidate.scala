package graft.examples

import org.apache.spark.sql.SparkSession

/** Wall-clock comparison of the combined FreshDiskANN lifecycle
  * back-halves on identical index copies with an identical tombstone
  * set and insert batch:
  *
  *   - `merge` then `insertMerge` (two passes, each its own
  *     load + patch + save) vs [[graft.index.StreamingIndex
  *     .consolidate]] (the paper's StreamingMerge — both phases in
  *     ONE pass), and
  *   - [[graft.index.StreamingIndex.absorbSegments]] (segment tier
  *     torn down into the main graph, one pass) vs
  *     [[graft.index.StreamingIndex.compact]] (full rebuild) on the
  *     same segmented, tombstoned index — the real scheduling choice
  *     a continuous-ingest deployment makes.
  *
  * Recall@10 of every result against the brute-force live truth is
  * printed next to the times — the claim is "same answer quality,
  * fewer scans", so both numbers belong in the record. Figures land
  * in BASELINE.md "One-pass consolidate vs two-pass vs rebuild".
  *
  * Usage: runMain graft.examples.ProfileConsolidate [sfDir] [numShards] [delMod] [insMod]
  */
object ProfileConsolidate {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val numShards = if (args.length > 1) args(1).toInt else 8
    val delMod = if (args.length > 2) args(2).toInt else 10
    val insMod = if (args.length > 3) args(3).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-profile-consolidate")
      .getOrCreate()
    import spark.implicits._
    import graft.index.{StreamingIndex, VamanaIndex, VamanaParams}

    val params = VamanaParams(maxDegree = 32, buildBeamWidth = 64,
      passes = 1, metric = "cosine")
    val base = s"/tmp/graft_profile_consol_${spark.sparkContext.applicationId}"
    val p2step = s"$base-2step"; val p1pass = s"$base-1pass"
    val pAbs = s"$base-absorb"; val pCmp = s"$base-compact"
    val vecs = graft.Tables.embeddings(spark, dir)
    val all = vecs.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val mainRows = all.filter(_._1 % insMod != 0)
    val batch = all.filter(_._1 % insMod == 0)
    val built = VamanaIndex.build(
      mainRows.toSeq.toDF("vec_id", "embedding"), params, numShards).persist()
    val n = built.count()
    Seq(p2step, p1pass, pAbs, pCmp).foreach(p => VamanaIndex.save(built, params, p))
    built.unpersist()
    // seal the batch beside the main graph as ONE segment shard on the
    // absorb/compact copies — what ingest()'s foreachBatch appends
    val seg = VamanaIndex.build(
      batch.toSeq.toDF("vec_id", "embedding"), params, 1)
      .map(r => r.copy(shard = r.shard + StreamingIndex.ShardsPerBatchBase))
    Seq(pAbs, pCmp).foreach(p =>
      seg.write.mode("append").partitionBy("shard").parquet(s"$p/graph"))
    // % delMod == 1 keeps the delete set disjoint from the batch
    // selector (% insMod == 0) at the default 10/5 knobs
    val dels = mainRows.map(_._1).filter(_ % delMod == 1)
    Seq(p2step, p1pass, pAbs, pCmp).foreach(p =>
      StreamingIndex.delete(spark, p, dels.toSeq))
    System.err.println(
      s"[profile-consol] n=$n shards=$numShards deleted=${dels.length} batch=${batch.length}")

    def wall[T](tag: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); f
      System.err.println(f"[profile-consol] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val batchDf = batch.toSeq.toDF("vec_id", "embedding")
    wall("merge+insert") {
      StreamingIndex.merge(spark, p2step, params)
      StreamingIndex.insertMerge(spark, p2step, batchDf, params)
    }
    wall("consolidate")(StreamingIndex.consolidate(spark, p1pass, batchDf, params))
    wall("absorb")(StreamingIndex.absorbSegments(spark, pAbs, params, numShards))
    wall("compact")(StreamingIndex.compact(spark, pCmp, params, numShards))

    // recall@10 on a live query subset vs exact truth — live set =
    // (main minus deletes) plus the batch, identical across variants
    val delSet = dels.toSet
    val live = all.filter { case (id, _) => !delSet(id) }
    val qs = live.filter(_._1 % 50 == 3).sortBy(_._1).take(200)
    def recallOf(path: String): Double = {
      val served = VamanaIndex.search(VamanaIndex.load(spark, path),
          qs.map(q => (q._1, q._2)), 10, 64, params)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      qs.map { case (qid, qv) =>
        val exact = live.map { case (id, v) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < v.length) { dot += qv(i) * v(i); na += qv(i) * qv(i); nb += v(i) * v(i); i += 1 }
          (id, 1.0 - dot / math.max(math.sqrt(na * nb), java.lang.Double.MIN_NORMAL))
        }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
        (exact & served.getOrElse(qid, Set.empty)).size / 10.0
      }.sum / qs.length
    }
    System.err.println(f"[profile-consol] recall 2step=${recallOf(p2step)}%.3f " +
      f"1pass=${recallOf(p1pass)}%.3f absorb=${recallOf(pAbs)}%.3f " +
      f"compact=${recallOf(pCmp)}%.3f")
    Seq(p2step, p1pass, pAbs, pCmp).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    spark.stop()
  }
}
