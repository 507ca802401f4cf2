package graft.examples

import org.apache.spark.sql.SparkSession

/** Wall-clock comparison of the two delete-lifecycle back halves:
  * [[graft.index.StreamingIndex.merge]] (FreshDiskANN §4.2 in-place
  * patch — one scan + save) vs [[graft.index.StreamingIndex.compact]]
  * (full rebuild + save) on identical index copies with an identical
  * tombstone set. The recall of both results against the brute-force
  * live truth is printed next to the times — the claim is "same
  * answer quality, a fraction of the cost", so both numbers belong in
  * the record. Figures land in BASELINE.md "In-place merge vs
  * rebuild".
  *
  * Usage: runMain graft.examples.ProfileMerge [sfDir] [numShards] [delMod]
  */
object ProfileMerge {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val numShards = if (args.length > 1) args(1).toInt else 8
    val delMod = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-profile-merge")
      .getOrCreate()
    import spark.implicits._
    import graft.index.{StreamingIndex, VamanaIndex, VamanaParams}

    val params = VamanaParams(maxDegree = 32, buildBeamWidth = 64,
      passes = 1, metric = "cosine")
    val pM = s"/tmp/graft_profile_merge_${spark.sparkContext.applicationId}"
    val pC = s"${pM}_c"
    val vecs = graft.Tables.embeddings(spark, dir)
    val built = VamanaIndex.build(vecs, params, numShards).persist()
    val n = built.count()
    VamanaIndex.save(built, params, pM)
    VamanaIndex.save(built, params, pC)
    built.unpersist()
    val dels = vecs.select($"vec_id").as[Long].collect().filter(_ % delMod == 0)
    StreamingIndex.delete(spark, pM, dels.toSeq)
    StreamingIndex.delete(spark, pC, dels.toSeq)
    System.err.println(s"[profile-merge] n=$n shards=$numShards deleted=${dels.length}")

    def wall[T](tag: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); f
      System.err.println(f"[profile-merge] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    wall("merge")(StreamingIndex.merge(spark, pM, params))
    wall("compact")(StreamingIndex.compact(spark, pC, params, numShards))

    // recall@10 of both results on the live query subset vs exact truth
    val delSet = dels.toSet
    val all = vecs.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().filter { case (id, _) => !delSet(id) }
    val qs = all.filter(_._1 % 50 == 1).sortBy(_._1).take(200)
    def recallOf(path: String): Double = {
      val served = StreamingIndex.searchLive(spark, path, qs.map(q => (q._1, q._2)),
          10, 64, params)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      qs.map { case (qid, qv) =>
        val exact = all.map { case (id, v) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < v.length) { dot += qv(i) * v(i); na += qv(i) * qv(i); nb += v(i) * v(i); i += 1 }
          (id, 1.0 - dot / math.max(math.sqrt(na * nb), java.lang.Double.MIN_NORMAL))
        }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
        (exact & served.getOrElse(qid, Set.empty)).size / 10.0
      }.sum / qs.length
    }
    System.err.println(f"[profile-merge] recall merge=${recallOf(pM)}%.3f compact=${recallOf(pC)}%.3f")
    Seq(pM, pC).foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    spark.stop()
  }
}
