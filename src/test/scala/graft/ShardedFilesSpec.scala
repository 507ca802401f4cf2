package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{MmapIndex, SingleFileIndex, VamanaIndex, VamanaParams}

/** Sharded-files serving tier: one reference-layout file per shard +
  * a routing manifest, written task-locally (no driver streaming).
  * The tier must return IDENTICAL rows to the in-memory parquet tier
  * — same routing rule, same entry points, same distances — at both
  * all-shard and probed configurations. */
class ShardedFilesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val params = VamanaParams(maxDegree = 16, buildBeamWidth = 32, metric = "cosine")
  private val dir = "/tmp/graft_sharded_tier"

  private lazy val idx = {
    val vecs = Tables.embeddings(spark, SparkSpecBase.sf001)
    val built = VamanaIndex.build(vecs, params, numShards = 4).cache()
    built.count()
    SingleFileIndex.exportSharded(built, params, dir)
    built
  }

  private lazy val queries = Tables.embeddings(spark, SparkSpecBase.sf001)
    .filter($"vec_id" % 100 === 0)
    .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().sortBy(_._1)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
    df.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("export writes one parseable file per shard plus a manifest") {
    idx // force export
    val man = SingleFileIndex.readManifest(spark, dir)
    assert(man.length == 4)
    man.foreach { case (shard, file, seed) =>
      assert(Files.exists(Paths.get(s"$dir/$file")), s"missing $file")
      val meta = SingleFileIndex.readMeta(s"$dir/$file")
      assert(meta.elemSize == 4 && meta.dim == 64)
      assert(meta.medoidId >= 0 && meta.medoidId < meta.numVectors)
      assert(seed.length == 64, s"shard $shard seed")
      // shard ids are sparse within a shard → sidecar must exist and
      // the file must serve standalone
      val mm = new MmapIndex(s"$dir/$file")
      try assert(mm.n == meta.numVectors) finally mm.close()
    }
    // manifest n sums to the corpus
    assert(man.map(m => SingleFileIndex.readMeta(s"$dir/${m._2}").numVectors).sum ==
      Tables.embeddings(spark, SparkSpecBase.sf001).count())
  }

  test("all-shard file serving == in-memory search, row for row") {
    val qdf = queries.toSeq.toDF("q_id", "qv")
    val files = rows(SingleFileIndex.serveSharded(qdf, dir, k = 5, beamWidth = 32))
    val mem = rows(VamanaIndex.search(idx, queries, 5, 32, params))
    assert(files == mem,
      s"first diff: ${files.zip(mem).find { case (a, b) => a != b }}")
  }

  test("probed file serving == in-memory probed search (same routing rule)") {
    val qdf = queries.toSeq.toDF("q_id", "qv")
    val files = rows(SingleFileIndex.serveSharded(qdf, dir, k = 5, beamWidth = 32, nprobe = 2))
    val mem = rows(VamanaIndex.searchProbed(idx, queries, 5, 32, params, nprobe = 2,
      routing = Some(VamanaIndex.routingTable(idx))))
    assert(files == mem,
      s"first diff: ${files.zip(mem).find { case (a, b) => a != b }}")
  }
}
