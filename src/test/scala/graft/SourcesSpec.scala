package graft

import graft.sources.AnnHdf5

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.index.{StreamingIndex, VamanaIndex, VamanaParams}
import graft.sources.VecsFormats

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("fvecs round-trip is byte-lossless and preserves order") {
    val src = Tables.embeddings(spark, SparkSpecBase.sf001)
    val path = "/tmp/graft_spec.fvecs"
    VecsFormats.writeFvecs(src, path)
    val back = VecsFormats.readFvecs(spark, path)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val orig = src.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(back.length == orig.length)
    back.zip(orig).foreach { case ((ri, rv), (oi, ov)) =>
      assert(ri == oi && rv.sameElements(ov))
    }
  }

  test("bvecs and ivecs read fixed-record files") {
    // hand-write a 2-record bvecs (dim 3) and ivecs (dim 2) file
    val b = java.nio.ByteBuffer.allocate(2 * 7).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(3).put(1.toByte).put(200.toByte).put(255.toByte)
    b.putInt(3).put(0.toByte).put(5.toByte).put(9.toByte)
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_spec.bvecs"), b.array())
    val bv = VecsFormats.readBvecs(spark, "/tmp/graft_spec.bvecs")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(bv(0)._2.sameElements(Array(1f, 200f, 255f)) && bv(1)._2.sameElements(Array(0f, 5f, 9f)))

    val iv = java.nio.ByteBuffer.allocate(2 * 12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    iv.putInt(2).putInt(7).putInt(42).putInt(2).putInt(-1).putInt(0)
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_spec.ivecs"), iv.array())
    val ivr = VecsFormats.readIvecs(spark, "/tmp/graft_spec.ivecs")
      .as[(Long, Array[Int])].collect().sortBy(_._1)
    assert(ivr(0)._2.sameElements(Array(7, 42)) && ivr(1)._2.sameElements(Array(-1, 0)))
  }

  test("bvecs u8 round-trip is byte-true with no float widening") {
    // quantize the test embeddings into genuine u8 payloads
    val codes = Tables.embeddings(spark, SparkSpecBase.sf001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id, v.map(x => (math.round(math.max(-1f, math.min(1f, x)) * 127) + 128).toByte))
      }
      .toDF("vec_id", "codes")
    val path = "/tmp/graft_spec_u8.bvecs"
    VecsFormats.writeBvecs(codes, path)
    val back = VecsFormats.readBvecsU8(spark, path)
    // schema carries bytes, not floats
    assert(back.schema("codes").dataType == org.apache.spark.sql.types.BinaryType)
    val b = back.as[(Long, Array[Byte])].collect().sortBy(_._1)
    val o = codes.as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(b.length == o.length && b.nonEmpty)
    b.zip(o).foreach { case ((ri, rv), (oi, ov)) =>
      assert(ri == oi && rv.sameElements(ov))
    }
  }

  test("streaming ingest: index grows per batch and stays queryable") {
    val dir = "/tmp/graft_stream_idx"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    implicit val sqlCtx = spark.sqlContext
    val params = VamanaParams(maxDegree = 8, buildBeamWidth = 16, metric = "l2")
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingIndex.ingest(mem.toDS().toDF("vec_id", "embedding"), dir, params)
    mem.addData((1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(0f, 1f)))
    q.processAllAvailable()
    // even BATCH 0 must land in the segment tier's shard-id space —
    // an unshifted first batch would write shard 0..k-1, colliding
    // with a pre-existing main tier (absorbSegments/maintain contract)
    VamanaIndex.load(spark, dir).collect().foreach(r =>
      assert(r.shard >= StreamingIndex.ShardsPerBatchBase,
        s"ingested row ${r.vec_id} landed at main-tier shard ${r.shard}"))
    val n1 = VamanaIndex.load(spark, dir).count()
    mem.addData((4L, Array(5f, 5f)), (5L, Array(6f, 5f)))
    q.processAllAvailable()
    q.stop()
    val idx = VamanaIndex.load(spark, dir)
    assert(n1 == 3 && idx.count() == 5)
    val nn = VamanaIndex.search(idx, Array((99L, Array(5.1f, 5f))), 2, 8, params)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect()
    assert(nn.sameElements(Array(4L, 5L)), nn.toSeq.toString)

    // compaction: merge the two streaming segments into one shard and
    // verify the index still answers identically
    StreamingIndex.compact(spark, dir, params, numShards = 1)
    val compacted = VamanaIndex.load(spark, dir)
    assert(compacted.count() == 5)
    assert(compacted.select($"shard").distinct().count() == 1)
    val nn2 = VamanaIndex.search(compacted, Array((99L, Array(5.1f, 5f))), 2, 8, params)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect()
    assert(nn2.sameElements(Array(4L, 5L)), nn2.toSeq.toString)
  }

  test("streaming query serving answers against the on-disk index per batch") {
    val idxDir = "/tmp/graft_serve_idx"
    val outDir = "/tmp/graft_serve_out"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    implicit val sqlCtx = spark.sqlContext
    val params = VamanaParams(maxDegree = 8, buildBeamWidth = 16, metric = "l2")
    val vecs = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(0f, 1f)),
      (4L, Array(5f, 5f))).toDF("vec_id", "embedding")
    VamanaIndex.save(VamanaIndex.build(vecs, params, 1), params, idxDir)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingIndex.serveQueries(mem.toDS().toDF("q_id", "qv"),
      idxDir, outDir, params, k = 2, beamWidth = 8)
    mem.addData((100L, Array(0.1f, 0f)))
    q.processAllAvailable()
    mem.addData((200L, Array(4.9f, 5f)))
    q.processAllAvailable(); q.stop()
    val res = spark.read.parquet(outDir)
      .select($"q_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
      .collect().sorted
    assert(res.toSeq == Seq((100L, 1, 1L), (100L, 2, 2L), (200L, 1, 4L), (200L, 2, 3L)),
      res.toSeq.toString)
  }

  test("ann-benchmarks HDF5: write → parse → distributed read round-trips all datasets") {
    val path = "/tmp/graft_ann_spec.hdf5"
    val train = Array.tabulate(37, 5)((r, c) => (r * 10 + c).toFloat / 7f)
    val test = Array.tabulate(4, 5)((r, c) => (r - c).toFloat)
    val neighbors = Array.tabulate(4, 3)((r, c) => (r * 3 + c).toLong)
    val distances = Array.tabulate(4, 3)((r, c) => r * 0.5f + c)
    AnnHdf5.write(path, Seq(
      AnnHdf5.FloatMatrix.of("train", train),
      AnnHdf5.FloatMatrix.of("test", test),
      AnnHdf5.LongMatrix.of("neighbors", neighbors),
      AnnHdf5.FloatMatrix.of("distances", distances)))

    val metas = AnnHdf5.listDatasets(spark, path)
    assert(metas.keySet == Set("train", "test", "neighbors", "distances"))
    assert(metas("train").rows == 37 && metas("train").cols == 5)
    assert(metas("train").kind == 'f' && metas("train").elemSize == 4)
    assert(metas("neighbors").kind == 'i' && metas("neighbors").elemSize == 8)

    val gotTrain = AnnHdf5.readFloatMatrix(spark, path, "train")
      .orderBy("vec_id").as[(Long, Array[Float])].collect()
    assert(gotTrain.length == 37)
    gotTrain.foreach { case (id, row) => assert(row.sameElements(train(id.toInt))) }

    val gotNbrs = AnnHdf5.readIntMatrix(spark, path, "neighbors")
      .orderBy("query_id").as[(Long, Array[Long])].collect()
    gotNbrs.foreach { case (id, row) => assert(row.sameElements(neighbors(id.toInt))) }

    // the file signature is the HDF5 magic — any conformant tool
    // recognizes it
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)).take(8)
    assert(head.sameElements(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')))

    // wrong-kind access and unknown datasets fail loudly
    intercept[Exception](AnnHdf5.readFloatMatrix(spark, path, "neighbors"))
    intercept[Exception](AnnHdf5.readFloatMatrix(spark, path, "nope"))
  }

  test("HDF5 superblock v2/v3 (newer h5py) fails loudly, not a silent mis-parse") {
    // the v2/v3 superblock keeps the version byte at offset 8 (spec
    // III.A.2), so the v0 parser must detect it and name the version
    // instead of walking v0 field offsets into garbage
    for (version <- Seq(2.toByte, 3.toByte)) {
      val p = s"/tmp/graft_ann_spec_v$version.hdf5"
      val bytes = new Array[Byte](96)
      val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
      System.arraycopy(sig, 0, bytes, 0, 8)
      bytes(8) = version
      java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes)
      val e = intercept[IllegalArgumentException](AnnHdf5.listDatasets(spark, p))
      assert(e.getMessage.contains(s"superblock v$version"),
        s"error must name the unsupported version: ${e.getMessage}")
    }
    // and a non-HDF5 file is rejected on the signature, before version
    val junk = "/tmp/graft_ann_spec_junk.hdf5"
    java.nio.file.Files.write(java.nio.file.Paths.get(junk), new Array[Byte](96))
    val e = intercept[IllegalArgumentException](AnnHdf5.listDatasets(spark, junk))
    assert(e.getMessage.contains("not an HDF5 file"))
  }
}
