package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VecsFormats

/** The DataSource V2 face of the vecs formats:
  * `spark.read.format("fvecs"/"bvecs"/"ivecs")` — short-name service
  * registration, record-aligned splitting, file-order ids across
  * multiple files, column pruning, and agreement with the
  * [[VecsFormats]] function readers. */
class VecsDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark

  private def writeFvecsFile(path: String, vecs: Seq[Array[Float]]): Unit = {
    val bb = ByteBuffer.allocate(vecs.map(v => 4 + 4 * v.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    vecs.foreach { v => bb.putInt(v.length); v.foreach(bb.putFloat) }
    Files.write(Paths.get(path), bb.array())
  }

  test("fvecs: short name resolves; content matches the function reader and the source table") {
    import spark.implicits._
    val src = Tables.embeddings(spark, SparkSpecBase.sf001)
    val path = "/tmp/graft_dsv2.fvecs"
    VecsFormats.writeFvecs(src, path)

    val viaDsv2 = spark.read.format("fvecs").load(path)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val viaFn = VecsFormats.readFvecs(spark, path)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(viaDsv2.length === viaFn.length)
    viaDsv2.zip(viaFn).foreach { case ((ida, va), (idb, vb)) =>
      assert(ida === idb); assert(va.toSeq === vb.toSeq)
    }
    // and ids are positional over the vec_id-ordered export
    val orig = src.orderBy("vec_id").select("embedding").as[Array[Float]].collect()
    assert(viaDsv2.head._2.toSeq === orig.head.toSeq)
  }

  test("fvecs: maxBytesPerPartition splits the scan record-aligned with ids intact") {
    import spark.implicits._
    val vecs = (0 until 100).map(i => Array.tabulate(8)(j => (i * 8 + j).toFloat))
    val path = "/tmp/graft_dsv2_split.fvecs"
    writeFvecsFile(path, vecs)
    // 36-byte records; 100 bytes/partition → 2 records per split
    val df = spark.read.format("fvecs").option("maxBytesPerPartition", "100").load(path)
    assert(df.rdd.getNumPartitions === 50)
    val rows = df.as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L until 100L))
    rows.foreach { case (id, v) => assert(v.toSeq === vecs(id.toInt).toSeq) }
  }

  test("fvecs: multiple files in one directory get file-order ids (lexical path order)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_multi").toString
    writeFvecsFile(s"$dir/part-00.fvecs", Seq(Array(0f, 0f), Array(1f, 1f)))
    writeFvecsFile(s"$dir/part-01.fvecs", Seq(Array(2f, 2f), Array(3f, 3f), Array(4f, 4f)))
    val rows = spark.read.format("fvecs").load(dir)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L until 5L))
    assert(rows.map(_._2.head.toLong).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("fvecs: multi-path load(p1, p2) concatenates in lexical path order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_multipath").toString
    writeFvecsFile(s"$dir/b.fvecs", Seq(Array(2f, 2f)))
    writeFvecsFile(s"$dir/a.fvecs", Seq(Array(0f, 0f), Array(1f, 1f)))
    // passed b-then-a: ids must still follow LEXICAL order, not
    // argument order — the same rule the directory listing uses
    val rows = spark.read.format("fvecs").load(s"$dir/b.fvecs", s"$dir/a.fvecs")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(rows.map(_._2.head.toLong).toSeq === Seq(0L, 1L, 2L))
  }

  test("fvecs: column pruning reaches the reader (payload never decoded)") {
    val path = "/tmp/graft_dsv2_prune.fvecs"
    writeFvecsFile(path, (0 until 10).map(_ => Array(1f, 2f, 3f)))
    val pruned = spark.read.format("fvecs").load(path).select("vec_id")
    // the V2 scan's readSchema after pruning is what explain prints
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("vec_id"))
    assert(!plan.contains("embedding"), s"payload column survived pruning:\n$plan")
    assert(pruned.count() === 10)
  }

  test("bvecs: native u8 binary by default, float-widened with widen=true") {
    import spark.implicits._
    val codes = (0 until 6).map(i => Array.tabulate(4)(j => ((i * 40 + j * 7) % 256).toByte))
    val path = "/tmp/graft_dsv2.bvecs"
    val df = codes.zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("vec_id", "codes")
    VecsFormats.writeBvecs(df, path)

    val nat = spark.read.format("bvecs").load(path)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    nat.foreach { case (id, c) => assert(c.toSeq === codes(id.toInt).toSeq) }

    val wide = spark.read.format("bvecs").option("widen", "true").load(path)
    assert(wide.schema.fieldNames.toSeq === Seq("vec_id", "embedding"))
    wide.as[(Long, Array[Float])].collect().foreach { case (id, v) =>
      assert(v.toSeq === codes(id.toInt).map(b => (b & 0xff).toFloat).toSeq)
    }
  }

  test("ivecs: ground-truth lists with query_id ids") {
    import spark.implicits._
    val lists = Seq(Array(5, 9, 2), Array(7, 1, 3))
    val bb = ByteBuffer.allocate(2 * (4 + 12)).order(ByteOrder.LITTLE_ENDIAN)
    lists.foreach { l => bb.putInt(3); l.foreach(bb.putInt) }
    val path = "/tmp/graft_dsv2.ivecs"
    Files.write(Paths.get(path), bb.array())
    val rows = spark.read.format("ivecs").load(path)
      .as[(Long, Array[Int])].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0L, 1L))
    assert(rows.map(_._2.toSeq) === lists.map(_.toSeq))
  }

  test("sharded distributed export round-trips through the DSv2 reader in global id order") {
    import spark.implicits._
    val src = Tables.embeddings(spark, SparkSpecBase.sf001)
    val dir = Files.createTempDirectory("graft_dsv2_shards").toString
    val shards = VecsFormats.writeFvecsSharded(src, dir, shards = 4)
    assert(shards.nonEmpty && shards.map(_._2).sum === src.count())
    // lexical shard order must equal global vec_id order: read-back
    // positional ids reproduce the vec_id-rank of the source exactly
    val back = spark.read.format("fvecs").load(dir)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val expect = src.orderBy("vec_id").select("embedding").as[Array[Float]].collect()
    assert(back.length === expect.length)
    assert(back.map(_._1).toSeq === back.indices.map(_.toLong))
    back.zip(expect).foreach { case ((_, v), e) => assert(v.toSeq === e.toSeq) }
  }

  test("hidden files (leaked attempt temps, _SUCCESS) are skipped by the directory reader") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_hidden").toString
    writeFvecsFile(s"$dir/part-00000.fvecs", Seq(Array(0f, 0f), Array(1f, 1f)))
    writeFvecsFile(s"$dir/part-00001.fvecs", Seq(Array(2f, 2f)))
    // a leaked task-attempt temp (hard task death skips the in-JVM
    // cleanup) and foreign-tooling markers must NOT enter the
    // positional-id space — folding one in would duplicate vectors
    // and shift every later id silently
    writeFvecsFile(s"$dir/.part-00001.fvecs.attempt-7", Seq(Array(9f, 9f)))
    Files.write(Paths.get(s"$dir/_SUCCESS"), Array.emptyByteArray)
    val rows = spark.read.format("fvecs").load(dir)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(rows.map(_._2.head.toLong).toSeq === Seq(0L, 1L, 2L))
  }

  test("a directory with nested subdirectories is refused, not silently skipped") {
    val dir = Files.createTempDirectory("graft_dsv2_nested")
    writeFvecsFile(s"$dir/a.fvecs", Seq(Array(1f, 2f)))
    Files.createDirectory(dir.resolve("nested"))
    val e = intercept[Exception] { spark.read.format("fvecs").load(dir.toString).count() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("subdirectories")), s"unexpected: $e")
  }

  test("a garbage dim header fails loudly at planning") {
    val path = "/tmp/graft_dsv2_baddim.fvecs"
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(-1); bb.putInt(42)
    Files.write(Paths.get(path), bb.array())
    val e = intercept[Exception] { spark.read.format("fvecs").load(path).count() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bad dim header")), s"unexpected: $e")
  }

  test("writeIvecs ground-truth lists round-trip through the ivecs DSv2 reader") {
    import spark.implicits._
    val lists = Seq(
      (7L, Array(3, 1, 4)), (2L, Array(1, 5, 9)), (11L, Array(2, 6, 5)))
    val path = "/tmp/graft_ivecs_rt.ivecs"
    graft.sources.VecsFormats.writeIvecs(lists.toDF("query_id", "neighbors"), path)
    val back = spark.read.format("ivecs").load(path)
      .as[(Long, Array[Int])].collect().sortBy(_._1)
    // read-back ids are positional over the query_id-ORDERED export
    // (2 < 7 < 11), and neighbor lists survive byte-exact in order
    assert(back.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(back(0)._2.toSeq === Seq(1, 5, 9))   // query_id 2
    assert(back(1)._2.toSeq === Seq(3, 1, 4))   // query_id 7
    assert(back(2)._2.toSeq === Seq(2, 6, 5))   // query_id 11
    // a mixed-k file cannot round-trip: the record header is the list
    // length, and the readers enforce one uniform dim per file
    graft.sources.VecsFormats.writeIvecs(
      Seq((0L, Array(1, 2, 3)), (1L, Array(4, 5))).toDF("query_id", "neighbors"),
      "/tmp/graft_ivecs_mixed.ivecs")
    val e = intercept[Exception] {
      spark.read.format("ivecs").load("/tmp/graft_ivecs_mixed.ivecs").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("records") || m.contains("dim")), e.toString)
  }

  test("sharded u8 export round-trips native binary codes through the DSv2 reader") {
    import spark.implicits._
    val codes = (0 until 40).map(i => (i.toLong, Array.tabulate(8)(j => ((i * 13 + j) % 256).toByte)))
    val dir = Files.createTempDirectory("graft_dsv2_bshards").toString
    val shards = VecsFormats.writeBvecsSharded(codes.toDF("vec_id", "codes"), dir, shards = 3)
    assert(shards.map(_._2).sum === 40L)
    val back = spark.read.format("bvecs").load(dir)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(back.length === 40)
    back.foreach { case (id, c) => assert(c.toSeq === codes(id.toInt)._2.toSeq) }
  }

  test("sharded export re-run with fewer shards leaves no stale part files behind") {
    import spark.implicits._
    val src = Tables.embeddings(spark, SparkSpecBase.sf001)
    val dir = Files.createTempDirectory("graft_dsv2_rerun").toString
    VecsFormats.writeFvecsSharded(src, dir, shards = 6)
    VecsFormats.writeFvecsSharded(src, dir, shards = 2)
    // a leftover part-00003+ from the first run would fold duplicate
    // vectors into the positional-id read-back
    val back = spark.read.format("fvecs").load(dir).count()
    assert(back === src.count())
  }

  test("seeded random shapes: dim/count/split/shard combinations all round-trip with exact ids") {
    import spark.implicits._
    // deterministic LCG over (dim, count, splitBytes, nFiles) shapes —
    // covers 1-record files, dim 1, splits that don't divide evenly,
    // and multi-file boundaries in one sweep
    var seed = 0x9e3779b97f4a7c15L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (case_ <- 0 until 12) {
      val dim = 1 + nextInt(17)
      val nFiles = 1 + nextInt(3)
      val dir = Files.createTempDirectory(s"graft_dsv2_prop$case_").toString
      val all = Seq.newBuilder[Array[Float]]
      var id = 0
      for (f <- 0 until nFiles) {
        val count = 1 + nextInt(40)
        val vecs = (0 until count).map { _ =>
          val v = Array.tabulate(dim)(j => (id * 31 + j).toFloat); id += 1; v
        }
        all ++= vecs
        writeFvecsFile(f"$dir/part-$f%02d.fvecs", vecs)
      }
      val recLen = 4 + 4 * dim
      val splitBytes = recLen * (1 + nextInt(7)) + nextInt(recLen) // may not divide evenly
      val rows = spark.read.format("fvecs")
        .option("maxBytesPerPartition", splitBytes.toString).load(dir)
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val expect = all.result()
      assert(rows.length === expect.length, s"case $case_ dim $dim files $nFiles")
      rows.foreach { case (rid, v) =>
        assert(v.toSeq === expect(rid.toInt).toSeq, s"case $case_ id $rid")
      }
    }
  }

  test("a truncated file fails loudly at planning, not with silent row loss") {
    val path = "/tmp/graft_dsv2_trunc.fvecs"
    writeFvecsFile(path, Seq(Array(1f, 2f), Array(3f, 4f)))
    val full = Files.readAllBytes(Paths.get(path))
    Files.write(Paths.get(path), java.util.Arrays.copyOf(full, full.length - 3))
    val e = intercept[Exception] {
      spark.read.format("fvecs").load(path).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("truncated")), s"unexpected: $e")
  }
}
