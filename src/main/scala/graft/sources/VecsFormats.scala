package graft.sources

import java.io.{BufferedOutputStream, DataInputStream, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Readers/writers for the classic ANN benchmark vector formats the
  * reference's examples consume (examples/bigann.rs, diskann_sift.rs:
  * SIFT/BigANN distributions): `.fvecs` (float32), `.bvecs` (uint8),
  * `.ivecs` (int32 — ground-truth neighbor lists). Record layout:
  * little-endian `dim:int32` then `dim` values; uniform dim per file.
  *
  * Reads are distributed: the fixed record length lets
  * `binaryRecords` split the file across executors, and
  * `zipWithIndex` assigns the file-order row ids the formats imply.
  * Writers stream through `toLocalIterator` (export utility — the
  * at-scale interchange format is parquet; these exist for reference
  * interop).
  */
object VecsFormats {

  /** Read the 4-byte dim header through the Hadoop FileSystem API so
    * non-local URIs (hdfs://, s3a://) work the same as the distributed
    * binaryRecords read that follows. */
  private def headerDim(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val b = new Array[Byte](4)
      in.readFully(0L, b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
    } finally in.close()
  }

  /** The shared record scaffolding all four readers ride: fixed-length
    * `binaryRecords` split + file-order `zipWithIndex` ids + the
    * per-record uniform-dim check, parameterized only by element width
    * and decode. One definition, so a framing fix (error text, id
    * assignment) can never be applied to three of four formats. */
  private def readRecords[T](spark: SparkSession, path: String, elemBytes: Int)(
      decode: (ByteBuffer, Int) => T): org.apache.spark.rdd.RDD[(Long, T)] = {
    val dim = headerDim(spark, path)
    val recLen = 4 + elemBytes * dim
    spark.sparkContext.binaryRecords(path, recLen)
      .zipWithIndex()
      .map { case (bytes, idx) =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val d = bb.getInt
        require(d == dim, s"non-uniform dim: $d vs $dim at record $idx")
        (idx, decode(bb, dim))
      }
  }

  /** `.fvecs` → (vec_id: long, embedding: array<float>). */
  def readFvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readRecords(spark, path, elemBytes = 4) { (bb, dim) =>
      val arr = new Array[Float](dim)
      var i = 0
      while (i < dim) { arr(i) = bb.getFloat; i += 1 }
      arr
    }.toDF("vec_id", "embedding")
  }

  /** `.bvecs` (uint8 vectors, e.g. BigANN) → embedding as floats. */
  def readBvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readRecords(spark, path, elemBytes = 1) { (bb, dim) =>
      val arr = new Array[Float](dim)
      var i = 0
      while (i < dim) { arr(i) = (bb.get() & 0xff).toFloat; i += 1 }
      arr
    }.toDF("vec_id", "embedding")
  }

  /** `.bvecs` → (vec_id: long, codes: binary) with NO float widening:
    * the u8 payload stays one byte per slot end to end (reference
    * examples/bigann.rs reads BigANN .bvecs as native u8) — at 100 TB
    * the 4× scan-volume difference vs widened f32 is the point.
    * Pair with integer-arithmetic distances (see
    * [[graft.operators.VectorQueries.qKnnU8]]) or the u8 single-file
    * export path. */
  def readBvecsU8(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readRecords(spark, path, elemBytes = 1) { (bb, dim) =>
      val arr = new Array[Byte](dim)
      bb.get(arr)
      arr
    }.toDF("vec_id", "codes")
  }

  /** Export (vec_id, codes: binary) as `.bvecs` in vec_id order —
    * byte-true inverse of [[readBvecsU8]]. */
  def writeBvecs(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    try {
      df.select("vec_id", "codes").orderBy("vec_id")
        .as[(Long, Array[Byte])].toLocalIterator().forEachRemaining { case (_, v) =>
          val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          bb.putInt(v.length)
          out.write(bb.array())
          out.write(v)
        }
    } finally out.close()
  }

  /** `.ivecs` (int lists — ground-truth neighbors) →
    * (query_id: long, neighbors: array<int>). */
  def readIvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readRecords(spark, path, elemBytes = 4) { (bb, dim) =>
      val arr = new Array[Int](dim)
      var i = 0
      while (i < dim) { arr(i) = bb.getInt; i += 1 }
      arr
    }.toDF("query_id", "neighbors")
  }

  /** DISTRIBUTED `.fvecs` export: one shard file per task, written in
    * parallel straight from the executors — the scale path the
    * single-file [[writeFvecs]] (a driver-side `toLocalIterator`
    * stream, kept for byte-true single-file interop) cannot be.
    *
    * Shards are `part-%05d.fvecs`, range-partitioned and sorted by
    * `vec_id`, so LEXICAL FILENAME ORDER == GLOBAL vec_id ORDER —
    * exactly the order in which the DSv2 multi-file reader
    * ([[VecsDataSourceBase]]) assigns positional ids on read-back.
    * Empty range partitions (possible under skewed sampling) are
    * skipped rather than emitted as headerless zero-byte files; the
    * order argument is unaffected because skipping never reorders.
    *
    * Re-run safe and attempt safe: the target dir's stale
    * `part-*.fvecs` are deleted up front (range boundaries are
    * sampled, so a re-run can produce a DIFFERENT empty-partition
    * set — a leftover shard from a previous run would silently fold
    * into the positional-id read-back), and each task writes a
    * task-attempt temp file renamed into place on success, so a
    * speculative duplicate attempt never interleaves bytes into the
    * final path (per-partition content is deterministic; whichever
    * attempt renames last wins with identical bytes).
    * Returns (shard file, records) in shard order. */
  def writeFvecsSharded(df: DataFrame, dir: String, shards: Int): Seq[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    writeSharded[Array[Float]](df, "embedding", dir, shards, "fvecs") { v =>
      val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      v.foreach(bb.putFloat)
      bb.array()
    }
  }

  /** DISTRIBUTED `.bvecs` export of (vec_id, codes: binary) — the
    * sharded twin of [[writeBvecs]], same contract as
    * [[writeFvecsSharded]]: native u8 end to end, no float widening. */
  def writeBvecsSharded(df: DataFrame, dir: String, shards: Int): Seq[(String, Long)] =
    writeSharded[Array[Byte]](df, "codes", dir, shards, "bvecs")(
      { v =>
        val bb = ByteBuffer.allocate(4 + v.length).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(v.length)
        bb.put(v)
        bb.array()
      })(org.apache.spark.sql.Encoders.BINARY)

  private def writeSharded[T: org.apache.spark.sql.Encoder](df: DataFrame, payloadCol: String,
      dir: String, shards: Int, ext: String)(encode: T => Array[Byte]): Seq[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = org.apache.spark.sql.graft.bridge
      .serializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    val rootFs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    rootFs.mkdirs(root)
    // extension-BLIND pre-clean: the DSv2 directory reader lists all
    // children, so a stale shard of another format (fvecs written,
    // then bvecs into the same dir) would fold into the positional
    // read-back just as silently as a same-format leftover; dot-named
    // attempt temps leaked by a hard task death are swept too
    Seq("part-*", ".part-*").foreach { pat =>
      Option(rootFs.globStatus(new org.apache.hadoop.fs.Path(root, pat)))
        .foreach(_.foreach(st => rootFs.delete(st.getPath, false)))
    }
    implicit val pairEnc: org.apache.spark.sql.Encoder[(Long, T)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        implicitly[org.apache.spark.sql.Encoder[T]])
    df.select(col("vec_id"), col(payloadCol)).as[(Long, T)]
      .repartitionByRange(shards, $"vec_id")
      .sortWithinPartitions($"vec_id")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val fin = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.$ext")
          // Hadoop-convention DOT-prefixed temp: a hard task death
          // (executor kill — the in-JVM catch below never runs) leaks
          // the attempt file, and the DSv2 reader's hidden-file filter
          // ([[graft.sources.VecsScanBuilder.resolveFiles]]) must skip
          // it rather than fold it into the positional-id space
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f".part-$pid%05d.$ext.attempt-${tc.taskAttemptId()}")
          val fs = fin.getFileSystem(org.apache.spark.sql.graft.bridge.hadoopConfOf(conf))
          val out = new BufferedOutputStream(fs.create(tmp, true), 1 << 20)
          var n = 0L
          try {
            it.foreach { case (_, v) => out.write(encode(v)); n += 1 }
          } catch {
            case e: Throwable => out.close(); fs.delete(tmp, false); throw e
          }
          out.close()
          // Commit without a delete-then-rename absence window: a
          // speculative duplicate attempt produces IDENTICAL bytes
          // (per-partition content is deterministic), so if the final
          // file already exists at the expected length the sibling
          // already committed — drop the temp. Otherwise rename with
          // OVERWRITE through FileContext, which replaces atomically
          // where the FS supports it; a concurrent directory reader
          // never observes a missing shard (shifted positional ids).
          val tmpLen = fs.getFileStatus(tmp).getLen
          if (fs.exists(fin) && fs.getFileStatus(fin).getLen == tmpLen) {
            fs.delete(tmp, false)
          } else {
            org.apache.hadoop.fs.FileContext.getFileContext(fin.toUri,
                org.apache.spark.sql.graft.bridge.hadoopConfOf(conf))
              .rename(tmp, fin, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          }
          Iterator.single((fin.toString, n))
        }
      }
      .collect().sortBy(_._1).toSeq
  }

  /** Export (query_id, neighbors: array<int>) as `.ivecs` in query_id
    * order — the ground-truth file format of the ANN benchmarks
    * (reference examples/diskann_sift.rs:58-98 scores recall against
    * exactly this layout). One record per query; on read-back the
    * record's identity is its file POSITION (rank of query_id), the
    * same positional convention as [[writeFvecs]]. The record header
    * is the LIST LENGTH (k), so mixed-k files round-trip only when k
    * is uniform — the readers enforce that like any other dim. */
  def writeIvecs(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    try {
      df.select("query_id", "neighbors").orderBy("query_id")
        .as[(Long, Array[Int])].toLocalIterator().forEachRemaining { case (_, v) =>
          val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
          bb.putInt(v.length)
          v.foreach(bb.putInt)
          out.write(bb.array())
        }
    } finally out.close()
  }

  /** Export (vec_id, embedding) as `.fvecs` in vec_id order. */
  def writeFvecs(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    try {
      df.select("vec_id", "embedding").orderBy("vec_id")
        .as[(Long, Array[Float])].toLocalIterator().forEachRemaining { case (_, v) =>
          val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
          bb.putInt(v.length)
          v.foreach(bb.putFloat)
          out.write(bb.array())
        }
    } finally out.close()
  }
}
