package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connectors for the classic ANN vector formats, so the
  * reference's benchmark files are first-class Spark sources:
  *
  * {{{
  *   spark.read.format("fvecs").load("sift_base.fvecs")       // vec_id, embedding: array<float>
  *   spark.read.format("bvecs").load("bigann_base.bvecs")     // vec_id, codes: binary (native u8)
  *   spark.read.format("bvecs").option("widen", "true").load(…) // vec_id, embedding: array<float>
  *   spark.read.format("ivecs").load("sift_groundtruth.ivecs") // query_id, neighbors: array<int>
  * }}}
  *
  * Same record layout as [[VecsFormats]] (little-endian `dim:int32`
  * then `dim` fixed-width values — examples/bigann.rs,
  * diskann_sift.rs): the uniform record length is what makes the scan
  * distributable. Each file is split into record-aligned ranges of
  * `spark.sql.files.maxPartitionBytes` (overridable with
  * `.option("maxBytesPerPartition", …)`), so one 100 GB .bvecs fans
  * out across the cluster instead of serializing through one task.
  * Row ids are the global record index in file order (multiple files
  * are ordered by path, matching a lexically-named shard set);
  * per-record dim headers are verified against the file header like
  * `VecsFormats.readRecords`. Column pruning is pushed into the
  * reader: a `select(vec_id)` never decodes payload bytes (the seek
  * is still linear — records are contiguous — but the per-element
  * decode and array allocation drop out).
  *
  * Read-only by design: the formats are single ordered files, so the
  * export side stays the explicit utilities
  * ([[VecsFormats.writeFvecs]]/[[VecsFormats.writeBvecs]]) rather
  * than pretending a distributed `save()` exists.
  */
abstract class VecsDataSourceBase extends TableProvider with DataSourceRegister {
  /** Bytes per element in the on-disk record payload. */
  def elemBytes: Int
  /** Full table schema for the given options. */
  def schemaFor(options: CaseInsensitiveStringMap): StructType

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = schemaFor(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new VecsTable(shortName(), schemaFor(opts), elemBytes, opts)
  }
}

class FvecsDataSource extends VecsDataSourceBase {
  override def shortName(): String = "fvecs"
  override def elemBytes: Int = 4
  override def schemaFor(options: CaseInsensitiveStringMap): StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
}

class BvecsDataSource extends VecsDataSourceBase {
  override def shortName(): String = "bvecs"
  override def elemBytes: Int = 1
  override def schemaFor(options: CaseInsensitiveStringMap): StructType = {
    // native u8 (binary) by default — the 4x-narrower scan is the
    // point of the format at scale; widen=true opts into float work
    val payload =
      if (options.getBoolean("widen", false))
        StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)
      else StructField("codes", BinaryType, nullable = false)
    StructType(Seq(StructField("vec_id", LongType, nullable = false), payload))
  }
}

class IvecsDataSource extends VecsDataSourceBase {
  override def shortName(): String = "ivecs"
  override def elemBytes: Int = 4
  override def schemaFor(options: CaseInsensitiveStringMap): StructType = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("neighbors", ArrayType(IntegerType, containsNull = false), nullable = false)))
}

private[sources] class VecsTable(format: String, tableSchema: StructType, elemBytes: Int,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"$format:${VecsTable.paths(options).mkString(",")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // scan-time options override table-construction options (today the
    // DataFrameReader path duplicates them; a catalog-registered table
    // would supply read options only here)
    val merged = new java.util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new VecsScanBuilder(format, tableSchema, elemBytes, new CaseInsensitiveStringMap(merged))
  }
}

private[sources] object VecsTable {
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).toSeq.flatMap { json =>
      // .load(p1, p2, …) arrives as a JSON-encoded string array
      org.json4s.jackson.JsonMethods.parse(json) match {
        case org.json4s.JArray(vs) => vs.collect { case org.json4s.JString(s) => s }
        case _ => Nil
      }
    }
    val single = Option(options.get("path")).toSeq
    val all = multi ++ single
    require(all.nonEmpty, "no path given — use spark.read.format(...).load(path)")
    all
  }
}

/** One record-aligned byte range of one file. `firstId` is the global
  * record index of the range's first record (file-order ids);
  * `inFileStartByte` is that record's byte offset within its file. */
private[sources] case class VecsInputPartition(path: String, dim: Int, recLen: Int,
    firstId: Long, numRecords: Long, inFileStartByte: Long) extends InputPartition

private[sources] class VecsScanBuilder(format: String, fullSchema: StructType, elemBytes: Int,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def description(): String = s"graft $format scan"
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val spark = SparkSession.active
      val conf = spark.sparkContext.hadoopConfiguration
      val targetBytes = Option(options.get("maxBytesPerPartition")).map(_.toLong)
        .getOrElse(spark.sessionState.conf.filesMaxPartitionBytes)
      // lexical path order defines the global id space, matching how a
      // sharded export names its parts
      val files = VecsScanBuilder.resolveFiles(conf, VecsTable.paths(options))
      // one 4-byte header probe per file, parallelized: a 100k-shard
      // corpus would otherwise serialize 100k driver round-trips here
      // (the same reason parquet reads footers concurrently)
      val dims = VecsScanBuilder.headerDims(conf, files.map(_._1))
      var nextId = 0L
      val parts = Array.newBuilder[InputPartition]
      files.zip(dims).foreach { case ((p, len), dim) =>
        // upper bound too: a corrupt huge header would wrap recLen.toInt
        // negative (NegativeArraySizeException far from the cause) or
        // allocate a multi-GB per-record buffer; fail here with the
        // same loud bad-dim diagnostic as dim <= 0
        require(dim > 0 && dim <= (Int.MaxValue - 4) / elemBytes,
          s"$p: bad dim header $dim — not a ${description()} file?")
        val recLen = 4L + elemBytes.toLong * dim
        require(len % recLen == 0,
          s"$p: length $len is not a whole number of $recLen-byte records — truncated file?")
        val nRecs = len / recLen
        val recsPerSplit = math.max(1L, targetBytes / recLen)
        var start = 0L
        while (start < nRecs) {
          val n = math.min(recsPerSplit, nRecs - start)
          parts += VecsInputPartition(p.toString, dim, recLen.toInt,
            nextId + start, n, start * recLen)
          start += n
        }
        nextId += nRecs
      }
      parts.result()
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val serConf = bridge.serializableHadoopConf(
        SparkSession.active.sparkContext.hadoopConfiguration)
      new VecsPartitionReaderFactory(format, required, elemBytes, serConf)
    }
  }
}

private[sources] object VecsScanBuilder {
  /** Hadoop hidden-file convention: `.`- and `_`-prefixed names are
    * tooling artifacts (task-attempt temps like
    * `.part-00003.fvecs.attempt-7` leaked by a hard task death,
    * `_SUCCESS` markers), never data. Treating one as a shard would
    * silently duplicate vectors and shift every later positional id —
    * the corruption class the nested-dir guard exists for. */
  private def isHidden(name: String): Boolean =
    name.startsWith(".") || name.startsWith("_")

  /** Expand files/dirs/globs to (file, length), lexically ordered.
    * Hidden (dot/underscore) children of a directory are skipped; an
    * EXPLICITLY named hidden file is still honored (the caller typed
    * the path — refusing it would be surprising). */
  def resolveFiles(conf: org.apache.hadoop.conf.Configuration,
      paths: Seq[String]): Seq[(Path, Long)] = {
    val all = paths.flatMap { s =>
      val p = new Path(s)
      val fs = p.getFileSystem(conf)
      val matched = Option(fs.globStatus(p)).map(_.toSeq)
        .getOrElse(throw new java.io.FileNotFoundException(s))
      require(matched.nonEmpty, s"no files match $s")
      matched.flatMap { st =>
        if (!st.isDirectory) Seq(st)
        else {
          val children = fs.listStatus(st.getPath).toSeq
            .filterNot(c => isHidden(c.getPath.getName))
          // ids are POSITIONAL: silently skipping a nested directory
          // would shift every later vector's id — refuse instead
          val dirs = children.filter(_.isDirectory)
          require(dirs.isEmpty,
            s"${st.getPath} contains subdirectories (${dirs.map(_.getPath.getName).mkString(", ")}); " +
              "vecs directories must be flat — positional ids cannot skip nested content silently")
          children
        }
      }
    }
    all.map(st => (st.getPath, st.getLen)).sortBy(_._1.toString)
  }

  def headerDim(conf: org.apache.hadoop.conf.Configuration, p: Path): Int = {
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val b = new Array[Byte](4)
      in.readFully(0L, b)
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    } finally in.close()
  }

  /** [[headerDim]] for many files on a bounded worker pool, input
    * order preserved. */
  def headerDims(conf: org.apache.hadoop.conf.Configuration, files: Seq[Path]): Seq[Int] = {
    if (files.lengthCompare(2) < 0) return files.map(headerDim(conf, _))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, files.length))
    try {
      import scala.jdk.CollectionConverters._
      val tasks: Seq[java.util.concurrent.Callable[Int]] =
        files.map(p => (() => headerDim(conf, p)): java.util.concurrent.Callable[Int])
      pool.invokeAll(tasks.asJava).asScala.toSeq.map(_.get())
    } finally pool.shutdown()
  }
}

private[sources] class VecsPartitionReaderFactory(format: String, required: StructType,
    elemBytes: Int, serConf: java.io.Serializable) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[VecsInputPartition]
    val conf = bridge.hadoopConfOf(serConf)
    val p = new Path(part.path)
    val fs = p.getFileSystem(conf)
    new VecsPartitionReader(format, required, elemBytes, part, fs.open(p))
  }
}

/** Sequential reader over one record range. Decodes only the columns
  * the scan requires. */
private[sources] class VecsPartitionReader(format: String, required: StructType, elemBytes: Int,
    part: VecsInputPartition, in: org.apache.hadoop.fs.FSDataInputStream)
    extends PartitionReader[InternalRow] {

  private val buf = new Array[Byte](part.recLen)
  private val bb = java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
  private var i = 0L
  private var row: InternalRow = _
  // buffered sequential reads after one seek: a bare FSDataInputStream
  // would pay a filesystem call per ~260-byte record
  private var data: java.io.DataInputStream = _

  override def next(): Boolean = {
    if (data == null) {
      in.seek(part.inFileStartByte)
      data = new java.io.DataInputStream(new java.io.BufferedInputStream(in, 1 << 20))
    }
    if (i >= part.numRecords) return false
    data.readFully(buf, 0, part.recLen)
    bb.position(0)
    val d = bb.getInt
    require(d == part.dim,
      s"${part.path}: non-uniform dim $d vs ${part.dim} at record ${part.firstId + i}")
    val id = part.firstId + i
    val values = new Array[Any](decoders.length)
    var fIdx = 0
    while (fIdx < decoders.length) {
      values(fIdx) = decoders(fIdx)(id)
      fIdx += 1
    }
    row = new GenericInternalRow(values)
    i += 1
    true
  }

  // per-field decoders resolved ONCE from the pruned schema — the
  // per-record loop above must not re-dispatch on column-name strings
  private val decoders: Array[Long => Any] = required.fields.map { f =>
    f.name match {
      case "vec_id" | "query_id" => (id: Long) => id
      case "embedding" if elemBytes == 4 => (_: Long) => {
        val arr = new Array[Float](part.dim)
        var j = 0
        while (j < part.dim) { arr(j) = bb.getFloat; j += 1 }
        UnsafeArrayData.fromPrimitiveArray(arr)
      }
      case "embedding" => (_: Long) => { // widened u8
        val arr = new Array[Float](part.dim)
        var j = 0
        while (j < part.dim) { arr(j) = (bb.get() & 0xff).toFloat; j += 1 }
        UnsafeArrayData.fromPrimitiveArray(arr)
      }
      case "codes" => (_: Long) => {
        val arr = new Array[Byte](part.dim)
        bb.get(arr)
        arr
      }
      case "neighbors" => (_: Long) => {
        val arr = new Array[Int](part.dim)
        var j = 0
        while (j < part.dim) { arr(j) = bb.getInt; j += 1 }
        UnsafeArrayData.fromPrimitiveArray(arr)
      }
      case other => throw new IllegalStateException(s"unexpected column $other")
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
