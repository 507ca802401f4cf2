package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FSDataInputStream, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal HDF5 reader/writer for the ann-benchmarks interchange files
  * the reference ingests (reference examples/utils/annhdf5.rs: `train`
  * / `test` / `neighbors` / `distances` 2-D datasets).
  *
  * No HDF5 library exists in this environment, so this implements the
  * subset of the PUBLIC HDF5 File Format Specification that
  * ann-benchmarks files actually use — h5py `create_dataset(name,
  * data=...)` with default options produces: superblock version 0,
  * v1 object headers, a symbol-table root group (v1 B-tree + SNOD +
  * local heap), and CONTIGUOUS dataset layout with fixed-point or
  * IEEE-float little-endian datatypes. Chunked/filtered layouts and
  * later superblock versions raise a clear error instead of
  * mis-parsing.
  *
  * Reads are distributed the same way as [[VecsFormats]]: the
  * contiguous layout means row r of an (n × dim) dataset lives at
  * `data_addr + r·dim·elem`, so executors open the file through the
  * Hadoop FileSystem API and read disjoint row ranges — no driver
  * materialization, works for any FS the cluster can see.
  */
object AnnHdf5 {

  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF
  private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')

  /** Parsed location of one contiguous 2-D dataset.
    * kind: 'f' float, 'i' signed int; elemSize: 4 or 8. */
  case class DatasetMeta(name: String, rows: Long, cols: Int, kind: Char,
      elemSize: Int, dataAddr: Long)

  // ------------------------------------------------------------ read

  private class Reader(in: FSDataInputStream) {
    def bytesAt(addr: Long, n: Int): ByteBuffer = {
      val b = new Array[Byte](n)
      in.readFully(addr, b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }
  }

  /** Parse the root group's datasets out of an HDF5 file. */
  def listDatasets(spark: SparkSession, path: String): Map[String, DatasetMeta] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val r = new Reader(in)
      // superblock v0 (spec III.A.1): signature, 4 version bytes,
      // shared-msg version, sizeof(offsets), sizeof(lengths), reserved,
      // leaf-k, internal-k, flags, 4 file addresses, root symbol entry
      val sb = r.bytesAt(0L, 96)
      val sig = new Array[Byte](8); sb.get(sig)
      require(sig.sameElements(Signature), s"$path is not an HDF5 file")
      val sbVersion = sb.get()
      require(sbVersion == 0,
        s"superblock v$sbVersion unsupported (ann-benchmarks files are v0)")
      sb.get(); sb.get(); sb.get() // freespace/root-table versions, reserved
      sb.get() // shared header message version
      val offSize = sb.get(); val lenSize = sb.get()
      require(offSize == 8 && lenSize == 8, s"offset/length size $offSize/$lenSize != 8")
      sb.get() // reserved
      sb.getShort(); sb.getShort() // group leaf k, internal k
      sb.getInt() // consistency flags
      sb.getLong() // base address (0)
      sb.getLong() // free-space address
      sb.getLong() // end of file address
      sb.getLong() // driver info address
      // root group symbol table entry: link name offset, header addr,
      // cache type, reserved, 16-byte scratch
      sb.getLong()
      val rootHeader = sb.getLong

      val (btreeAddr, heapAddr) = rootSymbolTable(r, rootHeader)
      val (heapDataAddr, heapDataSize) = localHeapData(r, heapAddr)
      val heapBytes = new Array[Byte](heapDataSize.toInt)
      in.readFully(heapDataAddr, heapBytes)
      def nameAt(off: Long): String = {
        var end = off.toInt
        while (end < heapBytes.length && heapBytes(end) != 0) end += 1
        new String(heapBytes, off.toInt, end - off.toInt, "UTF-8")
      }
      val entries = collectEntries(r, btreeAddr)
      entries.map { case (nameOff, objAddr) =>
        val name = nameAt(nameOff)
        name -> datasetMeta(r, name, objAddr)
      }.toMap
    } finally in.close()
  }

  /** Root object header must carry a Symbol Table message (type 0x11). */
  private def rootSymbolTable(r: Reader, headerAddr: Long): (Long, Long) = {
    var result: Option[(Long, Long)] = None
    foreachMessage(r, headerAddr) { (msgType, body) =>
      if (msgType == 0x11) result = Some((body.getLong, body.getLong))
    }
    result.getOrElse(sys.error("root group has no symbol table message " +
      "(new-style groups unsupported; ann-benchmarks files use v1 groups)"))
  }

  /** Walk a v1 group B-tree down to its SNOD leaves. */
  private def collectEntries(r: Reader, btreeAddr: Long): Seq[(Long, Long)] = {
    val head = r.bytesAt(btreeAddr, 24)
    val sig = new Array[Byte](4); head.get(sig)
    require(new String(sig, "ASCII") == "TREE", "bad B-tree signature")
    val nodeType = head.get(); val level = head.get()
    require(nodeType == 0, s"B-tree node type $nodeType != group")
    val used = head.getShort & 0xffff
    head.getLong; head.getLong // left/right siblings
    // keys and children alternate: key0 child0 key1 child1 ... keyN
    val body = r.bytesAt(btreeAddr + 24, used * 16 + 8)
    val children = (0 until used).map { _ =>
      body.getLong // key (heap offset) — unused here
      body.getLong // child address
    }
    if (level > 0) children.flatMap(collectEntries(r, _))
    else children.flatMap(snodEntries(r, _))
  }

  private def snodEntries(r: Reader, addr: Long): Seq[(Long, Long)] = {
    val head = r.bytesAt(addr, 8)
    val sig = new Array[Byte](4); head.get(sig)
    require(new String(sig, "ASCII") == "SNOD", "bad symbol node signature")
    head.get() // version
    head.get() // reserved
    val n = head.getShort & 0xffff
    val body = r.bytesAt(addr + 8, n * 40)
    (0 until n).map { _ =>
      val nameOff = body.getLong
      val objAddr = body.getLong
      body.getInt; body.getInt // cache type, reserved
      body.position(body.position() + 16) // scratch
      (nameOff, objAddr)
    }
  }

  /** (data segment address, data segment size) of a v0 local heap. */
  private def localHeapData(r: Reader, heapAddr: Long): (Long, Long) = {
    val h = r.bytesAt(heapAddr, 32)
    val sig = new Array[Byte](4); h.get(sig)
    require(new String(sig, "ASCII") == "HEAP", "bad local heap signature")
    h.get(); h.get(); h.get(); h.get() // version + reserved
    val size = h.getLong // data segment size
    h.getLong // free-list head offset
    (h.getLong, size)
  }

  /** Iterate v1 object-header messages, following continuation blocks
    * (spec IV.A.1.a: 16-byte prefix, 8-byte-aligned messages of
    * [type:u16][size:u16][flags:u8][reserved:3]body). */
  private def foreachMessage(r: Reader, headerAddr: Long)(f: (Int, ByteBuffer) => Unit): Unit = {
    val prefix = r.bytesAt(headerAddr, 16)
    val version = prefix.get()
    require(version == 1, s"object header v$version unsupported")
    prefix.get() // reserved
    val numMessages = prefix.getShort & 0xffff
    prefix.getInt // reference count
    val headerSize = prefix.getInt // size of the first message block
    var remaining = numMessages
    // (blockAddr, blockLen) queue; first block starts after the
    // 16-byte prefix (prefix includes 4 pad bytes for 8-alignment)
    var blocks = List((headerAddr + 16, headerSize.toLong))
    while (remaining > 0 && blocks.nonEmpty) {
      val (addr, len) = blocks.head
      blocks = blocks.tail
      val bb = r.bytesAt(addr, len.toInt)
      while (remaining > 0 && bb.remaining() >= 8) {
        val msgType = bb.getShort & 0xffff
        val msgSize = bb.getShort & 0xffff
        bb.get(); bb.get(); bb.get(); bb.get() // flags + reserved
        if (bb.remaining() < msgSize) { remaining = 0 }
        else {
          val body = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
          body.limit(msgSize)
          if (msgType == 0x10) { // continuation: offset + length
            blocks = blocks :+ ((body.getLong, body.getLong))
          } else f(msgType, body)
          bb.position(bb.position() + msgSize)
          remaining -= 1
        }
      }
    }
  }

  private def datasetMeta(r: Reader, name: String, objAddr: Long): DatasetMeta = {
    var rows = -1L; var cols = -1; var kind = ' '; var elem = 0; var addr = Undef
    foreachMessage(r, objAddr) { (t, b) =>
      t match {
        case 0x01 => // dataspace
          val v = b.get()
          val rank = b.get() & 0xff
          val flags = b.get() & 0xff
          require(v == 1 || v == 2, s"dataspace v$v")
          if (v == 1) { b.get(); b.getInt } // reserved ×5
          else b.get() // v2: type byte
          require(rank == 2, s"dataset $name: rank $rank, ann-benchmarks matrices are 2-D")
          rows = b.getLong
          cols = b.getLong.toInt
          if ((flags & 1) != 0) { b.getLong; b.getLong } // maxdims
        case 0x03 => // datatype
          val classAndVersion = b.get() & 0xff
          val cls = classAndVersion & 0x0f
          val bits0 = b.get() & 0xff
          b.get(); b.get() // bit fields 8-23
          val size = b.getInt
          require((bits0 & 1) == 0, s"dataset $name: big-endian data unsupported")
          kind = cls match {
            case 0 => 'i'
            case 1 => 'f'
            case c => sys.error(s"dataset $name: datatype class $c unsupported")
          }
          elem = size
          require(elem == 4 || elem == 8, s"dataset $name: element size $elem")
        case 0x08 => // data layout
          val v = b.get() & 0xff
          require(v == 3, s"layout message v$v unsupported")
          val layoutClass = b.get() & 0xff
          require(layoutClass == 1,
            s"dataset $name: layout class $layoutClass (only CONTIGUOUS is " +
              "supported; re-export without chunking/compression)")
          addr = b.getLong
        case _ => // fill value, attributes, mod-time … irrelevant here
      }
    }
    require(rows >= 0 && cols >= 0 && kind != ' ' && addr != Undef,
      s"dataset $name: missing dataspace/datatype/layout message")
    DatasetMeta(name, rows, cols, kind, elem, addr)
  }

  // ------------------------------------------ distributed Spark reads

  /** The shared distributed row-range read both matrix readers ride:
    * conf shipping, partition sizing, per-task FS open with
    * close-on-task-completion (a limit() or mid-read failure must not
    * leak the handle), and positioned whole-row reads — parameterized
    * only by the row decode. One definition, so a lifecycle fix can
    * never be applied to one element type and missed on the other. */
  private def readMatrix[T](
      spark: SparkSession, path: String, meta: DatasetMeta)(
      decode: (ByteBuffer, DatasetMeta) => T)(
      implicit enc: org.apache.spark.sql.Encoder[(Long, T)])
      : org.apache.spark.sql.Dataset[(Long, T)] = {
    val conf = org.apache.spark.sql.graft.bridge.serializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val parts = math.min(spark.sparkContext.defaultParallelism.toLong, math.max(1L, meta.rows)).toInt
    spark.range(0, meta.rows, 1, parts).mapPartitions { it =>
      // stream straight off the id iterator — materializing the ids
      // (it.toArray) boxed ~rows/parts Longs per task for no benefit
      if (!it.hasNext) Iterator.empty
      else {
        val p = new HPath(path)
        val fs = p.getFileSystem(org.apache.spark.sql.graft.bridge.hadoopConfOf(conf))
        val in = fs.open(p)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
        val rowBytes = meta.cols * meta.elemSize
        val buf = new Array[Byte](rowBytes)
        it.map { row =>
          in.readFully(meta.dataAddr + row * rowBytes.toLong, buf)
          (row.toLong, decode(ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN), meta))
        }
      }
    }
  }

  /** Float matrix (`train`/`test`/`distances`) →
    * (vec_id: long, embedding: array<float>). f64 narrows to f32
    * (graft's vector element type, same as the reference's f32 path). */
  def readFloatMatrix(spark: SparkSession, path: String, dataset: String): DataFrame = {
    val meta = datasetOrThrow(spark, path, dataset)
    require(meta.kind == 'f', s"$dataset holds integers; use readIntMatrix")
    import spark.implicits._
    readMatrix(spark, path, meta) { (bb, m) =>
      val arr = new Array[Float](m.cols)
      var i = 0
      while (i < m.cols) {
        arr(i) = if (m.elemSize == 4) bb.getFloat else bb.getDouble.toFloat
        i += 1
      }
      arr
    }.toDF("vec_id", "embedding")
  }

  /** Int matrix (`neighbors`) → (query_id: long, neighbors: array<long>). */
  def readIntMatrix(spark: SparkSession, path: String, dataset: String): DataFrame = {
    val meta = datasetOrThrow(spark, path, dataset)
    require(meta.kind == 'i', s"$dataset holds floats; use readFloatMatrix")
    import spark.implicits._
    readMatrix(spark, path, meta) { (bb, m) =>
      val arr = new Array[Long](m.cols)
      var i = 0
      while (i < m.cols) {
        arr(i) = if (m.elemSize == 4) bb.getInt.toLong else bb.getLong
        i += 1
      }
      arr
    }.toDF("query_id", "neighbors")
  }

  private def datasetOrThrow(spark: SparkSession, path: String, name: String): DatasetMeta = {
    val all = listDatasets(spark, path)
    all.getOrElse(name,
      sys.error(s"dataset '$name' not in $path (has: ${all.keys.mkString(", ")})"))
  }

  // ----------------------------------------------------------- write

  /** Writer-side dataset spec: dimensions up front (the contiguous
    * layout is address-planned before any data lands), rows streamed —
    * the writer never holds a matrix in memory. */
  sealed trait Matrix { def name: String; def rows: Int; def cols: Int }
  case class FloatMatrix(name: String, rows: Int, cols: Int,
      rowIter: () => Iterator[Array[Float]]) extends Matrix
  case class LongMatrix(name: String, rows: Int, cols: Int,
      rowIter: () => Iterator[Array[Long]]) extends Matrix
  object FloatMatrix {
    def of(name: String, data: Array[Array[Float]]): FloatMatrix =
      FloatMatrix(name, data.length, if (data.isEmpty) 0 else data(0).length,
        () => data.iterator)
  }
  object LongMatrix {
    def of(name: String, data: Array[Array[Long]]): LongMatrix =
      LongMatrix(name, data.length, if (data.isEmpty) 0 else data(0).length,
        () => data.iterator)
  }

  /** Write an ann-benchmarks-shaped HDF5 file (superblock v0, v1
    * object headers, contiguous layout, full datatype property fields)
    * — the same structural subset h5py's default writer emits.
    * Executable validation is the reader above (h5py/libhdf5 are not
    * available in this offline environment); the datatype property
    * fields and B-tree name-offset keys conformant readers require are
    * emitted per the HDF5 v0/v1 spec. Local-path export utility, like
    * [[VecsFormats.writeFvecs]]. */
  def write(path: String, matrices: Seq[Matrix]): Unit = {
    require(matrices.nonEmpty && matrices.size <= 8,
      "writer supports 1..8 datasets (one SNOD)")
    val out = new java.io.RandomAccessFile(path, "rw")
    try {
      out.setLength(0)
      def align8(x: Long): Long = (x + 7) & ~7L

      // ---- plan addresses
      val superblockSize = 96L
      val rootHeaderAddr = superblockSize // 16 prefix + 24 (symbol table msg)
      val rootHeaderSize = 16L + 24L
      val btreeAddr = align8(rootHeaderAddr + rootHeaderSize)
      val btreeSize = 24L + 24L // one child: key, child, key
      val snodAddr = align8(btreeAddr + btreeSize)
      val snodSize = 8L + 40L * matrices.size
      val heapAddr = align8(snodAddr + snodSize)
      // heap data: one NUL-terminated name per dataset, 8-aligned each;
      // offset 0 must stay empty (h5py reserves it), start names at 8
      val nameOffsets = new Array[Long](matrices.size)
      var heapCursor = 8L
      matrices.zipWithIndex.foreach { case (m, i) =>
        nameOffsets(i) = heapCursor
        heapCursor = align8(heapCursor + m.name.length + 1)
      }
      val heapDataSize = heapCursor
      val heapDataAddr = heapAddr + 32L
      var cursor = align8(heapDataAddr + heapDataSize)
      // dataset headers: 16 prefix + dataspace(8 + v1 rank-2 body 24)
      // + datatype (8 + class/bits/size 8 + property fields, 8-padded:
      // float props are 12 bytes → 24 total body; fixed-point props are
      // 4 bytes → 16 total body — conformant readers (libhdf5/h5py)
      // parse the properties, so they must be present) + layout v3
      // contiguous (8 + 18 → pad 24)
      def dtBodySize(m: Matrix): Long = m match {
        case _: FloatMatrix => 24L // 8 + 12 props, padded
        case _: LongMatrix => 16L // 8 + 4 props, padded
      }
      def dsHeaderSize(m: Matrix): Long = 16L + (8 + 24) + (8 + dtBodySize(m)) + (8 + 24)
      val headerAddrs = new Array[Long](matrices.size)
      val dataAddrs = new Array[Long](matrices.size)
      matrices.zipWithIndex.foreach { case (m, i) =>
        headerAddrs(i) = cursor
        cursor = align8(cursor + dsHeaderSize(m))
        dataAddrs(i) = cursor
        val elem = m match { case _: FloatMatrix => 4L; case _: LongMatrix => 8L }
        cursor = align8(cursor + m.rows.toLong * m.cols * elem)
      }
      val eof = cursor

      def writeAt(addr: Long, bytes: ByteBuffer): Unit = {
        out.seek(addr); out.write(bytes.array(), 0, bytes.position())
      }
      def bb(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

      // ---- superblock
      val sb = bb(96)
      sb.put(Signature)
      sb.put(0.toByte); sb.put(0.toByte); sb.put(0.toByte); sb.put(0.toByte)
      sb.put(0.toByte) // shared header msg version
      sb.put(8.toByte); sb.put(8.toByte); sb.put(0.toByte)
      sb.putShort(4); sb.putShort(16) // leaf k, internal k
      sb.putInt(0) // consistency flags
      sb.putLong(0L); sb.putLong(Undef); sb.putLong(eof); sb.putLong(Undef)
      // root symbol table entry
      sb.putLong(0L); sb.putLong(rootHeaderAddr)
      sb.putInt(1); sb.putInt(0) // cache type 1 (group), reserved
      sb.putLong(btreeAddr); sb.putLong(heapAddr) // scratch
      writeAt(0, sb)

      // ---- root object header (v1) with symbol table message
      val rh = bb(40)
      rh.put(1.toByte); rh.put(0.toByte); rh.putShort(1)
      rh.putInt(1); rh.putInt(24); rh.putInt(0) // refcount, size, pad
      rh.putShort(0x11); rh.putShort(16); rh.putInt(0)
      rh.putLong(btreeAddr); rh.putLong(heapAddr)
      writeAt(rootHeaderAddr, rh)

      // ---- B-tree v1, level 0, one SNOD child. Keys are heap name
      // offsets: key 0 = offset 0 (the reserved empty name — the
      // conventional "smallest" key) and the closing key = the
      // lexicographically-largest stored name's offset, so libhdf5's
      // key-guided name lookup binary-searches correctly.
      val order = matrices.indices.sortBy(matrices(_).name)
      val bt = bb(48)
      bt.put("TREE".getBytes("ASCII"))
      bt.put(0.toByte); bt.put(0.toByte); bt.putShort(1)
      bt.putLong(Undef); bt.putLong(Undef)
      bt.putLong(0L); bt.putLong(snodAddr); bt.putLong(nameOffsets(order.last))
      writeAt(btreeAddr, bt)

      // ---- SNOD (symbol table node) — entries sorted by name, as the
      // format requires (h5py maintains the same invariant)
      val sn = bb(8 + 40 * matrices.size)
      sn.put("SNOD".getBytes("ASCII"))
      sn.put(1.toByte); sn.put(0.toByte)
      sn.putShort(matrices.size.toShort)
      order.foreach { i =>
        sn.putLong(nameOffsets(i)); sn.putLong(headerAddrs(i))
        sn.putInt(0); sn.putInt(0)
        sn.putLong(0L); sn.putLong(0L) // scratch
      }
      writeAt(snodAddr, sn)

      // ---- local heap
      val hp = bb(32)
      hp.put("HEAP".getBytes("ASCII"))
      hp.put(0.toByte); hp.put(0.toByte); hp.put(0.toByte); hp.put(0.toByte)
      hp.putLong(heapDataSize); hp.putLong(1L); hp.putLong(heapDataAddr)
      writeAt(heapAddr, hp)
      val hd = bb(heapDataSize.toInt)
      matrices.zipWithIndex.foreach { case (m, i) =>
        hd.position(nameOffsets(i).toInt)
        hd.put(m.name.getBytes("ASCII")); hd.put(0.toByte)
      }
      hd.position(heapDataSize.toInt)
      writeAt(heapDataAddr, hd)

      // ---- dataset headers + data
      matrices.zipWithIndex.foreach { case (m, i) =>
        val hSize = dsHeaderSize(m)
        val h = bb(hSize.toInt)
        h.put(1.toByte); h.put(0.toByte); h.putShort(3)
        h.putInt(1); h.putInt((hSize - 16).toInt); h.putInt(0)
        // dataspace v1, rank 2
        h.putShort(0x01); h.putShort(24); h.putInt(0)
        h.put(1.toByte); h.put(2.toByte); h.put(0.toByte); h.put(0.toByte)
        h.putInt(0) // reserved
        h.putLong(m.rows.toLong); h.putLong(m.cols.toLong)
        // datatype: class 1 float f32 LE or class 0 fixed i64 LE, with
        // the class-specific property fields the spec mandates (h5py/
        // libhdf5 parse them; the reader above tolerates either)
        h.putShort(0x03); h.putShort(dtBodySize(m).toShort); h.putInt(0)
        m match {
          case _: FloatMatrix =>
            h.put(0x11.toByte) // version 1, class 1 (float)
            h.put(0x20.toByte); h.put(0x1f.toByte); h.put(0.toByte) // IEEE LE bits
            h.putInt(4)
            // float properties: bit offset/precision, exponent
            // location+size, mantissa location+size, bias (IEEE
            // binary32: exp@23 ×8, man@0 ×23, bias 127)
            h.putShort(0); h.putShort(32)
            h.put(23.toByte); h.put(8.toByte); h.put(0.toByte); h.put(23.toByte)
            h.putInt(127)
            h.putInt(0) // pad 12-byte props to the 8-aligned body
          case _: LongMatrix =>
            h.put(0x10.toByte) // version 1, class 0 (fixed-point)
            h.put(0x08.toByte); h.put(0.toByte); h.put(0.toByte) // signed, LE
            h.putInt(8)
            // fixed-point properties: bit offset, bit precision
            h.putShort(0); h.putShort(64)
            h.putInt(0) // pad 4-byte props to the 8-aligned body
        }
        // layout v3 class 1 (contiguous): address + size, padded to 24
        h.putShort(0x08); h.putShort(24); h.putInt(0)
        h.put(3.toByte); h.put(1.toByte)
        val elem = m match { case _: FloatMatrix => 4L; case _: LongMatrix => 8L }
        h.putLong(dataAddrs(i)); h.putLong(m.rows.toLong * m.cols * elem)
        h.put(new Array[Byte](6)) // pad to declared message size
        writeAt(headerAddrs(i), h)

        val rowLen = (m.cols * elem).toInt
        out.seek(dataAddrs(i))
        var written = 0
        m match {
          case fm: FloatMatrix =>
            fm.rowIter().foreach { row =>
              require(row.length == m.cols, s"${m.name}: ragged row")
              val b = bb(rowLen); row.foreach(b.putFloat); out.write(b.array())
              written += 1
            }
          case lm: LongMatrix =>
            lm.rowIter().foreach { row =>
              require(row.length == m.cols, s"${m.name}: ragged row")
              val b = bb(rowLen); row.foreach(b.putLong); out.write(b.array())
              written += 1
            }
        }
        require(written == m.rows, s"${m.name}: wrote $written of ${m.rows} rows")
      }
      out.setLength(eof)
    } finally out.close()
  }
}
