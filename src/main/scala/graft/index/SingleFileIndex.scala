package graft.index

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.size

/** Byte-level interop with the reference's single-file index layout
  * (reference lib.rs:32-36):
  *
  * `[ metadata_len:u64 ][ metadata ][ vectors (n·dim·f32) ]
  *  [ adjacency (n·max_degree·u32, padded) ]`
  *
  * differences, by design: metadata is JSON instead of bincode (no
  * Rust-specific serialization on the JVM), neighbors are written as
  * row POSITIONS in vec_id order with `0xFFFFFFFF` padding — the same
  * fixed-degree padded adjacency the reference mmaps (PAD_U32,
  * reference lib.rs:51). Export streams through `toLocalIterator`
  * (single-file = single-node by definition — the distributed format
  * is the shard-partitioned parquet; this exists so an index can move
  * between graft and a single-node serving process). */
object SingleFileIndex {

  private val Pad: Int = -1 // 0xFFFFFFFF as u32 (reference PAD_U32)

  def export(index: Dataset[IndexRow], params: VamanaParams, path: String): Unit = {
    val spark = index.sparkSession
    import spark.implicits._
    val sorted = index.orderBy($"vec_id")
    // one job gathers ids + dim + observed max degree (count/head/agg
    // would each re-run the sort)
    val idDegree = sorted.select($"vec_id", size($"neighbors"), size($"embedding"))
      .as[(Long, Int, Int)].collect()
    require(idDegree.nonEmpty, "cannot export an empty index")
    val n = idDegree.length.toLong
    val dim = idDegree(0)._3
    // never truncate adjacency: fixed degree = max(params, observed)
    val maxDeg = math.max(params.maxDegree, idDegree.map(_._2).max)
    val ids = idDegree.map(_._1)
    val idToPos = new java.util.HashMap[java.lang.Long, Integer](ids.length * 2)
    ids.zipWithIndex.foreach { case (id, p) => idToPos.put(id, p) }

    val meta =
      s"""{"format":"graft-vamana-singlefile-v1","dim":$dim,"num_vectors":$n,
         |"max_degree":$maxDeg,"metric":"${params.metric}","elem_size":4,
         |"ids_dense":${ids.zipWithIndex.forall { case (id, p) => id == p.toLong }}}"""
        .stripMargin.replace("\n", "")
    val metaBytes = meta.getBytes(StandardCharsets.UTF_8)

    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    try {
      val lenBuf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      lenBuf.putLong(metaBytes.length.toLong)
      out.write(lenBuf.array()); out.write(metaBytes)
      // vectors region
      sorted.select($"vec_id", $"embedding").as[(Long, Array[Float])]
        .toLocalIterator().forEachRemaining { case (_, v) =>
          val bb = ByteBuffer.allocate(4 * dim).order(ByteOrder.LITTLE_ENDIAN)
          v.foreach(bb.putFloat); out.write(bb.array())
        }
      // adjacency region (fixed-degree, padded, as positions)
      sorted.select($"vec_id", $"neighbors").as[(Long, Array[Long])]
        .toLocalIterator().forEachRemaining { case (_, nbrs) =>
          val bb = ByteBuffer.allocate(4 * maxDeg).order(ByteOrder.LITTLE_ENDIAN)
          var written = 0
          var i = 0
          while (i < nbrs.length) {
            // neighbors outside the exported row set (a filtered subset
            // export) become padding instead of an NPE mid-file
            val pos = idToPos.get(nbrs(i))
            if (pos != null && written < maxDeg) { bb.putInt(pos.intValue()); written += 1 }
            i += 1
          }
          while (written < maxDeg) { bb.putInt(Pad); written += 1 }
          out.write(bb.array())
        }
      // ids region (u64 LE) — the one extension over the reference
      // layout, needed because graft ids may be sparse
      val idsBb = ByteBuffer.allocate(8 * ids.length).order(ByteOrder.LITTLE_ENDIAN)
      ids.foreach(idsBb.putLong)
      out.write(idsBb.array())
    } finally out.close()
  }

  /** Load a single-file index fully into a local [[VamanaGraph]] (the
    * reference's mmap-and-serve mode) plus the id mapping. */
  def importLocal(path: String): (VamanaGraph, Array[Long], VamanaParams) = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 20))
    try {
      val lenBytes = new Array[Byte](8); in.readFully(lenBytes)
      val metaLen = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getLong.toInt
      val metaBytes = new Array[Byte](metaLen); in.readFully(metaBytes)
      val meta = new String(metaBytes, StandardCharsets.UTF_8)
      def intField(k: String): Long =
        s""""$k":(\\d+)""".r.findFirstMatchIn(meta).get.group(1).toLong
      def strField(k: String): String =
        s""""$k":"([^"]+)"""".r.findFirstMatchIn(meta).get.group(1)
      require(meta.contains("graft-vamana-singlefile-v1"), s"bad format: $meta")
      val dim = intField("dim").toInt
      val n = intField("num_vectors").toInt
      val maxDeg = intField("max_degree").toInt
      val metric = strField("metric")

      val flat = new Array[Float](n * dim)
      val vecBytes = new Array[Byte](4 * dim)
      var i = 0
      while (i < n) {
        in.readFully(vecBytes)
        val bb = ByteBuffer.wrap(vecBytes).order(ByteOrder.LITTLE_ENDIAN)
        var d = 0
        while (d < dim) { flat(i * dim + d) = bb.getFloat; d += 1 }
        i += 1
      }
      val params = VamanaParams(maxDegree = maxDeg, metric = metric)
      val g = new VamanaGraph(flat, dim, n, params)
      val adjBytes = new Array[Byte](4 * maxDeg)
      i = 0
      while (i < n) {
        in.readFully(adjBytes)
        val bb = ByteBuffer.wrap(adjBytes).order(ByteOrder.LITTLE_ENDIAN)
        val lst = new scala.collection.mutable.ArrayBuffer[Int](maxDeg)
        var t = 0
        while (t < maxDeg) {
          val p = bb.getInt
          if (p != Pad) lst += p
          t += 1
        }
        g.graph(i) = lst.toArray
        i += 1
      }
      val idBytes = new Array[Byte](8 * n)
      in.readFully(idBytes)
      val idBb = ByteBuffer.wrap(idBytes).order(ByteOrder.LITTLE_ENDIAN)
      val idArr = Array.fill(n)(idBb.getLong)
      ((g, idArr, params))
    } finally in.close()
  }
}
