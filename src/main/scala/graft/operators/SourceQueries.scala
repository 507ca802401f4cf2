package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorExprs._
import graft.sources.{AnnHdf5, VecsFormats}

/** Source round-trip queries: prove the reference's benchmark file
  * formats move losslessly through the engine. */
object SourceQueries {

  /** Collision-free tmp-file token for an sf dir: the whole path,
    * sanitized, plus a hash of the RAW path — sanitization alone
    * collapses distinct separators ("/data/sf1" vs "/data_sf1") onto
    * one token, and the basename alone is "" for trailing-slash
    * inputs; either aliasing would let a later build's eager write
    * clobber an earlier DataFrame's lazily-read file. */
  private def dirToken(dir: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9.]+", "_")
      .stripPrefix("_").stripSuffix("_")
    f"${safe}_${dir.hashCode & 0xffffffffL}%08x"
  }

  /** embeddings → .fvecs on disk → distributed read-back → per-vector
    * L2 norm. Byte-lossless, so the oracle computes the same norms
    * straight from the parquet table. */
  def qVecsRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // app-unique AND dir-unique path: the basename alone collapses
    // for trailing-slash dirs (".*/" strips everything), aliasing two
    // sf dirs onto one tmp file — the eager write then clobbers the
    // earlier DataFrame's lazily-read data. Sanitize the FULL path.
    val sf = dirToken(dir)
    val path = graft.TempCleanup.onExit(
      s"/tmp/graft_vecs_${sf}_${s.sparkContext.applicationId}.fvecs")
    VecsFormats.writeFvecs(Tables.embeddings(s, dir), path)
    VecsFormats.readFvecs(s, path)
      .select($"vec_id",
        round(sqrt(dotProduct($"embedding", $"embedding")), 4).as("l2_norm"))
      .orderBy($"vec_id")
  }

  /** The .fvecs/.hdf5 formats carry NO id field — a vector's identity
    * is its file POSITION (the reference's own convention: its fvecs
    * readers number vectors 0..n-1). writeFvecs emits in vec_id order,
    * so read-back id = rank of vec_id, which the oracle replays with
    * row_number(). (Equality with raw vec_id at sf0.x was a
    * coincidence of contiguous ids; the sf1 rehearsal corpus has
    * replica-offset gaps and exposed the assumption, r9.) */
  val qVecsRoundtripSql: String =
    """SELECT row_number() OVER (ORDER BY vec_id) - 1 AS vec_id,
      |  round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                              CAST(embedding AS DOUBLE[]))), 4) AS l2_norm
      |FROM embeddings ORDER BY 1""".stripMargin

  /** embeddings → ann-benchmarks HDF5 (`train` f32 dataset) on disk →
    * distributed read-back → per-vector L2 norm. f32 is byte-lossless
    * through the file, so the oracle computes the same norms straight
    * from the parquet table (same contract as the fvecs round-trip).
    * The write streams through `toLocalIterator`; the read fans row
    * ranges out across executors. */
  def qHdf5Roundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sf = dirToken(dir)
    val path = graft.TempCleanup.onExit(
      s"/tmp/graft_ann_${sf}_${s.sparkContext.applicationId}.hdf5")
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding").orderBy($"vec_id")
    val (rows, dim) = {
      val r = emb.agg(count(lit(1)), first(size($"embedding"))).head()
      (r.getLong(0).toInt, r.getInt(1))
    }
    AnnHdf5.write(path, Seq(AnnHdf5.FloatMatrix("train", rows, dim,
      () => {
        import scala.jdk.CollectionConverters._
        emb.as[(Long, Array[Float])].toLocalIterator().asScala.map(_._2)
      })))
    AnnHdf5.readFloatMatrix(s, path, "train")
      .select($"vec_id",
        round(sqrt(dotProduct($"embedding", $"embedding")), 4).as("l2_norm"))
      .orderBy($"vec_id")
  }

  val qHdf5RoundtripSql: String = qVecsRoundtripSql

  /** The fully DISTRIBUTED fvecs loop: executor-parallel sharded
    * export ([[VecsFormats.writeFvecsSharded]] — range-partitioned so
    * lexical shard order is global vec_id order) → DataSource V2
    * read-back (`spark.read.format("fvecs")`,
    * [[graft.sources.FvecsDataSource]]): short-name service lookup,
    * multi-file file-order ids, record-aligned splitting, and V2
    * column pruning all on the hot path. Neither direction touches
    * the driver with row data — unlike [[qVecsRoundtrip]]'s
    * single-file interop writer. A small `maxBytesPerPartition`
    * forces a genuinely multi-split scan (the splitting code, not
    * just the single-split fast path, is what the oracle hash
    * certifies). Same positional-id oracle as [[qVecsRoundtrip]]. */
  def qVecsDsv2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sf = dirToken(dir)
    val shardDir = graft.TempCleanup.onExit(
      s"/tmp/graft_dsv2_${sf}_${s.sparkContext.applicationId}.fvecs.d")
    VecsFormats.writeFvecsSharded(Tables.embeddings(s, dir), shardDir, shards = 8)
    s.read.format("fvecs").option("maxBytesPerPartition", 1L << 18).load(shardDir)
      .select($"vec_id",
        round(sqrt(dotProduct($"embedding", $"embedding")), 4).as("l2_norm"))
      .orderBy($"vec_id")
  }

  /** The NATIVE-u8 serving pipeline end to end, no float widening at
    * any stored step (reference examples/bigann.rs: BigANN `.bvecs`
    * in, u8 index built and served as u8): embeddings → global-affine
    * SQ8 codes (clamp[-1,1]·127+128 ∈ [1,255]) → distributed sharded
    * `.bvecs` export → `spark.read.format("bvecs")` native `codes`
    * scan (1 byte/slot — the 4× scan-volume point of the format) →
    * [[graft.index.VamanaIndex.buildFromU8Codes]] (per-row codegen'd
    * widen fused into the build, graph identical to the widened
    * path's — SingleFileIndexSpec pins file-level byte equality) →
    * elem_size-1 single-file export → [[graft.index.U8Graph]]
    * byte-resident serving at 1/4 the widened heap. Output: top-10
    * per query over the standard %50 query subset (integral queries,
    * so the exact integer-L2 fast path serves; queries are corpus
    * members, so rank 1 is the query itself at distance 0 — a
    * retrieval-identity check in the result). Rows-only: the graph
    * build is not SQL-expressible. */
  /** One bvecs-export + u8-index build per (sf dir, JVM) — export-
    * once/serve-many, the same cache contract as every index tier
    * (bench reps and the driver's verify both re-invoke the query). */
  private val u8TierCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  private def cachedU8Tier(s: SparkSession, dir: String): (String, String) =
    u8TierCache.getOrElseUpdate(dir, {
      import s.implicits._
      val sf = dirToken(dir)
      val appId = s.sparkContext.applicationId
      val shardDir = graft.TempCleanup.onExit(s"/tmp/graft_u8src_${sf}_$appId.bvecs.d")
      val idxPath = graft.TempCleanup.onExit(s"/tmp/graft_u8src_${sf}_$appId.idx")
      val quant = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
        .as[(Long, Array[Float])]
        .map { case (id, v) =>
          (id, v.map(x =>
            (math.round(math.max(-1f, math.min(1f, x)) * 127f) + 128).toByte))
        }
        .toDF("vec_id", "codes")
      val written = VecsFormats.writeBvecsSharded(quant, shardDir, shards = 4)
      val n = written.map(_._2).sum // shard manifest row counts — no extra scan
      val codes = s.read.format("bvecs").load(shardDir) // native u8, no widen
      val p8 = u8Params
      // merged parallel build: one logical graph for the single-file
      // export, built as mergedShards(n) concurrent capped sub-builds
      // (a numShards=1 build serializes on one core — 352 s vs ~70 s
      // for the 200 k-vector sf10 probe)
      val idx = graft.index.VamanaIndex.buildFromU8Codes(codes, p8,
        graft.index.VamanaIndex.mergedShards(n), merged = true)
      graft.index.SingleFileIndex.export(idx, p8, idxPath, u8 = true)
      (shardDir, idxPath)
    })

  private def u8Params = graft.index.VamanaParams(maxDegree = 16,
    buildBeamWidth = 32, passes = 1, metric = "l2")

  def qBvecsU8(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (shardDir, idxPath) = cachedU8Tier(s, dir)
    val (g8, ids, _) = graft.index.SingleFileIndex.importLocalU8(idxPath)
    val queries = s.read.format("bvecs").load(shardDir)
      .filter($"vec_id" % 50 === 0)
      .select($"vec_id", graft.functions.VectorExprs.u8ToFloats($"codes"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    queries.toSeq.flatMap { case (qid, qv) =>
      g8.search(qv, 10, 32).zipWithIndex.map { case ((pos, d), r) =>
        (qid, r + 1, ids(pos), math.round(d * 10000) / 10000.0)
      }
    }.toDF("q_id", "rank", "neighbor_id", "dist")
      .orderBy($"q_id", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vecs_roundtrip" -> (qVecsRoundtrip(_, _)),
    "q_vecs_dsv2" -> (qVecsDsv2(_, _)),
    "q_bvecs_u8" -> (qBvecsU8(_, _)),
    "q_hdf5_roundtrip" -> (qHdf5Roundtrip(_, _)))
  val oracles: Map[String, String] = Map(
    "q_vecs_roundtrip" -> qVecsRoundtripSql,
    "q_vecs_dsv2" -> qVecsRoundtripSql,
    "q_hdf5_roundtrip" -> qHdf5RoundtripSql)
}
