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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vecs_roundtrip" -> (qVecsRoundtrip(_, _)),
    "q_vecs_dsv2" -> (qVecsDsv2(_, _)),
    "q_hdf5_roundtrip" -> (qHdf5Roundtrip(_, _)))
  val oracles: Map[String, String] = Map(
    "q_vecs_roundtrip" -> qVecsRoundtripSql,
    "q_vecs_dsv2" -> qVecsRoundtripSql,
    "q_hdf5_roundtrip" -> qHdf5RoundtripSql)
}
