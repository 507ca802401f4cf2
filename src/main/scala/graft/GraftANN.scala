package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import graft.index.{HnswIndex, HnswParams, HnswRow, IndexRow, VamanaIndex, VamanaParams}

/** User-facing facade mirroring the reference's API surface
  * (reference lib.rs: `build_index` / `open_index_with` / `search` /
  * `search_with_dists` / `get_vector`), so a `rust-diskann` user maps
  * 1:1 onto the Spark-native engine:
  *
  * {{{
  * val h  = GraftANN.buildIndex(vectors, VamanaParams(), numShards = 64, "s3://…/idx")
  * val h2 = GraftANN.openIndex(spark, "s3://…/idx", VamanaParams())
  * val nn = h2.search(queriesDf, k = 10, beamWidth = 64)       // DataFrame
  * val one = h2.searchVector(qVec, k = 10, beamWidth = 64)     // Array[(id, dist)]
  * val v  = h2.getVector(123L)
  * }}}
  *
  * `vectors` is any DataFrame with (`vec_id: long`, `embedding:
  * array<float>`) — the Dataset-native analog of the reference's
  * `&[Vec<T>]` input.
  *
  * ==Facade vs DataFrame-native serving==
  * This facade COLLECTS the query frame to the driver (the reference
  * API takes a literal query batch, and broadcast-side query batches
  * are small by contract — thousands, not millions). That is the
  * right shape for interactive / reference-parity use, but it is NOT
  * the scale path for query sets that are themselves tables: a
  * pipeline joining a billion-row query table against an index should
  * use the DataFrame-native operators directly —
  * [[graft.index.VamanaIndex.searchProbed]] /
  * [[graft.operators.VectorQueries]]'s kNN queries / the
  * [[graft.plans.KnnJoin]] logical operator — which keep both sides
  * distributed and never move vectors through the driver. The facade
  * is a convenience skin over those same kernels, not a separate
  * engine.
  */
object GraftANN {

  final class Handle private[GraftANN] (
      val spark: SparkSession,
      val path: String,
      val params: VamanaParams) {

    lazy val index: Dataset[IndexRow] = VamanaIndex.load(spark, path)

    lazy val metadataJson: String = VamanaIndex.loadMeta(path)

    /** Build-time routing table read back from metadata.json — probed
      * serving must never rescan the index to recover it. Indexes
      * saved before the routing field existed fall back to one
      * recompute (then cached on this handle). */
    lazy val routing: Array[(Int, Array[Float])] =
      try VamanaIndex.loadRouting(spark, path)
      catch { case _: Exception => VamanaIndex.routingTable(index) }

    // dim and count come from metadata.json, not a cluster job: the
    // same "serving must never rescan the index" rule as `routing`
    // (head()/count() launched a scan of the graph parquet per call).
    // Indexes saved before these fields existed fall back to one scan.
    // StreamingIndex.ingest bumps num_vectors/num_shards in
    // metadata.json per appended batch, so the fast path cannot go
    // stale under ingestion (a Handle caches metadataJson lazily —
    // reopen after ingest for fresh counts).
    def numVectors: Long =
      metaLong("num_vectors").getOrElse(index.count())

    def dim: Int =
      metaLong("dim").map(_.toInt).getOrElse(index.head().embedding.length)

    private def metaLong(field: String): Option[Long] =
      s""""$field":\\s*(-?\\d+)""".r.findFirstMatchIn(metadataJson)
        .map(_.group(1).toLong)

    private def collectQueries(queries: DataFrame): Array[(Long, Array[Float])] =
      GraftANN.collectQueries(queries)

    /** Batch search for a DataFrame of (q_id: long, qv: array<float>).
      * Returns (q_id, rank, neighbor_id, dist). */
    def search(queries: DataFrame, k: Int, beamWidth: Int): DataFrame =
      VamanaIndex.search(index, collectQueries(queries), k, beamWidth, params)

    /** Routed batch search: each query probes only its `nprobe`
      * nearest shards (the partition-pruned serving path). */
    def searchProbed(queries: DataFrame, k: Int, beamWidth: Int, nprobe: Int): DataFrame =
      VamanaIndex.searchProbed(index, collectQueries(queries), k, beamWidth, params, nprobe,
        routing = Some(routing))

    /** Ids-only single-vector search (reference `search`, lib.rs:696 —
      * the distance-free twin of `search_with_dists`). */
    def searchVectorIds(q: Array[Float], k: Int, beamWidth: Int): Array[Long] =
      searchVector(q, k, beamWidth).map(_._1)

    /** Single-vector search, reference `search_with_dists` analog. */
    def searchVector(q: Array[Float], k: Int, beamWidth: Int): Array[(Long, Double)] = {
      import spark.implicits._
      VamanaIndex.search(index, Array((0L, q)), k, beamWidth, params)
        .orderBy(col("rank"))
        .select(col("neighbor_id"), col("dist"))
        .as[(Long, Double)].collect()
    }

    /** Reference `get_vector` analog (a pruned point-lookup scan). */
    def getVector(vecId: Long): Array[Float] = {
      import spark.implicits._
      index.filter(col("vec_id") === vecId)
        .select(col("embedding")).as[Array[Float]].head()
    }

    /** Predicate-constrained batch search through the same graph
      * (Filtered-DiskANN serving pattern): `labels` is a narrow
      * (vec_id, label) frame; only vectors with `label == target` are
      * returned. Widen `beamWidth` ≈ k / selectivity. */
    def searchFiltered(queries: DataFrame, k: Int, beamWidth: Int,
        labels: DataFrame, target: Int): DataFrame =
      VamanaIndex.searchFiltered(index, labels, collectQueries(queries),
        k, beamWidth, params, target)
  }

  /** Build with default parameters (reference `build_index_default` /
    * `build_index_default_metric`, lib.rs:413,506 — same knobs as
    * `VamanaParams()`'s defaults). */
  def buildIndexDefault(vectors: DataFrame, numShards: Int, path: String): Handle =
    buildIndex(vectors, VamanaParams(), numShards, path)

  /** Build + persist + open (reference `build_index`: writes the index
    * file and returns a ready handle). */
  def buildIndex(
      vectors: DataFrame,
      params: VamanaParams,
      numShards: Int,
      path: String): Handle = {
    val idx = VamanaIndex.build(vectors, params, numShards)
    VamanaIndex.save(idx, params, path)
    new Handle(vectors.sparkSession, path, params)
  }

  /** Open an existing index with the CALLER's metric/params — the
    * reference `open_index_with` contract (lib.rs:450-482): the
    * stored distance name is advisory; on mismatch a warning is
    * emitted and searches evaluate the caller's metric over the
    * stored vectors. Hard errors are reserved for structural
    * mismatches (not a graft index), mirroring the reference's
    * elem-size-only rejection. */
  def openIndex(spark: SparkSession, path: String, params: VamanaParams): Handle = {
    val meta = VamanaIndex.loadMeta(path)
    require(meta.contains("\"format\":\"graft-vamana-v1\""), s"not a graft index: $path")
    if (!meta.contains(s""""metric":"${params.metric}""""))
      System.err.println(
        s"graft: index at $path records a different metric than " +
          s"'${params.metric}' — serving with the caller's metric " +
          "(open_index_with override)")
    new Handle(spark, path, params)
  }

  /** Open an existing index inferring the metric AND every build knob
    * from its own metadata.json (reference `open_index_default_metric`,
    * lib.rs:506-534) — the handed-over-index path: the caller has a
    * directory, not the build configuration. Searches through this
    * handle are identical to one opened with the original params. */
  def openIndex(spark: SparkSession, path: String): Handle = {
    val meta = VamanaIndex.loadMeta(path)
    require(meta.contains("\"format\":\"graft-vamana-v1\""), s"not a graft index: $path")
    new Handle(spark, path, VamanaIndex.paramsFromMeta(spark, meta))
  }

  // ------------------------------------------------------------------ HNSW

  /** HNSW twin of [[Handle]] — the reference treats both index
    * families as buildable/openable artifacts (examples/hnsw_sift.rs
    * dumps and reloads its HNSW exactly like diskann_sift.rs does its
    * DiskANN index). */
  final class HnswHandle private[GraftANN] (
      val spark: SparkSession,
      val path: String,
      val params: HnswParams) {

    lazy val index: Dataset[HnswRow] = HnswIndex.load(spark, path)

    lazy val metadataJson: String = HnswIndex.loadMeta(path)

    def numVectors: Long = index.count()

    /** Batch search for a DataFrame of (q_id: long, qv: array<float>).
      * Returns (q_id, rank, neighbor_id, dist). */
    def search(queries: DataFrame, k: Int, ef: Int): DataFrame =
      HnswIndex.search(index, GraftANN.collectQueries(queries), k, ef, params)

    /** Single-vector search, reference `search_with_dists` analog. */
    def searchVector(q: Array[Float], k: Int, ef: Int): Array[(Long, Double)] = {
      import spark.implicits._
      HnswIndex.search(index, Array((0L, q)), k, ef, params)
        .orderBy(col("rank"))
        .select(col("neighbor_id"), col("dist"))
        .as[(Long, Double)].collect()
    }
  }

  /** The query-frame contract shared by every handle: (q_id: long,
    * qv: array<float>), collected to the driver as the broadcast-side
    * batch (query batches are small by contract; the corpus never
    * collects). One definition so the two index families' facades
    * cannot drift. */
  private def collectQueries(queries: DataFrame): Array[(Long, Array[Float])] = {
    val s = queries.sparkSession
    import s.implicits._
    queries.select(col("q_id"), col("qv")).as[(Long, Array[Float])].collect()
  }

  /** Build + persist + open an HNSW index (hnsw_sift.rs's
    * build-dump-reload flow as one call). */
  def buildHnswIndex(
      vectors: DataFrame,
      params: HnswParams,
      numShards: Int,
      path: String): HnswHandle = {
    val idx = HnswIndex.build(vectors, params, numShards)
    HnswIndex.save(idx, params, path)
    new HnswHandle(vectors.sparkSession, path, params)
  }

  /** Open a persisted HNSW index, params inferred from metadata.json. */
  def openHnswIndex(spark: SparkSession, path: String): HnswHandle = {
    val meta = HnswIndex.loadMeta(path)
    require(meta.contains("\"format\":\"graft-hnsw-v1\""), s"not a graft HNSW index: $path")
    new HnswHandle(spark, path, HnswIndex.paramsFromMeta(spark, meta))
  }
}
