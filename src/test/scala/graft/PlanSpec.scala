package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape audits: these assertions pin the *physical plans* the
  * engine must produce at 100 TB — filter pushdown into the parquet
  * scan, column pruning, broadcast joins for small sides, and map-side
  * partial aggregation. A regression here is a scale bug even when the
  * row-level results stay correct. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  private val sf = SparkSpecBase.sf001

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q1_agg: shipdate filter is pushed into the parquet scan") {
    val p = planOf(operators.Relational.q1Agg(spark, sf))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("q1_agg: aggregation is partial (map-side) before the exchange") {
    val p = planOf(operators.Relational.q1Agg(spark, sf))
    assert(p.contains("partial_sum") || p.contains("Functions [partial"), p)
  }

  test("q_join_topn: dimension tables join via broadcast, not shuffle") {
    val p = planOf(operators.Relational.joinTopN(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_dist_l2: scan prunes to the two referenced columns") {
    val p = planOf(operators.VectorQueries.qDistL2(spark, sf))
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("label"), s"label column should be pruned:\n$p")
  }

  test("q_dist_jaccard/hellinger: native expressions in the pair projection, pruned scan") {
    // the DISTANCE itself is the native codegen expression, never an
    // interpreted aggregate-HOF chain; hellinger needs no lambda at
    // all (|x| and L1 normalization live inside the expression),
    // jaccard's only lambda is the query-side abs() domain mapping
    val pj = planOf(operators.VectorQueries.qDistJaccard(spark, sf))
    assert(pj.contains("graft_jaccard_distance"), pj)
    assert(!pj.contains("label"), s"label column should be pruned:\n$pj")
    assert(!pj.toLowerCase.contains("aggregate(transform"), pj)
    val ph = planOf(operators.VectorQueries.qDistHellinger(spark, sf))
    assert(ph.contains("graft_hellinger_distance"), ph)
    assert(!ph.contains("label"), s"label column should be pruned:\n$ph")
    assert(!ph.toLowerCase.contains("lambdafunction"), ph)
  }

  test("q_mm_frames: one exchange (presentation sort), no sort below the explode") {
    // composing on the SORTED qMmMeta used to leave its range
    // exchange + sort under the Generate (EliminateSorts cannot
    // recurse through it) — the frames work-list then paid a full
    // redundant shuffle of the meta rows before exploding
    val p = planOf(multimodal.Multimodal.qMmFrames(spark, sf))
    // tree-node form "Exchange (n)" — the details section repeats the
    // name as "(n) Exchange", which must not double-count
    assert("""Exchange \(\d+\)""".r.findAllIn(p).length == 1,
      s"expected exactly the presentation exchange:\n$p")
  }

  test("q_knn_exact: queries broadcast; top-k is a partial object aggregate") {
    val p = planOf(operators.VectorQueries.qKnnExact(spark, sf))
    assert(p.contains("Broadcast"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    // partial aggregation: two ObjectHashAggregate nodes (partial + final)
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q_dedup_exact: single scan, no join") {
    val p = planOf(operators.Dedup.qDedupExact(spark, sf))
    assert(!p.contains("Join"), p)
  }

  test("q_kmeans assignment stage: zero-shuffle (no Exchange at all)") {
    import org.apache.spark.sql.functions.col
    val points = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents = Array(0 -> Array(0f, 1f), 1 -> Array(1f, 0f))
    val p = planOf(operators.KMeans.assign(points, cents))
    assert("""\(\d+\) Exchange""".r.findAllIn(p).isEmpty,
      s"assignment must not shuffle the points:\n$p")
  }

  test("q_pack_chunks: hierarchical prefix sum — no window, presentation exchange only") {
    // r4: the per-source window became a range-partitioned prefix sum
    // (PrefixSumSpec pins equivalence); the SQL plan over the result
    // RDD must carry only the final presentation sort's exchange
    val p = planOf(operators.TextAnalysis.qPackChunks(spark, sf))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert("""\(\d+\) Exchange""".r.findAllIn(p).length <= 1, p)
  }

  test("q_medoid: broadcast-corpus kernel — no pair join, no pair rows") {
    // r9: the BroadcastNestedLoopJoin pair generator materialized every
    // (i,j) pair as a row (~220 GB of row traffic at sf1, 65 s); the
    // corpus now broadcasts once as a primitive array and a
    // mapPartitions kernel accumulates Σ_j in registers (1.8 s at sf1).
    // Pin: no join of any kind, one scan, one spread-the-compute
    // exchange, and the 1-row result via TakeOrdered (no agg shuffle).
    val p = planOf(operators.VectorQueries.qMedoid(spark, sf))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    assert(p.contains("MapPartitions"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1,
      s"embeddings scanned more than once:\n$p")
  }

  test("q_dedup_substring: pruned scan, aggregate+join shared-key filter, exchange reused") {
    // r15: shared-key counting moved from a count window (each hot
    // boilerplate key sorted in ONE task) to aggregate + join. The
    // plan contract now: pair generation stays the salted grouped
    // kernel (no cartesian), the documents scan reads (doc_id, text)
    // only, and AQE REUSES the distinct's exchange for the key-count
    // aggregate — the corpus is scanned once in the final plan and
    // the small shared-key set joins back as a hash join (broadcast
    // at this SF). The cached shared table is per-session, so clear
    // it first for a cold plan.
    graft.PlanCache.release(spark, "dedup")
    // the public query checkpoints the output-sized pair table before
    // the presentation sort (r18), which truncates the chain out of
    // its plan — pin the chain's shape on the pre-checkpoint frame
    val p = planOf(operators.Dedup.substringPairsPlan(spark, sf))
    val pub = planOf(operators.Dedup.qDedupSubstring(spark, sf))
    assert(pub.contains("Scan ExistingRDD"),
      s"public query no longer checkpoints before the presentation sort:\n$pub")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("MapGroups"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to (doc_id, text):\n$p")
    // r18: window keys come from the native one-pass walk (in-walk
    // dedup), so the old per-doc DISTINCT exchange — and the
    // ReusedExchange that rode it — are gone by design
    assert(p.contains("graft_substr_window_keys"),
      s"window keys are not the native walk:\n$p")
    assert(p.contains("HashJoin"), s"shared-key join is not a hash join:\n$p")
    // pair counts partial-aggregate map-side before the exchange
    assert(p.contains("HashAggregate"), p)
    graft.PlanCache.release(spark, "dedup")
  }

  test("q_vamana_stitched: serving path filters to the target label before any exchange") {
    // the label filter must sit on the index-side scan (on a persisted
    // index it becomes partition pruning); the serving merge is the
    // bounded TopK object aggregate, and there is no join anywhere
    val full = planOf(index.StitchedIndex.search(
      index.StitchedIndex.cachedIndex(spark, sf),
      Array((0L, new Array[Float](64))), 10, 64,
      index.VamanaIndex.qParams, target = 3))
    // the explain renders the cached index's BUILD plan below the
    // InMemoryRelation boundary (whose label join is legitimate);
    // the assertions audit the SERVING section above it
    assert(full.contains("InMemoryRelation"),
      s"cached-index boundary token missing from explain:\n$full")
    val p = full.substring(0, full.indexOf("InMemoryRelation"))
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    assert(p.contains("Filter"), p)
    val filterIdx = p.indexOf("Filter")
    val exchangeIdx = p.lastIndexOf("Exchange")
    assert(filterIdx > exchangeIdx,
      // formatted plans list operators top-down from the sink, so the
      // filter must appear BELOW (after) every serving exchange
      s"label filter does not sit under the shard exchange:\n$p")
  }

  test("q_dedup_cuts: island merge runs in per-document windows above the cached occurrences") {
    // the md5-explode + keeper aggregate live under the cache
    // boundary; the serving section above it must be pure per-doc
    // windows + the island aggregate — no join re-enters, and the
    // window partitions by doc_id (the one key that cannot skew past
    // one document's own length)
    val full = planOf(operators.Dedup.qDedupCuts(spark, sf))
    assert(full.contains("InMemoryRelation"),
      s"cut-occurrence cache boundary missing:\n$full")
    val p = full.substring(0, full.indexOf("InMemoryRelation"))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
    // window details render below the tree (past the cache boundary
    // token), and the cached build itself plans no window, so the
    // full-text check is unambiguous
    assert(full.contains("windowspecdefinition(doc_id"),
      s"island windows must partition by doc_id:\n$full")
    graft.PlanCache.release(spark, "dedup")
  }

  test("q_dedup_embed: salted bucket-local pairs — no join, no cartesian, one scan") {
    // the salted pair kernel replaced the bucket self-join: pair
    // generation is a grouped in-task loop, so the plan must carry NO
    // join of any kind and read the embeddings exactly once
    val p = planOf(operators.Dedup.qDedupEmbed(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("MapGroups"), p)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1,
      s"embeddings scanned more than once:\n$p")
  }

  test("q_knn_u8: cached codes, broadcast queries, native int distance in the pair loop") {
    val p = planOf(operators.VectorQueries.qKnnU8(spark, sf))
    // the quantization HOFs must NOT be in the per-pair path: both join
    // sides read the one cached codes projection
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"), p)
    assert(p.contains("Broadcast"), p)
    // distance is the codegen'd expression, not an interpreted HOF chain
    assert(p.contains("graft_int_sql2_distance"), p)
    assert(!p.contains("zip_with"), s"interpreted HOF back in the pair loop:\n$p")
  }

  test("q_embed_normalize: cached normalization, broadcast queries, native dot") {
    val p = planOf(operators.VectorQueries.qEmbedNormalize(spark, sf))
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"), p)
    assert(p.contains("Broadcast"), p)
    assert(p.contains("graft_dot_product"), p)
  }

  test("q_pipeline_select: one scan of documents, keeper window exchange, no joins") {
    // the composed quality+lang+dedup selection must NOT re-scan or
    // self-join documents per component — one pass + the md5 window
    val p = planOf(operators.TextAnalysis.qPipelineSelect(spark, sf))
    assert(!p.contains("Join"), p)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1, s"documents scanned more than once:\n$p")
  }

  test("q_text_tokens: single pruned scan, no join/agg shuffle") {
    // HOF lambdas are CodegenFallback in Spark, so no WholeStageCodegen
    // span here; the scale property is the plan shape — a pruned
    // Scan→Project with only the presentation sort's exchange.
    val p = planOf(operators.TextAnalysis.qTextTokens(spark, sf))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(!p.contains("Join"), p)
    // formatted mode lists each node once in the tree and once in the
    // detail section; count detail headers only
    assert("""\(\d+\) Exchange""".r.findAllIn(p).length <= 1, p)
  }

  test("q_text_repetition: one scan, single-pass projection, no shuffle but the sort") {
    // r18: all five statistics are per-document, so the plan is a
    // pruned Scan→Project (RepetitionStats) with only the
    // presentation sort's exchange — no explode, no aggregate, no
    // join, no window (plans/r18/q_text_repetition_{before,after}.txt)
    val p = planOf(operators.TextAnalysis.qTextRepetition(spark, sf))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Generate"), s"explode back in the plan:\n$p")
    assert(!p.contains("HashAggregate"), s"aggregate back in the plan:\n$p")
    assert(p.contains("graft_repetition_stats"), p)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1,
      s"documents scanned more than once:\n$p")
    assert("""\(\d+\) Exchange""".r.findAllIn(p).length <= 1, p)
  }

  test("q_tfidf_terms: ONE corpus scan; vocab-sized aggregates; source count broadcasts") {
    val p = planOf(operators.TextAnalysis.qTfidfTerms(spark, sf))
    // tf is cached and feeds all three consumers — documents must be
    // scanned exactly once (df and n_sources derive from tf, never
    // from a second corpus pass)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1,
      s"documents scanned more than once:\n$p")
    // the 1-row source count must join via broadcast NLJ, never a
    // shuffled cartesian
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // per-source ranking is the bounded TermTopKAgg partial aggregate,
    // NOT a rank window: a window would shuffle + sort the full
    // vocab-sized scored set (a full-vocabulary exchange at 100 TB);
    // the aggregate carries ≤5 terms per (source, partition)
    assert(!p.contains("Window"), s"vocab-wide rank window crept back:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the TermTopKAgg object aggregate:\n$p")
  }

  test("q_text_pii: stateless codegen'd projection — one scan, no join/agg/window") {
    // the redaction stage must stay a per-row rewrite: any Join,
    // aggregate, or Window in this plan is a scale bug (the only
    // exchange allowed is the final presentation sort)
    val p = planOf(operators.TextAnalysis.qTextPii(spark, sf))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("HashAggregate"), p)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1,
      s"customer scanned more than once:\n$p")
  }

  test("q_get_vector: id filter prunes before any vector math") {
    val p = planOf(index.VamanaIndex.qGetVector(spark, sf))
    // the modulo-id predicate must sit in a Filter over the cached
    // index relation, not after the projection math
    assert(p.contains("InMemoryTableScan") || p.contains("Scan parquet"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_sql_surface: the SQL parser path plans the SAME native codegen expressions") {
    // the registered names must resolve to the graft Catalyst
    // expressions (visible by prettyName in the plan), with the scan
    // pruned to the referenced columns — the SQL route earns the
    // identical physical plan shape the Column API gets
    val p = planOf(operators.VectorQueries.qSqlSurface(spark, sf))
    for (fn <- Seq("graft_l2_distance", "graft_cosine_distance",
        "graft_dot_product", "graft_lsh_bucket"))
      assert(p.contains(fn), s"$fn missing from the SQL-path plan:\n$p")
    assert(!p.contains("label"), s"label column should be pruned:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_sql_text: one documents scan, token hashes computed once, no join") {
    val p = planOf(operators.TextAnalysis.qSqlText(spark, sf))
    assert(p.contains("graft_token_hashes"), p)
    // the subquery holds tokenization to ONE evaluation per row —
    // CollapseProject must not inline three copies into the outer
    // projection (filter + code + n_tokens references)
    assert("graft_token_hashes".r.findAllIn(p).length <= 2,
      s"tokenizer duplicated across the projection:\n$p")
    assert(!p.contains("Join"), p)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1,
      s"documents scanned more than once:\n$p")
  }

  test("q_sample_temperature: map-only hash filter over a broadcast rate table, no window") {
    val plan = planOf(operators.TextAnalysis.qSampleTemperature(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast:\n$plan")
    assert(!plan.contains("Window"),
      s"temperature sampling must not rank/sort per source:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the doc scan must never shuffle for the join:\n$plan")
  }

  test("q_knn_binary: codes scan joins broadcast query codes; rerank side broadcasts too") {
    val plan = planOf(operators.Opq.qKnnBinary(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"query codes must broadcast against the corpus scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join anywhere in the binary chain:\n$plan")
  }

  test("q_dedup_semantic: one cell-keyed exchange feeds the union-find, no pair join") {
    // r18 shape: the cell-local union-find chain (groupByKey +
    // flatMapGroups, centroid cosine computed in-task) materializes
    // ONCE into a localCheckpoint, so the serving plan reads the
    // checkpointed members RDD — the old label→assignment re-join
    // (a SortMergeJoin re-evaluating the assign subtree) and the
    // min(struct) SortAggregate keeper are both banned here
    val plan = planOf(operators.Dedup.qDedupSemantic(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"pair generation must stay inside the per-cell task:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the label->assignment re-join is back:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"the keeper aggregate fell off the hash path:\n$plan")
    assert(plan.contains("localCheckpoint at Dedup.scala"),
      s"the members chain must materialize once:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"the keep-rule aggregate is missing:\n$plan")
  }

  test("q_knn_binary_rot: the rotation adds no shuffle — plan shape identical to q_knn_binary") {
    // the rotate is a broadcast dim²-flop kernel folded into the
    // coding scan (mapPartitions), so the rotated chain must carry
    // exactly the raw chain's exchange/join structure
    val plan = planOf(operators.Opq.qKnnBinaryRot(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"query codes must broadcast against the corpus scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join anywhere in the rotated binary chain:\n$plan")
    assert(!plan.contains("Window"),
      s"the rotated chain must not introduce a rank window:\n$plan")
  }

  test("semDeDupCapped: cell-local union-find, keep-rule aggregate broadcasts back") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val plan = planOf(operators.Dedup.semDeDupCapped(emb, nCells = 8))
    // the output is localCheckpoint-materialized (the buildCapped
    // ownership contract), so the pinned shape is the RDD scan —
    // no exchange may survive into the serving read
    assert(!plan.contains("CartesianProduct"),
      s"capped pair scan must stay inside the per-cell task:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the keep-rule join must broadcast, never shuffle the members:\n$plan")
  }
}
