package graft.engine.ops

import graft.SparkSuite
import graft.SparkEntry

/** Pins the physical-plan properties SURVEY §4.2 relies on Catalyst for.
  * These are the 100 TB guarantees: a query that silently stops pushing
  * filters into the parquet scan or stops broadcasting a dimension would
  * still pass the value oracle at sf0.01 — and fall over at scale. */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q_filter_basic pushes predicates into the parquet scan") {
    val p = plan("q_filter_basic")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("LessThan(l_quantity") || p.contains("Or(And("),
      "filter subtree must reach the scan:\n" + p.take(2000))
  }

  test("q_scan_prune reads only the 2 referenced columns") {
    val p = plan("q_scan_prune")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"), readSchema)
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"),
      s"scan must not read unprojected columns: $readSchema")
  }

  test("q_join_broadcast uses a broadcast hash join") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_join_bucketed joins co-located buckets with zero shuffle, agg included") {
    // AQE finalizes the plan at execution — run it, then inspect
    val df = SparkEntry.queries("q_join_bucketed")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("Exchange hashpartitioning"),
      "bucketed co-located join must not shuffle either side or the post-join agg:\n" + p.take(2500))
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      "scan must actually read bucket metadata:\n" + p.take(2500))
  }

  test("q_stopword_filter broadcasts the stopword head; q_ngram_stats takes ordered top-k") {
    val p1 = plan("q_stopword_filter")
    // the Zipf-head stopword array goes UNDER the corpus via broadcast —
    // the corpus itself must not shuffle for the per-doc filter
    assert(p1.contains("BroadcastNestedLoopJoin") || p1.contains("BroadcastExchange"),
      "stopword array must broadcast:\n" + p1.take(2000))
    val p2 = plan("q_ngram_stats")
    assert(p2.contains("TakeOrderedAndProject"),
      "top-k must not be a corpus-wide sort:\n" + p2.take(1500))
  }

  test("q_scan_partitioned prunes fact partitions statically and dynamically") {
    val p = plan("q_scan_partitioned")
    // static: the partition column filter never reaches row groups — it
    // selects directories at plan time
    assert(p.contains("PartitionFilters: [isnotnull(event_date"),
      "partition-column predicate must be a PartitionFilter, not a data filter:\n" + p.take(2000))
    // dynamic: the filtered dim side injects a runtime pruning subquery
    // into the fact scan, so only the matching day directories are read
    assert(p.contains("dynamicpruning") || p.contains("DynamicPruning"),
      "expected a dynamic partition pruning subquery on the fact scan:\n" + p.take(2000))
  }

  test("q_join_multi broadcasts the nation dimension") {
    assert(plan("q_join_multi").contains("BroadcastHashJoin"))
  }

  test("q_topk compiles to TakeOrderedAndProject (no full sort)") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("q_agg_group uses partial+final hash aggregation") {
    val p = plan("q_agg_group")
    assert(p.contains("HashAggregate"), p.take(1500))
    assert(p.contains("partial_"), "map-side partial aggregation expected:\n" + p.take(1500))
  }

  test("q_agg_group stays inside whole-stage codegen") {
    // AQE hides the final plan until execution — run it, then inspect.
    // Codegen stages print as "*(n) Operator" in the tree string.
    val df = SparkEntry.queries("q_agg_group")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)") && p.contains("*(2)"),
      "scan→filter→partial-agg and final-agg must each be a codegen stage:\n" + p.take(1500))
  }

  test("q_sim_cosine broadcasts the query vector (no shuffle of the big side)") {
    val p = plan("q_sim_cosine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p.take(1500))
  }

  test("q_join_semi / q_join_anti plan as semi/anti joins, not materialized joins") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }

  test("q_subquery_in decorrelates to a semi join (no materialized subquery)") {
    assert(plan("q_subquery_in").contains("LeftSemi"))
  }

  test("q_asof_join shuffles each side once by key — no range-probe join") {
    val p = plan("q_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of must not degrade to a product join:\n" + p.take(1500))
    assert(p.contains("Window"), "as-of is the keyed-window formulation")
    val keyShuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(u#"))
    assert(keyShuffles <= 1, s"one key shuffle expected, saw $keyShuffles:\n" + p.take(2000))
  }

  test("q_asof_join_nearest: both direction windows ride ONE key shuffle") {
    val p = plan("q_asof_join_nearest")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "nearest as-of must not degrade to a product join:\n" + p.take(1500))
    // two Window nodes (ascending + descending scan)…
    val windows = p.linesIterator.count(_.contains("Window ["))
    // …but the u-key Exchange appears once: Catalyst re-sorts the SAME
    // shuffle output for the second direction instead of re-shuffling
    val keyShuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(u#"))
    assert(windows >= 2, s"expected both direction windows:\n" + p.take(2000))
    assert(keyShuffles <= 1, s"one key shuffle expected, saw $keyShuffles:\n" + p.take(2000))
  }

  test("q_dedup_minhash verification runs on the native merge-walk expression") {
    assert(plan("q_dedup_minhash").contains("sorted_intersect_size"))
  }

  test("q_ann_ivf probes cells via broadcast (no shuffle of the indexed side)") {
    val p = plan("q_ann_ivf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p.take(1500))
  }

  test("q_ann_ivf_bcast: codebook and probe both broadcast; corpus shuffles only for the argmax agg") {
    val p = plan("q_ann_ivf_bcast")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"codebook must broadcast:\n${p.take(1500)}")
    // the only keyed exchange is the per-vector assignment argmax —
    // the corpus never shuffles for the cell-probe join itself
    val keyed = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed <= 1, s"corpus must not shuffle beyond the argmax agg:\n${p.take(2000)}")
    assert(p.contains("partial_max"), s"assignment argmax needs map-side combine:\n${p.take(1500)}")
  }

  test("CBO join reorder: with table stats, a cost-bad 4-way join order is rewritten small-first") {
    // The 100×-scale plan story SURVEY §4.2 defers to Catalyst: at real
    // scale the optimizer must not execute joins in syntactic order. Give
    // it stats (ANALYZE TABLE) and a deliberately bad order — both facts
    // first, the selective dimension last — and pin that
    // CostBasedJoinReorder moves the filtered nation⋈customer side ahead
    // of the lineitem fact instead of joining the two big tables first.
    import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val tables = Seq("lineitem", "orders", "customer", "nation")
    val confs = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS cbo_$t")
      spark.sql(s"CREATE TABLE cbo_$t USING parquet LOCATION '$sfDir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val badOrder =
      """SELECT count(*) FROM cbo_lineitem l
        |JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
        |JOIN cbo_customer c ON o.o_custkey = c.c_custkey
        |JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey
        |WHERE n.n_name = 'FRANCE'""".stripMargin
    def leafOrder(): Seq[String] =
      spark.sql(badOrder).queryExecution.optimizedPlan.collectLeaves().collect {
        case r: LogicalRelation =>
          r.catalogTable.map(_.identifier.table).getOrElse("?")
        case h: HiveTableRelation => h.tableMeta.identifier.table
      }
    try {
      confs.foreach(spark.conf.set(_, "false"))
      val syntactic = leafOrder()
      confs.foreach(spark.conf.set(_, "true"))
      val reordered = leafOrder()
      assert(syntactic.head == "cbo_lineitem",
        s"control: without CBO the syntactic fact-first order stands: $syntactic")
      assert(reordered != syntactic,
        s"stats present but CostBasedJoinReorder left the bad order: $reordered")
      assert(reordered.head != "cbo_lineitem",
        s"the 6M-row fact must not anchor the join tree: $reordered")
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS cbo_$t"))
    }
  }

  test("round-4 narrow ops stay narrow: repetition and normalize shuffle only for the output sort") {
    Seq("q_repetition", "q_normalize_text").foreach { q =>
      val p = plan(q)
      val keyed = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(keyed == 0, s"$q must be a pure map stage:\n${p.take(1500)}")
    }
  }

  test("q_embed_quantize: per-dim stats broadcast back under the scan (no corpus re-shuffle)") {
    val p = plan("q_embed_quantize")
    assert(p.contains("BroadcastHashJoin"), s"stats side must broadcast:\n${p.take(1500)}")
    // exactly one keyed exchange: the 64-row stats aggregation itself
    val keyed = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 1, s"only the stats agg may shuffle:\n${p.take(2000)}")
  }

  test("q_contamination_exact: benchmark anchor side broadcasts; islands ride one keyed exchange") {
    val p = plan("q_contamination_exact")
    assert(p.contains("BroadcastHashJoin"), s"bench anchors must broadcast:\n${p.take(1500)}")
  }

  test("q_dedup_substring: candidates join on the gram key only — no cartesian anywhere") {
    val p = plan("q_dedup_substring")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"anchor join must be an equi-join on gram:\n${p.take(1500)}")
  }

  test("q_hybrid_rerank: both legs broadcast the query side; rerank broadcasts the candidate union") {
    val p = plan("q_hybrid_rerank")
    // no leg may degrade to a product join over the corpus (the only
    // nested-loop joins are the broadcast singletons: totals, query
    // embedding)
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere:\n" + p.take(2000))
    // BM25 query-term prune, LSH band probe, and the final rerank all
    // join broadcast-small against the corpus scan
    val bcastJoins = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bcastJoins >= 3, s"expected >=3 broadcast hash joins, saw $bcastJoins:\n" + p.take(2000))
  }

  test("q_bm25_topk: query terms broadcast under the token scan before the tf/df aggregates") {
    val p = plan("q_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), "no cartesian:\n" + p.take(1500))
  }

  test("q_bpe_step: the argmax merge broadcasts (1 row) under the rewrite scan") {
    val p = plan("q_bpe_step")
    assert(p.contains("BroadcastExchange"), p.take(1500))
    assert(!p.contains("CartesianProduct"), "no cartesian:\n" + p.take(1500))
  }

  test("q_pack_global: the cross-doc bin-pack stays distributed — no single-partition exchange") {
    val p = plan("q_pack_global")
    assert(!p.contains("Exchange SinglePartition"),
      s"the (class, shard) window must never collapse to one partition:\n${p.take(2000)}")
  }

  test("q_ann_ivfpq / q_ann_ivf_trained: probes broadcast, nothing cartesians") {
    for (name <- Seq("q_ann_ivfpq", "q_ann_ivf_trained")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: no cartesian:\n${p.take(1500)}")
      // cell probe, codebook, and (for ivfpq) the ADC table all broadcast
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$name: probe sides must broadcast:\n${p.take(1500)}")
    }
  }

  test("q_ann_pq: codebook + ADC table broadcast; scoring never cartesians or sort-merges") {
    val p = plan("q_ann_pq")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "codebook/LUT joins must broadcast, not sort-merge:\n" + p.take(2000))
    val bcastJoins = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bcastJoins >= 2,
      s"encode codebook + score LUT must both broadcast, saw $bcastJoins:\n" + p.take(2000))
  }

  test("q_lm_score: count-table joins stay keyed equi-joins") {
    val p = plan("q_lm_score")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "LM joins must be keyed equi-joins:\n" + p.take(2000))
  }

  test("q_pivot reads the data once: partial aggs + at most 2 keyed shuffles") {
    // Spark plans pivot as sum-per-(row,pivot-key) then pivotfirst-per-row:
    // one full-data pass with map-side partials, then a tiny regroup.
    val p = plan("q_pivot")
    assert(p.contains("partial_"), "map-side partials expected:\n" + p.take(1500))
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"pivot must scan the fact table once, saw $scans")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 2, s"expected ≤2 keyed shuffles, saw $shuffles:\n" + p.take(2000))
  }

  test("runtime bloom-filter join pruning engages on a selective fact join") {
    // at 100 TB, a bloom filter built from the filtered dim side prunes
    // fact rows BEFORE the join shuffle — assert Spark injects it
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val l = graft.engine.io.Tables.lineitem(spark, sfDir)
      val o = graft.engine.io.Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"bloom runtime filter expected on the fact side:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_sample_hash is a narrow filter (no shuffle before the output sort)") {
    val p = plan("q_sample_hash")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 0, s"hash sampling must not shuffle:\n" + p.take(1500))
  }

  test("q_sim_knn broadcasts the probe set — the corpus side never shuffles for the join") {
    val p = plan("q_sim_knn")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe side must broadcast:\n${p.take(1500)}")
  }

  test("q_skew_join takes the shuffle path (salt defeats broadcast) and re-aggregates") {
    val p = plan("q_skew_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"salted join must shuffle, not broadcast:\n${p.take(1500)}")
  }

  test("q_dedup_embedding computes signatures with the native expression, no quadratic stage") {
    val p = plan("q_dedup_embedding")
    assert(p.contains("hyperplane_sig64"), s"native signature expected:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), "near-dup must never plan a cartesian stage")
  }

  test("q_dedup_simhash signature is a scalar projection (no aggregate before banding)") {
    val p = plan("q_dedup_simhash")
    assert(p.contains("simhash_text64"), s"fused native signature expected:\n${p.take(1500)}")
    // the fused pass replaced the interpreted transform∘transform lambda
    // chain — no higher-order function may reappear in the signature stage
    assert(!p.contains("lambdafunction"), s"interpreted lambda crept back:\n${p.take(1500)}")
  }

  test("q_bitmap_distinct plans partial+final at both rollup levels (mergeable bitmaps)") {
    val p = plan("q_bitmap_distinct")
    // bitmap_construct_agg carries a binary buffer → SortAggregate; the
    // popcount-sum level hash-aggregates. Both must run partial+final so
    // executors merge bitmaps before any shuffle.
    assert(p.contains("partial_bitmap_construct_agg"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
    assert(p.linesIterator.count(l =>
      l.contains("HashAggregate") || l.contains("SortAggregate")) >= 4, p.take(1500))
  }

  test("q_contamination broadcasts the benchmark shingle set") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n${p.take(1500)}")
  }

  test("q_pack shuffles once: the per-document window is the only keyed exchange") {
    val p = plan("q_pack")
    val keyed = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 1, s"chunk generation must stay narrow:\n${p.take(1500)}")
  }

  test("q_tfidf: token tf and df aggregations both run partial+final (no raw-token shuffle)") {
    val p = plan("q_tfidf")
    // every exploded token row must hit a partial HashAggregate before
    // any exchange — at 100 TB the raw token stream is the largest
    // intermediate in the whole pipeline
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 4, p.take(2000))
  }

  test("q_merge_upsert lowers to exactly one join, no cartesian") {
    val p = plan("q_merge_upsert")
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
      l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"MERGE shape is a single equi-join:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "merge must stay an equi-join")
  }

  test("q_dedup_paragraph: survivor pick and rebuild reuse the same two keyed shuffles") {
    val p = plan("q_dedup_paragraph")
    // one exchange on chunk_text (the survivor window), one on doc_id
    // (rebuild agg + completion join share it) — at 100 TB the chunk
    // stream shuffles at most twice, never per-stage
    val keyed = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed <= 3, s"paragraph dedup must stay at ≤3 keyed exchanges:\n${p.take(2500)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_kmeans_step: update statistics aggregate partial+final after the posexplode") {
    val p = plan("q_kmeans_step")
    // the 64-way component explosion must collapse via map-side partial
    // aggregation before the (cell, dim) shuffle — at 100 TB the raw
    // exploded stream is 64× the corpus and must never hit the wire
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p.take(2000))
    assert(p.contains("Generate posexplode"), p.take(1500))
  }

  test("q_semantic_dedup joins on the cell key only — equi-join, no cartesian") {
    val p = plan("q_semantic_dedup")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "cell blocking must keep the pair stage an equi-join")
  }

  test("q_curation_pipeline: benchmark side broadcasts; id filters are semi/anti joins") {
    val p = plan("q_curation_pipeline")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark shingles must broadcast:\n${p.take(2000)}")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"stage filters must be id-keyed semi/anti joins:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
  }
  test("q_ngram_jaccard_banded keeps the equi-join shape: banding never degrades to a nested loop") {
    // the 3-neighbor-band explode exists precisely so adjacent-band
    // admission stays an equi-join; an abs(blk_a - blk_b) <= 1 predicate
    // would plan as BroadcastNestedLoop and die at scale
    val p = plan("q_ngram_jaccard_banded")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "band-adjacency must join on exploded keys, not a non-equi predicate:\n" + p.take(2500))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q_cluster_prune ranks with per-cell group limits and broadcasts the codebook") {
    val p = plan("q_cluster_prune")
    // the rnk <= m filter must push into the window as a group limit so
    // each map task keeps <= m rows per cell BEFORE the cell exchange —
    // the property that bounds the rank's shuffle at corpus scale
    assert(p.contains("WindowGroupLimit"),
      "per-cell quota must plan as a group-limit pushdown:\n" + p.take(2500))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the trained codebook must broadcast under the corpus:\n" + p.take(2500))
  }

  test("q_dsir_weights broadcasts the bucket table under a doc-keyed aggregate") {
    val p = plan("q_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      "the <=1024-row weight table must broadcast:\n" + p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // partial+final pair on the doc-keyed score aggregate
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p.take(2000))
  }

  test("q_dsir_sample partitions every window; the corpus cumsum shards by pkey") {
    val p = plan("q_dsir_sample")
    // the two-phase prefix scan exists precisely so no window runs with
    // an EMPTY partition spec (`], [], [` in the executed plan = global
    // ordered window = one task holds the corpus); the intra-block
    // cumsum must shard by pkey, the bounded block-totals window rides
    // the constWindowKey hash key
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p.take(2000))
    assert(!windows.exists(_.contains("], [], [")),
      s"no window may run unpartitioned:\n${windows.mkString("\n")}")
    assert(windows.exists(_.contains("windowspecdefinition(pkey")),
      s"intra-block cumsum must partition by pkey:\n${windows.mkString("\n")}")
    // the scores projection is checkpointed: the scoring DAG must appear
    // ONCE, not once per window consumer (three Scans would show here)
    assert(p.linesIterator.count(_.contains("poly_hash31")) == 0,
      "upstream scoring must be materialized, not re-planned per consumer:\n" + p.take(3000))
  }

  test("q_domain_cap plans the per-domain quota as a group-limit pushdown") {
    val p = plan("q_domain_cap")
    // rk <= cap must become a WindowGroupLimit so each map task pre-trims
    // to cap rows per domain BEFORE the domain exchange — the property
    // that keeps a flooding domain from shipping its full row count
    assert(p.contains("WindowGroupLimit"),
      "per-domain cap must plan as a group-limit pushdown:\n" + p.take(2500))
    // and the scan feeds only the two columns the cap reads
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("; ")
    assert(!schemas.contains("text"), s"cap must not scan text: $schemas")
  }

  test("q_winnow_pairs: fingerprint blocking keeps the pair stage an equi-join") {
    val p = plan("q_winnow_pairs")
    // the fp-keyed self-join (with the freq cap riding the same
    // partitioning) is the whole scale story — a nested loop here means
    // the blocking degenerated to all-pairs
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "fingerprint pairing must stay an equi-join:\n" + p.take(2500))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q_ppl_buckets: thresholds broadcast; windows run over the histogram only") {
    val p = plan("q_ppl_buckets")
    // the 2-value-per-stratum threshold table must broadcast back under
    // the scored corpus — a shuffle join here re-keys the corpus twice
    assert(p.contains("BroadcastHashJoin"),
      "tercile thresholds must broadcast:\n" + p.take(2500))
    // every window partitions by stratum and runs over the
    // dimension-sized score histogram — never the corpus, never global
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p.take(2000))
    assert(!windows.exists(_.contains("], [], [")),
      s"no window may run unpartitioned:\n${windows.mkString("\n")}")
    assert(windows.forall(_.contains("windowspecdefinition(stratum")),
      s"windows must partition by stratum:\n${windows.mkString("\n")}")
  }

  test("q_vocab_coverage: vocab cut is a global top-k that broadcasts under the explode") {
    val p = plan("q_vocab_coverage")
    // LIMIT-after-sort must plan as TakeOrdered (per-partition top-k +
    // merge), never a full global sort of the token-frequency table
    assert(p.contains("TakeOrderedAndProject"),
      "the vocab cut must be a top-k, not a global sort:\n" + p.take(2500))
    assert(p.contains("BroadcastHashJoin"),
      "the bounded vocab must broadcast under the corpus explode:\n" + p.take(2500))
  }

  test("q_sample_fixed carves the budget as a top-n, never a global sort") {
    val p = plan("q_sample_fixed")
    // orderBy+limit must compile to TakeOrdered (per-partition n-row
    // heaps + driver merge); a full Exchange+Sort here would shuffle
    // the corpus to sample 100 rows
    assert(p.contains("TakeOrderedAndProject"),
      "the fixed-budget carve must be a top-n:\n" + p.take(2500))
    // and the scan reads only the projected columns, never text
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("; ")
    assert(!schemas.contains("text"), s"sample must not scan text: $schemas")
  }

  test("q_ann_matryoshka: the prefix tier is a top-k, candidates broadcast under one full scan") {
    val p = plan("q_ann_matryoshka")
    // the coarse limit must plan as TakeOrdered (per-partition top-k +
    // merge), never a global sort of the corpus scores
    assert(p.contains("TakeOrderedAndProject"),
      "the truncated-tier prune must be a top-k:\n" + p.take(2500))
    assert(p.contains("BroadcastHashJoin"),
      "the nCand candidate set must broadcast under the full-width scan:\n" + p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q_shuffle_shards is one partial+final aggregate with no window or sort before the agg") {
    val p = plan("q_shuffle_shards")
    assert(!p.contains("windowspecdefinition"),
      "shard manifest must not need a window:\n" + p.take(2000))
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q_dedup_incremental joins delta bands against reference bands with no cartesian stage") {
    val p = plan("q_dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the index probe must stay a keyed band join:\n" + p.take(2500))
    // both slices' scans must prune to the two columns the pipeline reads
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("; ")
    assert(schemas.contains("doc_id") && schemas.contains("text") &&
           !schemas.contains("n_chars"),
      s"corpus scans must read only (doc_id, text): $schemas")
  }

  test("q_bloom_dedup never shuffles the corpus: broadcast joins only, codegen'd probe") {
    val p = plan("q_bloom_dedup")
    // the whole point of the Bloom pre-pass: no text-keyed exchange of
    // either side — the confirm set broadcasts, the delta stays in place
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "bloom dedup must not shuffle-join the corpus:\n" + p.take(2500))
    assert(p.contains("BroadcastHashJoin"),
      "the confirmed-dup set must broadcast:\n" + p.take(2500))
    // the only keyed exchanges allowed are the distincts over the TINY
    // candidate/confirmed sets (bounded by dup volume + fp sliver, not
    // corpus size) — the corpus-scan subtrees must join broadcast-side
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      "corpus-sized exchange crept in:\n" + p.take(2500))
  }

  test("q_sample_temperature broadcasts the rates table; the corpus is never shuffled") {
    val p = plan("q_sample_temperature")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the per-domain rates must broadcast under the corpus:\n" + p.take(2500))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the corpus-side join must not shuffle:\n" + p.take(2500))
  }

  test("q_funnel: the stage chain is keyed joins + partial+final aggs, no cartesian") {
    val p = plan("q_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "stage reach-set joins must stay equi-joins:\n" + p.take(2500))
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "stage minimums must aggregate map-side first:\n" + p.take(2500))
    // the event scans must prune to the three funnel columns
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("; ")
    assert(!schemas.contains("props") && !schemas.contains("event_id"),
      s"funnel must not scan unused event columns: $schemas")
  }

  test("q_retention pushes the conversion filter into the events scan") {
    val p = plan("q_retention")
    assert(p.contains("GreaterThan(value"),
      "the value>95 anchor filter must reach the parquet scan:\n" + p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q_length_batches: the assignment window is sharded, never global") {
    val p = plan("q_length_batches")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p.take(2000))
    assert(!windows.exists(_.contains("], [], [")),
      s"no window may run unpartitioned:\n${windows.mkString("\n")}")
    assert(windows.exists(w => w.contains("bucket") && w.contains("shard")),
      s"batch assignment must partition by (bucket, shard):\n${windows.mkString("\n")}")
  }

  test("q_char_diversity is narrow: no join, no exchange before the final sort") {
    val p = plan("q_char_diversity")
    // the higher-order-fold form exists to avoid the explode+groupBy
    // shuffle the oracle replays — a Join or aggregate Exchange here
    // means the narrow kernel regressed to the relational shape
    assert(!p.contains("Join"), "char diversity must not join:\n" + p.take(2500))
    assert(!p.contains("HashAggregate"),
      "char diversity must not aggregate (per-row fold only):\n" + p.take(2500))
  }

  test("q_outlier_mad broadcasts the stratum model on both joins") {
    val p = plan("q_outlier_mad")
    // a stratum-cardinality model must never shuffle the doc side
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "the (lang, med, mad) model must broadcast, not sort-merge:\n" + p.take(2500))
  }

  test("q_bitext_mine: broadcast source slice + map-side top-2 trim") {
    val p = plan("q_bitext_mine")
    assert(p.contains("BroadcastExchange"),
      "the source-language query slice must broadcast:\n" + p.take(2500))
    assert(p.contains("WindowGroupLimit"),
      "the per-src top-2 must trim before the src-keyed shuffle:\n" + p.take(2500))
  }

  test("q_zorder reads only the two clustering columns and aggregates on the range id") {
    val p = plan("q_zorder")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_custkey") && readSchema.contains("o_orderdate"), readSchema)
    assert(!readSchema.contains("o_totalprice"),
      s"the bit ladder must not widen the scan: $readSchema")
    // the interleave is pure projection arithmetic — no join anywhere
    assert(!p.contains("Join"), p.take(2000))
  }

  test("q_lsh_band_stats never joins: the audit predicts the join without running it") {
    val p = plan("q_lsh_band_stats")
    assert(!p.contains("Join"),
      "band stats must cost one signature pass, no candidate join:\n" + p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  // r13: the line family's scale claims — segmentation is a narrow
  // generator (explode, no join), dedup/reflow/boilerplate are hash
  // aggregates with PARTIAL (map-side) phases on explicit keys, and
  // nothing in the family joins non-equi or cartesian. A regression to
  // a windowed global sort or a nested-loop would still pass the value
  // oracle at sf0.01 and die at 100 TB.
  test("line family: hash aggregates with partial phases, equi-joins only, no corpus-wide window") {
    Seq("q_line_dedup", "q_doc_reflow", "q_line_freq_boilerplate",
        "q_doc_line_quality").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name must stay key-equi-joined:\n" + p.take(2000))
      assert(!p.contains("Window"), s"$name must not window over the corpus:\n" + p.take(2000))
      assert(p.contains("HashAggregate"), s"$name must hash-aggregate:\n" + p.take(1500))
      assert(p.contains("partial"), s"$name aggregates need a map-side partial phase:\n" + p.take(2000))
    }
  }

  test("q_graph_pagerank: every round joins and aggregates on doc_id, nothing cartesian") {
    val p = plan("q_graph_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pagerank rounds must stay key-equi-joined:\n" + p.take(2500))
  }

  // r10: the deletion-neighborhood rewrite must stay a pure equi-join on
  // (block, variant-hash) — the whole point was removing the in-block
  // quadratic stage, so any nested-loop/cartesian would be a regression
  // the value oracle cannot see at sf0.01
  test("q_fuzzy_match: deletion-variant candidates meet in an equi-join, never a cartesian") {
    val p = plan("q_fuzzy_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidates must be (block, vk)-keyed:\n" + p.take(2500))
  }

  // r10: the prefix-filter join's whole claim is that candidates meet
  // on a token-hash equi-join (broadcast df table under the ordering);
  // a cartesian anywhere would reintroduce exactly the blowup the
  // prefix filter exists to avoid
  test("q_jaccard_prefix: candidates meet on the token-hash equi-join, df table broadcasts") {
    val p = plan("q_jaccard_prefix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no cartesian/nested-loop anywhere:\n" + p.take(2500))
    assert(p.contains("BroadcastExchange"),
      "the vocab-df table must broadcast under the ordering:\n" + p.take(2500))
  }

  // r10: the KN score joins are against a vocab-bounded (Zipf) table —
  // all three levels must broadcast so the corpus gram stream never
  // shuffles for the lookup
  test("q_lm_score_kn: all three LM table levels broadcast under the gram stream") {
    val p = plan("q_lm_score_kn")
    assert(p.contains("BroadcastHashJoin"),
      "LM lookups must be broadcast hash joins:\n" + p.take(2500))
    assert(!p.contains("SortMergeJoin"),
      "no corpus-side shuffle for a vocab-sized lookup:\n" + p.take(2500))
  }

  // r10: the trained SemDeDup's ONLY nested-loop is the deliberate
  // broadcast-codebook argmax (rows x k model, k broadcast-sized); the
  // pair stage itself must stay a cell-keyed equi self-join
  test("q_semantic_dedup_trained: codebook broadcasts for the argmax; pairs stay cell-equi-joined") {
    val p = plan("q_semantic_dedup_trained")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the trained codebook must broadcast under the assignment:\n" + p.take(2500))
    assert(!p.contains("CartesianProduct"),
      "nothing may cartesian — the verify is cell-blocked:\n" + p.take(2500))
  }
}
