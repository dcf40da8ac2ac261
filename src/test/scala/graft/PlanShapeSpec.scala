package graft

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

import graft.operators.Relational

/** Regression locks for the scale anti-patterns removed in round 2:
  * windows that funnel unbounded input into one task per key, and
  * forced broadcasts of scale-proportional dimensions. These assert
  * plan SHAPE, not results — the oracles cover results.
  */
class PlanShapeSpec extends SparkSpecBase {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString
  }

  test("firewall first-match is a map-side partial aggregate, not a window") {
    val p = executedPlan("dam_firewall")
    assert(p.contains("partial_min_by"),
      "expected partial_min_by (map-side combine) in the firewall plan")
    assert(!p.contains("Window"),
      "firewall first-match must not rank with a window")
  }

  test("ANN rankings carry no per-query window funnel and stay in the SQL engine") {
    for (q <- Seq("emb_knn_brute", "emb_lsh_ann", "emb_ivf_ann",
      "emb_pq_ann", "emb_sq8_ann", "emb_ivfpq_res_ann", "emb_bq_ann",
      "emb_bq_indexed", "emb_knn_join")) {
      val p = executedPlan(q)
      assert(!p.contains("Window"), s"$q must use bounded top-k, got a Window")
      // the round-2 heap dropped to the RDD layer, severing codegen/AQE
      // at the scan→heap boundary — the CollectTopK aggregate must not
      assert(!p.contains("DeserializeToObject") && !p.contains("Scan ExistingRDD"),
        s"$q rank phase must not leave Tungsten (RDD drop-out)")
      assert(p.contains("collect_top_k"),
        s"$q must rank via the bounded-heap CollectTopK aggregate")
    }
  }

  test("set-similarity pipelines: no cartesian product, no window funnel") {
    for (q <- Seq("doc_jaccard_pairs", "doc_simhash_neardups",
        "doc_minhash_neardups")) {
      val p = executedPlan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must block/prefix-join, not cross-join the corpus")
      assert(!p.contains("Window"), s"$q must not rank with a window")
    }
  }

  test("decontamination probes the corpus with a broadcast benchmark, no cartesian") {
    val p = executedPlan("doc_decontam")
    assert(p.contains("BroadcastHashJoin"),
      "the benchmark gram set must broadcast — a shuffled semi-join " +
        "would repartition the full training gram stream")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "contamination probe must not shuffle the corpus side")
  }

  test("severity classify pre-aggregates rate counts instead of a full-row window") {
    val p = executedPlan("dam_severity")
    assert(!p.contains("Window"),
      "rate rule must join a pre-aggregated count, not window the full rows")
  }

  test("severity histogram total has no empty-partition window") {
    val p = executedPlan("dam_severity_histogram")
    assert(!p.contains("Window"))
  }

  test("top-per-source is a partial aggregate, not a low-cardinality window") {
    val p = executedPlan("doc_top_per_source")
    assert(p.contains("partial_min_by") && !p.contains("Window"))
  }

  test("only bounded dims carry broadcast hints in the warehouse joins") {
    def hints(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    val d = sf("sf0.001")
    // q5: exactly the region + (nation ⋈ region) hints — customer and
    // supplier grow with scale factor and must stay unhinted for AQE
    assert(hints(Relational.regionRevenue(spark, d)) == 2)
    assert(hints(Relational.topRevenueOrders(spark, d)) == 0)
    assert(hints(Relational.eventsBySegment(spark, d)) == 0)
    assert(hints(Relational.eventsPivot(spark, d)) == 0)
  }

  test("the planner still broadcasts the small customer side unhinted") {
    val df = Relational.topRevenueOrders(spark, sf("sf0.001"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "below-threshold customer should broadcast via AQE without a hint")
  }

  test("round-5 surface: gopher stays scan-local, perceptual dedup has no cartesian or window") {
    // the quality battery is pure per-row column math — any join or
    // window means a regression into shuffling the corpus
    val g = executedPlan("doc_quality_gopher")
    assert(!g.contains("Join") && !g.contains("Window"),
      "gopher battery must stay scan-local")
    // banded embedding near-dups and the media dedup pipelines must
    // candidate-block on equi-join keys, never cross-join, and never
    // rank with a window
    for (q <- Seq("emb_near_dups", "media_phash_clusters",
        "media_ahash_clusters", "media_video_clusters")) {
      val p = executedPlan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must block on band/hash keys, not cross-join")
      assert(!p.contains("Window"), s"$q must not rank with a window")
    }
  }

  test("substring dedup and semdedup block on keys, never cartesian or window") {
    // duplicateSpans: two window-hash shuffles + per-doc folds — the
    // occurrence filter must join on the 8-byte hash key, and nothing
    // may rank with a window
    val ds = executedPlan("doc_substring_dupes")
    assert(!ds.contains("CartesianProduct") && !ds.contains("Window"),
      "duplicateSpans must join on window-hash keys")
    // semDedup: the prune is a cid equi-join self-join — a cartesian
    // here means the clustered pair bound was lost
    val sd = executedPlan("emb_semdedup")
    assert(!sd.contains("CartesianProduct"),
      "semDedup prune must equi-join on cluster id")
    assert(!sd.contains("Window"), "semDedup must not rank with a window")
  }

  test("semantic decontam is one scan-local projection; linear quality broadcasts its dim") {
    // semanticDecontam itself: the eval set rides as literals — the
    // corpus max-cosine projection must not join or exchange (the
    // fixture's planted corpus adds its own join upstream, so lock
    // the operator over the raw table)
    val emb = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val dec = graft.operators.Similarity.semanticDecontam(
      emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") % 95 === 0))
    dec.collect()
    val d = dec.queryExecution.executedPlan.toString
    assert(!d.contains("Join") && !d.contains("CartesianProduct"),
      "semanticDecontam must be join-free (eval set is literal)")
    // doc_quality_linear: the B-bucket weight dim must reach the
    // (doc, bucket, tf) stream broadcast, never sort-merge
    val q = executedPlan("doc_quality_linear")
    assert(q.contains("BroadcastHashJoin"),
      "linearQuality must broadcast the weight dim")
    assert(!q.contains("SortMergeJoin"),
      "a sort-merge join here shuffles the tf stream a second time")
  }

  test("geo range join is a broadcast equi-join on prefix blocks, not a nested loop") {
    // the whole point of the prefix blocking: a naive range join is a
    // BroadcastNestedLoopJoin over every (row, range) pair
    val p = executedPlan("dam_geo_range")
    assert(p.contains("BroadcastHashJoin"),
      "range lookup must hash-join on the prefix block")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "range lookup must not degrade to a nested loop")
  }

  test("dsir weights broadcast the frequency dims; cluster-best keeps no window") {
    // dsirWeights: both corpus-wide frequency tables are KB-scale
    // roll-ups and must reach the doc×bigram stream as broadcast
    // joins — a sort-merge join here shuffles the whole bigram stream
    // twice more at corpus scale
    val dw = executedPlan("doc_dsir_weight")
    assert(dw.contains("BroadcastHashJoin"),
      "dsir frequency dims must broadcast")
    assert(!dw.contains("SortMergeJoin") && !dw.contains("CartesianProduct"),
      "dsir must not shuffle the bigram stream against the tiny dims")
    // bestInCluster: the survivor is a packed-struct max AGGREGATE —
    // a window over the cluster partition would sort every member of
    // a degenerate mega-cluster on one task
    val cb = executedPlan("doc_cluster_best")
    assert(!cb.contains("Window"),
      "cluster-best survivor must be an aggregate, not a window rank")
    assert(!cb.contains("CartesianProduct"))
    // dedupLines: df counting and the hot semi-join run on the 8-byte
    // line hash; reassembly is a scan-local index filter — no window
    // rank, no cartesian, and no sort of the line stream
    val ld = executedPlan("doc_line_dedup")
    assert(!ld.contains("Window") && !ld.contains("CartesianProduct"),
      "line dedup must block on hash keys and reassemble scan-locally")
  }

  test("round-6 surface: perturbation-recall rows join on keys, never cartesian") {
    // the arithmetic truth joins key on id % groups / grp — Catalyst
    // must plan them as hash joins on the modulo expression, and the
    // found-vs-truth overlay is a plain equi-join on the pair ids
    for (q <- Seq("media_phash_recall", "media_ahash_recall",
        "media_video_recall")) {
      val p = executedPlan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q truth/overlay joins must stay equi-joins")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q truth/overlay joins must not fall back to BNL")
    }
  }

  test("exact/fingerprint dup groups aggregate per digest, never a digest window") {
    // round-6 judge finding: a mega-duplicated digest (empty docs,
    // boilerplate) must cost one aggregate row + a streamed join
    // fan-out, not a sorted window partition holding the whole group
    for (q <- Seq("doc_dedup_exact", "doc_dedup_fingerprint")) {
      val p = executedPlan(q)
      assert(!p.contains("Window"),
        s"$q must groupBy the digest and join back, not window over it")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("bloom novel-docs: corpus scan filtered by the sketch predicate, no corpus shuffle") {
    val p = executedPlan("doc_bloom_novel")
    // the reference corpus must meet the sketch as a scan predicate
    // (the codegen'd might_contain literal), not via a join
    assert(p.contains("might_contain"),
      "reference scan must be pruned by the bloom predicate")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "bloom verify must stay an equi anti-join")
    // exactly the two scans: batch (bloom build ran before planning;
    // its result is a literal) + reference; the anti-join's right side
    // is the pruned survivor set, broadcast by AQE at any sane fpp
    assert(p.contains("LeftAnti"),
      "exactness comes from the anti-join verify stage")
  }

  test("simhash novel-docs: scan-local sketch, bloom prune, no corpus shuffle before verify") {
    val p = executedPlan("doc_simhash_novel")
    assert(p.contains("md5_simhash60"),
      "corpus sketches must be the scan-local native expression")
    assert(p.contains("might_contain"),
      "corpus scan must be pruned by the bloom-of-batch-keys predicate")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "corpus side must never shuffle/cartesian before the verify")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"))
  }

  test("embedding novel-batch: slim banded corpus scan, bloom prune, no corpus shuffle before verify") {
    val p = executedPlan("emb_novel")
    assert(p.contains("might_contain"),
      "corpus scan must be pruned by the bloom-of-batch-band-keys predicate")
    // every join on the corpus lineage is a broadcast equi-join (batch
    // band keys, candidate ids, batch vectors); a sort-merge join
    // would mean the corpus shuffled before the survivor verify
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "corpus side must never shuffle/cartesian before the verify")
    assert(p.contains("BroadcastHashJoin"),
      "band-collision check and candidate fetch must be broadcast equi-joins")
    assert(p.contains("LeftAnti"),
      "novelty is the batch anti-join of the verified loser set")
  }

  test("chunking is scan-local: no exchange, no window, one scan") {
    val p = executedPlan("doc_chunks")
    // the final orderBy is a global sort (range exchange) — everything
    // under it must be generate-over-scan with no hash shuffle
    assert(!p.contains("hashpartitioning"),
      "chunking must not hash-shuffle; windows are cut in the scan task")
    assert(!p.contains("Window"), "chunking must not use a window")
    assert(p.contains("Generate"), "expected posexplode Generate node")
  }

  test("minhash novel-docs: scan-local band keys, bloom prune, no corpus shuffle before verify") {
    val p = executedPlan("doc_minhash_novel")
    // corpus band keys must come from the native scan-local expression
    // (a groupBy signature pass would shuffle the corpus before any
    // prune exists), and the sketch must meet the scan as a predicate
    assert(p.contains("minhash_band_keys"),
      "corpus band keys must be the scan-local native expression")
    assert(p.contains("might_contain"),
      "corpus scan must be pruned by the bloom-of-batch-keys predicate")
    // every join on the corpus lineage is a broadcast equi-join (batch
    // band keys + batch shingle sets); a sort-merge join here means
    // the corpus side shuffled before the survivor verify
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "corpus side must never shuffle/cartesian before the verify")
    assert(p.contains("BroadcastHashJoin"),
      "band-collision check must be a broadcast equi-join")
    assert(p.contains("LeftAnti"),
      "novelty is the batch anti-join of the verified loser set")
  }

  test("bm25 indexed probe: postings scan pruned to the query-term bucket partitions, composite df reads never re-tokenize the corpus") {
    val p = executedPlan("doc_bm25_indexed")
    // the whole point of the bucket layout: the probe's driver-side
    // bucket list must reach the postings scan as a PARTITION filter
    // (pruned directories, not a post-scan predicate). Spark
    // truncates the INSET list in the plan string, so match the
    // filter's head, not its closing bracket.
    assert("PartitionFilters: \\[bucket#\\d+L? INSET".r
      .findFirstIn(p).isDefined,
      "postings scan must carry the bucket partition filter:\n" +
        p.linesIterator.filter(_.contains("PartitionFilters"))
          .mkString("\n"))
    // the index exists so the probe never re-tokenizes the corpus:
    // the only text split sites allowed are the QUERY side's (its
    // lineage appears once per consumer); the postings/df/stats scans
    // must stay pure count reads — their FileScan lines carry no
    // split()
    val corpusScanSplits = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("graft-ivf-index"))
      .count(_.contains("split("))
    assert(corpusScanSplits == 0,
      "index scans must read stored counts, never re-tokenize")
    // the ONE BroadcastNestedLoopJoin here is bm25Rank's deliberate
    // 1-row stats cross join (a scalar broadcast, not a blow-up);
    // a cartesian over real relations is still forbidden
    assert(!p.contains("CartesianProduct"))
  }

  test("gram-index probe: postings scan pruned to the suite's gram buckets, index scans never re-shingle text") {
    val p = executedPlan("doc_decontam_indexed")
    // the suite's gram hashes reach the postings scan as a PARTITION
    // filter — the decontam probe reads pruned bucket directories
    assert("PartitionFilters: \\[bucket#\\d+L? INSET".r
      .findFirstIn(p).isDefined,
      "postings scan must carry the bucket partition filter:\n" +
        p.linesIterator.filter(_.contains("PartitionFilters"))
          .mkString("\n"))
    // the index exists so screening never re-shingles the CORPUS:
    // the only split()/shingle lineage allowed is the KB-scale suite
    // side's; postings/docdim scans stay pure 8-byte-key reads
    val indexScanSplits = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("graft-ivf-index"))
      .count(_.contains("split("))
    assert(indexScanSplits == 0,
      "index scans must read stored hashes, never re-shingle")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("prefix-IVF probe: coarse pass scans only the probed prefix lists (cid partition filter), bounded top-k, no cartesian") {
    val p = executedPlan("emb_prefix_ivf_indexed")
    // the nprobe nearest lists reach the prefix scan as a PARTITION
    // filter — the coarse pass is a pruned-list scan, not the flat
    // layout's full corpus scan (the round-11 verdict #1 gap)
    assert("PartitionFilters: \\[cid#\\d+ IN".r.findFirstIn(p).isDefined,
      "prefix scan must carry the cid partition filter:\n" +
        p.linesIterator.filter(_.contains("PartitionFilters"))
          .mkString("\n"))
    assert(!p.contains("Window"),
      "both ranking stages must use bounded top-k")
    assert(p.contains("collect_top_k"))
    assert(!p.contains("CartesianProduct"),
      "the pruned coarse pass must join on cid, never cross-join")
    // FILTERED search: the metadata predicate reaches the SAME pruned
    // scan as a pushed parquet filter (the layout carries the column)
    // — never a post-scan drop of most of the scanned bytes
    val pf = executedPlan("emb_prefix_ivf_filtered")
    assert("PartitionFilters: \\[cid#\\d+ IN".r.findFirstIn(pf).isDefined)
    assert("PushedFilters: \\[[^\\]]*In\\(label".r.findFirstIn(pf).isDefined,
      "label predicate must push into the pruned prefix scan:\n" +
        pf.linesIterator.filter(_.contains("PushedFilters"))
          .mkString("\n"))
  }

  test("bloom split-leakage: train scan pruned by the holdout sketch, no train-scale broadcast") {
    val p = executedPlan("doc_split_leakage_bloom")
    assert(p.contains("might_contain"),
      "train scan must be pruned by the holdout bloom predicate")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the leakage semi-join must stay an equi join")
  }
}
