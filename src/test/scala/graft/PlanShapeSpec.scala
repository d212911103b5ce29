package graft

/**
 * Plan-shape invariants over the ENTIRE registered query surface
 * (SURVEY.md §4): the properties that decide whether a plan survives a
 * 100× scale-up, asserted at sf0.001 so regressions surface in CI, not
 * on the cluster.
 */
class PlanShapeSpec extends SparkSpec {

  test("filtered serving with a stored slice count runs NO job at " +
      "serve-plan time; the fallback path pays a counting job " +
      "(r18 watch-item 1)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = (0L until 64L).map(i =>
        (i, Seq.tabulate(4)(d => ((i + d) % 5 + 1).toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
    val q = e.orderBy(col("vec_id")).limit(1)
    // the HIGHEST retained job id, not the retained COUNT: the status
    // tracker evicts old jobs past spark.ui.retainedJobs (default
    // 1000), so in a shared-session suite that has already run ≥1000
    // jobs the count can go DOWN between samples (observed 1000→902)
    // and a count-based "a job ran" check inverts. Job ids are
    // monotonic, so the max only moves when a NEW job really ran.
    def jobsNow(): Int = spark.sparkContext.statusTracker
      .getJobIdsForGroup(null).foldLeft(-1)(math.max)
    def settle(prev: Int, expectMore: Boolean): Int = {
      // statusTracker is listener-fed (async): poll to a deadline
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var cur = jobsNow()
      while (expectMore == (cur == prev) && System.nanoTime() < deadline) {
        Thread.sleep(100); cur = jobsNow()
      }
      cur
    }
    val before = jobsNow()
    // stored count provided, below threshold → exact arm, pure plan
    // construction: NO Spark job may run (the r18 per-call sub.count()
    // is exactly the job this asserts away)
    graft.ann.Ann.filteredTopK(e, col("label") === 1, col("label") === 1,
      Seq("label"), q, 3, exactThreshold = 20L, sliceCount = Some(16L))
    val after = settle(before, expectMore = false)
    assert(after == before,
      s"serving with a stored count ran ${after - before} job(s) at " +
        "plan time — the decision must be O(1)")
    // no stored count → the documented fallback counts the slice NOW
    graft.ann.Ann.filteredTopK(e, col("label") === 1, col("label") === 1,
      Seq("label"), q, 3, exactThreshold = 20L)
    val after2 = settle(after, expectMore = true)
    assert(after2 > after,
      "the ad-hoc fallback should pay a counting job (did the arm " +
        "decision silently stop counting?)")
  }

  test("no registered query plans a CartesianProduct") {
    // Single-row query-vector joins broadcast (BroadcastNestedLoopJoin
    // over a 1-row side is fine); an unconstrained CartesianProduct of
    // two corpus-sized sides is never acceptable.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf001).queryExecution.sparkPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${plan.take(1500)}")
    }
  }

  test("round-13 quota/repetition/guard families keep their scale shapes") {
    // topic quota: nothing globally sorts — the admission prefix sum is
    // the (cell, bucket) two-pass form. (The centroid-broadcast shape of
    // the assignment itself is pinned on Ann.ivfAssign in the semantic-
    // dedup test below; here the doc-topic join is checkpointed before
    // the final plan, so the assignment subtree is already materialized.)
    val tq = SparkEntry.queries("corpus_topic_quota")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!tq.toLowerCase.contains("rangepartitioning"),
      s"corpus_topic_quota globally sorts:\n${tq.take(1200)}")
    // repetition: the plan's two scalar totals ride as one-row
    // broadcasts; the executed multiset never globally sorts and keeps
    // the explode (a ≤RepMaxEpochs Generate, not a join)
    val up = SparkEntry.queries("corpus_upsample")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(up.contains("Generate"),
      s"corpus_upsample lost its epoch explode:\n${up.take(1200)}")
    assert(!up.toLowerCase.contains("rangepartitioning"),
      s"corpus_upsample globally sorts:\n${up.take(1200)}")
    // the split guard's probe join: the persisted eval band artifact is
    // the tiny side and must broadcast against the probe stream (assert
    // on the batch analog — same operators, same sizes)
    val d = graft.sources.Sources.table(spark, sf001, "documents")
    val bands = spark.read.parquet(DedupQueries.ensureEvalBands(spark, sf001))
    val probe = graft.streaming.Admission.bandProbes(d)
      .join(bands, Seq("k1", "k2"))
      .queryExecution.executedPlan.toString
    assert(probe.contains("BroadcastHashJoin"),
      s"band probe join lost the artifact broadcast:\n${probe.take(1200)}")
  }

  test("semantic dedup broadcasts centroids; DSIR cutoff avoids a global sort") {
    // dedup_semantic's cell assignment is an argmax-dot over the
    // broadcast centroid sample — the corpus must meet it in a
    // broadcast nested loop, never a shuffle join. Assert on the
    // assignment subplan itself: in the composed query the in-cell
    // pair stage's eager lineage cut (bucketPairs' localCheckpoint)
    // materializes the assignment during query CONSTRUCTION, so
    // whether the broadcast survives into the composed plan string
    // depends on derived geometry (and flipped when the driver
    // regenerated the testdata with different file sizes).
    val embT = graft.sources.Sources.table(spark, sf001, "embeddings")
    val asg = graft.ann.Ann.ivfAssign(embT, graft.ann.Ann.ivfCentroids(embT))
      .queryExecution.executedPlan.toString
    assert(asg.contains("BroadcastNestedLoopJoin"),
      s"IVF assignment lost its centroid broadcast:\n${asg.take(1200)}")
    // and the composed query must never shuffle-join two corpus-sized
    // sides: its one allowed shuffle join is the final survivors
    // anti-join of (corpus ids) × (dropped ids)
    val sem = SparkEntry.queries("dedup_semantic")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(sem.count(_ == '\n') < 400 && !sem.contains("CartesianProduct"),
      s"dedup_semantic composed plan degenerated:\n${sem.take(1200)}")
    // corpus_dsir's keep cutoff comes from the bounded histogram walk;
    // a RangePartitioning exchange would mean a global sort snuck in
    val dsir = SparkEntry.queries("corpus_dsir")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(dsir.contains("BroadcastExchange"),
      s"corpus_dsir lost its model broadcast:\n${dsir.take(1200)}")
    assert(!dsir.toLowerCase.contains("rangepartitioning"),
      s"corpus_dsir selection must not globally sort:\n${dsir.take(1200)}")
  }

  test("filtered event scans push predicates into the parquet reader") {
    // other suites may have cached the events table (IndexSpec does);
    // cached plans serve InMemoryTableScan and hide the file pushdown
    spark.catalog.clearCache()
    for (q <- Seq("scan_filter_eq", "scan_filter_cmp", "scan_time_bounds")) {
      val plan = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") &&
        !plan.contains("PushedFilters: []"),
        s"$q lost its parquet pushdown:\n${plan.take(1200)}")
    }
  }

  test("multimodal meta queries rebalance before the CPU-bound decode") {
    // documents at test scale is one small parquet file → one input
    // partition; generating + decoding payloads is the one genuinely
    // CPU-bound stage, so the plan must show a round-robin exchange
    // ahead of the decode mapPartitions or all but one core idles
    for (q <- Seq("multimodal_image_meta", "multimodal_audio_meta",
                  "multimodal_video_meta")) {
      val plan = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Exchange RoundRobinPartitioning"),
        s"$q is partition-capped — no rebalance exchange:\n${plan.take(1200)}")
    }
  }

  test("quantile queries aggregate a bounded histogram, not exact percentile state") {
    // exact `percentile` merges a map of every distinct value into one
    // final task — unbounded at scale; the bucket-bounded lquantize
    // walk (plans.Quantiles) must be what actually plans
    for (q <- Seq("q_percentiles", "text_ppl_buckets")) {
      val plan = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.sparkPlan.toString
      assert(!plan.toLowerCase.contains("percentile"),
        s"$q still plans an exact percentile aggregate:\n${plan.take(1200)}")
    }
  }

  test("incremental dedup touches the old corpus only via its signature store") {
    val plan = SparkEntry.queries("dedup_incremental")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-sigstore"),
      s"dedup_incremental does not read the signature store:\n${plan.take(1200)}")
    // every documents scan carries the NEW-batch filter; the old
    // snapshot's rows are never re-read or re-signed. Spark renders the
    // old-side `% 3 <> 0` as `NOT ((doc_id#… % 3) = 0)` — assert THAT
    // form's absence (the `<> 0` spelling never appears in a plan, so
    // checking it would be vacuous).
    assert(plan.contains("% 3) = 0") && !plan.contains("NOT ((doc_id"),
      s"dedup_incremental rescans the old snapshot:\n${plan.take(1200)}")
  }

  test("chained incremental dedup reads old data AND batch A only via the updated store") {
    val plan = SparkEntry.queries("dedup_incremental2")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-sigstore"),
      s"dedup_incremental2 does not read the signature store:\n${plan.take(1200)}")
    // the query plans only batch B's documents scan: the old snapshot
    // (% 3 <> 0, rendered NOT (… % 3) = 0) and batch A (% 6 = 0) both
    // arrive pre-signed through the chained store parquet — so NO % 3
    // filter of either polarity may appear at all
    assert(plan.contains("% 6) = 3") && !plan.contains("% 3)") &&
      !plan.contains("% 6) = 0"),
      s"dedup_incremental2 rescans a prior snapshot/batch:\n${plan.take(1200)}")
  }

  test("dimension joins broadcast the small side") {
    val plan = SparkEntry.queries("q3_shipping")(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  test("decontamination semi-joins against BROADCAST eval shingles") {
    // the eval set must never force a corpus shuffle: the corpus side
    // reads, shingles, and semi-joins map-side at any corpus size
    val plan = SparkEntry.queries("corpus_decontam")(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(1500))
  }

  test("id-bucketed tables co-locate the integrity join: zero id shuffles") {
    // the §4 claim made checkable: over bucketBy(16, id) tables, the
    // per-id aggregations and the full-outer id join consume the
    // scan's bucket partitioning, so the only exchange in the whole
    // plan is the final single-row rollup. The unbucketed twin plans
    // id-hash exchanges; the bucketed one must plan none.
    DedupQueries.ensureBucketedTables(spark, sf001)
    val plan = SparkEntry.queries("corpus_integrity_bucketed")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"bucketed gate is not reading bucketed scans:\n${plan.take(1200)}")
    // the groupBys key on the raw columns (doc_id/vec_id) before the
    // id alias; no id-keyed exchange of ANY name may survive
    val idExchange = "Exchange hashpartitioning\\((doc_|vec_)?id".r
    assert(idExchange.findFirstIn(plan).isEmpty,
      s"bucketed integrity join still shuffles on the id:\n${plan.take(1500)}")
    val unbucketed = SparkEntry.queries("corpus_integrity")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(idExchange.findFirstIn(unbucketed).isDefined,
      "control: the unbucketed twin should need id exchanges " +
        s"(did the plan change?):\n${unbucketed.take(1200)}")
  }

  test("per-source top-k shuffles scored triples by source, never globally sorts") {
    val plan = SparkEntry.queries("corpus_topk_quality")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("hashpartitioning(source"),
      s"top-k lost its by-source partitioning:\n${plan.take(1200)}")
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"top-k must not globally sort:\n${plan.take(1200)}")
  }

  test("bloom decontam probes as a pure filter — no join, no shuffle before it") {
    // the Bloom pass's point at 100 TB: the corpus meets the filter as
    // a codegen'd Filter over the scan (bit array rides the plan as a
    // literal), NOT as a join. The plan's only joins belong to the
    // exact-verify pass over the tiny flagged set, which must meet the
    // corpus by broadcast.
    val df = SparkEntry.queries("corpus_decontam_bloom")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"bloom decontam shuffle-joins a corpus side:\n${plan.take(1500)}")
    // the probe itself: a Filter containing the element_at bit tests
    assert(plan.contains("element_at"),
      s"bloom probe filter missing from the plan:\n${plan.take(1500)}")
  }

  test("unigram logprob joins the vocabulary broadcast, never shuffling the corpus") {
    val plan = SparkEntry.queries("text_logprob")(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    // the vocabulary CAP must plan as a distributed partial top-N
    // (TakeOrderedAndProject), not a global Sort of the vocab — and the
    // OOV semantics make it an outer (left) broadcast join
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(plan.contains("LeftOuter"), plan.take(1500))
  }

  test("bigram LM: every model table broadcast, pair cap a partial top-N") {
    // three bounded model tables (capped vocab, capped bigram table,
    // context counts) all meet the token stream as broadcast joins —
    // a SortMergeJoin would mean corpus tokens shuffled on a model
    // key; both caps must plan as TakeOrderedAndProject, not a global
    // sort of the (corpus-scale) pair vocabulary
    val plan = SparkEntry.queries("text_logprob2")(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("as-of join plans as union + window — no join operator at all") {
    val plan = SparkEntry.queries("q_asof_join")(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("Window") && !plan.contains("Join"), plan.take(1500))
  }

  test("PQ scoring joins the codebook LUT broadcast, never shuffled") {
    val plan = SparkEntry.queries("ann_pq")(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("composed IVF+PQ: cell pruning and codebooks broadcast, corpus never sort-merge-joined") {
    val plan = SparkEntry.queries("ann_ivfpq")(spark, sf001)
      .queryExecution.sparkPlan.toString
    // the cell-list join, the codebook encode join, and the LUT score
    // join must all broadcast their small side; a SortMergeJoin anywhere
    // means corpus-sized data shuffled on a join key
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"),
      s"ann_ivfpq shuffles a join side:\n${plan.take(1500)}")
  }

  test("batch IVF+PQ serving: codes statically pruned, never shuffled on a join key") {
    // the production batch path must keep the single-query path's scale
    // shape: the probed-cell literals reach the cell-partitioned code
    // scan as static partition filters, and every join (cell map, LUT)
    // broadcasts its small side — a SortMergeJoin anywhere means the
    // code table shuffled on a join key. The only exchanges allowed are
    // the (qid, id) partial-sum agg and the per-qid ranking window,
    // both over probed-candidate rows.
    val plan = SparkEntry.queries("ann_ivfpq_batch")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partitionfilters: [cell") &&
      plan.toLowerCase.contains(" in ("),
      s"no static partition pruning on the code table:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"ann_ivfpq_batch shuffles a join side:\n${plan.take(1500)}")
  }

  test("incremental IVF+PQ serving keeps static pruning over the appended layout") {
    // appending the new batch's files per cell must leave the serving
    // plan untouched: probed-cell literals still reach the scan as
    // static partition filters, and nothing shuffles on a join key —
    // the append is invisible to the reader, which is the point of
    // appending per cell instead of rewriting
    val plan = SparkEntry.queries("ann_ivfpq_incremental")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partitionfilters: [cell") &&
      plan.toLowerCase.contains(" in ("),
      s"no static partition pruning on the appended code table:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"ann_ivfpq_incremental shuffles a join side:\n${plan.take(1500)}")
  }

  test("filtered IVF over persisted cells: label filter pushed to the scan, no corpus rejoin") {
    // attribute storage is the point of ivfAssign(keep): over the
    // persisted cell-partitioned assignment, a filtered search's
    // predicate must reach the parquet scan as a pushed data filter —
    // evaluated inside the probed cell files — and the plan must hold
    // NO join that rejoins the corpus to fetch attributes, and no
    // shuffle join at all (the probe set broadcasts).
    val embT = graft.sources.Sources.table(spark, sf001, "embeddings")
    val cents = graft.ann.Ann.ivfCentroids(embT)
    val dir = java.nio.file.Files.createTempDirectory("graft-filt").toString
    graft.ann.Ann.ivfAssign(embT, cents, keep = Seq("label"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val served = graft.ann.Ann.ivfTopKAssigned(
      spark.read.parquet(dir)
        .where(org.apache.spark.sql.functions.col("label") === 3),
      cents, embT.orderBy(org.apache.spark.sql.functions.col("vec_id"))
        .limit(1), 10)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(label,3"),
      s"label predicate not pushed into the cell scan:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"filtered serve shuffles a join side:\n${plan.take(1500)}")
  }

  test("document and embedding scans prune to the referenced columns") {
    // a corpus scan that reads all columns for a two-column projection
    // is a 100 TB mistake hidden at test scale — pin the parquet
    // ReadSchema, not just the logical projection
    spark.catalog.clearCache()
    for (q <- Seq("text_tokens", "text_tokens_bpe")) {
      val t = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(t.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        s"$q reads more than (doc_id, text):\n${t.take(1000)}")
    }
    val a = SparkEntry.queries("ann_topk")(spark, sf001)
      .queryExecution.executedPlan.toString
    // label is the one column no ANN query needs — it must not be read
    assert(a.contains("vec_id") && a.contains("embedding:array<float>") &&
      !a.contains("label"), a.take(1000))
  }

  test("round-11 ops keep their claimed shuffle/broadcast shapes") {
    def planOf(q: String) = SparkEntry.queries(q)(spark, sf001)
      .queryExecution.executedPlan.toString
    def exchanges(p: String) =
      p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // dedup_chunks: exactly the two inherent corpus shuffles (hash-pair
    // winner election, doc reassembly) — and winner election is an
    // aggregate, never a corpus-partition window
    val chunks = planOf("dedup_chunks")
    // 2 when the winner table broadcasts (test scale), 3 when both join
    // sides exchange on the hash pair (corpus scale) — never more
    assert(exchanges(chunks) <= 3, s"dedup_chunks exchanges:\n$chunks")
    assert(!chunks.contains("Window"),
      s"chunk winner election must not be a window:\n${chunks.take(1200)}")
    // text_collocations: unigram/totals meet the pair table as
    // broadcasts; the only hash exchanges are the two count groupBys
    val coll = planOf("text_collocations")
    assert(coll.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"collocations lost a broadcast:\n${coll.take(1200)}")
    // pair groupBy + the vocab-bounded unigram agg once per broadcast
    // side — every exchange carries vocab-shaped rows, never the corpus
    assert(exchanges(coll) <= 3, s"collocations exchanges:\n$coll")
    // text_quality_model: one doc-keyed exchange, weight is inline
    // arithmetic (no join at all)
    val qm = planOf("text_quality_model")
    assert(exchanges(qm) == 1 && !qm.contains("Join"),
      s"quality model shape:\n${qm.take(1200)}")
    // q_funnel: three stage windows + final agg share ONE exchange
    assert(exchanges(planOf("q_funnel")) == 1, planOf("q_funnel"))
    // q_interval_join: equi join, never nested-loop over two real sides
    val ij = planOf("q_interval_join")
    assert(!ij.contains("CartesianProduct") &&
      !ij.contains("BroadcastNestedLoopJoin"), ij.take(1200))
  }

  test("trigram LM: every model table broadcast, corpus never sort-merge-joined") {
    // five model-table joins (uni, bi, ctx2, tri, ctx3) must all meet
    // the token sequence as broadcasts — the tables are capped/vocab²-
    // bounded by construction; a sort-merge join would mean a corpus
    // shuffle on token keys snuck in
    val p = SparkEntry.queries("text_logprob3")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 5,
      s"trigram lost a model broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      s"trigram corpus shuffled on a model key:\n${p.take(1500)}")
  }

  test("every global window (no partition spec) sits above a bounded subplan") {
    // A WindowExec with an empty partitionSpec funnels its whole input
    // through ONE task — acceptable only when that input is bounded by
    // construction: below a TakeOrdered/limit cut (rrf rank windows) or
    // above an aggregate whose grouping is a value-grid histogram /
    // capped key set (quantile bucket walks), never a raw corpus scan.
    // This pins the source of the benign `WindowExec: No Partition
    // Defined` warnings so a refactor can't silently widen one.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    def bounded(p: SparkPlan): Boolean = p.find {
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
      // an eager lineage cut (localCheckpoint) of an already-cut list
      // surfaces as an RDD scan; those cuts are themselves asserted by
      // the producing queries, so a pre-materialized input counts as
      // bounded only when it is the window's whole subtree
      case r: org.apache.spark.sql.execution.RDDScanExec => r eq p
      // a LocalTableScan is driver-materialized rows (a drained
      // streaming-state histogram) — bounded before it ever became a plan
      case _: org.apache.spark.sql.execution.LocalTableScanExec => true
      case _ => false
    }.isDefined
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sf001).queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
            s"$name: global window over unbounded input:\n" +
              w.toString.take(800)
        }
    }
    assert(offenders.isEmpty, offenders.mkString("\n---\n"))
  }

  test("round-14 additions keep their scale shapes") {
    // HTML extraction is a PURE per-row map: no exchange, no join —
    // one scan-project pipeline (the linear stage-0 shape)
    val ex = SparkEntry.queries("text_extract_html")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!ex.contains("Exchange") && !ex.contains("Join"),
      s"text_extract_html must stay a per-row map:\n${ex.take(1200)}")
    // semantic decontam: the eval matrix rides the plan — no join at
    // all, and the one pass stays whole-stage-codegen'd
    val sd = SparkEntry.queries("corpus_decontam_semantic")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!sd.contains("Join"),
      s"corpus_decontam_semantic must not join:\n${sd.take(1200)}")
    assert(sd.contains("graft_dot_batch"),
      "the fused batch-dot kernel must be in the plan")
    // known-item BM25: the query-term and df sides BROADCAST (they are
    // vocabulary/eval-bounded); the posting side never re-sorts
    val kb = SparkEntry.queries("retrieval_recall_bm25")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(kb.contains("BroadcastHashJoin"),
      s"known-item scoring must broadcast the bounded sides:\n${kb.take(1200)}")
    // mix solver: everything after the per-source aggregate runs on the
    // config-bounded source table — no corpus-sized range partitioning
    val ms = SparkEntry.queries("corpus_mix_solve")(spark, sf001)
      .queryExecution.executedPlan.toString
    val corpusSorts = ms.split("\n").count(l =>
      l.contains("rangepartitioning") && !l.contains("key"))
    assert(corpusSorts == 0,
      s"mix solver must only sort the source table:\n${ms.take(1200)}")
    // chunk decontam: the eval side reaches the corpus ONLY as a
    // broadcast (the contaminatedIds discipline)
    val cd = SparkEntry.queries("corpus_decontam_chunks")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(cd.contains("BroadcastHashJoin"),
      s"chunk decontam must broadcast eval shingles:\n${cd.take(1200)}")
  }

  test("CDC cut array stays a staged projection attribute (the 140x round-16 fix)") {
    // The md5 boundary filter (Dedup.cdcCuts) must survive optimization
    // as its OWN aliased projection, referenced by the chunk-assembly
    // generator as an attribute. If a future optimizer change collapses
    // the stage (inlining the filter into the Generate's lambda), the
    // whole per-token digest filter re-evaluates per output chunk —
    // O(chunks × tokens) digests, measured 199 s for 5k docs at sf0.1
    // before the fix — while every correctness gate stays green. Pin:
    // the optimized plan still carries the __cuts alias in a Project
    // below the Generate.
    import org.apache.spark.sql.functions.col
    val d = graft.sources.Sources.table(spark, sf001, "documents")
    val plan = graft.dedup.Dedup
      .cdcChunkHashRows(d, "doc_id", "text", graft.dedup.Dedup.CdcAvgWidth)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__cuts"),
      s"the CDC cut stage collapsed into the generator — the md5 filter " +
        s"now re-evaluates per output chunk:\n${plan.take(1500)}")
    // same discipline on the streaming probe's chunk rows
    val probe = graft.streaming.Admission
      .probeRows(d.select(col("doc_id"), col("text")), cdc = true,
        kinds = Set(2))
      .queryExecution.optimizedPlan.toString
    assert(probe.contains("__cdccuts"),
      s"the streaming CDC cut stage collapsed:\n${probe.take(1500)}")
  }

  test("lineage policy: reliable mode is a pure wall-clock/fault-tolerance " +
      "trade — identical results on the iterative paths (r16 verdict 3)") {
    import graft.plans.Lineage
    // the misconfiguration is a real error, not a silent local fallback
    // (guarded: another test in this JVM may already have set the dir)
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(Lineage.ModeKey, "reliable")
      try intercept[IllegalStateException] {
        Lineage.cut(spark.range(1).toDF())
      } finally spark.conf.set(Lineage.ModeKey, "local")
    }
    // doubles compare at 12 significant digits: the reliable mode's FS
    // round-trip can reorder a floating-point summation by one ULP
    // (observed on sourceRank's src19: …27 vs …25 in the 17th digit) —
    // execution-order noise, not a semantics change. Everything else
    // (ids, counts, strings) must match exactly.
    def collect(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf001).collect()
        .map(_.toSeq.map {
          case d: Double => f"$d%.12g"
          case f: Float => f"$f%.6g"
          case v => String.valueOf(v)
        }.mkString("[", ",", "]")).sorted.toSeq
    // cover the three families the knob exists for: sourceRank's
    // PageRank states, pipelineStages' stage frames (corpus_pipeline),
    // and the admission chain's probe frames (dedup_incremental)
    val names = Seq("corpus_source_rank", "corpus_pipeline",
      "dedup_incremental")
    val local = names.map(n => n -> collect(n)).toMap
    spark.conf.set(Lineage.ModeKey, "reliable")
    spark.conf.set(Lineage.DirKey, "/tmp/graft-test-ckpt")
    try names.foreach { n =>
      assert(collect(n) == local(n),
        s"$n results differ between lineage modes")
    } finally spark.conf.set(Lineage.ModeKey, "local")
    // and the reliable run really did write checkpoint files
    assert(spark.sparkContext.getCheckpointDir.nonEmpty)
  }
}
