package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the scale properties this library
  * is designed around (pushdown into the scan, broadcast of small
  * sides, map-side partial aggregation, rank-limit pushdown,
  * partitioning reuse) are asserted on the PLAN, not just observed in
  * PLANS.md — a refactor that silently turns a broadcast join into a
  * shuffle join or drops a pushed filter fails here long before it
  * shows up as a 100 TB regression.
  */
class PlanShapeSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local("graft-plan-test", cores = 4)

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("q02: range + equality predicates are pushed into the parquet scan") {
    // plan toString truncates long filter lists, so assert on the
    // earliest pushed entries (the EqualTo lands beyond the cutoff)
    val p = plan("q02_date_range_filter")
    assert(p.contains("PushedFilters"))
    assert(p.contains("IsNotNull(o_orderstatus)"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"))
  }

  test("q01: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"))
  }

  test("q03: all three dimension joins broadcast — the fact never shuffles for a join") {
    assert(count(plan("q03_star_join"), "BroadcastHashJoin") == 3)
  }

  test("q13: anti-join is hint-free on distinct keys; AQE still broadcasts when it fits") {
    // open orders are a data-dependent fraction of the fact table — a
    // forced broadcast of that side cannot fall back at 100 TB. The
    // join must be hint-free over the DISTINCT key set; AQE picks
    // broadcast from the distinct frame's REAL runtime size.
    val df = SparkEntry.queries("q13_queue_skip_antijoin")(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"))
    assert(!analyzed.contains("UnresolvedHint"))
    assert(analyzed.contains("Deduplicate") || analyzed.contains("Distinct") ||
           analyzed.contains("Aggregate"), "open-order side lost its distinct")
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "AQE did not upgrade the distinct-key set to a broadcast anti-join")
  }

  test("q18: latest-per-key side is hint-free; AQE still broadcasts when it fits") {
    // one row per customer-with-orders — bounded by USERS, the class
    // q40/d10 de-hinted; must not carry a forced broadcast
    val df = SparkEntry.queries("q18_metadata_upsert")(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"))
    assert(!analyzed.contains("UnresolvedHint"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "AQE did not upgrade the latest-per-key frame to a broadcast join")
  }

  test("q08: merge window gets the map-side rank-limit (WindowGroupLimit)") {
    assert(plan("q08_merge_upsert").contains("WindowGroupLimit"))
  }

  test("t06: heavy hitters get map-side partial counts AND a map-side rank limit") {
    val p = plan("t06_term_topk")
    assert(p.contains("partial_count") || p.contains("partial_"))
    assert(p.contains("WindowGroupLimit"))
  }

  test("q25: tiny interval dim plans as a broadcast nested-loop join, not a cartesian shuffle") {
    val p = plan("q25_price_band_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q26: RANGE-frame window costs exactly one data shuffle plus the output sort") {
    assert(count(plan("q26_rolling_hourly"), "Exchange") == 2)
  }

  test("t08: aggregate on a refinement of the window partitioning adds NO exchange") {
    // Exchange(lang) for the window + rangepartitioning for the output
    // order — if a third appears, partitioning reuse broke
    assert(count(plan("t08_sequence_pack"), "Exchange") == 2)
  }

  test("q24: cursor-page seek predicate reaches the scan (deep page == page 1 cost)") {
    val p = plan("q24_cursor_page")
    assert(p.contains("PushedFilters") && p.contains("LessThan(o_orderdate"))
  }

  test("d08: benchmark grams broadcast — corpus grams never shuffle for the probe") {
    assert(plan("d08_decontaminate").contains("BroadcastHashJoin"))
  }

  test("s05: centroid set and probe set broadcast; corpus joins on cell without shuffling") {
    // two broadcasts: K centroids (assignment) and the probed queries
    assert(count(plan("s05_ann_ivf_multiprobe"), "BroadcastExchange") >= 2)
  }

  test("q31: sweep-line aggregates before the global window — the cumulative sum sees only daily rows") {
    // exchanges: partial->final day agg, then single-partition for the
    // calendar-bounded window; the output sort reuses that partitioning
    val p = plan("q31_interval_concurrency")
    assert(count(p, "Exchange") == 2)
    assert(p.contains("partial_sum"))
  }

  test("q32: all grouping-set levels come from ONE Expand + one partial agg (single scan)") {
    val p = plan("q32_grouping_sets")
    assert(count(p, "Expand") == 1)
    assert(p.contains("partial_count") || p.contains("partial_sum"))
  }

  test("q33: semi join broadcasts with the status filter pushed to the orders scan") {
    val p = plan("q33_semi_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    assert(p.contains("EqualTo(o_orderstatus,O)"))
  }

  test("q34: both ranking windows share one partitioning exchange") {
    // hash-partition by priority (shared by wTie and wFull) + the
    // range partition for the output sort — a third means reuse broke
    assert(count(plan("q34_rank_panel"), "Exchange") == 2)
  }

  test("st05: static dim broadcasts; aggregation is partial before the shuffle") {
    val p = plan("st05_stream_static_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("partial_count") || p.contains("partial_sum"))
  }

  test("t11/t12/m03/m06-m13: per-row ops cost ZERO data shuffles (only the output sort exchange)") {
    Seq("t11_repetition", "t12_pii_scrub", "m03_frame_sample",
        "m06_image_decode", "m07_audio_decode",
        "m08_audio_windows", "m09_video_frames", "m10_gop_video",
        "m11_image_resize", "m12_audio_resample",
        "m13_gop_extract").foreach { k =>
      assert(count(plan(k), "Exchange") == 1, s"$k grew a shuffle")
    }
  }

  test("q51: six-table join broadcasts its dims hint-free, one fact-sized shuffle, pushed filters") {
    val p = plan("q51_regional_revenue")
    assert(!p.contains("CartesianProduct"))
    // customer/supplier/nation/region ride broadcasts AQE chose, not
    // hints we forced; only the lineitem-orders join may shuffle
    assert(count(p, "BroadcastHashJoin") >= 3,
      s"dims stopped broadcasting:\n$p")
    // the region and date filters reach the scans
    assert(p.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)"),
      "region filter not pushed to the scan")
  }

  test("q50/t28: window-algebra rows never plan a cartesian; q50 stays within 3 exchanges") {
    val p50 = plan("q50_cusum_changepoint")
    assert(!p50.contains("CartesianProduct"))
    // daily counts -> per-type windows -> output sort: the CUSUM
    // statistic itself adds NO exchange beyond the re-key to type
    assert(count(p50, "Exchange") <= 3, s"q50 grew a shuffle:\n$p50")
    val p28 = plan("t28_heaps_growth")
    assert(!p28.contains("CartesianProduct"),
      "t28's decile frame must ride a broadcast, not a cartesian")
  }

  test("q49: the sketch arm gets the map-side rank-limit (WindowGroupLimit)") {
    val p = plan("q49_kmv_distinct")
    assert(p.contains("WindowGroupLimit"),
      s"KMV top-k lost the rank-limit pushdown:\n$p")
  }

  test("t26: the pair arm is an equi-join on the token, never a cartesian over sources") {
    val p = plan("t26_domain_divergence")
    assert(!p.contains("CartesianProduct"), "t26 fell back to a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "t26 planned a nested loop")
  }

  test("s19: multi-table candidates broadcast the query side; no cartesian anywhere") {
    val p = plan("s19_ann_lsh_multitable")
    assert(!p.contains("CartesianProduct"), "s19 fell back to a cartesian")
    // the (tbl, bucket) candidate join pins a broadcast of the banded
    // query side — the corpus's bucket projection never shuffles to
    // find its candidates
    assert(p.contains("BroadcastHashJoin"), "query buckets no longer broadcast")
  }

  test("d10: cluster-map join is hint-free; AQE still broadcasts it when it fits") {
    // the clustered fraction is data-dependent (can be 30-50% of a
    // crawl corpus), so a forced broadcast would OOM at scale instead
    // of falling back; the materialized cluster map lets AQE pick
    // broadcast from its REAL runtime size — assert both halves
    val df = SparkEntry.queries("d10_dedup_apply")(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"))
    assert(!analyzed.contains("UnresolvedHint"))
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "AQE did not upgrade the small cluster map to a broadcast join")
  }

  test("s06: approximate top-k joins to ground truth by broadcast, not a sort-merge shuffle") {
    val p = plan("s06_ann_recall")
    assert(!p.contains("SortMergeJoin"))
  }

  test("s07: every kNN join broadcasts (top-k probe, truth labels) — no sort-merge anywhere") {
    val p = plan("s07_knn_classify")
    assert(!p.contains("SortMergeJoin"))
    assert(count(p, "BroadcastHashJoin") >= 2)
  }

  test("q38: histogram is one partial->final agg; the shuffle carries (type,bin) rows") {
    val p = plan("q38_value_histogram")
    assert(p.contains("partial_count"))
    assert(count(p, "Exchange") == 2) // agg + output sort
  }

  test("q39: profiler computes ALL columns' distinct aggs from ONE scan (single Expand)") {
    val p = plan("q39_data_profile")
    assert(count(p, "Expand") == 1)
    assert(count(p, "Scan parquet") == 1)
  }

  test("q40: no FORCED broadcast of a per-user frame — the planner chooses") {
    // a broadcast() hint on the per-user stage frames would bypass the
    // size threshold and OOM at 10^8+ users; the join must be hint-free
    // (the planner may still pick broadcast when the stage is actually
    // small — that is the point)
    val analyzed =
      SparkEntry.queries("q40_funnel")(spark, sf).queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"))
    assert(!analyzed.contains("UnresolvedHint"))
  }

  test("q41: weighted agg collapses into the window's partitioning — 2 exchanges total") {
    // Exchange(user_id) for the lead window + the output sort; the
    // groupBy(user_id) agg adds NO exchange (partitioning reuse)
    assert(count(plan("q41_time_weighted_avg"), "Exchange") == 2)
  }

  test("q42: island aggs are partition refinements — no exchange after the window") {
    // distinct (user,day) + window(user) + output sort; both island
    // aggregates reuse the window partitioning
    assert(count(plan("q42_gaps_islands"), "Exchange") == 3)
  }

  test("t14: ReuseExchange collapses the freq branch — ONE corpus scan end to end") {
    // tf and the 1-row corpus total both re-aggregate docTok, so all
    // branches keep the identical pruned (doc_id, tok, count)
    // exchange and AQE reuses it (unlike t10, where pruning diverged
    // the branches). The total reaches the scoring join as a 1-row
    // broadcast (BNLJ is that join's physical form — intended); the
    // old shape (sum over Window.partitionBy()) funneled the whole
    // vocab-sized tf frame through ONE task, so pin Window OUT: the
    // only SinglePartition exchange left carries the 32 partial-agg
    // rows of the scalar total, never a data-sized frame.
    // executedPlan.toString appends the pre-AQE "Initial Plan" — count
    // scans only in the FINAL section or reuse looks like extra scans
    val df = SparkEntry.queries("t14_surprisal")(spark, sf)
    df.collect() // ReusedExchange is an AQE runtime feature — finalize first
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(count(p, "Scan parquet") == 1, "corpus scanned more than once")
    assert(p.contains("ReusedExchange"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"), "single-partition vocab window crept back in")
  }

  test("t10: tf persist point — corpus tokens explode once, both branches read the checkpoint") {
    val before = graft.operators.TextOps.tfBuilds
    val df = SparkEntry.queries("t10_tfidf_topk")(spark, sf)
    df.collect()
    // second call on the same corpus must serve tf from the cache
    SparkEntry.queries("t10_tfidf_topk")(spark, sf).count()
    val delta = graft.operators.TextOps.tfBuilds - before
    assert(delta <= 1, s"tf frame built $delta times for one corpus")
    // the only parquet scan left is the one-row N(docs) count; tf/df
    // branches read the checkpointed RDD
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(count(p, "Scan parquet") <= 1, "a consumer re-scanned the corpus past the tf checkpoint")
    assert(p.contains("ExistingRDD"), "tf branches are not reading the checkpoint")
  }

  test("d12: probe reads the PERSISTED band index — equi-join on band keys, no corpus re-scan") {
    val before = graft.operators.BandIndex.indexBuilds
    val df = SparkEntry.queries("d12_dedup_incremental")(spark, sf)
    df.collect()
    // a second run on the same corpus must be probe-only (cached index)
    SparkEntry.queries("d12_dedup_incremental")(spark, sf).count()
    assert(graft.operators.BandIndex.indexBuilds - before <= 1,
      "corpus index rebuilt instead of probed")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the corpus side comes from the persisted index tables (the band
    // join lives inside the materialized candidate stage); only the
    // BATCH shingle branch may scan the documents table
    assert(p.contains("graft-bandidx"), "probe is not reading the persisted index")
    assert(count(p, "documents.parquet") <= 2,
      "probe re-scanned corpus documents past the index")
  }

  test("d14: span detection joins postings on gram — no cartesian, checkpointed gate") {
    val df = SparkEntry.queries("d14_dup_spans")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the gated-postings checkpoint feeds both self-join sides: the
    // posting subtree (scan + gram kernel + gram shuffle) ran once
    assert(p.contains("ExistingRDD"), "gated postings are not read from the checkpoint")
  }

  test("s20: corpus kNN graph is an equi-join on the cell key with a map-side rank limit") {
    val p = plan("s20_knn_join")
    // the only nested-loop joins are the two 8-row centroid-broadcast
    // fans (assignment + probe, the s03/s05 shape); the corpus-corpus
    // candidate join itself is an EQUI join on the cell key — a
    // cartesian there would be the N² self-join this operator exists
    // to avoid
    assert(!p.contains("CartesianProduct"))
    assert(count(p, "BroadcastNestedLoopJoin") == 2)
    assert(p.contains("hashpartitioning(cell") || p.contains("SortMergeJoin [cell")
        || p.contains("BroadcastHashJoin [cell"),
      "candidate join is not keyed on the cell id")
    // the per-vector top-k is rank-limited BEFORE the rank shuffle
    assert(p.contains("WindowGroupLimit"))
  }

  test("s20: a HOT CELL in the kNN join is split by AQE at runtime — the pinned skew guard") {
    // The soak's knnJoinCensus measures the exposure (per-cell
    // candidates = occupancy × probes; hot_factor = max/avg); this
    // pins the MITIGATION: the cell equi-join is a shuffle join, the
    // shape OptimizeSkewedJoin can split, and on a corpus with a
    // deliberately hot cell the executed plan shows skew=true — the
    // property that keeps one 27–46×-occupancy cell (the soak's
    // measured LSH range) from wedging a single executor at 100 TB.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // test-scale artifact, found empirically: at 3000 rows AQE
      // coalesces the upstream window stages to ONE map task, and a
      // skewed reduce partition with a single mapper has no split
      // boundary (OptimizeSkewedJoin splits along mapper ranges) —
      // so the rule silently declines. At 100 TB the mapper count is
      // the cluster's and this never binds; disabling coalescing
      // here reproduces the many-mapper regime the split needs.
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // synthetic corpus, 4 one-hot centroids (ids 0-3): 85% of
      // vectors align with centroid 0 (v[0]=10) and give every other
      // vector a moderate v[0]=5 so cell 0 is also everyone's second
      // probe — hot on BOTH join sides, the worst case the census
      // flags. Per-row float noise keeps shuffle blocks
      // incompressible (the skew detector sees compressed sizes).
      val n = 3000
      val embs = spark.createDataFrame((0L until n.toLong).map { i =>
        val e = new Array[Float](8)
        if (i < 4) { e(i.toInt) = 1f }
        else {
          val dir = if (i % 20 < 17) 0 else (i % 3 + 1).toInt
          e(dir) = 10f + (i % 97) * 0.001f
          if (dir != 0) e(0) = 5f
          e(4 + (i % 4).toInt) = 0.01f * (i % 89)
        }
        (i, e, s"l${i % 5}")
      }).toDF("vec_id", "embedding", "label")
      val df = graft.operators.Similarity.knnJoin(
        embs, k = 3, nProbe = 2, centIds = Seq(0L, 1L, 2L, 3L))
      assert(df.collect().length == n * 3) // every vector got its k edges
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"cell candidate join is not a splittable shuffle join:\n$p")
      assert(p.contains("skew=true"),
        s"AQE did not split the hot cell's join partition:\n$p")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("d21: span scrub never plans a cartesian; spans join postings on gram like d14") {
    val df = SparkEntry.queries("d21_span_scrub")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("s22: centrality rank is range-partitioned — no single-partition sort over the corpus") {
    // the pr frame is corpus-sized (one row per vector), so the final
    // global rank must be withGlobalRank's distributed shape, never a
    // Window.orderBy() funnel (the t14 anti-pattern)
    val df = SparkEntry.queries("s22_knn_pagerank")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("rangepartitioning"),
      "global rank is not the distributed withGlobalRank shape")
  }

  test("m14: hashing is a narrow map; the census costs one hash-key exchange plus the output sort") {
    val p = plan("m14_image_phash")
    assert(!p.contains("CartesianProduct"))
    assert(count(p, "Exchange") == 2, "perceptual census grew extra shuffles")
  }

  test("t29: the rank window is map-side rank-limited (WindowGroupLimit) like t06") {
    val p = plan("t29_zipf_slope")
    assert(p.contains("WindowGroupLimit"))
    assert(!p.contains("CartesianProduct"))
  }

  test("s09: PQ scan joins code rows against broadcast tables — no sort-merge anywhere") {
    val p = plan("s09_pq_recall")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("s11: trained-codebook pipeline keeps the PQ join discipline under Lloyd rounds") {
    // training adds two assignment fan-outs and two floor-mean aggs on
    // top of s10's shape — all against the 128-row BROADCAST codebook;
    // nothing in the loop may degrade to a sort-merge join or a
    // cartesian product however many rounds unroll
    val p = plan("s11_ivfpq_trained")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("d15: span probe reads the PERSISTED gram index — no corpus re-tokenization") {
    val before = graft.operators.GramIndex.indexBuilds
    val df = SparkEntry.queries("d15_span_incremental")(spark, sf)
    df.collect()
    // a second run on the same corpus must be probe-only (cached index)
    SparkEntry.queries("d15_span_incremental")(spark, sf).count()
    assert(graft.operators.GramIndex.indexBuilds - before <= 1,
      "gram index rebuilt instead of probed")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("graft-gramidx"), "probe is not reading the persisted index")
    // only the BATCH side may tokenize documents
    assert(count(p, "documents.parquet") <= 1,
      "probe re-tokenized corpus documents past the index")
  }

  test("BandIndex bucketed layout: the index side of the probe join NEVER shuffles") {
    // at 100 TB the index is the big side; bucketing by (band, bkey)
    // means a probe shuffles ONLY the batch into the bucket scheme.
    // Disable broadcast so the sort-merge path (the at-scale plan) is
    // what gets pinned — with broadcast on, a small batch broadcasts
    // and the index side still moves zero rows.
    val docs = graft.Tables.documents(spark, sf)
    graft.operators.BandIndex.buildBucketed(spark, "graft_bidx_plan_test",
      docs.filter("doc_id % 17 != 0"), buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cand = graft.operators.BandIndex.bucketedCandidates(
        spark, "graft_bidx_plan_test", docs.filter("doc_id % 17 = 0"))
      cand.collect()
      val p = cand.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(p.contains("SortMergeJoin"))
      // exchanges: batch side into the bucket scheme + the distinct's
      // agg exchange — the bucketed index scan contributes NONE
      assert(count(p, "Exchange") == 2,
        s"bucketed index side grew a shuffle:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        "index scan is not bucket-aware")
      // bucketed INGEST: insertInto keeps the bucket spec — after
      // appending an admitted doc the probe finds it and the index
      // side still contributes no exchange (the append re-bucketed
      // only the delta, so the table stayed probe-ready)
      // pin the row FIRST: limit(1) without ordering is not stable
      // across executions, and novel is evaluated twice below
      val src = docs.filter("doc_id % 17 = 0")
        .select("doc_id", "text").orderBy("doc_id").head()
      val novelId = src.getLong(0) + 1000000L
      val novel = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(novelId, src.getString(1))),
        docs.select("doc_id", "text").schema)
      graft.operators.BandIndex.appendBucketed(spark, "graft_bidx_plan_test", novel)
      val cand2 = graft.operators.BandIndex.bucketedCandidates(
        spark, "graft_bidx_plan_test", docs.filter("doc_id % 17 = 0"))
      assert(cand2.filter(s"corpus_doc = $novelId").count() > 0,
        "appended doc invisible to the probe")
      val p2 = cand2.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(count(p2, "Exchange") == 2,
        s"index side grew a shuffle after bucketed append:\n$p2")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bidx_plan_test")
    }
  }

  test("q43: cohort matrix costs distinct + window + grid agg + sort — four exchanges") {
    // distinct (user, day), window repartition on user_id, the
    // (cohort, offset) matrix agg (grid-bounded partials), output sort;
    // a fifth exchange would mean the cohort join shape regressed
    assert(count(plan("q43_cohort_retention"), "Exchange") == 4)
  }

  test("s08: every quantized top-k join broadcasts — no sort-merge in the eval frame") {
    assert(!plan("s08_quantized_recall").contains("SortMergeJoin"))
  }

  test("m04: chunking shuffles only for the digest census window and the output sort") {
    val p = plan("m04_cdc_chunks")
    assert(count(p, "Exchange") == 2, "chunking grew a shuffle before the census")
    assert(count(p, "Scan parquet") == 1)
  }

  test("runtime bloom-filter pruning: a selective dim filter reaches the fact side at runtime") {
    // the join-pruning tier BETWEEN static pushdown and AQE: Catalyst
    // injects a bloom filter built from the FILTERED dim's join keys
    // as a semi-join reduction on the fact scan, so fact rows that
    // cannot match die before the shuffle — at 100 TB that is the
    // difference between shuffling the whole fact table and shuffling
    // the matching fraction. Local test data sits far under the
    // production thresholds (application side >= 10 GiB), so the
    // demonstration lowers them — the PLAN SHAPE is what's pinned;
    // the production confs are the defaults this library relies on.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // shuffle join: the case the filter pays in
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val lineitem = graft.Tables.lineitem(spark, sf)
      val orders = graft.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val opt = joined.queryExecution.optimizedPlan.toString
      // injected shape: the fact scan gains
      //   Filter might_contain(<scalar-subquery over
      //     bloom_filter_agg(xxhash64(o_orderkey))>, xxhash64(l_orderkey))
      assert(opt.contains("might_contain"), s"no runtime bloom filter injected:\n$opt")
      assert(opt.contains("bloom_filter_agg"),
        s"no bloom aggregate built from the filtered dim:\n$opt")
      assert(opt.contains("might_contain(scalar-subquery") &&
             opt.contains("xxhash64(l_orderkey"),
        s"the bloom filter did not land on the fact side's join key:\n$opt")
      // and it's a filter, not a semantics change: same result with
      // the rewrite off
      val rows = joined.collect()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plainRows = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty")).collect()
      assert(rows.map(_.toString).sorted.toSeq == plainRows.map(_.toString).sorted.toSeq)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("dedup suite: d02/d04/d07/d10/d11 share ONE LSH candidate build (persist point)") {
    val before = graft.operators.Dedup.pipelineBuilds
    Seq("d02_dedup_minhash_lsh", "d04_dedup_ngram_jaccard", "d07_dedup_clusters",
        "d10_dedup_apply", "d11_minhash_estimate", "d13_dedup_containment")
      .foreach(k => SparkEntry.queries(k)(spark, sf).count())
    val delta = graft.operators.Dedup.pipelineBuilds - before
    // <= 1, not == 1: another test may have already primed the cache
    // for this corpus, in which case zero builds is the success case
    assert(delta <= 1, s"LSH candidate stage built $delta times across the dedup suite")
  }

  test("d16: one cluster_id exchange serves both the argmax window and the census agg") {
    val df = SparkEntry.queries("d16_dedup_best_keep")(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), "cluster-map join must stay hint-free")
    df.collect()
    // AQE's toString appends an "Initial Plan" section duplicating the
    // final plan — count exchanges in the FINAL section only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"))
    // the groupBy(cluster_id) is a partition refinement of the window's
    // partitioning: exactly ONE shuffle on cluster_id in the whole plan
    assert(count(p, "hashpartitioning(cluster_id") == 1,
      "window and census agg no longer share the cluster_id exchange")
  }

  test("t19: cluster-keyed split routing is hint-free; AQE broadcasts the map when it fits") {
    val df = SparkEntry.queries("t19_leakage_split")(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"))
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "AQE did not upgrade the small cluster map to a broadcast join")
    assert(!p.contains("CartesianProduct"))
  }

  test("s12: probe reads the PERSISTED vector index — dir-pruned lists, no corpus re-assign") {
    val before = graft.operators.VecIndex.indexBuilds
    val df = SparkEntry.queries("s12_ann_ingest")(spark, sf)
    df.collect()
    // a second run on the same corpus must be probe-only (cached index)
    SparkEntry.queries("s12_ann_ingest")(spark, sf).count()
    assert(graft.operators.VecIndex.indexBuilds - before <= 1,
      "vector index rebuilt instead of probed")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"))
    // the corpus side comes from the persisted index's cell dirs; only
    // the BATCH query side (inside the checkpointed probe frame) may
    // scan the embeddings table
    assert(p.contains("graft-vecidx"), "probe is not reading the persisted index")
    assert(count(p, "embeddings.parquet") == 0,
      "probe re-read raw embeddings past the index")
  }

  test("bucketed tables: the fact-fact equi-join runs with ZERO shuffles; an unbucketed read pays two") {
    import graft.sources.Bucketing
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(spark, "bk_orders", s"$dir/o", orders, "o_orderkey", 8)
    Bucketing.writeBucketed(spark, "bk_lineitem", s"$dir/l", lineitem, "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "bk_orders", "bk_lineitem", "o_orderkey")
      val n = joined.count()
      assert(n == lineitem.count(), "inner fact-fact join lost rows")
      val p = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(count(p, "Exchange") == 0,
        s"bucketed join still shuffles:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
      assert(count(p, "SelectedBucketsCount") == 2, "scan is not bucket-aware")
      // the control: the same join over plain parquet reads shuffles BOTH sides
      val plain = spark.read.parquet(s"$dir/o").join(
        spark.read.parquet(s"$dir/l"), Seq("o_orderkey"))
      plain.count()
      val pp = plain.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(count(pp, "Exchange hashpartitioning") == 2,
        "control join did not pay the two shuffles bucketing removes")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bk_orders")
      spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    }
  }

  test("q44: the as-of sweep is JOIN-FREE — one key shuffle plus the output sort, zero row amplification") {
    val p = plan("q44_asof_enrich")
    assert(!p.contains("Join"),
      "as-of must be the union+window sweep, not a join that explodes per-key history")
    assert(count(p, "Exchange") == 2,
      s"expected hash(user_id) + output range partitioning only:\n$p")
  }

  test("t21: stratified sample gets the map-side rank limit — the shuffle never carries the corpus") {
    val p = plan("t21_stratified_sample")
    assert(p.contains("WindowGroupLimit"), s"rank-limit pushdown missing:\n$p")
  }

  test("t23: the curation composite is one plan — no cartesian, one documents scan (cluster map served from the persist point)") {
    val p = plan("t23_curation_pipeline")
    assert(!p.contains("CartesianProduct"))
    // the near-dup stage must come from the pipeline's checkpointed
    // cluster map, not a second banding pass over the corpus scan
    assert(count(p, "documents.parquet") == 1,
      s"expected exactly one corpus scan (battery projection), got:\n$p")
  }

  test("s15: hybrid fusion never goes cartesian; the RRF stage joins result-bounded arm frames") {
    val p = plan("s15_hybrid_rrf")
    assert(!p.contains("CartesianProduct"))
    // the vector arm's query side broadcasts (the s01 discipline)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("s17: the rerank fetch is an equi-join of the bounded shortlist — never cartesian") {
    val p = plan("s17_pq_rerank")
    assert(!p.contains("CartesianProduct"),
      "candidate fetch went cartesian — the shortlist must equi-join the corpus on vec_id")
    // query vectors ride a broadcast onto the bounded candidate frame
    assert(p.contains("BroadcastHashJoin"), s"no broadcast in the rerank stage:\n$p")
  }

  test("d17: semantic dedup pairs only through the cell equi-join — the quadratic term is bounded by cells") {
    val p = plan("d17_semdedup")
    assert(!p.contains("CartesianProduct"),
      "within-cell pairing went cartesian — must be an equi-join on cell id")
    // the only nested-loop is the 8-row centroid broadcast (assignment)
    assert(count(p, "BroadcastNestedLoopJoin") <= 2)
  }

  test("m05: the store-once gate gets the map-side rank limit; packing windows stay on the stream key") {
    val p = plan("m05_shard_pack")
    // row_number-over-digest + rn=1 compiles to WindowGroupLimit: the
    // shuffle to the dedup window carries at most one candidate row
    // per (digest, map partition), not every duplicate occurrence
    assert(p.contains("WindowGroupLimit"), s"store-once gate missing rank-limit pushdown:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("t22: the tercile window partitions by source — no single-partition global sort window") {
    val p = plan("t22_perplexity_bucket")
    val ntileSpec = p.linesIterator.find(_.contains("ntile(3)")).getOrElse(
      fail("ntile window not found in plan"))
    assert(ntileSpec.contains("windowspecdefinition(source"),
      s"ntile window is not partitioned by source:\n$ntileSpec")
  }

  test("AQE splits a skewed join partition at runtime — the automatic tier before manual salting") {
    // Relational.saltedJoin is the explicit skew lever; this pins the
    // AUTOMATIC one: a shuffle join whose largest partition dwarfs the
    // median is split by OptimizeSkewedJoin (SMJ(skew=true)) with the
    // same result — the property that keeps a 100 TB hot-key join from
    // wedging one executor while 999 idle.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of the left side lands on key 0; the rest is uniform. The
      // payload must be incompressible (shuffle blocks are lz4'd and
      // the skew detector sees COMPRESSED sizes) — hash text, not a
      // repeated constant
      val left = spark.range(0, 100000).toDF("i")
        .withColumn("k", when(col("i") % 10 =!= 0, lit(0L)).otherwise(col("i")))
        .withColumn("pay", sha2(concat(lit("p"), col("i").cast("string")), 256))
      val right = spark.range(0, 2000).toDF("k2").withColumn("rv", col("k2") * 3)
      val joined = left.join(right, col("k") === col("k2"))
      // execute THIS query execution (a count() would plan separately
      // and leave joined's own adaptive plan unexecuted)
      val n = joined.collect().length
      // k=0 rows: 90000 (i%10!=0) + i=0 itself => 90001 matches of k2=0;
      // remaining i%10==0 rows match iff i<2000: i in {10..1990} => 199
      assert(n == 90001 + 199, s"skew-join row count wrong: $n")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("s26: BM25 score probes never read the positional payload; the phrase probe is cartesian-free") {
    import org.apache.spark.sql.functions.col
    import graft.operators.LexIndex
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft_planlex").toString + "/ix"
    LexIndex.build(spark, root, docs)
    val queries = docs.filter(col("doc_id") < 8)
    // the postings rows CARRY positions, but the scoring path must
    // prune them at the scan — a probe plan that reads the position
    // arrays ships them through the term join at 100 TB
    val scoreP = LexIndex.probe(spark, root, queries)
      .queryExecution.executedPlan.toString
    assert(!scoreP.contains("positions"),
      s"BM25 probe reads the positional payload:\n${scoreP.take(2000)}")
    // the phrase arm DOES read positions (its whole point) for its two
    // bucket dirs, and composes with scoring without any cartesian
    val phraseP = LexIndex.probePhrase(spark, root, queries)
      .queryExecution.executedPlan.toString
    assert(phraseP.contains("positions"), "phrase probe read no positions")
    assert(!phraseP.contains("CartesianProduct"))
  }

  test("q47: ranks are distributed — no row_number window, range-partitioned passes") {
    // The old shape was two row_number windows over an UNPARTITIONED
    // ordering — two single-partition sorts of the whole table. The
    // distributed form (withGlobalRank) must show: zero row_number
    // windows anywhere, and two rangepartitioning exchanges (one per
    // rank pass). The only remaining windows cumulate per-partition
    // counts (~#partitions rows, metadata-scale).
    val df = SparkEntry.queries("q47_rank_corr")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("row_number"),
      s"q47 regressed to a row_number window (single-partition sort):\n$p")
    assert(count(p, "rangepartitioning") >= 2,
      s"expected two range-partitioned rank passes:\n$p")
  }
}
