package graft

/** Plan-level regression guard over every driver-contract query: a code
  * change that silently degrades a join into an unconditional cartesian
  * product would pass row-level correctness at sf0.001 and explode at
  * scale — catch it in the plan, not in production.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no driver query plans a CartesianProduct") {
    graft.functions.NativeExpressions.register(spark)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      // BroadcastNestedLoopJoin with a bounded broadcast side (ann1's
      // 8-query x corpus scoring) is intentional; an unconditioned
      // CartesianProduct never is
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("filter queries push predicates into the parquet scan") {
    val plan = SparkEntry.queries("f1_filter_project")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull"), s"no pushed filters:\n$plan")
  }

  test("projection queries prune the read schema") {
    val plan = SparkEntry.queries("p1_rename_project")(spark, dir)
      .queryExecution.executedPlan.toString
    // customer has 5 columns; the query selects 3 — the scan must too
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"),
      s"scan not pruned:\n$plan")
  }

  test("native as-of join plans one exchange per side and no union/window") {
    val plan = SparkEntry.queries("aj2_asof_native")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"native as-of not planned:\n$plan")
    // the composition's costs must be absent: no Union, no Window
    assert(!plan.contains("Union") && !plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      s"composition artifacts in native plan:\n$plan")
    // the composition pays the same right-side pre-aggregation shuffle
    // PLUS one union-wide exchange carrying both schemas; the native plan
    // must stay at "a few per-side key exchanges" — bound, not exact
    // count, so AQE/version changes in how the pre-aggregation plans
    // don't false-alarm (each side's exchange partitions on the key)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges >= 2 && exchanges <= 4,
      s"expected 2-4 key-clustering exchanges, got $exchanges:\n$plan")
  }

  test("ANN top-k paths aggregate with the bounded heap, not a window sort") {
    graft.functions.NativeExpressions.register(spark)
    for (q <- Seq("ann1_bruteforce_topk", "ann2_lsh_topk", "ann3_ivf_topk")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      // graft_topk is a TypedImperativeAggregate -> ObjectHashAggregate
      // with a partial pass (<=k rows per query per map task enter the
      // exchange); a row_number() window would shuffle and sort EVERY
      // scored candidate
      assert(plan.contains("ObjectHashAggregate"), s"$q: no heap aggregate in plan:\n$plan")
      assert(plan.contains("graft_topk"), s"$q: graft_topk missing from plan:\n$plan")
      assert(!plan.contains("Window"), s"$q: window ranking crept back in:\n$plan")
    }
  }

  test("latest-per-key plans a hash aggregate, not a window sort") {
    val plan = SparkEntry.queries("w7_latest_per_key")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window ranking in latest-per-key plan:\n$plan")
    assert(plan.contains("Aggregate"), s"no aggregate in latest-per-key plan:\n$plan")
  }

  test("funnel stages broadcast the shrinking frontier (no shuffle join on the last stage)") {
    // AQE sizes the per-stage frontier; the structural claim asserted
    // here is weaker but stable: each stage is a filtered aggregate and
    // the final plan carries no cartesian/NLJ anywhere
    val plan = SparkEntry.queries("e7_funnel")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected join shape in funnel plan:\n$plan")
  }

  test("row-id reads broadcast the base map and the vector; the data side stays unshuffled") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("audit_rowid").toFile.getAbsolutePath
    val orders = Tables.load(spark, dir, "orders")
    graft.sources.ManifestTable.create(spark, root, orders.repartition(2))
    graft.sources.ManifestTable.enableRowTracking(spark, root)
    graft.sources.ManifestTable.deleteMor(spark, root, col("o_orderkey") % 9 === 0)
    val plan = graft.sources.ManifestTable.readWithRowIds(spark, root)
      .queryExecution.executedPlan.toString
    // base-block lookup AND the deletion vector both broadcast — the
    // 100 TB data side flows through with ZERO hash exchanges
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected broadcast base + vector joins:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the row-id read must not shuffle the data side:\n$plan")
  }

  test("attribution credits via struct min/max aggregates, never a window sort") {
    val plan = SparkEntry.queries("e9_attribution")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window ranking in attribution plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected join shape in attribution plan:\n$plan")
  }

  test("LATERAL top-k decorrelates to WindowGroupLimit, not a per-row subquery loop") {
    // the correlated LIMIT-2 subquery must become the rank-based
    // group-limit plan (with the partial WindowGroupLimit pushed below
    // the exchange) — proof Catalyst decorrelated rather than planning
    // anything per-customer
    val plan = SparkEntry.queries("q8_lateral_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no group-limit in LATERAL plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in LATERAL plan:\n$plan")
  }

  test("per-group cap plans the heap aggregate, not a window sort") {
    graft.functions.NativeExpressions.register(spark)
    val plan = SparkEntry.queries("smp2_per_group_cap")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("graft_topk"),
      s"no heap aggregate in cap plan:\n$plan")
    assert(!plan.contains("Window"), s"window ranking in cap plan:\n$plan")
  }

  test("contamination screen broadcasts the probe side (bounded NLJ, never cartesian)") {
    val plan = SparkEntry.queries("ctm1_contamination")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"probe side not broadcast:\n$plan")
  }

  test("bloom screen filters the corpus scan BEFORE the probe join, independent of |probes|") {
    graft.functions.NativeExpressions.register(spark)
    val plan = SparkEntry.queries("ctm2_bloom_screen")(spark, dir)
      .queryExecution.executedPlan.toString
    // the sliding-window membership test must sit in a Filter on the
    // corpus side (per-row cost O(len), not O(|probes|·len)); the exact
    // contains() NLJ then runs only over the surviving candidates
    assert(plan.contains("graft_bloom_text_hit"), s"bloom prefilter missing:\n$plan")
    assert(plan.contains("graft_bloom_build"), s"distributed bloom build missing:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"verify join not broadcast:\n$plan")
  }

  test("composed quality gate is one map-only pass: no exchange anywhere") {
    graft.functions.NativeExpressions.register(spark)
    val plan = SparkEntry.queries("pipe2_quality_filter")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quality gate should not shuffle:\n$plan")
    assert(plan.contains("graft_char_entropy") && plan.contains("graft_distinct_ngrams"),
      s"native kernels missing from gate plan:\n$plan")
  }

  test("capped shingle path aggregates with the bounded heap — no frequency join") {
    graft.functions.NativeExpressions.register(spark)
    val plan = SparkEntry.queries("dd2_ngram_jaccard")(spark, dir)
      .queryExecution.executedPlan.toString
    // one bounded ObjectHashAggregate replaces the old freq-count +
    // equi-join-back + recount: a SortMergeJoin of exploded shingle rows
    // against a frequency table must NOT reappear
    assert(plan.contains("ObjectHashAggregate") && plan.contains("graft_topk"),
      s"bounded heap missing from dd2 plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"frequency join crept back into dd2:\n$plan")
  }

  test("ORC round-trip pushes the filter into the ORC scan like parquet") {
    val plan = SparkEntry.queries("src8_orc_roundtrip")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan orc"), s"no ORC scan planned:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,25.0)]"),
      s"quantity filter not pushed into the ORC scan:\n$plan")
  }

  test("bucketed join reads co-located buckets: no exchange on either join key") {
    val plan = SparkEntry.queries("src4_bucketed_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"no sort-merge join planned:\n$plan")
    // bucketBy+sortBy pre-shuffled and pre-sorted both inputs: the only
    // exchange in the whole plan belongs to the final groupBy
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"join input re-shuffled despite bucketing:\n$plan")
  }

  test("runtime bloom filter prunes the fact side of a selective join (100 TB knob)") {
    // at 100 TB the application-side threshold (10 GB default) is met by
    // any fact scan; at test SF we lower it to prove the optimizer wiring.
    // Broadcast is disabled because a broadcast join already prunes via
    // its build side — the bloom filter matters for shuffle joins.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
      val o = spark.read.parquet(s"$dir/orders.parquet").filter(org.apache.spark.sql.functions.col("o_orderstatus") === "P")
      val plan = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("small dimension sides broadcast in the customer-360 joins") {
    val plan = SparkEntry.queries("j2_customer360")(spark, dir)
      .queryExecution.executedPlan.toString
    // at sf0.001 the per-customer aggregates are tiny — Catalyst/AQE must
    // pick broadcast joins, not shuffle both sides
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join chosen:\n$plan")
  }

  test("narrow scalar queries stay inside one WholeStageCodegen span with no exchange") {
    val plan = SparkEntry.queries("p3_scalar_arithmetic")(spark, dir)
      .queryExecution.executedPlan.toString
    // "*(1)" prefixes mark the whole-stage-codegen span in simple mode
    assert(plan.contains("*(1) Project"), s"projection not codegen'd:\n$plan")
    assert(!plan.contains("Exchange"), s"scalar projection should not shuffle:\n$plan")
  }

  test("int8 quantization is a map-only pass: no exchange, no aggregate") {
    val plan = SparkEntry.queries("sq1_int8_quantize")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization should not shuffle:\n$plan")
    assert(!plan.contains("HashAggregate"), s"quantization should not aggregate:\n$plan")
  }

  test("variant extraction is a map-only pass over the events scan") {
    val plan = SparkEntry.queries("vr1_variant_extract")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"variant extraction should not shuffle:\n$plan")
  }

  test("recursive walk carries the broadcast hint into each round's join") {
    // the loop body stays LOGICAL inside UnionLoop (physical planning
    // happens per iteration at runtime), so pin the recorded join
    // strategy hint and the checkpointed pointer table (LogicalRDD —
    // the window must not sit inside the loop where every round would
    // recompute it)
    val plan = SparkEntry.queries("rec1_recursive_cte")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"), s"recursion not planned as a loop:\n$plan")
    assert(plan.contains("rightHint=(strategy=broadcast)"),
      s"recursion step lost the broadcast hint:\n$plan")
    assert(plan.contains("LogicalRDD") && !plan.contains("window"),
      s"pointer table must be checkpointed outside the loop:\n$plan")
  }

  test("salted join spreads the fact side over (key, salt) exchanges") {
    val plan = SparkEntry.queries("sk1_salted_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
  }

  test("AQE splits a skewed shuffle join at runtime — reach for salting only when AQE can't") {
    // sk1's shape WITHOUT salting: AQE's OptimizeSkewedJoin must split
    // the hot partition by itself (thresholds lowered to trip at test
    // SF). This pins the preferred production path — manual salting
    // (SkewOps) is the fallback for shapes AQE cannot rewrite, e.g. an
    // aggregation keyed on the skewed column before the join.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle join
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // deterministic hot key: 90% of lineitem rows land on okey=1.
      // repartition(8) gives the join shuffle multiple MAP tasks — AQE
      // splits a skewed reduce partition into per-mapper ranges, so a
      // single-mapper shuffle (one small parquet file) cannot be split
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
        .repartition(8)
        .select(when(pmod(col("l_orderkey"), lit(10)) =!= 0, lit(1L))
          .otherwise(col("l_orderkey")).as("okey"), col("l_extendedprice"))
      val dim = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("okey"), col("o_custkey"))
      val joined = fact.join(dim, "okey")
      // collect() drives joined's OWN QueryExecution (count() would plan a
      // separate one and leave this plan un-finalized); AQE re-plans at
      // runtime and the final adaptive plan carries the skew split
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("dd5 counts passage frequency with a window, not a corpus-rescanning self-join") {
    val plan = SparkEntry.queries("dd5_passage_dup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"passage frequency must come from a window:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"dd5 must not self-join:\n$plan")
    // the corpus is scanned exactly once
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      s"documents must be scanned once:\n$plan")
  }

  test("smp4 broadcasts the 5-row quota side onto the ranked corpus") {
    val plan = SparkEntry.queries("smp4_target_mixture")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"quotas must broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"))
  }

  test("j6 star join: dimension chain broadcasts; the fact table shuffles at most once") {
    val plan = SparkEntry.queries("j6_star_join")(spark, dir)
      .queryExecution.executedPlan.toString
    // supplier, nation (twice), region — and customer at test SF — are all
    // dimension hops: each must ride a broadcast, never re-shuffle the fact
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 4, s"expected >=4 broadcast joins in the star, got $bhj:\n$plan")
    // at most the lineitem⋈orders big-big join is allowed to sort-merge
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    assert(smj <= 1, s"dimension join degraded to sort-merge ($smj SMJs):\n$plan")
  }

  test("j7 filtered star: region predicate and date range push into the scans, dims broadcast") {
    val plan = SparkEntry.queries("j7_star_filtered")(spark, dir)
      .queryExecution.executedPlan.toString
    // the 5-row region table carries the selective predicate — it must be
    // applied AT its scan (pruning nation before anything touches the fact)
    assert(plan.contains("EqualTo(r_name,ASIA)"),
      s"region predicate not pushed into the region scan:\n$plan")
    // the o_orderdate range reaches the orders parquet scan
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") && plan.contains("LessThan(o_orderdate"),
      s"date range not pushed into the orders scan:\n$plan")
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 3, s"expected >=3 broadcast joins, got $bhj:\n$plan")
    assert("SortMergeJoin".r.findAllIn(plan).size <= 1,
      s"dimension join degraded to sort-merge:\n$plan")
  }

  test("smp4's single-partition window consumes the language AGGREGATE, never raw corpus rows") {
    // the unpartitioned Window is intentional and safe ONLY because its
    // input is the ~5-row per-language aggregate (SURVEY §8.2); pin that
    // structurally so a refactor can't silently move it onto row data,
    // where it would serialize the whole corpus through one task
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    def aggBeforeScan(p: SparkPlan): Boolean = p match {
      case _: BaseAggregateExec => true
      case _: FileSourceScanExec => false
      case other => other.children.forall(aggBeforeScan)
    }
    val plan = SparkEntry.queries("smp4_target_mixture")(spark, dir)
      .queryExecution.sparkPlan
    val unpartitioned = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(unpartitioned.nonEmpty, "expected the single-partition quota window")
    unpartitioned.foreach { w =>
      assert(aggBeforeScan(w.child),
        s"single-partition window reads un-aggregated rows:\n$w")
    }
  }

  test("q7's LATERAL subquery decorrelates into one aggregate+join, no per-row re-execution") {
    val plan = SparkEntry.queries("q7_lateral_subquery")(spark, dir)
      .queryExecution.executedPlan.toString
    // decorrelated: a physical join over a pre-aggregated lineitem side;
    // a correlated re-execution would surface as a subquery per row
    assert(plan.contains("Join") || plan.contains("HashJoin"), s"no join planned:\n$plan")
    assert(plan.contains("HashAggregate"), s"no pre-aggregation planned:\n$plan")
    assert(!plan.contains("Subquery"), s"lateral must not re-execute per row:\n$plan")
  }

  test("pipe3 materializes the cleaned corpus once: both mixture branches read the checkpoint, no corpus re-scan") {
    graft.functions.NativeExpressions.register(spark)
    val df = SparkEntry.queries("pipe3_full_pipeline")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // downstream of the materialization boundary the plan must consume the
    // checkpointed RDD (twice — quota branch + rank branch) and NEVER
    // re-scan parquet: a regression here re-executes gate+dedup+screen
    // per branch
    assert("Scan ExistingRDD".r.findAllIn(plan).size === 2,
      s"expected both mixture branches on the checkpoint:\n$plan")
    assert(!plan.contains("Scan parquet"),
      s"corpus re-scan above the materialization boundary:\n$plan")
    // and the composition still yields packed rows
    assert(df.count() > 0)
  }

  test("pack2 plans one shard exchange and a per-partition object scan, never a global sort") {
    val plan = SparkEntry.queries("pack2_document_packing")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"pack2 must exchange once, on the shard id:\n$plan")
    assert(!plan.contains("Exchange SinglePartition") && !plan.contains("Exchange rangepartitioning"),
      s"pack2 must never serialize into a global sort:\n$plan")
    assert(plan.contains("MapPartitions"), s"the sequential scan is mapPartitions:\n$plan")
  }

  test("dd9 broadcasts ONLY the sqrt(N) seed side; within-cluster pairs shuffle on the cluster key") {
    graft.functions.NativeExpressions.register(spark)
    val plan = SparkEntry.queries("dd9_semdedup")(spark, dir)
      .queryExecution.executedPlan.toString
    // the assignment pass is corpus x broadcast(seeds): BNLJ with the
    // seeds (and the 1-row threshold frame) on the build side
    assert(plan.contains("BroadcastNestedLoopJoin"), s"seed broadcast missing:\n$plan")
    // the pair stage must be a key join on `cluster`, never a broadcast
    // of a corpus-sized side
    assert("Exchange hashpartitioning\\(cluster".r.findAllIn(plan).nonEmpty,
      s"pair stage must shuffle on the cluster key:\n$plan")
  }

  test("txt19/txt22 LM scoring joins shuffle on gram keys; no window, only the 1-row totals broadcast") {
    for (q <- Seq("txt19_trigram_backoff", "txt22_kneser_ney")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$q must not window-sort:\n$plan")
      // count tables join on gram keys (shuffle or broadcast-HASH join
      // both fine at this SF); the corpus must never nested-loop against
      // anything bigger than the 1-row (N, V) frame
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      assert(bnlj <= 2, s"$q: unexpected nested-loop joins ($bnlj):\n$plan")
    }
  }

  test("txt20 unigram training runs the Viterbi DP in-row: no Window, no per-position exchange chain") {
    // audit the E-step frame itself (the final vocab face is a
    // checkpointed top-k and shows nothing): one round of training over
    // a tiny corpus — the DP must plan as hash aggregates + HOF
    // projections, never a Window and never >4 exchanges
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val df = graft.ops.TextOps.unigramSegment(docs, "text", rounds = 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unigram DP must not window:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 4,
      s"per-position exchanges leaked into the DP:\n$plan")
  }

  test("gr3 HITS rounds: each side joins co-partitioned and aggregates map-side; 1-row max broadcasts") {
    import spark.implicits._
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 102L)).toDF("u", "v")
    val (hubs, _) = graft.ops.GraphOps.hits(edges, iterations = 1)
    // the returned frame is checkpointed; audit the LAST round's plan by
    // rebuilding one un-checkpointed round shape over the hub scores
    val rawA = edges.join(hubs, Seq("u")).groupBy("v")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("h")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
    val plan = rawA.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"),
      s"HITS side-aggregate must hash-aggregate:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"))
  }

  test("gr4 triangles: wedge and closure are EQUI-joins — the degree orientation must never plan NLJ") {
    // the whole point of orienting by degree is that wedge generation is
    // an equi-join on the shared source with a post-filter, and closure
    // an equi-join on the (y, z) arc — a nested-loop anywhere means the
    // O(E^1.5) bound is gone
    val plan = SparkEntry.queries("gr4_triangles")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in triangle plan:\n$plan")
    assert(!plan.contains("Window"), s"window crept into triangle plan:\n$plan")
  }

  test("gr5 k-core rounds: alive filtering is two semi-joins + a hash aggregate") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("u", "v")
    val alive = edges.select(org.apache.spark.sql.functions.col("u")).distinct()
    val round = edges.join(alive, Seq("u"), "left_semi")
      .join(alive.select(org.apache.spark.sql.functions.col("u").as("v")), Seq("v"), "left_semi")
      .groupBy("u").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("deg"))
    val plan = round.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"k-core round lost its semi-joins:\n$plan")
    assert(plan.contains("HashAggregate"), s"k-core degree count must hash-aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("cls3 split search: candidate scoring is a map-side-combined hash aggregate, never a window or NLJ") {
    // the returned confusion frame is checkpointed (three bounded 1-row
    // collects happen during training), so audit the candidate-scoring
    // shape itself — the aggregate every split search runs: exploded
    // thresholds -> groupBy (bucket, theta) -> sums, <= 4096·|theta|
    // groups in the exchange however large the corpus
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val feats = Seq((1L, 1L, 17L, 2L), (2L, -1L, 17L, 1L)).toDF("did", "y", "b", "cnt")
    val cand = feats
      .select(col("y"), col("cnt"),
        explode(array(struct(lit(1L).as("th")), struct(lit(2L).as("th")))).as("t"), col("b"))
      .select(col("b"), col("t.th").as("th"),
        when(col("y") === 1 && col("cnt") >= col("th"), 1L).otherwise(0L).as("isP"),
        when(col("y") === -1 && col("cnt") >= col("th"), 1L).otherwise(0L).as("isN"))
      .groupBy("b", "th").agg(sum("isP").as("pL"), sum("isN").as("nL"))
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"no hash aggregate in split-search plan:\n$plan")
    assert(plan.contains("partial_sum"), s"split search must map-side combine:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"wrong shape in split-search plan:\n$plan")
  }

  test("hh3 CMS: the sketch aggregates in one exchange; the probe join broadcasts the 1024-cell sketch") {
    import spark.implicits._
    val df = (1L to 500L).toDF("v")
    val skPlan = graft.ops.SketchOps.cmsSketch(df, Nil, "v")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(skPlan).size === 1,
      s"CMS sketch must build in one exchange:\n$skPlan")
    val est = graft.ops.SketchOps.cmsEstimate(
      graft.ops.SketchOps.cmsSketch(df, Nil, "v"), (1L to 5L).toDF("v"), "v")
    val estPlan = est.queryExecution.executedPlan.toString
    assert(estPlan.contains("BroadcastHashJoin"),
      s"CMS probe must broadcast the bounded sketch:\n$estPlan")
  }

  test("ret1 BM25: the query-term frame broadcasts into tf — the corpus never shuffles for scoring") {
    // the ret1 face checkpoints the scores before the per-query limits;
    // audit the scoring frame itself
    val docs = graft.Tables.load(spark, dir, "documents")
    val plan = graft.ops.TextOps.bm25Scores(docs, "doc_id", "text",
        Seq(("q1", "spark merge"))).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"BM25 scoring join must broadcast the query/idf side:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in BM25 plan:\n$plan")
  }

  test("txt23 PMI: pair generation is an equi-join on the doc key; word tables broadcast") {
    val docs = graft.Tables.load(spark, dir, "documents")
    val plan = graft.ops.TextOps.pmiPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the sole BroadcastNestedLoopJoin is the 1-row N totals crossJoin —
    // the repo's standard pattern; what must NOT appear is an
    // unconditioned cartesian or a shuffle for the word tables
    assert(!plan.contains("CartesianProduct"), s"cartesian in PMI plan:\n$plan")
    assert("BroadcastHashJoin \\[did".r.findFirstIn(plan).isDefined,
      s"pair generation must equi-join on the doc key:\n$plan")
    assert("BroadcastHashJoin \\[w".r.findFirstIn(plan).isDefined,
      s"word-frequency tables must broadcast:\n$plan")
  }

  test("km2 k-center: the per-round state update is map-only — one broadcast seed, no shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = Seq((0L, Array(0L, 1L), 5L), (1L, Array(2L, 3L), 7L))
      .toDF("vid", "qv", "mind")
    val sv = Seq(Tuple1(Array(1L, 1L))).toDF("sv")
    val updated = pts.crossJoin(broadcast(sv))
      .select(col("vid"), col("qv"),
        least(col("mind"), aggregate(zip_with(col("qv"), col("sv"),
          (a, b) => (a - b) * (a - b)), lit(0L), (s, t) => s + t)).as("mind"))
    val plan = updated.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"k-center state update must not shuffle:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row seed must broadcast:\n$plan")
  }

  test("ret2 hybrid fusion: every ranking and the fusion use heap aggregates, never a Window sort") {
    val plan = SparkEntry.queries("ret2_rrf")(spark, dir)
      .queryExecution.executedPlan.toString
    // BM25 top-20, cosine top-20, and the fused top-10 all rank via the
    // bounded graft_topk aggregate (groups×k exchange); a Window here
    // would shuffle-and-sort every scored row per query
    assert(!plan.contains("Window"), s"ranking must not plan a Window:\n$plan")
    assert(plan.contains("graft_topk"), s"expected heap-aggregate ranking:\n$plan")
  }

  test("deletion-vector read: broadcast ANTI join at scan, data side unshuffled") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("dv_audit").toFile.getAbsolutePath
    val orders = Tables.load(spark, dir, "orders")
    graft.sources.ManifestTable.create(spark, root, orders)
    graft.sources.ManifestTable.deleteMor(spark, root, col("o_orderkey") % 7 === 0)
    val plan = graft.sources.ManifestTable.read(spark, root)
      .queryExecution.executedPlan.toString
    // the vector applies as a broadcast anti-join: the 100 TB data side
    // streams through the join unshuffled; only the tiny vector moves
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"DV must apply as a broadcast anti-join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"DV application must not shuffle the data side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"DV application must not sort-merge:\n$plan")
  }

  test("agg9 HLL registers: ONE exchange, carrying register rows only") {
    import spark.implicits._
    val df = (1L to 100L).map(v => ("g", v)).toDF("g", "v")
    val plan = graft.ops.SketchOps.hllRegisters(df, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    // partial max per map task -> exchange of <= m rows per group ->
    // final max; a second exchange would mean the sketch shuffles data
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one exchange, got $exchanges:\n$plan")
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"register max must map-side combine:\n$plan")
  }

  test("media near-dup banding plans an EQUI join on the band bucket — no cartesian, no window") {
    import spark.implicits._
    val imgs = (0 until 6).map(i =>
      (i.toLong, graft.ops.ImageFixtures.syntheticPng(i, perturbed = false)))
      .toDF("img_id", "content")
    val wavs = (0 until 6).map(i =>
      (i.toLong, graft.ops.AudioFixtures.syntheticWav(i, perturbed = false)))
      .toDF("clip_id", "content")
    for ((what, df) <- Seq(
        "image" -> graft.ops.MultimodalOps.imageNearDupPairs(imgs, "img_id", "content"),
        "audio" -> graft.ops.MultimodalOps.audioNearDupPairs(wavs, "clip_id", "content"))) {
      val plan = df.queryExecution.executedPlan.toString
      // candidates come ONLY from equal band buckets: a hash-joinable
      // equi join, never all-pairs — the property that makes the pair
      // stage O(collisions) instead of O(N²) at corpus scale
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"$what banding must not plan all-pairs:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
        plan.contains("ShuffledHashJoin"), s"$what banding must plan an equi join:\n$plan")
      assert(!plan.contains("Window"), s"$what banding must not sort per group:\n$plan")
    }
  }
}
