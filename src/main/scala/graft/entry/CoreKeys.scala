package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{ClassifyOps, ContaminationOps, DedupOps, EventOps, LakeOps, PackOps, QuantizeOps, SampleOps, SimilarityOps, TextOps}
import graft.EntryHelpers._

/** Driver-contract keys — reference-parity surface: projections, joins, aggregates, quality checks, marts, source round-trips, corpus report cards (SURVEY §2.2-2.6).
  *
  * Mechanically split out of SparkEntry (round 15) with ZERO behavior
  * change: entries are verbatim; [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] concatenate the families. Shared helper
  * builders live in [[EntryHelpers]].
  */
private[graft] object CoreKeys {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_rename_project" -> ((s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("name"),
        col("c_mktsegment").as("segment"))),

    "p3_scalar_arithmetic" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .as("charge"))),

    "f1_filter_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_discount", "l_extendedprice")),

    // ---- joins + aggregation shapes (SURVEY §2.3/§2.4) ----,

    "j1_left_join_agg" -> ((s, dir) => {
      // J1 shape: fact ⟕ dim then group by the right side's key — left join
      // so unmatched facts land in a NULL-key group, never dropped.
      // The partial aggregate is pushed BELOW the join (a rewrite Catalyst
      // doesn't perform): revenue/count collapse to one row per order key
      // first, so both the join and the custkey shuffle move |orders|
      // rows instead of |lineitem| (~4× narrower at every exchange; j1 was
      // the suite's worst 10× growth factor, ×12.6, before this). Exact
      // decimal addition is associative, so the flat-sum oracle still
      // hash-matches (ExactSums.dsumPartial/dsumFinal contract).
      val perOrder = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
          graft.ops.ExactSums.dsumPartial(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_part"),
          count(lit(1)).as("n_part"))
      perOrder
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"), "left")
        .groupBy("o_custkey")
        .agg(graft.ops.ExactSums.dsumFinal(col("rev_part")).as("revenue"),
          sum(col("n_part")).as("n_items"))
    }),

    "j2_customer360" -> ((s, dir) => customer360(s, dir)),

    "a4_group_minmaxcount" -> ((s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey").agg(
        min("o_orderdate").as("first_order"),
        max("o_orderdate").as("last_order"),
        count("o_orderkey").as("n_orders"))),

    "a6_pivot_sum" -> ((s, dir) => {
      // statically-declared pivot (orders.sql:1 pattern): fixed status set,
      // else-0 semantics, schema never data-driven
      val statuses = Seq("F", "O", "P")
      val pivots = statuses.map(st =>
        dsum(when(col("o_orderstatus") === st, col("o_totalprice")).otherwise(lit(0.0)))
          .as(s"status_${st.toLowerCase}_amount"))
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(pivots.head, (pivots.tail :+ dsum(col("o_totalprice")).as("total_amount")): _*)
    }),

    "mart_orders_full" -> ((s, dir) => {
      // orders-mart shape (J4+A6+A7): per-order revenue pivot by returnflag
      val flags = Seq("R", "A", "N")
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val pivots = flags.map(f =>
        dsum(when(col("l_returnflag") === f, rev).otherwise(lit(0.0)))
          .as(s"${f.toLowerCase}_amount"))
      val perOrder = t(s, dir, "lineitem").groupBy("l_orderkey")
        .agg(pivots.head, (pivots.tail :+ dsum(rev).as("amount")): _*)
      t(s, dir, "orders")
        .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("r_amount"), col("a_amount"), col("n_amount"), col("amount"))
    }),

    // ---- the four dbt test operators as queries (SURVEY §2.6), reusing
    // the graft.quality.Checks implementations the 20-test suite runs ----,

    "q1_unique_violations" -> ((s, dir) =>
      graft.quality.Checks.unique(t(s, dir, "lineitem"), "l_partkey")),

    "q2_not_null_violations" -> ((s, dir) =>
      graft.quality.Checks.notNull(t(s, dir, "orders"), "o_custkey")
        .select("o_orderkey", "o_custkey")),

    "q3_accepted_values_violations" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type").isNotNull && !col("event_type").isin("purchase", "click", "view"))
        .groupBy("event_type").agg(count(lit(1)).as("n_rows"))),

    "q4_relationship_violations" -> ((s, dir) => {
      val parent = t(s, dir, "supplier").filter(col("s_suppkey") < 5)
        .select(col("s_suppkey"))
      t(s, dir, "lineitem").filter(col("l_suppkey").isNotNull)
        .join(parent, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .select("l_orderkey", "l_linenumber", "l_suppkey")
    }),

    // ---- window / set / distinct / semi-join extensions (SURVEY §2.7) ----,

    "j3_full_outer" -> ((s, dir) => {
      // full-outer join with unmatched rows on BOTH sides
      val c = t(s, dir, "customer").filter(col("c_custkey") < 800)
        .select("c_custkey", "c_name")
      val o = t(s, dir, "orders").filter(col("o_custkey") >= 400)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"), col("n_orders"))
    }),

    "a9_unpivot" -> ((s, dir) => {
      // unpivot/melt — the inverse of a6's pivot: wide metric columns
      // back to (key, metric, value) long form, a narrow projection
      // (each input row emits one row per value column, no shuffle
      // beyond the feeding aggregate)
      val wide = t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"), dsum(col("l_extendedprice")).as("sum_price"))
      wide.unpivot(Array(col("l_returnflag")), Array(col("sum_qty"), col("sum_price")),
        "metric", "value")
    }),

    "j5_nullsafe_join" -> ((s, dir) => {
      // null-safe equality (<=>): NULL keys MATCH each other, where a
      // plain equi-join silently drops them — the semantics dimension
      // tables with "unknown" buckets need
      val e = t(s, dir, "events").withColumn("grp",
        when(col("event_type") === "click", lit(null).cast("string")).otherwise(col("event_type")))
      val a = e.groupBy("grp").agg(count(lit(1)).as("n_all"))
      val b = e.filter(col("value") > 50).groupBy("grp").agg(count(lit(1)).as("n_high"))
      a.join(b, a("grp") <=> b("grp"))
        .select(a("grp").as("grp"), col("n_all"), col("n_high"))
    }),

    "src6_datagen_pushdown" -> ((s, dir) =>
      // custom DataSourceV2 connector with REAL filter pushdown: the id
      // bounds reach DatagenScan.planInputPartitions and prune input
      // partitions at planning time (DatagenSpec asserts the count); the
      // bucket predicate stays a residual filter above the scan. Pure
      // function of id -> identical on any partitioning, and
      // generate_series replays it under the oracle
      s.read.format(classOf[graft.sources.DatagenTableProvider].getName)
        .option("numRows", 60000).option("numPartitions", 32).load()
        .filter(col("id") >= 1200L && col("id") < 45000L && col("bucket") === 7L)
        .select("id", "bucket", "price", "category")),

    "src7_datagen_agg_pushdown" -> ((s, dir) =>
      // complete aggregate pushdown into the V2 source: count/min/max
      // over the pushed id range answer in CLOSED FORM — the scan emits
      // one row and generates nothing (DatagenSpec asserts no
      // HashAggregate in the plan)
      s.read.format(classOf[graft.sources.DatagenTableProvider].getName)
        .option("numRows", 60000).option("numPartitions", 32).load()
        .filter(col("id") >= 1200L && col("id") < 45000L)
        .agg(count(lit(1)).as("n"), min("id").as("lo_id"), max("id").as("hi_id"))),

    "src9_datagen_groupby_pushdown" -> ((s, dir) =>
      // GROUP BY pushed into the V2 source: bucket = id % 100 makes
      // each group an arithmetic progression over the pushed range, so
      // count/min/max per group answer in closed form — the scan emits
      // ≤100 pre-aggregated rows, Spark plans NO aggregate and nothing
      // is generated (DatagenSpec asserts both); group-bys the source
      // can't answer (category) decline and plan normally
      s.read.format(classOf[graft.sources.DatagenTableProvider].getName)
        .option("numRows", 60000).option("numPartitions", 32).load()
        .filter(col("id") >= 1200L && col("id") < 45000L)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("id").as("lo_id"), max("id").as("hi_id"))),

    "src10_datagen_multi_groupby" -> ((s, dir) =>
      // the generalized pushdown tier: TWO residue-class group columns
      // plus SUM — every (category, bucket) group is a union of
      // arithmetic progressions whose count/sum merge as a monoid, so
      // the scan still answers closed-form with no aggregate planned
      s.read.format(classOf[graft.sources.DatagenTableProvider].getName)
        .option("numRows", 60000).option("numPartitions", 32).load()
        .filter(col("id") >= 1200L && col("id") < 45000L)
        .groupBy("category", "bucket")
        .agg(count(lit(1)).as("n"), sum("id").as("sum_id"))),

    "q5_correlated_subquery" -> ((s, dir) => {
      // the SQL entry surface: correlated scalar subqueries through
      // spark.sql over a temp view (decorrelated by Catalyst into
      // aggregate+join — no per-row re-execution; verified in the plan).
      // Orders strictly above their customer's average, compared in
      // EXACT integer cents (price·n > Σprices avoids any
      // division/rounding divergence). Note each subquery decorrelates
      // into its own scan+aggregate — at scale the single-pass
      // formulation is a plain grouped join computing (count, sum)
      // together; this query exists to pin the SQL-subquery surface
      val o = t(s, dir, "orders")
      o.createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o.o_orderkey, o.o_custkey
        FROM orders_v o
        WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) *
              (SELECT count(*) FROM orders_v i WHERE i.o_custkey = o.o_custkey)
              > (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
                 FROM orders_v i WHERE i.o_custkey = o.o_custkey)
      """)
    }),

    "q7_lateral_subquery" -> ((s, dir) => {
      // LATERAL subquery surface: a correlated scalar-aggregate derived
      // table per outer row, decorrelated by Catalyst into one grouped
      // left join (no per-row re-execution); orders with no lineitems
      // keep the lateral's (NULL max, 0 count) row
      t(s, dir, "orders").createOrReplaceTempView("orders_v7")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v7")
      s.sql("""
        SELECT o.o_orderkey, t.top_price, t.n_items
        FROM orders_v7 o,
        LATERAL (SELECT max(l.l_extendedprice) AS top_price,
                        CAST(count(*) AS BIGINT) AS n_items
                 FROM lineitem_v7 l WHERE l.l_orderkey = o.o_orderkey) t
      """)
    }),

    "j6_star_join" -> ((s, dir) => {
      // the canonical deep star shape: 7-way join (nation enters TWICE —
      // once per FK chain) over the full schema. lineitem⋈orders is the
      // one genuine big-big shuffle; every dimension hop (supplier,
      // nation×2, region, and customer at test SF) broadcasts, so the
      // fact table is never re-shuffled for a dimension — the plan is one
      // exchange for the fact join plus a broadcast cascade, then the
      // grouped aggregate. Plan-asserted in PlanAuditSpec. Declared as a
      // flat join chain: Catalyst's join reordering owns the order.
      val li = t(s, dir, "lineitem")
      val custNation = t(s, dir, "nation").select(
        col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"),
        col("n_regionkey").as("cn_regionkey"))
      val suppNation = t(s, dir, "nation").select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(custNation, col("c_nationkey") === col("cn_key"))
        .join(t(s, dir, "region"), col("cn_regionkey") === col("r_regionkey"))
        .join(suppNation, col("s_nationkey") === col("sn_key"))
        .groupBy(col("r_name").as("cust_region"), col("cust_nation"), col("supp_nation"))
        .agg(count(lit(1)).cast("long").as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),

    "j7_star_filtered" -> ((s, dir) => {
      // TPC-H Q5 proper: the selective-dimension variant. The region
      // predicate lives on the 5-row region table; with the broadcast
      // cascade it prunes nation→customer/supplier BEFORE the fact join,
      // and the o_orderdate range is pushed into the orders parquet scan
      // (both plan-asserted). Q5's signature twist — local commerce,
      // c_nationkey = s_nationkey — rides the supplier join as an extra
      // equi-key rather than a post-join filter.
      val nat = t(s, dir, "nation")
      val asiaNations = nat
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).cast("long").as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),

    "src1_json_roundtrip" -> ((s, dir) => {
      // JSON-lines source under the oracle: export a projection to JSON,
      // read it back with an explicit schema (no runtime inference — the
      // same discipline as the CSV seeds), aggregate. The oracle computes
      // the identical aggregate from parquet, so the JSON reader path
      // itself is what's being hash-checked.
      val staged = java.nio.file.Files.createTempDirectory("src1_json")
      staged.toFile.deleteOnExit()
      val proj = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      proj.write.mode("overwrite").json(staged.toString)
      s.read.schema(proj.schema).json(staged.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }),

    "src8_orc_roundtrip" -> ((s, dir) => {
      // ORC source/sink under the oracle (Spark's second built-in
      // columnar format): export a projection to ORC, read it back,
      // filter + aggregate — the filter must push into the ORC scan
      // exactly as with parquet (plan-audited). The oracle computes the
      // identical aggregate from parquet, so the ORC reader/writer path
      // itself is what's being hash-checked.
      val staged = java.nio.file.Files.createTempDirectory("src8_orc")
      staged.toFile.deleteOnExit()
      val proj = t(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      proj.write.mode("overwrite").orc(staged.toString)
      s.read.orc(staged.toString)
        .filter(col("l_quantity") >= 25.0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
    }),

    "src2_csv_roundtrip" -> ((s, dir) => {
      // CSV source under the oracle (the jaffle seed path, on driver
      // data): export, read back with the pinned schema, aggregate
      val staged = java.nio.file.Files.createTempDirectory("src2_csv")
      staged.toFile.deleteOnExit()
      val proj = t(s, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
      proj.write.mode("overwrite").option("header", "true").csv(staged.toString)
      s.read.schema(proj.schema).option("header", "true").csv(staged.toString)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_balance"))
    }),

    "src4_bucketed_join" -> ((s, dir) => {
      // bucketed co-located join under the oracle: both sides written
      // bucketBy+sortBy on their join key with equal bucket counts, so
      // the sort-merge join reads pre-shuffled, pre-sorted buckets — NO
      // exchange and no sort on either join input (asserted in
      // PlanAuditSpec; the only exchange left is the final groupBy's).
      // hint("merge") keeps the planner from broadcasting the small side
      // at test SF, where the co-location demo would silently vanish.
      // The oracle runs the same join+aggregate on the flat parquet.
      val so = java.nio.file.Files.createTempDirectory("src4_bko")
      val sc = java.nio.file.Files.createTempDirectory("src4_bkc")
      so.toFile.deleteOnExit(); sc.toFile.deleteOnExit()
      graft.sources.Warehouse.writeBucketed(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "src4_orders_bk", "o_custkey", 8, Some(so.toString))
      graft.sources.Warehouse.writeBucketed(
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        "src4_customer_bk", "c_custkey", 8, Some(sc.toString))
      graft.sources.Warehouse.readTable(s, "src4_orders_bk")
        .join(graft.sources.Warehouse.readTable(s, "src4_customer_bk").hint("merge"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }),

    "src3_partitioned_roundtrip" -> ((s, dir) => {
      // partitioned-layout round-trip under the oracle: write orders
      // partitioned by status, read back with a partition predicate —
      // the scan prunes directories (spec-asserted in WarehouseSpec);
      // the oracle applies the same predicate to the flat parquet
      val staged = java.nio.file.Files.createTempDirectory("src3_part")
      staged.toFile.deleteOnExit()
      graft.sources.Warehouse.writePartitioned(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
        staged.toString, Seq("o_orderstatus"))
      graft.sources.Warehouse.readPartitioned(s, staged.toString)
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }),

    "src5_schema_evolution" -> ((s, dir) => {
      // schema-evolution read: generation 1 of the lake predates the
      // status column; generation 2 adds it. mergeSchema unions the file
      // schemas (gen-1 rows surface NULL status) — the drift pattern
      // every long-lived 100 TB table hits. The merged scan still prunes
      // columns and pushes filters (spec-asserted in WarehouseSpec); the
      // oracle replays the generational split from the flat table.
      val staged = java.nio.file.Files.createTempDirectory("src5_evo")
      staged.toFile.deleteOnExit()
      val orders = t(s, dir, "orders")
      orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$staged/gen1")
      orders.filter(col("o_orderkey") % 2 =!= 0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite").parquet(s"$staged/gen2")
      s.read.option("mergeSchema", "true").parquet(s"$staged/gen1", s"$staged/gen2")
        .groupBy(coalesce(col("o_orderstatus"), lit("legacy")).as("status_merged"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }),

    "q7_freshness" -> ((s, dir) =>
      // dbt source-freshness analog: per event stream, the newest
      // record, its staleness in exact integer minutes against the
      // table-wide newest timestamp (the deterministic anchor), and the
      // pass/warn/error verdict at 15/60 minutes.
      graft.quality.Checks.sourceFreshness(t(s, dir, "events"),
        "event_type", "ts", warnAfterMinutes = 15, errorAfterMinutes = 60)),

    "q8_lateral_join" -> ((s, dir) => {
      // LATERAL correlated subquery in FROM (SQL:1999; Spark 4 + DuckDB
      // both speak it): each customer's top-2 orders by price. Catalyst
      // DECORRELATES the per-row subquery into a window/join plan — the
      // per-customer loop a naive engine would run never exists.
      t(s, dir, "customer").createOrReplaceTempView("q8_customer")
      t(s, dir, "orders").createOrReplaceTempView("q8_orders")
      s.sql("""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM q8_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM q8_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o""")
    }),

    "rpt2_source_quality" -> ((s, dir) => {
      // the curation view: per-source Gopher/C4 gate pass rates — the
      // SAME composed gate pipe2 filters with, rolled up by source so
      // "which domains are rotten" is answerable before dropping docs
      graft.functions.NativeExpressions.register(s)
      TextOps.qualityReport(t(s, dir, "documents"), "source", "text")
    }),

    "rpt1_corpus_card" -> ((s, dir) => {
      // the corpus datasheet in ONE pass + three 1-row side aggregates
      // (token stats from the exploded stream; distinct-text and
      // per-column cardinalities; exact median via the dyadic 0.5
      // percentile on integer token counts): the summary every corpus
      // release publishes, integer-exact or exactly-rounded throughout
      val docs = t(s, dir, "documents")
      val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      val tokStats = toks.agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("vocab_size"))
      val lens = docs.select(size(split(col("text"), " ")).cast("long").as("n"))
      val lenStats = lens.agg(
        round(avg(col("n")), 4).as("mean_tokens"),
        expr("percentile(n, 0.5)").as("p50_tokens"),
        max(col("n")).as("max_tokens"))
      val docStats = docs.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
      docStats.crossJoin(broadcast(tokStats)).crossJoin(broadcast(lenStats))
        .select(col("n_docs"), col("n_distinct_texts"), col("n_langs"),
          col("n_sources"),
          round(col("n_en").cast("double") / col("n_docs"), 4).as("en_share"),
          col("n_tokens"), col("vocab_size"),
          col("mean_tokens"), col("p50_tokens"), col("max_tokens"))
    }),

    "q6_exists_subquery" -> ((s, dir) => {
      // EXISTS / NOT EXISTS correlated subqueries through the SQL
      // surface (q5 covers scalar subqueries): customers with at least
      // one finished order and no pending one — Catalyst plans these as
      // semi/anti joins, not per-row re-execution
      t(s, dir, "customer").createOrReplaceTempView("q6_customer")
      t(s, dir, "orders").createOrReplaceTempView("q6_orders")
      s.sql("""
        SELECT c_custkey, c_mktsegment FROM q6_customer c
        WHERE EXISTS (SELECT 1 FROM q6_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM q6_orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
      """)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "p1_rename_project" ->
      "SELECT c_custkey AS customer_id, c_name AS name, c_mktsegment AS segment FROM customer",

    "p3_scalar_arithmetic" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge FROM lineitem",

    "f1_filter_project" ->
      ("SELECT l_orderkey, l_linenumber, l_shipdate, l_discount, l_extendedprice FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05"),

    "j1_left_join_agg" ->
      (s"SELECT o.o_custkey, ${dsumSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue, " +
        "CAST(count(*) AS BIGINT) AS n_items " +
        "FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY o.o_custkey"),

    "j2_customer360" ->
      (s"""WITH order_stats AS (
         |  SELECT o_custkey, min(o_orderdate) AS first_order, max(o_orderdate) AS most_recent_order,
         |         CAST(count(o_orderkey) AS BIGINT) AS number_of_orders
         |  FROM orders GROUP BY o_custkey
         |), revenue AS (
         |  SELECT o.o_custkey, ${dsumSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS lifetime_value
         |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY o.o_custkey
         |)
         |SELECT c.c_custkey AS customer_id, c.c_name AS name, s.first_order, s.most_recent_order,
         |       s.number_of_orders, r.lifetime_value
         |FROM customer c
         |LEFT JOIN order_stats s ON c.c_custkey = s.o_custkey
         |LEFT JOIN revenue r ON c.c_custkey = r.o_custkey""").stripMargin,

    "a4_group_minmaxcount" ->
      ("SELECT o_custkey, min(o_orderdate) AS first_order, max(o_orderdate) AS last_order, " +
        "CAST(count(o_orderkey) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey"),

    "a6_pivot_sum" ->
      (s"SELECT o_custkey, " +
        s"${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS status_f_amount, " +
        s"${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END")} AS status_o_amount, " +
        s"${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END")} AS status_p_amount, " +
        s"${dsumSql("o_totalprice")} AS total_amount " +
        "FROM orders GROUP BY o_custkey"),

    "mart_orders_full" ->
      (s"""WITH per_order AS (
         |  SELECT l_orderkey,
         |    ${dsumSql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS r_amount,
         |    ${dsumSql("CASE WHEN l_returnflag = 'A' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS a_amount,
         |    ${dsumSql("CASE WHEN l_returnflag = 'N' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS n_amount,
         |    ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS amount
         |  FROM lineitem GROUP BY l_orderkey
         |)
         |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, p.r_amount, p.a_amount, p.n_amount, p.amount
         |FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey""").stripMargin,

    "q1_unique_violations" ->
      ("SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_rows FROM lineitem " +
        "WHERE l_partkey IS NOT NULL GROUP BY l_partkey HAVING count(*) > 1"),

    "q2_not_null_violations" ->
      "SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey IS NULL",

    "q3_accepted_values_violations" ->
      ("SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows FROM events " +
        "WHERE event_type IS NOT NULL AND event_type NOT IN ('purchase', 'click', 'view') " +
        "GROUP BY event_type"),

    "q4_relationship_violations" ->
      ("SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem " +
        "WHERE l_suppkey IS NOT NULL AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey < 5)"),

    "j3_full_outer" ->
      ("""WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 800),
         |     o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
         |           FROM orders WHERE o_custkey >= 400 GROUP BY o_custkey)
         |SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.c_name, o.n_orders
         |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey""").stripMargin,

    "a9_unpivot" -> // UNION ALL is the engine-portable unpivot
      (s"""WITH w AS (
         |  SELECT l_returnflag, ${dsumSql("l_quantity")} AS sum_qty,
         |         ${dsumSql("l_extendedprice")} AS sum_price
         |  FROM lineitem GROUP BY l_returnflag
         |)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
         |UNION ALL
         |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM w""").stripMargin,

    "j5_nullsafe_join" ->
      ("""WITH e AS (
         |  SELECT CASE WHEN event_type = 'click' THEN NULL ELSE event_type END AS grp, value
         |  FROM events
         |), a AS (
         |  SELECT grp, CAST(count(*) AS BIGINT) AS n_all FROM e GROUP BY grp
         |), b AS (
         |  SELECT grp, CAST(count(*) AS BIGINT) AS n_high FROM e WHERE value > 50 GROUP BY grp
         |)
         |SELECT a.grp, a.n_all, b.n_high
         |FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp""").stripMargin,

    "q7_lateral_subquery" -> // identical LATERAL syntax both engines
      ("""SELECT o.o_orderkey, t.top_price, t.n_items
         |FROM orders o,
         |LATERAL (SELECT max(l.l_extendedprice) AS top_price,
         |                CAST(count(*) AS BIGINT) AS n_items
         |         FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) t""").stripMargin,

    "q5_correlated_subquery" ->
      ("""SELECT o.o_orderkey, o.o_custkey
         |FROM orders o
         |WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) *
         |      (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
         |      > (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
         |         FROM orders i WHERE i.o_custkey = o.o_custkey)""").stripMargin,

    "j6_star_join" -> // 7-way star: nation joins twice (customer's and
      // supplier's FK chains); revenue in the dsum exact-decimal contract
      (s"""SELECT r.r_name AS cust_region, cn.n_name AS cust_nation, sn.n_name AS supp_nation,
         |       CAST(count(*) AS BIGINT) AS n_items,
         |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |JOIN region r ON cn.n_regionkey = r.r_regionkey
         |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         |GROUP BY 1, 2, 3""").stripMargin,

    "j7_star_filtered" -> // TPC-H Q5 shape: selective region + date range,
      // local commerce via c_nationkey = s_nationkey on the supplier join
      (s"""SELECT cn.n_name AS nation, CAST(count(*) AS BIGINT) AS n_items,
         |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
         |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |JOIN region r ON cn.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'ASIA'
         |  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o.o_orderdate < TIMESTAMP '1996-01-01'
         |GROUP BY 1""").stripMargin,

    "src1_json_roundtrip" -> // the oracle reads parquet; Spark reads its own JSON export
      (s"SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders, " +
        s"${dsumSql("o_totalprice")} AS total_price FROM orders GROUP BY o_orderstatus"),

    "src2_csv_roundtrip" ->
      (s"SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers, " +
        s"${dsumSql("c_acctbal")} AS total_balance FROM customer GROUP BY c_mktsegment"),

    "src8_orc_roundtrip" -> // same aggregate from parquet: the ORC
      // writer+reader path is what the hash checks
      (s"SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows, " +
        s"${dsumSql("l_extendedprice")} AS sum_price " +
        "FROM lineitem WHERE l_quantity >= 25.0 GROUP BY l_returnflag"),

    "src3_partitioned_roundtrip" ->
      (s"SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders, " +
        s"${dsumSql("o_totalprice")} AS total_price FROM orders " +
        "WHERE o_orderstatus = 'F' GROUP BY o_custkey"),

    "src4_bucketed_join" -> // the oracle joins the flat parquet; Spark
      // reads its own bucketed tables — the layout round-trip is the test
      (s"SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, " +
        s"${dsumSql("o_totalprice")} AS total_price " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"),

    "src5_schema_evolution" -> // the oracle replays the generational split
      // (even keys were written before the status column existed)
      (s"SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'legacy' ELSE o_orderstatus END AS status_merged, " +
        s"CAST(count(*) AS BIGINT) AS n_orders, ${dsumSql("o_totalprice")} AS total_price " +
        "FROM orders GROUP BY 1"),

    "q7_freshness" -> // display staleness floored to integer minutes;
      // the VERDICT compares un-floored micros strictly-greater against
      // the thresholds (dbt's rule: exactly warn_after old still passes)
      ("""WITH latest AS (
         |  SELECT event_type, max(ts) AS latest_ts FROM events GROUP BY 1
         |), a AS (
         |  SELECT max(ts) AS anchor FROM events
         |)
         |SELECT event_type, latest_ts,
         |       (epoch_us(anchor) - epoch_us(latest_ts)) // 60000000 AS staleness_minutes,
         |       CASE WHEN epoch_us(anchor) - epoch_us(latest_ts) <= CAST(15 AS BIGINT) * 60000000 THEN 'pass'
         |            WHEN epoch_us(anchor) - epoch_us(latest_ts) <= CAST(60 AS BIGINT) * 60000000 THEN 'warn'
         |            ELSE 'error' END AS freshness_status
         |FROM latest, a""").stripMargin,

    "q8_lateral_join" -> // the same LATERAL shape verbatim — DuckDB
      // executes the correlated subquery natively
      ("""SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
         |FROM customer c,
         |LATERAL (
         |  SELECT o_orderkey, o_totalprice FROM orders
         |  WHERE o_custkey = c.c_custkey
         |  ORDER BY o_totalprice DESC, o_orderkey
         |  LIMIT 2
         |) o""").stripMargin,

    "rpt2_source_quality" -> // pipe2's gate formulations grouped instead
      // of filtered; NULL gate terms (too-short docs) count as fails,
      // matching when(...).otherwise(0)
      ("""WITH t AS (
         |  SELECT source, text, string_split(text, ' ') AS toks, string_split(text, '') AS chars FROM documents
         |), f AS (
         |  SELECT source,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
         |    CASE WHEN len(toks) - 2 >= 1 THEN
         |      round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
         |          i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
         |        / CAST(len(toks) - 2 AS DOUBLE), 4)
         |    ELSE NULL END AS dup3_frac,
         |    CASE WHEN length(text) >= 1 THEN
         |      round(-list_sum(list_transform(list_distinct(chars),
         |        ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
         |              * ln(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars)))), 4)
         |    ELSE NULL END AS char_entropy
         |  FROM t
         |)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN n_tokens >= 25 AND stopword_ratio >= 0.05
         |                      AND dup3_frac <= 0.05 AND char_entropy >= 2.8
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |       round(CAST(sum(CASE WHEN n_tokens >= 25 AND stopword_ratio >= 0.05
         |                           AND dup3_frac <= 0.05 AND char_entropy >= 2.8
         |                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS pass_share
         |FROM f GROUP BY source""").stripMargin,

    "rpt1_corpus_card" -> // every summary re-derived: integer counts,
      // exactly-rounded mean, dyadic-exact interpolated median
      ("""WITH tokstats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_tokens,
         |         CAST(count(DISTINCT tok) AS BIGINT) AS vocab_size
         |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |), lens AS (
         |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents
         |), lenstats AS (
         |  SELECT round(avg(n), 4) AS mean_tokens,
         |         quantile_cont(n, 0.5) AS p50_tokens,
         |         CAST(max(n) AS BIGINT) AS max_tokens
         |  FROM lens
         |), docstats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
         |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
         |  FROM documents
         |)
         |SELECT n_docs, n_distinct_texts, n_langs, n_sources,
         |       round(CAST(n_en AS DOUBLE) / n_docs, 4) AS en_share,
         |       n_tokens, vocab_size, mean_tokens, p50_tokens, max_tokens
         |FROM docstats CROSS JOIN tokstats CROSS JOIN lenstats""").stripMargin,

    "q6_exists_subquery" ->
      ("""SELECT c_custkey, c_mktsegment FROM customer c
         |WHERE EXISTS (SELECT 1 FROM orders o
         |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
         |  AND NOT EXISTS (SELECT 1 FROM orders o2
         |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')""").stripMargin,

    "src6_datagen_pushdown" -> // generate_series replays the pure-integer
      // row generator; both engines divide the same integer by 100.0, so
      // the doubles are bit-identical
      ("""SELECT CAST(i AS BIGINT) AS id,
         |       CAST(i % 100 AS BIGINT) AS bucket,
         |       CAST(i * 7919 % 100000 AS DOUBLE) / 100.0 AS price,
         |       'cat_' || CAST(i % 4 AS VARCHAR) AS category
         |FROM generate_series(0, 59999) t(i)
         |WHERE i >= 1200 AND i < 45000 AND i % 100 = 7""").stripMargin,

    "src7_datagen_agg_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(i) AS BIGINT) AS lo_id, CAST(max(i) AS BIGINT) AS hi_id
        |FROM generate_series(0, 59999) t(i)
        |WHERE i >= 1200 AND i < 45000""".stripMargin,

    "src9_datagen_groupby_pushdown" ->
      ("""SELECT CAST(i % 100 AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
         |       CAST(min(i) AS BIGINT) AS lo_id, CAST(max(i) AS BIGINT) AS hi_id
         |FROM generate_series(0, 59999) t(i)
         |WHERE i >= 1200 AND i < 45000 GROUP BY 1""").stripMargin,

    "src10_datagen_multi_groupby" ->
      ("""SELECT 'cat_' || CAST(i % 4 AS VARCHAR) AS category,
         |       CAST(i % 100 AS BIGINT) AS bucket,
         |       CAST(count(*) AS BIGINT) AS n, CAST(sum(i) AS BIGINT) AS sum_id
         |FROM generate_series(0, 59999) t(i)
         |WHERE i >= 1200 AND i < 45000 GROUP BY 1, 2""").stripMargin
  )
}
