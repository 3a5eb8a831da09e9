package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{ClassifyOps, ContaminationOps, DedupOps, EventOps, LakeOps, PackOps, QuantizeOps, SampleOps, SimilarityOps, TextOps}
import graft.EntryHelpers._

/** Driver-contract keys — relational breadth: agg/window/set/date/subquery/temporal-join/sketch keys (SURVEY §7.4).
  *
  * Mechanically split out of SparkEntry (round 15) with ZERO behavior
  * change: entries are verbatim; [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] concatenate the families. Shared helper
  * builders live in [[EntryHelpers]].
  */
private[graft] object RelationalKeys {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w1_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
    }),

    "w5_range_frame" -> ((s, dir) => {
      // value-based RANGE frame (vs w3's row-based): per customer, spend
      // in the trailing 30 days of each order — the frame is defined by
      // the ORDER BY value, so peers/gaps behave differently from ROWS
      val w = Window.partitionBy("o_custkey")
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-30L * 86400L, 0L)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(w).cast("double").as("trailing_30d_spend"),
        count(lit(1)).over(w).as("trailing_30d_orders"))
    }),

    "w4_topk_agg" -> ((s, dir) => {
      // SAME result as w1's window top-k, via the bounded-heap
      // TypedImperativeAggregate: partial aggregation ships ≤k rows per
      // (group, map task) into the shuffle instead of sorting every row
      graft.functions.NativeExpressions.register(s)
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(expr("graft_topk(o_totalprice, o_orderkey, 3)").as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(col("o_custkey"), col("col.payload").as("o_orderkey"),
          col("col.value").as("o_totalprice"), (col("pos") + 1).cast("int").as("rnk"))
    }),

    "w2_order_limit" -> ((s, dir) =>
      // global top-n: TakeOrderedAndProject, not a full sort — the limit
      // pushes into per-partition heaps; deterministic tie-break on key
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)),

    "w3_window_funcs" -> ((s, dir) => {
      // analytic-window breadth: rank, lag, running sum over an ordered
      // per-customer frame (running DECIMAL sum is order-defined, so it is
      // engine-reproducible without rounding)
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("order_rank"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
    }),

    "set1_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
    }),

    "set2_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "P").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
    }),

    "o1_null_ordering" -> ((s, dir) => {
      // explicit NULL placement in ORDER BY + LIMIT: engines disagree on
      // the default (Spark: NULLS FIRST asc; DuckDB: NULLS LAST), so any
      // cross-engine top-n over a nullable key MUST pin it; NULLS FIRST
      // surfaces the no-order customers, tie-broken to a total order
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("n_orders"))
        .orderBy(col("n_orders").desc_nulls_first, col("c_custkey").asc)
        .limit(25)
    }),

    "set3_except_all" -> ((s, dir) => {
      // multiset difference: keeps SURPLUS duplicates (an O-status row is
      // removed once per matching F-status row, not wholesale) — distinct
      // except() can't express this; planned as a count-based anti pattern
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .exceptAll(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
    }),

    "set4_intersect_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .intersectAll(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
    }),

    "d1_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    "x2_string_agg" -> ((s, dir) =>
      // listagg/string_agg: per-customer order-id roster. Deterministic by
      // construction — collect_list is order-nondeterministic under
      // parallelism, so the list is array_sort'ed BEFORE joining (the
      // oracle mirrors with string_agg(... ORDER BY)); group sizes are
      // bounded (orders per customer), so the buffer is too
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(array_join(
          transform(array_sort(collect_list(col("o_orderkey"))), _.cast("string")),
          ",").as("order_ids"),
          count(lit(1)).as("n_orders"))),

    "x3_array_set_agg" -> ((s, dir) =>
      // collect_set (DISTINCT array agg) beside x2's collect_list:
      // sorted before joining for the same determinism reason; set
      // cardinality rides along as a scalar
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          size(collect_set(col("o_orderpriority"))).cast("long").as("n_priorities"))),

    "hof1_array_funcs" -> ((s, dir) => {
      // collection-function breadth over tokenized text: slice /
      // contains / position plus an order-INSENSITIVE higher-order fold
      // (max token length — greatest() commutes, so any evaluation
      // order agrees; a sum-fold over doubles would not be
      // cross-engine-stable, which is why v1 rounds). All map-only,
      // codegen'd — no shuffle (the txt family's plan discipline)
      val toks = split(col("text"), " ")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_toks"),
        concat_ws(" ", slice(toks, 1, 3)).as("first3"),
        array_contains(toks, "the").as("has_the"),
        aggregate(toks, lit(0), (a, x) => greatest(a, length(x)))
          .cast("long").as("max_tok_len"),
        array_position(toks, "the").as("pos_the"))
    }),

    "dt2_timestamp_funcs" -> ((s, dir) =>
      // timestamp-function breadth on event times: epoch round-trip
      // (second truncation via integer division), day/hour truncation,
      // field extraction. ISO day-of-week (Monday=1) — Spark's weekday()
      // is 0-based Monday and DuckDB's isodow is 1-based, engines'
      // default dayofweek disagree on the week start
      t(s, dir, "events").select(
        col("event_id"),
        unix_micros(col("ts")).as("epoch_us"),
        date_trunc("day", col("ts")).as("day_start"),
        date_trunc("hour", col("ts")).as("hour_start"),
        timestamp_seconds(floor(unix_micros(col("ts")) / lit(1000000L)).cast("long")).as("ts_seconds"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("m"),
        (weekday(col("ts")) + 1).cast("long").as("iso_dow"))),

    "agg10_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS beside agg2's rollup and agg7's cube:
      // the caller picks exactly which subtotal combinations materialize
      // (one shuffle, Expand feeds each row to its sets). grouping_id()
      // disambiguates subtotal rows from genuine NULL group values —
      // first listed column is the most significant bit in both engines
      // (the Postgres convention)
      t(s, dir, "orders").createOrReplaceTempView("agg10_orders")
      s.sql(s"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n_orders,
               ${dsumSql("o_totalprice")} AS amount
        FROM agg10_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())""")
    }),

    "ts1_gap_fill" -> ((s, dir) => {
      // time-series resample + gap fill: hourly per-type counts with
      // missing (hour, type) cells zero-filled. The dense hour spine and
      // the type list both derive from the AGGREGATE (hours × types
      // rows), not the raw events — one scan, one shuffle, and the three
      // consumers of `agg` share the same exchange (Spark's
      // ReuseExchange), so the grid costs nothing extra at 100 TB
      val ev = t(s, dir, "events").select(
        date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"), col("value"))
      val agg = ev.groupBy("hour_start", "event_type").agg(
        count(lit(1)).cast("long").as("n_events"),
        dsum(col("value")).as("amount"))
      val bounds = agg.agg(min("hour_start").as("lo"), max("hour_start").as("hi"))
      val hours = bounds.select(
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hour_start"))
      val types = agg.select("event_type").distinct()
      hours.crossJoin(broadcast(types))
        .join(agg, Seq("hour_start", "event_type"), "left")
        .select(col("hour_start"), col("event_type"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("amount"), lit(0.0)).as("amount"))
    }),

    "pvt1_dynamic_pivot" -> ((s, dir) =>
      // DYNAMIC pivot: the column set is discovered from the data — Spark
      // runs a distinct job first to determine the output schema (the
      // inherent two-pass every dynamic-pivot engine shares; a6 is the
      // static single-pass form with the values pinned). Cells with no
      // input rows stay NULL, distinguishing "no orders" from "sum 0"
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .pivot("o_orderstatus")
        .agg(dsum(col("o_totalprice")))),

    "num1_try_arithmetic" -> ((s, dir) =>
      // ANSI-safe arithmetic breadth: try_divide yields NULL on a zero
      // divisor instead of throwing (this session runs ANSI mode), and
      // string→int parses to NULL for unparseable input — the
      // error-as-NULL contract a 100 TB batch job needs to not die on
      // row 47 billion. MEASURED caveat: bare try_cast is
      // exception-per-failing-row (caught exceptions still fill stack
      // traces — 5.3 s vs 0.3 s over 600 k all-failing rows), so the
      // cast sits behind a codegen'd regex guard and the exception path
      // is reserved for the pathological residue (overflow)
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"), col("l_quantity") - 25).as("safe_ratio"),
        when(col("l_returnflag").rlike("^-?[0-9]+$"), col("l_returnflag").try_cast("int"))
          .as("flag_num"))),

    "rec1_recursive_cte" -> ((s, dir) => {
      // WITH RECURSIVE surface (new in Spark 4): a per-customer
      // linked-list walk over the order sequence — anchor at each
      // customer's first order, recurse along lead(order_id), BOUNDED
      // at 8 hops. The bound is the production discipline for iterative
      // plans: each recursion round is a whole Spark job (~0.3 s fixed
      // scheduling cost at any data size), so unbounded-depth traversal
      // belongs to the window formulation — which is exactly what the
      // ORACLE uses (row_number ≤ 8): two independent formulations must
      // agree, stronger than a mirrored recursion. The next-pointer
      // table is localCheckpoint'd once (the window would otherwise
      // recompute inside every round) and broadcast into each round's
      // join, so a round never shuffles the chain; at 100 TB you'd
      // pre-bucket nxt on order_id instead of broadcasting
      // Spark's recursion guardrail caps TOTAL rows at 1M by default —
      // ~8 x |customers| here crosses that at sf1+. The walk is already
      // depth-bounded (step < 8), so the row count is a known linear
      // bound, not a runaway risk; raise the valve — in a CHILD session
      // (round-5 verdict: no query closure may mutate shared conf). The
      // frame is lazy, so the raised limit must hold at execution time:
      // a child session's SessionState lives as long as the returned
      // DataFrame references it, while the caller's session conf — and
      // catalog: rec1_nxt below registers in the child, invisible to
      // other queries — is untouched.
      val cs = s.newSession()
      cs.conf.set("spark.sql.cteRecursionRowLimit", "100000000")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(cs, dir, "orders")
        .select(
          col("o_custkey").as("customer_id"), col("o_orderkey").as("order_id"),
          lead("o_orderkey", 1).over(w).as("next_id"),
          row_number().over(w).as("rn"))
        .localCheckpoint()
        .createOrReplaceTempView("rec1_nxt")
      cs.sql("""
        WITH RECURSIVE chain(customer_id, order_id, step) AS (
          SELECT customer_id, order_id, CAST(1 AS BIGINT) FROM rec1_nxt WHERE rn = 1
          UNION ALL
          SELECT /*+ BROADCAST(n) */ c.customer_id, n.next_id, c.step + 1L
          FROM chain c JOIN rec1_nxt n ON c.order_id = n.order_id
          WHERE n.next_id IS NOT NULL AND c.step < 8
        )
        SELECT customer_id, order_id, step FROM chain
      """)
    }),

    "vr1_variant_extract" -> ((s, dir) => {
      // semi-structured VARIANT surface (new in Spark 4): build a nested
      // JSON document per event, parse to VARIANT once, extract typed
      // fields by path — schema-on-read for heterogeneous event payloads.
      // At 100 TB the win is scan-time: VARIANT stores the parsed binary
      // form (shredded in parquet), so path extraction never re-parses
      // text per query the way get_json_object does (e3 is the
      // string-parsing baseline). The real `props` payload is parsed
      // alongside a document constructed from typed columns; the oracle
      // re-derives every output from the source columns directly —
      // extraction of what was inserted must be identity
      t(s, dir, "events").createOrReplaceTempView("events_vr")
      s.sql("""
        SELECT event_id,
               variant_get(v, '$.type', 'string')    AS vtype,
               variant_get(v, '$.value', 'double')   AS vvalue,
               variant_get(v, '$.tags[1]', 'string') AS tag2,
               variant_get(parse_json(props), '$.k', 'long') AS k_val
        FROM (SELECT *, parse_json(to_json(named_struct(
                'type', event_type, 'value', value,
                'tags', array(event_type, CAST(user_id AS STRING))))) AS v
              FROM events_vr)
      """)
    }),

    "w6_window_breadth" -> ((s, dir) => {
      // distribution-window family: ntile / percent_rank / cume_dist /
      // first_value, all over one total-ordered frame (ties broken by key
      // so every engine ranks identically); percent_rank and cume_dist
      // are exactly-rounded integer divisions — bit-identical cross-engine
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("int").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first(col("o_orderkey")).over(w).as("top_order"))
    }),

    "sj1_semi_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    "agg1_stats" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        countDistinct("l_partkey").as("n_parts"))),

    "agg2_rollup" -> ((s, dir) =>
      // grouping-sets family (absent from the reference, §2.7): subtotal +
      // grand-total rows with NULL group keys, same as SQL ROLLUP
      t(s, dir, "lineitem").rollup("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"))),

    "agg7_cube" -> ((s, dir) =>
      // full grouping-sets lattice (rollup's sibling): all four
      // combinations of (returnflag, linestatus) subtotals
      t(s, dir, "lineitem").cube("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("sum_price"))),

    "agg4_percentiles" -> ((s, dir) =>
      // exact interpolated quartiles (Spark `percentile` ≡ quantile_cont),
      // computed on integer CENTS at dyadic fractions: every intermediate
      // (position, frac·(b−a), a+…) is exact in double, so the result is
      // bit-identical across engines regardless of their interpolation
      // formula arrangement — no rounding step needed or wanted. (p95 on
      // raw doubles straddled a cent boundary at sf0.001.)
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(expr("percentile(cast(round(l_extendedprice * 100) as bigint), array(0.25, 0.5, 0.75))")
          .as("q")) // one sort-based aggregate pass for all three quartiles
        .select(col("l_returnflag"),
          element_at(col("q"), 1).as("p25_cents"),
          element_at(col("q"), 2).as("p50_cents"),
          element_at(col("q"), 3).as("p75_cents"))),

    "agg8_approx_percentiles" -> ((s, dir) => // no oracle: the GK sketch is
      // engine-specific; spec pins relative error vs the exact quartiles.
      // agg4's exact `percentile` sorts EVERY group value — the right
      // correctness anchor, but a per-group sort of the corpus at 100 TB.
      // approx_percentile aggregates in bounded memory with map-side
      // partial merge (shuffle carries sketches, not values); carrying
      // both columns keeps the sketch's accuracy continuously visible
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        expr("approx_percentile(cast(round(l_extendedprice * 100) as bigint), array(0.25, 0.5, 0.75), 10000)")
          .as("qa"),
        expr("percentile(cast(round(l_extendedprice * 100) as bigint), array(0.25, 0.5, 0.75))")
          .as("qe"))
        .select(col("l_returnflag"),
          element_at(col("qa"), 1).cast("double").as("approx_p25_cents"),
          element_at(col("qa"), 2).cast("double").as("approx_p50_cents"),
          element_at(col("qa"), 3).cast("double").as("approx_p75_cents"),
          element_at(col("qe"), 1).as("exact_p25_cents"),
          element_at(col("qe"), 2).as("exact_p50_cents"),
          element_at(col("qe"), 3).as("exact_p75_cents"))),

    "nst1_nested_types" -> ((s, dir) =>
      // map/struct column functions under the oracle: build typed nested
      // columns, then extract scalars back out — struct field access,
      // element_at / try_element_at, map_keys / map_values. The OUTPUT is
      // flat (nested output columns compare differently per engine in the
      // driver's pandas canonicalization); the nested construction and
      // access in the middle is what's hash-checked. try_element_at (not
      // element_at) for the absent key: ANSI mode makes plain element_at
      // throw on missing map keys.
      t(s, dir, "orders").select(
        struct(col("o_orderkey").as("key"), col("o_totalprice").as("price")).as("os"),
        map(lit("full"), col("o_totalprice").cast("decimal(16,2)"),
            lit("double"), (col("o_totalprice") * 2).cast("decimal(16,2)")).as("om"))
      .select(
        // extracted money lands as double (the dsum convention: decimal
        // column dtypes canonicalize differently across the two engines'
        // parquet/pandas paths)
        col("os.key").as("o_orderkey"),
        col("os").getField("price").cast("double").as("struct_price"),
        element_at(col("om"), "full").cast("double").as("map_full"),
        expr("try_element_at(om, 'missing')").cast("double").as("map_missing"),
        array_join(map_keys(col("om")), ",").as("keys_csv"),
        size(map_values(col("om"))).cast("long").as("n_vals"))),

    "sk1_salted_join" -> ((s, dir) => {
      // two-sided salted join (hot-key mitigation) under the oracle: the
      // plain inner-join SQL must hash-match, proving salting is a pure
      // physical rewrite
      val fact = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_linenumber"), col("l_extendedprice"))
      val dim = t(s, dir, "orders").select(col("o_orderkey").as("okey"), col("o_custkey"))
      graft.ops.SkewOps.saltedJoin(fact, dim, "okey", col("l_linenumber"), factor = 8)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("total_price"))
    }),

    "u1_union" -> ((s, dir) => {
      // UNION (distinct) of two branch projections — union is the one set
      // op set1/set2 didn't cover
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .union(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
        .distinct()
    }),

    "x1_wordcount" -> ((s, dir) =>
      // the canonical explode shape: flatten documents to tokens, count
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n_occurrences"))),

    "hh1_heavy_hitters" -> ((s, dir) => { // no oracle: below-threshold sketch
      // contents are merge-order-dependent; the hh2 gate carries the
      // deterministic guarantee. Misra-Gries frequent-items summary over
      // the token stream: k counters per map task instead of one row per
      // DISTINCT token — the exchange is O(k · tasks) however large the
      // token domain grows (x1's exact wordcount is the small-vocabulary
      // baseline this replaces at 100 TB n-gram/URL scale). k = 32 so the
      // near-uniform 31-token test vocabulary has a non-empty guaranteed
      // set; the eviction path is exercised on a constructed skewed
      // stream in NativeExpressionsSpec
      graft.functions.NativeExpressions.register(s)
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .agg(expr("graft_freq_sketch(token, 32)").as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item").as("token"), col("e.count").as("est_count"))
    }),

    "hh3_cms_replay" -> ((s, dir) => {
      // the Count-Min sketch an oracle CAN check (agg9's contract
      // applied to frequencies — hh1's Misra-Gries stays rows-only by
      // design): md5-row-seeded counters are deterministic integers,
      // so the sketch AND every point estimate replay in DuckDB. The
      // exchange carries ≤ d·w = 1024 counter rows whatever the corpus;
      // the exact counts ride along — est ≥ exact by construction, over
      // by whatever the (4, 256) collision bound prices.
      val li = t(s, dir, "lineitem")
      val sk = graft.ops.SketchOps.cmsSketch(li, Nil, "l_partkey")
      val probes = li.select(col("l_partkey")).distinct()
        .orderBy("l_partkey").limit(10)
      val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("exact_cnt"))
      graft.ops.SketchOps.cmsEstimate(sk, probes, "l_partkey")
        .join(exact, Seq("l_partkey"))
        .select(col("l_partkey").as("part_id"), col("est").as("est_cnt"),
          col("exact_cnt"))
    }),

    "hh2_freq_gate" -> ((s, dir) => {
      // the deterministic MG guarantee under the oracle: every token with
      // exact count > n/(k+1) MUST be in the sketch (k = 32, see hh1) (Misra-Gries bound,
      // preserved under arbitrary merge trees per Agarwal et al. PODS'12)
      // — so n_found = n_guaranteed and recall = 1.0 are THEOREMS, not
      // measured goldens, and the oracle re-derives both exactly
      // Gate cost is token-DOMAIN-size independent (round-5 verdict): the
      // exact-truth arm runs only over a deterministic md5-nibble sample
      // of the token domain (first hex digit 0-7 = 50%, replayed
      // bit-identically by the oracle — md5 is the same function in both
      // engines), so its exchange carries sample_rate × |domain| rows,
      // never one row per distinct token. The MG theorem quantifies over
      // EVERY above-threshold token, hence over any deterministic subset:
      // recall = 1.0 on the sampled guaranteed set is still a theorem.
      // n_tokens stays the FULL stream length (a map-side scalar count,
      // no per-token shuffle) — the threshold n/(k+1) must be the true
      // one or "guaranteed" would be a different predicate. At production
      // scale choose the nibble set so sampled distinct tokens stay
      // ~bounded (same knob as cn2's vec_id sample).
      graft.functions.NativeExpressions.register(s)
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
      val sketch = toks
        .agg(expr("graft_freq_sketch(token, 32)").as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item").as("token"))
      val total = toks.agg(count(lit(1)).cast("long").as("n_tokens"))
      val exact = toks
        .filter(substring(md5(col("token")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"))
        .groupBy("token").agg(count(lit(1)).as("c"))
      val guaranteed = exact.crossJoin(total)
        .filter(col("c") > col("n_tokens").cast("double") / lit(33.0))
        .select("token")
      val nG = guaranteed.agg(count(lit(1)).cast("long").as("n_guaranteed"))
      val nF = guaranteed.join(sketch, Seq("token"), "left_semi")
        .agg(count(lit(1)).cast("long").as("n_found"))
      total.crossJoin(nG).crossJoin(nF).select(
        col("n_tokens"), col("n_guaranteed"), col("n_found"),
        // degenerate-sample guard: if the md5-nibble sample excludes every
        // guaranteed token (n_guaranteed = 0), 0/0 would yield NaN while
        // the oracle emits the constant 1.0 — a confusing gate mismatch
        // instead of a clear signal. Recall over an empty set is vacuously
        // 1.0 (the MG theorem quantifies over every sampled guaranteed
        // token; zero of them means zero misses). If this fires, widen the
        // nibble set above.
        when(col("n_guaranteed") === 0, lit(1.0))
          .otherwise(round(col("n_found").cast("double") / col("n_guaranteed"), 4))
          .as("recall"))
    }),

    "dt1_date_parts" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        // cast back to timestamp: parquet DATE and DuckDB DATE reach the
        // driver's pandas compare as different dtypes for equal values
        date_add(col("o_orderdate").cast("date"), 30).cast("timestamp").as("plus30"),
        last_day(col("o_orderdate").cast("date")).cast("timestamp").as("month_end"))),

    "agg5_moments" -> ((s, dir) => {
      // sample variance / stddev / correlation computed from EXACT integer
      // sums (cents), with the final arithmetic done in double by the
      // identical formula on both engines — reproducible where native
      // stddev/corr (order-dependent fp accumulation) is not
      val qc = round(col("l_quantity") * 100).cast("long")
      val pc = round(col("l_extendedprice") * 100).cast("long")
      val d = (c: Column) => c.cast("double")
      // accumulate in DECIMAL(38,0): sum(pc*pc) reaches 7.4e18 per group
      // at sf0.1 — 80% of Long range — and would wrap silently at barely
      // larger scale (DuckDB's bigint sums widen to HUGEINT natively);
      // per-row products still fit a long comfortably
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(qc.cast(dec)).as("sq"), sum((qc * qc).cast(dec)).as("sqq"),
          sum(pc.cast(dec)).as("sp"), sum((pc * pc).cast(dec)).as("spp"),
          sum((qc * pc).cast(dec)).as("sqp"))
        .select(
          col("l_returnflag"), col("n"),
          ((d(col("sqq")) - d(col("sq")) * d(col("sq")) / d(col("n"))) / (d(col("n")) - 1.0))
            .as("var_qty_cents2"),
          sqrt((d(col("sqq")) - d(col("sq")) * d(col("sq")) / d(col("n"))) / (d(col("n")) - 1.0))
            .as("stddev_qty_cents"),
          ((d(col("n")) * d(col("sqp")) - d(col("sq")) * d(col("sp"))) /
            (sqrt(d(col("n")) * d(col("sqq")) - d(col("sq")) * d(col("sq"))) *
              sqrt(d(col("n")) * d(col("spp")) - d(col("sp")) * d(col("sp")))))
            .as("corr_qty_price"))
    }),

    "agg6_argmax_udaf" -> ((s, dir) => {
      // typed Aggregator as an untyped UDAF: per detected language, the
      // longest document (argmax tokens, min doc_id tie-break)
      val longest = udaf(graft.functions.Aggregators.longestDoc)
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.languageId(col("text")).as("lang_guess"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .groupBy("lang_guess")
        .agg(longest(col("doc_id"), col("n_tokens")).as("top"))
        .select(col("lang_guess"), col("top._2").as("doc_id"), col("top._1").as("n_tokens"))
    }),

    "agg9_hll_replay" -> ((s, dir) => {
      // the HyperLogLog an oracle CAN check (agg3 pins Spark's built-in
      // by error bound only — its sketch is engine-specific): md5-nibble
      // hash, integer register maxes, rational-constant estimate — the
      // registers AND the estimate replay exactly in DuckDB. The
      // exchange carries ≤64 register rows per flag however large the
      // corpus; exact countDistinct rides along as the honest face.
      val li = t(s, dir, "lineitem")
      graft.ops.SketchOps.hllCountDistinct(li, Seq("l_returnflag"), "l_partkey")
        .join(li.groupBy("l_returnflag")
          .agg(countDistinct("l_partkey").as("exact_parts")), Seq("l_returnflag"))
    }),

    "agg3_approx_distinct" -> ((s, dir) => // no oracle: HLL sketch is
      // engine-specific; spec pins relative error vs exact count
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        approx_count_distinct("l_partkey").as("approx_parts"),
        countDistinct("l_partkey").as("exact_parts"))),

    "agg11_bottomk_quantiles" -> ((s, dir) =>
      // the DETERMINISTIC quantile sketch, completing the family gate
      // (agg8's approx_percentile is engine-specific, rows-only):
      // bottom-k Knuth-hash sampling — a true mergeable sketch,
      // bottomK(A∪B) = bottomK(bottomK(A)∪bottomK(B)), computed by the
      // bounded graft_topk heap so each task ships ≤k (hash, id) pairs
      // per group — then exact rank quantiles OF THE SAMPLE under the
      // total order (value, id). Every output replays bit-exactly in
      // DuckDB from the raw rows; error is the standard O(1/√k)
      graft.ops.SketchOps.bottomKQuantiles(
        t(s, dir, "orders"), Seq("o_orderstatus"), "o_orderkey",
        "o_totalprice", k = 128, qs = Seq(0.25, 0.5, 0.75, 0.95))),

    "aj1_asof_join" -> ((s, dir) => {
      // most recent order per user at each event time; right side deduped
      // to unique (key, time) so the as-of match is deterministic
      val lastOrders = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate").as("last_order_date"))
        .agg(max("o_orderkey").as("last_order_key"))
      graft.ops.TemporalOps.asOfJoin(
        t(s, dir, "events").select("event_id", "user_id", "ts"),
        leftKey = "user_id", leftTime = "ts",
        lastOrders, rightKey = "o_custkey", rightTime = "last_order_date",
        rightCols = Seq("last_order_date", "last_order_key"))
    }),

    "aj2_asof_native" -> ((s, dir) => {
      // the SAME as-of semantics through the custom physical operator
      // (graft.plans.AsOfJoinExec — LogicalPlan + Strategy + SparkPlan),
      // answering to the same DuckDB ASOF oracle as the aj1 composition
      val lastOrders = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate").as("last_order_date"))
        .agg(max("o_orderkey").as("last_order_key"))
      graft.ops.TemporalOps.asOfJoinNative(
        t(s, dir, "events").select("event_id", "user_id", "ts"),
        leftKey = "user_id", leftTime = "ts",
        lastOrders, rightKey = "o_custkey", rightTime = "last_order_date",
        rightCols = Seq("last_order_date", "last_order_key"))
    }),

    "rj1_range_join" -> ((s, dir) =>
      graft.ops.TemporalOps.rangeSelfJoin(
        t(s, dir, "events"), "user_id", "ts", "event_id", windowSeconds = 300L)),

    // ---- event-time ops ----,

    "w7_latest_per_key" -> ((s, dir) =>
      // CDC-compact / dedupe-to-current-state: the latest event per
      // user via ONE max(struct) hash aggregate — (ts, event_id) is a
      // total order, so no window sort and a deterministic winner; the
      // oracle answers with the row_number() formulation
      EventOps.latestPerKey(t(s, dir, "events"),
        keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
        payloadCols = Seq("event_type", "value"))),

    "agg9_conditional_bool" -> ((s, dir) =>
      // conditional + boolean aggregate breadth: count_if / every / any
      // (DuckDB: FILTER clause, bool_and, bool_or)
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count_if(col("l_quantity") > 25).cast("long").as("n_high_qty"),
        every(col("l_extendedprice") > 0).as("all_price_positive"),
        org.apache.spark.sql.functions.any(col("l_discount") === 0).as("any_zero_discount"),
        count_if(col("l_tax") > 0.05).cast("long").as("n_high_tax")))
  )

  def oracleSql: Map[String, String] = Map(
    "w1_window_topk" ->
      ("""SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
         |  FROM orders
         |) WHERE rnk <= 3""").stripMargin,

    "w5_range_frame" -> // decimal-accumulated: the frame SUM is value-defined,
      // but summation order inside a frame still differs across engines
      ("""SELECT o_custkey, o_orderkey,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS trailing_30d_spend,
         |  CAST(count(*) OVER w AS BIGINT) AS trailing_30d_orders
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""").stripMargin,

    "w4_topk_agg" -> // the heap aggregate answers to w1's window SQL
      ("""SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
         |  FROM orders
         |) WHERE rnk <= 3""").stripMargin,

    "w2_order_limit" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"),

    "w3_window_funcs" ->
      ("""SELECT o_custkey, o_orderkey, o_totalprice,
         |  CAST(rank() OVER w AS INTEGER) AS order_rank,
         |  lag(o_totalprice, 1) OVER w AS prev_price,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""").stripMargin,

    "set1_except" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),

    "set2_intersect" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'P' " +
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),

    "d1_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "o1_null_ordering" ->
      ("""SELECT c_custkey, CAST(n_orders AS BIGINT) AS n_orders FROM (
         |  SELECT c.c_custkey, o.n_orders
         |  FROM customer c LEFT JOIN (
         |    SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
         |  ) o ON c.c_custkey = o.o_custkey
         |)
         |ORDER BY n_orders DESC NULLS FIRST, c_custkey ASC LIMIT 25""").stripMargin,

    "set3_except_all" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),

    "set4_intersect_all" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),

    "x2_string_agg" ->
      ("SELECT o_custkey, string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_ids, " +
        "CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey"),

    "rec1_recursive_cte" -> // deliberately NON-recursive truth: the
      // window formulation must agree with Spark's recursive walk —
      // two independent formulations, not a mirrored recursion; the
      // rn <= 8 filter mirrors the walk's 8-hop bound
      ("""SELECT customer_id, order_id, step FROM (
         |  SELECT o_custkey AS customer_id, o_orderkey AS order_id,
         |    CAST(row_number() OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS step
         |  FROM orders) WHERE step <= 8""").stripMargin,

    "vr1_variant_extract" -> // extraction of what was inserted is
      // identity on the source columns; props mirrors e3's ->> path
      ("""SELECT event_id, event_type AS vtype, value AS vvalue,
         |  CAST(user_id AS VARCHAR) AS tag2,
         |  CAST(props->>'k' AS BIGINT) AS k_val FROM events""").stripMargin,

    "w6_window_breadth" ->
      ("""SELECT o_custkey, o_orderkey,
         |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
         |  percent_rank() OVER w AS pct_rank,
         |  cume_dist() OVER w AS cume,
         |  first_value(o_orderkey) OVER w AS top_order
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)""").stripMargin,

    "sj1_semi_join" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')"),

    "agg1_stats" ->
      (s"SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty, " +
        s"${dsumSql("l_extendedprice")} / count(*) AS avg_price, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts " +
        "FROM lineitem GROUP BY l_returnflag"),

    "agg4_percentiles" ->
      ("SELECT l_returnflag, " +
        "quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) AS p25_cents, " +
        "quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS p50_cents, " +
        "quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) AS p75_cents " +
        "FROM lineitem GROUP BY l_returnflag"),

    "nst1_nested_types" -> // same nested build + scalar extraction; DuckDB
      // map extraction yields a one-element list, hence the [1]
      ("""WITH nested AS (
         |  SELECT {'key': o_orderkey, 'price': o_totalprice} AS os,
         |         map(['full', 'double'],
         |             [CAST(o_totalprice AS DECIMAL(16,2)), CAST(o_totalprice * 2 AS DECIMAL(16,2))]) AS om
         |  FROM orders
         |)
         |SELECT os.key AS o_orderkey, CAST(os.price AS DOUBLE) AS struct_price,
         |       CAST(om['full'][1] AS DOUBLE) AS map_full,
         |       CAST(om['missing'][1] AS DOUBLE) AS map_missing,
         |       array_to_string(map_keys(om), ',') AS keys_csv,
         |       CAST(len(map_values(om)) AS BIGINT) AS n_vals
         |FROM nested""").stripMargin,

    "sk1_salted_join" -> // salting is invisible in the result
      (s"SELECT o.o_custkey, CAST(count(*) AS BIGINT) AS n_items, " +
        s"${dsumSql("l.l_extendedprice")} AS total_price " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY o.o_custkey"),

    "u1_union" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'"),

    "x3_array_set_agg" ->
      ("SELECT o_custkey, array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses, " +
        "CAST(len(list_distinct(list(o_orderpriority))) AS BIGINT) AS n_priorities " +
        "FROM orders GROUP BY o_custkey"),

    "hof1_array_funcs" -> // list_position is NULL-on-absent in DuckDB
      // vs 0 in Spark — coalesce states the shared convention
      ("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
         |  array_to_string(toks[1:3], ' ') AS first3,
         |  list_contains(toks, 'the') AS has_the,
         |  CAST(list_max(list_transform(toks, x -> length(x))) AS BIGINT) AS max_tok_len,
         |  CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS pos_the
         |FROM t""").stripMargin,

    "dt2_timestamp_funcs" -> // isodow mirrors weekday()+1 (Monday=1);
      // epoch // 1e6 mirrors the floor'd integer division
      ("""SELECT event_id, epoch_us(ts) AS epoch_us,
         |  date_trunc('day', ts) AS day_start, date_trunc('hour', ts) AS hour_start,
         |  CAST(to_timestamp(epoch_us(ts) // 1000000) AS TIMESTAMP) AS ts_seconds,
         |  CAST(hour(ts) AS BIGINT) AS h, CAST(minute(ts) AS BIGINT) AS m,
         |  CAST(isodow(ts) AS BIGINT) AS iso_dow
         |FROM events""").stripMargin,

    "x1_wordcount" ->
      ("SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) GROUP BY token"),

    "hh3_cms_replay" -> { // row-seeded md5 buckets, counter sums, min
      // over rows — the whole sketch replayed cell for cell
      def bucket(input: String): String =
        s"""((strpos('0123456789abcdef', substring(md5($input), 1, 1)) - 1) * 16
           | + (strpos('0123456789abcdef', substring(md5($input), 2, 1)) - 1))""".stripMargin
      val rowVal = bucket("CAST(r.r AS VARCHAR) || ':' || CAST(l.l_partkey AS VARCHAR)")
      val rowProbe = bucket("CAST(r.r AS VARCHAR) || ':' || CAST(p.l_partkey AS VARCHAR)")
      s"""WITH rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
         |cells AS (
         |  SELECT r.r, $rowVal AS bucket
         |  FROM lineitem l CROSS JOIN rows_ r WHERE l.l_partkey IS NOT NULL
         |), sk AS MATERIALIZED (
         |  SELECT r, bucket, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY 1, 2
         |), probes AS (
         |  SELECT DISTINCT l_partkey FROM lineitem ORDER BY 1 LIMIT 10
         |), pcells AS (
         |  SELECT p.l_partkey, r.r, $rowProbe AS bucket
         |  FROM probes p CROSS JOIN rows_ r
         |), est AS (
         |  SELECT pc.l_partkey, min(coalesce(sk.c, CAST(0 AS BIGINT))) AS est
         |  FROM pcells pc LEFT JOIN sk ON sk.r = pc.r AND sk.bucket = pc.bucket
         |  GROUP BY 1
         |), ex AS (
         |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_cnt
         |  FROM lineitem GROUP BY 1
         |)
         |SELECT e.l_partkey AS part_id, e.est AS est_cnt, ex.exact_cnt
         |FROM est e JOIN ex ON e.l_partkey = ex.l_partkey""".stripMargin
    },

    "hh2_freq_gate" -> // the MG guarantee is a theorem: n_found equals
      // n_guaranteed and recall is exactly 1.0, both re-derived from the
      // exact token counts (k = 32, threshold n/(k+1) = n/33). The exact
      // arm replays the Spark side's deterministic md5-nibble 50% domain
      // sample; n_tokens is the full stream count (the true threshold)
      ("""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
         |), tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM toks
         |), ex AS (
         |  SELECT token, count(*) AS c FROM toks
         |  WHERE substring(md5(token), 1, 1) IN ('0','1','2','3','4','5','6','7')
         |  GROUP BY 1
         |), g AS (
         |  SELECT count(*) AS ng FROM ex, tot WHERE c > CAST(n_tokens AS DOUBLE) / 33.0
         |)
         |SELECT tot.n_tokens, CAST(g.ng AS BIGINT) AS n_guaranteed,
         |       CAST(g.ng AS BIGINT) AS n_found,
         |       CAST(1.0 AS DOUBLE) AS recall
         |FROM tot, g""").stripMargin,

    "dt1_date_parts" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year, " +
        "CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter, " +
        "CAST(month(o_orderdate) AS INTEGER) AS o_month, " +
        "CAST(day(o_orderdate) AS INTEGER) AS o_day, " +
        "CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30, " +
        "CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end FROM orders"),

    "agg5_moments" -> // identical double formula over exact integer sums
      ("""WITH s AS (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |    sum(qc) AS sq, sum(qc * qc) AS sqq,
         |    sum(pc) AS sp, sum(pc * pc) AS spp,
         |    sum(qc * pc) AS sqp
         |  FROM (SELECT l_returnflag,
         |          CAST(round(l_quantity * 100) AS BIGINT) AS qc,
         |          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
         |        FROM lineitem)
         |  GROUP BY l_returnflag
         |)
         |SELECT l_returnflag, n,
         |  (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var_qty_cents2,
         |  sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS stddev_qty_cents,
         |  (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)) /
         |    (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
         |     sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))) AS corr_qty_price
         |FROM s""").stripMargin,

    "agg6_argmax_udaf" -> // same langid/token features as txt3/txt1, argmax per language
      ("""WITH feats AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'and', 'of', 'to', 'a', 'in', 'is'))) AS en_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('der', 'die', 'und', 'das', 'ist', 'ein'))) AS de_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('el', 'la', 'de', 'que', 'y', 'es'))) AS es_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('le', 'la', 'et', 'les', 'des', 'est'))) AS fr_h
         |  FROM documents
         |), langed AS (
         |  SELECT doc_id, n_tokens,
         |    CASE WHEN greatest(en_h, de_h, es_h, fr_h) = 0 THEN 'und'
         |         WHEN en_h = greatest(en_h, de_h, es_h, fr_h) THEN 'en'
         |         WHEN de_h = greatest(en_h, de_h, es_h, fr_h) THEN 'de'
         |         WHEN es_h = greatest(en_h, de_h, es_h, fr_h) THEN 'es'
         |         ELSE 'fr' END AS lang_guess
         |  FROM feats
         |), ranked AS (
         |  SELECT lang_guess, doc_id, n_tokens,
         |    row_number() OVER (PARTITION BY lang_guess ORDER BY n_tokens DESC, doc_id ASC) AS rn
         |  FROM langed
         |)
         |SELECT lang_guess, doc_id, n_tokens FROM ranked WHERE rn = 1""").stripMargin,

    "agg2_rollup" ->
      (s"SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows, " +
        s"${dsumSql("l_quantity")} AS sum_qty " +
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"),

    "agg7_cube" ->
      (s"SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows, " +
        s"${dsumSql("l_extendedprice")} AS sum_price " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"),

    "aj1_asof_join" ->
      ("""WITH last_orders AS (
         |  SELECT o_custkey, o_orderdate AS last_order_date, CAST(max(o_orderkey) AS BIGINT) AS last_order_key
         |  FROM orders GROUP BY o_custkey, o_orderdate
         |)
         |SELECT e.event_id, e.user_id, e.ts, r.last_order_date, r.last_order_key
         |FROM events e ASOF LEFT JOIN last_orders r
         |  ON e.user_id = r.o_custkey AND e.ts >= r.last_order_date""").stripMargin,

    "aj2_asof_native" -> // the custom SparkPlan answers to the same ASOF oracle
      ("""WITH last_orders AS (
         |  SELECT o_custkey, o_orderdate AS last_order_date, CAST(max(o_orderkey) AS BIGINT) AS last_order_key
         |  FROM orders GROUP BY o_custkey, o_orderdate
         |)
         |SELECT e.event_id, e.user_id, e.ts, r.last_order_date, r.last_order_key
         |FROM events e ASOF LEFT JOIN last_orders r
         |  ON e.user_id = r.o_custkey AND e.ts >= r.last_order_date""").stripMargin,

    "rj1_range_join" ->
      ("SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b, a.ts AS t_a, b.ts AS t_b " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND epoch_us(b.ts) > epoch_us(a.ts) AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000"),

    "agg11_bottomk_quantiles" -> // the bottom-k sample and its rank
      // quantiles re-derived from the raw rows: same Knuth hash, same
      // (hash, id) selection order, same (value, id) rank order, same
      // ceil(q·n) rank — bit-exact replay of the whole sketch
      ("""WITH h AS (
         |  SELECT o_orderstatus, o_orderkey AS id, CAST(o_totalprice AS DOUBLE) AS v,
         |         ((o_orderkey % 2147483648) * 2654435761) % 4294967296 AS hh
         |  FROM orders
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderstatus ORDER BY hh, id) AS rk FROM h
         |), s AS (
         |  SELECT o_orderstatus, v, id FROM r WHERE rk <= 128
         |), o AS (
         |  SELECT o_orderstatus, v,
         |         row_number() OVER (PARTITION BY o_orderstatus ORDER BY v, id) AS vr,
         |         count(*) OVER (PARTITION BY o_orderstatus) AS n
         |  FROM s
         |)
         |SELECT o_orderstatus,
         |       CAST(max(n) AS BIGINT) AS sample_n,
         |       max(CASE WHEN vr = CAST(ceil(CAST(0.25 AS DOUBLE) * n) AS BIGINT) THEN v END) AS p25,
         |       max(CASE WHEN vr = CAST(ceil(CAST(0.50 AS DOUBLE) * n) AS BIGINT) THEN v END) AS p50,
         |       max(CASE WHEN vr = CAST(ceil(CAST(0.75 AS DOUBLE) * n) AS BIGINT) THEN v END) AS p75,
         |       max(CASE WHEN vr = CAST(ceil(CAST(0.95 AS DOUBLE) * n) AS BIGINT) THEN v END) AS p95
         |FROM o GROUP BY o_orderstatus""").stripMargin,

    "agg9_hll_replay" ->
      s"""WITH b AS (
         |  SELECT l_returnflag AS flag,
         |         ((strpos('0123456789abcdef', substring(md5(CAST(l_partkey AS VARCHAR)),1,1)) - 1) * 16
         |          + (strpos('0123456789abcdef', substring(md5(CAST(l_partkey AS VARCHAR)),2,1)) - 1)) % 64 AS bucket,
         |         substring(md5(CAST(l_partkey AS VARCHAR)), 3, 13) AS t
         |  FROM lineitem WHERE l_partkey IS NOT NULL
         |), z0 AS (
         |  SELECT flag, bucket, t, length(regexp_extract(t, '^0*', 0)) AS z FROM b
         |), rho AS (
         |  SELECT flag, bucket,
         |         CASE WHEN z = 13 THEN CAST(53 AS BIGINT)
         |              ELSE CAST(z * 4 + 1 + CASE substring(t, z + 1, 1)
         |                WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
         |                WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
         |                WHEN '7' THEN 1 ELSE 0 END AS BIGINT) END AS rho
         |  FROM z0
         |), regs AS (
         |  SELECT flag, bucket, max(rho) AS r FROM rho GROUP BY 1, 2
         |), agg AS (
         |  SELECT flag, count(*) AS nb,
         |         sum(CAST(1 AS BIGINT) << CAST(53 - r AS INT)) AS sp
         |  FROM regs GROUP BY 1
         |), ex AS (
         |  SELECT l_returnflag AS flag,
         |         CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
         |  FROM lineitem GROUP BY 1
         |)
         |SELECT a.flag AS l_returnflag,
         |       CAST(64 - a.nb AS BIGINT) AS n_zero_registers,
         |       CAST(CASE WHEN a.nb < 64
         |         THEN CAST(64 * CAST(round(ln(64.0 / (64 - a.nb)) * 1000000) AS BIGINT) AS HUGEINT)
         |         ELSE CAST('${graft.ops.SketchOps.RawNumerator}' AS HUGEINT) // CAST(a.sp AS HUGEINT)
         |       END AS BIGINT) AS est_micro,
         |       ex.exact_parts
         |FROM agg a JOIN ex ON a.flag = ex.flag""".stripMargin,

    // gr4: the same co-occurrence CTEs as gr1, then degree-ordered
    // orientation ((deg, id)-smaller endpoint → larger), wedges joined
    // at the shared source with the (db, b) row order, closure on the
    // oriented (y, z) arc — each triangle appears exactly once, corners
    // unnested and counted.,

    "w7_latest_per_key" -> // the window formulation of the max(struct)
      // aggregate: (ts desc, event_id desc) is a total order
      ("""SELECT user_id, ts, event_id, event_type, value FROM (
         |  SELECT user_id, ts, event_id, event_type, value,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events) WHERE rn = 1""").stripMargin,

    "agg9_conditional_bool" ->
      ("""SELECT l_returnflag,
         |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_high_qty,
         |  bool_and(l_extendedprice > 0) AS all_price_positive,
         |  bool_or(l_discount = 0) AS any_zero_discount,
         |  CAST(count(*) FILTER (WHERE l_tax > 0.05) AS BIGINT) AS n_high_tax
         |FROM lineitem GROUP BY l_returnflag""").stripMargin,

    "agg10_grouping_sets" -> // GROUPING() in DuckDB = grouping_id() in
      // Spark: first argument is the most significant bit in both
      (s"""SELECT o_orderstatus, o_orderpriority,
         |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS amount
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())""").stripMargin,

    "ts1_gap_fill" ->
      (s"""WITH agg AS (
         |  SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |         CAST(count(*) AS BIGINT) AS n_events, ${dsumSql("value")} AS amount
         |  FROM events GROUP BY 1, 2
         |), bounds AS (
         |  SELECT min(hour_start) AS lo, max(hour_start) AS hi FROM agg
         |), hours AS (
         |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM bounds
         |), types AS (
         |  SELECT DISTINCT event_type FROM agg
         |)
         |SELECT h.hour_start, t.event_type,
         |       coalesce(a.n_events, 0) AS n_events, coalesce(a.amount, 0.0) AS amount
         |FROM hours h CROSS JOIN types t
         |LEFT JOIN agg a ON a.hour_start = h.hour_start AND a.event_type = t.event_type""").stripMargin,

    "pvt1_dynamic_pivot" -> // CASE with no ELSE: empty cells stay NULL,
      // mirroring pivot's no-input-rows semantics (a6 is the else-0 form)
      (s"""SELECT o_custkey,
         |  ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS "F",
         |  ${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS "O",
         |  ${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS "P"
         |FROM orders GROUP BY o_custkey""").stripMargin,

    "num1_try_arithmetic" -> // error-as-NULL mirrored with guards: CASE
      // for the zero divisor, TRY_CAST for the unparseable string
      ("""SELECT l_orderkey, l_linenumber,
         |  CASE WHEN l_quantity = 25 THEN NULL
         |       ELSE l_extendedprice / (l_quantity - 25) END AS safe_ratio,
         |  TRY_CAST(l_returnflag AS INTEGER) AS flag_num
         |FROM lineitem""").stripMargin
  )
}
