package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._

/** Relational operator library — SURVEY.md §2.C Q01–Q22.
  *
  * Each query is a declarative DataFrame program: Catalyst handles
  * predicate pushdown, column pruning, partial aggregation and join
  * strategy selection. Scale posture (100 TB / 1000 executors):
  *   - dimension tables (region/nation/customer/supplier) are joined
  *     with explicit `broadcast` hints — no shuffle of the fact side;
  *   - fact-fact joins shuffle on their equi-keys and rely on AQE for
  *     skew splitting and partition coalescing;
  *   - aggregates are hash aggregates with map-side partials;
  *   - no `.collect()` inside any operator — everything returns a
  *     distributed plan.
  *
  * Money-sums are rounded to 2dp and averages to 6dp *inside* the
  * query (and identically in the DuckDB oracle SQL, see
  * [[graft.SparkEntry.oracleSql]]) so double summation order cannot
  * flip the driver's canonical 6dp hash.
  *
  * Reference semantics: the demo exercises scan/project/derive/
  * distinct/avg (ascii-hydra `pipeline_example/step_2.py:23-30`); the
  * production workload implies the join/agg/window family
  * (`papers/multi_platform_orchestration/paper.md:150-168`,
  * `src/.../resources/spark.py:37-46`).
  */
object Relational {

  private def money(c: Column): Column = round(c, 2)
  private def ratio(c: Column): Column = round(c, 6)

  /** Exact-decimal money sum: the fixture's money columns carry ≤2
    * decimals, so summing as DECIMAL is exact and rounds identically
    * in Spark and DuckDB — double summation order at ~1e8 scale can
    * otherwise flip the 2dp boundary (observed on single-row groups:
    * 27751.685 → .68 vs .69). Result cast back to double for a stable
    * parquet/pandas dtype. */
  def decSum(c: Column): Column =
    round(sum(c.cast("decimal(18,2)")), 2).cast("double")

  /** sum(extprice·(1−disc)) in exact decimal (product has ≤4dp). */
  def decRevenue: Column =
    round(sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount")).cast("decimal(9,2)")), 2).cast("double")

  /** Q01 scan + projection (reference A2/A7): pushed column pruning. */
  def q01ScanProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** Q02 conjunctive/range/negation predicates, pushed to parquet. */
  def q02Filter(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_shipdate") < lit("1995-01-01").cast("timestamp")
        && col("l_discount").between(0.02, 0.06)
        && col("l_returnflag") =!= "R")
      .agg(count(lit(1)).as("cnt"))

  /** Q03 global aggregate — replica of reference step_2
    * (`step_2.py:25-30`): avg(length(text)) + distinct count. The
    * distinct is taken over the 256-bit content hash so the distinct
    * expansion shuffles 32-byte keys, not document bodies (same
    * count barring sha2 collisions — the c1 dedup assumption). */
  def q03GlobalAgg(s: SparkSession, d: String): DataFrame =
    documents(s, d).agg(
      ratio(avg(length(col("text")))).as("avg_text_length"),
      countDistinct(sha2(col("text"), 256)).as("num_distinct_texts"))

  /** Q04 distinct aggregate (expand + two-phase agg). */
  def q04DistinctAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d).agg(countDistinct(col("o_custkey")).as("n_custkeys"))

  /** Q05 grouped aggregation, TPC-H Q1 shape: map-side partial +
    * final hash aggregate; group cardinality is tiny so the shuffle
    * moves only partial states regardless of fact size. */
  def q05GroupbyAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decRevenue.as("sum_disc_price"),
        ratio(avg(col("l_quantity"))).as("avg_qty"),
        ratio(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q06 equi join with a broadcast dimension: customer is orders/10,
    * broadcast it so the fact side never shuffles. */
  def q06BroadcastJoin(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")

  /** Q07 multi-way star join: all dimensions broadcast; the only
    * shuffle is lineitem⋈orders on orderkey (AQE reorders/coalesces).
    */
  def q07StarJoin(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
      .join(orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d).select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(decRevenue.as("revenue"))
      .orderBy("r_name")

  /** Q08 left semi join (EXISTS): customers with ≥1 order. */
  def q08SemiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_customers_with_orders"))

  /** Q09 left anti join (NOT EXISTS): customers with no high-value
    * orders. The build side is pre-filtered (pushed to the orders
    * scan) so the anti set is non-empty on the fixtures — an
    * every-customer-has-orders corpus made the old "no orders at all"
    * gate pass vacuously on an empty result. */
  def q09AntiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).where(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")

  /** Q10 left outer join + null-skipping count. */
  def q10OuterJoin(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .join(supplier(s, d), col("n_nationkey") === col("s_nationkey"),
        "left_outer")
      .groupBy("n_name")
      .agg(count(col("s_suppkey")).as("n_suppliers"))
      .orderBy("n_name")

  /** Q11 window ranking: top-3 orders per customer; ties broken by
    * orderkey so the result is deterministic. */
  def q11WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Q12 window analytic with an explicit ROWS frame: per-user
    * running sum. event_id is the deterministic tiebreak (fixture ts
    * is globally non-decreasing in event_id, so µs-vs-ns truncation
    * cannot reorder the frame vs the oracle). */
  def q12WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("event_id"),
        money(sum(col("value")).over(w)).as("running_value"))
      .orderBy("user_id", "event_id")
  }

  /** Q13 global top-k → TakeOrderedAndProject (no full sort: each
    * partition keeps k rows, driver merges k·p rows). */
  def q13TopK(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_totalprice")

  /** Q14 set operators over distinct nation keys. */
  def q14SetOps(s: SparkSession, d: String): DataFrame = {
    val cn = customer(s, d).select(col("c_nationkey").as("nk")).distinct()
    val sn = supplier(s, d).select(col("s_nationkey").as("nk")).distinct()
    def counted(df: DataFrame, label: String): DataFrame =
      df.agg(count(lit(1)).as("n_nations"))
        .select(lit(label).as("op"), col("n_nations"))
    counted(cn.union(sn).distinct(), "union")
      .unionAll(counted(cn.intersect(sn), "intersect"))
      .unionAll(counted(cn.except(sn), "except"))
      .orderBy("op")
  }

  /** Q15 ROLLUP with grouping flags over the region→nation→customer
    * hierarchy (dimensions broadcast). */
  def q15Rollup(s: SparkSession, d: String): DataFrame =
    customer(s, d).select("c_custkey", "c_nationkey")
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        grouping(col("r_name")).cast("int").as("g_region"),
        grouping(col("n_name")).cast("int").as("g_nation"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  /** Q16 scalar function battery (string/date/math built-ins, all
    * whole-stage-codegen'd — no UDFs). */
  def q16ScalarBattery(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"),
        upper(col("c_name")).as("name_upper"),
        substring(col("c_name"), 10, 8).as("name_tail"),
        concat(col("c_mktsegment"), lit("_"), col("o_orderpriority"))
          .as("seg_prio"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("seg_trim"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("cust_num"),
        length(col("c_name")).as("name_len"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).as("days_since_95"),
        money(abs(col("o_totalprice") - 100000)).as("abs_delta"),
        round(col("o_totalprice"), 1).as("price_round1"),
        floor(col("o_totalprice") / 1000).as("price_k"),
        ratio(pow(col("o_totalprice") / 100000, 2)).as("price_sq"))
      .orderBy("o_orderkey")

  /** Q17a split → array + size. */
  def q17Tokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .orderBy("doc_id")

  /** Q17b explode word count, deterministic top-20. */
  def q17Wordcount(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(20)

  /** Q17c JSON path extraction from the events.props string column. */
  def q17Json(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  /** Q17d JSON → typed MapType: parse the whole props object into a
    * map column (schema'd parse, vs q17c's path extraction). */
  def q17JsonMap(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)).as("m"))
      .select(col("event_id"),
        element_at(col("m"), "k").as("k"),
        size(map_keys(col("m"))).as("n_keys"))
      .orderBy("event_id")

  /** Q18 — HLL approximate distinct, gated as a TOLERANCE CHECK: the
    * estimate itself has no SQL twin, so the query pairs it with the
    * exact distinct and emits whether the estimate landed within ±5%
    * — which the DuckDB oracle reproduces as (exact, literal true).
    * The gate thus fails iff the sketch drifts out of tolerance,
    * upgrading the old rows-only record to a hash-match. */
  def q18ApproxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      approx_count_distinct(col("l_partkey")).as("approx_partkeys"),
      countDistinct(col("l_partkey")).as("exact_partkeys"))
      .select(col("exact_partkeys"),
        (abs(col("approx_partkeys") - col("exact_partkeys")) <=
          col("exact_partkeys") * 0.05).as("within_5pct"))

  /** Q19 exact dedup count (dropDuplicates on the dedup key — the
    * content hash, so the dedup shuffle moves 32-byte keys like c1,
    * not document bodies). */
  def q19DedupCount(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("_ch", sha2(col("text"), 256))
      .dropDuplicates("_ch")
      .agg(count(lit(1)).as("n_unique_docs"))

  /** Q20 tumbling 1-hour time bucketing (batch analog of the
    * streaming window — see [[graft.streaming.EventsStream]]). */
  def q20TimeBucket(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), money(sum(col("value"))).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start")

  /** Q21 conditional aggregation (pivot-lite). */
  def q21ConditionalAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id")
      .agg(money(sum(when(col("event_type") === "click", col("value"))))
        .as("click_value"))
      .orderBy("user_id")

  /** Q23 pivot: conditional aggregation widened to one column per
    * pivot value (explicit value list → no extra pass to discover
    * values, and a stable schema for the oracle). */
  def q23Pivot(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(round(sum(col("value").cast("decimal(18,2)")), 2).cast("double"))
      .withColumnsRenamed(Map("click" -> "click_value",
        "view" -> "view_value", "purchase" -> "purchase_value"))
      .orderBy("user_id")

  /** Q24 statistics battery: sample stddev/variance, correlation,
    * covariance — identical definitions in Spark and DuckDB. */
  def q24StatsBattery(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        ratio(stddev_samp(col("l_quantity"))).as("sd_qty"),
        ratio(var_samp(col("l_discount"))).as("var_disc"),
        ratio(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
        ratio(covar_samp(col("l_quantity"), col("l_discount"))).as("cov_qty_disc"))
      .orderBy("l_returnflag")

  /** Q25 exact percentiles (continuous interpolation): median + p90
    * per market segment. Since round 16 computed as GROUPED
    * bin-bounded order statistics ([[Sketches.groupedPercentiles]],
    * bit-equal to `percentile()` per group — SketchesSpec pins it):
    * the `percentile(o_totalprice, ...)` spelling planned an
    * ObjectHashAggregate that buffers EVERY price of a segment in one
    * aggregation buffer and merges the maps single-threaded — the
    * guide-§5 whole-column-in-one-buffer shape; at 100 TB each
    * segment's buffer is the segment's column. The rewrite's passes
    * shuffle bin-sized tables plus only the located bins' rows. */
  def q25Percentiles(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .join(broadcast(customer(s, d).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
    Sketches.groupedPercentiles(base, "c_mktsegment", "o_totalprice",
        Seq(0.5, 0.9))
      .groupBy("c_mktsegment")
      .agg(
        ratio(min(when(col("quantile") === 0.5, col("exact"))))
          .as("median_price"),
        ratio(min(when(col("quantile") === 0.9, col("exact"))))
          .as("p90_price"))
      .orderBy("c_mktsegment")
  }

  /** Q26 typed Aggregator surface: weighted average of extended
    * price by quantity via [[graft.functions.TypedAggregators]]. */
  def q26WeightedAvg(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(new graft.functions.TypedAggregators.WeightedAvg)
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(ratio(wavg(col("l_extendedprice"), col("l_quantity")))
        .as("wavg_price"))
      .orderBy("l_returnflag")
  }

  /** Q22 correlated scalar subquery, expressed decorrelated: per-key
    * aggregate joined back to the fact (the plan Catalyst's
    * RewriteCorrelatedScalarSubquery would produce from SQL). */
  def q22CorrSubquery(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val custAvg = o.groupBy(col("o_custkey").as("ca_custkey"))
      .agg(avg(col("o_totalprice")).as("avg_price"))
    o.join(custAvg, col("o_custkey") === col("ca_custkey"))
      .where(col("o_totalprice") > col("avg_price"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Q27 part-dimension join (TPC-H Q14 promo-revenue shape): revenue
    * and promo share by part type, with the part dim broadcast so
    * lineitem reaches its aggregation without a join shuffle. */
  def q27PartJoin(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_type")
      .agg(count(lit(1)).as("n_items"),
        decRevenue.as("revenue"),
        ratio(avg(col("p_retailprice"))).as("avg_retail"))
      .orderBy("p_type")

  /** Q29 CUBE over (returnflag, linestatus): all four grouping
    * combinations with grouping flags — the full grouping-set lattice
    * next to Q15's ROLLUP. Decimal-exact money sums; one partial+final
    * aggregation pass expands the lattice map-side. */
  def q29Cube(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_items"),
        decSum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Q30 range-frame window: per user, the sum of event values within
    * the trailing hour (RANGE frame on event-time seconds — a rows
    * frame can't express time-width). Frame bounds on whole epoch
    * seconds match the oracle's integer range exactly. */
  def q30RangeWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_sec"))
      .rangeBetween(-3600L, 0L)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("value"),
        floor(col("ts").cast("double")).cast("long").as("ts_sec"))
      .select(col("user_id"), col("event_id"),
        money(sum(col("value").cast("decimal(18,2)")).over(w)).cast("double")
          .as("hour_sum"))
      .orderBy("user_id", "event_id")
  }

  /** Q31 mergeable distinct sketches (DataSketches HLL built-ins):
    * per-segment sketches union-merged to a global estimate — the
    * sketch-reduce shape that lets 1000 executors compute global
    * distincts with fixed-size state per group (vs shuffling raw
    * ids). Gated like q18 as a TOLERANCE check: the sketch estimate
    * has no DuckDB twin, so the query pairs the union-merged estimate
    * with the exact global distinct and emits whether it landed
    * within ±5% — the oracle reproduces (segments, exact, true), and
    * the hash gate fails iff sketch accuracy degrades. */
  def q31HllUnion(s: SparkSession, d: String): DataFrame = {
    val perType = events(s, d)
      .groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val est = perType.agg(
      count(lit(1)).as("n_segments"),
      hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .cast("long").as("est"))
    // exact twin as its own hash aggregate (the sketch path never
    // materializes id sets); the 1-row × 1-row zip is the t7 scalar
    // shape — Catalyst folds any constant key back to a cross join,
    // so it's whitelisted as a constant, not a data-dependent loop
    val exact = events(s, d)
      .agg(countDistinct(col("user_id")).as("exact_global_users"))
    est.crossJoin(exact)
      .select(col("n_segments"), col("exact_global_users"),
        (abs(col("est") - col("exact_global_users")) <=
          col("exact_global_users") * 0.05).as("within_5pct"))
  }

  /** Q28 as-of join ([[Joins.asOfJoin]]): each purchase matched to
    * the user's latest click at or before it — DuckDB ASOF JOIN
    * semantics, left-outer. One shuffle per side on user_id. */
  def q28AsOfJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"), col("ts").as("c_ts"))
    graft.ops.Joins.asOfJoin(purchases, clicks, "user_id", "ts", "c_ts",
        Seq("c_id" -> "click_id"), "c_id")
      .select("event_id", "user_id", "click_id")
      .orderBy("event_id")
  }

  /** Q35 — analytic window battery: lag/lead offsets, ntile
    * bucketing, percent_rank, first_value over one per-customer
    * order-date window. One shuffle on the partition key serves every
    * function (a single Window node); the frame default
    * (RANGE UNBOUNDED PRECEDING..CURRENT ROW) matches DuckDB's, and
    * (o_orderdate, o_orderkey) totally orders each partition so
    * offsets are deterministic. */
  def q35WindowBattery(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      ntile(4).over(w).as("quartile"),
      ratio(percent_rank().over(w)).as("pct_rank"),
      first(col("o_totalprice")).over(w).as("first_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q36 — argmax/argmin aggregates: the orderkey of each segment's
    * highest/lowest-priced order via `max_by`/`min_by` (one hash
    * aggregate with map-side partials — the windowless way to answer
    * "which row attains the extreme", no per-group sort). Fixture
    * verified tie-free on (segment, totalprice) at the gated SFs, so
    * the arg is deterministic on both engines (a tie would make
    * max_by/arg_max engine-dependent — production code puts a
    * tie-breaking struct in the ordering value). */
  def q36ArgMinMax(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("max_price_order"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("min_price_order"),
        money(max(col("o_totalprice"))).as("max_price"),
        money(min(col("o_totalprice"))).as("min_price"))
      .orderBy("c_mktsegment")

  /** Q32 — TPC-H Q2 shape: a scalar aggregate subquery in WHERE
    * against a joined min ("the supplier(s) selling each small part
    * at its minimum observed price"). Decorrelated like [[q22CorrSubquery]]:
    * the per-part min is a separate aggregate joined back on
    * (partkey, price) — the plan Catalyst's subquery rewrite produces
    * from the SQL spelling, made explicit. The min aggregates ALL of
    * lineitem (the correlation is on part alone), then the part
    * filter and both dimensions broadcast onto the min-priced rows —
    * at 100 TB the only shuffles are the two lineitem aggregations on
    * l_partkey, and AQE coalesces the tiny post-filter side. */
  def q32MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select("l_partkey", "l_suppkey", "l_extendedprice")
    val minPerPart = li.groupBy(col("l_partkey").as("mp_partkey"))
      .agg(min(col("l_extendedprice")).as("min_price"))
    li.join(minPerPart, col("l_partkey") === col("mp_partkey")
        && col("l_extendedprice") === col("min_price"))
      .join(broadcast(part(s, d).where(col("p_size") <= 5)
          .select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        money(col("min_price")).as("min_price"))
      .distinct()
      .orderBy("p_partkey", "s_name")
  }

  /** Q33 — TPC-H Q20 shape: a nested semi-join chain
    * (supplier ⋉ (qualifying lineitem rollup ⋉ brand parts)
    * ⋉ (nation ⋉ region)). Every inner set is dimension-sized and
    * broadcast as a left-semi probe: the fact table is touched once
    * (filtered by the part semi-join before its aggregation), and no
    * inner query materializes more than its key column. */
  def q33SemiJoinChain(s: SparkSession, d: String): DataFrame = {
    val brandParts = part(s, d)
      .where(col("p_brand") === "Brand#12").select("p_partkey")
    val qualifying = lineitem(s, d)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(brandParts),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey")
      .agg(sum(col("l_quantity")).as("qty"))
      .where(col("qty") > 300)
      .select("l_suppkey")
    val euNations = nation(s, d)
      .join(broadcast(region(s, d).where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"), "left_semi")
      .select("n_nationkey")
    supplier(s, d)
      .join(broadcast(qualifying),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(euNations),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Q34 — [[q07StarJoin]] with ZERO broadcast hints, planned from
    * catalog statistics: the fixtures are registered as ANALYZEd
    * catalog tables ([[graft.core.Tables.registerCatalog]]) and the
    * CBO (`spark.sql.cbo.enabled` + `joinReorder`, on in every graft
    * session) must find the broadcast-star plan itself. This is the
    * un-hinted join planning a reference user gets on a warehouse
    * with stats — CboSpec asserts the dims still broadcast and the
    * result is identical to the hinted q07.
    *
    * Observed CBO topology (sf0.1 plan dump): join reorder flips the
    * written order and builds the dimension BUNDLE first
    * (region⋈nation⋈customer⋈orders, each step broadcast), then
    * streams lineitem through ONE BroadcastHashJoin — the fact table
    * is probed once instead of four times. The bundle broadcast is
    * size-legal from stats at this sf; past the broadcast threshold
    * the same stats flip it to shuffle joins. Stats-driven reorder
    * working as designed, not an artifact. */
  def q34CboStarUnhinted(s: SparkSession, d: String): DataFrame = {
    graft.core.Tables.registerCatalog(s, d)
    def t(n: String): DataFrame = s.table(s"graft_stats.$n")
    t("lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
      .join(t("orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t("customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t("nation").select("n_nationkey", "n_regionkey"),
        col("c_nationkey") === col("n_nationkey"))
      .join(t("region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(decRevenue.as("revenue"))
      .orderBy("r_name")
  }

  /** Q40 — temporal scalar battery: the calendar functions a
    * time-partitioned pipeline leans on (partition-key derivation,
    * month-end close, retention cutoffs, ISO-week rollups). All are
    * codegen'd built-ins inside one projection over the scan — no
    * shuffle, no UDF. Cross-engine notes: Spark `weekday` is
    * 0=Monday (DuckDB `isodow`−1); both `weekofyear`s are ISO weeks;
    * both month-arithmetic functions clamp to month end
    * (Jan 31 + 1 month = Feb 28); epoch seconds agree because every
    * graft session pins UTC ([[graft.core.Sessions]]). Date results
    * are surfaced as midnight TIMESTAMPs: the gate's pandas
    * canonicalizer treats DATE dtypes engine-dependently (DuckDB
    * hands back datetime64, parquet hands back date objects), and
    * the computation under test is the calendar arithmetic, not the
    * storage type. */
  def q40DateBattery(s: SparkSession, d: String): DataFrame = {
    def asTs(c: Column): Column = c.cast("timestamp")
    orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
      .select(
        col("o_orderkey"),
        asTs(col("od")).as("order_date"),
        quarter(col("od")).as("qtr"),
        weekday(col("od")).as("wday"),
        dayofyear(col("od")).as("doy"),
        weekofyear(col("od")).as("iso_week"),
        asTs(last_day(col("od"))).as("month_end"),
        asTs(trunc(col("od"), "month")).as("month_start"),
        asTs(date_add(col("od"), 30)).as("plus_30d"),
        asTs(add_months(col("od"), 2)).as("plus_2m"),
        unix_timestamp(asTs(col("od"))).as("epoch_sec"))
      .orderBy("o_orderkey")
  }

  /** Q41 — unpivot (melt): the exact inverse of [[q23Pivot]] —
    * wide per-type value columns back to long (user_id, event_type,
    * value) rows. Physically an `Expand` (each input row emitted once
    * per value column) — map-side only, no shuffle beyond q23's own
    * aggregation. NULL cells (user never produced that event type)
    * are dropped on both engines: Spark's unpivot keeps them, so the
    * filter is explicit; DuckDB's UNPIVOT excludes them by default —
    * the oracle spells the UNION ALL form with the same WHERE. */
  def q41Unpivot(s: SparkSession, d: String): DataFrame =
    q23Pivot(s, d)
      .unpivot(
        Array(col("user_id")),
        Array(col("click_value"), col("purchase_value"), col("view_value")),
        "event_type", "value")
      .where(col("value").isNotNull)
      .withColumn("event_type", regexp_replace(col("event_type"), "_value$", ""))
      .orderBy("user_id", "event_type")

  /** Q42 — grouped EXISTS with a correlated NON-EQUI predicate
    * (TPC-H Q4 shape, adapted to the fixture's columns): orders with
    * at least one line item shipped >90 days after the order date,
    * counted per priority. The EXISTS compiles to ONE left-semi join
    * whose condition carries both the equi key (orderkey — the
    * shuffle/broadcast key) and the non-equi date predicate (a
    * residual filter on the matched pair) — the fact table is probed
    * once, never row-multiplied, and the count needs no DISTINCT. */
  def q42LateShipAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d).select("l_orderkey", "l_shipdate"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")

  /** Q43 — percent-of-total (ratio_to_report): each market segment's
    * revenue share via an unpartitioned window over the AGGREGATED
    * result. The window's single partition holds |segments| rows (5),
    * not the fact table — the global-total pattern that is safe at
    * 100 TB because it runs after the reduction, never on raw rows. */
  def q43PctOfTotal(s: SparkSession, d: String): DataFrame = {
    val seg = orders(s, d)
      .join(broadcast(customer(s, d).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(decSum(col("o_totalprice")).as("seg_revenue"))
    seg.select(col("c_mktsegment"), col("seg_revenue"),
        ratio(col("seg_revenue") /
          sum(col("seg_revenue")).over(Window.partitionBy())).as("pct_of_total"))
      .orderBy("c_mktsegment")
  }
}
