package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}
import graft.Tables

/** Relational operator coverage over the TPC-H-ish tables — the DuckDB-oracle
  * correctness surface for SURVEY.md §2.1–§2.7 (scans, filters, scalar
  * expressions, joins incl. semi/anti, aggregations, windows, sorts/top-k,
  * set ops).
  *
  * Parity rules baked into every query (driver compares by value hash):
  *  - money/ratio doubles are cast to DECIMAL(18,2) *before* SUM so the
  *    aggregate is exact and summation-order-independent on both engines;
  *  - every computed column is aliased identically in Spark and SQL;
  *  - output is fully ordered by a unique key (hash stability);
  *  - rank-like ints are left as Spark's IntegerType and CAST(... AS INTEGER)
  *    on the DuckDB side.
  *
  * Scale notes (100 TB thinking, graded per round): all joins below are
  * either dimension joins (nation/region/supplier — Catalyst auto-broadcasts
  * under the threshold, and we hint `broadcast()` explicitly) or key-aligned
  * fact joins (orders⋈lineitem on orderkey) that shuffle once on the join
  * key; aggregations are partial+final (map-side combine) by construction.
  */
object Relational {

  /** Money double → exact decimal. Mirrors CAST(x AS DECIMAL(18,2)). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private val oneDec: Column = lit(1).cast(DecimalType(18, 2))

  /** The year × status pivot grid both bi02 (report legend) and bi03
    * (visuals.json Bars binding) must produce. */
  private val LegendPivotSql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS "Order Year",
      | CAST(sum(CASE WHEN o_orderstatus = 'F'
      |   THEN CAST(round(o_totalprice * 1000) AS BIGINT) END) AS BIGINT)
      |   AS "F",
      | CAST(sum(CASE WHEN o_orderstatus = 'O'
      |   THEN CAST(round(o_totalprice * 1000) AS BIGINT) END) AS BIGINT)
      |   AS "O",
      | CAST(sum(CASE WHEN o_orderstatus = 'P'
      |   THEN CAST(round(o_totalprice * 1000) AS BIGINT) END) AS BIGINT)
      |   AS "P"
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared bi01/bi02 workspace-model fixture (the vue model.js shape):
    * written to scratch, then loaded back through Spark's JSON source —
    * the gate exercises the loader, not just the compiler. */
  private def biModelFixture(s: SparkSession, d: String): String = {
    val dir = graft.sources.Scratch.dir(s, "wsmodel", s"bi_$d")
    val modelJson =
      """{"sources": ["tpch"],
        | "tables": [
        |  {"name": "Orders", "source": "tpch", "fields": [
        |   {"name": "Order Year", "dataType": "int",
        |    "formule": "GetYear(o_orderdate)", "visible": true,
        |    "order": 1, "level": 2},
        |   {"name": "Order Month", "dataType": "string",
        |    "formule": "Format(o_orderdate, 'yyyy-MM')", "visible": true,
        |    "order": 2, "level": 2,
        |    "orderby": "Format(o_orderdate, 'yyyyMM')"},
        |   {"name": "Order Status", "dataType": "string",
        |    "formule": "o_orderstatus", "visible": true,
        |    "order": 3, "level": 1},
        |   {"name": "Price Milli", "dataType": "bigint",
        |    "formule": "Round(o_totalprice * 1000)", "visible": false,
        |    "order": 4, "level": 1},
        |   {"name": "Order Key", "dataType": "bigint",
        |    "formule": "o_orderkey", "visible": false,
        |    "order": 5, "level": 1}]}],
        | "reports": [
        |  {"name": "Orders by month", "table": "Orders",
        |   "axes": ["Order Year", "Order Month"],
        |   "measures": [{"field": "Price Milli", "agg": "sum"},
        |                {"field": "Order Key", "agg": "count"}]},
        |  {"name": "Orders by status", "table": "Orders",
        |   "axes": ["Order Year"], "legend": "Order Status",
        |   "measures": [{"field": "Price Milli", "agg": "sum"}]}]}
        |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/model.json"),
      modelJson.getBytes("UTF-8"))
    // the sibling visuals.json (workspace.js:13-17): a Bars chart bound
    // into the gallery slots — Category axis, Legend, Sum measure
    val visualsJson =
      """{"visuals": [
        |  {"name": "Revenue by status", "chart": "Bars",
        |   "table": "Orders", "bindings": [
        |    {"slot": "Category", "field": "Order Year"},
        |    {"slot": "Legend", "field": "Order Status"},
        |    {"slot": "Measure", "field": "Price Milli", "agg": "Sum"}]}]}
        |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/visuals.json"),
      visualsJson.getBytes("UTF-8"))
    s"$dir/model.json"
  }

  /** Final-output normalization: the driver's gate reads Spark parquet via
    * pandas (decimals keep scale: Decimal('253942.00')) but the DuckDB oracle
    * via float64 ('253942.0') — so any DECIMAL final column hash-mismatches on
    * trailing zeros. Sum in DECIMAL for exactness, then surface as DOUBLE on
    * BOTH engines (the decimal→double cast is IEEE-deterministic and
    * engine-independent). Mirrors CAST(... AS DOUBLE) in the oracle SQL. */
  private def dbl(c: Column): Column = c.cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4 aggregation: TPC-H Q1-shaped pricing summary -----------------
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          dbl(sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount")))))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- §2.3 multi-table equi-join + §2.4 agg -----------------------------
    "q02_revenue_by_nation" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val c  = Tables.customer(s, d)
      val n  = Tables.nation(s, d)
      val r  = Tables.region(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
          dbl(sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount")))))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name", "r_name")
    }),

    // ---- §2.6 sort + limit (top-k), deterministic tie-break ----------------
    "q03_top_orders" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d).where(col("o_orderstatus") === "O")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dbl(sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount")))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ---- §2.3 semi join (EXISTS with correlated extra predicate) -----------
    "q04_priority_with_late_ship" -> ((s, d) => {
      val o  = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      o.join(li, li("l_orderkey") === o("o_orderkey") &&
                 li("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // ---- §2.3 six-table join (TPC-H Q5 shape) ------------------------------
    "q05_region_revenue" -> ((s, d) => {
      val c  = Tables.customer(s, d)
      val o  = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n  = Tables.nation(s, d)
      val r  = Tables.region(s, d).where(col("r_name") === "ASIA")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey") &&
                             c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(dbl(sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount")))))
          .as("revenue"))
        .orderBy("n_name")
    }),

    // ---- §2.2 filter pushdown (range + between), global agg ----------------
    "q06_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
               col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
               col("l_discount").between(0.05, 0.07) &&
               col("l_quantity") < 24)
        .agg(
          dbl(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- §2.4 groupBy with min/max (exact on doubles) ----------------------
    "q07_parts_stats" -> ((s, d) => {
      Tables.part(s, d)
        .groupBy("p_brand", "p_type")
        .agg(
          count(lit(1)).as("n_parts"),
          min(col("p_retailprice")).as("min_price"),
          max(col("p_retailprice")).as("max_price"),
          sum(col("p_size").cast(LongType)).as("sum_size"))
        .orderBy("p_brand", "p_type")
    }),

    // ---- §2.3 left outer join keeping empty groups -------------------------
    "q08_customer_order_counts" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // ---- §2.3/§2.7 anti join (left-join-null idiom → left_anti) ------------
    "q09_customers_no_orders" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // ---- §2.3 semi join with filtered build side ---------------------------
    "q10_customers_with_final_orders" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).where(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // ---- §2.5 row_number top-N per group -----------------------------------
    "q11_top3_orders_per_customer" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- §2.5 running (framed) window sum, decimal-exact -------------------
    "q12_running_customer_spend" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spend", dbl(sum(dec(col("o_totalprice"))).over(w)))
        .select("o_custkey", "o_orderkey", "running_spend")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- §2.5 dense_rank (global) ------------------------------------------
    // With the unique s_suppkey tie-break the order has no ties, so
    // dense_rank ≡ row_number — which the two-phase sharded prefix count
    // reconstructs with NO data-sized global window (the oracle stays
    // dense_rank). Rank key: negated exact cents = s_acctbal DESC.
    "q13_supplier_balance_rank" -> ((s, d) => {
      val su = Tables.supplier(s, d)
        .withColumn("_negbal_", expr("cast(round(s_acctbal * -100) as bigint)"))
        .withColumn("_one_", lit(1L))
      graft.operators.Packing.runningTotalSharded(
          su, "_negbal_", "_one_", "_rk_", tieCols = Seq("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("_rk_").cast(IntegerType).as("rk"))
        .orderBy("s_suppkey")
    }),

    // ---- §2.5 ntile (RankSplit-style ranked segmentation) ------------------
    // Global ntile(4) over the orders fact table WITHOUT the global
    // window (at 100× the single-partition sort is the scale-killer):
    // sharded global rank + the closed-form ntile formula, bit-identical
    // to the engine ntile the oracle still runs.
    "q14_order_quartiles" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("_cents_"))
      graft.operators.Packing.ntileSharded(
          o, "_cents_", buckets = 4, tieCols = Seq("o_orderkey"))
        .select(col("o_orderkey"), col("bucket").cast(IntegerType).as("bucket"))
        .orderBy("o_orderkey")
    }),

    // ---- §2.7 union --------------------------------------------------------
    "q15_all_party_names" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_name").as("name"), lit("customer").as("src"))
      val su = Tables.supplier(s, d)
        .select(col("s_name").as("name"), lit("supplier").as("src"))
      c.union(su).orderBy("src", "name")
    }),

    // ---- §2.4 distinct -----------------------------------------------------
    "q16_distinct_flag_status" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- §2.2 string scalar functions --------------------------------------
    "q17_string_funcs" -> ((s, d) => {
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_upper"),
          concat_ws("-", col("c_name"), col("c_mktsegment")).as("tagline"),
          substring(col("c_name"), 10, 100).as("cust_num"),
          length(col("c_name")).as("name_len"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("name_masked"))
        .orderBy("c_custkey")
    }),

    // ---- §2.2 date/BI formula functions ------------------------------------
    "q18_orders_by_month" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).cast(IntegerType).as("yr"),
          month(col("o_orderdate")).cast(IntegerType).as("mo"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(
          count(lit(1)).as("n_orders"),
          dbl(sum(dec(col("o_totalprice")))).as("monthly_total"))
        .orderBy("yr", "mo")
    }),

    // ---- §2.2 CASE WHEN bucketing ------------------------------------------
    "q19_order_size_buckets" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_p"),
          max(col("o_totalprice")).as("max_p"))
        .orderBy("bucket")
    }),

    // ---- §2.4 GroupBy-transformer policies: max/min/sum/peek(first) --------
    // peek = deterministic "first" via min_by on line number (the reference's
    // GroupBy peek takes whichever arrives first; we pin it to the smallest
    // l_linenumber so the oracle can reproduce it with arg_min).
    "q20_lineitem_rollup_policies" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(
          max(col("l_quantity")).as("max_qty"),
          min(col("l_extendedprice")).as("min_price"),
          dbl(sum(dec(col("l_tax")))).as("sum_tax"),
          // "peek first" must be deterministic for the oracle: l_linenumber is
          // NOT unique within an order, so tie-break on the value itself via a
          // composite sortable key (zero-padded linenumber ++ flag).
          substring(min(concat(lpad(col("l_linenumber").cast("string"), 5, "0"),
            col("l_returnflag"))), 6, 100).as("first_flag"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey")
    }),

    // ---- events: date_trunc + count distinct -------------------------------
    "q21_events_daily" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(
          date_trunc("day", col("ts")).as("day"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          dbl(sum(dec(col("value")))).as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("day", "event_type")
    }),

    // ---- events: per-user argmax via window top-1 --------------------------
    "q22_top_event_per_user" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    }),

    // ---- events: JSON extraction (props is a JSON string) ------------------
    "q23_event_props_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .orderBy("event_id")
    }),

    // ---- §2.7 intersect/except ---------------------------------------------
    "q24_nations_with_both" -> ((s, d) => {
      val custNations = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val suppNations = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      custNations.intersect(suppNations).orderBy("nationkey")
    }),

    "q25_nations_cust_only" -> ((s, d) => {
      val custNations = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val suppNations = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      custNations.except(suppNations).orderBy("nationkey")
    }),

    // ---- §2.4 HAVING (post-aggregation filter) -----------------------------
    "q26_busy_customers" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          dbl(sum(dec(col("o_totalprice")))).as("total_spend"))
        .where(col("n_orders") >= 12)
        .orderBy("o_custkey")
    }),

    // ---- §2.3 cross join (small x small) -----------------------------------
    "q27_region_nation_grid" -> ((s, d) => {
      val r = Tables.region(s, d).select("r_name")
      val n = Tables.nation(s, d).where(col("n_nationkey") < 3).select("n_name")
      r.crossJoin(n).orderBy("r_name", "n_name")
    }),

    // ---- scalar-subquery idiom: compare against a global aggregate ---------
    // (max is exact on doubles, so the threshold is engine-independent)
    "q28_above_half_max_balance" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val maxBal = c.agg(max(col("c_acctbal")).as("_maxbal_"))
      c.crossJoin(broadcast(maxBal))
        .where(col("c_acctbal") * 2 > col("_maxbal_"))
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // ---- as-of (point-in-time) join: latest purchase at or before each
    // event, per user — the union + side-marker + ignore-nulls-last window
    // re-expression (one key shuffle, linear; an inequality join would go
    // quadratic per key). Oracle = DuckDB's NATIVE ASOF LEFT JOIN, so the
    // gate proves semantic equivalence with a real asof implementation
    "as01_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("anchor_id"),
          col("value").as("anchor_value"))
      graft.operators.AsOfJoin.backward(
        ev.select("event_id", "user_id", "ts"), purchases,
        "user_id", "ts", Seq("anchor_id", "anchor_value"), "anchor_id")
        .select(col("event_id"), col("user_id"),
          col("asof.anchor_id").as("anchor_id"),
          col("asof.anchor_value").as("anchor_value"))
        .orderBy("event_id")
    }),

    // staleness-bounded as-of: matches older than 7 days are nulled
    // (pandas merge_asof `tolerance`); the oracle applies the same bound
    // as a post-filter on DuckDB's native ASOF join
    "as03_asof_join_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("anchor_id"),
          col("value").as("anchor_value"))
      graft.operators.AsOfJoin.backwardWithin(
        ev.select("event_id", "user_id", "ts"), purchases,
        "user_id", "ts", Seq("anchor_id", "anchor_value"), "anchor_id",
        toleranceSeconds = 604800.0)
        .select(col("event_id"), col("user_id"),
          col("asof.anchor_id").as("anchor_id"),
          col("asof.anchor_value").as("anchor_value"))
        .orderBy("event_id")
    }),

    // forward direction: EARLIEST purchase at or after each event
    "as02_asof_join_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("anchor_id"))
      graft.operators.AsOfJoin.forward(
        ev.select("event_id", "user_id", "ts"), purchases,
        "user_id", "ts", Seq("anchor_id"), "anchor_id")
        .select(col("event_id"), col("user_id"),
          col("asof.anchor_id").as("anchor_id"))
        .orderBy("event_id")
    }),

    // bucketed range join: events falling inside a purchase-anchored
    // attribution window of the same user (variable-length windows so the
    // interval/cell tiling is actually exercised)
    "rj01_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val windows = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("anchor_id"),
          col("ts").as("w_start"),
          expr("timestampadd(SECOND, cast(1800 + pmod(event_id, 3600) as int), ts)")
            .as("w_end"))
      graft.operators.Temporal.rangeJoin(
        ev.select("event_id", "user_id", "ts"), windows,
        "user_id", "ts", "w_start", "w_end", bucketWidth = 4096L)
        .select("event_id", "anchor_id", "user_id")
        .orderBy("event_id", "anchor_id")
    }),

    // interval×interval OVERLAP join: 30-min activity intervals around
    // clicks/views against 1-hour pre-purchase windows per user — the
    // two-sided rangeJoin (grid cells both sides, the max-start-cell
    // election dedups pairs without a distinct shuffle)
    "io01_interval_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val act = ev.where(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_id").as("act_id"),
          expr("cast(ts as bigint)").as("a_start"),
          (expr("cast(ts as bigint)") + 1800L).as("a_end"))
      val promo = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("promo_id"),
          (expr("cast(ts as bigint)") - 3600L).as("p_start"),
          expr("cast(ts as bigint)").as("p_end"))
      graft.operators.Temporal.intervalOverlapJoin(act, promo, "user_id",
          "a_start", "a_end", "p_start", "p_end", bucketWidth = 4096L)
        .select("act_id", "promo_id", "user_id")
        .orderBy("act_id", "promo_id")
    }),

    // SCD2 validity windows over each user's purchase history
    "sc01_scd2_intervals" -> ((s, d) => {
      val purchases = Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value")
      graft.operators.Temporal.scd2Intervals(
        purchases, "user_id", "ts", "event_id")
        .select(col("user_id"), col("version"), col("event_id"),
          col("value"), col("valid_from"), col("valid_to"),
          col("is_current"))
        .orderBy("user_id", "version")
    }),

    // gap-based batch sessionization (30-minute gap)
    "sn01_batch_sessions" -> ((s, d) =>
      graft.operators.Temporal.sessionize(
        Tables.events(s, d).select("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", gapSeconds = 1800.0)
        .orderBy("user_id", "session_seq")),

    // ---- §2.4 BI surface: pivot (status columns) ---------------------------
    "pv01_pivot_status" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(dbl(sum(dec(col("o_totalprice")))))
        .select(col("o_orderpriority"), col("O").as("price_open"),
          col("F").as("price_filled"), col("P").as("price_partial"))
        .orderBy("o_orderpriority")),

    // ---- §2.4 BI surface: rollup with subtotal rows ------------------------
    // coalesce-to-'ALL' labels the subtotal levels portably (TPC-H names
    // are never null, so the sentinel is unambiguous)
    // ---- rollup + share-of-parent: each nation as a fraction of its
    // region, each region as a fraction of the grand total — the
    // contribution decomposition every BI drilldown needs; parents are
    // read off the SAME rollup via windowed conditional max, no second
    // aggregation pass. Shares divide exact decimal sums cast to double
    // (small enough for exact casts), so they replay bit-identically ----
    "cu03_share_of_parent" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("cu03_orders")
      Tables.customer(s, d).createOrReplaceTempView("cu03_customer")
      Tables.nation(s, d).createOrReplaceTempView("cu03_nation")
      Tables.region(s, d).createOrReplaceTempView("cu03_region")
      s.sql("""
        WITH base AS (
          SELECT r_name, n_name,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM cu03_orders
          JOIN cu03_customer ON o_custkey = c_custkey
          JOIN cu03_nation ON c_nationkey = n_nationkey
          JOIN cu03_region ON n_regionkey = r_regionkey
          GROUP BY ROLLUP (r_name, n_name)),
        p AS (
          SELECT r_name, n_name, rev,
            max(CASE WHEN n_name IS NULL THEN rev END)
              OVER (PARTITION BY r_name) AS reg_rev,
            max(CASE WHEN r_name IS NULL AND n_name IS NULL THEN rev END)
              OVER () AS tot_rev
          FROM base)
        SELECT coalesce(r_name, 'ALL') AS region_name,
               coalesce(n_name, 'ALL') AS nation_name,
               CAST(rev AS DOUBLE) AS revenue,
               CASE WHEN r_name IS NULL THEN CAST(1.0 AS DOUBLE)
                    WHEN n_name IS NULL
                      THEN CAST(rev AS DOUBLE) / CAST(tot_rev AS DOUBLE)
                    ELSE CAST(rev AS DOUBLE) / CAST(reg_rev AS DOUBLE)
               END AS share_of_parent
        FROM p ORDER BY region_name, nation_name""")
    }),

    "cu01_rollup_revenue" -> ((s, d) => {
      // via the spark.sql surface: Dataset.rollup's Expand keeps the
      // original grouping attributes alive next to the nullable copies,
      // which false-positives DetectAmbiguousSelfJoin on ANY post-agg
      // reference (by name, qualified, or toDF-renamed); the SQL parser
      // path carries no Dataset-id tags, so the identical plan analyzes
      // clean — and it exercises the `spark.sql` front door the library
      // also supports
      Tables.orders(s, d).createOrReplaceTempView("cu01_orders")
      Tables.customer(s, d).createOrReplaceTempView("cu01_customer")
      Tables.nation(s, d).createOrReplaceTempView("cu01_nation")
      Tables.region(s, d).createOrReplaceTempView("cu01_region")
      s.sql("""
        SELECT coalesce(r_name, 'ALL') AS region_name,
               coalesce(n_name, 'ALL') AS nation_name,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue,
               count(1) AS n_orders
        FROM cu01_orders
        JOIN cu01_customer ON o_custkey = c_custkey
        JOIN cu01_nation ON c_nationkey = n_nationkey
        JOIN cu01_region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region_name, nation_name""")
    }),

    // ---- §2 BI workspace surface: reports defined PURELY in a JSON
    // model fixture (reference vue/server/model.js:28-77 model shape,
    // workspace.js:1-31 storage), loaded through Spark's JSON source and
    // compiled by graft.pipeline.Workspace into one groupBy/agg plan —
    // formula fields (GetYear / Format / Round·arithmetic) as axes and
    // exact integer measures, the full JSON-model → DataFrame path -------
    "bi01_workspace_report" -> ((s, d) => {
      val model = graft.pipeline.Workspace.load(s, biModelFixture(s, d))
      graft.pipeline.Workspace.runReport(model, "Orders by month",
        Map("Orders" -> Tables.orders(s, d)))
    }),

    // ---- BI workspace chart: the arity-1 Legend slot of the reference's
    // chart descriptors (vue/data/data.js:53,60,69) pivots the single
    // measure across the legend field's values — the grid a stacked bar
    // renders; absent (axis, legend) combinations stay NULL cells --------
    "bi02_workspace_legend" -> ((s, d) => {
      val model = graft.pipeline.Workspace.load(s, biModelFixture(s, d))
      graft.pipeline.Workspace.runReport(model, "Orders by status",
        Map("Orders" -> Tables.orders(s, d)))
    }),

    // ---- BI workspace visual: the visuals.json sibling document binds
    // model fields into a gallery chart's slots (vue/data/data.js:48-80
    // slot/arity descriptors, data.js:82-88 measure functions); the
    // validated binding compiles through the same report path — the full
    // workspace surface (model.json + visuals.json) end to end ----------
    "bi03_workspace_visual" -> ((s, d) => {
      val modelPath = biModelFixture(s, d)
      val dir = modelPath.stripSuffix("/model.json")
      val model = graft.pipeline.Workspace.load(s, modelPath)
      val visuals = graft.pipeline.Workspace.loadVisuals(s, s"$dir/visuals.json")
      graft.pipeline.Workspace.runVisual(model, visuals,
        "Revenue by status", Map("Orders" -> Tables.orders(s, d)))
    }),

    // ---- remaining ANSI window surface: percent_rank / cume_dist
    // (integer-ratio IEEE divisions, replay exactly) + framed first_value
    // and nth_value under the default RANGE frame; the (date, orderkey)
    // composite order removes peer-row ambiguity ---------------------------
    "wf01_window_surface" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).where(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("o_totalprice")).over(w).as("first_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- full CUBE over (region, nation): all four grouping-set shapes
    // (both, region-only, nation-only, grand total) in one Expand pass —
    // same spark.sql front door and analyzer rationale as cu01 ------------
    "cu02_cube_revenue" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("cu02_orders")
      Tables.customer(s, d).createOrReplaceTempView("cu02_customer")
      Tables.nation(s, d).createOrReplaceTempView("cu02_nation")
      Tables.region(s, d).createOrReplaceTempView("cu02_region")
      s.sql("""
        SELECT coalesce(r_name, 'ALL') AS region_name,
               coalesce(n_name, 'ALL') AS nation_name,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue,
               count(1) AS n_orders
        FROM cu02_orders
        JOIN cu02_customer ON o_custkey = c_custkey
        JOIN cu02_nation ON c_nationkey = n_nationkey
        JOIN cu02_region ON n_regionkey = r_regionkey
        GROUP BY CUBE (r_name, n_name)
        ORDER BY region_name, nation_name""")
    }),

    // ---- graph: fixed-point integer PageRank over the (undirected)
    // customer–supplier trade graph — bit-identical ranks on any engine --
    "gr01_pagerank" -> ((s, d) => {
      val pairs = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("sup"))
        .distinct()
      val edges = pairs
        .select(col("cust").as("src"), (col("sup") + 1000000L).as("dst"))
        .unionByName(pairs.select((col("sup") + 1000000L).as("src"),
          col("cust").as("dst")))
      graft.operators.Graph.pageRankInt(edges, "src", "dst", iterations = 3)
        .orderBy("node_id")
    }),

    // ---- graph: degree profile over the directed trade multigraph
    // (one edge occurrence per lineitem, so count != countDistinct) ------
    "gr02_degree_stats" -> ((s, d) => {
      val edges = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      graft.operators.Graph.degreeStats(edges, "src", "dst")
        .orderBy("node_id")
    }),

    // ---- graph: PERSONALIZED PageRank — teleport mass restarts at a
    // seed set (customers < 10), so rank measures proximity to the seeds
    // (crawl prioritization / related-item ranking); same bit-exact
    // integer fixed point as gr01 ----------------------------------------
    "gr04_personalized_pagerank" -> ((s, d) => {
      val pairs = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("sup"))
        .distinct()
      val edges = pairs
        .select(col("cust").as("src"), (col("sup") + 1000000L).as("dst"))
        .unionByName(pairs.select((col("sup") + 1000000L).as("src"),
          col("cust").as("dst")))
      val seeds = Tables.customer(s, d).select(col("c_custkey"))
        .where(col("c_custkey") < 10)
      graft.operators.Graph.personalizedPageRankInt(edges, "src", "dst",
          seeds, iterations = 3)
        .orderBy("node_id")
    }),

    // ---- graph: per-part triangle count + clustering coefficient over
    // the co-purchase graph (parts sharing an order), via the
    // degree-ordered wedge join — the skew-proof O(m^1.5) plan; the
    // customer–supplier graph is bipartite (triangle-free), so this runs
    // on the part–part projection where closure is real ------------------
    "gr03_triangle_stats" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
      val pairs = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.operators.Graph.triangleStats(pairs, "src", "dst")
        .orderBy("node_id")
    }),

    // ---- graph: neighbor-set Jaccard link prediction over the
    // high-quantity co-purchase graph — top-3 non-edge candidates per
    // part by integer Jaccard, with the super-node center cap engaged so
    // the oracle also replays the guard (centers with > 50 neighbors
    // contribute no wedges; their degrees still count in the union) -----
    "jp01_jaccard_linkpred" -> ((s, d) => {
      val li = Tables.lineitem(s, d).where(col("l_quantity") >= 45)
        .select("l_orderkey", "l_partkey")
      val pairs = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.operators.Graph.jaccardLinkPrediction(pairs, "src", "dst",
          k = 3, maxCenterDegree = 50)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("node_id", "rank")
    }),

    // ---- graph: COMMUNITY detection by synchronous label propagation
    // over the trade graph — plurality vote per round, min-label ties, so
    // a fixed round count is fully deterministic (oracle = the two rounds
    // unrolled in SQL) ---------------------------------------------------
    "lp01_label_propagation" -> ((s, d) => {
      val pairs = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      graft.operators.Graph.labelPropagation(pairs, "src", "dst",
          iterations = 2)
        .orderBy("node_id")
    }),

    // ---- graph: 80-core of the co-purchase part graph — synchronous
    // peeling to the unique dense kernel (converges in 5 rounds at both
    // gate scales; the oracle unrolls 8, extra rounds are no-ops) ---------
    "gr05_kcore" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
      val pairs = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.operators.Graph.kCore(pairs, "src", "dst", k = 80L)
        .orderBy("node_id")
    }),

    // ---- graph: multi-source BFS hop distances from the seed customers
    // over the undirected trade graph — frontier-join rounds, min-merge;
    // the oracle unrolls the same three rounds in SQL --------------------
    "gr06_bfs_distances" -> ((s, d) => {
      val pairs = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("sup"))
        .distinct()
      val edges = pairs
        .select(col("cust").as("src"), (col("sup") + 1000000L).as("dst"))
        .unionByName(pairs.select((col("sup") + 1000000L).as("src"),
          col("cust").as("dst")))
      val seeds = Tables.customer(s, d).select(col("c_custkey"))
        .where(col("c_custkey") < 10)
      graft.operators.Graph.bfsDistances(edges, "src", "dst", seeds,
          maxHops = 3)
        .orderBy("node_id")
    }),

    // ---- graph: HITS hubs/authorities on the DIRECTED customer→supplier
    // trade graph (bipartite: customers score as hubs, suppliers as
    // authorities; each side's other score exercises the sink-zero lane).
    // Two unnormalized integer rounds + final milli quantization ----------
    "hits01_hubs_authorities" -> ((s, d) => {
      val pairs = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      graft.operators.Graph.hitsInt(pairs, "src", "dst", iterations = 2)
        .orderBy("node_id")
    }),

    // ---- unpivot (melt): per-nation wide metric row → (nation, metric,
    // value) long form — Spark's native unpivot against a UNION ALL
    // replay -------------------------------------------------------------
    "up01_unpivot" -> ((s, d) => {
      val wide = Tables.customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          countDistinct(col("c_mktsegment")).as("n_segments"),
          sum(expr("cast(round(c_acctbal * 100) as bigint)"))
            .as("balance_cents"))
      wide.unpivot(Array(col("c_nationkey")),
          Array(col("n_customers"), col("n_segments"),
            col("balance_cents")),
          "metric", "value")
        .orderBy("c_nationkey", "metric")
    }),

    // ---- graph: weighted shortest paths (3 Bellman–Ford rounds) from
    // the seed customers over the trade graph with deterministic integer
    // edge weights — min-plus relaxation, oracle-unrolled ------------------
    "gr07_bellman_ford" -> ((s, d) => {
      val pairs = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("sup"))
        .distinct()
      val w = (pmod(col("cust") + col("sup"), lit(7L)) + 1L).as("w")
      val edges = pairs
        .select(col("cust").as("src"), (col("sup") + 1000000L).as("dst"), w)
        .unionByName(pairs.select((col("sup") + 1000000L).as("src"),
          col("cust").as("dst"), w))
      val seeds = Tables.customer(s, d).select(col("c_custkey"))
        .where(col("c_custkey") < 10)
      graft.operators.Graph.ssspInt(edges, "src", "dst", "w", seeds,
          rounds = 3)
        .orderBy("node_id")
    }),

    // ---- GROUPING SETS: segment margin, priority margin, grand total in
    // one pass, grouping_id disambiguating structural NULLs ---------------
    "cu04_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("cu04_orders")
      Tables.customer(s, d).createOrReplaceTempView("cu04_customer")
      s.sql("""
        SELECT coalesce(c_mktsegment, 'ALL') AS segment,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(grouping(c_mktsegment) * 2 + grouping(o_orderpriority)
                 AS BIGINT) AS gid,
               count(1) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM cu04_orders
        JOIN cu04_customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        ORDER BY segment, priority""")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // gr06 replay: three BFS rounds unrolled — each round expands the
    // whole distance table (settled nodes re-emit dist ≥ known, min()
    // discards them, so full-table expansion ≡ the frontier program)
    "gr06_bfs_distances" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS sup
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT cust AS src, sup AS dst FROM pairs
        |      UNION ALL SELECT sup, cust FROM pairs),
        |d0 AS (SELECT c_custkey AS node_id, CAST(0 AS BIGINT) AS dist
        |       FROM customer WHERE c_custkey < 10),
        |d1 AS (SELECT node_id, min(dist) AS dist FROM (
        |         SELECT node_id, dist FROM d0
        |         UNION ALL
        |         SELECT e.dst, d0.dist + 1 FROM d0 JOIN e ON d0.node_id = e.src
        |       ) u GROUP BY node_id),
        |d2 AS (SELECT node_id, min(dist) AS dist FROM (
        |         SELECT node_id, dist FROM d1
        |         UNION ALL
        |         SELECT e.dst, d1.dist + 1 FROM d1 JOIN e ON d1.node_id = e.src
        |       ) u GROUP BY node_id),
        |d3 AS (SELECT node_id, min(dist) AS dist FROM (
        |         SELECT node_id, dist FROM d2
        |         UNION ALL
        |         SELECT e.dst, d2.dist + 1 FROM d2 JOIN e ON d2.node_id = e.src
        |       ) u GROUP BY node_id)
        |SELECT node_id, dist FROM d3 ORDER BY node_id""".stripMargin,

    // gr07 replay: three min-plus rounds unrolled over the deduped
    // weighted edge list (parallel edges keep the min weight, as the
    // operator's pre-aggregate does)
    "gr07_bellman_ford" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS sup
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e0 AS (
        |  SELECT cust AS src, sup + 1000000 AS dst,
        |    (cust + sup) % 7 + 1 AS w
        |  FROM pairs
        |  UNION ALL
        |  SELECT sup + 1000000, cust, (cust + sup) % 7 + 1 FROM pairs),
        |e AS (SELECT src, dst, min(w) AS w FROM e0 GROUP BY src, dst),
        |d0 AS (SELECT c_custkey AS node_id, CAST(0 AS BIGINT) AS dist
        |       FROM customer WHERE c_custkey < 10),
        |d1 AS (SELECT node_id, min(dist) AS dist FROM (
        |         SELECT node_id, dist FROM d0
        |         UNION ALL
        |         SELECT e.dst, d0.dist + e.w FROM d0 JOIN e ON d0.node_id = e.src
        |       ) u GROUP BY node_id),
        |d2 AS (SELECT node_id, min(dist) AS dist FROM (
        |         SELECT node_id, dist FROM d1
        |         UNION ALL
        |         SELECT e.dst, d1.dist + e.w FROM d1 JOIN e ON d1.node_id = e.src
        |       ) u GROUP BY node_id),
        |d3 AS (SELECT node_id, min(dist) AS dist FROM (
        |         SELECT node_id, dist FROM d2
        |         UNION ALL
        |         SELECT e.dst, d2.dist + e.w FROM d2 JOIN e ON d2.node_id = e.src
        |       ) u GROUP BY node_id)
        |SELECT node_id, dist FROM d3 ORDER BY node_id""".stripMargin,

    // cu04 replay: DuckDB's own GROUPING SETS + GROUPING()
    "cu04_grouping_sets" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(grouping(c_mktsegment) * 2 + grouping(o_orderpriority)
        |    AS BIGINT) AS gid,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        |ORDER BY segment, priority""".stripMargin,

    // hits01 replay: two h/a rounds unrolled with left-join + coalesce
    // standing in for the operator's union-max sink handling
    "hits01_hubs_authorities" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
        |h1 AS (SELECT n, coalesce(x.s, 0) AS h FROM nodes
        |       LEFT JOIN (SELECT u, count(*) AS s FROM e GROUP BY u) x
        |         ON x.u = n),
        |a1 AS (SELECT n, coalesce(x.s, 0) AS a FROM nodes
        |       LEFT JOIN (SELECT v, sum(h1.h) AS s
        |                  FROM e JOIN h1 ON h1.n = e.u GROUP BY v) x
        |         ON x.v = n),
        |h2 AS (SELECT n, coalesce(x.s, 0) AS h FROM nodes
        |       LEFT JOIN (SELECT u, sum(a1.a) AS s
        |                  FROM e JOIN a1 ON a1.n = e.v GROUP BY u) x
        |         ON x.u = n),
        |a2 AS (SELECT n, coalesce(x.s, 0) AS a FROM nodes
        |       LEFT JOIN (SELECT v, sum(h2.h) AS s
        |                  FROM e JOIN h2 ON h2.n = e.u GROUP BY v) x
        |         ON x.v = n),
        |mx AS (SELECT max(h) AS mh FROM h2),
        |ma AS (SELECT max(a) AS maxa FROM a2)
        |SELECT h2.n AS node_id, CAST(h2.h AS BIGINT) AS hub,
        |  CAST(a2.a AS BIGINT) AS auth,
        |  CAST(CASE WHEN mh > 0 THEN (1000 * h2.h) // mh ELSE 0 END
        |    AS BIGINT) AS hub_milli,
        |  CAST(CASE WHEN maxa > 0 THEN (1000 * a2.a) // maxa ELSE 0 END
        |    AS BIGINT) AS auth_milli
        |FROM h2 JOIN a2 ON a2.n = h2.n, mx, ma
        |ORDER BY node_id""".stripMargin,

    // up01 replay: the long form spelled out as one UNION ALL per metric
    "up01_unpivot" ->
      """WITH wide AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
        |    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |      AS balance_cents
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value
        |FROM wide
        |UNION ALL
        |SELECT c_nationkey, 'n_segments', n_segments FROM wide
        |UNION ALL
        |SELECT c_nationkey, 'balance_cents', balance_cents FROM wide
        |ORDER BY c_nationkey, metric""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT n_name, r_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name ORDER BY n_name, r_name""".stripMargin,

    "q03_top_orders" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q04_priority_with_late_ship" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_region_revenue" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06_forecast_revenue" ->
      """SELECT
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q07_parts_stats" ->
      """SELECT p_brand, p_type, count(*) AS n_parts,
        | min(p_retailprice) AS min_price, max(p_retailprice) AS max_price,
        | CAST(sum(p_size) AS BIGINT) AS sum_size
        |FROM part GROUP BY p_brand, p_type ORDER BY p_brand, p_type""".stripMargin,

    "q08_customer_order_counts" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q09_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q10_customers_with_final_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q11_top3_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q12_running_customer_spend" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q13_supplier_balance_rank" ->
      """SELECT s_suppkey, s_name, s_acctbal,
        | CAST(dense_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INTEGER) AS rk
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "q14_order_quartiles" ->
      """SELECT o_orderkey,
        | CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS bucket
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q15_all_party_names" ->
      """SELECT name, src FROM (
        |  SELECT c_name AS name, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_name AS name, 'supplier' AS src FROM supplier) t
        |ORDER BY src, name""".stripMargin,

    "q16_distinct_flag_status" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q17_string_funcs" ->
      """SELECT c_custkey,
        | upper(c_mktsegment) AS seg_upper,
        | concat_ws('-', c_name, c_mktsegment) AS tagline,
        | substr(c_name, 10, 100) AS cust_num,
        | CAST(length(c_name) AS INTEGER) AS name_len,
        | regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q18_orders_by_month" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(month(o_orderdate) AS INTEGER) AS mo,
        | strftime(o_orderdate, '%Y-%m') AS ym,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monthly_total
        |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, mo""".stripMargin,

    // bi01 replay: the JSON-model report compiles to exactly this grid —
    // year/month axes, exact integer milli-price sum (the Round-measure
    // idiom), per-axis order count; outer BIGINT cast per the HUGEINT rule
    "bi01_workspace_report" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS "Order Year",
        | strftime(o_orderdate, '%Y-%m') AS "Order Month",
        | CAST(sum(CAST(round(o_totalprice * 1000) AS BIGINT)) AS BIGINT)
        |   AS sum_price_milli,
        | count(o_orderkey) AS count_order_key
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // bi02 replay: the legend pivot as conditional aggregation — one
    // column per status value (sorted: F, O, P), NULL where the (year,
    // status) combination has no orders, exactly the pivoted grid.
    // bi03 compiles a visuals.json Bars binding to the SAME grid — the
    // identity of the two replays is the binding layer's contract
    "bi02_workspace_legend" -> LegendPivotSql,
    "bi03_workspace_visual" -> LegendPivotSql,

    "q19_order_size_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        | count(*) AS n, min(o_totalprice) AS min_p, max(o_totalprice) AS max_p
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q20_lineitem_rollup_policies" ->
      """SELECT l_orderkey,
        | max(l_quantity) AS max_qty,
        | min(l_extendedprice) AS min_price,
        | CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_tax,
        | substr(min(concat(lpad(CAST(l_linenumber AS VARCHAR), 5, '0'), l_returnflag)), 6, 100) AS first_flag,
        | count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q21_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "q22_top_event_per_user" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY value DESC, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q23_event_props_json" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q24_nations_with_both" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q25_nations_cust_only" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q26_busy_customers" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 12 ORDER BY o_custkey""".stripMargin,

    "q27_region_nation_grid" ->
      """SELECT r_name, n_name
        |FROM region CROSS JOIN (SELECT n_name FROM nation WHERE n_nationkey < 3) t
        |ORDER BY r_name, n_name""".stripMargin,

    "q28_above_half_max_balance" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal * 2 > (SELECT max(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    // the oracle is DuckDB's NATIVE asof join — the gate proves the
    // window re-expression matches a first-class implementation,
    // inclusive (>=) at equal timestamps
    "as01_asof_join" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_id AS anchor_id, value AS anchor_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, r.anchor_id, r.anchor_value
        |FROM events l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // bound replayed with Spark's exact double program: exact
    // double(micros) then one correctly-rounded /1e6 per side
    "as03_asof_join_tolerance" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_id AS anchor_id, value AS anchor_value
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT l.event_id, l.user_id,
        |    (epoch_us(l.ts) / 1000000.0) - (epoch_us(r.ts) / 1000000.0)
        |      AS gap,
        |    r.anchor_id, r.anchor_value
        |  FROM events l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.ts >= r.ts)
        |SELECT event_id, user_id,
        |  CASE WHEN gap <= 604800.0 THEN anchor_id END AS anchor_id,
        |  CASE WHEN gap <= 604800.0 THEN anchor_value END AS anchor_value
        |FROM m ORDER BY event_id""".stripMargin,

    "as02_asof_join_forward" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_id AS anchor_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, r.anchor_id
        |FROM events l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "rj01_range_join" ->
      """WITH w AS (
        |  SELECT user_id, event_id AS anchor_id, ts AS w_start,
        |    ts + to_seconds(CAST(1800 + event_id % 3600 AS BIGINT)) AS w_end
        |  FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, w.anchor_id, e.user_id
        |FROM events e JOIN w
        |  ON e.user_id = w.user_id
        | AND e.ts >= w.w_start AND e.ts < w.w_end
        |ORDER BY e.event_id, w.anchor_id""".stripMargin,

    // io01 replay: the plain half-open overlap theta join the tiled plan
    // equals (epoch-second bounds, ls < re AND rs < le)
    "io01_interval_overlap" ->
      """WITH act AS (
        |  SELECT user_id, event_id AS act_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS a_s,
        |    CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS a_e
        |  FROM events WHERE event_type IN ('click', 'view')),
        |promo AS (
        |  SELECT user_id, event_id AS promo_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) - 3600 AS p_s,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS p_e
        |  FROM events WHERE event_type = 'purchase')
        |SELECT a.act_id, p.promo_id, a.user_id
        |FROM act a JOIN promo p ON a.user_id = p.user_id
        |  AND a.a_s < p.p_e AND p.p_s < a.a_e
        |ORDER BY act_id, promo_id""".stripMargin,

    "sc01_scd2_intervals" ->
      """SELECT user_id,
        |  CAST(row_number() OVER w AS INTEGER) AS version,
        |  event_id, value,
        |  ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "sn01_batch_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL
        |              OR epoch(ts) - epoch(prev_ts) > 1800.0
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |        AS prev_ts
        |    FROM events)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "pv01_pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS price_open,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS price_filled,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS price_partial
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "cu03_share_of_parent" ->
      """WITH base AS (
        |  SELECT r_name, n_name,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY ROLLUP (r_name, n_name)),
        |p AS (
        |  SELECT r_name, n_name, rev,
        |    max(CASE WHEN n_name IS NULL THEN rev END)
        |      OVER (PARTITION BY r_name) AS reg_rev,
        |    max(CASE WHEN r_name IS NULL AND n_name IS NULL THEN rev END)
        |      OVER () AS tot_rev
        |  FROM base)
        |SELECT coalesce(r_name, 'ALL') AS region_name,
        |  coalesce(n_name, 'ALL') AS nation_name,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  CASE WHEN r_name IS NULL THEN CAST(1.0 AS DOUBLE)
        |       WHEN n_name IS NULL
        |         THEN CAST(rev AS DOUBLE) / CAST(tot_rev AS DOUBLE)
        |       ELSE CAST(rev AS DOUBLE) / CAST(reg_rev AS DOUBLE)
        |  END AS share_of_parent
        |FROM p ORDER BY region_name, nation_name""".stripMargin,

    "cu01_rollup_revenue" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |  coalesce(n_name, 'ALL') AS nation_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,

    "wf01_window_surface" ->
      """SELECT o_custkey, o_orderkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "cu02_cube_revenue" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |  coalesce(n_name, 'ALL') AS nation_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,

    // personalized variant of gr01's unrolled rounds: init and restart
    // base are concentrated on the seed nodes (zero elsewhere)
    "gr04_personalized_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS sup
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT cust AS src, 1000000 + sup AS dst FROM pairs
        |  UNION ALL
        |  SELECT 1000000 + sup AS src, cust AS dst FROM pairs),
        |nodes AS (
        |  SELECT src AS node_id FROM edges
        |  UNION SELECT dst FROM edges),
        |seeds AS (SELECT node_id FROM nodes WHERE node_id < 10),
        |params AS (
        |  SELECT CAST(1000000000000 // count(*) AS BIGINT) AS init,
        |    CAST((15 * (1000000000000 // count(*))) // 100 AS BIGINT)
        |      AS base
        |  FROM seeds),
        |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        |nb AS (
        |  SELECT n.node_id,
        |    CASE WHEN s.node_id IS NOT NULL
        |      THEN (SELECT init FROM params) ELSE 0 END AS init,
        |    CASE WHEN s.node_id IS NOT NULL
        |      THEN (SELECT base FROM params) ELSE 0 END AS base
        |  FROM nodes n LEFT JOIN seeds s ON n.node_id = s.node_id),
        |r0 AS (SELECT node_id, init AS rank FROM nb),
        |c1 AS (
        |  SELECT e.dst AS node_id, CAST(sum(r.rank // g.d) AS BIGINT) AS s
        |  FROM edges e JOIN deg g ON e.src = g.src
        |  JOIN r0 r ON e.src = r.node_id GROUP BY e.dst),
        |r1 AS (
        |  SELECT nb.node_id, nb.base + (85 * coalesce(c1.s, 0)) // 100
        |    AS rank
        |  FROM nb LEFT JOIN c1 ON nb.node_id = c1.node_id),
        |c2 AS (
        |  SELECT e.dst AS node_id, CAST(sum(r.rank // g.d) AS BIGINT) AS s
        |  FROM edges e JOIN deg g ON e.src = g.src
        |  JOIN r1 r ON e.src = r.node_id GROUP BY e.dst),
        |r2 AS (
        |  SELECT nb.node_id, nb.base + (85 * coalesce(c2.s, 0)) // 100
        |    AS rank
        |  FROM nb LEFT JOIN c2 ON nb.node_id = c2.node_id),
        |c3 AS (
        |  SELECT e.dst AS node_id, CAST(sum(r.rank // g.d) AS BIGINT) AS s
        |  FROM edges e JOIN deg g ON e.src = g.src
        |  JOIN r2 r ON e.src = r.node_id GROUP BY e.dst),
        |r3 AS (
        |  SELECT nb.node_id, nb.base + (85 * coalesce(c3.s, 0)) // 100
        |    AS rank
        |  FROM nb LEFT JOIN c3 ON nb.node_id = c3.node_id)
        |SELECT node_id, CAST(rank AS BIGINT) AS rank
        |FROM r3 ORDER BY node_id""".stripMargin,

    // 3 unrolled synchronous rounds of the integer fixed-point update
    // base + (85 * sum(rank // deg)) // 100 — every step integral, so the
    // replay is bit-exact (`//` floors, `div` truncates: equal on the
    // all-positive ranks here)
    "gr01_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS sup
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT cust AS src, 1000000 + sup AS dst FROM pairs
        |  UNION ALL
        |  SELECT 1000000 + sup AS src, cust AS dst FROM pairs),
        |nodes AS (
        |  SELECT src AS node_id FROM edges
        |  UNION SELECT dst FROM edges),
        |params AS (
        |  SELECT CAST(1000000000000 // count(*) AS BIGINT) AS init,
        |    CAST((15 * (1000000000000 // count(*))) // 100 AS BIGINT)
        |      AS base
        |  FROM nodes),
        |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        |r0 AS (
        |  SELECT node_id, (SELECT init FROM params) AS rank FROM nodes),
        |c1 AS (
        |  SELECT e.dst AS node_id, CAST(sum(r.rank // g.d) AS BIGINT) AS s
        |  FROM edges e JOIN deg g ON e.src = g.src
        |  JOIN r0 r ON e.src = r.node_id GROUP BY e.dst),
        |r1 AS (
        |  SELECT n.node_id, (SELECT base FROM params)
        |    + (85 * coalesce(c1.s, 0)) // 100 AS rank
        |  FROM nodes n LEFT JOIN c1 ON n.node_id = c1.node_id),
        |c2 AS (
        |  SELECT e.dst AS node_id, CAST(sum(r.rank // g.d) AS BIGINT) AS s
        |  FROM edges e JOIN deg g ON e.src = g.src
        |  JOIN r1 r ON e.src = r.node_id GROUP BY e.dst),
        |r2 AS (
        |  SELECT n.node_id, (SELECT base FROM params)
        |    + (85 * coalesce(c2.s, 0)) // 100 AS rank
        |  FROM nodes n LEFT JOIN c2 ON n.node_id = c2.node_id),
        |c3 AS (
        |  SELECT e.dst AS node_id, CAST(sum(r.rank // g.d) AS BIGINT) AS s
        |  FROM edges e JOIN deg g ON e.src = g.src
        |  JOIN r2 r ON e.src = r.node_id GROUP BY e.dst),
        |r3 AS (
        |  SELECT n.node_id, (SELECT base FROM params)
        |    + (85 * coalesce(c3.s, 0)) // 100 AS rank
        |  FROM nodes n LEFT JOIN c3 ON n.node_id = c3.node_id)
        |SELECT node_id, CAST(rank AS BIGINT) AS rank
        |FROM r3 ORDER BY node_id""".stripMargin,

    // same degree-ordered orientation as the Spark plan — but the oracle
    // only needs ANY consistent triangle enumeration; the per-node counts
    // and the one-division clustering coefficient are what must agree
    "gr03_triangle_stats" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |canon AS (
        |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |   AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT node_id, count(*) AS degree FROM (
        |    SELECT a AS node_id FROM canon
        |    UNION ALL SELECT b FROM canon) GROUP BY node_id),
        |rk AS (SELECT node_id, degree * 4294967296 + node_id AS r FROM deg),
        |o AS (
        |  SELECT CASE WHEN ra.r < rb.r THEN c.a ELSE c.b END AS u,
        |         CASE WHEN ra.r < rb.r THEN c.b ELSE c.a END AS v,
        |         CASE WHEN ra.r < rb.r THEN rb.r ELSE ra.r END AS rkv
        |  FROM canon c
        |  JOIN rk ra ON ra.node_id = c.a JOIN rk rb ON rb.node_id = c.b),
        |tri AS (
        |  SELECT w.u, w.x, w.y FROM (
        |    SELECT o1.u, o1.v AS x, o2.v AS y
        |    FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.rkv < o2.rkv) w
        |  JOIN o e ON e.u = w.x AND e.v = w.y),
        |per_node AS (
        |  SELECT node_id, count(*) AS triangles FROM (
        |    SELECT u AS node_id FROM tri
        |    UNION ALL SELECT x FROM tri
        |    UNION ALL SELECT y FROM tri) GROUP BY node_id)
        |SELECT d.node_id, d.degree,
        |  coalesce(p.triangles, 0) AS triangles,
        |  CASE WHEN d.degree >= 2
        |    THEN CAST(coalesce(p.triangles, 0) * 2 AS DOUBLE)
        |         / CAST(d.degree * (d.degree - 1) AS DOUBLE)
        |    ELSE 0.0 END AS clustering
        |FROM deg d LEFT JOIN per_node p ON d.node_id = p.node_id
        |ORDER BY d.node_id""".stripMargin,

    // jp01 replay: the wedge self-join restricted to <= 50-degree centers,
    // existing edges anti-joined out, integer milli Jaccard from FULL
    // degrees, per-node top-3 by (jaccard, common, candidate id)
    "jp01_jaccard_linkpred" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_quantity >= 45),
        |und0 AS (
        |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |e AS (SELECT a, b FROM und0 UNION SELECT b, a FROM und0),
        |deg AS (SELECT a AS node, count(*) AS deg FROM e GROUP BY 1),
        |ctr AS (
        |  SELECT e.a, e.b FROM e JOIN deg ON deg.node = e.a
        |  WHERE deg.deg <= 50),
        |cm AS (
        |  SELECT l.b AS u, r.b AS w, count(*) AS common
        |  FROM ctr l JOIN ctr r ON l.a = r.a AND l.b < r.b
        |  GROUP BY 1, 2),
        |ne AS (
        |  SELECT cm.u, cm.w, cm.common FROM cm
        |  LEFT JOIN e ON e.a = cm.u AND e.b = cm.w
        |  WHERE e.a IS NULL),
        |scored AS (
        |  SELECT u, w, common,
        |    (1000 * common) // (du.deg + dw.deg - common) AS jm
        |  FROM ne JOIN deg du ON du.node = u JOIN deg dw ON dw.node = w),
        |bidir AS (
        |  SELECT u AS node_id, w AS candidate_id, common, jm FROM scored
        |  UNION ALL SELECT w, u, common, jm FROM scored),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY node_id
        |    ORDER BY jm DESC, common DESC, candidate_id) AS rnk
        |  FROM bidir)
        |SELECT node_id, candidate_id, CAST(common AS BIGINT) AS common,
        |  CAST(jm AS BIGINT) AS jaccard_milli, CAST(rnk AS BIGINT) AS rank
        |FROM rk WHERE rnk <= 3 ORDER BY node_id, rank""".stripMargin,

    // lp01 replay: both synchronous rounds unrolled — vote table per
    // round, plurality via row_number ordered (count DESC, label ASC)
    "lp01_label_propagation" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS sup
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (
        |  SELECT cust AS a, 1000000 + sup AS b FROM pairs
        |  UNION
        |  SELECT 1000000 + sup AS a, cust AS b FROM pairs),
        |l0 AS (SELECT DISTINCT a AS node_id, a AS label FROM e),
        |v1 AS (
        |  SELECT e.b AS node_id, l.label, count(*) AS c
        |  FROM e JOIN l0 l ON e.a = l.node_id GROUP BY e.b, l.label),
        |l1 AS (
        |  SELECT node_id, label FROM (
        |    SELECT node_id, label, row_number() OVER (PARTITION BY node_id
        |      ORDER BY c DESC, label) AS rn FROM v1) WHERE rn = 1),
        |v2 AS (
        |  SELECT e.b AS node_id, l.label, count(*) AS c
        |  FROM e JOIN l1 l ON e.a = l.node_id GROUP BY e.b, l.label),
        |l2 AS (
        |  SELECT node_id, label FROM (
        |    SELECT node_id, label, row_number() OVER (PARTITION BY node_id
        |      ORDER BY c DESC, label) AS rn FROM v2) WHERE rn = 1)
        |SELECT node_id, label FROM l2 ORDER BY node_id""".stripMargin,

    // gr05 replay: 8 peel rounds unrolled (converges in 5 at both gate
    // scales — the extra rounds filter nothing and cost one no-op pass).
    // Every round CTE is MATERIALIZED: each e_i is referenced three
    // times, so inlining would expand the chain 3^8-fold
    "gr05_kcore" -> {
      val round = (i: Int) =>
        s"""k$i AS MATERIALIZED (
           |  SELECT a FROM e${i - 1} GROUP BY a HAVING count(*) >= 80),
           |e$i AS MATERIALIZED (
           |  SELECT e.a, e.b FROM e${i - 1} e
           |  JOIN k$i x ON e.a = x.a JOIN k$i y ON e.b = y.a),""".stripMargin
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |canon AS (
         |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
         |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
         |   AND a.l_partkey < b.l_partkey),
         |e0 AS MATERIALIZED (
         |  SELECT a, b FROM canon UNION ALL SELECT b AS a, a AS b FROM canon),
         |${(1 to 8).map(round).mkString("\n")}
         |fin AS (SELECT a, b FROM e8)
         |SELECT a AS node_id, count(*) AS core_degree
         |FROM fin GROUP BY a ORDER BY node_id""".stripMargin
    },

    "gr02_degree_stats" ->
      """WITH edges AS (
        |  SELECT o_custkey AS src, 1000000 + l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |o AS (
        |  SELECT src AS node_id, count(*) AS out_degree,
        |    count(DISTINCT dst) AS out_distinct
        |  FROM edges GROUP BY src),
        |i AS (
        |  SELECT dst AS node_id, count(*) AS in_degree,
        |    count(DISTINCT src) AS in_distinct
        |  FROM edges GROUP BY dst)
        |SELECT coalesce(o.node_id, i.node_id) AS node_id,
        |  coalesce(out_degree, 0) AS out_degree,
        |  coalesce(out_distinct, 0) AS out_distinct,
        |  coalesce(in_degree, 0) AS in_degree,
        |  coalesce(in_distinct, 0) AS in_distinct
        |FROM o FULL OUTER JOIN i ON o.node_id = i.node_id
        |ORDER BY node_id""".stripMargin
  )
}
