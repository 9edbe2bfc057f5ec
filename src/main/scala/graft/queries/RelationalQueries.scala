package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Broad relational operator coverage over the TPC-H-ish star schema
  * (SURVEY.md §2.13 "+ relational coverage"): scan+filter+project with
  * parquet pushdown, hash aggregation, broadcast joins along the
  * region→nation→customer→orders→lineitem chain, window functions,
  * semi/anti joins, rollup, distinct and set ops.
  *
  * Scale notes: every join keeps the big fact table (lineitem) unshuffled
  * where possible — dimensions are broadcast; the only wide shuffles are
  * the groupBy aggregations (partial agg map-side first) and the window
  * partition. Float aggregates are rounded on both engines (sum→4dp,
  * avg→6dp) so hash compares are immune to summation-order noise.
  */
object RelationalQueries extends QueryPack {

  private val Cutoff = "1998-06-01"

  /** Money sums in EXACT decimal: the source doubles are clean 2dp
    * values (prices) and 2dp fractions (discount/tax), so casting to
    * DECIMAL recovers them exactly and the whole product/sum pipeline is
    * order-independent integer arithmetic — immune to the cross-engine
    * last-ulp divergence that double summation has when a rounded sum
    * lands on a rounding boundary (observed at sf0.1). Cast back to
    * DOUBLE only after the final round. */
  private def decPrice = col("l_extendedprice").cast("decimal(18,2)")
  private def decDisc = col("l_discount").cast("decimal(4,2)")
  private def decTax = col("l_tax").cast("decimal(4,2)")
  private def decRevenue = decPrice * (lit(1).cast("decimal(3,2)") - decDisc)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: filter pushed to parquet scan,
    // partial+final hash agg on 2 low-cardinality keys.
    "q_pricing_summary" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"), // integer-valued: exact
          round(sum(decPrice), 4).cast("double").as("sum_base_price"),
          round(sum(decRevenue), 4).cast("double").as("sum_disc_price"),
          round(sum(decRevenue * (lit(1).cast("decimal(3,2)") + decTax)), 4)
            .cast("double").as("sum_charge"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(sum(decPrice).cast("double") / count(lit(1)), 6).as("avg_price"),
          round(sum(decDisc).cast("double") / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3-style: broadcast the filtered orders onto the lineitem scan,
    // top-10 revenue orders.
    "q_top_revenue_orders" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
        .where(col("o_orderdate") < lit(Cutoff).cast(TimestampType))
      val li = tbl(s, dir, "lineitem")
        .where(col("l_shipdate") > lit(Cutoff).cast(TimestampType))
      li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(round(sum(decRevenue), 4).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-style: revenue per region through the full dimension chain.
    "q_region_revenue" -> ((s, dir) => {
      val r = tbl(s, dir, "region")
      val n = tbl(s, dir, "nation")
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      val li = tbl(s, dir, "lineitem")
      val dims = c
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "r_name")
      li.join(o.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy("r_name")
        .agg(round(sum(decRevenue), 4).cast("double").as("revenue"))
        .orderBy("r_name")
    }),

    // Running per-supplier quantity: window with deterministic total
    // order. The synthetic lineitem contains duplicate (orderkey,
    // linenumber) rows, so l_quantity joins the sort key to make the
    // running order total.
    "q_window_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
        .withColumn("running_qty", round(sum("l_quantity").over(w), 4))
        .drop("l_quantity", "l_shipdate")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    }),

    // Semi join: customers that have at least one order, by segment.
    "q_semi_join_customers" -> ((s, dir) =>
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")),

    // Anti join: customers with no orders at all.
    "q_anti_join_customers" -> ((s, dir) =>
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_customers"))),

    // Rollup: counts + quantity subtotals at (flag, status), (flag), ().
    "q_rollup_counts" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Distinct pairs (reference O13b dedup shape).
    "q_distinct_flags" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // Set op: union of supplier keys seen in facts and in the dim table.
    "q_union_suppkeys" -> ((s, dir) =>
      tbl(s, dir, "lineitem").select(col("l_suppkey").as("suppkey"))
        .union(tbl(s, dir, "supplier").select(col("s_suppkey").as("suppkey")))
        .distinct()
        .orderBy("suppkey")),

    // Q4-style: orders with at least one lineitem, per priority.
    "q_exists_priority" -> ((s, dir) =>
      tbl(s, dir, "orders")
        .join(tbl(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")),

    // Cube: all grouping-set combinations over (flag, status).
    "q_cube_counts" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Distribution-rank windows: ntile quartiles over a deterministic
    // total order (qty has heavy ties, so the order pins orderkey +
    // linenumber — both engines assign identical quartiles), rolled up
    // to per-(flag, quartile) bounds. The window partitions by flag —
    // key-partitioned, never a global sort of one partition.
    "q_quartile_stats" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
      tbl(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"),
          ntile(4).over(w).as("quartile"))
        .groupBy("l_returnflag", "quartile")
        .agg(count(lit(1)).as("n"),
          min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"))
        .orderBy("l_returnflag", "quartile")
    }),

    // TPC-H Q17 shape — the correlated-average filter: lineitems whose
    // quantity is below 20% of their part's average, per-part averages
    // computed once and joined back (the decorrelated form Catalyst
    // and every warehouse plan; a row-correlated subquery would
    // re-scan per row). Join is keyed on partkey; the avg table is
    // |parts| rows.
    "q_small_qty_revenue" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      // double avg, not decimal: Spark's DECIMAL avg rounds to scale+4
      // while DuckDB's is DOUBLE — integer quantities sum exactly in a
      // double, so the double path is bit-identical cross-engine
      val avgQty = li.groupBy(col("l_partkey").as("p_key"))
        .agg((avg(col("l_quantity").cast("double")) * 0.2).as("qty_cut"))
      li.join(avgQty, col("l_partkey") === col("p_key"))
        .where(col("l_quantity") < col("qty_cut"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(decRevenue).cast("double") / 7.0, 4).as("avg_yearly"))
    }),

    // Explicit GROUPING SETS — the asymmetric 3-set selection
    // ((flag,status),(flag),(status)) that neither rollup nor cube
    // expresses; grouping_id() disambiguates a genuinely-NULL group key
    // from an aggregated-away one (both engines use the same bitmask
    // convention, verified). One shuffle; Spark expands the grouping
    // sets before the partial aggregate, so map-side combine still
    // applies per set at 100 TB.
    "q_grouping_sets" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(sum("l_quantity"), 4).as("sum_qty"))
        .orderBy(asc("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))),

    // Set op: INTERSECT of customer keys with ordering customers.
    "q_intersect_custkeys" -> ((s, dir) =>
      tbl(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .intersect(tbl(s, dir, "orders").select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    // Set op: EXCEPT — customers that never ordered, as a set difference.
    "q_except_custkeys" -> ((s, dir) =>
      tbl(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .except(tbl(s, dir, "orders").select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    // Exact interpolated percentiles per return flag (Catalyst
    // `percentile`; DuckDB quantile_cont — same linear interpolation).
    "q_quantity_percentiles" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"))
        .orderBy("l_returnflag")),

    // TPC-H Q14-style promo revenue ratio: part dim broadcast onto the
    // lineitem scan; one global agg row.
    "q_promo_revenue" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) * sum(when(col("p_type").startsWith("PROMO"), decRevenue)
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double")
            / sum(decRevenue).cast("double"), 6).as("promo_pct"))),

    // Moment-based statistics from EXACT power sums: l_quantity is
    // integer-valued, so sum(q), sum(q^2), sum(q^3) are exact BIGINTs in
    // both engines and the derived mean/variance/skewness are single
    // identical double computations — unlike built-in skewness()/corr(),
    // whose streaming accumulation differs across engines.
    "q_quantity_moments" -> ((s, dir) => {
      val q = col("l_quantity").cast("long")
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(q).as("s1"),
          sum(q * q).as("s2"), sum(q * q * q).as("s3"))
        .select(col("l_returnflag"), col("n"), col("s1"), col("s2"), col("s3"),
          round(col("s1").cast("double") / col("n"), 6).as("mean"),
          round(col("s2").cast("double") / col("n")
            - pow(col("s1").cast("double") / col("n"), 2), 6).as("variance"))
        .orderBy("l_returnflag")
    }),

    // Pearson correlation of quantity vs price from exact sums (decimal
    // for the 2dp prices), one identical double formula on both engines.
    "q_qty_price_corr" -> ((s, dir) => {
      val q = col("l_quantity").cast("long")
      val p = decPrice
      tbl(s, dir, "lineitem")
        .agg(count(lit(1)).as("n"), sum(q).as("sx"),
          sum(q * q).as("sxx"), sum(p).as("sy"),
          sum(p * p).as("syy"), sum(p * q).as("sxy"))
        .select(round(
          (col("n") * col("sxy").cast("double") - col("sx") * col("sy").cast("double"))
            / sqrt((col("n") * col("sxx").cast("double") - col("sx") * col("sx"))
              * (col("n") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("corr_qty_price"))
    }),

    // Two-phase salted aggregation (graft.operators.Salt): result must
    // equal the direct groupBy — which is exactly what the plain-SQL
    // oracle checks. Quantities are integer-valued so the salted partial
    // sums are exact.
    "q_salted_supplier_qty" -> ((s, dir) =>
      graft.operators.Salt.saltedSum(
          tbl(s, dir, "lineitem"), col("l_suppkey"), col("l_quantity").cast("long"),
          saltFactor = 16, saltCols = Seq(col("l_orderkey"), col("l_linenumber")))
        .select(col("key").as("l_suppkey"), col("total").as("sum_qty"))
        .orderBy("l_suppkey")),

    // Salted per-key TOP-K (the remaining Salt API not yet under
    // CORRECTNESS): per order priority, top-5 orders by price via salt
    // buckets + bounded-TopK merge — result must equal the plain
    // window, which is what the oracle computes. Ties pinned by
    // orderkey in both forms; decimal(,2) prices cast to double are
    // exact, so the salted merge is drift-free.
    "q_salted_top_orders" -> ((s, dir) =>
      graft.operators.Salt.saltedTopK(
          tbl(s, dir, "orders"), col("o_orderpriority"), col("o_orderkey"),
          (-col("o_totalprice")).cast("double"), k = 5, saltFactor = 16)
        .select(col("key").as("o_orderpriority"), col("id").as("o_orderkey"),
          round(-col("ord"), 2).as("o_totalprice"))
        .orderBy(asc("o_orderpriority"), desc("o_totalprice"),
          asc("o_orderkey"))),

    // Source-layer round-trip under CORRECTNESS: a lineitem projection
    // is written to CSV and read back through an EXPLICIT schema (no
    // inference scan), then aggregated — the oracle computes the same
    // aggregate from the original parquet, so any encode/decode or
    // type-mapping defect in the CSV path breaks the hash.
    // (Format round-trips are otherwise spec-gated — MultiFormatSpec.)
    // The dump path is per-process (PID-suffixed): two concurrent runs
    // against the same sf (bench + verify) must not race on
    // overwrite-vs-read of a shared directory.
    "q_csv_roundtrip" -> ((s, dir) => {
      val path = s"${QueryPack.dumpRoot}/graft_csv_roundtrip/" +
        dir.replaceAll(".*/", "") + "_pid" + ProcessHandle.current().pid()
      tbl(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"))
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read
        .schema("l_returnflag STRING, l_linestatus STRING, qty LONG")
        .option("header", "true").csv(path)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Pivot: order-status counts per market segment (fixed pivot values
    // for determinism).
    "q_pivot_segment_status" -> ((s, dir) =>
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .orderBy("c_mktsegment")),

    // OLS simple regression from EXACT power sums (quantity -> revenue):
    // slope, intercept and R² derive from the same one-pass integer-
    // exact sums as the moments/corr queries, so the only float ops are
    // the final divisions — order-independent, hence cross-engine-stable
    // (DuckDB oracles it with its native regr_* aggregates). The
    // regression-aggregate shape: one scan, one row out, no shuffle
    // beyond the scalar combine.
    "q_ols_qty_revenue" -> ((s, dir) => {
      val x = col("l_quantity").cast("long")
      val y = decRevenue
      tbl(s, dir, "lineitem")
        .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(x * x).as("sxx"),
          sum(y).as("sy"), sum(y * y).as("syy"),
          sum(y * x.cast("decimal(18,2)")).as("sxy"))
        .select(
          round((col("n") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")), 6)
            .as("slope"),
          round((col("sy").cast("double")
            - ((col("n") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
              / (col("n") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double")))
              * col("sx").cast("double")) / col("n"), 4)
            .as("intercept"),
          round(pow(col("n") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"), 2)
            / ((col("n") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              * (col("n") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))), 6)
            .as("r2"))
    }),

    // ANALYZE-TABLE-style column profile: one aggregation pass emits
    // per-column (nulls, distinct, min, max) rows — the data-card /
    // profiling operator every ingest pipeline runs first. Exact
    // distincts here (one Expand-aggregate); at 100 TB the same shape
    // swaps in approx_count_distinct (the HLL sketch is spec'd in
    // SketchSpec) without changing the plan class.
    "q_column_profile" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val one = o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("status_nulls"),
        countDistinct(col("o_orderstatus")).as("status_distinct"),
        min("o_orderstatus").as("status_min"), max("o_orderstatus").as("status_max"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("price_nulls"),
        countDistinct(col("o_totalprice")).as("price_distinct"),
        round(min("o_totalprice"), 4).as("price_min"),
        round(max("o_totalprice"), 4).as("price_max"),
        countDistinct(col("o_custkey")).as("cust_distinct"))
      one
    }),

    // Equi-width histogram (width_bucket semantics): fixed [lo, hi)
    // domain split into nb buckets, one scan-side bucket-id projection +
    // one low-cardinality aggregation — the profiling histogram that
    // never shuffles more than nb rows per partition.
    "q_value_histogram" -> ((s, dir) => {
      val (lo, hi, nb) = (0.0, 600000.0, 12)
      val w = (hi - lo) / nb
      tbl(s, dir, "orders")
        .select(least(greatest(floor((col("o_totalprice") - lo) / w), lit(0.0)),
          lit((nb - 1).toDouble)).cast("int").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  round(sum(l_quantity), 4) AS sum_qty,
         |  round(sum(l_extendedprice::DECIMAL(18,2)), 4)::DOUBLE AS sum_base_price,
         |  round(sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(4,2))), 4)::DOUBLE AS sum_disc_price,
         |  round(sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(4,2)) * (1 + l_tax::DECIMAL(4,2))), 4)::DOUBLE AS sum_charge,
         |  round(avg(l_quantity), 6) AS avg_qty,
         |  round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*), 6) AS avg_price,
         |  round(sum(l_discount::DECIMAL(4,2))::DOUBLE / count(*), 6) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_top_revenue_orders" ->
      s"""SELECT o_orderkey,
         |  round(sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(4,2))), 4)::DOUBLE AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderdate < TIMESTAMP '$Cutoff' AND l_shipdate > TIMESTAMP '$Cutoff'
         |GROUP BY o_orderkey
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_region_revenue" ->
      """SELECT r_name,
        |  round(sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(4,2))), 4)::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin,

    "q_semi_join_customers" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_anti_join_customers" ->
      """SELECT count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_rollup_counts" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_salted_top_orders" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    round(o_totalprice, 2) AS o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 5
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,

    "q_csv_roundtrip" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity::BIGINT)::BIGINT AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_quartile_stats" ->
      """SELECT l_returnflag, quartile, count(*) AS n,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM (
        |  SELECT l_returnflag, l_quantity,
        |    ntile(4) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS quartile
        |  FROM lineitem
        |)
        |GROUP BY l_returnflag, quartile
        |ORDER BY l_returnflag, quartile""".stripMargin,

    "q_small_qty_revenue" ->
      """WITH a AS (
        |  SELECT l_partkey AS p_key,
        |         avg(l_quantity::DOUBLE) * 0.2 AS qty_cut
        |  FROM lineitem GROUP BY l_partkey
        |)
        |SELECT count(*) AS n_items,
        |  round(sum(l_extendedprice::DECIMAL(18,2)
        |            * (1.00 - l_discount::DECIMAL(4,2)))::DOUBLE / 7.0, 4)
        |    AS avg_yearly
        |FROM lineitem JOIN a ON l_partkey = p_key
        |WHERE l_quantity < qty_cut""".stripMargin,

    "q_grouping_sets" ->
      """SELECT grouping(l_returnflag, l_linestatus) AS gid,
        |  l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_union_suppkeys" ->
      """SELECT DISTINCT suppkey FROM (
        |  SELECT l_suppkey AS suppkey FROM lineitem
        |  UNION ALL
        |  SELECT s_suppkey AS suppkey FROM supplier
        |) ORDER BY suppkey""".stripMargin,

    "q_exists_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_cube_counts" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_intersect_custkeys" ->
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,

    "q_except_custkeys" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,

    "q_quantity_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_promo_revenue" ->
      """SELECT round(
        |  100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
        |                   THEN l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(4,2))
        |                   ELSE 0::DECIMAL(18,4) END)::DOUBLE
        |  / sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(4,2)))::DOUBLE, 6) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,

    "q_quantity_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(l_quantity::BIGINT) AS s1,
        |    sum(l_quantity::BIGINT * l_quantity::BIGINT) AS s2,
        |    sum(l_quantity::BIGINT * l_quantity::BIGINT * l_quantity::BIGINT) AS s3
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n, s1::BIGINT AS s1, s2::BIGINT AS s2, s3::BIGINT AS s3,
        |  round(s1::DOUBLE / n, 6) AS mean,
        |  round(s2::DOUBLE / n - pow(s1::DOUBLE / n, 2), 6) AS variance
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_qty_price_corr" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    sum(l_quantity::BIGINT) AS sx,
        |    sum(l_quantity::BIGINT * l_quantity::BIGINT) AS sxx,
        |    sum(l_extendedprice::DECIMAL(18,2)) AS sy,
        |    sum(l_extendedprice::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2)) AS syy,
        |    sum(l_extendedprice::DECIMAL(18,2) * l_quantity::BIGINT) AS sxy
        |  FROM lineitem
        |)
        |SELECT round(
        |  (n * sxy::DOUBLE - sx * sy::DOUBLE)
        |  / sqrt((n * sxx::DOUBLE - sx::DOUBLE * sx)
        |       * (n * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
        |  AS corr_qty_price
        |FROM m""".stripMargin,

    "q_salted_supplier_qty" ->
      """SELECT l_suppkey, sum(l_quantity::BIGINT)::BIGINT AS sum_qty
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q_pivot_segment_status" ->
      """SELECT c_mktsegment,
        |  count(*) FILTER (o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (o_orderstatus = 'P') AS "P"
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // DuckDB's native regression aggregates against the power-sum form —
    // a genuinely independent second derivation, not a mirrored formula.
    "q_ols_qty_revenue" ->
      """WITH b AS (
        |  SELECT l_quantity::BIGINT::DOUBLE AS x,
        |         (l_extendedprice::DECIMAL(18,2)
        |          * (1.00 - l_discount::DECIMAL(4,2)))::DOUBLE AS y
        |  FROM lineitem
        |)
        |SELECT round(regr_slope(y, x), 6) AS slope,
        |  round(regr_intercept(y, x), 4) AS intercept,
        |  round(regr_r2(y, x), 6) AS r2
        |FROM b""".stripMargin,

    "q_column_profile" ->
      """SELECT count(*) AS n_rows,
        |  count(*) FILTER (o_orderstatus IS NULL) AS status_nulls,
        |  count(DISTINCT o_orderstatus) AS status_distinct,
        |  min(o_orderstatus) AS status_min, max(o_orderstatus) AS status_max,
        |  count(*) FILTER (o_totalprice IS NULL) AS price_nulls,
        |  count(DISTINCT o_totalprice) AS price_distinct,
        |  round(min(o_totalprice), 4) AS price_min,
        |  round(max(o_totalprice), 4) AS price_max,
        |  count(DISTINCT o_custkey) AS cust_distinct
        |FROM orders""".stripMargin,

    "q_value_histogram" ->
      """SELECT least(greatest(floor(o_totalprice / 50000.0), 0), 11)::INT AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
