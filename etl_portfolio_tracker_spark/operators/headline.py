"""Headline analytical queries over the full TPC-H-ish star schema —
the warehouse-scale join patterns the domain queries exercise in
miniature (J3/J6 broadcast enrichment, multi-way joins, top-k).

These are the bench workhorses: each is shaped so Catalyst produces
the plan you want at 100 TB — dimension broadcasts, one fact shuffle,
partial aggregation, TakeOrderedAndProject for top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..derive import dsum
from ..io import read_table


def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 enrichment join: lineitem ⋈ part (broadcast dim) → revenue
    per brand. The dict-lookup join of the reference
    (2_Trades.py:98-105) at warehouse scale."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.round(dsum(rev), 2).cast("double").alias("revenue"),
                 F.count("*").alias("n_items"))
            .orderBy("p_brand"))


def top_customers(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H-Q3-shaped: customer ⋈ orders ⋈ lineitem, revenue per
    customer, top-k (TakeOrderedAndProject). Fact-fact join shuffles
    on orderkey; customer dim broadcasts."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("c_custkey", "c_name")
            .agg(F.round(dsum(rev), 2).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(k))


def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped snowflake join: region ⋈ nation ⋈ customer ⋈
    orders ⋈ lineitem. Three broadcast dims, one fact shuffle."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(F.round(dsum(rev), 2).cast("double").alias("revenue"))
            .orderBy("r_name", "n_name"))


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped: pure filter + aggregate — the pushdown
    showcase (every predicate reaches the parquet scan; no shuffle at
    all beyond the final 1-row combine)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (li.filter((F.to_date("l_shipdate") >= F.lit("1996-01-01"))
                      & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
                      & (F.col("l_discount").between(0.02, 0.06))
                      & (F.col("l_quantity") < 10))
            .agg(F.round(dsum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                 .cast("double").alias("revenue"),
                 F.count("*").alias("n_items")))


def shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped: fact-fact join + conditional aggregation —
    linestatus standing in for shipmode, order priority classified
    high/low (CASE-sum pattern, F1)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1) \
            .otherwise(0)
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(high).alias("high_line_count"),
                 F.sum(1 - high).alias("low_line_count"))
            .orderBy("l_linestatus"))


APPROX_RSD = 0.02        # HLL++ target relative standard deviation
# accept |approx−exact| ≤ 5·rsd·exact. The rsd is a PROBABILISTIC
# bound, not a hard HLL++ guarantee (ADVICE r8): at 3·rsd a new
# SF/corpus whose deterministic sketch lands in the ~0.3% tail would
# permanently red the hash-checked row with no code bug. 5·rsd is the
# band the original pre-graduation test used (~5.7·10⁻⁷ tail); a red
# row here means retune this tolerance (or a genuine sketch bug), not
# a query regression — tests/test_approx.py keeps the tight bounds.
APPROX_RSD_TOL = 5.0
APPROX_Q_ACC = 10_000    # percentile_approx accuracy (rank ε = 1/acc)
APPROX_Q_TOL = 10.0      # accept rank error ≤ 10/acc = 0.001


def approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ distinct, quantile sketch),
    emitted in ENGINE-AGNOSTIC form so the row is hash-checkable
    (VERDICT r7 Next-round item 1): the sketch values themselves are
    engine-specific, so the query emits the exact values (bit-equal
    cross-engine: exact distinct counts, interpolated percentile
    rounded 6dp — the stats_summary convention) plus booleans
    asserting each sketch landed inside its published guarantee
    (HLL++ within 5·rsd; percentile_approx within rank ±10/accuracy,
    checked against the exact quantiles at ranks q∓δ/q±δ).  The
    DuckDB oracle emits the same exact values and literal TRUEs — a
    sketch drifting outside its guarantee turns the row red.
    tests/test_approx.py keeps the finer-grained error-bound checks.
    At 100 TB the sketches replace exact distinct/percentile when a
    shuffle of all distinct values is unaffordable."""
    li = read_table(spark, sf_dir, "lineitem")
    d = APPROX_Q_TOL / APPROX_Q_ACC
    # one sketch buffer + one exact-sort buffer shared by all quantile
    # outputs (array form sorts once — the stats_summary measurement)
    qa = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99],
                             APPROX_Q_ACC)
    qe = F.expr(f"percentile(l_extendedprice, array("
                f"0.5, 0.95, 0.99, "
                f"{0.5 - d}, {0.5 + d}, {0.95 - d}, {0.95 + d}, "
                f"{0.99 - d}, {0.99 + d}))")
    tol = F.lit(APPROX_RSD_TOL * APPROX_RSD)
    # THREE separate 1-row aggregates crossJoined (broadcast), not one
    # agg: two exact count-distincts alongside other aggregates force
    # an Expand (input duplicated per distinct group — measured 15 s
    # at sf0.1); as standalone single-distinct aggs each runs the
    # two-level partial-distinct plan, and the quantile/sketch agg
    # keeps its own pass (~3-4 s warm, same bit-exact row).
    parts = li.agg(F.countDistinct("l_partkey").alias("exact_parts"))
    orders = li.agg(F.countDistinct("l_orderkey").alias("exact_orders"))
    agg = (li.agg(
        F.approx_count_distinct("l_partkey", rsd=APPROX_RSD).alias("_ap"),
        F.approx_count_distinct("l_orderkey", rsd=APPROX_RSD).alias("_ao"),
        qa.alias("_qa"), qe.alias("_qe"))
        .crossJoin(F.broadcast(parts))
        .crossJoin(F.broadcast(orders)))
    within = [(F.col("_qa")[i] >= F.col("_qe")[3 + 2 * i])
              & (F.col("_qa")[i] <= F.col("_qe")[4 + 2 * i])
              for i in range(3)]
    return agg.select(
        "exact_parts", "exact_orders",
        (F.abs(F.col("_ap") - F.col("exact_parts"))
         <= tol * F.col("exact_parts")).alias("parts_ok"),
        (F.abs(F.col("_ao") - F.col("exact_orders"))
         <= tol * F.col("exact_orders")).alias("orders_ok"),
        F.round(F.col("_qe")[0], 6).alias("q50_exact"),
        F.round(F.col("_qe")[1], 6).alias("q95_exact"),
        F.round(F.col("_qe")[2], 6).alias("q99_exact"),
        within[0].alias("q50_ok"), within[1].alias("q95_ok"),
        within[2].alias("q99_ok"))


def stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per returnflag: exact interpolated
    percentiles (both engines sort + linearly interpolate — verified
    bit-equal), sample stddev and correlation (rounded 6dp: Welford
    accumulation order differs across engines at ~1e-12), exact
    decimal mean."""
    # r10-opt (guide §2.5, the region_rollup precedent): percentile's
    # partial aggregate BUFFERS every value (heavy per row, unlike the
    # count/sum aggs the r9 lineitem-spread A/B rejected), and the
    # harness fact is ONE parquet split — unspread, the buffer build
    # ran on one core. Project to the three consumed columns first
    # (§2.3) so the spread exchange ships 3 of 16 columns; no-op on a
    # cluster with real splits.
    from ..functions.partitioning import spread
    li = spread(read_table(spark, sf_dir, "lineitem")
                .select("l_returnflag", "l_extendedprice", "l_quantity"))
    # One percentile buffer for all three quantiles (array form) —
    # three scalar percentile() aggs each keep their own copy of the
    # group's values; the array form sorts once (2× faster measured).
    pcts = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.9))")
    return (li.groupBy("l_returnflag").agg(
        pcts.alias("_pcts"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(dsum(F.col("l_extendedprice")).cast("double") / F.count("*"), 6)
         .alias("avg_price"))
        .select("l_returnflag",
                F.round(F.col("_pcts")[0], 6).alias("p25"),
                F.round(F.col("_pcts")[1], 6).alias("p50"),
                F.round(F.col("_pcts")[2], 6).alias("p90"),
                "sd_qty", "corr_qty_price", "avg_price")
        .orderBy("l_returnflag"))


def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP variant of the snowflake revenue query: per (region,
    nation) plus region subtotals plus grand total.

    r9-opt (guide §2.5, the sales_cube_gid precedent): the rollup
    Expands every joined row to its grouping sets ahead of the
    decimal partial aggregate, and the harness fact is ONE parquet
    split — unspread, a single core chewed the replicated rows
    (measured 2.4-2.7 s → 1.5-1.9 s at sf0.1, steal-free A/B);
    no-op on a cluster with real splits."""
    from ..functions.partitioning import spread
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = spread(read_table(spark, sf_dir, "lineitem")
                .select("l_orderkey", "l_extendedprice", "l_discount"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .rollup("r_name", "n_name")
            .agg(F.round(dsum(rev), 2).cast("double").alias("revenue")))


def user_ticker_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct string aggregation per user (collect_set →
    array_sort → join): deterministic despite set collection order."""
    from ..derive import trades
    tr = trades(spark, sf_dir)
    return (tr.groupBy("user")
            .agg(F.concat_ws(",", F.array_sort(F.collect_set("ticker")))
                 .alias("tickers"),
                 F.count_distinct("ticker").alias("n_tickers")))


def region_revenue_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q5-shaped snowflake expressed through the spark.sql API —
    same Catalyst plan as the DataFrame form (the engine exposes both
    surfaces; SURVEY §3 notes either is fine)."""
    for t in ("region", "nation", "customer", "orders", "lineitem"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(f"eng_{t}")
    return spark.sql("""
        SELECT r_name, n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue
        FROM eng_lineitem
        JOIN eng_orders ON l_orderkey = o_orderkey
        JOIN eng_customer ON o_custkey = c_custkey
        JOIN eng_nation ON c_nationkey = n_nationkey
        JOIN eng_region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """)


def stale_parts(spark: SparkSession, sf_dir: str,
                cutoff: str = "2001-06-01") -> DataFrame:
    """Anti-join shape (TPC-H Q16 family; SURVEY §2.3 notes anti only
    appears implicitly as INSERT OR IGNORE): parts with NO shipment on
    or after the cutoff, per brand. The date filter pushes to the
    lineitem scan; the anti join probes a broadcast of the filtered
    distinct partkeys."""
    part = read_table(spark, sf_dir, "part")
    li = (read_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate").cast("date") >= F.lit(cutoff).cast("date")))
    return (part.join(li, part.p_partkey == li.l_partkey, "left_anti")
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_stale"),
                 F.min("p_retailprice").alias("min_price"))
            .orderBy("p_brand"))


def urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join shape: customers with at least one 1-URGENT order,
    counted per nation. The EXISTS collapses to a left-semi hash join
    on the filtered orders — no duplicate-explosion then distinct."""
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    urgent = (read_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT"))
    return (cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_urgent_custs"))
            .orderBy("n_name"))


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    half the part's average quantity. The correlated scalar subquery
    becomes a broadcast join against the per-part aggregate, and the
    threshold is the DIVISION-FREE exact form

        2 · qty · count(part) < sum_qty(part)

    — an avg computed in floating point orders differently per engine
    and flips boundary rows; products of decimals are exact in both."""
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.col("l_quantity")).alias("_sq"),
        F.count("*").alias("_cn"))
    qty = F.col("l_quantity").cast("decimal(38,10)")
    return (li.join(F.broadcast(per_part), "l_partkey")
            .filter(qty * 2 * F.col("_cn") < F.col("_sq"))
            .agg(F.round(dsum(F.col("l_extendedprice")), 2).cast("double")
                  .alias("revenue"),
                 F.count("*").alias("n_items")))


def multi_supp_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 family: orders whose lineitems come from ≥2 distinct
    suppliers, counted per order priority. distinct-agg + HAVING +
    fact-fact join on the orderkey."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    multi = (li.groupBy("l_orderkey")
             .agg(F.count_distinct("l_suppkey").alias("_ns"))
             .filter(F.col("_ns") >= 2))
    return (orders.join(multi, orders.o_orderkey == multi.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 F.round(dsum(F.col("o_totalprice")), 2).cast("double")
                  .alias("total_value"))
            .orderBy("o_orderpriority"))


def top_parts_per_brand(spark: SparkSession, sf_dir: str,
                        k: int = 3) -> DataFrame:
    """Per-group top-k via ranking window (the explicit form of the
    J1 greatest-n-per-group pattern — SURVEY §2.5 notes row_number as
    the latest-per-key rewrite; here it is the general k>1 case):
    the k most expensive parts per brand, ties broken by partkey so
    the cut is total-ordered.

    Catalyst inserts a WindowGroupLimit below the shuffle for the
    rank<=k filter (asserted in tests/test_plan_audit.py), so each map
    task keeps only k rows per group before exchanging — the top-k
    never materializes a full per-group sort at scale."""
    from pyspark.sql.window import Window
    part = read_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"),
                                              F.asc("p_partkey"))
    return (part.select("p_brand", "p_partkey", "p_retailprice",
                        F.row_number().over(w).cast("long").alias("rnk"))
            .filter(F.col("rnk") <= k))


def order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap stats per customer: lead() over the per-customer
    order sequence (the one analytic function SURVEY §2.5 flags as
    unused in the reference), then gap aggregates.

    Plan shape: ONE shuffle total — the window partitions by
    o_custkey and the following groupBy(o_custkey) reuses that
    partitioning, so the aggregate is exchange-free. Integer day gaps
    sum exactly (no decimal needed); the mean is one IEEE division,
    round(6) — portable."""
    from pyspark.sql.window import Window
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead(F.to_date("o_orderdate")).over(w)
    gaps = (orders
            .select("o_custkey",
                    F.datediff(nxt, F.to_date("o_orderdate")).alias("gap"))
            .filter(F.col("gap").isNotNull()))
    return (gaps.groupBy("o_custkey")
            .agg(F.count("*").alias("n_gaps"),
                 F.max("gap").cast("long").alias("max_gap"),
                 F.round(F.sum("gap").cast("double") / F.count("*"), 6)
                  .alias("avg_gap")))


QTY_BANDS = [(1, "low", 0.0, 10.0), (2, "mid", 10.0, 25.0),
             (3, "high", 25.0, 100.0)]


def qty_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join — the join family SURVEY §2.3 notes is
    absent from the reference but free in Spark: lineitem banded by
    lo ≤ l_quantity < hi against a literal band dim. With an
    inequality-only condition Catalyst picks BroadcastNestedLoopJoin;
    the build side is 3 rows, so each fact row probes a constant-size
    table — linear scan, no shuffle before the aggregate. (A big-big
    range join would instead bucket both sides on range(lo, hi) —
    that shape is what IVF/LSH use elsewhere in this engine.)"""
    bands = spark.createDataFrame(
        QTY_BANDS, "band_id long, band string, lo double, hi double")
    # r10-opt (guide §2.5): the BroadcastNestedLoopJoin probes the
    # band table per ROW and feeds a decimal partial agg — heavy
    # per-row work pinned to the fact's single local split; project
    # to the 3 consumed columns and spread (no-op on real splits).
    from ..functions.partitioning import spread
    li = spread(read_table(spark, sf_dir, "lineitem")
                .select("l_quantity", "l_extendedprice", "l_discount"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(bands),
                    (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi))
            .groupBy("band")
            .agg(F.round(dsum(rev), 2).cast("double").alias("revenue"),
                 F.count("*").alias("n_items"))
            .orderBy("band"))


def nation_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile ranking window (completes the ranking family beyond
    row_number): customers bucketed into spend quartiles WITHIN their
    nation. Partitioned window — no global sort; the quartile cut is
    per-nation, which is also the shape that scales (a global ntile
    is a single-partition sort; at 100 TB use approx percentiles)."""
    from pyspark.sql.window import Window
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    spend = (orders.groupBy("o_custkey")
             .agg(F.round(dsum(F.col("o_totalprice")), 2).cast("double")
                   .alias("spend")))
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("spend"),
                                                  F.asc("o_custkey"))
    return (spend.join(F.broadcast(cust),
                       spend.o_custkey == cust.c_custkey)
            .select("o_custkey", "c_nationkey", "spend",
                    F.ntile(4).over(w).cast("long").alias("quartile")))


def ticker_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operations (absent in the reference, free in Spark):
    per-ticker classification of two user cohorts' traded tickers —
    intersect / except realized as full-outer join flags so the result
    is one deterministic relation."""
    from ..derive import trades
    tr = trades(spark, sf_dir)
    even = tr.filter(F.expr("substring(user, 2) % 2 = 0")) \
             .select("ticker").distinct()
    odd = tr.filter(F.expr("substring(user, 2) % 2 = 1")) \
            .select("ticker").distinct()
    both = even.intersect(odd).withColumn("cohort", F.lit("both"))
    only_even = even.exceptAll(odd).withColumn("cohort", F.lit("even_only"))
    only_odd = odd.exceptAll(even).withColumn("cohort", F.lit("odd_only"))
    return both.unionByName(only_even).unionByName(only_odd)
