"""Second tranche of warehouse join/aggregate shapes (TPC-H Q7, Q9,
Q10, Q13, Q14, Q15, Q18, Q19, Q22 analogs over the harness star
schema) — the join-family coverage headline.py starts: dual-aliased
dimension joins, outer-join histograms, conditional-sum ratios,
scalar-subquery maxima, disjunctive pushdown, and anti-join +
scalar-threshold selection.

Same scale rules as headline.py: dimensions broadcast, facts shuffle
once, every emitted sum goes through DECIMAL(38,10) (dsum) so partial
aggregation order can't move a hash bit, and threshold comparisons
use division-free exact forms where an engine's float `avg` could
flip a boundary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..derive import DEC, dsum
from ..io import read_table

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue shipped from a
    supplier nation to a (different) customer nation per year. The
    nation dim joins TWICE under different aliases; both instances
    broadcast, so the only shuffle is lineitem ⋈ orders on orderkey
    plus the final aggregate."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01")))
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    cust = read_table(spark, sf_dir, "customer")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.round(dsum(_rev()), 2).cast("double").alias("revenue"),
                 F.count("*").alias("n_items"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


def supplier_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year. The
    harness has no partsupp, so supply cost is proxied by
    p_retailprice · l_quantity · 0.6 — the join topology (two fact
    shuffles, part + supplier + nation broadcasts) is what Q9
    exercises, not the cost constant."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * F.col("l_quantity") * 0.6)
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("l_shipdate").cast("long").alias("o_year"))
            .agg(F.round(dsum(profit), 2).cast("double").alias("profit"))
            .orderBy("nation", "o_year"))


def returned_revenue(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returns
    (l_returnflag = 'R') in a quarter. The returnflag + date filters
    push to the scans; customer and nation broadcast; top-k is
    TakeOrderedAndProject."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01")))
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.round(dsum(_rev()), 2).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(k))


def cust_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer —
    the one shape that NEEDS an outer join (customers with zero orders
    must appear in the 0 bucket). Left join preserves them as null
    orderkeys; count(o_orderkey) skips nulls; the second aggregate
    histograms the counts."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share per year — conditional-sum
    ratio over a broadcast part join. Numerator and denominator are
    exact decimal sums; ONE final IEEE division + round(6) keeps the
    ratio portable across engines."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    # share = exact-decimal sums cast to double, ONE IEEE multiply +
    # divide (decimal division scale/rounding rules differ per engine)
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy(F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.round(dsum(promo).cast("double") * 100
                         / dsum(_rev()).cast("double"), 6)
                 .alias("promo_share"),
                 F.round(dsum(_rev()), 2).cast("double").alias("revenue"))
            .orderBy("l_year"))


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a
    quarter. The scalar-subquery max becomes a 1-row broadcast
    cross-join; equality ties are exact because both sides are the
    same rounded DECIMAL (comparing engine-computed doubles here would
    be hash-roulette)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01")))
    supp = read_table(spark, sf_dir, "supplier")
    per_supp = (li.groupBy("l_suppkey")
                .agg(F.round(dsum(_rev()), 2).alias("_rev")))
    mx = per_supp.agg(F.max("_rev").alias("_mx"))
    return (per_supp.join(F.broadcast(mx), per_supp._rev == mx._mx)
            .join(F.broadcast(supp), per_supp.l_suppkey == supp.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.col("_rev").cast("double").alias("total_revenue"))
            .orderBy("s_suppkey"))


def big_orders(spark: SparkSession, sf_dir: str, threshold: float = 100.0,
               k: int = 100) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — orders whose lineitems
    sum past a quantity threshold, joined back to customer + order
    attributes. The HAVING runs on the exact decimal sum (a double
    sum's order-dependent last ulp could flip threshold-boundary
    orders between engines)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(dsum(F.col("l_quantity")).alias("_sq"))
           .filter(F.col("_sq") > threshold))
    return (orders.join(big, orders.o_orderkey == big.l_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .select("c_name", "c_custkey", "o_orderkey",
                    F.to_date("o_orderdate").alias("o_orderdate"),
                    "o_totalprice",
                    F.col("_sq").cast("double").alias("sum_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(k))


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions over a part ⋈ lineitem
    broadcast join — brand × size-band × quantity-band alternatives.
    Catalyst extracts the common l_quantity bounds as a pushed-down
    range on the fact scan; the full disjunction evaluates post-join
    in codegen."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#20") & sz.between(1, 50) & q.between(20, 30)))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .filter(cond)
            .agg(F.round(dsum(_rev()), 2).cast("double").alias("revenue"),
                 F.count("*").alias("n_items")))


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and NO recent orders (none since 2000-01-01 — Q22's "no orders in
    7 years" window, sized so the result is non-empty at harness SFs)
    — scalar aggregate subquery (broadcast 1-row cross join) + anti
    join on the date-filtered fact, per nation. The threshold compare
    is the division-free exact form  bal · n_pos > sum_pos  over
    integer CENTS (balances are 2dp; ROUND(bal·100) is the same double
    op in both engines); an engine-computed float avg differs in the
    last ulp and flips boundary customers."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") >= F.lit("2000-01-01"))
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = (cust.filter(F.col("c_acctbal") > 0.0)
           .agg(F.sum(cents).alias("_sum_pos"),
                F.count("*").alias("_n_pos")))
    return (cust.crossJoin(F.broadcast(pos))
            .filter(cents * F.col("_n_pos") > F.col("_sum_pos"))
            .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("numcust"),
                 F.round(dsum(F.col("c_acctbal")), 2).cast("double")
                  .alias("totacctbal"))
            .orderBy("c_nationkey"))


def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median of o_totalprice per order priority — the
    row_number formulation ((n+1)//2 and (n+2)//2 picked, averaged),
    which is engine-portable where percentile()/quantile_cont
    interpolation rules are not. One shuffle for the per-key sort;
    the average of the two middles goes through the decimal-sum rule.
    """
    o = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice",
                                                 "o_orderkey")
    ranked = o.select(
        "o_orderpriority", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            W.partitionBy("o_orderpriority")).alias("cnt"))
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("cnt") + 1) / 2)) |
        (F.col("rn") == F.floor((F.col("cnt") + 2) / 2)))
    return (mid.groupBy("o_orderpriority")
            .agg((F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
                  / F.count(F.lit(1))).alias("median_value"),
                 F.max("cnt").alias("n_orders"))
            .orderBy("o_orderpriority"))


def returned_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders that have AT LEAST ONE returned line
    (EXISTS semi-join on the fact), counted per priority. The harness
    lineitem has no commit/receipt dates, so `l_returnflag = 'R'`
    stands in for Q4's lateness predicate — the plan shape (filtered
    fact semi-join into the order dimension, then a tiny rollup) is
    identical.

    Scale: the returned-lines side is filtered BEFORE the semi-join
    (predicate pushes to the scan); LeftSemi hash join keeps only
    order keys — no row multiplication regardless of lines per order."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (orders.join(returned,
                        orders.o_orderkey == returned.l_orderkey,
                        "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .orderBy("o_orderpriority"))


MARKET_REGION = "ASIA"
MARKET_NATION = "NATION_2"


def market_share(spark: SparkSession, sf_dir: str,
                 region: str = MARKET_REGION,
                 nation: str = MARKET_NATION) -> DataFrame:
    """TPC-H Q8 shape: per order-year, the focus nation's share of
    revenue from customers in one region — a conditional-sum ratio
    over a 4-way dim join.

    Scale: region/nation/customer broadcast onto the fact exactly
    once; numerator and denominator come from the SAME aggregation
    pass (two conditional decimal sums), so the fact is scanned and
    shuffled once. The share is one double division of two
    exactly-summed decimals, rounded to 6dp."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nat = read_table(spark, sf_dir, "nation")
    reg = read_table(spark, sf_dir, "region")
    dims = (cust.join(F.broadcast(nat),
                      cust.c_nationkey == nat.n_nationkey)
            .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
            .filter(F.col("r_name") == region)
            .select("c_custkey", "n_name"))
    rev = _rev()
    joined = (li.join(orders.select("o_orderkey", "o_custkey",
                                    "o_orderdate"),
                      li.l_orderkey == F.col("o_orderkey"))
              .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
              .select(F.year("o_orderdate").alias("o_year"),
                      F.col("n_name"), rev.alias("_rev")))
    num = dsum(F.when(F.col("n_name") == nation, F.col("_rev"))
                .otherwise(F.lit(0.0)))
    den = dsum(F.col("_rev"))
    return (joined.groupBy("o_year")
            .agg(F.round((num.cast("double") / den.cast("double")), 6)
                 .alias("mkt_share"),
                 F.round(den, 2).cast("double").alias("total_revenue"))
            .orderBy("o_year"))


KEY_PART_SHARE_BP = 7    # basis points of total revenue (0.07%)


def key_parts(spark: SparkSession, sf_dir: str,
              share_bp: int = KEY_PART_SHARE_BP) -> DataFrame:
    """TPC-H Q11 shape: parts whose total revenue exceeds a fraction
    of GLOBAL revenue — a HAVING against a scalar aggregate subquery.

    Scale + exactness: per-part revenue is one hash aggregation; the
    global total re-aggregates the per-part partials (never a second
    fact scan) and broadcasts as a 1-row frame. The threshold compare
    is division-free integer-scaled decimal (rev · 10000 > total · bp)
    — a float share at the boundary could flip a row between engines."""
    li = read_table(spark, sf_dir, "lineitem")
    per_part = (li.groupBy("l_partkey")
                .agg(dsum(_rev()).alias("_rev")))
    total = per_part.agg(F.sum("_rev").cast(DEC).alias("_total"))
    return (per_part.crossJoin(F.broadcast(total))
            .filter(F.col("_rev") * 10000 > F.col("_total") * share_bp)
            .select("l_partkey",
                    F.round("_rev", 2).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_partkey")))


CHEAPEST_MAX_PARTKEY = 50


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str,
                               max_partkey: int = CHEAPEST_MAX_PARTKEY
                               ) -> DataFrame:
    """TPC-H Q2 shape: for each part (bounded subset), the supplier
    offering the minimum unit price, with supplier/nation attributes —
    groupwise-min + join-back, without a partsupp table (lineitem is
    the part↔supplier bridge; unit price = extendedprice/quantity).

    Determinism: the unit price is one IEEE division of identical
    doubles in any engine; ties (same price from two suppliers) break
    on (s_suppkey, l_orderkey, l_linenumber). row_number — not a
    min-join — so exactly one row per part survives.

    Scale: the part-key bound prunes the fact scan; the window
    partitions by part key (the natural shuffle key); supplier and
    nation broadcast onto the ≤|parts| winners."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    w = W.partitionBy("l_partkey").orderBy(
        F.asc("unit_price"), F.asc("l_suppkey"),
        F.asc("l_orderkey"), F.asc("l_linenumber"))
    best = (li.filter(F.col("l_partkey") <= max_partkey)
            .select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber",
                    unit)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    return (best.join(F.broadcast(supp),
                      best.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
            .select("l_partkey", "s_name", "n_name",
                    F.round("unit_price", 6).alias("unit_price"))
            .orderBy("l_partkey"))


def customer_spend_percentile(spark: SparkSession, sf_dir: str,
                              k: int = 25) -> DataFrame:
    """Distribution-rank window family: percent_rank + cume_dist of
    per-customer total spend (top-k emitted).

    Scale note (round-6 rewrite): customers scale WITH the fact
    (TPC-H: SF×150k; billions at 100 TB), so the round-5 form —
    ``percent_rank().over(W.orderBy(...))`` with no partition key —
    planned ``Exchange SinglePartition`` over the whole per-customer
    aggregate. The rewrite computes the exact global rank with the
    two-pass range-partitioned prefix sum (packing.ranged_cumsum),
    then pct_rank = (rank−1)/(N−1) and cume_dist = rank/N directly:
    the order (spend, o_custkey) is unique, so every row is its own
    peer group and rank == row_number — identical values to the
    window form, verified against DuckDB's native percent_rank /
    cume_dist oracle; plan pinned SinglePartition-free.

    Exactness: ranks are BIGINT prefix counts over exactly-summed
    decimal totals; both ratios are integer-in-double divisions —
    bit-identical cross-engine."""
    from .packing import ranged_cumsum
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    spend = (li.join(orders.select("o_orderkey", "o_custkey"),
                     li.l_orderkey == F.col("o_orderkey"))
             .groupBy("o_custkey")
             .agg(dsum(_rev()).alias("_spend"))
             .withColumn("_one", F.lit(1).cast("long")))
    ranked = (ranged_cumsum(spend, "_one",
                            [F.asc("_spend"), F.asc("o_custkey")])
              .withColumnRenamed("_cum", "_rank"))
    total = spend.agg(F.count(F.lit(1)).alias("_n"))
    return (ranked.crossJoin(F.broadcast(total))
            .select(
                "o_custkey",
                F.round("_spend", 2).cast("double").alias("spend"),
                F.round((F.col("_rank") - 1).cast("double")
                        / (F.col("_n") - 1).cast("double"), 6)
                 .alias("pct_rank"),
                F.round(F.col("_rank").cast("double")
                        / F.col("_n").cast("double"), 6).alias("cume"))
            .orderBy(F.desc("spend"), F.asc("o_custkey"))
            .limit(k))


HIGH_VOLUME_QTY = 90.0


def high_volume_part_suppliers(spark: SparkSession, sf_dir: str,
                               min_qty: float = HIGH_VOLUME_QTY
                               ) -> DataFrame:
    """TPC-H Q20 shape: suppliers that supply at least one part whose
    shipped quantity (for that part+supplier) exceeds a threshold —
    an aggregate-filtered inner subquery driving a semi-join into the
    supplier dimension.

    Scale: the (part, supplier) aggregate is one fact shuffle on the
    composite key; the HAVING prunes it to the qualifying bridge rows;
    the semi-join ships only distinct supplier keys."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    # decimal sum: a float SUM(l_quantity) is partial-order-sensitive
    # and could flip a boundary bridge row between engines
    qualifying = (li.groupBy("l_partkey", "l_suppkey")
                  .agg(dsum(F.col("l_quantity")).alias("_qty"))
                  .filter(F.col("_qty") > min_qty)
                  .select("l_suppkey"))
    return (supp.join(qualifying,
                      supp.s_suppkey == qualifying.l_suppkey, "left_semi")
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
            .select("s_suppkey", "s_name", "n_name")
            .orderBy("s_suppkey"))


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC / SCD change capture: full-outer diff of two dimension
    snapshots typed as inserted / deleted / changed / unchanged — the
    daily job that feeds slowly-changing-dimension history.

    The harness ships one snapshot, so v2 is derived deterministically
    from v1 (drop custkey % 17 == 0, re-balance custkey % 5 == 0) —
    the DIFF operator under test is snapshot-agnostic.

    Scale: one full-outer hash join on the key and a row-local CASE.
    At 100 TB both sides are key-partitioned snapshots; with change
    fractions small, the production variant anti-joins a change-log
    instead of full-outer-joining full snapshots — the emitted rows
    and types are identical.
    """
    v1 = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal")
    v2 = (v1.filter(F.col("c_custkey") % 17 != 0)
          .select("c_custkey", "c_name",
                  F.when(F.col("c_custkey") % 5 == 0,
                         F.round(F.col("c_acctbal") + 100.0, 2))
                   .otherwise(F.col("c_acctbal")).alias("c_acctbal")))
    a = v1.select(F.col("c_custkey").alias("key"),
                  F.col("c_acctbal").alias("bal_v1"))
    b = v2.select(F.col("c_custkey").alias("key"),
                  F.col("c_acctbal").alias("bal_v2"))
    diff = a.join(b, "key", "full_outer")
    change = (F.when(F.col("bal_v1").isNull(), F.lit("inserted"))
               .when(F.col("bal_v2").isNull(), F.lit("deleted"))
               .when(F.col("bal_v1") != F.col("bal_v2"), F.lit("changed"))
               .otherwise(F.lit("unchanged")))
    return (diff.select("key", "bal_v1", "bal_v2",
                        change.alias("change_type"))
            .filter(F.col("change_type") != "unchanged")
            .orderBy("key"))


BASKET_MIN_SUPPORT = 3


def market_basket(spark: SparkSession, sf_dir: str,
                  min_support: int = BASKET_MIN_SUPPORT) -> DataFrame:
    """Market-basket affinity: part pairs co-occurring in the same
    order with support ≥ threshold — the co-purchase signal behind
    "frequently bought together".

    Scale shape (r10 rewrite, guide §2.4 — remove shuffles outright):
    ONE groupBy(l_orderkey) collects each basket's distinct parts as
    a sorted array (collect_set dedups, so the upstream distinct
    shuffle is gone too) and the a < b pairs are generated IN-ROW
    from the sorted array — the r9 form's within-order self-join
    (a second shuffle of the distinct frame plus a checkpoint job)
    produced exactly these rows. Pair volume is still Σ|basket|²,
    bounded by basket size; the pair aggregate keeps its map-side
    combine. Plan: 4 → 2 data exchanges (basket key + pair key)."""
    li = read_table(spark, sf_dir, "lineitem")
    baskets = (li.groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("l_partkey")).alias("_ps")))
    pairs = F.explode(F.expr(
        "flatten(transform(_ps, (x, i) -> "
        "transform(slice(_ps, i + 2, size(_ps) - i - 1), "
        "y -> named_struct('part_a', x, 'part_b', y))))"))
    return (baskets.select(pairs.alias("_p"))
            .select("_p.part_a", "_p.part_b")
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= min_support)
            .orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b")))


def adamic_adar(spark: SparkSession, sf_dir: str,
                min_support: int = BASKET_MIN_SUPPORT) -> DataFrame:
    """Adamic-Adar link prediction over the order-part bipartite
    graph (Adamic & Adar 2003) — market_basket's co-count upgraded
    with common-neighbor degree weighting: a co-occurrence inside a
    small, focused order is stronger evidence than one inside a
    mega-basket,

      AA(i, j) = Σ_{orders o ⊇ {i,j}} 1 / ln |parts(o)|

    (orders with one distinct part cannot co-occur, so every degree
    in the sum is ≥ 2 and ln is strictly positive).

    Scale shape (r10 rewrite, guide §2.4 — remove shuffles outright):
    identical to market_basket — ONE groupBy(l_orderkey) collects the
    sorted distinct basket array, the degree is size(array) in-row
    (the r9 form's separate degree aggregate + join back is gone),
    and the a < b pairs are generated in-row from the sorted array
    instead of a within-order self-join of a checkpointed distinct
    frame. Pair volume Σ|basket|² bounded by basket size; one pair
    aggregate with map-side combine. Plan: 6 → 2 data exchanges.

    Exactness: deg is an INTEGER ln argument (the repo's exact-ratio
    rule), ln is DECIMAL(38,10)-roundtripped, the per-order term is
    ONE double divide 1/ln(deg) — the identical expression on the
    identical pair multiset, and pair sums are exact decimal —
    identical association on both engines; round 6 display.
    """
    li = read_table(spark, sf_dir, "lineitem")
    baskets = (li.groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("l_partkey")).alias("_ps")))
    pairs = F.explode(F.expr(
        "flatten(transform(_ps, (x, i) -> "
        "transform(slice(_ps, i + 2, size(_ps) - i - 1), "
        "y -> named_struct('part_a', x, 'part_b', y))))"))
    term = (F.lit(1.0)
            / F.log(F.col("_deg").cast("double")).cast(DEC).cast("double"))
    return (baskets.select(F.size("_ps").alias("_deg"), pairs.alias("_p"))
            .select("_p.part_a", "_p.part_b", term.cast(DEC).alias("_t"))
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("support"),
                 F.round(F.sum("_t").cast("double"), 6).alias("aa_score"))
            .filter(F.col("support") >= min_support)
            .orderBy(F.desc("aa_score"), F.asc("part_a"), F.asc("part_b")))


PARETO_TOP_K = 25


def revenue_pareto(spark: SparkSession, sf_dir: str,
                   k: int = PARETO_TOP_K) -> DataFrame:
    """Revenue-concentration (Lorenz/Pareto) curve head: customers
    ranked by spend with each prefix's cumulative share of total
    revenue — "the top N customers carry X% of revenue".

    Same bounded-window shape as vocab_coverage: the ranking cut is
    TakeOrderedAndProject over the per-customer aggregate, the
    cumulative window runs over exactly k rows, the total joins as a
    broadcast 1-row decimal aggregate (re-aggregated from the
    per-customer partials — no second fact pass)."""
    from pyspark.sql import Window as W2
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    spend = (li.join(orders.select("o_orderkey", "o_custkey"),
                     li.l_orderkey == F.col("o_orderkey"))
             .groupBy("o_custkey")
             .agg(dsum(_rev()).alias("_spend")))
    total = spend.agg(F.sum("_spend").cast(DEC).alias("_total"))
    top = (spend.orderBy(F.desc("_spend"), F.asc("o_custkey")).limit(k)
           .crossJoin(F.broadcast(total)))
    w = (W2.orderBy(F.desc("_spend"), F.asc("o_custkey"))
         .rowsBetween(W2.unboundedPreceding, W2.currentRow))
    return (top.select(
        F.row_number().over(
            W2.orderBy(F.desc("_spend"), F.asc("o_custkey"))).alias("rank"),
        F.col("o_custkey"),
        F.round("_spend", 2).cast("double").alias("spend"),
        F.round(F.sum(F.col("_spend")).over(w).cast("double")
                / F.col("_total").cast("double"), 6).alias("cum_share")))


PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def profile_table(spark: SparkSession, sf_dir: str,
                  cols: tuple = PROFILE_COLS) -> DataFrame:
    """ANALYZE-style column profile of the fact table's numeric
    columns: row count, nulls, exact NDV, min/max — the stats report
    an optimizer (or a data-quality monitor) ingests.

    ONE pass computes every column's aggregates side by side (4
    aggregates × |cols| in a single hash-free global agg with
    map-side partials), then a row-local unpivot shapes the report —
    never one scan per column. Exact NDV at 100 TB would switch to
    HLL merge (approx_stats shows the sketch path); min/max/nulls
    stay exact single-pass at any scale."""
    # r10-opt (guide §2.5): the 3 exact-NDV aggregates Expand the fact
    # stream 3× into the partial agg — heavy per-row work pinned to
    # the single local split; project to the profiled columns and
    # spread (no-op on real splits).
    from ..functions.partitioning import spread
    li = spread(read_table(spark, sf_dir, "lineitem").select(*cols))
    aggs = []
    for c in cols:
        aggs += [F.count(F.lit(1)).alias(f"{c}__n"),
                 F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                  .alias(f"{c}__nulls"),
                 F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
                 F.min(F.col(c)).cast("double").alias(f"{c}__min"),
                 F.max(F.col(c)).cast("double").alias(f"{c}__max")]
    wide = li.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(f"{c}__n").alias("n_rows"),
                 F.col(f"{c}__nulls").cast("bigint").alias("n_null"),
                 F.col(f"{c}__ndv").alias("n_distinct"),
                 F.col(f"{c}__min").alias("min_val"),
                 F.col(f"{c}__max").alias("max_val"))
        for c in cols])
    return (wide.select(F.explode(rows).alias("r")).select("r.*")
            .orderBy("column"))


FUZZY_MAX_DIST = 3


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str,
                     max_dist: int = FUZZY_MAX_DIST) -> DataFrame:
    """Blocked fuzzy matching (entity-resolution family): part-name
    pairs within edit distance `max_dist`, candidate-bounded by a
    same-brand blocking key — the classic blocking + pairwise-verify
    shape (never an unblocked all-pairs cross join). levenshtein() is
    the standard DP and engine-identical.

    Scale: pair volume is Σ|block|² like every blocked matcher, and
    the brand count is FIXED — so 10× parts meant 100× pairs under
    brand-only blocking (measured 31× wall at the 10× probe). The
    block is therefore (brand, length-bucket): bucket width
    w = max_dist+1 makes |Δlen| ≤ max_dist imply same-or-adjacent
    bucket, so side a probes buckets {b−1, b, b+1} (a 3-row explode
    of the dim-sized side) and every qualifying pair is enumerated
    EXACTLY once (its bucket offset is determined) — the
    sorted-neighborhood / length-blocking rule, results unchanged.
    Pair volume now scales with Σ|brand × len-window|², which stays
    near-linear when new parts spread over the length distribution
    (measured 22.5 s → 3.5 s at the 10× probe).

    The verify stage is pruned without changing results: (1) the
    length-difference lower bound |len(a)−len(b)| ≤ max_dist rejects
    bucket-join survivors with one subtraction before any DP runs
    (the bucket join admits |Δlen| up to 2w−1), and (2) the
    banded (thresholded) levenshtein(a, b, max_dist) abandons the DP
    as soon as every cell in a row exceeds the bound — O(max_dist·n)
    instead of O(n·m) per surviving pair (it returns −1 past the
    bound, hence the `>= 0` guard). Both prunings are exact, so the
    DuckDB oracle is unchanged.

    Parallelism: `part` is dimension-sized, so Spark broadcasts it and
    would stream the probe side in ONE task (the whole Σ|block|²
    verify on one core — measured). Round-robin-repartitioning the
    probe side to defaultParallelism fans the broadcast join (and the
    per-pair DP) across every core; the exchange is |part|-sized,
    i.e. free. Measured 11.7 s → 1.2 s at sf0.1.

    Duplicate-name factorization (exact): the DP only ever sees
    DISTINCT (brand, name) pairs — parts sharing a name collapse to
    one group row with a count, an unordered name pair (x < y)
    contributes cnt_x·cnt_y part pairs (each with partkey_a <
    partkey_b exactly once), and same-name pairs are excluded by the
    reference's name_a ≠ name_b rule anyway. The same
    count-then-multiply rule as source_overlap; entity resolution
    over catalogs is dominated by exactly this kind of repeated
    surface form."""
    w = max_dist + 1
    n = spark.sparkContext.defaultParallelism
    g = (read_table(spark, sf_dir, "part")
         .select("p_partkey", "p_brand", "p_name").distinct()
         .groupBy("p_brand", "p_name")
         .agg(F.count(F.lit(1)).alias("cnt"))
         .withColumn("_lb", (F.length("p_name") / w).cast("int")))
    a = (g.withColumn("_pb", F.explode(F.array(
            F.col("_lb") - 1, F.col("_lb"), F.col("_lb") + 1)))
         .drop("_lb").repartition(n).alias("a"))
    b = F.broadcast(g.withColumnRenamed("_lb", "_pb")).alias("b")
    return (a.join(b, ["p_brand", "_pb"])
            .filter(F.col("a.p_name") < F.col("b.p_name"))
            .filter(F.abs(F.length(F.col("a.p_name"))
                          - F.length(F.col("b.p_name"))) <= max_dist)
            .select(F.col("p_brand").alias("brand"),
                    (F.col("a.cnt") * F.col("b.cnt")).alias("_mult"),
                    F.levenshtein(F.col("a.p_name"), F.col("b.p_name"),
                                  max_dist)
                     .cast("bigint").alias("dist"))
            .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
            .groupBy("brand")
            .agg(F.sum("_mult").cast("bigint").alias("n_pairs"),
                 F.min("dist").alias("min_dist"))
            .orderBy("brand"))


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front): parts where no other part is both
    cheaper-or-equal AND larger-or-equal (minimize p_retailprice,
    maximize p_size) — the multi-criteria shortlist operator.

    Not the naive O(n²) dominance self-join: sorted by (price ASC,
    size DESC, partkey), a row is in the skyline iff its size exceeds
    the running MAX size of every earlier row — the classic
    O(n log n) 2-D sweep. Rows tying an earlier (price, size) point
    are dominated (lowest partkey keeps the point).

    Scale note (round-6 rewrite): `part` scales with SF (SF×200k —
    hundreds of millions at 100 TB), and the round-5 single
    global-order window funneled all of it through one task (caught
    by tools/single_partition_audit.py, the measured SinglePartition
    sweep). The sweep's running max is merge-associative, so it now
    runs through packing.ranged_prefix_max — range-partitioned local
    sweeps + an O(parts) broadcast offset — bit-identical to the
    single window."""
    from .packing import ranged_prefix_max
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size")
    swept = ranged_prefix_max(
        p, "p_size",
        [F.asc("p_retailprice"), F.desc("p_size"), F.asc("p_partkey")])
    return (swept
            .filter(F.col("_pmax").isNull()
                    | (F.col("p_size") > F.col("_pmax")))
            .select("p_partkey", "p_name", "p_retailprice", "p_size")
            .orderBy("p_retailprice", "p_partkey"))


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history build (gaps-and-
    islands): collapse each user's event stream into validity
    intervals of consecutive same event_type — the compaction that
    turns a change log into an SCD2 dimension (valid_from / valid_to,
    open-ended current row). The companion to snapshot_diff: that op
    CAPTURES changes between snapshots; this one MATERIALIZES the
    history table those changes feed.

    Islands via the run-id trick: flag = state != lag(state), run =
    running SUM(flag) per user — both on ONE (user_id, ts, event_id)
    window ordering, so Spark evaluates them in a single sort+window
    pass. Interval bounds are a per-run aggregate; valid_to is the
    NEXT run's valid_from (lead over the per-user run sequence — a
    second, |runs|-sized window), NULL on the current row.

    Scale: one shuffle on user_id for the window pass, then the
    per-run aggregate reuses that partitioning; the run frame is
    |state-changes| rows (≪ events). Per-user skew is bounded by
    per-user event volume — the same envelope every sessionizer here
    documents."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(F.lag("event_type").over(w).isNull()
               | (F.lag("event_type").over(w) != F.col("event_type")),
               1).otherwise(0).alias("_chg"))
    runs = flagged.withColumn(
        "run_seq", F.sum("_chg").over(
            w.rowsBetween(W.unboundedPreceding, 0)).cast("long"))
    iv = (runs.groupBy("user_id", "run_seq")
          .agg(F.first("event_type").alias("event_type"),
               F.min("ts").alias("valid_from"),
               F.count(F.lit(1)).alias("n_events")))
    w2 = W.partitionBy("user_id").orderBy("run_seq")
    return (iv.withColumn("valid_to", F.lead("valid_from").over(w2))
            .select("user_id", "run_seq", "event_type", "valid_from",
                    "valid_to", "n_events",
                    F.col("valid_to").isNull().alias("is_current"))
            .orderBy("user_id", "run_seq"))


def ship_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority: integer
    day buckets of (l_shipdate − o_orderdate), with per-priority
    counts and the exact mean latency — the fulfillment-SLA report
    shape (a date-difference derived dimension aggregated against a
    low-cardinality attribute).

    datediff is integer-exact; the mean is an exact integer sum over
    a count with ONE final IEEE division ROUNDed 6dp. One fact-fact
    shuffle (lineitem ⋈ orders on orderkey) + one small aggregate;
    the histogram key (priority, latency-week) is bounded, so the
    aggregate output is dimension-sized at any corpus scale."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    lat = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select("o_orderpriority", lat.alias("_lat"))
            .groupBy("o_orderpriority",
                     F.floor(F.col("_lat") / 7).cast("long")
                      .alias("latency_week"))
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum("_lat").cast("double")
                         / F.count(F.lit(1)), 6).alias("mean_days"))
            .orderBy("o_orderpriority", "latency_week"))


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition estimate over user event
    sequences: for every (prev_type → next_type) pair, the transition
    count and row-normalized probability — the sequence statistic
    behind next-event models and funnel anomaly detection (a
    transition whose probability shifts week-over-week is a breakage
    signal).

    One (user_id, ts, event_id) window lag produces the bigram stream
    row-locally after the single user_id shuffle; counts aggregate
    with map-side combine to a |types|² frame; the row normalizer is
    a per-prev_type window over that tiny frame. Probability = exact
    integer count ratio, ONE IEEE division ROUNDed 6dp."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    bigrams = (ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"))
        .filter(F.col("prev_type").isNotNull()))
    counts = (bigrams.groupBy("prev_type", "next_type")
              .agg(F.count(F.lit(1)).alias("n")))
    wrow = W.partitionBy("prev_type")
    return (counts
            .withColumn("row_total", F.sum("n").over(wrow))
            .select("prev_type", "next_type", "n",
                    F.round(F.col("n").cast("double")
                            / F.col("row_total"), 6).alias("p"))
            .orderBy("prev_type", "next_type"))


def order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrently-open orders per week (sweep line): an order is
    open from o_orderdate until its LAST lineitem ships; the weekly
    backlog series is the classic interval-concurrency question,
    answered without interval joins — each order emits a +1 event at
    its start week and a −1 after its end week, weekly net changes
    aggregate, and the running sum of net changes IS the open count.
    O(n) events + one bounded aggregate + one prefix sum over the
    |weeks|-sized series — never the O(weeks × orders) point-in-
    interval join.

    Exactness: all integer arithmetic. The prefix sum runs over the
    dimension-sized weekly frame (single window partition is fine at
    any corpus scale — the series length is calendar-bounded)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    span = (li.groupBy("l_orderkey")
            .agg(F.max(F.to_date("l_shipdate")).alias("_end"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .select(
                F.floor(F.datediff(F.to_date("o_orderdate"),
                                   F.lit("1992-01-01")) / 7)
                 .cast("long").alias("start_wk"),
                (F.floor(F.datediff(F.col("_end"),
                                    F.lit("1992-01-01")) / 7) + 1)
                 .cast("long").alias("end_wk")))
    deltas = (span.select(F.col("start_wk").alias("week"),
                          F.lit(1).alias("_d"))
              .unionByName(span.select(F.col("end_wk").alias("week"),
                                       F.lit(-1).alias("_d"))))
    weekly = deltas.groupBy("week").agg(
        F.sum("_d").cast("long").alias("net_change"))
    w = W.orderBy("week").rowsBetween(W.unboundedPreceding, 0)
    return (weekly
            .withColumn("open_orders",
                        F.sum("net_change").over(w).cast("long"))
            .orderBy("week"))


# --- round-5 operators ------------------------------------------------

EQUI_DEPTH_BUCKETS = 8


def equi_depth_histogram(spark: SparkSession, sf_dir: str,
                         n_buckets: int = EQUI_DEPTH_BUCKETS) -> DataFrame:
    """Equi-depth (equi-height) histogram of order values — the
    optimizer-statistics primitive (selectivity estimation buckets
    with equal row counts, per Piatetsky-Shapiro/Connell 1984):
    ntile over the TOTAL order (o_totalprice, o_orderkey — the key
    makes ties impossible, so the cut is engine-exact), then
    per-bucket count/min/max/sum.

    Scale note (round-6 rewrite): a bare ``ntile(n).over(orderBy(...))``
    has NO partition key, so Spark plans ``Exchange SinglePartition`` —
    every order row funnels through ONE task regardless of cluster
    size (verified in the round-5 executed plan; only a global
    ``df.orderBy`` range-partitions, window functions do not). The
    scale-safe form computes the exact global rank with the two-pass
    range-partitioned prefix sum (packing.ranged_cumsum: partition-
    local row-count cumsum + O(parts) broadcast offset table) and then
    assigns the IDENTICAL ntile bucket arithmetically: with N rows and
    n buckets, q = N div n, r = N mod n, the first r buckets take q+1
    rows — bucket = (rank−1) div (q+1) + 1 while rank ≤ r·(q+1), else
    r + (rank − r·(q+1) − 1) div q + 1. (o_totalprice, o_orderkey) is
    a unique order, so rank is tie-free and the cut engine-exact;
    tests pin both oracle equality vs DuckDB's native ntile and plan
    shape (no Exchange SinglePartition). The approximate one-pass path
    at 100 TB remains approx_percentile sketches (see approx_stats).
    """
    from .packing import ranged_cumsum
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select("o_totalprice", "o_orderkey",
                         F.lit(1).cast("long").alias("_one"))
    ranked = (ranged_cumsum(base, "_one",
                            [F.asc("o_totalprice"), F.asc("o_orderkey")])
              .withColumnRenamed("_cum", "_rank"))
    total = base.agg(F.count(F.lit(1)).alias("_n"))
    nb = int(n_buckets)
    # exact SQL-standard ntile from (rank, N): pure BIGINT div/mod —
    # bit-identical to the single-window form on a unique order
    bucket = F.expr(f"""
        CAST(CASE
          WHEN _rank <= (_n % {nb}) * ((_n div {nb}) + 1)
          THEN (_rank - 1) div ((_n div {nb}) + 1) + 1
          ELSE (_n % {nb})
               + ((_rank - (_n % {nb}) * ((_n div {nb}) + 1) - 1)
                  div (_n div {nb})) + 1
        END AS INT)""")
    return (ranked.crossJoin(F.broadcast(total))
            .withColumn("bucket", bucket)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.min("o_totalprice").alias("lo"),
                 F.max("o_totalprice").alias("hi"),
                 F.round(dsum(F.col("o_totalprice")), 2).cast("double")
                  .alias("bucket_value"))
            .orderBy("bucket"))


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order values: the observed first-
    significant-digit distribution vs the Benford expectation
    log10(1 + 1/d) — the classic fraud/synthetic-data screen a data-
    quality stage runs over any monetary fact column. One map + one
    9-group aggregate; the deviation column is the per-digit gap.

    Determinism: digit extraction is integer/string-exact; observed
    fractions are int/int single divides; the expectation is the
    identical ln-based expression on both engines (round-6 absorbs
    libm's 1-ulp).
    """
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1.0)
    d = F.substring(F.floor("o_totalprice").cast("long").cast("string"),
                    1, 1).cast("int")
    tot = orders.agg(F.count(F.lit(1)).alias("_tot"))
    dd = F.col("digit").cast("double")
    expected = F.log(F.lit(1.0) + F.lit(1.0) / dd) / F.log(F.lit(10.0))
    return (orders.select(d.alias("digit"))
            .groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(F.broadcast(tot))
            .select("digit",
                    F.col("n").cast("long").alias("n"),
                    F.round(F.col("n").cast("double")
                            / F.col("_tot").cast("double"), 6)
                     .alias("observed"),
                    F.round(expected, 6).alias("benford"),
                    F.round(F.col("n").cast("double")
                            / F.col("_tot").cast("double") - expected, 6)
                     .alias("deviation"))
            .orderBy("digit"))


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median of extended price per return flag —
    the weighted-quantile operator (plain median ignores that a
    100-unit line should count 100× a 1-unit line). Classic
    cumulative-weight construction: order rows by (price, orderkey,
    linenumber) within each flag, running decimal weight sum, median
    = first row whose doubled cumulative weight reaches the group
    total. All compares are exact decimals, so the selected row —
    hence the answer — is engine-exact.

    One shuffle on the flag (window sort), one broadcast of the
    3-row group totals.
    """
    li = read_table(spark, sf_dir, "lineitem")
    w = (W.partitionBy("l_returnflag")
         .orderBy("l_extendedprice", "l_orderkey", "l_linenumber"))
    cum = F.sum(F.col("l_quantity").cast(DEC)).over(w)
    tots = (li.groupBy("l_returnflag")
            .agg(dsum(F.col("l_quantity")).alias("_tot")))
    return (li.select("l_returnflag", "l_extendedprice",
                      "l_orderkey", "l_linenumber", "l_quantity")
            .withColumn("_cum", cum)
            .drop("l_quantity")
            .join(F.broadcast(tots), "l_returnflag")
            .filter(F.col("_cum") * 2 >= F.col("_tot"))
            .groupBy("l_returnflag")
            .agg(F.min("l_extendedprice").alias("weighted_median"),
                 F.round(F.min("_tot"), 2).cast("double")
                  .alias("total_qty"))
            .orderBy("l_returnflag"))


def fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan
    counts for every fact→dimension foreign key (lineitem→orders,
    lineitem→part, lineitem→supplier, orders→customer) — the
    standard post-load data-quality gate. Each check is one LEFT
    ANTI join probing a broadcast of the dimension's distinct keys;
    a healthy load reports zeros, and the query exists precisely so
    a broken load CAN'T report zeros.
    """
    li = read_table(spark, sf_dir, "lineitem")
    checks = [
        ("lineitem", "l_orderkey",
         li, read_table(spark, sf_dir, "orders").select(
             F.col("o_orderkey").alias("_k"))),
        ("lineitem", "l_partkey",
         li, read_table(spark, sf_dir, "part").select(
             F.col("p_partkey").alias("_k"))),
        ("lineitem", "l_suppkey",
         li, read_table(spark, sf_dir, "supplier").select(
             F.col("s_suppkey").alias("_k"))),
        ("orders", "o_custkey",
         read_table(spark, sf_dir, "orders"),
         read_table(spark, sf_dir, "customer").select(
             F.col("c_custkey").alias("_k"))),
    ]
    out = None
    for rel, fk, fact, dim in checks:
        orphans = (fact.join(F.broadcast(dim.distinct()),
                             fact[fk] == F.col("_k"), "left_anti")
                   .agg(F.count(F.lit(1)).alias("n_orphans")))
        rows = fact.agg(F.count(F.lit(1)).alias("n_rows"))
        one = (orphans.crossJoin(rows)
               .select(F.lit(rel).alias("relation"),
                       F.lit(fk).alias("fk"),
                       F.col("n_orphans").cast("long").alias("n_orphans"),
                       F.col("n_rows").cast("long").alias("n_rows")))
        out = one if out is None else out.unionByName(one)
    return out.orderBy("relation", "fk")


def sales_cube_gid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (returnflag, linestatus, ship year) — the
    grouping-sets surface (TPC-H Q1's dimensions, all 2³ rollup
    combinations at once; the 3-dim + GROUPING_ID big sibling of the
    2-dim `sales_cube`). Spark expands the cube into grouping sets
    inside ONE aggregate: each input row is replicated to its 8
    grouping-set keys map-side and the whole lattice shares a single
    shuffle — at 100 TB that beats 8 separate groupBys by 8× on scan
    cost alone, which is exactly why the operator exists.

    `grouping_id()` (bit i set = column i rolled up — SQL-standard
    encoding, identical in DuckDB's GROUPING()) disambiguates the
    NULL produced by rollup from a NULL in the data. Revenue goes
    through DECIMAL(38,10) so the 8-way partial-agg order can't move
    a hash bit (the module-wide dsum rule)."""
    from ..functions.partitioning import spread
    li = read_table(spark, sf_dir, "lineitem")
    # spread BEFORE the cube: Expand replicates every row to its 8
    # grouping-set keys ahead of the partial aggregate, and the
    # harness table is ONE parquet split — unspread, a single core
    # would chew the 8x row volume (measured 5.7 s -> ~1 s at sf0.1);
    # on a cluster with real splits the repartition is a no-op cost
    base = spread(li, "l_orderkey").select(
        "l_returnflag", "l_linestatus",
        F.year("l_shipdate").cast("long").alias("ship_year"),
        _rev().alias("_r"), "l_quantity")
    return (base
            .cube("l_returnflag", "l_linestatus", "ship_year")
            .agg(F.grouping_id().cast("long").alias("gid"),
                 F.round(dsum(F.col("_r")), 2).cast("double")
                  .alias("revenue"),
                 dsum(F.col("l_quantity")).cast("double").alias("sum_qty"),
                 F.count(F.lit(1)).cast("long").alias("n_rows"))
            .orderBy("gid", "l_returnflag", "l_linestatus", "ship_year"))


def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (CDC changelog apply) re-expressed as one outer
    join + union: a snapshot (even orderkeys) absorbs a deterministic
    changelog derived from the odd orderkeys — keys ≡1,3 (mod 10)
    INSERT as new rows, ≡5,7 UPDATE the even neighbor's totalprice to
    the change row's value, ≡9 DELETE the even neighbor. Each target
    key receives at most one change (the mod classes map to disjoint
    targets), so no sequencing pass is needed; a real changelog would
    first keep only the max-sequence change per key (one window).

    Scale shape: ONE orderkey hash join applies updates+deletes, the
    insert branch is a union (no join at all), and the verification
    rollup per status is the only other exchange — exactly how
    Delta/Iceberg execute MERGE under the hood (join on the merge
    key, rewrite matched rows). Emits the post-merge per-status
    audit: row count, decimal-rounded totalprice sum, applied-change
    counters."""
    od = read_table(spark, sf_dir, "orders")
    base = od.filter(F.col("o_orderkey") % 2 == 0)
    odd = od.filter(F.col("o_orderkey") % 2 == 1)
    m = F.col("o_orderkey") % 10
    changes = odd.select(
        F.when(m.isin(1, 3), F.col("o_orderkey"))
         .otherwise(F.col("o_orderkey") - 1).alias("key"),
        F.when(m.isin(1, 3), F.lit("insert"))
         .when(m.isin(5, 7), F.lit("update"))
         .otherwise(F.lit("delete")).alias("op"),
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderstatus").alias("c_status"),
        F.col("o_totalprice").alias("c_price"),
        F.col("o_orderdate").alias("c_date"),
        F.col("o_orderpriority").alias("c_priority"))
    upd_del = changes.filter(F.col("op") != "insert")
    merged = (base.join(upd_del,
                        base["o_orderkey"] == upd_del["key"], "left")
              .filter((F.col("op").isNull()) | (F.col("op") == "update"))
              .select("o_orderkey", "o_custkey",
                      "o_orderstatus",
                      F.when(F.col("op") == "update", F.col("c_price"))
                       .otherwise(F.col("o_totalprice"))
                       .alias("o_totalprice"),
                      F.when(F.col("op") == "update", 1).otherwise(0)
                       .alias("_upd"),
                      F.lit(0).alias("_ins")))
    inserted = changes.filter(F.col("op") == "insert").select(
        F.col("key").alias("o_orderkey"),
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_status").alias("o_orderstatus"),
        F.col("c_price").alias("o_totalprice"),
        F.lit(0).alias("_upd"), F.lit(1).alias("_ins"))
    return (merged.unionByName(inserted)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.round(dsum(F.col("o_totalprice")), 2).cast("double")
                  .alias("total_value"),
                 F.sum("_upd").cast("long").alias("n_updated"),
                 F.sum("_ins").cast("long").alias("n_inserted"))
            .orderBy("o_orderstatus"))


WAIT_LATE_DAYS = 60
WAIT_TOP_K = 20


def waiting_suppliers(spark: SparkSession, sf_dir: str,
                      late_days: int = WAIT_LATE_DAYS,
                      k: int = WAIT_TOP_K) -> DataFrame:
    """TPC-H Q21 analog (suppliers who kept orders waiting): count a
    supplier's LATE lineitems (shipped > late_days after the order
    date) in multi-supplier orders where it was the ONLY late
    supplier. The schema has no commit/receipt dates, so "late" is
    shipdate vs orderdate — the join/quantifier structure is Q21's.

    The classic formulation is a triple self-join of the fact
    (l1 ⋈ EXISTS l2 ⋈ NOT EXISTS l3) — three fact-fact joins. Here
    the two correlated quantifiers collapse into ONE per-order
    aggregate: n_supp >= 2 encodes EXISTS(other supplier) and
    n_late_supp = 1 encodes NOT EXISTS(other late supplier), with the
    sole late supplier and its late-row count read off the same
    aggregate — one fact join (lineitem ⋈ orders on the key both are
    naturally partitioned by) + one groupBy, instead of three fact
    shuffles. The DuckDB oracle intentionally keeps the textbook
    EXISTS/NOT-EXISTS form, so the rewrite is verified against an
    INDEPENDENT formulation. Interval arithmetic on ntz timestamps is
    session-tz-independent (the P5 convention).
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS"))
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .select("l_orderkey", "l_suppkey", late.alias("_late")))
    per = (j.groupBy("l_orderkey")
           .agg(F.count_distinct("l_suppkey").alias("_ns"),
                F.count_distinct(
                    F.when(F.col("_late"), F.col("l_suppkey"))).alias("_nls"),
                F.max(F.when(F.col("_late"), F.col("l_suppkey")))
                 .alias("_sole"),
                F.sum(F.when(F.col("_late"), 1).otherwise(0))
                 .alias("_late_rows")))
    sole = per.filter((F.col("_ns") >= 2) & (F.col("_nls") == 1))
    counts = (sole.groupBy("_sole")
              .agg(F.sum("_late_rows").cast("long").alias("numwait")))
    return (counts
            .join(F.broadcast(supp), counts._sole == supp.s_suppkey)
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(k))
