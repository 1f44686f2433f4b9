"""Round-4 cardinality probe for the substring-anchor pipeline
(common_substring_pairs / doc_containment, dedup.py): the df_cap
bounds the anchor join in THEORY; this measures the internal
cardinalities at 1x and 10x so SCALING.md carries numbers, not
assertions (the same discipline as the LSH probes).

Measured per scale:
  * anchor rows emitted (raw positional n-grams);
  * distinct n-grams, max per-gram document frequency, and the
    share of anchors dropped by SUBSTR_DF_CAP;
  * join fan-out: hit rows out of the anchor equi-join (the stage the
    cap exists to bound) and the quadratic-counterfactual fan-out the
    join WOULD have had with no cap (sum over grams of n_a*n_b);
  * output pairs, plus wall time via the noop sink.

10x corpus is the decorrelated construction from scale_probe.py
(key-shifted + consonant-rotated copies).

Usage: python tools/scale_probe_substr.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.operators import dedup as DD  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402
from scale_probe import docs_10x  # noqa: E402


def _anchors(docs: DataFrame, n: int) -> DataFrame:
    """The positional n-gram map, verbatim from common_substring_pairs
    stage 1 (kept in sync by test_plan_audit's source cross-check of
    tools/)."""
    from etl_portfolio_tracker_spark.operators.text import tokens_col
    from etl_portfolio_tracker_spark.functions.partitioning import spread
    grams_expr = F.expr(
        f"CASE WHEN size(_t) >= {n} THEN"
        f" transform(sequence(1, size(_t) - {n - 1}),"
        f"           i -> struct(i AS pos,"
        f"                       md5(concat_ws(' ', slice(_t, i, {n})))"
        f"                       AS gh))"
        f" ELSE array() END")
    return (spread(docs, "doc_id")
            .select("doc_id", tokens_col().alias("_t"))
            .select("doc_id", F.explode(grams_expr).alias("g"))
            .select("doc_id", F.col("g.pos").alias("pos"),
                    F.col("g.gh").alias("gh")))


def probe(docs: DataFrame, label: str) -> dict:
    g = _anchors(docs, DD.SUBSTR_NGRAM).persist()
    anchor_rows = g.count()
    df = (g.select("gh", "doc_id").distinct()
          .groupBy("gh").agg(F.count(F.lit(1)).alias("_df"))).persist()
    stats = df.agg(
        F.count(F.lit(1)).alias("distinct_grams"),
        F.max("_df").alias("max_df"),
        F.sum(F.when(F.col("_df") > DD.SUBSTR_DF_CAP, 1).otherwise(0))
         .alias("grams_over_cap")).collect()[0]
    kept = g.join(df.filter(F.col("_df") <= DD.SUBSTR_DF_CAP)
                  .select("gh"), "gh")
    kept_rows = kept.count()
    # join fan-out actually paid (doc_a < doc_b halves the square)
    per_doc = kept.groupBy("gh", "doc_id").agg(
        F.count(F.lit(1)).alias("np"))
    per_gram = per_doc.groupBy("gh").agg(
        F.sum("np").alias("tot"),
        F.sum(F.col("np") * F.col("np")).alias("sq"))
    fanout = per_gram.agg(
        F.sum((F.col("tot") * F.col("tot") - F.col("sq")) / 2)
         .alias("x")).collect()[0]["x"]
    # counterfactual fan-out with NO cap (what the cap saves)
    per_doc_all = g.groupBy("gh", "doc_id").agg(
        F.count(F.lit(1)).alias("np"))
    per_gram_all = per_doc_all.groupBy("gh").agg(
        F.sum("np").alias("tot"), F.sum(F.col("np") * F.col("np"))
        .alias("sq"))
    fanout_nocap = per_gram_all.agg(
        F.sum((F.col("tot") * F.col("tot") - F.col("sq")) / 2)
         .alias("x")).collect()[0]["x"]
    t0 = time.time()
    out = DD.common_substring_pairs(docs)
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    n_pairs = DD.common_substring_pairs(docs).count()
    g.unpersist(); df.unpersist()
    row = dict(label=label, anchor_rows=anchor_rows,
               distinct_grams=stats["distinct_grams"],
               max_df=stats["max_df"],
               grams_over_cap=stats["grams_over_cap"],
               kept_rows=kept_rows, join_fanout=int(fanout),
               join_fanout_nocap=int(fanout_nocap),
               pairs=n_pairs, wall_s=round(wall, 2))
    print(row, flush=True)
    return row


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    docs = read_table(spark, sf_dir, "documents").persist()
    docs.count()
    r1 = probe(docs, "1x")
    d10 = docs_10x(docs).persist()
    d10.count()
    r10 = probe(d10, "10x")
    print({"growth_wall": round(r10["wall_s"] / r1["wall_s"], 2),
           "growth_fanout": round(r10["join_fanout"]
                                  / max(r1["join_fanout"], 1), 2),
           "cap_savings_10x": round(r10["join_fanout_nocap"]
                                    / max(r10["join_fanout"], 1), 2)},
          flush=True)


if __name__ == "__main__":
    main()
