"""Classifier-evaluation tier: exact AUC / PR curve / KS statistic
for a score column against gold labels — the eval loop of a
training-data quality pipeline (is the language-ID marker score a
good detector of gold lang == 'en'?).

The shared shape is the scale-safe one for eval over N docs: ONE
fact-sized groupBy collapsing the corpus to per-distinct-score
(n, n_pos) counts, then all rank/threshold math on that model-sized
frame (distinct integer marker scores are bounded by tokens-per-doc,
~dozens; the partitionless window that follows sees those few rows,
never the fact — the same O(model) allowlist class as the sketch
tier's register tables). A naive pairwise AUC join (P·N pairs) or a
per-row global rank would be the 100 TB scale-killer here.

Exactness: every statistic reduces to integer counting —
  AUC  = (2·R_pos − ... ) via midranks: 2·midrank = 2·cum + n + 1 is
         an INTEGER, so 2·Σranks stays integer; one final divide.
  PR   = tp / (tp+fp), tp / P per distinct threshold; single divides.
  KS   = max |cdf_pos − cdf_neg| — maximized over the INTEGER
         cross-product |cum_pos·NEG − cum_neg·POS| before the one
         divide, so the argmax can't be perturbed by float rounding.
The midrank sums go through DECIMAL(38,0): at 10^12 docs
Σ p·(2·cum+n+1) ~ P·2N exceeds BIGINT and Spark's ANSI mode would
(correctly) refuse — decimal keeps the sum exact at any corpus size
(the join_size_estimate convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .text import LANG_MARKERS, tokens_col

EVAL_LANG = "en"

D38 = "decimal(38,0)"


def _score_groups(docs: DataFrame, lang: str) -> DataFrame:
    """(score, n, p): corpus collapsed to per-distinct-score counts.
    score = gold-language marker hits (the language_id 'en' score);
    p = how many of those docs are GOLD lang — the one fact-sized
    aggregation all three statistics share."""
    markers = LANG_MARKERS[lang]
    score = F.size(F.filter(tokens_col(), lambda t: t.isin(markers)))
    y = (F.col("lang") == lang).cast("long")
    return (docs
            .select(score.cast("long").alias("score"), y.alias("y"))
            .groupBy("score")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("p")))


def score_auc(docs: DataFrame, lang: str = EVAL_LANG) -> DataFrame:
    """Exact ROC-AUC of the marker score for gold lang, by the
    Mann-Whitney rank identity with midrank tie handling:
    AUC = (Σ_pos midrank − P(P+1)/2) / (P·N). Ties matter here — the
    score takes ~dozens of integer values — and midranks give the
    standard trapezoidal ROC value. One row out."""
    g = _score_groups(docs, lang)
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    c = g.withColumn("cum", F.coalesce(F.sum("n").over(w), F.lit(0)))
    # 2·Σ_pos midrank = Σ p·(2·cum + n + 1): integer, DECIMAL-summed
    s = c.agg(
        F.sum((F.col("p").cast(D38)
               * (2 * F.col("cum") + F.col("n") + 1)).cast(D38)).alias("r2"),
        F.sum("p").alias("pos"),
        F.sum(F.col("n") - F.col("p")).alias("neg"))
    return s.select(
        ((F.col("r2") - F.col("pos").cast(D38) * (F.col("pos") + 1))
         .cast("double")
         / (2 * F.col("pos").cast(D38) * F.col("neg")).cast("double"))
        .alias("auc"),
        F.col("pos").cast("long").alias("n_pos"),
        F.col("neg").cast("long").alias("n_neg"))


def pr_curve(docs: DataFrame, lang: str = EVAL_LANG) -> DataFrame:
    """Precision/recall at every distinct score threshold (predict
    positive when score >= t): the operating-point table a filter
    tuner reads. tp/fp are suffix sums over the grouped counts
    (descending score), so the curve costs nothing beyond the shared
    groupBy. One row per distinct score."""
    g = _score_groups(docs, lang)
    wd = W.orderBy(F.desc("score")).rowsBetween(W.unboundedPreceding, 0)
    tot = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (g
            .withColumn("tp", F.sum("p").over(wd))
            .withColumn("fp", F.sum(F.col("n") - F.col("p")).over(wd))
            .withColumn("_P", F.sum("p").over(tot))
            .select(F.col("score").alias("threshold"),
                    F.col("tp").cast("long").alias("tp"),
                    F.col("fp").cast("long").alias("fp"),
                    (F.col("tp").cast("double")
                     / (F.col("tp") + F.col("fp")).cast("double"))
                    .alias("precision"),
                    (F.col("tp").cast("double")
                     / F.col("_P").cast("double")).alias("recall")))


def score_ks(docs: DataFrame, lang: str = EVAL_LANG) -> DataFrame:
    """Kolmogorov-Smirnov separation of the score distributions of
    positives vs negatives: KS = max_t |cdf_pos(t) − cdf_neg(t)|.
    The max is taken over the INTEGER cross-product
    |cum_pos·NEG − cum_neg·POS| (ties on it broken by lowest
    threshold), so the selected threshold is exact — the single
    divide happens after the argmax. One row out."""
    g = _score_groups(docs, lang)
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, 0)
    tot = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = (g
         .withColumn("cp", F.sum("p").over(w))
         .withColumn("cn", F.sum(F.col("n") - F.col("p")).over(w))
         .withColumn("_P", F.sum("p").over(tot))
         .withColumn("_N", F.sum(F.col("n") - F.col("p")).over(tot)))
    d = c.select(
        "score", "_P", "_N",
        F.abs(F.col("cp").cast(D38) * F.col("_N")
              - F.col("cn").cast(D38) * F.col("_P")).alias("_num"))
    top = d.orderBy(F.desc("_num"), F.asc("score")).limit(1)
    return top.select(
        (F.col("_num").cast("double")
         / (F.col("_P").cast(D38) * F.col("_N")).cast("double")).alias("ks"),
        F.col("score").alias("at_threshold"))


def chi2_lang_source(docs: DataFrame) -> DataFrame:
    """Chi-square independence test of the lang x source contingency
    (is language mix homogeneous across sources?) plus Cramér's V —
    the corpus-audit statistic a mixing pipeline checks before
    assuming per-source language shares are exchangeable.

    Shape: ONE fact-sized groupBy to the contingency table, then all
    margin/expected math on that model-sized frame (|langs|·|sources|
    cells) via partitionless windows — the O(model) allowlist class.
    Margin products r·c go through DECIMAL(38,0) (BIGINT would
    overflow at ~10^10 docs); each cell's (o-e)^2/e term is one
    double expression, and the cell sum is DECIMAL-cast so it is
    order-insensitive and bit-identical across engines.
    """
    cont = (docs.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("o")))
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_l = W.partitionBy("lang")
    w_s = W.partitionBy("source")
    c = (cont
         .withColumn("r", F.sum("o").over(w_l))
         .withColumn("c", F.sum("o").over(w_s))
         .withColumn("t", F.sum("o").over(w_all))
         .withColumn("nl", F.size(F.collect_set("lang").over(w_all)))
         .withColumn("ns", F.size(F.collect_set("source").over(w_all))))
    e = ((F.col("r").cast(D38) * F.col("c")).cast("double")
         / F.col("t").cast("double"))
    term = ((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e)
            / e)
    s = c.agg(
        F.sum(term.cast("decimal(38,10)")).alias("chi2d"),
        F.max("t").alias("t"),
        F.max("nl").alias("nl"),
        F.max("ns").alias("ns"))
    chi2 = F.col("chi2d").cast("double")
    dof = ((F.col("nl") - 1) * (F.col("ns") - 1)).cast("long")
    denom = (F.col("t") * F.least(F.col("nl") - 1, F.col("ns") - 1))
    return s.select(
        F.round(chi2, 6).alias("chi2"),
        dof.alias("dof"),
        # degenerate contingency (single lang or single source) makes
        # the denominator 0 → NULL, deterministically on both engines
        # (unguarded it would be NaN here, engine-defined in SQL)
        F.when(denom > 0,
               F.round(F.sqrt(chi2 / denom.cast("double")), 6))
         .alias("cramers_v"),
        F.col("t").cast("long").alias("n_docs"))


def classifier_agreement(docs: DataFrame) -> DataFrame:
    """Multi-class agreement statistics of the heuristic language-ID
    against the gold `lang` column — Cohen's kappa (chance-corrected
    accuracy), macro-F1, and raw accuracy, the one-row summary on top
    of lang_id_confusion's per-cell matrix.

    All three reduce to integer counting on the model-sized confusion
    (|classes|² cells):
      accuracy = agree / T                      (one divide)
      kappa    = (agree·T − Σ_k r_k·c_k) / (T² − Σ_k r_k·c_k)
                 — numerator/denominator are exact DECIMAL(38,0)
                 integers (T ≤ 10¹² → T² ≤ 10²⁴), ONE final divide;
                 NULL when T² = Σ r·c (degenerate single-cell matrix,
                 chance agreement is 1 and kappa is undefined)
      macro-F1 = mean_k 2·tp_k / (r_k + c_k)    — per-class F1
                 simplifies to 2·diag/(row+col); each is one exact
                 divide, the mean goes through DECIMAL(38,10) (the
                 repo's order-insensitive sum rule)
    Classes = union of gold and predicted labels (absent margin = 0).
    """
    from .text import language_id
    c = (language_id(docs)
         .groupBy("lang", "lang_pred")
         .agg(F.count(F.lit(1)).alias("n")))
    rows = c.groupBy("lang").agg(F.sum("n").alias("_r")) \
            .select(F.col("lang").alias("k"), "_r")
    cols = c.groupBy("lang_pred").agg(F.sum("n").alias("_c")) \
            .select(F.col("lang_pred").alias("k"), "_c")
    diag = (c.filter(F.col("lang") == F.col("lang_pred"))
            .select(F.col("lang").alias("k"), F.col("n").alias("_tp")))
    klass = (rows.join(cols, "k", "full_outer")
             .join(diag, "k", "left")
             .select("k",
                     F.coalesce("_r", F.lit(0)).alias("_r"),
                     F.coalesce("_c", F.lit(0)).alias("_c"),
                     F.coalesce("_tp", F.lit(0)).alias("_tp")))
    f1 = ((2 * F.col("_tp")).cast("double")
          / (F.col("_r") + F.col("_c")).cast("double"))
    s = klass.agg(
        F.sum("_r").alias("_t"),
        F.sum("_tp").alias("_agree"),
        F.sum(F.col("_r").cast(D38) * F.col("_c")).cast(D38).alias("_pe"),
        F.count(F.lit(1)).alias("_nk"),
        F.sum(f1.cast("decimal(38,10)")).alias("_f1s"))
    t2 = F.col("_t").cast(D38) * F.col("_t")
    kappa = F.when(
        t2 != F.col("_pe"),
        (F.col("_agree").cast(D38) * F.col("_t") - F.col("_pe"))
        .cast("double") / (t2 - F.col("_pe")).cast("double"))
    return s.select(
        F.round(kappa, 6).alias("kappa"),
        F.round(F.col("_agree").cast("double")
                / F.col("_t").cast("double"), 6).alias("accuracy"),
        F.round(F.col("_f1s").cast("double")
                / F.col("_nk").cast("double"), 6).alias("macro_f1"),
        F.col("_nk").cast("long").alias("n_classes"),
        F.col("_t").cast("long").alias("n_docs"))


def pr_auc(docs: DataFrame, lang: str = EVAL_LANG) -> DataFrame:
    """Average precision (the PR-curve AUC under the standard step
    interpolation): AP = Σ_k (R_k − R_{k−1})·P_k over thresholds in
    descending score order. Each term is exact-integer tp/fp counts
    through two divides; the term sum is DECIMAL-cast (order-
    insensitive). One row out; same collapsed-frame shape as
    score_auc."""
    g = _score_groups(docs, lang)
    wd = W.orderBy(F.desc("score")).rowsBetween(W.unboundedPreceding, 0)
    tot = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = (g
         .withColumn("tp", F.sum("p").over(wd))
         .withColumn("fp", F.sum(F.col("n") - F.col("p")).over(wd))
         .withColumn("_P", F.sum("p").over(tot)))
    # ΔR·P = (p_k / P) · (tp_k / (tp_k + fp_k)) — p_k is this
    # threshold's positives, so Σ needs no lag()
    term = ((F.col("p").cast("double") / F.col("_P").cast("double"))
            * (F.col("tp").cast("double")
               / (F.col("tp") + F.col("fp")).cast("double")))
    return (c.agg(F.sum(term.cast("decimal(38,10)")).alias("_ap"),
                  F.max("_P").alias("pos"),
                  F.sum(F.col("n") - F.col("p")).alias("_neg"))
            .select(F.round(F.col("_ap").cast("double"), 6).alias("avg_precision"),
                    F.col("pos").cast("long").alias("n_pos"),
                    F.col("_neg").cast("long").alias("n_neg")))
