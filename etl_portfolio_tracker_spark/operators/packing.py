"""Training-sequence assembly over the documents table — the two
operations every LLM pre-training pipeline runs after dedup/filter:

  * `pack_sequences` — distribute documents into packer bins and
    concat-split them into fixed-token-budget training sequences
    (the "pack then chop" strategy: documents are streamed into a
    bin's token stream in a deterministic order and a new sequence
    starts every `budget` tokens).
  * `chunk_dedup` — intra-corpus segment-level dedup: each document
    is cut into disjoint `chunk_tokens`-token segments and only the
    globally-first occurrence of each segment survives (the
    line/paragraph-dedup analog for the harness's single-line docs).

Everything is integer arithmetic over window/group aggregations —
exact in any engine, no decimal detour needed.

Scale posture:
  * `pack_sequences` shuffles once on the bin key; each bin's window
    is an independent sorted stream, and `n_bins` scales with the
    cluster (bins are the unit of packer parallelism — 100k bins on
    a 1000-executor cluster keeps every partition
    executor-memory-sized regardless of corpus size).
  * `chunk_dedup` shuffles chunk rows once on the chunk text (the
    same single-shuffle shape as exact_dedup) and rolls back up to
    docs with a second hash shuffle on doc_id. This exact variant
    carries the chunk text through the shuffle for collision-free
    semantics; the 100 TB variant shuffles `xxhash64(chunk)` 8-byte
    keys instead and accepts the ~2⁻⁶⁴ collision rate (swap the
    window's partition key — the plan shape is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .text import _norm

PACK_BUDGET = 256     # tokens per training sequence
PACK_BINS = 8         # packer-parallelism bins (scale with cluster)
CHUNK_TOKENS = 16     # segment width for chunk-level dedup


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET,
                   n_bins: int = PACK_BINS) -> DataFrame:
    """Assign every document a (bin, seq, offset) slot in the packed
    training stream.

    bin  = doc_id % n_bins                (deterministic distribution)
    within a bin, docs are ordered (n_tokens DESC, doc_id) and laid
    head-to-tail; seq = which budget-sized window the document's
    first token lands in, offset = its position inside that window.
    """
    toks = F.split(_norm(F.col("text")), " ")
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % n_bins).cast("int").alias("bin"),
        F.size(toks).cast("bigint").alias("n_tokens"))
    w = (W.partitionBy("bin").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "bin", "doc_id", "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget).alias("seq"),
        ((cum - F.col("n_tokens")) % budget).alias("offset"))


def _chunks(docs: DataFrame, chunk_tokens: int) -> DataFrame:
    """(doc_id, pos, chunk) — disjoint `chunk_tokens`-token segments
    of the normalized token stream, in order."""
    toks = F.split(_norm(F.col("text")), " ")
    t = docs.select("doc_id", toks.alias("toks"),
                    F.ceil(F.size(toks) / chunk_tokens).alias("n_chunks"))
    seg = F.transform(
        F.sequence(F.lit(0), (F.col("n_chunks") - 1).cast("int")),
        lambda i: F.array_join(
            F.slice(F.col("toks"), i * chunk_tokens + 1, chunk_tokens), " "))
    return (t.select("doc_id", F.posexplode(seg).alias("pos", "chunk")))


def chunk_dedup(docs: DataFrame,
                chunk_tokens: int = CHUNK_TOKENS) -> DataFrame:
    """Per-doc survival stats after global segment-level dedup: the
    first occurrence of each chunk (ordered by doc_id, then position
    within the doc) is kept, every later repeat dropped.

    Returns doc_id, n_chunks, n_kept, kept_chars.
    """
    ch = _chunks(docs, chunk_tokens)
    w = W.partitionBy("chunk").orderBy("doc_id", "pos")
    flagged = ch.select(
        "doc_id", "pos", "chunk",
        (F.row_number().over(w) == 1).alias("kept"))
    return (flagged.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum(F.when(F.col("kept"), 1).otherwise(0))
                  .alias("n_kept"),
                 F.sum(F.when(F.col("kept"), F.length("chunk"))
                        .otherwise(F.lit(0))).alias("kept_chars")))


EPOCH_SEED = 17
EPOCH_BUCKETS = 64


def epoch_shuffle(docs: DataFrame, seed: int = EPOCH_SEED,
                  n_buckets: int = EPOCH_BUCKETS) -> DataFrame:
    """Deterministic global epoch shuffle — the "shuffle the corpus
    per training epoch" step, without rand() (whose draw order depends
    on partitioning, so re-runs and engines disagree).

    Global stream position of a doc = (bucket, pos): bucket = top
    hash bits mod n_buckets, pos = rank of the hash inside the
    bucket.  Readers consume bucket-major.

    Scale posture: an orderBy(hash) global sort would range-sample
    and repartition the whole corpus; hash-bucketing gets the same
    statistical shuffle with ONE hash-partition shuffle and
    embarrassingly parallel in-bucket sorts — and the hash key is
    uniform by construction, so no skew. n_buckets scales with the
    cluster (100k buckets at 100 TB keeps each sort executor-sized).
    """
    h = F.md5(F.concat(F.lit(f"epoch{seed}:"),
                       F.col("doc_id").cast("string")))
    bucket = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"),
                    F.lit(n_buckets))
    w = W.partitionBy("bucket").orderBy("h", "doc_id")
    return (docs.select("doc_id", h.alias("h"), bucket.alias("bucket"))
            .select("doc_id", "bucket",
                    (F.row_number().over(w) - 1).cast("bigint").alias("pos"))
            )


MIX_TOKEN_BUDGET = 800   # ≈ half of a demo source's token mass at sf0.01


def token_budget_mix(docs: DataFrame,
                     budget: int = MIX_TOKEN_BUDGET) -> DataFrame:
    """Curriculum / data-mixing selection: each source contributes its
    best documents until a per-source token budget is exhausted (the
    "sample each source to a target token share" step of assembling a
    pre-training mix).  "Best" here is the deterministic proxy
    (n_tokens DESC, doc_id) — swap in quality_score's rank for a real
    mix; the plan shape is identical.

    A doc is kept while the running token total (including itself)
    stays ≤ budget, so the boundary doc that would overflow is cut.
    Emits the per-source mixing report.

    Scale posture: one shuffle on source + an in-partition cumsum
    window. A single giant source serializes its own cumsum — the
    100 TB mitigation is two-pass: bucket the source by rank ranges
    (range-partition on the order key), cumsum within buckets, then
    add the tiny per-bucket offsets (O(buckets) broadcast), same as
    any distributed prefix-sum.
    """
    from .text import _norm
    toks = F.split(_norm(F.col("text")), " ")
    base = docs.select(
        "doc_id", "source", F.size(toks).cast("bigint").alias("n_tokens"))
    w = (W.partitionBy("source").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = F.sum("n_tokens").over(w)
    sel = base.select("source", "n_tokens", (cum <= budget).alias("kept"))
    return (sel.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("kept"), 1).otherwise(0))
                  .alias("n_kept"),
                 F.sum(F.when(F.col("kept"), F.col("n_tokens"))
                        .otherwise(F.lit(0))).alias("kept_tokens"))
            .orderBy("source"))


def token_budget_mix_scalable(docs: DataFrame,
                              budget: int = MIX_TOKEN_BUDGET,
                              n_parts: int | None = None) -> DataFrame:
    """token_budget_mix's giant-source-safe twin — the two-pass
    distributed prefix sum its docstring promises, as real code with
    bit-identical output.

    The simple version's cumsum window serializes each source on one
    reducer; fine for dimension-sized sources, wrong when one source
    is half the corpus. Here:

      1. range-partition on the cumsum ORDER key (source, n_tokens
         DESC, doc_id) — each partition holds a contiguous slice of
         every source's global order, bounded by partition size, not
         source size;
      2. partition-local cumsum: window keyed by (partition id,
         source) — group size ≤ partition size by construction;
      3. per-(partition, source) totals (≤ parts × sources tiny rows)
         get an exclusive prefix over partition id — the broadcast-
         sized offset table;
      4. global cumsum = local cumsum + offset, then the same budget
         cut and rollup as the simple version.

    Integer token counts make both variants exactly equal (asserted
    in tests); the plan trades the simple version's single
    skew-vulnerable window for one range exchange + one
    bounded-group window + one broadcast join. Steps 1-4 are
    `ranged_cumsum` with `group_cols=["source"]` — the shared
    factorization (also pps_sample global form,
    text.quality_quantile_cut rank form).
    """
    from .text import _norm
    toks = F.split(_norm(F.col("text")), " ")
    base = docs.select(
        "doc_id", "source", F.size(toks).cast("bigint").alias("n_tokens"))
    sel = (ranged_cumsum(base, "n_tokens",
                         [F.desc("n_tokens"), F.asc("doc_id")],
                         group_cols=["source"], n_parts=n_parts)
           .select("source", "n_tokens",
                   (F.col("_cum") <= budget).alias("kept")))
    return (sel.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("kept"), 1).otherwise(0))
                  .alias("n_kept"),
                 F.sum(F.when(F.col("kept"), F.col("n_tokens"))
                        .otherwise(F.lit(0))).alias("kept_tokens"))
            .orderBy("source"))


def ranged_cumsum(df: DataFrame, value_col: str, order_cols: list,
                  group_cols: list[str] | None = None,
                  n_parts: int | None = None) -> DataFrame:
    """Two-pass distributed prefix sum — the scalable replacement for
    a global (or giant-group) `W.orderBy(...)` window, which funnels
    every row of the order domain through ONE task regardless of
    cluster size (Spark warns `WindowExec: No Partition Defined`).

      1. range-partition on (group keys, order key): each partition
         holds a contiguous slice of every group's order, bounded by
         partition size, not group size;
      2. partition-local inclusive cumsum keyed by (partition, group)
         — bounded-group window;
      3. per-(partition, group) totals get an exclusive prefix over
         partition id — an O(parts × groups) window on a
         broadcast-sized frame;
      4. global cumsum = local cumsum + partition offset.

    Integer/decimal value columns make the result bit-identical to
    the single-window form. With `group_cols` this is the per-key
    form (token_budget_mix_scalable, quality_quantile_cut); without,
    the global form (pps_sample). The windowed frame is
    iter_checkpoint'ed: both the totals aggregate and the final join
    consume it, and without the boundary the range exchange + window
    would execute twice per action.
    Returns `df` plus `_cum` (inclusive cumulative sum of
    `value_col` per group in `order_cols` order)."""
    from ..functions.checkpoints import iter_checkpoint
    g = list(group_cols or [])
    n = n_parts or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(
                  n, *[F.asc(c) for c in g], *order_cols)
              .withColumn("_pid", F.spark_partition_id()))
    w_local = (W.partitionBy("_pid", *g).orderBy(*order_cols)
               .rowsBetween(W.unboundedPreceding, W.currentRow))
    local = iter_checkpoint(
        ranged.withColumn("_lcum", F.sum(value_col).over(w_local)),
        eager=True)
    totals = local.groupBy("_pid", *g).agg(F.sum(value_col).alias("_ptot"))
    w_off = (W.partitionBy(*g).orderBy("_pid")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    offsets = totals.select(
        "_pid", *g,
        (F.sum("_ptot").over(w_off) - F.col("_ptot")).alias("_off"))
    return (local.join(F.broadcast(offsets), ["_pid", *g])
            .withColumn("_cum", F.col("_lcum") + F.col("_off"))
            .drop("_pid", "_lcum", "_off"))


def ranged_prefix_max(df: DataFrame, value_col: str,
                      order_cols: list,
                      n_parts: int | None = None) -> DataFrame:
    """Two-pass distributed EXCLUSIVE prefix max — the running-max
    twin of ranged_cumsum, for sweeps like the 2-D skyline where each
    row needs MAX(value) over all strictly-earlier rows of a total
    order (a bare ``max().over(W.orderBy(...).rowsBetween(…, -1))``
    plans Exchange SinglePartition over the whole input).

      1. range-partition on the order keys (contiguous slices);
      2. partition-local exclusive running max (empty frame → null);
      3. per-partition max gets an exclusive prefix over partition id
         — an O(parts) broadcast frame;
      4. prefix max = greatest(local, partition offset) — Spark's
         greatest() skips nulls, so the first partition (null offset)
         and each partition's first row (null local) fall out
         naturally, and the global first row stays null exactly like
         the single-window form.

    MAX is idempotent/merge-associative, so the two-pass result is
    identical to the single window. Returns `df` plus `_pmax`."""
    from ..functions.checkpoints import iter_checkpoint
    n = n_parts or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(n, *order_cols)
              .withColumn("_pid", F.spark_partition_id()))
    w_local = (W.partitionBy("_pid").orderBy(*order_cols)
               .rowsBetween(W.unboundedPreceding, -1))
    local = iter_checkpoint(
        ranged.withColumn("_lmax", F.max(value_col).over(w_local)),
        eager=True)
    totals = local.groupBy("_pid").agg(F.max(value_col).alias("_ptot"))
    w_off = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.max("_ptot").over(w_off).alias("_off"))
    return (local.join(F.broadcast(offsets), "_pid")
            .withColumn("_pmax", F.greatest("_lmax", "_off"))
            .drop("_pid", "_lmax", "_off"))


PPS_SAMPLE_K = 100


def pps_sample(docs: DataFrame, k: int = PPS_SAMPLE_K) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: lay the
    corpus out on a token-count number line (cumulative sum in doc_id
    order), drop `k` equally-spaced pick points m·total/k, and emit
    each document hit at least once — long documents proportionally
    more likely, and a document longer than the stride is hit
    multiple times (n_picks is its importance-sampling multiplicity).
    This is the deterministic weighted-sampling primitive behind
    data-mixture construction; unlike Bernoulli sampleBy it needs no
    RNG, so any engine reproduces the identical sample.

    Exactness: picks-in-interval counts are pure BIGINT arithmetic by
    cross-multiplication — n_picks = ceil(cum_end·k/total) −
    ceil(cum_start·k/total), ceil(a/b) = (a + b − 1) div b — no
    rational or float ever materializes.

    Scale shape: the global prefix sum runs through ranged_cumsum —
    the two-pass range-partitioned form (partition-local cumsum +
    O(parts) offset table), NOT a partitionless window that would
    serialize the corpus through one task — plus a 1-row total
    broadcast; the pick logic is then row-local. Integer sums make
    the distributed form bit-identical to a single window."""
    n_tok = F.size(F.split(_norm(F.col("text")), " ")).cast("long")
    base = docs.select("doc_id", n_tok.alias("n_tokens"))
    cum = (ranged_cumsum(base, "n_tokens", ["doc_id"])
           .withColumnRenamed("_cum", "cum_end")
           .withColumn("cum_start", F.col("cum_end") - F.col("n_tokens")))
    total = base.agg(F.sum("n_tokens").cast("long").alias("_total"))
    # integer `div`, never float division: cum·k can pass 2^53 at
    # corpus scale and a double quotient would misplace pick points
    picks = F.expr(
        f"((cum_end * {k} + _total - 1) div _total)"
        f" - ((cum_start * {k} + _total - 1) div _total)").cast("long")
    return (cum.crossJoin(F.broadcast(total))
            .withColumn("n_picks", picks)
            .filter(F.col("n_picks") > 0)
            .select("doc_id", "n_tokens",
                    F.col("cum_start").cast("long").alias("cum_start"),
                    "n_picks")
            .orderBy("doc_id"))


BATCH_SIZE = 32


def length_bucket_batches(docs: DataFrame,
                          batch_size: int = BATCH_SIZE,
                          n_parts: int | None = None) -> DataFrame:
    """Length-bucketed inference batching report: order documents by
    token count (desc, doc_id tie-break), cut into fixed-size
    batches, and report each batch's padding waste — the serving-side
    counterpart of pack_sequences (training packs to eliminate
    padding; inference batches same-length inputs so the per-batch
    pad-to-max cost collapses; sorted batching is the standard
    bucketing trick).

    The global rank comes from ranged_cumsum (two-pass distributed
    prefix count) — no partitionless window at any corpus size;
    batch stats are one batch-keyed aggregate with map-side partials.

    padding_waste = batch_size·max(n_tokens) − Σ n_tokens over the
    batch's actual members (the last partial batch pads to its own
    max). Returns (batch_id, n_docs, max_tokens, sum_tokens,
    padding_waste) ordered by batch_id."""
    from .text import _norm
    toks = F.split(_norm(F.col("text")), " ")
    base = (docs.select("doc_id",
                        F.size(toks).cast("bigint").alias("n_tokens"))
            .withColumn("_one", F.lit(1).cast("long")))
    ranked = ranged_cumsum(base, "_one",
                           [F.desc("n_tokens"), F.asc("doc_id")],
                           n_parts=n_parts)
    batch = F.expr(f"(_cum - 1) div {batch_size}")
    return (ranked.select(batch.alias("batch_id"), "n_tokens")
            .groupBy("batch_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.max("n_tokens").alias("max_tokens"),
                 F.sum("n_tokens").cast("long").alias("sum_tokens"))
            .select("batch_id", "n_docs", "max_tokens", "sum_tokens",
                    (F.col("n_docs") * F.col("max_tokens")
                     - F.col("sum_tokens")).cast("long")
                     .alias("padding_waste"))
            .orderBy("batch_id"))


# ---------------------------------------------------------------------------
# Round-4: overlapping-window chunking — the RAG/long-context
# preprocessing shape (_chunks above is the DISJOINT packer segmenter;
# retrieval chunking overlaps windows so no answer span straddles a
# boundary unseen).

CHUNK_WINDOW = 32   # tokens per chunk
CHUNK_STRIDE = 24   # window start step (overlap = WINDOW - STRIDE)


def doc_chunks(docs: DataFrame, window: int = CHUNK_WINDOW,
               stride: int = CHUNK_STRIDE) -> DataFrame:
    """Overlapping token-window chunking: windows of `window` tokens
    starting every `stride` tokens (trailing partial windows kept, so
    every token belongs to ≥1 chunk). Emits a content hash per chunk —
    the unit key downstream embedding/indexing stages join on.

    Row-local transform + explode: zero shuffle, fuses into the scan —
    the 1→many map shape that scales linearly. Output fan-out is
    ≈ len/stride rows per doc (window/stride ≈ 1.33× token
    duplication), the accepted overlap cost.

    Returns (doc_id, chunk_idx, chunk_start, n_chunk_tokens,
    chunk_hash) — all exact ints/md5, no float surface at all.
    """
    toks = F.split(_norm(F.col("text")), " ")
    t = docs.select("doc_id", toks.alias("_toks"))
    win = F.explode(F.transform(
        F.sequence(F.lit(1), F.size("_toks"), F.lit(stride)),
        lambda s: F.struct(
            s.alias("start"),
            F.slice("_toks", s, window).alias("w"))))
    return (t.select("doc_id", win.alias("c"))
            .select("doc_id",
                    (((F.col("c.start") - 1) / stride).cast("long"))
                    .alias("chunk_idx"),
                    F.col("c.start").cast("long").alias("chunk_start"),
                    F.size("c.w").cast("long").alias("n_chunk_tokens"),
                    F.md5(F.concat_ws(" ", "c.w")).alias("chunk_hash")))


KFOLDS = 5


def stratified_kfold(docs: DataFrame, k: int = KFOLDS) -> DataFrame:
    """Stratified k-fold assignment: within every source, documents
    are ranked by content hash (md5(text), doc_id tie-break — a
    deterministic proxy shuffle with hash_split's re-ingest
    invariance) and dealt round-robin into k folds, so each fold
    holds an EXACT 1/k slice of every source — the cross-validation
    split a data-mixture ablation needs (plain hash%k is only
    balanced in expectation; per-source skew leaks into fold
    variance).

    The per-source rank is the same distributed prefix-count shape as
    quality_quantile_cut (ranged_cumsum: range exchange + bounded
    window + broadcast offsets), so no task serializes on the largest
    source at 100 TB.

    Returns (doc_id, source, fold) — exact integers only.
    """
    base = (docs.select("doc_id", "source",
                        F.md5("text").alias("_h"))
            .withColumn("_one", F.lit(1).cast("long")))
    cum = ranged_cumsum(base, "_one", [F.asc("_h"), F.asc("doc_id")],
                        group_cols=["source"])
    return (cum.select("doc_id", "source",
                       ((F.col("_cum") - 1) % k).cast("int").alias("fold"))
            .orderBy("doc_id"))


# --- round-6 operators ------------------------------------------------

TEMP_MIX_TOKEN_BUDGET = 100_000   # tokens per training epoch in the demo


def source_temperature_mix(docs: DataFrame,
                           budget: int = TEMP_MIX_TOKEN_BUDGET) -> DataFrame:
    """Temperature-based source reweighting (T = 2, i.e. weight ∝
    n_s^(1/2)) — the multilingual/multi-source mixing rule (GPT-3 /
    XLM-R style): raising small sources' sampling share relative to
    their natural frequency without letting any source dominate. For
    each source: its natural token share, its temperature weight
    w_s = √n_s / Σ_t √n_t, the expected tokens drawn per epoch at
    `budget`, and the boost factor w_s / natural_share (>1 =
    upsampled; epochs_per_pass for small sources exceeding 1 means
    repetition — the quantity a mixing design caps).

    Exponent choice is ½ ON PURPOSE: IEEE-754 requires sqrt to be
    correctly rounded (pow(x, 0.5) is NOT guaranteed), so every
    engine computes the identical weight. Per-source √n doubles are
    cast to DECIMAL(38,10) before the cross-source total so the
    denominator is an order-insensitive exact sum.

    Scale: one map-side-combined groupBy(source) over the corpus +
    one O(sources) broadcast total — the same two-job shape at 100 TB.

    Returns (source, n_tokens, natural_share, temp_weight,
    expected_tokens, boost) ordered by source.
    """
    from .text import tokens_col
    n_tok = F.size(tokens_col()).cast("long")
    per = (docs.select("source", n_tok.alias("_t"))
           .groupBy("source")
           .agg(F.sum("_t").cast("long").alias("n_tokens")))
    sq = F.sqrt(F.col("n_tokens").cast("double")).cast("decimal(38,10)")
    tot = per.agg(F.sum("n_tokens").cast("long").alias("_n"),
                  F.sum(sq).alias("_sq"))
    w = (sq.cast("double") / F.col("_sq").cast("double"))
    return (per.crossJoin(F.broadcast(tot))
            .select(
                "source", "n_tokens",
                F.round(F.col("n_tokens").cast("double")
                        / F.col("_n").cast("double"), 6)
                 .alias("natural_share"),
                F.round(w, 6).alias("temp_weight"),
                F.round(w * budget, 2).alias("expected_tokens"),
                F.round(w / (F.col("n_tokens").cast("double")
                             / F.col("_n").cast("double")), 6)
                 .alias("boost"))
            .orderBy("source"))
