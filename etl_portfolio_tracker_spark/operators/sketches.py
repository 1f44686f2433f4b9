"""Distributed data sketches — the mergeable-summary tier a 100 TB
pipeline runs BEFORE it can afford exact answers: cardinality
(HyperLogLog), frequency (count-min), membership (Bloom).

Why sketches at all: at 100 TB an exact COUNT(DISTINCT user) is a
full shuffle of every distinct key, an exact token frequency table is
a corpus-sized aggregation, and an exact "seen before?" probe against
yesterday's corpus is a join against yesterday's corpus. Each sketch
replaces that with O(registers)/O(d·w)/O(m bits) of state that (a)
builds in ONE pass with map-side partial aggregation, (b) MERGES
associatively (register-wise max / counter-wise sum / bit-wise or),
so executors combine partials without ever materializing the exact
structure, and (c) broadcasts to the next stage. The implementations
here keep the real distributed shape — the sketch state is built by
groupBy over (register/cell/bit) keys, never collected row-per-item —
while staying BIT-EXACT reproducible: every "random" hash is a slice
of md5 (identical in any engine), so the DuckDB oracle reproduces the
sketch, the estimate, and the measured error to the last bit. The
exact side each estimate is compared against is computed in the same
query, which is the honest form of a sketch demo: the error column is
data, not prose.

No reference-parity citation applies: the reference app computes only
exact aggregates (portfolio sums / group counts); this module is
extension surface for the LLM-curation tier, like dedup.py and
similarity.py. Algorithms: Flajolet et al. 2007 (HyperLogLog),
Cormode & Muthukrishnan 2005 (count-min), Bloom 1970.

Hash portability rule (same as dedup.py): a 32-bit unsigned hash is
the first 8 hex chars of md5, i.e. Spark
``conv(substring(md5(x),1,8),16,10)`` == DuckDB
``CAST('0x'||substr(md5(x),1,8) AS BIGINT)``. Register/cell/bit
indices are modular slices of that value; all later arithmetic is
integer or single-division double, so no engine-dependent float
accumulation exists anywhere in this file (the one float SUM, in
hll_distinct, is a sum of exact powers of two — see the proof at
_HLL_SUM_EXACT below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# ---------------------------------------------------------------------------
# shared: portable 32-bit hash
# ---------------------------------------------------------------------------


def _h32(col):
    """First 32 bits of md5 as an unsigned bigint in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# HyperLogLog cardinality
# ---------------------------------------------------------------------------

HLL_P = 6                     # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W_BITS = 32 - HLL_P       # 26-bit register payload
HLL_RHO_MAX = HLL_W_BITS + 1  # rho when the payload is all zeros
# alpha_64 · m² for the raw HLL estimate — 0.709 is Flajolet et al.
# 2007's a priori constant for m = 64 (the m ≥ 128 closed form
# 0.7213/(1+1.079/m) does not apply at this width). m = 64 keeps the
# RAW estimator in its unbiased regime (n ≳ 2.5m) at every test SF
# (n = 150 per group at sf0.01) WITHOUT the linear-counting
# small-range correction, whose ln() would be libm-dependent; the
# price is the wider ±1.04/√64 ≈ 13% error band the rel_error column
# reports. Computed ONCE in Python and embedded as the same
# shortest-round-trip literal in the SQL oracle, so both engines
# divide the identical double.
HLL_ALPHA_M2 = 0.709 * float(HLL_M * HLL_M)

# _HLL_SUM_EXACT: the register sum Σ 2^-rho is a float SUM, but every
# term is an exact power of two in [2^-27, 1] and there are ≤ m + V
# = 128 terms, so any partial sum needs ≤ 27 + 7 = 34 mantissa bits
# < 53 — IEEE addition is EXACT here regardless of combine order,
# which is what makes the estimate reproducible across engines and
# across Spark's nondeterministic partial-aggregation order.


def hll_distinct(events: DataFrame) -> DataFrame:
    """Per-event-type distinct-user cardinality: HyperLogLog estimate
    next to the exact count and the realized relative error.

    Sketch build: one narrow map derives (register, rho) per row —
    register = low 6 hash bits, rho = leading-zero count of the
    26-bit payload + 1, computed EXACTLY via length(bin(w)) (bin() is
    the minimal binary string in both Spark and DuckDB, so
    bit_length(w) = length(bin(w)) with no float log anywhere) — then
    groupBy(event_type, register).max(rho) IS the sketch: 64 rows of
    state per group, built with map-side combine, mergeable by
    register-wise max. The estimate is the classic alpha·m²/Σ2^-rho
    raw form (empty registers contribute 2^0 each); the small-range
    linear-counting correction is deliberately omitted because it
    needs ln(), whose last ulp is libm-dependent — the RAW estimator
    is pure arithmetic and therefore bit-portable, m is sized so raw
    stays in its unbiased regime at the test cardinalities (see
    HLL_ALPHA_M2), and the error column reports whatever error that
    choice costs (realized ≈ 10% at sf0.01, inside the 13% band).

    100 TB shape: state is O(groups · 64) regardless of input rows;
    the exact COUNT(DISTINCT) sits in the same query only as the
    yardstick (at real scale you run the sketch INSTEAD of it).

    Returns (event_type, m, v_zero, raw_estimate, exact_distinct,
    rel_error) ordered by event_type.
    """
    return hll_rollup(hll_registers(events),
                      events.groupBy("event_type").agg(
                          F.countDistinct("user_id")
                          .alias("exact_distinct")))


def hll_registers(events: DataFrame) -> DataFrame:
    """The sketch itself: (event_type, reg, r) register maxima. Works
    unchanged on a STREAMING DataFrame (groupBy-max is a supported
    streaming aggregation; state = the register table), which is what
    streaming_hll_replay runs — continuous cardinality with
    O(groups · 64) keyed state."""
    h = _h32(F.col("user_id").cast("string"))
    base = events.select(
        "event_type",
        (h % HLL_M).cast("int").alias("reg"),
        F.floor(h / HLL_M).cast("bigint").alias("w"))
    rho = (F.when(F.col("w") == 0, F.lit(HLL_RHO_MAX))
           .otherwise(F.lit(HLL_RHO_MAX) - F.length(F.bin(F.col("w")))))
    return (base.select("event_type", "reg", rho.cast("int").alias("rho"))
            .groupBy("event_type", "reg")
            .agg(F.max("rho").alias("r")))


def _hll_raw(regs: DataFrame, keys: list) -> DataFrame:
    """The ONE definition of the raw estimator: registers grouped by
    `keys` → (*keys, _nz, _est). Both hll_rollup and hll_set_ops
    derive their estimates here, so the arithmetic that must stay
    bit-identical to the shared DuckDB oracle has a single site."""
    # 2^-rho without libm (ADVICE r5): IEEE does not guarantee pow()
    # is correctly rounded, so 1.0 / (1L << r) instead — r <= RHO_MAX
    # = 27, the divisor is an exact BIGINT power of two, and the
    # division is exact in double on every engine.
    est = (regs.groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("_nz"),
                F.sum(F.expr("1.0 / shiftleft(1L, r)")).alias("_s")))
    # empty registers: rho = 0 → 2^0 = 1 each
    sum_inv = (F.col("_s")
               + (F.lit(HLL_M) - F.col("_nz")).cast("double"))
    return est.select(*keys, "_nz",
                      (F.lit(HLL_ALPHA_M2) / sum_inv).alias("_est"))


def hll_rollup(regs: DataFrame, exact: DataFrame) -> DataFrame:
    """Registers → estimate frame; `exact` supplies the per-group
    (event_type, exact_distinct) yardstick column."""
    est = _hll_raw(regs, ["event_type"])
    v_zero = (F.lit(HLL_M) - F.col("_nz")).cast("long")
    raw = F.col("_est")
    return (est.join(exact, "event_type")
            .select("event_type",
                    F.lit(HLL_M).cast("int").alias("m"),
                    v_zero.alias("v_zero"),
                    F.round(raw, 6).alias("raw_estimate"),
                    "exact_distinct",
                    F.round((raw - F.col("exact_distinct"))
                            / F.col("exact_distinct"), 6)
                    .alias("rel_error"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Count-min heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 4        # hash rows
CMS_W = 128      # counters per row
CMS_TOPK = 20    # probed heavy hitters


def _cms_cell(row: int, tok_col):
    """Counter column for hash row `row`: h32(row ':' token) mod W."""
    return (_h32(F.concat(F.lit(f"{row}:"), tok_col)) % CMS_W).cast("int")


def cms_heavy_hitters(docs: DataFrame, d: int = CMS_D,
                      topk: int = CMS_TOPK) -> DataFrame:
    """Count-min sketch probed at the true top-k tokens: estimate,
    true count, and the sketch's overestimate (provably ≥ 0 — CMS
    errs only upward; a negative value would be a bug, and the oracle
    would catch it).

    Sketch build: each token occurrence increments d = 4 counters
    (one per hash row) in a 4×128 grid — expressed as posexplode of
    the 4 cell ids then groupBy(row, cell).count(), i.e. ONE shuffle
    whose key space is 512 regardless of corpus size, with map-side
    combine doing almost all the work. Probe: the true top-k tokens
    (the yardstick agg) re-derive their 4 cells row-locally and join
    the 512-row counter grid (broadcast); estimate = MIN over the 4
    counters. 100 TB shape: the grid is O(d·w) mergeable state — the
    point of CMS is that the exact per-token agg becomes unaffordable
    first; here it stays in-query as the error yardstick.

    Returns (token, true_count, cms_estimate, overestimate) ordered
    by true_count desc, token.
    """
    tok = cms_tokens(docs)
    true = (tok.groupBy("token")
            .agg(F.count(F.lit(1)).alias("true_count"))
            .orderBy(F.desc("true_count"), F.asc("token"))
            .limit(topk))
    return cms_probe(cms_grid(tok, d), true, d)


def cms_tokens(docs: DataFrame) -> DataFrame:
    """Normalized whitespace token stream (empty tokens dropped)."""
    return (docs.select(F.explode(
        F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))),
                                 r"\s+", " "), " ")).alias("token"))
            .filter(F.col("token") != ""))


def cms_grid(tok: DataFrame, d: int = CMS_D) -> DataFrame:
    """The sketch itself: (hr, cell, counter) — d·w rows of state.
    Works unchanged on a STREAMING token frame (groupBy-count is a
    supported streaming aggregation; the state store IS the grid),
    which is what streaming_cms_replay runs."""
    cells = tok.select(
        "token",
        F.posexplode(F.array(*[_cms_cell(i, F.col("token"))
                               for i in range(d)])).alias("hr", "cell"))
    return (cells.groupBy("hr", "cell")
            .agg(F.count(F.lit(1)).alias("counter")))


def cms_probe(grid: DataFrame, true: DataFrame,
              d: int = CMS_D) -> DataFrame:
    """Probe the grid at `true`'s (token, true_count) rows: estimate
    = MIN over the d counters; shared by the batch and streaming
    forms so both emit the identical frame."""
    probe = true.select(
        "token", "true_count",
        F.posexplode(F.array(*[_cms_cell(i, F.col("token"))
                               for i in range(d)])).alias("hr", "cell"))
    return (probe.join(F.broadcast(grid), ["hr", "cell"])
            .groupBy("token", "true_count")
            .agg(F.min("counter").alias("cms_estimate"))
            .select("token", "true_count", "cms_estimate",
                    (F.col("cms_estimate") - F.col("true_count"))
                    .alias("overestimate"))
            .orderBy(F.desc("true_count"), F.asc("token")))


# ---------------------------------------------------------------------------
# Bloom-filter membership probe (incremental-ingest chunk dedup)
# ---------------------------------------------------------------------------

BLOOM_K = 5           # hash functions
BLOOM_BITS_PER = 16   # target bits per corpus key (→ fp ≈ 0.14% at k=5)
BLOOM_DELTA_MOD = 5   # doc_id % 5 == 4 → delta, else corpus


def _bloom_m(n: int) -> int:
    """Filter size for n corpus keys: smallest power of two ≥ 16·n
    (floor 64). max(1, ·) before bit_length: a degenerate EMPTY
    corpus would otherwise feed -1, whose bit_length diverges between
    Python (1) and a two's-complement SQL bin() (64) — the oracle
    mirrors the same GREATEST(1, ·) guard. ONE definition shared by
    the batch probe and the streaming twin, so the sizing rule cannot
    drift between the two forms gated by the same oracle."""
    return 1 << max(6, max(1, BLOOM_BITS_PER * n - 1).bit_length())


def _bloom_bits(key_col, m: int):
    """Array of the k bit positions for a chunk-md5 key."""
    return F.array(*[
        (_h32(F.concat(F.lit(f"{j}#"), key_col)) % m).cast("bigint")
        for j in range(BLOOM_K)])


def bloom_chunk_probe(docs: DataFrame) -> DataFrame:
    """Incremental-ingest membership: has this chunk of a NEW (delta)
    document been seen in the standing corpus? The Bloom filter is
    the structure that answers it without joining the corpus — at
    100 TB the corpus chunk set is the biggest table you own, but its
    filter is m bits that BROADCAST to the ingest job.

    Split: doc_id % 5 == 4 is the delta batch, the rest the corpus
    (id-based, unlike hash_split's content-based rule, precisely so
    byte-identical chunks CAN straddle the split and the probe has
    true positives to find). Chunks are packing._chunks' disjoint
    16-token segments, keyed by md5.

    Filter build: m is sized from the corpus — the smallest power of
    two ≥ 16 bits per distinct corpus chunk (integer bit_length
    arithmetic on both engines; the count is the one O(1)
    driver-state collect, same rule as the k-means codebook). The
    set-bit table (distinct bit positions, ≤ min(m, 5·n) rows) IS the
    filter in relational form — built by explode + distinct (bit-wise
    OR as set union, mergeable), broadcast to the probe join. Probe:
    a delta chunk "hits" iff ALL its k bit positions are present
    (count of matched DISTINCT positions == its distinct-position
    count, which handles within-key modular collisions). Exact
    membership (md5 anti-probe) rides along as the yardstick:
    false negatives are impossible by construction — the oracle
    equality proves it on every row — and false positives are the
    measured price of the m-bit compression.

    Returns per delta doc: (doc_id, n_chunks, n_bloom_hit,
    n_exact_dup, n_false_pos) ordered by doc_id.
    """
    from .packing import _chunks, CHUNK_TOKENS
    ch = _chunks(docs, CHUNK_TOKENS).select(
        "doc_id", F.md5("chunk").alias("cm"))
    corpus_keys = (ch.filter(F.col("doc_id") % BLOOM_DELTA_MOD != BLOOM_DELTA_MOD - 1)
                   .select("cm").distinct())
    n = corpus_keys.count()  # O(1) driver state: sizes the filter
    m = _bloom_m(n)
    bits = (corpus_keys
            .select(F.explode(_bloom_bits(F.col("cm"), m)).alias("bit"))
            .distinct())
    delta = (ch.filter(F.col("doc_id") % BLOOM_DELTA_MOD == BLOOM_DELTA_MOD - 1)
             .select("doc_id", "cm").distinct()
             .select("doc_id", "cm",
                     F.array_distinct(_bloom_bits(F.col("cm"), m)).alias("_bs")))
    probe = delta.select("doc_id", "cm",
                         F.size("_bs").alias("_need"),
                         F.explode("_bs").alias("bit"))
    hits = (probe.join(F.broadcast(bits), "bit")
            .groupBy("doc_id", "cm", "_need")
            .agg(F.count(F.lit(1)).alias("_got")))
    flagged = (delta.select("doc_id", "cm", F.size("_bs").alias("_need"))
               .join(hits.select("cm", "doc_id", "_got"), ["doc_id", "cm"],
                     "left")
               .select("doc_id", "cm",
                       (F.coalesce(F.col("_got"), F.lit(0)) == F.col("_need"))
                       .alias("bloom_hit"))
               .join(corpus_keys.select(F.col("cm"), F.lit(True).alias("_ex")),
                     "cm", "left")
               .select("doc_id", "bloom_hit",
                       F.coalesce(F.col("_ex"), F.lit(False)).alias("exact_dup")))
    one = F.count(F.lit(1))
    return (flagged.groupBy("doc_id")
            .agg(one.alias("n_chunks"),
                 F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
                 .cast("long").alias("n_bloom_hit"),
                 F.sum(F.when(F.col("exact_dup"), 1).otherwise(0))
                 .cast("long").alias("n_exact_dup"),
                 F.sum(F.when(F.col("bloom_hit") & ~F.col("exact_dup"), 1)
                       .otherwise(0)).cast("long").alias("n_false_pos"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# AMS (count-sketch) self-join size / F2 estimation
# ---------------------------------------------------------------------------

AMS_D = 5        # estimator rows (median of 5)
AMS_W = 1024     # counters per row


def join_size_estimate(lineitem: DataFrame, d: int = AMS_D,
                       w: int = AMS_W) -> DataFrame:
    """Self-join size of lineitem on l_partkey — the second frequency
    moment F2 = Σ_k n_k² — estimated by the AMS count-sketch next to
    the exact value: the cardinality a query optimizer needs BEFORE
    planning a partkey join (F2 is exactly the row count that join
    would produce, and the skew signal that says "salt this key").

    Sketch: d = 5 independent rows of w = 1024 SIGNED counters —
    counter[h(k)] += s(k) per occurrence, with bucket h(k) and sign
    s(k) drawn from disjoint bit ranges of the md5 slice (bucket =
    low 10 bits, sign = bit 10). Per row, Σ counter² is an UNBIASED
    F2 estimator (Alon-Matias-Szegedy 1996: cross terms cancel in
    expectation under the ±1 signs) with std ≈ F2·√(2/w) ≈ 4.4%;
    the median of the 5 rows tames the tail. All arithmetic is
    integer — signed counts, squares, sums — and the median is an
    explicit order statistic (rank 3 of 5, est-then-row tiebreak), so
    every engine reproduces the estimate bit-for-bit.

    Plan shape: in PRODUCTION the sketch is ONE groupBy over
    (row, bucket) on the raw occurrence stream — key space d·w = 5120
    regardless of input rows, map-side combine doing the heavy
    lifting, never the per-key agg it exists to avoid. HERE the exact
    F2 yardstick forces that per-key agg anyway, so the query builds
    the counters FROM the keyed counts (counter[h(k)] += s(k)·n_k —
    identical sums, since the per-occurrence ±1s of one key always
    share a sign), hashing |keys| rows instead of d·|rows| exploded
    occurrences (measured 5.1 s → sub-second at sf0.1; the estimate
    is bit-identical either way, and the DuckDB oracle computes the
    per-occurrence form to prove it).

    Range bound (ADVICE r5): counter squares / exact n_k² accumulate
    in BIGINT, which holds while F2 < 2^63 ≈ 9.2e18 — true up to
    ~3e9 occurrences of a single hottest key. At the 100 TB tail
    beyond that, route the Σv² / Σn² sums through DECIMAL(38,0) (the
    engine's standard widening, cf. derive.dsum) — DuckDB would
    silently widen to HUGEINT while Spark BIGINT wraps, so the cast
    must be explicit on BOTH engines before the yardstick diverges.

    Returns ONE row: (true_selfjoin, ams_estimate, overestimate,
    rel_error).
    """
    keyed = (lineitem.groupBy("l_partkey")
             .agg(F.count(F.lit(1)).alias("n")))
    hashed = keyed.select(
        "n",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("hr"),
                _h32(F.concat(F.lit(f"{i}~"),
                              F.col("l_partkey").cast("string")))
                .alias("h"))
            for i in range(d)])).alias("c")).select("n", "c.*")
    cells = hashed.select(
        "hr", (F.col("h") % w).cast("int").alias("bucket"),
        F.when(F.floor(F.col("h") / w) % 2 == 0, F.col("n"))
         .otherwise(-F.col("n")).alias("sn"))
    counters = (cells.groupBy("hr", "bucket")
                .agg(F.sum("sn").cast("long").alias("v")))
    row_est = (counters.groupBy("hr")
               .agg(F.sum(F.col("v") * F.col("v")).alias("est")))
    from pyspark.sql import Window as W
    # constant partition key: the frame is exactly d = 5 rows, so the
    # single-partition window is O(d), not a skew hazard — the
    # partitionBy(lit) only silences the global-window warning
    med = (row_est
           .withColumn("_rk", F.row_number().over(
               W.partitionBy(F.lit(0)).orderBy(F.asc("est"), F.asc("hr"))))
           .filter(F.col("_rk") == (d + 1) // 2)
           .select(F.col("est").alias("ams_estimate")))
    true = (keyed.groupBy()
            .agg(F.sum(F.col("n") * F.col("n")).alias("true_selfjoin")))
    return (true.crossJoin(F.broadcast(med))
            .select("true_selfjoin", "ams_estimate",
                    (F.col("ams_estimate") - F.col("true_selfjoin"))
                    .alias("overestimate"),
                    F.round((F.col("ams_estimate")
                             - F.col("true_selfjoin")).cast("double")
                            / F.col("true_selfjoin"), 6)
                    .alias("rel_error")))


# ---------------------------------------------------------------------------
# HLL set operations (register-level merge)
# ---------------------------------------------------------------------------


def hll_set_ops(events: DataFrame) -> DataFrame:
    """Distinct-user UNION and INTERSECTION estimates for every pair
    of event types, from REGISTER-LEVEL sketch merges — the property
    that makes HLL a cluster-native structure: |A ∪ B| needs no
    access to the raw keys, only max(reg_A, reg_B) per register,
    which is the same associative merge executors use to combine
    partial sketches. Intersection comes by inclusion-exclusion
    (est_A + est_B − est_union) — the standard HLL recipe, whose
    error compounds for small overlaps; the exact columns quantify
    exactly that, which is the point of carrying them.

    Plan: ONE register build (the hll_registers groupBy), then a
    register-keyed self-join of the per-group sketches — a
    |groups|²·64-row equi-join on (reg), nothing scales with input
    rows beyond the shared build. Per-group raw estimates are
    recomputed from the same register rows (identical arithmetic to
    hll_distinct). Exact union/intersection yardsticks are two
    distinct-aggs over the raw pairs (the expensive thing the merge
    avoids at scale).

    Returns (type_a, type_b, union_est, inter_est, exact_union,
    exact_inter, union_rel_error) for type_a < type_b, ordered.
    """
    from ..functions.checkpoints import iter_checkpoint
    # checkpoint barrier: six consumer subtrees (both pair sides,
    # both labelings, both per-group estimates) would otherwise each
    # re-derive the full register build over events
    regs = iter_checkpoint(hll_registers(events))
    a = regs.select(F.col("event_type").alias("type_a"),
                    "reg", F.col("r").alias("ra"))
    b = regs.select(F.col("event_type").alias("type_b"),
                    "reg", F.col("r").alias("rb"))
    # full outer per pair is awkward relationally; instead both sides
    # carry every register through a union trick: merged max via
    # groupBy over the concatenation of A-labeled and B-labeled rows
    pairs = (regs.select(F.col("event_type").alias("type_a")).distinct()
             .join(regs.select(F.col("event_type").alias("type_b"))
                   .distinct(),
                   F.col("type_a") < F.col("type_b")))
    lab_a = pairs.join(a, "type_a").select(
        "type_a", "type_b", "reg", F.col("ra").alias("r"))
    lab_b = pairs.join(b, "type_b").select(
        "type_a", "type_b", "reg", F.col("rb").alias("r"))
    merged = (lab_a.unionByName(lab_b)
              .groupBy("type_a", "type_b", "reg")
              .agg(F.max("r").alias("r")))

    u = (_hll_raw(merged, ["type_a", "type_b"])
         .select("type_a", "type_b", F.col("_est").alias("_eu")))
    # one per-group estimate frame, consumed under both pair roles
    eg = _hll_raw(regs, ["event_type"])
    ea = eg.select(F.col("event_type").alias("type_a"),
                   F.col("_est").alias("_ea"))
    eb = eg.select(F.col("event_type").alias("type_b"),
                   F.col("_est").alias("_eb"))
    # exact yardsticks from the raw key sets
    ks = events.select("event_type", "user_id").distinct()
    ka = ks.select(F.col("event_type").alias("type_a"),
                   F.col("user_id").alias("ua"))
    kb = ks.select(F.col("event_type").alias("type_b"),
                   F.col("user_id").alias("ub"))
    ex_inter = (ka.join(kb, (F.col("ua") == F.col("ub"))
                        & (F.col("type_a") < F.col("type_b")))
                .groupBy("type_a", "type_b")
                .agg(F.count(F.lit(1)).alias("exact_inter")))
    cnts = ks.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    na = cnts.select(F.col("event_type").alias("type_a"),
                     F.col("_n").alias("_na"))
    nb = cnts.select(F.col("event_type").alias("type_b"),
                     F.col("_n").alias("_nb"))
    out = (u.join(F.broadcast(ea), "type_a")
           .join(F.broadcast(eb), "type_b")
           .join(F.broadcast(ex_inter), ["type_a", "type_b"], "left")
           .join(F.broadcast(na), "type_a")
           .join(F.broadcast(nb), "type_b"))
    exact_union = (F.col("_na") + F.col("_nb")
                   - F.coalesce(F.col("exact_inter"), F.lit(0)))
    return (out.select(
        "type_a", "type_b",
        F.round(F.col("_eu"), 6).alias("union_est"),
        F.round(F.col("_ea") + F.col("_eb") - F.col("_eu"), 6)
        .alias("inter_est"),
        exact_union.alias("exact_union"),
        F.coalesce(F.col("exact_inter"), F.lit(0)).cast("long")
        .alias("exact_inter"),
        F.round((F.col("_eu") - exact_union) / exact_union, 6)
        .alias("union_rel_error"))
        .orderBy("type_a", "type_b"))


# ---------------------------------------------------------------------------
# Fixed-boundary histogram quantiles (two-pass mergeable estimate)
# ---------------------------------------------------------------------------

HIST_BUCKETS = 64
HIST_QS = (25, 50, 75, 90)


def histogram_quantiles(lineitem: DataFrame,
                        n_buckets: int = HIST_BUCKETS) -> DataFrame:
    """Quantiles of l_extendedprice estimated from a fixed-boundary
    histogram — the two-pass distributed quantile pattern that closes
    the approximate tier (cardinality / frequency / membership / join
    size / QUANTILES): pass 1 is an O(1)-state min/max, pass 2 a
    B-bucket count histogram whose fixed boundaries make it MERGEABLE
    (bucket-wise sum — executors combine partials exactly like the
    other sketches; a t-digest/KLL would estimate better per byte but
    its merge is order-dependent and therefore not bit-portable).
    The estimate for rank t is linear interpolation inside the first
    bucket whose cumulative count reaches t.

    Determinism: bucket width and index are IEEE double ops evaluated
    in the same order on both engines ((v−min)/w, floor, clamp to
    B−1); the interpolation is lo + w·(b + (t−cum_before)/cnt) with
    one division — no accumulation anywhere (counts are integers).
    Target ranks are integer ceil(q·n/100). The exact order-statistic
    yardstick comes from the skew-safe distributed prefix rank
    (`packing.ranged_cumsum`, no global single-task window), which at
    real scale is the expensive thing the histogram replaces.

    Returns (q, target_rank, est_value, exact_value, abs_error)
    ordered by q.
    """
    from pyspark.sql import Window as W
    from ..functions.checkpoints import iter_checkpoint
    from .packing import ranged_cumsum
    v = F.col("l_extendedprice").cast("double")
    base = lineitem.select(v.alias("v"), F.lit(1).cast("long").alias("_one"))
    # checkpoint barriers: mm (1 row) feeds the histogram AND the
    # rank targets; est (|qs| rows) feeds the output AND the exact
    # yardstick join — without them every consumer re-scans lineitem
    # through the full lineage (measured 3.3 s → ~1.3 s at sf0.1)
    mm = iter_checkpoint(
        base.groupBy().agg(F.min("v").alias("_lo"), F.max("v").alias("_hi"),
                           F.count(F.lit(1)).alias("_n")))
    w_ = (F.col("_hi") - F.col("_lo")) / n_buckets
    bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(F.floor((F.col("v") - F.col("_lo")) / w_),
                F.lit(n_buckets - 1))).cast("int")
    hist = (base.crossJoin(F.broadcast(mm))
            .groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    cum = F.sum("cnt").over(
        W.partitionBy(F.lit(0)).orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow))
    hcum = hist.select("b", "cnt", cum.alias("_cum"))
    qframe = lineitem.sparkSession.createDataFrame(
        [(q,) for q in HIST_QS], "q int")
    targets = (mm.select("_lo", "_hi", "_n")
               .crossJoin(F.broadcast(qframe))
               .select("q", "_lo", "_hi", "_n",
                       F.expr("CAST((_n * q + 99) div 100 AS BIGINT)")
                       .alias("target_rank")))
    # first bucket whose cumulative count reaches the target rank
    est = iter_checkpoint(
        targets.join(F.broadcast(hcum),
                     F.col("_cum") >= F.col("target_rank"))
        .withColumn("_rk", F.row_number().over(
            W.partitionBy("q").orderBy("b")))
        .filter(F.col("_rk") == 1)
        .select("q", "target_rank", "_lo", "_hi", "b", "cnt", "_cum"))
    w2 = (F.col("_hi") - F.col("_lo")) / n_buckets
    frac = (F.col("target_rank") - (F.col("_cum") - F.col("cnt"))) / F.col("cnt")
    est_v = F.col("_lo") + w2 * (F.col("b") + frac)
    # exact yardstick: distributed prefix rank, value at target_rank
    rnk = ranged_cumsum(base, "_one", [F.asc("v")])
    exact = (rnk.select(F.col("v").alias("exact_value"),
                        F.col("_cum").cast("long").alias("_rn"))
             .join(F.broadcast(est.select("q", F.col("target_rank")
                                          .alias("_rn"))), "_rn")
             .select("q", "exact_value"))
    return (est.join(exact, "q")
            .select("q", "target_rank",
                    F.round(est_v, 6).alias("est_value"),
                    "exact_value",
                    F.round(F.abs(est_v - F.col("exact_value")), 6)
                    .alias("abs_error"))
            .orderBy("q"))
