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
