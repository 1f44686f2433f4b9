"""Similarity search over the embeddings table (array<float>):

  cosine_topk      — brute-force cosine top-k vs a query vector; the
                     exact baseline. Per-row dot product via position
                     explode + exact decimal sums → bit-portable.
  lsh_buckets      — random-hyperplane (sign) LSH bucket assignment;
                     the ANN scale path: candidate set = same bucket.
  embedding_near_dup — pairs of vectors in the same bucket (candidate
                     near-duplicates by embedding cosine).

Scale: brute-force is one broadcast (the query vector) + a map + a
top-k (TakeOrderedAndProject) — linear, shuffle-free; LSH adds one
narrow groupBy. The hyperplanes are small deterministic integers so
any engine reproduces the same buckets exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..derive import DEC

N_PLANES = 8


def _pos_explode(emb: DataFrame) -> DataFrame:
    """(vec_id, pos [1-based], val) long form of the embedding column.
    spread() first: the 64× explode inherits the input partitioning
    (one local split) and would otherwise run single-core; on a
    cluster with real splits it's a no-op."""
    from ..functions.partitioning import spread
    return spread(emb, "vec_id") \
        .select("vec_id", F.posexplode("embedding").alias("pos0", "valf")) \
        .select("vec_id", (F.col("pos0") + 1).alias("pos"),
                F.col("valf").cast("double").alias("val"))


def vector_norms(emb: DataFrame) -> DataFrame:
    """|v| per vector — decimal-sum of squares, one sqrt."""
    pe = _pos_explode(emb)
    return (pe.groupBy("vec_id")
            .agg(F.sqrt(F.sum((F.col("val") * F.col("val")).cast(DEC))
                        .cast("double")).alias("norm")))


def cosine_topk(emb: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k against the embedding of
    `query_vec_id`. cos = Σaᵢbᵢ / (|a||b|): products in double
    (deterministic), sums in decimal (order-insensitive), one final
    division — bit-portable across engines. Rounded to 6dp and
    tie-broken by vec_id so the top-k cut is total-ordered."""
    pe = _pos_explode(emb)
    q = (pe.filter(F.col("vec_id") == query_vec_id)
         .select(F.col("pos").alias("qpos"), F.col("val").alias("qval")))
    dots = (pe.join(q, pe.pos == q.qpos)
            .groupBy("vec_id")
            .agg(F.sum((F.col("val") * F.col("qval")).cast(DEC))
                 .cast("double").alias("dot")))
    norms = vector_norms(emb)
    qnorm = norms.filter(F.col("vec_id") == query_vec_id) \
                 .select(F.col("norm").alias("qnorm"))
    return (dots.join(norms, "vec_id").crossJoin(qnorm)
            .filter(F.col("vec_id") != query_vec_id)
            .select("vec_id",
                    F.round(F.col("dot") / (F.col("norm") * F.col("qnorm")), 6)
                     .alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(k))


def lsh_buckets(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Sign-LSH: hyperplane h (0..n−1) has integer components
    w(h,pos) = ((h·37 + pos·101) mod 19) − 9; bucket bit h =
    (Σ w·val > 0). Integer weights ⇒ exact decimal dot products ⇒
    identical buckets in any engine."""
    pe = _pos_explode(emb)
    # One groupBy(vec_id) with n_planes decimal sums instead of an
    # n_planes× row explode + (vec_id, h) shuffle + second shuffle:
    # the plane weight is a pure function of (h, pos), so each plane's
    # dot product is just another aggregate over the same long rows.
    # Cuts shuffle volume n_planes× — the difference that matters when
    # the embedding table, not the plane count, is what scales.
    def w(h):
        return ((F.lit(h * 37) + F.col("pos") * 101) % 19 - 9).cast("double")
    sums = pe.groupBy("vec_id").agg(*[
        F.sum((w(h) * F.col("val")).cast(DEC)).alias(f"s{h}")
        for h in range(n_planes)])
    bucket = None
    for h in range(n_planes):
        term = F.when(F.col(f"s{h}") > 0, F.lit(1 << h).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        bucket = term if bucket is None else bucket + term
    return sums.select("vec_id", bucket.alias("bucket"))


N_IVF_CELLS = 8


def ivf_assign(emb: DataFrame, n_cells: int = N_IVF_CELLS) -> DataFrame:
    """IVF coarse quantization: cell = argmax-dot centroid.

    Centroids here are the first `n_cells` vectors (deterministic
    stand-in for a k-means codebook — the assignment/probe mechanics
    are what matters). Dot products are decimal-exact; ties break by
    centroid id via row_number, so assignment is engine-independent.
    At scale: centroids broadcast (tiny), one map + one shuffle by
    vec_id — linear, like every IVF build.
    """
    from pyspark.sql import Window as W
    pe = _pos_explode(emb)
    cpe = (pe.filter(F.col("vec_id") < n_cells)
           .select(F.col("vec_id").alias("cid"),
                   F.col("pos").alias("cpos"),
                   F.col("val").alias("cval")))
    dots = (pe.join(F.broadcast(cpe), pe.pos == cpe.cpos)
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("val") * F.col("cval")).cast(DEC))
                 .cast("double").alias("dot")))
    w = W.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("cid"))
    return (dots.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cid").alias("cell")))


def ivf_topk(emb: DataFrame, query_vec_id: int, k: int = 5,
             n_cells: int = N_IVF_CELLS) -> DataFrame:
    """IVF-ANN search: restrict the exact cosine top-k to the query's
    cell — the classic recall/cost trade (probe 1 cell here; probing
    more cells is the same plan with an isin filter).

    Built flat (dots/norms/assignment each computed once and joined)
    rather than by composing cosine_topk over a filtered table —
    composition re-derived the exploded embedding ~10× (74 exchanges
    in the plan); this shape has 3 derivations and lets AQE broadcast
    the per-query singletons.
    """
    assign = ivf_assign(emb, n_cells)
    qcell = assign.filter(F.col("vec_id") == query_vec_id) \
                  .select(F.col("cell").alias("qcell"))
    pe = _pos_explode(emb)
    q = (pe.filter(F.col("vec_id") == query_vec_id)
         .select(F.col("pos").alias("qpos"), F.col("val").alias("qval")))
    dots = (pe.join(q, pe.pos == q.qpos)
            .groupBy("vec_id")
            .agg(F.sum((F.col("val") * F.col("qval")).cast(DEC))
                 .cast("double").alias("dot")))
    norms = vector_norms(emb)
    qnorm = norms.filter(F.col("vec_id") == query_vec_id) \
                 .select(F.col("norm").alias("qnorm"))
    return (dots.join(norms, "vec_id")
            .join(assign, "vec_id")
            .crossJoin(F.broadcast(qcell)).crossJoin(F.broadcast(qnorm))
            .filter((F.col("cell") == F.col("qcell"))
                    & (F.col("vec_id") != query_vec_id))
            .select("vec_id",
                    F.round(F.col("dot") / (F.col("norm") * F.col("qnorm")), 6)
                     .alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(k))


def embedding_near_dup_pairs(emb: DataFrame) -> DataFrame:
    """Candidate near-duplicate pairs: same LSH bucket (all planes
    agree). Verify step would compute exact cosine on candidates."""
    bk = lsh_buckets(emb)
    a = bk.alias("a")
    b = bk.alias("b")
    return (a.join(b, "bucket")
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select("bucket",
                    F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b")))
