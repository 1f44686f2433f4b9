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


def _pos_explode(emb: DataFrame, spread_input: bool = True) -> DataFrame:
    """(vec_id, pos [1-based], val) long form of the embedding column.
    spread() first: the 64× explode inherits the input partitioning
    (one local split) and would otherwise run single-core; on a
    cluster with real splits it's a no-op. Pass spread_input=False for
    single-vector / centroid-subset derivations where the exchange
    would cost more than the explode."""
    from ..functions.partitioning import spread
    src = spread(emb, "vec_id") if spread_input else emb
    return src \
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
    tie-broken by vec_id so the top-k cut is total-ordered.

    One explode + one broadcast join + one groupBy; |q| is an exact
    decimal sum over the 64-row pivoted query frame (identical to the
    per-vec norm2 — decimal addition is order-insensitive)."""
    pe = _pos_explode(emb)
    qw = (_pos_explode(emb.filter(F.col("vec_id") == query_vec_id),
                       spread_input=False)
          .groupBy("pos").agg(F.max("val").alias("qval")))
    dn = (pe.join(F.broadcast(qw), "pos")
          .groupBy("vec_id")
          .agg(F.sum((F.col("val") * F.col("qval")).cast(DEC))
                .cast("double").alias("dot"),
               F.sum((F.col("val") * F.col("val")).cast(DEC))
                .alias("norm2")))
    norm = F.sqrt(F.col("norm2").cast("double"))
    qnorm = qw.agg(F.sqrt(F.sum((F.col("qval") * F.col("qval")).cast(DEC))
                          .cast("double")).alias("qnorm"))
    return (dn.crossJoin(F.broadcast(qnorm))
            .filter(F.col("vec_id") != query_vec_id)
            .select("vec_id",
                    F.round(F.col("dot") / (norm * F.col("qnorm")), 6)
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
    dots = _centroid_dots(emb, n_cells)
    return dots.select("vec_id", _argmax_cell(n_cells).alias("cell"))


def _centroid_dots(emb: DataFrame, n_cells: int) -> DataFrame:
    """(vec_id, dot_0..dot_{n-1}) in ONE pass: centroid values pivot
    to per-pos broadcast columns c0..c{n-1}, so every centroid dot
    product is just another decimal aggregate of the same
    groupBy(vec_id) — no (vec × cid) row expansion, no window."""
    pe = _pos_explode(emb)
    cw = _centroid_wide(emb, n_cells)
    return (pe.join(F.broadcast(cw), "pos")
            .groupBy("vec_id")
            .agg(*[F.sum((F.col("val") * F.col(f"c{i}")).cast(DEC))
                    .cast("double").alias(f"dot_{i}")
                   for i in range(n_cells)]))


def _centroid_wide(emb: DataFrame, n_cells: int) -> DataFrame:
    """(pos, c0..c{n-1}): centroid values pivoted to one row per
    position — a dim-sized frame built from the n_cells-row slice
    (filter pushes to the scan; no spread, it's tiny)."""
    cpe = _pos_explode(emb.filter(F.col("vec_id") < n_cells),
                       spread_input=False)
    return (cpe.groupBy("pos")
            .agg(*[F.max(F.when(F.col("vec_id") == i, F.col("val")))
                    .alias(f"c{i}") for i in range(n_cells)]))


def _argmax_cell(n_cells: int):
    """argmax over dot_0..dot_{n-1}, ties to the LOWEST cid (the
    row_number(desc dot, asc cid) tie rule of the join formulation)."""
    best = F.greatest(*[F.col(f"dot_{i}") for i in range(n_cells)])
    cell = F.lit(0)
    for i in reversed(range(n_cells)):
        cell = F.when(F.col(f"dot_{i}") == best, F.lit(i)).otherwise(cell)
    return cell


def kmeans_step(emb: DataFrame, n_cells: int = N_IVF_CELLS) -> DataFrame:
    """One Lloyd iteration of the IVF codebook training: assign every
    vector to its argmax-dot centroid (same fused single-pass kernel
    as ivf_assign), then emit the new centroids as mean-per-(cell,
    pos) in long form, plus the cell population.

    Distributed k-means is exactly this step iterated: the assignment
    is a broadcast-join map (centroids are tiny), the re-estimation is
    one groupBy(cell, pos) with map-side partial sums — no state on
    the driver beyond the loop counter, so it scales to any corpus.
    Mean = exact decimal sum → one IEEE division → round(6): both
    engines agree bit-for-bit (the stats_summary avg pattern)."""
    from ..derive import DEC
    assign = ivf_assign(emb, n_cells)
    pe = _pos_explode(emb)
    return (pe.join(assign, "vec_id")
            .groupBy("cell", "pos")
            .agg(F.round(F.sum(F.col("val").cast(DEC)).cast("double")
                         / F.count("*"), 6).alias("c_val"),
                 F.count("*").alias("n_members")))


def ivf_topk(emb: DataFrame, query_vec_id: int, k: int = 5,
             n_cells: int = N_IVF_CELLS) -> DataFrame:
    """IVF-ANN search: restrict the exact cosine top-k to the query's
    cell — the classic recall/cost trade (probe 1 cell here; probing
    more cells is the same plan with an isin filter).

    Fully fused: ONE pass over the exploded embeddings computes the
    query dot, the vector norm, and all n_cells centroid dots (query
    vector and centroids pivot to per-pos broadcast columns), so the
    whole search is explode → broadcast join → groupBy(vec_id) →
    filter-to-cell → top-k. Earlier shapes re-derived the explode 3-10×
    (28-74 exchanges); this is the plan an IVF probe should have.
    """
    pe = _pos_explode(emb)
    qw = (_pos_explode(emb.filter(F.col("vec_id") == query_vec_id),
                       spread_input=False)
          .groupBy("pos").agg(F.max("val").alias("qval")))
    cw = _centroid_wide(emb, n_cells)
    per_vec = (pe.join(F.broadcast(cw.join(qw, "pos")), "pos")
               .groupBy("vec_id")
               .agg(F.sum((F.col("val") * F.col("qval")).cast(DEC))
                     .cast("double").alias("dot"),
                    F.sum((F.col("val") * F.col("val")).cast(DEC))
                     .alias("norm2"),
                    *[F.sum((F.col("val") * F.col(f"c{i}")).cast(DEC))
                       .cast("double").alias(f"dot_{i}")
                      for i in range(n_cells)])
               .withColumn("cell", _argmax_cell(n_cells)))
    # the query's own cell from the dim-sized pivoted frames — same
    # decimal products, so bit-identical to its per_vec row — instead
    # of re-deriving the whole per_vec subplan for one row
    qcell = (cw.join(qw, "pos")
             .agg(*[F.sum((F.col("qval") * F.col(f"c{i}")).cast(DEC))
                     .cast("double").alias(f"dot_{i}")
                    for i in range(n_cells)])
             .select(_argmax_cell(n_cells).alias("qcell")))
    qnorm = qw.agg(F.sqrt(F.sum((F.col("qval") * F.col("qval")).cast(DEC))
                          .cast("double")).alias("qnorm"))
    norm = F.sqrt(F.col("norm2").cast("double"))
    return (per_vec
            .crossJoin(F.broadcast(qcell)).crossJoin(F.broadcast(qnorm))
            .filter((F.col("cell") == F.col("qcell"))
                    & (F.col("vec_id") != query_vec_id))
            .select("vec_id",
                    F.round(F.col("dot") / (norm * F.col("qnorm")), 6)
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
