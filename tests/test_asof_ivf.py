"""As-of join and IVF-ANN goldens."""

import datetime as dt

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.operators import asof as AS
from etl_portfolio_tracker_spark.operators import similarity as SIM


def test_asof_join_basic(spark):
    prices = spark.createDataFrame(
        [("A", dt.date(2025, 1, 1), 10.0), ("A", dt.date(2025, 1, 5), 20.0),
         ("B", dt.date(2025, 1, 2), 7.0)],
        schema=schemas.PRICES)
    probes = spark.createDataFrame(
        [(1, "A", dt.date(2025, 1, 1)),   # same-day price applies
         (2, "A", dt.date(2025, 1, 4)),   # between obs → older one
         (3, "A", dt.date(2025, 1, 9)),   # after last → last
         (4, "B", dt.date(2025, 1, 1)),   # before first → null
         (5, "C", dt.date(2025, 1, 1))],  # unknown key → null
        "id long, ticker string, ts date")
    out = {r["id"]: r["asof_close"] for r in AS.asof_join(probes, prices).collect()}
    assert out == {1: 10.0, 2: 10.0, 3: 20.0, 4: None, 5: None}


def emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        schema=schemas.EMBEDDINGS)


def test_ivf_assign_and_topk(spark):
    # centroids = vecs 0,1 (n_cells=2): x-axis and y-axis
    e = emb_df(spark, [[1, 0], [0, 1], [0.9, 0.1], [0.1, 0.9], [-1, 0.2]])
    cells = {r["vec_id"]: r["cell"]
             for r in SIM.ivf_assign(e, n_cells=2).collect()}
    assert cells[2] == 0 and cells[3] == 1
    top = SIM.ivf_topk(e, query_vec_id=0, k=5, n_cells=2).collect()
    ids = [r["vec_id"] for r in top]
    assert 2 in ids           # same cell, most similar
    assert 3 not in ids       # different cell → pruned (ANN trade-off)


def test_ann_recall_bounds_and_self_consistency(spark):
    import numpy as np
    from etl_portfolio_tracker_spark.operators import similarity as SIM
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = (SIM.ann_recall(emb, query_ids=(10, 20), k=5, n_cells=4)
           .toPandas().set_index("qid"))
    assert list(out.index) == [10, 20]
    for q in (10, 20):
        assert out.loc[q, "n_exact"] == 5
        assert 0 <= out.loc[q, "n_hit"] <= min(out.loc[q, "n_ivf"], 5)
        assert abs(out.loc[q, "recall"] - out.loc[q, "n_hit"] / 5.0) < 1e-9


def test_label_outliers_ranks_farthest_per_label(spark):
    # label 0: three vecs near origin + one far vec -> the far one is
    # rank 1; label 1: two symmetric vecs -> tie on distance, broken
    # by vec_id ASC.
    rows = [(0, [0.0, 0.0], 0), (1, [0.2, 0.0], 0),
            (2, [0.0, 0.2], 0), (3, [4.0, 4.0], 0),
            (4, [1.0, 0.0], 1), (5, [-1.0, 0.0], 1)]
    emb = spark.createDataFrame(rows, schema=schemas.EMBEDDINGS)
    out = SIM.label_outliers(emb, k=2).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)
    l0 = sorted(by_label[0], key=lambda r: r["rnk"])
    assert l0[0]["vec_id"] == 3 and l0[0]["rnk"] == 1
    # label-1 tie: same sq_dist, vec_id ASC wins rank 1
    l1 = sorted(by_label[1], key=lambda r: r["rnk"])
    assert [r["vec_id"] for r in l1] == [4, 5]
    assert l1[0]["sq_dist"] == l1[1]["sq_dist"]
    # k bound respected
    assert all(len(v) <= 2 for v in by_label.values())


def test_rp_project_deterministic_and_sign_structured(spark):
    # weights depend only on (pos, j): scaling the input scales the
    # projection linearly; a zero vector projects to exactly zero.
    rows = [(0, [1.0, 2.0, 4.0], 0), (1, [2.0, 4.0, 8.0], 0),
            (2, [0.0, 0.0, 0.0], 0)]
    emb = spark.createDataFrame(rows, schema=schemas.EMBEDDINGS)
    out = {r["vec_id"]: r for r in SIM.rp_project(emb, out_dims=4).collect()}
    for j in range(4):
        assert out[2][f"p{j}"] == 0.0
        # doubling the vector doubles every component (exact in IEEE)
        assert out[1][f"p{j}"] == round(2 * out[0][f"p{j}"], 6)
        # components are signed sums of the inputs: bounded by L1 norm
        assert abs(out[0][f"p{j}"]) <= 7.0


def test_incremental_topk_merge_equals_full_scan(spark, sf_dir):
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.operators import similarity as SIM
    emb = read_table(spark, sf_dir, "embeddings")
    full = [(r["vec_id"], r["cos_sim"])
            for r in SIM.cosine_topk(emb, 0, k=10).collect()]
    inc = [(r["vec_id"], r["cos_sim"])
           for r in SIM.incremental_topk(emb, 0, k=10).collect()]
    assert inc == full and len(inc) == 10
    # the delta leg alone contributes at most k rows to the merge
    delta_only = SIM.incremental_topk(emb, 0, k=3)
    assert delta_only.count() == 3
