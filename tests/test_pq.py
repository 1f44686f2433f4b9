"""Product-quantization kernels: code assignment + ADC scoring."""

import pytest

from etl_portfolio_tracker_spark.io import read_table
from etl_portfolio_tracker_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_pq_codes_shape_and_range(spark, emb):
    out = SIM.pq_codes(emb).toPandas()
    assert len(out) == emb.count()
    for m in range(SIM.PQ_M):
        assert out[f"code_{m}"].between(0, SIM.PQ_K - 1).all()
    # packed code is the base-K digit expansion of the code columns
    packed = sum(out[f"code_{m}"] * (SIM.PQ_K ** m)
                 for m in range(SIM.PQ_M))
    assert (out["packed_code"] == packed).all()


def test_pq_codebook_vectors_encode_to_themselves(spark, emb):
    """Centroid j's subvector has distance 0 to itself, so vector j
    (j < PQ_K) must get code_m == j in every subspace (ties cannot
    beat an exact-zero distance unless two codebook vectors collide,
    which the synthetic embeddings don't)."""
    out = (SIM.pq_codes(emb)
           .filter(f"vec_id < {SIM.PQ_K}")
           .toPandas().set_index("vec_id"))
    for j in range(SIM.PQ_K):
        for m in range(SIM.PQ_M):
            assert out.loc[j, f"code_{m}"] == j


def test_pq_topk_is_deterministic_and_excludes_query(spark, emb):
    a = SIM.pq_topk(emb, query_vec_id=0, k=10).toPandas()
    b = SIM.pq_topk(emb, query_vec_id=0, k=10).toPandas()
    assert list(a["vec_id"]) == list(b["vec_id"])
    assert 0 not in set(a["vec_id"])
    assert len(a) == 10
    # ADC distances are sorted ascending
    assert list(a["adc_dist"]) == sorted(a["adc_dist"])


def test_adc_equals_exact_distance_to_reconstruction(spark, emb):
    """ADC dist(q, x) is BY DEFINITION the exact distance from q to
    x's PQ reconstruction (centroid concat). Check one row against a
    numpy recomputation."""
    import numpy as np
    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.filter(f"vec_id < {SIM.PQ_K}").collect()}
    q = np.array(
        emb.filter("vec_id = 0").first().embedding, dtype=np.float64)
    target = SIM.pq_topk(emb, query_vec_id=0, k=1).first()
    codes = (SIM.pq_codes(emb)
             .filter(f"vec_id = {target.vec_id}").first())
    recon = np.concatenate([
        rows[codes[f"code_{m}"]][m * SIM.PQ_SUBDIM:(m + 1) * SIM.PQ_SUBDIM]
        for m in range(SIM.PQ_M)])
    exact = float(((q - recon) ** 2).sum())
    assert target.adc_dist == pytest.approx(exact, abs=1e-5)
