"""Durable-checkpoint path for iterative graph ops (VERDICT r2 item 3).

`iter_checkpoint` picks reliable `checkpoint()` when the session has a
checkpoint directory (cluster mode: durable storage, survives executor
loss) and `localCheckpoint()` otherwise. These tests exercise the
durable branch end-to-end: with a checkpoint dir set, the iterative
connected-components op must (a) write RDD checkpoint files into the
dir and (b) produce bit-identical clusters to the local-mode run.
"""

import os

import pytest

from etl_portfolio_tracker_spark.functions.checkpoints import (
    has_checkpoint_dir, iter_checkpoint)
from etl_portfolio_tracker_spark.io import read_table
from etl_portfolio_tracker_spark.operators import dedup as DD


def _rows(df):
    cols = sorted(df.columns)
    return sorted([tuple(str(r[c]) for c in cols) for r in df.collect()])


@pytest.fixture()
def checkpoint_dir(spark, tmp_path):
    """Set a reliable checkpoint dir for the test, restore after."""
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    assert not jsc.getCheckpointDir().isDefined(), (
        "test assumes the shared session starts without a checkpoint dir")
    d = str(tmp_path / "ckpt")
    sc.setCheckpointDir(d)
    try:
        yield d
    finally:
        # SparkContext has no public unset; clear the Option var so the
        # shared session goes back to localCheckpoint mode.
        getattr(jsc, "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty())
        assert not jsc.getCheckpointDir().isDefined()


def test_local_mode_default(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    assert not has_checkpoint_dir(docs)


def test_durable_branch_selected_and_writes_files(spark, sf_dir,
                                                  checkpoint_dir):
    docs = read_table(spark, sf_dir, "documents").limit(50)
    assert has_checkpoint_dir(docs)
    out = iter_checkpoint(docs.select("doc_id"), eager=True)
    assert out.count() == 50
    found = [f for _, _, fs in os.walk(checkpoint_dir) for f in fs]
    assert found, "reliable checkpoint wrote no files"


def test_clusters_identical_under_durable_checkpoint(spark, sf_dir,
                                                     checkpoint_dir):
    docs = read_table(spark, sf_dir, "documents")
    durable = _rows(DD.dedup_clusters(docs))
    # files from the iterative rounds must land in the durable dir
    found = [f for _, _, fs in os.walk(checkpoint_dir) for f in fs]
    assert found, "iterative op wrote no durable checkpoints"
    sc = spark.sparkContext
    getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    local = _rows(DD.dedup_clusters(docs))
    assert durable == local
