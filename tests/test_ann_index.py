"""Persisted IVF index (`similarity/ann_index.py`): bit-parity with the
in-memory path, partition-pruned probe scans, and the commit marker."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load
from hoopstat_haus_spark.similarity.ann import _queries, ivf_topk
from hoopstat_haus_spark.similarity.ann_index import (
    INDEX_META,
    build_ivf_index,
    query_ivf_index,
    read_index_meta,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ivf") / "idx")
    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    meta = build_ivf_index(spark, emb, out, n_lists=8)
    assert meta["n_vectors"] == emb.count() and meta["n_lists"] == 8
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_index_query_matches_in_memory_ivf(spark, index_dir):
    # same seed + same bounded training sample ⇒ identical centroids ⇒
    # identical assignments, probes, and top-k
    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    got = query_ivf_index(spark, index_dir, _queries(emb), k=5, n_probe=3).collect()
    want = ivf_topk(spark, SF_DIR, k=5, n_lists=8, n_probe=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0


def test_probe_scan_is_partition_pruned(spark, index_dir):
    # only the probed cells' directories exist in the scan: the cell
    # filter reaches the parquet source as a partition filter, and the
    # index layout means untouched cells contribute zero files
    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    df = query_ivf_index(spark, index_dir, _queries(emb).limit(3), k=5, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # physical proof of the layout: one directory per cell on disk
    cells = [d for d in os.listdir(os.path.join(index_dir, "vectors")) if d.startswith("cell=")]
    assert len(cells) == 8


def test_halfwritten_index_is_refused(spark, index_dir, tmp_path):
    broken = str(tmp_path / "broken")
    shutil.copytree(index_dir, broken)
    os.remove(os.path.join(broken, INDEX_META))  # simulate crash pre-commit
    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    with pytest.raises(FileNotFoundError):
        query_ivf_index(spark, broken, _queries(emb))
    with pytest.raises(FileExistsError):
        build_ivf_index(spark, emb, index_dir)  # indexes are immutable
    assert read_index_meta(index_dir)["format_version"] == 1
