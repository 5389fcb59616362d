"""Persisted IVF-Flat index: train once, serve many queries.

``similarity/ann.py::ivf_topk`` re-trains the coarse quantizer on every
call — correct for a one-shot gate, wasteful for a serving path. This
module persists the index the way a vector store actually lays one out:

- ``vectors/`` — the corpus (vec_id, embedding) written PARTITIONED BY
  its assigned cell, so probing n_probe cells is file-level partition
  pruning (the scan's PartitionFilters, not a post-scan filter). At
  100 TB, a 4/64-probe query touches ~6% of the files and zero others.
- ``centroids.parquet`` — n_lists rows (cell, center, cnorm2); always
  broadcast.
- ``index.json`` — written LAST as the commit marker (same index-last
  ordering as the serving publisher and the snapshot pointer), so a
  crashed build is invisible: readers require the marker.

Query path: rank the broadcast centroid table per query by the same
Euclidean surrogate k-means assigned with, collect the probed cell ids
(n_queries × n_probe ints — metadata-scale), scan ONLY those
partitions, then cosine + windowed top-k. With identical parameters the
results are bit-identical to ``ivf_topk`` (same seed, same bounded
training sample) — test-pinned.

Reference analog: ADR-024's catalog publishes versioned derived
datasets; this is the ANN-index instance of that pattern.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hoopstat_haus_spark.similarity.ann import cosine, dot

INDEX_META = "index.json"
FORMAT_VERSION = 1


def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    out_dir: str,
    n_lists: int = 16,
) -> dict:
    """Train the quantizer and write the index to ``out_dir`` (must not
    exist — indexes are immutable; version by directory like snapshots).
    ``emb`` needs (vec_id, embedding). Returns the meta dict."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    os.makedirs(out_dir, exist_ok=False)
    feats = emb.select(
        "vec_id",
        "embedding",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    # bounded deterministic training sample — same recipe as ivf_topk
    train = feats.orderBy(F.xxhash64("vec_id"), "vec_id").limit(256 * n_lists)
    model = KMeans(k=n_lists, seed=42, maxIter=10).fit(train)
    assigned = model.transform(feats).withColumnRenamed("prediction", "cell")
    assigned.select("vec_id", "embedding", "cell").write.partitionBy("cell").parquet(
        os.path.join(out_dir, "vectors")
    )
    centers = [
        (i, [float(x) for x in c], float(sum(x * x for x in c)))
        for i, c in enumerate(model.clusterCenters())
    ]
    spark.createDataFrame(
        centers, schema="cell int, center array<double>, cnorm2 double"
    ).coalesce(1).write.parquet(os.path.join(out_dir, "centroids"))
    dim = len(centers[0][1])
    meta = {
        "format_version": FORMAT_VERSION,
        "n_lists": n_lists,
        "dim": dim,
        # count the files just written (parquet footer metadata) — an
        # assigned.count() here would re-run the KMeans transform over
        # the whole corpus a second time for one integer
        "n_vectors": spark.read.parquet(os.path.join(out_dir, "vectors")).count(),
    }
    tmp = os.path.join(out_dir, INDEX_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, INDEX_META))  # commit marker, atomic
    return meta


def read_index_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, INDEX_META)) as f:
        return json.load(f)


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k neighbors per query from a persisted index. ``queries``
    needs (q_id, q_vec); returns (q_id, vec_id, cos, rnk) like
    ``ivf_topk``. Raises if the index has no commit marker."""
    meta = read_index_meta(index_dir)  # marker check: refuse half-written
    dim = meta.get("dim")
    if dim is not None:
        # a query vector of the wrong length null-pads inside the dot
        # fold → every cdist/cos is NULL → k rows of silent garbage per
        # query; guard once per query row and raise (same contract as
        # lsh_signature's dim guard)
        ok = (F.size("q_vec") == F.lit(dim)) & ~F.exists(
            "q_vec", lambda x: x.isNull()
        )
        err = F.raise_error(
            F.concat(
                F.lit("query_ivf_index: q_vec length (got "),
                F.coalesce(F.size("q_vec").cast("string"), F.lit("NULL")),
                F.lit(f") != index dim {dim}, or NULL component"),
            )
        )
        queries = queries.withColumn(
            "q_vec", F.when(ok, F.col("q_vec")).otherwise(err)
        )
    cent = spark.read.parquet(os.path.join(index_dir, "centroids"))
    qc = queries.crossJoin(F.broadcast(cent)).select(
        "q_id",
        "q_vec",
        "cell",
        (F.col("cnorm2") - 2.0 * dot(F.col("q_vec"), F.col("center"))).alias("cdist"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.asc("cdist"), F.asc("cell"))
    probes = qc.withColumn("prnk", F.row_number().over(wq)).filter(
        F.col("prnk") <= n_probe
    )
    # collect the probed cell ids (metadata-scale) so the vector scan is
    # STATIC partition pruning — only those cells' files are ever listed
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    vecs = spark.read.parquet(os.path.join(index_dir, "vectors")).filter(
        F.col("cell").isin(cells)
    )
    cand = vecs.join(
        F.broadcast(probes.select("q_id", "q_vec", "cell")), "cell"
    ).filter(F.col("vec_id") != F.col("q_id"))
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(cosine(F.col("q_vec"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("q_id", "rnk")
    )
