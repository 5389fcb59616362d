"""Manifest: per-file stats, rebuilt in one column-pruned DataFrame pass.

The reference keeps a summary manifest of per-entity file counts/sizes
(``apps/bronze-ingestion/app/bronze_summary.py:161-286``) and a JSON
catalog (``meta/adr/ADR-024``). We upgrade it to an Iceberg-style file
manifest with per-file min/max column stats so the scan layer can prune
files by predicate before Spark ever lists them.

Manifest row schema:
    file_path    string   (relative to table root)
    partition    string   (source value)
    row_count    long
    token_count  long     (sum of n_tok — lineage metric)
    min_doc_id / max_doc_id    string
    min_n_tok / max_n_tok      int
    zmin / zmax  long     (Z-order key range; -1 when file is unclustered)
    file_bytes   long

Scale note: the stats pass reads ONLY (doc_id, n_tok, _zkey) — column
pruning keeps it to a few % of table bytes because `tokens` (the payload)
is never scanned. The groupBy key is ``input_file_name()`` so partial
aggregation happens map-side per file; the shuffle is (files × 1 row).
Manifests themselves are metadata-scale, written as a single parquet via
pyarrow on the driver.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ZKEY_COL = "_zkey"  # kept in data files: parquet footers carry its min/max


def _file_bytes(table_path: str, rel_paths: list[str]) -> dict[str, int]:
    return {p: os.path.getsize(os.path.join(table_path, p)) for p in rel_paths}


ZQ_GRID = 32  # per-file zkey quantile sketch resolution (31 cut points)


def compute_file_stats(
    spark: SparkSession, table_path: str, rel_paths: list[str], curve: str = "zorder"
) -> list[dict]:
    """One distributed pass: per-file row/token counts + min/max stats +
    a {ZQ_GRID}-quantile Z-key sketch (``zq``) tagged with its curve
    (``zq_curve``).

    ``curve`` names the space-filling curve the files' STORED ``_zkey``
    was written with (the writing job knows it); the tag is what lets
    the compaction planner refuse to interpret Hilbert-key quantiles as
    Morton cuts (or vice versa) on mixed-curve tables — it takes the
    metadata-only bounds path only when every sketch's curve matches
    the current run's. Unclustered files (no stored ``_zkey``) always
    sketch the DERIVED Morton key and are tagged ``zorder`` regardless
    of ``curve``.

    The sketch is what lets compaction plan its range boundaries from
    MANIFEST METADATA instead of re-scanning victim files (an Iceberg
    planner reads footers, not data). Files that already carry a stored
    ``_zkey`` sketch that column; unclustered files (fresh ingest — no
    ``_zkey`` stored, zmin/zmax stay -1 so Z-pruning semantics are
    unchanged) sketch the DERIVED default-curve Morton key, a pure-JVM
    expression over (n_tok, doc_id) that whole-stage codegen fuses into
    this same pass."""
    if not rel_paths:
        return []
    abs_paths = [os.path.join(table_path, p) for p in rel_paths]
    base = os.path.join(table_path, "data")
    df = spark.read.option("basePath", base).parquet(*abs_paths)
    has_zkey = ZKEY_COL in df.columns
    zmin = F.min(ZKEY_COL) if has_zkey else F.lit(-1).cast("long")
    zmax = F.max(ZKEY_COL) if has_zkey else F.lit(-1).cast("long")
    if has_zkey:
        zsrc = F.col(ZKEY_COL)
    else:
        from hoopstat_haus_spark.lakehouse.zorder import zkey_expr_zorder

        zsrc = zkey_expr_zorder(F.col("n_tok"), F.xxhash64(F.col("doc_id")), 0, 4096)
    fracs = F.array(*[F.lit(i / ZQ_GRID) for i in range(1, ZQ_GRID)])
    rows = (
        df.groupBy(F.input_file_name().alias("file_uri"), F.col("source").alias("partition"))
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum("n_tok").cast("long").alias("token_count"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.min("n_tok").alias("min_n_tok"),
            F.max("n_tok").alias("max_n_tok"),
            zmin.alias("zmin"),
            zmax.alias("zmax"),
            F.percentile_approx(zsrc, fracs, F.lit(2000)).alias("zq"),
        )
        .collect()
    )
    # normalize file URIs (file:///...) back to table-relative paths
    prefix = "file:" + table_path.rstrip("/") + "/"
    sizes = _file_bytes(table_path, rel_paths)
    zq_curve = curve if has_zkey else "zorder"
    out = []
    for r in rows:
        uri = r["file_uri"]
        rel = uri[len(prefix):] if uri.startswith(prefix) else uri.split(table_path.rstrip("/") + "/", 1)[-1]
        d = r.asDict()
        d.pop("file_uri")
        d["file_path"] = rel
        d["file_bytes"] = sizes[rel]
        d["zq_curve"] = zq_curve
        out.append(d)
    return out


_MANIFEST_FIELDS = [
    ("file_path", pa.string()),
    ("partition", pa.string()),
    ("row_count", pa.int64()),
    ("token_count", pa.int64()),
    ("min_doc_id", pa.string()),
    ("max_doc_id", pa.string()),
    ("min_n_tok", pa.int32()),
    ("max_n_tok", pa.int32()),
    ("zmin", pa.int64()),
    ("zmax", pa.int64()),
    ("file_bytes", pa.int64()),
    # per-file Z-key quantile sketch (metadata-only compaction planning);
    # null in manifests written before the sketch existed (planner falls
    # back to a scan) and for files whose sketch a job couldn't compute
    ("zq", pa.list_(pa.int64())),
    # which curve the zq sketch (and stored _zkey) was computed with;
    # null for pre-tag manifests (planner treats as unsketched)
    ("zq_curve", pa.string()),
]
MANIFEST_ARROW_SCHEMA = pa.schema(_MANIFEST_FIELDS)


def write_manifest(table_path: str, entries: list[dict]) -> str:
    """Write a manifest parquet; returns its table-relative path."""
    os.makedirs(os.path.join(table_path, "_manifests"), exist_ok=True)
    rel = f"_manifests/manifest-{uuid.uuid4().hex[:12]}.parquet"
    cols = {name: [e.get(name) for e in entries] for name, _ in _MANIFEST_FIELDS}
    table = pa.Table.from_pydict(cols, schema=MANIFEST_ARROW_SCHEMA)
    pq.write_table(table, os.path.join(table_path, rel))
    return rel


def read_manifest(table_path: str, rel_path: str) -> list[dict]:
    return pq.read_table(os.path.join(table_path, rel_path)).to_pylist()


def manifest_df(spark: SparkSession, table_path: str, rel_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(table_path, rel_path))
