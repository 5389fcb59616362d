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

Layout (Iceberg manifest-list design; reference ancestor ADR-024's JSON
catalog): a snapshot points at a LIST file (`_manifests/list-*.json`,
one record per partition with exact aggregates) which points at
per-partition SHARD parquets (`_manifests/shard-*.parquet`, one row per
data file). Commits rewrite only touched partitions' shards; at ~10^6
files / 10^4 partitions a single-partition MERGE writes KBs of
metadata, not an O(all-files) monolith, and planners read only the
shards the list says can matter.
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


ZQ_GRID = 32  # per-file zkey quantile sketch resolution (≤31 cut points)
ZQ_SAMPLE_MOD = 16  # sketch from a deterministic 1/16 doc-hash sample


def _zq_grid_expr(zs):
    """EXECUTOR-side grid truncation of a sorted key-sample array down to
    ≤ ZQ_GRID−1 quantile points, inside the agg's output projection.

    This bounds each manifest row at ≤31 longs BEFORE collect, so the
    stats pass's driver traffic is O(files × ZQ_GRID) no matter the file
    size — a whole-table stats pass at 10^6 files ships ~250 MB of
    sketch points instead of the O(rows / ZQ_SAMPLE_MOD) raw samples
    (~100 GB at target scale) the round-4 driver-side truncation
    collected. Index arithmetic is done in exact-double territory
    (i·n < 2^53) so the picked points are bit-identical to the former
    Python ``zs[min(n-1, i*n//ZQ_GRID)]``."""
    n = F.size(zs).cast("long")
    picked = F.transform(
        F.sequence(F.lit(1), F.lit(ZQ_GRID - 1)),
        lambda i: F.element_at(
            zs, F.least(n, F.floor(i.cast("long") * n / F.lit(ZQ_GRID)) + F.lit(1)).cast("int")
        ),
    )
    return F.when(F.size(zs) > ZQ_GRID - 1, picked).otherwise(zs)


def uri_to_rel(table_path: str, uri: str) -> str:
    """Map an ``input_file_name()`` URI back to a table-relative path.
    The URI is URL-encoded END TO END (a space anywhere — root OR a
    partition value — arrives as %20, and an on-disk literal '%' from
    Spark's own partition escaping arrives as %25), so EVERY branch
    decodes exactly once; manifests store the decoded on-disk names.
    An unmappable URI raises — silently passing it through would plant
    it in the manifest as a file_path."""
    from urllib.parse import unquote, urlparse

    prefix = "file:" + table_path.rstrip("/") + "/"
    if uri.startswith(prefix):
        return unquote(uri[len(prefix):])
    p = unquote(urlparse(uri).path) if ":" in uri.split("/", 1)[0] else uri
    abs_root = os.path.abspath(table_path).rstrip("/") + "/"
    if p.startswith(abs_root):
        return p[len(abs_root):]
    raise ValueError(f"file {uri!r} is not under table root {table_path!r}")


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
    this same pass.

    Sketch mechanics (round 4): a deterministic 1/{ZQ_SAMPLE_MOD}
    doc-hash sample of each file's keys is collected sorted and
    downsampled to ≤{ZQ_GRID}−1 quantile points driver-side — measured
    ~40% cheaper than percentile_approx, whose per-row GK updates
    dominated the stats pass regardless of accuracy. Accuracy is set by
    the UNIT-level merged sample (the planner weights every file's
    points by its row count, so sketch length is free to vary): a
    typical unit merges thousands of sampled keys for a handful of
    cuts, ≪1% mass error. Files whose sample comes up empty (P =
    (15/16)^rows — only near-empty files in practice) get a bounded
    second pass that collects ALL their keys (each such file is tiny by
    construction), so every file carries a sketch and the metadata-only
    planning path never degrades to a scan over sampling luck."""
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
    zsamp = F.when(F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(ZQ_SAMPLE_MOD)) == 0, zsrc)
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
            F.sort_array(F.collect_list(zsamp)).alias("zs_full"),
        )
        .select("*", _zq_grid_expr(F.col("zs_full")).alias("zs"))
        .drop("zs_full")
        .collect()
    )
    # normalize file URIs (file:///...) back to table-relative paths
    def to_rel(uri: str) -> str:
        return uri_to_rel(table_path, uri)

    # bounded second pass: files the 1/mod sample missed entirely are
    # tiny (P(empty) = ((mod-1)/mod)^rows), so collecting ALL their keys
    # is metadata-scale and keeps every file sketch-planned
    missed = [to_rel(r["file_uri"]) for r in rows if not r["zs"]]
    full_zs: dict[str, list] = {}
    if missed:
        small = spark.read.option("basePath", base).parquet(
            *[os.path.join(table_path, p) for p in missed]
        )
        for r2 in (
            small.groupBy(F.input_file_name().alias("file_uri"))
            .agg(F.sort_array(F.collect_list(zsrc)).alias("zs_full"))
            .select("*", _zq_grid_expr(F.col("zs_full")).alias("zs"))
            .collect()
        ):
            full_zs[to_rel(r2["file_uri"])] = r2["zs"]

    sizes = _file_bytes(table_path, rel_paths)
    zq_curve = curve if has_zkey else "zorder"
    out = []
    for r in rows:
        rel = to_rel(r["file_uri"])
        d = r.asDict()
        d.pop("file_uri")
        zs = d.pop("zs") or full_zs.get(rel) or []
        d["zq"] = [int(z) for z in zs] or None  # already grid-truncated executor-side
        d["file_path"] = rel
        d["file_bytes"] = sizes[rel]
        d["zq_curve"] = zq_curve
        out.append(d)
    return out


def _escape_partition_value(v: str) -> str:
    """Hive/Spark-compatible partition-dir escaping (the exact char set
    ``ExternalCatalogUtils.escapePathName`` encodes): control chars, DEL
    and ``"#%'*/:=?\\{[]^`` become %XX; everything else (including
    space and non-ASCII) passes through raw — so the fused writer's
    directory names are byte-identical to what ``partitionBy('source')``
    produced for the same values."""
    special = '"#%\'*/:=?\\{[]^'
    return "".join(
        f"%{ord(ch):02X}" if (ord(ch) < 32 or ord(ch) == 127 or ch in special) else ch
        for ch in v
    )


_PARTITIONED_STATS_DDL = (
    "pid int, partition string, dir string, file_name string, row_count long, "
    "token_count long, min_doc_id string, max_doc_id string, min_n_tok int, "
    "max_n_tok int, zmin long, zmax long, zq array<long>"
)

# fused-writer buffering: flush a source's accumulated batches as one
# row group at this many rows (~64 MB at the ~1 KB/row token payload),
# and flush everything when the task's total buffer crosses the cap
# (~128 MB/task worst case on top of the in-flight Arrow batch — the
# Python worker has no spill mechanism, so the bound must be explicit)
_FLUSH_ROWS_PER_SOURCE = 64_000
_FLUSH_ROWS_TOTAL = 128_000


def parquet_codec_conf(spark: SparkSession) -> tuple[str | None, int | None]:
    """(codec, level) for the pyarrow writers, honoring the SAME session
    confs the JVM parquet writer reads — a caller that temporarily sets
    e.g. snappy (the bench's fragmented-ingest template) must get
    snappy from the fused writers too.

    Spark codec names are translated to pyarrow's: ``lz4raw``/``lz4_raw``
    map to pyarrow ``lz4`` (which writes the parquet LZ4_RAW codec);
    ``lzo`` has no pyarrow encoder and raises HERE, driver-side, instead
    of as an opaque executor task failure."""
    codec = spark.conf.get("spark.sql.parquet.compression.codec", "zstd").lower()
    if codec in ("uncompressed", "none"):
        return None, None
    if codec in ("lz4raw", "lz4_raw"):
        codec = "lz4"
    if codec == "lzo":
        raise ValueError(
            "spark.sql.parquet.compression.codec=lzo is not supported by the "
            "fused pyarrow writers (no LZO encoder); use zstd/snappy/gzip/lz4"
        )
    level = None
    if codec == "zstd":
        level = int(spark.conf.get("spark.hadoop.parquet.compression.codec.zstd.level", "1"))
    return codec, level


class FileStatsAcc:
    """THE per-file manifest-stats accumulator shared by every fused
    writer — one implementation of the stats definition so it cannot
    drift between the write paths and :func:`compute_file_stats`
    (which pins it): fold Arrow batches with :meth:`add`, read the
    final stat fields from :meth:`finalize`.

    ``zk`` is the file's z-key source values (stored ``_zkey`` for
    clustered output, derived Morton key for unclustered input),
    ``flag`` the JVM-computed zq sample membership. The sketch is the
    ascending-sorted sample grid-truncated to ≤ ZQ_GRID−1 points, with
    the tiny-file full-keys fallback — index arithmetic identical to
    ``_zq_grid_expr``."""

    def __init__(self) -> None:
        self.n_rows = 0
        self.tok_sum = 0
        self.min_doc = self.max_doc = None
        self.min_nt = self.max_nt = None
        self.zk_parts: list = []
        self.samp_parts: list = []

    def add(self, batch, zk, flag) -> None:
        import pyarrow.compute as pc

        names = batch.schema.names
        self.n_rows += batch.num_rows
        nt = batch.column(names.index("n_tok"))
        self.tok_sum += pc.sum(nt).as_py() or 0
        mm = pc.min_max(nt)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        self.min_nt = lo if self.min_nt is None else min(self.min_nt, lo)
        self.max_nt = hi if self.max_nt is None else max(self.max_nt, hi)
        dm = pc.min_max(batch.column(names.index("doc_id")))
        dlo, dhi = dm["min"].as_py(), dm["max"].as_py()
        self.min_doc = dlo if self.min_doc is None else min(self.min_doc, dlo)
        self.max_doc = dhi if self.max_doc is None else max(self.max_doc, dhi)
        self.zk_parts.append(zk)
        self.samp_parts.append(zk[flag])

    def finalize(self, clustered: bool) -> dict:
        import numpy as np

        zk_all = np.concatenate(self.zk_parts)
        samp = np.concatenate(self.samp_parts)
        zs = np.sort(samp if len(samp) else zk_all)  # tiny-file fallback
        n = len(zs)
        if n > ZQ_GRID - 1:
            zs = zs[[min(n - 1, i * n // ZQ_GRID) for i in range(1, ZQ_GRID)]]
        return {
            "row_count": self.n_rows,
            "token_count": self.tok_sum,
            "min_doc_id": self.min_doc,
            "max_doc_id": self.max_doc,
            "min_n_tok": self.min_nt,
            "max_n_tok": self.max_nt,
            "zmin": int(zk_all.min()) if clustered else -1,
            "zmax": int(zk_all.max()) if clustered else -1,
            "zq": [int(z) for z in zs],
        }


def write_partitioned_with_stats(
    df: DataFrame, staging: str, codec: str | None, codec_level: int | None
) -> list[dict]:
    """Write ``df`` partitioned by ``source`` under ``staging`` AND
    compute every output file's manifest stats in the SAME job — the
    fused form of ``partitionBy('source').parquet(...)`` followed by
    :func:`compute_file_stats`, which re-read every written file.

    Each task splits its Arrow batches by ``source`` and streams them
    into one pyarrow ParquetWriter per source (same zstd codec/level as
    the JVM writer; batches accumulate to row groups of up to
    {_FLUSH_ROWS_PER_SOURCE} rows), folding the stats accumulators
    batch-wise. Stats are bit-identical to :func:`compute_file_stats`:
    same JVM-computed zq sample flag, ascending sort, grid truncation
    and tiny-file full-keys fallback; clustered inputs (``_zkey``
    column present) sketch the stored key and record real zmin/zmax,
    unclustered inputs sketch the DERIVED Morton key (computed JVM-side
    as a helper column, dropped from the file) with zmin = zmax = -1.

    Returns one dict per written file: ``partition`` (raw value),
    ``dir`` (escaped ``source=...`` dir under staging), ``file_name``,
    ``pid`` and the stat fields. The caller renames files out of
    staging and attaches ``file_path``/``file_bytes``/``zq_curve``.
    Task-retry safe: names carry a fresh uuid per attempt and only
    files named in collected rows are renamed."""
    import uuid as _uuid

    has_zkey = ZKEY_COL in df.columns
    flag = F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(ZQ_SAMPLE_MOD)) == 0
    wide = df.withColumn("_zs_flag", flag)
    if not has_zkey:
        from hoopstat_haus_spark.lakehouse.zorder import zkey_expr_zorder

        wide = wide.withColumn(
            "_zq_src", zkey_expr_zorder(F.col("n_tok"), F.xxhash64(F.col("doc_id")), 0, 4096)
        )
    zsrc_col = ZKEY_COL if has_zkey else "_zq_src"
    helper_cols = ["_zs_flag"] + ([] if has_zkey else ["_zq_src"])

    def write_task(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        from hoopstat_haus_spark.lakehouse.manifest import FileStatsAcc

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        state: dict[str, dict] = {}  # source value -> writer + accumulator
        total_buffered = 0

        def flush(st):
            nonlocal total_buffered
            if not st["buf"]:
                return
            tbl = pa.Table.from_batches(st["buf"])
            if st["writer"] is None:
                os.makedirs(os.path.dirname(st["path"]), exist_ok=True)
                st["writer"] = pq.ParquetWriter(
                    st["path"],
                    tbl.schema,
                    compression=codec or "none",
                    compression_level=codec_level,
                )
            st["writer"].write_table(tbl)
            total_buffered -= st["buf_rows"]
            st["buf"], st["buf_rows"] = [], 0

        for batch in batches:
            cols = batch.schema.names
            src_idx = cols.index("source")
            zk = batch.column(cols.index(zsrc_col)).to_numpy(zero_copy_only=False)
            fl = batch.column(cols.index("_zs_flag")).to_numpy(zero_copy_only=False).astype(bool)
            drop = ["source", *helper_cols]
            for val in pc.unique(batch.column(src_idx)).to_pylist():
                mask = pc.equal(batch.column(src_idx), val)
                sub = batch.filter(mask)
                st = state.get(val)
                if st is None:
                    d = f"source={_escape_partition_value(val)}"
                    name = f"part-{pid:05d}-{_uuid.uuid4().hex[:8]}.parquet"
                    st = state[val] = {
                        "dir": d,
                        "name": name,
                        "path": os.path.join(staging, d, name),
                        "writer": None,
                        "buf": [],
                        "buf_rows": 0,
                        "acc": FileStatsAcc(),
                    }
                st["buf"].append(sub.drop_columns(drop))
                st["buf_rows"] += sub.num_rows
                total_buffered += sub.num_rows
                m = mask.to_numpy(zero_copy_only=False).astype(bool)
                st["acc"].add(sub, zk[m], fl[m])
                if st["buf_rows"] >= _FLUSH_ROWS_PER_SOURCE:
                    flush(st)
            if total_buffered >= _FLUSH_ROWS_TOTAL:
                for st in state.values():
                    flush(st)

        out: dict[str, list] = {
            k: []
            for k in (
                "pid", "partition", "dir", "file_name", "row_count", "token_count",
                "min_doc_id", "max_doc_id", "min_n_tok", "max_n_tok", "zmin", "zmax", "zq",
            )
        }
        for val, st in state.items():
            flush(st)
            if st["writer"] is None:
                continue
            st["writer"].close()
            stats = st["acc"].finalize(clustered=has_zkey)
            out["pid"].append(pid)
            out["partition"].append(val)
            out["dir"].append(st["dir"])
            out["file_name"].append(st["name"])
            for k, v in stats.items():
                out[k].append(v)
        if out["pid"]:
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("pid", pa.int32()),
                        ("partition", pa.string()),
                        ("dir", pa.string()),
                        ("file_name", pa.string()),
                        ("row_count", pa.int64()),
                        ("token_count", pa.int64()),
                        ("min_doc_id", pa.string()),
                        ("max_doc_id", pa.string()),
                        ("min_n_tok", pa.int32()),
                        ("max_n_tok", pa.int32()),
                        ("zmin", pa.int64()),
                        ("zmax", pa.int64()),
                        ("zq", pa.list_(pa.int64())),
                    ]
                ),
            )

    return [r.asDict() for r in wide.mapInArrow(write_task, _PARTITIONED_STATS_DDL).collect()]


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
MANIFEST_DDL = (
    "file_path string, partition string, row_count long, token_count long, "
    "min_doc_id string, max_doc_id string, min_n_tok int, max_n_tok int, "
    "zmin long, zmax long, file_bytes long, zq array<long>, zq_curve string"
)


# --------------------------------------------------------------- shards
#
# A snapshot's manifest is a LIST file (JSON, metadata-scale: one record
# per partition) pointing at per-partition SHARD parquets (one row per
# data file). Commits rewrite only the touched partitions' shards and
# carry the rest by reference — the Iceberg manifest-list design — so a
# MERGE into 1 of 10^4 partitions writes one shard + one small list, not
# an O(all-files) monolith. Planning reads only the shards it needs,
# guided by the list's exact per-shard aggregates.
#
# Back-compat: manifests written before sharding are a single parquet
# (`manifest-*.parquet`); readers detect them by extension and read them
# whole, and the first commit on top converts the table to shards.


def is_manifest_list(rel_path: str) -> bool:
    return rel_path.endswith(".json")


def shard_record(partition: str, rel_path: str, entries: list[dict]) -> dict:
    """List-file record: exact per-shard aggregates so planners can skip
    reading shards that cannot contain work — the candidate test in
    plan_compaction (undersized / oversized / unclustered file exists)
    and scan pruning (source, n_tok range) evaluate EXACTLY on these."""
    return {
        "partition": partition,
        "path": rel_path,
        "n_files": len(entries),
        "row_count": int(sum(e["row_count"] for e in entries)),
        "token_count": int(sum(e["token_count"] for e in entries)),
        "file_bytes": int(sum(e["file_bytes"] for e in entries)),
        "min_file_bytes": int(min(e["file_bytes"] for e in entries)),
        "max_file_bytes": int(max(e["file_bytes"] for e in entries)),
        "n_unclustered": sum(1 for e in entries if e["zmin"] < 0),
        "min_n_tok": int(min(e["min_n_tok"] for e in entries)),
        "max_n_tok": int(max(e["max_n_tok"] for e in entries)),
    }


def _write_shard(table_path: str, partition: str, entries: list[dict]) -> dict:
    os.makedirs(os.path.join(table_path, "_manifests"), exist_ok=True)
    rel = f"_manifests/shard-{uuid.uuid4().hex[:12]}.parquet"
    cols = {name: [e.get(name) for e in entries] for name, _ in _MANIFEST_FIELDS}
    pq.write_table(
        pa.Table.from_pydict(cols, schema=MANIFEST_ARROW_SCHEMA),
        os.path.join(table_path, rel),
    )
    return shard_record(partition, rel, entries)


def _write_list(table_path: str, records: list[dict]) -> str:
    import json

    os.makedirs(os.path.join(table_path, "_manifests"), exist_ok=True)
    rel = f"_manifests/list-{uuid.uuid4().hex[:12]}.json"
    body = {"format_version": 2, "shards": sorted(records, key=lambda r: r["partition"])}
    # tmp + rename: a crash mid-write must not leave a truncated JSON a
    # future resume path could try to parse (same atomic-metadata-write
    # convention as the snapshot pointer and the serving artifact index)
    abs_path = os.path.join(table_path, rel)
    with open(abs_path + ".tmp", "w") as f:
        json.dump(body, f, indent=1)
    os.replace(abs_path + ".tmp", abs_path)
    return rel


def read_manifest_list(table_path: str, rel_path: str) -> list[dict]:
    """Shard records of a list manifest. For a LEGACY monolithic
    manifest, synthesizes in-memory records (``path`` None, ``entries``
    attached) so callers get one uniform shape; the next commit's
    :func:`update_manifest` converts those to real shards."""
    import json

    if is_manifest_list(rel_path):
        with open(os.path.join(table_path, rel_path)) as f:
            return json.load(f)["shards"]
    by_part: dict[str, list[dict]] = {}
    for e in pq.read_table(os.path.join(table_path, rel_path)).to_pylist():
        by_part.setdefault(e["partition"], []).append(e)
    out = []
    for part, entries in sorted(by_part.items()):
        rec = shard_record(part, None, entries)
        rec["entries"] = entries
        out.append(rec)
    return out


def read_shard(table_path: str, record: dict) -> list[dict]:
    """Entries of one shard record (legacy records carry them inline)."""
    if record.get("path") is None:
        return record["entries"]
    return pq.read_table(os.path.join(table_path, record["path"])).to_pylist()


def diff_partition_entries(table_path: str, old_manifest: str, new_manifest: str):
    """Yield ``(partition, old_entries, new_entries)`` for every
    partition whose manifest shard DIFFERS between two manifests — the
    single shard-aware diff walk behind both incremental partition
    discovery (``table.changed_partitions_since``) and the row-level
    change feed (``changes.changed_files``).

    A partition carried by reference (identical immutable shard path on
    both sides) is skipped without opening the shard parquet, so the
    walk costs O(changed partitions). Entries are the full per-file
    dicts; ``[]`` marks a side where the partition is absent. Legacy
    monolithic manifests (path None records) compare at entry level —
    their synthesized records never alias, so they are always opened."""
    old_recs = {r["partition"]: r for r in read_manifest_list(table_path, old_manifest)}
    new_recs = {r["partition"]: r for r in read_manifest_list(table_path, new_manifest)}
    for part in sorted(set(old_recs) | set(new_recs)):
        o, n = old_recs.get(part), new_recs.get(part)
        if (
            o is not None
            and n is not None
            and o.get("path") is not None
            and o["path"] == n.get("path")
        ):
            continue  # same immutable shard → byte-identical partition
        yield (
            part,
            read_shard(table_path, o) if o else [],
            read_shard(table_path, n) if n else [],
        )


def update_manifest(
    table_path: str,
    base_rel: str | None,
    changed: dict[str, list[dict]],
) -> tuple[str, list[dict]]:
    """Commit-side manifest update: write NEW shards for the partitions
    in ``changed`` (mapping partition → its full new entry list; an
    empty list drops the partition), carry every other shard by
    reference, and write the new list. Returns (list rel, records).
    O(touched partitions) writes + O(partitions) list I/O — never
    O(all files). A legacy monolithic base converts fully on this
    commit (its synthesized records carry entries inline)."""
    records: list[dict] = []
    if base_rel is not None:
        for rec in read_manifest_list(table_path, base_rel):
            if rec["partition"] in changed:
                continue
            if rec.get("path") is None:  # legacy: materialize as a shard
                rec = _write_shard(table_path, rec["partition"], rec["entries"])
            records.append(rec)
    for part, entries in sorted(changed.items()):
        if entries:
            records.append(_write_shard(table_path, part, entries))
    return _write_list(table_path, records), records


def summary_from_records(records: list[dict]) -> dict:
    return {
        "files": int(sum(r["n_files"] for r in records)),
        "rows": int(sum(r["row_count"] for r in records)),
        "tokens": int(sum(r["token_count"] for r in records)),
        "bytes": int(sum(r["file_bytes"] for r in records)),
        "partitions": len(records),
    }


def write_manifest(table_path: str, entries: list[dict]) -> str:
    """Full manifest write (create / whole-table rewrite): shard every
    partition + write the list; returns the LIST's table-relative path."""
    by_part: dict[str, list[dict]] = {}
    for e in entries:
        by_part.setdefault(e["partition"], []).append(e)
    rel, _records = update_manifest(table_path, None, by_part)
    return rel


def manifest_files(table_path: str, rel_path: str) -> list[str]:
    """Every metadata file a manifest rel reaches (itself + its shards)
    — the GC reachability set for manifests."""
    if not is_manifest_list(rel_path):
        return [rel_path]
    return [rel_path] + [
        r["path"] for r in read_manifest_list(table_path, rel_path) if r.get("path")
    ]


def read_manifest(table_path: str, rel_path: str) -> list[dict]:
    """ALL entries of a manifest (list or legacy monolithic). O(files) —
    planners should prefer read_manifest_list + read_shard on the
    partitions they actually touch."""
    if is_manifest_list(rel_path):
        out: list[dict] = []
        for rec in read_manifest_list(table_path, rel_path):
            out.extend(read_shard(table_path, rec))
        return out
    return pq.read_table(os.path.join(table_path, rel_path)).to_pylist()


def manifest_df(spark: SparkSession, table_path: str, rel_path: str) -> DataFrame:
    if is_manifest_list(rel_path):
        paths = [
            os.path.join(table_path, r["path"])
            for r in read_manifest_list(table_path, rel_path)
            if r.get("path")
        ]
        if not paths:  # empty table: 0 shards
            return spark.createDataFrame([], schema=MANIFEST_DDL)
        return spark.read.parquet(*paths)
    return spark.read.parquet(os.path.join(table_path, rel_path))
