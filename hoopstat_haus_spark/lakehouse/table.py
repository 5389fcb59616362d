"""TokenLakeTable: the engine facade — create/scan/append/compact/merge/GC.

Layout (SURVEY.md §7.2):

    <path>/data/source=<s>/<file>.parquet     data files (Hive dirs)
    <path>/_manifests/list-*.json             manifest list (1 record/partition)
    <path>/_manifests/shard-*.parquet         per-partition file-stats shards
    <path>/_snapshots/v<N>.json + current     snapshot log (snapshots.py)
    <path>/_checkpoints/<job_id>/*.json       lineage (checkpoint.py)

    (pre-sharding tables: _manifests/manifest-*.parquet monoliths are
    still readable; the first commit converts them to shards)

Readers always resolve data files THROUGH a snapshot's manifest — never
by listing directories — which is what makes commits atomic and scans
snapshot-isolated (reference analog: downstream only reacts to the
silver-ready marker, ``meta/adr/ADR-028:33-38``).

Scale bound — scan path list: a full-table ``scan()`` materializes every
surviving file path driver-side into one ``parquet(*paths)`` call. At the
target 10^6-file scale that is ~10^8 bytes of path strings — the same
O(files) planning footprint an Iceberg/Delta driver holds when it turns
manifests into FileScanTasks, and an order of magnitude under the shard
metadata already resident during pruning, so it is a documented bound,
not a defect. Every predicate (partition, stat range) prunes BEFORE the
list is built, so only unfiltered full-table scans ever see the maximum;
memory grows with files *selected*, never files *on disk*. Beyond
``SCAN_PATHS_CHUNK`` selected files, ``scan()`` switches to chunked
``parquet()`` reads behind a ``unionByName`` — each relation's
InMemoryFileIndex then holds one chunk's paths instead of the full list,
and Spark unions the scans (filters/pruning push into every branch).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import manifest as mf
from hoopstat_haus_spark.lakehouse.checkpoint import JobCheckpoint
from hoopstat_haus_spark.lakehouse.compaction import (
    CompactionPolicy,
    compact_partition,
    output_file_count,
    plan_compaction,
    plan_unit_bounds,
)
from hoopstat_haus_spark.lakehouse.metrics import JobMetrics
from hoopstat_haus_spark.lakehouse.schema import TableSchema, evolved, read_schema, write_schema
from hoopstat_haus_spark.lakehouse.snapshots import Snapshot, SnapshotLog
from hoopstat_haus_spark.lakehouse.zorder import with_zkey

DATA_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]  # base (schema v1)

# Max file paths per parquet relation in scan(); larger selections union
# chunked reads (see the module docstring's scale-bound note).
SCAN_PATHS_CHUNK = 100_000


class TokenLakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.log = SnapshotLog(self.path)

    # ----------------------------------------------------------- schema
    def schema_def(self, snapshot_id: int | None = None) -> TableSchema:
        """The live schema, or the one stamped on a pinned snapshot."""
        if snapshot_id is not None:
            snap = self.log.get(snapshot_id)
            return read_schema(self.path, snap.summary.get("schema_version", 1))
        return read_schema(self.path)

    def evolve_schema(self, add_fields: list[dict]) -> Snapshot:
        """Add columns (``{"name", "type", "default"}``) — metadata-only:
        no data file is touched; a new snapshot stamps the new version
        over the SAME manifest. Old files read the new columns as their
        default (schema.py module docstring)."""
        head = self.log.current()
        new_schema = evolved(self.schema_def(), add_fields)
        schema_file = write_schema(self.path, new_schema)
        try:
            return self.log.commit(
                head.manifest,
                "schema",
                {**head.summary, "schema_version": new_schema.version},
                expected_parent=head.snapshot_id,
            )
        except Exception:
            # a lost optimistic-concurrency race must not leave the
            # orphan schema-vK.json behind: read_schema resolves the max
            # version on disk, so the orphan would become the live schema
            # with no committed snapshot stamping it, and a retry would
            # fail on write_schema's exclusive create.
            try:
                os.remove(schema_file)
            except OSError:
                pass
            raise

    # ------------------------------------------------------------ write
    @property
    def data_dir(self) -> str:
        return os.path.join(self.path, "data")

    def _write_files(
        self, df: DataFrame, prefix: str, repartition_n: int | None, curve: str = "zorder"
    ) -> tuple[list[str], list[dict]]:
        """Stage a source-partitioned write, then rename files into the
        table's data dirs. Returns (new table-relative paths, their
        manifest stats entries).

        The write goes through ``manifest.write_partitioned_with_stats``:
        ONE job writes the files AND computes their manifest stats,
        replacing the old partitionBy write plus a column-pruned re-read
        of every new file for ``compute_file_stats`` — every write path
        (create/append/merge/DML/WAP) drops a full stats job and its
        stage boundaries. ``curve`` names the curve a stored ``_zkey``
        was computed with (ignored for unclustered input, which sketches
        the derived Morton key exactly like ``compute_file_stats``)."""
        job = f"{prefix}-{uuid.uuid4().hex[:10]}"
        staging = os.path.join(self.path, ".staging", job)
        out = df
        if repartition_n:
            out = out.repartition(repartition_n)
        keep = set(self.schema_def().names()) | {mf.ZKEY_COL}
        out = out.select(*[c for c in out.columns if c in keep])
        os.makedirs(staging, exist_ok=True)
        codec, level = mf.parquet_codec_conf(self.spark)
        zq_curve = curve if mf.ZKEY_COL in out.columns else "zorder"
        rows = mf.write_partitioned_with_stats(out, staging, codec, level)
        new_rel: list[str] = []
        entries: list[dict] = []
        seq: dict[str, int] = {}
        for r in sorted(rows, key=lambda x: (x["dir"], x["pid"], x["file_name"])):
            d = r["dir"]
            s = seq.get(d, 0)
            seq[d] = s + 1
            part_dir = os.path.join(self.data_dir, d)
            os.makedirs(part_dir, exist_ok=True)
            final = f"{job}-{s:05d}.parquet"
            os.replace(os.path.join(staging, d, r["file_name"]), os.path.join(part_dir, final))
            rel = f"data/{d}/{final}"
            new_rel.append(rel)
            entries.append(
                {
                    "partition": r["partition"],
                    "row_count": r["row_count"],
                    "token_count": r["token_count"],
                    "min_doc_id": r["min_doc_id"],
                    "max_doc_id": r["max_doc_id"],
                    "min_n_tok": r["min_n_tok"],
                    "max_n_tok": r["max_n_tok"],
                    "zmin": r["zmin"],
                    "zmax": r["zmax"],
                    "zq": [int(z) for z in r["zq"]] or None,
                    "file_path": rel,
                    "file_bytes": os.path.getsize(os.path.join(part_dir, final)),
                    "zq_curve": zq_curve,
                }
            )
        shutil.rmtree(staging, ignore_errors=True)
        return new_rel, entries

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        repartition_n: int | None = None,
    ) -> "TokenLakeTable":
        """Create a table from a DataFrame. ``repartition_n`` is the
        fragmentation knob: N tasks × |sources| dirs → many small files,
        the state a fresh ingest leaves behind and compaction fixes."""
        t = cls(spark, path)
        if t.log.current_id() is not None:
            raise ValueError(f"table already exists at {path}")
        os.makedirs(t.data_dir, exist_ok=True)
        _new_files, entries = t._write_files(df, "append", repartition_n)
        rel = mf.write_manifest(t.path, entries)
        t.log.commit(rel, "append", t._stamp(_summary(entries)))
        return t

    def _stamp(self, summary: dict) -> dict:
        return {**summary, "schema_version": self.schema_def().version}

    def append(self, df: DataFrame, repartition_n: int | None = None) -> Snapshot:
        """Append a batch. Manifest cost is O(touched partitions): only
        the partitions the batch lands in get a new shard; the rest of
        the table is carried by reference in the new manifest list."""
        head = self.log.current()
        _new_files, fresh = self._write_files(self.schema_def().conform(df), "append", repartition_n)
        by_part: dict[str, list[dict]] = {}
        for e in fresh:
            by_part.setdefault(e["partition"], []).append(e)
        base = {r["partition"]: r for r in mf.read_manifest_list(self.path, head.manifest)}
        changed = {
            part: (mf.read_shard(self.path, base[part]) if part in base else []) + entries
            for part, entries in by_part.items()
        }
        rel, records = mf.update_manifest(self.path, head.manifest, changed)
        return self.log.commit(
            rel,
            "append",
            self._stamp(mf.summary_from_records(records)),
            expected_parent=head.snapshot_id,
        )

    # ------------------------------------------------------------- read
    def manifest_entries(self, snapshot_id: int | None = None) -> list[dict]:
        snap = self.log.get(snapshot_id) if snapshot_id else self.log.current()
        if snap is None:
            return []
        return mf.read_manifest(self.path, snap.manifest)

    # ------------------------------------- metadata inspection tables
    # Iceberg's `table.history` / `table.files` / `table.partitions`
    # surface (reference analog: the per-date success map + summary
    # manifest lineage, SURVEY M5/M9) as DataFrames, so operators can
    # join/filter table metadata with the same API as data.

    def history(self) -> DataFrame:
        """One row per retained snapshot, newest last. Metadata-only:
        O(retained) snapshot-JSON reads driver-side (expiry bounds the
        count); no manifest shard or data file is opened."""
        cur = self.log.current_id()
        tags_by_id: dict[int, list[str]] = {}
        for name, sid in sorted(self.log.tags().items()):
            tags_by_id.setdefault(sid, []).append(name)
        rows = [
            (
                s.snapshot_id,
                s.parent_id,
                s.timestamp_ms,
                s.operation,
                int(s.summary.get("rows", 0)),
                int(s.summary.get("files", 0)),
                s.summary.get("schema_version"),
                s.snapshot_id == cur,
                tags_by_id.get(s.snapshot_id, []),
            )
            for s in (self.log.get(sid) for sid in self.log.list_ids())
        ]
        return self.spark.createDataFrame(
            rows,
            "snapshot_id long, parent_id long, committed_ms long, operation string, "
            "rows long, files long, schema_version int, is_current boolean, "
            "tags array<string>",
        )

    def partitions(self, snapshot_id: int | None = None) -> DataFrame:
        """Per-partition rollup straight from the manifest LIST —
        O(partitions) metadata, no shard parquet is opened."""
        snap = self.log.get(snapshot_id) if snapshot_id else self.log.current()
        recs = mf.read_manifest_list(self.path, snap.manifest) if snap else []
        rows = [
            (r["partition"], r["n_files"], r["row_count"], r["token_count"], r["file_bytes"])
            for r in recs
        ]
        return self.spark.createDataFrame(
            rows, "partition string, n_files long, rows long, tokens long, bytes long"
        )

    def files(
        self, snapshot_id: int | None = None, sources: list[str] | None = None
    ) -> DataFrame:
        """One row per live data file with its manifest stats (the zq
        planning sketch is dropped — inspect via ``manifest_entries``).
        ``sources`` prunes at shard level BEFORE any shard is opened,
        same as ``scan``; an unfiltered call materializes O(files) rows
        through the driver — the same footprint as ``manifest_entries``
        and an Iceberg planner's file list."""
        snap = self.log.get(snapshot_id) if snapshot_id else self.log.current()
        entries: list[dict] = []
        if snap is not None:
            for rec in mf.read_manifest_list(self.path, snap.manifest):
                if sources is not None and rec["partition"] not in sources:
                    continue
                entries.extend(mf.read_shard(self.path, rec))
        cols = (
            "file_path",
            "partition",
            "row_count",
            "token_count",
            "min_doc_id",
            "max_doc_id",
            "min_n_tok",
            "max_n_tok",
            "zmin",
            "zmax",
            "file_bytes",
            "zq_curve",
        )
        return self.spark.createDataFrame(
            [tuple(e.get(c) for c in cols) for e in entries],
            "file_path string, partition string, row_count long, token_count long, "
            "min_doc_id string, max_doc_id string, min_n_tok int, max_n_tok int, "
            "zmin long, zmax long, file_bytes long, zq_curve string",
        )

    def scan(
        self,
        snapshot_id: int | None = None,
        include_zkey: bool = False,
        n_tok_min: int | None = None,
        n_tok_max: int | None = None,
        sources: list[str] | None = None,
        tag: str | None = None,
        as_of_ms: int | None = None,
    ) -> DataFrame:
        """Snapshot-pinned scan with manifest-based file pruning.

        Partition (``sources``) and stat (``n_tok`` range) predicates are
        applied to manifest min/max BEFORE Spark sees a file list — the
        driver-side analog of the reference's QueryPatternOptimizer prefix
        pruning (``partitioning.py:166-266``) — then again as real
        filters so parquet row-group pushdown finishes the job.

        Pruning is TWO-level: the manifest list's per-shard aggregates
        drop whole partitions first (a pruned shard's parquet is never
        even opened), then the surviving shards' per-file stats prune
        files. A source-filtered scan of a 10^4-partition table reads
        exactly the named partitions' shards.

        ``tag`` pins the scan to a named snapshot ref (``set_tag``),
        ``as_of_ms`` to the newest retained snapshot committed at or
        before that timestamp (Delta's TIMESTAMP AS OF) — each mutually
        exclusive with an explicit ``snapshot_id`` and each other.
        """
        if sum(x is not None for x in (snapshot_id, tag, as_of_ms)) > 1:
            raise ValueError("pass at most one of snapshot_id, tag, as_of_ms")
        if tag is not None:
            snapshot_id = self.log.resolve_tag(tag)
        if as_of_ms is not None:
            snapshot_id = self.log.snapshot_as_of(as_of_ms)
        schema = self.schema_def(snapshot_id)
        snap = self.log.get(snapshot_id) if snapshot_id else self.log.current()
        entries: list[dict] = []
        if snap is not None:
            for rec in mf.read_manifest_list(self.path, snap.manifest):
                if sources is not None and rec["partition"] not in sources:
                    continue
                if n_tok_min is not None and rec["max_n_tok"] < n_tok_min:
                    continue
                if n_tok_max is not None and rec["min_n_tok"] > n_tok_max:
                    continue
                entries.extend(mf.read_shard(self.path, rec))
        if sources is not None:
            entries = [e for e in entries if e["partition"] in sources]
        if n_tok_min is not None:
            entries = [e for e in entries if e["max_n_tok"] >= n_tok_min]
        if n_tok_max is not None:
            entries = [e for e in entries if e["min_n_tok"] <= n_tok_max]
        if not entries:
            return self.spark.createDataFrame([], schema=schema.ddl())
        paths = [os.path.join(self.path, e["file_path"]) for e in entries]

        # explicit expected schema: files older than an evolved column
        # read it as NULL (then its default applies) instead of the
        # reader inferring a random file's footer on mixed-schema scans
        def read_chunk(chunk: list[str]) -> DataFrame:
            return (
                self.spark.read.option("basePath", self.data_dir)
                .schema(schema.ddl(extra=((mf.ZKEY_COL, "long"),)))
                .parquet(*chunk)
            )

        if len(paths) <= SCAN_PATHS_CHUNK:
            df = read_chunk(paths)
        else:
            # huge selections: cap each relation's file-index size; the
            # union of scans plans the same physical reads and every
            # filter below pushes into each branch
            df = read_chunk(paths[:SCAN_PATHS_CHUNK])
            for i in range(SCAN_PATHS_CHUNK, len(paths), SCAN_PATHS_CHUNK):
                df = df.unionByName(read_chunk(paths[i : i + SCAN_PATHS_CHUNK]))
        df = schema.apply_defaults(df)
        if n_tok_min is not None:
            df = df.filter(F.col("n_tok") >= n_tok_min)
        if n_tok_max is not None:
            df = df.filter(F.col("n_tok") <= n_tok_max)
        if not include_zkey and mf.ZKEY_COL in df.columns:
            df = df.drop(mf.ZKEY_COL)
        return df

    # ------------------------------------------- maintenance: compaction
    def compact(
        self,
        policy: CompactionPolicy | None = None,
        curve: str = "zorder",
        strategy: str = "sort",
        job_id: str | None = None,
        max_concurrent_units: int | None = None,
        sources: list[str] | None = None,
        curve_by_source: dict[str, str] | None = None,
    ) -> tuple[Snapshot | None, JobMetrics]:
        """Full compaction + Z-order cycle; resumable via ``job_id``.

        ``sources`` restricts the run to the named partitions (targeted
        maintenance: incremental compaction of changed partitions);
        None compacts every partition the planner flags.

        ``curve_by_source`` overrides the space-filling curve for the
        named partitions (everything else uses ``curve``), so a table
        with per-partition layout choices compacts in ONE cycle — one
        bounds plan, one stats pass per unit, ONE snapshot commit —
        instead of one full cycle per curve.

        Per-partition units run through the lineage checkpoint: a re-run
        with the same job_id skips finished partitions (their outputs are
        already staged into the data dirs) and commits ONE snapshot at
        the end. Crash anywhere → readers still see the old snapshot.

        Units are submitted concurrently (``max_concurrent_units``
        driver threads): Spark's scheduler interleaves their stages, so
        small partitions fill task slots a big partition's tail leaves
        idle — without this, per-source sequencing caps utilization at
        each source's own partition count. Default (None) is
        scale-adaptive: max(4, defaultParallelism // 2), so a
        many-partition table on a wide cluster isn't throttled to 4
        in-flight units while most cores idle.
        """
        if max_concurrent_units is None:
            max_concurrent_units = max(4, self.spark.sparkContext.defaultParallelism // 2)
        policy = policy or CompactionPolicy()
        job_id = job_id or f"compact-{uuid.uuid4().hex[:10]}"
        metrics = JobMetrics(job=job_id)
        try:
            return self._compact_run(
                policy, curve, strategy, job_id, max_concurrent_units, metrics, sources,
                curve_by_source,
            )
        except Exception as exc:
            # crashed maintenance must surface in the health rollup:
            # without a 'failed' record, DEGRADED/OUTAGE are unreachable
            # and a stage crashing for days still reads OPERATIONAL from
            # its last old success. The job stays resumable (checkpoint
            # intact); only the metrics record marks the failure.
            from hoopstat_haus_spark.lakehouse.health import record_job_metrics

            metrics.finish()
            try:
                record_job_metrics(
                    self.path, metrics, "compact", status="failed", error=repr(exc)[:500]
                )
            except OSError:
                pass  # a full/read-only disk must not mask the root cause
            raise

    def _compact_run(
        self,
        policy: CompactionPolicy,
        curve: str,
        strategy: str,
        job_id: str,
        max_concurrent_units: int,
        metrics: JobMetrics,
        sources: list[str] | None = None,
        curve_by_source: dict[str, str] | None = None,
    ) -> tuple[Snapshot | None, JobMetrics]:
        cb = curve_by_source or {}

        def unit_curve(part: str) -> str:
            return cb.get(part, curve)

        head = self.log.current()
        records = mf.read_manifest_list(self.path, head.manifest)
        # Exact shard-level prefilter mirroring plan_compaction's
        # candidate test: a partition can hold a rewrite candidate only
        # if its smallest file is undersized, its largest oversized, or
        # it contains unclustered files — all exact aggregates in the
        # manifest list, so a well-compacted partition's shard is never
        # even opened (O(touched) planning, not O(all files)).
        want = set(sources) if sources is not None else None
        cand_records = [
            r
            for r in records
            if (want is None or r["partition"] in want)
            and (
                r["min_file_bytes"] < policy.min_file_bytes
                or r["max_file_bytes"] > policy.max_file_bytes
                or r["n_unclustered"] > 0
            )
        ]
        shard_entries = {r["partition"]: mf.read_shard(self.path, r) for r in cand_records}
        entries = [e for es in shard_entries.values() for e in es]
        plans = plan_compaction(entries, policy)
        if not plans:
            return None, metrics.finish()

        ckpt = JobCheckpoint(self.path, job_id)
        done = ckpt.completed_units()
        rewritten: set[str] = set()
        new_files: list[str] = []
        pending: list[tuple[str, list[dict]]] = []
        fresh: list[dict] = []  # per-file stats, computed inside units
        stale_stat_units: list[tuple[str, list[str]]] = []  # resumed pre-stats checkpoints
        for part, groups in plans.items():
            inputs = [f for g in groups for f in g.files]
            rewritten.update(f["file_path"] for f in inputs)
            metrics.files_in += len(inputs)
            metrics.bytes_in += sum(f["file_bytes"] for f in inputs)
            metrics.rows += sum(f["row_count"] for f in inputs)
            metrics.tokens += sum(f["token_count"] for f in inputs)
            metrics.partitions += 1
            if part in done:
                new_files.extend(done[part]["output_files"])
                if done[part].get("output_stats") is not None:
                    fresh.extend(done[part]["output_stats"])
                else:
                    stale_stat_units.append((part, done[part]["output_files"]))
            else:
                pending.append((part, inputs))

        read_ddl = self.schema_def().ddl(extra=((mf.ZKEY_COL, "long"),))
        unit_bounds: dict[str, list[int]] = {}
        if strategy == "sort" and pending:
            unit_bounds = plan_unit_bounds(
                self.spark,
                self.path,
                {part: inputs for part, inputs in pending},
                {
                    part: output_file_count(sum(f["file_bytes"] for f in inputs), policy)
                    for part, inputs in pending
                },
                curve=curve,
                curve_by_source=cb,
            )

        def _run_unit(part: str, inputs: list[dict]) -> tuple[list[str], list[dict]]:
            in_paths = [f["file_path"] for f in inputs]
            t0 = time.time()
            ckpt.intent(part, in_paths)
            # stats come back from the SAME job that writes the files
            # (compaction._write_sorted_with_stats): one job per unit
            # instead of write + a column-pruned re-read of the output —
            # fewer stage boundaries (the serial tail costs 4x in N->4N
            # scaling) and ~GB-scale less read I/O per cycle
            out, stats = compact_partition(
                self.spark,
                self.path,
                part,
                in_paths,
                sum(f["file_bytes"] for f in inputs),
                policy,
                job_id,
                curve=unit_curve(part),
                strategy=strategy,
                read_ddl=read_ddl,
                bounds=unit_bounds.get(part),
            )
            ckpt.done(
                part,
                in_paths,
                out,
                rows=sum(f["row_count"] for f in inputs),
                tokens=sum(f["token_count"] for f in inputs),
                duration_s=time.time() - t0,
                output_stats=stats,
            )
            return out, stats

        if pending:
            from concurrent.futures import ThreadPoolExecutor

            workers = max(1, min(max_concurrent_units, len(pending)))
            # biggest partitions first: small ones backfill the tail.
            # (A single globally-routed job for ALL units — one map
            # stage, one shuffle, one write stage — was built and
            # interleaved-A/B'd in round 6: it trades the per-unit job
            # boundaries for a global shuffle BARRIER, which loses the
            # map/write pipelining across units. Measured min-of-K:
            # ~7% faster at local[4]/800k but ~10% SLOWER at
            # local[16]/3.2M and neutral at local[1]; at 10^4-partition
            # scale the barrier and the CASE-per-source routing plan
            # only get worse, so the pipelined per-unit design stays.)
            pending.sort(key=lambda pu: -sum(f["file_bytes"] for f in pu[1]))
            # size map partitions to the JOB, not the default: small-file
            # inputs coalesce under maxPartitionBytes, and the 128 MB
            # default can leave a big cluster mostly idle through the
            # whole map stage (e.g. 1 GB hot partition → 8 read tasks on
            # 16+ cores). Target ≈ 3 waves of map tasks per core.
            conf_key = "spark.sql.files.maxPartitionBytes"
            aqe_key = "spark.sql.adaptive.enabled"
            par = self.spark.sparkContext.defaultParallelism
            total_in = sum(f["file_bytes"] for _p, inputs in pending for f in inputs)
            sized = min(128 << 20, max(4 << 20, total_in // max(par * 3, 1)))
            prev = self.spark.conf.get(conf_key)
            prev_aqe = self.spark.conf.get(aqe_key)
            self.spark.conf.set(conf_key, str(sized))
            # AQE's per-shuffle-stage materialization barrier buys
            # nothing here — bucket routing is explicit and the key is
            # near-unique (no skew to re-plan) — and costs 8-20% wall
            # (interleaved A/B, BENCH.md). Queries keep AQE.
            self.spark.conf.set(aqe_key, "false")
            try:
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    for out, stats in pool.map(lambda pu: _run_unit(*pu), pending):
                        new_files.extend(out)
                        fresh.extend(stats)
            finally:
                self.spark.conf.set(conf_key, prev)
                self.spark.conf.set(aqe_key, prev_aqe)

        if stale_stat_units:  # resumed units checkpointed before stats existed
            by_curve: dict[str, list[str]] = {}
            for part, files in stale_stat_units:
                by_curve.setdefault(unit_curve(part), []).extend(files)
            for c, files in sorted(by_curve.items()):
                fresh.extend(mf.compute_file_stats(self.spark, self.path, files, curve=c))
        metrics.files_out = len(fresh)
        metrics.bytes_out = sum(e["file_bytes"] for e in fresh)
        fresh_by_part: dict[str, list[dict]] = {}
        for e in fresh:
            fresh_by_part.setdefault(e["partition"], []).append(e)
        # only PLANNED partitions get a new shard (kept files + fresh
        # outputs); every other shard is carried by reference
        changed = {
            part: [e for e in shard_entries[part] if e["file_path"] not in rewritten]
            + fresh_by_part.get(part, [])
            for part in plans
        }
        rel, new_records = mf.update_manifest(self.path, head.manifest, changed)
        snap = self.log.commit(
            rel,
            "compact",
            self._stamp(
                {
                    **mf.summary_from_records(new_records),
                    "job_id": job_id,
                    "curve": curve,
                    **({"curve_by_source": cb} if cb else {}),
                    "strategy": strategy,
                }
            ),
            expected_parent=head.snapshot_id,
        )
        metrics.finish()
        from hoopstat_haus_spark.lakehouse.health import record_job_metrics

        record_job_metrics(self.path, metrics, "compact", snapshot_id=snap.snapshot_id)
        return snap, metrics

    # ------------------------------------------- maintenance: row delete
    def delete_where(
        self,
        condition,
        job_id: str | None = None,
        sources: list[str] | None = None,
        curve: str = "zorder",
    ):
        """Predicate DELETE (copy-on-write; see lakehouse/delete.py)."""
        from hoopstat_haus_spark.lakehouse.delete import delete_where

        return delete_where(self, condition, job_id=job_id, sources=sources, curve=curve)

    # ------------------------------------------- maintenance: row update
    def update_where(
        self,
        condition,
        assignments: dict,
        job_id: str | None = None,
        sources: list[str] | None = None,
        curve: str = "zorder",
    ):
        """Predicate UPDATE SET (copy-on-write; see lakehouse/update.py)."""
        from hoopstat_haus_spark.lakehouse.update import update_where

        return update_where(
            self, condition, assignments, job_id=job_id, sources=sources, curve=curve
        )

    # ------------------------------------------------- change data feed
    def changes(self, from_snapshot_id: int, to_snapshot_id: int | None = None) -> DataFrame:
        """Row-level net changes between snapshots (lakehouse/changes.py)."""
        from hoopstat_haus_spark.lakehouse.changes import table_changes

        return table_changes(self, from_snapshot_id, to_snapshot_id)

    # -------------------------------------- incremental planning (M8)
    def changed_partitions_since(self, snapshot_id: int) -> dict[str, dict]:
        """Snapshot-diff: which partitions gained/lost files since
        ``snapshot_id`` — the engine's incremental-discovery primitive
        (reference analog: lookback-window freshness checks,
        ``apps/gold-analytics/app/s3_discovery.py:240-314``). Downstream
        jobs re-derive ONLY these partitions instead of rescanning.

        Shard-aware: a partition whose manifest shard is carried by
        reference between the two snapshots (same shard path) is skipped
        without reading it — the diff costs O(changed partitions)."""
        old_snap = self.log.get(snapshot_id)
        new_snap = self.log.current()
        out: dict[str, dict] = {}
        for part, old_entries, new_entries in mf.diff_partition_entries(
            self.path, old_snap.manifest, new_snap.manifest
        ):
            old_files = {e["file_path"]: e for e in old_entries}
            new_files = {e["file_path"]: e for e in new_entries}
            d = {"added_files": 0, "removed_files": 0, "row_delta": 0}
            for path, e in new_files.items():
                if path not in old_files:
                    d["added_files"] += 1
                    d["row_delta"] += e["row_count"]
            for path, e in old_files.items():
                if path not in new_files:
                    d["removed_files"] += 1
                    d["row_delta"] -= e["row_count"]
            if d["added_files"] or d["removed_files"]:
                out[part] = d
        return out

    # ----------------------------------------------- rollback (restore)
    def rollback(self, snapshot_id: int | None = None, tag: str | None = None) -> Snapshot:
        """Restore the table's DATA state to an earlier snapshot as a NEW
        commit (Iceberg ``rollback_to_snapshot`` semantics): the target's
        manifest is carried by reference — zero data I/O, O(partitions)
        list-file metadata, one atomic pointer swap. History stays
        intact: the rolled-back-FROM state remains pinnable/taggable, and
        the change feed across the rollback emits exactly the inverse of
        the undone commits' row changes (it is an ordinary manifest
        file-diff). GC reachability follows from the snapshot record, so
        the restored files are protected for as long as the rollback
        snapshot (or any tag on it) is retained.

        Schema is NOT rolled back: evolution here is additive-with-
        defaults (schema.py), so HEAD reads of the restored files under
        the live schema fill evolved columns with their defaults — the
        same mixed-schema contract every scan already honors. The live
        schema version is stamped on the rollback snapshot.
        """
        if (snapshot_id is None) == (tag is None):
            raise ValueError("pass exactly one of snapshot_id, tag")
        if tag is not None:
            snapshot_id = self.log.resolve_tag(tag)
        head = self.log.current()
        if head is not None and snapshot_id == head.snapshot_id:
            raise ValueError(f"v{snapshot_id} is already HEAD")
        try:
            target = self.log.get(snapshot_id)
        except FileNotFoundError:
            raise ValueError(
                f"snapshot v{snapshot_id} does not exist (expired or never committed)"
            ) from None
        summary = mf.summary_from_records(mf.read_manifest_list(self.path, target.manifest))
        return self.log.commit(
            target.manifest,
            "rollback",
            self._stamp({**summary, "restored_snapshot_id": snapshot_id}),
            expected_parent=head.snapshot_id if head else None,
        )

    # --------------------------------------------------- tags (named refs)
    def tag(self, name: str, snapshot_id: int | None = None, replace: bool = False) -> dict:
        """Pin a named ref to a snapshot (default HEAD); tagged snapshots
        survive ``expire_snapshots`` + GC until the tag is dropped."""
        return self.log.set_tag(name, snapshot_id=snapshot_id, replace=replace)

    def drop_tag(self, name: str) -> None:
        self.log.drop_tag(name)

    def tags(self) -> dict[str, int]:
        return self.log.tags()

    # ---------------------------------------------- maintenance: expiry
    def expire_snapshots(self, keep_last: int = 2, older_than_ms: int | None = None) -> list[int]:
        return self.log.expire(keep_last, older_than_ms=older_than_ms)

    def collect_garbage(self, min_age_s: float | None = None) -> dict:
        from hoopstat_haus_spark.lakehouse.gc import DEFAULT_MIN_AGE_S, collect_garbage

        return collect_garbage(
            self.path, min_age_s=DEFAULT_MIN_AGE_S if min_age_s is None else min_age_s
        )


def _summary(entries: list[dict]) -> dict:
    return {
        "files": len(entries),
        "rows": int(sum(e["row_count"] for e in entries)),
        "tokens": int(sum(e["token_count"] for e in entries)),
        "bytes": int(sum(e["file_bytes"] for e in entries)),
        "partitions": len({e["partition"] for e in entries}),
    }
