"""TokenLakeTable: the engine facade — create/scan/append/compact/merge/GC.

Layout (SURVEY.md §7.2):

    <path>/data/source=<s>/<file>.parquet     data files (Hive dirs)
    <path>/_manifests/manifest-*.parquet      per-file stats (manifest.py)
    <path>/_snapshots/v<N>.json + current     snapshot log (snapshots.py)
    <path>/_checkpoints/<job_id>/*.json       lineage (checkpoint.py)

Readers always resolve data files THROUGH a snapshot's manifest — never
by listing directories — which is what makes commits atomic and scans
snapshot-isolated (reference analog: downstream only reacts to the
silver-ready marker, ``meta/adr/ADR-028:33-38``).
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

    def _write_files(self, df: DataFrame, prefix: str, repartition_n: int | None) -> list[str]:
        """Stage a partitionBy('source') write, then rename files into the
        table's data dirs. Returns new table-relative paths."""
        job = f"{prefix}-{uuid.uuid4().hex[:10]}"
        staging = os.path.join(self.path, ".staging", job)
        out = df
        if repartition_n:
            out = out.repartition(repartition_n)
        keep = set(self.schema_def().names()) | {mf.ZKEY_COL}
        (
            out.select(*[c for c in out.columns if c in keep])
            .write.mode("overwrite")
            .partitionBy("source")
            .parquet(staging)
        )
        new_rel: list[str] = []
        for src_dir in sorted(os.listdir(staging)):
            if not src_dir.startswith("source="):
                continue
            part_dir = os.path.join(self.data_dir, src_dir)
            os.makedirs(part_dir, exist_ok=True)
            seq = 0
            for name in sorted(os.listdir(os.path.join(staging, src_dir))):
                if not name.endswith(".parquet"):
                    continue
                final = f"{job}-{seq:05d}.parquet"
                os.replace(os.path.join(staging, src_dir, name), os.path.join(part_dir, final))
                new_rel.append(f"data/{src_dir}/{final}")
                seq += 1
        shutil.rmtree(staging, ignore_errors=True)
        return new_rel

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
        new_files = t._write_files(df, "append", repartition_n)
        entries = mf.compute_file_stats(spark, t.path, new_files)
        rel = mf.write_manifest(t.path, entries)
        t.log.commit(rel, "append", t._stamp(_summary(entries)))
        return t

    def _stamp(self, summary: dict) -> dict:
        return {**summary, "schema_version": self.schema_def().version}

    def append(self, df: DataFrame, repartition_n: int | None = None) -> Snapshot:
        head = self.log.current()
        new_files = self._write_files(self.schema_def().conform(df), "append", repartition_n)
        entries = mf.read_manifest(self.path, head.manifest) + mf.compute_file_stats(
            self.spark, self.path, new_files
        )
        rel = mf.write_manifest(self.path, entries)
        return self.log.commit(
            rel, "append", self._stamp(_summary(entries)), expected_parent=head.snapshot_id
        )

    # ------------------------------------------------------------- read
    def manifest_entries(self, snapshot_id: int | None = None) -> list[dict]:
        snap = self.log.get(snapshot_id) if snapshot_id else self.log.current()
        if snap is None:
            return []
        return mf.read_manifest(self.path, snap.manifest)

    def scan(
        self,
        snapshot_id: int | None = None,
        include_zkey: bool = False,
        n_tok_min: int | None = None,
        n_tok_max: int | None = None,
        sources: list[str] | None = None,
    ) -> DataFrame:
        """Snapshot-pinned scan with manifest-based file pruning.

        Partition (``sources``) and stat (``n_tok`` range) predicates are
        applied to manifest min/max BEFORE Spark sees a file list — the
        driver-side analog of the reference's QueryPatternOptimizer prefix
        pruning (``partitioning.py:166-266``) — then again as real
        filters so parquet row-group pushdown finishes the job.
        """
        schema = self.schema_def(snapshot_id)
        entries = self.manifest_entries(snapshot_id)
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
        df = (
            self.spark.read.option("basePath", self.data_dir)
            .schema(schema.ddl(extra=((mf.ZKEY_COL, "long"),)))
            .parquet(*paths)
        )
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
        max_concurrent_units: int = 4,
        sources: list[str] | None = None,
    ) -> tuple[Snapshot | None, JobMetrics]:
        """Full compaction + Z-order cycle; resumable via ``job_id``.

        ``sources`` restricts the run to the named partitions (targeted
        maintenance: incremental compaction of changed partitions, or
        per-partition curve choice); None compacts every partition the
        planner flags.

        Per-partition units run through the lineage checkpoint: a re-run
        with the same job_id skips finished partitions (their outputs are
        already staged into the data dirs) and commits ONE snapshot at
        the end. Crash anywhere → readers still see the old snapshot.

        Units are submitted concurrently (``max_concurrent_units``
        driver threads): Spark's scheduler interleaves their stages, so
        small partitions fill task slots a big partition's tail leaves
        idle — without this, per-source sequencing caps utilization at
        each source's own partition count.
        """
        policy = policy or CompactionPolicy()
        job_id = job_id or f"compact-{uuid.uuid4().hex[:10]}"
        metrics = JobMetrics(job=job_id)
        try:
            return self._compact_run(
                policy, curve, strategy, job_id, max_concurrent_units, metrics, sources
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
    ) -> tuple[Snapshot | None, JobMetrics]:
        head = self.log.current()
        entries = mf.read_manifest(self.path, head.manifest)
        plans = plan_compaction(entries, policy)
        if sources is not None:
            plans = {p: g for p, g in plans.items() if p in set(sources)}
        if not plans:
            return None, metrics.finish()

        ckpt = JobCheckpoint(self.path, job_id)
        done = ckpt.completed_units()
        rewritten: set[str] = set()
        new_files: list[str] = []
        pending: list[tuple[str, list[dict]]] = []
        fresh: list[dict] = []  # per-file stats, computed inside units
        stale_stat_files: list[str] = []  # resumed units from pre-stats checkpoints
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
                    stale_stat_files.extend(done[part]["output_files"])
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
            )

        def _run_unit(part: str, inputs: list[dict]) -> tuple[list[str], list[dict]]:
            in_paths = [f["file_path"] for f in inputs]
            t0 = time.time()
            ckpt.intent(part, in_paths)
            out = compact_partition(
                self.spark,
                self.path,
                part,
                in_paths,
                sum(f["file_bytes"] for f in inputs),
                policy,
                job_id,
                curve=curve,
                strategy=strategy,
                read_ddl=read_ddl,
                bounds=unit_bounds.get(part),
            )
            # stats for THIS unit's output inside the unit thread: it
            # overlaps other units' rewrites instead of serializing one
            # all-files stats job between the last rewrite and the
            # commit (the serial tail costs 4x in N->4N scaling)
            stats = mf.compute_file_stats(self.spark, self.path, out, curve=curve)
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
            # biggest partitions first: small ones backfill the tail
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

        new_entries = [e for e in entries if e["file_path"] not in rewritten]
        if stale_stat_files:  # resumed units checkpointed before stats existed
            fresh.extend(
                mf.compute_file_stats(self.spark, self.path, stale_stat_files, curve=curve)
            )
        metrics.files_out = len(fresh)
        metrics.bytes_out = sum(e["file_bytes"] for e in fresh)
        new_entries.extend(fresh)
        rel = mf.write_manifest(self.path, new_entries)
        snap = self.log.commit(
            rel,
            "compact",
            self._stamp(
                {**_summary(new_entries), "job_id": job_id, "curve": curve, "strategy": strategy}
            ),
            expected_parent=head.snapshot_id,
        )
        metrics.finish()
        from hoopstat_haus_spark.lakehouse.health import record_job_metrics

        record_job_metrics(self.path, metrics, "compact", snapshot_id=snap.snapshot_id)
        return snap, metrics

    # -------------------------------------- incremental planning (M8)
    def changed_partitions_since(self, snapshot_id: int) -> dict[str, dict]:
        """Snapshot-diff: which partitions gained/lost files since
        ``snapshot_id`` — the engine's incremental-discovery primitive
        (reference analog: lookback-window freshness checks,
        ``apps/gold-analytics/app/s3_discovery.py:240-314``). Downstream
        jobs re-derive ONLY these partitions instead of rescanning."""
        old = {e["file_path"]: e for e in self.manifest_entries(snapshot_id)}
        new = {e["file_path"]: e for e in self.manifest_entries()}
        out: dict[str, dict] = {}
        for path, e in new.items():
            if path not in old:
                d = out.setdefault(e["partition"], {"added_files": 0, "removed_files": 0, "row_delta": 0})
                d["added_files"] += 1
                d["row_delta"] += e["row_count"]
        for path, e in old.items():
            if path not in new:
                d = out.setdefault(e["partition"], {"added_files": 0, "removed_files": 0, "row_delta": 0})
                d["removed_files"] += 1
                d["row_delta"] -= e["row_count"]
        return out

    # ---------------------------------------------- maintenance: expiry
    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        return self.log.expire(keep_last)

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
