"""Pipeline-health aggregation across maintenance jobs.

Reference: ``apps/health-aggregator/app/aggregator.py:1-423`` — per-stage
daily summaries rolled into a validated health report with
OPERATIONAL / DEGRADED / OUTAGE statuses (most-recent-run semantics,
worst-stage-wins overall, ``_derive_stage_statuses`` at :190-257).

Engine version: every maintenance job (compact / merge) appends a JSON
metrics record to ``_metrics/`` at commit time; :func:`health_report`
rolls the records up per operation with the reference's status rules:

- OPERATIONAL — the most recent run of the operation succeeded
- DEGRADED   — the most recent run failed, but some run in the lookback
               succeeded
- OUTAGE     — no successful run in the lookback window
- overall    — worst stage wins (OUTAGE > DEGRADED > OPERATIONAL)

Scale note: records are metadata (one small JSON per job). The rollup
here is driver-side; if a deployment produces millions of job records,
the same aggregation is one ``spark.read.json("_metrics/")`` groupBy.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from hoopstat_haus_spark.lakehouse.metrics import JobMetrics

OPERATIONAL = "operational"
DEGRADED = "degraded"
OUTAGE = "outage"

_SEVERITY = {OPERATIONAL: 0, DEGRADED: 1, OUTAGE: 2}


def _metrics_dir(table_path: str) -> str:
    return os.path.join(table_path, "_metrics")


def record_job_metrics(
    table_path: str,
    metrics: JobMetrics,
    operation: str,
    status: str = "success",
    snapshot_id: int | None = None,
    error: str | None = None,
) -> str:
    """Append one job record; returns its path. Immutable, uniquely named
    — concurrent writers never collide."""
    d = _metrics_dir(table_path)
    os.makedirs(d, exist_ok=True)
    rec = {
        **metrics.to_dict(),
        "operation": operation,
        "status": status,
        "snapshot_id": snapshot_id,
        "error": error,
        "recorded_ms": int(time.time() * 1000),
        # ns tiebreaker: two records in the same millisecond (e.g. a
        # job's auto-record then an orchestrator's follow-up) must still
        # order deterministically for most-recent-run status rules
        "recorded_ns": time.time_ns(),
    }
    path = os.path.join(d, f"{rec['recorded_ms']}-{operation}-{uuid.uuid4().hex[:6]}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    return path


def read_job_records(table_path: str) -> list[dict]:
    d = _metrics_dir(table_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
        except (OSError, ValueError):
            continue
    out.sort(key=lambda r: (r.get("recorded_ms", 0), r.get("recorded_ns", 0)))
    return out


def _stage_status(records: list[dict]) -> str:
    """Reference rules (aggregator.py:190-257): most recent run decides;
    older successes downgrade a missing/failed head to DEGRADED."""
    if not records:
        return OUTAGE
    most_recent = records[-1]
    if most_recent.get("status") == "success":
        return OPERATIONAL
    if any(r.get("status") == "success" for r in records):
        return DEGRADED
    return OUTAGE


def health_report(
    table_path: str, lookback_jobs: int = 50, max_staleness_ms: int | None = None
) -> dict:
    """Aggregate the last ``lookback_jobs`` records per operation into the
    reference's health-report shape.

    ``max_staleness_ms``: optional freshness rule — a stage whose most
    recent SUCCESS is older than this window is downgraded to DEGRADED
    even if that old run succeeded (a stage that has been crashing
    before it can record anything, or simply not running, must not
    report OPERATIONAL from a stale success forever)."""
    records = read_job_records(table_path)
    by_op: dict[str, list[dict]] = {}
    for r in records:
        by_op.setdefault(r.get("operation", "unknown"), []).append(r)

    stages: dict[str, dict] = {}
    for op, recs in sorted(by_op.items()):
        recs = recs[-lookback_jobs:]
        ok = [r for r in recs if r.get("status") == "success"]
        status = _stage_status(recs)
        if (
            max_staleness_ms is not None
            and status == OPERATIONAL
            and (not ok or time.time() * 1000 - ok[-1]["recorded_ms"] > max_staleness_ms)
        ):
            status = DEGRADED
        stages[op] = {
            "status": status,
            "runs": len(recs),
            "successes": len(ok),
            "last_success_ms": max((r["recorded_ms"] for r in ok), default=None),
            "total_gb_in": round(sum(r.get("gb_in", 0.0) for r in ok), 4),
            "total_rows": int(sum(r.get("rows", 0) for r in ok)),
            "mean_gb_per_hour": round(
                sum(r.get("gb_per_hour", 0.0) for r in ok) / len(ok), 2
            )
            if ok
            else 0.0,
        }

    overall = OPERATIONAL
    for s in stages.values():
        if _SEVERITY[s["status"]] > _SEVERITY[overall]:
            overall = s["status"]
    if not stages:
        overall = OUTAGE

    return {
        "overall_status": overall,
        "stages": stages,
        "jobs_seen": len(records),
        "generated_ms": int(time.time() * 1000),
    }
