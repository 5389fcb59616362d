"""Structured JSON observability: performance logging + correlation ids.

Reference surface: ``libs/hoopstat-observability/hoopstat_observability``
(``performance.py`` — a decorator/context pair that JSON-logs one record
per operation with duration, records processed, throughput, and status;
``correlation.py`` — a thread-local correlation id attached to every
record; ``json_logger.py`` — single-line JSON to a stdlib logger). The
reference uses these around Lambda handlers; here they wrap driver-side
engine entry points (spark-submit jobs, maintenance cycles) — per-ROW
work stays in executors and is measured by `lakehouse/metrics.py`, not
by Python decorators.

Record shape (mirrors ``apps/gold-analytics/app/performance.py:175-199``):

    {"operation", "duration_seconds", "records_processed", "status",
     "timestamp", ["records_per_second"], ["error"], ["correlation_id"]}
"""

from __future__ import annotations

import functools
import json
import logging
import threading
import time
import uuid
from collections.abc import Callable
from contextlib import contextmanager
from typing import Any

logger = logging.getLogger("hoopstat_haus_spark")

_context = threading.local()


def generate_correlation_id() -> str:
    return uuid.uuid4().hex


def set_correlation_id(correlation_id: str) -> None:
    _context.correlation_id = correlation_id


def get_correlation_id() -> str | None:
    return getattr(_context, "correlation_id", None)


def clear_correlation_id() -> None:
    if hasattr(_context, "correlation_id"):
        delattr(_context, "correlation_id")


@contextmanager
def correlation_scope(correlation_id: str | None = None):
    """Attach a correlation id to every record logged in this thread's
    scope; restores the previous id on exit (scopes nest)."""
    prev = get_correlation_id()
    set_correlation_id(correlation_id or generate_correlation_id())
    try:
        yield get_correlation_id()
    finally:
        if prev is None:
            clear_correlation_id()
        else:
            set_correlation_id(prev)


def _emit(
    operation: str,
    duration_s: float,
    records: int | None,
    status: str,
    error: str | None = None,
) -> dict:
    rec: dict[str, Any] = {
        "operation": operation,
        "duration_seconds": round(duration_s, 3),
        "records_processed": records,
        "status": status,
        "timestamp": time.time(),
    }
    if error:
        rec["error"] = error
    if duration_s > 0 and records:
        rec["records_per_second"] = round(records / duration_s, 2)
    cid = get_correlation_id()
    if cid:
        rec["correlation_id"] = cid
    (logger.info if status == "success" else logger.error)(json.dumps(rec))
    return rec


def _extract_records(result: Any) -> int | None:
    """Best-effort record count from a return value: ints count
    themselves; JobMetrics-like objects expose .rows; dicts may carry
    'rows' or 'records_processed'."""
    if isinstance(result, bool) or result is None:
        return None
    if isinstance(result, int):
        return result
    rows = getattr(result, "rows", None)
    if isinstance(rows, int):
        return rows
    if isinstance(result, dict):
        for key in ("rows", "records_processed"):
            if isinstance(result.get(key), int):
                return result[key]
    if isinstance(result, tuple):
        for item in result:
            n = _extract_records(item)
            if n is not None:
                return n
    return None


def performance_monitor(operation: str | None = None) -> Callable:
    """Decorator: JSON-log one performance record per call — duration,
    best-effort record count, throughput, success/failure (the failure
    record logs the exception and re-raises)."""

    def decorator(func: Callable) -> Callable:
        op = operation or func.__name__

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            t0 = time.time()
            try:
                result = func(*args, **kwargs)
            except Exception as exc:
                _emit(op, time.time() - t0, None, "failed", error=repr(exc)[:500])
                raise
            _emit(op, time.time() - t0, _extract_records(result), "success")
            return result

        return wrapper

    return decorator


@contextmanager
def performance_context(operation: str, records: int | None = None):
    """Context-manager form; set ``ctx.records`` inside the block to
    report a count discovered mid-operation."""

    class _Ctx:
        pass

    ctx = _Ctx()
    ctx.records = records
    t0 = time.time()
    try:
        yield ctx
    except Exception as exc:
        _emit(operation, time.time() - t0, getattr(ctx, "records", None), "failed", error=repr(exc)[:500])
        raise
    _emit(operation, time.time() - t0, getattr(ctx, "records", None), "success")
