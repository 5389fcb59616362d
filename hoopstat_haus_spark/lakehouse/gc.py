"""Reachability GC: delete files no retained snapshot can reach.

Expiry (snapshots.py) only drops snapshot records; this pass walks the
remaining snapshots → their manifests → their file sets, and removes
anything on disk outside that reachable set (orphans from crashed jobs
included). The two-phase split means a crash between expire and GC can
only leave garbage, never dangle a reference.

Scale note: reachable-set construction is driver-side set algebra over
manifest parquet (metadata, ~1 row per data file). At 10^12-sequence
scale with ~10^6 files that is still MB-scale; if manifests outgrow the
driver, the same union/except is one Spark job over manifest DataFrames.
"""

from __future__ import annotations

import os
import shutil

from hoopstat_haus_spark.lakehouse import manifest as mf
from hoopstat_haus_spark.lakehouse.snapshots import SnapshotLog


def collect_garbage(table_path: str, dry_run: bool = False) -> dict:
    log = SnapshotLog(table_path)
    reachable_data: set[str] = set()
    reachable_manifests: set[str] = set()
    for sid in log.list_ids():
        snap = log.get(sid)
        reachable_manifests.add(snap.manifest)
        for e in mf.read_manifest(table_path, snap.manifest):
            reachable_data.add(e["file_path"])

    removed_data, removed_manifests = [], []
    data_root = os.path.join(table_path, "data")
    for dirpath, _dirs, files in os.walk(data_root):
        for name in files:
            rel = os.path.relpath(os.path.join(dirpath, name), table_path)
            if rel not in reachable_data:
                removed_data.append(rel)
                if not dry_run:
                    os.remove(os.path.join(table_path, rel))

    man_dir = os.path.join(table_path, "_manifests")
    if os.path.isdir(man_dir):
        for name in os.listdir(man_dir):
            rel = f"_manifests/{name}"
            if rel not in reachable_manifests:
                removed_manifests.append(rel)
                if not dry_run:
                    os.remove(os.path.join(table_path, rel))

    staging = os.path.join(table_path, ".staging")
    if not dry_run and os.path.isdir(staging):
        shutil.rmtree(staging, ignore_errors=True)

    return {
        "reachable_files": len(reachable_data),
        "removed_data_files": sorted(removed_data),
        "removed_manifests": sorted(removed_manifests),
    }
