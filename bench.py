"""Benchmark harness (driver contract): prints ONE JSON line.

- Headline queries from the registry run at $SPARK_GRAFT_SF_DIR
  (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; per-query
  wall seconds under "queries".
- Maintenance throughput (the BASELINE.md north metric) runs in two
  subprocesses — local[N] and local[4N] on the SAME synthetic input —
  and reports GB/hr at both plus scaling efficiency
  = thr(4N) / (4·thr(N)).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_DOCS (default 400000), SPARK_GRAFT_BENCH_SCALING=0
to skip the two-level scaling run (quick mode).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "3200000"))
# scaling levels N and 4N: local[16] fits this host's ~19 effective cores
# (overcommitted hypervisor), so 4→16 measures real parallel scaling while
# 8→32 would measure host throttling. Override with SPARK_GRAFT_BENCH_N.
BENCH_N = int(os.environ.get("SPARK_GRAFT_BENCH_N", "4"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"

HEADLINE = [
    "agg_pricing_summary",
    "win_rolling_avg_events",
    "win_latest_order_per_customer",
    "join_revenue_by_nation",
    "join_part_supplier_lineitem_profit",
    "q_iqr_outliers",
    "text_doc_profile",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_brute_force_topk",
    "maint_compact_scan",
    "maint_merge_scan",
]


def run_queries() -> dict[str, float]:
    from hoopstat_haus_spark import registry
    from hoopstat_haus_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", cpus=CPUS)
    queries = registry.all_queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        queries[name](spark, SF_DIR).collect()
        out[name] = round(time.time() - t0, 3)
    return out


def run_maintenance_scaling() -> dict:
    def run(cpus: int, iters: int) -> dict:
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "hoopstat_haus_spark.bench_maintenance",
                "--cpus",
                str(cpus),
                "--docs",
                str(BENCH_DOCS),
                "--iters",
                str(iters),
            ],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=1800,
        )
        line = proc.stdout.strip().splitlines()[-1]
        return json.loads(line)

    # lo first: if the host's CPU budget drains mid-bench, a throttled lo
    # would inflate efficiency — this ordering biases conservative.
    lo = run(BENCH_N, 3)
    hi = run(BENCH_N * 4, 5)
    eff = hi["gb_per_hour"] / (4.0 * lo["gb_per_hour"]) if lo["gb_per_hour"] else 0.0
    return {
        "docs": BENCH_DOCS,
        "gb_in": hi["gb_in"],
        "n_cpus": BENCH_N,
        "gb_per_hour_n": lo["gb_per_hour"],
        "duration_s_n": lo["duration_s"],
        "duration_s_n_samples": lo["duration_s_samples"],
        "4n_cpus": BENCH_N * 4,
        "gb_per_hour_4n": hi["gb_per_hour"],
        "duration_s_4n": hi["duration_s"],
        "duration_s_4n_samples": hi["duration_s_samples"],
        "scaling_efficiency": round(eff, 3),
    }


def main() -> None:
    t0 = time.time()
    # maintenance first: it is the headline metric and the most
    # CPU-sensitive — run it before the query phase heats the host
    maintenance = run_maintenance_scaling() if RUN_SCALING else {}
    queries = run_queries()
    total = round(time.time() - t0, 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "bench wall-clock (headline queries + maintenance cycle)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "maintenance": maintenance,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
