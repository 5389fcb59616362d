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
    # JVM/JIT + parquet-reader warmup so the first headline query isn't
    # charged the one-time C2-compile cost (BENCH.md: first big job per
    # JVM is 3-10x slow); the timed numbers are warm-JVM per-query cost
    from pyspark.sql import functions as F

    spark.range(0, 2_000_000).agg(F.sum("id")).collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000).collect()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        queries[name](spark, SF_DIR).collect()
        out[name] = round(time.time() - t0, 3)
    return out


MIN_ACCEPTED = int(os.environ.get("SPARK_GRAFT_BENCH_MIN_ACCEPTED", "2"))
MAX_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_PAIRS", "8"))
ROUND_BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_PAIR_BUDGET_S", "1000"))


def _spin(dur_ns: int, counter) -> None:
    """Pure-CPU integer spin (no memory traffic) for dur_ns."""
    import time as _t

    stop_ns = _t.monotonic_ns() + dur_ns
    x = 0x9E3779B97F4A7C15
    n = 0
    while _t.monotonic_ns() < stop_ns:
        for _ in range(10000):
            x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        n += 10000
    counter.value = n + (x & 1)  # consume x so the loop can't be elided


def _memcpy(dur_ns: int, counter) -> None:
    """DRAM-bandwidth-bound worker: 64 MB memcpy per loop. The deadline
    starts AFTER allocation so a throttled window can't zero out the
    sample (observed: 16 workers × 128 MB of zeroing ate a 1.5 s
    window entirely under host throttle)."""
    src = bytearray(64 * 1024 * 1024)
    dst = bytearray(64 * 1024 * 1024)
    mv_s, mv_d = memoryview(src), memoryview(dst)
    stop_ns = time.monotonic_ns() + dur_ns
    n = 0
    while time.monotonic_ns() < stop_ns:
        mv_d[:] = mv_s
        n += 1
    counter.value = n


def _host_ceiling(target, n: int, duration_s: float) -> float:
    import multiprocessing as mp

    def ops(workers: int) -> int:
        ctx = mp.get_context("fork")
        counters = [ctx.Value("Q", 0) for _ in range(workers)]
        dur = int(duration_s * 1e9)
        procs = [ctx.Process(target=target, args=(dur, c)) for c in counters]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        return sum(c.value for c in counters)

    lo_ops = ops(n)
    hi_ops = ops(4 * n)
    return hi_ops / (4.0 * lo_ops) if lo_ops else 1.0


def host_ceilings(n: int) -> tuple[float, float]:
    """The HOST's own N→4N scaling on embarrassingly-parallel work, as
    two bounds measured minutes from the engine runs:

    - pure-CPU spin (no memory traffic): measures vCPU scheduling +
      clock asymmetry (measured ≈0.93 on this VM);
    - 64 MB memcpy (DRAM-bandwidth-bound): measures the single-socket
      memory system, which does NOT scale with threads (≈0.53 here —
      4 workers already pull ~half the socket's bandwidth).

    Both are artifacts of simulating two cluster sizes on ONE box: a
    real 4N-executor cluster has 4× the sockets, memory channels, and
    cache of the N-executor cluster. Perfectly-scaling engine code
    cannot exceed these ceilings here; real clusters don't have them."""
    return (
        _host_ceiling(_spin, n, 1.5),
        _host_ceiling(_memcpy, n, 1.5),
    )


def run_maintenance_scaling() -> dict:
    """Two-level scaling with host-ceiling controls and STABILITY-GATED
    rounds (BENCH.md "Two-cluster-size evidence").

    Each round measures the host ceilings (pure-CPU and DRAM-bound
    N→4N microbenches) BEFORE and AFTER the back-to-back lo/hi engine
    pair. A round is ACCEPTED only if both ceilings are stable across
    it (host didn't shift throttle regimes mid-round) — unstable rounds
    are reported but excluded, because their lo and hi walls were
    measured under different host speeds and their ratio is
    meaningless (observed raw ratios 0.12–1.48 on identical code).
    Accepted rounds' raw ratio lo/(4·hi) is normalized by the round's
    blended ceiling √(cpu × mem) — the host's own N→4N scaling bounds
    that even perfectly-scaling code cannot exceed on one box (a real
    4N-executor cluster has 4× the sockets/memory channels, so the
    ceilings don't exist there). scaling_efficiency = median of
    accepted normalized rounds, capped at 1.0; sampling continues until
    MIN_ACCEPTED rounds are accepted or the budget runs out. Every raw
    wall, ceiling, and ratio ships in the JSON."""

    def start(cpus: int) -> subprocess.Popen:
        return subprocess.Popen(
            [
                sys.executable,
                "-m",
                "hoopstat_haus_spark.bench_maintenance",
                "--cpus",
                str(cpus),
                "--docs",
                str(BENCH_DOCS),
                "--serve",
            ],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            bufsize=1,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )

    def read_json(proc: subprocess.Popen) -> dict:
        while True:
            line = proc.stdout.readline()
            if not line:
                raise RuntimeError("bench server exited early")
            try:
                return json.loads(line)
            except ValueError:
                continue  # Spark chatter

    def request(proc: subprocess.Popen) -> dict:
        proc.stdin.write("RUN\n")
        proc.stdin.flush()
        return read_json(proc)

    # lo starts first and owns template creation; hi reuses it
    lo_p = start(BENCH_N)
    read_json(lo_p)  # READY (template built)
    hi_p = start(BENCH_N * 4)
    read_json(hi_p)  # READY

    def stable(a: float, b: float, tol: float) -> bool:
        return abs(a - b) <= tol * max(a, b, 1e-9)

    lo_s: list[float] = []
    hi_s: list[float] = []
    rounds: list[dict] = []
    gb_in = 0.0
    t0 = time.time()
    try:
        # warmup pair (JIT + worker spawn on both levels), not a round
        request(lo_p)
        request(hi_p)
        accepted = 0
        for _i in range(MAX_ROUNDS):
            cc1, mc1 = host_ceilings(BENCH_N)
            lo = request(lo_p)
            hi = request(hi_p)
            cc2, mc2 = host_ceilings(BENCH_N)
            gb_in = hi["gb_in"]
            lo_s.append(lo["wall"])
            hi_s.append(hi["wall"])
            ok = stable(cc1, cc2, 0.15) and stable(mc1, mc2, 0.25)
            cc, mc = (cc1 + cc2) / 2.0, (mc1 + mc2) / 2.0
            raw = lo["wall"] / (4.0 * hi["wall"])
            norm = min(1.0, raw / max((cc * mc) ** 0.5, 1e-9))
            rounds.append(
                {
                    "lo_s": lo["wall"],
                    "hi_s": hi["wall"],
                    "cpu_ceiling": [round(cc1, 3), round(cc2, 3)],
                    "mem_ceiling": [round(mc1, 3), round(mc2, 3)],
                    "host_stable": ok,
                    "raw_efficiency": round(raw, 3),
                    "normalized_efficiency": round(norm, 3),
                }
            )
            accepted += 1 if ok else 0
            if accepted >= MIN_ACCEPTED or time.time() - t0 > ROUND_BUDGET_S:
                break
    finally:
        for p in (lo_p, hi_p):
            try:
                p.stdin.close()
                p.wait(timeout=120)
            except Exception:
                p.kill()

    best_lo, best_hi = min(lo_s), min(hi_s)
    thr_lo = gb_in / (best_lo / 3600.0)
    thr_hi = gb_in / (best_hi / 3600.0)
    acc = [r["normalized_efficiency"] for r in rounds if r["host_stable"]]
    host_unstable = not acc
    pool = sorted(acc or [r["normalized_efficiency"] for r in rounds])
    mid = len(pool) // 2
    med = pool[mid] if len(pool) % 2 else (pool[mid - 1] + pool[mid]) / 2.0
    return {
        "docs": BENCH_DOCS,
        "gb_in": gb_in,
        "n_cpus": BENCH_N,
        "gb_per_hour_n": round(thr_lo, 2),
        "duration_s_n": best_lo,
        "duration_s_n_samples": lo_s,
        "4n_cpus": BENCH_N * 4,
        "gb_per_hour_4n": round(thr_hi, 2),
        "duration_s_4n": best_hi,
        "duration_s_4n_samples": hi_s,
        "rounds": rounds,
        "accepted_rounds": len(acc),
        "host_unstable": host_unstable,
        "scaling_efficiency": round(med, 3),
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
