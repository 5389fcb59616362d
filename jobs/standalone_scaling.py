"""Multi-JVM scaling evidence: the maintenance cycle on a REAL Spark
standalone cluster (1 master + 2 worker JVMs on this host), lo vs hi
core counts, interleaved rounds — the closest a single box gets to the
north rule's two-cluster-size criterion without a second machine.

Why this exists: bench.py's gate pair is local[N] vs local[4N] inside
single JVMs. This runner corroborates from a different topology —
every level schedules across TWO executor JVMs (one per worker), with
real RPC, shuffle services, and task serialization between driver and
executors:

    lo: spark.cores.max=LO,  2 executors × LO/2 cores
    hi: spark.cores.max=HI,  2 executors × HI/2 cores

Both bench server apps stay RESIDENT on the cluster (workers advertise
(LO+HI)/2 cores each so both apps' executors coexist; only one app
runs work at a time, exactly like bench.py's resident local JVMs), so
executor JITs stay warm across samples. Rounds are hi–lo–hi bracketed
by the same host-ceiling microbenches bench.py uses, and the
capability estimator is identical: best(lo) / ((HI/LO) · best(hi)).

Run: python jobs/standalone_scaling.py [--lo 4 --hi 16 --docs 800000]
Prints one JSON line; results are recorded in BENCH.md (this is
corroborating evidence, not the driver-gate metric).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _read_json, _request, host_ceilings  # noqa: E402

SCRATCH = os.path.join(REPO, ".scratch", "standalone")


def _spark_class() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-class")


def _start_daemon(
    cls: str, argv: list[str], log: str, env: dict, cpuset: str | None = None
) -> subprocess.Popen:
    os.makedirs(SCRATCH, exist_ok=True)
    # --pin topology: taskset-pin the worker JVM to a disjoint core set;
    # executors (and their Python workers) are forked children, so the
    # affinity mask is inherited by the whole worker subtree. This
    # separates OS-scheduler interference (two workers migrating over
    # the same cores) from DRAM-bandwidth contention (unaffected by
    # pinning) in the 4→16 scaling corroboration.
    prefix = ["taskset", "-c", cpuset] if cpuset else []
    return subprocess.Popen(
        [*prefix, _spark_class(), cls, *argv],
        stdout=open(log, "w"),
        stderr=subprocess.STDOUT,
        env=env,
    )


def _wait_log(log: str, needle: str, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with open(log) as f:
                if needle in f.read():
                    return
        except OSError:
            pass
        time.sleep(0.5)
    raise RuntimeError(f"{needle!r} not seen in {log}")


def _start_server(cpus: int, docs: int, master: str) -> subprocess.Popen:
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER=master,
        SPARK_GRAFT_EXECUTORS="2",
        SPARK_EXECUTOR_MEMORY="8g",
        PYTHONPATH=REPO,
    )
    return subprocess.Popen(
        [
            sys.executable,
            "-m",
            "hoopstat_haus_spark.bench_maintenance",
            "--cpus",
            str(cpus),
            "--docs",
            str(docs),
            "--serve",
        ],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        bufsize=1,
        cwd=REPO,
        env=env,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--docs", type=int, default=800_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=3, help="untimed iterations per level (executor JIT)")
    ap.add_argument("--port", type=int, default=7077)
    ap.add_argument(
        "--pin",
        action="store_true",
        help="taskset-pin each worker JVM to a disjoint core set "
        "(worker i=1..N gets cores [(i-1)*W, i*W) for W advertised "
        "cores) — isolates scheduler effects from DRAM contention",
    )
    args = ap.parse_args()
    assert args.hi % args.lo == 0
    factor = args.hi // args.lo
    master_url = f"spark://127.0.0.1:{args.port}"
    worker_cores = (args.lo + args.hi) // 2  # both resident apps fit

    env = dict(os.environ)
    daemons: list[subprocess.Popen] = []
    servers: list[subprocess.Popen] = []
    try:
        daemons.append(
            _start_daemon(
                "org.apache.spark.deploy.master.Master",
                ["-h", "127.0.0.1", "-p", str(args.port), "--webui-port", "8091"],
                os.path.join(SCRATCH, "master.log"),
                env,
            )
        )
        _wait_log(os.path.join(SCRATCH, "master.log"), "I have been elected leader")
        for i in (1, 2):
            wenv = dict(
                env,
                SPARK_WORKER_DIR=os.path.join(SCRATCH, f"worker{i}"),
                SPARK_LOCAL_DIRS=f"/dev/shm/spark-graft-w{i}",
            )
            cpuset = (
                f"{(i - 1) * worker_cores}-{i * worker_cores - 1}" if args.pin else None
            )
            daemons.append(
                _start_daemon(
                    "org.apache.spark.deploy.worker.Worker",
                    [master_url, "-c", str(worker_cores), "-m", "20g", "--webui-port", f"809{i+1}"],
                    os.path.join(SCRATCH, f"worker{i}.log"),
                    wenv,
                    cpuset=cpuset,
                )
            )
            _wait_log(os.path.join(SCRATCH, f"worker{i}.log"), "Successfully registered")

        # register each server for cleanup AS it starts: a hi-server
        # startup failure must not orphan the already-READY lo driver
        lo_p = _start_server(args.lo, args.docs, master_url)
        servers.append(lo_p)
        _read_json(lo_p)  # READY (owns template creation)
        hi_p = _start_server(args.hi, args.docs, master_url)
        servers.append(hi_p)
        _read_json(hi_p)

        # warmup (executor JIT + first-scan costs on both apps; the hi
        # level's first samples measured 2-4x its steady state — C2
        # compilation across TWO executor JVMs takes several iterations)
        for _ in range(args.warmups):
            _request(lo_p)
            _request(hi_p)

        rounds = []
        gb_in = 0.0
        for _ in range(args.rounds):
            # SYMMETRIC sampling — two samples per LEVEL per round, min
            # of two on BOTH sides. The earlier hi-lo-hi scheme min'd
            # only the hi level; E[min of 2] < E[single] under host
            # noise, so every per-round ratio was biased upward (the
            # same asymmetry bench.py round 5 identified and fixed).
            # Ceilings measure the ACTUAL lo→hi factor, not a fixed 4.
            cc1, mc1 = host_ceilings(args.lo, factor)
            hi_a = _request(hi_p)
            lo_a = _request(lo_p)
            hi_b = _request(hi_p)
            lo_b = _request(lo_p)
            cc2, mc2 = host_ceilings(args.lo, factor)
            gb_in = lo_a["gb_in"]
            lo_wall = min(lo_a["wall"], lo_b["wall"])
            hi_wall = min(hi_a["wall"], hi_b["wall"])
            rounds.append(
                {
                    "lo_s": lo_wall,
                    "hi_s": hi_wall,
                    "lo_s_samples": [lo_a["wall"], lo_b["wall"]],
                    "hi_s_samples": [hi_a["wall"], hi_b["wall"]],
                    "cpu_ceiling": [round(cc1, 3), round(cc2, 3)],
                    "mem_ceiling": [round(mc1, 3), round(mc2, 3)],
                    "raw_efficiency": round(lo_wall / (factor * hi_wall), 3),
                }
            )
        best_lo = min(r["lo_s"] for r in rounds)
        best_hi = min(r["hi_s"] for r in rounds)
        print(
            json.dumps(
                {
                    "topology": (
                        f"standalone 2 workers x {worker_cores} cores"
                        + (", cpuset-pinned disjoint" if args.pin else "")
                        + ", 2 executor JVMs per app"
                    ),
                    "lo_cores": args.lo,
                    "hi_cores": args.hi,
                    "docs": args.docs,
                    "gb_in": gb_in,
                    "rounds": rounds,
                    "duration_s_lo": best_lo,
                    "duration_s_hi": best_hi,
                    "raw_efficiency_capability": round(best_lo / (factor * best_hi), 3),
                }
            )
        )
    finally:
        for p in servers:
            try:
                p.stdin.close()
                p.wait(timeout=60)
            except Exception:
                p.kill()
        for p in reversed(daemons):
            p.terminate()
        for p in reversed(daemons):
            try:
                p.wait(timeout=20)
            except Exception:
                p.kill()
        for i in (1, 2):
            shutil.rmtree(f"/dev/shm/spark-graft-w{i}", ignore_errors=True)


if __name__ == "__main__":
    main()
