"""The driver captures only the last ~2000 chars of bench.py stdout.

Round 3's line overflowed that window (BENCH_r03.json "parsed": null) and
the per-query timings were lost from the artifact. compact_result() must
keep the printed line comfortably under the window even for a maximal
run (many rounds, long sample arrays), pushing the evidence detail to
the BENCH_DETAIL.json sidecar instead.
"""

import json

import bench


def _maximal_result() -> dict:
    rounds = [
        {
            "lo_s": 42.278 + i,
            "hi_s": 11.857,
            "lo_s_samples": [42.278 + i, 43.91 + i],
            "hi_s_samples": [11.857, 12.618],
            "cpu_ceiling": [1.015, 0.975],
            "mem_ceiling": [0.92, 1.082],
            "host_stable": True,
            "raw_efficiency": 0.891,
        }
        for i in range(8)  # MAX_ROUNDS default
    ]
    return {
        "metric": "bench wall-clock (headline queries + maintenance cycle)",
        "value": 1234.567,
        "unit": "sec",
        "queries": {name: 123.456 for name in bench.HEADLINE},
        "sf": 0.1,
        "cpus": 32,
        "maintenance": {
            "lo_plateau": True,
            "hi_plateau": True,
            "cpu_probe_ratio": 0.993,
            "host_degraded": False,
            "docs": 800000,
            "gb_in": 0.5338,
            "pair_selection": [
                {"n": 4, "cpu_ceiling": 1.208, "mem_ceiling": 0.541, "neutral": False},
                {"n": 2, "cpu_ceiling": 0.724, "mem_ceiling": 0.825, "neutral": False},
                {"n": 1, "cpu_ceiling": 0.935, "mem_ceiling": 0.982, "neutral": True},
            ],
            "n_cpus": 1,
            "gb_per_hour_n": 48.78,
            "duration_s_n": 39.397,
            "duration_s_n_samples": [42.278, 42.219, 40.205, 39.397, 43.259, 40.0, 41.0, 42.0],
            "4n_cpus": 4,
            "gb_per_hour_4n": 177.88,
            "duration_s_4n": 10.803,
            "duration_s_4n_samples": [11.857, 12.618, 13.075, 11.822] * 4,
            "rounds": rounds,
            "accepted_rounds": 8,
            "host_unstable": False,
            "raw_efficiency_median": 1.016,
            "raw_efficiency_capability": 0.912,
            "scaling_efficiency": 1.0,
            "superlinear_suspect": True,
            "scaling_weak_evidence": True,
            "throughput": {
                "cpus": 16,
                "docs": 3200000,
                "files_in": 640,
                "files_out": 111,
                "gb_in": 1.8283,
                "gb_out": 0.5109,
                "duration_s_samples": [80.341, 23.748, 16.929],
                "duration_s": 16.929,
                "gb_per_hour": 388.79,
                "rows_per_second": 189024.8,
                "tokens_per_second": 1234567.8,
            },
        },
    }


def test_line_fits_driver_tail_window():
    line, detail = bench.compact_result(_maximal_result())
    encoded = json.dumps(line)
    assert len(encoded) < 1800, f"bench line is {len(encoded)} chars; driver tail is ~2000"
    # gate-relevant scalars must survive in the line
    assert line["maintenance"]["scaling_efficiency"] == 1.0
    # a capped gate must carry its superlinear-throttle annotation
    assert line["maintenance"]["superlinear_suspect"] is True
    # a thin-sample gate must carry its weak-evidence annotation
    assert line["maintenance"]["scaling_weak_evidence"] is True
    assert line["maintenance"]["host_degraded"] is False
    assert line["maintenance"]["throughput"]["gb_per_hour"] == 388.79
    assert len(line["queries"]) == len(bench.HEADLINE)
    assert line["detail"] == "BENCH_DETAIL.json"
    # the sidecar keeps the full evidence
    assert len(detail["maintenance"]["rounds"]) == 8
    assert detail["maintenance"]["pair_selection"]


def test_line_without_maintenance_phase():
    r = _maximal_result()
    r["maintenance"] = {}
    line, _ = bench.compact_result(r)
    assert line["maintenance"] == {}
    assert len(json.dumps(line)) < 1800


def test_pair_selection_prefers_smallest_neutral(monkeypatch):
    """Smallest-first (run 14's Amdahl lesson): with a fixed input, the
    serial driver tail costs 4x in the ratio on short walls, so the
    longest-wall (smallest-N) neutral pair is the transferable one —
    even when larger pairs read neutral too."""
    ceilings = {1: (0.98, 1.05), 2: (0.99, 1.02), 4: (0.94, 0.89)}
    monkeypatch.setattr(bench, "host_ceilings", lambda n, factor=4: ceilings[n])
    n, report = bench.select_scaling_pair()
    assert n == 1
    assert [r["n"] for r in report] == [1, 2, 4]  # probed smallest-first
    assert report[0]["neutral"] and report[1]["neutral"] and not report[2]["neutral"]

    # nothing neutral -> fall back to the smallest candidate, never 4
    monkeypatch.setattr(bench, "host_ceilings", lambda n, factor=4: (0.7, 0.6))
    n, report = bench.select_scaling_pair()
    assert n == 1 and not any(r["neutral"] for r in report)
