"""Registry headroom protocol (COVERAGE.md "Registry headroom").

The driver correctness-checks only the FIRST 50 registry entries
(proven round 2: CORRECTNESS_r02 == registry[:50]). The registry is
sized at exactly that cap, so ANY new gate must merge into an existing
tagged-union gate instead of appending — an appended entry would look
registered but silently never be evaluated. These tests make that
protocol mechanical: the size is pinned, every query must either have
a DuckDB oracle or appear in the justified rows-only allowlist, and no
oracle may dangle without a query (it would hash-compare nothing).
"""

from hoopstat_haus_spark import registry

# every rows-only gate needs a written justification AND a named
# compensating check; additions here should be rare and deliberate
ROWS_ONLY_JUSTIFIED = {
    "dedup_minhash_lsh": (
        "xxhash64 banding is not ANSI-SQL-expressible; recall is pinned by "
        "the fully-oracle-checked dedup_minhash_recall gate (DuckDB "
        "recomputes the Jaccard truth set, n_missed pinned 0)"
    ),
}


def test_registry_exactly_fills_driver_window():
    qs = registry.all_queries()
    assert len(qs) == registry._DRIVER_EVAL_CAP, (
        f"registry has {len(qs)} entries; the driver evaluates exactly "
        f"{registry._DRIVER_EVAL_CAP} — a smaller registry wastes gates, a larger "
        "one silently skips them. Merge new gates into a tagged union "
        "(see COVERAGE.md 'Registry headroom')."
    )


def test_every_query_is_oracle_checked_or_justified():
    qs = registry.all_queries()
    oracles = registry.all_oracles()
    unexplained = [k for k in qs if k not in oracles and k not in ROWS_ONLY_JUSTIFIED]
    assert not unexplained, (
        f"gates with neither oracle nor rows-only justification: {unexplained} — "
        "add an oracle_sql entry or document the exception in "
        "tests/test_registry_protocol.py::ROWS_ONLY_JUSTIFIED"
    )
    stale = [k for k in ROWS_ONLY_JUSTIFIED if k not in qs or k in oracles]
    assert not stale, f"stale rows-only justifications: {stale}"


def test_no_orphan_oracles():
    qs = registry.all_queries()
    orphans = [k for k in registry.all_oracles() if k not in qs]
    assert not orphans, f"oracles without a registered query: {orphans}"
