"""Analytic operator surface (SURVEY.md §2) re-expressed over the
driver's TPC-H-ish test tables.

Every module exposes query functions ``(spark, sf_dir) -> DataFrame``
plus an ``ORACLE`` dict of equivalent DuckDB SQL. Conventions that make
the driver's value-hash comparison deterministic across engines:

- **Sums of currency-like doubles go through DECIMAL.** Double addition
  is order-dependent; Spark and DuckDB aggregate in different orders.
  ``CAST(x AS DECIMAL(18,2))`` before SUM makes the sum exact and
  identical, after which ``ROUND(CAST(s AS DOUBLE), 2)`` is stable.
- **Ratios** are ``ROUND(CAST(sum_decimal AS DOUBLE) / count, 6)``.
- **Dates/timestamps are emitted as formatted strings** so engine-side
  date objects never reach the comparator.
- **Window orderings carry a unique tiebreaker column** (orderkey,
  event_id) — otherwise rn=1 picks are engine-dependent.
- **Top-k uses rank() <= k**, not LIMIT, so ties resolve identically.
"""

from hoopstat_haus_spark.operators.common import load  # noqa: F401
