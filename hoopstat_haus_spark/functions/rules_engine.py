"""Config-driven cleaning rules engine.

Reference: ``libs/hoopstat-data/hoopstat_data/rules_engine.py:43-696`` +
``hoopstat_data/config/cleaning_rules.yaml`` — a 660-LoC YAML-configured
cleaner applying value mappings, null handling, numeric cleaning, and
datetime standardization per record in Python loops. Here the same
declarative config compiles to native Column expressions, so one rule
set becomes ONE projection inside whole-stage codegen regardless of
table size.

Config shape (plain dicts — YAML-loadable, no YAML dependency):

    rules = {
      "column_name": [
        {"op": "map_values",  "mapping": {...}, "default": "keep"|value},
        {"op": "fill_null",   "value": v},
        {"op": "clamp",       "lo": x, "hi": y},
        {"op": "strip_collapse_ws"},
        {"op": "title_case"},
        {"op": "date_format", "fmt": "yyyy-MM-dd"},
        {"op": "regex_replace","pattern": p, "replacement": r},
      ],
      ...
    }

Rules for one column apply in order (fold), mirroring the reference's
rule-priority semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _apply_rule(col: Column, rule: dict) -> Column:
    op = rule["op"]
    if op == "map_values":
        out = None
        for k, v in rule["mapping"].items():
            cond = col == F.lit(k)
            out = F.when(cond, F.lit(v)) if out is None else out.when(cond, F.lit(v))
        default = rule.get("default", "keep")
        return out.otherwise(col if default == "keep" else F.lit(default))
    if op == "fill_null":
        return F.coalesce(col, F.lit(rule["value"]))
    if op == "clamp":
        return F.least(F.greatest(col, F.lit(rule["lo"])), F.lit(rule["hi"]))
    if op == "strip_collapse_ws":
        return F.trim(F.regexp_replace(col, r"\s+", " "))
    if op == "title_case":
        return F.initcap(col)
    if op == "date_format":
        return F.date_format(col, rule["fmt"])
    if op == "regex_replace":
        return F.regexp_replace(col, rule["pattern"], rule["replacement"])
    raise ValueError(f"unknown rule op {op!r}")


def compile_rules(rules: dict[str, list[dict]]) -> dict[str, Column]:
    """Config → one Column expression per target column."""
    out = {}
    for col_name, col_rules in rules.items():
        expr = F.col(col_name)
        for rule in col_rules:
            expr = _apply_rule(expr, rule)
        out[col_name] = expr.alias(col_name)
    return out


def apply_rules(df: DataFrame, rules: dict[str, list[dict]]) -> DataFrame:
    """Apply a rule config: untouched columns pass through unchanged."""
    compiled = compile_rules(rules)
    return df.select(*[compiled.get(c, F.col(c)) for c in df.columns])


# ------------------------------------------------------- registry query

DEMO_RULES = {
    "o_orderpriority": [
        {"op": "map_values", "mapping": {"1-URGENT": "P1", "2-HIGH": "P2", "3-MEDIUM": "P3"}, "default": "P_LOW"},
    ],
    "o_orderstatus": [
        {"op": "map_values", "mapping": {"F": "FULFILLED", "O": "OPEN", "P": "PENDING"}, "default": "keep"},
    ],
    "o_totalprice": [
        {"op": "clamp", "lo": 0.0, "hi": 400000.0},
    ],
    "o_orderdate": [
        {"op": "date_format", "fmt": "yyyy-MM-dd"},
    ],
}


def rules_cleaned_orders(spark, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cleaned = apply_rules(df, DEMO_RULES)
    return (
        cleaned.groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2).alias("total"),
            F.max("o_orderdate").alias("max_date"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


ORACLE = {
    "rules_cleaned_orders": """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
               MAX(o_orderdate) AS max_date
        FROM (
          SELECT CASE o_orderpriority WHEN '1-URGENT' THEN 'P1' WHEN '2-HIGH' THEN 'P2'
                      WHEN '3-MEDIUM' THEN 'P3' ELSE 'P_LOW' END AS o_orderpriority,
                 CASE o_orderstatus WHEN 'F' THEN 'FULFILLED' WHEN 'O' THEN 'OPEN'
                      WHEN 'P' THEN 'PENDING' ELSE o_orderstatus END AS o_orderstatus,
                 LEAST(GREATEST(o_totalprice, 0.0), 400000.0) AS o_totalprice,
                 strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
          FROM orders
        ) GROUP BY 1, 2 ORDER BY 1, 2
    """,
}

QUERIES = {
    "rules_cleaned_orders": rules_cleaned_orders,
}
