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
        {"op": "fuzzy_map",   "choices": [...], "min_ratio": r,
                              "default": "keep"|value},
        {"op": "fill_null",   "value": v},
        {"op": "clamp",       "lo": x, "hi": y},
        {"op": "strip_collapse_ws"},
        {"op": "title_case"},
        {"op": "date_format", "fmt": "yyyy-MM-dd"},
        {"op": "regex_replace","pattern": p, "replacement": r},
      ],
      ...
    }

``fuzzy_map`` is the reference's fuzzywuzzy-fallback standardization
(``rules_engine.py:17,86-130``) re-expressed as a native Levenshtein
expression: similarity(col, choice) = 1 − lev(lower(col), lower(choice))
/ max(len(col), len(choice), 1); the column maps to the FIRST choice (in
list order — the deterministic tie-break) achieving the maximal
similarity, provided that similarity ≥ ``min_ratio``; otherwise the
default applies. All JVM-side codegen — no pandas UDF needed.

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
    if op == "fuzzy_map":
        choices = rule["choices"]
        min_ratio = rule["min_ratio"]
        low = F.lower(col)
        sims = [
            F.lit(1.0)
            - F.levenshtein(low, F.lit(c.lower()))
            / F.greatest(F.length(col), F.lit(len(c)), F.lit(1))
            for c in choices
        ]
        best = F.greatest(*sims) if len(sims) > 1 else sims[0]
        out = None
        for c, s in zip(choices, sims):
            cond = (s == best) & (best >= F.lit(min_ratio))
            out = F.when(cond, F.lit(c)) if out is None else out.when(cond, F.lit(c))
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


class RuleConfigError(ValueError):
    """Raised by :func:`validate_rules` with an actionable message
    (column, rule index, offending key) instead of letting a malformed
    config fail deep inside expression compilation.

    Mirrors the reference's typed config-validation library
    (``libs/hoopstat-config/hoopstat_config``): validate at load, fail
    with context."""


# per-op contract: {required_key: allowed types}; None = any
_OP_SPECS: dict[str, dict[str, tuple[type, ...] | None]] = {
    "map_values": {"mapping": (dict,)},
    "fuzzy_map": {"choices": (list, tuple), "min_ratio": (int, float)},
    "fill_null": {"value": None},
    "clamp": {"lo": (int, float), "hi": (int, float)},
    "strip_collapse_ws": {},
    "title_case": {},
    "date_format": {"fmt": (str,)},
    "regex_replace": {"pattern": (str,), "replacement": (str,)},
}
# 'default' is only consumed by the two mapping ops — accepting it on
# every op would let a mistyped fallback validate cleanly and silently
# do nothing (the exact failure this validator exists to catch)
_OPTIONAL_KEYS: dict[str, set[str]] = {
    "map_values": {"op", "default"},
    "fuzzy_map": {"op", "default"},
}
_BASE_KEYS = {"op"}


def validate_rules(rules: dict[str, list[dict]]) -> None:
    """Validate a rule config; raise :class:`RuleConfigError` on the
    first problem, naming the column, rule position, and expectation."""
    if not isinstance(rules, dict):
        raise RuleConfigError(f"rules config must be a dict of column -> rule list, got {type(rules).__name__}")
    for col_name, col_rules in rules.items():
        if not isinstance(col_name, str):
            raise RuleConfigError(f"rule target must be a column name string, got {col_name!r}")
        if not isinstance(col_rules, (list, tuple)):
            raise RuleConfigError(
                f"column {col_name!r}: rules must be a list of rule dicts, got {type(col_rules).__name__}"
            )
        for i, rule in enumerate(col_rules):
            where = f"column {col_name!r} rule #{i}"
            if not isinstance(rule, dict):
                raise RuleConfigError(f"{where}: each rule must be a dict, got {type(rule).__name__}")
            op = rule.get("op")
            if op not in _OP_SPECS:
                raise RuleConfigError(
                    f"{where}: unknown op {op!r}; known ops: {sorted(_OP_SPECS)}"
                )
            spec = _OP_SPECS[op]
            for key, types in spec.items():
                if key not in rule:
                    raise RuleConfigError(f"{where} (op {op!r}): missing required key {key!r}")
                if types is not None and not isinstance(rule[key], types):
                    names = "/".join(t.__name__ for t in types)
                    raise RuleConfigError(
                        f"{where} (op {op!r}): key {key!r} must be {names}, got {type(rule[key]).__name__}"
                    )
            extra = set(rule) - set(spec) - _OPTIONAL_KEYS.get(op, _BASE_KEYS)
            if extra:
                raise RuleConfigError(f"{where} (op {op!r}): unexpected keys {sorted(extra)}")
            if op == "fuzzy_map":
                if not rule["choices"] or not all(isinstance(c, str) for c in rule["choices"]):
                    raise RuleConfigError(f"{where}: 'choices' must be a non-empty list of strings")
                if not 0.0 <= rule["min_ratio"] <= 1.0:
                    raise RuleConfigError(f"{where}: 'min_ratio' must be in [0, 1], got {rule['min_ratio']}")
            if op == "map_values" and not rule["mapping"]:
                raise RuleConfigError(f"{where}: 'mapping' must be non-empty")
            if op == "clamp" and rule["lo"] > rule["hi"]:
                raise RuleConfigError(f"{where}: clamp lo {rule['lo']} > hi {rule['hi']}")


def compile_rules(rules: dict[str, list[dict]]) -> dict[str, Column]:
    """Config → one Column expression per target column. Validates the
    config first — errors name the column/rule, not a Catalyst stack."""
    validate_rules(rules)
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


_NATIONS = [f"NATION_{i}" for i in range(25)]


def fuzzy_nation_names(spark, sf_dir: str) -> DataFrame:
    """Gate for the fuzzy_map op: deterministically typo a third of the
    nation names (insert 'X' after char 3 when key % 3 = 0), then fuzzy-
    restore them against the canonical choice list. Every row must come
    back to its canonical name (typo sim ≈ 0.89-0.9 ≥ 0.8; the nearest
    wrong choice scores ≤ 0.8 and loses the argmax).

    The typo injection lives HERE — in the registered gate, a test
    fixture — not in the production operator: ``apply_rules`` /
    ``fuzzy_map`` compute true results on unmodified data."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    typo = F.when(
        F.col("n_nationkey") % 3 == 0,
        F.concat(F.substring("n_name", 1, 3), F.lit("X"), F.expr("substring(n_name, 4)")),
    ).otherwise(F.col("n_name"))
    df = n.select("n_nationkey", typo.alias("raw_name"), typo.alias("fixed_name"))
    cleaned = apply_rules(
        df, {"fixed_name": [{"op": "fuzzy_map", "choices": _NATIONS, "min_ratio": 0.8}]}
    )
    return cleaned.select(
        F.col("n_nationkey").alias("nationkey"), "raw_name", "fixed_name"
    ).orderBy("nationkey")


def fuzzy_map_sql(col: str, choices: list[str], min_ratio: float, default: str = "keep") -> str:
    """ANSI/DuckDB SQL mirror of the fuzzy_map rule (for oracles)."""
    sims = [
        f"(1.0 - CAST(levenshtein(lower({col}), '{c.lower()}') AS DOUBLE)"
        f" / GREATEST(length({col}), {len(c)}, 1))"
        for c in choices
    ]
    best = f"GREATEST({', '.join(sims)})"
    whens = " ".join(
        f"WHEN {s} = {best} AND {best} >= {min_ratio} THEN '{c}'"
        for c, s in zip(choices, sims)
    )
    dflt = col if default == "keep" else f"'{default}'"
    return f"CASE {whens} ELSE {dflt} END"


ORACLE = {
    "rules_fuzzy_nation_names": f"""
        WITH t AS (
          SELECT n_nationkey,
                 CASE WHEN n_nationkey % 3 = 0
                      THEN substr(n_name, 1, 3) || 'X' || substr(n_name, 4)
                      ELSE n_name END AS raw_name
          FROM nation
        )
        SELECT n_nationkey AS nationkey, raw_name,
               {fuzzy_map_sql("raw_name", _NATIONS, 0.8)} AS fixed_name
        FROM t ORDER BY nationkey
    """,
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
    "rules_fuzzy_nation_names": fuzzy_nation_names,
}
