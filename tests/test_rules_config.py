"""Config validation for the rules engine (reference parity:
``libs/hoopstat-config`` — typed config loading with actionable
validation errors instead of deep-compile stack traces)."""

import pytest

from hoopstat_haus_spark.functions.rules_engine import (
    DEMO_RULES,
    RuleConfigError,
    compile_rules,
    validate_rules,
)


def test_demo_rules_validate(spark):
    validate_rules(DEMO_RULES)  # the shipped config must be valid
    assert set(compile_rules(DEMO_RULES)) == set(DEMO_RULES)


@pytest.mark.parametrize(
    "rules, fragment",
    [
        ("not a dict", "must be a dict"),
        ({"c": "not a list"}, "must be a list"),
        ({"c": ["not a dict"]}, "must be a dict"),
        ({"c": [{"op": "nope"}]}, "unknown op"),
        ({"c": [{"op": "map_values"}]}, "missing required key 'mapping'"),
        ({"c": [{"op": "map_values", "mapping": {}}]}, "non-empty"),
        ({"c": [{"op": "map_values", "mapping": []}]}, "must be dict"),
        ({"c": [{"op": "clamp", "lo": 5, "hi": 1}]}, "lo 5 > hi 1"),
        ({"c": [{"op": "clamp", "lo": "x", "hi": 1}]}, "must be int/float"),
        ({"c": [{"op": "fuzzy_map", "choices": [], "min_ratio": 0.5}]}, "non-empty list of strings"),
        ({"c": [{"op": "fuzzy_map", "choices": ["a"], "min_ratio": 7}]}, "must be in [0, 1]"),
        ({"c": [{"op": "date_format", "fmt": 3}]}, "must be str"),
        ({"c": [{"op": "fill_null", "value": 0, "bogus": 1}]}, "unexpected keys"),
        ({3: [{"op": "title_case"}]}, "column name string"),
    ],
)
def test_malformed_configs_fail_with_context(rules, fragment):
    with pytest.raises(RuleConfigError) as exc:
        compile_rules(rules)
    assert fragment in str(exc.value), str(exc.value)


def test_error_names_column_and_rule_index():
    rules = {"price": [{"op": "clamp", "lo": 0, "hi": 10}, {"op": "bogus"}]}
    with pytest.raises(RuleConfigError) as exc:
        validate_rules(rules)
    msg = str(exc.value)
    assert "'price'" in msg and "#1" in msg
