"""Rule-DSL compiler: a JSON rules document must behave identically to
the hand-built RuleSet, and bad documents must fail at compile time."""

from __future__ import annotations

import json

import pytest

from data_integration_project_spark.operators.rule_dsl import compile_ruleset

_DOC = {
    "entity": "khach_hang",
    "fixes": {
        "ho_ten": "collapse_whitespace",
        "email": "lower_trim",
        "sdt": "digits_only",
    },
    "rules": [
        {"type": "regex", "column": "customer_id", "pattern": "^[0-9]+$",
         "message": "invalid customer_id"},
        {"type": "not_blank", "column": "ho_ten", "message": "ho_ten is blank"},
        {"type": "regex", "column": "sdt", "pattern": "^[0-9]{9,11}$",
         "message": "invalid phone"},
        {"type": "max_length", "column": "ho_ten", "n": 100},
    ],
}


def test_dsl_matches_handwritten_behavior(spark):
    rows = [
        ("1", "  An   Nguyen ", "09-1234-5678", "An@Example.VN"),  # fixed → valid
        ("x", "Binh", "123", "b@x.vn"),  # bad id + short phone
        ("2", None, "0912345678", "c@x.vn"),  # blank name
    ]
    df = spark.createDataFrame(
        rows, "customer_id string, ho_ten string, sdt string, email string"
    )
    validated = compile_ruleset(json.dumps(_DOC)).validate(df)
    got = {r["customer_id"]: (r["_is_valid"], list(r["_errors"]), r["ho_ten"], r["email"])
           for r in validated.collect()}
    assert got["1"] == (True, [], "An Nguyen", "an@example.vn")
    assert got["x"][0] is False
    assert got["x"][1] == ["invalid customer_id", "invalid phone"]
    assert got["2"][1] == ["ho_ten is blank"]


def test_dsl_rejects_unknown_types():
    with pytest.raises(ValueError, match="unknown rule type"):
        compile_ruleset({"rules": [{"type": "telepathy", "column": "x"}]})
    with pytest.raises(ValueError, match="unknown fix"):
        compile_ruleset({"fixes": {"x": "magic"}})
