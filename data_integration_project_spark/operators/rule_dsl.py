"""Declarative rule DSL: build a :class:`~.quality.RuleSet` from plain
data (dict / JSON) instead of code.

The reference wires one validator module per entity behind a common
contract (rule_registry.validate_row, main.py:674-681) — operationally,
teams edit rule definitions, not engine code. This compiler gives the
same workflow: a rules document (checked into config, reviewed like
data) compiles to the vectorized RuleSet; unknown rule types fail
loudly at compile time, not mid-pipeline.

Document shape::

    {
      "entity": "khach_hang",
      "fixes": {"ho_ten": "collapse_whitespace",
                "email": "lower_trim", "sdt": "digits_only"},
      "rules": [
        {"type": "regex", "column": "customer_id",
         "pattern": "^[0-9]+$", "message": "invalid customer_id"},
        {"type": "not_blank", "column": "ho_ten"},
        {"type": "range", "column": "gia", "min": 0, "max": 1000000},
        {"type": "domain", "column": "trang_thai",
         "values": ["NEW", "DONE"]},
        {"type": "positive", "column": "so_luong"},
        {"type": "not_null", "column": "ngay_dat"},
        {"type": "max_length", "column": "ho_ten", "n": 100}
      ]
    }
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.cleaning import collapse_whitespace, digits_only, normalized_email
from .quality import (
    RuleSet,
    in_domain,
    in_range,
    matches,
    not_blank,
    not_null,
    positive,
)

#: named fix expressions usable in the "fixes" section
FIX_LIBRARY: dict[str, Callable[[Column], Column]] = {
    "collapse_whitespace": collapse_whitespace,
    "digits_only": digits_only,
    "lower_trim": normalized_email,
    "trim": F.trim,
    "lower": F.lower,
    "upper": F.upper,
}


def _compile_rule(spec: dict) -> tuple[str, Column, str]:
    rtype = spec["type"]
    col = spec["column"]
    name = spec.get("name", f"{rtype}_{col}")
    if rtype == "regex":
        check = matches(col, spec["pattern"])
    elif rtype == "not_blank":
        check = not_blank(col)
    elif rtype == "not_null":
        check = not_null(col)
    elif rtype == "positive":
        check = positive(col)
    elif rtype == "range":
        check = in_range(col, spec["min"], spec["max"])
    elif rtype == "domain":
        check = in_domain(col, spec["values"])
    elif rtype == "max_length":
        check = F.coalesce(F.length(col), F.lit(0)) <= spec["n"]
    else:
        raise ValueError(f"unknown rule type {rtype!r} (rule {name!r})")
    message = spec.get("message", f"{col} fails {rtype}")
    return name, check, message


def compile_ruleset(doc: dict | str) -> RuleSet:
    """Compile a rules document (dict or JSON string) to a RuleSet.
    Fix order follows document order (dicts preserve insertion order);
    rule order defines error-message order."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    rs = RuleSet(doc.get("entity", "unnamed"))
    for col, fix_name in doc.get("fixes", {}).items():
        try:
            fix = FIX_LIBRARY[fix_name]
        except KeyError:
            raise ValueError(
                f"unknown fix {fix_name!r} for column {col!r}; "
                f"known: {sorted(FIX_LIBRARY)}"
            ) from None
        rs.fix(col, fix(F.col(col)))
    for rule_spec in doc.get("rules", []):
        rs.rule(*_compile_rule(rule_spec))
    return rs
