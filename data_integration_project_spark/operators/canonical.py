"""Deterministic canonical-form lookups shared by the rule engine and
survivorship (VERDICT r2 task 10).

The reference's city dirt (``data/khachhang.csv:2`` — lowercase
unaccented ``hanoi`` for ``Hà Nội``) needs a FIX rule that rewrites
known variants to one canonical spelling, and the SAME mapping must be
available to golden-record survivorship so merged duplicates agree on
the surviving value. One python dict is the single source of truth; it
compiles three ways:

* a ``Column`` expression (literal map lookup — pure codegen, no join,
  free at any scale) for the rule engine's fix step;
* a broadcast-able dimension DataFrame for joins (survivorship);
* a SQL ``CASE`` fragment for the DuckDB oracles.

Canonical values are ASCII renderings (values are original per the
fixture policy — patterns are parity, not bytes; FIXTURES.md §A1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: variant (lowercased, whitespace-collapsed) -> canonical city.
#: Covers the reference's dirty pattern classes: unaccented squashed
#: forms (``hanoi``), case variants, abbreviations, and the accented
#: spellings a SQL-source row would carry.
CITY_CANONICAL: dict[str, str] = {
    "hanoi": "Ha Noi",
    "ha noi": "Ha Noi",
    "hà nội": "Ha Noi",
    "hn": "Ha Noi",
    "hochiminh": "Ho Chi Minh",
    "ho chi minh": "Ho Chi Minh",
    "hồ chí minh": "Ho Chi Minh",
    "tp hcm": "Ho Chi Minh",
    "tphcm": "Ho Chi Minh",
    "hcm": "Ho Chi Minh",
    "saigon": "Ho Chi Minh",
    "sai gon": "Ho Chi Minh",
    "haiphong": "Hai Phong",
    "hai phong": "Hai Phong",
    "hải phòng": "Hai Phong",
    "danang": "Da Nang",
    "da nang": "Da Nang",
    "đà nẵng": "Da Nang",
    "cantho": "Can Tho",
    "can tho": "Can Tho",
    "cần thơ": "Can Tho",
    "hue": "Hue",
    "huế": "Hue",
}

#: the closed domain the city check validates against after
#: canonicalization (khach_hang thanh_pho rules, doc inventory
#: COMPLETE_DOCUMENTATION.md:272).
CITY_DOMAIN: list[str] = sorted(set(CITY_CANONICAL.values()))


def _norm(col: Column) -> Column:
    """Lookup key normalization: lowercase + whitespace collapse."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def canonicalize_city(col: Column) -> Column:
    """Known variants -> canonical spelling; unknown values pass through
    unchanged (the domain CHECK downstream decides their fate). Literal
    ``map`` lookup — whole-stage codegen, nothing to broadcast."""
    pairs: list[Column] = []
    for variant, canon in CITY_CANONICAL.items():
        pairs.append(F.lit(variant))
        pairs.append(F.lit(canon))
    return F.coalesce(F.element_at(F.create_map(*pairs), _norm(col)), col)


def city_canonical_dim(spark: SparkSession) -> DataFrame:
    """The same mapping as a (variant, canonical) dimension for joins —
    survivorship broadcasts this (≤ dozens of rows at any scale; city
    vocabularies don't grow with the fact table)."""
    return spark.createDataFrame(
        sorted(CITY_CANONICAL.items()), "variant string, canonical string"
    )


def sql_city_canonical_case(expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_city` over ``expr``."""
    norm = f"lower(trim(regexp_replace({expr}, '\\s+', ' ', 'g')))"
    whens = "\n      ".join(
        f"WHEN '{v}' THEN '{c}'" for v, c in CITY_CANONICAL.items()
    )
    return f"CASE {norm}\n      {whens}\n      ELSE {expr} END"
