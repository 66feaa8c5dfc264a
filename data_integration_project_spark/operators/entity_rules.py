"""Per-entity validation rule sets — the reconstruction of the
reference's missing quality engine (``etl/quality/rule_registry.py`` is
absent from the snapshot; SURVEY.md §0). Sources of truth: the rule
inventory (COMPLETE_DOCUMENTATION.md:265-306 — khach_hang 30, mon 15,
mon_csv 12, nguyen_lieu 17, loai_mon 12, dat_hang 20) and the dirty
fixture patterns the engine must catch (SURVEY.md §5.1).

Rules apply to the CANONICAL post-transform layouts
(schemas.ENTITIES); fix-then-validate ordering matches the reference
contract (validate_row returns a *fixed* row, main.py:674-681).
Numeric-parseability dirt (price ``abc``/``50 000``) is caught after
cast-default-0 by the positivity rules — same reject verdict, one pass.

Every predicate is a Column expression (vectorized, codegen); FK
existence (V4) is relational — see ``fk_exists`` — because a rule that
needs another table is a join, not a row predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quality import (
    RuleSet,
    in_domain,
    matches,
    not_blank,
    not_null,
    positive,
)

#: letters+spaces only (RE2/Java-portable \p{L}) — rejects the
#: fixtures' ``Trần Hạnh2424`` / ``Nguyen Amh*`` patterns.
NAME_PATTERN = r"^[\p{L} ]+$"
PHONE_PATTERN = r"^[0-9]{9,11}$"
NUMERIC_ID_PATTERN = r"^[0-9]+$"

ORDER_STATUSES = ["NEW", "CONFIRMED", "DONE", "CANCELLED"]
UNITS = ["kg", "g", "l", "ml", "chai", "hop", "goi", "thung"]


def khach_hang_rules() -> RuleSet:
    """Customer validator (doc inventory: 30 rules across id/name/
    phone/email/city classes; the load-bearing reconstructions)."""
    return (
        RuleSet("khach_hang")
        .rule("id_numeric", matches("customer_id", NUMERIC_ID_PATTERN), "invalid customer_id")
        .rule("name_not_blank", not_blank("ho_ten"), "ho_ten is blank")
        .rule("name_charset", matches("ho_ten", NAME_PATTERN), "ho_ten has illegal characters")
        .rule(
            "name_length",
            F.coalesce(F.length("ho_ten"), F.lit(0)) <= 100,
            "ho_ten too long",  # NULL names are the blank rule's job
        )
        .rule("phone_format", matches("sdt", PHONE_PATTERN), "invalid phone")
        .rule(
            "email_format",
            matches("email", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"),
            "invalid email",
        )
    )


def loai_mon_rules() -> RuleSet:
    """Category validator (doc inventory: 12 rules)."""
    return (
        RuleSet("loai_mon")
        .rule("ma_numeric", matches("ma_loai", NUMERIC_ID_PATTERN), "invalid ma_loai")
        .rule("name_not_blank", not_blank("ten_loai"), "ten_loai is blank")
        .rule("name_charset", matches("ten_loai", NAME_PATTERN), "ten_loai has illegal characters")
    )


def mon_rules() -> RuleSet:
    """Menu-item validator (doc inventory: mon 15 / mon_csv 12). Price
    dirt (``abc100``, ``50 000``, ``-345``, ``0``, ``???``) all lands at
    ≤ 0 after transform's cast-default and is rejected here."""
    return (
        RuleSet("mon")
        .rule("name_not_blank", not_blank("ten_mon"), "ten_mon is blank")
        .rule("price_positive", positive("gia"), "gia must be > 0")
        .rule("price_ceiling", F.col("gia") <= 10_000_000, "gia implausibly large")
    )


def nguyen_lieu_rules() -> RuleSet:
    """Ingredient validator (doc inventory: 17 rules)."""
    return (
        RuleSet("nguyen_lieu")
        .rule("ma_numeric", matches("ma_nguyen_lieu", NUMERIC_ID_PATTERN), "invalid ma_nguyen_lieu")
        .rule("name_not_blank", not_blank("ten_nguyen_lieu"), "ten_nguyen_lieu is blank")
        .rule("qty_non_negative", not_null("so_luong") & (F.col("so_luong") >= 0), "so_luong negative")
        .rule("unit_domain", in_domain("don_vi", UNITS), "unknown don_vi")
        .rule("price_positive", positive("gia"), "gia must be > 0")
        .rule("date_present", not_null("ngay_nhap"), "ngay_nhap missing/unparseable")
    )


def dat_hang_rules() -> RuleSet:
    """Order validator (doc inventory: 20 rules); FK existence is
    applied separately via :func:`fk_exists` (V4 — a join, not a row
    predicate)."""
    return (
        RuleSet("dat_hang")
        .rule("customer_ref_present", not_blank("khach_hang_id"), "khach_hang_id missing")
        .rule("item_ref_present", not_blank("mon_id"), "mon_id missing")
        .rule("qty_positive", positive("so_luong"), "so_luong must be > 0")
        .rule("status_domain", in_domain("trang_thai", ORDER_STATUSES), "unknown trang_thai")
        .rule("date_present", not_null("ngay_dat"), "ngay_dat missing/unparseable")
    )


ENTITY_RULESETS = {
    "khach_hang": khach_hang_rules,
    "loai_mon": loai_mon_rules,
    "mon": mon_rules,
    "nguyen_lieu": nguyen_lieu_rules,
    "dat_hang": dat_hang_rules,
}


def fk_exists(
    df: DataFrame,
    key: str,
    dim: DataFrame,
    dim_key: str,
    message: str,
) -> DataFrame:
    """V4 foreign-key existence check (doc rule class 'Foreign key
    checks', dat_hang rules COMPLETE_DOCUMENTATION.md:298-304): LEFT
    join against the dimension's keys and append an error when no match
    — keeps the row (and its message) unlike an anti-join. Dims are
    small → Catalyst broadcasts; appends to ``_errors`` if present."""
    marker = f"_fk_{dim_key}"
    keys = dim.select(F.col(dim_key).alias(key)).distinct().withColumn(
        marker, F.lit(True)
    )
    joined = df.join(F.broadcast(keys), key, "left")
    err = F.when(F.col(marker).isNull(), F.lit(message))
    if "_errors" in df.columns:
        errors = F.when(
            err.isNotNull(), F.array_append(F.col("_errors"), err)
        ).otherwise(F.col("_errors"))
    else:
        errors = F.filter(F.array(err), lambda x: x.isNotNull())
    return (
        joined.withColumn("_errors", errors)
        .withColumn("_is_valid", F.size("_errors") == 0)
        .drop(marker)
    )
