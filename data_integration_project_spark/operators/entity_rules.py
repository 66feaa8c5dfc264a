"""Per-entity validation rule sets — the full reconstruction of the
reference's missing quality engine (``etl/quality/rule_registry.py`` is
absent from the snapshot; SURVEY.md §0).

Sources of truth: the documented rule inventory
(``COMPLETE_DOCUMENTATION.md:265-306``) and the dirty fixture patterns
the engine must catch (SURVEY.md §5.1, FIXTURES.md §A). The doc's
per-entity HEADLINE counts are the contract implemented here::

    khach_hang 30 · mon 15 · mon_csv 12 · nguyen_lieu 17
    loai_mon 12 · dat_hang 20           = 106 rules / 6 validators

(The reference doc's per-FIELD breakdowns don't always sum to its own
entity totals — e.g. khach_hang lists 8+10+7+6+5 = 36 fields under a
"30 rules" header, dat_hang 2+3+3+4+4+3 = 19 under "20". The entity
totals are taken as authoritative; per-field allocation follows the
doc's field list with the counts reconciled, recorded per rule via the
``field`` tag and asserted by ``tests/test_entity_rules.py``.)

A "rule" is any of the reference's three kinds, all counted by the doc:

* **fix rules** — repair the value before checks (fix-then-validate
  contract, ``main.py:674-681``): whitespace collapse, trailing-punct
  strip, title case, phone digit-strip + country-prefix normalization,
  city canonicalization ([[operators/canonical.py]] — the 'hanoi' →
  canonical repair, fixture ``data/khachhang.csv:2``);
* **check rules** — Column predicates (vectorized, codegen, no UDFs);
  secondary checks use :func:`quality.if_present` so a blank value
  reports ONCE (the present rule), not once per check;
* **relational rules** — FK existence and duplicate detection are
  joins, not row predicates; they're declared here as inventory
  markers and applied with :func:`fk_exists` /
  :func:`quality.reject_duplicates`.

Per-source routing (reference ``main.py:674-681``: ``mon_rules`` vs
``mon_csv_rules`` by source): :func:`ruleset_for` dispatches on
``(entity, source)`` — the CSV menu layout validates the RAW columns
(id may be empty, price is a string, category is a NAME to resolve),
the SQL layout validates the canonical layout.

Strip-vs-reject policy (reconstructed from the fixtures): trailing
punctuation on names is STRIPPED (``Nguyen Amh*`` → valid), stray
digits in CATEGORY names are STRIPPED (``An sang3`` → ``An sang``),
but digits embedded in PERSON names are REJECTED (``Tran Hanh2424`` —
a digit inside a legal name is data corruption, not decoration).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import collapse_whitespace, digits_only, nullify_blank
from .canonical import CITY_DOMAIN, canonicalize_city
from .quality import (
    RuleSet,
    if_present,
    in_domain,
    matches,
    not_blank,
    not_null,
    positive,
)

#: letters+spaces only (RE2/Java-portable \p{L}) — rejects the
#: fixtures' ``Tran Hanh2424`` / leftover ``*`` patterns post-fix.
NAME_PATTERN = r"^[\p{L} ]+$"
PHONE_PATTERN = r"^[0-9]{9,11}$"
NUMERIC_ID_PATTERN = r"^[0-9]+$"
#: canonical integer form — no leading zeros ("007" is not an id)
CANONICAL_ID_PATTERN = r"^(0|[1-9][0-9]*)$"

ORDER_STATUSES = ["NEW", "CONFIRMED", "DONE", "CANCELLED"]
UNITS = ["kg", "g", "l", "ml", "chai", "hop", "goi", "thung", "lo", "bo"]
#: junk values that pass charset checks but carry no information
PLACEHOLDERS = ["n/a", "na", "none", "null", "unknown", "test", "tbd", "x", "xxx"]
#: throwaway email providers (disposable-domain rule class)
DISPOSABLE_DOMAINS = [
    "mailinator.com",
    "tempmail.com",
    "10minutemail.com",
    "guerrillamail.com",
]
#: sanity horizon for order dates (fixed literals keep both engines
#: deterministic; fixture dates are 2024)
ORDER_DATE_MIN, ORDER_DATE_MAX = "2000-01-01", "2030-12-31"


def _strip_quotes(col: Column) -> Column:
    return F.regexp_replace(col, "^[\"']+|[\"']+$", "")


def _strip_trailing_punct(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"[*#!?.~_-]+$", ""))


def _not_placeholder(col: str) -> Column:
    return if_present(col, ~F.lower(F.trim(F.col(col))).isin(PLACEHOLDERS))


def _not_repeated_digit(col: str) -> Column:
    c = F.col(col)
    return if_present(
        col, c != F.expr(f"repeat(substring({col}, 1, 1), length({col}))")
    )


def _numeric_or_empty(col: str) -> Column:
    return if_present(col, F.col(col).rlike(NUMERIC_ID_PATTERN))


def _phone_country_prefix(col: str) -> Column:
    """``84xxxxxxxxx`` (11 digits, country-coded) → ``0xxxxxxxxx`` —
    runs AFTER the digit strip so '+84 ...' has already lost the '+'."""
    c = F.col(col)
    return F.when(
        (F.length(c) == 11) & c.startswith("84"),
        F.concat(F.lit("0"), F.substring(c, 3, 9)),
    ).otherwise(c)


def _email_domain_ok(col: str) -> Column:
    return if_present(
        col,
        ~F.substring_index(F.col(col), "@", -1).isin(DISPOSABLE_DOMAINS),
    )


# ---------------------------------------------------------------------------
# khach_hang — 30 rules (id 7 · ho_ten 8 · sdt 6 · email 5 · thanh_pho 4)
# ---------------------------------------------------------------------------


def khach_hang_rules() -> RuleSet:
    """Customer validator, canonical layout (customer_id, ho_ten, sdt,
    thanh_pho, email). 30 rules per the doc inventory
    (COMPLETE_DOCUMENTATION.md:267-272)."""
    rs = RuleSet("khach_hang")
    # -- customer_id (7)
    rs.fix("customer_id", F.trim("customer_id"), "id_trim", field="customer_id")
    rs.fix(
        "customer_id",
        _strip_quotes(F.col("customer_id")),
        "id_strip_quotes",
        field="customer_id",
    )
    rs.rule(
        "id_present",
        not_blank("customer_id"),
        "missing customer_id",
        field="customer_id",
    )
    rs.rule(
        "id_numeric",
        _numeric_or_empty("customer_id"),
        "invalid customer_id",
        field="customer_id",
    )
    rs.rule(
        "id_positive",
        if_present("customer_id", F.col("customer_id").try_cast("long") > 0),
        "customer_id must be positive",
        field="customer_id",
    )
    rs.rule(
        "id_canonical",
        if_present(
            "customer_id",
            ~F.col("customer_id").rlike(NUMERIC_ID_PATTERN)
            | F.col("customer_id").rlike(CANONICAL_ID_PATTERN),
        ),
        "customer_id has leading zeros",
        field="customer_id",
    )
    rs.relational(
        "id_unique", "dedup", "duplicate customer_id", field="customer_id"
    )
    # -- ho_ten (8)
    rs.fix("ho_ten", collapse_whitespace(F.col("ho_ten")), "name_collapse", field="ho_ten")
    rs.fix(
        "ho_ten",
        _strip_trailing_punct(F.col("ho_ten")),
        "name_strip_trailing_punct",
        field="ho_ten",
    )
    rs.fix("ho_ten", F.initcap("ho_ten"), "name_title_case", field="ho_ten")
    rs.rule("name_present", not_blank("ho_ten"), "ho_ten is blank", field="ho_ten")
    rs.rule(
        "name_charset",
        if_present("ho_ten", F.col("ho_ten").rlike(NAME_PATTERN)),
        "ho_ten has illegal characters",
        field="ho_ten",
    )
    rs.rule(
        "name_min_len",
        if_present("ho_ten", F.length("ho_ten") >= 2),
        "ho_ten too short",
        field="ho_ten",
    )
    rs.rule(
        "name_max_len",
        if_present("ho_ten", F.length("ho_ten") <= 100),
        "ho_ten too long",
        field="ho_ten",
    )
    rs.rule(
        "name_not_placeholder",
        _not_placeholder("ho_ten"),
        "ho_ten is a placeholder",
        field="ho_ten",
    )
    # -- sdt (6)
    rs.fix(
        "sdt",
        nullify_blank(digits_only(F.col("sdt"))),
        "phone_strip_nondigits",
        field="sdt",
    )
    rs.fix("sdt", _phone_country_prefix("sdt"), "phone_country_prefix", field="sdt")
    rs.rule("phone_present", not_blank("sdt"), "missing phone", field="sdt")
    rs.rule(
        "phone_length",
        if_present("sdt", F.col("sdt").rlike(PHONE_PATTERN)),
        "invalid phone",
        field="sdt",
    )
    rs.rule(
        "phone_prefix",
        if_present("sdt", F.col("sdt").rlike("^[09]")),
        "invalid phone prefix",
        field="sdt",
    )
    rs.rule(
        "phone_not_repeated",
        _not_repeated_digit("sdt"),
        "phone is a repeated digit",
        field="sdt",
    )
    # -- email (5)
    rs.fix(
        "email",
        nullify_blank(F.lower(F.trim("email"))),
        "email_normalize",
        field="email",
    )
    rs.rule("email_present", not_blank("email"), "missing email", field="email")
    rs.rule(
        "email_format",
        if_present(
            "email",
            F.col("email").rlike(
                r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"
            ),
        ),
        "invalid email",
        field="email",
    )
    rs.rule(
        "email_not_disposable",
        _email_domain_ok("email"),
        "disposable email domain",
        field="email",
    )
    rs.relational("email_unique", "dedup", "duplicate email", field="email")
    # -- thanh_pho (4)
    rs.fix(
        "thanh_pho",
        nullify_blank(collapse_whitespace(F.col("thanh_pho"))),
        "city_collapse",
        field="thanh_pho",
    )
    rs.fix(
        "thanh_pho",
        canonicalize_city(F.col("thanh_pho")),
        "city_canonicalize",
        field="thanh_pho",
    )
    rs.rule(
        "city_present", not_blank("thanh_pho"), "missing thanh_pho", field="thanh_pho"
    )
    rs.rule(
        "city_domain",
        if_present("thanh_pho", F.col("thanh_pho").isin(CITY_DOMAIN)),
        "unknown thanh_pho",
        field="thanh_pho",
    )
    return rs


# ---------------------------------------------------------------------------
# loai_mon — 12 rules (id 4 · ten_loai 5 · mo_ta 3)
# ---------------------------------------------------------------------------


def loai_mon_rules() -> RuleSet:
    """Category validator (doc inventory: 12). Stray digits in category
    names are STRIPPED (fixture ``An sang3`` → ``An sang``) — the
    fix-side of the strip-vs-reject policy."""
    rs = RuleSet("loai_mon")
    # -- ma_loai (4)
    rs.fix("ma_loai", F.trim("ma_loai"), "id_trim", field="ma_loai")
    rs.rule("id_present", not_blank("ma_loai"), "missing ma_loai", field="ma_loai")
    rs.rule(
        "id_numeric",
        _numeric_or_empty("ma_loai"),
        "invalid ma_loai",
        field="ma_loai",
    )
    rs.relational("id_unique", "dedup", "duplicate ma_loai", field="ma_loai")
    # -- ten_loai (5)
    rs.fix(
        "ten_loai",
        nullify_blank(collapse_whitespace(F.col("ten_loai"))),
        "name_collapse",
        field="ten_loai",
    )
    rs.fix(
        "ten_loai",
        nullify_blank(F.trim(F.regexp_replace("ten_loai", "[0-9]+$", ""))),
        "name_strip_trailing_digits",
        field="ten_loai",
    )
    rs.rule(
        "name_present", not_blank("ten_loai"), "ten_loai is blank", field="ten_loai"
    )
    rs.rule(
        "name_charset",
        if_present("ten_loai", F.col("ten_loai").rlike(NAME_PATTERN)),
        "ten_loai has illegal characters",
        field="ten_loai",
    )
    rs.rule(
        "name_max_len",
        if_present("ten_loai", F.length("ten_loai") <= 100),
        "ten_loai too long",
        field="ten_loai",
    )
    # -- mo_ta (3) — optional field: NULL passes everything
    rs.fix("mo_ta", nullify_blank(F.trim("mo_ta")), "desc_trim", field="mo_ta")
    rs.rule(
        "desc_max_len",
        if_present("mo_ta", F.length("mo_ta") <= 500),
        "mo_ta too long",
        field="mo_ta",
    )
    rs.rule(
        "desc_not_placeholder",
        _not_placeholder("mo_ta"),
        "mo_ta is a placeholder",
        field="mo_ta",
    )
    return rs


# ---------------------------------------------------------------------------
# mon (SQL layout) — 15 rules (ma_mon 2 · ten_mon 5 · loai_id 4 · gia 4)
# ---------------------------------------------------------------------------


def mon_rules() -> RuleSet:
    """Menu-item validator for the CANONICAL/SQL layout (ma_mon,
    ten_mon, loai_id, gia) — doc inventory: mon 15. Price dirt
    (``abc100``, ``50 000``, ``-345``, ``0``, ``???``) lands at ≤ 0
    after transform's cast-default and is rejected by positivity."""
    rs = RuleSet("mon")
    # -- ma_mon (2) — deliveries without ids are legal (doc: CSV ids
    # "có thể rỗng"; the SQL layout may omit the column entirely)
    rs.fix("ma_mon", F.trim("ma_mon"), "id_trim", field="ma_mon")
    rs.rule(
        "id_numeric_or_empty",
        _numeric_or_empty("ma_mon"),
        "invalid ma_mon",
        field="ma_mon",
    )
    # -- ten_mon (5)
    rs.fix(
        "ten_mon",
        nullify_blank(collapse_whitespace(F.col("ten_mon"))),
        "name_collapse",
        field="ten_mon",
    )
    rs.rule("name_present", not_blank("ten_mon"), "ten_mon is blank", field="ten_mon")
    rs.rule(
        "name_min_len",
        if_present("ten_mon", F.length("ten_mon") >= 2),
        "ten_mon too short",
        field="ten_mon",
    )
    rs.rule(
        "name_max_len",
        if_present("ten_mon", F.length("ten_mon") <= 200),
        "ten_mon too long",
        field="ten_mon",
    )
    rs.rule(
        "name_not_placeholder",
        _not_placeholder("ten_mon"),
        "ten_mon is a placeholder",
        field="ten_mon",
    )
    # -- loai_id (4)
    rs.rule("loai_present", not_null("loai_id"), "loai_id missing", field="loai_id")
    rs.rule(
        "loai_positive",
        if_present("loai_id", F.col("loai_id") > 0),
        "loai_id must be positive",
        field="loai_id",
    )
    rs.rule(
        "loai_range",
        if_present("loai_id", F.col("loai_id") <= 100000),
        "loai_id out of range",
        field="loai_id",
    )
    rs.relational("loai_fk", "fk", "unknown loai_id", field="loai_id")
    # -- gia (4)
    rs.rule("price_positive", positive("gia"), "gia must be > 0", field="gia")
    rs.rule(
        "price_ceiling",
        if_present("gia", F.col("gia") <= 10_000_000),
        "gia implausibly large",
        field="gia",
    )
    rs.rule(
        "price_whole",
        if_present("gia", F.col("gia") % 1 == 0),
        "gia has fractional dong",
        field="gia",
    )
    rs.rule(
        "price_floor",
        if_present("gia", (F.col("gia") <= 0) | (F.col("gia") >= 1000)),
        "gia implausibly small",
        field="gia",
    )
    return rs


# ---------------------------------------------------------------------------
# mon_csv (raw CSV layout) — 12 rules (id 2 · ten_san_pham 5 · gia 3 · loai 2)
# ---------------------------------------------------------------------------


def mon_csv_rules() -> RuleSet:
    """Per-SOURCE variant for the CSV menu layout (id, ten_san_pham,
    gia, loai) — doc inventory: mon_csv 12; routing evidence
    ``main.py:674-681``. Validates the RAW strings BEFORE the category
    name→id lookup: price parseability is checkable here (the canonical
    layout only sees the post-default number), the category is a NAME."""
    rs = RuleSet("mon_csv")
    # -- id (2) — "có thể rỗng" (may be empty), COMPLETE_DOCUMENTATION.md:281
    rs.fix("id", F.trim("id"), "id_trim", field="id")
    rs.rule(
        "id_numeric_or_empty", _numeric_or_empty("id"), "invalid id", field="id"
    )
    # -- ten_san_pham (5)
    rs.fix(
        "ten_san_pham",
        nullify_blank(collapse_whitespace(F.col("ten_san_pham"))),
        "name_collapse",
        field="ten_san_pham",
    )
    rs.rule(
        "name_present",
        not_blank("ten_san_pham"),
        "ten_san_pham is blank",
        field="ten_san_pham",
    )
    rs.rule(
        "name_min_len",
        if_present("ten_san_pham", F.length("ten_san_pham") >= 2),
        "ten_san_pham too short",
        field="ten_san_pham",
    )
    rs.rule(
        "name_max_len",
        if_present("ten_san_pham", F.length("ten_san_pham") <= 200),
        "ten_san_pham too long",
        field="ten_san_pham",
    )
    rs.rule(
        "name_has_letter",
        if_present("ten_san_pham", F.col("ten_san_pham").rlike(r"\p{L}")),
        "ten_san_pham has no letters",
        field="ten_san_pham",
    )
    # -- gia (3) — raw string: parseability IS observable here
    rs.rule(
        "price_parseable",
        if_present("gia", F.col("gia").try_cast("double").isNotNull()),
        "gia unparseable",
        field="gia",
    )
    rs.rule(
        "price_positive",
        F.coalesce(F.col("gia").try_cast("double"), F.lit(0.0)) > 0,
        "gia must be > 0",
        field="gia",
    )
    rs.rule(
        "price_ceiling",
        if_present(
            "gia",
            F.coalesce(F.col("gia").try_cast("double"), F.lit(0.0)) <= 10_000_000,
        ),
        "gia implausibly large",
        field="gia",
    )
    # -- loai (2) — category NAME; resolution is the J4 lookup join
    rs.fix(
        "loai",
        nullify_blank(
            collapse_whitespace(
                F.regexp_replace(F.lower(F.col("loai")), "[_-]", " ")
            )
        ),
        "category_normalize",
        field="loai",
    )
    rs.rule("category_present", not_blank("loai"), "loai is blank", field="loai")
    return rs


# ---------------------------------------------------------------------------
# nguyen_lieu — 17 rules (id 2 · ten 5 · so_luong 4 · don_vi 3 · ncc 3)
# ---------------------------------------------------------------------------


def nguyen_lieu_rules() -> RuleSet:
    """Ingredient validator (doc inventory: 17). ``nha_cung_cap`` is
    optional in the staging layout (the raw CSV carries it, staging
    drops it — FIXTURES.md §A4); its rules are if-present."""
    rs = RuleSet("nguyen_lieu")
    # -- ma_nguyen_lieu (2)
    rs.fix("ma_nguyen_lieu", F.trim("ma_nguyen_lieu"), "id_trim", field="ma_nguyen_lieu")
    rs.rule(
        "id_numeric",
        matches("ma_nguyen_lieu", NUMERIC_ID_PATTERN),
        "invalid ma_nguyen_lieu",
        field="ma_nguyen_lieu",
    )
    # -- ten_nguyen_lieu (5)
    rs.fix(
        "ten_nguyen_lieu",
        nullify_blank(collapse_whitespace(F.col("ten_nguyen_lieu"))),
        "name_collapse",
        field="ten_nguyen_lieu",
    )
    rs.rule(
        "name_present",
        not_blank("ten_nguyen_lieu"),
        "ten_nguyen_lieu is blank",
        field="ten_nguyen_lieu",
    )
    rs.rule(
        "name_min_len",
        if_present("ten_nguyen_lieu", F.length("ten_nguyen_lieu") >= 2),
        "ten_nguyen_lieu too short",
        field="ten_nguyen_lieu",
    )
    rs.rule(
        "name_charset",
        # ingredient names legally carry digits ("Gao loai 1")
        if_present(
            "ten_nguyen_lieu", F.col("ten_nguyen_lieu").rlike(r"^[\p{L}0-9 ]+$")
        ),
        "ten_nguyen_lieu has illegal characters",
        field="ten_nguyen_lieu",
    )
    rs.rule(
        "name_max_len",
        if_present("ten_nguyen_lieu", F.length("ten_nguyen_lieu") <= 200),
        "ten_nguyen_lieu too long",
        field="ten_nguyen_lieu",
    )
    # -- so_luong (4)
    rs.rule(
        "qty_present", not_null("so_luong"), "so_luong missing", field="so_luong"
    )
    rs.rule(
        "qty_non_negative",
        if_present("so_luong", F.col("so_luong") >= 0),
        "so_luong negative",
        field="so_luong",
    )
    rs.rule(
        "qty_ceiling",
        if_present("so_luong", F.col("so_luong") <= 1_000_000),
        "so_luong implausibly large",
        field="so_luong",
    )
    rs.rule(
        "qty_precision",
        # stock counts are at most 3 decimals (grams within kg);
        # epsilon-compare — double arithmetic makes exact %1 lie
        if_present(
            "so_luong",
            F.abs(F.col("so_luong") * 1000 - F.round(F.col("so_luong") * 1000, 0))
            < 1e-6,
        ),
        "so_luong has excess precision",
        field="so_luong",
    )
    # -- don_vi (3)
    rs.fix(
        "don_vi",
        nullify_blank(F.lower(F.trim("don_vi"))),
        "unit_normalize",
        field="don_vi",
    )
    rs.rule("unit_present", not_blank("don_vi"), "missing don_vi", field="don_vi")
    rs.rule(
        "unit_domain",
        if_present("don_vi", in_domain("don_vi", UNITS)),
        "unknown don_vi",
        field="don_vi",
    )
    # -- nha_cung_cap (3) — optional: NULL passes
    rs.fix(
        "nha_cung_cap",
        nullify_blank(collapse_whitespace(F.col("nha_cung_cap"))),
        "supplier_collapse",
        field="nha_cung_cap",
    )
    rs.rule(
        "supplier_charset",
        if_present(
            "nha_cung_cap", F.col("nha_cung_cap").rlike(r"^[\p{L}0-9 .&-]+$")
        ),
        "nha_cung_cap has illegal characters",
        field="nha_cung_cap",
    )
    rs.rule(
        "supplier_max_len",
        if_present("nha_cung_cap", F.length("nha_cung_cap") <= 200),
        "nha_cung_cap too long",
        field="nha_cung_cap",
    )
    return rs


# ---------------------------------------------------------------------------
# dat_hang — 20 rules (id 3 · kh_id 3 · mon_id 3 · qty 4 · date 4 · status 3)
# ---------------------------------------------------------------------------


def dat_hang_rules() -> RuleSet:
    """Order validator (doc inventory: 20); FK existence is applied via
    :func:`fk_exists` (V4 — a join, not a row predicate), id uniqueness
    via :func:`quality.reject_duplicates`."""
    rs = RuleSet("dat_hang")
    # -- ma_don_hang (3)
    rs.fix("ma_don_hang", F.trim("ma_don_hang"), "id_trim", field="ma_don_hang")
    rs.rule(
        "id_numeric",
        matches("ma_don_hang", NUMERIC_ID_PATTERN),
        "invalid ma_don_hang",
        field="ma_don_hang",
    )
    rs.relational("id_unique", "dedup", "duplicate ma_don_hang", field="ma_don_hang")
    # -- khach_hang_id (3)
    rs.rule(
        "customer_ref_present",
        not_blank("khach_hang_id"),
        "khach_hang_id missing",
        field="khach_hang_id",
    )
    rs.rule(
        "customer_ref_numeric",
        _numeric_or_empty("khach_hang_id"),
        "khach_hang_id not numeric",
        field="khach_hang_id",
    )
    rs.relational(
        "customer_fk", "fk", "unknown khach_hang_id", field="khach_hang_id"
    )
    # -- mon_id (3)
    rs.rule(
        "item_ref_present", not_blank("mon_id"), "mon_id missing", field="mon_id"
    )
    rs.rule(
        "item_ref_numeric",
        _numeric_or_empty("mon_id"),
        "mon_id not numeric",
        field="mon_id",
    )
    rs.relational("item_fk", "fk", "unknown mon_id", field="mon_id")
    # -- so_luong (4)
    rs.rule(
        "qty_present", not_null("so_luong"), "so_luong missing", field="so_luong"
    )
    rs.rule(
        "qty_positive", positive("so_luong"), "so_luong must be > 0", field="so_luong"
    )
    rs.rule(
        "qty_integer",
        if_present("so_luong", F.col("so_luong") % 1 == 0),
        "so_luong not a whole number",
        field="so_luong",
    )
    rs.rule(
        "qty_ceiling",
        if_present("so_luong", F.col("so_luong") <= 1000),
        "so_luong implausibly large",
        field="so_luong",
    )
    # -- ngay_dat (4)
    rs.rule(
        "date_present",
        not_null("ngay_dat"),
        "ngay_dat missing/unparseable",
        field="ngay_dat",
    )
    rs.rule(
        "date_not_too_old",
        if_present("ngay_dat", F.col("ngay_dat") >= F.lit(ORDER_DATE_MIN).cast("date")),
        "ngay_dat before 2000",
        field="ngay_dat",
    )
    rs.rule(
        "date_not_future",
        if_present("ngay_dat", F.col("ngay_dat") <= F.lit(ORDER_DATE_MAX).cast("date")),
        "ngay_dat in the future",
        field="ngay_dat",
    )
    rs.rule(
        "date_not_epoch",
        if_present("ngay_dat", F.col("ngay_dat") != F.lit("1970-01-01").cast("date")),
        "ngay_dat is the epoch default",
        field="ngay_dat",
    )
    # -- trang_thai (3)
    rs.fix(
        "trang_thai",
        nullify_blank(F.upper(F.trim("trang_thai"))),
        "status_normalize",
        field="trang_thai",
    )
    rs.rule(
        "status_present",
        not_blank("trang_thai"),
        "trang_thai missing",
        field="trang_thai",
    )
    rs.rule(
        "status_domain",
        if_present("trang_thai", in_domain("trang_thai", ORDER_STATUSES)),
        "unknown trang_thai",
        field="trang_thai",
    )
    return rs


#: documented per-entity totals (COMPLETE_DOCUMENTATION.md:265-306)
DOCUMENTED_RULE_COUNTS = {
    "khach_hang": 30,
    "mon": 15,
    "mon_csv": 12,
    "nguyen_lieu": 17,
    "loai_mon": 12,
    "dat_hang": 20,
}

ENTITY_RULESETS = {
    "khach_hang": khach_hang_rules,
    "loai_mon": loai_mon_rules,
    "mon": mon_rules,
    "mon_csv": mon_csv_rules,
    "nguyen_lieu": nguyen_lieu_rules,
    "dat_hang": dat_hang_rules,
}


def ruleset_for(entity: str, source: str = "sql") -> RuleSet:
    """Per-source validator routing (reference ``main.py:674-681``:
    ``mon`` rows from the CSV feed go through ``mon_csv_rules``, SQL
    rows through ``mon_rules``; other entities are source-agnostic)."""
    if entity == "mon" and source == "csv":
        return mon_csv_rules()
    return ENTITY_RULESETS[entity]()


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
