"""Corpus-profiling and corpus-cleaning queries: vocabulary heavy
hitters and the composed C4-style cleaning chain (quality filter →
exact dedup → per-language survivor stats).

These are the two shapes a pretraining-data pipeline runs constantly:
"what dominates the corpus" (frequent-token profile) and "what survives
cleaning" (filter + dedup funnel). Both stay entirely in JVM expression
built-ins — explode / groupBy / window — so the 100 TB pass is
map-side-combined codegen with exactly one shuffle per aggregation
level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as X
from .catalog import query, t

_TOKENS_SQL = "regexp_split_to_array(lower(trim(text)), '\\s+')"


@query(
    "doc_top_tokens",
    oracle=f"""
    SELECT token, n_occurrences, n_docs FROM (
      SELECT t AS token,
             COUNT(*) AS n_occurrences,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS t FROM documents)
      GROUP BY t
    )
    ORDER BY n_occurrences DESC, token
    LIMIT 20
    """,
)
def doc_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary heavy hitters: explode the token stream, count
    occurrences and document frequency per token, keep the global
    top 20 (total order: count desc, token asc — deterministic at the
    cut line).

    Scale shape: the explode never materializes the corpus-wide token
    list anywhere — partial counts combine map-side, the shuffle
    carries |vocab| rows, and the final top-k is TakeOrdered (no global
    sort). This is the exact two-level aggregation a 100 TB frequency
    profile needs; for truly unbounded vocab, cap with a per-partition
    pre-filter or a count-min pass first."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(20)
    )


@query(
    "corpus_clean_summary",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             len({_TOKENS_SQL}) AS n_tokens,
             CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               / nullif(length(lower(text)), 0) AS pr
      FROM documents
    ),
    kept AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM scored
      WHERE n_tokens >= 5 AND pr < 0.3
    )
    SELECT lang,
           COUNT(*) AS n_quality,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           CAST(COUNT(*) - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_rows,
           CAST(SUM(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS survivor_chars
    FROM kept
    GROUP BY lang
    """,
)
def corpus_clean_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-cleaning funnel (the C4/RefinedWeb shape):
    quality-gate each document (min token count, punctuation-ratio
    cap), exact-dedup the survivors on the normalized-text fingerprint
    with deterministic first-wins (lowest doc_id), and report the
    funnel per language — quality passes, unique survivors, duplicate
    rows dropped, and surviving character mass.

    Scale shape: one scan computes score columns in codegen; the
    quality filter prunes before the dedup shuffle (the only wide
    exchange, keyed on fingerprint); the final per-language rollup is
    map-side combined. No per-row Python, no driver state."""
    d = t(spark, sf_dir, "documents")
    n_tok = X.token_count(F.col("text"))
    pr = X.punct_ratio(F.col("text"))
    scored = d.select(
        "doc_id",
        "lang",
        "n_chars",
        X.fingerprint_md5(F.col("text")).alias("fp"),
        n_tok.alias("n_tokens"),
        pr.alias("pr"),
    )
    kept = scored.filter((F.col("n_tokens") >= 5) & (F.col("pr") < 0.3))
    rn = F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    kept = kept.withColumn("rn", rn)
    first = F.when(F.col("rn") == 1, 1).otherwise(0)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_quality"),
        F.sum(first).cast("long").alias("n_unique"),
        (F.count(F.lit(1)) - F.sum(first)).cast("long").alias("n_dup_rows"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("survivor_chars"),
    )
