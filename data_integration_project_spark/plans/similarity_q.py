"""Similarity-search queries over the embeddings table: exact
brute-force cosine top-k (oracle-checked — the fold arithmetic is
bit-identical across engines) and the SRP-bucketed approximate variant
(rows-only check; recall is unit-tested against the exact baseline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from .catalog import query, t

# left-to-right double fold, matching functions.vectors.dot exactly
_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(range(1, len({a})+1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
)


def _cos(a: str, b: str) -> str:
    return (
        f"{_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)}))"
    )


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_cos('q.qv', 'c.embedding')} AS cos_sim
      FROM q, embeddings c
      WHERE q.query_id <> c.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for every 100th vector as query. Brute-force
    cross join + per-query window; at scale the corpus side partitions
    by block and each block emits a local top-k merged per query (or
    swap in the SRP variant below)."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0)
    return S.brute_force_topk(queries, e, "vec_id", "embedding", k=5)


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 20 = 0
    )
    SELECT a.vec_id AS _id_a, b.vec_id AS _id_b,
           {_cos('a.embedding', 'b.embedding')} AS cos_sim
    FROM corpus a, corpus b
    WHERE a.vec_id < b.vec_id
      AND {_cos('a.embedding', 'b.embedding')} >= 0.99
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.99) over a slice
    with injected exact copies — the semantic-dedup pass of a training
    pipeline. Every injected copy must surface with cos_sim = 1.0."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    copies = e.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    corpus = e.select("vec_id", "embedding").unionByName(copies)
    return S.cosine_near_dup_pairs(corpus, "vec_id", "embedding", threshold=0.99)


@query("ann_topk_pandas")  # no oracle: BLAS sum order ≠ fold order (~1e-15)
def ann_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized-Pandas-UDF exact path: broadcast corpus index +
    one matmul per Arrow query batch. Same semantics as ann_cosine_topk
    (agreement unit-tested); the fast lane when Python is in play."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0)
    return S.brute_force_topk_pandas(queries, e, "vec_id", "embedding", k=5)


@query("ann_ivf_topk")  # no oracle: approximate — recall tested vs exact
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic mini-k-means coarse quantizer → inverted
    lists keyed by cluster id → queries probe their n_probe nearest
    lists only. The centroid table is driver-sized metadata; corpus
    assignment and scoring stay distributed (cluster id = join key)."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0)
    return S.ivf_topk(
        queries, e, "vec_id", "embedding", k=5, n_clusters=16, n_probe=6, n_iters=3
    )


@query("ann_srp_bucketed")  # no oracle: approximate — recall tested vs exact
def ann_srp_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: signed-random-projection buckets (deterministic
    hyperplanes), cosine only within the query's bucket. ~2^planes×
    fewer comparisons; recall vs the exact baseline is asserted in
    tests/test_similarity.py."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0)
    return S.srp_bucketed_topk(queries, e, "vec_id", "embedding", k=5, n_planes=3, n_tables=8)
