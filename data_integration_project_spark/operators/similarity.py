"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k as the exact baseline, and a signed-random-
projection (SRP) bucketed variant as the scale path.

The brute-force form is a cross join — correct and oracle-checkable,
O(|Q|·|C|); keep |Q| bounded. The SRP variant hashes vectors into
2^n_planes buckets with deterministic pseudo-random hyperplanes (plane
components derived from integer hashing — no RNG state, reproducible
across runs/engines) and only compares within a bucket: at 1000-executor
scale the bucket id becomes the shuffle key and each bucket is a local
top-k, merged per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.vectors import cosine

# fixed 32-bit odd multiplier (Knuth); plane component c(p, d) in [-1, 1)
_KNUTH = 2654435761


def _plane_component(table: int, plane: int, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    integer hash of (table, plane, dim) scaled — portable arithmetic,
    no RNG state."""
    h = ((F.lit(table * 524287 + plane * 8191) + dim + 1) * _KNUTH) % 2147483648
    return (h / F.lit(1073741824.0)) - 1.0


def srp_bucket(vec: Column, n_planes: int, table: int = 0) -> Column:
    """Signed-random-projection bucket id: bit p = sign(v · plane_p)."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(dims, lambda d: _plane_component(table, p, d)),
                    lambda x, c: x.cast("double") * c,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1 << p),
        ).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    return sum(bits, start=F.lit(0)).cast("int")


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k: cross join + fold-based cosine + per-query window.
    Ties break on corpus id for full determinism. Self-matches
    (same id) are excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    # spread the O(|Q|·|C|) cosine work: partition the query side so the
    # cross join fans out even when both inputs are single files
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        q.repartition(F.col("query_id"))
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def srp_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_planes: int = 3,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: compare only within the query's SRP bucket,
    unioning candidates across ``n_tables`` independent hash tables
    (multi-table LSH — each table misses different neighbors; the union
    recovers recall that a single table can't reach on near-uniform
    data). Cost ≈ n_tables / 2^n_planes of brute force."""

    def bucketed(df: DataFrame, idn: str, vecn: str) -> DataFrame:
        tables = F.array(
            *[srp_bucket(F.col(vecn), n_planes, table) for table in range(n_tables)]
        )
        staged = df.select(
            F.col(id_col).alias(idn), F.col(vec_col).alias(vecn)
        ).withColumn("_tables", tables)
        return staged.select(
            idn, vecn, F.posexplode("_tables").alias("_table", "_bucket")
        )

    q = bucketed(queries, "query_id", "_qv")
    c = bucketed(corpus, "neighbor_id", "_cv")
    scored = (
        q.join(c, ["_table", "_bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .distinct()  # a pair found by several tables is scored once
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def brute_force_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k via an Arrow-batched Pandas UDF: the corpus index is
    broadcast to executors as one numpy matrix; each query batch is a
    single BLAS matmul (~100× the per-element fold throughput).

    This is the classic broadcast-index shape: right when the corpus
    index fits executor memory (here ~|C|·d·4 bytes) and the QUERY side
    is the big, partitioned one. At 100 TB-corpus scale, invert or
    block it: partition the corpus into index blocks, run this per
    block, and merge per-query top-k across blocks (a groupBy(query)
    window over the unioned block results).

    Scores can differ from the fold-based :func:`brute_force_topk` by
    float-summation order (~1e-15 rel) — ranking is tie-broken on id,
    so top-k membership only changes on genuine near-ties; no DuckDB
    oracle for this path."""
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    rows = corpus.select(id_col, vec_col).collect()  # index build: |C|·d floats
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat_norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat_norm))

    def op(batches):
        c_ids, c_mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ c_mat.T  # one BLAS call per Arrow batch
            out = []
            for i, qid in enumerate(q_ids):
                s = sims[i]
                mask = c_ids != qid  # exclude self-match
                order = np.lexsort((c_ids[mask], -s[mask]))[:k]
                cand_ids, cand_s = c_ids[mask][order], s[mask][order]
                for rank, (nid, sim) in enumerate(zip(cand_ids, cand_s), start=1):
                    out.append((qid, nid, float(sim), rank))
            yield pd.DataFrame(
                out, columns=["query_id", "neighbor_id", "cos_sim", "rank"]
            )

    q = queries.select(id_col, vec_col).repartition(F.col(id_col))
    return q.mapInPandas(
        op, schema="query_id long, neighbor_id long, cos_sim double, rank int"
    )


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    *,
    n_iters: int = 5,
) -> "object":
    """Deterministic mini k-means for the IVF coarse quantizer: init
    from id-evenly-spaced corpus vectors (no RNG), then n_iters of
    assign (numpy matmul inside mapInPandas) + per-cluster mean
    (codegen aggregate over exploded dims). The centroid table is
    k×d — genuinely driver-sized metadata (16×64 here); everything
    row-scale stays distributed."""
    import numpy as np

    n = corpus.count()
    step = max(n // k, 1)
    w = Window.orderBy(id_col)
    seed_rows = (
        corpus.select(id_col, vec_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") - 1) % step == 0)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids = np.array([r[0] for r in seed_rows], dtype=np.float64)

    spark = corpus.sparkSession
    for _ in range(n_iters):
        bc = spark.sparkContext.broadcast(centroids)

        def assign(batches):
            import pandas as pd

            cents = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
                d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                out = pd.DataFrame({"_cluster": d2.argmin(axis=1).astype("int32")})
                out[vec_col] = list(pdf[vec_col])
                yield out

        assigned = corpus.select(vec_col).mapInPandas(
            assign, schema=f"_cluster int, {vec_col} array<float>"
        )
        # per-cluster mean via explode + codegen avg (no driver rows
        # beyond the k×d result)
        means = (
            assigned.select("_cluster", F.posexplode(vec_col).alias("_d", "_x"))
            .groupBy("_cluster", "_d")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        new = centroids.copy()
        for r in means:
            new[r["_cluster"], r["_d"]] = r["_m"]
        centroids = new
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    *,
    n_clusters: int = 16,
    n_probe: int = 4,
    n_iters: int = 3,
) -> DataFrame:
    """IVF approximate top-k: a k-means coarse quantizer partitions the
    corpus into inverted lists; each query scores only the ``n_probe``
    nearest lists (cost ≈ n_probe/n_clusters of brute force). The
    cluster id is the shuffle/join key — at scale the inverted lists
    are the partitioning, and the centroid table stays broadcast."""
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    centroids = kmeans_centroids(corpus, id_col, vec_col, n_clusters, n_iters=n_iters)
    bc = spark.sparkContext.broadcast(centroids)

    def assign_one(batches):
        cents = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "_cluster": d2.argmin(axis=1).astype("int32"),
                }
            )
            out[vec_col] = list(pdf[vec_col])
            yield out

    schema = f"{id_col} long, _cluster int, {vec_col} array<float>"
    c_assigned = corpus.select(id_col, vec_col).mapInPandas(assign_one, schema=schema)

    def assign_probes(batches):
        cents = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            probes = np.argsort(d2, axis=1)[:, :n_probe].astype("int32")
            out = pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_probe),
                    "_cluster": probes.reshape(-1),
                }
            )
            out[vec_col] = [v_ for v_ in pdf[vec_col] for _ in range(n_probe)]
            yield out

    q_probed = queries.select(id_col, vec_col).mapInPandas(assign_probes, schema=schema)

    q = q_probed.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "_cluster"
    )
    c = c_assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "_cluster"
    )
    scored = (
        q.join(c, "_cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
        .distinct()  # a neighbor reachable via several probed lists scores once
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Embedding near-duplicate pairs (cos ≥ threshold, id_a < id_b).
    All-pairs form — bound the corpus slice, or swap in srp buckets as
    the candidate generator for web scale."""
    a = corpus.select(F.col(id_col).alias("_id_a"), F.col(vec_col).alias("_va"))
    b = corpus.select(F.col(id_col).alias("_id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.repartition(F.col("_id_a"))
        .crossJoin(b)
        .filter(F.col("_id_a") < F.col("_id_b"))
        .select(
            "_id_a",
            "_id_b",
            cosine(F.col("_va"), F.col("_vb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
