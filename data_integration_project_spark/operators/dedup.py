"""Corpus deduplication operators for training-data pipelines:
exact (fingerprint group-by), MinHash+LSH, SimHash, and n-gram Jaccard.

All stages are relational — explode/groupBy/join — so every operator
scales horizontally: no driver-side state, no all-pairs comparison
outside LSH/pigeonhole-bounded candidate sets.

Portability: the hash family is built on a polynomial character hash
(``portable_hash``) with fixed affine parameters, expressible in any
SQL engine — the DuckDB oracles replicate signatures bit-for-bit.
Parameters (P, a_i, b_i) are literals, never runtime randomness, so
results are reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.text import fingerprint_md5, tokens, word_shingles

#: Mersenne prime 2^31-1; products a_i * hash stay well inside int64.
P = 2147483647


def hash_params(n: int) -> list[tuple[int, int]]:
    """Fixed affine hash family h_i(x) = (a_i·x + b_i) mod P."""
    return [
        ((1103515245 * (i + 1)) % P or 1, (12345 * (i + 1) + 7) % P)
        for i in range(n)
    ]


def portable_hash(col: Column) -> Column:
    """Polynomial char hash: fold (acc·31 + ascii(c)) mod P.

    DuckDB twin (verified bit-equal)::

        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(s,''), c -> CAST(ascii(c) AS BIGINT))),
          (acc, c) -> (acc*31 + c) % 2147483647)
    """
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % P,
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact near-free dedup: md5 over normalized text, first-wins by id.
    One shuffle on the fingerprint; adds ``_fingerprint`` and
    ``_dup_rank`` (rank 1 = canonical survivor)."""
    w = Window.partitionBy("_fingerprint").orderBy(id_col)
    return df.withColumn("_fingerprint", fingerprint_md5(F.col(text_col))).withColumn(
        "_dup_rank", F.row_number().over(w)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Distinct (id, shingle-hash) pairs — the set representation used by
    both MinHash and exact-Jaccard verification.

    Repartitions by id first: shingling is expression-heavy (interpreted
    higher-order functions), so spread it across the cluster even when
    the source is a single small file — and the id partitioning is
    exactly what the downstream per-doc groupBys need, so the shuffle is
    reused, not added."""
    return (
        df.repartition(F.col(id_col))
        .select(F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("_sh"))
        .select(id_col, portable_hash(F.col("_sh")).alias("_shash"))
        .distinct()
    )


def minhash_signature(shingled: DataFrame, id_col: str, n_hashes: int) -> DataFrame:
    """Long-format signatures: (id, _hidx, _minhash). The cross join with
    the n-row parameter table is broadcast; min-aggregation is one
    shuffle on the doc id (map-side combined)."""
    spark = shingled.sparkSession
    params = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(hash_params(n_hashes))],
        "_hidx int, _a long, _b long",
    )
    return (
        shingled.crossJoin(F.broadcast(params))
        .groupBy(id_col, "_hidx")
        .agg(F.min((F.col("_a") * F.col("_shash") + F.col("_b")) % P).alias("_minhash"))
    )


def lsh_buckets(
    signatures: DataFrame, id_col: str, n_bands: int, rows_per_band: int
) -> DataFrame:
    """Band the signature: (id, _band, _bucket) where _bucket is the
    joined minhash run of that band. Docs sharing a bucket in any band
    become candidate pairs — the classic s-curve knob
    (n_bands × rows_per_band = n_hashes)."""
    banded = signatures.withColumn("_band", (F.col("_hidx") / rows_per_band).cast("int"))
    return banded.groupBy(id_col, "_band").agg(
        F.concat_ws(
            "-", F.array_sort(F.collect_list(F.struct("_hidx", "_minhash")))["_minhash"]
        ).alias("_bucket")
    )


def candidate_pairs(buckets: DataFrame, id_col: str) -> DataFrame:
    """Self-join on (band, bucket), id_a < id_b, distinct across bands.
    Skew note: a degenerate bucket (e.g. empty-text docs) would explode
    quadratically — AQE skew-join splitting plus an optional bucket-size
    cap handle that at scale."""
    a = buckets.select(
        F.col(id_col).alias("_id_a"), F.col("_band"), F.col("_bucket")
    )
    b = buckets.select(
        F.col(id_col).alias("_id_b"), F.col("_band"), F.col("_bucket")
    )
    return (
        a.join(b, ["_band", "_bucket"])
        .filter(F.col("_id_a") < F.col("_id_b"))
        .select("_id_a", "_id_b")
        .distinct()
    )


def jaccard_pairs(
    pairs: DataFrame, shingled: DataFrame, id_col: str
) -> DataFrame:
    """Exact Jaccard for candidate pairs: intersection counted by
    joining each doc's shingle set through the pair list (two hash
    joins), union by inclusion-exclusion."""
    sh_a = shingled.select(F.col(id_col).alias("_id_a"), "_shash")
    sh_b = shingled.select(F.col(id_col).alias("_id_b"), "_shash")
    inter = (
        pairs.join(sh_a, "_id_a")
        .join(sh_b, ["_id_b", "_shash"])
        .groupBy("_id_a", "_id_b")
        .agg(F.count(F.lit(1)).alias("_n_inter"))
    )
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    return (
        pairs.join(inter, ["_id_a", "_id_b"], "left")
        .na.fill({"_n_inter": 0})
        .join(sizes.select(F.col(id_col).alias("_id_a"), F.col("_sz").alias("_sz_a")), "_id_a")
        .join(sizes.select(F.col(id_col).alias("_id_b"), F.col("_sz").alias("_sz_b")), "_id_b")
        .withColumn(
            "jaccard",
            F.col("_n_inter") / (F.col("_sz_a") + F.col("_sz_b") - F.col("_n_inter")),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash/LSH near-dup detection: shingle → sign →
    band → bucket-join → exact-Jaccard verify → pairs ≥ threshold.
    Returns (_id_a, _id_b, jaccard).

    The shingle table feeds three consumers (signatures, intersection,
    sizes), so it is persisted spill-safely rather than recomputed —
    at corpus scale this is the difference between one and three full
    tokenization passes."""
    from pyspark import StorageLevel

    shingled = doc_shingles(df, id_col, text_col, shingle_k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # materialize BEFORE fan-out: three consumers racing an unfilled
    # cache would each recompute the full shingling (and contend on
    # cache writes); one eager pass fills it once.
    shingled.count()
    sigs = minhash_signature(shingled, id_col, n_hashes)
    buckets = lsh_buckets(sigs, id_col, n_bands, n_hashes // n_bands)
    cands = candidate_pairs(buckets, id_col)
    verified = jaccard_pairs(cands, shingled, id_col)
    return verified.filter(F.col("jaccard") >= threshold).select(
        "_id_a", "_id_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signature(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """Token-frequency-weighted SimHash: per token, ``portable_hash``
    supplies pseudo-random bits; each bit contributes ±1 per occurrence;
    the fingerprint sets bit j where the weighted sum is positive.
    Explode + one groupBy — linear in corpus size."""
    toks = df.repartition(F.col(id_col)).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    hashed = toks.withColumn("_h", portable_hash(F.col("_tok")))
    bit_sums = [
        F.sum(
            F.when((F.floor(F.col("_h") / (1 << j)) % 2) == 1, 1).otherwise(-1)
        ).alias(f"_s{j}")
        for j in range(bits)
    ]
    summed = hashed.groupBy(id_col).agg(*bit_sums)
    fingerprint = sum(
        (F.when(F.col(f"_s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(bits)),
        start=F.lit(0),
    )
    return summed.select(id_col, fingerprint.cast("long").alias("simhash"))


def simhash_pairs(
    sigs: DataFrame, id_col: str, max_hamming: int, bits: int = 32
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ d via pigeonhole banding:
    split the fingerprint into d+1 chunks — any pair within distance d
    agrees on ≥1 whole chunk, so candidates come from equi-joins on
    (chunk_idx, chunk_value), never an all-pairs scan."""
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    chunks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("_chunk"),
                        (F.floor(F.col("simhash") / (1 << (c * chunk_bits))) % (1 << chunk_bits)).alias(
                            "_cval"
                        ),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("_ch"),
    ).select(id_col, "simhash", F.col("_ch._chunk").alias("_chunk"), F.col("_ch._cval").alias("_cval"))
    a = chunks.select(
        F.col(id_col).alias("_id_a"), F.col("simhash").alias("_sig_a"), "_chunk", "_cval"
    )
    b = chunks.select(
        F.col(id_col).alias("_id_b"), F.col("simhash").alias("_sig_b"), "_chunk", "_cval"
    )
    cands = (
        a.join(b, ["_chunk", "_cval"])
        .filter(F.col("_id_a") < F.col("_id_b"))
        .select("_id_a", "_id_b", "_sig_a", "_sig_b")
        .distinct()
    )
    return cands.withColumn(
        "hamming", F.bit_count(F.col("_sig_a").bitwiseXOR(F.col("_sig_b")))
    ).filter(F.col("hamming") <= max_hamming)
