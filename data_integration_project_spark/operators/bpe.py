"""Full BPE tokenizer training (Sennrich et al. 2016) as a Spark loop.

``doc_bpe_pair_counts`` ranks merge candidates for ONE round; this
operator runs the whole training loop. The scale architecture is the
one production tokenizer trainers use on large corpora:

1. ONE pass over the corpus builds the distinct-word histogram
   (``word -> count``) — the only shuffle that touches corpus-sized
   data. Everything after runs on the histogram, whose size is the
   vocabulary (thousands), not the corpus (billions).
2. Each round counts adjacent symbol pairs WEIGHTED by word count,
   picks the argmax under a total order (count desc, pair asc), and
   applies the merge greedily left-to-right within each word.
3. The learned merge table is driver-side metadata (like k-means
   centroids in operators/similarity.py) — at apply time it is
   broadcast and replayed per document.

The merge application is a sequential fold per word (greedy
non-overlapping: in ``aaa`` the rule ``(a,a)`` merges positions 1-2,
not 2-3), expressed with ``F.aggregate`` over the symbol array. The
interpreted-lambda cost sits on |vocab| rows per round — the documented
exception to the "no interpreted HOFs" rule (see operators/dedup.py:
the histogram IS the small dim table).

Per-round ``localCheckpoint`` truncates lineage — the iterative-plan
lesson from connected components (ROADMAP: Catalyst re-analysis of
self-referential plans grows superlinearly without it).

Reference parity: the reference has no tokenizer training; this is
part of the LLM-data-pipeline surface the brief adds on top
(SURVEY §2 extension set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_histogram(docs: DataFrame, tokens_col) -> DataFrame:
    """The single corpus-wide pass: distinct words with counts."""
    return (
        docs.select(F.explode(tokens_col).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _apply_merge(syms_col, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of adjacent
    (left, right) into left||right, as an array fold."""
    merged = left + right
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    spark: SparkSession, words: DataFrame, n_merges: int
) -> DataFrame:
    """Run ``n_merges`` BPE rounds over a (word, cnt) histogram and
    return the merge table: one row per round with the chosen pair, its
    weighted count, the merged symbol, and the corpus-weighted symbol
    total AFTER applying the merge (which certifies the merge was
    applied, not just selected)."""
    from ..session import iterative_loop

    cur = words.select(
        "word", "cnt", F.split(F.col("word"), "").alias("syms")
    ).localCheckpoint(eager=False)  # materialized by the agg below
    # Round-9 optimization (guide §1.2/§2): every round after the
    # histogram runs on |vocab| rows — size the loop's shuffles from
    # the measured vocab count and suspend AQE's per-exchange
    # re-planning for the fixed-shape rounds. Each round is then ONE
    # action (the pair aggregate), because symbols_after folds into it
    # arithmetically: |syms_w| = 1 + #adjacent-pairs_w, so
    #   Σ_w cnt_w·|syms_w|  =  Σ_w cnt_w  +  Σ_pairs n  =  W + Σ n
    # with W constant across rounds — round r's certification value
    # rides round r+1's pair aggregate (one trailing aggregate covers
    # the last round). 13 actions → 8 at n_merges=6, i.e. 8 vocab
    # passes at cluster scale instead of 13.
    # Round-10 (guide §1.2 — fewer actions): the (n_vocab, W) sizing
    # aggregate no longer gets its own job; it rides round 1's
    # pair-stats action as a 1-row crossJoin branch, so round 1 runs
    # at session confs and only rounds 2+ run under iterative_loop
    # (sized from the vocab count round 1 measured). 8 actions → 7.
    meta = cur.agg(F.count(F.lit(1)).alias("n_vocab"), F.sum("cnt").alias("w"))
    first = _pair_stats(cur, meta)
    n_vocab, total_w = first["n_vocab"], int(first["w"] or 0)
    with iterative_loop(spark, n_vocab):
        out = _train_rounds(cur, n_merges, total_w, first)
    return spark.createDataFrame(
        out,
        "round int, left_sym string, right_sym string, "
        "pair_count long, merged string, symbols_after long",
    )


def _pair_stats(cur: DataFrame, meta: DataFrame | None = None):
    """ONE action per round: the weighted adjacent-pair counts reduced
    to (argmax pair under the total order count-desc/pair-asc, Σ n).
    The argmax is ``min(struct(-n, a, b))`` — lexicographic struct
    comparison reproduces the orderBy(desc n, asc a, asc b).limit(1)
    choice without a sort; Σ n yields symbols_after via the W + Σ n
    identity (see :func:`train_bpe`). An optional 1-row ``meta``
    aggregate rides the same action as a crossJoin branch (round 1's
    loop-sizing counts)."""
    stats = (
        cur.filter(F.size("syms") >= 2)
        .select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.struct(
                        F.col("syms")[i].alias("a"),
                        F.col("syms")[i + 1].alias("b"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("n"))
        .agg(
            F.min(
                F.struct(
                    (-F.col("n")).alias("negn"), F.col("a"), F.col("b")
                )
            ).alias("best"),
            F.sum("n").alias("tot"),
        )
    )
    if meta is not None:
        stats = stats.crossJoin(meta)  # two 1-row aggregates, one action
    return stats.collect()[0]


def _train_rounds(
    cur: DataFrame, n_merges: int, total_w: int, first_stats=None
) -> list:
    out: list = []
    pending = None  # (rnd, left, right, n) awaiting its symbols_after
    grandparent = None  # frame to free once `cur` is materialized
    for rnd in range(1, n_merges + 1):
        # round 1's stats may have been computed by the caller (fused
        # with the loop-sizing aggregate)
        stats = first_stats if (rnd == 1 and first_stats is not None) else _pair_stats(cur)
        # cur is materialized now, so its parent's blocks can go (a
        # lazy-checkpointed frame cannot be recomputed once freed —
        # only unpersist AFTER the child is materialized)
        if grandparent is not None:
            grandparent.unpersist()
            grandparent = None
        if pending is not None:
            out.append((*pending, int(total_w + int(stats["tot"] or 0))))
            pending = None
        if stats["best"] is None:
            break
        left, right = stats["best"]["a"], stats["best"]["b"]
        n = int(-stats["best"]["negn"])
        nxt = cur.select(
            "word", "cnt", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=False)
        pending = (rnd, left, right, n, left + right)
        grandparent = cur
        cur = nxt
    if pending is not None:
        # last round's certification: one trailing vocab aggregate
        symbols_after = int(
            cur.select(F.sum(F.col("cnt") * F.size("syms"))).collect()[0][0]
        )
        if grandparent is not None:
            grandparent.unpersist()
            grandparent = None
        out.append((*pending, symbols_after))
    if grandparent is not None:
        grandparent.unpersist()
    cur.unpersist()
    return out


def encode_words_with_merges(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """APPLY side of the tokenizer loop: replay the learned merge list
    (training order) over each distinct word and return its final
    symbol array — ``(word, syms)``.

    The merge table is driver-side metadata (k rows); each rule is one
    ``_apply_merge`` fold, chained as nested column expressions — the
    interpreted-lambda cost lands on |vocab| rows ONCE, and corpus-side
    encoding becomes a plain equi-join against this table (the same
    distinct-dim discipline as [[doc_vocab_encode]]). At 100 TB the
    corpus never runs a per-token Python or HOF path."""
    cur = F.split(F.col("word"), "")
    for left, right in merges:
        cur = _apply_merge(cur, left, right)
    return words.select("word", cur.alias("syms"))
