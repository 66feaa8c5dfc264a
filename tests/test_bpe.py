"""BPE trainer semantics (operators/bpe.py): greedy non-overlapping
merge application and total-order pair selection, pinned against a
plain-Python reference implementation."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_project_spark.operators.bpe import train_bpe


def _ref_train(word_counts: dict[str, int], n_merges: int):
    words = {w: list(w) for w in word_counts}
    out = []
    for rnd in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + word_counts[w]
                )
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            words[w] = merged
        total = sum(word_counts[w] * len(s) for w, s in words.items())
        out.append((rnd, a, b, n, a + b, total))
    return out


def _run(spark, word_counts: dict[str, int], n_merges: int):
    df = spark.createDataFrame(
        [(w, c) for w, c in word_counts.items()], "word string, cnt long"
    )
    got = [
        tuple(r)
        for r in train_bpe(spark, df, n_merges)
        .orderBy("round")
        .collect()
    ]
    assert got == _ref_train(word_counts, n_merges), got


def test_bpe_overlapping_runs(spark):
    # 'aaa' must merge positions 1-2 (not 2-3); 'aaaa' merges twice
    _run(spark, {"aaa": 5, "aaaa": 3, "ab": 1}, 3)


def test_bpe_tiebreak_total_order(spark):
    # equal counts: lexicographically smallest pair wins
    _run(spark, {"xy": 2, "ab": 2, "cd": 2}, 2)


def test_bpe_merged_symbol_participates(spark):
    # after merging (l,o)->lo, the pair (lo, w) must be countable
    _run(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6)


def test_bpe_exhaustion_stops_early(spark):
    # single-char words: no pairs at all -> zero merge rows
    df = spark.createDataFrame([("a", 3), ("b", 2)], "word string, cnt long")
    assert train_bpe(spark, df, 4).count() == 0


def test_bpe_fold_matches_reference_on_adversarial_word(spark):
    # long same-char run exercises run-parity vs fold agreement
    _run(spark, {"a" * 9: 2, "a" * 4 + "b": 1}, 4)
