"""Semantic unit tests for BPE merge learning (text.py::bpe_merges).

The registry oracle suite proves Spark/DuckDB parity at sf0.01;
these pin the TRAINING SEMANTICS against hand-computed Sennrich-2016
greedy BPE on tiny corpora: most-frequent pair wins, merged tokens
compose into later merges, left-to-right non-overlapping application
on runs, and the deterministic tie-break.
"""

from __future__ import annotations

import tidb_lightning_release_4_0_spark.operators.text as X


def _merges(spark, texts, n):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in X.bpe_merges(df, n_merges=n).orderBy("merge_rank").collect()
    ]


def test_most_frequent_pair_merges_first(spark):
    # "ab" appears in every word; hand-count: pairs of "abab" = (a,b)x2,
    # (b,a)x1; "abc" = (a,b),(b,c). Corpus (a,b) count = 3+2=5? ->
    # abab twice in corpus: see texts. (a,b): abab has 2 per occurrence
    # (2 occurrences -> 4) + abc 1 = 5; (b,a): 2; (b,c): 1.
    out = _merges(spark, ["abab abab", "abc"], 1)
    assert out == [(1, "a", "b", 5)]


def test_merges_compose(spark):
    # After (a,b)->ab everywhere, "abab" becomes [ab, ab] and the
    # second round must merge the COMPOSED pair (ab, ab).
    out = _merges(spark, ["abab abab abab"], 2)
    assert out[0] == (1, "a", "b", 6)
    assert out[1] == (2, "ab", "ab", 3)


def test_left_to_right_nonoverlapping_on_runs(spark):
    # "aaa": greedy left-to-right (a,a) application gives [aa, a] —
    # one merged occurrence per word, never the overlapping two.
    # Round 1 count: "aaa" has pairs (a,a)x2 per word, 3 words -> 6.
    # Round 2 operates on [aa, a]: pair (aa, a) count 3.
    out = _merges(spark, ["aaa aaa aaa"], 2)
    assert out[0] == (1, "a", "a", 6)
    assert out[1] == (2, "aa", "a", 3)


def test_even_runs_merge_pairwise(spark):
    # "aaaa" -> [aa, aa] in one round (replace continues after each
    # non-overlapping match), so round 2 merges (aa, aa).
    out = _merges(spark, ["aaaa aaaa"], 2)
    assert out[0] == (1, "a", "a", 6)
    assert out[1] == (2, "aa", "aa", 2)


def test_tie_breaks_lexicographically(spark):
    # (a,b) and (c,d) both appear exactly twice; the (count desc,
    # lhs, rhs) order must pick (a,b) in every engine and every run.
    out = _merges(spark, ["ab cd", "ab cd"], 1)
    assert out == [(1, "a", "b", 2)]


def test_tokenization_matches_text_family(spark):
    # Non-letter characters split words (same [^a-z]+ rule as the
    # other text operators), so "ab-ab" contributes two words.
    out = _merges(spark, ["ab-ab! AB?"], 1)
    assert out == [(1, "a", "b", 3)]


def test_stops_early_when_no_pairs_remain(spark):
    # Single-letter vocabulary: no adjacent pairs at all -> empty
    # merge table even though n_merges asked for 4.
    out = _merges(spark, ["a b c a"], 4)
    assert out == []
