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


# ---------------------------------------------------------------------------
# Reference-implementation property test (train + encode)
# ---------------------------------------------------------------------------


def _ref_bpe(texts, n_merges):
    """Straight-line Sennrich BPE on the word-frequency dict."""
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((rank, l, r, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges, vocab, words


def test_trainer_matches_reference_on_random_corpora(spark):
    import random

    rng = random.Random(7)
    alphabet = "abcde"
    for trial in range(3):
        texts = [
            " ".join(
                "".join(
                    rng.choice(alphabet)
                    for _ in range(rng.randint(1, 6))
                )
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(15)
        ]
        want = _ref_bpe(texts, 5)[0]
        got = _merges(spark, texts, 5)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_encode_matches_reference_symbol_counts(spark):
    import re

    texts = ["abab banana abc abab", "banana aba cabc"]
    merges, vocab, words = _ref_bpe(texts, 4)
    import tidb_lightning_release_4_0_spark.operators.text as X

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chars_sym, r.n_subwords)
        for r in X.bpe_encode(
            df, [(l, r_) for _, l, r_, _ in merges]
        ).collect()
    }
    # reference: encode each doc's words via the final vocab mapping
    final = { "".join(k): k for k in vocab }
    for i, t in enumerate(texts):
        ws = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
        n_chars = sum(len(w) for w in ws)
        n_sub = sum(len(final["".join(tuple(w))]) for w in ws)
        assert got[i] == (n_chars, n_sub), (i, got[i], (n_chars, n_sub))


def test_degenerate_corpus_twin_degrades_like_spark(spark, tmp_path):
    """A corpus with no mergeable pairs after round 1 must leave the
    DuckDB encode twin returning every document (LEFT-JOIN empty
    argmax rounds coalesce to the unmerged string), exactly like the
    Spark side applying fewer merges — not zero rows."""
    import duckdb

    texts = ["ab ab", "ab"]  # one merge (a,b); rounds 2+ are empty
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    learned = [
        (r.lhs, r.rhs)
        for r in X.bpe_merges(df, n_merges=4).orderBy("merge_rank").collect()
    ]
    assert len(learned) == 1  # the corpus dries up after (a, b)
    sp = {
        r.doc_id: (r.n_chars_sym, r.n_subwords)
        for r in X.bpe_encode(df, learned).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES (0, 'ab ab'),"
        " (1, 'ab')) t(doc_id, text)"
    )
    du = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute(
            X.bpe_encode_sql_duckdb("documents", n_merges=4)
        ).fetchall()
    }
    assert sp == du == {0: (4, 2), 1: (2, 1)}
