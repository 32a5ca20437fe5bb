"""Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003).

Pins the algorithm's defining properties — the substring-match
guarantee, the rightmost-min tie rule, the selection density, and the
skew cap on the candidate-pair join — on hand-built corpora where the
expected answer is computable by eye (or by a tiny brute-force
mirror). Engine-vs-DuckDB equivalence is covered separately by
test_registry_oracle.py on the synthetic documents table.
"""

import pytest

from tidb_lightning_release_4_0_spark.operators import text as X

K, W = 4, 5


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _fps(spark, texts, k=K, w=W):
    df = X.winnow_fingerprints(_docs(spark, texts), k=k, w=w)
    return {(r.doc_id, r.pos, r.fph) for r in df.collect()}


def _brute_winnow(norm, k, w):
    """Literal transcription of the paper's definition: every window
    of w consecutive k-gram hashes selects its minimum, rightmost on
    tie."""
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    hashes = [h60(norm[i : i + k]) for i in range(len(norm) - k + 1)]
    sel = set()
    for s in range(len(hashes) - w + 1):
        window = hashes[s : s + w]
        m = min(window)
        # rightmost index attaining the min
        p = s + max(i for i, v in enumerate(window) if v == m)
        sel.add((p, hashes[p]))
    return sel


def test_matches_brute_force_definition(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "abcabcabcabcabcabcabc",
        "aaaaaaaaaaaaaaaa",
        "pack my box with five dozen liquor jugs",
    ]
    got = _fps(spark, texts)
    want = set()
    for i, t in enumerate(texts):
        norm = "".join(c for c in t.lower() if c.isalnum())
        want |= {(i, p, h) for (p, h) in _brute_winnow(norm, K, W)}
    assert got == want


def test_substring_match_guarantee(spark):
    # Any common substring of length >= w + k - 1 must yield at least
    # one shared fingerprint (the winnowing guarantee, §4 of the
    # paper). The shared run here is much longer than w + k - 1 = 8.
    shared = "zqxjkwvbnmplfhtg"  # 16 chars, no other overlap
    texts = ["000111222" + shared, shared + "888999777666"]
    fps = _fps(spark, texts)
    h0 = {h for (d, p, h) in fps if d == 0}
    h1 = {h for (d, p, h) in fps if d == 1}
    assert h0 & h1, "documents sharing a long substring share no fingerprint"


def test_rightmost_tie_rule(spark):
    # All-identical characters -> every k-gram hash is equal, so each
    # window selects its RIGHTMOST position: the distinct selected
    # set is exactly {w-1, ..., n_grams-1}.
    n = 20
    fps = _fps(spark, ["a" * n])
    n_grams = n - K + 1
    assert {p for (_, p, _) in fps} == set(range(W - 1, n_grams))


def test_density_and_coverage(spark):
    # Random-ish text: expected density 2/(w+1); assert the selected
    # count is well under the gram count, and every full window
    # contains at least one selected position (coverage).
    import random

    rng = random.Random(7)
    t = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(400))
    fps = _fps(spark, [t])
    n_grams = len(t) - K + 1
    positions = sorted(p for (_, p, _) in fps)
    assert len(positions) < n_grams / 2
    for s in range(n_grams - W + 1):
        assert any(s <= p <= s + W - 1 for p in positions), s


def test_short_and_empty_docs_yield_no_rows(spark):
    assert _fps(spark, ["abc", "", "  ", "ab1"]) == set()


def test_candidate_pairs_and_skew_cap(spark):
    # Docs 0 and 1 are near-duplicates (long shared run -> many shared
    # fingerprints). Docs 2..9 all share one ubiquitous boilerplate
    # gram; with max_bucket below that bucket's size the boilerplate
    # hash is dropped before the pair join, so no pair among 2..9
    # survives.
    dup = "thequickbrownfoxjumpsoverthelazydogandrunsaway"
    boiler = "commonfooterxyz"
    texts = [dup + "aaa", "bbb" + dup] + [
        boiler + f"unique{i}distinct{i}text{i}" for i in range(8)
    ]
    pairs = X.winnow_candidate_pairs(
        _docs(spark, texts), k=K, w=W, min_shared=3, max_bucket=4
    ).collect()
    got = {(r.left_id, r.right_id) for r in pairs}
    assert (0, 1) in got
    assert not [p for p in got if p[0] >= 2], got
