"""Prefix-filtered exact Jaccard similarity join (Bayardo et al. 2007).

The selling point over MinHash-LSH is NO false negatives — so the
test that matters is completeness against an all-pairs brute force on
a corpus with pairs straddling the threshold, plus the integer
threshold arithmetic at exact-boundary pairs (J == t must be kept on
both engines with no float wobble).
"""

from tidb_lightning_release_4_0_spark.operators import dedup as D


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, num, den):
    sets = [
        {w for w in t.lower().strip().split() if w} for t in texts
    ]
    out = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            if not sets[i] and not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            uni = len(sets[i] | sets[j])
            if den * inter >= num * uni:
                out[(i, j)] = round(inter / uni, 4)
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog",      # 0
    "the quick brown fox jumps over the lazy cat",      # 1: J=7/9 vs 0
    "a completely different sentence about spark",       # 2
    "a completely different sentence about duckdb",      # 3: J=5/7 vs 2
    "one two three four",                                # 4
    "one two five six",                                  # 5: J=2/6=1/3 vs 4
    "alpha beta gamma delta",                            # 6
    "alpha beta gamma delta",                            # 7: J=1 vs 6
    "alpha beta epsilon zeta",                           # 8: J=2/6 vs 6,7
    "unrelated singleton text here",                     # 9
]


def test_matches_brute_force(spark):
    got = {
        (r.left_id, r.right_id): r.jaccard
        for r in D.jaccard_join_prefix(_docs(spark, TEXTS)).collect()
    }
    assert got == _brute(TEXTS, 1, 2)


def test_exact_boundary_pair_is_kept(spark):
    # J exactly == 1/2: sets {a,b,c,d} and {a,b,c,e,f,g}? inter=3,
    # union=7 -> 3/7 < 1/2. Use {a,b,c,d} vs {a,b,c,d,e,f,g,h}:
    # inter=4, union=8 -> exactly 1/2; integer compare keeps it.
    texts = ["a b c d", "a b c d e f g h"]
    rows = D.jaccard_join_prefix(_docs(spark, texts)).collect()
    assert [(r.left_id, r.right_id, r.jaccard) for r in rows] == [
        (0, 1, 0.5)
    ]


def test_just_below_boundary_is_dropped(spark):
    # inter=4, union=9 -> 4/9 < 1/2
    texts = ["a b c d", "a b c d e f g h i"]
    assert D.jaccard_join_prefix(_docs(spark, texts)).count() == 0


def test_higher_threshold(spark):
    # num/den = 4/5: only the identical pair survives from TEXTS
    got = {
        (r.left_id, r.right_id)
        for r in D.jaccard_join_prefix(
            _docs(spark, TEXTS), num=4, den=5
        ).collect()
    }
    assert got == set(_brute(TEXTS, 4, 5)) == {(6, 7)}


def test_empty_and_whitespace_docs(spark):
    texts = ["", "   ", "a b", "a b"]
    got = {
        (r.left_id, r.right_id)
        for r in D.jaccard_join_prefix(_docs(spark, texts)).collect()
    }
    assert got == {(2, 3)}


def test_random_corpus_matches_brute_force(spark):
    # Seeded random corpus: skewed vocabulary (Zipf-ish), duplicate
    # docs, singleton tokens, repeated tokens inside one doc — the
    # prefix filter must stay complete on all of them.
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(30):
        n = rng.randint(1, 12)
        words = [
            vocab[min(int(rng.expovariate(0.08)), 59)] for _ in range(n)
        ]
        texts.append(" ".join(words))
    texts[7] = texts[3]           # exact duplicate pair
    texts[21] = texts[20] + " w0" # high-overlap pair
    for num, den in ((1, 2), (1, 3), (3, 4)):
        got = {
            (r.left_id, r.right_id): r.jaccard
            for r in D.jaccard_join_prefix(
                _docs(spark, texts), num=num, den=den
            ).collect()
        }
        assert got == _brute(texts, num, den), (num, den)
