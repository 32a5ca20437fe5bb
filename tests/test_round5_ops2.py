"""Semantic unit tests for the second batch of round-5 operators:
DSIR selection, C4 line cleaning, SimHash hamming dedup, bigram LM.

The registry oracle suite proves engine parity; these tests pin the
SEMANTICS (planted duplicates are found, target docs score high,
cleaning rules fire) and the plan shapes (zero-shuffle where the
operator promises it).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import tidb_lightning_release_4_0_spark.operators.curation as CU
import tidb_lightning_release_4_0_spark.operators.dedup as D
import tidb_lightning_release_4_0_spark.operators.text as X


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def test_dsir_ranks_target_like_docs_first(spark):
    """Docs written in the target domain's vocabulary must outscore
    docs written in a disjoint vocabulary."""
    rows = [(i, "alpha beta gamma delta alpha beta") for i in range(5)]
    rows += [(10 + i, "omega sigma tau rho omega sigma") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.filter(F.col("doc_id") < 5)
    top = CU.dsir_select(df, target, 5, n_buckets=64).collect()
    assert {r.doc_id for r in top} == {0, 1, 2, 3, 4}
    assert all(r.weight > 0 for r in top)


def test_dsir_empty_doc_weight_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "")], "doc_id long, text string"
    )
    w = {r.doc_id: r.weight for r in CU.dsir_weights(
        df, df.filter("doc_id = 1"), n_buckets=16).collect()}
    assert w[2] == 0.0
    assert len(w) == 2  # empty doc still present


# ---------------------------------------------------------------------------
# C4 line filter
# ---------------------------------------------------------------------------


def test_c4_rules_fire(spark):
    text = "\n".join([
        "This line ends with a period.",   # kept
        "short.",                          # < 3 words -> dropped
        "no terminal punctuation here",    # dropped
        "This one has javascript inside.", # line blacklist -> dropped
        'A quoted line ends well."',       # kept
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = CU.c4_line_filter(df, min_words=3, min_kept_lines=2).collect()[0]
    assert (r.n_kept, r.n_dropped, r.keep) == (2, 3, True)
    assert r.text_clean.splitlines() == [
        "This line ends with a period.",
        'A quoted line ends well."',
    ]


def test_c4_doc_blacklist_and_min_lines(spark):
    good = "One good line here.\nAnother good line here."
    df = spark.createDataFrame(
        [
            (1, good + "\nLorem Ipsum dolor sit amet."),  # doc blacklist
            (2, "Only one good line here."),              # < min lines
            (3, good),
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in CU.c4_line_filter(
        df, min_words=3, min_kept_lines=2).collect()}
    assert not r[1].keep and r[1].text_clean == ""
    assert not r[2].keep
    assert r[3].keep and r[3].n_kept == 2


def test_c4_line_filter_zero_shuffle(spark, sf_dir):
    import tidb_lightning_release_4_0_spark.registry as R

    plan = R.q_c4_line_filter_docs(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# SimHash hamming dedup
# ---------------------------------------------------------------------------


def test_simhash_pairs_find_planted_near_dup(spark):
    """An exact copy (hamming 0) and a light edit must pair with the
    original; an unrelated-vocabulary doc must not."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    edited = base.replace("kappa", "kappax")
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, edited), (4, other)],
        "doc_id long, text string",
    )
    pairs = {
        (r.left_id, r.right_id): r.hamming
        for r in D.simhash_dup_pairs(df, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 4) not in pairs and (2, 4) not in pairs
    if (1, 3) in pairs:  # one-token edit usually flips <= 3 bits
        assert pairs[(1, 3)] <= 3


def test_simhash_pairs_pigeonhole_guard(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        D.simhash_dup_pairs(df, max_hamming=4, n_bands=4)
    with pytest.raises(ValueError):
        D.simhash_dup_pairs(df, n_bands=7)  # 7 does not divide 60


def test_simhash_default_config_scale_safe():
    """Pin the shipped defaults to the measured-healthy combination
    banding (docs/SCALE.md finding 4: one-block 32-bit/4-band = 2^8
    key space saturates at 64x; the 60/6/hamming-3 default yields
    C(6,3)=20 combination keys of 30 bits — 2^30 key space)."""
    import inspect

    sig = inspect.signature(D.simhash_dup_pairs)
    bits = sig.parameters["bits"].default
    n_bands = sig.parameters["n_bands"].default
    mh = sig.parameters["max_hamming"].default
    assert (bits, n_bands, mh) == (60, 6, 3)
    combos = D._simhash_block_combos(bits, n_bands, mh)
    assert len(combos) == 20  # C(6, 3)
    key_bits = (n_bands - mh) * (bits // n_bands)
    assert key_bits == 30  # 2^30 key space >> any per-shard corpus
    # the DuckDB twin must ride the same defaults
    dsig = inspect.signature(D.simhash_dup_pairs_sql_duckdb)
    assert dsig.parameters["bits"].default == 60
    assert dsig.parameters["n_bands"].default == 6
    # hot-bucket cap (r11): present, positive, and in lockstep
    assert sig.parameters["max_bucket"].default == 256
    assert dsig.parameters["max_bucket"].default == 256
    assert inspect.signature(D.simhash).parameters["bits"].default == 60
    assert (
        inspect.signature(D.simhash_sql_duckdb).parameters["bits"].default
        == 60
    )


def test_simhash_pairs_no_cartesian(spark, sf_dir):
    import tidb_lightning_release_4_0_spark.registry as R

    plan = R.q_simhash_pairs(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Bigram LM
# ---------------------------------------------------------------------------


def test_bigram_lm_orders_fluency(spark):
    """A doc of corpus-frequent bigrams must score lower (more
    likely) than a doc whose bigrams never co-occur elsewhere."""
    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(5)]
    rows.append((10, "mat the on sat cat the"))  # same unigrams, shuffled
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = {r.doc_id: r.lm2_score for r in X.bigram_lm_score(df).collect()}
    assert s[0] < s[10]


def test_bigram_lm_short_docs_omitted(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello world")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in X.bigram_lm_score(df).collect()}
    assert 1 not in rows  # no bigrams
    assert rows[2].n_bigrams == 1


def test_simhash_banding_completeness(spark):
    """The pigeonhole banding must find EXACTLY the brute-force
    hamming-ball pairs — banding is a no-loss candidate generator,
    not an approximation. Verified against an all-pairs python
    check over the collected signatures."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(5, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id", D.simhash(F.col("text")).alias("sig")
        ).collect()
    }
    for mh, nb in ((1, 2), (3, 4), (3, 6)):
        expect = {
            (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
            for a in sigs
            for b in sigs
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= mh
        }
        got = {
            tuple(r)
            for r in D.simhash_dup_pairs(
                df, max_hamming=mh, n_bands=nb
            ).collect()
        }
        assert got == expect, (mh, nb, len(got), len(expect))


# ---------------------------------------------------------------------------
# Boilerplate line removal
# ---------------------------------------------------------------------------


def test_boilerplate_lines_dropped_globally(spark):
    """A footer repeating in 3 of 4 docs (max_df=2) is dropped from
    every doc; unique lines survive in original order; a doc that is
    ALL boilerplate stays present with empty text."""
    footer = "(c) example corp - all rights reserved"
    df = spark.createDataFrame(
        [
            (1, f"unique one\n{footer}\nunique two"),
            (2, f"{footer}\nonly here"),
            (3, f"something else\n{footer}"),
            (4, footer),
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in CU.strip_boilerplate_lines(
        df, max_df=2).collect()}
    assert r[1].text_clean == "unique one\nunique two"
    assert (r[1].n_lines, r[1].n_kept) == (3, 2)
    assert r[2].text_clean == "only here"
    assert r[4].text_clean == "" and r[4].n_kept == 0


def test_boilerplate_keeps_below_threshold(spark):
    """A line in exactly max_df docs survives (strictly-greater
    rule)."""
    df = spark.createDataFrame(
        [(1, "shared line"), (2, "shared line"), (3, "lonely line")],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in CU.strip_boilerplate_lines(
        df, max_df=2).collect()}
    assert r[1].text_clean == "shared line"
    assert r[3].text_clean == "lonely line"


# ---------------------------------------------------------------------------
# Character entropy
# ---------------------------------------------------------------------------


def test_char_entropy_known_values(spark):
    """Hand-checkable distributions: single repeated char -> 0 bits;
    'ab' -> 1 bit; four equally frequent chars -> 2 bits."""
    df = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abababab"), (3, "abcdabcd"), (4, "")],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in X.char_entropy(df).collect()}
    assert r[1].entropy == 0.0
    assert r[2].entropy == 1.0
    assert r[3].entropy == 2.0
    assert r[4].entropy == 0.0 and r[4].n_chars == 0


def test_char_entropy_zero_shuffle(spark, sf_dir):
    import tidb_lightning_release_4_0_spark.registry as R

    plan = R.q_char_entropy_docs(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_simhash_hot_bucket_cap(spark):
    """Boilerplate-heavy corpus: a clique of identical docs larger
    than max_bucket floods every combo bucket and must be DROPPED
    (no quadratic pair blowup), while an unrelated planted near-dup
    pair in a cold bucket still pairs. max_bucket=None restores the
    uncapped quadratic behavior. The DuckDB twin mirrors both."""
    import duckdb

    boiler = "terms of service apply all rights reserved contact us"
    uniq = "quick brown foxes jump over seventeen lazy dogs today"
    rows = [(i, boiler) for i in range(40)]
    rows += [(100, uniq), (101, uniq)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r.left_id, r.right_id)
        for r in D.simhash_dup_pairs(
            df, max_hamming=1, n_bands=2, max_bucket=20
        ).collect()
    }
    assert capped == {(100, 101)}, capped

    uncapped = D.simhash_dup_pairs(
        df, max_hamming=1, n_bands=2, max_bucket=None
    ).count()
    assert uncapped == 40 * 39 // 2 + 1

    con = duckdb.connect()
    con.register(
        "docs_py",
        __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]),
    )
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_py")
    got = con.execute(
        D.simhash_dup_pairs_sql_duckdb(
            "documents", max_hamming=1, n_bands=2, max_bucket=20
        )
    ).fetchall()
    assert {(a, b) for a, b, _ in got} == {(100, 101)}, got
    n = con.execute(
        "SELECT count(*) FROM (" + D.simhash_dup_pairs_sql_duckdb(
            "documents", max_hamming=1, n_bands=2, max_bucket=None
        ) + ")"
    ).fetchone()[0]
    assert n == 40 * 39 // 2 + 1


def test_simhash_pair_emitted_once_no_distinct(spark):
    """Every pair must appear EXACTLY once (minimal-agreeing-combo
    emission replaces .distinct()): exact dups agree on every combo
    table, so duplicate emission would show up here."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(i, base) for i in range(6)], "doc_id long, text string"
    )
    rows = D.simhash_dup_pairs(df, max_hamming=3, n_bands=6).collect()
    pairs = [(r.left_id, r.right_id) for r in rows]
    assert len(pairs) == len(set(pairs)) == 15
    assert all(r.hamming == 0 for r in rows)
