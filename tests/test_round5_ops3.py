"""Semantic unit tests for the session-6 operators: integer-exact
event anomaly days and Unicode NFC normalization.

The registry oracle suite proves engine parity at sf0.01; these pin
the SEMANTICS: bursts are flagged, flat activity is not, the z-test
degrades cleanly at sigma=0 and n=1, and NFC composes decomposed
sequences byte-for-byte.
"""

from __future__ import annotations

from datetime import datetime

import tidb_lightning_release_4_0_spark.operators.temporal as TP
import tidb_lightning_release_4_0_spark.operators.text as X


def _events(spark, day_counts, user_id=1):
    """day_counts[i] events on 2024-01-(i+1) for one user."""
    rows = []
    eid = 0
    for i, cnt in enumerate(day_counts):
        for j in range(cnt):
            rows.append(
                (eid, datetime(2024, 1, i + 1, 8, j % 60), user_id)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


def test_burst_day_is_flagged(spark):
    # ten flat days then a 10x burst: z = (50-9.09)/12.8 ~ 3.2 > 2
    df = _events(spark, [5] * 10 + [50])
    out = TP.anomaly_days(df).collect()
    assert [(r.event_date, r.n_events) for r in out] == [
        ("2024-01-11", 50)
    ]


def test_flat_activity_not_flagged(spark):
    # identical days: sigma = 0 and every deviation is 0 — the
    # integer test ((n*cnt-S) > 0) rejects without any division
    df = _events(spark, [5, 5, 5, 5])
    assert TP.anomaly_days(df).count() == 0


def test_mild_variation_not_flagged(spark):
    # 9 events vs mean 6, sigma ~1.73: z ~1.73 < 2
    df = _events(spark, [5, 5, 5, 9])
    assert TP.anomaly_days(df).count() == 0


def test_single_day_user_never_flagged(spark):
    df = _events(spark, [100])
    assert TP.anomaly_days(df).count() == 0


def test_users_are_independent(spark):
    flat = _events(spark, [5] * 10, user_id=1)
    bursty = _events(spark, [5] * 10 + [50], user_id=2)
    out = TP.anomaly_days(flat.union(bursty)).collect()
    assert [(r.user_id, r.n_events) for r in out] == [(2, 50)]


def test_nfc_composes_and_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "cafe\u0301"),  # e + combining acute (decomposed)
            (2, "caf\u00e9"),   # precomposed
            (3, "plain ascii"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in X.normalize_nfc(df).collect()}
    assert out[1].text_nfc == "caf\u00e9" and out[1].changed is True
    assert out[2].text_nfc == "caf\u00e9" and out[2].changed is False
    assert out[3].text_nfc == "plain ascii" and out[3].changed is False


def test_nfc_idempotent_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, "a\u0300 la carte"), (2, None)],
        "doc_id long, text string",
    )
    once = X.normalize_nfc(df)
    twice = X.normalize_nfc(
        once.select("doc_id", once.text_nfc.alias("text"))
    ).collect()
    again = {r.doc_id: r for r in twice}
    assert again[1].changed is False  # already composed
    assert again[2].text_nfc is None and again[2].changed is None


def test_triangle_counts_match_brute_force(spark):
    """Degree-ordered counting equals the itertools brute force on a
    seeded random graph (fixed seed — determinism of the test, not
    the operator, which is input-deterministic)."""
    import itertools
    import random

    import tidb_lightning_release_4_0_spark.operators.curation as CU

    rng = random.Random(42)
    nodes = list(range(24))
    edges = sorted(
        {
            (a, b)
            for a in nodes
            for b in nodes
            if a < b and rng.random() < 0.25
        }
    )
    adj = {n: set() for n in nodes}
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    expected = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    df = spark.createDataFrame(edges, "left_id long, right_id long")
    got = {
        r.node: r.n_triangles for r in CU.triangle_counts(df).collect()
    }
    assert got == expected and expected  # non-degenerate graph


def test_triangle_counts_dedupes_and_canonicalizes_edges(spark):
    # duplicate edges, reversed edges and self-loops must not change
    # the single triangle {1,2,3}
    import tidb_lightning_release_4_0_spark.operators.curation as CU

    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1), (3, 4)],
        "left_id long, right_id long",
    )
    got = {
        r.node: r.n_triangles for r in CU.triangle_counts(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_zipf_alpha_recovers_planted_exponent(spark):
    """A corpus drawn EXACTLY as freq(rank) = round(C * rank^-1)
    must fit alpha ~ 1."""
    import tidb_lightning_release_4_0_spark.operators.text as X

    words = []
    for rank in range(1, 101):
        w = "w" + "".join(chr(ord("a") + int(d)) for d in f"{rank:03d}")
        words.extend([w] * max(round(1000 / rank), 1))
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    row = X.zipf_alpha(df, top_k=100).collect()[0]
    assert row.n_terms == 100
    assert abs(row.alpha - 1.0) < 0.05, row.alpha


def test_zipf_alpha_flat_corpus_near_zero(spark):
    # every term equally frequent -> slope ~ 0
    import tidb_lightning_release_4_0_spark.operators.text as X

    text = (
        " ".join(
            "t" + chr(ord("a") + i // 26) + chr(ord("a") + i % 26)
            for i in range(50)
        )
        + " "
    ) * 4
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = X.zipf_alpha(df, top_k=50).collect()[0]
    assert abs(row.alpha) < 1e-9, row.alpha


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    import tidb_lightning_release_4_0_spark.operators.similarity as S

    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 5)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.i, r.j): r.cov
        for r in S.embedding_covariance(df, dim=5).collect()
    }
    # reference on the same 6-decimal-rounded inputs (population cov)
    Xr = np.round(X.astype(np.float64), 6)
    C = np.cov(Xr, rowvar=False, bias=True)
    assert len(got) == 15
    for i in range(5):
        for j in range(i, 5):
            assert abs(got[(i, j)] - C[i, j]) < 2e-6, (i, j)


def test_embedding_covariance_skips_malformed_vectors(spark):
    import tidb_lightning_release_4_0_spark.operators.similarity as S

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 5.0]), (3, [1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.i, r.j): r.cov
        for r in S.embedding_covariance(df, dim=2).collect()
    }
    # population cov of [(1,2),(3,5)]: var x = 1, var y = 2.25, cov = 1.5
    assert got == {(0, 0): 1.0, (0, 1): 1.5, (1, 1): 2.25}


def test_pca_projected_variance_equals_top_eigenvalues(spark):
    import numpy as np

    import tidb_lightning_release_4_0_spark.operators.similarity as S

    rng = np.random.default_rng(11)
    # anisotropic cloud: variance concentrated along two directions
    base = rng.normal(size=(120, 4))
    base[:, 0] *= 5.0
    base[:, 1] *= 2.0
    X = base.astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    out = S.pca_project(df, dim=4, k=2).collect()
    P = np.array([[r.pc1, r.pc2] for r in sorted(out, key=lambda r: r.vec_id)])
    Xd = X.astype(np.float64)
    C = np.cov(np.round(Xd, 6), rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(C))[::-1]
    got_var = P.var(axis=0)  # population variance of the projections
    assert abs(got_var[0] - evals[0]) < 1e-2 * evals[0]
    assert abs(got_var[1] - evals[1]) < 1e-2 * max(evals[1], 1e-9)
    # components are uncorrelated
    assert abs(np.corrcoef(P[:, 0], P[:, 1])[0, 1]) < 0.05


def test_stratified_sample_hash_flag_delegates(spark):
    import tidb_lightning_release_4_0_spark.operators.curation as CU

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(200)],
        "doc_id long, src string",
    )
    via_flag = CU.stratified_sample(
        df, ["src"], 10, method="hash"
    ).collect()
    direct = CU.stratified_sample_hash(df, ["src"], 10).collect()
    assert sorted(r.doc_id for r in via_flag) == sorted(
        r.doc_id for r in direct
    )
    import pytest

    with pytest.raises(ValueError):
        CU.stratified_sample(df, ["src"], 10, method="bogus")


def test_rrf_fuse_hand_computed(spark):
    import tidb_lightning_release_4_0_spark.operators.similarity as S

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "doc_id long, rank int"
    )
    out = {
        r.doc_id: (r.rrf_score, r.n_rankers)
        for r in S.rrf_fuse([a, b], k0=60, k=10).collect()
    }
    # doc 20: 1/62 + 1/61; doc 10: 1/61 + 1/62 (tie!); 30: 1/63; 40: 1/63
    assert out[10] == out[20]
    assert round(out[10][0], 9) == round(
        round(1 / 61, 9) + round(1 / 62, 9), 9
    )
    assert out[10][1] == 2 and out[30][1] == 1
    assert out[30][0] == out[40][0] == round(1 / 63, 9)
    # deterministic order under ties: top-k keeps both tied docs
    assert set(out) == {10, 20, 30, 40}


def test_market_basket_hand_computed(spark):
    import tidb_lightning_release_4_0_spark.operators.curation as CU

    # baskets: {1,2,3}, {1,2}, {1,2}, {3} -> pair (1,2) in 3 baskets
    rows = [
        (100, 1), (100, 2), (100, 3),
        (101, 1), (101, 2),
        (102, 1), (102, 2), (102, 2),  # duplicate item dedupes
        (103, 3),
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {
        (r.item_a, r.item_b): r
        for r in CU.market_basket_pairs(df, min_support=2).collect()
    }
    r = out[(1, 2)]
    # n_a = n_b = 3 baskets, n_ab = 3, N = 4
    assert r.n_ab == 3
    assert r.conf_a_to_b == 1.0 and r.conf_b_to_a == 1.0
    assert abs(r.lift - (3 * 4) / (3 * 3)) < 1e-6  # lift rounds to 6
    assert (1, 3) not in out  # support 1 < min_support


def test_market_basket_cap_drops_mega_basket(spark):
    import tidb_lightning_release_4_0_spark.operators.curation as CU

    rows = [(1, i) for i in range(10)] + [(2, 0), (2, 1), (3, 0), (3, 1)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = CU.market_basket_pairs(
        df, min_support=2, max_basket=5
    ).collect()
    # basket 1 (10 items) is dropped; only (0,1) from baskets 2 and 3
    assert [(r.item_a, r.item_b, r.n_ab) for r in out] == [(0, 1, 2)]


def test_readability_hand_computed(spark):
    # "The cat sat. It ran!" -> 2 sentences, 5 words, 5 syllables
    # (each word one vowel group) -> 206.835 - 1.015*2.5 - 84.6*1.0
    df = spark.createDataFrame(
        [(1, "The cat sat. It ran!"), (2, "..."), (3, "Obvious example.")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in X.readability(df).collect()}
    r = out[1]
    assert (r.n_sentences, r.n_words, r.n_syllables) == (2, 5, 5)
    assert abs(r.flesch - (206.835 - 1.015 * 2.5 - 84.6 * 1.0)) < 1e-4
    assert 2 not in out  # zero words -> omitted
    # "obvious" vowel groups: 'o', 'iou' = 2; "example": 'e', 'a',
    # 'e' = 3 -> 5 syllables total
    r3 = out[3]
    assert (r3.n_sentences, r3.n_words, r3.n_syllables) == (1, 2, 5)


def test_clustering_coefficient_hand_computed(spark):
    import tidb_lightning_release_4_0_spark.operators.curation as CU

    # triangle {1,2,3} plus pendant 4 attached to 3
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)],
        "left_id long, right_id long",
    )
    got = {
        r.node: (r.degree, r.n_triangles, r.cc)
        for r in CU.clustering_coefficient(df).collect()
    }
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    # node 3: degree 3, 1 triangle -> 2*1/(3*2) = 1/3
    assert got[3][0] == 3 and abs(got[3][2] - 1 / 3) < 1e-6
    assert got[4] == (1, 0, 0.0)  # degree-1 convention


def test_benford_profile_natural_vs_uniform(spark):
    import tidb_lightning_release_4_0_spark.operators.sketches as SK

    # exponential growth (1.07^k) follows Benford closely
    vals = [(i, 1.07 ** i) for i in range(400)]
    df = spark.createDataFrame(vals, "i long, v double")
    prof = {r.digit: r for r in SK.benford_profile(df, "v").collect()}
    assert set(prof) == set(range(1, 10))
    assert sum(r.n_obs for r in prof.values()) == 400
    # digit 1 ~ 30.1%, monotone decreasing overall
    assert abs(prof[1].obs_frac - 0.301) < 0.05
    assert prof[1].n_obs > prof[9].n_obs
    assert prof[1].abs_dev < 0.05
    # non-positive values are excluded
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, 123.0)], "i long, v double"
    )
    prof2 = SK.benford_profile(df2, "v").collect()
    assert len(prof2) == 1 and prof2[0].digit == 1 and prof2[0].n_obs == 1


def test_fuzzy_match_hand_computed(spark):
    import tidb_lightning_release_4_0_spark.operators.dedup as D

    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "ted widget"),   # dist 1
            (3, "maroon widget"),  # dist 5 from red, 6 from ted
            (4, "red bolt"),     # different block
        ],
        "p_partkey long, p_name string",
    )
    out = {
        (r.id_a, r.id_b): r.edit_dist
        for r in D.fuzzy_match_pairs(
            df, "p_name", "p_partkey", max_dist=3
        ).collect()
    }
    assert out == {(1, 2): 1}  # (1,3) too far; (x,4) other block


def test_mutual_information_extremes(spark):
    import math

    import tidb_lightning_release_4_0_spark.operators.sketches as SK
    from pyspark.sql import functions as F

    # perfectly dependent: y == x over 2 uniform levels -> MI = ln 2
    rows = [(i, i % 2, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "i long, x int, y int")
    r = SK.mutual_information(df, F.col("x"), F.col("y")).collect()[0]
    assert r.n_rows == 40 and r.n_cells == 2
    assert abs(r.mi_nats - math.log(2)) < 1e-6
    # independent: y uniform regardless of x -> MI = 0
    rows2 = [(i, i % 2, (i // 2) % 2) for i in range(40)]
    df2 = spark.createDataFrame(rows2, "i long, x int, y int")
    r2 = SK.mutual_information(df2, F.col("x"), F.col("y")).collect()[0]
    assert abs(r2.mi_nats) < 1e-9
    # nulls count as their own level (no silent row drops)
    rows3 = [(1, None, 1), (2, None, 1), (3, 1, 2), (4, 1, 2)]
    df3 = spark.createDataFrame(rows3, "i long, x int, y int")
    r3 = SK.mutual_information(df3, F.col("x"), F.col("y")).collect()[0]
    assert r3.n_rows == 4 and abs(r3.mi_nats - math.log(2)) < 1e-6


def test_benford_profile_tiny_positive_value_excluded(spark):
    """A positive value below the DECIMAL(38,4) quantum renders as
    '0.0000': the leading-digit extract is empty and must become a
    null (dropped row), not an ANSI cast crash — matching the DuckDB
    twin, which filters such rows."""
    import tidb_lightning_release_4_0_spark.operators.sketches as SK

    df = spark.createDataFrame(
        [(1, 0.00001), (2, 123.4), (3, -5.0), (4, None)],
        "i long, v double",
    )
    prof = {r.digit: r.n_obs for r in SK.benford_profile(df, "v").collect()}
    assert prof == {1: 1}  # only 123.4 survives
