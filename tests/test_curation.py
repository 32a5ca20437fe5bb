"""Unit edge cases for operators/curation.py (the registry oracle
test covers the value-level Spark<->DuckDB equivalence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_lightning_release_4_0_spark.operators import curation as C


def test_connected_components_chain(spark):
    """A 4-node chain needs multiple propagation rounds (label must
    travel the diameter); a separate pair stays its own cluster."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["left_id", "right_id"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in C.connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "left_id long, right_id long")
    assert C.connected_components(pairs).count() == 0


def test_connected_components_up_down_path(spark):
    """Min label must cross a peak: 2-10, 10-1 — node 2 only reaches
    cluster id 1 through the larger node 10."""
    pairs = spark.createDataFrame([(2, 10), (1, 10)], ["left_id", "right_id"])
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in C.connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 10: 1}


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0])], ["vec_id", "embedding"]
    )
    rows = {
        r["vec_id"]: r for r in C.quantize_embeddings(df).collect()
    }
    assert rows[1]["scale"] == 1.0 and rows[1]["qvec"] == "0,0"
    # scale = 2/127; max component quantizes to -127, the other to 64
    assert rows[2]["qvec"] == "64,-127"


def test_pack_sequences_straddle(spark):
    """Docs straddle the budget boundary: seq_id/offset follow the
    running prefix sum, per shard."""
    df = spark.createDataFrame(
        [
            (1, "a " * 300, "s1"),   # 300 tokens -> seq 0 @ 0
            (2, "b " * 300, "s1"),   # starts at 300 -> seq 0 @ 300
            (3, "c " * 10, "s1"),    # starts at 600 -> seq 1 @ 88
            (4, "d " * 5, "s2"),     # other shard resets -> seq 0 @ 0
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["offset"])
        for r in C.pack_sequences(df, budget=512).collect()
    }
    assert out == {1: (0, 0), 2: (0, 300), 3: (1, 88), 4: (0, 0)}


def test_decontaminate_disjoint(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame(
        [(2, "one two three four five six")], ["doc_id", "text"]
    )
    assert C.decontaminate(corpus, bench, k=5).count() == 0


def test_decontaminate_counts_distinct_grams(spark):
    text = "one two three four five six"
    corpus = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, text)], ["doc_id", "text"])
    rows = C.decontaminate(corpus, bench, k=5).collect()
    # 6 tokens -> two 5-grams, both shared
    assert rows == [
        spark.createDataFrame(
            [(1, 2)], ["doc_id", "n_shared_grams"]
        ).collect()[0]
    ] or (rows[0]["doc_id"] == 1 and rows[0]["n_shared_grams"] == 2)


def test_stratified_sample_exact_n(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(40)],
        ["doc_id", "lang"],
    )
    out = C.stratified_sample(df, ["lang"], 5)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"en": 5, "fr": 5}
    # deterministic: same result on a rerun
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"] for r in C.stratified_sample(df, ["lang"], 5).collect()
    )
    assert a == b


def test_connected_components_unconverged_contract(spark):
    """A chain longer than max_iter label rounds must NEVER return
    split clusters: algorithm='label' raises, the default 'auto'
    falls back to large-star/small-star and returns the full
    component (round-4 fallback; tests/test_round4_fixes.py covers
    the star algorithm itself)."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["left_id", "right_id"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        # force the distributed loop (the small-graph fast path
        # needs no rounds at all)
        C.connected_components(
            pairs, max_iter=1, small_graph_threshold=0,
            algorithm="label",
        )
    auto = {
        r["doc_id"]: r["cluster_id"]
        for r in C.connected_components(
            pairs, max_iter=1, small_graph_threshold=0
        ).collect()
    }
    assert set(auto.values()) == {1}, "auto fallback split the chain"
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in C.connected_components(pairs).collect()
    }
    assert set(out.values()) == {1}


def test_connected_components_contract_then_finish(spark):
    """Graph just above the driver threshold: auto must contract with
    star rounds until the edge set fits, then driver-finish with
    union-find — and agree exactly with ground-truth union-find over
    the ORIGINAL edges (three 8-cliques = 84 canonical edges contract
    to 21 star edges in one round, under the threshold of 25; a
    self-pair-only node must come back as its own cluster)."""
    edges = [
        (base + i, base + j)
        for base in (100, 200, 300)
        for i in range(8)
        for j in range(i + 1, 8)
    ]
    edges.append((999, 999))  # self-pair: lonely re-add path
    pairs = spark.createDataFrame(edges, ["left_id", "right_id"])
    want = dict(C.union_find_min([e for e in edges if e[0] != e[1]]))
    want[999] = 999
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in C.connected_components(
            pairs, small_graph_threshold=25
        ).collect()
    }
    assert got == want
    assert set(got.values()) == {100, 200, 300, 999}


def test_connected_components_hash_scale_ids(spark):
    """60-bit hash ids: the convergence aggregate must not overflow
    int64 (decimal sum)."""
    big = 1 << 59
    pairs = spark.createDataFrame(
        [(big + 1, big + 2), (big + 2, big + 3)] * 1,
        ["left_id", "right_id"],
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in C.connected_components(pairs).collect()
    }
    assert set(out.values()) == {big + 1}


def test_quantize_error_bound(spark):
    """Scalar quantization invariant: |x - q*scale| <= scale/2."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-10, 10) for _ in range(8)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in C.quantize_embeddings(df).collect()}
    for vid, vec in rows:
        r = out[vid]
        q = [int(x) for x in r["qvec"].split(",")]
        for x, qi in zip(vec, q):
            assert abs(x - qi * r["scale"]) <= r["scale"] / 2 + 1e-6


def test_pack_offsets_within_budget(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, "w " * rng.randint(1, 700), f"s{i % 3}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    for r in C.pack_sequences(df, budget=256).collect():
        assert 0 <= r["offset"] < 256
        assert r["seq_id"] * 256 + r["offset"] >= 0


def test_connected_components_fast_path_matches_loop(spark):
    """The driver union-find fast path and the distributed
    label-propagation loop agree on a graph with chains, merged
    clusters, and singleton-free edges."""
    edges = (
        [(i, i + 1) for i in range(1, 6)]        # chain 1..6
        + [(10, 12), (12, 14), (14, 10)]         # cycle
        + [(30, 20)]                             # reversed order pair
    )
    pairs = spark.createDataFrame(edges, ["left_id", "right_id"])
    fast = {
        (r["doc_id"], r["cluster_id"])
        for r in C.connected_components(pairs).collect()
    }
    loop = {
        (r["doc_id"], r["cluster_id"])
        for r in C.connected_components(
            pairs, small_graph_threshold=0
        ).collect()
    }
    assert fast == loop
    assert {c for _, c in fast} == {1, 10, 20}


def test_export_jsonl_roundtrip(spark, tables, tmp_path):
    """Sharded JSONL export: exact shard count, gzip codec, and a
    lossless round-trip through spark.read.json."""
    from tidb_lightning_release_4_0_spark.operators.curation import (
        export_jsonl,
    )

    docs = tables["documents"].select("doc_id", "lang", "text")
    out = str(tmp_path / "jsonl")
    n = export_jsonl(docs, out, shards=3, compression="gzip")
    assert n == 3
    import os

    assert all(
        f.endswith(".gz") for f in os.listdir(out) if f.startswith("part-")
    )
    back = spark.read.json(out)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_hll_estimate_accuracy(spark, sf_dir, tables):
    """The deterministic HLL estimate lands within the expected
    ~1.04/sqrt(256) ≈ 6.5% relative error band (3-sigma ≈ 20%)."""
    from tidb_lightning_release_4_0_spark.operators.sketches import (
        approx_distinct_hll,
    )

    li = tables["lineitem"]
    true = li.select("l_partkey").distinct().count()
    est = approx_distinct_hll(li, "l_partkey").first()["est_distinct"]
    assert abs(est - true) / true < 0.20, (est, true)


def test_sketch_golden_values(spark):
    """Pinned sketch outputs at sf0.001 — any semantic drift in the
    hash, register accounting, estimate arithmetic, or interpolation
    changes these exact values."""
    import __spark_entry__ as e

    import os
    import pytest as _pytest

    qs = e.queries()
    sf = "/root/testdata/sf0.001"  # the pinned values ARE sf0.001's
    if not os.path.isdir(sf):
        _pytest.skip("sf0.001 testdata not present on this machine")
    r = qs["hll_distinct_parts"](spark, sf).first()
    assert (
        r["nonzero_buckets"], r["zero_buckets"], r["est_distinct"]
    ) == (139, 117, 200.45)  # true distinct = 200 (LinearCounting)
    cms = sorted(
        (x["term"], x["est_count"])
        for x in qs["cms_term_counts"](spark, sf).collect()
    )
    assert cms == [
        ("batch", 910), ("hash", 923), ("join", 936),
        ("scan", 984), ("zzznotaterm", 0),
    ]
    hist = [
        (x["prob"], x["est"])
        for x in qs["hist_quantiles_price"](spark, sf).collect()
    ]
    assert hist == [
        (0.5, 52743.341), (0.95, 99634.4897), (0.99, 103884.5123),
    ]
