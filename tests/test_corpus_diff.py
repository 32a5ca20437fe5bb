"""corpus_diff: dataset-version audit between two corpus snapshots."""

from tidb_lightning_release_4_0_spark.operators.curation import corpus_diff


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id LONG, text STRING"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (5, "e"), (4, "d")], "doc_id LONG, text STRING"
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",
        5: "added",
    }


def test_corpus_diff_shuffles_hashes_not_text(spark):
    # the exchange must carry (id, hash) longs, never the text column
    old = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    new = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    plan = corpus_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)
