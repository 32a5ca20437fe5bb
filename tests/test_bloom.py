"""Bloom filter build/probe (operators/sketches.py bloom_*): the
beyond-reference semi-join-prune sketch. Oracle equality for the
registry entry is covered by tests/test_registry_oracle.py; here the
semantic contract (no false negatives, bounded false positives) and
the scale contract (zero-shuffle probe) are pinned."""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_lightning_release_4_0_spark.operators.sketches import (
    bloom_maybe,
    bloom_probe,
    bloom_words,
    bloom_words_literal,
)


def _dim(spark, n=120):
    return spark.range(n).select(
        (F.col("id") * 7 + 3).cast("long").alias("key")
    )


def test_no_false_negatives_and_bounded_fp(spark):
    """Every true member must probe true; at m=512/k=3 over 120 keys
    the FP rate is real but must stay far below certainty."""
    dim = _dim(spark)
    fact = spark.range(2000).select(F.col("id").cast("long").alias("key"))
    out = bloom_probe(fact, "key", dim, "key", m=512, k=3)
    truth = {r["key"] for r in dim.collect()}
    rows = out.collect()
    members = [r for r in rows if r["key"] in truth]
    assert all(r["bloom_maybe"] for r in members), "false negative"
    non = [r for r in rows if r["key"] not in truth]
    fps = sum(1 for r in non if r["bloom_maybe"])
    # theoretical rate ~(1-e^{-kn/m})^k ~ 0.13 at n=120,m=512,k=3
    assert fps / len(non) < 0.35, fps


def test_probe_plan_has_no_exchange(spark):
    """The probe is the 100 TB contract: a pure narrow expression
    over literal words — no shuffle, no join on the fact side."""
    words = bloom_words_literal(
        bloom_words(_dim(spark), "key", m=512, k=3), 512
    )
    fact = spark.range(1000).select(F.col("id").cast("long").alias("key"))
    plan = fact.withColumn(
        "bloom_maybe", bloom_maybe("key", words, 512, k=3)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_words_dense_and_engine_sized(spark):
    """m/32 packed words, every word a 32-bit value (the DuckDB twin
    shifts BIGINT by at most 31 — no overflow on either engine)."""
    words = bloom_words_literal(
        bloom_words(_dim(spark), "key", m=512, k=3), 512
    )
    assert len(words) == 512 // 32
    assert all(0 <= w < (1 << 32) for w in words)
    assert any(w != 0 for w in words)


def test_property_no_false_negative_duckdb():
    """Property (DuckDB twin, no SparkSession — Spark equality is
    oracle-asserted above): for ANY key set, every true member probes
    true, at every word-boundary-straddling m."""
    import duckdb

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tidb_lightning_release_4_0_spark.operators.sketches import (
        bloom_probe_oracle_sql,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        keys=st.lists(
            st.integers(min_value=-(2**40), max_value=2**40),
            min_size=1, max_size=50, unique=True,
        ),
        extra=st.lists(
            st.integers(min_value=-(2**40), max_value=2**40),
            max_size=20,
        ),
        m=st.sampled_from([32, 64, 96, 256, 4096]),
        k=st.integers(min_value=1, max_value=5),
    )
    def check(keys, extra, m, k):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE dimt (key BIGINT); CREATE TABLE fact (key BIGINT)"
        )
        con.executemany("INSERT INTO dimt VALUES (?)", [(x,) for x in keys])
        con.executemany(
            "INSERT INTO fact VALUES (?)",
            [(x,) for x in set(keys) | set(extra)],
        )
        sql = bloom_probe_oracle_sql(
            "fact", "key", "SELECT key FROM dimt",
            "cast(key AS VARCHAR)", ["key"], m=m, k=k,
        )
        got = dict(con.execute(sql).fetchall())
        assert all(got[x] for x in keys), (m, k, keys)

    check()
