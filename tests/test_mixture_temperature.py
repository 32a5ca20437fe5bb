"""Temperature mixing (curation.mixture_temperature). Oracle equality
runs in tests/test_registry_oracle.py; here the alpha-sampling
contract is pinned on skewed sources."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tidb_lightning_release_4_0_spark.operators.curation import (
    mixture_temperature,
)

_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("source", T.StringType()),
])


def _skewed(spark):
    # big: 2000 docs, small: 100 docs
    rows = [(i, "big") for i in range(2000)] + [
        (10000 + i, "small") for i in range(100)
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def _rates(df):
    stats = df.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(F.col("keep").cast("int")).alias("k"),
    ).collect()
    return {r["source"]: r["k"] / r["n"] for r in stats}


def test_t1_reproduces_natural_proportions(spark):
    # T=1: rate = target/total for every source (uniform thinning)
    r = _rates(mixture_temperature(_skewed(spark), 1.0, 700))
    expect = 700 / 2100
    assert r["big"] == pytest.approx(expect, abs=0.03)
    assert r["small"] == pytest.approx(expect, abs=0.12)


def test_low_resource_boosted_at_t2(spark):
    # T=2: w ~ sqrt(n); the small source's keep RATE must exceed the
    # big one's (that is the point of temperature sampling), while
    # the big source still contributes more documents in absolute
    df = mixture_temperature(_skewed(spark), 2.0, 700)
    r = _rates(df)
    assert r["small"] > r["big"] * 2
    kept = {
        row["source"]: row["k"]
        for row in df.groupBy("source")
        .agg(F.sum(F.col("keep").cast("int")).alias("k"))
        .collect()
    }
    assert kept["big"] > kept["small"]


def test_rate_caps_at_one(spark):
    # tiny source + huge target: rate clamps, everything kept once
    df = mixture_temperature(_skewed(spark), 5.0, 100000)
    r = _rates(df)
    assert r["small"] == 1.0 and r["big"] == 1.0
