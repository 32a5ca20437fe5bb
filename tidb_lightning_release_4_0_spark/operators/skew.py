"""Skew mitigation helpers: salted two-phase aggregation and
salted joins.

AQE's skew-join splitting (enabled in session.py) handles most join
skew at runtime; these helpers cover the aggregation-side hot-key
problem AQE does not touch: a groupBy where one key holds a large
fraction of all rows makes one reducer the straggler. Salting
splits each key into ``salt_buckets`` sub-keys for the partial
aggregate, then combines — two small shuffles instead of one skewed
one. Results are identical to the unsalted aggregate (verified
against a plain-SQL oracle in the registry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output_name -> (function, column) with function in
    {sum, count, min, max} (the re-aggregable monoids; avg callers
    compose sum/count).

    Phase 1 groups by (keys + salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 combines the tiny partials.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    partial_exprs = []
    final_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").cast("long").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            final_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            final_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-re-aggregable function {fn!r}")
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skewed-left equi-join: salt the left side's key, replicate the
    right side across all salt values (explode), join on (key, salt).
    Use when the right side is too big to broadcast but the left has
    hot keys; AQE skew-join is preferred when applicable."""
    l2 = left.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    r2 = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return l2.join(r2, [key, "_salt"]).drop("_salt")
