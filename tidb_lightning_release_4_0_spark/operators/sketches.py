"""Sketch operators with ENGINE-EXACT oracles.

Approximate aggregates usually can't be oracle-checked because each
engine ships its own sketch implementation (Spark's HLL++ vs DuckDB's
approx_count_distinct share no bit-level contract). These operators
instead build the sketch from explicit relational algebra over the
portable md5-prefix hash (`functions/hashing.hash60`), so Spark and
the DuckDB oracle compute IDENTICAL registers and estimates — the
approximation is deterministic and therefore verifiable.

Beyond-reference (M7): a 100 TB corpus needs cardinality estimates
(distinct URLs / tokens / shingles) where exact count-distinct would
shuffle the full key set; an HLL register table is m integers per
group regardless of cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import (
    hash60,
    hash60_duckdb,
    hash60_seeded,
    hash60_seeded_duckdb,
)

# HyperLogLog with p=8 -> m=256 registers over the 60-bit hash:
# bucket = h mod m, remaining 52 bits feed the leading-zero rank
# rho in 1..53 (rho = 53 - bit_length(rest); rest==0 -> 53).
_M = 256
_ALPHA_NUM = 4.2399330249068963e20  # alpha_256 * m^2 * 2^53 (one literal,
# parsed identically by both engines — no divergent constant folding)


def _hll_rho(h: Column) -> Column:
    """Leading-zero rank over the 52 post-bucket bits (rho in 1..53)."""
    rest = F.shiftright(h, 8)
    return F.when(rest == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(rest))
    )


def _hll_term() -> Column:
    # built lazily: a Column cannot be constructed before the
    # SparkContext exists (the registry imports this module to build
    # oracle SQL with no session around)
    return F.expr("shiftleft(cast(1 as bigint), cast(53 - M as int))")


def _hll_estimate() -> Column:
    """Estimate from the (nz, S) aggregate columns: raw harmonic
    estimator with the standard LinearCounting small-range correction
    (Flajolet et al. 2007, §4) when raw <= 2.5m and empty registers
    remain. ln() is IEEE-double on both engines."""
    zeros = F.lit(_M) - F.col("nz")
    zero_term = F.expr("shiftleft(cast(1 as bigint), 53)")
    raw = F.lit(_ALPHA_NUM) / (F.col("S") + zeros * zero_term)
    return F.when(
        (raw <= F.lit(2.5 * _M)) & (zeros > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / zeros),
    ).otherwise(raw)


def _hll_est_sql() -> str:
    """The identical estimate as a DuckDB fragment over (nz, S)."""
    raw = f"({_ALPHA_NUM!r} / (S + ({_M} - nz) * (1::BIGINT << 53)))"
    return (
        f"CASE WHEN {raw} <= {2.5 * _M} AND ({_M} - nz) > 0 "
        f"THEN {float(_M)!r} * ln({float(_M)!r} / ({_M} - nz)) "
        f"ELSE {raw} END"
    )


_HLL_RHO_SQL = (
    "max(CASE WHEN (hv >> 8) = 0 THEN 53 "
    "ELSE 53 - length(bin(hv >> 8)) END) AS M"
)


def _hll_regs(df: DataFrame, col: str | Column) -> DataFrame:
    """The 256-register table (bucket, M) for one key column — the
    single source of truth for register construction."""
    c = F.col(col) if isinstance(col, str) else col
    h = hash60(c)
    return (
        df.select(
            F.pmod(h, F.lit(_M)).alias("bucket"), _hll_rho(h).alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("M"))
    )


def _hll_summary(agg: DataFrame) -> DataFrame:
    """(nz, S) aggregate -> the standard 1-row summary projection."""
    return agg.select(
        F.col("nz").cast("int").alias("nonzero_buckets"),
        (F.lit(_M) - F.col("nz")).cast("int").alias("zero_buckets"),
        F.round(_hll_estimate(), 2).alias("est_distinct"),
    )


def approx_distinct_hll(df: DataFrame, col: str | Column) -> DataFrame:
    """1-row frame (nonzero_buckets, zero_buckets, est_distinct).

    All arithmetic stays exact until the single final division: the
    2^-register terms are summed as integers scaled by 2^53, so the
    register sum is engine-independent; the estimate is one IEEE
    division + round(2). Scale shape: one narrow projection, one
    256-group partial-agg (map-side combined), one 256-row final agg
    — no full-key shuffle, unlike exact count-distinct."""
    agg = _hll_regs(df, col).agg(
        F.count(F.lit(1)).alias("nz"), F.sum(_hll_term()).alias("S")
    )
    return _hll_summary(agg)


def approx_distinct_hll_grouped(
    df: DataFrame, group_col: str, col: str | Column
) -> DataFrame:
    """Per-group deterministic HLL: (group, nonzero_buckets,
    zero_buckets, est_distinct). The register table is (groups x m)
    rows — a fixed-width partial-aggregable state per group, which is
    the whole point at 100 TB: per-group exact distinct shuffles the
    full (group, key) set, this shuffles at most m integers per
    group."""
    c = F.col(col) if isinstance(col, str) else col
    h = hash60(c)
    regs = (
        df.select(
            F.col(group_col).alias("g"),
            F.pmod(h, F.lit(_M)).alias("bucket"),
            _hll_rho(h).alias("rho"),
        )
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("M"))
    )
    agg = regs.groupBy("g").agg(
        F.count(F.lit(1)).alias("nz"), F.sum(_hll_term()).alias("S")
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("nz").cast("int").alias("nonzero_buckets"),
        (F.lit(_M) - F.col("nz")).cast("int").alias("zero_buckets"),
        F.round(_hll_estimate(), 2).alias("est_distinct"),
    ).orderBy(group_col)


def approx_distinct_hll_grouped_oracle_sql(
    table: str, group_col: str, expr: str
) -> str:
    return f"""
        WITH h AS (
          SELECT {group_col} AS g,
                 {hash60_duckdb(expr)} AS hv FROM {table}
        ), r AS (
          SELECT g, hv % {_M} AS bucket, {_HLL_RHO_SQL}
          FROM h GROUP BY g, bucket
        ), a AS (
          SELECT g, count(*) AS nz,
                 sum(1::BIGINT << (53 - M)) AS S
          FROM r GROUP BY g
        )
        SELECT g AS {group_col},
               cast(nz AS INTEGER) AS nonzero_buckets,
               cast({_M} - nz AS INTEGER) AS zero_buckets,
               round({_hll_est_sql()}, 2) AS est_distinct
        FROM a ORDER BY {group_col}
    """


def approx_distinct_hll_oracle_sql(table: str, expr: str) -> str:
    """DuckDB SQL computing the bit-identical HLL result."""
    return f"""
        WITH h AS (
          SELECT {hash60_duckdb(expr)} AS hv FROM {table}
        ), r AS (
          SELECT hv % {_M} AS bucket, {_HLL_RHO_SQL}
          FROM h GROUP BY bucket
        ), a AS (
          SELECT count(*) AS nz,
                 sum(1::BIGINT << (53 - M)) AS S
          FROM r
        )
        SELECT cast(nz AS INTEGER) AS nonzero_buckets,
               cast({_M} - nz AS INTEGER) AS zero_buckets,
               round({_hll_est_sql()}, 2) AS est_distinct
        FROM a
    """


# Count-Min sketch: d seeded hash rows x w buckets. Counters are
# exact integers -> the whole sketch (and every estimate read off it)
# is engine-exact, unlike library CMS implementations.
_CMS_D = 4
_CMS_W = 1024


def cms_estimate_terms(
    df: DataFrame, value_col: str | Column, probes: list[str]
) -> DataFrame:
    """Count-Min frequency estimates for a probe list: one row per
    probe (term, est_count), est = min over the d rows of the
    counter at h_seed(term) mod w.

    Scale shape: the sketch is d x w = 4096 counters regardless of
    cardinality — built in ONE input scan (the d (row, bucket) pairs
    explode from each value into a single map-side-combined groupBy),
    read via a d*|probes|-row broadcast join. CMS guarantees
    est >= true with bounded overestimate (Cormode & Muthukrishnan
    2005)."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    # single-pass build: one scan emits the d (row, bucket) pairs per
    # value and one groupBy counts them all — a per-seed groupBy loop
    # would re-scan (and re-tokenize) the input d times
    pairs = F.array(
        *[
            F.struct(
                F.lit(seed).alias("row"),
                F.pmod(hash60_seeded(c, seed), F.lit(_CMS_W)).alias(
                    "bucket"
                ),
            )
            for seed in range(_CMS_D)
        ]
    )
    sk = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.row", "p.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = df.sparkSession
    import hashlib

    probe_rows = []
    for term in probes:
        for seed in range(_CMS_D):
            h = int(
                hashlib.md5(f"s{seed}:{term}".encode()).hexdigest()[:15], 16
            )
            probe_rows.append((term, seed, h % _CMS_W))
    probe_df = spark.createDataFrame(
        probe_rows, "term string, row int, bucket bigint"
    )
    # the SKETCH side broadcasts (<= d*w = 4096 counter rows); the
    # probe list is the left side of the left join so absent terms
    # still report 0
    return (
        probe_df.join(F.broadcast(sk), on=["row", "bucket"], how="left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
        .orderBy("term")
    )


def cms_estimate_terms_oracle_sql(
    table: str, expr: str, probes: list[str]
) -> str:
    """DuckDB SQL computing identical CMS estimates (the probe
    hashes are md5-derived in SQL, matching the driver-side python
    md5 in cms_estimate_terms)."""
    rows = []
    for seed in range(_CMS_D):
        rows.append(
            f"SELECT {seed} AS row, "
            f"({hash60_seeded_duckdb(expr, seed)}) % {_CMS_W} AS bucket "
            f"FROM {table}"
        )
    # probes become SQL string literals: double embedded quotes (the
    # standard-SQL escape DuckDB uses) rather than Python repr(),
    # which breaks on quotes/backslashes and would hash a literal
    # that no longer equals the raw term
    def _lit(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    probe_selects = " UNION ALL ".join(
        f"SELECT {_lit(t)} AS term, {seed} AS row, "
        f"({hash60_seeded_duckdb(_lit(t), seed)}) % {_CMS_W} AS bucket"
        for t in probes
        for seed in range(_CMS_D)
    )
    union = " UNION ALL ".join(rows)
    return f"""
        WITH pairs AS ({union}),
        sk AS (
          SELECT row, bucket, count(*) AS cnt
          FROM pairs GROUP BY row, bucket
        ),
        probe AS ({probe_selects})
        SELECT term,
               cast(min(coalesce(cnt, 0)) AS BIGINT) AS est_count
        FROM probe LEFT JOIN sk USING (row, bucket)
        GROUP BY term ORDER BY term
    """


# Histogram quantile sketch: fixed equi-width bins over [min, max].
_HQ_BINS = 256


def histogram_quantiles(
    df: DataFrame, col: str | Column, probs: list[float]
) -> DataFrame:
    """Approximate quantiles from a 256-bin equi-width histogram —
    (prob, est) rows, linear interpolation inside the hit bin.

    The scalable shape for percentiles: bin counts partial-aggregate
    map-side and the shuffle carries at most 256 rows, where exact
    percentiles sort or multi-pass the full column. Every step
    (integer counts, one cumulative window over 256 rows, one
    interpolation per probe) is deterministic IEEE arithmetic, so
    the DuckDB oracle verifies the estimates exactly — unlike
    engine-native GK/t-digest approx_percentile, which is neither
    portable nor reproducible."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    spark = df.sparkSession
    stats = df.agg(
        F.min(c).alias("mn"), F.max(c).alias("mx"),
        F.count(c).alias("n"),
    ).first()
    n = int(stats["n"])
    if n == 0:
        return spark.createDataFrame([], "prob double, est double")
    mn, mx = float(stats["mn"]), float(stats["mx"])
    if mx == mn:
        # constant column: every quantile IS the value (the equi-width
        # histogram would need width 0 — division-by-zero semantics
        # diverge between engines, so short-circuit engine-side; the
        # oracle builder documents non-degenerate input as its
        # precondition). HALF_UP like F.round, not Python's
        # ties-to-even.
        from decimal import ROUND_HALF_UP, Decimal

        est4 = float(
            Decimal(repr(mn)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        return spark.createDataFrame(
            [(float(p), est4) for p in sorted(probs)],
            "prob double, est double",
        )
    width = (mx - mn) / _HQ_BINS
    bin_col = F.least(
        F.floor((c - F.lit(mn)) / F.lit(width)).cast("int"),
        F.lit(_HQ_BINS - 1),
    )
    # nulls are excluded from n (count(c) skips them) so they must be
    # excluded from the bins too — an unfiltered select would put them
    # in a NULL bin that Spark orders FIRST in the cumulative window
    # (inflating every cum) while DuckDB orders it LAST
    counts = (
        df.filter(c.isNotNull())
        .select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = counts.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    probe = spark.createDataFrame(
        [(float(p),) for p in probs], "prob double"
    )
    # first bin whose cumulative count reaches ceil(prob * n)
    hit = (
        F.broadcast(probe)
        .join(cum, F.col("cum") >= F.ceil(F.col("prob") * F.lit(n)))
        .groupBy("prob")
        .agg(
            F.min_by(F.struct("bin", "cnt", "cum"), F.col("bin")).alias("h")
        )
    )
    frac = (
        F.col("prob") * F.lit(float(n))
        - (F.col("h.cum") - F.col("h.cnt")).cast("double")
    ) / F.col("h.cnt").cast("double")
    est = F.lit(mn) + (F.col("h.bin").cast("double") + frac) * F.lit(width)
    return hit.select(
        "prob", F.round(est, 4).alias("est")
    ).orderBy("prob")


def histogram_quantiles_oracle_sql(
    table: str, expr: str, probs: list[float]
) -> str:
    """Precondition: non-empty, non-constant input — the operator
    short-circuits the degenerate cases engine-side (width-0 division
    semantics differ between engines and cannot be oracle-matched)."""
    probe = " UNION ALL ".join(f"SELECT {float(p)!r} AS prob" for p in probs)
    return f"""
        WITH params AS (
          SELECT cast(min({expr}) AS DOUBLE) AS mn,
                 cast(max({expr}) AS DOUBLE) AS mx,
                 count({expr}) AS n
          FROM {table}
        ), b AS (
          SELECT least(cast(floor((cast({expr} AS DOUBLE) - mn) /
                   ((mx - mn) / {_HQ_BINS})) AS INTEGER),
                 {_HQ_BINS - 1}) AS bin
          FROM {table}, params
          WHERE {expr} IS NOT NULL
        ), c AS (
          SELECT bin, count(*) AS cnt FROM b GROUP BY bin
        ), cum AS (
          SELECT bin, cnt,
                 sum(cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
          FROM c
        ), probe AS ({probe}), hit AS (
          SELECT prob, min(bin) AS bin FROM probe
          JOIN cum ON cum >= ceil(prob * (SELECT n FROM params))
          GROUP BY prob
        )
        SELECT prob,
               round((SELECT mn FROM params)
                 + (cast(hit.bin AS DOUBLE)
                    + (prob * cast((SELECT n FROM params) AS DOUBLE)
                       - cast(cum.cum - cum.cnt AS DOUBLE))
                      / cast(cum.cnt AS DOUBLE))
                   * (((SELECT mx FROM params) - (SELECT mn FROM params))
                      / {_HQ_BINS}), 4) AS est
        FROM hit JOIN cum ON hit.bin = cum.bin
        ORDER BY prob
    """


def approx_distinct_hll_union(
    df_a: DataFrame, col_a: str, df_b: DataFrame, col_b: str
) -> DataFrame:
    """Cardinality of the UNION of two sources by merging their HLL
    register tables (per-bucket max) — the mergeability property that
    makes sketches distributable: each 100 TB source keeps its own
    256 registers and the union costs a 256-row combine, never a
    re-read or a joint distinct over both corpora."""

    merged = (
        _hll_regs(df_a, col_a)
        .unionByName(_hll_regs(df_b, col_b))
        .groupBy("bucket")
        .agg(F.max("M").alias("M"))
    )
    agg = merged.agg(
        F.count(F.lit(1)).alias("nz"), F.sum(_hll_term()).alias("S")
    )
    return _hll_summary(agg)


def approx_distinct_hll_union_oracle_sql(
    table_a: str, expr_a: str, table_b: str, expr_b: str
) -> str:
    return f"""
        WITH h AS (
          SELECT {hash60_duckdb(expr_a)} AS hv FROM {table_a}
          UNION ALL
          SELECT {hash60_duckdb(expr_b)} AS hv FROM {table_b}
        ), r AS (
          SELECT hv % {_M} AS bucket, {_HLL_RHO_SQL}
          FROM h GROUP BY bucket
        ), a AS (
          SELECT count(*) AS nz,
                 sum(1::BIGINT << (53 - M)) AS S
          FROM r
        )
        SELECT cast(nz AS INTEGER) AS nonzero_buckets,
               cast({_M} - nz AS INTEGER) AS zero_buckets,
               round({_hll_est_sql()}, 2) AS est_distinct
        FROM a
    """


def approx_overlap_hll(
    df_a: DataFrame, col_a: str, df_b: DataFrame, col_b: str
) -> DataFrame:
    """Approximate overlap of two key sets from three HLL estimates
    (A, B, A∪B by register merge): intersection via
    inclusion-exclusion and Jaccard = inter/union — the crawl-
    snapshot overlap metric, computed from 3x256 registers without
    ever joining the corpora. Estimates compose deterministically,
    so the oracle verifies all four outputs."""

    def regs(df: DataFrame, col: str, tag: str) -> DataFrame:
        return _hll_regs(df, col).select(
            F.lit(tag).alias("t"), "bucket", "M"
        )

    ra = regs(df_a, col_a, "a")
    rb = regs(df_b, col_b, "b")
    ru = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("M").alias("M"))
        .select(F.lit("u").alias("t"), "bucket", "M")
    )
    all_regs = ra.unionByName(rb).unionByName(ru)
    agg = all_regs.groupBy("t").agg(
        F.count(F.lit(1)).alias("nz"), F.sum(_hll_term()).alias("S")
    )
    est = agg.select("t", _hll_estimate().alias("e"))
    p = est.groupBy().pivot("t", ["a", "b", "u"]).agg(F.first("e"))
    # clamp inclusion-exclusion to [0, min(a, b)]: HLL noise on
    # (near-)disjoint sets can push a + b - u below zero or above the
    # smaller set, and Jaccard is defined on [0, 1]
    inter = F.greatest(
        F.lit(0.0),
        F.least(
            F.col("a") + F.col("b") - F.col("u"),
            F.least(F.col("a"), F.col("b")),
        ),
    )
    return p.select(
        F.round(F.col("a"), 2).alias("est_a"),
        F.round(F.col("b"), 2).alias("est_b"),
        F.round(F.col("u"), 2).alias("est_union"),
        F.round(inter / F.col("u"), 6).alias("est_jaccard"),
    )


def approx_overlap_hll_oracle_sql(
    table_a: str, expr_a: str, table_b: str, expr_b: str
) -> str:
    def regs(table: str, expr: str, tag: str) -> str:
        return f"""
          SELECT '{tag}' AS t, hv % {_M} AS bucket, {_HLL_RHO_SQL}
          FROM (SELECT {hash60_duckdb(expr)} AS hv FROM {table})
          GROUP BY t, bucket"""

    return f"""
        WITH ra AS ({regs(table_a, expr_a, 'a')}),
        rb AS ({regs(table_b, expr_b, 'b')}),
        ru AS (
          SELECT 'u' AS t, bucket, max(M) AS M
          FROM (SELECT bucket, M FROM ra
                UNION ALL SELECT bucket, M FROM rb)
          GROUP BY t, bucket
        ), a AS (
          SELECT t, count(*) AS nz,
                 sum(1::BIGINT << (53 - M)) AS S
          FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb
                UNION ALL SELECT * FROM ru)
          GROUP BY t
        ), e AS (
          SELECT t, {_hll_est_sql()} AS e FROM a
        )
        SELECT round(ea.e, 2) AS est_a, round(eb.e, 2) AS est_b,
               round(eu.e, 2) AS est_union,
               round(greatest(0.0, least(ea.e + eb.e - eu.e,
                     least(ea.e, eb.e))) / eu.e, 6) AS est_jaccard
        FROM (SELECT e FROM e WHERE t = 'a') ea,
             (SELECT e FROM e WHERE t = 'b') eb,
             (SELECT e FROM e WHERE t = 'u') eu
    """


# ---------------------------------------------------------------------------
# Bloom filter: engine-exact build + zero-shuffle probe
# ---------------------------------------------------------------------------
#
# Beyond-reference (M7): semi-join pruning at 100 TB. Filtering a fact
# table to "keys present in <dim subset>" normally costs either a full
# shuffle (SortMergeJoin semi) or broadcasting the EXACT key set (can
# be GBs). A Bloom filter of the key set is m bits regardless of key
# count: build is one m/32-row aggregate over the dim, the probe is a
# pure narrow expression over broadcast literal words — the fact table
# never shuffles and never holds more than m/32 longs per executor.
# False positives are bounded (~(1-e^{-kn/m})^k) and deterministic
# here: bit positions come from the portable seeded md5-prefix hash,
# so Spark and the DuckDB oracle compute IDENTICAL words and verdicts,
# FPs included. Survivors can then (optionally) exact-join — the
# expensive join now touches only maybe-rows.


def bloom_words(df: DataFrame, key: Column | str, m: int = 4096,
                k: int = 3) -> DataFrame:
    """Build the filter as a dense (word_idx, bits) table: each key
    sets k bit positions hash60_seeded(key, j) % m; words pack 32
    bits each via bit_or (32 not 64: DuckDB's BIGINT << raises on a
    63-bit shift instead of wrapping, so the oracle twin could not
    reproduce the top bit). m must be a multiple of 32."""
    assert m % 32 == 0, "m must pack into 32-bit words"
    c = F.col(key) if isinstance(key, str) else key
    pos = [hash60_seeded(c, j) % m for j in range(k)]
    bits = df.select(
        F.explode(F.array(*pos)).alias("pos")
    ).select(
        (F.col("pos") / 32).cast("int").alias("word_idx"),
        # shiftleft's python signature wants a literal shift; the
        # column-shift form exists only in SQL
        F.expr(
            "shiftleft(cast(1 as bigint), cast(pos % 32 as int))"
        ).alias("mask"),
    )
    return bits.groupBy("word_idx").agg(
        F.bit_or("mask").alias("bits")
    )


def bloom_words_literal(words_df: DataFrame, m: int) -> list[int]:
    """Collect the words into a dense driver-side list (missing words
    -> 0). O(m/32) rows by construction — this is metadata, like IVF
    centroids, not data."""
    dense = [0] * (m // 32)
    for r in words_df.collect():
        dense[int(r["word_idx"])] = int(r["bits"])
    return dense


def bloom_maybe(key: Column | str, words: list[int], m: int,
                k: int = 3) -> Column:
    """Zero-shuffle membership probe against literal words: true iff
    every one of the k positions' bits is set. Builds ONE SQL string
    parsed by a single F.expr (array literal + k bit tests), so plan
    construction stays O(1) py4j calls."""
    kc = key if isinstance(key, str) else None
    assert kc is not None, "bloom_maybe probes a named column"
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    from ..functions.hashing import hash60_sql

    tests = []
    for j in range(k):
        h = hash60_sql(f"concat('s{j}:', cast({kc} as string))")
        p = f"({h}) % {m}"
        tests.append(
            f"((element_at({arr}, cast(({p}) div 32 as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast(({p}) % 32 as int)))"
            f" != 0)"
        )
    return F.expr(" AND ".join(tests))


def bloom_probe(fact: DataFrame, fact_key: str, dim: DataFrame,
                dim_key: Column | str, m: int = 4096,
                k: int = 3) -> DataFrame:
    """fact + boolean ``bloom_maybe``: membership of fact_key in the
    dim key set, per the filter built from dim. The dim aggregate and
    the O(m/64) collect run once; the fact side stays narrow."""
    words = bloom_words_literal(bloom_words(dim, dim_key, m, k), m)
    return fact.withColumn(
        "bloom_maybe", bloom_maybe(fact_key, words, m, k)
    )


def bloom_probe_oracle_sql(
    fact_table: str, fact_key: str, dim_sql: str, dim_key_expr: str,
    select_cols: list[str], m: int = 4096, k: int = 3,
) -> str:
    """DuckDB twin: identical words, identical verdicts (FPs and all).
    dim_sql is a full SELECT producing the dim rows; dim_key_expr the
    key expression over it."""
    pos_rows = " UNION ALL ".join(
        f"SELECT ({hash60_seeded_duckdb(dim_key_expr, j)}) % {m} AS pos "
        f"FROM dim"
        for j in range(k)
    )
    tests = []
    for j in range(k):
        p = (f"(({hash60_seeded_duckdb(f'cast({fact_key} AS VARCHAR)', j)})"
             f" % {m})")
        tests.append(
            f"(coalesce(w{j}.bits, 0) & (1::BIGINT << (({p}) % 32))) != 0"
        )
    joins = "".join(
        f" LEFT JOIN words w{j} ON w{j}.word_idx = "
        f"(({hash60_seeded_duckdb(f'cast({fact_key} AS VARCHAR)', j)})"
        f" % {m}) // 32"
        for j in range(k)
    )
    cols = ", ".join(select_cols)
    return f"""
WITH dim AS ({dim_sql}),
positions AS ({pos_rows}),
words AS (
  SELECT pos // 32 AS word_idx, bit_or(1::BIGINT << (pos % 32)) AS bits
  FROM positions GROUP BY word_idx
)
SELECT {cols}, ({' AND '.join(tests)}) AS bloom_maybe
FROM {fact_table}{joins}
"""


# ---------------------------------------------------------------------------
# Benford's-law first-digit profile (data-quality / fraud signal)
# ---------------------------------------------------------------------------

import math as _math

_BENFORD = {d: _math.log10(1 + 1.0 / d) for d in range(1, 10)}


def benford_profile(
    df: DataFrame, value_col: str
) -> DataFrame:
    """First-significant-digit distribution of a positive numeric
    column vs Benford's law — the classic anomaly/fabrication signal
    for financial-ish columns (a synthetic or tampered column
    deviates; naturally-grown magnitudes follow log10(1 + 1/d)).

    Digit extraction is ENGINE-PORTABLE by construction: the value
    is cast to DECIMAL(38,4) and rendered to a string (both engines
    print decimals with plain digits, no scientific notation), and
    the first [1-9] character is the digit — no log10 float boundary
    at exact powers of ten. Non-positive and null values are
    excluded.

    Output: one row per digit 1..9 — (digit, n_obs, obs_frac,
    benford_frac, abs_dev), fractions rounded to 6. The count table
    is a 9-key hash aggregate; nothing else shuffles.
    """
    s = F.col(value_col).cast("decimal(38,4)").cast("string")
    # nullif guards the cast: a positive value < 0.00005 renders as
    # "0.0000", the extract returns '' and cast('' AS int) would
    # throw under Spark's default ANSI mode — null instead, filtered
    # below exactly like the DuckDB twin drops such rows.
    digit = F.nullif(
        F.regexp_extract(s, "([1-9])", 1), F.lit("")
    ).cast("int")
    counts = (
        df.filter(F.col(value_col) > 0)
        .select(digit.alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = counts.agg(F.sum("n_obs").alias("n_total"))
    bf = F.lit(0.0)
    for d in range(9, 0, -1):
        bf = F.when(F.col("digit") == d, F.lit(_BENFORD[d])).otherwise(bf)
    obs = F.col("n_obs").cast("double") / F.col("n_total").cast("double")
    return (
        counts.join(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            F.round(obs, 6).alias("obs_frac"),
            F.round(bf, 6).alias("benford_frac"),
            F.round(F.abs(obs - bf), 6).alias("abs_dev"),
        )
    )


def benford_profile_sql_duckdb(table: str, value_col: str) -> str:
    """DuckDB twin — identical decimal rendering, digit extraction,
    literal Benford fractions and float order."""
    cases = " ".join(
        f"WHEN digit = {d} THEN {_BENFORD[d]!r}" for d in range(1, 10)
    )
    return f"""
WITH counts AS (
  SELECT cast(regexp_extract(
           cast(cast({value_col} AS DECIMAL(38,4)) AS VARCHAR),
           '([1-9])', 1) AS INT) AS digit,
         count(*) AS n_obs
  FROM {table}
  WHERE {value_col} > 0
    AND regexp_extract(
          cast(cast({value_col} AS DECIMAL(38,4)) AS VARCHAR),
          '([1-9])', 1) <> ''
  GROUP BY 1
),
tot AS (SELECT sum(n_obs) AS n_total FROM counts)
SELECT digit, n_obs,
       round(cast(n_obs AS DOUBLE) / cast(n_total AS DOUBLE), 6)
           AS obs_frac,
       round(CASE {cases} ELSE 0.0 END, 6) AS benford_frac,
       round(abs(cast(n_obs AS DOUBLE) / cast(n_total AS DOUBLE)
                 - CASE {cases} ELSE 0.0 END), 6) AS abs_dev
FROM counts, tot
"""


# ---------------------------------------------------------------------------
# Mutual information between two categorical columns (dependence profile)
# ---------------------------------------------------------------------------


def mutual_information(
    df: DataFrame, x: Column, y: Column
) -> DataFrame:
    """Mutual information (nats) between two categorical expressions
    — the data-profiling dependence measure (does event type depend
    on day-of-week? does language depend on source?):

        MI = sum_xy (n_xy / N) * ln(n_xy * N / (n_x * n_y))

    Engine-exactness: all counts are exact; each cell's term is one
    float expression of identical integers, rounded to 9 decimals
    and summed as DECIMAL (exact, order-free), with the final MI
    rounded to 6. Null categories count as their own level via a
    sentinel, so the profile never silently drops rows.

    Scale shape: one (x, y) hash aggregate (map-side combined, cells
    bounded by |X|*|Y|); the marginals derive from the CELL table,
    not a second corpus scan, and join back broadcast.

    Output: one row — (n_rows, n_cells, mi_nats).
    """
    xs = F.coalesce(x.cast("string"), F.lit("\x00null"))
    ys = F.coalesce(y.cast("string"), F.lit("\x00null"))
    cells = df.select(xs.alias("_x"), ys.alias("_y")).groupBy(
        "_x", "_y"
    ).agg(F.count(F.lit(1)).alias("n_xy"))
    nx = cells.groupBy("_x").agg(F.sum("n_xy").alias("n_x"))
    ny = cells.groupBy("_y").agg(F.sum("n_xy").alias("n_y"))
    nt = cells.agg(F.sum("n_xy").alias("n_t"))
    term = (
        F.round(
            (F.col("n_xy").cast("double") / F.col("n_t").cast("double"))
            * F.log(
                F.col("n_xy").cast("double")
                * F.col("n_t").cast("double")
                / (
                    F.col("n_x").cast("double")
                    * F.col("n_y").cast("double")
                )
            ),
            9,
        )
        .cast("decimal(20,9)")
        .alias("_t")
    )
    return (
        cells.join(F.broadcast(nx), "_x")
        .join(F.broadcast(ny), "_y")
        .join(F.broadcast(nt))
        .select("n_t", term)
        .groupBy("n_t")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("_t").alias("_mi"),
        )
        .select(
            F.col("n_t").alias("n_rows"),
            "n_cells",
            F.round(F.col("_mi").cast("double"), 6).alias("mi_nats"),
        )
    )


def mutual_information_sql_duckdb(
    table: str, x_expr: str, y_expr: str
) -> str:
    """DuckDB twin — identical sentinel, rounding and float order."""
    xs = f"coalesce(cast({x_expr} AS VARCHAR), chr(0) || 'null')"
    ys = f"coalesce(cast({y_expr} AS VARCHAR), chr(0) || 'null')"
    return f"""
WITH cells AS (
  SELECT {xs} AS _x, {ys} AS _y, count(*) AS n_xy
  FROM {table} GROUP BY 1, 2
),
nx AS (SELECT _x, sum(n_xy) AS n_x FROM cells GROUP BY 1),
ny AS (SELECT _y, sum(n_xy) AS n_y FROM cells GROUP BY 1),
nt AS (SELECT cast(sum(n_xy) AS BIGINT) AS n_t FROM cells),
terms AS (
  SELECT n_t,
         cast(round(
           (cast(n_xy AS DOUBLE) / cast(n_t AS DOUBLE))
           * ln(cast(n_xy AS DOUBLE) * cast(n_t AS DOUBLE)
                / (cast(n_x AS DOUBLE) * cast(n_y AS DOUBLE))),
           9) AS DECIMAL(20,9)) AS t
  FROM cells JOIN nx USING (_x) JOIN ny USING (_y), nt
)
SELECT n_t AS n_rows, count(*) AS n_cells,
       round(cast(sum(t) AS DOUBLE), 6) AS mi_nats
FROM terms GROUP BY 1
"""
