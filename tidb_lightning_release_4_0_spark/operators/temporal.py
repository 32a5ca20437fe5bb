"""Beyond-reference temporal joins: as-of join and range join.

The reference has no joins at all (SURVEY.md §2.7) — these are M7
additions a training-data / event-analytics pipeline needs. Both are
built from Spark primitives only, shaped for 100 TB:

- ``asof_join``: the classic "nearest prior fact" join (market-data
  style). NOT implemented as a theta-join (quadratic blowup) but as
  union → single hash shuffle on the key → one running ``last(...,
  ignorenulls)`` window per payload column. Cost: ONE shuffle of
  left+right, no candidate explosion, skew bounded by per-key row
  counts (salt hot keys upstream if a key exceeds a partition).

- range joins are expressed as plain joins with interval predicates
  (Catalyst turns equi-key + range residual into a shuffled hash join
  with a post-filter — linear, not cross-product, when an equi-key
  exists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with ``right_ts <= left_ts`` (``<`` when ``strict``) and equal
    join keys. Left rows with no prior right row are dropped (inner
    as-of semantics, like DuckDB's ``ASOF JOIN``).

    Determinism contract: at most one right row per (key, right_ts) —
    pre-aggregate the right side if it can carry duplicates (ties at
    the same timestamp would otherwise make ``last()`` pick an
    arbitrary one).
    """
    lcols = left.columns
    l = left.select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_l"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_l"),
    ).select(*lcols, *[f"_p_{c}" for c in payload], "_t", "_is_l")

    u = l.unionByName(r)
    # right rows order before left rows at equal _t => inclusive
    # matches; with strict=True left rows order first instead
    order = [F.col("_t"), F.col("_is_l") if not strict else (1 - F.col("_is_l"))]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload:
        u = u.withColumn(f"_p_{c}", F.last(f"_p_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col("_is_l") == 1).drop("_t", "_is_l")
    # inner semantics: require a match on the first payload column
    out = out.filter(F.col(f"_p_{payload[0]}").isNotNull())
    for c in payload:
        out = out.withColumnRenamed(f"_p_{c}", c)
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    range_pred: Column,
) -> DataFrame:
    """Equi-key join with an interval residual predicate. The equi
    keys make this a hash join (linear); the range condition is a
    post-filter — never express a pure range join without an equi-key
    at scale (cross-product)."""
    cond = None
    for lc, rc in on:
        c = left[lc] == right[rc]
        cond = c if cond is None else (cond & c)
    return left.join(right, cond & range_pred)


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention analysis: users grouped by their FIRST-event
    day (the cohort), then for every (cohort_day, day_offset) the
    count and fraction of that cohort active ``day_offset`` days
    after joining — the standard product-analytics retention matrix.

    Returns (cohort_day, day_offset, n_users, cohort_size,
    retention), one row per cohort-offset with activity.

    100 TB scale: two hash aggregates keyed by user (first-event) and
    by (cohort, offset) — no windows, no self-joins over the event
    stream; the cohort-size table is one row per cohort day and
    broadcasts into the final join. The distinct before the count
    bounds per-key work at events-per-user, and every aggregate has a
    map-side partial.
    """
    ev = df.select(
        F.col(user_col).alias("_u"), F.to_date(F.col(ts_col)).alias("_d")
    )
    first = ev.groupBy("_u").agg(F.min("_d").alias("cohort_day"))
    act = (
        ev.join(first, "_u")
        .select(
            "cohort_day",
            F.datediff(F.col("_d"), F.col("cohort_day")).alias(
                "day_offset"
            ),
            "_u",
        )
        .distinct()
    )
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        act.groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("_u").alias("n_users"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            # string form: engine-portable (a DATE cell round-trips
            # differently through pandas on the two engines)
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
            "n_users",
            "cohort_size",
            F.round(
                F.col("n_users") / F.col("cohort_size"), 4
            ).alias("retention"),
        )
    )


def cohort_retention_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    return f"""
WITH ev AS (
  SELECT {user_col} AS _u, CAST({ts_col} AS DATE) AS _d FROM {table}
),
first AS (SELECT _u, min(_d) AS cohort_day FROM ev GROUP BY _u),
act AS (
  SELECT DISTINCT f.cohort_day,
         date_diff('day', f.cohort_day, e._d) AS day_offset,
         e._u
  FROM ev e JOIN first f USING (_u)
),
sizes AS (
  SELECT cohort_day, count(*) AS cohort_size FROM first GROUP BY 1
)
SELECT CAST(a.cohort_day AS VARCHAR) AS cohort_day, a.day_offset,
       count(DISTINCT a._u) AS n_users,
       s.cohort_size,
       round(count(DISTINCT a._u)::DOUBLE / s.cohort_size, 4)
         AS retention
FROM act a JOIN sizes s USING (cohort_day)
GROUP BY a.cohort_day, a.day_offset, s.cohort_size
"""


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion: for each step k, the users whose
    FIRST step-k event strictly follows their first completed step
    k-1 — the standard ordered-sequence funnel (a user must view,
    then click, then purchase, in time order).

    Returns (stage_idx, stage, n_users, conversion): conversion is
    the fraction of the PREVIOUS stage's users who reached this one
    (1.0 for the first stage; round-4).

    100 TB scale: one filtered min-aggregate per step keyed by user
    (map-side partials; the event stream is filtered to one type
    BEFORE each shuffle), chained by per-user joins that shrink
    monotonically — never a self-join of the full stream against
    itself. The final stage table is ``len(steps)`` rows; the lag
    window over it is driver-trivial.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_ty"),
    )
    reached: list[DataFrame] = []
    prev = None
    for k, step in enumerate(steps):
        cur = ev.filter(F.col("_ty") == step)
        if prev is not None:
            cur = cur.join(prev, "_u").filter(F.col("_ts") > F.col("_tk"))
        cur = cur.groupBy("_u").agg(F.min("_ts").alias("_tk"))
        reached.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(k + 1).alias("stage_idx"),
                F.lit(step).alias("stage"),
                "n_users",
            )
        )
        prev = cur
    out = reached[0]
    for r in reached[1:]:
        out = out.unionByName(r)
    w = Window.orderBy("stage_idx")
    return out.select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(
            F.col("n_users")
            / F.coalesce(F.lag("n_users").over(w), F.col("n_users")),
            4,
        ).alias("conversion"),
    )


def funnel_conversion_oracle_sql(
    table: str = "events",
    steps: list[str] | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    steps = steps or ["view", "click", "purchase"]
    ctes = []
    for k, step in enumerate(steps):
        name = f"s{k + 1}"
        if k == 0:
            ctes.append(
                f"{name} AS (SELECT {user_col} AS _u, min({ts_col}) AS _tk"
                f" FROM {table} WHERE {type_col} = '{step}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"{name} AS (SELECT e.{user_col} AS _u, min(e.{ts_col})"
                f" AS _tk FROM {table} e JOIN s{k} ON e.{user_col} ="
                f" s{k}._u WHERE e.{type_col} = '{step}' AND e.{ts_col}"
                f" > s{k}._tk GROUP BY 1)"
            )
    rows = " UNION ALL ".join(
        f"SELECT {k + 1} AS stage_idx, '{s}' AS stage,"
        f" (SELECT count(*) FROM s{k + 1}) AS n_users"
        for k, s in enumerate(steps)
    )
    return f"""
WITH {', '.join(ctes)},
stages AS ({rows})
SELECT stage_idx, stage, n_users,
       round(n_users::DOUBLE / coalesce(
           lag(n_users) OVER (ORDER BY stage_idx), n_users), 4)
         AS conversion
FROM stages
"""


def rfm_segments(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    buckets: int = 5,
) -> DataFrame:
    """RFM segmentation: per-user Recency (days from last activity to
    the corpus max date), Frequency (event count) and Monetary (value
    sum), each quantile-bucketed into ``buckets`` scores via ntile —
    the classic marketing/user-quality segmentation.

    Scores are 1..buckets with ``buckets`` best (most recent, most
    frequent, highest spend). Ties are broken by user id so the
    bucketing is deterministic and engine-portable (ntile's division
    of equal-sized groups is order-sensitive).

    Returns (user_id, recency_days, frequency, monetary, r, f, m,
    segment) with segment the concatenated "rfm" digit string.

    100 TB scale: ONE hash aggregate keyed by user builds the metric
    table; the three ntile windows run over that (one row per user,
    not per event). A global ntile is a single-partition sort — at
    extreme user counts swap in the histogram-quantile bucketer
    (sketches.histogram_quantiles) for score edges; at the typical
    "users << events" shape the one-reducer sort on the aggregate is
    the cheapest correct plan.
    """
    agg = df.groupBy(F.col(user_col).alias("user_id")).agg(
        F.max(F.to_date(F.col(ts_col))).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(F.col(value_col)), 4).alias("monetary"),
    )
    anchor = df.agg(F.max(F.to_date(F.col(ts_col))).alias("_anchor"))
    m = agg.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff(F.col("_anchor"), F.col("_last")).alias(
            "recency_days"
        ),
        "frequency",
        "monetary",
    )
    r_w = Window.orderBy(F.col("recency_days").desc(), F.col("user_id"))
    f_w = Window.orderBy(F.col("frequency"), F.col("user_id"))
    m_w = Window.orderBy(F.col("monetary"), F.col("user_id"))
    return (
        m.withColumn("r", F.ntile(buckets).over(r_w))
        .withColumn("f", F.ntile(buckets).over(f_w))
        .withColumn("m", F.ntile(buckets).over(m_w))
        .withColumn(
            "segment",
            F.concat_ws("", F.col("r"), F.col("f"), F.col("m")),
        )
    )


def rfm_segments_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    buckets: int = 5,
) -> str:
    return f"""
WITH agg AS (
  SELECT {user_col} AS user_id,
         max(CAST({ts_col} AS DATE)) AS _last,
         count(*) AS frequency,
         round(sum({value_col}), 4) AS monetary
  FROM {table} GROUP BY 1
),
anchor AS (SELECT max(CAST({ts_col} AS DATE)) AS _anchor FROM {table}),
m AS (
  SELECT user_id,
         date_diff('day', _last, _anchor) AS recency_days,
         frequency, monetary
  FROM agg CROSS JOIN anchor
)
SELECT user_id, recency_days, frequency, monetary,
       ntile({buckets}) OVER (ORDER BY recency_days DESC, user_id) AS r,
       ntile({buckets}) OVER (ORDER BY frequency, user_id) AS f,
       ntile({buckets}) OVER (ORDER BY monetary, user_id) AS m,
       ntile({buckets}) OVER (ORDER BY recency_days DESC, user_id)
         || '' || ntile({buckets}) OVER (ORDER BY frequency, user_id)
         || '' || ntile({buckets}) OVER (ORDER BY monetary, user_id)
         AS segment
FROM m
"""


# ---------------------------------------------------------------------------
# Event-count anomaly detection (integer-exact z-test)
# ---------------------------------------------------------------------------


def anomaly_days(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    k: int = 2,
) -> DataFrame:
    """Per-user daily-activity anomaly days: days whose event count
    exceeds the user's own mean by more than ``k`` standard
    deviations (population sigma over the user's ACTIVE days) — the
    classic burst/bot/incident signal over an event stream.

    Engine-exactness: the z-test is evaluated WITHOUT computing mean,
    sigma, or any float. With per-user day count n, daily sums
    S = sum(cnt), Q = sum(cnt^2):

        cnt > mean + k*sigma
        <=>  n*cnt - S > 0  AND  (n*cnt - S)^2 > k^2 * (n*Q - S^2)

    (multiply through by n^2) — pure int64 arithmetic, identical in
    every engine, no sqrt/epsilon boundary rows. Bound: safe while
    n * max_daily_count < ~3e9 (the square must fit int64); at that
    volume per single user, pre-aggregate to coarser buckets.

    Output: (user_id, event_date, n_events) — the anomalous days.

    Scale shape: one hash aggregate to the (user, day) grain, one
    user-grain aggregate REUSING the same partitioning (user is a
    prefix of the first grouping key), one user-keyed join back —
    shuffles carry (user, day, count) triples, never events.
    """
    # ISO-string day key: engines render DATE values differently
    # through their pandas bridges; a yyyy-MM-dd string is canonical
    daily = df.groupBy(
        F.col(user_col).alias("user_id"),
        F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd").alias(
            "event_date"
        ),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    st = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("n_events").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("_q"),
    )
    dev = F.col("_n") * F.col("n_events") - F.col("_s")
    return (
        daily.join(st, "user_id")
        .filter(
            (F.col("_n") >= 2)
            & (dev > 0)
            & (
                dev * dev
                > F.lit(int(k) * int(k))
                * (F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s"))
            )
        )
        .select("user_id", "event_date", "n_events")
    )


def anomaly_days_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    k: int = 2,
) -> str:
    """DuckDB twin of anomaly_days — identical integer z-test."""
    return f"""
WITH daily AS (
  SELECT {user_col} AS user_id,
         strftime(CAST({ts_col} AS DATE), '%Y-%m-%d') AS event_date,
         count(*) AS n_events
  FROM {table} GROUP BY 1, 2
),
st AS (
  SELECT user_id, count(*) AS _n,
         cast(sum(n_events) AS BIGINT) AS _s,
         cast(sum(n_events * n_events) AS BIGINT) AS _q
  FROM daily GROUP BY 1
)
SELECT d.user_id, d.event_date, d.n_events
FROM daily d JOIN st USING (user_id)
WHERE _n >= 2
  AND (_n * d.n_events - _s) > 0
  AND (_n * d.n_events - _s) * (_n * d.n_events - _s)
      > {int(k) * int(k)} * (_n * _q - _s * _s)
"""
