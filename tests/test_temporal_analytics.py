"""Cohort retention and ordered funnel conversion — semantic pins on
hand-built event streams where the expected matrix is computable by
eye. Engine-vs-DuckDB equivalence runs in test_registry_oracle.py.
"""

from datetime import datetime

from tidb_lightning_release_4_0_spark.operators.temporal import (
    cohort_retention,
    funnel_conversion,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime(2024, 1, d, h), u, t, 1.0, "{}")
            for i, (u, d, h, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )


def test_funnel_requires_time_order(spark):
    rows = [
        # A: view -> click -> purchase, in order: full funnel
        (1, 1, 1, "view"), (1, 1, 2, "click"), (1, 1, 3, "purchase"),
        # B: click BEFORE first view: reaches stage 1 only
        (2, 1, 1, "click"), (2, 1, 2, "view"),
        # C: view then purchase, never clicks: stage 1 only
        (3, 1, 1, "view"), (3, 1, 2, "purchase"),
        # D: purchase BETWEEN view and click: stages 1-2, not 3
        (4, 1, 1, "view"), (4, 1, 2, "purchase"), (4, 1, 3, "click"),
        # E: never views: no stage at all
        (5, 1, 1, "click"), (5, 1, 2, "purchase"),
    ]
    got = {
        r.stage: (r.stage_idx, r.n_users, r.conversion)
        for r in funnel_conversion(
            _events(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {
        "view": (1, 4, 1.0),
        "click": (2, 2, 0.5),
        "purchase": (3, 1, 0.5),
    }


def test_funnel_same_timestamp_not_counted(spark):
    # strict ordering: a click at EXACTLY the first-view timestamp
    # does not convert (ts > prev, not >=)
    rows = [(1, 1, 1, "view"), (1, 1, 1, "click")]
    got = {
        r.stage: r.n_users
        for r in funnel_conversion(
            _events(spark, rows), ["view", "click"]
        ).collect()
    }
    assert got == {"view": 1, "click": 0}


def test_cohort_retention_matrix(spark):
    rows = [
        # users 1,2 join day 1; user 1 returns day 2 and 3, user 2
        # returns day 3 only; user 3 joins day 2, never returns
        (1, 1, 1, "view"), (1, 2, 1, "view"), (1, 3, 1, "view"),
        (2, 1, 1, "view"), (2, 3, 1, "view"),
        (3, 2, 1, "view"),
        # same-day repeat events must not double-count (distinct)
        (1, 1, 5, "click"),
    ]
    got = {
        (r.cohort_day, r.day_offset): (
            r.n_users,
            r.cohort_size,
            r.retention,
        )
        for r in cohort_retention(_events(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 1): (1, 2, 0.5),
        ("2024-01-01", 2): (2, 2, 1.0),
        ("2024-01-02", 0): (1, 1, 1.0),
    }
