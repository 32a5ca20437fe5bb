"""Property tests for the session-6 analytics operators against
independent straight-line references: exact-rational z-test for
anomaly days and itertools market-basket rules on random inputs.
Seeded RNG — deterministic test corpora, not operator randomness.
"""

from __future__ import annotations

import random
from datetime import datetime
from fractions import Fraction

import tidb_lightning_release_4_0_spark.operators.curation as CU
import tidb_lightning_release_4_0_spark.operators.temporal as TP


def test_anomaly_days_matches_exact_rational_reference(spark):
    rng = random.Random(99)
    rows = []
    eid = 0
    per_user_days: dict[int, dict[int, int]] = {}
    for user in range(12):
        n_days = rng.randint(1, 9)
        days = {}
        for d in range(n_days):
            cnt = rng.choice([1, 2, 3, 5, 8, 20, 40])
            days[d + 1] = cnt
            for j in range(cnt):
                rows.append(
                    (eid, datetime(2024, 2, d + 1, 9, j % 60), user)
                )
                eid += 1
        per_user_days[user] = days
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    got = {
        (r.user_id, r.event_date)
        for r in TP.anomaly_days(df).collect()
    }
    # independent reference: exact rational mean/variance comparison
    # cnt > mean + 2*sigma  <=>  cnt - mean > 0 and
    # (cnt - mean)^2 > 4 * var   (all in Fractions)
    want = set()
    for user, days in per_user_days.items():
        n = len(days)
        if n < 2:
            continue
        cnts = list(days.values())
        mean = Fraction(sum(cnts), n)
        var = Fraction(sum(c * c for c in cnts), n) - mean * mean
        for d, cnt in days.items():
            dev = Fraction(cnt) - mean
            if dev > 0 and dev * dev > 4 * var:
                want.add((user, f"2024-02-{d:02d}"))
    assert got == want and want  # non-degenerate: some bursts exist


def test_market_basket_matches_brute_force(spark):
    import itertools

    rng = random.Random(5)
    baskets: dict[int, set[int]] = {}
    rows = []
    for bk in range(30):
        items = set(rng.sample(range(12), rng.randint(1, 5)))
        baskets[bk] = items
        for it in items:
            rows.append((bk, it))
            if rng.random() < 0.3:
                rows.append((bk, it))  # duplicates must dedupe
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        (r.item_a, r.item_b): (r.n_ab, r.conf_a_to_b, r.conf_b_to_a, r.lift)
        for r in CU.market_basket_pairs(df, min_support=2).collect()
    }
    # brute force
    n_total = len(baskets)
    supp: dict[int, int] = {}
    for items in baskets.values():
        for it in items:
            supp[it] = supp.get(it, 0) + 1
    want = {}
    for a, b in itertools.combinations(sorted(supp), 2):
        n_ab = sum(
            1 for items in baskets.values() if a in items and b in items
        )
        if n_ab >= 2:
            want[(a, b)] = (
                n_ab,
                round(n_ab / supp[a], 6),
                round(n_ab / supp[b], 6),
                round(n_ab * n_total / (supp[a] * supp[b]), 6),
            )
    assert set(got) == set(want) and want
    for key, (n_ab, ca, cb, lift) in want.items():
        g = got[key]
        assert g[0] == n_ab
        assert abs(g[1] - ca) < 1e-6 and abs(g[2] - cb) < 1e-6
        assert abs(g[3] - lift) < 1e-6
