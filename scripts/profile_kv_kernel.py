"""cProfile the kv_crc64 numpy kernel on the bench's exact lineitem
shape (11 columns, 2 secondary indexes, v1 rows) without Spark: build
the same (__h, __v_i, __null_i) pandas batch the pandas_udf receives
and profile kv_pairs_crc_np over it in bench-like Arrow batch sizes.

Usage: python scripts/profile_kv_kernel.py [batch_rows] [reps]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from tidb_lightning_release_4_0_spark.functions import kv_codec_np as K

    li = pd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    n = len(li)
    cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ]
    dtypes = [
        T.LongType(), T.LongType(), T.LongType(), T.IntegerType(),
        T.DoubleType(), T.DoubleType(), T.DoubleType(), T.DoubleType(),
        T.StringType(), T.StringType(), T.TimestampType(),
    ]
    pdf = pd.DataFrame({"__h": np.arange(1, n + 1, dtype=np.int64)})
    for i, c in enumerate(cols):
        if dtypes[i].typeName() == "timestamp":
            v = pd.Series(
                li[c].astype("datetime64[us]").astype(np.int64)
            )
        else:
            v = li[c]
        pdf[f"__v_{i}"] = v
        pdf[f"__null_{i}"] = np.zeros(n, bool)
    idx = [
        (1, [("l_partkey", None)], False),
        (2, [("l_orderkey", None), ("l_linenumber", None)], True),
    ]
    col_ids = list(range(1, len(cols) + 1))
    u64 = [False] * len(cols)
    wraps = [None] * len(cols)
    dur = [False] * len(cols)

    def run_all() -> None:
        for s in range(0, n, BATCH):
            b = pdf.iloc[s : s + BATCH]
            K.kv_pairs_crc_np(
                b, cols, dtypes, "__h", col_ids, 1, None, idx, 1,
                u64, wraps, dur,
            )

    run_all()  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.monotonic()
        run_all()
        ts.append(time.monotonic() - t0)
    print(f"rows={n} batch={BATCH} wall(s)={[round(t,3) for t in ts]}")

    pr = cProfile.Profile()
    pr.enable()
    run_all()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
