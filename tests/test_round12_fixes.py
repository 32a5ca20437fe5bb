"""Round-12 fixes: edge-case guards from the r11 ADVICE.

1. The fused ANN numpy path must survive an EMPTY query set with the
   same (empty) result as the SQL path — probe/tabs reshaping must
   stay rectangular at nq == 0 (ADVICE r11 #1: probe became a 1-D
   shape-(0,) array and probe[None, :, :] raised IndexError inside
   mapInPandas).
2. _concat_frags must keep its pre-r11 empty-input contract: a
   zero-row batch returns a (0, W) matrix instead of raising from
   lens.min()/lens.max() in the fixed-width fast branch (ADVICE r11
   #3).
"""

import numpy as np
from pyspark.sql import functions as F


def test_ann_numpy_empty_query_set_matches_sql(spark, sf_dir):
    import tidb_lightning_release_4_0_spark.operators.similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 0)  # empty by construction
    assert q.count() == 0
    for fn, kw in (
        (S.ann_topk_pq, {}),
        (S.ann_topk_ivfpq, {"n_cells": 8, "n_probe": 2}),
    ):
        sql_rows = fn(q, emb, k=5, **kw).collect()
        np_rows = fn(q, emb, k=5, encode="numpy", **kw).collect()
        assert sql_rows == [] and np_rows == []


def test_concat_frags_zero_rows():
    from tidb_lightning_release_4_0_spark.functions.kv_codec_np import (
        _concat_frags,
    )

    z = np.zeros(0, np.int64)
    # fixed-width part (the branch that called lens.min()/max()) plus
    # a variable-width part, both zero-row
    parts = [
        (np.zeros((0, 3), np.uint8), z),
        (np.zeros((0, 5), np.uint8), z),
    ]
    mat, total = _concat_frags(parts)
    assert mat.shape[0] == 0 and mat.dtype == np.uint8
    assert total.shape == (0,)


def test_concat_frags_zero_rows_matches_nonempty_dtype():
    from tidb_lightning_release_4_0_spark.functions.kv_codec_np import (
        _concat_frags,
    )

    mat, total = _concat_frags(
        [(np.zeros((0, 0), np.uint8), np.zeros(0, np.int64))]
    )
    assert mat.shape[0] == 0
    assert total.dtype == np.int64
