"""Multimodal columns: image/audio/video as opaque binary + metadata.

Beyond-reference operators (BASELINE.json north star). Design for
100 TB of media:

- A media column is ``binary`` payload + a typed metadata struct
  (mime, width/height or sample-rate, duration, byte length) — the
  payload stays opaque to Catalyst, metadata columns are prunable /
  filterable (partition elimination on mime, size predicates push
  into the scan).
- Decode / feature-extract / resize / frame-sample run as
  Arrow-batched ``mapInPandas`` kernels: per-batch numpy work, no
  per-row pickling, no shuffle (narrow transforms).
- The actual codecs (PIL/ffmpeg/soundfile) are NOT in this
  environment, so the codec step is pluggable: ``decoder=`` takes
  any bytes->ndarray callable. The default is a clearly-marked
  deterministic STUB (seeded from the payload hash) so the
  distributed plumbing — schema, batch shape, partitioning, UDF
  signatures — is real and testable end-to-end; swapping in a real
  decoder changes no plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", mime: str = "image/fake"
) -> DataFrame:
    """Derive the typed metadata struct from a raw binary column.

    Real deployments parse headers here (cheap, JVM-side length +
    magic bytes); the stub fills deterministic dimensions."""
    p = F.col(payload_col)
    h = F.conv(F.substring(F.md5(p.cast("string")), 1, 4), 16, 10).cast("int")
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            (F.pmod(h, F.lit(512)) + 16).alias("width"),
            (F.pmod(h + 7, F.lit(512)) + 16).alias("height"),
            F.length(p).cast("long").alias("n_bytes"),
        ),
    )


def _stub_decode(payload: bytes) -> np.ndarray:
    """STUB codec: deterministic fake 8x8x3 image seeded by content.

    Replace with e.g. ``PIL.Image.open(io.BytesIO(payload))`` when
    the codec libraries exist; the Spark plumbing is identical.
    """
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], np.ndarray] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """payload -> per-item feature vector (mean channel intensities +
    shape), via an Arrow-batched mapInPandas kernel.

    Output schema: (id, height, width, channels, mean_intensity,
    feature float[16]). One narrow stage; at 100 TB parallelism is
    the input partitioning (media files arrive as many objects)."""
    dec = decoder or _stub_decode
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("mean_intensity", T.DoubleType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )
    d = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, cs, means, feats = [], [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                arr = dec(bytes(payload) if payload is not None else b"")
                ids.append(i)
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                cs.append(arr.shape[2] if arr.ndim > 2 else 1)
                means.append(float(arr.mean()))
                flat = arr.astype(np.float32).ravel()
                # 16-bin intensity histogram as the toy feature
                hist, _ = np.histogram(flat, bins=16, range=(0, 256))
                feats.append((hist / max(flat.size, 1)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "id": ids, "height": hs, "width": ws, "channels": cs,
                    "mean_intensity": means, "feature": feats,
                }
            )

    return d.mapInPandas(kernel, schema=out_schema)


def resize_stub(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target: tuple[int, int] = (4, 4),
) -> DataFrame:
    """Decode -> resize -> re-encode skeleton. The resize itself is a
    numpy mean-pool on the stub array; a real codec slots into the
    same kernel."""
    th, tw = target
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("out_w", T.IntegerType()),
        ]
    )
    d = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, ohs, ows = [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                arr = _stub_decode(bytes(payload) if payload is not None else b"")
                h, w = arr.shape[0], arr.shape[1]
                fh, fw = max(h // th, 1), max(w // tw, 1)
                pooled = (
                    arr[: fh * th, : fw * tw]
                    .reshape(th, fh, tw, fw, -1)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                ids.append(i)
                blobs.append(pooled.tobytes())
                ohs.append(pooled.shape[0])
                ows.append(pooled.shape[1])
            yield pd.DataFrame(
                {"id": ids, "resized": blobs, "out_h": ohs, "out_w": ows}
            )

    return d.mapInPandas(kernel, schema=out_schema)


def frame_sample_stub(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 8,
    max_frames: int = 4,
) -> DataFrame:
    """Video frame-sampling skeleton: treat the payload as a frame
    sequence, keep every ``every_n``-th frame up to ``max_frames``,
    emit one row per kept frame with a per-frame feature vector.

    The container has no video codec, so frames are derived from the
    stub decoder deterministically (each "frame" is a byte slice);
    a real decoder (pyav/ffmpeg) slots into the same kernel without
    touching the Spark plan. One input row fans out to ≤max_frames
    output rows — at 100 TB the explode happens inside the Arrow
    batch, never on the driver."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("feature", T.BinaryType()),
        ]
    )
    d = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                # stub: fixed-size pseudo-frames over the byte stream
                frame_bytes = 64
                n_frames = max(len(raw) // frame_bytes, 1)
                kept = list(range(0, n_frames, every_n))[:max_frames]
                for k in kept:
                    frame = raw[k * frame_bytes : (k + 1) * frame_bytes]
                    arr = _stub_decode(frame)
                    ids.append(i)
                    idxs.append(k)
                    feats.append(
                        np.asarray(
                            [arr.mean(), arr.std(), arr.min(), arr.max()],
                            dtype=np.float32,
                        ).tobytes()
                    )
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "feature": feats}
            )

    return d.mapInPandas(kernel, schema=out_schema)
