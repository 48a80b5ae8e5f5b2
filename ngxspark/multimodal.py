"""Multimodal column plumbing: opaque binary media + typed metadata.

Decode is a two-tier dispatch (round-6): payloads whose magic bytes mark
a really-decodable format (PNG, 16-bit WAV — stdlib+numpy kernels in
mediacodec.py, with PIL/soundfile slotting in when importable) get a REAL
decode + feature extraction; anything else falls back to ``decode_stub``
(deterministic fake), so the pipeline never fails on decoder
availability and the md5-derived gate corpus keeps its exact hashes.
Everything Spark-side is real and tested: schema, Arrow batch shape,
``mapInPandas`` partitioning, metadata extraction, frame-sampling
fan-out. Video decode stays stubbed (no public-stdlib container parser).

At scale: media bytes stay in parquet/Iceberg binary columns; decode
happens executor-side per Arrow batch; metadata-only queries never touch
the bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

# Real PNG/WAV kernels are stdlib+numpy (always available); this flag now
# reports the OPTIONAL extra-format tier (PIL for JPEG etc.).
from ngxspark.mediacodec import HAVE_PIL as REAL_DECODERS_AVAILABLE  # noqa: F401
from ngxspark.mediacodec import decode_feature_real


def _md5_mod(rid, salt: str, mod: int):
    """Deterministic small int from md5(id:salt) — reproducible in ANY
    engine (DuckDB oracle included), unlike xxhash64."""
    return (
        F.conv(F.substring(F.md5(F.concat(rid.cast("string"), F.lit(":" + salt))), 1, 8), 16, 10)
        .cast("long")
        % mod
    )


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from any id column (payload = repeated
    md5 bytes; sizes md5-derived so the DuckDB oracle reproduces every
    column). Stands in for a real binary ingest."""
    rid = F.col(id_col)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (_md5_mod(rid, "kind", 3) + 1).cast("int"),
    )
    payload = F.to_binary(F.repeat(F.md5(rid.cast("string")), 8), F.lit("hex"))
    return df.select(
        rid.alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        (_md5_mod(rid, "w", 1920) + 16).cast("int").alias("width"),
        (_md5_mod(rid, "h", 1080) + 16).cast("int").alias("height"),
        _md5_mod(rid, "d", 60000).cast("int").alias("duration_ms"),
    )


def synthesize_real_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media table: even ids → actual PNG bytes
    (gradient + id-seeded noise image), odd ids → actual 16-bit WAV bytes
    (id-pitched sine + noise). Executor-side encode via mapInPandas —
    at scale this models binary ingest where payloads are produced by an
    upstream system; encode cost is O(pixels|samples) per row, no
    shuffle. Used by tests to exercise the real decode tier end-to-end."""
    import numpy as np

    from ngxspark.mediacodec import encode_png, encode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                rng = np.random.default_rng(mid)  # deterministic per id
                if mid % 2 == 0:
                    w, h = 24 + mid % 17, 16 + mid % 13
                    yy, xx = np.mgrid[0:h, 0:w]
                    img = np.stack(
                        [
                            (xx * 255 // max(w - 1, 1)),
                            (yy * 255 // max(h - 1, 1)),
                            rng.integers(0, 256, (h, w)),
                        ],
                        axis=2,
                    ).astype(np.uint8)
                    payload, kind, mime = encode_png(img), "image", "image/png"
                    width, height, dur = w, h, None
                else:
                    rate = 8000
                    n = 800 + (mid % 7) * 160
                    t = np.arange(n) / rate
                    sig = 0.5 * np.sin(2 * np.pi * (220 + mid % 200) * t)
                    sig = sig + 0.05 * rng.standard_normal(n)
                    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
                    payload, kind, mime = encode_wav(pcm, rate), "audio", "audio/wav"
                    width, height, dur = None, None, int(n * 1000 / rate)
                rows.append((mid, kind, payload, mime, width, height, dur))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "payload",
                    "mime",
                    "width",
                    "height",
                    "duration_ms",
                ],
            )

    return df.select(F.col(id_col)).mapInPandas(batches, MEDIA_SCHEMA)


def decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake 'decode + feature extract'.

    A production container would dispatch to a real decoder here (PIL /
    torchaudio / pyav — see REAL_DECODERS_AVAILABLE); the stub stays the
    fallback so the pipeline never fails on decoder availability.
    """
    # 8-dim feature from byte statistics — deterministic, shape-stable
    n = len(payload)
    return [float(payload[i % n]) / 255.0 if n else 0.0 for i in range(8)]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas over Arrow batches: bytes → fixed-dim feature vectors.

    Column pruning matters: select only (media_id, kind, payload) into the
    Python exchange; metadata stays JVM-side.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # zip over the raw columns, not pdf.apply(axis=1): apply builds
            # a pandas Series object per row (~10× slower per batch) — a
            # trap real decoders must not inherit
            feats = [
                decode_feature_real(p) or decode_stub(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )
            yield out

    return df.select("media_id", "kind", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling fan-out: one row per sampled frame timestamp.
    The actual frame decode is the stubbed kernel; the explode/fan-out
    shape (the scale-relevant part) is real."""
    frames = F.sequence(
        F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0))
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ix"), "duration_ms")
        .withColumn("frame_ts_ms", F.col("frame_ix") * every_ms)
    )
