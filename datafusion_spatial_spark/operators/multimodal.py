"""Multimodal (image/audio/video) column handling.

Model: media is an opaque ``binary`` column plus typed metadata
(mime/width/height/duration), exactly like geometry is binary-plus-metadata
(SURVEY §1.2) — no custom types. Decode / feature-extract run as
Arrow-batched ``mapInPandas`` stages so each partition streams batches
through Python once; at 100 TB this is the same map-only shape as any other
scan→transform stage, and the binary payload never shuffles unless the user
joins on it (don't — join on content hash).

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are stubbed: ``decode=`` defaults to a clearly-marked
deterministic fake that derives features from the bytes, keeping schema,
batching, and partitioning real and testable. Swap in a real decoder by
passing ``decode=my_fn`` — the Spark-side plumbing is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def _fake_decode_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode→embed kernel: derives ``n``
    floats in [0,1) from a sha256 of the payload. NOT a real decoder."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(n)]


def real_decode_unavailable(payload: bytes):  # pragma: no cover
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "pass decode=<callable> backed by PIL/librosa/ffmpeg"
    )


def resolve_decoder(
    kind: str = "image", n_features: int = 8
) -> tuple[Callable[[bytes], list[float]], bool]:
    """Optional-extra codec wiring: probe the real codec library for
    ``kind`` at build time (driver side) and return ``(decode_fn,
    is_real)``. Falls back to the deterministic fake when the library is
    not importable, so pipelines and CI stay hermetic with identical
    schema/batching — only the feature VALUES differ. Content-hash dedup
    (media_content_dedup) is payload-only and hashes identically either
    way.

    kinds: ``image`` (PIL), ``audio`` (soundfile), ``video`` (av).
    """
    if kind == "image":
        try:
            from PIL import Image  # noqa: F401
        except ImportError:
            return (lambda b: _fake_decode_features(b, n_features)), False

        def decode_image(b: bytes) -> list[float]:
            import io as _io

            from PIL import Image

            im = Image.open(_io.BytesIO(b)).convert("RGB")
            w, h = im.size
            # fixed 8-slot layout, padded/truncated to n_features:
            # [w/4096, h/4096, mean_r, mean_g, mean_b, extrema spread rgb]
            small = im.resize((16, 16))
            px = list(small.getdata())
            n = len(px)
            means = [sum(c[i] for c in px) / (255.0 * n) for i in range(3)]
            spread = [
                (max(c[i] for c in px) - min(c[i] for c in px)) / 255.0
                for i in range(3)
            ]
            feats = [w / 4096.0, h / 4096.0, *means, *spread]
            feats = feats[:n_features]
            return feats + [0.0] * (n_features - len(feats))

        return decode_image, True
    if kind == "audio":
        try:
            import soundfile  # noqa: F401
        except ImportError:
            return (lambda b: _fake_decode_features(b, n_features)), False

        def decode_audio(b: bytes) -> list[float]:
            import io as _io

            import numpy as np
            import soundfile as sf

            data, rate = sf.read(_io.BytesIO(b), always_2d=True)
            mono = data.mean(axis=1)
            feats = [
                rate / 96_000.0,
                len(mono) / max(rate, 1) / 3600.0,
                float(np.abs(mono).mean()),
                float(mono.std()),
                float(np.abs(np.diff(mono)).mean()) if len(mono) > 1 else 0.0,
            ]
            feats = feats[:n_features]
            return feats + [0.0] * (n_features - len(feats))

        return decode_audio, True
    if kind == "video":
        try:
            import av  # noqa: F401
        except ImportError:
            return (lambda b: _fake_decode_features(b, n_features)), False

        def decode_video(b: bytes) -> list[float]:
            import io as _io

            import av as _av

            with _av.open(_io.BytesIO(b)) as container:
                stream = container.streams.video[0]
                frame = next(container.decode(stream))
                arr = frame.to_ndarray(format="rgb24")
                feats = [
                    stream.width / 4096.0,
                    stream.height / 4096.0,
                    float(arr.mean()) / 255.0,
                    float(arr.std()) / 255.0,
                    float(stream.frames) / 1e6,
                ]
            feats = feats[:n_features]
            return feats + [0.0] * (n_features - len(feats))

        return decode_video, True
    raise ValueError(f"unknown media kind {kind!r}; image|audio|video")


def with_media_features(
    df: DataFrame,
    binary_col: str,
    out_col: str = "features",
    n_features: int = 8,
    decode: Callable[[bytes], list[float]] | str | None = None,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Append ``out_col: array<double>`` extracted from a binary media
    column via ``mapInPandas`` (per-partition Arrow batch iterator).

    ``decode`` may be a callable, or a kind string (``"image"`` /
    ``"audio"`` / ``"video"``) resolved through :func:`resolve_decoder` —
    real codec when the optional library is importable, deterministic
    fake otherwise. ``None`` keeps the fake (hermetic default)."""
    if isinstance(decode, str):
        decode, _ = resolve_decoder(decode, n_features)
    decode = decode or (lambda b: _fake_decode_features(b, n_features))
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def safe(b):
            # null-on-failure, like simsearch.pq_encode: one corrupt
            # payload (truncated image, bad container) must not kill the
            # stage once a real codec is plugged in — at corpus scale
            # corrupt rows are a certainty, not an edge case
            if b is None:
                return None
            try:
                return decode(bytes(b))
            except Exception:
                return None

        for pdf in batches:
            pdf[out_col] = pdf[binary_col].map(safe)
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)


def media_content_dedup(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Exact media dedup on content hash — hash JVM-side (sha2 built-in) so
    only (hash, id) shuffles, never payloads."""
    return (
        df.withColumn("__h", F.sha2(F.col(binary_col), 256))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("copies"))
        .drop("__h")
    )


def frame_sample_plan(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Explode a video row into per-frame-sample rows (timestamps only —
    decode happens downstream in with_media_features). Pure Catalyst
    sequence+explode; the payload column is carried by reference."""
    # NULL or non-positive duration -> no samples, but the row SURVIVES
    # with sample_ms NULL (explode would silently delete it; a 0-length
    # video must not emit a phantom t=0 sample either — r7 review fix)
    seq = F.when(
        F.col(duration_col) > 0,
        F.sequence(F.lit(0), F.col(duration_col) - 1, F.lit(every_ms)),
    )
    return df.select(
        F.col(id_col),
        F.col(binary_col),
        F.explode_outer(seq).alias("sample_ms"),
    )
