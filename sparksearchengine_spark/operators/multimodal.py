"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond the reference's text-only scope (SURVEY §2.9): a 100 TB training
pipeline carries media columns. Design:

* media is an opaque ``binary`` column plus a typed metadata struct —
  Parquet stores binaries page-compressed, and metadata predicates
  (mime, width, duration) push down WITHOUT touching the bytes;
* decode / resize / frame-sample / feature-extract run as Arrow-batched
  ``mapInPandas`` stages — one Python worker per partition, bytes never
  pass through the driver;
* the actual codec step is environment-dependent: ``codec="real"``
  import-tries the optional dependency (PIL for images, soundfile for
  audio, pyav for video) and decodes with it when installed, raising a
  clear NotImplementedError when it isn't; ``codec="fake"`` is a
  deterministic bytes->array expansion that works everywhere and is the
  contract the tests and oracles pin. The Spark-side plumbing — schemas,
  batch iteration, partition behavior — is identical either way.

Per-modality metadata schema (nullable where not applicable):

    media_meta: struct<mime string, width int, height int, n_channels int,
                       sample_rate int, duration_ms bigint, n_frames int>
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("n_frames", IntegerType()),
    ]
)


def media_meta_expr(
    mime: Column,
    width: Column | None = None,
    height: Column | None = None,
    n_channels: Column | None = None,
    sample_rate: Column | None = None,
    duration_ms: Column | None = None,
    n_frames: Column | None = None,
) -> Column:
    """Build the typed metadata struct from whatever is known."""
    null_i = F.lit(None).cast("int")
    return F.struct(
        mime.alias("mime"),
        (width if width is not None else null_i).alias("width"),
        (height if height is not None else null_i).alias("height"),
        (n_channels if n_channels is not None else null_i).alias("n_channels"),
        (sample_rate if sample_rate is not None else null_i).alias("sample_rate"),
        (
            duration_ms if duration_ms is not None else F.lit(None).cast("bigint")
        ).alias("duration_ms"),
        (n_frames if n_frames is not None else null_i).alias("n_frames"),
    )


def read_media_dir(spark, path: str, mime: str = "application/octet-stream") -> DataFrame:
    """Binary-file source: (doc_id, content binary, media_meta).

    ``binaryFile`` is Spark's built-in scale path for blob ingestion
    (splittable listing, per-file rows); doc_id = xxhash of the path so ids
    are stable across re-reads (unlike monotonically_increasing_id)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("path"),
        F.col("content"),
        media_meta_expr(F.lit(mime)).alias("media_meta"),
    )


# --------------------------------------------------------------------------
# the codec seam: one function per modality, stubbed
# --------------------------------------------------------------------------


def _fake_decode(content: bytes, n: int) -> list[float]:
    """Deterministic bytes -> n floats in [0,1): repeated sha256 expansion.
    Stands in for a real pixel/sample decode in tests.

    The chain runs over HEX digests (block_{i+1} = sha256(hex(block_i))),
    not raw digest bytes, so the exact same expansion is expressible in
    engines whose sha256 only accepts strings (DuckDB's VARCHAR-only
    sha256) — that makes the fake codec oracle-checkable end to end.
    Every emitted float is byte/256.0, exactly representable in float32.
    """
    out: list[float] = []
    block = hashlib.sha256(content or b"").hexdigest()
    while len(out) < n:
        block = hashlib.sha256(block.encode("ascii")).hexdigest()
        out.extend(int(block[i : i + 2], 16) / 256.0 for i in range(0, 64, 2))
    return out[:n]


def _decode_image_bytes(content: bytes, codec: str) -> tuple[int, int, int, list[float]]:
    """-> (width, height, n_channels, flat pixels in [0,1]).

    ``codec="real"`` decodes with PIL when it is installed (optional
    dependency — import-tried per call so executors without the lib fail
    with a clear NotImplementedError, not an ImportError mid-batch);
    ``codec="fake"`` stays the deterministic contract tests rely on.
    """
    if codec == "fake":
        w, h, c = 8, 8, 3
        return w, h, c, _fake_decode(content, w * h * c)
    if codec == "real":
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "codec='real' requires PIL (pip install pillow); it is not "
                "installed here — pass codec='fake' for the deterministic "
                "test codec"
            ) from e
        import io

        import numpy as np

        img = Image.open(io.BytesIO(content)).convert("RGB")
        w, h = img.size
        arr = np.asarray(img, dtype=np.float32) / 255.0  # (h, w, 3)
        return w, h, 3, arr.ravel().tolist()
    raise ValueError(f"unknown codec {codec!r} (use 'fake' or 'real')")


def _decode_audio_bytes(content: bytes, codec: str) -> tuple[int, int, list[float]]:
    """-> (sample_rate, n_samples, samples in [-1,1]). Same optional-
    dependency contract as :func:`_decode_image_bytes`, with soundfile."""
    if codec == "fake":
        sr, n = 16000, 64
        return sr, n, [x * 2.0 - 1.0 for x in _fake_decode(content, n)]
    if codec == "real":
        try:
            import soundfile
        except ImportError as e:
            raise NotImplementedError(
                "codec='real' requires soundfile (pip install soundfile); "
                "it is not installed here — pass codec='fake' for the "
                "deterministic test codec"
            ) from e
        import io

        data, sr = soundfile.read(io.BytesIO(content), dtype="float32")
        if getattr(data, "ndim", 1) > 1:
            data = data.mean(axis=1)  # downmix to mono
        # tolist(), not a per-sample Python loop: a 10-minute 44.1 kHz
        # file is ~26M samples — boxing each float individually costs
        # seconds and hundreds of MB of transient objects (r3 review)
        return int(sr), len(data), data.tolist()
    raise ValueError(f"unknown codec {codec!r} (use 'fake' or 'real')")


# --------------------------------------------------------------------------
# Spark-side operators (real plumbing, batched, distributed)
# --------------------------------------------------------------------------

_IMG_DECODE_SCHEMA = "doc_id bigint, width int, height int, n_channels int, pixels array<float>"


def _resize_pixels(px, w, h, c, out_w, out_h):
    """Nearest-neighbor resize of one flat pixel row — the ONE
    implementation behind both :func:`resize_images` and
    ``decode_images(resize_to=...)``, so fused == composed by
    construction."""
    import numpy as np

    arr = np.asarray(px, dtype=np.float32).reshape(int(h), int(w), int(c))
    ys = (np.arange(out_h) * h // out_h).astype(int)
    xs = (np.arange(out_w) * w // out_w).astype(int)
    return arr[np.ix_(ys, xs)].ravel().tolist()


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    codec: str = "fake",
    resize_to: "tuple[int, int] | None" = None,
) -> DataFrame:
    """Decode image bytes -> (doc_id, width, height, n_channels, pixels).

    mapInPandas: each Arrow batch of (id, bytes) rows is decoded in one
    Python worker call; partitioning is inherited from the input (no
    shuffle). Flat ``pixels`` + dims rather than nested arrays keeps the
    Arrow transfer a single contiguous buffer per row.

    ``resize_to=(width, height)`` FUSES the resize into the same pandas
    pass (same Arrow-crossing economics as the crawl path's
    ``warc_outlink_edges``, r11): a decoded native-resolution frame is
    ~W*H*C floats per row, and the composed ``decode_images`` ->
    ``resize_images`` pipeline ships that across Arrow once out and
    once back in just to throw most of it away — at 100 TB of media
    that is the dominant byte flow. Fused, only the target-size pixels
    ever cross. ``resize_images`` stays as the general surface for
    already-decoded frames; both call the same ``_resize_pixels``, so
    fused == composed (pinned in tests).
    """
    if resize_to is not None:
        out_w, out_h = int(resize_to[0]), int(resize_to[1])
        if out_w < 1 or out_h < 1:
            raise ValueError(f"resize_to must be >= 1x1, got {resize_to}")

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, content in zip(pdf[id_col], pdf[content_col]):
                w, h, c, px = _decode_image_bytes(bytes(content or b""), codec)
                if resize_to is not None:
                    px = _resize_pixels(px, w, h, c, out_w, out_h)
                    w, h = out_w, out_h
                rows.append((int(did), w, h, c, px))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_channels", "pixels"]
            )

    return df.select(id_col, content_col).mapInPandas(
        decode, schema=_IMG_DECODE_SCHEMA
    )


def resize_images(
    decoded: DataFrame, width: int, height: int
) -> DataFrame:
    """Nearest-neighbor resize over decoded pixel rows (pure pandas/numpy in
    mapInPandas — no image library needed once pixels exist)."""

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                c = int(r.n_channels)
                out = _resize_pixels(
                    r.pixels, r.width, r.height, c, width, height
                )
                rows.append((int(r.doc_id), width, height, c, out))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_channels", "pixels"]
            )

    return decoded.mapInPandas(resize, schema=_IMG_DECODE_SCHEMA)


def image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    dim: int = 32,
    codec: str = "fake",
) -> DataFrame:
    """(doc_id, embedding array<float>) — decode + pool in one pass.

    The embedding is a channel-wise mean/std pool over decoded pixels (a
    stand-in for a CNN/CLIP forward; swap the pool for a model call at the
    same seam). Output feeds operators/similarity.py directly.
    """

    def featurize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, embs = [], []
            for did, content in zip(pdf[id_col], pdf[content_col]):
                w, h, c, px = _decode_image_bytes(bytes(content or b""), codec)
                arr = np.asarray(px, dtype=np.float32).reshape(h, w, c)
                pooled: list[float] = []
                # per-channel mean/std + coarse 2x2 spatial means, tiled to dim
                for ch in range(c):
                    a = arr[:, :, ch]
                    m = float(a.mean())
                    pooled += [m, float(a.std())]
                    pooled += [
                        # a 1-pixel-wide/tall real image has empty 2x2
                        # quadrants; their mean is NaN and would poison
                        # downstream cosine/LSH — fall back to the
                        # channel mean (r3 review)
                        float(q.mean()) if q.size else m
                        for q in (
                            a[: h // 2, : w // 2], a[: h // 2, w // 2:],
                            a[h // 2:, : w // 2], a[h // 2:, w // 2:],
                        )
                    ]
                vec = (pooled * (dim // len(pooled) + 1))[:dim]
                ids.append(int(did))
                embs.append(vec)
            yield pd.DataFrame({"doc_id": ids, "embedding": embs})

    return df.select(id_col, content_col).mapInPandas(
        featurize,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        ),
    )


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    every_n: int = 10,
    codec: str = "fake",
) -> DataFrame:
    """Video -> (doc_id, frame_idx, frame_bytes): keep every n-th frame.

    The fake codec treats the binary as a concatenation of fixed 64-byte
    frames; the real seam is an ffmpeg/pyav demux loop with identical batch
    shape. One input row fans out to many output rows (mapInPandas handles
    1->N naturally; a row-at-a-time UDF could not).
    """

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        frame_size = 64
        for pdf in batches:
            rows = []
            for did, content in zip(pdf[id_col], pdf[content_col]):
                if codec == "real":
                    try:
                        import av  # noqa: F401  (optional dependency)
                    except ImportError as e:
                        raise NotImplementedError(
                            "codec='real' requires pyav (pip install av); "
                            "it is not installed here — pass codec='fake'"
                        ) from e
                    raise NotImplementedError(
                        "real video demux seam: wire av.open(BytesIO(...))"
                        ".decode(video=0) here with the same output shape"
                    )
                if codec != "fake":
                    raise ValueError(f"unknown codec {codec!r}")
                data = bytes(content or b"")
                n_frames = max(len(data) // frame_size, 0)
                for i in range(0, n_frames, every_n):
                    rows.append(
                        (int(did), i, data[i * frame_size:(i + 1) * frame_size])
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return df.select(id_col, content_col).mapInPandas(
        sample,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("frame_idx", IntegerType()),
                StructField("frame_bytes", BinaryType()),
            ]
        ),
    )


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    n_bands: int = 16,
    codec: str = "fake",
) -> DataFrame:
    """(doc_id, sample_rate, duration_ms, embedding): banded RMS energies
    over decoded samples (stand-in for a mel filterbank)."""

    def featurize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, content in zip(pdf[id_col], pdf[content_col]):
                sr, n, samples = _decode_audio_bytes(bytes(content or b""), codec)
                a = np.asarray(samples, dtype=np.float32)
                bands = np.array_split(a, n_bands)
                emb = [float(np.sqrt((b**2).mean())) if b.size else 0.0 for b in bands]
                rows.append((int(did), sr, int(n * 1000 / sr), emb))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "duration_ms", "embedding"],
            )

    return df.select(id_col, content_col).mapInPandas(
        featurize,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("sample_rate", IntegerType()),
                StructField("duration_ms", LongType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        ),
    )
