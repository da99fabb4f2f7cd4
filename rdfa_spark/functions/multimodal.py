"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages.  Decoders:

* ``decoder="fake"`` (default) — deterministic md5-driven
  pseudo-decode exercising the full Spark plumbing (schema, batching,
  UDF signature) for any payload;
* ``decoder="real"`` — the pure-stdlib codecs in ``codecs.py``: PNG
  full pixel decode + 4x4 luminance-grid feature, WAV full sample
  decode + 16-bin RMS feature, JPEG/GIF/WebP/MP4 dims-level metadata
  (MP4 via the ISO-BMFF box walk: dims, frame count, duration);
  formats the sniffer can't identify raise NotImplementedError at
  the decode site — swap in PIL/ffmpeg there on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, IntegerType,
                               StringType, StructField, StructType)

ASSET_SCHEMA = StructType([
    StructField("asset_id", StringType(), False),
    StructField("kind", StringType(), True),       # image|audio|video
    StructField("payload", StringType(), True),    # binary in real data
    StructField("mime", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", StringType(), False),
    StructField("kind", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("feature", ArrayType(FloatType()), True),
])


def _fake_decode(payload: bytes, kind: str):
    """Deterministic pseudo-decode: dimensions and a 16-dim feature
    vector derived from md5(payload).  Replaces PIL/ffmpeg in this
    container; the Spark-side contract (shapes, schema, batch flow)
    is identical to a real decoder."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    n_frames = 1 if kind == "image" else 1 + h[2] % 32
    feat = [((h[i % 16] * 31 + i) % 255) / 255.0 for i in range(16)]
    return width, height, n_frames, feat


def extract_features(assets: DataFrame,
                     decoder: str = "fake",
                     on_unsupported: str = "raise") -> DataFrame:
    """binary assets -> (dims, frame count, feature vector).

    ``on_unsupported`` governs the real decoder's behaviour on
    formats the sniffer can't identify: ``"raise"`` keeps the
    honest-stub failure; ``"skip"`` drops the row but counts it
    in the ``result.skipped_assets`` accumulator — skipped work is
    always measurable, never silent (the ``extract_all`` discipline).
    Null payloads are counted under the same accumulator."""
    skip_acc = assets.sparkSession.sparkContext.accumulator(0)

    def batches(it: Iterator[pd.DataFrame]):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = r.payload
                if payload is None:
                    skip_acc.add(1)
                    continue
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                if decoder == "fake":
                    w, hgt, nf, feat = _fake_decode(bytes(payload),
                                                    r.kind)
                else:
                    from .codecs import real_decode
                    try:
                        w, hgt, nf, feat = real_decode(bytes(payload),
                                                       r.kind)
                    except NotImplementedError:
                        if on_unsupported == "raise":
                            raise
                        skip_acc.add(1)
                        continue
                rows.append((r.asset_id, r.kind, w, hgt, nf, feat))
            yield pd.DataFrame(rows, columns=[
                f.name for f in FEATURE_SCHEMA.fields])

    out = assets.select("asset_id", "kind", "payload") \
                .mapInPandas(batches, FEATURE_SCHEMA)
    out.skipped_assets = skip_acc
    return out


THUMBNAIL_SCHEMA = StructType([
    StructField("asset_id", StringType(), False),
    StructField("thumb_w", IntegerType(), True),
    StructField("thumb_h", IntegerType(), True),
    StructField("thumb", ArrayType(FloatType()), True),  # row-major
])


def resize_images(assets: DataFrame, out_w: int = 8, out_h: int = 8,
                  decoder: str = "fake") -> DataFrame:
    """Image resize stage: decode -> nearest-neighbour downscale ->
    row-major luminance thumbnail (the embedding-ready small image).

    ``decoder='real'`` uses the stdlib PNG pixel decoder
    (codecs.decode_png + resize_gray); non-PNG payloads are skipped
    (dims-only formats have no pixels to resize) but counted in the
    ``result.skipped_assets`` accumulator (read ``.value`` after an
    action) — skips are measurable, never silent.  ``'fake'`` emits a
    deterministic md5-derived thumbnail for any payload, exercising
    the identical Spark plumbing."""
    skip_acc = assets.sparkSession.sparkContext.accumulator(0)

    def batches(it: Iterator[pd.DataFrame]):
        from .codecs import decode_png, resize_gray, sniff_format
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = r.payload
                if r.kind != "image":
                    continue           # non-images are out of scope,
                    # not "skipped work" — no metric
                if payload is None:
                    skip_acc.add(1)
                    continue
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                payload = bytes(payload)
                if decoder == "fake":
                    h = hashlib.md5(payload).digest()
                    thumb = [((h[(x + y) % 16] * 17 + x * out_h + y)
                              % 255) / 255.0
                             for y in range(out_h)
                             for x in range(out_w)]
                else:
                    if sniff_format(payload) != "png":
                        skip_acc.add(1)
                        continue
                    w, hgt, gray = decode_png(payload)
                    small = resize_gray(gray, w, hgt, out_w, out_h)
                    thumb = [float(v) for row in small for v in row]
                rows.append((r.asset_id, out_w, out_h, thumb))
            yield pd.DataFrame(rows, columns=[
                f.name for f in THUMBNAIL_SCHEMA.fields])

    out = assets.select("asset_id", "kind", "payload") \
                .mapInPandas(batches, THUMBNAIL_SCHEMA)
    out.skipped_assets = skip_acc
    return out


def frame_sample(features: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plan for video assets: one row per sampled
    frame index (pure relational explode — the heavy decode happens
    downstream per sampled frame only).

    A video whose ``n_frames`` is NULL would be dropped silently by
    ``explode`` (sequence(NULL) is NULL); instead those assets are
    reported via ``result.skipped_assets`` — a DataFrame of
    (asset_id) rows, same no-silent-drops discipline as
    ``extract_features``/``resize_images`` (here a DataFrame rather
    than an accumulator because the whole stage is relational — no
    Python task code for an accumulator to live in)."""
    vids = features.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0),
                     F.greatest(F.col("n_frames") - 1, F.lit(0)),
                     F.lit(every_n))
    out = (vids.filter(F.col("n_frames").isNotNull())
           .select("asset_id", F.explode(idx).alias("frame_idx")))
    out.skipped_assets = (vids.filter(F.col("n_frames").isNull())
                          .select("asset_id"))
    return out
