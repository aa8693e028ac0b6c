"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (documented; `decode_real` raises NotImplementedError
until a codec is provisioned) — but the Spark-side plumbing is real and
tested: schemas, mapInPandas batch shapes, feature-vector extraction, and
frame sampling, exactly as a production decoder would slot in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])


def synth_media(pages: DataFrame) -> DataFrame:
    """Deterministic fake media column derived from the page url — gives
    the plumbing real bytes with a stable content hash."""
    return pages.select(
        "url",
        F.expr("ELEMENT_AT(ARRAY('image','audio','video'), CAST(LENGTH(url) % 3 AS INT) + 1)").alias("media_type"),
        F.expr("CAST(REPEAT(SUBSTRING(url, -8, 8), 16) AS BINARY)").alias("payload"),
        F.lit(64).alias("width"), F.lit(48).alias("height"),
        F.expr("CAST(LENGTH(url) % 7 + 1 AS INT)").alias("n_frames"),
    )


def decode_real(payload: bytes, media_type: str):
    """Real codec hook — intentionally unimplemented in this container."""
    raise NotImplementedError(
        "no image/audio codecs in this environment; production deployments "
        "plug Pillow/ffmpeg here — the surrounding Spark plumbing is final")


_FEAT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic fake feature extractor: byte-histogram of the payload,
    L1-normalized, as array<double>[dim].  Vectorized per Arrow batch; the
    schema/batch contract is what a real embedding model would use."""

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                total = hist.sum() or 1.0
                feats.append(np.round(hist / total, 6).tolist())
            yield pd.DataFrame({"url": pdf["url"], "media_type": pdf["media_type"],
                                "feature": feats})

    return media.select("url", "media_type", "payload").mapInPandas(run, _FEAT_SCHEMA)


_RESIZE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("out_w", T.IntegerType()),
    T.StructField("out_h", T.IntegerType()),
    T.StructField("raster", T.ArrayType(T.DoubleType())),
])


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 6) -> DataFrame:
    """Nearest-neighbor image resize over image rows.  The DECODE step is
    the documented sandbox fake (payload bytes tiled row-major to the
    declared width x height grayscale raster — decode_real is where a
    Pillow decode slots in); the RESIZE math — target-pixel -> source-pixel
    index mapping via floor(i * src / dst), then a fancy-indexed gather —
    is real numpy and applies unchanged to a real decoded array.  Output
    raster is the row-major flattened out_h x out_w array, /255."""

    def run(it):
        for pdf in it:
            imgs = pdf[pdf["media_type"] == "image"]
            if len(imgs) == 0:
                continue
            urls, rasters = [], []
            for r in imgs.itertuples():
                data = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                need = int(r.width) * int(r.height)
                if data.size == 0 or need <= 0:
                    # degenerate row (empty payload / zero dims): zero-fill
                    # instead of crashing the whole task (review r3)
                    urls.append(r.url)
                    rasters.append([0.0] * (out_w * out_h))
                    continue
                reps = -(-need // data.size)
                img = np.tile(data, reps)[:need].reshape(int(r.height), int(r.width))
                rows = (np.arange(out_h) * img.shape[0]) // out_h
                cols = (np.arange(out_w) * img.shape[1]) // out_w
                small = img[rows][:, cols].astype(np.float64) / 255.0
                urls.append(r.url)
                rasters.append(np.round(small.ravel(), 6).tolist())
            yield pd.DataFrame({
                "url": urls,
                "out_w": pd.array([out_w] * len(urls), dtype="int32"),
                "out_h": pd.array([out_h] * len(urls), dtype="int32"),
                "raster": rasters})

    return media.mapInPandas(run, _RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("frame_no", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video rows: emit every ``every``-th frame index
    with a deterministic fake frame payload (slice of the source bytes).
    Row-multiplying mapInPandas — the real decoder keeps this exact shape."""

    def run(it):
        for pdf in it:
            vids = pdf[pdf["media_type"] == "video"]
            if len(vids) == 0:
                continue
            urls, nos, frames = [], [], []
            for r in vids.itertuples():
                data = bytes(r.payload)
                for fno in range(0, int(r.n_frames), every):
                    urls.append(r.url)
                    nos.append(fno)
                    lo = (fno * 16) % max(len(data) - 16, 1)
                    frames.append(data[lo:lo + 16])
            yield pd.DataFrame({"url": urls, "frame_no": pd.array(nos, dtype="int32"),
                                "frame": frames})

    return media.mapInPandas(run, _FRAME_SCHEMA)


_PHASH_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("phash", T.LongType()),
])

# dHash geometry: 9 columns x 7 rows -> 8 column comparisons per row,
# 56 bits total.  56 (not the classical 64) keeps the hash strictly
# positive in a BIGINT: bit 63 would overflow Spark's ANSI CAST and force
# two's-complement gymnastics into every SQL twin.  Width 9 (not 8) because
# a power-of-two output width samples only source columns = 0 (mod 8) on
# the sandbox fake's period-8 payload and the hash would be constant
# (the multimodal_resize out_w=7 lesson).
PHASH_W, PHASH_H = 9, 7


def image_phash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: decode -> nearest-
    neighbor resize to (PHASH_H x PHASH_W) -> bit (i, j) set iff
    pixel[i][j] > pixel[i][j+1] -> 56-bit BIGINT.  Invariant to any
    strictly monotone brightness remap (comparisons are order-only), which
    is the point of perceptual hashing: a re-encoded / brightness-shifted
    copy keeps its phash while its byte fingerprint changes (unit-tested).

    The DECODE is the documented sandbox fake (payload tiled row-major to
    width x height, as resize_images); the resize + comparison + packing
    are real numpy and apply unchanged to a real decoded array.  One
    mapInPandas pass, no shuffle; at 100 TB this is the cheap map stage in
    front of the groupBy in image_phash_dedup."""

    def run(it):
        for pdf in it:
            imgs = pdf[pdf["media_type"] == "image"]
            if len(imgs) == 0:
                continue
            urls, hashes = [], []
            for r in imgs.itertuples():
                data = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                need = int(r.width) * int(r.height)
                if data.size == 0 or need <= 0:
                    urls.append(r.url)
                    hashes.append(0)
                    continue
                reps = -(-need // data.size)
                img = np.tile(data, reps)[:need].reshape(
                    int(r.height), int(r.width))
                rows = (np.arange(PHASH_H) * img.shape[0]) // PHASH_H
                cols = (np.arange(PHASH_W) * img.shape[1]) // PHASH_W
                small = img[rows][:, cols]          # uint8, comparisons only
                bits = small[:, :-1] > small[:, 1:]  # (PHASH_H, PHASH_W-1)
                weights = np.left_shift(
                    np.int64(1),
                    (np.arange(PHASH_H)[:, None] * (PHASH_W - 1)
                     + np.arange(PHASH_W - 1)[None, :]).astype(np.int64))
                urls.append(r.url)
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame({"url": urls,
                                "phash": pd.array(hashes, dtype="int64")})

    return media.mapInPandas(run, _PHASH_SCHEMA)


def image_phash_dedup(media: DataFrame) -> DataFrame:
    """Image dedup by exact perceptual-hash match (the first-line image
    dedup of web-scale corpora: re-encodes and brightness shifts collapse
    to one phash, so exact grouping already catches most duplicates;
    Hamming-ball near-dup composes on top via the banded simhash64
    machinery in operators/dedup.py if needed).  keep = lexicographic-min
    url per phash group; n_copies audits the collapse.  Plan: the
    image_phash map stage, then ONE 8-byte-keyed hash agg + a broadcast-
    or-bucketed join back — the payload bytes never shuffle."""
    ph = image_phash(media)
    groups = (ph.groupBy("phash")
              .agg(F.min("url").alias("_keep_url"),
                   F.count("*").cast("long").alias("n_copies")))
    return (ph.join(groups, "phash")
            .select("url", "phash", "n_copies",
                    (F.col("url") == F.col("_keep_url")).alias("keep")))
