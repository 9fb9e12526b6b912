"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for 100 TB media pipelines: media lives as a ``binary`` column
(or object-store URIs) beside a typed metadata struct; decode/transform
steps are Arrow-batched ``mapInPandas`` stages so bytes stream through
Python in columnar batches, never row-at-a-time, and the decoded outputs
are again plain columns for downstream relational ops.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this environment, so
the decode kernels are stubbed: ``decode_image`` raises unless handed the
deterministic fake codec, and ``fake_decode_rgb_stats`` derives stable
pseudo-pixel stats from the bytes themselves. The Spark-side contract —
schemas, batch iteration, partition sizing — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_mapreduce_spark.functions.scalar import dround

#: Metadata struct carried beside every media payload.
MEDIA_META_SCHEMA = "media_id long, kind string, mime string, n_bytes long, checksum string"


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media-shaped frame from any source column (here: utf-8
    bytes standing in for image/audio payloads).

    Real pipelines read payloads via ``spark.read.format('binaryFile')``
    or fetch from object storage inside mapInPandas; the column shape is
    identical. NULL source text follows the engine-wide
    NULL-text-is-empty-document rule: the payload is the EMPTY byte
    string (zero bytes, md5('') checksum), never NULL — a NULL payload
    would crash decode kernels and silently drop dedup groups.
    """
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Stub decode kernel. Replace with PIL/cv2 in production images.

    Raises so a misconfigured pipeline fails loudly instead of producing
    garbage features.
    """
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode_rgb_stats for deterministic testing"
    )


def fake_decode_rgb_stats(payload: bytes) -> tuple[float, float, float]:
    """Deterministic stand-in for decode + feature-extract: derives
    'channel means' from the payload bytes. Stable across runs/machines."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return (0.0, 0.0, 0.0)
    pads = -arr.size % 3
    arr = np.pad(arr, (0, pads)).reshape(-1, 3)
    means = arr.mean(axis=0)
    return (float(means[0]), float(means[1]), float(means[2]))


def extract_features(
    media: DataFrame,
    kernel: Callable[[bytes], tuple[float, float, float]] = fake_decode_rgb_stats,
) -> DataFrame:
    """Decode/feature-extract stage over media batches.

    mapInPandas: each Arrow batch of payloads is decoded in one Python
    call-frame; output is a typed feature frame. Partition sizing rule at
    scale: payload bytes per partition (maxPartitionBytes / repartition),
    not row counts, because rows are megabytes here.
    """
    schema = "media_id long, n_bytes long, r_mean double, g_mean double, b_mean double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # defensive: payloads from other sources may still be NULL
            feats = [kernel(p if p is not None else b"") for p in pdf["payload"]]
            out = pd.DataFrame(feats, columns=["r_mean", "g_mean", "b_mean"])
            out.insert(0, "n_bytes", pdf["n_bytes"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(gen, schema)


def sample_frames(
    media: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' plumbing demo: emit up to ``max_frames`` fixed-
    stride byte-window digests per payload (stand-in for video frame
    extraction — one input row fans out to N typed frame rows)."""
    schema = "media_id long, frame_no long, frame_checksum string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:  # defensive, see extract_features
                    payload = b""
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    chunk = bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
                    rows.append((int(mid), i, hashlib.md5(chunk).hexdigest()))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame_checksum"])

    return media.mapInPandas(gen, schema)


def media_exact_dedup(media: DataFrame) -> DataFrame:
    """Exact media dedup by payload checksum — the first dedup pass of
    any image/audio pipeline (identical bytes, regardless of filename or
    metadata, keep the smallest id). Operates on the
    :func:`attach_binary_payload` frame shape; only 32-hex checksums
    (already computed at ingest) cross the wire, never payloads.
    Returns (checksum, keep_id, n_copies)."""
    return media.groupBy("checksum").agg(
        F.min("media_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def media_feature_dedup_pairs(
    feats: DataFrame,
    id_col: str,
    feat_col: str,
    *,
    eps: float = 0.5,
    bucket_width: float = 1.0,
) -> DataFrame:
    """Near-dup media pairs by DECODED feature distance — the
    perceptual-dedup step that catches re-encoded copies exact checksums
    miss. Blocked, never all-pairs: each item lands in one
    ``bucket_width`` feature bin; the probe side additionally visits
    both adjacent bins, so any pair within ``eps <= bucket_width`` meets
    through an equi-join on the bin key. Returns (id1, id2, dist) for
    pairs with |f1 - f2| <= eps.

    Feature values are rounded to 1e-4 before bucketing/distance so the
    rule is engine-reproducible (the registry oracle replays it). At
    scale this is the same banded-candidates + verify shape as MinHash
    and embedding LSH; with d-dimensional features, block on a coarse
    grid per dimension the same way.
    """
    if eps > bucket_width:
        raise ValueError(f"eps must be <= bucket_width: {eps} > {bucket_width}")
    f4 = dround(F.col(feat_col), 4)
    # both join sides consume the feature frame — cut the lineage so the
    # DECODE stage (the expensive part of any media pipeline) runs once
    base = (
        feats.select(F.col(id_col).alias("id"), f4.alias("f"))
        .withColumn("b", F.floor(F.col("f") / F.lit(float(bucket_width))).cast("long"))
        .localCheckpoint(eager=False)
    )
    probes = base.select(
        F.col("id").alias("id1"),
        F.col("f").alias("f1"),
        F.explode(
            F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)
        ).alias("b"),
    )
    right = base.select(F.col("id").alias("id2"), F.col("f").alias("f2"), "b")
    return (
        probes.join(right, "b")
        .filter(F.col("id1") < F.col("id2"))
        .filter(F.abs(F.col("f1") - F.col("f2")) <= float(eps))
        .select("id1", "id2", dround(F.abs(F.col("f1") - F.col("f2")), 4).alias("dist"))
    )
