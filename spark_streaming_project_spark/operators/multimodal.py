"""Multimodal column plumbing (BASELINE.json north-star).

Media (image/audio/video) at engine level = opaque ``binary`` payload +
typed metadata columns (schemas.MEDIA_ASSETS). All per-asset compute runs as
Arrow-batched ``mapInPandas`` — payloads never pass through the driver, and
batch shape is preserved so a 100 TB asset table processes partition-local.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this environment; decode
is therefore a clearly-marked stub seam (``decode_stub``) with a
deterministic fake implementation so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "asset_id long, kind string, payload_bytes long, "
    "feature_checksum long, thumb_width int, thumb_height int"
)


def real_decode(payload: bytes, kind: str):  # pragma: no cover - env lacks codecs
    """The production decode seam. Wire PIL/torchaudio/PyAV here when the
    cluster image ships codecs."""
    raise NotImplementedError(
        "media codecs (PIL/librosa/ffmpeg) are not available in this "
        "environment; use decode_stub"
    )


def decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode: metadata derived purely from the bytes.

    feature_checksum = sum of the first 64 bytes (a stand-in for a real
    feature vector); thumb dims are fixed per kind.
    """
    dims = {"image": (64, 64), "audio": (0, 0), "video": (32, 32)}
    w, h = dims.get(kind, (0, 0))
    return {
        "payload_bytes": len(payload),
        "feature_checksum": int(sum(payload[:64])),
        "thumb_width": w,
        "thumb_height": h,
    }


def decode_assets(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched decode over (asset_id, kind, payload) columns.

    ``mapInPandas`` keeps whole Arrow batches in flight; each batch yields
    one metadata frame — payload bytes never leave the executor.
    """
    decode = decode_stub if use_stub else real_decode

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            out = pd.DataFrame(meta)
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return df.select("asset_id", "kind", "payload").mapInPandas(
        _decode, DECODED_SCHEMA
    )


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as media payloads so the multimodal
    path has a driver-provided corpus to run against (real media tables slot
    in with the same shape)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )


RESIZED_SCHEMA = "asset_id long, kind string, resized binary, width int, height int"

FRAMES_SCHEMA = "asset_id long, frame_idx int, ts_ms long, frame binary"

FEATURES_SCHEMA = "asset_id long, kind string, feature array<float>"


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: nearest-neighbor byte sampling down/up to
    exactly width*height bytes (position i reads source byte
    floor(i*len/target)). Pure function of (payload, dims) — the PIL seam
    (``real_decode``) replaces only this body; the Spark plumbing
    (binary->binary, typed dims) is the production shape."""
    target = width * height
    n = len(payload)
    if n == 0:
        return b"\x00" * target
    return bytes(payload[(i * n) // target] for i in range(target))


def resize_assets(df: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Arrow-batched image resize over (asset_id, kind, payload): binary in,
    binary out, executor-local (no shuffle — the plan is scan->mapInPandas).
    At 100 TB this is the canonical embarrassingly-parallel media pass; the
    output column is smaller than the input, so it SHRINKS the table for
    downstream feature extraction."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "kind": pdf["kind"].values,
                    "resized": [resize_stub(p, width, height) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select("asset_id", "kind", "payload").mapInPandas(
        _resize, RESIZED_SCHEMA
    )


def sample_frames(
    df: DataFrame, n_frames: int = 4, frame_interval_ms: int = 1000
) -> DataFrame:
    """Frame sampling: one input video row -> ``n_frames`` output rows
    (asset_id, frame_idx, ts_ms, frame). The 1->N fan-out happens INSIDE
    ``mapInPandas`` (the output iterator yields more rows than the input
    batch), which is how a real ffmpeg seek-and-decode runs on Spark:
    payloads never leave the executor, and Arrow batches stay columnar.
    Stub frames are equal byte-slices of the payload — deterministic, so
    tests can recompute them in plain Python."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n = len(payload)
                step = max(1, n // n_frames)
                for i in range(n_frames):
                    ids.append(aid)
                    idxs.append(i)
                    tss.append(i * frame_interval_ms)
                    frames.append(bytes(payload[i * step : i * step + step]))
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.select("asset_id", "payload").mapInPandas(_frames, FRAMES_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Payload -> dense float feature vector (``array<float>``): a
    numpy-vectorized rolling byte histogram projected to ``dim`` buckets and
    l2-normalized. Deterministic stand-in for a CNN/audio embedding with the
    REAL output contract — the vectors feed directly into the engine's
    similarity/ANN operators (same ``array<float>`` column shape as the
    ``embeddings`` table). Arrow-batched; one pass, no shuffle."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * dim)
                    continue
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                nrm = float(np.sqrt((hist * hist).sum()))
                feats.append((hist / nrm if nrm > 0 else hist).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "kind": pdf["kind"].values,
                    "feature": feats,
                }
            )

    return df.select("asset_id", "kind", "payload").mapInPandas(
        _feat, FEATURES_SCHEMA
    )


PHASH_BITS = 63  # 63 bits keep the hash inside a signed BIGINT (the
# bloom-words convention), so the oracle compares integers directly


def perceptual_hash_assets(df: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over the leading
    ``PHASH_BITS`` payload bytes: bit i is set when byte i is above the
    window mean (integer compare ``byte*63 > total`` — no division, no
    floats). Near-identical payloads (small edits, re-encodes of the
    deterministic stub) land at small Hamming distance, where byte-exact
    dedup (media_dedup_groups) sees nothing.

    Arrow-batched ``mapInPandas`` like every multimodal tier — payloads
    never leave the executor; assets shorter than ``PHASH_BITS`` bytes
    are skipped (documented contract: pad-vs-skip is a policy choice and
    skip keeps the oracle trivial). With a real decoder, the same bit
    construction runs over the decoded 8x8 luma grid instead of raw
    bytes — only the seam changes."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)[:PHASH_BITS]
                if len(b) < PHASH_BITS:
                    continue
                total = sum(b)
                h = 0
                for i, byte in enumerate(b):
                    if byte * PHASH_BITS > total:
                        h |= 1 << i
                ids.append(int(aid))
                hashes.append(h)
            yield pd.DataFrame({"asset_id": ids, "phash": hashes})

    return df.select("asset_id", "payload").mapInPandas(
        _hash, "asset_id long, phash long"
    )
