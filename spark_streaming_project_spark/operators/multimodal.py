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
