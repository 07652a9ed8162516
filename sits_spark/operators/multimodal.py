"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video content as ``binary`` columns with typed metadata
(the engine's training-data-pipeline surface; SURVEY.md §2 extension).
The Spark-side plumbing — schema, batch shape, Arrow transport, partition
behavior — is real and tested; the actual media decode is STUBBED because
decode libraries (PIL/ffmpeg/...) are not in this container:

- ``decode_stub="fail"``   -> NotImplementedError (clearly marked seam for
  a real decoder)
- ``decode_stub="fake"``   -> deterministic fake features derived from the
  payload bytes (md5-seeded), so downstream plumbing is testable.

Mirrors the reference's pattern of an injected processing closure applied
blockwise (``filter_fn``/``impute_fn`` at
/root/reference/R/api_classify.R:459-470) — here the injected step is the
decoder, applied over Arrow batches in ``mapInPandas``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, n_bytes long, "
    "content_md5 string"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feat array<float>"

N_FEATURES = 8


def to_media_table(df: DataFrame, id_col: str, text_col: str, kind: str = "blob") -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata —
    the ingestion shape for image/audio/video bytes."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def _fake_features(payload: bytes, k: int = N_FEATURES) -> np.ndarray:
    """Deterministic fake feature vector from payload bytes (md5-seeded)."""
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((k * 4) // len(h) + 1))[: k * 4], dtype="<u4")
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(media: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """Decode/feature-extract payloads via Arrow-batched ``mapInPandas``.

    With a real decoder this is where PIL/ffmpeg would run; the batch
    shape (one pandas frame of payload bytes per Arrow batch, one feature
    row out per media row) is the production shape either way.
    """
    if decode_stub not in ("fake", "fail"):
        raise ValueError("decode_stub must be 'fake' or 'fail'")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode_stub == "fail":
                raise NotImplementedError(
                    "media decode requires an image/audio library not "
                    "present in this environment; inject a real decoder here"
                )
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": pdf["n_bytes"].to_numpy(),
                    "feat": feats,
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)
