"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pages table carries raw ``html: binary`` (BASELINE.json input_hint);
the same plumbing generalizes to image/audio/video payloads. The
Spark-side machinery (schema, Arrow batch shape, mapInPandas signature,
partitioning) is real and tested; the actual media decode is STUBBED —
the decode libraries (PIL/ffmpeg/librosa) are not in this container, so
``decode_image`` raises NotImplementedError and the tested path uses a
deterministic fake feature extractor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

BINARY_META_SCHEMA = (
    "doc_id long, n_bytes long, sha256 string, magic string, feat array<float>"
)


def decode_image(data: bytes) -> "np.ndarray":
    """Real image decode — STUB: decode libraries are not available in
    this environment. On a production cluster, plug PIL/torchvision here;
    the mapInPandas plumbing around it is unchanged."""
    raise NotImplementedError("image decode requires PIL/opencv — not in this image")


def _fake_feature(data: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: bytes of sha256 scaled to [0,1)."""
    h = hashlib.sha256(data).digest()
    return np.frombuffer(h[:dim], dtype=np.uint8).astype(np.float32) / 255.0


def extract_binary_meta(
    df: DataFrame, binary_col: str = "html", id_col: str = "doc_id", feat_dim: int = 8
) -> DataFrame:
    """mapInPandas over binary payloads -> typed metadata + feature vector.

    Arrow ships the binary column zero-copy per batch; each batch is
    processed vectorized in pandas. Null payloads yield n_bytes=0 and a
    zero feature (kept, so joins stay total)."""

    def fn(it):
        for pdf in it:
            data = pdf[binary_col]
            n_bytes = data.map(lambda b: 0 if b is None else len(b)).astype("int64")
            sha = data.map(
                lambda b: hashlib.sha256(b or b"").hexdigest()
            )
            magic = data.map(
                lambda b: (b or b"")[:6].decode("latin1", errors="replace")
            )
            feat = data.map(
                lambda b: _fake_feature(b, feat_dim)
                if b is not None
                else np.zeros(feat_dim, dtype=np.float32)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n_bytes,
                    "sha256": sha,
                    "magic": magic,
                    "feat": feat.map(list),
                }
            )

    return df.mapInPandas(fn, BINARY_META_SCHEMA)
