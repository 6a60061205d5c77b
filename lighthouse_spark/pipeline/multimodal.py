"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side mechanics are real — typed schema, Arrow-batched
mapInPandas decode/feature-extract, partition-size-aware batching —
while the actual media decode is STUBBED (this container ships no
image/audio libs): `decoder="real"` raises NotImplementedError at the
point a deployment would call into PIL/ffmpeg; `decoder="fake"` is a
deterministic stand-in (stats derived from the bytes themselves) so
the distributed plumbing is testable end-to-end.

Schema convention:
    media: binary                      -- opaque payload
    media_meta: struct<kind:string, mime:string, width:int,
                       height:int, duration_ms:long>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "struct<kind:string, mime:string, width:int, height:int, duration_ms:long>"
)

FEATURE_SCHEMA = (
    "id long, kind string, n_bytes long, sha256 string,"
    " mean_luma double, embedding array<float>"
)


def attach_media_meta(df: DataFrame, media_col: str, kind: str, mime: str) -> DataFrame:
    """Typed metadata column for an opaque binary payload."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _fake_decode(payload: bytes, dim: int) -> tuple[float, np.ndarray]:
    """Deterministic stand-in for a real decoder: derives a 'mean luma'
    and a unit-norm pseudo-embedding from the payload bytes."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.Generator(np.random.Philox(key=int.from_bytes(h[:8], "little")))
    emb = rng.standard_normal(dim).astype(np.float32)
    emb /= np.linalg.norm(emb) or 1.0
    luma = (np.frombuffer(payload, dtype=np.uint8).mean() / 255.0) if payload else 0.0
    return float(luma), emb


def extract_features(
    df: DataFrame,
    id_col: str,
    media_col: str,
    kind_col: str = "media_meta.kind",
    dim: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The batch shape is the load-bearing part at 100 TB: each task sees
    an iterator of column batches (never the whole partition in
    memory), media bytes stay in Arrow buffers until the decode call,
    and output rows are independent of batch boundaries."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    src = df.select(
        F.col(id_col).alias("id"),
        F.col(kind_col).alias("kind"),
        F.col(media_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decoder == "real":
                # deployment hook: PIL.Image.open / av.open / soundfile
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this environment; use decoder='fake' for plumbing tests"
                )
            lumas, embs, shas, sizes = [], [], [], []
            for payload in b["payload"]:
                payload = bytes(payload) if payload is not None else b""
                luma, emb = _fake_decode(payload, dim)
                lumas.append(luma)
                embs.append(emb.tolist())
                shas.append(hashlib.sha256(payload).hexdigest())
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "id": b["id"].to_numpy(),
                    "kind": b["kind"].to_numpy(),
                    "n_bytes": sizes,
                    "sha256": shas,
                    "mean_luma": lumas,
                    "embedding": embs,
                }
            )

    return src.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str,
    media_col: str,
    every_ms: int = 1000,
    decoder: str = "fake",
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame (id, frame_idx, ts_ms, frame_sha256). Fake decoder
    derives a deterministic frame count from the payload length."""
    src = df.select(F.col(id_col).alias("id"), F.col(media_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decoder == "real":
                raise NotImplementedError("real video decode not available here")
            ids, idxs, tss, shas = [], [], [], []
            for i, payload in zip(b["id"], b["payload"]):
                payload = bytes(payload) if payload is not None else b""
                n_frames = max(1, len(payload) // 64)
                for fi in range(min(n_frames, 16)):
                    ids.append(i)
                    idxs.append(fi)
                    tss.append(fi * every_ms)
                    shas.append(
                        hashlib.sha256(payload + fi.to_bytes(4, "little")).hexdigest()
                    )
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "ts_ms": tss, "frame_sha256": shas}
            )

    return src.mapInPandas(run, "id long, frame_idx int, ts_ms long, frame_sha256 string")
