"""Deterministic synthetic *claims* corpus — the reference's document
shape (ref: /root/reference/app/model/claim.go:20-54), for parity
testing the full /search composite semantics: searchable text fields
(name/title/description/channel), structural fields (claim_type,
bid_state), ranking signals (effective_amount, certificate_amount,
view/sub counts, thumbnail, claim_cnt, release_time), filter fields
(nsfw, tags, fee, content_type).

Same determinism scheme as corpus.py (Philox keyed by row id).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 1042

WORDS = [
    "interesting", "amazing", "facts", "science", "crypto", "bitcoin",
    "gaming", "music", "tutorial", "review", "news", "daily", "vlog",
    "linux", "spark", "search", "engine", "channel", "video", "funny",
    "cats", "space", "history", "cooking", "travel", "the", "and", "of",
]
CHANNELS = ["@SciShow", "@CryptoDaily", "@LinuxTalk", "@CatVideos", "@spark engine"]
CONTENT_TYPES = ["video/mp4", "audio/mp3", "text/markdown", "image/png", "SKP"]
BID_STATES = ["Controlling", "Accepted", "Accepted", "Spent", "Expired"]
TAG_POOL = ["science", "crypto", "linux", "cats", "music", "nsfw", "mature"]

_EPOCH_2024 = 1704067200  # 2024-01-01


def _gen_batch(ids: np.ndarray) -> pd.DataFrame:
    rows = []
    for i in ids:
        rng = np.random.Generator(np.random.Philox(key=SEED, counter=int(i)))
        i = int(i)
        is_channel = i % 11 == 0
        n_name = int(rng.integers(1, 4))
        name_words = list(rng.choice(WORDS, size=n_name))
        channel = CHANNELS[i % len(CHANNELS)] if not is_channel else None
        name = ("@" if is_channel else "") + " ".join(name_words)
        title = " ".join(rng.choice(WORDS, size=int(rng.integers(2, 7)))) if not is_channel else None
        desc = " ".join(rng.choice(WORDS, size=int(rng.integers(5, 30))))
        tags = sorted(set(rng.choice(TAG_POOL, size=int(rng.integers(0, 4)))))
        rows.append(
            {
                "id": i,
                "claim_id": hashlib.sha1(f"claim-{SEED}-{i}".encode()).hexdigest(),
                "name": name,
                "title": title,
                "description": desc,
                "channel": channel,
                "channel_claim_id": (
                    hashlib.sha1(f"chan-{channel}".encode()).hexdigest() if channel else None
                ),
                "claim_type": "channel" if is_channel else "stream",
                "bid_state": BID_STATES[i % len(BID_STATES)],
                "effective_amount": int(rng.integers(0, 10_000_000)),
                "certificate_amount": int(rng.integers(0, 1_000_000)),
                "view_cnt": int(rng.integers(0, 100_000)) if i % 3 else None,
                "sub_cnt": int(rng.integers(0, 10_000)) if i % 4 else None,
                "thumbnail_url": f"https://thumbs/{i}.png" if i % 2 else "",
                "fee": float(rng.choice([0.0, 0.0, 1.5, 10.0])),
                "nsfw": bool(i % 13 == 0),
                "tags": tags,
                "claim_cnt": int(rng.integers(1, 50)),
                "release_time": int(_EPOCH_2024 + rng.integers(0, 730) * 86400),
                "content_type": CONTENT_TYPES[i % len(CONTENT_TYPES)] if not is_channel else None,
            }
        )
    return pd.DataFrame(rows)


SCHEMA = (
    "id long, claim_id string, name string, title string, description string,"
    " channel string, channel_claim_id string, claim_type string, bid_state string,"
    " effective_amount long, certificate_amount long, view_cnt long, sub_cnt long,"
    " thumbnail_url string, fee double, nsfw boolean, tags array<string>,"
    " claim_cnt long, release_time long, content_type string"
)


def synthetic_claims(spark: SparkSession, n: int = 500, partitions: int | None = None) -> DataFrame:
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_batch(b["id"].to_numpy())

    df = base.mapInPandas(gen, SCHEMA)
    return df.withColumn("doc_id", F.xxhash64("claim_id")).drop("id")
