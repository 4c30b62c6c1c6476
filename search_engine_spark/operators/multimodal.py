"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque ``binary`` columns with typed metadata — the
Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested.  The decode step dispatches on the
container signature:

* PNG payloads decode FOR REAL — via PIL when importable, else via the
  built-in minimal PNG decoder below (stdlib zlib inflate + numpy
  scanline un-filtering per the public PNG spec; 8-bit non-interlaced
  gray/RGB/RGBA).  Both paths yield identical pixel bytes
  (tests/test_multimodal.py asserts it when PIL is present).
* WAV (RIFF PCM) audio decodes FOR REAL via the stdlib ``wave`` module:
  sample rate, channel count, and the raw PCM frame bytes.
* ``synthesize_media``'s deterministic fake container (header below) is
  the test/bench stand-in for codecs genuinely absent from this
  container (compressed audio, video); unknown containers raise —
  ``ValueError`` normally, ``NotImplementedError`` in strict mode — so a
  real torchaudio/av decoder drops into ``_decode_payload`` with the
  distributed plumbing untouched.

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


PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Minimal REAL PNG decoder (no third-party deps): chunk walk → IHDR
    dims → zlib-inflate the IDAT stream → reverse the per-scanline filters
    (PNG spec §9: None/Sub/Up/Average/Paeth).  8-bit, non-interlaced,
    gray / gray+alpha / RGB / RGBA.  Returns (width, height, pixel bytes,
    row-major, channels interleaved) — byte-identical to PIL's tobytes()
    for the same image."""
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"png: only 8-bit non-interlaced gray/RGB(A) supported "
                    f"(depth={bit_depth} color={color} interlace={interlace})"
                )
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None:
        raise ValueError("png: missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * ch
    raw = raw.reshape(height, stride + 1)  # leading filter byte per row
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    for y in range(height):
        f = int(filters[y])
        cur = rows[y].copy()
        up = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up — fully vectorizable
            out[y] = (cur + up) & 0xFF
        else:  # Sub/Average/Paeth depend on the left neighbor → pixel loop
            row = out[y]
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                if f == 1:
                    row[x] = (cur[x] + left) & 0xFF
                elif f == 3:
                    row[x] = (cur[x] + (left + up[x]) // 2) & 0xFF
                else:  # Paeth
                    ul = up[x - ch] if x >= ch else 0
                    p = left + up[x] - ul
                    pa, pb, pc = abs(p - left), abs(p - up[x]), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (
                        up[x] if pb <= pc else ul
                    )
                    row[x] = (cur[x] + pred) & 0xFF
    return int(width), int(height), out.astype(np.uint8).tobytes()


def _is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def _decode_wav(payload: bytes) -> tuple[int, int, bytes]:
    """REAL WAV decode via the stdlib ``wave`` module (RIFF chunk walk +
    integer-PCM frames — no third-party deps).  Returns (sample_rate,
    n_channels, raw PCM frame bytes)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        return (w.getframerate(), w.getnchannels(),
                w.readframes(w.getnframes()))


def _decode_payload(payload: bytes, have_pil: bool,
                    strict: bool) -> tuple[int, int, bytes]:
    """Container dispatch → (width-ish, height-ish, decoded body bytes).

    PNG is decoded for real (PIL preferred, built-in decoder otherwise),
    as is WAV PCM audio (stdlib wave; the (w, h) slots carry sample_rate
    and n_channels); the SMM1 fake container covers media whose codecs
    are absent here; anything else raises (NotImplementedError in strict
    mode, naming the missing codec — the extension point for
    torchaudio/av)."""
    if payload[:4] == MAGIC:
        _, a, b, body = _decode_fake(payload)
        return a, b, body
    if payload[:8] == PNG_SIG:
        if have_pil:
            import io

            import PIL.Image

            with PIL.Image.open(io.BytesIO(payload)) as im:
                return im.width, im.height, im.tobytes()
        return _decode_png(payload)
    if _is_wav(payload):
        return _decode_wav(payload)
    if strict:
        raise NotImplementedError(
            "no codec for this container (PNG, WAV PCM, and the SMM1 fake "
            "container are supported; compressed audio/video need "
            "torchaudio/av)"
        )
    raise ValueError("unknown media container")


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract per Arrow batch (mapInPandas — the only
    sane shape for multi-MB binary rows: no collect, no per-row Python at
    the API layer, batch size bounded by arrow maxRecordsPerBatch).

    Features here are a 16-bin byte histogram of the decoded body (real
    pixel bytes for PNG payloads) — the stand-in for an embedding model
    forward pass.
    """
    try:  # prefer the real library when present
        import PIL.Image  # noqa: F401
        have_pil = True
    except Exception:
        have_pil = False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                w, h, body = _decode_payload(bytes(payload), have_pil, strict)
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
