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
* GIF payloads decode FOR REAL — built-in LZW decoder (variable code
  width, LSB-first bit packing per the GIF89a spec), global/local color
  tables, interlace un-weaving; first frame, palette-mapped to RGB
  (PIL-parity tested when PIL is present).
* WAV (RIFF PCM) audio decodes FOR REAL via the stdlib ``wave`` module:
  sample rate, channel count, and the raw PCM frame bytes.
* Y4M (YUV4MPEG2) video decodes FOR REAL — the uncompressed planar-YUV
  interchange format: header parse (W/H/C colorspace), per-FRAME walk,
  raw plane bytes; ``sample_frames`` decodes only the sampled frames'
  luma planes (the point of a frame-sampler).
* Baseline JPEG decodes FOR REAL — operators/jpeg.py (huffman entropy
  decode + dequant + float IDCT + YCbCr→RGB per ITU-T T.81); progressive
  and arithmetic-coded JPEGs raise NotImplementedError naming the
  feature.
* MPEG audio (MP3/MP2/MP1) decodes its CONTAINER for real —
  operators/mpeg_audio.py walks frame syncs per ISO/IEC 11172-3 (header
  tables, ID3v2 skip, Xing/Info VBR frame counts) and yields sample
  rate, channels, frame count, duration, bitrate; the body passed to
  feature extraction is the tag-stripped compressed audio bytes.
* PERMANENT SCOPE LINE (SURVEY §7.2): compressed-bitstream SAMPLE decode
  — MP3 Layer III huffman/requantize/IMDCT/polyphase to PCM, H.264 —
  stays out of this repo (it needs the spec's huffman/synthesis-window
  data tables and belongs to torchaudio/av, which drop into
  ``_decode_payload`` with the distributed plumbing untouched).
  ``synthesize_media``'s deterministic fake container (header below)
  remains the test/bench stand-in wherever decoded SAMPLES are needed;
  unknown containers raise — ``ValueError`` normally,
  ``NotImplementedError`` in strict mode, naming the missing codec.

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

FRAME_SAMPLE_SCHEMA = (
    "media_id long, n_frames int, sampled array<int>, "
    "luma_means array<float>"
)

RESIZE_SCHEMA = (
    "media_id long, width int, height int, channels int, pixels binary"
)


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


def _png_check_supported(payload: bytes) -> None:
    """Raise the builtin decoder's NotImplementedError for any PNG outside
    its supported subset (8-bit, non-interlaced, gray/LA/RGB/RGBA) — used
    by the PIL fast path so decode support is identical with and without
    PIL installed."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG stream")
    (length,) = struct.unpack(">I", payload[8:12])
    if payload[12:16] != b"IHDR" or length < 13:
        raise ValueError("png: missing IHDR")
    _w, _h, bit_depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    if bit_depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"png: only 8-bit non-interlaced gray/RGB(A) supported "
            f"(depth={bit_depth} color={color} interlace={interlace})"
        )


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


GIF_SIGS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(min_code_size: int, data: bytes) -> bytes:
    """GIF-flavor LZW (spec appendix F): codes are packed LSB-first,
    code width starts at min+1 and grows to 12 bits, CLEAR resets the
    table, EOI terminates.  Returns the palette-index byte stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos, nbits = 0, len(data) * 8
    while bitpos + code_size <= nbits:
        i = bitpos >> 3
        code = (int.from_bytes(data[i:i + 3], "little") >> (bitpos & 7)) & (
            (1 << code_size) - 1
        )
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: corrupt LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out)


def _decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Minimal REAL GIF decoder (no third-party deps): logical screen
    descriptor → color tables → extension-block skip → first image
    descriptor → LZW decompress → de-interlace → palette-map to RGB.
    Returns (width, height, RGB bytes row-major) for the FIRST frame —
    byte-identical to PIL's convert("RGB").tobytes() for the same
    image."""
    if payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF stream")
    packed = payload[10]
    pos, gct = 13, None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label byte + sub-block chain
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack(
                "<HHHHB", payload[pos:pos + 9]
            )
            pos += 9
            ct = gct
            if ipacked & 0x80:  # local color table wins
                n = 2 << (ipacked & 7)
                ct = payload[pos:pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("gif: no color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(
                _gif_lzw_decode(min_code, bytes(data)), dtype=np.uint8
            )
            if idx.size < w * h:
                raise ValueError("gif: truncated pixel data")
            idx = idx[:w * h].reshape(h, w)
            if ipacked & 0x40:  # interlaced: 4-pass row weave (spec 20.c)
                order = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2),
                ])
                rows = np.empty_like(idx)
                rows[order] = idx
                idx = rows
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            return int(w), int(h), pal[idx].tobytes()
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError("gif: bad block marker")
    raise ValueError("gif: no image data")


Y4M_SIG = b"YUV4MPEG2 "


def _y4m_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse the YUV4MPEG2 stream header → (width, height, frame_bytes,
    offset of the first FRAME marker).  Frame size follows the C
    (colorspace) tag: 4:2:0 → 3/2 bytes per pixel, 4:2:2 → 2, 4:4:4 → 3,
    mono → 1 (the public y4m convention; default C420)."""
    nl = payload.index(b"\n")
    w = h = None
    cs = "420"
    for p in payload[len(Y4M_SIG):nl].split(b" "):
        if p[:1] == b"W":
            w = int(p[1:])
        elif p[:1] == b"H":
            h = int(p[1:])
        elif p[:1] == b"C":
            cs = p[1:].decode("ascii")
    if w is None or h is None:
        raise ValueError("y4m: header missing W or H")
    if cs.startswith("420"):
        fsz = w * h * 3 // 2
    elif cs.startswith("422"):
        fsz = w * h * 2
    elif cs.startswith("444"):
        fsz = w * h * 3
    elif cs.startswith("mono"):
        fsz = w * h
    else:
        raise NotImplementedError(f"y4m: colorspace C{cs} not supported")
    return w, h, fsz, nl + 1


def _y4m_frame_offsets(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Walk the FRAME markers → (width, height, frame_bytes, byte offset
    of each frame's plane data).  O(n_frames) header hops, no plane
    copies — sampling then touches only the sampled frames."""
    w, h, fsz, pos = _y4m_header(payload)
    offsets = []
    while pos < len(payload):
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("y4m: bad FRAME marker")
        pos = payload.index(b"\n", pos) + 1
        if len(payload) - pos < fsz:
            raise ValueError("y4m: truncated frame")
        offsets.append(pos)
        pos += fsz
    return w, h, fsz, offsets


def _decode_y4m(payload: bytes) -> tuple[int, int, bytes]:
    """REAL Y4M decode: every frame's raw planar YUV bytes, concatenated
    in stream order.  Returns (width, height, plane bytes)."""
    w, h, fsz, offsets = _y4m_frame_offsets(payload)
    return w, h, b"".join(payload[o:o + fsz] for o in offsets)


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

    PNG and GIF are decoded for real (PIL preferred for PNG, built-in
    decoders otherwise), as are WAV PCM audio (stdlib wave; the (w, h)
    slots carry sample_rate and n_channels) and Y4M uncompressed video
    (raw planar YUV frames); the SMM1 fake container covers media whose
    codecs are absent here; anything else raises (NotImplementedError in
    strict mode, naming the missing codec — the extension point for
    torchaudio/av)."""
    if payload[:4] == MAGIC:
        _, a, b, body = _decode_fake(payload)
        return a, b, body
    if payload[:8] == PNG_SIG:
        if have_pil:
            import io

            import PIL.Image

            # PIL is a FAST path, not a capability widener: accept exactly
            # the subset the builtin decoder accepts (8-bit non-interlaced
            # gray/LA/RGB/RGBA, checked against IHDR) so whether a payload
            # decodes — and what bytes it decodes to — never depends on
            # whether PIL happens to be importable in this environment.
            # (A palette PNG via PIL would yield INDEX bytes, not RGB, a
            # silent semantic divergence on top of the availability one.)
            _png_check_supported(payload)
            with PIL.Image.open(io.BytesIO(payload)) as im:
                return im.width, im.height, im.tobytes()
        return _decode_png(payload)
    if payload[:6] in GIF_SIGS:
        return _decode_gif(payload)
    if _is_wav(payload):
        return _decode_wav(payload)
    if payload[:10] == Y4M_SIG:
        return _decode_y4m(payload)
    from search_engine_spark.operators import jpeg

    if payload[:2] == jpeg.JPEG_SIG:
        # REAL baseline-JPEG decode (operators/jpeg.py: huffman + dequant
        # + float IDCT + YCbCr→RGB); progressive/arithmetic raise inside
        return jpeg.decode_jpeg(payload)
    from search_engine_spark.operators import mpeg_audio

    if mpeg_audio.is_mpeg_audio(payload):
        # REAL MPEG audio (MP3/MP2/MP1) CONTAINER decode: frame-sync walk,
        # ID3v2 skip, Xing/Info VBR — (w, h) carry sample_rate and
        # channels like the WAV path; the body is the compressed audio
        # bytes (tag-stripped), NOT PCM: bitstream decode to samples is
        # permanently out of scope here (SURVEY §7.2) and drops in via
        # torchaudio/av on a cluster that ships those codecs.
        s = mpeg_audio.mpeg_audio_summary(payload)
        return s["sample_rate"], s["channels"], payload[s["audio_off"]:]
    if strict:
        raise NotImplementedError(
            "no codec for this container (PNG, GIF, baseline JPEG, WAV "
            "PCM, Y4M, MPEG-audio container metadata, and the SMM1 fake "
            "container are supported; compressed audio/video SAMPLE "
            "decode needs torchaudio/av)"
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
    """Video frame sampling as a mapInPandas batch op.

    Y4M containers are sampled FOR REAL: the FRAME walk finds every
    frame's byte offset, then only the sampled frames' luma (Y) planes
    are touched — ``luma_means`` carries their per-frame mean, the
    stand-in for handing the sampled frames to a vision encoder.  The
    SMM1 fake container carries a frame *count* but no frame data, so
    its ``luma_means`` is empty.  Either way nothing is collected and no
    unsampled frame is decoded — the property that matters when a 100-TB
    video lake flows through this operator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                if payload[:10] == Y4M_SIG:
                    w, h, _fsz, offsets = _y4m_frame_offsets(payload)
                    n_frames = len(offsets)
                    sampled = np.arange(0, n_frames, every_k, dtype=np.int32)
                    means = [
                        float(np.frombuffer(
                            payload[offsets[i]:offsets[i] + w * h],
                            dtype=np.uint8,
                        ).mean())
                        for i in sampled
                    ]
                else:
                    _, n_frames, _fps, _ = _decode_fake(payload)
                    sampled = np.arange(0, n_frames, every_k, dtype=np.int32)
                    means = []
                out.append({
                    "media_id": int(mid),
                    "n_frames": int(n_frames),
                    "sampled": sampled,
                    "luma_means": means,
                })
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
    )


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  strict: bool = False) -> DataFrame:
    """Nearest-neighbor image resize over decoded pixel grids (PNG/GIF —
    any container whose decode yields width*height*channels bytes).
    Pure numpy fancy-indexing per Arrow batch; emits the resized
    interleaved pixel bytes.  Payloads whose decoded body is not a pixel
    grid (the fake container's text body) raise ValueError — filter to
    real image rows first."""
    try:
        import PIL.Image  # noqa: F401
        have_pil = True
    except Exception:
        have_pil = False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, body = _decode_payload(bytes(payload), have_pil, strict)
                if w <= 0 or h <= 0 or len(body) % (w * h):
                    raise ValueError(
                        f"media_id={mid}: decoded body ({len(body)} bytes) "
                        f"is not a {w}x{h} pixel grid"
                    )
                ch = len(body) // (w * h)
                px = np.frombuffer(body, dtype=np.uint8).reshape(h, w, ch)
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                resized = px[rows][:, cols]
                out.append({
                    "media_id": int(mid),
                    "width": out_w,
                    "height": out_h,
                    "channels": ch,
                    "pixels": resized.tobytes(),
                })
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=RESIZE_SCHEMA)
    )
