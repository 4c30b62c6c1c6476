"""Multimodal column plumbing: schema, batch shape, REAL PNG decode
(built-in decoder, PIL-parity when PIL is importable), deterministic fake
container for codec-less media, frame sampling (SURVEY-extras)."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import multimodal as M


def _encode_png(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Independent PNG encoder for round-trip tests: applies the spec's
    forward filters (the exact inverse of what _decode_png must undo).
    pixels: (h, w, ch) uint8, ch in {1, 2, 3, 4}."""
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    px = pixels.astype(np.int32).reshape(h, w * ch)
    raw = bytearray()
    for y, f in zip(range(h), filters):
        cur = px[y]
        up = px[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.int32)
        line = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            left = px[y][x - ch] if x >= ch else 0
            ul = up[x - ch] if x >= ch else 0
            if f == 0:
                line[x] = cur[x]
            elif f == 1:
                line[x] = cur[x] - left
            elif f == 2:
                line[x] = cur[x] - up[x]
            elif f == 3:
                line[x] = cur[x] - (left + up[x]) // 2
            else:
                p = left + up[x] - ul
                pa, pb, pc = abs(p - left), abs(p - up[x]), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    up[x] if pb <= pc else ul
                )
                line[x] = cur[x] - pred
        raw.append(f)
        raw += (line & 0xFF).astype(np.uint8).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (M.PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decode_round_trip_all_filters():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(6, 5, ch), dtype=np.uint8)
        # exercise every filter type, incl. first-row Sub/Paeth edge cases
        payload = _encode_png(px, filters=[1, 0, 2, 3, 4, 4])
        w, h, body = M._decode_png(payload)
        assert (w, h) == (5, 6)
        assert body == px.tobytes(), f"channels={ch}"


def test_png_decode_matches_pil():
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    payload = _encode_png(px, filters=[0, 1, 2, 3, 4, 0, 2, 4])
    import io

    with PIL.open(io.BytesIO(payload)) as im:
        assert (im.width, im.height) == (9, 8)
        pil_bytes = im.tobytes()
    assert M._decode_png(payload)[2] == pil_bytes


def test_extract_features_decodes_real_png(spark):
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    payload = _encode_png(px, filters=[0, 1, 2, 4])
    media = spark.createDataFrame(
        [(1, 1, "image", payload, {"width": 3, "height": 4, "mime":
                                   "image/png"})],
        M.MEDIA_SCHEMA,
    )
    r = M.extract_features(media, strict=True).collect()[0]
    assert (r["width"], r["height"]) == (3, 4)
    want = np.bincount(px.reshape(-1) >> 4, minlength=16) / px.size
    assert np.allclose(np.array(r["features"]), want)
    assert r["n_bytes"] == len(payload)


def _encode_wav(rate: int, channels: int, frames: bytes) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_wav_decode_real_round_trip():
    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32767, size=400, dtype=np.int16).tobytes()
    payload = _encode_wav(22050, 2, pcm)
    rate, ch, body = M._decode_wav(payload)
    assert (rate, ch) == (22050, 2)
    assert body == pcm


def test_extract_features_decodes_real_wav(spark):
    pcm = np.arange(1000, dtype=np.int16).tobytes()
    payload = _encode_wav(16000, 1, pcm)
    media = spark.createDataFrame(
        [(2, 2, "audio", payload, {"width": 16000, "height": 1,
                                   "mime": "audio/wav"})],
        M.MEDIA_SCHEMA,
    )
    r = M.extract_features(media, strict=True).collect()[0]
    # the (width, height) slots carry (sample_rate, n_channels) for audio
    assert (r["width"], r["height"]) == (16000, 1)
    arr = np.frombuffer(pcm, dtype=np.uint8)
    want = np.bincount(arr >> 4, minlength=16) / arr.size
    assert np.allclose(np.array(r["features"]), want)
    assert r["n_bytes"] == len(payload)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"doc text {i} " * (i + 1)) for i in range(30)],
        "doc_id long, text string",
    )
    return M.synthesize_media(docs).cache()


def test_media_schema_and_counts(media):
    assert media.count() == 30
    assert set(media.select("kind").distinct().toPandas()["kind"]) == {
        "image", "audio", "video"
    }
    row = media.filter(F.col("doc_id") == 3).collect()[0]
    assert bytes(row["payload"])[:4] == M.MAGIC
    assert row["meta"]["width"] >= 16
    assert row["meta"]["mime"].startswith("x-fake/")


def test_extract_features(media):
    feats = M.extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        h = np.array(r["features"])
        assert h.shape == (16,)
        assert abs(h.sum() - 1.0) < 1e-5  # normalized histogram
        assert r["n_bytes"] > 13
    # deterministic: same input → same features
    again = M.extract_features(media).collect()
    a = {r["media_id"]: list(r["features"]) for r in feats}
    b = {r["media_id"]: list(r["features"]) for r in again}
    assert a == b


def test_strict_mode_names_missing_codec(spark, media):
    # the fake container decodes in strict mode too (it IS the declared
    # stand-in for codec-less media) ...
    assert M.extract_features(media, strict=True).count() == 30
    # ... but an unknown real container must raise NotImplementedError
    # (OggS: a real-world signature with no codec here; RIFF/WAVE now
    # routes to the real stdlib decoder instead)
    bad = spark.createDataFrame(
        [(1, 1, "audio", b"OggS\x00junkjunkjunk", {"width": 1, "height": 1,
                                                   "mime": "audio/ogg"})],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as ei:
        M.extract_features(bad, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_sample_frames(media):
    frames = M.sample_frames(media, every_k=7).collect()
    assert frames  # every doc_id % 3 == 2 is a video
    for r in frames:
        samp = list(r["sampled"])
        assert samp == list(range(0, r["n_frames"], 7))


def test_rejects_unknown_container(spark):
    bad = spark.createDataFrame(
        [(1, 1, "image", b"JUNKJUNKJUNKJUNK", {"width": 1, "height": 1,
                                               "mime": "x"})],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        M.extract_features(bad).collect()


# ---------------------------------------------------------------- GIF ----

def _naive_lzw(min_code: int, indices) -> bytes:
    """Valid-but-naive GIF LZW stream for tests: a CLEAR before every
    pixel code keeps the code table at its initial size, so the code
    width never grows.  Decoders must handle repeated clears."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    csize = min_code + 1
    out, acc, nacc = bytearray(), 0, 0

    def emit(code):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += csize
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    for p in indices:
        emit(clear)
        emit(int(p))
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _encode_gif(idx: np.ndarray, palette, interlaced=False, with_ext=False,
                local=False) -> bytes:
    """Independent GIF writer for round-trip tests (naive LZW above)."""
    h, w = idx.shape
    depth = max(2, (len(palette) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h,
                       (0 if local else 0x80) | (depth - 1), 0, 0)
    pal = bytes(c for rgb in palette for c in rgb)
    pal += b"\x00" * ((3 << depth) - len(pal))  # pad to 2^depth entries
    if not local:
        out += pal
    if with_ext:  # graphic control extension + a comment extension
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        out += b"\x21\xfe\x05hello\x00"
    ipacked = (0x80 | (depth - 1) if local else 0) | (0x40 if interlaced
                                                      else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local:
        out += pal
    rows = idx
    if interlaced:
        order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                np.arange(2, h, 4), np.arange(1, h, 2)])
        rows = idx[order]
    data = _naive_lzw(depth, rows.reshape(-1))
    out += bytes([depth])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


_PALETTE4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (40, 50, 60)]


def test_gif_decode_round_trip():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 4, size=(7, 6), dtype=np.uint8)
    for local, with_ext in ((False, False), (True, True)):
        payload = _encode_gif(idx, _PALETTE4, with_ext=with_ext, local=local)
        w, h, body = M._decode_gif(payload)
        assert (w, h) == (6, 7)
        pal = np.array(_PALETTE4 + [(0, 0, 0)] * 0, dtype=np.uint8)
        assert body == pal[idx].tobytes()


def test_gif_decode_interlaced():
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 4, size=(11, 3), dtype=np.uint8)
    payload = _encode_gif(idx, _PALETTE4, interlaced=True)
    w, h, body = M._decode_gif(payload)
    pal = np.array(_PALETTE4, dtype=np.uint8)
    assert (w, h) == (3, 11)
    assert body == pal[idx].tobytes()


def test_gif_lzw_kwkwk_case():
    # handcrafted stream exercising the code==len(table) (KwKwK) branch:
    # min_code=2 → clear=4, eoi=5, width 3; codes [4, 1, 6, 5] decode to
    # [1] then the not-yet-defined code 6 = prev + prev[0] = [1, 1]
    acc = 0
    for i, code in enumerate([4, 1, 6, 5]):
        acc |= code << (3 * i)
    data = acc.to_bytes(2, "little")
    assert M._gif_lzw_decode(2, data) == b"\x01\x01\x01"


def test_gif_decode_matches_pil():
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(12)
    idx = rng.integers(0, 4, size=(9, 8), dtype=np.uint8)
    payload = _encode_gif(idx, _PALETTE4, with_ext=True)
    with PIL.open(io.BytesIO(payload)) as im:
        pil_rgb = im.convert("RGB").tobytes()
    assert M._decode_gif(payload)[2] == pil_rgb


def test_extract_features_decodes_real_gif(spark):
    idx = np.tile(np.arange(4, dtype=np.uint8), 8).reshape(4, 8)
    payload = _encode_gif(idx, _PALETTE4)
    media = spark.createDataFrame(
        [(3, 3, "image", payload, {"width": 8, "height": 4,
                                   "mime": "image/gif"})],
        M.MEDIA_SCHEMA,
    )
    r = M.extract_features(media, strict=True).collect()[0]
    assert (r["width"], r["height"]) == (8, 4)
    pal = np.array(_PALETTE4, dtype=np.uint8)
    body = np.frombuffer(pal[idx].tobytes(), dtype=np.uint8)
    want = np.bincount(body >> 4, minlength=16) / body.size
    assert np.allclose(np.array(r["features"]), want)


# ---------------------------------------------------------------- Y4M ----

def _encode_y4m(frames: list[bytes], w: int, h: int,
                cs: bytes = b"C420") -> bytes:
    head = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s\n" % (w, h, cs)
    return head + b"".join(b"FRAME\n" + f for f in frames)


def test_y4m_decode_round_trip():
    w, h = 4, 4
    fsz = w * h * 3 // 2
    frames = [bytes([i * 10] * (w * h)) + bytes(fsz - w * h)
              for i in range(5)]
    payload = _encode_y4m(frames, w, h)
    dw, dh, body = M._decode_y4m(payload)
    assert (dw, dh) == (4, 4)
    assert body == b"".join(frames)


def test_y4m_colorspaces():
    w, h = 2, 2
    for cs, fsz in ((b"C444", 12), (b"C422", 8), (b"Cmono", 4),
                    (b"C420jpeg", 6)):
        payload = _encode_y4m([bytes(range(fsz))], w, h, cs)
        assert M._decode_y4m(payload)[2] == bytes(range(fsz))
    with pytest.raises(NotImplementedError):
        M._decode_y4m(_encode_y4m([b""], 2, 2, b"C411"))


def test_sample_frames_real_y4m(spark):
    w, h = 4, 2
    fsz = w * h * 3 // 2
    frames = [bytes([i * 10] * (w * h)) + bytes(fsz - w * h)
              for i in range(7)]
    media = spark.createDataFrame(
        [(9, 9, "video", _encode_y4m(frames, w, h),
          {"width": w, "height": h, "mime": "video/x-y4m"})],
        M.MEDIA_SCHEMA,
    )
    r = M.sample_frames(media, every_k=3).collect()[0]
    assert r["n_frames"] == 7
    assert list(r["sampled"]) == [0, 3, 6]
    assert [round(x, 4) for x in r["luma_means"]] == [0.0, 30.0, 60.0]


def test_extract_features_decodes_real_y4m(spark):
    w, h = 4, 4
    fsz = w * h * 3 // 2
    frames = [bytes([7] * fsz), bytes([200] * fsz)]
    payload = _encode_y4m(frames, w, h)
    media = spark.createDataFrame(
        [(10, 10, "video", payload, {"width": w, "height": h,
                                     "mime": "video/x-y4m"})],
        M.MEDIA_SCHEMA,
    )
    r = M.extract_features(media, strict=True).collect()[0]
    assert (r["width"], r["height"]) == (4, 4)
    arr = np.frombuffer(b"".join(frames), dtype=np.uint8)
    want = np.bincount(arr >> 4, minlength=16) / arr.size
    assert np.allclose(np.array(r["features"]), want)


def test_fake_video_has_no_luma(media):
    for r in M.sample_frames(media, every_k=7).collect():
        assert list(r["luma_means"]) == []


# -------------------------------------------------------------- resize ----

def test_resize_images_nearest_neighbor(spark):
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    png = _encode_png(px, filters=[0, 1, 2, 4])
    gif_idx = np.arange(16, dtype=np.uint8).reshape(4, 4) % 4
    gif = _encode_gif(gif_idx, _PALETTE4)
    media = spark.createDataFrame(
        [(1, 1, "image", png, {"width": 4, "height": 4, "mime": "image/png"}),
         (2, 2, "image", gif, {"width": 4, "height": 4, "mime": "image/gif"}),
         (3, 3, "video", b"ignored", {"width": 0, "height": 0, "mime": "x"})],
        M.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r
            for r in M.resize_images(media, 2, 2, strict=True).collect()}
    assert set(rows) == {1, 2}  # kind filter dropped the video row
    want_png = px[[0, 2]][:, [0, 2]]
    assert bytes(rows[1]["pixels"]) == want_png.tobytes()
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (
        2, 2, 3)
    pal = np.array(_PALETTE4, dtype=np.uint8)
    want_gif = pal[gif_idx][[0, 2]][:, [0, 2]]
    assert bytes(rows[2]["pixels"]) == want_gif.tobytes()


def test_resize_rejects_non_pixel_grid(spark, media):
    imgs = media.filter(F.col("kind") == "image").limit(1)
    with pytest.raises(Exception) as ei:
        M.resize_images(imgs, 2, 2).collect()
    assert "pixel grid" in str(ei.value)


def test_png_support_check_is_pil_independent():
    """The PIL fast path must reject exactly what the builtin decoder
    rejects — decode support never depends on PIL availability.  A
    palette (color type 3) PNG raises the same NotImplementedError from
    the IHDR check alone, no PIL needed."""
    import struct

    import pytest as _pytest

    from search_engine_spark.operators import multimodal as M

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)  # palette
    payload = (M.PNG_SIG + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
               + b"\x00\x00\x00\x00")
    with _pytest.raises(NotImplementedError, match="color=3"):
        M._png_check_supported(payload)
    # interlaced RGB rejected too
    ihdr2 = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    payload2 = (M.PNG_SIG + struct.pack(">I", len(ihdr2)) + b"IHDR" + ihdr2
                + b"\x00\x00\x00\x00")
    with _pytest.raises(NotImplementedError, match="interlace=1"):
        M._png_check_supported(payload2)
    # the supported subset passes the check silently
    ihdr3 = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    payload3 = (M.PNG_SIG + struct.pack(">I", len(ihdr3)) + b"IHDR" + ihdr3
                + b"\x00\x00\x00\x00")
    M._png_check_supported(payload3)


# ---------------------------------------------------------------------------
# round 5: REAL MPEG audio container parsing (operators/mpeg_audio.py) —
# the MP3 surface is container-level by permanent scope; PCM stays out
# ---------------------------------------------------------------------------

def _mp3_frame(bitrate_idx=9, sr_idx=0, padding=0, mono=False,
               version=3, layer=1):
    """One valid MPEG audio frame: header + zero filler to frame_len.
    Defaults: MPEG1 Layer III (layer bits 01), 128 kbps, 44100 Hz."""
    from search_engine_spark.operators import mpeg_audio as MA

    b0 = 0xFF
    b1 = 0xE0 | (version << 3) | (layer << 1) | 0x1      # no CRC
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0xC0 if mono else 0x00
    hdr = bytes([b0, b1, b2, b3])
    fi = MA.parse_frame_header(hdr)
    return hdr + b"\x00" * (fi.frame_len - 4), fi


def test_mp3_header_fields():
    from search_engine_spark.operators import mpeg_audio as MA

    frame, fi = _mp3_frame()
    assert (fi.version, fi.layer, fi.bitrate_kbps, fi.sample_rate,
            fi.channels, fi.samples) == ("MPEG1", 3, 128, 44100, 2, 1152)
    assert fi.frame_len == 144 * 128000 // 44100        # 417, no padding
    _, fp = _mp3_frame(padding=1)
    assert fp.frame_len == fi.frame_len + 1
    _, fm = _mp3_frame(mono=True)
    assert fm.channels == 1
    # MPEG2 Layer III: 576 samples, 72-slot frames, its own bitrate row
    _, f2 = _mp3_frame(version=2, bitrate_idx=9, sr_idx=0)
    assert (f2.version, f2.samples, f2.sample_rate) == ("MPEG2", 576, 22050)
    assert f2.bitrate_kbps == 80           # MPEG2 row: idx 9 → 80 kbps
    assert f2.frame_len == 72 * 80000 // 22050
    # Layer I: 4-byte slots, 384 samples
    _, f1 = _mp3_frame(layer=3, bitrate_idx=4)          # MPEG1 L1 128 kbps
    assert (f1.layer, f1.samples) == (1, 384)
    assert f1.frame_len == (12 * 128000 // 44100) * 4
    for bad in (b"\x00\x00\x00\x00", b"\xff\xe9\x90\x00",  # reserved ver
                b"\xff\xfb\xf0\x00", b"\xff\xfb\x9c\x00"):  # bad br/sr
        import pytest as _pytest
        with _pytest.raises(ValueError):
            MA.parse_frame_header(bad)


def test_mp3_summary_cbr_walk_and_edges():
    from search_engine_spark.operators import mpeg_audio as MA

    # padding alternates → frame lengths genuinely vary along the walk
    frames = [_mp3_frame(padding=i % 2)[0] for i in range(40)]
    stream = b"".join(frames)
    s = MA.mpeg_audio_summary(stream)
    assert s["n_frames"] == 40 and not s["vbr"]
    assert s["duration_s"] == round(40 * 1152 / 44100, 3)
    assert s["bitrate_kbps"] == 128 and s["sample_rate"] == 44100

    # leading ID3v2 tag is skipped (syncsafe size)
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 60]) + b"\x00" * 60
    s2 = MA.mpeg_audio_summary(tag + stream)
    assert s2["n_frames"] == 40 and s2["audio_off"] == 70

    # truncated final frame is not counted; trailing garbage stops clean
    s3 = MA.mpeg_audio_summary(stream[:-10])
    assert s3["n_frames"] == 39
    s4 = MA.mpeg_audio_summary(stream + b"TAGtrailing-id3v1-junk")
    assert s4["n_frames"] == 40

    import pytest as _pytest
    with _pytest.raises(ValueError):
        MA.mpeg_audio_summary(b"\x12\x34" * 100)


def test_mp3_xing_vbr_frame_count():
    from search_engine_spark.operators import mpeg_audio as MA

    frame, fi = _mp3_frame()
    # Xing header sits after 32 side-info bytes (MPEG1 stereo, no CRC)
    body = bytearray(frame)
    p = 4 + 32
    body[p:p + 4] = b"Xing"
    body[p + 4:p + 8] = (0x1).to_bytes(4, "big")         # frames flag
    body[p + 8:p + 12] = (9999).to_bytes(4, "big")
    s = MA.mpeg_audio_summary(bytes(body))
    assert s["vbr"] and s["n_frames"] == 9999
    assert s["duration_s"] == round(9999 * 1152 / 44100, 3)


def test_extract_features_real_mp3_container(spark):
    """The Spark path end-to-end on a real MP3-framed payload: mapInPandas
    decode yields (sample_rate, channels) in the (w, h) slots and a byte
    histogram of the tag-stripped COMPRESSED audio (PCM is permanently
    out of scope — SURVEY §7.2)."""
    import numpy as np

    from search_engine_spark.operators import multimodal as M

    frames = b"".join(_mp3_frame(padding=i % 2)[0] for i in range(8))
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    payload = tag + frames
    media = spark.createDataFrame(
        [(1, 7, "audio", bytearray(payload), (44100, 2, "audio/mpeg"))],
        M.MEDIA_SCHEMA,
    )
    row = M.extract_features(media, strict=True).collect()[0]
    assert (row["width"], row["height"]) == (44100, 2)
    arr = np.frombuffer(frames, dtype=np.uint8)
    want = np.bincount(arr >> 4, minlength=16) / arr.size
    assert np.allclose(np.array(row["features"]), want, atol=1e-6)
