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
