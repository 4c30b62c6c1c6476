"""Baseline-JPEG decoder (operators/jpeg.py): roundtrip against a minimal
TEST-SIDE encoder (forward DCT + custom canonical Huffman tables, valid
T.81 baseline streams), exact flat-block/color expectations, restart
markers, and PIL parity (tolerance ±2 — T.81 does not pin one IDCT) when
PIL is importable."""

import struct

import numpy as np
import pytest

from search_engine_spark.operators import jpeg as J


# ---------------------------------------------------------------------------
# minimal baseline encoder (tests only)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)      # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.bits(1, 1)                    # pad with 1s (T.81 F.1.2.3)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _dct_blocks(plane: np.ndarray, qt: np.ndarray):
    """plane (multiple of 8 in both dims) → per-block quantized zigzag."""
    out = []
    for y0 in range(0, plane.shape[0], 8):
        for x0 in range(0, plane.shape[1], 8):
            b = plane[y0:y0 + 8, x0:x0 + 8].astype(np.float64) - 128.0
            coef = J._C @ b @ J._C.T
            q = np.round(coef.flatten() / qt.reshape(8, 8).flatten())
            # scan order: zz[k] = natural coef at position _ZIGZAG[k]
            out.append(q[J._ZIGZAG].astype(np.int64))
    return out


def _rle_symbols(zz: np.ndarray, pred: int):
    """(dc_sym, dc_bits), [(ac_sym, ac_bits)...], new pred."""
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    acs = []
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))
            run -= 16
        s = _category(int(zz[k]))
        acs.append(((run << 4) | s, (_mag_bits(int(zz[k]), s), s)))
        run = 0
    if last_nz < 63:
        acs.append((0x00, (0, 0)))             # EOB
    return (t, (_mag_bits(diff, t), t)), acs, dc


def _canonical_table(symbols):
    """All symbols at code length 8 → (bits[16], values, {sym: code})."""
    symbols = sorted(set(symbols))
    assert len(symbols) <= 200
    bits = [0] * 16
    bits[7] = len(symbols)
    codes = {s: i for i, s in enumerate(symbols)}
    return bits, bytes(symbols), codes


def encode_jpeg(planes, sampling, qt=None, restart_interval=0):
    """planes: list of np.uint8 2-D arrays (1 = gray, 3 = YCbCr, already
    subsampled per ``sampling`` [(h, v), ...]); emits a valid baseline
    stream (one shared quant table, custom fixed-length Huffman tables)."""
    if qt is None:
        qt = np.ones(64)
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    h_img, w_img = planes[0].shape
    # full-image dims from the luma plane (component 0 has hmax×vmax)
    mcux, mcuy = -(-w_img // (8 * hmax)), -(-h_img // (8 * vmax))

    # pad planes to whole MCUs and pre-quantize all blocks in MCU order
    blocks = {}
    for ci, (p, (hh, vv)) in enumerate(zip(planes, sampling)):
        ph, pw = mcuy * vv * 8, mcux * hh * 8
        pad = np.zeros((ph, pw), dtype=np.uint8)
        pad[:p.shape[0], :p.shape[1]] = p
        pad[p.shape[0]:, :p.shape[1]] = p[-1:, :]
        pad[:, p.shape[1]:] = pad[:, p.shape[1] - 1:p.shape[1]]
        bl = _dct_blocks(pad, qt)
        per_row = pw // 8
        blocks[ci] = (bl, per_row)

    # interleave: gather symbols first (two-pass: table then emit)
    mcu_units = []
    preds = [0] * len(planes)
    dc_syms, ac_syms = [], []
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            preds = [0] * len(planes)
            mcu_units.append("RST")
        my, mx = divmod(mcu, mcux)
        unit = []
        for ci, (hh, vv) in enumerate(sampling):
            bl, per_row = blocks[ci]
            for by in range(vv):
                for bx in range(hh):
                    zz = bl[(my * vv + by) * per_row + (mx * hh + bx)]
                    (dsym, dbits), acs, preds[ci] = _rle_symbols(zz, preds[ci])
                    dc_syms.append(dsym)
                    ac_syms.extend(s for s, _ in acs)
                    unit.append(((dsym, dbits), acs))
        mcu_units.append(unit)

    dc_bits, dc_vals, dc_codes = _canonical_table(dc_syms)
    ac_bits, ac_vals, ac_codes = _canonical_table(ac_syms)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    # NB: DQT is zigzag-ordered per T.81; the tests only use the all-ones
    # table, which is order-invariant
    out += seg(0xDB, bytes([0x00]) + bytes(np.asarray(qt, dtype=np.uint8)))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    sof = bytes([8]) + struct.pack(">HH", h_img, w_img) + bytes([len(planes)])
    for ci, (hh, vv) in enumerate(sampling):
        sof += bytes([ci + 1, (hh << 4) | vv, 0])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    w = _BitWriter()
    rst = 0
    for unit in mcu_units:
        if unit == "RST":
            w.flush()
            out += w.buf
            w = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            continue
        for (dsym, (dv, dn)), acs in unit:
            w.bits(dc_codes[dsym], 8)
            w.bits(dv, dn)
            for sym, (av, an) in acs:
                w.bits(ac_codes[sym], 8)
                w.bits(av, an)
    w.flush()
    out += w.buf
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_flat_gray_blocks_exact():
    img = np.zeros((8, 16), dtype=np.uint8)
    img[:, :8] = 100
    img[:, 8:] = 200
    payload = encode_jpeg([img], [(1, 1)])
    w, h, body = J.decode_jpeg(payload)
    assert (w, h) == (16, 8)
    got = np.frombuffer(body, dtype=np.uint8).reshape(8, 16)
    assert np.array_equal(got, img)


def test_gray_roundtrip_random_within_quant_error():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    payload = encode_jpeg([img], [(1, 1)])
    w, h, body = J.decode_jpeg(payload)
    got = np.frombuffer(body, dtype=np.uint8).reshape(h, w)
    # qt == 1: quantization error ≤ 0.5/coef → ≤ 4 per pixel after IDCT
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4


def test_single_ac_coefficient_matches_independent_idct():
    """Inject one AC coefficient; decoded pixels must equal the T.81 IDCT
    formula computed independently (explicit cosine double loop)."""
    zz = np.zeros(64, dtype=np.int64)
    # construct via the encoder: pick pixels = IDCT of a known coef block
    coef = np.zeros((8, 8))
    coef[1, 2] = 96.0
    alpha = lambda k: np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)  # noqa
    pix = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (alpha(u) * alpha(v) * coef[u, v]
                          * np.cos((2 * y + 1) * u * np.pi / 16)
                          * np.cos((2 * x + 1) * v * np.pi / 16))
            pix[y, x] = s
    img = np.clip(np.round(pix + 128), 0, 255).astype(np.uint8)
    payload = encode_jpeg([img], [(1, 1)])
    w, h, body = J.decode_jpeg(payload)
    got = np.frombuffer(body, dtype=np.uint8).reshape(8, 8)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4
    del zz


def test_color_420_flat_exact():
    """Flat YCbCr with 4:2:0 subsampling → exact expected RGB (replication
    upsampling is exact on flat chroma)."""
    y = np.full((16, 16), 128, dtype=np.uint8)
    cb = np.full((8, 8), 90, dtype=np.uint8)
    cr = np.full((8, 8), 180, dtype=np.uint8)
    payload = encode_jpeg([y, cb, cr], [(2, 2), (1, 1), (1, 1)])
    w, h, body = J.decode_jpeg(payload)
    assert (w, h) == (16, 16)
    got = np.frombuffer(body, dtype=np.uint8).reshape(16, 16, 3)
    er = round(128 + 1.402 * (180 - 128))
    eg = round(128 - 0.344136 * (90 - 128) - 0.714136 * (180 - 128))
    eb = round(128 + 1.772 * (90 - 128))
    assert (got[..., 0] == er).all()
    assert (got[..., 1] == eg).all()
    assert (got[..., 2] == eb).all()


def test_restart_markers():
    img = np.zeros((8, 32), dtype=np.uint8)
    for i in range(4):
        img[:, i * 8:(i + 1) * 8] = 60 + 40 * i
    payload = encode_jpeg([img], [(1, 1)], restart_interval=1)
    assert b"\xff\xd0" in payload              # RST0 actually emitted
    w, h, body = J.decode_jpeg(payload)
    got = np.frombuffer(body, dtype=np.uint8).reshape(8, 32)
    assert np.array_equal(got, img)


def test_progressive_rejected():
    img = np.full((8, 8), 99, dtype=np.uint8)
    payload = bytearray(encode_jpeg([img], [(1, 1)]))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2                      # SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="0xC2"):
        J.decode_jpeg(bytes(payload))


def test_decode_via_multimodal_dispatch(spark):
    """JPEG payloads flow through the same mapInPandas feature extraction
    as every other codec."""
    from search_engine_spark.operators import multimodal as M

    img = np.full((8, 8), 200, dtype=np.uint8)
    payload = encode_jpeg([img], [(1, 1)])
    media = spark.createDataFrame(
        [(1, 1, "image", bytearray(payload), (8, 8, "image/jpeg"))],
        M.MEDIA_SCHEMA,
    )
    row = M.extract_features(media, strict=True).collect()[0]
    assert row["n_bytes"] == len(payload)
    hist = np.asarray(row["features"])
    assert hist[200 >> 4] == 1.0               # all pixels in one bin


def test_pil_parity_within_tolerance(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    p = tmp_path / "t.jpg"
    PIL.fromarray(arr, "RGB").save(p, quality=95, subsampling=0)
    payload = p.read_bytes()
    w, h, body = J.decode_jpeg(payload)
    got = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
    with PIL.open(p) as im:
        want = np.asarray(im.convert("RGB"))
    # T.81 permits IDCT variance; libjpeg islow vs float differ by ±1-2
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2
