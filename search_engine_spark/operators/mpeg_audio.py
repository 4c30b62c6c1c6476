"""REAL MPEG audio (MP3/MP2/MP1) container parsing — frame-sync walk,
header field decode, ID3v2 skip, Xing/Info VBR detection, frame count and
duration — implemented from the public ISO/IEC 11172-3 header layout.

Scope (permanent, see SURVEY §7.2): the CONTAINER layer is decoded for
real — everything a pipeline derives from an .mp3 without touching PCM
(sample rate, channel mode, bitrate, frame count, duration, CBR/VBR).
The compressed BITSTREAM layer (Layer III huffman + requantization +
IMDCT + polyphase synthesis to PCM samples) is out of scope for this
repo: it needs the spec's huffman/synthesis-window tables and lands in
`_decode_payload` via torchaudio/av on a cluster with those libraries.
The SMM1 fake container remains the stand-in wherever tests need decoded
SAMPLES; for container-level audio features this module is the real path.

Header layout (4 bytes, bits MSB-first):
  AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM
  A sync (all 1s) | B version (00=2.5, 10=2, 11=1) | C layer
  (01=III, 10=II, 11=I) | D !CRC | E bitrate idx | F samplerate idx |
  G padding | I channel mode (11=mono)
"""

from __future__ import annotations

from dataclasses import dataclass

MP3_BITRATES = {  # kbps, index 1..14 (0 = free, 15 = bad)
    # (version_group, layer): row — version_group 1 = MPEG1, 2 = MPEG2/2.5
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

SAMPLE_RATES = {  # by version code (bits B): {code: (idx0, idx1, idx2)}
    3: (44100, 48000, 32000),    # MPEG1
    2: (22050, 24000, 16000),    # MPEG2
    0: (11025, 12000, 8000),     # MPEG2.5
}

VERSION_NAMES = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}


@dataclass
class FrameInfo:
    version: str
    layer: int
    bitrate_kbps: int
    sample_rate: int
    channels: int
    samples: int          # PCM samples this frame represents
    frame_len: int        # bytes incl. header
    crc: bool


def parse_frame_header(h: bytes) -> FrameInfo:
    """Decode one 4-byte MPEG audio frame header; raises ValueError on
    anything that is not a valid, non-free-format frame."""
    if len(h) < 4:
        raise ValueError("mpeg audio: truncated header")
    b0, b1, b2, b3 = h[0], h[1], h[2], h[3]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError("mpeg audio: bad frame sync")
    vcode = (b1 >> 3) & 0x3
    if vcode == 1:
        raise ValueError("mpeg audio: reserved version")
    lcode = (b1 >> 1) & 0x3
    if lcode == 0:
        raise ValueError("mpeg audio: reserved layer")
    layer = 4 - lcode                         # 01→III, 10→II, 11→I
    vgroup = 1 if vcode == 3 else 2
    br_idx = (b2 >> 4) & 0xF
    if br_idx in (0, 15):
        raise ValueError("mpeg audio: free-format/bad bitrate")
    sr_idx = (b2 >> 2) & 0x3
    if sr_idx == 3:
        raise ValueError("mpeg audio: bad sample-rate index")
    bitrate = MP3_BITRATES[(vgroup, layer)][br_idx - 1] * 1000
    rate = SAMPLE_RATES[vcode][sr_idx]
    padding = (b2 >> 1) & 0x1
    channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
    if layer == 1:
        samples = 384
        frame_len = (12 * bitrate // rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        per = 144 if samples == 1152 else 72
        frame_len = per * bitrate // rate + padding
    return FrameInfo(
        version=VERSION_NAMES[vcode], layer=layer,
        bitrate_kbps=bitrate // 1000, sample_rate=rate, channels=channels,
        samples=samples, frame_len=frame_len, crc=(b1 & 0x1) == 0,
    )


def _skip_id3v2(payload: bytes) -> int:
    """Return the offset past a leading ID3v2 tag (syncsafe size), 0 if
    none."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    sz = ((payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
          | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F))
    return 10 + sz


def _xing_frames(payload: bytes, off: int, info: FrameInfo) -> int | None:
    """Frame count from a Xing/Info VBR header in the FIRST frame, if
    present (it sits after the side info, whose size the spec fixes per
    version × channel mode)."""
    side = (17 if info.channels == 1 else 32) if info.version == "MPEG1" \
        else (9 if info.channels == 1 else 17)
    p = off + 4 + (2 if info.crc else 0) + side
    tag = payload[p:p + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    flags = int.from_bytes(payload[p + 4:p + 8], "big")
    if not flags & 0x1:
        return None
    return int.from_bytes(payload[p + 8:p + 12], "big")


def mpeg_audio_summary(payload: bytes) -> dict:
    """Walk every frame of an MPEG audio stream and summarize the
    container: dict(version, layer, sample_rate, channels, n_frames,
    duration_s, bitrate_kbps — mean over frames, vbr flag, audio_off —
    first frame's offset).  A Xing/Info header short-circuits the walk
    (the VBR header's frame count IS the stream length; per-frame sizes
    then vary, which is the point of VBR).  Raises ValueError when no
    valid frame sync starts the stream (after any ID3v2 tag)."""
    off = _skip_id3v2(payload)
    first = parse_frame_header(payload[off:off + 4])
    xing = _xing_frames(payload, off, first)
    if xing is not None:
        return {
            "version": first.version, "layer": first.layer,
            "sample_rate": first.sample_rate, "channels": first.channels,
            "n_frames": xing,
            "duration_s": round(xing * first.samples / first.sample_rate, 3),
            "bitrate_kbps": first.bitrate_kbps, "vbr": True,
            "audio_off": off,
        }
    n, p, kbps_sum = 0, off, 0
    while p + 4 <= len(payload):
        try:
            fi = parse_frame_header(payload[p:p + 4])
        except ValueError:
            break                      # trailing garbage / tag — stop clean
        if p + fi.frame_len > len(payload):
            break                      # truncated final frame: not counted
        n += 1
        kbps_sum += fi.bitrate_kbps
        p += fi.frame_len
    if n == 0:
        raise ValueError("mpeg audio: no complete frame")
    return {
        "version": first.version, "layer": first.layer,
        "sample_rate": first.sample_rate, "channels": first.channels,
        "n_frames": n,
        "duration_s": round(n * first.samples / first.sample_rate, 3),
        "bitrate_kbps": kbps_sum // n, "vbr": False,
        "audio_off": off,
    }


def is_mpeg_audio(payload: bytes) -> bool:
    """Cheap container sniff: leading ID3v2 tag, or a valid frame header
    whose implied SECOND frame also syncs (two-sync check — a lone 0xFFE
    in random bytes is common; two chained valid headers are not)."""
    off = _skip_id3v2(payload)
    if off > 0:
        return len(payload) > off + 4 and payload[off] == 0xFF \
            and (payload[off + 1] & 0xE0) == 0xE0
    try:
        fi = parse_frame_header(payload[off:off + 4])
    except ValueError:
        return False
    q = off + fi.frame_len
    if q + 4 > len(payload):
        return False                   # single-frame stream: too ambiguous
    try:
        parse_frame_header(payload[q:q + 4])
        return True
    except ValueError:
        return False
