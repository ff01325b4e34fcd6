"""Pure-stdlib media codecs for the multimodal pipeline.

Real (not stubbed) encode/decode for three public formats chosen because
they are fully specified and implementable with stdlib + numpy only (this
container has no image/audio libraries):

* **PNG** (``image/png``) -- zlib-compressed scanlines with per-row filter
  bytes; the decoder implements all five filter types (None/Sub/Up/
  Average/Paeth, PNG spec §6), 8-bit depth, gray/RGB/gray+alpha/RGBA,
  non-interlaced.  The encoder writes filter-0 rows.
* **WAV** (``audio/wav``) -- RIFF container, PCM16; encoder/decoder parse
  real ``fmt ``/``data`` chunks.
* **Y4M** (``video/x-yuv4mpeg``) -- the YUV4MPEG2 uncompressed video
  stream (plain-text header + raw 4:2:0 frames), the standard interchange
  format of video toolchains.

These run inside ``mapInPandas`` batches (operators/multimodal.py); per-row
Python here is the unavoidable codec path, applied only to asset tables,
never to the text hot path.  Formats outside this set raise ``ValueError``
-- the honest boundary of a container without codec libs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (H,W) gray / (H,W,3) RGB / (H,W,4) RGBA -> PNG bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H,W) or (H,W,C).  8-bit, non-interlaced."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat = 8, b""
    w = h = ctype = None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + type + body + crc
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, ctype={ctype}, "
                    f"interlace={interlace})")
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    c = _PNG_CHANNELS[ctype]
    stride = w * c
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)],
            dtype=np.uint8).copy()
        if f == 0:
            pass
        elif f == 2:  # Up (vectorized)
            row += prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth are sequential
            for x in range(stride):
                left = int(row[x - c]) if x >= c else 0
                up = int(prev[x])
                ul = int(prev[x - c]) if x >= c else 0
                if f == 1:
                    row[x] = (int(row[x]) + left) & 0xFF
                elif f == 3:
                    row[x] = (int(row[x]) + ((left + up) >> 1)) & 0xFF
                else:
                    row[x] = (int(row[x]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = row
        prev = out[y]
    return out.reshape(h, w) if c == 1 else out.reshape(h, w, c)


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize (H,W[,C]) -> (th,tw[,C])."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(th) * h) // th, h - 1)
    xs = np.minimum((np.arange(tw) * w) // tw, w - 1)
    return arr[ys][:, xs]


# ─── WAV (RIFF / PCM16) ───

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> WAV bytes."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples [n, channels], sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        typ, ln = data[pos:pos + 4], struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if typ == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif typ == b"data":
            pcm = body
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(pcm, dtype="<i2")
    return samples.reshape(-1, channels), int(rate)


# ─── Y4M (YUV4MPEG2, 4:2:0) ───

Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """uint8 luma frames (N,H,W) -> YUV4MPEG2 bytes (flat chroma)."""
    n, h, w = frames.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    parts = [header]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(frames[i], dtype=np.uint8).tobytes())
        parts.append(chroma)
        parts.append(chroma)
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[np.ndarray, int, int]:
    """Y4M bytes -> (luma frames (N,H,W), width, height)."""
    if not data.startswith(Y4M_MAGIC):
        raise ValueError("not a Y4M payload")
    nl = data.index(b"\n")
    w = h = fps = None
    for tok in data[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps = int(tok[1:].split(b":")[0])
    if not w or not h:
        raise ValueError("Y4M missing W/H")
    frame_bytes = w * h + 2 * ((h // 2) * (w // 2))
    frames = []
    pos = nl + 1
    while pos < len(data):
        if data[pos:pos + 6] != b"FRAME\n":
            raise ValueError("Y4M frame marker missing")
        pos += 6
        luma = np.frombuffer(data[pos:pos + w * h], dtype=np.uint8)
        if len(luma) != w * h:
            raise ValueError("Y4M truncated frame")
        frames.append(luma.reshape(h, w))
        pos += frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), w, h


def y4m_fps(data: bytes) -> int:
    nl = data.index(b"\n")
    for tok in data[:nl].split(b" ")[1:]:
        if tok[:1] == b"F":
            return int(tok[1:].split(b":")[0])
    return 25
