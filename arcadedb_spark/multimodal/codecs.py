"""Pure-stdlib media codecs for the multimodal operators.

This container ships no image/audio libraries, but PNG and WAV are
decodable with nothing beyond ``zlib``/``struct``/``wave`` + numpy —
so the decode kernels here are REAL, not stubs:

- PNG: signature + chunk walk, IHDR parse, zlib-inflate of IDAT,
  per-row unfilter (types 0-4), 8-bit gray/RGB/RGBA/gray+alpha →
  ``uint8`` HxWxC array.  Encoder writes filter-0 rows back.
  (Spec: https://www.w3.org/TR/png-3/ — public.)
- WAV: stdlib ``wave`` → (sample_rate, int16 numpy array).
- Resize: nearest-neighbor via numpy fancy indexing.

Video stays out of scope (no codec exists in the stdlib) — the frame
sampler in ops.py documents its stub for video MIME types.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bool(data) and data[:8] == _PNG_SIG


def is_wav(data: bytes) -> bool:
    return bool(data) and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit-depth PNG to a HxWxC uint8 array.

    Supports color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
    non-interlaced.  Raises ValueError on anything else."""
    if not is_png(data):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise ValueError("short PNG pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += stride + 1
        cur = row.astype(np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:
            # Sub / Average / Paeth need the left-neighbour pixel —
            # sequential within the row
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                up = int(prev[x])
                if ftype == 1:  # Sub
                    rec[x] = (cur[x] + left) & 0xFF
                elif ftype == 3:  # Average
                    rec[x] = (cur[x] + ((left + up) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    ul = int(prev[x - ch]) if x >= ch else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (
                        up if pb <= pc else ul
                    )
                    rec[x] = (cur[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out.reshape(height, width, ch)


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode a HxWxC uint8 array (C in {1,2,3,4}) as a filter-0 PNG."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].tobytes() for y in range(h)
    )
    idat = zlib.compress(raw, 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample to (height, width)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a WAV blob → (sample_rate, mono float32 samples in [-1, 1])."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        width = wf.getsampwidth()
        nch = wf.getnchannels()
        frames = wf.readframes(n)
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        arr = arr.reshape(-1, nch).mean(axis=1)
    return rate, arr


# ---------------------------------------------------------------------------
# Feature kernels — deterministic, content-derived, REAL
# ---------------------------------------------------------------------------


def image_features(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Luminance histogram (dim-4 buckets) + per-image stats:
    [mean, std, width, height, hist…] truncated/padded to ``dim``."""
    px = pixels.astype(np.float64)
    if px.ndim == 3 and px.shape[2] >= 3:
        lum = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    else:
        lum = px.reshape(px.shape[0], px.shape[1], -1)[:, :, 0]
    nbuckets = max(dim - 4, 1)
    hist, _ = np.histogram(lum, bins=nbuckets, range=(0.0, 256.0))
    hist = hist.astype(np.float64) / max(lum.size, 1)
    head = np.array(
        [lum.mean(), lum.std(), pixels.shape[1], pixels.shape[0]],
        dtype=np.float64,
    )
    out = np.concatenate([head, hist])
    return np.pad(out, (0, max(dim - out.size, 0)))[:dim].astype(np.float64)


def audio_features(rate: int, samples: np.ndarray, dim: int) -> np.ndarray:
    """[rms, zero-crossing-rate, duration_s, rate] + FFT band energies."""
    if samples.size == 0:
        return np.zeros(dim, dtype=np.float64)
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.abs(np.diff(np.sign(samples))) > 0))
    head = np.array(
        [rms, zcr, samples.size / rate, rate], dtype=np.float64
    )
    nb = max(dim - 4, 1)
    spec = np.abs(np.fft.rfft(samples))
    bands = np.array_split(spec, nb)
    energy = np.array([float(b.mean()) if b.size else 0.0 for b in bands],
                      dtype=np.float64)
    total = energy.sum() or 1.0
    out = np.concatenate([head, energy / total])
    return np.pad(out, (0, max(dim - out.size, 0)))[:dim].astype(np.float64)


def byte_features(data: bytes, dim: int) -> np.ndarray:
    """Content features of an opaque byte blob (the honest fallback for
    un-decodable MIME types — real statistics, not hash noise):
    [len, mean_byte, frac_ws, frac_digit, frac_lower, frac_upper,
    distinct_bytes, frac_printable] truncated/padded to ``dim``.
    Each is independently re-derivable in SQL (the driver oracle does)."""
    if not data:
        return np.zeros(dim, dtype=np.float64)
    b = np.frombuffer(data, dtype=np.uint8)
    n = b.size
    out = np.array(
        [
            float(n),
            float(b.mean()),
            float(np.isin(b, (9, 10, 13, 32)).mean()),
            float(((b >= 48) & (b <= 57)).mean()),
            float(((b >= 97) & (b <= 122)).mean()),
            float(((b >= 65) & (b <= 90)).mean()),
            float(np.unique(b).size),
            float(((b >= 32) & (b <= 126)).mean()),
        ],
        dtype=np.float64,
    )
    return np.pad(out, (0, max(dim - out.size, 0)))[:dim].astype(np.float64)
