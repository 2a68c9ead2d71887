"""Pure-stdlib binary codecs for the multimodal column family.

The container has no PIL/opencv/torchaudio, but PNG and WAV are fully
decodable with ``zlib``/``struct`` and the ``wave`` module -- so the
image and audio decode paths are REAL (bytes -> pixels / PCM), not
sha-fakes. Video remains an honest stub (no stdlib container parser);
see multimodal.decode_video.

PNG support: 8-bit greyscale / RGB / RGBA / grey+alpha, non-interlaced,
all five scanline filters (None/Sub/Up/Average/Paeth) -- the subset a
feature-extraction pipeline sees from standard encoders. Public format
per the PNG spec (RFC 2083).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


class CodecError(ValueError):
    """Malformed or unsupported binary payload."""


def decode_png(data: bytes) -> dict:
    """PNG bytes -> {width, height, channels, pixels: bytearray}.
    pixels is row-major, ``channels`` bytes per pixel, unfiltered."""
    if not data or not data.startswith(_PNG_SIG):
        raise CodecError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise CodecError("truncated chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + payload + crc
    if width is None:
        raise CodecError("missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise CodecError(
            f"unsupported PNG variant (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise CodecError("IDAT size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                b = prev[i]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise CodecError(f"bad filter byte {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return {"width": width, "height": height, "channels": ch, "pixels": out}


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal PNG encoder (8-bit, filter 0 scanlines) -- used by the
    synthetic-asset generator so decode tests run on real PNGs."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride : (y + 1) * stride]) for y in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_wav(data: bytes) -> dict:
    """WAV bytes -> {sample_rate, n_channels, n_frames, sample_width,
    pcm: bytes} via the stdlib wave module."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            return {
                "sample_rate": w.getframerate(),
                "n_channels": w.getnchannels(),
                "n_frames": w.getnframes(),
                "sample_width": w.getsampwidth(),
                "pcm": w.readframes(w.getnframes()),
            }
    except (wave.Error, EOFError) as e:  # EOFError: truncated mid-header
        raise CodecError(f"not a WAV: {e}") from e


def encode_wav(samples: list[int], sample_rate: int = 16000) -> bytes:
    """16-bit mono PCM WAV from integer samples."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


# ------------------------------------------------------ feature kernels

FEATURE_DIM = 16


def image_feature(data: bytes) -> list[float]:
    """16-dim real image feature: mean luminance over a 4x4 spatial
    grid, [0, 1]. Decodes the actual pixels."""
    img = decode_png(data)
    w, h, ch, px = img["width"], img["height"], img["channels"], img["pixels"]
    sums = [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for y in range(h):
        gy = min(y * 4 // h, 3)
        for x in range(w):
            o = (y * w + x) * ch
            if ch >= 3:
                lum = 0.299 * px[o] + 0.587 * px[o + 1] + 0.114 * px[o + 2]
            else:
                lum = float(px[o])
            cell = gy * 4 + min(x * 4 // w, 3)
            sums[cell] += lum
            counts[cell] += 1
    return [round(s / c / 255.0, 6) if c else 0.0 for s, c in zip(sums, counts)]


def audio_feature(data: bytes) -> list[float]:
    """16-dim real audio feature: per-segment RMS of the decoded PCM
    (16 equal time slices), normalized to [0, 1] for 16-bit samples."""
    wav = decode_wav(data)
    if wav["sample_width"] != 2:
        raise CodecError("only 16-bit PCM supported")
    pcm = wav["pcm"]
    n = len(pcm) // 2
    if n == 0:
        return [0.0] * FEATURE_DIM
    samples = struct.unpack(f"<{n}h", pcm[: n * 2])
    seg = max(1, n // FEATURE_DIM)
    out = []
    for i in range(FEATURE_DIM):
        chunk = samples[i * seg : (i + 1) * seg]
        if not chunk:
            out.append(0.0)
            continue
        rms = (sum(s * s for s in chunk) / len(chunk)) ** 0.5
        out.append(round(rms / 32768.0, 6))
    return out
