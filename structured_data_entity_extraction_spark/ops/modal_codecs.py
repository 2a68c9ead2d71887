"""Pure-stdlib binary codecs for the multimodal column family.

The container has no PIL/opencv/torchaudio/ffmpeg, but PNG, WAV and
Y4M are fully decodable with ``zlib``/``struct``/``wave`` and plain
header parsing -- so all three modal decode paths are REAL
(bytes -> pixels / PCM / frames), not sha-fakes.

PNG support: 8-bit greyscale / RGB / RGBA / grey+alpha, non-interlaced,
all five scanline filters (None/Sub/Up/Average/Paeth) -- the subset a
feature-extraction pipeline sees from standard encoders. Public format
per the PNG spec (RFC 2083).

Video support: YUV4MPEG2 (y4m) -- the uncompressed interchange format
(mjpegtools/ffmpeg `-f yuv4mpeg`): an ASCII parameter header followed
by raw planar frames. C420* / C422 / C444 / Cmono colorspaces.
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
            try:
                width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", payload
                )
            except struct.error as e:
                raise CodecError(f"bad IHDR: {e}") from e
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
    if width == 0 or height == 0:
        raise CodecError("zero-size image")
    stride = width * ch
    expected = (stride + 1) * height
    # bound the inflate to the geometry the header promises: a crafted
    # tiny IDAT (decompression bomb) must not allocate past `expected`
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected)
        if d.unconsumed_tail or d.decompress(b"", 1):
            raise CodecError("IDAT inflates past the declared geometry")
    except zlib.error as e:
        raise CodecError(f"bad IDAT stream: {e}") from e
    if len(raw) != expected:
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


# ------------------------------------------------------------- Y4M video

_Y4M_SIG = b"YUV4MPEG2"
# chroma subsampling -> bytes per frame as a fraction of width*height
_Y4M_PLANES = {
    "420": (1, 2, 2),  # (luma, chroma x-div, chroma y-div)
    "422": (1, 2, 1),
    "444": (1, 1, 1),
    "mono": (1, 0, 0),
}


def decode_y4m(data: bytes) -> dict:
    """YUV4MPEG2 bytes -> {width, height, fps_num, fps_den, n_frames,
    y_planes: list[bytes]}. Pure header parsing + raw plane slicing --
    the whole container format is an ASCII parameter line followed by
    'FRAME\\n' + planar YUV per frame."""
    if not data or not data.startswith(_Y4M_SIG):
        raise CodecError("not a Y4M (bad signature)")
    nl = data.find(b"\n")
    if nl < 0:
        raise CodecError("truncated Y4M header")
    width = height = None
    fps_num, fps_den = 25, 1
    cspace = "420"
    try:
        for param in data[len(_Y4M_SIG) : nl].split(b" "):
            if not param:
                continue
            tag, val = chr(param[0]), param[1:].decode("ascii")
            if tag == "W":
                width = int(val)
            elif tag == "H":
                height = int(val)
            elif tag == "F":
                num, den = val.split(":")
                fps_num, fps_den = int(num), int(den)
            elif tag == "C":
                cspace = "mono" if val.startswith("mono") else val[:3]
    except (ValueError, UnicodeDecodeError) as e:
        raise CodecError(f"bad Y4M header: {e}") from e
    if not width or not height:
        raise CodecError("Y4M header missing W/H")
    if cspace not in _Y4M_PLANES:
        raise CodecError(f"unsupported Y4M colorspace C{cspace}")
    _luma, cx, cy = _Y4M_PLANES[cspace]
    y_size = width * height
    frame_size = y_size + (2 * (width // cx) * (height // cy) if cx else 0)
    pos = nl + 1
    y_planes = []
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise CodecError("bad FRAME marker")
        frame = data[fnl + 1 : fnl + 1 + frame_size]
        if len(frame) != frame_size:
            raise CodecError("truncated frame")
        y_planes.append(frame[:y_size])
        pos = fnl + 1 + frame_size
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "n_frames": len(y_planes),
        "y_planes": y_planes,
    }


def encode_y4m(
    width: int,
    height: int,
    y_planes: list[bytes],
    fps: tuple[int, int] = (25, 1),
    cspace: str = "420",
) -> bytes:
    """Minimal Y4M encoder (chroma planes neutral 0x80) -- used by the
    synthetic-asset generator so video decode tests run on real Y4M."""
    if cspace not in _Y4M_PLANES:
        raise CodecError(f"unsupported Y4M colorspace C{cspace}")
    _luma, cx, cy = _Y4M_PLANES[cspace]
    chroma = bytes([0x80]) * (2 * (width // cx) * (height // cy)) if cx else b""
    cname = {"420": "420jpeg", "422": "422", "444": "444", "mono": "mono"}[cspace]
    head = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{cname}\n"
    out = [head.encode("ascii")]
    for y in y_planes:
        if len(y) != width * height:
            raise CodecError("y plane size mismatch")
        out.append(b"FRAME\n")
        out.append(bytes(y) + chroma)
    return b"".join(out)


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


def video_feature(data: bytes) -> list[float]:
    """16-dim real video feature from raw bytes (decode + compute)."""
    return video_feature_from(decode_y4m(data))


def video_feature_from(vid: dict) -> list[float]:
    """16-dim real video feature from an ALREADY-decoded Y4M dict --
    mean luma per temporal slice (frames bucketed into 16 equal time
    slices), [0, 1]. Split from video_feature so the extraction hot
    path decodes each payload exactly once."""
    frames = vid["y_planes"]
    if not frames:
        return [0.0] * FEATURE_DIM
    means = [sum(y) / len(y) for y in frames]
    out = []
    n = len(means)
    for i in range(FEATURE_DIM):
        lo = i * n // FEATURE_DIM
        hi = max((i + 1) * n // FEATURE_DIM, lo + 1)
        chunk = means[lo:hi] if lo < n else means[-1:]
        out.append(round(sum(chunk) / len(chunk) / 255.0, 6))
    return out


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
