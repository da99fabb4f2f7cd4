"""Pure-stdlib media decoders for the multimodal real-decode path.

No PIL/ffmpeg in this container, so the formats the stdlib can
genuinely decode are implemented for real:

* PNG  — full pixel decode (zlib inflate + filters 0-4, 8-bit
  gray/RGB/gray+alpha/RGBA), 16-dim 4x4 mean-luminance grid feature;
* WAV  — full sample decode via ``wave`` (8/16-bit PCM), 16-bin RMS
  envelope feature;
* JPEG — dimensions from the SOF marker (pixel decode needs a DCT
  library; feature stays None);
* GIF  — dimensions from the logical screen descriptor, frame count
  from the block walk;
* WEBP — dimensions from the VP8X/VP8L/'VP8 ' headers;
* MP4  — dimensions, frame count and duration from the ISO-BMFF box
  structure (public ISO/IEC 14496-12: moov/trak/tkhd for the visual
  track's 16.16-fixed width/height, stbl/stts for the sample count,
  mdhd for timescale/duration) — stdlib-only byte walking.

Pixel/sample decode for formats whose bitstreams need a codec the
stdlib lacks (JPEG/WebP DCT, MP4 video) stays out of scope: those
return dims-level metadata with ``feature=None``.  A format the
sniffer can't identify raises NotImplementedError at the decode
site — the honest boundary where PIL/ffmpeg plug in on a real
cluster.
"""

from __future__ import annotations

import io
import math
import struct
import wave
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str:
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:3] == b"GIF":
        return "gif"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[4:8] == b"ftyp" and payload[8:12] in _MP4_BRANDS:
        return "mp4"
    return "unknown"


# ISO-BMFF major brands this decoder actually handles (classic MP4
# families).  Other ftyp brands — HEIC/AVIF stills, MOV, 3GP,
# moov-less fragmented-MP4 segments — sniff 'unknown' so
# extract_features' skip mode routes them to skipped_assets instead
# of crashing the job on mp4_metadata's ValueError (ADVICE r6).
_MP4_BRANDS = frozenset([
    b"isom", b"iso2", b"iso3", b"iso4", b"iso5", b"iso6",
    b"mp41", b"mp42", b"mp4v", b"avc1", b"M4V ", b"M4A ", b"mmp4",
])


def _unfilter_scalar(line: bytearray, prev: bytes, filt: int, w: int,
                     nch: int) -> bytearray:
    """PNG Average/Paeth unfilter.  Both predictors read the already-
    reconstructed LEFT pixel, a genuine sequential data dependency
    along the scanline — no closed-form vectorization exists (libpng
    runs these serially too), so they stay a per-byte loop.  Rows with
    filters 0/1/2 (the common ones) take the numpy path in
    ``decode_png``.

    ``prev`` must be ``bytes``/``bytearray`` (plain-int indexing), not
    a numpy uint8 array: under NumPy >= 2 (NEP 50) ``a + prev[i]``
    with a uint8 scalar stays uint8 and wraps mod 256, silently
    corrupting Average/Paeth rows; bytes indexing yields Python ints
    with unbounded arithmetic on every numpy version."""
    assert not hasattr(prev, "dtype"), \
        "pass bytes, not a numpy array (NEP 50 uint8 wrap)"
    stride = w * nch
    if filt == 3:                     # Average
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0
            line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
    else:                             # Paeth
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else \
                (b if pb <= pc else c)
            line[i] = (line[i] + pred) & 255
    return line


def decode_png(data: bytes):
    """-> (width, height, gray) where gray is a (h, w) float64 numpy
    array of row-major luminance in [0,1].  Supports 8-bit depth,
    color types 0/2/4/6, no interlace.

    Vectorized with numpy: Sub is a per-channel cumulative sum mod
    256, Up a vector add, None a copy; the luminance conversion is one
    integer matrix sum per image (exact: integer sums then a single
    float64 divide, so results are deterministic across executors).
    Average/Paeth rows fall back to the scalar loop (sequential
    left-pixel dependency — see ``_unfilter_scalar``)."""
    import numpy as np

    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = bit_depth = color_type = interlace = None
    while pos + 8 <= len(data):
        (length,), typ = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        pos += 8
        chunk = data[pos:pos + length]
        pos += length + 4            # skip CRC
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS \
            or interlace != 0:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} unsupported by the stdlib decoder")
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = scan[:, 0]
    out = np.empty((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        filt = int(filters[y])
        line = scan[y, 1:].astype(np.int64)
        if filt == 0:
            rec = line
        elif filt == 1:               # Sub: cumsum per channel mod 256
            rec = (np.cumsum(line.reshape(w, nch), axis=0)
                   .reshape(stride)) & 255
        elif filt == 2:               # Up
            rec = (line + prev) & 255
        elif filt in (3, 4):          # Average / Paeth: scalar path
            rec = np.frombuffer(
                bytes(_unfilter_scalar(
                    bytearray(scan[y, 1:].tobytes()),
                    prev.astype(np.uint8).tobytes(), filt, w, nch)),
                dtype=np.uint8).astype(np.int64)
        else:
            raise ValueError(f"bad PNG filter {filt}")
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, nch)
    if color_type in (0, 4):
        gray = px[:, :, 0] / 255.0
    else:
        gray = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) / 765.0
    return w, h, gray


def grid_feature(gray, w: int, h: int, n: int = 4) -> list[float]:
    """n x n mean-luminance grid, row-major — a 16-dim (n=4) image
    embedding that is deterministic and library-free.  One numpy
    block-mean per cell (accepts a numpy plane or list-of-lists)."""
    import numpy as np

    g = np.asarray(gray, dtype=np.float64)
    feat = []
    for gy in range(n):
        y0 = gy * h // n
        y1 = max((gy + 1) * h // n, y0 + 1)
        for gx in range(n):
            x0 = gx * w // n
            x1 = max((gx + 1) * w // n, x0 + 1)
            cell = g[y0:min(y1, h), x0:min(x1, w)]
            feat.append(float(cell.sum() / cell.size)
                        if cell.size else 0.0)
    return feat


def resize_gray(gray, w: int, h: int, out_w: int, out_h: int):
    """Nearest-neighbour resize of a decoded luminance plane — one
    numpy fancy-index gather; returns an (out_h, out_w) array."""
    import numpy as np

    g = np.asarray(gray, dtype=np.float64)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return g[np.ix_(ys, xs)]


def decode_wav(data: bytes):
    """-> (n_channels, framerate, n_frames, rms16) for 8/16-bit PCM.

    numpy throughout: samples via one frombuffer, each RMS bin as an
    exact int64 sum of squares (bit-identical to the scalar
    ``sum(s*s)`` — integer arithmetic) before the single float
    sqrt/divide."""
    import numpy as np

    wf = wave.open(io.BytesIO(data))
    nch = wf.getnchannels()
    width = wf.getsampwidth()
    framerate = wf.getframerate()
    n_frames = wf.getnframes()
    frames = wf.readframes(n_frames)
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int64)
        full = 32768.0
    elif width == 1:                  # unsigned 8-bit PCM
        samples = np.frombuffer(frames, dtype=np.uint8) \
                    .astype(np.int64) - 128
        full = 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM unsupported")
    mono = samples[::nch] if nch > 1 else samples
    n = len(mono)
    rms = []
    for i in range(16):
        seg = mono[i * n // 16:(i + 1) * n // 16]
        if len(seg) == 0:
            rms.append(0.0)
        else:
            rms.append(math.sqrt(int((seg * seg).sum())
                                 / len(seg)) / full)
    return nch, framerate, n_frames, rms


def jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF0-SOF15 marker."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            return w, h
        pos += 2 + seglen
    raise ValueError("no SOF marker found")


def gif_dimensions(data: bytes) -> tuple[int, int]:
    w, h = struct.unpack("<HH", data[6:10])
    return w, h


def gif_frames(data: bytes) -> int:
    """Frame count by walking the GIF89a block structure (public
    spec): skip the logical screen descriptor + optional global color
    table, then count image descriptors (0x2C), skipping extensions
    (0x21, label + data sub-blocks) and each image's optional local
    color table + LZW data sub-blocks, until the 0x3B trailer.
    Truncated files raise ValueError (never a silent count)."""
    if data[:3] != b"GIF":
        raise ValueError("not a GIF")
    pos = 6 + 7                        # header + LSD
    packed = data[10]
    if packed & 0x80:                  # global color table
        pos += 3 * (2 << (packed & 0x07))
    frames = 0

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(data):
                raise ValueError("truncated GIF sub-blocks")
            n = data[p]
            p += 1
            if n == 0:
                return p
            p += n

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:              # trailer
            return frames
        if block == 0x21:              # extension: label + sub-blocks
            pos = skip_subblocks(pos + 1)
        elif block == 0x2C:            # image descriptor
            if pos + 9 > len(data):
                raise ValueError("truncated GIF image descriptor")
            lpacked = data[pos + 8]
            pos += 9
            if lpacked & 0x80:         # local color table
                pos += 3 * (2 << (lpacked & 0x07))
            pos += 1                   # LZW minimum code size
            pos = skip_subblocks(pos)
            frames += 1
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("GIF missing trailer")


def webp_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the WebP header — all three container
    variants, per the public WebP container/bitstream specs:

    * VP8X (extended): 24-bit canvas width-1 / height-1;
    * VP8L (lossless): 14-bit width-1 / height-1 packed after the
      0x2F signature byte;
    * 'VP8 ' (lossy): 14-bit dims after the 3-byte frame tag and the
      9D 01 2A start code of the first keyframe.
    """
    chunk = data[12:16]
    if chunk == b"VP8X":
        if len(data) < 30:
            raise ValueError("truncated VP8X header")
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return w, h
    if chunk == b"VP8L":
        if len(data) < 25 or data[20] != 0x2F:
            raise ValueError("bad VP8L signature")
        bits = int.from_bytes(data[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return w, h
    if chunk == b"VP8 ":
        if len(data) < 30:
            raise ValueError("truncated VP8 header")
        if data[23:26] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 keyframe start code")
        w = struct.unpack("<H", data[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", data[28:30])[0] & 0x3FFF
        return w, h
    raise ValueError(f"unknown WebP chunk {chunk!r}")


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for each ISO-BMFF box in
    data[start:end].  Handles 64-bit largesize (size==1) and
    to-end-of-file (size==0); truncated boxes raise ValueError."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("truncated MP4 box")
        yield typ, pos + hdr, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int,
              typ: bytes) -> tuple[int, int] | None:
    for t, b, e in _iter_boxes(data, start, end):
        if t == typ:
            return b, e
    return None


def mp4_metadata(data: bytes):
    """-> (width, height, n_frames, duration_ms) from the ISO-BMFF
    box structure, stdlib-only (ISO/IEC 14496-12 is a public spec):

    * width/height: the first trak whose tkhd carries nonzero
      16.16-fixed presentation dims (the visual track);
    * n_frames: sum of stts sample counts in that track's stbl;
    * duration_ms: that track's mdhd duration / timescale.

    Malformed/truncated boxes raise ValueError (same contract as a
    truncated PNG) — never a silent partial answer."""
    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file")
    moov = _find_box(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box")
    for typ, tb, te in _iter_boxes(data, *moov):
        if typ != b"trak":
            continue
        tkhd = _find_box(data, tb, te, b"tkhd")
        if tkhd is None:
            continue
        p, pe = tkhd
        if p >= pe:                    # empty body (size == header)
            raise ValueError("truncated tkhd box")
        ver = data[p]
        # after version+flags: v0 ctime/mtime/id/rsvd/duration = 20
        # bytes, v1 = 32; then rsvd(8) layer(2) altgrp(2) volume(2)
        # rsvd(2) matrix(36), then 16.16-fixed width/height
        p += 4 + (32 if ver == 1 else 20) + 8 + 2 + 2 + 2 + 2 + 36
        if p + 8 > pe:
            raise ValueError("truncated tkhd box")
        w = int.from_bytes(data[p:p + 4], "big") >> 16
        h = int.from_bytes(data[p + 4:p + 8], "big") >> 16
        if w == 0 or h == 0:
            continue                   # non-visual track (audio/hint)
        mdia = _find_box(data, tb, te, b"mdia")
        if mdia is None:
            raise ValueError("visual trak missing mdia")
        n_frames = duration_ms = None
        mdhd = _find_box(data, *mdia, b"mdhd")
        if mdhd is not None:
            q, qe = mdhd
            if q >= qe:                # empty body (size == header)
                raise ValueError("truncated mdhd box")
            mver = data[q]
            if mver == 1:              # ctime8 mtime8 tscale4 dur8
                if q + 32 > qe:
                    raise ValueError("truncated mdhd box")
                tscale = int.from_bytes(data[q + 20:q + 24], "big")
                dur = int.from_bytes(data[q + 24:q + 32], "big")
            else:                      # ctime4 mtime4 tscale4 dur4
                if q + 20 > qe:
                    raise ValueError("truncated mdhd box")
                tscale = int.from_bytes(data[q + 12:q + 16], "big")
                dur = int.from_bytes(data[q + 16:q + 20], "big")
            if tscale:
                duration_ms = int(dur * 1000 / tscale)
        minf = _find_box(data, *mdia, b"minf")
        stbl = _find_box(data, *minf, b"stbl") if minf else None
        stts = _find_box(data, *stbl, b"stts") if stbl else None
        if stts is not None:
            q, qe = stts
            if q + 8 > qe:
                raise ValueError("truncated stts box")
            n_entries = int.from_bytes(data[q + 4:q + 8], "big")
            if q + 8 + 8 * n_entries > qe:
                raise ValueError("truncated stts entries")
            n_frames = sum(
                int.from_bytes(data[q + 8 + 8 * i:
                                    q + 12 + 8 * i], "big")
                for i in range(n_entries))
        if n_frames is None:
            raise ValueError("visual trak missing stts")
        return w, h, n_frames, duration_ms
    raise ValueError("MP4 has no visual track")


def real_decode(payload: bytes, kind: str):
    """-> (width, height, n_frames, feature) using the stdlib codecs;
    raises NotImplementedError for formats without one (MP4, ...)."""
    fmt = sniff_format(payload)
    if fmt == "png":
        w, h, gray = decode_png(payload)
        return w, h, 1, grid_feature(gray, w, h)
    if fmt == "wav":
        nch, framerate, n_frames, rms = decode_wav(payload)
        # width/height carry (sample rate, channels) for audio
        return framerate, nch, n_frames, rms
    if fmt == "jpeg":
        w, h = jpeg_dimensions(payload)
        return w, h, 1, None          # dims only: no stdlib DCT
    if fmt == "gif":
        w, h = gif_dimensions(payload)
        try:
            nf = gif_frames(payload)
        except ValueError:
            nf = 1                    # dims-only on malformed blocks
        return w, h, nf, None
    if fmt == "webp":
        w, h = webp_dimensions(payload)
        return w, h, 1, None          # dims only: no stdlib VP8 DCT
    if fmt == "mp4":
        w, h, nf, _dur = mp4_metadata(payload)
        return w, h, nf, None         # dims only: no stdlib H.26x
    raise NotImplementedError(
        f"no stdlib decoder for format={fmt!r} kind={kind!r} "
        "(plug PIL/ffmpeg in here on a real cluster)")
