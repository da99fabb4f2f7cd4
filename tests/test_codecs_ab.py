"""A/B regression: the numpy-vectorized codecs against scalar
reference implementations of the same algorithms (the round-2
per-byte loops).  Pixel planes and WAV RMS bins must be bit-equal
(integer-exact reconstructions); grid features agree to the last
few ulps (the only difference is float summation order, and the
numpy order is itself deterministic across executors)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rdfa_spark.functions.codecs import (decode_png, decode_wav,
                                         grid_feature, resize_gray)

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_png_reference(data: bytes):
    """Round-2 scalar decoder, kept verbatim as the A/B oracle."""
    pos, idat = 8, []
    w = h = color_type = None
    while pos + 8 <= len(data):
        (length,), typ = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        pos += 8
        chunk = data[pos:pos + length]
        pos += length + 4
        if typ == b"IHDR":
            w, h, _, color_type, _, _, _ = \
                struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    prev = bytearray(stride)
    gray = []
    pos = 0
    for _ in range(h):
        filt = raw[pos]
        pos += 1
        line = bytearray(raw[pos:pos + stride])
        pos += stride
        if filt == 1:
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 255
        elif filt == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 255
        elif filt == 3:
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif filt == 4:
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 255
        prev = line
        if color_type in (0, 4):
            row = [line[x * nch] / 255.0 for x in range(w)]
        else:
            row = [(line[x * nch] + line[x * nch + 1]
                    + line[x * nch + 2]) / (3 * 255.0)
                   for x in range(w)]
        gray.append(row)
    return w, h, gray


def _encode_png(pixels: np.ndarray, filters: list[int]) -> bytes:
    """RGB encoder applying the given per-row filter types."""
    h, w, _ = pixels.shape
    nch, stride = 3, w * 3
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = pixels[y].reshape(stride).astype(np.int64)
        ft = filters[y % len(filters)]
        if ft == 0:
            enc = line
        elif ft == 1:
            left = np.concatenate([np.zeros(nch, dtype=np.int64),
                                   line[:-nch]])
            enc = (line - left) & 255
        elif ft == 2:
            enc = (line - prev) & 255
        elif ft == 3:
            enc = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                enc[i] = (line[i] - ((a + int(prev[i])) >> 1)) & 255
        else:                        # Paeth
            enc = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = int(line[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                enc[i] = (line[i] - pr) & 255
        out += bytes([ft]) + bytes(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def _pseudo_image(h: int, w: int) -> np.ndarray:
    """Deterministic pseudo-random RGB image (no RNG)."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 37 + y * 11) % 256
    g = (x * 13 + y * 29 + 7) % 256
    b = (x * x + y) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
def test_png_vectorized_matches_scalar_reference(filters):
    px = _pseudo_image(23, 17)
    png = _encode_png(px, filters)
    w, h, gray_new = decode_png(png)
    w2, h2, gray_ref = _decode_png_reference(png)
    assert (w, h) == (w2, h2) == (17, 23)
    # pixel plane bit-equal: unfiltering is integer-exact in both
    assert np.array_equal(gray_new, np.array(gray_ref)), filters
    # decoded luminance equals ground truth from the source pixels
    truth = (px[:, :, 0].astype(np.int64) + px[:, :, 1]
             + px[:, :, 2]) / 765.0
    assert np.array_equal(gray_new, truth)


def test_grid_and_resize_match_scalar_reference():
    px = _pseudo_image(40, 56)
    _, _, gray = decode_png(_encode_png(px, [0, 1, 2]))

    feat = grid_feature(gray, 56, 40)
    for gy in range(4):
        for gx in range(4):
            cell = gray[gy * 10:(gy + 1) * 10, gx * 14:(gx + 1) * 14]
            want = sum(float(v) for row in cell for v in row) \
                / cell.size
            assert abs(feat[gy * 4 + gx] - want) < 1e-12

    small = resize_gray(gray, 56, 40, 8, 8)
    ref = [[float(gray[y * 40 // 8][x * 56 // 8]) for x in range(8)]
           for y in range(8)]
    assert np.array_equal(small, np.array(ref))


def test_wav_vectorized_bit_equal_scalar():
    import io
    import math
    import wave

    buf = io.BytesIO()
    wf = wave.open(buf, "wb")
    wf.setnchannels(2)
    wf.setsampwidth(2)
    wf.setframerate(16000)
    frames = bytearray()
    for i in range(4000):
        v = int(12000 * math.sin(2 * math.pi * 330 * i / 16000))
        frames += struct.pack("<hh", v, -v // 2)
    wf.writeframes(bytes(frames))
    wf.close()
    data = buf.getvalue()

    nch, rate, n_frames, rms = decode_wav(data)
    assert (nch, rate, n_frames) == (2, 16000, 4000)

    # scalar reference: int sums are exact, so bins must be bit-equal
    import array as arr_mod
    samples = arr_mod.array("h", wave.open(io.BytesIO(data))
                            .readframes(4000))
    mono = samples[::2]
    n = len(mono)
    for i in range(16):
        seg = mono[i * n // 16:(i + 1) * n // 16]
        want = math.sqrt(sum(s * s for s in seg) / len(seg)) / 32768.0
        assert rms[i] == want, i
