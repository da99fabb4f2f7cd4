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


# ---------------------------------------------------------------------------
# MP4 ISO-BMFF metadata (stdlib box walk vs hand-laid-out fixtures)
# ---------------------------------------------------------------------------

def _box(typ: bytes, payload: bytes, largesize: bool = False) -> bytes:
    import struct
    if largesize:
        return (struct.pack(">I", 1) + typ
                + struct.pack(">Q", 16 + len(payload)) + payload)
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _tkhd(w: int, h: int, version: int = 0) -> bytes:
    import struct
    head = bytes([version]) + b"\x00\x00\x07"
    fixed = (b"\x00" * 32) if version == 1 else (b"\x00" * 20)
    mid = b"\x00" * 8 + b"\x00" * 2 * 4 + b"\x00" * 36
    dims = struct.pack(">II", w << 16, h << 16)
    return _box(b"tkhd", head + fixed + mid + dims)


def _mdhd(timescale: int, duration: int, version: int = 0) -> bytes:
    import struct
    if version == 1:
        body = (b"\x01\x00\x00\x00" + b"\x00" * 16
                + struct.pack(">IQ", timescale, duration)
                + b"\x55\xc4\x00\x00")
    else:
        body = (b"\x00" * 4 + b"\x00" * 8
                + struct.pack(">II", timescale, duration)
                + b"\x55\xc4\x00\x00")
    return _box(b"mdhd", body)


def _stts(entries: list[tuple[int, int]]) -> bytes:
    import struct
    body = b"\x00" * 4 + struct.pack(">I", len(entries))
    for count, delta in entries:
        body += struct.pack(">II", count, delta)
    return _box(b"stts", body)


def _make_mp4(w=640, h=360, frames=((24, 512), (6, 256)),
              timescale=12800, duration=12800 * 5,
              tkhd_version=0, mdhd_version=0, with_audio=True,
              moov_largesize=False) -> bytes:
    """Minimal valid ISO-BMFF file laid out by hand from the public
    ISO/IEC 14496-12 spec: ftyp + moov{[audio trak,] video trak}."""
    vtrak = _box(b"trak", _tkhd(w, h, tkhd_version) + _box(
        b"mdia", _mdhd(timescale, duration, mdhd_version) + _box(
            b"minf", _box(b"stbl", _stts(list(frames))))))
    traks = b""
    if with_audio:
        # audio track first: zero tkhd dims, must be skipped
        traks += _box(b"trak", _tkhd(0, 0) + _box(
            b"mdia", _mdhd(48000, 48000) + _box(
                b"minf", _box(b"stbl", _stts([(100, 1024)])))))
    traks += vtrak
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
    return ftyp + _box(b"moov", traks, largesize=moov_largesize)


def test_mp4_metadata_box_walk():
    """Dims from the visual trak's tkhd (16.16 fixed), frame count
    from stts, duration from mdhd — audio trak (zero dims) skipped."""
    from rdfa_spark.functions.codecs import (mp4_metadata, real_decode,
                                             sniff_format)
    data = _make_mp4()
    assert sniff_format(data) == "mp4"
    w, h, nf, dur = mp4_metadata(data)
    assert (w, h) == (640, 360)
    assert nf == 30                      # 24 + 6 stts sample counts
    assert dur == 5000                   # 5 s at timescale 12800
    assert real_decode(data, "video") == (640, 360, 30, None)


def test_mp4_metadata_v1_and_largesize():
    """64-bit version-1 tkhd/mdhd layouts and a largesize moov box."""
    from rdfa_spark.functions.codecs import mp4_metadata
    data = _make_mp4(w=1920, h=1080, frames=((300, 512),),
                     timescale=30000, duration=30000 * 10,
                     tkhd_version=1, mdhd_version=1,
                     with_audio=False, moov_largesize=True)
    assert mp4_metadata(data) == (1920, 1080, 300, 10000)


def test_mp4_malformed_raises_valueerror():
    """Truncated/garbage ISO-BMFF raises ValueError (the truncated-PNG
    contract), never a silent partial answer."""
    import pytest
    from rdfa_spark.functions.codecs import mp4_metadata
    with pytest.raises(ValueError):
        mp4_metadata(b"\x00\x00\x00 ftypmp42")        # box past EOF
    with pytest.raises(ValueError):
        mp4_metadata(_make_mp4()[:60])                # truncated moov
    no_moov = _box(b"ftyp", b"isom\x00\x00\x02\x00")
    with pytest.raises(ValueError):
        mp4_metadata(no_moov)
    # audio-only file: no visual track to report
    audio_only = (_box(b"ftyp", b"isom\x00\x00\x02\x00")
                  + _box(b"moov", _box(b"trak", _tkhd(0, 0))))
    with pytest.raises(ValueError):
        mp4_metadata(audio_only)
