"""Micro-bench: numpy-vectorized PNG/WAV decode vs the round-2
scalar reference, on a ~1 MP image / 10 s stereo clip.

Run:  python scripts/bench_codecs.py
Prints one JSON line {png_scalar_s, png_numpy_s, png_speedup, ...}.
"""

from __future__ import annotations

import io
import json
import math
import os
import struct
import sys
import time
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from rdfa_spark.functions.codecs import decode_png, decode_wav  # noqa: E402
from tests.test_codecs_ab import (_decode_png_reference,  # noqa: E402
                                  _encode_png, _pseudo_image)


def main() -> dict:
    # ~1 MP RGB image, realistic filter mix (None/Sub/Up rows)
    px = _pseudo_image(1024, 1024)
    png = _encode_png(px, [0, 1, 2])

    t0 = time.perf_counter()
    _, _, g_ref = _decode_png_reference(png)
    t_scalar = time.perf_counter() - t0

    t0 = time.perf_counter()
    _, _, g_new = decode_png(png)
    t_numpy = time.perf_counter() - t0
    assert np.array_equal(g_new, np.array(g_ref))

    # 10 s stereo 44.1 kHz WAV
    n, rate = 441_000, 44_100
    i = np.arange(n)
    samp = (12000 * np.sin(2 * np.pi * 440 * i / rate)).astype("<i2")
    buf = io.BytesIO()
    wf = wave.open(buf, "wb")
    wf.setnchannels(2)
    wf.setsampwidth(2)
    wf.setframerate(rate)
    wf.writeframes(np.stack([samp, samp // 2], axis=1).tobytes())
    wf.close()
    wav = buf.getvalue()

    t0 = time.perf_counter()
    frames = wave.open(io.BytesIO(wav)).readframes(n)
    import array as arr_mod
    samples = arr_mod.array("h", frames)
    mono = samples[::2]
    m = len(mono)
    segs = [mono[j * m // 16:(j + 1) * m // 16] for j in range(16)]
    ref_rms = [math.sqrt(sum(s * s for s in seg) / len(seg))
               / 32768.0 for seg in segs]
    t_wav_scalar = time.perf_counter() - t0

    t0 = time.perf_counter()
    _, _, _, new_rms = decode_wav(wav)
    t_wav_numpy = time.perf_counter() - t0
    assert new_rms == ref_rms

    out = {
        "png_mp": 1.05, "png_scalar_s": round(t_scalar, 3),
        "png_numpy_s": round(t_numpy, 3),
        "png_speedup": round(t_scalar / t_numpy, 1),
        "wav_s10_scalar_s": round(t_wav_scalar, 3),
        "wav_s10_numpy_s": round(t_wav_numpy, 3),
        "wav_speedup": round(t_wav_scalar / t_wav_numpy, 1),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
