#!/usr/bin/env python
"""Kernel-level language-ID microbench: the vectorized numpy path vs
the original per-char scalar loop, on the real sf0.1 documents text
(plus a 10x replication for the scale trend).  Run:
    python scripts/bench_langid.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from rdfa_spark.functions.text import (  # noqa: E402
    _langid_numpy, _langid_scalar)


def best_of(fn, n):
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"]).column(0).to_pylist()
    _langid_numpy(["warm"])
    _langid_scalar(["warm"])
    assert _langid_numpy(texts) == _langid_scalar(texts)
    tn = best_of(lambda: _langid_numpy(texts), 7)
    ts = best_of(lambda: _langid_scalar(texts), 3)
    print(f"1x  ({len(texts)} docs): scalar {ts:.3f}s "
          f"numpy {tn:.3f}s speedup {ts / tn:.1f}x")
    big = texts * 10
    assert _langid_numpy(big) == _langid_scalar(big)
    tn10 = best_of(lambda: _langid_numpy(big), 3)
    ts10 = best_of(lambda: _langid_scalar(big), 1)
    print(f"10x ({len(big)} docs): scalar {ts10:.2f}s "
          f"numpy {tn10:.2f}s speedup {ts10 / tn10:.1f}x")


if __name__ == "__main__":
    main()
