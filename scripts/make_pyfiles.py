#!/usr/bin/env python
"""Package rdfa_spark into dist/rdfa_spark.zip for spark-submit
--py-files."""

import os
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(verbose: bool = False) -> str:
    out_dir = os.path.join(HERE, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "rdfa_spark.zip")
    with zipfile.ZipFile(out, "w") as z:
        pkg = os.path.join(HERE, "rdfa_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, HERE))
    if verbose:
        print(out)
    return out


if __name__ == "__main__":
    main(verbose=True)
