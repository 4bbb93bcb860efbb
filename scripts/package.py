#!/usr/bin/env python
"""Build dist/derzis_spark.zip for spark-submit --py-files.

The zip contains the pure-python package only; executors import it in
their python workers (UDFs, seen-set kernels). Deterministic output:
files are added sorted with zeroed timestamps so repeated builds are
byte-identical (useful for cluster-side artifact caching)."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "derzis_spark")
OUT = os.path.join(ROOT, "dist", "derzis_spark.zip")


def build(out: str = OUT) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    entries = []
    for dirpath, _dirnames, filenames in os.walk(PKG):
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, ROOT), full))
    entries.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return out


if __name__ == "__main__":
    print(build())
