"""Build the --py-files archive for spark-submit.

Zips the ``transkribusdu_spark`` package (sources only, no caches) so a
job script can run with nothing but the zip on the executors::

    python tools/make_pyfiles.py            # -> dist/transkribusdu_spark.zip
    python tools/make_pyfiles.py /tmp/x.zip # -> explicit path

The archive is deterministic (sorted entries, fixed timestamps) so a
re-build of unchanged sources is byte-identical — convenient for
content-addressed artifact stores and cluster-side caching.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "transkribusdu_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    entries = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", f"{PKG}.zip")
    print(build(out))
