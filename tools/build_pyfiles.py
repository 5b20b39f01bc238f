"""Build ``frontier.zip`` for cluster submission:

    python tools/build_pyfiles.py [out.zip]
    spark-submit --py-files frontier.zip jobs/crawl.py ...

The archive is DETERMINISTIC (sorted entries, pinned timestamps, no
__pycache__), so re-building on the same tree is byte-identical —
artifact hashes can gate deploys. The package is zip-safe by
construction (no __file__-relative data loads anywhere in
``frontier/``); tests/test_pyfiles.py proves a fresh interpreter can
import and run the kernel from the zip alone.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(os.path.join(REPO, "frontier")):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                p = os.path.join(root, f)
                arcname = os.path.relpath(p, REPO)
                zi = zipfile.ZipInfo(arcname,
                                     date_time=(1980, 1, 1, 0, 0, 0))
                zi.external_attr = 0o644 << 16
                with open(p, "rb") as fh:
                    z.writestr(zi, fh.read(),
                               compress_type=zipfile.ZIP_DEFLATED)
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "frontier.zip")
    n = build(out)
    print(f"wrote {out} ({n} modules)")
