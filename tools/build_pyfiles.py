"""Build dist/emailcdc.zip for ``spark-submit --py-files``.

Zips the emailcdc package (source only) so every executor's python worker
can import it:

    python tools/build_pyfiles.py
    spark-submit --py-files dist/emailcdc.zip main.py replay ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "emailcdc.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "emailcdc")
        for root, _dirs, files in os.walk(pkg):
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
