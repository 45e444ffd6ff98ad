"""Build the spark-submit --py-files artifact.

``python -m kgeng.package`` writes ``dist/kgeng.zip`` containing the
whole package; submit with::

    spark-submit --py-files dist/kgeng.zip your_job.py

In-process sessions (tests, bench) pass the same zip via
``spark.submit.pyFiles`` so multi-executor masters (local-cluster,
standalone, YARN, k8s) import kgeng on every executor.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "kgeng.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "kgeng")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, REPO)
                    zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build_zip())
