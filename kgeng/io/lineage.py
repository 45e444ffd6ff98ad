"""Snapshot + lineage resume protocol.

The reference checkpoints its stages as pickle files and re-runs
stages manually (``Kuzu/kuzu_build_graph_csv.py:674-731``). Here every
pipeline stage commits a lineage row — stage name, input fingerprint,
row count, content hash — next to its output; a re-run consults the
log and skips any stage whose fingerprint already committed, resuming
from the last snapshot without recomputation (BASELINE.json
north_star).

Backend: one tiny JSON file per commit under ``<out>/_lineage/``
(commit files are written atomically via rename). On an Iceberg
deployment the same three-call protocol — fingerprint, check, commit —
runs over snapshot-summary properties instead:
:class:`kgeng.io.iceberg.IcebergLineage` is that backend, and the
module docstring of :mod:`kgeng.io.iceberg` is the full commit
contract (atomic CAS commit, snapshot-isolated readers, id-based
schema evolution, partition-spec mapping) at the 10⁹-page target.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def fingerprint_paths(*paths: str, extra: str = "") -> str:
    """Deterministic fingerprint of a stage's inputs: root-relative
    path + size + nanosecond mtime of every underlying file (parquet
    dirs walk their part files).

    Root-relative paths (not basenames) mean a part file moved between
    partition subdirectories changes the digest, and ``st_mtime_ns``
    (not whole seconds) means a same-size rewrite within one second
    does too — either would otherwise let the resume protocol silently
    skip recomputation on changed input."""
    h = hashlib.sha256()
    h.update(extra.encode())
    for p in sorted(paths):
        h.update(p.encode())
        if os.path.isdir(p):
            for root, _dirs, files in sorted(os.walk(p)):
                rel_root = os.path.relpath(root, p)
                for f in sorted(files):
                    if f.startswith((".", "_")):
                        continue
                    st = os.stat(os.path.join(root, f))
                    rel = os.path.join(rel_root, f)
                    h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
        elif os.path.exists(p):
            st = os.stat(p)
            h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


class LineageLog:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, stage: str, fingerprint: str) -> str:
        return os.path.join(self.dir, f"{stage}-{fingerprint}.json")

    def committed(self, stage: str, fingerprint: str) -> dict | None:
        p = self._path(stage, fingerprint)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as fh:
                return json.load(fh)
        return None

    def commit(
        self,
        stage: str,
        fingerprint: str,
        row_count: int,
        output_path: str,
        content_hash: str | None = None,
        metrics: dict | None = None,
        df=None,
    ) -> dict:
        """Commit a stage. ``df`` is accepted (and ignored) so both
        lineage backends share one signature — here the stage output is
        already on disk at ``output_path`` by commit time, while the
        Iceberg backend's commit IS the data append
        (``kgeng.io.iceberg.IcebergLineage.commit``);
        ``tests/test_iceberg.py`` holds the conformance test."""
        rec = {
            "stage": stage,
            "input_fingerprint": fingerprint,
            "row_count": row_count,
            "output_path": output_path,
            "content_hash": content_hash,
            "metrics": metrics or {},
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = self._path(stage, fingerprint) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(rec, fh, indent=1)
        os.replace(tmp, self._path(stage, fingerprint))
        return rec

    def entries(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f), encoding="utf-8") as fh:
                    out.append(json.load(fh))
        return out
