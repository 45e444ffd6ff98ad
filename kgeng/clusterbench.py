"""Two-cluster-size scaling pair with REAL executor-process isolation.

The north rule's scaling criterion is "the same job at two cluster
sizes". ``bench.py`` evidences it with thread-count parallelism
(``local[1]`` vs ``local[4]``, separate JVMs per measurement); this
module adds the closest single-host analogue to adding NODES: the full
KG-construction pipeline under ``local-cluster[n,cores,mem]`` at n=1
and n=2 executor JVMs on the same input. Executors are separate
processes that receive the engine only through the ``--py-files`` zip
(``kgeng.package``), shuffle over TCP, and schedule their own Python
workers — so this run class exercises exactly the seams a real
multi-node deployment adds over local mode.

Each measurement runs in a fresh subprocess (a ``local-cluster``
master cannot share the process-wide session singleton, and a cold JVM
per sample is what a cluster submission pays too). Levels are
INTERLEAVED (1,2,1,2 …) so a host slow-window hits both sides of the
ratio symmetrically, and the summary takes min-of-N per level — the
same methodology as ``bench.run_scaling`` (BENCH.md §2).

Usage::

    python -m kgeng.clusterbench [--pages 360000] [--repeats 2]
                                 [--cores 4] [--mem-mb 4096]

Prints one JSON line per measurement and a final summary line with
``efficiency = t1 / (2 * t2)``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pair_efficiency(t1_samples: list[float], t2_samples: list[float]) -> dict:
    """min-of-N per level → scaling efficiency for a 1→2 executor pair.

    eff = t1 / (2 * t2): 1.0 means doubling executors halved the wall
    clock. Pure function so the methodology is unit-testable without a
    cluster.
    """
    t1, t2 = min(t1_samples), min(t2_samples)
    return {
        "t1_s": round(t1, 3),
        "t2_s": round(t2, 3),
        "samples_1": [round(s, 3) for s in t1_samples],
        "samples_2": [round(s, 3) for s in t2_samples],
        "speedup": round(t1 / t2, 3),
        "efficiency": round(t1 / (2.0 * t2), 3),
    }


def run_one(n_execs: int, cores: int, mem_mb: int, pages: int) -> dict:
    """Child-process body: one full-pipeline measurement under
    local-cluster[n_execs, cores, mem_mb]."""
    # bench.py owns the deterministic corpus cache (same file naming →
    # the pair corpus built by bench runs is reused); root-level import
    # is driver-side only, executors see just the kgeng zip.
    sys.path.insert(0, REPO)
    import bench

    from kgeng.pipeline import run_pipeline
    from kgeng.session import get_spark

    pages_path, dict_path = bench.bench_corpus(pages)
    out_dir = os.path.join(bench.FIX, f"cluster_pipe_{n_execs}")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    # authoritative, not setdefault: a stale KGENG_EXECUTOR_MEM from
    # the shell (test_cluster.py exports one) would request executor
    # heap the local-cluster workers' mem_mb can't grant — executors
    # never register and the child burns its whole timeout
    os.environ["KGENG_EXECUTOR_MEM"] = f"{mem_mb}m"
    spark = get_spark(
        "kgeng-cluster-pair",
        master=f"local-cluster[{n_execs},{cores},{mem_mb}]",
        shuffle_partitions=n_execs * cores,
    )
    assert spark.sparkContext.master.startswith("local-cluster")
    t0 = time.time()
    res = run_pipeline(spark, pages_path, dict_path, out_dir)
    dt = time.time() - t0
    spark.stop()
    return {
        "execs": n_execs,
        "cores_per_exec": cores,
        "pages": pages,
        "triples": res["metrics"]["canon"]["rows"],
        "seconds": round(dt, 3),
        "triples_per_sec": round(res["metrics"]["canon"]["rows"] / dt, 1),
        "stages": {k: v["seconds"] for k, v in res["metrics"].items()},
    }


def _attempt(n_execs: int, args, timeout: int = 2400) -> dict | None:
    cmd = [
        sys.executable, "-m", "kgeng.clusterbench", "--one", str(n_execs),
        "--pages", str(args.pages), "--cores", str(args.cores),
        "--mem-mb", str(args.mem_mb),
    ]
    # bench.dump_fail_log: append-mode full-stderr capture — the same
    # root-cause-preservation contract as bench.pipeline_attempt
    sys.path.insert(0, REPO)
    import bench

    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, timeout=timeout
        )
    except subprocess.TimeoutExpired as e:
        log = bench.dump_fail_log(f"execs{n_execs}", e.stderr)
        print(
            f"[clusterbench] execs={n_execs}: TIMEOUT"
            + (f" (partial stderr: {log})" if log else ""),
            file=sys.stderr,
        )
        return None
    if r.returncode != 0:
        log = bench.dump_fail_log(f"execs{n_execs}", r.stderr)
        print(
            f"[clusterbench] execs={n_execs}: rc={r.returncode} "
            f"(full stderr: {log})\n" + (r.stderr or "")[-2000:],
            file=sys.stderr,
        )
        return None
    try:
        m = json.loads(r.stdout.strip().splitlines()[-1])
    except (IndexError, json.JSONDecodeError):
        print(f"[clusterbench] execs={n_execs}: unparseable", file=sys.stderr)
        return None
    print(json.dumps(m), flush=True)
    return m


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", type=int, default=360_000)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--mem-mb", type=int, default=4096)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--one", type=int, default=None, help="child mode")
    args = ap.parse_args()
    if args.one is not None:
        print(json.dumps(run_one(args.one, args.cores, args.mem_mb, args.pages)))
        return
    t1s: list[float] = []
    t2s: list[float] = []
    for _ in range(args.repeats):
        m1 = _attempt(1, args)
        m2 = _attempt(2, args)
        if m1:
            t1s.append(m1["seconds"])
        if m2:
            t2s.append(m2["seconds"])
    if not (t1s and t2s):
        print(json.dumps({"error": "no complete pair"}))
        sys.exit(1)
    summary = {"metric": "cluster_pair_1v2_execs", **pair_efficiency(t1s, t2s)}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
