"""Mover-attribution contract of tools/compare_bench.py (VERDICT r12
item 2): every wall-clock regression must be labeled with its evidence
class so a run-context change (suite reorder, cache-hermeticity change)
cannot masquerade as — or mask — a plan or contention event.

    plan          counters changed
    contention    the query's own section canary rose with it
    context-shift min AND median up, counters unchanged, canary quiet
    burst         median up but rep-minimum stable
"""

import json
import subprocess
import sys


def _run(tmp_path, old: dict, new: dict, threshold: float = 1.5) -> str:
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/compare_bench.py",
         str(po), str(pn), "--threshold", str(threshold)],
        capture_output=True, text=True, check=True,
    )
    return proc.stdout


def _detail(times, mins, counters=None, sections=None):
    d = {"queries": times, "queries_min": mins}
    if counters is not None:
        d["queries_counters"] = counters
    if sections is not None:
        d["sections"] = sections
    return d


COUNT = {"jobs": 10, "stages": 10, "shuffle_write_bytes": 1000}


def test_context_shift_min_and_median_up_counters_unchanged(tmp_path):
    old = _detail({"q": 1.0, "noise_canary": 0.2}, {"q": 0.95},
                  {"q": COUNT})
    new = _detail({"q": 2.0, "noise_canary": 0.2}, {"q": 1.9},
                  {"q": COUNT})
    out = _run(tmp_path, old, new)
    assert "[context-shift]" in out
    assert "no plan changes" in out


def test_burst_median_up_min_stable(tmp_path):
    old = _detail({"q": 1.0, "noise_canary": 0.2}, {"q": 0.95},
                  {"q": COUNT})
    new = _detail({"q": 2.0, "noise_canary": 0.2}, {"q": 1.0},
                  {"q": COUNT})
    out = _run(tmp_path, old, new)
    assert "[burst]" in out


def test_plan_class_wins_over_min_evidence(tmp_path):
    old = _detail({"q": 1.0, "noise_canary": 0.2}, {"q": 0.95},
                  {"q": COUNT})
    new = _detail({"q": 2.0, "noise_canary": 0.2}, {"q": 1.9},
                  {"q": {"jobs": 20, "stages": 20,
                         "shuffle_write_bytes": 1000}})
    out = _run(tmp_path, old, new)
    assert "[plan]" in out
    assert "PLAN CHANGED" in out


def test_contention_when_section_canary_rises(tmp_path):
    # the query's own section canary rose with it AND the section-
    # normalized ratio still crosses the threshold -> contention, not
    # context shift (the min also rose, but the canary explains it)
    sections_old = {"s": {"canary_sec": 0.2, "queries": ["q"]}}
    sections_new = {"s": {"canary_sec": 0.4, "queries": ["q"]}}
    old = _detail({"q": 1.0, "noise_canary": 0.2}, {"q": 0.95},
                  {"q": COUNT}, sections_old)
    new = _detail({"q": 4.0, "noise_canary": 0.2}, {"q": 3.8},
                  {"q": COUNT}, sections_new)
    out = _run(tmp_path, old, new)
    assert "[contention]" in out


def test_counter_mover_with_changed_context_is_annotated(tmp_path):
    # VERDICT r12 item 3: the same code measures different counters
    # cold vs warm (index_build 39 jobs cold-session, 21 post-suite).
    # When a counter mover's section context differs between runs the
    # diff must say so, so a suite reorder cannot masquerade as (or
    # mask) a plan change.
    sections_old = {"main_00": {"canary_sec": 0.2, "queries": ["q"],
                                "context": "warm-session, slot 0"}}
    sections_new = {"serving": {"canary_sec": 0.2, "queries": ["q"],
                                "context": "cold-session (serve-first)"}}
    old = _detail({"q": 1.0, "noise_canary": 0.2}, {"q": 0.95},
                  {"q": COUNT}, sections_old)
    new = _detail({"q": 1.1, "noise_canary": 0.2}, {"q": 1.0},
                  {"q": {"jobs": 20, "stages": 20,
                         "shuffle_write_bytes": 1000}}, sections_new)
    out = _run(tmp_path, old, new)
    assert "MEASUREMENT CONTEXT CHANGED" in out
    assert "cold-session (serve-first)" in out


def test_counter_mover_same_context_not_annotated(tmp_path):
    sections = {"main_00": {"canary_sec": 0.2, "queries": ["q"],
                            "context": "warm-session, slot 0"}}
    old = _detail({"q": 1.0, "noise_canary": 0.2}, {"q": 0.95},
                  {"q": COUNT}, sections)
    new = _detail({"q": 1.1, "noise_canary": 0.2}, {"q": 1.0},
                  {"q": {"jobs": 20, "stages": 20,
                         "shuffle_write_bytes": 1000}}, sections)
    out = _run(tmp_path, old, new)
    assert "PLAN CHANGED" in out
    assert "MEASUREMENT CONTEXT CHANGED" not in out


def test_quiet_run_reports_no_regressions(tmp_path):
    old = _detail({"q": 1.0, "noise_canary": 0.2}, {"q": 0.95},
                  {"q": COUNT})
    new = _detail({"q": 1.05, "noise_canary": 0.2}, {"q": 1.0},
                  {"q": COUNT})
    out = _run(tmp_path, old, new)
    assert "no regressions past threshold" in out
