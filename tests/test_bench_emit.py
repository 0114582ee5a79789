"""The bench two-artifact emission contract (r8).

The BENCH recorder stores only the last 2000 characters of bench.py's
stdout (`tail`) plus a `parsed` field that is None whenever the final
line does not fit that window WHOLE — which is how the r2–r7 artifacts
each silently lost the alphabetically-first ~40 per-query medians, and
how the r8 `entry_started_s` addition would have pushed the canary trio
and EVERY median out of BENCH_r08.  `_emit` therefore writes the
complete result to BENCH_FULL_LATEST.json and prints a compact line
hard-capped under the window.  These tests pin that contract without
running the (multi-minute) bench itself.
"""

from __future__ import annotations

import json

import pytest

import bench


def _full(n_queries: int = 98, name_len: int = 30) -> dict:
    names = [f"query_{i:03d}_{'x' * name_len}" for i in range(n_queries)]
    names += ["medallion_pipeline_10k", "corpus_prep_pipeline"]
    queries = {n: round(0.1 + i * 0.037, 3) for i, n in enumerate(names)}
    started = {n: round(1.5 + i * 2.2, 1) for i, n in enumerate(names)}
    spreads = {n: 0.25 for n in names[:n_queries]}
    return {
        "metric": "engine_query_suite_plus_pipeline_wall_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "n_queries": n_queries,
        "reps": 3,
        "canary_s": 1.63,
        "canary_first_s": 1.2,
        "canary_last_s": 2.06,
        "entry_started_s": started,
        "canary_last_started_s": 234.5,
        "spreads": spreads,
        "subsec_entries": 60,
        "subsec_spread_median": 0.4,
        "subsec_spread_max": 2.0,
        "registry_n": n_queries,
        "oracle_n": max(0, n_queries - 6),
        "notes": "synthetic",
    }


@pytest.fixture()
def emit_to_tmp(tmp_path, monkeypatch):
    path = tmp_path / "BENCH_FULL_LATEST.json"
    monkeypatch.setattr(bench, "FULL_PATH", str(path))
    return path


def test_line_fits_recorder_window_whole(emit_to_tmp):
    line = bench._emit(_full())
    assert len(line) < bench.LINE_BUDGET
    # the recorder keeps stdout[-2000:]; the WHOLE line must survive so
    # the recorder's json parse succeeds (parsed != None for r8+)
    assert line[-2000:] == line
    parsed = json.loads(line)
    for key in ("canary_s", "canary_first_s", "canary_last_s",
                "canary_last_started_s", "value", "sf", "reps"):
        assert key in parsed, key


def test_compact_line_carries_slowest_entries_with_offsets(emit_to_tmp):
    full = _full()
    parsed = json.loads(bench._emit(full))
    ranked = sorted(full["queries"], key=lambda n: -full["queries"][n])
    top = ranked[: len(parsed["queries"])]
    assert set(parsed["queries"]) == set(top)
    assert parsed["queries_omitted"] == len(full["queries"]) - len(top)
    # VERDICT r7 #4: per-entry start offsets ship in the artifact
    assert set(parsed["entry_started_s"]) == set(top)
    for n in top:
        assert parsed["queries"][n] == full["queries"][n]
        assert parsed["entry_started_s"][n] == full["entry_started_s"][n]


def test_full_artifact_has_every_entry(emit_to_tmp):
    full = _full()
    json.loads(bench._emit(full))
    stored = json.load(open(emit_to_tmp))
    assert stored["queries"] == full["queries"]
    assert stored["entry_started_s"] == full["entry_started_s"]
    assert stored["spreads"] == full["spreads"]
    assert json.loads(bench._emit(full))["full"] == emit_to_tmp.name


def test_budget_holds_under_hostile_name_lengths(emit_to_tmp):
    # long names shrink the top-N subset instead of blowing the budget
    line = bench._emit(_full(n_queries=200, name_len=120))
    assert len(line) < bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["value"] > 0
    assert len(parsed["queries"]) < bench.TOP_N or bench.TOP_N == 0


def test_oversized_notes_truncated_at_zero_entries(emit_to_tmp):
    """ADVICE r8: if the fixed metadata + notes alone exceed LINE_BUDGET,
    _emit must truncate the notes rather than silently return an
    over-budget line (which would reintroduce the recorder truncation)."""
    full = _full()
    full["notes"] = "n" * (bench.LINE_BUDGET + 500)
    line = bench._emit(full)
    assert len(line) < bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["notes"].endswith("...")
    assert parsed["value"] == full["value"]          # scalars survive
    # the FULL artifact keeps the untruncated notes
    saved = json.loads(emit_to_tmp.read_text())
    assert saved["notes"] == full["notes"]


def test_notes_truncation_near_boundary_raises_not_hangs(emit_to_tmp):
    """ADVICE r9: when len(notes) exceeds the overshoot by 1-3 chars the
    old slice index went negative, so the '...' suffix GREW the notes each
    iteration — an infinite loop instead of the loud RuntimeError. Craft
    fixed metadata landing exactly at LINE_BUDGET-2 so the boundary is hit
    deterministically."""
    import re

    import pytest

    full = _full()
    full["queries"] = {}
    # measure the fixed-metadata length: with empty notes the RuntimeError
    # message reports the rendered line length directly
    probe = dict(full, sf="s" * 2000, notes="")
    with pytest.raises(RuntimeError) as ei:
        bench._emit(probe)
    c = int(re.search(r"\((\d+) >=", str(ei.value)).group(1))
    # shrink the sf padding so fixed metadata = LINE_BUDGET - 2, making
    # len(notes) - overshoot == 1 for ANY notes length (the hang case)
    pad = 2000 - (c - (bench.LINE_BUDGET - 2))
    assert pad > 0, "LINE_BUDGET shrank below the fixed metadata floor"
    crafted = dict(full, sf="s" * pad, notes="x" * 50)
    with pytest.raises(RuntimeError):
        bench._emit(crafted)
