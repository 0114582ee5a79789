"""tools/bench_compare.py — the mechanized cross-round attribution.

The r6/r7 verdicts each spent a section separating host drift from code
regressions by hand (alphabetical inference over which entries ran
late in a drifting run).  These tests pin the tool's three load shapes
and the drift-local normalization on a synthetic run that reproduces
the r7 driver pattern: a host that degrades 3x in-run, an end-of-run
entry that LOOKS 3x slower, and a start-of-run entry that genuinely is.
"""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "bench_compare", os.path.join(REPO, "tools", "bench_compare.py"))
bc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bc)


def _artifact(queries, started, first, last, span):
    return {
        "queries": queries,
        "entry_started_s": started,
        "canary_s": round((first + last) / 2, 3),
        "canary_first_s": first,
        "canary_last_s": last,
        "canary_last_started_s": span,
        "sf": 0.1,
    }


def test_drift_local_normalization_separates_host_from_code(tmp_path):
    # old run: steady host (canary 1.0 throughout)
    old = _artifact({"early_q": 2.0, "late_q": 2.0},
                    {"early_q": 0.0, "late_q": 100.0}, 1.0, 1.0, 100.0)
    # new run: host degrades 1.0 -> 3.0 across the run (the r7 driver
    # pattern); late_q's 3x wall is pure drift, early_q's 3x is code
    new = _artifact({"early_q": 6.0, "late_q": 6.0},
                    {"early_q": 0.0, "late_q": 100.0}, 1.0, 3.0, 100.0)
    p_old, p_new = tmp_path / "old.json", tmp_path / "new.json"
    p_old.write_text(json.dumps(old))
    p_new.write_text(json.dumps(new))
    result = bc.compare(bc.load(str(p_old)), bc.load(str(p_new)))
    rows = {r["entry"]: r for r in result["rows"]}
    assert rows["late_q"]["raw"] == 3.0
    # at late_q's offset the new host runs the canary 3x slower -> the
    # drift-local ratio collapses to ~1 and the entry is NOT flagged
    assert abs(rows["late_q"]["norm_local"] - 1.0) < 0.01
    assert not rows["late_q"]["flag"]
    # early_q ran while the new host was still fast -> its 3x survives
    # normalization and IS flagged
    assert rows["early_q"]["norm_local"] == 3.0
    assert rows["early_q"]["flag"]
    assert [r["entry"] for r in result["flagged"]] == ["early_q"]


def test_pre_r8_artifacts_fall_back_to_run_level_canary(tmp_path):
    # no offsets on either side (the r<=7 regime): norm_local == norm
    old = {"queries": {"q": 1.0}, "canary_s": 1.0, "sf": 0.1}
    new = {"queries": {"q": 2.0}, "canary_s": 2.0, "sf": 0.1}
    p_old, p_new = tmp_path / "o.json", tmp_path / "n.json"
    p_old.write_text(json.dumps(old))
    p_new.write_text(json.dumps(new))
    result = bc.compare(bc.load(str(p_old)), bc.load(str(p_new)))
    row = result["rows"][0]
    assert row["norm"] == 1.0 and row["norm_local"] == 1.0
    assert result["median_norm_ratio"] == 1.0


def test_scrapes_truncated_recorder_tail_r7_shape():
    # the REAL r7 recorder artifact: truncated tail, parsed=None
    side = bc.load(os.path.join(REPO, "BENCH_r07.json"))
    assert len(side["queries"]) > 40
    assert side["canary"] == 9.651
    assert side["canary_first"] == 1.271 and side["canary_last"] == 18.03
    # meta keys must not masquerade as query medians
    assert not set(side["queries"]) & bc.META_KEYS
    assert side["sf"] == 0.1


def test_nonstationary_side_without_offsets_flags_on_raw(tmp_path):
    # the r7 driver regime: 14x in-run drift, no entry offsets — the
    # run-level canary median represents no entry's actual conditions,
    # so normalization must fall back to raw ratios with a warning
    old = {"queries": {"q_big": 10.0, "q_steady": 10.0},
           "canary_s": 9.65, "canary_first_s": 1.27,
           "canary_last_s": 18.03, "sf": 0.1}
    new = _artifact({"q_big": 20.0, "q_steady": 10.5},
                    {"q_big": 0.0, "q_steady": 50.0}, 1.0, 1.0, 100.0)
    p_old, p_new = tmp_path / "o.json", tmp_path / "n.json"
    p_old.write_text(json.dumps(old))
    p_new.write_text(json.dumps(new))
    result = bc.compare(bc.load(str(p_old)), bc.load(str(p_new)))
    assert result["normalization"] == "raw_fallback"
    assert result["warnings"] and "nonstationary" in result["warnings"][0]
    rows = {r["entry"]: r for r in result["rows"]}
    # raw 2.0 exceeds the >1s floor (1.25) -> flagged on RAW, even
    # though run-level normalization would have excused it (norm 0.34)
    assert rows["q_big"]["flag"]
    assert not rows["q_steady"]["flag"]
    assert result["median_raw_ratio"] is not None


def test_raw_stdout_capture_loads(tmp_path):
    line = json.dumps({"queries": {"q": 1.5}, "canary_s": 2.0, "sf": 0.01})
    p = tmp_path / "stdout.txt"
    p.write_text("some warning line\n" + line + "\n")
    side = bc.load(str(p))
    assert side["queries"] == {"q": 1.5} and side["canary"] == 2.0


def _two_files(tmp_path, n=4):
    qs = {f"q{i}": 1.0 + i for i in range(n)}
    st = {f"q{i}": float(i) for i in range(n)}
    old = _artifact(qs, st, 1.0, 1.0, 100.0)
    new = _artifact(qs, st, 1.0, 1.0, 100.0)
    p_old, p_new = tmp_path / "old.json", tmp_path / "new.json"
    p_old.write_text(json.dumps(old))
    p_new.write_text(json.dumps(new))
    return str(p_old), str(p_new)


def test_top_option_is_consumed_not_positional(tmp_path, capsys):
    """ADVICE r8: `--top 5` used to leave `5` in the positional list and
    exit 2 on usage; and `--top` as the last token IndexError'd."""
    p_old, p_new = _two_files(tmp_path)
    assert bc.main([p_old, p_new, "--top", "2"]) == 0
    out = capsys.readouterr().out
    assert "common entries: 4" in out
    # --top with no value: clean usage error, not a crash
    assert bc.main([p_old, p_new, "--top"]) == 2
    assert bc.main([p_old, p_new, "--top", "xyz"]) == 2
    # unknown options are rejected instead of silently ignored
    assert bc.main([p_old, p_new, "--bogus"]) == 2


def test_short_row_lists_print_each_entry_once(tmp_path, capsys):
    """ADVICE r8: rows[:top] + rows[-3:] duplicated entries around the
    '...' separator whenever common entries < top + 3."""
    p_old, p_new = _two_files(tmp_path, n=4)
    assert bc.main([p_old, p_new]) == 0
    out = capsys.readouterr().out
    for i in range(4):
        assert out.count(f"q{i} ") == 1, out
    assert "..." not in out


def test_fallback_flags_labeled_unattributable(tmp_path, capsys):
    """ADVICE r8: in raw_fallback mode the raw ratio still embeds host
    speed, so flags must not claim REGRESSION."""
    qs_old = {"big_q": 10.0}
    old = _artifact(qs_old, {}, 1.0, 16.0, 100.0)   # nonstationary
    old["entry_started_s"] = {}
    new = _artifact({"big_q": 15.0}, {"big_q": 0.0}, 1.0, 1.0, 100.0)
    p_old, p_new = tmp_path / "o.json", tmp_path / "n.json"
    p_old.write_text(json.dumps(old))
    p_new.write_text(json.dumps(new))
    assert bc.main([str(p_old), str(p_new)]) == 0
    out = capsys.readouterr().out
    assert "UNATTRIBUTABLE?" in out
    assert "REGRESSION?" not in out
    assert "unattributable" in out


def test_top_rejects_nonpositive(tmp_path):
    """ADVICE r9: --top 0 / negative made rows[:top] silently drop the
    slowest tail while the elision footer still rendered — a table that
    looks complete but isn't. Strict option handling: exit 2."""
    p_old, p_new = _two_files(tmp_path)
    assert bc.main([p_old, p_new, "--top", "0"]) == 2
    assert bc.main([p_old, p_new, "--top", "-2"]) == 2
