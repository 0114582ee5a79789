"""Canary-normalized cross-round bench comparison (VERDICT r7 #4).

Every verdict r4–r7 re-derived the same forensics by hand: which
per-entry deltas are code-attributable and which are host drift.  The
bench has shipped the inputs since r7 (pinned-canary timings) and r8
(per-entry start offsets, complete medians in BENCH_FULL_LATEST.json);
this tool mechanizes the comparison:

    python tools/bench_compare.py OLD NEW [--top K] [--json]

OLD/NEW each accept any artifact shape that has existed:
  - a FULL artifact (BENCH_FULL_LATEST.json schema — complete
    `queries`/`entry_started_s` maps + canary trio),
  - a recorder artifact (BENCH_r*.json: `parsed` when the stdout line
    fit the recorder's 2000-char tail, else the truncated `tail`
    scraped by regex — the r2–r7 regime, where only the
    alphabetically-last ~58 medians survive),
  - a raw one-line bench stdout capture.

Per common entry it reports the raw ratio new/old and two normalized
views:
  - `norm`: divided by the run-level canary ratio (median canary) —
    the defensible cross-round scalar;
  - `norm_local`: divided by the DRIFT-LOCAL canary ratio — each
    side's canary speed linearly interpolated at the entry's start
    offset between canary_first (t=0) and canary_last
    (t=canary_last_started_s).  This is what places an entry on the
    in-run drift curve: the r7 driver run degraded 1.27 s → 18.03 s
    in-run, so end-of-run entries carry up to 14x host inflation that
    the run-level median cannot see.  Falls back to `norm` when either
    side lacks offsets (pre-r8 artifacts).

The summary line reports the median normalized ratio over common
entries and flags entries whose `norm_local` exceeds the noise floor
(sub-second entries have measured cross-round spread ~±40%; the floor
is configurable via --floor, default 1.4 for sub-second and 1.25
above).
"""

from __future__ import annotations

import json
import re
import sys

META_KEYS = {
    "value", "sf", "n_queries", "reps", "canary_s", "canary_first_s",
    "canary_last_s", "canary_last_started_s", "subsec_entries",
    "subsec_spread_median", "subsec_spread_max", "queries_omitted",
    "n", "rc", "cpus",
}


def _from_parsed(parsed: dict) -> dict:
    return {
        "queries": dict(parsed.get("queries", {})),
        "started": dict(parsed.get("entry_started_s", {})),
        "canary": parsed.get("canary_s"),
        "canary_first": parsed.get("canary_first_s"),
        "canary_last": parsed.get("canary_last_s"),
        "canary_last_started": parsed.get("canary_last_started_s"),
        "sf": parsed.get("sf"),
    }


def _scrape_tail(tail: str) -> dict:
    """Best-effort recovery from a truncated stdout tail: name/number
    pairs become medians EXCEPT known meta keys; pairs after the
    `entry_started_s` key are offsets, not medians."""
    med_part, _, rest = tail.partition('"entry_started_s"')
    pairs = [(m.group(1), float(m.group(2))) for m in
             re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', med_part)]
    meta = {k: v for k, v in pairs if k in META_KEYS}
    queries = {k: v for k, v in pairs if k not in META_KEYS}
    started = {}
    if rest:
        for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', rest):
            k, v = m.group(1), float(m.group(2))
            if k in META_KEYS:
                meta.setdefault(k, v)
            else:
                started[k] = v
    return {
        "queries": queries,
        "started": started,
        "canary": meta.get("canary_s"),
        "canary_first": meta.get("canary_first_s"),
        "canary_last": meta.get("canary_last_s"),
        "canary_last_started": meta.get("canary_last_started_s"),
        "sf": meta.get("sf"),
    }


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # raw stdout capture: the bench line is the last non-empty line
        line = [ln for ln in text.splitlines() if ln.strip()][-1]
        return _from_parsed(json.loads(line))
    if "queries" in doc:  # full artifact or compact line saved to a file
        return _from_parsed(doc)
    if isinstance(doc.get("parsed"), dict):  # recorder, line fit whole
        return _from_parsed(doc["parsed"])
    return _scrape_tail(doc.get("tail", ""))  # recorder, truncated


def _local_canary(side: dict, offset: float | None) -> float | None:
    """Host speed at `offset` seconds into the run: linear interpolation
    between the first and last canary timings."""
    first, last = side.get("canary_first"), side.get("canary_last")
    span = side.get("canary_last_started")
    if offset is None or first is None or last is None or not span:
        return None
    frac = min(max(offset / span, 0.0), 1.0)
    return first + (last - first) * frac


def _drift(side: dict) -> float | None:
    first, last = side.get("canary_first"), side.get("canary_last")
    return round(last / first, 2) if first and last else None


def _median_of(xs: list[float]) -> float | None:
    s = sorted(xs)
    if not s:
        return None
    mid = s[len(s) // 2] if len(s) % 2 else \
        (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
    return round(mid, 3)


def compare(old: dict, new: dict, floor_sub: float = 1.4,
            floor_big: float = 1.25) -> dict:
    common = sorted(set(old["queries"]) & set(new["queries"]))
    canary_ratio = None
    if old.get("canary") and new.get("canary"):
        canary_ratio = new["canary"] / old["canary"]
    # A side whose canary drifted in-run (the r7 driver degraded 14x)
    # AND has no per-entry offsets cannot be normalized honestly: its
    # run-level canary median does not represent the conditions under
    # which any given entry was measured.  Flag on RAW ratios there —
    # conservative, and the warning says why.
    warnings = []
    fallback = False
    for label, side in (("old", old), ("new", new)):
        d = _drift(side)
        if d and max(d, 1 / d) > 1.5 and not side["started"]:
            fallback = True
            warnings.append(
                f"{label} run is nonstationary (canary first->last "
                f"{side['canary_first']}s -> {side['canary_last']}s, "
                f"{d}x) and has no entry offsets; run-level canary "
                f"normalization is unreliable — flags use RAW ratios")
    rows = []
    for name in common:
        o, n = old["queries"][name], new["queries"][name]
        if not o:
            continue
        raw = n / o
        norm = raw / canary_ratio if canary_ratio else raw
        lo = _local_canary(old, old["started"].get(name))
        ln_ = _local_canary(new, new["started"].get(name))
        norm_local = raw / (ln_ / lo) if (lo and ln_) else norm
        floor = floor_sub if max(o, n) < 1.0 else floor_big
        effective = raw if fallback else norm_local
        rows.append({
            "entry": name, "old_s": o, "new_s": n,
            "raw": round(raw, 3), "norm": round(norm, 3),
            "norm_local": round(norm_local, 3),
            "flag": effective > floor,
        })
    return {
        "common_entries": len(rows),
        "canary_ratio": round(canary_ratio, 3) if canary_ratio else None,
        "drift_old": _drift(old), "drift_new": _drift(new),
        "normalization": "raw_fallback" if fallback else "canary",
        "warnings": warnings,
        "median_raw_ratio": _median_of([r["raw"] for r in rows]),
        "median_norm_ratio": _median_of([r["norm"] for r in rows]),
        "flagged": [r for r in rows if r["flag"]],
        "rows": rows,
        "sf_old": old.get("sf"), "sf_new": new.get("sf"),
    }


def main(argv: list[str]) -> int:
    top = 10
    json_out = False
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--top":
            # consume the VALUE token too (a bare positional filter would
            # count it as a third path and exit on usage — ADVICE r8)
            if i + 1 >= len(argv):
                print("ERROR: --top requires an integer value")
                return 2
            try:
                top = int(argv[i + 1])
            except ValueError:
                print(f"ERROR: --top requires an integer, "
                      f"got {argv[i + 1]!r}")
                return 2
            if top < 1:
                # rows[:0] / rows[:negative] would silently DROP the
                # slowest-tail entries while the elision footer still
                # renders — a table that looks complete but isn't
                print(f"ERROR: --top must be >= 1, got {top}")
                return 2
            i += 2
            continue
        if a == "--json":
            json_out = True
        elif a.startswith("--"):
            print(f"ERROR: unknown option {a}")
            print(__doc__)
            return 2
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    result = compare(load(args[0]), load(args[1]))
    if result["sf_old"] != result["sf_new"]:
        print(f"WARNING: comparing sf={result['sf_old']} against "
              f"sf={result['sf_new']} — per-entry ratios mix scales")
    if json_out:
        out = dict(result)
        out["rows"] = sorted(out["rows"], key=lambda r: -r["norm_local"])
        print(json.dumps(out))
        return 0
    for w in result["warnings"]:
        print(f"WARNING: {w}")
    print(f"common entries: {result['common_entries']}   "
          f"canary ratio (new/old): {result['canary_ratio']}   "
          f"in-run drift old/new: {result['drift_old']}x/"
          f"{result['drift_new']}x   "
          f"median ratio raw: {result['median_raw_ratio']} "
          f"canary-normalized: {result['median_norm_ratio']}   "
          f"flags on: {result['normalization']}")
    fallback = result["normalization"] == "raw_fallback"
    sort_key = "raw" if fallback else "norm_local"
    rows = sorted(result["rows"], key=lambda r: -r[sort_key])
    # In fallback mode the raw ratio still embeds the overall host-speed
    # difference between runs (ADVICE r8): a uniformly slower host would
    # mark every sizeable entry, so the flag is honest about what it can
    # and cannot attribute.
    flag_label = "UNATTRIBUTABLE?" if fallback else "REGRESSION?"
    print(f"{'entry':<38}{'old_s':>8}{'new_s':>8}{'raw':>7}"
          f"{'norm':>7}{'local':>7}  flag")
    head = rows[:top]
    # only elide + show the tail when rows actually extend past the head
    # (rows[:top] + rows[-3:] would duplicate entries on short lists)
    tail = rows[-3:] if len(rows) > top + 3 else rows[top:]
    for r in head + ([None] if len(rows) > top + 3 else []) + tail:
        if r is None:
            print("  ...")
            continue
        print(f"{r['entry']:<38}{r['old_s']:>8.3f}{r['new_s']:>8.3f}"
              f"{r['raw']:>7.2f}{r['norm']:>7.2f}{r['norm_local']:>7.2f}"
              f"  {flag_label if r['flag'] else ''}")
    if not result["flagged"]:
        print("no entry exceeds its noise floor after drift-local "
              "canary normalization")
    elif fallback:
        print(f"{len(result['flagged'])} entries exceed the raw-ratio "
              "floor, but raw ratios cannot separate host speed from "
              "code — treat as unattributable, not regressions")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
