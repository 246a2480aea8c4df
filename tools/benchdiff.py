#!/usr/bin/env python
"""Compare two bench JSON files with the round-5 comparison discipline.

Usage: python tools/benchdiff.py BENCH_old.json BENCH_new.json

Encodes the two lessons the round-4/5 bench history taught, so nobody
has to re-learn them from SCALE.md §6:

1. **Normalize by host speed first.**  Two identical-plan sweeps can
   differ ~25% across boots (microVM host variance) while reproducing
   within 0.5% inside one boot.  When both files carry
   ``calibration_sec`` (round-5+), per-query times are scaled by the
   calibration ratio before any comparison; without it, cross-boot
   deltas are reported but explicitly labeled unattributable.
2. **A regression needs non-overlapping spread windows.**  Medians
   whose [min, max] windows overlap (after normalization) are noise by
   the harness's own definition; only disjoint windows are flagged.

Output: one human-readable table on stderr and one JSON line on stdout
(``{"regressions": [...], "improvements": [...], "calibration_ratio": r}``).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    """Accept either the raw one-line bench output or the driver's
    BENCH_r{N}.json envelope (a pretty-printed object whose nested
    payload is the dict that carries ``queries``)."""
    with open(path) as f:
        raw = f.read().strip()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = json.loads(raw.splitlines()[-1])

    def find(d):
        if isinstance(d, dict):
            if "queries" in d and isinstance(d["queries"], dict):
                return d
            for v in d.values():
                hit = find(v)
                if hit is not None:
                    return hit
        return None

    payload = find(doc)
    if payload is None:
        raise ValueError(f"{path}: no bench payload with a 'queries' dict")
    return payload


def compare(old: dict, new: dict, threshold: float = 0.25) -> dict:
    cal_old = old.get("calibration_sec")
    cal_new = new.get("calibration_sec")
    # scale NEW times into OLD's host-speed units
    ratio = (cal_old / cal_new) if (cal_old and cal_new) else None
    # Guard against comparing files whose calibration WORKLOADS differ
    # (round 5 used a ~50 ms 1500² matmul, round 6+ a ~1.25 s 5000² one):
    # host speed never moves 3×, so a ratio outside [1/3, 3] means the
    # fixed work itself changed and normalization would be nonsense.
    if ratio is not None and not (1 / 3 <= ratio <= 3):
        ratio = None
    scale = ratio if ratio is not None else 1.0

    shared = sorted(set(old["queries"]) & set(new["queries"]))
    regressions, improvements = [], []
    for name in shared:
        t_old = old["queries"][name]
        t_new = new["queries"][name] * scale
        so = old.get("spread", {}).get(name, {"min": t_old, "max": t_old})
        sn_raw = new.get("spread", {}).get(
            name, {"min": new["queries"][name], "max": new["queries"][name]}
        )
        sn = {"min": sn_raw["min"] * scale, "max": sn_raw["max"] * scale}
        delta = (t_new - t_old) / t_old if t_old else 0.0
        overlap = not (sn["min"] > so["max"] or sn["max"] < so["min"])
        entry = {
            "query": name,
            "old": round(t_old, 4),
            "new_normalized": round(t_new, 4),
            "delta_pct": round(100 * delta, 1),
            "windows_overlap": overlap,
        }
        if delta >= threshold and not overlap:
            regressions.append(entry)
        elif delta <= -threshold and not overlap:
            improvements.append(entry)
    return {
        "calibration_ratio": round(ratio, 4) if ratio is not None else None,
        "attributable": ratio is not None,
        "n_shared": len(shared),
        "only_old": sorted(set(old["queries"]) - set(new["queries"])),
        "only_new": sorted(set(new["queries"]) - set(old["queries"])),
        "regressions": sorted(regressions, key=lambda e: -e["delta_pct"]),
        "improvements": sorted(improvements, key=lambda e: e["delta_pct"]),
    }


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    out = compare(old, new)
    if not out["attributable"]:
        print(
            "WARNING: no calibration_sec in one/both files — cross-boot "
            "deltas below are NOT attributable to code (see SCALE.md §6)",
            file=sys.stderr,
        )
    for kind in ("regressions", "improvements"):
        for e in out[kind]:
            print(
                f"{kind[:-1]:12s} {e['query']:30s} "
                f"{e['old']:7.3f}s -> {e['new_normalized']:7.3f}s "
                f"({e['delta_pct']:+.1f}%)",
                file=sys.stderr,
            )
    if not (out["regressions"] or out["improvements"]):
        print("no non-overlapping deltas beyond threshold", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
