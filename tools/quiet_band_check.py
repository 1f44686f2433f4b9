"""Mechanical quiet-band gate for the canonical bench artifact
(BASELINE.md round-9 amendment): reads BENCH_FULL.json and checks
every calibration leg — python_spin / spark_1task / spark_32task,
before AND after — against the band. Exit 0 = committable canonical;
exit 1 = loaded-host run (usable as an external check only).

Usage: python tools/quiet_band_check.py [path-to-BENCH_FULL.json]
"""

from __future__ import annotations

import json
import sys

BAND = {
    "python_spin_sec": 0.45,
    "spark_1task_sec": 0.40,
    "spark_32task_sec": 0.60,
}


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    d = json.load(open(path))
    ok = True
    for when in ("calibration_before", "calibration_after"):
        cal = d.get(when)
        if cal is None:
            print(f"FAIL {when}: missing (pre-r8 artifact?)")
            ok = False
            continue
        for leg, lim in BAND.items():
            v = cal.get(leg)
            if v is None:
                print(f"FAIL {when}.{leg}: missing (pre-r9 artifact?)")
                ok = False
            elif v > lim:
                print(f"FAIL {when}.{leg}: {v} > {lim}")
                ok = False
            else:
                print(f"ok   {when}.{leg}: {v} <= {lim}")
    mid = d.get("calibration_midrun")
    if mid is None:
        print("warn calibration_midrun: missing (pre-r9b artifact)")
    else:
        # absolute ceiling AND a relative rule: the first instrumented
        # run showed samples of 0.29-0.58 s vs a 0.15-0.20 s quiet
        # floor — band-passing yet ~2x loaded. Every sample must stay
        # within 2x the run's own BEST sample (the run's quiet floor),
        # so a sustained half-loaded run cannot self-certify.
        floor = min(v for _, v in mid)
        bad = [(i, v) for i, v in mid
               if v > BAND["spark_32task_sec"] or v > 2 * floor]
        if bad:
            print(f"FAIL calibration_midrun: {len(bad)}/{len(mid)} "
                  f"samples above min({BAND['spark_32task_sec']}, "
                  f"2x floor {floor}): {bad}")
            ok = False
        else:
            print(f"ok   calibration_midrun: {len(mid)} samples, "
                  f"floor {floor}, all <= 2x floor and <= "
                  f"{BAND['spark_32task_sec']}")
    n_err = sum(1 for t in d.get("queries", {}).values() if t < 0)
    if n_err:
        print(f"FAIL {n_err} queries recorded errors (t = -1)")
        ok = False
    print(("QUIET BAND: PASS — committable canonical"
           if ok else "QUIET BAND: FAIL — do not commit as canonical"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
