"""Round-10 optimization probe: time named queries (bench methodology:
toPandas fetch, warm session) and/or dump their explain("formatted")
to plans/r10/<query>_<suffix>.txt.

Usage:
  python tools/opt_probe_r10.py time  [--sf DIR] [--n N] q1 q2 ...
  python tools/opt_probe_r10.py plans [--sf DIR] [--suffix before] q1 q2 ...
  python tools/opt_probe_r10.py curation [--sf DIR]   # phase timings

`time` prints one line per query per repetition (wall, host steal
seconds, host idle fraction — from /proc/stat, so storm-polluted
samples are visibly discardable) plus the min; `plans` writes the
formatted plan files the judge checks claims against. `curation`
times each stage of the shared _curation build separately.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402
from tools.steal_timer_r09 import timed  # noqa: E402


def _spark():
    spark = get_spark("opt_probe_r10")
    qs = E.queries()
    try:  # warmup: JVM/codegen/FS cache, same as bench.py
        qs["pricing_summary"](spark, os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).toPandas()
    except Exception:
        pass
    return spark, qs


def cmd_time(sf_dir: str, names: list[str], n: int) -> None:
    spark, qs = _spark()
    for name in names:
        fn = qs[name]
        samples = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"probe:{name}#{i}")
            _, wall, steal, idle = timed(
                lambda: fn(spark, sf_dir).toPandas())
            samples.append(wall)
            print(f"{name} run{i}: {wall:.2f}s steal {steal:.2f}s "
                  f"idle {idle:.2f}", flush=True)
        print(f"{name} MIN {min(samples):.2f}s "
              f"ALL {[round(s, 2) for s in samples]}", flush=True)


def cmd_plans(sf_dir: str, names: list[str], suffix: str) -> None:
    spark, qs = _spark()
    outdir = os.path.join("/root/repo", "plans", "r10")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


def cmd_curation(sf_dir: str) -> None:
    """Time each stage of the shared curation build the way bench.py's
    _curation_build line item pays for it (first materialization)."""
    spark, qs = _spark()
    t_all = time.perf_counter()
    st = E._curation(spark, sf_dir)
    print(f"plan-build: {time.perf_counter() - t_all:.2f}s", flush=True)
    for key, frame in st.items():
        if hasattr(frame, "count") and not isinstance(frame, str):
            t0 = time.perf_counter()
            cnt = frame.count()
            print(f"{key}: {time.perf_counter() - t0:.2f}s "
                  f"({cnt} rows)", flush=True)
    print(f"TOTAL: {time.perf_counter() - t_all:.2f}s", flush=True)


def main() -> None:
    args = sys.argv[1:]
    cmd = args.pop(0)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = 3
    suffix = "before"
    out = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--n":
            n = int(next(it))
        elif a == "--suffix":
            suffix = next(it)
        else:
            out.append(a)
    if cmd == "time":
        cmd_time(sf_dir, out, n)
    elif cmd == "plans":
        cmd_plans(sf_dir, out, suffix)
    elif cmd == "curation":
        cmd_curation(sf_dir)
    else:
        raise SystemExit(f"unknown cmd {cmd}")


if __name__ == "__main__":
    main()
