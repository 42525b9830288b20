"""Host parallel-capacity calibration (BENCH/BASELINE.md protocol).

Pure-Python multiprocessing over a string workload — no Spark — to
measure what the HOST can currently deliver at N processes. Run this in
the same window as a scaling measurement: if the probe's own parallel
efficiency is below ~0.9, the shared VM (not the engine) is the ceiling,
and absolute turns/s from that window must not be compared across
sessions.

    python -m kglinker.jobs.host_calibration
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

_N = 3_000_000


def _work(n: int) -> int:
    s = "Tomáš Garrigue Masaryk navštívil Prahu a Brno v roce 1918 ."
    acc = 0
    for _ in range(n):
        acc += len(s.split()) + s.count("a")
    return acc


def main() -> None:
    t0 = time.time()
    _work(_N)
    one = _N / (time.time() - t0)
    out = {"one_proc_units_per_sec": round(one)}
    for procs in (8, 32):
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_work, [_N] * procs)
        rate = procs * _N / (time.time() - t0)
        out[f"procs_{procs}_units_per_sec"] = round(rate)
        out[f"procs_{procs}_efficiency"] = round(rate / one / procs, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
