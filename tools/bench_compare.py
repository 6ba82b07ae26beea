#!/usr/bin/env python
"""Compare two BENCH_r*.json files with calibration normalization.

The r3→r4 comparison was un-interpretable until A/B'd by hand: every
query drifted ~1.25× because the shared host slowed down, not because
any plan regressed. bench.py now records ``calibration_sec`` (best-of-5
of a fixed lineitem scan+aggregate); this tool divides it out so a
cross-round comparison separates host noise from real regressions
mechanically:

    normalized_ratio(q) = (new[q] / old[q]) / (new_cal / old_cal)

Queries with a normalized ratio above the threshold (default 1.5×) are
flagged; best≪median rows in the new run are annotated as noisy.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]
Accepts both the driver's wrapper format ({"parsed": {...}}) and
bench.py's raw JSON line. From round 6 on, the one-line bench output
carries only totals + the top-12 queries (the full line outgrew the
driver's tail capture in r5); complete per-query best/median/cold
detail is written to BENCH_DETAIL.json and snapshotted per round as
BENCH_DETAIL_r{N}.json — compare THOSE for full per-query coverage.
"""

from __future__ import annotations

import contextlib
import json
import signal
import sys

with contextlib.suppress(AttributeError, ValueError):  # non-POSIX
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # clean exit under `| head`


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old.get("queries", {}), new.get("queries", {})
    med = new.get("queries_median", {})
    ocal, ncal = old.get("calibration_sec"), new.get("calibration_sec")
    host = (ncal / ocal) if ocal and ncal else None
    print(
        f"old total {old.get('value')} s  new total {new.get('value')} s  "
        f"host factor {'%.3f' % host if host else 'n/a (no calibration in one side)'}"
    )
    common = sorted(set(oq) & set(nq), key=lambda k: -(nq[k] / oq[k]))
    flagged = 0
    for k in common:
        raw = nq[k] / oq[k]
        norm = raw / host if host else raw
        noisy = ""
        if k in med and med[k] > 0 and nq[k] / med[k] < 0.7:
            noisy = " (noisy: best<<median)"
        mark = ""
        if norm > threshold:
            flagged += 1
            mark = "  <-- REGRESSION?"
        print(
            f"{k:40s} {oq[k]:7.3f} -> {nq[k]:7.3f}  raw {raw:5.2f}x  "
            f"norm {norm:5.2f}x{noisy}{mark}"
        )
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print("new-only queries:", ", ".join(f"{k}={nq[k]}" for k in only_new))
    print(f"{len(common)} common queries, {flagged} flagged above {threshold}x normalized")


if __name__ == "__main__":
    main()
