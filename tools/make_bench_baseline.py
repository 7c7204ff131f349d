#!/usr/bin/env python3
"""Derive BENCH_BASELINE.json from a quiet BENCH_QUERIES.json capture.

The baseline is the per-query band gate's reference (Bench.scala): a
query whose quiet median exceeds ~2x its baseline median after
calibration scaling gets escalated reps and, if still above, ships
with a band_violation marker. Regenerate at round close from the
round's committed quiet capture:

    python3 tools/make_bench_baseline.py BENCH_QUERIES.json BENCH_BASELINE.json
"""
import json
import sys


def main(src, dst):
    with open(src) as f:
        cap = json.load(f)
    if cap.get("noisy"):
        print(f"WARNING: {src} is self-labeled noisy - baseline quality suffers")
    out = {
        "sf": cap["sf"],
        "cal": cap["calibration_sec"],
        "queries": {k: v for k, v in cap["queries"].items() if v >= 0},
    }
    with open(dst, "w") as f:
        json.dump(out, f, sort_keys=True)
        f.write("\n")
    print(f"{dst}: {len(out['queries'])} baselines at sf={out['sf']} "
          f"cal={out['cal']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
