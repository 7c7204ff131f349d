#!/usr/bin/env python3
"""Derive BENCH_BASELINE.json from a quiet BENCH_QUERIES.json capture.

The baseline is the per-query band gate's reference (Bench.scala): a
query whose quiet median exceeds ~2x its baseline median after
calibration scaling gets escalated reps and, if still above, ships
with a band_violation marker. Regenerate at round close from the
round's committed quiet capture:

    python3 tools/make_bench_baseline.py BENCH_QUERIES.json BENCH_BASELINE.json

A noisy capture (self-labeled "noisy":true) is REFUSED (ADVICE r15:
the r15 baseline was silently derived from a loud-host capture whose
inflated cal priced every allowance ~22% loose — exactly the signal
the r14 t44 incident showed the gate must not trust). Pass --force to
override deliberately; the refusal exit code is 2.
"""
import json
import sys


def main(src, dst, force=False):
    with open(src) as f:
        cap = json.load(f)
    if cap.get("noisy"):
        if not force:
            print(f"ERROR: {src} is self-labeled noisy:true - the band gate's "
                  "reference must come from a quiet capture (rerun Bench on a "
                  "quiet host, or pass --force to override deliberately)")
            return 2
        print(f"WARNING: {src} is noisy:true - proceeding under --force")
    queries = {k: v for k, v in cap["queries"].items() if v >= 0}
    out = {
        "sf": cap["sf"],
        "cal": cap["calibration_sec"],
        # n_queries lets Bench.loadBaseline cross-check its regex parse
        # (ADVICE r15: a format drift must disable the gate loudly, not
        # mis-price it silently)
        "n_queries": len(queries),
        "queries": queries,
    }
    with open(dst, "w") as f:
        json.dump(out, f, sort_keys=True)
        f.write("\n")
    print(f"{dst}: {len(queries)} baselines at sf={out['sf']} "
          f"cal={out['cal']}")
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--force"]
    if len(args) != 2:
        print("usage: make_bench_baseline.py [--force] "
              "BENCH_QUERIES.json BENCH_BASELINE.json")
        sys.exit(2)
    sys.exit(main(args[0], args[1], force="--force" in sys.argv))
