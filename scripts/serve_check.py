#!/usr/bin/env python3
"""Serve-lane regression gate (round-15 verdict #7, mechanized).

Compares the current LifecycleBench JSON line against the committed
LIFECYCLE.json (last round's close) and FAILS when any shared lane's
serve-min regresses more than the threshold — so a build-cost move can
never mask a serving regression again.

Usage:
  # 1) run the bench, capture its JSON line (last stdout line):
  #    SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.LifecycleBench /root/testdata/sf0.1 3" \
  #      | grep '"metric":"lifecycle_serve"' > /tmp/lifecycle_new.json
  # 2) gate:
  #    python3 scripts/serve_check.py /tmp/lifecycle_new.json [--update]
  #
  # --update: on PASS, promote the new numbers to LIFECYCLE.json (the
  # next round's baseline). New lanes pass trivially (no baseline yet).

Exit 0 = no lane regressed beyond threshold; exit 1 otherwise.
"""
import json
import os
import sys

THRESHOLD = 0.30  # >30% serve-min regression fails
FLOOR_SEC = 0.15  # lanes faster than this are timer noise, not signal

def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    new_path = sys.argv[1]
    update = "--update" in sys.argv
    base_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "LIFECYCLE.json")

    with open(new_path) as f:
        lines = [l for l in f if '"lifecycle_serve"' in l]
    if not lines:
        print(f"no lifecycle_serve line found in {new_path} "
              "(did the LifecycleBench run fail before printing its JSON line?)")
        return 2
    # sbt prefixes "[info] "
    line = lines[-1]
    new = json.loads(line[line.index("{"):])

    if not os.path.exists(base_path):
        print(f"no baseline at {base_path}; writing one (first run)")
        with open(base_path, "w") as f:
            json.dump(new, f, indent=1, sort_keys=True)
        return 0

    with open(base_path) as f:
        base = json.load(f)

    failed = []
    for lane, cur in sorted(new["lanes"].items()):
        prev = base.get("lanes", {}).get(lane)
        if prev is None:
            print(f"NEW  {lane:<14} serve={cur['serve']:.3f}s (no baseline)")
            continue
        b, n = prev["serve"], cur["serve"]
        if max(b, n) < FLOOR_SEC:
            verdict = "ok (sub-floor)"
        elif n > b * (1 + THRESHOLD):
            verdict = f"REGRESSED {100 * (n / b - 1):.0f}%"
            failed.append(lane)
        else:
            verdict = f"ok ({100 * (n / b - 1):+.0f}%)"
        print(f"     {lane:<14} serve {b:.3f}s -> {n:.3f}s  {verdict}")

    if failed:
        print(f"FAIL: serve-lane regression(s) > {int(THRESHOLD * 100)}%: "
              + ", ".join(failed))
        return 1
    print("PASS: no serve lane regressed beyond threshold")
    if update:
        with open(base_path, "w") as f:
            json.dump(new, f, indent=1, sort_keys=True)
        print(f"baseline updated: {base_path}")
    return 0

if __name__ == "__main__":
    sys.exit(main())
