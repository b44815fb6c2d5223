#!/usr/bin/env python3
"""Regenerate BENCH_BANDS.json — the committed per-query reference band that
graft.Bench's end-of-suite outlier adjudication compares against — from a
CLEAN-WINDOW BENCH_DETAIL.json (check its io_probe before trusting it: a
band captured in a degraded window would mark healthy runs as suspects).

--merge keeps the committed band where it is LOWER than the new run's
number (min-merge): the committed band stays a clean-window reference even
when the refreshing run hit a degraded window, while entries new to the
suite still get seeded from the only data that exists for them.

Usage: update_bands.py [--merge] [BENCH_DETAIL.json]"""
import json
import os
import sys


def main(src, merge):
    d = json.load(open(src))
    io = d.get("io_probe", {})
    bands = {k: round(v, 3) for k, v in d["queries"].items()}
    if merge and os.path.exists("BENCH_BANDS.json"):
        old = json.load(open("BENCH_BANDS.json"))
        bands = {k: min(old.get(k, float("inf")), v) for k, v in bands.items()}
    with open("BENCH_BANDS.json", "w") as f:
        json.dump(bands, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote BENCH_BANDS.json: {len(bands)} entries from {src} "
          f"({'min-merged with committed bands' if merge else 'replaced'}; "
          f"io_probe was {io})")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--merge"]
    main(args[0] if args else "BENCH_DETAIL.json", "--merge" in sys.argv)
