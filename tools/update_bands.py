#!/usr/bin/env python3
"""Regenerate BENCH_BANDS.json — the committed per-query reference band that
graft.Bench's end-of-suite outlier adjudication compares against — from a
CLEAN-WINDOW BENCH_DETAIL.json (check its io_probe before trusting it: a
band captured in a degraded window would mark healthy runs as suspects).
Usage: update_bands.py [BENCH_DETAIL.json]"""
import json
import sys


def main(src):
    d = json.load(open(src))
    io = d.get("io_probe", {})
    bands = {k: round(v, 3) for k, v in d["queries"].items()}
    with open("BENCH_BANDS.json", "w") as f:
        json.dump(bands, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote BENCH_BANDS.json: {len(bands)} entries from {src} "
          f"(io_probe was {io})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json")
