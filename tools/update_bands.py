#!/usr/bin/env python3
"""Regenerate BENCH_BANDS.json — the committed per-query reference band that
graft.Bench's end-of-suite outlier adjudication compares against — from a
CLEAN-WINDOW BENCH_DETAIL.json (check its io_probe before trusting it: a
band captured in a degraded window would mark healthy runs as suspects).

--merge keeps the committed band where it is LOWER than the new run's
number (min-merge): the committed band stays a clean-window reference even
when the refreshing run hit a degraded window, while entries new to the
suite still get seeded from the only data that exists for them. Keys are
UNIONED: a partial run (SPARK_GRAFT_ONLY=...) must not delete the bands
for every query absent from it.

--raise k1,k2 takes the NEW run's number for the named keys even when the
committed band is lower — the explicit acknowledgement that an entry
deliberately got heavier (it gained coverage), without which min-merge
would flag it as a suspect on every future run forever.

CONTRACT: BENCH_BANDS.json must stay a FLAT name->number map — graft.Bench
parses it with a "key": number regex (not a JSON parser) and refuses a file
with any nested structure. Keys with a "__" prefix are metadata graft.Bench
excludes from the bands: "__prime_mbps" records the band-setting window's
own disk throughput (max of the source run's pre/prime probes), the
yardstick a later run compares its OWN priming probes against to declare
itself degraded_window up front (VERDICT r14 item 1c). On --merge it takes
the MAX across windows — the bands are min-merged from the cleanest
windows, so the prime must represent the cleanest window too.

Usage: update_bands.py [--merge] [--raise k1,k2] [BENCH_DETAIL.json]"""
import json
import os
import sys


def main(src, merge, raised):
    d = json.load(open(src))
    io = d.get("io_probe", {})
    prime = max([io.get("pre_mbps", 0.0)] + io.get("prime_mbps", []))
    new = {k: round(v, 3) for k, v in d["queries"].items()}
    bands = dict(new)
    if merge and os.path.exists("BENCH_BANDS.json"):
        old = json.load(open("BENCH_BANDS.json"))
        prime = max(prime, old.pop("__prime_mbps", 0.0))
        bands = {k: min(old.get(k, float("inf")), new.get(k, float("inf")))
                 for k in set(old) | set(new)}
        for k in raised:
            if k in new:
                bands[k] = new[k]
            else:
                print(f"warn: --raise {k} not in {src}, band left as-is")
    if prime > 0:
        bands["__prime_mbps"] = round(prime, 1)
    with open("BENCH_BANDS.json", "w") as f:
        json.dump(bands, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote BENCH_BANDS.json: {len(bands)} entries from {src} "
          f"({'min-merged with committed bands' if merge else 'replaced'}; "
          f"raised {sorted(raised) if raised else 'none'}; "
          f"io_probe was {io})")


if __name__ == "__main__":
    raised = set()
    args = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--raise":
            raised |= set(next(it).split(","))
        elif a != "--merge":
            args.append(a)
    main(args[0] if args else "BENCH_DETAIL.json", "--merge" in sys.argv,
         raised)
