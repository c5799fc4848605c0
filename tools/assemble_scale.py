#!/usr/bin/env python3
"""Assemble BENCH_r{N}_scale.json from tools/run_scale.sh TimeOne logs.

Usage: python3 tools/assemble_scale.py <round> <out.json> <tag>=<logPrefix>...
  e.g. python3 tools/assemble_scale.py 10 BENCH_r10_scale.json \
         sf10=/tmp/scale_sf10 sf1=/tmp/scale_sf1 sf10p=/tmp/scale_sf10p

Each log contributes, per query:
  "<tag>_cold": rep1 (includes shared-cache builds)
  "<tag>_warm": min(rep2..)   — the steady-state number
  "<tag>_reps": [rep1, rep2, ...]  — every sample, so the artifact is
                self-interpreting
  "<tag>_inverted": true      — ONLY when min(rep2..) > rep1; then
                "<tag>_warm" is overridden to min(ALL reps), making rep1
                the representative number for faces whose later reps sit
                under accumulated-cache/GC pressure in the shared family
                JVM (the round-9 policy, now machine-applied in the JSON
                instead of prose in SCALE.md). No warm>cold row can
                appear unflagged.
Queries that appear in no log are omitted; annotate the result by hand.
"""
import json
import re
import sys
from glob import glob

LINE = re.compile(r"\[time\] (\S+) rep(\d+) ([0-9.]+) s \((\d+) rows\)")


def main(rnd, out, pairs):
    queries = {}
    for pair in pairs:
        tag, prefix = pair.split("=", 1)
        for log in sorted(glob(prefix + "_*.log")):
            fam = log[len(prefix) + 1:-4]
            for m in LINE.finditer(open(log, errors="replace").read()):
                name, rep, sec, rows = m.group(1), int(m.group(2)), \
                    float(m.group(3)), int(m.group(4))
                q = queries.setdefault(name, {"family": fam})
                reps = q.setdefault(f"{tag}_reps", [])
                while len(reps) < rep:
                    reps.append(None)
                reps[rep - 1] = sec
                if rep == 1:
                    q[f"{tag}_rows"] = rows
    for name, q in queries.items():
        for tag in {k[:-5] for k in q if k.endswith("_reps")}:
            raw = q[f"{tag}_reps"]
            # a garbled/missing rep-1 line must not silently promote rep 2
            # to "cold" (it would also shift the inversion check and lose
            # <tag>_rows) — flag and skip instead
            if raw and raw[0] is None:
                q[f"{tag}_missing_cold"] = True
                print(f"WARNING: {name} {tag}: rep1 missing from log; "
                      "cold/warm not derived", file=sys.stderr)
                continue
            reps = [r for r in raw if r is not None]
            if not reps:
                continue
            q[f"{tag}_cold"] = reps[0]
            warm = min(reps[1:]) if len(reps) > 1 else reps[0]
            if warm > reps[0]:
                q[f"{tag}_inverted"] = True
                warm = min(reps)
            q[f"{tag}_warm"] = warm
            # min-of-reps has a blind spot the inversion flag misses: a
            # single fast warm rep among slow ones (qb2 sf10p published
            # 16.2 s while 2 of 3 reps sat ~140-160 s). warm_spread =
            # max(rep2..)/min(rep2..) makes the variance visible; above
            # 3x the face is flagged for fresh-JVM re-measurement and the
            # published warm is NOT steady-state-credible on its own.
            if len(reps) > 2:
                spread = max(reps[1:]) / min(reps[1:])
                q[f"{tag}_warm_spread"] = round(spread, 3)
                if spread > 3.0:
                    q[f"{tag}_warm_unstable"] = True
    doc = {"round": int(rnd),
           "rep_policy": ("cold=rep1; warm=min(rep2..); if min(rep2..)>rep1 "
                          "the face is flagged inverted and warm=min(all "
                          "reps) — rep1 is representative under same-JVM "
                          "cache/GC pressure; warm_spread = "
                          "max(rep2..)/min(rep2..), faces above 3x are "
                          "flagged warm_unstable (published warm is a "
                          "minority sample — re-measure in a fresh JVM)"),
           "queries": queries}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    n_inv = sum(1 for q in queries.values()
                if any(k.endswith("_inverted") for k in q))
    n_uns = sum(1 for q in queries.values()
                if any(k.endswith("_warm_unstable") for k in q))
    print(f"{out}: {len(queries)} queries, {n_inv} flagged inverted, "
          f"{n_uns} warm-unstable")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
