#!/usr/bin/env python3
"""Assemble BENCH_r{N}_scale.json from tools/run_scale.sh TimeOne logs.

Usage: python3 tools/assemble_scale.py <round> <out.json> <tag>=<logPrefix>...
  e.g. python3 tools/assemble_scale.py 9 BENCH_r9_scale.json \
         sf10=/tmp/scale_sf10 sf1=/tmp/scale_sf1 sf10p=/tmp/scale_sf10p

Each log contributes {query: {"<tag>_cold": rep1, "<tag>_warm": min(rep2..)}}.
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
                if rep == 1:
                    q[f"{tag}_cold"] = sec
                    q[f"{tag}_rows"] = rows
                else:
                    k = f"{tag}_warm"
                    q[k] = min(q.get(k, sec), sec)
    doc = {"round": int(rnd), "queries": queries}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{out}: {len(queries)} queries")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
