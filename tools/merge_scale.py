#!/usr/bin/env python3
"""Merge new TimeOne-log axes into an existing BENCH_r{N}_scale.json.

Usage: python3 tools/merge_scale.py <existing.json> <new.json> [rename=a:b ...]

<new.json> is an assemble_scale.py output. Per query, its <tag>_* keys are
copied into the existing artifact's entry (creating the entry if absent,
keeping the new run's family label). `rename=sf100p:sf100p_r2` renames a
tag on the way in — used when a face already carries that axis from an
earlier measurement this round and BOTH must survive (the re-measure is a
code change's after, the original is its before; silently overwriting the
before would make the artifact lie about what was measured when).
"""
import json
import sys


def main(existing, new, renames):
    base = json.load(open(existing))
    add = json.load(open(new))
    ren = dict(r.split(":", 1) for r in renames)
    for name, q in add["queries"].items():
        dst = base["queries"].setdefault(name, {"family": q.get("family", "?")})
        for k, v in q.items():
            if k == "family":
                if "family" not in dst or dst["family"] == "?":
                    dst["family"] = v
                continue
            tag, rest = k.split("_", 1) if "_" in k else (k, "")
            # tags are the longest prefix that matches a rename key
            for old, newtag in ren.items():
                if k.startswith(old + "_"):
                    k = newtag + "_" + k[len(old) + 1:]
                    break
            dst[k] = v
    json.dump(base, open(existing, "w"), indent=1)
    print(f"merged {len(add['queries'])} queries into {existing}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         [a.split("=", 1)[1] for a in sys.argv[3:] if a.startswith("rename=")])
