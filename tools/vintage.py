"""Per-entry driver vintage audit.

For every `queries()` registry entry, compute the LATEST round whose
driver CORRECTNESS_r*.json recorded it fully green (rows + schema +
value-hash match, no error), plus the never-green set — the bookkeeping
the round verdicts recompute by hand every round (r12 "straggler" rule,
r13/r14 rotation directives).

    python tools/vintage.py            # summary + oldest-vintage names
    python tools/vintage.py --json     # machine-readable dump
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def vintages() -> tuple[dict[str, int], list[str]]:
    import __spark_entry__ as entrymod

    names = list(entrymod.queries().keys())
    vint: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO,
                                              "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, v in data.items():
            if isinstance(v, dict) and v.get("rows_match") \
                    and v.get("schema_match") and v.get("hash_match") \
                    and not v.get("err"):
                vint[name] = max(vint.get(name, 0), rnd)
    never = [n for n in names if n not in vint]
    return {n: vint[n] for n in names if n in vint}, never


def main() -> None:
    vint, never = vintages()
    if "--json" in sys.argv:
        print(json.dumps({"vintage": vint, "never_green": never}))
        return
    by: dict[int, list[str]] = {}
    for n, r in vint.items():
        by.setdefault(r, []).append(n)
    total = len(vint) + len(never)
    print(f"{total} registry entries; "
          f"{len(never)} never driver-green"
          + (f": {never}" if never else ""))
    for r in sorted(by):
        print(f"  r{r}: {len(by[r])}")
    oldest = min(by)
    print(f"oldest vintage r{oldest}: {sorted(by[oldest])}")


if __name__ == "__main__":
    main()
