"""Targeted per-entry A/B: HEAD vs a base commit for NAMED queries()
entries and/or the ingest benchmark (r14 verdict #2).

The full-campaign tool (tools/ab_bench.py) adjudicates sections by
running all of bench.py per rep — too coarse and too slow to converge a
single ~1s entry like txlog_table, and the ingest path was outside the
variance gate entirely (the r14 2.18M->1.55M rows/s 3-col drop shipped
unadjudicated).  This tool interleaves SMALL subprocess runs (one JVM
per side-rep, base first) that time only the named entries (best of 3
in-process reps) plus bench._bench_ingest, and applies the same <5%
min-movement variance gate per entry.

Writes ``ab_targeted.json`` at the repo root; bench.py publishes the
per-entry ratios in its compact driver-tail summary.  ratio < 1.0 means
HEAD is faster (for ingest the ratio is base_rate/head_rate, same
orientation).

Usage:
    python tools/ab_entry.py [base_commit] --entries txlog_table,ingest
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, sys, time
repo, names, reps = sys.argv[1], sys.argv[2].split(","), int(sys.argv[3])
sys.path.insert(0, repo)
os.chdir(repo)
from neo_server_spark.session import get_spark
spark = get_spark(app_name="ab-entry")
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em
qs = em.queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out = {"queries": {}, "ingest": None}
qs["tag_scan"](spark, sf_dir).write.format("noop").mode("overwrite").save()
for n in names:
    if n == "ingest":
        continue
    runs = []
    for _ in range(reps):
        t0 = time.time()
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    out["queries"][n] = runs
if "ingest" in names:
    import bench
    out["ingest"] = bench._bench_ingest(spark, sf_dir)
spark.stop()
print("ABJSON:" + json.dumps(out))
"""


def _git(*args: str, cwd: str = REPO) -> str:
    return subprocess.run(["git", *args], cwd=cwd, check=True,
                          capture_output=True, text=True).stdout.strip()


def _run_side(tree: str, runner: str, names: list[str],
              reps: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, runner, tree, ",".join(names), str(reps)],
        cwd=tree, env=env, capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit(f"runner failed in {tree}")
    last = [ln for ln in out.stdout.splitlines()
            if ln.startswith("ABJSON:")][-1]
    return json.loads(last[len("ABJSON:"):])


def main() -> None:
    args = sys.argv[1:]
    names = ["txlog_table", "ingest"]
    if "--entries" in args:
        i = args.index("--entries")
        names = args[i + 1].split(",")
        del args[i:i + 2]
    base = args[0] if args else None
    if base is None:
        log = _git("log", "--grep", "^round [0-9]*:", "-n", "1",
                   "--format=%H")
        if not log:
            raise SystemExit("no round-start commit found; pass one")
        base = log
    base = _git("rev-parse", base)
    head = _git("rev-parse", "HEAD")
    pairs_min = int(os.environ.get("AB_ENTRY_PAIRS", "3"))
    pairs_max = int(os.environ.get("AB_ENTRY_MAX_PAIRS", "8"))
    inproc_reps = int(os.environ.get("AB_ENTRY_REPS", "3"))
    qnames = [n for n in names if n != "ingest"]

    with open(os.path.join(tempfile.mkdtemp(prefix="ab_entry_"),
                           "runner.py"), "w") as f:
        f.write(_RUNNER)
        runner = f.name
    wt = tempfile.mkdtemp(prefix="ab_entry_base_")
    _git("worktree", "add", "--detach", wt, base)
    b_runs: list[dict] = []
    h_runs: list[dict] = []
    converged = False

    def _mins(runs: list[dict]) -> dict:
        m: dict = {}
        for n in qnames:
            vals = [min(r["queries"][n]) for r in runs
                    if n in r.get("queries", {})]
            if vals:
                m[n] = min(vals)
        if "ingest" in names:
            for lbl in ("3col", "13col"):
                key = f"ingest_{lbl}_rows_per_sec"
                vals = [r["ingest"][key] for r in runs
                        if r.get("ingest") and key in r["ingest"]]
                if vals:
                    m[f"ingest_{lbl}"] = max(vals)  # best throughput
        return m

    try:
        print(f"ab_entry: {names} base {base[:12]}, interleaved "
              f">= {pairs_min} pairs (cap {pairs_max})", flush=True)
        pair = 0
        while True:
            b_runs.append(_run_side(wt, runner, names, inproc_reps))
            h_runs.append(_run_side(REPO, runner, names, inproc_reps))
            pair += 1
            print(f"ab_entry: pair {pair}: base {_mins(b_runs)} "
                  f"head {_mins(h_runs)}", flush=True)
            if pair >= pairs_max:
                break
            if pair >= pairs_min:
                bp, hp = _mins(b_runs[:-1]), _mins(h_runs[:-1])
                bn, hn = _mins(b_runs), _mins(h_runs)
                moved = any(
                    abs(prev[k] - now[k]) / prev[k] >= 0.05
                    for prev, now in ((bp, bn), (hp, hn))
                    for k in prev)
                if not moved:
                    converged = True
                    break
    finally:
        _git("worktree", "remove", "--force", wt)
    bm, hm = _mins(b_runs), _mins(h_runs)
    entries: dict[str, dict] = {}
    for n in qnames:
        entries[n] = {
            "head_sec": hm[n], "base_sec": bm[n],
            "ratio": round(hm[n] / bm[n], 3),
            "head_reps": [r["queries"][n] for r in h_runs],
            "base_reps": [r["queries"][n] for r in b_runs]}
    ingest: dict[str, dict] = {}
    if "ingest" in names:
        for lbl in ("3col", "13col"):
            k = f"ingest_{lbl}"
            if k in hm and k in bm:
                # rate-oriented: ratio = base_rate / head_rate so that
                # <1.0 still means HEAD is faster, matching the entries
                ingest[lbl] = {
                    "head_rows_per_sec": hm[k],
                    "base_rows_per_sec": bm[k],
                    "ratio": round(bm[k] / hm[k], 3)}
    res = {"entries": entries, "ingest": ingest,
           "pairs": len(h_runs), "converged": converged,
           "base_commit": base[:12], "head_commit": head[:12]}
    with open(os.path.join(REPO, "ab_targeted.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
