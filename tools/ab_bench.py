"""Same-box A/B bench: HEAD vs a base commit (default: round start).

The driver box's ambient load has repeatedly manufactured phantom
stable44 regressions (r10/r11 verdicts) — the honest cross-round perf
signal is the RATIO of two runs taken on the SAME box in the SAME hour
under the same conditions.  This tool:

1. materializes ``base_commit`` into a temporary git worktree,
2. runs ``bench.py`` there, then runs ``bench.py`` at HEAD (interleaved
   base-first so JIT/page-cache warmup, if any, favors the BASE) —
   3 reps per side by default (AB_BENCH_REPS),
3. writes ``bench_ab.json`` at the repo root with the stable44 ratio
   AND a per-SECTION ratio table covering every bench section both
   commits share, plus the worst-section ratio (r12 verdict #2: the
   round-7+ sections — all the new-code queries — were previously
   unprotected by the A/B instrument).

bench.py picks the file up automatically and publishes the ratio in its
compact (driver-tail) summary.  ratio < 1.0 means HEAD is faster.

Usage: python tools/ab_bench.py [base_commit]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str, cwd: str = REPO) -> str:
    return subprocess.run(["git", *args], cwd=cwd, check=True,
                          capture_output=True, text=True).stdout.strip()


def _run_bench(cwd: str) -> dict:
    """Run bench.py in ``cwd``; parse the LAST JSON line (the compact
    summary; older revisions print a single full line — also last)."""
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = subprocess.run([sys.executable, "bench.py"], cwd=cwd, env=env,
                         capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit(f"bench.py failed in {cwd}")
    last = [ln for ln in out.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else None
    if base is None:
        # default: the round-start commit = the last driver bookkeeping
        # commit ("round N: verdict/advice/correctness/bench")
        log = _git("log", "--grep", "^round [0-9]*:", "-n", "1",
                   "--format=%H")
        if not log:
            raise SystemExit("no round-start commit found; pass one")
        base = log
    base = _git("rev-parse", base)
    head = _git("rev-parse", "HEAD")
    reps_min = int(os.environ.get("AB_BENCH_REPS", "3"))
    reps_max = int(os.environ.get("AB_BENCH_MAX_REPS", "10"))
    wt = tempfile.mkdtemp(prefix="ab_base_")
    _git("worktree", "add", "--detach", wt, base)
    b_runs: list[dict] = []
    h_runs: list[dict] = []
    converged = False
    try:
        print(f"ab_bench: base {base[:12]} in {wt}, "
              f">= {reps_min}x interleaved (variance-gated, cap "
              f"{reps_max})", flush=True)
        # INTERLEAVED reps (base, head, base, head, ...): a load spike
        # during any single run cannot bias one side — the per-side MIN
        # is each commit's steady-state cost under the same hour's box.
        # VARIANCE GATE (r13 verdict #2): after the minimum pairs, keep
        # buying pairs until the last pair moved NEITHER side's min by
        # >= 5% — the artifact then defends itself against box noise
        # instead of needing a human to adjudicate rep spread.
        rep = 0
        while True:
            b_runs.append(_run_bench(wt))
            print(f"ab_bench: base[{rep}] stable44 "
                  f"{b_runs[-1].get('stable44_sec')}", flush=True)
            h_runs.append(_run_bench(REPO))
            print(f"ab_bench: head[{rep}] stable44 "
                  f"{h_runs[-1].get('stable44_sec')}", flush=True)
            rep += 1
            if rep >= reps_max:
                break
            if rep >= reps_min and rep >= 2:
                b_prev = min(r["stable44_sec"] for r in b_runs[:-1])
                h_prev = min(r["stable44_sec"] for r in h_runs[:-1])
                b_now = min(r["stable44_sec"] for r in b_runs)
                h_now = min(r["stable44_sec"] for r in h_runs)
                if (b_prev - b_now) / b_prev < 0.05 \
                        and (h_prev - h_now) / h_prev < 0.05:
                    converged = True
                    break
    finally:
        _git("worktree", "remove", "--force", wt)
    b44s = [r["stable44_sec"] for r in b_runs]
    h44s = [r["stable44_sec"] for r in h_runs]
    b44, h44 = min(b44s), min(h44s)
    # per-SECTION ratios (r12 verdict #2): stable44 alone left every
    # round-7+ section unprotected — a regression in, say, txlog_dml was
    # indistinguishable from host drift.  Sections only HEAD has (new
    # code this round) have no base to compare against and are skipped.
    sections: dict[str, dict] = {}
    h_secs = [r.get("sections_sec", {}) for r in h_runs]
    b_secs = [r.get("sections_sec", {}) for r in b_runs]
    for sec in (h_secs[0].keys() if h_secs else []):
        hs = [s[sec] for s in h_secs if sec in s]
        bs = [s[sec] for s in b_secs if sec in s]
        if not hs or not bs or not min(bs):
            continue
        sections[sec] = {"head": min(hs), "base": min(bs),
                         "ratio": round(min(hs) / min(bs), 3)}
    worst = (max(sections.items(), key=lambda kv: kv[1]["ratio"])
             if sections else None)
    # ingest under the variance gate too (r14 verdict #2): each rep's
    # compact carries the 3-col best-of-2 rate; best rate per side,
    # ratio oriented so < 1.0 means HEAD is faster
    ingest = None
    h_ing = [r.get("ingest_rows_per_sec") for r in h_runs
             if r.get("ingest_rows_per_sec")]
    b_ing = [r.get("ingest_rows_per_sec") for r in b_runs
             if r.get("ingest_rows_per_sec")]
    if h_ing and b_ing:
        ingest = {"head_rows_per_sec": max(h_ing),
                  "base_rows_per_sec": max(b_ing),
                  "ratio": round(max(b_ing) / max(h_ing), 3)}
    res = {
        "head_stable44": h44,
        "base_stable44": b44,
        "ingest": ingest,
        "ratio": round(h44 / b44, 4) if b44 else None,
        "head_stable44_reps": h44s,
        "base_stable44_reps": b44s,
        # variance-gate telemetry (r13 verdict #2): pair count, whether
        # the <5% min-movement gate tripped before the cap, and each
        # side's rep spread (max/min) — spread > 1.5 marks a noisy box
        "pairs": len(h_runs),
        "converged": converged,
        "head_spread": round(max(h44s) / h44, 2),
        "base_spread": round(max(b44s) / b44, 2),
        "sections": sections,
        "worst_section": ([worst[0], worst[1]["ratio"]]
                          if worst else None),
        "base_commit": base[:12],
        "head_commit": head[:12],
        "head_total": min(r.get("value", 9e9) for r in h_runs),
        "base_total": min(r.get("value", 9e9) for r in b_runs),
    }
    with open(os.path.join(REPO, "bench_ab.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
