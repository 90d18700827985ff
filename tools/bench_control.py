#!/usr/bin/env python
"""Same-day bench drift control: A/B two git states of this repo on
THIS host, back-to-back, and report paired ratios.

Why: absolute bench seconds do NOT compare across driver rounds — the
host band moves (r11's recorded 69.5 s re-measured 80.7 s on the r13
host with identical code; BASELINE.md r13-open adjudication). The
drift signal is the HEAD-vs-CONTROL ratio measured in one sitting,
where everything host-level cancels. This tool codifies the manual
adjudications run at r12/r13 open (the r13 VERDICT's task #2).

Usage:
    python tools/bench_control.py --control <git-ref> \
        [--head <git-ref>] [--sf-dir /root/testdata/sf0.1] \
        [--pairs 1] [--out BENCH_CONTROL.json] [--label r14-open]

The control ref (and a head ref, when given) is materialized in a
detached worktree under /tmp; with no --head the CURRENT tree runs
as head, uncommitted changes included. Each pair runs control then
head (alternating order across pairs to cancel slow host drift), with
the 1-minute load average recorded at each start — samples starting
above --quiet-load are flagged, since numbers read low right after
heavy runs (BASELINE.md host-discipline note). The summary JSON keeps
every wall-clock, the paired head/control ratios, and a per-query
ratio distribution (median / p10 / p90 / top movers) from bench.py's
stderr detail line, and the tool prints a BASELINE.md-ready paragraph.

Interpretation contract (also documented in BASELINE.md): the paired
median ratio is the code signal; same-HEAD A/B scatter on this box is
~7%, so ratios within ~0.93-1.07 are noise. Per-query sub-second
swings up to ~1.7x between runs are routine — look at the MEDIAN and
at whether top movers reverse sign between pairs before blaming a
plan."""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args: list[str], cwd: str = REPO, check: bool = True) -> str:
    p = subprocess.run(args, cwd=cwd, capture_output=True, text=True)
    if check and p.returncode != 0:
        raise SystemExit(f"command failed: {' '.join(args)}\n{p.stderr}")
    return p.stdout.strip()


def materialize(ref: str) -> tuple[str, str]:
    """Detached worktree for ref under /tmp; returns (path, sha)."""
    sha = sh(["git", "rev-parse", ref])
    path = f"/tmp/wt_benchctl_{sha[:12]}"
    if not os.path.isdir(path):
        # a /tmp cleanup (reboot) removes the directory but not git's
        # registration; prune first so the add is self-healing
        sh(["git", "worktree", "prune"])
        sh(["git", "worktree", "add", "--detach", path, sha])
    return path, sha


def run_bench(tree: str, sf_dir: str) -> dict:
    """One bench.py run; returns {wall, queries (full detail), load}."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    load = os.getloadavg()[0]
    t0 = time.time()
    p = subprocess.run([sys.executable, "bench.py"], cwd=tree, env=env,
                       capture_output=True, text=True, timeout=1800)
    elapsed = time.time() - t0
    if p.returncode != 0:
        raise SystemExit(f"bench.py failed in {tree}:\n{p.stderr[-2000:]}")
    summary = json.loads(p.stdout.strip().splitlines()[-1])
    detail = {}
    for line in reversed(p.stderr.strip().splitlines()):
        try:
            d = json.loads(line)
        except (ValueError, json.JSONDecodeError):
            continue
        if isinstance(d, dict) and "queries" in d:
            detail = d["queries"]
            break
    return {"wall": summary["value"], "n_queries": summary["n_queries"],
            "queries": detail, "start_load_1min": round(load, 2),
            "elapsed_incl_startup": round(elapsed, 1)}


def per_query_ratios(head_runs: list[dict],
                     control_runs: list[dict]) -> dict:
    """Min-per-query across runs on each side, then head/control."""
    def best(runs):
        out = {}
        for r in runs:
            for q, t in r["queries"].items():
                v = min(t) if isinstance(t, list) else t
                out[q] = min(out.get(q, float("inf")), v)
        return out

    h, c = best(head_runs), best(control_runs)
    common = sorted(set(h) & set(c))
    if not common:
        return {}
    ratios = sorted((h[q] / c[q], q) for q in common if c[q] > 0)
    vals = [r for r, _ in ratios]
    movers = [{"query": q, "ratio": round(r, 3)}
              for r, q in ratios[-5:][::-1] if r >= 1.5]
    k = len(vals)
    if k >= 2:
        deciles = statistics.quantiles(vals, n=10)
        p10, p90 = deciles[0], deciles[8]
    else:
        p10 = p90 = vals[0]
    return {"n_common": k,
            "median": round(statistics.median(vals), 4),
            "p10": round(p10, 4),
            "p90": round(p90, 4),
            "movers_ge_1p5x": movers}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--control", required=True,
                    help="git ref of the control (prior-round HEAD)")
    ap.add_argument("--head", default=None,
                    help="git ref for head; default = current tree "
                         "(uncommitted changes included)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--pairs", type=int, default=1,
                    help="control+head pairs to run (default 1)")
    ap.add_argument("--quiet-load", type=float, default=1.5)
    ap.add_argument("--cooldown-max", type=int, default=0,
                    help="wait up to this many seconds before EACH leg "
                         "for the 1-min load to fall under --quiet-load "
                         "(a bench leg leaves load ~4, so back-to-back "
                         "legs can never start quiet without this; the "
                         "r14 close pair was flagged for exactly that)")
    ap.add_argument("--label", default="",
                    help="tag recorded in the JSON (e.g. r14-open)")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BENCH_CONTROL.json"))
    args = ap.parse_args()

    ctl_tree, ctl_sha = materialize(args.control)
    if args.head:
        head_tree, head_sha = materialize(args.head)
        head_name = args.head
    else:
        head_tree, head_sha = REPO, sh(["git", "rev-parse", "HEAD"])
        head_name = "WORKTREE"
        dirty = sh(["git", "status", "--porcelain"])
        if dirty:
            head_name = "WORKTREE(dirty)"

    runs: list[dict] = []
    for i in range(args.pairs):
        # alternate order so slow monotone host drift cancels in the
        # paired ratio instead of biasing one side
        order = [("control", ctl_tree), ("head", head_tree)]
        if i % 2:
            order.reverse()
        for side, tree in order:
            waited = 0
            while (args.cooldown_max and waited < args.cooldown_max
                   and os.getloadavg()[0] > args.quiet_load):
                time.sleep(15)
                waited += 15
            if waited:
                print(f"  cooled down {waited}s (load now "
                      f"{os.getloadavg()[0]:.2f})", flush=True)
            r = run_bench(tree, args.sf_dir)
            r["side"] = side
            r["pair"] = i
            r["quiet"] = r["start_load_1min"] <= args.quiet_load
            runs.append(r)
            print(f"pair {i} {side}: {r['wall']:.2f} s "
                  f"(load {r['start_load_1min']}"
                  f"{'' if r['quiet'] else ' NOT QUIET'})",
                  flush=True)

    ctl = [r for r in runs if r["side"] == "control"]
    hed = [r for r in runs if r["side"] == "head"]
    pair_ratios = [round(h["wall"] / c["wall"], 4)
                   for h, c in zip(hed, ctl)]
    result = {
        "label": args.label,
        "date": time.strftime("%Y-%m-%d"),
        "sf_dir": args.sf_dir,
        "control": {"ref": args.control, "sha": ctl_sha,
                    "walls": [r["wall"] for r in ctl]},
        "head": {"ref": head_name, "sha": head_sha,
                 "walls": [r["wall"] for r in hed]},
        "pair_ratios": pair_ratios,
        "median_pair_ratio": round(statistics.median(pair_ratios), 4),
        "per_query": per_query_ratios(hed, ctl),
        "all_quiet": all(r["quiet"] for r in runs),
        "runs": [{k: v for k, v in r.items() if k != "queries"}
                 for r in runs],
        "scatter_note": "same-HEAD A/B scatter on this host is ~7%; "
                        "pair ratios inside 0.93-1.07 are host noise, "
                        "not code drift",
    }
    history = []
    if os.path.exists(args.out):
        try:
            prev = json.load(open(args.out))
            history = prev.get("history", []) + [
                {k: prev[k] for k in ("label", "date", "median_pair_ratio",
                                      "control", "head")
                 if k in prev}]
        except (ValueError, KeyError):
            pass
    result["history"] = history
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"\nwrote {args.out}")

    pq = result["per_query"]
    hed_s = "/".join("%.2f" % r["wall"] for r in hed)
    ctl_s = "/".join("%.2f" % r["wall"] for r in ctl)
    quiet_s = ("all starts quiet" if result["all_quiet"]
               else "SOME STARTS NOT QUIET")
    print("\nBASELINE.md-ready paragraph:\n")
    print(f"**{args.label or 'bench control'} ({result['date']}).** "
          f"Paired same-day A/B (tools/bench_control.py): head "
          f"{head_name}@{head_sha[:7]} vs control "
          f"{args.control}@{ctl_sha[:7]} at {args.sf_dir}: "
          f"head {hed_s} s vs control {ctl_s} s, "
          f"median pair ratio **{result['median_pair_ratio']}** "
          f"(per-query median {pq.get('median')}, "
          f"p10/p90 {pq.get('p10')}/{pq.get('p90')}, "
          f"movers ≥1.5x: {pq.get('movers_ge_1p5x') or 'none'}); "
          f"{quiet_s} (1-min load ≤ {args.quiet_load}). Ratios, not "
          f"absolute seconds, are the drift signal.")


if __name__ == "__main__":
    main()
