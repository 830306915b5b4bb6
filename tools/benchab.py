#!/usr/bin/env python3
"""Prior-tree A/B bench: adjudicate code-vs-host for a bench movement.

The decisive evidence in a tenancy dispute (NOTES_r18) was a manual
one-off: compile the prior round's tree in a temp worktree and run the
same isolated query window on both trees back-to-back in the SAME host
window — same-code-class deltas mean the host moved, a uniform
one-sided ratio means the code did.  This tool is that procedure as one
command with a committed artifact (round-18 directive #2):

    python3 tools/benchab.py <prior-commit> <q32_multimodal_ann,q61_normalize>
        [--cycles 2] [--runs 5] [--sf-dir /root/testdata/sf0.1]
        [--cpus 32] [--out benchab_<sha>.json] [--keep-worktree]

Protocol:
  * the prior commit is checked out into a temp git worktree and
    compiled there (compile time never lands inside a measured window);
    the CURRENT tree is measured as-is, uncommitted changes included;
  * windows alternate current, prior, current, prior ... (--cycles of
    each) so a monotonic host drift — the r18 failure mode, isolated
    probes degrading 1.73 -> 2.61 -> 2.93 s across 90 min — hits both
    trees symmetrically instead of whichever ran last;
  * each window is one Bench JVM with the given queries only
    (SPARK_GRAFT_ONLY), median-of---runs per query, every adaptive
    protocol pass disabled (no remeasure, no headline allowlist, no
    prior artifact, no volatility policy): a fixed protocol on both
    sides is the point;
  * per query the artifact records every raw run per tree, the
    cross-window medians, and ratio = current_median / prior_median
    (> 1 means the current tree is slower).

Reading the artifact: ratios uniformly near 1.0 while both trees show
the same elevated absolutes => host window, not code. Ratios uniformly
one-sided (say > 1.1 with per-window agreement) => the current tree
moved. Mixed => look at the per-window table for drift during the A/B
itself (window wall-clock start times are recorded for exactly that).
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, cwd, env=None, timeout=3600):
    return subprocess.run(cmd, cwd=cwd, env=env, timeout=timeout,
                          capture_output=True, text=True)


def sh(cmd, cwd):
    r = run(cmd, cwd)
    if r.returncode != 0:
        sys.exit(f"FATAL: {' '.join(cmd)} failed in {cwd}:\n{r.stderr}")
    return r.stdout.strip()


def bench_window(tree, queries, runs, sf_dir, cpus, label):
    """One Bench JVM over `queries` only; returns {query: [raw runs]}."""
    # mkstemp, not the deprecated/race-prone mktemp (r19 advisory);
    # Bench opens the path for write, so a pre-created empty file is fine
    fd, full_out = tempfile.mkstemp(prefix=f"benchab_{label}_",
                                    suffix=".json")
    os.close(fd)
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_ONLY": ",".join(queries),
        "SPARK_GRAFT_RUNS": str(runs),
        # fixed protocol, both sides: no adaptive passes
        "SPARK_GRAFT_REMEASURE_RUNS": "0",
        "SPARK_GRAFT_HEADLINE": "",
        "SPARK_GRAFT_PRIOR_BENCH": "",
        "SPARK_GRAFT_BENCH_OUT": full_out,
        # a window must never trip the single-run degradation
        "SPARK_GRAFT_REPEAT_BUDGET": "100000",
    })
    t0 = time.time()
    r = run(["sbt", "-batch", "runMain graft.Bench"], cwd=tree, env=env,
            timeout=7200)
    if r.returncode != 0:
        sys.exit(f"FATAL: bench window '{label}' failed in {tree}:\n"
                 f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    try:
        with open(full_out) as f:
            art = json.load(f)
        os.unlink(full_out)
    except Exception as e:
        sys.exit(f"FATAL: window '{label}' wrote no parsable full "
                 f"artifact ({e});\nstdout tail:\n{r.stdout[-2000:]}")
    exec_map = art.get("exec", {})
    got = {q: exec_map[q]["runs"] for q in queries if q in exec_map}
    missing = [q for q in queries if q not in got]
    if missing:
        sys.exit(f"FATAL: window '{label}' measured no runs for "
                 f"{missing} — check the query names against "
                 "SparkEntry.queries")
    return {"start_unix": round(t0, 1), "wall_sec": round(time.time() - t0, 1),
            "runs": got}


def median(xs):
    # upper median for even N, matching Bench's convention
    return sorted(xs)[len(xs) // 2]


def main():
    ap = argparse.ArgumentParser(
        description="same-window prior-tree bench A/B (see module doc)")
    ap.add_argument("commit", help="prior commit/ref to A/B against")
    ap.add_argument("queries", help="comma-separated SparkEntry query names")
    ap.add_argument("--cycles", type=int, default=2,
                    help="windows per tree, alternated (default 2)")
    ap.add_argument("--runs", type=int, default=5,
                    help="timed runs per query per window (default 5)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=None,
                    help="artifact path (default benchab_<sha>.json)")
    ap.add_argument("--keep-worktree", action="store_true")
    args = ap.parse_args()

    queries = [q.strip() for q in args.queries.split(",") if q.strip()]
    if not queries:
        sys.exit("FATAL: no query names given")

    prior_sha = sh(["git", "rev-parse", "--short", args.commit], REPO)
    cur_sha = sh(["git", "rev-parse", "--short", "HEAD"], REPO)
    # dirty = anything that changes what sbt COMPILES relative to the
    # recorded HEAD sha: tracked modifications anywhere, plus UNTRACKED
    # files under the build inputs (an untracked src/ file is compiled
    # into the measured "current" tree — recording the tree as clean
    # would corrupt exactly the provenance this artifact pins down).
    # Untracked artifacts/notes elsewhere do not affect the build.
    status = sh(["git", "status", "--porcelain"], REPO)
    dirty = [l for l in status.splitlines()
             if not l.startswith("??")
             or l[3:].startswith(("src/", "project/", "build.sbt"))]
    out_path = args.out or os.path.join(REPO, f"benchab_{prior_sha}.json")

    wt = os.path.join(tempfile.gettempdir(), f"benchab_wt_{prior_sha}")
    print(f"[benchab] current={cur_sha}{'+dirty' if dirty else ''} "
          f"prior={prior_sha} queries={queries}", flush=True)
    if not os.path.isdir(wt):
        sh(["git", "worktree", "add", "--detach", wt, args.commit], REPO)
    try:
        # compile both trees OUTSIDE the measured windows
        for tree, name in ((wt, "prior"), (REPO, "current")):
            print(f"[benchab] compiling {name} tree ({tree})", flush=True)
            r = run(["sbt", "-batch", "compile"], cwd=tree, timeout=1800)
            if r.returncode != 0:
                sys.exit(f"FATAL: sbt compile failed in {tree}:\n"
                         f"{r.stdout[-2000:]}")

        windows = []
        for cycle in range(args.cycles):
            for tree, name in ((REPO, "current"), (wt, "prior")):
                label = f"{name}{cycle}"
                print(f"[benchab] window {label} ...", flush=True)
                w = bench_window(tree, queries, args.runs, args.sf_dir,
                                 args.cpus, label)
                w["tree"] = name
                w["cycle"] = cycle
                windows.append(w)
                meds = {q: median(rs) for q, rs in w["runs"].items()}
                print(f"[benchab] window {label}: " + " ".join(
                    f"{q}={m:.2f}" for q, m in meds.items()), flush=True)

        per_query = {}
        for q in queries:
            cur = [t for w in windows if w["tree"] == "current"
                   for t in w["runs"][q]]
            pri = [t for w in windows if w["tree"] == "prior"
                   for t in w["runs"][q]]
            cm, pm = median(cur), median(pri)
            per_query[q] = {
                "current_median": round(cm, 3),
                "prior_median": round(pm, 3),
                "ratio": round(cm / max(pm, 1e-9), 3),
                "current_runs": [round(t, 3) for t in cur],
                "prior_runs": [round(t, 3) for t in pri],
            }

        ratios = sorted(v["ratio"] for v in per_query.values())
        summary = {
            "median_ratio": ratios[len(ratios) // 2],
            "min_ratio": ratios[0],
            "max_ratio": ratios[-1],
        }
        art = {
            "tool": "benchab",
            "current_commit": cur_sha,
            "current_dirty": bool(dirty),
            "prior_commit": prior_sha,
            "sf_dir": args.sf_dir,
            "cpus": args.cpus,
            "cycles": args.cycles,
            "runs_per_window": args.runs,
            "queries": queries,
            "per_query": per_query,
            "summary": summary,
            "windows": windows,
        }
        with open(out_path, "w") as f:
            json.dump(art, f, indent=1)
        print(f"[benchab] artifact -> {out_path}")
        print(f"[benchab] summary: median ratio "
              f"{summary['median_ratio']:.3f} "
              f"(range {summary['min_ratio']:.3f}..{summary['max_ratio']:.3f}; "
              "ratio = current/prior, >1 means current slower)")
        for q, v in per_query.items():
            print(f"[benchab]   {q}: current {v['current_median']:.2f} "
                  f"vs prior {v['prior_median']:.2f} (x{v['ratio']:.3f})")
    finally:
        if not args.keep_worktree and os.path.isdir(wt):
            run(["git", "worktree", "remove", "--force", wt], REPO)


if __name__ == "__main__":
    main()
