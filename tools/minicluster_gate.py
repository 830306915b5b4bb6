#!/usr/bin/env python3
"""Multi-JVM correctness gate -> MINICLUSTER_rN.json (round-13
directive #1: every oracle gate to date ran in one JVM; serialization,
locality, fetch-order, and broadcast-lifecycle bugs only exist across
JVMs, and the one nondeterminism class found in 13 rounds — withRowId
assignment order — surfaced exactly there).

Pipeline (resumable via --skip-* flags):
  1. `sbt Test/runMain graft.tools.MiniClusterGate --local` — executes
     all 82 queries on local[8] as parquet writes, capturing each
     write's OWN final-plan operator histogram (the plan-flip
     comparison baseline; single-JVM values are already the standing
     CORRECTNESS artifact).
  2. `sbt Test/runMain graft.tools.MiniClusterGate` — starts the
     two-hostname standalone mini cluster (master + 2 worker JVMs
     under the runsc/vm loopback aliases, 4 cores / 4 GiB executor
     each); each query executes EXACTLY ONCE as the gated parquet
     write (Verify layout), and the audited plan is captured from that
     same execution via QueryExecutionListener.
  3. `tools/check_oracle.py` replays the DuckDB oracles against the
     MULTI-JVM outputs (the same type-aware compare the driver runs).
  4. Merge into MINICLUSTER_rN.json: per query
       cluster_ok / oracle / plan_local / plan_cluster / plan_flip
     plan_flip lists operator-histogram deltas between the local and
     cluster FINAL plans (expected class: broadcast-threshold or AQE
     coalescing differences from the different core/memory topology —
     each one should be read and attributed in NOTES).

Usage: python3 tools/minicluster_gate.py --round 14
       [--skip-local] [--skip-cluster] [--skip-oracle]
"""
import argparse, json, os, re, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"
LOCAL_OUT = "/tmp/graft_minicluster/local"
CLUSTER_OUT = "/tmp/graft_minicluster/cluster"


def oracle_log(rnd):
    # round-suffixed and stored NEXT TO the cluster outputs it grades:
    # a bare /tmp path survived across rounds, so a --skip-oracle run
    # could silently grade THIS round's outputs against a STALE oracle
    # pass (advisor finding r14)
    return f"{CLUSTER_OUT}/oracle_r{rnd}.txt"


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, cwd=REPO, **kw)


def sbt_gate(local):
    args = ["sbt", "-batch",
            "Test/runMain graft.tools.MiniClusterGate" +
            (" --local" if local else "")]
    env = dict(os.environ, SPARK_DRIVER_MEM="16g")
    r = run(args, env=env)
    if r.returncode != 0:
        sys.exit(f"gate run failed (local={local}); see output above")


def parse_hist(s):
    return dict(kv.split("=") for kv in s.split() if "=" in kv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--skip-local", action="store_true")
    ap.add_argument("--skip-cluster", action="store_true")
    ap.add_argument("--skip-oracle", action="store_true")
    a = ap.parse_args()

    log = oracle_log(a.round)
    if not a.skip_local:
        sbt_gate(local=True)
    if not a.skip_cluster:
        # the cluster stage is about to OVERWRITE the parquet outputs
        # this round's oracle log graded: invalidate the log so a later
        # --skip-oracle run cannot grade the fresh outputs against the
        # previous cluster run's oracle pass (advisor finding r15 — the
        # round-suffixed path fixed cross-round staleness but not
        # same-round re-runs)
        if os.path.exists(log):
            os.remove(log)
        sbt_gate(local=False)
    if not a.skip_oracle:
        with open(log, "w") as f:
            r = run([sys.executable, "tools/check_oracle.py", SF, CLUSTER_OUT],
                    stdout=f, stderr=subprocess.STDOUT)
        # non-zero exit = per-query failures; still merge so the
        # artifact shows WHICH queries broke across JVMs
        print(open(log).read()[-2000:])
    elif not os.path.exists(log):
        sys.exit(f"--skip-oracle but no oracle pass for round {a.round} "
                 f"exists at {log}; run once without --skip-oracle first")

    local_plans = json.load(open(f"{LOCAL_OUT}/plans.json"))
    cluster_plans = json.load(open(f"{CLUSTER_OUT}/plans.json"))
    local_errs = json.load(open(f"{LOCAL_OUT}/errors.json"))
    cluster_errs = json.load(open(f"{CLUSTER_OUT}/errors.json"))

    oracle = {}
    for line in open(log):
        m = re.match(r"^(q\w+): (OK \(\d+ rows\)|rows-only \(\d+ rows\)|.+)$",
                     line.strip())
        if m:
            oracle[m.group(1)] = m.group(2)

    names = sorted(set(local_plans) | set(cluster_plans) |
                   set(local_errs) | set(cluster_errs))
    out, fails, flips = {}, 0, 0
    for n in names:
        lp, cp = local_plans.get(n, ""), cluster_plans.get(n, "")
        lh, ch = parse_hist(lp), parse_hist(cp)
        delta = {k: f"{lh.get(k, '0')}->{ch.get(k, '0')}"
                 for k in sorted(set(lh) | set(ch))
                 if lh.get(k, "0") != ch.get(k, "0")}
        o = oracle.get(n, "NOT CHECKED")
        ok = (n in cluster_plans and n not in cluster_errs and
              (o.startswith("OK") or o.startswith("rows-only")))
        if not ok:
            fails += 1
        if delta:
            flips += 1
        out[n] = {
            "cluster_ok": ok,
            "oracle": o,
            "err": cluster_errs.get(n),
            "plan_flip": delta or None,
            "plan_local": lp,
            "plan_cluster": cp,
        }

    doc = {
        "round": a.round,
        "sf": SF,
        "cluster": "standalone master + 2 worker JVMs (runsc/vm loopback "
                   "aliases), 4 cores / 4g executor memory each, "
                   "shuffle.partitions=8",
        "queries": len(names),
        "failures": fails,
        "plan_flips": flips,
        "results": out,
    }
    path = os.path.join(REPO, f"MINICLUSTER_r{a.round}.json")
    json.dump(doc, open(path, "w"), indent=1)
    print(f"\n{path}: {len(names)} queries, {fails} failures, "
          f"{flips} plan flips")
    for n, r in out.items():
        if r["plan_flip"]:
            print(f"  flip {n}: {r['plan_flip']}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
