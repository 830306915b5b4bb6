#!/usr/bin/env python3
"""Standing failure-mode gate: run the three ScaleRehearsal
failure-mode cases (faults, concurrent, streamrecovery, specfaults,
streamstate) and record a
per-probe artifact FAULTCHECK_rN.json.

Each case is its own sbt/JVM invocation (the faults case needs a
retry-enabled local[16,4] master, and every case asserts internally —
a nonzero exit means a probe FAILED, which this tool records rather
than hides). The artifact carries every `[rehearsal] ... PASS|FAIL`
probe line so a reader can see exactly which invariant was exercised,
plus the exit code per case.

Usage: tools/faultcheck.py --round N [--repo /root/repo]
Exit 1 if any case exits nonzero or any probe line says FAIL.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time


def run_case(repo, case, timeout_sec):
    t0 = time.time()
    try:
        p = subprocess.run(
            ["sbt", "-batch", f"Test/runMain graft.tools.ScaleRehearsal {case}"],
            cwd=repo, capture_output=True, text=True, timeout=timeout_sec)
        rc, out = p.returncode, p.stdout + p.stderr
    except subprocess.TimeoutExpired as e:
        rc = -1
        out = ((e.stdout or b"").decode("utf-8", "replace") +
               (e.stderr or b"").decode("utf-8", "replace") +
               f"\n[faultcheck] TIMEOUT after {timeout_sec}s")
    probes = []
    for line in out.splitlines():
        m = re.search(r"\[rehearsal\] (.*?) (PASS|FAIL)\s*$", line)
        # streamstate probes end in their own verdict vocabulary
        m2 = re.search(
            r"\[rehearsal\] (streamstate .*?) "
            r"(PLATEAU|\*\*\* GREW \*\*\*|"
            r"GREW \(probe is sensitive\)|\*\*\* DID NOT GROW \*\*\*)\s*$", line)
        if m:
            probes.append({"probe": m.group(1), "result": m.group(2)})
        elif m2:
            good = m2.group(2) in ("PLATEAU", "GREW (probe is sensitive)")
            probes.append({"probe": m2.group(1) + " " + m2.group(2),
                           "result": "PASS" if good else "FAIL"})
        elif "[rehearsal]" in line and ("bit-identical" in line or
                                        "retry-invariant" in line or
                                        "horizon-bound" in line or
                                        "contract" in line):
            probes.append({"probe": line.split("[rehearsal]", 1)[1].strip(),
                           "result": "SUMMARY"})
    return {
        "rc": rc,
        "wall_sec": round(time.time() - t0, 1),
        "probes": probes,
        "failed_probes": [p["probe"] for p in probes if p["result"] == "FAIL"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-case wall-clock cap in seconds")
    args = ap.parse_args()

    cases = ["faults", "concurrent", "streamrecovery", "specfaults", "streamstate"]
    result = {"round": args.round, "cases": {}}
    bad = False
    for case in cases:
        r = run_case(args.repo, case, args.timeout)
        result["cases"][case] = r
        ok = r["rc"] == 0 and not r["failed_probes"] and r["probes"]
        if not r["probes"]:
            print(f"[faultcheck] {case}: NO PROBE LINES (rc={r['rc']}) — "
                  "rehearsal output shape changed or the run died early",
                  file=sys.stderr)
        bad |= not ok
        n_pass = sum(1 for p in r["probes"] if p["result"] == "PASS")
        n_sum = sum(1 for p in r["probes"] if p["result"] == "SUMMARY")
        print(f"[faultcheck] {case}: rc={r['rc']} pass={n_pass} "
              f"summaries={n_sum} fail={len(r['failed_probes'])} "
              f"wall={r['wall_sec']}s")
    # unpadded rN matches the sibling artifact convention
    # (DATACHECK_r11.json, BENCH_r9.json, NOTES_r4.md)
    out = os.path.join(args.repo, f"FAULTCHECK_r{args.round}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[faultcheck] wrote {out}")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
