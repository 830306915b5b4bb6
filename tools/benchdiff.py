#!/usr/bin/env python3
"""Noise-aware bench comparison between two BENCH artifacts.

Every round produces a BENCH_rN.json whose medians wiggle with tenancy
(the artifact's own `noise` field — median per-query relative run
spread — has measured 0.41..0.49 across rounds, i.e. a typical query's
min..max band is ~±24% of its median). Eyeballing two rounds' tables
re-litigates that wiggle each time; this tool applies one fixed,
documented rule instead:

  flag a query as MOVED when BOTH
    - relative |delta| > max(noise_a, noise_b)   (outside the measured
      run-spread band of either artifact), and
    - absolute |delta| > 0.15 s                  (sub-150ms medians are
      scheduler quantization at local[32] scale);
  tier it STRONG when relative |delta| > 2x that noise bound and
  absolute |delta| > 0.40 s.

Inputs: driver-written BENCH_rN.json (the {parsed: {...}} wrapper) or a
raw one-line bench JSON (the engine's stdout line). Exit 0 always in
advisory mode; --strict exits 1 if any STRONG regression exists (for
wiring into a round script as a gate).

Usage: tools/benchdiff.py OLD.json NEW.json [--strict]
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    doc = json.loads(text)
    if "parsed" in doc:  # driver wrapper
        doc = doc["parsed"]
    if "queries" not in doc:
        sys.exit(f"{path}: no 'queries' field (not a bench artifact?)")
    return doc


def main():
    args = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    if len(args) != 2:
        sys.exit(__doc__)
    a, b = load(args[0]), load(args[1])
    qa, qb = a["queries"], b["queries"]
    noise = max(float(a.get("noise", 0.0)), float(b.get("noise", 0.0)))
    if noise <= 0.0:
        # Single-run artifacts carry no spread info. The historical
        # fallback band (rounds 9..11) keeps advisory mode useful, but
        # it lets a genuine regression of up to ~45% relative (or any
        # size under 0.15 s absolute) pass silently -- that is a
        # measurement gap, not a verdict, so --strict refuses to gate on
        # it rather than exiting 0 with false confidence.
        if strict:
            sys.exit(
                "refusing to gate (--strict): neither artifact has a "
                "noise field, so there is no measured spread to judge "
                "deltas against -- re-measure with SPARK_GRAFT_RUNS>=3 "
                "(median-of-N emits noise) or drop --strict for an "
                "advisory diff under the historical 0.45 band")
        noise = 0.45
        print(f"note: no noise field in either artifact, using the "
              f"historical fallback band {noise} -- deltas below 45% "
              f"relative or 0.15 s absolute are NOT ruled out")

    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    for q in only_a:
        print(f"only in OLD: {q} ({qa[q]:.2f} s)")
    for q in only_b:
        print(f"only in NEW: {q} ({qb[q]:.2f} s)")
    # a query that VANISHED from the new artifact is not a timing move
    # but it is a gate-worthy change (a dropped query reads as a faster
    # total); --strict must not exit 0 over it (r19 tooling sweep).
    # The exit is DEFERRED to the end so the movement report still
    # prints — a failing gate must not discard the very analysis the
    # triager needs next.
    dropped_fail = strict and bool(only_a)
    if dropped_fail:
        print(f"--strict: {len(only_a)} queries present in OLD are "
              "missing from NEW — the gate will fail (report follows)")

    moved = []
    for q in sorted(set(qa) & set(qb)):
        old, new = float(qa[q]), float(qb[q])
        delta = new - old
        rel = abs(delta) / max(old, 1e-9)
        if rel > noise and abs(delta) > 0.15:
            strong = rel > 2 * noise and abs(delta) > 0.40
            moved.append((q, old, new, delta, rel, strong))

    moved.sort(key=lambda m: -abs(m[3]))
    strong_regs = 0
    for q, old, new, delta, rel, strong in moved:
        kind = "REGRESSION" if delta > 0 else "improvement"
        tier = "STRONG " if strong else ""
        if strong and delta > 0:
            strong_regs += 1
        print(f"{tier}{kind}: {q} {old:.2f} -> {new:.2f} s "
              f"({delta:+.2f}, {rel * 100:.0f}% vs noise {noise * 100:.0f}%)")

    ta, tb = float(a.get("value", 0)), float(b.get("value", 0))
    print(f"total: {ta:.1f} -> {tb:.1f} s ({tb - ta:+.1f}); "
          f"{len(moved)} of {len(set(qa) & set(qb))} queries outside the "
          f"noise band ({strong_regs} strong regressions)")
    if strict and (strong_regs or dropped_fail):
        sys.exit(1)


if __name__ == "__main__":
    main()
