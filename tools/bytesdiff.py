#!/usr/bin/env python3
"""Cross-round shuffle-byte census diff — the noise-immune comparator.

Wall-clock medians on this host move ±50% on identical code (three
rounds of tenancy adjudication); the ShuffleCensus task-metric byte
counters reproduce across JVM runs to within compression framing
jitter (r12: one run-pair bit-identical on all 228 counters, a third
run moved ONE counter by 11 bytes). So a counter move between rounds
IS an engine change — no adjudication needed — and a flat diff on a
moved wall-clock median is positive proof of tenancy.

Rule: a per-query counter is MOVED when BOTH
  - relative |delta| > 1%                  (compression-dict wiggle), and
  - absolute |delta| > a per-counter floor:
      shuffle write @small/@large, shuffle read @large, spill @large:
        16 KiB (compression framing / partition-boundary jitter; the
        measured same-code jitter is <100 B)
      input bytes @small/@large: 2 KiB (scan bytes are deterministic
        modulo footer-read granularity; the r14 q35_rowid input move —
        3,946 -> 11,338 B, the withRowId persist materializing full
        rows — sat below the shuffle floor and went unattributed, the
        gap this per-counter floor closes).
Queries present in only one artifact are listed as ADDED/REMOVED (the
surface is frozen at 82, so either is itself a finding).

Inputs: BYTESCHECK_r{N}.json ({"rows":[...], ...}) or a bare rows array.
Exit 0 in advisory mode; --strict exits 1 on any MOVED counter or
surface change.

Usage: tools/bytesdiff.py OLD.json NEW.json [--strict] [--md]
"""
import json
import sys

REL = 0.01
# per-counter absolute floors (see module doc)
FIELDS = {
    "in_small": 2 * 1024,
    "in_large": 2 * 1024,
    "sw_small": 16 * 1024,
    "sw_large": 16 * 1024,
    "sr_large": 16 * 1024,
    "spill_large": 16 * 1024,
}


def load(path):
    with open(path) as f:
        doc = json.load(f)
    rows = doc["rows"] if isinstance(doc, dict) else doc
    return {r["q"]: r for r in rows}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    strict = "--strict" in sys.argv[1:]
    md = "--md" in sys.argv[1:]
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    moved = []
    for q in sorted(set(old) & set(new)):
        for f, floor in FIELDS.items():
            a, b = old[q].get(f, 0), new[q].get(f, 0)
            delta = b - a
            if abs(delta) > floor and abs(delta) > REL * max(a, 1):
                moved.append((q, f, a, b, delta))
    if md:
        print("| query | counter | old | new | delta |")
        print("|---|---|---|---|---|")
        for q, f, a, b, d in moved:
            print(f"| {q} | {f} | {a} | {b} | {d:+d} |")
        if not moved:
            print(f"| _none_ | all {len(set(old) & set(new))} shared "
                  f"queries x {len(FIELDS)} counters inside the "
                  f"per-counter band | | | |")
    else:
        for q, f, a, b, d in moved:
            rel = abs(d) / max(a, 1) * 100
            print(f"MOVED  {q:28s} {f:12s} {a:>12d} -> {b:>12d} "
                  f"({d:+d}, {rel:.1f}%)")
        if not moved:
            print(f"no counter moves: {len(set(old) & set(new))} shared "
                  f"queries x {len(FIELDS)} counters inside the band "
                  f"(rel {REL * 100:.0f}% AND per-counter abs floors)")
    for q in added:
        print(f"ADDED   {q}")
    for q in removed:
        print(f"REMOVED {q}")
    checked = len(set(old) & set(new)) * len(FIELDS)
    print(f"\n{len(moved)} moved / {checked} counters checked; "
          f"{len(added)} added, {len(removed)} removed")
    if strict and (moved or added or removed):
        sys.exit(1)


if __name__ == "__main__":
    main()
