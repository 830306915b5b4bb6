#!/usr/bin/env python3
"""DATACHECK — step ZERO of every round, before sbt/Verify/scalecheck.

Round 10 lost real turns to a silent environment contract change: the
driver regenerated /root/testdata and events.ts flipped physical type
TIMESTAMP(NANOS) -> TIMESTAMP(MICROS); 18 tests failed before the cause
was even located (NOTES_r10.md "Environment change caught mid-round").
This tool makes that class of change fail LOUDLY and FIRST.

It snapshots, for every table in every /root/testdata/sf* tier:
  - the Arrow-level schema (name + type, which distinguishes
    timestamp[ns] / timestamp[us] / int64),
  - the parquet PHYSICAL type and LOGICAL-type annotation per column
    (the layer where the r10 flip actually happened),
  - the row count and file mtime,
writes DATACHECK_r{N}.json, and diffs against the most recent prior
DATACHECK_r{M}.json (M < N):
  - any column added/removed/renamed, or any arrow/physical/logical
    type change  -> CONTRACT CHANGE, exit 1 (fix the engine's load
    contract — e.g. sources/EventTime.scala — before running anything)
  - row-count drift only -> WARN, exit 0 (regeneration with a new seed
    changes counts benignly; types are the contract)
  - no prior artifact -> baseline snapshot, exit 0.

Usage: python3 tools/datacheck.py --round N
         [--testdata /root/testdata] [--repo /root/repo]
"""
import argparse, glob, json, os, re, subprocess, sys
import pyarrow.parquet as pq


def env_versions():
    """Pin the ORACLE-SIDE environment alongside the data contract.

    The data contract is only half of what the gate compares against: a
    silent duckdb upgrade can flip comparator/interpolation semantics
    (same environment-drift class as the r10 NANOS->MICROS flip, but in
    the oracle binary instead of the data). Snapshot every version the
    oracle path depends on so the round-over-round diff surfaces drift
    BEFORE a hash mismatch gets misread as an engine bug.
    """
    env = {}
    try:
        import duckdb
        env["duckdb"] = duckdb.__version__
    except Exception as e:  # noqa: BLE001 - record, don't crash preflight
        env["duckdb"] = f"UNAVAILABLE: {e}"
    import pyarrow
    env["pyarrow"] = pyarrow.__version__
    env["python"] = sys.version.split()[0]
    try:
        jv = subprocess.run(["java", "-version"], capture_output=True,
                            text=True, timeout=30)
        env["jvm"] = (jv.stderr or jv.stdout).strip().splitlines()[0]
    except Exception as e:  # noqa: BLE001
        env["jvm"] = f"UNAVAILABLE: {e}"
    # Spark + scala come from the unmanaged jar names (the only Spark
    # this repo can run against), e.g. spark-sql_2.13-4.1.2.jar
    jars = glob.glob("/opt/spark/jars/spark-sql_*.jar")
    if jars:
        m = re.search(r"spark-sql_(\d+\.\d+)-(.+)\.jar",
                      os.path.basename(sorted(jars)[0]))
        if m:
            env["scala_binary"] = m.group(1)
            env["spark"] = m.group(2)
    return env


def snapshot_file(path):
    pf = pq.ParquetFile(path)
    arrow = pf.schema_arrow
    phys = pf.schema  # ParquetSchema: physical + logical annotations
    cols = []
    for i, field in enumerate(arrow):
        entry = {"name": field.name, "arrow": str(field.type)}
        # Top-level flat columns map 1:1 onto parquet leaf columns; for
        # nested types (list/struct) the leaf walk differs, so record
        # the physical layer only where the mapping is unambiguous.
        if i < len(phys.names) and phys.column(i).name == field.name:
            pc = phys.column(i)
            entry["physical"] = pc.physical_type
            entry["logical"] = str(pc.logical_type)
        cols.append(entry)
    return {
        "rows": pf.metadata.num_rows,
        "mtime": os.path.getmtime(path),
        "columns": cols,
    }


def snapshot(testdata):
    tables = {}
    for sfdir in sorted(glob.glob(os.path.join(testdata, "sf*"))):
        sf = os.path.basename(sfdir)
        for f in sorted(glob.glob(os.path.join(sfdir, "*.parquet"))):
            tables[f"{sf}/{os.path.splitext(os.path.basename(f))[0]}"] = \
                snapshot_file(f)
    return tables


def col_sig(c):
    return (c["name"], c["arrow"], c.get("physical"), c.get("logical"))


def diff(prev, cur):
    """Returns (contract_changes, warnings) as printable strings."""
    contract, warns = [], []
    for key in sorted(set(prev) | set(cur)):
        if key not in cur:
            contract.append(f"{key}: table REMOVED")
            continue
        if key not in prev:
            # A brand-new tier/table cannot break an existing load
            # contract; failing here would also dead-end the round (every
            # re-run diffs against the PRIOR round's artifact, so the
            # "failure" could never clear). Warn loudly instead — this
            # run's artifact records it, becoming next round's baseline.
            warns.append(f"{key}: table ADDED (new tier or table — engine "
                         "coverage for it is a separate question)")
            continue
        p, c = prev[key], cur[key]
        pc = {col["name"]: col_sig(col) for col in p["columns"]}
        cc = {col["name"]: col_sig(col) for col in c["columns"]}
        for name in sorted(set(pc) | set(cc)):
            if name not in cc:
                contract.append(f"{key}.{name}: column REMOVED")
            elif name not in pc:
                contract.append(f"{key}.{name}: column ADDED")
            elif pc[name] != cc[name]:
                contract.append(
                    f"{key}.{name}: TYPE CHANGED {pc[name][1:]} -> {cc[name][1:]}")
        if [col["name"] for col in p["columns"]] != \
           [col["name"] for col in c["columns"]] and \
           set(pc) == set(cc) and not any(s.startswith(key) for s in contract):
            contract.append(f"{key}: column ORDER changed")
        if p["rows"] != c["rows"]:
            warns.append(f"{key}: rows {p['rows']} -> {c['rows']}")
        elif p["mtime"] != c["mtime"]:
            warns.append(f"{key}: regenerated (same schema+rows)")
    return contract, warns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--testdata", default="/root/testdata")
    ap.add_argument("--repo", default="/root/repo")
    args = ap.parse_args()

    tables = snapshot(args.testdata)
    # An empty snapshot is never a valid baseline: it means testdata is
    # missing/empty or --testdata is mistyped. Exiting 0 here would
    # green-light exactly the broken environment this tool exists to
    # catch (and, committed as a baseline, would make the NEXT round's
    # diff report every table as a spurious ADDED contract failure).
    if not tables:
        print(f"DATACHECK r{args.round}: *** NO TABLES FOUND under "
              f"{args.testdata} *** — testdata missing/empty or the "
              "--testdata path is wrong; refusing to write a snapshot.")
        sys.exit(1)
    out = {"round": args.round, "testdata": args.testdata,
           "env": env_versions(), "tables": tables}

    prior_round, prior = -1, None
    for f in glob.glob(os.path.join(args.repo, "DATACHECK_r*.json")):
        m = re.search(r"DATACHECK_r(\d+)\.json$", f)
        if m and prior_round < int(m.group(1)) < args.round:
            prior_round = int(m.group(1))
            prior = f

    out_path = os.path.join(args.repo, f"DATACHECK_r{args.round:02d}.json")
    if prior is None:
        out["baseline"] = True
        json.dump(out, open(out_path, "w"), indent=1)
        print(f"DATACHECK r{args.round}: baseline snapshot "
              f"({len(tables)} tables) -> {out_path}")
        sys.exit(0)

    prior_doc = json.load(open(prior))
    prev = prior_doc["tables"]
    contract, warns = diff(prev, tables)
    # Oracle-environment drift: warn loudly (an upgrade may be benign,
    # but a hash mismatch in the SAME round should be read against it).
    prev_env = prior_doc.get("env")
    if prev_env is not None:
        for k in sorted(set(prev_env) | set(out["env"])):
            pv, cv = prev_env.get(k), out["env"].get(k)
            if pv != cv:
                warns.append(f"ENV {k}: {pv!r} -> {cv!r} — oracle-side "
                             "semantics (comparators, interpolation, "
                             "casts) may have shifted; if this round's "
                             "gate hash-mismatches, suspect this FIRST")
    out["diff_against"] = os.path.basename(prior)
    out["contract_changes"] = contract
    out["warnings"] = warns
    json.dump(out, open(out_path, "w"), indent=1)

    for w in warns:
        print(f"WARN  {w}")
    if contract:
        print(f"\nDATACHECK r{args.round}: *** TESTDATA CONTRACT CHANGED "
              f"since r{prior_round} ***")
        for s in contract:
            print(f"FAIL  {s}")
        print("\nFix the engine's load contract (see sources/EventTime.scala "
              "for the r10 precedent) BEFORE running sbt test / Verify / "
              "scalecheck — their failures will be symptoms of this.")
        sys.exit(1)
    print(f"DATACHECK r{args.round}: contract unchanged vs r{prior_round} "
          f"({len(tables)} tables, {len(warns)} benign warnings) -> {out_path}")
    sys.exit(0)


if __name__ == "__main__":
    main()
