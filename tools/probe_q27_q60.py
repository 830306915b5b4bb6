#!/usr/bin/env python3
"""Round-11 directive #3: re-probe the two cap-bound 10x oracles that
carried no structural intractability argument (q60_editdist_pairs,
q27_dedup_clusters) at a 1800 s cap — 3x the SCALECHECK probe cap —
and, for q27, also try the staged formulation the verdict suggested
(materialized-edges temp table + iterative min-label propagation loop,
which replaces the all-pairs `reach` closure with O(diameter) passes;
DuckDB here is 1.0.0, which predates the `USING KEY` recursive CTE that
would express the same loop in one statement).

Semantics of the staged q27 are IDENTICAL to the recursive oracle:
cluster_id = LEAST(doc_id, MIN(reachable node)) = min node id of the
connected component (own id for singletons). The edge set is the same
jaccard >= 0.3 pair set, so a completed staged run hash-compares
against the Spark output exactly like the one-shot oracle would.

Each probe records wall seconds and outcome (ok / interrupt at cap /
error) to stdout and probe json; if an oracle completes, its result is
compared against the Spark 10x output parquet (written by graft.Verify
into OUTDIR) with the same canonicalization as tools/check_oracle.py.

Usage: python3 tools/probe_q27_q60.py <tier10xDir> <verifyOutDir> [capSeconds]
"""
import json, os, sys, threading, time
import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import table_rows, canon_type  # noqa: E402

SH_SQL = """
CREATE TEMP TABLE sh AS
SELECT doc_id, list_distinct(CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
    ELSE list_transform(range(1, len(tk) - 0), i -> array_to_string(tk[i:i+1], ' ')) END) AS sh
FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             x -> x <> '') AS tk FROM documents)
"""

EDGES_SQL = """
CREATE TEMP TABLE edges AS
SELECT a.doc_id AS ia, b.doc_id AS ib
FROM sh a CROSS JOIN sh b
WHERE a.doc_id < b.doc_id
  AND ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE /
            len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.3
"""


class CapExceeded(Exception):
    pass


def with_cap(con, cap_s, fn):
    """Run fn(fired); interrupt the connection from a watchdog at cap_s.

    con.interrupt() only cancels a query that is RUNNING at that moment
    — a watchdog firing in the gap between two statements of a
    multi-statement fn is otherwise lost (and the next statement runs
    uncapped, which at 10x scale can be hours). Multi-statement fns must
    therefore call the passed-in guard between statements; it raises
    CapExceeded once the watchdog has fired.
    """
    fired = threading.Event()

    def kill():
        fired.set()
        con.interrupt()

    def guard():
        if fired.is_set():
            raise CapExceeded("cap fired between statements")

    t = threading.Timer(cap_s, kill)
    t.start()
    t0 = time.time()
    try:
        out = fn(guard)
        return ("ok", time.time() - t0, out)
    except Exception as e:
        kind = "interrupt" if fired.is_set() else "error"
        return (kind, time.time() - t0, f"{type(e).__name__}: {e}")
    finally:
        t.cancel()


def connect(tier):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tier}/documents.parquet'")
    return con


def compare(name, duck_tbl, outdir):
    files = [f for f in os.listdir(f"{outdir}/{name}") if f.endswith(".parquet")]
    spark_tbl = pq.read_table(f"{outdir}/{name}/{files[0]}")
    s_cols, s_rows = table_rows(spark_tbl)
    d_cols, d_rows = table_rows(duck_tbl)
    s_types = {f.name: canon_type(f.type) for f in spark_tbl.schema}
    d_types = {f.name: canon_type(f.type) for f in duck_tbl.schema}
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
    diffs = [c for c in s_cols if s_types[c] != d_types[c] and d_types[c] != "null"]
    if diffs:
        return "TYPE MISMATCH " + ",".join(diffs)
    if s_rows == d_rows:
        return f"VERIFIED ({len(s_rows)} rows)"
    return (f"MISMATCH spark={len(s_rows)} duck={len(d_rows)} rows "
            f"(set-equal={set(s_rows) == set(d_rows)})")


def probe_oneshot(name, tier, outdir, cap, oracle_sql):
    """One capped oracle execution, compared against the Spark output
    for `name` on completion (shared by the q60 and q27 one-shots)."""
    con = connect(tier)
    status, dt, out = with_cap(
        con, cap, lambda _guard: con.execute(oracle_sql).fetch_arrow_table())
    rec = {"status": status, "seconds": round(dt, 1)}
    if status == "ok":
        rec["compare"] = compare(name, out, outdir)
    else:
        rec["detail"] = out
    con.close()
    return rec


def probe_q27_staged(tier, outdir, cap):
    """Stage 1: shingle sets. Stage 2: materialized jaccard edges (the
    same pair shape as the q15 oracle — if THIS is what blows the cap,
    q27 inherits q15's structural argument). Stage 3: min-label
    propagation to fixpoint (each pass one aggregate join — linear in
    edges, no transitive closure)."""
    con = connect(tier)
    rec = {"stages": {}}
    deadline = time.time() + cap

    status, dt, out = with_cap(con, deadline - time.time(),
                               lambda _guard: con.execute(SH_SQL))
    rec["stages"]["shingles"] = {"status": status, "seconds": round(dt, 1)}
    if status != "ok":
        rec["stages"]["shingles"]["detail"] = out
        con.close(); return rec

    status, dt, out = with_cap(con, deadline - time.time(),
                               lambda _guard: con.execute(EDGES_SQL))
    rec["stages"]["edges"] = {"status": status, "seconds": round(dt, 1)}
    if status != "ok":
        rec["stages"]["edges"]["detail"] = out
        con.close(); return rec
    rec["stages"]["edges"]["rows"] = \
        con.execute("SELECT count(*) FROM edges").fetchone()[0]

    def label_prop(guard):
        # guard() between statements: the watchdog's con.interrupt() is
        # lost if it fires while no query is running, and a single
        # uncapped pass over the 10x edge set can run for hours
        guard()
        con.execute("""CREATE TEMP TABLE und AS
            SELECT ia AS src, ib AS dst FROM edges
            UNION SELECT ib, ia FROM edges""")
        guard()
        con.execute("""CREATE TEMP TABLE lab AS
            SELECT doc_id AS node, doc_id AS lbl FROM documents""")
        passes = 0
        while True:
            passes += 1
            guard()
            con.execute("""CREATE OR REPLACE TEMP TABLE lab2 AS
                SELECT node, MIN(lbl) AS lbl FROM (
                  SELECT node, lbl FROM lab
                  UNION ALL
                  SELECT u.dst AS node, l.lbl FROM lab l JOIN und u ON u.src = l.node
                ) GROUP BY node""")
            guard()
            changed = con.execute(
                """SELECT count(*) FROM lab JOIN lab2 USING (node)
                   WHERE lab.lbl <> lab2.lbl""").fetchone()[0]
            guard()
            con.execute("DROP TABLE lab")
            con.execute("ALTER TABLE lab2 RENAME TO lab")
            if changed == 0:
                return passes

    status, dt, out = with_cap(con, deadline - time.time(), label_prop)
    rec["stages"]["labelprop"] = {"status": status, "seconds": round(dt, 1)}
    if status != "ok":
        rec["stages"]["labelprop"]["detail"] = out
        con.close(); return rec
    rec["stages"]["labelprop"]["passes"] = out

    tbl = con.execute(
        "SELECT node AS id, lbl AS cluster_id FROM lab ORDER BY id"
    ).fetch_arrow_table()
    rec["compare"] = compare("q27_dedup_clusters", tbl, outdir)
    con.close()
    return rec


def main():
    tier, outdir = sys.argv[1], sys.argv[2]
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 1800
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {"tier": tier, "cap_seconds": cap}

    print(f"[probe] q60 one-shot oracle, cap {cap}s ...", flush=True)
    results["q60_oneshot"] = probe_oneshot(
        "q60_editdist_pairs", tier, outdir, cap, oracle["q60_editdist_pairs"])
    print(f"[probe] q60: {results['q60_oneshot']}", flush=True)

    print(f"[probe] q27 one-shot recursive oracle, cap {cap}s ...", flush=True)
    results["q27_oneshot"] = probe_oneshot(
        "q27_dedup_clusters", tier, outdir, cap, oracle["q27_dedup_clusters"])
    print(f"[probe] q27 one-shot: {results['q27_oneshot']}", flush=True)

    print(f"[probe] q27 staged (edges table + label-prop loop), cap {cap}s ...",
          flush=True)
    results["q27_staged"] = probe_q27_staged(tier, outdir, cap)
    print(f"[probe] q27 staged: {results['q27_staged']}", flush=True)

    out_path = "/tmp/graft_r11_probe/probe_results.json"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    json.dump(results, open(out_path, "w"), indent=1)
    print(f"[probe] wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
