#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
under OUTDIR, run the oracle SQL in DuckDB over the same sf dir and
compare (sorted-by-name columns) BOTH values and result TYPES.

The driver's hash is type-sensitive: in round 7 three queries whose
stringified values matched still failed the driver because DuckDB's
integer SUM returns HUGEINT while Spark returns BIGINT. This checker
therefore fetches the DuckDB result as Arrow (preserving the result
types) and compares canonicalized Arrow types column-by-column, so an
oracle-SQL typing slip fails locally before it fails at the driver.

Canonicalization is calibrated against the r7 driver results: the
driver compares python-level values, where every signed integer width
collapses to `int` (q3/q16/q20/... with Spark int32 vs DuckDB int64
were hash-GREEN) but Decimal does not (q75/q76/q77 with DuckDB
decimal(38,0) a.k.a. HUGEINT vs Spark int64 were hash-RED). So integer
and float widths collapse within their family here too, while
int-vs-decimal and any cross-family difference stays distinct. Float
precision divergence is still caught by the value comparison, which
keeps float repr and the python class name in the row tuples.
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

# Hashed-compare escape hatch for results too large to materialize as
# python tuples (the 100x tier's linear family: ~2-60M-row results that
# are DuckDB-tractable but not compare-tractable). OFF unless the env
# var is set — the driver-replica semantics (ordered full-row compare)
# stay byte-identical by default; scalecheck's tier100 section sets
# ORACLE_HASHED_MIN_ROWS=2000000 explicitly. When set, any query whose
# SPARK output's parquet metadata reports >= that many rows is compared
# INSIDE DuckDB: count(*) plus an order-insensitive multiset hash
# (sum of per-row hash(ROW(cols...)) as HUGEINT — 128-bit, no overflow)
# over name-sorted columns with family-canonical casts on BOTH sides.
# Weaker than the full compare in exactly one way: row ORDER is not
# checked (each such query is order-checked by the 10x tier's full
# compare); value/count/schema/type checks are all preserved.
HASHED_MIN_ROWS = int(os.environ.get("ORACLE_HASHED_MIN_ROWS", "0") or "0")


def hash_cast(canon: str) -> str:
    """Family-canonical SQL cast so the DuckDB hash sees identical
    physical types on both sides (spark parquet int32 vs oracle int64
    must hash equal, same as the python compare's width collapse)."""
    return {
        "int": "BIGINT", "float": "DOUBLE", "string": "VARCHAR",
        "timestamp": "TIMESTAMP", "date": "DATE",
        "list<int>": "BIGINT[]", "list<float>": "DOUBLE[]",
        "list<string>": "VARCHAR[]",
    }.get(canon, "")


def hashed_summary(con, source_sql: str, cols, canon_by_col):
    """(row_count, multiset_hash) of `source_sql` computed inside DuckDB."""
    exprs = []
    for c in cols:
        cast = hash_cast(canon_by_col[c])
        exprs.append(f'CAST("{c}" AS {cast})' if cast else f'"{c}"')
    row = con.execute(
        f"SELECT count(*), sum(hash(ROW({', '.join(exprs)}))::HUGEINT) "
        f"FROM ({source_sql})").fetchone()
    return row[0], row[1]


def canon_type(t: pa.DataType) -> str:
    if pa.types.is_dictionary(t):
        return canon_type(t.value_type)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(f"{f.name}:{canon_type(f.type)}" for f in t) + ">"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)},{canon_type(t.item_type)}>"
    if pa.types.is_timestamp(t):
        return "timestamp"  # unit/tz differ benignly across writers
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_signed_integer(t) or pa.types.is_unsigned_integer(t):
        # driver-verified: int32 vs int64 hash equal, and the driver
        # compares python-level ints, where signedness vanishes too (a
        # DuckDB UBIGINT-returning expression like hash() is green there)
        return "int"
    if pa.types.is_floating(t):
        return "float"  # width collapses; precision diffs caught on values
    if pa.types.is_null(t):
        # an all-NULL column arrives as Arrow null type; whether that is
        # benign depends on WHICH side it is — the comparison site
        # wildcards only the DuckDB (oracle) side, where the driver's
        # python values are all None regardless of the declared Spark
        # type. A null-typed SPARK output would mean the engine declared
        # NullType, which must stay visible as a mismatch.
        return "null"
    return str(t)


def canon_value(v):
    """Hashable, order-stable rendering of a cell for set/sort compare.
    Types are checked separately via the Arrow schema, so here we only
    need value identity — but keep float/Decimal distinct from int via
    repr of the exact python object class + value string."""
    if isinstance(v, list):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_value(x)) for k, x in v.items()))
    if isinstance(v, float):
        return ("f", repr(v))
    return (type(v).__name__, str(v))


def table_rows(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    data = {c: tbl.column(c).to_pylist() for c in cols}
    return cols, [tuple(canon_value(data[c][i]) for c in cols)
                  for i in range(tbl.num_rows)]


def events_ts_is_integer(sfdir):
    """Whether events.ts is physically an integer (epoch-nanos) column.
    Read from the parquet SCHEMA, not a data row: a `SELECT typeof(ts)
    ... LIMIT 1` probe returns no row on an empty table (fetchone() ->
    None -> TypeError), and schema is the contract anyway. Computed once
    per run and passed into connect() — the per-oracle fresh-connection
    policy must not re-probe the file for every query."""
    ts = pq.read_schema(f"{sfdir}/events.parquet").field("ts").type
    return pa.types.is_integer(ts)


def connect(sfdir, ts_integer):
    """Fresh per-query connection: a resource failure inside one oracle
    (e.g. a temp-spill ENOSPC) must not poison the connection and
    silently swallow every query after it — the first SCALECHECK run
    lost 37 results exactly that way."""
    con = duckdb.connect()
    # view only the tables present: restricted synth tiers (tier100
    # carries just the linear-family tables) must not fail EVERY oracle
    # on the first missing parquet — an oracle that actually references
    # an absent table still fails loudly on its own
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        if os.path.exists(f"{sfdir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    # Scale-rehearsal tiers regenerated BY Spark store events.ts as int64
    # epoch-nanos (a Spark session under nanosAsLong reads TIMESTAMP(NANOS)
    # as long and cannot write nanos timestamps back). The oracles call
    # epoch_ns(ts), which needs a timestamp — normalize to the exact
    # semantics the driver tier has: DuckDB 1.0's epoch_ns on a parquet
    # TIMESTAMP(NANOS) column truncates to microseconds, and
    # make_timestamp(ts // 1000) reproduces precisely that. No-op on the
    # driver's testdata (ts is already a timestamp there).
    if ts_integer:
        con.execute("DROP VIEW events")
        con.execute(
            "CREATE VIEW events AS SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
            f"FROM '{sfdir}/events.parquet'")
    return con


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Degrade, don't crash: a missing/corrupt events.parquet here must
    # still produce the per-query report + failure summary (scalecheck
    # regex-extracts OK lines from this output; a bare traceback before
    # any query line would mark everything unverified with no pointer to
    # which outputs existed). Every oracle touching events then fails
    # its own connect() with a visible ORACLE SQL ERROR line.
    try:
        ts_integer = events_ts_is_integer(sfdir)
    except Exception as e:
        print(f"WARN events.parquet unreadable ({type(e).__name__}: {e}); "
              "assuming timestamp encoding — events oracles will fail "
              "individually below")
        ts_integer = False
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(f"{outdir}/{d}"))
    fails = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO OUTPUT"); fails += 1; continue
        # mode decision from parquet METADATA (no data read): results at
        # or above the hashed threshold never materialize as python rows
        try:
            spark_nrows = pq.read_metadata(files[0]).num_rows
        except Exception as e:
            print(f"{name}: SPARK OUTPUT UNREADABLE: {e}"); fails += 1; continue
        hashed = HASHED_MIN_ROWS > 0 and spark_nrows >= HASHED_MIN_ROWS
        if hashed:
            spark_schema = pq.read_schema(files[0])
            spark_cols = sorted(spark_schema.names)
            spark_rows = None
            spark_types = {f.name: canon_type(f.type) for f in spark_schema}
        else:
            try:
                spark_tbl = pq.read_table(files[0])
            except Exception as e:
                print(f"{name}: SPARK OUTPUT UNREADABLE: {e}"); fails += 1; continue
            spark_cols, spark_rows = table_rows(spark_tbl)
            spark_types = {f.name: canon_type(f.type) for f in spark_tbl.schema}
        if name not in oracle:
            print(f"{name}: rows-only ({spark_nrows} rows)"); continue
        if hashed:
            try:
                con = connect(sfdir, ts_integer)
                try:
                    # LIMIT-0 arrow fetch: the oracle's result TYPES via
                    # the same canon_type path the full compare uses
                    probe = con.execute(
                        f"SELECT * FROM ({oracle[name]}) LIMIT 0"
                    ).fetch_arrow_table()
                    duck_cols = sorted(probe.column_names)
                    duck_types = {f.name: canon_type(f.type)
                                  for f in probe.schema}
                    if duck_cols != spark_cols:
                        print(f"{name}: SCHEMA MISMATCH spark={spark_cols} "
                              f"duck={duck_cols}")
                        fails += 1; continue
                    type_diffs = [
                        (c, spark_types[c], duck_types[c]) for c in spark_cols
                        if spark_types[c] != duck_types[c]
                        and duck_types[c] != "null"]
                    if type_diffs:
                        fails += 1
                        print(f"{name}: TYPE MISMATCH " + "; ".join(
                            f"{c}: spark={s} duck={d}" for c, s, d in type_diffs))
                        continue
                    s_n, s_h = hashed_summary(
                        con, f"SELECT * FROM '{files[0]}'",
                        spark_cols, spark_types)
                    d_n, d_h = hashed_summary(
                        con, oracle[name], spark_cols, spark_types)
                finally:
                    con.close()
            except Exception as e:
                print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
            if (s_n, s_h) == (d_n, d_h):
                print(f"{name}: OK-HASHED ({s_n} rows)")
            else:
                fails += 1
                print(f"{name}: HASH MISMATCH spark=({s_n}, {s_h}) "
                      f"duck=({d_n}, {d_h})")
            continue
        try:
            con = connect(sfdir, ts_integer)
            try:
                # with the hashed mode ON, gate the full materialization
                # on the ORACLE's count too: the mode decision above keys
                # on the SPARK row count alone, so an engine regression
                # that LOSES rows (spark under threshold, oracle
                # tier-sized) would otherwise re-enable the multi-M-row
                # python fetch the mode exists to avoid — and surface as
                # a tooling OOM/timeout instead of a crisp mismatch.
                # spark_nrows < threshold <= oracle count IS the verdict;
                # count(*) costs one aggregate, no row transfer.
                duck_tbl = None
                duck_nrows = con.execute(
                    f"SELECT count(*) FROM ({oracle[name]})"
                ).fetchone()[0] if HASHED_MIN_ROWS > 0 else 0
                if duck_nrows >= HASHED_MIN_ROWS > 0:
                    print(f"{name}: MISMATCH spark={spark_nrows} "
                          f"duck={duck_nrows} rows (oracle at/above the "
                          "hashed threshold, spark below it)")
                else:
                    duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
            finally:
                con.close()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
        if duck_tbl is None:
            fails += 1; continue
        duck_cols, duck_rows = table_rows(duck_tbl)
        duck_types = {f.name: canon_type(f.type) for f in duck_tbl.schema}
        if duck_cols != spark_cols:
            print(f"{name}: SCHEMA MISMATCH spark={spark_cols} duck={duck_cols}")
            fails += 1; continue
        # all-NULL wildcard applies to the DuckDB side only: the driver
        # compares python values (all None) so an Arrow null oracle
        # column is benign there — but keep the skip visible so a
        # genuinely mistyped all-NULL oracle column doesn't drift
        # silently. A null-typed SPARK column is never wildcarded.
        for c in spark_cols:
            if duck_types[c] == "null" and spark_types[c] != "null":
                print(f"{name}: note: column {c} all-NULL in oracle; "
                      f"type check skipped (spark={spark_types[c]})")
        type_diffs = [(c, spark_types[c], duck_types[c]) for c in spark_cols
                      if spark_types[c] != duck_types[c]
                      and duck_types[c] != "null"]
        if type_diffs:
            fails += 1
            print(f"{name}: TYPE MISMATCH " + "; ".join(
                f"{c}: spark={s} duck={d}" for c, s, d in type_diffs))
            continue
        if spark_rows == duck_rows:
            print(f"{name}: OK ({len(spark_rows)} rows)")
        else:
            fails += 1
            print(f"{name}: MISMATCH spark={len(spark_rows)} duck={len(duck_rows)} rows")
            sset, dset = set(spark_rows), set(duck_rows)
            only_s = list(sset - dset)[:3]
            only_d = list(dset - sset)[:3]
            if only_s: print(f"   spark-only: {only_s}")
            if only_d: print(f"   duck-only:  {only_d}")
            if not only_s and not only_d:
                print("   (same set, different order)")
    print(f"\n{fails} failures / {len(names)} queries")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
