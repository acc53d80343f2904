#!/usr/bin/env python3
"""Local oracle checker mirroring the driver's t2 gate (NOT part of the
Scala library — dev tooling only).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
named after the parquet tables in <sfDir>, and compares against the Spark
result parquet at <verifyOutDir>/<name>/ — columns sorted by name, rows
compared in emitted order and as sorted multisets.
"""
import sys, os, glob, json
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v  # exact — the driver hashes values, so no tolerance
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def rows_of(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm(v) for v in row) for row in zip(*data)] if data else (cols, [])


def type_class(t: pa.DataType) -> str:
    """Coarse type family. int-vs-decimal is the class that passes a
    python == compare (Decimal(4) == 4) but hash-mismatches in the
    driver (q_agg_lorenz, r9) — so that pair must NOT collapse."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + type_class(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    return str(t)


def type_diffs(spark_tbl: pa.Table, duck_tbl: pa.Table):
    # defensive: report missing columns as a diff instead of KeyError-ing
    # (the caller checks name sets first, but keep this callable alone)
    missing = [c for c in sorted(spark_tbl.column_names)
               if c not in duck_tbl.column_names]
    if missing:
        return [f"{c}: missing from oracle output" for c in missing]
    out = []
    for c in sorted(spark_tbl.column_names):
        st = spark_tbl.schema.field(c).type
        dt = duck_tbl.schema.field(c).type
        if type_class(st) != type_class(dt):
            out.append(f"{c}: spark={st} duck={dt}")
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        try:
            files = glob.glob(os.path.join(spark_path, "*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output at {spark_path}")
                n_fail += 1
                continue
            spark_tbl = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
            duck_tbl = con.execute(sql).fetch_arrow_table()
            sc, srows = rows_of(spark_tbl)
            dc, drows = rows_of(duck_tbl)
            if sc != dc:
                print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
                n_fail += 1
                continue
            if len(srows) != len(drows):
                print(f"FAIL {name}: row count spark={len(srows)} duck={len(drows)}")
                n_fail += 1
                continue
            tdiffs = type_diffs(spark_tbl, duck_tbl)
            if tdiffs:
                print(f"FAIL {name}: TYPEDIFF (driver hash would diverge): {tdiffs}")
                n_fail += 1
                continue
            if srows == drows:
                print(f"PASS {name} ({len(srows)} rows, exact order)")
                n_pass += 1
            elif sorted(srows) == sorted(drows):
                print(f"PASS {name} ({len(srows)} rows, as multiset — ORDER DIFFERS)")
                n_pass += 1
            else:
                diff = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:3]
                print(f"FAIL {name}: values differ; first diffs: {diff}")
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracles)} total ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
