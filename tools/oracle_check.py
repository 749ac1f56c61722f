#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the same sfDir parquet tables, and compares: schema (column names),
row count, and value-by-value equality (columns sorted by name, rows in
emitted order). Exit 0 iff all match.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def arrow_family(t):
    """Coarse arrow-type family. The driver hashes typed values, so
    cross-family drift (decimal128 vs int64, string vs int) fails
    remotely; within-family width/unit differences (int32 vs int64,
    timestamp units, string vs large_string) have always hash-matched."""
    import pyarrow as pa
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", arrow_family(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple(sorted(
            (f.name, arrow_family(f.type)) for f in t)))
    return str(t)


def compatible_arrow_types(st, dt):
    return arrow_family(st) == arrow_family(dt)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        spark_tbl = pq.read_table(files[0])
        try:
            duck_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            failures += 1
            continue
        # The driver hashes TYPED arrow values, so a type mismatch fails
        # remotely even when the pylist values compare equal locally
        # (e.g. DuckDB widening a windowed sum(BIGINT) to HUGEINT /
        # decimal128 vs Spark's int64). Compare arrow types up to
        # nullability and int/float width families we know the driver
        # treats as distinct.
        type_bad = None
        for c in s_cols:
            st = spark_tbl.schema.field(c).type
            dt = duck_tbl.schema.field(c).type
            if not compatible_arrow_types(st, dt):
                type_bad = (c, st, dt)
                break
        if type_bad:
            c, st, dt = type_bad
            print(f"FAIL {name}: arrow type of '{c}' differs: spark={st} duck={dt}")
            failures += 1
            continue
        if spark_tbl.num_rows != duck_tbl.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}")
            failures += 1
            continue
        s_rows = list(zip(*[spark_tbl.column(c).to_pylist() for c in s_cols]))
        d_rows = list(zip(*[duck_tbl.column(c).to_pylist() for c in d_cols]))
        bad = None
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if tuple(map(norm, a)) != tuple(map(norm, b)):
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} differs\n  cols : {s_cols}\n  spark: {a}\n  duck : {b}")
            failures += 1
        else:
            print(f"OK   {name}: {spark_tbl.num_rows} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
