#!/usr/bin/env python3
"""Local imitation of the driver's correctness gate (dev tool only — the
shipped library is the Scala code under src/). Runs each oracle SQL in
DuckDB over the same parquet tables Verify used, then compares against the
Verify parquet dumps: sorts columns by name, compares row-by-row values.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        # The DRIVER's comparator does NOT tolerate list values: pandas
        # sort_values raises TypeError on unhashable numpy arrays
        # (round-9 lesson: c15/c17/q74 passed here, died at the driver).
        # Mirror that behavior — fail loudly instead of tuple-normalizing.
        raise TypeError(
            "top-level ARRAY/MAP output column — serialize it to a "
            "canonical string (concat_ws / array_to_string, the q64 "
            "pattern); the driver comparator crashes on raw arrays")
    if hasattr(v, "isoformat"):
        try:
            s = v.isoformat(sep=" ")  # datetime
        except TypeError:
            s = v.isoformat()         # date has no sep kwarg
        # normalize tz-aware (spark may write UTC-instant) to naive UTC
        return s.replace("+00:00", "")
    return v


def rows_of(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm(r[i]) for i in order) for r in data]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        s_cols = tbl.column_names
        try:
            s_rows = rows_of(s_cols, [list(r.values())
                                      for r in tbl.to_pylist()])
        except TypeError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        try:
            cur = con.execute(sql)
            d_cols = [d[0] for d in cur.description]
            d_rows = rows_of(d_cols, cur.fetchall())
            desc = con.execute(
                f"DESCRIBE SELECT * FROM ({sql}) _q").fetchall()
            d_types = {r[0]: r[1] for r in desc}
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols {sorted(s_cols)} vs {sorted(d_cols)}")
            n_fail += 1
            continue
        # The driver's hash is type-sensitive: DuckDB SUM(int) promotes to
        # HUGEINT (int128) which hashes differently than Spark's BIGINT even
        # when values are equal (round-1 lesson: dx06/dx07/q17/q19/q26).
        # Also flag int-width mismatches vs the Spark parquet schema.
        arrow_of_duck = {
            "BIGINT": "int64", "INTEGER": "int32", "SMALLINT": "int16",
            "TINYINT": "int8", "DOUBLE": "double", "FLOAT": "float",
            "VARCHAR": "string", "DATE": "date32[day]", "BOOLEAN": "bool",
            # naive timestamp — a Spark TimestampType output writes
            # timestamp[us, tz=UTC] and fails the driver's schema check
            # (round-4 lesson: 15 queries); Verify must cast to NTZ.
            "TIMESTAMP": "timestamp[us]"}
        type_bad = []
        for i, c in enumerate(s_cols):
            dt = d_types.get(c, "?")
            st = str(tbl.schema.field(c).type)
            if dt in ("HUGEINT", "UHUGEINT"):
                type_bad.append(f"{c}: duckdb {dt} (cast the SUM!)")
            elif dt in arrow_of_duck and arrow_of_duck[dt] != st:
                type_bad.append(f"{c}: duckdb {dt} vs spark {st}")
        if type_bad:
            print(f"FAIL {name}: type mismatch: {'; '.join(type_bad)}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: {len(s_rows)} vs {len(d_rows)} rows")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows))
               if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; "
                  f"first at {i}:\n  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
