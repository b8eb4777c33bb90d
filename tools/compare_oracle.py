#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: compare_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out_dir>/oracle_sql.json in DuckDB against views over
<sf_dir>/*.parquet, and compares: row count, column names, and a hash of
all values (columns sorted by name, rows sorted by all columns).
"""
import json
import sys
import hashlib

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_family(t):
    """Collapse a DuckDB type name into a comparison family. HUGEINT is
    deliberately its OWN family, not int: the driver fetches through
    pandas, where HUGEINT decays to float64 and hashes as `3.0` vs the
    Spark side's int64 `3` — a silent hash mismatch that survives the
    name/row checks (bit q13 and t14 for three rounds)."""
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    return {
        "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
        "BIGINT": "int", "UTINYINT": "int", "USMALLINT": "int",
        "UINTEGER": "int", "UBIGINT": "int",
        "FLOAT": "float", "DOUBLE": "float",
        "HUGEINT": "hugeint", "UHUGEINT": "hugeint",
    }.get(t, t)


def canon(con, rel_sql):
    """Fetch a relation deterministically: columns sorted by name, rows
    sorted by all columns, floats rounded. Also returns per-column type
    families (sorted by column name) for the pandas-decay check."""
    rel = con.sql(rel_sql)
    by_name = dict(zip(rel.columns, rel.types))
    cols = sorted(rel.columns)
    fams = [type_family(by_name[c]) for c in cols]
    sel = ", ".join(f'"{c}"' for c in cols)
    rows = con.sql(
        f"SELECT {sel} FROM ({rel_sql}) ORDER BY ALL NULLS FIRST").fetchall()
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{v:.9g}")
            else:
                vals.append(repr(v))
        out.append("|".join(vals))
    return cols, out, fams


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    import os
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json":
            continue
        got_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        if name not in oracle:
            n = con.sql(got_sql).shape[0]
            print(f"[rows-only] {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            continue
        try:
            gcols, grows, gfams = canon(con, got_sql)
            ecols, erows, efams = canon(con, f"SELECT * FROM ({oracle[name]})")
            status = []
            if gcols != ecols:
                status.append(f"COLS got={gcols} exp={ecols}")
            elif gfams != efams:
                bad = [f"'{c}' spark={g} oracle={e}"
                       for c, g, e in zip(gcols, gfams, efams) if g != e]
                status.append(f"TYPES {'; '.join(bad)}")
            if len(grows) != len(erows):
                status.append(f"NROWS got={len(grows)} exp={len(erows)}")
            if not status:
                gh = hashlib.md5("\n".join(grows).encode()).hexdigest()
                eh = hashlib.md5("\n".join(erows).encode()).hexdigest()
                if gh != eh:
                    diffs = [(g, e) for g, e in zip(grows, erows) if g != e]
                    detail = "?"
                    if diffs:
                        gp, ep = diffs[0][0].split("|"), diffs[0][1].split("|")
                        col_diff = next(
                            (f"col '{gcols[i]}' got={a} exp={b}"
                             for i, (a, b) in enumerate(zip(gp, ep)) if a != b),
                            "")
                        detail = f"{col_diff}; row got={diffs[0][0]} exp={diffs[0][1]}"
                    status.append(
                        f"HASH ({len(diffs)} differing rows; first: {detail})")
            if status:
                print(f"[FAIL] {name}: {'; '.join(status)}")
                n_bad += 1
            else:
                print(f"[OK]   {name}: {len(grows)} rows")
                n_ok += 1
        except Exception as e:
            print(f"[ERR]  {name}: {e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
