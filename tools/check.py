#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing oracle_sql.json on the same parquet tables.
Compares schema (column names sorted), row count, and exact values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            exp = con.execute(sql).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
            if ecols != gcols:
                print(f"FAIL {name}: columns exp={ecols} got={gcols}")
                n_fail += 1
                continue
            if exp.num_rows != got.num_rows:
                print(f"FAIL {name}: rows exp={exp.num_rows} got={got.num_rows}")
                n_fail += 1
                continue
            erows = [tuple(norm_cell(r[c]) for c in ecols) for r in exp.to_pylist()]
            grows = [tuple(norm_cell(r[c]) for c in gcols) for r in got.to_pylist()]
            if erows != grows:
                bad = next(i for i, (a, b) in enumerate(zip(erows, grows)) if a != b)
                print(f"FAIL {name}: first diff row {bad}:")
                print(f"  exp={erows[bad]}")
                print(f"  got={grows[bad]}")
                # show schema for debugging type issues
                print(f"  exp types={ {f.name: str(f.type) for f in exp.schema} }")
                print(f"  got types={ {f.name: str(f.type) for f in got.schema} }")
                n_fail += 1
                continue
            # schema type comparison (informational; driver may be stricter)
            et = {f.name: str(f.type) for f in exp.schema}
            gt = {f.name: str(f.type) for f in got.schema}
            tdiff = {k: (et[k], gt[k]) for k in et if et[k] != gt.get(k)}
            flag = f"  [type-diff {tdiff}]" if tdiff else ""
            # vacuity audit (r9): a column that is NULL on EVERY row means
            # the fixture never exercises that output branch — the oracle
            # passes while proving nothing about the values (this is how
            # the time-disjoint orders anchor hid all-null as-of and
            # range joins for seven rounds). Warn, don't fail: some ops
            # legitimately emit an all-null column at one SF.
            vac = [c for c in gcols
                   if got.num_rows > 0 and got.column(c).null_count == got.num_rows]
            if vac:
                flag += f"  [WARN all-null: {vac}]"
            print(f"PASS {name} ({exp.num_rows} rows){flag}")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail (oracled); "
          f"{len(oracles)} oracled queries total")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
