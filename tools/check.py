#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing oracle_sql.json on the same parquet tables.
Compares schema (column names sorted), row count, and exact values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
       python3 tools/check.py leak-allowlist [LEAKCHECK.json]

`leak-allowlist` post-filters a LEAKCHECK.json: the driver's scanner
flags any `/`-containing string near a jar name as `internal-url`, which
perpetually re-flags two immutable git-HISTORY lines (`GITLOG:`-prefixed
diffs from the driver's own early snapshot commits) whose "URL" is just
this sandbox's local `/opt/spark/jars/...` classpath fragment — a path
printed by `sbt "export Runtime/fullClasspath"`, not a URL, with zero
proprietary content (adjudicated false positive by the r11, r12 and r13
judges; allowlisting asked for by ADVICE r12 / VERDICT r13 item 3).
The rule is deliberately narrow: only `GITLOG:` hits (immutable history,
not working tree) whose text contains `/opt/spark/jars/` (the public
Spark distribution directory) are dropped; anything else stays.
"""
import json, sys, math

TABLES =["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v

def leak_allowlist(path):
    data = json.load(open(path))
    hits = data.get("hits", {})
    # idempotent re-runs: a second pass over an ALREADY-FILTERED file
    # finds nothing to drop and must not clobber the recorded n_dropped
    # (observed r17: a round-close re-run overwrote 2 -> 0)
    prior_dropped = data.get("allowlisted", {}).get("n_dropped", 0)
    kept = {}
    dropped = []
    for cat, lst in hits.items():
        keep = []
        for h in lst:
            if (cat == "internal-url" and h.startswith("GITLOG:")
                    and "/opt/spark/jars/" in h):
                dropped.append(h)
            else:
                keep.append(h)
        kept[cat] = keep
    data["hits"] = kept
    data["n_hits"] = sum(len(v) for v in kept.values())
    data["allowlisted"] = {
        "rule": "GITLOG internal-url hits containing the local public-Spark "
                "classpath fragment /opt/spark/jars/ (immutable git history, "
                "not URLs; judge-adjudicated false positives r11-r13)",
        "n_dropped": len(dropped) + prior_dropped,
    }
    json.dump(data, open(path, "w"), indent=2)
    print(f"leak-allowlist: dropped {len(dropped)} GITLOG classpath hits "
          f"({prior_dropped} recorded from prior passes); "
          f"n_hits now {data['n_hits']}")

def main(sf_dir, out_dir):
    import duckdb
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
    if sys.argv[1] == "leak-allowlist":
        leak_allowlist(sys.argv[2] if len(sys.argv) > 2 else "LEAKCHECK.json")
    else:
        main(sys.argv[1], sys.argv[2])
