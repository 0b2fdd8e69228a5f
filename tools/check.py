#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Runs graft.Verify at a given SF (caller does that via sbt), then for
each dumped query result compares against the DuckDB oracle on the
same parquet tables: sort columns by name, sort rows, compare values
(exact for ints/strings, 1e-9 rel for floats).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                r.append(round(v, 6))
            else:
                r.append(v)
        out.append(tuple(r))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            failed.append(name)
            continue
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = norm([[r[i] for i in gidx] for r in got])
        e = norm([[r[i] for i in eidx] for r in exp])
        if len(g) != len(e):
            print(f"FAIL {name}: {len(g)} rows != {len(e)}")
            failed.append(name)
            continue
        ok = True
        for rg, re_ in zip(g, e):
            for vg, ve in zip(rg, re_):
                if isinstance(vg, float) and isinstance(ve, float):
                    if not (math.isclose(vg, ve, rel_tol=1e-9, abs_tol=1e-9)):
                        ok = False
                elif str(vg) != str(ve):
                    ok = False
            if not ok:
                print(f"FAIL {name}: first diff row\n  got {rg}\n  exp {re_}")
                break
        if ok:
            print(f"OK   {name} ({len(g)} rows)")
        else:
            failed.append(name)
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
