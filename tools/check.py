#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Runs graft.Verify at a given SF (caller does that via sbt), then for
each dumped query result compares against the DuckDB oracle on the
same parquet tables: sort columns by name, sort rows, compare values
EXACTLY — including floats. The driver hashes the exact stored values,
so any float tolerance here is weaker than the real gate (r8 shipped a
red cohort_ltv because rel_tol=1e-9 passed a 1e-4 divergence at 1e6
magnitude). A float that differs in its last ulp IS a driver failure.

Usage: python3 tools/check.py <sfDir> <outDir> [only,names]
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Cap DuckDB below the box so a heavy oracle fails ALONE instead of
# taking the OS allocator down with it (sf0.1 lesson: one "bad
# allocation" on an unrolled-CTE oracle poisoned every later query on
# the shared connection).
MEM_LIMIT = os.environ.get("GRAFT_DUCK_MEM", "48GB")


def kind(arrow_type):
    """Collapse an Arrow column type to its hash-relevant kind:
    width-only variants are equivalent (int widths, string vs
    large_string/string_view, timestamp units), but decimal/float/int
    differ (DuckDB HUGEINT surfaces as decimal128(38,0))."""
    t = str(arrow_type)
    if t.startswith(("int", "uint")):
        return "INT"
    if t.startswith("decimal"):
        return "DECIMAL"
    if t in ("float", "double", "halffloat"):
        return "FLOAT"
    if t in ("string", "large_string", "string_view", "utf8", "large_utf8"):
        return "STR"
    if t.startswith("timestamp"):
        return "TIMESTAMP"
    if t.startswith(("binary", "large_binary", "binary_view")):
        return "BIN"
    return t


def norm(rows):
    # no float rounding: the driver hashes exact stored values, so the
    # replay must sort and compare the same bits
    return sorted((tuple(row) for row in rows),
                  key=lambda t: tuple(str(x) for x in t))


def connect(sf_dir):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{MEM_LIMIT}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main(sf_dir, out_dir, only=None):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failed = []
    for name, sql in sorted(oracle.items()):
        # fresh connection per query: an OOM-killed oracle must not
        # poison the buffer pool the remaining queries run in
        con = connect(sf_dir)
        try:
            got_tbl = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").arrow()
            got_cols = got_tbl.schema.names
            got_types = {f.name: kind(f.type) for f in got_tbl.schema}
            got = [tuple(r.values()) for r in got_tbl.to_pylist()]
            exp_tbl = con.execute(sql).arrow()
            exp_cols = exp_tbl.schema.names
            exp_types = {f.name: kind(f.type) for f in exp_tbl.schema}
            exp = [tuple(r.values()) for r in exp_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        finally:
            try:
                con.close()
            except Exception:
                pass
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            failed.append(name)
            continue
        # the driver's hash is representation-sensitive across type
        # KINDS (int vs decimal vs float), though not int widths — a
        # DuckDB HUGEINT/DECIMAL vs Spark BIGINT is a hash mismatch
        # even when every value is equal
        tdiff = {c: (got_types[c], exp_types[c]) for c in got_cols
                 if got_types.get(c) != exp_types.get(c)}
        if tdiff:
            print(f"FAIL {name}: type-kind mismatch {tdiff}")
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
                    # exact: the driver's hash is bit-sensitive
                    if not (vg == ve or (math.isnan(vg) and math.isnan(ve))):
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
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
