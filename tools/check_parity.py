#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare (dev tool only —
not part of the library; the engine itself is pure Scala/Spark).

Usage: python3 tools/check_parity.py <sfdir> <verify_outdir>

Replicates the compare described in the builder contract: for each query,
load the Spark result parquet and run the oracle SQL in DuckDB over the
same tables, sort columns by name, sort rows, and diff values.
"""
import json, math, sys
import duckdb

def canon(rows):
    out = []
    for r in rows:
        c = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    c.append("NaN")
                else:
                    c.append(f"{v:.10g}")
            else:
                c.append(repr(v))
        out.append(tuple(c))
    out.sort()
    return out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_sel = got.select(", ".join(f'"{c}"' for c in got_cols))
            got_rows = canon(got_sel.fetchall())
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_sel = exp.select(", ".join(f'"{c}"' for c in exp_cols))
            exp_rows = canon(exp_sel.fetchall())
            # the driver compares through pandas: a HUGEINT oracle column
            # lands as float64/object while Spark's BIGINT is int64, and
            # list cells are unhashable — both pass a repr() compare but
            # fail the driver. Replicate its dtype sensitivity here.
            got_dt = [str(t) for t in got_sel.df().dtypes]
            exp_dt = [str(t) for t in exp_sel.df().dtypes]
            bad_cells = [c for c, t in zip(got_cols, got_dt) if t == "object"
                         and any(isinstance(v, (list, tuple)) or
                                 type(v).__name__ == "ndarray"
                                 for v in got_sel.df()[c].head(5))]
            if got_cols != exp_cols:
                print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
                n_fail += 1
            elif got_dt != exp_dt:
                print(f"FAIL {name}: dtypes {list(zip(got_cols, got_dt))} != "
                      f"{list(zip(exp_cols, exp_dt))}")
                n_fail += 1
            elif bad_cells:
                print(f"FAIL {name}: array-typed cells in {bad_cells} "
                      f"(unhashable in driver compare)")
                n_fail += 1
            elif got_rows != exp_rows:
                diffs = [(a, b) for a, b in zip(got_rows, exp_rows) if a != b]
                print(f"FAIL {name}: rows {len(got_rows)} vs {len(exp_rows)}, "
                      f"first diffs: {diffs[:3]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got_rows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
