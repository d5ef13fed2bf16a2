#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL on the same sf tables, compare
row counts, schemas (column names), and value hashes (column-name-sorted,
row-order-insensitive).

Usage: python tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)

def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    results = {}
    produced = {d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))}
    for qname in sorted(set(oracle) - produced):
        results[qname] = {"status": "FAIL", "error": "no output produced (query threw)"}
        n_fail += 1
    for qname in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, qname)
        if not os.path.isdir(qdir):
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        if qname not in oracle:
            results[qname] = {"status": "rows_only", "rows": len(got)}
            continue
        try:
            exp = con.execute(oracle[qname]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            results[qname] = {"status": "oracle_error", "error": str(e)}
            n_fail += 1
            continue
        schema_ok = sorted(got_cols) == sorted(exp_cols)
        rows_ok = len(got) == len(exp)
        hash_ok = schema_ok and table_hash(got, got_cols) == table_hash(exp, exp_cols)
        ok = schema_ok and rows_ok and hash_ok
        results[qname] = {"status": "pass" if ok else "FAIL",
                          "rows": len(got), "oracle_rows": len(exp),
                          "schema_ok": schema_ok, "hash_ok": hash_ok,
                          "cols": got_cols, "oracle_cols": exp_cols}
        n_pass += ok
        n_fail += (not ok)
    print(json.dumps(results, indent=1))
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{sum(1 for r in results.values() if r['status']=='rows_only')} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
