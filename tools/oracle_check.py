#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf dir, and compare
(row count, schema-by-name, sorted-column value hash). Tooling only —
the engine itself has no Python dependency."""
import json, sys, hashlib
import duckdb

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # 12 significant digits absorbs engine-level last-bit noise;
        # queries ROUND floats anyway.
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(norm_cell(r[i]) for i in order).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main(verify_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.sql(sql)
            ocols = [c.lower() for c in res.columns]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sres = con.sql(f"SELECT * FROM '{verify_dir}/{name}/*.parquet'")
            scols = [c.lower() for c in sres.columns]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        issues = []
        if sorted(scols) != sorted(ocols):
            issues.append(f"schema: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            issues.append(f"rows: spark={len(srows)} oracle={len(orows)}")
        if not issues:
            hs = table_hash(scols, srows)
            ho = table_hash(ocols, orows)
            if hs != ho:
                issues.append("hash mismatch")
                for i, (a, b) in enumerate(zip(srows, orows)):
                    sa = {c: v for c, v in zip(scols, a)}
                    sb = {c: v for c, v in zip(ocols, b)}
                    da = {k: norm_cell(sa[k]) for k in sa}
                    db = {k: norm_cell(sb[k]) for k in sb}
                    if da != db:
                        issues.append(f"  first diff row {i}: spark={da} oracle={db}")
                        break
        if issues:
            print(f"FAIL {name}: " + "; ".join(issues))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out",
                  sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"))
