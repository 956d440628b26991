#!/usr/bin/env python3
"""Self-check mimicking the driver's correctness gate: read graft.Verify's
parquet dumps + oracle_sql.json, run each oracle SQL in DuckDB over the raw
testdata parquet, sort columns by name, canonicalize, hash-compare.
Usage: python survey/check_verify.py <sfDir> <verifyOutDir>"""
import duckdb, hashlib, json, os, sys

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows):
    out = []
    for r in rows:
        cells = []
        for v in r:
            if v is None: cells.append("NULL")
            elif isinstance(v, bool): cells.append("true" if v else "false")
            elif isinstance(v, float): cells.append(f"{v:.4f}")
            elif isinstance(v, (list, tuple)):
                cells.append("[" + ",".join(f"{x:.4f}" if isinstance(x,float) else str(x) for x in v) + "]")
            else: cells.append(str(v))
        out.append("|".join(cells))
    return hashlib.sha256("\n".join(out).encode()).hexdigest()[:16], out

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = []
for qid in sorted(oracle):
    try:
        d = con.execute(oracle[qid])
        dcols = [c[0] for c in d.description]
        # Faithfulness to the driver: it pulls DuckDB results through
        # pandas/pyarrow, where HUGEINT (e.g. any un-CAST sum(int)) turns
        # into float64 and then canonicalizes as "x.0000" — a guaranteed
        # hash mismatch against Spark's int64. fetchall() hides that
        # (python ints), so flag HUGEINT columns as a hard failure here.
        dtypes = [c[1] for c in d.description]
        huge = [c for c, t in zip(dcols, dtypes) if str(t).upper() in ("HUGEINT", "INT128")]
        if huge:
            fails.append((qid, "hugeint-col", f"{huge} would float64-ify in the driver; CAST ... AS BIGINT")); continue
        drows = d.fetchall()
    except Exception as ex:
        fails.append((qid, "duckdb", str(ex).splitlines()[0][:160])); continue
    pq = os.path.join(outdir, qid)
    if not os.path.isdir(pq):
        fails.append((qid, "missing-parquet", "")); continue
    s = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
    scols = [c[0] for c in s.description]
    srows = s.fetchall()
    if sorted(dcols) != sorted(scols):
        fails.append((qid, "schema", f"duck={sorted(dcols)} spark={sorted(scols)}")); continue
    # sort columns by name (driver behavior)
    dperm = [dcols.index(c) for c in sorted(dcols)]
    sperm = [scols.index(c) for c in sorted(scols)]
    dh, dtxt = canon([tuple(r[i] for i in dperm) for r in drows])
    sh, stxt = canon([tuple(r[i] for i in sperm) for r in srows])
    ok = dh == sh
    print(f"{'OK ' if ok else 'MISMATCH'} {qid:22s} duck={dh} spark={sh} rows={len(drows)}/{len(srows)}")
    if not ok:
        for a, b in list(zip(dtxt, stxt))[:4]:
            if a != b: print(f"   duck : {a}\n   spark: {b}")
        if len(dtxt) != len(stxt): print(f"   rowcount differs {len(dtxt)} vs {len(stxt)}")
        fails.append((qid, "mismatch", ""))
print("\nFAILURES:", len(fails))
for f in fails: print("  ", f)
sys.exit(1 if fails else 0)
