#!/usr/bin/env python3
"""Scratch validator for round-8f inventory candidates (same harness shape as
validate_r8d.py). Survey de-risking only."""
import duckdb, hashlib, os, sys

SF = os.environ.get("SF", "sf0.001")
DIR = f"/root/testdata/{SF}"
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
    con.execute(f"CREATE VIEW {t}_raw AS SELECT * FROM read_parquet('{DIR}/{t}.parquet')")
    if t == "events":
        con.execute("""CREATE VIEW events AS SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                       user_id, event_type, value, props FROM events_raw""")
    else:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {t}_raw")

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false")
         .config("spark.sql.legacy.parquet.nanosAsLong","true")
         .config("spark.sql.shuffle.partitions","4")
         .getOrCreate())
for t in TABLES:
    df = spark.read.parquet(f"{DIR}/{t}.parquet")
    df.createOrReplaceTempView(t + "_raw")
    if t == "events":
        if str(df.schema["ts"].dataType) == "LongType()":
            spark.sql("""CREATE OR REPLACE TEMP VIEW events AS
                SELECT event_id, timestamp_micros(CAST(ts DIV 1000 AS LONG)) AS ts,
                       user_id, event_type, value, props FROM events_raw""")
        else:
            spark.sql("""CREATE OR REPLACE TEMP VIEW events AS
                SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                       user_id, event_type, value, props FROM events_raw""")
    else:
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {t} AS SELECT * FROM {t}_raw")

Q = []
def q(qid, spark_sql, duck_sql=None):
    Q.append((qid, spark_sql, duck_sql or spark_sql))

EV = "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) e"

# ---- TEXT-PMI: collocation extraction by pointwise mutual information
PMI_TAIL = """
uni AS (SELECT tok, count(*) AS c FROM utok GROUP BY tok),
n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
n2 AS (SELECT CAST(sum(cb) AS BIGINT) AS nb FROM bg)
SELECT t1, t2, cb,
  round(ln((CAST(cb AS DOUBLE) / nb) / ((CAST(u1.c AS DOUBLE) / n) * (CAST(u2.c AS DOUBLE) / n))), 4) AS pmi
FROM bg JOIN uni u1 ON bg.t1 = u1.tok JOIN uni u2 ON bg.t2 = u2.tok
  CROSS JOIN n1 CROSS JOIN n2
WHERE cb >= 20
ORDER BY pmi DESC, t1, t2 LIMIT 40
"""
q("TEXT-PMI",
  """WITH toks AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
utok AS (SELECT explode(t) AS tok FROM toks),
bg AS (SELECT t[i-1] AS t1, t[i] AS t2, count(*) AS cb
       FROM toks LATERAL VIEW explode(sequence(1, size(t) - 1)) s AS i
       GROUP BY t[i-1], t[i]),""" + PMI_TAIL,
  """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
utok AS (SELECT unnest(t) AS tok FROM toks),
bg AS (SELECT t[i] AS t1, t[i+1] AS t2, count(*) AS cb
       FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS g(i)
       GROUP BY t[i], t[i+1]),""" + PMI_TAIL)

# ---- EVENT-STICKINESS: DAU / WAU / stickiness per day
STICK_TAIL = """
dau AS (SELECT db, count(DISTINCT user_id) AS dau FROM pts GROUP BY db),
wau AS (SELECT d.db, count(DISTINCT p.user_id) AS wau
        FROM (SELECT DISTINCT db FROM pts) d
        JOIN pts p ON p.db > d.db - 7 * 86400 AND p.db <= d.db
        GROUP BY d.db)
SELECT dau.db, dau.dau, wau.wau,
  round(dau.dau * 1.0 / wau.wau, 4) AS stickiness
FROM dau JOIN wau ON dau.db = wau.db
ORDER BY dau.db
"""
q("EVENT-STICKINESS",
  "WITH pts AS (SELECT user_id, (CAST(ts AS BIGINT) - (CAST(ts AS BIGINT) % 86400)) AS db FROM events)," + STICK_TAIL,
  f"WITH pts AS (SELECT user_id, (CAST(floor(epoch(ts)) AS BIGINT) - (CAST(floor(epoch(ts)) AS BIGINT) % 86400)) AS db FROM {EV})," + STICK_TAIL)

fails = 0
for qid, ssql, dsql in Q:
    try:
        drows = con.execute(dsql).fetchall()
        dtypes = [c[1] for c in con.execute(dsql).description]
        huge = [str(t) for t in dtypes if str(t).upper() in ("HUGEINT", "INT128")]
        if huge:
            print(f"{qid}: HUGEINT-COL {huge}"); fails += 1; continue
    except Exception as ex:
        print(f"{qid}: DUCK-ERR {str(ex).splitlines()[0][:200]}"); fails += 1; continue
    try:
        sdf = spark.sql(ssql)
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as ex:
        print(f"{qid}: SPARK-ERR {str(ex).splitlines()[0][:200]}"); fails += 1; continue
    dh, dtxt = canon(drows); sh, stxt = canon(srows)
    if dh == sh:
        print(f"{qid}: OK rows={len(srows)}")
    else:
        fails += 1
        print(f"{qid}: HASH-MISMATCH duck={len(dtxt)} spark={len(stxt)}")
        for a, b in list(zip(dtxt, stxt))[:8]:
            if a != b: print(f"   duck={a}\n  spark={b}")
print("FAILURES:", fails)
