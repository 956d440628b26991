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

# ---- JOIN-SCD2-LOOKUP: fact rows joined to their SCD2 dimension version
SCD2L_BODY = """
lw AS (SELECT user_id, et, state FROM (
    SELECT user_id, et, state,
      row_number() OVER (PARTITION BY user_id, et ORDER BY event_id DESC) AS rn
    FROM log) t WHERE rn = 1),
d AS (SELECT user_id, et, state,
        lag(state) OVER (PARTITION BY user_id ORDER BY et) AS ps
      FROM lw),
hist AS (SELECT user_id AS h_uid, et AS vf,
        lead(et) OVER (PARTITION BY user_id ORDER BY et) AS vt, state
      FROM d WHERE ps IS NULL OR ps <> state),
facts AS (SELECT event_id, user_id, et FROM ev WHERE event_type = 'purchase' AND user_id < 30)
SELECT f.event_id, f.user_id, h.state
FROM facts f JOIN hist h ON h.h_uid = f.user_id
  AND h.vf <= f.et AND (h.vt IS NULL OR f.et < h.vt)
ORDER BY f.event_id LIMIT 400
"""
q("JOIN-SCD2-LOOKUP",
  """WITH ev AS (SELECT event_id, user_id, event_type, CAST(ts AS BIGINT) AS et, value FROM events),
log AS (SELECT user_id, et, event_id, CAST(floor(value / 100) AS INT) AS state
  FROM ev WHERE user_id < 30),""" + SCD2L_BODY,
  f"""WITH ev AS (SELECT event_id, user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS et, value FROM {EV}),
log AS (SELECT user_id, et, event_id, CAST(floor(value / 100) AS INT) AS state
  FROM ev WHERE user_id < 30),""" + SCD2L_BODY)

# ---- TS-GAPS: missing-hour islands per series (gaps-and-islands merge)
GAPS_BODY = """
s AS (SELECT event_type, min(hb) AS mn, max(hb) AS mx FROM obs GROUP BY event_type),
grid AS (SELECT event_type, (mn + h * 3600) AS hb
         FROM s, gs WHERE mn + h * 3600 <= mx),
miss AS (SELECT g.event_type, g.hb FROM grid g
         LEFT JOIN obs o ON o.event_type = g.event_type AND o.hb = g.hb
         WHERE o.hb IS NULL),
isl AS (SELECT event_type, hb,
          hb - 3600 * row_number() OVER (PARTITION BY event_type ORDER BY hb) AS grp
        FROM miss)
SELECT event_type, min(hb) AS gap_start, max(hb) AS gap_end,
  count(*) AS n_missing
FROM isl GROUP BY event_type, grp
ORDER BY event_type, gap_start LIMIT 300
"""
q("TS-GAPS",
  """WITH obs AS (SELECT DISTINCT event_type,
    (CAST(ts AS BIGINT) - (CAST(ts AS BIGINT) % 3600)) AS hb FROM events WHERE user_id < 40),
gs AS (SELECT explode(sequence(0, 200)) AS h),""" + GAPS_BODY,
  f"""WITH obs AS (SELECT DISTINCT event_type,
    (CAST(floor(epoch(ts)) AS BIGINT) - (CAST(floor(epoch(ts)) AS BIGINT) % 3600)) AS hb FROM {EV} WHERE user_id < 40),
gs AS (SELECT unnest(generate_series(0, 200)) AS h),""" + GAPS_BODY)

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
