#!/usr/bin/env python3
"""Scratch validator for round-8e inventory candidates (same harness shape as
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

# ---- TS-BURN-RATE: SRE multi-window multi-burn SLO alert
BURN_BODY = """
h AS (SELECT event_type, (et - (et % 3600)) AS hb,
        count(*) AS n, count(CASE WHEN value > 400 THEN 1 END) AS err
      FROM pts GROUP BY event_type, (et - (et % 3600))),
l AS (SELECT event_type, (et - (et % 21600)) AS lb,
        count(*) AS n6, count(CASE WHEN value > 400 THEN 1 END) AS err6
      FROM pts GROUP BY event_type, (et - (et % 21600)))
SELECT h.event_type, h.hb,
  round(err * 1.0 / n / 0.02, 4) AS burn_short,
  round(err6 * 1.0 / n6 / 0.02, 4) AS burn_long,
  ((err * 1.0 / n / 0.02) > 1.0 AND (err6 * 1.0 / n6 / 0.02) > 1.0) AS alert
FROM h JOIN l ON h.event_type = l.event_type AND (h.hb - (h.hb % 21600)) = l.lb
ORDER BY h.event_type, h.hb
"""
q("TS-BURN-RATE",
  "WITH pts AS (SELECT event_type, CAST(ts AS BIGINT) AS et, value FROM events)," + BURN_BODY,
  f"WITH pts AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS et, value FROM {EV})," + BURN_BODY)

# ---- TS-CORR-MATRIX: pairwise Pearson between per-type hourly series
CORR_BODY = """
h AS (SELECT event_type, (et - (et % 3600)) AS hb,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM pts GROUP BY event_type, (et - (et % 3600)))
SELECT a.event_type AS t1, b.event_type AS t2,
  round(corr(a.y, b.y), 4) + 0.0 AS r, count(*) AS n
FROM h a JOIN h b ON a.hb = b.hb AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY t1, t2
"""
q("TS-CORR-MATRIX",
  "WITH pts AS (SELECT event_type, CAST(ts AS BIGINT) AS et, value FROM events)," + CORR_BODY,
  f"WITH pts AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS et, value FROM {EV})," + CORR_BODY)

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
