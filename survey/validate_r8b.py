#!/usr/bin/env python3
"""Scratch validator for round-8b inventory candidates: run each candidate on
BOTH DuckDB and Spark SQL over /root/testdata/$SF and hash-compare results.
Not engine code — survey de-risking only (same harness shape as
validate_inventory.py)."""
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

# ---- TS-M4: pixel-bucket downsampling (first/min/max/last WITH timestamps)
q("TS-M4", """
WITH b AS (SELECT user_id, CAST(floor(CAST(ts AS DOUBLE)/21600)*21600 AS BIGINT) AS bucket,
    value, CAST(ts AS BIGINT) AS et, event_id FROM events WHERE user_id < 8),
r AS (SELECT *,
    row_number() OVER (PARTITION BY user_id, bucket ORDER BY et, event_id) AS rf,
    row_number() OVER (PARTITION BY user_id, bucket ORDER BY et DESC, event_id DESC) AS rl,
    row_number() OVER (PARTITION BY user_id, bucket ORDER BY value, et, event_id) AS rmn,
    row_number() OVER (PARTITION BY user_id, bucket ORDER BY value DESC, et DESC, event_id DESC) AS rmx
  FROM b)
SELECT user_id, bucket,
  max(CASE WHEN rf = 1 THEN et END) AS t_first, round(max(CASE WHEN rf = 1 THEN value END), 2) AS v_first,
  max(CASE WHEN rmn = 1 THEN et END) AS t_min, round(max(CASE WHEN rmn = 1 THEN value END), 2) AS v_min,
  max(CASE WHEN rmx = 1 THEN et END) AS t_max, round(max(CASE WHEN rmx = 1 THEN value END), 2) AS v_max,
  max(CASE WHEN rl = 1 THEN et END) AS t_last, round(max(CASE WHEN rl = 1 THEN value END), 2) AS v_last
FROM r GROUP BY user_id, bucket ORDER BY user_id, bucket
""", f"""
WITH b AS (SELECT user_id, CAST(floor(epoch(ts)/21600)*21600 AS BIGINT) AS bucket,
    value, CAST(floor(epoch(ts)) AS BIGINT) AS et, event_id FROM {EV} WHERE user_id < 8),
r AS (SELECT *,
    row_number() OVER (PARTITION BY user_id, bucket ORDER BY et, event_id) AS rf,
    row_number() OVER (PARTITION BY user_id, bucket ORDER BY et DESC, event_id DESC) AS rl,
    row_number() OVER (PARTITION BY user_id, bucket ORDER BY value, et, event_id) AS rmn,
    row_number() OVER (PARTITION BY user_id, bucket ORDER BY value DESC, et DESC, event_id DESC) AS rmx
  FROM b)
SELECT user_id, bucket,
  max(CASE WHEN rf = 1 THEN et END) AS t_first, round(max(CASE WHEN rf = 1 THEN value END), 2) AS v_first,
  max(CASE WHEN rmn = 1 THEN et END) AS t_min, round(max(CASE WHEN rmn = 1 THEN value END), 2) AS v_min,
  max(CASE WHEN rmx = 1 THEN et END) AS t_max, round(max(CASE WHEN rmx = 1 THEN value END), 2) AS v_max,
  max(CASE WHEN rl = 1 THEN et END) AS t_last, round(max(CASE WHEN rl = 1 THEN value END), 2) AS v_last
FROM r GROUP BY user_id, bucket ORDER BY user_id, bucket
""")

# ---- TS-AUTOCORR: per-series lag-1 autocorrelation
q("TS-AUTOCORR", """
WITH x AS (SELECT user_id, value,
    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
  FROM events)
SELECT user_id, round(corr(value, pv), 4) + 0.0 AS ac1, count(*) AS n
FROM x WHERE pv IS NOT NULL GROUP BY user_id ORDER BY user_id LIMIT 60
""", f"""
WITH x AS (SELECT user_id, value,
    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
  FROM {EV})
SELECT user_id, round(corr(value, pv), 4) + 0.0 AS ac1, count(*) AS n
FROM x WHERE pv IS NOT NULL GROUP BY user_id ORDER BY user_id LIMIT 60
""")

# ---- WIN-ROLLING-MEDIAN: exact median over a moving row frame
q("WIN-ROLLING-MEDIAN", """
SELECT user_id, event_id,
  round(percentile(value, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS med10
FROM events WHERE user_id < 5 ORDER BY user_id, event_id LIMIT 200
""", f"""
SELECT user_id, event_id,
  round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS med10
FROM {EV} ORDER BY user_id, event_id LIMIT 200
""".replace("FROM " + EV, "FROM " + EV + " WHERE user_id < 5"))

# ---- WIN-ROLLING-DISTINCT: distinct event types in a moving frame
q("WIN-ROLLING-DISTINCT", """
SELECT user_id, event_id,
  size(collect_set(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) AS ndist
FROM events WHERE user_id < 5 ORDER BY user_id, event_id LIMIT 200
""", f"""
SELECT user_id, event_id,
  len(list_distinct(list(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))) AS ndist
FROM {EV} WHERE user_id < 5 ORDER BY user_id, event_id LIMIT 200
""")

# ---- EVENT-CONCURRENCY: sweep-line peak concurrency per 6h bucket
q("EVENT-CONCURRENCY", """
WITH pts AS (
  SELECT CAST(ts AS BIGINT) AS t, 1 AS d FROM events
  UNION ALL
  SELECT CAST(ts AS BIGINT) + 300 AS t, -1 AS d FROM events),
sw AS (SELECT t, sum(d) OVER (ORDER BY t, d) AS conc FROM pts)
SELECT CAST(floor(t / 21600) * 21600 AS BIGINT) AS bucket, max(conc) AS peak
FROM sw GROUP BY 1 ORDER BY bucket
""", f"""
WITH pts AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t, 1 AS d FROM {EV}
  UNION ALL
  SELECT CAST(floor(epoch(ts)) AS BIGINT) + 300 AS t, -1 AS d FROM {EV}),
sw AS (SELECT t, sum(d) OVER (ORDER BY t, d) AS conc FROM pts)
SELECT CAST(floor(t / 21600) * 21600 AS BIGINT) AS bucket, max(conc) AS peak
FROM sw GROUP BY 1 ORDER BY bucket
""")

fails = 0
for qid, ssql, dsql in Q:
    try:
        drows = con.execute(dsql).fetchall()
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
        print(f"{qid}: HASH-MISMATCH duck={len(drows)} spark={len(srows)}")
        for a, b in list(zip(dtxt, stxt))[:8]:
            if a != b: print(f"   duck={a}\n  spark={b}")
print("FAILURES:", fails)
