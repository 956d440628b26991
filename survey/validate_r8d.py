#!/usr/bin/env python3
"""Scratch validator for round-8d inventory candidates: run each candidate on
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

# ---- TS-CUSUM: one-sided CUSUM change score via the prefix-min closed form
#   S_t = max(0, S_{t-1} + (x_t - mu - k))  ==  C_t - min(0, min_{i<=t} C_i)
CUSUM_BODY = """
c AS (
  SELECT user_id, event_id, et,
    sum(value - mu - 5.0) OVER (PARTITION BY user_id ORDER BY et, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
  FROM x)
SELECT user_id, event_id,
  round(cm - least(CAST(0.0 AS DOUBLE), min(cm) OVER (PARTITION BY user_id ORDER BY et, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4) + 0.0 AS cusum,
  (cm - least(CAST(0.0 AS DOUBLE), min(cm) OVER (PARTITION BY user_id ORDER BY et, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) > 500.0 AS alarm
FROM c ORDER BY user_id, event_id LIMIT 400
"""
q("TS-CUSUM", """
WITH x AS (
  SELECT user_id, event_id, CAST(ts AS BIGINT) AS et, value,
    avg(value) OVER (PARTITION BY user_id) AS mu
  FROM events WHERE user_id < 40),""" + CUSUM_BODY, f"""
WITH x AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS et, value,
    avg(value) OVER (PARTITION BY user_id) AS mu
  FROM {EV} WHERE user_id < 40),""" + CUSUM_BODY)

# ---- TS-LTTB: largest-triangle downsampling, parallel variant with
#      per-bucket mean anchors (first/last buckets keep first/last points)
LTTB_BODY = """
s AS (SELECT user_id, min(et) AS mn, max(et) AS mx FROM pts GROUP BY user_id),
b AS (SELECT p.user_id, p.et, p.event_id, p.value,
        least(CAST(floor((p.et - s.mn) * 12.0 / (s.mx - s.mn + 1)) AS INT), 11) AS bk
      FROM pts p JOIN s ON p.user_id = s.user_id),
m AS (SELECT user_id, bk, round(avg(et), 6) AS bx, round(avg(value), 6) AS by
      FROM b GROUP BY user_id, bk),
n AS (SELECT user_id, bk,
        lag(bx)  OVER (PARTITION BY user_id ORDER BY bk) AS ax,
        lag(by)  OVER (PARTITION BY user_id ORDER BY bk) AS ay,
        lead(bx) OVER (PARTITION BY user_id ORDER BY bk) AS cx,
        lead(by) OVER (PARTITION BY user_id ORDER BY bk) AS cy
      FROM m),
a AS (SELECT b.user_id, b.bk, b.et, b.event_id, b.value,
        CASE WHEN n.ax IS NULL THEN CAST(b.et AS DOUBLE)
             WHEN n.cx IS NULL THEN -CAST(b.et AS DOUBLE)
             ELSE -abs((n.ax - n.cx) * (b.value - n.ay) - (n.ax - b.et) * (n.cy - n.ay)) END AS sel
      FROM b JOIN n ON b.user_id = n.user_id AND b.bk = n.bk),
r AS (SELECT user_id, bk, et, value,
        row_number() OVER (PARTITION BY user_id, bk ORDER BY sel, et, event_id) AS rn
      FROM a)
SELECT user_id, bk, et, round(value, 2) AS v
FROM r WHERE rn = 1 ORDER BY user_id, bk
"""
q("TS-LTTB", """
WITH pts AS (SELECT user_id, CAST(ts AS BIGINT) AS et, event_id, value
  FROM events WHERE user_id < 20),""" + LTTB_BODY, f"""
WITH pts AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS et, event_id, value
  FROM {EV} WHERE user_id < 20),""" + LTTB_BODY)

# ---- AGG-SKYLINE: 2-D Pareto frontier (minimize price, maximize size)
#      via sorted running-max — O(n log n), no dominance self-join
SKYLINE = """
WITH d AS (SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part),
g AS (SELECT price, max(size) AS gmax FROM d GROUP BY price),
r AS (SELECT price, gmax,
        max(gmax) OVER (ORDER BY price ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxlt
      FROM g)
SELECT round(price, 2) AS price, gmax AS size FROM r
WHERE maxlt IS NULL OR maxlt < gmax
ORDER BY price
"""
q("AGG-SKYLINE", SKYLINE)

# ---- CDC-DIFF: snapshot diff (insert/delete/update + changed column list)
CDC = """
WITH a AS (SELECT o_orderkey AS k, o_orderstatus AS st, round(o_totalprice, 2) AS tp
           FROM orders WHERE o_orderkey % 10 <> 0),
b AS (SELECT o_orderkey AS k,
        CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS st,
        round(o_totalprice + CASE WHEN o_orderkey % 5 = 0 THEN 10.0 ELSE 0.0 END, 2) AS tp
      FROM orders WHERE o_orderkey % 10 <> 1)
SELECT coalesce(a.k, b.k) AS k,
  CASE WHEN a.k IS NULL THEN 'insert' WHEN b.k IS NULL THEN 'delete' ELSE 'update' END AS change_type,
  concat_ws(',',
    CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL AND a.st IS DISTINCT FROM b.st THEN 'st' END,
    CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL AND a.tp IS DISTINCT FROM b.tp THEN 'tp' END) AS changed_cols
FROM a FULL OUTER JOIN b ON a.k = b.k
WHERE a.k IS NULL OR b.k IS NULL
   OR a.st IS DISTINCT FROM b.st OR a.tp IS DISTINCT FROM b.tp
ORDER BY k
"""
q("CDC-DIFF", CDC)

# ---- DIM-SCD2: type-2 dimension history from a change log (collapse no-op
#      changes, last-write-wins per timestamp, validity intervals)
SCD2_BODY = """
lw AS (SELECT user_id, et, state FROM (
    SELECT user_id, et, state,
      row_number() OVER (PARTITION BY user_id, et ORDER BY event_id DESC) AS rn
    FROM log) t WHERE rn = 1),
d AS (SELECT user_id, et, state,
        lag(state) OVER (PARTITION BY user_id ORDER BY et) AS ps
      FROM lw),
chg AS (SELECT user_id, et, state FROM d WHERE ps IS NULL OR ps <> state)
SELECT user_id, et AS valid_from,
  lead(et) OVER (PARTITION BY user_id ORDER BY et) AS valid_to,
  state,
  (lead(et) OVER (PARTITION BY user_id ORDER BY et)) IS NULL AS is_current
FROM chg ORDER BY user_id, valid_from
"""
q("DIM-SCD2", """
WITH log AS (SELECT user_id, CAST(ts AS BIGINT) AS et, event_id,
    CAST(floor(value / 100) AS INT) AS state
  FROM events WHERE user_id < 30),""" + SCD2_BODY, f"""
WITH log AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS et, event_id,
    CAST(floor(value / 100) AS INT) AS state
  FROM {EV} WHERE user_id < 30),""" + SCD2_BODY)

# ---- AGG-EXPHIST: exponential (base-2) histogram over integer cents +
#      cumulative fraction + bucket upper bound (OTel-style metric shape)
EXPHIST = """
WITH b AS (SELECT event_type,
    CAST(floor(round(ln(CAST(round(value * 100) AS BIGINT) * 1.0) / ln(2.0), 9)) AS INT) AS bucket
  FROM events WHERE value > 0),
h AS (SELECT event_type, bucket, count(*) AS cnt FROM b GROUP BY event_type, bucket),
c AS (SELECT event_type, bucket, cnt,
        sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
        sum(cnt) OVER (PARTITION BY event_type) AS tot
      FROM h)
SELECT event_type, bucket, cnt,
  round(cum * 1.0 / tot, 4) AS cum_frac,
  round(power(2.0, bucket + 1) / 100.0, 4) AS ub
FROM c ORDER BY event_type, bucket
"""
q("AGG-EXPHIST", EXPHIST)

# ---- TS-ROLLUP-CASCADE: hour→day re-aggregation == day-from-raw
#      (mergeable-rollup contract for sum/count/min/max)
ROLLUP_BODY = """
h AS (SELECT event_type, (et - (et % 3600)) AS hb,
        sum(value) AS sv, count(*) AS c, min(value) AS mn, max(value) AS mx
      FROM pts GROUP BY event_type, (et - (et % 3600))),
dh AS (SELECT event_type, (hb - (hb % 86400)) AS db,
         sum(sv) AS sv, CAST(sum(c) AS BIGINT) AS c, min(mn) AS mn, max(mx) AS mx
       FROM h GROUP BY event_type, (hb - (hb % 86400))),
dr AS (SELECT event_type, (et - (et % 86400)) AS db,
         sum(value) AS sv, count(*) AS c, min(value) AS mn, max(value) AS mx
       FROM pts GROUP BY event_type, (et - (et % 86400)))
SELECT dh.event_type, dh.db, round(dh.sv, 4) AS day_sum, dh.c AS day_cnt,
  round(dh.mn, 4) AS day_min, round(dh.mx, 4) AS day_max,
  (dh.c = dr.c AND abs(dh.sv - dr.sv) < 1e-6 AND dh.mn = dr.mn AND dh.mx = dr.mx) AS rollup_equal
FROM dh JOIN dr ON dh.event_type = dr.event_type AND dh.db = dr.db
ORDER BY dh.event_type, dh.db
"""
q("TS-ROLLUP-CASCADE", """
WITH pts AS (SELECT event_type, CAST(ts AS BIGINT) AS et, value FROM events),""" + ROLLUP_BODY,
f"""
WITH pts AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS et, value FROM {EV}),""" + ROLLUP_BODY)

# ---- DQ-PROFILE: per-column profiling (null/nonnull/distinct/min/max)
DQ_PROFILE = """
SELECT 'o_custkey' AS col, count(*) AS n_rows, count(o_custkey) AS n_nonnull,
  count(DISTINCT o_custkey) AS n_distinct,
  round(min(o_custkey) + 0.0, 4) AS min_val, round(max(o_custkey) + 0.0, 4) AS max_val FROM orders
UNION ALL
SELECT 'o_totalprice', count(*), count(o_totalprice), count(DISTINCT o_totalprice),
  round(min(o_totalprice), 4), round(max(o_totalprice), 4) FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(o_orderstatus), count(DISTINCT o_orderstatus),
  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(o_orderpriority), count(DISTINCT o_orderpriority),
  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders
ORDER BY col
"""
q("DQ-PROFILE", DQ_PROFILE)

# ---- DQ-CHECK: constraint validation (pk unique / fk orphan / range / enum)
DQ_CHECK = """
SELECT chk, violations, violations = 0 AS ok FROM (
  SELECT 'pk_unique_orders' AS chk,
    CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS violations
  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1) t
  UNION ALL
  SELECT 'fk_lineitem_orders', count(*) FROM lineitem
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
  UNION ALL
  SELECT 'range_totalprice_pos', count(*) FROM orders WHERE o_totalprice <= 0
  UNION ALL
  SELECT 'nonnull_custkey', count(*) FROM orders WHERE o_custkey IS NULL
  UNION ALL
  SELECT 'enum_orderstatus', count(*) FROM orders
  WHERE o_orderstatus NOT IN ('F', 'O', 'P')) u
ORDER BY chk
"""
q("DQ-CHECK", DQ_CHECK)

# ---- STREAM-APPROXDIST-NATIVE oracle shape (engine side runs the real
#      StreamingOps.approxDistinctByWindow; theta is exact below 2^lgK)
APPROXDIST = """
SELECT metric, win, estimate FROM (
  SELECT event_type AS metric, (et - (et % 21600)) AS win,
    CAST(count(DISTINCT user_id) AS DOUBLE) AS estimate
  FROM pts GROUP BY event_type, (et - (et % 21600))) t
ORDER BY metric, win
"""
q("STREAM-APPROXDIST-NATIVE",
  "WITH pts AS (SELECT event_type, CAST(ts AS BIGINT) AS et, user_id FROM events)" + APPROXDIST,
  f"WITH pts AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS et, user_id FROM {EV})" + APPROXDIST)

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
