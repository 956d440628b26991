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

# ---- TEXT-BM25: classic BM25 ranking for a fixed term set
BM25_TAIL = """
lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
st AS (SELECT count(*) AS n, sum(len) AS tl FROM lens),
tf AS (SELECT doc_id, tok, count(*) AS f FROM toks
       WHERE tok IN ('join', 'vector', 'slow') GROUP BY doc_id, tok),
dfq AS (SELECT tok, count(DISTINCT doc_id) AS d FROM toks
        WHERE tok IN ('join', 'vector', 'slow') GROUP BY tok)
SELECT tf.doc_id,
  round(sum(ln((n - d + 0.5) / (d + 0.5) + 1.0)
    * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * len * n / CAST(tl AS DOUBLE)))), 4) + 0.0 AS bm25
FROM tf JOIN dfq ON tf.tok = dfq.tok JOIN lens ON tf.doc_id = lens.doc_id CROSS JOIN st
GROUP BY tf.doc_id
ORDER BY bm25 DESC, tf.doc_id LIMIT 15
"""
q("TEXT-BM25",
  "WITH toks AS (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents)," + BM25_TAIL,
  "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)," + BM25_TAIL)

# ---- DQ-SKEW: hot-key diagnostics (top-5 keys, share, ratio-to-uniform)
SKEW_TAIL = """
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS nkeys FROM c),
r AS (SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key DESC) AS rnk FROM c)
SELECT CAST(key AS BIGINT) AS suppkey, cnt, CAST(rnk AS INT) AS rnk,
  round(cnt * 1.0 / total, 4) AS share,
  round(cnt * 1.0 * nkeys / total, 4) AS skew
FROM r CROSS JOIN t WHERE rnk <= 5 ORDER BY rnk
"""
q("DQ-SKEW",
  """WITH c AS (SELECT lpad(CAST(l_suppkey AS STRING), 6, '0') AS key, count(*) AS cnt
    FROM lineitem GROUP BY lpad(CAST(l_suppkey AS STRING), 6, '0')),""" + SKEW_TAIL,
  """WITH c AS (SELECT lpad(CAST(l_suppkey AS VARCHAR), 6, '0') AS key, count(*) AS cnt
    FROM lineitem GROUP BY lpad(CAST(l_suppkey AS VARCHAR), 6, '0')),""" + SKEW_TAIL)

# ---- EVENT-ATTRIB-LINEAR: multi-touch linear attribution per channel
ATTRIB_TAIL = """
p AS (SELECT event_id AS pid, user_id, et AS pt FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, et AS ct, ch FROM e WHERE event_type = 'click'),
j AS (SELECT pid, ch, count(*) OVER (PARTITION BY pid) AS n
      FROM p JOIN c ON p.user_id = c.user_id AND c.ct > p.pt - 86400 AND c.ct <= p.pt)
SELECT ch AS channel, round(sum(1.0 / n), 4) AS credit, count(*) AS touches
FROM j GROUP BY ch ORDER BY ch
"""
q("EVENT-ATTRIB-LINEAR",
  """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS BIGINT) AS et,
    CAST(get_json_object(props, '$.k') AS BIGINT) % 4 AS ch FROM events),""" + ATTRIB_TAIL,
  f"""WITH e AS (SELECT event_id, user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS et,
    CAST(json_extract(props, '$.k') AS BIGINT) % 4 AS ch FROM {EV}),""" + ATTRIB_TAIL)

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
