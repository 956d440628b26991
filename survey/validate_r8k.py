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

# ---- LLM-BPE-TRAIN: three distributed BPE merge rounds
q("LLM-BPE-TRAIN", """WITH d0 AS (SELECT doc_id, text FROM documents),
bg1 AS (SELECT pair, count(*) AS cnt FROM (
  SELECT explode(transform(sequence(0, size(split(text, ' ')) - 2),
    j -> concat(element_at(split(text, ' '), j + 1), ' ', element_at(split(text, ' '), j + 2)))) AS pair
  FROM d0 WHERE size(split(text, ' ')) >= 2) t GROUP BY pair),
p1 AS (SELECT pair, cnt FROM bg1 ORDER BY cnt DESC, pair LIMIT 1),
d1 AS (SELECT doc_id, replace(text, (SELECT pair FROM p1),
  replace((SELECT pair FROM p1), ' ', '@')) AS text FROM d0),
bg2 AS (SELECT pair, count(*) AS cnt FROM (
  SELECT explode(transform(sequence(0, size(split(text, ' ')) - 2),
    j -> concat(element_at(split(text, ' '), j + 1), ' ', element_at(split(text, ' '), j + 2)))) AS pair
  FROM d1 WHERE size(split(text, ' ')) >= 2) t GROUP BY pair),
p2 AS (SELECT pair, cnt FROM bg2 ORDER BY cnt DESC, pair LIMIT 1),
d2 AS (SELECT doc_id, replace(text, (SELECT pair FROM p2),
  replace((SELECT pair FROM p2), ' ', '@')) AS text FROM d1),
bg3 AS (SELECT pair, count(*) AS cnt FROM (
  SELECT explode(transform(sequence(0, size(split(text, ' ')) - 2),
    j -> concat(element_at(split(text, ' '), j + 1), ' ', element_at(split(text, ' '), j + 2)))) AS pair
  FROM d2 WHERE size(split(text, ' ')) >= 2) t GROUP BY pair),
p3 AS (SELECT pair, cnt FROM bg3 ORDER BY cnt DESC, pair LIMIT 1),
d3 AS (SELECT doc_id, replace(text, (SELECT pair FROM p3),
  replace((SELECT pair FROM p3), ' ', '@')) AS text FROM d2)
SELECT r, pair, cnt FROM (
  SELECT 1 AS r, pair, cnt FROM p1
  UNION ALL SELECT 2, pair, cnt FROM p2
  UNION ALL SELECT 3, pair, cnt FROM p3) u
ORDER BY r""", """WITH d0 AS (SELECT doc_id, text FROM documents),
bg1 AS (SELECT pair, count(*) AS cnt FROM (
  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
    j -> string_split(text, ' ')[j] || ' ' || string_split(text, ' ')[j + 1])) AS pair
  FROM d0 WHERE len(string_split(text, ' ')) >= 2) t GROUP BY pair),
p1 AS (SELECT pair, cnt FROM bg1 ORDER BY cnt DESC, pair LIMIT 1),
d1 AS (SELECT doc_id, replace(text, (SELECT pair FROM p1),
  replace((SELECT pair FROM p1), ' ', '@')) AS text FROM d0),
bg2 AS (SELECT pair, count(*) AS cnt FROM (
  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
    j -> string_split(text, ' ')[j] || ' ' || string_split(text, ' ')[j + 1])) AS pair
  FROM d1 WHERE len(string_split(text, ' ')) >= 2) t GROUP BY pair),
p2 AS (SELECT pair, cnt FROM bg2 ORDER BY cnt DESC, pair LIMIT 1),
d2 AS (SELECT doc_id, replace(text, (SELECT pair FROM p2),
  replace((SELECT pair FROM p2), ' ', '@')) AS text FROM d1),
bg3 AS (SELECT pair, count(*) AS cnt FROM (
  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
    j -> string_split(text, ' ')[j] || ' ' || string_split(text, ' ')[j + 1])) AS pair
  FROM d2 WHERE len(string_split(text, ' ')) >= 2) t GROUP BY pair),
p3 AS (SELECT pair, cnt FROM bg3 ORDER BY cnt DESC, pair LIMIT 1),
d3 AS (SELECT doc_id, replace(text, (SELECT pair FROM p3),
  replace((SELECT pair FROM p3), ' ', '@')) AS text FROM d2)
SELECT r, pair, cnt FROM (
  SELECT 1 AS r, pair, cnt FROM p1
  UNION ALL SELECT 2, pair, cnt FROM p2
  UNION ALL SELECT 3, pair, cnt FROM p3) u
ORDER BY r""")

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
