package graft.queries

/** The declared query inventory — SURVEY.md §2b, the t2 correctness contract.
  *
  * Each entry carries the Spark SQL the engine runs and the equivalent ANSI
  * SQL the DuckDB oracle runs on the same parquet tables. Both variants were
  * cross-validated (bit-identical canonical hashes at sf0.001/0.01/0.1) by
  * `survey/validate_inventory.py` — treat that harness as normative; do not
  * add or edit a query here without re-running it through the dual-engine
  * validator.
  *
  * Dialect notes (why some duck variants differ):
  *  - epoch seconds: Spark `CAST(ts AS DOUBLE)` / `CAST(ts AS BIGINT)` vs
  *    DuckDB `epoch(ts)`;
  *  - arrays: Spark 0-indexed `[]`, `size`, `split`; DuckDB 1-indexed,
  *    `len`, `string_split`;
  *  - `STRING` vs `VARCHAR` casts; `RLIKE` vs `regexp_matches`;
  *    `get_json_object` vs `json_extract`;
  *  - DuckDB requires an alias on derived tables;
  *  - `events.ts` is parquet timestamp[ns]: the Spark side reads it via the
  *    normalized view (graft.core.Tables); the duck side inlines
  *    `CAST(ts AS TIMESTAMP)` so the oracle works on raw tables too.
  *
  * Every query ends in a total-order ORDER BY (lineitem has NO unique key —
  * FIXTURES.md quirk #2 — so sorts tie-break on selected columns), and every
  * output column is aliased identically in both variants (the driver's
  * compare sorts columns by name).
  */
object Inventory {

  final case class Query(id: String, sparkSql: String, duckSql: String)

  /** DuckDB-side normalized events relation (ns → µs timestamp). */
  private val EV =
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  private val buf = scala.collection.mutable.ListBuffer.empty[Query]
  private def q(id: String, sparkSql: String, duckSql: String = null): Unit =
    buf += Query(id, sparkSql, Option(duckSql).getOrElse(sparkSql))

  // ---------------------------------------------------------------- scan
  q("SCAN-COUNT", "SELECT count(*) AS cnt FROM lineitem")

  // ----------------------------------------------------------- projection
  q("PROJ-EXPR",
    """SELECT l_orderkey, l_linenumber,
      |  round(l_extendedprice * (1 - l_discount), 2) AS net
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, net LIMIT 50""".stripMargin)

  // --------------------------------------------------------------- filter
  q("FILTER-PRED",
    """SELECT o_orderkey FROM orders
      |WHERE o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 1000 AND 50000
      |  AND o_orderpriority LIKE '1-%' AND NOT (o_custkey = 7)
      |ORDER BY o_orderkey LIMIT 50""".stripMargin)

  // ---------------------------------------------------------------- joins
  q("JOIN-INNER-EQUI",
    """SELECT r_name, n_name, count(*) AS c
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)

  q("JOIN-LEFT-OUTER",
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  coalesce(round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2), 0.0) AS spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey LIMIT 60""".stripMargin)

  q("JOIN-FULL-OUTER",
    """SELECT coalesce(a.k, b.k) AS k, a.nc, b.ns FROM
      | (SELECT c_nationkey AS k, count(*) AS nc FROM customer GROUP BY c_nationkey) a
      | FULL OUTER JOIN
      | (SELECT s_nationkey AS k, count(*) AS ns FROM supplier GROUP BY s_nationkey) b
      | ON a.k = b.k ORDER BY k""".stripMargin)

  q("JOIN-SEMI",
    """SELECT c_custkey FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      |ORDER BY c_custkey""".stripMargin)

  q("JOIN-ANTI",
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin)

  q("JOIN-RANGE",
    """SELECT o.o_orderkey, count(*) AS n
      |FROM orders o JOIN lineitem l
      |  ON l.l_orderkey = o.o_orderkey
      | AND l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate <  o.o_orderdate + INTERVAL '60' DAY
      |GROUP BY o.o_orderkey ORDER BY o.o_orderkey LIMIT 50""".stripMargin,
    """SELECT o.o_orderkey, count(*) AS n
      |FROM orders o JOIN lineitem l
      |  ON l.l_orderkey = o.o_orderkey
      | AND l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
      |GROUP BY o.o_orderkey ORDER BY o.o_orderkey LIMIT 50""".stripMargin)

  q("JOIN-ASOF",
    """WITH purchases AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |clicks AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'click')
      |SELECT p.event_id, max(CAST(c.ts AS BIGINT)) AS last_click_epoch
      |FROM purchases p LEFT JOIN clicks c
      |  ON c.user_id = p.user_id AND c.ts <= p.ts
      |GROUP BY p.event_id ORDER BY p.event_id LIMIT 80""".stripMargin,
    s"""WITH purchases AS (
      |  SELECT event_id, user_id, ts FROM $EV events WHERE event_type = 'purchase'),
      |clicks AS (
      |  SELECT user_id, ts FROM $EV events WHERE event_type = 'click')
      |SELECT p.event_id, max(CAST(floor(epoch(c.ts)) AS BIGINT)) AS last_click_epoch
      |FROM purchases p LEFT JOIN clicks c
      |  ON c.user_id = p.user_id AND c.ts <= p.ts
      |GROUP BY p.event_id ORDER BY p.event_id LIMIT 80""".stripMargin)

  // ---------------------------------------------------------- aggregation
  q("AGG-TPCH-Q1",
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base,
      |  round(CAST(avg(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE), 4) AS avg_disc,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  q("AGG-DISTINCT",
    """SELECT event_type, count(DISTINCT user_id) AS u
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    s"""SELECT event_type, count(DISTINCT user_id) AS u
      |FROM $EV events GROUP BY event_type ORDER BY event_type""".stripMargin)

  q("AGG-ROLLUP",
    """SELECT r_name, n_name, count(*) AS c
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)

  q("AGG-CUBE",
    """SELECT c_mktsegment, n_name, count(*) AS c
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY CUBE (c_mktsegment, n_name)
      |ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST""".stripMargin)

  q("AGG-GROUPING-SETS",
    """SELECT c_mktsegment, n_name, count(*) AS c
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
      |ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST""".stripMargin)

  q("AGG-STATS",
    """SELECT event_type,
      |  round(CAST(stddev_samp(value) AS DOUBLE), 3) AS sd,
      |  round(CAST(var_samp(value) AS DOUBLE), 3) AS vr,
      |  round(min(value), 2) AS mn, round(max(value), 2) AS mx
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    s"""SELECT event_type,
      |  round(CAST(stddev_samp(value) AS DOUBLE), 3) AS sd,
      |  round(CAST(var_samp(value) AS DOUBLE), 3) AS vr,
      |  round(min(value), 2) AS mn, round(max(value), 2) AS mx
      |FROM $EV events GROUP BY event_type ORDER BY event_type""".stripMargin)

  // --------------------------------------------------------------- window
  q("WIN-RANK",
    """SELECT user_id, event_id,
      |  row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
      |FROM events WHERE user_id < 5
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, rn LIMIT 80""".stripMargin,
    s"""SELECT user_id, event_id,
      |  row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
      |FROM $EV events WHERE user_id < 5
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, rn LIMIT 80""".stripMargin)

  q("WIN-LAG-LEAD",
    """SELECT event_id,
      |  lag(event_id) OVER w AS prev_id, lead(event_id) OVER w AS next_id
      |FROM events WHERE user_id = 3
      |WINDOW w AS (ORDER BY ts, event_id) ORDER BY event_id""".stripMargin,
    s"""SELECT event_id,
      |  lag(event_id) OVER w AS prev_id, lead(event_id) OVER w AS next_id
      |FROM $EV events WHERE user_id = 3
      |WINDOW w AS (ORDER BY ts, event_id) ORDER BY event_id""".stripMargin)

  q("WIN-FRAME-ROWS",
    """SELECT event_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
      |FROM events WHERE user_id < 3 ORDER BY event_id LIMIT 80""".stripMargin,
    s"""SELECT event_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
      |FROM $EV events WHERE user_id < 3 ORDER BY event_id LIMIT 80""".stripMargin)

  q("WIN-FRAME-RANGE",
    """SELECT o_orderkey,
      |  count(*) OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
      |        RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS near_cnt
      |FROM orders ORDER BY o_orderkey LIMIT 60""".stripMargin)

  q("WIN-NTILE",
    """SELECT o_orderkey, ntile(4) OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey) AS q
      |FROM orders ORDER BY o_orderkey LIMIT 60""".stripMargin)

  // ----------------------------------------------------------- sort/limit
  q("SORT-TOPK",
    """SELECT o_orderkey, round(o_totalprice,2) AS p FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)

  // -------------------------------------------------------------- set ops
  q("SET-UNION",
    """SELECT k FROM (
      |  SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey AS k FROM supplier
      |) ORDER BY k""".stripMargin,
    """SELECT k FROM (
      |  SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey AS k FROM supplier
      |) t ORDER BY k""".stripMargin)

  q("SET-UNION-ALL",
    """SELECT count(*) AS cnt FROM (
      |  SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier) t""".stripMargin)

  q("SET-INTERSECT",
    """SELECT c_nationkey AS k FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin)

  q("SET-EXCEPT",
    """SELECT c_nationkey AS k FROM customer
      |EXCEPT SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin)

  // ------------------------------------------------------------ scalar fn
  q("FN-STRING",
    """SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt,
      |  substr(p_name, 1, 8) AS s8, length(p_name) AS ln,
      |  replace(p_brand, '#', '-') AS rp, trim(concat(' ', p_name, ' ')) AS tc,
      |  lpad(CAST(p_size AS STRING), 4, '0') AS pad
      |FROM part ORDER BY p_partkey LIMIT 40""".stripMargin,
    """SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt,
      |  substr(p_name, 1, 8) AS s8, length(p_name) AS ln,
      |  replace(p_brand, '#', '-') AS rp, trim(concat(' ', p_name, ' ')) AS tc,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS pad
      |FROM part ORDER BY p_partkey LIMIT 40""".stripMargin)

  q("FN-REGEX",
    """SELECT p_partkey FROM part WHERE p_type RLIKE '^(STANDARD|SMALL)'
      |ORDER BY p_partkey LIMIT 40""".stripMargin,
    """SELECT p_partkey FROM part WHERE regexp_matches(p_type, '^(STANDARD|SMALL)')
      |ORDER BY p_partkey LIMIT 40""".stripMargin)

  q("FN-DATE",
    """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  day(o_orderdate) AS d, CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart
      |FROM orders ORDER BY o_orderkey LIMIT 40""".stripMargin)

  q("FN-MATH",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_discount - 0.05) AS a,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS f, CAST(ceiling(l_extendedprice) AS BIGINT) AS c,
      |  round(sqrt(l_quantity), 4) AS sq, round(ln(l_extendedprice), 4) AS lg,
      |  round(power(l_tax + 1, 2), 4) AS pw, CAST(l_partkey % 7 AS BIGINT) AS md
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, f, md LIMIT 40""".stripMargin)

  q("FN-ARRAY",
    """SELECT vec_id, size(embedding) AS dim,
      |  round(CAST(embedding[0] AS DOUBLE), 4) AS e0
      |FROM embeddings ORDER BY vec_id LIMIT 40""".stripMargin,
    """SELECT vec_id, len(embedding) AS dim,
      |  round(CAST(embedding[1] AS DOUBLE), 4) AS e0
      |FROM embeddings ORDER BY vec_id LIMIT 40""".stripMargin)

  q("FN-JSON",
    """SELECT event_id, CAST(get_json_object(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id LIMIT 60""".stripMargin,
    s"""SELECT event_id, CAST(json_extract(props, '$$.k') AS BIGINT) AS k
      |FROM $EV events ORDER BY event_id LIMIT 60""".stripMargin)

  // ------------------------------------------- streaming (batch-replay)
  q("STREAM-TUMBLE",
    """SELECT CAST(floor(CAST(ts AS DOUBLE) / 21600) * 21600 AS BIGINT) AS bucket,
      |  event_type, count(*) AS c,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sv
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 100""".stripMargin,
    s"""SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket,
      |  event_type, count(*) AS c,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sv
      |FROM $EV events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 100""".stripMargin)

  q("STREAM-SLIDE",
    """WITH shifts AS (SELECT 0 AS s UNION ALL SELECT 10800),
      |b AS (SELECT CAST(floor((CAST(ts AS DOUBLE) - s) / 21600) * 21600 + s AS BIGINT) AS wstart, value
      |      FROM events CROSS JOIN shifts)
      |SELECT wstart, count(*) AS c FROM b GROUP BY wstart ORDER BY wstart LIMIT 100""".stripMargin,
    s"""WITH shifts AS (SELECT 0 AS s UNION ALL SELECT 10800),
      |b AS (SELECT CAST(floor((epoch(ts) - s) / 21600) * 21600 + s AS BIGINT) AS wstart, value
      |      FROM $EV events CROSS JOIN shifts)
      |SELECT wstart, count(*) AS c FROM b GROUP BY wstart ORDER BY wstart LIMIT 100""".stripMargin)

  q("STREAM-SESSION",
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN CAST(ts AS DOUBLE) - CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) > 1800
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |s AS (SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM g)
      |SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    s"""WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM $EV events),
      |s AS (SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM g)
      |SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin)

  // --------------------------------------------------------- LLM pipeline
  q("LLM-COSINE-TOPK",
    """WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  round(
      |    aggregate(zip_with(e.embedding, probe.p, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
      |    / (sqrt(aggregate(e.embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
      |     * sqrt(aggregate(probe.p, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))), 3) AS cos
      |FROM embeddings e CROSS JOIN probe
      |WHERE e.vec_id <> 0
      |ORDER BY cos DESC, e.vec_id LIMIT 5""".stripMargin,
    """WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  round(CAST(list_cosine_similarity(e.embedding, probe.p) AS DOUBLE), 3) AS cos
      |FROM embeddings e CROSS JOIN probe
      |WHERE e.vec_id <> 0
      |ORDER BY cos DESC, e.vec_id LIMIT 5""".stripMargin)

  q("LLM-DEDUP",
    """SELECT count(*) AS docs, count(DISTINCT md5(lower(text))) AS uniq
      |FROM documents""".stripMargin)

  q("LLM-TOKENIZE",
    """SELECT doc_id, size(split(text, ' ')) AS n_tokens
      |FROM documents ORDER BY doc_id LIMIT 50""".stripMargin,
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      |FROM documents ORDER BY doc_id LIMIT 50""".stripMargin)

  // --------------------------------------------------------- ingest parse
  q("PARSE-DECONSTRUCT",
    """SELECT t.metric, CAST(t.v AS DOUBLE) AS value, CAST(t.e AS BIGINT) AS epoch
      |FROM (
      |  SELECT split(line, ' ')[0] AS metric, split(line, ' ')[1] AS v, split(line, ' ')[2] AS e
      |  FROM (SELECT concat('svc.', event_type, '.count ', CAST(round(value,2) AS STRING), ' ',
      |               CAST(CAST(ts AS DECIMAL(20,0)) AS STRING)) AS line FROM events) raw
      |) t ORDER BY epoch, metric LIMIT 50""".stripMargin,
    s"""SELECT t.metric, CAST(t.v AS DOUBLE) AS value, CAST(t.e AS BIGINT) AS epoch
      |FROM (
      |  SELECT string_split(line, ' ')[1] AS metric, string_split(line, ' ')[2] AS v, string_split(line, ' ')[3] AS e
      |  FROM (SELECT concat('svc.', event_type, '.count ', CAST(round(value,2) AS VARCHAR), ' ',
      |               CAST(CAST(epoch(ts) AS BIGINT) AS VARCHAR)) AS line FROM $EV events) raw
      |) t ORDER BY epoch, metric LIMIT 50""".stripMargin)

  val all: Seq[Query] = buf.toList

  def byId(id: String): Query = all.find(_.id == id).getOrElse(
    throw new NoSuchElementException(s"no inventory query '$id'"))
}
