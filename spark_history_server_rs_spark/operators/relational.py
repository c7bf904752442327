"""Relational operator coverage over the TPC-H-ish testdata tables —
multi-table joins (broadcast dims), semi/anti joins, ROLLUP grouping sets,
gap sessionization, and per-group top-k windows.

The reference engine has no user-table joins at all (SURVEY.md §2.3: three
self-join sites only); a complete analytics engine at 100 TB needs the
full relational surface, so these operators extend §2 with the classic
shapes, each oracle-checked:

- **R1/R2/R3** TPC-H Q1/Q3/Q5-style pipelines: scan → pushed filters →
  joins (small dims broadcast via hints, big fact-fact joins shuffled on
  keys) → grouped aggregation → top-k.
- **R4/R5** EXISTS / NOT EXISTS → Spark plans left-semi / left-anti joins.
- **R6** ROLLUP — grouping-set aggregation (map-side expand).
- **R7** gap sessionization — two windows + re-aggregation, partitioned
  by the session key (no global ordering at any scale).
- **R8** per-group top-k via row_number (per-partition ranking).
- **R9** as-of (point-in-time) join — union both streams + running MAX
  window over a packed (ts, payload) BIGINT: one shuffle on the equi-key,
  no range-join explosion, skew-safe. Spark has no native ASOF JOIN.
- **R10** TPC-H Q6-style pure-scan aggregate (pushed predicates, 2-column
  read schema — the pushdown litmus test).
- **R11** range-join (interval overlap) via sweep-line — +1/-1 deltas +
  running SUM instead of a quadratic BETWEEN join.

Float determinism: every SUM over a float expression snaps the per-row
value to integer cents first (``FLOOR(x*100+0.5)``) — integer-valued
doubles add exactly in IEEE arithmetic, so Spark's partial-aggregation
order cannot flip a bit vs the oracle's sequential sum (the same
invariant sources/generic.py uses).

Both engines run the SAME SQL text (DuckDB ignores ``/*+ ... */`` hints
as comments); only the date-format / epoch spellings differ, injected via
``{DF}``/``{EPOCH}`` placeholders.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.generic import duckdb_events_cte, load_events, load_table

# Engine-specific spellings injected into shared SQL text.
_SPARK_SPELL = {
    "DF": "date_format({x}, 'yyyy-MM-dd')",
    "EPOCH": "unix_millis(CAST({x} AS TIMESTAMP))",
    "SEQ": "explode(sequence({x}))",
}
_DUCK_SPELL = {
    "DF": "strftime({x}, '%Y-%m-%d')",
    "EPOCH": "CAST(epoch_ms({x}) AS BIGINT)",
    "SEQ": "unnest(generate_series({x}))",
}


def _render(template: str, spell: dict[str, str], **kw) -> str:
    out = template
    for key, fmt in spell.items():
        # expand {DF:expr} / {EPOCH:expr} pseudo-calls
        while "{" + key + ":" in out:
            start = out.index("{" + key + ":")
            depth = 0
            for i in range(start, len(out)):
                if out[i] == "{":
                    depth += 1
                elif out[i] == "}":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            inner = out[start + len(key) + 2 : end]
            out = out[:start] + fmt.format(x=inner) + out[end + 1 :]
    return out.format(**kw)


_CENTS = "FLOOR({x} * 100.0 + 0.5)"


def _disc_price() -> str:
    return _CENTS.format(x="l_extendedprice * (1.0 - l_discount)")


# ==========================================================================
# R1 — TPC-H Q1-style pricing summary
# ==========================================================================
R1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM({_CENTS.format(x="l_extendedprice")}) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM({_disc_price()}) AS DOUBLE) / 100.0 AS sum_disc_price,
       CAST(SUM({_CENTS.format(x="l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}) AS DOUBLE) / 100.0
         AS sum_charge,
       FLOOR((CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS avg_qty,
       FLOOR((CAST(SUM({_CENTS.format(x="l_extendedprice")}) AS DOUBLE) / 100.0 / COUNT(*)) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE)
         AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# ==========================================================================
# R2 — TPC-H Q3-style shipping priority (3-way join, broadcast dim)
# ==========================================================================
R2_SQL = f"""
SELECT /*+ BROADCAST(c) */
       l_orderkey,
       CAST(SUM({_disc_price()}) AS DOUBLE) / 100.0 AS revenue,
       {{DF:o_orderdate}} AS order_date,
       o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, {{DF:o_orderdate}}, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

# ==========================================================================
# R3 — TPC-H Q5-style regional revenue (6-way join)
# ==========================================================================
R3_SQL = f"""
SELECT /*+ BROADCAST(n, r) */
       n.n_name AS nation,
       CAST(SUM({_disc_price()}) AS DOUBLE) / 100.0 AS revenue,
       COUNT(*) AS line_count
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""

# ==========================================================================
# R4 / R5 — semi / anti joins via EXISTS
# ==========================================================================
R4_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
LIMIT 200
"""

R5_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
LIMIT 200
"""

# ==========================================================================
# R6 — ROLLUP grouping sets
# ==========================================================================
R6_SQL = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS order_status,
       COALESCE(o_orderpriority, 'ALL') AS order_priority,
       COUNT(*) AS n_orders,
       CAST(SUM({_CENTS.format(x="o_totalprice")}) AS DOUBLE) / 100.0 AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY order_status, order_priority
"""

# ==========================================================================
# R7 — gap sessionization over the events binding
# ==========================================================================
SESSION_GAP_MS = 3600_000  # 1 hour

R7_TAIL = f"""
seq AS (
  SELECT app_id, id, {{EPOCH:event_ts}} AS ts_ms,
         LAG({{EPOCH:event_ts}}) OVER (PARTITION BY app_id ORDER BY {{EPOCH:event_ts}}, id)
           AS prev_ms
  FROM ev
),
marked AS (
  SELECT app_id, id, ts_ms,
         CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS is_new
  FROM seq
),
sessions AS (
  SELECT app_id, id, ts_ms,
         SUM(is_new) OVER (PARTITION BY app_id ORDER BY ts_ms, id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
per_session AS (
  SELECT app_id, session_id, COUNT(*) AS n_events,
         MAX(ts_ms) - MIN(ts_ms) AS duration_ms
  FROM sessions GROUP BY app_id, session_id
)
SELECT app_id,
       COUNT(*) AS n_sessions,
       FLOOR((CAST(SUM(n_events) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE)
         AS avg_events_per_session,
       MAX(duration_ms) AS max_session_ms
FROM per_session
GROUP BY app_id
ORDER BY app_id
"""

# ==========================================================================
# R8 — per-group top-k (slowest tasks per app)
# ==========================================================================
R8_TAIL = """
ranked AS (
  SELECT app_id, task_id, duration_ms,
         ROW_NUMBER() OVER (PARTITION BY app_id
                            ORDER BY duration_ms DESC, task_id) AS rnk
  FROM ev
  WHERE is_task AND duration_ms IS NOT NULL
)
SELECT app_id, task_id,
       -- Spark FLOOR yields BIGINT, DuckDB's yields DOUBLE: unify the type
       CAST(duration_ms AS DOUBLE) AS duration_ms,
       rnk
FROM ranked WHERE rnk <= 3
ORDER BY app_id, rnk
"""


# ==========================================================================
# R9 — as-of join: executor config live at each task's start
# ==========================================================================
# Spark has no native ASOF JOIN; the scalable formulation is union-the-two-
# streams + one running-MAX window partitioned by the equi-key (app_id):
# a single shuffle on app_id, no range-join row explosion, and it survives
# arbitrary skew in either stream. To stay portable across engines without
# LAST_VALUE(... IGNORE NULLS) (whose syntax differs), the (add_ts, cores)
# pair is packed into one BIGINT (cores < 1000 by construction) so the
# running MAX over the time-ordered frame IS the most recent add's pair.
R9_TAIL = """
adds AS (
  SELECT app_id, id, {EPOCH:event_ts} AS ts_ms, 0 AS kind,
         CAST({EPOCH:event_ts} AS BIGINT) * 1000
           + CAST(total_cores AS BIGINT) AS packed,
         CAST(NULL AS BIGINT) AS task_id
  FROM ev WHERE is_exec_add
),
tasks AS (
  SELECT app_id, id, {EPOCH:event_ts} AS ts_ms, 1 AS kind,
         CAST(NULL AS BIGINT) AS packed,
         task_id
  FROM ev WHERE is_task
),
unioned AS (
  SELECT * FROM adds UNION ALL SELECT * FROM tasks
),
filled AS (
  SELECT app_id, id, ts_ms, kind, task_id,
         MAX(packed) OVER (PARTITION BY app_id
                           ORDER BY ts_ms, kind, id
                           ROWS UNBOUNDED PRECEDING) AS asof_packed
  FROM unioned
)
SELECT app_id, task_id, ts_ms,
       CAST(asof_packed % 1000 AS DOUBLE) AS asof_cores,
       -- (p - p%1000)/1000 is exactly integral, so the double division is
       -- bit-exact and the CAST agrees across engines (Spark truncates,
       -- DuckDB rounds — on an exact integer both are identity)
       ts_ms - CAST((asof_packed - asof_packed % 1000) / 1000 AS BIGINT)
         AS staleness_ms
FROM filled
-- inner as-of: drop tasks with no preceding add (keeps output NULL-free,
-- so cross-engine NULL-vs-NaN representation can't enter the value hash)
WHERE kind = 1 AND asof_packed IS NOT NULL
ORDER BY app_id, ts_ms, id
LIMIT 500
"""

# ==========================================================================
# R11 — range-join (interval overlap) via sweep-line: live executors per task
# ==========================================================================
# "How many executor intervals [add_ts, remove_ts] cover each task's ts?"
# The naive range join (tasks JOIN intervals ON ts BETWEEN lo AND hi) has
# no equi-key beyond app_id and explodes quadratically under skew. The
# sweep-line turns it into +1/-1 deltas and a running SUM over the same
# single app_id shuffle as R9 — linear work, any scale.
R11_TAIL = """
pts AS (
  SELECT app_id, id, {EPOCH:event_ts} AS ts_ms,
         CASE WHEN is_exec_add THEN 1 WHEN is_exec_remove THEN -1
              ELSE 0 END AS delta,
         CASE WHEN is_task THEN 1 ELSE 0 END AS kind
  FROM ev WHERE is_exec_add OR is_exec_remove OR is_task
),
swept AS (
  SELECT app_id, kind,
         -- CAST: DuckDB's SUM over integers returns HUGEINT (int128); Spark
         -- returns BIGINT. The driver's value hash is type-sensitive, so pin
         -- both engines to BIGINT in the shared text.
         CAST(SUM(delta) OVER (PARTITION BY app_id
                               ORDER BY ts_ms, kind, id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS live_execs
  FROM pts
)
SELECT app_id,
       COUNT(*) AS n_tasks,
       MIN(live_execs) AS min_live_execs,
       MAX(live_execs) AS max_live_execs,
       FLOOR((CAST(SUM(live_execs) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS avg_live_execs
FROM swept
WHERE kind = 1
GROUP BY app_id
ORDER BY app_id
"""

# ==========================================================================
# R10 — TPC-H Q6-style forecast revenue (pure scan: pushed filters, 2 cols)
# ==========================================================================
R10_SQL = """
SELECT CAST(SUM(FLOOR(l_extendedprice * l_discount * 100.0 + 0.5)) AS DOUBLE)
         / 100.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ==========================================================================
# R12 — TPC-H Q4-style order-priority check (correlated EXISTS)
# ==========================================================================
# Adapted to the testdata columns (no l_commitdate): an order counts when
# at least one of its lines shipped after the order date. Catalyst
# rewrites the correlated EXISTS into a LeftSemi join on o_orderkey.
R12_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# ==========================================================================
# R13 — TPC-H Q13-style customer order-count distribution (outer join)
# ==========================================================================
# The LEFT JOIN keeps customers with zero orders (c_count = 0 bucket) —
# the classic outer-join + double-aggregation shape.
R13_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

# ==========================================================================
# R14 — TPC-H Q18-style large-volume customers (HAVING over join, top-k)
# ==========================================================================
LARGE_ORDER_QTY = 250

R14_SQL = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       {{DF:o.o_orderdate}} AS order_date,
       CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS DOUBLE) / 100.0 AS total_price,
       SUM(l.l_quantity) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, {{DF:o.o_orderdate}}, o.o_totalprice
HAVING SUM(l.l_quantity) > {LARGE_ORDER_QTY}
ORDER BY sum_qty DESC, o_orderkey
LIMIT 100
"""


# ==========================================================================
# R15 — TPC-H Q7-style volume shipping (nation-pair trade flows)
# ==========================================================================
# Two aliases of the SAME dim table (nation) joined at different keys —
# the self-dim pattern Q5 doesn't exercise. Both nation sides broadcast;
# the fact-side joins shuffle on their equi-keys. year() returns INT in
# Spark and BIGINT in DuckDB, so the shared text pins BIGINT.
R15_SQL = f"""
SELECT /*+ BROADCAST(n1, n2) */
       n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_disc_price()}) AS DOUBLE) / 100.0 AS volume,
       COUNT(*) AS n_lines
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS BIGINT)
ORDER BY supp_nation, cust_nation, l_year
"""

# ==========================================================================
# R16 — CUBE grouping sets (completes the ROLLUP coverage of R6)
# ==========================================================================
# CUBE emits all 4 grouping sets — (), (status), (priority), (status,
# priority) — in ONE Expand + one shuffle, where 4 separate GROUP BYs
# would scan the fact table 4 times.
R16_SQL = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS order_status,
       COALESCE(o_orderpriority, 'ALL') AS order_priority,
       COUNT(*) AS n_orders,
       CAST(SUM({_CENTS.format(x="o_totalprice")}) AS DOUBLE) / 100.0 AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY order_status, order_priority
"""


# ==========================================================================
# R17-R28 — the remaining expressible TPC-H shapes, adapted to the testdata
# schema (no partsupp table, no l_commitdate/l_receiptdate/l_shipmode
# columns — the adaptations keep each query's *shape*: the join graph,
# subquery kind, and aggregation pattern the optimizer must plan).
# ==========================================================================

# Portable 6-decimal ratio of two integer-valued aggregates. Snapping the
# already-deterministic double division keeps the driver's value hash
# scale-independent (partial-agg order can't matter: inputs are exact).
def _ratio6(num: str, den: str) -> str:
    return (
        f"CAST(FLOOR(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)"
        f" * CAST(1000000.0 AS DOUBLE) + 0.5) AS DOUBLE)"
        f" / CAST(1000000.0 AS DOUBLE)"
    )


# R17 — Q8 national market share: one nation's slice of a region's yearly
# revenue for one part type. 7-table join; every dim side broadcast-sized,
# the three fact joins shuffle on their equi-keys.
R17_SQL = f"""
WITH region_sales AS (
  SELECT /*+ BROADCAST(p, n1, n2, r, s, c) */
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         {_disc_price()} AS volume_cents,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
)
SELECT o_year,
       {_ratio6("SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume_cents ELSE 0 END)", "SUM(volume_cents)")} AS mkt_share,
       COUNT(*) AS n_lines
FROM region_sales
GROUP BY o_year
ORDER BY o_year
"""

# R18 — Q9 product-type profit by supplier nation and year (profit stands
# in for the partsupp-cost variant: discounted revenue on matching parts).
R18_SQL = f"""
SELECT /*+ BROADCAST(p, s, n) */
       n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_disc_price()}) AS DOUBLE) / 100.0 AS sum_profit,
       COUNT(*) AS n_lines
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, CAST(year(o.o_orderdate) AS BIGINT)
ORDER BY nation, o_year DESC
"""

# R19 — Q10 returned-item reporting: top 20 customers by lost revenue on
# returned lines in a half-year window.
R19_SQL = f"""
SELECT /*+ BROADCAST(n) */
       c.c_custkey, c.c_name,
       CAST(SUM({_disc_price()}) AS DOUBLE) / 100.0 AS revenue,
       CAST(FLOOR(c.c_acctbal * 100.0 + 0.5) AS DOUBLE) / 100.0 AS acctbal,
       n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

# R20 — Q12 shipping-delay priority split (the shipmode column doesn't
# exist; the delay bucket keeps the CASE-pivot-over-join shape). Epoch
# arithmetic instead of datediff(): the argument order of datediff
# differs between engines, millisecond subtraction doesn't.
R20_SQL = """
SELECT CASE WHEN {EPOCH:l.l_shipdate} - {EPOCH:o.o_orderdate} <= 2592000000
            THEN 'fast_ship' ELSE 'slow_ship' END AS ship_bucket,
       -- CAST: DuckDB SUM(int) yields HUGEINT (canonicalized as float by the
       -- harness); Spark yields BIGINT. Pin both engines to BIGINT.
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
       COUNT(*) AS n_lines
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY CASE WHEN {EPOCH:l.l_shipdate} - {EPOCH:o.o_orderdate} <= 2592000000
              THEN 'fast_ship' ELSE 'slow_ship' END
ORDER BY ship_bucket
"""

# R21 — Q14 promotion effect: promo revenue share of a quarter.
R21_SQL = f"""
SELECT /*+ BROADCAST(p) */
       {_ratio6("SUM(CASE WHEN p.p_type = 'PROMO' THEN " + _disc_price() + " ELSE 0 END)", "SUM(" + _disc_price() + ")")} AS promo_share,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""

# R22 — Q15 top supplier: scalar-subquery MAX over a grouped revenue
# relation, equality join-back on exact integer cents.
R22_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_disc_price()}) AS total_rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_rev_cents AS DOUBLE) / 100.0 AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_rev_cents = (SELECT MAX(total_rev_cents) FROM revenue)
ORDER BY s_suppkey
"""

# R23 — Q16 supplier count per part spec; NOT IN plans a null-aware anti
# join (s_suppkey is non-null, so it degenerates to the cheap variant).
R23_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

# R24 — Q17 small-quantity revenue: correlated scalar AVG per part.
# Quantities are integral doubles, so AVG is the same exact division in
# both engines and the < comparison can't straddle an ulp.
R24_SQL = """
SELECT CAST(SUM(FLOOR(l.l_extendedprice * 100.0 + 0.5)) AS DOUBLE)
         / CAST(100.0 AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
"""

# R25 — Q19 bracketed revenue: OR-of-ANDs across the join — the classic
# disjunctive-predicate planning test (no single pushable conjunct).
R25_SQL = f"""
SELECT /*+ BROADCAST(p) */
       CAST(SUM({_disc_price()}) AS DOUBLE) / 100.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1  AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""

# R26 — Q21 waiting-supplier shape: on finished multi-supplier orders,
# count per supplier the lines that shipped strictly last (EXISTS other
# supplier + NOT EXISTS later other-supplier ship — semi + anti join on
# the same fact table).
R26_SQL = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 50
"""

# R27 — Q22 idle high-balance customers: scalar global-average threshold
# (exact cents, so the comparison is engine-stable) + NOT EXISTS recency
# anti join, grouped by nation instead of the missing phone prefix.
R27_SQL = """
SELECT /*+ BROADCAST(n) */
       n.n_name AS nation,
       COUNT(*) AS numcust,
       CAST(SUM(FLOOR(c.c_acctbal * 100.0 + 0.5)) AS DOUBLE)
         / CAST(100.0 AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (SELECT CAST(SUM(FLOOR(c2.c_acctbal * 100.0 + 0.5)) AS DOUBLE)
                            / CAST(100.0 AS DOUBLE) / COUNT(*)
                     FROM customer c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY n.n_name
ORDER BY nation
"""

# R28 — Q2 min-cost-supplier shape (partsupp stands in as the observed
# per-(part, supplier) minimum unit price from lineitem): grouped MIN,
# join-back on the exact snapped cents, region-restricted supplier side.
_UNIT_CENTS = (
    "FLOOR(l.l_extendedprice / l.l_quantity * CAST(100.0 AS DOUBLE) + 0.5)"
)

R28_SQL = f"""
WITH offers AS (
  SELECT /*+ BROADCAST(n, r) */
         l.l_partkey, l.l_suppkey,
         MIN({_UNIT_CENTS}) AS min_unit_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY l.l_partkey, l.l_suppkey
),
best AS (
  SELECT l_partkey, MIN(min_unit_cents) AS best_cents
  FROM offers GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, p.p_brand, s.s_name,
       CAST(o.min_unit_cents AS DOUBLE) / 100.0 AS unit_price
FROM offers o
JOIN best b ON o.l_partkey = b.l_partkey AND o.min_unit_cents = b.best_cents
JOIN part p ON p.p_partkey = o.l_partkey
JOIN supplier s ON s.s_suppkey = o.l_suppkey
WHERE p.p_size <= 15
ORDER BY unit_price, p.p_partkey, s.s_name
LIMIT 100
"""


# ==========================================================================
# R29 — ordered funnel conversion (view → click → purchase)
# ==========================================================================
# Classic product-analytics funnel with *sequential* semantics: a user
# counts for step k only with a step-k event inside the conversion window
# after their qualifying step-(k-1) time (first-touch attribution). Three
# chained per-user MIN aggregations; each f_k is one row per surviving
# user, so the chained joins are tiny-side (broadcast at any corpus
# scale) and the only big scans are the three filtered passes over ev —
# no window over a global ordering, no self-join on the fact table.
FUNNEL_WINDOW_MS = 12 * 3600 * 1000  # per-step conversion window

R29_TAIL = f"""
f1 AS (
  SELECT app_id, MIN({{EPOCH:event_ts}}) AS t1
  FROM ev WHERE event_type = 'view' GROUP BY app_id
),
f2 AS (
  SELECT e.app_id, MIN({{EPOCH:e.event_ts}}) AS t2
  FROM ev e JOIN f1 ON e.app_id = f1.app_id
  WHERE e.event_type = 'click' AND {{EPOCH:e.event_ts}} >= f1.t1
    AND {{EPOCH:e.event_ts}} < f1.t1 + {FUNNEL_WINDOW_MS}
  GROUP BY e.app_id
),
f3 AS (
  SELECT e.app_id, MIN({{EPOCH:e.event_ts}}) AS t3
  FROM ev e JOIN f2 ON e.app_id = f2.app_id
  WHERE e.event_type = 'purchase' AND {{EPOCH:e.event_ts}} >= f2.t2
    AND {{EPOCH:e.event_ts}} < f2.t2 + {FUNNEL_WINDOW_MS}
  GROUP BY e.app_id
),
counts AS (
  SELECT (SELECT COUNT(*) FROM f1) AS n1,
         (SELECT COUNT(*) FROM f2) AS n2,
         (SELECT COUNT(*) FROM f3) AS n3
)
SELECT step, step_event, users,
       FLOOR((CAST(users AS DOUBLE) / NULLIF(n1, 0)) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS conversion_from_top
FROM (
  SELECT 1 AS step, 'view' AS step_event, n1 AS users, n1 FROM counts
  UNION ALL
  SELECT 2, 'click', n2, n1 FROM counts
  UNION ALL
  SELECT 3, 'purchase', n3, n1 FROM counts
) steps
ORDER BY step
"""

# ==========================================================================
# R30 — weekly retention cohorts
# ==========================================================================
# Cohort = the user's first-ever activity week (absolute epoch week —
# deterministic, timezone-free); a cohort member is retained at offset w
# if they have any event in [t0 + w·7d, t0 + (w+1)·7d). One MIN-per-user
# aggregation (shuffle on user), a join back (the firsts side is one row
# per user — co-partitioned on the same key, AQE can plan it shuffle-free),
# then a distinct-count per (cohort, offset). Week arithmetic stays in
# exact integer-valued doubles (epoch ms < 2^53), so both engines bucket
# identically.
R30_TAIL = """
firsts AS (
  SELECT app_id, MIN({EPOCH:event_ts}) AS t0 FROM ev GROUP BY app_id
),
activity AS (
  SELECT e.app_id,
         CAST(FLOOR(CAST(f.t0 AS DOUBLE) / 604800000.0) AS BIGINT)
           AS cohort_week,
         CAST(FLOOR(CAST({EPOCH:e.event_ts} - f.t0 AS DOUBLE) / 604800000.0)
              AS BIGINT) AS week_offset
  FROM ev e JOIN firsts f ON e.app_id = f.app_id
),
cells AS (
  SELECT cohort_week, week_offset, COUNT(DISTINCT app_id) AS active_users
  FROM activity GROUP BY cohort_week, week_offset
),
cohort_sizes AS (
  SELECT cohort_week, active_users AS cohort_size
  FROM cells WHERE week_offset = 0
)
SELECT c.cohort_week, c.week_offset, c.active_users, s.cohort_size,
       FLOOR((CAST(c.active_users AS DOUBLE) / s.cohort_size) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS retention_rate
FROM cells c JOIN cohort_sizes s ON c.cohort_week = s.cohort_week
ORDER BY c.cohort_week, c.week_offset
"""


# ==========================================================================
# R31 — user-journey transition matrix (first-order Markov counts)
# ==========================================================================
# For every consecutive event pair within a user's timeline: transition
# counts and the row-normalized transition probability — the classic
# user-journey / Markov-chain summary. One LAG window PARTITIONED by the
# user key (never a global ordering), then a groupBy on the bounded
# (from, to) event-type domain with map-side partial aggregation; the
# per-from totals join is |event_types| rows → broadcast.
R31_TAIL = """
seq AS (
  SELECT app_id, event_type,
         LAG(event_type) OVER (PARTITION BY app_id
                               ORDER BY {EPOCH:event_ts}, id) AS prev_type
  FROM ev
),
trans AS (
  SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
from_totals AS (
  SELECT from_type, SUM(n) AS row_total FROM trans GROUP BY from_type
)
SELECT t.from_type, t.to_type, t.n,
       FLOOR((CAST(t.n AS DOUBLE) / f.row_total) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS p
FROM trans t JOIN from_totals f ON t.from_type = f.from_type
ORDER BY t.from_type, t.to_type
"""


# ==========================================================================
# R32 — set operations (INTERSECT / EXCEPT segment algebra)
# ==========================================================================
# The reference has NO set operations (SURVEY §2.7 — "None"); a complete
# relational surface needs them. Segment algebra over the app population:
# apps with slow failed tasks ∩ apps that scaled executors ∖ apps with
# very-slow successful tasks. Spark plans INTERSECT as an aggregate +
# left-semi join and EXCEPT as aggregate + left-anti — both hash-keyed on
# app_id, no sort, no cartesian; each leg is a pushed single-predicate
# scan of the fact table.
R32_TAIL = """
slow_failed AS (
  SELECT app_id FROM ev WHERE event_type = 'error' AND duration_ms > 15000
),
scaled AS (SELECT app_id FROM ev WHERE is_exec_add),
long_clicks AS (
  SELECT app_id FROM ev WHERE event_type = 'click' AND duration_ms > 19000
)
SELECT app_id FROM (
  (SELECT app_id FROM slow_failed INTERSECT SELECT app_id FROM scaled)
  EXCEPT
  SELECT app_id FROM long_clicks
)
ORDER BY app_id
"""


# ==========================================================================
# R33 — rolling active users (DAU / trailing-7-day WAU / stickiness)
# ==========================================================================
# The standard engagement time series. Exact trailing-window COUNT
# DISTINCT via the expansion trick: the distinct (user, day) relation
# replicates each row to the 7 days it keeps the user "weekly active"
# for (a broadcast 7-row offsets join — never a range self-join), then
# one distinct-count per day. Two user-keyed exchanges total; day
# arithmetic is exact integer epoch-days so both engines bucket
# identically.
R33_TAIL = """
daily AS (
  SELECT DISTINCT app_id,
         CAST(FLOOR(CAST({EPOCH:event_ts} AS DOUBLE) / 86400000.0) AS BIGINT)
           AS day
  FROM ev
),
offsets AS (SELECT off FROM (VALUES (0), (1), (2), (3), (4), (5), (6)) AS t(off)),
expanded AS (
  SELECT d.app_id, d.day + o.off AS day
  FROM daily d JOIN offsets o ON 1 = 1
),
wau AS (SELECT day, COUNT(DISTINCT app_id) AS wau FROM expanded GROUP BY day),
dau AS (SELECT day, COUNT(*) AS dau FROM daily GROUP BY day)
SELECT d.day AS epoch_day, d.dau, w.wau,
       FLOOR((CAST(d.dau AS DOUBLE) / w.wau) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS stickiness
FROM dau d JOIN wau w ON d.day = w.day
ORDER BY epoch_day
"""


# ==========================================================================
# R34 — table profiler (per-column statistics, DESCRIBE-on-steroids)
# ==========================================================================
# The profiling surface every warehouse engine ships: one row per column
# with row/null/distinct counts and typed min/max (numeric columns fill
# min_num/max_num, string columns min_str/max_str, timestamps as epoch
# millis). One UNION ALL branch per column — each is a single-pass
# aggregate with map-side partial combine; Spark scans the parquet once
# per branch with only that column in the read schema (column pruning),
# which at 100 TB is exactly the per-column scan a profiler wants.
# ``__STRT__`` is substituted (STRING/VARCHAR) before spell rendering.
def _profile_branch(col: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(MIN({col}) AS DOUBLE)"
        mx = f"CAST(MAX({col}) AS DOUBLE)"
        ms = me = "CAST(NULL AS __STRT__)"
    elif kind == "ts":
        mn = f"CAST({{EPOCH:MIN({col})}} AS DOUBLE)"
        mx = f"CAST({{EPOCH:MAX({col})}} AS DOUBLE)"
        ms = me = "CAST(NULL AS __STRT__)"
    else:
        mn = mx = "CAST(NULL AS DOUBLE)"
        ms = f"MIN({col})"
        me = f"MAX({col})"
    return f"""
SELECT '{col}' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {col}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num,
       {ms} AS min_str, {me} AS max_str
FROM orders"""


R34_SQL = (
    "SELECT * FROM ("
    + "\nUNION ALL".join(
        _profile_branch(c, k)
        for c, k in [
            ("o_orderkey", "num"),
            ("o_custkey", "num"),
            ("o_orderstatus", "str"),
            ("o_totalprice", "num"),
            ("o_orderdate", "ts"),
            ("o_orderpriority", "str"),
        ]
    )
    + "\n) ORDER BY column_name"
)


# ==========================================================================
# R35 — analytic-window showcase (PERCENT_RANK / CUME_DIST / NTILE)
# ==========================================================================
# The remaining ranking-window surface, all PARTITIONED by the app key
# (never a global window): per-task percentile standing among its app's
# tasks. The (duration_ms, task_id) ordering is total within each
# partition, so rank-derived values are deterministic in both engines;
# percent_rank's (rank-1)/(n-1) division is exact-input IEEE and snaps
# to 4 dp.
R35_TAIL = """
ranked AS (
  -- explicit BIGINT: the binding's FLOOR() yields BIGINT in Spark but
  -- DOUBLE in DuckDB; aggregated queries re-snap anyway, a raw
  -- projection must pin the type itself
  SELECT app_id, task_id, CAST(duration_ms AS BIGINT) AS duration_ms,
         FLOOR(PERCENT_RANK() OVER w * 10000.0 + 0.5)
           / CAST(10000.0 AS DOUBLE) AS pct_rank,
         FLOOR(CUME_DIST() OVER w * 10000.0 + 0.5)
           / CAST(10000.0 AS DOUBLE) AS cume_dist,
         NTILE(4) OVER w AS quartile
  FROM ev WHERE is_task
  WINDOW w AS (PARTITION BY app_id ORDER BY duration_ms, task_id)
)
SELECT app_id, task_id, duration_ms, pct_rank, cume_dist, quartile
FROM ranked
ORDER BY app_id, duration_ms, task_id
"""


# ==========================================================================
# R36 — calendar gap-filling (dense time series from sparse observations)
# ==========================================================================
# Time-series reporting needs every day present even when nothing
# happened: generate the full day range from the observed span
# ({SEQ:} — Spark explode(sequence), DuckDB unnest(generate_series)) and
# LEFT-join the sparse daily counts, zero-filling the gaps. The span
# aggregate is a scalar, the generated calendar is #days rows
# (broadcast), the daily agg is the only fact-table pass — textbook
# dimension-densification at any scale.
R36_TAIL = """
sparse AS (
  SELECT CAST(FLOOR(CAST({EPOCH:event_ts} AS DOUBLE) / 86400000.0) AS BIGINT)
           AS day
  FROM ev WHERE event_type = 'error' AND duration_ms > 19500
),
daily AS (SELECT day, COUNT(*) AS n FROM sparse GROUP BY day),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM sparse),
days AS (SELECT {SEQ:s.d0, s.d1} AS day FROM span s)
SELECT d.day AS epoch_day, COALESCE(x.n, 0) AS n_events,
       (x.day IS NULL) AS is_gap
FROM days d LEFT JOIN daily x ON x.day = d.day
ORDER BY epoch_day
"""


# ==========================================================================
# R38 — daily event-volume anomaly detection (z-score spike/drop flags)
# ==========================================================================
# The ops-dashboard staple: per-day event counts scored against the
# corpus-wide mean/std. Variance comes from integer SUM(n)/SUM(n*n)
# accumulators (exact in any aggregation order — the engine-parity rule
# every stats op here follows); z is snapped to 4 dp and flagged at
# |z| >= 2. The scalar stats row broadcasts into the per-day join; no
# window function at all, so nothing single-partitions at any scale.
R38_TAIL = """
daily AS (
  SELECT CAST(FLOOR(CAST({EPOCH:event_ts} AS DOUBLE) / 86400000.0) AS BIGINT)
           AS day,
         COUNT(*) AS n
  FROM ev GROUP BY 1
),
stats AS (
  -- s2 accumulates in DECIMAL(38,0): a single n*n term fits BIGINT up
  -- to ~3e9 events/day, but a multi-year SUM of squares overflows it at
  -- high volume; decimal-38 headroom is unreachable and stays exact in
  -- both engines (the result is only read back as DOUBLE for the
  -- variance, where the leading digits are all that matter).
  SELECT COUNT(*) AS n_days,
         CAST(COALESCE(SUM(n), 0) AS BIGINT) AS s1,
         -- multiply IN decimal (operand cast): n*n computed in BIGINT
         -- first would overflow before the cast ever ran
         COALESCE(SUM(CAST(n AS DECIMAL(19, 0)) * CAST(n AS DECIMAL(19, 0))),
                  CAST(0 AS DECIMAL(38, 0))) AS s2
  FROM daily
),
scored AS (
  SELECT d.day, d.n,
         FLOOR((CAST(s.s1 AS DOUBLE) / s.n_days) * 10000.0 + 0.5)
           / CAST(10000.0 AS DOUBLE) AS mean_events,
         CASE WHEN s.n_days < 2
                OR (CAST(s.s2 AS DOUBLE) / s.n_days)
                   - (CAST(s.s1 AS DOUBLE) / s.n_days)
                     * (CAST(s.s1 AS DOUBLE) / s.n_days) <= 0.0
              THEN CAST(0.0 AS DOUBLE)
              ELSE FLOOR(((d.n - CAST(s.s1 AS DOUBLE) / s.n_days)
                          / sqrt((CAST(s.s2 AS DOUBLE) / s.n_days)
                                 - (CAST(s.s1 AS DOUBLE) / s.n_days)
                                   * (CAST(s.s1 AS DOUBLE) / s.n_days)))
                         * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE)
         END AS z_score
  FROM daily d CROSS JOIN stats s
)
SELECT day AS epoch_day, n AS n_events, mean_events, z_score,
       (z_score >= 2.0 OR z_score <= -2.0) AS is_anomaly
FROM scored
ORDER BY epoch_day
"""


# ==========================================================================
# R39 — EWMA event-volume smoothing + next-day forecast
# ==========================================================================
#: classic exponentially-weighted moving average over the daily volume
#: relation (normalized form: ewma_t = sum w_j x_j / sum w_j with
#: w_j = (1-alpha)^(t-j)). The decay powers are snapped to integer
#: micro-weights BEFORE the weighted sums, so both engines accumulate
#: exact integers — pow() last-ulp differences cannot leak into the
#: result. The day-pair join is over the calendar-bounded daily
#: relation (O(days^2) on single-digit-thousands rows at any corpus
#: size) — the scale-legal place for quadratic work.
EWMA_ALPHA = 0.3

R39_TAIL = """
daily AS (
  SELECT CAST(FLOOR(CAST({EPOCH:event_ts} AS DOUBLE) / 86400000.0) AS BIGINT)
           AS day,
         COUNT(*) AS n
  FROM ev GROUP BY 1
),
pairs AS (
  SELECT t.day, t.n,
         CAST(FLOOR(power(1.0 - """ + str(EWMA_ALPHA) + """, t.day - j.day)
                    * 1000000.0 + 0.5) AS BIGINT) AS w_micro,
         j.n AS xj
  FROM daily t JOIN daily j ON j.day <= t.day
),
smoothed AS (
  SELECT day, MIN(n) AS n_events,
         CAST(SUM(w_micro * xj) AS BIGINT) AS wx,
         CAST(SUM(w_micro) AS BIGINT) AS wsum
  FROM pairs GROUP BY day
)
SELECT day AS epoch_day, n_events,
       FLOOR((CAST(wx AS DOUBLE) / wsum) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS ewma,
       FLOOR((n_events - CAST(wx AS DOUBLE) / wsum) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS residual
FROM smoothed
ORDER BY epoch_day
"""


# ==========================================================================
# R37 — year-over-year revenue growth (time intelligence over TPC-H)
# ==========================================================================
# The standard period-over-period comparison: yearly revenue (exact
# integer cents), previous year via LAG, growth ratio snapped to 4 dp.
# The unpartitioned LAG window runs over the YEARLY aggregate — a
# relation bounded by the calendar (single-digit rows at any corpus
# size), which is the one place a global window is scale-legal.
R37_SQL = """
WITH yearly AS (
  SELECT year(l_shipdate) AS yr,
         SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5))
           AS rev_cents
  FROM lineitem
  GROUP BY year(l_shipdate)
)
SELECT yr,
       CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
       CAST(LAG(rev_cents) OVER (ORDER BY yr) AS DOUBLE) / 100.0
         AS prev_revenue,
       FLOOR((CAST(rev_cents - LAG(rev_cents) OVER (ORDER BY yr) AS DOUBLE)
              / LAG(rev_cents) OVER (ORDER BY yr)) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS yoy_growth
FROM yearly
ORDER BY yr
"""


# --------------------------------------------------------------------------
# wiring
# --------------------------------------------------------------------------
_TPCH_TABLES = (
    "customer", "orders", "lineitem", "supplier", "nation", "region", "part",
)


def _tpch_query(sql_template: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        import re
        from contextlib import ExitStack

        from ..functions.views import scoped_temp_view

        # per-call scoped views (not the plain table names): two
        # pipelines over DIFFERENT sf_dirs on one session would
        # otherwise cross-register `lineitem` etc. The shared SQL text
        # keeps the canonical names (the DuckDB oracle runs it
        # verbatim); this Spark runner prepends a CTE prologue binding
        # each canonical name to its scoped view — CTE names shadow
        # catalog names at resolution, and nothing in the query body is
        # rewritten (a token rewrite would also hit same-named column
        # aliases like `... AS nation`).
        sql = _render(sql_template, _SPARK_SPELL)
        with ExitStack() as stack:
            prolog = ",\n".join(
                "{t} AS (SELECT * FROM {v})".format(
                    t=t,
                    v=stack.enter_context(
                        scoped_temp_view(
                            load_table(spark, sf_dir, t), f"_rel_{t}"
                        )
                    ),
                )
                for t in _TPCH_TABLES
            )
            if re.match(r"^\s*WITH\b", sql, re.IGNORECASE):
                sql = re.sub(
                    r"^\s*WITH\b", "WITH " + prolog + ",", sql,
                    count=1, flags=re.IGNORECASE,
                )
            else:
                sql = "WITH " + prolog + "\n" + sql
            return spark.sql(sql)

    return run


def _events_query(tail: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..functions.views import scoped_temp_view

        with scoped_temp_view(load_events(spark, sf_dir), "_rel_ev") as v:
            return spark.sql(
                f"WITH ev AS (SELECT * FROM {v}),\n"
                + _render(tail, _SPARK_SPELL)
            )

    return run


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tpch_q1_pricing_summary": _tpch_query(R1_SQL),
    "tpch_q3_shipping_priority": _tpch_query(R2_SQL),
    "tpch_q5_regional_revenue": _tpch_query(R3_SQL),
    "semi_join_urgent_customers": _tpch_query(R4_SQL),
    "anti_join_no_urgent_customers": _tpch_query(R5_SQL),
    "rollup_order_stats": _tpch_query(R6_SQL),
    "sessionize_events": _events_query(R7_TAIL),
    "topk_tasks_per_app": _events_query(R8_TAIL),
    "asof_join_task_executor_config": _events_query(R9_TAIL),
    "range_join_live_executors": _events_query(R11_TAIL),
    "tpch_q6_forecast_revenue": _tpch_query(R10_SQL),
    "tpch_q4_priority_check": _tpch_query(R12_SQL),
    "tpch_q13_order_distribution": _tpch_query(R13_SQL),
    "tpch_q18_large_orders": _tpch_query(R14_SQL),
    "tpch_q7_volume_shipping": _tpch_query(R15_SQL),
    "cube_order_stats": _tpch_query(R16_SQL),
    "tpch_q8_market_share": _tpch_query(R17_SQL),
    "tpch_q9_product_profit": _tpch_query(R18_SQL),
    "tpch_q10_returned_items": _tpch_query(R19_SQL),
    "tpch_q12_ship_delay": _tpch_query(R20_SQL),
    "tpch_q14_promo_effect": _tpch_query(R21_SQL),
    "tpch_q15_top_supplier": _tpch_query(R22_SQL),
    "tpch_q16_supplier_count": _tpch_query(R23_SQL),
    "tpch_q17_small_qty_revenue": _tpch_query(R24_SQL),
    "tpch_q19_bracketed_revenue": _tpch_query(R25_SQL),
    "tpch_q21_waiting_supplier": _tpch_query(R26_SQL),
    "tpch_q22_idle_customers": _tpch_query(R27_SQL),
    "tpch_q2_min_price_supplier": _tpch_query(R28_SQL),
    "funnel_conversion": _events_query(R29_TAIL),
    "retention_cohorts": _events_query(R30_TAIL),
    "event_transition_matrix": _events_query(R31_TAIL),
    "set_ops_user_segments": _events_query(R32_TAIL),
    "rolling_active_users": _events_query(R33_TAIL),
    "table_profile_orders": _tpch_query(R34_SQL.replace("__STRT__", "STRING")),
    "task_percentile_standing": _events_query(R35_TAIL),
    "events_daily_gapfill": _events_query(R36_TAIL),
    "yoy_revenue_growth": _tpch_query(R37_SQL),
    "events_daily_anomaly": _events_query(R38_TAIL),
    "events_volume_ewma": _events_query(R39_TAIL),
}


#: events-SQL analytics shapes addressable by name against a live
#: normalized events DataFrame (the API serving path)
EVENTS_TAILS: dict[str, str] = {
    "funnel_conversion": R29_TAIL,
    "retention_cohorts": R30_TAIL,
    "event_transition_matrix": R31_TAIL,
    "set_ops_user_segments": R32_TAIL,
    "rolling_active_users": R33_TAIL,
    "task_percentile_standing": R35_TAIL,
    "events_daily_gapfill": R36_TAIL,
    "events_daily_anomaly": R38_TAIL,
    "events_volume_ewma": R39_TAIL,
}


# --------------------------------------------------------------------------
# R33b — sketch-path active users (the 100 TB DAU/WAU)
# --------------------------------------------------------------------------
#: log2(k) for the DAU/WAU HLL sketches (lgk=12 → ~1.6 % RSE), matching
#: the novelty sketch tier
ACTIVE_USERS_HLL_LGK = 12


def rolling_active_users_approx(ev: DataFrame) -> DataFrame:
    """R33b: the 100 TB path for R33 — DAU/WAU/stickiness from
    mergeable per-day HLL sketches (``hll_sketch_agg`` /
    ``hll_union_agg``) instead of exact distinct folds. ONE pass over
    events builds a #days-row sketch relation (map-side partial
    sketches — no shuffle ever carries an app id, where R33 moves every
    distinct (app, day) pair through the dedup exchange AND expands it
    7×); DAU estimates read each day's sketch, WAU unions the 7
    trailing sketches per day — sketch algebra over a days-sized
    relation. Estimates carry ~1.6 % relative error at lgk={lgk} —
    pytest-pinned against the exact twin (sketch estimates are
    algorithm-specific, so no DuckDB oracle twin can exist and this op
    is deliberately NOT in the oracle registry).

    Columns mirror R33 with an ``_est`` suffix.""".format(
        lgk=ACTIVE_USERS_HLL_LGK
    )
    from ..functions.views import scoped_temp_view

    with scoped_temp_view(ev, "_rel_ev_hll") as view:
        return ev.sparkSession.sql(f"""
WITH days AS (
  SELECT CAST(FLOOR(CAST(unix_millis(CAST(event_ts AS TIMESTAMP))
                         AS DOUBLE) / 86400000.0) AS BIGINT) AS day,
         app_id
  FROM {view}
),
sk AS (
  SELECT day, hll_sketch_agg(app_id, {ACTIVE_USERS_HLL_LGK}) AS sk
  FROM days GROUP BY day
),
offsets AS (SELECT off
            FROM (VALUES (0), (1), (2), (3), (4), (5), (6)) AS t(off)),
expanded AS (
  SELECT s.day + o.off AS day, s.sk FROM sk s JOIN offsets o ON 1 = 1
),
wau AS (
  SELECT day, CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)
           AS wau_est
  FROM expanded GROUP BY day
),
dau AS (
  SELECT day, CAST(hll_sketch_estimate(sk) AS BIGINT) AS dau_est FROM sk
)
SELECT d.day AS epoch_day, d.dau_est, w.wau_est,
       FLOOR((CAST(d.dau_est AS DOUBLE) / w.wau_est) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS stickiness_est
FROM dau d JOIN wau w ON d.day = w.day
ORDER BY epoch_day
""")


def run_events_tail(ev: DataFrame, name: str) -> DataFrame:
    """Run a registered events-SQL analytics shape against an
    already-normalized events DataFrame — the REST serving path (no
    parquet re-scan; the server's warm events frame feeds the CTE).

    The temp view is per-call unique and dropped before returning: the
    server handles requests on a ThreadingHTTPServer over ONE shared
    SparkSession, so a fixed view name would race between two
    concurrent requests with different date/app filters — one request
    silently serving rows computed from the other's filtered frame.
    Drop-after-analysis safety lives in
    :func:`..functions.views.scoped_temp_view`."""
    from ..functions.views import scoped_temp_view

    with scoped_temp_view(ev, "_rel_ev_live") as view:
        return ev.sparkSession.sql(
            f"WITH ev AS (SELECT * FROM {view}),\n"
            + _render(EVENTS_TAILS[name], _SPARK_SPELL)
        )


def _duck(sql_template: str) -> str:
    return _render(sql_template, _DUCK_SPELL)


ORACLE_SQL_RELATIONAL: dict[str, str] = {
    "tpch_q1_pricing_summary": _duck(R1_SQL),
    "tpch_q3_shipping_priority": _duck(R2_SQL),
    "tpch_q5_regional_revenue": _duck(R3_SQL),
    "semi_join_urgent_customers": _duck(R4_SQL),
    "anti_join_no_urgent_customers": _duck(R5_SQL),
    "rollup_order_stats": _duck(R6_SQL),
    "sessionize_events": duckdb_events_cte() + ",\n" + _duck(R7_TAIL),
    "topk_tasks_per_app": duckdb_events_cte() + ",\n" + _duck(R8_TAIL),
    "asof_join_task_executor_config": duckdb_events_cte() + ",\n" + _duck(R9_TAIL),
    "range_join_live_executors": duckdb_events_cte() + ",\n" + _duck(R11_TAIL),
    "tpch_q6_forecast_revenue": _duck(R10_SQL),
    "tpch_q4_priority_check": _duck(R12_SQL),
    "tpch_q13_order_distribution": _duck(R13_SQL),
    "tpch_q18_large_orders": _duck(R14_SQL),
    "tpch_q7_volume_shipping": _duck(R15_SQL),
    "cube_order_stats": _duck(R16_SQL),
    "tpch_q8_market_share": _duck(R17_SQL),
    "tpch_q9_product_profit": _duck(R18_SQL),
    "tpch_q10_returned_items": _duck(R19_SQL),
    "tpch_q12_ship_delay": _duck(R20_SQL),
    "tpch_q14_promo_effect": _duck(R21_SQL),
    "tpch_q15_top_supplier": _duck(R22_SQL),
    "tpch_q16_supplier_count": _duck(R23_SQL),
    "tpch_q17_small_qty_revenue": _duck(R24_SQL),
    "tpch_q19_bracketed_revenue": _duck(R25_SQL),
    "tpch_q21_waiting_supplier": _duck(R26_SQL),
    "tpch_q22_idle_customers": _duck(R27_SQL),
    "tpch_q2_min_price_supplier": _duck(R28_SQL),
    "funnel_conversion": duckdb_events_cte() + ",\n" + _duck(R29_TAIL),
    "retention_cohorts": duckdb_events_cte() + ",\n" + _duck(R30_TAIL),
    "event_transition_matrix": duckdb_events_cte() + ",\n" + _duck(R31_TAIL),
    "set_ops_user_segments": duckdb_events_cte() + ",\n" + _duck(R32_TAIL),
    "rolling_active_users": duckdb_events_cte() + ",\n" + _duck(R33_TAIL),
    "table_profile_orders": _duck(R34_SQL.replace("__STRT__", "VARCHAR")),
    "task_percentile_standing": duckdb_events_cte() + ",\n" + _duck(R35_TAIL),
    "events_daily_gapfill": duckdb_events_cte() + ",\n" + _duck(R36_TAIL),
    "yoy_revenue_growth": _duck(R37_SQL),
    "events_daily_anomaly": duckdb_events_cte() + ",\n" + _duck(R38_TAIL),
    "events_volume_ewma": duckdb_events_cte() + ",\n" + _duck(R39_TAIL),
}
