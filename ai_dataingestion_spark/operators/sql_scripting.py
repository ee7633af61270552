"""§2.V round-13 block: Spark 4.0 SQL scripting (SPARK-48338 / SQL:2023
PSM) — BEGIN…END compound statements with DECLARE / SET / IF / WHILE /
REPEAT / FOR cursors / condition handlers / EXECUTE IMMEDIATE.

SQL scripting is the stored-procedure-shaped control-flow surface of
Spark 4: a script is a driver-side program whose *statements* are ordinary
distributed queries. That split is the whole scale story here and every
docstring below restates it concretely:

- **Control flow runs on the driver, data flow runs on the cluster.** A
  DECLAREd variable is a driver-side scalar; each EXECUTE IMMEDIATE / body
  statement compiles through Catalyst like any standalone query (predicate
  pushdown, partial aggregation, broadcast selection all apply — the
  script adds zero execution surface of its own).
- **Iteration counts must be bounded constants, never data-sized.** Every
  loop below iterates over a fixed dimension (7 order years, 5 regions,
  ≤20 threshold doublings) so the number of driver→cluster round-trips is
  O(1) in corpus size: at 100 TB the per-statement work grows, the number
  of statements does not. A loop whose trip count scaled with rows would
  be the collect()-driven anti-pattern in disguise, and none of these do
  it.
- **Each loop-body statement is aggregate-shaped** (COUNT/SUM into a
  scalar variable), so what crosses back to the driver per iteration is
  one row, not data.

Correctness contract: scripting has no DuckDB twin, so each oracle is the
*equivalent set-based classic SQL* — the WHILE accumulation is a GROUP BY,
the FOR cursor is a correlated subquery + string_agg, the REPEAT search is
a recursive CTE, the handler fallback is the fallback branch itself. That
an imperative script and a set-based statement agree value-for-value is
exactly the property that makes script migration onto Spark safe.

Dialect notes pinned by these oracles:
- money sums cross engines as integer cents (`CAST(round(sum(x) * 100) AS
  BIGINT)`) so the driver hash never rides on float summation order
  (SURVEY.md §5.4);
- nullable group-key strings are coalesced to the same placeholder on both
  sides before concatenation (the nulls tier holds a NULL r_name — bare
  `||` would NULL-poison the whole accumulated summary on the Spark side
  while DuckDB's string_agg silently skips NULL terms);
- the scripting conf is runtime-enabled per call (the driver's session is
  built without it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import register_views


def _script_op(name: str, script: str, oracle: str, doc: str):
    """Register a SQL-scripting operator: Spark executes the BEGIN…END
    script (last result statement is the returned DataFrame), DuckDB runs
    the equivalent set-based classic SQL."""

    def _fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Save/restore the session conf (ADVICE r13): scripting is parsed
        # eagerly by spark.sql(), so restoring immediately after return is
        # safe — later operators must not silently inherit the flag.
        prior = spark.conf.get("spark.sql.scripting.enabled", None)
        spark.conf.set("spark.sql.scripting.enabled", "true")
        try:
            register_views(spark, sf_dir)
            return spark.sql(script)
        finally:
            if prior is None:
                spark.conf.unset("spark.sql.scripting.enabled")
            else:
                spark.conf.set("spark.sql.scripting.enabled", prior)

    _fn.__name__ = name
    _fn.__doc__ = doc
    return register(name, oracle=oracle, doc=doc)(_fn)


# ---------------------------------------------------------------------------
# sql_script_while_accumulate — WHILE loop over the 7 order years
# ---------------------------------------------------------------------------

_script_op(
    "sql_script_while_accumulate",
    script="""
BEGIN
  DECLARE y INT DEFAULT 1992;
  DECLARE n BIGINT;
  DECLARE cents BIGINT;
  DECLARE n_total BIGINT DEFAULT 0;
  DECLARE cents_total BIGINT DEFAULT 0;
  DECLARE years_nonempty INT DEFAULT 0;
  WHILE y <= 1998 DO
    EXECUTE IMMEDIATE
      'SELECT count(*),
              coalesce(CAST(round(sum(o_totalprice) * 100) AS BIGINT), 0)
       FROM orders WHERE year(o_orderdate) = ?'
      INTO n, cents USING y;
    SET n_total = n_total + n;
    SET cents_total = cents_total + cents;
    IF n > 0 THEN
      SET years_nonempty = years_nonempty + 1;
    END IF;
    SET y = y + 1;
  END WHILE;
  SELECT n_total AS n_orders,
         cents_total AS sum_price_cents,
         CAST(years_nonempty AS BIGINT) AS years_nonempty;
END
""",
    oracle="""
WITH per_y AS (
  SELECT year(o_orderdate) AS y, count(*) AS n,
         coalesce(CAST(round(sum(o_totalprice) * 100) AS BIGINT), 0) AS cents
  FROM orders
  WHERE year(o_orderdate) BETWEEN 1992 AND 1998
  GROUP BY year(o_orderdate)
)
SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_orders,
       CAST(coalesce(sum(cents), 0) AS BIGINT) AS sum_price_cents,
       CAST(count(*) FILTER (WHERE n > 0) AS BIGINT) AS years_nonempty
FROM per_y
""",
    doc="""WHILE / EXECUTE IMMEDIATE…INTO…USING accumulation over the 7
    order years (1992-1998): per-iteration a parameterized COUNT + SUM
    compiles to a pushed-down year predicate + partial aggregate returning
    ONE row to the driver; BIGINT driver-side accumulators fold the years.
    Oracle = the set-based GROUP BY the loop is equivalent to. Trip count
    is the year-dimension constant (7), never data-sized — at 100 TB the
    cost is 7 scan-pruned aggregates, zero extra driver round-trips. Money
    crosses engines as integer cents (§5.4: no float summation-order
    hazard in the accumulator).""",
)


# ---------------------------------------------------------------------------
# sql_script_for_cursor_rollup — FOR cursor over region, correlated counts
# ---------------------------------------------------------------------------

_script_op(
    "sql_script_for_cursor_rollup",
    script="""
BEGIN
  DECLARE n_regions BIGINT DEFAULT 0;
  DECLARE nations_total BIGINT DEFAULT 0;
  DECLARE cnt BIGINT;
  DECLARE summary STRING DEFAULT '';
  FOR r AS SELECT r_regionkey, coalesce(r_name, '(null)') AS rname
           FROM region ORDER BY r_regionkey DO
    EXECUTE IMMEDIATE 'SELECT count(*) FROM nation WHERE n_regionkey = ?'
      INTO cnt USING r.r_regionkey;
    SET n_regions = n_regions + 1;
    SET nations_total = nations_total + cnt;
    SET summary = CASE WHEN summary = ''
                       THEN r.rname || ':' || CAST(cnt AS STRING)
                       ELSE summary || ',' || r.rname || ':'
                            || CAST(cnt AS STRING) END;
  END FOR;
  SELECT n_regions AS n_regions,
         nations_total AS nations_total,
         summary AS region_summary;
END
""",
    oracle="""
WITH per_r AS (
  SELECT r.r_regionkey, coalesce(r.r_name, '(null)') AS rname,
         (SELECT count(*) FROM nation n
          WHERE n.n_regionkey = r.r_regionkey) AS cnt
  FROM region r
)
SELECT CAST(count(*) AS BIGINT) AS n_regions,
       CAST(coalesce(sum(cnt), 0) AS BIGINT) AS nations_total,
       coalesce(string_agg(rname || ':' || CAST(cnt AS VARCHAR),
                           ',' ORDER BY r_regionkey), '') AS region_summary
FROM per_r
""",
    doc="""FOR cursor over the region dimension (ORDER BY r_regionkey) with
    a correlated per-region nation count via parameterized EXECUTE
    IMMEDIATE, accumulating a deterministic 'name:count' summary string in
    cursor order. Oracle = correlated scalar subquery + ordered
    string_agg. The cursor iterates a DIMENSION table (5 rows at every
    SF) — cursoring a fact table would be the row-at-a-time anti-pattern;
    cursoring a dimension is 5 broadcast-sized lookups. r_name is
    coalesced to '(null)' on BOTH sides: the nulls tier NULLs one region
    name, bare || would NULL-poison the whole Spark-side accumulator while
    DuckDB's string_agg drops NULL terms — an asymmetry this op pins
    closed.""",
)


# ---------------------------------------------------------------------------
# sql_script_if_elseif_branch — data-dependent IF/ELSEIF/ELSE dispatch
# ---------------------------------------------------------------------------

_script_op(
    "sql_script_if_elseif_branch",
    script="""
BEGIN
  DECLARE n_hi BIGINT;
  EXECUTE IMMEDIATE
    'SELECT count(*) FROM customer WHERE c_acctbal > 5000' INTO n_hi;
  IF n_hi >= 100 THEN
    SELECT 'high' AS branch,
           CAST(count(*) AS BIGINT) AS n_cust,
           coalesce(round(avg(c_acctbal), 2), 0.0) AS avg_bal
    FROM customer WHERE c_acctbal > 5000;
  ELSEIF n_hi >= 1 THEN
    SELECT 'mid' AS branch,
           CAST(count(*) AS BIGINT) AS n_cust,
           coalesce(round(avg(c_acctbal), 2), 0.0) AS avg_bal
    FROM customer;
  ELSE
    SELECT 'none' AS branch, CAST(0 AS BIGINT) AS n_cust, 0.0 AS avg_bal;
  END IF;
END
""",
    oracle="""
WITH m AS (SELECT count(*) AS n_hi FROM customer WHERE c_acctbal > 5000),
hi AS (SELECT count(*) AS n, coalesce(round(avg(c_acctbal), 2), 0.0) AS a
       FROM customer WHERE c_acctbal > 5000),
allc AS (SELECT count(*) AS n, coalesce(round(avg(c_acctbal), 2), 0.0) AS a
         FROM customer)
SELECT CASE WHEN m.n_hi >= 100 THEN 'high'
            WHEN m.n_hi >= 1 THEN 'mid' ELSE 'none' END AS branch,
       CAST(CASE WHEN m.n_hi >= 100 THEN hi.n
                 WHEN m.n_hi >= 1 THEN allc.n ELSE 0 END AS BIGINT) AS n_cust,
       CASE WHEN m.n_hi >= 100 THEN hi.a
            WHEN m.n_hi >= 1 THEN allc.a ELSE 0.0 END AS avg_bal
FROM m, hi, allc
""",
    doc="""Data-dependent IF/ELSEIF/ELSE dispatch: a probe aggregate
    (high-balance customer count) picks which rollup statement runs — the
    'promote the big segment, else fall back to the full relation, else
    emit a typed empty row' shape of a conditional pipeline step. Only the
    taken branch executes on the cluster (the untaken rollup costs
    nothing — the script, unlike the oracle's CASE-over-all-branches
    rewrite, never materializes it). All three branches share one typed
    schema (STRING, BIGINT, DOUBLE), which is what makes the dispatch a
    stable operator rather than a shape change downstream consumers must
    handle.""",
)


# ---------------------------------------------------------------------------
# sql_script_repeat_until_search — REPEAT/UNTIL exponential threshold search
# ---------------------------------------------------------------------------

_script_op(
    "sql_script_repeat_until_search",
    script="""
BEGIN
  DECLARE cutoff DOUBLE DEFAULT 1000.0;
  DECLARE n BIGINT DEFAULT -1;
  DECLARE iters INT DEFAULT 0;
  REPEAT
    SET cutoff = cutoff * 2;
    SET iters = iters + 1;
    EXECUTE IMMEDIATE
      'SELECT count(*) FROM orders WHERE o_totalprice > ?'
      INTO n USING cutoff;
  UNTIL n <= 100 OR iters >= 20 END REPEAT;
  SELECT round(cutoff, 1) AS cutoff,
         n AS n_above,
         CAST(iters AS BIGINT) AS iters;
END
""",
    oracle="""
WITH RECURSIVE s(iters, cutoff, n) AS (
  SELECT 1, CAST(2000.0 AS DOUBLE),
         (SELECT count(*) FROM orders WHERE o_totalprice > 2000.0)
  UNION ALL
  SELECT s.iters + 1, s.cutoff * 2,
         (SELECT count(*) FROM orders o
          WHERE o.o_totalprice > s.cutoff * 2)
  FROM s WHERE s.n > 100 AND s.iters < 20
)
SELECT round(cutoff, 1) AS cutoff, CAST(n AS BIGINT) AS n_above,
       CAST(iters AS BIGINT) AS iters
FROM s ORDER BY iters DESC LIMIT 1
""",
    doc="""REPEAT/UNTIL exponential threshold search: double a price cutoff
    until at most 100 orders remain above it (or a 20-iteration cap) — the
    'find an outlier fence by probing' loop a data-quality pipeline runs
    against a new feed. Post-test semantics (body first, check after)
    pinned by the oracle's recursive-CTE transcription: anchor = the state
    AFTER the first body execution, recursive step guarded by the UNTIL
    negation, final state = max-iters row. Iteration count is
    logarithmically bounded (≤20 doublings spans 1e3..1e9), each probe is
    one pushed-down count returning a single row to the driver; on the
    empty tier the first probe already satisfies UNTIL (1 iteration, both
    engines).""",
)


# ---------------------------------------------------------------------------
# sql_script_exit_handler_fallback — condition handler + graceful fallback
# ---------------------------------------------------------------------------

_script_op(
    "sql_script_exit_handler_fallback",
    script="""
BEGIN
  DECLARE status STRING DEFAULT 'primary';
  DECLARE n_docs BIGINT DEFAULT -1;
  scoped: BEGIN
    DECLARE EXIT HANDLER FOR TABLE_OR_VIEW_NOT_FOUND
      SET status = 'fallback';
    EXECUTE IMMEDIATE 'SELECT count(*) FROM documents_sidecar_absent'
      INTO n_docs;
    SET status = 'primary_ok';
  END;
  IF status = 'fallback' THEN
    EXECUTE IMMEDIATE 'SELECT count(*) FROM documents' INTO n_docs;
  END IF;
  SELECT status AS status, n_docs AS n_docs;
END
""",
    oracle="""
SELECT 'fallback' AS status, CAST(count(*) AS BIGINT) AS n_docs
FROM documents
""",
    doc="""Condition-specific EXIT handler: the primary path reads an
    optional sidecar relation (documents_sidecar_absent — deliberately
    never registered), the DECLARE EXIT HANDLER FOR TABLE_OR_VIEW_NOT_FOUND
    catches exactly that condition (not SQLEXCEPTION-wide — a genuine data
    error must still surface), control exits the scoped block, and the
    script degrades to counting the base documents table. This is the
    'optional enrichment source' pattern of a multi-tenant ingest: absence
    of a side input is a planned branch, not a job failure. The oracle is
    the fallback branch itself with the status literal — deterministic
    because the sidecar name is reserved-by-convention and absent in every
    tier.""",
)


# ---------------------------------------------------------------------------
# sql_script_execute_immediate_params — IDENTIFIER(?) + USING, multi-row
# ---------------------------------------------------------------------------

_script_op(
    "sql_script_execute_immediate_params",
    script="""
BEGIN
  DECLARE tbl STRING DEFAULT 'lineitem';
  DECLARE lo DOUBLE DEFAULT 0.02;
  DECLARE hi DOUBLE DEFAULT 0.07;
  EXECUTE IMMEDIATE
    'SELECT l_returnflag AS flag, count(*) AS n,
            coalesce(CAST(round(sum(l_extendedprice) * 100) AS BIGINT), 0)
              AS rev_cents
     FROM IDENTIFIER(?) WHERE l_discount BETWEEN ? AND ?
     GROUP BY l_returnflag'
    USING tbl, lo, hi;
END
""",
    oracle="""
SELECT l_returnflag AS flag, count(*) AS n,
       coalesce(CAST(round(sum(l_extendedprice) * 100) AS BIGINT), 0)
         AS rev_cents
FROM lineitem WHERE l_discount BETWEEN 0.02 AND 0.07
GROUP BY l_returnflag
""",
    doc="""Parameterized dynamic SQL as the script's result statement:
    EXECUTE IMMEDIATE with an IDENTIFIER(?) table-name parameter (safe
    dynamic relation binding — never string-spliced SQL) plus positional
    value parameters for the discount band, returning the grouped multi-row
    result directly. The dynamic statement compiles through Catalyst
    exactly like its static twin — the BETWEEN predicate is pushed to the
    parquet scan and the aggregate runs partial/final — because parameter
    binding happens before planning, not per-row. Oracle = the statically
    spelled equivalent. Integer-cents revenue per §5.4.""",
)
