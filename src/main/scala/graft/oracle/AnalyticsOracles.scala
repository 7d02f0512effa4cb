package graft.oracle

/** DuckDB oracles for the analytics surface. Decimal casts mirror the Spark
  * side exactly: aggregate in DECIMAL (exact, order-independent), cast the
  * result to DOUBLE.
  */
object AnalyticsOracles {

  private val disc =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  val pricingSummary: String = s"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM($disc) AS DOUBLE) AS sum_disc_price,
           CAST(SUM($disc * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
             AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
             AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
  """

  val revenueTopK: String = s"""
    SELECT l_orderkey, o_orderdate, CAST(SUM($disc) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
  """

  val regionRevenue: String = s"""
    SELECT r_name, n_name, CAST(SUM($disc) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    GROUP BY r_name, n_name
    ORDER BY revenue DESC, r_name, n_name
  """

  val promoRevenue: String = s"""
    SELECT CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN $disc
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             * 100.0 /
           CAST(SUM($disc) AS DOUBLE) AS promo_share_pct,
           CAST(SUM($disc) AS DOUBLE) AS total_revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
  """

  /** q17 — small-quantity revenue (graft.analytics.Analytics
    * .smallQtyRevenue): the 0.2·avg gate cleared of division
    * (5·qty·cnt < sum in exact BIGINT units), window form. */
  val smallQtyRevenue: String = s"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM (
      SELECT l_extendedprice,
             CAST(l_quantity AS BIGINT) AS qty,
             COUNT(*) OVER (PARTITION BY l_partkey) AS part_cnt,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_partkey) AS part_qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#12'
    ) s
    WHERE 5 * qty * part_cnt < part_qty
  """

  /** q18 — large-volume orders (graft.analytics.Analytics.largeOrders):
    * orders whose lineitem quantity sum exceeds 200, top-100 by price
    * with an orderkey tiebreak. */
  val largeOrders: String = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum_qty
    FROM (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 200
    ) q
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
  """

  /** q19 — disjunctive-predicate revenue (graft.analytics.Analytics
    * .disjunctiveRevenue). */
  val disjunctiveRevenue: String = s"""
    SELECT CAST(SUM($disc) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM (
      SELECT l_extendedprice, l_discount,
             CAST(l_quantity AS BIGINT) AS qty, p_brand, p_size
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ) s
    WHERE (p_brand = 'Brand#12' AND qty BETWEEN 1 AND 11
             AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#23' AND qty BETWEEN 10 AND 20
             AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#34' AND qty BETWEEN 20 AND 30
             AND p_size BETWEEN 1 AND 15)
  """

  /** q22 — well-funded lapsed customers (graft.analytics.Analytics
    * .idleBalance): scalar-subquery average over positive balances,
    * NOT EXISTS over the date-filtered orders as the anti join. */
  val idleBalance: String = """
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS total_bal
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
  """

  /** q7b — cross-nation trade volume (graft.analytics.Analytics
    * .nationVolume): revenue between NATION_3 and NATION_19, both
    * directions, by shipment year. */
  val nationVolume: String = s"""
    SELECT supp_nation, cust_nation, CAST(y AS BIGINT) AS l_year,
           CAST(SUM($disc) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS y, l_extendedprice, l_discount
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_3', 'NATION_19')
        AND n2.n_name IN ('NATION_3', 'NATION_19')
        AND n1.n_name <> n2.n_name
    ) s
    GROUP BY supp_nation, cust_nation, y
    ORDER BY supp_nation, cust_nation, y
  """

  /** q8b — national market share (graft.analytics.Analytics
    * .marketShare): NATION_3's share of EUROPE's PROMO-part revenue per
    * order year; exact decimal sums, one final double division. */
  val marketShare: String = s"""
    SELECT CAST(y AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN $disc
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM($disc) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM (
      SELECT year(o_orderdate) AS y, n1.n_name AS supp_nation,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
    ) s
    GROUP BY y
    ORDER BY y
  """

  /** q21 — waiting suppliers (graft.analytics.Analytics
    * .waitingSuppliers): the EXISTS / NOT-EXISTS pair as one per-order
    * rollup; when exactly one supplier was late, MAX over the late
    * subset IS that supplier. Lateness = shipdate > orderdate + 60 days.
    */
  val waitingSuppliers: String = """
    SELECT s_name, n_name, COUNT(*) AS numwait
    FROM (
      SELECT MAX(CASE WHEN late THEN l_suppkey END) AS culprit
      FROM (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
      ) j
      GROUP BY l_orderkey
      HAVING COUNT(DISTINCT l_suppkey) >= 2
         AND COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) = 1
    ) p
    JOIN supplier ON culprit = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY s_name, n_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
  """

  val orderPriority: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity >= 30
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
  """

  val eventsRunning: String = """
    SELECT user_id, event_id, event_type,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
             OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_value,
           epoch_us(ts) - LAG(epoch_us(ts), 1)
             OVER (PARTITION BY user_id ORDER BY event_id) AS gap_us,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
             AS BIGINT) AS event_seq
    FROM events
    ORDER BY user_id, event_id
  """

  val sessionize: String = """
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
    FROM (
      SELECT *,
             CAST(SUM(COALESCE(new_session, 1))
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM (
        SELECT *,
               CAST(epoch_us(ts) - LAG(epoch_us(ts), 1)
                 OVER (PARTITION BY user_id ORDER BY event_id)
                 > 1800000000 AS INT) AS new_session
        FROM events
      ) f
    ) s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
  """

  val eventTypeStats: String = """
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           MIN(epoch_us(ts)) AS first_us,
           MAX(epoch_us(ts)) AS last_us
    FROM events
    GROUP BY event_type
    ORDER BY event_type
  """

  val forecastRevenue: String = s"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
  """

  val shipmodePriority: String = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
  """

  val returnedItemRanking: String = s"""
    SELECT c_custkey, c_name, n_name, CAST(SUM($disc) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
  """

  val customerDistribution: String = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_orderpriority NOT LIKE '4%'
      ) o ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
  """

  val eventRanks: String = """
    SELECT user_id, event_id, value, rnk, drnk, quartile,
           prev_event, next_event
    FROM (
      SELECT user_id, event_id, value,
             CAST(RANK() OVER w AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
             CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
             LAG(event_id, 1) OVER w AS prev_event,
             LEAD(event_id, 1) OVER w AS next_event
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
    ) r
    WHERE rnk <= 10
    ORDER BY user_id, rnk
  """

  val revenueRollup: String = s"""
    SELECT r_name, n_name,
           CAST(SUM($disc) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
  """

  /** q8c — CUBE lattice with grouping_id (Analytics.revenueCube): DuckDB
    * GROUPING and Spark grouping_id share the leftmost-arg-high-bit
    * convention, so gid replays exactly.
    */
  val revenueCube: String = s"""
    SELECT r_name,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(GROUPING(r_name, ship_year) AS BIGINT) AS gid,
           CAST(SUM($disc) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE (r_name, ship_year)
    ORDER BY gid, r_name ASC NULLS FIRST, ship_year ASC NULLS FIRST
  """

  val topUsers: String = """
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY total_value DESC, user_id
    LIMIT 20
  """

  /** q15 — exact median by rank selection (Analytics.priceMedian): the
    * same integer rank arithmetic; AVG over <= 2 doubles is IEEE-stable
    * in both engines (DuckDB interpolating quantile functions are NOT
    * replayable — this formulation is). */
  val priceMedian: String = """
    SELECT o_orderpriority,
           AVG(o_totalprice) AS median_price,
           MAX(cnt) AS n_orders
    FROM (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
      FROM orders
    ) t
    WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
  """

  // q16 — rank-selection quantiles; `//` is DuckDB's BIGINT division like
  // Spark's DIV, so ranks are identical integer arithmetic on both sides
  val lengthQuantiles: String = """
    WITH r AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS cnt
      FROM documents
    )
    SELECT source,
           CAST(MAX(cnt) AS BIGINT) AS n_docs,
           MAX(CASE WHEN rn = (cnt * 1 + 3) // 4 THEN n_chars END) AS p25,
           MAX(CASE WHEN rn = (cnt * 1 + 1) // 2 THEN n_chars END) AS p50,
           MAX(CASE WHEN rn = (cnt * 3 + 3) // 4 THEN n_chars END) AS p75,
           MAX(CASE WHEN rn = (cnt * 9 + 9) // 10 THEN n_chars END) AS p90
    FROM r
    GROUP BY source
    ORDER BY source
  """

  // The Spark side plans this as a binned equi-join (RangeJoin); the oracle
  // states the raw inequality join — DuckDB's IEJoin handles it natively,
  // which is exactly the dialect-level cross-check we want
  val intervalCandidates: String = """
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pus
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id AS c_user, event_id AS click_id, epoch_us(ts) AS click_us
      FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.purchase_id, c.click_id, c.click_us,
           p.pus - c.click_us AS lag_us
    FROM p JOIN c
      ON p.user_id = c.c_user
     AND c.click_us >= p.pus - 86400000000
     AND c.click_us < p.pus
    ORDER BY p.purchase_id, c.click_id
  """

  // w7 — the anti form: NOT EXISTS over the same inequality
  val windowOrphans: String = """
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS pus
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
      FROM events WHERE event_type = 'click'
    )
    SELECT c.user_id, c.click_id, c.click_us
    FROM c
    WHERE NOT EXISTS (
      SELECT 1 FROM p
      WHERE p.user_id = c.user_id
        AND c.click_us >= p.pus - 86400000000
        AND c.click_us < p.pus
    )
    ORDER BY c.click_id
  """

  // DuckDB has a native ASOF JOIN; the Spark side re-expresses it as a
  // union + ordered running window (AsOf.joinAsOf) — same inclusive (>=)
  // pick-latest semantics, deterministic because (user_id, ts) is unique
  val asofAttribution: String = """
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us,
             CAST(value AS DOUBLE) AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id AS c_user, event_id AS click_id, epoch_us(ts) AS click_us
      FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.purchase_id, p.purchase_us, p.purchase_value,
           c.click_id, c.click_us,
           p.purchase_us - c.click_us AS lag_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.c_user AND p.purchase_us >= c.click_us
    ORDER BY p.user_id, p.purchase_id
  """

  /** Shared CTE — the byte-for-byte SQL twin of `Analytics.partsupp`
    * (synthetic partsupp: testdata ships none; pure-integer derivation so
    * both engines hold the identical table). Queries append further CTEs
    * after the trailing paren with a comma, or follow with SELECT.
    */
  private val partsuppCte: String = """
    WITH ps0 AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + i * (n_supp // 4 + 1)) % n_supp AS ps_suppkey
      FROM part
      CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n_supp FROM supplier) sc
      CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) gi
    ),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             (ps_partkey * 13 + ps_suppkey * 7) % 9998 + 1 AS ps_availqty,
             (ps_partkey * 29 + ps_suppkey * 31) % 99900 + 100
               AS ps_supplycost_cents
      FROM ps0
    )
  """

  /** Q2 kept in its CLASSIC correlated-scalar-subquery form — DuckDB
    * decorrelates it the same way the Spark side does explicitly.
    */
  val minCostSupplier: String = s"""$partsuppCte
    SELECT s_acctbal, s_name, n_name, ps.ps_partkey AS ps_partkey, p_brand,
           ps.ps_supplycost_cents AS ps_supplycost_cents
    FROM partsupp ps
    JOIN part ON ps.ps_partkey = p_partkey
    JOIN supplier ON ps.ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND ps.ps_supplycost_cents = (
        SELECT MIN(ps2.ps_supplycost_cents)
        FROM partsupp ps2
        JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = ps.ps_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, ps_partkey
    LIMIT 100
  """

  val inventoryValue: String = s"""$partsuppCte,
    per_part AS (
      SELECT ps_partkey,
             CAST(SUM(ps_supplycost_cents * ps_availqty) AS BIGINT)
               AS value_cents
      FROM partsupp
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY ps_partkey
    ),
    totals AS (
      SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents,
             COUNT(*) AS n_parts
      FROM per_part
    )
    SELECT ps_partkey, value_cents
    FROM per_part, totals
    WHERE value_cents * n_parts * 2 > total_cents * 3
    ORDER BY value_cents DESC, ps_partkey
  """

  val supplierCounts: String = s"""$partsuppCte
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON ps_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND ps_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
  """

  val excessStockSuppliers: String = s"""$partsuppCte
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN
            (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps_availqty * 2 > (
            SELECT COALESCE(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT), 0)
            FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1997-01-01'))
    ORDER BY s_name
  """

  /** Q15 in its classic correlated-scalar-MAX form; revenue compared as
    * EXACT decimal sums (ties keep every top supplier), cast to double
    * only at presentation.
    */
  val topSupplier: String = """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) -
                  CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
  """

  /** Q9 in its classic star form; profit in exact 1/10000-dollar BIGINTs
    * (revenue leg: decimal product × 10⁴, integral before the cast; cost
    * leg: cents × qty × 100) — the same arithmetic
    * [[graft.analytics.Analytics.productProfit]] runs.
    */
  val productProfit: String = s"""$partsuppCte
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (CAST(1 AS DECIMAL(12,2)) -
                   CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT)
             - ps_supplycost_cents * CAST(l_quantity AS BIGINT) * 100
           ) AS BIGINT) AS sum_profit_e4,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    JOIN part ON ps_partkey = p_partkey
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
  """

  /** w9 — three-step conversion funnel (graft.analytics.Analytics
    * .funnel): first view, first click strictly after it, first purchase
    * strictly after that; stage count per user; micros per the w1/w2
    * convention.
    */
  val funnel: String = """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS view_us
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS click_us
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.view_us
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.click_us
      GROUP BY e.user_id
    )
    SELECT u.user_id, v.view_us, c.click_us, p.purchase_us,
           CAST(CASE WHEN p.purchase_us IS NOT NULL THEN 3
                     WHEN c.click_us IS NOT NULL THEN 2
                     WHEN v.view_us IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage
    FROM u
    LEFT JOIN v ON v.user_id = u.user_id
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
    ORDER BY u.user_id
  """

  /** w10 — weekly retention cohorts (graft.analytics.Analytics
    * .retentionCohorts): cohort = first-activity week (integer micros
    * division), retention in exact ppm.
    */
  val retentionCohorts: String = """
    WITH act AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      FROM events
    ),
    coh AS (SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id),
    sz AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM coh GROUP BY cohort_week),
    m AS (
      SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
             COUNT(DISTINCT a.user_id) AS n_users
      FROM act a JOIN coh c USING (user_id)
      GROUP BY c.cohort_week, a.week - c.cohort_week
    )
    SELECT m.cohort_week, m.week_offset, m.n_users, s.cohort_size,
           CAST(m.n_users * 1000000 // s.cohort_size AS BIGINT) AS retained_ppm
    FROM m JOIN sz s USING (cohort_week)
    ORDER BY m.cohort_week, m.week_offset
  """
}
