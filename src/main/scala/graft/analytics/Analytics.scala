package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.ActionLog

/** General analytics surface over the TPC-H-ish testdata — the query shapes
  * a consumer of the journal engine runs on materialized event data: scans
  * with pushed-down predicates, broadcast joins, partial aggregation,
  * windows, top-k, sessionization.
  *
  * Numeric discipline: money-ish doubles are cast to DECIMAL before
  * aggregation so sums are EXACT (order-independent — a float sum would
  * depend on partition merge order and could never hash-match an oracle),
  * then cast back to double for a stable output type. Timestamp arithmetic
  * goes through unix_micros (exact BIGINT) — never through double seconds.
  *
  * Scale notes: only genuinely fixed dimensions (region/nation, supplier at
  * its small multiplier) carry broadcast hints; customer/orders scale with
  * the corpus and are left to AQE, which broadcasts at small SF and falls
  * back to sort-merge at 100 TB. Fact-side aggregations combine map-side
  * (Spark partial agg is automatic for all aggregates used here); every
  * filter lands in the parquet scan (verified via explain: PushedFilters).
  */
object Analytics {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def dec(c: String) = col(c).cast("decimal(12,2)")

  /** TPC-H Q1 shape: pricing summary with exact decimal arithmetic. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(
          dec("l_extendedprice") *
            (lit(1).cast("decimal(12,2)") - dec("l_discount"))
        ).cast("double").as("sum_disc_price"),
        sum(
          dec("l_extendedprice") *
            (lit(1).cast("decimal(12,2)") - dec("l_discount")) *
            (lit(1).cast("decimal(12,2)") + dec("l_tax"))
        ).cast("double").as("sum_charge"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3 shape: unshipped-orders revenue top-10. The filtered customer
    * leg (one market segment, key-only projection) is the true dimension
    * side and carries the only broadcast hint; orders and lineitem are
    * fact-sized and stay unhinted — without the hint Catalyst's static
    * stats pick the *filtered lineitem* as a broadcast build side, which is
    * the wrong bet at every scale (slow locally, OOM at 100 TB).
    */
  def revenueTopK(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(
        ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey")
      )
      .groupBy("l_orderkey", "o_orderdate")
      .agg(
        sum(
          dec("l_extendedprice") *
            (lit(1).cast("decimal(12,2)") - dec("l_discount"))
        ).cast("double").as("revenue")
      )
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: revenue by (region, nation). Only the genuinely fixed
    * dimensions (region 5 rows, nation 25, supplier SF-small) are hinted;
    * orders and customer scale with the corpus and are left to AQE.
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region")
    val nation = t(spark, dir, "nation")
    val supp = t(spark, dir, "supplier")
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(
        broadcast(
          nation.join(broadcast(region),
            col("n_regionkey") === col("r_regionkey"))
        ),
        col("s_nationkey") === col("n_nationkey")
      )
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(
        cust,
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey")
      )
      .groupBy("r_name", "n_name")
      .agg(
        sum(
          dec("l_extendedprice") *
            (lit(1).cast("decimal(12,2)") - dec("l_discount"))
        ).cast("double").as("revenue")
      )
      .orderBy(col("revenue").desc, col("r_name"), col("n_name"))
  }

  /** TPC-H Q4 shape: order-priority count with an EXISTS semi-join. */
  def orderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")
      )
    val lateLine = t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 30)
      .select("l_orderkey")
    ord
      .join(lateLine, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Per-user running aggregates over the event stream (W1-class ordered
    * windows): running exact sum of value, previous-event gap in µs.
    */
  def eventsRunning(spark: SparkSession, dir: String): DataFrame = {
    val ev = ActionLog.normalizedEvents(spark, dir)
    val w = Window
      .partitionBy("user_id")
      .orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagW = Window.partitionBy("user_id").orderBy("event_id")
    ev.select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        sum(col("value").cast("decimal(12,2)"))
          .over(w)
          .cast("double")
          .as("running_value"),
        (unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(lagW)).as("gap_us"),
        row_number().over(lagW).cast("long").as("event_seq")
      )
      .orderBy("user_id", "event_id")
  }

  /** Gap-based sessionization (30-minute inactivity): the batch analogue of
    * a streaming session window. Two stacked windows over the same
    * (user_id, event_id) ordering — one shuffle, one sort.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = ActionLog.normalizedEvents(spark, dir)
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val gapUs = 30L * 60 * 1000 * 1000
    val flagged = ev
      .withColumn(
        "new_session",
        (unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(byUser) > gapUs)
          .cast("int")
      )
      .withColumn(
        "session_id",
        coalesce(
          sum(coalesce(col("new_session"), lit(1))).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
          ),
          lit(1)
        )
      )
    flagged
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (unix_micros(max("ts")) - unix_micros(min("ts")))
          .as("duration_us"),
        sum(col("value").cast("decimal(12,2)"))
          .cast("double")
          .as("session_value")
      )
      .orderBy("user_id", "session_id")
  }

  /** Per-type event stats: counts, distinct users, exact value sum. */
  def eventTypeStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = ActionLog.normalizedEvents(spark, dir)
    ev.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        sum(col("value").cast("decimal(12,2)"))
          .cast("double")
          .as("total_value"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us")
      )
      .orderBy("event_type")
  }

  /** TPC-H Q6 shape: forecast revenue — pure scan+filter+agg, the query
    * whose whole cost is how much the scan prunes.
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.09) &&
          col("l_quantity") < 24
      )
      .agg(
        sum(dec("l_extendedprice") * dec("l_discount"))
          .cast("double")
          .as("revenue"),
        count(lit(1)).as("n_lines")
      )

  /** TPC-H Q12 shape: conditional aggregation after a fact-fact join —
    * priority counts per return flag.
    */
  def shipmodePriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(
          when(
            col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            1L
          ).otherwise(0L)
        ).as("high_line_count"),
        sum(
          when(
            col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            0L
          ).otherwise(1L)
        ).as("low_line_count")
      )
      .orderBy("l_returnflag")
  }

  /** TPC-H Q10 shape: revenue lost to returned items, per customer, top 20.
    * Orders/customer unhinted (fact-sized); only nation (25 rows) is
    * broadcast.
    */
  def returnedItemRanking(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    val ord = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val li = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val nation = t(spark, dir, "nation").select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(
        sum(
          dec("l_extendedprice") *
            (lit(1).cast("decimal(12,2)") - dec("l_discount"))
        ).cast("double").as("revenue")
      )
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13 shape: distribution of orders per customer (left join keeps
    * zero-order customers).
    */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").select("c_custkey")
    val ord = t(spark, dir, "orders")
      .filter(!col("o_orderpriority").startsWith("4"))
      .select("o_orderkey", "o_custkey")
    cust
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Window-function spread: rank / dense_rank / ntile / lag / lead over
    * each user's events by value — the W1-class ordered-analytics surface.
    */
  def eventRanks(spark: SparkSession, dir: String): DataFrame = {
    val ev = ActionLog.normalizedEvents(spark, dir)
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    ev.select(
        col("user_id"),
        col("event_id"),
        col("value"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        lag(col("event_id"), 1).over(w).as("prev_event"),
        lead(col("event_id"), 1).over(w).as("next_event")
      )
      .filter(col("rnk") <= 10)
      .orderBy("user_id", "rnk")
  }

  /** Hierarchical rollup: revenue by region ⊃ nation ⊃ total — the
    * grouping-sets surface (exact decimal, so subtotal hashes are stable).
    *
    * Expressed through spark.sql: `Dataset.rollup` currently trips the
    * ambiguous-self-join detector on Expand's duplicated grouping
    * attributes; the SQL path plans the identical Expand+Aggregate — and
    * runs the oracle's text verbatim, so the two engines execute the same
    * statement.
    */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "supplier", "nation", "region").foreach { n =>
      t(spark, dir, n).createOrReplaceTempView(n)
    }
    spark.sql(graft.oracle.AnalyticsOracles.revenueRollup)
  }

  /** CUBE + grouping_id — revenue over every aggregation lattice point of
    * (region, ship year); q8 covers ROLLUP, this closes the remaining
    * common OLAP grouping shape. The native `.cube` API plans ONE Expand
    * over the joined slice followed by one shuffle on the grouping
    * columns — the lattice is computed map-side, never by re-scanning the
    * fact per grouping set; dims broadcast as in q5/q8. `gid` is Spark's
    * `grouping_id()`, bit-identical to DuckDB's `GROUPING(r_name,
    * ship_year)` (leftmost argument = most significant bit, verified
    * empirically), so the oracle pins the lattice BOOKKEEPING — which
    * rows are subtotals of what — not just the sums.
    */
  def revenueCube(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select(
      col("l_suppkey"),
      year(col("l_shipdate")).cast("long").as("ship_year"),
      (dec("l_extendedprice") *
        (lit(1).cast("decimal(12,2)") - dec("l_discount"))).as("disc")
    )
    val sup = t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = t(spark, dir, "nation").select("n_nationkey", "n_regionkey")
    val reg = t(spark, dir, "region").select("r_regionkey", "r_name")
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("ship_year"))
      .agg(
        grouping_id().as("gid"),
        sum(col("disc")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines")
      )
      .orderBy(
        col("gid"),
        col("r_name").asc_nulls_first,
        col("ship_year").asc_nulls_first
      )
  }

  /** TPC-H Q14 shape: promotion revenue share — lineitem joined to part
    * (the one untouched testdata table), a conditional aggregate over the
    * join, exact decimal arithmetic. Part scales with the corpus (its own
    * SF multiplier), so the join is UNhinted: stats broadcast it at bench
    * scale, sort-merge + AQE at 100 TB.
    */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-07-01").cast("timestamp")
      )
      .select("l_partkey", "l_extendedprice", "l_discount")
    val part = t(spark, dir, "part").select("p_partkey", "p_type")
    val disc = dec("l_extendedprice") *
      (lit(1).cast("decimal(12,2)") - dec("l_discount"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "ECONOMY", disc).otherwise(
          lit(0).cast("decimal(12,2)"))).cast("double") * 100.0 /
          sum(disc).cast("double")).as("promo_share_pct"),
        sum(disc).cast("double").as("total_revenue"),
        count(lit(1)).as("n_lines")
      )
  }

  /** TPC-H Q17 shape: revenue impact of small-quantity orders for one
    * brand. The classic plan re-aggregates all of lineitem for the
    * per-part average; this one prunes FIRST — join lineitem to the
    * brand-filtered part slice (tiny → broadcast), then compute the
    * per-part count/sum as a WINDOW over the surviving rows (one shuffle
    * on l_partkey over 1/N of the corpus, no second lineitem scan). The
    * 0.2·avg predicate is cleared of division: qty < 0.2·(sum/cnt) ⇔
    * 5·qty·cnt < sum in exact integer units (quantities are integral).
    */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
      .filter(col("p_brand") === "Brand#12")
      .select("p_partkey")
    val li = t(spark, dir, "lineitem")
      .select(
        col("l_partkey"),
        col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice")
      )
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy("l_partkey")
    li.withColumn("part_cnt", count(lit(1)).over(w))
      .withColumn("part_qty", sum("qty").over(w))
      .filter(lit(5L) * col("qty") * col("part_cnt") < col("part_qty"))
      .agg(
        (sum(dec("l_extendedprice")).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_lines")
      )
  }

  /** TPC-H Q18 shape: large-volume orders — customers whose single order
    * exceeds a quantity threshold. The HAVING-filtered orderkey set is
    * tiny relative to lineitem, so AQE turns the orders/customer joins
    * into broadcasts at any scale; the only big shuffle is the one
    * partial-aggregated groupBy on l_orderkey. Top-100 by price with an
    * orderkey tiebreak keeps the limit deterministic.
    */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val qty = t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 200L)
    qty
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_name"),
        col("c_custkey"),
        col("o_orderkey"),
        col("o_orderdate"),
        col("o_totalprice"),
        col("sum_qty")
      )
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19 shape: revenue under disjunctive brand/size/quantity
    * predicates — the OR-pushdown case. The join stays a plain equi-join
    * on partkey (so it hashes, never BNLJ); the disjunction sits in a
    * post-join filter where Catalyst can still prune part-side rows via
    * the derived `p_size <= 15` superset predicate. Exact decimal sum.
    */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(
        col("l_partkey"),
        col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"),
        col("l_discount")
      )
    val part = t(spark, dir, "part").select("p_partkey", "p_brand", "p_size")
    val pred =
      (col("p_brand") === "Brand#12" && col("qty").between(1, 11) &&
        col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#23" && col("qty").between(10, 20) &&
          col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#34" && col("qty").between(20, 30) &&
          col("p_size").between(1, 15))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(
        sum(
          dec("l_extendedprice") *
            (lit(1).cast("decimal(12,2)") - dec("l_discount"))
        ).cast("double").as("revenue"),
        count(lit(1)).as("n_lines")
      )
  }

  /** TPC-H Q22 shape: well-funded customers who LAPSED — no order since
    * the cutoff epoch (every testdata customer has some order, so the
    * classic never-ordered form is vacuous; the lapsed form keeps the
    * same plan with a pushed-down date filter on the anti side). The
    * positive-balance average is a 1-row aggregate broadcast over the
    * corpus (a scalar subquery's physical form); "no recent order" is a
    * LEFT ANTI join on custkey — the decorrelated NOT EXISTS. The single
    * sum/count division is one exactly-rounded IEEE op both engines
    * agree on; everything else is exact decimal.
    */
  def idleBalance(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val avgBal = cust
      .filter(col("c_acctbal") > 0.0)
      .agg(
        (sum(dec("c_acctbal")).cast("double") / count(lit(1)))
          .as("avg_bal")
      )
    cust
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(
        t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"),
        "left_anti"
      )
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_cust"),
        sum(dec("c_acctbal")).cast("double").as("total_bal")
      )
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q21 shape: suppliers who kept multi-supplier orders waiting —
    * the correlated EXISTS / NOT EXISTS pair decorrelated into ONE
    * partial-aggregable rollup. Classic Q21 scans lineitem four times
    * (self-joins for "another supplier exists" and "no OTHER supplier was
    * late"); here the per-order facts — distinct suppliers, distinct LATE
    * suppliers, and (when exactly one) that supplier's id via max over
    * the late subset — come out of a single groupBy(l_orderkey), so the
    * whole query costs the grain-nested shuffles plus two broadcast dim
    * joins. Distinct-counting goes through an explicit per-(order,
    * supplier) rollup rather than countDistinct — two multi-distinct
    * aggregates would plan as an Expand that triples every lineitem row
    * before the first partial agg; the nested form collapses to supplier
    * grain map-side first, so the second shuffle moves only collapsed
    * rows. Lateness is shipdate > orderdate + 60 days (this testdata
    * carries no commit/receipt dates). Top-25 with an s_name tiebreak
    * keeps the limit deterministic.
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val perSupp = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(
        max(
          when(
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            1L
          ).otherwise(0L)
        ).as("late")
      )
    val perOrder = perSupp
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("n_supp"),
        sum(col("late")).as("n_late"),
        max(when(col("late") === 1L, col("l_suppkey"))).as("culprit")
      )
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
    perOrder
      .join(
        broadcast(t(spark, dir, "supplier")),
        col("culprit") === col("s_suppkey")
      )
      .join(
        broadcast(t(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey")
      )
      .groupBy("s_name", "n_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(25)
  }

  /** TPC-H Q7 shape: cross-nation trade volume — revenue shipped from
    * suppliers in one nation to customers in the other, by year, both
    * directions. The nation pair is a two-row broadcast against the small
    * supplier/customer dims; the supplier leg (supplier × nation, tiny at
    * any scale) broadcasts into lineitem, and the customer leg reduces
    * orders to (orderkey → cust_nation) before the single fact-fact join
    * on orderkey — at 100 TB that's one sort-merge/AQE join between the
    * two fact projections, with both disjunct filters pushed into the dim
    * scans. Year extraction is exact integer calendar arithmetic both
    * engines share.
    */
  def nationVolume(
      spark: SparkSession,
      dir: String,
      nationA: String = "NATION_3",
      nationB: String = "NATION_19"
  ): DataFrame = {
    val nations = t(spark, dir, "nation")
      .filter(col("n_name").isin(nationA, nationB))
      .select("n_nationkey", "n_name")
    val supp = t(spark, dir, "supplier")
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(spark, dir, "customer")
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = t(spark, dir, "orders")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    t(spark, dir, "lineitem")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(
        col("supp_nation"),
        col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year")
      )
      .agg(
        sum(
          dec("l_extendedprice") *
            (lit(1).cast("decimal(12,2)") - dec("l_discount"))
        ).cast("double").as("revenue"),
        count(lit(1)).as("n_lines")
      )
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape: national market share — of one region's revenue in
    * one part type, the fraction supplied by a given nation, per year.
    * The share is sum(CASE)·/·sum over EXACT decimal sums with ONE final
    * double division per year row (the single exactly-rounded IEEE op
    * both engines agree on — the q22 discipline). Part (type-filtered)
    * and the region's customer set prune before the fact joins; the only
    * corpus-scale shuffle is lineitem↔orders on orderkey.
    */
  def marketShare(
      spark: SparkSession,
      dir: String,
      supplierNation: String = "NATION_3",
      region: String = "EUROPE",
      partType: String = "PROMO"
  ): DataFrame = {
    val part = t(spark, dir, "part")
      .filter(col("p_type") === partType)
      .select("p_partkey")
    val custInRegion = t(spark, dir, "customer")
      .join(
        broadcast(
          t(spark, dir, "nation")
            .join(
              broadcast(
                t(spark, dir, "region").filter(col("r_name") === region)
              ),
              col("n_regionkey") === col("r_regionkey")
            )
            .select("n_nationkey")
        ),
        col("c_nationkey") === col("n_nationkey")
      )
      .select("c_custkey")
    val supp = t(spark, dir, "supplier")
      .join(
        broadcast(t(spark, dir, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey")
      )
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = t(spark, dir, "orders")
      .join(custInRegion, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    val vol = dec("l_extendedprice") *
      (lit(1).cast("decimal(12,2)") - dec("l_discount"))
    t(spark, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === supplierNation, vol)
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
          sum(vol).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_lines")
      )
      .orderBy("o_year")
  }

  /** W5 — last-touch attribution via the as-of join ([[AsOf.joinAsOf]]):
    * for each purchase, the latest click by the same user at or before the
    * purchase instant. Purchases with no preceding click survive with null
    * click columns (left-outer as-of). Times ride as unix micros (exact
    * BIGINT — the timestamp discipline of the rest of this surface).
    */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = ActionLog.normalizedEvents(spark, dir)
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("purchase_us"),
        col("value").cast("double").as("purchase_value")
      )
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us")
      )
    AsOf
      .joinAsOf(purchases, clicks, Seq("user_id"), "purchase_us", "click_us")
      .withColumn("lag_us", col("purchase_us") - col("click_us"))
      .orderBy("user_id", "purchase_id")
  }

  /** W6 — windowed attribution CANDIDATES as a batch range join: for each
    * purchase, ALL clicks of the same user in the strictly-preceding 24 h
    * window (w5's as-of keeps only the most recent click; multi-touch
    * attribution needs the whole candidate set). Plans through
    * [[RangeJoin.joinRange]]: 6 h bins, so each purchase window replicates
    * to 5 bin rows and each click hash-joins only against same-user
    * purchases in its own bin — an ordinary equi-join Catalyst can
    * broadcast or AQE-skew-split, never the BroadcastNestedLoopJoin a raw
    * inequality join degenerates to.
    */
  /** The shared w6/w7 prep: (clicks as points, purchase windows as
    * intervals) — ONE definition of the attribution horizon and bin
    * width, so the inner (w6) and anti (w7) forms cannot drift apart.
    */
  private val attributionHorizonUs = 86400000000L // 24 h
  private val attributionBinUs = 6L * 3600L * 1000000L // 6 h

  private def clicksAndWindows(
      spark: SparkSession,
      dir: String
  ): (DataFrame, DataFrame) = {
    val ev = ActionLog.normalizedEvents(spark, dir)
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us")
      )
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        (unix_micros(col("ts")) - lit(attributionHorizonUs)).as("win_lo"),
        unix_micros(col("ts")).as("win_hi")
      )
    (clicks, purchases)
  }

  def intervalCandidates(spark: SparkSession, dir: String): DataFrame = {
    val (clicks, purchases) = clicksAndWindows(spark, dir)
    RangeJoin
      .joinRange(
        clicks,
        purchases,
        Seq("user_id"),
        pointTime = "click_us",
        lo = "win_lo",
        hi = "win_hi",
        binWidth = attributionBinUs
      )
      .select(
        col("user_id"),
        col("purchase_id"),
        col("click_id"),
        col("click_us"),
        (col("win_hi") - col("click_us")).as("lag_us")
      )
      .orderBy("purchase_id", "click_id")
  }

  /** W7 — window ORPHANS: clicks that precede no purchase of their user
    * within the attribution horizon (w6's anti mode — the rows a
    * multi-touch model can never credit; in a curation pipeline the same
    * shape is "rows outside every window" decontamination). Identical
    * binned plan with a left_anti join — the range predicate rides the
    * join condition, and the not-exists semantics come from the join
    * type, not a distinct/except pass.
    */
  def windowOrphans(spark: SparkSession, dir: String): DataFrame = {
    val (clicks, purchases) = clicksAndWindows(spark, dir)
    RangeJoin
      .joinRange(
        clicks,
        purchases.drop("purchase_id"),
        Seq("user_id"),
        pointTime = "click_us",
        lo = "win_lo",
        hi = "win_hi",
        binWidth = attributionBinUs,
        mode = "anti"
      )
      .select("user_id", "click_id", "click_us")
      .orderBy("click_id")
  }

  /** Exact per-group quantile VECTOR by rank selection — q15's median
    * generalized to arbitrary quantiles in one pass. Type-1 (lower)
    * empirical quantiles: the value at rank `ceil(q·n)` under a total
    * order, computed as `(num·n + den − 1) DIV den` — pure integer rank
    * arithmetic, no interpolation, so every reported quantile is a value
    * that EXISTS in the data and replays bit-for-bit on any engine
    * (interpolating implementations differ in FP evaluation order;
    * sketches like percentile_approx are not even deterministic across
    * partition layouts). One keyed sort — the same shuffle any per-group
    * window pays — then the rank filter prunes to ≤|quantiles| rows per
    * group before the tiny conditional aggregate.
    *
    * `quantiles` are rationals (num, den, outName) with 0 < num <= den.
    */
  def groupQuantilesExact(
      df: DataFrame,
      group: Seq[String],
      value: String,
      tie: String,
      quantiles: Seq[(Int, Int, String)]
  ): DataFrame = {
    require(group.nonEmpty && quantiles.nonEmpty)
    require(
      quantiles.forall { case (n, d, _) => n > 0 && n <= d },
      "quantiles must satisfy 0 < num <= den"
    )
    // nulls LAST to match the oracle dialect: DuckDB sorts nulls last
    // under ASC, Spark first — on nullable value columns the rank picks
    // would silently diverge (and a low quantile could report null)
    val w = Window
      .partitionBy(group.map(col): _*)
      .orderBy(col(value).asc_nulls_last, col(tie))
    val g = Window.partitionBy(group.map(col): _*)
    def rank(num: Int, den: Int): Column =
      expr(s"(cnt * $num + ${den - 1}) DIV $den")
    val picks = quantiles.map { case (n, d, _) => col("rn") === rank(n, d) }
    df.select((group ++ Seq(value, tie)).map(col): _*)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(g))
      .filter(picks.reduce(_ || _))
      .groupBy(group.map(col): _*)
      .agg(
        max(col("cnt")).as("n_rows"),
        quantiles.map { case (n, d, out) =>
          max(when(col("rn") === rank(n, d), col(value))).as(out)
        }: _*
      )
  }

  /** Q16 — document-length distribution per source: exact p25/p50/p75/p90
    * of `n_chars` (the corpus-curation view of where each source's length
    * mass sits — length floors/caps per source come straight off this).
    */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    groupQuantilesExact(
      t(spark, dir, "documents"),
      group = Seq("source"),
      value = "n_chars",
      tie = "doc_id",
      quantiles = Seq(
        (1, 4, "p25"),
        (1, 2, "p50"),
        (3, 4, "p75"),
        (9, 10, "p90")
      )
    ).withColumnRenamed("n_rows", "n_docs")
      .orderBy("source")

  /** Q15 — EXACT distributed median by rank selection (vs
    * `percentile_approx`'s sketch): per priority class, the median order
    * price is the mean of the rank-⌈n/2⌉ and rank-⌈(n+1)/2⌉ values under
    * a total order — integer rank arithmetic plus one IEEE mean, so the
    * result is deterministic and oracle-replayable where interpolating
    * percentile implementations are not. One keyed sort (the same shuffle
    * any per-group window pays); the rank filter prunes to ≤2 rows per
    * group before the final tiny aggregate.
    */
  def priceMedian(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .select("o_orderpriority", "o_totalprice", "o_orderkey")
    val w = Window
      .partitionBy("o_orderpriority")
      // o_orderkey tiebreak makes the order total: equal prices cannot
      // make the rank selection nondeterministic
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val n = Window.partitionBy("o_orderpriority")
    ord
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(n))
      .filter(
        col("rn") === expr("(cnt + 1) DIV 2") ||
          col("rn") === expr("(cnt + 2) DIV 2")
      )
      .groupBy("o_orderpriority")
      .agg(
        avg("o_totalprice").as("median_price"),
        max("cnt").as("n_orders")
      )
      .orderBy("o_orderpriority")
  }

  /** Top-k users by exact total value with deterministic tiebreak. */
  def topUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = ActionLog.normalizedEvents(spark, dir)
    ev.groupBy("user_id")
      .agg(
        sum(col("value").cast("decimal(12,2)"))
          .cast("double")
          .as("total_value"),
        count(lit(1)).as("n_events")
      )
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(20)
  }

  // ---- partsupp-family shapes (q2 / q11 / q16 / q20) -------------------
  //
  // The driver testdata ships no partsupp table; it is SYNTHESIZED here
  // and in the DuckDB oracle by the same pure-integer derivation, so both
  // engines hold the identical table (AnalyticsOracles.partsuppCte is the
  // byte-for-byte SQL twin of [[partsupp]]).

  /** Synthetic partsupp: 4 supplier rows per part via the TPC-H dbgen
    * supplier-rotation idea (TPC-H spec §4.2.3 — partkey plus a stride
    * per replica), adapted to this testdata's 0-based keys with stride
    * `S/4 + 1` (coprime-enough: `k·(S/4+1) mod S ≠ 0` for k=1..3 at every
    * shipped supplier count, so the four replicas are distinct).
    * `ps_availqty` / `ps_supplycost_cents` are fixed affine hashes of
    * (part, supplier) — exact BIGINT end-to-end, so sums and comparisons
    * hash-match the oracle regardless of partition merge order. Cost is
    * kept in CENTS; a consumer wanting dollars divides at presentation.
    *
    * Plan shape: one scan of `part` × a 4-element explode — no shuffle,
    * no join (the supplier COUNT is a broadcast single-row cross join).
    * At 100 TB partsupp would be a real table; everything downstream
    * consumes it as a DataFrame either way.
    */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    val nSupp = t(spark, dir, "supplier")
      .agg(count(lit(1)).cast("long").as("n_supp"))
    t(spark, dir, "part")
      .select(col("p_partkey"))
      .crossJoin(broadcast(nSupp))
      .select(
        col("p_partkey"),
        col("n_supp"),
        explode(array((0L until 4L).map(lit): _*)).as("i")
      )
      .selectExpr(
        "p_partkey AS ps_partkey",
        "(p_partkey + i * (n_supp DIV 4 + 1)) % n_supp AS ps_suppkey"
      )
      .selectExpr(
        "ps_partkey",
        "ps_suppkey",
        "(ps_partkey * 13 + ps_suppkey * 7) % 9998 + 1 AS ps_availqty",
        "(ps_partkey * 29 + ps_suppkey * 31) % 99900 + 100 AS ps_supplycost_cents"
      )
  }

  /** Suppliers of one region with their nation name — the broadcast dim
    * leg all four partsupp shapes share (supplier scales at TPC-H's small
    * multiplier; nation/region are fixed 25/5 rows).
    */
  private def regionSuppliers(
      spark: SparkSession,
      dir: String,
      region: String
  ): DataFrame =
    t(spark, dir, "supplier")
      .join(
        broadcast(
          t(spark, dir, "nation")
            .join(
              t(spark, dir, "region").filter(col("r_name") === region),
              col("n_regionkey") === col("r_regionkey")
            )
            .select("n_nationkey", "n_name")
        ),
        col("s_nationkey") === col("n_nationkey")
      )
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")

  /** TPC-H Q2 shape: min-cost supplier per part in a region. The classic
    * formulation is a correlated scalar subquery (per part: MIN supply
    * cost among the region's suppliers); decorrelated here into a
    * per-part WINDOW min + equality filter — strictly better than the
    * aggregate-and-rejoin decorrelation, which plans the eligible subtree
    * twice and sort-merge-joins the copies (measured: Spark's exchange
    * reuse does not unify them): the window form computes the subtree
    * ONCE and spends one ps_partkey exchange total. Ties (two suppliers
    * at the min cost) keep both rows, exactly like the SQL's equality
    * filter.
    */
  def minCostSupplier(
      spark: SparkSession,
      dir: String,
      region: String = "EUROPE",
      maxSize: Int = 10,
      ptype: String = "STANDARD"
  ): DataFrame = {
    val parts = t(spark, dir, "part")
      .filter(col("p_size") <= maxSize && col("p_type") === ptype)
      .select("p_partkey", "p_brand")
    val eligible = partsupp(spark, dir)
      .join(parts, col("ps_partkey") === col("p_partkey"))
      .join(
        broadcast(regionSuppliers(spark, dir, region)),
        col("ps_suppkey") === col("s_suppkey")
      )
    val w = Window.partitionBy("ps_partkey")
    eligible
      .withColumn("min_cents", min("ps_supplycost_cents").over(w))
      .filter(col("ps_supplycost_cents") === col("min_cents"))
      .select(
        col("s_acctbal"), col("s_name"), col("n_name"),
        col("ps_partkey"), col("p_brand"), col("ps_supplycost_cents")
      )
      .orderBy(
        col("s_acctbal").desc, col("n_name"), col("s_name"), col("ps_partkey")
      )
      .limit(100)
  }

  /** TPC-H Q11 shape: per-part inventory value held by one region's
    * suppliers, keeping parts whose value exceeds 1.5× the mean part
    * value — the group-by + GLOBAL-scalar HAVING pattern. The scalar
    * (total value and group count) is a single-row aggregate broadcast
    * into the per-part rows; the threshold compare is pure BIGINT
    * cross-multiplication (`value · n · 2 > total · 3`), so no float
    * enters the plan and the HAVING is exact at any scale.
    *
    * Plan note: the perPart subtree is computed twice (once per leg) —
    * a window-based single pass would funnel every per-part row through
    * ONE partition for the global total, which is the worse trade at
    * scale. The duplicated work is dimension-bounded (partsupp derives
    * from `part`, never a fact table) and both legs reduce map-side to
    * one row per part before their exchanges.
    */
  def inventoryValue(
      spark: SparkSession,
      dir: String,
      region: String = "EUROPE"
  ): DataFrame = {
    val perPart = partsupp(spark, dir)
      .join(
        broadcast(regionSuppliers(spark, dir, region).select("s_suppkey")),
        col("ps_suppkey") === col("s_suppkey")
      )
      .groupBy("ps_partkey")
      .agg(
        sum(col("ps_supplycost_cents") * col("ps_availqty")).as("value_cents")
      )
    val totals = perPart.agg(
      sum("value_cents").as("total_cents"),
      count(lit(1)).as("n_parts")
    )
    perPart
      .crossJoin(broadcast(totals))
      .filter(col("value_cents") * col("n_parts") * 2 > col("total_cents") * 3)
      .select("ps_partkey", "value_cents")
      .orderBy(col("value_cents").desc, col("ps_partkey"))
  }

  /** TPC-H Q15 shape: top-revenue supplier of a quarter — the classic
    * view + correlated global-scalar-MAX pattern (revenue per supplier,
    * keep those equal to the maximum). Decorrelated the q11 way: the
    * quarter-filtered per-supplier aggregate is computed ONCE, its
    * single-row MAX broadcasts back via crossJoin, and the equality
    * filter runs on EXACT decimal sums (ties keep every top supplier,
    * exactly like the SQL). The only fact-side work is one
    * shipdate-pruned scan with map-side partial aggregation to the
    * supplier grain; the supplier dim joins broadcast. The double
    * subtree of aggregate-and-rejoin never appears — `rev` feeds both
    * legs of one exchange-reused plan (supplier-grain rows, dimension
    * bounded).
    */
  def topSupplier(
      spark: SparkSession,
      dir: String,
      quarterStart: String = "1996-01-01",
      quarterEnd: String = "1996-04-01"
  ): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit(quarterStart).cast("timestamp") &&
          col("l_shipdate") < lit(quarterEnd).cast("timestamp")
      )
      .groupBy("l_suppkey")
      .agg(
        sum(
          dec("l_extendedprice") *
            (lit(1).cast("decimal(12,2)") - dec("l_discount"))
        ).as("total_rev")
      )
    val mx = rev.agg(max("total_rev").as("mx"))
    rev
      .crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("mx"))
      .join(
        broadcast(t(spark, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey")
      )
      .select(
        col("s_suppkey"),
        col("s_name"),
        col("total_rev").cast("double").as("total_revenue")
      )
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    * with a NOT-IN supplier exclusion. The NOT IN decorrelates to a
    * broadcast left-anti join (the excluded set — suppliers in the red —
    * is tiny); the single countDistinct plans as a two-level aggregate
    * with NO Expand (only multi-distinct aggregates trigger the Expand
    * row-tripling this family avoids).
    */
  def supplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 4, 9, 14, 23, 36, 45, 49)
    val parts = t(spark, dir, "part")
      .filter(
        col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(sizes: _*)
      )
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val bad = t(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0)
      .select("s_suppkey")
    partsupp(spark, dir)
      .join(parts, col("ps_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
      .orderBy(
        col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size")
      )
  }

  /** TPC-H Q20 shape: suppliers in a region holding excess stock of a
    * part family — the semi-join chain part → partsupp → lineitem-agg →
    * supplier. The correlated quantity subquery decorrelates to one
    * groupBy over the shipdate-filtered lineitem on (partkey, suppkey),
    * LEFT-joined so a never-shipped partsupp row qualifies against zero;
    * the final contraction to suppliers is a distinct-projection
    * broadcast into the supplier dim. One fact shuffle total.
    */
  def excessStockSuppliers(
      spark: SparkSession,
      dir: String,
      region: String = "EUROPE",
      namePrefix: String = "red",
      year: Int = 1996
  ): DataFrame = {
    val redParts = t(spark, dir, "part")
      .filter(col("p_name").startsWith(namePrefix))
      .select("p_partkey")
    val shipped = t(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
          col("l_shipdate") < lit(s"${year + 1}-01-01").cast("timestamp")
      )
      .groupBy(
        col("l_partkey").as("sq_partkey"), col("l_suppkey").as("sq_suppkey")
      )
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val qualified = partsupp(spark, dir)
      .join(redParts, col("ps_partkey") === col("p_partkey"))
      .join(
        shipped,
        col("ps_partkey") === col("sq_partkey") &&
          col("ps_suppkey") === col("sq_suppkey"),
        "left"
      )
      .filter(col("ps_availqty") * 2 > coalesce(col("qty"), lit(0L)))
      .select("ps_suppkey")
      .distinct()
    regionSuppliers(spark, dir, region)
      .join(
        broadcast(qualified),
        col("s_suppkey") === col("ps_suppkey"),
        "left_semi"
      )
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  /** TPC-H Q9 shape: product-type profit by supplier nation and order
    * year — the five-way star over BOTH fact tables (lineitem joined to
    * partsupp on the COMPOUND (partkey, suppkey) key, then part /
    * supplier / nation dims and orders for the year). Profit is exact
    * BIGINT in 1/10000-dollar units: the revenue leg is the decimal
    * product scaled by 10⁴ (integral by construction, so the BIGINT cast
    * is lossless in both engines), the cost leg is `cents × qty × 100` —
    * no float touches any aggregate, so sums hash-match at any partition
    * merge order.
    *
    * Plan shape: the name-filtered part leg broadcasts and prunes
    * partsupp BEFORE the fact join, so the compound-key join against
    * lineitem sees only the surviving family (AQE broadcasts it at small
    * SF; at 100 TB it is the one fact-side shuffle together with the
    * orderkey join to orders). Supplier→nation is a fixed-size broadcast.
    */
  def productProfit(
      spark: SparkSession,
      dir: String,
      nameFragment: String = "gear"
  ): DataFrame = {
    val parts = t(spark, dir, "part")
      .filter(col("p_name").contains(nameFragment))
      .select("p_partkey")
    val ps = partsupp(spark, dir)
      .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
      .select("ps_partkey", "ps_suppkey", "ps_supplycost_cents")
    val suppNation = t(spark, dir, "supplier")
      .join(
        broadcast(t(spark, dir, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey")
      )
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val revenueE4 =
      (dec("l_extendedprice") *
        (lit(1).cast("decimal(12,2)") - dec("l_discount")) *
        lit(10000)).cast("long")
    val costE4 =
      col("ps_supplycost_cents") * col("l_quantity").cast("long") * lit(100L)
    t(spark, dir, "lineitem")
      .join(
        ps,
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey")
      )
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(
        t(spark, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey")
      )
      .groupBy(
        col("nation"),
        year(col("o_orderdate")).cast("long").as("o_year")
      )
      .agg(
        sum(revenueE4 - costE4).as("sum_profit_e4"),
        count(lit(1)).as("n_lines")
      )
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** W9 — three-step conversion funnel (view → click → purchase), the
    * product-analytics staple: per user, the FIRST view, the first click
    * STRICTLY AFTER that view, the first purchase strictly after that
    * click, and the stage count reached. Stage-at-a-time aggregation —
    * min-per-user, join, filter, min again — so each step is one
    * map-side-combined aggregation and every join/aggregation keys on
    * user_id: three exchanges over the SAME key (AQE reuses the
    * partitioning), never a per-user sorted history in memory — the
    * collect_list alternative holds a power user's whole event history
    * in one row, this holds O(1) per user per stage. Timestamps present
    * as unix micros, the w1/w2 oracle convention.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = ActionLog.normalizedEvents(spark, dir)
    def firstAfter(
        evType: String,
        prev: DataFrame,
        prevCol: String,
        outCol: String
    ): DataFrame =
      ev.filter(col("event_type") === evType)
        .join(prev, Seq("user_id"))
        .filter(unix_micros(col("ts")) > col(prevCol))
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as(outCol))
    val views = ev
      .filter(col("event_type") === "view")
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("view_us"))
    val clicks =
      firstAfter("click", views.select("user_id", "view_us"), "view_us", "click_us")
    val buys =
      firstAfter("purchase", clicks, "click_us", "purchase_us")
    ev.select("user_id")
      .distinct()
      .join(views, Seq("user_id"), "left")
      .join(clicks, Seq("user_id"), "left")
      .join(buys, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("view_us"),
        col("click_us"),
        col("purchase_us"),
        (when(col("purchase_us").isNotNull, 3L)
          .when(col("click_us").isNotNull, 2L)
          .when(col("view_us").isNotNull, 1L)
          .otherwise(0L)).as("funnel_stage")
      )
      .orderBy("user_id")
  }

  /** W10 — weekly retention cohorts, the funnel's companion staple: users
    * grouped by FIRST-activity week; for every (cohort week, week offset)
    * the distinct users active that week, the cohort size, and the
    * retention rate in exact ppm. Weeks are pure integer micros division
    * (epoch // 7 days) so the bucketing replays bit-for-bit in DuckDB.
    * Shape: one (user, week) distinct, a min-per-user on the same key,
    * and a cohort-grain aggregation whose OUTPUT is weeks² rows —
    * driver-trivial at any corpus size; nothing user-grain survives the
    * final aggregation.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = ActionLog.normalizedEvents(spark, dir)
    val act = ev
      .select(
        col("user_id"),
        expr("unix_micros(ts) DIV 604800000000").as("week")
      )
      .distinct()
    val cohort = act.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    act
      .join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      // act is distinct on (user, week) and week is determined by
      // (cohort_week, offset), so each user contributes at most one row
      // per group: a plain count IS the distinct-user count, without the
      // two-level distinct aggregate over the user-grain stage
      .agg(count(lit(1)).as("n_users"))
      .join(sizes, Seq("cohort_week"))
      .select(
        col("cohort_week"),
        col("week_offset"),
        col("n_users"),
        col("cohort_size"),
        expr("n_users * 1000000 DIV cohort_size").as("retained_ppm")
      )
      .orderBy("cohort_week", "week_offset")
  }
}
