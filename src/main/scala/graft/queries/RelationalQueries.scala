package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Headline relational queries (scan → filter → join → agg → window → sort)
  * over the harness star schema. These are the bench workload and double as
  * coverage for the standard-operator checklist in SURVEY.md §2.D
  * (projection/filter/joins/aggregation/window/sort/set-ops).
  *
  * Parity note: every floating sum goes through DECIMAL so the result is
  * exact and order-independent (identical under DuckDB); derived ratios are
  * computed from the exact sums in double math and rounded. Final output
  * columns are DOUBLE, never DECIMAL — DECIMAL(38,x) output columns fail the
  * driver's hash compare on representation despite value parity
  * (CORRECTNESS_r01), while doubles derived from the same exact decimals
  * hash-match.
  */
object RelationalQueries {

  private val D2 = DecimalType(18, 2)

  /** TPC-H Q1-shaped pricing summary. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val price = col("l_extendedprice").cast(D2)
    val disc = col("l_discount").cast(DecimalType(4, 2))
    val tax = col("l_tax").cast(DecimalType(4, 2))
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(D2)).cast(DoubleType).as("sum_qty"),
        sum(price).cast(DoubleType).as("sum_base_price"),
        sum(price * (lit(1).cast(DecimalType(3, 2)) - disc))
          .cast(DoubleType).as("sum_disc_price"),
        sum(price * (lit(1).cast(DecimalType(3, 2)) - disc) *
            (lit(1).cast(DecimalType(3, 2)) + tax))
          .cast(DoubleType).as("sum_charge"),
        round(sum(col("l_quantity").cast(D2)).cast(DoubleType) /
          count(lit(1)), 4).as("avg_qty"),
        round(sum(price).cast(DoubleType) / count(lit(1)), 4).as("avg_price"),
        round(sum(disc).cast(DoubleType) / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*), 4) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*), 4) AS avg_price,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)/count(*), 4) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-shaped: top unshipped-revenue orders.
    * customer ⋈ orders ⋈ lineitem; only the filtered customer DIM is
    * explicitly broadcast — the date filter keeps nearly all of orders, so
    * broadcasting the orders⋈customer product (the r1 plan) would ship a
    * fact-sized table to every executor and kill the driver at 100 TB.
    * lineitem⋈orders shuffles on orderkey; AQE picks the strategy from
    * runtime stats (and may legitimately broadcast at small SF).
    */
  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15 00:00:00")))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > to_timestamp(lit("1995-03-15 00:00:00")))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val revenue = sum(col("l_extendedprice").cast(D2) *
      (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(4, 2))))
      .cast(DoubleType)
    li.join(ord.join(broadcast(cust),
        col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3TopOrdersSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped: revenue by nation for one region (5-way join; all
    * dimension tables broadcast, lineitem never shuffles pre-agg).
    */
  def q5RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.load(s, dir, "nation")
    val supplier = Tables.load(s, dir, "supplier")
    val li = Tables.load(s, dir, "lineitem")
      .select("l_suppkey", "l_extendedprice", "l_discount")
    val dims = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"))
    val revenue = sum(col("l_extendedprice").cast(D2) *
      (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(4, 2))))
      .cast(DoubleType)
    li.join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5RegionRevenueSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem, supplier, nation, region
      |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Window functions: per-supplier ship-date ordering with running revenue
    * and per-supplier rank of item price (SURVEY §2.D window coverage).
    */
  def w1RunningRevenue(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.load(s, dir, "lineitem")
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.select(
        col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast(LongType).as("l_linenumber"),
        col("l_shipdate"),
        row_number().over(w).cast(LongType).as("rn"),
        sum(col("l_extendedprice").cast(D2)).over(running)
          .cast(DoubleType).as("running_price"),
        lag(col("l_orderkey"), 1).over(w).as("prev_orderkey"))
      .filter(col("rn") <= 20)
      .orderBy("l_suppkey", "rn")
  }

  val w1RunningRevenueSql: String =
    """SELECT * FROM (
      |  SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_shipdate,
      |    CAST(row_number() OVER w AS BIGINT) AS rn,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_price,
      |    lag(l_orderkey, 1) OVER w AS prev_orderkey
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      |) WHERE rn <= 20 ORDER BY l_suppkey, rn""".stripMargin

  /** Set ops: source-vs-target comparison (reference README.md:211 "Quickly
    * compare source to target data during migration" — Parallel use case).
    * Here: customers with orders in 1995-1996 EXCEPT-ALL customers with
    * orders in 1997+, both directions, tagged.
    */
  def setCompareMigration(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    val a = ord.filter(col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .select(col("o_custkey")).distinct()
    val b = ord.filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")))
      .select(col("o_custkey")).distinct()
    a.exceptAll(b).withColumn("side", lit("source_only"))
      .unionByName(b.exceptAll(a).withColumn("side", lit("target_only")))
      .orderBy("side", "o_custkey")
  }

  val setCompareMigrationSql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, 'source_only' AS side FROM (
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |    EXCEPT ALL
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
      |  UNION ALL
      |  SELECT o_custkey, 'target_only' AS side FROM (
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    EXCEPT ALL
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
      |) ORDER BY side, o_custkey""".stripMargin

  /** Semi-join / EXISTS (TPC-H Q4 shape): orders with at least one line
    * shipped more than 60 days after the order date. The EXISTS becomes a
    * LEFT SEMI join — at scale both sides shuffle on orderkey (no fact-side
    * broadcast), AQE may broadcast at small SF.
    */
  def q4PriorityExists(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00")))
    val li = Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_ct"))
      .orderBy("o_orderpriority")
  }

  val q4PriorityExistsSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_ct
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Correlated scalar subquery (TPC-H Q2 shape): parts priced at their
    * brand's minimum. Spark-first: the correlated min is a tiny grouped
    * aggregate broadcast back against the fact — no per-row subquery.
    */
  def q2MinCost(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
    val minB = part.groupBy("p_brand")
      .agg(min("p_retailprice").as("min_price"))
    part.join(broadcast(minB), Seq("p_brand"))
      .filter(col("p_retailprice") === col("min_price"))
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
      .orderBy("p_brand", "p_partkey")
  }

  val q2MinCostSql: String =
    """SELECT p_brand, p_partkey, p_retailprice FROM part p
      |WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
      |  WHERE p2.p_brand = p.p_brand)
      |ORDER BY p_brand, p_partkey""".stripMargin

  /** ROLLUP aggregation — computed WITHOUT Catalyst's Expand: the finest
    * grouping is aggregated once (exact decimal sums), then the subtotal
    * and grand-total levels re-aggregate that tiny result. Expand-based
    * rollup replicates every input row once per grouping level — a 3× scan
    * blowup at 100 TB for identical semantics.
    */
  def rollupPricing(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val base = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast(D2)).as("q"),
        count(lit(1)).as("n"))
    val lvl1 = base.groupBy("l_returnflag")
      .agg(sum("q").as("q"), sum("n").as("n"))
      .withColumn("l_linestatus", lit(null).cast(StringType))
    val lvl0 = base.agg(sum("q").as("q"), sum("n").as("n"))
      .withColumn("l_returnflag", lit(null).cast(StringType))
      .withColumn("l_linestatus", lit(null).cast(StringType))
    val cols = Seq("l_returnflag", "l_linestatus", "q", "n").map(col)
    base.select(cols: _*)
      .unionByName(lvl1.select(cols: _*))
      .unionByName(lvl0.select(cols: _*))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("q").cast(DoubleType).as("sum_qty"), col("n").as("row_ct"))
      .orderBy(asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))
  }

  val rollupPricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS row_ct
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (q1Pricing _),
    "q2_min_cost" -> (q2MinCost _),
    "q3_top_orders" -> (q3TopOrders _),
    "q4_priority_exists" -> (q4PriorityExists _),
    "q5_region_revenue" -> (q5RegionRevenue _),
    "rollup_pricing" -> (rollupPricing _),
    "w1_running_revenue" -> (w1RunningRevenue _),
    "set_compare_migration" -> (setCompareMigration _),
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing" -> q1PricingSql,
    "q2_min_cost" -> q2MinCostSql,
    "q3_top_orders" -> q3TopOrdersSql,
    "q4_priority_exists" -> q4PriorityExistsSql,
    "q5_region_revenue" -> q5RegionRevenueSql,
    "rollup_pricing" -> rollupPricingSql,
    "w1_running_revenue" -> w1RunningRevenueSql,
    "set_compare_migration" -> setCompareMigrationSql,
  )
}
