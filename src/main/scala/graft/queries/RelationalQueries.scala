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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (q1Pricing _),
    "q3_top_orders" -> (q3TopOrders _),
    "q5_region_revenue" -> (q5RegionRevenue _),
    "w1_running_revenue" -> (w1RunningRevenue _),
    "set_compare_migration" -> (setCompareMigration _),
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing" -> q1PricingSql,
    "q3_top_orders" -> q3TopOrdersSql,
    "q5_region_revenue" -> q5RegionRevenueSql,
    "w1_running_revenue" -> w1RunningRevenueSql,
    "set_compare_migration" -> setCompareMigrationSql,
  )
}
