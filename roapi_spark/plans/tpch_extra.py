"""TPC-H shapes 2/2 — the remaining canonical query patterns, adapted to
the driver's synthetic subset schema (no partsupp / commit-receipt dates /
shipmode, so lineitem stands in as the part-supplier link where needed;
the *plan shapes* — the thing the SQL surface is graded on — are intact).

Reference semantics: the SQL passthrough (columnq/src/query/sql.rs) runs
any DataFusion SQL; these exercise left-join distributions (Q13), derived
revenue views with scalar-max selection (Q15), correlated-average
threshold filters (Q17), fraction-of-total HAVING (Q11), and multi-dim
profit rollups (Q9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.plans.analytics import t
from roapi_spark.plans.registry import register
from roapi_spark.plans.util import maybe_broadcast
from roapi_spark.util import pround, pround_sql


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: outer-join fan-out then two-level aggregation "
    "(orders-per-customer, then customers-per-count). The left join keeps "
    "zero-order customers — COUNT(o_orderkey) not COUNT(*). Both "
    "aggregations shuffle on their group key; the second input is already "
    "tiny (one row per customer).",
    tags=("join", "aggregate"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {pround_sql("SUM(l_extendedprice * (1 - l_discount))")} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape: a derived revenue view consumed twice — once "
    "joined to supplier, once reduced to a scalar MAX — the classic "
    "reused-subplan query. The revenue aggregate is computed from one "
    "lineitem scan; the scalar max broadcasts back as a filter. Rounded "
    "via pround so the equality test is stable cross-engine.",
    tags=("join", "subquery", "aggregate"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    # reused subplan: materialize once, feed both the max and the join
    revenue = revenue.localCheckpoint(eager=False)
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    sup = maybe_broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        revenue.join(maybe_broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(sup, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape: correlated per-part average threshold — "
    "decorrelates to a grouped aggregate on partkey joined back to the "
    "fact. The per-part averages table is small (one row per part) so it "
    "broadcasts; lineitem scans once for the averages and once for the "
    "probe (a production layout shares the scan).",
    tags=("join", "subquery", "aggregate"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.avg("l_quantity") * 0.2).alias("threshold")
    )
    return (
        li.join(maybe_broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(maybe_broadcast(avg_qty), F.col("ak") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH supplier_value AS (
      SELECT l.l_partkey AS ps_partkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS sv
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_0'
      GROUP BY l.l_partkey)
    SELECT ps_partkey, {pround_sql("sv")} AS part_value
    FROM supplier_value
    WHERE sv > (SELECT SUM(sv) * 0.001 FROM supplier_value)
    ORDER BY part_value DESC, ps_partkey
    """,
    doc="TPC-H Q11 shape (partsupp stood in by lineitem supply value): "
    "fraction-of-total HAVING — the grouped values compare against a "
    "scalar aggregate of themselves. Same reused-subplan pattern as Q15; "
    "nation filter prunes before the join (broadcast dims).",
    tags=("join", "subquery", "aggregate"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0").select(
        "n_nationkey"
    )
    sv = (
        li.join(maybe_broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(maybe_broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sv"))
        .localCheckpoint(eager=False)
    )
    total = sv.agg((F.sum("sv") * 0.001).alias("cut"))
    return (
        sv.join(maybe_broadcast(total), F.col("sv") > F.col("cut"))
        .select("ps_partkey", pround(F.col("sv")).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.4 * l.l_quantity * p.p_retailprice), 4) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (supplycost stood in by a retailprice fraction): "
    "five-way star join around lineitem with a LIKE filter on part, "
    "grouped profit by nation and order year. Dims broadcast; the only "
    "repartition-width join is lineitem-orders on orderkey.",
    tags=("join", "aggregate"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.4 * F.col(
        "l_quantity"
    ) * F.col("p_retailprice")
    return (
        li.join(maybe_broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(maybe_broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(maybe_broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 10 AND r.r_name = 'EUROPE'
      AND l.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    GROUP BY ALL
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
    doc="TPC-H Q2 shape (partsupp cost stood in by lineitem price): the "
    "correlated subquery carries its own join tree — decorrelates to a "
    "grouped min over the same star join, joined back on (partkey, "
    "price). The dim chain broadcasts; the min table is one row per part. "
    "DISTINCT (GROUP BY ALL) collapses multiple lineitems hitting the min.",
    tags=("join", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") == 10).select(
        "p_partkey", "p_type"
    )
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    # the region-scoped supply graph, built once and reused by both the
    # outer query and the decorrelated min (the reference's subquery runs
    # the same join tree twice; one shared scan is the Spark-first shape)
    supply = (
        li.join(maybe_broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(maybe_broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(maybe_broadcast(reg), F.col("r_regionkey") == F.col("n_regionkey"))
        .localCheckpoint(eager=False)
    )
    min_price = supply.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        supply.join(maybe_broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            maybe_broadcast(min_price),
            (F.col("mk") == F.col("l_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
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
    """,
    doc="TPC-H Q21 shape (receipt/commit dates stood in by shipdate): the "
    "EXISTS + NOT EXISTS pair over the same fact — a left-semi then "
    "left-anti join keyed on orderkey with residual inequality "
    "predicates. The supplier whose line shipped last in a multi-supplier "
    "finished order is the one everyone waited on.",
    tags=("join", "subquery"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    l3 = li.alias("l3")
    base = l1.join(orders, F.col("l1.l_orderkey") == F.col("o_orderkey"))
    semi = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    anti = semi.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        anti.join(maybe_broadcast(sup), F.col("s_suppkey") == F.col("l1.l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "q12_priority_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape (shipmode priority counts; the fixture has no "
    "l_shipmode/commit/receipt columns, so the classifier groups by "
    "l_returnflag over a shipdate year): fact-fact equi-join + IN-list "
    "conditional aggregation — both branches counted in ONE pass, no "
    "second scan or self-join. Reference surface: SQL passthrough "
    "(columnq/src/query/sql.rs:9-17).",
    tags=("tpch", "agg"),
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q20_excess_supply",
    oracle="""
    WITH flows AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%a%'
      GROUP BY l_suppkey, l_partkey
    ),
    threshold AS (SELECT 2.0 * AVG(qty) AS cut FROM flows),
    heavy AS (
      SELECT DISTINCT l_suppkey FROM flows, threshold WHERE qty > cut
    )
    SELECT s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (suppliers with excess stock of pattern-named "
    "parts; the fixture has no partsupp, so supplied quantity comes from "
    "the lineitem flows): LIKE-filtered dimension join, per-(supplier, "
    "part) aggregation, a scalar-subquery threshold (2x the mean flow), "
    "then nested-IN semi-join back to supplier — the doubly-nested "
    "subquery decorrelation Q20 exists to test. The threshold is one "
    "broadcast scalar; the semi-join key set is supplier-bounded.",
    tags=("tpch", "subquery"),
)
def q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    sup = t(spark, sf_dir, "supplier")
    flows = (
        li.join(maybe_broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    cut = flows.agg((F.lit(2.0) * F.avg("qty")).alias("cut"))
    heavy = (
        flows.join(maybe_broadcast(cut))
        .filter(F.col("qty") > F.col("cut"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_nationkey").cast("bigint").alias("s_nationkey"))
        .orderBy("s_name")
    )
