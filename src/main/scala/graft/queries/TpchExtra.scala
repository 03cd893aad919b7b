package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Further TPC-H-shaped plans adapted to the test schema (the reference's
  * optimizer golden-plan corpus is TPC-H/TPC-DS/SSB —
  * /root/reference/tests/optimizers/tpch/; these exercise the same plan
  * shapes: exists/anti pipelines, multi-fact joins, disjunctive predicate
  * pushdown, conditional ratios, large-order HAVING pipelines).
  */
object TpchExtra {
  import Num._

  private def ts(s: String) = lit(Timestamp.valueOf(s))

  val defs: Seq[QueryDef] = Seq(
    // Q4: order priority checking — orders with at least one late item.
    QueryDef(
      "q4_order_priority",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-07-01 00:00:00") &&
                  col("o_orderdate") < ts("1996-10-01 00:00:00"))
        val l = Tables(s, dir, "lineitem")
        o.join(l, col("l_orderkey") === col("o_orderkey") &&
                  col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // Q7: volume shipping between two nation pairs (supplier vs customer
    // nation), by year.
    QueryDef(
      "q7_volume_shipping",
      (s, dir) => {
        val n1 = Tables(s, dir, "nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables(s, dir, "nation").select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        val l = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        val sup = Tables(s, dir, "supplier")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter(col("supp_nation") < col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
                   year(col("l_shipdate")).as("l_year"))
          .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .filter(col("revenue") > 0)
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name < n2.n_name
        GROUP BY 1, 2, 3
        HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) > 0
        ORDER BY supp_nation, cust_nation, l_year""")),

    // Q12-like: shipping buckets × priority classes (conditional agg over
    // a join; shipmode surrogate = linenumber bucket).
    QueryDef(
      "q12_ship_priority_class",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val l = Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                  col("l_shipdate") < ts("1997-01-01 00:00:00"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy((col("l_linenumber") % 2).as("ship_bucket"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("low_line_count"))
          .orderBy(col("ship_bucket"))
      },
      Some("""
        SELECT (l_linenumber % 2) AS ship_bucket,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1
        ORDER BY ship_bucket""")),

    // Q14: promo revenue ratio (conditional numerator / total).
    QueryDef(
      "q14_promo_revenue",
      (s, dir) => {
        val p = Tables(s, dir, "part")
        val l = Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-03-01 00:00:00") &&
                  col("l_shipdate") < ts("1996-04-01 00:00:00"))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .agg(
            (lit(100.0) *
              dsum6(when(col("p_type") === "PROMO",
                col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0))) /
              dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("promo_revenue_pct"))
      },
      Some("""
        SELECT 100.0 *
          CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
            THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) /
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
          AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""")),

    // Q16-like: supplier-count per (brand, type, size) excluding one brand.
    QueryDef(
      "q16_parts_supplier_breadth",
      (s, dir) => {
        val p = Tables(s, dir, "part").filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        val l = Tables(s, dir, "lineitem")
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
          .limit(50)
      },
      Some("""
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,10,15,20,25,30,35)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 50""")),

    // Q18: large-volume customers (HAVING over fact agg, join back).
    QueryDef(
      "q18_large_orders",
      (s, dir) => {
        val big = Tables(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(dsum2(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 150)
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        big.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
                  col("o_orderdate"), col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(30)
      },
      Some("""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM (SELECT l_orderkey,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150) t
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 30""")),

    // Q19: disjunctive multi-attribute predicates (OR-of-ANDs pushdown).
    QueryDef(
      "q19_disjunctive_revenue",
      (s, dir) => {
        val p = Tables(s, dir, "part")
        val l = Tables(s, dir, "lineitem")
        val cond =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(cond)
          .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
               count(lit(1)).as("n_items"))
      },
      Some("""
        SELECT
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""")),

    // Q2-like: per part, the shipping supplier with minimal account
    // balance (correlated min over a join — decorrelated by Catalyst).
    QueryDef(
      "q2_min_cost_supplier",
      (s, dir) => {
        Seq("part", "supplier", "lineitem").foreach(t =>
          Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql("""
          SELECT p_partkey, s_suppkey, s_name, s_acctbal
          FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
          WHERE p.p_size = 15 AND p.p_type = 'PROMO'
            AND s.s_acctbal = (
              SELECT MIN(s2.s_acctbal)
              FROM supplier s2 JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
              WHERE l2.l_partkey = p.p_partkey)
          GROUP BY 1, 2, 3, 4
          ORDER BY p_partkey, s_suppkey""")
      },
      Some("""
        SELECT p_partkey, s_suppkey, s_name, s_acctbal
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE p.p_size = 15 AND p.p_type = 'PROMO'
          AND s.s_acctbal = (
            SELECT MIN(s2.s_acctbal)
            FROM supplier s2 JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
            WHERE l2.l_partkey = p.p_partkey)
        GROUP BY 1, 2, 3, 4
        ORDER BY p_partkey, s_suppkey""")),

    // Q11-like: suppliers holding an outsized share of total shipped value
    // (group HAVING vs a global scalar threshold).
    QueryDef(
      "q11_important_stock",
      (s, dir) => {
        // r15 (guide §2.4 "remove shuffles outright"): the SQL form's
        // scalar subquery re-scanned lineitem end to end just for the
        // grand total. Decimal addition is exact and associative, so the
        // total is the sum of the per-supplier group sums — built ON TOP
        // of the same grouped exchange, which ReuseExchange then dedupes:
        // one lineitem scan + one grouped aggregate feed both the rows
        // and the threshold (2 scans / 2 agg pipelines → 1 each). The
        // double cast happens only at the comparison/output, exactly as
        // before, so values are bit-identical.
        val li = Tables(s, dir, "lineitem")
        val grouped = li.groupBy(col("l_suppkey"))
          .agg(sum((col("l_extendedprice") * col("l_quantity"))
            .cast("decimal(18,4)")).as("__dec"))
        val total = grouped.agg(sum(col("__dec")).as("__tot"))
        grouped.crossJoin(broadcast(total))
          .filter(col("__dec").cast("double") >
            col("__tot").cast("double") * 0.0015)
          .select(col("l_suppkey"), col("__dec").cast("double").as("value"))
          .orderBy(col("value").desc, col("l_suppkey"))
      },
      Some("""
        SELECT l_suppkey,
          CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS value
        FROM lineitem
        GROUP BY l_suppkey
        HAVING CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) > (
          SELECT CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) * 0.0015
          FROM lineitem)
        ORDER BY value DESC, l_suppkey""")),

    // Q20-like: suppliers who shipped a large PROMO volume (IN over a
    // grouped-HAVING subquery — nested semi-join pipeline).
    QueryDef(
      "q20_promo_volume_suppliers",
      (s, dir) => {
        Seq("part", "supplier", "lineitem").foreach(t =>
          Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql("""
          SELECT s_suppkey, s_name
          FROM supplier
          WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_type = 'PROMO'
            GROUP BY l_suppkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 120)
          ORDER BY s_suppkey""")
      },
      Some("""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_type = 'PROMO'
          GROUP BY l_suppkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 120)
        ORDER BY s_suppkey""")),

    // Q22: customers with above-average balance and no orders, by prefix
    // cohort (scalar subquery + anti join).
    QueryDef(
      "q22_global_sales_opportunity",
      (s, dir) => {
        Tables(s, dir, "customer").createOrReplaceTempView("customer")
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""
          SELECT (c_custkey % 7) AS cohort, COUNT(*) AS numcust,
            CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
          FROM customer
          WHERE c_acctbal > (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
              FROM customer WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          GROUP BY 1
          ORDER BY cohort""")
      },
      Some("""
        SELECT (c_custkey % 7) AS cohort, COUNT(*) AS numcust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY 1
        ORDER BY cohort"""))
  )
}
