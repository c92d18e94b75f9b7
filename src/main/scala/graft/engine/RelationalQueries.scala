package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational query surface — the capability class the reference
  * advertised ("queries for data filtering and aggregation",
  * reference `README.md:4`) and delegated to Athena ANSI SQL
  * (`README.md:14-16`). Re-expressed natively on Catalyst: filter +
  * aggregation, joins (broadcast/shuffle/semi/anti/outer), set ops,
  * rollup/cube, window functions, top-k, subqueries.
  *
  * Scale notes (100 TB discipline):
  *  - dimension joins (`nation`, `region`, small `customer` slices) are
  *    explicitly `broadcast()` — no shuffle of the fact side;
  *  - fact-fact joins key on the natural join key so AQE + shuffle hash
  *    join apply; no driver-side collection anywhere;
  *  - aggregations are partial-agg friendly (plain hash agg over
  *    codegen'd exprs);
  *  - filters & projections stay at the head of the plan so Parquet gets
  *    pushdown + column pruning (plan features enforced by PlanAuditSpec;
  *    human-readable report via `runMain graft.PlanAudit`).
  */
object RelationalQueries {
  import Tables.table

  private val D = "yyyy-MM-dd"
  private def tsLit(s: String) = to_timestamp(lit(s), D)

  // EP2 surface (SQL strings over registered views, reference
  // README.md:14-16): q77-q79 run ONE text through both engines —
  // spark.sql on the temp-view registry and the DuckDB oracle verbatim —
  // so the parser/analyzer path itself is under test, kept to the
  // ANSI ∩ (Spark, DuckDB) dialect subset.

  /** TPC-H Q3 shape: 3-way join, filtered fact, grouped revenue, top-k.
    * Catalyst broadcasts both dims and orders a single shuffle on the
    * group key; revenue ties are broken by key so LIMIT is total-order
    * deterministic. */
  private val SqlJoin3 =
    """SELECT o.o_orderkey,
      |       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
      |       o.o_orderpriority
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY o.o_orderkey, o.o_orderpriority
      |ORDER BY revenue DESC, o.o_orderkey
      |LIMIT 10""".stripMargin

  /** CTE + window in SQL text: top-3 accounts per segment. ROW_NUMBER is
    * INT in Spark and BIGINT in DuckDB — cast in the text so both
    * engines emit the same schema. */
  private val SqlWindowCte =
    """WITH ranked AS (
      |  SELECT c_mktsegment, c_name, c_acctbal,
      |         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer)
      |SELECT c_mktsegment, c_name, ROUND(c_acctbal, 2) AS acctbal,
      |       CAST(rn AS BIGINT) AS rn
      |FROM ranked WHERE rn <= 3
      |ORDER BY c_mktsegment, rn""".stripMargin

  /** Correlated EXISTS in SQL text (Catalyst rewrites to a left-semi
    * join; 82 of 100 suppliers qualify at sf0.01 — selective enough to
    * prove the predicate correlates). */
  private val SqlExists =
    """SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_suppkey = s.s_suppkey
      |                AND l.l_quantity > 49 AND l.l_extendedprice > 90000)
      |ORDER BY s.s_suppkey""".stripMargin

  /** EP2 breadth (round-8 advice): GROUPING SETS + GROUPING() + EXCEPT
    * as ONE ANSI text through both engines. Counts only in the EXCEPT
    * key — a float aggregate there would make the set-diff depend on
    * summation order across two CTE evaluations. The EXCEPT removes the
    * grand-total slice (g_nation = 1), leaving the per-nation and
    * per-(nation, status) sets; NULLS FIRST is spelled out because the
    * engines' ASC defaults differ. */
  private val SqlGroupingSets =
    """WITH agg AS (
      |  SELECT n_name, o_orderstatus,
      |         CAST(GROUPING(n_name) AS INT)       AS g_nation,
      |         CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |         CAST(COUNT(*) AS BIGINT)            AS n
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation   ON c_nationkey = n_nationkey
      |  GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), ()))
      |SELECT n_name, o_orderstatus, g_nation, g_status, n FROM agg
      |EXCEPT
      |SELECT n_name, o_orderstatus, g_nation, g_status, n FROM agg
      |WHERE g_nation = 1
      |ORDER BY g_status, n_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** ONE ANSI text through both engines (the EP2/Athena-delegation
    * surface, like q99): the remaining common idiom class — windowed
    * dedup without QUALIFY (`ROW_NUMBER() ... WHERE rn = 1`) over a
    * UNION ALL of two differently-shaped sources, finished with
    * GROUP BY + HAVING gated on a scalar subquery (buckets above the
    * average bucket total — genuinely selective at EVERY sf, where a
    * constant threshold degenerates to all-or-nothing because
    * sequential custkeys make `k % 100` buckets uniform). The rank's
    * ORDER BY is a total order within each key (amount, then source
    * tag, then id), so the kept row — and therefore every aggregate —
    * is engine-independent. */
  private val SqlWindowedDedup =
    """WITH u AS (
      |  SELECT o_custkey AS k, o_totalprice AS amount,
      |         'o' AS src, o_orderkey AS id
      |  FROM orders
      |  UNION ALL
      |  SELECT c_custkey AS k, c_acctbal AS amount,
      |         'c' AS src, c_custkey AS id
      |  FROM customer),
      |r AS (
      |  SELECT k, amount, src,
      |         ROW_NUMBER() OVER (PARTITION BY k
      |                            ORDER BY amount DESC, src, id) AS rn
      |  FROM u),
      |d AS (SELECT k, amount, src FROM r WHERE rn = 1)
      |SELECT CAST(k % 100 AS INT) AS bucket,
      |       CAST(COUNT(*) AS BIGINT) AS n_keys,
      |       CAST(SUM(CASE WHEN src = 'o' THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_from_orders,
      |       ROUND(SUM(amount), 2) AS total_best
      |FROM d
      |GROUP BY k % 100
      |HAVING SUM(amount) > (SELECT SUM(amount) / 100.0 FROM d)
      |ORDER BY bucket""".stripMargin

  /** ONE ANSI text through both engines: correlated LATERAL subquery
    * with per-row ORDER BY + LIMIT — the "top-N related rows per outer
    * row" idiom (the last common Athena idiom class after q21/q77-q79/
    * q99/q104). Both engines decorrelate it to a ranked join rather
    * than executing the subquery per row; the inner ORDER BY is a
    * total order (price, then key), so the kept pair is engine-
    * independent. The outer filter keeps the result bounded at any
    * sf. */
  private val SqlLateralTopN =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |     LATERAL (SELECT o_orderkey, o_totalprice
      |              FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |              ORDER BY o_totalprice DESC, o_orderkey
      |              LIMIT 2) t
      |WHERE c.c_custkey % 50 = 0
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  /** Recursive CTE (Spark 4's WITH RECURSIVE — the iterate-until-
    * fixpoint SQL surface, per-root hierarchy rollup): the customer
    * keys form a deterministic forest (parent = key div 10, roots
    * key < 10, depth ≤ 3 at any tested sf since keys are contiguous),
    * and the walk aggregates size/depth/balance per root. Engine
    * dialects differ ONLY in the integer-division operator, so the
    * template takes it as a parameter — the recursion, join shape, and
    * aggregate text are byte-shared. Each recursion step is one join
    * of the frontier against the dimension (Spark executes it as an
    * iterated union with the frontier on the broadcast side at these
    * cardinalities); the level limit guards runaway recursion. */
  private def sqlRecursiveRollup(idiv: String) =
    s"""WITH RECURSIVE chain(custkey, root, depth, bal) AS (
       |  SELECT c_custkey, c_custkey, 0, c_acctbal
       |  FROM customer WHERE c_custkey < 10
       |  UNION ALL
       |  SELECT c.c_custkey, h.root, h.depth + 1, c.c_acctbal
       |  FROM customer c JOIN chain h ON (c.c_custkey $idiv 10) = h.custkey
       |  WHERE c.c_custkey >= 10)
       |SELECT root, CAST(COUNT(*) AS BIGINT) AS n,
       |       CAST(MAX(depth) AS INT) AS max_depth,
       |       ROUND(SUM(bal), 2) AS total_bal
       |FROM chain GROUP BY root ORDER BY root""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q125_sql_lateral", SqlLateralTopN) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(SqlLateralTopN)
    },

    QuerySpec("q137_sql_recursive", sqlRecursiveRollup("//")) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(sqlRecursiveRollup("DIV"))
    },

    QuerySpec(
      "q144_window_ranks",
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(NTILE(4) OVER w AS INT) AS quartile,
        |       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |       ROUND(CUME_DIST() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |QUALIFY o_orderkey % 100 = 0
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin) { (s, dir) =>
      // The remaining ranked-window surface in one query: NTILE /
      // PERCENT_RANK / CUME_DIST per priority class. NTILE is
      // POSITION-based, so the window order carries the unique
      // (price, orderkey) tie-break — without it equal prices make the
      // quartile assignment nondeterministic and the hash compare
      // meaningless. The filter keeps output bounded at any sf and runs
      // AFTER the windows (QUALIFY on the oracle side, post-window
      // filter here), so ranks are computed over the FULL partition.
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .filter(col("o_orderkey") % 100 === 0)
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    },

    // ----- aggregation family (A4) ---------------------------------------
    QuerySpec(
      "q01_filter_agg",
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2)                          AS sum_qty,
        |       ROUND(SUM(l_extendedprice), 2)                     AS sum_base_price,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
        |       ROUND(AVG(l_quantity), 6)                          AS avg_qty,
        |       ROUND(AVG(l_extendedprice), 6)                     AS avg_price,
        |       COUNT(*)                                           AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= tsLit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    QuerySpec(
      "q02_project_scalar",
      """SELECT l_orderkey, l_linenumber,
        |       floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |             * 10000 + 0.5) / 10000 AS charge,
        |       CAST(l_shipdate AS DATE)        AS ship_date,
        |       CAST(YEAR(l_shipdate) AS INT)   AS ship_year,
        |       CAST(MONTH(l_shipdate) AS INT)  AS ship_month,
        |       CAST(DAY(l_shipdate) AS INT)    AS ship_day
        |FROM lineitem
        |WHERE l_quantity >= 49
        |ORDER BY l_orderkey, l_linenumber, charge, ship_date
        |LIMIT 1000""".stripMargin) { (s, dir) =>
      // P5/P6/P7: cast, arithmetic expr, date-part extraction — the derived
      // Timestamp/Year/Month/Day pattern of reference sparkle-v9.py:115-122.
      // Bounded output: sort+limit plans TakeOrderedAndProject (per-
      // partition heaps), not a global sort of a linear-size projection —
      // an unbounded ordered dump is a driver bottleneck at 100 TB.
      table(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // round-half-up spelled as floor(x*1e4 + 0.5)/1e4 in BOTH
          // texts: engine ROUND implementations disagree by 1 ulp on
          // decimal midpoints (seen at sf0.1 — 36350.40465 rounded .4047
          // by Spark, .4046 by DuckDB); an explicit identical IEEE op
          // sequence is bit-equal everywhere
          (floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax")) * 10000 + 0.5) / 10000).as("charge"),
          col("l_shipdate").cast("date").as("ship_date"),
          year(col("l_shipdate")).as("ship_year"),
          month(col("l_shipdate")).as("ship_month"),
          dayofmonth(col("l_shipdate")).as("ship_day"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // charge + ship_date complete the total order so LIMIT is stable.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("charge"),
          col("ship_date"))
        .limit(1000)
    },

    QuerySpec(
      "q03_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus = 'O'
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25""".stripMargin) { (s, dir) =>
      // A5: sort + limit top-k. Catalyst plans TakeOrderedAndProject —
      // per-partition heaps, no global sort shuffle. Scale-safe for any N.
      table(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    },

    // ----- join family (A6) ----------------------------------------------
    QuerySpec(
      "q04_join_broadcast",
      """SELECT r.r_name AS region_name, n.n_name AS nation_name,
        |       COUNT(*) AS n_customers, ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name
        |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
      // Dim tables broadcast: the fact side never shuffles for the join.
      val c = table(s, dir, "customer")
      val n = broadcast(table(s, dir, "nation"))
      val r = broadcast(table(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name").as("region_name"), n("n_name").as("nation_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_acctbal"))
        .orderBy(col("region_name"), col("nation_name"))
    },

    QuerySpec(
      "q05_join_shuffle_agg",
      """SELECT o.o_orderpriority,
        |       COUNT(*) AS n_lines,
        |       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin) { (s, dir) =>
      // Fact-fact equi-join on the shared key; filter applied before the
      // join so the shuffle moves only the surviving year of orders.
      val l = table(s, dir, "lineitem")
      val o = table(s, dir, "orders")
        .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
          col("o_orderdate") < tsLit("1997-01-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("o_orderpriority"))
    },

    QuerySpec(
      "q06_semi_join",
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_acctbal > 9000
        |  AND EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = table(s, dir, "customer").filter(col("c_acctbal") > 9000)
      val o = table(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    QuerySpec(
      "q07_anti_join",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders").filter(col("o_totalprice") > 350000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    QuerySpec(
      "q08_outer_join",
      """SELECT c.c_custkey,
        |       COUNT(o.o_orderkey)                       AS n_orders,
        |       ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spent
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey
        |ORDER BY n_orders, c_custkey
        |LIMIT 100""".stripMargin) { (s, dir) =>
      // Outer join + per-key agg (one shuffle each), then a BOUNDED
      // ordered result via TakeOrdered — no global sort of O(customers)
      // output. Ordering by n_orders ASC surfaces the outer-join rows
      // (customers with zero orders) first.
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"),
          round(coalesce(sum(o("o_totalprice")), lit(0)), 2).as("total_spent"))
        .orderBy(col("n_orders"), col("c_custkey"))
        .limit(100)
    },

    // ----- distinct / set ops (A1, A3) ------------------------------------
    QuerySpec(
      "q09_distinct",
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey"))
        .distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey"))
    },

    QuerySpec(
      "q10_union",
      """SELECT key FROM (
        |  SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9500
        |  UNION
        |  SELECT o_custkey AS key FROM orders WHERE o_totalprice > 450000
        |) ORDER BY key""".stripMargin) { (s, dir) =>
      // A3 union — as set-union (the reference's union+append combo was
      // defect D1; we expose clean set semantics).
      val a = table(s, dir, "customer").filter(col("c_acctbal") > 9500)
        .select(col("c_custkey").as("key"))
      val b = table(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("key"))
      a.union(b).distinct().orderBy(col("key"))
    },

    QuerySpec(
      "q11_intersect",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(table(s, dir, "supplier").select(col("s_nationkey")))
        .orderBy(col("nationkey"))
    },

    QuerySpec(
      "q12_except",
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(table(s, dir, "supplier").select(col("s_nationkey")))
        .orderBy(col("nationkey"))
    },

    // ----- multi-level aggregation ----------------------------------------
    QuerySpec(
      "q13_rollup",
      """SELECT l_returnflag, l_linestatus,
        |       COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    QuerySpec(
      "q14_cube",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    QuerySpec(
      "q15_count_distinct",
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_orderkey)  AS n_orders,
        |       COUNT(DISTINCT l_partkey)   AS n_parts,
        |       COUNT(*)                    AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },

    // ----- window functions -----------------------------------------------
    QuerySpec(
      "q16_window_rank",
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |         CAST(RANK() OVER (PARTITION BY c_nationkey
        |              ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_rank,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |              ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        |  FROM customer)
        |WHERE bal_rank <= 3
        |ORDER BY c_nationkey, bal_rank, c_custkey""".stripMargin) { (s, dir) =>
      // Per-group top-k, two-phase: only 25 nations exist, so a single
      // window partitioned by nation caps parallelism at 25 and sorts
      // 1/25th of ALL customers per task. Phase 1 salts each nation into
      // 32 subgroups and takes a local top-3 (parallelism 25×32, each
      // task sorting a small slice); phase 2 ranks the ≤ 25×32×3
      // candidates — provably containing every global top-3 row, since
      // (c_acctbal DESC, c_custkey) is a total order. Same result and
      // oracle as the single-window form.
      val salted = table(s, dir, "customer")
        .withColumn("salt", pmod(hash(col("c_custkey")), lit(32)))
      val w1 = Window.partitionBy(col("c_nationkey"), col("salt"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val candidates = salted
        .withColumn("r1", row_number().over(w1))
        .filter(col("r1") <= 3)
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      candidates
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).cast("long").as("bal_rank"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("bal_rank") <= 3)
        .orderBy(col("c_nationkey"), col("bal_rank"), col("c_custkey"))
    },

    QuerySpec(
      "q17_window_lag",
      """SELECT user_id, event_id, event_type,
        |       LAG(event_type)  OVER w AS prev_type,
        |       LEAD(event_type) OVER w AS next_type
        |FROM events
        |WHERE user_id < 3
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .filter(col("user_id") < 3)
        .select(col("user_id"), col("event_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy(col("user_id"), col("event_id"))
    },

    QuerySpec(
      "q18_window_moving",
      """SELECT user_id, event_id,
        |       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
        |         AS moving_avg,
        |       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |         AS running_sum
        |FROM events WHERE user_id < 3
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .filter(col("user_id") < 3)
        .select(col("user_id"), col("event_id"),
          round(avg(col("value")).over(w.rowsBetween(-3, 0)), 4).as("moving_avg"),
          round(sum(col("value")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_sum"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // ----- scalar-function surface (§2.8 + Athena-delegated) ---------------
    QuerySpec(
      "q19_string_funcs",
      """SELECT c_custkey,
        |       UPPER(c_name)                         AS name_upper,
        |       LENGTH(c_name)                        AS name_len,
        |       SUBSTR(c_name, 1, 8)                  AS name_prefix,
        |       CONCAT(c_mktsegment, ':', c_name)     AS tagged,
        |       REPLACE(c_name, 'Customer', 'Cust')   AS name_short
        |FROM customer WHERE c_custkey <= 50
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .filter(col("c_custkey") <= 50)
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          length(col("c_name")).cast("long").as("name_len"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("name_short"))
        .orderBy(col("c_custkey"))
    },

    QuerySpec(
      "q20_case_when_null",
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice >= 300000 THEN 'high'
        |            WHEN o_totalprice >= 100000 THEN 'mid'
        |            ELSE 'low' END                       AS price_band,
        |       COALESCE(NULLIF(o_orderstatus, 'P'), 'X') AS status_or_x
        |FROM orders WHERE o_orderkey <= 500
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          when(col("o_totalprice") >= 300000, "high")
            .when(col("o_totalprice") >= 100000, "mid")
            .otherwise("low").as("price_band"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("X"))
            .as("status_or_x"))
        .orderBy(col("o_orderkey"))
    },

    QuerySpec(
      "q21_subqueries",
      """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        |  AND o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // EP2 path: the spark.sql surface over registered views (scalar +
      // IN subqueries; Catalyst rewrites IN → semi join).
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
          |FROM orders
          |WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
          |  AND o_custkey IN (SELECT c_custkey FROM customer
          |                    WHERE c_mktsegment = 'BUILDING')
          |ORDER BY o_orderkey""".stripMargin)
    },

    QuerySpec("q77_sql_join3", SqlJoin3) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(SqlJoin3)
    },

    QuerySpec("q78_sql_window_cte", SqlWindowCte) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(SqlWindowCte)
    },

    QuerySpec("q79_sql_exists", SqlExists) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(SqlExists)
    },

    QuerySpec("q99_sql_grouping_sets", SqlGroupingSets) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(SqlGroupingSets)
    },

    QuerySpec("q104_sql_windowed_dedup", SqlWindowedDedup) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(SqlWindowedDedup)
    },

    QuerySpec(
      "q22_having_grouped",
      """SELECT l_suppkey, COUNT(*) AS n_lines,
        |       ROUND(SUM(l_extendedprice), 2) AS supp_revenue
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING COUNT(*) > 100
        |ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice")), 2).as("supp_revenue"))
        .filter(col("n_lines") > 100)
        .orderBy(col("l_suppkey"))
    },

    // ----- approximate aggregation --------------------------------------
    // Sketch estimates are implementation-specific (DuckDB cannot replay
    // Spark's HLL register layout or quantile buffers), so these queries
    // hash-verify the sketches' PUBLISHED CONTRACT instead: each computes
    // both the estimate and the exact answer, emits the exact answer plus
    // a boolean "the estimate landed within the algorithm's error bound",
    // and the oracle recomputes the exact side with the boolean pinned
    // TRUE. A broken sketch flips the boolean and breaks the hash —
    // strictly stronger than the old rows-only check (which verified
    // nothing about the values), while the operator under test is still
    // the one-pass fixed-memory sketch a 100 TB COUNT(DISTINCT) needs.
    QuerySpec(
      "q23_approx_count_distinct",
      """SELECT l_returnflag,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       TRUE AS within_bounds
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      // HLL++ at rsd = 0.01; the gate allows 5×rsd (≥5σ of headroom —
      // deterministic data, so this never flaps) with an absolute floor
      // of 1 for tiny groups. The sketch and the exact side aggregate
      // SEPARATELY and join on the (tiny) group key: mixing a DISTINCT
      // aggregate with non-distinct ones in one Aggregate forces
      // Catalyst's Expand rewrite (every input row duplicated per
      // aggregate class — measured 14× slower at sf0.1), while two
      // independent partial-merge aggregates + a broadcast join keep
      // both sides one-pass.
      val li23 = table(s, dir, "lineitem")
      val sketch = li23.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01)
          .as("approx_orders"),
          count(lit(1)).as("n_rows"))
      val exact = li23.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      exact.join(broadcast(sketch), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_orders"), col("n_rows"),
          (abs(col("approx_orders") - col("exact_orders")) <=
            greatest(col("exact_orders") * lit(0.05), lit(1.0)))
            .as("within_bounds"))
        .orderBy(col("l_returnflag"))
    },

    QuerySpec(
      "q63_hll_sketch_union",
      """SELECT event_type,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       TRUE AS within_bounds
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      // The mergeable-sketch PERSISTENCE pattern — incremental distinct
      // stats at 100 TB: each data slice is sketched once (DataSketches
      // HLL, binary column), sketches land in parquet, and the corpus
      // estimate is an O(sketch-bytes) hll_union_agg over the slice
      // table — new data re-sketches only its slice, history is never
      // rescanned. The unioned estimate is gated against the exact
      // count within the sketch's published bound (lgK = 12 → rsd
      // ≈ 1.63%; 5% ≈ 3σ, deterministic data so it never flaps); union
      // == single-pass equivalence is separately pinned in SketchSpec.
      // per-PID scratch (not the shared fixtures dir): two concurrent
      // JVMs overwriting one path can tear each other's read-back —
      // the same cross-process discipline as the q93/q89/q94 fixtures
      val p = s"${graft.Sessions.scratchRoot}/hll_slices_" +
        new java.io.File(dir).getName
      table(s, dir, "events")
        .withColumn("slice", pmod(col("event_id"), lit(4)))
        .groupBy(col("slice"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .write.mode("overwrite").parquet(p)
      val unioned = s.read.parquet(p)
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("approx_users"))
      table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .join(broadcast(unioned), Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            greatest(col("exact_users") * lit(0.05), lit(4.0)))
            .as("within_bounds"))
        .orderBy(col("event_type"))
    },

    QuerySpec(
      "q24_approx_quantiles",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       TRUE AS q25_ok, TRUE AS q50_ok, TRUE AS q75_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      // percentile_approx = mergeable GK/KLL-style sketch; exact
      // percentiles at 100 TB require a full sort, the sketch does not.
      // Its published contract is a RANK guarantee: with accuracy K the
      // returned element's rank is within n/K of the target. Verified
      // by joining the estimates back (broadcast — three doubles per
      // group) and counting rows strictly-below / at-or-below each:
      // the target rank p·n must fall inside [cnt_lt − εn, cnt_le + εn]
      // with ε = 2/K plus a ±2 integer slack for rank rounding.
      val li = table(s, dir, "lineitem")
      val est = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("q"))
        .select(col("l_returnflag"),
          element_at(col("q"), 1).as("p25"),
          element_at(col("q"), 2).as("p50"),
          element_at(col("q"), 3).as("p75"))
      def cnt(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L))
      def rankOk(p: Double, lt: String, le: String) = {
        val eps = col("n_rows") * lit(2.0 / 10000) + lit(2.0)
        val target = col("n_rows") * lit(p)
        (col(lt) <= target + eps) && (col(le) >= target - eps)
      }
      li.join(broadcast(est), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          cnt(col("l_extendedprice") < col("p25")).as("lt25"),
          cnt(col("l_extendedprice") <= col("p25")).as("le25"),
          cnt(col("l_extendedprice") < col("p50")).as("lt50"),
          cnt(col("l_extendedprice") <= col("p50")).as("le50"),
          cnt(col("l_extendedprice") < col("p75")).as("lt75"),
          cnt(col("l_extendedprice") <= col("p75")).as("le75"))
        .select(col("l_returnflag"), col("n_rows"),
          rankOk(0.25, "lt25", "le25").as("q25_ok"),
          rankOk(0.50, "lt50", "le50").as("q50_ok"),
          rankOk(0.75, "lt75", "le75").as("q75_ok"))
        .orderBy(col("l_returnflag"))
    },

    QuerySpec(
      "q54_cache_hit",
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |       ROUND(SUM(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      // The reference planned a result cache in front of its query layer
      // (README.md:24,48); here the same aggregate is served THROUGH
      // QueryCache: put pins+materializes it, get plans the read against
      // the InMemoryRelation (plan asserted in QueryCacheSpec), so this
      // entry verifies cache-hit VALUES against the oracle. Rows are
      // copied out and the entry invalidated before returning — the cache
      // owns an explicit lifecycle, nothing stays pinned (the leak class
      // PlanAuditSpec gates). The copy is driver-bounded: a cached named
      // result is cardinality-reduced by construction.
      val name = "q54_orders_by_priority"
      QueryCache.invalidate(s, name) // rerun hygiene: never serve stale
      val agg = table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
      QueryCache.put(agg, name)
      val hit = QueryCache.get(s, name).get.orderBy(col("o_orderpriority"))
      val rows = java.util.Arrays.asList(hit.collect(): _*)
      val out = s.createDataFrame(rows, hit.schema)
      QueryCache.invalidate(s, name)
      out
    },

    QuerySpec(
      "q58_salted_join",
      """SELECT c.c_mktsegment, count(*) AS n_events,
        |       round(sum(e.value), 2) AS total_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Skew-resistant join ([[Skew.saltedJoin]]): events concentrate on
      // few users (the hot-key shape), so the fact side scatters over 8
      // salted sub-keys and the dimension replicates 8× — the oracle is
      // the PLAIN join, proving salting is result-invariant.
      val ev = table(s, dir, "events").select(col("user_id"), col("value"))
      val cust = table(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      Skew.saltedJoin(ev, cust, "user_id", nSalts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("c_mktsegment"))
    },

    QuerySpec(
      "q76_salted_dup_join",
      """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_events
        |FROM (SELECT user_id, event_type FROM events) e
        |JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Duplicate-heavy salted join ([[Skew.saltedJoinDupHeavy]]): the
      // fact side is events projected to (user_id, event_type) — mostly
      // byte-identical duplicate rows, the one hot-key shape a content
      // salt cannot spread. Copies collapse map-side before the shuffle,
      // join salted, and the count re-expands each survivor; the oracle
      // is the PLAIN join, so the grouped counts verify the multiset
      // re-expansion exactly.
      val ev = table(s, dir, "events").select(col("user_id"), col("event_type"))
      val cust = table(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      Skew.saltedJoinDupHeavy(ev, cust, "user_id", nSalts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("c_mktsegment"))
    },

    QuerySpec(
      "q90_scd2",
      """WITH cur AS (
        |  SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal
        |  FROM customer),
        |upd AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 10 = 0 THEN 'MOVED'
        |              ELSE c_mktsegment END AS c_mktsegment,
        |         CASE WHEN c_custkey % 10 = 5 THEN round(c_acctbal + 100, 2)
        |              ELSE round(c_acctbal, 2) END AS c_acctbal
        |  FROM customer WHERE c_custkey % 10 IN (0, 3, 5)),
        |chg AS (
        |  SELECT u.c_custkey FROM upd u JOIN cur c USING (c_custkey)
        |  WHERE u.c_mktsegment <> c.c_mktsegment
        |     OR u.c_acctbal <> c.c_acctbal)
        |SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
        |       CAST(0 AS BIGINT) AS valid_from,
        |       CAST(CASE WHEN c.c_custkey IN (SELECT c_custkey FROM chg)
        |                 THEN 1 ELSE 99999999 END AS BIGINT) AS valid_to
        |FROM cur c
        |UNION ALL
        |SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
        |       CAST(1 AS BIGINT) AS valid_from,
        |       CAST(99999999 AS BIGINT) AS valid_to
        |FROM upd u WHERE u.c_custkey IN (SELECT c_custkey FROM chg)
        |ORDER BY 1, 4""".stripMargin) { (s, dir) =>
      // SCD type-2 dimension maintenance ([[Scd.scd2Apply]]): a planted
      // update batch (segment change for keys ≡0 mod 10, balance change
      // for ≡5, NO-OP rows for ≡3 — change detection must drop them)
      // closes the changed rows' current versions and appends new open
      // ones. The oracle reconstructs the full versioned table
      // independently; a missed close, a phantom version from a no-op
      // update, or a wrong interval all break the hash.
      val dim = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
      val upd = dim.filter(pmod(col("c_custkey"), lit(10)).isin(0, 3, 5))
        .select(col("c_custkey"),
          when(col("c_custkey") % 10 === 0, "MOVED")
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          when(col("c_custkey") % 10 === 5, round(col("c_acctbal") + 100, 2))
            .otherwise(col("c_acctbal")).as("c_acctbal"))
      Scd.scd2Apply(Scd.initial(dim), upd, "c_custkey",
          Seq("c_mktsegment", "c_acctbal"), batchTs = 1L)
        .orderBy(col("c_custkey"), col("valid_from"))
    },

    QuerySpec(
      "q61_bucketed_join",
      """SELECT c.c_mktsegment AS mktsegment, count(*) AS n_orders,
        |       round(sum(o.o_totalprice), 2) AS total_price
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Shuffle-free co-located join ([[Lake.writeBucketed]]): both sides
      // bucketed by the join key with the same bucket count, so the
      // sort-merge join (forced via merge hint — a broadcast would not
      // exercise the bucketing) reads matching buckets in place and
      // plans NO Exchange for the join (gated in PlanAuditSpec); the
      // only shuffle left is the small post-join segment aggregation.
      // The oracle is the plain unbucketed join — bucketing must be
      // result-invariant.
      Lake.writeBucketed(table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")),
        "bt_customer", "c_custkey", nBuckets = 8)
      Lake.writeBucketed(table(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice")),
        "bt_orders", "o_custkey", nBuckets = 8)
      val c = s.table("bt_customer")
      val o = s.table("bt_orders")
      c.hint("merge").join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(col("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy(col("mktsegment"))
    },

    QuerySpec(
      "q64_pivot",
      """SELECT CAST(user_id % 10 AS INT) AS bucket,
        |       COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
        |       COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
        |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |       COUNT(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Pivot (long→wide): per-bucket event-type counts. The pivot values
      // are EXPLICIT, so Catalyst skips the extra distinct-values job an
      // un-enumerated pivot needs and the plan is ONE partial-agg-friendly
      // hash aggregation — at 100 TB an implicit pivot's values scan is a
      // full extra pass. Absent (bucket, type) cells are 0-filled to match
      // SQL's FILTER semantics.
      table(s, dir, "events")
        .withColumn("bucket", pmod(col("user_id"), lit(10)).cast("int"))
        .groupBy(col("bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
        .orderBy(col("bucket"))
    },

    QuerySpec(
      "q65_unpivot",
      """SELECT l_orderkey, l_linenumber, 'discount' AS metric,
        |       ROUND(l_discount, 2) AS value
        |FROM lineitem WHERE l_orderkey <= 30
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'extendedprice',
        |       ROUND(l_extendedprice, 2)
        |FROM lineitem WHERE l_orderkey <= 30
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'quantity', ROUND(l_quantity, 2)
        |FROM lineitem WHERE l_orderkey <= 30
        |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin) {
      (s, dir) =>
      // Unpivot/melt (wide→long) — the inverse of q64, and the shape that
      // turns a metrics-wide table into (entity, metric, value) training
      // rows. Dataset.unpivot expands each row to one row per value column
      // BEFORE any shuffle (a Generate, narrow), so it composes with
      // partial aggregation downstream; the reference's 6,039-column EEG
      // rows are exactly the width this matters for.
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 30)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_discount"), 2).as("discount"),
          round(col("l_extendedprice"), 2).as("extendedprice"),
          round(col("l_quantity"), 2).as("quantity"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("discount"), col("extendedprice"), col("quantity")),
          "metric", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"),
          col("value"))
    },

    QuerySpec(
      "q66_percentiles_exact",
      """SELECT l_returnflag,
        |       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |       ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
        |       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |       ROUND(median(l_extendedprice), 4)              AS med
        |FROM lineitem
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Exact interpolated percentiles + median — the oracle-checked
      // member of the quantile family (q24's approx_percentile is
      // sketch-based, rows-only by design). Spark `percentile` and DuckDB
      // `quantile_cont` share linear-interpolation semantics, so values
      // compare bit-for-bit after rounding. Exact percentile state is
      // O(group values) — right for grouped mid-cardinality aggregates;
      // at raw 100 TB the same query swaps to the q24 sketch.
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D))")
          .as("q"))
        .select(col("l_returnflag"),
          round(element_at(col("q"), 1), 4).as("p25"),
          round(element_at(col("q"), 2), 4).as("p50"),
          round(element_at(col("q"), 3), 4).as("p75"),
          round(element_at(col("q"), 2), 4).as("med"))
        .orderBy(col("l_returnflag"))
    },

    QuerySpec(
      "q67_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |       ROUND(SUM(o_totalprice), 2) AS total,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) {
      (s, dir) =>
      // Arbitrary GROUPING SETS (rollup/cube are the fixed-shape special
      // cases, q13/q14) + the GROUPING() marker that disambiguates "null
      // because super-aggregate" from "null in the data". One Expand +
      // one hash agg — the Expand multiplies rows by the set count BEFORE
      // the shuffle, so partial aggregation still collapses each set.
      table(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"),
          grouping(col("o_orderpriority")).cast("int").as("g_pri"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    QuerySpec(
      "q106_bloom_join_prune",
      """SELECT l_returnflag, COUNT(*) AS n_lines,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Runtime bloom-filter join pruning — Spark's InjectRuntimeFilter:
      // the selective dimension leg (filtered orders) builds a bloom
      // filter once, and the FACT side applies might_contain(xxhash64(
      // l_orderkey)) BEFORE its shuffle, so rows that cannot join never
      // enter the exchange. At 100 TB this is the difference between
      // shuffling all of lineitem and shuffling the ~20% that survives —
      // the semi-join-reduction idea without a second join.
      //
      // Cloned session, not shared conf mutation: injection happens at
      // OPTIMIZATION time (when the returned frame executes, after this
      // builder returns), so the conf must live on the frame's own
      // session. Thresholds are floored to make the filter fire at test
      // scale — at production scale the defaults (probe scan > 10 GB)
      // fire on their own; broadcast is disabled because Spark rightly
      // skips bloom injection for broadcast joins (their probe side
      // never shuffles). PlanAuditSpec gates might_contain + SMJ in the
      // plan; the oracle proves the filter is result-invariant (bloom
      // has no false negatives).
      val s2 = s.newSession()
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ord = table(s2, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = table(s2, dir, "lineitem")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("l_returnflag"))
    },

    QuerySpec(
      "q107_cms_heavy_hitters",
      """WITH remapped AS (
        |  SELECT CASE WHEN user_id % 4 = 1 THEN 900001
        |              WHEN user_id % 8 = 2 THEN 900002
        |              WHEN user_id % 16 = 4 THEN 900003
        |              ELSE user_id END AS k
        |  FROM events
        |), counts AS (SELECT k, count(*) AS cnt FROM remapped GROUP BY k),
        |cands AS (SELECT * FROM (VALUES (0),(3),(7),(15),
        |                                (900001),(900002),(900003)) v(k))
        |SELECT CAST(c.k AS BIGINT) AS k,
        |       CAST(CASE WHEN COALESCE(ct.cnt, 0) * 10 >=
        |                      (SELECT count(*) FROM events)
        |                 THEN 1 ELSE 0 END AS INT) AS is_heavy
        |FROM cands c LEFT JOIN counts ct ON c.k = ct.k
        |ORDER BY k""".stripMargin) { (s, dir) =>
      // Count-Min heavy hitters — the frequency member of the mergeable-
      // sketch family (q63 = distinct/HLL, q24 = quantiles/KLL): find
      // keys above a share threshold WITHOUT a full groupBy of the key
      // space. Each slice is sketched once (count_min_sketch agg,
      // order-independent counter sums), sketches persist to parquet,
      // and the corpus sketch is a counter-wise merge — new data
      // re-sketches only its slice, like q63. Spark ships no CMS PROBE
      // function, so the point query is the native codegen'd
      // [[org.apache.spark.sql.graft.CmsEstimate]] over the merged
      // sketch as a literal — probing stays distributed (here 7 rows;
      // at scale, candidates come from a side channel and the same
      // expression probes them WHERE they live).
      //
      // The driver crossing is bounded by construction: 8 slice rows of
      // ~160 KB sketch each (no per-key data moves). Heavy keys are
      // planted as constant FRACTIONS via pmod-class remapping (25%,
      // 12.5%, and a deliberately sub-threshold 6.25%), so margins scale
      // with N — the regime where the CMS ±eps·N guarantee (eps=0.001
      // here, margin >= 2.5% of N) makes the approximate heavy set EXACT,
      // which is what lets a sketch query carry a hash-green SQL oracle
      // instead of rows-only. SketchSpec pins est>=exact, the error
      // bound, and merged == single-pass.
      import org.apache.spark.util.sketch.CountMinSketch
      val k = when(pmod(col("user_id"), lit(4)) === 1, lit(900001L))
        .when(pmod(col("user_id"), lit(8)) === 2, lit(900002L))
        .when(pmod(col("user_id"), lit(16)) === 4, lit(900003L))
        .otherwise(col("user_id"))
      val slices = s"${graft.Sessions.scratchRoot}/cms_slices_" +
        new java.io.File(dir).getName
      table(s, dir, "events")
        .select(k.cast("long").as("k"), col("event_id"))
        .groupBy(pmod(col("event_id"), lit(8)).as("slice"))
        .agg(expr("count_min_sketch(k, 0.001D, 0.999D, 42)").as("sk"))
        .write.mode("overwrite").parquet(slices)
      val merged = s.read.parquet(slices).select(col("sk")).collect()
        .map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
        .reduce((a, b) => a.mergeInPlace(b))
      val total = merged.totalCount
      val out = new java.io.ByteArrayOutputStream()
      merged.writeTo(out)
      val cands = Seq(0L, 3L, 7L, 15L, 900001L, 900002L, 900003L)
      s.createDataFrame(cands.map(Tuple1.apply)).toDF("k")
        .select(col("k"),
          (org.apache.spark.sql.graft.SketchFunctions
            .cmsEstimate(out.toByteArray, col("k")) * 10 >= lit(total))
            .cast("int").as("is_heavy"))
        .orderBy(col("k"))
    },

    QuerySpec(
      "q152_profile",
      """WITH t AS (
        |  SELECT l_quantity, l_extendedprice, l_discount,
        |         l_returnflag, l_linestatus,
        |         CASE WHEN l_orderkey % 13 = 0 THEN NULL
        |              ELSE l_quantity END AS qty_nullable
        |  FROM lineitem),
        |n AS (
        |  SELECT 'l_quantity' AS c UNION ALL SELECT 'l_extendedprice'
        |  UNION ALL SELECT 'l_discount' UNION ALL SELECT 'qty_nullable'),
        |num AS (
        |  SELECT n.c AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(count(*) - count(CASE n.c
        |             WHEN 'l_quantity' THEN l_quantity
        |             WHEN 'l_extendedprice' THEN l_extendedprice
        |             WHEN 'l_discount' THEN l_discount
        |             ELSE qty_nullable END) AS BIGINT) AS n_nulls,
        |         CAST(count(DISTINCT CASE n.c
        |             WHEN 'l_quantity' THEN l_quantity
        |             WHEN 'l_extendedprice' THEN l_extendedprice
        |             WHEN 'l_discount' THEN l_discount
        |             ELSE qty_nullable END) AS BIGINT) AS n_distinct,
        |         round(CAST(min(CASE n.c
        |             WHEN 'l_quantity' THEN l_quantity
        |             WHEN 'l_extendedprice' THEN l_extendedprice
        |             WHEN 'l_discount' THEN l_discount
        |             ELSE qty_nullable END) AS DOUBLE), 4) AS min_num,
        |         round(CAST(max(CASE n.c
        |             WHEN 'l_quantity' THEN l_quantity
        |             WHEN 'l_extendedprice' THEN l_extendedprice
        |             WHEN 'l_discount' THEN l_discount
        |             ELSE qty_nullable END) AS DOUBLE), 4) AS max_num,
        |         round(avg(CASE n.c
        |             WHEN 'l_quantity' THEN l_quantity
        |             WHEN 'l_extendedprice' THEN l_extendedprice
        |             WHEN 'l_discount' THEN l_discount
        |             ELSE qty_nullable END), 4) AS mean,
        |         CAST(NULL AS VARCHAR) AS min_str,
        |         CAST(NULL AS VARCHAR) AS max_str
        |  FROM t, n GROUP BY n.c),
        |str AS (
        |  SELECT s.c AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(0 AS BIGINT) AS n_nulls,
        |         CAST(count(DISTINCT CASE s.c WHEN 'l_returnflag'
        |             THEN l_returnflag ELSE l_linestatus END) AS BIGINT)
        |           AS n_distinct,
        |         CAST(NULL AS DOUBLE) AS min_num,
        |         CAST(NULL AS DOUBLE) AS max_num,
        |         CAST(NULL AS DOUBLE) AS mean,
        |         min(CASE s.c WHEN 'l_returnflag' THEN l_returnflag
        |             ELSE l_linestatus END) AS min_str,
        |         max(CASE s.c WHEN 'l_returnflag' THEN l_returnflag
        |             ELSE l_linestatus END) AS max_str
        |  FROM t, (SELECT 'l_returnflag' AS c
        |           UNION ALL SELECT 'l_linestatus') s
        |  GROUP BY s.c)
        |SELECT * FROM num UNION ALL SELECT * FROM str
        |ORDER BY col_name""".stripMargin) { (s, dir) =>
      // Single-pass table profile ([[Profile.profile]] — scale notes
      // there): null counts, exact distinct cardinality, ranges, and
      // rounded means for six columns (one with planted nulls) in ONE
      // aggregation over the scan; per-column rows exploded from the
      // one aggregate row. The oracle computes the same statistics as
      // a per-column cross-join aggregate — different formulation,
      // byte-identical result.
      import Profile.ColSpec
      Profile.profile(
        table(s, dir, "lineitem")
          .withColumn("qty_nullable",
            when(col("l_orderkey") % 13 === 0, lit(null))
              .otherwise(col("l_quantity"))),
        Seq(ColSpec("l_quantity", numeric = true),
          ColSpec("l_extendedprice", numeric = true),
          ColSpec("l_discount", numeric = true),
          ColSpec("qty_nullable", numeric = true),
          ColSpec("l_returnflag", numeric = false),
          ColSpec("l_linestatus", numeric = false)))
    },

    QuerySpec(
      "q154_cdc_merge",
      """WITH o AS (
        |  SELECT o_orderkey,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |base AS (
        |  SELECT o_orderkey AS k, cents AS price_cents
        |  FROM o WHERE o_orderkey % 4 <> 3),
        |ch AS (
        |  SELECT o_orderkey AS k, cents AS price_cents,
        |         1 AS seq, 'I' AS op FROM o WHERE o_orderkey % 4 = 3
        |  UNION ALL
        |  SELECT o_orderkey, (cents * 110) // 100, 2, 'U'
        |  FROM o WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, NULL, 3, 'D' FROM o
        |  WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, (cents * 120) // 100, 4, 'U'
        |  FROM o WHERE o_orderkey % 10 = 0),
        |win AS (
        |  SELECT k, op, price_cents
        |  FROM (SELECT *,
        |          row_number() OVER (PARTITION BY k ORDER BY seq DESC) rn
        |        FROM ch) WHERE rn = 1),
        |hi AS (SELECT DISTINCT k, TRUE AS has_i FROM ch WHERE op = 'I'),
        |j AS (
        |  SELECT coalesce(b.k, w.k) AS k, b.k IS NOT NULL AS in_base,
        |         b.price_cents AS bprice, w.op, w.price_cents AS cprice,
        |         coalesce(h.has_i, FALSE) AS has_i
        |  FROM base b FULL OUTER JOIN win w ON b.k = w.k
        |  LEFT JOIN hi h ON coalesce(b.k, w.k) = h.k)
        |SELECT k AS o_orderkey,
        |       CAST(CASE WHEN op IN ('I','U') THEN cprice ELSE bprice END
        |            AS BIGINT) AS price_cents,
        |       CASE WHEN op = 'I' THEN 'ins' WHEN op = 'U' THEN 'upd'
        |            ELSE 'base' END AS src
        |FROM j
        |WHERE (op IS NULL AND in_base) OR op = 'I'
        |   OR (op = 'U' AND (in_base OR has_i))
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // Relational CDC MERGE ([[Cdc.merge]] — semantics and scale notes
      // there): a four-wave changelog (insert, update, delete,
      // superseding update) derived from orders applies onto the base
      // snapshot under latest-sequence-wins; the oracle replays the
      // winner rank, the update-needs-existing-row rule, and
      // insert-or-replace exactly. Prices are EXACT INTEGER CENTS
      // (floor of the binary double is engine-identical; `round` of a
      // scaled double is not — Spark rounds the shortest decimal
      // rendering, DuckDB the binary value, and they disagree on
      // half-cent knife edges).
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val k = col("o_orderkey")
      def wave(cond: org.apache.spark.sql.Column,
          price: org.apache.spark.sql.Column, seq: Int, op: String) =
        o.filter(cond).select(k.as("k"), price.as("price_cents"),
          lit(seq).as("seq"), lit(op).as("op"))
      val base = o.filter(k % 4 =!= 3)
        .select(k.as("k"), col("cents").as("price_cents"))
      val ch = wave(k % 4 === 3, col("cents"), 1, "I")
        .unionByName(wave(k % 5 === 0,
          expr("(cents * 110) div 100"), 2, "U"))
        .unionByName(wave(k % 7 === 0, lit(null).cast("long"), 3, "D"))
        .unionByName(wave(k % 10 === 0,
          expr("(cents * 120) div 100"), 4, "U"))
      Cdc.merge(base, ch, "k", "seq", "op", Seq("price_cents"))
        .select(col("k").as("o_orderkey"), col("price_cents"), col("src"))
        .orderBy(col("o_orderkey"))
    },

    QuerySpec(
      "q155_fuzzy_join",
      """WITH e AS (
        |  SELECT p_partkey, p_name || ' #' || p_partkey AS name FROM part),
        |q AS (
        |  SELECT p_partkey AS qid,
        |         upper(substr(name, 1, 1)) || substr(name, 2) AS qname
        |  FROM e WHERE p_partkey % 10 = 0
        |  UNION ALL
        |  SELECT p_partkey + 100000, 'zzz no such entity #' || p_partkey
        |  FROM part WHERE p_partkey % 40 = 0),
        |cand AS (
        |  SELECT q.qid, e.p_partkey, levenshtein(q.qname, e.name) AS d
        |  FROM q JOIN e
        |    ON lower(substr(q.qname, 1, 8)) = lower(substr(e.name, 1, 8))
        |  WHERE abs(length(q.qname) - length(e.name)) <= 2
        |    AND levenshtein(q.qname, e.name) <= 2),
        |best AS (
        |  SELECT qid, p_partkey AS matched_id, CAST(d AS BIGINT) AS distance
        |  FROM (SELECT *,
        |          row_number() OVER (PARTITION BY qid ORDER BY d, p_partkey)
        |            AS rn
        |        FROM cand) WHERE rn = 1)
        |SELECT q.qid, b.matched_id, b.distance
        |FROM q LEFT JOIN best b ON q.qid = b.qid
        |ORDER BY q.qid""".stripMargin) { (s, dir) =>
      // Blocked fuzzy join ([[EntityResolution.fuzzyMatch]] — blocking/
      // recall contract there): queries are case-corrupted entity names
      // plus no-match noise; prefix blocking + length banding prune
      // before the THRESHOLD-BANDED levenshtein DP, best match by
      // (distance, id). Every corrupted query must resolve to its own
      // entity (distance 1, pinned in CdcErSpec); noise queries surface
      // unmatched. blockLen = 8: entity names share 4-char prefixes
      // heavily (TPC-H color vocabulary), and the 4-char key blocked
      // ~5M candidate pairs at sf0.1 where the 8-char key blocks ~100×
      // fewer — block-key selectivity is THE fuzzy-join cost lever, and
      // the corruption class (case on char 1) is case-folded out of the
      // key, so recall is unchanged.
      val e = table(s, dir, "part")
        .select(col("p_partkey"),
          concat(col("p_name"), lit(" #"), col("p_partkey").cast("string"))
            .as("name"))
      val q = e.filter(col("p_partkey") % 10 === 0)
        .select(col("p_partkey").as("qid"),
          concat(upper(substring(col("name"), 1, 1)),
            expr("substring(name, 2)")).as("qname"))
        .unionByName(table(s, dir, "part")
          .filter(col("p_partkey") % 40 === 0)
          .select((col("p_partkey") + 100000L).as("qid"),
            concat(lit("zzz no such entity #"),
              col("p_partkey").cast("string")).as("qname")))
      EntityResolution.fuzzyMatch(q, e, "qid", "qname",
          "p_partkey", "name", maxDist = 2, blockLen = 8)
        .orderBy(col("qid"))
    })
}
