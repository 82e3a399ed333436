package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-style relational sanity set (SURVEY §2.8 #14): proves the
  * join/agg/top-k core that VIA's J1-J4/A1-A8 compose from.
  *
  * Scale notes (100 TB thinking):
  *  - q1: single hash-aggregate with map-side partials; one shuffle of
  *    (flag,status) partial rows only — optimal.
  *  - q3/q5: dimension sides (customer/nation/region/supplier at TPC-H
  *    ratios) are broadcast-able; lineitem/orders carry the shuffle. We
  *    broadcast explicitly where the side is provably small relative to the
  *    fact table; AQE handles the rest at runtime.
  */
object Relational {

  /** All money/avg outputs rounded so Spark-vs-DuckDB double summation
    * order cannot flip the hash compare. */
  def queries: Seq[QueryDef] =
    Seq(q1Agg, q3Topk, q5Join, q7Flow, rollupPricing, percentileStats,
      aboveAvgOrders, smallQtyRevenue)

  /** Exact, order-independent money accumulation WITHOUT decimal boxing:
    * each per-row amount becomes integer MICROS and the sum runs over
    * LONGs inside whole-stage codegen. Double accumulation is
    * order-dependent (AQE re-planning flipped a half-cent boundary);
    * DECIMAL(18,6) sums were exact too but ~4× slower in the agg loop —
    * and `round()` itself goes through BigDecimal per row in Spark, so the
    * half-up is `floor(x*1e6 + 0.5)`: pure IEEE ops, bit-identical across
    * engines for these positive amounts. */
  private def microsSum(c: org.apache.spark.sql.Column) =
    sum(floor(c * lit(1000000.0) + lit(0.5)).cast("long"))

  /** micros → money at 2 decimals, HALF_UP (positive amounts only). */
  private def cents(sumMicros: org.apache.spark.sql.Column) =
    floor((sumMicros + lit(5000L)).cast("double") / lit(10000.0)) / lit(100.0)

  /** micros → per-row average at 4 decimals. */
  private def avg4(sumMicros: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column) =
    round(sumMicros.cast("double") / n / lit(1000000.0), 4)

  /** Default size bound for [[broadcastIfSmall]]: 256 MB of ESTIMATED
    * bytes — the projected TPC-H dim chain stays far under it through
    * sf100+ while any fact-sized relation blows through it immediately.
    * Kept well inside executor memory so the gated hint is never the
    * thing that OOMs a 100 TB run. Overridable per session via
    * `spark.graft.dimBroadcastBytes` (0 disables the hint entirely —
    * the pure-AQE regime). */
  private[graft] val DimBroadcastBytes: Long = 256L << 20

  /** Broadcast-hint a dimension ONLY when Catalyst's own size estimate
    * for the (projected, pre-join) relation fits [[DimBroadcastBytes]].
    *
    * The unconditional-hint debate both ways: a forced `broadcast()` on
    * an SF-proportional side is a promise broken at some scale (the r10
    * rationale for hintlessness), but hintless AQE only converts a
    * shuffle join AFTER planning both exchanges, and its 10 MB default
    * threshold leaves the q5/q7 dim chain (customer/supplier joined
    * through nation/region — 1-2% of fact bytes at TPC-H ratios) paying
    * 7-8 exchanges at the decade scale. The stats gate takes both
    * halves: under the bound the dim rides a BroadcastExchange and the
    * fact side never reshuffles (the ≤3-exchange plan a warehouse wants);
    * past the bound the hint silently vanishes and AQE decides exactly
    * as before. `gate` must be the dim's BASE projection (scan +
    * column-prune only): Catalyst's default join estimate is the PRODUCT
    * of child sizes, so gating on a post-join relation would never fire.
    * Evaluating `stats` plans the projection but runs no job. */
  private[graft] def broadcastIfSmall(
      gate: org.apache.spark.sql.DataFrame,
      hinted: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bound = gate.sparkSession.conf
      .get("spark.graft.dimBroadcastBytes", DimBroadcastBytes.toString).toLong
    if (bound > 0 && gate.queryExecution.optimizedPlan.stats.sizeInBytes
        <= BigInt(bound)) broadcast(hinted)
    else hinted
  }

  private val q1Agg = QueryDef(
    "q1_agg",
    (s, dir) => {
      import s.implicits._
      val disc = $"l_extendedprice" * (lit(1.0) - $"l_discount")
      val charge = disc * (lit(1.0) + $"l_tax")
      val n = count(lit(1))
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" < lit("2000-01-01").cast("timestamp_ntz"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          cents(microsSum($"l_quantity")).as("sum_qty"),
          cents(microsSum($"l_extendedprice")).as("sum_base_price"),
          cents(microsSum(disc)).as("sum_disc_price"),
          cents(microsSum(charge)).as("sum_charge"),
          avg4(microsSum($"l_quantity"), n).as("avg_qty"),
          avg4(microsSum($"l_extendedprice"), n).as("avg_price"),
          avg4(microsSum($"l_discount"), n).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some {
      def micros(x: String) = s"sum(CAST(floor(($x) * 1000000.0 + 0.5) AS BIGINT))"
      def cents(x: String) = s"floor(CAST(${micros(x)} + 5000 AS DOUBLE) / 10000.0) / 100.0"
      def avg4(x: String) = s"round(CAST(${micros(x)} AS DOUBLE) / count(*) / 1000000.0, 4)"
      s"""
      SELECT l_returnflag, l_linestatus,
        ${cents("l_quantity")} AS sum_qty,
        ${cents("l_extendedprice")} AS sum_base_price,
        ${cents("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${cents("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${avg4("l_quantity")} AS avg_qty,
        ${avg4("l_extendedprice")} AS avg_price,
        ${avg4("l_discount")} AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '2000-01-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """
    })

  /** The q3 plan over explicit relations — the same DataFrame program the
    * gate row runs; `BucketBench` reruns it over (l_orderkey, o_orderkey)-
    * bucketed fact tables (the layout, not the plan, is the variable). */
  private[graft] def q3Plan(lineitem: org.apache.spark.sql.DataFrame,
      orders: org.apache.spark.sql.DataFrame,
      customer: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // stats-gated broadcast (see broadcastIfSmall): the 2-column customer
    // projection is ~1% of fact bytes at TPC-H ratios, so through the
    // bench scales the hint collapses this join into the fact scan; past
    // the bound the hint vanishes and AQE decides at runtime — never an
    // OOM promise at 100×.
    val custProj = customer.select(col("c_custkey"), col("c_mktsegment"))
    val cust = broadcastIfSmall(custProj,
      customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")))
    // the segment probe runs on ORDERS, before the fact-fact join: the
    // broadcast preserves orders' partitioning (bucketed layout stays
    // exchange-free) while the 1-in-5 segment selectivity shrinks the
    // orderkey join's build/stream side 5× — inner joins commute, so the
    // r16 shape (probe after the merge) computed the identical rows and
    // just carried 5× more of them through the join (sf10: 1.12 s → the
    // r17 row; same 2-exchange flat / 0-exchange bucketed plan).
    val ord = orders
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val li = lineitem
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(cents(microsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  private val q3Topk = QueryDef(
    "q3_topk",
    (s, dir) => q3Plan(Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.customer(s, dir)),
    Some("""
      SELECT l_orderkey, o_orderpriority,
        floor(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) + 5000 AS DOUBLE) / 10000.0) / 100.0 AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 20
    """))

  /** The q5 plan over explicit relations — the same DataFrame program the
    * gate row runs; `BucketBench` reruns it over bucketed tables (the
    * layout, not the plan, is the experiment's variable). */
  private[graft] def q5Plan(lineitem: org.apache.spark.sql.DataFrame,
      orders: org.apache.spark.sql.DataFrame,
      customer: org.apache.spark.sql.DataFrame,
      supplier: org.apache.spark.sql.DataFrame,
      nation: org.apache.spark.sql.DataFrame,
      region: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // region -> nation collapses to a fixed-size (n_nationkey, n_name)
    // map (≤25 rows at any SF) — the only relation that carries a string.
    val natKeys = broadcast(nation
      .join(region.filter(col("r_name").isin("ASIA", "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name")))
    // The r16 shape broadcast customer JOINED with the dims — every entry
    // carried the n_name string, and the driver-side HashedRelation build
    // of that relation alone measured 1.33 s at sf10, the single largest
    // non-join cost of the row (SCALE.md r17 decomposition). The join
    // predicate c_nationkey = s_nationkey makes the region filter and the
    // group key RELOCATABLE: filtering SUPPLIERS to the region nations is
    // equivalent to filtering customers, and n_name(s_nationkey) =
    // n_name(c_nationkey) under the same equality. So the 1%-of-fact
    // supplier relation pays the string payload and the region semi-join,
    // while customer reduces to a payload-free (c_custkey -> c_nationkey)
    // long->int map, nation-semi-filtered executor-side BEFORE the
    // collect (2/5 of entries at TPC-H ratios). The customer map probes
    // ORDERS before the fact-fact join (selectivity applied earliest),
    // supplier probes the merge output, and the cross-dim equality runs
    // as a scan-side filter.
    // Both dim broadcasts stay STATS-GATED (broadcastIfSmall) on their
    // own 2-column projections: past DimBroadcastBytes the hints vanish
    // and AQE plans the no-broadcast regime exactly as before.
    val suppProj = supplier.select(col("s_suppkey"), col("s_nationkey"))
    val supp = broadcastIfSmall(suppProj,
      suppProj.join(natKeys, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name")))
    val custProj = customer.select(col("c_custkey"), col("c_nationkey"))
    val cust = broadcastIfSmall(custProj,
      custProj.join(natKeys.select(col("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey")))
    // the customer probe runs on ORDERS, before the fact-fact join (the
    // q3 lesson, same round): the nation semi-join keeps 2-in-5 orders,
    // so the orderkey join's build side shrinks 2.5× and the merge
    // output drops to the surviving rows BEFORE the supplier probe —
    // inner joins commute, identical rows, same 2-exchange bucketed /
    // broadcast-preserved partitioning as the post-merge probe shape.
    val ord = orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    lineitem
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(cents(microsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q5 with the customer dimension delivered by a SHUFFLED hash join
    * instead of a driver broadcast — the shape a warehouse would plan
    * when orders is ALSO bucketed on o_custkey (`ordersByCust`): the
    * orders⋈customer join runs exchange-free on the orders side with an
    * executor-PARALLEL per-partition build of the small customer side
    * (one ~24 MB exchange), and only the date-surviving (o_orderkey,
    * c_nationkey) pairs re-shuffle into the lineitem merge. This trades
    * the serial driver HashedRelation build of the 1.5M-entry customer
    * map (measured 0.68 s at sf10 even payload-free) for two small
    * pipelined exchanges — measured 1.68 s vs 1.95 s for [[q5Plan]] on
    * the sf10 bucketed layout (SCALE.md r17). BucketBench measures it as
    * the labeled `q5_join_custroute` experiment row; the headline keeps
    * [[q5Plan]], the same program the oracle gate runs. */
  private[graft] def q5PlanCustRoute(lineitem: org.apache.spark.sql.DataFrame,
      ordersByCust: org.apache.spark.sql.DataFrame,
      customer: org.apache.spark.sql.DataFrame,
      supplier: org.apache.spark.sql.DataFrame,
      nation: org.apache.spark.sql.DataFrame,
      region: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val natKeys = broadcast(nation
      .join(region.filter(col("r_name").isin("ASIA", "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name")))
    val suppProj = supplier.select(col("s_suppkey"), col("s_nationkey"))
    val supp = broadcastIfSmall(suppProj,
      suppProj.join(natKeys, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name")))
    val ordC = ordersByCust
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .select(col("o_orderkey"), col("o_custkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey"))
          .join(natKeys.select(col("n_nationkey")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    lineitem
      .join(ordC, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(cents(microsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Join = QueryDef(
    "q5_join",
    (s, dir) => q5Plan(Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.customer(s, dir), Tables.supplier(s, dir),
      Tables.nation(s, dir), Tables.region(s, dir)),
    Some("""
      SELECT n_name,
        floor(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) + 5000 AS DOUBLE) / 10000.0) / 100.0 AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA', 'EUROPE')
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """))

  /** Directed trade-flow volume (the TPC-H Q7 shape): supplier nation →
    * customer nation revenue per ship-year for a fixed nation set, both
    * directions. The hardest join ordering in the relational set — TWO
    * independent nation dimensions constrain the fact table from opposite
    * ends (via supplier and via customer/orders). Scale notes: the nation
    * filters are pushed into each dimension BEFORE its fact join, so the
    * supplier and customer sides shrink first (selective dims cut the
    * orders⋈lineitem shuffle early); nation itself is fixed-size. The
    * cross-nation inequality is a post-join filter on two small joined-in
    * columns, never a join condition that could degrade to a product. */
  val Q7Nations: Seq[String] = Seq("NATION_3", "NATION_7", "NATION_12")

  /** The q7 plan over explicit relations (see [[q5Plan]]'s rationale). */
  private[graft] def q7Plan(lineitem: org.apache.spark.sql.DataFrame,
      orders: org.apache.spark.sql.DataFrame,
      customer: org.apache.spark.sql.DataFrame,
      supplier: org.apache.spark.sql.DataFrame,
      nation: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // stats-gated dim-chain broadcast, same rationale as q5Plan: the
    // nation-filtered supplier/customer projections are tiny relative to
    // the fact tables at TPC-H ratios; gated on each dim's base
    // projection so the hint disappears past DimBroadcastBytes.
    // Like q5Plan, customer broadcasts as a payload-free
    // (c_custkey -> c_nationkey) map, nation-semi-filtered executor-side;
    // the 3-row nation-name map attaches cust_nation AFTER the probes, so
    // no SF-proportional broadcast entry ever carries a string (the
    // driver HashedRelation build cost scales with payload bytes —
    // SCALE.md r17). Supplier is 10× smaller and keeps the joined form.
    val q7nat = broadcast(nation.filter(col("n_name").isin(Q7Nations: _*))
      .select(col("n_nationkey"), col("n_name")))
    val supp = broadcastIfSmall(
      supplier.select(col("s_suppkey"), col("s_nationkey")),
      supplier
        .join(q7nat, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val custProj = customer.select(col("c_custkey"), col("c_nationkey"))
    val cust = broadcastIfSmall(custProj,
      custProj
        .join(q7nat.select(col("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey")))
    // the customer probe runs on ORDERS, before the fact-fact join (the
    // q3 lesson, same round): the 3-of-25-nation semi-join keeps ~12% of
    // orders, so the orderkey join's build side shrinks ~8× and the
    // merge streams only surviving rows into the supplier probe — inner
    // joins commute, identical rows, exchange counts unchanged.
    val ordC = orders
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(ordC, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(q7nat.select(col("n_nationkey"),
          col("n_name").as("cust_nation")),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(cents(microsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q7Flow = QueryDef(
    "q7_flow",
    (s, dir) => q7Plan(Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.customer(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir)),
    Some(s"""
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        CAST(year(l_shipdate) AS BIGINT) AS l_year,
        floor(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) + 5000 AS DOUBLE) / 10000.0) / 100.0 AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE sn.n_name IN (${Q7Nations.map(n => s"'$n'").mkString(", ")})
        AND cn.n_name IN (${Q7Nations.map(n => s"'$n'").mkString(", ")})
        AND sn.n_name <> cn.n_name
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
      ORDER BY supp_nation, cust_nation, l_year
    """))

  /** Correlated scalar subquery, run through `spark.sql` ON PURPOSE: the
    * classic "orders above their customer's average" decorrelation
    * exercise. Catalyst must rewrite the per-row correlated aggregate
    * into ONE grouped aggregate + an equi-join (asserted in
    * PlanShapeSpec) — the rewrite that makes the shape viable at all at
    * scale, since a literal per-row re-scan is quadratic. Arithmetic
    * stays in exact integer cents: `margin = n·cents − Σcents` (the
    * above-average test scaled by the customer's order count), so the
    * filter, ordering and output hash-compare exactly — no double
    * average anywhere. */
  /** The decorrelation plan over an explicit orders relation (see
    * [[q5Plan]]'s rationale — `BucketBench` reruns it over an
    * o_custkey-bucketed table, where BOTH sides of Catalyst's rewritten
    * aggregate+join land exchange-free). */
  private[graft] def aboveAvgPlan(s: org.apache.spark.sql.SparkSession,
      orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    orders.createOrReplaceTempView("orders_v")
    s.sql("""
      WITH oc AS (
        SELECT o_orderkey, o_custkey,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders_v)
      SELECT o_orderkey, o_custkey,
        cents / 100.0D AS price, margin
      FROM (
        SELECT o.*,
          (SELECT count(*) FROM oc i WHERE i.o_custkey = o.o_custkey)
            * o.cents
          - (SELECT sum(cents) FROM oc i WHERE i.o_custkey = o.o_custkey)
            AS margin
        FROM oc o)
      WHERE margin > 0
      ORDER BY margin DESC, o_orderkey
      LIMIT 50
    """)
  }

  private val aboveAvgOrders = QueryDef(
    "above_avg_orders",
    (s, dir) => aboveAvgPlan(s, Tables.orders(s, dir)),
    Some("""
      WITH oc AS (
        SELECT o_orderkey, o_custkey,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders)
      SELECT o_orderkey, o_custkey,
        cents / 100.0 AS price, margin
      FROM (
        SELECT o.*,
          CAST((SELECT count(*) FROM oc i WHERE i.o_custkey = o.o_custkey)
            * o.cents
          - (SELECT sum(cents) FROM oc i WHERE i.o_custkey = o.o_custkey)
            AS BIGINT) AS margin
        FROM oc o)
      WHERE margin > 0
      ORDER BY margin DESC, o_orderkey
      LIMIT 50
    """))


  /** Q17-shape: revenue carried by SMALL orders — lineitems whose
    * quantity is below 20% of their part's average — rolled up per brand
    * (the "would dropping small orders matter" analysis). The correlated
    * per-part average is a whole-partition WINDOW over the part key, not
    * a grouped aggregate joined back: the fact rows are already
    * co-located once they hash-partition on l_partkey, so the stats ride
    * the SAME single full-fact exchange the join form would need just
    * for its probe side — the aggregate's second fact pass (map-combined
    * to near-corpus size: part keys spread across every input split)
    * disappears entirely. The brand dim joins AFTER the filter so only
    * surviving rows pay it, and nothing is force-broadcast (part is
    * SF-proportional — AQE decides). The 20% threshold never touches
    * floats: `qty < 0.2·(sum/cnt)` is evaluated as `5·qty·cnt < sum`
    * over exact integers (quantities are integral-valued), so no
    * engine's division order can flip a boundary row. Money rides the
    * exact integer-micros accumulation. */
  /** The small-qty plan over explicit relations (see [[q5Plan]]'s
    * rationale — `BucketBench` reruns it over an l_partkey-bucketed
    * lineitem, where the window's clustering exchange disappears). */
  private[graft] def smallQtyPlan(lineitem: org.apache.spark.sql.DataFrame,
      part: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val qtyL = col("l_quantity").cast("long")
    val wp = Window.partitionBy(col("l_partkey"))
    lineitem
      .select(col("l_partkey"), qtyL.as("qty"), col("l_extendedprice"))
      .withColumn("cnt_p", count(lit(1)).over(wp))
      .withColumn("sumq_p", sum(col("qty")).over(wp))
      .filter(lit(5L) * col("qty") * col("cnt_p") < col("sumq_p"))
      // shuffle-hash, never broadcast, for the brand dim: part is
      // SF-proportional and its broadcast was the row's dominant cost —
      // the driver-side HashedRelation build of the 2M-entry
      // (p_partkey -> p_brand) map alone measured 1.16 s at sf10 vs the
      // whole query's 1.03 s window floor (SCALE.md r17). The hinted
      // shuffled join exchanges only the ~30 MB part projection and
      // builds per-partition maps executor-PARALLEL; the fact side is
      // already hash(l_partkey)-clustered by the window (and by the
      // bucketed layout), so it never re-exchanges. One small dim
      // exchange replacing a corpus-growing driver broadcast is the
      // right trade at every scale — the hint encodes exactly that.
      .join(part.select(col("p_partkey"), col("p_brand")).hint("shuffle_hash"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small"),
        cents(microsSum(col("l_extendedprice"))).as("small_revenue"))
      .orderBy(col("p_brand"))
  }

  private val smallQtyRevenue = QueryDef(
    "small_qty_revenue",
    (s, dir) => smallQtyPlan(Tables.lineitem(s, dir), Tables.part(s, dir)),
    Some("""
      WITH stats AS (
        SELECT l_partkey, count(*) AS cnt_p,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumq_p
        FROM lineitem GROUP BY 1)
      SELECT p_brand, count(*) AS n_small,
        floor(CAST(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)) + 5000 AS DOUBLE) / 10000.0) / 100.0 AS small_revenue
      FROM lineitem l
      JOIN stats s USING (l_partkey)
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE 5 * CAST(l_quantity AS BIGINT) * cnt_p < sumq_p
      GROUP BY 1
      ORDER BY 1
    """))

  /** Grouping-sets coverage: the q1 pricing aggregate at every ROLLUP
    * level of (returnflag, linestatus) — detail rows, per-flag subtotals
    * and the grand total in one pass. Catalyst plans ROLLUP as a single
    * Expand + hash-aggregate, so the fact table is still scanned ONCE and
    * shuffled once (on the expanded grouping keys) — the same cost class
    * as q1, not one pass per level. Money goes through the exact
    * integer-micros accumulation above; quantity is integral-valued so
    * its double sum is order-exact as-is. NULL grouping placeholders sort
    * first on both engines (explicit NULLS FIRST in the oracle — DuckDB
    * defaults NULLS LAST). */
  private val rollupPricing = QueryDef(
    "rollup_pricing",
    (s, dir) => {
      import s.implicits._
      // TWO-LEVEL rollup: the fact aggregates to the (flag, status) grain
      // FIRST (map-side combined — the q1 cost), and ROLLUP's Expand runs
      // over that ~6-row relation instead of tripling the 6M-row agg
      // input (measured: Expand over the fact was ~1 s of the 2.4 s sf1
      // time). Exactly value-identical: n_rows/micros are long sums
      // (associative), sum_qty sums integral-valued doubles (exact in
      // IEEE up to 2^53, so re-association cannot change it).
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n0"),
          sum($"l_quantity").as("q0"),
          microsSum($"l_extendedprice").as("m0"))
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum($"n0").as("n_rows"),
          sum($"q0").as("sum_qty"),
          cents(sum($"m0")).as("sum_price"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        sum(l_quantity) AS sum_qty,
        floor(CAST(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)) + 5000 AS DOUBLE) / 10000.0) / 100.0 AS sum_price
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """))

  /** Exact distribution statistics: continuous (interpolated) and discrete
    * p50/p90/p99 of the price per return flag. Inputs ride the exact
    * integer-cents representation, so the only floating arithmetic is the
    * single `lower + (upper−lower)·frac` interpolation step — the same
    * IEEE expression on both engines (rounded to 4 anyway). Exact
    * percentile is a sort-based aggregate (per-group sorted buffer); the
    * 100 TB variant is `approx_percentile` (t-digest-family sketch, fixed
    * memory, mergeable partials) — approximate results are
    * engine-specific, so the oracle-gated form is the exact one and the
    * sketch is the documented production lever. */
  private val percentileStats = QueryDef(
    "percentile_stats",
    (s, dir) => {
      import s.implicits._
      // Exact percentiles via TWO-PHASE SELECTION (histogram refinement):
      // phase 1 aggregates COARSE buckets (cents >> 12, ~41-cent ranges) —
      // a shuffle of O(#buckets) rows regardless of corpus size — and a
      // per-group cumulative sum over that tiny relation locates the
      // bucket containing each target rank; phase 2 re-scans the fact
      // filtered to ONLY those buckets (a broadcast semi-join; a handful
      // of buckets per group) and row_numbers within them to pick the
      // exact values. Both phases live in ONE lazy DAG — no driver
      // materialization between them. This replaces the one-level
      // count-histogram plan whose aggregate carried O(distinct values)
      // groups (nearly one per row for continuous money values — the
      // hash-agg itself was the measured bottleneck, not the window).
      // Spark's own `percentile` aggregate is worse still (per-partition
      // value-map merge, 30× DuckDB here). Interpolation uses DuckDB's
      // own `v_lo + (v_hi − v_lo)·frac` over exact integer cents.
      val cents = Tables.lineitem(s, dir)
        .select($"l_returnflag",
          // floor(x+0.5), not round(x): Spark's Round on DoubleType
          // allocates a BigDecimal PER ROW (measured ~1 s per 6M-row
          // pass at sf1); floor stays in codegen double math. Equal to
          // HALF_UP for these positive near-integer scaled prices, and
          // the oracle uses the IDENTICAL formula so both engines run
          // the same IEEE ops — no cross-engine boundary exists.
          floor($"l_extendedprice" * 100 + 0.5).cast("long").as("cents"))
        .withColumn("bucket", shiftright($"cents", 12))
      // coalesce(1): the bucket histogram is O(#buckets) = O(price-domain /
      // 4096) rows PER FLAG — bounded by the value domain, not the corpus —
      // and a single partition satisfies every downstream window's
      // distribution requirement, so both windows run exchange-free on one
      // trivial task instead of 32-task shuffles of a few-KB relation
      val bhist = cents.groupBy($"l_returnflag", $"bucket")
        .agg(count(lit(1)).as("cnt"))
        .coalesce(1)
      val wb = Window.partitionBy($"l_returnflag").orderBy($"bucket")
      // two consumers (the rank-target branch and the located self-join)
      // re-derive this relation; Spark's exchange reuse dedupes the
      // histogram shuffle, and measured cold runs are FASTER without a
      // .cache() here (materialization blocks pipelining — the repo-wide
      // finding). `n` (group row count) rides the SAME per-flag exchange
      // as the cumulative sum (equal partition keys collapse into one
      // Window operator pair), so no separate n-per-group branch exists.
      val bcum = bhist
        .withColumn("hi_b", sum($"cnt").over(
          wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("lo_b", $"hi_b" - $"cnt" + 1)
        .withColumn("n", max($"hi_b").over(Window.partitionBy($"l_returnflag")))
      def rnk(p: Double) = (floor(($"n" - 1) * p) + 1).cast("long")
      // exactly one row per group has hi_b = n (cumsum is strictly
      // increasing within a flag) — the rank targets derive from that row,
      // not from a second aggregation over the bucket relation
      val targets = bcum.filter($"hi_b" === $"n")
        .select($"l_returnflag", $"n", explode(array(
          struct(lit("lo50").as("lab"), rnk(0.5).as("rank")),
          struct(lit("hi50").as("lab"), (rnk(0.5) + 1).as("rank")),
          struct(lit("lo90").as("lab"), rnk(0.9).as("rank")),
          struct(lit("hi90").as("lab"), (rnk(0.9) + 1).as("rank")),
          struct(lit("lo99").as("lab"), rnk(0.99).as("rank")),
          struct(lit("hi99").as("lab"), (rnk(0.99) + 1).as("rank")),
          struct(lit("d50").as("lab"), ceil($"n" * 0.5).cast("long").as("rank")))).as("t"))
        .select($"l_returnflag", $"n", $"t.lab".as("lab"), $"t.rank".as("rank"))
        .filter($"rank" <= $"n")
        .select($"l_returnflag", $"n", $"lab", $"rank")
      // bucket containing each target rank + the offset within it; `n`
      // rides along so the final join back to an n-per-group relation
      // disappears
      val bref = bcum.select($"l_returnflag".as("bflag"), $"bucket",
        $"lo_b", $"hi_b")
      val located = targets.join(bref,
          $"l_returnflag" === $"bflag" && $"rank".between($"lo_b", $"hi_b"))
        .select($"l_returnflag".as("flag"), $"n", $"lab",
          $"bucket".as("bkt"), ($"rank" - $"lo_b" + 1).as("off"))
      // ONE broadcast join restricts the re-scan to the needed buckets AND
      // attaches the targets: a bucket holding t targets duplicates its
      // rows t times (t ≤ 7), and partitioning the row_number by (flag,
      // bucket, lab) makes each target's copy rank the full bucket
      // independently — no separate `needed` distinct + second broadcast.
      val picked = cents
        .join(broadcast(located),
          $"l_returnflag" === $"flag" && $"bucket" === $"bkt")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"flag", $"bkt", $"lab").orderBy($"cents")))
        .filter($"rn" === $"off")
        .select($"l_returnflag", $"n", $"lab", $"cents".as("v"))
      val vals = picked.groupBy($"l_returnflag")
        .agg(
          max(when($"lab" === "lo50", $"v")).as("lo50"),
          max(when($"lab" === "hi50", $"v")).as("hi50"),
          max(when($"lab" === "lo90", $"v")).as("lo90"),
          max(when($"lab" === "hi90", $"v")).as("hi90"),
          max(when($"lab" === "lo99", $"v")).as("lo99"),
          max(when($"lab" === "hi99", $"v")).as("hi99"),
          max(when($"lab" === "d50", $"v")).as("d50"),
          max($"n").as("n"))
      def interp(p: Double, vlo: org.apache.spark.sql.Column,
          vhi: org.apache.spark.sql.Column) = {
        val frac = ($"n" - 1) * p - floor(($"n" - 1) * p)
        round(vlo + (vhi - vlo) * frac, 4)
      }
      vals.select($"l_returnflag",
          interp(0.5, $"lo50", coalesce($"hi50", $"lo50")).as("p50"),
          interp(0.9, $"lo90", coalesce($"hi90", $"lo90")).as("p90"),
          interp(0.99, $"lo99", coalesce($"hi99", $"lo99")).as("p99"),
          $"d50")
        .orderBy($"l_returnflag")
    },
    Some("""
      WITH c AS (
        SELECT l_returnflag, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem)
      SELECT l_returnflag,
        round(quantile_cont(cents, 0.5), 4) AS p50,
        round(quantile_cont(cents, 0.9), 4) AS p90,
        round(quantile_cont(cents, 0.99), 4) AS p99,
        CAST(quantile_disc(cents, 0.5) AS BIGINT) AS d50
      FROM c
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))
}
