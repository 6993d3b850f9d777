package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-shaped tables — the generic
  * OLAP surface of the engine (scan → filter-pushdown → join → partial
  * agg → top-n), exercised on lineitem/orders/customer/nation.
  *
  * Float determinism (SURVEY.md §6): money sums run over DECIMAL(12,2)
  * — double sums of ~1e8 magnitude carry absolute error far above the
  * 6-dp oracle hash, and accumulation order differs per engine. Decimal
  * aggregation is exact in both Spark and DuckDB; the exact sum casts
  * to an identical double on both sides. decimal(12,2) products stay
  * within precision 38, so Spark never truncates scale.
  */
object Analytics {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(12,2)")

  /** TPC-H Q1-shape pricing summary: codegen'd arithmetic, map-side
    * partial agg on a 4-value group key, shipdate filter pushed to the
    * parquet scan. */
  def pricingSummary(lineitem: DataFrame, shipBefore: String = "1998-09-02"): DataFrame = {
    val discPrice = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    val charge = discPrice * (one + dec(col("l_tax")))
    lineitem
      .filter(col("l_shipdate") <= lit(shipBefore))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(dec(col("l_quantity"))).cast("double"), 6).as("sum_qty"),
        round(sum(dec(col("l_extendedprice"))).cast("double"), 6).as("sum_base_price"),
        round(sum(discPrice).cast("double"), 6).as("sum_disc_price"),
        round(sum(charge).cast("double"), 6).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 6))
      .withColumn("avg_price", round(col("sum_base_price") / col("count_order"), 6))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Native CUBE revenue report (q188): every subtotal combination of
    * (return flag, line status, ship year) in ONE pass — Catalyst's
    * `cube` plans a single Expand + aggregate (each input row fans to
    * its 2³ grouping-set rows BEFORE the map-side partial combine), so
    * the whole lattice costs one exchange of ≤ 8×|groups| partials:
    * the OLAP subtotal face (`GROUP BY CUBE`) the per-key reports
    * don't cover. `grouping_id` disambiguates a rolled-up dimension
    * from a literal NULL — Spark and DuckDB share the
    * leftmost-arg-is-MSB bit convention, so the column is hash-exact.
    * Money stays in DECIMAL sums (the q20 discipline), rounded once at
    * emission. */
  def revenueCube(lineitem: DataFrame): DataFrame = {
    val discPrice = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    // Pre-aggregate to the FINE grain before the cube: Expand fans
    // every input row to its 2³ grouping-set rows, so cubing the fact
    // table directly pays 8× the scan volume in Expand+partial-agg
    // CPU. The fine grain here is ≤ |flags|·|statuses|·|years| (tens
    // of rows at any scale), so one ordinary map-side-combined
    // exchange first, then the cube's Expand runs over tens of rows
    // instead of the corpus. Exactness is unchanged: counts re-sum,
    // and DECIMAL partial sums re-sum associatively — the rounded
    // emission sees the bit-identical total (r19 measured 5.3 s →
    // sub-second at sf0.1, hash-green).
    val fine = lineitem
      .withColumn("ship_year", year(col("l_shipdate")))
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(count(lit(1)).as("fine_n"), sum(discPrice).as("fine_rev"))
    fine
      .cube(col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(grouping_id().cast("int").as("gid"),
        sum(col("fine_n")).as("n_rows"),
        round(sum(col("fine_rev")).cast("double"), 6).as("revenue"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"),
        asc_nulls_first("ship_year"), asc("gid"))
  }

  /** Grouped top-k: the k best documents by quality proxy per
    * (lang, source) group — rank window inside each group, filter
    * rank <= k. The window shuffles once on the group key; with a
    * high-cardinality group key this is the scalable form of
    * "top-k per key" (a global sort would be wrong and a per-key
    * collect would be worse). Deterministic tiebreak on doc_id. */
  def topDocsPerGroup(docs: DataFrame, k: Int): DataFrame = {
    // Pre-prune through the custom GroupedTopK operator (bounded
    // per-partition heaps BEFORE the exchange — graft.plans), then rank
    // the ≤k survivors per group. The compound order includes the
    // doc_id tiebreak, so the pruned set is exactly the rows the window
    // formulation would keep; ranking them reproduces rnk = 1..k.
    val pruned = graft.plans.GroupedTopK.topK(
      docs.select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
      Seq(col("lang"), col("source")),
      Seq(col("n_chars").desc, col("doc_id").asc), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    pruned
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("lang"), col("source"), col("rnk"), col("doc_id"), col("n_chars"))
      .orderBy("lang", "source", "rnk")
  }

  /** Per-source vocabulary statistics: token volume, EXACT distinct
    * token count, type-token ratio — the vocabulary-growth audit a
    * corpus pipeline runs per domain. Two-level aggregation: the
    * (source, term) partial agg collapses the token stream to term
    * frequencies per task before the exchange, so the shuffle is
    * O(distinct terms), never the raw stream; the second agg is
    * O(#sources). The approximate twin (HLL++ via
    * `approx_count_distinct`, one pass, constant memory) is the 100 TB
    * default when exactness isn't contractual — spec'd against this
    * exact path within its rsd bound. */
  def vocabStats(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
    val agg = tf.groupBy("source").agg(
      count(lit(1)).as("n_distinct_tokens"), sum("c").as("n_tokens"))
    val nd = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    agg.join(nd, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_distinct_tokens"),
        round(col("n_distinct_tokens").cast("double") / col("n_tokens"), 6)
          .as("type_token_ratio"))
      .orderBy("source")
  }

  /** Zipf-law fit of the token-frequency distribution (q166): OLS slope
    * of ln(freq) on ln(rank) over the top-N tokens, plus the corpus
    * shape numbers (total/vocab/hapax/top-1 share) — the
    * distribution-health dial next to [[vocabStats]]'s volumes. Natural
    * language sits near slope −1 (Zipf 1949); a corpus of boilerplate
    * or template expansion reads much steeper, machine-generated
    * near-uniform text much flatter — a one-row dial that catches both
    * corruption modes.
    *
    * Determinism discipline (the q38 micro-unit convention): each
    * ln(rank)/ln(freq) is individually 6-dp rounded THEN scaled to an
    * integer micro-unit, so the regression's Σx, Σy, Σxy, Σx² are exact
    * integer sums with no accumulation-order surface; the slope is one
    * division of exact integers (scale factors cancel), 6-dp rounded.
    * All magnitudes stay < 2^60 at topN = 100.
    *
    * Scale shape: term frequencies are the [[vocabStats]] two-level
    * collapse (shuffle O(distinct terms)); top-N is a TakeOrdered
    * (bounded heaps, never a global sort); the regression runs over
    * EXACTLY topN rows — the rank window is topN-bounded, not
    * data-bounded. One row out. */
  def zipfReport(docs: DataFrame, topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val totals = tf.agg(sum(col("c")).as("total_tokens"),
      count(lit(1)).as("vocab_size"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
      max(col("c")).as("top1_n"))
    val top = tf.orderBy(col("c").desc, col("term")).limit(topN)
      .withColumn("rank", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("c").desc, col("term"))).cast("long"))
    // round AGAIN after the 1e6 scale: the product of a 6-dp double and
    // 1e6 can land an ulp under the integer, and Spark CAST truncates
    // where DuckDB CAST rounds — round(x, 0) makes both engines agree
    def micro(c: org.apache.spark.sql.Column) = round(round(log(c), 6) * 1e6, 0).cast("long")
    val xy = top
      .select(micro(col("rank").cast("double")).as("x"), micro(col("c").cast("double")).as("y"))
      .agg(count(lit(1)).as("np"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sx2"))
    xy.crossJoin(totals)
      .select(col("total_tokens"), col("vocab_size"), col("n_hapax"),
        round(col("top1_n").cast("double") / col("total_tokens").cast("double"), 6)
          .as("top1_share"),
        col("np").as("fit_n"),
        round((col("np") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("np") * col("sx2") - col("sx") * col("sx")).cast("double"), 6)
          .as("zipf_slope"),
        round((col("sy").cast("double") / 1e6 -
          ((col("np") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("np") * col("sx2") - col("sx") * col("sx")).cast("double")) *
            (col("sx").cast("double") / 1e6)) / col("np").cast("double"), 6)
          .as("zipf_intercept"))
  }

  /** Approximate twin of [[vocabStats]]'s distinct count (HLL++). */
  def vocabStatsApprox(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("source")
      .agg(approx_count_distinct(col("term"), rsd).as("n_distinct_approx"))
      .orderBy("source")

  /** Per-label embedding centroid statistics: mean and variance of
    * every dimension — the cluster-quality audit for labeled/bucketed
    * vector collections. posexplode is a narrow generator (n·dim
    * rows); the (label, pos) partial agg carries three exact-ish sums
    * per task — shuffle is O(labels × dim), data-size-independent.
    * Mean/variance derive from explicit sum/count (NOT `avg`/`var_samp`
    * — engines disagree on accumulation algorithms; plain double sums
    * of identical operands agree to the last ulp here, SURVEY.md §6). */
  def centroidStats(vectors: DataFrame): DataFrame =
    vectors
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), col("pos"), col("x").cast("double").as("x"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
      .select(
        col("label"), col("pos"), col("n"),
        round(col("sx") / col("n"), 6).as("mean"),
        round(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")), 6)
          .as("variance"))
      .orderBy("label", "pos")

  /** Fixed-width histogram of document lengths per language:
    * bucket = floor(n_chars / width) * width. Pure integer binning —
    * engine-portable, no quantile-algorithm coupling — and a single
    * partial-agg shuffle on (lang, bucket). */
  def lengthHistogram(docs: DataFrame, width: Int): DataFrame =
    docs.select(col("lang"),
        (floor(col("n_chars") / width) * width).cast("long").as("bucket"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "bucket")

  /** Revenue by supplier region/nation for a part family (TPC-H Q9
    * flavor) — exercises the full star: lineitem ⋈ part (filtered,
    * broadcast after pushdown) ⋈ supplier ⋈ nation ⋈ region (broadcast
    * dims). The part filter prunes at the parquet scan BEFORE the
    * broadcast, so the build side ships only matching parts. */
  def supplierRegionRevenue(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                            nation: DataFrame, region: DataFrame,
                            partType: String = "PROMO"): DataFrame = {
    val rev = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    lineitem
      .join(broadcast(part.filter(col("p_type").contains(partType))
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        round(sum(rev).cast("double"), 6).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("r_name", "n_name")
  }

  /** Hierarchical rollup of the documents corpus over (lang, source)
    * with grouping-set subtotals. Null grouping markers are coalesced
    * to an 'ALL' sentinel so the output is total-order sortable and
    * engine-portable (NULL sort position differs per engine). */
  def docRollup(docs: DataFrame): DataFrame =
    docs.rollup("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("total_chars"))
      .orderBy("lang", "source")

  /** Per-user running aggregates over the event stream: cumulative
    * value sum and 3-event moving average, ordered by time with an
    * event_id tiebreak (events can share a timestamp — without the
    * tiebreak frame contents are engine-dependent). One shuffle on
    * user_id; frames are bounded (rows-between), so state is O(frame). */
  def runningValue(events: DataFrame): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val last3 = byUser.rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
    events.select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("cum_value", round(sum("value").over(byUser), 6))
      .withColumn("avg3_value", round(avg("value").over(last3), 6))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        round(col("value"), 6).as("value"), col("cum_value"), col("avg3_value"))
      .orderBy("event_id")
  }

  /** Revenue per nation since a date (TPC-H Q5 shape): lineitem⋈orders
    * shuffle join on the fact keys, nation broadcast (a true dimension —
    * 25 rows at any scale), orderdate filter pushed down. Customer joins
    * by shuffle: it grows with SF, so it must NOT be broadcast. */
  def revenueByNation(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, since: String = "1995-01-01"): DataFrame = {
    val rev = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    lineitem
      .join(orders.filter(col("o_orderdate") >= lit(since)),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(rev).cast("double"), 6).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** Shipping-priority top-10 (TPC-H Q3 shape): the revenue of orders a
    * segment's customers placed before the cutoff whose goods shipped
    * after it. Both date predicates push to the parquet scans, the
    * segment filter prunes customer BEFORE its shuffle join (customer
    * grows with SF — never broadcast), and the final top-10 runs as
    * TakeOrderedAndProject: per-partition bounded heaps, no global sort
    * shuffle — the only full pass is the grouped aggregation on
    * l_orderkey, which AQE coalesces. Ties broken by (o_orderdate,
    * l_orderkey) so the cut line is deterministic across engines. */
  def shippingPriority(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                       segment: String, cutoff: String, topN: Int = 10): DataFrame = {
    val rev = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    lineitem
      .filter(col("l_shipdate") > lit(cutoff))
      .join(orders.filter(col("o_orderdate") < lit(cutoff)),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.filter(col("c_mktsegment") === lit(segment)).select("c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(rev).cast("double"), 6).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(desc("revenue"), asc("o_orderdate"), asc("l_orderkey"))
      .limit(topN)
  }

  /** Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    * join so zero-order customers land in the c_count=0 bucket, with
    * the priority exclusion folded into the JOIN CONDITION (not a WHERE
    * — a where-filter would silently drop the outer rows). Two
    * aggregations: per-customer count shuffles on c_custkey, then the
    * distribution shuffles on the ~tens-of-values c_count — the second
    * exchange is negligible at any SF. */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame,
                             excludePriorityPrefix: String): DataFrame = {
    val perCustomer = customer.select("c_custkey")
      .join(orders.filter(!col("o_orderpriority").startsWith(excludePriorityPrefix))
          .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCustomer.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** Order-priority check (TPC-H Q4 shape): orders in a date window
    * having at least one returned lineitem — a LEFT SEMI join, which
    * Spark executes without materializing the match multiplicity (one
    * probe hit short-circuits), then a 5-group count. The returnflag
    * and date filters both push to their scans; the semi join shuffles
    * only the two filtered key columns. */
  def priorityOrderCount(orders: DataFrame, lineitem: DataFrame,
                         from: String, until: String): DataFrame = {
    orders
      .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
      .join(lineitem.filter(col("l_returnflag") === lit("R")).select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Promo revenue share (q98, TPC-H Q14 shape): the fraction of a
    * month's discounted revenue from promo parts — the conditional-
    * aggregate-over-a-join class (one pass computes both the
    * conditional and unconditional sums; a naive twin runs the join
    * twice). Money math in DECIMAL(12,2); the single final division
    * runs in double from two exact decimal sums, rounded at emission.
    * The date window pushes to the lineitem scan; the part join
    * carries only (partkey, is-promo). */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
                        from: String, until: String): DataFrame = {
    val disc = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .join(part.select(col("p_partkey"),
        col("p_type").contains("PROMO").as("is_promo")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("is_promo"), disc).otherwise(lit(0).cast("decimal(12,2)")))
          .as("promo"),
        sum(disc).as("total"))
      .select(round(lit(100d) * col("promo").cast("double") /
        col("total").cast("double"), 6).as("promo_share_pct"),
        round(col("promo").cast("double"), 6).as("promo_revenue"),
        round(col("total").cast("double"), 6).as("total_revenue"))
  }

  /** Returned-item customer ranking (q99, TPC-H Q10 shape): customers
    * ranked by revenue lost to returns in a quarter — the 4-way
    * fact/dim join + TakeOrdered class (Q5/Q3's family with a second
    * dimension hop). Both date and returnflag filters prune their
    * scans BEFORE the joins; the nation dim broadcasts (25 rows at
    * every SF); customer⋈orders⋈lineitem shuffle on their keys with
    * AQE free to broadcast the filtered orders side at small SF. Money
    * in DECIMAL(12,2); top-n ties pinned by custkey. */
  def returnedItemRanking(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, nation: DataFrame,
                          from: String, until: String, topN: Int): DataFrame = {
    val disc = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    val o = orders
      .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
      .select("o_orderkey", "o_custkey")
    val l = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), disc.as("disc_price"))
    customer.select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("disc_price")).cast("double"), 6).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(topN)
  }

  /** Disjunctive-band revenue (q102, TPC-H Q19 shape): revenue from
    * lineitems matching ANY of three (brand, size-band, quantity-band)
    * clauses — the OR-of-conjunctions predicate class whose planning
    * trap is losing pushdown (a naive OR over join columns forces the
    * full join first). The brand/size legs hit the part side and the
    * quantity legs the lineitem side BEFORE the join: each side's scan
    * filter is the OR of its own half-clauses (a row matching no
    * clause-half can't match any clause), then the exact per-clause
    * conjunction applies post-join — the relational form of Q19's
    * `p_partkey = l_partkey AND (... OR ... OR ...)`. Money decimal. */
  def bandRevenue(lineitem: DataFrame, part: DataFrame,
                  bands: Seq[(String, Int, Int, Int, Int)]): DataFrame = {
    require(bands.nonEmpty)
    val disc = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    val partPre = bands.map { case (b, sLo, sHi, _, _) =>
      col("p_brand") === b && col("p_size").between(sLo, sHi)
    }.reduce(_ || _)
    val liPre = bands.map { case (_, _, _, qLo, qHi) =>
      col("l_quantity") >= qLo && col("l_quantity") <= qHi
    }.reduce(_ || _)
    val full = bands.map { case (b, sLo, sHi, qLo, qHi) =>
      col("p_brand") === b && col("p_size").between(sLo, sHi) &&
        col("l_quantity") >= qLo && col("l_quantity") <= qHi
    }.reduce(_ || _)
    lineitem.where(liPre)
      .join(part.where(partPre).select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .where(full)
      .agg(round(sum(disc).cast("double"), 6).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Dormant high-balance customers (q103, TPC-H Q22 shape): per
    * market segment, customers whose balance exceeds the global
    * positive-balance average AND who placed no orders in the window —
    * the anti-join + scalar-subquery class. The average COMPARISON is
    * integer cross-multiplied (`bal_cents · n_pos > Σ_pos_cents` ⟺
    * bal > avg) so no float average ever exists to disagree about at
    * the boundary; the 2-value (Σ, n) aggregate broadcasts into the
    * filter, the order check is a LEFT ANTI join on custkey. */
  def dormantHighBalance(customer: DataFrame, orders: DataFrame,
                         from: String, until: String): DataFrame = {
    val cents = round(col("c_acctbal") * 100d).cast("long")
    val pos = customer.where(col("c_acctbal") > 0)
      .agg(sum(round(col("c_acctbal") * 100d).cast("long")).as("sum_pos"),
        count(lit(1)).as("n_pos"))
    val active = orders
      .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
      .select("o_custkey").distinct()
    customer
      .withColumn("bal_cents", cents)
      .crossJoin(broadcast(pos))
      .where(col("bal_cents") * col("n_pos") > col("sum_pos"))
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("bal_cents")).cast("double") / 100d, 6).as("total_balance"))
      .orderBy("c_mktsegment")
  }

  /** Pearson correlation report (q101): r between quantity and
    * extended price per return flag — the column-relationship audit
    * (pricing anomalies, schema drift where a derived column stops
    * tracking its source). NOT `corr()`: engines disagree on the
    * accumulation algorithm (Spark streams a co-moment; the float sum
    * order differs), so the five moment sums run in DECIMAL (exact,
    * partitioning-invariant) and the closed form
    *   r = (nΣxy − ΣxΣy) / √((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    * evaluates in double ONCE at emission with one fixed association —
    * sqrt is IEEE-correctly-rounded in both engines (§6).
    * One map-side-partial aggregation to O(groups) rows. */
  def priceQuantityCorrelation(lineitem: DataFrame): DataFrame = {
    // Cent-unit LONGS for four of the five moments (r and slope are
    // scale-invariant, so the ×100 cancels): long sums run inside
    // whole-stage codegen where the all-decimal formulation measured
    // 30× slower (BigDecimal accumulation per row). Σy² alone stays
    // DECIMAL — in cents² it overflows 2⁶³ at ~10⁶ rows — and is
    // rescaled by 10⁴ in the closed form. Headroom on the long sums:
    // Σxy < 2⁶³ to ~10⁸ rows per flag; past that, center first.
    val xu = round(col("l_quantity") * 100d).cast("long")
    val yu = round(col("l_extendedprice") * 100d).cast("long")
    val y = col("l_extendedprice").cast("decimal(12,2)")
    val agg = lineitem
      .where(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(xu).as("sx"), sum(yu).as("sy"),
        sum(xu * yu).as("sxy"), sum(xu * xu).as("sxx"),
        sum(y * y).as("syy"))
    def d(c: String) = col(c).cast("double")
    val num = d("n") * d("sxy") - d("sx") * d("sy")
    val denx = d("n") * d("sxx") - d("sx") * d("sx")
    val deny = d("n") * (d("syy") * lit(10000d)) - d("sy") * d("sy")
    agg.select(col("l_returnflag"), col("n"),
        round(num / sqrt(denx * deny), 6).as("r"),
        round(num / denx, 6).as("slope"))
      .orderBy("l_returnflag")
  }

  /** Corpus heavy hitters (q85): every token whose frequency exceeds
    * 1/`phiInv` of the total token stream — the φ-heavy-hitter set
    * behind stopword mining, boilerplate detection, and vocabulary
    * truncation decisions. The gate `c · phiInv > N` is pure 64-bit
    * integer arithmetic (no frequency ratio is ever compared in
    * float); the reported share divides two exact integers once,
    * rounded at emission.
    *
    * Scale shape: one (term) partial-agg exchange — the same
    * O(distinct terms) shuffle as [[vocabStats]], never the raw
    * stream; the total re-aggregates the term counts (k-row partials),
    * and broadcasts ONE row back. Output is ≤ phiInv rows BY MATH
    * (pigeonhole: at most phiInv tokens can each hold > N/phiInv of N),
    * so the result is driver-safe at any corpus size — the
    * strictly-harder exact version of what Misra-Gries/SpaceSaving
    * sketches approximate in one pass, which is the spec'd 100 TB twin
    * ([[heavyHittersSketch]]). */
  def heavyHitters(docs: DataFrame, phiInv: Int): DataFrame = {
    require(phiInv >= 1, s"phiInv must be >= 1, got $phiInv")
    val tf = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val total = tf.agg(sum("c").as("n_total"))
    tf.crossJoin(broadcast(total))
      .where(col("c") * lit(phiInv.toLong) > col("n_total"))
      .select(col("term"), col("c"),
        round(col("c").cast("double") / col("n_total").cast("double"), 6)
          .as("share"))
      .orderBy(desc("c"), asc("term"))
  }

  /** One-pass Misra-Gries sketch twin of [[heavyHitters]] — the 100 TB
    * shape when a second pass over the term counts is unwanted: each
    * partition keeps at most `k` counters (decrement-all on overflow),
    * partial summaries merge by counter addition then re-trim. The MG
    * guarantee survives merging: any term with true frequency
    * > N/k is PRESENT in the merged summary (candidates may include
    * false positives — one exact counting pass over the ≤ k·partitions
    * candidate set confirms, which is what [[heavyHitters]]'s gate
    * does on the full vocabulary). Returns the candidate terms. */
  def heavyHittersSketch(docs: DataFrame, k: Int): Seq[String] = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.Encoders
    val partials = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .select("term").as(Encoders.STRING)
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { t =>
          if (counters.contains(t)) counters(t) += 1L
          else if (counters.size < k) counters(t) = 1L
          else {
            // decrement-all: drop zeroed counters
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            counters.keysIterator.foreach { key =>
              counters(key) -= 1L
              if (counters(key) == 0L) dead += key
            }
            dead.foreach(counters.remove)
          }
        }
        counters.iterator.map { case (t, c) => (t, c) }
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .collect() // bounded: <= k counters per partition
    val merged = scala.collection.mutable.HashMap.empty[String, Long]
    partials.foreach { case (t, c) => merged(t) = merged.getOrElse(t, 0L) + c }
    merged.toSeq.sortBy { case (t, c) => (-c, t) }.take(k).map(_._1)
  }

  /** Forecast-revenue-change aggregate (q87, TPC-H Q6 shape): one
    * filter-and-sum over lineitem — the canonical scan-bound query
    * whose whole cost is how little data survives the scan. Every
    * predicate (date window, discount band, quantity cap) pushes into
    * the parquet reader; row-group min/max stats on shipdate skip
    * whole chunks of a date-partitioned lake. Money math runs in
    * DECIMAL(12,2) like [[pricingSummary]] (double sums are
    * order-dependent; decimal sums are exact and
    * partitioning-invariant), rounded once at emission. */
  def forecastRevenue(lineitem: DataFrame, from: String, until: String,
                      discLo: String, discHi: String, maxQty: Int): DataFrame = {
    val disc = col("l_discount").cast("decimal(12,2)")
    lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .filter(disc >= lit(discLo).cast("decimal(12,2)") &&
        disc <= lit(discHi).cast("decimal(12,2)"))
      .filter(col("l_quantity") < lit(maxQty))
      .agg(
        round(sum(col("l_extendedprice").cast("decimal(12,2)") * disc)
          .cast("double"), 6).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Small-quantity-order revenue (q104, TPC-H Q17 shape): revenue
    * from lineitems whose quantity is below 1/fracInv of their part's
    * average — the per-group scalar-subquery class ("rows unusual
    * relative to their own group's statistic"). ONE pass: after the
    * brand filter prunes parts, a window over l_partkey carries
    * (n, Σqty) to every row — no second scan or self-join, one shuffle
    * on partkey. Quantities are integral in this corpus, so the gate
    * is cross-multiplied in longs (fracInv·qty·n < Σqty ⟺
    * qty < Σqty/(fracInv·n)) — no float average at the boundary.
    * The brand-filtered part leg carries NO forced broadcast: one
    * brand is ~1/25 of part and part grows with SF, so at 100 TB a
    * hint would OOM the driver. AQE picks broadcast-vs-shuffle from
    * the measured post-filter size at each scale instead. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
                           brand: String, fracInv: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val qtyU = round(col("l_quantity")).cast("long")
    lineitem
      .join(part.where(col("p_brand") === brand).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("qty_u", qtyU)
      .withColumn("n_part", count(lit(1)).over(w))
      .withColumn("sum_qty", sum(col("qty_u")).over(w))
      .where(col("qty_u") * col("n_part") * fracInv < col("sum_qty"))
      .agg(
        round(sum(dec(col("l_extendedprice"))).cast("double"), 6).as("revenue"),
        count(lit(1)).as("n_small"))
  }

  /** Large-volume orders (q105, TPC-H Q18 shape): orders whose total
    * quantity exceeds a threshold, joined back to orders+customer —
    * the HAVING-filter-then-rejoin class. The per-order aggregate is
    * the only full shuffle; the surviving set is a thin tail of
    * orders at every SF, but it GROWS with SF (5% of a 100 TB orders
    * table is not a broadcast), so the join-back carries no forced
    * hint — AQE broadcasts it when the measured survivor size fits
    * and shuffle-joins when it doesn't. Integer quantity sums. */
  def largeOrders(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  minQty: Long, topN: Int): DataFrame = {
    val big = lineitem
      .groupBy("l_orderkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("total_qty"))
      .where(col("total_qty") > minQty)
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer.select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(dec(col("o_totalprice")).cast("double"), 6).as("o_totalprice"),
        col("total_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(topN)
  }

  /** Top supplier(s) by windowed revenue (q106, TPC-H Q15 shape): the
    * max-with-TIES class — join back on EQUALITY with the maximum
    * aggregate, not rank-1/top-k (two suppliers at the same exact
    * revenue must both appear; decimal equality makes the tie exact,
    * which a float max-join could split). Per-supplier agg is one
    * shuffle to O(suppliers) rows; the 1-row max re-aggregates those
    * same rows and cross-broadcasts into the equality filter. */
  def topSupplierRevenue(lineitem: DataFrame, supplier: DataFrame,
                         from: String, until: String): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .groupBy("l_suppkey")
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .as("r"))
    val top = rev.agg(max(col("r")).as("rmax"))
    rev.crossJoin(broadcast(top)).where(col("r") === col("rmax"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("r").cast("double"), 6).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Revenue concentration report (q107, TPC-H Q11 shape): parts whose
    * revenue share exceeds num/den × the average per-part share — the
    * group-share-vs-global-scalar class (Q11's "important stock"
    * fraction, made SCALE-FREE: a fixed share threshold empties as the
    * part count grows; ×-of-average survives any SF). The gate is
    * cross-multiplied in exact 10⁻⁴-unit longs (den·r·np > num·tot ⟺
    * r/tot > num/(den·np)); revenue products carry 4 decimal digits so
    * the units are exact, and the largest side stays < 2⁶³ until
    * ~2500× this corpus's sf1 (documented like ppsSample's bound —
    * beyond that, pre-scale to cents). Two tiny aggregates broadcast;
    * the fact table shuffles once on partkey. */
  def revenueConcentration(lineitem: DataFrame, num: Int, den: Int): DataFrame = {
    val ru = sum((dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      * lit(10000)).cast("long")
    val perPart = lineitem.groupBy("l_partkey")
      .agg(ru.as("r_units"), count(lit(1)).as("n_items"))
    val global = perPart.agg(sum(col("r_units")).as("tot"),
      count(lit(1)).as("np"))
    perPart.crossJoin(broadcast(global))
      .where(col("r_units") * col("np") * den > col("tot") * num)
      .select(col("l_partkey"),
        round(col("r_units").cast("double") / 10000d, 6).as("revenue"),
        col("n_items"),
        round(col("r_units").cast("double") * col("np").cast("double")
          / col("tot").cast("double"), 6).as("x_avg"))
      .orderBy(desc("revenue"), asc("l_partkey"))
  }

  /** Sole-supplier order census (q108, TPC-H Q21 shape): per supplier,
    * how many orders they supplied ALONE — the double-correlated-
    * existential class (EXISTS my lineitem ∧ NOT EXISTS another
    * supplier's). Both existentials collapse into ONE grouped
    * aggregate — per-order (distinct-supplier count, max suppkey);
    * n_supp = 1 pins "mine ∧ no other" and max() then IS the sole
    * supplier — so the plan is a single orderkey shuffle instead of
    * the textbook self-join-twice (which re-shuffles lineitem twice
    * and explodes on high-fanout orders). */
  def soleSupplierOrders(lineitem: DataFrame, supplier: DataFrame,
                         topN: Int): DataFrame =
    lineitem.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        max(col("l_suppkey")).as("the_supp"))
      .where(col("n_supp") === 1)
      .groupBy("the_supp")
      .agg(count(lit(1)).as("n_solo_orders"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("the_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_solo_orders"))
      .orderBy(desc("n_solo_orders"), asc("s_suppkey"))
      .limit(topN)

  /** Cheapest-supplier-per-part report (q109, TPC-H Q2 shape): for
    * each part of a given type in the size classes of interest, in a
    * given region, the supplier(s) offering the MINIMUM observed price
    * — the correlated min-per-group-subquery class (Q2's
    * `ps_supplycost = (SELECT min ...)`), with lineitem history
    * standing in for partsupp (this corpus has no supply-cost table).
    * The per-(part,supplier) offer is min discounted price in DECIMAL
    * (no unit-price division — decimal min is exact, so the
    * tie-keeping equality join-back can't split on float noise). The
    * size gate is a CLASS SET, not a point equality: a single (type,
    * size) cell holds O(|part|/types/sizes) parts, thin enough to be
    * EMPTY on a small corpus (the round-12 gate failure), so the
    * parameter sits on a set whose non-emptiness at every gate scale
    * AnalyticsOpsSpec pins. Only the fixed-cardinality dimensions
    * (25-row nation, 5-row region) carry broadcast hints; the
    * region-filtered supplier and type-filtered part sides both grow
    * linearly with SF, so their join strategy is left to AQE's
    * measured sizes (q76 discipline: never force-broadcast an
    * SF-growing side). Two partkey-partitioned aggregates, the second
    * reusing the first's shuffle output (AQE exchange reuse); ties
    * kept, like Q2. */
  def cheapestSupplierPerPart(lineitem: DataFrame, part: DataFrame,
                              supplier: DataFrame, nation: DataFrame,
                              region: DataFrame, pType: String,
                              pSizes: Seq[Int], rName: String,
                              topN: Int): DataFrame = {
    val regionSupp = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.where(col("r_name") === rName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val parts = part
      .where(col("p_type") === pType && col("p_size").isin(pSizes: _*))
      .select("p_partkey")
    val offers = lineitem
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(regionSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"))
      .agg(min(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .as("offer"))
    val best = offers.groupBy(col("l_partkey").as("b_partkey"))
      .agg(min(col("offer")).as("best_offer"))
    offers.join(best, col("l_partkey") === col("b_partkey") &&
      col("offer") === col("best_offer"))
      .select(round(col("s_acctbal"), 6).as("s_acctbal"), col("s_name"),
        col("n_name"), col("l_partkey"), col("l_suppkey"),
        round(col("offer").cast("double"), 6).as("min_price"))
      .orderBy(desc("s_acctbal"), asc("s_name"), asc("l_partkey"))
      .limit(topN)
  }

  /** Priority shipping census (q110, TPC-H Q12 shape): per return
    * flag, how many in-window lineitems belong to critical-priority
    * orders vs not — the conditional-two-column-count class (Q12's
    * urgent/non-urgent split per ship mode). Both counts come from ONE
    * pass over the join (the run-it-twice anti-pattern avoided): a
    * when/otherwise pair under sum(), all integer. The date window
    * pushes to the lineitem scan; the join shuffles both sides on
    * orderkey once, then a 3-group partial agg collapses map-side. */
  def priorityShipping(lineitem: DataFrame, orders: DataFrame,
                       from: String, until: String,
                       critical: Seq[String]): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .select("l_orderkey", "l_returnflag")
      .join(orders.select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin(critical: _*), 1L)
          .otherwise(0L)).as("critical_count"),
        sum(when(col("o_orderpriority").isin(critical: _*), 0L)
          .otherwise(1L)).as("other_count"))
      .orderBy("l_returnflag")

  /** Supplier diversity census (q111, TPC-H Q16 shape): distinct
    * suppliers per (brand, type, size) bucket for the size classes of
    * interest, excluding one brand and every at-risk supplier — the
    * distinct-count + NOT-IN-anti-join class. The exclusion subquery
    * (s_acctbal < 0, Q16's complaint-supplier stand-in) runs as a
    * LEFT ANTI join (NULL-safe, unlike a naive NOT IN translation);
    * the pair set distincts BEFORE the per-bucket count so a supplier
    * shipping a part 50 times counts once. countDistinct re-shuffles
    * the deduped pairs on the 3-column bucket key — O(pairs), not
    * O(lineitem). Neither filtered side carries a broadcast hint:
    * brand+size keeps ~15% of part and the at-risk set ~9% of
    * supplier — both grow linearly with SF, so forcing a broadcast
    * would OOM the build side at the 100 TB point; AQE picks the
    * strategy from measured sizes instead (broadcast at bench scale,
    * shuffle at cluster scale). */
  def supplierDiversity(lineitem: DataFrame, part: DataFrame,
                        supplier: DataFrame, exclBrand: String,
                        sizes: Seq[Int]): DataFrame = {
    val parts = part
      .where(col("p_brand") =!= exclBrand && col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val atRisk = supplier.where(col("s_acctbal") < 0).select("s_suppkey")
    lineitem.select("l_partkey", "l_suppkey")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(atRisk, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .select("p_brand", "p_type", "p_size", "l_suppkey").distinct()
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
        asc("p_size"))
  }

  /** Dominant-supplier census (q112, TPC-H Q20 shape): suppliers who,
    * for SOME part, shipped more than num/den of that part's total
    * in-window volume — the nested-semi-join-vs-per-group-threshold
    * class (Q20's "excess stock" EXISTS chain). The inner query is one
    * (partkey, suppkey) aggregate over integral quantities; the
    * per-part total arrives by window over partkey (aggregated rows ≪
    * lineitem); the share gate is integer cross-multiplied (den·q >
    * num·total — no float share at the boundary). The qualifying
    * suppkey set distincts small and SEMI-joins into supplier; its
    * cardinality is bounded only by |suppliers|, which grows with SF,
    * so it carries no broadcast hint — AQE broadcasts it when its
    * measured size allows and falls back to a shuffled semi-join when
    * it doesn't, which is how Q20's EXISTS should plan at every
    * scale. Only the 25-row nation dimension is force-broadcast. */
  def dominantSuppliers(lineitem: DataFrame, supplier: DataFrame,
                        nation: DataFrame, from: String, until: String,
                        num: Int, den: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val qualifying = lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
      .withColumn("total", sum(col("q")).over(w))
      .where(col("q") * den > col("total") * num)
      .select("l_suppkey").distinct()
    supplier
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_name")
  }

  /** Bi-nation shipping volume (q113, TPC-H Q7 shape): revenue shipped
    * between two named nations per (supp_nation, cust_nation, year) —
    * the symmetric-disjunctive-join-predicate class (Q7's
    * `(n1=F AND n2=G) OR (n1=G AND n2=F)`). The 2-row filtered nation
    * dim broadcasts into BOTH supplier and customer before the fact
    * joins, so each filtered side shrinks to ~2/25 of its table ahead
    * of the orderkey/suppkey shuffles — a semi-join reduction the
    * disjunction cannot defeat because each half of the OR is an
    * equality on an already-attached 2-value dim column (evaluated
    * post-join on tiny strings, pushed nowhere, costing nothing).
    * Neither filtered fact-side carries a broadcast hint (both grow
    * with SF — the q76/q109 discipline); the date window pushes to the
    * lineitem scan. Revenue in DECIMAL(12,2); year is an integer
    * extraction both engines share. */
  def biNationVolume(lineitem: DataFrame, orders: DataFrame,
                     customer: DataFrame, supplier: DataFrame,
                     nation: DataFrame, nationA: String, nationB: String,
                     from: String, until: String): DataFrame = {
    val pair = nation.where(col("n_name").isin(nationA, nationB))
    val supp = supplier
      .join(broadcast(pair.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val cust = customer
      .join(broadcast(pair.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cn_key"))
      .select("c_custkey", "cust_nation")
    lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .as("disc"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .where((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(col("disc")).as("rev"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        round(col("rev").cast("double"), 6).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Product-line profit attribution (q154, TPC-H Q9 shape): profit
    * per (supplier nation, order year) over a name-matched product
    * family — the deepest join tree in the TPC-H set (Q9's 6-way
    * part ⋈ partsupp ⋈ lineitem ⋈ supplier ⋈ orders ⋈ nation with a
    * non-anchored LIKE on p_name). This corpus has no supply-cost
    * table, so the partsupp leg follows q109's stand-in discipline:
    * per-(part, supplier) cost = MIN observed discounted offer over
    * lineitem history (exact DECIMAL min — no unit division, no float
    * noise), making each line's profit its margin over that pair's
    * best historical offer: disc − min_offer, exact DECIMAL
    * subtraction summed exactly, cast to double once, round 6.
    *
    * Scale shape: the contains-filter prunes part FIRST and
    * semi-reduces lineitem through the partkey join before anything
    * wide happens; the cost leg is one groupBy over (partkey,
    * suppkey) — same key as the join that consumes it, so AQE reuses
    * the exchange rather than re-shuffling; orders attaches only
    * (o_orderkey, year); only the fixed-cardinality 25-row nation dim
    * is hint-broadcast (part and supplier GROW with SF — the
    * q76/q109 rule). One wide shuffle on orderkey, one on
    * (part, supp), one final O(nations × years) aggregate. */
  def q9Profit(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
               supplier: DataFrame, nation: DataFrame,
               nameLike: String): DataFrame = {
    val disc = (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
    val minOffer = lineitem
      .groupBy(col("l_partkey").as("c_part"), col("l_suppkey").as("c_supp"))
      .agg(min(disc).as("min_offer"))
    val redParts = part.where(col("p_name").contains(nameLike))
      .select("p_partkey")
    lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        disc.as("disc"))
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .join(minOffer,
        col("l_partkey") === col("c_part") && col("l_suppkey") === col("c_supp"))
      .join(orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(col("disc") - col("min_offer")).as("p"))
      .select(col("nation"), col("o_year"),
        round(col("p").cast("double"), 6).as("sum_profit"))
      .orderBy(asc("nation"), desc("o_year"))
  }

  /** National market share (q114, TPC-H Q8 shape): one nation's share
    * of a region's market for a product type, per order-year — the
    * conditional-share-aggregation class (Q8's `sum(case when
    * nation then volume else 0) / sum(volume)`). Numerator and
    * denominator come from ONE pass (a when/otherwise pair under two
    * decimal sums — the q110 one-pass discipline applied to money);
    * the share division follows q98's exact recipe: DECIMAL sums are
    * exact, each casts to double once (exact below 2⁵³ scale-units),
    * one shared-IEEE division, round 6. Type filter pushes to the
    * part scan, the window to the orders scan; region prunes customer
    * through broadcast nation/region dims; the supplier side carries
    * its nation name only to feed the conditional. No SF-growing side
    * is hint-broadcast. */
  def marketShare(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, supplier: DataFrame, part: DataFrame,
                  nation: DataFrame, region: DataFrame, pType: String,
                  rName: String, shareNation: String,
                  from: String, until: String): DataFrame = {
    val regionCust = customer
      .join(broadcast(nation.select(col("n_nationkey").as("cn_key"),
        col("n_regionkey"))), col("c_nationkey") === col("cn_key"))
      .join(broadcast(region.where(col("r_name") === rName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val supp = supplier
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val disc = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
      .join(part.where(col("p_type") === pType).select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(orders
        .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(regionCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === shareNation, disc)
          .otherwise(lit(0).cast("decimal(12,2)"))).as("nation_rev"),
        sum(disc).as("total_rev"))
      .select(col("o_year"),
        round(col("nation_rev").cast("double") /
          col("total_rev").cast("double"), 6).as("mkt_share"),
        round(col("nation_rev").cast("double"), 6).as("nation_revenue"),
        round(col("total_rev").cast("double"), 6).as("total_revenue"))
      .orderBy("o_year")
  }

  /** q216: association-rule mining over order baskets (Agrawal &
    * Srikant, VLDB 1994 — the Apriori question asked Spark-first):
    * baskets are an order's DISTINCT part brands; every single-
    * antecedent rule `a → b` is graded by support (orders containing
    * both), confidence (sup_ab / sup_a), and lift
    * (confidence / baseline rate of b). Lift is the column that makes
    * it analysis rather than counting: lift > 1 = genuinely
    * co-purchased, < 1 = substitutes — and q178's cosine pair counts
    * cannot express the DIRECTED conditional (a→b and b→a share
    * support and lift but differ in confidence).
    *
    * Scale shape — why no candidate-generation pass is needed: the
    * pair stream comes from a self-join WITHIN order (per-order
    * distinct items are bounded by lineitems per order, ≤ ~11 here,
    * so fanout per order is ≤ ~55 rows — linear in orders, never
    * |brands|² of the corpus); the rule frame then aggregates to at
    * most |brands|² rows, joined to the |brands|-row support frame by
    * broadcast twice. One basket exchange + one bounded pair
    * aggregation — the SON/Apriori machinery is unnecessary when
    * per-basket size is bounded, and that bound comes from the data
    * model, not a sampled assumption.
    *
    * Determinism: supports are exact integers; confidence/lift are
    * double ratios of exact integers, rounded at 6dp BEFORE ranking
    * (round-before-rank discipline), ties by (antecedent, consequent). */
  def associationRules(lineitem: DataFrame, part: DataFrame,
      minSupPct: Int, topN: Int): DataFrame = {
    // NOT materialized (r19 measured the leanCheckpoint variant 17%
    // SLOWER): the consumers' subtrees are identical up to the
    // distinct's exchange, so runtime exchange reuse already dedups
    // the fact-table scan — an eager checkpoint only adds a job.
    val baskets = lineitem.select(col("l_orderkey").as("o"), col("l_partkey"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("o"), col("p_brand").as("item"))
      .distinct()

    val nOrders = baskets.select(col("o")).distinct()
      .agg(count(lit(1)).as("n_orders"))

    val itemSup = baskets.groupBy("item").agg(count(lit(1)).as("sup"))

    // SF-relative support floor in exact integers: sup/n ≥ pct/100
    // ⟺ 100·sup ≥ pct·n — no double ceil semantics to mirror.
    val pairSup = baskets.as("x").join(baskets.as("y"),
        col("x.o") === col("y.o") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("ia"), col("y.item").as("ib"))
      .agg(count(lit(1)).as("sup_ab"))
      .crossJoin(broadcast(nOrders.select(col("n_orders").as("n_gate"))))
      .where(col("sup_ab") * 100 >= col("n_gate") * minSupPct)
      .select("ia", "ib", "sup_ab")

    // both directions: a→b and b→a
    val rules = pairSup.select(col("ia").as("ant"), col("ib").as("cons"),
        col("sup_ab"))
      .union(pairSup.select(col("ib").as("ant"), col("ia").as("cons"),
        col("sup_ab")))
      .join(broadcast(itemSup.select(col("item").as("ant"),
        col("sup").as("sup_a"))), "ant")
      .join(broadcast(itemSup.select(col("item").as("cons"),
        col("sup").as("sup_c"))), "cons")
      .crossJoin(broadcast(nOrders))

    rules.select(col("ant"), col("cons"), col("sup_ab").as("support"),
        round(col("sup_ab").cast("double") / col("sup_a"), 6)
          .as("confidence"),
        round(col("sup_ab").cast("double") * col("n_orders").cast("double") /
          (col("sup_a").cast("double") * col("sup_c").cast("double")), 6)
          .as("lift"))
      .orderBy(col("lift").desc, col("ant"), col("cons"))
      .limit(topN)
  }

  /** q221: RFM customer segmentation (Hughes' classic direct-marketing
    * frame, the segmentation every CRM/analytics stack ships): per
    * customer, Recency (days since last order, against the corpus's
    * own max day), Frequency (order count), Monetary (exact cents);
    * each scored 1-5 by quintile — 5 best (most recent / most
    * frequent / highest spend) — and the (r, f, m) cells reported as a
    * census with their exact monetary mass. "555" is the champions
    * cell; "1xx" is churned.
    *
    * Scale shape: facts collapse to the CUSTOMER frame first (one hash
    * exchange — the q202 experiment-grain argument); the three ntile
    * windows then sort that frame, not the fact stream — the q97
    * decile precedent, with deterministic (measure, custkey) tie
    * orders mirrored by the oracle (cross-engine standard ntile:
    * equal buckets, remainder to the first). */
  def rfmSegments(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = expr("unix_timestamp(o_orderdate) div 86400")
    val perCust = orders.groupBy(col("o_custkey")).agg(
      max(day).as("last_day"),
      count(lit(1)).as("freq"),
      sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val corpusDay = orders.agg(max(day).as("corpus_day"))
    val scored = perCust.crossJoin(broadcast(corpusDay))
      .withColumn("recency", col("corpus_day") - col("last_day"))
      // worst first in every order, so ntile 5 = best
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("recency").desc, col("o_custkey"))))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("freq").asc, col("o_custkey"))))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("cents").asc, col("o_custkey"))))
    scored.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("total_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Suppliers who held up multi-supplier orders (q227, TPC-H Q21
    * shape re-expressed on this schema — no commit/receipt dates here,
    * so "kept the order waiting" = UNIQUELY last to ship): for every
    * order with ≥2 suppliers, the supplier whose latest line ship date
    * is the strict maximum across the order's suppliers (Q21's
    * "exists another earlier, not exists another as-late" correlation)
    * is charged one wait fault; report the top-N by fault count.
    *
    * Spark shape: lineitem collapses to one (order, supplier,
    * last_ship) row first (one hash exchange), then ONE window
    * exchange on l_orderkey computes supplier count, order max, and
    * at-max count in a single pass — the EXISTS/NOT-EXISTS pair of
    * the classic formulation without two correlated re-scans of the
    * fact table. The supplier join is broadcast (dim-sized); the
    * top-N is a TakeOrdered, never a global sort. */
  def waitBlockers(lineitem: DataFrame, supplier: DataFrame,
                   topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sd = lineitem.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
    val w = Window.partitionBy(col("l_orderkey"))
    val marked = sd
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("dmax", max(col("last_ship")).over(w))
      .withColumn("n_at_max",
        sum(when(col("last_ship") === col("dmax"), 1L).otherwise(0L)).over(w))
    marked
      .where(col("n_supp") >= 2 && col("n_at_max") === 1 &&
        col("last_ship") === col("dmax"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(topN)
  }
}
