package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain multi-touch attribution (q198) — the data-driven
  * alternative to last-touch: model user journeys as a first-order
  * Markov chain over channels with absorbing CONV/NULL states, and
  * credit each channel by its REMOVAL EFFECT (Anderl, Becker, von
  * Wangenheim & Schumann, IJRM 2016): how much the overall conversion
  * probability drops when every path through the channel is cut. The
  * transition matrix is what q79 ([[Events.transitions]]) reports;
  * this closes the loop from matrix to money.
  *
  * Split of labor (the q198 ≡ q88-family discipline): everything
  * DATA-sized is distributed — ordering each user's journey (one hash
  * exchange to user grain + one window), truncating at the first
  * conversion, counting transitions with map-side partials. Everything
  * MODEL-sized — the (channels+3)² transition matrix and the
  * absorption solve — is a bounded driver step on a collect of at most
  * (channels+3)² rows, like the IVF centroid pull: channels are a
  * vocabulary, not data. The absorption equations are solved by a
  * FIXED 500-round Jacobi fixed-point in a FIXED channel order —
  * deterministic double arithmetic, micro-quantized on output.
  *
  * Scale: adding events grows only the journey scan; the driver solve
  * is O(channels²·rounds) — microseconds forever. */
object Attribution {

  private val Start = "__START__"
  private val Conv = "__CONV__"
  private val Null = "__NULL__"

  /** Distributed transition counts over conversion-truncated journeys.
    * Rows: (src_state, dst_state, n) with START/CONV/NULL sentinels;
    * `convType` events absorb (journey ends at its FIRST conversion),
    * every other event_type is a touchpoint channel. */
  def journeyTransitions(events: DataFrame, convType: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pos = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("pos", row_number().over(byUser))
      .withColumn("conv_pos",
        min(when(col("event_type") === convType, col("pos"))).over(
          Window.partitionBy("user_id")))
    val journey = pos.where(col("conv_pos").isNull || col("pos") <= col("conv_pos"))
    val steps = journey
      .withColumn("next",
        lead("event_type", 1).over(byUser))
      .select(
        col("user_id"),
        when(col("pos") === 1, lit(Start)).otherwise(lit(null)).as("is_first"),
        col("event_type"),
        col("next"))
    // three transition classes in one pass: START→first, step→step,
    // last→NULL (CONV is its own event row, so step→CONV falls out of
    // the lead; a journey ending on a non-conversion gets the NULL edge)
    val firstEdges = steps.where(col("is_first") === Start)
      .select(lit(Start).as("src"),
        when(col("event_type") === convType, lit(Conv))
          .otherwise(col("event_type")).as("dst"))
    val stepEdges = steps.where(col("event_type") =!= convType)
      .select(col("event_type").as("src"),
        when(col("next").isNull, lit(Null))
          .when(col("next") === convType, lit(Conv))
          .otherwise(col("next")).as("dst"))
    firstEdges.unionByName(stepEdges)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
  }

  /** Jacobi fixed-point absorption probability per state, with the
    * channels in `drop` cut (transitions into them routed to NULL). */
  private def absorption(
      states: Seq[String],
      p: Map[(String, String), Double],
      rounds: Int,
      drop: Set[String]): Double = {
    var v = states.map(_ -> 0.0).toMap
    for (_ <- 1 to rounds) {
      v = states.map { s =>
        val direct = p.getOrElse((s, Conv), 0.0)
        val through = states.filterNot(drop).map(t =>
          p.getOrElse((s, t), 0.0) * v(t)).sum
        s -> (direct + through)
      }.toMap
    }
    v.getOrElse(Start, 0.0)
  }

  /** q204: the rule-based attribution model panel — first-touch,
    * last-touch, linear, position-based (the 40/20/40 U-shape), and
    * position-linear time decay, side by side per channel, so the
    * q198 Markov credits can be read against the heuristics they
    * replace (every marketing-analytics stack ships this panel).
    *
    * All credits are exact integer micro-units with floor division
    * (per-journey mass ≤ 10⁶ with bounded floor loss), so the whole
    * panel is hash-comparable cross-engine. Decay is position-LINEAR
    * (weight i+1 for the i-th touch): the popular 2^Δ exponential
    * overflows integer arithmetic on long journeys, and at fixed
    * journey length the two induce the same ranking.
    *
    * Shape: one user-grain window pass (journey truncation + position
    * numbering — the q198 scan) then ONE channel rollup. */
  def modelPanel(events: DataFrame, convType: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pos = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("p", row_number().over(byUser))
      .withColumn("conv_pos",
        min(when(col("event_type") === convType, col("p"))).over(
          Window.partitionBy("user_id")))
    // touches of CONVERTING journeys only — rule models credit nothing
    // on a lost journey
    val touches = pos
      .where(col("conv_pos").isNotNull && col("p") < col("conv_pos"))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
    val first = (col("rn") === 1).cast("long")
    val last = (col("rn") === col("n")).cast("long")
    val position =
      when(col("n") === 1, lit(1000000L))
        .when(col("n") === 2, lit(500000L))
        .otherwise(
          when(first === 1L || last === 1L, lit(400000L))
            .otherwise(expr("200000L div (n - 2)")))
    touches
      .groupBy(col("event_type").as("channel"))
      .agg(
        sum(first).as("first_touch"),
        sum(last).as("last_touch"),
        sum(expr("1000000L div n")).as("linear_micro"),
        sum(position).as("position_micro"),
        sum(expr("(rn * 1000000L) div ((n * (n + 1)) div 2)")).as("decay_micro"))
      .orderBy("channel")
  }

  /** q198: per-channel removal-effect attribution. Output: channel,
    * touches (transitions INTO the channel), removal_effect_micro,
    * share_micro — micro-quantized, deterministic. */
  def removalEffects(events: DataFrame, convType: String,
      rounds: Int = 500): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // Bounded collect: (channels+3)² rows — the model, not the data.
    val counts = journeyTransitions(events, convType).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val outTotals = counts.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val p = counts.map { case ((s, t), n) => (s, t) -> n.toDouble / outTotals(s) }
    val channels = counts.keysIterator
      .flatMap { case (s, t) => Seq(s, t) }
      .filterNot(Set(Start, Conv, Null))
      .toSeq.distinct.sorted
    val states = Start +: channels
    val base = absorption(states, p, rounds, Set.empty)
    val removals = channels.map { c =>
      val without = absorption(states, p, rounds, Set(c))
      val eff = if (base == 0.0) 0.0 else 1.0 - without / base
      c -> math.max(0.0, eff)
    }
    val totalEff = removals.map(_._2).sum
    val touches = channels.map(c =>
      c -> counts.collect { case ((_, t), n) if t == c => n }.sum).toMap
    removals.map { case (c, eff) =>
      val share = if (totalEff == 0.0) 0.0 else eff / totalEff
      (c, touches(c),
        math.floor(eff * 1e6 + 0.5).toLong,
        math.floor(share * 1e6 + 0.5).toLong)
    }.toDF("channel", "touches", "removal_effect_micro", "share_micro")
      .orderBy("channel")
  }
}
