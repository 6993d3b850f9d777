package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fellegi-Sunter probabilistic record linkage (JASA 1969) — the
  * WEIGHTED-EVIDENCE face of entity resolution, beside the engine's
  * distance rungs (q96 edit distance, q210 trigram similarity): instead
  * of one string metric, each compared FIELD contributes evidence
  * scaled by how surprising agreement on it actually is. Agreement on
  * a field two random records rarely share (the second word) is strong
  * evidence; agreement on one they often share (a 3-value language
  * column) is weak. The match score is the log-likelihood ratio
  *
  *   score = Σ_f  ln(m_f/u_f)         if the pair agrees on f
  *           Σ_f  ln((1−m_f)/(1−u_f)) if it disagrees
  *
  * with `m_f` = P(agree | same entity) — clerical priors, the
  * EM-estimated refinement being the classical follow-up — and `u_f` =
  * P(agree | different entities) ESTIMATED FROM THE CORPUS as the
  * collision probability of the field's own value distribution:
  * u_f = (Σ_v c_v(c_v−1) + 1) / (N(N−1) + 2), add-one smoothed so a
  * unique-valued or constant field cannot produce ±∞ weights. This is
  * the frequency-based u of the public record-linkage literature (and
  * of tools like Splink): no labels needed, the data prices its own
  * evidence.
  *
  * Scale shape: u estimation is one tiny agg per field (value-grain
  * group-by, then a 1-row moment) broadcast into the pair stream; the
  * candidate stream reuses the q96 capped blocking (first word, with
  * hash-sub-blocking above `maxBlock`), so per-block pair work stays
  * ~cnt·maxBlock — the FS scoring rides the SAME bounded candidate
  * generation that already holds the engine's 10×-data bar, adding
  * only codegen'd per-pair arithmetic. Moments are exact integers
  * (DECIMAL(38) products, the q202 convention); the weights are then
  * one deterministic double expression over them, mirrored verbatim in
  * the DuckDB oracle.
  */
object Linkage {

  private case class Field(name: String, m: Double)

  /** q215: top-`topN` in-block pairs by Fellegi-Sunter score over
    * (lang, source, length-band, second-word) with per-field agreement
    * flags. Ranking is by the 6dp-rounded score (round-before-rank
    * discipline), ties by (a, b). */
  def linkageScores(docs: DataFrame, maxBlock: Int, topN: Int,
      mLang: Double, mSource: Double, mLen: Double, mW2: Double): DataFrame = {
    require(maxBlock > 0, "maxBlock must be positive")
    val fields = Seq(Field("lang", mLang), Field("source", mSource),
      Field("lb", mLen), Field("w2", mW2))

    val base = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars div 100").as("lb"),
        element_at(split(col("text"), " "), 1).as("w1"),
        coalesce(element_at(split(col("text"), " "), 2), lit("")).as("w2"))

    // Per-field collision moment Σ c(c−1) (exact, DECIMAL(38)) and the
    // corpus size, folded into ONE broadcast 1-row frame of u values.
    val nFrame = base.agg(count(lit(1)).as("n"))
    val uFrame = fields.map { f =>
      base.groupBy(col(f.name)).agg(count(lit(1)).as("c"))
        .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1)"))
          .as(s"s_${f.name}"))
    }.reduce(_.crossJoin(_)).crossJoin(nFrame)

    val w = Window.partitionBy("w1")
    val blocked = base
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sub", when(col("cnt") <= maxBlock, lit(0L)).otherwise(
        pmod(Dedup.hash60(col("w2")),
          floor((col("cnt") + lit(maxBlock.toLong - 1)) / lit(maxBlock.toLong))
            .cast("long"))))

    val aSide = blocked.select(Seq(col("w1"), col("sub"),
      col("doc_id").as("a")) ++
      fields.map(f => col(f.name).as(s"${f.name}_a")): _*)
    val bSide = blocked.select(Seq(col("w1"), col("sub"),
      col("doc_id").as("b")) ++
      fields.map(f => col(f.name).as(s"${f.name}_b")): _*)

    def uOf(f: Field): Column =
      (col(s"s_${f.name}").cast("double") + lit(1.0)) /
        (expr("CAST(n AS DECIMAL(38,0)) * (n - 1)").cast("double") + lit(2.0))
    def weight(f: Field): Column = {
      val u = uOf(f)
      when(col(s"agree_${f.name}") === 1,
        log(lit(f.m) / u)).otherwise(log(lit(1.0 - f.m) / (lit(1.0) - u)))
    }

    val pairs = aSide.join(bSide, Seq("w1", "sub")).where(col("a") < col("b"))
      .select(Seq(col("a"), col("b")) ++ fields.map(f =>
        // when/otherwise, not a bare boolean cast: a NULL field on
        // either side must read DISAGREE (0), matching the oracle's
        // CASE WHEN ... THEN 1 ELSE 0 — (a === b).cast("int") would
        // propagate NULL and diverge on any corpus with NULL fields
        when(col(s"${f.name}_a") === col(s"${f.name}_b"), lit(1))
          .otherwise(lit(0)).as(s"agree_${f.name}")): _*)
      .crossJoin(broadcast(uFrame))

    val scored = pairs.select(
      Seq(col("a"), col("b")) ++
        fields.map(f => col(s"agree_${f.name}")) :+
        round(fields.map(weight).reduce(_ + _), 6).as("score"): _*)
    scored.orderBy(col("score").desc, col("a"), col("b")).limit(topN)
  }
}
