package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling for training-data pipelines: every row
  * keeps or drops by a PURE HASH of its id — no RNG state, no seed
  * plumbing, no `rand()`. That purity is what matters at 100 TB: decisions
  * are identical under any partitioning, any retry, any resume (a re-run
  * task re-derives exactly the rows it produced before, so the sample
  * composes with checkpoint/restart), and auditable after the fact (given
  * an id, anyone — in any engine — can recompute why it was kept).
  * Per-stratum rates are the standard "data mixing" knob when composing a
  * pretraining corpus from sources of uneven quality.
  */
object Sampling {

  /** Uniform bucket on [0, 10^6): first 60 bits of md5(id) mod 10^6 —
    * portable (`('0x'||substr(md5(CAST(id AS VARCHAR)),1,15))::BIGINT %
    * 1000000` recomputes it bit-identically in DuckDB). */
  def hashBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(1000000L))

  /** Keep a row iff hashBucket(id) < rate(stratum) · 10^6.
    *
    * `rates` maps stratum values (of `strataCol`) to keep rates in [0, 1];
    * strata absent from the map fall back to `defaultRate`. The rate
    * lookup compiles to a literal CASE chain (rates are a handful of
    * mixture weights, not data), so the whole operator is one codegen'd
    * filter — zero shuffles, zero joins, full pushdown-friendliness.
    *
    * Returns the kept rows plus (bucket, rate_ppm) for auditability.
    * Expected kept fraction per stratum is rate ± O(1/√n) — exact, not
    * probabilistic, for any FIXED id set (the bucket set is a fixed
    * function of the ids). */
  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "keep rates must be in [0, 1]")
    val ratePpm = rates.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultRate * 1e6))) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(math.round(v * 1e6))).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(idCol)))
      .withColumn("rate_ppm", ratePpm)
      .filter(col("bucket") < col("rate_ppm"))
  }
}
