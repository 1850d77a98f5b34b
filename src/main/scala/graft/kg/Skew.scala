package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit skew handling for joins on Zipf-headed keys (high-degree
  * entities), complementing AQE's runtime skew-join splitting — AQE can't
  * see skew inside a driver-orchestrated fixpoint iteration until the
  * stage runs, and its splitting only helps sort-merge joins; salting
  * spreads hot keys BEFORE the shuffle.
  *
  * saltedJoin(big, small, key, R): hot keys (detected by a cheap
  * approximate key histogram) get a salt in [0,R) on the big side and R
  * replicas on the small side; cold keys join unsalted. One extra column,
  * no semantic change for equi-joins where `small` is unique per key.
  */
object Skew {

  /** Top keys by frequency in `df.key` above `threshold` occurrences. */
  def hotKeys(df: DataFrame, key: String, threshold: Long, maxKeys: Int = 1000): Seq[Long] =
    df.groupBy(col(key)).agg(count(lit(1)).as("_c")).filter(col("_c") >= threshold)
      .orderBy(col("_c").desc).limit(maxKeys)
      .select(col(key).cast("long")).collect().map(_.getLong(0)).toSeq

  /** Equi-join `big ⋈ small` on `key` (small must be unique per key),
    * salting the listed hot keys across `r` buckets. */
  def saltedJoin(spark: SparkSession, big: DataFrame, small: DataFrame, key: String,
                 hot: Seq[Long], r: Int = 16): DataFrame = {
    if (hot.isEmpty) return big.join(small, key)
    val hotCol = col(key).isin(hot: _*)
    val bigS = big.withColumn("_salt",
      when(hotCol, pmod(xxhash64(monotonically_increasing_id()), lit(r)).cast("int"))
        .otherwise(lit(0)))
    import spark.implicits._
    val salts = spark.range(0, r).select($"id".cast("int").as("_salt"))
    val smallS = small.withColumn("_hot", hotCol)
      .crossJoin(broadcast(salts))
      .filter($"_hot" || $"_salt" === 0)
      .drop("_hot")
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
