package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the KG-construction + SHACL relational core in one plan —
    * 2-hop path join, exact aggregation, anti-join gate. Driver
    * smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qPathSeqAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator kernel (SURVEY.md §2 + the
    * training-data ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB-equivalent SQL for EVERY registry query (47/47): the hash
    * kernels ride md5-derived portable twins whose signatures, candidate
    * sets and ranks recompute bit-identically in DuckDB. */
  def oracleSql: Map[String, String] = Queries.oracle
}
