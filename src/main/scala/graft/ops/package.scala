package graft

import org.apache.spark.sql.DataFrame

/** Shared helpers for the ops tier. */
package object ops {

  /** Pre-shuffle parallelism guard: a single-row-group parquet file scans
    * as ONE partition, which serializes every per-document projection that
    * runs before the first shuffle (shingling, md5 signatures, token
    * explodes) onto one core — measured 6-8 s of the ngram join's wall
    * time at sf0.1. When the input has fewer partitions than the cluster
    * has slots, pay one cheap shuffle of the raw rows to unlock the cores;
    * at real scale inputs arrive in thousands of splits and this is a
    * no-op.
    *
    * Cost note: reading the partition count via `df.rdd` forces physical
    * planning of the upstream plan once per call — cheap for the scan-level
    * frames this guards (the plan is a parquet scan), but do not call it on
    * deep mid-pipeline plans.
    */
  private[graft] def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
