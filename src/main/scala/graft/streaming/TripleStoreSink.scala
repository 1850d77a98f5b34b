package graft.streaming

import graft.kg.TripleStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming KG ingestion: a Structured Streaming (s,p,o) frame lands in a
  * [[TripleStore]] one snapshot per micro-batch, exactly-once.
  *
  * Idempotency contract: `TripleStore.appendBatch` tags each snapshot with
  * its batch id and skips ids already committed, so the batch that
  * foreachBatch re-delivers after a crash/restart does not duplicate rows;
  * the store's snapshot-log append is the commit point, and data files of
  * a crashed (unlogged) write are cleaned before retry. At 100 TB this is
  * the continuous-construction path: extraction emits triples into the
  * predicate-partitioned store while periodic full SHACL validation and
  * compaction run against committed snapshots.
  */
object TripleStoreSink {

  /** Start appending the stream into the store (AvailableNow by default:
    * drains what exists, then stops — pass a different trigger for a
    * long-running ingest). `checkpointDir` carries Spark's own source
    * offsets; the store's batch-id tags make redelivery harmless. */
  def append(store: TripleStore, stream: DataFrame, checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        store.appendBatch(df, batchId)
        ()
      }
      .start()
}
