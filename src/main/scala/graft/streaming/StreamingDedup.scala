package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class HashedDoc(doc_id: Long, content_hash: String)

/** Streaming exact deduplication with custom state: the first document per
  * content hash passes, every later duplicate (same batch or any later
  * batch) is dropped. State per key is a single boolean via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset stateful-operator
  * surface; at scale state is hash-partitioned across executors and backed
  * by the state store, so the seen-set never lives on one machine.
  */
object StreamingDedup {

  /** (doc_id, text) stream -> first-seen documents as (doc_id, content_hash). */
  def firstSeen(docs: DataFrame): Dataset[HashedDoc] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .as[HashedDoc]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (hash: String, rows: Iterator[HashedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // deterministic pick within the arriving micro-batch
            Iterator.single(rows.minBy(_.doc_id))
          })
  }
}
