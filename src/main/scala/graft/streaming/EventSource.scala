package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed reader for the `events` table — the ONE place that knows how the
  * parquet encodes event time. Every events query consumes this reader, so a
  * testdata regeneration that changes the physical `ts` type (it has: round 6
  * wrote TIMESTAMP(NANOS) read as epoch-nanos LONG under
  * `spark.sql.legacy.parquet.nanosAsLong`; round 7 regenerated to
  * timestamp[us], silently breaking every inline `ts div 1000`) is absorbed
  * here once instead of failing five queries.
  *
  * Canonical schema: `ts` is a micros-precision TIMESTAMP. Consumers that
  * need an epoch-micros LONG take `unix_micros(col("ts"))`. The DuckDB
  * oracles read the same parquet as a naive micros TIMESTAMP, so:
  *   - epoch-nanos LONG input is integer-DIVIDED by 1000 (truncation, the
  *     same rounding DuckDB applies reading TIMESTAMP(NANOS));
  *   - TIMESTAMP_NTZ input (Spark's reading of timestamp[us] with
  *     isAdjustedToUTC=false) is reinterpreted as UTC — which requires the
  *     session timezone to BE UTC, enforced loudly below, because a silent
  *     zone shift would corrupt every event-time comparison;
  *   - TIMESTAMP input is already an instant and passes through.
  * Any other type fails fast with the offending schema in the message.
  */
object EventSource {

  def events(spark: SparkSession, dir: String): DataFrame =
    normalize(graft.Tables.read(spark, dir, "events"))

  /** Normalize a raw events relation to the canonical micros-TIMESTAMP `ts`.
    * Pure column work — map-side, no shuffle, pushdown-transparent. */
  def normalize(raw: DataFrame): DataFrame = {
    val tsCol = raw.schema("ts").dataType match {
      case LongType =>
        // legacy epoch-nanos (TIMESTAMP(NANOS) + nanosAsLong): truncate to
        // micros exactly like the oracle engine's nanos->micros read
        timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType =>
        val tz = raw.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ; reinterpreting it as an instant " +
            s"requires spark.sql.session.timeZone=UTC (got $tz)")
        col("ts").cast(TimestampType)
      case TimestampType => col("ts")
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other (schema: ${raw.schema.simpleString})")
    }
    raw.withColumn("ts", tsCol)
  }
}
