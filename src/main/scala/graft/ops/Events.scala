package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the activity log that accompanies a corpus
  * (ingest/extraction audit events, user interactions). Beyond the
  * reference's scope, but the per-entity sessionization below is the
  * standard first aggregation over any event table at scale.
  */
object Events {

  /** Gap-based sessionization per entity: consecutive events within `gap`
    * of each other belong to one session; an event STRICTLY beyond the
    * previous event + gap starts a new one (an event landing exactly on
    * the boundary merges — pinned by test). Uses Spark's NATIVE `session_window`
    * aggregation — a single groupBy whose partial aggregation merges
    * session ranges map-side (and which runs unchanged on a stream with a
    * watermark), rather than a lag()/running-sum window pair that would
    * buffer each entity's whole history in one window partition. Output:
    * one row per (entity, session) with start epoch, event count, and
    * duration in whole seconds — all integers, so a cross-engine oracle
    * hash-compares exactly.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    // parquet event logs are commonly TIMESTAMP_NTZ; with the session in
    // UTC the cast is a pure reinterpretation (no wall-clock shift). An
    // already-TIMESTAMP column is used AS-IS: a cast would produce a new
    // attribute and sever the watermark tag, breaking the streaming form.
    // case-INSENSITIVE lookup (mirroring the analyzer's default resolver —
    // a schema(tsCol) apply would throw on a case variant the analyzer
    // accepts); an unknown column falls to the cast path and fails in
    // analysis with the standard unresolved-column error
    val isTimestamp = events.schema
      .find(f => f.name.equalsIgnoreCase(tsCol))
      .exists(_.dataType == org.apache.spark.sql.types.TimestampType)
    val ts = if (isTimestamp) col(tsCol) else col(tsCol).cast("timestamp")
    events
      .groupBy(col(userCol), session_window(ts, gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(ts)).as("_min_us"),
        max(unix_micros(ts)).as("_max_us"))
      .select(
        col(userCol),
        (col("_min_us") / lit(1000000L)).cast("long").as("session_start_epoch"),
        col("n_events"),
        ((col("_max_us") - col("_min_us")) / lit(1000000L)).cast("long").as("duration_sec"))
  }

  /** As-of join: attach to each left event the MOST RECENT right event of
    * the same key with `right.ts <= left.ts` (inclusive boundary; among
    * right events sharing that timestamp the highest id wins — both rules
    * deterministic and mirrored in the oracle). The classic use is
    * attribution: each `click` to the latest prior `view`.
    *
    * Spark has no ASOF join operator; an inequality join would be a
    * cartesian-per-key. Instead both sides are UNIONED and a running
    * `last(right_id, ignoreNulls)` window — partitioned by key, ordered by
    * (ts, side, right-id) with right rows sorting before left rows at
    * equal ts — carries the latest right row forward onto each left row.
    * One shuffle on the key; the UnboundedPreceding..CurrentRow frame
    * aggregates incrementally (no O(history) frame buffer; the per-key
    * row buffer is spillable).
    *
    * Output: left id, key, matched right id (null when no prior right
    * event exists), and the gap in whole seconds — all integers.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val l = left.select(col(keyCol), us.as("_us"), lit(1).as("_side"),
      col(idCol).as("_lid"), lit(null).cast("long").as("_rid"))
    val r = right.select(col(keyCol), us.as("_us"), lit(0).as("_side"),
      lit(null).cast("long").as("_lid"), col(idCol).as("_rid"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_us"), col("_side"), col("_rid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // both running aggregates in one select -> ONE Window node over one
    // sorted stream (separate withColumn calls leave two Window operators)
    l.unionAll(r)
      .select(col(keyCol), col("_us"), col("_side"), col("_lid"),
        last(col("_rid"), ignoreNulls = true).over(w).as("_m_rid"),
        last(when(col("_rid").isNotNull, col("_us")), ignoreNulls = true)
          .over(w).as("_m_us"))
      .filter(col("_side") === 1)
      .select(col("_lid").as(idCol), col(keyCol),
        col("_m_rid").as("matched_event_id"),
        ((col("_us") - col("_m_us")) / lit(1000000L)).cast("long").as("gap_sec"))
  }

  /** Semi-structured payload extraction — event logs carry a free-form
    * JSON `props` column, and every downstream aggregation starts by
    * pulling typed fields out of it. This extracts one integer field with
    * an explicit MALFORMED side-channel (corrupt JSON or a missing/
    * non-integer field yields a null value and `props_ok = false` — never
    * a task failure, mirroring the pipeline's errors-as-rows rule).
    *
    * `get_json_object` is a codegen'd Catalyst expression evaluating a
    * JsonPath directly over the string — no schema inference pass, no UDF,
    * null (not an exception) on malformed input. Adding columns instead of
    * exploding keeps this a map-only projection: zero shuffle, fully
    * inside WholeStageCodegen, pushdown-transparent for the columns it
    * does not touch.
    */
  def parseProps(events: DataFrame, field: String = "k",
      propsCol: String = "props"): DataFrame = {
    val raw = get_json_object(col(propsCol), s"$$.$field")
    // try_cast, not cast: under ANSI mode a non-numeric field value must
    // degrade to the malformed channel, not kill the job
    val v = raw.try_cast("long")
    events
      .withColumn(field, v)
      .withColumn("props_ok", v.isNotNull)
  }
}
