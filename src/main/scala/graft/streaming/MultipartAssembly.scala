package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Span

/** Stateful streaming assembly of multi-part documents.
  *
  * The reference's multi-file sources (utils.py:286-312: a links-file row
  * naming several part files, concatenated in order) assume all parts are on
  * disk when the checker runs. In a streaming deployment parts arrive as
  * independent events, possibly in different micro-batches and out of order.
  * This operator re-expresses the concat as CUSTOM STREAMING STATE:
  * `flatMapGroupsWithState` keyed by doc_id buffers parts until the
  * document's full complement is present, then emits one assembled document
  * whose ordered raw spans feed the SAME extraction path as the batch
  * pipeline (equivalence pinned by MultipartStreamingSpec).
  *
  * Semantics:
  *  - parts carry (part_index, n_parts); assembly emits exactly when all
  *    n_parts distinct indices have arrived — arrival order is irrelevant
  *  - duplicate deliveries of the same (doc_id, part_index) are dropped
  *    (first wins), so the operator is idempotent under the at-least-once
  *    redelivery the reference's queue also exhibits (tasks.py:21-27)
  *  - state per in-flight doc is O(its payload); completed docs remove
  *    their state immediately, so steady-state memory is bounded by the
  *    in-flight set, not the corpus — the 10^12-doc configuration relies on
  *    that plus checkpointed state surviving restarts
  *  - an optional processing-time timeout flushes stuck documents as
  *    incomplete rows (complete=false, missing indices listed) instead of
  *    leaking state forever — the error-channel analog of the reference's
  *    "not all files found" IOError (utils.py:301-305)
  *
  * The same code runs on a BATCH Dataset (Spark executes
  * flatMapGroupsWithState per-group in one pass, timeouts never fire) —
  * tests exploit that for oracle-style equivalence with Dispatcher's merge.
  */
object MultipartAssembly {

  /** One part event. `text` is the part's raw payload. */
  final case class PartRow(
      doc_id: String,
      format: String,
      provider: String,
      source_path: String,
      part_index: Int,
      n_parts: Int,
      text: String)

  /** Buffered parts for one in-flight document. */
  final case class PartBuf(
      format: String,
      provider: String,
      source_path: String,
      n_parts: Int,
      got: Map[Int, String])

  /** Assembled output: ordered raw spans, ready for the extract stage. */
  final case class AssembledDoc(
      doc_id: String,
      format: String,
      provider: String,
      source_path: String,
      spans: Seq[Span],
      complete: Boolean,
      missing: Seq[Int])

  /** Pure state transition: fold new parts into the buffer. First delivery
    * of an index wins (idempotent under redelivery).
    */
  def fold(buf: Option[PartBuf], parts: Iterator[PartRow]): Option[PartBuf] =
    parts.foldLeft(buf) { (acc, p) =>
      val b = acc.getOrElse(PartBuf(p.format, p.provider, p.source_path, p.n_parts, Map.empty))
      Some(if (b.got.contains(p.part_index)) b
           else b.copy(got = b.got + (p.part_index -> Option(p.text).getOrElse(""))))
    }

  /** Pure emission decision: Some(assembled) when all parts are present. */
  def tryEmit(docId: String, buf: PartBuf): Option[AssembledDoc] =
    if (buf.got.size >= buf.n_parts) Some(emit(docId, buf, complete = true)) else None

  /** Flush (timeout path): emit whatever arrived, incomplete. */
  def flush(docId: String, buf: PartBuf): AssembledDoc =
    emit(docId, buf, complete = false)

  private def emit(docId: String, buf: PartBuf, complete: Boolean): AssembledDoc = {
    val spans = buf.got.toSeq.sortBy(_._1).zipWithIndex
      .map { case ((_, text), i) => Span("raw", text, null, i) }
    val missing = (0 until buf.n_parts).filterNot(buf.got.contains)
    AssembledDoc(docId, buf.format, buf.provider, buf.source_path, spans, complete, missing)
  }

  /** The streaming operator. `incompleteTimeoutMs = None` keeps waiting
    * across restarts (state is checkpointed); `Some(ms)` flushes stuck docs
    * as incomplete rows after that much processing time with no progress.
    */
  def assemble(parts: Dataset[PartRow],
      incompleteTimeoutMs: Option[Long] = None): Dataset[AssembledDoc] = {
    implicit val bufEnc = Encoders.product[PartBuf]
    implicit val outEnc = Encoders.product[AssembledDoc]
    implicit val strEnc = Encoders.STRING
    val timeoutConf = incompleteTimeoutMs
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    parts.groupByKey(_.doc_id).flatMapGroupsWithState(
        OutputMode.Append(), timeoutConf) {
      (docId: String, it: Iterator[PartRow], state: GroupState[PartBuf]) =>
        if (state.hasTimedOut) {
          val out = state.getOption.map(b => flush(docId, b)).iterator.toSeq
          state.remove()
          out.iterator
        } else {
          fold(state.getOption, it) match {
            case None => Iterator.empty // no state, no parts: nothing to do
            case Some(buf) =>
              tryEmit(docId, buf) match {
                case Some(done) =>
                  state.remove()
                  Iterator.single(done)
                case None =>
                  state.update(buf)
                  incompleteTimeoutMs.foreach(ms => state.setTimeoutDuration(ms))
                  Iterator.empty
              }
          }
        }
    }
  }
}
