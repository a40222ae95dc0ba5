package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** An ordered event within a user's stream (epoch micros or any
  * monotone long). */
final case class FunnelEvent(user: Long, etype: String, ts: Long)

/** Per-user funnel progress: how many stage prefixes are complete and
  * the timestamp of the last completion (the strictly-after anchor). */
final case class FunnelProgress(user: Long, reached: Int, lastT: Long)

/** The stored state — exactly the two scalars the contract promises;
  * the user id lives in the group key, never duplicated here. */
final case class FunnelState(reached: Int, lastT: Long)

/** STREAMING funnel — [[graft.operators.Funnel.funnelCounts]]'s
  * earliest-completion chaining as arbitrary keyed state
  * (SURVEY.md §2 T6, the flatMapGroupsWithState surface, in a second
  * domain beyond the W1 window): each user's (reached, lastT) advances
  * greedily as events arrive, emitting an update whenever progress
  * changes — the live funnel dashboard feed.
  *
  * Ordering contract (the honest one, like the facade's cross-batch
  * ordering note): events are folded in timestamp order WITHIN each
  * micro-batch, so per-micro-batch arrival disorder is absorbed; ACROSS
  * batches a user's events must arrive in timestamp order for streaming
  * progress to equal the batch funnel (an in-order source). A late
  * cross-batch event cannot rewind state — that equivalence is spec'd
  * with ordered batches and the contract documented here.
  *
  * Scale: state per user is two scalars (bounded, no buffer); users
  * hash-partition across executors; no shuffle beyond the groupByKey.
  */
object StreamingFunnel {

  /** The pure per-user transition: fold a batch of (etype, ts) events in
    * ts order into (reached, lastT). At stage k the NEXT qualifying
    * event is the first stages(k) event strictly after lastT — since the
    * fold visits events in ascending ts, that is exactly the batch
    * funnel's tᵢ = min ts > tᵢ₋₁ rule. Extracted for property tests. */
  def step(
      stages: IndexedSeq[String],
      old: Option[(Int, Long)],
      events: Seq[(String, Long)]): (Int, Long) = {
    var reached = old.map(_._1).getOrElse(0)
    var lastT = old.map(_._2).getOrElse(Long.MinValue)
    events.sortBy(_._2).foreach { case (et, ts) =>
      if (reached < stages.size && et == stages(reached) && ts > lastT) {
        reached += 1
        lastT = ts
      }
    }
    (reached, lastT)
  }

  /** Update-mode progress stream: one [[FunnelProgress]] row per user
    * per micro-batch in which that user's `reached` advanced (or the
    * user was first observed).
    *
    * `idleTimeoutMs` is REQUIRED, not defaulted: state per user is tiny
    * but the user population is not, and unbounded cross-batch state is
    * a choice the caller must make explicitly, never a default this
    * helper hides (the `newContentOnly` rule). `Some(ms)` evicts a
    * user's state after that much processing-time idleness — a
    * returning user restarts the funnel from stage 0 (document the
    * dashboard's horizon accordingly); `None` keeps every user forever
    * and is the right call only for bounded key domains. */
  def apply(
      ds: Dataset[FunnelEvent],
      stages: Seq[String],
      idleTimeoutMs: Option[Long])(
      implicit ke: Encoder[Long],
      se: Encoder[FunnelState],
      pe: Encoder[FunnelProgress]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "at least one funnel stage required")
    idleTimeoutMs.foreach(ms => require(ms > 0, s"idleTimeoutMs $ms must be > 0"))
    val idx = stages.toIndexedSeq
    val timeoutConf = if (idleTimeoutMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update, timeoutConf) {
        (user, events, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
            val (reached, lastT) = step(
              idx, prev.map(p => (p.reached, p.lastT)),
              events.map(e => (e.etype, e.ts)).toSeq)
            // vacuously true for a first-seen user (None.forall) — first
            // observation always emits, even at reached = 0
            val progressed = prev.forall(_.reached != reached)
            state.update(FunnelState(reached, lastT))
            idleTimeoutMs.foreach(state.setTimeoutDuration)
            if (progressed) Iterator.single(FunnelProgress(user, reached, lastT))
            else Iterator.empty
          }
      }
  }
}
