package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import scala.concurrent.duration.FiniteDuration
import scala.concurrent.duration._

/** Stream-combination facades at the edge of the claimed Flux vocabulary
  * (the reference links the ReactiveX operator index, README.md:107):
  * `withLatestFrom` — pair each element of a primary stream with the most
  * recent value of a secondary stream.
  *
  * Spark-first mapping: Structured Streaming has no "latest value of the
  * other stream" join (stream-stream joins are windowed equi-joins over
  * watermarked state, not sampling). The idiomatic re-expression is the
  * STREAM-STATIC JOIN pattern — the static side is re-resolved every
  * micro-batch, so a dimension that is updated in place (an overwritten
  * table/path) enriches each batch with its latest state. This facade
  * packages the same semantics for the reference's in-process scale: the
  * secondary's foreachBatch maintains a driver-held latest-value
  * register; the primary's foreachBatch snapshots the register once per
  * batch, so every delivered batch is enriched consistently (one
  * snapshot per batch, matching the per-batch static-side resolution of
  * the table-backed pattern).
  *
  * Scale contract (100 TB): the register holds ONE value — a
  * broadcast-scale control/config/watermark datum, exactly ReactiveX's
  * `withLatestFrom` shape. For a table-sized dimension, do not funnel it
  * through a single value: use the stream-static join against an
  * updatable table directly (`stream.join(spark.read.load(dimPath), ...)`
  * re-reads per batch).
  *
  * ReactiveX drop semantics: primary elements that arrive BEFORE the
  * secondary's first emission pair with nothing and are dropped (counted
  * in [[WithLatestFromHandle.droppedBeforeFirst]], never silent).
  */
object StreamCombine {

  /** Active query names must be unique per session; identity hashes can
    * collide after GC address reuse — a counter cannot. */
  private val nameSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Handle over the two delivery queries plus the combination state. */
  final class WithLatestFromHandle[B] private[streaming] (
      val primaryQuery: StreamingQuery,
      val secondaryQuery: StreamingQuery,
      register: AtomicReference[Option[B]],
      dropped: java.util.concurrent.atomic.AtomicLong) {

    /** Latest secondary value the next primary batch would pair with. */
    def latest: Option[B] = register.get()

    /** Primary elements dropped because the secondary had not emitted yet
      * (the ReactiveX contract drops them; this makes the count visible). */
    def droppedBeforeFirst: Long = dropped.get()

    def processAllAvailable(): Unit = {
      secondaryQuery.processAllAvailable()
      primaryQuery.processAllAvailable()
    }

    def stop(): Unit = {
      primaryQuery.stop()
      secondaryQuery.stop()
    }
  }

  /** Pair each primary element with the latest secondary value and hand
    * `combine`d batches to `sink`. The secondary's per-batch "latest" is
    * its LAST row in batch order — for an ordered pick, pre-sort the
    * secondary's micro-batches upstream (e.g. orderBy event time under
    * an AvailableNow trigger) or make `pick` explicit.
    *
    * @param pick reduces a non-empty secondary micro-batch to its latest
    *             value (default: last row in batch order)
    */
  def withLatestFrom[A, B, C](
      primary: Dataset[A],
      secondary: Dataset[B],
      combine: (A, B) => C,
      sink: Seq[C] => Unit,
      trigger: FiniteDuration = 100.millis,
      pick: Seq[B] => B = (b: Seq[B]) => b.last): WithLatestFromHandle[B] = {
    val register = new AtomicReference[Option[B]](None)
    val dropped = new java.util.concurrent.atomic.AtomicLong(0L)
    val id = nameSeq.incrementAndGet()

    val secondaryQuery = secondary.writeStream
      .queryName(s"with-latest-from-secondary-$id")
      .trigger(Trigger.ProcessingTime(trigger.toMillis))
      .outputMode("append")
      .foreachBatch { (ds: Dataset[B], _: Long) =>
        val rows = ds.collect().toSeq
        if (rows.nonEmpty) register.set(Some(pick(rows)))
        ()
      }
      .start()

    val primaryQuery = primary.writeStream
      .queryName(s"with-latest-from-primary-$id")
      .trigger(Trigger.ProcessingTime(trigger.toMillis))
      .outputMode("append")
      .foreachBatch { (ds: Dataset[A], _: Long) =>
        val rows = ds.collect().toSeq
        if (rows.nonEmpty) {
          // ONE register snapshot per micro-batch: every element of the
          // batch pairs with the same secondary value, mirroring the
          // per-batch static-side resolution of a stream-static join
          register.get() match {
            case Some(b) => sink(rows.map(a => combine(a, b)))
            case None => dropped.addAndGet(rows.size.toLong); ()
          }
        }
        ()
      }
      .start()

    new WithLatestFromHandle[B](primaryQuery, secondaryQuery, register, dropped)
  }
}
