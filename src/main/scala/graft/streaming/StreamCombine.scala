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

  /** Handle over a [[zip]]'s two delivery queries plus its pairing state. */
  final class ZipHandle[A, B] private[streaming] (
      val primaryQuery: StreamingQuery,
      val secondaryQuery: StreamingQuery,
      bufA: scala.collection.mutable.Queue[A],
      bufB: scala.collection.mutable.Queue[B],
      lock: AnyRef) {

    /** Unpaired overhang currently buffered on each side. */
    def buffered: (Int, Int) = lock.synchronized((bufA.size, bufB.size))

    def processAllAvailable(): Unit = {
      primaryQuery.processAllAvailable()
      secondaryQuery.processAllAvailable()
    }

    def stop(): Unit = {
      primaryQuery.stop()
      secondaryQuery.stop()
    }
  }

  /** ReactiveX `zip`: pair the i-th element of `primary` with the i-th
    * element of `secondary` — lockstep, order-paired combination.
    *
    * Spark-first mapping: a distributed engine has no global arrival
    * order, so zip's index is DEFINED, not observed — each stream's
    * order is micro-batch order × within-batch row order (deterministic
    * for replayable sources: MemoryStream addData order, file sources
    * under AvailableNow). Pairing then happens at the delivery edge, the
    * same driver-held-state pattern as [[withLatestFrom]]: each side's
    * foreachBatch appends to a queue; whenever both queues are
    * non-empty, matched prefixes emit to `sink` in index order. This is
    * the reference's in-process delivery scale (the WindowStream
    * contract), NOT a cluster operator — for cluster-scale positional
    * pairing of two large datasets use [[graft.operators.Zip.zipByOrder]],
    * where the index is derived from an explicit sort order.
    *
    * Lockstep backpressure, fail-fast form: rate-mismatched streams grow
    * the faster side's buffer without bound in ReactiveX too (zip's
    * documented hazard) — rather than silently eat the driver heap, the
    * buffer is capped at `maxBuffer` and overflow throws inside the
    * offending side's query (visible via its StreamingQuery exception,
    * never a silent drop). */
  def zip[A, B, C](
      primary: Dataset[A],
      secondary: Dataset[B],
      combine: (A, B) => C,
      sink: Seq[C] => Unit,
      trigger: FiniteDuration = 100.millis,
      maxBuffer: Int = 1 << 16): ZipHandle[A, B] = {
    require(maxBuffer >= 1, s"maxBuffer $maxBuffer must be >= 1")
    val bufA = scala.collection.mutable.Queue.empty[A]
    val bufB = scala.collection.mutable.Queue.empty[B]
    val lock = new AnyRef
    val id = nameSeq.incrementAndGet()

    def drainLocked(): Unit = {
      if (bufA.nonEmpty && bufB.nonEmpty) {
        val n = math.min(bufA.size, bufB.size)
        val out = Seq.newBuilder[C]
        var i = 0
        while (i < n) { out += combine(bufA.dequeue(), bufB.dequeue()); i += 1 }
        sink(out.result())
      }
      val over = math.max(bufA.size, bufB.size)
      if (over > maxBuffer) throw new IllegalStateException(
        s"zip buffer overflow: $over unpaired elements (cap $maxBuffer) — " +
          "streams are rate-mismatched; raise maxBuffer or repair the rates")
    }

    val primaryQuery = primary.writeStream
      .queryName(s"zip-primary-$id")
      .trigger(Trigger.ProcessingTime(trigger.toMillis))
      .outputMode("append")
      .foreachBatch { (ds: Dataset[A], _: Long) =>
        val rows = ds.collect()
        if (rows.nonEmpty) lock.synchronized { bufA ++= rows; drainLocked() }
        ()
      }
      .start()

    val secondaryQuery = secondary.writeStream
      .queryName(s"zip-secondary-$id")
      .trigger(Trigger.ProcessingTime(trigger.toMillis))
      .outputMode("append")
      .foreachBatch { (ds: Dataset[B], _: Long) =>
        val rows = ds.collect()
        if (rows.nonEmpty) lock.synchronized { bufB ++= rows; drainLocked() }
        ()
      }
      .start()

    new ZipHandle[A, B](primaryQuery, secondaryQuery, bufA, bufB, lock)
  }
}
