package graft.streaming

import java.util.concurrent.{Executors, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer
import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's pub/sub facade (SURVEY.md §2.1 S1–S7), re-expressed on
  * Structured Streaming. API contract mirrors WindowPublisher:
  *
  *  - `publish` blocks when the bounded ingest buffer is full — lossless,
  *    backpressured ingest (the reference spins on emitNext failure,
  *    WindowPublisher.java:31,80-82; we block on a bounded queue — same
  *    guarantee, no busy-wait).
  *  - `asyncPublish` try-offers and reports success per item
  *    (WindowPublisher.java:100-111; returns Seq of pairs, not the
  *    reference's Map, which threw on duplicate elements — SURVEY §2.1 S4).
  *  - `subscribe(consumer[, errorConsumer])` — at most one subscriber
  *    (unicast contract, WindowPublisher.java:68), batches delivered on a
  *    consumer pool of `consumerParallelism` threads, per-batch errors
  *    routed to `errorConsumer` (WindowPublisher.java:142-150).
  *  - queue introspection (WindowPublisher.java:116-125).
  *
  * Mechanism is redesigned per SURVEY.md §7.4: a pump thread drains the
  * bounded queue into a MemoryStream in admission-capped slices (the
  * maxOffsetsPerTrigger analogue), a ProcessingTime trigger provides the
  * time axis, and chunking to `windowMaxBatchSize` provides the count
  * axis, so every delivered batch has size ∈ [1, windowMaxBatchSize] —
  * the reference's count-or-time window contract (bufferTimeout,
  * WindowPublisher.java:70-72) with empty windows suppressed. Batches for
  * the exact per-key count-or-time semantics go through
  * [[CountOrTimeWindow]] instead.
  */
class WindowStream[T: Encoder](
    spark: SparkSession,
    queueCapacity: Int = WindowStream.DefaultQueueSize,
    windowMaxBatchSize: Int = 15,
    windowDuration: FiniteDuration = 100.millis,
    consumerParallelism: Int = Runtime.getRuntime.availableProcessors()) {

  require(queueCapacity > 0 && windowMaxBatchSize > 0 && consumerParallelism > 0)

  /** Capacity normalized up to the next power of two, like the reference's
    * Queues.ceilingNextPowerOfTwo (WindowPublisher.java:66). */
  private val capacity: Int =
    if (Integer.bitCount(queueCapacity) == 1) queueCapacity
    else Integer.highestOneBit(queueCapacity) * 2

  private val queue = new LinkedBlockingQueue[T](capacity)
  private val source = MemoryStream[T](spark)
  private val subscribed = new AtomicBoolean(false)
  private val running = new AtomicBoolean(true)
  @volatile private var query: StreamingQuery = _
  @volatile private var pumpThread: Thread = _
  @volatile private var pool: java.util.concurrent.ExecutorService = _
  private val delivered = new java.util.concurrent.atomic.AtomicLong(0L)
  // items the pump has moved into the MemoryStream (field, not pump-local:
  // the timeout watchdog needs pending = pumped + queued − delivered)
  private val pumpedN = new java.util.concurrent.atomic.AtomicLong(0L)

  // ---- ingest (S1–S4) ----
  //
  // All ingest is gated on `running`: once stop() flips it, publish throws
  // and asyncPublish reports false, so the lossless contract has a sharp
  // boundary — every item ACCEPTED (gate passed) before stop() is
  // delivered ONCE A SUBSCRIBER EXISTS (see stop() for the unsubscribed
  // teardown contract); items offered after are rejected loudly, never
  // dropped silently. The gate is NOT a bare check-then-act: each ingest holds the
  // read side of `gate` across check+insert, and stop() acquires the write
  // side after flipping `running` — a barrier guaranteeing no gate-passing
  // publisher is still mid-insert when the final drain runs.

  private val gate = new java.util.concurrent.locks.ReentrantReadWriteLock()

  private def ensureOpen(): Unit =
    if (!running.get()) throw new IllegalStateException(
      "WindowStream is stopped: publish after stop() would be silently dropped")

  /** Blocking, lossless single-item ingest; throws once stopped. */
  def publish(item: T): Unit = {
    val rl = gate.readLock()
    rl.lock()
    try { ensureOpen(); queue.put(item) } finally rl.unlock()
  }

  /** Blocking batch ingest, iteration order preserved; throws once stopped. */
  def publish(items: Iterable[T]): Unit = items.foreach(publish(_))

  /** Non-blocking ingest: false when the buffer is full or the stream is
    * stopped (caller retries / gives up). */
  def asyncPublish(item: T): Boolean = {
    val rl = gate.readLock()
    rl.lock()
    try running.get() && queue.offer(item) finally rl.unlock()
  }

  /** Per-item non-blocking ingest results, in order (duplicate-safe). */
  def asyncPublish(items: Iterable[T]): Seq[(T, Boolean)] =
    items.map(i => i -> asyncPublish(i)).toSeq

  // ---- introspection (S7) ----

  def getQueueSize: Int = queue.size()
  def getQueueCapacity: Int = capacity

  /** Items handed to the consumer (or error consumer) so far — the
    * delivery-side counter pairing the ingest-side queue gauges. */
  def getDeliveredCount: Long = delivered.get()

  /** Latest micro-batch progress of the delivery query (SURVEY.md §2.1
    * S7 depth: rows/batch and engine timings surfaced through the facade,
    * not just queue gauges). None before the first trigger. */
  def lastProgress: Option[WindowStream.Progress] =
    Option(query).flatMap(q => Option(q.lastProgress)).map(WindowStream.progressOf)

  /** Ring buffer of recent micro-batch progress samples, oldest first. */
  def recentProgress: Seq[WindowStream.Progress] =
    Option(query).map(_.recentProgress.toSeq.map(WindowStream.progressOf))
      .getOrElse(Seq.empty)

  // ---- consumption (S5–S6) ----

  /** Subscribe with errors escalated to stderr (the no-error-consumer
    * overload; unlike the reference, failures are at least visible). */
  def subscribe(consumer: Seq[T] => Unit): StreamingQuery =
    subscribe(consumer, (batch, e) =>
      System.err.println(s"[WindowStream] batch of ${batch.size} failed: $e"))

  /** Subscribe with an error channel; at most one subscriber per stream.
    *
    * The whole setup (running check → unicast CAS → pool + query + pump
    * start) holds the read side of `gate`, the lock stop() write-acquires
    * after flipping `running` — so subscribe-vs-stop is atomic: either
    * this call completes first and stop() sees the live query and drains
    * it, or stop() wins and the running check here throws. Without the
    * gate, a subscribe() racing stop() could pass the check, then start a
    * delivery query (and consumer pool) AFTER stop() observed `query ==
    * null` and returned — a live query on a stopped stream. */
  def subscribe(consumer: Seq[T] => Unit, errorConsumer: (Seq[T], Throwable) => Unit): StreamingQuery =
    subscribe(consumer, errorConsumer, maxRetries = 0)

  /** Subscribe with a retry budget — the facade's `Flux.retry(n)`
    * analogue (reference README.md:107 claimed vocabulary), scoped to
    * the failing BATCH rather than the whole subscription: a consumer
    * throw re-runs that batch up to `maxRetries` more times (transient
    * sink hiccups — a flapping connection, a 429 — recover in place)
    * before the batch routes to `errorConsumer` exactly once. Batches
    * that never throw are delivered exactly once regardless. */
  def subscribe(
      consumer: Seq[T] => Unit,
      errorConsumer: (Seq[T], Throwable) => Unit,
      maxRetries: Int): StreamingQuery = {
    require(maxRetries >= 0, s"maxRetries $maxRetries must be >= 0")
    val rl = gate.readLock()
    rl.lock()
    try subscribeLocked(consumer, errorConsumer, maxRetries) finally rl.unlock()
  }

  private def subscribeLocked(
      consumer: Seq[T] => Unit,
      errorConsumer: (Seq[T], Throwable) => Unit,
      maxRetries: Int): StreamingQuery = {
    if (!running.get())
      throw new IllegalStateException(
        "WindowStream is stopped: subscribe() after stop() would start a " +
          "delivery query no publisher can ever feed")
    if (!subscribed.compareAndSet(false, true))
      throw new IllegalStateException(
        "WindowStream is unicast: already subscribed (WindowPublisher.java:68 contract)")

    pool = Executors.newFixedThreadPool(consumerParallelism, new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      override def newThread(r: Runnable): Thread =
        new Thread(r, s"graft-ws-consumer-${source.id}-${n.incrementAndGet()}")
    })

    query = source.toDS().writeStream
      .queryName(s"window-stream-${source.id}")
      .trigger(Trigger.ProcessingTime(windowDuration.toMillis))
      .outputMode("append")
      .foreachBatch { (ds: Dataset[T], _: Long) =>
        val items = ds.collect().toSeq
        if (items.nonEmpty) {
          // count axis + empty-window suppression; parallel delivery on the
          // consumer pool, awaited so trigger cadence backpressures the pump
          val tasks = items.grouped(windowMaxBatchSize).map { chunk =>
            new java.util.concurrent.Callable[Unit] {
              override def call(): Unit = {
                var attempt = 0
                var done = false
                while (!done) {
                  try { consumer(chunk); done = true }
                  catch {
                    case e: Exception if attempt < maxRetries => attempt += 1
                    case e: Exception => errorConsumer(chunk, e); done = true
                  }
                }
              }
            }
          }.toSeq
          pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
          delivered.addAndGet(items.size.toLong)
          ()
        }
      }
      .start()

    pumpThread = new Thread(() => {
      // admission control, two bounds: (1) at most `capacity` items move
      // per pump cycle — the maxOffsetsPerTrigger analogue; (2) at most
      // `maxInFlight` items may sit in the MemoryStream undelivered —
      // foreachBatch collects each micro-batch to the driver (the
      // reference contract hands List<T> to an in-process lambda), and
      // without this high-water mark a stalled trigger would let the pump
      // accumulate an unbounded micro-batch. Publishers block on the
      // bounded queue meanwhile, so the guard is backpressure, not loss.
      val maxInFlight = capacity.toLong * 4
      while (running.get()) {
        if (pumpedN.get() - delivered.get() >= maxInFlight) {
          Thread.sleep(windowDuration.toMillis / 2 + 1)
        } else {
          val drained = new java.util.ArrayList[T](capacity)
          val first = queue.poll(windowDuration.toMillis / 2 + 1, TimeUnit.MILLISECONDS)
          if (first != null) {
            drained.add(first)
            queue.drainTo(drained, capacity - 1)
            val buf = new ArrayBuffer[T](drained.size)
            drained.forEach(e => buf += e)
            source.addData(buf.toSeq)
            pumpedN.addAndGet(drained.size.toLong)
          }
        }
      }
    }, s"window-stream-pump-${source.id}")
    pumpThread.setDaemon(true)
    pumpThread.start()
    query
  }

  // ---- rate-controlled ingest (the reference's claimed Flux vocabulary:
  // sample / throttleLatest, README.md:45,107) ----

  /** Reactor `Flux.sample(period)` admission: a trailing-edge conflating
    * gate in front of the lossless facade — only the LATEST item offered
    * during each period survives to `publish`; overwritten items are
    * counted, never silently lost. This is the one backpressure mode the
    * blocking facade deliberately lacks: `publish` trades latency for
    * losslessness, a sampler trades completeness for a bounded rate
    * (gauge streams, progress tickers — any source where only the
    * freshest value matters). */
  def sample(period: FiniteDuration): WindowStream.ThrottleGate[T] =
    new WindowStream.ThrottleGate[T](this, period, leading = false)

  /** RxJava-style `throttleLatest(period)`: like [[sample]] but
    * leading-edge — the first item of an idle stream publishes
    * immediately, subsequent offers conflate to the latest and flush at
    * the period boundary. Same loss-accounting contract. */
  def throttleLatest(period: FiniteDuration): WindowStream.ThrottleGate[T] =
    new WindowStream.ThrottleGate[T](this, period, leading = true)

  /** `Flux.timeout(d)` analogue, surfaced as a WATCHDOG rather than a
    * stream error: fires `onStall(d)` whenever items are pending (queued
    * or pumped but undelivered) and delivery has made no progress for
    * `d` — a stuck consumer, a wedged trigger. Re-arms after each fire,
    * so a persistent stall reports once per period, and stays silent on
    * a merely idle stream (no pending items = nothing is late). The
    * returned daemon thread exits with [[stop]]. Reactor errors the
    * subscription on timeout; here delivery is lossless-by-contract, so
    * the facade alerts instead of dropping the pipeline — callers who
    * want Reactor's semantics call [[stop]] from the callback. */
  def deliveryTimeout(d: FiniteDuration)(onStall: FiniteDuration => Unit): Thread = {
    require(d.toMillis >= 1, s"timeout $d must be >= 1ms")
    val t = new Thread(() => {
      var lastCount = delivered.get()
      var lastChangeNs = System.nanoTime()
      try {
        while (running.get()) {
          Thread.sleep(math.max(d.toMillis / 4, 1L))
          val c = delivered.get()
          val pending = pumpedN.get() + queue.size() > c
          val now = System.nanoTime()
          if (c != lastCount || !pending) { lastCount = c; lastChangeNs = now }
          else if (now - lastChangeNs >= d.toNanos) {
            onStall(d)
            lastChangeNs = now // re-arm: one report per stalled period
          }
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-ws-timeout-${source.id}")
    t.setDaemon(true)
    t.start()
    t
  }

  /** Register a JVM shutdown hook that runs [[stop]]'s full lossless
    * drain on normal JVM termination. The reference lists exactly this as
    * its own open gap and remediation ("no savepoint; a crash loses the
    * buffer queue and consumer-pool data; remediation: add a Java Hook" —
    * README.md:100): here the hook rides the drain contract, so every
    * item accepted before shutdown is delivered before the JVM exits.
    * Returns the hook thread so callers can deregister
    * (`Runtime.getRuntime.removeShutdownHook`) when they stop the stream
    * themselves first. Kill -9 / power loss is still lossy — that is
    * inherent to an in-memory ingest buffer; durable ingest belongs to a
    * replayable source in front of the stream, not this facade. */
  def stopOnJvmShutdown(): Thread = {
    val hook = new Thread(
      () => try stop() catch { case _: InterruptedException => () },
      s"window-stream-shutdown-${source.id}")
    Runtime.getRuntime.addShutdownHook(hook)
    hook
  }

  /** Drain what's already queued, then stop the query. Ordering carries
    * the lossless contract: the pump thread may hold drained items
    * between `queue.drainTo` and `source.addData`, so a queue-empty wait
    * alone can declare victory while up to `capacity` items are in the
    * pump's hands. Halt and JOIN the pump first — after the join, every
    * item is either in the queue or already in the MemoryStream — then
    * move the queue remainder on the caller thread, and only then run the
    * final batches and stop.
    *
    * UNSUBSCRIBED stop(): the lossless delivery contract is conditional
    * on a subscriber existing — the stream is unicast
    * (WindowPublisher.java:68) and there is nobody to hand batches to.
    * stop() on a never-subscribed stream DISCARDS any accepted items and
    * says so on stderr with the count (never silently): publishers that
    * outlive their consumer's existence are a caller bug, and blocking
    * stop() forever waiting for a subscriber that will never come would
    * turn teardown into a hang. */
  def stop(): Unit = {
    running.set(false) // new publishers now throw / get false
    // Items drained during the barrier are BUFFERED, not routed: the
    // barrier loop can run while a subscribe() still holds the read lock
    // with `query` not yet assigned (query.start() takes far longer than
    // one tryLock window), and deciding orphaned-vs-deliverable at drain
    // time would silently discard items whose subscriber is mid-attach.
    // Routing happens once, after the barrier + pump join, against the
    // FINAL query state.
    val pending = new ArrayBuffer[T]()
    def drainRemainder(): Unit = {
      val rest = new java.util.ArrayList[T]()
      while (!queue.isEmpty) queue.drainTo(rest)
      rest.forEach(e => pending += e)
    }
    // Barrier: wait until every publisher that passed the running gate has
    // finished its insert, so the final drain cannot race a mid-flight
    // put(). A parked put (full queue) holds the read lock, so a plain
    // write-lock wait could deadlock — drain between tryLock attempts to
    // free capacity and let those publishers complete.
    val wl = gate.writeLock()
    while (!wl.tryLock(10, TimeUnit.MILLISECONDS)) drainRemainder()
    wl.unlock() // gate closed + no in-flight inserts; new calls fail on `running`
    // join the pump only AFTER the barrier: subscribe() starts the pump
    // under the read lock, so a concurrent subscribe could set pumpThread
    // after an earlier join-first check saw null — past the barrier the
    // reference is final, and the joined pump has flushed its in-hand
    // items to the MemoryStream (they'd otherwise dodge drainRemainder)
    if (pumpThread != null) pumpThread.join()
    // the query may already be terminated with an error (e.g. a failing
    // errorConsumer) — processAllAvailable() then rethrows; cleanup must
    // still run or every failed stream leaks consumerParallelism
    // non-daemon threads for the JVM's lifetime
    try {
      drainRemainder() // pump joined: whatever remains is queue-resident
      if (query != null) {
        if (pending.nonEmpty) source.addData(pending.toSeq)
        query.processAllAvailable()
        query.stop()
      } else if (pending.nonEmpty) {
        System.err.println(
          s"[WindowStream] stop() before subscribe(): discarding ${pending.size} " +
            "accepted item(s) — the unicast stream has no consumer to deliver to")
      }
    } finally {
      if (pool != null) pool.shutdown()
    }
  }
}

object WindowStream {
  /** The reference's DEFAULT_QUEUE_SIZE = 1 << 4 (WindowPublisher.java:22). */
  val DefaultQueueSize: Int = 16

  /** One micro-batch progress sample of the delivery query — the facade's
    * stable projection of `StreamingQueryProgress` (rows per batch, batch
    * timing, total stateful-operator rows; 0 for this stateless sink). */
  case class Progress(
      batchId: Long,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      batchDurationMs: Long,
      stateRowsTotal: Long)

  private[streaming] def progressOf(
      p: org.apache.spark.sql.streaming.StreamingQueryProgress): Progress =
    Progress(
      batchId = p.batchId,
      numInputRows = p.numInputRows,
      inputRowsPerSecond = p.inputRowsPerSecond,
      processedRowsPerSecond = p.processedRowsPerSecond,
      batchDurationMs = p.batchDuration,
      stateRowsTotal = p.stateOperators.map(_.numRowsTotal).sum)

  /** Drop-eligible admission gate in front of a [[WindowStream]] —
    * `Flux.sample` (trailing) / `throttleLatest` (leading) semantics with
    * EXPLICIT loss accounting: every offered item is either published to
    * the stream or counted in [[droppedCount]], so
    * `publishedCount + droppedCount == offers` always holds (the
    * invariant the soak spec pins; the lossless facade's contract is the
    * same identity with zero drops).
    *
    * One daemon flusher thread per gate; the cell is a single reference,
    * so a gate adds O(1) state regardless of offer rate. [[close]]
    * flushes the pending item (the latest value is never lost, only
    * intermediate ones) and stops the flusher. */
  final class ThrottleGate[T] private[WindowStream] (
      stream: WindowStream[T],
      period: FiniteDuration,
      leading: Boolean) {
    require(period.toMillis >= 1, s"period $period must be >= 1ms")
    private val cell = new java.util.concurrent.atomic.AtomicReference[AnyRef](null)
    private val droppedN = new java.util.concurrent.atomic.AtomicLong(0L)
    private val publishedN = new java.util.concurrent.atomic.AtomicLong(0L)
    // seeded one period in the past so a leading-edge gate's FIRST offer
    // emits immediately (Long.MinValue would overflow the elapsed check)
    private val lastEmitNs = new java.util.concurrent.atomic.AtomicLong(
      System.nanoTime() - period.toNanos)
    private val open = new AtomicBoolean(true)

    private def emit(item: T): Unit = {
      stream.publish(item)
      publishedN.incrementAndGet()
      lastEmitNs.set(System.nanoTime())
    }

    // The flusher sleeps in short slices rather than whole periods so
    // close() can join it promptly WITHOUT interrupting: an interrupt
    // landing inside emit()'s blocking publish would lose the in-flight
    // item with neither counter incremented — breaking the accounting
    // identity the gate exists to keep.
    private val flusher = new Thread(() => {
      val slice = math.min(period.toMillis, 50L)
      var elapsed = 0L
      while (open.get()) {
        Thread.sleep(slice)
        elapsed += slice
        if (elapsed >= period.toMillis) {
          elapsed = 0L
          flushPending()
        }
      }
    }, s"graft-ws-throttle-${System.identityHashCode(this)}")
    flusher.setDaemon(true)
    flusher.start()

    private def flushPending(): Unit = this.synchronized {
      val v = cell.getAndSet(null)
      if (v != null) {
        // a stream stopped before the gate closed can no longer accept
        // the pending item: count it dropped so the accounting identity
        // (published + dropped == offers) survives out-of-order teardown
        try emit(v.asInstanceOf[T])
        catch { case _: IllegalStateException => droppedN.incrementAndGet(); () }
      }
    }

    /** Offer an item through the gate. Returns true when it was published
      * immediately (leading edge), false when it was conflated into the
      * cell — where it either flushes at the period boundary or is
      * dropped (and counted) by a newer offer. */
    def offer(item: T): Boolean = this.synchronized {
      if (!open.get()) throw new IllegalStateException(
        "ThrottleGate is closed: offer() would be silently dropped")
      if (leading && cell.get() == null &&
          System.nanoTime() - lastEmitNs.get() >= period.toNanos) {
        emit(item); true
      } else {
        val prev = cell.getAndSet(item.asInstanceOf[AnyRef])
        if (prev != null) droppedN.incrementAndGet()
        false
      }
    }

    /** Items conflated away (never published). */
    def droppedCount: Long = droppedN.get()

    /** Items this gate handed to the stream's lossless `publish`. */
    def publishedCount: Long = publishedN.get()

    /** Flush the pending item (if any) and stop the flusher. Idempotent.
      * Joins without interrupting (see the flusher comment) — worst-case
      * wait is one sleep slice plus an in-flight emit. */
    def close(): Unit = {
      if (open.compareAndSet(true, false)) {
        flusher.join()
        flushPending()
      }
    }
  }
}
