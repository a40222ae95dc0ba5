package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingHeavyHitters]] — the Misra–Gries invariants asserted
  * against exact batch counts on every drained window: (1) any item
  * with true count > n/(capacity+1) is present, (2) est ≤ true ≤
  * est + err_bound, (3) zero-decrement windows are EXACTLY the batch
  * groupBy counts; plus the window discipline. */
class StreamingHeavyHittersSpec extends SparkSpecBase {

  private val Bucket = 1000000L
  private def t(slot: Long, item: String, off: Long = 0L) =
    HhTick("k", slot * Bucket + off, item)
  private val s0 = HhState(None, Map.empty)

  private def invariants(
      rows: Seq[HhWindowRow], ticks: Seq[HhTick], cap: Int): Unit = {
    val bySlot = ticks.groupBy(x => Math.floorDiv(x.tsUs, Bucket))
    rows.groupBy(_.slot).foreach { case (slot, emitted) =>
      val truth = bySlot(slot).groupBy(_.item).view.mapValues(_.size.toLong)
      val n = bySlot(slot).size.toLong
      assert(emitted.head.n_window === n)
      emitted.foreach { r =>
        val tr = truth.getOrElse(r.item, 0L)
        assert(r.est <= tr && tr <= r.est + r.err_bound,
          s"slot $slot item ${r.item}: est ${r.est} truth $tr err ${r.err_bound}")
      }
      val present = emitted.map(_.item).toSet
      truth.foreach { case (item, tr) =>
        if (tr > n / (cap + 1))
          assert(present.contains(item),
            s"guaranteed heavy hitter $item (count $tr of $n) missing")
      }
      if (emitted.head.err_bound == 0L) {
        assert(emitted.map(r => r.item -> r.est).toMap === truth.toMap,
          s"slot $slot: zero decrements must equal exact counts")
      }
    }
  }

  test("step: exact when distinct fits capacity; MG bounds under eviction; late drop") {
    // slot 0: 3 distinct items, cap 4 -> exact
    val fits = Seq.fill(7)(t(0, "a")) ++ Seq.fill(4)(t(0, "b")) ++
      Seq.fill(2)(t(0, "c"))
    // slot 1: heavy skew over 12 distinct, cap 4 -> lossy but bounded
    val rnd = new scala.util.Random(13)
    val skew = (1 to 300).map { i =>
      val item = if (rnd.nextInt(100) < 55) "HOT"
        else s"cold${rnd.nextInt(11)}"
      t(1, item, i.toLong)
    }
    val (r1, s1) = StreamingHeavyHitters.step(s0, fits ++ skew, 4, Bucket, 0L)
    assert(r1.isEmpty)
    val (r2, s2) = StreamingHeavyHitters.step(s1, Seq.empty, 4, Bucket,
      2 * Bucket)
    invariants(r2, fits ++ skew, 4)
    val slot0 = r2.filter(_.slot == 0L)
    assert(slot0.forall(_.exact) && slot0.map(_.item) === Seq("a", "b", "c"),
      "rank order (est desc, item)")
    assert(slot0.map(_.est) === Seq(7L, 4L, 2L))
    val slot1 = r2.filter(_.slot == 1L)
    assert(slot1.head.item === "HOT", "the majority item must lead")
    assert(!slot1.head.exact && slot1.head.err_bound > 0L)
    // late tick for finalized slot drops
    val (r3, _) = StreamingHeavyHitters.step(s2, Seq(t(0, "zz")), 4, Bucket,
      2 * Bucket)
    assert(r3.isEmpty)
  }

  test("step: transition is a pure function of the batch multiset (canonical sort)") {
    val rnd = new scala.util.Random(37)
    val ticks = (1 to 200).map(i =>
      t(0, s"i${rnd.nextInt(9)}", rnd.nextInt(1000).toLong))
    val (a, _) = StreamingHeavyHitters.step(s0, ticks, 3, Bucket, Bucket)
    val (b, _) = StreamingHeavyHitters.step(s0, rnd.shuffle(ticks), 3,
      Bucket, Bucket)
    assert(a === b, "shuffled multiset must produce the identical summary")
  }

  test("end-to-end: invariants hold on every drained MemoryStream window") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(97)
    val ticks = (1 to 600).map { i =>
      val key = if (rnd.nextBoolean()) "a" else "b"
      val slot = rnd.nextInt(3).toLong
      val item = if (rnd.nextInt(100) < 40) s"hh$key"
        else s"tail${rnd.nextInt(25)}"
      HhTick(key, slot * Bucket + rnd.nextInt(1000000).toLong, item)
    }
    val ms = MemoryStream[HhTick](sp)
    val q = StreamingHeavyHitters(ms.toDS(), capacity = 6, Bucket,
        watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("hh_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(HhTick("zz", 100 * Bucket, "x")); q.processAllAvailable()
      val got = sp.table("hh_e2e").where(col("key") =!= "zz")
        .as[HhWindowRow].collect().toSeq
      assert(got.nonEmpty && got.map(_.key).toSet === Set("a", "b"))
      Seq("a", "b").foreach { k =>
        invariants(got.filter(_.key == k), ticks.filter(_.key == k),
          cap = 6)
        // the planted 40% item must be every window's rank 1
        got.filter(r => r.key == k && r.rank == 1L)
          .foreach(r => assert(r.item === s"hh$k"))
      }
    } finally q.stop()
  }
}
