package graft.streaming

import graft.SparkSpecBase
import graft.operators.Quality
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingMixDrift]] — THE contract is batch equivalence: each
  * drained window's chi2/z/drifted/jsd/js_dist equal
  * [[Quality.chiSquaredDrift]] / [[Quality.jensenShannonDrift]] run
  * over the window-vs-reference rows, field-for-field; plus the window
  * discipline and the category-bound fail-loud. */
class StreamingMixDriftSpec extends SparkSpecBase {

  private val Bucket = 1000000L

  private def batchPair(win: Map[String, Long], ref: Map[String, Long]) = {
    val sp = spark; import sp.implicits._
    val rows =
      win.toSeq.flatMap { case (c, k) => Seq.fill(k.toInt)((c, true)) } ++
      ref.toSeq.flatMap { case (c, k) => Seq.fill(k.toInt)((c, false)) }
    val df = rows.toDF("cat", "side")
    val c = Quality.chiSquaredDrift(df, "cat", "side").collect().head
    val j = Quality.jensenShannonDrift(df, "cat", "side").collect().head
    (c, j)
  }

  test("scoreOf equals the batch chi-squared and JSD operators field-for-field") {
    val ref = Map("en" -> 60L, "de" -> 25L, "zh" -> 15L)
    val cases = Seq(
      Map("en" -> 55L, "de" -> 30L, "zh" -> 15L),          // mild
      Map("en" -> 10L, "de" -> 10L, "zh" -> 80L),          // hard drift
      Map("en" -> 60L, "de" -> 25L, "zh" -> 15L),          // identical
      Map("en" -> 40L, "fr" -> 60L))                       // novel + missing cats
    cases.foreach { win =>
      val (n1, k, chi2, z, dr, jsd, dist) = StreamingMixDrift.scoreOf(win, ref)
      val (bc, bj) = batchPair(win, ref)
      assert(n1 === win.values.sum && k === bc.getAs[Long]("categories"))
      assert(chi2 === Some(bc.getAs[Double]("chi2")), s"chi2 for $win")
      assert(z === Some(bc.getAs[Double]("z_wh")), s"z for $win")
      assert(dr === Some(bc.getAs[Boolean]("drifted")), s"drifted for $win")
      assert(jsd === Some(bj.getAs[Double]("jsd")), s"jsd for $win")
      assert(dist === Some(bj.getAs[Double]("js_dist")), s"dist for $win")
    }
    // empty window / single shared category: all test fields None
    assert(StreamingMixDrift.scoreOf(Map.empty, ref)._3.isEmpty)
    assert(StreamingMixDrift.scoreOf(Map("en" -> 5L), Map("en" -> 9L))
      ._3.isEmpty)
  }

  test("step: in-order finalization, late drop, category cap fails loud") {
    val ref = Map("a" -> 10L, "b" -> 10L)
    val t = (slot: Long, c: String) => MixTick("k", slot * Bucket + 3L, c)
    val s0 = MixState(None, Map.empty)
    val ticks = Seq.fill(8)(t(0, "a")) ++ Seq.fill(2)(t(0, "b")) ++
      Seq.fill(5)(t(1, "b"))
    val (r1, s1) = StreamingMixDrift.step(s0, ticks, ref, 16, Bucket, 0L)
    assert(r1.isEmpty)
    val (r2, s2) = StreamingMixDrift.step(s1, Seq.empty, ref, 16, Bucket,
      2 * Bucket)
    assert(r2.map(_.slot) === Seq(0L, 1L))
    assert(r2.head.n === 10L)
    val (bc, _) = batchPair(Map("a" -> 8L, "b" -> 2L), ref)
    assert(r2.head.chi2 === Some(bc.getAs[Double]("chi2")))
    val (r3, _) = StreamingMixDrift.step(s2, Seq(t(0, "a")), ref, 16,
      Bucket, 2 * Bucket)
    assert(r3.isEmpty, "late tick for a finalized slot drops")
    intercept[IllegalArgumentException] {
      StreamingMixDrift.step(s0,
        (1 to 5).map(i => t(3, s"c$i")), ref, maxCategories = 4,
        Bucket, 0L)
    }
  }

  test("end-to-end: drained windows equal the batch operators per (key, slot) slice") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(61)
    val ref = Map("en" -> 50L, "de" -> 30L, "zh" -> 20L)
    val langs = Seq("en", "de", "zh")
    val ticks = (1 to 500).map { _ =>
      val key = if (rnd.nextBoolean()) "a" else "b"
      val slot = rnd.nextInt(3).toLong
      // key b drifts hard in slot 2: all zh
      val cat = if (key == "b" && slot == 2) "zh"
        else langs(rnd.nextInt(3))
      MixTick(key, slot * Bucket + rnd.nextInt(1000000).toLong, cat)
    }
    val ms = MemoryStream[MixTick](sp)
    val q = StreamingMixDrift(ms.toDS(), ref, Bucket,
        watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("mix_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(MixTick("zz", 100 * Bucket, "en")); q.processAllAvailable()
      val got = sp.table("mix_e2e").where(col("key") =!= "zz")
        .as[MixWindowRow].collect().toSeq
      assert(got.map(_.key).toSet === Set("a", "b"))
      got.foreach { r =>
        val win = ticks.filter(t => t.key == r.key &&
            Math.floorDiv(t.tsUs, Bucket) == r.slot)
          .groupBy(_.cat).view.mapValues(_.size.toLong).toMap
        val (bc, bj) = batchPair(win, ref)
        assert(r.chi2 === Some(bc.getAs[Double]("chi2")),
          s"(${r.key}, ${r.slot}) chi2")
        assert(r.drifted === Some(bc.getAs[Boolean]("drifted")))
        assert(r.js_dist === Some(bj.getAs[Double]("js_dist")))
      }
      // the planted all-zh window must alarm
      assert(got.find(r => r.key == "b" && r.slot == 2L)
        .exists(_.drifted === Some(true)))
    } finally q.stop()
  }
}
