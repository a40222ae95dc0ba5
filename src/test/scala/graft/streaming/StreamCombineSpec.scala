package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.jdk.CollectionConverters._

class StreamCombineSpec extends SparkSpecBase {

  test("withLatestFrom: pairs with the latest secondary value; early primaries drop loudly") {
    val s = spark
    import s.implicits._
    val prim = MemoryStream[Int](s)
    val sec = MemoryStream[String](s)
    val out = new ConcurrentLinkedQueue[String]()
    val h = StreamCombine.withLatestFrom[Int, String, String](
      prim.toDS(), sec.toDS(), (a, b) => s"$a-$b", batch => batch.foreach(out.add))
    try {
      // ReactiveX contract: primary before the secondary's first emission
      // pairs with nothing — dropped, but counted, never silent
      prim.addData(0)
      h.processAllAvailable()
      assert(out.isEmpty)
      assert(h.droppedBeforeFirst === 1L)

      sec.addData("v1")
      h.processAllAvailable()
      prim.addData(1, 2)
      h.processAllAvailable()
      assert(out.asScala.toSet === Set("1-v1", "2-v1"))

      // a newer secondary value re-points subsequent batches only
      sec.addData("v2")
      h.processAllAvailable()
      prim.addData(3)
      h.processAllAvailable()
      assert(out.asScala.toSet === Set("1-v1", "2-v1", "3-v2"))
      assert(h.latest === Some("v2"))
      assert(h.droppedBeforeFirst === 1L)
    } finally h.stop()
  }

  test("withLatestFrom: batch-order pick takes the LAST secondary row of a batch") {
    val s = spark
    import s.implicits._
    val prim = MemoryStream[Int](s)
    val sec = MemoryStream[String](s)
    val out = new ConcurrentLinkedQueue[String]()
    val h = StreamCombine.withLatestFrom[Int, String, String](
      prim.toDS(), sec.toDS(), (a, b) => s"$a-$b", batch => batch.foreach(out.add))
    try {
      sec.addData("a", "b", "c") // one micro-batch; latest = last in order
      h.processAllAvailable()
      prim.addData(7)
      h.processAllAvailable()
      assert(out.asScala.toSet === Set("7-c"))
    } finally h.stop()
  }

  test("zip: index-paired lockstep combination; overhang buffers, never drops") {
    val s = spark
    import s.implicits._
    val a = MemoryStream[Int](s)
    val b = MemoryStream[String](s)
    val out = new ConcurrentLinkedQueue[String]()
    val h = StreamCombine.zip[Int, String, String](
      a.toDS(), b.toDS(), (x, y) => s"$x-$y", batch => batch.foreach(out.add))
    try {
      // primary runs ahead: nothing emits, overhang is buffered and visible
      a.addData(1, 2, 3)
      h.processAllAvailable()
      assert(out.isEmpty && h.buffered === ((3, 0)))

      // secondary catches up partially: pairs emit in index order
      b.addData("x", "y")
      h.processAllAvailable()
      assert(out.asScala.toSeq === Seq("1-x", "2-y"))
      assert(h.buffered === ((1, 0)))

      // now the secondary runs ahead; the old overhang pairs first
      b.addData("z", "w")
      h.processAllAvailable()
      assert(out.asScala.toSeq === Seq("1-x", "2-y", "3-z"))
      assert(h.buffered === ((0, 1)))

      a.addData(4)
      h.processAllAvailable()
      assert(out.asScala.toSeq === Seq("1-x", "2-y", "3-z", "4-w"))
      assert(h.buffered === ((0, 0)))
    } finally h.stop()
  }

  test("zip: rate-mismatch beyond maxBuffer fails the offending query, not silently") {
    val s = spark
    import s.implicits._
    val a = MemoryStream[Int](s)
    val b = MemoryStream[String](s)
    val h = StreamCombine.zip[Int, String, String](
      a.toDS(), b.toDS(), (x, y) => s"$x-$y", _ => (), maxBuffer = 2)
    try {
      a.addData(1, 2, 3, 4, 5)
      intercept[Exception] { h.processAllAvailable() }
      assert(h.primaryQuery.exception.isDefined,
        "overflow must surface as the query's failure")
      assert(h.primaryQuery.exception.get.toString.contains("zip buffer overflow"))
    } finally h.stop()
  }
}
