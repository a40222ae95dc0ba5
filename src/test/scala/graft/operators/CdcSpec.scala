package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Cdc]] — content-defined chunking against an independent sequential
  * reference, plus the property the operator exists for: boundaries
  * re-anchor after an edit, so tail chunks survive a prefix insertion
  * that destroys every fixed-width chunk. */
class CdcSpec extends SparkSpecBase {

  /** Driver-side reference chunker — same published algorithm, written
    * independently (explicit rolling positions, no HOFs). */
  private def refChunks(text: String, divisor: Long): Seq[(Long, Long, Long, Long)] = {
    val codes = text.map(_.toInt.toLong)
    val n = codes.length
    if (n == 0) return Nil
    def poly(lo: Int, hi: Int): Long = {
      var a = 0L
      var j = lo
      while (j <= hi) { a = Math.floorMod(a * Cdc.Base + codes(j), Cdc.P); j += 1 }
      a
    }
    val cuts = (Cdc.Window to n - 1).filter(i => poly(i - Cdc.Window, i - 1) % divisor == 0)
    val bounds = 0L +: cuts.map(_.toLong) :+ n.toLong
    bounds.sliding(2).zipWithIndex.map { case (Seq(s, e), idx) =>
      (idx + 1L, s + 1, e - s, poly(s.toInt, e.toInt - 1))
    }.toSeq
  }

  private def sparkChunks(texts: Seq[(Long, String)], divisor: Long) = {
    val s = spark
    import s.implicits._
    Cdc.chunks(texts.toDF("doc_id", "text"), divisor = divisor)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
  }

  test("chunks equals the sequential reference on randomized texts (several divisors)") {
    val rnd = new scala.util.Random(0xcdc)
    val texts = (0L until 40L).map { i =>
      val len = rnd.nextInt(300)
      (i, Seq.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString)
    }.filter(_._2.nonEmpty)
    for (divisor <- Seq(8L, 64L)) {
      val got = sparkChunks(texts, divisor)
      texts.foreach { case (id, t) =>
        assert(got.getOrElse(id, Nil) === refChunks(t, divisor), s"doc $id divisor $divisor")
      }
    }
  }

  test("the rolling kernel is bit-equal to the declarative HOF twin") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xfa57)
    val texts = (0L until 30L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(250))(('a' + rnd.nextInt(6)).toChar).mkString)
    }
    val df = texts.toDF("doc_id", "text")
    for (divisor <- Seq(8L, 32L)) {
      val kern = Cdc.chunks(df, divisor = divisor)
        .orderBy("doc_id", "chunk_idx").collect().map(_.toSeq).toSeq
      val hof = Cdc.chunksDeclarative(df, divisor = divisor)
        .orderBy("doc_id", "chunk_idx").collect().map(_.toSeq).toSeq
      assert(kern === hof, s"kernel and HOF diverge at divisor $divisor")
    }
  }

  test("chunk invariants: contiguous cover, 1-based starts, short texts are one chunk") {
    val got = sparkChunks(Seq((1L, "ab"), (2L, "x" * 200)), divisor = 8L)
    assert(got(1L) === Seq((1L, 1L, 2L, refChunks("ab", 8L).head._4)),
      "sub-window text is a single chunk")
    val two = got(2L)
    assert(two.map(_._3).sum === 200L, "chunks cover the text exactly")
    assert(two.head._2 === 1L)
    two.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 === a._2 + a._3, "chunks are contiguous")
      case _ => ()
    }
  }

  test("shift resistance: a prefix edit preserves most CDC chunks, zero fixed-width chunks") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(600)(('a' + rnd.nextInt(5)).toChar).mkString
    val edited = "Z" + base // one-character insertion at the front
    val divisor = 32L
    val a = refChunks(base, divisor).map(_._4)
    val b = refChunks(edited, divisor).map(_._4)
    val shared = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.size
    assert(shared > 0.7, s"CDC should preserve most chunks under a prefix edit; got $shared")
    // the fixed-width strawman: every 32-char slice shifts by one
    val fwA = base.grouped(32).toSeq
    val fwB = edited.grouped(32).toSeq
    val fwShared = fwA.toSet.intersect(fwB.toSet).size
    assert(fwShared <= 1, "fixed-width chunking loses (almost) everything under the same edit")
  }

  test("duplicateChunks: the shared tail surfaces once per corpus share threshold") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val tail = Seq.fill(150)(('a' + rnd.nextInt(5)).toChar).mkString
    val docs = (0L until 20L).map { i =>
      val own = Seq.fill(100 + rnd.nextInt(100))(('f' + rnd.nextInt(5)).toChar).mkString
      (i, if (i % 2 == 0) own + tail else own)
    }.toDF("doc_id", "text")
    val ct = Cdc.chunks(docs, divisor = 16L)
    val total = docs.agg(count(lit(1)).as("__n_docs_total"))
    val dup = Cdc.duplicateChunks(ct, total, minDocShare = 0.4)
      .collect().map(r => (r.getLong(3), r.getLong(1)))
    assert(dup.nonEmpty, "the shared tail must surface")
    assert(dup.forall(_._1 >= 8L), "only >=40%-of-corpus chunks pass the threshold")
  }
}
