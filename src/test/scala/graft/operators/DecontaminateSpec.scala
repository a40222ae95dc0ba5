package graft.operators

import graft.SparkSpecBase

/** Decontamination contracts: exact overlap counts vs a brute-force
  * string-n-gram computation, the zero-overlap row guarantee, the
  * boilerplate df guard, and the shuffle-join plan discipline. */
class DecontaminateSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  private val train = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),
    (1L, "one two three four five six seven"),
    (2L, "common phrase here common phrase here padding words")
  ).toDF("doc_id", "text")

  private val test_ = Seq(
    (10L, "alpha beta gamma delta unrelated tail words"),   // overlaps doc 0
    (11L, "totally different content with no shared runs"), // clean
    (12L, "five six seven plus one two three four")         // overlaps doc 1
  ).toDF("doc_id", "text")

  private def bruteShared(n: Int): Map[Long, Long] = {
    def grams(t: String): Set[String] =
      t.split("\\s+").toSeq.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet
    val trainGrams = train.collect().map(_.getString(1)).flatMap(grams).toSet
    test_.collect().map(r =>
      r.getLong(0) -> grams(r.getString(1)).count(trainGrams).toLong).toMap
  }

  test("overlap counts match brute force and clean docs still get a row") {
    for (n <- Seq(2, 3, 4)) {
      val expect = bruteShared(n)
      val got = Decontaminate.overlap(train, test_, n = n).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(got.length === 3, s"n=$n: every test doc must appear")
      got.foreach { case (id, shared, flag) =>
        assert(shared === expect(id), s"n=$n doc $id")
        assert(flag === (shared >= 1L), s"n=$n doc $id flag")
      }
    }
  }

  test("maxTrainDf drops boilerplate grams from the evidence") {
    // "common phrase" appears in two train docs below — df 2; with
    // maxTrainDf = 1 it is no longer evidence of contamination
    val tr = Seq(
      (0L, "common phrase one filler"),
      (1L, "common phrase two filler"),
      (2L, "unique signal run here")
    ).toDF("doc_id", "text")
    val te = Seq((10L, "common phrase borrowed"), (11L, "unique signal run stolen"))
      .toDF("doc_id", "text")
    val strict = Decontaminate.overlap(tr, te, n = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val guarded = Decontaminate.overlap(tr, te, n = 2, maxTrainDf = Some(1)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(strict(10L) === 1L && guarded(10L) === 0L,
      "df guard must drop the repeated train gram")
    assert(strict(11L) === guarded(11L),
      "df guard must not touch unique-gram evidence")
  }

  test("the gram join is a shuffled hash join, not a broadcast") {
    val plan = Decontaminate.overlap(train, test_, n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected ShuffledHashJoin on the gram hash; plan:\n$plan")
  }

  test("invalid configurations fail fast") {
    intercept[IllegalArgumentException](Decontaminate.overlap(train, test_, n = 0))
    intercept[IllegalArgumentException](
      Decontaminate.overlap(train, test_, minShared = 0L))
  }

  test("overlapBloomPruned is bit-identical to the exact overlap") {
    for (n <- Seq(2, 3); fpp <- Seq(0.5, 0.03)) {
      // fpp 0.5 forces a tiny bloom with heavy false positives — the
      // equivalence must hold anyway, because FPs only feed extra train
      // grams into the exact join where nothing matches them
      val exact = Decontaminate.overlap(train, test_, n = n).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
      val pruned = Decontaminate.overlapBloomPruned(
          train, test_, n = n, bloomFpp = fpp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
      assert(pruned === exact, s"n=$n fpp=$fpp")
    }
  }

  test("overlapBloomPruned with the df guard matches the guarded exact path") {
    val tr = Seq(
      (0L, "common phrase one filler"),
      (1L, "common phrase two filler"),
      (2L, "unique signal run here")
    ).toDF("doc_id", "text")
    val te = Seq((10L, "common phrase borrowed"), (11L, "unique signal run stolen"))
      .toDF("doc_id", "text")
    val exact = Decontaminate.overlap(tr, te, n = 2, maxTrainDf = Some(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val pruned = Decontaminate.overlapBloomPruned(
        tr, te, n = 2, maxTrainDf = Some(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(pruned === exact)
  }

  test("overlapBloomPruned: an eval set below the gram order contaminates nothing") {
    val te = Seq((10L, "shorty"), (11L, "two toks")).toDF("doc_id", "text")
    val out = Decontaminate.overlapBloomPruned(train, te, n = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(out === Array((10L, 0L, false), (11L, 0L, false)))
  }

  test("cutEvalSpans: a single benchmark occurrence cuts the train span") {
    val tr = Seq(
      (0L, "t1 t2 bench phrase one here t3 t4"), // eval 4-gram at pos 2 -> cut
      (1L, "clean content with no overlap at all"),
      (2L, "bench phrase one here"))             // train doc IS the eval text
      .toDF("doc_id", "text")
    val ev = Seq((100L, "bench phrase one here")).toDF("doc_id", "text")
    val out = Decontaminate.cutEvalSpans(tr, ev, n = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out === Map(
      0L -> ((4L, "t1 t2 t3 t4")),
      1L -> ((7L, "clean content with no overlap at all")),
      2L -> ((0L, ""))))
    // no threshold: the window occurred ONCE in eval and was still cut —
    // the whole point vs duplicatedWindowHashes' minOccurrences >= 2 bar
  }
}
