package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Changes.snapshotDelta]] gates: classification truth table (added /
  * removed / changed / unchanged), multi-column content identity, and the
  * shuffle-width contract (digests, not text, reach the join exchange). */
class SnapshotDeltaSpec extends SparkSpecBase {

  private val s_ = spark
  import s_.implicits._

  test("classifies added/removed/changed/unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = Changes.snapshotDelta(oldSnap, newSnap)
      .select("doc_id", "change").as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("content identity spans all contentCols") {
    val oldSnap = Seq((1L, "t", "en"), (2L, "t", "en")).toDF("doc_id", "text", "lang")
    val newSnap = Seq((1L, "t", "de"), (2L, "t", "en")).toDF("doc_id", "text", "lang")
    val out = Changes.snapshotDelta(oldSnap, newSnap,
        contentCols = Seq("text", "lang"))
      .select("doc_id", "change").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("delta partitions the id space: every id classified exactly once") {
    val oldSnap = spark.range(0, 100).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    val newSnap = spark.range(50, 150).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id"), when(col("id") % 3 === 0, lit(" v2")).otherwise(lit(""))).as("text"))
    val out = Changes.snapshotDelta(oldSnap, newSnap)
    assert(out.count() === 150)
    assert(out.select("doc_id").distinct().count() === 150)
    val byChange = out.groupBy("change").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // removed: 0..49; added: 100..149; changed: ids 50..99 with id%3==0 (17 of them)
    assert(byChange("removed") === 50)
    assert(byChange("added") === 50)
    assert(byChange("changed") === 17)
    assert(byChange("unchanged") === 33)
  }

  test("text never reaches the join: exchange inputs carry only id + digest") {
    val oldSnap = Seq((1L, "a")).toDF("doc_id", "text")
    val newSnap = Seq((1L, "a")).toDF("doc_id", "text")
    val plan = Changes.snapshotDelta(oldSnap, newSnap)
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        val names = side.output.map(_.name).toSet
        assert(!names.contains("text"),
          s"raw content column crossed into the join input: $names")
      }
    }
  }

  test("joinViewDelta: view(A+dA, B+dB) == view(A,B) + delta on random signed updates") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(41)
    (1 to 15).foreach { trial =>
      def mk(n: Int, payload: String) =
        (1 to n).map(_ => (rnd.nextInt(5).toLong, s"$payload${rnd.nextInt(3)}"))
      val a = mk(3 + rnd.nextInt(8), "a")
      val b = mk(3 + rnd.nextInt(8), "b")
      // deltas: a few inserts plus retracts of EXISTING rows (so the new
      // state stays a legal multiset)
      def deltas(base: Seq[(Long, String)], payload: String) = {
        val ins = mk(rnd.nextInt(4), payload).map { case (k, p) => (k, p, 1L) }
        val ret = rnd.shuffle(base).take(rnd.nextInt(math.min(3, base.size) + 1))
          .map { case (k, p) => (k, p, -1L) }
        ins ++ ret
      }
      val da = deltas(a, "a")
      val db = deltas(b, "b")
      def applyDelta(base: Seq[(Long, String)], d: Seq[(Long, String, Long)]) = {
        val m = scala.collection.mutable.Map.empty[(Long, String), Long]
          .withDefaultValue(0L)
        base.foreach(r => m(r) += 1)
        d.foreach { case (k, p, mm) => m((k, p)) += mm }
        m.toMap.filter(_._2 != 0)
      }
      def view(am: Map[(Long, String), Long], bm: Map[(Long, String), Long]) =
        (for (((ka, pa), ma) <- am.toSeq; ((kb, pb), mb) <- bm.toSeq if ka == kb)
          yield ((ka, pa, pb), ma * mb))
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap.filter(_._2 != 0)
      val aM = applyDelta(a, Nil); val bM = applyDelta(b, Nil)
      val oldV = view(aM, bM)
      val newV = view(applyDelta(a, da), applyDelta(b, db))
      val got = Changes.joinViewDelta(
          a.toDF("k", "pa"), da.toDF("k", "pa", "m"),
          b.toDF("k", "pb"), db.toDF("k", "pb", "m"), Seq("k"))
        .groupBy("k", "pa", "pb").agg(sum("m").as("m"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3))
        .filter(_._2 != 0L).toMap
      val want = (newV.keySet ++ oldV.keySet).flatMap { key =>
        val d = newV.getOrElse(key, 0L) - oldV.getOrElse(key, 0L)
        if (d != 0L) Some(key -> d) else None
      }.toMap
      assert(got === want, s"trial $trial: delta mismatch")
    }
  }
}
