package graft.operators

import graft.SparkSpecBase
import graft.core.Tables

/** [[Spectral.pcaTopComponent]] gates: planted-direction recovery,
  * sequential-reference equality of the distributed scatter statistics,
  * partition invariance, and the loud degenerate failures. */
class SpectralSpec extends SparkSpecBase {

  private val s_ = spark
  import s_.implicits._

  private def mk(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")

  test("planted dominant direction is recovered; dominance reads high") {
    // data = t·u + small structured noise, u = (3,4)/5: the top
    // component must align with u and explain nearly all variance
    val u = Array(0.6f, 0.8f)
    val rows = (-20 to 20).map { t =>
      Array(u(0) * t + 0.01f * (t % 3), u(1) * t - 0.01f * (t % 2))
    }
    val out = Spectral.pcaTopComponent(mk(rows), iters = 8)
      .collect().sortBy(_.getLong(0))
    assert(out.length === 2)
    val v = out.map(_.getLong(1).toDouble)
    val cos = (v(0) * u(0) + v(1) * u(1)) /
      (math.sqrt(v(0) * v(0) + v(1) * v(1)) * 1.0)
    assert(math.abs(cos) > 0.999, s"component $cos must align with the plant")
    val dom = out.head.getDouble(4)
    assert(dom > 0.9, s"dominance $dom must be near 1 on a 1-d plant")
    // L∞ contract: max-abs component is exactly the scale
    assert(v.map(math.abs).max === 1000000.0)
  }

  test("distributed scatter statistics equal a sequential reference exactly") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 120).map(_ => Array.fill(5)(rnd.nextFloat() * 2 - 1))
    val out = Spectral.pcaTopComponent(mk(rows), iters = 4)
      .collect().sortBy(_.getLong(0))
    // sequential reference: identical quantization, scatter, iteration
    val q = rows.map(_.map(x =>
      BigDecimal(x.toDouble * 1e6).setScale(0,
        BigDecimal.RoundingMode.HALF_UP).toLong))
    val n = BigInt(q.length)
    val dim = 5
    val sArr = Array.tabulate(dim)(d => q.map(r => BigInt(r(d))).sum)
    val c = Array.tabulate(dim, dim)((a, b) =>
      n * q.map(r => BigInt(r(a)) * BigInt(r(b))).sum - sArr(a) * sArr(b))
    val d0 = (0 until dim).maxBy(d => (c(d)(d), -d))
    var v = Array.tabulate(dim)(d => if (d == d0) BigInt(1000000) else BigInt(0))
    var m = BigInt(0)
    (1 to 4).foreach { _ =>
      val w = Array.tabulate(dim)(a => (0 until dim).map(b => c(a)(b) * v(b)).sum)
      m = w.map(_.abs).max
      v = w.map(wa =>
        BigInt(math.floor(wa.toDouble / m.toDouble * 1e6 + 0.5).toLong))
    }
    assert(out.map(_.getLong(1)).toSeq === v.map(_.toLong).toSeq,
      "every component must match the sequential reference exactly")
  }

  test("partition invariance: repartitioning does not move a single component") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 90).map(_ => Array.fill(4)(rnd.nextFloat()))
    val a = Spectral.pcaTopComponent(mk(rows), iters = 5)
      .collect().map(_.toSeq).toSeq
    val b = Spectral.pcaTopComponent(mk(rows).repartition(13), iters = 5)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("degenerate corpora fail loud: identical vectors, mixed dims, empty") {
    val same = mk(Seq.fill(10)(Array(0.5f, 0.5f)))
    val e1 = intercept[IllegalArgumentException] {
      Spectral.pcaTopComponent(same)
    }
    assert(e1.getMessage.contains("zero scatter matrix"))
    val mixed = Seq((1L, Seq(0.1f, 0.2f)), (2L, Seq(0.1f, 0.2f, 0.3f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Spectral.pcaTopComponent(mixed)
    }
    assert(e2.getMessage.contains("mixed vector lengths"))
    val empty = mk(Seq.empty)
    val e3 = intercept[IllegalArgumentException] {
      Spectral.pcaTopComponent(empty)
    }
    assert(e3.getMessage.contains("empty corpus"))
    // component magnitude past the int64-exact product bound at q=6:
    // must fail loud, never wrap the Gram products silently
    val huge = mk(Seq(Array(5000.0f, 1.0f), Array(-4000.0f, 2.0f)))
    val e4 = intercept[IllegalArgumentException] {
      Spectral.pcaTopComponent(huge)
    }
    assert(e4.getMessage.contains("lower quantDecimals"))
    // and the documented remedy works: q=3 keeps the same corpus exact
    val ok = Spectral.pcaTopComponent(huge, quantDecimals = 3)
    assert(ok.count() === 2L)
  }

  test("runs on the fixture embeddings; output is one total-ordered row per dim") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val out = Spectral.pcaTopComponent(v, iters = 6).collect()
    val dim = out.length
    assert(dim > 1 && out.map(_.getLong(0)).toSeq === (0L until dim.toLong))
    val dom = out.head.getDouble(4)
    assert(dom > 0.0 && dom <= 1.0, s"dominance $dom must be a share")
    assert(out.map(r => math.abs(r.getLong(1))).max === 1000000L)
  }
}
