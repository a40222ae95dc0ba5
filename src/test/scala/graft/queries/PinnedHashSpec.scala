package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame

/** Fixture-pinned output hashes for the two queries the DuckDB oracle
  * cannot replay (q38/q39 — xxhash64 signature families). Their driver
  * gate is rows-only, so without this pin a silent change to the
  * signature kernels (tokenization, hash seed, band math, verify step)
  * could alter every emitted pair and still pass. The pins were computed
  * from the round-7 outputs on the read-only sf0.001 fixture (seed 42);
  * both queries end in a total ORDER BY, so the rendering is
  * deterministic. If a pin breaks, either a regression slipped into the
  * signature path or the change is intentional — re-pin ONLY after
  * explaining the semantic change in the commit message. */
class PinnedHashSpec extends SparkSpecBase {

  private def md5Of(df: DataFrame): String = {
    val rendered = df.collect().map(_.toSeq.map {
      // Locale.ROOT: the default-locale f-interpolator would render 0.5 as
      // "0,5000" on comma-decimal JVMs and break the pins spuriously
      case d: Double => String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
      case x => String.valueOf(x)
    }.mkString("|")).mkString("\n")
    java.security.MessageDigest.getInstance("MD5").digest(rendered.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("q38 minhash-lsh pairs are pinned on the sf0.001 fixture") {
    val df = LlmQueries.q38.builder(spark, sfDir)
    assert(df.count() === 28L)
    assert(md5Of(df) === "4337d3815a0d3d87469fc0be6f9e1a61")
  }

  test("q39 simhash signatures are pinned on the sf0.001 fixture") {
    val df = LlmQueries.q39.builder(spark, sfDir)
    assert(df.count() === 500L)
    assert(md5Of(df) === "0cbcbecaa44e56c4c678b6b5c6624237")
  }
}
