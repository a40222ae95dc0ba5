package graft

import graft.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point (SURVEY.md §4.2's reserved escape
  * hatch, exercised): registers graft's native expressions with the
  * session's function registry so pure-SQL users reach the codegen'd
  * kernels too. Enabled via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession sets it).
  *
  *   SELECT float_dot(a.embedding, b.embedding) FROM ...
  *   SELECT simhash64(text), minhash_sig(text, 3, 32) FROM docs
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def reg(
      ext: SparkSessionExtensions, name: String, cls: Class[_],
      build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), build))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: per-key top-k heap operator (partial →
    // exchange → final), SURVEY.md §4.2's custom-SparkStrategy path
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // column pruning across the custom node (the stock rule cannot see
    // it): without this, ANN pair vectors ride into the heap operator's
    // row materialization only to be dropped by the caller's select
    ext.injectOptimizerRule(_ => graft.plans.TopKPerKeyColumnPruning)
    reg(ext, "float_dot", classOf[FloatDotProduct], args => {
      require(args.length == 2, "float_dot(arrayA, arrayB)")
      FloatDotProduct(args.head, args(1))
    })
    reg(ext, "ascii_poly_hash", classOf[AsciiPolyHash], args => {
      require(args.length == 1, "ascii_poly_hash(str)")
      AsciiPolyHash(args.head)
    })
    reg(ext, "deflate_size", classOf[DeflateSize], args => {
      require(args.length == 1, "deflate_size(text_or_binary)")
      DeflateSize(args.head)
    })
    reg(ext, "nibble_hist", classOf[NibbleHistogram], args => {
      require(args.length == 1, "nibble_hist(binary)")
      NibbleHistogram(args.head)
    })
    reg(ext, "sorted_long_intersect", classOf[SortedLongIntersect], args => {
      require(args.length == 2, "sorted_long_intersect(sortedArrayA, sortedArrayB)")
      SortedLongIntersect(args.head, args(1))
    })
    reg(ext, "jaro_winkler", classOf[JaroWinkler], args => {
      require(args.length == 2, "jaro_winkler(stringA, stringB)")
      JaroWinkler(args.head, args(1))
    })
    reg(ext, "simhash64", classOf[SimHash64Kernel], args => {
      require(args.length == 1, "simhash64(text)")
      SimHash64Kernel(args.head)
    })
    reg(ext, "portable_simhash_bands", classOf[PortableSimHashBandsKernel], args => {
      require(args.length == 1, "portable_simhash_bands(text)")
      PortableSimHashBandsKernel(args.head)
    })
    reg(ext, "minhash_sig", classOf[MinHashSigKernel], args => {
      require(args.length == 3, "minhash_sig(text, n, numHashes)")
      MinHashSigKernel(args.head, litInt(args(1), "n"), litInt(args(2), "numHashes"),
        portable = false)
    })
    // SQL-exposed table function (Catalyst Generator): SELECT/LATERAL VIEW
    reg(ext, "explode_shingles", classOf[ShingleExplode], args => {
      require(args.length == 2, "explode_shingles(text, n)")
      ShingleExplode(args.head, litInt(args(1), "n"))
    })
    reg(ext, "cdc_chunks", classOf[CdcChunksKernel], args => {
      require(args.length == 2, "cdc_chunks(text, divisor)")
      CdcChunksKernel(args.head, args(1) match {
        case Literal(v: Int, _) => v.toLong
        case Literal(v: Long, _) => v
        case other => throw new IllegalArgumentException(
          s"cdc_chunks divisor must be an integer literal, got $other")
      })
    })
    reg(ext, "shingle_hashes", classOf[ShingleHashesKernel], args => {
      require(args.length == 2, "shingle_hashes(text, n)")
      ShingleHashesKernel(args.head, litInt(args(1), "n"))
    })
    reg(ext, "jaccard_shingles", classOf[JaccardShinglesKernel], args => {
      require(args.length == 3, "jaccard_shingles(textA, textB, n)")
      JaccardShinglesKernel(args.head, args(1), litInt(args(2), "n"))
    })
    reg(ext, "hyperplane_bands", classOf[HyperplaneBands], args => {
      require(args.length == 3, "hyperplane_bands(vec, bands, planesPerBand)")
      HyperplaneBands(args.head, litInt(args(1), "bands"), litInt(args(2), "planesPerBand"))
    })
  }
}
