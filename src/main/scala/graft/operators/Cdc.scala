package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking — Rabin-style rolling-window boundaries
  * (Muthitacharoen et al., SOSP 2001 "LBFS"; the FastCDC family's
  * ancestor): a cut lands after position i iff the polynomial hash of
  * the LAST W characters meets a divisor mask. Boundaries are anchored
  * to CONTENT, not position, which is what the fixed-width and n-gram
  * dedup tiers cannot give: insert one character near the front of a
  * document and every fixed-width chunk after it changes, while CDC
  * boundaries re-anchor within ~W characters and the tail chunks stay
  * IDENTICAL — the property that makes chunk-level storage dedup and
  * boilerplate-tail detection work under edit drift (spec-measured:
  * CdcSpec's shift-resistance property).
  *
  * Portability: the window hash is the engine-portable polynomial char
  * hash (the [[graft.expressions.AsciiPolyHash]] convention — code-point
  * values, base 31, mod 1e9+7), so boundaries, chunk identities and the
  * whole dedup accounting replay verbatim in SQL (q169). The production
  * path is the one-pass rolling kernel
  * ([[graft.expressions.CdcChunks]] — O(n) per document, codegen'd);
  * the declarative HOF twin stays as its in-repo oracle. W=16 keeps
  * the boundary context real.
  *
  * Scale shape: chunking is a narrow per-row projection + one explode
  * (output-sized); the dedup accounting is one grouped aggregation on
  * 8-byte chunk hashes with map-side combining. Expected chunk length
  * is `divisor` characters (geometric); documents shorter than W are
  * one chunk. No min/max chunk-size normalization (FastCDC's tweak) —
  * documented out of scope; the divisor is the chunk-size knob. */
object Cdc {

  val Window = 16
  val P = 1000000007L
  val Base = 31L

  /** Per-document CDC chunk table: (idCol, chunk_idx, chunk_start,
    * chunk_len, chunk_hash) — chunk_idx 1-based, chunk_start 1-based
    * character position, chunk_hash the portable polynomial hash of the
    * chunk's characters. Empty/NULL texts produce no rows (a document
    * with no content has no chunks — absence, not a sentinel). */
  def chunks(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      divisor: Long = 64L): DataFrame = {
    require(divisor >= 2, s"divisor $divisor must be >= 2 (expected chunk length)")
    // the one-pass rolling kernel (graft.expressions.CdcChunks): the
    // declarative HOF form below ([[chunksDeclarative]]) allocates a
    // W-element sequence per position and was the registry's worst
    // sf0.1 query at 8 s; the kernel is the same mathematics in O(n)
    // with zero per-position allocation (8.1 s -> sub-second), spec'd
    // bit-equal (CdcSpec)
    import org.apache.spark.sql.graftglue.ColumnGlue
    val kernel = ColumnGlue.column(graft.expressions.CdcChunksKernel(
      ColumnGlue.expression(col(textCol)), divisor))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), posexplode(kernel))
      .select(col(idCol),
        (col("pos") + 1).cast("long").as("chunk_idx"),
        col("col.s").as("chunk_start"),
        col("col.len").as("chunk_len"),
        col("col.h").as("chunk_hash"))
  }

  /** The declarative HOF twin of [[chunks]] — kept as the kernel's spec
    * oracle (CdcSpec asserts bit-equality on randomized texts): same
    * cut rule, same hashes, O(W·n) per document. */
  private[graft] def chunksDeclarative(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      divisor: Long = 64L): DataFrame = {
    require(divisor >= 2, s"divisor $divisor must be >= 2 (expected chunk length)")
    // __codes MUST be materialized by its own projection before anything
    // indexes into it: building the cut list from the `codes` EXPRESSION
    // would copy the regexp+transform tree into every element_at inside
    // the lambdas, and Spark re-evaluates it per access — O(W·n²) per
    // document instead of O(W·n) (measured: ~60× on the q169 fixture).
    // CollapseProject leaves the split alone (the expression is
    // non-cheap and multi-referenced).
    val chars = regexp_extract_all(col(textCol), lit("(?s)."), lit(0))
    val codesCol = col("__codes")
    val n = size(codesCol)
    def polyOver(lo: Column, hi: Column): Column =
      aggregate(sequence(lo, hi), lit(0L),
        (acc, j) => pmod(acc * Base + element_at(codesCol, j.cast("int")), lit(P)))
    // cut AFTER i iff the last-W window hash divides; i stops at n-1 (a
    // cut at the very end is a no-op and would duplicate the bound).
    // greatest() guards Spark's descending sequence(a, b<a) behavior —
    // the i <= n-1 predicate does the real bounding
    val cuts = filter(sequence(lit(Window), greatest(n - 1, lit(Window))), i =>
      i <= n - 1 && pmod(polyOver(i - (Window - 1), i), lit(divisor)) === 0)
    val bounds = concat(array(lit(0)), cuts, array(n))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), transform(chars, c => ascii(c).cast("long")).as("__codes"))
      .where(n >= 1)
      .select(col(idCol), codesCol, bounds.as("__b"))
      .select(col(idCol), col("__codes"),
        posexplode(transform(sequence(lit(1), size(col("__b")) - 1), j =>
          struct(
            (element_at(col("__b"), j.cast("int")) + 1).as("s"),
            element_at(col("__b"), (j + 1).cast("int")).as("e")))))
      .select(col(idCol),
        (col("pos") + 1).cast("long").as("chunk_idx"),
        col("col.s").cast("long").as("chunk_start"),
        (col("col.e") - col("col.s") + 1).cast("long").as("chunk_len"),
        aggregate(sequence(col("col.s"), col("col.e")), lit(0L),
          (acc, j) => pmod(acc * Base + element_at(col("__codes"), j.cast("int")), lit(P)))
          .as("chunk_hash"))
  }

  /** Cross-corpus duplicate-chunk accounting: chunks shared by at least
    * `minDocShare` of the corpus — (chunk_hash, chunk_len, n_copies,
    * n_docs), the storage-dedup / boilerplate-tail ledger. The doc
    * threshold is RELATIVE (a 1-row broadcast of the corpus size, the
    * q61 one-row-crossJoin class) so the same query means the same
    * thing at every scale. chunk_len rides along via min (identical
    * hash ⇒ identical content ⇒ identical length, modulo hash
    * collisions — min makes the output deterministic regardless). */
  def duplicateChunks(
      chunkTable: DataFrame,
      docCount: DataFrame,
      minDocShare: Double): DataFrame = {
    require(minDocShare > 0 && minDocShare <= 1,
      s"minDocShare $minDocShare outside (0, 1]")
    chunkTable.groupBy("chunk_hash")
      .agg(min(col("chunk_len")).as("chunk_len"),
        count(lit(1)).as("n_copies"),
        count_distinct(col("doc_id")).as("n_docs"))
      .crossJoin(broadcast(docCount))
      .where(col("n_docs") >= col("__n_docs_total") * minDocShare)
      .select(col("chunk_hash"), col("chunk_len"), col("n_copies"), col("n_docs"))
  }
}
