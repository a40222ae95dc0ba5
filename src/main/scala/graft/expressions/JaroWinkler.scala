package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Jaro-Winkler similarity over two string columns —
  * the standard field comparator for probabilistic record linkage
  * (Winkler 1990, building on Jaro 1989; SURVEY.md §2.10 L91/L128).
  * Spark ships `levenshtein` but no Jaro family, and linkage literature
  * prefers Jaro-Winkler for short name-like fields because it is
  * length-normalized, transposition-tolerant, and front-weighted (names
  * corrupt at the tail: typos, truncation, suffixes).
  *
  * Semantics pinned to the DuckDB/RapidFuzz contract so the oracle can
  * replay it exactly (probed behavior, DuckDB 1.0):
  *   - operates on raw UTF-8 BYTES (multibyte code points compare
  *     per-byte; both engines see identical sequences, so scores agree);
  *   - match window `max(len1, len2)/2 - 1`, floored at 0;
  *   - transpositions = half the out-of-order matched pairs;
  *   - jaro = (m/n1 + m/n2 + (m-t)/m) / 3; either input empty -> 0.0
  *     (DuckDB returns 0 even for two empties — NOT the 1.0 some
  *     libraries use);
  *   - Winkler boost only when jaro > 0.7 (strict): add
  *     `l * 0.1 * (1 - jaro)` for a common prefix of l <= 4 bytes.
  *
  * Scale shape: O(n1*n2) worst case per pair with one boolean-flag pass
  * — the documented comparator cost of every linkage engine; callers
  * bound the candidate-pair set first (blocking / sorted neighborhood),
  * never score the cross product. Allocation is two flag arrays per
  * evaluation; fields are name-sized so this stays in L1.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.JaroWinkler.score($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Jaro-Winkler over the strings' UTF-8 bytes; see class doc for the
    * pinned contract. */
  def score(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val n1 = s.length
    val n2 = t.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n1)
    val tMatch = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true
          tMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the matched bytes of each side in order
    var transp = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) transp += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / n1 + md / n2 + (md - transp / 2) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(n1, n2))
      while (l < maxL && s(l) == t(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
