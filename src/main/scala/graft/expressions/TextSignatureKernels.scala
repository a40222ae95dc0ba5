package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused one-pass signature kernels for the dedup/near-dup families — the
  * round-3 declarative pipelines (token/shingle explode → 32/64-column
  * MIN/SUM hash aggregation) were correct and plan-shaped right, but their
  * allocation profile (one row object per token, a 64-column aggregation
  * buffer per doc, an interpreted lambda per band) made them the queries
  * that collapsed first under GC pressure on a contended box (BENCH_r02/
  * r03 adjudication). Each kernel below computes a whole document's
  * signature in ONE tight byte loop per row: no explode, no aggregation,
  * no shuffle — signatures become a pure codegen'd map.
  *
  * Tokenization contract: identical to Spark's `split(text, '\\s+')`
  * (Java `Pattern.split` with limit -1): tokens are the segments BETWEEN
  * maximal `\s` runs, including the empty leading segment when the text
  * starts with whitespace and the empty trailing segment when it ends
  * with one; the empty string yields the single token "". Bit-equality
  * with the declarative forms is unit-tested per kernel (DedupSpec).
  */
private[graft] object TextSignatureKernels {

  final val P = 1000000007L

  /** Java regex `\s` (no UNICODE flag) — all ASCII, so byte-level
    * scanning is UTF-8-safe (multi-byte code points never match). */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Token boundaries of `b` under the split-with-limit(-1) contract.
    * Returns (starts, ends, count); arrays may be longer than count. */
  private def tokenize(b: Array[Byte]): (Array[Int], Array[Int], Int) = {
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var n = 0
    def push(s: Int, e: Int): Unit = {
      if (n == cap) {
        cap *= 2
        starts = java.util.Arrays.copyOf(starts, cap)
        ends = java.util.Arrays.copyOf(ends, cap)
      }
      starts(n) = s; ends(n) = e; n += 1
    }
    var segStart = 0
    var i = 0
    while (i < b.length) {
      if (isWs(b(i))) {
        push(segStart, i)
        while (i < b.length && isWs(b(i))) i += 1
        segStart = i
      } else i += 1
    }
    push(segStart, b.length)
    (starts, ends, n)
  }

  /** 64-bit SimHash over xxhash64(token) bit votes — bit-identical to
    * [[graft.operators.Dedup.simHash64]]. */
  def simHash64(s: UTF8String): Long = {
    val b = s.getBytes
    val (starts, ends, n) = tokenize(b)
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + starts(t),
        ends(t) - starts(t), 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) >= 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Portable SimHash band keys (4×16-bit) — the engine-portable family of
    * [[graft.operators.Dedup.portableSimHashSignatures]]: token hash is
    * the AsciiPolyHash fold, bit b votes parity(((h + 131b + 7) mod P)²
    * mod P). Value-identical to the declarative 64-SUM form (oracle-gated
    * via q48). */
  def portableSimHashBands(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val (starts, ends, n) = tokenize(b)
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      var h = 0L
      var i = starts(t)
      while (i < ends(t)) {
        h = (h * 31 + (b(i) & 0xff)) % P
        i += 1
      }
      var bit = 0
      while (bit < 64) {
        val g = (h + (131 * bit + 7)) % P
        if ((g * g % P) % 2 == 1) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    val bands = new Array[Long](4)
    var j = 0
    while (j < 4) {
      var key = 0L
      var i = 0
      while (i < 16) {
        if (votes(16 * j + i) >= 0) key |= (1L << i)
        i += 1
      }
      bands(j) = key
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bands)
  }

  /** MinHash signature over word n-gram shingles with the xxhash64 family
    * (permutation i = xxhash64(shingle, i), exactly `xxhash64(col, lit(i))`:
    * hash the shingle bytes with seed 42, then fold i in as an int).
    * Null when the doc has fewer than n tokens — the shingle-set drop
    * rule. Min over all shingles == min over distinct shingles, so the
    * array_distinct in the declarative path needs no replication. */
  def minHashSig(s: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val b = s.getBytes
    val (starts, ends, nTok) = tokenize(b)
    if (nTok < n) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // shingle bytes materialize into one reusable buffer (xxhash needs a
    // contiguous range); max shingle size is bounded by the text itself
    val buf = new Array[Byte](b.length + n)
    var i = 0
    while (i <= nTok - n) {
      var len = 0
      var j = i
      while (j < i + n) {
        if (j > i) { buf(len) = ' '; len += 1 }
        val tl = ends(j) - starts(j)
        System.arraycopy(b, starts(j), buf, len, tl)
        len += tl
        j += 1
      }
      val base = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      var k = 0
      while (k < numHashes) {
        val v = XXH64.hashInt(k, base)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Distinct n-gram shingle set of `b`'s token stream, keyed by the
    * space-joined shingle bytes (UTF8String equality == string equality).
    * Empty for docs with fewer than n tokens — the shingle-set drop rule. */
  private def shingleSet(b: Array[Byte], n: Int): java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String]()
    val (starts, ends, nTok) = tokenize(b)
    if (nTok < n) return set
    val buf = new Array[Byte](b.length + n)
    var i = 0
    while (i <= nTok - n) {
      var len = 0
      var j = i
      while (j < i + n) {
        if (j > i) { buf(len) = ' '; len += 1 }
        val tl = ends(j) - starts(j)
        System.arraycopy(b, starts(j), buf, len, tl)
        len += tl
        j += 1
      }
      set.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, len)))
      i += 1
    }
    set
  }

  /** Distinct n-gram shingle STRINGS in first-occurrence order (the
    * deterministic order `array_distinct` over the declarative shingle
    * array yields) — the [[graft.expressions.ShingleExplode]] generator's
    * row source. Empty for docs with fewer than n tokens. */
  def shingleStrings(s: UTF8String, n: Int): Array[UTF8String] = {
    val b = s.getBytes
    val set = new java.util.LinkedHashSet[UTF8String]()
    val (starts, ends, nTok) = tokenize(b)
    if (nTok < n) return Array.empty
    val buf = new Array[Byte](b.length + n)
    var i = 0
    while (i <= nTok - n) {
      var len = 0
      var j = i
      while (j < i + n) {
        if (j > i) { buf(len) = ' '; len += 1 }
        val tl = ends(j) - starts(j)
        System.arraycopy(b, starts(j), buf, len, tl)
        len += tl
        j += 1
      }
      set.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, len)))
      i += 1
    }
    set.toArray(new Array[UTF8String](set.size))
  }

  /** Exact distinct-shingle overlap of two documents in one fused pass:
    * [shared, |A|, |B|] with shared = |A ∩ B| over the SAME shingle sets
    * the declarative `shinglesFromTokens` + `array_intersect` pipeline
    * builds (string-exact, not hash-sketched) — jaccard is then
    * shared / (|A|+|B|-shared). This is the LSH verify step collapsed to
    * a scalar kernel: candidates join their two texts and verify locally,
    * instead of materializing corpus shingle arrays and joining them. */
  def jaccardShingles(a: UTF8String, b: UTF8String, n: Int): ArrayData = {
    val sa = shingleSet(a.getBytes, n)
    val sb = shingleSet(b.getBytes, n)
    var shared = 0L
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) shared += 1
    UnsafeArrayData.fromPrimitiveArray(Array(shared, sa.size.toLong, sb.size.toLong))
  }

  /** Distinct xxhash64 shingle hashes of the token stream — seed 42 over
    * the space-joined shingle bytes, exactly `xxhash64(shingle)` applied
    * to the declarative shingle set (bit-equality unit-tested). Empty for
    * docs with fewer than n tokens (the shingle-set drop rule), so an
    * `explode` drops them. This is [[graft.operators.Dedup.jaccardPairs]]'s
    * candidate-generation currency: pairs join on the 8-byte hash instead
    * of the variable-width shingle string, and a collision can only ADD a
    * candidate the exact verify then rejects — never lose one. */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val (starts, ends, nTok) = tokenize(b)
    if (nTok < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nTok - n + 1)
    var m = 0
    val buf = new Array[Byte](b.length + n)
    var i = 0
    while (i <= nTok - n) {
      var len = 0
      var j = i
      while (j < i + n) {
        if (j > i) { buf(len) = ' '; len += 1 }
        val tl = ends(j) - starts(j)
        System.arraycopy(b, starts(j), buf, len, tl)
        len += tl
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(out, 0, m))
  }

  /** Portable MinHash signature (q47's engine-portable hash family):
    * shingle hash h = AsciiPolyHash fold of the space-joined shingle,
    * permutation i = (h·(2i+3) + (1000i+7)) mod P. The fold runs straight
    * over token bytes + separators — no shingle buffer needed. */
  def portableMinHashSig(s: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val b = s.getBytes
    val (starts, ends, nTok) = tokenize(b)
    if (nTok < n) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i <= nTok - n) {
      var h = 0L
      var j = i
      while (j < i + n) {
        if (j > i) h = (h * 31 + 32) % P // the ' ' separator byte
        var p = starts(j)
        while (p < ends(j)) {
          h = (h * 31 + (b(p) & 0xff)) % P
          p += 1
        }
        j += 1
      }
      var k = 0
      while (k < numHashes) {
        val v = (h * (2 * k + 3) + (1000 * k + 7)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

private[graft] trait StringKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")
}

/** Codegen'd whole-document SimHash — see [[TextSignatureKernels.simHash64]]. */
case class SimHash64Kernel(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextSignatureKernels.simHash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSignatureKernels.simHash64($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd portable SimHash band keys (array of 4×16-bit longs). */
case class PortableSimHashBandsKernel(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_simhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    TextSignatureKernels.portableSimHashBands(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSignatureKernels.portableSimHashBands($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd distinct shingle-hash set — see
  * [[TextSignatureKernels.shingleHashes]]. */
case class ShingleHashesKernel(child: Expression, n: Int) extends StringKernelExpr {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextSignatureKernels.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSignatureKernels.shingleHashes($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd exact pairwise shingle-Jaccard counters — array<long>
  * [shared, na, nb] over the distinct n-gram shingle sets of two texts.
  * See [[TextSignatureKernels.jaccardShingles]]. */
case class JaccardShinglesKernel(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "jaccard_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextSignatureKernels.jaccardShingles(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.TextSignatureKernels.jaccardShingles($x, $y, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd MinHash signature; null for docs with fewer than n tokens
  * (the shingle-set drop rule), so callers filter `isNotNull`. */
case class MinHashSigKernel(child: Expression, n: Int, numHashes: Int, portable: Boolean)
    extends StringKernelExpr {
  require(n >= 1 && numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (portable) "portable_minhash_sig" else "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (portable) TextSignatureKernels.portableMinHashSig(s, n, numHashes)
    else TextSignatureKernels.minHashSig(s, n, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (portable) "portableMinHashSig" else "minHashSig"
    nullSafeCodeGen(ctx, ev, x => s"""
       |org.apache.spark.sql.catalyst.util.ArrayData tmp_${ev.value} =
       |  graft.expressions.TextSignatureKernels.$method($x, $n, $numHashes);
       |if (tmp_${ev.value} == null) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = tmp_${ev.value};
       |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
