package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Document deduplication for the LLM-pipeline surface (SURVEY.md §2.10 L1/
  * L2): exact (content hash), n-gram Jaccard (exact, candidate-pruned),
  * MinHash+LSH (approximate, scale path), and SimHash (bit-signature).
  *
  * Scale design (the 100 TB story):
  *  - exact dedup is one hash-groupBy — a single shuffle on the 256-bit
  *    content hash; no text ever shuffles, only (hash, id).
  *  - jaccardPairs prunes to pairs sharing ≥1 shingle. The optional
  *    `maxShingleDf` drops shingles present in more than that many docs
  *    before the self-join — the standard hot-key guard: a shingle shared
  *    by 1M docs would otherwise emit 10^12 candidate rows.
  *  - minHashLshPairs replaces the shingle join with a (numHashes)-int
  *    signature + banded bucket join: candidate volume is governed by the
  *    band collision probability (~j^rowsPerBand per band), independent of
  *    document length; the exact-Jaccard verify runs only on candidates.
  *  - simHashPairs is constant-size state per doc (one 64-bit signature);
  *    the 4×16-bit band join finds all pairs with Hamming distance ≤ 3 by
  *    pigeonhole and any-distance pairs probabilistically.
  */
object Dedup {

  /** Exact dedup: one row per distinct text — canonical (minimum) id and
    * copy count, keyed by sha2-256 of the content. */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("text_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct-shingle sets per doc: (id, sh) with empty-set docs dropped. */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), TextOps.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Exact n-gram Jaccard near-dup pairs (ia < ib, jaccard ≥ minJaccard).
    * Candidates = pairs sharing at least one shingle; shared-shingle count
    * per pair comes from one self-equi-join on the shingle, sizes join
    * back from the per-doc sets, so Jaccard is exact:
    * |A∩B| / (|A|+|B|-|A∩B|).
    *
    * @param maxShingleDf drop shingles occurring in more than this many
    *   docs before pairing (hot-key guard; None = keep all, exact result).
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      minJaccard: Double = 0.8,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val docs = shingleSets(df, idCol, textCol, n)
    val ex0 = docs.select(col("id"), explode(col("sh")).as("s"))
    val ex = maxShingleDf match {
      case Some(m) =>
        val keep = ex0.groupBy("s").agg(count(lit(1)).as("df_")).filter(col("df_") <= m)
        ex0.join(keep.select("s"), "s")
      case None => ex0
    }
    val left = ex.select(col("id").as("ia"), col("s"))
    val right = ex.select(col("id").as("ib"), col("s").as("s2"))
    val shared = left.join(right, col("s") === col("s2") && col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("shared"))
    val sizes = docs.select(col("id"), size(col("sh")).cast(LongType).as("nsh"))
    shared
      .join(sizes.select(col("id").as("ia"), col("nsh").as("na")), "ia")
      .join(sizes.select(col("id").as("ib"), col("nsh").as("nb")), "ib")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= minJaccard)
      .select("ia", "ib", "shared", "na", "nb", "jaccard")
  }

  /** MinHash signature column: for hash i, min over shingles of
    * xxhash64(shingle, i). Deterministic (xxhash64 is seed-fixed). */
  private def minHashSig(sh: String, numHashes: Int): String =
    s"""transform(sequence(0, ${numHashes - 1}),
       |  i -> array_min(transform($sh, s -> xxhash64(s, i))))""".stripMargin

  /** MinHash + LSH near-dup pairs: banded signature buckets generate
    * candidates, exact Jaccard (on the true shingle sets) verifies them.
    * Result ⊆ jaccardPairs(minJaccard); recall is the LSH S-curve
    * 1-(1-j^r)^b (r = numHashes/bands rows per band, b = bands).
    * Also returns `est_jaccard`, the signature-agreement estimate. */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      minJaccard: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val docs = shingleSets(df, idCol, textCol, n)
      .withColumn("sig", expr(minHashSig("sh", numHashes)))
    // band key: hash of each r-slice of the signature, salted by band index
    val banded = docs.select(
      col("id"), col("sh"), col("sig"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), j -> xxhash64(slice(sig, j * $r + 1, $r), j))"))
        .as(Seq("band", "bkey")))
    val a = banded.select(col("id").as("ia"), col("sh").as("sha"), col("sig").as("siga"),
      col("band"), col("bkey"))
    val b = banded.select(col("id").as("ib"), col("sh").as("shb"), col("sig").as("sigb"),
      col("band").as("band2"), col("bkey").as("bkey2"))
    val cand = a.join(b,
        col("band") === col("band2") && col("bkey") === col("bkey2") && col("ia") < col("ib"))
      .select("ia", "ib", "sha", "shb", "siga", "sigb")
      .dropDuplicates("ia", "ib")
    cand
      .withColumn("shared", size(array_intersect(col("sha"), col("shb"))).cast(LongType))
      .withColumn("jaccard", col("shared").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("shared")))
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(siga, sigb, (x, y) -> x = y), b -> b)) / cast($numHashes as double)"))
      .filter(col("jaccard") >= minJaccard)
      .select("ia", "ib", "shared", "jaccard", "est_jaccard")
  }

  /** 64-bit SimHash of the whitespace token stream: per bit, sign of the
    * ±1 vote sum across token hashes. Pure Catalyst expression. */
  def simHash64(textCol: String): org.apache.spark.sql.Column =
    expr(s"""aggregate(
      zip_with(
        aggregate(split($textCol, '\\\\s+'),
          transform(sequence(0, 63), b -> 0L),
          (acc, t) -> zip_with(acc, sequence(0, 63),
            (c, b) -> c + IF(((xxhash64(t) >> b) & 1) = 1, 1L, -1L))),
        sequence(0, 63),
        (c, b) -> IF(c >= 0, shiftleft(1L, cast(b as int)), 0L)),
      0L, (h, x) -> h | x)""")

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, candidates
    * from 4×16-bit band equality (pigeonhole-complete for distance ≤ 3). */
  def simHashPairs(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    val docs = df.select(col(idCol).as("id"), simHash64(textCol).as("sim"))
    val banded = docs.select(col("id"), col("sim"),
      posexplode(expr("transform(sequence(0, 3), j -> (sim >> (j * 16)) & 65535)"))
        .as(Seq("band", "bkey")))
    val a = banded.select(col("id").as("ia"), col("sim").as("sima"), col("band"), col("bkey"))
    val b = banded.select(col("id").as("ib"), col("sim").as("simb"),
      col("band").as("band2"), col("bkey").as("bkey2"))
    a.join(b, col("band") === col("band2") && col("bkey") === col("bkey2") && col("ia") < col("ib"))
      .select("ia", "ib", "sima", "simb")
      .dropDuplicates("ia", "ib")
      .withColumn("hamming", expr("bit_count(sima ^ simb)").cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select("ia", "ib", "sima", "simb", "hamming")
  }
}
