package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Multi-pattern lexicon scanning via Aho–Corasick (Aho & Corasick 1975,
  * "Efficient string matching: an aid to bibliographic search") — the
  * scale path for the wordlist gates every curation pipeline runs
  * (blocklists, topic lexicons, brand-safety lists, compliance terms).
  *
  * Why an automaton: the declarative form
  * `exists(lexicon, t -> contains(text, t))` scans the document once PER
  * TERM — O(len * nTerms) — which is fine at 10 terms and ruinous at the
  * 10k-term blocklists real pipelines carry. Aho–Corasick matches ALL
  * terms in ONE left-to-right pass, O(len + matches), independent of
  * lexicon size.
  *
  * Scale shape (100 TB): the lexicon is MODEL-SIZED state (a config
  * artifact, thousands of short strings — the L91-weights/L24-codebook
  * family). The automaton is built ONCE per executor from the
  * closure-captured term list (lazy, thread-safe) and reused across every
  * row of every partition — never rebuilt per row, never shuffled. The
  * corpus never moves: one narrow projection per document. The UDF is the
  * documented iterative-kernel exception (SURVEY.md §4.2): a goto/fail
  * automaton walk has no builtin/Catalyst form.
  *
  * Matching semantics (pinned for the oracle): raw byte-free CHAR-level
  * scan over the exact string (callers lower-case both sides for
  * case-insensitive gates); every match POSITION is reported, so a term
  * whose proper prefix equals its proper suffix ("aba" in "ababa") counts
  * overlapping occurrences — for border-free terms (every normal word)
  * this equals the non-overlapping count the SQL `contains`/replace idiom
  * measures. LexiconSpec pins both behaviors.
  */
object Lexicon extends Serializable {

  /** Immutable, serializable Aho–Corasick automaton over a term list.
    * Build is O(total term chars); match is O(text + hits). */
  final class Automaton private (
      terms: Array[String],
      gotoMaps: Array[Map[Char, Int]],
      failLink: Array[Int],
      // term ids matched when landing on each state, fail-chain-flattened
      outTerms: Array[Array[Int]]) extends Serializable {

    def nTerms: Int = terms.length
    def term(i: Int): String = terms(i)

    /** Per-term occurrence counts over one text; index = term id. */
    def countAll(text: String): Array[Int] = {
      val counts = new Array[Int](terms.length)
      var state = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val c = text.charAt(i)
        // follow fail links until a goto exists (root loops to itself)
        var s = state
        var next = -1
        while (next < 0) {
          gotoMaps(s).get(c) match {
            case Some(t) => next = t
            case None => if (s == 0) next = 0 else s = failLink(s)
          }
        }
        state = next
        val out = outTerms(state)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  object Automaton {
    /** Build from distinct non-empty terms; duplicates and empties are
      * rejected (an empty pattern matches at every position — never what
      * a gate means). */
    def build(termSeq: Seq[String]): Automaton = {
      val terms = termSeq.toArray
      require(terms.nonEmpty, "lexicon is empty")
      require(terms.forall(_.nonEmpty), "lexicon contains an empty term")
      require(terms.distinct.length == terms.length,
        "lexicon contains duplicate terms")
      val gotoM = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
      val ownOut = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
      terms.zipWithIndex.foreach { case (t, id) =>
        var s = 0
        t.foreach { c =>
          s = gotoM(s).getOrElseUpdate(c, {
            gotoM += mutable.Map.empty[Char, Int]
            ownOut += mutable.ArrayBuffer.empty[Int]
            gotoM.length - 1
          })
        }
        ownOut(s) += id
      }
      val n = gotoM.length
      val fail = new Array[Int](n)
      val out = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
      for (s <- 0 until n) out(s) ++= ownOut(s)
      val queue = mutable.Queue.empty[Int]
      gotoM(0).values.foreach { s => fail(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val s = queue.dequeue()
        gotoM(s).foreach { case (c, t) =>
          var f = fail(s)
          while (f != 0 && !gotoM(f).contains(c)) f = fail(f)
          fail(t) = gotoM(f).get(c).filter(_ != t).getOrElse(0)
          out(t) ++= out(fail(t)) // flatten the dict-suffix chain
          queue += t
        }
      }
      new Automaton(terms, gotoM.map(_.toMap).toArray, fail,
        out.map(_.toArray.sorted).toArray)
    }
  }

  /** JVM-wide automaton cache: task closures deserialize per task, so a
    * closure-local lazy would rebuild per task — this keys the built
    * automaton on the term list and builds once per executor JVM. Bounded
    * by the number of distinct lexicons in flight (config-sized). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Automaton]()
  /** The key is NUL-joined on the driver (terms may not contain NUL —
    * enforced here) so the per-row probe costs one cached String
    * hashCode, not an O(lexicon) sequence rehash. */
  private def cacheKey(terms: IndexedSeq[String]): String = {
    require(terms.forall(!_.contains('\u0000')),
      "lexicon terms may not contain NUL")
    terms.mkString("\u0000")
  }
  private def cached(key: String, terms: IndexedSeq[String]): Automaton =
    cache.computeIfAbsent(key, _ => Automaton.build(terms))

  /** Per-document match vector: appends `matched_terms` (ascending
    * distinct array of lexicon terms present) and `n_hits` (total match
    * positions across all terms). One corpus pass; the automaton builds
    * once per executor JVM via the static cache. */
  def tag(df: DataFrame, text: Column, lexicon: Seq[String]): DataFrame = {
    val termList = lexicon.toIndexedSeq
    val key = cacheKey(termList)
    def auto = cached(key, termList)
    val f = udf { (s: String) =>
      if (s == null) (Array.empty[String], 0L)
      else {
        val c = auto.countAll(s)
        val hit = mutable.ArrayBuffer.empty[String]
        var tot = 0L
        var i = 0
        while (i < c.length) {
          if (c(i) > 0) { hit += auto.term(i); tot += c(i) }
          i += 1
        }
        (hit.sorted.toArray, tot)
      }
    }
    df.withColumn("__lex", f(text))
      .withColumn("matched_terms", col("__lex._1"))
      .withColumn("n_hits", col("__lex._2"))
      .drop("__lex")
  }

  /** Lexicon hit accounting: per term, the number of documents containing
    * it and the total occurrence count — the review table behind a
    * blocklist threshold decision. One corpus pass + one term-keyed
    * aggregation (output is lexicon-sized). */
  def termStats(df: DataFrame, text: Column, lexicon: Seq[String]): DataFrame = {
    val termList = lexicon.toIndexedSeq
    val key = cacheKey(termList)
    def auto = cached(key, termList)
    val f = udf { (s: String) =>
      if (s == null) Array.empty[(String, Int)]
      else {
        val c = auto.countAll(s)
        val out = mutable.ArrayBuffer.empty[(String, Int)]
        var i = 0
        while (i < c.length) {
          if (c(i) > 0) out += ((auto.term(i), c(i)))
          i += 1
        }
        out.toArray
      }
    }
    df.select(explode(f(text)).as("m"))
      .select(col("m._1").as("term"), col("m._2").as("occ"))
      .groupBy("term")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("occ").cast(LongType)).as("n_occ"))
  }
}
