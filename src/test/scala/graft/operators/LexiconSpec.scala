package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LexiconSpec extends SparkSpecBase {

  test("automaton finds all occurrences of all terms in one pass") {
    val a = Lexicon.Automaton.build(Seq("he", "she", "his", "hers"))
    // the canonical Aho-Corasick example: "ushers" contains she, he, hers
    val c = a.countAll("ushers")
    val byTerm = (0 until a.nTerms).map(i => a.term(i) -> c(i)).toMap
    assert(byTerm === Map("he" -> 1, "she" -> 1, "his" -> 0, "hers" -> 1))
  }

  test("occurrence counts are per match position, including overlaps") {
    val a = Lexicon.Automaton.build(Seq("ana"))
    assert(a.countAll("banana")(0) === 2) // overlapping: positions 1 and 3
    val b = Lexicon.Automaton.build(Seq("aa"))
    assert(b.countAll("aaaa")(0) === 3)
    // border-free terms cannot overlap themselves: count == non-overlapping
    val g = Lexicon.Automaton.build(Seq("gold"))
    assert(g.countAll("goldgoldgold")(0) === 3)
  }

  test("automaton counts equal the naive per-term scan on random text") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    val terms = Seq("a", "ab", "abc", "bca", "cc", "bb", "cab")
    val a = Lexicon.Automaton.build(terms)
    def naive(text: String, t: String): Int =
      (0 to text.length - t.length).count(i => text.regionMatches(i, t, 0, t.length))
    for (_ <- 1 to 200) {
      val text = Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(3))).mkString
      val got = a.countAll(text)
      for (i <- terms.indices)
        assert(got(i) === naive(text, terms(i)), s"term=${terms(i)} text=$text")
    }
  }

  test("build rejects empty lexicons, empty terms, and duplicates") {
    intercept[IllegalArgumentException](Lexicon.Automaton.build(Nil))
    intercept[IllegalArgumentException](Lexicon.Automaton.build(Seq("a", "")))
    intercept[IllegalArgumentException](Lexicon.Automaton.build(Seq("a", "a")))
  }

  test("tag appends matched_terms (sorted) and n_hits; null text matches nothing") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the gold ring and the gold gear"),
      (2L, "nothing here"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val out = Lexicon.tag(df, col("text"), Seq("gold", "ring", "silver"))
      .orderBy("id").collect()
    assert(out(0).getSeq[String](2) === Seq("gold", "ring"))
    assert(out(0).getLong(3) === 3L) // gold twice + ring once
    assert(out(1).getSeq[String](2) === Seq.empty)
    assert(out(1).getLong(3) === 0L)
    assert(out(2).getSeq[String](2) === Seq.empty)
  }

  test("termStats aggregates docs and occurrences per term") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "gold gold silver", "gold", "copper", "").toDF("text")
    val out = Lexicon.termStats(df, col("text"), Seq("gold", "silver", "tin"))
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("gold", 2L, 3L), ("silver", 1L, 1L)))
  }

  test("lexicon terms may not contain NUL (the cache-key separator)") {
    val s = spark
    import s.implicits._
    val df = Seq("x").toDF("text")
    intercept[IllegalArgumentException](
      Lexicon.tag(df, col("text"), Seq("a\u0000b")))
  }
}
