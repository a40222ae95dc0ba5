package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpecBase {

  private def one(colv: org.apache.spark.sql.Column, text: String): Any = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(colv).collect().head.get(0)
  }

  test("tokenize + shingles: counts and short-doc guard") {
    assert(one(TextOps.tokenCount(col("text")), "a b  c") === 3L)
    assert(one(size(TextOps.shingles(col("text"), 3)), "a b c d") === 2)
    assert(one(size(TextOps.shingles(col("text"), 3)), "a b") === 0)
    assert(one(TextOps.shingles(col("text"), 2), "a b c") ===
      Seq("a b", "b c"))
  }

  test("fingerprint: rolling-hash reference value") {
    // h0=0; t1="ab": 97*31+2=3009; t2="cde": 99*31+3=3072
    // h1 = 3009; h2 = (3009*131 + 3072) % 1000000007 = 397251
    assert(one(TextOps.fingerprint(col("text")), "ab cde") === 397251L)
  }

  test("languageId: deterministic argmax with priority tie-break") {
    assert(one(TextOps.languageId(col("text")), "the cat and dog") === "en")
    assert(one(TextOps.languageId(col("text")), "el gato que y") === "es")
    assert(one(TextOps.languageId(col("text")), "zzz qqq") === "und")
    // 'la' is in both es and fr lists: single hit each -> es wins by priority
    assert(one(TextOps.languageId(col("text")), "la xxx") === "es")
  }

  test("WelfordVariance typed Aggregator matches the built-in var_samp") {
    val s = spark
    import s.implicits._
    val e = graft.core.Tables.load(s, sfDir, "events")
    val vs = udaf(WelfordVariance)
    val out = e.groupBy("event_type")
      .agg(vs(col("value")).as("welford"), var_samp(col("value")).as("builtin"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) / r.getDouble(2) < 1e-9,
        s"variance mismatch for ${r.getString(0)}")
    }
  }

  test("qualityScore stays in [0,1]") {
    for (t <- Seq("a", "the a of to and in is on for", ("w " * 100).trim))
      assert({ val q = one(TextOps.qualityScore(col("text")), t).asInstanceOf[Double]
        q >= 0.0 && q <= 1.0 })
  }

  test("token-array langid/hitCount variants agree with the text forms") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .withColumn("toks", split(col("text"), "\\s+"))
    val mismatch = docs.filter(
      TextOps.languageIdToks(col("toks")) =!= TextOps.languageId(col("text")) ||
        TextOps.hitCountToks(col("toks"), TextOps.stopwords("en")) =!=
          TextOps.hitCount(col("text"), TextOps.stopwords("en"))).count()
    assert(mismatch === 0L)
  }

  test("langid margin pieces: tie surfaces as equal top-two hits") {
    // 'de la' hits es (la) and fr (la)... use explicit tie: en 'the' + es 'el'
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row("the el")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .withColumn("toks", split(col("text"), "\\s+"))
    val sorted = df.select(sort_array(array(
        Seq("en", "es", "de", "fr").map(l =>
          TextOps.hitCountToks(col("toks"), TextOps.stopwords(l))): _*),
      asc = false).as("sh")).collect().head.getSeq[Long](0)
    assert(sorted.take(2) === Seq(1L, 1L), "en and es tie at one hit each")
  }

  private def str1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      s: String): String = {
    val r = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(s)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType))))
      .select(f(col("t")).as("r")).collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("urlHost: scheme + userinfo + port/path/query boundaries; non-URLs are NULL") {
    assert(str1(TextOps.urlHost, "https://Example.COM/path?q=1") === "example.com")
    assert(str1(TextOps.urlHost, "HTTP://Example.com/x") === "example.com",
      "RFC 3986 schemes are case-insensitive")
    assert(str1(TextOps.urlHost, "http://user:pw@Sub.Host.org:8080/x") === "sub.host.org")
    assert(str1(TextOps.urlHost, "ftp://files.example.net") === "files.example.net")
    assert(str1(TextOps.urlHost, "not a url") === null)
    assert(str1(TextOps.urlHost, "mailto:a@b.com") === null)
    assert(str1(TextOps.urlHost, "https://host.com#frag") === "host.com")
  }

  test("sentences: terminator runs attach, empties drop, unterminated tail kept") {
    def sents(s: String): Seq[String] = {
      val r = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(s)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.StringType))))
        .select(TextOps.sentences(col("t")).as("r")).collect().head
      r.getSeq[String](0)
    }
    assert(sents("One two. Three four! Five") === Seq("One two.", "Three four!", "Five"))
    assert(sents("Wait... really?! yes") === Seq("Wait...", "really?!", "yes"))
    assert(sents("no terminator at all") === Seq("no terminator at all"))
    assert(sents("...") === Seq.empty,
      "terminators with no content yield no sentences")
  }

  test("syllableCount: vowel groups, case-folded, y counts") {
    // strength → "e" (1); idea → "i","ea" (2); The quick sky → e, ui, y (3)
    assert(one(TextOps.syllableCount(col("text")), "strength") === 1L)
    assert(one(TextOps.syllableCount(col("text")), "idea") === 2L)
    assert(one(TextOps.syllableCount(col("text")), "The quick sky.") === 3L)
    assert(one(TextOps.syllableCount(col("text")), "zzz") === 0L)
    assert(one(TextOps.syllableCount(col("text")), "") === 0L)
  }

  test("fleschReadingEase: hand-computed score; degenerate docs are NULL") {
    def flesch(t: String): Any = {
      val s = spark
      import s.implicits._
      Seq(t).toDF("text")
        .select(col("text"), TextOps.tokenize(col("text")).as("toks"),
          TextOps.sentences(col("text")).as("sents"))
        .select(TextOps.fleschReadingEase(col("text"), col("sents"), col("toks")))
        .collect().head.get(0)
    }
    // words 3, sentences 1, syllables 3: 206.835 − 1.015·3 − 84.6·1 = 119.19
    assert(flesch("The cat sat.") === 119.19)
    assert(flesch("...") === null, "zero sentences must surface NULL, not an error")
  }

  test("scriptCount/scriptsPresent: per-block letter counts and the mixed-script flag") {
    val s = spark; import s.implicits._
    val rows = Seq(
      (1L, "plain ascii words"),
      (2L, "Mixed with кириллица inside"),   // the homoglyph shape
      (3L, "γειά σου 你好"),                  // greek + cjk, no latin
      (4L, "مرحبا"),                          // arabic only
      (5L, "1234 ... !!")                     // no letters at all
    ).toDF("id", "t")
    val got = rows.select($"id",
        TextOps.scriptCount($"t", "latin").as("lat"),
        TextOps.scriptCount($"t", "cyrillic").as("cyr"),
        TextOps.scriptCount($"t", "greek").as("grk"),
        TextOps.scriptCount($"t", "cjk").as("cjk"),
        TextOps.scriptCount($"t", "arabic").as("ara"),
        TextOps.scriptsPresent($"t").as("np"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) === ((15L, 0L, 0L, 0L, 0L, 1L)))
    assert(got(2L)._2 === 9L && got(2L)._6 === 2L, "latin + cyrillic = mixed")
    assert(got(3L) === ((0L, 0L, 7L, 2L, 0L, 2L)))
    assert(got(4L) === ((0L, 0L, 0L, 0L, 5L, 1L)))
    assert(got(5L) === ((0L, 0L, 0L, 0L, 0L, 0L)))
    intercept[IllegalArgumentException](TextOps.scriptCount($"t", "klingon"))
  }

  test("codeScore: code saturates high, prose reads ~0, empty is 0") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      "def run(x) { return x + 1; } val y = f(x);",
      "the quick brown fox jumps over the lazy dog again and again",
      "",
      "x = 1; y = 2; if else for while"
    ).toDF("text")
    val out = df.select(TextOps.codeScore(col("text")).as("s")).collect()
      .map(_.getDouble(0))
    assert(out(0) === 1.0, "dense code saturates both signals")
    assert(out(1) === 0.0, "symbol-free prose with no keywords")
    assert(out(2) === 0.0, "empty text")
    assert(out(3) > 0.5, s"mixed snippet should cross the gate: ${out(3)}")
  }
}
