package graft.operators

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Contracts of the deterministic samplers: reproducibility, nesting,
  * salt decorrelation, stratified rates, and total/disjoint splits. */
class SamplingSpec extends SparkSpecBase {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("deterministicSample is reproducible and nested across fractions") {
    val s10a = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s10b = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s30 = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10a === s10b)                 // same run-to-run
    assert(s10a.subsetOf(s30))            // smaller fraction nests in larger
    assert(s10a.nonEmpty && s30.size > s10a.size)
  }

  test("sampled fraction is near the requested rate (hash uniformity)") {
    val n = docs.count().toDouble
    val kept = Sampling.deterministicSample(docs, "doc_id", 0.5).count().toDouble
    // 500 ids, p=0.5: 3-sigma binomial band is ±~0.067
    assert(math.abs(kept / n - 0.5) < 0.1, s"kept ${kept / n}")
  }

  test("a different salt draws an (almost surely) different sample") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.2, salt = "a")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 0.2, salt = "b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== b)
  }

  test("stratifiedSample applies each stratum's rate and the default") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), defaultFraction = 0.5)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === totals("en"))       // rate 1.0 keeps everything
    assert(!byLang.contains("de"))              // rate 0.0 keeps nothing
    val restKept = (byLang - "en").values.sum.toDouble
    val restAll = (totals - "en" - "de").values.sum.toDouble
    assert(math.abs(restKept / restAll - 0.5) < 0.15)
    // per-stratum selection ≡ the plain sampler filtered to that stratum
    val enOnly = Sampling.deterministicSample(
      docs.where(col("lang") === "en"), "doc_id", 1.0)
    assert(sampled.where(col("lang") === "en").count() === enOnly.count())
  }

  test("withSplit assigns every row to exactly one split, near its weight") {
    val split = Sampling.withSplit(docs, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert(split.count() === docs.count())      // total: nothing dropped
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    val n = docs.count().toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.1)
    // deterministic: re-running yields the identical assignment
    val again = Sampling.withSplit(docs, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert(split.except(again).isEmpty && again.except(split).isEmpty)
  }

  test("splitByGroup: cluster members land in the same split; singletons match id-keyed") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: (1,2,3) share label 1, (10,11) share label 10, rest absent
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val split = Sampling.splitByGroup(df, groups, salt = "s1")
    assert(split.count() === 200L)
    val m = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === m(2L) && m(2L) === m(3L), "cluster must not straddle splits")
    assert(m(10L) === m(11L))
    // absent rows fall back to their own id — identical to a row whose
    // group frame lists it as a singleton (label = own id, the
    // dedupClusters min-member labeling)
    val withSingleton = Sampling.splitByGroup(
      df, groups.union(Seq((42L, 42L)).toDF("doc_id", "cluster_id")), salt = "s1")
    val m2 = withSingleton.collect()
      .map(r => (r.getLong(0), r.getString(r.fieldIndex("split")))).toMap
    assert(m2 === m, "listing a singleton explicitly must change nothing")
  }

  test("mixturePlan: alpha=1 shares proportional; cap binds small stratum; budget conserved when uncapped") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(90)(i => ("big", 100L, i.toLong)) ++
      Seq.tabulate(10)(i => ("small", 100L, (1000 + i).toLong)) match {
      case rows => rows.toDF("source", "ntok", "id")
    }
    // alpha=1: shares are 0.9/0.1 exactly; budget 20000 => small's target
    // 2000 exceeds 1 epoch (1000 tokens) but not maxEpochs=4
    val plan = Sampling.mixturePlan(df, "source", col("ntok"),
        alpha = 1.0, budget = 20000L, maxEpochs = 4.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(plan("big").getDouble(2) === 0.9 && plan("small").getDouble(2) === 0.1)
    assert(plan("big").getLong(3) === 18000L && plan("small").getLong(3) === 2000L)
    assert(plan("small").getLong(4) === 2000L)         // uncapped at 4 epochs
    assert(plan("small").getDouble(5) === 2.0)         // 2 epochs of repetition
    assert(plan.values.map(_.getLong(6)).sum === 0L)   // no shortfall
    // tighter cap: 1.5 epochs binds the small stratum, shortfall surfaces
    val capped = Sampling.mixturePlan(df, "source", col("ntok"),
        alpha = 1.0, budget = 20000L, maxEpochs = 1.5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(capped("small").getLong(4) === 1500L)
    assert(capped("small").getDouble(5) === 1.5)
    assert(capped("small").getLong(6) === 500L)
    // alpha=0 equalizes shares regardless of mass
    val eq = Sampling.mixturePlan(df, "source", col("ntok"),
        alpha = 0.0, budget = 20000L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(eq("big") === 0.5 && eq("small") === 0.5)
  }

  test("materializeEpochs: whole copies exact, fractional copies near rate, unplanned strata dropped") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).map(i =>
      (if (i <= 500) "a" else "b", i)).toDF("source", "doc_id")
    val plan = Seq(("a", 2.0), ("b", 1.3)).toDF("source", "epochs")
    val out = Sampling.materializeEpochs(df, plan, salt = "e1")
    val byDoc = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 500L).forall(byDoc(_) === 2L), "integral epochs: exactly 2 copies")
    assert((501L to 1000L).forall(i => byDoc(i) == 1L || byDoc(i) == 2L))
    val extras = (501L to 1000L).count(byDoc(_) == 2L)
    assert(math.abs(extras / 500.0 - 0.3) < 0.08,
      s"fractional epoch rate $extras/500 far from 0.3")
    // epoch index is 1..copies — loaders can interleave epochs
    val epochs = out.filter(col("doc_id") === 1L).select("epoch").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(epochs === Seq(1L, 2L))
    // a stratum absent from the plan emits nothing
    val partial = Sampling.materializeEpochs(df,
      Seq(("a", 1.0)).toDF("source", "epochs"), salt = "e1")
    assert(partial.filter(col("source") === "b").count() === 0L)
    assert(partial.count() === 500L)
    // deterministic: same salt, same corpus
    val again = Sampling.materializeEpochs(df, plan, salt = "e1")
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("tokenBudgetSample lands near each budget and spares the rest") {
    val w = size(split(col("text"), "\\s+"))
    val totals = docs.groupBy("lang").agg(sum(w).cast("long").as("tw")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val lang = totals.keys.head
    val budget = totals(lang) / 3
    val kept = Sampling.tokenBudgetSample(docs, "doc_id", "lang", w,
      Map(lang -> budget), salt = "t")
    val keptTok = kept.groupBy("lang").agg(sum(w).cast("long").as("kw")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // budgeted stratum: within ±60% of target (small-N binomial slack)
    assert(math.abs(keptTok(lang).toDouble / budget - 1.0) < 0.6,
      s"$lang kept ${keptTok(lang)} vs budget $budget")
    // unbudgeted strata pass through untouched
    (totals.keySet - lang).foreach(l => assert(keptTok(l) === totals(l), l))
    // over-budget means keep-all
    val keptAll = Sampling.tokenBudgetSample(docs, "doc_id", "lang", w,
      Map(lang -> totals(lang) * 10), salt = "t")
    assert(keptAll.count() === docs.count())
    // deterministic run-to-run
    val again = Sampling.tokenBudgetSample(docs, "doc_id", "lang", w,
      Map(lang -> budget), salt = "t")
    assert(kept.select("doc_id").except(again.select("doc_id")).isEmpty)
    assert(again.select("doc_id").except(kept.select("doc_id")).isEmpty)
  }

  test("withSplit assigns NULL (not the last split) to null ids") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (2L, "c"))
      .toDF("doc_id", "text")
    val out = Sampling.withSplit(df, "doc_id",
        Seq(("train", 0.9), ("test", 0.1))).collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) -> r.getString(2)).toMap
    assert(out(Some(1L)) != null && out(Some(2L)) != null)
    assert(out(None) === null,
      "a row with no identity has no deterministic split — never default it into the eval set")
  }

  test("weightedSample: deterministic, k per group, zero/null weights dropped") {
    val s = spark
    import s.implicits._
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    def run() = Sampling.weightedSample(docs, "doc_id", "n_chars",
        k = 3, groupCols = Seq("source"), salt = "w1")
      .select("source", "doc_id", "es_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val a = run()
    assert(a === run(), "same inputs and salt must select the same set")
    a.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.size <= 3, s"quota exceeded for $src")
      assert(rows.map(_._3) === (1L to rows.size).toSet, s"ranks not 1..k for $src")
    }
    val weighted = Seq((1L, "a", 10L), (2L, "a", 0L), (3L, "a", -5L),
        (4L, null.asInstanceOf[String], 7L))
      .toDF("doc_id", "src", "w")
    val kept = Sampling.weightedSample(weighted, "doc_id", "w", k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L), "non-positive weights carry no sampling mass")
  }

  test("weightedSample: equal weights reduce to the unweighted hash order") {
    val s = spark
    import s.implicits._
    val df = (0L until 200L).map(i => (i, 1L)).toDF("doc_id", "w")
    val es = Sampling.weightedSample(df, "doc_id", "w", k = 5, salt = "eq")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // with w constant, ln(u)/w is monotone in u: the winners must be the
    // k largest buckets (ties impossible here: 200 ids over 10000 buckets
    // collide rarely, and the id tie-break makes even that deterministic)
    val byBucket = df.select(col("doc_id"),
        Sampling.bucket(col("doc_id"), "eq").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, b) => (-b, id) }.take(5).map(_._1).toSet
    assert(es === byBucket)
  }

  test("weightedSample: heavier rows are selected more often across salts") {
    val s = spark
    import s.implicits._
    // two populations with 10x weight ratio; count selections over many
    // independent salts — the heavy population must dominate
    val df = (0L until 100L).map(i => (i, if (i < 50) 100L else 10L))
      .toDF("doc_id", "w")
    val wins = (0 until 20).flatMap { r =>
      Sampling.weightedSample(df, "doc_id", "w", k = 10, salt = s"s$r")
        .select("doc_id").collect().map(_.getLong(0))
    }
    val heavy = wins.count(_ < 50)
    assert(heavy > wins.size / 2,
      s"10x-weighted rows won only $heavy/${wins.size} slots")
  }

  test("temperatureRates: alpha=1 is one uniform rate, alpha=0 equalizes expected mass") {
    val mass = Map("en" -> 8000L, "de" -> 1600L, "sw" -> 400L)
    val budget = 1000L
    val a1 = Sampling.temperatureRates(mass, alpha = 1.0, budget)
    // natural proportions: every stratum keeps the same fraction
    assert(a1.values.map(v => math.round(v * 1e9)).toSet.size === 1)
    assert(math.abs(a1("en") - budget.toDouble / mass.values.sum) < 1e-12)
    val a0 = Sampling.temperatureRates(mass, alpha = 0.0, budget)
    // equal expected mass per stratum: rate_d * mass_d constant (uncapped)
    val kept0 = a0.map { case (d, r) => r * mass(d) }
    assert(kept0.forall(k => math.abs(k - kept0.head) < 1e-9))
    // intermediate alpha up-weights the tail monotonically
    val a5 = Sampling.temperatureRates(mass, alpha = 0.5, budget)
    assert(a5("sw") > a1("sw") && a5("sw") < a0("sw"))
    assert(a5("en") < a1("en") * 1.5 && a5("en") > 0)
    // caps: a tiny stratum under alpha=0 cannot exceed rate 1
    val tiny = Sampling.temperatureRates(Map("big" -> 100000L, "tiny" -> 3L),
      alpha = 0.0, budget = 1000L)
    assert(tiny("tiny") === 1.0)
  }

  test("shuffleShards: total partition, contiguous 1-based positions per shard") {
    val n = docs.count()
    val out = Sampling.shuffleShards(docs, "doc_id", nShards = 8, salt = "v1")
      .select("doc_id", "shard", "pos")
    assert(out.count() === n, "every row lands in exactly one shard")
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"),
        countDistinct("pos").as("d"), min("pos").as("mn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(perShard.forall(_._5 === 1L), "pos starts at 1")
    assert(perShard.forall(t => t._3 === t._2), "pos is contiguous (max == count)")
    assert(perShard.forall(t => t._4 === t._2), "pos is unique (distinct == count)")
    val shards = perShard.map(_._1)
    assert(shards.forall(s => s >= 0 && s < 8))
    assert(shards.length > 1, "500 ids must spread over multiple shards")
  }

  test("shuffleShards: groupCols shard within each group, positions restart per (group, shard)") {
    val out = Sampling.shuffleShards(docs, "doc_id", nShards = 4, salt = "g",
      groupCols = Seq("lang"))
    val bad = out.groupBy("lang", "shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= lit(1L)).count()
    assert(bad === 0L, "every (lang, shard) must hold contiguous 1-based positions")
  }

  test("shuffleShards: layout is deterministic, partition-invariant, salt-rerolled") {
    def layout(df: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.shuffleShards(df, "doc_id", nShards = 8, salt = salt)
        .select("doc_id", "shard", "pos").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val a = layout(docs, "v1")
    assert(layout(docs.repartition(13), "v1") === a,
      "same layout at any parallelism")
    assert(layout(docs, "v2") !== a, "salt rerolls the permutation")
    // shard ordering is by a hash DECORRELATED from the id: within some
    // shard, positions must not simply follow doc_id order
    val byShard = a.toSeq.groupBy(_._2._1)
    assert(byShard.exists { case (_, rows) =>
      val inPosOrder = rows.sortBy(_._2._2).map(_._1)
      inPosOrder !== inPosOrder.sorted
    }, "shard order must not be id order")
  }

  test("invalid configurations fail fast") {
    intercept[IllegalArgumentException] {
      Sampling.deterministicSample(docs, "doc_id", 1.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSample(docs, "doc_id", "lang",
        size(split(col("text"), "\\s+")), Map.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.withSplit(docs, "doc_id", Seq(("a", 0.5), ("b", 0.4)))
    }
    intercept[IllegalArgumentException] {
      Sampling.withSplit(docs, "doc_id", Seq(("a", 0.5), ("a", 0.5)))
    }
  }

  test("budgetByQuality: best-first prefix admission, last doc may overshoot") {
    val s2 = spark; import s2.implicits._
    // qualities (by construction of the score): longer + stopword-mixed
    // docs score higher; verify semantics structurally instead of
    // hand-computing the score — keep set must be a prefix of the
    // quality-desc order, and cum_before must be its exclusive prefix sum
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val rows = Sampling.budgetByQuality(docs, tokenBudget = 800L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(0), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      val ordered = g.sortBy(t => (-t._3, t._4)) // quality desc, id
      var run = 0L
      ordered.foreach { case (_, nt, _, id, cumBefore, kept) =>
        assert(cumBefore === run, s"source $src doc $id cum_before")
        assert(kept === (run < 800L), s"source $src doc $id kept flag")
        run += nt
      }
      val keptFlags = ordered.map(_._6)
      assert(!keptFlags.dropWhile(identity).contains(true),
        s"source $src keep set must be a prefix of the quality order")
      assert(keptFlags.head, "best doc is always admitted (budget > 0)")
    }
  }

  private val sess = spark
  import sess.implicits._

  test("negativePairs: never self, never same group, at most k per anchor") {
    val docs = (0L until 40L).map(i => (i, s"src${i % 4}")).toSeq.toDF("doc_id", "source")
    val out = Sampling.negativePairs(docs, "doc_id", k = 3, nBuckets = 8,
      groupCol = "source", salt = "s1")
    val rows = out.as[(Long, Int, Long)].collect()
    val grp = (0L until 40L).map(i => i -> s"src${i % 4}").toMap
    rows.foreach { case (aid, draw, nid) =>
      assert(nid !== aid, s"anchor $aid drew itself")
      assert(grp(nid) !== grp(aid), s"anchor $aid drew same-group $nid")
      assert(draw >= 1 && draw <= 3)
    }
    val perAnchor = rows.groupBy(_._1).view.mapValues(_.length)
    assert(perAnchor.values.forall(_ <= 3))
    assert(perAnchor.size === 40, "every anchor draws (occupied buckets)")
  }

  test("negativePairs: deterministic and partition-invariant; salt rerolls") {
    val docs = (0L until 64L).map(i => (i, s"g${i % 3}")).toSeq.toDF("doc_id", "source")
    def run(parts: Int, salt: String) =
      Sampling.negativePairs(docs.repartition(parts), "doc_id", k = 2,
          nBuckets = 16, groupCol = "source", salt = salt)
        .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val a = run(2, "x"); val b = run(7, "x"); val c = run(2, "y")
    assert(a === b, "layout must not depend on partitioning")
    assert(a !== c, "salt must reroll the draw")
  }

  test("negativePairs: negatives are DISTINCT per anchor; collided draws drop") {
    // tiny bucket space forces same-bucket routing collisions across draws
    val docs = (0L until 12L).map(i => (i, s"g${i % 2}")).toSeq.toDF("doc_id", "source")
    val rows = Sampling.negativePairs(docs, "doc_id", k = 6, nBuckets = 2,
        groupCol = "source", salt = "dup")
      .as[(Long, Int, Long)].collect()
    rows.groupBy(_._1).foreach { case (aid, draws) =>
      val negs = draws.map(_._3)
      assert(negs.distinct.length === negs.length,
        s"anchor $aid drew a duplicate negative: ${draws.toSeq.sortBy(_._2)}")
    }
    // with 2 buckets and 6 draws, collisions are certain: some draw
    // indices must have dropped (fewer than k rows for some anchor)
    assert(rows.groupBy(_._1).values.exists(_.length < 6),
      "expected at least one collided draw to drop under forced collisions")
  }

  test("negativePairs: a bucket with only same-group members yields no row for that draw") {
    // group g0 = ids 0..7, g1 = ids 8..9; with ONE bucket every draw sees
    // the whole corpus, so all draws fill; with the corpus all one group,
    // no draw can ever fill
    val docs = (0L until 10L).map(i => (i, "same")).toSeq.toDF("doc_id", "source")
    val out = Sampling.negativePairs(docs, "doc_id", k = 2, nBuckets = 1,
      groupCol = "source", salt = "s")
    assert(out.count() === 0L, "single-group corpus has no valid negatives")
  }

  test("avalancheExtend: staged key fold + suffix ≡ whole-string avalanche; non-ASCII rejected") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(19)
    val keys = (1 to 200).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(20) + 1).mkString) :+ "" :+ "señor"
    val suffixes = Seq("#0", "amsv1#13", "", "x")
    suffixes.foreach { suf =>
      val df = keys.toDF("k").select(
        Sampling.avalanche(col("k"), suf).as("whole"),
        Sampling.avalancheExtend(Sampling.polyFold(col("k")), suf).as("ext"))
      assert(df.where(col("whole") =!= col("ext")).count() === 0L,
        s"identity must hold for suffix '$suf' (incl. non-ASCII KEYS)")
    }
    intercept[IllegalArgumentException] {
      Sampling.avalancheExtend(Sampling.polyFold(col("k")), "é")
    }
  }

  test("scaledBuckets: the count-conditional rule — floor 64, then n/8, capped") {
    assert(Sampling.scaledBuckets(0L) === 64)
    assert(Sampling.scaledBuckets(500L) === 64, "n/8 below the floor keeps the floor")
    assert(Sampling.scaledBuckets(512L) === 64)
    assert(Sampling.scaledBuckets(520L) === 65, "above the floor, exactly n/8")
    assert(Sampling.scaledBuckets(5000L) === 625)
    assert(Sampling.scaledBuckets(Long.MaxValue) === Int.MaxValue, "Int overflow capped")
    assert(Sampling.scaledBuckets(100L, minBuckets = 4, targetOccupancy = 10) === 10)
  }

  test("negativePairsAuto: equals negativePairs at the derived bucket count; deterministic") {
    val docs = (0L until 600L).map(i => (i, s"g${i % 3}")).toSeq.toDF("doc_id", "source")
    val auto = Sampling.negativePairsAuto(docs, "doc_id", k = 2,
        groupCol = "source", salt = "a")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // 600/8 = 75 buckets — the rule the oracle replays from COUNT(*)
    val pinned = Sampling.negativePairs(docs, "doc_id", k = 2, nBuckets = 75,
        groupCol = "source", salt = "a")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(auto === pinned, "auto must equal the explicit derived geometry")
    val rerun = Sampling.negativePairsAuto(docs.repartition(5), "doc_id", k = 2,
        groupCol = "source", salt = "a")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rerun === auto, "derived-bucket draw is partition-invariant run-over-run")
  }

  test("neymanAllocation: hand-computed weights, caps, and degenerate strata") {
    // A: 4 rows, sd(1,1,9,9) = sqrt((4*164-400)/(4*3)) = sqrt(256/12)
    // B: 4 rows of the same value: S = 0 -> weight 0
    // C: 1 row: no variance evidence -> S = 0
    val rows = Seq(
      ("A", 1.0), ("A", 1.0), ("A", 9.0), ("A", 9.0),
      ("B", 5.0), ("B", 5.0), ("B", 5.0), ("B", 5.0),
      ("C", 7.0)).toDF("stratum", "v")
    val got = Sampling.neymanAllocation(rows, "stratum", $"v", budget = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val sdA = math.sqrt((4.0 * 1640000.0 - 2000.0 * 2000.0) / (4.0 * 3.0)) / 100.0
    assert(math.abs(got("A")._2 - sdA) < 1e-6, s"stddev A: ${got("A")._2} vs $sdA")
    assert(got("A")._3 === 1.0 && got("A")._4 === 4L,
      "all weight concentrates on the only varying stratum, capped at N_h")
    assert(got("B") === ((4L, 0.0, 0.0, 0L)), "uniform stratum earns nothing")
    assert(got("C") === ((1L, 0.0, 0.0, 0L)), "singleton stratum earns nothing")
  }

  test("neymanAllocation: proportional to N_h*S_h; all-uniform corpus allocates zero") {
    // two strata, same spread, different sizes: share ratio = size ratio
    val rows = ((1 to 30).map(i => ("big", if (i % 2 == 0) 0.0 else 10.0)) ++
      (1 to 10).map(i => ("small", if (i % 2 == 0) 0.0 else 10.0)))
      .toDF("stratum", "v")
    val got = Sampling.neymanAllocation(rows, "stratum", $"v", budget = 40L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // sample (not population) sd: ratio = 3 * sqrt(30/29) / sqrt(10/9)
    val want = 3.0 * math.sqrt(30.0 / 29.0) / math.sqrt(10.0 / 9.0)
    assert(math.abs(got("big") / got("small") - want) < 0.01,
      s"equal-spread strata split by N_h*S_h: $got vs ratio $want")
    val flat = Seq(("x", 1.0), ("x", 1.0), ("y", 2.0), ("y", 2.0))
      .toDF("stratum", "v")
    val z = Sampling.neymanAllocation(flat, "stratum", $"v", budget = 10L)
      .collect().map(r => (r.getDouble(3), r.getLong(4)))
    assert(z.forall(_ == ((0.0, 0L))), "zero total weight allocates nothing")
  }

  test("fairInterleave: (round, stratum) order visits each stratum once per round") {
    val sp = spark
    import sp.implicits._
    // uneven strata: a=5 rows, b=3, c=1
    val rows = (1 to 5).map(i => (i.toLong, "a")) ++
      (6 to 8).map(i => (i.toLong, "b")) :+ ((9L, "c"))
    val out = Sampling.fairInterleave(rows.toDF("id", "src"), "id", "src")
      .orderBy("round", "src").collect()
      .map(r => (r.getAs[Long]("round"), r.getString(1)))
    // round 1 visits all three strata, round 4+ only the survivor
    val byRound = out.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byRound(1L).sorted === Seq("a", "b", "c"))
    assert(byRound(3L).sorted === Seq("a", "b"))
    assert(byRound(4L) === Seq("a"))
    byRound.values.foreach(srcs =>
      assert(srcs.distinct.size === srcs.size, "one row per stratum per round"))
    // deterministic: same salt, same order
    val again = Sampling.fairInterleave(rows.reverse.toDF("id", "src"),
      "id", "src").orderBy("round", "src").collect()
      .map(r => (r.getAs[Long]("round"), r.getString(1)))
    assert(again.toSeq === out.toSeq)
  }

  test("poissonBootstrapMean equals a sequential reference; weights are Poisson(1)-shaped") {
    val s = spark
    import s.implicits._
    // threshold pin: CDF_Poisson(1)(0) = e^-1 on the [0, P) grid — a
    // platform whose exp/fold diverges fails loudly here
    assert(Sampling.PoissonOneThresholds.head === 367879444L)
    assert(Sampling.PoissonOneThresholds.size === 8)
    val n = 400
    val rows = (1 to n).map(i => (i.toLong, (i % 7) * 100L + 13L))
    val df = rows.toDF("id", "x")
    val got = Sampling.poissonBootstrapMean(df, "id", "x", replicates = 32,
      salt = "sp").collect()
    assert(got.length === 1)
    val r = got.head
    // sequential reference sharing avalancheJvm and the exact arithmetic
    val ths = Sampling.PoissonOneThresholds
    def wgt(id: Long, b: Int): Long =
      ths.count(Sampling.avalancheJvm(id.toString, "sp" + f"$b%03d") >= _).toLong
    val ms = (0 until 32).flatMap { b =>
      val sw = rows.map { case (id, _) => wgt(id, b) }.sum
      val swx = rows.map { case (id, x) => wgt(id, b) * x }.sum
      if (sw == 0) None
      else Some((b.toLong, BigDecimal.valueOf(swx.toDouble / sw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val sorted = ms.sortBy { case (b, m) => (m, b) }.map(_._2)
    val bUsed = ms.size
    val loRank = (bUsed * 5 + 199) / 200
    val mean = BigDecimal.valueOf(rows.map(_._2).sum.toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === bUsed.toLong)
    assert(r.getDouble(2) === mean)
    assert(r.getDouble(3) === sorted(loRank - 1), "boot_lo order statistic")
    assert(r.getDouble(4) === sorted(bUsed - loRank), "boot_hi order statistic")
    val s1 = ms.map(m => BigDecimal.valueOf(m._2)).sum.toDouble
    val s2 = ms.map(m => BigDecimal.valueOf(m._2 * m._2)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val se = BigDecimal.valueOf(math.sqrt(
      math.max((s2 - (s1 * s1) / bUsed) / (bUsed - 1), 0.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) === se, "se_boot from exact decimal moments")
    assert(r.getDouble(3) <= mean && mean <= r.getDouble(4),
      "the 95% CI brackets the sample mean on a well-behaved fixture")
    // weight distribution: mean ~1, P(w=0) ~ e^-1 over a big pair grid
    val ws = for (id <- 1 to 500; b <- 0 until 8) yield wgt(id.toLong, b)
    assert(math.abs(ws.sum.toDouble / ws.size - 1.0) < 0.03,
      "Poisson(1) weights must average ~1")
    val p0 = ws.count(_ == 0L).toDouble / ws.size
    assert(math.abs(p0 - math.exp(-1.0)) < 0.03, "P(w=0) must be ~e^-1")
    // partition invariance
    val again = Sampling.poissonBootstrapMean(
      rows.reverse.toDF("id", "x").repartition(13), "id", "x",
      replicates = 32, salt = "sp").collect().head
    assert(again.toSeq === r.toSeq)
  }

  test("poissonBootstrapMeanBy: per-segment equality with the global operator per slice") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(59)
    val rows = (1 to 300).map(i =>
      (s"s${i % 3}", i.toLong, rnd.nextInt(3000).toLong))
    val df = rows.toDF("seg", "id", "x")
    def runBy(d: org.apache.spark.sql.DataFrame) =
      Sampling.poissonBootstrapMeanBy(d, "seg", "id", "x",
        replicates = 16, salt = "sb").collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val got = runBy(df)
    assert(got.keySet === Set("s0", "s1", "s2"))
    Seq("s0", "s1", "s2").foreach { seg =>
      val slice = Sampling.poissonBootstrapMean(
        df.where(col("seg") === seg), "id", "x",
        replicates = 16, salt = "sb").collect().head
      assert(got(seg) === slice.toSeq, s"segment $seg equals the global op")
    }
    assert(runBy(df.repartition(11)) === got, "partition invariance")
    intercept[IllegalArgumentException](Sampling.poissonBootstrapMeanBy(
      df.select(col("seg"), col("id"), col("x").cast("double").as("x")),
      "seg", "id", "x"))
  }

  test("permutationMeanDiff: sequential reference, planted-shift power, exchangeable p=1, guards") {
    val s = spark
    import s.implicits._
    def coin(id: Long, b: Int): Boolean =
      Sampling.avalancheJvm(id.toString, "perm" + f"$b%03d") % 2L == 1L
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ref(rows: Seq[(Long, Long, Boolean)], reps: Int)
        : (Double, Long, Long) = {
      val (t, c) = rows.partition(_._3)
      val dObs = t.map(_._2).sum.toDouble / t.size -
        c.map(_._2).sum.toDouble / c.size
      val ds = (0 until reps).flatMap { b =>
        val (rt, rc) = rows.partition(r => coin(r._1, b))
        if (rt.isEmpty || rc.isEmpty) None
        else Some(rt.map(_._2).sum.toDouble / rt.size -
          rc.map(_._2).sum.toDouble / rc.size)
      }
      (dObs, ds.size.toLong, ds.count(d => math.abs(d) >= math.abs(dObs)).toLong)
    }
    // planted shift: treated units carry +500 — must separate at B=64
    val planted = (1L to 120L).map(i =>
      (i, (i % 9) * 10L + (if (i % 2 == 1) 500L else 0L), i % 2 == 1))
    val gp = Sampling.permutationMeanDiff(planted.toDF("id", "x", "g"),
      "id", "x", "g", replicates = 64).collect().head
    val (dObs, bUsed, bGe) = ref(planted, 64)
    assert(gp.getAs[Double]("delta_obs") === r6(dObs))
    assert(gp.getAs[Long]("b_used") === bUsed &&
      gp.getAs[Long]("b_ge") === bGe, "sequential hash-replay equality")
    assert(gp.getAs[Double]("p_two") ===
      r6((bGe + 1).toDouble / (bUsed + 1).toDouble))
    assert(gp.getAs[Boolean]("significant"),
      "a +500 shift on +-40 noise must reject")
    assert(gp.getAs[Boolean]("significant") === (20 * (bGe + 1) <= bUsed + 1))
    // exchangeable: both arms identical composition -> delta_obs = 0,
    // every |d_b| >= 0 -> p exactly 1, never significant
    val nullRows = (1L to 100L).map(i => (i, ((i / 2) % 5) * 7L, i % 2 == 1))
    val gn = Sampling.permutationMeanDiff(nullRows.toDF("id", "x", "g"),
      "id", "x", "g", replicates = 32).collect().head
    assert(gn.getAs[Double]("delta_obs") === 0.0)
    assert(gn.getAs[Double]("p_two") === 1.0 &&
      !gn.getAs[Boolean]("significant"))
    // partition invariance
    val gp2 = Sampling.permutationMeanDiff(
      planted.reverse.toDF("id", "x", "g").repartition(11),
      "id", "x", "g", replicates = 64).collect().head
    assert(gp2.getAs[Double]("p_two") === gp.getAs[Double]("p_two") &&
      gp2.getAs[Long]("b_ge") === gp.getAs[Long]("b_ge"))
    // one-arm input: all test columns NULL, counts live
    val solo = Sampling.permutationMeanDiff(
      Seq((1L, 5L, true), (2L, 7L, true)).toDF("id", "x", "g"),
      "id", "x", "g").collect().head
    assert(solo.getAs[Long]("n_treat") === 2L &&
      solo.getAs[Long]("n_ctrl") === 0L)
    assert(solo.isNullAt(solo.fieldIndex("p_two")) &&
      solo.isNullAt(solo.fieldIndex("significant")) &&
      solo.isNullAt(solo.fieldIndex("delta_obs")))
    // contracts fail loud
    intercept[IllegalArgumentException](Sampling.permutationMeanDiff(
      Seq((1L, 1.0, true)).toDF("id", "x", "g"), "id", "x", "g"))
    intercept[IllegalArgumentException](Sampling.permutationMeanDiff(
      Seq((1L, 1L, true)).toDF("id", "x", "g"), "id", "x", "g",
      replicates = 4))
  }

  test("temperatureMixWeights: hand-computed alpha=1/2 table, alpha=1 identity, budget, guards") {
    val s = spark
    import s.implicits._
    // {a:4, b:16, c:64} at alpha=1/2: terms 2/4/8 -> weights 1/7, 2/7, 4/7
    val rows = Seq.fill(4)("a") ++ Seq.fill(16)("b") ++ Seq.fill(64)("c")
    val got = Sampling.temperatureMixWeights(rows.toDF("src"), "src")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(got("a").getAs[Double]("weight") - 1.0 / 7) < 1e-6)
    assert(math.abs(got("b").getAs[Double]("weight") - 2.0 / 7) < 1e-6)
    assert(math.abs(got("c").getAs[Double]("weight") - 4.0 / 7) < 1e-6)
    // epochs at the default N-budget: w*N/n -> a: (1/7)*84/4 = 3
    assert(math.abs(got("a").getAs[Double]("eff_epochs") - 3.0) < 1e-6)
    assert(got("a").getAs[Boolean]("upsampled"))
    assert(math.abs(got("c").getAs[Double]("eff_epochs") - 0.75) < 1e-6)
    assert(!got("c").getAs[Boolean]("upsampled"))
    assert(math.abs(got.values.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-5)
    // alpha = 1: weights equal raw shares (no rebalancing)
    val flat = Sampling.temperatureMixWeights(rows.toDF("src"), "src",
      alphaNum = 1, alphaDen = 1).collect()
    flat.foreach(r => assert(math.abs(r.getAs[Double]("weight") -
      r.getAs[Double]("share_raw")) < 1e-6))
    // explicit budget scales epochs linearly
    val bud = Sampling.temperatureMixWeights(rows.toDF("src"), "src",
      budgetTokens = Some(840L)).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("eff_epochs")).toMap
    assert(math.abs(bud("a") - 30.0) < 1e-5)
    // temperature rebalances monotonically: smaller source, more epochs
    assert(got("a").getAs[Double]("eff_epochs") >
      got("b").getAs[Double]("eff_epochs"))
    intercept[IllegalArgumentException](
      Sampling.temperatureMixWeights(rows.toDF("src"), "src",
        alphaNum = 3, alphaDen = 2))
    intercept[IllegalArgumentException](
      Sampling.temperatureMixWeights(rows.toDF("src"), "src",
        alphaNum = 0))
  }

  test("poissonBootstrapDelta: sequential reference, planted-uplift CI, null coverage, guards") {
    val s = spark
    import s.implicits._
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ths = Sampling.PoissonOneThresholds
    def wgt(id: Long, b: Int): Long =
      ths.count(Sampling.avalancheJvm(id.toString, "bootd" + f"$b%03d") >= _)
        .toLong
    def ref(rows: Seq[(Long, Long, Boolean)], reps: Int)
        : (Seq[Double], Double) = {
      val dObs = rows.filter(_._3).map(_._2).sum.toDouble /
        rows.count(_._3) -
        rows.filter(!_._3).map(_._2).sum.toDouble / rows.count(!_._3)
      val ds = (0 until reps).flatMap { b =>
        val (t, c) = rows.partition(_._3)
        val swt = t.map(r => wgt(r._1, b)).sum
        val swc = c.map(r => wgt(r._1, b)).sum
        if (swt == 0 || swc == 0) None
        else Some(r6(
          t.map(r => wgt(r._1, b) * r._2).sum.toDouble / swt -
            c.map(r => wgt(r._1, b) * r._2).sum.toDouble / swc))
      }
      (ds, dObs)
    }
    // planted uplift: treated +300 on +-30 noise
    val rows = (1L to 120L).map(i =>
      (i, (i % 7) * 10L + (if (i % 2 == 1) 300L else 0L), i % 2 == 1))
    val got = Sampling.poissonBootstrapDelta(rows.toDF("id", "x", "g"),
      "id", "x", "g", replicates = 32).collect().head
    val (ds, dObs) = ref(rows, 32)
    assert(got.getAs[Long]("b_used") === ds.size.toLong)
    assert(got.getAs[Double]("delta") === r6(dObs))
    val sorted = ds.sorted
    val bUsed = ds.size
    val loR = (bUsed * 5 + 199) / 200
    assert(got.getAs[Double]("boot_lo") === sorted(loR - 1),
      "CI lower pick equals the sequential order statistic")
    assert(got.getAs[Double]("boot_hi") === sorted(bUsed - loR))
    assert(got.getAs[Boolean]("excludes_zero"),
      "a +300 uplift CI on +-30 noise must exclude 0")
    assert(got.getAs[Double]("boot_lo") <= r6(dObs) &&
      r6(dObs) <= got.getAs[Double]("boot_hi"))
    // exchangeable arms: CI covers 0
    val nul = (1L to 120L).map(i => (i, ((i / 2) % 7) * 10L, i % 2 == 1))
    val gn = Sampling.poissonBootstrapDelta(nul.toDF("id", "x", "g"),
      "id", "x", "g", replicates = 32).collect().head
    assert(!gn.getAs[Boolean]("excludes_zero"))
    // partition invariance
    val gp = Sampling.poissonBootstrapDelta(
      rows.reverse.toDF("id", "x", "g").repartition(9),
      "id", "x", "g", replicates = 32).collect().head
    assert(gp.getAs[Double]("boot_lo") === got.getAs[Double]("boot_lo") &&
      gp.getAs[Double]("boot_hi") === got.getAs[Double]("boot_hi"))
    // empty arm: zero rows (no uplift to estimate)
    assert(Sampling.poissonBootstrapDelta(
      Seq((1L, 5L, true), (2L, 6L, true)).toDF("id", "x", "g"),
      "id", "x", "g").collect().isEmpty)
    intercept[IllegalArgumentException](Sampling.poissonBootstrapDelta(
      Seq((1L, 1.0, true)).toDF("id", "x", "g"), "id", "x", "g"))
  }

  test("poissonBootstrapMean: constant column collapses the CI; contracts fail loud") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toLong, 42L)).toDF("id", "x")
    val r = Sampling.poissonBootstrapMean(df, "id", "x", replicates = 16).collect().head
    assert(r.getDouble(2) === 42.0 && r.getDouble(3) === 42.0 &&
      r.getDouble(4) === 42.0 && r.getDouble(5) === 0.0,
      "constant metric: every replicate mean is the constant, se 0")
    assert(Sampling.poissonBootstrapMean(
      spark.emptyDataset[(Long, Long)].toDF("id", "x"), "id", "x").count() === 0L,
      "empty input yields zero rows")
    intercept[IllegalArgumentException](
      Sampling.poissonBootstrapMean(df, "id", "x", replicates = 7))
    intercept[IllegalArgumentException](
      Sampling.poissonBootstrapMean(df, "id", "x", replicates = 513))
    intercept[IllegalArgumentException](
      Sampling.poissonBootstrapMean(df, "id", "x", alphaPct = 0))
    intercept[IllegalArgumentException](Sampling.poissonBootstrapMean(
      df.select(col("id"), col("x").cast("double").as("x")), "id", "x"))
  }
}
