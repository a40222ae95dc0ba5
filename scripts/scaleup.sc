// Scale-up generator for the 10x scaling study (SURVEY/BASELINE: the
// empirical check that no registered query is super-linear). Builds an
// sf1-shaped dataset at target/sfscale1 from the read-only sf0.1
// fixtures. Dev tooling only -- bench data, never an oracle input (the
// DuckDB correctness gate stays on the driver-generated sf0.01).
//
// Run:
//   /opt/spark/bin/spark-shell --master local[32] \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes -i scripts/scaleup.sc
//
// Design: relational tables replicate 10x with key offsets (attribute
// distributions preserved exactly; joins stay consistent within each
// copy; key-derived names regenerate from the new keys). The TEXT and
// EMBEDDING tables are NOT copied -- copies would be exact/near
// duplicates and the dedup/ANN families would measure an adversarial
// 10-copy-cluster workload instead of scale: documents regenerate from
// the fixture's own 31-token vocabulary with hash-driven lengths/langs
// (the original 5000 rows ride along, keeping the fixture's constant
// exact-dup structure), embeddings resample per-label Gaussians fitted
// to the fixture's own clusters (new iid vectors, same geometry).
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

// SCALEUP_COPIES / SCALEUP_OUT override the 10x defaults -- the r14
// sf10-shaped study runs COPIES=100 into target/sfscale10
val SRC = "/root/testdata/sf0.1"
val OUT = sys.env.getOrElse("SCALEUP_OUT", "target/sfscale1")
val COPIES = sys.env.getOrElse("SCALEUP_COPIES", "10").toInt

def rd(t: String): DataFrame = spark.read.parquet(s"$SRC/$t.parquet")
// Multi-file writes (r15 verdict item 2): a single-file table is ONE
// input split, which serializes every scan-bound pass (q228 measured a
// 98x wall / ~4x CPU gap at 100x purely from this). 32 splits = one per
// local[32] core; a real cluster fixture would carry hundreds.
def wr(df: DataFrame, t: String): Unit =
  df.repartition(32).write.mode("overwrite").parquet(s"$OUT/$t.parquet")

val copies = spark.range(0, COPIES).select(col("id").as("__c"))

// fixed dimensions: real TPC-H does not scale these
wr(rd("region"), "region")
wr(rd("nation"), "nation")

wr(rd("customer").crossJoin(copies)
  .select((col("c_custkey") + col("__c") * 15000L).as("c_custkey"),
    format_string("Customer#%09d", col("c_custkey") + col("__c") * 15000L).as("c_name"),
    col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer")

wr(rd("supplier").crossJoin(copies)
  .select((col("s_suppkey") + col("__c") * 1000L).as("s_suppkey"),
    format_string("Supplier#%09d", col("s_suppkey") + col("__c") * 1000L).as("s_name"),
    col("s_nationkey"), col("s_acctbal")), "supplier")

wr(rd("part").crossJoin(copies)
  .select((col("p_partkey") + col("__c") * 20000L).as("p_partkey"),
    col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")),
  "part")

wr(rd("orders").crossJoin(copies)
  .select((col("o_orderkey") + col("__c") * 150000L).as("o_orderkey"),
    (col("o_custkey") + col("__c") * 15000L).as("o_custkey"),
    col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
    col("o_orderpriority")), "orders")

wr(rd("lineitem").crossJoin(copies)
  .select((col("l_orderkey") + col("__c") * 150000L).as("l_orderkey"),
    (col("l_partkey") + col("__c") * 20000L).as("l_partkey"),
    (col("l_suppkey") + col("__c") * 1000L).as("l_suppkey"),
    col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
    col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus"),
    col("l_shipdate")), "lineitem")

// events: same one-month window, 10x users (how the driver's own
// sf0.01 -> sf0.1 step scales), per-copy microsecond jitter so no two
// copies tie exactly
wr(rd("events").crossJoin(copies)
  .select((col("event_id") + col("__c") * 100000L).as("event_id"),
    // ts is TIMESTAMP_NTZ in the fixture; round-trip through LTZ under
    // the UTC session (identity) for the micros arithmetic
    timestamp_micros(unix_micros(col("ts").cast("timestamp")) + col("__c") * 1009L)
      .cast("timestamp_ntz").as("ts"),
    (col("user_id") + col("__c") * 1500L).as("user_id"),
    col("event_type"), col("value"), col("props")), "events")

// documents: originals + 9x regenerated from the fixture vocabulary.
// VOCAB_HEAPS (r14, the posting-family scale question): a real corpus
// grows vocabulary with size (Heaps' law, V ~ N^beta, beta ~ 0.5); the
// r12/r13 sf1 sets reused the fixture's 31 tokens verbatim, which makes
// every shingle's df grow LINEARLY by construction and the posting
// families (q87/q95/q121/q62/q92/q49) measure an adversarial
// constant-vocabulary workload instead of scale. With the flag on, the
// 9x new docs draw from the fixture vocabulary EXTENDED by synthetic
// tokens up to round(31 * sqrt(COPIES)) - beta = 0.5 exactly - so
// shingle df grows ~sqrt(COPIES), the Heaps-consistent rate. Synthetic
// tokens are LENGTH-PRESERVING 4-char codes ("zaaa", "zaab", ...; no
// fixture token starts with 'z'): the first r14 attempt used
// pair-compounds ("hashjoin"), whose ~2x token length silently doubled
// chars/doc across the 9x new corpus - every per-char operator (codecs,
// suffix array, tokenizers) then paid a hidden 2x that read as a scale
// regression (q140 11.3x -> 33.5x measured) when it was fixture drift.
val VOCAB_HEAPS = true
val baseVocab = rd("documents")
  .select(explode(split(col("text"), " ")).as("t")).where(col("t") =!= "")
  .distinct().orderBy("t").collect().map(_.getString(0))
val vocab: Array[String] =
  if (!VOCAB_HEAPS) baseVocab
  else {
    val target = math.round(baseVocab.length * math.sqrt(COPIES.toDouble)).toInt
    val extra = (0 until math.max(0, target - baseVocab.length)).map { k =>
      val a = ('a' + k / 676 % 26).toChar
      val b = ('a' + k / 26 % 26).toChar
      val c = ('a' + k % 26).toChar
      s"z$a$b$c"
    }
    baseVocab ++ extra
  }
println(s"vocab ${vocab.length} tokens (base ${baseVocab.length}, heaps=$VOCAB_HEAPS)")
val vocabLit = array(vocab.map(lit): _*)
val langs = array(lit("en"), lit("en"), lit("en"), lit("en"),
  lit("zh"), lit("zh"), lit("es"), lit("es"), lit("de"), lit("fr"))
val newDocs = spark.range(5000L, 5000L * COPIES).select(col("id").as("doc_id"))
  .withColumn("__len", (pmod(xxhash64(col("doc_id"), lit("len")), lit(91)) + 10).cast("int"))
  .withColumn("text", array_join(
    transform(sequence(lit(1), col("__len")), i =>
      element_at(vocabLit,
        (pmod(xxhash64(col("doc_id"), i, lit("tok")), lit(vocab.length)) + 1).cast("int"))),
    " "))
  .select(col("doc_id"), col("text"),
    element_at(langs,
      (pmod(xxhash64(col("doc_id"), lit("lang")), lit(10)) + 1).cast("int")).as("lang"),
    concat(lit("src"), pmod(xxhash64(col("doc_id"), lit("src")), lit(20))).as("source"),
    length(col("text")).cast("int").as("n_chars"))
wr(rd("documents").unionByName(newDocs), "documents")

// embeddings: per-label Gaussian refit -> 10x fresh vectors (labels
// keep the fixture's cluster geometry; Irwin-Hall(12)-6 normals from
// xxhash64 lanes -- deterministic, no RNG state).
// LABEL_HEAPS (r14, the q62 counterpart of VOCAB_HEAPS): refilling the
// SAME 10 Gaussians at 10x density makes within-label pair volume grow
// quadratically by construction -- a real 10x corpus adds TOPICS. With
// the flag on, the label set grows to round(10 * sqrt(COPIES)) by
// synthesizing new cluster centers as deterministic midpoints of fitted
// center pairs (sd averaged) -- same geometry class, Heaps-consistent
// density.
val LABEL_HEAPS = true
val emb = rd("embeddings")
val stats = emb.select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
  .groupBy("label", "d").agg(avg("v").as("mu"), stddev_pop("v").as("sd"))
  .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getDouble(2), r.getDouble(3)))).toMap
val nBaseLabels = stats.keys.map(_._1).max + 1
val dim = stats.keys.map(_._2).max + 1
val nLabels =
  if (!LABEL_HEAPS) nBaseLabels
  else math.round(nBaseLabels * math.sqrt(COPIES.toDouble)).toInt
def mu(l: Int, d: Int): Double =
  if (l < nBaseLabels) stats((l, d))._1
  else {
    // synthetic label centers: midpoints of fitted center pairs in a
    // fixed enumeration (a, b) over a < b
    val k = l - nBaseLabels
    val pairs = for (a <- 0 until nBaseLabels; b <- (a + 1) until nBaseLabels)
      yield (a, b)
    val (a, b) = pairs(k % pairs.length)
    (stats((a, d))._1 + stats((b, d))._1) / 2.0
  }
def sd(l: Int, d: Int): Double =
  if (l < nBaseLabels) stats((l, d))._2
  else {
    val k = l - nBaseLabels
    val pairs = for (a <- 0 until nBaseLabels; b <- (a + 1) until nBaseLabels)
      yield (a, b)
    val (a, b) = pairs(k % pairs.length)
    (stats((a, d))._2 + stats((b, d))._2) / 2.0
  }
val muLit = array((0 until nLabels).map(l =>
  array((0 until dim).map(d => lit(mu(l, d))): _*)): _*)
val sdLit = array((0 until nLabels).map(l =>
  array((0 until dim).map(d => lit(sd(l, d))): _*)): _*)
println(s"labels $nLabels (base $nBaseLabels, heaps=$LABEL_HEAPS)")
val newEmb = spark.range(2000L, 2000L * COPIES).select(col("id").as("vec_id"))
  .withColumn("label", pmod(xxhash64(col("vec_id"), lit("lab")), lit(nLabels)).cast("int"))
  .withColumn("embedding",
    transform(sequence(lit(1), lit(dim)), d => {
      val z = (1 to 12).map(k =>
        pmod(xxhash64(col("vec_id"), d, lit(k)), lit(1000000)).cast("double") / 1000000.0)
        .reduce(_ + _) - 6.0
      (element_at(element_at(muLit, col("label") + 1), d) +
        element_at(element_at(sdLit, col("label") + 1), d) * z).cast("float")
    }))
  .select(col("vec_id"), col("embedding"), col("label"))
wr(emb.unionByName(newEmb), "embeddings")

println("SCALEUP_DONE")
Seq("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings")
  .foreach(t => println(t + " rows=" + spark.read.parquet(s"$OUT/$t.parquet").count()))
sys.exit(0)
