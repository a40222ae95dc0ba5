package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession
      .configure(SparkSession.builder().master("local[32]"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"docs=${docs.count()}")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import org.apache.spark.sql.graftglue.ColumnGlue
    val kernel = ColumnGlue.column(graft.expressions.MinHashSigKernel(
      ColumnGlue.expression(col("text")), 3, 32, false))
    val sigs = docs.select(col("doc_id").as("id"), kernel.as("sig"))
      .filter(col("sig").isNotNull)
    time("sigs count")(println(sigs.count()))

    val bands = 16; val r = 32 / bands
    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), j -> xxhash64(slice(sig, j * $r + 1, $r), j))"))
        .as(Seq("band", "bkey")))
    val bandedS = banded.repartition(32, col("band"), col("bkey"))
    val a = bandedS.select(col("id").as("ia"), col("sig").as("siga"), col("band"), col("bkey"))
    val b = bandedS.select(col("id").as("ib"), col("sig").as("sigb"),
      col("band").as("band2"), col("bkey").as("bkey2"))
    val candRaw = a.hint("shuffle_hash")
      .join(b, col("band") === col("band2") && col("bkey") === col("bkey2") && col("ia") < col("ib"))
      .select("ia", "ib", "siga", "sigb")
    time("raw candidate rows")(println(candRaw.count()))
    val cand = candRaw.dropDuplicates("ia", "ib")
    time("distinct candidates")(println(cand.count()))

    time("full q38")(graft.operators.Dedup.minHashLshPairs(docs,
      numHashes = 32, bands = 16, minJaccard = 0.4)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
