package graft.operators

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

/** [[ZOrder]] + [[graft.sources.ParquetSink.writeZOrderLayout]] — the
  * interleave arithmetic (hand-computed), exact integer bucketing at the
  * boundaries, and the layout promise measured COMPARATIVELY: per-file
  * value spans on BOTH z dimensions must beat a hash layout's. */
class ZOrderSpec extends SparkSpecBase {

  test("mortonCode: hand-computed interleave; dims.head owns the LSB") {
    val s = spark
    import s.implicits._
    val df = Seq((3L, 5L), (1L, 0L), (0L, 1L)).toDF("x", "y")
    val out = df.select(ZOrder.mortonCode(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=011,y=101 -> bits (x0,y0,x1,y1,x2,y2) = 1,1,1,0,0,1 -> 1+2+4+32
    assert(out === Seq(39L, 1L, 2L))
  }

  test("intBucket: exact integer division at bucket boundaries") {
    val s = spark
    import s.implicits._
    val df = Seq(0L, 124L, 125L, 999L).toDF("v")
    val out = df.select(ZOrder.intBucket(col("v"), 0L, 999L, 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    // (124*256) div 1000 = 31 (31.744 truncates), (125*256) div 1000 = 32
    assert(out === Seq(0L, 31L, 32L, 255L))
  }

  test("zCode: null dimension yields null code; bounds from the data") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(10L), 0L), (None, 5L), (Some(20L), 9L)).toDF("a", "b")
    val out = ZOrder.zCode(df, Seq("a", "b"), bits = 4).collect()
    assert(out.count(_.isNullAt(2)) === 1, "null dim -> null code")
    // a=10 -> bucket 0, b=0 -> bucket 0 -> z 0; a=20 -> (10*16) div 11 = 14,
    // b=9 -> (9*16) div 10 = 14 -> interleave(14,14) = 252 (the max value
    // lands at floor(r*2^b/(r+1)), always inside [0, 2^b) by construction)
    val codes = out.filter(!_.isNullAt(2)).map(_.getLong(2)).sorted
    assert(codes.head === 0L && codes.last === 252L)
  }

  test("writeZOrderLayout: per-file spans on BOTH dims beat the hash layout") {
    val e = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    graft.sources.ParquetSink.writeZOrderLayout(e, s"$dir/z", Seq("user_id", "tus"), nFiles = 8)
    e.repartition(8).write.parquet(s"$dir/h")
    def avgSpans(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name()).agg(
          (max("user_id") - min("user_id")).as("su"),
          (max("tus") - min("tus")).as("st"))
        .agg(avg("su"), avg("st")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (zu, zt) = avgSpans(s"$dir/z")
    val (hu, ht) = avgSpans(s"$dir/h")
    assert(zu < hu, s"user_id span: z-order $zu !< hash $hu")
    assert(zt < ht, s"ts span: z-order $zt !< hash $ht")
  }

  test("writeHilbertLayout: round-trips, and per-file spans on BOTH dims beat hash") {
    val e = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hilbert").toString
    graft.sources.ParquetSink.writeHilbertLayout(
      e, s"$dir/hb", "user_id", "tus", nFiles = 8)
    e.repartition(8).write.parquet(s"$dir/h")
    val back = spark.read.parquet(s"$dir/hb")
    assert(back.count() === e.count(), "layout write is lossless")
    assert(back.columns.toSet === e.columns.toSet, "helper columns dropped")
    def avgSpans(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name()).agg(
          (max("user_id") - min("user_id")).as("su"),
          (max("tus") - min("tus")).as("st"))
        .agg(avg("su"), avg("st")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (bu, bt) = avgSpans(s"$dir/hb")
    val (hu, ht) = avgSpans(s"$dir/h")
    assert(bu < hu, s"user_id span: hilbert $bu !< hash $hu")
    assert(bt < ht, s"ts span: hilbert $bt !< hash $ht")
  }
}
