package graft.streaming

import graft.SparkSpecBase
import graft.sources.RateSource
import org.apache.spark.sql.streaming.Trigger

/** S9 beyond file/memory: the engine-generated rate source driving a
  * stateful update-mode pipeline — the Kafka-shaped ingest topology with
  * the connector swapped for the built-in continuous source. */
class RateSourceSpec extends SparkSpecBase {

  test("rate source drives a keyed update-mode count; totals grow monotonically") {
    val s = spark
    val counts = RateSource.keyedCounts(s, rowsPerSecond = 200, keys = 5)
    val q = counts.writeStream.outputMode("update").format("memory")
      .queryName("rate_counts").trigger(Trigger.ProcessingTime(200)).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def total() = s.table("rate_counts")
        .groupBy("k").max("count").collect().map(_.getLong(1)).sum
      var t1 = 0L
      while (t1 < 50 && System.currentTimeMillis() < deadline) {
        Thread.sleep(300); t1 = total()
      }
      assert(t1 >= 50, "rate source must deliver rows into the stateful count")
      var t2 = t1
      while (t2 <= t1 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500); t2 = total()
      }
      assert(t2 > t1, "update-mode totals must keep growing while the source runs")
      val keys = s.table("rate_counts").select("k").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(keys.subsetOf((0L until 5L).toSet), "keys come from value % 5")
    } finally q.stop()
  }
}
