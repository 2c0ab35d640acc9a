package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Windows

/** A6 streaming — Top-N per window through foreachBatch (rank-over-update),
  * asserting final-state equivalence with the batch rank. */
class TopNStreamSpec extends SparkSuite {

  import spark.implicits._

  test("streaming top-2 per window ≡ batch top-2 (final state)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (item, sec)
    val src = input.toDS()
      .select(col("_1").as("item"), col("_2").cast("timestamp").as("ts"))
    val counts = StreamWindows.tumblingCountStream(src, "ts", Seq("item"),
      "60 seconds", "5 seconds")

    // collect the latest ranking per batch; last batch wins per window
    val perBatch = scala.collection.mutable.Map[Long, Seq[(Long, Long, Long)]]()
    val q = StreamWindows.topNPerWindowStream(counts, Seq("window_end"), "cnt", "item", 2) {
      (ranked: DataFrame, batchId: Long) =>
        perBatch(batchId) = ranked.select("item", "window_end", "cnt")
          .as[(Long, Long, Long)].collect().toSeq
    }.start()
    try {
      input.addData(Seq((1L, 10L), (1L, 11L), (2L, 12L), (3L, 13L)))
      q.processAllAvailable()
      input.addData(Seq((3L, 20L), (3L, 21L))) // item 3 overtakes
      q.processAllAvailable()
    } finally q.stop()

    // final ranking for window 60 = union of last-emitted rows per window
    val finalRows = perBatch.toSeq.sortBy(_._1).flatMap(_._2)
      .groupBy(r => (r._1, r._2)).map(_._2.last) // latest count per (item, window)
    val lastRank = finalRows.filter(_._2 == 60L).toSeq.sortBy(-_._3).take(2).map(_._1)

    val batch = Windows.topNPerWindow(
        Windows.tumblingCount(
          Seq((1L, 10L), (1L, 11L), (2L, 12L), (3L, 13L), (3L, 20L), (3L, 21L)).toDF("item", "sec")
            .select(col("item"), timestamp_seconds(col("sec")).as("ts")),
          "ts", Seq("item"), "60 seconds"),
        Seq("window_end"), "cnt", "item", 2)
      .orderBy("rn").select("item").as[Long].collect().toSeq

    assert(lastRank === batch, s"stream final top-2 $lastRank must equal batch $batch")
  }
}
