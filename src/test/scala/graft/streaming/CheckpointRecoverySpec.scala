package graft.streaming

import java.nio.file.{Files, Paths}

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.SparkSuite
import graft.model.{LoginEvent, LoginFailWarning}
import graft.sources.CsvSources

/** Fault tolerance: a flatMapGroupsWithState detector restarted from its
  * checkpoint keeps per-key state — a fail buffered before the stop pairs
  * with a fail arriving after the restart. (The reference has no
  * checkpointing at all — SURVEY.md §2.6 'we should do better'.) */
class CheckpointRecoverySpec extends SparkSuite {

  import spark.implicits._

  test("loginFailStream resumes from checkpoint with state intact") {
    val base = Files.createTempDirectory("graft_ckpt")
    val inDir = Files.createDirectory(base.resolve("in")).toString
    val ckpt = base.resolve("ckpt").toString

    val results = ListBuffer.empty[LoginFailWarning]
    def startQuery() = {
      val src = StreamSources.csvStream(spark, inDir, CsvSources.loginSchema)
        .as[LoginEvent]
      StreamDetectors.loginFailStream(src, maxGapSec = 2L)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[LoginFailWarning], _: Long) =>
          results.synchronized { results ++= batch.collect() }
          ()
        }
        .start()
    }

    // batch 1: a single fail for user 7 — no alarm yet, state buffers it
    Files.writeString(Paths.get(inDir, "part1.csv"), "7,1.2.3.4,fail,100\n")
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    assert(results.isEmpty, "one fail alone must not alarm")

    // batch 2 after restart: adjacent fail within 2 s — alarm requires the
    // pre-restart state to have survived the checkpoint round trip
    Files.writeString(Paths.get(inDir, "part2.csv"), "7,1.2.3.4,fail,101\n")
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val alarms = results.synchronized(results.toList)
    assert(alarms.map(w => (w.userId, w.firstFailTs, w.secondFailTs)) === List((7L, 100L, 101L)))
  }
}
