package graft

import java.nio.file.Files
import graft.cdc.{Envelope, Fixture}
import graft.runner.Main

/** The composition root's stream mode end-to-end: envelope replay →
  * foreachBatch append log → compact-on-read final state, equal to the
  * direct batch application of the same events (SURVEY §3.1 lifecycle).
  */
class RunnerSpec extends SparkSuite {

  test("runStream materializes the same final state as batch replay, and a rerun is idempotent") {
    val in = Fixture.materialize()
    val inDir = new java.io.File(in).getParent
    val ckpt = Files.createTempDirectory("graft_runner_ckpt").toString
    val out = Files.createTempDirectory("graft_runner_out").toString
    Main.runStream(spark, inDir, ckpt, out)
    val got = Main.readFinalState(spark, out)
    val expected = Envelope.lastImageByKey(Envelope.project(
      spark.read.schema(Envelope.schema).json(in)))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.count() > 0)

    // simulate a redelivered batch: fresh checkpoint, same log dir →
    // duplicate appends; last-image-wins must resolve identically
    Main.runStream(spark, inDir, Files.createTempDirectory("graft_runner_ckpt2").toString, out)
    val redelivered = Main.readFinalState(spark, out)
    assert(redelivered.exceptAll(expected).isEmpty && expected.exceptAll(redelivered).isEmpty)
  }
}
