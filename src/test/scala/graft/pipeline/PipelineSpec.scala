package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.pipeline.Pipeline._

class PipelineSpec extends SparkSpec {

  test("stages run in declared order") {
    val dir = tmpDir("pipe")
    val order = scala.collection.mutable.ArrayBuffer[String]()
    val reports = Pipeline.run(Seq(
      Stage("a", None, run = () => { order += "a"; Done }),
      Stage("b", None, run = () => { order += "b"; Done }),
      Stage("c", None, run = () => { order += "c"; Skipped("empty input") }),
    ), dir)
    assert(order.toSeq === Seq("a", "b", "c"))
    assert(reports.map(_.status) === Seq("done", "done",
      "skipped: empty input"))
  }

  test("marker gate: second run skips processed (stage, input)") {
    val dir = tmpDir("pipe")
    var runs = 0
    def stages = Seq(Stage("ingest", Some("file1.csv"),
      run = () => { runs += 1; Done }))
    val r1 = Pipeline.run(stages, dir)
    val r2 = Pipeline.run(stages, dir)
    assert(runs === 1)
    assert(r1.head.status === "done")
    assert(r2.head.status === "already_processed")
    // a different input file re-runs the same stage
    Pipeline.run(Seq(Stage("ingest", Some("file2.csv"),
      run = () => { runs += 1; Done })), dir)
    assert(runs === 2)
  }

  test("retry with exponential backoff, then failure hook + halt") {
    val dir = tmpDir("pipe")
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    var failed: Option[String] = None
    var attempts = 0
    var ranAfter = false
    val reports = Pipeline.run(
      Seq(
        Stage("flaky", None, Retry(maxAttempts = 3, baseDelayMs = 10),
          () => { attempts += 1; sys.error("boom") }),
        Stage("after", None, run = () => { ranAfter = true; Done }),
      ),
      dir,
      onFailure = (name, _) => failed = Some(name),
      sleep = delays += _)
    assert(attempts === 3)
    assert(delays.toSeq === Seq(10L, 20L)) // backoff ×2
    assert(failed === Some("flaky"))
    assert(reports.map(_.status) === Seq("failed")) // Fail state: halt
    assert(!ranAfter)
  }

  test("transient failure recovers within retry budget and marks") {
    val dir = tmpDir("pipe")
    var attempts = 0
    val reports = Pipeline.run(Seq(
      Stage("flaky", Some("in.csv"), Retry(maxAttempts = 2, baseDelayMs = 1),
        () => { attempts += 1; if (attempts < 2) sys.error("boom"); Done })),
      dir, sleep = _ => ())
    assert(reports.head.status === "done")
    assert(reports.head.attempts === 2)
    assert(Pipeline.run(Seq(Stage("flaky", Some("in.csv"),
      run = () => Done)), dir).head.status === "already_processed")
  }

  test("archive moves the file") {
    val dir = tmpDir("pipe")
    val f = dir.resolve("raw.csv")
    Files.writeString(f, "x")
    val dest = Pipeline.archive(f, dir.resolve("archived"))
    assert(!Files.exists(f))
    assert(Files.exists(dest))
  }
}
