package graft.pipeline

import java.nio.file.{Files, Path}

import scala.util.control.NonFatal

/** The reference's orchestration layer (Step Functions + 3 Lambdas,
  * SURVEY §2.7) collapsed into a library-level pipeline runner:
  *
  *  - C1 idempotency gate: per-(stage, input) marker file — a stage whose
  *    marker exists is skipped (ref:
  *    lambda/lakehouse_check_processed_marker/lambda_function.py:17-28).
  *  - C2 sequenced dependency DAG: stages run in declared order
  *    (ref: step_functions/lakehouse_etl_stepfunction.json:3-235).
  *  - C3 retry with exponential backoff (ref: json:45-54 —
  *    IntervalSeconds 10, MaxAttempts 2-3, BackoffRate 2).
  *  - C4 failure hook then fail (ref: json:268-282, SNS publish → Fail).
  *  - C6 early-exit on empty input: a stage may return Skipped
  *    (ref: orders_etl.py:66-69).
  *
  * Markers subsume the reference's S9 `_processed_log` objects
  * (ref: archive_and_mark_processed.py:40-44).
  */
object Pipeline {

  sealed trait StageResult
  case object Done extends StageResult
  /** Early exit, e.g. empty input (C6); still marked processed. */
  case class Skipped(reason: String) extends StageResult

  final case class Retry(maxAttempts: Int = 2, baseDelayMs: Long = 10000L,
      backoffRate: Double = 2.0)

  final case class Stage(
      name: String,
      /** Idempotency key, e.g. the input file name; None disables marking. */
      markerKey: Option[String],
      retry: Retry = Retry(),
      run: () => StageResult)

  final case class StageReport(name: String, status: String,
      attempts: Int, error: Option[String])

  /** Runs stages in order against marker root `markerDir`; calls `onFailure`
    * and stops at the first exhausted stage. `sleep` is injectable so tests
    * don't wait out real backoff. */
  def run(
      stages: Seq[Stage],
      markerDir: Path,
      onFailure: (String, Throwable) => Unit = (_, _) => (),
      sleep: Long => Unit = Thread.sleep): Seq[StageReport] = {
    Files.createDirectories(markerDir)
    val reports = Seq.newBuilder[StageReport]
    for (stage <- stages) {
      val marker = stage.markerKey.map(k =>
        markerDir.resolve(s"${stage.name}__${sanitize(k)}.txt"))
      if (marker.exists(Files.exists(_))) {
        reports += StageReport(stage.name, "already_processed", 0, None)
      } else {
        var attempt = 0
        var delay = stage.retry.baseDelayMs
        var outcome: Option[StageReport] = None
        while (outcome.isEmpty) {
          attempt += 1
          try {
            val status = stage.run() match {
              case Done => "done"
              case Skipped(reason) => s"skipped: $reason"
            }
            marker.foreach(Files.writeString(_,
              s"processed at ${java.time.Instant.now()}\n"))
            outcome = Some(StageReport(stage.name, status, attempt, None))
          } catch {
            case NonFatal(e) if attempt < stage.retry.maxAttempts =>
              sleep(delay)
              delay = (delay * stage.retry.backoffRate).toLong
            case NonFatal(e) =>
              onFailure(stage.name, e)
              outcome = Some(StageReport(stage.name, "failed", attempt,
                Some(e.toString)))
          }
        }
        val rep = outcome.get
        reports += rep
        if (rep.status == "failed") return reports.result() // Fail state
      }
    }
    reports.result()
  }

  /** S9 — archive a processed source file: move under `archivedDir`
    * (ref: archive_and_mark_processed.py:28-38, S3 copy→delete). */
  def archive(file: Path, archivedDir: Path): Path = {
    Files.createDirectories(archivedDir)
    val dest = archivedDir.resolve(file.getFileName)
    Files.move(file, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dest
  }

  private def sanitize(k: String): String =
    k.replaceAll("[^A-Za-z0-9._-]", "_")
}
