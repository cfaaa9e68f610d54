package graft

import org.apache.spark.sql.DataFrame

/** Shared lineage-truncation discipline for the iterative operators
  * (connected components, PageRank, triangles, global indexing, BPE
  * training). Every loop materializes its per-round state so k rounds
  * nest neither the logical plan nor the upstream build k× — but WHERE
  * that state lives is a deployment choice:
  *
  *   - `local` (default): `localCheckpoint(eager)` — executor block
  *     storage, zero external infrastructure, the right answer for
  *     local[] and for clusters where a mid-job executor loss may
  *     simply rerun the job.
  *   - `reliable`: `checkpoint(eager)` against the context's
  *     checkpoint dir (`sc.setCheckpointDir`, HDFS/S3-backed on a real
  *     cluster). localCheckpointed partitions DIE with their executor —
  *     on a 1000-executor cluster a single preemption mid-iteration
  *     kills the whole job, so long iterative jobs at scale want the
  *     recomputable-from-storage variant despite the write cost.
  *
  * The knob is session-level (`spark.graft.checkpoint.reliable=true`
  * plus a checkpoint dir), not per-call: every loop in one job should
  * share one durability policy, and the operators themselves stay
  * oblivious. Results are bit-identical either way — both variants
  * preserve partitioning and row order within partitions (proven by
  * CheckpointStrategySpec) — so flipping the knob is purely an
  * availability/performance trade.
  */
object Checkpoints {

  /** Session conf key: `"true"` routes [[truncate]] through reliable
    * `checkpoint()` (requires `sc.setCheckpointDir`); anything else —
    * including unset — uses `localCheckpoint()`. */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Session conf key, PLAN-AUDIT ONLY: `"true"` makes [[truncate]] a
    * no-op so `explain` shows the full operator tree instead of a
    * checkpointed `Scan ExistingRDD` stub (a checkpoint truncates the
    * plan — that is its job — which blinds every shuffle/join audit of
    * the iterative operators). Never set it for real runs: the loops
    * rely on truncation for lineage and memory discipline. */
  val SkipKey = "spark.graft.checkpoint.skip"

  /** Materialize `df` now and truncate its lineage, per the session's
    * durability policy. Eager in both modes: the loops' adaptive sizing
    * (partition counts, convergence sums) reads the materialized state
    * immediately. */
  def truncate(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (s.conf.get(SkipKey, "false").toBoolean) {
      // Loud: with truncation off, iterative loops lose lineage cuts
      // and eager materialization (unbounded plan growth). Plan-audit
      // tooling only — never a real run.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"$SkipKey=true: checkpoint truncation DISABLED session-wide — " +
          "plan-audit mode, never use for real runs")
      df
    }
    else if (s.conf.get(ReliableKey, "false").toBoolean) {
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true needs sc.setCheckpointDir(...) — reliable " +
          "checkpoints persist partitions to a fault-tolerant store")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }

  /** `df.truncated` — chainable form of [[truncate]] for the loops'
    * method-chain style. */
  implicit final class Truncate(private val df: DataFrame) extends AnyVal {
    def truncated: DataFrame = truncate(df)
  }

  /** Drop the block-manager state behind a [[truncate]]d frame. Local
    * checkpoints pin executor block storage until released; reliable
    * checkpoint files are owned by the context (cleaned by
    * `spark.cleaner.referenceTracking.cleanCheckpoints` or context
    * shutdown), for which this is a harmless no-op. Matches ONLY a
    * top-level checkpoint root (a frame returned by [[truncate]]
    * directly) — a deep collect would also release checkpoints this
    * frame merely READS, yanking blocks out from under later rounds.
    * Safe only once nothing will read the frame again. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }
}
