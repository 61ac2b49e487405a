package graft.plans

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame

/** Repo-wide shim over eager `localCheckpoint(true)` that keeps the plan
  * census honest. A checkpointed frame's lineage is a bare
  * `Scan ExistingRDD`, so any census run on the FINAL plan of a
  * checkpointed pipeline (q49/q109/q111 class) reads 0 shuffles / 0
  * scans — the round-6 audit blind spot: a shuffle regression inside
  * such a pipeline was invisible to PLANS.md and PlanGuardSpec.
  *
  * When auditing is on ([[start]]), every checkpoint site routed through
  * [[local]] records the PRE-checkpoint DataFrame before materializing
  * it; [[finish]] hands the recorded stages to the censusor, which adds
  * their exchanges/scans (and lambda-cost hits) to the final plan's.
  * When auditing is off — always, outside graft.Plans and the plan-guard
  * specs — this is a plain pass-through to `localCheckpoint(true)` with
  * zero overhead on the hot path.
  */
object CheckpointAudit {
  @volatile private var recording = false
  private val recorded = new ConcurrentLinkedQueue[DataFrame]()

  /** Begin recording checkpoint stages (clears any prior recording). */
  def start(): Unit = { recorded.clear(); recording = true }

  /** Stop recording and return the pre-checkpoint frames in checkpoint
    * order. Holding the references is safe: each frame's blocks are
    * already materialized/released; only its QueryExecution is read. */
  def finish(): Seq[DataFrame] = {
    recording = false
    val out = Vector.newBuilder[DataFrame]
    var p = recorded.poll()
    while (p != null) { out += p; p = recorded.poll() }
    out.result()
  }

  /** The repo's eager-checkpoint call: record (when auditing), then
    * `localCheckpoint(eager = true)`. Chain as `.transform(CheckpointAudit.local)`. */
  def local(df: DataFrame): DataFrame = {
    if (recording) recorded.add(df)
    df.localCheckpoint(true)
  }
}
