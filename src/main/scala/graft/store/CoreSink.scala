package graft.store

/** Which sink the EP2 core load writes through (`sink:` in
  * `config/endpoints.yaml`, parsed by [[graft.run.BatchPlan]]).
  *
  *   - [[CoreSink.Partition]] — [[CoreStore]]'s whole-year-partition
  *     rewrite, the reference's write unit (core_io.py:93-113 semantics).
  *     Right for full yearly reloads: the batch IS the partition.
  *   - [[CoreSink.Merge]] — [[MergeStore]]'s file-granular copy-on-write.
  *     Right for trickle updates at scale, where rewriting a whole year
  *     to change a few keys is the write-amplification bottleneck.
  */
sealed trait CoreSink

object CoreSink {
  case object Partition extends CoreSink
  case object Merge extends CoreSink

  /** Fail-fast parse (P5): a typo throws at plan-parse time, before any
    * fetch runs. */
  def parse(s: String): CoreSink = s match {
    case "partition" => Partition
    case "merge" => Merge
    case other => throw new IllegalArgumentException(
      s"unknown sink '$other' (expected one of: partition, merge)")
  }
}
