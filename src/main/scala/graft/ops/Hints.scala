package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-guarded broadcast hints (VERDICT r18 next #6 — the registered-
  * surface audit of forced `broadcast()` hints on data whose cardinality
  * grows with the corpus).
  *
  * A forced hint on a SF-proportional side (customer is 150k×SF rows,
  * supplier 10k×SF, part 200k×SF — "dimensions" only relative to the
  * fact) is the right plan at every tested decade and a guaranteed
  * driver/executor OOM a few decades later. [[dimBroadcast]] keeps the
  * hint exactly while Catalyst's own plan-cost estimate
  * (`optimizedPlan.stats.sizeInBytes` — file bytes × projected-column
  * ratio, a pure planning-time read, no job) fits a deployment-safe
  * ceiling, and otherwise emits NO hint, letting the planner and AQE pick
  * from runtime sizes. Because the estimate scales with the data, every
  * currently-tested scale keeps its current plan (sf0.001 PlanSpec pins
  * through sf100 sweeps), and the cutover only engages at the scales
  * where the broadcast would have been the bug.
  *
  * What stays UNGUARDED, and why (the PERF_NOTES r19 table lists every
  * site):
  *   - single-row / fixed-K sides (scalar aggregates, IVF centroids, PQ
  *     codebooks, sketch payloads): bounded by construction;
  *   - schema-enum dims (nation 25, region 5, event-type fences): bounded
  *     by the data model;
  *   - aggregate-derived sides whose TRUE size is dimension-proportional
  *     (tpch2's per-part argmin, tpch20's qualifying-supplier set,
  *     the hot-key list): plan-time stats CANNOT see their real size (the
  *     non-CBO estimator multiplies join children), so a stats gate would
  *     mis-fire at every scale; their bounds and named 100-TB reshapes
  *     are documented at the site.
  */
object Hints {

  /** Ceiling for a forced dimension broadcast, in Catalyst-estimated
    * bytes. 256 MB is comfortably inside any sane executor/driver memory
    * budget while far above `spark.sql.autoBroadcastJoinThreshold`'s
    * 10 MB default — the hint exists precisely to broadcast dims the
    * auto-threshold is too shy for. @volatile test seam. */
  @volatile private[graft] var DimBroadcastMaxBytes: Long = 256L << 20

  /** `broadcast(df)` while the optimizer's size estimate fits
    * [[DimBroadcastMaxBytes]]; `df` unhinted otherwise. */
  def dimBroadcast(df: DataFrame): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(DimBroadcastMaxBytes))
      broadcast(df)
    else df
}
