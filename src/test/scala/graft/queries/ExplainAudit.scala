package graft.queries

import graft.SparkSpec

/** One-off plan eyeball for the bench's current top-cost queries —
  * prints executed plans to stderr for manual audit; asserts only
  * the absence of the global anti-patterns (cartesian products,
  * nested-loop joins) so it stays a regression net.
  */
class ExplainAudit extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("top-cost queries contain no cartesian/nested-loop operators") {
    // q80/q94/q96/q97/q98/q101 are deliberately absent: their scoring
    // joins / 1-row stat rides ARE broadcast nested loops (tiny side
    // × corpus scan), pinned in PlanSpec; q148 likewise rides its
    // 1-row totals frame across the ≤ r·c contingency summary
    Seq("q03" -> Relational.q03, "q24" -> Pipeline.q24,
        "q30" -> Pipeline.q30, "q59" -> Events.q59,
        "q37" -> Pipeline.q37, "q55" -> Pipeline.q55,
        "q76" -> Pipeline.q76, "q85" -> Pipeline.q85,
        "q88" -> Pipeline.q88, "q93" -> Pipeline.q93,
        "q95" -> Pipeline.q95, "q99" -> Pipeline.q99,
        "q103" -> Pipeline.q103, "q109" -> Pipeline.q109,
        "q110" -> Pipeline.q110, "q112" -> Events.q112,
        "q116" -> Pipeline.q116, "q130" -> Events.q130,
        "q133" -> Events.q133, "q136" -> Events.q136,
        "q137" -> Events.q137, "q138" -> Events.q138,
        "q139" -> Events.q139, "q140" -> Events.q140,
        "q141" -> Events.q141, "q143" -> Events.q143,
        "q144" -> Events.q144, "q145" -> Pipeline.q145,
        "q146" -> Events.q146, "q147" -> Events.q147,
        "q149" -> Events.q149, "q150" -> Events.q150,
        "q151" -> Events.q151, "q152" -> Events.q152,
        "q153" -> Events.q153, "q154" -> Events.q154,
        "q159" -> Events.q159,
        "q182" -> Pipeline.q182, "q186" -> Pipeline.q186,
        // the r13 stored/robust additions: stored-sketch probes must
        // stay keyed joins over store reads, median/MAD and the TTL
        // finale must stay histogram-bounded
        "q192" -> Pipeline.q192, "q193" -> Events.q193,
        "q194" -> Events.q194, "q195" -> Events.q195,
        "q196" -> Events.q196, "q197" -> Events.q197)
        .foreach { case (n, q) =>
      val p = q.fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$n has a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n has a nested loop:\n$p")
    }
  }

  test("every unpartitioned window in the registry runs over a summary " +
      "frame (an aggregate or limit sits below it) — a fact-sized frame " +
      "on one partition cannot land silently") {
    // The three deliberate unpartitioned-window sites (the q-vocab
    // bucket cumulative, q97's top-50 rank, q170's ≤64-level
    // histogram cumulative) are bounded because their window input is
    // an Aggregate over a bounded key space or a Limit. This audit
    // pins that shape for EVERY registered query: any future
    // unpartitioned window whose input subtree lacks an
    // aggregate/limit barrier — i.e. could be fact-sized — fails here
    // instead of silently serializing a fact table onto one partition
    // (VERDICT r12 #7).
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, GlobalLimit, LogicalPlan, Window => LWindow}
    def summaryBarrier(p: LogicalPlan): Boolean =
      p.collectFirst {
        case _: Aggregate => ()
        case _: GlobalLimit => ()
      }.isDefined
    graft.SparkEntry.registry.foreach { q =>
      val plan = q.fn(spark, sf).queryExecution.optimizedPlan
      plan.foreach {
        case w: LWindow if w.partitionSpec.isEmpty =>
          assert(summaryBarrier(w.child),
            s"${q.name}: unpartitioned window over a frame with no " +
              s"aggregate/limit barrier below it:\n$w")
        case _ => ()
      }
    }
  }
}
