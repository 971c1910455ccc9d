package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop plan inspector: print each named query's executed-plan
  * shape summary (exchange count, whole-stage-codegen span count) and
  * optionally the formatted plan — the `.explain` loop the build
  * discipline asks for, scriptable. Usage:
  * `scripts/run.sh graft.ExplainQ <sfDir> [-v] <queryName ...>`
  * (no names = all). Not part of the driver contract; the mechanical
  * plan ASSERTIONS (no cartesian products, unpartitioned-window
  * barriers) live in ExplainAudit, run by the test suite.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val verbose = args.lift(1).contains("-v")
    val names = args.drop(if (verbose) 2 else 1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.registry.filter(q => names.isEmpty || names(q.name))
    qs.foreach { q =>
      try {
        val df = q.fn(spark, sfDir)
        // materialize THIS queryExecution (collect, not a write — a
        // write plans a separate command execution): under AQE the
        // executed plan and its codegen spans only finalize after an
        // action. Oracle-checked results are small by construction.
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        val ex = "Exchange".r.findAllIn(plan).size
        // codegen spans render as `*(n)` in the plan string — count
        // DISTINCT stage ids (one per WholeStageCodegenExec subtree)
        val cg = raw"\*\((\d+)\)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
        println(f"${q.name}%-36s exchanges=$ex%-3d wscg=$cg%-3d broadcastJoins=$bhj")
        if (verbose) df.explain("formatted")
      } catch { case e: Throwable =>
        println(s"${q.name} ERR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
