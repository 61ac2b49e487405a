package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Per-query formatted-plan dump for the optimization-round evidence
  * files (`plans/rNN/<query>_before.txt` / `..._after.txt`).
  *
  * Run: `sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,..."`
  * — writes `<outDir>/<query>_<suffix>.txt` holding the
  * `.explain("formatted")` output (final plan; for queries that
  * materialize intermediates via eager localCheckpoint, each
  * pre-checkpoint stage plan is appended — the final plan alone ends in
  * `Scan ExistingRDD` and would hide the real shape).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val qs = SparkEntry.queries
    names.foreach { name =>
      qs.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          graft.plans.CheckpointAudit.start()
          val df = fn(spark, sfDir)
          val stages = graft.plans.CheckpointAudit.finish()
          val sb = new StringBuilder
          sb.append(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          stages.zipWithIndex.foreach { case (st, i) =>
            sb.append(s"\n\n=== checkpointed stage ${i + 1}/${stages.size} (pre-checkpoint plan) ===\n\n")
            sb.append(st.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          }
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), sb.toString)
          spark.catalog.clearCache()
          println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
