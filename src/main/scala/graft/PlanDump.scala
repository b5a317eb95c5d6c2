package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a comma-separated list of queries to
  * files — the per-round plan-evidence helper behind `plans/r<N>/`:
  *
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]"
  *
  * writes `<outDir>/<query>_<suffix>.txt` for each query. Plans are
  * pre-execution (initial AQE plan), like PLANS.md.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    Files.createDirectories(outDir)
    val spark = GraftSession.local(8)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote $name")
    }
    spark.stop()
  }
}
