package graft

/** Dev tool: dump `explain("formatted")` for a set of queries to files
  * (`plans/rNN/<query>_<tag>.txt` style), one JVM for the whole batch.
  *
  * Usage: runMain graft.PlanSnap <outDir> <tag> <q1,q2,...|all> [sfDir]
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names: Seq[String] =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$outDir/${name}_$tag.txt")
        try w.write(plan) finally w.close()
        println(s"[plansnap] $name ok (${plan.length} chars)")
      } catch {
        case e: Throwable =>
          println(s"[plansnap] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
