package graft

import org.apache.spark.sql.SparkSession

/** Benchmark runner: one warmup pass then min-of-5 timed runs per
  * query, each fully materialized through the `noop` sink (so every
  * projection/expression is evaluated — a bare `count()` would let
  * Catalyst prune unreferenced columns and time only the scan).
  *
  * Min, not median: on a shared machine a transient load spike inflates
  * a contiguous run of queries, and a median-of-3 lets one spike poison
  * two of three samples (it did — BENCH_r04 recorded q23 at 14.3 s vs a
  * clean 0.44 s). The minimum is the standard noise-robust estimator
  * for single-machine microbenchmarks: every sample does the full work,
  * so the smallest one has the least interference.
  *
  * Output contract: exactly ONE JSON line on stdout —
  * `{"metric":"total","value":…,"unit":"sec","queries":{…},"sf":…}`.
  * Per-query failures are recorded in an `"errors"` object and make the
  * exit code nonzero; they never masquerade as fast runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // local iteration only: SPARK_GRAFT_BENCH_ONLY=p83,p85 runs a
    // subset with the identical methodology (the driver never sets it,
    // so driver sittings always time the full set)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try {
        timeOnce(fn) // warmup: JVM/codegen/IO cache
        timings(name) = Seq.fill(5)(timeOnce(fn)).min
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }

    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val qs = timings.map { case (k, v) => s""""${esc(k)}":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = timings.values.sum
    // the metric line is the ONLY stdout output (logs go to stderr)
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
