package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Derived scale-up of the driver's largest test SF: replicates the
  * fact tables N× with disjoint key ranges so Bench can record a
  * datapoint an order of magnitude beyond sf0.1. Dimension tables
  * (nation, region) stay fixed — the same shape TPC-H scaling uses —
  * so per-nation group cardinalities grow with the data instead of the
  * group count.
  *
  * This is DERIVED data (clearly labeled, written under the repo's
  * data/ dir); the driver's /root/testdata is never modified. The
  * replication is one `crossJoin(range(factor))` per table — a narrow
  * map over each source split, no shuffle.
  *
  * Usage: `runMain graft.ScaleUp [srcDir] [outDir] [factor]`
  */
object ScaleUp {

  /** Key columns that must stay globally unique across replicas; every
    * replica offsets them by `replica * KeyStride`.
    */
  val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq(),
    "nation" -> Seq(),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  val KeyStride = 1000000000L

  def scaleTable(spark: SparkSession, df: DataFrame, keys: Seq[String],
                 factor: Int): DataFrame =
    if (keys.isEmpty || factor <= 1) df
    else {
      val rep = spark.range(factor).select(col("id").as("__rep"))
      keys.foldLeft(df.crossJoin(rep)) { (d, k) =>
        d.withColumn(k, col(k) + col("__rep") * KeyStride)
      }.drop("__rep")
    }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/data/sf1-derived")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.get()
    for ((t, keys) <- keyCols) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      scaleTable(spark, df, keys, factor)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      System.err.println(s"[scaleup] $t done")
    }
    println(s"scaled $src x$factor -> $out")
    spark.stop()
  }
}
