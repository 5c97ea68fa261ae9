package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the rollup_serve_1h regression (r12 verdict #2):
  * splits one invocation into build / plan / execute segments.
  */
object ProfileServe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // cold materialization (excluded from the per-run segments)
    t("materialize (cold)") { graft.ops.Materialize.createRollupTables(spark, dir).count() }
    for (i <- 1 to 3) {
      println(s"run $i")
      val df = t("createRollupTables (memo)") {
        graft.ops.Materialize.createRollupTables(spark, dir)
      }
      df.count()
      val q = t("build serve query") {
        graft.ops.Materialize.rollupServe1h(spark, dir)
      }
      t("analyze") { q.queryExecution.analyzed }
      t("optimize") { q.queryExecution.optimizedPlan }
      t("physical") { q.queryExecution.executedPlan }
      t("execute count") { q.count() }
      t("fresh full count") { graft.ops.Materialize.rollupServe1h(spark, dir).count() }
    }
    println(graft.ops.Materialize.rollupServe1h(spark, dir)
      .groupBy().count().queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}
