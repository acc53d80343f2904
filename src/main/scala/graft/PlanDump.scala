package graft
import org.apache.spark.sql.SparkSession

/** Dev scratch main: print the formatted executed plan of named queries
  * at an SF dir (default sf0.1) — the `.explain` feedback loop SCALE.md's
  * plan audits use, runnable without a spec.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("8")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // let AQE finalize so the printed plan is the real one
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString().take(12000))
    }
    spark.stop()
    System.exit(0)
  }
}
