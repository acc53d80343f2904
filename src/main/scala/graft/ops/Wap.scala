package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write–Audit–Publish — the production table-service landing pattern
  * (popularized by Netflix's Iceberg WAP): a batch is STAGED to a
  * private location, the declarative [[Constraints]] suite audits the
  * staged files (the same bytes readers would see — auditing the
  * DataFrame before the write would miss write-path corruption), and
  * only a fully-green audit atomically swaps the staging directory
  * into the published location. A failing audit leaves the previous
  * published table untouched — readers never observe a half-landed or
  * rule-violating batch.
  *
  * The swap here is a filesystem rename (never delete-before-verify:
  * the old table is moved aside first and removed only after the new
  * one is in place — the [[Layout.compact]] discipline). On a real
  * table service the same step is a metastore/catalog pointer flip;
  * everything else — staging write, file-level audit, publish-on-green
  * — is exactly this code. Cost at 100 TB: the audit is the
  * constraint engine's ONE extra pass over the staged batch (not the
  * table), and the swap is O(1) metadata.
  */
object Wap {

  /** Audit outcome + where the data ended up. `report` is the
    * constraint engine's per-rule relation, already materialized
    * (auditing must complete before any publish decision).
    */
  final case class WapResult(published: Boolean, report: DataFrame)

  def publish(
      df: DataFrame,
      rules: Seq[Constraints.Rule],
      stagingDir: String,
      publishDir: String
  ): WapResult = {
    val spark = df.sparkSession
    val fs = new Path(publishDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // 1. WRITE to staging
    df.write.mode("overwrite").parquet(stagingDir)
    // 2. AUDIT the staged FILES (what a reader would actually see)
    val staged = spark.read.parquet(stagingDir)
    val report = Constraints.report(staged, rules).cache()
    val allPass = report.agg(min(col("pass")).as("ok")).head().getBoolean(0)
    // 3. PUBLISH only on green: move old aside, swap in, then clean up
    if (allPass) {
      val pub = new Path(publishDir)
      val old = new Path(publishDir + "__old")
      fs.delete(old, true)
      if (fs.exists(pub)) fs.rename(pub, old)
      require(fs.rename(new Path(stagingDir), pub),
        s"publish rename failed: $stagingDir -> $publishDir")
      fs.delete(old, true)
    }
    WapResult(allPass, report)
  }
}
