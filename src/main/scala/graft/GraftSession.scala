package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session-extension entry point: register with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.extensionFunctions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofL2Distance)
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
  }
}

/** Builder for a graft-configured local session. Defaults are sized for
  * `local[N]` testing but every knob is the one that matters on a real
  * cluster too (shuffle partitions ≈ total cores; AQE on for runtime
  * re-planning and skew handling).
  */
object GraftSession {
  def local(
      cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.registerAll(spark)
    spark
  }

  /** Ensure graft functions exist in an externally-built session. */
  def install(spark: SparkSession): SparkSession = {
    functions.registerAll(spark)
    spark
  }
}
