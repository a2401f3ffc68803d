package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: one call gives a session with every graft
  * extension installed — the custom planner strategy (TopKPerKey), the
  * native SQL functions (cosine_similarity, uuid5, minhash_signature,
  * chunk_text), and the scale-sane local defaults.
  */
object Graft {

  /** Build a local session wired for this engine. Cluster deployments
    * use their own builder + `withExtensions(new plans.GraftExtensions)`
    * + `functions.GraftFunctions.register`. */
  def session(cores: Int = Runtime.getRuntime.availableProcessors(),
              appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    install(spark)
    spark
  }

  /** Install graft functions + strategy on an existing session
    * (idempotent). */
  def install(spark: SparkSession): Unit = {
    functions.GraftFunctions.register(spark)
    if (!spark.experimental.extraStrategies.contains(plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ plans.TopKStrategy
  }
}
