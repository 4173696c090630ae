package graft

import org.apache.spark.sql.SparkSession

/**
 * Canonical session factory: the configuration the engine is designed for.
 * AQE on (skew-join splitting + partition coalescing are part of the skew
 * story, SURVEY §4.2), shuffle partitions sized to the machine rather than
 * the 200 default, UTC sessions, and the graft Catalyst extensions
 * (native spatial expressions + SpatialJoinStrategy) installed.
 */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
