package graft

import org.apache.spark.sql.SparkSession

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bound per-event plan rendering: iterative cache-on-cache plans
      // (Dedup.clusters) otherwise render exponentially long tree strings
      .config("spark.sql.maxPlanStringLength", "131072")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
