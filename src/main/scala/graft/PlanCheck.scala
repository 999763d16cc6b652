package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print formatted physical plans for the headline queries
  * so scan pruning / pushdown / broadcast decisions are reviewable.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (name <- args) {
      println(s"==== $name")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
