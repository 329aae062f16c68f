package graft
/** Prints formatted physical plans for the headline queries — the
  * explain-audit loop (pushdown, broadcast, codegen span checks). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val targets = args.headOption.map(_.split(",").toSet)
    SparkEntry.allDefs.foreach { case (name, qd) =>
      if (targets.forall(_.contains(name))) {
        println(s"\n########## $name ##########")
        try qd.fn(spark, d).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
