package graft
import org.apache.spark.sql.SparkSession
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/tmp/widen_probe"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    Seq((1, 1.5f, 2.toShort), (2, 2.5f, 3.toShort)).toDF("i", "f", "s")
      .write.parquet(d)
    val sch = "i LONG, f DOUBLE, s INT"
    try {
      val rows = spark.read.schema(sch).parquet(d).collect()
      println("WIDEN-OK " + rows.sortBy(_.getLong(0)).mkString("; "))
    } catch { case e: Throwable =>
      println("WIDEN-FAIL " + e.getClass.getName + ": " +
        String.valueOf(e.getMessage).take(300))
    }
    try {
      val rows = spark.read.schema("i DOUBLE, f DOUBLE, s INT").parquet(d).collect()
      println("CROSS-OK " + rows.length)
    } catch { case e: Throwable => println("CROSS-FAIL " + String.valueOf(e.getMessage).take(200)) }
    // DECIMAL precision widening
    try {
      spark.range(2).selectExpr("cast(id as decimal(10,2)) as dec")
        .write.mode("overwrite").parquet(d + "2")
      val rows = spark.read.schema("dec DECIMAL(20,2)").parquet(d + "2").collect()
      println("DEC-OK " + rows.length)
    } catch { case e: Throwable => println("DEC-FAIL " + String.valueOf(e.getMessage).take(200)) }
    spark.stop()
  }
}
