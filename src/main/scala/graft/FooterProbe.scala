package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: what do parquet footers of a clusteredWrite-style output carry
  * for each Spark type we may declare as a manifest statsCol? Verifies
  * the three riskiest mappings before footer-derived stats replace the
  * per-publish data rescan: timestamp physical type (INT96 has no usable
  * stats; INT64 micros does), string min/max truncation behavior, and
  * double NaN handling. */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("footerprobe").toString
    val longStr = "z" * 100
    val df = Seq(
      (1L, "1996-02-01 10:11:12.123456", 1.5, "apple", new java.math.BigDecimal("12.34")),
      (2L, "1997-12-31 23:59:59.999999", -2.5, longStr, new java.math.BigDecimal("-99.01")),
      (3L, "1995-01-01 00:00:00.0", Double.NaN, "banana", new java.math.BigDecimal("0.00")))
      .toDF("k", "ts_s", "d", "s", "dec")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .withColumn("dt", col("ts").cast("date"))
      .drop("ts_s")
    df.coalesce(1).write.parquet(s"$dir/t")
    val f = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val footer = r.getFooter
      val md = footer.getFileMetaData
      println("schema: " + md.getSchema)
      footer.getBlocks.forEach { b =>
        println(s"block rows=${b.getRowCount}")
        b.getColumns.forEach { c =>
          val st = c.getStatistics
          println(s"  col=${c.getPath.toDotString} prim=${c.getPrimitiveType} " +
            s"stats=${Option(st).map(s0 => s"hasNonNull=${s0.hasNonNullValue} " +
              s"min=${s0.minAsString} max=${s0.maxAsString} " +
              s"nulls=${s0.getNumNulls}").getOrElse("null")}")
        }
      }
    } finally r.close()
    spark.stop()
  }
}
