package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** One-off: raw agreement/separation behind c11's margin booleans. */
object C11Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkEntry.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val feats = Seq("n_words", "mean_word_len", "dup_line_frac",
        "bullet_line_frac", "ellipsis_line_frac", "stopword_count",
        "alpha_word_frac")
      val labeled = Tables.load(s, dir, "documents")
        .select(col("doc_id"), gopherRules(col("text")).as("g"))
        .select(col("doc_id") +: col("g.gopher_pass").as("label") +:
          feats.map(f => col(s"g.$f")): _*)
      val m = graft.operators.QualityClassifier.train(labeled, feats, "label")
      val r = labeled.select(col("label"),
          graft.operators.QualityClassifier.scoreColumn(m).as("p"))
        .agg(avg(when((col("p") >= 0.5) === col("label"), 1.0).otherwise(0.0)),
          avg(when(col("label"), col("p"))), avg(when(!col("label"), col("p"))))
        .head()
      println(f"[probe] $dir agree=${r.getDouble(0)}%.3f p1=${r.getDouble(1)}%.3f p0=${r.getDouble(2)}%.3f sep=${r.getDouble(1)-r.getDouble(2)}%.3f")
    }
    s.stop()
  }
}
