package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: lc1 predicted-language distribution and langGate admission on
  * corpus texts (diagnosing the StreamGateBench admitted=0 reading).
  */
object LcGateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val preds = graft.ext.LangClassifier.lc1LangPredictions(spark, dir)
    preds.groupBy("pred_lang").count().orderBy("pred_lang").show()
    preds.groupBy("labeled_lang", "pred_lang").count()
      .orderBy("labeled_lang", "pred_lang").show(30)
    val (w, classes) = graft.ext.LangClassifier.frozenModel(spark, dir)
    println("classes: " + classes)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val kept = graft.ext.LangClassifier
      .langGate(docs, w, classes, keep = Set("en")).count()
    println(s"langGate en kept on corpus: $kept of " + docs.count())
    spark.stop()
  }
}
