package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary diagnostic: which fineWebCurate stage kills the
  * PipelineSmoke corpus? */
object FwProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR"); Conf.ensure(spark)
    val docs = spark.range(n).select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(10)) === 0 && col("id") >= 10,
          concat_ws(" ", transform(sequence(lit(1), lit(32)),
            j => concat(lit("tok"), pmod(xxhash64((col("id") - 1) * 131 + j * 7),
              lit(1000003)), lit("_"),
              when(j === 16, lit("CHANGED")).otherwise(j.cast("string"))))))
          .when(pmod(col("id"), lit(50)) === 0 && col("id") >= 50,
            concat_ws(" ", transform(sequence(lit(1), lit(32)),
              j => concat(lit("tok"), pmod(xxhash64((col("id") - 2) * 131 + j * 7),
                lit(1000003)), lit("_"), j))))
          .otherwise(concat_ws(" ", transform(sequence(lit(1), lit(32)),
            j => concat(lit("tok"), pmod(xxhash64(col("id") * 131 + j * 7),
              lit(1000003)), lit("_"), j)))).as("text"),
        when(pmod(col("id"), lit(10)) < 8, "en").otherwise("de").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(50))).as("source"))
      .persist()
    println("docs: " + docs.count())
    val rep = ops.Pipeline.cleanAndGate(docs, 5, 0.6, 0.2, 0.2,
      "doc_id", "text", "lang", "source").persist()
    println("cleanAndGate survivors: " + rep.count())
    println("en target: " + rep.where(col("lang") === "en").count())
    println("rep kept_text null: " + rep.where(col("kept_text").isNull).count())
    println("rep kept_text <2 tokens: " + rep.where(
      size(split(col("kept_text"), "\\s+")) < 2).count())
    val scored = ops.Perplexity.lmScore(rep,
      rep.where(col("lang") === "en"), idCol = "doc_id", textCol = "kept_text")
    println("scored rows: " + scored.count())
    val tiers = ops.Perplexity.perplexityBuckets(rep,
      rep.where(col("lang") === "en"), idCol = "doc_id", textCol = "kept_text")
    tiers.groupBy(col("ppl_bucket")).count().collect()
      .foreach(r => println(s"bucket ${r.get(0)}: ${r.getLong(1)}"))
    val full = ops.Pipeline.fineWebCurate(docs, capPerSource = 100000)
    println("fineWebCurate kept: " + full.count())
    spark.stop()
  }
}
