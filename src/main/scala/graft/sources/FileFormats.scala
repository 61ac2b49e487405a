package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch file-format readers beyond parquet (SURVEY §2.8: absent in the
  * reference, part of the complete engine surface). Always schema-first:
  * `inferSchema` on CSV/JSON costs a FULL extra pass over the data before
  * the real scan — at 100 TB that is the difference between one read and
  * two. Explicit schemas also pin types (no "it inferred my ids as
  * doubles" drift between runs). */
object FileFormats {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE") // malformed row => nulls, like the CDC parser
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** ORC: the other columnar at-rest format (built into Spark; predicate
    * pushdown + column pruning work the same as parquet). Schema comes
    * from the file footer — no inference pass. Offered for interop with
    * ORC-based warehouses; the engine's canonical format stays parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** One-file-per-partition CSV/JSON writers are deliberately absent: the
    * engine's canonical at-rest format is sorted, month-partitioned
    * parquet (graft.sinks.ParquetSink); CSV/JSON are ingest formats.
    * Avro: the spark-avro DATASOURCE jar is not in this distribution, so
    * `format("avro")` fails at runtime — [[Avro]] provides the read/write
    * path instead, built on the avro-core + avro-mapred jars that ARE on
    * the classpath (splittable AvroKeyInputFormat scan, Hadoop-committer
    * writes); oracled end-to-end by q113. */
}
