package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming variant of the KG pipeline. The reference is batch
  * (SURVEY §2.9: its async streams are concurrency, not event time), but the
  * pipeline is streaming-friendly by construction: extraction is stateless
  * per subject once a subject's files co-arrive, and the merge is an
  * associative argmax. A crawl stream delivers whole WARC captures, so
  * subjects arrive complete within a microbatch; `foreachBatch` runs the
  * batch pipeline per trigger and appends triples, with exactly-once
  * bookkeeping from the streaming checkpoint. Cross-batch re-canonicalization
  * (a subject recrawled later) is the associative `KgEngine.canonicalize`
  * aggregate over the appended log — an Iceberg MERGE in production.
  */
object KgStreaming {

  def start(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      pageSchema: org.apache.spark.sql.types.StructType
  ): StreamingQuery = {
    val pages = spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", 4)
      .parquet(inputDir)

    pages.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        KgEngine.extractCanonical(batch.sparkSession, batch.toDF()).toDF()
          .write.mode("append").parquet(outputDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
