package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}

/** The one `private[sql]` bridge this engine needs: a v1 streaming
  * [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch` must
  * return a DataFrame whose logical plan is flagged `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only constructor for that is
  * `SQLContext.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * `private[sql]`, so this shim lives under `org.apache.spark.sql` like
  * every pre-DSv2 connector's did (the spark-kafka-0-10 pattern). The
  * wrapped RDD is the batch plan's compiled physical output, so the work
  * still runs distributed when the sink consumes it; nothing is
  * collected here. */
object StreamingShim {
  def asStreaming(sqlContext: SQLContext, df: DataFrame): DataFrame =
    sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, df.schema, isStreaming = true)
}
