package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data window preparation: token chunking and sequence
  * packing — the two ops between a cleaned document table and a
  * context-window-shaped training set.
  *
  * Chunking is pure Column expressions (per-row, no shuffle — scales
  * linearly). Packing is the standard per-partition greedy first-fit:
  * optimal bin packing is NP-hard and needs global state, so the
  * accepted large-scale practice is independent packing within each
  * partition, which stays shuffle-free and loses only a fraction of a
  * window per partition boundary.
  */
object Chunking {

  /** Split each document into overlapping windows of `maxTokens`
    * whitespace tokens, stepping `maxTokens - overlap` per chunk:
    * (id, chunk_index, chunk_text, chunk_tokens). Chunk text is the
    * normalized token join (as [[TextOps.tokens]] sees it).
    */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val step = maxTokens - overlap
    val chunks: Column = transform(
      sequence(lit(0L), col("_n") - 1),
      i => array_join(slice(col("_toks"), (i * step + 1).cast("int"), lit(maxTokens)), " "))
    df.withColumn("_toks", TextOps.tokens(col(textCol)))
      .withColumn("_n",
        greatest(lit(1L), ceil((size(col("_toks")) - lit(overlap)) / lit(step.toDouble)).cast("long")))
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_index", "chunk_text")))
      .select(
        col(idCol),
        col("chunk_index").cast("long").as("chunk_index"),
        col("chunk_text"),
        size(TextOps.tokens(col("chunk_text"))).cast("long").as("chunk_tokens"))
  }

  private val packSchema = StructType(Seq(
    StructField("pack_id", StringType, nullable = false),
    StructField("doc_ids", ArrayType(LongType), nullable = false),
    StructField("n_docs", IntegerType, nullable = false),
    StructField("total_tokens", LongType, nullable = false)))

  /** Greedy first-fit packing of (id, token count) rows into
    * `budget`-token bins, independently per partition. A document
    * larger than the budget gets its own pack. Deterministic for a
    * fixed partitioning; `sortWithinPartitions` upstream if a stable
    * order matters.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(nTokensCol).cast("long")).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rows = it.buffered
        new Iterator[Row] {
          private var k = 0
          def hasNext: Boolean = rows.hasNext
          def next(): Row = {
            val ids = Seq.newBuilder[Long]
            var total = 0L
            var n = 0
            var full = false
            while (rows.hasNext && !full) {
              val t = rows.head.getLong(1)
              if (n > 0 && total + t > budget) full = true
              else {
                ids += rows.next().getLong(0)
                total += t
                n += 1
                // oversized singleton occupies its own pack
                if (total >= budget) full = true
              }
            }
            val row = Row(s"$pid-$k", ids.result(), n, total)
            k += 1
            row
          }
        }
      }
    spark.createDataFrame(rdd, packSchema)
  }
}
