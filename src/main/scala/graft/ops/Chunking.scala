package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-window chunking with stride overlap — the step that turns cleaned
  * documents into embedding-model inputs (retrieval corpora index chunks,
  * not documents, and adjacent chunks overlap so no span is ever split
  * across an un-overlapped boundary).
  *
  * Token definition is the repo-wide contract ([[TextOps.tokenCountCol]]'s
  * non-empty space tokens), so a chunk budget and a packer budget count the
  * same tokens. Chunk starts are `0, stride, 2·stride, …` while `start <
  * n_tokens`; the final chunk may be short. Zero-token documents (empty or
  * all-space text, or null) emit NO chunks — an empty chunk has no
  * embedding.
  *
  * Scale shape: IDEAL — pure higher-order Catalyst expressions
  * (split/filter/sequence/posexplode/slice/array_join), per-row, zero
  * shuffle, whole-stage codegen; the output is a scan-shaped table ~
  * n_tokens/stride rows per doc. At 100 TB the cost is the read and the
  * write, which is the floor for any chunker.
  */
object Chunking {

  /** (doc_id, text) → (doc_id, chunk_id, chunk_text, n_tokens). */
  def chunkByTokens(
      documents: DataFrame,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize]: stride=$stride chunkSize=$chunkSize")
    documents
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => t =!= lit("")).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(
        col("doc_id"),
        col("pos").cast("int").as("chunk_id"),
        array_join(slice(col("__toks"), col("col") + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize), col("__n") - col("col")).cast("int").as("n_tokens"))
  }
}
