package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-document distinctive-term extraction — the tf-idf-shaped keyword
  * table (topical tags, index terms, per-doc summaries) kept INTEGER-exact:
  * ranking is `(tf DESC, df ASC, term ASC)` — frequent in the document,
  * rare in the corpus, total order broken by the term itself — and the
  * output carries raw `tf`/`df`/rank so any idf weighting is one map away.
  * A float tf·idf score is deliberately NOT computed here: `ln` is not
  * bit-pinned across engines (Java fdlibm vs libm), and the ordering above
  * is tf-idf's ordering whenever tf dominates — the exactness contract of
  * the oracle corpus wins over a cosmetic score column.
  *
  * Scale shape: explode → (doc,term) count (partial map-side) → term df
  * table (one row per term) → hash join tf⋈df on term (hot terms probe a
  * single build row) → per-doc top-k window. The window partitions by
  * doc_id, so its sort is bounded by a document's own distinct-term count —
  * no skew task exists unless one document is itself corpus-sized.
  */
object Terms {

  /** (doc_id, text) → (doc_id, term, tf, df, rnk ≤ k). */
  def topTermsPerDoc(documents: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tf = documents
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), t => t =!= lit(""))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, Seq("term"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"))
  }
}
