package graft.pipeline

import graft.align._
import graft.ops.{Dedup, Multimodal, TextOps}
import org.apache.spark.sql.SparkSession

/** Registered SQL functions so single kernel ops are testable from SQL
  * (SURVEY.md §4 "what needs custom code" item 2). The relational pipeline
  * itself prefers Catalyst built-ins; these UDFs exist for the ops that
  * genuinely can't be expressed (alignment, syllabification, language-ID,
  * fingerprints).
  */
object Functions {
  def register(spark: SparkSession): Unit = {
    // idempotent per session: queries call register() freely; re-registering
    // every function spams SimpleFunctionRegistry replace-warnings into
    // driver logs (VERDICT r1 #10)
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("clean_text"))) return
    // native codegen'd Catalyst expression (preferred over a UDF: no boxing,
    // stays inside whole-stage codegen)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_f32",
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    // typed Aggregator UDAF: union bounding box (partial + final merge)
    spark.udf.register("bbox_union",
      org.apache.spark.sql.functions.udaf(new graft.functions.BBoxUnionAggregator))
    spark.udf.register("clean_text", (s: String) => CleanText.clean(if (s == null) "" else s))
    spark.udf.register("extract_text", (b: Array[Byte]) => ExtractHtml.extractText(b))
    spark.udf.register("syllabify", new (String => Seq[String]) with Serializable {
      // per-deserialization (≈ per-task) memo — pure function, Zipf vocab
      @transient private lazy val cache = new Syllabify.Cache
      def apply(s: String): Seq[String] =
        Syllabify.syllabifyText(if (s == null) "" else s, cache)
    })
    spark.udf.register("lang_id", (s: String) => TextOps.langIdOf(s))
    spark.udf.register("nfc_normalize", (s: String) => TextOps.nfcOf(s))
    spark.udf.register("doc_fingerprint", (s: String) => TextOps.fingerprintOf(if (s == null) "" else s))
    spark.udf.register("simhash64", (s: String) => Dedup.simhashOf(if (s == null) "" else s))
    spark.udf.register("ngram_jaccard",
      (a: String, b: String) => Dedup.jaccard(if (a == null) "" else a, if (b == null) "" else b))
    spark.udf.register("winnow_similarity",
      (a: String, b: String) => TextOps.winnowSimilarity(if (a == null) "" else a, if (b == null) "" else b))
    spark.udf.register("align_spans_json", (transcript: String, html: Array[Byte]) => {
      val r = AlignKernel.process(transcript, html)
      SpanProject.toJson(r.spans, Array.empty)
    })
  }
}
