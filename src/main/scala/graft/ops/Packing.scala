package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing for training-batch construction: assign each
  * document to a token-capacity bin (first-fit-decreasing), the step that
  * turns a curated corpus into fixed-budget training shards with minimal
  * padding. Complements [[TextOps.packIndex]] (which cuts a concatenated
  * stream at exact token offsets): packing keeps documents WHOLE and
  * accepts padding waste; the index splits documents and wastes nothing.
  *
  * Determinism contract: the full layout is a pure function of
  * (capacity, nBuckets) and the corpus — bucket = first 16 bits of
  * md5(doc_id) mod nBuckets (reproducible by any md5 implementation),
  * in-bucket order = (n_tokens DESC, doc_id ASC), bins first-fit in that
  * order. Independent of Spark parallelism, partitioning, and input order;
  * the golden oracle replays it in pure Python.
  *
  * Scale shape: packing state is inherently sequential, so it runs
  * per-BUCKET — but over METADATA ONLY (doc_id, n_tokens: 16 bytes/doc;
  * the text never enters the groupBy). One hash exchange of the metadata
  * into nBuckets groups, each packed in one task with an O(bins) scan per
  * doc. Choose nBuckets ≈ corpus_docs / 10^6 at scale (16-bit bucket space
  * = 65,536 buckets ≈ 6×10^10 docs at that sizing); the in-task state is
  * just the bin-load array. Oversized documents (n_tokens > capacity) get
  * bin = -1 — the caller must split or drop them; silently truncating
  * inside a packer would corrupt token accounting.
  */
object Packing {

  def greedyPack(
      documents: DataFrame,
      capacity: Int,
      nBuckets: Int = 8): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(nBuckets >= 1 && nBuckets <= 65536,
      s"nBuckets must be in [1, 65536]: $nBuckets")
    val spark = documents.sparkSession
    import spark.implicits._
    val meta = documents
      .filter(col("doc_id").isNotNull)
      .select(
        col("doc_id").cast("long"),
        // null text = zero tokens — a null here would NPE the primitive
        // tuple encoder below, killing the job on one bad crawl row
        coalesce(TextOps.tokenCountCol(col("text")), lit(0))
          .cast("long").as("n_tokens"),
        pmod(
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long"), lit(nBuckets.toLong))
          .cast("int").as("bucket"))
    meta.as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroups { (bucket: Int, it: Iterator[(Long, Long, Int)]) =>
        // metadata-scale per task: 16 B/doc; sort once, pack in one pass
        val docs = it.toArray.sortBy(d => (-d._2, d._1))
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.iterator.map { case (id, n, _) =>
          if (n > capacity) (id, n, bucket, -1)
          else {
            var i = 0
            while (i < loads.length && loads(i) + n > capacity) i += 1
            if (i == loads.length) loads += n else loads(i) += n
            (id, n, bucket, i)
          }
        }
      }
      .toDF("doc_id", "n_tokens", "bucket", "bin")
  }
}
