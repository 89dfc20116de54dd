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

  /** "Leftmost bin with remaining capacity ≥ n" in O(log B): a max-segment
    * tree over bin remaining capacities, descending into the leftmost child
    * whose max admits n — which IS the first-fit bin. Unopened bins carry
    * remaining = capacity, so the leftmost admitting leaf is never past the
    * first unopened bin: the result is bit-identical to a linear first-fit
    * scan over an open-bin list, without its O(docs × bins) worst case (an
    * all-large-docs bucket where no two documents share a bin would
    * otherwise cost ~docs²/2 comparisons in ONE task). Transient state:
    * 2 longs per potential bin (≤ 32 B/doc for the pathological
    * one-doc-per-bin bucket) — still metadata-scale.
    */
  private final class FirstFitTree(maxBins: Int, capacity: Long) {
    private val size = {
      var s = 1
      while (s < maxBins) s <<= 1
      s
    }
    private val rem = Array.fill(2 * size)(capacity)

    /** Place weight n (requires n ≤ capacity); returns the bin index. */
    def place(n: Long): Int = {
      var i = 1
      while (i < size) {
        i <<= 1
        if (rem(i) < n) i += 1
      }
      val leaf = i - size
      rem(i) -= n
      i >>= 1
      while (i >= 1) {
        rem(i) = math.max(rem(2 * i), rem(2 * i + 1))
        i >>= 1
      }
      leaf
    }
  }

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
        // metadata-scale per task: sort once, then each placement is an
        // O(log bins) first-fit descent (see FirstFitTree — identical
        // layout to a linear scan, minus its quadratic worst case)
        val docs = it.toArray.sortBy(d => (-d._2, d._1))
        val tree = new FirstFitTree(math.max(1, docs.length), capacity.toLong)
        docs.iterator.map { case (id, n, _) =>
          if (n > capacity) (id, n, bucket, -1)
          else (id, n, bucket, tree.place(n))
        }
      }
      .toDF("doc_id", "n_tokens", "bucket", "bin")
  }
}
