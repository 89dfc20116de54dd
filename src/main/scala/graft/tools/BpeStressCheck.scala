package graft.tools

import graft.ops.Bpe

/** Production-K BPE evidence (VERDICT r4 what's-missing #2 done-criterion):
  * train a K≈32k merge list with the exact incremental LOCAL path (the
  * production dispatch for any vocabulary within the driver budget — zero
  * distributed jobs) and drive the FAST min-rank encoder at that K on the
  * full stream, with the rank-indexed fallback timed on a slice and the
  * literal O(K·len) naive loop as the sampled equality oracle.
  *
  * No Spark session: all paths under test are the driver/executor-local
  * kernels (`trainLocalMerges`, `MergeIndex.encode`/`encodeIndexed`);
  * their distributed wrappers are oracle-checked by
  * q_bpe_train/q_bpe_encode and the BpeBatchSpec byte-identity properties.
  *
  * Prints one JSON line:
  * {"bench":"bpe_stress","merges":K,"vocab":V,"train_sec":…,
  *  "fast_words_per_sec":…,"indexed_words_per_sec":…,
  *  "naive_words_per_sec":…,"speedup_vs_naive":…,"sample_equal":…}
  */
object BpeStressCheck {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 32000
    val vocabN = if (args.length > 1) args(1).toInt else 60000
    val streamN = if (args.length > 2) args(2).toInt else 400000

    // deterministic Zipf-ish vocabulary over 26 letters: enough distinct
    // adjacent structure that K=32k merges exist and deep merge chains form
    val rng = new java.util.Random(11)
    val vocab = Iterator.continually {
      val len = 3 + rng.nextInt(10)
      (0 until len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    }.distinct.take(vocabN).toArray
    val words = vocab.zipWithIndex.map { case (w, i) =>
      (Bpe.codePointSyms(w), math.max(1L, 100000L / (i + 1)))
    }.toIndexedSeq

    val t0 = System.nanoTime()
    val merges = Bpe.trainLocalMerges(words, k).map(m => (m._2, m._3))
    val trainSec = (System.nanoTime() - t0) / 1e9
    require(merges.length == k,
      s"corpus exhausted at ${merges.length} merges — grow vocabN")

    val idx = new Bpe.MergeIndex(merges.toArray)
    // encode stream: 50% hot-1k / 50% full-vocab tail plus unseen words
    // (every 11th — partial merge coverage on words training never saw)
    def stream(): Iterator[String] = {
      val r = new java.util.Random(7)
      Iterator.tabulate(streamN) { i =>
        if (i % 11 == 0) vocab(r.nextInt(vocab.length)) + "zq" + (i % 97)
        else if (i % 2 == 0) vocab(r.nextInt(1000))
        else vocab(r.nextInt(vocab.length))
      }
    }
    stream().take(50000).foreach(idx.encode) // JIT warmup
    val t1 = System.nanoTime()
    var pieces = 0L
    stream().foreach(w => pieces += idx.encode(w).length)
    val fastWps = streamN / ((System.nanoTime() - t1) / 1e9)

    // the fallback indexed path, on a slice (it is the exact path for
    // duplicate-merged-string lists; here it is the comparison point)
    val idxSlice = stream().take(20000).toArray
    idxSlice.foreach(idx.encodeIndexed)
    val t2 = System.nanoTime()
    idxSlice.foreach(idx.encodeIndexed)
    val indexedWps = idxSlice.length / ((System.nanoTime() - t2) / 1e9)

    // the naive O(K·len) loop is the semantics oracle — equality on a
    // sample, throughput on a small slice (running it on the full stream
    // at K=32k would take hours, which is the point)
    val sample = stream().take(500).toArray
    val equal = sample.forall { w =>
      val fast = idx.encode(w)
      fast == Bpe.encodePiecesNaive(w, merges) && fast == idx.encodeIndexed(w)
    }
    val t3 = System.nanoTime()
    sample.foreach(w => Bpe.encodePiecesNaive(w, merges))
    val naiveWps = sample.length / ((System.nanoTime() - t3) / 1e9)

    println(f"""{"bench":"bpe_stress","merges":$k,"vocab":${vocab.length},"train_sec":$trainSec%.1f,"fast_words_per_sec":$fastWps%.0f,"indexed_words_per_sec":$indexedWps%.0f,"naive_words_per_sec":$naiveWps%.0f,"speedup_vs_naive":${fastWps / naiveWps}%.0f,"sample_equal":$equal}""")
  }
}
