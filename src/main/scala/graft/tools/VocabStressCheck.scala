package graft.tools

import graft.align.Syllabify

/** Adversarial-vocabulary memo check (VERDICT r2 #6 done-criterion): a
  * Zipf-ish stream (50% from 1k hot words, 50% from a 200k-word tail, so
  * the distinct vocabulary far exceeds the 64k cache) must show NO
  * throughput cliff with the LRU cache vs an effectively unbounded one.
  * The old full-`clear()` eviction flushed the hot words on every overflow;
  * LRU keeps them resident while the tail churns.
  */
object VocabStressCheck {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 400000
    val hot = Array.tabulate(1000)(i => s"dominus$i")
    val tail = Array.tabulate(200000)(i => s"alleluia$i")
    def corpus(): Iterator[String] = {
      val rng = new java.util.Random(5)
      Iterator.tabulate(n) { i =>
        if (i % 2 == 0) hot(rng.nextInt(hot.length)) else tail(rng.nextInt(tail.length))
      }
    }
    def run(maxE: Int): Double = {
      val c = new Syllabify.Cache(maxE)
      val t0 = System.nanoTime()
      corpus().foreach(c.get)
      n / ((System.nanoTime() - t0) / 1e9)
    }
    run(1 << 16) // JIT warmup
    val lru = run(1 << 16)
    val unbounded = run(1 << 21)
    val distinct = corpus().toSet.size // what the cache actually saw
    println(f"""{"bench":"vocab_stress","words":$n,"distinct":$distinct,"lru64k_words_per_sec":$lru%.0f,"unbounded_words_per_sec":$unbounded%.0f,"ratio":${lru / unbounded}%.3f}""")
  }
}
