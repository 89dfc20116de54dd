package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 second-wave operators: pack-index prefix sum, shard assignment,
  * C4 line filter, cross-document line dedup — semantics at small scale plus
  * the plan shapes their 100 TB stories claim (bucketed windows only, no
  * global-order window over data).
  */
class PackShardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("withGlobalCumsum: forced scaled path == plain window, nulls count 0") {
    import spark.implicits._
    // adversarial values: nulls, zeros, duplicates in value space; keys
    // deterministic but non-contiguous
    val rows = (0 until 3000).map { i =>
      val k = (i.toLong * 7919) % 100003
      val v: java.lang.Long =
        if (i % 17 == 0) null else java.lang.Long.valueOf((i % 23).toLong)
      (k, v)
    }
    val df = rows.toDF("k", "v")
    val scaled = graft.ops.ScaleWindows
      .withGlobalCumsum(df, "k", "v", "c", smallInputThreshold = 0)
      .select($"k", $"c").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sorted = rows.sortBy(_._1)
    var acc = 0L
    sorted.foreach { case (k, v) =>
      acc += (if (v == null) 0L else v.longValue())
      assert(scaled(k) == acc, s"cumsum mismatch at key $k")
    }
  }

  test("q_pack_index plan: every window is __bkt-partitioned (no global-order window)") {
    val plan = graft.SparkEntry.queries("q_pack_index")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty, s"no Window in plan:\n${plan.take(3000)}")
    windowLines.foreach { l =>
      assert(l.contains("__bkt"), s"global-order window in pack index: $l")
    }
  }

  test("shardAssign: md5-deterministic, positions contiguous per shard, window shard-partitioned") {
    val out = graft.ops.Sampling
      .shardAssign(spark.read.parquet(s"$sfDir/documents.parquet"), 8)
    val rows = out.select(col("doc_id"), col("shard"), col("shard_pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length == rows.length)
    // every shard's positions are exactly 1..count (row_number contract)
    rows.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"shard $s positions not contiguous")
    }
    // spot-check one md5 fold against the JDK (the oracle recomputes in
    // DuckDB): shard = leading 32 bits of the md5, pmod nShards
    val id = rows.head._1
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val fold = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    assert(rows.head._2 == (fold % 8).toInt)
    // the position window partitions by shard — never a global sort window
    val plan = out.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Window [")).foreach { l =>
      assert(l.contains("shard"), s"window not shard-partitioned: $l")
    }
  }

  test("shardAssign scaled path: identical layout, no shard-only window, any fan-out") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"))
    // nShards=256 (the q_shard configuration) and a non-power-of-two
    // fan-out: the two-pass bucketed positions must equal the per-shard
    // window form row for row
    for (n <- Seq(256, 5)) {
      val small = graft.ops.Sampling.shardAssign(docs, n)
        .select(col("doc_id"), col("shard"), col("shard_pos"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
      val scaled = graft.ops.Sampling.shardAssign(docs, n, forceScaled = true)
        .select(col("doc_id"), col("shard"), col("shard_pos"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
      assert(small.toSeq == scaled.toSeq, s"scaled != window form at nShards=$n")
    }
    // plan shape: in the scaled plan, NO window over data is partitioned by
    // shard alone — the data-scale row_number runs per (shard, __bkt) and
    // the only shard-partitioned window is the metadata-scale offsets table
    // (its child aggregates on (shard, __bkt) — identifiable by __cnt)
    val plan = graft.ops.Sampling.shardAssign(docs, 256, forceScaled = true)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__bkt"), s"scaled path missing bucket machinery:\n${plan.take(2000)}")
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty)
    windowLines.foreach { l =>
      assert(l.contains("__bkt") || l.contains("__cnt"),
        s"data-scale window bounded by shard count alone: $l")
    }
  }

  test("greedyPack: capacity respected, oversized flagged -1, layout parallelism-independent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Packing.greedyPack(df, capacity = 64, nBuckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .sortBy(_._1).toSeq
    val out = run(docs)
    assert(out.nonEmpty && out.length == docs.count())
    // oversized ⇔ bin = -1; every real bin's load ≤ capacity
    out.foreach { case (_, n, _, bin) => assert((n > 64) == (bin == -1)) }
    out.filter(_._4 >= 0).groupBy(r => (r._3, r._4)).foreach { case (k, rs) =>
      assert(rs.map(_._2).sum <= 64, s"bin $k over capacity")
    }
    assert(out.exists(_._4 == -1), "capacity must bind on this corpus")
    assert(out.exists(_._4 >= 1), "packing must open multiple bins")
    // the segment-tree placement must equal a plain linear first-fit scan
    out.groupBy(_._3).foreach { case (_, rs) =>
      val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
      rs.sortBy(r => (-r._2, r._1)).foreach { case (_, n, _, bin) =>
        if (n > 64) assert(bin == -1)
        else {
          var i = 0
          while (i < loads.length && loads(i) + n > 64) i += 1
          if (i == loads.length) loads += n else loads(i) += n
          assert(bin == i, s"tree first-fit diverged from linear scan at n=$n")
        }
      }
    }
    // identical layout regardless of input partitioning/order
    assert(run(docs.repartition(13).sortWithinPartitions(col("text"))) == out)
  }

  test("minhashJoin recall: every mutated eval doc fuzzy-matches its source (second size)") {
    // same synthesis as q_minhash_join but at sf0.001 — the multi-size
    // recall assertion the ANN family also carries
    val out = graft.SparkEntry.queries("q_minhash_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sources = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 17 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(sources.nonEmpty)
    sources.foreach { id =>
      assert(out.contains((id, id + 9000000L)),
        s"eval doc ${id + 9000000L} failed to match its source $id")
    }
  }

  test("decontaminate: drop removes exactly the matched docs; flag argmaxes " +
      "by (jaccard, eval_id) with deterministic ties") {
    import spark.implicits._
    // t1 matches e1 strongly and e2 weakly; t2 matches nothing; t3 matches
    // e2 and e3 with IDENTICAL text (tied jaccard 1.0 -> larger id wins)
    val common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val training = Seq(
      (1L, common + " one more"),
      (2L, "совершенно unrelated текст без каких-либо совпадений вообще"),
      (3L, common)).toDF("doc_id", "text")
    val evalSet = Seq(
      (101L, common + " one extra"),
      (102L, common),
      (103L, common)).toDF("doc_id", "text")
    val dropped = graft.ops.Dedup.decontaminate(training, evalSet, threshold = 0.5)
    assert(dropped.columns.toSeq == Seq("doc_id", "text"))
    assert(dropped.select("doc_id").as[Long].collect().toSet == Set(2L))
    val flagged = graft.ops.Dedup
      .decontaminate(training, evalSet, threshold = 0.5, mode = "flag")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(flagged.map(f => (f._1, f._2)) == Seq((1L, 101L), (3L, 103L)),
      s"argmax mismatch: $flagged")
    assert(flagged(1)._3 == 1.0)
  }

  test("Bpe.applyMerge: left-to-right non-overlapping; train stops when exhausted") {
    import spark.implicits._
    assert(graft.ops.Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(graft.ops.Bpe.applyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(graft.ops.Bpe.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    // two distinct words, 'ab' (freq 2) and 'cd' (freq 1): merges exhaust
    // after 2 rounds no matter how many are requested, in count-then-lex
    // order
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val merges = graft.ops.Bpe.train(docs, numMerges = 10)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    assert(merges == Seq((1, "ab", 2L), (2, "cd", 1L)))
  }

  test("c4LineFilter semantics: punctuation + min-words rules, empty survivor is '' not null") {
    import spark.implicits._
    val df = Seq(
      (1L, "good line stays here.\nshort one.\nno punctuation at all\nanother keeper right here!"),
      (2L, "nothing survives this doc"),
      (3L, "")).toDF("doc_id", "text")
    val out = graft.ops.TextOps.c4LineFilter(df, minWords = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) ==
      "good line stays here.\nanother keeper right here!")
    assert(out(0).getInt(3) == 2 && out(0).getInt(2) == 4)
    assert(out(1).getString(1) == "" && out(1).getInt(3) == 0)
    assert(out(2).getString(1) == "" && out(2).getInt(2) == 1)
  }

  test("crossDocLineDedup: shared lines vanish everywhere, fully-deduped doc stays as ''") {
    import spark.implicits._
    val df = Seq(
      (1L, "unique alpha\nshared boilerplate line\nunique beta"),
      (2L, "shared boilerplate line\nunique gamma\n\nunique delta"),
      (3L, "shared boilerplate line"),
      (4L, "also shared twice\nkept here"),
      (5L, "also shared twice")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.crossDocLineDedup(df)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(out == Seq(
      (1L, "unique alpha\nunique beta", 2),
      (2L, "unique gamma\n\nunique delta", 3), // empty line is structure: kept
      (3L, "", 0),
      (4L, "kept here", 1),
      (5L, "", 0)))
  }

  test("q_line_dedup plan: df aggregate shuffles hashes with map-side partial, never line text") {
    val q = graft.SparkEntry.queries("q_line_dedup")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"expected map-side partial distinct-doc count:\n${plan.take(3000)}")
    // no exchange ever partitions DIRECTLY on a raw line attribute — the
    // df aggregate keys on the 64-bit xxhash64 grouping expression and the
    // reassembly on doc_id. (The membership join may legitimately carry
    // text as PAYLOAD under a non-broadcast plan at larger scale, keyed on
    // the hash — only `hashpartitioning(line#...)` would be a regression.)
    val ex = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty)
    ex.foreach(l => assert(!l.contains("hashpartitioning(line#"),
      s"exchange partitioned on raw line text: $l"))
  }
}
