package graft.align

import scala.collection.mutable.ArrayBuffer

/** Result of a char-level alignment.
  *
  * @param traAlign gapped transcript string ('_' = gap)
  * @param ocrAlign gapped noisy-stream string ('_' = gap)
  * @param bandUsed final band half-width that produced the accepted result
  *                 (0 = full matrix / not banded)
  * @param cellsFilled total DP cells filled across all banding attempts
  * @param note non-empty when the giant-document policy engaged:
  *             `band_capped:<b>` (result from the widest runnable band,
  *             accepted WITHOUT full agreement) or `band_overflow_drop:<b>`
  *             (no runnable band produced an in-band traceback; alignment
  *             dropped). Surfaces in the metrics table's `error` column so a
  *             10^12-row run can count and re-route these documents.
  */
final case class AlignResult(
    traAlign: String,
    ocrAlign: String,
    bandUsed: Int,
    cellsFilled: Long,
    note: String = "")

/** Needleman–Wunsch global alignment with affine gaps (Gotoh three-matrix DP).
  *
  * Faithful re-derivation of the reference kernel
  * (textSeqCompare.py:13-177) including its quirks:
  *   - a `' '` sentinel is appended to BOTH sequences before the DP
  *     (textSeqCompare.py:21-22) and the forced sentinel-pair alignment is
  *     later dropped by the `[-1:0:-1]` reversal (textSeqCompare.py:104-107,
  *     167-170);
  *   - boundary rows/cols use the module constant `gap_extend = -1`
  *     (textSeqCompare.py:9, 53-60), NOT the scoring system's extend costs;
  *   - off-matrix states are seeded with `-1e100` (textSeqCompare.py:55,60);
  *   - argmax ties are broken by FIRST index in the exact candidate orders of
  *     textSeqCompare.py:70, 75-77, 83-85;
  *   - the traceback starts at the bottom-right cell, forcibly aligning the
  *     sentinel chars, and drains any leftover prefix
  *     (textSeqCompare.py:96-170).
  *
  * Two implementations are provided:
  *   - [[alignTokens]] — literal-semantics port over token sequences (full
  *     matrices); the correctness anchor, used by golden tests;
  *   - [[alignChars]] — char-specialized banded DP (O(n·b) fill, rolling
  *     score rows, in-band pointer storage) that self-verifies: if the
  *     traceback path comes within a safety margin of the band edge the band
  *     is doubled and the alignment re-run, falling back to the full matrix.
  *     Property tests assert banded == full on randomized inputs.
  */
object NeedlemanWunsch {

  import Scoring.{BoundaryGapExtend, NegInf}

  /** Reusable grow-only DP buffers. One instance per partition (kernel
    * reused across rows inside mapPartitions — SURVEY.md §3) removes the
    * per-document allocation of the rolling rows and pointer storage.
    * NOT thread-safe; one per task.
    */
  final class Workspace {
    private[align] var rows: Array[Array[Double]] = Array.fill(6)(new Array[Double](0))
    private[align] var lrows: Array[Array[Long]] = Array.fill(6)(new Array[Long](0))
    private[align] var ptrs: Array[Byte] = new Array[Byte](0)
    private[align] var ocrChars: Array[Char] = new Array[Char](0)
    private[align] def ensureRows(m: Int): Unit =
      if (rows(0).length < m) rows = Array.fill(6)(new Array[Double](m))
    private[align] def ensureRowsLong(m: Int): Unit =
      if (lrows(0).length < m) lrows = Array.fill(6)(new Array[Long](m))
    private[align] def ensurePtrs(sz: Int): Unit =
      if (ptrs.length < sz) ptrs = new Array[Byte](sz)
    /** The OCR stream copied into a flat char array once per fill — the
      * inner loop reads it once per cell, and `String.charAt`'s indirection
      * + bounds check is measurable at ~10 ns/cell total loop cost
      * (optimization round 7).
      */
    private[align] def ocrArray(s: String): Array[Char] = {
      if (ocrChars.length < s.length) ocrChars = new Array[Char](s.length)
      s.getChars(0, s.length, ocrChars, 0)
      ocrChars
    }
  }

  /** First index of the maximum of three values (Python
    * `vals.index(max(vals))` — first-wins on ties, textSeqCompare.py:72).
    */
  @inline private def argmax3(v0: Double, v1: Double, v2: Double): Int = {
    var best = 0
    var bv = v0
    if (v1 > bv) { best = 1; bv = v1 }
    if (v2 > bv) { best = 2; bv = v2 }
    best
  }

  @inline private def max3(v0: Double, v1: Double, v2: Double): Double = {
    var bv = v0
    if (v1 > bv) bv = v1
    if (v2 > bv) bv = v2
    bv
  }

  /** Literal-semantics port of `perform_alignment` over token sequences
    * (textSeqCompare.py:13-177). Full O(n·m) matrices — correctness anchor.
    */
  def alignTokens(
      transcriptIn: IndexedSeq[String],
      ocrIn: IndexedSeq[String],
      scoring: Scoring = Scoring.Default): (Vector[String], Vector[String]) = {

    // sentinel padding (textSeqCompare.py:21-22)
    val tra = transcriptIn :+ " "
    val ocr = ocrIn :+ " "
    val n = tra.length
    val m = ocr.length

    val mat = Array.ofDim[Double](n, m)
    val xMat = Array.ofDim[Double](n, m)
    val yMat = Array.ofDim[Double](n, m)
    val matPtr = Array.ofDim[Byte](n, m)
    val xPtr = Array.ofDim[Byte](n, m)
    val yPtr = Array.ofDim[Byte](n, m)

    // boundary conditions (textSeqCompare.py:53-60)
    var i = 0
    while (i < n) {
      mat(i)(0) = BoundaryGapExtend * i
      xMat(i)(0) = NegInf
      yMat(i)(0) = BoundaryGapExtend * i
      i += 1
    }
    var j = 0
    while (j < m) {
      mat(0)(j) = BoundaryGapExtend * j
      xMat(0)(j) = BoundaryGapExtend * j
      yMat(0)(j) = NegInf
      j += 1
    }

    // fill (textSeqCompare.py:62-88)
    i = 1
    while (i < n) {
      j = 1
      while (j < m) {
        val matchScore = scoring.score(tra(i - 1), ocr(j - 1))

        val m0 = mat(i - 1)(j - 1); val m1 = xMat(i - 1)(j - 1); val m2 = yMat(i - 1)(j - 1)
        mat(i)(j) = max3(m0, m1, m2) + matchScore
        matPtr(i)(j) = argmax3(m0, m1, m2).toByte

        val y0 = mat(i)(j - 1) + scoring.gapOpenY + scoring.gapExtendY
        val y1 = xMat(i)(j - 1) + scoring.gapOpenY + scoring.gapExtendY
        val y2 = yMat(i)(j - 1) + scoring.gapExtendY
        yMat(i)(j) = max3(y0, y1, y2)
        yPtr(i)(j) = argmax3(y0, y1, y2).toByte

        val x0 = mat(i - 1)(j) + scoring.gapOpenX + scoring.gapExtendX
        val x1 = xMat(i - 1)(j) + scoring.gapExtendX
        val x2 = yMat(i - 1)(j) + scoring.gapOpenX + scoring.gapExtendX
        xMat(i)(j) = max3(x0, x1, x2)
        xPtr(i)(j) = argmax3(x0, x1, x2).toByte
        j += 1
      }
      i += 1
    }

    // traceback (textSeqCompare.py:96-170)
    val traAlign = new ArrayBuffer[String](n + m)
    val ocrAlign = new ArrayBuffer[String](n + m)
    var xpt = n - 1
    var ypt = m - 1
    var mpt: Int = matPtr(xpt)(ypt)

    // forced sentinel alignment (textSeqCompare.py:104-107)
    traAlign += tra(xpt)
    ocrAlign += ocr(ypt)

    while (xpt > 0 && ypt > 0) {
      if (mpt == 0) {
        traAlign += tra(xpt - 1)
        ocrAlign += ocr(ypt - 1)
        mpt = matPtr(xpt)(ypt)
        xpt -= 1; ypt -= 1
      } else if (mpt == 1) {
        traAlign += tra(xpt - 1)
        ocrAlign += "_"
        mpt = xPtr(xpt)(ypt)
        xpt -= 1
      } else {
        traAlign += "_"
        ocrAlign += ocr(ypt - 1)
        mpt = yPtr(xpt)(ypt)
        ypt -= 1
      }
    }
    while (ypt > 0) {
      traAlign += "_"; ocrAlign += ocr(ypt - 1); ypt -= 1
    }
    while (xpt > 0) {
      ocrAlign += "_"; traAlign += tra(xpt - 1); xpt -= 1
    }

    // `[-1:0:-1]` — reverse dropping element 0 (the sentinel pair)
    (traAlign.tail.reverse.toVector, ocrAlign.tail.reverse.toVector)
  }

  /** Default initial band half-width for the banded fast path. */
  val DefaultInitialBand: Int = 64

  /** Minimum band half-width the banded path will run. Degenerate bands
    * (1–8) produce stable-but-wrong outputs far more often (measured
    * 211/8000 at bands 1–5 — see graft.tools.BandSweep).
    */
  val MinBand: Int = 16

  /** Consecutive agreeing band doublings required before a banded result is
    * accepted (bands b, 2b, 4b must produce identical output). Measured on
    * ≤60-char adversarial gibberish — the worst case, where the band is a
    * large fraction of the matrix — single agreement is wrong ≈0.2% of the
    * time; production documents only reach this path above the full-matrix
    * threshold (band ≤3% of the matrix), where the long-document
    * differential suite shows byte-identity against the reference.
    */
  val AgreementStreak: Int = 2

  /** Below this many DP cells the full matrix is run directly — guaranteed
    * byte-identical by construction (and banding wouldn't win at this size).
    * 16M cells ≈ 4k×4k chars ≈ 48 MB of packed pointers per in-flight doc.
    */
  val FullMatrixCellThreshold: Long = 16L * 1000 * 1000

  /** Char-level alignment. Small problems run the full matrix (exact by
    * construction). Large problems use the banded fast path (O(n·band) fill)
    * with a doubling-agreement acceptance rule — see [[alignCharsBanded]].
    */
  def alignChars(
      transcript: String,
      ocrStream: String,
      scoring: Scoring = Scoring.Default,
      initialBand: Int = DefaultInitialBand,
      ws: Workspace = new Workspace): AlignResult = {
    val n = transcript.length + 1L
    val m = ocrStream.length + 1L
    if (n * m <= FullMatrixCellThreshold)
      alignCharsFull(transcript, ocrStream, scoring, ws)
    else
      alignCharsBanded(transcript, ocrStream, scoring, initialBand, ws)
  }

  /** Full-matrix char alignment (band = m covers every column). */
  def alignCharsFull(
      transcript: String,
      ocrStream: String,
      scoring: Scoring,
      ws: Workspace = new Workspace): AlignResult = {
    val m = ocrStream.length + 1
    val (res, cells) = alignCharsWithBand(transcript, ocrStream, scoring, m, ws)
    val (ta, oa) = res.get // full band never aborts
    AlignResult(ta, oa, 0, cells)
  }

  /** Banded char alignment with the three-band agreement rule: keep doubling
    * the band; accept once THREE consecutive band widths (b, 2b, 4b —
    * [[AgreementStreak]] = 2 agreeing doublings) produce IDENTICAL output;
    * at band ≥ m the result is the full matrix (exact by construction).
    *
    * Rationale: with a zero gap-extend cost (the default scoring has
    * gap_extend_y = 0) band-edge truncation can influence cells arbitrarily
    * far away, so NO per-run certificate of exactness exists for a fixed
    * band. The three-band agreement streak (b, 2b, 4b identical, with a
    * floor of [[MinBand]]) is the empirical acceptance rule — measured
    * 0/20000 disagreements vs the full matrix across
    * default/adversarial/realistic scorings (graft.tools.BandSweep) — and it is
    * validated continuously by the property and differential suites.
    * Documents small enough for [[FullMatrixCellThreshold]] (the realistic
    * web-page range) never take this path and are exact by construction; any
    * disagreement here widens toward the provably exact full matrix.
    */
  def alignCharsBanded(
      transcript: String,
      ocrStream: String,
      scoring: Scoring = Scoring.Default,
      initialBand: Int = DefaultInitialBand,
      ws: Workspace = new Workspace,
      maxPtrCells: Long = Int.MaxValue - 8): AlignResult = {
    val n = transcript.length + 1
    val m = ocrStream.length + 1
    var cells = 0L

    // Giant-document policy (VERDICT r1 #8): the widest band whose packed
    // in-band pointer storage n·(2b+1) fits the budget. A document that
    // never reaches band agreement STOPS doubling here and returns a
    // deterministic, metricized result instead of tripping the storage
    // `require` into a per-row error.
    val maxBandStorage: Int =
      (math.min((maxPtrCells / n - 1) / 2, Int.MaxValue.toLong)).toInt

    if (maxBandStorage < MinBand)
      return AlignResult("", "", 0, 0L, note = s"band_overflow_drop:0")

    var band = math.min(math.max(MinBand, initialBand), maxBandStorage)

    if (band >= m) {
      val (res, c) = alignCharsWithBand(transcript, ocrStream, scoring, m, ws)
      val (ta, oa) = res.get
      return AlignResult(ta, oa, 0, c)
    }

    var prev: Option[(String, String)] = {
      val (res, c) = alignCharsWithBand(transcript, ocrStream, scoring, band, ws)
      cells += c
      res
    }
    // widest band that produced an in-band traceback so far (a later, wider
    // attempt can fail on the edge while a narrower one succeeded — the cap
    // fallback must not discard that success)
    var lastSuccess: Option[(Int, (String, String))] = prev.map(band -> _)
    var streak = 0 // consecutive band doublings with identical output
    while (true) {
      val nextBand = math.min(m, band * 2)
      if (nextBand > maxBandStorage) {
        // cannot widen further: accept the widest successful result
        // (explicitly marked as agreement-uncertified) or drop
        return lastSuccess match {
          case Some((b, (ta, oa))) =>
            AlignResult(ta, oa, b, cells, note = s"band_capped:$b")
          case None =>
            AlignResult("", "", band, cells, note = s"band_overflow_drop:$band")
        }
      }
      val full = nextBand >= m
      val (cur, c) = alignCharsWithBand(transcript, ocrStream, scoring, nextBand, ws)
      cells += c
      if (full) {
        val (ta, oa) = cur.get
        return AlignResult(ta, oa, 0, cells)
      }
      if (cur.isDefined) lastSuccess = Some(nextBand -> cur.get)
      if (cur.isDefined && cur == prev) {
        streak += 1
        if (streak >= AgreementStreak) {
          val (ta, oa) = cur.get
          return AlignResult(ta, oa, nextBand, cells)
        }
      } else streak = 0
      prev = cur
      band = nextBand
    }
    throw new IllegalStateException("unreachable")
  }

  /** One banded attempt. Returns (Some(alignments), cells) on success or
    * (None, cells) if the traceback touched the band edge.
    *
    * Band: row i is filled for j in [max(1, c(i)-b), min(m-1, c(i)+b)] where
    * c(i) = round(i·(m-1)/(n-1)) — the skewed diagonal, which always contains
    * (0,0) and (n-1,m-1). Score matrices roll (two rows); pointers are stored
    * only in-band (3 bits per cell worth, kept as bytes).
    */
  private def alignCharsWithBand(
      transcript: String,
      ocrStream: String,
      scoring: Scoring,
      band: Int,
      ws: Workspace): (Option[(String, String)], Long) = {

    val sentinel = ' '
    val n = transcript.length + 1
    val m = ocrStream.length + 1
    @inline def traAt(i: Int): Char = if (i == n - 1) sentinel else transcript.charAt(i)
    @inline def ocrAt(j: Int): Char = if (j == m - 1) sentinel else ocrStream.charAt(j)

    val slope = if (n > 1) (m - 1).toDouble / (n - 1).toDouble else 0.0
    @inline def center(i: Int): Int = math.round(i * slope).toInt
    @inline def lo(i: Int): Int = math.max(1, center(i) - band)
    @inline def hi(i: Int): Int = math.min(m - 1, center(i) + band)

    val width = 2 * band + 1
    require(n.toLong * width <= Int.MaxValue - 8,
      s"alignment pointer storage too large: n=$n band=$band — cap document length upstream")
    // packed in-band pointers: bits 0-1 mat, 2-3 x, 4-5 y;
    // (i, j) -> i*width + (j - (center(i)-band))
    ws.ensurePtrs(n * width)
    val ptrs = ws.ptrs
    @inline def bandIdx(i: Int, j: Int): Int = i * width + (j - (center(i) - band))

    // the fill writes only `ptrs` + returns the cell count; integral
    // scorings (every reference system) take the integer-ALU fill
    val cells =
      if (scoring.isIntegral && !forceDoubleFill)
        fillBandLong(transcript, ocrStream, scoring, band, ws, n, m, slope, ptrs)
      else fillBandDouble(transcript, ocrStream, scoring, band, ws, n, m, slope, ptrs)

    // traceback (textSeqCompare.py:96-170); aborts only if the path escapes
    // the stored band (acceptance is agreement-based, see alignCharsBanded)
    @inline def inBand(xi: Int, yj: Int): Boolean = yj >= lo(xi) && yj <= hi(xi)

    val traAlign = new java.lang.StringBuilder(n + m)
    val ocrAlign = new java.lang.StringBuilder(n + m)
    var xpt = n - 1
    var ypt = m - 1
    // boundary cells have pointer 0 (the reference's np.zeros init); they are
    // never stored in the band, so guard the corner read when a side is empty
    var mpt: Int = if (xpt == 0 || ypt == 0) 0 else ptrs(bandIdx(xpt, ypt)) & 3

    traAlign.append(traAt(xpt))
    ocrAlign.append(ocrAt(ypt))

    var aborted = false
    while (!aborted && xpt > 0 && ypt > 0) {
      {
        if (!inBand(xpt, ypt)) { aborted = true }
        else if (mpt == 0) {
          traAlign.append(traAt(xpt - 1))
          ocrAlign.append(ocrAt(ypt - 1))
          mpt = ptrs(bandIdx(xpt, ypt)) & 3
          xpt -= 1; ypt -= 1
        } else if (mpt == 1) {
          traAlign.append(traAt(xpt - 1))
          ocrAlign.append('_')
          mpt = (ptrs(bandIdx(xpt, ypt)) >> 2) & 3
          xpt -= 1
        } else {
          traAlign.append('_')
          ocrAlign.append(ocrAt(ypt - 1))
          mpt = (ptrs(bandIdx(xpt, ypt)) >> 4) & 3
          ypt -= 1
        }
      }
    }
    if (aborted && band < m) return (None, cells)

    while (ypt > 0) { traAlign.append('_'); ocrAlign.append(ocrAt(ypt - 1)); ypt -= 1 }
    while (xpt > 0) { ocrAlign.append('_'); traAlign.append(traAt(xpt - 1)); xpt -= 1 }

    // `[-1:0:-1]` — drop the sentinel pair (index 0) and reverse
    val ta = traAlign.toString
    val oa = ocrAlign.toString
    (Some((new StringBuilder(ta.substring(1)).reverse.toString,
           new StringBuilder(oa.substring(1)).reverse.toString)), cells)
  }

  /** Double-arithmetic banded fill (the general path for non-integral
    * scorings). Writes packed pointers into `ptrs`; returns cells filled.
    * Rolling score rows (full width m); cells a row reads but its
    * predecessor didn't write are poisoned with NegInf before the fill,
    * keeping the hot loop branch-free.
    */
  private def fillBandDouble(
      transcript: String,
      ocrStream: String,
      scoring: Scoring,
      band: Int,
      ws: Workspace,
      n: Int,
      m: Int,
      slope: Double,
      ptrs: Array[Byte]): Long = {
    @inline def center(i: Int): Int = math.round(i * slope).toInt
    @inline def lo(i: Int): Int = math.max(1, center(i) - band)
    @inline def hi(i: Int): Int = math.min(m - 1, center(i) + band)
    val width = 2 * band + 1

    ws.ensureRows(m)
    val ocr = ws.ocrArray(ocrStream)
    var matPrev = ws.rows(0)
    var xPrev = ws.rows(1)
    var yPrev = ws.rows(2)
    var matCur = ws.rows(3)
    var xCur = ws.rows(4)
    var yCur = ws.rows(5)

    // row 0 boundary (textSeqCompare.py:57-60)
    var j = 0
    while (j < m) {
      matPrev(j) = BoundaryGapExtend * j
      xPrev(j) = BoundaryGapExtend * j
      yPrev(j) = NegInf
      j += 1
    }

    val gox = scoring.gapOpenX; val gex = scoring.gapExtendX
    val goy = scoring.gapOpenY; val gey = scoring.gapExtendY
    val matchS = scoring.matchScore; val mismatchS = scoring.mismatch

    var cells = 0L
    var i = 1
    while (i < n) {
      val ci = center(i)
      val jLo = math.max(1, ci - band)
      val jHi = math.min(m - 1, ci + band)
      val rowOff = i * width - (ci - band)
      val ti = transcript.charAt(i - 1) // fill never touches the sentinels

      // col 0 boundary (textSeqCompare.py:53-56)
      matCur(0) = BoundaryGapExtend * i
      xCur(0) = NegInf
      yCur(0) = BoundaryGapExtend * i

      if (i > 1) {
        // poison prev-row cells read this row ([jLo-1, jHi]) that the
        // previous row did not write ({0} ∪ [pLo, pHi] are valid)
        val pLo = lo(i - 1)
        val pHi = hi(i - 1)
        var jj = math.max(1, jLo - 1)
        while (jj < pLo) { matPrev(jj) = NegInf; xPrev(jj) = NegInf; yPrev(jj) = NegInf; jj += 1 }
        jj = math.max(pHi + 1, math.max(1, jLo - 1))
        while (jj <= jHi) { matPrev(jj) = NegInf; xPrev(jj) = NegInf; yPrev(jj) = NegInf; jj += 1 }
      }
      // current-row left neighbor of the band start (unless it's col 0)
      if (jLo - 1 >= 1) { matCur(jLo - 1) = NegInf; xCur(jLo - 1) = NegInf; yCur(jLo - 1) = NegInf }

      // carried registers — the exact twin of fillBandLong's loop (the
      // equivalence suite compares both fills); candidate order unchanged
      var pmJ1 = matPrev(jLo - 1); var pxJ1 = xPrev(jLo - 1); var pyJ1 = yPrev(jLo - 1)
      var cmJ1 = matCur(jLo - 1); var cxJ1 = xCur(jLo - 1); var cyJ1 = yCur(jLo - 1)
      j = jLo
      while (j <= jHi) {
        val msc = if (ti == ocr(j - 1)) matchS else mismatchS

        var mBest = 0; var mVal = pmJ1
        if (pxJ1 > mVal) { mBest = 1; mVal = pxJ1 }
        if (pyJ1 > mVal) { mBest = 2; mVal = pyJ1 }
        val mOut = mVal + msc

        val y0 = cmJ1 + goy + gey
        val y1 = cxJ1 + goy + gey
        val y2 = cyJ1 + gey
        var yBest = 0; var yVal = y0
        if (y1 > yVal) { yBest = 1; yVal = y1 }
        if (y2 > yVal) { yBest = 2; yVal = y2 }

        val pm = matPrev(j); val px = xPrev(j); val py = yPrev(j)
        val x0 = pm + gox + gex
        val x1 = px + gex
        val x2 = py + gox + gex
        var xBest = 0; var xVal = x0
        if (x1 > xVal) { xBest = 1; xVal = x1 }
        if (x2 > xVal) { xBest = 2; xVal = x2 }

        matCur(j) = mOut; yCur(j) = yVal; xCur(j) = xVal
        ptrs(rowOff + j) = (mBest | (xBest << 2) | (yBest << 4)).toByte
        pmJ1 = pm; pxJ1 = px; pyJ1 = py
        cmJ1 = mOut; cxJ1 = xVal; cyJ1 = yVal
        j += 1
      }
      cells += jHi - jLo + 1

      // roll rows
      val tm = matPrev; matPrev = matCur; matCur = tm
      val tx = xPrev; xPrev = xCur; xCur = tx
      val ty = yPrev; yPrev = yCur; yCur = ty
      i += 1
    }
    cells
  }

  /** Test hook: force the Double fill on integral scorings so the
    * equivalence suite can compare both fills on identical inputs
    * (AlignmentPropertiesSpec). Never set in production.
    */
  @volatile private[align] var forceDoubleFill: Boolean = false

  /** Long sentinel for the integer fill. Long.MinValue/4 leaves headroom so
    * `NegInfL + cost` can never wrap even before the absorption branch.
    */
  private val NegInfL: Long = Long.MinValue / 4

  /** Integer-ALU banded fill for integral scorings (every reference scoring
    * system — SURVEY §7 risk note / VERDICT r2 #7). Provably identical to
    * [[fillBandDouble]]:
    *   - every score reachable here is an exact integer far below 2^53, so
    *     Double comparisons and Long comparisons order candidates the same;
    *   - IEEE absorbs additions at -1e100 (`-1e100 + c == -1e100` for any
    *     cost), which the Long fill mirrors EXACTLY with the explicit
    *     `base == NegInfL → NegInfL` absorption branch — so poisoned
    *     candidates stay EQUAL (first-wins ties match), not merely very
    *     negative.
    * Gated by the property suite (banded == full), the reference
    * differential goldens, and graft.tools.BandSweep.
    */
  private def fillBandLong(
      transcript: String,
      ocrStream: String,
      scoring: Scoring,
      band: Int,
      ws: Workspace,
      n: Int,
      m: Int,
      slope: Double,
      ptrs: Array[Byte]): Long = {
    @inline def center(i: Int): Int = math.round(i * slope).toInt
    @inline def lo(i: Int): Int = math.max(1, center(i) - band)
    @inline def hi(i: Int): Int = math.min(m - 1, center(i) + band)
    val width = 2 * band + 1

    ws.ensureRowsLong(m)
    val ocr = ws.ocrArray(ocrStream)
    var matPrev = ws.lrows(0)
    var xPrev = ws.lrows(1)
    var yPrev = ws.lrows(2)
    var matCur = ws.lrows(3)
    var xCur = ws.lrows(4)
    var yCur = ws.lrows(5)

    val bge = BoundaryGapExtend.toLong // -1

    // row 0 boundary (textSeqCompare.py:57-60)
    var j = 0
    while (j < m) {
      matPrev(j) = bge * j
      xPrev(j) = bge * j
      yPrev(j) = NegInfL
      j += 1
    }

    val gox = scoring.gapOpenX.toLong; val gex = scoring.gapExtendX.toLong
    val goy = scoring.gapOpenY.toLong; val gey = scoring.gapExtendY.toLong
    val goxGex = gox + gex; val goyGey = goy + gey
    val matchS = scoring.matchScore.toLong; val mismatchS = scoring.mismatch.toLong

    var cells = 0L
    var i = 1
    while (i < n) {
      val ci = center(i)
      val jLo = math.max(1, ci - band)
      val jHi = math.min(m - 1, ci + band)
      val rowOff = i * width - (ci - band)
      val ti = transcript.charAt(i - 1)

      // col 0 boundary (textSeqCompare.py:53-56)
      matCur(0) = bge * i
      xCur(0) = NegInfL
      yCur(0) = bge * i

      if (i > 1) {
        val pLo = lo(i - 1)
        val pHi = hi(i - 1)
        var jj = math.max(1, jLo - 1)
        while (jj < pLo) { matPrev(jj) = NegInfL; xPrev(jj) = NegInfL; yPrev(jj) = NegInfL; jj += 1 }
        jj = math.max(pHi + 1, math.max(1, jLo - 1))
        while (jj <= jHi) { matPrev(jj) = NegInfL; xPrev(jj) = NegInfL; yPrev(jj) = NegInfL; jj += 1 }
      }
      if (jLo - 1 >= 1) { matCur(jLo - 1) = NegInfL; xCur(jLo - 1) = NegInfL; yCur(jLo - 1) = NegInfL }

      // absorption: NegInfL + cost stays NegInfL, mirroring -1e100 + cost
      @inline def add(base: Long, cost: Long): Long =
        if (base == NegInfL) NegInfL else base + cost

      // carried registers (optimization round 7): each iteration used to
      // reload 6 values it had already read — prev-row (j-1) is last
      // iteration's prev-row (j), and cur-row (j-1) is last iteration's
      // own output. Carrying them cuts the loop to 3 fresh array loads
      // per cell; candidate ORDER and comparisons are untouched, so the
      // fill is bit-identical (pinned by the property/differential
      // suites and the BandSweep tool).
      var pmJ1 = matPrev(jLo - 1); var pxJ1 = xPrev(jLo - 1); var pyJ1 = yPrev(jLo - 1)
      var cmJ1 = matCur(jLo - 1); var cxJ1 = xCur(jLo - 1); var cyJ1 = yCur(jLo - 1)
      j = jLo
      while (j <= jHi) {
        val msc = if (ti == ocr(j - 1)) matchS else mismatchS

        var mBest = 0; var mVal = pmJ1
        if (pxJ1 > mVal) { mBest = 1; mVal = pxJ1 }
        if (pyJ1 > mVal) { mBest = 2; mVal = pyJ1 }
        val mOut = add(mVal, msc)

        val y0 = add(cmJ1, goyGey)
        val y1 = add(cxJ1, goyGey)
        val y2 = add(cyJ1, gey)
        var yBest = 0; var yVal = y0
        if (y1 > yVal) { yBest = 1; yVal = y1 }
        if (y2 > yVal) { yBest = 2; yVal = y2 }

        val pm = matPrev(j); val px = xPrev(j); val py = yPrev(j)
        val x0 = add(pm, goxGex)
        val x1 = add(px, gex)
        val x2 = add(py, goxGex)
        var xBest = 0; var xVal = x0
        if (x1 > xVal) { xBest = 1; xVal = x1 }
        if (x2 > xVal) { xBest = 2; xVal = x2 }

        matCur(j) = mOut; yCur(j) = yVal; xCur(j) = xVal
        ptrs(rowOff + j) = (mBest | (xBest << 2) | (yBest << 4)).toByte
        pmJ1 = pm; pxJ1 = px; pyJ1 = py
        cmJ1 = mOut; cxJ1 = xVal; cyJ1 = yVal
        j += 1
      }
      cells += jHi - jLo + 1

      val tm = matPrev; matPrev = matCur; matCur = tm
      val tx = xPrev; xPrev = xCur; xCur = tx
      val ty = yPrev; yPrev = yCur; yCur = ty
      i += 1
    }
    cells
  }
}
