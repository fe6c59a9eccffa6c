package graft.multimodal

/** HEVC transform/quantization layer for the r12 pixel tier 2
  * (ITU-T H.265 §8.6): scaling (dequantization) with the flat default
  * scaling matrix, the 4/8/16/32-point inverse DCT-II and the 4x4
  * inverse DST-VII (intra luma 4x4), the §6.5.3 up-right-diagonal /
  * horizontal / vertical scan orders used by residual_coding, the
  * chroma QP mapping of Table 8-10, and the (non-normative)
  * forward-transform + quantizer the in-repo encoder uses to produce
  * round-trip fixtures. Matrices are the spec's fixed integers
  * (§8.6.4.1 / the Table 8-x transMatrix columns); the transcription
  * caveat of H264Cavlc applies — no external conformance material
  * exists in the container to cross-pin.
  */
private[multimodal] object H265Transform {

  // ------------------------------------------------------- §8.6.4 matrices

  /** 4x4 DST-VII (intra luma 4x4 only, §8.6.4.1). Row = basis index. */
  val dst4: Array[Array[Int]] = Array(
    Array(29, 55, 74, 84),
    Array(74, 74, 0, -74),
    Array(84, -29, -74, 55),
    Array(55, -84, 74, -29))

  /** 32x32 DCT-II transMatrix (§8.6.4.1); the 4/8/16-point matrices are
    * its even-index sub-samplings: dctN(i)(j) = dct32(i * 32/N)(j).
    */
  val dct32: Array[Array[Int]] = {
    // first-column coefficients of the odd rows fully determine the
    // matrix via the spec's symmetry; transcribe the canonical rows
    val m = Array.ofDim[Int](32, 32)
    val c = Array(64, 90, 90, 90, 89, 88, 87, 85, 83, 82, 80, 78, 75, 73,
      70, 67, 64, 61, 57, 54, 50, 46, 43, 38, 36, 31, 25, 22, 18, 13, 9, 4)
    // row k, col j: m[k][j] = sign * c[index] per the standard generation:
    // m[k][j] = transMatrixCol[k][j] where the matrix satisfies
    // m[k][j] = c[(k * (2j + 1)) mod 128 folded]; implement the fold.
    var k = 0
    while (k < 32) {
      var j = 0
      while (j < 32) {
        // angle index a = k * (2j + 1) mod 128, cos symmetry fold:
        // cos(a·π/64): a in [0,32] → +c[a]; (32,64] → −c[64−a];
        // (64,96] → −c[a−64]; (96,128) → +c[128−a]
        val a = (k * (2 * j + 1)) % 128
        m(k)(j) =
          if (a <= 32) c(a)
          else if (a <= 64) -c(64 - a)
          else if (a <= 96) -c(a - 64)
          else c(128 - a)
        j += 1
      }
      k += 1
    }
    m
  }

  /** N-point DCT rows (N = 4, 8, 16, 32) sub-sampled from [[dct32]]. */
  def dct(n: Int): Array[Array[Int]] = {
    require(n == 4 || n == 8 || n == 16 || n == 32, s"bad transform size $n")
    Array.tabulate(n, n)((i, j) => dct32(i * (32 / n))(j))
  }

  // ------------------------------------------------ §8.6.3 (de)quantization

  /** levelScale of §8.6.3 (dequant). */
  val levelScale: Array[Int] = Array(40, 45, 51, 57, 64, 72)

  /** Forward quantScale (non-normative, the HM convention: 2^14 ≈
    * levelScale·quantScale/2^6 pairing).
    */
  val quantScale: Array[Int] = Array(26214, 23302, 20560, 18396, 16384, 14564)

  /** Table 8-10: chroma qPc from qPi (4:2:0). */
  def chromaQp(qPi: Int): Int =
    if (qPi < 30) qPi
    else if (qPi > 43) qPi - 6
    else Array(29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37)(qPi - 30)

  @inline private def clip16(v: Int): Int =
    if (v < -32768) -32768 else if (v > 32767) 32767 else v

  /** §8.6.3 scaling of decoded coefficient levels (flat m = 16, 8-bit):
    * d = Clip3(−2^15, 2^15−1, (level · (levelScale[qp%6] · 16) << (qp/6)
    * + (1 << (bdShift−1))) >> bdShift), bdShift = log2Size + 3.
    */
  def dequant(levels: Array[Int], log2Size: Int, qp: Int): Array[Int] = {
    val bdShift = log2Size + 3
    val add = 1 << (bdShift - 1)
    val scale = (levelScale(qp % 6) << 4).toLong << (qp / 6)
    val out = new Array[Int](levels.length)
    var i = 0
    while (i < levels.length) {
      out(i) = clip16(((levels(i) * scale + add) >> bdShift).toInt)
      i += 1
    }
    out
  }

  /** §8.6.4 two-stage inverse transform of dequantized coefficients
    * `d` (row-major, size n×n) → residual samples r. Stage 1 transforms
    * COLUMNS (shift 7, clip to 16 bits), stage 2 ROWS (shift 12 at
    * 8-bit). `dst` selects DST-VII (n must be 4).
    */
  def inverseTransform(d: Array[Int], log2Size: Int, dst: Boolean): Array[Int] = {
    val n = 1 << log2Size
    require(!dst || n == 4, "DST only at 4x4")
    val m = if (dst) dst4 else dct(n)
    val tmp = new Array[Int](n * n)
    // stage 1 (vertical): e[x][y] = Σ_k m[k][y] · d[k][x]
    var x = 0
    while (x < n) {
      var y = 0
      while (y < n) {
        var s = 0L
        var k = 0
        while (k < n) { s += m(k)(y).toLong * d(k * n + x); k += 1 }
        tmp(y * n + x) = clip16(((s + 64) >> 7).toInt)
        y += 1
      }
      x += 1
    }
    // stage 2 (horizontal): r[x][y] = Σ_k m[k][x] · e[k-th col of row y]
    val out = new Array[Int](n * n)
    var y = 0
    while (y < n) {
      var x2 = 0
      while (x2 < n) {
        var s = 0L
        var k = 0
        while (k < n) { s += m(k)(x2).toLong * tmp(y * n + k); k += 1 }
        out(y * n + x2) = clip16(((s + 2048) >> 12).toInt)
        x2 += 1
      }
      y += 1
    }
    out
  }

  /** Forward transform (encoder side, the HM shift convention at 8-bit:
    * stage 1 shift log2Size − 1 on rows, stage 2 shift log2Size + 6 on
    * columns) — the exact inverse pairing is pinned by round-trip
    * tests, not by spec (forward is non-normative).
    */
  def forwardTransform(res: Array[Int], log2Size: Int, dst: Boolean): Array[Int] = {
    val n = 1 << log2Size
    val m = if (dst) dst4 else dct(n)
    val s1 = log2Size - 1
    val a1 = 1 << (s1 - 1)
    val tmp = new Array[Int](n * n)
    // stage 1 (horizontal): t[k][y] = (Σ_x m[k][x] · res[y][x]) >> s1
    var y = 0
    while (y < n) {
      var k = 0
      while (k < n) {
        var s = 0L
        var x = 0
        while (x < n) { s += m(k)(x).toLong * res(y * n + x); x += 1 }
        tmp(k * n + y) = ((s + a1) >> s1).toInt // note: transposed store
        k += 1
      }
      y += 1
    }
    val s2 = log2Size + 6
    val a2 = 1 << (s2 - 1)
    val out = new Array[Int](n * n)
    // stage 2 (vertical): c[k2][k] = (Σ_y m[k2][y] · t[k][y]) >> s2
    var k = 0
    while (k < n) {
      var k2 = 0
      while (k2 < n) {
        var s = 0L
        var yy = 0
        while (yy < n) { s += m(k2)(yy).toLong * tmp(k * n + yy); yy += 1 }
        out(k2 * n + k) = ((s + a2) >> s2).toInt
        k2 += 1
      }
      k += 1
    }
    out
  }

  /** Forward quantization (non-normative; round-trip partner of
    * [[dequant]]): level = sign · ((|coeff| · quantScale[qp%6] + off)
    * >> qbits), qbits = 21 + qp/6 − log2Size, intra rounding offset.
    */
  def quantize(coeffs: Array[Int], log2Size: Int, qp: Int): Array[Int] = {
    val qbits = 21 + qp / 6 - log2Size
    val off = 171L << (qbits - 9)
    val q = quantScale(qp % 6).toLong
    val out = new Array[Int](coeffs.length)
    var i = 0
    while (i < coeffs.length) {
      val c = coeffs(i)
      val lvl = (((math.abs(c).toLong * q) + off) >> qbits).toInt
      out(i) = if (c < 0) -lvl else lvl
      // residual_coding can carry |level| up to 2^15−1 via remaining;
      // tier fixtures stay far below — guard anyway
      require(math.abs(out(i)) <= 32767, "level overflow")
      i += 1
    }
    out
  }

  // ----------------------------------------------------- §6.5.3 scan orders

  val ScanDiag = 0
  val ScanHor = 1
  val ScanVer = 2

  /** Scan-order array for a `size`×`size` block: scan index → packed
    * position (y * size + x). §6.5.3 up-right diagonal / §6.5.4 hor /
    * §6.5.5 ver.
    */
  def scanOrder(size: Int, scanIdx: Int): Array[Int] = {
    val out = new Array[Int](size * size)
    var i = 0
    scanIdx match {
      case ScanDiag =>
        var x = 0
        var y = 0
        while (i < out.length) {
          while (y >= 0) {
            if (x < size && y < size) { out(i) = y * size + x; i += 1 }
            y -= 1; x += 1
          }
          y = x; x = 0
        }
      case ScanHor =>
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) { out(i) = y * size + x; i += 1; x += 1 }
          y += 1
        }
      case _ =>
        var x = 0
        while (x < size) {
          var y = 0
          while (y < size) { out(i) = y * size + x; i += 1; y += 1 }
          x += 1
        }
    }
    out
  }

  private val scanCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()

  /** Cached [[scanOrder]] (decode hot path). */
  def scan(size: Int, scanIdx: Int): Array[Int] =
    scanCache.computeIfAbsent(size * 4 + scanIdx,
      _ => scanOrder(size, scanIdx))

  /** §7.4.9.11: scanIdx for a TB — mode-dependent for intra 4x4/8x8
    * luma and 4x4 chroma: near-horizontal modes (6..14) scan
    * VERTICALLY, near-vertical (22..30) HORIZONTALLY, else up-right
    * diagonal.
    */
  def scanIdxFor(log2Size: Int, luma: Boolean, intraMode: Int): Int =
    if ((luma && log2Size <= 3) || (!luma && log2Size == 2)) {
      if (intraMode >= 6 && intraMode <= 14) ScanVer
      else if (intraMode >= 22 && intraMode <= 30) ScanHor
      else ScanDiag
    } else ScanDiag
}
