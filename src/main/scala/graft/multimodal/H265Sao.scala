package graft.multimodal

/** HEVC Sample Adaptive Offset (r12): the §7.3.8.3 per-CTU syntax
  * (merge-left/up, per-component type, 4 truncated-Rice offset
  * magnitudes, band signs + position / edge class) under CABAC, and
  * the §8.7.3 filtering process — band offset over 32 8-value bands
  * and edge offset over the 4 directional classes with the normative
  * edgeIdx remap — applied AFTER deblocking against a PRE-SAO copy of
  * each plane (classification never reads SAO-modified samples).
  * One syntax + filter implementation shared by the decoder and the
  * encoder twin. 8-bit scope: offset cMax 7, no scaling shift.
  */
private[multimodal] object H265Sao {

  /** Per-CTB SAO parameters. `typeIdx`: 0 off, 1 band, 2 edge —
    * index 0 = luma, 1 = Cb, 2 = Cr (chroma shares one typeIdx and
    * edge class per §7.3.8.3; stored per-component for uniformity).
    * `offsets` are SIGNED SaoOffsetVal[1..4]; `bandPos` per component;
    * `eoClass` 0..3.
    */
  final class Params {
    val typeIdx = new Array[Int](3)
    val offsets: Array[Array[Int]] = Array.ofDim[Int](3, 4)
    val bandPos = new Array[Int](3)
    val eoClass = new Array[Int](3)
    def copyFrom(o: Params): Unit = {
      var c = 0
      while (c < 3) {
        typeIdx(c) = o.typeIdx(c)
        System.arraycopy(o.offsets(c), 0, offsets(c), 0, 4)
        bandPos(c) = o.bandPos(c)
        eoClass(c) = o.eoClass(c)
        c += 1
      }
    }
  }

  /** Decode one CTU's sao() (§7.3.8.3). `params` is the per-CTB array
    * (ctbW*ctbH), filled in raster order — merges copy the decoded
    * neighbor. `saoLuma`/`saoChroma` are the slice-header flags.
    */
  def decode(d: H264Cabac.Decoder, params: Array[Params], ctb: Int,
      ctbW: Int, saoLuma: Boolean, saoChroma: Boolean): Unit = {
    import H265Cabac._
    val p = new Params
    params(ctb) = p
    val ctbX = ctb % ctbW
    val mergeLeft = ctbX > 0 && d.decision(CtxSaoMerge) == 1
    if (mergeLeft) { p.copyFrom(params(ctb - 1)); return }
    val mergeUp = ctb >= ctbW && d.decision(CtxSaoMerge) == 1
    if (mergeUp) { p.copyFrom(params(ctb - ctbW)); return }
    var c = 0
    while (c < 3) {
      val coded = if (c == 0) saoLuma else saoChroma
      if (coded) {
        // sao_type_idx: decoded for luma and for Cb (Cr inherits)
        val t =
          if (c == 2) p.typeIdx(1)
          else if (d.decision(CtxSaoType) == 0) 0
          else 1 + d.bypass()
        p.typeIdx(c) = t
        if (t != 0) {
          val abs = new Array[Int](4)
          var k = 0
          while (k < 4) { // TR(cMax 7), bypass
            var v = 0
            while (v < 7 && d.bypass() == 1) v += 1
            abs(k) = v; k += 1
          }
          if (t == 1) { // band: signs for nonzero offsets + position
            k = 0
            while (k < 4) {
              p.offsets(c)(k) =
                if (abs(k) != 0 && d.bypass() == 1) -abs(k) else abs(k)
              k += 1
            }
            var bp = 0
            k = 0
            while (k < 5) { bp = (bp << 1) | d.bypass(); k += 1 }
            p.bandPos(c) = bp
          } else { // edge: signs inferred (+ + − −); class for luma/Cb
            p.offsets(c)(0) = abs(0); p.offsets(c)(1) = abs(1)
            p.offsets(c)(2) = -abs(2); p.offsets(c)(3) = -abs(3)
            if (c != 2) p.eoClass(c) = (d.bypass() << 1) | d.bypass()
            else p.eoClass(2) = p.eoClass(1)
          }
        }
      }
      c += 1
    }
  }

  /** Encoder mirror of [[decode]] — emits `p` (no merges unless the
    * caller passes mergeLeft/mergeUp, which must then equal the
    * neighbor's params).
    */
  def encode(e: H264Cabac.Encoder, params: Array[Params], ctb: Int,
      ctbW: Int, saoLuma: Boolean, saoChroma: Boolean, p: Params,
      mergeLeft: Boolean = false, mergeUp: Boolean = false): Unit = {
    import H265Cabac._
    params(ctb) = p
    val ctbX = ctb % ctbW
    if (ctbX > 0) {
      e.decision(CtxSaoMerge, if (mergeLeft) 1 else 0)
      if (mergeLeft) return
    } else require(!mergeLeft, "merge-left at column 0")
    if (ctb >= ctbW) {
      e.decision(CtxSaoMerge, if (mergeUp) 1 else 0)
      if (mergeUp) return
    } else require(!mergeUp, "merge-up at row 0")
    var c = 0
    while (c < 3) {
      val coded = if (c == 0) saoLuma else saoChroma
      if (coded) {
        val t = p.typeIdx(c)
        if (c == 2) require(t == p.typeIdx(1), "Cr type inherits Cb's")
        else {
          e.decision(CtxSaoType, if (t == 0) 0 else 1)
          if (t != 0) e.bypass(t - 1)
        }
        if (t != 0) {
          var k = 0
          while (k < 4) {
            val abs = math.abs(p.offsets(c)(k))
            require(abs <= 7, s"SAO offset $abs beyond cMax 7")
            require(t != 2 || (if (k < 2) p.offsets(c)(k) >= 0
              else p.offsets(c)(k) <= 0), "edge offset signs are inferred")
            var v = 0
            while (v < abs) { e.bypass(1); v += 1 }
            if (abs < 7) e.bypass(0)
            k += 1
          }
          if (t == 1) {
            k = 0
            while (k < 4) {
              if (p.offsets(c)(k) != 0)
                e.bypass(if (p.offsets(c)(k) < 0) 1 else 0)
              k += 1
            }
            var b = 4
            while (b >= 0) { e.bypass((p.bandPos(c) >> b) & 1); b -= 1 }
          } else if (c != 2) {
            e.bypass((p.eoClass(c) >> 1) & 1); e.bypass(p.eoClass(c) & 1)
          }
        }
      }
      c += 1
    }
  }

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v
  @inline private def sign(v: Int): Int =
    if (v > 0) 1 else if (v < 0) -1 else 0

  // per-class neighbor deltas (hPos/vPos, §8.7.3)
  private val eoDx = Array(Array(-1, 1), Array(0, 0), Array(-1, 1), Array(1, -1))
  private val eoDy = Array(Array(0, 0), Array(-1, 1), Array(-1, 1), Array(-1, 1))

  /** Apply SAO to one plane IN PLACE (§8.7.3.2): `src` is the PRE-SAO
    * (deblocked) copy classification reads; `noWrite` masks protected
    * samples (pcm_loop_filter_disabled), queried in LUMA coordinates
    * via `lumaShift` (0 luma, 1 chroma).
    */
  def applyPlane(plane: Array[Byte], src: Array[Byte], w: Int, h: Int,
      params: Array[Params], comp: Int, ctbW: Int, ctbH: Int,
      ctbLog2: Int, lumaShift: Int,
      noWrite: (Int, Int) => Boolean): Unit = {
    val ctbSize = 1 << (ctbLog2 - lumaShift)
    var ctb = 0
    while (ctb < ctbW * ctbH) {
      val p = params(ctb)
      if (p != null && p.typeIdx(comp) != 0) {
        val x0 = (ctb % ctbW) * ctbSize
        val y0 = (ctb / ctbW) * ctbSize
        val x1 = math.min(x0 + ctbSize, w)
        val y1 = math.min(y0 + ctbSize, h)
        if (p.typeIdx(comp) == 1) { // band offset
          val bandOff = new Array[Int](32)
          var k = 0
          while (k < 4) {
            bandOff((p.bandPos(comp) + k) & 31) = p.offsets(comp)(k)
            k += 1
          }
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val off = bandOff((src(y * w + x) & 0xff) >> 3)
              if (off != 0 && !noWrite(x << lumaShift, y << lumaShift))
                plane(y * w + x) = clip255((src(y * w + x) & 0xff) + off).toByte
              x += 1
            }
            y += 1
          }
        } else { // edge offset
          val cls = p.eoClass(comp)
          val dx = eoDx(cls); val dy = eoDy(cls)
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val xa = x + dx(0); val ya = y + dy(0)
              val xb = x + dx(1); val yb = y + dy(1)
              if (xa >= 0 && xa < w && ya >= 0 && ya < h &&
                  xb >= 0 && xb < w && yb >= 0 && yb < h) {
                val c = src(y * w + x) & 0xff
                var edgeIdx = 2 + sign(c - (src(ya * w + xa) & 0xff)) +
                  sign(c - (src(yb * w + xb) & 0xff))
                edgeIdx = // §8.7.3's remap: 0→1, 1→2, 2→0 (no offset)
                  if (edgeIdx == 2) 0
                  else if (edgeIdx < 2) edgeIdx + 1
                  else edgeIdx
                if (edgeIdx != 0 && !noWrite(x << lumaShift, y << lumaShift))
                  plane(y * w + x) =
                    clip255(c + p.offsets(comp)(edgeIdx - 1)).toByte
              }
              x += 1
            }
            y += 1
          }
        }
      }
      ctb += 1
    }
  }

  /** Apply SAO to a whole picture (after deblocking): copies each
    * plane once so classification reads pre-SAO samples.
    */
  def applyPicture(pic: H265Decode.Pic, params: Array[Params],
      ctbW: Int, ctbH: Int, ctbLog2: Int): Unit = {
    val noW: (Int, Int) => Boolean = (x, y) => pic.noFilter(x, y)
    applyPlane(pic.luma, pic.luma.clone(), pic.width, pic.height,
      params, 0, ctbW, ctbH, ctbLog2, 0, noW)
    val cw = pic.width >> 1; val ch = pic.height >> 1
    applyPlane(pic.cb, pic.cb.clone(), cw, ch, params, 1, ctbW, ctbH,
      ctbLog2, 1, noW)
    applyPlane(pic.cr, pic.cr.clone(), cw, ch, params, 2, ctbW, ctbH,
      ctbLog2, 1, noW)
  }
}
