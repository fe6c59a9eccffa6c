package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Pure-JDK video container support: ISO-BMFF (mp4) and RIFF (avi)
  * parsing + building, with REAL frame decode for Motion-JPEG payloads.
  *
  * Why this shape: the reference pipeline treats video as an opaque
  * binary column plus typed metadata; what a training-data engine needs
  * from the container is (a) metadata probing (codec, dimensions,
  * duration) without decoding, and (b) frame extraction feeding the
  * image path (aHash dedup, grid features). Both are CONTAINER-level
  * concerns — byte-range bookkeeping from public specs (ISO/IEC 14496-12
  * box layout; the RIFF/AVI chunk layout) — and need no codec library.
  * The one genuinely codec-bound step, entropy-decoding a compressed
  * frame, is real here for Motion-JPEG (each sample IS a JPEG, and the
  * JDK ships a JPEG reader); H.264/H.265 samples are reported in the
  * probe but yield no frames — that codec remains the injectable
  * [[Multimodal.FrameDecoder]] boundary, now narrowed from "all of
  * mp4/avi" to "non-MJPEG bitstreams".
  *
  * MJPEG caveat: some AVI muxers strip JPEG Huffman tables from frames
  * (the fixed-table MJPEG convention). The JDK reader rejects such
  * frames; they decode as Nil (undecodable payloads are data, not
  * errors). Frames with embedded tables — what every JPEG encoder
  * including ImageIO emits — decode fully.
  *
  * Everything here is driver/executor-local byte work on one payload at
  * a time; the distributed batch shape (mapPartitions, one decoder init
  * per task) lives in [[Multimodal]].
  */
object VideoContainers {

  /** Container-level probe result: what you can know WITHOUT a codec. */
  case class VideoInfo(
      container: String, // "mp4" | "avi"
      codec: String,     // sample fourcc: "jpeg" | "MJPG" | "avc1" | …
      width: Int, height: Int,
      durationMs: Long, nFrames: Int)

  // ------------------------------------------------------------ sniffing

  /** Container detection by magic bytes: GIF ("GIF8"), AVI
    * ("RIFF"+"AVI "), mp4/ISO-BMFF ("ftyp" at offset 4). */
  def sniff(bytes: Array[Byte]): String =
    if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8') "gif"
    else if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ")
      "avi"
    else if (bytes.length >= 8 && fourcc(bytes, 4) == "ftyp") "mp4"
    else if (bytes.length >= 4 && bytes(0) == 0 && bytes(1) == 0 &&
      (bytes(2) == 1 || (bytes(2) == 0 && bytes(3) == 1))) "h264" // raw Annex-B
    else "unknown"

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  // ================================================================ MP4

  /** One parsed box: (type, payload offset, payload length). */
  private case class Box(typ: String, off: Int, len: Int)

  /** Children of the byte range [off, off+len) read as a box sequence.
    * Handles 32-bit sizes, size==1 (64-bit largesize) and size==0
    * (to end of enclosing range); malformed sizes end the walk (truncated
    * downloads are data, not errors).
    */
  private def boxes(b: Array[Byte], off: Int, len: Int): Seq[Box] = {
    val out = Seq.newBuilder[Box]
    var p = off
    val end = off + len
    while (p + 8 <= end) {
      val size = be32(b, p)
      val typ = fourcc(b, p + 4)
      val (payloadOff, boxEnd) =
        if (size == 1L && p + 16 <= end) {
          val ls = be64(b, p + 8)
          (p + 16, p + ls)
        } else if (size == 0L) (p + 8, end.toLong)
        else (p + 8, p + size)
      if (boxEnd < payloadOff || boxEnd > end) { p = end } // malformed: stop
      else {
        out += Box(typ, payloadOff, (boxEnd - payloadOff).toInt)
        p = boxEnd.toInt
      }
    }
    out.result()
  }

  private def child(b: Array[Byte], parent: Box, typ: String): Option[Box] =
    boxes(b, parent.off, parent.len).find(_.typ == typ)

  /** FullBox payloads (mvhd, stsz, …) start with version(1)+flags(3). */
  private def fullBoxVersion(b: Array[Byte], box: Box): Int = b(box.off) & 0xff

  /** Probe an mp4: mvhd duration, first video trak's stsd codec + tkhd
    * dimensions, stsz frame count. None if the moov structure is absent.
    */
  def probeMp4(bytes: Array[Byte]): Option[VideoInfo] =
    try {
      val top = boxes(bytes, 0, bytes.length)
      for {
        moov <- top.find(_.typ == "moov")
        mvhd <- child(bytes, moov, "mvhd")
        trak <- videoTrak(bytes, moov)
        stbl <- sampleTableBox(bytes, trak)
        stsd <- child(bytes, stbl, "stsd")
        if stsd.len >= 16
      } yield {
        // mvhd v0: verflags(4) ctime(4) mtime(4) timescale(4) duration(4)
        //      v1: verflags(4) ctime(8) mtime(8) timescale(4) duration(8)
        val v1 = fullBoxVersion(bytes, mvhd) == 1
        val timescale = be32(bytes, mvhd.off + (if (v1) 20 else 12))
        val duration = if (v1) be64(bytes, mvhd.off + 24) else be32(bytes, mvhd.off + 16)
        val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
        // stsd: verflags(4) entry_count(4), then first sample entry:
        // size(4) format(4) — format is the codec fourcc
        val codec = fourcc(bytes, stsd.off + 12)
        // VisualSampleEntry: width/height at entry offset 8+6+2+16 = 32
        val entryOff = stsd.off + 8
        val (w, h) =
          if (stsd.len >= 8 + 36) (be16(bytes, entryOff + 32), be16(bytes, entryOff + 34))
          else (0, 0)
        val n = child(bytes, stbl, "stsz").map(sz => be32(bytes, sz.off + 8).toInt).getOrElse(0)
        VideoInfo("mp4", codec, w, h, durMs, n)
      }
    } catch { case _: Exception => None }

  private def videoTrak(b: Array[Byte], moov: Box): Option[Box] =
    boxes(b, moov.off, moov.len).filter(_.typ == "trak").find { trak =>
      val hdlr = for {
        mdia <- child(b, trak, "mdia")
        h <- child(b, mdia, "hdlr")
      } yield fourcc(b, h.off + 8) // verflags(4) pre_defined(4) handler(4)
      hdlr.contains("vide")
    }

  private def sampleTableBox(b: Array[Byte], trak: Box): Option[Box] =
    for {
      mdia <- child(b, trak, "mdia")
      minf <- child(b, mdia, "minf")
      stbl <- child(b, minf, "stbl")
    } yield stbl

  /** Per-sample (offset, size) byte ranges of the first video track,
    * reconstructed from the stsz/stsc/stco(co64) sample tables — the
    * container's whole job. Empty when tables are absent/malformed.
    */
  def mp4SampleRanges(bytes: Array[Byte]): Seq[(Long, Int)] =
    try {
      val ranges = for {
        moov <- boxes(bytes, 0, bytes.length).find(_.typ == "moov")
        trak <- videoTrak(bytes, moov)
        stbl <- sampleTableBox(bytes, trak)
        stsz <- child(bytes, stbl, "stsz")
        stsc <- child(bytes, stbl, "stsc")
        stcoOrCo64 <- child(bytes, stbl, "stco").map((_, false))
          .orElse(child(bytes, stbl, "co64").map((_, true)))
      } yield {
        val (stco, is64) = stcoOrCo64
        // stsz: verflags(4) sample_size(4) count(4) [size(4)…]
        val fixedSize = be32(bytes, stsz.off + 4)
        val nSamples = be32(bytes, stsz.off + 8).toInt
        def sampleSize(i: Int): Int =
          if (fixedSize != 0) fixedSize.toInt else be32(bytes, stsz.off + 12 + 4 * i).toInt
        // stco: verflags(4) count(4) [offset…]
        val nChunks = be32(bytes, stco.off + 4).toInt
        def chunkOffset(c: Int): Long =
          if (is64) be64(bytes, stco.off + 8 + 8 * c) else be32(bytes, stco.off + 8 + 4 * c)
        // stsc: verflags(4) count(4) {first_chunk, samples_per_chunk,
        // desc_idx}… — entry i applies to chunks first_chunk(i) ..
        // first_chunk(i+1)-1 (1-based)
        val nRuns = be32(bytes, stsc.off + 4).toInt
        def runFirstChunk(i: Int): Int = be32(bytes, stsc.off + 8 + 12 * i).toInt
        def runPerChunk(i: Int): Int = be32(bytes, stsc.off + 12 + 12 * i).toInt
        val out = Seq.newBuilder[(Long, Int)]
        var sample = 0
        var run = 0
        var chunk = 1
        while (chunk <= nChunks && sample < nSamples) {
          while (run + 1 < nRuns && runFirstChunk(run + 1) <= chunk) run += 1
          val perChunk = if (nRuns > 0) runPerChunk(run) else 1
          var off = chunkOffset(chunk - 1)
          var j = 0
          while (j < perChunk && sample < nSamples) {
            val sz = sampleSize(sample)
            out += ((off, sz))
            off += sz
            sample += 1; j += 1
          }
          chunk += 1
        }
        out.result()
      }
      ranges.getOrElse(Nil)
    } catch { case _: Exception => Nil }

  /** Decoded frames of an MJPEG-codec mp4: each sample is a complete
    * JPEG, decoded by the JDK reader. Non-MJPEG codecs (avc1, hvc1, …)
    * yield Nil — the honest boundary; see the object scaladoc.
    */
  def mp4Frames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val codecOk = probeMp4(bytes).exists(i =>
      i.codec == "jpeg" || i.codec == "mjpa" || i.codec == "MJPG")
    if (!codecOk) Nil
    else mp4SampleRanges(bytes).flatMap { case (off, len) =>
      if (off < 0 || len <= 0 || off + len > bytes.length) None
      else decodeJpeg(bytes, off.toInt, len)
    }
  }

  private def decodeJpeg(b: Array[Byte], off: Int, len: Int): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(b, off, len)))
    catch { case _: Exception => None }

  // ------------------------------------------------------------ mp4 build

  private class BoxWriter {
    val bos = new ByteArrayOutputStream()
    def u32(v: Long): this.type = {
      bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
      bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt); this
    }
    def u16(v: Int): this.type = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff); this }
    def raw(b: Array[Byte]): this.type = { bos.write(b, 0, b.length); this }
    def ascii(s: String): this.type = raw(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def zeros(n: Int): this.type = { var i = 0; while (i < n) { bos.write(0); i += 1 }; this }
    def bytes: Array[Byte] = bos.toByteArray
  }

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val w = new BoxWriter
    w.u32(8L + payload.length).ascii(typ).raw(payload)
    w.bytes
  }

  /** Build a minimal valid MJPEG-in-mp4 file: ftyp + mdat (the JPEG
    * frames, one sample per chunk) + moov with the full stbl sample
    * tables. Deterministic byte-for-byte for fixed inputs — fixture
    * generation for the decode path, and a reference shape for the
    * parser. `fps` drives stts deltas and the declared durations.
    */
  def buildMp4Mjpeg(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(jpegFrames.nonEmpty, "at least one frame")
    val ftyp = box("ftyp", {
      val w = new BoxWriter
      w.ascii("isom").u32(0x200).ascii("isom").ascii("iso2").ascii("mp41")
      w.bytes
    })
    val mdatPayloadLen = jpegFrames.map(_.length.toLong).sum
    val mdatHeaderOff = ftyp.length
    // absolute file offsets of each sample (one chunk per sample)
    val sampleOffsets = jpegFrames.scanLeft(mdatHeaderOff + 8L)(_ + _.length).init
    val timescale = 1000L
    val delta = timescale / fps
    val duration = delta * jpegFrames.length

    def fullBox(typ: String, versionFlags: Long)(body: BoxWriter => Unit): Array[Byte] = {
      val w = new BoxWriter
      w.u32(versionFlags)
      body(w)
      box(typ, w.bytes)
    }
    val mvhd = fullBox("mvhd", 0) { w =>
      w.u32(0).u32(0).u32(timescale).u32(duration)          // ctime mtime timescale duration
      w.u32(0x00010000).u16(0x0100).u16(0)                  // rate 1.0, volume, reserved
      w.zeros(8)                                            // reserved
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L).foreach(w.u32) // unity matrix
      w.zeros(24)                                           // pre_defined[6]
      w.u32(2)                                              // next_track_id
    }
    val tkhd = fullBox("tkhd", 7) { w => // flags: enabled|in_movie|in_preview
      w.u32(0).u32(0).u32(1).u32(0).u32(duration)           // ctime mtime track_id reserved duration
      w.zeros(8).u16(0).u16(0).u16(0).u16(0)                // reserved, layer, group, volume, reserved
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L).foreach(w.u32)
      w.u32(width.toLong << 16).u32(height.toLong << 16)    // 16.16 fixed
    }
    val mdhd = fullBox("mdhd", 0) { w =>
      w.u32(0).u32(0).u32(timescale).u32(duration)
      w.u16(0x55c4).u16(0) // language 'und', pre_defined
    }
    val hdlr = fullBox("hdlr", 0) { w =>
      w.u32(0).ascii("vide").zeros(12)
      w.ascii("graft mjpeg ")
    }
    val vmhd = fullBox("vmhd", 1) { w => w.u16(0).u16(0).u16(0).u16(0) }
    val dref = fullBox("dref", 0) { w =>
      w.u32(1)
      w.raw(fullBox("url ", 1)(_ => ())) // self-contained
    }
    val dinf = box("dinf", dref)
    val sampleEntry = {
      val w = new BoxWriter
      // VisualSampleEntry('jpeg'): reserved[6], data_ref_idx, then the
      // visual fields (ISO 14496-12 §12.1.3)
      w.zeros(6).u16(1)
      w.u16(0).u16(0).zeros(12)                 // pre_defined, reserved, pre_defined[3]
      w.u16(width).u16(height)
      w.u32(0x00480000).u32(0x00480000).u32(0)  // 72 dpi h/v, reserved
      w.u16(1)                                  // frame_count
      w.zeros(32)                               // compressorname
      w.u16(0x0018).u16(0xffff)                 // depth, pre_defined = -1
      box("jpeg", w.bytes)
    }
    val stsd = fullBox("stsd", 0) { w => w.u32(1).raw(sampleEntry) }
    val stts = fullBox("stts", 0) { w => w.u32(1).u32(jpegFrames.length).u32(delta) }
    val stsc = fullBox("stsc", 0) { w => w.u32(1).u32(1).u32(1).u32(1) }
    val stsz = fullBox("stsz", 0) { w =>
      w.u32(0).u32(jpegFrames.length)
      jpegFrames.foreach(f => w.u32(f.length))
    }
    val stco = fullBox("stco", 0) { w =>
      w.u32(jpegFrames.length)
      sampleOffsets.foreach(w.u32)
    }
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)

    val out = new ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    val mdatHdr = new BoxWriter
    mdatHdr.u32(8L + mdatPayloadLen).ascii("mdat")
    out.write(mdatHdr.bytes, 0, 8)
    jpegFrames.foreach(f => out.write(f, 0, f.length))
    out.write(moov, 0, moov.length)
    out.toByteArray
  }

  // ================================================================ AVI

  /** Probe an AVI: avih dimensions/frame count/frame duration and the
    * first video stream's strh fccHandler as the codec. */
  def probeAvi(bytes: Array[Byte]): Option[VideoInfo] =
    try {
      if (sniff(bytes) != "avi") return None
      var codec = "????"
      var w = 0; var h = 0; var frames = 0; var usPerFrame = 0L
      walkRiff(bytes, 12, bytes.length) { (id, listType, off, len) =>
        if (id == "avih" && len >= 40) {
          usPerFrame = le32(bytes, off)
          frames = le32(bytes, off + 16).toInt
          w = le32(bytes, off + 32).toInt
          h = le32(bytes, off + 36).toInt
        } else if (id == "strh" && len >= 8 && fourcc(bytes, off) == "vids")
          codec = fourcc(bytes, off + 4)
      }
      if (w == 0 && frames == 0) None
      else Some(VideoInfo("avi", codec, w, h, usPerFrame * frames / 1000L, frames))
    } catch { case _: Exception => None }

  /** Depth-first RIFF chunk walk over [off, end): calls `f(chunkId,
    * listTypeOrNull, payloadOff, payloadLen)` for every leaf chunk and
    * recurses into LIST chunks. Chunk payloads are word-aligned (odd
    * sizes are followed by a pad byte) per the RIFF spec.
    */
  private def walkRiff(bytes: Array[Byte], off: Int, end: Int)(
      f: (String, String, Int, Int) => Unit): Unit = {
    var p = off
    while (p + 8 <= end) {
      val id = fourcc(bytes, p)
      val len = le32(bytes, p + 4).toInt
      val payload = p + 8
      if (len < 0 || payload + len > end) return // malformed/truncated: stop
      if (id == "LIST" && len >= 4) {
        val listType = fourcc(bytes, payload)
        f(id, listType, payload, len)
        walkRiff(bytes, payload + 4, payload + len)(f)
      } else f(id, null, payload, len)
      p = payload + len + (len & 1) // pad to word boundary
    }
  }

  /** Decoded frames of an MJPEG AVI: every `##dc`/`##db` chunk in the
    * movi list is a complete JPEG. Frames the JDK reader rejects
    * (e.g. table-less fixed-Huffman MJPEG) are skipped, not fatal.
    */
  def aviFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    if (sniff(bytes) != "avi") return Nil
    val out = Seq.newBuilder[java.awt.image.BufferedImage]
    try {
      walkRiff(bytes, 12, bytes.length) { (id, _, off, len) =>
        if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) && len > 0)
          decodeJpeg(bytes, off, len).foreach(out += _)
      }
    } catch { case _: Exception => }
    out.result()
  }

  // ------------------------------------------------------------ avi build

  /** Build a minimal valid MJPEG AVI: RIFF('AVI ') with hdrl(avih +
    * strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) and movi(00dc
    * chunks) + idx1. Deterministic for fixed inputs.
    */
  def buildAviMjpeg(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(jpegFrames.nonEmpty, "at least one frame")
    def le(out: ByteArrayOutputStream, v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def le16(out: ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    def cc(out: ByteArrayOutputStream, s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, 4)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      cc(out, id); le(out, payload.length)
      out.write(payload, 0, payload.length)
      if ((payload.length & 1) == 1) out.write(0) // word alignment
      out.toByteArray
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      cc(out, "LIST"); le(out, 4L + payload.length); cc(out, listType)
      out.write(payload, 0, payload.length)
      out.toByteArray
    }
    val maxFrame = jpegFrames.map(_.length).max
    val avih = {
      val o = new ByteArrayOutputStream()
      le(o, 1000000L / fps); le(o, maxFrame.toLong * fps); le(o, 0); le(o, 0x10 /*HASINDEX*/)
      le(o, jpegFrames.length); le(o, 0); le(o, 1); le(o, maxFrame)
      le(o, width); le(o, height); le(o, 0); le(o, 0); le(o, 0); le(o, 0)
      chunk("avih", o.toByteArray)
    }
    val strh = {
      val o = new ByteArrayOutputStream()
      cc(o, "vids"); cc(o, "MJPG"); le(o, 0); le16(o, 0); le16(o, 0)
      le(o, 0); le(o, 1); le(o, fps); le(o, 0); le(o, jpegFrames.length)
      le(o, maxFrame); le(o, -1 & 0xffffffffL); le(o, 0)
      le16(o, 0); le16(o, 0); le16(o, width); le16(o, height)
      chunk("strh", o.toByteArray)
    }
    val strf = {
      val o = new ByteArrayOutputStream()
      le(o, 40); le(o, width); le(o, height); le16(o, 1); le16(o, 24)
      cc(o, "MJPG"); le(o, width.toLong * height * 3); le(o, 0); le(o, 0); le(o, 0); le(o, 0)
      chunk("strf", o.toByteArray)
    }
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val frameChunks = jpegFrames.map(f => chunk("00dc", f))
    val movi = list("movi", frameChunks.flatten.toArray)
    val idx1 = {
      val o = new ByteArrayOutputStream()
      // offsets are relative to the 'movi' fourcc position
      var rel = 4L
      frameChunks.zip(jpegFrames).foreach { case (fc, f) =>
        cc(o, "00dc"); le(o, 0x10 /*KEYFRAME*/); le(o, rel); le(o, f.length)
        rel += fc.length
      }
      chunk("idx1", o.toByteArray)
    }
    val body = {
      val out = new ByteArrayOutputStream()
      cc(out, "AVI ")
      Seq(hdrl, movi, idx1).foreach(b => out.write(b, 0, b.length))
      out.toByteArray
    }
    val out = new ByteArrayOutputStream()
    cc(out, "RIFF"); le(out, body.length)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  // ====================================================== mp4 avc1 (H.264)

  /** The `avcC` (AVCDecoderConfigurationRecord) payload of the first
    * video track's `avc1` sample entry — sample-entry children start
    * after the 86-byte VisualSampleEntry fixed part (ISO 14496-12
    * §12.1.3 + 14496-15 §5.3).
    */
  def mp4AvcC(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      for {
        moov <- boxes(bytes, 0, bytes.length).find(_.typ == "moov")
        trak <- videoTrak(bytes, moov)
        stbl <- sampleTableBox(bytes, trak)
        stsd <- child(bytes, stbl, "stsd")
        if stsd.len >= 16 && fourcc(bytes, stsd.off + 12) == "avc1"
        entryOff = stsd.off + 8
        entryLen = be32(bytes, entryOff).toInt
        avcC <- boxes(bytes, entryOff + 86, entryLen - 86).find(_.typ == "avcC")
      } yield java.util.Arrays.copyOfRange(bytes, avcC.off, avcC.off + avcC.len)
    } catch { case _: Exception => None }

  /** stss sync-sample table: 1-based sample numbers of the keyframes.
    * An absent stss box means EVERY sample is a sync sample (ISO
    * 14496-12 §8.6.2) — encoded here as Nil; callers that need the
    * every-sample default combine this with the sample count.
    */
  def mp4SyncSamples(bytes: Array[Byte]): Seq[Int] =
    try {
      val r = for {
        moov <- boxes(bytes, 0, bytes.length).find(_.typ == "moov")
        trak <- videoTrak(bytes, moov)
        stbl <- sampleTableBox(bytes, trak)
        stss <- child(bytes, stbl, "stss")
      } yield {
        val n = be32(bytes, stss.off + 4).toInt
        (0 until n).map(i => be32(bytes, stss.off + 8 + 4 * i).toInt)
      }
      r.getOrElse(Nil)
    } catch { case _: Exception => Nil }

  /** Probe an avc1 mp4 down to the BITSTREAM level: parse the avcC's
    * first SPS ([[H264.parseSps]]) for the real coded width/height —
    * stronger than the container-declared tkhd/sample-entry dimensions,
    * which remuxers routinely get wrong.
    */
  def probeAvcMp4(bytes: Array[Byte]): Option[H264.SpsInfo] =
    for {
      avcc <- mp4AvcC(bytes)
      (_, spsList, _) <- H264.parseAvcC(avcc)
      sps <- spsList.headOption
      info <- H264.parseSps(sps)
    } yield info

  /** Compressed-domain keyframes of an avc1 mp4: for each sync sample,
    * the concatenated IDR slice payloads (AVCC framing resolved via the
    * avcC lengthSize). No entropy decode — byte-identical sources yield
    * byte-identical payloads, which is exactly what keyframe-hash dedup
    * needs. Empty for non-avc1 or malformed payloads.
    */
  def mp4AvcKeyframes(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val parsed = for {
      avcc <- mp4AvcC(bytes)
      (lengthSize, _, _) <- H264.parseAvcC(avcc)
    } yield {
      val ranges = mp4SampleRanges(bytes)
      val sync = mp4SyncSamples(bytes) match {
        case Nil => ranges.indices.map(_ + 1) // no stss: all samples sync
        case s => s
      }
      sync.flatMap { s1 =>
        ranges.lift(s1 - 1).flatMap { case (off, len) =>
          if (off < 0 || len <= 0 || off + len > bytes.length) None
          else {
            val sample = java.util.Arrays.copyOfRange(
              bytes, off.toInt, off.toInt + len)
            val idr = H264.nalUnitsAvcc(sample, lengthSize)
              .filter(_.nalType == 5)
            if (idr.isEmpty) None
            else {
              val b = new ByteArrayOutputStream()
              idr.foreach(n => b.write(n.payload, 0, n.payload.length))
              Some(b.toByteArray)
            }
          }
        }
      }
    }
    parsed.getOrElse(Nil)
  }

  /** Build a minimal valid H.264-in-mp4 (`avc1`) file: same box layout
    * as [[buildMp4Mjpeg]] plus the avcC decoder configuration in the
    * sample entry and an stss sync-sample table. `samples` are AVCC
    * (length-prefixed, 4-byte) access units; `sps`/`pps` are NAL
    * payloads WITHOUT the header byte (headers 0x67/0x68 are added in
    * the avcC record). Deterministic byte-for-byte for fixed inputs.
    */
  def buildMp4Avc(samples: Seq[Array[Byte]], syncSamples: Seq[Int],
      sps: Array[Byte], pps: Array[Byte], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(samples.nonEmpty, "at least one sample")
    require(syncSamples.nonEmpty, "at least one sync sample")
    val ftyp = box("ftyp", {
      val w = new BoxWriter
      w.ascii("isom").u32(0x200).ascii("isom").ascii("iso2").ascii("avc1").ascii("mp41")
      w.bytes
    })
    val mdatHeaderOff = ftyp.length
    val sampleOffsets = samples.scanLeft(mdatHeaderOff + 8L)(_ + _.length).init
    val timescale = 1000L
    val delta = timescale / fps
    val duration = delta * samples.length

    def fullBox(typ: String, versionFlags: Long)(body: BoxWriter => Unit): Array[Byte] = {
      val w = new BoxWriter
      w.u32(versionFlags)
      body(w)
      box(typ, w.bytes)
    }
    val mvhd = fullBox("mvhd", 0) { w =>
      w.u32(0).u32(0).u32(timescale).u32(duration)
      w.u32(0x00010000).u16(0x0100).u16(0)
      w.zeros(8)
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L).foreach(w.u32)
      w.zeros(24)
      w.u32(2)
    }
    val tkhd = fullBox("tkhd", 7) { w =>
      w.u32(0).u32(0).u32(1).u32(0).u32(duration)
      w.zeros(8).u16(0).u16(0).u16(0).u16(0)
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L).foreach(w.u32)
      w.u32(width.toLong << 16).u32(height.toLong << 16)
    }
    val mdhd = fullBox("mdhd", 0) { w =>
      w.u32(0).u32(0).u32(timescale).u32(duration)
      w.u16(0x55c4).u16(0)
    }
    val hdlr = fullBox("hdlr", 0) { w =>
      w.u32(0).ascii("vide").zeros(12)
      w.ascii("graft avc   ")
    }
    val vmhd = fullBox("vmhd", 1) { w => w.u16(0).u16(0).u16(0).u16(0) }
    val dref = fullBox("dref", 0) { w =>
      w.u32(1)
      w.raw(fullBox("url ", 1)(_ => ()))
    }
    val dinf = box("dinf", dref)
    val avcC = box("avcC", {
      val w = new BoxWriter
      // configurationVersion, AVCProfileIndication, compatibility, level
      w.raw(Array[Byte](1, sps(0), sps(1), sps(2)))
      w.raw(Array[Byte](0xff.toByte)) // 6 reserved bits + lengthSizeMinusOne=3
      w.raw(Array[Byte](0xe1.toByte)) // 3 reserved bits + numOfSPS=1
      w.u16(sps.length + 1).raw(Array[Byte](0x67)).raw(sps) // with NAL header
      w.raw(Array[Byte](1)) // numOfPPS
      w.u16(pps.length + 1).raw(Array[Byte](0x68)).raw(pps)
      w.bytes
    })
    val sampleEntry = {
      val w = new BoxWriter
      w.zeros(6).u16(1)
      w.u16(0).u16(0).zeros(12)
      w.u16(width).u16(height)
      w.u32(0x00480000).u32(0x00480000).u32(0)
      w.u16(1)
      w.zeros(32)
      w.u16(0x0018).u16(0xffff)
      w.raw(avcC)
      box("avc1", w.bytes)
    }
    val stsd = fullBox("stsd", 0) { w => w.u32(1).raw(sampleEntry) }
    val stts = fullBox("stts", 0) { w => w.u32(1).u32(samples.length).u32(delta) }
    val stsc = fullBox("stsc", 0) { w => w.u32(1).u32(1).u32(1).u32(1) }
    val stsz = fullBox("stsz", 0) { w =>
      w.u32(0).u32(samples.length)
      samples.foreach(f => w.u32(f.length))
    }
    val stco = fullBox("stco", 0) { w =>
      w.u32(samples.length)
      sampleOffsets.foreach(w.u32)
    }
    val stss = fullBox("stss", 0) { w =>
      w.u32(syncSamples.length)
      syncSamples.foreach(s => w.u32(s))
    }
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stss ++ stco)
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)

    val out = new ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    val mdatHdr = new BoxWriter
    mdatHdr.u32(8L + samples.map(_.length.toLong).sum).ascii("mdat")
    out.write(mdatHdr.bytes, 0, 8)
    samples.foreach(f => out.write(f, 0, f.length))
    out.write(moov, 0, moov.length)
    out.toByteArray
  }
  // ====================================================== mp4 hvc1 (H.265)

  /** The `hvcC` (HEVCDecoderConfigurationRecord) payload of the first
    * video track's `hvc1`/`hev1` sample entry (ISO 14496-15 §8.4.1) —
    * the r10 HEVC probe tier.
    */
  def mp4HvcC(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      for {
        moov <- boxes(bytes, 0, bytes.length).find(_.typ == "moov")
        trak <- videoTrak(bytes, moov)
        stbl <- sampleTableBox(bytes, trak)
        stsd <- child(bytes, stbl, "stsd")
        if stsd.len >= 16 && {
          val cc = fourcc(bytes, stsd.off + 12)
          cc == "hvc1" || cc == "hev1"
        }
        entryOff = stsd.off + 8
        entryLen = be32(bytes, entryOff).toInt
        hvcC <- boxes(bytes, entryOff + 86, entryLen - 86).find(_.typ == "hvcC")
      } yield java.util.Arrays.copyOfRange(bytes, hvcC.off, hvcC.off + hvcC.len)
    } catch { case _: Exception => None }

  /** Probe an hvc1/hev1 mp4 down to the BITSTREAM level: the hvcC's SPS
    * array parsed for the real coded dimensions / chroma / bit depths —
    * stronger than the container-declared dims, exactly the
    * [[probeAvcMp4]] posture.
    */
  def probeHevcMp4(bytes: Array[Byte]): Option[H265.SpsInfo] =
    for {
      hvcc <- mp4HvcC(bytes)
      (_, arrays) <- H265.parseHvcC(hvcc)
      sps <- arrays.collectFirst { case (H265.NalSps, nal) => nal }
      // strip the 2-byte HEVC NAL header
      info <- H265.parseSps(java.util.Arrays.copyOfRange(sps, 2, sps.length))
    } yield info

  /** Compressed-domain keyframes of an hvc1/hev1 mp4: for each sync
    * sample, the concatenated IRAP slice payloads (length-prefixed
    * framing resolved via the hvcC lengthSize). No entropy decode —
    * byte-identical sources yield byte-identical payloads
    * ([[mp4AvcKeyframes]]'s contract for HEVC).
    */
  def mp4HevcKeyframes(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val parsed = for {
      hvcc <- mp4HvcC(bytes)
      (lengthSize, _) <- H265.parseHvcC(hvcc)
    } yield {
      val ranges = mp4SampleRanges(bytes)
      val sync = mp4SyncSamples(bytes) match {
        case Nil => ranges.indices.map(_ + 1) // no stss: all samples sync
        case s => s
      }
      sync.flatMap { s1 =>
        ranges.lift(s1 - 1).flatMap { case (off, len) =>
          if (off < 0 || len <= 0 || off + len > bytes.length) None
          else {
            val sample = java.util.Arrays.copyOfRange(
              bytes, off.toInt, off.toInt + len)
            val irap = H265.nalUnitsHvcc(sample, lengthSize)
              .filter(n => H265.isIrap(n.nalType))
            if (irap.isEmpty) None
            else {
              val outB = new ByteArrayOutputStream()
              irap.foreach(n => outB.write(n.payload, 0, n.payload.length))
              Some(outB.toByteArray)
            }
          }
        }
      }
    }
    parsed.getOrElse(Nil)
  }

  /** Minimal valid hvc1 mp4 wrapping length-prefixed HEVC samples —
    * [[buildMp4Avc]]'s twin with the hvcC sample-entry child (parameter
    * sets WITHOUT NAL headers; [[H265.writeHvcC]] frames them).
    */
  def buildMp4Hevc(samples: Seq[Array[Byte]], syncSamples: Seq[Int],
      vps: Array[Byte], sps: Array[Byte], pps: Array[Byte],
      width: Int, height: Int, fps: Int = 10): Array[Byte] = {
    require(samples.nonEmpty, "at least one sample")
    require(syncSamples.nonEmpty, "at least one sync sample")
    val ftyp = box("ftyp", {
      val w = new BoxWriter
      w.ascii("isom").u32(0x200).ascii("isom").ascii("iso2").ascii("hvc1").ascii("mp41")
      w.bytes
    })
    val mdatHeaderOff = ftyp.length
    val sampleOffsets = samples.scanLeft(mdatHeaderOff + 8L)(_ + _.length).init
    val timescale = 1000L
    val delta = timescale / fps
    val duration = delta * samples.length
    def fullBox(typ: String, versionFlags: Long)(body: BoxWriter => Unit): Array[Byte] = {
      val w = new BoxWriter
      w.u32(versionFlags)
      body(w)
      box(typ, w.bytes)
    }
    val mvhd = fullBox("mvhd", 0) { w =>
      w.u32(0).u32(0).u32(timescale).u32(duration)
      w.u32(0x00010000).u16(0x0100).u16(0)
      w.zeros(8)
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L).foreach(w.u32)
      w.zeros(24)
      w.u32(2)
    }
    val tkhd = fullBox("tkhd", 7) { w =>
      w.u32(0).u32(0).u32(1).u32(0).u32(duration)
      w.zeros(8).u16(0).u16(0).u16(0).u16(0)
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L).foreach(w.u32)
      w.u32(width.toLong << 16).u32(height.toLong << 16)
    }
    val mdhd = fullBox("mdhd", 0) { w =>
      w.u32(0).u32(0).u32(timescale).u32(duration)
      w.u16(0x55c4).u16(0)
    }
    val hdlr = fullBox("hdlr", 0) { w =>
      w.u32(0).ascii("vide").zeros(12)
      w.ascii("graft hevc  ")
    }
    val vmhd = fullBox("vmhd", 1) { w => w.u16(0).u16(0).u16(0).u16(0) }
    val dref = fullBox("dref", 0) { w =>
      w.u32(1)
      w.raw(fullBox("url ", 1)(_ => ()))
    }
    val dinf = box("dinf", dref)
    val hvcC = box("hvcC", H265.writeHvcC(vps, sps, pps))
    val sampleEntry = {
      val w = new BoxWriter
      w.zeros(6).u16(1)
      w.u16(0).u16(0).zeros(12)
      w.u16(width).u16(height)
      w.u32(0x00480000).u32(0x00480000).u32(0)
      w.u16(1)
      w.zeros(32)
      w.u16(0x0018).u16(0xffff)
      w.raw(hvcC)
      box("hvc1", w.bytes)
    }
    val stsd = fullBox("stsd", 0) { w => w.u32(1).raw(sampleEntry) }
    val stts = fullBox("stts", 0) { w => w.u32(1).u32(samples.length).u32(delta) }
    val stsc = fullBox("stsc", 0) { w => w.u32(1).u32(1).u32(1).u32(1) }
    val stsz = fullBox("stsz", 0) { w =>
      w.u32(0).u32(samples.length)
      samples.foreach(f => w.u32(f.length))
    }
    val stco = fullBox("stco", 0) { w =>
      w.u32(samples.length)
      sampleOffsets.foreach(w.u32)
    }
    val stss = fullBox("stss", 0) { w =>
      w.u32(syncSamples.length)
      syncSamples.foreach(s => w.u32(s))
    }
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stss ++ stco)
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val out = new ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    val mdatHdr = new BoxWriter
    mdatHdr.u32(8L + samples.map(_.length.toLong).sum).ascii("mdat")
    out.write(mdatHdr.bytes, 0, 8)
    samples.foreach(f => out.write(f, 0, f.length))
    out.write(moov, 0, moov.length)
    out.toByteArray
  }
}
