package graft.multimodal

/** CAVLC residual-block entropy coding for H.264 baseline profile —
  * the decode (and matching encode) of `residual_block_cavlc`
  * (ITU-T H.264 §7.3.5.3.2 syntax, §9.2 parsing process).
  *
  * Table provenance & honesty note: the VLC tables below (coeff_token
  * Table 9-5, total_zeros Tables 9-7/9-9, run_before Table 9-10) are
  * transcriptions of the published spec tables. This container has no
  * reference H.264 decoder/encoder to cross-validate bit-exactness
  * against, so what CI pins is (a) every table is prefix-free and
  * total (H264CavlcSpec), (b) encode→decode round-trips for exhaustive
  * randomized residual blocks, and (c) the full frame pipeline
  * (H264Encode → H264Decode → pixels) reproduces planted pixels
  * exactly. Interop with externally-encoded streams should be treated
  * as unvalidated until checked against a reference decoder; the
  * structure (level prefix/suffix adaptation, zerosLeft bookkeeping,
  * coefficient placement) follows §9.2.2–9.2.4 exactly. What IS
  * enforced against corrupted/foreign bytes (H264FuzzSpec, r8):
  * exhaustive single-bit-flip, truncation, and seeded multi-byte
  * corruption over coded streams never crash, never allocate beyond
  * the 8192² level bound, decode deterministically (retry-stable
  * signatures), and reject-vs-decode both occur — so a real-corpus
  * CAVLC mismatch degrades to a skipped frame, not a pipeline failure.
  */
object H264Cavlc {

  /** One VLC: codeword (as "010…" string) ↔ value. Decode walks bits and
    * matches incrementally against an int-keyed sorted table — max
    * codeword length is 16, so the per-symbol cost is a bounded number
    * of binary searches with zero allocation (r7 advice: the former
    * per-bit StringBuilder + string-map lookup was the innermost loop of
    * residual decode).
    */
  final class Vlc(entries: Seq[(String, Int)]) {
    require(entries.nonEmpty)
    val byCode: Map[String, Int] = entries.toMap
    require(byCode.size == entries.size, "duplicate codewords")
    val byValue: Map[Int, String] = entries.map(_.swap).toMap
    require(byValue.size == entries.size, "duplicate values")
    val maxLen: Int = entries.map(_._1.length).max
    require(maxLen <= 16, s"codeword longer than 16 bits")
    // (length << 16 | bits) uniquely keys a codeword; sorted long array +
    // parallel values = allocation-free probes via Arrays.binarySearch
    private val decSorted = entries
      .map { case (c, v) =>
        ((c.length.toLong << 16) | java.lang.Long.parseLong(c, 2), v) }
      .sortBy(_._1)
    private val decKeys: Array[Long] = decSorted.map(_._1).toArray
    private val decVals: Array[Int] = decSorted.map(_._2).toArray
    /** Prefix-free check: no codeword is a prefix of another. */
    def prefixFree: Boolean = {
      val cs = entries.map(_._1)
      !cs.exists(a => cs.exists(b => (a ne b) && b.startsWith(a) && a != b))
    }
    def decode(r: H264.BitReader): Int = {
      var acc = 0L
      var len = 0
      while (len < maxLen) {
        acc = (acc << 1) | r.u(1)
        len += 1
        val i = java.util.Arrays.binarySearch(decKeys, (len.toLong << 16) | acc)
        if (i >= 0) return decVals(i)
      }
      throw new IllegalArgumentException(
        s"no VLC codeword in ${acc.toBinaryString.reverse.padTo(len, '0').reverse}")
    }
    def encode(w: H264.BitWriter, v: Int): Unit = {
      val code = byValue.getOrElse(v,
        throw new IllegalArgumentException(s"value $v not in VLC"))
      code.foreach(c => w.u(if (c == '1') 1 else 0, 1))
    }
  }

  /** coeff_token key: TotalCoeff·4 + TrailingOnes. */
  @inline def ctKey(totalCoeff: Int, trailingOnes: Int): Int =
    totalCoeff * 4 + trailingOnes

  // ---- Table 9-5, 0 <= nC < 2 ------------------------------------------
  val coeffToken0: Vlc = new Vlc(Seq(
    "1" -> ctKey(0, 0),
    "000101" -> ctKey(1, 0), "01" -> ctKey(1, 1),
    "00000111" -> ctKey(2, 0), "000100" -> ctKey(2, 1), "001" -> ctKey(2, 2),
    "000000111" -> ctKey(3, 0), "00000110" -> ctKey(3, 1),
    "0000101" -> ctKey(3, 2), "00011" -> ctKey(3, 3),
    "0000000111" -> ctKey(4, 0), "000000110" -> ctKey(4, 1),
    "00000101" -> ctKey(4, 2), "000011" -> ctKey(4, 3),
    "00000000111" -> ctKey(5, 0), "0000000110" -> ctKey(5, 1),
    "000000101" -> ctKey(5, 2), "0000100" -> ctKey(5, 3),
    "0000000001111" -> ctKey(6, 0), "00000000110" -> ctKey(6, 1),
    "0000000101" -> ctKey(6, 2), "00000100" -> ctKey(6, 3),
    "0000000001011" -> ctKey(7, 0), "0000000001110" -> ctKey(7, 1),
    "00000000101" -> ctKey(7, 2), "000000100" -> ctKey(7, 3),
    "0000000001000" -> ctKey(8, 0), "0000000001010" -> ctKey(8, 1),
    "0000000001101" -> ctKey(8, 2), "0000000100" -> ctKey(8, 3),
    "00000000001111" -> ctKey(9, 0), "00000000001110" -> ctKey(9, 1),
    "0000000001001" -> ctKey(9, 2), "00000000100" -> ctKey(9, 3),
    "00000000001011" -> ctKey(10, 0), "00000000001010" -> ctKey(10, 1),
    "00000000001101" -> ctKey(10, 2), "0000000001100" -> ctKey(10, 3),
    "000000000001111" -> ctKey(11, 0), "000000000001110" -> ctKey(11, 1),
    "00000000001001" -> ctKey(11, 2), "00000000001100" -> ctKey(11, 3),
    "000000000001011" -> ctKey(12, 0), "000000000001010" -> ctKey(12, 1),
    "000000000001101" -> ctKey(12, 2), "00000000001000" -> ctKey(12, 3),
    "0000000000001111" -> ctKey(13, 0), "000000000000001" -> ctKey(13, 1),
    "000000000001001" -> ctKey(13, 2), "000000000001100" -> ctKey(13, 3),
    "0000000000001011" -> ctKey(14, 0), "0000000000001110" -> ctKey(14, 1),
    "0000000000001101" -> ctKey(14, 2), "000000000001000" -> ctKey(14, 3),
    "0000000000000111" -> ctKey(15, 0), "0000000000001010" -> ctKey(15, 1),
    "0000000000001001" -> ctKey(15, 2), "0000000000001100" -> ctKey(15, 3),
    "0000000000000100" -> ctKey(16, 0), "0000000000000110" -> ctKey(16, 1),
    "0000000000000101" -> ctKey(16, 2), "0000000000001000" -> ctKey(16, 3)))

  // ---- Table 9-5, 2 <= nC < 4 ------------------------------------------
  val coeffToken2: Vlc = new Vlc(Seq(
    "11" -> ctKey(0, 0),
    "001011" -> ctKey(1, 0), "10" -> ctKey(1, 1),
    "000111" -> ctKey(2, 0), "00111" -> ctKey(2, 1), "011" -> ctKey(2, 2),
    "0000111" -> ctKey(3, 0), "001010" -> ctKey(3, 1),
    "001001" -> ctKey(3, 2), "0101" -> ctKey(3, 3),
    "00000111" -> ctKey(4, 0), "000110" -> ctKey(4, 1),
    "000101" -> ctKey(4, 2), "0100" -> ctKey(4, 3),
    "00000100" -> ctKey(5, 0), "0000110" -> ctKey(5, 1),
    "0000101" -> ctKey(5, 2), "00110" -> ctKey(5, 3),
    "000000111" -> ctKey(6, 0), "00000110" -> ctKey(6, 1),
    "00000101" -> ctKey(6, 2), "001000" -> ctKey(6, 3),
    "00000001111" -> ctKey(7, 0), "000000110" -> ctKey(7, 1),
    "000000101" -> ctKey(7, 2), "000100" -> ctKey(7, 3),
    "00000001011" -> ctKey(8, 0), "00000001110" -> ctKey(8, 1),
    "00000001101" -> ctKey(8, 2), "0000100" -> ctKey(8, 3),
    "000000001111" -> ctKey(9, 0), "00000001010" -> ctKey(9, 1),
    "00000001001" -> ctKey(9, 2), "000000100" -> ctKey(9, 3),
    "000000001011" -> ctKey(10, 0), "000000001110" -> ctKey(10, 1),
    "000000001101" -> ctKey(10, 2), "00000001100" -> ctKey(10, 3),
    "000000001000" -> ctKey(11, 0), "000000001010" -> ctKey(11, 1),
    "000000001001" -> ctKey(11, 2), "00000001000" -> ctKey(11, 3),
    "0000000001111" -> ctKey(12, 0), "0000000001110" -> ctKey(12, 1),
    "0000000001101" -> ctKey(12, 2), "000000001100" -> ctKey(12, 3),
    "0000000001011" -> ctKey(13, 0), "0000000001010" -> ctKey(13, 1),
    "0000000001001" -> ctKey(13, 2), "0000000001100" -> ctKey(13, 3),
    "0000000000111" -> ctKey(14, 0), "00000000001011" -> ctKey(14, 1),
    "0000000000110" -> ctKey(14, 2), "0000000001000" -> ctKey(14, 3),
    "00000000001001" -> ctKey(15, 0), "00000000001000" -> ctKey(15, 1),
    "00000000001010" -> ctKey(15, 2), "0000000000001" -> ctKey(15, 3),
    "00000000000111" -> ctKey(16, 0), "00000000000110" -> ctKey(16, 1),
    "00000000000101" -> ctKey(16, 2), "00000000000100" -> ctKey(16, 3)))

  // ---- Table 9-5, 4 <= nC < 8 ------------------------------------------
  val coeffToken4: Vlc = new Vlc(Seq(
    "1111" -> ctKey(0, 0),
    "001111" -> ctKey(1, 0), "1110" -> ctKey(1, 1),
    "001011" -> ctKey(2, 0), "01111" -> ctKey(2, 1), "1101" -> ctKey(2, 2),
    "001000" -> ctKey(3, 0), "01100" -> ctKey(3, 1),
    "01110" -> ctKey(3, 2), "1100" -> ctKey(3, 3),
    "0001111" -> ctKey(4, 0), "01010" -> ctKey(4, 1),
    "01011" -> ctKey(4, 2), "1011" -> ctKey(4, 3),
    "0001011" -> ctKey(5, 0), "01000" -> ctKey(5, 1),
    "01001" -> ctKey(5, 2), "1010" -> ctKey(5, 3),
    "0001001" -> ctKey(6, 0), "001110" -> ctKey(6, 1),
    "001101" -> ctKey(6, 2), "1001" -> ctKey(6, 3),
    "0001000" -> ctKey(7, 0), "001010" -> ctKey(7, 1),
    "001001" -> ctKey(7, 2), "1000" -> ctKey(7, 3),
    "00001111" -> ctKey(8, 0), "0001110" -> ctKey(8, 1),
    "0001101" -> ctKey(8, 2), "01101" -> ctKey(8, 3),
    "00001011" -> ctKey(9, 0), "00001110" -> ctKey(9, 1),
    "0001010" -> ctKey(9, 2), "001100" -> ctKey(9, 3),
    "000001111" -> ctKey(10, 0), "00001010" -> ctKey(10, 1),
    "00001101" -> ctKey(10, 2), "0001100" -> ctKey(10, 3),
    "000001011" -> ctKey(11, 0), "000001110" -> ctKey(11, 1),
    "00001001" -> ctKey(11, 2), "00001100" -> ctKey(11, 3),
    "000001000" -> ctKey(12, 0), "000001010" -> ctKey(12, 1),
    "000001001" -> ctKey(12, 2), "00001000" -> ctKey(12, 3),
    "0000001101" -> ctKey(13, 0), "000000111" -> ctKey(13, 1),
    "000001101" -> ctKey(13, 2), "000001100" -> ctKey(13, 3),
    "0000001001" -> ctKey(14, 0), "0000001100" -> ctKey(14, 1),
    "0000001011" -> ctKey(14, 2), "0000001010" -> ctKey(14, 3),
    "0000000101" -> ctKey(15, 0), "0000001000" -> ctKey(15, 1),
    "0000000111" -> ctKey(15, 2), "0000000110" -> ctKey(15, 3),
    "0000000001" -> ctKey(16, 0), "0000000100" -> ctKey(16, 1),
    "0000000011" -> ctKey(16, 2), "0000000010" -> ctKey(16, 3)))

  /** Table 9-5, nC == -1 (chroma DC, 4:2:0 — maxNumCoeff 4). */
  val coeffTokenChromaDc: Vlc = new Vlc(Seq(
    "01" -> ctKey(0, 0),
    "000111" -> ctKey(1, 0), "1" -> ctKey(1, 1),
    "000100" -> ctKey(2, 0), "000110" -> ctKey(2, 1), "001" -> ctKey(2, 2),
    "000011" -> ctKey(3, 0), "0000011" -> ctKey(3, 1),
    "0000010" -> ctKey(3, 2), "000101" -> ctKey(3, 3),
    "000010" -> ctKey(4, 0), "00000011" -> ctKey(4, 1),
    "00000010" -> ctKey(4, 2), "0000000" -> ctKey(4, 3)))

  /** Decode coeff_token for a given nC; nC >= 8 is the 6-bit FLC
    * (§9.2.1: TotalCoeff = (code >> 2) + 1, TrailingOnes = code & 3,
    * except code 3 = (0, 0)).
    */
  def decodeCoeffToken(r: H264.BitReader, nC: Int): (Int, Int) = {
    val key =
      if (nC == -1) coeffTokenChromaDc.decode(r)
      else if (nC < 2) coeffToken0.decode(r)
      else if (nC < 4) coeffToken2.decode(r)
      else if (nC < 8) coeffToken4.decode(r)
      else {
        val code = r.u(6)
        if (code == 3) ctKey(0, 0) else ctKey((code >> 2) + 1, code & 3)
      }
    (key / 4, key % 4)
  }

  def encodeCoeffToken(w: H264.BitWriter, nC: Int, totalCoeff: Int,
      trailingOnes: Int): Unit = {
    val key = ctKey(totalCoeff, trailingOnes)
    if (nC == -1) coeffTokenChromaDc.encode(w, key)
    else if (nC < 2) coeffToken0.encode(w, key)
    else if (nC < 4) coeffToken2.encode(w, key)
    else if (nC < 8) coeffToken4.encode(w, key)
    else {
      val code = if (totalCoeff == 0) 3 else ((totalCoeff - 1) << 2) | trailingOnes
      w.u(code, 6)
    }
  }

  // ---- total_zeros, 4x4 blocks (Table 9-7/9-8), indexed by TotalCoeff --
  private def tz(pairs: (String, Int)*): Vlc = new Vlc(pairs)
  val totalZeros4x4: Array[Vlc] = Array(
    null, // TotalCoeff 0 never reads total_zeros
    tz("1" -> 0, "011" -> 1, "010" -> 2, "0011" -> 3, "0010" -> 4,
      "00011" -> 5, "00010" -> 6, "000011" -> 7, "000010" -> 8,
      "0000011" -> 9, "0000010" -> 10, "00000011" -> 11, "00000010" -> 12,
      "000000011" -> 13, "000000010" -> 14, "000000001" -> 15),
    tz("111" -> 0, "110" -> 1, "101" -> 2, "100" -> 3, "011" -> 4,
      "0101" -> 5, "0100" -> 6, "0011" -> 7, "0010" -> 8, "00011" -> 9,
      "00010" -> 10, "000011" -> 11, "000010" -> 12, "000001" -> 13,
      "000000" -> 14),
    tz("0101" -> 0, "111" -> 1, "110" -> 2, "101" -> 3, "0100" -> 4,
      "0011" -> 5, "100" -> 6, "011" -> 7, "0010" -> 8, "00011" -> 9,
      "00010" -> 10, "000001" -> 11, "00001" -> 12, "000000" -> 13),
    tz("00011" -> 0, "111" -> 1, "0101" -> 2, "0100" -> 3, "110" -> 4,
      "101" -> 5, "100" -> 6, "0011" -> 7, "011" -> 8, "0010" -> 9,
      "00010" -> 10, "00001" -> 11, "00000" -> 12),
    tz("0101" -> 0, "0100" -> 1, "0011" -> 2, "111" -> 3, "110" -> 4,
      "101" -> 5, "100" -> 6, "011" -> 7, "0010" -> 8, "00001" -> 9,
      "0001" -> 10, "00000" -> 11),
    tz("000001" -> 0, "00001" -> 1, "111" -> 2, "110" -> 3, "101" -> 4,
      "100" -> 5, "011" -> 6, "010" -> 7, "0001" -> 8, "001" -> 9,
      "000000" -> 10),
    tz("000001" -> 0, "00001" -> 1, "101" -> 2, "100" -> 3, "011" -> 4,
      "11" -> 5, "010" -> 6, "0001" -> 7, "001" -> 8, "000000" -> 9),
    tz("000001" -> 0, "0001" -> 1, "00001" -> 2, "011" -> 3, "11" -> 4,
      "10" -> 5, "010" -> 6, "001" -> 7, "000000" -> 8),
    tz("000001" -> 0, "000000" -> 1, "0001" -> 2, "11" -> 3, "10" -> 4,
      "001" -> 5, "01" -> 6, "00001" -> 7),
    tz("00001" -> 0, "00000" -> 1, "001" -> 2, "11" -> 3, "10" -> 4,
      "01" -> 5, "0001" -> 6),
    tz("0000" -> 0, "0001" -> 1, "001" -> 2, "010" -> 3, "1" -> 4,
      "011" -> 5),
    tz("0000" -> 0, "0001" -> 1, "01" -> 2, "1" -> 3, "001" -> 4),
    tz("000" -> 0, "001" -> 1, "1" -> 2, "01" -> 3),
    tz("00" -> 0, "01" -> 1, "1" -> 2),
    tz("0" -> 0, "1" -> 1))

  /** total_zeros for chroma DC, 4:2:0 (Table 9-9(a)), by TotalCoeff. */
  val totalZerosChromaDc: Array[Vlc] = Array(
    null,
    tz("1" -> 0, "01" -> 1, "001" -> 2, "000" -> 3),
    tz("1" -> 0, "01" -> 1, "00" -> 2),
    tz("1" -> 0, "0" -> 1))

  // ---- run_before (Table 9-10), indexed by min(zerosLeft, 7) -----------
  val runBefore: Array[Vlc] = Array(
    null, // zerosLeft 0 never reads run_before
    tz("1" -> 0, "0" -> 1),
    tz("1" -> 0, "01" -> 1, "00" -> 2),
    tz("11" -> 0, "10" -> 1, "01" -> 2, "00" -> 3),
    tz("11" -> 0, "10" -> 1, "01" -> 2, "001" -> 3, "000" -> 4),
    tz("11" -> 0, "10" -> 1, "011" -> 2, "010" -> 3, "001" -> 4, "000" -> 5),
    tz("11" -> 0, "000" -> 1, "001" -> 2, "011" -> 3, "010" -> 4,
      "101" -> 5, "100" -> 6),
    tz("111" -> 0, "110" -> 1, "101" -> 2, "100" -> 3, "011" -> 4,
      "010" -> 5, "001" -> 6, "0001" -> 7, "00001" -> 8, "000001" -> 9,
      "0000001" -> 10, "00000001" -> 11, "000000001" -> 12,
      "0000000001" -> 13, "00000000001" -> 14))

  /** All tables, for the prefix-freeness CI pin. */
  def allTables: Seq[(String, Vlc)] =
    Seq("ct0" -> coeffToken0, "ct2" -> coeffToken2, "ct4" -> coeffToken4,
      "ctCdc" -> coeffTokenChromaDc) ++
      totalZeros4x4.zipWithIndex.collect { case (v, i) if v != null => s"tz$i" -> v } ++
      totalZerosChromaDc.zipWithIndex.collect { case (v, i) if v != null => s"tzc$i" -> v } ++
      runBefore.zipWithIndex.collect { case (v, i) if v != null => s"rb$i" -> v }

  // ------------------------------------------------- residual block I/O

  /** Parse residual_block_cavlc (§9.2): returns the coefficient array in
    * SCAN order (length maxNumCoeff) and TotalCoeff. `nC` is the
    * coeff_token context (−1 for chroma DC).
    */
  def decodeResidualBlock(r: H264.BitReader, maxNumCoeff: Int, nC: Int): (Array[Int], Int) = {
    val coeffs = new Array[Int](maxNumCoeff)
    val (totalCoeff, trailingOnes) = decodeCoeffToken(r, nC)
    if (totalCoeff == 0) return (coeffs, 0)
    require(totalCoeff <= maxNumCoeff, s"TotalCoeff $totalCoeff > $maxNumCoeff")

    // §9.2.2 level decoding with adaptive suffix length
    val levels = new Array[Int](totalCoeff)
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = 0
    while (i < totalCoeff) {
      if (i < trailingOnes) {
        levels(i) = if (r.u(1) == 1) -1 else 1
      } else {
        var levelPrefix = 0
        while (r.u(1) == 0) {
          levelPrefix += 1
          require(levelPrefix <= 31, "level_prefix overflow")
        }
        var levelSuffixSize = suffixLength
        if (levelPrefix == 14 && suffixLength == 0) levelSuffixSize = 4
        else if (levelPrefix >= 15) levelSuffixSize = levelPrefix - 3
        val suffix = if (levelSuffixSize > 0) r.u(levelSuffixSize) else 0
        var levelCode = (math.min(15, levelPrefix) << suffixLength) + suffix
        if (levelPrefix >= 15 && suffixLength == 0) levelCode += 15
        if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
        if (i == trailingOnes && trailingOnes < 3) levelCode += 2
        levels(i) =
          if (levelCode % 2 == 0) (levelCode + 2) >> 1 else -((levelCode + 1) >> 1)
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }

    // §9.2.3 total_zeros + run_before
    var zerosLeft =
      if (totalCoeff == maxNumCoeff) 0
      else if (nC == -1) totalZerosChromaDc(totalCoeff).decode(r)
      else totalZeros4x4(totalCoeff).decode(r)
    val runs = new Array[Int](totalCoeff)
    i = 0
    while (i < totalCoeff - 1) {
      runs(i) =
        if (zerosLeft > 0) runBefore(math.min(zerosLeft, 7)).decode(r) else 0
      zerosLeft -= runs(i)
      require(zerosLeft >= 0, "run_before exceeds zerosLeft")
      i += 1
    }
    runs(totalCoeff - 1) = zerosLeft

    // §9.2.4 placement: levels(0) is the HIGHEST-frequency coefficient
    var pos = -1
    i = totalCoeff - 1
    while (i >= 0) {
      pos += runs(i) + 1
      coeffs(pos) = levels(i)
      i -= 1
    }
    (coeffs, totalCoeff)
  }

  /** Encode a coefficient array (scan order, length maxNumCoeff) as
    * residual_block_cavlc; inverse of [[decodeResidualBlock]] (round-trip
    * CI-pinned for randomized blocks). Returns TotalCoeff so callers can
    * maintain the nC neighbor context.
    */
  def encodeResidualBlock(w: H264.BitWriter, coeffs: Array[Int], nC: Int): Int = {
    val maxNumCoeff = coeffs.length
    val nz = coeffs.zipWithIndex.filter(_._1 != 0)
    val totalCoeff = nz.length
    // trailing ones: up to 3 |level|==1 coeffs at the high-frequency end
    var trailingOnes = 0
    var k = totalCoeff - 1
    while (k >= 0 && trailingOnes < 3 && math.abs(nz(k)._1) == 1) {
      trailingOnes += 1; k -= 1
    }
    encodeCoeffToken(w, nC, totalCoeff, trailingOnes)
    if (totalCoeff == 0) return 0

    // levels, highest frequency first
    val levels = nz.map(_._1).reverse
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = 0
    while (i < totalCoeff) {
      val lv = levels(i)
      if (i < trailingOnes) {
        w.u(if (lv < 0) 1 else 0, 1)
      } else {
        var levelCode = if (lv > 0) (lv - 1) * 2 else -lv * 2 - 1
        if (i == trailingOnes && trailingOnes < 3) levelCode -= 2
        // choose the shortest valid (prefix, suffix) encoding — exact
        // mirror of the §9.2.2 decoder branches, including the +15
        // offset the decoder adds at prefix ≥ 15 with suffixLength 0 and
        // the (1 << (prefix−3)) − 4096 offset at prefix ≥ 16
        def writePrefix(p: Int): Unit = w.u(1, p + 1) // p zeros then 1
        def escape16(rem: Int): Unit = {
          // rem = levelCode minus the prefix-15 base; solve
          // rem + 4096 ∈ [2^(p−3), 2^(p−2)) for the suffix size p−3
          val bits = 32 - Integer.numberOfLeadingZeros(rem + 4096) - 1
          writePrefix(bits + 3)
          w.u(rem + 4096 - (1 << bits), bits)
        }
        if (suffixLength == 0) {
          if (levelCode < 14) writePrefix(levelCode)
          else if (levelCode < 30) { writePrefix(14); w.u(levelCode - 14, 4) }
          else if (levelCode < 30 + 4096) { writePrefix(15); w.u(levelCode - 30, 12) }
          else escape16(levelCode - 30)
        } else {
          val prefix = levelCode >> suffixLength
          if (prefix < 15) {
            writePrefix(prefix); w.u(levelCode & ((1 << suffixLength) - 1), suffixLength)
          } else if (levelCode < (15 << suffixLength) + 4096) {
            writePrefix(15); w.u(levelCode - (15 << suffixLength), 12)
          } else escape16(levelCode - (15 << suffixLength))
        }
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(lv) > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }

    // total_zeros: zeros below the highest-frequency nonzero coefficient
    val highestPos = nz.last._2
    val totalZeros = highestPos + 1 - totalCoeff
    if (totalCoeff < maxNumCoeff) {
      if (nC == -1) totalZerosChromaDc(totalCoeff).encode(w, totalZeros)
      else totalZeros4x4(totalCoeff).encode(w, totalZeros)
    }
    // run_before per level in parse order (highest frequency first); the
    // last-parsed (lowest-frequency) coeff's run is implied by zerosLeft.
    // positions(0) < positions(1) < …; parse order is reversed, so
    // run(parse i) = gap between scan positions t and t−1 for
    // t = totalCoeff−1−i, and the lowest-frequency coeff's run is the
    // zeros below it.
    var zerosLeft = totalZeros
    val positions = nz.map(_._2)
    val runs = new Array[Int](totalCoeff)
    runs(totalCoeff - 1) = positions(0)
    var t = 1
    while (t < totalCoeff) {
      runs(totalCoeff - 1 - t) = positions(t) - positions(t - 1) - 1
      t += 1
    }
    i = 0
    while (i < totalCoeff - 1) {
      if (zerosLeft > 0) {
        runBefore(math.min(zerosLeft, 7)).encode(w, runs(i))
        zerosLeft -= runs(i)
      } else require(runs(i) == 0, "inconsistent runs")
      i += 1
    }
    totalCoeff
  }
}
