package graft.ops

import Multimodal.MediaItem

/** REAL FLAC AUDIO DECODE, pure JVM — the fixed-predictor subset of the
  * xiph FLAC format (the lossless archival codec of curated audio
  * sets). [[Flac]] already walks the container metadata; this decodes
  * the FRAMES: sync + CRC-8-verified headers, subframes of type
  * CONSTANT, VERBATIM and FIXED (polynomial predictor orders 0-4),
  * Rice-coded residual partitions (4- and 5-bit parameter methods,
  * escaped raw partitions), wasted-bits shifts, and the CRC-16 frame
  * footer — all of it public integer arithmetic, no codec library.
  * Supported stream shape: MONO or STEREO, 8/16/24-bit, fixed blocking.
  * Subframe types: CONSTANT, VERBATIM, FIXED (orders 0-4) and — since
  * round 13 — LPC (orders 1-32): QLP precision/shift header, signed
  * quantized coefficients, and the integer fixed-point predictor
  * s[i] = res[i] + ((sum qlp[j]*s[i-1-j]) >> shift) in a 64-bit
  * accumulator. Wild FLAC is overwhelmingly LPC-encoded, so this is
  * the real-world coverage arm. Stereo decodes through all four
  * channel assignments (independent L/R, left/side, side/right,
  * mid/side — integer decorrelation with the side channel one bit
  * wider, the mid's lost LSB restored from the side's parity); round
  * 14 completes the depth matrix (8/12/16/20/24 — every sample-size
  * code the frame header can name besides 32). The remaining refusals
  * are genuinely non-subset shapes (>2 channels, 32-bit depth,
  * variable blocking, negative QLP shift — spec-reserved or
  * vanishingly rare in the wild).
  *
  * Decode restores the samples EXACTLY (lossless), so every gate is
  * closed-form: the oracle states the PCM, and the decoded FLAC must
  * reproduce it bit-for-bit — the mm20/ing23 "container must not leak
  * into the data" discipline applied to audio samples.
  *
  * [[FlacPcmEncoder]] is the matching deterministic fixture writer
  * (STREAMINFO + frames; per-frame subframe type, Rice parameters
  * chosen by exhaustive 0..14 scan, configurable partition order).
  */
object FlacPcm {

  // ------------------------------------------------------------- CRCs
  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC. */
  private[ops] def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= p(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — the frame CRC. */
  private[ops] def crc16(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (p(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------- bit reader
  private final class Bits(p: Array[Byte], var bytePos: Int) {
    var bitPos = 0
    def bit(): Int = {
      require(bytePos < p.length, s"FLAC: bitstream truncated at byte $bytePos")
      val v = (p(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signedBits(n: Int): Int = {
      val v = bits(n)
      if (n > 0 && (v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) {
        q += 1
        require(q <= (1 << 20), "FLAC: runaway unary code (corrupt stream)")
      }
      q
    }
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** The fixed polynomial predictors, T = s[i-1..i-4] (order 0-4). */
  private def predict(order: Int, s: Array[Int], i: Int): Int = order match {
    case 0 => 0
    case 1 => s(i - 1)
    case 2 => 2 * s(i - 1) - s(i - 2)
    case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
    case 4 => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
    case o => throw new IllegalArgumentException(s"FLAC: fixed order $o out of range")
  }

  /** Decode every frame; returns the PCM samples — totalSamples of them
    * for mono, 2x totalSamples INTERLEAVED (L,R,L,R,...) for stereo.
    * 8/16/24-bit fixed-blocking streams; subframes CONSTANT/VERBATIM/FIXED/
    * LPC; stereo via all four channel assignments (independent,
    * left/side, right/side, mid/side — integer decorrelation, lossless
    * like everything else here). Everything outside the subset refuses
    * instructively. */
  def decode(item: MediaItem): Array[Int] = {
    val p = item.payload
    val id = item.mediaId
    val meta = Flac.parse(item)
    require(meta.channels == 1 || meta.channels == 2,
      s"media $id: only mono/stereo FLAC decode is supported (${meta.channels} channels)")
    val bps = meta.bitsPerSample
    require(bps == 8 || bps == 12 || bps == 16 || bps == 20 || bps == 24,
      s"media $id: only 8/12/16/20/24-bit FLAC decode is supported ($bps)")
    require(meta.totalSamples <= (1 << 26),
      s"media $id: stream too large for in-memory decode")
    // frames start after the last metadata block
    var pos = 4
    var last = false
    while (!last) {
      last = (p(pos) & 0x80) != 0
      val len = ((p(pos + 1) & 0xFF) << 16) | ((p(pos + 2) & 0xFF) << 8) | (p(pos + 3) & 0xFF)
      pos = pos + 4 + len
    }
    val nCh = meta.channels
    val total = meta.totalSamples.toInt
    val out = new Array[Int](total * nCh)
    var got = 0
    while (got < total) {
      val frameStart = pos
      val in = new Bits(p, pos)
      require(in.bits(14) == 0x3FFE, s"media $id: lost FLAC frame sync at byte $frameStart")
      require(in.bit() == 0, s"media $id: reserved frame-header bit set")
      in.bit(): Unit // blocking strategy (frame vs sample number coding)
      val bsCode = in.bits(4)
      val srCode = in.bits(4)
      val chan = in.bits(4)
      val ssCode = in.bits(3)
      require(in.bit() == 0, s"media $id: reserved frame-header bit set")
      // channel codes: 0 = mono, 1 = independent L/R, 8 = left/side,
      // 9 = side/right, 10 = mid/side; the rest are >2-channel or reserved
      if (nCh == 1) require(chan == 0,
        s"media $id: mono stream carries channel code $chan")
      else require(chan == 1 || (chan >= 8 && chan <= 10),
        s"media $id: unsupported stereo channel code $chan")
      // sample-size codes: 1=8, 2=12, 4=16, 5=20, 6=24 bits
      val frameBits = ssCode match {
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case c => throw new IllegalArgumentException(
          s"media $id: unsupported sample-size code $c")
      }
      require(frameBits == bps,
        s"media $id: frame sample size $frameBits contradicts STREAMINFO $bps")
      // coded frame/sample number: UTF-8-style variable length
      val first = in.bits(8)
      var cont = 0
      var m = first
      while ((m & 0x80) != 0 && cont < 7) { cont += 1; m <<= 1; m &= 0xFF }
      var ci = 0
      while (ci < (if (cont > 0) cont - 1 else 0)) {
        require((in.bits(8) & 0xC0) == 0x80, s"media $id: bad coded frame number")
        ci += 1
      }
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => in.bits(8) + 1
        case 7 => in.bits(16) + 1
        case c if c >= 8 => 256 << (c - 8)
        case c => throw new IllegalArgumentException(
          s"media $id: reserved block-size code $c")
      }
      srCode match {
        case 12 => in.bits(8): Unit   // kHz in header
        case 13 | 14 => in.bits(16): Unit
        case 15 => throw new IllegalArgumentException(s"media $id: invalid sample-rate code")
        case _ => ()
      }
      // CRC-8 covers the header bytes up to here (reader is byte-aligned:
      // every field so far is a whole number of bits summing to bytes)
      require(in.bitPos == 0, s"media $id: frame header not byte-aligned")
      val wantCrc8 = crc8(p, frameStart, in.bytePos)
      require(in.bits(8) == wantCrc8, s"media $id: frame header CRC-8 mismatch")
      val n = math.min(blockSize, total - got)
      require(n > 0, s"media $id: frame beyond total sample count")
      // ---- one subframe, at `bps` effective input bits (17 for the
      // side channel of a decorrelated stereo pair; 16 otherwise)
      def readSubframe(bps: Int): Array[Int] = {
      require(in.bit() == 0, s"media $id: subframe padding bit set")
      val sfType = in.bits(6)
      var wasted = 0
      if (in.bit() == 1) { wasted = in.unary() + 1 }
      require(wasted < bps, s"media $id: wasted-bits count $wasted exceeds sample size")
      val eff = bps - wasted
      val block = new Array[Int](blockSize)
      def readResiduals(order: Int): Unit = {
        val method = in.bits(2)
        require(method <= 1, s"media $id: reserved residual method $method")
        val pbits = if (method == 0) 4 else 5
        val escape = (1 << pbits) - 1
        val pOrder = in.bits(4)
        require((blockSize & ((1 << pOrder) - 1)) == 0,
          s"media $id: partition order $pOrder does not divide block size $blockSize")
        var idx = order
        var part = 0
        val nParts = 1 << pOrder
        while (part < nParts) {
          val cnt = (blockSize >> pOrder) - (if (part == 0) order else 0)
          require(cnt >= 0, s"media $id: predictor order exceeds first partition")
          val param = in.bits(pbits)
          var k = 0
          if (param == escape) {
            val raw = in.bits(5)
            while (k < cnt) { block(idx) = in.signedBits(raw); idx += 1; k += 1 }
          } else {
            while (k < cnt) {
              val q = in.unary()
              val r = in.bits(param)
              // Accumulate in Long: the 5-bit method allows param up to 30
              // and unary() allows q up to 2^20, so (q << param) overflows
              // Int on crafted streams (the CRC is attacker-controlled) and
              // would yield silently wrong samples instead of a refusal.
              val u = (q.toLong << param) | (r.toLong & 0xFFFFFFFFL)
              val s = (u >>> 1) ^ -(u & 1L) // zigzag -> signed
              require(s >= Int.MinValue && s <= Int.MaxValue,
                s"media $id: Rice residual overflows 32 bits (corrupt stream)")
              block(idx) = s.toInt
              idx += 1; k += 1
            }
          }
          part += 1
        }
      }
      sfType match {
        case 0 => // CONSTANT
          val v = in.signedBits(eff)
          java.util.Arrays.fill(block, v)
        case 1 => // VERBATIM
          var i = 0
          while (i < blockSize) { block(i) = in.signedBits(eff); i += 1 }
        case t if (t & 0x38) == 0x08 && (t & 7) <= 4 => // FIXED order 0-4
          val order = t & 7
          require(order <= blockSize,
            s"media $id: fixed order $order exceeds block size $blockSize")
          var i = 0
          while (i < order) { block(i) = in.signedBits(eff); i += 1 }
          readResiduals(order)
          i = order
          while (i < blockSize) { block(i) += predict(order, block, i); i += 1 }
        case t if (t & 0x20) != 0 => // LPC, order 1-32 (type = 1ooooo)
          val order = (t & 0x1F) + 1
          require(order <= blockSize,
            s"media $id: LPC order $order exceeds block size $blockSize")
          var i = 0
          while (i < order) { block(i) = in.signedBits(eff); i += 1 }
          val precM1 = in.bits(4)
          require(precM1 != 15, s"media $id: invalid QLP precision code 15")
          val precision = precM1 + 1
          val shift = in.signedBits(5)
          // The 5-bit shift field is two's complement in the spec, but a
          // negative shift is spec-reserved ("which is i guess possible"
          // wording aside, libFLAC refuses it) — refuse instructively
          // rather than guess a semantics.
          require(shift >= 0,
            s"media $id: negative QLP shift $shift is spec-reserved")
          val qlp = new Array[Int](order)
          i = 0
          while (i < order) { qlp(i) = in.signedBits(precision); i += 1 }
          readResiduals(order)
          // Integer fixed-point prediction: 64-bit accumulator (order<=32,
          // |coef|<2^14, |sample|<2^31 -> |acc|<2^50, never wraps).
          i = order
          while (i < blockSize) {
            var acc = 0L
            var j = 0
            while (j < order) { acc += qlp(j).toLong * block(i - 1 - j); j += 1 }
            val v = block(i).toLong + (acc >> shift)
            require(v >= Int.MinValue && v <= Int.MaxValue,
              s"media $id: LPC prediction overflows 32 bits (corrupt stream)")
            block(i) = v.toInt
            i += 1
          }
        case t => throw new IllegalArgumentException(
          s"media $id: reserved subframe type $t")
      }
      if (wasted > 0) {
        var i = 0
        while (i < blockSize) { block(i) = block(i) << wasted; i += 1 }
      }
      block
      } // readSubframe
      if (nCh == 1) {
        val b = readSubframe(bps)
        in.align()
        val wantCrc16 = crc16(p, frameStart, in.bytePos)
        require(in.bits(16) == wantCrc16, s"media $id: frame CRC-16 mismatch")
        var i = 0
        while (i < n) { out(got + i) = b(i); i += 1 }
      } else {
        // the side channel of a decorrelated pair carries one extra bit
        val (bps0, bps1) = chan match {
          case 1 => (bps, bps)         // independent L, R
          case 8 => (bps, bps + 1)     // left, side
          case 9 => (bps + 1, bps)     // side, right
          case _ => (bps, bps + 1)     // mid, side
        }
        val c0 = readSubframe(bps0)
        val c1 = readSubframe(bps1)
        in.align()
        val wantCrc16 = crc16(p, frameStart, in.bytePos)
        require(in.bits(16) == wantCrc16, s"media $id: frame CRC-16 mismatch")
        var i = 0
        while (i < n) {
          var l = 0; var r = 0
          chan match {
            case 1 => l = c0(i); r = c1(i)
            case 8 => l = c0(i); r = c0(i) - c1(i)      // right = left - side
            case 9 => l = c0(i) + c1(i); r = c1(i)      // left = side + right
            case _ =>                                    // mid/side
              // mid lost the sum's LSB at encode; side's parity restores it
              val sum2 = (c0(i) << 1) | (c1(i) & 1)
              l = (sum2 + c1(i)) >> 1
              r = (sum2 - c1(i)) >> 1
          }
          out((got + i) * 2) = l
          out((got + i) * 2 + 1) = r
          i += 1
        }
      }
      got += n
      pos = in.bytePos
    }
    out
  }

  // ---------------------------------------------------------- encoder
  /** Deterministic fixture writer: mono 16-bit samples as STREAMINFO +
    * frames of `blockSize`. `orderFor(frameIdx)` picks the subframe per
    * frame: 0-4 = FIXED of that order, -1 = VERBATIM, -2 = CONSTANT
    * (frame samples must all be equal). Rice parameters by exhaustive
    * scan; `partitionOrder` exercises the partition loop. */
  object FlacPcmEncoder extends Serializable {

    private final class BitW(out: java.io.ByteArrayOutputStream) {
      private var buf = 0
      private var cnt = 0
      def put(v: Int, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          buf = (buf << 1) | ((v >> i) & 1)
          cnt += 1
          if (cnt == 8) { out.write(buf); buf = 0; cnt = 0 }
          i -= 1
        }
      }
      def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
      def align(): Unit = if (cnt > 0) put(0, 8 - cnt)
    }

    private def riceCost(res: Seq[Int], param: Int): Long =
      res.foldLeft(0L) { (acc, v) =>
        val u = (v << 1) ^ (v >> 31)
        acc + (u >>> param) + 1 + param
      }

    /** Per-frame subframe selection: `orderFor` returns 0-4 for FIXED,
      * -1 VERBATIM, -2 CONSTANT; `lpcFor`, when it returns
      * Some((coefs, shift)), overrides with an LPC subframe of order
      * coefs.length — residuals are computed with the same 64-bit
      * integer predictor the decoder applies, so round-trips are exact.
      * QLP precision is derived from the widest coefficient. */
    def encode(samples: Array[Int], sampleRate: Int, blockSize: Int,
        orderFor: Int => Int, partitionOrder: Int = 0,
        lpcFor: Int => Option[(Array[Int], Int)] = _ => None,
        bps: Int = 16): Array[Byte] = {
      require(samples.nonEmpty, "FLAC fixture needs samples")
      require(bps == 8 || bps == 12 || bps == 16 || bps == 20 || bps == 24,
        s"unsupported bit depth $bps")
      val lo = -(1 << (bps - 1)); val hi = (1 << (bps - 1)) - 1
      require(samples.forall(s => s >= lo && s <= hi), s"$bps-bit range")
      val ssCode = bps match {
        case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case _ => 6 }
      val sMask = (1 << bps) - 1
      require((blockSize & ((1 << partitionOrder) - 1)) == 0,
        "partition order must divide block size")
      // The frame header below uses block-size code 6 (8-bit value-1), so
      // blockSize > 256 would silently truncate in put(n - 1, 8) and emit
      // an undecodable stream — refuse at encode time like frameIdx < 128.
      require(blockSize >= 1 && blockSize <= 256,
        "fixture block size exceeds 8-bit header coding (code 6)")
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes("US-ASCII"))
      // STREAMINFO (last metadata block)
      out.write(0x80); out.write(0); out.write(0); out.write(34)
      val si = new java.io.ByteArrayOutputStream()
      val sb = new BitW(si)
      sb.put(blockSize, 16); sb.put(blockSize, 16) // min/max block size
      sb.put(0, 24); sb.put(0, 24) // frame size bounds unknown
      sb.put(sampleRate, 20); sb.put(0, 3) /* channels-1 */ ; sb.put(bps - 1, 5)
      sb.put(0, 4); sb.put(samples.length, 32) // totalSamples (36 bits)
      sb.align()
      out.write(si.toByteArray)
      out.write(new Array[Byte](16)) // PCM MD5: zero (metadata-only field here)
      // ---- frames
      var off = 0
      var frameIdx = 0
      while (off < samples.length) {
        val n = math.min(blockSize, samples.length - off)
        val fb = new java.io.ByteArrayOutputStream()
        val w = new BitW(fb)
        w.put(0x3FFE, 14); w.put(0, 1); w.put(0, 1) // sync, reserved, fixed blocking
        w.put(6, 4)       // block size: 8-bit value-1 at header end
        w.put(0, 4)       // sample rate: from STREAMINFO
        w.put(0, 4)       // mono
        w.put(ssCode, 3); w.put(0, 1) // sample-size code, reserved
        require(frameIdx < 128, "fixture frame number exceeds 1-byte UTF-8 coding")
        w.put(frameIdx, 8) // coded frame number (single byte)
        w.put(n - 1, 8)    // 8-bit block size - 1
        w.align()
        val headBytes = fb.toByteArray
        fb.write(crc8(headBytes, 0, headBytes.length))
        val w2 = new BitW(fb)
        val order0 = orderFor(frameIdx)
        val frame = java.util.Arrays.copyOfRange(samples, off, off + n)
        def writeRice(res: IndexedSeq[Int], o: Int): Unit = {
          val pOrd = if (n == blockSize) partitionOrder else 0
          w2.put(0, 2)    // method: 4-bit rice
          w2.put(pOrd, 4) // partition order
          var idx = 0
          (0 until (1 << pOrd)).foreach { part =>
            val cnt = (n >> pOrd) - (if (part == 0) o else 0)
            val slice = res.slice(idx, idx + cnt)
            idx += cnt
            val param = (0 to 14).minBy(k => riceCost(slice, k))
            w2.put(param, 4)
            slice.foreach { v =>
              val u = (v << 1) ^ (v >> 31)
              w2.putUnary(u >>> param)
              w2.put(u & ((1 << param) - 1), param)
            }
          }
        }
        lpcFor(frameIdx) match {
          case Some((coefs, shift)) =>
            val o = coefs.length
            require(o >= 1 && o <= 32 && o < n, s"LPC order $o invalid for $n samples")
            require(shift >= 0 && shift <= 15, s"QLP shift $shift out of range")
            // smallest signed width holding every coefficient, min 2 bits
            val precision = math.max(2, coefs.map(c =>
              33 - java.lang.Integer.numberOfLeadingZeros(if (c < 0) ~c else c)).max)
            require(precision <= 15, s"QLP coefficients need $precision bits (>15)")
            w2.put(0, 1); w2.put(0x20 | (o - 1), 6); w2.put(0, 1)
            (0 until o).foreach(i => w2.put(frame(i) & sMask, bps))
            w2.put(precision - 1, 4)
            w2.put(shift & 0x1F, 5)
            coefs.foreach(c => w2.put(c & ((1 << precision) - 1), precision))
            val res = (o until n).map { i =>
              var acc = 0L; var j = 0
              while (j < o) { acc += coefs(j).toLong * frame(i - 1 - j); j += 1 }
              val r = frame(i).toLong - (acc >> shift)
              require(r >= -(1L << 29) && r < (1L << 29),
                "fixture LPC residual too wide for zigzag coding — rescale coefs/shift")
              r.toInt
            }
            writeRice(res, o)
          case None => order0 match {
            case -2 =>
              require(frame.forall(_ == frame(0)), "CONSTANT frame must be constant")
              w2.put(0, 1); w2.put(0, 6); w2.put(0, 1)
              w2.put(frame(0) & sMask, bps)
            case -1 =>
              w2.put(0, 1); w2.put(1, 6); w2.put(0, 1)
              frame.foreach(s => w2.put(s & sMask, bps))
            case o =>
              require(o >= 0 && o <= 4 && o < n, s"fixed order $o invalid for $n samples")
              w2.put(0, 1); w2.put(0x08 | o, 6); w2.put(0, 1)
              (0 until o).foreach(i => w2.put(frame(i) & sMask, bps))
              val res = (o until n).map { i =>
                frame(i) - (o match {
                  case 0 => 0
                  case 1 => frame(i - 1)
                  case 2 => 2 * frame(i - 1) - frame(i - 2)
                  case 3 => 3 * frame(i - 1) - 3 * frame(i - 2) + frame(i - 3)
                  case _ => 4 * frame(i - 1) - 6 * frame(i - 2) + 4 * frame(i - 3) - frame(i - 4)
                })
              }
              writeRice(res, o)
          }
        }
        w2.align()
        val frameBytes = fb.toByteArray
        val c16 = crc16(frameBytes, 0, frameBytes.length)
        fb.write((c16 >> 8) & 0xFF); fb.write(c16 & 0xFF)
        out.write(fb.toByteArray)
        off += n
        frameIdx += 1
      }
      out.toByteArray
    }

    /** Stereo fixture writer: 16-bit L/R, per-frame channel assignment
      * via `modeFor` (1 = independent L/R, 8 = left/side, 9 =
      * side/right, 10 = mid/side — the decorrelated side channel coded
      * one bit wider, exactly the decoder's reconstruction), FIXED
      * subframes of `orderFor(frameIdx)` order per channel. */
    def encodeStereo(left: Array[Int], right: Array[Int], sampleRate: Int,
        blockSize: Int, modeFor: Int => Int, orderFor: Int => Int,
        partitionOrder: Int = 0): Array[Byte] = {
      require(left.length == right.length && left.nonEmpty,
        "stereo fixture needs equal-length L/R")
      require(left.forall(s => s >= -32768 && s <= 32767) &&
        right.forall(s => s >= -32768 && s <= 32767), "16-bit range")
      require((blockSize & ((1 << partitionOrder) - 1)) == 0,
        "partition order must divide block size")
      require(blockSize >= 1 && blockSize <= 256,
        "fixture block size exceeds 8-bit header coding (code 6)")
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes("US-ASCII"))
      out.write(0x80); out.write(0); out.write(0); out.write(34)
      val si = new java.io.ByteArrayOutputStream()
      val sb = new BitW(si)
      sb.put(blockSize, 16); sb.put(blockSize, 16)
      sb.put(0, 24); sb.put(0, 24)
      sb.put(sampleRate, 20); sb.put(1, 3) /* channels-1 */ ; sb.put(15, 5)
      sb.put(0, 4); sb.put(left.length, 32) // totalSamples (36 bits)
      out.write(si.toByteArray)
      out.write(new Array[Byte](16)) // PCM MD5: zero (metadata-only here)
      var off = 0
      var frameIdx = 0
      while (off < left.length) {
        val n = math.min(blockSize, left.length - off)
        val mode = modeFor(frameIdx)
        require(mode == 1 || (mode >= 8 && mode <= 10),
          s"bad stereo channel code $mode")
        val fb = new java.io.ByteArrayOutputStream()
        val w = new BitW(fb)
        w.put(0x3FFE, 14); w.put(0, 1); w.put(0, 1)
        w.put(6, 4); w.put(0, 4)        // bs code 6, rate from STREAMINFO
        w.put(mode, 4); w.put(4, 3); w.put(0, 1) // channel code, 16-bit
        require(frameIdx < 128, "fixture frame number exceeds 1-byte UTF-8 coding")
        w.put(frameIdx, 8)
        w.put(n - 1, 8)
        w.align()
        val headBytes = fb.toByteArray
        fb.write(crc8(headBytes, 0, headBytes.length))
        val w2 = new BitW(fb)
        val lf = java.util.Arrays.copyOfRange(left, off, off + n)
        val rf = java.util.Arrays.copyOfRange(right, off, off + n)
        val (ch0, ch1, e0, e1) = mode match {
          case 1 => (lf, rf, 16, 16)
          case 8 => (lf, Array.tabulate(n)(i => lf(i) - rf(i)), 16, 17)
          case 9 => (Array.tabulate(n)(i => lf(i) - rf(i)), rf, 17, 16)
          case _ => (Array.tabulate(n)(i => (lf(i) + rf(i)) >> 1),
                     Array.tabulate(n)(i => lf(i) - rf(i)), 16, 17)
        }
        def writeSub(samp: Array[Int], eff: Int): Unit = {
          val o = orderFor(frameIdx)
          require(o >= 0 && o <= 4 && o < n, s"fixed order $o invalid for $n samples")
          w2.put(0, 1); w2.put(0x08 | o, 6); w2.put(0, 1)
          (0 until o).foreach(i => w2.put(samp(i) & ((1 << eff) - 1), eff))
          val res = (o until n).map { i =>
            samp(i) - (o match {
              case 0 => 0
              case 1 => samp(i - 1)
              case 2 => 2 * samp(i - 1) - samp(i - 2)
              case 3 => 3 * samp(i - 1) - 3 * samp(i - 2) + samp(i - 3)
              case _ => 4 * samp(i - 1) - 6 * samp(i - 2) + 4 * samp(i - 3) - samp(i - 4)
            })
          }
          val pOrd = if (n == blockSize) partitionOrder else 0
          w2.put(0, 2); w2.put(pOrd, 4)
          var idx = 0
          (0 until (1 << pOrd)).foreach { part =>
            val cnt = (n >> pOrd) - (if (part == 0) o else 0)
            val slice = res.slice(idx, idx + cnt)
            idx += cnt
            val param = (0 to 14).minBy(k => riceCost(slice, k))
            w2.put(param, 4)
            slice.foreach { v =>
              val u = (v << 1) ^ (v >> 31)
              w2.putUnary(u >>> param)
              w2.put(u & ((1 << param) - 1), param)
            }
          }
        }
        writeSub(ch0, e0); writeSub(ch1, e1)
        w2.align()
        val frameBytes = fb.toByteArray
        val c16 = crc16(frameBytes, 0, frameBytes.length)
        fb.write((c16 >> 8) & 0xFF); fb.write(c16 & 0xFF)
        out.write(fb.toByteArray)
        off += n
        frameIdx += 1
      }
      out.toByteArray
    }
  }
}
