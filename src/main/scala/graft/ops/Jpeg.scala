package graft.ops

import Multimodal.{MediaItem, PixelImage}

/** REAL baseline JPEG (ITU-T T.81 / ISO 10918-1) decode, pure JVM — no
  * codec library. JPEG's byte layout is fully public: marker segments
  * (DQT quantization tables, DHT Huffman tables, SOF0 frame header,
  * SOS scan header), then an entropy-coded segment of Huffman-coded
  * (run, size) symbols over zigzag-ordered quantized DCT coefficients;
  * decode is Huffman -> dequantize -> de-zigzag -> 8x8 inverse DCT ->
  * level shift -> chroma upsample -> YCbCr->RGB. All of that is
  * arithmetic this file implements directly; nothing requires a native
  * codec. This moves the DOMINANT training-corpus image format off the
  * FakeDecoder stub (PPM/BMP/WAV/PNG were already real).
  *
  * Supported: baseline + extended sequential Huffman (SOF0/SOF1) AND
  * progressive Huffman (SOF2, T.81 Annex G: spectral selection,
  * successive approximation — DC first/refine, AC first with EOB runs,
  * AC refinement with correction bits; a large share of real web
  * corpus images are progressive, so a 100 TB image pipeline cannot
  * refuse them), 8-bit samples, 1 or 3 components, any h/v sampling
  * factors <= 4 (4:4:4, 4:2:2, 4:2:0, ... — chroma upsampled by
  * replication), restart markers (DRI/RSTn), multiple DQT/DHT
  * segments (including between progressive scans), fill bytes.
  * Refused with a clear error: arithmetic (SOF9+) coding, 12-bit
  * precision, DNL. Those are rare in training corpora and a pre-pass
  * can transcode stragglers.
  *
  * JpegEncoder is the deterministic FIXTURE side (the PngEncoder
  * pattern): it writes spec-valid baseline files with minimal custom
  * Huffman tables — enough to gate the decoder end-to-end in-engine.
  * Solid-color fixtures make the mm08 oracle closed-form: a constant
  * 8x8 block is DC-only, and with quantizer step q the decoded value
  * is EXACTLY the input when 8*(v-128) is a multiple of q (the IDCT of
  * a lone DC coefficient is the constant DC/8).
  */
object Jpeg {

  /** Scan-order index -> natural (row-major) position, T.81 Figure A.6. */
  val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** IDCT basis M(u)(x) = C(u)/2 * cos((2x+1) u pi / 16): the separable
    * half of the orthonormal 8x8 inverse DCT. */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** F.2.2.1 EXTEND: map a `t`-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Separable 8x8 IDCT of natural-order DEQUANTIZED coefficients,
    * level-shifted and clamped into the plane at (baseX, baseY).
    * coef is F[r][c]: r = vertical frequency (pairs with y), c =
    * horizontal (with x). Pass 1: tmp[r][x] = sum_c Basis[c][x] *
    * F[r][c]; pass 2: f(x,y) = sum_r Basis[r][y] * tmp[r][x]. Shared
    * by the baseline and progressive paths. */
  private def idct8x8Into(coef: Array[Int], tmp: Array[Array[Double]],
      plane: Array[Int], planeW: Int, baseX: Int, baseY: Int): Unit = {
    var r0 = 0
    while (r0 < 8) {
      var x0 = 0
      while (x0 < 8) {
        var acc = 0.0
        var c0 = 0
        while (c0 < 8) { acc += Basis(c0)(x0) * coef(r0 * 8 + c0); c0 += 1 }
        tmp(r0)(x0) = acc
        x0 += 1
      }
      r0 += 1
    }
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        var acc = 0.0
        var r2 = 0
        while (r2 < 8) { acc += Basis(r2)(yy) * tmp(r2)(xx); r2 += 1 }
        val s2 = Math.round(acc).toInt + 128
        val clamped = if (s2 < 0) 0 else if (s2 > 255) 255 else s2
        plane((baseY + yy) * planeW + baseX + xx) = clamped
        xx += 1
      }
      yy += 1
    }
  }

  /** Progressive AC "first" scan for one block (T.81 G.1.2.2): the
    * spectral band [ss, se] at point transform al; returns the updated
    * end-of-band run (blocks remaining to skip AFTER this one). */
  private def acFirstBlock(in: BitReader, ac: Huff, block: Array[Int],
      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    if (eobrunIn > 0) return eobrunIn - 1
    var k = ss
    while (k <= se) {
      val rs = ac.decode(in)
      val r = rs >> 4
      val s = rs & 15
      if (s == 0) {
        if (r == 15) k += 16 // ZRL
        else return (1 << r) - 1 + (if (r > 0) in.receive(r) else 0)
      } else {
        k += r
        require(k <= se, "AC run overflows spectral band")
        block(ZigZag(k)) = extend(in.receive(s), s) << al
        k += 1
      }
    }
    0
  }

  /** Progressive AC refinement scan for one block (T.81 G.1.2.3):
    * append one successive-approximation bit to every already-nonzero
    * coefficient of the band, and place newly-visible +-1<<al
    * coefficients. The walk after each symbol reads one correction bit
    * at each nonzero-history position it passes; `eobrun` here counts
    * bands whose REMAINDER is refinement-only, INCLUDING the current
    * one (decremented as each is consumed). */
  private def acRefineBlock(in: BitReader, ac: Huff, block: Array[Int],
      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    val p1 = 1 << al
    val m1 = -1 << al
    var eobrun = eobrunIn
    var k = ss
    if (eobrun == 0) {
      var inBand = true
      while (k <= se && inBand) {
        val rs = ac.decode(in)
        var r = rs >> 4
        val s = rs & 15
        var newval = 0
        if (s == 0) {
          if (r < 15) { // EOB(r): the band tail joins the history pass below
            eobrun = (1 << r) + (if (r > 0) in.receive(r) else 0)
            inBand = false
          } // r == 15: ZRL — the walk below consumes 16 zero-history slots
        } else {
          require(s == 1, "AC refinement symbol with size > 1")
          newval = if (in.nextBit() == 1) p1 else m1
        }
        if (inBand) {
          var placed = false
          while (k <= se && !placed) {
            val z = ZigZag(k)
            if (block(z) != 0) {
              if (in.nextBit() == 1 && (block(z) & p1) == 0)
                block(z) += (if (block(z) >= 0) p1 else m1)
            } else if (r == 0) {
              if (newval != 0) block(z) = newval
              placed = true
            } else r -= 1
            k += 1
          }
        }
      }
    }
    if (eobrun > 0) {
      while (k <= se) { // history-only refinement of the band remainder
        val z = ZigZag(k)
        if (block(z) != 0) {
          if (in.nextBit() == 1 && (block(z) & p1) == 0)
            block(z) += (if (block(z) >= 0) p1 else m1)
        }
        k += 1
      }
      eobrun - 1
    } else 0
  }

  /** Canonical Huffman table in T.81 form (16 length counts + values),
    * with the standard mincode/maxcode/valptr decode arrays (F.2.2.3). */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(in: BitReader): Int = {
      var l = 1
      var code = in.nextBit()
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | in.nextBit()
        l += 1
      }
      require(l <= 16, "invalid Huffman code in entropy stream")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  /** MSB-first bit reader over the entropy-coded segment: 0xFF00 is a
    * stuffed literal FF; any other marker mid-read is an error (restart
    * markers are consumed explicitly via expectRestart). */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        require(pos < data.length, "entropy stream truncated")
        var b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          require(pos < data.length, "entropy stream truncated at FF")
          val b2 = data(pos) & 0xFF
          require(b2 == 0x00,
            f"unexpected marker FF$b2%02X inside entropy-coded data")
          pos += 1
        }
        buf = b
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker (F.2.1.3.1). */
    def expectRestart(n: Int): Unit = {
      cnt = 0
      require(pos + 1 < data.length, "entropy stream truncated at restart")
      val m0 = data(pos) & 0xFF
      val m1 = data(pos + 1) & 0xFF
      require(m0 == 0xFF && m1 == 0xD0 + n,
        f"expected RST$n%d, found FF$m1%02X")
      pos += 2
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int)

  object JpegDecoder extends Multimodal.PixelDecoder {

    def isJpeg(p: Array[Byte]): Boolean =
      p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8

    override def decodePixels(item: MediaItem): PixelImage = {
      val p = item.payload
      val id = item.mediaId
      require(isJpeg(p), s"media $id: not a JPEG (missing SOI)")
      var pos = 2

      val qtab = new Array[Array[Int]](4)
      val dcTab = new Array[Huff](4)
      val acTab = new Array[Huff](4)
      var width = 0
      var height = 0
      var comps: Array[Component] = null
      var restartInterval = 0
      var scanned: Array[Array[Int]] = null // per-comp plane, padded dims
      var planeW: Array[Int] = null
      var planeH: Array[Int] = null
      // progressive (SOF2) state: RAW successive-approximation
      // coefficients accumulate across scans in natural order, per
      // padded block grid; dequantize + IDCT happen once, at EOI
      var progressive = false
      var coefStore: Array[Array[Array[Int]]] = null
      var mcusX = 0
      var mcusY = 0
      var padBW: Array[Int] = null  // padded (MCU-grid) blocks per row
      var usedBW: Array[Int] = null // the component's OWN block dims —
      var usedBH: Array[Int] = null // non-interleaved scans walk these
      var sawScan = false

      // bounds-checked: a truncated file refuses (the require contract
      // every decoder here shares), never a raw bounds escape — marker
      // SEGMENT bodies routinely run past the end of a cut-off payload
      def u8(): Int = {
        require(pos < p.length, s"media $id: truncated JPEG (read past byte $pos)")
        val v = p(pos) & 0xFF; pos += 1; v
      }
      def u16(): Int = { val hi = u8(); (hi << 8) | u8() }

      var done = false
      while (!done) {
        require(pos + 1 < p.length, s"media $id: truncated before marker")
        require((u8()) == 0xFF, s"media $id: marker sync lost")
        var marker = u8()
        while (marker == 0xFF) marker = u8() // fill bytes
        marker match {
          case 0xD9 => // EOI: finalize a progressive decode, else error
            require(progressive && sawScan, s"media $id: EOI before SOS")
            // dequantize (q is stored in zigzag slots, coefStore in
            // natural order) and run the shared IDCT per block
            val tmp = Array.ofDim[Double](8, 8)
            val deq = new Array[Int](64)
            var c = 0
            while (c < comps.length) {
              val q = qtab(comps(c).tq)
              require(q != null, s"media $id: missing quant table ${comps(c).tq}")
              val bw = padBW(c)
              val nBlocks = coefStore(c).length
              var b = 0
              while (b < nBlocks) {
                val blk = coefStore(c)(b)
                var k = 0
                while (k < 64) { deq(ZigZag(k)) = blk(ZigZag(k)) * q(k); k += 1 }
                idct8x8Into(deq, tmp, scanned(c), planeW(c),
                  (b % bw) * 8, (b / bw) * 8)
                b += 1
              }
              c += 1
            }
            done = true
          case 0xDB => // DQT — one or more tables
            val end = pos + u16() - 2
            while (pos < end) {
              val pqTq = u8()
              require(pqTq >> 4 == 0,
                s"media $id: 16-bit quantization tables not supported")
              require((pqTq & 15) <= 3,
                s"media $id: quantization table id ${pqTq & 15} out of range")
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(k) = u8(); k += 1 }
              qtab(pqTq & 15) = t
            }
          case 0xC4 => // DHT — one or more tables
            val end = pos + u16() - 2
            while (pos < end) {
              val tcTh = u8()
              val bits = Array.fill(16)(0)
              var n = 0
              var i = 0
              while (i < 16) { bits(i) = u8(); n += bits(i); i += 1 }
              val vals = new Array[Int](n)
              i = 0
              while (i < n) { vals(i) = u8(); i += 1 }
              require((tcTh & 15) <= 3 && (tcTh >> 4) <= 1,
                s"media $id: Huffman table spec ${tcTh} out of range")
              val h = new Huff(bits, vals)
              if (tcTh >> 4 == 0) dcTab(tcTh & 15) = h else acTab(tcTh & 15) = h
            }
          case 0xC0 | 0xC1 | 0xC2 => // SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            u16()
            require(u8() == 8, s"media $id: only 8-bit precision supported")
            height = u16(); width = u16()
            Multimodal.checkDims(id, width, height)
            val nf = u8()
            require(nf == 1 || nf == 3,
              s"media $id: $nf components unsupported (1=gray, 3=YCbCr)")
            comps = Array.fill(nf) {
              val cid = u8(); val hv = u8(); val tq = u8()
              val comp = Component(cid, hv >> 4, hv & 15, tq)
              require(comp.h >= 1 && comp.h <= 4 && comp.v >= 1 && comp.v <= 4,
                s"media $id: sampling factors ${comp.h}x${comp.v} out of range")
              require(tq <= 3, s"media $id: quantization table id $tq out of range")
              comp
            }
          case m if m >= 0xC3 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
            throw new IllegalArgumentException(
              f"media $id: SOF$m%02X coding process not supported")
          case 0xDD => // DRI
            u16(); restartInterval = u16()
          case 0xDA => // SOS — scan header then entropy-coded data
            require(comps != null, s"media $id: SOS before SOF")
            u16()
            val ns = u8()
            require(ns >= 1 && ns <= comps.length,
              s"media $id: bad scan component count $ns")
            val scanComp = new Array[Int](ns)
            val useDc = new Array[Int](ns)
            val useAc = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cs = u8()
              val j = comps.indexWhere(_.id == cs)
              require(j >= 0, s"media $id: scan names unknown component $cs")
              scanComp(i) = j
              val tdTa = u8()
              require((tdTa >> 4) <= 3 && (tdTa & 15) <= 3,
                s"media $id: scan Huffman table ids $tdTa out of range")
              useDc(i) = tdTa >> 4
              useAc(i) = tdTa & 15
              i += 1
            }
            val ssSpec = u8(); val seSpec = u8()
            val ahAl = u8(); val ah = ahAl >> 4; val al = ahAl & 15

            val hmax = comps.map(_.h).max
            val vmax = comps.map(_.v).max
            mcusX = (width + 8 * hmax - 1) / (8 * hmax)
            mcusY = (height + 8 * vmax - 1) / (8 * vmax)
            if (planeW == null) {
              planeW = comps.map(c => mcusX * c.h * 8)
              planeH = comps.map(c => mcusY * c.v * 8)
              scanned = comps.indices.map(c => new Array[Int](planeW(c) * planeH(c))).toArray
            }

            if (progressive) {
              // -------- progressive scan (T.81 Annex G): accumulate raw
              // coefficients; pixels materialize at EOI
              sawScan = true
              require(ssSpec <= 63 && seSpec <= 63 && ssSpec <= seSpec,
                s"media $id: bad spectral band [$ssSpec, $seSpec]")
              if (ssSpec == 0) require(seSpec == 0,
                s"media $id: progressive DC scan must have Se=0")
              else require(ns == 1,
                s"media $id: progressive AC scans are single-component")
              if (coefStore == null) {
                padBW = comps.map(c => mcusX * c.h)
                usedBW = comps.map(c => ((width * c.h + hmax - 1) / hmax + 7) / 8)
                usedBH = comps.map(c => ((height * c.v + vmax - 1) / vmax + 7) / 8)
                coefStore = comps.indices.map(c =>
                  Array.fill(padBW(c) * mcusY * comps(c).v)(new Array[Int](64))).toArray
              }
              val in = new BitReader(p, pos)
              val dcPred = new Array[Int](comps.length)
              var eobrun = 0
              def dcDecode(si: Int, blk: Array[Int]): Unit =
                if (ah == 0) { // DC first: Huffman diff, shifted by Al
                  val dc = dcTab(useDc(si))
                  require(dc != null, s"media $id: missing DC Huffman table")
                  val t = dc.decode(in)
                  dcPred(scanComp(si)) += extend(in.receive(t), t)
                  blk(0) = dcPred(scanComp(si)) << al
                } else blk(0) |= in.nextBit() << al // DC refine: one raw bit
              if (ssSpec == 0 && ns > 1) {
                // interleaved DC scan over the MCU grid
                var mcu = 0
                val nMcus = mcusX * mcusY
                while (mcu < nMcus) {
                  if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                    in.expectRestart((mcu / restartInterval - 1) % 8)
                    java.util.Arrays.fill(dcPred, 0)
                  }
                  val mx = mcu % mcusX
                  val my = mcu / mcusX
                  var si = 0
                  while (si < ns) {
                    val c = scanComp(si)
                    val comp = comps(c)
                    var by = 0
                    while (by < comp.v) {
                      var bx = 0
                      while (bx < comp.h) {
                        dcDecode(si,
                          coefStore(c)((my * comp.v + by) * padBW(c) + mx * comp.h + bx))
                        bx += 1
                      }
                      by += 1
                    }
                    si += 1
                  }
                  mcu += 1
                }
              } else {
                // non-interleaved: walk the single component's OWN block
                // grid (G.1: ns=1 scans ignore the MCU padding)
                val c = scanComp(0)
                val acH = acTab(useAc(0))
                require(ssSpec == 0 || acH != null,
                  s"media $id: missing AC Huffman table")
                val bw = usedBW(c)
                val total = bw * usedBH(c)
                var bi = 0
                while (bi < total) {
                  if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
                    in.expectRestart((bi / restartInterval - 1) % 8)
                    java.util.Arrays.fill(dcPred, 0)
                    eobrun = 0
                  }
                  val blk = coefStore(c)((bi / bw) * padBW(c) + bi % bw)
                  if (ssSpec == 0) dcDecode(0, blk)
                  else if (ah == 0)
                    eobrun = acFirstBlock(in, acH, blk, ssSpec, seSpec, al, eobrun)
                  else
                    eobrun = acRefineBlock(in, acH, blk, ssSpec, seSpec, al, eobrun)
                  bi += 1
                }
              }
              pos = in.pos
              // done stays false: further scans (then EOI) follow
            } else {
            // -------- baseline: one interleaved full-band scan
            require(ns == comps.length, s"media $id: partial scans unsupported")
            require(ssSpec == 0 && seSpec == 63 && ah == 0 && al == 0,
              s"media $id: non-baseline spectral selection")
            val dcByComp = new Array[Int](comps.length)
            val acByComp = new Array[Int](comps.length)
            i = 0
            while (i < ns) {
              dcByComp(scanComp(i)) = useDc(i)
              acByComp(scanComp(i)) = useAc(i)
              i += 1
            }

            val in = new BitReader(p, pos)
            val dcPred = new Array[Int](comps.length)
            val coef = new Array[Int](64)
            val tmp = Array.ofDim[Double](8, 8)
            var mcu = 0
            val nMcus = mcusX * mcusY
            while (mcu < nMcus) {
              if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                in.expectRestart((mcu / restartInterval - 1) % 8)
                java.util.Arrays.fill(dcPred, 0)
              }
              val mx = mcu % mcusX
              val my = mcu / mcusX
              var c = 0
              while (c < comps.length) {
                val comp = comps(c)
                val q = qtab(comp.tq)
                require(q != null, s"media $id: missing quant table ${comp.tq}")
                val dc = dcTab(dcByComp(c)); val ac = acTab(acByComp(c))
                require(dc != null && ac != null, s"media $id: missing Huffman table")
                var by = 0
                while (by < comp.v) {
                  var bx = 0
                  while (bx < comp.h) {
                    // -- decode one 8x8 block --
                    java.util.Arrays.fill(coef, 0)
                    val t = dc.decode(in)
                    dcPred(c) += extend(in.receive(t), t)
                    coef(0) = dcPred(c) * q(0)
                    var k = 1
                    var eob = false
                    while (k < 64 && !eob) {
                      val rs = ac.decode(in)
                      val r = rs >> 4; val s = rs & 15
                      if (s == 0) {
                        if (r == 15) k += 16 // ZRL
                        else eob = true
                      } else {
                        k += r
                        require(k < 64, s"media $id: AC run overflows block")
                        coef(ZigZag(k)) = extend(in.receive(s), s) * q(k)
                        k += 1
                      }
                    }
                    // -- inverse DCT + level shift into the plane --
                    idct8x8Into(coef, tmp, scanned(c), planeW(c),
                      (mx * comp.h + bx) * 8, (my * comp.v + by) * 8)
                    bx += 1
                  }
                  by += 1
                }
                c += 1
              }
              mcu += 1
            }
            pos = in.pos
            done = true
            } // end baseline SOS branch
          case m if m >= 0xE0 && m <= 0xEF => // APPn
            val l = u16()
            require(l >= 2 && pos + l - 2 <= p.length, s"media $id: bad APP segment length")
            pos += l - 2
          case 0xFE => // COM
            val l = u16()
            require(l >= 2 && pos + l - 2 <= p.length, s"media $id: bad COM segment length")
            pos += l - 2
          case other =>
            throw new IllegalArgumentException(
              f"media $id: unsupported marker FF$other%02X")
        }
      }

      // upsample-by-replication + color convert to the engine raster
      val hmax = comps.map(_.h).max
      val vmax = comps.map(_.v).max
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val d = (y * width + x) * 3
          if (comps.length == 1) {
            val g = scanned(0)(y * planeW(0) + x).toByte
            out(d) = g; out(d + 1) = g; out(d + 2) = g
          } else {
            def sample(c: Int): Int =
              scanned(c)((y * comps(c).v / vmax) * planeW(c) + (x * comps(c).h / hmax))
            val yv = sample(0); val cb = sample(1) - 128; val cr = sample(2) - 128
            def clamp(v: Long): Byte =
              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
            out(d) = clamp(Math.round(yv + 1.402 * cr))
            out(d + 1) = clamp(Math.round(yv - 0.344136 * cb - 0.714136 * cr))
            out(d + 2) = clamp(Math.round(yv + 1.772 * cb))
          }
          x += 1
        }
        y += 1
      }
      PixelImage(width, height, out)
    }
  }

  /** Deterministic fixture encoder (spec-valid baseline JPEG with
    * minimal custom Huffman tables — the file carries its own tables,
    * so nothing requires the Annex K defaults). General enough to gate
    * the decoder: arbitrary quantized coefficients per block
    * (DC prediction, ZRL runs, EOB), restart markers, 1-component or
    * 3-component 4:2:0 layouts. */
  object JpegEncoder extends Serializable {

    private final class BitWriter(out: java.io.ByteArrayOutputStream) {
      private var buf = 0
      private var cnt = 0
      def put(v: Int, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          buf = (buf << 1) | ((v >> i) & 1)
          cnt += 1
          if (cnt == 8) {
            out.write(buf)
            if (buf == 0xFF) out.write(0x00) // byte stuffing
            buf = 0; cnt = 0
          }
          i -= 1
        }
      }
      def flushWithOnes(): Unit =
        if (cnt > 0) { put((1 << (8 - cnt)) - 1, 8 - cnt) }
    }

    private def category(v: Int): Int = {
      var c = 0
      var m = math.abs(v)
      while (m > 0) { c += 1; m >>= 1 }
      c
    }
    private def magnitudeBits(v: Int, c: Int): Int =
      if (v >= 0) v else v + (1 << c) - 1

    /** Canonical table: every used symbol at code length 8 (Kraft-safe
      * for <= 255 symbols; canonical codes 0..n-1). Returns the DHT
      * payload and the symbol->code map. */
    private def buildTable(symbols: Seq[Int]): (Array[Byte], Map[Int, Int]) = {
      val syms = symbols.distinct.sorted
      require(syms.size < 256, "fixture Huffman table overflow")
      val bits = Array.fill(16)(0)
      bits(7) = syms.size // all codes length 8
      val payload = bits.map(_.toByte) ++ syms.map(_.toByte)
      (payload, syms.zipWithIndex.toMap)
    }

    private def seg(marker: Int, body: Array[Byte]): Array[Byte] = {
      val len = body.length + 2
      Array(0xFF.toByte, marker.toByte, (len >> 8).toByte, (len & 0xFF).toByte) ++ body
    }

    /** One component plane of quantized DCT coefficient blocks in
      * row-major block order; `blocksX` columns of blocks. */
    final case class Plane(blocksX: Int, blocksY: Int, h: Int, v: Int,
                           blocks: Seq[Array[Int]]) {
      require(blocks.size == blocksX * blocksY, "plane block count mismatch")
    }

    /** Encodes a spec-valid baseline JPEG. Component ids are 1..n;
      * every component shares quant table 0 (`quant`, natural order is
      * irrelevant for the flat fixtures; stored in zigzag slots) and
      * Huffman tables 0. */
    def encode(width: Int, height: Int, quant: Array[Int],
               planes: Seq[Plane], restartInterval: Int = 0): Array[Byte] = {
      require(quant.length == 64, "quant table must have 64 entries")
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0xFF, 0xD8).map(_.toByte)) // SOI

      out.write(seg(0xDB, Array(0x00.toByte) ++ quant.map(_.toByte)))

      // interleave MCUs to collect the exact symbol stream first
      val hmax = planes.map(_.h).max
      val vmax = planes.map(_.v).max
      val mcusX = planes.head.blocksX / planes.head.h
      val mcusY = planes.head.blocksY / planes.head.v
      // (symbol, isAc, value, size) events in stream order
      final case class Ev(sym: Int, ac: Boolean, value: Int, size: Int)
      val events = scala.collection.mutable.ArrayBuffer.empty[Ev]
      val resets = scala.collection.mutable.ArrayBuffer.empty[Int] // event idx of each restart
      val dcPred = new Array[Int](planes.size)
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          resets += events.size
          java.util.Arrays.fill(dcPred, 0)
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        planes.zipWithIndex.foreach { case (pl, c) =>
          var by = 0
          while (by < pl.v) {
            var bx = 0
            while (bx < pl.h) {
              val block = pl.blocks((my * pl.v + by) * pl.blocksX + (mx * pl.h + bx))
              val diff = block(0) - dcPred(c)
              dcPred(c) = block(0)
              val dcCat = category(diff)
              events += Ev(dcCat, ac = false, magnitudeBits(diff, dcCat), dcCat)
              var k = 1
              var run = 0
              var lastNz = 63
              while (lastNz > 0 && block(ZigZag(lastNz)) == 0) lastNz -= 1
              while (k <= lastNz) {
                val v = block(ZigZag(k))
                if (v == 0) { run += 1 }
                else {
                  while (run >= 16) { events += Ev(0xF0, ac = true, 0, 0); run -= 16 }
                  val s = category(v)
                  events += Ev((run << 4) | s, ac = true, magnitudeBits(v, s), s)
                  run = 0
                }
                k += 1
              }
              if (lastNz < 63) events += Ev(0x00, ac = true, 0, 0) // EOB
              bx += 1
            }
            by += 1
          }
        }
        mcu += 1
      }

      val (dcPayload, dcCodes) = buildTable(events.filter(!_.ac).map(_.sym).toSeq)
      val (acPayload, acCodes) = buildTable(events.filter(_.ac).map(_.sym).toSeq)
      out.write(seg(0xC4, Array(0x00.toByte) ++ dcPayload))
      out.write(seg(0xC4, Array(0x10.toByte) ++ acPayload))

      val sofBody = Array(8.toByte,
        (height >> 8).toByte, (height & 0xFF).toByte,
        (width >> 8).toByte, (width & 0xFF).toByte,
        planes.size.toByte) ++
        planes.zipWithIndex.flatMap { case (pl, i) =>
          Array((i + 1).toByte, ((pl.h << 4) | pl.v).toByte, 0x00.toByte)
        }
      out.write(seg(0xC0, sofBody))
      if (restartInterval > 0)
        out.write(seg(0xDD, Array((restartInterval >> 8).toByte, (restartInterval & 0xFF).toByte)))

      val sosBody = Array(planes.size.toByte) ++
        planes.indices.flatMap(i => Array((i + 1).toByte, 0x00.toByte)) ++
        Array(0x00.toByte, 63.toByte, 0x00.toByte)
      out.write(seg(0xDA, sosBody))

      val bw = new BitWriter(out)
      var rstN = 0
      var nextReset = 0
      events.zipWithIndex.foreach { case (ev, i) =>
        if (nextReset < resets.size && resets(nextReset) == i) {
          bw.flushWithOnes()
          out.write(Array(0xFF.toByte, (0xD0 + rstN).toByte))
          rstN = (rstN + 1) % 8
          nextReset += 1
        }
        bw.put(if (ev.ac) acCodes(ev.sym) else dcCodes(ev.sym), 8)
        if (ev.size > 0) bw.put(ev.value, ev.size)
      }
      bw.flushWithOnes()
      out.write(Array(0xFF, 0xD9).map(_.toByte)) // EOI
      out.toByteArray
    }

    /** One progressive scan script entry: component indices (into the
      * planes seq), spectral band [ss, se], successive-approximation
      * high/low bit positions (ah = 0 for a first scan). */
    final case class Scan(compIdxs: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)

    /** AC point transform (T.81 §G.1.1.2): divide by 2^al truncating
      * toward zero — NOT an arithmetic shift for negatives. */
    private def pt(v: Int, al: Int): Int = if (v >= 0) v >> al else -((-v) >> al)

    /** Progressive (SOF2) twin of encode(): the same quantized
      * coefficient planes delivered through a scripted scan sequence —
      * DC first/refine, spectral AC bands, successive approximation.
      * The entropy coding MIRRORS the decoder's walk exactly (symbol,
      * sign bit, then correction bits at nonzero-history positions in
      * position order); EOB runs are flushed per block (a spec-valid
      * encoder choice that keeps the stream deterministic). Scans must
      * jointly deliver every coefficient down to al = 0 for the decode
      * to equal the baseline decode of the same planes. Fixture-side
      * restriction: plane grids must be MCU-aligned (used == padded
      * block grid), which all our fixtures are. */
    def encodeProgressive(width: Int, height: Int, quant: Array[Int],
        planes: Seq[Plane], scans: Seq[Scan]): Array[Byte] = {
      require(quant.length == 64, "quant table must have 64 entries")
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0xFF, 0xD8).map(_.toByte)) // SOI
      out.write(seg(0xDB, Array(0x00.toByte) ++ quant.map(_.toByte)))
      val sofBody = Array(8.toByte,
        (height >> 8).toByte, (height & 0xFF).toByte,
        (width >> 8).toByte, (width & 0xFF).toByte,
        planes.size.toByte) ++
        planes.zipWithIndex.flatMap { case (pl, i) =>
          Array((i + 1).toByte, ((pl.h << 4) | pl.v).toByte, 0x00.toByte)
        }
      out.write(seg(0xC2, sofBody)) // SOF2: progressive

      val mcusX = planes.head.blocksX / planes.head.h
      val mcusY = planes.head.blocksY / planes.head.v

      scans.foreach { scan =>
        require(scan.ss <= scan.se && scan.se <= 63, s"bad band $scan")
        // (sym, value, size): sym >= 0 is a Huffman symbol followed by
        // `size` magnitude bits; sym = -1 is raw bits only
        final case class Ev(sym: Int, value: Int, size: Int)
        val events = scala.collection.mutable.ArrayBuffer.empty[Ev]
        def raw(v: Int, n: Int): Unit = events += Ev(-1, v, n)

        // Cross-block EOB runs (G.1.2.2): a deferred EOB covers the
        // current block's band terminator PLUS every following block
        // whose band is content-free in this scan; the run's refinement
        // correction bits (each covered block's band tail, in block
        // order) follow the EOB symbol — exactly what the decoder's
        // eobrun path consumes.
        var eobCount = 0
        val eobBits = scala.collection.mutable.ArrayBuffer.empty[Int]
        def flushEob(): Unit = if (eobCount > 0) {
          val r = 31 - Integer.numberOfLeadingZeros(eobCount)
          events += Ev(r << 4, eobCount - (1 << r), r)
          eobBits.foreach(b => raw(b, 1))
          eobBits.clear()
          eobCount = 0
        }
        def joinEobRun(tailBits: Seq[Int]): Unit = {
          eobCount += 1
          eobBits ++= tailBits
          if (eobCount == 32767) flushEob()
        }
        def historyBits(block: Array[Int], from: Int): Seq[Int] =
          (from to scan.se).collect {
            case k if pt(block(ZigZag(k)), scan.ah) != 0 =>
              math.abs(pt(block(ZigZag(k)), scan.al)) & 1
          }

        def emitAcFirst(block: Array[Int]): Unit = {
          var lastNz = scan.se
          while (lastNz >= scan.ss && pt(block(ZigZag(lastNz)), scan.al) == 0) lastNz -= 1
          if (lastNz < scan.ss) { joinEobRun(Nil); return } // content-free band
          flushEob()
          var run = 0
          var k = scan.ss
          while (k <= lastNz) {
            val v = pt(block(ZigZag(k)), scan.al)
            if (v == 0) run += 1
            else {
              while (run >= 16) { events += Ev(0xF0, 0, 0); run -= 16 }
              val s = category(v)
              events += Ev((run << 4) | s, magnitudeBits(v, s), s)
              run = 0
            }
            k += 1
          }
          if (lastNz < scan.se) eobCount = 1 // deferred terminator starts a run
        }

        def emitAcRefine(block: Array[Int]): Unit = {
          var idx = scan.ss
          // consume `zeros`+1 zero-HISTORY positions (the decoder's walk),
          // emitting one correction bit at every nonzero-history position
          def walkEmit(zeros: Int): Unit = {
            var r = zeros
            var doneW = false
            while (idx <= scan.se && !doneW) {
              if (pt(block(ZigZag(idx)), scan.ah) != 0)
                raw(math.abs(pt(block(ZigZag(idx)), scan.al)) & 1, 1)
              else { if (r == 0) doneW = true else r -= 1 }
              idx += 1
            }
          }
          def nextStop(): (Int, Int) = { // (zero-history run, stop idx or -1)
            var j = idx
            var zeros = 0
            while (j <= scan.se) {
              if (pt(block(ZigZag(j)), scan.ah) == 0) {
                if (pt(block(ZigZag(j)), scan.al) != 0) return (zeros, j)
                zeros += 1
              }
              j += 1
            }
            (zeros, -1)
          }
          if (nextStop()._2 < 0) { // no new coefficients: join the EOB run
            joinEobRun(historyBits(block, scan.ss))
            return
          }
          flushEob()
          var doneBlock = false
          while (!doneBlock) {
            val (zeros, stop) = nextStop()
            if (stop < 0) {
              if (idx <= scan.se) { // trailing tail starts a new run
                eobCount = 1
                eobBits ++= historyBits(block, idx)
              }
              doneBlock = true
            } else {
              var z = zeros
              while (z >= 16) { events += Ev(0xF0, 0, 0); walkEmit(15); z -= 16 }
              val cv = pt(block(ZigZag(stop)), scan.al)
              events += Ev((z << 4) | 1, 0, 0)
              raw(if (cv > 0) 1 else 0, 1)
              walkEmit(z)
            }
          }
        }

        if (scan.ss == 0) { // DC scan
          val dcPred = new Array[Int](planes.size)
          def emitDc(c: Int, block: Array[Int]): Unit =
            if (scan.ah == 0) {
              val vs = block(0) >> scan.al // DC point transform IS arithmetic shift
              val diff = vs - dcPred(c)
              dcPred(c) = vs
              val cat = category(diff)
              events += Ev(cat, magnitudeBits(diff, cat), cat)
            } else raw((block(0) >> scan.al) & 1, 1)
          if (scan.compIdxs.size > 1) { // interleaved MCU walk
            var mcu = 0
            while (mcu < mcusX * mcusY) {
              val mx = mcu % mcusX
              val my = mcu / mcusX
              scan.compIdxs.foreach { c =>
                val pl = planes(c)
                var by = 0
                while (by < pl.v) {
                  var bx = 0
                  while (bx < pl.h) {
                    emitDc(c, pl.blocks((my * pl.v + by) * pl.blocksX + mx * pl.h + bx))
                    bx += 1
                  }
                  by += 1
                }
              }
              mcu += 1
            }
          } else planes(scan.compIdxs.head).blocks.foreach(b =>
            emitDc(scan.compIdxs.head, b))
        } else { // AC scan: single component, non-interleaved
          require(scan.compIdxs.size == 1, "progressive AC scans are single-component")
          planes(scan.compIdxs.head).blocks.foreach { b =>
            if (scan.ah == 0) emitAcFirst(b) else emitAcRefine(b)
          }
          flushEob() // the scan may end inside a deferred EOB run
        }

        val syms = events.filter(_.sym >= 0).map(_.sym).toSeq
        val codes: Map[Int, Int] = if (syms.isEmpty) Map.empty else {
          val (payload, cs) = buildTable(syms)
          out.write(seg(0xC4,
            Array((if (scan.ss == 0) 0x00 else 0x10).toByte) ++ payload))
          cs
        }
        val sosBody = Array(scan.compIdxs.size.toByte) ++
          scan.compIdxs.flatMap(ci => Array((ci + 1).toByte, 0x00.toByte)) ++
          Array(scan.ss.toByte, scan.se.toByte,
            ((scan.ah << 4) | scan.al).toByte)
        out.write(seg(0xDA, sosBody))
        val bw = new BitWriter(out)
        events.foreach { ev =>
          if (ev.sym >= 0) bw.put(codes(ev.sym), 8)
          if (ev.size > 0) bw.put(ev.value, ev.size)
        }
        bw.flushWithOnes()
      }
      out.write(Array(0xFF, 0xD9).map(_.toByte)) // EOI
      out.toByteArray
    }

    /** The standard full progressive script for a single-component
      * image: DC first at al, DC refinements down to 0, split AC bands
      * first at al then refined to 0 — exercises every Annex G decode
      * path (EOBRUN, ZRL-in-refinement, newly-visible coefficients). */
    def grayScript(al: Int = 1): Seq[Scan] =
      Seq(Scan(Seq(0), 0, 0, 0, al)) ++
        (al to 1 by -1).map(a => Scan(Seq(0), 0, 0, a, a - 1)) ++
        Seq(Scan(Seq(0), 1, 5, 0, al), Scan(Seq(0), 6, 63, 0, al)) ++
        (al to 1 by -1).flatMap(a =>
          Seq(Scan(Seq(0), 1, 5, a, a - 1), Scan(Seq(0), 6, 63, a, a - 1)))

    private val FlatQ16: Array[Int] = Array.fill(64)(16)

    /** Solid-gray baseline JPEG, w/h multiples of 8. With the flat
      * q=16 table, an even (v-128) offset survives quantization
      * exactly: DC = 8(v-128)/16 = (v-128)/2, decode = 2*DC + 128 = v. */
    def solidGray(width: Int, height: Int, v: Int): Array[Byte] = {
      require(width % 8 == 0 && height % 8 == 0, "fixture dims must be block-aligned")
      require((v - 128) % 2 == 0 && v >= 0 && v <= 255, s"gray $v not exactly encodable")
      val bx = width / 8
      val by = height / 8
      val block = new Array[Int](64)
      block(0) = (v - 128) / 2
      encode(width, height, FlatQ16,
        Seq(Plane(bx, by, 1, 1, Seq.fill(bx * by)(block))))
    }

    /** Progressive twin of solidGray — identical closed-form pixels,
      * delivered through the full DC/AC successive-approximation
      * script. */
    def solidGrayProgressive(width: Int, height: Int, v: Int): Array[Byte] = {
      require(width % 8 == 0 && height % 8 == 0, "fixture dims must be block-aligned")
      require((v - 128) % 2 == 0 && v >= 0 && v <= 255, s"gray $v not exactly encodable")
      val bx = width / 8
      val by = height / 8
      val block = new Array[Int](64)
      block(0) = (v - 128) / 2
      encodeProgressive(width, height, FlatQ16,
        Seq(Plane(bx, by, 1, 1, Seq.fill(bx * by)(block))), grayScript())
    }

    /** Solid-color 4:2:0 fixture (Y at 2x2, Cb/Cr at 1x1), w/h
      * multiples of 16; all three channel values need even offsets. */
    def solidColor420(width: Int, height: Int, yv: Int, cb: Int, cr: Int): Array[Byte] = {
      require(width % 16 == 0 && height % 16 == 0, "fixture dims must be MCU-aligned")
      Seq(yv, cb, cr).foreach(v =>
        require((v - 128) % 2 == 0 && v >= 0 && v <= 255, s"channel $v not exactly encodable"))
      def plane(bx: Int, by: Int, h: Int, v: Int, value: Int): Plane = {
        val b = new Array[Int](64)
        b(0) = (value - 128) / 2
        Plane(bx, by, h, v, Seq.fill(bx * by)(b))
      }
      encode(width, height, FlatQ16, Seq(
        plane(width / 8, height / 8, 2, 2, yv),
        plane(width / 16, height / 16, 1, 1, cb),
        plane(width / 16, height / 16, 1, 1, cr)))
    }

    /** Single 8x8 gray block from arbitrary natural-order QUANTIZED
      * coefficients — the decoder-generality fixture (ZRL runs, AC
      * categories, signed magnitudes). */
    def grayFromQuantized(coefs: Array[Int], quant: Array[Int] = FlatQ16,
                          restartInterval: Int = 0): Array[Byte] =
      encode(8, 8, quant, Seq(Plane(1, 1, 1, 1, Seq(coefs))), restartInterval)
  }
}
