package graft.pinot

import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random property tests for the secondary-index sections: the
  * SOUNDNESS invariant of each (candidates ⊇ true matches — an index may
  * only ever widen, never drop) under adversarial values: NaN, ±0.0,
  * duplicates, clusters, empty strings.
  */
class IndexPropertySpec extends AnyFunSuite {

  test("corrupt headers fail as format errors, not allocation death") {
    import java.nio.ByteBuffer
    // counts chosen so the Int form of the size arithmetic overflows to
    // a small/negative value (0x20000000 * 16 wraps) — the guard must
    // reject in Long arithmetic BEFORE any allocation happens
    def rangeBytes(nr: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(20)
      b.putLong(PinotDictionary.MagicMarker)
      b.putInt(RangeSection.Version); b.putInt(nr); b.array()
    }
    def textBytes(nt: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(16)
      b.putLong(PinotDictionary.MagicMarker)
      b.putInt(TextIndexSection.Version); b.putInt(nt); b.array()
    }
    def bloomBytes(numLongs: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(20)
      b.putLong(PinotDictionary.MagicMarker)
      b.putInt(BloomSection.Version); b.putInt(7); b.putInt(numLongs)
      b.array()
    }
    Seq(0x20000000, 0x70000000, Int.MaxValue).foreach { n =>
      intercept[PinotFormatException](RangeSection.deserialize(
        rangeBytes(n) ++ new Array[Byte](16)))
      intercept[PinotFormatException](TextIndexSection.deserialize(
        textBytes(n) ++ new Array[Byte](16)))
      intercept[PinotFormatException](BloomSection.deserialize(
        bloomBytes(n) ++ new Array[Byte](16)))
    }
    // a token whose declared length exceeds the buffer fails the same way
    val tb = ByteBuffer.allocate(16 + 4 + 8)
    tb.putLong(PinotDictionary.MagicMarker)
    tb.putInt(TextIndexSection.Version)
    tb.putInt(1)              // one token
    tb.putInt(Int.MaxValue)   // of impossible length
    intercept[PinotFormatException](TextIndexSection.deserialize(tb.array()))
  }

  test("bloom: no false negatives over random value sets (property)") {
    val rnd = new scala.util.Random(31)
    (0 until 20).foreach { round =>
      val n = 1 + rnd.nextInt(3000)
      val values = Array.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
      val bf = BloomSection.deserialize(
        BloomSection.build(values.toSet).serialize())
      values.foreach(v => assert(bf.mightContain(v),
        s"round $round: false negative for '$v'"))
    }
  }

  test("range: candidates cover every matching doc (property, long + double)") {
    val rnd = new scala.util.Random(32)
    def check[T](bits: Either[Array[Long], Array[Double]],
        matches: (Int, Option[Long], Boolean, Option[Long], Boolean) => Boolean,
        toBits: Double => Long): Unit = {
      val sec = RangeSection.deserialize(
        RangeSection.build(bits, targetRanges = 1 + rnd.nextInt(12)))
      val n = bits.fold(_.length, _.length)
      (0 until 40).foreach { _ =>
        val lo = if (rnd.nextBoolean()) Some(toBits(rnd.nextDouble() * 200 - 100)) else None
        val hi = if (rnd.nextBoolean()) Some(toBits(rnd.nextDouble() * 200 - 100)) else None
        val loInc = rnd.nextBoolean(); val hiInc = rnd.nextBoolean()
        val bm = sec.matchBitmap(lo, loInc, hi, hiInc)
        (0 until n).foreach { d =>
          if (matches(d, lo, loInc, hi, hiInc))
            assert(bm.contains(d), s"doc $d dropped for [$lo,$hi] $loInc/$hiInc")
        }
      }
    }
    // long domain
    (0 until 6).foreach { _ =>
      val n = 1 + rnd.nextInt(2000)
      val vals = Array.fill(n)(rnd.nextLong(201) - 100)
      def cmpL(a: Long, b: Long) = java.lang.Long.compare(a, b)
      check(Left(vals), (d, lo, li, hi, hiI) => {
        val v = vals(d)
        lo.forall(l => { val c = cmpL(v, l); c > 0 || (c == 0 && li) }) &&
          hi.forall(h => { val c = cmpL(v, h); c < 0 || (c == 0 && hiI) })
      }, d => d.toLong)
    }
    // double domain with NaN and ±0.0 injections (Spark: NaN high, -0.0 = 0.0)
    (0 until 6).foreach { _ =>
      val n = 1 + rnd.nextInt(2000)
      val vals = Array.fill(n) {
        rnd.nextInt(10) match {
          case 0 => Double.NaN
          case 1 => -0.0
          case 2 => 0.0
          case _ => rnd.nextDouble() * 200 - 100
        }
      }
      def cmpD(a: Double, b: Double) = java.lang.Double.compare(
        if (a == 0d) 0d else a, if (b == 0d) 0d else b)
      check(Right(vals), (d, lo, li, hi, hiI) => {
        val v = vals(d)
        def fromBits(b: Long) = java.lang.Double.longBitsToDouble(b)
        lo.forall(l => { val c = cmpD(v, fromBits(l)); c > 0 || (c == 0 && li) }) &&
          hi.forall(h => { val c = cmpD(v, fromBits(h)); c < 0 || (c == 0 && hiI) })
      }, d => RangeSection.doubleBits(d))
    }
  }

  test("text: candidates cover every containing doc (property)") {
    val rnd = new scala.util.Random(33)
    val alphabet = Vector("alpha", "beta", "gamma", "delta", "ep", "x9", "zz")
    (0 until 15).foreach { round =>
      val n = 1 + rnd.nextInt(800)
      val docs = Array.fill(n)(
        Seq.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size)))
          .mkString(" "))
      val sec = TextIndexSection.deserialize(TextIndexSection.build(docs.iterator))
      val probes = Seq("alpha", "lph", "a", "9", "zz", "q", "ta", "elt")
      probes.foreach { p =>
        sec.matchBitmap(p).foreach { bm =>
          docs.zipWithIndex.foreach { case (text, d) =>
            if (text.contains(p))
              assert(bm.contains(d),
                s"round $round: doc $d ('$text') dropped for probe '$p'")
          }
        }
      }
    }
  }
}
