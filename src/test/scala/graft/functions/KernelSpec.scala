package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level properties for the custom expression implementations —
  * plain JVM, no SparkSession (the expression wiring is covered by the
  * query suite and the SQL-registration test). */
class KernelSpec extends AnyFunSuite {

  private def sarr(ss: Seq[String]) =
    new GenericArrayData(ss.map(UTF8String.fromString).toArray[Any])
  private def darr(ds: Seq[Double]) = new GenericArrayData(ds.toArray[Any])
  private def strings(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  test("shingles kernel == naive sliding-distinct (fuzz)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val toks = Seq.fill(rnd.nextInt(12))(s"w${rnd.nextInt(5)}")
      for (n <- 1 to 4) {
        val naive = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq.distinct
        assert(strings(HashImpls.shingles(sarr(toks), n)) == naive,
          s"toks=$toks n=$n")
      }
    }
  }

  test("charEntropyMilli kernel: known values, fuzz vs naive, astral chars") {
    def e(s: String) = HashImpls.charEntropyMilli(UTF8String.fromString(s))
    assert(e("") == 0L)
    assert(e("aaaa") == 0L) // single symbol: exactly 0 nats
    assert(e("ab") == 693L) // ln 2 = 0.6931...
    assert(e("abcd") == 1386L) // ln 4
    // naive recomputation in the same ascending-code-point order
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 300) {
      val s = Seq.fill(rnd.nextInt(40) + 1)(('a' + rnd.nextInt(6)).toChar).mkString
      val counts = s.groupBy(identity).toSeq.sortBy(_._1).map(_._2.length.toDouble)
      val n = s.length.toDouble
      val nats = math.log(n) - counts.foldLeft(0.0)((a, k) => a + k * math.log(k)) / n
      assert(e(s) == math.floor(nats * 1000.0 + 0.5).toLong, s"s=$s")
    }
    // astral-plane code points count as ONE symbol, not two UTF-16 units
    assert(e("😀😀") == 0L) // two identical emoji
    assert(e("😀a") == 693L) // emoji + 'a' = two symbols
  }

  test("zInterleave kernel == per-bit naive, masks to 31 bits, never negative") {
    def naive(a: Long, b: Long): Long = {
      var r = 0L
      for (i <- 0 until 31) {
        r |= ((a >> i) & 1L) << (2 * i)
        r |= ((b >> i) & 1L) << (2 * i + 1)
      }
      r
    }
    assert(HashImpls.zInterleave(3L, 1L) == 7L) // a→bits 0,2; b→bit 1
    assert(HashImpls.zInterleave(0L, 0L) == 0L)
    val rnd = new scala.util.Random(47)
    for (_ <- 1 to 1000) {
      val a = rnd.nextLong(); val b = rnd.nextLong()
      val z = HashImpls.zInterleave(a, b)
      assert(z == naive(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL), s"a=$a b=$b")
      assert(z >= 0L, s"sign bit set for a=$a b=$b")
    }
  }

  test("wordpiece kernel: greedy longest-prefix with char fallback (exact + fuzz)") {
    val vocab = Array("the", "th", "he", "ing", "a", "te")
    val m = new WordpieceMatcher(vocab)
    def seg(ws: String*) = strings(m.segment(sarr(ws)))
    // "theater": the | a | te | r(fallback)  — longest wins at each step
    assert(seg("theater") == Seq("the", "a", "te", "r"))
    // "thing": th | ing (not the+...: "thi" isn't a piece, "th" beats "t")
    assert(seg("thing") == Seq("th", "ing"))
    assert(seg() == Seq())
    assert(seg("xyz") == Seq("x", "y", "z")) // pure fallback
    // astral fallback consumes the full surrogate pair as one piece
    assert(seg("a😀a") == Seq("a", "😀", "a"))
    // stats == segment-derived counts, fuzzed vs a naive reference walk
    val rnd = new scala.util.Random(53)
    def naive(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val hit = (math.min(3, w.length - i) to 1 by -1)
          .find(l => vocab.contains(w.substring(i, i + l)))
        val step = hit.getOrElse(Character.charCount(w.codePointAt(i)))
        out += w.substring(i, i + step)
        i += step
      }
      out.toSeq
    }
    for (_ <- 1 to 300) {
      val w = Seq.fill(rnd.nextInt(12))("theaingxz".charAt(rnd.nextInt(9))).mkString
      assert(seg(w) == naive(w), s"w=$w")
      val st = m.stats(sarr(Seq(w)))
      val pieces = naive(w)
      val fallback = pieces.count(p => !vocab.contains(p))
      assert(st.getLong(0) == pieces.size - fallback && st.getLong(1) == fallback, s"w=$w")
    }
  }

  test("cosineSim kernel == sequential fold (fuzz)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val d = rnd.nextInt(48) + 1
      val a = Seq.fill(d)(rnd.nextGaussian())
      val b = Seq.fill(d)(rnd.nextGaussian())
      val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x))
      assert(HashImpls.cosineSim(darr(a), darr(b)) == dot / (na * nb))
    }
  }

  test("jaccardMilli kernel == array_intersect formula (fuzz)") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 300) {
      val a = Seq.fill(rnd.nextInt(30) + 1)(s"s${rnd.nextInt(40)}").distinct
      val b = Seq.fill(rnd.nextInt(30) + 1)(s"s${rnd.nextInt(40)}").distinct
      val inter = a.toSet.intersect(b.toSet).size
      val expect = math.floor(inter * 1000.0 / (a.size + b.size - inter) + 0.5).toLong
      assert(HashImpls.jaccardMilli(sarr(a), sarr(b)) == expect, s"a=$a b=$b")
    }
  }

  test("minhash signature is set-semantic: order- and duplicate-invariant") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 100) {
      val base = Seq.fill(rnd.nextInt(20) + 1)(s"s${rnd.nextInt(50)}")
      val shuffled = rnd.shuffle(base ++ base.take(3))
      val s1 = HashImpls.minHash(sarr(base), 64, 1L)
      val s2 = HashImpls.minHash(sarr(shuffled), 64, 1L)
      assert((0 until 64).forall(i => s1.getLong(i) == s2.getLong(i)))
    }
  }

  test("stopword matcher == padded-LIKE formula (fuzz incl. unicode/whitespace)") {
    val groups = Text.StopwordSets
    val m = new StopwordMatcher(groups.map(_._1).toArray, groups.map(_._2.toArray).toArray)
    def refHits(text: String, words: Seq[String]): Long = {
      val padded = " " + text.toLowerCase + " "
      words.count(w => padded.contains(s" $w ")).toLong
    }
    def refLang(text: String): String = {
      val scored = groups.map { case (l, ws) => (l, refHits(text, ws)) }
      val best = scored.maxBy(_._2) // maxBy keeps the earliest on ties
      if (best._2 == 0) "unknown" else best._1
    }
    val vocab = groups.flatMap(_._2) ++ Seq("THE", "Über", "the\tand", "le ", "", "x",
      "de", "naïve", "das;", "y")
    val seps = Seq(" ", "  ", "\t", "\n", "  ")
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 500) {
      val text = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
      val got = m.scores(UTF8String.fromString(text))
      groups.zipWithIndex.foreach { case ((_, ws), g) =>
        assert(got(g) == refHits(text, ws), s"text=<$text> group=$g")
      }
      assert(m.label(UTF8String.fromString(text)).toString == refLang(text),
        s"text=<$text>")
    }
  }

  test("lineStats kernel == naive groupBy reference (fuzz)") {
    val rnd = new scala.util.Random(23)
    val pieces = Seq("alpha", "beta γδ", "", "alpha", "x y z", "  ", "über wien")
    for (_ <- 1 to 300) {
      val text = Seq.fill(rnd.nextInt(10))(pieces(rnd.nextInt(pieces.size)))
        .mkString("\n")
      val lines = text.split("\n", -1).filter(_.nonEmpty)
      val byLine = lines.groupBy(identity)
      val expect = Seq(
        lines.length.toLong,
        byLine.size.toLong,
        lines.map(l => l.codePointCount(0, l.length).toLong).sum,
        byLine.values.map(g => (g.length - 1).toLong * g.head.codePointCount(0, g.head.length)).sum)
      val got = HashImpls.lineStats(UTF8String.fromString(text))
      assert((0 until 4).map(got.getLong) == expect, s"text=<$text>")
    }
  }

  test("topBigramCover kernel == naive sliding-pair reference (fuzz)") {
    val rnd = new scala.util.Random(29)
    val vocab = Seq("a", "bb", "ccc", "dédé", "e")
    for (_ <- 1 to 300) {
      val toks = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val pairs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val expect =
        if (pairs.isEmpty) 0L
        else pairs.groupBy(identity).map { case (bg, g) =>
          g.size.toLong * bg.codePointCount(0, bg.length)
        }.max
      assert(HashImpls.topBigramCover(sarr(toks)) == expect, s"toks=$toks")
    }
  }

  test("stopword expressions reject bad inventories at plan-build time") {
    import org.apache.spark.sql.functions.col
    // invalid groups must fail HERE, on the driver, while the Column is
    // being constructed — not later inside a task when the transient-lazy
    // matcher first initializes
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.exprs.stopword_scores(col("text"), Seq(Seq("of the")))
    }
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.exprs.lang_id(col("text"), Seq("en" -> Seq("")))
    }
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.exprs.stopword_scores(col("text"),
        Seq((1 to 65).map(i => s"w$i")))
    }
  }

  test("srp signature: scale-invariant, negation flips every bit") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 100) {
      val v = Seq.fill(32)(rnd.nextGaussian())
      val sig = HashImpls.srpSignature(darr(v), 64, 0)
      assert(HashImpls.srpSignature(darr(v.map(_ * 7.5)), 64, 0) == sig)
      assert(HashImpls.srpSignature(darr(v.map(-_)), 64, 0) == ~sig)
      // disjoint plane families: different offsets give independent words
      assert(HashImpls.srpSignature(darr(v), 64, 64) != sig)
    }
  }
}
