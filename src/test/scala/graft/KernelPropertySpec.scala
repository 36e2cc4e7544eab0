package graft

import graft.functions.RollingHashMinima
import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Seeded randomized properties of the hashing kernels — the invariants
  * that make the dedup family CORRECT, checked over many random inputs
  * rather than a handful of fixtures.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  private def randomWords(n: Int): Seq[String] =
    Seq.fill(n)(("a" + rnd.alphanumeric.filter(_.isLetter).take(4).mkString).toLowerCase)

  private def fingerprints(s: String, k: Int, w: Int): Set[Long] = {
    val arr = RollingHashMinima.winnow(UTF8String.fromString(s), k, w)
    (0 until arr.numElements()).map(arr.getLong).toSet
  }

  test("winnowing guarantee: any shared substring of length >= k+w-1 " +
    "forces a shared fingerprint (100 random doc pairs)") {
    val k = 8; val w = 16
    (1 to 100).foreach { _ =>
      val shared = randomWords(6 + rnd.nextInt(5)).mkString(" ") // >= 23 chars
      assert(shared.length >= k + w - 1)
      val a = randomWords(10).mkString(" ") + " " + shared + " " +
        randomWords(10).mkString(" ")
      val b = randomWords(8).mkString(" ") + " " + shared + " " +
        randomWords(12).mkString(" ")
      val common = fingerprints(a, k, w) intersect fingerprints(b, k, w)
      assert(common.nonEmpty, s"no shared fingerprint for shared='$shared'")
    }
  }

  test("CDC chunking: chunks reassemble to the document, every " +
    "non-final chunk ends at a '0'-md5 word, and a word run shared by " +
    "two documents with DIFFERENT prefixes yields shared chunks " +
    "(alignment survives the shift — the property fixed windows lack)") {
    import graft.operators.TextAnalysis
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (1 to 25).foreach { _ =>
      // long shared run → contains interior cut words with high prob
      val shared = randomWords(120).mkString(" ")
      val a = randomWords(3 + rnd.nextInt(8)).mkString(" ") + " " + shared
      val b = randomWords(3 + rnd.nextInt(8)).mkString(" ") + " " + shared
      val rows = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
        .select($"doc_id",
          TextAnalysis.cdcChunks($"text").as("chunks"))
        .as[(Long, Seq[String])].collect().toMap
      // lossless: chunks rejoin to the original text
      assert(rows(1L).mkString(" ") == a)
      assert(rows(2L).mkString(" ") == b)
      // boundary contract: every non-final chunk's last word cuts
      for (cs <- rows.values; c <- cs.dropRight(1))
        assert(md5hex(c.split(" ").last).startsWith("0"), c)
      // cross-doc alignment: some interior chunk of the shared run is
      // common to both docs whenever the run has >= 2 interior cuts
      val interiorCuts =
        shared.split(" ").count(w => md5hex(w).startsWith("0"))
      if (interiorCuts >= 2)
        assert((rows(1L).toSet intersect rows(2L).toSet).nonEmpty,
          s"no shared chunk despite $interiorCuts cuts in the shared run")
    }
  }

  test("winnowing density: fingerprint count stays near the 2/(w+1) " +
    "theoretical density, never above gram count") {
    val k = 8; val w = 16
    val doc = randomWords(300).mkString(" ")
    val nGrams = doc.length - k + 1
    val f = fingerprints(doc, k, w).size
    assert(f <= nGrams)
    // expected ~2n/(w+1) ≈ 0.118n; allow a generous factor
    assert(f > nGrams / 30 && f < nGrams / 3, s"density off: $f of $nGrams")
  }

  test("shingles3 equals the naive sliding-window reference on random " +
    "docs of every short length (0..40 words)") {
    val docs = (0 to 40).map(n => (n.toLong, randomWords(n).mkString(" ")))
    val got = docs.toDF("doc_id", "text")
      .select($"doc_id", Dedup.shingles3($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    docs.foreach { case (id, text) =>
      val words = text.split(" ").toSeq
      val expected =
        if (words.length < 3) Set.empty[String]
        else words.sliding(3).map(_.mkString(" ")).toSet
      assert(got(id) == expected, s"doc $id (${words.length} words)")
    }
  }

  test("prefix-join losslessness property: on random overlapping corpora " +
    "the pruned join equals brute-force all-pairs shingle Jaccard " +
    "(10 rounds, boundary-heavy mixes)") {
    (1 to 10).foreach { round =>
      // a shared word pool breeds genuine near-dup structure: docs draw
      // from a small pool, and 4 docs are (possibly jittered) copies of
      // earlier ones — exact dups, one-word edits, and sub-threshold
      // lookalikes all occur across rounds
      val pool = randomWords(12)
      val base10 = (0 until 10).map(_ =>
        Seq.fill(5 + rnd.nextInt(8))(pool(rnd.nextInt(pool.size)))
          .mkString(" "))
      val copies = (0 until 4).map { j =>
        val b = base10(j).split(" ").toSeq
        (if (rnd.nextBoolean())
          b.updated(rnd.nextInt(b.size), "z" + round + j)
        else b).mkString(" ")
      }
      val docs = base10 ++ copies
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.prefixJoinPairs(df).collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          math.round(r.getDouble(2) * 1e4))).toMap
      def sh3(t: String) = t.split(" ", -1).sliding(3)
        .filter(_.length == 3).map(_.mkString(" ")).toSet
      val sets = docs.zipWithIndex.map { case (t, i) => i.toLong -> sh3(t) }
        .filter(_._2.nonEmpty)
      val brute = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        i = (sa intersect sb).size
        u = sa.size + sb.size - i
        if 5L * i >= 4L * u
      } yield ((ia, ib),
        math.round(math.round(i.toDouble / u * 1e4).toDouble))).toMap
      assert(got.keySet == brute.keySet, s"round $round pair sets differ")
      brute.foreach { case (k, j) =>
        assert(got(k) == j, s"round $round pair $k jaccard differs")
      }
    }
  }

  test("tokenHash bit balance: each of the 64 bits is ~uniform over " +
    "random tokens (SimHash needs unbiased votes)") {
    val n = 2000
    val counts = new Array[Int](64)
    (1 to n).foreach { _ =>
      val h = graft.functions.SimHashAgg.tokenHash(randomWords(3).mkString(" "))
      (0 until 64).foreach(i => if (((h >>> i) & 1L) == 1L) counts(i) += 1)
    }
    counts.zipWithIndex.foreach { case (c, i) =>
      assert(math.abs(c - n / 2) < n / 10, s"bit $i biased: $c of $n")
    }
  }

  test("DotProduct matches a sequential double reference on random float " +
    "vectors, and its sign is the SRP band bit (ADVICE r2 regression)") {
    import graft.functions.VectorFunctions.dot_product
    val vecs = (1 to 100).map { i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 2f))
    }
    val planes = Array.fill(16)(if (rnd.nextBoolean()) 1.0 else -1.0)
    val got = vecs.toDF("id", "v")
      .select($"id", dot_product($"v", typedLit(planes.toSeq)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, v) =>
      // the oracle's arithmetic: widen each float to double, sequential sum
      var expected = 0.0
      v.indices.foreach(i => expected += v(i).toDouble * planes(i))
      assert(got(id) == expected, s"vec $id: ${got(id)} != $expected")
    }
    // all-zero embedding: dot is exactly 0.0 — a well-defined sign bit
    // (>= 0 true) on both engines, where the old cosine formulation gave
    // NaN whose comparison semantics differ across engines
    val z = Seq((1L, Array.fill(16)(0.0f))).toDF("id", "v")
      .select(
        dot_product($"v", typedLit(planes.toSeq)).as("dot"),
        graft.operators.Similarity.cosine($"v", typedLit(planes.toSeq)).as("cos"))
      .collect().head
    assert(z.getDouble(0) == 0.0 && z.getDouble(1).isNaN)
  }

  test("rangedPrefixSum == the flat window on random skewed frames " +
    "(hot group, duplicate order keys, misaligned partition counts)") {
    (1 to 5).foreach { round =>
      val n = 200 + rnd.nextInt(300)
      // one hot group (~60% of rows) + a long tail; order key drawn from
      // a SMALL domain so duplicate (group, ord) prefixes are common and
      // the doc_id-style unique tiebreak column is what totalizes
      val rows = (0 until n).map { i =>
        val g = if (rnd.nextInt(10) < 6) "hot" else s"g${rnd.nextInt(7)}"
        (i.toLong, g, rnd.nextInt(9).toLong, 1L + rnd.nextInt(50))
      }
      val df = rows.toDF("id", "grp", "ord", "v")
      val got = operators.Curation.rangedPrefixSum(
          df, Seq("grp"), Seq("ord", "id"), "v", "prior",
          numPartitions = 1 + rnd.nextInt(11))
        .select($"id", $"prior").as[(Long, Long)].collect().toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"grp").orderBy($"ord", $"id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val flat = df.withColumn("prior", coalesce(sum($"v").over(w), lit(0L)))
        .select($"id", $"prior").as[(Long, Long)].collect().toMap
      assert(got == flat, s"round $round n=$n")
    }
  }

  test("rangedPrefixSum skew probe: 90% of rows on ONE (group, order) " +
    "key still yield balanced slices — the unique tiebreak column is " +
    "part of the range key, so no slice exceeds ~2x the mean") {
    val n = 2000
    val slices = 8
    // pathological frame: 90% of rows share a single (grp, ord) prefix —
    // a flat hot-key window would serialize them onto one task; the
    // kernel's range key ends in the unique id, which is what spreads
    // the hot cell across slices
    val rows = (0 until n).map { i =>
      if (i % 10 != 0) (i.toLong, "hot", 0L, 1L)
      else (i.toLong, s"g${i % 5}", (i % 9).toLong, 1L)
    }
    val df = rows.toDF("id", "grp", "ord", "v")
    // the kernel's exact slice decomposition (rangeCols = group ++ order,
    // with id as the final tiebreak — mirrors rangedPrefixSum's
    // repartitionByRange call)
    val counts = df.repartitionByRange(slices, $"grp", $"ord", $"id")
      .groupBy(spark_partition_id().as("pid"))
      .count().select($"count").as[Long].collect()
    val mean = n.toDouble / slices
    assert(counts.length == slices, s"expected $slices non-empty slices")
    assert(counts.max <= 2 * mean,
      s"slice sizes ${counts.toSeq} vs mean $mean — quantile " +
        "decomposition must spread the hot key")
    // and the kernel stays exact on the pathological frame
    val got = operators.Curation.rangedPrefixSum(
        df, Seq("grp"), Seq("ord", "id"), "v", "prior",
        numPartitions = slices)
      .select($"id", $"prior").as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"ord", $"id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val flat = df.withColumn("prior", coalesce(sum($"v").over(w), lit(0L)))
      .select($"id", $"prior").as[(Long, Long)].collect().toMap
    assert(got == flat)
  }

  test("byteHash matches a BigInt reference fold") {
    (1 to 50).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      val expected = bytes.foldLeft(BigInt(0)) { (h, b) =>
        (h * 31 + (b & 0xff)) % BigInt(1000000007)
      }.toLong
      assert(graft.media.Media.byteHash(bytes) == expected)
    }
  }

  test("FLAC roundtrip property: random PCM survives encode->decode " +
    "bit-exactly across bit depths, channel layouts, block sizes, " +
    "subframe modes, escapes and wasted bits — including degenerate " +
    "lengths and full-scale extremes") {
    import graft.media.FlacMediaKernel.{FlacEncOpts, decodePcm, encodeFlac}
    def pcm(n: Int, bits: Int): Array[Int] = {
      val lim = 1 << (bits - 1)
      Array.fill(n)(rnd.nextInt(2 * lim) - lim)
    }
    def check(chs: Array[Array[Int]], bits: Int,
        opts: FlacEncOpts, label: String): Unit = {
      val dec = decodePcm(encodeFlac(chs, 8000, bits, opts))
      assert(dec.isDefined, s"$label: decode refused")
      val (info, out) = dec.get
      assert(info.channels == chs.length && info.bitsPerSample == bits,
        label)
      val n = chs(0).length
      chs.indices.foreach { c =>
        val got = Array.tabulate(n)(i => out(i * chs.length + c))
        assert(got.toSeq == chs(c).toSeq, s"$label: channel $c differs")
      }
    }
    // parameter sweep: every mode × stereo × escape × block size
    for {
      bits <- Seq(8, 16)
      bs <- Seq(2, 3, 17, 256)
      mode <- Seq("auto", "verbatim", "lpc")
      esc <- Seq(false, true)
    } {
      val n = bs + rnd.nextInt(2 * bs + 1) // 1-3 frames, ragged tail
      check(Array(pcm(n, bits)), bits,
        FlacEncOpts(blockSize = bs, mode = mode, forceEscape = esc),
        s"mono bits=$bits bs=$bs mode=$mode esc=$esc n=$n")
    }
    for (st <- Seq("indep", "ls", "rs", "ms"); esc <- Seq(false, true)) {
      val n = 40 + rnd.nextInt(60)
      check(Array(pcm(n, 16), pcm(n, 16)), 16,
        FlacEncOpts(blockSize = 32, stereo = st, forceEscape = esc),
        s"stereo $st esc=$esc n=$n")
    }
    // degenerate lengths and full-scale extremes
    check(Array(Array(-128)), 8, FlacEncOpts(blockSize = 2), "n=1")
    check(Array(Array.fill(26)(0)), 8, FlacEncOpts(), "silence")
    check(Array(Array.tabulate(52)(i =>
      if (i % 2 == 0) -32768 else 32767)), 16, FlacEncOpts(),
      "16-bit full-scale alternation")
    check(Array(Array.fill(26)(127), Array.fill(26)(-128)), 8,
      FlacEncOpts(stereo = "ms"), "8-bit extremes mid/side")
    // wasted bits at both depths
    check(Array(pcm(60, 16).map(_ & ~7)), 16,
      FlacEncOpts(wasted = 3), "wasted=3 16-bit")
    check(Array(pcm(60, 8).map(_ & ~1)), 8,
      FlacEncOpts(wasted = 1, mode = "verbatim"), "wasted=1 verbatim")
  }
}
