package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Features

/** Property-style invariants (SURVEY.md §5.2.2) over the scalar operators:
  * ScalaCheck generators sampled deterministically (no scalatest-plus
  * bridge in the offline dependency set) and evaluated through Spark. */
class PropertySpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(42L))(_.next).take(n)
      .map(s => gen.pureApply(params, s)).toSeq
  }

  private val bounds = Seq(0.0, 10.0, 20.0, 30.0, 40.0, 50.0)
  private val labels = Seq("a", "b", "c", "d", "e")

  test("F2 bucket totality: every generated double maps to the right label or nan") {
    val xs = samples(Gen.chooseNum(-100.0, 150.0), 300) ++ bounds ++ Seq(50.000001)
    val out = xs.toDF("v")
      .select(col("v"), Features.rightClosedBucket(col("v"), bounds, labels).as("b"))
      .collect().map(r => (r.getDouble(0), r.getString(1)))
    out.foreach { case (x, b) =>
      if (x > 0 && x <= 50) {
        val idx = bounds.indexWhere(x <= _) - 1
        assert(b == labels(idx), s"x=$x")
      } else assert(b == "nan", s"x=$x")
    }
  }

  test("pround: idempotent with bounded error across magnitudes and digits") {
    val cases = for {
      x <- samples(Gen.chooseNum(-1e6, 1e6), 100)
      d <- Seq(0, 2, 4, 6)
    } yield (x, d)
    cases.groupBy(_._2).foreach { case (d, xs) =>
      val df = xs.map(_._1).toDF("v")
      val once = df.select(Features.pround(col("v"), d).as("r"), col("v")).collect()
      once.foreach { r =>
        val rounded = r.getDouble(0); val x = r.getDouble(1)
        assert(math.abs(rounded - x) <= math.pow(10.0, -d) * 0.500001 + math.ulp(x) * 4,
          s"x=$x d=$d rounded=$rounded")
      }
      val twice = once.map(_.getDouble(0)).toSeq.toDF("v")
        .select(Features.pround(col("v"), d).as("r")).collect().map(_.getDouble(0))
      assert(twice.sameElements(once.map(_.getDouble(0))), s"not idempotent at d=$d")
    }
  }

  test("qlong/finiteOrNull: finite values quantize by the literal formula, non-finite vanish") {
    val xs = samples(Gen.chooseNum(-1e7, 1e7), 200) ++
      Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, -0.0)
    val out = xs.toDF("v")
      .select(col("v"), Features.qlong(col("v"), 100.0).as("q"),
        Features.finiteOrNull(col("v")).as("f"))
      .collect()
    out.foreach { r =>
      val x = r.getDouble(0)
      if (java.lang.Double.isFinite(x)) {
        assert(!r.isNullAt(1) && r.getLong(1) == math.floor(x * 100.0 + 0.5).toLong, s"x=$x")
        assert(!r.isNullAt(2) && r.getDouble(2) == x)
      } else {
        assert(r.isNullAt(1) && r.isNullAt(2), s"x=$x must vanish")
      }
    }
  }

  test("exactPercentile over poisoned data equals the in-plan percentile over its finite subset") {
    val finite = samples(Gen.chooseNum(-1e4, 1e4), 150)
    val poisoned = (finite ++ Seq(Double.NaN, Double.NaN, Double.PositiveInfinity))
      .map(Option(_)) ++ Seq(None, None)
    val df = poisoned.toDF("v")
    Seq(0.25, 0.5, 0.75, 0.9).foreach { q =>
      val exact = graft.operators.Metrics.exactPercentile(df, "v", q)
      val oracle = finite.toDF("v")
        .agg(expr(s"percentile(v, $q)")).collect()(0).getDouble(0)
      assert(exact == oracle, s"q=$q: $exact vs $oracle")
    }
  }

  test("exactPercentiles multi-q equals pointwise single-q on random multisets") {
    // small n on purpose: adjacent quantiles then SHARE straddling order
    // statistics (floor/ceil ranks collide across q's), exercising the
    // shared-layout rank dedup that the multi-q form adds over single-q
    val ns = samples(Gen.chooseNum(1, 25), 10)
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    ns.zipWithIndex.foreach { case (n, i) =>
      val xs = samples(Gen.chooseNum(-4, 4), n).map(_.toDouble)
      val df = xs.map(Tuple1(_)).toDF("v")
      Seq(1, 5).foreach { p =>
        val multi = graft.operators.Metrics.exactPercentiles(df, "v", qs, p).get
        qs.foreach { q =>
          val single = graft.operators.Metrics.exactPercentile(df, "v", q, p)
          assert(multi(q) == single, s"case $i n=$n partitions=$p q=$q xs=$xs")
        }
      }
    }
  }

  test("stratified split/folds hold their contract on random geometries") {
    // random stratum counts and sizes (including 1-row strata), random
    // test fractions, k possibly larger than a stratum: per-stratum test
    // count is EXACTLY ceil(n·frac), the split partitions the input, and
    // fold sizes within each stratum differ by ≤ 1
    val geoms = samples(for {
      nStrata <- Gen.chooseNum(1, 4)
      sizes <- Gen.sequence[Seq[Int], Int](Seq.fill(nStrata)(Gen.chooseNum(1, 40)))
      frac <- Gen.oneOf(0.01, 0.2, 0.5, 0.99)
      k <- Gen.chooseNum(2, 6)
    } yield (sizes, frac, k), 8)
    geoms.zipWithIndex.foreach { case ((sizes, frac, k), case_i) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, l) =>
        (0 until n).map(i => (l.toLong * 1000 + i, l))
      }
      val df = rows.toDF("id", "label")
      val (train, test) = graft.ml.Split.stratified(df, "label", frac, 7L + case_i)
      val testBy = test.groupBy("label").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      sizes.zipWithIndex.foreach { case (n, l) =>
        assert(testBy.getOrElse(l, 0L) == math.ceil(n * frac).toLong,
          s"case $case_i stratum $l n=$n frac=$frac")
      }
      val trainIds = train.select("id").collect().map(_.getLong(0)).toSet
      val testIds = test.select("id").collect().map(_.getLong(0)).toSet
      assert(trainIds.intersect(testIds).isEmpty, s"case $case_i overlap")
      assert(trainIds.size + testIds.size == rows.size, s"case $case_i cover")
      val folds = graft.ml.Split.foldAssign(df, "label", k, 7L + case_i)
      folds.groupBy("label", "fold").count().collect()
        .groupBy(_.getInt(0)).foreach { case (l, fr) =>
          val bySize = fr.map(_.getLong(2))
          // every stratum's fold sizes differ by ≤ 1 (absent folds = 0)
          val all = bySize ++ Seq.fill(k - bySize.length)(0L)
          assert(all.max - all.min <= 1,
            s"case $case_i stratum $l folds ${all.toSeq}")
        }
    }
  }

  test("sigmoid: bounded (0,1) and antisymmetric about 0.5") {
    // |x| ≤ 30: beyond ~36, 1/(1+exp(-x)) saturates to exactly 1.0 in
    // binary64 — the open-interval invariant only holds pre-saturation
    val xs = samples(Gen.chooseNum(-30.0, 30.0), 200)
    val rows = xs.toDF("v")
      .select(Features.sigmoid(col("v")).as("s"), Features.sigmoid(-col("v")).as("sneg"))
      .collect()
    rows.foreach { r =>
      val s = r.getDouble(0); val sn = r.getDouble(1)
      assert(s > 0.0 && s < 1.0)
      assert(math.abs(s + sn - 1.0) < 1e-12)
    }
  }

  test("exactMedian: equals the sorted-middle reference on random multisets") {
    val sizeGen = Gen.chooseNum(1, 40)
    val ns = samples(sizeGen, 12)
    ns.zipWithIndex.foreach { case (n, i) =>
      // duplicates on purpose: values drawn from a small integer range
      val xs = samples(Gen.chooseNum(-5, 5), n).map(_.toDouble)
      val sorted = xs.sorted
      val expected = 0.5 * sorted((n - 1) / 2) + 0.5 * sorted(n / 2)
      val df = xs.map(Tuple1(_)).toDF("v")
      Seq(1, 5).foreach { p =>
        val got = graft.operators.Metrics.exactMedian(df, "v", p)
        assert(got == expected, s"case $i n=$n partitions=$p xs=$xs")
      }
    }
  }

  test("packChunks: equals the driver-side next-fit reference on random chunk multisets") {
    val budget = 20; val docsPerGroup = 5; val stride = 1000000L
    (0 until 6).foreach { trial =>
      val nDocs = samples(Gen.chooseNum(1, 12), 6)(trial)
      val chunks: Seq[(Long, Long, Long)] = (0 until nDocs).flatMap { d =>
        val nc = samples(Gen.chooseNum(1, 4), nDocs * 6 + 1)(d)
        (0 until nc).map { c =>
          val n = samples(Gen.chooseNum(1, budget), 200)(trial * 31 + d * 7 + c)
          (d.toLong, c.toLong, n.toLong)
        }
      }
      // reference next-fit, sequential per group in (doc, chunk) order
      val expected = chunks.groupBy(_._1 / docsPerGroup).toSeq.flatMap { case (g, cs) =>
        var seq = -1L; var fill = budget.toLong
        cs.sortBy(t => (t._1, t._2)).map { case (d, c, n) =>
          if (fill + n > budget) { seq += 1; fill = n } else fill += n
          (g * stride + seq, s"$d:$c", n)
        }
      }
      val expBySeq = expected.groupBy(_._1).map { case (sid, rs) =>
        sid -> (rs.size.toLong, rs.map(_._2).mkString(","), rs.map(_._3).sum)
      }
      val got = graft.operators.TextOps
        .packChunks(chunks.toDF("doc_id", "chunk_id", "n_chunk_tokens"),
          budget, docsPerGroup)
        .collect().map(r => r.getAs[Long]("seq_id") ->
          (r.getAs[Long]("n_chunks"), r.getAs[String]("chunk_ids"),
            r.getAs[Long]("total_tokens"))).toMap
      assert(got == expBySeq, s"trial=$trial chunks=$chunks")
    }
  }

  test("chunkDocs: full token coverage and correct window count for random geometries") {
    val geoms = for {
      chunk <- Seq(3, 7, 50)
      stride <- Seq(1, 3, 40) if stride <= chunk // stride > chunk raises (gap guard)
      nTok <- Seq(1, 2, 5, 49, 50, 51, 95)
    } yield (chunk, stride, nTok)
    intercept[IllegalArgumentException] {
      graft.operators.TextOps.chunkDocs(Seq((1L, "a b")).toDF("doc_id", "text"), 3, 40)
    }
    geoms.foreach { case (chunk, stride, n) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val rows = graft.operators.TextOps.chunkDocs(df, chunk, stride).collect()
      // 1 + ceil((n - chunk)/stride) windows: chunking stops at the first
      // window reaching the end — the old floor((n-1)/stride)+1 count
      // emitted trailing windows fully subsumed by their predecessor
      // (zero new tokens, duplicated training data)
      val expectedChunks =
        1 + math.max(0, math.ceil((n - chunk).toDouble / stride).toInt)
      assert(rows.length == expectedChunks, s"c=$chunk s=$stride n=$n")
      // no window is a pure suffix of its predecessor: a window past the
      // first exists only if the previous window did NOT reach the end
      // (i.e. it contributes at least one new token)
      rows.foreach { r =>
        if (r.getLong(1) > 0)
          assert(n > (r.getLong(1) - 1) * stride + chunk,
            s"subsumed window: c=$chunk s=$stride n=$n id=${r.getLong(1)}")
      }
      // every token index is inside at least one window
      val covered = rows.flatMap { r =>
        val start = r.getLong(1) * stride
        start until math.min(start + chunk, n)
      }.toSet
      assert(covered == (0 until n).toSet, s"c=$chunk s=$stride n=$n")
      // window lengths: full until the tail
      rows.sortBy(_.getLong(1)).foreach { r =>
        val start = r.getLong(1) * stride
        assert(r.getAs[Long]("n_chunk_tokens") == math.min(chunk, n - start))
      }
    }
  }

  test("languageId equals the driver-side argmax reference on random marker mixtures") {
    import graft.operators.TextOps
    val vocab = TextOps.langMarkers.values.flatten.toSeq.distinct ++
      Seq("xylo", "quartz", "nebula") // words in no lexicon
    val docGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    val docs = samples(docGen, 200).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" "), "en", "s", 1L) }
    val out = TextOps.languageId(
        docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text, _, _, _) =>
      val toks = text.split(" ", -1)
      val scores = TextOps.langMarkers.toSeq.sortBy(_._1).map { case (l, ws) =>
        l -> toks.count(ws.contains)
      }
      val max = scores.map(_._2).max
      val expected = if (max == 0) "und" else scores.find(_._2 == max).get._1
      assert(out(id) == expected, s"doc $id '$text': ${out(id)} vs $expected")
    }
  }

  test("funnel counts are non-increasing across steps on real data") {
    val f = graft.operators.EventOps.funnelSteps(
      Tables.eventsTs(spark, SparkFixture.sfDir), Seq("signup", "click", "purchase"))
      .collect().map(_.getAs[Long]("n_users")).toSeq
    assert(f.length == 3)
    assert(f.zip(f.tail).forall { case (a, b) => a >= b }, f)
  }

  test("asofJoin + bucketed form match the naive argmax reference on random instances") {
    import graft.operators.Temporal
    val rng = new scala.util.Random(4242L)
    (0 until 4).foreach { case_ =>
      val nKeys = 1 + rng.nextInt(4)
      val left = (0 until 40).map(i =>
        (rng.nextInt(nKeys).toLong, rng.nextInt(50).toLong, i.toLong))
        .toDF("k", "t", "probe_id")
      val right = (0 until 30).map(i =>
        (rng.nextInt(nKeys).toLong, rng.nextInt(50).toLong, i.toLong, s"p$i"))
        .toDF("k", "t2", "rk", "tag")
      // naive reference: inequality join + (t2, rk) argmax
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("probe_id")).orderBy(col("t2").desc, col("rk").desc)
      val ref = left.join(right, left("k") === right("k") && col("t2") <= col("t"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("probe_id"), col("rk"), col("tag"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      def run(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("__asof").isNotNull)
        .select(col("probe_id"), col("__asof.rk"), col("__asof.tag"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      val plain = run(Temporal.asofJoin(left, right, "k", "t", "t2", Seq("rk", "tag"), "rk"))
      assert(plain == ref, s"case $case_ plain")
      Seq(1L, 7L, 64L).foreach { width =>
        val bucketed = run(Temporal.asofJoinBucketed(left, right, "k", "t", "t2",
          Seq("rk", "tag"), "rk", t => floor(t / width.toDouble)))
        assert(bucketed == ref, s"case $case_ width=$width")
      }
    }
  }

  test("winnow deque kernel equals the naive rightmost-min rescan on random inputs") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    // naive reference: the O(n·w) per-window rescan the deque replaced
    def naive(bytes: Array[Byte], k: Int, w: Int): Seq[Long] = {
      val n = bytes.length - k + 1
      if (n <= 0) return Seq.empty
      val grams = new Array[Long](n)
      var pow = 1L
      (1 until k).foreach(_ => pow *= 257L)
      var h = 0L
      (0 until k).foreach(i => h = h * 257L + (bytes(i) & 0xffL))
      grams(0) = XXH64.hashLong(h, 0x9747b28c9747b28cL)
      (1 until n).foreach { i =>
        h = (h - (bytes(i - 1) & 0xffL) * pow) * 257L + (bytes(i + k - 1) & 0xffL)
        grams(i) = XXH64.hashLong(h, 0x9747b28c9747b28cL)
      }
      val nWin = math.max(n - w + 1, 1); val winLen = math.min(w, n)
      val picked = scala.collection.mutable.SortedSet.empty[Long]
      var prevPos = -1
      (0 until nWin).foreach { s =>
        var minPos = s
        ((s + 1) until (s + winLen)).foreach { p =>
          if (grams(p) <= grams(minPos)) minPos = p
        }
        if (minPos != prevPos) { picked += grams(minPos); prevPos = minPos }
      }
      picked.toSeq
    }
    // small alphabet forces heavy gram-hash ties — the tie-break hot spot
    val gen = for {
      len <- Gen.chooseNum(0, 120)
      bs <- Gen.listOfN(len, Gen.oneOf('a'.toByte, 'b'.toByte, 'c'.toByte))
      k <- Gen.chooseNum(2, 8)
      w <- Gen.chooseNum(1, 12)
    } yield (bs.toArray, k, w)
    samples(gen, 150).foreach { case (bytes, k, w) =>
      val fast = graft.functions.WinnowKernel.winnow(bytes, k, w).toSeq
      val slow = naive(bytes, k, w)
      assert(fast == slow, s"len=${bytes.length} k=$k w=$w")
    }
  }

  test("winnow guarantee holds for random docs with a random planted substring") {
    val k = 8; val w = 4
    (0 until 8).foreach { i =>
      val shared = samples(Gen.alphaLowerChar, k + w - 1 + i * 3).mkString
      val pre = samples(Gen.alphaNumChar, 10 + i * 7).mkString
      val post = samples(Gen.alphaNumChar, 25 - i * 2).mkString
      val a = graft.functions.WinnowKernel.winnow((pre + shared + "0" * 9).getBytes("UTF-8"), k, w).toSet
      val b = graft.functions.WinnowKernel.winnow(("1" * 11 + shared + post).getBytes("UTF-8"), k, w).toSet
      assert(a.intersect(b).nonEmpty, s"case $i shared='$shared'")
    }
  }

  test("decontaminateWinnowed detection guarantee + precision on random corpora") {
    // end-to-end form of the kernel guarantee at the operator's declared
    // defaults (k=40, w=4): a random >= w+k-1 = 43-char benchmark passage
    // planted into a train doc is ALWAYS flagged; train docs built from a
    // disjoint alphabet (a-m vs the benchmark's n-z) can share no run at
    // all and are NEVER flagged.
    import graft.operators.Corpus
    val k = 40; val w = 4
    (0 until 4).foreach { trial =>
      val benchChars = samples(Gen.choose('n', 'z'), 400 + trial * 37)
      val benchText = benchChars.mkString
      // a random in-bounds slice of the benchmark doc, >= 43 chars
      val start = samples(Gen.chooseNum(0, 300), 1 + trial).last
      val len = k + w - 1 + samples(Gen.chooseNum(0, 40), 1 + trial).last
      val leak = benchText.substring(start, math.min(start + len, benchText.length))
      val trainPre = samples(Gen.choose('a', 'm'), 60 + trial * 11).mkString
      val trainPost = samples(Gen.choose('a', 'm'), 80 - trial * 9).mkString
      val clean1 = samples(Gen.choose('a', 'm'), 300).mkString
      val clean2 = samples(Gen.choose('a', 'm'), 250 + trial * 13).mkString
      val train = Seq(
        (1L, s"$trainPre$leak$trainPost"), // contaminated
        (2L, clean1), (3L, clean2))        // disjoint alphabet → clean
        .toDF("doc_id", "text")
      val bench = Seq((100L, benchText)).toDF("doc_id", "text")
      val flagged = Corpus.decontaminateWinnowed(train, bench, k, w)
        .collect().map(_.getLong(0)).toSet
      assert(flagged == Set(1L),
        s"trial $trial: leak len ${leak.length} at $start → flagged $flagged")
    }
  }

  test("mass-suspect audit partitions the matched bench evidence on random corpora") {
    // the conservation law behind the decontaminateWinnowed /
    // massContaminationSuspects pair: the maxDf cap only ROUTES matched
    // bench-side fingerprints between the precise verdict (train-df ≤
    // maxDf) and the mass-suspect audit (train-df > maxDf), it never
    // drops one — so per doc, uncapped hit count = capped hit count +
    // mass count, exactly. A 3-char alphabet at char k=8 forces heavy
    // cross-doc fingerprint sharing, so both routes engage.
    import graft.operators.Corpus
    val k = 8; val w = 4; val maxDf = 2
    (0 until 3).foreach { trial =>
      val train = (0 until 12).map { i =>
        (i.toLong,
          samples(Gen.choose('a', 'c'), 60 + (trial * 7 + i * 13) % 40).mkString)
      }.toDF("doc_id", "text")
      val bench = (0 until 3).map { j =>
        (500L + j,
          samples(Gen.choose('a', 'c'), 70 + (trial * 11 + j * 17) % 30).mkString)
      }.toDF("doc_id", "text")
      def counts(df: org.apache.spark.sql.DataFrame, c: String): Map[Long, Long] =
        df.collect().map(r => r.getLong(0) -> r.getAs[Long](c)).toMap
      val uncapped = counts(
        Corpus.decontaminateWinnowed(train, bench, k, w, maxDf = Int.MaxValue),
        "n_hit_fps")
      val capped = counts(
        Corpus.decontaminateWinnowed(train, bench, k, w, maxDf = maxDf),
        "n_hit_fps")
      val mass = counts(
        Corpus.massContaminationSuspects(train, bench, k, w, maxDf = maxDf),
        "n_mass_fps")
      assert(uncapped.nonEmpty, s"trial $trial vacuous: no matched fps at all")
      assert(mass.nonEmpty, s"trial $trial vacuous: the cap never engaged")
      val docs = uncapped.keySet ++ capped.keySet ++ mass.keySet
      docs.foreach { d =>
        assert(uncapped.getOrElse(d, 0L) ==
          capped.getOrElse(d, 0L) + mass.getOrElse(d, 0L),
          s"trial $trial doc $d: ${uncapped.get(d)} != ${capped.get(d)} + ${mass.get(d)}")
      }
    }
  }

  test("d50 distillation equals a driver-side reference NB on random corpora") {
    // Independent end-to-end replication of the whole d50 pipeline —
    // gate label, fixed-edge bins, Laplace count-NB weights, micro
    // quantization, integer score — in plain Scala collections, compared
    // EXACTLY. The DuckDB oracle already replays this on the fixed test
    // corpora; this property drives it over adversarial random corpora
    // the parquet fixtures don't contain (NULL text, empty text,
    // space-only text, punctuation-heavy tokens). Training runs on the
    // same JVM libm on both sides, so equality is exact by construction.
    import graft.operators.QualityModel
    val word = Gen.oneOf(Seq("alpha", "be", "ga!", "x", "delta.", "eeeeeee",
      "!!!", "...", "a,b", "zz;", "mmmmmmmmmmmmmmmmmm", "q:"))
    val textGen: Gen[String] = Gen.frequency(
      7 -> Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word))
        .map(_.mkString(" ")),
      1 -> Gen.const(""),
      1 -> Gen.const("   "),
      1 -> Gen.const(null))
    (0 until 3).foreach { trial =>
      val docs = samples(textGen, 100 + trial * 17).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val out = QualityModel.qualityScores(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
      assert(out.size == docs.size)

      // reference bins/label — mirrors binned()'s semantics including the
      // NULL→ELSE-arm and 0/0→NaN→ELSE edge cases
      case class B(label: Boolean, len: Long, tok: Long, punct: Long, ttr: Long)
      def binsOf(t: String): B = {
        if (t == null) return B(label = false, 3, 3, 2, 3)
        val toks = t.split(" ", -1)
        val nTok = toks.length.toDouble
        val r1 = t.count(_ != ' ').toDouble / nTok
        val r2 = t.count(c => ".,!?;:".contains(c)).toDouble / t.length
        val ttr = toks.distinct.length.toDouble / nTok
        B(nTok >= 10 && r1 >= 2.0 && r1 <= 15.0 && r2 <= 0.1,
          if (nTok < 10) 0L else if (nTok < 50) 1L else if (nTok < 200) 2L else 3L,
          if (r1 < 2.0) 0L else if (r1 < 5.0) 1L else if (r1 <= 15.0) 2L else 3L,
          if (r2 <= 0.02) 0L else if (r2 <= 0.1) 1L else 2L,
          if (ttr < 0.3) 0L else if (ttr < 0.6) 1L else if (ttr < 0.9) 2L else 3L)
      }
      val bs = docs.map { case (id, t) => id -> binsOf(t) }.toMap
      val nPos = bs.values.count(_.label).toLong
      val nNeg = bs.size - nPos
      def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
      val feats: Seq[(Int, B => Long)] =
        Seq((4, _.len), (4, _.tok), (3, _.punct), (4, _.ttr))
      def weight(nb: Int, g: B => Long, bin: Long): Long = {
        val np = bs.values.count(b => b.label && g(b) == bin)
        val nn = bs.values.count(b => !b.label && g(b) == bin)
        micro(math.log(np + 1.0) - math.log(nPos + nb.toDouble) -
          math.log(nn + 1.0) + math.log(nNeg + nb.toDouble))
      }
      val prior = micro(math.log(nPos + 1.0) - math.log(nNeg + 1.0))
      docs.foreach { case (id, t) =>
        val b = bs(id)
        val m = prior + feats.map { case (nb, g) => weight(nb, g, g(b)) }.sum
        assert(out(id) == ((m.toDouble / 1e6, m > 0L)),
          s"trial $trial doc $id '${t}': spark ${out(id)} vs reference " +
            s"(${m.toDouble / 1e6}, ${m > 0L})")
      }
    }
  }
}
