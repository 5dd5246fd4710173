package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.7 D4) and
  * n-gram Jaccard similarity over `documents`.
  *
  * Architecture (100 TB): the exact path broadcasts the (small) query set
  * against the corpus — one scan, no corpus shuffle, per-query top-k via a
  * window partitioned by query id. The scale path buckets vectors with
  * random-hyperplane LSH so candidate generation is a bucket-equijoin
  * (shuffle on bucket signature, not a cross join); exact cosine re-ranks
  * only within buckets.
  *
  * All dot products run as `aggregate(zip_with(...))` — sequential
  * left-to-right double summation, bit-identical to any engine that sums
  * sequentially (verified vs DuckDB `list_dot_product`).
  */
object Similarity {

  /** Locale-independent double → SQL literal. `Double.toString` round-trips
    * the exact bit pattern and never uses locale-sensitive separators (an
    * `f"$v%.17g"` interpolation would emit `,` decimals under comma-decimal
    * default locales and fail to parse). */
  private def dlit(v: Double): String = {
    require(!v.isNaN && !v.isInfinite, s"non-finite plan literal: $v")
    s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
  }

  /** Cosine similarity between two ArrayType(Float) columns, computed in
    * double precision. Uses the native [[graft.functions.CosineSimilarity]]
    * codegen expression when the session has graft extensions registered
    * (one fused loop, no allocation); otherwise the composed higher-order
    * form. Both produce bit-identical doubles on well-formed vectors (same
    * accumulation order, null on length mismatch or null element). They
    * diverge ONLY on non-finite elements and zero norms: the native form
    * returns NULL (undefined similarity — a NaN would rank above every
    * real one in a descending top-k), where the composed form lets the
    * raw NaN/±Inf arithmetic through; every declared query runs with
    * extensions registered, so the catalog always gets the NULL contract.
    * Resolves the ACTIVE session — a hard-coded None here used to make the
    * native branch unreachable from this public entry point. */
  def cosineExpr(a: String, b: String): org.apache.spark.sql.Column =
    cosineExprIn(org.apache.spark.sql.SparkSession.getActiveSession, a, b)

  private def cosineExprIn(spark: Option[org.apache.spark.sql.SparkSession],
                           a: String, b: String): org.apache.spark.sql.Column = {
    val native = spark.exists(_.catalog.functionExists("cosine_sim"))
    if (native) expr(s"cosine_sim($a, $b)")
    else {
      def dot(x: String, y: String) =
        s"aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
      expr(s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))")
    }
  }

  /** Salted two-phase per-query top-k over a scored candidate relation
    * (query_id, nbr_id, cos_sim). A single window partitioned by query_id
    * caps parallelism at nQueries tasks — with 20 queries and a large
    * corpus that's one straggler stage. Phase 1 ranks within
    * (query_id, salt) — `salts`× the parallelism, each task seeing ~1/salts
    * of the candidates — and keeps k per salt; phase 2 ranks the ≤ salts·k
    * survivors per query (tiny). The global top-k under
    * (cos_sim desc, nbr_id) is contained in the union of per-salt top-ks,
    * so the result — ranks included — is bit-identical to the one-window
    * form (asserted in SimilaritySpec). */
  private def topKPerQuery(scored: DataFrame, k: Int, salts: Int = 8,
                           scoreCol: String = "cos_sim",
                           ascending: Boolean = false): DataFrame = {
    val ord = if (ascending) col(scoreCol).asc else col(scoreCol).desc
    val w1 = Window.partitionBy(col("query_id"), col("__salt"))
      .orderBy(ord, col("nbr_id"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(ord, col("nbr_id"))
    // a NULL score (length mismatch, zero-norm/empty embedding —
    // [[graft.functions.CosineSimilarity]]'s undefined cases) is not a
    // rankable candidate; without the filter it would fill top-k slots
    // whenever the candidate pool is smaller than k
    val nonNull = scored.where(col(scoreCol).isNotNull)
    // spark.graft.topkPrune=off bypasses the bounded pre-selection — an
    // A/B lever for ScaleProbe's shuffle-volume measurement and the
    // parity spec, never for production (the bloomPrune precedent)
    val pruned =
      if (scored.sparkSession.conf.get("spark.graft.topkPrune", "on") == "off")
        nonNull
      else partitionLocalTopK(nonNull, k, scoreCol, ascending)
    pruned
      .withColumn("__salt", pmod(col("nbr_id"), lit(salts)))
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .select(col("query_id"), col("nbr_id"), col(scoreCol),
        row_number().over(w2).cast("long").as("rank"))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Partition-local bounded selection feeding [[topKPerQuery]]'s rank
    * exchange: keep the best `k` candidates per query WITHIN each input
    * partition (a narrow mapPartitions, no shuffle), so the exchange
    * carries O(partitions · queries · k) rows. Note (ScaleProbe r19):
    * Spark's own WindowGroupLimit already pushes a map-side group limit
    * below the rank exchange, so the raw shuffle-volume bound is NOT
    * unique to this operator — the measured win is (a) replacing the
    * per-partition SORT WindowGroupLimit does with an O(n·log k) bounded
    * heap and (b) pruning BEFORE the `__salt` column multiplies the
    * per-group survivors by `salts`.
    * Bit-identical by the same containment argument the salted window
    * makes for salts: the global top-k under the total order
    * (score [asc|desc], nbr_id asc) is contained in the union of
    * per-partition top-ks, and the downstream two-phase rank re-ranks
    * the survivors globally. Scores compare with Spark's SQL double
    * ordering (−0.0 == 0.0, NaN greatest — `SQLOrderingUtil`'s rule,
    * reproduced here as `if (x == y) 0 else Double.compare`), so a
    * candidate kept/dropped here is exactly the one the window rank
    * would keep/drop. Selection is a worst-at-head bounded heap —
    * O(log k) per replacement, q·k rows of state per partition (the
    * query set is bounded by contract on every D4 path). */
  private def partitionLocalTopK(scored: DataFrame, k: Int,
                                 scoreCol: String,
                                 ascending: Boolean): DataFrame = {
    val spark = scored.sparkSession
    val schema = scored.schema
    val qi = schema.fieldIndex("query_id")
    val ni = schema.fieldIndex("nbr_id")
    val si = schema.fieldIndex(scoreCol)
    val asc = ascending
    val kk = k
    val out = scored.rdd.mapPartitions { it =>
      import org.apache.spark.sql.Row
      // Spark SQL's double ordering: value-equal (-0.0 == 0.0) is a tie;
      // otherwise Double.compare (NaN greater than everything)
      def cmpScore(x: Double, y: Double): Int =
        if (x == y) 0 else java.lang.Double.compare(x, y)
      // true iff `a` outranks `b` under (score [asc|desc], nbr_id asc)
      def better(sa: Double, na: Long, sb: Double, nb: Long): Boolean = {
        val c = cmpScore(sa, sb)
        if (c != 0) { if (asc) c < 0 else c > 0 }
        else na < nb
      }
      final case class Cand(score: Double, nbr: Long, row: Row)
      // worst-at-head: the heap root is the currently weakest kept
      // candidate, so an incoming better row replaces it in O(log k)
      val worstFirst = new java.util.Comparator[Cand] {
        def compare(a: Cand, b: Cand): Int =
          if (better(a.score, a.nbr, b.score, b.nbr)) 1
          else if (better(b.score, b.nbr, a.score, a.nbr)) -1
          else 0
      }
      val heaps = scala.collection.mutable.LongMap
        .empty[java.util.PriorityQueue[Cand]]
      it.foreach { r =>
        val q = r.get(qi).asInstanceOf[Number].longValue()
        val n = r.get(ni).asInstanceOf[Number].longValue()
        val s = r.get(si).asInstanceOf[Number].doubleValue()
        val h = heaps.getOrElseUpdate(q,
          new java.util.PriorityQueue[Cand](kk + 1, worstFirst))
        if (h.size < kk) h.add(Cand(s, n, r))
        else {
          val w = h.peek()
          if (better(s, n, w.score, w.nbr)) { h.poll(); h.add(Cand(s, n, r)) }
        }
      }
      heaps.valuesIterator.flatMap { h =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala
          .map(_.row)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** D4 exact — brute-force top-k cosine neighbors for a bounded query set
    * (`vec_id < nQueries`). Query side is broadcast; corpus is scanned
    * once; top-k per query via the salted two-phase rank on (rounded sim,
    * neighbor id) so selection is deterministic and the top-k stage is not
    * capped at nQueries-way parallelism. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val joined = embeddings
      .select(col("vec_id").as("nbr_id"), col("embedding").as("n_emb"))
      .crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        Features.pround(cosineExprIn(Some(embeddings.sparkSession), "q_emb", "n_emb"), 6).as("cos_sim"))
    topKPerQuery(joined, k)
  }

  /** LSH-bucketed approximate top-k with OR-amplification: `nTables`
    * independent hash tables of `nPlanes` bits each; a pair is a candidate
    * if it collides in ANY table (recall ≈ 1−(1−p^b)^L). Candidates are
    * deduped before the exact cosine re-rank, so each pair's similarity is
    * computed once. Shuffle is O(rows · nTables), never O(rows²). */
  def lshTopK(embeddings: DataFrame, dim: Int, nQueries: Int, k: Int,
              nPlanes: Int = 4, nTables: Int = 16): DataFrame = {
    // one scan, one fused native expression: all nTables·nPlanes sign bits
    // per row (graft.functions.HyperplaneBits), then cheap bit-slicing into
    // per-table bucket ids and one explode
    require(nTables * nPlanes <= 64, "hyperplane signature limited to 64 bits")
    val allPlanes: Seq[Seq[Double]] = (0 until nTables).flatMap { t =>
      val rng = new scala.util.Random(42L + t)
      Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
    }
    val bitsCol = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.HyperplaneBits(
        org.apache.spark.sql.GraftColumnBridge.expression(col("embedding")),
        allPlanes))
    val mask = (1L << nPlanes) - 1L
    val bucketCols = (0 until nTables).map(t =>
      s"concat('$t:', CAST(shiftrightunsigned(__bits, ${t * nPlanes}) & ${mask}L AS STRING))")
    // slim (vec_id, bucket) relation — embeddings deliberately NOT carried
    // (verification re-fetches them by id; shuffling vectors through the
    // candidate distinct would cost more than the re-scan). localCheckpoint:
    // the relation feeds both the query side and the corpus side of the
    // bucket join — unmaterialized, the HyperplaneBits dot products and the
    // explode would run twice (no CSE across self-joins, the Dedup rule).
    // The checkpoint holds nTables small rows per vector, not vectors.
    val bucketed = embeddings
      .withColumn("__bits", bitsCol)
      .select(col("vec_id"),
        explode(expr(bucketCols.mkString("array(", ", ", ")"))).as("bucket"))
      .localCheckpoint(true)
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("bucket"))
    val candIds = bucketed
      .select(col("vec_id").as("nbr_id"), col("bucket"))
      .join(broadcast(q), "bucket")
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id")).distinct()
    val qEmb = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cands = candIds
      .join(embeddings.select(col("vec_id").as("nbr_id"), col("embedding").as("n_emb")), "nbr_id")
      .join(broadcast(qEmb), "query_id")
      .select(col("query_id"), col("nbr_id"),
        Features.pround(cosineExprIn(Some(embeddings.sparkSession), "q_emb", "n_emb"), 6).as("cos_sim"))
    topKPerQuery(cands, k)
  }

  /** Seeded k-means++ init + Lloyd iterations over a bounded in-memory
    * sample (the IVF coarse quantizer). Deterministic for a fixed seed;
    * an emptied cluster keeps its previous centroid. Fails loudly when
    * the usable sample cannot seat k distinct seeds: past that point the
    * D² seeding loop has consumed all mass and would silently reuse
    * sample points — duplicate centroids that concentrate vectors into
    * fewer effective cells and quadratically inflate SemDeDup's
    * within-cell self-join (the exact failure the k-scaled sample in
    * [[trainIvfCentroids]] exists to prevent). */
  private[graft] def kmeansLloyd(rawPoints: Array[Array[Double]], k: Int,
                                     iters: Int, seed: Long): Array[Array[Double]] = {
    require(rawPoints.nonEmpty, "kmeans sample is empty")
    // fix the quantizer dimension to the sample's MODAL vector length and
    // drop the stragglers: one truncated embedding in the sample (a
    // partial encoder failure — the same hostile class CosineSimilarity
    // returns NULL for) would otherwise either crash sqDist's fixed-dim
    // loop (AIOOBE) or, if it happened to be points(0), silently truncate
    // every distance to its prefix — wrong centroids with no error
    val dim = rawPoints.map(_.length).groupBy(identity)
      .maxBy { case (len, g) => (g.length, len) }._1
    val points = rawPoints.filter(_.length == dim)
    require(points.length >= k,
      s"kmeans sample has only ${points.length} usable points (modal dim $dim) " +
        s"for k=$k clusters — the D² seeding would degenerate into duplicate " +
        s"centroids; raise samplesPerCentroid / the corpus, or lower nClusters")
    val rng = new scala.util.Random(seed)
    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var j = 0
      while (j < dim) { val t = a(j) - b(j); d += t * t; j += 1 }
      d
    }
    // k-means++ seeding: first centroid uniform, next ∝ D²(x)
    val centroids = Array.ofDim[Array[Double]](k)
    centroids(0) = points(rng.nextInt(points.length)).clone()
    val d2 = points.map(sqDist(_, centroids(0)))
    var c = 1
    while (c < k) {
      val total = d2.sum
      val target = rng.nextDouble() * total
      var acc = 0.0; var pick = 0
      var i = 0
      while (i < points.length && acc <= target) { acc += d2(i); pick = i; i += 1 }
      centroids(c) = points(pick).clone()
      var j = 0
      while (j < points.length) {
        val d = sqDist(points(j), centroids(c))
        if (d < d2(j)) d2(j) = d
        j += 1
      }
      c += 1
    }
    // Lloyd iterations
    val sums = Array.ofDim[Double](k, dim)
    val counts = Array.ofDim[Long](k)
    var it = 0
    while (it < iters) {
      java.util.Arrays.fill(counts, 0L)
      sums.foreach(java.util.Arrays.fill(_, 0.0))
      points.foreach { p =>
        var best = 0; var bestD = sqDist(p, centroids(0))
        var ci = 1
        while (ci < k) {
          val d = sqDist(p, centroids(ci))
          if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
      }
      var ci = 0
      while (ci < k) {
        if (counts(ci) > 0) {
          var j = 0
          while (j < dim) { centroids(ci)(j) = sums(ci)(j) / counts(ci); j += 1 }
        }
        ci += 1
      }
      it += 1
    }
    centroids
  }

  /** Training-sample size for a k-list quantizer: the floor stays at the
    * historical 10k (so small-k quantizers — d22's 16, d59's 8 — train on
    * the bit-identical draw every prior round verified), and past
    * 10k/samplesPerCentroid lists the sample GROWS with k. A fixed cap
    * contradicts the 50k-cluster SemDeDup regime: k-means++ seeding
    * consumes the sample's D² mass, so at k > sample size it must reuse
    * points (silent duplicate centroids), and even at k = sample/2 each
    * centroid trains on ~2 points — starved cells that concentrate
    * vectors and quadratically inflate the within-cell self-join. */
  private[graft] def trainSampleTarget(nLists: Int,
                                       samplesPerCentroid: Int = 20): Long =
    math.max(10000L, samplesPerCentroid.toLong * nLists)

  /** Driver-training knee: the capped-sample Lloyd's runs on the driver
    * while BOTH hold —
    *  - rows: the sample fits comfortably in driver memory
    *    (1M × 64-dim doubles ≈ 0.5 GB);
    *  - work: seeding + 5 Lloyd iterations are O(sample · k · dim) —
    *    2e7 row·centroid pairs ≈ 10 s single-threaded at dim 64, the
    *    largest constant a query-time build should pay.
    * Above either bound, training hands off to the distributed Lloyd's
    * ([[kmeansDistributedLloyd]]) — the same literal→broadcast knee
    * pattern as [[assignCells]]: the SEMANTICS (modal dim, argmin-first,
    * empty-cluster-keeps-centroid) carry over; only the plan shape
    * changes. */
  private[graft] val driverTrainMaxRows = 1000000L
  private[graft] val driverTrainMaxWork = 20000000L

  private[graft] def trainsOnDriver(nLists: Int,
                                    samplesPerCentroid: Int = 20): Boolean = {
    val target = trainSampleTarget(nLists, samplesPerCentroid)
    target <= driverTrainMaxRows && target * nLists <= driverTrainMaxWork
  }

  /** Train the IVF coarse quantizer once (capped-sample k-means) so
    * repeated [[ivfTopK]] calls amortize the index build — the production
    * shape: build at ingest, probe at query time.
    *
    * The training sample is the top-[[trainSampleTarget]] by a SEEDED
    * HASH of `vec_id` (a distributed TakeOrdered: each task keeps its
    * local top-N, the driver merges) — a uniform draw over the whole
    * corpus that is deterministic under any partition count or arrival
    * order. The obvious alternatives both fail at scale: `limit(n)`
    * returns whatever partitions answer first, so a range-partitioned or
    * time-ordered corpus trains every centroid on one shard of the
    * distribution; Bernoulli `sample(fraction, seed)` derives its stream
    * from the partition index, so the drawn set — and therefore the
    * centroids and every downstream cell assignment — changes when the
    * layout does, breaking replay-identical verification.
    *
    * Past the [[trainsOnDriver]] knee (k ≳ 1000 at the default 20
    * samples/centroid) the hand-off is [[kmeansDistributedLloyd]].
    * Contract either way: EXACTLY nLists centroids come back (an emptied
    * cluster keeps its previous centroid rather than collapsing — the
    * `require(centroids.length == nClusters)` in [[semanticDedup]]/
    * [[ivfTopK]] guards persisted-index/caller mismatches, not trainer
    * behavior), and a sample too small to seat nLists distinct seeds
    * fails loudly instead of silently duplicating centroids. */
  def trainIvfCentroids(embeddings: DataFrame, nLists: Int,
                        seed: Long = 42L,
                        samplesPerCentroid: Int = 20): Array[Array[Double]] = {
    require(nLists >= 1, s"nLists must be >= 1, got $nLists")
    if (!trainsOnDriver(nLists, samplesPerCentroid))
      return kmeansDistributedLloyd(embeddings, nLists,
        trainSampleTarget(nLists, samplesPerCentroid), iters = 5, seed)
    val sample: Array[Array[Double]] = trainable(embeddings)
      .select(col("embedding"),
        xxhash64(col("vec_id"), lit(seed)).as("__draw"))
      // vec_id tiebreaker: a hash tie exactly at the cap boundary would
      // otherwise leave the chosen row layout-dependent
      .orderBy(col("__draw"), col("vec_id"))
      .limit(trainSampleTarget(nLists, samplesPerCentroid).toInt)
      .select(col("embedding"))
      .collect()
      .map(r => toDoubleArray(r.getSeq[Any](0)))
    kmeansLloyd(sample, nLists, iters = 5, seed)
  }

  /** Number-safe element read: the canonical embedding type is
    * `array<float>` ([[graft.Tables.normalizeEmbedding]]), but a caller
    * handing this module a raw double-typed column must get the same
    * doubles on every path — a hard-coded `getSeq[Float]` would make the
    * driver/literal paths work and the kernel paths ClassCastException,
    * i.e. the same corpus succeeding at k=64 and crashing at k=65. */
  private def toDoubleArray(s: Seq[Any]): Array[Double] = {
    val out = new Array[Double](s.length)
    var j = 0
    val it = s.iterator
    while (it.hasNext) { out(j) = it.next().asInstanceOf[Number].doubleValue(); j += 1 }
    out
  }

  /** Distributed Lloyd's — the above-knee quantizer trainer for the
    * SemDeDup regime (nClusters ~ n/targetCellSize, up to ~50k lists).
    * Same semantics as the driver path where they can be shared (modal
    * quantizer dimension, first-minimum argmin with NaN ordered greatest,
    * an emptied cluster keeps its previous centroid, exactly k centroids
    * returned); the SEEDING differs by design — k-means++'s D² loop is
    * inherently sequential in k (k full passes), so the distributed
    * trainer seeds with a seeded-hash Forgy draw over DISTINCT vectors
    * (k-means|| is the literature alternative; Forgy + the same Lloyd
    * refinement is the cheap deterministic one, and duplicate seed
    * vectors — which Lloyd's can never re-separate — are excluded by
    * construction).
    *
    * Scale/determinism shape: the training set is a seeded-hash threshold
    * subsample (layout-invariant, no global sort — ~sampleTarget rows in
    * expectation), materialized once; each iteration broadcasts the k×dim
    * centroid matrix and runs ONE mapPartitions pass that accumulates
    * per-cell micro-quantized integer sums (round(x·2^24) as Long — the
    * repo's integer-cent aggregation pattern), so the reduceByKey merge
    * is ORDER-INDEPENDENT and the trained centroids are bit-identical
    * under any partition layout, unlike a double-summed reduce. Driver
    * traffic per iteration = k×dim longs (the size of the result itself).
    * Quantization grid 2^-24 ≈ 6e-8 per element — noise relative to
    * k-means convergence, bounded cumulative error < sample·|x|·2^-24. */
  private[graft] def kmeansDistributedLloyd(embeddings: DataFrame, k: Int,
      sampleTarget: Long, iters: Int, seed: Long): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    val base = trainable(embeddings).select(col("vec_id"), col("embedding"))
    val n = base.count()
    val pts0 =
      if (n <= sampleTarget) base
      else {
        // hash-threshold subsample: keeps ~sampleTarget rows in
        // expectation, deterministic per vec_id (layout-invariant), one
        // scan — a TakeOrdered at this scale would gather millions of
        // rows through the driver for no training benefit
        val m = 1000000L
        val thresh = math.min(m, (m * sampleTarget + n - 1) / n)
        base.where(pmod(xxhash64(col("vec_id"), lit(seed)), lit(m)) < thresh)
      }
    // modal quantizer dimension, distributed (mirrors kmeansLloyd's rule:
    // most frequent length, ties to the larger)
    val dimRows = pts0.groupBy(size(col("embedding")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
    require(dimRows.nonEmpty, "kmeans training set is empty")
    val dim = dimRows.maxBy(r => (r.getAs[Long]("n"), r.getAs[Int]("d"))).getAs[Int]("d")
    // materialized once: scanned by the seed draw + every Lloyd iteration
    val pts = pts0.where(size(col("embedding")) === dim)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    // Forgy seeding over DISTINCT vectors: seed draw keyed on the min
    // vec_id carrying each distinct embedding (deterministic under
    // layout and duplication). The distinct-vector dedup keys its
    // exchange on a 64-bit DIGEST of the embedding, not the embedding
    // itself — the d62 lesson: a 256-byte array as a groupBy key shuffles
    // full vectors where (hash, min vec_id) ≈ 16 B/row carries the same
    // decision; the k seed VECTORS are then fetched by id in a second
    // id-keyed pass (broadcast of k ids). A 64-bit collision between two
    // distinct vectors can only merge them into one representative —
    // never duplicate a seed — and a merged seed shortfall still trips
    // the loud require below.
    val seedIds: Array[Long] = pts
      .groupBy(xxhash64(col("embedding")).as("__h"))
      .agg(min(col("vec_id")).as("vec_id"))
      .orderBy(xxhash64(col("vec_id"), lit(seed)).as("__draw"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"))
      .collect().map(_.getLong(0))
    require(seedIds.length >= k,
      s"quantizer training set has only ${seedIds.length} distinct usable vectors " +
        s"(modal dim $dim) for k=$k clusters — duplicate seeds would never " +
        s"re-separate; lower nClusters or widen the corpus/sample")
    val seedDf = {
      import spark.implicits._
      seedIds.toSeq.toDF("vec_id")
    }
    val byId: Map[Long, Array[Double]] = pts
      .join(broadcast(seedDf), "vec_id")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> toDoubleArray(r.getSeq[Any](1))).toMap
    // re-ordered to the draw order: centroid INDEX assignment feeds the
    // first-minimum argmin tie rule, so seed order is part of bit-identity
    val init: Array[Array[Double]] = seedIds.map(byId)
    var centroids = init
    val scale = (1L << 24).toDouble
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val agg = pts.select(col("embedding")).rdd.mapPartitions { rows =>
        val cs = bc.value
        val sums = scala.collection.mutable.HashMap.empty[Int, Array[Long]]
        val counts = scala.collection.mutable.HashMap.empty[Int, Long]
        rows.foreach { r =>
          val e = r.getSeq[Any](0)
          val x = new Array[Double](dim)
          var j = 0
          while (j < dim) { x(j) = e(j).asInstanceOf[Number].doubleValue(); j += 1 }
          var best = 0
          var bestD = { var d = 0.0; var j2 = 0
            while (j2 < dim) { val t = x(j2) - cs(0)(j2); d += t * t; j2 += 1 }; d }
          var ci = 1
          while (ci < cs.length) {
            var d = 0.0; var j2 = 0
            while (j2 < dim) { val t = x(j2) - cs(ci)(j2); d += t * t; j2 += 1 }
            if (java.lang.Double.compare(d, bestD) < 0) { best = ci; bestD = d }
            ci += 1
          }
          val s = sums.getOrElseUpdate(best, new Array[Long](dim))
          var j3 = 0
          while (j3 < dim) { s(j3) += math.round(x(j3) * scale); j3 += 1 }
          counts.update(best, counts.getOrElse(best, 0L) + 1L)
        }
        sums.iterator.map { case (c, s) => (c, (s, counts(c))) }
      }.reduceByKey { (a: (Array[Long], Long), b: (Array[Long], Long)) =>
        var j = 0
        while (j < a._1.length) { a._1(j) += b._1(j); j += 1 }
        (a._1, a._2 + b._2)
      }.collect()
      bc.destroy()
      val next = centroids.map(_.clone())
      agg.foreach { case (c, (s, cnt)) =>
        var j = 0
        while (j < dim) { next(c)(j) = (s(j) / scale) / cnt; j += 1 }
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Rows a vector index can hold: NULL, empty, or null-ELEMENT embeddings
    * (a failed or partially-failed encoder upstream — routine in a 100 TB
    * corpus) can neither train the quantizer (driver-side `getSeq` unboxing
    * NPEs — a null Float element crashes `.map(_.toDouble)` just like a
    * null array) nor be assigned a cell or probed, so the IVF paths
    * exclude them up front. The exact and LSH paths need no such gate —
    * their kernels are null-safe and a NULL embedding simply never reaches
    * a top-k list. */
  private[graft] def indexable(embeddings: DataFrame): DataFrame =
    embeddings.where(col("embedding").isNotNull && size(col("embedding")) > 0 &&
      !expr("exists(embedding, x -> x IS NULL)"))

  /** Rows a quantizer can TRAIN on: [[indexable]] minus NaN-bearing
    * vectors. A NaN element is harmless at assignment time (all
    * distances compare NaN-greatest, the row lands in cell 0, and every
    * exact verification against it yields NULL cosine — it can never
    * emit a pair), but inside Lloyd's it poisons training:
    * `round(NaN·2^24) = 0` adds zero to every element sum while still
    * incrementing the count, silently dragging the first centroid
    * toward the origin. Poisoned rows are quarantine material for the
    * caller's validation pass, not training mass. */
  private def trainable(embeddings: DataFrame): DataFrame =
    indexable(embeddings).where(!expr("exists(embedding, x -> isnan(x))"))

  /** Assign each vector its nearest centroid — ONE scan, no join, no
    * shuffle, materialized (localCheckpoint) because every consumer scans
    * the assigned relation more than once. Always the broadcast kernel
    * ([[assignCellsBroadcast]], the MLlib-KMeans shape): the plan is O(1)
    * in nClusters — which is what lets `nClusters ~ n / targetCellSize`
    * scale to the 50k-cluster SemDeDup regime — AND it is the faster
    * form at every non-trivial size. The previous knee routed
    * ≤ 64 centroids through [[assignCellsLiteral]] on a "fully codegen'd,
    * zero per-row overhead" theory that measurement falsified (r18,
    * 250k × 64-dim rows, k=16: literal 9.6 s vs kernel 0.47 s — the
    * aggregate/zip_with higher-order functions allocate per ELEMENT, so
    * the literal plan pays ~k·dim allocations/row where the kernel pays
    * one primitive loop); at fixture sizes the two are within the same
    * ~0.1 s fixed cost, so retiring the knee is bench-neutral at small n
    * and 20× at probe scale. The literal form remains as the
    * SQL-expressible REFERENCE implementation — the parity spec pins the
    * kernel bit-identical to it (same IEEE sum order, first-minimum
    * argmin, NaN-greatest, NULL cell on dim mismatch), which is exactly
    * the role an independent second implementation should play. */
  private[graft] def assignCells(corpus: DataFrame,
                                     centroids: Array[Array[Double]]): DataFrame =
    assignCellsBroadcast(corpus, centroids)

  private[graft] def assignCellsLiteral(corpus: DataFrame,
                                            centroids: Array[Array[Double]]): DataFrame = {
    val distExprs = centroids.map { c =>
      val arr = c.map(dlit).mkString("array(", ", ", ")")
      s"aggregate(zip_with(embedding, $arr, (x, w) -> (CAST(x AS DOUBLE) - w) * (CAST(x AS DOUBLE) - w)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
    }
    corpus
      .select(col("vec_id"), col("embedding"),
        expr(distExprs.mkString("array(", ", ", ")")).as("__dists"))
      .select(col("vec_id"), col("embedding"),
        (expr("array_position(__dists, array_min(__dists))") - 1L)
          .cast("int").as("cell"))
      .localCheckpoint(true)
  }

  /** The large-quantizer assignment kernel. Semantics mirror the literal
    * path EXACTLY, including its degenerate edges, so the knee never
    * changes a result:
    *  - distances accumulate in index order with the same
    *    `(double(x) − w)²` terms → the same IEEE-754 sum;
    *  - argmin keeps the FIRST minimum (array_position returns the first
    *    match) and orders NaN greatest (Spark's array_min ordering —
    *    `Double.compare` gives both);
    *  - a vector whose length differs from the quantizer dim gets a NULL
    *    cell (zip_with pads the shorter side with nulls, nulling every
    *    distance, so array_min and the position are NULL there). */
  private[graft] def assignCellsBroadcast(corpus: DataFrame,
                                              centroids: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val spark = corpus.sparkSession
    val base = corpus.select(col("vec_id"), col("embedding"))
    val bc = spark.sparkContext.broadcast(centroids)
    val schema = StructType(base.schema.fields :+
      StructField("cell", IntegerType, nullable = true))
    val out = base.rdd.mapPartitions { it =>
      val cs = bc.value
      val dim = if (cs.isEmpty) -1 else cs(0).length
      it.map { r =>
        // Number read, not getSeq[Float]: the literal path CASTs any
        // numeric array, so a double-typed embedding column must take
        // the same knee without a ClassCastException at k=65
        val emb = r.getSeq[Number](1)
        val cell: Any =
          if (emb == null || emb.length != dim) null
          else {
            val x = new Array[Double](dim)
            var j = 0
            while (j < dim) { x(j) = emb(j).doubleValue(); j += 1 }
            def dist(c: Array[Double]): Double = {
              var d = 0.0; var k = 0
              while (k < dim) { val t = x(k) - c(k); d += t * t; k += 1 }
              d
            }
            var best = 0; var bestD = dist(cs(0)); var ci = 1
            while (ci < cs.length) {
              val d = dist(cs(ci))
              if (java.lang.Double.compare(d, bestD) < 0) { best = ci; bestD = d }
              ci += 1
            }
            best
          }
        Row(r.get(0), r.get(1), cell)
      }
    }
    spark.createDataFrame(out, schema).localCheckpoint(true)
  }

  /** Joint (bands L, bits b) selection for the hot-cell LSH sub-shard:
    * for each candidate L, take the most bits that keep pair recall AT
    * the minSim threshold ≥ 0.95 under OR-amplification —
    * 1 − (1−p^b)^L ≥ 0.95 with p = 1 − arccos(minSim)/π — then pick the
    * L minimizing the uniform-direction pair-work fraction L/2^b (tie →
    * more bands, better recall margin). High thresholds take few wide
    * bands (minSim 0.99 → L=4 × b=13: ~2000× split at 0.96 at-threshold
    * recall); loose thresholds degrade gracefully toward no net split
    * (minSim 0.45 → L=16 × b=4, fraction 1.0 for direction-UNIFORM
    * cells — LSH cannot split hard at low similarity without recall
    * loss; direction-CLUSTERED hot cells, the regime that creates them,
    * still shatter). Explicit non-zero arguments override either
    * dimension (bits only derived for the given L). */
  private[graft] def shardPlan(minSim: Double, shardBands: Int = 0,
                               shardBits: Int = 0): (Int, Int) = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, minSim))) / math.Pi
    def bitsFor(l: Int): Int = {
      val need = 1.0 - math.pow(0.05, 1.0 / l)
      val b = if (p <= 0.0 || p >= 1.0) 64 / l
      else math.floor(math.log(need) / math.log(p)).toInt
      math.max(1, math.min(b, 64 / l))
    }
    (shardBands, shardBits) match {
      case (lb, bb) if lb > 0 && bb > 0 => (lb, bb)
      case (lb, _) if lb > 0 => (lb, bitsFor(lb))
      case (_, bb) if bb > 0 =>
        // bits fixed → smallest band count meeting the recall target
        val q = math.pow(p, bb)
        val lNeed =
          if (q >= 1.0 || q <= 0.0) 1
          else math.ceil(math.log(0.05) / math.log(1.0 - q)).toInt
        (math.max(1, math.min(lNeed, 64 / bb)), bb)
      case _ =>
        val l = Seq(2, 4, 8, 16)
          .minBy(l => (l.toDouble / math.pow(2, bitsFor(l)), -l))
        (l, bitsFor(l))
    }
  }

  /** Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540 —
    * public method): k-means the embedding space into `nClusters` cells,
    * verify cosine similarity exactly WITHIN each cell, and greedily drop
    * every vector that has a lower-id cell-mate at cosine ≥ `minSim`.
    * Output: one row per DROPPED vector — (vec_id, keeper_id = the lowest
    * such cell-mate, cos_sim to that keeper, cell). The min-id keeper
    * convention matches exact dedup (d1/d20); a keeper may itself be
    * dropped by a still-lower id (greedy chain, the paper's semantics) —
    * callers needing full transitive groups feed the pair relation to
    * [[graft.operators.Dedup.connectedComponents]] instead.
    *
    * Scale shape: the quantizer trains on a capped layout-invariant
    * sample ([[trainIvfCentroids]] — seeded-hash draw, deterministic
    * Lloyd's); assignment is one broadcast-centroid scan
    * ([[assignCells]]); candidate generation is a cell-keyed self-
    * EQUIJOIN, never all-pairs — O(Σ cell²) = O(n·avgCell) exact cosine
    * work, and `nClusters` scales as n/targetCellSize so avgCell stays a
    * constant (the paper runs 50k clusters over LAION). Every emitted
    * pair is exactly verified, so within-cell precision is 1 by
    * construction; recall is the probability both near-dups quantize to
    * the same cell — ≈ 1 for true duplicates (distance ≪ cell radius),
    * and pinned for planted dups + density-banded on the real corpus in
    * DedupSimilaritySpec. Rows-only in the oracle gate: the cells are an
    * engine-local k-means artifact no SQL engine reproduces.
    *
    * HOT-CELL BOUND (r20): a pathological cell — a boilerplate-heavy
    * crawl region the quantizer under-segments — makes the within-cell
    * self-join O(cell²) no matter how AQE splits the join's output
    * partitions, because the PAIR-GENERATION work itself is quadratic.
    * Past `hotCellThreshold` rows in one cell, candidate generation for
    * that cell switches to an OR-amplified LSH sub-shard: `shardBands`
    * independent `shardBits`-bit hyperplane bands ([[lshTopK]]'s native
    * [[graft.functions.HyperplaneBits]]) are appended to the join key,
    * so one hot cell becomes up to 2^shardBits sub-buckets per band and
    * a pair is a candidate iff it collides in ≥ 1 band (candidates are
    * deduped before the exact cosine, the lshTopK shape). Recall
    * argument: a pair at cosine s collides in one b-bit band w.p.
    * p^b, p = 1 − arccos(s)/π, so it survives ≥ 1 of L bands w.p.
    * 1 − (1−p^b)^L — (L, b) are auto-selected per minSim by
    * [[shardPlan]] to hold that ≥ 0.95 AT the threshold while
    * maximizing the split (minSim 0.99 → L=4 × b=13), and → 1 as
    * s → 1 (true duplicates: p → 1, every band collides). A dropped
    * vector with MANY qualifying keepers only
    * needs one surviving pair, so drop-recall is higher still; the
    * keeper ID may differ from the unbanded result when the lowest
    * cell-mate's pair is the one band-missed (approximate contract,
    * same as cell-assignment recall). Work bound: sub-bucket sizes are
    * cell·p̂^b in expectation where p̂ reflects the cell's DIRECTION
    * diversity — under-segmented (diverse) hot cells shatter toward
    * cell²/2^b · L pair work, and the pairs pruned are exactly the
    * low-cosine ones exact verification would reject. The residual
    * worst case — a cell of GENUINELY mutual near-identical vectors —
    * cannot be sub-sharded by any similarity-preserving key (all rows
    * collide in every band because they ARE near-dups); that mass is
    * what exact dedup (d1/d20) removes BEFORE semantic dedup in the
    * pipeline ordering, which is why the paper's corpus is
    * exact-deduped first. Fixture-scale calls (every cell ≤ threshold)
    * take today's plan unchanged — the hot path costs one cell-count
    * aggregate over the already-checkpointed assignment.
    *
    * Output contract for malformed vectors: rows [[indexable]] excludes
    * (NULL / empty / null-element embeddings) and rows whose LENGTH
    * differs from the quantizer dimension (NULL cell from
    * [[assignCells]]) are never considered duplicates and never appear
    * in the output — they are quarantine material for the caller's
    * validation pass, not dedup evidence. */
  def semanticDedup(embeddings: DataFrame, nClusters: Int, minSim: Double,
                    seed: Long = 42L,
                    precomputedCentroids: Option[Array[Array[Double]]] = None,
                    hotCellThreshold: Int = 100000,
                    shardBands: Int = 0, shardBits: Int = 0): DataFrame = {
    require(hotCellThreshold >= 2, "hotCellThreshold must be >= 2")
    val (bands, bits) = shardPlan(minSim, shardBands, shardBits)
    require(bands >= 1 && bits >= 1 && bands * bits <= 64,
      s"need 1 <= shardBands·shardBits <= 64 (one long of sign bits), " +
        s"got $bands × $bits")
    val spark = embeddings.sparkSession
    val corpus = indexable(embeddings)
    val centroids = precomputedCentroids.getOrElse(
      trainIvfCentroids(embeddings, nClusters, seed))
    require(centroids.length == nClusters,
      s"expected $nClusters centroids, got ${centroids.length}")
    val assigned = assignCells(corpus, centroids)
    // bounded by nClusters rows; one cheap aggregate over the
    // checkpointed assignment
    val hotCells: Set[Int] = assigned.where(col("cell").isNotNull)
      .groupBy(col("cell")).agg(count(lit(1)).as("__n"))
      .where(col("__n") > hotCellThreshold)
      .collect().map(_.getInt(0)).toSet
    def exactPairs(rel: DataFrame): DataFrame =
      rel.select(col("cell"), col("vec_id").as("id_a"),
          col("embedding").as("q_emb"))
        .join(rel.select(col("cell"), col("vec_id").as("id_b"),
          col("embedding").as("n_emb")), "cell")
        .filter(col("id_a") < col("id_b"))
        .select(col("cell"), col("id_a"), col("id_b"),
          Features.pround(cosineExprIn(Some(spark), "q_emb", "n_emb"), 6)
            .as("cos_sim"))
    val pairs =
      if (hotCells.isEmpty) exactPairs(assigned)
      else {
        val cold = assigned.where(col("cell").isNotNull &&
          !col("cell").isInCollection(hotCells))
        val hot = assigned.where(col("cell").isInCollection(hotCells))
          .localCheckpoint(true)
        // one fused HyperplaneBits scan → L band ids per row (long-coded
        // band index << 32 | bucket bits); slim (cell, band, vec_id)
        // relation, candidates deduped BEFORE the exact cosine — the
        // lshTopK shape. Checkpointed: it feeds both sides of the
        // band-keyed self-join (no CSE across self-joins).
        val dim = centroids(0).length
        val allPlanes: Seq[Seq[Double]] = (0 until bands).flatMap { t =>
          val rng = new scala.util.Random(seed + 1000003L * (t + 1))
          Seq.fill(bits)(Seq.fill(dim)(rng.nextGaussian()))
        }
        val bitsCol = org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.HyperplaneBits(
            org.apache.spark.sql.GraftColumnBridge.expression(col("embedding")),
            allPlanes))
        val mask = (1L << bits) - 1L
        val bandCols = (0 until bands).map(t =>
          s"${t.toLong << 32}L + (shiftrightunsigned(__bits, ${t * bits}) & ${mask}L)")
        val banded = hot
          .withColumn("__bits", bitsCol)
          .select(col("cell"), col("vec_id"),
            explode(expr(bandCols.mkString("array(", ", ", ")"))).as("band"))
          .localCheckpoint(true)
        val candPairs = banded
          .select(col("cell"), col("band"), col("vec_id").as("id_a"))
          .join(banded.select(col("cell"), col("band"),
            col("vec_id").as("id_b")), Seq("cell", "band"))
          .filter(col("id_a") < col("id_b"))
          .select(col("cell"), col("id_a"), col("id_b")).distinct()
        val hotPairs = candPairs
          .join(hot.select(col("vec_id").as("id_a"), col("embedding").as("q_emb")), "id_a")
          .join(hot.select(col("vec_id").as("id_b"), col("embedding").as("n_emb")), "id_b")
          .select(col("cell"), col("id_a"), col("id_b"),
            Features.pround(cosineExprIn(Some(spark), "q_emb", "n_emb"), 6)
              .as("cos_sim"))
        exactPairs(cold).unionByName(hotPairs)
      }
    pairs
      .filter(col("cos_sim") >= minSim)
      .groupBy(col("id_b"))
      // keeper = lexicographic struct min = lowest id_a (ids are distinct
      // within a group, so the struct min is total and deterministic);
      // cell is constant per id_b (one cell per vector) — min() only to
      // keep the aggregate order-insensitive
      .agg(min(struct(col("id_a"), col("cos_sim"))).as("__m"),
        min(col("cell")).as("cell"))
      .select(col("id_b").as("vec_id"), col("__m.id_a").as("keeper_id"),
        col("__m.cos_sim").as("cos_sim"), col("cell"))
      .orderBy(col("vec_id"))
  }

  /** Persist a trained IVF quantizer as a (cell, centroid) parquet table —
    * the index artifact a production deployment builds at ingest and ships
    * to query time. */
  def saveIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   centroids: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a persisted IVF quantizer (inverse of [[saveIvfIndex]]). */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): Array[Array[Double]] =
    // schema-cached read (Tables.cachedRead, r21): artifact loads paid
    // ~80 ms of per-call schema inference; (session, path, mtime)-keyed,
    // so a rewritten artifact re-infers
    graft.Tables.cachedRead(spark, path)
      .orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)

  /** D4 scale path #2 — IVF (inverted-file) approximate nearest neighbors:
    * a k-means coarse quantizer partitions the corpus into `nLists`
    * cells; a query probes its `nProbe` nearest centroids and re-ranks
    * exactly only within those cells.
    *
    * Scale shape: centroid training samples the corpus (KMeans over a
    * capped sample), assignment is one broadcast-centroid scan, and the
    * probe join shuffles candidates by cell id — O(rows·nProbe/nLists)
    * exact distance work instead of O(rows·queries). Complements
    * [[lshTopK]]: IVF adapts to the data distribution where LSH is
    * data-oblivious. */
  def ivfTopK(embeddings: DataFrame, nQueries: Int, k: Int,
              nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
              precomputedCentroids: Option[Array[Array[Double]]] = None): DataFrame = {
    val spark = embeddings.sparkSession
    val corpus = indexable(embeddings)
    // quantizer trains on a capped sample — at corpus scale nobody k-means
    // the full table; centroid quality converges long before full coverage.
    // The sample is bounded (10k × dim doubles ≈ MBs), so Lloyd's runs on
    // the driver in milliseconds where a distributed fit pays multiple
    // job launches per iteration for no extra quality. In production the
    // quantizer is built ONCE and reused across queries — pass
    // `precomputedCentroids` (from [[trainIvfCentroids]]) to skip the
    // rebuild; the self-training form remains for the declared query.
    val centroids = precomputedCentroids.getOrElse(
      trainIvfCentroids(embeddings, nLists, seed))
    require(centroids.length == nLists,
      s"expected $nLists centroids, got ${centroids.length}")
    // assignment: one codegen'd scan (see [[assignCells]]). localCheckpoint
    // — the assigned relation is scanned three times below (query collect,
    // query-embedding lookup, candidate join); materialize once, lineage
    // truncated, blocks GC-tracked (no cache-manager leak)
    val assigned = assignCells(corpus, centroids)
    // queries probe their nProbe nearest centroids (tiny driver-side math
    // over nQueries × nLists — the centroid table is the "index")
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .collect()
    import spark.implicits._
    val probes = queries.flatMap { r =>
      val q = toDoubleArray(r.getSeq[Any](1))
      val byDist = centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < math.min(q.length, c.length)) { val t = q(j) - c(j); d += t * t; j += 1 }
        (i, d)
      }.sortBy(_._2).take(nProbe).map(_._1)
      byDist.map(cell => (r.getLong(0), cell))
    }.toSeq.toDF("query_id", "cell")
    val qEmb = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cands = assigned
      .select(col("vec_id").as("nbr_id"), col("embedding").as("n_emb"), col("cell"))
      .join(broadcast(probes), "cell")
      .filter(col("nbr_id") =!= col("query_id"))
      .join(broadcast(qEmb), "query_id")
      .select(col("query_id"), col("nbr_id"),
        Features.pround(cosineExprIn(Some(spark), "q_emb", "n_emb"), 6).as("cos_sim"))
    topKPerQuery(cands, k)
  }

  /** Per-group embedding centroids via the custom [[graft.functions.VectorAvg]]
    * aggregate — ONE pass with map-side partial aggregation (the composed
    * posexplode → groupBy(idx) → avg alternative shuffles one row per
    * vector ELEMENT). Emitted long-form (cluster, idx, avg_val) for the
    * oracle compare; element means are micro-quantized integer sums, so
    * the result is partition-layout independent. */
  def embeddingCentroids(embeddings: DataFrame, nClusters: Int = 8): DataFrame = {
    val vecAvg = udaf(graft.functions.VectorAvg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    embeddings
      .groupBy((col("vec_id") % nClusters).as("cluster"))
      .agg(vecAvg(col("embedding")).as("centroid"), count(lit(1)).as("n_vecs"))
      .select(col("cluster"), col("n_vecs"),
        posexplode(col("centroid")).as(Seq("idx", "avg_val")))
      .select(col("cluster"), col("n_vecs"), col("idx").cast("long").as("idx"),
        col("avg_val"))
      .orderBy(col("cluster"), col("idx"))
  }

  /** Embedding-cosine near-duplicate pairs for a bounded id range: all
    * pairs with cosine ≥ minSim (the embedding-space analog of MinHash
    * dedup; at corpus scale the candidate set comes from [[lshTopK]]'s
    * bucketing instead of the bounded cross join). */
  def embeddingNearDups(embeddings: DataFrame, maxId: Int, minSim: Double): DataFrame = {
    val sub = embeddings.filter(col("vec_id") < maxId)
    val a = sub.select(col("vec_id").as("id_a"), col("embedding").as("q_emb"))
    val b = sub.select(col("vec_id").as("id_b"), col("embedding").as("n_emb"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Features.pround(cosineExprIn(Some(embeddings.sparkSession), "q_emb", "n_emb"), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minSim)
      .orderBy(col("id_a"), col("id_b"))
  }

  // ------------------------------------------------------------------
  // Product quantization (D4's memory-bounded scale path — Jégou et al.
  // 2011, "Product Quantization for Nearest Neighbor Search", IEEE
  // TPAMI; the FAISS IVFADC family — public methods).
  //
  // Why it exists at 100 TB: LSH ([[lshTopK]]) and IVF ([[ivfTopK]])
  // shrink the ROWS a query touches; PQ shrinks the BYTES PER ROW —
  // a dim-64 float vector (256 B) becomes m code bytes (8 B at m=8,
  // 32× compression), so the scanned index fits in memory/page cache
  // where the raw vectors cannot. Search is ASYMMETRIC distance
  // computation (ADC): the query stays exact; each of its m subvectors
  // precomputes a ksub-entry lookup table of squared-L2 distances to
  // that subspace's codebook, and a corpus row's distance is the sum of
  // m table lookups — no float vector is ever fetched.
  // ------------------------------------------------------------------

  /** Train PQ codebooks: the vector is split into `m` equal subspaces
    * and each gets its own `ksub`-centroid k-means codebook (trained on
    * the same seeded-hash layout-invariant draw as
    * [[trainIvfCentroids]], one sample shared by all subspaces; seeds
    * differ per subspace so codebooks are independent). `ksub` ≤ 256 so
    * a code is one byte. Returns codebooks(sub)(code) = centroid.
    *
    * Parameter note (measured on the real fixture, round 18): the
    * declared m=16 / ksub=64 (16 bytes/vector, 16× compression at
    * dim 64) recovers 16/20 exact-L2 top-1 neighbors at k=5 with mean
    * relative ADC distance error 0.11 — versus 5/20 and 0.36 at
    * m=8/ksub=16. iid-uniform fixtures are PQ's worst case (distances
    * concentrate, so neighbor ORDER is noise-dominated even when
    * distances are well-approximated); real embedding corpora cluster
    * and quantize better. At fixture scale a 256-code book would train
    * ~2 points/centroid (the starved regime the loud require guards);
    * production uses ksub=256 with the sample auto-scaling to 20·ksub —
    * same code path. */
  def trainPqCodebooks(embeddings: DataFrame, dim: Int, m: Int = 16,
                       ksub: Int = 64,
                       seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 2 && ksub <= 256,
      s"need 1 <= m and 2 <= ksub <= 256 (byte codes), got m=$m ksub=$ksub")
    require(dim % m == 0, s"PQ subspaces must tile the vector: dim=$dim, m=$m")
    val subDim = dim / m
    val sample: Array[Array[Double]] = trainable(embeddings)
      .where(size(col("embedding")) === dim) // codes are dim-fixed by contract
      .select(col("embedding"), xxhash64(col("vec_id"), lit(seed)).as("__draw"))
      .orderBy(col("__draw"), col("vec_id"))
      .limit(trainSampleTarget(ksub).toInt)
      .select(col("embedding")).collect()
      .map(r => toDoubleArray(r.getSeq[Any](0)))
    trainSubspacesParallel(embeddings.sparkSession, m, s => {
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      kmeansLloyd(pts, ksub, iters = 5, seed + s)
    })
  }

  /** Runs the m INDEPENDENT per-subspace k-means trainings concurrently
    * (r20 optimization; guide §1.2 "per-task work"): the driver-knee
    * codebook build was the dominant fixed cost of every self-training
    * PQ query — m=16 sequential kmeansLloyd calls ≈ m·sample·ksub·subDim
    * ·iters distance ops on ONE core while the whole worker pool idles
    * between Spark jobs. Each subspace trains on its own slice with its
    * own seed and writes its own output slot, so the result is
    * bit-identical to the sequential loop under any interleaving. Plain
    * threads, not an execution context: bounded by m (≤ 16 at every
    * declared call), no shared pool to starve Spark's own machinery. */
  private def trainSubspacesParallel(spark: org.apache.spark.sql.SparkSession,
      m: Int,
      train: Int => Array[Array[Double]]): Array[Array[Array[Double]]] = {
    val out = new Array[Array[Array[Double]]](m)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // width bounded by the session's core budget (not a free-for-all m
    // threads): a local[k] session declares k-way compute, and raw JVM
    // threads beyond it would silently exceed that budget — the result
    // is identical at any width, only the wall changes
    val width = math.max(1, math.min(m, spark.sparkContext.defaultParallelism))
    val queue = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until width).map { w =>
      val t = new Thread(() =>
        try {
          var s = queue.getAndIncrement()
          while (s < m) { out(s) = train(s); s = queue.getAndIncrement() }
        } catch { case e: Throwable => errs.add(e) },
        s"graft-pq-train-$w")
      t.start(); t
    }
    threads.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
    out
  }

  /** Fail fast on a persisted codebook that does not tile the caller's
    * vector dimension — without this, a mismatched artifact silently
    * NULL-quarantines EVERY vector (empty result, no error) when the
    * implied dim is smaller, and [[adcLuts]] indexes query subvectors
    * out of bounds when it is larger. Mirrors [[trainPqCodebooks]]'
    * `dim % m == 0` require on the training side. */
  private def requireBooksTile(books: Array[Array[Array[Double]]],
                               dim: Int): Unit = {
    require(books.nonEmpty && books.forall(_.nonEmpty),
      "PQ codebooks are empty — corrupt or unwritten index artifact")
    val subDim = books(0)(0).length
    require(books.forall(_.forall(_.length == subDim)),
      s"PQ codebooks are ragged (expected every codeword at subDim=$subDim) " +
        "— corrupt index artifact")
    require(books.length * subDim == dim,
      s"PQ codebooks (m=${books.length} × subDim=$subDim = " +
        s"${books.length * subDim}) do not tile dim=$dim — wrong persisted " +
        "artifact for this corpus")
  }

  /** Validate a codes relation (self-encoded or a loaded [[savePqCodes]]
    * artifact) and project it to the scoring kernels' (vec_id, codes)
    * shape BY NAME — the persisted artifact may carry extra columns
    * (`cell`, from the IVF build) in any order, so a positional
    * `getAs[Array[Byte]](1)` on the raw relation is a ClassCastException
    * waiting to happen. Loud-failure contract mirrors
    * [[requireBooksTile]]: a codes relation without the expected
    * columns/types is a wrong or corrupt index artifact, never a silent
    * quarantine. Code WIDTH (the one encoding-compatibility signal the
    * bytes carry — codes must have exactly m = books.length entries) is
    * checked per row inside each scoring kernel (a closure-local check —
    * codes encoded with m' ≠ m codebooks would otherwise AIOOBE or
    * silently sum a prefix); codebook-VALUE compatibility is the
    * caller's artifact-management contract (load books and codes from
    * the same build). */
  private def requireCodesRelation(codes: DataFrame,
                                   extraCols: String*): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType}
    val schema = codes.schema
    def field(name: String) = schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"codes relation has no '$name' column (found " +
          s"${schema.fieldNames.mkString(", ")}) — wrong persisted artifact"))
    require(field("vec_id").dataType == LongType,
      s"codes relation 'vec_id' must be BIGINT, got ${field("vec_id").dataType.simpleString}")
    require(field("codes").dataType == BinaryType,
      s"codes relation 'codes' must be BINARY (pqEncode output), got " +
        s"${field("codes").dataType.simpleString} — wrong persisted artifact")
    extraCols.foreach(field)
    codes.select(col("vec_id") +: col("codes") +: extraCols.map(col): _*)
  }

  /** Encode each vector as its m nearest-codebook-centroid bytes — the
    * persisted PQ index relation (vec_id, [carry...,] codes BINARY).
    * One broadcast-codebook scan (the [[assignCellsBroadcast]] kernel
    * shape — O(1) plan size in m·ksub); argmin keeps the first minimum
    * with NaN ordered greatest (Double.compare), matching every other
    * assignment kernel here. A vector whose length differs from the
    * codebook dim gets NULL codes (quarantine, the [[semanticDedup]]
    * malformed-vector contract). `carry` propagates extra columns
    * (e.g. the IVF cell) through the one scan instead of re-joining.
    *
    * `materialize` (default true — the ingest-time index build) eagerly
    * checkpoints the encoded relation so downstream consumers scan
    * codes, never lineage; the single-pass query paths ([[pqTopK]]/
    * [[ivfPqTopK]] self-encode) pass false — they scan the relation
    * exactly once, so a checkpoint would only accumulate block-manager
    * storage across repeated queries in a long-lived session (the
    * production shape persists codes ONCE via [[savePqCodes]] and
    * queries pass `precomputedCodes` instead of re-encoding at all).
    *
    * `residualOf = (cellCol, coarse)` encodes the IVFADC
    * `by_residual=true` form: the kernel subtracts the row's coarse
    * centroid `coarse(row(cellCol))` from the vector before coding, so
    * codes quantize the (smaller-variance) cell residual rather than
    * the raw vector — Jégou et al. 2011 §IV. A NULL cell quarantines
    * as NULL codes, same as a wrong-length vector. */
  def pqEncode(vectors: DataFrame, codebooks: Array[Array[Array[Double]]],
               carry: Seq[String] = Nil,
               materialize: Boolean = true,
               residualOf: Option[(String, Array[Array[Double]])] = None): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    val spark = vectors.sparkSession
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    val dim = m * subDim
    requireBooksTile(codebooks, dim)
    residualOf.foreach { case (cellCol, coarse) =>
      require(carry.contains(cellCol),
        s"residual coding needs the cell column '$cellCol' carried through the scan")
      require(coarse.forall(_.length == dim),
        s"coarse centroids must match the codebook dim $dim for residual coding")
    }
    val base = vectors.select((col("vec_id") +: carry.map(col) :+ col("embedding")): _*)
    val cellIdx = residualOf.map { case (cellCol, _) => 1 + carry.indexOf(cellCol) }
    val bc = spark.sparkContext.broadcast((codebooks, residualOf.map(_._2)))
    val schema = StructType(
      base.schema.fields.dropRight(1) :+ StructField("codes", BinaryType, nullable = true))
    val out = base.rdd.mapPartitions { it =>
      val (books, coarseOpt) = bc.value
      it.map { r =>
        val embIdx = r.length - 1
        val emb = r.getSeq[Number](embIdx)
        val cellOk = cellIdx.forall(ci => !r.isNullAt(ci))
        val codes: Any =
          if (emb == null || emb.length != dim || !cellOk) null
          else {
            val x = new Array[Double](dim)
            var j = 0
            while (j < dim) { x(j) = emb(j).doubleValue(); j += 1 }
            cellIdx.foreach { ci =>
              val c = coarseOpt.get(r.get(ci).asInstanceOf[Number].intValue())
              var j2 = 0
              while (j2 < dim) { x(j2) -= c(j2); j2 += 1 }
            }
            val cs = new Array[Byte](m)
            var s = 0
            while (s < m) {
              val book = books(s)
              val off = s * subDim
              var best = 0
              var bestD = Double.MaxValue
              var c = 0
              while (c < book.length) {
                var d = 0.0; var j2 = 0
                while (j2 < subDim) { val t = x(off + j2) - book(c)(j2); d += t * t; j2 += 1 }
                if (java.lang.Double.compare(d, bestD) < 0) { best = c; bestD = d }
                c += 1
              }
              cs(s) = best.toByte
              s += 1
            }
            cs
          }
        Row.fromSeq(Seq.tabulate(embIdx)(r.get) :+ codes)
      }
    }
    val df = spark.createDataFrame(out, schema)
    if (materialize) df.localCheckpoint(true) else df
  }

  /** D4 scale path #3 — PQ/ADC approximate top-k: the whole corpus is
    * scanned as m-byte codes (never raw vectors); each bounded query
    * precomputes its m×ksub squared-L2 lookup tables on the driver and
    * a row's distance is the sum of m lookups in fixed subspace order
    * (deterministic, layout-invariant). Output ranks ASCENDING approx
    * distance (adc_dist), ties to nbr_id — the salted two-phase rank.
    * Compose with IVF via [[ivfPqTopK]] to also shrink the ROWS. */
  def pqTopK(embeddings: DataFrame, dim: Int, nQueries: Int, k: Int,
             m: Int = 16, ksub: Int = 64, seed: Long = 42L,
             precomputedCodebooks: Option[Array[Array[Array[Double]]]] = None,
             precomputedCodes: Option[DataFrame] = None): DataFrame = {
    val spark = embeddings.sparkSession
    val books = precomputedCodebooks.getOrElse(
      trainPqCodebooks(embeddings, dim, m, ksub, seed))
    requireBooksTile(books, dim)
    // production: codes are built ONCE at ingest (pqEncode +
    // [[savePqCodes]]) and passed in — repeated queries then scan the
    // persisted 16-byte-per-vector relation without re-encoding the
    // corpus or accumulating per-call checkpoints; the self-encode form
    // (materialize=false — scanned exactly once, nothing persisted)
    // remains for the declared query
    val encoded = requireCodesRelation(precomputedCodes.getOrElse(
      pqEncode(indexable(embeddings), books, materialize = false)))
    val luts = adcLuts(embeddings, dim, nQueries, books)
    lutScanTopK(spark, encoded, luts, k, books.length, "adc_dist")
  }

  /** D4 scale path #3b — PQ/SDC (symmetric distance computation, Jégou
    * et al. 2011 §III.B): the QUERY is represented by its m-byte codes
    * too, and distance is the sum of m codebook-to-codebook subspace
    * distances — d(q, x) ≈ Σ_s ‖c(qcode_s) − c(xcode_s)‖². The per-query
    * lookup table is a ROW of the precomputed m × ksub × ksub
    * codeword-pair distance tables (driver-built once from the
    * codebooks alone — m·ksub²·subDim flops, ~1M at the defaults), so
    * query time needs NO raw vectors at all: the published SDC
    * trade-off — one extra quantization error on the query side (lower
    * accuracy than ADC at the same byte budget, pinned by the spec's
    * SDC-vs-ADC comparison) in exchange for querying straight from the
    * persisted codes artifact (index-to-index joins, raw-vector-free
    * re-ranking). Same heap-inside-the-scan kernel, same salted
    * two-phase rank; output column `sdc_dist`. */
  def pqTopKSDC(embeddings: DataFrame, dim: Int, nQueries: Int, k: Int,
                m: Int = 16, ksub: Int = 64, seed: Long = 42L,
                precomputedCodebooks: Option[Array[Array[Array[Double]]]] = None,
                precomputedCodes: Option[DataFrame] = None): DataFrame = {
    val spark = embeddings.sparkSession
    val books = precomputedCodebooks.getOrElse(
      trainPqCodebooks(embeddings, dim, m, ksub, seed))
    requireBooksTile(books, dim)
    val mBooks = books.length
    val subDim = books(0)(0).length
    val encoded = requireCodesRelation(precomputedCodes.getOrElse(
      pqEncode(indexable(embeddings), books, materialize = false)))
    // m × ksub × ksub codeword-pair tables — from the codebooks alone
    val pairTables: Array[Array[Array[Double]]] = books.map { book =>
      Array.tabulate(book.length) { i =>
        Array.tabulate(book.length) { j =>
          var d = 0.0; var t = 0
          while (t < subDim) { val x = book(i)(t) - book(j)(t); d += x * x; t += 1 }
          d
        }
      }
    }
    // bounded query side: the queries' CODES (nQueries × m bytes); their
    // per-query LUT is the qcode-indexed row of each pair table.
    // r20 optimization (guide §1.2): on the self-encode path this collect
    // previously read `encoded` — whose RDD-kernel boundary blocks the
    // vec_id filter from reaching the scan — so the WHOLE corpus was
    // encoded twice per query (once here, once in the scan). Encoding
    // the bounded query slice directly is per-row identical (pqEncode is
    // deterministic per row) and O(nQueries); a supplied codes artifact
    // is still read as-is — its codes ARE the index, not re-derivable.
    val qSide = precomputedCodes.map(_ => encoded).getOrElse(
      requireCodesRelation(pqEncode(
        indexable(embeddings).where(col("vec_id") < nQueries),
        books, materialize = false)))
    val qCodes: Array[(Long, Array[Byte])] = qSide
      .where(col("vec_id") < nQueries && col("codes").isNotNull)
      .orderBy(col("vec_id"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("codes"))
    val luts: Array[(Long, Array[Array[Double]])] = qCodes.map { case (qid, qc) =>
      if (qc.length != mBooks) throw new IllegalArgumentException(
        s"PQ codes row has ${qc.length} bytes but the supplied codebooks " +
          s"have m=$mBooks subspaces — codes encoded with different codebooks")
      qid -> Array.tabulate(mBooks)(s => pairTables(s)(qc(s) & 0xff))
    }
    lutScanTopK(spark, encoded, luts, k, mBooks, "sdc_dist")
  }

  /** Shared scoring kernel for the codes-scan top-k family ([[pqTopK]],
    * [[pqTopKSDC]]): one pass over the persisted m-byte codes with the
    * bounded per-query LUTs broadcast and the top-k heap INSIDE the
    * kernel. */
  private def lutScanTopK(spark: org.apache.spark.sql.SparkSession,
                          encoded: DataFrame,
                          luts: Array[(Long, Array[Array[Double]])],
                          k: Int, mWidth: Int, scoreCol: String): DataFrame = {
    val bc = spark.sparkContext.broadcast(luts)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("query_id", LongType, nullable = false),
      StructField("nbr_id", LongType, nullable = false),
      StructField("__d", DoubleType, nullable = false)))
    // the bounded selection lives INSIDE the scoring kernel: a flatMap
    // emitting one Row per (corpus row, query) materializes
    // |corpus|·|queries| Row objects (50M at the 250k×200 probe) of
    // which only partitions·q·k survive the rank — measured r19, that
    // allocation dominated the whole query (25 s vs 5 s for this form).
    // Selection order is (pround(d, 6) asc, nbr_id asc) — the EXACT
    // total order the downstream rank uses (pr6 reproduces
    // Features.pround's IEEE sequence: mult, add, floor, divide; NaN/Inf
    // pass through identically), so the global top-k is contained in
    // the per-partition survivors and the result is bit-identical.
    val kk = k
    val scored = encoded.where(col("codes").isNotNull).rdd.mapPartitions { it =>
      val qsArr = bc.value
      val nq = qsArr.length
      def checkWidth(c: Array[Byte]): Array[Byte] = {
        if (c.length != mWidth) throw new IllegalArgumentException(
          s"PQ codes row has ${c.length} bytes but the supplied codebooks " +
            s"have m=$mWidth subspaces — codes encoded with different codebooks")
        c
      }
      def pr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
      def better(da: Double, ia: Long, db: Double, ib: Long): Boolean = {
        val pa = pr6(da); val pb = pr6(db)
        val c = if (pa == pb) 0 else java.lang.Double.compare(pa, pb)
        if (c != 0) c < 0 else ia < ib
      }
      final case class Cand(d: Double, id: Long)
      val worstFirst = new java.util.Comparator[Cand] {
        def compare(a: Cand, b: Cand): Int =
          if (better(a.d, a.id, b.d, b.id)) 1
          else if (better(b.d, b.id, a.d, a.id)) -1
          else 0
      }
      val heaps = Array.fill(nq)(
        new java.util.PriorityQueue[Cand](kk + 1, worstFirst))
      it.foreach { r =>
        // positions fixed by requireCodesRelation's named projection
        val id = r.getLong(0)
        val codes = checkWidth(r.getAs[Array[Byte]](1))
        var qi = 0
        while (qi < nq) {
          if (qsArr(qi)._1 != id) {
            val lut = qsArr(qi)._2
            var d = 0.0; var s = 0
            while (s < lut.length) { d += lut(s)(codes(s) & 0xff); s += 1 }
            val h = heaps(qi)
            if (h.size < kk) h.add(Cand(d, id))
            else {
              val w = h.peek()
              if (better(d, id, w.d, w.id)) { h.poll(); h.add(Cand(d, id)) }
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        val qid = qsArr(qi)._1
        scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala
          .map(c => Row(qid, c.id, c.d))
      }
    }
    topKPerQuery(
      spark.createDataFrame(scored, schema)
        .select(col("query_id"), col("nbr_id"),
          Features.pround(col("__d"), 6).as(scoreCol)),
      k, scoreCol = scoreCol, ascending = true)
  }

  /** D4 scale path #4 — IVF-PQ (IVFADC, `by_residual=false` — the
    * documented FAISS simplification where codes quantize the raw
    * vector, not the cell residual): the coarse quantizer shrinks the
    * ROWS a query touches (nProbe/nLists of the corpus), PQ shrinks
    * the BYTES per touched row to m codes. One scan builds the index —
    * [[assignCells]] for the cell, [[pqEncode]] carrying it through —
    * and the probe join is cell-keyed exactly like [[ivfTopK]]. */
  def ivfPqTopK(embeddings: DataFrame, dim: Int, nQueries: Int, k: Int,
                nLists: Int = 16, nProbe: Int = 4, m: Int = 16, ksub: Int = 64,
                seed: Long = 42L,
                precomputedCentroids: Option[Array[Array[Double]]] = None,
                precomputedCodebooks: Option[Array[Array[Array[Double]]]] = None,
                precomputedCodes: Option[DataFrame] = None,
                byResidual: Boolean = false): DataFrame = {
    val spark = embeddings.sparkSession
    val corpus = indexable(embeddings)
    // production shape: quantizers AND codes are built ONCE at ingest
    // (saveIvfIndex/savePqCodebooks/savePqCodes) and passed in; the
    // self-training form remains for the declared query. With
    // byResidual, precomputedCodes must have been encoded with
    // `residualOf` against the SAME coarse quantizer.
    val coarse = precomputedCentroids.getOrElse(
      trainIvfCentroids(embeddings, nLists, seed))
    require(coarse.length == nLists,
      s"expected $nLists coarse centroids, got ${coarse.length}")
    val books = precomputedCodebooks.getOrElse(
      if (byResidual) trainPqCodebooksResidual(embeddings, coarse, dim, m, ksub, seed)
      else trainPqCodebooks(embeddings, dim, m, ksub, seed))
    requireBooksTile(books, dim)
    val encoded = requireCodesRelation(precomputedCodes.getOrElse(
      pqEncode(assignCells(corpus, coarse), books, carry = Seq("cell"),
        materialize = false,
        residualOf = if (byResidual) Some(("cell", coarse)) else None)), "cell")
    // each query probes its nProbe nearest coarse centroids (driver-side
    // math over nQueries × nLists, same as ivfTopK). The dim filter
    // matches adcLuts': a wrong-length query has no lookup table, so it
    // must not reach the probe join either
    val qEmbRows = corpus.filter(col("vec_id") < nQueries && size(col("embedding")) === dim)
      .select(col("vec_id"), col("embedding")).collect()
    val probePairs: Array[(Long, Int)] = qEmbRows.flatMap { r =>
      val q = toDoubleArray(r.getSeq[Any](1))
      coarse.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < math.min(q.length, c.length)) { val t = q(j) - c(j); d += t * t; j += 1 }
        (i, d)
      }.sortBy(_._2).take(nProbe).map(_._1).map(cell => (r.getLong(0), cell))
    }
    import spark.implicits._
    val probes = probePairs.toSeq.toDF("query_id", "cell")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("query_id", LongType, nullable = false),
      StructField("nbr_id", LongType, nullable = false),
      StructField("__d", DoubleType, nullable = false)))
    val scored =
      if (!byResidual) {
        val lutMap = adcLuts(embeddings, dim, nQueries, books).toMap
        val bc = spark.sparkContext.broadcast(lutMap)
        val cands = encoded.where(col("codes").isNotNull)
          .join(broadcast(probes), "cell")
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("nbr_id"), col("codes"))
        val mWidth = books.length
        cands.rdd.mapPartitions { it =>
          val qs = bc.value
          it.map { r =>
            val lut = qs(r.getLong(0))
            val codes = r.getAs[Array[Byte]](2)
            if (codes.length != mWidth) throw new IllegalArgumentException(
              s"PQ codes row has ${codes.length} bytes but m=$mWidth — codes " +
                "encoded with different codebooks")
            var d = 0.0; var s = 0
            while (s < lut.length) { d += lut(s)(codes(s) & 0xff); s += 1 }
            Row(r.getLong(0), r.getLong(1), d)
          }
        }
      } else {
        // by_residual=true (IVFADC proper, Jégou et al. 2011 §IV): codes
        // quantize (x − coarse(cell)), so the LUT for a (query, probed
        // cell) pair is built from the query RESIDUAL (q − coarse(cell))
        // — nQueries × nProbe tables instead of nQueries, still
        // driver-bounded; the distance is ‖(q−c) − r̂‖², a tighter
        // approximation of ‖q−x‖² because residual variance is
        // cell-local (smaller than raw-vector variance at the same
        // 16-byte code budget)
        // geometry from the BOOKS actually in use (precomputed artifacts
        // may differ from the m training parameter)
        val mBooks = books.length
        val subDim = books(0)(0).length
        val qVecs = qEmbRows.map(r =>
          r.getLong(0) -> toDoubleArray(r.getSeq[Any](1))).toMap
        val lutMap: Map[(Long, Int), Array[Array[Double]]] =
          probePairs.iterator.map { case (qid, cell) =>
            val q = qVecs(qid); val c = coarse(cell)
            val res = new Array[Double](dim)
            var j = 0
            while (j < dim) { res(j) = q(j) - c(j); j += 1 }
            val lut = Array.tabulate(mBooks) { s =>
              val off = s * subDim
              books(s).map { cw =>
                var d = 0.0; var j2 = 0
                while (j2 < subDim) { val t = res(off + j2) - cw(j2); d += t * t; j2 += 1 }
                d
              }
            }
            (qid, cell) -> lut
          }.toMap
        val bc = spark.sparkContext.broadcast(lutMap)
        val cands = encoded.where(col("codes").isNotNull)
          .join(broadcast(probes), "cell")
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("nbr_id"), col("codes"),
            col("cell"))
        cands.rdd.mapPartitions { it =>
          val qs = bc.value
          it.map { r =>
            val lut = qs((r.getLong(0), r.getInt(3)))
            val codes = r.getAs[Array[Byte]](2)
            if (codes.length != mBooks) throw new IllegalArgumentException(
              s"PQ codes row has ${codes.length} bytes but m=$mBooks — codes " +
                "encoded with different codebooks")
            var d = 0.0; var s = 0
            while (s < lut.length) { d += lut(s)(codes(s) & 0xff); s += 1 }
            Row(r.getLong(0), r.getLong(1), d)
          }
        }
      }
    topKPerQuery(
      spark.createDataFrame(scored, schema)
        .select(col("query_id"), col("nbr_id"),
          Features.pround(col("__d"), 6).as("adc_dist")),
      k, scoreCol = "adc_dist", ascending = true)
  }

  /** Train RESIDUAL PQ codebooks (the IVFADC `by_residual=true` form):
    * the same seeded-hash layout-invariant draw as [[trainPqCodebooks]],
    * but each sample vector is first assigned its nearest coarse
    * centroid (driver-side — the sample is bounded at max(10k, 20·ksub)
    * rows × nLists distances) and the codebooks train on the residuals
    * (x − coarse(cell)). Assignment uses the same first-minimum argmin
    * as every kernel here, so a sample vector's training-time cell
    * matches its encode-time cell exactly. */
  def trainPqCodebooksResidual(embeddings: DataFrame,
                               coarse: Array[Array[Double]],
                               dim: Int, m: Int = 16, ksub: Int = 64,
                               seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 2 && ksub <= 256,
      s"need 1 <= m and 2 <= ksub <= 256 (byte codes), got m=$m ksub=$ksub")
    require(dim % m == 0, s"PQ subspaces must tile the vector: dim=$dim, m=$m")
    require(coarse.nonEmpty && coarse.forall(_.length == dim),
      s"coarse centroids must match dim=$dim for residual training")
    val subDim = dim / m
    val sample: Array[Array[Double]] = trainable(embeddings)
      .where(size(col("embedding")) === dim)
      .select(col("embedding"), xxhash64(col("vec_id"), lit(seed)).as("__draw"))
      .orderBy(col("__draw"), col("vec_id"))
      .limit(trainSampleTarget(ksub).toInt)
      .select(col("embedding")).collect()
      .map(r => toDoubleArray(r.getSeq[Any](0)))
    val residuals = sample.map { x =>
      var best = 0; var bestD = Double.MaxValue
      var ci = 0
      while (ci < coarse.length) {
        var d = 0.0; var j = 0
        while (j < dim) { val t = x(j) - coarse(ci)(j); d += t * t; j += 1 }
        if (java.lang.Double.compare(d, bestD) < 0) { best = ci; bestD = d }
        ci += 1
      }
      val r = new Array[Double](dim)
      var j = 0
      while (j < dim) { r(j) = x(j) - coarse(best)(j); j += 1 }
      r
    }
    trainSubspacesParallel(embeddings.sparkSession, m, s => {
      val pts = residuals.map(v =>
        java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      kmeansLloyd(pts, ksub, iters = 5, seed + s)
    })
  }

  /** Streaming-ingest arm of the ANN index lifecycle (the d38
    * incremental-dedup pattern on the embedding side): encode a NEW batch
    * of vectors against the PRECOMPUTED index artifacts — coarse
    * quantizer, PQ codebooks, and the persisted codes corpus — and flag
    * each new vector's near-duplicates in the prior corpus by cell-keyed
    * ADC distance. Designed as the body of a `foreachBatch` sink: the
    * micro-batch is the bounded "query set" (its vectors and LUTs are
    * driver-built, exactly like [[adcLuts]]' bounded-queries contract),
    * the corpus side is scanned as 16-byte code rows narrowed by the
    * probe join, and nothing corpus-side is ever re-encoded.
    *
    * Returns (newCodes, dupPairs):
    *  - `newCodes` — (vec_id, cell, codes), the batch's index rows,
    *    materialized; append them to the persisted relation (the
    *    [[savePqCodes]] artifact) to advance the corpus snapshot;
    *  - `dupPairs` — (new_id, corpus_id, adc_dist) for every corpus code
    *    within `maxAdcDist` of a new vector in its probed cells —
    *    ascending-distance evidence, exact-verify downstream if the
    *    ingest policy needs certainty (ADC is approximate by design; an
    *    EXACT copy of a corpus vector always surfaces at its
    *    quantization-floor distance because codes coincide). Pairs where
    *    `new_id == corpus_id` are NOT excluded: the batch and corpus are
    *    different relations, so an id-equal pair is either a replay of
    *    the same vector (surfaces at the quantization floor) or an id
    *    collision with CHANGED content (surfaces at a larger distance) —
    *    both are exactly the events an ingest dedup exists to catch, and
    *    a cross-relation id filter would silently hide them (r19 advice).
    *
    * `corpusCodes` must be coded with the SAME books and coarse
    * quantizer — and with the SAME coding axis as the `byResidual` flag:
    * raw-coded corpus ↔ `byResidual=false`, residual-coded corpus
    * (pqEncode `residualOf`) ↔ `byResidual=true`. Same
    * artifact-compatibility contract as [[ivfPqTopK]]'s
    * precomputedCodes; with `byResidual` the per-(vector, probed-cell)
    * residual LUTs mirror [[ivfPqTopK]]'s IVFADC branch (d67), and the
    * exact-replay invariant still holds — identical content encodes to
    * identical residual codes in the same cell, so it surfaces at the
    * quantization floor. */
  def incrementalVectorIngest(newVecs: DataFrame, dim: Int,
                              coarse: Array[Array[Double]],
                              books: Array[Array[Array[Double]]],
                              corpusCodes: DataFrame,
                              maxAdcDist: Double,
                              nProbe: Int = 4,
                              byResidual: Boolean = false): (DataFrame, DataFrame) = {
    requireBooksTile(books, dim)
    require(coarse.nonEmpty && coarse.forall(_.length == dim),
      s"coarse centroids must match dim=$dim")
    val spark = newVecs.sparkSession
    val m = books.length
    val subDim = books(0)(0).length
    val newAssigned = assignCells(indexable(newVecs), coarse)
    val newCodes = pqEncode(newAssigned, books, carry = Seq("cell"),
      residualOf = if (byResidual) Some(("cell", coarse)) else None)
    // the batch is the bounded query side: probes + LUTs driver-built
    val batchRows = newAssigned.where(size(col("embedding")) === dim)
      .select(col("vec_id"), col("embedding")).collect()
    val probePairs: Array[(Long, Int)] = batchRows.flatMap { r =>
      val q = toDoubleArray(r.getSeq[Any](1))
      coarse.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < dim) { val t = q(j) - c(j); d += t * t; j += 1 }
        (i, d)
      }.sortBy(_._2).take(nProbe).map(_._1).map(cell => (r.getLong(0), cell))
    }
    import spark.implicits._
    val probes = probePairs.toSeq.toDF("new_id", "cell")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("new_id", LongType, nullable = false),
      StructField("corpus_id", LongType, nullable = false),
      StructField("__d", DoubleType, nullable = false)))
    val mWidth = m
    def lutFor(vec: Array[Double]): Array[Array[Double]] =
      Array.tabulate(m) { s =>
        val off = s * subDim
        books(s).map { cw =>
          var d = 0.0; var j = 0
          while (j < subDim) { val t = vec(off + j) - cw(j); d += t * t; j += 1 }
          d
        }
      }
    val candidates = requireCodesRelation(corpusCodes, "cell")
      .where(col("codes").isNotNull)
      .join(broadcast(probes), "cell")
    val scored =
      if (!byResidual) {
        val lutMap: Map[Long, Array[Array[Double]]] = batchRows.map { r =>
          r.getLong(0) -> lutFor(toDoubleArray(r.getSeq[Any](1)))
        }.toMap
        val bc = spark.sparkContext.broadcast(lutMap)
        candidates
          .select(col("new_id"), col("vec_id").as("corpus_id"), col("codes"))
          .rdd.mapPartitions { it =>
            val qs = bc.value
            it.map { r =>
              val lut = qs(r.getLong(0))
              val codes = r.getAs[Array[Byte]](2)
              if (codes.length != mWidth) throw new IllegalArgumentException(
                s"PQ codes row has ${codes.length} bytes but m=$mWidth — codes " +
                  "encoded with different codebooks")
              var d = 0.0; var s = 0
              while (s < lut.length) { d += lut(s)(codes(s) & 0xff); s += 1 }
              Row(r.getLong(0), r.getLong(1), d)
            }
          }
      } else {
        // residual arm (mirrors ivfPqTopK's by_residual branch): corpus
        // codes quantize (x − coarse(cell)), so each (new vector, probed
        // cell) pair gets a LUT built from the new vector's RESIDUAL
        // against that cell — batch·nProbe tables, still driver-bounded
        // by the micro-batch contract
        val batchVecs = batchRows.map(r =>
          r.getLong(0) -> toDoubleArray(r.getSeq[Any](1))).toMap
        val lutMap: Map[(Long, Int), Array[Array[Double]]] =
          probePairs.iterator.map { case (nid, cell) =>
            val q = batchVecs(nid); val c = coarse(cell)
            val res = new Array[Double](dim)
            var j = 0
            while (j < dim) { res(j) = q(j) - c(j); j += 1 }
            (nid, cell) -> lutFor(res)
          }.toMap
        val bc = spark.sparkContext.broadcast(lutMap)
        candidates
          .select(col("new_id"), col("vec_id").as("corpus_id"), col("codes"),
            col("cell"))
          .rdd.mapPartitions { it =>
            val qs = bc.value
            it.map { r =>
              val lut = qs((r.getLong(0), r.getInt(3)))
              val codes = r.getAs[Array[Byte]](2)
              if (codes.length != mWidth) throw new IllegalArgumentException(
                s"PQ codes row has ${codes.length} bytes but m=$mWidth — codes " +
                  "encoded with different codebooks")
              var d = 0.0; var s = 0
              while (s < lut.length) { d += lut(s)(codes(s) & 0xff); s += 1 }
              Row(r.getLong(0), r.getLong(1), d)
            }
          }
      }
    val dups = spark.createDataFrame(scored, schema)
      .select(col("new_id"), col("corpus_id"),
        Features.pround(col("__d"), 6).as("adc_dist"))
      .filter(col("adc_dist") <= maxAdcDist)
      .orderBy(col("new_id"), col("adc_dist"), col("corpus_id"))
    (newCodes, dups)
  }

  /** ADC lookup tables for the bounded query set: luts(q)(sub)(code) =
    * squared L2 between the query's subvector and that codebook entry —
    * nQueries × m × ksub doubles, driver-built, broadcast. Queries
    * whose length differs from the codebook dim are excluded (no table
    * to build — the same quarantine as NULL codes). */
  private def adcLuts(embeddings: DataFrame, dim: Int, nQueries: Int,
                      books: Array[Array[Array[Double]]]): Array[(Long, Array[Array[Double]])] = {
    val m = books.length
    val subDim = books(0)(0).length
    indexable(embeddings)
      .filter(col("vec_id") < nQueries && size(col("embedding")) === dim)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id"))
      .collect()
      .map { r =>
        val q = toDoubleArray(r.getSeq[Any](1))
        val lut = Array.tabulate(m) { s =>
          val off = s * subDim
          books(s).map { c =>
            var d = 0.0; var j = 0
            while (j < subDim) { val t = q(off + j) - c(j); d += t * t; j += 1 }
            d
          }
        }
        r.getLong(0) -> lut
      }
  }

  /** Persist PQ codebooks as a (sub, code, centroid) parquet table —
    * the index artifact counterpart of [[saveIvfIndex]]. */
  def savePqCodebooks(spark: org.apache.spark.sql.SparkSession,
                      codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, code) => (s, code, c.toSeq) }
    }.toSeq.toDF("sub", "code", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Persist an encoded PQ codes relation ([[pqEncode]]'s output — the
    * per-vector index artifact, 16 B/vector at m=16) so repeated queries
    * scan persisted codes instead of re-encoding the corpus per call:
    * build once at ingest, pass [[loadPqCodes]]' result as
    * `precomputedCodes` at query time. Completes the index lifecycle
    * triple with [[saveIvfIndex]] (cells) and [[savePqCodebooks]]
    * (codebooks). */
  def savePqCodes(codes: DataFrame, path: String): Unit =
    codes.write.mode("overwrite").parquet(path)

  /** Load a persisted PQ codes relation (inverse of [[savePqCodes]]). */
  def loadPqCodes(spark: org.apache.spark.sql.SparkSession,
                  path: String): DataFrame =
    graft.Tables.cachedRead(spark, path) // schema-cached, mtime-keyed (r21)

  /** Load persisted PQ codebooks (inverse of [[savePqCodebooks]]). */
  def loadPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                      path: String): Array[Array[Array[Double]]] =
    graft.Tables.cachedRead(spark, path) // schema-cached, mtime-keyed (r21)
      .orderBy(col("sub"), col("code")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2)).toArray

  /** N-gram (word-set) Jaccard similarity for a bounded id range — the
    * SQL-checkable near-dup primitive: |tokensₐ ∩ tokens_b| / |tokensₐ ∪
    * tokens_b| over distinct tokens. */
  def jaccardPairs(docs: DataFrame, maxId: Int, minSim: Double): DataFrame = {
    val toks = docs.filter(col("doc_id") < maxId)
      .select(col("doc_id"), array_distinct(split(col("text"), " ", -1)).as("toks"))
    val a = toks.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
    val b = toks.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Features.pround(
          size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
            size(array_union(col("toks_a"), col("toks_b"))).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minSim)
      .orderBy(col("id_a"), col("id_b"))
  }
}
