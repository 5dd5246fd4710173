package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection at scale (SURVEY.md §2.7 D2): MinHash + LSH
  * banding over word shingles, and SimHash with chunk-banded Hamming
  * candidates. Exact dedup lives in [[TextOps.dedupGroups]].
  *
  * Pipeline shape (100 TB-safe): shingle → per-doc signature (one scan,
  * codegen'd higher-order functions, no UDF) → explode to (band,
  * band-hash) rows → self-equijoin on the band key (shuffle O(rows·bands),
  * never O(rows²)) → exact Jaccard verification only on candidates.
  * Deterministic: hash family is seeded xxhash64, no RNG at execution time.
  */
object Dedup {

  /** Word w-shingles over a pre-tokenized array column. The token array
    * MUST be a materialized column, not an inline `split(...)` — an
    * expression inside the transform lambda is re-evaluated per element,
    * turning shingling O(tokens²) per row. */
  def shinglesFromTokens(toksCol: String, w: Int): org.apache.spark.sql.Column =
    expr(s"array_distinct(transform(sequence(0, greatest(size($toksCol) - $w, 0)), " +
      s"i -> concat_ws(' ', slice($toksCol, i + 1, $w))))")

  /** Tokenize-then-shingle in two projections.
    *
    * NULL text is UNKNOWN content (the d1 convention) — excluded from the
    * candidate pipeline up front. Dropping them here is not just semantics:
    * a NULL text yields a NULL signature, and every band hash degenerates
    * to the same `xxhash64(concat_ws(..., NULL))` = `xxhash64('')` value,
    * so N hostile NULL-text rows would co-bucket in EVERY band and emit
    * O(N²·bands) candidate pairs — all dead on arrival (their Jaccard is
    * NULL and fails the ≥ minSim filter), but only after a quadratic
    * self-join fan-out. The final pair set is unchanged; the blowup is
    * gone. (SimHash needs no such guard: its NULL band value never matches
    * an equi-join key.) */
  private def withShingles(docs: DataFrame, w: Int): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ", -1).as("__toks"))
      .select(col("doc_id"), shinglesFromTokens("__toks", w).as("sh"))

  /** MinHash signature over a column of PRE-HASHED shingles (array<long>):
    * slot i re-hashes the 8-byte long with xxhash64(·, seed=i) — cheap
    * fixed-width hashing, vs n string-hashes per shingle which would
    * dominate the scan cost. Computed by the native
    * [[graft.functions.MinhashSignature]] expression (one fused loop; the
    * composed n×array_min(transform) form allocated n intermediate arrays
    * per row). Returns array<long> of length n. */
  def minhashSignature(hashedShinglesCol: String, n: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.MinhashSignature(
      GraftColumnBridge.expression(col(hashedShinglesCol)), n))
  }

  /** Banded MinHash signature relation (doc_id, band, bh) over an already
    * hashed-shingle (doc_id, hs: array<long>) input — THE LSH key format.
    * Single implementation on purpose: the band-hash layout is the
    * compatibility contract between [[minhashNearDups]] and a persisted
    * [[minhashIndex]] joined by [[incrementalNearDups]] ("identical hash
    * family" is load-bearing); two copies could silently diverge.
    * NOT materialized here — each caller checkpoints per its reuse shape.
    *
    * No emptiness filter — the shingle array is never empty by
    * construction, and a filter on it would be pushed into the scan and
    * recompute the whole shingle pipeline per row. */
  private def bandedSignature(hashed: DataFrame, bands: Int,
                              rowsPerBand: Int): DataFrame = {
    val n = bands * rowsPerBand
    val sigDf = hashed.select(col("doc_id"), minhashSignature("hs", n).as("sig"))
    val bandArr = (0 until bands).map { b =>
      val sliceExpr = s"slice(sig, ${b * rowsPerBand + 1}, $rowsPerBand)"
      s"named_struct('band', $b, 'bh', xxhash64(concat_ws(',', transform($sliceExpr, x -> CAST(x AS STRING)))))"
    }
    sigDf.select(col("doc_id"),
        explode(expr(bandArr.mkString("array(", ", ", ")"))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Candidate generation over an already hashed-shingle (doc_id,
    * hs: array<long>) relation — lets [[minhashNearDups]] share ONE
    * tokenize + shingle + hash scan between signature computation and
    * Jaccard verification instead of running the pipeline twice. */
  private def minhashCandidatesFromHashed(hashed: DataFrame, bands: Int,
                                          rowsPerBand: Int): DataFrame = {
    // localCheckpoint: the banded signature relation feeds both sides of
    // the self-equijoin — without materialization Spark recomputes the full
    // signature pipeline per side (no CSE across self-joins). Checkpoint
    // beats .persist() here: lineage is truncated, and the backing blocks
    // are reference-tracked by the ContextCleaner instead of pinned in the
    // cache manager until an unpersist that a lazily-returned DataFrame can
    // never safely issue. At cluster scale this is a signature-table
    // checkpoint.
    //
    // r21 measured-and-REJECTED: fusing this into one groupBy((band, bh))
    // + collect_list + positional-pair explode (the d28/d43 capped-collect
    // treatment) removed the checkpoint job but ran ~1.15× SLOWER on a
    // same-host 5-rep A/B (min build+exec 1.45 s join vs 1.68 s fused;
    // d17's struct variant 1.46 vs 2.15 s, ~1.5× slower) — WITHOUT a df
    // cap the per-bucket array-of-pairs explode allocates C(bucket, 2)
    // structs per group row, losing to the codegen'd streaming hash join
    // that emits the same rows. The fusion only wins where it ALSO
    // replaces the df-cap count shuffle + survivor join (d28/d43: lists
    // capped at maxDf+1, two stage materializations eliminated).
    val banded = bandedSignature(hashed, bands, rowsPerBand).localCheckpoint(true)
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("id_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Full MinHash near-dup: candidates verified with exact Jaccard over the
    * 64-bit-hashed distinct shingle sets, ≥ minSim. Hashing before set
    * arithmetic keeps the materialized relation at 8 bytes per shingle
    * (strings would be ~w words each) and makes intersect/union integer
    * comparisons; a 64-bit collision altering a Jaccard value needs two
    * distinct shingles of one doc pair to collide (~n²/2⁶⁴ — negligible).
    * Verification joins the hashed sets back only for candidates. */
  def minhashNearDups(docs: DataFrame, minSim: Double, w: Int = 3,
                      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    // one tokenize+shingle+hash scan for the whole pipeline: the
    // materialized (doc_id, hs) relation feeds signature/banding AND the
    // Jaccard verification
    val sh = withShingles(docs, w)
      .select(col("doc_id"), expr("array_distinct(transform(sh, s -> xxhash64(s)))").as("sh"))
      .localCheckpoint(true)
    val cands = minhashCandidatesFromHashed(
      sh.select(col("doc_id"), col("sh").as("hs")), bands, rowsPerBand)
    cands
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        Features.pround(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minSim)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Winnowing fingerprints per document (Schleimer et al., SIGMOD 2003 —
    * see [[graft.functions.WinnowKernel]]): the substring-level dedup
    * primitive. One codegen'd scan; `fps` is the sorted distinct fingerprint
    * set, ~2/(w+1) of the k-grams. */
  def winnowFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    docs.select(col("doc_id"),
      GraftColumnBridge.column(graft.functions.WinnowFingerprints(
        GraftColumnBridge.expression(col("text")), k, w)).as("fps"))
  }

  /** The capped per-key doc-id list aggregate (see
    * [[graft.functions.CappedCollectList]]) — the fused form of "df cap +
    * pair generation" shared by [[winnowNearDups]] and
    * [[Corpus.exactShingleEdges]]. */
  private[operators] def cappedCollect(c: org.apache.spark.sql.Column,
                                       cap: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.CappedCollectList(
      GraftColumnBridge.expression(c), cap).toAggregateExpression())
  }

  /** All ordered (id_a < id_b) pairs from a `__ids` array column: the
    * array is sorted first, so positional i<j pairs are value-ordered AND
    * independent of the partition order the capped collect saw. Fan-out
    * per row is C(size, 2), bounded by the caller's df cap. */
  private[operators] def explodedIdPairs(grouped: DataFrame): DataFrame =
    grouped.select(sort_array(col("__ids")).as("__ids"))
      .select(explode(expr(
        "flatten(transform(__ids, (a, i) -> transform(" +
          "slice(__ids, i + 2, size(__ids)), " +
          "b -> named_struct('id_a', a, 'id_b', b))))")).as("__p"))
      .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"))

  /** Substring-level near-dup candidates: documents sharing ≥ `minShared`
    * winnowed fingerprints. The winnowing guarantee makes any shared
    * substring of ≥ w+k−1 bytes produce ≥ 1 shared fingerprint, so this
    * catches copied passages exact dedup and whole-doc MinHash both miss.
    *
    * Scale shape (fused, r21 — guide §2.3 "aggregate before you shuffle" /
    * §2.4 "remove shuffles outright"): explode to (fp, doc) — O(rows ·
    * fps/doc), distinct per (doc, fp) by construction (WinnowKernel dedups
    * per doc; `doc_id` is the caller's primary key) — then ONE capped
    * per-fp doc-list aggregate ([[graft.functions.CappedCollectList]],
    * cap = maxDf + 1, so per-group state is O(maxDf) even for a
    * boilerplate fp carried by half the corpus: the skew bound the old
    * df-count + survivor-join + self-equijoin chain existed for), a size
    * filter keeping the dup-signal band df ∈ [2, maxDf] (df = 1 paired
    * with nothing before; > maxDf was dropped by the cap), an exploded
    * pair generation bounded at C(maxDf, 2) per fp — exactly the rows the
    * self-join used to emit — and the same pair-count aggregate. Replaces
    * a localCheckpoint job + a df-count shuffle + a survivor join + a
    * two-exchange self-join with ONE aggregate exchange; never O(rows²),
    * and nothing buffers an uncapped group. */
  def winnowNearDups(docs: DataFrame, minShared: Int, k: Int = 8, w: Int = 4,
                     maxDf: Int = 50): DataFrame = {
    val grouped = winnowFingerprints(docs, k, w)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .groupBy(col("fp"))
      .agg(cappedCollect(col("doc_id"), maxDf + 1).as("__ids"))
      .filter(size(col("__ids")).between(2, maxDf))
    explodedIdPairs(grouped)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The persistable MinHash index for a corpus snapshot, as the two
    * tables a production pipeline writes at ingest:
    *  - `bands`: (doc_id, band, bh) — the LSH candidate-generation keys;
    *  - `sets`:  (doc_id, hs) — hashed distinct shingle sets for
    *    exact-Jaccard verification (stored once per doc, not per band).
    * [[incrementalNearDups]] joins each new batch against them instead of
    * re-running the full self-join — the daily-ingest shape: band work is
    * O(new·bands), corpus signatures are never recomputed. */
  final case class MinhashIndex(bands: DataFrame, sets: DataFrame)

  def minhashIndex(docs: DataFrame, w: Int = 3, bands: Int = 16,
                   rowsPerBand: Int = 4): MinhashIndex = {
    val sh = withShingles(docs, w)
      .select(col("doc_id"),
        expr("array_distinct(transform(sh, s -> xxhash64(s)))").as("hs"))
      .localCheckpoint(true) // feeds both tables; one tokenize+hash scan
    MinhashIndex(bandedSignature(sh, bands, rowsPerBand), sh)
  }

  /** Incremental near-dup: band the NEW batch only and equijoin against a
    * persisted corpus [[minhashIndex]] — every new doc is checked against
    * the whole corpus without touching corpus-side signatures again.
    * Emits (new_id, corpus_id, jaccard ≥ minSim); identical hash family
    * to [[minhashNearDups]], so a batch joined against its own index
    * reproduces the self-join result (asserted in tests). */
  def incrementalNearDups(newDocs: DataFrame, corpus: MinhashIndex,
                          minSim: Double, w: Int = 3, bands: Int = 16,
                          rowsPerBand: Int = 4): DataFrame = {
    val fresh = minhashIndex(newDocs, w, bands, rowsPerBand)
    val cands = fresh.bands
      .select(col("band"), col("bh"), col("doc_id").as("new_id"))
      .join(corpus.bands.select(col("band"), col("bh"), col("doc_id").as("corpus_id")),
        Seq("band", "bh"))
      .filter(col("new_id") =!= col("corpus_id"))
      .select(col("new_id"), col("corpus_id")).distinct()
    cands
      .join(fresh.sets.select(col("doc_id").as("new_id"), col("hs").as("hs_new")), "new_id")
      .join(corpus.sets.select(col("doc_id").as("corpus_id"), col("hs").as("hs_corpus")), "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        Features.pround(
          size(array_intersect(col("hs_new"), col("hs_corpus"))).cast("double") /
            size(array_union(col("hs_new"), col("hs_corpus"))).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minSim)
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** Connected components over an undirected near-dup pair list by
    * iterative min-label propagation WITH POINTER JUMPING — the step that
    * turns pairwise near-dup evidence ([[minhashNearDups]],
    * [[simhashNearDups]], [[winnowNearDups]], [[Similarity.jaccardPairs]])
    * into a dedup DECISION: every doc gets its component's minimum id, and
    * the canonical representative is the row where `id = component`.
    *
    * Each round propagates the minimum label over graph edges AND over
    * label-pointer edges (id ↔ comp, rebuilt from the previous round's
    * labels): the pointer edges make every node see `comp(comp(id))` each
    * round — simultaneous pointer doubling (Shiloach–Vishkin
    * shortcutting), so the distance a label travels doubles per round and
    * the fixpoint arrives in O(log diameter) rounds, not O(diameter). A
    * pathological chain corpus (doc i near-dup of doc i+1, diameter n)
    * converges in ~log₂n rounds where plain propagation needs n — the
    * chain-fixture test pins a 3000-node chain inside the default
    * `maxIter`. The augmentation is one extra union into the same
    * neighbor-min aggregate: still exactly one shuffle round (+ the label
    * join) and one materialization per iteration. Typical near-dup
    * components are tiny dup-clusters where both forms take 2–3 rounds.
    *
    * Per-round materializations go through [[Corpus.stageMaterialize]]
    * and so honor `spark.graft.stageStorage`: `local` (default)
    * localCheckpoints — fastest, executor-memory resident, not fault
    * tolerant; `disk` persists DISK_ONLY with lineage KEPT — executor
    * loss recomputes from upstream, each superseded round's blocks are
    * dropped as soon as the next round lands (the loop holds ≤ 2 rounds
    * of (id, comp) pairs plus the edge list; the FINAL labels stay
    * persisted until [[Corpus.releaseStages]], where every round handle
    * is registered); `reliable` checkpoints every round to the durable
    * checkpoint dir — the loop itself survives executor-host loss
    * (round files follow Spark's standard checkpoint lifecycle:
    * reclaimed at context stop or by reference-tracked cleanup). All
    * three strategies produce identical labels.
    *
    * Raises if `maxIter` rounds don't reach the fixpoint. The default cap
    * is sized to the DOUBLING bound, not typical graphs: rounds ≈
    * ⌈log₂(diameter)⌉ + O(1), so 64 covers any graph addressable by a
    * 64-bit id (a 2⁶⁰-node chain included) — and since the loop exits at
    * the fixpoint, the generous cap costs nothing on the 2–3-round
    * clusters real near-dup evidence produces. A cap of 20 would be a
    * cliff at ~10⁶-node pathological chains (21 doubling rounds). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 64): DataFrame = {
    // same resolution order as stageMaterialize: a corpus-pipeline
    // density decision (thread-scoped override) outranks the session conf
    val strategy = Corpus.stageStrategyOverride.value
      .orElse(nodes.sparkSession.conf.getOption("spark.graft.stageStorage"))
      .getOrElse("local")
    def mat(df: DataFrame): DataFrame = Corpus.stageMaterialize(df)
    val sym = mat(edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst"))))
    // Round 1 folded into initialization (r20 optimization): with the
    // identity labeling (comp = id) the first round's pointer edges are
    // id↔id no-ops and its neighbor-min is simply min(id, min of direct
    // neighbor ids) — so start the loop FROM that state and skip one full
    // mat+changed-count cycle per invocation. Bit-identical by
    // construction (it IS the old round 1's aggregate, with the loop-
    // control count dropped — the count only ever steered the loop); the
    // fixture-profile motivation is that each round costs one
    // materialization job plus one count job plus their driver planning,
    // and typical near-dup graphs converge in 1–2 rounds past this fold.
    // semi-join guard: the old round 1 joined edge SOURCES against the
    // label table, so an edge whose src is not a declared node
    // contributed nothing — keep exactly that semantics (a hostile edge
    // list naming an unknown low id must not become a component label)
    val knownSrc = sym.join(nodes.select(col("id").as("__nid")),
      col("src") === col("__nid"), "left_semi")
    var labels = mat(nodes
      .join(knownSrc.groupBy(col("dst")).agg(min(col("src")).as("__nbr")),
        nodes("id") === col("dst"), "left")
      .select(nodes("id"),
        least(nodes("id"), coalesce(col("__nbr"), nodes("id"))).as("comp")))
    var retained = labels // the materialized relation backing `labels`
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // pointer edges from the PREVIOUS round's labels: comp→id delivers
      // comp(comp(id)) to id (the doubling step); id→comp spreads a low
      // label down to the pointed-at node, which only accelerates
      val ptr = labels.select(col("comp").as("src"), col("id").as("dst"))
        .unionByName(labels.select(col("id").as("src"), col("comp").as("dst")))
      val nbrMin = sym.unionByName(ptr).join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("comp")).as("nbr_comp"))
      // the changed-count rides the materialization job as an observed
      // metric (r21 — guide §1.2 "don't compute things you throw away"
      // applied to whole jobs): the eager materialization of every
      // stageMaterialize strategy executes this dataset's OWN
      // QueryExecution, so the CollectMetrics accumulator is readable
      // synchronously afterwards (probed in tools.ObsProbe) and the
      // loop-control count no longer needs its own follow-up job — one
      // job per round instead of two. Deliberately the observe(name)
      // form, NOT an Observation object: Observation registers with the
      // session's ObservationManager, non-serializable session state
      // that breaks any later closure capturing the session (Spark ML
      // training summaries do), and its get() waits on the async
      // listener bus. sum over an empty relation is null → no change;
      // a missing metric (a future strategy whose action runs a
      // different execution) falls back to the count job — correctness
      // never depends on the metric being present.
      // per-round metric name: the disk strategy persists WITH lineage
      // kept, so round n+1's plan still contains round n's CollectMetrics
      // node and a repeated name is a DUPLICATED_METRICS_NAME analysis
      // error (local/reliable truncate lineage and never see it)
      val metricName = s"graft_cc_changed_$it"
      val observed = labels.join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"),
          least(labels("comp"), coalesce(col("nbr_comp"), labels("comp"))).as("comp"),
          (coalesce(col("nbr_comp"), labels("comp")) < labels("comp")).as("__ch"))
        .observe(metricName, sum(col("__ch").cast("long")).as("n"))
      val next = mat(observed)
      changed = observed.queryExecution.observedMetrics.get(metricName)
        .map(r => if (r.isNullAt(0)) 0L else r.getLong(0))
        .getOrElse(next.filter(col("__ch")).count())
      // disk strategy: drop the superseded round's blocks now instead of
      // waiting for releaseStages (the handle stays registered there, and
      // double-unpersist is a no-op) — bounds the loop's disk footprint
      // to two rounds of labels regardless of round count
      if (strategy == "disk") retained.unpersist(blocking = false)
      retained = next
      labels = next.select(col("id"), col("comp"))
      it += 1
    }
    require(changed == 0L, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** SimHash (64-bit): per-bit majority vote over xxhash64'd distinct
    * tokens, computed by the native [[graft.functions.SimhashBits]]
    * expression — a narrow, shuffle-free projection (the explode +
    * 64-column groupBy formulation this replaces shuffled one row per
    * (doc, token)). */
  def simhash(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    docs.select(col("doc_id"),
        expr("transform(array_distinct(split(text, ' ', -1)), t -> xxhash64(t))").as("__hs"))
      .select(col("doc_id"),
        GraftColumnBridge.column(graft.functions.SimhashBits(
          GraftColumnBridge.expression(col("__hs")))).as("simhash"))
  }

  /** SimHash near-dup candidates: band the 64-bit signature into four
    * 16-bit chunks; docs sharing any chunk are candidates (Hamming-LSH);
    * verify with exact bit_count(xor) ≤ maxHamming. */
  def simhashNearDups(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = simhash(docs)
    val chunks = (0 until 4).map(c =>
      s"named_struct('chunk', $c, 'v', shiftright(simhash, ${c * 16}) & 65535)")
    // materialized for the same self-join reason as minhashCandidates: the
    // banded relation feeds both sides, and Spark does no CSE across
    // self-joins — unmaterialized, the whole signature pipeline runs twice.
    // The grouped-collect pair fusion was measured and REJECTED here (r21,
    // ~1.5× slower at 777k pairs — see minhashCandidatesFromHashed).
    val banded = sigs.select(col("doc_id"), col("simhash"),
        explode(expr(chunks.mkString("array(", ", ", ")"))).as("cc"))
      .select(col("doc_id"), col("simhash"),
        col("cc.chunk").as("chunk"), col("cc.v").as("v"))
      .localCheckpoint(true)
    val a = banded.select(col("chunk"), col("v"),
      col("doc_id").as("id_a"), col("simhash").as("sig_a"))
    val b = banded.select(col("chunk"), col("v"),
      col("doc_id").as("id_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("chunk", "v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sig_a ^ sig_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id_a"), col("id_b"))
  }
}
