package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftExtensions, SparkEntry}

/** Scaling probe for the bench tail's flagship families: times the
  * near-dup trio (d15/d17/d28) AND the join flagships (x25 3-way
  * join+agg, x28 5-way, x30 as-of union-window, x34 bucketed as-of) at
  * sf0.001 / sf0.01 / sf0.1 (min of 2 after warmup).
  *
  * Round-4 measurement (near-dup trio): 100× the data (sf0.001 → sf0.1)
  * costs only ~1.3× the wall time (d15 0.79 s → 1.01 s, d17 0.52 s →
  * 1.18 s, d28 0.69 s → 1.23 s), i.e. the ~1–1.4 s bench figures are
  * fixed per-job overhead — eager checkpoint jobs plus several shuffle
  * stages' task scheduling in one JVM — not data work.
  *
  * Round-5 measurement (join family): same picture — across 100× data
  * (sf0.001 → sf0.1) x25 0.47→0.72 s (1.5×), x28 0.80→1.05 s (1.3×),
  * x30 0.46→0.49 s (1.1×), x34 0.68→1.19 s (1.8×); every flagship's
  * 100×-data ratio is ≤ 1.8×, so the join plans (shuffle-on-key + AQE
  * BHJ; single-shuffle union-window as-of; two-level bucketed as-of) are
  * overhead-bound at test SF and the data term would dominate only at
  * real SF with these same shapes. There is no constant worth chasing at
  * test SF.
  *
  * d43 (corpus pipeline, the slowest bench entry): 1.52 s → 2.74 s
  * across 100× data (1.8×). The ~1.5 s floor is the eager job chain —
  * two checkpoints plus the component loop's per-round count+checkpoint
  * (≥ 2 rounds even on an edgeless graph) — i.e. the same fixed
  * scheduling overhead, not data work. (Replacing the df-cap
  * groupBy+rejoin with a count-over-window cut the round-5 initial
  * 2.4 s floor / 4.1 s sf0.1 figure to this.)
  *
  * Corpus-pipeline family (after the native `shingle_md5s` expression
  * replaced the composed split/transform/slice/concat_ws/md5 chain —
  * each k-token window is a contiguous byte span, so the kernel hashes
  * in place with zero per-window allocation): d43 1.12 s → 1.57 s
  * (1.4×), d45 1.31 s → 1.79 s (1.4×), d47 1.37 s → 2.59 s (1.9×),
  * d44 0.22 s → 0.50 s — the one entry with a visible data term (2.3×
  * per 100× data, strongly sublinear; the train-side shingle relation
  * genuinely grows with the corpus and the equijoin is the right shape
  * for that growth). Versus the composed form the native expression cut
  * sf0.1 d43 2.74→1.57 s, d44 0.95→0.50 s, d45 2.58→1.79 s.
  *
  * Round-7 measurement (after the d49 precision contract — k=40,
  * train-side stop-fp cap, minHits — and the d20 min_by migration):
  * d49 0.40 s → 1.03 s across 100× data (2.6×, the d44 profile: a real
  * but strongly sublinear data term — the train fp relation grows with
  * the corpus and the capped equijoin is the right shape for it);
  * d20 0.14 s → 0.25 s (1.8×, overhead-bound — the min_by groupBy
  * shuffles only 16-byte hashes + winner structs). Corpus family
  * unchanged within noise (d43 2.33 s, d45 3.25 s, d47 3.91 s at
  * sf0.1 on a moderately loaded probe run).
  *
  * Round-8 measurement (after the sha2 dedup key and the operator-
  * planted bloom prune): d20 0.12 → 0.16 s (1.3× across 100× data —
  * the 32-byte sha2 key costs nothing measurable vs the md5 figures
  * above); d49 0.35 → 0.86 s (2.4×, same sublinear data term as r7).
  * The new beyond-broadcast block (broadcast disabled → shuffle join)
  * measures the planted bloom directly: sf0.001 0.30 s off / 0.37 s on
  * (build overhead dominates on tiny data — the regime auto mode never
  * picks), sf0.01 0.52 / 0.30 (1.8× faster with the bloom), sf0.1
  * 0.54 / 0.37 (1.5× faster) — the prune pays as soon as there is real
  * corpus-side shuffle data to thin, which is its whole premise at
  * 100 TB.
  *
  * Round-10 measurement (d50 model-based quality scoring, train +
  * score): 0.37 s → 0.29 s → 0.37 s across sf0.001/sf0.01/sf0.1 —
  * FLAT across 100× data (ratio ~1.0, the strongest overhead-bound
  * profile in the catalog): the two jobs (one 2×16 count aggregate,
  * one zero-shuffle scan-bound score projection) are pure scheduling
  * cost at test SF, exactly what the literal-weight design predicts.
  *
  * Round-13 measurement (end-to-end corpus chain under
  * `stageStorage=disk`, the fault-tolerant strategy a multi-hour cluster
  * run uses — the new block below): d43_chain 2.86/2.41/3.53 s and
  * d47_chain 2.39/2.41/4.02 s across sf0.001/0.01/0.1 — 100× data costs
  * 1.2×/1.7× wall, the same overhead-bound flat-to-sublinear profile as
  * the default-strategy figures above, and fault tolerance itself costs a
  * roughly CONSTANT ~1 s over the default localCheckpoint chain (the
  * DISK_ONLY write+re-read of the uncapped fingerprint stage), not a
  * multiplier — the disk strategy is safe to recommend wholesale for
  * long runs. Same-run default-strategy spot figures: d43 1.85/1.36/2.55,
  * d47 2.40/2.18/3.40.
  *
  * Round-13 follow-up (after the reliable strategy's compute-once fix —
  * transient DISK_ONLY persist feeding the checkpoint write): the same
  * chains under `stageStorage=reliable` are at COST PARITY with disk —
  * d43_chain_rel 1.53/1.48/2.49 s, d47_chain_rel 1.60/1.57/2.85 s vs
  * same-run disk 1.63/1.62/2.45 and 1.88/1.77/3.09 across
  * sf0.001/0.01/0.1. Executor-HOST-loss durability is effectively free
  * over DISK_ONLY once the stage computes once; before the fix the write
  * job recomputed every partition from lineage, doubling the most
  * expensive stage.
  *
  * Round-14 measurement (skewed-key join rehearsal, the new block below;
  * 4M-row large side, 90% on one key, 100k dim, broadcast disabled,
  * payload kept across the shuffle): unsalted AQE-off wall 2.92 s,
  * maxTask 2236 ms vs p50 88 ms — task-time spread 25× (the
  * 1000-executor straggler in miniature). AQE's skew split (thresholds
  * at compressed-byte scale) engages — task count 97 → 128 — and cuts
  * the run to wall 0.87 s, maxTask 348 ms, spread 2.6; the explicit
  * 16-way salted path under AQE-off lands at wall 1.16 s, maxTask
  * 577 ms, spread 3.7. Both remedies bound the straggler; AQE wins when
  * its thresholds see the skew (moderate, detectable), salting remains
  * the deterministic path for the pathological key AQE's compressed-size
  * heuristics can miss (measured here: an all-identical key column
  * compresses ~100×, and at the default-shaped 1m threshold the split
  * did NOT fire). Plan/value side pinned in ScaleSpec ("skew rehearsal").
  *
  * Round-14 measurement (~1000× corpus-chain evidence, the new block
  * below): sf0.1's 5000 documents amplified 10× with perturbed NEAR-dup
  * copies (the densest realistic candidate-graph shape), chains under
  * stageStorage=reliable: d43 2.45 s → 10.31 s and d47 2.85 s → 6.49 s
  * across the last 10× — so across the full 1000× (sf0.001 → amp10x,
  * same run: d43 1.61 s, d47 1.86 s at sf0.001) wall grows only
  * 6.4×/3.5×. Peak reliable-checkpoint footprint scales linearly with
  * the data (d43 9.9 → 97.9 MB per 10×, d47 0.9 → 1.8 MB) — the
  * checkpoint-storage sizing number for a cluster run: ~2 KB/doc for the
  * d43 chain's materialized base+component stages, ~0.4 KB/doc for
  * d47's winnowed fingerprints. No superlinear stage: the df-capped
  * shingle equijoin holds its C(maxDf,2) fan-out bound even with every
  * document in a 10-member near-dup cluster.
  *
  * Round-14 measurement (bounded-memory exact quantiles, the `quantile`
  * block below; all-distinct double column — the continuous-metric case):
  * order-statistics path 1.2 / 8.7 / 25.9 s at 1M / 10M / 40M rows
  * (linear, as the two-shuffle shape predicts) vs the single-buffer
  * in-plan `percentile` aggregate at 3.7 / 256.8 / 248.1 s — 30× slower
  * at 10M, where the final aggregation task merges every partial
  * (value → count) OpenHashMap into ONE buffer, and it only completes at
  * all because this JVM has 128 GiB; a 4–8 GiB executor task OOMs well
  * before that. Results bit-equal at every n (probe-asserted). This is
  * the measured justification for batch 7's rewrite of every exact-
  * quantile fit path (m3/F3/churn-p75) onto Metrics.exactPercentiles.
  *
  * Round-14 measurement (stratified-split rank, the `split` block below;
  * 2-class frame with a payload column, min of 2 after warmup with a
  * block-store sweep between runs): partition-offset Split vs the
  * per-stratum window it replaced — parity at 1M rows (1.9 vs 1.7 s),
  * then 3.0 vs 7.8 s at 4M and 11.4 vs 31.8 s at 16M. Even on ONE
  * machine the window's two-task stratum sort dominates by 4M rows; on a
  * cluster the gap is the task-parallelism ratio (2 tasks vs #partitions)
  * plus the per-task memory ceiling the window form hits first. Contract
  * parity (exact ceil counts, disjoint cover, fold balance) is pinned in
  * MlPipelineSpec.
  *
  * Round-17 measurement (semantic dedup at constant cell size, the
  * `semdedup` block below; planted exact dup per 100 ids, min over two
  * probe invocations on a noisy host): 2.56 / 4.78 / 15.7 s at
  * n = 20k / 80k / 320k with k = n/500 clusters — two successive 4×
  * data steps cost 1.9× and 3.3× (subquadratic; the all-pairs form this
  * replaces grows 16× per step). The 80k and 320k runs cross the
  * then-literal-assignment knee (64; retired in r18 — the kernel is
  * now the only assignment path, measured 20× faster at 250k rows) onto
  * the broadcast kernel, and every
  * run ASSERTS recall 1 with the exact keeper map, so the kernel path
  * is correctness-verified at 640 clusters / 40× fixture scale, not
  * just timed. The k=640 run's constant includes ~5 s of driver-side
  * Lloyd's on the 10k training sample — the build-once cost a
  * production deployment amortizes via `precomputedCentroids`.
  *
  * Round-18 measurement (quantizer at the promised SemDeDup regime, the
  * `quantizer` block below): k = 5,000 over a 250k-vector 64-dim corpus
  * routes through the new work knee onto the distributed trainer
  * (sample target 100k; the old fixed-10k driver path would have seated
  * k-means++ on 2 points/centroid). Training 60.7 s — the build-ONCE
  * ingest cost a deployment amortizes via precomputedCentroids /
  * saveIvfIndex — returning exactly 5,000 DISTINCT centroids with ZERO
  * empty cells and max/avg cell ratio 2.4 (the balanced-cell
  * precondition of SemDeDup's O(n·avgCell) self-join bound); the full
  * semanticDedup pass with that quantizer runs 18.7 s and asserts
  * recall 1 on the planted duplicates. This closes the r17 verdict's
  * top finding: the promised nClusters ~ n/targetCellSize regime is now
  * actually reachable, with degeneracy a loud require instead of silent
  * duplicate centroids.
  *
  * Round-18 measurement (leakage-safe split end-to-end, the `compsplit`
  * block below): connectedComponents + componentSplit over sf0.1's
  * documents amplified 1× / 4× / 16× as near-dup star components —
  * 1.14 / 1.51 / 2.00 s at 5k / 20k / 80k docs, i.e. two successive 4×
  * data steps cost 1.33× and 1.32× (the floor is the component loop's
  * fixed per-round count+checkpoint; the data term — two narrow
  * id-keyed equijoins + the zero-shuffle fence — is nearly flat at this
  * scale). Every step ASSERTS the leak invariant (no component
  * straddles train/test; the amplified copies have different text, so
  * their own-hash splits WOULD straddle without the rep fence) and the
  * component count (one per base doc).
  *
  * Round-18 measurement (PQ/ADC A/B, the `pq` block below; 250k×64-dim,
  * 200 queries, planted dup per 100 ids; this session's probe windows
  * were repeatedly hit by violent foreign bursts — loadavg spikes to 27
  * observed — so the block was run THREE times and the signal is read
  * across runs, per this scaladoc's standing convention). Same-run
  * walls (brute / full-scan ADC / IVF-PQ): 19.8 / 6.3 / — , then
  * 4.5 / 4.6 / 6.3, then 35.0 / 15.4 / 5.5 s. Two reads: (1) absolute
  * volatility tracks WORK VOLUME — brute (50M pairs × 64-dim cosine)
  * swings 4.5–35 s, ADC (50M × 16 table adds) 4.6–15.4 s, build-once
  * IVF-PQ (6.25M probed pairs) is the most stable at 5.5–6.3 s — i.e.
  * exactly the exposure ordering the three designs predict; (2) ADC
  * beat brute >2× within-run in two of three runs (the third landed
  * even — row-object overhead floors the in-JVM gap when the host is
  * otherwise quiet). PQ's durable 100 TB lever is the INDEX WIDTH —
  * 16 code bytes vs 256 vector bytes per row — which keeps the scanned
  * index in page cache / executor memory where raw vectors spill, plus
  * exact-duplicate code identity (planted recall 1 ASSERTED on every
  * PQ path, all three runs). A loaded run also measured the
  * self-training ivfPqTopK at 26 s/call — the per-call quantizer build
  * the precomputed params exist to amortize (train once at ingest,
  * like saveIvfIndex).
  *
  * Round-18 re-measurement (semdedup block after the k-scaled trainer;
  * three runs under the same burst regime): the n=320k/k=640 arm's
  * clean run lands at 4.8 / 6.7 / 16.6 s across 20k/80k/320k — 4×
  * steps cost 1.4× and 2.5×, matching r17's 15.7 s subquadratic
  * profile, with the new 12.8k-sample trainer decomposing as ~7 s
  * train + ~10 s dedup (the ~1.3×-of-10k-sample train cost the
  * sample-growth rule predicts). Two burst-window runs printed 142 and
  * 151 s for the same arm with the smaller arms unchanged — a pure
  * contention artifact (the within-run decomposition under load ~2–3
  * measured train 7 s + dedup 33 s; no 320k-path code changed this
  * round except the sample size), retained here as the canonical
  * example of why absolutes from this host need the loadavg caveat.
  *
  * Round-12 measurement (event-analytics family, re-probed after the
  * `ts` plans changed shape — NTZ cast replacing nanos-long
  * arithmetic): d10 0.18/0.17/1.12 s, d11 0.16/0.15/0.64 s,
  * d36 0.39/0.44/3.13 s, d37 0.28/0.26/2.01 s, x31 0.19/0.22/1.13 s
  * across sf0.001/0.01/0.1. Flat through 10×, then ~5–8× for the last
  * 10× — a visible but ~linear data term, which is the right shape:
  * each is one shuffle keyed on user_id/hour-bucket/order key with
  * small group state, no window over the full relation. (Probe-run
  * caveat: the same run measured d45 at 6.9 s vs the same-day quiet
  * bench's 3.0 s, so absolute sf0.1 figures here carry ~2× host noise;
  * the within-run ratios are the signal.)
  *
  * Round-19 `topk` block (250k×64, 20 queries, k=5): partition-local
  * pre-selection OFF 1.853 s / 0.52 MB shuffle write vs ON 1.055 s /
  * 0.13 MB — 4× fewer exchange bytes, 1.75× wall, bit-identity
  * asserted at probe scale. Measurement corrected the r18 verdict's
  * premise: the unpruned exchange was NOT O(corpus·queries) bytes —
  * Spark's WindowGroupLimit (rank ≤ k under row_number) already
  * applies a map-side group limit before the shuffle — so the
  * pruning's real wins are (a) replacing the per-partition SORT of
  * the full 5M-row scored relation with an O(n·log k) bounded heap
  * and (b) pruning before the salt column exists (WindowGroupLimit
  * keeps k per (query, salt) per map task = salts× the survivors).
  *
  * Round-19 `pq` re-probe AFTER the in-kernel bounded selection: the
  * first pruning cut (the generic partitionLocalTopK over the scored
  * DataFrame) REGRESSED full-scan ADC at probe scale — 6.3 s (r18) →
  * 24.9 s — because the flatMap still materialized one Row per
  * (corpus row, query) (50M at 250k×200) and the generic pruning added
  * an InternalRow↔Row round-trip on all of them. Moving the bounded
  * heap INSIDE the scoring kernel (emit only partitions·q·k survivor
  * rows, selection under the exact (pround(d,6), nbr_id) rank order)
  * fixed it decisively: pq_bruteforce 2.94 s, pq_adc_fullscan
  * **0.93 s** (6.8× faster than the r18 figure), pq_ivfadc_probed
  * 1.28 s — planted recall asserted, 114/114 oracle + 131/131
  * dump-diff bit-identical after the change. Lesson recorded: for
  * RDD-kernel scorers, prune at the point of ROW CREATION, not after
  * the DataFrame boundary.
  *
  * Round-19 `audit` block (d45 decomposition, verdict #5): stage chain
  * alone 3.39 s, audit aggregates on materialized stages 0.62 s, d45
  * declared 4.04 s at sf0.1 (same-run figures). BEFORE the
  * materializeForAudit fix d45 ran 1.88× its own chain (5.19 s vs
  * 2.76 s same run): the six audit branches re-derived the LAZY stage
  * suffix per branch — the dedup semi-join ran 4×, chunking 2×. With
  * the two fan-out nodes checkpointed on the audit path only, d45 =
  * chain + ε (1.19×); the remaining floor is the chain itself (eager
  * checkpoint jobs + ≥2 component-loop rounds — the r4-measured fixed
  * cost), irreducible without changing pipeline semantics. d54 drain
  * re-profile (verdict #5 second half): 2.25 s at the r18 quiet
  * record, 3.66 s in the r19 loaded bench (loadavg 2.5–5) — scales
  * with load exactly like the other drains; the clamp holds and the
  * floor is micro-batch scheduling (~5 batches × state-store setup),
  * not width.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC") // normalizeTs/Date contract
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    // optional block filter: `runMain graft.tools.ScaleProbe skew quantile`
    // re-probes only the named blocks (a full run is ~15 min on a loaded
    // host; a single block re-measure should not pay for the rest)
    val blocks = Set("queries", "bloom", "disk", "reliable", "skew",
      "amp10x", "quantile", "split", "crossover", "semdedup", "quantizer",
      "compsplit", "pq", "topk", "audit", "hotcell", "bpe")
    args.foreach(a => require(blocks(a),
      s"unknown probe block '$a' — use any of: ${blocks.toSeq.sorted.mkString(", ")}"))
    def block(name: String)(body: => Unit): Unit =
      if (args.isEmpty || args.contains(name)) body
    block("queries") {
    val qs = Seq("d15_minhash_neardups", "d17_simhash_neardups", "d28_winnow_neardups",
      "x25_shipping_priority", "x28_nation_pair_volume",
      "x30_asof_last_order", "x34_asof_bucketed", "d43_training_sequences",
      "d44_decontaminate", "d45_pipeline_audit",
      "d47_training_sequences_winnowed", "d49_decontaminate_winnowed",
      "d20_dedup_docs", "d50_quality_scores",
      // event-analytics family, re-probed in r12 after the ts plans
      // changed shape (NTZ cast replacing the nanos-long arithmetic)
      "d10_hourly_events", "d11_session_counts", "d36_funnel_steps",
      "d37_gapfilled_hourly", "x31_attribution_window")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1");
         q <- qs) {
      SparkEntry.queries(q)(spark, sf).count() // warm: codegen + JIT
      val t0 = System.nanoTime(); SparkEntry.queries(q)(spark, sf).count()
      val t1 = System.nanoTime(); SparkEntry.queries(q)(spark, sf).count()
      val dt = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
      println(f"[scaleprobe] $q%-24s $sf%-28s $dt%.3f s")
    }
    }
    // the beyond-broadcast decontamination regime: broadcast disabled so
    // the bench-side join is a shuffle join, timed with the operator-
    // planted bloom prune off vs forced on — measures what the prune
    // costs/saves where it actually applies (the declared broadcast-
    // regime d44 above never injects it)
    block("bloom") {
      import org.apache.spark.sql.functions.{col, lit, pmod}
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1");
           mode <- Seq("off", "on")) {
        spark.conf.set("spark.graft.bloomPrune", mode)
        def run(): Unit = {
          val docs = graft.Tables.documents(spark, sf)
          graft.operators.Corpus.decontaminate(
            docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L),
            docs.filter(pmod(col("doc_id"), lit(97L)) === 0L), shingleK = 4).count()
        }
        run() // warm
        val t0 = System.nanoTime(); run()
        val t1 = System.nanoTime(); run()
        val dt = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
        println(f"[scaleprobe] d44_shuffle_bloom_$mode%-11s $sf%-28s $dt%.3f s")
      }
      Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.graft.bloomPrune").foreach(spark.conf.unset)
    }
    // end-to-end corpus chain under the fault-tolerant disk stage strategy:
    // the declared bench runs the chain under the default localCheckpoint
    // strategy, but a multi-hour cluster run uses stageStorage=disk — this
    // is the chain ratio a cluster operator needs (what does fault
    // tolerance cost, and does the chain stay sublinear across 100× data
    // with lineage kept?). releaseStages between runs per the unpersist
    // contract, so successive SFs don't accumulate DISK_ONLY blocks.
    block("disk") {
      spark.conf.set("spark.graft.stageStorage", "disk")
      for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1");
           q <- Seq("d43_training_sequences", "d47_training_sequences_winnowed")) {
        def run(): Unit = {
          SparkEntry.queries(q)(spark, sf).count()
          graft.operators.Corpus.releaseStages(spark)
        }
        run() // warm
        val t0 = System.nanoTime(); run()
        val t1 = System.nanoTime(); run()
        val dt = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
        val label = q.take(3) + "_chain_disk"
        println(f"[scaleprobe] $label%-24s $sf%-28s $dt%.3f s")
      }
      spark.conf.unset("spark.graft.stageStorage")
    }
    // the same chain under stageStorage=reliable (executor-HOST-loss-safe
    // checkpoint files — what a multi-hour cluster run on preemptible
    // hosts uses): measures what durability costs now that the checkpoint
    // write re-reads transient DISK_ONLY blocks instead of recomputing the
    // stage (compute-once). Checkpoint FILES are not reclaimed by
    // releaseStages (documented lifecycle contract — orchestration owns
    // the dir), so the probe uses a scratch dir deleted at the end.
    block("reliable") {
      spark.conf.set("spark.graft.stageStorage", "reliable")
      val ckroot = java.nio.file.Files.createTempDirectory("graft_probe_ckpt")
      spark.sparkContext.setCheckpointDir(ckroot.toString)
      for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1");
           q <- Seq("d43_training_sequences", "d47_training_sequences_winnowed")) {
        def run(): Unit = {
          SparkEntry.queries(q)(spark, sf).count()
          graft.operators.Corpus.releaseStages(spark)
        }
        run() // warm
        val t0 = System.nanoTime(); run()
        val t1 = System.nanoTime(); run()
        val dt = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
        val label = q.take(3) + "_chain_rel"
        println(f"[scaleprobe] $label%-24s $sf%-28s $dt%.3f s")
      }
      spark.conf.unset("spark.graft.stageStorage")
      // walk-delete the scratch checkpoint tree (deepest first); close the
      // walk stream — it holds directory fds open until then
      val walk = java.nio.file.Files.walk(ckroot)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    // Skewed-key join rehearsal (round 14): a planted 90%-one-key large
    // side (4M rows) joined to a 100k dim — the 1000-executor straggler
    // shape. Three variants, each with wall time AND the task-duration
    // spread (max/p50 across all tasks of the timed run) from a listener:
    // the unsalted AQE-off baseline concentrates ~90% of the join in one
    // task; AQE's skew split (thresholds lowered to fixture scan sizes,
    // factor 2 — production defaults are 256 MB/factor 5) and the explicit
    // 16-way salted path must both bound that spread. Broadcast disabled:
    // skew split requires the sort-merge path, which is also the only
    // regime where skew matters at 100 TB (a broadcastable dim never
    // stragglers). Plan-shape side is pinned in ScaleSpec ("skew
    // rehearsal" test: skew=true in the adaptive final plan, salted
    // max-partition fan-in < plain/3, all variants value-equal).
    block("skew") {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
      import org.apache.spark.sql.functions._
      val ns = spark.newSession()
      ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ns.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      ns.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      ns.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // AQE sizes partitions from COMPRESSED map-output bytes, and the hot
      // partition's key column is a run of one identical value (compresses
      // ~100×) — thresholds must be set against compressed sizes or the
      // split silently never fires (measured: at 1m it did not)
      ns.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      ns.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      ns.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val hot = 7L
      val large = ns.range(0, 4000000L)
        .select(when(col("id") % 10 < 9, lit(hot)).otherwise(col("id")).as("key"),
          concat_ws("-", lit("payload"), col("id"), lit("x" * 48)).as("payload"))
      val small = ns.range(0, 100000L).select(col("id").as("key"),
        concat_ws("_", lit("dim"), col("id")).as("dim"))
      // the measured action keeps the payload column crossing the join
      // shuffle (a bare count() would prune it, leaving only the
      // hyper-compressible key and starving the skew detector of bytes)
      def drain(df: org.apache.spark.sql.DataFrame): Unit =
        df.agg(count(lit(1)), sum(length(col("payload")))).collect()
      def variant(label: String, aqe: Boolean)(mk: => org.apache.spark.sql.DataFrame): Unit = {
        ns.conf.set("spark.sql.adaptive.enabled", aqe.toString)
        drain(mk) // warm: codegen + JIT, no listener
        val durs = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
        val lst = new SparkListener {
          override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
            if (e.taskInfo != null) durs.add(e.taskInfo.duration)
        }
        spark.sparkContext.addSparkListener(lst)
        val t0 = System.nanoTime(); drain(mk)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // the listener bus posts asynchronously
        spark.sparkContext.removeSparkListener(lst)
        import scala.jdk.CollectionConverters._
        val ds = durs.asScala.map(_.toLong).toSeq.sorted
        val p50 = if (ds.isEmpty) 0L else ds(ds.size / 2)
        val mx = if (ds.isEmpty) 0L else ds.last
        val spread = if (p50 == 0L) 0.0 else mx.toDouble / p50
        println(f"[scaleprobe] $label%-24s wall=$wall%.2f s maxTask=${mx}%d ms p50Task=${p50}%d ms spread=$spread%.1f nTasks=${ds.size}%d")
      }
      variant("skew_plain_aqe_off", aqe = false)(large.join(small, "key"))
      variant("skew_plain_aqe_skew", aqe = true)(large.join(small, "key"))
      variant("skew_salted16_aqe_off", aqe = false)(
        graft.operators.Scale.saltedJoin(large, small, "key", 16))
    }
    // ~1000× corpus-chain evidence (round 14): the reliable-strategy chain
    // figures above stop at sf0.1 (100× over sf0.001). Amplify sf0.1's
    // 5000 documents 10× with PERTURBED duplicates (deterministic: copy i
    // keeps the text for i=0 and appends a distinct "dup<i>" tail
    // otherwise, so the copies are NEAR-dups, densifying the shingle/
    // minhash candidate graph — the worst realistic shape for the
    // df-capped equijoins) and run the d43/d47 chains under
    // stageStorage=reliable at sf0.1 and at the 50k-doc amplified point
    // (= 1000× sf0.001's 500 docs). Also records the peak reliable-stage
    // checkpoint footprint per run — the number a cluster operator sizes
    // checkpoint storage with.
    block("amp10x") {
      import org.apache.spark.sql.functions._
      def dirBytes(p: java.nio.file.Path): Long = {
        if (!java.nio.file.Files.exists(p)) return 0L
        val w = java.nio.file.Files.walk(p)
        try w.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally w.close()
      }
      def rmTree(p: java.nio.file.Path): Unit = if (java.nio.file.Files.exists(p)) {
        val w = java.nio.file.Files.walk(p)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally w.close()
      }
      val ampRoot = java.nio.file.Files.createTempDirectory("graft_amp_docs")
      graft.Tables.documents(spark, "/root/testdata/sf0.1")
        .withColumn("__i", explode(array((0 until 10).map(lit): _*)))
        .withColumn("doc_id", col("doc_id") * lit(16L) + col("__i"))
        .withColumn("text", when(col("__i") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" dup"), col("__i").cast("string"))))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("__i")
        .write.mode("overwrite").parquet(s"$ampRoot/documents.parquet")
      spark.conf.set("spark.graft.stageStorage", "reliable")
      val ck = java.nio.file.Files.createTempDirectory("graft_amp_ckpt")
      // try/finally: a failing query run must not leak the ~10× amplified
      // temp dataset (or the checkpoint dir) under java.io.tmpdir
      try {
        for (sf <- Seq("/root/testdata/sf0.1", ampRoot.toString);
             q <- Seq("d43_training_sequences", "d47_training_sequences_winnowed")) {
          def run(): Unit = {
            SparkEntry.queries(q)(spark, sf).count()
            graft.operators.Corpus.releaseStages(spark)
          }
          rmTree(ck); java.nio.file.Files.createDirectories(ck)
          spark.sparkContext.setCheckpointDir(ck.toString)
          run() // warm
          rmTree(ck); java.nio.file.Files.createDirectories(ck)
          spark.sparkContext.setCheckpointDir(ck.toString)
          val t0 = System.nanoTime(); run()
          val dt = (System.nanoTime() - t0) / 1e9
          val ckMb = dirBytes(ck) / 1e6
          val label = q.take(3) + (if (sf == ampRoot.toString) "_amp10x_rel" else "_sf0.1_rel")
          println(f"[scaleprobe] $label%-24s $sf%-40s $dt%.3f s ckptMB=$ckMb%.1f")
        }
      } finally {
        spark.conf.unset("spark.graft.stageStorage")
        rmTree(ck); rmTree(ampRoot)
      }
    }
    // Scale-path crossover (round 15): the catalog carries both the exact
    // and the scale variant of two operator families — d43 exact-shingle
    // vs d47 winnowed corpus chain, x30 union-window as-of vs x34
    // time-bucketed as-of — and the declared bench (sf0.1) only shows the
    // scale variants' FIXED overhead (they do strictly more setup work on
    // small data). This block measures where each scale path starts to
    // WIN: both families at sf0.01 / sf0.1 / a 10×-amplified sf0.1
    // (documents amplified as near-dup copies exactly like the amp10x
    // block — the densest realistic candidate graph; events amplified 10×
    // per user with second-perturbed timestamps — 10× rows per as-of key;
    // every other table symlinked). Default stage strategy (the bench's),
    // min-of-2 after warmup, releaseStages between runs.
    block("crossover") {
      import org.apache.spark.sql.functions._
      def rmTree(p: java.nio.file.Path): Unit = if (java.nio.file.Files.exists(p)) {
        val w = java.nio.file.Files.walk(p)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally w.close()
      }
      // absolutes here carry the usual ±2-3× host noise (recorded loadavg
      // is the discount signal); the WITHIN-run same-sf pairs are the
      // crossover evidence
      println("[scaleprobe] xover_loadavg " +
        java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg")).trim)
      val src = "/root/testdata/sf0.1"
      val ampRoot = java.nio.file.Files.createTempDirectory("graft_xover")
      // try/finally from creation: a failure anywhere (including the
      // amplified writes themselves) must not leak the ~10× documents +
      // events copies under java.io.tmpdir
      try {
      graft.Tables.documents(spark, src)
        .withColumn("__i", explode(array((0 until 10).map(lit): _*)))
        .withColumn("doc_id", col("doc_id") * lit(16L) + col("__i"))
        .withColumn("text", when(col("__i") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" dup"), col("__i").cast("string"))))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("__i")
        .write.mode("overwrite").parquet(s"$ampRoot/documents.parquet")
      graft.Tables.eventsTs(spark, src)
        .withColumn("__i", explode(array((0 until 10).map(lit): _*)))
        .withColumn("event_id", col("event_id") * lit(16L) + col("__i"))
        .withColumn("ts", timestamp_micros(
          unix_micros(col("ts")) + col("__i").cast("long") * lit(1000000L)))
        .drop("__i")
        .write.mode("overwrite").parquet(s"$ampRoot/events.parquet")
      graft.Tables.names.filterNot(Set("documents", "events")).foreach { t =>
        java.nio.file.Files.createSymbolicLink(
          ampRoot.resolve(s"$t.parquet"),
          java.nio.file.Paths.get(s"$src/$t.parquet"))
      }
      for (sf <- Seq("/root/testdata/sf0.01", src, ampRoot.toString);
           q <- Seq("d43_training_sequences", "d47_training_sequences_winnowed",
             "x30_asof_last_order", "x34_asof_bucketed")) {
        def run(): Unit = {
          SparkEntry.queries(q)(spark, sf).count()
          graft.operators.Corpus.releaseStages(spark)
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
        run() // warm
        val t0 = System.nanoTime(); run()
        val t1 = System.nanoTime(); run()
        val dt = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
        val where = if (sf == ampRoot.toString) "amp10x(sf0.1)" else sf
        println(f"[scaleprobe] xover_$q%-34s $where%-28s $dt%.3f s")
      }
      } finally rmTree(ampRoot)
    }
    // Bounded-memory exact quantiles (round 14, batch 7): the
    // order-statistics path (range-repartition + two fetch jobs) vs the
    // single-buffer in-plan `percentile` aggregate, on synthesized data
    // well past the fixture scale (the fixtures top out at 150k rows —
    // the buffering difference only shows with real volume). Values are
    // deterministic (xxhash64 of the row id) and effectively ALL DISTINCT
    // — the continuous-metric case the rewrite targets: Spark's Percentile
    // buffers a (value → count) OpenHashMap, so its footprint is
    // O(distinct values), which for a continuous column IS O(rows), all
    // of it merged into the ONE final aggregation task. (With few distinct
    // values the aggregate's map stays small and it is perfectly fine —
    // that is the d25 histogram insight; this probe measures the case
    // where it is not.) The order-statistics form never holds more than a
    // sorted partition slice. Wall is the recorded signal (both are
    // scan-bound); the probe also cross-checks the two forms bit-equal at
    // every n.
    block("quantile") {
      import org.apache.spark.sql.functions._
      val qs = Seq(0.25, 0.5, 0.75)
      for (n <- Seq(1000000L, 10000000L, 40000000L)) {
        val df = spark.range(n).select(xxhash64(col("id")).cast("double").as("v"))
        var orderstat: Map[Double, Double] = null
        var inplan: Seq[Double] = null
        def timed(label: String)(f: => Unit): Unit = {
          f // warm
          val t0 = System.nanoTime(); f
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[scaleprobe] $label%-24s n=$n%-12d $dt%.3f s")
        }
        timed("quantile_orderstat") {
          orderstat = graft.operators.Metrics.exactPercentiles(df, "v", qs).get
        }
        timed("quantile_inplan_agg") {
          inplan = df.agg(expr(s"percentile(v, array(${qs.mkString(", ")}))"))
            .collect()(0).getSeq[Double](0)
        }
        val eq = qs.zipWithIndex.forall { case (q, i) => orderstat(q) == inplan(i) }
        println(s"[scaleprobe] quantile_bitequal        n=$n $eq")
        require(eq, s"order-statistics quantiles diverged from the aggregate at n=$n")
      }
    }
    // Stratified-split rank (round 14): the partition-offset Split form vs
    // the per-stratum window it replaced, on a synthesized 2-class frame
    // (the churn shape — the worst case for the window, which buffers and
    // sorts each WHOLE STRATUM in one task: two tasks sorting half the
    // data each, regardless of cluster size). Contract parity (exact ceil
    // counts, disjoint cover) is pinned in MlPipelineSpec; this block
    // records the wall-clock shape as data grows.
    block("split") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      for (n <- Seq(1000000L, 4000000L, 16000000L)) {
        val df = spark.range(n).select(col("id"),
          (col("id") % 10 < 3).cast("int").as("label"),
          concat_ws("-", lit("row"), col("id"), lit("x" * 32)).as("payload"))
        // each run localCheckpoints ~n wide rows; drop dead blocks between
        // timed runs (unpersist + GC nudges the async ContextCleaner) so a
        // variant is never timed under the previous one's block-store churn
        def sweep(): Unit = {
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc(); Thread.sleep(500)
        }
        def timed(label: String)(f: => Unit): Unit = {
          f; sweep() // warm: codegen + JIT
          val dts = (1 to 2).map { _ =>
            val t0 = System.nanoTime(); f
            val dt = (System.nanoTime() - t0) / 1e9
            sweep(); dt
          }
          println(f"[scaleprobe] $label%-24s n=$n%-12d ${dts.min}%.3f s")
        }
        timed("split_partition_offset") {
          val (tr, te) = graft.ml.Split.stratified(df, "label", 0.2, 42L)
          tr.count(); te.count()
        }
        timed("split_stratum_window") {
          // the replaced form, inline for the A/B
          val w = Window.partitionBy(col("label")).orderBy(rand(42L))
          val cnt = Window.partitionBy(col("label"))
          val ranked = df
            .withColumn("__rn", row_number().over(w))
            .withColumn("__n", count(lit(1)).over(cnt))
            .localCheckpoint(true)
          ranked.filter(col("__rn") > ceil(col("__n") * 0.2)).count()
          ranked.filter(col("__rn") <= ceil(col("__n") * 0.2)).count()
        }
      }
    }
    // Semantic dedup at constant cell size (round 17): d59's scale claim
    // is "nClusters ~ n/targetCellSize keeps within-cell verification
    // O(n·cellSize)". This block holds cellSize ≈ 500 and grows n past
    // the literal-assignment knee (k = 40 → 160 → 640 centroids; the
    // r17 knee at 64 routed the larger two through the broadcast
    // kernel; since r18 every size takes the kernel).
    // Corpus: synthesized 64-dim vectors, deterministic per id, with an
    // EXACT duplicate planted every 100 ids (id%100==99 copies id−1):
    // background pairs concentrate near cos ≈ 0.75 (all-positive
    // quadrant), far under the 0.99 fence, so the expected drop set is
    // exactly the planted copies — the block ASSERTS recall 1 with the
    // exact keeper map at every n, making it a correctness probe at
    // 40× fixture scale, not just a timer.
    block("semdedup") {
      import org.apache.spark.sql.functions._
      for (n <- Seq(20000L, 80000L, 320000L)) {
        val emb = spark.range(n).select(
          col("id").as("vec_id"),
          expr("transform(sequence(0, 63), j -> " +
            "CAST(CAST(xxhash64(CASE WHEN id % 100 = 99 THEN id - 1 ELSE id END, j) % 1000000 AS DOUBLE) / 1000000.0 AS FLOAT))")
            .as("embedding"))
        // NOT checkpointed: the corpus is a pure function of range(n) —
        // recomputing it is cheap and keeps the between-run block sweep
        // below from killing a shared checkpoint under a later run
        val k = (n / 500L).toInt
        def run(): Long = {
          val out = graft.operators.Similarity
            .semanticDedup(emb, nClusters = k, minSim = 0.99)
          val bad = out.filter(col("keeper_id") =!= col("vec_id") - 1L).count()
          val drops = out.count()
          require(bad == 0L, s"$bad drops with a non-planted keeper at n=$n")
          require(drops == n / 100L,
            s"expected ${n / 100L} planted drops at n=$n, got $drops")
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          drops
        }
        run() // warm
        val t0 = System.nanoTime(); run()
        val t1 = System.nanoTime(); run()
        val dt = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
        println(f"[scaleprobe] semdedup_cell500        n=$n%-12d k=$k%-6d $dt%.3f s (recall 1 asserted)")
      }
    }
    // SemDeDup hot-cell bound (round 20, r19 verdict #1): a PLANTED hot
    // cell — 25k diverse-direction vectors the quantizer under-segments
    // into ONE cell (cell 0), inside a 250k corpus whose other 225k rows
    // spread over 31 far-away cells — with a near-identical dup planted
    // every 100 hot ids. Measures the within-cell path A/B: exhaustive
    // self-join (hotCellThreshold = MaxValue) vs the OR-amplified LSH
    // sub-shard (threshold 20k), asserting planted recall 1 WITH exact
    // keepers in BOTH modes, and reports the analytic pair-work bound:
    // unbanded = hot²/2; banded = Σ_{cell,band} bucket·(bucket−1)/2 over
    // the same HyperplaneBits signature the operator uses (diverse
    // directions → cross pairs at cos ≈ 0 rarely share a 13-bit band,
    // so the planted regime shatters toward hot²/2^b · L).
    // MEASURED r20 (quiet host, shardPlan(0.99) = L=4 × b=13):
    //   hotcell_banded      20.8 s   recall 1 + exact keepers
    //   hotcell_exhaustive 278.1 s   recall 1 + exact keepers
    //   pair bound: 312,487,500 exhaustive vs <= 6,014,980 banded (52x;
    //   the uniform-bucket ideal is ~3e5 — the [-0.5,0.5]^64 cloud's
    //   correlated sign bits skew buckets ~20x off ideal, still 52x
    //   fewer pairs and 13.4x wall)
    block("hotcell") {
      import org.apache.spark.sql.functions._
      val nHot = 25000L
      // cold population sized so its own exhaustive within-cell work
      // (31 cells x ~800 rows = 1e7 pairs) stays two orders below the
      // hot cell's 3.1e8 -- the probe measures the HOT path A/B, not a
      // cold-cell floor common to both modes
      val n = 50000L
      val dim = 64
      // hot rows: symmetric noise around the origin (diverse directions);
      // planted dup every 100th hot id = exact copy of its predecessor.
      // cold rows: 1000·e_{1+id%31} + 300-scaled noise — nearest centroid
      // is their own (noise ≪ 1000), and within-cell cosine ≈ 0.67 stays
      // far under the 0.99 fence (no accidental cold drops).
      val emb = spark.range(n).select(
        col("id").as("vec_id"),
        expr(s"""transform(sequence(0, ${dim - 1}), j -> CAST(
          CASE WHEN id < $nHot THEN
            CAST(xxhash64(CASE WHEN id % 100 = 99 THEN id - 1 ELSE id END, j) % 1000000 AS DOUBLE) / 1000000.0 - 0.5
          ELSE
            300.0 * (CAST(xxhash64(id, j) % 1000000 AS DOUBLE) / 1000000.0 - 0.5)
            + CASE WHEN j = 1 + CAST(id % 31 AS INT) THEN 1000.0 ELSE 0.0 END
          END AS FLOAT))""").as("embedding"))
      // NOT checkpointed: pure function of range(n) — the between-run
      // blanket unpersist would kill a shared checkpoint (semdedup
      // block precedent)
      val centroids: Array[Array[Double]] = Array.tabulate(32) { c =>
        Array.tabulate(dim)(j => if (c >= 1 && j == c) 1000.0 else 0.0)
      }
      def run(threshold: Int): Long = {
        val out = graft.operators.Similarity.semanticDedup(
          emb, nClusters = 32, minSim = 0.99,
          precomputedCentroids = Some(centroids),
          hotCellThreshold = threshold)
        val rows = out.collect()
        require(rows.length == (nHot / 100L).toInt,
          s"expected ${nHot / 100} planted drops, got ${rows.length}")
        require(rows.forall(r =>
          r.getAs[Long]("keeper_id") == r.getAs[Long]("vec_id") - 1L),
          "a planted drop has a non-planted keeper")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        rows.length.toLong
      }
      for ((label, threshold) <- Seq(("banded", 20000), ("exhaustive", Int.MaxValue))) {
        run(threshold) // warm
        val t0 = System.nanoTime(); run(threshold)
        val t1 = System.nanoTime(); run(threshold)
        val dt = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
        println(f"[scaleprobe] hotcell_$label%-14s hot=$nHot%-8d n=$n%-8d $dt%.3f s (recall 1 + keepers asserted)")
      }
      // analytic pair-work bound: rebuild the operator's band signature
      // (same seed formula and auto (L, b) plan at minSim .99) and
      // histogram the (cell, band, bucket) populations
      val (shardBands, shardBits) =
        graft.operators.Similarity.shardPlan(0.99)
      val allPlanes: Seq[Seq[Double]] = (0 until shardBands).flatMap { t =>
        val rng = new scala.util.Random(42L + 1000003L * (t + 1))
        Seq.fill(shardBits)(Seq.fill(dim)(rng.nextGaussian()))
      }
      val bitsCol = org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.HyperplaneBits(
          org.apache.spark.sql.GraftColumnBridge.expression(col("embedding")),
          allPlanes))
      val mask = (1L << shardBits) - 1L
      val bandCols = (0 until shardBands).map(t =>
        s"${t.toLong << 32}L + (shiftrightunsigned(__bits, ${t * shardBits}) & ${mask}L)")
      val bandedPairs = emb.where(col("vec_id") < nHot)
        .withColumn("__bits", bitsCol)
        .select(explode(expr(bandCols.mkString("array(", ", ", ")"))).as("band"))
        .groupBy(col("band")).agg(count(lit(1)).as("c"))
        .select(sum((col("c") * (col("c") - 1) / lit(2)).cast("long")).as("pairs"))
        .head().getLong(0)
      val exhaustivePairs = nHot * (nHot - 1) / 2
      println(f"[scaleprobe] hotcell_pair_bound      exhaustive=$exhaustivePairs%-12d banded<=$bandedPairs%-12d (${exhaustivePairs.toDouble / bandedPairs}%.1fx fewer)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // BPE trainer knee A/B (round 20, r19 verdict #2): 10^5 word types —
    // the production-vocabulary regime where the naive full-recount loop
    // (O(types · wordLen) PER MERGE, single-threaded on the driver) is
    // the knee. Asserts the incremental trainer bit-identical to the
    // naive reference at this scale and reports both walls + the naive
    // extrapolation to a 32k-merge production run. Both timings include
    // the same distributed word-count pass (identical cost, cancels in
    // the ratio).
    // MEASURED r20 (quiet host): word counts 21.2 s (distributed,
    // common); merge loop at 500 merges — incremental 21.2 s (42 ms/
    // merge) vs naive 133.1 s (266 ms/merge, 6.3x) → naive ~142 min at
    // 32k merges where the incremental loop's per-merge cost FALLS as
    // merges leave the Zipf head (each round touches only words
    // containing the merged pair).
    block("bpe") {
      import org.apache.spark.sql.functions._
      // ~150k word TYPES rendered as base-36 strings of a type-keyed hash:
      // diverse symbol pairs (not a 11-char digit alphabet where every
      // pair occurs in every word — that shape makes EVERY trainer
      // O(types) per merge and measures nothing but constant factors)
      val docs = spark.range(200000L).select(
        col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 29), j -> " +
          "conv(CAST(pmod(xxhash64(pmod(xxhash64(id, j), 150000)), 60466176) " +
          "AS STRING), 10, 36)), ' ')")
          .as("text"))
      val types = 100000
      val nMerges = 500
      def timed[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
      }
      // decompose: the distributed word-count pass is common to both
      // trainers (and the only corpus-size-dependent cost) — time it
      // separately so the per-merge driver-loop walls are honest
      val (_, dtCounts) = timed(
        graft.operators.Vocab.wordCounts(docs, types).collect())
      val (fast, dtFastAll) = timed(
        graft.operators.Vocab.bpeTrainMerges(docs, nMerges, types))
      val (ref, dtNaiveAll) = timed(
        graft.operators.Vocab.bpeTrainMergesNaive(docs, nMerges, types))
      require(fast == ref,
        "incremental BPE trainer diverged from the naive reference at probe scale")
      require(fast.length == nMerges, s"early stop at ${fast.length} merges")
      val dtFast = math.max(0.0, dtFastAll - dtCounts)
      val dtNaive = math.max(0.0, dtNaiveAll - dtCounts)
      println(f"[scaleprobe] bpe_word_counts         types=$types $dtCounts%.3f s (distributed pass, common)")
      println(f"[scaleprobe] bpe_train_incremental   types=$types merges=$nMerges $dtFast%.3f s merge-loop")
      println(f"[scaleprobe] bpe_train_naive         types=$types merges=$nMerges $dtNaive%.3f s merge-loop " +
        f"(${dtNaive / math.max(dtFast, 1e-3)}%.1fx slower; naive loop ~${dtNaive / nMerges * 32000 / 60}%.0f min at 32k merges)")
    }
    // Quantizer training at the promised SemDeDup regime (round 18): the
    // r17 verdict's top finding was that the fixed 10k training sample
    // silently degenerates k-means++ past k ≈ 10k (duplicate/starved
    // centroids → concentrated cells → quadratic within-cell self-join).
    // This block runs the NEW auto-routed trainer at k = 5000 (sample
    // target 100k → work knee → distributed Lloyd's) over a 250k-vector
    // 64-dim corpus with an exact duplicate planted every 100 ids, and
    // asserts the three properties the fix promises: exactly k DISTINCT
    // centroids (no silent duplication), balanced cells (max/avg bounded,
    // few empties — the O(n·avgCell) self-join bound's precondition), and
    // recall 1 through semanticDedup with the trained quantizer.
    block("quantizer") {
      import org.apache.spark.sql.functions._
      val n = 250000L
      val k = 5000
      val emb = spark.range(n).select(
        col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> " +
          "CAST(CAST(xxhash64(CASE WHEN id % 100 = 99 THEN id - 1 ELSE id END, j) % 1000000 AS DOUBLE) / 1000000.0 AS FLOAT))")
          .as("embedding"))
      require(!graft.operators.Similarity.trainsOnDriver(k),
        "k=5000 must route to the distributed trainer")
      val t0 = System.nanoTime()
      val centroids = graft.operators.Similarity.trainIvfCentroids(emb, k)
      val trainS = (System.nanoTime() - t0) / 1e9
      require(centroids.length == k, s"expected $k centroids, got ${centroids.length}")
      require(centroids.map(_.toSeq).distinct.length == k,
        "duplicate centroids — the degeneration the k-scaled sample must prevent")
      val assigned = graft.operators.Similarity.assignCells(
        emb.where(col("embedding").isNotNull), centroids)
      val sizes = assigned.groupBy(col("cell")).count()
        .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getLong(1))
        .filter(_._1 >= 0).map(_._2)
      val maxC = sizes.max; val avg = sizes.sum.toDouble / k
      val empties = k - sizes.length
      println(f"[scaleprobe] quantizer_k5000_train   n=$n%-9d $trainS%.1f s maxCell=$maxC avgCell=$avg%.1f ratio=${maxC / avg}%.1f empty=$empties")
      require(maxC / avg <= 20.0, s"unbalanced cells: max/avg = ${maxC / avg}")
      require(empties <= k / 10, s"$empties of $k cells empty — starved quantizer")
      val t1 = System.nanoTime()
      val out = graft.operators.Similarity.semanticDedup(emb, k, minSim = 0.99,
        precomputedCentroids = Some(centroids))
      val bad = out.filter(col("keeper_id") =!= col("vec_id") - 1L).count()
      val drops = out.count()
      val dedupS = (System.nanoTime() - t1) / 1e9
      require(bad == 0L && drops == n / 100L,
        s"recall broken at k=$k: $drops drops ($bad non-planted), expected ${n / 100}")
      println(f"[scaleprobe] quantizer_k5000_dedup   n=$n%-9d $dedupS%.1f s (recall 1 asserted)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // PQ/ADC at 125× fixture scale (round 18): the memory-bounded ANN
    // leg's A/B — exact brute-force cosine vs full-scan ADC vs IVF-PQ on
    // the same 250k×64-dim corpus with an exact duplicate planted every
    // 100 ids. Planted recall is ASSERTED for the PQ paths (an exact
    // copy shares codes, so its ADC distance to its base is the self-
    // distance floor); the recorded signal is the wall-time and the
    // index width (16 code bytes vs 256 vector bytes — at 100 TB that
    // factor is what keeps the scanned index in page cache).
    block("pq") {
      import org.apache.spark.sql.functions._
      val n = 250000L
      val emb = spark.range(n).select(
        col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> " +
          "CAST(CAST(xxhash64(CASE WHEN id % 100 = 99 THEN id - 1 ELSE id END, j) % 1000000 AS DOUBLE) / 1000000.0 AS FLOAT))")
          .as("embedding"))
        .localCheckpoint(true)
      def planted(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
        // every planted copy (vec_id % 100 == 99) must rank its base as
        // top-1: identical codes → ADC distance = the base's own
        // quantization floor, strictly below any non-copy at these n
        val top1 = df.filter(col("rank") === 1L &&
          pmod(col("query_id"), lit(100L)) === 99L)
        val bad = top1.filter(col("nbr_id") =!= col("query_id") - 1L).count()
        require(bad == 0L, s"$label: $bad planted copies missed their base at top-1")
      }
      def timed(label: String)(f: => Unit): Unit = {
        f // warm
        val t0 = System.nanoTime(); f
        val t1 = System.nanoTime(); f
        val dt = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
        println(f"[scaleprobe] $label%-24s n=$n%-9d $dt%.3f s")
      }
      // query set: 200 queries including two planted copies (99, 199)
      timed("pq_bruteforce_cosine") {
        graft.operators.Similarity.bruteForceTopK(emb, 200, 5).count()
      }
      val books = graft.operators.Similarity.trainPqCodebooks(emb, 64)
      timed("pq_adc_fullscan") {
        val r = graft.operators.Similarity.pqTopK(emb, 64, 200, 5,
          precomputedCodebooks = Some(books))
        planted(r, "pq_adc")
      }
      // build-once query path (the production shape — both quantizers
      // precomputed, like an ingest-time saveIvfIndex/savePqCodebooks):
      // what a repeated query actually costs
      val coarse = graft.operators.Similarity.trainIvfCentroids(emb, 64)
      timed("pq_ivfadc_probed") {
        val r = graft.operators.Similarity.ivfPqTopK(emb, 64, 200, 5,
          nLists = 64, nProbe = 8,
          precomputedCentroids = Some(coarse), precomputedCodebooks = Some(books))
        planted(r, "ivfpq")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // D4 scored-pair exchange A/B (round 19): partition-local bounded
    // selection ON vs OFF on the 250k×64 corpus with 20 queries — the
    // unpruned form shuffles one scored row per (corpus row, query)
    // into the rank exchange (5M rows here, of which 100 survive); the
    // pruned form shuffles O(partitions · queries · k). Asserts
    // bit-identity between the two paths at probe scale and records
    // wall time + shuffle-write bytes.
    block("topk") {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
      import org.apache.spark.sql.functions._
      val n = 250000L
      val emb = spark.range(n).select(
        col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> " +
          "CAST(CAST(xxhash64(id, j) % 1000000 AS DOUBLE) / 1000000.0 AS FLOAT))")
          .as("embedding"))
        .localCheckpoint(true)
      var results = Map.empty[String, Seq[String]]
      // listener-bus task-end events are delivered asynchronously and from
      // multiple dispatcher threads: the counter must be an AtomicLong (a
      // volatile += is a lost-update race) and the bus must be DRAINED
      // before the figure is read or the listener removed, or late events
      // under-count (r19 advice). LiveListenerBus.waitUntilEmpty is
      // private[spark] — bytecode-public, so the probe reaches it
      // reflectively; on any failure it falls back to polling the counter
      // until stable.
      def drainListenerBus(): Unit = {
        val sc = spark.sparkContext
        try {
          val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
          bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
        } catch {
          case scala.util.control.NonFatal(_) => Thread.sleep(2000)
        }
      }
      for (mode <- Seq("off", "on")) {
        spark.conf.set("spark.graft.topkPrune", mode)
        val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0L)
        val listener = new SparkListener {
          override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
            if (e.taskMetrics != null)
              shuffleWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
        spark.sparkContext.addSparkListener(listener)
        def run(): Array[String] =
          graft.operators.Similarity.bruteForceTopK(emb, 20, 5)
            .collect().map(_.toString)
        run() // warm
        drainListenerBus()
        shuffleWrite.set(0L)
        val t0 = System.nanoTime()
        val rows = run()
        val dt = (System.nanoTime() - t0) / 1e9
        drainListenerBus()
        spark.sparkContext.removeSparkListener(listener)
        results += mode -> rows.toSeq
        println(f"[scaleprobe] topk_prune_$mode%-14s n=$n%-8d $dt%.3f s " +
          f"shuffleWrite=${shuffleWrite.get() / 1e6}%.2f MB rows=${rows.length}")
      }
      require(results("off") == results("on"),
        "partition-local top-k pruning diverged from the unpruned rank at probe scale")
      println("[scaleprobe] topk_prune bit-identity asserted (off == on)")
      spark.conf.unset("spark.graft.topkPrune")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // d45 cost decomposition (round 19, verdict #5): is the audit's cost
    // the stage chain (d43's own floor — eager checkpoint jobs + the
    // component loop's per-round count+checkpoint) or the audit
    // aggregates? Times (a) the stage chain alone, (b) the six 1-row
    // audit aggregates on ALREADY-materialized stages, (c) declared d45
    // end-to-end. If (b) ≈ ε and (c) ≈ (a) + ε, the floor is the chain
    // and d45 is already at the d43+ε shape the audit promises.
    block("audit") {
      val rates = Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1)
      for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
        val docs = graft.Tables.documents(spark, sf)
        def timed(label: String)(f: => Unit): Unit = {
          f // warm
          val t0 = System.nanoTime(); f
          val t1 = System.nanoTime(); f
          val dt = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
          println(f"[scaleprobe] $label%-24s $sf%-26s $dt%.3f s")
        }
        timed("audit_stage_chain") {
          graft.operators.Corpus.stages(docs, rates).packed.count()
          graft.operators.Corpus.releaseStages(spark)
        }
        val s = graft.operators.Corpus.stages(docs, rates)
        s.packed.count()
        timed("audit_aggregates_only") {
          graft.operators.Corpus.auditOf(docs, s).count()
        }
        graft.operators.Corpus.releaseStages(spark)
        timed("audit_d45_declared") {
          SparkEntry.queries("d45_pipeline_audit")(spark, sf).count()
          graft.operators.Corpus.releaseStages(spark)
        }
      }
    }
    // componentSplit + connectedComponents end-to-end at amplified scale
    // (round 18): sf0.1's documents amplified 1× / 4× / 16× with near-dup
    // copies wired as star-edge components (the component STRUCTURE the
    // minhash/winnow pipelines emit — their candidate-generation cost is
    // probed separately in `queries`/`amp10x`). Asserts the leak
    // invariant END-TO-END at every step (no component straddles
    // train/test — copies have different text, so their own-hash splits
    // WOULD straddle without the rep fence) and records cost across two
    // 4× steps, which should stay near-linear: the path is min-label
    // propagation (O(diameter) rounds, star diameter 2) plus two id-keyed
    // narrow equijoins and the zero-shuffle fence.
    block("compsplit") {
      import org.apache.spark.sql.functions._
      val src = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      val nBase = src.count()
      for (amp <- Seq(1, 4, 16)) {
        val docs = src
          .withColumn("__i", explode(array((0 until amp).map(lit): _*)))
          .withColumn("doc_id", col("doc_id") * lit(32L) + col("__i"))
          .withColumn("text", when(col("__i") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" dup"), col("__i").cast("string"))))
          .drop("__i")
          .localCheckpoint(true) // isolate generation cost from the timed path
        val nodes = docs.select(col("doc_id").as("id"))
        val edges = docs.filter(pmod(col("doc_id"), lit(32L)) =!= 0L)
          .select((col("doc_id") - pmod(col("doc_id"), lit(32L))).as("id_a"),
            col("doc_id").as("id_b"))
        def run(): Unit = {
          val split = graft.operators.TextOps.componentSplit(docs,
            graft.operators.Dedup.connectedComponents(nodes, edges))
            .localCheckpoint(true)
          val straddle = split.groupBy(col("rep_id"))
            .agg(countDistinct(col("split")).as("k"))
            .filter(col("k") > 1).count()
          require(straddle == 0L, s"$straddle components straddle splits at amp$amp")
          val reps = split.select(col("rep_id")).distinct().count()
          require(reps == nBase,
            s"expected $nBase components at amp$amp, got $reps")
        }
        run() // warm
        val t0 = System.nanoTime(); run()
        val t1 = System.nanoTime(); run()
        val dt = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
        println(f"[scaleprobe] compsplit_amp$amp%-11d docs=${nBase * amp}%-8d $dt%.3f s (leak invariant asserted)")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
