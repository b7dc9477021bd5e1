package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB case:
  *
  *  - exact: one hash-aggregate on a content fingerprint (no pairwise work).
  *  - MinHash+LSH: shingle → k-permutation minhash signature → banded
  *    bucket join, so candidate generation is a groupBy + self-join inside
  *    tiny buckets instead of an O(n²) cross join; exact Jaccard verify
  *    only on candidates.
  *  - SimHash: 64-bit signature + banded blocking on 16-bit chunks
  *    (Hamming-distance ≤ 3 ⇒ at least one of 4 chunks identical).
  *  - embedding cosine: random-hyperplane LSH buckets, verify by exact
  *    cosine.
  *
  * Everything is seeded/deterministic (hash-derived "randomness"), pure
  * column expressions, no UDFs — except the one documented Bloom-filter
  * membership probe in [[bloomIncrementalDedup]], which wraps a broadcast
  * sketch lookup that public API cannot express as a column.
  */
object Dedup {

  /** The per-doc shingle-set relation is within a small constant factor of
    * the raw text bytes (8-byte hash per token vs ~6 text bytes per token),
    * so the source relation's size estimate stands in for the set
    * relation's when deciding the verify-join strategy.
    */
  private val SetsBroadcastFactor = 4

  /** Size-based auto choice for the verify-join strategy: broadcast the
    * per-doc set relation only when the SOURCE relation's optimizer size
    * estimate fits the session's broadcast threshold (scaled by
    * [[SetsBroadcastFactor]]). A hardcoded `broadcastSets = true` at a
    * call site is a 100 TB foot-gun — same reasoning as
    * [[VectorOps.cosinePairsTopKAuto]]'s explicit dispatch. Respects
    * `spark.sql.autoBroadcastJoinThreshold = -1` (broadcast disabled).
    */
  private[graft] def autoBroadcastSets(df: DataFrame): Boolean = {
    val confVal = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    if (confVal.startsWith("-")) false
    else {
      val threshold =
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(confVal)
      df.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(threshold) * SetsBroadcastFactor
    }
  }

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group rows by normalized-content fingerprint; emit one
    * row per distinct content with the smallest id as the keeper plus the
    * duplicate count. Single shuffle on the 128-bit fingerprint.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Rows surviving exact dedup (keep-smallest-id per fingerprint). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(
      exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** Per-group dedup observability (the report every corpus pipeline
    * publishes next to its dedup stage): for each `groupCol` value, how
    * many rows existed, how many survive exact dedup, how many were
    * duplicates. Keepers are chosen GLOBALLY (smallest id per content
    * fingerprint), so a group whose content duplicates another group's
    * keeper counts its copies as dupes — cross-source duplication is
    * visible, not hidden.
    */
  def dedupReport(df: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    val kept = exactDedup(df.select(col(idCol), col(textCol)), idCol, textCol)
      .select(col(idCol), lit(1L).as("__kept"))
    df.join(kept, Seq(idCol), "left")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("__kept"), lit(0L))).as("n_kept"))
      .withColumn("n_dupes", col("n_docs") - col("n_kept"))
  }

  /** Incremental exact dedup — the streaming-batch shape of a corpus
    * pipeline: a NEW batch dedups against the EXISTING corpus (anti-join
    * on the content fingerprint; the corpus side reduces to its distinct
    * fingerprints, so at 100 TB this is a semi-join against a fingerprint
    * index, not a full-corpus scan per batch) and then within itself
    * (keep-smallest-id per fingerprint). Returns the surviving batch rows
    * with their fingerprint.
    */
  def incrementalDedup(
      batch: DataFrame, corpus: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bfp = batch.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
    val cfp = corpus.select(TextAnalysis.fingerprint(col(textCol)).as("fp")).distinct()
    val novel = bfp.join(cfp, Seq("fp"), "left_anti")
    graft.operators.Browse.keepFirst(novel, Seq("fp"), col(idCol).asc)
  }

  /** Bloom-prefiltered incremental dedup — the batch-vs-corpus anti-join
    * of [[incrementalDedup]] with a broadcast Bloom filter of the corpus
    * fingerprint index in front of it, the standard 100 TB shape: a Bloom
    * filter has NO false negatives, so any batch row whose fingerprint the
    * filter rejects is provably new and never enters the join; only the
    * (tiny) maybe-seen slice — true duplicates plus `fpp` false positives —
    * pays the anti-join shuffle. The result is therefore EXACTLY equal to
    * [[incrementalDedup]] for every `fpp`, which is what makes this
    * oracle-checkable: the sketch changes the plan, never the answer.
    *
    * Sizing: ~1.2 bytes/item at fpp=1%, so a 10^9-fingerprint corpus index
    * broadcasts at ~1.2 GB — at larger corpora raise `fpp` (2 passes of
    * this prefilter at 10% still drop 90% of novel rows from the shuffle)
    * or shard the filter. The filter is sized from `corpusCount` when the
    * caller provides one (the production path: an incrementally-maintained
    * fingerprint index knows its own cardinality) and from a `count()`
    * pass otherwise; the count only SIZES the sketch — any positive value
    * keeps the result exact, a low-ball merely raises the effective fpp
    * (more rows pay the join), never drops a row.
    *
    * The membership probe is the one deliberate UDF in this file: a
    * broadcast `org.apache.spark.util.sketch.BloomFilter` lookup cannot be
    * written as a column expression against public API, and Spark's own
    * injected runtime filters (`spark.sql.optimizer.runtime.bloomFilter.*`)
    * are this exact shape internally. The UDF body is a bit-test — no
    * serialization-heavy work per row.
    */
  def bloomIncrementalDedup(
      batch: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
      fpp: Double = 0.01, corpusCount: Option[Long] = None): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp=$fpp must be in (0,1)")
    require(corpusCount.forall(_ > 0),
      s"corpusCount=$corpusCount must be positive when provided")
    val spark = batch.sparkSession
    val bfp = batch.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
    // The persist covers the eager pass(es) here (filter build, plus the
    // sizing count when no corpusCount was provided); the lazy anti-join
    // below re-reads the index at execution time, the same per-batch cost
    // incrementalDedup already pays — a production pipeline points both
    // at a materialized fingerprint-index table.
    val cfp = corpus.select(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .distinct().persist()
    try {
      val n = corpusCount.getOrElse(math.max(1L, cfp.count()))
      val bloom = cfp.stat.bloomFilter("fp", n, fpp)
      // tracked: per-batch callers would otherwise accumulate GB-scale
      // sketches on every executor until driver GC; drain() unpersists
      // executor copies (driver value survives, lazy plans re-broadcast)
      val bc = CacheRegistry.trackBroadcast(
        spark.sparkContext.broadcast(bloom))
      val maybeSeen =
        udf((fp: String) => fp != null && bc.value.mightContainString(fp))
      // definitely-new rows skip the shuffle entirely (no false negatives)
      val definitelyNew = bfp.filter(!maybeSeen(col("fp")))
      val confirmedNew =
        bfp.filter(maybeSeen(col("fp"))).join(cfp, Seq("fp"), "left_anti")
      val novel = definitelyNew.unionByName(confirmedNew)
      graft.operators.Browse.keepFirst(novel, Seq("fp"), col(idCol).asc)
    } finally cfp.unpersist(blocking = false)
  }

  /** Incremental FUZZY dedup — the near-duplicate tier of
    * [[incrementalDedup]]: a batch document is suppressed when its
    * exact shingle-Jaccard similarity reaches `threshold` against ANY
    * already-indexed corpus document, or against a LOWER-id document of
    * the same batch (so a batch containing three near-copies admits
    * exactly its min-id one, matching [[incrementalDedup]]'s
    * keep-first-by-id convention). Returns the batch rows that survive;
    * append their text (or shingle index) to the corpus and call again
    * on the next batch — the incremental loop a crawl-fed pipeline
    * runs, with EXACT set-similarity semantics, so the whole operator
    * is oracle-checkable (unlike the recall-probabilistic MinHash/LSH
    * tier it complements).
    *
    * Suppression is deliberately one-pass, not sequential-greedy: a
    * batch doc whose only near neighbor is a lower-id batch doc that
    * was ITSELF suppressed still drops — suppression-biased (never
    * admits a document the sequential semantics would have dropped),
    * deterministic, and free of the fixpoint iteration the sequential
    * rule would need.
    *
    * Contract: `idCol` values must be DISJOINT between batch and
    * corpus (partner classification is by id). Sub-`shingleN`-token
    * docs carry one whole-text shingle (the [[shingleRows]] fallback),
    * so short — even empty — docs still compare exactly.
    *
    * Scale shape: pair generation is [[prefixJaccardPairs]] over the
    * batch∪corpus union with the candidate join RESTRICTED to pairs
    * touching a batch id (`probeIds`) — corpus×corpus bucket pairs,
    * which both suppression branches would discard anyway, are never
    * generated or verified, so the dominant per-batch cost follows the
    * batch size, not the corpus. At a 100 TB index, point the union's
    * corpus side at the materialized shingle-set/index table rather
    * than re-shingling the raw corpus each batch.
    */
  def incrementalJaccardDedup(
      batch: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.7,
      broadcastSets: Option[Boolean] = None): DataFrame = {
    val u = batch.select(col(idCol), col(textCol))
      .unionByName(corpus.select(col(idCol), col(textCol)))
    val batchIds = batch.select(col(idCol)).distinct()
    val corpusIds = corpus.select(col(idCol)).distinct()
    // persisted: the pair relation feeds BOTH suppression branches —
    // unpersisted, each branch re-runs the whole AllPairs prefix join
    // (sf0.1: 11.6 s unpersisted in the catalog; 2.4 s probe floor
    // with the persist)
    val pairs = CacheRegistry.track(
      prefixJaccardPairs(u, idCol, textCol, shingleN, threshold,
        broadcastSets, probeIds = Some(batchIds)).persist())
    // pairs are (id_a < id_b): the id_b side of ANY pair is suppressed
    // when it is a batch doc (its partner is either corpus, or a
    // lower-id batch doc); the id_a side only when the partner is corpus
    val supHigh = pairs
      .join(batchIds.withColumnRenamed(idCol, "id_b"), "id_b")
      .select(col("id_b").as(idCol))
    val supLow = pairs
      .join(batchIds.withColumnRenamed(idCol, "id_a"), "id_a")
      .join(corpusIds.withColumnRenamed(idCol, "id_b"), "id_b")
      .select(col("id_a").as(idCol))
    batch.join(supHigh.union(supLow).distinct(), Seq(idCol), "left_anti")
  }

  /** EXACT edit-distance similarity join (the PassJoin idea — Li et
    * al., ICDE 2011 — with content-anywhere candidate matching):
    * pairs of strings with Levenshtein distance ≤ `maxEdits`, found
    * without an all-pairs scan. Pigeonhole over edits: split every
    * string into `maxEdits + 1` even segments — an optimal alignment
    * with ≤ k edits leaves at least one segment untouched, so that
    * segment occurs VERBATIM as a substring of the partner. Candidates
    * are therefore `(substring of a) = (segment of b)` equi-join hits:
    * the index side carries each string's k+1 segments; the probe side
    * enumerates every substring of each string at the segment lengths
    * its possible partners (length within ±k — a cheap proven prune)
    * could have. Survivors verify with the THRESHOLDED Levenshtein
    * (O(k·n) banded, not O(n²)) — perfect recall, exact distances.
    *
    * Returns `(id_a, id_b, edits)` with `id_a < id_b` (ids must be
    * orderable). Designed for short-string relations — titles, names,
    * URLs, lines: probe enumeration is O(L·k) rows per string, the
    * right trade when L is tens of characters (for whole-document
    * near-dup at corpus scale, the shingle tiers are the path).
    *
    * Degenerate-population hardening: identical strings are collapsed
    * to their min-id representative BEFORE both tiers — an
    * identical-string clique (boilerplate titles, empty strings — NOT
    * rare in dirty corpora) otherwise concentrates quadratic candidate
    * mass in one content bucket. Within-group pairs are distance 0 by
    * construction and come straight off the group relation
    * (equi-join on the group key, output-sensitive); cross-group
    * distances are computed once per DISTINCT string pair and expanded
    * back to members by two more equi-joins. Strings shorter than
    * k+1 characters (where the pigeonhole cannot anchor — every
    * segment can be edited away) pair through a brute tier over the
    * distinct tiny strings, guarded by [[BruteForceMaxRows]] (loud
    * refusal, never a silent quadratic join), so recall stays perfect
    * for ALL lengths, empty strings included.
    */
  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String,
      maxEdits: Int): DataFrame = {
    require(maxEdits >= 1 && maxEdits <= 8,
      s"maxEdits=$maxEdits must be in [1, 8] — the probe enumeration " +
        "grows with k; larger radii want the shingle tiers")
    val k = maxEdits
    val all = df.select(col(idCol), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
    // collapse identical strings: one representative row per distinct
    // string; members rejoin at the end
    val groups = CacheRegistry.track(
      all.groupBy(col("__s"))
        .agg(min(col(idCol)).as("__rep"))
        .withColumn("__L", length(col("__s")))
        .persist())
    val members = CacheRegistry.track(
      all.join(groups.select(col("__s"), col("__rep")), "__s")
        .select(col(idCol), col("__rep"))
        .persist())
    // distance-0 pairs inside each identical-string group
    val zero = members.select(col("__rep").as("__g"), col(idCol).as("id_a"))
      .join(members.select(col("__rep").as("__g"), col(idCol).as("id_b")),
        "__g")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("edits"))
    // both tiers below run over representatives only (distinct strings)
    val reps = groups.select(col("__rep").as("__rid"), col("__s"), col("__L"))
    val s = reps.filter(col("__L") >= 1)
    val segs = s.select(col("__rid").as("__idx_id"),
        explode(array((0 to k).map { i =>
          val st = floor(lit(i) * col("__L") / (k + 1)).cast("int")
          val en = floor(lit(i + 1) * col("__L") / (k + 1)).cast("int")
          col("__s").substr(st + 1, en - st)
        }: _*)).as("__seg"))
      .filter(length(col("__seg")) >= 1)
      .distinct()
    // candidate segment lengths of any partner with |ΔL| <= k
    val lens = s.select(col("__rid").as("__probe_id"), col("__s"), col("__L"),
        explode(array_distinct(flatten(array((0 to k).map { i =>
          array((-k to k).map { d =>
            val lb = col("__L") + d
            (floor(lit(i + 1) * lb / (k + 1)) -
              floor(lit(i) * lb / (k + 1))).cast("int")
          }: _*)
        }: _*)))).as("__len"))
      .filter(col("__len") >= 1 && col("__len") <= col("__L"))
    val probes = lens.select(col("__probe_id"),
        explode(transform(sequence(lit(0), col("__L") - col("__len")),
          p => col("__s").substr(p + 1, col("__len")))).as("__seg"))
      .distinct()
    val cand = probes.join(segs, "__seg")
      .filter(col("__probe_id") =!= col("__idx_id"))
      .select(
        least(col("__probe_id"), col("__idx_id")).as("id_a"),
        greatest(col("__probe_id"), col("__idx_id")).as("id_b"))
      .distinct()
    val sa = s.select(col("__rid").as("id_a"), col("__s").as("__sa"),
      col("__L").as("__la"))
    val sb = s.select(col("__rid").as("id_b"), col("__s").as("__sb"),
      col("__L").as("__lb"))
    val main = cand.join(sa, "id_a").join(sb, "id_b")
      .filter(abs(col("__la") - col("__lb")) <= k)
      .withColumn("edits", levenshtein(col("__sa"), col("__sb"), k))
      .filter(col("edits") >= 0)
      .select(col("id_a"), col("id_b"), col("edits").cast("long").as("edits"))
    // the pigeonhole can only anchor on strings of length ≥ k+1 (its
    // k+1 even segments are all non-empty exactly then; a shorter
    // string can have ALL its content edited within budget, leaving
    // only trivially-empty untouched segments). Pairs whose SHORTER
    // side is ≤ k chars — the partner then being ≤ 2k by the length
    // prune — go through a brute tier instead: a cross join over the
    // DISTINCT tiny strings (the collapse above already merged
    // identical-string cliques — empty strings included: ed("",x) =
    // |x|), guarded so an adversarial short-string population refuses
    // loudly instead of running a quadratic join.
    val tiny = reps.filter(col("__L") <= k)
      .select(col("__rid").as("__tid"), col("__s").as("__ts"),
        col("__L").as("__tl"))
    val near = reps.filter(col("__L") <= 2 * k)
      .select(col("__rid").as("__uid"), col("__s").as("__us"),
        col("__L").as("__ul"))
    requireBruteForceSized(near, "editDistancePairs' tiny-string tier " +
        s"(distinct strings of length <= ${2 * k})",
      "a length->=1 pre-filter, a smaller maxEdits, or the shingle tiers")
    val extra = tiny.crossJoin(near)
      .filter(col("__tid") =!= col("__uid") &&
        abs(col("__tl") - col("__ul")) <= k)
      .withColumn("edits", levenshtein(col("__ts"), col("__us"), k))
      .filter(col("edits") >= 0)
      .select(
        least(col("__tid"), col("__uid")).as("id_a"),
        greatest(col("__tid"), col("__uid")).as("id_b"),
        col("edits").cast("long").as("edits"))
    // distinct representative-level pairs (the two tiers overlap on
    // pairs whose shorter side has length in [1, k]) …
    val repPairs = main.unionByName(extra).distinct()
    // … expanded back to member pairs: every member of rep_a's group
    // pairs with every member of rep_b's group at the same distance
    // (equi-joins on the group key — output-sensitive, and disjoint
    // from the within-group distance-0 relation, so no final distinct)
    val ma = members.select(col("__rep").as("id_a"), col(idCol).as("__ma"))
    val mb = members.select(col("__rep").as("id_b"), col(idCol).as("__mb"))
    val cross = repPairs.join(ma, "id_a").join(mb, "id_b")
      .select(least(col("__ma"), col("__mb")).as("id_a"),
        greatest(col("__ma"), col("__mb")).as("id_b"),
        col("edits"))
    zero.unionByName(cross)
  }

  /** The MinHash-LSH band-key relation of a corpus slice:
    * `(idCol, band_id, band_hash)` — `bands` rows per document, where
    * equal keys mark near-duplicate CANDIDATES (the [[lshBands]]
    * banding over a `k`-value [[minhashSignature]] of word
    * `shingleN`-shingles). This is the relation an incremental fuzzy
    * pipeline PERSISTS as its index: ~`bands` small rows per admitted
    * document, vs the full shingle sets the exact tier would need.
    */
  def lshBandKeys(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    require(bands > 0 && k % bands == 0,
      s"k=$k must be a positive multiple of bands=$bands")
    // shingle hashes projected FIRST so the signature's k-pass outer
    // lambda re-reads a bound column, never re-derives the hash tree
    // (minhashSignature's caller contract)
    val sigs = df
      .select(col(idCol), shingleHashes(col(textCol), shingleN).as("__sh"))
      .select(col(idCol), minhashSignature(col("__sh"), k).as("sig"))
    lshBands(sigs, idCol, "sig", bands, k / bands)
  }

  /** Incremental NEAR-dedup against a persisted band-key index — the
    * recall-probabilistic, O(bands)-state-per-doc sibling of
    * [[incrementalJaccardDedup]], the formulation an unbounded crawl
    * runs: a batch document is suppressed when any of its `bands` LSH
    * band keys is already claimed in `bandIndex` by a DIFFERENT id, or
    * is shared with a smaller-id document of the same batch. Returns
    * the surviving batch rows; the caller appends
    * `lshBandKeys(novel, …)` (same parameters) to the index for the
    * next batch. Keys claimed by the document's OWN id never suppress,
    * so a replayed batch whose keys were already appended (the
    * at-least-once failure mode of any append-side effect) re-admits
    * exactly the same documents — idempotent by construction, and
    * duplicate index rows are harmless to the suppression join.
    *
    * Like the exact tier, suppression is one-pass and
    * suppression-biased (a doc whose only collision is with a
    * suppressed smaller-id doc still drops). Unlike it, a collision is
    * a MinHash band agreement, not a verified Jaccard — false-positive
    * suppressions at the standard LSH rate, which is the accepted
    * trade for an index of `bands` longs per document at web scale.
    *
    * Scale shape: one equi-join of the batch's key relation against
    * the index on `(band_id, band_hash)` (candidate volume bounded by
    * bucket sizes, the [[simhashPairsFromSigs]] argument) plus one
    * groupBy over the batch's own keys. No signatures are recomputed
    * for indexed docs — the index IS the state.
    */
  def incrementalLshDedup(
      batch: DataFrame, bandIndex: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    val keys = CacheRegistry.track(
      lshBandKeys(batch, idCol, textCol, shingleN, k, bands).persist())
    val idx = bandIndex.select(col("band_id"), col("band_hash"),
      col(idCol).as("__idx_id"))
    val idxHit = keys.join(idx, Seq("band_id", "band_hash"))
      .filter(col(idCol) =!= col("__idx_id"))
      .select(col(idCol)).distinct()
    val minPer = keys.groupBy("band_id", "band_hash")
      .agg(min(col(idCol)).as("__min_id"))
    val batchHit = keys.join(minPer, Seq("band_id", "band_hash"))
      .filter(col(idCol) > col("__min_id"))
      .select(col(idCol)).distinct()
    batch.join(idxHit.union(batchHit).distinct(), Seq(idCol), "left_anti")
  }

  /** EXACT containment join — asymmetric overlap `|A∩B| / |A| ≥ t` over
    * distinct word n-shingle sets: detects when one document is (mostly)
    * CONTAINED in another — quotes, excerpts, page-of-a-book, prefix
    * crawls — which symmetric Jaccard misses whenever the container is
    * much larger than the contained. Emits both directions (a⊂b and b⊂a
    * score differently by design).
    *
    * Shape: classic inverted-index join — one shuffle on the shingle,
    * group-count per ordered pair = the intersection, one division
    * against `|A|`. No pairwise scan: only pairs sharing ≥1 indexed
    * shingle are ever materialized.
    *
    * `maxDf > 0` drops shingles appearing in more than `maxDf` docs from
    * the INDEX (stop-shingles) — the standard skew lever at corpus
    * scale, where a boilerplate shingle would otherwise create a
    * quadratic bucket. With the cap the result is a documented
    * under-count (intersections lose capped shingles; `|A|` stays the
    * full set size), so recall at the threshold is approximate;
    * `maxDf = 0` (default) is the exact tier the oracle audits.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDf: Long = 0L): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold=$threshold must be in (0,1]")
    // join on the 64-bit shingle hash, not the string — q60's precedent:
    // ~4x smaller shuffle keys; a cross-doc collision (≈2^-64 per pair,
    // ~1e-7 across this corpus' distinct-shingle count) would overcount
    // one intersection cell by 1
    // shingling feeds three consumers (sizes + both join sides) — persist
    // it once, same pattern as the MinHash set relation. The long-form
    // path (posexplode + lead window) stays in whole-stage codegen,
    // unlike the interpreted wordShingles lambdas (see the
    // prefixJaccardPairs cost note); shingleRows itself emits the
    // whole-text fallback row for sub-n-token docs (wordShingles
    // semantics), so no extra branch is needed here.
    val sets = CacheRegistry.track(
      shingleRows(df, idCol, textCol, n)
        .select(col(idCol), xxhash64(col("sh")).as("sh"))
        .distinct()
        .persist())
    val sizes = sets.groupBy(col(idCol)).agg(count(lit(1)).as("__sz"))
    val index =
      if (maxDf <= 0) sets
      else sets.join(
        sets.groupBy("sh").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDf).select("sh"),
        Seq("sh"))
    val a = index.select(col(idCol).as("id_a"), col("sh"))
    val b = index.select(col(idCol).as("id_b"), col("sh"))
    a.join(b, Seq("sh")).filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__i"))
      .join(sizes.select(col(idCol).as("id_a"), col("__sz")), Seq("id_a"))
      .withColumn("containment",
        col("__i").cast("double") / col("__sz").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("containment"), 6).as("containment"))
  }

  /** EXACT repeated-span detection — substring-level dedup (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better":
    * duplicated PASSAGES inside otherwise-distinct documents are what
    * whole-doc dedup can never remove, and they dominate memorization).
    * Token-window formulation of the paper's suffix-array method: every
    * `n`-token window is hashed; a window occurring more than once in
    * the corpus (across documents OR within one) is a duplicate
    * EXCEPT at its globally-first occurrence (smallest `(doc, pos)` —
    * the keeper, so one copy of every passage always survives);
    * duplicate windows then merge per document into maximal spans
    * (overlapping or back-to-back windows coalesce). Returns
    * `(id, span_start, span_end)` token-index half-open spans. Docs
    * with fewer than `n` tokens never participate (a "span" below the
    * window length is whole-doc territory — [[incrementalDedup]]'s job).
    *
    * Scale shape: NO self-join and NO per-hash window function — a hot
    * boilerplate window (millions of occurrences of one hash) would make
    * either quadratic or single-task; instead the keeper is a two-level
    * partial aggregation (`min(struct(doc,pos))` per hash) joined back,
    * so the hot key combines map-side. One shuffle for the keeper agg,
    * one for the join, one doc-partitioned window (bounded by document
    * length) for the span merge.
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, s"n=$n must be positive")
    val eligible = df.filter(size(TextAnalysis.tokens(col(textCol))) >= n)
    // 64-bit window keys, the q60/q97 precedent: ~4x smaller shuffle
    // than the strings; a collision (~2^-64 per pair) could merge two
    // distinct windows' occurrence lists — documented, never hit at the
    // oracle's scale
    val win = shingleRowsPos(eligible, idCol, textCol, n, includeSubN = false)
      .select(col(idCol), col("pos"), xxhash64(col("sh")).as("__h"))
    val keepers = win.groupBy("__h").agg(
      min(struct(col(idCol).as("d"), col("pos").as("p"))).as("__k"),
      count(lit(1)).as("__cnt"))
    val marked = win.join(keepers, Seq("__h"))
      .filter(col("__cnt") > 1 &&
        !(col(idCol) === col("__k.d") && col("pos") === col("__k.p")))
      .select(col(idCol), col("pos"))
    val wd = Window.partitionBy(idCol).orderBy("pos")
    marked
      .withColumn("__prev", lag(col("pos"), 1).over(wd))
      // fixed-length windows sorted by pos: coverage so far ends at
      // lag(pos)+n, so a new span starts iff pos > lag(pos)+n (back-to-
      // back windows coalesce — same removed set, fewer spans)
      .withColumn("__new",
        when(col("__prev").isNull || col("pos") > col("__prev") + n, 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + n).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** [[repeatedSpans]] applied: per document, the cleaned text with
    * every duplicated span cut (tokens re-joined with single spaces —
    * the tokenizer's normal form), plus span/removed-token counts.
    * A document that was ONE big duplicate comes back empty, not
    * dropped — the caller decides the fate of empties.
    */
  def cutRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val spans = CacheRegistry.track(
      repeatedSpans(df, idCol, textCol, n).persist())
    val stats = spans.groupBy(idCol).agg(
      count(lit(1)).as("n_spans"),
      sum(col("span_end") - col("span_start")).as("removed_tokens"))
    val toks = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val kept = toks.join(spans,
      toks(idCol) === spans(idCol) &&
        col("pos") >= col("span_start") && col("pos") < col("span_end"),
      "left_anti")
    val clean = kept.groupBy(idCol).agg(
      array_join(transform(
        sort_array(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")), " ").as("clean_text"))
    df.select(col(idCol))
      .join(clean, Seq(idCol), "left")
      .join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"))
  }

  /** Cross-document EXACT shared-span PAIRS — the provenance view of
    * [[repeatedSpans]]' substring dedup (Lee et al. 2022): not just
    * "this passage is duplicated somewhere" but WHICH pairs of
    * documents share WHICH maximal token spans — the quote/photocopy
    * detector a curation pipeline runs before deciding what a
    * "duplicate passage" even is. Suffix-array-free formulation: a
    * shared span of `L >= minSpan` tokens between two documents
    * appears as exactly `L − shingleN + 1` CONSECUTIVE matching
    * shingles on one `(id_a, id_b, posA − posB)` DIAGONAL, so maximal
    * spans are the gaps-and-islands of the shingle-match relation —
    * `pos − row_number()` per diagonal groups each run, and a run of
    * `r` shingles is a span of `r + shingleN − 1` tokens.
    *
    * Returns one row per maximal shared span:
    * `(id_a, id_b, start_a, start_b, span_tokens)`, `id_a < id_b`,
    * 0-based token starts.
    *
    * Scale shape: shingles ship as 64-bit `xxhash64` keys (the q100
    * precedent — a collision could fuse two distinct shingles, at
    * ~2⁻⁶⁴ per pair; the DuckDB oracle joins the strings, so a
    * mismatch would surface as a gate failure, and never has), one
    * shuffle for the match join, one for the diagonal window, one
    * aggregation per island — all keyed, nothing quadratic in the
    * corpus. Quadratic exposure is per-VALUE: a boilerplate shingle
    * shared by f documents contributes f² match rows — `maxShingleFreq
    * > 0` drops shingles above the frequency cap BEFORE the join
    * (RECALL NOTE: spans consisting solely of capped shingles are
    * missed; spans merely CONTAINING one split in two — the
    * conservative failure for a provenance report).
    *
    * COMPLETENESS (uncapped): returns EXACTLY the maximal shared token
    * spans of length ≥ minSpan — the Lee et al. 2022 exact-substring
    * semantics for spans ≥ shingleN, without a suffix array. Pinned by
    * SharedSpanSpec's PROPERTY test against a by-definition brute-force
    * reference on seeded random corpora with planted overlapping/
    * nested/adjacent/whole-document matches.
    */
  def sharedSpanPairs(df: DataFrame, idCol: String, textCol: String,
      minSpan: Int, shingleN: Int = 8,
      maxShingleFreq: Long = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shingleN > 0, s"shingleN=$shingleN must be positive")
    require(minSpan >= shingleN,
      s"minSpan=$minSpan must be >= shingleN=$shingleN (a shorter span " +
        "never produces a shingle match)")
    val eligible = df.filter(
      size(TextAnalysis.tokens(col(textCol))) >= shingleN)
    val sh = shingleRowsPos(eligible, idCol, textCol, shingleN,
        includeSubN = false)
      .select(col(idCol), col("pos"), xxhash64(col("sh")).as("__h"))
    val capped =
      if (maxShingleFreq <= 0) sh
      else sh.join(
        sh.groupBy("__h").agg(count(lit(1)).as("__f"))
          .filter(col("__f") <= maxShingleFreq).select("__h"),
        Seq("__h"))
    val a = capped.select(col("__h"), col(idCol).as("id_a"),
      col("pos").as("__pa"))
    val b = capped.select(col("__h"), col(idCol).as("id_b"),
      col("pos").as("__pb"))
    val matches = a.join(b, Seq("__h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__pa"), col("__pb"),
        (col("__pa") - col("__pb")).as("__diag"))
    val wd = Window.partitionBy(col("id_a"), col("id_b"), col("__diag"))
      .orderBy(col("__pa"))
    matches
      .withColumn("__grp", col("__pa") - row_number().over(wd))
      .groupBy(col("id_a"), col("id_b"), col("__diag"), col("__grp"))
      .agg(min(col("__pa")).cast("long").as("start_a"),
        min(col("__pb")).cast("long").as("start_b"),
        (count(lit(1)) + (shingleN - 1)).cast("long").as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
      .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
        col("span_tokens"))
  }

  /** Corpus SNAPSHOT DIFF — the crawl-over-crawl change audit every
    * periodically-rebuilt corpus needs before shipping: classify every
    * document id across two snapshots as `added` (new only), `removed`
    * (old only), `changed` (both, different normalized content
    * fingerprint), or `unchanged`. Content identity is
    * [[graft.operators.TextAnalysis.fingerprint]] (whitespace-
    * normalized md5), so a reflowed-but-identical page reads
    * unchanged. Null-vs-null content compares null-safe (unchanged).
    *
    * Scale shape: two per-row fingerprint projections and ONE
    * full-outer id-keyed join — the texts never flow past the
    * projection, only (id, 32-hex) rows shuffle. Feed the output to a
    * groupBy for the release summary, or filter `status != unchanged`
    * for the incremental-processing worklist.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // presence flags, NOT fingerprint nullness: a present row with a
    // null text must not read as absent
    val o = oldSnap.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("__fo"),
      lit(true).as("__po"))
    val n = newSnap.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("__fn"),
      lit(true).as("__pn"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .when(col("__fo") <=> col("__fn"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** C4-style CROSS-DOCUMENT span deduplication (Raffel et al. 2020
    * removed duplicated three-sentence spans corpus-wide, keeping one
    * occurrence): [[sharedSpanPairs]]' evidence applied as a cut —
    * for every maximal shared span the FIRST occurrence (the smaller
    * id, `id_a`) keeps its text and the later document cuts the span
    * at `start_b` via the shared surgical tail
    * ([[graft.operators.Contamination.cutSpansAt]]). One greedy
    * evidence pass, not a fixpoint: a document cuts exactly the spans
    * it shares with SMALLER-id documents, so the earliest copy in any
    * duplication clique survives intact and every later copy loses
    * the span once (overlapping evidence removes each token once).
    * Returns every corpus row as
    * `(id, clean_text, n_spans, removed_tokens)`.
    *
    * Scale shape = [[sharedSpanPairs]] (keyed shingle-match shuffles,
    * the opt-in `maxShingleFreq` hot-value cap) + the cut tail's two
    * id-partitioned joins; nothing quadratic beyond the documented
    * per-hot-shingle exposure.
    */
  def cutSharedSpans(df: DataFrame, idCol: String, textCol: String,
      minSpan: Int, shingleN: Int = 8,
      maxShingleFreq: Long = 0): DataFrame = {
    val spans = CacheRegistry.track(
      sharedSpanPairs(df, idCol, textCol, minSpan, shingleN,
        maxShingleFreq).persist())
    Contamination.cutSpansAt(df, idCol, textCol,
      spans.select(col("id_b").as("corpus_id"),
        col("start_b").as("start_corpus"), col("span_tokens")))
  }

  // ------------------------------------------------------------- shingles

  /** Word w-shingles as an array column: contiguous n-token windows joined
    * by a space. Pure SQL: transform over an index sequence + slice.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Word w-shingles as a LONG-FORM relation (id, sh) with no
    * higher-order lambdas: posexplode the tokens (codegen generator) and
    * assemble each shingle from `lead` windows — at corpus scale the
    * interpreted transform/slice lambdas of [[wordShingles]] cost more
    * than every shuffle in a near-dup join combined. Docs with fewer than
    * `n` tokens contribute one whole-text shingle (same semantics as
    * [[wordShingles]]). Output is NOT deduplicated.
    */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleRowsPos(df, idCol, textCol, n).select(col(idCol), col("sh"))

  /** [[shingleRows]] with each shingle's 0-based position in the document
    * (consecutive; a doc with m >= n tokens has shingles 0..m-n; a shorter
    * doc has one whole-text shingle at position 0) — the input to
    * position-sensitive fingerprinting like winnowing.
    *
    * `includeSubN = false` skips the sub-n-token whole-text fallback
    * branch: a caller that already filtered to docs with >= n tokens
    * (repeatedSpans) would otherwise pay a provably-empty extra corpus
    * scan — Catalyst cannot fold the contradiction between the caller's
    * `size >= n` filter and the branch's `size < n` because both sit
    * behind the tokenize HOF.
    */
  def shingleRowsPos(df: DataFrame, idCol: String, textCol: String, n: Int,
      includeSubN: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
    val big = toks.filter(size(col("toks")) >= n)
      .select(col(idCol), posexplode(col("toks")).as(Seq("pos", "tok")))
    val wLead = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val shingleStr = concat_ws(" ",
      (0 until n).map(k =>
        if (k == 0) col("tok") else lead(col("tok"), k).over(wLead)): _*)
    val lastTok = lead(col("tok"), n - 1).over(wLead)
    val main = big
      .select(col(idCol), col("pos"), shingleStr.as("sh"), lastTok.as("last"))
      .filter(col("last").isNotNull)
      .select(col(idCol), col("pos"), col("sh"))
    if (!includeSubN) main
    else main.unionAll(toks.filter(size(col("toks")) < n)
      .select(col(idCol), lit(0).as("pos"), concat_ws(" ", col("toks")).as("sh")))
  }

  /** Distinct 32-bit hashes of the shingle set.
    *
    * Scale path: never materializes shingle STRINGS — hashes each token
    * once, then combines `n` shifted hash arrays arithmetically
    * (((h1*31+h2)*31+h3) & 0xffffffff). O(tokens) work per row instead of
    * the O(tokens * n) string building + copying of the naive
    * `transform(wordShingles, hash)` formulation; set cardinalities (and
    * so Jaccard) are preserved modulo 32-bit collisions, same as hashing
    * the strings.
    */
  def shingleHashes(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val th = transform(toks, t => hash(t).cast("long").bitwiseAND(lit(0xffffffffL)))
    val cnt = size(th) - (n - 1)
    val mask = lit(0xffffffffL)
    val combined = {
      // shingle_i = fold over the n token hashes starting at i
      val slices = (0 until n).map(k => slice(th, lit(k + 1), cnt))
      val zipped = arrays_zip(slices: _*)
      transform(zipped, s => {
        val fields = (0 until n).map(k => s.getField(k.toString))
        // mask every step so arbitrary n can't overflow ANSI long math
        fields.reduce((acc, h) => (acc * lit(31L) + h).bitwiseAND(mask))
      })
    }
    when(cnt >= 1, array_distinct(combined))
      .otherwise(array(hash(concat_ws(" ", toks)).cast("long").bitwiseAND(mask)))
  }

  // -------------------------------------------------------------- minhash

  /** Deterministic per-permutation affine constants: a_j, b_j derived from
    * the permutation index via a fixed 64-bit mix (public splitmix64
    * constants), odd multiplier to stay a bijection mod 2^64.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Prime just above 2^32 for the universal-hash permutations. */
  private val MersenneP = 4294967311L

  /** MinHash signature (k values) from the shingle-hash array — computed as
    * array expressions, one value per permutation:
    * sig_j = min over shingles of ((a_j * u32(h) + b_j) mod p), p prime >
    * 2^32, a_j a 31-bit odd constant, b_j 31-bit. The modulus is what
    * makes each permutation a genuinely different ordering — a plain
    * affine map is MONOTONIC in h, so every "permutation" would select
    * the same global-min shingle and LSH recall collapses to exact-dup
    * detection only. a*h stays < 2^63 (ANSI-safe).
    *
    * SHAPE (r18 — the task-binary lever's per-row half): one nested
    * transform over a k-element index sequence with the permutation
    * constants as two k-literal arrays, NOT k separate
    * `array_min(transform(...))` columns. The old form inlined k
    * copies of `shingleHashCol`'s whole expression tree into every
    * stage closure — at the streaming gates' k = 64 that serialized to
    * the multi-MiB task binaries the catalog's deserialization storms
    * chewed on (PERFORMANCE.md round 18). Values are bit-identical
    * (same constants, same mod arithmetic, same order).
    *
    * CALLER CONTRACT: `shingleHashCol` sits inside the outer lambda,
    * so it is evaluated once per permutation (k times per row) — the
    * same interpreted per-row cost the old k-column form paid, so this
    * is size-neutral on runtime. Note that projecting the hash array
    * into a bound column first does NOT avoid the k evaluations:
    * CollapseProject re-inlines a once-referenced alias, so the tree
    * lands back inside the lambda either way. What the binding (and
    * this shape) buys is the SERIALIZED plan carrying ONE copy of the
    * tree instead of k — the task-binary lever — not a per-row
    * speedup. Callers that need the hashes computed once per row
    * should materialize the relation (persist), as the aggregate-tier
    * pipelines do.
    */
  def minhashSignature(shingleHashCol: Column, k: Int): Column = {
    val (as, bs) = permConstants(k).unzip
    val aArr = array(as.map(lit): _*)
    val bArr = array(bs.map(lit): _*)
    transform(sequence(lit(1), lit(k)), j =>
      array_min(transform(shingleHashCol,
        h => pmod(h.cast("long").bitwiseAND(lit(0xffffffffL))
          * element_at(aArr, j) + element_at(bArr, j),
          lit(MersenneP)))))
  }

  /** Elementwise-min MinHash signature AGGREGATOR — the array-typed
    * form of "k min-aggregates over the exploded shingle-hash
    * relation": one typed fold whose buffer is the k-long running
    * signature, updated in place with `min(buf_j, (h·a_j + b_j) mod p)`
    * per input hash. Arithmetic is IDENTICAL to the k named
    * `min(pmod(h·a_j + b_j, p))` columns it replaces (same
    * [[permConstants]], same [[MersenneP]]; `reduce` masks the input to
    * 32 bits so h·a_j + b_j stays inside 63 bits for ANY Long input —
    * a no-op for the in-contract 0 <= h < 2^32 callers), so every
    * consumer's output is bit-unchanged.
    *
    * Why an aggregator and not k codegen min-columns (the r17
    * PERFORMANCE.md open thread, closed r18): the k-column form puts k
    * independent `Min(Pmod(...))` Expression trees into EVERY stage
    * closure of every plan built over the signature relation — the
    * verify log's largest serialized task binaries (1–2.5 MiB) were
    * all signature-tier stages, and at catalog scale their
    * per-stage-per-executor deserialization was the attributed
    * mechanism behind the q192/q195/q206 scatter band (26–36 s
    * excursions against 7–10 s floors). This class serializes as one
    * object holding two k-long constant arrays (~0.5 KB at k = 32).
    * The trade — the aggregation runs as ObjectHashAggregate instead
    * of whole-stage-codegen — was measured before committing
    * (PERFORMANCE.md round 18): the per-row cost is a k-step primitive
    * loop either way, and the signature stage's wall-clock held while
    * the task-binary tax fell.
    */
  class MinhashSigAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Long, Array[Long], Array[Long]] {
    require(k > 0, s"k=$k must be positive")
    private val as = new Array[Long](k)
    private val bs = new Array[Long](k)
    locally {
      val cs = permConstants(k)
      var j = 0
      while (j < k) { as(j) = cs(j)._1; bs(j) = cs(j)._2; j += 1 }
    }
    // Long.MaxValue sentinel: every real value is < MersenneP, so the
    // first reduce overwrites all k slots (groups are never empty —
    // the aggregation only sees keys that have rows)
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      // mask to the documented 0 <= h < 2^32 domain HERE, not at the
      // caller: an out-of-range input (e.g. a raw full-range xxhash64)
      // would overflow h*a_j and Scala's % returns negative remainders,
      // silently producing garbage signature values. The mask is a
      // bit-identical no-op for every in-contract input, so production
      // outputs are unchanged; it makes the aggregator total over Long.
      val hv = h & 0xffffffffL
      var j = 0
      while (j < k) {
        val v = (hv * as(j) + bs(j)) % MersenneP
        if (v < buf(j)) buf(j) = v
        j += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var j = 0
      while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The [[MinhashSigAgg]] fold as a ready-to-agg Column over a 32-bit
    * hash column: `sig` = the k-value signature array.
    */
  def minhashSigAgg(hashCol: Column, k: Int): Column =
    udaf(new MinhashSigAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)(hashCol)

  /** LSH banding: explode the signature into `bands` rows of
    * (band_id, band_hash) where band_hash fingerprints `rowsPerBand`
    * consecutive signature values. Same (band_id, band_hash) ⇒ candidate
    * bucket.
    */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rowsPerBand: Int): DataFrame = {
    require(bands > 0 && rowsPerBand > 0,
      s"bands=$bands rowsPerBand=$rowsPerBand must be positive — a zero-width " +
        "band hashes an empty slice and every doc collides into one bucket")
    // band fingerprint = variadic xxhash64 over the band's signature
    // values directly — fully codegen; no interpreted transform lambda,
    // no string materialization (equal slices ⇒ equal hash, same as any
    // injective-enough fingerprint)
    val bandStructs = (0 until bands).map { b =>
      struct(
        lit(b).as("band_id"),
        xxhash64((0 until rowsPerBand).map(r =>
          element_at(col(sigCol), b * rowsPerBand + r + 1)): _*).as("band_hash"))
    }
    df.select(col(idCol), explode(array(bandStructs: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_hash"))
  }

  /** Full MinHash-LSH near-dup pipeline: returns candidate pairs
    * (id_a < id_b) with their exact Jaccard similarity, filtered at
    * `threshold`. The only shuffles are: signature agg (none — per-row),
    * band groupBy, and the verify join against the per-doc shingle arrays.
    */
  /** @param broadcastSets pipeline strategy pin. `None` (default):
    *   dispatch from the source relation's size estimate
    *   ([[autoBroadcastSets]]), so call sites carry no scale assumption.
    *   An explicit value pins the WHOLE formulation — shingle-set
    *   construction, band-join strategy AND verify-join strategy —
    *   `Some(true)` = the small-corpus path (one-projection sets,
    *   broadcast joins), `Some(false)` = the scale path (long-form sets,
    *   shuffled equi-joins). Pinning everything together keeps the
    *   output pair set independent of `autoBroadcastJoinThreshold`; the
    *   two formulations hash shingles differently, so letting a size
    *   gate pick one under an explicit override would let a perf conf
    *   change results.
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, broadcastSets: Option[Boolean] = None): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes=$numHashes must be a positive multiple of bands=$bands")
    // The shingle-set relation has two formulations, dispatched on corpus
    // size; downstream (signature min-aggs, banding, verify) is shared and
    // insensitive to how the set arrays were built:
    //  - small (fits the broadcast gate): [[shingleHashes]] as ONE
    //    projection — token hashes combined arithmetically per row, no
    //    shingle strings, no window, no collect_set aggregation. The
    //    lambdas are interpreted, but a reference-scale corpus pays a few
    //    million interpreted ops, far less than the codegen+JIT bill of
    //    the long-form plan's extra window + agg stages (one-shot at
    //    sf0.1: ~9 s → ~4 s).
    //  - large: long-form [[shingleRows]] (codegen window) + collect_set
    //    reusing its hash-partitioning by id — minimal marginal cost per
    //    row, which is what matters at 100 TB. (Hash derivation differs —
    //    32-bit combined token hashes vs xxhash64 of the shingle string —
    //    fine for an operator whose contract is approximate near-dup
    //    detection; the exact-recall operator is [[prefixJaccardPairs]].)
    // An EXPLICIT broadcastSets pins the whole strategy, not just the
    // verify join: Some(false) must force the long-form formulation and
    // shuffled joins (and Some(true) the small-corpus one), otherwise the
    // output pair set would still vary with autoBroadcastJoinThreshold
    // through the size gate — a perf knob silently changing results.
    val small = broadcastSets.getOrElse(autoBroadcastSets(df))
    val sets = CacheRegistry.track {
      (if (small)
        df.select(col(idCol), shingleHashes(col(textCol), shingleN).as("shset"))
      else
        shingleRows(df, idCol, textCol, shingleN)
          .select(col(idCol),
            xxhash64(col("sh")).bitwiseAND(lit(0xffffffffL)).as("h"))
          .groupBy(col(idCol)).agg(collect_set(col("h")).as("shset"))
      ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    // signature via explode + the elementwise-min aggregator (same
    // values as k named min-aggregates — [[MinhashSigAgg]] — but ONE
    // small serialized expression instead of k trees per stage
    // closure, the r18 task-binary lever; still far faster than the
    // interpreted per-row minhashSignature fold); in the large path
    // the explode preserves collect_set's id partitioning, so the
    // aggregation needs no shuffle
    val exploded = sets.select(col(idCol), explode(col("shset")).as("h"))
    val withSig = exploded.groupBy(col(idCol))
      .agg(minhashSigAgg(col("h"), numHashes).as("sig"))
    val rowsPerBand = numHashes / bands
    val bandTable = lshBands(withSig, idCol, "sig", bands, rowsPerBand)

    val a = bandTable.select(col(idCol).as("id_a"), col("band_id"), col("band_hash"))
    val b = bandTable.select(col(idCol).as("id_b"), col("band_id"), col("band_hash"))
    // small corpus: the band table fits one node, so hash-join it in place
    // instead of sort-merge (the static planner can't see the band table's
    // size through the aggregation)
    val candidates = a.join(if (small) broadcast(b) else b,
        Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    // exact-Jaccard verify: attach the per-doc shingle-set arrays to the
    // candidate list, intersect natively (candidate-count × O(|set|))
    val doBroadcast = small
    val setsA = sets.select(col(idCol).as("id_a"), col("shset").as("set_a"))
    val setsB = sets.select(col(idCol).as("id_b"), col("shset").as("set_b"))
    candidates
      .join(if (doBroadcast) broadcast(setsA) else setsA, "id_a")
      .join(if (doBroadcast) broadcast(setsB) else setsB, "id_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("union_",
        (size(col("set_a")) + size(col("set_b"))).cast("long") - col("inter"))
      .withColumn("jaccard",
        when(col("union_") > 0, col("inter").cast("double") / col("union_").cast("double"))
          .otherwise(lit(1.0)))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // --------------------------------------------- portable minhash audits

  /** 32-bit md5 hash (first 8 hex chars) — cross-engine exact (DuckDB:
    * `('0x' || substr(md5(v), 1, 8))::BIGINT`) and small enough that the
    * affine permutations' a·h + b stays inside 63 bits on both engines.
    */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The minhash permutation constants (a_j odd 31-bit, b_j 31-bit —
    * the same splitmix64 derivation [[minhashSignature]] uses), public
    * so the DuckDB oracle can inline the identical literals.
    */
  def permConstants(k: Int): Seq[(Long, Long)] =
    (0 until k).map { j =>
      ((mix64(j.toLong * 2 + 1) & 0x7fffffffL) | 1L,
        mix64(j.toLong * 2 + 2) & 0x7fffffffL)
    }

  /** Distinct (id, 32-bit md5 shingle hash) rows — the PORTABLE
    * shingle-set relation the audit tiers share with their oracles
    * (the production tiers hash with murmur3/xxhash64, which no other
    * engine can replay).
    */
  private def portableShingleHashes(df: DataFrame, idCol: String,
      textCol: String, shingleN: Int): DataFrame =
    shingleRows(df, idCol, textCol, shingleN)
      .select(col(idCol).as("id"), md5Hash32(col("sh")).as("h"))
      .distinct()

  /** Exact Jaccard pairs over a (id, h) shingle-hash relation — the
    * keyed-equi-join formulation (shared-hash counts + sizes), i.e.
    * exactly how the DuckDB oracle computes it. Audit-tier shape: a
    * globally hot shingle fans this join out; the production exact
    * tier with prefix pruning is [[prefixJaccardPairs]].
    */
  private def exactJaccardFromHashes(ex: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("sz"))
    ex.select(col("id").as("id_a"), col("h"))
      .join(ex.select(col("id").as("id_b"), col("h")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sa")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sb")), Seq("id_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sa") + col("sb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Array-typed minhash signatures over the portable hash relation:
    * explode-free — `ex` is already long-form, so the signature is ONE
    * keyed [[MinhashSigAgg]] fold producing `sig` (k values; component
    * j is `element_at(sig, j + 1)`). Values identical to the k named
    * min-aggregate columns this replaced (r18 — the task-binary
    * lever; see [[MinhashSigAgg]]).
    */
  private def portableSigs(ex: DataFrame, numHashes: Int): DataFrame =
    ex.groupBy(col("id"))
      .agg(minhashSigAgg(col("h"), numHashes).as("sig"))

  /** MinHash-LSH recall audit (the q169 in-catalog-audit pattern,
    * VERDICT r14 order #1a): per exact-Jaccard decile band ≥ the
    * threshold, how many TRUE near-dup pairs exist and how many of
    * them the banded LSH candidate stage surfaces. The tier it audits
    * (q31) is probabilistic in RECALL, but the audit itself is a
    * deterministic function of the corpus: md5-32 shingle hashes, the
    * [[permConstants]] affine mod-prime permutations, band keys as
    * the joined signature slice — all integer arithmetic an
    * independent engine replays exactly, so the audit row set is
    * hash-exact even where recall < 1.
    *
    * Scale shape: signature build is one keyed aggregation; band
    * candidates one equi-join on (band, key); the exact side is the
    * audit-scale keyed shingle join (see [[prefixJaccardPairs]] for
    * the pruned production tier). Nothing collects; bands of the
    * output relation are ≤ 10 rows.
    */
  def minhashRecallAudit(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes=$numHashes must be a positive multiple of bands=$bands")
    val ex = CacheRegistry.track(
      portableShingleHashes(df, idCol, textCol, shingleN).persist())
    val exact = CacheRegistry.track(
      exactJaccardFromHashes(ex, threshold).persist())
    val r = numHashes / bands
    val bandRows = portableSigs(ex, numHashes).select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band_id"),
            concat_ws("_",
              (0 until r).map(x =>
                element_at(col("sig"), b * r + x + 1)): _*).as("key"))
        }: _*)).as("bd"))
      .select(col("id"), col("bd.band_id").as("band_id"),
        col("bd.key").as("key"))
    val cand = bandRows
      .select(col("id").as("id_a"), col("band_id"), col("key"))
      .join(bandRows.select(col("id").as("id_b"), col("band_id"),
        col("key")), Seq("band_id", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val jb = least(floor(col("jaccard") * 10).cast("long"), lit(9L))
    val denom = exact.groupBy(jb.as("j_band"))
      .agg(count(lit(1)).as("n_exact"))
    val numer = exact.join(cand, Seq("id_a", "id_b"), "left_semi")
      .groupBy(jb.as("j_band")).agg(count(lit(1)).as("n_found"))
    denom.join(numer, Seq("j_band"), "left")
      .select(col("j_band"), col("n_exact"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        round(coalesce(col("n_found"), lit(0L)).cast("double") /
          col("n_exact").cast("double"), 6).as("recall"))
      .orderBy("j_band")
  }

  /** LSH banding SWEEP — the (bands × rows) knob read for the MinHash
    * candidate stage: the 32-component signatures compute ONCE (one
    * keyed aggregation over the cached portable hash relation), and
    * each ladder point REGROUPS the same signature columns into its
    * own band keys — more, narrower bands catch more true pairs but
    * emit more candidate pairs for the exact check to pay for. Output
    * per banding: `(bands, rows_per_band, n_candidates, n_found,
    * recall)` against the TRUE pairs at `threshold` — the cost axis
    * and the quality axis of the S-curve, priced together.
    * Deterministic end-to-end ([[minhashRecallAudit]]'s argument).
    */
  def lshBandSweep(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32,
      bandsLadder: Seq[Int] = Seq(4, 8, 16, 32),
      threshold: Double = 0.5): DataFrame = {
    require(bandsLadder.nonEmpty &&
      bandsLadder.forall(b => b > 0 && numHashes % b == 0),
      s"every bands value in $bandsLadder must divide numHashes=$numHashes")
    val ex = CacheRegistry.track(
      portableShingleHashes(df, idCol, textCol, shingleN).persist())
    val exact = CacheRegistry.track(
      exactJaccardFromHashes(ex, threshold).persist())
    val sigs = CacheRegistry.track(portableSigs(ex, numHashes).persist())
    val exTot = exact.agg(count(lit(1)).as("__nex"))
    // ONE banded self-join for the whole ladder (r19 optimization): the
    // old form ran the candidate join + distinct + count + semi-join
    // once PER ladder point (4 separate shuffle pipelines over the same
    // persisted signatures). Every ladder point's band rows now carry
    // their `bands` arm as part of the join key, so the union of all
    // arms' band rows (Σ bands = 60 rows/doc for the default ladder vs
    // 32 for the widest single arm) goes through one equi-join, one
    // pair-distinct, and two small rollups — same pair sets per arm,
    // verified bit-identical against the DuckDB oracle. Arms are
    // re-attached to a literal ladder skeleton by LEFT join so a
    // zero-candidate arm still reads (0, 0, recall 0/__nex) exactly as
    // the per-arm aggregation did.
    val allBandRows = sigs.select(col("id"),
        explode(array(bandsLadder.flatMap { bands =>
          val r = numHashes / bands
          (0 until bands).map { b =>
            struct(lit(bands).as("bands"), lit(b).as("band_id"),
              concat_ws("_",
                (0 until r).map(x =>
                  element_at(col("sig"), b * r + x + 1)): _*).as("key"))
          }
        }: _*)).as("bd"))
      .select(col("id"), col("bd.bands").as("bands"),
        col("bd.band_id").as("band_id"), col("bd.key").as("key"))
    val cand = CacheRegistry.track(allBandRows
      .select(col("id").as("id_a"), col("bands"), col("band_id"),
        col("key"))
      .join(allBandRows.select(col("id").as("id_b"), col("bands"),
        col("band_id"), col("key")), Seq("bands", "band_id", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("bands", "id_a", "id_b").distinct().persist())
    val nCand = cand.groupBy("bands")
      .agg(count(lit(1)).as("n_candidates"))
    val nFound = exact.join(cand, Seq("id_a", "id_b"))
      .groupBy("bands").agg(count(lit(1)).as("n_found"))
    val ladder = df.sparkSession.createDataFrame(
        bandsLadder.map(bands => (bands, numHashes / bands)))
      .toDF("bands", "rows_per_band")
    ladder.join(nCand, Seq("bands"), "left")
      .join(nFound, Seq("bands"), "left")
      .crossJoin(broadcast(exTot))
      .select(col("bands"), col("rows_per_band"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        round(coalesce(col("n_found"), lit(0L)).cast("double")
          / col("__nex").cast("double"), 6).as("recall"))
      .orderBy("bands")
  }

  /** MinHash signature-fidelity audit (VERDICT r14 order #1c): per
    * TRUE near-dup pair, the signature-estimated Jaccard (matching
    * fraction of the k portable signature components) against the
    * exact Jaccard, with the absolute error — the "how faithful are
    * the signatures themselves" read that the pair-level tier (q31)
    * can't give. Deterministic end-to-end for the same reason as
    * [[minhashRecallAudit]].
    */
  def minhashFidelityAudit(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32,
      threshold: Double = 0.7): DataFrame = {
    val ex = CacheRegistry.track(
      portableShingleHashes(df, idCol, textCol, shingleN).persist())
    // persisted: the signature relation joins BOTH pair sides, and
    // Spark does not dedupe common aggregation subtrees across join
    // inputs — uncached, the 32-min-aggregate build would run twice
    val sig = CacheRegistry.track(portableSigs(ex, numHashes).persist())
    exactJaccardFromHashes(ex, threshold)
      .join(sig.select(col("id").as("id_a"), col("sig").as("sa")),
        Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sig").as("sb")),
        Seq("id_b"))
      .withColumn("matches",
        size(filter(zip_with(col("sa"), col("sb"), (x, y) => x - y),
          v => v === 0)).cast("long"))
      .withColumn("j_est",
        col("matches").cast("double") / lit(numHashes.toDouble))
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).as("j_exact"),
        col("matches"),
        round(col("j_est"), 6).as("j_est"),
        round(abs(col("j_est") - col("jaccard")), 6).as("abs_err"))
      .orderBy("id_a", "id_b")
  }

  /** EXACT Jaccard near-dup pairs via prefix filtering (the AllPairs/
    * PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08): unlike
    * MinHash LSH this has PERFECT recall at the threshold, so its output
    * is oracle-comparable against a brute-force all-pairs computation,
    * while candidate generation stays far below n².
    *
    * Plan shape (all codegen joins/aggs, no UDFs):
    *  1. shingle sets as xxhash64 of the shingle STRING (64-bit ⇒ distinct
    *     counts match the string sets; the 32-bit combined-hash fast path
    *     of [[shingleHashes]] risks collisions the oracle can see),
    *  2. global shingle order = (document frequency ASC, hash ASC) — rare
    *     shingles first, so prefixes of frequent-shingle-heavy docs stay
    *     selective,
    *  3. per-doc prefix of length |x| - ceil(t*|x|) + 1 under that order;
    *     two sets with Jaccard >= t MUST share a prefix element (prefix-
    *     filtering lemma),
    *  4. candidates = prefix ⋈ prefix on the shingle hash (+ the length
    *     filter t*|x| <= |y|), verify = exact intersection via equi-join.
    *
    * At 100 TB: the frequency table and prefix relation are one shuffle
    * each on the shingle hash; bucket sizes in the candidate join are
    * bounded by per-shingle prefix frequency, which the global order keeps
    * small (a stop-word shingle is in almost no prefixes).
    *
    * `probeIds` (one `idCol` column) restricts the output to pairs
    * TOUCHING a probe id: the candidate equi-join's left side is
    * semi-joined to the probes BEFORE pairing, so probe-free
    * (e.g. corpus×corpus) bucket pairs are never generated — the
    * incremental formulation's lever ([[incrementalJaccardDedup]]),
    * where candidate cost must follow the batch, not the corpus.
    * Prefixes, frequencies, and verification still use the FULL input
    * (the prefix-filtering lemma needs the global rarity order), and
    * for the touching pairs the output is identical to the
    * unrestricted call (spec-pinned).
    */
  def prefixJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double,
      broadcastSets: Option[Boolean] = None,
      probeIds: Option[DataFrame] = None): DataFrame = {
    val doBroadcast = broadcastSets.getOrElse(autoBroadcastSets(df))
    val sets = CacheRegistry.track(
      shingleSets(df, idCol, textCol, shingleN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    prefixPairsFromSets(sets, idCol, threshold, doBroadcast, probeIds)
  }

  /** The per-doc shingle-hash SET relation `(idCol, shset: array<long>)`
    * that the exact pair tier runs on: shingling via [[shingleRows]]
    * (no interpreted lambdas); hash the shingle STRING with xxhash64 —
    * 64-bit keeps distinct counts equal to the string sets' (32-bit
    * combined hashes risk collisions an exact oracle can see); per-doc
    * dedup via collect_set reuses the shingle window's hash-partitioning
    * by id (no extra shuffle). (A q31-style small-corpus array path was
    * MEASURED slower here: building shingle STRINGS with interpreted
    * wordShingles lambdas costs more warm time than the window+agg
    * stages cost cold; the exactness contract pins string hashing, so
    * the long form stays the only formulation.)
    *
    * Public so a two-closure pipeline (q192's before/after drain proof)
    * can compute the dominant shingle stage ONCE, persist it, and feed
    * both closures through [[prefixJaccardPairsFromSets]] — identical
    * texts have identical shingle sets, so a drained subset's sets are
    * a join away, never a re-shingle. Returned UNPERSISTED; callers
    * that use it more than once own the persist.
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    shingleRows(df, idCol, textCol, shingleN)
      .select(col(idCol), xxhash64(col("sh")).as("h"))
      .groupBy(col(idCol)).agg(collect_set(col("h")).as("shset"))

  /** [[prefixJaccardPairs]] over a PRECOMPUTED (and typically persisted —
    * the relation is consumed twice: rarity ranking and verify) shingle
    * set relation from [[shingleSets]]. Output identical to calling
    * [[prefixJaccardPairs]] on the corpus the sets were built from.
    *
    * `broadcastSets = None` defaults to NO broadcast: the size gate
    * [[autoBroadcastSets]] is calibrated for a SOURCE relation's
    * scan-based estimate (×4 for set blowup) — evaluated on the
    * collect_set aggregate plan it would read ArrayType default sizes
    * and can badly underestimate variable-length shingle arrays, which
    * at corpus scale means broadcasting the full per-doc set relation
    * (the OOM the gate exists to prevent). Callers that still hold the
    * source relation should pass `Some(autoBroadcastSets(source))` to
    * keep the bench-scale broadcast fast path.
    */
  def prefixJaccardPairsFromSets(
      sets: DataFrame, idCol: String, threshold: Double,
      broadcastSets: Option[Boolean] = None,
      probeIds: Option[DataFrame] = None): DataFrame =
    prefixPairsFromSets(sets, idCol, threshold,
      broadcastSets.getOrElse(false), probeIds)

  private def prefixPairsFromSets(
      sets: DataFrame, idCol: String, threshold: Double,
      doBroadcast: Boolean, probeIds: Option[DataFrame]): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold=$threshold must be in (0,1]")
    // global rarity order: document frequency, hash as tiebreak; freq is
    // |distinct shingles| rows — broadcast it back to the per-doc relation
    // only under the same size gate as the verify join (the distinct-
    // shingle table grows with the corpus and can exceed the broadcast
    // limit; ungated, AQE still picks broadcast when the build side is
    // small enough at runtime)
    val exploded = sets.select(col(idCol), explode(col("shset")).as("h"))
    val freq0 = exploded.groupBy("h").agg(count(lit(1)).as("df_cnt"))
    val freq = if (doBroadcast) broadcast(freq0) else freq0
    // prefix length |x| - ceil(t*|x|) + 1; the 1e-9 guards the float
    // product landing a hair ABOVE an exact integer (which would ceil
    // one too high and shorten the prefix below the safe length).
    // Ranking happens INSIDE a per-doc sorted array (sort_array on
    // (df_cnt, h) structs) — no row_number window over the full corpus.
    // Persisted (r19): both sides of the candidate self-join (and both
    // probe orientations) read `ranked`, and un-persisted each side
    // re-ran the whole rarity stage — the shingle explode, the
    // document-frequency aggregation, the freq join, and the per-doc
    // sort — twice. The prefix relation is a bounded fraction of the
    // exploded shingle rows (|x| − ceil(t·|x|) + 1 per doc).
    val ranked = CacheRegistry.track(
      exploded.join(freq, "h")
        .groupBy(col(idCol))
        .agg(sort_array(collect_list(struct(col("df_cnt"), col("h")))).as("ord"))
        .withColumn("sz", size(col("ord")).cast("long"))
        .select(col(idCol), col("sz"),
          explode(slice(col("ord"), lit(1),
            (col("sz") - ceil(col("sz") * threshold - 1e-9) + 1).cast("int")))
            .as("pref"))
        .select(col(idCol), col("pref.h").as("h"), col("sz"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // length filter: min size >= t*max size is necessary for J >= t
    // (same epsilon guard: never prune on a float rounding artifact)
    val candidates = probeIds match {
      case None =>
        val pa = ranked.select(col(idCol).as("id_a"), col("h"),
          col("sz").as("sz_a"))
        val pb = ranked.select(col(idCol).as("id_b"), col("h"),
          col("sz").as("sz_b"))
        pa.join(pb, Seq("h"))
          .filter(col("id_a") < col("id_b"))
          .filter(col("sz_b") >= ceil(col("sz_a") * threshold - 1e-9) &&
            col("sz_a") >= ceil(col("sz_b") * threshold - 1e-9))
          .select("id_a", "id_b").distinct()
      case Some(probe) =>
        // probe side × full side: every pair touching a probe appears
        // (both orientations when both sides are probes — the distinct
        // folds them); probe-free bucket pairs never materialize
        val pp = ranked
          .join(probe.select(col(idCol)), Seq(idCol), "left_semi")
          .select(col(idCol).as("__pid"), col("h"), col("sz").as("sz_p"))
        val po = ranked.select(col(idCol).as("__oid"), col("h"),
          col("sz").as("sz_o"))
        pp.join(po, Seq("h"))
          .filter(col("__pid") =!= col("__oid"))
          .filter(col("sz_o") >= ceil(col("sz_p") * threshold - 1e-9) &&
            col("sz_p") >= ceil(col("sz_o") * threshold - 1e-9))
          .select(least(col("__pid"), col("__oid")).as("id_a"),
            greatest(col("__pid"), col("__oid")).as("id_b"))
          .distinct()
    }
    // verify: attach the per-doc shingle arrays to both sides of the
    // candidate list and intersect natively — candidate-count × O(|set|)
    // work, no 10M-row three-way join. Broadcast when the corpus fits the
    // broadcast limit (bench scale); otherwise shuffled equi-joins on the
    // id, same plan shape, any scale.
    val setsA = sets.select(col(idCol).as("id_a"), col("shset").as("set_a"))
    val setsB = sets.select(col(idCol).as("id_b"), col("shset").as("set_b"))
    candidates
      .join(if (doBroadcast) broadcast(setsA) else setsA, "id_a")
      .join(if (doBroadcast) broadcast(setsB) else setsB, "id_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("union_",
        (size(col("set_a")) + size(col("set_b"))).cast("long") - col("inter"))
      .withColumn("jaccard",
        when(col("union_") > 0, col("inter").cast("double") / col("union_").cast("double"))
          .otherwise(lit(1.0)))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Near-dup CLUSTER resolution with exact-duplicate collapse first:
    * byte-identical texts (raw md5 groups) are collapsed to their min-id
    * representative BEFORE the expensive shingle/pair stage, the exact
    * pair tier ([[prefixJaccardPairs]]) + connected components run over
    * representatives only, and the clusters are expanded back over the
    * exact groups at the end. Output per transitive cluster:
    * `(cluster_id = min member id, n_docs, max_id)`.
    *
    * Semantics are IDENTICAL to pair generation over the full corpus:
    * an exact group's members have the representative's shingle set, so
    * (a) every size-≥2 group is a clique of Jaccard-1.0 pairs (always
    * clustered, even when the rep has no other neighbor), and (b) a
    * cross-group pair exists iff the representatives pair (same
    * Jaccard). Labels stay min-id because each representative IS its
    * group's min id. Grouping is on the RAW text (not the normalized
    * [[TextAnalysis.fingerprint]]): case-folding could merge docs whose
    * shingle sets differ, which would manufacture pairs the exact tier
    * never emits.
    *
    * Why collapse first: exact duplicates are the dominant duplicate
    * class in web corpora and the pair stage's cost is superlinear in
    * shingle-bucket sizes — the quadratic stage shrinks by the
    * duplication factor for the price of one md5 groupBy shuffle.
    */
  def nearDupClusters(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame =
    nearDupMembers(df, idCol, textCol, shingleN, threshold)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"), max(col(idCol)).as("max_id"))

  /** Per-document cluster MEMBERSHIP under [[nearDupClusters]]' exact
    * semantics: one row `(idCol, cluster_id = min member id)` per doc
    * that belongs to a transitive near-dup cluster; singleton docs (no
    * exact twin, no near-dup neighbor) emit nothing. This is the
    * relation a collapse pass joins back on — [[nearDupClusters]] is
    * its per-cluster summary, [[qualityCollapse]] its argmax drain.
    */
  def nearDupMembers(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    val memberMap = exactMemberMap(df, idCol, textCol)
    // representatives keep their text for the pair stage
    val reps = df.select(col(idCol), col(textCol))
      .join(memberMap.filter(col(idCol) === col("rep_id")).select(col(idCol)),
        Seq(idCol), "left_semi")
    val pairs = prefixJaccardPairs(reps, idCol, textCol, shingleN, threshold)
    membersFromPairs(memberMap, pairs, idCol)
  }

  /** The exact-duplicate group structure the near-dup tier collapses
    * first: one row per doc, `(idCol, rep_id = min id sharing its RAW
    * md5 text fingerprint, grp_n = group size)` — one shuffle on the
    * fingerprint. Public so a two-closure pipeline can restrict/regroup
    * it for a drained subset without re-hashing the corpus.
    */
  def exactMemberMap(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withFp = df.select(col(idCol), md5(col(textCol)).as("fp"))
    val groups = withFp.groupBy(col("fp"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("grp_n"))
    withFp.join(groups, "fp").select(col(idCol), col("rep_id"), col("grp_n"))
  }

  /** [[nearDupMembers]] over PRECOMPUTED exact-group structure
    * ([[exactMemberMap]]) and representative shingle sets
    * ([[shingleSets]] restricted to the reps; persisted by the caller —
    * the pair tier reads it twice). Output identical to
    * [[nearDupMembers]] on the corpus both relations were built from.
    * This is the second-closure entry point: a drained corpus's
    * memberMap is the original one re-repped within its fp-groups, and
    * its rep sets are the original reps' sets re-keyed (identical text
    * ⇒ identical shingle set), so the drain proof never re-shingles.
    * `broadcastSets` follows [[prefixJaccardPairsFromSets]]' contract:
    * None = no broadcast (scale-safe default); pass the source-derived
    * [[autoBroadcastSets]] decision for the bench-scale fast path.
    */
  def nearDupMembersFromSets(
      memberMap: DataFrame, repSets: DataFrame, idCol: String,
      threshold: Double,
      broadcastSets: Option[Boolean] = None): DataFrame =
    membersFromPairs(memberMap,
      prefixJaccardPairsFromSets(repSets, idCol, threshold, broadcastSets),
      idCol)

  private def membersFromPairs(
      memberMap: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val comp = Components.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "rep_id")
    memberMap.join(comp, Seq("rep_id"), "left")
      .select(col(idCol),
        // rep in a component → its label; otherwise a size-≥2 exact
        // group is its own cluster labeled by the rep (= min id);
        // singletons with no neighbor are not duplicates of anything
        coalesce(col("component"),
          when(col("grp_n") > 1, col("rep_id"))).as("cluster_id"))
      .filter(col("cluster_id").isNotNull)
  }

  /** Duplication-mass histogram — the read BEFORE committing to a
    * dedup pass (q185's relation, factored so the streaming telemetry
    * writes the same rows per drain): per transitive near-dup cluster
    * size, how many clusters, how much document mass, and how many
    * docs a keep-one-per-cluster collapse would remove. Size-1 rows
    * are the singletons (docs in no cluster), derived from the corpus
    * total minus the clustered mass — removable 0 by construction.
    * Cost is one [[nearDupClusters]] pass (persisted internally — the
    * cluster relation is consumed twice) plus two scalar aggregates.
    */
  def dupMassHistogram(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    val clusters = CacheRegistry.track(
      nearDupClusters(df, idCol, textCol, shingleN, threshold).persist())
    val multi = clusters.groupBy(col("n_docs").as("size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("n_docs")).as("doc_mass"))
    val single = df.agg(count(lit(1)).as("__nt"))
      .crossJoin(broadcast(clusters.agg(
        coalesce(sum(col("n_docs")), lit(0L)).as("__in"))))
      .select(lit(1L).as("size"),
        (col("__nt") - col("__in")).as("n_clusters"),
        (col("__nt") - col("__in")).as("doc_mass"))
    multi.unionAll(single)
      .withColumn("removable", col("doc_mass") - col("n_clusters"))
  }

  /** Quality-aware near-dup collapse decision: per transitive cluster,
    * keep the member with the HIGHEST value of `qualityCol` (ties → the
    * smallest id) instead of the blind min-id rule. This is the rule a
    * production drain actually wants — near-dup clusters routinely mix
    * truncated/mangled copies with the full document, and min-id keeps
    * whichever crawl happened to be seen first. Output one row per
    * cluster: `(cluster_id, n_docs, keep_id, keep_quality)`; the drain
    * itself is then an anti-join of the corpus against
    * `members minus keep_id`. `qualityCol` must be a NON-NULL numeric
    * column of `df` (a null quality sorts below every real value in
    * the struct argmax and silently loses to any scored sibling —
    * score upstream, or coalesce a floor, before collapsing); the
    * argmax runs as ONE map-side-combinable max(struct) — no window,
    * no per-cluster sort.
    */
  def qualityCollapse(
      df: DataFrame, idCol: String, textCol: String, qualityCol: String,
      shingleN: Int, threshold: Double): DataFrame =
    collapseMembers(
      nearDupMembers(df, idCol, textCol, shingleN, threshold),
      df, idCol, qualityCol)

  /** The argmax tail of [[qualityCollapse]] over a PRECOMPUTED (and
    * typically cached) membership relation — for pipelines that need
    * the membership twice (e.g. decide keepers AND drain the corpus by
    * anti-joining the non-keepers) without re-running the pair tier.
    *
    * `idCol` must be a SIGNED NUMERIC id (long-castable, and greater
    * than Long.MinValue): the smallest-id tiebreak rides inside the
    * max(struct) as an arithmetic NEGATION — a string or decimal id
    * has no negation to ride, and Long.MinValue's would overflow (ANSI
    * mode throws). The long cast below makes the contract explicit —
    * `keep_id` is always emitted as long — matching the non-null
    * contract documented for `qualityCol` on [[qualityCollapse]].
    */
  def collapseMembers(
      members: DataFrame, df: DataFrame, idCol: String,
      qualityCol: String): DataFrame =
    members.join(df.select(col(idCol), col(qualityCol)), Seq(idCol))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col(qualityCol).as("q"),
          (-col(idCol).cast("long")).as("nid"))).as("__best"))
      .select(col("cluster_id"), col("n_docs"),
        (-col("__best.nid")).as("keep_id"),
        col("__best.q").as("keep_quality"))

  /** Content-defined chunking (CDC — the LBFS/FastCDC family reduced to
    * its deterministic token-level core): token i (0-based) STARTS a new
    * chunk when the 48-bit md5 integer of the adjacent token pair
    * `t_{i-1} || " " || t_i` is ≡ 0 mod `divisor` (expected chunk length
    * ≈ divisor tokens). Because the boundary rule depends only on LOCAL
    * content, an insertion near the head of a document shifts every
    * downstream token's POSITION but no downstream chunk's IDENTITY —
    * the property fixed-window chunking ([[graft.operators.Packing]]'
    * chunkTokens) lacks, and the reason storage and corpus dedup
    * pipelines chunk this way. Output one row per chunk:
    * `(idCol, chunk_idx, chunk_fp = md5 of the space-joined chunk
    * tokens, n_tokens)`; empty documents emit nothing. `idCol` must be
    * unique per document (duplicate ids would interleave two documents'
    * tokens in one window — the same contract every keyed dedup tier
    * states).
    *
    * Long-form plan (the [[shingleRows]] precedent): posexplode + ONE
    * doc-keyed window sort shared by the lag flag and its running sum,
    * then a (doc, chunk) aggregation — no interpreted per-row lambdas
    * (an `aggregate` fold building chunk arrays would copy O(chunks)
    * state per token), no driver loop; parallelism is per-document at
    * corpus scale.
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      divisor: Int, keepText: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(divisor > 0, s"divisor=$divisor must be positive")
    val toks = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__p", "__t")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    val pairHash = conv(substring(md5(concat(
      lag(col("__t"), 1).over(w), lit(" "), col("__t"))), 1, 12), 16, 10)
      .cast("long")
    val flagged = toks.withColumn("__b",
      when(col("__p") > 0 && pairHash % divisor === 0, lit(1))
        .otherwise(lit(0)))
    val idx = flagged.withColumn("chunk_idx", sum(col("__b")).over(w))
    val chunks = idx.groupBy(col(idCol), col("chunk_idx"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__p"), col("__t")))),
          x => x.getField("__t"))).as("chunk_text"),
        count(lit(1)).as("n_tokens"))
      .withColumn("chunk_fp", md5(col("chunk_text")))
    if (keepText)
      chunks.select(col(idCol), col("chunk_idx"), col("chunk_fp"),
        col("n_tokens"), col("chunk_text"))
    else
      chunks.select(col(idCol), col("chunk_idx"), col("chunk_fp"),
        col("n_tokens"))
  }

  /** Audit-tier exact Jaccard pairs over the PORTABLE md5-32 shingle
    * hashes — the pair relation whose hash basis a DuckDB oracle can
    * replay bit-for-bit (the production exact tier
    * [[prefixJaccardPairs]] hashes with xxhash64, which no other engine
    * computes; mixing the two bases in one gated query makes 32-bit
    * within-doc collisions VISIBLE as cross-engine diffs at scale).
    * Output `(id_a, id_b, jaccard)` for pairs ≥ `threshold`.
    */
  def portableExactPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame =
    exactJaccardFromHashes(
      portableShingleHashes(df, idCol, textCol, shingleN), threshold)

  /** CDC divisor SWEEP — the expected-chunk-size knob read for
    * [[cdcChunks]]: per divisor on the ladder, total and distinct chunk
    * counts, the mean chunk length, and the duplicate token mass a
    * keep-one-copy chunk store would recover — bigger chunks mean fewer
    * objects but a larger head-chunk loss per edited re-crawl, and this
    * relation prices that trade. The expensive shared work (tokenize +
    * the per-position pair md5) computes ONCE into a cached long-form;
    * only the boundary predicate and the per-(divisor, doc) running sum
    * differ per ladder point, so the ×|divisors| expansion carries a
    * precomputed hash, never a rescan of the corpus parse.
    */
  def cdcDivisorSweep(df: DataFrame, idCol: String, textCol: String,
      divisors: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(divisors.nonEmpty && divisors.forall(_ > 0),
      s"divisors=$divisors must be non-empty and positive")
    val toks = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__p", "__t")))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    val hashed = CacheRegistry.track(toks.withColumn("__h",
        conv(substring(md5(concat(lag(col("__t"), 1).over(wDoc),
          lit(" "), col("__t"))), 1, 12), 16, 10).cast("long"))
      .persist())
    val flagged = hashed.select(col(idCol), col("__p"), col("__t"),
        col("__h"),
        explode(array(divisors.map(d => lit(d)): _*)).as("divisor"))
      .withColumn("__b",
        when(col("__p") > 0 && col("__h") % col("divisor") === 0, lit(1))
          .otherwise(lit(0)))
    val w2 = Window.partitionBy(col("divisor"), col(idCol))
      .orderBy(col("__p"))
    val chunks = flagged.withColumn("__ci", sum(col("__b")).over(w2))
      .groupBy(col("divisor"), col(idCol), col("__ci"))
      .agg(
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__p"), col("__t")))),
          x => x.getField("__t")))).as("fp"),
        count(lit(1)).as("nt"))
    chunks.groupBy(col("divisor"), col("fp"))
      .agg(count(lit(1)).as("occ"), max(col("nt")).as("nt"))
      .groupBy("divisor")
      .agg(sum(col("occ")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        round(sum(col("occ") * col("nt")).cast("double")
          / sum(col("occ")).cast("double"), 6).as("mean_tokens"),
        sum((col("occ") - 1) * col("nt")).as("dup_token_mass"))
      .orderBy("divisor")
  }

  /** Hard ceiling for the explicitly-named brute-force (O(n²) crossJoin)
    * verify tiers: the guard probes with limit(max+1).count() so an
    * oversized relation costs one capped count, never a quadratic join.
    */
  val BruteForceMaxRows: Long = 100000L

  private def requireBruteForceSized(df: DataFrame, op: String, scalePath: String): Unit = {
    val n = df.limit(BruteForceMaxRows.toInt + 1).count()
    require(n <= BruteForceMaxRows,
      s"$op is the O(n²) brute-force verify tier and refuses > " +
        s"$BruteForceMaxRows input rows (got >= $n); use $scalePath at scale")
  }

  /** EXACT n-gram Jaccard over ALL pairs — O(n²) brute force, the
    * test/oracle path (no LSH recall loss). Named for what it does and
    * guarded by [[BruteForceMaxRows]] so no catalog query reaches a
    * crossJoin by an innocent-looking name. Production scale uses
    * [[prefixJaccardPairs]] (exact) or [[minhashNearDups]] (approximate,
    * cheaper at low duplicate density).
    */
  def bruteForceJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    requireBruteForceSized(df, "bruteForceJaccardPairs",
      "prefixJaccardPairs (exact) or minhashNearDups (approximate)")
    val sets = df.select(col(idCol), shingleHashes(col(textCol), shingleN).as("shset"))
    val a = sets.select(col(idCol).as("id_a"), col("shset").as("set_a"))
    val b = sets.select(col(idCol).as("id_b"), col("shset").as("set_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("union_", (size(col("set_a")) + size(col("set_b"))).cast("long") - col("inter"))
      .withColumn("jaccard",
        when(col("union_") > 0, col("inter").cast("double") / col("union_").cast("double"))
          .otherwise(lit(1.0)))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash of the token multiset: per bit position, sum +1/-1
    * over xxhash64(token) bits; bit set iff the sum is positive.
    * Expressed as 64 aggregate() passes folded into one projection —
    * all codegen.
    */
  def simhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Portable 60-bit hash: first 15 hex chars of md5 as a long —
    * expressible identically in any engine with md5 (DuckDB:
    * `('0x' || substr(md5(t), 1, 15))::BIGINT`), so SimHash built on it is
    * oracle-checkable cross-engine, unlike xxhash64/murmur3.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Oracle-portable SimHash: 60-bit signature over md5-derived token
    * hashes, computed LONG-FORM — posexplode the tokens (codegen) and run
    * 60 conditional-sum aggregates in one hash aggregation (one shuffle on
    * the id), instead of [[simhash]]'s 64 interpreted aggregate() lambdas
    * per row. Token multiset semantics (no dedup). Docs with no tokens get
    * signature 0.
    */
  def simhashMd5(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col(idCol), md5Hash60(col("t")).as("h"))
    val sums = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"s$i")
    }
    val agg = tok.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val bits = (0 until 60).map { i =>
      when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    val sims = agg.select(col(idCol), bits.reduce(_ bitwiseOR _).as("simhash"))
    df.select(col(idCol)).join(sims, Seq(idCol), "left")
      .na.fill(0L, Seq("simhash"))
  }

  /** The chunk-exploded long form shared by [[simhashPairsFromSigs]]
    * and [[pigeonholeBucketStats]]: one row per (signature, chunk).
    */
  private def pigeonholeChunks(
      sigs: DataFrame, idCol: String, sigCol: String,
      chunkBits: Int, nChunks: Int): DataFrame =
    sigs.select(
        col(idCol), col(sigCol).as("sim"),
        explode(array((0 until nChunks).map { c =>
          struct(lit(c).as("chunk_id"),
            shiftright(col(sigCol), c * chunkBits)
              .bitwiseAND(lit((1L << chunkBits) - 1)).as("chunk_val"))
        }: _*)).as("ch"))
      .select(col(idCol), col("sim"), col("ch.chunk_id"), col("ch.chunk_val"))

  /** Bucket-population observability for the pigeonhole blocking join:
    * one row `(chunk_id, chunk_val, n)` per bucket with `n ≥ 2`
    * members (singleton buckets produce no candidates — and at web
    * scale they are the overwhelming majority, so they are pruned here
    * rather than shipped). The candidate count of
    * [[simhashPairsFromSigs]] is `Σ n·(n-1)/2` over these rows; the
    * MAX `n` is the quadratic-blowup early warning for low-entropy
    * signature populations (near-solid images concentrate in a few
    * 16-bit chunk values even after representative collapse), which is
    * exactly what this relation exists to surface before a corpus run.
    */
  def pigeonholeBucketStats(
      sigs: DataFrame, idCol: String, sigCol: String,
      chunkBits: Int, nChunks: Int): DataFrame =
    pigeonholeChunks(sigs, idCol, sigCol, chunkBits, nChunks)
      .groupBy("chunk_id", "chunk_val")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)

  /** SimHash near-dup pairs from PRECOMPUTED signatures: block on
    * `nChunks` disjoint `chunkBits`-bit chunks — by pigeonhole, Hamming
    * distance ≤ maxHamming < nChunks guarantees at least one identical
    * chunk, so the blocked join has perfect recall — then verify by
    * popcount of XOR. One shuffle on (chunk, value); bucket sizes bound
    * the candidate count ([[pigeonholeBucketStats]] surfaces them).
    *
    * `maxBucket` (opt-in, default 0 = uncapped): buckets with more
    * than `maxBucket` members are EXCLUDED from the candidate join —
    * the hot-bucket guard for low-entropy populations where one
    * degenerate chunk value would otherwise go quadratic. The cap is
    * never silent: enabling it runs one bounded pre-aggregation and
    * LOGS how many buckets (and members) were dropped, because a
    * dropped bucket sacrifices the pigeonhole recall guarantee for
    * exactly those pairs whose only identical chunk sat in it — a
    * recall trade the operator must own out loud, not bury.
    */
  def simhashPairsFromSigs(
      sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int, chunkBits: Int, nChunks: Int,
      maxBucket: Int = 0): DataFrame = {
    require(maxHamming < nChunks,
      s"pigeonhole needs maxHamming=$maxHamming < nChunks=$nChunks")
    // persisted (r19): both sides of the candidate self-join read this
    // relation, and Spark re-executes the whole upstream per join input
    // — for the perceptual tiers that upstream is the image/audio/video
    // decode+hash MapPartitions pipeline, by far the dominant cost
    // (q114's plan carried the full synth+canonical-hash pipeline
    // TWICE). The exploded form is nChunks rows × ~32 B per signature,
    // a bounded fraction of the input the decode already scanned.
    val all = CacheRegistry.track(
      pigeonholeChunks(sigs, idCol, sigCol, chunkBits, nChunks)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val chunked =
      if (maxBucket <= 0) all
      else {
        val over = all.groupBy("chunk_id", "chunk_val")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > maxBucket)
        // bounded action: three numbers, not the bucket list
        val s = over.agg(count(lit(1)).as("b"), max(col("n")).as("mx"),
          sum(col("n")).as("members")).collect()(0)
        if (s.getLong(0) > 0)
          org.slf4j.LoggerFactory.getLogger(Dedup.getClass).warn(
            s"pigeonhole cap maxBucket=$maxBucket dropped ${s.getLong(0)} " +
              s"hot bucket(s) (largest=${s.getLong(1)}, " +
              s"members=${s.getLong(2)}): pairs whose only identical " +
              "chunk sat in a dropped bucket are NOT emitted")
        all.join(over.select("chunk_id", "chunk_val"),
          Seq("chunk_id", "chunk_val"), "left_anti")
      }
    val a = chunked.select(col(idCol).as("id_a"), col("sim").as("sim_a"),
      col("chunk_id"), col("chunk_val"))
    val b = chunked.select(col(idCol).as("id_b"), col("sim").as("sim_b"),
      col("chunk_id"), col("chunk_val"))
    a.join(b, Seq("chunk_id", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** SimHash near-dup pairs: block on 16-bit chunks (4 chunks; Hamming
    * distance ≤ 3 guarantees ≥ 1 identical chunk), verify by popcount of
    * XOR ≤ maxHamming.
    */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // persisted (r19): the candidate self-join below reads `chunked`
    // twice, and each read re-tokenizes + re-hashes every document —
    // the signature pass is the dominant cost, the exploded relation a
    // few dozen bytes per doc.
    val sigs = CacheRegistry.track(
      df.select(col(idCol), simhash(col(textCol)).as("sim"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val chunked = sigs.select(
      col(idCol), col("sim"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk_id"),
          shiftright(col("sim"), c * 16).bitwiseAND(lit(0xffffL)).as("chunk_val"))
      }: _*)).as("ch"))
      .select(col(idCol), col("sim"), col("ch.chunk_id"), col("ch.chunk_val"))
    val a = chunked.select(col(idCol).as("id_a"), col("sim").as("sim_a"),
      col("chunk_id"), col("chunk_val"))
    val b = chunked.select(col(idCol).as("id_b"), col("sim").as("sim_b"),
      col("chunk_id"), col("chunk_val"))
    a.join(b, Seq("chunk_id", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---------------------------------------------------- embedding cosine

  /** Exact cosine similarity between two float-array columns (fold over
    * zipped dot product; deterministic left-to-right accumulation).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = graft.plans.GraftFunctions.dotProduct(ad, bd)
    val na = sqrt(graft.plans.GraftFunctions.dotProduct(ad, ad))
    val nb = sqrt(graft.plans.GraftFunctions.dotProduct(bd, bd))
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0d))
  }

  /** Embedding near-dup pairs above a cosine threshold, blocked by
    * random-hyperplane LSH sign-buckets (deterministic hyperplanes from
    * mix64 of (plane, dim)); `planes = 0` disables blocking (exact O(n²),
    * test scale only).
    *
    * Scale design: vectors are L2-normalized ONCE up front so the pairwise
    * step is a single dot-product fold (not dot + two norms), and the
    * bucket join caps candidate pairs at sum(bucket²) instead of n² —
    * identical vectors always share every sign bucket, so exact clones are
    * never missed regardless of `planes`.
    */
  def embeddingNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 0, dim: Int = 64): DataFrame = {
    val base = df.select(col(idCol), normalized(col(vecCol)).as("v"))
    val pairs =
      if (planes <= 0) {
        // the documented brute-force reference tier — same explicit
        // size guard as bruteForceJaccardPairs so the O(n²) branch can
        // only be reached deliberately on verify-sized input
        requireBruteForceSized(base, "embeddingNearDups(planes <= 0)",
          "planes > 0 (hyperplane LSH) or gridNearDups (exact recall)")
        val a = base.select(col(idCol).as("id_a"), col("v").as("va"))
        val b = base.select(col(idCol).as("id_b"), col("v").as("vb"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
      } else {
        val bucketed = base.withColumn("bucket", hyperplaneBucket(col("v"), planes, dim))
        val a = bucketed.select(col(idCol).as("id_a"), col("v").as("va"), col("bucket"))
        val b = bucketed.select(col(idCol).as("id_b"), col("v").as("vb"), col("bucket"))
        a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      }
    pairs
      .withColumn("cosine",
        graft.plans.GraftFunctions.dotProduct(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** EXACT cosine near-dup pairs via coordinate-grid blocking — perfect
    * recall (unlike hyperplane LSH), candidate count far below n² at high
    * thresholds.
    *
    * Geometry: for unit vectors, cos(a,b) >= t  ⟹  ||a-b||² = 2-2t  ⟹
    * |a_i - b_i| <= w := sqrt(2(1-t)) for EVERY coordinate i. Bucket each
    * vector by cell_i = floor(v_i / w) on the first `dims` coordinates;
    * any qualifying pair lands in the same or an adjacent cell per
    * coordinate, so probing the 3^dims neighbor cells is exhaustive.
    * Verify by exact dot product (vectors pre-normalized once).
    *
    * At 100 TB: one shuffle on the cell key; each vector is replicated
    * 3^dims times on the probe side only; cell occupancy (and so the
    * pair count) drops geometrically with `dims`. Zero vectors stay in
    * cell 0 and are eliminated by the cosine filter (their dot is 0).
    */
  def gridNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dims: Int = 2): DataFrame = {
    require(threshold > 0 && threshold < 1, s"threshold=$threshold must be in (0,1)")
    require(dims >= 1 && dims <= 6, s"dims=$dims (3^dims probe cells) must be 1..6")
    // widen the cell a hair so float error in the division can never push
    // a qualifying pair two cells apart (wider cells only ADD candidates)
    val w = math.sqrt(2.0 * (1.0 - threshold)) * (1.0 + 1e-9)
    val base = df.select(col(idCol), normalized(col(vecCol)).as("v"))
      .withColumn("cell", array((0 until dims).map { i =>
        floor(element_at(col("v"), i + 1) / w).cast("long")
      }: _*))
    // probe side: every neighbor cell offset in {-1,0,1}^dims
    val offsets = (0 until dims).foldLeft(Seq(Seq.empty[Int])) { (acc, _) =>
      acc.flatMap(o => Seq(-1, 0, 1).map(d => o :+ d))
    }
    val probe = base.select(
      col(idCol).as("id_a"), col("v").as("va"),
      explode(array(offsets.map { off =>
        array(off.zipWithIndex.map { case (d, i) =>
          element_at(col("cell"), i + 1) + d
        }: _*)
      }: _*)).as("cell"))
    val build = base.select(col(idCol).as("id_b"), col("v").as("vb"), col("cell"))
    // no dedupe needed: for a pair (a,b) exactly ONE probe offset equals
    // cell(b) - cell(a), so the join emits each candidate exactly once —
    // the verify stays a pipelined codegen filter with no extra shuffle
    probe.join(build, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.plans.GraftFunctions.dotProduct(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** L2-normalize a numeric array column (zero vector stays zero). */
  def normalized(v: Column): Column = {
    val d = v.cast("array<double>")
    val n = sqrt(graft.plans.GraftFunctions.dotProduct(d, d))
    when(n > 0, transform(d, x => x / n)).otherwise(d)
  }

  /** Sign-pattern bucket id from `planes` deterministic pseudo-random
    * hyperplanes: bit p = sign of dot(v, plane_p), plane_p[d] in [-1,1)
    * derived from mix64(p*8191+d).
    */
  def hyperplaneBucket(v: Column, planes: Int, dim: Int = 64): Column = {
    val bits = (0 until planes).map { p =>
      // dim MUST cover the vector length — dotProduct truncates to the
      // shorter side, so an undersized plane would bucket on a prefix
      val dot = graft.plans.GraftFunctions.dotProduct(v, planeVector(p, dim))
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Deterministic hyperplane as an array literal (values in [-1,1)). */
  private def planeVector(p: Int, dim: Int): Column =
    array(planeVectorValues(p, dim).map(lit(_)): _*)

  /** The [[hyperplaneBucket]] plane constants, public so the DuckDB
    * oracle can inline the identical double literals.
    */
  def planeVectorValues(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map { d =>
      mix64(p.toLong * 8191 + d).toDouble / Long.MaxValue.toDouble
    }

  /** Hyperplane-LSH recall audit (VERDICT r14 order #1b, the q169
    * in-catalog-audit pattern): per cosine decile band ≥ `threshold`,
    * how many TRUE pairs exist and how many share their full
    * sign-pattern bucket — the deterministic recall read for the tier
    * q32 runs (which is rows-only checkable itself). Buckets are
    * computed on the RAW vectors (sign of dot(v, plane) is invariant
    * to positive scaling, so this equals the normalized-vector
    * bucketing of [[embeddingNearDups]]), and cosines via the
    * dot/(‖a‖·‖b‖) form — both replay in SQL as ordered left-fold
    * double sums, identical IEEE op for op.
    *
    * The exact side is the brute-force all-pairs reference (guarded,
    * audit scale only — the production exact tier is [[gridNearDups]],
    * the candidate swap at 100 TB is IVF routing).
    */
  def hyperplaneRecallAudit(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int, dim: Int = 64): DataFrame = {
    require(planes >= 1 && planes <= 16, s"planes=$planes must be 1..16")
    val base = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    requireBruteForceSized(base, "hyperplaneRecallAudit",
      "gridNearDups (exact recall) or IVF candidates at corpus scale")
    val bucketed = CacheRegistry.track(base
      .withColumn("bucket", hyperplaneBucket(col("v"), planes, dim))
      .persist())
    val a = bucketed.select(col("id").as("id_a"), col("v").as("va"),
      col("bucket").as("ba"))
    val b = bucketed.select(col("id").as("id_b"), col("v").as("vb"),
      col("bucket").as("bb"))
    val cb = least(floor(col("cosine") * 10).cast("long"), lit(9L))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .withColumn("found", (col("ba") === col("bb")).cast("long"))
      .groupBy(cb.as("c_band"))
      .agg(count(lit(1)).as("n_exact"), sum(col("found")).as("n_found"))
      .withColumn("recall", round(col("n_found").cast("double") /
        col("n_exact").cast("double"), 6))
      .orderBy("c_band")
  }
}
