package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline. One
  *    scan, per-row score, `TakeOrderedAndProject` top-k; the query vector
  *    ships as a literal (broadcast-equivalent), so this scales linearly
  *    and is the right choice whenever k ≪ n and there is ONE query.
  *  - `bruteForceTopKBatch`: many queries at once — broadcast the (small)
  *    query set, score all (query, row) pairs, per-query window top-k.
  *  - `ivfTopK`: IVF-style scale path — k-means-ish coarse centroids picked
  *    deterministically, rows assigned to nearest centroid at write time;
  *    a query probes only `nprobe` nearest cells, turning the 100 TB scan
  *    into a partition-pruned read when the table is written partitioned
  *    by `cell`.
  */
object Ann {

  /** Exact cosine top-k neighbors of one query vector. */
  def bruteForceTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit(_)): _*)
    df.select(
        col(idCol),
        Dedup.cosine(col(vecCol).cast("array<double>"), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Top-k per query for a small broadcast query table
    * (qid, qvec: array<double>).
    */
  def bruteForceTopKBatch(
      df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = df
      .crossJoin(broadcast(queries))
      .withColumn("cosine",
        Dedup.cosine(col(vecCol).cast("array<double>"), col(qvecCol).cast("array<double>")))
    scored
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col(qidCol))
          .orderBy(col("cosine").desc, col(idCol).asc)))
      .filter(col("rnk") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rnk"))
  }

  /** Exact k-nearest-neighbor GRAPH: every node's top-k cosine neighbors —
    * the similarity-search baseline an approximate index (IVF/LSH) is
    * measured against, and the input shape for graph-based dedup or
    * kNN-classification over a corpus.
    *
    * Plan: broadcast the (small) node table against itself — no shuffle
    * for the n² scoring, which stays one codegen stage — then ONE shuffle
    * for the per-node window top-k. At 100 TB the broadcast side becomes
    * the IVF-bucketed candidate set ([[ivfTopK]]); this operator is the
    * n ≲ 10⁵ exact path and the recall oracle.
    */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms once per ROW, not per pair: the n² stage then folds ONE dot
    // product per pair instead of three (dot + both norms) — same float
    // result bit-for-bit, the division sees identical operands
    val v = col(vecCol).cast("array<double>")
    val withNorm = df.select(col(idCol), v.as("v"),
      sqrt(graft.plans.GraftFunctions.dotProduct(v, v)).as("nrm"))
    val a = withNorm.select(col(idCol).as("id"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col(idCol).as("nbr"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("id") =!= col("nbr"))
      .withColumn("cosine",
        when(col("na") > 0 && col("nb") > 0,
          graft.plans.GraftFunctions.dotProduct(col("va"), col("vb")) /
            (col("na") * col("nb")))
          .otherwise(lit(0.0d)))
      // project the vectors away BEFORE the window: the top-k sort then
      // shuffles 3 scalar columns, not 2 × dim doubles per candidate row
      .select(col("id"), col("nbr"), col("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("cosine").desc, col("nbr").asc)))
      .filter(col("rnk") <= k)
  }

  /** Assign each row to its nearest centroid (IVF cell). Centroids is a
    * small local Seq (cell_id → vector).
    */
  def assignCells(
      df: DataFrame, vecCol: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val best = centroids.map { case (cid, c) =>
      struct(Dedup.cosine(v, array(c.map(lit(_)): _*)).as("sim"), lit(cid).as("cell"))
    }
    df.withColumn("cell", greatest(best: _*).getField("cell"))
  }

  /** Deterministic coarse centroids: the embeddings of every (n/cells)-th
    * row by id order — a seeded-sample stand-in for k-means (which would
    * run as an offline MLlib job at production scale).
    */
  def sampleCentroids(
      df: DataFrame, idCol: String, vecCol: String, cells: Int): Seq[(Int, Seq[Double])] = {
    val rows = df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(cells).collect()
    rows.toSeq.zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }
  }

  /** Persist an IVF index as a CELL-PARTITIONED parquet table: rows are
    * assigned to their nearest centroid and written `partitionBy("cell")`,
    * so a probe of `nprobe` cells is partition-pruned I/O — at 100 TB a
    * query reads nprobe/cells of the data, not the full table. This is
    * the write-side half of the IVF design ([[ivfTopK]] is the read side;
    * see AnnStoreSpec for the PartitionFilters proof).
    */
  def writeCellPartitioned(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])], path: String): Unit =
    assignCells(df, vecCol, centroids)
      .select(col(idCol), col(vecCol), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Probe a cell-partitioned store: top-k within the `nprobe` cells
    * nearest the query, reading ONLY those cells' directories.
    */
  def probeCellStore(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      query: Seq[Double], k: Int, nprobe: Int): DataFrame =
    ivfTopK(spark.read.parquet(path), idCol, vecCol, centroids, query, k, nprobe)

  /** The `nprobe` cell ids nearest the query by centroid cosine —
    * driver-side routing shared by [[ivfTopK]] and the IVF-PQ read
    * path ([[Pq.ivfPqTopK]]).
    */
  def probeCells(
      centroids: Seq[(Int, Seq[Double])], query: Seq[Double],
      nprobe: Int): Seq[Int] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na > 0 && nb > 0) dot / (na * nb) else 0.0
    }
    centroids.sortBy { case (_, c) => -cos(c, query) }
      .take(nprobe).map(_._1)
  }

  /** MMR diversified re-ranking (Carbonell & Goldstein, SIGIR 1998) —
    * the standard retrieval post-step that trades pure relevance for
    * coverage: greedily pick `k` of the top-`m` exact-cosine
    * candidates, each step maximizing
    *
    *   λ · sim(query, d) − (1 − λ) · max_{s ∈ selected} sim(d, s)
    *
    * (the max over the empty selection is 0, so step 1 is the pure
    * relevance argmax); ties break on the smaller id.
    *
    * Division of labor at 100 TB: the DISTRIBUTED work is the corpus
    * scan that produces the top-m candidate slate
    * ([[bruteForceTopK]]'s TakeOrderedAndProject — swap in
    * [[ivfTopK]] upstream for the partition-pruned variant) and the
    * m² candidate-pair cosines (one broadcast self-join, codegen dot
    * products); the greedy k-step selection is inherently sequential
    * and runs on the driver over the BOUNDED m-row slate — the
    * limit-bounded serving convention, m a few hundred at most, never
    * the corpus. All sims are the engine's exact doubles
    * ([[Dedup.cosine]] both sides), so the pick sequence is
    * deterministic and oracle-replayable. Ids must be integral
    * (long-castable).
    *
    * Returns one row per pick: (rank, id, qsim, mmr) in pick order.
    */
  def mmrRerank(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], m: Int, k: Int, lambda: Double): DataFrame = {
    require(k > 0 && m >= k, s"need m >= k > 0, got m=$m k=$k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda=$lambda must be in [0, 1]")
    val session = df.sparkSession
    import session.implicits._
    val q = array(query.map(lit(_)): _*)
    val cand = CacheRegistry.track(df
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__v"),
        Dedup.cosine(col(vecCol), q).as("qsim"))
      .orderBy(col("qsim").desc, col("__id").asc)
      .limit(m)
      .persist())
    val a = cand.select(col("__id").as("__ia"), col("__v").as("__va"))
    val b = cand.select(col("__id").as("__ib"), col("__v").as("__vb"))
    val pairSim = a.join(b, col("__ia") =!= col("__ib"))
      .select(col("__ia"), col("__ib"),
        Dedup.cosine(col("__va"), col("__vb")).as("sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val slate = cand.select(col("__id"), col("qsim")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // the pairwise map excludes self-pairs, so a duplicate id in the
    // slate would throw a bare NoSuchElementException mid-selection —
    // fail the contract up front with the offending ids named
    require(slate.map(_._1).distinct.length == slate.length,
      "mmrRerank requires distinct ids in the candidate slate; duplicates: " +
        slate.map(_._1).groupBy(identity).collect {
          case (id, g) if g.length > 1 => id
        }.mkString(","))
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]()
    val remaining = scala.collection.mutable.LinkedHashMap(slate: _*)
    while (selected.length < math.min(k, slate.length)) {
      val best = remaining.iterator.map { case (id, qs) =>
        val ms =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => pairSim((id, s._1))).max
        (id, qs, (lambda * qs) - ((1 - lambda) * ms))
      }.minBy { case (id, _, mmr) => (-mmr, id) }
      selected += best
      remaining.remove(best._1)
    }
    selected.toSeq.zipWithIndex
      .map { case ((id, qs, mmr), i) => (i + 1L, id, qs, mmr) }
      .toDF("rank", idCol, "qsim", "mmr")
  }

  /** Johnson-Lindenstrauss random projection with a DETERMINISTIC ±1
    * matrix (Achlioptas 2003: ±1 entries preserve pairwise distances
    * as well as Gaussian ones): out-dimension j of vector v is
    *
    *   p_j = (Σ_i s(i,j) · v_i) / √outDim,   s(i,j) ∈ {+1, −1}
    *
    * with the signs drawn from the repo's 48-bit md5 integers of
    * `"seed:i:j"` (parity → sign) — no RNG, so the projection, every
    * downstream cosine, and the oracle replay bit-exactly.
    *
    * Scale shape: the sign matrix is a PLAN-TIME CONSTANT (computed
    * once on the driver, folded into literal arrays — the Pq
    * literal-LUT move), so the projection is one codegen'd row-local
    * projection of `outDim` native
    * [[graft.plans.GraftFunctions.dotProduct]] folds: no shuffle, no
    * join, corpus-linear. The
    * point at 100 TB: score/cluster/near-dup passes downstream run on
    * `outDim`-wide vectors instead of `inDim`-wide ones — a
    * inDim/outDim I/O-and-FLOP cut ahead of every ANN tier, composing
    * with (not replacing) IVF/PQ.
    */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int, seed: String = "jl"): DataFrame = {
    require(inDim > 0 && outDim > 0 && outDim <= inDim,
      s"need inDim >= outDim > 0, got inDim=$inDim outDim=$outDim")
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val hex = md.digest(s"$seed:$i:$j"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(12)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }
    val v = col(vecCol).cast("array<double>")
    val scale = math.sqrt(outDim.toDouble)
    val proj = array((0 until outDim).map { j =>
      graft.plans.GraftFunctions.dotProduct(v,
        array((0 until inDim).map(i => lit(sign(i, j))): _*)) / lit(scale)
    }: _*)
    df.select(col(idCol), proj.as("projected"))
  }

  /** [[mmrRerank]] over an IVF-PRUNED candidate pool — the scale path
    * the MMR scaladoc promises: instead of ranking the whole corpus
    * for the top-m slate, restrict to the `nprobe` cells nearest the
    * query ([[probeCells]] routing — over a [[writeCellPartitioned]]
    * store this is partition-pruned I/O, reading nprobe/cells of the
    * data) and run the identical greedy diversification on that
    * slate. Same contract as [[mmrRerank]]; the only semantic
    * difference is the candidate pool, exactly as [[ivfTopK]] vs
    * [[bruteForceTopK]] — and like those, the pruning is replayed
    * exactly by the oracle, not approximated away.
    */
  def ivfMmrRerank(assigned: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])], query: Seq[Double],
      nprobe: Int, m: Int, k: Int, lambda: Double): DataFrame =
    mmrRerank(
      assigned.filter(
        col("cell").isin(probeCells(centroids, query, nprobe): _*)),
      idCol, vecCol, query, m, k, lambda)

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019,
    * "Margin-based Parallel Corpus Mining with Multilingual Sentence
    * Embeddings" — the LASER/CCMatrix alignment rule): a cross-side
    * candidate pair (x, y) scores
    *
    *   margin(x, y) = cos(x, y) / ((meanK(x) + meanK(y)) / 2)
    *
    * where `meanK(v)` is the mean cosine of v's k nearest CROSS-side
    * neighbors — the ratio margin that suppresses "hub" vectors close
    * to everything. Mined pairs are the MUTUAL top-1 by (margin, id)
    * with margin ≥ `threshold` (> 1 ⇒ the pair is closer than its
    * neighborhoods' average — the paper's operating regime).
    *
    * Determinism: per-side neighborhood sums quantize each cosine to
    * DECIMAL(18,12) before summation (order-free — the repo's
    * cross-engine float rule), so means, margins, and both argmax
    * selections replay exactly in the oracle.
    *
    * Scale shape: ONE cross-side scoring relation (right side
    * broadcast; vectors projected away immediately — only (ids, cos)
    * rows flow on) feeds the two neighborhood windows AND the two
    * direction argmaxes, all partitioned by an id. This is the exact
    * n_l × n_r tier; at corpus scale generate candidates with
    * [[ivfTopK]]/[[Pq.ivfAdcTopK]] per side and feed the same margin
    * tail.
    */
  def bitextMine(left: DataFrame, right: DataFrame, idCol: String,
      vecCol: String, k: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(k > 0, s"k=$k must be positive")
    val a = left.select(col(idCol).cast("long").as("id_left"),
      col(vecCol).cast("array<double>").as("__va"))
    val b = right.select(col(idCol).cast("long").as("id_right"),
      col(vecCol).cast("array<double>").as("__vb"))
    val pairs = CacheRegistry.track(a.join(broadcast(b))
      .select(col("id_left"), col("id_right"),
        Dedup.cosine(col("__va"), col("__vb")).as("cos"))
      .persist())
    def meanTopK(keyCol: String, outCol: String): DataFrame = {
      val other = if (keyCol == "id_left") "id_right" else "id_left"
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col("cos").desc, col(other).asc)
      pairs.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .groupBy(col(keyCol))
        .agg((sum(col("cos").cast(DecimalType(18, 12))).cast("double") /
          count(lit(1)).cast("double")).as(outCol))
    }
    val scored = pairs
      .join(meanTopK("id_left", "__ma"), Seq("id_left"))
      .join(meanTopK("id_right", "__mb"), Seq("id_right"))
      .withColumn("margin",
        col("cos") / ((col("__ma") + col("__mb")) / lit(2.0)))
    val fwd = scored.withColumn("__rf", row_number().over(
        Window.partitionBy(col("id_left"))
          .orderBy(col("margin").desc, col("id_right").asc)))
      .filter(col("__rf") === 1)
    val bwd = scored.withColumn("__rb", row_number().over(
        Window.partitionBy(col("id_right"))
          .orderBy(col("margin").desc, col("id_left").asc)))
      .filter(col("__rb") === 1)
      .select(col("id_left"), col("id_right"))
    fwd.join(bwd, Seq("id_left", "id_right"))
      .filter(col("margin") >= threshold)
      .select(col("id_left"), col("id_right"),
        round(col("cos"), 6).as("cos"), round(col("margin"), 6).as("margin"))
  }

  /** BATCH IVF: [[ivfTopK]] for a whole query TABLE in one declarative
    * plan — no per-query driver routing. The probe routing itself
    * becomes a relation: queries × centroids (both tiny, broadcast)
    * rank cells per query by centroid cosine with [[probeCells]]' tie
    * rule (sim desc, cell asc), keep `nprobe` per query; the corpus
    * joins that (qid, cell) routing table on the cell key — over a
    * [[writeCellPartitioned]] store the cell predicate is still
    * partition-pruned I/O via dynamic partition pruning — and one
    * per-qid window takes the top-k. Shuffle shape: a broadcast of
    * the routing relation, one window shuffle on qid; per-query cost
    * follows probed-cell volume, never the corpus.
    */
  def ivfTopKBatch(
      assigned: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k=$k must be positive")
    ivfScoredCandidates(assigned, idCol, vecCol, centroids, queries,
      qidCol, qvecCol, nprobe)
      .drop("probe_rank")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(qidCol))
          .orderBy(col("cosine").desc, col(idCol).asc)))
      .filter(col("rnk") <= k)
  }

  /** The scored candidate relation behind [[ivfTopKBatch]], with each
    * candidate's PROBE RANK kept (`probe_rank` = how many cells deep
    * the routing had to go to reach this row's cell): computing it once
    * at the largest nprobe lets an nprobe SWEEP re-rank top-k per
    * ladder point from one cached relation — filtering
    * `probe_rank <= p` is exactly the candidate set ivfTopKBatch would
    * have scored at nprobe = p, so the expensive probe join never
    * re-runs. Output `(qidCol, idCol, cosine, probe_rank)`. Query ids
    * must be unique (a duplicated qid duplicates its candidate rows and
    * every downstream top-k).
    */
  def ivfScoredCandidates(
      assigned: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      queries: DataFrame, qidCol: String, qvecCol: String,
      nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe > 0, s"nprobe=$nprobe must be positive")
    val session = assigned.sparkSession
    import session.implicits._
    val cents = centroids.map { case (cid, v) => (cid, v) }
      .toDF("cell", "__cvec")
    val q = queries.select(col(qidCol).cast("long").as("__qid"),
      col(qvecCol).cast("array<double>").as("__qv"))
    val routing = q.crossJoin(broadcast(cents))
      .withColumn("__csim",
        Dedup.cosine(col("__cvec"), col("__qv")))
      .withColumn("__crk", row_number().over(
        Window.partitionBy(col("__qid"))
          .orderBy(col("__csim").desc, col("cell").asc)))
      .filter(col("__crk") <= nprobe)
      .select(col("__qid"), col("__qv"), col("cell"), col("__crk"))
    assigned.join(broadcast(routing), Seq("cell"))
      .select(col("__qid").as(qidCol), col(idCol),
        Dedup.cosine(col(vecCol).cast("array<double>"), col("__qv"))
          .as("cosine"),
        col("__crk").as("probe_rank"))
  }

  /** IVF query: score only rows in the `nprobe` cells nearest the query. */
  def ivfTopK(
      assigned: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val q = array(query.map(lit(_)): _*)
    assigned
      .filter(col("cell").isin(probeCells(centroids, query, nprobe): _*))
      .select(col(idCol),
        Dedup.cosine(col(vecCol).cast("array<double>"), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
