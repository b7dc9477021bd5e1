package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-quality regression tests: these assert the PHYSICAL plan shape —
  * pushdown reaching the scan, dimension joins broadcasting, top-k
  * avoiding a full sort — so a refactor that silently degrades the plan
  * fails CI, not the cluster.
  */
class PlanQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** AQE's AdaptiveSparkPlanExec and the QueryStageExec wrappers are
    * LEAF nodes: `.exists`/`.collect` over them never traverse the
    * final physical plan, so WholeStageCodegen assertions would be
    * vacuously false on any exchange-bearing query. Strip them
    * recursively to the real executed tree.
    */
  private def strip(p: SparkPlan): SparkPlan = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      strip(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      strip(q.plan)
    case other => other.withNewChildren(other.children.map(strip))
  }

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // force AQE final plan
    strip(df.queryExecution.executedPlan)
  }

  private def planString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") < 5 && col("l_shipdate") >= "1998-01-01")
      .select("l_orderkey", "l_quantity")
    val scan = planString(df)
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity)") ||
      scan.contains("LessThan(l_quantity,5.0)"))
    // column pruning: only the needed columns + filter columns are read
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("l_extendedprice"))
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    val df = graft.operators.Browse.topK(
      spark.read.parquet(s"$sf/orders.parquet"), 10, col("o_totalprice").desc)
    assert(planString(df).contains("TakeOrderedAndProject"))
  }

  test("dimension join broadcasts (no shuffle of the fact side)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
    val joined = li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    val p = executed(joined).toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("strip_diacritics search stays inside whole-stage codegen") {
    GraftFunctions.ensure(spark)
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(lower(call_function("strip_diacritics", col("l_returnflag"))) === "a")
    val plan = executed(df)
    // '*(n)' prefix in simpleString == WholeStageCodegenExec wrapping
    val hasCodegen = plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasCodegen)
    val p = plan.toString
    // native expression, not a BatchEvalPython/ScalaUDF node
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEval"))
  }

  test("nfc_normalize folds combining sequences, stays codegen, and is " +
      "SQL-callable through the extension registration") {
    GraftFunctions.ensure(spark)
    import spark.implicits._
    val decomposed = "Pre\u0301sek" // e + combining acute, 7 code points
    val composed = "Pr\u00e9sek"    // precomposed e-acute, 6 code points
    val df = Seq(decomposed, composed, "plain").toDF("t")
      .select(call_function("nfc_normalize", col("t")).as("n"))
    val out = df.collect().map(_.getString(0))
    assert(out(0) == composed, "NFC must fold the combining sequence")
    assert(out(1) == composed && out(2) == "plain")
    // a local relation constant-folds at optimization time, so codegen is
    // asserted over a real scan (the q88 shape)
    val scanDf = spark.read.parquet(s"$sf/documents.parquet")
      .select(call_function("nfc_normalize", col("text")).as("n"))
    val plan = executed(scanDf)
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]))
    assert(!plan.toString.contains("ScalaUDF"))
    // registered for SQL text too
    assert(spark.sql(
      "SELECT nfc_normalize('Pre\u0301sek') = 'Pr\u00e9sek'")
      .collect()(0).getBoolean(0))
  }

  test("grid cosine join is aggregation-free: the verify filter pipelines " +
      "straight off the cell join (re-adding a dedupe would regress 50s -> 3s)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = graft.operators.Dedup.gridNearDups(emb, "vec_id", "embedding", 0.99, 3)
    val p = executed(df).toString
    assert(p.contains("Join"), "expected a join in the grid plan")
    // each pair matches in exactly one probe cell, so the whole plan needs
    // NO aggregation anywhere — a distinct()/dropDuplicates would show up
    // as a HashAggregate and means the single-match property was broken
    assert(!p.contains("HashAggregate"),
      "no aggregation belongs anywhere in the grid near-dup plan")
  }

  test("kNN graph broadcasts the node table (n x n scoring without shuffle)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = graft.operators.Ann.knnGraph(emb, "vec_id", "embedding", 3)
    val p = executed(df).toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("Window") || p.contains("WindowGroupLimit"))
  }

  test("prefix jaccard verify joins honor the broadcastSets strategy flag") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pBroadcast = executed(graft.operators.Dedup.prefixJaccardPairs(
      docs, "doc_id", "text", 3, 0.7, broadcastSets = Some(true))).toString
    assert("BroadcastHashJoin".r.findAllIn(pBroadcast).size >= 2,
      "broadcastSets=true: sets must broadcast onto both candidate sides")
    graft.operators.CacheRegistry.drain()
  }

  test("broadcastSets auto-sizes: small corpus broadcasts, over-threshold " +
      "corpus takes the shuffled verify path (no 100 TB broadcast foot-gun)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // default threshold (10MB): tiny corpus => auto picks broadcast
    val pAuto = executed(
      graft.operators.Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.7)
    ).toString
    assert("BroadcastHashJoin".r.findAllIn(pAuto).size >= 2,
      "auto under threshold: sets should broadcast at bench scale")
    graft.operators.CacheRegistry.drain()
    // broadcast disabled session-wide => auto must choose shuffled joins
    // everywhere (freq join included) — this is the plan a 100 TB corpus gets
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pShuffled = executed(
        graft.operators.Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      ).toString
      assert(!pShuffled.contains("BroadcastHashJoin"),
        s"auto over threshold: no broadcast join belongs in the plan:\n$pShuffled")
      assert(pShuffled.contains("SortMergeJoin") ||
        pShuffled.contains("ShuffledHashJoin"),
        "shuffled verify joins expected when broadcast is disabled")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      graft.operators.CacheRegistry.drain()
    }
  }

  test("group centroids aggregate partially (map-side combine on (group, dim))") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = graft.operators.VectorOps.groupCentroids(emb, "label", "embedding")
    val p = executed(df).toString
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("runtime bloom filter injected on a selective shuffle join " +
      "(Catalyst prunes the fact scan at runtime — free at 100 TB)") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val ords = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_totalprice") > 500000)
      val j = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter"),
        s"expected an injected bloom_filter_agg/might_contain in:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("majority aggregation is partial+final hash aggregate") {
    val enc = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("vote"), col("l_returnflag").as("code"),
        col("l_suppkey").as("party"))
    val maj = graft.operators.Majority.majorityDirection(
      enc, Seq("vote", "party"), "code", "A", "N")
    val p = executed(maj).toString
    assert(p.contains("HashAggregate"))
    // partial aggregation present (two HashAggregate levels)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("document chunking is shuffle-free: pure per-row generation, no " +
      "Exchange anywhere in the plan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = executed(graft.operators.Packing.chunkTokens(
      docs, "doc_id", "text", 64, 16)).toString
    assert(!p.contains("Exchange"), p.linesIterator.take(25).mkString("\n"))
  }

  test("boilerplate removal broadcasts the thresholded line relation " +
      "into the anti-join (the big side never shuffles for it)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        concat(col("text"), lit("\nfooter line")).as("text"))
    val p = executed(graft.operators.TextAnalysis.removeBoilerplate(
      docs, "doc_id", "text", 3L)).toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("heavy hitters aggregate partially before the shuffle (common " +
      "n-grams combine map-side)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = executed(graft.operators.TextAnalysis.ngramHeavyHitters(
      docs, "source", "doc_id", "text", 3, 10)).toString
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("PQ encode is a per-row expression: no Exchange anywhere; ADC " +
      "top-k plans as TakeOrderedAndProject over the code relation") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val model = graft.operators.Pq.fit(e, "vec_id", "embedding",
      dim = 64, m = 4, k = 4, iters = 1)
    val enc = graft.operators.Pq.encode(e, "embedding", model)
    assert(!executed(enc).toString.contains("Exchange"))
    val top = graft.operators.Pq.adcTopK(enc, "vec_id", "code", model,
      Array.fill(64)(0.5), topK = 5)
    assert(executed(top).toString.contains("TakeOrderedAndProject"))
    graft.operators.CacheRegistry.drain()
  }

  test("deterministicShuffle broadcasts the offset relation and adds " +
      "NO exchange after the range sort (the rank rides the sorted " +
      "cached layout, not a second window shuffle)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id")
    val p = executed(graft.operators.Sampling.deterministicShuffle(
      docs, "doc_id", seed = 3L)).toString
    assert(p.contains("BroadcastHashJoin"), p)
    // the one data shuffle (range partitioning) lives inside the
    // cached RDD lineage; the visible plan after it must be
    // exchange-free — a hashpartitioning here means the old
    // window-by-partition-id double shuffle regressed
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
    graft.operators.CacheRegistry.drain()
  }

  test("incrementalLshDedup probes the band index by equi-join: no " +
      "cartesian or nested-loop join anywhere") {
    val session = spark
    import session.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val idx = graft.operators.Dedup.lshBandKeys(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val p = executed(graft.operators.Dedup.incrementalLshDedup(
      docs.filter(col("doc_id") % 2 === 1), idx, "doc_id", "text"))
      .toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    graft.operators.CacheRegistry.drain()
  }

  test("weightedSample is one projection + TakeOrderedAndProject: no " +
      "explode of the weight draws, no corpus shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), (col("doc_id") % 7 + 1).as("wt"))
    val top = graft.operators.Sampling.weightedSample(
      docs, "doc_id", "wt", k = 10, seed = 3L)
    val p = executed(top).toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("Generate"), "weight draws must not explode")
    assert(!p.contains("Exchange hashpartitioning"),
      "the sampler must not shuffle the corpus")
    graft.operators.CacheRegistry.drain()
  }

  test("perplexityFilter's exact-quantile cutoff plans WITHOUT a global " +
      "sort or a single-partition window: the in-bucket selection is a " +
      "TakeOrderedAndProject and the gate joins the 1-row cutoff back " +
      "as a broadcast") {
    val session = spark
    import session.implicits._
    val scored = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        round((col("doc_id") % 97).cast("double") / 10.0, 6)
          .as("avg_logprob"))
    val gated = graft.operators.TextAnalysis.perplexityFilter(
      scored, "doc_id", "avg_logprob", dropFrac = 0.25)
    val p = executed(gated).toString
    assert(!p.contains("Window"),
      "the cutoff must not use a (single-partition) rank window")
    assert(!p.contains("Exchange rangepartitioning"),
      "the cutoff must not globally sort the scored relation")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      "the 1-row cutoff must broadcast back, not shuffle:\n" + p.take(1500))
    // behavior smoke on the real relation: exactly floor(n/4) dropped
    val n = scored.count()
    assert(gated.filter(!col("keep")).count() == n / 4, "drop count")
    graft.operators.CacheRegistry.drain()
  }

  test("temperatureMix is a pure per-row filter: the gate itself adds " +
      "no shuffle and the bucket predicate reaches the scan stage") {
    val session = spark
    import session.implicits._
    val mixed = graft.operators.Sampling.temperatureMix(
      spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "lang"),
      "doc_id", "lang", alpha = 0.5)
    val p = executed(mixed).toString
    assert(!p.contains("Exchange"),
      "the mix gate must not shuffle:\n" + p.take(1500))
    assert(!p.contains("Join"), "the thresholds must inline, not join")
    graft.operators.CacheRegistry.drain()
  }

  test("corpusCard is ONE hash aggregation with partial (map-side) " +
      "combine — the dup count rides count_distinct inside it, no " +
      "second shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val p = executed(graft.operators.TextAnalysis.corpusCard(
      docs, "doc_id", "text", "source")).toString
    assert(p.contains("HashAggregate"), p.take(1500))
    // count_distinct plans as the expand+two-level aggregate on the
    // SAME grouping — exchanges only on the source key, never a join
    assert(!p.contains("Join"), "the card must not self-join")
    graft.operators.CacheRegistry.drain()
  }

  test("the IVFADC store probe plans its cell predicate as a partition " +
      "filter over codes-only ReadSchema (no vector column exists to " +
      "read)") {
    val session = spark
    import session.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = graft.operators.Ann.sampleCentroids(
      e, "vec_id", "embedding", 4)
    val model = graft.operators.Pq.fitResiduals(
      graft.operators.Ann.assignCells(e, "embedding", cents),
      "vec_id", "embedding", "cell", cents, dim = 64, m = 4, k = 4,
      iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("pqstore-plan")
      .toString
    graft.operators.Pq.writeIvfAdcIndex(e, "vec_id", "embedding", cents,
      model, dir)
    val q = e.orderBy("vec_id").limit(1)
      .select(col("embedding").cast("array<double>")).collect()(0)
      .getSeq[Double](0).toArray
    val probe = graft.operators.Pq.probeIvfAdcStore(spark, dir,
      "vec_id", cents, model, q, topK = 3, nprobe = 2)
    val p = executed(probe).toString
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      p.take(2000))
    assert(!p.contains("embedding"),
      "the probe must never touch a vector column")
    graft.operators.CacheRegistry.drain()
  }

  test("the IVFADC flat-LUT ranking stays inside whole-stage codegen " +
      "at 4x the old when-chain cliff (8 probes * m=8 * k=256 = 16384 " +
      "constants), with compiled methods under the huge-method " +
      "fallback limit") {
    val session = spark
    import session.implicits._
    // 8 cells * m=8 * k=256: the standard PQ codebook size, 4x the
    // 4096-branch envelope where the old when-chain provably fell out
    // of codegen (r12). The map-literal LUT is one codegen reference,
    // so bytecode is O(m) here — this arm pins that claim with
    // compiled evidence, not just plan shape.
    val m = 8
    val k = 256
    val codebooks = Array.tabulate(m, k, 1)((_, j, _) => j * 0.01)
    val model = graft.operators.Pq.Model(m, 1, codebooks)
    val centroids = (0 until 8).map(c => c -> Seq.fill(8)(c * 0.05))
    val rows = (1L to 200L)
      .map(i => (i, Array.fill(8)((i % 7) * 0.04))).toDF("id", "vec")
    val assigned = graft.operators.Ann.assignCells(rows, "vec", centroids)
    val top = graft.operators.Pq.ivfAdcTopK(assigned, "id", "vec",
      "cell", centroids, model, Array.fill(8)(0.03), topK = 5,
      nprobe = 8)
    assert(top.count() == 5L, "the large-envelope ranking must execute")
    val plan = executed(top)
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      "the ADC projection fell out of whole-stage codegen")
    // compiled evidence, not just plan shape: every generated method
    // stays under spark.sql.codegen.hugeMethodLimit (65535 bytecode
    // bytes) — past it Spark silently degrades to interpreted rows,
    // which is exactly the cliff the flat-LUT rewrite deleted
    val stats = org.apache.spark.sql.execution.debug
      .codegenStringSeq(plan)
    assert(stats.nonEmpty, "no codegen subtrees found")
    val maxMethod = stats.map(_._3.maxMethodCodeSize).max
    assert(maxMethod > 0 && maxMethod < 65535,
      s"maxMethodCodeSize=$maxMethod — the O(m) bytecode claim broke")
    // the WHOLE chain compiles: encode (per-coordinate residual
    // CreateArray — zip_with would fall back interpreted) + ADC
    // ranking. No projection may run outside whole-stage codegen.
    def bareProjects(p: SparkPlan, inWsc: Boolean): Int = p match {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.children.map(bareProjects(_, true)).sum
      case i: org.apache.spark.sql.execution.InputAdapter =>
        i.children.map(bareProjects(_, false)).sum
      case pr: org.apache.spark.sql.execution.ProjectExec =>
        (if (inWsc) 0 else 1) + pr.children.map(bareProjects(_, inWsc)).sum
      case other => other.children.map(bareProjects(_, inWsc)).sum
    }
    assert(bareProjects(plan, inWsc = false) == 0,
      "an interpreted projection survives in the ADC chain:\n" +
        plan.toString.linesIterator.take(12).mkString("\n"))
    graft.operators.CacheRegistry.drain()
  }

  test("blocklistFilter is a pure per-row projection: no Exchange " +
      "anywhere in the plan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = executed(graft.operators.TextAnalysis.blocklistFilter(
      docs, "text", Seq("slow"), Seq("hash join"))).toString
    assert(!p.contains("Exchange"), p.linesIterator.take(25).mkString("\n"))
  }

  test("bm25TopK broadcasts the query-term table (tf collapses before " +
      "the corpus-wide aggregates) and plans no cartesian product") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = executed(graft.operators.TfIdf.bm25TopK(
      docs, "doc_id", "text",
      Seq("q1" -> "hash join", "q2" -> "slow scan"), k = 5)).toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bitextMine broadcasts the right side for the cross-side scoring " +
      "(no CartesianProduct) and reuses ONE cached scoring relation " +
      "for the means and both argmax directions") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = graft.operators.Ann.bitextMine(
      emb.filter(col("vec_id") < 50), emb.filter(col("vec_id") >= 450),
      "vec_id", "embedding", k = 2, threshold = 0.0)
    val plan = executed(df)
    val s = plan.toString
    assert(!s.contains("CartesianProduct"), s.linesIterator.take(20).mkString("\n"))
    val cached = plan.collect {
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
    }
    // pairs feed margin + two means + fwd/bwd argmaxes — all must read
    // the ONE persisted scoring relation, not recompute the n^2 scoring
    assert(cached.length >= 4, s"InMemoryTableScans=${cached.length}")
    graft.operators.CacheRegistry.drain()
  }

  test("prototypeFilter assigns and ranks with ONE shuffle: a single " +
      "hash Exchange on cluster shared by both windows, distance as a " +
      "per-row expression (no explode, no distance join)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = executed(graft.operators.KMeans.prototypeFilter(
      emb, "vec_id", "embedding", k = 4, iters = 1, dropFrac = 0.25))
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.length == 1,
      s"want exactly 1 shuffle, got ${shuffles.length}:\n" +
        plan.toString.linesIterator.take(25).mkString("\n"))
    assert(shuffles.head.outputPartitioning.toString.contains("cluster"),
      shuffles.head.outputPartitioning.toString)
    val s = plan.toString
    assert(s.contains("grid_dist_to"), "distance must be the per-row expr")
    assert(!s.contains("Generate"), "no explode in the distance path")
    graft.operators.CacheRegistry.drain()
  }

  test("groupedPerplexityFilter never globally sorts and never " +
      "collects: every Exchange is hash-partitioned on the group (or " +
      "group histogram) key, no rangepartitioning, no single-partition " +
      "window") {
    val session = spark
    import session.implicits._
    val scored = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"),
        round((col("doc_id") % 97).cast("double") / 10.0, 6).as("sc"))
    val gated = graft.operators.TextAnalysis.groupedPerplexityFilter(
      scored, "lang", "doc_id", "sc", dropFrac = 0.25)
    val plan = executed(gated)
    val p = plan.toString
    assert(!p.contains("Exchange rangepartitioning"),
      "no global sort anywhere in the gate:\n" + p.take(1500))
    assert(!p.contains("Exchange SinglePartition"),
      "no single-partition stage:\n" + p.take(1500))
    // the tracked persists surface as InMemoryTableScan leaves, so
    // exchanges may sit inside cached subplans — any that remain
    // visible must be hash-partitioned on the group key
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    for (e <- shuffles)
      assert(e.outputPartitioning.toString.contains("__g") ||
        e.outputPartitioning.toString.contains("lang"),
        s"non-group shuffle: ${e.outputPartitioning}")
    // behavior smoke: per-group drop counts are exact
    val drops = gated.filter(!col("keep")).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ns = scored.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, n) <- ns)
      assert(drops.getOrElse(g, 0L) == n / 4, s"group $g")
    graft.operators.CacheRegistry.drain()
  }

  test("cmsSketch aggregates partially before its ONE shuffle (map-side " +
      "combine bounds shuffle volume at depth*width per partition) and " +
      "cmsEstimate broadcasts the sketch side") {
    val vals = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang").as("v"))
    val sk = graft.operators.Sketch.cmsSketch(vals, "v", 4, 64)
    val skPlan = executed(sk)
    val shuffles = skPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.length == 1, s"sketch shuffles: ${shuffles.length}")
    // the partial HashAggregate must sit BELOW the exchange
    assert(shuffles.head.child.toString.contains("HashAggregate"),
      "no map-side combine under the sketch shuffle:\n" +
        shuffles.head.child.toString.take(800))
    val est = graft.operators.Sketch.cmsEstimate(
      graft.operators.Sketch.cmsSketch(vals, "v", 4, 64),
      vals.distinct(), "v", 4, 64)
    val ep = executed(est).toString
    assert(ep.contains("BroadcastExchange"),
      "the sketch side must broadcast into the probe join:\n" +
        ep.take(1500))
    graft.operators.CacheRegistry.drain()
  }

  test("nbQualityScore plans as the LM-scorer skeleton: scalar count " +
      "rows broadcast (no CartesianProduct), the corpus-side work is " +
      "keyed aggregation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val labeled = docs.withColumn("y", col("source") === "src0")
    val scored = graft.operators.TextAnalysis.nbQualityScore(
      labeled, "y", docs, "doc_id", "text")
    val p = executed(scored).toString
    assert(!p.contains("CartesianProduct"),
      "scalar relations must broadcast, not cartesian:\n" + p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(1500))
    graft.operators.CacheRegistry.drain()
  }

  test("kmvSketch partially aggregates below its exchange (bounded " +
      "per-key state ships, never the raw values) and the estimate " +
      "adds no shuffle") {
    val session = spark
    import session.implicits._
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("doc_id").cast("string").as("v"))
    val plan = executed(graft.operators.Sketch.kmvEstimate(
      graft.operators.Sketch.kmvSketch(df, "lang", "v", 8), 8))
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.length == 1, s"shuffles: ${shuffles.length}")
    assert(shuffles.head.child.toString.contains("Aggregate"),
      "no partial aggregation under the sketch shuffle:\n" +
        shuffles.head.child.toString.take(600))
    assert(!plan.toString.contains("Exchange rangepartitioning"))
    graft.operators.CacheRegistry.drain()
  }

  test("curriculumOrder never funnels the corpus through one task: no " +
      "SinglePartition exchange, no global window — the only exchange " +
      "family is the intended range partition (plus the broadcast " +
      "offset join)") {
    val session = spark
    import session.implicits._
    val df = (1L to 2000L).map(i => (i, i % 3 + 1)).toDF("id", "stage")
    val ordered = graft.operators.Sampling.curriculumOrder(
      df, "id", "stage", seed = 3L)
    val p = executed(ordered).toString
    assert(!p.contains("Exchange SinglePartition"),
      "global funnel detected:\n" + p.take(1200))
    assert(!p.contains("Window"),
      "the operator must not use a window:\n" + p.take(1200))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      "offsets must join back as a broadcast:\n" + p.take(1200))
    graft.operators.CacheRegistry.drain()
  }

  test("hllRegisters aggregates partially below its ONE shuffle " +
      "(shuffle volume bounded at m rows per partition per group) and " +
      "the rho branch chain stays inside whole-stage codegen") {
    val vals = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("doc_id").cast("string").as("v"))
    val regs = graft.operators.Sketch.hllRegisters(vals, "lang", "v", p = 6)
    val plan = executed(regs)
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.length == 1, s"register shuffles: ${shuffles.length}")
    assert(shuffles.head.child.toString.contains("HashAggregate"),
      "no map-side combine under the register shuffle:\n" +
        shuffles.head.child.toString.take(800))
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      "the rho chain must stay in codegen:\n" + plan.toString.take(800))
    val est = graft.operators.Sketch.hllEstimate(
      graft.operators.Sketch.hllRegisters(vals, "lang", "v", p = 6),
      "lang", p = 6)
    val ep = executed(est).toString
    assert(!ep.contains("Exchange rangepartitioning") &&
      !ep.contains("Exchange SinglePartition"),
      "the estimate must stay group-keyed:\n" + ep.take(1200))
    graft.operators.CacheRegistry.drain()
  }

  test("the minhash audits never go quadratic or single-partition: " +
      "keyed equi-joins only (shingle hash, band key, pair key), no " +
      "CartesianProduct, no global funnel (the only window is the " +
      "shingle builder's per-document lead)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    for (df <- Seq(
        graft.operators.Dedup.minhashRecallAudit(docs, "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 8, threshold = 0.3),
        graft.operators.Dedup.minhashFidelityAudit(docs, "doc_id", "text",
          shingleN = 3, numHashes = 32, threshold = 0.3))) {
      val p = executed(df).toString
      assert(!p.contains("CartesianProduct"),
        "audit must stay keyed:\n" + p.take(1500))
      assert(!p.contains("Exchange SinglePartition"),
        "audit must not funnel through one partition:\n" + p.take(1500))
      graft.operators.CacheRegistry.drain()
    }
  }

  test("the mixture-realization audit broadcasts its scalar totals " +
      "(no CartesianProduct) and keeps the corpus side keyed") {
    val q = graft.SparkEntry.queries("q182_mixture_realization_audit")(
      spark, sf)
    val p = executed(q).toString
    assert(!p.contains("CartesianProduct"),
      "scalar totals must broadcast:\n" + p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "expected broadcast shapes:\n" + p.take(1500))
    assert(!p.contains("Exchange SinglePartition") ||
      p.contains("BroadcastExchange"),
      "corpus side must not funnel:\n" + p.take(1500))
    graft.operators.CacheRegistry.drain()
  }

  test("the dup-mass histogram broadcasts its scalar singleton complement " +
      "and keeps the pair tier keyed (no CartesianProduct)") {
    val q = graft.SparkEntry.queries("q185_dup_mass_histogram")(spark, sf)
    val p = executed(q).toString
    assert(!p.contains("CartesianProduct"),
      "pair tier and scalar complement must stay keyed/broadcast:\n" +
        p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "scalar complement must broadcast:\n" + p.take(1500))
    graft.operators.CacheRegistry.drain()
  }

  test("qualityCollapse argmax is ONE partial-aggregated max(struct): " +
      "keyed joins only, no CartesianProduct, no window sort, no " +
      "single-partition funnel") {
    val q = graft.SparkEntry.queries("q186_quality_collapse")(spark, sf)
    val p = executed(q).toString
    assert(!p.contains("CartesianProduct"),
      "pair tier must stay keyed:\n" + p.take(1500))
    assert(!p.contains("Window"),
      "argmax must be an aggregation, not a window:\n" + p.take(1500))
    assert(!p.contains("Exchange SinglePartition"),
      "collapse must not funnel through one partition:\n" + p.take(1500))
    graft.operators.CacheRegistry.drain()
  }

  test("cdcChunks windows stay DOC-keyed: no single-partition funnel, " +
      "no cartesian, and the boundary flag + running sum share one " +
      "window sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val plan = executed(
      graft.operators.Dedup.cdcChunks(docs, "doc_id", "text", divisor = 8))
    val p = plan.toString
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("Exchange SinglePartition"),
      "chunking must not funnel through one partition:\n" + p.take(1200))
    val sorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }.size
    assert(sorts <= 2,
      s"expected the two window passes to share one doc-keyed sort " +
        s"(plus at most the aggregation's), got $sorts:\n" + p.take(1200))
    graft.operators.CacheRegistry.drain()
  }

  test("the NB threshold sweep joins the 11-row ladder against BOUNDED " +
      "score bins (broadcast nested loop over tiny sides, no cartesian, " +
      "no corpus rescan per threshold)") {
    val q = graft.SparkEntry.queries("q188_nb_threshold_sweep")(spark, sf)
    val p = executed(q).toString
    assert(!p.contains("CartesianProduct"),
      "ladder join must broadcast:\n" + p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "expected the range-condition ladder join as BNLJ:\n" + p.take(1500))
    // the corpus-side NB scorer materializes ONCE into the cached bin
    // relation; both consumers (totals + ladder join) must read the
    // cache, so sweeping thresholds never rescans the corpus
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      "bins must be served from cache for both consumers:\n" + p.take(1500))
    graft.operators.CacheRegistry.drain()
  }

  test("the sweep queries never go quadratic: q190/q193/q195 plans are " +
      "keyed joins + broadcast ladders only (no CartesianProduct), and " +
      "the shared expensive relation is served from cache") {
    for (name <- Seq("q190_temperature_sweep", "q193_cdc_divisor_sweep",
        "q195_lsh_band_sweep")) {
      val p = executed(graft.SparkEntry.queries(name)(spark, sf)).toString
      assert(!p.contains("CartesianProduct"),
        s"$name must stay keyed/broadcast:\n" + p.take(1200))
      graft.operators.CacheRegistry.drain()
    }
    // q194's shared scored relation must be cached (each ladder point
    // re-ranks from it; a re-run of the probe join would defeat the
    // sweep's point)
    val p194 = executed(graft.SparkEntry.queries("q194_ivf_nprobe_sweep")(
      spark, sf)).toString
    assert(p194.contains("InMemoryTableScan") ||
      p194.contains("TableCacheQueryStage"),
      "q194 must serve candidates from cache:\n" + p194.take(1200))
    graft.operators.CacheRegistry.drain()
  }

  test("the round-16 decision tier stays keyed/broadcast: the planner " +
      "queries, both new sweeps, the knob-pick capstone, and the " +
      "source-dup-mass closure plan without a CartesianProduct, and " +
      "the sweeps' shared relations serve from cache") {
    for (name <- Seq("q197_epoch_plan", "q199_packing_policy_contrast",
        "q201_epoch_temperature_plan", "q202_block_size_sweep",
        "q203_epoch_budget_sweep", "q204_source_dup_mass")) {
      val p = executed(graft.SparkEntry.queries(name)(spark, sf)).toString
      assert(!p.contains("CartesianProduct"),
        s"$name must stay keyed/broadcast:\n" + p.take(1200))
      // the once-computed expensive relation (per-source counts, token
      // lengths, membership) must be served from cache, not recomputed
      // per ladder point / per consumer
      assert(p.contains("InMemoryTableScan") ||
        p.contains("TableCacheQueryStage"),
        s"$name must reuse its cached base relation:\n" + p.take(1200))
      graft.operators.CacheRegistry.drain()
    }
    // q200 consumes five sweeps; its plan must carry their caches and
    // no quadratic shape beyond the broadcast ladders
    val p200 = executed(graft.SparkEntry.queries("q200_knob_pick_capstone")(
      spark, sf)).toString
    assert(!p200.contains("CartesianProduct"),
      "q200 must stay keyed/broadcast:\n" + p200.take(1200))
    assert(p200.contains("InMemoryTableScan") ||
      p200.contains("TableCacheQueryStage"),
      "q200 must serve the sweep relations from cache:\n" + p200.take(1200))
    graft.operators.CacheRegistry.drain()
  }

  test("the round-17 decision tier stays keyed/broadcast: the delta " +
      "sweep, the plan-pack capstone, the dedup-discounted mix, and " +
      "the knob-pick extension plan without a CartesianProduct and " +
      "serve their once-computed relations from cache") {
    for (name <- Seq("q207_epoch_delta_sweep", "q208_plan_pack_capstone",
        "q209_dedup_discounted_mix", "q206_knob_pick_extension")) {
      val p = executed(graft.SparkEntry.queries(name)(spark, sf)).toString
      assert(!p.contains("CartesianProduct"),
        s"$name must stay keyed/broadcast:\n" + p.take(1200))
      assert(p.contains("InMemoryTableScan") ||
        p.contains("TableCacheQueryStage"),
        s"$name must reuse its cached base relation:\n" + p.take(1200))
      graft.operators.CacheRegistry.drain()
    }
  }

  test("jlProject is ONE shuffle-free codegen projection: no Exchange, " +
      "no Join, and the fold stays inside WholeStageCodegen") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val proj = graft.operators.Ann.jlProject(
      emb, "vec_id", "embedding", inDim = 64, outDim = 16)
    val plan = executed(proj)
    val p = plan.toString
    assert(!p.contains("Exchange"), "projection must not shuffle:\n" + p.take(800))
    assert(!p.contains("Join"), "projection must not join:\n" + p.take(800))
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      "projection must stay in whole-stage codegen:\n" + p.take(800))
    graft.operators.CacheRegistry.drain()
  }
}
