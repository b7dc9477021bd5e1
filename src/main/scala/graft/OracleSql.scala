package graft

/** DuckDB-dialect oracle SQL for each SparkEntry query (driver runs these
  * over the same parquet tables at sf0.01 and hash-compares). Queries with
  * engine-specific hashing (xxhash64/murmur3) or sign-ambiguous math (SVD)
  * have no oracle → driver records the weaker rows-only check.
  */
object OracleSql {

  /** Shared CTE chain for the portable-minhash audits (q177/q179):
    * corpus ∪ clone, 3-shingles, distinct 32-bit md5 shingle hashes,
    * exact Jaccard pairs ≥ 0.3 from the hash relation (the audit
    * floor, NOT the dedup tiers' 0.7 — the recall curve needs the low
    * bands), and the k=32
    * affine mod-prime signatures with the SAME (a_j, b_j) constants
    * the Spark side derives (inlined as a VALUES relation — parameters
    * shared, formulation independent).
    */
  private val minhashAuditCtes: String = {
    val perms = graft.operators.Dedup.permConstants(32).zipWithIndex
      .map { case ((a, b), j) => s"($j, $a, $b)" }
      .grouped(3).map(_.mkString(", ")).mkString(",\n        |    ")
    s"""btoks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
      |  FROM documents),
      |variant AS (
      |  SELECT doc_id + 1000000 AS doc_id,
      |    array_to_string(ts[1 : CAST(greatest(3,
      |      len(ts) - ((doc_id % 8) * len(ts)) // 12) AS INT)], ' ') AS text
      |  FROM btoks),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM variant),
      |toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
      |  FROM corpus),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ts) >= 3
      |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
      |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
      |      ELSE [array_to_string(ts, ' ')] END AS shingles
      |  FROM toks),
      |ex AS (
      |  SELECT DISTINCT doc_id,
      |    CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |exact AS (
      |  SELECT id_a, id_b,
      |    CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
      |      AS jaccard
      |  FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
      |    >= 0.3),
      |perms(j, a, b) AS (
      |  VALUES $perms),
      |sig AS (
      |  SELECT e.doc_id, p.j, min((e.h * p.a + p.b) % 4294967311) AS m
      |  FROM ex e CROSS JOIN perms p GROUP BY e.doc_id, p.j)""".stripMargin
  }

  // ------------------------------------------------------- shared sweeps
  // Each knob sweep's pricing relation is defined ONCE below and
  // interpolated into BOTH its standalone oracle and the knob-pick
  // capstones (q200/q206) — the minhashAuditCtes pattern — so a fix to
  // a sweep's oracle can never silently diverge from the decision rule
  // that consumes it. CTE names are prefixed per sweep so any subset
  // composes in one WITH clause.

  /** Near-dup Jaccard threshold ladder (q191/q200): requires
    * [[minhashAuditCtes]]'s `exact` relation; ends in
    * `nd_sweep(threshold, n_pairs, mean_jaccard)` plus the
    * intermediate `nd_q` (per-threshold qualifying pairs) for q191's
    * distinct-doc tally.
    */
  private val ndSweepCtes: String =
    """nd_th AS (
      |  SELECT CAST(i AS DOUBLE) / 10.0 AS threshold
      |  FROM (SELECT unnest(range(3, 10)) AS i)),
      |nd_q AS (
      |  SELECT th.threshold, e.id_a, e.id_b, e.jaccard
      |  FROM nd_th th JOIN exact e ON e.jaccard >= th.threshold),
      |nd_agg AS (
      |  SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs,
      |    round(CAST(sum(CAST(round(jaccard, 6) AS DECIMAL(18,12)))
      |        AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_jaccard
      |  FROM nd_q GROUP BY threshold),
      |nd_sweep AS (
      |  SELECT th.threshold,
      |    CAST(coalesce(a.n_pairs, 0) AS BIGINT) AS n_pairs,
      |    coalesce(a.mean_jaccard, 0.0) AS mean_jaccard
      |  FROM nd_th th LEFT JOIN nd_agg a USING (threshold))""".stripMargin

  /** NB gate threshold ladder (q188/q200): self-contained; ends in
    * `nb_sweep(threshold, n_kept, pos_kept, prec)` plus
    * `nb_tots(nt, pt)` for q188's recall/keep_frac columns.
    */
  private val nbSweepCtes: String =
    """nb_toks AS (
      |  SELECT doc_id,
      |    source IN ('src0','src1','src2','src3','src4') AS y,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
      |  FROM documents),
      |nb_tokl AS (SELECT y, unnest(ts) AS w FROM nb_toks),
      |nb_cw AS (
      |  SELECT w,
      |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS cp,
      |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS cn
      |  FROM nb_tokl GROUP BY w),
      |nb_tot AS (
      |  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
      |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS nn,
      |    count(DISTINCT w) AS v
      |  FROM nb_tokl),
      |nb_pri AS (
      |  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS dp,
      |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS dn
      |  FROM nb_toks),
      |nb_st AS (SELECT doc_id, unnest(ts) AS w FROM nb_toks),
      |nb_term AS (
      |  SELECT s.doc_id,
      |    CAST(ln((COALESCE(nb_cw.cp, 0) + CAST(1.0 AS DOUBLE))
      |      / (nb_tot.np + CAST(1.0 AS DOUBLE) * nb_tot.v))
      |      AS DECIMAL(18,12))
      |    - CAST(ln((COALESCE(nb_cw.cn, 0) + CAST(1.0 AS DOUBLE))
      |      / (nb_tot.nn + CAST(1.0 AS DOUBLE) * nb_tot.v))
      |      AS DECIMAL(18,12)) AS t
      |  FROM nb_st s LEFT JOIN nb_cw ON s.w = nb_cw.w
      |  CROSS JOIN nb_tot),
      |nb_sc AS (SELECT doc_id, SUM(t) AS s FROM nb_term GROUP BY doc_id),
      |nb_fin AS (
      |  SELECT nb_sc.doc_id,
      |    round(CAST(nb_sc.s + CAST(ln(nb_pri.dp) AS DECIMAL(18,12))
      |      - CAST(ln(nb_pri.dn) AS DECIMAL(18,12)) AS DOUBLE), 6)
      |      AS score
      |  FROM nb_sc CROSS JOIN nb_pri),
      |nb_b AS (
      |  SELECT CAST(floor(f.score) AS BIGINT) AS bin, t.y
      |  FROM nb_fin f JOIN nb_toks t USING (doc_id)),
      |nb_bins AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      |  FROM nb_b GROUP BY bin),
      |nb_tots AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS nt,
      |    CAST(sum(n_pos) AS BIGINT) AS pt
      |  FROM nb_bins),
      |nb_th AS (SELECT unnest(range(-5, 6)) * 2 AS threshold),
      |nb_kept AS (
      |  SELECT nb_th.threshold,
      |    CAST(COALESCE(sum(nb_bins.n), 0) AS BIGINT) AS n_kept,
      |    CAST(COALESCE(sum(nb_bins.n_pos), 0) AS BIGINT) AS pos_kept
      |  FROM nb_th LEFT JOIN nb_bins ON nb_bins.bin >= nb_th.threshold
      |  GROUP BY nb_th.threshold),
      |nb_sweep AS (
      |  SELECT threshold, n_kept, pos_kept,
      |    CASE WHEN n_kept > 0
      |      THEN round(CAST(pos_kept AS DOUBLE)
      |        / CAST(n_kept AS DOUBLE), 6)
      |      ELSE 0.0 END AS prec
      |  FROM nb_kept)""".stripMargin

  /** Temperature α ladder (q190/q200): self-contained; ends in
    * `tm_kept(alpha, lang, n_docs, thr, n_kept)` — q190 derives
    * per-α shares, q200 the max/min balance rollup.
    */
  private val tempSweepCtes: String =
    """tm_cnt AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(count(*) AS DOUBLE) AS c
      |  FROM documents GROUP BY lang),
      |tm_m AS (SELECT min(c) AS mc FROM tm_cnt),
      |tm_al AS (SELECT unnest([0.0, 0.25, 0.5, 0.75, 1.0]) AS alpha),
      |tm_thr AS (
      |  SELECT al.alpha, tm_cnt.lang, tm_cnt.n_docs,
      |    CAST(floor(256 * (CASE
      |      WHEN al.alpha = 1.0 THEN CAST(1.0 AS DOUBLE)
      |      WHEN al.alpha = 0.75 THEN sqrt(sqrt(mc / c))
      |      WHEN al.alpha = 0.5 THEN sqrt(mc / c)
      |      WHEN al.alpha = 0.25 THEN sqrt(mc / c) * sqrt(sqrt(mc / c))
      |      ELSE mc / c END)) AS BIGINT) AS thr
      |  FROM tm_al al, tm_cnt, tm_m),
      |tm_bk AS (
      |  SELECT lang,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
      |      AS INTEGER) AS bucket
      |  FROM documents),
      |tm_kept AS (
      |  SELECT t.alpha, t.lang, t.n_docs, t.thr,
      |    CAST(coalesce(sum(CASE WHEN b.bucket < t.thr THEN 1 ELSE 0
      |      END), 0) AS BIGINT) AS n_kept
      |  FROM tm_thr t LEFT JOIN tm_bk b ON b.lang = t.lang
      |  GROUP BY 1, 2, 3, 4)""".stripMargin

  /** CDC divisor ladder (q193/q200): self-contained; ends in the
    * per-fingerprint occurrence relation
    * `cd_perfp(divisor, fp, occ, nt)` — q193's rollup derives
    * n_distinct/mean_tokens from it, q200's `cd_sweep` the dup-mass
    * totals.
    */
  private val cdcSweepCtes: String =
    """cd_base AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
      |  FROM documents),
      |cd_corpus AS (
      |  SELECT doc_id, ts FROM cd_base
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, list_concat(['XX'], ts) AS ts
      |  FROM cd_base),
      |cd_pos AS (
      |  SELECT doc_id, i, ts[i] AS tok,
      |    CASE WHEN i >= 2
      |      THEN CAST(('0x' || substr(md5(ts[i-1] || ' ' || ts[i]),
      |             1, 12)) AS BIGINT)
      |      ELSE NULL END AS h
      |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
      |        FROM cd_corpus)),
      |cd_dv AS (SELECT unnest([4, 8, 16, 32]) AS divisor),
      |cd_fl AS (
      |  SELECT dv.divisor, p.doc_id, p.i, p.tok,
      |    CASE WHEN p.h IS NOT NULL AND p.h % dv.divisor = 0
      |      THEN 1 ELSE 0 END AS b
      |  FROM cd_pos p CROSS JOIN cd_dv dv),
      |cd_ch AS (
      |  SELECT divisor, doc_id, i, tok,
      |    sum(b) OVER (PARTITION BY divisor, doc_id ORDER BY i) AS ci
      |  FROM cd_fl),
      |cd_chunks AS (
      |  SELECT divisor, doc_id, ci,
      |    md5(string_agg(tok, ' ' ORDER BY i)) AS fp,
      |    CAST(count(*) AS BIGINT) AS nt
      |  FROM cd_ch GROUP BY divisor, doc_id, ci),
      |cd_perfp AS (
      |  SELECT divisor, fp, CAST(count(*) AS BIGINT) AS occ,
      |    max(nt) AS nt
      |  FROM cd_chunks GROUP BY divisor, fp)""".stripMargin

  /** IVF nprobe ladder (q194/q200): self-contained; ends in
    * `ip_sweep(nprobe, n_hits, recall, n_scanned)`.
    */
  private val ivfSweepCtes: String =
    """ip_cents AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
      |    embedding AS c
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        ORDER BY vec_id LIMIT 16)),
      |ip_qs AS (SELECT vec_id AS qid, embedding AS qv
      |          FROM embeddings WHERE vec_id < 8),
      |ip_assigned AS (
      |  SELECT vec_id, embedding, cell,
      |    row_number() OVER (PARTITION BY vec_id
      |      ORDER BY sim DESC, cell DESC) AS rn
      |  FROM (
      |    SELECT e.vec_id, e.embedding, c.cell,
      |      list_sum(list_transform(range(1, len(e.embedding) + 1),
      |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
      |           i -> CAST(e.embedding[i] AS DOUBLE)
      |                * CAST(e.embedding[i] AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(range(1, len(c.c) + 1),
      |           i -> CAST(c.c[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE)))))
      |        AS sim
      |    FROM embeddings e CROSS JOIN ip_cents c)),
      |ip_routing AS (
      |  SELECT qid, cell, crk FROM (
      |    SELECT qid, cell,
      |      row_number() OVER (PARTITION BY qid
      |        ORDER BY csim DESC, cell ASC) AS crk
      |    FROM (
      |      SELECT q.qid, c.cell,
      |        list_sum(list_transform(range(1, len(c.c) + 1),
      |          i -> CAST(c.c[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
      |        / (sqrt(list_sum(list_transform(range(1, len(c.c) + 1),
      |             i -> CAST(c.c[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE))))
      |         * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
      |             i -> CAST(q.qv[i] AS DOUBLE)
      |                  * CAST(q.qv[i] AS DOUBLE)))))
      |          AS csim
      |      FROM ip_qs q CROSS JOIN ip_cents c) s0)
      |  WHERE crk <= 8),
      |ip_cand AS (
      |  SELECT r.qid, a.vec_id, r.crk,
      |    list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
      |         i -> CAST(a.embedding[i] AS DOUBLE)
      |              * CAST(a.embedding[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
      |         i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
      |      AS cos
      |  FROM ip_assigned a
      |  JOIN ip_routing r ON a.cell = r.cell AND a.rn = 1
      |  JOIN ip_qs q ON q.qid = r.qid),
      |ip_np AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
      |ip_lad AS (
      |  SELECT np.nprobe, c.qid, c.vec_id,
      |    row_number() OVER (PARTITION BY np.nprobe, c.qid
      |      ORDER BY c.cos DESC, c.vec_id ASC) AS rk
      |  FROM ip_np np JOIN ip_cand c ON c.crk <= np.nprobe),
      |ip_scanned AS (
      |  SELECT np.nprobe, CAST(count(*) AS BIGINT) AS n_scanned
      |  FROM ip_np np JOIN ip_cand c ON c.crk <= np.nprobe
      |  GROUP BY np.nprobe),
      |ip_ex AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT qid, vec_id,
      |      row_number() OVER (PARTITION BY qid
      |        ORDER BY cos DESC, vec_id ASC) AS rk
      |    FROM (
      |      SELECT q.qid, e.vec_id,
      |        list_sum(list_transform(range(1, len(e.embedding) + 1),
      |          i -> CAST(e.embedding[i] AS DOUBLE)
      |               * CAST(q.qv[i] AS DOUBLE)))
      |        / (sqrt(list_sum(list_transform(
      |             range(1, len(e.embedding) + 1),
      |             i -> CAST(e.embedding[i] AS DOUBLE)
      |                  * CAST(e.embedding[i] AS DOUBLE))))
      |         * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
      |             i -> CAST(q.qv[i] AS DOUBLE)
      |                  * CAST(q.qv[i] AS DOUBLE)))))
      |          AS cos
      |      FROM embeddings e CROSS JOIN ip_qs q) s2)
      |  WHERE rk <= 10),
      |ip_ext AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM ip_ex),
      |ip_hits AS (
      |  SELECT l.nprobe, CAST(count(*) AS BIGINT) AS n_hits
      |  FROM ip_lad l JOIN ip_ex ON ip_ex.qid = l.qid
      |    AND ip_ex.vec_id = l.vec_id
      |  WHERE l.rk <= 10 GROUP BY l.nprobe),
      |ip_sweep AS (
      |  SELECT np.nprobe,
      |    CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      |    round(CAST(coalesce(h.n_hits, 0) AS DOUBLE)
      |      / CAST(ext.tot AS DOUBLE), 6) AS recall,
      |    CAST(coalesce(s.n_scanned, 0) AS BIGINT) AS n_scanned
      |  FROM ip_np np CROSS JOIN ip_ext ext
      |  LEFT JOIN ip_hits h ON h.nprobe = np.nprobe
      |  LEFT JOIN ip_scanned s ON s.nprobe = np.nprobe)""".stripMargin

  /** LSH banding ladder (q195/q206): requires [[minhashAuditCtes]]'s
    * `sig` and `exact`; ends in `lb_sweep(bands, rows_per_band,
    * n_candidates, n_found, recall)`.
    */
  private val lshSweepCtes: String =
    """lb_cfg AS (SELECT unnest([4, 8, 16, 32]) AS bands),
      |lb_bk AS (
      |  SELECT s.doc_id, lb_cfg.bands,
      |    s.j // (32 // lb_cfg.bands) AS band_id,
      |    string_agg(CAST(s.m AS VARCHAR), '_' ORDER BY s.j) AS key
      |  FROM sig s CROSS JOIN lb_cfg
      |  GROUP BY s.doc_id, lb_cfg.bands, s.j // (32 // lb_cfg.bands)),
      |lb_cand AS (
      |  SELECT DISTINCT a.bands, a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM lb_bk a JOIN lb_bk b ON a.bands = b.bands
      |    AND a.band_id = b.band_id AND a.key = b.key
      |    AND a.doc_id < b.doc_id),
      |lb_ex5 AS (SELECT id_a, id_b FROM exact WHERE jaccard >= 0.5),
      |lb_ext AS (SELECT CAST(count(*) AS BIGINT) AS nex FROM lb_ex5),
      |lb_nc AS (SELECT bands, CAST(count(*) AS BIGINT) AS n_candidates
      |          FROM lb_cand GROUP BY bands),
      |lb_nf AS (SELECT c.bands, CAST(count(*) AS BIGINT) AS n_found
      |          FROM lb_ex5 e JOIN lb_cand c ON c.id_a = e.id_a
      |            AND c.id_b = e.id_b
      |          GROUP BY c.bands),
      |lb_sweep AS (
      |  SELECT lb_cfg.bands,
      |    CAST(32 // lb_cfg.bands AS INT) AS rows_per_band,
      |    coalesce(lb_nc.n_candidates, 0) AS n_candidates,
      |    coalesce(lb_nf.n_found, 0) AS n_found,
      |    round(CAST(coalesce(lb_nf.n_found, 0) AS DOUBLE)
      |      / CAST(lb_ext.nex AS DOUBLE), 6) AS recall
      |  FROM lb_cfg CROSS JOIN lb_ext
      |  LEFT JOIN lb_nc ON lb_nc.bands = lb_cfg.bands
      |  LEFT JOIN lb_nf ON lb_nf.bands = lb_cfg.bands)""".stripMargin

  /** Block-size ladder (q202/q206): self-contained but RECURSIVE (the
    * first-fit state machine) — interpolate under `WITH RECURSIVE`;
    * ends in `bs_sweep(block_size, n_blocks, n_overfull,
    * padding_tokens, utilization)`.
    */
  private val blockSizeSweepCtes: String =
    """bs_toks AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |bs_ext AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
      |           FROM bs_toks),
      |bs_d0 AS (
      |  SELECT t.doc_id, t.n_tokens,
      |    CAST((t.doc_id - e.lo)
      |      // greatest(1, (e.hi - e.lo) // 8 + 1) AS BIGINT) AS shard
      |  FROM bs_toks t CROSS JOIN bs_ext e),
      |bs_bsl AS (SELECT CAST(unnest([32, 64, 128, 256]) AS BIGINT)
      |             AS block_size),
      |bs_d AS (
      |  SELECT b.block_size, bs_d0.doc_id, bs_d0.n_tokens, bs_d0.shard,
      |    row_number() OVER (PARTITION BY b.block_size, bs_d0.shard
      |      ORDER BY bs_d0.doc_id) AS rn
      |  FROM bs_d0 CROSS JOIN bs_bsl b),
      |bs_packed(block_size, shard, rn, n_tokens, block, fill) AS (
      |  SELECT block_size, shard, rn, n_tokens, CAST(0 AS BIGINT),
      |    n_tokens
      |  FROM bs_d WHERE rn = 1
      |  UNION ALL
      |  SELECT n.block_size, n.shard, n.rn, n.n_tokens,
      |    CASE WHEN p.fill + n.n_tokens <= n.block_size THEN p.block
      |      ELSE p.block + 1 END,
      |    CASE WHEN p.fill + n.n_tokens <= n.block_size
      |      THEN p.fill + n.n_tokens ELSE n.n_tokens END
      |  FROM bs_packed p JOIN bs_d n ON n.block_size = p.block_size
      |    AND n.shard = p.shard AND n.rn = p.rn + 1),
      |bs_blocks AS (
      |  SELECT block_size, shard, block, sum(n_tokens) AS used
      |  FROM bs_packed GROUP BY 1, 2, 3),
      |bs_sweep AS (
      |  SELECT block_size, CAST(count(*) AS BIGINT) AS n_blocks,
      |    CAST(sum(CASE WHEN used > block_size THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_overfull,
      |    CAST(sum(CASE WHEN used <= block_size THEN block_size - used
      |      ELSE 0 END) AS BIGINT) AS padding_tokens,
      |    round(CAST(sum(used) AS DOUBLE)
      |      / CAST(count(*) * block_size AS DOUBLE), 6) AS utilization
      |  FROM bs_blocks GROUP BY block_size)""".stripMargin

  /** The epoch planner's shared base (q197/q198/q207/q208): per-source
    * unique tokens + integer ppm quality weight over `documents`, and
    * the 2.35× (47/20ths) token budget. Ends in `base(doc_id, lang,
    * n_tokens)`, `per(source, unique_tokens, weight_ppm)`,
    * `b(budget)`.
    */
  private val epochPerCtes: String =
    """base AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |per AS (
      |  SELECT lang AS source,
      |    CAST(sum(n_tokens) AS BIGINT) AS unique_tokens,
      |    (1000000 * CAST(sum(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0
      |      END) AS BIGINT)) // CAST(count(*) AS BIGINT) AS weight_ppm
      |  FROM base GROUP BY lang
      |  HAVING CAST(sum(n_tokens) AS BIGINT) > 0),
      |b AS (SELECT (47 * CAST(sum(unique_tokens) AS BIGINT)) // 20
      |        AS budget
      |      FROM per)""".stripMargin

  /** δ-discount ladder (q207/q206): [[epochPerCtes]] + the waterfill
    * with the per-epoch factor generalized to denom^(4-epoch) and the
    * δ arm folded into the window key; ends in `dl_sweep(delta,
    * source, unique_tokens, tokens_alloc, full_epochs, frac_b256,
    * epochs_r6)`.
    */
  private val deltaSweepCtes: String =
    s"""$epochPerCtes,
      |dl(delta, dd) AS (VALUES (0.25, CAST(4 AS BIGINT)),
      |  (0.5, CAST(2 AS BIGINT)), (1.0, CAST(1 AS BIGINT))),
      |dl_layers AS (
      |  SELECT d.delta, p.source, p.unique_tokens, p.weight_ppm,
      |    CAST(e.epoch AS INTEGER) AS epoch,
      |    p.weight_ppm * (CASE e.epoch
      |      WHEN 1 THEN d.dd * d.dd * d.dd
      |      WHEN 2 THEN d.dd * d.dd
      |      WHEN 3 THEN d.dd ELSE CAST(1 AS BIGINT) END)
      |      AS value_scaled
      |  FROM per p CROSS JOIN generate_series(1, 4) e(epoch)
      |  CROSS JOIN dl d),
      |dl_alloc AS (
      |  SELECT l.*, b.budget,
      |    COALESCE(sum(l.unique_tokens) OVER (
      |      PARTITION BY l.delta
      |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_prev
      |  FROM dl_layers l CROSS JOIN b),
      |dl_la AS (
      |  SELECT *, GREATEST(CAST(0 AS BIGINT),
      |      LEAST(unique_tokens, budget - cum_prev)) AS layer_alloc
      |  FROM dl_alloc),
      |dl_plan AS (
      |  SELECT delta, source, unique_tokens,
      |    CAST(sum(layer_alloc) AS BIGINT) AS tokens_alloc,
      |    CAST(sum(CASE WHEN layer_alloc = unique_tokens THEN 1
      |      ELSE 0 END) AS BIGINT) AS full_epochs
      |  FROM dl_la GROUP BY delta, source, unique_tokens),
      |dl_sweep AS (
      |  SELECT delta, source, unique_tokens, tokens_alloc, full_epochs,
      |    (256 * (tokens_alloc - full_epochs * unique_tokens))
      |      // unique_tokens AS frac_b256,
      |    round(CAST(tokens_alloc AS DOUBLE)
      |      / CAST(unique_tokens AS DOUBLE), 6) AS epochs_r6
      |  FROM dl_plan)""".stripMargin

  /** Epoch-budget ladder (q203/q206): self-contained (the q197
    * waterfill with the budget folded into the window key); ends in
    * `eb_sweep(budget_20ths, source, unique_tokens, tokens_alloc,
    * full_epochs, frac_b256, epochs_r6)`.
    */
  private val budgetSweepCtes: String =
    """eb_base AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |eb_per AS (
      |  SELECT lang AS source,
      |    CAST(sum(n_tokens) AS BIGINT) AS unique_tokens,
      |    (1000000 * CAST(sum(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0
      |      END) AS BIGINT)) // CAST(count(*) AS BIGINT) AS weight_ppm
      |  FROM eb_base GROUP BY lang
      |  HAVING CAST(sum(n_tokens) AS BIGINT) > 0),
      |eb_tt AS (SELECT CAST(sum(unique_tokens) AS BIGINT) AS total
      |          FROM eb_per),
      |eb_bl AS (SELECT CAST(unnest([20, 30, 47, 60, 80]) AS BIGINT)
      |            AS budget_20ths),
      |eb_layers AS (
      |  SELECT b.budget_20ths,
      |    (b.budget_20ths * tt.total) // 20 AS budget,
      |    p.source, p.unique_tokens, p.weight_ppm,
      |    CAST(e.epoch AS INTEGER) AS epoch,
      |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
      |      AS value_scaled
      |  FROM eb_per p CROSS JOIN generate_series(1, 4) e(epoch)
      |  CROSS JOIN eb_bl b CROSS JOIN eb_tt tt),
      |eb_alloc AS (
      |  SELECT l.*,
      |    COALESCE(sum(l.unique_tokens) OVER (
      |      PARTITION BY l.budget_20ths
      |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_prev
      |  FROM eb_layers l),
      |eb_la AS (
      |  SELECT *, GREATEST(CAST(0 AS BIGINT),
      |      LEAST(unique_tokens, budget - cum_prev)) AS layer_alloc
      |  FROM eb_alloc),
      |eb_plan AS (
      |  SELECT budget_20ths, source, unique_tokens,
      |    CAST(sum(layer_alloc) AS BIGINT) AS tokens_alloc,
      |    CAST(sum(CASE WHEN layer_alloc = unique_tokens THEN 1
      |      ELSE 0 END) AS BIGINT) AS full_epochs
      |  FROM eb_la GROUP BY budget_20ths, source, unique_tokens),
      |eb_sweep AS (
      |  SELECT budget_20ths, source, unique_tokens, tokens_alloc,
      |    full_epochs,
      |    (256 * (tokens_alloc - full_epochs * unique_tokens))
      |      // unique_tokens AS frac_b256,
      |    round(CAST(tokens_alloc AS DOUBLE)
      |      / CAST(unique_tokens AS DOUBLE), 6) AS epochs_r6
      |  FROM eb_plan)""".stripMargin

  /** Epoch-plan drift under batch arrival (q212/q213): the q197
    * waterfill with the cumulative-batch arm folded into the window
    * key; ends in `pln(nb, source, unique_tokens, tokens_alloc,
    * full_epochs)` and `fin(source, fe3)`.
    */
  private val epochDriftCtes: String =
    """dbase AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |perb AS (
      |  SELECT lang AS source, doc_id % 3 AS b,
      |    CAST(sum(n_tokens) AS BIGINT) AS tk,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS q
      |  FROM dbase GROUP BY lang, doc_id % 3),
      |nbl AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS nb),
      |per AS (
      |  SELECT l.nb, p.source,
      |    CAST(sum(p.tk) AS BIGINT) AS unique_tokens,
      |    (1000000 * CAST(sum(p.q) AS BIGINT))
      |      // CAST(sum(p.n) AS BIGINT) AS weight_ppm
      |  FROM perb p JOIN nbl l ON p.b < l.nb
      |  GROUP BY l.nb, p.source
      |  HAVING CAST(sum(p.tk) AS BIGINT) > 0),
      |bud AS (
      |  SELECT nb, (47 * CAST(sum(unique_tokens) AS BIGINT)) // 20
      |    AS budget
      |  FROM per GROUP BY nb),
      |layers AS (
      |  SELECT p.nb, p.source, p.unique_tokens, p.weight_ppm,
      |    CAST(e.epoch AS INTEGER) AS epoch,
      |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
      |      AS value_scaled
      |  FROM per p CROSS JOIN generate_series(1, 4) e(epoch)),
      |alloc AS (
      |  SELECT l.*, b.budget,
      |    COALESCE(sum(l.unique_tokens) OVER (
      |      PARTITION BY l.nb
      |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_prev
      |  FROM layers l JOIN bud b USING (nb)),
      |pln AS (
      |  SELECT nb, source, unique_tokens,
      |    CAST(sum(GREATEST(CAST(0 AS BIGINT),
      |      LEAST(unique_tokens, budget - cum_prev))) AS BIGINT)
      |      AS tokens_alloc,
      |    CAST(sum(CASE WHEN GREATEST(CAST(0 AS BIGINT),
      |      LEAST(unique_tokens, budget - cum_prev)) = unique_tokens
      |      THEN 1 ELSE 0 END) AS BIGINT) AS full_epochs
      |  FROM alloc GROUP BY nb, source, unique_tokens),
      |fin AS (
      |  SELECT source, full_epochs AS fe3 FROM pln WHERE nb = 3)""".stripMargin

  /** q204's near-dup closure over the planted corpus + the q211
    * discount (q211/q214): ends in `corpus(doc_id, lang, ts)`,
    * `eff(source, n_docs, eff_docs)`, `pr(source, unique_tokens,
    * weight_ppm)` (raw counts), `pe(...)` (measured-effective counts,
    * HUGEINT-exact scaling), and `beff(budget)` — the EFFECTIVE
    * corpus's 2.35×, the q211 convention. (Named `beff`, not `b`, so
    * the block composes with [[epochPerCtes]]' `b` in the q216
    * capstone.)
    */
  private val dupDiscountCtes: String =
    """dbase AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
      |  FROM documents),
      |corpus AS (
      |  SELECT doc_id, lang, ts FROM dbase
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, 'xx' AS lang, ts
      |  FROM dbase WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS doc_id, lang, ts
      |  FROM dbase WHERE doc_id % 5 = 0),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ts) >= 3
      |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
      |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
      |      ELSE [array_to_string(ts, ' ')] END AS shingles
      |  FROM corpus),
      |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
      |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM shared
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(inter AS DOUBLE)
      |    / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
      |reach(id, label) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
      |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
      |mem AS (
      |  SELECT comp.id AS doc_id, comp.component AS cluster_id, c.lang
      |  FROM comp JOIN corpus c ON c.doc_id = comp.id),
      |pl AS (
      |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM corpus GROUP BY lang),
      |cl AS (
      |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_clustered
      |  FROM mem GROUP BY lang),
      |kp AS (
      |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_kept
      |  FROM mem WHERE doc_id = cluster_id GROUP BY lang),
      |eff AS (
      |  SELECT pl.source, pl.n_docs,
      |    GREATEST(pl.n_docs - (COALESCE(cl.n_clustered, 0)
      |      - COALESCE(kp.n_kept, 0)), 0) AS eff_docs
      |  FROM pl LEFT JOIN cl USING (source)
      |  LEFT JOIN kp USING (source)),
      |pr AS (
      |  SELECT lang AS source,
      |    CAST(sum(len(ts)) AS BIGINT) AS unique_tokens,
      |    (1000000 * CAST(sum(CASE WHEN len(ts) >= 20 THEN 1 ELSE 0
      |      END) AS BIGINT)) // CAST(count(*) AS BIGINT) AS weight_ppm
      |  FROM corpus GROUP BY lang
      |  HAVING CAST(sum(len(ts)) AS BIGINT) > 0),
      |pe AS (
      |  SELECT p.source,
      |    CAST((CAST(p.unique_tokens AS HUGEINT) * e.eff_docs)
      |      // e.n_docs AS BIGINT) AS unique_tokens,
      |    p.weight_ppm
      |  FROM pr p JOIN eff e USING (source)
      |  WHERE CAST((CAST(p.unique_tokens AS HUGEINT) * e.eff_docs)
      |    // e.n_docs AS BIGINT) > 0),
      |beff AS (SELECT (47 * CAST(sum(unique_tokens) AS BIGINT)) // 20
      |        AS budget
      |      FROM pe)""".stripMargin

  private val voteFactsCte =
    """vf AS (
      |  SELECT l.l_orderkey AS vote_id, l.l_suppkey AS member_id,
      |         n.n_name AS party, l.l_returnflag AS code
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
      |mcnt AS (
      |  SELECT vote_id, party,
      |         CAST(sum(CASE WHEN code='A' THEN 1 ELSE 0 END) AS BIGINT) AS yes_cnt,
      |         CAST(sum(CASE WHEN code='N' THEN 1 ELSE 0 END) AS BIGINT) AS no_cnt
      |  FROM vf GROUP BY vote_id, party),
      |maj AS (
      |  SELECT vote_id, party, yes_cnt, no_cnt,
      |         CASE WHEN yes_cnt > no_cnt THEN 'A' WHEN no_cnt > yes_cnt THEN 'N' END AS majority_dir
      |  FROM mcnt WHERE yes_cnt <> no_cnt)""".stripMargin

  private val stop = "('the','a','of','and','to','in','is','on','for','with')"

  /** Unrolled Sennrich BPE chain (q102/q103): `w0` = word counts with
    * char symbolization; each stage k derives weighted adjacent-pair
    * counts (`p{k}`), the count-DESC / lex-ASC argmax (`b{k}`), and the
    * next vocabulary (`w{k+1}`) via the same doubled-separator literal
    * replace the Scala operator uses — rule choice, tiebreaks, and
    * greedy-leftmost application all replayed in SQL. Every stage is
    * `AS MATERIALIZED`: DuckDB inlines CTEs by default, and each stage
    * references its parent ~3× (FROM + two scalar subqueries), so the
    * un-hinted 12-stage chain expands to ~3¹² scans of `documents`
    * (observed as an fd-exhaustion error before it finishes planning).
    * A stage past vocabulary exhaustion (empty `b{k}`) coalesces its
    * scalar subqueries to a no-op replace (`chr(1)` never occurs in a
    * symbol string), mirroring the Scala learner's early stop — without
    * this, the NULL search/replacement args NULL out every `sym`.
    *
    * Unicode-version coupling (exactness caveat, like the decimal-grid
    * notes elsewhere in this file): the `\p{L}` pre-tokenizer is
    * evaluated by java.util.regex on the Spark side and by DuckDB's RE2
    * here — two different Unicode tables. A letter added in a newer
    * Unicode version could classify differently and silently diverge
    * the two vocabularies. Harmless for the controlled test corpora
    * (BMP letters long predating both tables); revisit if the corpus
    * generator ever emits exotic scripts.
    */
  /** Per-doc BPE token counts at merge depth `numMerges` — q103's
    * shape. Shared with q137 (truncate gate): there the Spark side
    * trains DEEPER (24) and truncates to this depth, while this SQL
    * replays training straight to `numMerges` — agreement proves the
    * truncated model equals the directly-trained one.
    */
  private def bpeEncodeSql(numMerges: Int): String =
    "WITH " + bpeCtes(numMerges) + s""",
        |enc AS (SELECT w,
        |  CAST(len(string_split(sym, ' ')) AS BIGINT) AS ntok
        |  FROM w$numMerges),
        |docw AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |      x -> x <> '')) AS w FROM documents)
        |  WHERE regexp_matches(w, '^\\p{L}+$$') AND length(w) <= 32)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(SUM(e.ntok) AS BIGINT) AS n_bpe_tokens
        |FROM docw d JOIN enc e USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private def bpeCtes(
      numMerges: Int, docsRel: String = "documents"): String = {
    val sb = new StringBuilder
    sb.append(
      s"""w0 AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
        |    regexp_replace(w, '(.)', '\\1 ', 'g') || '</w>' AS sym
        |  FROM (SELECT unnest(list_filter(string_split(text, ' '),
        |          x -> x <> '')) AS w FROM $docsRel)
        |  WHERE regexp_matches(w, '^\\p{L}+$$') AND length(w) <= 32
        |  GROUP BY w)""".stripMargin)
    for (k <- 0 until numMerges) {
      sb.append(",\n")
      sb.append(
        s"""p$k AS MATERIALIZED (
           |  SELECT ls[i] AS a, ls[i+1] AS b, CAST(SUM(cnt) AS BIGINT) AS pc
           |  FROM (SELECT cnt, ls, unnest(range(1, len(ls))) AS i
           |        FROM (SELECT cnt, string_split(sym, ' ') AS ls FROM w$k)
           |        WHERE len(ls) >= 2)
           |  GROUP BY 1, 2),
           |b$k AS MATERIALIZED (
           |  SELECT a, b, pc FROM p$k ORDER BY pc DESC, a, b LIMIT 1),
           |w${k + 1} AS MATERIALIZED (
           |  SELECT w, cnt, trim(regexp_replace(
           |    replace(' ' || replace(sym, ' ', '  ') || ' ',
           |      coalesce((SELECT ' ' || a || '  ' || b || ' ' FROM b$k),
           |        chr(1)),
           |      coalesce((SELECT ' ' || a || b || ' ' FROM b$k), '')),
           |    ' +', ' ', 'g')) AS sym
           |  FROM w$k)""".stripMargin)
    }
    sb.toString
  }

  /** Unrolled fixed-point PageRank (q105): all-integer arithmetic in
    * 10⁻¹⁵ units (`//` floor division — identical to Spark's `div` for
    * the non-negative values here), so every iteration is bit-exact.
    * MATERIALIZED keeps DuckDB from re-inlining the edge relation into
    * each of the `iters` contribution stages.
    */
  /** q117/q118 shared CTE chain: q91's `e` + `seeds`, then one
    * unrolled decimal-grid Lloyd's update per 16-dim subspace
    * (suffix `sN`) — the q91 oracle shape four times over dim ranges.
    */
  private val pqSeedsCte =
    """seeds AS (
      |  SELECT vec_id, rn - 1 AS cid FROM (
      |    SELECT vec_id, row_number()
      |      OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
      |    FROM embeddings)
      |  WHERE rn <= 8)""".stripMargin

  /** The four per-subspace unrolled Lloyd chains over a long-form
    * coordinate relation `src(vec_id, dim, xg, xs)` — shared by the
    * raw-vector PQ oracles (src = `e`) and the IVFADC residual oracle
    * (src = `er`).
    */
  private def pqSubChains(src: String): String =
    (0 until 4).map { s =>
      val lo = s * 16
      val hi = lo + 16
      s"""es$s AS (
         |  SELECT vec_id, dim, xg, xs FROM $src
         |  WHERE dim >= $lo AND dim < $hi),
         |c0s$s AS (
         |  SELECT se.cid, x.dim, x.xg AS cg
         |  FROM seeds se JOIN es$s x USING (vec_id)),
         |d1s$s AS (
         |  SELECT x.vec_id, c.cid, SUM((x.xg - c.cg) * (x.xg - c.cg)) AS dist
         |  FROM es$s x JOIN c0s$s c ON x.dim = c.dim
         |  GROUP BY x.vec_id, c.cid),
         |a1s$s AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number()
         |      OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d1s$s)
         |  WHERE rn = 1),
         |m1s$s AS (
         |  SELECT a.cid, x.dim,
         |    CAST(round(CAST(SUM(x.xs) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         |      AS DECIMAL(14,12)) AS cg
         |  FROM es$s x JOIN a1s$s a USING (vec_id)
         |  GROUP BY a.cid, x.dim),
         |c1s$s AS (
         |  SELECT c0.cid, c0.dim, COALESCE(m.cg, c0.cg) AS cg
         |  FROM c0s$s c0
         |  LEFT JOIN m1s$s m ON m.cid = c0.cid AND m.dim = c0.dim),
         |d2s$s AS (
         |  SELECT x.vec_id, c.cid, SUM((x.xg - c.cg) * (x.xg - c.cg)) AS dist
         |  FROM es$s x JOIN c1s$s c ON x.dim = c.dim
         |  GROUP BY x.vec_id, c.cid),
         |a2s$s AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number()
         |      OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d2s$s)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  private val pqCtes: String = {
    val head =
      """e AS (
        |  SELECT vec_id, i - 1 AS dim,
        |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(14,12)) AS xg,
        |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,12)) AS xs
        |  FROM (SELECT vec_id, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings))"""
        .stripMargin
    Seq(head, pqSeedsCte, pqSubChains("e")).mkString(",\n")
  }

  /** q114/q121 shared CTE chain: the fixture asset set and every
    * member-hash probe computed arithmetically through the two-level
    * dihedral coordinate maps, folded to the signed-min canonical
    * `ch(asset_id, chash)`.
    */
  private val canonicalHashCtes: String =
    """assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS id, 0 AS tv, 0 AS br
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, doc_id, 1, 0 FROM documents
        |  WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 4000000, doc_id, 5, 30 FROM documents
        |  WHERE doc_id % 13 = 0),
        |vd AS (
        |  SELECT asset_id, id, tv, br, 2 + id % 3 AS m, 2 + id % 2 AS n,
        |    9 * (2 + id % 3) AS w0, 8 * (2 + id % 2) AS h0,
        |    CASE WHEN tv % 2 = 1 THEN 8 * (2 + id % 2)
        |         ELSE 9 * (2 + id % 3) END AS wv,
        |    CASE WHEN tv % 2 = 1 THEN 9 * (2 + id % 3)
        |         ELSE 8 * (2 + id % 2) END AS hv
        |  FROM assets),
        |probe AS (
        |  SELECT asset_id, id, tv, br, m, n, w0, h0, wv, hv, t, r, i,
        |    (i * ((CASE WHEN t % 2 = 1 THEN hv ELSE wv END) - 1)) // 8
        |      AS x,
        |    (r * ((CASE WHEN t % 2 = 1 THEN wv ELSE hv END) - 1)) // 7
        |      AS y
        |  FROM vd, range(0, 8) tt(t), range(0, 8) rr(r),
        |    range(0, 9) ii(i)),
        |p1 AS (
        |  SELECT asset_id, id, tv, br, m, n, w0, h0, t, r, i,
        |    CASE t WHEN 0 THEN x WHEN 1 THEN y WHEN 2 THEN wv - 1 - x
        |           WHEN 3 THEN wv - 1 - y WHEN 4 THEN wv - 1 - x
        |           WHEN 5 THEN y WHEN 6 THEN x
        |           ELSE wv - 1 - y END AS x1,
        |    CASE t WHEN 0 THEN y WHEN 1 THEN hv - 1 - x
        |           WHEN 2 THEN hv - 1 - y WHEN 3 THEN x WHEN 4 THEN y
        |           WHEN 5 THEN x WHEN 6 THEN hv - 1 - y
        |           ELSE hv - 1 - x END AS y1
        |  FROM probe),
        |lum AS (
        |  SELECT asset_id, t, r, i,
        |    (id * 31
        |      + ((CASE tv WHEN 0 THEN x1 WHEN 1 THEN y1
        |            WHEN 2 THEN w0 - 1 - x1 WHEN 3 THEN w0 - 1 - y1
        |            WHEN 4 THEN w0 - 1 - x1 WHEN 5 THEN y1
        |            WHEN 6 THEN x1 ELSE w0 - 1 - y1 END) // m) * 17
        |      + ((CASE tv WHEN 0 THEN y1 WHEN 1 THEN h0 - 1 - x1
        |            WHEN 2 THEN h0 - 1 - y1 WHEN 3 THEN x1
        |            WHEN 4 THEN y1 WHEN 5 THEN x1
        |            WHEN 6 THEN h0 - 1 - y1 ELSE h0 - 1 - x1 END) // n)
        |        * 57) % 200 + br AS g
        |  FROM p1),
        |bits AS (
        |  SELECT p.asset_id, p.t,
        |    CAST(SUM(CASE WHEN q.g > p.g
        |      THEN CASE WHEN p.r * 8 + p.i = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << (p.r * 8 + p.i)) END
        |      ELSE 0 END) AS BIGINT) AS hsh
        |  FROM lum p JOIN lum q ON q.asset_id = p.asset_id
        |    AND q.t = p.t AND q.r = p.r AND q.i = p.i + 1
        |  WHERE p.i < 8
        |  GROUP BY p.asset_id, p.t),
        |ch AS (SELECT asset_id, min(hsh) AS chash FROM bits
        |       GROUP BY asset_id)""".stripMargin

  private def pageRankCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """ed AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS MATERIALIZED (
        |  SELECT ed.src, ed.dst, o.outdeg
        |  FROM ed JOIN (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
        |                FROM ed GROUP BY src) o USING (src)),
        |nodes AS MATERIALIZED (
        |  SELECT c_custkey * 2 AS node FROM customer
        |  UNION ALL
        |  SELECT s_suppkey * 2 + 1 AS node FROM supplier),
        |ncnt AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |pr0 AS MATERIALIZED (
        |  SELECT node,
        |    CAST(1000000000000000 // (SELECT n FROM ncnt) AS BIGINT) AS pr
        |  FROM nodes)""".stripMargin)
    for (k <- 0 until iters) {
      sb.append(",\n")
      sb.append(
        s"""c$k AS MATERIALIZED (
           |  SELECT e.dst AS node, CAST(SUM(p.pr // e.outdeg) AS BIGINT) AS s
           |  FROM e JOIN pr$k p ON e.src = p.node GROUP BY e.dst),
           |pr${k + 1} AS MATERIALIZED (
           |  SELECT n.node,
           |    CAST(((1000000000000000 // 100) * 15) // (SELECT n FROM ncnt)
           |      + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS pr
           |  FROM nodes n LEFT JOIN c$k c USING (node))""".stripMargin)
    }
    sb.toString
  }

  val all: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,

    "q04_pagination" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice
        |FROM orders
        |ORDER BY o_date DESC, o_orderkey LIMIT 20 OFFSET 40""".stripMargin,

    "q05_join_enrich" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_brand, s_name
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_size >= 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q06_left_join_count" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,

    "q07_anti_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    "q08_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q09_majority_direction" ->
      s"""WITH $voteFactsCte
         |SELECT vote_id, party, yes_cnt, no_cnt, majority_dir
         |FROM maj ORDER BY vote_id, party""".stripMargin,

    "q10_rebellion_stats" ->
      s"""WITH $voteFactsCte,
         |j AS (
         |  SELECT f.member_id, f.party, f.code, m.majority_dir
         |  FROM vf f JOIN maj m ON f.vote_id = m.vote_id AND f.party = m.party
         |  WHERE f.code IN ('A','N'))
         |SELECT member_id, party,
         |  CAST(sum(CASE WHEN code <> majority_dir THEN 1 ELSE 0 END) AS BIGINT) AS rebellion_cnt,
         |  count(*) AS total_votes,
         |  CAST(sum(CASE WHEN code <> majority_dir THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) * 100.0 AS rebellion_pct
         |FROM j GROUP BY member_id, party
         |ORDER BY member_id, party""".stripMargin,

    "q11_attendance_profile" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click_cnt,
        |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view_cnt,
        |  CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_cnt,
        |  CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup_cnt,
        |  CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error_cnt,
        |  count(*) AS total_cnt,
        |  CAST(sum(CASE WHEN event_type IN ('click','view','purchase') THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS active_rate
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q12_pairwise_agreement" ->
      s"""WITH $voteFactsCte
         |SELECT a.party AS group_a, b.party AS group_b,
         |  CAST(sum(CASE WHEN a.majority_dir = b.majority_dir THEN 1 ELSE 0 END) AS BIGINT) AS agree_cnt,
         |  count(*) AS common_cnt,
         |  CAST(sum(CASE WHEN a.majority_dir = b.majority_dir THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS agreement_rate
         |FROM maj a JOIN maj b ON a.vote_id = b.vote_id AND a.party < b.party
         |GROUP BY a.party, b.party
         |ORDER BY group_a, group_b""".stripMargin,

    "q13_window_dedup" ->
      """SELECT user_id, event_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, event_type
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q14_pivot_counts" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type='click' THEN 1 END) AS click_cnt,
        |  count(CASE WHEN event_type='view' THEN 1 END) AS view_cnt,
        |  count(CASE WHEN event_type='purchase' THEN 1 END) AS purchase_cnt,
        |  count(CASE WHEN event_type='signup' THEN 1 END) AS signup_cnt,
        |  count(CASE WHEN event_type='error' THEN 1 END) AS error_cnt
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q15_conditional_mean" ->
      """SELECT user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_all,
        |  CAST(sum(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(count(CASE WHEN event_type='purchase' THEN 1 END) AS DOUBLE) AS mean_purchase
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q16_union_distinct" ->
      """SELECT n_name FROM (
        |  SELECT DISTINCT nk FROM (
        |    SELECT c_nationkey AS nk FROM customer
        |    UNION ALL SELECT s_nationkey AS nk FROM supplier))
        |JOIN nation ON nk = n_nationkey
        |ORDER BY n_name""".stripMargin,

    "q17_having" ->
      """SELECT o_custkey, count(*) AS n FROM orders
        |GROUP BY o_custkey HAVING count(*) > 15 ORDER BY o_custkey""".stripMargin,

    "q18_minmax_dates" ->
      """SELECT o_orderpriority,
        |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
        |  strftime(max(o_orderdate), '%Y-%m-%d') AS last_date,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q19_string_funcs" ->
      """SELECT c_custkey,
        |  upper(trim(c_name)) AS uname,
        |  concat_ws('#', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS tag,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  CAST(length(c_name) AS BIGINT) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q20_date_trunc_agg" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    "q21_search_diacritics" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE strip_accents(lower(text)) LIKE '%spark%'
        |ORDER BY doc_id""".stripMargin,

    "q22_code_encoding" ->
      """SELECT l_suppkey,
        |  CAST(sum(CASE WHEN l_returnflag='A' THEN 1
        |                WHEN l_returnflag='R' THEN -1 ELSE 0 END) AS BIGINT) AS score
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q23_null_handling" ->
      """SELECT coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
        |  count(*) AS n
        |FROM orders GROUP BY status_norm ORDER BY status_norm""".stripMargin,

    "q39_intersect_except" ->
      """SELECT 'with_orders' AS tag, k FROM (
        |  SELECT c_custkey AS k FROM customer
        |  INTERSECT SELECT o_custkey AS k FROM orders)
        |UNION ALL
        |SELECT 'no_orders' AS tag, k FROM (
        |  SELECT c_custkey AS k FROM customer
        |  EXCEPT SELECT o_custkey AS k FROM orders)
        |ORDER BY tag, k""".stripMargin,

    "q40_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q41_prefix_match_join" ->
      """WITH brands AS (SELECT DISTINCT p_brand AS b FROM part),
        |pairs AS (
        |  SELECT p.p_partkey, p.p_brand, br.b
        |  FROM part p JOIN brands br
        |    ON starts_with(p.p_brand, br.b) AND br.b <> p.p_brand),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY p_partkey
        |            ORDER BY length(b) DESC, b) AS rn FROM pairs)
        |SELECT p_partkey, p_brand, b AS matched_brand
        |FROM ranked WHERE rn = 1 ORDER BY p_partkey""".stripMargin,

    "q42_regex_tokenize" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(
        |    regexp_replace(text, '([^a-zA-Z0-9 ])', ' \1 ', 'g'), '\s+'),
        |    w -> w <> '')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
        |    AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q44_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q33_ann_bruteforce" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |    list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(qv)+1),
        |        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))) AS c
        |  FROM embeddings, q)
        |SELECT vec_id, round(c, 6) AS cosine
        |FROM scored ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    "q47_sliding_window" ->
      """WITH expanded AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v,
        |    unnest(range(CAST(floor(epoch(ts)/900) AS BIGINT) - 3,
        |                 CAST(floor(epoch(ts)/900) AS BIGINT) + 1)) * 900 AS ws
        |  FROM events)
        |SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  count(*) AS n,
        |  CAST(sum(v) AS DOUBLE) AS sum_value
        |FROM expanded GROUP BY ws ORDER BY ws""".stripMargin,

    "q48_histogram" ->
      """SELECT CAST(floor(o_totalprice / 5000.0) AS BIGINT) * 5000 AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q49_salted_join" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, s_name
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q50_date_normalize" ->
      """WITH c AS (SELECT o_orderkey, strftime(o_orderdate, '%-d.%-m.%Y') AS czech_date
        |           FROM orders)
        |SELECT o_orderkey, czech_date,
        |  concat(
        |    regexp_extract(czech_date, '(\d{1,2})\.\s*(\d{1,2})\.\s*(\d{4})', 3), '-',
        |    lpad(regexp_extract(czech_date, '(\d{1,2})\.\s*(\d{1,2})\.\s*(\d{4})', 2), 2, '0'), '-',
        |    lpad(regexp_extract(czech_date, '(\d{1,2})\.\s*(\d{1,2})\.\s*(\d{4})', 1), 2, '0')) AS iso_date
        |FROM c ORDER BY o_orderkey""".stripMargin,

    "q51_array_contains" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE list_contains(string_split(p_name, ' '), 'small')
        |ORDER BY p_partkey""".stripMargin,

    "q52_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q54_string_agg" ->
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q55_asof_join" ->
      """SELECT c.user_id, c.event_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts_str
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
        |  ON c.user_id = s.user_id AND c.ts >= s.ts
        |ORDER BY c.user_id, c.event_id""".stripMargin,

    "q56_range_join" ->
      """WITH months AS (
        |  SELECT DISTINCT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS istart
        |  FROM orders),
        |ivs AS (SELECT istart, istart + 45*86400 AS iend FROM months),
        |pts AS (SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS pt FROM orders)
        |SELECT o_orderkey, pt, istart
        |FROM pts JOIN ivs ON pt >= istart AND pt < iend
        |ORDER BY o_orderkey, istart""".stripMargin,

    "q57_minhash_md5" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(ts) >= 3
        |      THEN list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
        |      ELSE [array_to_string(ts, ' ')] END)) AS sh
        |  FROM toks)
        |SELECT doc_id,
        |  min(substr(md5(sh), 1, 4)) AS sig0,
        |  min(substr(md5(sh), 5, 4)) AS sig1,
        |  min(substr(md5(sh), 9, 4)) AS sig2,
        |  min(substr(md5(sh), 13, 4)) AS sig3,
        |  min(substr(md5(sh), 17, 4)) AS sig4,
        |  min(substr(md5(sh), 21, 4)) AS sig5,
        |  min(substr(md5(sh), 25, 4)) AS sig6,
        |  min(substr(md5(sh), 29, 4)) AS sig7
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q58_tfidf" ->
      """WITH words AS (
        |  SELECT doc_id, word AS term
        |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |        FROM documents)
        |  WHERE word <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df_cnt FROM tf GROUP BY term),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    CAST(tf.tf AS DOUBLE) * ln(n.n / CAST(dfq.df_cnt AS DOUBLE)) AS tfidf
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |            ORDER BY tfidf DESC, term) AS rn FROM scored)
        |SELECT doc_id, term, tf, round(tfidf, 6) AS tfidf, rn
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "q59_stable_split" ->
      """SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS INTEGER) < 3
        |            THEN 'test' ELSE 'train' END AS split,
        |  count(*) AS n, min(doc_id) AS min_id
        |FROM documents GROUP BY split ORDER BY split""".stripMargin,

    "q46_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_k,
        |  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q24_explode_words" ->
      """SELECT doc_id, count(DISTINCT word) AS n_distinct, count(*) AS n_words
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> ''
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q25_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS dup_cnt
        |FROM documents GROUP BY fp ORDER BY fp""".stripMargin,

    "q26_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q27_quality_features" ->
      s"""SELECT d.doc_id,
         |  CAST(length(d.text) AS BIGINT) AS n_chars_m,
         |  w.n_tokens, w.n_stop,
         |  CAST(w.n_stop AS DOUBLE) / CAST(w.n_tokens AS DOUBLE) AS stop_ratio,
         |  CAST(w.len_sum AS DOUBLE) / CAST(w.n_tokens AS DOUBLE) AS mean_token_len
         |FROM documents d JOIN (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    CAST(count(CASE WHEN lower(word) IN $stop THEN 1 END) AS BIGINT) AS n_stop,
         |    CAST(sum(length(word)) AS BIGINT) AS len_sum
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE word <> '' GROUP BY doc_id) w USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "q28_langid" ->
      s"""WITH w2 AS (
         |  SELECT doc_id, lower(word) AS word
         |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents)
         |  WHERE word <> ''),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(count(CASE WHEN word IN ('der','die','das','und','ist','nicht') THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS s_de,
         |    CAST(count(CASE WHEN word IN $stop THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS s_en,
         |    CAST(count(CASE WHEN word IN ('el','la','de','que','y','los') THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS s_es,
         |    CAST(count(CASE WHEN word IN ('le','la','les','et','des','une') THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS s_fr
         |  FROM w2 GROUP BY doc_id)
         |SELECT doc_id,
         |  CASE WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
         |       WHEN s_es > greatest(s_de, s_en) THEN 'es'
         |       WHEN s_en > s_de THEN 'en'
         |       ELSE 'de' END AS pred_lang,
         |  s_en AS score_en
         |FROM sc ORDER BY doc_id""".stripMargin,

    // IVF ANN: centroids are the first 16 vectors by id, assignment is
    // argmax cosine (tie -> larger cell, mirroring greatest(struct)),
    // probe = top-4 cells by centroid-query cosine (tie -> smaller cell),
    // then exact top-10 within the probed cells
    "q45_ann_ivf" ->
      """WITH cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS c
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
        |assigned AS (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell DESC) AS rn
        |  FROM (
        |    SELECT e.vec_id, e.embedding, c.cell,
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(c.c) + 1),
        |           i -> CAST(c.c[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE))))) AS sim
        |    FROM embeddings e CROSS JOIN cents c)),
        |probes AS (
        |  SELECT cell FROM cents, q
        |  ORDER BY
        |    list_sum(list_transform(range(1, len(c) + 1),
        |      i -> CAST(c[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(c) + 1),
        |         i -> CAST(c[i] AS DOUBLE) * CAST(c[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(qv) + 1),
        |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))) DESC,
        |    cell ASC
        |  LIMIT 4),
        |scored AS (
        |  SELECT a.vec_id,
        |    list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |         i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
        |         i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))) AS c
        |  FROM assigned a, q
        |  WHERE a.rn = 1 AND a.cell IN (SELECT cell FROM probes))
        |SELECT vec_id, round(c, 6) AS cosine
        |FROM scored ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    "q71_retention_cohorts" ->
      """WITH cohorts AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN CAST(ts AS DATE) END) AS signup_day
        |  FROM events GROUP BY user_id),
        |act AS (
        |  SELECT e.user_id,
        |    strftime(date_trunc('week', c.signup_day), '%Y-%m-%d') AS cohort_week,
        |    CAST(floor(date_diff('day', c.signup_day, CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_n
        |  FROM events e JOIN cohorts c ON e.user_id = c.user_id
        |  WHERE c.signup_day IS NOT NULL AND CAST(e.ts AS DATE) >= c.signup_day)
        |SELECT cohort_week, week_n, count(DISTINCT user_id) AS n_users
        |FROM act GROUP BY cohort_week, week_n
        |ORDER BY cohort_week, week_n""".stripMargin,

    "q70_funnel" ->
      """WITH t0 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
        |  FROM events GROUP BY user_id),
        |t1 AS (
        |  SELECT e.user_id, any_value(t0.t_signup) AS t_signup,
        |    min(CASE WHEN e.event_type = 'click' AND e.ts > t0.t_signup
        |              AND e.ts <= t0.t_signup + INTERVAL 2 HOUR
        |             THEN e.ts END) AS t_click
        |  FROM events e JOIN t0 ON e.user_id = t0.user_id
        |  GROUP BY e.user_id),
        |t2 AS (
        |  SELECT e.user_id, any_value(t1.t_signup) AS t_signup,
        |    any_value(t1.t_click) AS t_click,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.ts > t1.t_click
        |              AND e.ts <= t1.t_click + INTERVAL 2 HOUR
        |             THEN e.ts END) AS t_purchase
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id
        |  GROUP BY e.user_id)
        |SELECT CASE WHEN t_purchase IS NOT NULL THEN 3
        |            WHEN t_click IS NOT NULL THEN 2
        |            WHEN t_signup IS NOT NULL THEN 1
        |            ELSE 0 END AS stage,
        |  count(*) AS n_users
        |FROM t2 GROUP BY stage ORDER BY stage""".stripMargin,

    "q68_decile_buckets" ->
      """SELECT decile, count(*) AS n,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM (SELECT o_totalprice,
        |        ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        |      FROM orders)
        |GROUP BY decile ORDER BY decile""".stripMargin,

    "q69_decimal_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  round((n * sxy - sx * sy) /
        |        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) AS corr_qty_price,
        |  CAST(n AS BIGINT) AS n
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q67_vocab_stats" ->
      """WITH tf AS (
        |  SELECT word AS tok, count(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word)
        |SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
        |  count(*) AS distinct_tokens,
        |  count(CASE WHEN n = 1 THEN 1 END) AS hapax_cnt,
        |  substr(max(lpad(CAST(n AS VARCHAR), 12, '0') || ':' || tok), 14) AS top_token,
        |  CAST(max(n) AS BIGINT) AS top_token_cnt
        |FROM tf""".stripMargin,

    "q66_stratified_sample" ->
      """SELECT lang, count(*) AS n_kept, min(doc_id) AS min_id
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 1))
        |           AS INTEGER)
        |      < CASE WHEN lang = 'en' THEN 4 ELSE 12 END
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q65_label_centroids" ->
      """SELECT label, i - 1 AS dim,
        |  round(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 9) AS centroid,
        |  count(*) AS n
        |FROM (SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS i
        |      FROM embeddings)
        |GROUP BY label, i ORDER BY label, dim""".stripMargin,

    "q64_knn_graph" ->
      """WITH norms AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS n
        |  FROM embeddings),
        |pairs AS (
        |  -- zero-norm guard matches the Spark side (Ann.knnGraph emits 0.0)
        |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr,
        |    CASE WHEN a.n > 0 AND b.n > 0 THEN
        |      list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (a.n * b.n)
        |    ELSE 0.0 END AS c
        |  FROM norms a JOIN norms b ON a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |            ORDER BY c DESC, nbr) AS rnk FROM pairs)
        |SELECT vec_id, nbr, round(c, 6) AS cosine, CAST(rnk AS INTEGER) AS rnk
        |FROM ranked WHERE rnk <= 5 ORDER BY vec_id, rnk""".stripMargin,

    "q30_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> ''),
        |bitsums AS (
        |  SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM tok, range(0, 60) t(i) GROUP BY doc_id, i),
        |sims AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bitsums GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
        |FROM documents d LEFT JOIN sims s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q62_simhash_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |tok AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM corpus)
        |  WHERE word <> ''),
        |bitsums AS (
        |  SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM tok, range(0, 60) t(i) GROUP BY doc_id, i),
        |sims0 AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bitsums GROUP BY doc_id),
        |sims AS (
        |  SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
        |  FROM corpus d LEFT JOIN sims0 s USING (doc_id))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q63_winnow_fingerprints" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
        |        FROM toks WHERE len(ts) >= 3)
        |  UNION ALL
        |  SELECT doc_id, 0 AS pos,
        |    CAST(('0x' || substr(md5(array_to_string(ts, ' ')), 1, 15)) AS BIGINT) AS h
        |  FROM toks WHERE len(ts) < 3),
        |winmin AS (
        |  SELECT doc_id, pos,
        |    max(pos) OVER (PARTITION BY doc_id) + 1 AS m,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win_min
        |  FROM sh)
        |SELECT doc_id,
        |  CAST(max(m) AS BIGINT) AS n_kgrams,
        |  count(DISTINCT win_min) AS n_fps,
        |  min(win_min) AS min_fp,
        |  max(win_min) AS max_fp
        |FROM winmin
        |WHERE pos + 4 <= m OR (m < 4 AND pos = 0)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // exact prefix-filtered Jaccard join (the LSH variant q31 is rows-only
    // — probabilistic recall near the threshold must not gate correctness)
    // incremental fuzzy dedup: the q60 exact-Jaccard machinery over
    // batch ∪ corpus, then the one-pass suppression rule — a batch doc
    // drops when it pairs (J >= 0.7) with any corpus doc, or as the
    // HIGHER id of a batch-batch pair (suppression-biased: a doc whose
    // lower-id near-twin was itself suppressed still drops)
    "q116_incremental_jaccard_dedup" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |corpus AS (SELECT doc_id, ts FROM tok WHERE doc_id % 2 = 0),
        |batch AS (
        |  SELECT doc_id, ts FROM tok WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000, ts[1:len(ts)-1] FROM tok
        |  WHERE (doc_id % 6 = 0 OR doc_id % 6 = 3) AND len(ts) >= 10),
        |u AS (SELECT * FROM batch UNION ALL SELECT * FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM u),
        |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) /
        |    CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
        |sup AS (
        |  SELECT id_b AS doc_id FROM pairs
        |  WHERE id_b IN (SELECT doc_id FROM batch)
        |  UNION
        |  SELECT id_a FROM pairs
        |  WHERE id_a IN (SELECT doc_id FROM batch)
        |    AND id_b IN (SELECT doc_id FROM corpus))
        |SELECT doc_id FROM batch
        |WHERE doc_id NOT IN (SELECT doc_id FROM sup)
        |ORDER BY doc_id""".stripMargin,

    "q60_jaccard_prefix_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM toks),
        |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
        |FROM shared
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7
        |ORDER BY id_a, id_b""".stripMargin,

    // transitive closure of the exact Jaccard pairs: recursive min-label
    // reachability == the Spark side's label-propagation fixpoint
    "q72_dedup_clusters" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM toks),
        |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
        |SELECT component AS cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  max(id) AS max_id
        |FROM comp GROUP BY component ORDER BY cluster_id""".stripMargin,

    "q75_leakage_safe_split" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM toks),
        |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
        |SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(
        |         coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 1)) AS INTEGER) < 3
        |       THEN 'test' ELSE 'train' END AS split,
        |  count(*) AS n, min(d.doc_id) AS min_id
        |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        |GROUP BY split ORDER BY split""".stripMargin,

    "q76_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS "offset"
        |  FROM t)
        |SELECT doc_id, n_tokens, "offset",
        |  "offset" // 512 AS first_block,
        |  CASE WHEN n_tokens > 0
        |    THEN ("offset" + n_tokens - 1) // 512 - "offset" // 512 + 1
        |    ELSE 0 END AS n_blocks
        |FROM o ORDER BY doc_id""".stripMargin,

    "q77_repetition_filters" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |base AS (
        |  SELECT doc_id,
        |    CAST(len(ts) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(ts)) AS BIGINT) AS n_distinct
        |  FROM toks),
        |bi AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 2
        |      THEN unnest(list_transform(range(1, len(ts)),
        |             i -> ts[i] || ' ' || ts[i+1]))
        |      ELSE array_to_string(ts, ' ') END AS sh
        |  FROM toks),
        |cnts AS (SELECT doc_id, sh, count(*) AS cnt FROM bi GROUP BY 1, 2),
        |top AS (
        |  SELECT doc_id,
        |    max(lpad(CAST(cnt AS VARCHAR), 12, '0') || ':' || sh) AS comp
        |  FROM cnts GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens, b.n_distinct,
        |  round(CASE WHEN b.n_tokens > 0
        |    THEN 1.0 - CAST(b.n_distinct AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
        |    ELSE 0.0 END, 6) AS dup_token_frac,
        |  coalesce(CAST(substr(t.comp, 1, 12) AS BIGINT), 0) AS top_bigram_cnt,
        |  substr(t.comp, 14) AS top_bigram
        |FROM base b LEFT JOIN top t USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,

    "q78_contamination" ->
      """WITH bench0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
        |corpus0 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 50
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM bench0 WHERE doc_id < 5),
        |csh AS (
        |  SELECT DISTINCT doc_id AS corpus_id, sh FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(ts) >= 3
        |        THEN unnest(list_transform(range(1, len(ts) - 1),
        |               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |        ELSE array_to_string(ts, ' ') END AS sh
        |    FROM (SELECT doc_id,
        |            list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |          FROM corpus0))),
        |bsh AS (
        |  SELECT DISTINCT doc_id AS bench_id, sh FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(ts) >= 3
        |        THEN unnest(list_transform(range(1, len(ts) - 1),
        |               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |        ELSE array_to_string(ts, ' ') END AS sh
        |    FROM (SELECT doc_id,
        |            list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |          FROM bench0)))
        |SELECT c.corpus_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared
        |FROM csh c JOIN bsh b USING (sh)
        |GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY corpus_id, bench_id""".stripMargin,

    "q79_source_mixing" ->
      """WITH tgt(lang, t) AS (
        |  VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.2), ('es', 0.1)),
        |cnt AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM documents
        |  GROUP BY lang),
        |n AS (SELECT min(c / t) AS total FROM cnt JOIN tgt USING (lang)),
        |thr AS (
        |  SELECT lang, CAST(floor(t * total / c * 256) AS INTEGER) AS th
        |  FROM cnt JOIN tgt USING (lang), n)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
        |  min(d.doc_id) AS min_id
        |FROM documents d JOIN thr USING (lang)
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)) AS INTEGER)
        |      < th
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // q140: temperature mixing at alpha=0.5 — the canceled threshold
    // floor(256*sqrt(min_c/c)) is sqrt of an identical double
    // quotient, correctly rounded in both engines (the operator's
    // documented gate point; generic pow would not be ulp-identical)
    "q140_temperature_mix" ->
      """WITH cnt AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM documents
        |  GROUP BY lang),
        |m AS (SELECT min(c) AS mc FROM cnt),
        |thr AS (
        |  SELECT lang, CAST(floor(256 * sqrt(mc / c)) AS INTEGER) AS th
        |  FROM cnt, m)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
        |  min(d.doc_id) AS min_id
        |FROM documents d JOIN thr USING (lang)
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)) AS INTEGER)
        |      < th
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // q141: URL synthesis replayed, then host extraction (scheme/port
    // strip + lowercase) and the last-two-label registrable-domain
    // rule, each with DuckDB's own regex calls
    "q141_domain_stats" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END)
        |    || (CASE WHEN doc_id % 3 = 0 THEN 'www.'
        |             WHEN doc_id % 3 = 1 THEN 'cdn.img.' ELSE '' END)
        |    || 'Example' || CAST(doc_id % 7 AS VARCHAR)
        |    || '.com/p/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS host
        |  FROM u),
        |r AS (
        |  SELECT doc_id, host,
        |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM h)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
        |  min(doc_id) AS min_id
        |FROM r GROUP BY domain ORDER BY domain""".stripMargin,

    // q142: FIM replayed — synthetic sequence input, one md5 per doc,
    // hex-slice selection + two modulo cut draws, list slicing in PSM
    // order (DuckDB range() is end-exclusive where Spark sequence() is
    // inclusive → +2; list[a:b] is 1-based end-inclusive = Spark slice)
    "q142_fim_transform" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    range(doc_id % 50, doc_id % 50 + doc_id % 37 + 2) AS ids,
        |    md5('0:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, ids,
        |    CAST(('0x' || substr(h, 1, 2)) AS INTEGER) < 128 AS fim,
        |    CAST(('0x' || substr(h, 3, 12)) AS BIGINT)
        |      % (len(ids) + 1) AS i0,
        |    len(ids) AS n,
        |    CAST(('0x' || substr(h, 15, 12)) AS BIGINT) AS d2
        |  FROM t),
        |cc AS (
        |  SELECT doc_id, ids, fim, n, i0 AS i,
        |    i0 + d2 % (n - i0 + 1) AS j
        |  FROM c)
        |SELECT doc_id, fim,
        |  array_to_string(CASE WHEN fim THEN
        |    [CAST(-1 AS BIGINT)] || ids[1:i]
        |    || [CAST(-2 AS BIGINT)] || ids[j+1:n]
        |    || [CAST(-3 AS BIGINT)] || ids[i+1:j]
        |  ELSE ids END, ',') AS ids
        |FROM cc ORDER BY doc_id""".stripMargin,

    "q73_pii_mask" ->
      """WITH withpii AS (
        |  SELECT doc_id,
        |    text || ' kontakt: user' || doc_id ||
        |    '@example.com tel 777123456 web http://example.com/doc/' || doc_id
        |    AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |  CAST(len(regexp_extract_all(text, '[0-9]{9,}')) AS BIGINT) AS n_nums,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '[0-9]{9,}', '<NUM>', 'g')) AS masked_md5
        |FROM withpii ORDER BY doc_id""".stripMargin,

    "q74_incremental_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM corpus),
        |bfp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM batch),
        |cfp AS (
        |  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM corpus),
        |novel AS (
        |  SELECT b.* FROM bfp b LEFT JOIN cfp c USING (fp) WHERE c.fp IS NULL),
        |ranked AS (
        |  SELECT doc_id, fp,
        |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM novel)
        |SELECT doc_id, fp FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // exact grid-blocked cosine join (LSH variant q32 is rows-only)
    "q61_cosine_grid_pairs" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS va, b.embedding AS vb
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT id_a, id_b,
        |    list_sum(list_transform(range(1, len(va) + 1),
        |      i -> CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE))) AS dot,
        |    sqrt(list_sum(list_transform(range(1, len(va) + 1),
        |      i -> CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)))) AS na,
        |    sqrt(list_sum(list_transform(range(1, len(vb) + 1),
        |      i -> CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)))) AS nb
        |  FROM pairs)
        |SELECT id_a, id_b,
        |  round(CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS cosine
        |FROM scored
        |WHERE CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb) ELSE 0.0 END >= 0.99
        |ORDER BY id_a, id_b""".stripMargin,

    "q35_cosine_pairs_longform" ->
      """WITH lf AS (
        |  SELECT user_id, date_trunc('day', ts) AS day, CAST(count(*) AS DOUBLE) AS cnt
        |  FROM events GROUP BY user_id, day),
        |norms AS (
        |  SELECT user_id,
        |    CASE WHEN sqrt(sum(cnt*cnt)) > 0 THEN sqrt(sum(cnt*cnt)) ELSE 1.0 END AS norm
        |  FROM lf GROUP BY user_id),
        |dots AS (
        |  SELECT a.user_id AS user_a, b.user_id AS user_b, sum(a.cnt * b.cnt) AS dot
        |  FROM lf a JOIN lf b ON a.day = b.day AND a.user_id < b.user_id
        |  GROUP BY 1, 2)
        |SELECT user_a, user_b, dot / (na.norm * nb.norm) AS cosine
        |FROM dots
        |JOIN norms na ON na.user_id = user_a
        |JOIN norms nb ON nb.user_id = user_b
        |ORDER BY cosine DESC, user_a, user_b LIMIT 20""".stripMargin,

    "q36_stream_tumbling" ->
      """SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600 * 1000000),
        |                '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    "q37_fuzzy_join" ->
      """WITH pairs AS (
        |  SELECT s_suppkey, c_custkey,
        |    1.0 - CAST(levenshtein(s_name, c_name) AS DOUBLE)
        |        / CAST(greatest(length(s_name), length(c_name)) AS DOUBLE) AS ratio
        |  FROM supplier JOIN customer ON right(s_name, 3) = right(c_name, 3)),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY s_suppkey
        |            ORDER BY ratio DESC, c_custkey) AS rn FROM pairs)
        |SELECT s_suppkey, c_custkey AS best_custkey, ratio
        |FROM ranked WHERE rn = 1 ORDER BY s_suppkey""".stripMargin,

    "q38_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  'text/plain' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q80_boilerplate_lines" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'Copyright Example Corp' || chr(10) ||
        |    'All rights reserved' AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM src),
        |lines AS (
        |  SELECT doc_id,
        |    unnest(range(1, len(arr) + 1)) AS line_no,
        |    unnest(arr) AS line
        |  FROM ls),
        |tl AS (SELECT doc_id, line_no, line, trim(line) AS trimmed FROM lines),
        |bp AS (SELECT trimmed FROM tl WHERE trimmed <> ''
        |       GROUP BY trimmed HAVING count(DISTINCT doc_id) >= 100),
        |kept AS (SELECT * FROM tl
        |         WHERE trimmed NOT IN (SELECT trimmed FROM bp)),
        |tot AS (SELECT doc_id, count(*) AS n FROM tl GROUP BY doc_id),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |          string_agg(line, chr(10) ORDER BY line_no) AS cleaned
        |        FROM kept GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(t.n - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(a.cleaned, '') AS cleaned_text
        |FROM tot t LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q81_ngram_heavy_hitters" ->
      """WITH ts AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    CASE WHEN len(ts) >= 3
        |      THEN unnest(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE array_to_string(ts, ' ') END AS sh
        |  FROM ts),
        |c AS (SELECT source, sh, CAST(count(*) AS BIGINT) AS cnt
        |      FROM sh GROUP BY 1, 2),
        |r AS (SELECT source, sh AS ngram, cnt,
        |        CAST(row_number() OVER (
        |          PARTITION BY source ORDER BY cnt DESC, sh ASC) AS INTEGER)
        |          AS rk
        |      FROM c)
        |SELECT source, ngram, cnt, rk FROM r WHERE rk <= 10
        |ORDER BY source, rk""".stripMargin,

    "q82_doc_chunking" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |n AS (SELECT doc_id, ts, len(ts) AS n FROM t),
        |c AS (SELECT doc_id, ts,
        |        greatest(1, CAST(ceil((n - 16) / 48.0) AS INTEGER))
        |          AS n_chunks
        |      FROM n),
        |e AS (SELECT doc_id, ts,
        |        unnest(range(0, n_chunks)) AS chunk_id
        |      FROM c),
        |s AS (SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
        |        list_slice(ts, chunk_id * 48 + 1, chunk_id * 48 + 64) AS ck
        |      FROM e)
        |SELECT doc_id, chunk_id, CAST(len(ck) AS BIGINT) AS n_tokens,
        |  array_to_string(ck, ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    "q83_embedding_quantize" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x))) AS maxabs
        |  FROM embeddings),
        |s AS (SELECT vec_id, embedding, maxabs,
        |        CAST(maxabs AS DOUBLE) / 127.0 AS scale FROM m)
        |SELECT vec_id, scale,
        |  array_to_string(
        |    CASE WHEN maxabs > 0
        |      THEN list_transform(embedding,
        |             x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INTEGER))
        |      ELSE list_transform(embedding, x -> 0) END, ' ') AS q
        |FROM s ORDER BY vec_id""".stripMargin,

    "q84_dedup_report" ->
      """WITH fp AS (
        |  SELECT doc_id, source,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |keep AS (SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY fp)
        |SELECT f.source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN f.doc_id = k.keep_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(count(*) - sum(CASE WHEN f.doc_id = k.keep_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dupes
        |FROM fp f JOIN keep k USING (fp)
        |GROUP BY f.source ORDER BY f.source""".stripMargin,

    // the Spark side does a REAL PNG encode->ImageIO decode; the oracle
    // predicts the outputs in closed form (solid fill, lossless codec)
    "q85_image_decode" ->
      """SELECT doc_id AS asset_id,
        |  8 + doc_id % 8 AS width,
        |  8 + (doc_id * 3) % 8 AS height,
        |  (doc_id * 37) % 256 AS mean_r,
        |  (doc_id * 59) % 256 AS mean_g,
        |  (doc_id * 83) % 256 AS mean_b
        |FROM documents ORDER BY asset_id""".stripMargin,

    // REAL WAV decode on the Spark side; square-wave RMS = amp/32768
    // (power-of-two divisor, bit-exact double) and duration is the same
    // IEEE expression on both engines
    "q86_wav_decode" ->
      """SELECT doc_id AS asset_id,
        |  CAST(8000 AS DOUBLE) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(800 + doc_id % 100 AS BIGINT) AS n_frames,
        |  CAST(800 + doc_id % 100 AS DOUBLE) * CAST(1000 AS DOUBLE)
        |    / CAST(8000 AS DOUBLE) AS duration_ms,
        |  CAST(1000 + doc_id % 2000 AS DOUBLE) / CAST(32768 AS DOUBLE) AS rms
        |FROM documents ORDER BY asset_id""".stripMargin,

    // replicates the planted URL variants and the canonicalization steps
    // of UrlNorm.canonicalUrl in DuckDB's RE2 dialect ('g' flag: DuckDB
    // replaces only the first match by default, Java replaces all). The
    // percent-encoding normalization (PctNormalize) is replayed
    // closed-form: the planted corpus contains exactly the triplets
    // %7E/%7e (unreserved ~ -> decode) and %2f (reserved / -> keep,
    // uppercase hex), so three plain replaces reproduce it.
    "q87_url_dedup" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'Example.COM' ELSE 'example.com' END ||
        |    CASE WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END ||
        |    '/a/' || CAST(doc_id % 100 AS VARCHAR) ||
        |    CASE WHEN doc_id % 4 = 0 THEN '/p~q%2F'
        |         WHEN doc_id % 4 = 1 THEN '/p%7Eq%2f'
        |         WHEN doc_id % 4 = 2 THEN '/p%7eq%2F'
        |         ELSE '/p~q%2f' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN '/?utm_source=news&utm_medium=web'
        |         WHEN doc_id % 4 = 2 THEN '?utm_campaign=z&utm_abc123'
        |         WHEN doc_id % 4 = 3 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |n1 AS (SELECT doc_id,
        |  replace(replace(replace(
        |    regexp_replace(url, '#.*$', '', 'g'),
        |    '%7E', '~'), '%7e', '~'), '%2f', '%2F') AS u FROM p),
        |parts0 AS (SELECT doc_id, u,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth0
        |  FROM n1),
        |parts AS (SELECT doc_id,
        |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_extract(auth0, '^(.*@)', 1)
        |      || lower(regexp_replace(auth0, '^.*@', '')) AS host0,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS after
        |  FROM parts0),
        |parts2 AS (SELECT doc_id, scheme,
        |    CASE WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
        |         WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
        |         ELSE host0 END AS host,
        |    regexp_extract(after, '^([^?]*)', 1) AS path0,
        |    regexp_extract(after, '\?(.*)$', 1) AS qs0
        |  FROM parts),
        |parts3 AS (SELECT doc_id, scheme, host,
        |    CASE WHEN path0 = '' THEN '/'
        |         ELSE regexp_replace(path0, '(.)/$', '\1') END AS path,
        |    regexp_replace(regexp_replace(regexp_replace(
        |      replace(qs0, '&', '&&'),
        |      '(^|&)utm_[A-Za-z0-9_]+(=[^&]*)?(&|$)', '\1\3', 'g'),
        |      '&&+', '&', 'g'), '^&+|&+$', '', 'g') AS qs
        |  FROM parts2),
        |c AS (SELECT doc_id,
        |    scheme || '://' || host || path ||
        |    CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS url
        |  FROM parts3)
        |SELECT url, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_id
        |FROM c GROUP BY url ORDER BY url""".stripMargin,

    // chr(769) = the combining acute; both engines implement Unicode NFC
    // so lengths (code points) and md5 over utf8 bytes agree exactly
    "q88_nfc_normalize" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' Pr' || 'e' || chr(769) || 'sek ' ||
        |      CAST(doc_id % 5 AS VARCHAR) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(t) AS INTEGER) AS len_raw,
        |  CAST(length(nfc_normalize(t)) AS INTEGER) AS len_nfc,
        |  md5(nfc_normalize(t)) AS nfc_md5
        |FROM p ORDER BY doc_id""".stripMargin,

    // bilinear resize of a SOLID image is the same solid at any size:
    // fixed 5x3 output, channel means = the planted fill color
    "q89_image_resize" ->
      """SELECT doc_id AS asset_id,
        |  CAST(5 AS BIGINT) AS width,
        |  CAST(3 AS BIGINT) AS height,
        |  (doc_id * 37) % 256 AS mean_r,
        |  (doc_id * 59) % 256 AS mean_g,
        |  (doc_id * 83) % 256 AS mean_b
        |FROM documents ORDER BY asset_id""".stripMargin,

    // Bloom prefilter never changes the answer (no false negatives), so
    // the oracle is the plain exact anti-join over the same split.
    "q90_bloom_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text FROM corpus),
        |bfp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM batch),
        |cfp AS (
        |  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM corpus),
        |novel AS (
        |  SELECT b.* FROM bfp b LEFT JOIN cfp c USING (fp) WHERE c.fp IS NULL),
        |ranked AS (
        |  SELECT doc_id, fp,
        |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM novel)
        |SELECT doc_id, fp FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // Unrolled single Lloyd's update of the md5-seeded k-means. Distances
    // are exact DECIMAL arithmetic (order-free), centroid means the proven
    // round-9 q65 shape, so the assignment matches the Spark side
    // cell-exact.
    "q91_kmeans_assign" ->
      """WITH e AS (
        |  SELECT vec_id, i - 1 AS dim,
        |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(14,12)) AS xg,
        |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,12)) AS xs
        |  FROM (SELECT vec_id, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
        |seeds AS (
        |  SELECT vec_id, rn - 1 AS cid FROM (
        |    SELECT vec_id, row_number()
        |      OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |    FROM embeddings)
        |  WHERE rn <= 8),
        |c0 AS (
        |  SELECT s.cid, e.dim, e.xg AS cg FROM seeds s JOIN e USING (vec_id)),
        |d1 AS (
        |  SELECT e.vec_id, c.cid, SUM((e.xg - c.cg) * (e.xg - c.cg)) AS dist
        |  FROM e JOIN c0 c ON e.dim = c.dim GROUP BY e.vec_id, c.cid),
        |a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d1)
        |  WHERE rn = 1),
        |m1 AS (
        |  SELECT a1.cid, e.dim,
        |    CAST(round(CAST(SUM(e.xs) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
        |      AS DECIMAL(14,12)) AS cg
        |  FROM e JOIN a1 USING (vec_id) GROUP BY a1.cid, e.dim),
        |c1 AS (
        |  SELECT c0.cid, c0.dim, COALESCE(m1.cg, c0.cg) AS cg
        |  FROM c0 LEFT JOIN m1 ON m1.cid = c0.cid AND m1.dim = c0.dim),
        |d2 AS (
        |  SELECT e.vec_id, c.cid, SUM((e.xg - c.cg) * (e.xg - c.cg)) AS dist
        |  FROM e JOIN c1 c ON e.dim = c.dim GROUP BY e.vec_id, c.cid),
        |a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d2)
        |  WHERE rn = 1)
        |SELECT vec_id, CAST(cid AS BIGINT) AS cluster
        |FROM a2 ORDER BY vec_id""".stripMargin,

    // q117/q118: product quantization — q91's unrolled decimal-grid
    // k-means repeated once per 16-dim subspace (same md5 seed rows for
    // all four: the seeds depend only on the id), then codes = the four
    // per-subspace assignments. q118 adds ADC: exact DECIMAL distance
    // of the min-vec_id query to each ASSIGNED codeword, summed per
    // vector, ranked with the id tie-break.
    "q117_pq_encode" -> ("WITH " + pqCtes +
      """
        |SELECT a2s0.vec_id,
        |  CAST(a2s0.cid AS BIGINT) AS c0, CAST(a2s1.cid AS BIGINT) AS c1,
        |  CAST(a2s2.cid AS BIGINT) AS c2, CAST(a2s3.cid AS BIGINT) AS c3
        |FROM a2s0 JOIN a2s1 USING (vec_id) JOIN a2s2 USING (vec_id)
        |  JOIN a2s3 USING (vec_id)
        |ORDER BY vec_id""".stripMargin),

    "q118_pq_adc_topk" -> ("WITH " + pqCtes +
      """,
        |q AS (
        |  SELECT dim, xg FROM e
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |cents AS (
        |  SELECT 0 AS s, cid, dim, cg FROM c1s0
        |  UNION ALL SELECT 1, cid, dim, cg FROM c1s1
        |  UNION ALL SELECT 2, cid, dim, cg FROM c1s2
        |  UNION ALL SELECT 3, cid, dim, cg FROM c1s3),
        |codes AS (
        |  SELECT vec_id, 0 AS s, cid FROM a2s0
        |  UNION ALL SELECT vec_id, 1, cid FROM a2s1
        |  UNION ALL SELECT vec_id, 2, cid FROM a2s2
        |  UNION ALL SELECT vec_id, 3, cid FROM a2s3),
        |dist AS (
        |  SELECT co.vec_id, SUM((q.xg - ce.cg) * (q.xg - ce.cg)) AS dd
        |  FROM codes co
        |  JOIN cents ce ON ce.s = co.s AND ce.cid = co.cid
        |  JOIN q ON q.dim = ce.dim
        |  GROUP BY co.vec_id),
        |top AS (
        |  SELECT vec_id,
        |    row_number() OVER (ORDER BY dd, vec_id) AS rank
        |  FROM dist)
        |SELECT CAST(rank AS BIGINT) AS rank, vec_id FROM top
        |WHERE rank <= 20 ORDER BY rank""".stripMargin),

    // q119: q45's coarse-cell assignment + probe routing (double cosine,
    // proven parity), then the q118 decimal ADC rank restricted to the
    // probed cells
    "q119_ivf_pq_topk" -> ("WITH " + pqCtes +
      """,
        |cents16 AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
        |    embedding AS c
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        ORDER BY vec_id LIMIT 16)),
        |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
        |assigned AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, cell DESC) AS rn
        |  FROM (
        |    SELECT e.vec_id, c.cell,
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(c.c) + 1),
        |           i -> CAST(c.c[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE))))) AS sim
        |    FROM embeddings e CROSS JOIN cents16 c)),
        |probes AS (
        |  SELECT cell FROM cents16, qv
        |  ORDER BY
        |    list_sum(list_transform(range(1, len(c) + 1),
        |      i -> CAST(c[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(c) + 1),
        |         i -> CAST(c[i] AS DOUBLE) * CAST(c[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(qv) + 1),
        |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))) DESC,
        |    cell ASC
        |  LIMIT 4),
        |q AS (SELECT dim, xg FROM e WHERE vec_id = 1),
        |cents AS (
        |  SELECT 0 AS s, cid, dim, cg FROM c1s0
        |  UNION ALL SELECT 1, cid, dim, cg FROM c1s1
        |  UNION ALL SELECT 2, cid, dim, cg FROM c1s2
        |  UNION ALL SELECT 3, cid, dim, cg FROM c1s3),
        |codes AS (
        |  SELECT vec_id, 0 AS s, cid FROM a2s0
        |  UNION ALL SELECT vec_id, 1, cid FROM a2s1
        |  UNION ALL SELECT vec_id, 2, cid FROM a2s2
        |  UNION ALL SELECT vec_id, 3, cid FROM a2s3),
        |probed AS (
        |  SELECT vec_id FROM assigned
        |  WHERE rn = 1 AND cell IN (SELECT cell FROM probes)),
        |dist AS (
        |  SELECT co.vec_id, SUM((q.xg - ce.cg) * (q.xg - ce.cg)) AS dd
        |  FROM codes co
        |  JOIN probed p ON p.vec_id = co.vec_id
        |  JOIN cents ce ON ce.s = co.s AND ce.cid = co.cid
        |  JOIN q ON q.dim = ce.dim
        |  GROUP BY co.vec_id),
        |top AS (
        |  SELECT vec_id,
        |    row_number() OVER (ORDER BY dd, vec_id) AS rank
        |  FROM dist)
        |SELECT CAST(rank AS BIGINT) AS rank, vec_id FROM top
        |WHERE rank <= 10 ORDER BY rank""".stripMargin),

    // Gopher rule battery: every signal is exact-count arithmetic with
    // one double division (the q27 convention); the keep conjunction
    // replays the bounds verbatim (minWords=30 fixture override)
    "q122_gopher_rules" ->
      """WITH t0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0
        |      THEN '- one thing' || chr(10) || '- two things' ||
        |        chr(10) || '- three things'
        |      ELSE text ||
        |        CASE WHEN doc_id % 4 = 0
        |          THEN chr(10) || '- planted bullet line' ELSE '' END ||
        |        CASE WHEN doc_id % 5 = 0
        |          THEN chr(10) || 'to be continued...' ELSE '' END ||
        |        CASE WHEN doc_id % 7 = 0
        |          THEN chr(10) || '# # # # # # # #' ELSE '' END
        |    END AS text
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '')
        |      AS ws,
        |    list_filter(string_split(text, chr(10)), x -> x <> '') AS ls
        |  FROM t0),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
        |        / CAST(len(ws) AS DOUBLE) ELSE 0.0 END AS mean_word_len,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST((length(text) - length(replace(text, '#', '')))
        |        + (length(text) - length(replace(text, '…', '')))
        |        + (length(text) - length(replace(text, '...', ''))) // 3
        |        AS DOUBLE) / CAST(len(ws) AS DOUBLE)
        |      ELSE 0.0 END AS symbol_ratio,
        |    CASE WHEN len(ls) > 0 THEN
        |      CAST(len(list_filter(ls, l -> ltrim(l) LIKE '- %'
        |        OR ltrim(l) LIKE '•%' OR ltrim(l) LIKE '* %')) AS DOUBLE)
        |        / CAST(len(ls) AS DOUBLE) ELSE 0.0 END AS bullet_line_frac,
        |    CASE WHEN len(ls) > 0 THEN
        |      CAST(len(list_filter(ls, l -> rtrim(l) LIKE '%...'
        |        OR rtrim(l) LIKE '%…')) AS DOUBLE)
        |        / CAST(len(ls) AS DOUBLE) ELSE 0.0 END AS ellipsis_line_frac,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST(len(list_filter(ws, x -> regexp_matches(x, '\p{L}')))
        |        AS DOUBLE) / CAST(len(ws) AS DOUBLE)
        |      ELSE 0.0 END AS alpha_word_frac,
        |    CAST(
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'and') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'be') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'have') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'of') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'that') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'the') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'to') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'with') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_stop_kinds
        |  FROM w)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio,
        |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
        |  n_stop_kinds,
        |  (n_words >= 30 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9
        |    AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
        |    AND n_stop_kinds >= 1) AS keep
        |FROM sig ORDER BY doc_id""".stripMargin,

    // C4 line filters: rebuild the fixture page, then replay the line
    // and page rules with list arithmetic; clean_text is the retained
    // lines re-joined
    "q123_c4_line_filters" ->
      """WITH t0 AS (
        |  SELECT doc_id,
        |    'This is a proper opening sentence for the page.' ||
        |    chr(10) || text || chr(10) || 'Too short.' ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
        |      'This line talks about JavaScript frameworks today.'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
        |      'A line with a { brace character inside it.'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(10) ||
        |      'Lorem ipsum dolor sit amet consectetur.'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 2 = 0 THEN chr(10) ||
        |      'Here is a second proper sentence for the page.' ||
        |      chr(10) || 'And here is a third proper sentence for it.'
        |      ELSE '' END AS text
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, chr(10)), x -> x <> '') AS ls
        |  FROM t0),
        |k AS (
        |  SELECT doc_id, text, ls,
        |    list_filter(ls, l ->
        |      (rtrim(l) LIKE '%.' OR rtrim(l) LIKE '%!'
        |        OR rtrim(l) LIKE '%?' OR rtrim(l) LIKE '%"')
        |      AND len(list_filter(string_split(l, ' '), x -> x <> '')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM w)
        |SELECT doc_id,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  (len(kept) >= 3 AND NOT contains(text, '{')
        |    AND NOT contains(lower(text), 'lorem ipsum')) AS page_keep,
        |  array_to_string(kept, chr(10)) AS clean_text
        |FROM k ORDER BY doc_id""".stripMargin,

    // exact edit-distance pairs: brute-force Levenshtein over the
    // title relation — the Spark side's segment-pigeonhole candidates
    // must recall every one of these
    "q124_edit_distance_pairs" ->
      """WITH titles AS (
        |  SELECT doc_id, substr(text, 1, 40) AS title FROM documents
        |  WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, 1, 40) || 'xy'
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, substr(text, 1, 38) FROM documents
        |  WHERE doc_id % 15 = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS edits
        |FROM titles a JOIN titles b ON a.doc_id < b.doc_id
        |WHERE abs(length(a.title) - length(b.title)) <= 3
        |  AND levenshtein(a.title, b.title) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // edit-distance clusters: brute-force pair relation closed with
    // the q109 recursive-CTE pattern
    "q126_edit_distance_clusters" ->
      """WITH RECURSIVE titles AS (
        |  SELECT doc_id, substr(text, 1, 40) AS title FROM documents
        |  WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, 1, 40) || 'xy'
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, substr(text, 1, 38) FROM documents
        |  WHERE doc_id % 15 = 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM titles a JOIN titles b ON a.doc_id < b.doc_id
        |  WHERE abs(length(a.title) - length(b.title)) <= 3
        |    AND levenshtein(a.title, b.title) <= 3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
        |SELECT component AS cluster_id,
        |  CAST(count(*) AS BIGINT) AS n_titles, max(id) AS max_id
        |FROM comp GROUP BY component ORDER BY cluster_id""".stripMargin,

    // deterministic training-order shuffle: the Spark side assigns
    // positions via per-partition ranks + driver prefix sums; the
    // oracle is the one-window definition both must equal
    "q120_deterministic_shuffle" ->
      """SELECT doc_id,
        |  row_number() OVER (
        |    ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
        |    AS shuffle_pos
        |FROM documents ORDER BY shuffle_pos""".stripMargin,

    // q91's unrolled k-means over corpus ∪ clones, then the SemDeDup
    // prune: kill every row with a smaller-id same-cluster neighbor at
    // cosine >= 0.99 (the q61-proven cosine shape).
    "q92_semantic_dedup" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings),
        |e AS (
        |  SELECT vec_id, i - 1 AS dim,
        |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(14,12)) AS xg,
        |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,12)) AS xs
        |  FROM (SELECT vec_id, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS i FROM corpus)),
        |seeds AS (
        |  SELECT vec_id, rn - 1 AS cid FROM (
        |    SELECT vec_id, row_number()
        |      OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |    FROM corpus)
        |  WHERE rn <= 8),
        |c0 AS (
        |  SELECT s.cid, e.dim, e.xg AS cg FROM seeds s JOIN e USING (vec_id)),
        |d1 AS (
        |  SELECT e.vec_id, c.cid, SUM((e.xg - c.cg) * (e.xg - c.cg)) AS dist
        |  FROM e JOIN c0 c ON e.dim = c.dim GROUP BY e.vec_id, c.cid),
        |a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d1)
        |  WHERE rn = 1),
        |m1 AS (
        |  SELECT a1.cid, e.dim,
        |    CAST(round(CAST(SUM(e.xs) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
        |      AS DECIMAL(14,12)) AS cg
        |  FROM e JOIN a1 USING (vec_id) GROUP BY a1.cid, e.dim),
        |c1 AS (
        |  SELECT c0.cid, c0.dim, COALESCE(m1.cg, c0.cg) AS cg
        |  FROM c0 LEFT JOIN m1 ON m1.cid = c0.cid AND m1.dim = c0.dim),
        |d2 AS (
        |  SELECT e.vec_id, c.cid, SUM((e.xg - c.cg) * (e.xg - c.cg)) AS dist
        |  FROM e JOIN c1 c ON e.dim = c.dim GROUP BY e.vec_id, c.cid),
        |a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d2)
        |  WHERE rn = 1),
        |cand AS (
        |  SELECT b.vec_id AS id_b, ca.embedding AS va, cb.embedding AS vb
        |  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  JOIN corpus ca ON ca.vec_id = a.vec_id
        |  JOIN corpus cb ON cb.vec_id = b.vec_id),
        |scored AS (
        |  SELECT id_b,
        |    list_sum(list_transform(range(1, len(va) + 1),
        |      i -> CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE))) AS dot,
        |    sqrt(list_sum(list_transform(range(1, len(va) + 1),
        |      i -> CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)))) AS na,
        |    sqrt(list_sum(list_transform(range(1, len(vb) + 1),
        |      i -> CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)))) AS nb
        |  FROM cand),
        |killed AS (
        |  SELECT DISTINCT id_b FROM scored
        |  WHERE CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb) ELSE 0.0 END
        |    >= 0.99)
        |SELECT a2.vec_id, CAST(a2.cid AS BIGINT) AS cluster
        |FROM a2 LEFT JOIN killed ON a2.vec_id = killed.id_b
        |WHERE killed.id_b IS NULL ORDER BY vec_id""".stripMargin,

    "q93_source_quota" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

    // add-α bigram LM; per-bigram ln cast to DECIMAL(18,12) before the
    // per-doc sum (order-free), one double division, round 6.
    "q94_bigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
        |        FROM toks WHERE len(ts) >= 2)),
        |cu AS (SELECT w1, count(*) AS cu FROM big GROUP BY w1),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2),
        |v AS (SELECT count(DISTINCT w) AS v
        |      FROM (SELECT unnest(ts) AS w FROM toks)),
        |scored AS (
        |  SELECT b.doc_id,
        |    CAST(ln((cb.cb + CAST(0.4 AS DOUBLE))
        |      / (cu.cu + CAST(0.4 AS DOUBLE) * v.v)) AS DECIMAL(18,12)) AS lp
        |  FROM big b
        |  JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
        |  JOIN cu ON b.w1 = cu.w1
        |  CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(CAST(SUM(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS avg_logprob
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q139: CCNet-style perplexity filter — bigram stats train on the
    // reference slice (src0-4), ALL docs score under them with LEFT
    // joins carrying the smoothing mass for unseen n-grams, and the
    // gate drops the exact floor(0.25*n) lowest (avg_logprob, doc_id)
    // pairs. The oracle's cutoff is a rank window; the Spark side's is
    // the histogram-pruned distributed selection — same k-th pair.
    "q139_perplexity_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |ref AS (SELECT ts FROM toks
        |  WHERE source IN ('src0','src1','src2','src3','src4')),
        |rbig AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
        |        FROM ref WHERE len(ts) >= 2)),
        |cu AS (SELECT w1, count(*) AS cu FROM rbig GROUP BY w1),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM rbig GROUP BY w1, w2),
        |v AS (SELECT count(DISTINCT w) AS v
        |      FROM (SELECT unnest(ts) AS w FROM ref)),
        |big AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
        |        FROM toks WHERE len(ts) >= 2)),
        |lp AS (
        |  SELECT b.doc_id,
        |    CAST(ln((COALESCE(cb.cb, 0) + CAST(0.4 AS DOUBLE))
        |      / (COALESCE(cu.cu, 0) + CAST(0.4 AS DOUBLE) * v.v))
        |      AS DECIMAL(18,12)) AS lp
        |  FROM big b
        |  LEFT JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
        |  LEFT JOIN cu ON b.w1 = cu.w1
        |  CROSS JOIN v),
        |scored AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    round(CAST(SUM(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |      AS avg_logprob
        |  FROM lp GROUP BY doc_id),
        |kk AS (SELECT CAST(floor(0.25 * count(*)) AS BIGINT) AS k
        |       FROM scored),
        |cut AS (
        |  SELECT r.avg_logprob AS ca, r.doc_id AS ci
        |  FROM (SELECT *, row_number()
        |          OVER (ORDER BY avg_logprob, doc_id) AS rn
        |        FROM scored) r, kk
        |  WHERE r.rn = kk.k)
        |SELECT s.doc_id, s.n_bigrams, s.avg_logprob,
        |  (s.avg_logprob > cut.ca
        |    OR (s.avg_logprob = cut.ca AND s.doc_id > cut.ci)) AS keep
        |FROM scored s CROSS JOIN cut
        |ORDER BY s.doc_id""".stripMargin,

    // decoded-content identity of the synthetic solid PNGs is the
    // (w,h,r,g,b) tuple — fully determined by doc_id's residues.
    "q95_image_dedup" ->
      """WITH img AS (
        |  SELECT doc_id,
        |    8 + doc_id % 8 AS w, 8 + (doc_id * 3) % 8 AS h,
        |    (doc_id * 37) % 256 AS r, (doc_id * 59) % 256 AS g,
        |    (doc_id * 83) % 256 AS b
        |  FROM documents)
        |SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies,
        |  w AS width, h AS height
        |FROM img GROUP BY w, h, r, g, b ORDER BY keep_id""".stripMargin,

    // decoded-signal identity of the synthetic WAVs = (frames, amp).
    "q96_audio_dedup" ->
      """WITH au AS (
        |  SELECT doc_id, 800 + doc_id % 100 AS f, 1000 + doc_id % 2000 AS a
        |  FROM documents)
        |SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(f AS BIGINT) AS n_frames
        |FROM au GROUP BY f, a ORDER BY keep_id""".stripMargin,

    // inverted-index containment join over corpus ∪ 8-token prefixes;
    // the single int/int division makes the score float-risk-free.
    "q97_containment_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    array_to_string(list_slice(
        |      list_filter(string_split(text, ' '), w -> w <> ''), 1, 8), ' ')
        |  FROM documents
        |  WHERE len(list_filter(string_split(text, ' '), w -> w <> '')) >= 12),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM toks),
        |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
        |inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS c
        |  FROM inter JOIN sizes sa ON sa.doc_id = inter.id_a)
        |SELECT id_a, id_b, round(c, 6) AS containment
        |FROM scored WHERE c >= 0.8 ORDER BY id_a, id_b""".stripMargin,

    // identical RE2-safe strip chain (DuckDB regexp_replace needs the
    // explicit 'g' flag; Spark's is global by default). The planted
    // character references decode closed-form: each token is replaced by
    // its known decoding, '&amp;' LAST so '&amp;lt;' ends as the literal
    // '&lt;' (single-pass no-rescan semantics); '&zzz;' and the
    // surrogate '&#xD800;' are invalid and appear verbatim, so no
    // replace touches them.
    "q98_html_to_text" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><style>p { color: red }</style></head><body>'
        |    || '<!-- id --><h1>Doc &#39;' || CAST(doc_id AS VARCHAR)
        |    || '&#39; &amp; friends &#x10D;&#269;&eacute;&mdash;&hellip; '
        |    || '&zzz; &amp;lt; &#xD800;</h1><p class="b">' || text
        |    || '</p><script>var x = 1 < 2;</script></body></html>' AS html
        |  FROM documents),
        |stripped AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(html,
        |                '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |            '(?s)<!--.*?-->', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&#39;', ''''), '&#x10D;', chr(269)), '&#269;', chr(269)),
        |        '&eacute;', chr(233)), '&mdash;', chr(8212)),
        |        '&hellip;', chr(8230)), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, clean,
        |  CAST(len(list_filter(string_split(clean, ' '), w -> w <> ''))
        |    AS BIGINT) AS n_tokens
        |FROM stripped ORDER BY doc_id""".stripMargin,

    // closed-form replay of the synthetic-AVI pipeline: per doc
    // n = 3 + doc_id%4 frames, every 2nd kept; 25 fps => ts = idx*40ms;
    // solid DIB fills are exact integer means (syntheticAvi's formulas)
    "q99_video_frames" ->
      """WITH idx AS (SELECT unnest(range(0, 7)) AS f),
        |frames AS (
        |  SELECT d.doc_id, i.f FROM documents d, idx i
        |  WHERE i.f < 3 + d.doc_id % 4 AND i.f % 2 = 0)
        |SELECT doc_id AS asset_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(f AS DOUBLE) * 40.0 AS ts_ms,
        |  CAST(4 + doc_id % 4 AS BIGINT) AS width,
        |  CAST(3 + doc_id % 3 AS BIGINT) AS height,
        |  CAST((doc_id * 19 + f * 23) % 256 AS DOUBLE) AS mean_r,
        |  CAST((doc_id * 13 + f * 17) % 256 AS DOUBLE) AS mean_g,
        |  CAST((doc_id * 11 + f * 7) % 256 AS DOUBLE) AS mean_b
        |FROM frames ORDER BY asset_id, frame_idx""".stripMargin,

    // full replay of the repeated-span dedup: identical plants, 8-token
    // windows over the same single-space tokenization, keeper =
    // lexicographic-min (doc,pos) via the same two-level grouping,
    // fixed-length island merge (new span iff pos > lag+8), then the
    // token-level cut. Positions come from a range cross join bounded
    // by the DATA (max token count over the corpus — a hard-coded cap
    // would silently truncate any longer doc) — DuckDB has no WITH
    // ORDINALITY. Window strings group RAW (no hash); the
    // Spark side's xxhash64 keys are collision-free at this scale.
    "q100_repeated_spans" ->
      """WITH d0 AS (
        |  SELECT doc_id,
        |    text || CASE CAST(doc_id % 3 AS INTEGER)
        |      WHEN 0 THEN ' subscribe to our newsletter today for daily market updates and offers'
        |      WHEN 1 THEN ' all rights reserved contact support for assistance with billing'
        |      ELSE '' END AS text
        |  FROM documents),
        |tl AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM d0),
        |idx AS (SELECT unnest(range(0,
        |    (SELECT max(len(ts)) FROM tl))) AS i),
        |win AS (
        |  SELECT t.doc_id, i.i AS pos,
        |    array_to_string(list_slice(t.ts, i.i + 1, i.i + 8), ' ') AS w
        |  FROM tl t, idx i WHERE i.i + 8 <= len(t.ts)),
        |k1 AS (SELECT w, min(doc_id) AS kd, count(*) AS cnt
        |  FROM win GROUP BY w),
        |k2 AS (SELECT win.w, k1.kd, k1.cnt, min(win.pos) AS kp
        |  FROM win JOIN k1 ON win.w = k1.w AND win.doc_id = k1.kd
        |  GROUP BY win.w, k1.kd, k1.cnt),
        |marked AS (
        |  SELECT win.doc_id, win.pos FROM win JOIN k2 ON win.w = k2.w
        |  WHERE k2.cnt > 1 AND NOT (win.doc_id = k2.kd AND win.pos = k2.kp)),
        |lg AS (SELECT doc_id, pos,
        |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |  FROM marked),
        |isl AS (SELECT doc_id, pos,
        |    CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END AS nw
        |  FROM lg),
        |isl2 AS (SELECT doc_id, pos,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM isl),
        |spans AS (SELECT doc_id, g, min(pos) AS s, max(pos) + 8 AS e
        |  FROM isl2 GROUP BY doc_id, g),
        |stats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(e - s) AS BIGINT) AS removed_tokens
        |  FROM spans GROUP BY doc_id),
        |tok2 AS (SELECT t.doc_id, i.i AS pos, t.ts[i.i + 1] AS tok
        |  FROM tl t, idx i WHERE i.i < len(t.ts)),
        |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok2 t
        |  LEFT JOIN spans sp ON t.doc_id = sp.doc_id
        |    AND t.pos >= sp.s AND t.pos < sp.e
        |  WHERE sp.doc_id IS NULL),
        |clean AS (SELECT doc_id,
        |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT d0.doc_id AS doc_id,
        |  coalesce(st.n_spans, 0) AS n_spans,
        |  coalesce(st.removed_tokens, 0) AS removed_tokens,
        |  md5(coalesce(c.clean_text, '')) AS clean_md5
        |FROM d0
        |LEFT JOIN stats st ON d0.doc_id = st.doc_id
        |LEFT JOIN clean c ON d0.doc_id = c.doc_id
        |ORDER BY d0.doc_id""".stripMargin,

    // WARC round-trip is closed-form: framing is deterministic, so the
    // parsed-back record is exactly (id, 200, the planted content-type,
    // md5 + byte length of the original text)
    "q101_warc_roundtrip" ->
      """SELECT doc_id, 'response' AS warc_type,
        |  CAST(200 AS BIGINT) AS http_status,
        |  'text/plain; charset=utf-8' AS http_content_type,
        |  md5(text) AS body_md5,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q102_bpe_merges" -> ("WITH " + bpeCtes(12) + "\n" +
      (0 until 12).map { k =>
        s"SELECT CAST(${k + 1} AS BIGINT) AS merge_rank, a AS lhs, " +
          s"b AS rhs, a || b AS merged, pc AS pair_count FROM b$k"
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY merge_rank")),

    "q103_bpe_encode" -> bpeEncodeSql(12),

    // q137: the Spark side trains 24 merges and serves depth 12 via
    // Bpe.truncate — the oracle NEVER trains past 12 (the exact q103
    // replay), so a truncate that leaked rule 13+, dropped a rule, or
    // mis-replayed the vocabulary symbolization hash-mismatches here
    "q137_bpe_truncate" -> bpeEncodeSql(12),

    // q143: the q103 per-doc encode machinery grouped by language —
    // exact-long sums, one rounded double ratio (the q27 float rule)
    "q143_tokenizer_fertility" -> ("WITH " + bpeCtes(12) + """,
        |enc AS (SELECT w,
        |  CAST(len(string_split(sym, ' ')) AS BIGINT) AS ntok FROM w12),
        |docw AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |      x -> x <> '')) AS w FROM documents)
        |  WHERE regexp_matches(w, '^\p{L}+$') AND length(w) <= 32),
        |perdoc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(SUM(e.ntok) AS BIGINT) AS n_bpe
        |  FROM docw d JOIN enc e USING (w)
        |  GROUP BY doc_id)
        |SELECT l.lang, CAST(SUM(p.n_words) AS BIGINT) AS n_words,
        |  CAST(SUM(p.n_bpe) AS BIGINT) AS n_bpe_tokens,
        |  round(CAST(SUM(p.n_bpe) AS DOUBLE)
        |    / CAST(SUM(p.n_words) AS DOUBLE), 6) AS fertility
        |FROM perdoc p JOIN documents l USING (doc_id)
        |GROUP BY l.lang ORDER BY l.lang""".stripMargin),

    // q144: token/bigram streams replayed with list arithmetic; the
    // blocklists are inlined as list literals (word-boundary semantics:
    // hits count on whole tokens / adjacent pairs, never substrings)
    "q144_blocklist_filter" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), w -> w <> '') AS ts
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, ts,
        |    list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1]) AS bg
        |  FROM toks),
        |counted AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(ts,
        |      w -> list_contains(['slow', 'vector'], w))) AS BIGINT) AS n_term_hits,
        |    CAST(len(list_intersect(ts, ['slow', 'vector'])) AS BIGINT)
        |      AS n_distinct_terms,
        |    CAST(len(list_filter(bg,
        |      g -> list_contains(['hash join', 'big table'], g))) AS BIGINT)
        |      AS n_phrase_hits
        |  FROM big)
        |SELECT doc_id, n_term_hits, n_distinct_terms, n_phrase_hits,
        |  (n_term_hits = 0 AND n_phrase_hits = 0) AS keep
        |FROM counted ORDER BY doc_id""".stripMargin,

    // q145: BM25 replayed relationally — identical IEEE parenthesization
    // to the Spark side, per-term contributions quantized to
    // DECIMAL(20,12) before the sum so ranking is fold-order-free
    "q145_bm25_topk" ->
      """WITH words AS (
        |  SELECT doc_id, word AS term
        |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |        FROM documents)
        |  WHERE word <> ''),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM words GROUP BY doc_id, term),
        |qt AS (SELECT * FROM (VALUES
        |  ('q_hash', 'hash'), ('q_hash', 'join'),
        |  ('q_stream', 'window'), ('q_stream', 'agg'), ('q_stream', 'stream'),
        |  ('q_scan', 'slow'), ('q_scan', 'scan'), ('q_scan', 'filter'))
        |  AS t(query_id, term)),
        |tfq AS (SELECT q.query_id, tf.doc_id, tf.term, tf.tf
        |        FROM tf JOIN qt q USING (term)),
        |dfq AS (SELECT query_id, term, CAST(count(*) AS BIGINT) AS df_cnt
        |        FROM tfq GROUP BY query_id, term),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM words GROUP BY doc_id),
        |s AS (SELECT
        |  CAST((SELECT count(DISTINCT doc_id) FROM documents) AS DOUBLE) AS n,
        |  CAST((SELECT count(*) FROM words) AS DOUBLE)
        |    / CAST((SELECT count(DISTINCT doc_id) FROM documents) AS DOUBLE)
        |    AS avgdl),
        |contrib AS (
        |  SELECT t.query_id, t.doc_id,
        |    CAST((ln(1.0 + (s.n - CAST(d.df_cnt AS DOUBLE) + 0.5)
        |                  / (CAST(d.df_cnt AS DOUBLE) + 0.5))
        |        * (CAST(t.tf AS DOUBLE) * (1.2 + 1)))
        |      / (CAST(t.tf AS DOUBLE)
        |         + 1.2 * ((1.0 - 0.75)
        |                  + 0.75 * (CAST(l.dl AS DOUBLE) / s.avgdl)))
        |      AS DECIMAL(20,12)) AS c
        |  FROM tfq t JOIN dfq d USING (query_id, term)
        |  JOIN dl l USING (doc_id) CROSS JOIN s),
        |scored AS (
        |  SELECT query_id, doc_id, SUM(c) AS sc,
        |    CAST(count(*) AS BIGINT) AS n_terms
        |  FROM contrib GROUP BY query_id, doc_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY sc DESC, doc_id) AS rn FROM scored)
        |SELECT query_id, rn, doc_id, n_terms,
        |  round(CAST(sc AS DOUBLE), 6) AS score
        |FROM ranked WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,

    // q146: the q92 decimal k-means replay (seeds → assign → one Lloyd
    // update → final assign), then rank WITHIN each cluster by the d2
    // distance itself (exact decimal, ties on vec_id) and drop the
    // closest floor(0.25·n) rows as prototypes
    "q146_prototype_filter" ->
      """WITH e AS (
        |  SELECT vec_id, i - 1 AS dim,
        |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(14,12)) AS xg,
        |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,12)) AS xs
        |  FROM (SELECT vec_id, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
        |seeds AS (
        |  SELECT vec_id, rn - 1 AS cid FROM (
        |    SELECT vec_id, row_number()
        |      OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |    FROM embeddings)
        |  WHERE rn <= 8),
        |c0 AS (
        |  SELECT s.cid, e.dim, e.xg AS cg FROM seeds s JOIN e USING (vec_id)),
        |d1 AS (
        |  SELECT e.vec_id, c.cid, SUM((e.xg - c.cg) * (e.xg - c.cg)) AS dist
        |  FROM e JOIN c0 c ON e.dim = c.dim GROUP BY e.vec_id, c.cid),
        |a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d1)
        |  WHERE rn = 1),
        |m1 AS (
        |  SELECT a1.cid, e.dim,
        |    CAST(round(CAST(SUM(e.xs) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
        |      AS DECIMAL(14,12)) AS cg
        |  FROM e JOIN a1 USING (vec_id) GROUP BY a1.cid, e.dim),
        |c1 AS (
        |  SELECT c0.cid, c0.dim, COALESCE(m1.cg, c0.cg) AS cg
        |  FROM c0 LEFT JOIN m1 ON m1.cid = c0.cid AND m1.dim = c0.dim),
        |d2 AS (
        |  SELECT e.vec_id, c.cid, SUM((e.xg - c.cg) * (e.xg - c.cg)) AS dist
        |  FROM e JOIN c1 c ON e.dim = c.dim GROUP BY e.vec_id, c.cid),
        |a2 AS (
        |  SELECT vec_id, cid, dist FROM (
        |    SELECT vec_id, cid, dist, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d2)
        |  WHERE rn = 1),
        |ranked AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id)
        |      AS proto_rank,
        |    count(*) OVER (PARTITION BY cid) AS nc
        |  FROM a2)
        |SELECT vec_id, CAST(cid AS BIGINT) AS cluster,
        |  CAST(proto_rank AS BIGINT) AS proto_rank,
        |  (proto_rank > CAST(floor(0.25 * nc) AS BIGINT)) AS keep
        |FROM ranked ORDER BY vec_id""".stripMargin,

    // q147: the q139 bigram machinery replayed TWICE (target slice +
    // whole corpus), weight = rounded-avg difference, Gumbel noise from
    // the 48-bit md5 uniform (rounded to 6 before the add), top-100 by
    // (key desc, doc_id)
    "q147_dsir_selection" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |tref AS (SELECT ts FROM toks
        |  WHERE source IN ('src0','src1','src2','src3','src4')),
        |tbig AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
        |        FROM tref WHERE len(ts) >= 2)),
        |tcu AS (SELECT w1, count(*) AS cu FROM tbig GROUP BY w1),
        |tcb AS (SELECT w1, w2, count(*) AS cb FROM tbig GROUP BY w1, w2),
        |tv AS (SELECT count(DISTINCT w) AS v
        |       FROM (SELECT unnest(ts) AS w FROM tref)),
        |rbig AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
        |        FROM toks WHERE len(ts) >= 2)),
        |rcu AS (SELECT w1, count(*) AS cu FROM rbig GROUP BY w1),
        |rcb AS (SELECT w1, w2, count(*) AS cb FROM rbig GROUP BY w1, w2),
        |rv AS (SELECT count(DISTINCT w) AS v
        |       FROM (SELECT unnest(ts) AS w FROM toks)),
        |big AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
        |        FROM toks WHERE len(ts) >= 2)),
        |st AS (
        |  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    round(CAST(SUM(CAST(ln((COALESCE(c.cb, 0) + CAST(0.4 AS DOUBLE))
        |        / (COALESCE(u.cu, 0) + CAST(0.4 AS DOUBLE) * v.v))
        |      AS DECIMAL(18,12))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE), 6) AS a
        |  FROM big b
        |  LEFT JOIN tcb c ON b.w1 = c.w1 AND b.w2 = c.w2
        |  LEFT JOIN tcu u ON b.w1 = u.w1
        |  CROSS JOIN tv v GROUP BY b.doc_id),
        |sr AS (
        |  SELECT b.doc_id,
        |    round(CAST(SUM(CAST(ln((COALESCE(c.cb, 0) + CAST(0.4 AS DOUBLE))
        |        / (COALESCE(u.cu, 0) + CAST(0.4 AS DOUBLE) * v.v))
        |      AS DECIMAL(18,12))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE), 6) AS a
        |  FROM big b
        |  LEFT JOIN rcb c ON b.w1 = c.w1 AND b.w2 = c.w2
        |  LEFT JOIN rcu u ON b.w1 = u.w1
        |  CROSS JOIN rv v GROUP BY b.doc_id),
        |w AS (
        |  SELECT st.doc_id, st.n_bigrams, st.a - sr.a AS weight
        |  FROM st JOIN sr ON st.doc_id = sr.doc_id),
        |k AS (
        |  SELECT doc_id, n_bigrams, weight,
        |    weight + round(-ln(-ln(
        |      (CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |            AS BIGINT) AS DOUBLE) + 0.5) / 281474976710656.0)), 6)
        |      AS key
        |  FROM w),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY key DESC, doc_id) AS rn
        |  FROM k)
        |SELECT CAST(rn AS BIGINT) AS rank, doc_id, n_bigrams, weight,
        |  round(key, 6) AS gumbel_key
        |FROM ranked WHERE rn <= 100 ORDER BY rn""".stripMargin,

    // q148: MMR pick sequence replayed with 5 unrolled argmax CTEs —
    // every cosine is the same left-to-right double fold the Spark side
    // computes, so the greedy selection is value-exact
    "q148_mmr_rerank" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id, emb,
        |    CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb)
        |         ELSE 0.0 END AS qsim
        |  FROM (
        |    SELECT e.vec_id, e.embedding AS emb,
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |        AS dot,
        |      sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE)
        |             * CAST(e.embedding[i] AS DOUBLE)))) AS na,
        |      sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
        |        i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) AS nb
        |    FROM embeddings e CROSS JOIN q)),
        |cand AS (
        |  SELECT vec_id, emb, qsim FROM (
        |    SELECT *, row_number() OVER (ORDER BY qsim DESC, vec_id) AS rnk
        |    FROM scored)
        |  WHERE rnk <= 20),
        |pair AS (
        |  SELECT ia, ib,
        |    CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb)
        |         ELSE 0.0 END AS sim
        |  FROM (
        |    SELECT a.vec_id AS ia, b.vec_id AS ib,
        |      list_sum(list_transform(range(1, len(a.emb) + 1),
        |        i -> CAST(a.emb[i] AS DOUBLE) * CAST(b.emb[i] AS DOUBLE)))
        |        AS dot,
        |      sqrt(list_sum(list_transform(range(1, len(a.emb) + 1),
        |        i -> CAST(a.emb[i] AS DOUBLE) * CAST(a.emb[i] AS DOUBLE))))
        |        AS na,
        |      sqrt(list_sum(list_transform(range(1, len(b.emb) + 1),
        |        i -> CAST(b.emb[i] AS DOUBLE) * CAST(b.emb[i] AS DOUBLE))))
        |        AS nb
        |    FROM cand a JOIN cand b ON a.vec_id <> b.vec_id)),
        |s1 AS (
        |  SELECT vec_id, qsim, (0.7 * qsim) - ((1 - 0.7) * 0.0) AS mmr
        |  FROM cand ORDER BY mmr DESC, vec_id LIMIT 1),
        |m2 AS (
        |  SELECT c.vec_id, c.qsim,
        |    (0.7 * c.qsim) - ((1 - 0.7) * (
        |      SELECT max(p.sim) FROM pair p WHERE p.ia = c.vec_id
        |        AND p.ib IN (SELECT vec_id FROM s1))) AS mmr
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)),
        |s2 AS (SELECT * FROM m2 ORDER BY mmr DESC, vec_id LIMIT 1),
        |m3 AS (
        |  SELECT c.vec_id, c.qsim,
        |    (0.7 * c.qsim) - ((1 - 0.7) * (
        |      SELECT max(p.sim) FROM pair p WHERE p.ia = c.vec_id
        |        AND p.ib IN (SELECT vec_id FROM s1
        |                     UNION ALL SELECT vec_id FROM s2))) AS mmr
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1
        |                                     UNION ALL SELECT vec_id FROM s2)),
        |s3 AS (SELECT * FROM m3 ORDER BY mmr DESC, vec_id LIMIT 1),
        |m4 AS (
        |  SELECT c.vec_id, c.qsim,
        |    (0.7 * c.qsim) - ((1 - 0.7) * (
        |      SELECT max(p.sim) FROM pair p WHERE p.ia = c.vec_id
        |        AND p.ib IN (SELECT vec_id FROM s1
        |                     UNION ALL SELECT vec_id FROM s2
        |                     UNION ALL SELECT vec_id FROM s3))) AS mmr
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1
        |                                     UNION ALL SELECT vec_id FROM s2
        |                                     UNION ALL SELECT vec_id FROM s3)),
        |s4 AS (SELECT * FROM m4 ORDER BY mmr DESC, vec_id LIMIT 1),
        |m5 AS (
        |  SELECT c.vec_id, c.qsim,
        |    (0.7 * c.qsim) - ((1 - 0.7) * (
        |      SELECT max(p.sim) FROM pair p WHERE p.ia = c.vec_id
        |        AND p.ib IN (SELECT vec_id FROM s1
        |                     UNION ALL SELECT vec_id FROM s2
        |                     UNION ALL SELECT vec_id FROM s3
        |                     UNION ALL SELECT vec_id FROM s4))) AS mmr
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1
        |                                     UNION ALL SELECT vec_id FROM s2
        |                                     UNION ALL SELECT vec_id FROM s3
        |                                     UNION ALL SELECT vec_id FROM s4)),
        |s5 AS (SELECT * FROM m5 ORDER BY mmr DESC, vec_id LIMIT 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS rank, vec_id,
        |    round(qsim, 6) AS qsim, round(mmr, 6) AS mmr FROM s1
        |  UNION ALL SELECT CAST(2 AS BIGINT), vec_id,
        |    round(qsim, 6), round(mmr, 6) FROM s2
        |  UNION ALL SELECT CAST(3 AS BIGINT), vec_id,
        |    round(qsim, 6), round(mmr, 6) FROM s3
        |  UNION ALL SELECT CAST(4 AS BIGINT), vec_id,
        |    round(qsim, 6), round(mmr, 6) FROM s4
        |  UNION ALL SELECT CAST(5 AS BIGINT), vec_id,
        |    round(qsim, 6), round(mmr, 6) FROM s5)
        |ORDER BY rank""".stripMargin,

    // q149: q139's reference scoring + the SQL-standard ntile(3) rule
    // per language over (score desc, doc_id)
    "q149_perplexity_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |ref AS (SELECT ts FROM toks
        |  WHERE source IN ('src0','src1','src2','src3','src4')),
        |rbig AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
        |        FROM ref WHERE len(ts) >= 2)),
        |cu AS (SELECT w1, count(*) AS cu FROM rbig GROUP BY w1),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM rbig GROUP BY w1, w2),
        |v AS (SELECT count(DISTINCT w) AS v
        |      FROM (SELECT unnest(ts) AS w FROM ref)),
        |big AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
        |        FROM toks WHERE len(ts) >= 2)),
        |scored AS (
        |  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    round(CAST(SUM(CAST(ln((COALESCE(cb.cb, 0) + CAST(0.4 AS DOUBLE))
        |        / (COALESCE(cu.cu, 0) + CAST(0.4 AS DOUBLE) * v.v))
        |      AS DECIMAL(18,12))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE), 6) AS avg_logprob
        |  FROM big b
        |  LEFT JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
        |  LEFT JOIN cu ON b.w1 = cu.w1
        |  CROSS JOIN v GROUP BY b.doc_id)
        |SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_logprob,
        |  CAST(ntile(3) OVER (PARTITION BY d.lang
        |    ORDER BY s.avg_logprob DESC, s.doc_id) AS BIGINT) AS bucket
        |FROM scored s JOIN documents d USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,

    // q150: quote synthesis + 8-shingle streams + diagonal
    // gaps-and-islands, joined on shingle STRINGS (the Spark side joins
    // 64-bit hashes — collision-free here by construction)
    "q150_shared_span_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    array_to_string(list_filter(string_split(text, ' '),
        |      w -> w <> '')[11:40], ' ') AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(ts[i:i+7], ' ') AS sh
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS i
        |        FROM toks WHERE len(ts) >= 8)),
        |m AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib, a.pos AS pa, b.pos AS pb
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id),
        |isl AS (
        |  SELECT ia, ib, pa - pb AS diag, pa, pb,
        |    pa - row_number() OVER (PARTITION BY ia, ib, pa - pb
        |                            ORDER BY pa) AS grp
        |  FROM m),
        |spans AS (
        |  SELECT ia AS id_a, ib AS id_b,
        |    CAST(min(pa) AS BIGINT) AS start_a,
        |    CAST(min(pb) AS BIGINT) AS start_b,
        |    CAST(count(*) + 7 AS BIGINT) AS span_tokens
        |  FROM isl GROUP BY ia, ib, diag, grp)
        |SELECT id_a, id_b, start_a, start_b, span_tokens
        |FROM spans WHERE span_tokens >= 20
        |ORDER BY id_a, id_b, start_a, start_b""".stripMargin,

    // q151: stupid backoff replayed — four count relations over the
    // reference stream, the identical CASE chain and IEEE
    // parenthesization, decimal-summed per-position log-scores
    "q151_trigram_backoff" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |ref AS (SELECT ts FROM toks
        |  WHERE source IN ('src0','src1','src2','src3','src4')),
        |rtri AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
        |  FROM (SELECT ts, unnest(range(1, len(ts) - 1)) AS i
        |        FROM ref WHERE len(ts) >= 3)),
        |rbig AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
        |        FROM ref WHERE len(ts) >= 2)),
        |c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM rtri
        |       GROUP BY w1, w2, w3),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM rbig GROUP BY w1, w2),
        |cbk AS (SELECT w1 AS u, w2 AS v, count(*) AS cb FROM rbig
        |        GROUP BY w1, w2),
        |c1 AS (SELECT w, count(*) AS c1
        |       FROM (SELECT unnest(ts) AS w FROM ref) GROUP BY w),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(DISTINCT w) AS BIGINT) AS v
        |       FROM (SELECT unnest(ts) AS w FROM ref)),
        |tg AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
        |        FROM toks WHERE len(ts) >= 3)),
        |lp AS (
        |  SELECT t.doc_id,
        |    CAST(ln(CASE WHEN c3.c3 IS NOT NULL
        |      THEN CAST(c3.c3 AS DOUBLE) / CAST(c2.c2 AS DOUBLE)
        |      ELSE 0.4 * (CASE WHEN cbk.cb IS NOT NULL
        |        THEN CAST(cbk.cb AS DOUBLE) / CAST(cu.c1 AS DOUBLE)
        |        ELSE 0.4 * ((CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.4)
        |          / (CAST(nv.n AS DOUBLE) + 0.4 * CAST(nv.v AS DOUBLE)))
        |        END) END) AS DECIMAL(18,12)) AS lp
        |  FROM tg t
        |  LEFT JOIN c3 ON t.w1 = c3.w1 AND t.w2 = c3.w2 AND t.w3 = c3.w3
        |  LEFT JOIN c2 ON t.w1 = c2.w1 AND t.w2 = c2.w2
        |  LEFT JOIN cbk ON t.w2 = cbk.u AND t.w3 = cbk.v
        |  LEFT JOIN c1 cu ON t.w2 = cu.w
        |  LEFT JOIN c1 ON t.w3 = c1.w
        |  CROSS JOIN nv)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |  round(CAST(SUM(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS avg_logprob
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q158: the four proven shapes chained — q27 quality counts, q144
    // blocklist streams, q139 survivor-trained perplexity gate, q152
    // waterfill over what remains; stage order is the check
    "q158_curation_pipeline2" ->
      s"""WITH w AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    count(CASE WHEN lower(word) IN $stop THEN 1 END) AS n_stop
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents)
         |  WHERE word <> '' GROUP BY doc_id),
         |keep AS (
         |  SELECT d.doc_id, d.lang, d.source, d.text
         |  FROM documents d JOIN w USING (doc_id)
         |  WHERE w.n_tokens >= 30
         |    AND CAST(w.n_stop AS DOUBLE) / CAST(w.n_tokens AS DOUBLE)
         |        >= 0.04),
         |blk AS (
         |  SELECT k.doc_id, k.lang, k.source, k.text FROM keep k JOIN (
         |    SELECT doc_id,
         |      len(list_filter(bg, g -> list_contains(
         |        ['slow scan', 'big table'], g))) AS ph
         |    FROM (SELECT doc_id, ts,
         |            list_transform(range(1, len(ts)),
         |              i -> ts[i] || ' ' || ts[i + 1]) AS bg
         |          FROM (SELECT doc_id,
         |                  list_filter(string_split(lower(text), ' '),
         |                    x -> x <> '') AS ts
         |                FROM keep))) h USING (doc_id)
         |  WHERE h.ph = 0),
         |toksb AS (
         |  SELECT doc_id, source,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS ts
         |  FROM blk),
         |refb AS (SELECT ts FROM toksb
         |  WHERE source IN ('src0','src1','src2','src3','src4')),
         |rbig AS (
         |  SELECT ts[i] AS w1, ts[i + 1] AS w2
         |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
         |        FROM refb WHERE len(ts) >= 2)),
         |cu AS (SELECT w1, count(*) AS cu FROM rbig GROUP BY w1),
         |cb AS (SELECT w1, w2, count(*) AS cb FROM rbig GROUP BY w1, w2),
         |v AS (SELECT count(DISTINCT x) AS v
         |      FROM (SELECT unnest(ts) AS x FROM refb)),
         |big AS (
         |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
         |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
         |        FROM toksb WHERE len(ts) >= 2)),
         |scoredq AS (
         |  SELECT b.doc_id,
         |    round(CAST(SUM(CAST(ln((COALESCE(cb.cb, 0)
         |        + CAST(0.4 AS DOUBLE))
         |        / (COALESCE(cu.cu, 0) + CAST(0.4 AS DOUBLE) * v.v))
         |      AS DECIMAL(18,12))) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE), 6) AS avg_logprob
         |  FROM big b
         |  LEFT JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
         |  LEFT JOIN cu ON b.w1 = cu.w1
         |  CROSS JOIN v GROUP BY b.doc_id),
         |kk AS (SELECT CAST(floor(0.25 * count(*)) AS BIGINT) AS k
         |       FROM scoredq),
         |cut AS (
         |  SELECT r.avg_logprob AS ca, r.doc_id AS ci
         |  FROM (SELECT *, row_number()
         |          OVER (ORDER BY avg_logprob, doc_id) AS rn
         |        FROM scoredq) r, kk
         |  WHERE r.rn = kk.k),
         |surv AS (
         |  SELECT b.doc_id, b.lang FROM blk b
         |  JOIN scoredq s ON s.doc_id = b.doc_id CROSS JOIN cut
         |  WHERE s.avg_logprob > cut.ca
         |     OR (s.avg_logprob = cut.ca AND s.doc_id > cut.ci)),
         |counts AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS c
         |  FROM surv GROUP BY lang),
         |ord AS (
         |  SELECT lang, c,
         |    CAST(row_number() OVER (ORDER BY c, lang) AS BIGINT) AS i,
         |    CAST(count(*) OVER () AS BIGINT) AS l,
         |    CAST(sum(c) OVER (ORDER BY c, lang
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pre
         |  FROM counts),
         |cand AS (
         |  SELECT *, CAST(floor(CAST(200 - (pre - c) AS DOUBLE)
         |    / CAST(l - i + 1 AS DOUBLE)) AS BIGINT) AS t
         |  FROM ord),
         |piv AS (SELECT min(i) AS pi FROM cand WHERE c > t),
         |pv AS (SELECT c2.i AS pi, c2.t AS pt, c2.pre - c2.c AS prepiv,
         |         c2.l AS l
         |       FROM cand c2 JOIN piv ON c2.i = piv.pi),
         |alloc AS (
         |  SELECT o.lang,
         |    CASE WHEN p.pi IS NULL OR o.i < p.pi THEN o.c
         |      ELSE p.pt + (CASE WHEN o.i - p.pi <
         |          (200 - p.prepiv) - p.pt * (p.l - p.pi + 1)
         |        THEN 1 ELSE 0 END) END AS alloc
         |  FROM cand o LEFT JOIN pv p ON true),
         |rankedv AS (
         |  SELECT s.lang, s.doc_id,
         |    row_number() OVER (PARTITION BY s.lang
         |      ORDER BY md5(CAST(s.doc_id AS VARCHAR)), s.doc_id) AS r
         |  FROM surv s),
         |keptv AS (
         |  SELECT r.lang, r.doc_id, a.alloc
         |  FROM rankedv r JOIN alloc a USING (lang) WHERE r.r <= a.alloc)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(max(alloc) AS BIGINT) AS alloc, min(doc_id) AS min_id
         |FROM keptv GROUP BY lang ORDER BY lang""".stripMargin,

    // q152: the closed-form waterfill — (count, lang)-sorted prefix
    // sums locate the pivot (first group over its fair share); groups
    // before it take everything, the rest take floor share (+1 apiece
    // for the integer remainder, in sort order); per-group selection
    // by (md5(id), id) rank
    "q152_unimax_sample" ->
      """WITH counts AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY lang),
        |ord AS (
        |  SELECT lang, c,
        |    CAST(row_number() OVER (ORDER BY c, lang) AS BIGINT) AS i,
        |    CAST(count(*) OVER () AS BIGINT) AS l,
        |    CAST(sum(c) OVER (ORDER BY c, lang
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pre
        |  FROM counts),
        |cand AS (
        |  SELECT *, CAST(floor(CAST(400 - (pre - c) AS DOUBLE)
        |    / CAST(l - i + 1 AS DOUBLE)) AS BIGINT) AS t
        |  FROM ord),
        |piv AS (SELECT min(i) AS pi FROM cand WHERE c > t),
        |pv AS (SELECT c2.i AS pi, c2.t AS pt, c2.pre - c2.c AS prepiv,
        |         c2.l AS l
        |       FROM cand c2 JOIN piv ON c2.i = piv.pi),
        |alloc AS (
        |  SELECT o.lang,
        |    CASE WHEN p.pi IS NULL OR o.i < p.pi THEN o.c
        |      ELSE p.pt + (CASE WHEN o.i - p.pi <
        |          (400 - p.prepiv) - p.pt * (p.l - p.pi + 1)
        |        THEN 1 ELSE 0 END) END AS alloc
        |  FROM cand o LEFT JOIN pv p ON true),
        |ranked AS (
        |  SELECT d.lang, d.doc_id,
        |    row_number() OVER (PARTITION BY d.lang
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS r
        |  FROM documents d),
        |kept AS (
        |  SELECT r.lang, r.doc_id, a.alloc
        |  FROM ranked r JOIN alloc a USING (lang) WHERE r.r <= a.alloc)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(max(alloc) AS BIGINT) AS alloc, min(doc_id) AS min_id
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,

    // q153: the q82 chunk-slicing arithmetic (32-token windows, step
    // 24) feeding the q145 BM25 body over chunk keys
    "q153_chunk_retrieval" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |chunks AS (
        |  SELECT doc_id * 1000 + (i - 1) AS chunk_key,
        |    array_to_string(ts[(i - 1) * 24 + 1 : (i - 1) * 24 + 32], ' ')
        |      AS chunk_text
        |  FROM (SELECT doc_id, ts, unnest(range(1,
        |      CAST(greatest(1, ceil(CAST(len(ts) - 8 AS DOUBLE) / 24.0))
        |        AS BIGINT) + 1)) AS i
        |    FROM toks)),
        |words AS (
        |  SELECT chunk_key, word AS term
        |  FROM (SELECT chunk_key,
        |          unnest(string_split(lower(chunk_text), ' ')) AS word
        |        FROM chunks)
        |  WHERE word <> ''),
        |tf AS (SELECT chunk_key, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM words GROUP BY chunk_key, term),
        |qt AS (SELECT * FROM (VALUES
        |  ('q_hash', 'hash'), ('q_hash', 'join'),
        |  ('q_stream', 'window'), ('q_stream', 'agg'), ('q_stream', 'stream'))
        |  AS t(query_id, term)),
        |tfq AS (SELECT q.query_id, tf.chunk_key, tf.term, tf.tf
        |        FROM tf JOIN qt q USING (term)),
        |dfq AS (SELECT query_id, term, CAST(count(*) AS BIGINT) AS df_cnt
        |        FROM tfq GROUP BY query_id, term),
        |dl AS (SELECT chunk_key, CAST(count(*) AS BIGINT) AS dl
        |       FROM words GROUP BY chunk_key),
        |s AS (SELECT
        |  CAST((SELECT count(DISTINCT chunk_key) FROM chunks) AS DOUBLE) AS n,
        |  CAST((SELECT count(*) FROM words) AS DOUBLE)
        |    / CAST((SELECT count(DISTINCT chunk_key) FROM chunks) AS DOUBLE)
        |    AS avgdl),
        |contrib AS (
        |  SELECT t.query_id, t.chunk_key,
        |    CAST((ln(1.0 + (s.n - CAST(d.df_cnt AS DOUBLE) + 0.5)
        |                  / (CAST(d.df_cnt AS DOUBLE) + 0.5))
        |        * (CAST(t.tf AS DOUBLE) * (1.2 + 1)))
        |      / (CAST(t.tf AS DOUBLE)
        |         + 1.2 * ((1.0 - 0.75)
        |                  + 0.75 * (CAST(l.dl AS DOUBLE) / s.avgdl)))
        |      AS DECIMAL(20,12)) AS c
        |  FROM tfq t JOIN dfq d USING (query_id, term)
        |  JOIN dl l USING (chunk_key) CROSS JOIN s),
        |scored AS (
        |  SELECT query_id, chunk_key, SUM(c) AS sc,
        |    CAST(count(*) AS BIGINT) AS n_terms
        |  FROM contrib GROUP BY query_id, chunk_key),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY sc DESC, chunk_key) AS rn FROM scored)
        |SELECT query_id, rn, chunk_key, n_terms,
        |  round(CAST(sc AS DOUBLE), 6) AS score
        |FROM ranked WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,

    // q154: leak synthesis + cross-side 8-shingle match + diagonal
    // gaps-and-islands (the q150 machinery, corpus x benchmark only)
    "q154_span_decontamination" ->
      """WITH bench AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 25),
        |corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 25
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |    array_to_string(list_filter(string_split(text, ' '),
        |      w -> w <> '')[6:30], ' ') AS text
        |  FROM documents WHERE doc_id < 25),
        |ctoks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM corpus),
        |btoks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM bench),
        |csh AS (
        |  SELECT doc_id AS corpus_id, i - 1 AS pc,
        |    array_to_string(ts[i:i+7], ' ') AS sh
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS i
        |        FROM ctoks WHERE len(ts) >= 8)),
        |bsh AS (
        |  SELECT doc_id AS bench_id, i - 1 AS pb,
        |    array_to_string(ts[i:i+7], ' ') AS sh
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS i
        |        FROM btoks WHERE len(ts) >= 8)),
        |m AS (
        |  SELECT c.corpus_id, b.bench_id, c.pc, b.pb
        |  FROM csh c JOIN bsh b ON c.sh = b.sh),
        |isl AS (
        |  SELECT corpus_id, bench_id, pc - pb AS diag, pc, pb,
        |    pc - row_number() OVER (PARTITION BY corpus_id, bench_id,
        |      pc - pb ORDER BY pc) AS grp
        |  FROM m),
        |spans AS (
        |  SELECT corpus_id, bench_id,
        |    CAST(min(pc) AS BIGINT) AS start_corpus,
        |    CAST(min(pb) AS BIGINT) AS start_bench,
        |    CAST(count(*) + 7 AS BIGINT) AS span_tokens
        |  FROM isl GROUP BY corpus_id, bench_id, diag, grp)
        |SELECT corpus_id, bench_id, start_corpus, start_bench, span_tokens
        |FROM spans WHERE span_tokens >= 20
        |ORDER BY corpus_id, bench_id, start_corpus, start_bench""".stripMargin,

    // q155: q154's span evidence applied — anti-range token filter,
    // ordered string_agg reassembly, token-counted removal
    "q155_cut_contamination" ->
      """WITH bench AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 25),
        |corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 25
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |    array_to_string(list_filter(string_split(text, ' '),
        |      w -> w <> '')[6:30], ' ') AS text
        |  FROM documents WHERE doc_id < 25),
        |ctoks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM corpus),
        |btoks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM bench),
        |csh AS (
        |  SELECT doc_id AS corpus_id, i - 1 AS pc,
        |    array_to_string(ts[i:i+7], ' ') AS sh
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS i
        |        FROM ctoks WHERE len(ts) >= 8)),
        |bsh AS (
        |  SELECT doc_id AS bench_id, i - 1 AS pb,
        |    array_to_string(ts[i:i+7], ' ') AS sh
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS i
        |        FROM btoks WHERE len(ts) >= 8)),
        |m AS (
        |  SELECT c.corpus_id, b.bench_id, c.pc, b.pb
        |  FROM csh c JOIN bsh b ON c.sh = b.sh),
        |isl AS (
        |  SELECT corpus_id, bench_id, pc - pb AS diag, pc, pb,
        |    pc - row_number() OVER (PARTITION BY corpus_id, bench_id,
        |      pc - pb ORDER BY pc) AS grp
        |  FROM m),
        |spans AS (
        |  SELECT corpus_id,
        |    CAST(min(pc) AS BIGINT) AS start_corpus,
        |    CAST(count(*) + 7 AS BIGINT) AS span_tokens
        |  FROM isl GROUP BY corpus_id, bench_id, diag, grp
        |  HAVING count(*) + 7 >= 20),
        |ctokp AS (
        |  SELECT doc_id, i - 1 AS pos, ts[i] AS tok
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
        |        FROM ctoks)),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.tok FROM ctokp t
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM spans s WHERE s.corpus_id = t.doc_id
        |      AND t.pos >= s.start_corpus
        |      AND t.pos < s.start_corpus + s.span_tokens)),
        |agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |    CAST(count(*) AS BIGINT) AS kept
        |  FROM kept GROUP BY doc_id),
        |nsp AS (
        |  SELECT corpus_id AS doc_id, CAST(count(*) AS BIGINT) AS n_spans
        |  FROM spans GROUP BY corpus_id),
        |ntok AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM ctoks)
        |SELECT ntok.doc_id,
        |  COALESCE(agg.clean_text, '') AS clean_text,
        |  CAST(COALESCE(nsp.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(ntok.n - COALESCE(agg.kept, 0) AS BIGINT) AS removed_tokens
        |FROM ntok
        |LEFT JOIN agg ON agg.doc_id = ntok.doc_id
        |LEFT JOIN nsp ON nsp.doc_id = ntok.doc_id
        |ORDER BY ntok.doc_id""".stripMargin,

    // q156: cross-side cosines (the q148 double folds), decimal-
    // quantized k-neighborhood means, ratio margin, mutual top-1
    "q156_bitext_mining" ->
      """WITH va AS (SELECT vec_id AS id_left, embedding AS v
        |  FROM embeddings WHERE vec_id < 250),
        |vb AS (SELECT vec_id AS id_right, embedding AS v
        |  FROM embeddings WHERE vec_id >= 250),
        |pairs AS (
        |  SELECT id_left, id_right,
        |    CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb)
        |         ELSE 0.0 END AS cos
        |  FROM (
        |    SELECT a.id_left, b.id_right,
        |      list_sum(list_transform(range(1, len(a.v) + 1),
        |        i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
        |        AS dot,
        |      sqrt(list_sum(list_transform(range(1, len(a.v) + 1),
        |        i -> CAST(a.v[i] AS DOUBLE) * CAST(a.v[i] AS DOUBLE))))
        |        AS na,
        |      sqrt(list_sum(list_transform(range(1, len(b.v) + 1),
        |        i -> CAST(b.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE))))
        |        AS nb
        |    FROM va a CROSS JOIN vb b)),
        |ma AS (
        |  SELECT id_left,
        |    CAST(SUM(CAST(cos AS DECIMAL(18,12))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS m
        |  FROM (SELECT *, row_number() OVER (PARTITION BY id_left
        |          ORDER BY cos DESC, id_right) AS rk FROM pairs)
        |  WHERE rk <= 4 GROUP BY id_left),
        |mb AS (
        |  SELECT id_right,
        |    CAST(SUM(CAST(cos AS DECIMAL(18,12))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS m
        |  FROM (SELECT *, row_number() OVER (PARTITION BY id_right
        |          ORDER BY cos DESC, id_left) AS rk FROM pairs)
        |  WHERE rk <= 4 GROUP BY id_right),
        |sc AS (
        |  SELECT p.id_left, p.id_right, p.cos,
        |    p.cos / ((ma.m + mb.m) / 2.0) AS margin
        |  FROM pairs p JOIN ma USING (id_left) JOIN mb USING (id_right)),
        |fwd AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY id_left
        |    ORDER BY margin DESC, id_right) AS rf FROM sc) WHERE rf = 1),
        |bwd AS (
        |  SELECT id_left, id_right FROM (
        |    SELECT id_left, id_right, row_number() OVER (PARTITION BY
        |      id_right ORDER BY margin DESC, id_left) AS rb FROM sc)
        |  WHERE rb = 1)
        |SELECT f.id_left, f.id_right, round(f.cos, 6) AS cos,
        |  round(f.margin, 6) AS margin
        |FROM fwd f JOIN bwd USING (id_left, id_right)
        |WHERE f.margin >= 1.0
        |ORDER BY id_left, id_right""".stripMargin,

    // q157: interpolated Kneser-Ney replayed — five count relations
    // over the reference bigram stream, the identical discount /
    // interpolation parenthesization, decimal-summed log-scores
    "q157_kneser_ney" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |ref AS (SELECT ts FROM toks
        |  WHERE source IN ('src0','src1','src2','src3','src4')),
        |rbig AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
        |        FROM ref WHERE len(ts) >= 2)),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM rbig GROUP BY w1, w2),
        |cuf AS (SELECT w1, count(*) AS cu, count(DISTINCT w2) AS f
        |        FROM rbig GROUP BY w1),
        |pred AS (SELECT w2, count(DISTINCT w1) AS p FROM rbig GROUP BY w2),
        |tv AS (SELECT
        |  CAST((SELECT count(*) FROM (SELECT DISTINCT w1, w2 FROM rbig))
        |    AS BIGINT) AS t,
        |  CAST((SELECT count(DISTINCT w)
        |        FROM (SELECT unnest(ts) AS w FROM ref)) AS BIGINT) AS v),
        |big AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
        |        FROM toks WHERE len(ts) >= 2)),
        |lp AS (
        |  SELECT b.doc_id,
        |    CAST(ln(CASE WHEN cuf.cu IS NOT NULL THEN
        |      (greatest(CAST(COALESCE(cb.cb, 0) AS DOUBLE) - 0.75, 0.0)
        |        / CAST(cuf.cu AS DOUBLE))
        |      + ((0.75 * CAST(cuf.f AS DOUBLE) / CAST(cuf.cu AS DOUBLE))
        |         * ((CAST(COALESCE(pred.p, 0) AS DOUBLE) + 0.4)
        |            / (CAST(tv.t AS DOUBLE) + 0.4 * CAST(tv.v AS DOUBLE))))
        |      ELSE ((CAST(COALESCE(pred.p, 0) AS DOUBLE) + 0.4)
        |            / (CAST(tv.t AS DOUBLE) + 0.4 * CAST(tv.v AS DOUBLE)))
        |      END) AS DECIMAL(18,12)) AS lp
        |  FROM big b
        |  LEFT JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
        |  LEFT JOIN cuf ON b.w1 = cuf.w1
        |  LEFT JOIN pred ON b.w2 = pred.w2
        |  CROSS JOIN tv)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(CAST(SUM(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS avg_logprob
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q138: the byte-level round-trip contract decode(encode(x)) ==
    // pretokenized(x) collapses the whole BPE pipeline out of the
    // oracle — this SQL replays ONLY the GPT-2-style regex split
    // (leftmost-first alternation, no lookahead: identical under
    // java.util.regex and RE2) and re-concatenates the raw tokens,
    // which equals the Spark side's decode because the leading-space
    // -> Ġ rewrite and its inverse cancel. DuckDB regexp_replace
    // needs the explicit 'g' flag to match Spark's replace-all.
    "q138_bpe_bytelevel_roundtrip" -> """
        |SELECT doc_id, array_to_string(
        |  regexp_extract_all(
        |    concat(regexp_replace(text, 'merge', 'merge,', 'g'),
        |      ' v', CAST(doc_id % 100 AS VARCHAR), '.0!'),
        |    ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'),
        |  '') AS decoded
        |FROM documents ORDER BY doc_id""".stripMargin,

    // merges replayed unrolled (bpeCtes), then the deterministic
    // symbol→id table: base alphabet (w0's initial symbols) sorted
    // lexicographically at mrank 0, merged strings at their rank, min
    // rank wins on collision, dense ids by row_number over (mrank, sym)
    // — both engines order strings by UTF-8 bytes, so the assignment is
    // identical. Word/symbol order inside a doc comes from correlated
    // unnest(range(...)) (the established WITH-ORDINALITY substitute),
    // offsets from a doc-ordered prefix sum.
    "q106_bpe_pack" -> ("WITH " + bpeCtes(12) + s""",
        |msym AS (
        |${(0 until 12).map(k =>
            s"  SELECT a || b AS sym, ${k + 1} AS mrank FROM b$k")
            .mkString("\nUNION ALL\n")}),
        |base AS (
        |  SELECT DISTINCT s AS sym, 0 AS mrank
        |  FROM (SELECT unnest(string_split(sym, ' ')) AS s FROM w0)),
        |symtab AS (
        |  SELECT sym,
        |    CAST(row_number() OVER (ORDER BY mrank, sym) - 1 AS BIGINT) AS id
        |  FROM (SELECT sym, min(mrank) AS mrank
        |        FROM (SELECT * FROM base UNION ALL SELECT * FROM msym)
        |        GROUP BY sym)),
        |enc AS (SELECT w, string_split(sym, ' ') AS sl FROM w12),
        |docw AS (
        |  SELECT doc_id, i AS wpos, ws[i + 1] AS w
        |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i
        |        FROM (SELECT doc_id,
        |                list_filter(string_split(text, ' '), x -> x <> '')
        |                  AS ws
        |              FROM documents))),
        |tok AS (
        |  SELECT doc_id, wpos, j AS spos, sl[j + 1] AS s
        |  FROM (SELECT d.doc_id, d.wpos, e.sl,
        |          unnest(range(0, len(e.sl))) AS j
        |        FROM docw d JOIN enc e USING (w))),
        |seq AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    string_agg(CAST(t.id AS VARCHAR), ' ' ORDER BY wpos, spos)
        |      AS ids
        |  FROM tok JOIN symtab t ON tok.s = t.sym
        |  GROUP BY doc_id),
        |ofs AS (
        |  SELECT doc_id, n_tokens, ids,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS "offset"
        |  FROM seq)
        |SELECT doc_id, n_tokens, ids, "offset",
        |  "offset" // 256 AS first_block,
        |  CASE WHEN n_tokens > 0
        |    THEN ("offset" + n_tokens - 1) // 256 - "offset" // 256 + 1
        |    ELSE 0 END AS n_blocks
        |FROM ofs ORDER BY doc_id""".stripMargin),

    // merges learned on the even-doc_id half (bpeCtes over a filtered
    // relation), then REPLAYED over the full corpus's distinct words as
    // 12 more unrolled replace stages (a0..a12) — the merge-replay
    // tokenizer. A word with any symbol outside the training alphabet
    // (LEFT JOIN misses symtab) is dropped wholesale (wok), the OOV
    // contract; token order is (word position, symbol position).
    "q107_bpe_apply" -> ("WITH " +
      bpeCtes(12, "(SELECT * FROM documents WHERE doc_id % 2 = 0)") +
      s""",
        |msym AS (
        |${(0 until 12).map(k =>
            s"  SELECT a || b AS sym, ${k + 1} AS mrank FROM b$k")
            .mkString("\nUNION ALL\n")}),
        |base AS (
        |  SELECT DISTINCT s AS sym, 0 AS mrank
        |  FROM (SELECT unnest(string_split(sym, ' ')) AS s FROM w0)),
        |symtab AS (
        |  SELECT sym,
        |    CAST(row_number() OVER (ORDER BY mrank, sym) - 1 AS BIGINT)
        |      AS id
        |  FROM (SELECT sym, min(mrank) AS mrank
        |        FROM (SELECT * FROM base UNION ALL SELECT * FROM msym)
        |        GROUP BY sym)),
        |a0 AS MATERIALIZED (
        |  SELECT w, regexp_replace(w, '(.)', '\\1 ', 'g') || '</w>' AS sym
        |  FROM (SELECT DISTINCT w FROM (
        |          SELECT unnest(list_filter(string_split(text, ' '),
        |            x -> x <> '')) AS w FROM documents)
        |        WHERE regexp_matches(w, '^\\p{L}+$$')
        |          AND length(w) <= 32))""".stripMargin +
      (0 until 12).map { k =>
        s""",
          |a${k + 1} AS MATERIALIZED (
          |  SELECT w, trim(regexp_replace(
          |    replace(' ' || replace(sym, ' ', '  ') || ' ',
          |      coalesce((SELECT ' ' || a || '  ' || b || ' ' FROM b$k),
          |        chr(1)),
          |      coalesce((SELECT ' ' || a || b || ' ' FROM b$k), '')),
          |    ' +', ' ', 'g')) AS sym
          |  FROM a$k)""".stripMargin
      }.mkString +
      """,
        |wsym AS (
        |  SELECT w, j AS spos, sl[j + 1] AS s
        |  FROM (SELECT w, sl, unnest(range(0, len(sl))) AS j
        |        FROM (SELECT w, string_split(sym, ' ') AS sl FROM a12))),
        |wid AS (
        |  SELECT wsym.w, wsym.spos, symtab.id
        |  FROM wsym LEFT JOIN symtab ON wsym.s = symtab.sym),
        |wok AS (
        |  SELECT w FROM wid GROUP BY w
        |  HAVING count(CASE WHEN id IS NULL THEN 1 END) = 0),
        |docw AS (
        |  SELECT doc_id, i AS wpos, ws[i + 1] AS w
        |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i
        |        FROM (SELECT doc_id,
        |                list_filter(string_split(text, ' '), x -> x <> '')
        |                  AS ws
        |              FROM documents))),
        |seq AS (
        |  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    string_agg(CAST(u.id AS VARCHAR), ' ' ORDER BY d.wpos, u.spos)
        |      AS ids
        |  FROM docw d
        |  JOIN (SELECT wid.w, wid.spos, wid.id
        |        FROM wid JOIN wok USING (w)) u USING (w)
        |  GROUP BY d.doc_id)
        |SELECT doc_id, n_tokens, ids FROM seq ORDER BY doc_id"""
        .stripMargin),

    // perceptual dHash pairs: each synthetic banded PNG's 64-bit hash is
    // closed-form in the id (bit r·8+i set iff (id·31+i·17+r·57)%200 <
    // 183 — the +17 band step wraps exactly when the comparison falls;
    // brightness/scale variants share the base id's hash by design), so
    // the oracle rebuilds every hash arithmetically and brute-force
    // pairs them. Bit 63 cannot be reached by 1<<63 (DuckDB overflows
    // signed shift); its signed contribution is the BIGINT min value.
    "q108_image_dhash" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS id FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id FROM documents
        |  WHERE doc_id % 11 = 0),
        |bits AS (
        |  SELECT asset_id,
        |    CAST(SUM(CASE WHEN (id * 31 + i * 17 + r * 57) % 200 < 183
        |      THEN CASE WHEN r * 8 + i = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << (r * 8 + i)) END
        |      ELSE 0 END) AS BIGINT) AS dhash
        |  FROM assets, range(0, 8) t1(r), range(0, 8) t2(i)
        |  GROUP BY asset_id),
        |pairs AS (
        |  SELECT x.asset_id AS id_a, y.asset_id AS id_b,
        |    CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming
        |  FROM bits x JOIN bits y ON x.asset_id < y.asset_id)
        |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // perceptual clusters: q108's closed-form hashes, brute-force pairs
    // at Hamming <= 3 over ALL assets (the Spark side collapses
    // identical hashes to representatives first — membership must come
    // out identical), recursive-CTE transitive closure, min-reachable
    // label per member (q72's closure pattern)
    "q109_image_dup_clusters" ->
      """WITH RECURSIVE assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS id FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id FROM documents
        |  WHERE doc_id % 11 = 0),
        |bits AS (
        |  SELECT asset_id,
        |    CAST(SUM(CASE WHEN (id * 31 + i * 17 + r * 57) % 200 < 183
        |      THEN CASE WHEN r * 8 + i = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << (r * 8 + i)) END
        |      ELSE 0 END) AS BIGINT) AS dhash
        |  FROM assets, range(0, 8) t1(r), range(0, 8) t2(i)
        |  GROUP BY asset_id),
        |pairs AS (
        |  SELECT x.asset_id AS id_a, y.asset_id AS id_b
        |  FROM bits x JOIN bits y ON x.asset_id < y.asset_id
        |  WHERE bit_count(xor(x.dhash, y.dhash)) <= 3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
        |SELECT component AS cluster_id,
        |  CAST(count(*) AS BIGINT) AS n_images, max(id) AS max_id
        |FROM comp GROUP BY component ORDER BY cluster_id""".stripMargin,

    // quality gate → exact dedup (planted clones) → per-source quota →
    // stable split; each stage is the already-proven q27/q25/q93/q59 SQL
    "q104_corpus_pipeline" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, source, text FROM documents
         |  WHERE doc_id % 7 = 0),
         |w AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    count(CASE WHEN lower(word) IN $stop THEN 1 END) AS n_stop
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM corpus)
         |  WHERE word <> '' GROUP BY doc_id),
         |keep AS (
         |  SELECT c.doc_id, c.source, c.text
         |  FROM corpus c JOIN w USING (doc_id)
         |  WHERE w.n_tokens >= 30
         |    AND CAST(w.n_stop AS DOUBLE) / CAST(w.n_tokens AS DOUBLE) >= 0.04),
         |ded AS (
         |  SELECT min(doc_id) AS doc_id FROM keep
         |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
         |quo AS (
         |  SELECT doc_id, source FROM (
         |    SELECT k.doc_id, k.source, row_number() OVER (
         |      PARTITION BY k.source
         |      ORDER BY md5(CAST(k.doc_id AS VARCHAR)), k.doc_id) AS rn
         |    FROM keep k JOIN ded USING (doc_id))
         |  WHERE rn <= 12)
         |SELECT doc_id, source,
         |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
         |            AS INTEGER) < 3
         |       THEN 'test' ELSE 'train' END AS split
         |FROM quo ORDER BY doc_id""".stripMargin,

    "q105_pagerank" -> ("WITH " + pageRankCtes(5) + """
        |SELECT node,
        |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS node_type,
        |  pr
        |FROM pr5 ORDER BY node""".stripMargin),

    // perceptual audio hash pairs: the banded-WAV fixture makes each
    // 64-bit energy-delta sign hash closed-form in the id (bit w set
    // iff (id·31 + w·17) % 200 < 183 — the +17 band step wraps exactly
    // when the energy comparison falls; gain/resample variants share
    // the base id's hash by design), so the oracle rebuilds every hash
    // arithmetically and brute-force pairs them. Bit 63's signed
    // contribution is the BIGINT min value (q108 convention).
    "q110_audio_ahash" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS id FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id FROM documents
        |  WHERE doc_id % 11 = 0),
        |bits AS (
        |  SELECT asset_id,
        |    CAST(SUM(CASE WHEN (id * 31 + w * 17) % 200 < 183
        |      THEN CASE WHEN w = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << w) END
        |      ELSE 0 END) AS BIGINT) AS ahash
        |  FROM assets, range(0, 64) t(w)
        |  GROUP BY asset_id),
        |pairs AS (
        |  SELECT x.asset_id AS id_a, y.asset_id AS id_b,
        |    CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming
        |  FROM bits x JOIN bits y ON x.asset_id < y.asset_id)
        |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // perceptual audio duplicate clusters: q110's closed-form hash CTE
    // (bit w set iff (id·31 + w·17) % 200 < 183; re-gained/resampled
    // variants share the base id's hash by design) composed with q109's
    // recursive-CTE transitive closure over brute-force pairs of ALL
    // assets — the Spark side collapses identical hashes to min-id
    // representatives before pairing, so membership must come out
    // identical. Radius 1, not q110's 3: the fixture's biased bits
    // chain every hash class within distance 2, so >= 2 is one vacuous
    // corpus-wide cluster (see the q113 scaladoc for the measurement).
    "q113_audio_dup_clusters" ->
      """WITH RECURSIVE assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS id FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id FROM documents
        |  WHERE doc_id % 11 = 0),
        |bits AS (
        |  SELECT asset_id,
        |    CAST(SUM(CASE WHEN (id * 31 + w * 17) % 200 < 183
        |      THEN CASE WHEN w = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << w) END
        |      ELSE 0 END) AS BIGINT) AS ahash
        |  FROM assets, range(0, 64) t(w)
        |  GROUP BY asset_id),
        |pairs AS (
        |  SELECT x.asset_id AS id_a, y.asset_id AS id_b
        |  FROM bits x JOIN bits y ON x.asset_id < y.asset_id
        |  WHERE bit_count(xor(x.ahash, y.ahash)) <= 1),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
        |SELECT component AS cluster_id,
        |  CAST(count(*) AS BIGINT) AS n_assets, max(id) AS max_id
        |FROM comp GROUP BY component ORDER BY cluster_id""".stripMargin,

    // perceptual video duplicate clusters: per-frame hash bits are
    // closed-form (bit(f,r,i) = (id·31 + f·53 + i·97 + r·57) % 200 <
    // 103 over 3 + id%4 frames — the near-balanced band step, see
    // syntheticBandAvi; brightness/scale re-muxes share the base id's
    // bits), the majority fold keeps bit b iff strictly more
    // than half the frames have it, and the folded signatures
    // brute-force pair at Hamming <= 3 over ALL assets (the Spark side
    // collapses identical signatures to representatives first — the
    // q109 degenerate-class guard — so membership must come out
    // identical), recursive-CTE transitive closure, min-reachable
    // label. The frame axis is range(0,7) filtered to the per-asset
    // frame count (max 6 frames — a bounded cross join, no lateral
    // needed).
    // dihedral-canonical dHash pairs: the oracle rebuilds every member
    // hash arithmetically — each of the 8×9×8 probe coordinates is
    // mapped through the hash transform t (over the variant's dims),
    // then through the planted transform tv (over the base dims), down
    // to a base band index, whose gray is closed-form in the id; bit
    // (r,i) of member hash t compares probe i+1 vs i; the canonical
    // hash is the BIGINT min over t (the documented signed tie-break).
    // Planted rotations/transposes share the base's canonical hash by
    // the group argument and pair at Hamming 0; brute-force pairing at
    // the q108 family radius ≤ 3. Bit 63's signed contribution is the
    // BIGINT min value (q108 convention). The tv=5 plant's +30
    // brightness is carried into the gray for fidelity even though
    // comparisons ignore it.
    "q114_canonical_dhash" -> ("WITH " + canonicalHashCtes +
      """,
        |pairs AS (
        |  SELECT x.asset_id AS id_a, y.asset_id AS id_b,
        |    CAST(bit_count(xor(x.chash, y.chash)) AS BIGINT) AS hamming
        |  FROM ch x JOIN ch y ON x.asset_id < y.asset_id)
        |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin),

    // canonical-hash CLUSTERS at radius 1 (the q113 discriminative-
    // radius lesson: 3 would fold the min-compressed canonical space
    // into mega-clusters), closed with the q109 recursive-CTE pattern
    // over ALL assets — the Spark side's representative collapse must
    // be exactly transparent to membership
    "q121_canonical_dup_clusters" -> ("WITH RECURSIVE " +
      canonicalHashCtes +
      """,
        |pairs AS (
        |  SELECT x.asset_id AS id_a, y.asset_id AS id_b
        |  FROM ch x JOIN ch y ON x.asset_id < y.asset_id
        |  WHERE bit_count(xor(x.chash, y.chash)) <= 1),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
        |SELECT component AS cluster_id,
        |  CAST(count(*) AS BIGINT) AS n_assets, max(id) AS max_id
        |FROM comp GROUP BY component ORDER BY cluster_id""".stripMargin),


    "q111_video_neardups" ->
      """WITH RECURSIVE assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS id FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id FROM documents
        |  WHERE doc_id % 11 = 0),
        |fb AS (
        |  SELECT asset_id, r.r * 8 + i.i AS b,
        |    CASE WHEN 2 * SUM(CASE WHEN
        |        (id * 31 + f.f * 53 + i.i * 97 + r.r * 57) % 200 < 103
        |      THEN 1 ELSE 0 END) > (3 + id % 4)
        |      THEN 1 ELSE 0 END AS mb
        |  FROM assets, range(0, 8) r(r), range(0, 8) i(i),
        |    range(0, 7) f(f)
        |  WHERE f.f < 3 + id % 4
        |  GROUP BY asset_id, id, r.r, i.i),
        |sigs AS (
        |  SELECT asset_id,
        |    CAST(SUM(CASE WHEN mb = 1
        |      THEN CASE WHEN b = 63 THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << b) END
        |      ELSE 0 END) AS BIGINT) AS vhash
        |  FROM fb GROUP BY asset_id),
        |pairs AS (
        |  SELECT x.asset_id AS id_a, y.asset_id AS id_b
        |  FROM sigs x JOIN sigs y ON x.asset_id < y.asset_id
        |  WHERE bit_count(xor(x.vhash, y.vhash)) <= 3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
        |SELECT component AS cluster_id,
        |  CAST(count(*) AS BIGINT) AS n_images, max(id) AS max_id
        |FROM comp GROUP BY component ORDER BY cluster_id""".stripMargin,

    // q107 with the UNK arm: same learned rules and replay stages, but
    // docw keeps EVERY non-empty word and the final join is a LEFT
    // join — a word with no surviving symbol mapping (pre-tokenizer
    // rejected, so absent from the replay relation; or out-of-alphabet,
    // excluded by wok) contributes ONE token with the reserved id
    // count(symtab), the deterministic one-past-the-last UNK id.
    "q112_bpe_apply_unk" -> ("WITH " +
      bpeCtes(12, "(SELECT * FROM documents WHERE doc_id % 2 = 0)") +
      s""",
        |msym AS (
        |${(0 until 12).map(k =>
            s"  SELECT a || b AS sym, ${k + 1} AS mrank FROM b$k")
            .mkString("\nUNION ALL\n")}),
        |base AS (
        |  SELECT DISTINCT s AS sym, 0 AS mrank
        |  FROM (SELECT unnest(string_split(sym, ' ')) AS s FROM w0)),
        |symtab AS (
        |  SELECT sym,
        |    CAST(row_number() OVER (ORDER BY mrank, sym) - 1 AS BIGINT)
        |      AS id
        |  FROM (SELECT sym, min(mrank) AS mrank
        |        FROM (SELECT * FROM base UNION ALL SELECT * FROM msym)
        |        GROUP BY sym)),
        |a0 AS MATERIALIZED (
        |  SELECT w, regexp_replace(w, '(.)', '\\1 ', 'g') || '</w>' AS sym
        |  FROM (SELECT DISTINCT w FROM (
        |          SELECT unnest(list_filter(string_split(text, ' '),
        |            x -> x <> '')) AS w FROM documents)
        |        WHERE regexp_matches(w, '^\\p{L}+$$')
        |          AND length(w) <= 32))""".stripMargin +
      (0 until 12).map { k =>
        s""",
          |a${k + 1} AS MATERIALIZED (
          |  SELECT w, trim(regexp_replace(
          |    replace(' ' || replace(sym, ' ', '  ') || ' ',
          |      coalesce((SELECT ' ' || a || '  ' || b || ' ' FROM b$k),
          |        chr(1)),
          |      coalesce((SELECT ' ' || a || b || ' ' FROM b$k), '')),
          |    ' +', ' ', 'g')) AS sym
          |  FROM a$k)""".stripMargin
      }.mkString +
      """,
        |wsym AS (
        |  SELECT w, j AS spos, sl[j + 1] AS s
        |  FROM (SELECT w, sl, unnest(range(0, len(sl))) AS j
        |        FROM (SELECT w, string_split(sym, ' ') AS sl FROM a12))),
        |wid AS (
        |  SELECT wsym.w, wsym.spos, symtab.id
        |  FROM wsym LEFT JOIN symtab ON wsym.s = symtab.sym),
        |wok AS (
        |  SELECT w FROM wid GROUP BY w
        |  HAVING count(CASE WHEN id IS NULL THEN 1 END) = 0),
        |docw AS (
        |  SELECT doc_id, i AS wpos, ws[i + 1] AS w
        |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i
        |        FROM (SELECT doc_id,
        |                list_filter(string_split(text, ' '), x -> x <> '')
        |                  AS ws
        |              FROM documents))),
        |tok AS (
        |  SELECT d.doc_id, d.wpos, u.spos, u.id
        |  FROM docw d
        |  LEFT JOIN (SELECT wid.w, wid.spos, wid.id
        |             FROM wid JOIN wok USING (w)) u USING (w)),
        |seq AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    string_agg(
        |      CAST(coalesce(id, (SELECT count(*) FROM symtab)) AS VARCHAR),
        |      ' ' ORDER BY wpos, coalesce(spos, 0)) AS ids
        |  FROM tok GROUP BY doc_id)
        |SELECT doc_id, n_tokens, ids FROM seq ORDER BY doc_id"""
        .stripMargin),

    // q125: the round trip collapses to the identity on its contract
    // domain — decode(applyModel(x)) must equal the admitted
    // pre-tokenized words rejoined in order, so the oracle is q107's
    // admitted-word relations + one string_agg (no symbol replay in
    // the final select: that the chain reduces to THIS is the check)
    "q125_bpe_roundtrip" -> ("WITH " +
      bpeCtes(12, "(SELECT * FROM documents WHERE doc_id % 2 = 0)") +
      s""",
        |msym AS (
        |${(0 until 12).map(k =>
            s"  SELECT a || b AS sym, ${k + 1} AS mrank FROM b$k")
            .mkString("\nUNION ALL\n")}),
        |base AS (
        |  SELECT DISTINCT s AS sym, 0 AS mrank
        |  FROM (SELECT unnest(string_split(sym, ' ')) AS s FROM w0)),
        |symtab AS (
        |  SELECT sym,
        |    CAST(row_number() OVER (ORDER BY mrank, sym) - 1 AS BIGINT)
        |      AS id
        |  FROM (SELECT sym, min(mrank) AS mrank
        |        FROM (SELECT * FROM base UNION ALL SELECT * FROM msym)
        |        GROUP BY sym)),
        |a0 AS MATERIALIZED (
        |  SELECT w, regexp_replace(w, '(.)', '\\1 ', 'g') || '</w>' AS sym
        |  FROM (SELECT DISTINCT w FROM (
        |          SELECT unnest(list_filter(string_split(text, ' '),
        |            x -> x <> '')) AS w FROM documents)
        |        WHERE regexp_matches(w, '^\\p{L}+$$')
        |          AND length(w) <= 32))""".stripMargin +
      (0 until 12).map { k =>
        s""",
          |a${k + 1} AS MATERIALIZED (
          |  SELECT w, trim(regexp_replace(
          |    replace(' ' || replace(sym, ' ', '  ') || ' ',
          |      coalesce((SELECT ' ' || a || '  ' || b || ' ' FROM b$k),
          |        chr(1)),
          |      coalesce((SELECT ' ' || a || b || ' ' FROM b$k), '')),
          |    ' +', ' ', 'g')) AS sym
          |  FROM a$k)""".stripMargin
      }.mkString +
      """,
        |wsym AS (
        |  SELECT w, j AS spos, sl[j + 1] AS s
        |  FROM (SELECT w, sl, unnest(range(0, len(sl))) AS j
        |        FROM (SELECT w, string_split(sym, ' ') AS sl FROM a12))),
        |wid AS (
        |  SELECT wsym.w, wsym.spos, symtab.id
        |  FROM wsym LEFT JOIN symtab ON wsym.s = symtab.sym),
        |wok AS (
        |  SELECT w FROM wid GROUP BY w
        |  HAVING count(CASE WHEN id IS NULL THEN 1 END) = 0),
        |docw AS (
        |  SELECT doc_id, i AS wpos, ws[i + 1] AS w
        |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i
        |        FROM (SELECT doc_id,
        |                list_filter(string_split(text, ' '), x -> x <> '')
        |                  AS ws
        |              FROM documents)))
        |SELECT doc_id, string_agg(w, ' ' ORDER BY wpos) AS decoded
        |FROM docw JOIN wok USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // q115: q112's rule-replay stages verbatim, but the OOV CASE arm
    // becomes BYTE fallback — each word not fully in vocab (or
    // pre-tokenizer-rejected) expands to its UTF-8 bytes, derived here
    // from code points by the standard RFC 3629 arithmetic (DuckDB
    // substr/unicode are code-point-aware), each byte shifted by
    // count(symtab) + 1 onto the reserved page (one past the UNK id —
    // NUL and UNK never collide). Spark derives the same
    // bytes from the engine's UTF8String payload — two independent
    // UTF-8 encoders must agree byte-for-byte.
    "q115_bpe_apply_bytes" -> ("WITH " +
      bpeCtes(12, "(SELECT * FROM documents WHERE doc_id % 2 = 0)") +
      s""",
        |msym AS (
        |${(0 until 12).map(k =>
            s"  SELECT a || b AS sym, ${k + 1} AS mrank FROM b$k")
            .mkString("\nUNION ALL\n")}),
        |base AS (
        |  SELECT DISTINCT s AS sym, 0 AS mrank
        |  FROM (SELECT unnest(string_split(sym, ' ')) AS s FROM w0)),
        |symtab AS (
        |  SELECT sym,
        |    CAST(row_number() OVER (ORDER BY mrank, sym) - 1 AS BIGINT)
        |      AS id
        |  FROM (SELECT sym, min(mrank) AS mrank
        |        FROM (SELECT * FROM base UNION ALL SELECT * FROM msym)
        |        GROUP BY sym)),
        |a0 AS MATERIALIZED (
        |  SELECT w, regexp_replace(w, '(.)', '\\1 ', 'g') || '</w>' AS sym
        |  FROM (SELECT DISTINCT w FROM (
        |          SELECT unnest(list_filter(string_split(text, ' '),
        |            x -> x <> '')) AS w FROM documents)
        |        WHERE regexp_matches(w, '^\\p{L}+$$')
        |          AND length(w) <= 32))""".stripMargin +
      (0 until 12).map { k =>
        s""",
          |a${k + 1} AS MATERIALIZED (
          |  SELECT w, trim(regexp_replace(
          |    replace(' ' || replace(sym, ' ', '  ') || ' ',
          |      coalesce((SELECT ' ' || a || '  ' || b || ' ' FROM b$k),
          |        chr(1)),
          |      coalesce((SELECT ' ' || a || b || ' ' FROM b$k), '')),
          |    ' +', ' ', 'g')) AS sym
          |  FROM a$k)""".stripMargin
      }.mkString +
      """,
        |wsym AS (
        |  SELECT w, j AS spos, sl[j + 1] AS s
        |  FROM (SELECT w, sl, unnest(range(0, len(sl))) AS j
        |        FROM (SELECT w, string_split(sym, ' ') AS sl FROM a12))),
        |wid AS (
        |  SELECT wsym.w, wsym.spos, symtab.id
        |  FROM wsym LEFT JOIN symtab ON wsym.s = symtab.sym),
        |wok AS (
        |  SELECT w FROM wid GROUP BY w
        |  HAVING count(CASE WHEN id IS NULL THEN 1 END) = 0),
        |docw AS (
        |  SELECT doc_id, i AS wpos, ws[i + 1] AS w
        |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i
        |        FROM (SELECT doc_id,
        |                list_filter(string_split(text, ' '), x -> x <> '')
        |                  AS ws
        |              FROM documents))),
        |oovcp AS (
        |  SELECT w, ci, unicode(substr(w, CAST(ci + 1 AS INT), 1)) AS cp
        |  FROM (SELECT w, unnest(range(0, length(w))) AS ci
        |        FROM (SELECT DISTINCT w FROM docw
        |              WHERE w NOT IN (SELECT w FROM wok)))),
        |oovb AS (
        |  SELECT w, ci, bi,
        |    CASE WHEN bi = 0 THEN
        |      CASE nb WHEN 1 THEN cp WHEN 2 THEN 192 + cp // 64
        |        WHEN 3 THEN 224 + cp // 4096
        |        ELSE 240 + cp // 262144 END
        |    ELSE 128 + (cp // (CASE nb - 1 - bi WHEN 0 THEN 1
        |      WHEN 1 THEN 64 WHEN 2 THEN 4096 ELSE 262144 END)) % 64
        |    END AS byte
        |  FROM (SELECT w, ci, cp,
        |          CASE WHEN cp < 128 THEN 1 WHEN cp < 2048 THEN 2
        |               WHEN cp < 65536 THEN 3 ELSE 4 END AS nb
        |        FROM oovcp), range(0, 4) bb(bi)
        |  WHERE bi < nb),
        |tok AS (
        |  SELECT d.doc_id, d.wpos, u.spos AS p1, CAST(0 AS BIGINT) AS p2,
        |    u.id
        |  FROM docw d
        |  JOIN (SELECT wid.w, wid.spos, wid.id
        |        FROM wid JOIN wok USING (w)) u USING (w)
        |  UNION ALL
        |  SELECT d.doc_id, d.wpos, o.ci, o.bi,
        |    (SELECT count(*) FROM symtab) + 1 + o.byte
        |  FROM docw d JOIN oovb o USING (w)),
        |seq AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    string_agg(CAST(id AS VARCHAR), ' ' ORDER BY wpos, p1, p2)
        |      AS ids
        |  FROM tok GROUP BY doc_id)
        |SELECT doc_id, n_tokens, ids FROM seq ORDER BY doc_id"""
        .stripMargin),

    // q127: the bytes-mode round trip collapses to the full-domain
    // reconstruction — decode(applyModel(x)) under oov=bytes must
    // equal the pre-tokenized words rejoined in order, where an
    // ADMITTED word (all final symbols mapped) carries its boundary
    // space and an OOV word's byte run carries none (adjacent OOV
    // words fuse). No byte arithmetic appears in the final select:
    // that the whole encode→bytes→decode chain reduces to THIS string
    // expression is the check.
    "q127_bpe_bytes_roundtrip" -> ("WITH " +
      bpeCtes(12, "(SELECT * FROM documents WHERE doc_id % 2 = 0)") +
      s""",
        |msym AS (
        |${(0 until 12).map(k =>
            s"  SELECT a || b AS sym, ${k + 1} AS mrank FROM b$k")
            .mkString("\nUNION ALL\n")}),
        |base AS (
        |  SELECT DISTINCT s AS sym, 0 AS mrank
        |  FROM (SELECT unnest(string_split(sym, ' ')) AS s FROM w0)),
        |symtab AS (
        |  SELECT sym,
        |    CAST(row_number() OVER (ORDER BY mrank, sym) - 1 AS BIGINT)
        |      AS id
        |  FROM (SELECT sym, min(mrank) AS mrank
        |        FROM (SELECT * FROM base UNION ALL SELECT * FROM msym)
        |        GROUP BY sym)),
        |pl AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' žluťoučký 🦆🦆 kůň42'
        |         ELSE '' END AS text
        |  FROM documents),
        |a0 AS MATERIALIZED (
        |  SELECT w, regexp_replace(w, '(.)', '\\1 ', 'g') || '</w>' AS sym
        |  FROM (SELECT DISTINCT w FROM (
        |          SELECT unnest(list_filter(string_split(text, ' '),
        |            x -> x <> '')) AS w FROM pl)
        |        WHERE regexp_matches(w, '^\\p{L}+$$')
        |          AND length(w) <= 32))""".stripMargin +
      (0 until 12).map { k =>
        s""",
          |a${k + 1} AS MATERIALIZED (
          |  SELECT w, trim(regexp_replace(
          |    replace(' ' || replace(sym, ' ', '  ') || ' ',
          |      coalesce((SELECT ' ' || a || '  ' || b || ' ' FROM b$k),
          |        chr(1)),
          |      coalesce((SELECT ' ' || a || b || ' ' FROM b$k), '')),
          |    ' +', ' ', 'g')) AS sym
          |  FROM a$k)""".stripMargin
      }.mkString +
      """,
        |wsym AS (
        |  SELECT w, j AS spos, sl[j + 1] AS s
        |  FROM (SELECT w, sl, unnest(range(0, len(sl))) AS j
        |        FROM (SELECT w, string_split(sym, ' ') AS sl FROM a12))),
        |wid AS (
        |  SELECT wsym.w, wsym.spos, symtab.id
        |  FROM wsym LEFT JOIN symtab ON wsym.s = symtab.sym),
        |wok AS (
        |  SELECT w FROM wid GROUP BY w
        |  HAVING count(CASE WHEN id IS NULL THEN 1 END) = 0),
        |docw AS (
        |  SELECT doc_id, i AS wpos, ws[i + 1] AS w
        |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i
        |        FROM (SELECT doc_id,
        |                list_filter(string_split(text, ' '), x -> x <> '')
        |                  AS ws
        |              FROM pl)))
        |SELECT doc_id,
        |  rtrim(string_agg(
        |    CASE WHEN wok.w IS NOT NULL THEN docw.w || ' ' ELSE docw.w END,
        |    '' ORDER BY wpos), ' ') AS decoded
        |FROM docw LEFT JOIN wok ON docw.w = wok.w
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // q128: IVFADC — q119's routing CTEs, but the long-form coordinate
    // relation becomes the RESIDUAL (x − coarse centroid of the row's
    // cell, double subtraction then the same scale-12 grid), the four
    // subspace k-means chains re-run over it, and the ADC distance
    // joins each vector's code against the query's PER-CELL residual
    // — so the hash compare proves the residual codes and the
    // per-cell LUTs, not just the routing.
    "q128_ivfadc_topk" -> ("WITH " +
      """cents16 AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
        |    embedding AS c
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        ORDER BY vec_id LIMIT 16)),
        |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
        |assigned AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, cell DESC) AS rn
        |  FROM (
        |    SELECT e.vec_id, c.cell,
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(c.c) + 1),
        |           i -> CAST(c.c[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE))))) AS sim
        |    FROM embeddings e CROSS JOIN cents16 c)),
        |cellof AS (SELECT vec_id, cell FROM assigned WHERE rn = 1),
        |er AS (
        |  SELECT x.vec_id, x.i - 1 AS dim,
        |    CAST(CAST(x.embedding[x.i] AS DOUBLE) - CAST(c.c[x.i] AS DOUBLE)
        |      AS DECIMAL(14,12)) AS xg,
        |    CAST(CAST(x.embedding[x.i] AS DOUBLE) - CAST(c.c[x.i] AS DOUBLE)
        |      AS DECIMAL(28,12)) AS xs
        |  FROM (SELECT vec_id, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS i
        |        FROM embeddings) x
        |  JOIN cellof USING (vec_id)
        |  JOIN cents16 c USING (cell))""".stripMargin +
      ",\n" + pqSeedsCte + ",\n" + pqSubChains("er") +
      """,
        |probes AS (
        |  SELECT cell FROM cents16, qv
        |  ORDER BY
        |    list_sum(list_transform(range(1, len(c) + 1),
        |      i -> CAST(c[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(c) + 1),
        |         i -> CAST(c[i] AS DOUBLE) * CAST(c[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(qv) + 1),
        |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))) DESC,
        |    cell ASC
        |  LIMIT 4),
        |qr AS (
        |  SELECT p.cell, q.i - 1 AS dim,
        |    CAST(CAST(q.qv[q.i] AS DOUBLE) - CAST(c.c[q.i] AS DOUBLE)
        |      AS DECIMAL(14,12)) AS xg
        |  FROM probes p
        |  JOIN cents16 c USING (cell)
        |  CROSS JOIN (SELECT qv, unnest(range(1, len(qv) + 1)) AS i
        |              FROM qv) q),
        |cents AS (
        |  SELECT 0 AS s, cid, dim, cg FROM c1s0
        |  UNION ALL SELECT 1, cid, dim, cg FROM c1s1
        |  UNION ALL SELECT 2, cid, dim, cg FROM c1s2
        |  UNION ALL SELECT 3, cid, dim, cg FROM c1s3),
        |codes AS (
        |  SELECT vec_id, 0 AS s, cid FROM a2s0
        |  UNION ALL SELECT vec_id, 1, cid FROM a2s1
        |  UNION ALL SELECT vec_id, 2, cid FROM a2s2
        |  UNION ALL SELECT vec_id, 3, cid FROM a2s3),
        |probed AS (
        |  SELECT vec_id, cell FROM cellof
        |  WHERE cell IN (SELECT cell FROM probes)),
        |dist AS (
        |  SELECT co.vec_id, SUM((qr.xg - ce.cg) * (qr.xg - ce.cg)) AS dd
        |  FROM codes co
        |  JOIN probed p ON p.vec_id = co.vec_id
        |  JOIN cents ce ON ce.s = co.s AND ce.cid = co.cid
        |  JOIN qr ON qr.cell = p.cell AND qr.dim = ce.dim
        |  GROUP BY co.vec_id),
        |top AS (
        |  SELECT vec_id,
        |    row_number() OVER (ORDER BY dd, vec_id) AS rank
        |  FROM dist)
        |SELECT CAST(rank AS BIGINT) AS rank, vec_id FROM top
        |WHERE rank <= 10 ORDER BY rank""".stripMargin),

    // q129: span-anchored audio tier — the q110 shape, but the hash
    // rule is the SPAN fixture's closed form (pinned 200-amp
    // delimiter bands: bit 0 never set, bits 1-62 the q110 rule,
    // bit 63 rises into the trailing delimiter unless band 63 is
    // itself 200). Leading silence never enters the arithmetic at
    // all — that absence IS the trim-invariance being checked.
    "q129_audio_span_pairs" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS id FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id FROM documents
        |  WHERE doc_id % 11 = 0),
        |bits AS (
        |  SELECT asset_id,
        |    CAST(SUM(CASE WHEN
        |        CASE WHEN w = 0 THEN FALSE
        |             WHEN w = 63 THEN (id * 31 + 1071) % 200 < 199
        |             ELSE (id * 31 + w * 17) % 200 < 183 END
        |      THEN CASE WHEN w = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << w) END
        |      ELSE 0 END) AS BIGINT) AS ahash
        |  FROM assets, range(0, 64) t(w)
        |  GROUP BY asset_id),
        |pairs AS (
        |  SELECT x.asset_id AS id_a, y.asset_id AS id_b,
        |    CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming
        |  FROM bits x JOIN bits y ON x.asset_id < y.asset_id)
        |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // q130: hash-keyed Efraimidis-Spirakis — the oracle enumerates the
    // w hash draws per document (Spark keeps them inside one array_min
    // projection; row-explosion here is the oracle's shape, not the
    // engine's), takes the per-doc min, and ranks the global top-60.
    "q130_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, doc_id % 7 + 1 AS wt FROM documents),
        |keys AS (
        |  SELECT doc_id, min(md5('11:' || CAST(doc_id AS VARCHAR) ||
        |    ':' || CAST(j AS VARCHAR))) AS wkey
        |  FROM (SELECT doc_id, unnest(range(1, wt + 1)) AS j FROM w)
        |  GROUP BY doc_id),
        |top AS (
        |  SELECT doc_id, wkey,
        |    row_number() OVER (ORDER BY wkey, doc_id) AS rank
        |  FROM keys)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id,
        |  CAST(doc_id % 7 + 1 AS BIGINT) AS wt
        |FROM top WHERE rank <= 60 ORDER BY rank""".stripMargin,

    // q131: q111's closed-form frame-hash arithmetic, but per-frame
    // hashes materialize first so the DEGENERATE-frame exclusion
    // (hash exactly 0) is replayed faithfully, and the majority runs
    // over the surviving content frames. The planted intro/outro
    // padding never appears in the arithmetic — that absence is the
    // robustness being checked.
    "q131_video_content_sigs" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS id FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id % 9 = 0),
        |frames AS (
        |  SELECT asset_id, id, f.f AS f
        |  FROM assets, range(0, 7) f(f) WHERE f.f < 3 + id % 4),
        |fh AS (
        |  SELECT asset_id, id, f,
        |    CAST(SUM(CASE WHEN
        |        (id * 31 + f * 53 + i.i * 97 + r.r * 57) % 200 < 103
        |      THEN CASE WHEN r.r * 8 + i.i = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << (r.r * 8 + i.i)) END
        |      ELSE 0 END) AS BIGINT) AS h
        |  FROM frames, range(0, 8) r(r), range(0, 8) i(i)
        |  GROUP BY asset_id, id, f),
        |content AS (SELECT * FROM fh WHERE h <> 0),
        |nf AS (
        |  SELECT asset_id, CAST(count(*) AS BIGINT) AS n_frames
        |  FROM content GROUP BY asset_id),
        |fb AS (
        |  SELECT c.asset_id, r.r * 8 + i.i AS b,
        |    CASE WHEN 2 * SUM(CASE WHEN
        |        (c.id * 31 + c.f * 53 + i.i * 97 + r.r * 57) % 200 < 103
        |      THEN 1 ELSE 0 END) > COUNT(*) THEN 1 ELSE 0 END AS mb
        |  FROM content c, range(0, 8) r(r), range(0, 8) i(i)
        |  GROUP BY c.asset_id, r.r, i.i),
        |sigs AS (
        |  SELECT asset_id,
        |    CAST(SUM(CASE WHEN mb = 1
        |      THEN CASE WHEN b = 63 THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << b) END
        |      ELSE 0 END) AS BIGINT) AS vhash
        |  FROM fb GROUP BY asset_id)
        |SELECT s.asset_id, nf.n_frames, s.vhash
        |FROM sigs s JOIN nf USING (asset_id)
        |ORDER BY s.asset_id""".stripMargin,

    // q132: q108's closed-form dHash bit rule, verbatim, for every
    // asset including the letterboxed re-frames — the matte never
    // appears in the arithmetic because the content box strips it
    // before the grid samples anything.
    "q132_image_content_dhash" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS id FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id FROM documents
        |  WHERE doc_id % 13 = 0),
        |bits AS (
        |  SELECT asset_id,
        |    CAST(SUM(CASE WHEN (id * 31 + i * 17 + r * 57) % 200 < 183
        |      THEN CASE WHEN r * 8 + i = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << (r * 8 + i)) END
        |      ELSE 0 END) AS BIGINT) AS dhash
        |  FROM assets, range(0, 8) t1(r), range(0, 8) t2(i)
        |  GROUP BY asset_id)
        |SELECT asset_id, dhash FROM bits ORDER BY asset_id""".stripMargin,

    // q133: the datasheet is plain exact aggregation — token counts by
    // the filtered space split, dup mass via count - count(distinct
    // normalized-md5), PII hits by the shared RE2-subset patterns, and
    // ONE double division for the mean (the q27 convention).
    "q133_corpus_card" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |    text || CASE WHEN doc_id % 6 = 0
        |      THEN ' kontakt: user' || doc_id ||
        |        '@example.com tel 777123456 web http://example.com/doc/'
        |        || doc_id
        |      ELSE '' END AS text
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, source, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, text FROM base
        |  WHERE doc_id % 9 = 0),
        |enriched AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS ntok,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |      AS BIGINT) AS nem,
        |    CAST(len(regexp_extract_all(text, 'https?://[^\s]+'))
        |      AS BIGINT) AS nur,
        |    CAST(len(regexp_extract_all(text, '[0-9]{9,}'))
        |      AS BIGINT) AS nnum
        |  FROM corpus)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(CAST(sum(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS DOUBLE) AS mean_tokens,
        |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dup_docs,
        |  CAST(sum(CASE WHEN ntok < 30 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_short_docs,
        |  CAST(sum(nem) AS BIGINT) AS n_emails,
        |  CAST(sum(nur) AS BIGINT) AS n_urls,
        |  CAST(sum(nnum) AS BIGINT) AS n_digit_runs
        |FROM enriched GROUP BY source ORDER BY source""".stripMargin,

    // q134: the three curation stages replayed IN SEQUENCE — the q123
    // line/page rules (adjusted plant: the body is sentence-ified so
    // it can survive), the q122 Gopher battery over the CLEANED text,
    // then min-id-per-normalized-fingerprint dedup over the survivors.
    // That the composition agrees, clone suppression included (a clone
    // dedups only when its original survived the gates), is the check.
    "q134_curation_pipeline" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    'This is a proper opening sentence for the page.' ||
        |    chr(10) || text || ' tail.' || chr(10) || 'Too short.' ||
        |    CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
        |      'A line with a { brace character inside it.'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(10) ||
        |      'Lorem ipsum dolor sit amet consectetur.'
        |      ELSE '' END ||
        |    chr(10) || 'Here is a second proper sentence for the page.' ||
        |    CASE WHEN doc_id % 2 = 0 THEN chr(10) ||
        |      'And here is a third proper sentence for it.'
        |      ELSE '' END AS text
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM base WHERE doc_id % 9 = 0),
        |w AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, chr(10)), x -> x <> '') AS ls
        |  FROM corpus),
        |k AS (
        |  SELECT doc_id, text, ls,
        |    list_filter(ls, l ->
        |      (rtrim(l) LIKE '%.' OR rtrim(l) LIKE '%!'
        |        OR rtrim(l) LIKE '%?' OR rtrim(l) LIKE '%"')
        |      AND len(list_filter(string_split(l, ' '), x -> x <> '')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM w),
        |cleaned AS (
        |  SELECT doc_id, array_to_string(kept, chr(10)) AS text
        |  FROM k
        |  WHERE len(kept) >= 3 AND NOT contains(text, '{')
        |    AND NOT contains(lower(text), 'lorem ipsum')),
        |w2 AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '')
        |      AS ws,
        |    list_filter(string_split(text, chr(10)), x -> x <> '') AS ls
        |  FROM cleaned),
        |sig AS (
        |  SELECT doc_id, text,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
        |        / CAST(len(ws) AS DOUBLE) ELSE 0.0 END AS mean_word_len,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST((length(text) - length(replace(text, '#', '')))
        |        + (length(text) - length(replace(text, '…', '')))
        |        + (length(text) - length(replace(text, '...', ''))) // 3
        |        AS DOUBLE) / CAST(len(ws) AS DOUBLE)
        |      ELSE 0.0 END AS symbol_ratio,
        |    CASE WHEN len(ls) > 0 THEN
        |      CAST(len(list_filter(ls, l -> ltrim(l) LIKE '- %'
        |        OR ltrim(l) LIKE '•%' OR ltrim(l) LIKE '* %')) AS DOUBLE)
        |        / CAST(len(ls) AS DOUBLE) ELSE 0.0 END AS bullet_line_frac,
        |    CASE WHEN len(ls) > 0 THEN
        |      CAST(len(list_filter(ls, l -> rtrim(l) LIKE '%...'
        |        OR rtrim(l) LIKE '%…')) AS DOUBLE)
        |        / CAST(len(ls) AS DOUBLE) ELSE 0.0 END AS ellipsis_line_frac,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST(len(list_filter(ws, x -> regexp_matches(x, '\p{L}')))
        |        AS DOUBLE) / CAST(len(ws) AS DOUBLE)
        |      ELSE 0.0 END AS alpha_word_frac,
        |    CAST(
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'and') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'be') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'have') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'of') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'that') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'the') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'to') THEN 1 ELSE 0 END) +
        |      (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'with') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_stop_kinds
        |  FROM w2),
        |survivors AS (
        |  SELECT doc_id, text, n_words FROM sig
        |  WHERE n_words >= 30 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9
        |    AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
        |    AND n_stop_kinds >= 1),
        |keep_ids AS (
        |  SELECT min(doc_id) AS doc_id FROM survivors
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
        |SELECT s.doc_id, s.n_words
        |FROM survivors s JOIN keep_ids USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,

    // q135: the tiled k-of-n crop tier replayed arithmetically — per
    // 9-px tile of each (possibly cropped) emitted image, the 9×8 dHash
    // bit rule over the band closed form with the crop's x0/y0 shift
    // folded into the sample coordinates (brightness cancels in the
    // sign comparisons; bit 63 via the BIGINT-min trick, q108's
    // convention); then distinct non-zero hash sets value-joined and
    // count-filtered at >= 3 shared tiles.
    "q135_tiled_crop_neardups" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS id,
        |    0 AS x0, 0 AS y0, 0 AS cr, 0 AS cb
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, 9, 9, 0, 0
        |  FROM documents WHERE doc_id % 5 = 0 AND doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id, 0, 0, 9, 9
        |  FROM documents WHERE doc_id % 5 = 0 AND doc_id % 11 = 0),
        |dims AS (
        |  SELECT asset_id, id, x0, y0,
        |    4 + id % 3 AS m, 4 + id % 2 AS n,
        |    9 * (4 + id % 3) - x0 - cr AS w,
        |    8 * (4 + id % 2) - y0 - cb AS h
        |  FROM assets),
        |tilebits AS (
        |  SELECT asset_id, tx, ty,
        |    CAST(SUM(CASE WHEN
        |        (id*31 + ((x0 + tx*9 + i + 1) // m) * 17
        |               + ((y0 + ty*9 + (8*r) // 7) // n) * 57) % 200
        |      > (id*31 + ((x0 + tx*9 + i) // m) * 17
        |               + ((y0 + ty*9 + (8*r) // 7) // n) * 57) % 200
        |      THEN CASE WHEN r * 8 + i = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << (r * 8 + i)) END
        |      ELSE 0 END) AS BIGINT) AS dhash
        |  FROM dims, range(0, 6) t1(tx), range(0, 4) t2(ty),
        |       range(0, 8) t3(r), range(0, 8) t4(i)
        |  WHERE tx < w // 9 AND ty < h // 9
        |  GROUP BY asset_id, tx, ty),
        |hashes AS (
        |  SELECT DISTINCT asset_id, dhash FROM tilebits WHERE dhash <> 0),
        |pairs AS (
        |  SELECT x.asset_id AS id_a, y.asset_id AS id_b,
        |    CAST(COUNT(*) AS BIGINT) AS shared_tiles
        |  FROM hashes x JOIN hashes y
        |    ON x.dhash = y.dhash AND x.asset_id < y.asset_id
        |  GROUP BY 1, 2
        |  HAVING COUNT(*) >= 3)
        |SELECT id_a, id_b, shared_tiles FROM pairs
        |ORDER BY id_a, id_b""".stripMargin,

    // q136: the frame-shingle trim/splice tier — per-frame hashes from
    // q131's closed-form bit rule (the trim variant's frames keep their
    // ORIGINAL f, the splice's frame list is clip A's then clip B's),
    // the 0-hash exclusion and dense content re-indexing replayed, the
    // w=3 windows built by self-joining consecutive positions, then the
    // distinct shingle sets value-joined (any shared window pairs).
    "q136_video_shingle_neardups" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id, doc_id AS src, 0 AS f0, 0 AS off
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, 1, 0 FROM documents
        |  WHERE doc_id % 9 = 0 AND doc_id % 4 >= 1
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id, 0, 0 FROM documents
        |  WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id + 6, 0, 10 FROM documents
        |  WHERE doc_id % 11 = 0),
        |frames AS (
        |  SELECT asset_id, src, f.f AS f, off + f.f AS ord
        |  FROM assets, range(0, 7) f(f)
        |  WHERE f.f >= f0 AND f.f < 3 + src % 4),
        |fh AS (
        |  SELECT asset_id, ord,
        |    CAST(SUM(CASE WHEN
        |        (src * 31 + f * 53 + i.i * 97 + r.r * 57) % 200 < 103
        |      THEN CASE WHEN r.r * 8 + i.i = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE (1::BIGINT << (r.r * 8 + i.i)) END
        |      ELSE 0 END) AS BIGINT) AS h
        |  FROM frames, range(0, 8) r(r), range(0, 8) i(i)
        |  GROUP BY asset_id, src, f, ord),
        |content AS (
        |  SELECT asset_id, h,
        |    row_number() OVER (PARTITION BY asset_id ORDER BY ord) AS pos
        |  FROM fh WHERE h <> 0),
        |shingles AS (
        |  SELECT DISTINCT a.asset_id,
        |    CAST(a.h AS VARCHAR) || ':' || CAST(b.h AS VARCHAR) || ':' ||
        |      CAST(c.h AS VARCHAR) AS shingle
        |  FROM content a
        |  JOIN content b ON b.asset_id = a.asset_id AND b.pos = a.pos + 1
        |  JOIN content c ON c.asset_id = a.asset_id AND c.pos = a.pos + 2),
        |pairs AS (
        |  SELECT x.asset_id AS id_a, y.asset_id AS id_b,
        |    CAST(COUNT(*) AS BIGINT) AS shared_shingles
        |  FROM shingles x JOIN shingles y
        |    ON x.shingle = y.shingle AND x.asset_id < y.asset_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, shared_shingles FROM pairs
        |ORDER BY id_a, id_b""".stripMargin,

    // per-(source/lang)-group gate: the q139 scoring replay, then the
    // DIRECT per-group rank formulation (the distributed operator's
    // histogram selection must agree with a plain partitioned
    // row_number cutoff)
    "q159_grouped_perplexity_gate" ->
      """WITH toks AS (
        |  SELECT doc_id, source, source || '/' || lang AS grp,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |ref AS (SELECT ts FROM toks
        |  WHERE source IN ('src0','src1','src2','src3','src4')),
        |rbig AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
        |        FROM ref WHERE len(ts) >= 2)),
        |cu AS (SELECT w1, count(*) AS cu FROM rbig GROUP BY w1),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM rbig GROUP BY w1, w2),
        |v AS (SELECT count(DISTINCT w) AS v
        |      FROM (SELECT unnest(ts) AS w FROM ref)),
        |big AS (
        |  SELECT doc_id, grp, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT doc_id, grp, ts, unnest(range(1, len(ts))) AS i
        |        FROM toks WHERE len(ts) >= 2)),
        |lp AS (
        |  SELECT b.doc_id, b.grp,
        |    CAST(ln((COALESCE(cb.cb, 0) + CAST(0.4 AS DOUBLE))
        |      / (COALESCE(cu.cu, 0) + CAST(0.4 AS DOUBLE) * v.v))
        |      AS DECIMAL(18,12)) AS lp
        |  FROM big b
        |  LEFT JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
        |  LEFT JOIN cu ON b.w1 = cu.w1
        |  CROSS JOIN v),
        |scored AS (
        |  SELECT doc_id, grp,
        |    round(CAST(SUM(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |      AS avg_logprob
        |  FROM lp GROUP BY doc_id, grp),
        |g AS (SELECT grp, CAST(floor(0.25 * count(*)) AS BIGINT) AS k
        |      FROM scored GROUP BY grp),
        |r AS (SELECT scored.*, row_number()
        |        OVER (PARTITION BY grp ORDER BY avg_logprob, doc_id) AS rn
        |      FROM scored)
        |SELECT r.doc_id, r.grp, r.avg_logprob, (r.rn > g.k) AS keep
        |FROM r JOIN g USING (grp)
        |ORDER BY r.doc_id""".stripMargin,

    // full Count-Min replay: the 4x1024 sketch from the same 48-bit md5
    // row hashes, point estimates = min over rows, threshold on the
    // ESTIMATE (collision-inflated entries must appear on both sides)
    "q160_cms_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |big AS (
        |  SELECT ts[i] || ' ' || ts[i + 1] AS v
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
        |        FROM toks WHERE len(ts) >= 2)),
        |rws AS (SELECT unnest(range(0, 4)) AS r),
        |occ AS (
        |  SELECT r, CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || v),
        |      1, 12)) AS BIGINT) % 1024 AS b
        |  FROM big CROSS JOIN rws),
        |sk AS (SELECT r, b, count(*) AS c FROM occ GROUP BY r, b),
        |cand AS (SELECT v, CAST(count(*) AS BIGINT) AS exact_n
        |         FROM big GROUP BY v),
        |est AS (
        |  SELECT cand.v, cand.exact_n,
        |    CAST(min(COALESCE(sk.c, 0)) AS BIGINT) AS est_n
        |  FROM cand CROSS JOIN rws
        |  LEFT JOIN sk ON sk.r = rws.r
        |    AND sk.b = CAST(('0x' || substr(md5(CAST(rws.r AS VARCHAR)
        |      || ':' || cand.v), 1, 12)) AS BIGINT) % 1024
        |  GROUP BY cand.v, cand.exact_n)
        |SELECT v AS bigram, exact_n, est_n
        |FROM est WHERE est_n >= 40 ORDER BY bigram""".stripMargin,

    // IVF-pruned MMR: the q45 cell-assignment/probe routing (16
    // centroids, nprobe 4, query vec 1) restricts the pool, then the
    // q148 five-pick greedy tail runs on the probed top-20 slate
    "q161_ivf_mmr_rerank" ->
      """WITH cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS c
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
        |assigned AS (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell DESC) AS rn
        |  FROM (
        |    SELECT e.vec_id, e.embedding, c.cell,
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(c.c) + 1),
        |           i -> CAST(c.c[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE))))) AS sim
        |    FROM embeddings e CROSS JOIN cents c)),
        |probes AS (
        |  SELECT cell FROM cents, q
        |  ORDER BY
        |    list_sum(list_transform(range(1, len(c) + 1),
        |      i -> CAST(c[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(c) + 1),
        |         i -> CAST(c[i] AS DOUBLE) * CAST(c[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(qv) + 1),
        |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))) DESC,
        |    cell ASC
        |  LIMIT 4),
        |scored AS (
        |  SELECT vec_id, emb,
        |    CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb)
        |         ELSE 0.0 END AS qsim
        |  FROM (
        |    SELECT a.vec_id, a.embedding AS emb,
        |      list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |        AS dot,
        |      sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> CAST(a.embedding[i] AS DOUBLE)
        |             * CAST(a.embedding[i] AS DOUBLE)))) AS na,
        |      sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
        |        i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) AS nb
        |    FROM assigned a CROSS JOIN q
        |    WHERE a.rn = 1 AND a.cell IN (SELECT cell FROM probes))),
        |cand AS (
        |  SELECT vec_id, emb, qsim FROM (
        |    SELECT *, row_number() OVER (ORDER BY qsim DESC, vec_id) AS rnk
        |    FROM scored)
        |  WHERE rnk <= 20),
        |pair AS (
        |  SELECT ia, ib,
        |    CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb)
        |         ELSE 0.0 END AS sim
        |  FROM (
        |    SELECT a.vec_id AS ia, b.vec_id AS ib,
        |      list_sum(list_transform(range(1, len(a.emb) + 1),
        |        i -> CAST(a.emb[i] AS DOUBLE) * CAST(b.emb[i] AS DOUBLE)))
        |        AS dot,
        |      sqrt(list_sum(list_transform(range(1, len(a.emb) + 1),
        |        i -> CAST(a.emb[i] AS DOUBLE) * CAST(a.emb[i] AS DOUBLE))))
        |        AS na,
        |      sqrt(list_sum(list_transform(range(1, len(b.emb) + 1),
        |        i -> CAST(b.emb[i] AS DOUBLE) * CAST(b.emb[i] AS DOUBLE))))
        |        AS nb
        |    FROM cand a JOIN cand b ON a.vec_id <> b.vec_id)),
        |s1 AS (
        |  SELECT vec_id, qsim, (0.7 * qsim) - ((1 - 0.7) * 0.0) AS mmr
        |  FROM cand ORDER BY mmr DESC, vec_id LIMIT 1),
        |m2 AS (
        |  SELECT c.vec_id, c.qsim,
        |    (0.7 * c.qsim) - ((1 - 0.7) * (
        |      SELECT max(p.sim) FROM pair p WHERE p.ia = c.vec_id
        |        AND p.ib IN (SELECT vec_id FROM s1))) AS mmr
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)),
        |s2 AS (SELECT * FROM m2 ORDER BY mmr DESC, vec_id LIMIT 1),
        |m3 AS (
        |  SELECT c.vec_id, c.qsim,
        |    (0.7 * c.qsim) - ((1 - 0.7) * (
        |      SELECT max(p.sim) FROM pair p WHERE p.ia = c.vec_id
        |        AND p.ib IN (SELECT vec_id FROM s1
        |                     UNION ALL SELECT vec_id FROM s2))) AS mmr
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1
        |                                     UNION ALL SELECT vec_id FROM s2)),
        |s3 AS (SELECT * FROM m3 ORDER BY mmr DESC, vec_id LIMIT 1),
        |m4 AS (
        |  SELECT c.vec_id, c.qsim,
        |    (0.7 * c.qsim) - ((1 - 0.7) * (
        |      SELECT max(p.sim) FROM pair p WHERE p.ia = c.vec_id
        |        AND p.ib IN (SELECT vec_id FROM s1
        |                     UNION ALL SELECT vec_id FROM s2
        |                     UNION ALL SELECT vec_id FROM s3))) AS mmr
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1
        |                                     UNION ALL SELECT vec_id FROM s2
        |                                     UNION ALL SELECT vec_id FROM s3)),
        |s4 AS (SELECT * FROM m4 ORDER BY mmr DESC, vec_id LIMIT 1),
        |m5 AS (
        |  SELECT c.vec_id, c.qsim,
        |    (0.7 * c.qsim) - ((1 - 0.7) * (
        |      SELECT max(p.sim) FROM pair p WHERE p.ia = c.vec_id
        |        AND p.ib IN (SELECT vec_id FROM s1
        |                     UNION ALL SELECT vec_id FROM s2
        |                     UNION ALL SELECT vec_id FROM s3
        |                     UNION ALL SELECT vec_id FROM s4))) AS mmr
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1
        |                                     UNION ALL SELECT vec_id FROM s2
        |                                     UNION ALL SELECT vec_id FROM s3
        |                                     UNION ALL SELECT vec_id FROM s4)),
        |s5 AS (SELECT * FROM m5 ORDER BY mmr DESC, vec_id LIMIT 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS rank, vec_id,
        |    round(qsim, 6) AS qsim, round(mmr, 6) AS mmr FROM s1
        |  UNION ALL SELECT CAST(2 AS BIGINT), vec_id,
        |    round(qsim, 6), round(mmr, 6) FROM s2
        |  UNION ALL SELECT CAST(3 AS BIGINT), vec_id,
        |    round(qsim, 6), round(mmr, 6) FROM s3
        |  UNION ALL SELECT CAST(4 AS BIGINT), vec_id,
        |    round(qsim, 6), round(mmr, 6) FROM s4
        |  UNION ALL SELECT CAST(5 AS BIGINT), vec_id,
        |    round(qsim, 6), round(mmr, 6) FROM s5)
        |ORDER BY rank""".stripMargin,

    // corpus-internal span dedup: the q150 evidence replay (keep the
    // smaller-id copy), then the q155 cut tail applied to the id_b
    // side only
    "q162_cut_shared_spans" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  -- COALESCE: array_to_string([]) is NULL in DuckDB, but the
        |  -- engine's concat_ws over an empty slice is '' (sub-11-token
        |  -- source docs exist at sf0.001)
        |  SELECT doc_id + 1000000 AS doc_id,
        |    COALESCE(array_to_string(list_filter(string_split(text, ' '),
        |      w -> w <> '')[11:40], ' '), '') AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(ts[i:i+7], ' ') AS sh
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS i
        |        FROM toks WHERE len(ts) >= 8)),
        |m AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib, a.pos AS pa, b.pos AS pb
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id),
        |isl AS (
        |  SELECT ia, ib, pa - pb AS diag, pa, pb,
        |    pa - row_number() OVER (PARTITION BY ia, ib, pa - pb
        |                            ORDER BY pa) AS grp
        |  FROM m),
        |spans AS (
        |  SELECT ib AS doc_id,
        |    CAST(min(pb) AS BIGINT) AS start_b,
        |    CAST(count(*) + 7 AS BIGINT) AS span_tokens
        |  FROM isl GROUP BY ia, ib, diag, grp
        |  HAVING count(*) + 7 >= 20),
        |ctokp AS (
        |  SELECT doc_id, i - 1 AS pos, ts[i] AS tok
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
        |        FROM toks)),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.tok FROM ctokp t
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM spans s WHERE s.doc_id = t.doc_id
        |      AND t.pos >= s.start_b
        |      AND t.pos < s.start_b + s.span_tokens)),
        |agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |    CAST(count(*) AS BIGINT) AS kept
        |  FROM kept GROUP BY doc_id),
        |nsp AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
        |  FROM spans GROUP BY doc_id),
        |ntok AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM toks)
        |SELECT ntok.doc_id,
        |  COALESCE(agg.clean_text, '') AS clean_text,
        |  CAST(COALESCE(nsp.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(ntok.n - COALESCE(agg.kept, 0) AS BIGINT) AS removed_tokens
        |FROM ntok
        |LEFT JOIN agg ON agg.doc_id = ntok.doc_id
        |LEFT JOIN nsp ON nsp.doc_id = ntok.doc_id
        |ORDER BY ntok.doc_id""".stripMargin,

    // Naive-Bayes replay: per-class token counts, the two Laplace-
    // smoothed per-token log terms quantized to DECIMAL(18,12) before
    // the sum, the doc-count prior, round-6 display
    "q163_nb_quality_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    source IN ('src0','src1','src2','src3','src4') AS y,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |tokl AS (SELECT y, unnest(ts) AS w FROM toks),
        |cw AS (
        |  SELECT w,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS cp,
        |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS cn
        |  FROM tokl GROUP BY w),
        |tot AS (
        |  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
        |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS nn,
        |    count(DISTINCT w) AS v
        |  FROM tokl),
        |pri AS (
        |  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS dp,
        |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS dn
        |  FROM toks),
        |st AS (SELECT doc_id, unnest(ts) AS w FROM toks),
        |term AS (
        |  SELECT s.doc_id,
        |    CAST(ln((COALESCE(cw.cp, 0) + CAST(1.0 AS DOUBLE))
        |      / (tot.np + CAST(1.0 AS DOUBLE) * tot.v))
        |      AS DECIMAL(18,12))
        |    - CAST(ln((COALESCE(cw.cn, 0) + CAST(1.0 AS DOUBLE))
        |      / (tot.nn + CAST(1.0 AS DOUBLE) * tot.v))
        |      AS DECIMAL(18,12)) AS t
        |  FROM st s LEFT JOIN cw ON s.w = cw.w CROSS JOIN tot),
        |sc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    SUM(t) AS s
        |  FROM term GROUP BY doc_id),
        |fin AS (
        |  SELECT sc.doc_id, sc.n_tokens,
        |    round(CAST(sc.s + CAST(ln(pri.dp) AS DECIMAL(18,12))
        |      - CAST(ln(pri.dn) AS DECIMAL(18,12)) AS DOUBLE), 6) AS score
        |  FROM sc CROSS JOIN pri)
        |SELECT doc_id, n_tokens, score, (score > 0) AS pred_pos
        |FROM fin ORDER BY doc_id""".stripMargin,

    // duplication-mass histogram: q72's recursive transitive closure,
    // then cluster-size counts + the singleton complement row
    "q185_dup_mass_histogram" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM toks),
        |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
        |cl AS (SELECT component, count(*) AS n_docs FROM comp
        |       GROUP BY component),
        |multi AS (
        |  SELECT n_docs AS size, CAST(count(*) AS BIGINT) AS n_clusters,
        |    CAST(sum(n_docs) AS BIGINT) AS doc_mass
        |  FROM cl GROUP BY n_docs),
        |tot AS (SELECT count(*) AS nt FROM corpus),
        |inc AS (SELECT CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS ic FROM cl),
        |allrows AS (
        |  SELECT size, n_clusters, doc_mass FROM multi
        |  UNION ALL
        |  SELECT 1 AS size, CAST(nt - ic AS BIGINT), CAST(nt - ic AS BIGINT)
        |  FROM tot, inc)
        |SELECT size, n_clusters, doc_mass,
        |  doc_mass - n_clusters AS removable
        |FROM allrows ORDER BY size""".stripMargin,

    // quality-aware collapse: q72's closure over a corpus where every
    // clone is EXTENDED by its own first two tokens, then per-cluster
    // argmax on (n_tokens DESC, id ASC)
    "q186_quality_collapse" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, ts FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, list_concat(ts, ts[1:2]) AS ts
        |  FROM base),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM corpus),
        |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
        |q AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens FROM corpus),
        |sel AS (
        |  SELECT comp.component AS cluster_id, comp.id, q.n_tokens,
        |    row_number() OVER (PARTITION BY comp.component
        |      ORDER BY q.n_tokens DESC, comp.id ASC) AS rn,
        |    count(*) OVER (PARTITION BY comp.component) AS n_docs
        |  FROM comp JOIN q ON q.doc_id = comp.id)
        |SELECT cluster_id, CAST(n_docs AS BIGINT) AS n_docs,
        |  id AS keep_id, n_tokens AS keep_quality
        |FROM sel WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    // paragraph dedup (Dolma rule): first occurrence of every non-empty
    // trimmed line keeps, later copies drop; empty lines are layout
    "q196_paragraph_dedup" ->
      """WITH src AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN chr(10) || 'Shared disclaimer paragraph' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN chr(10) || 'Subscribe to our newsletter' ELSE '' END
        |    AS text
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, i - 1 AS line_no, ls[i] AS line,
        |    trim(ls[i]) AS trimmed
        |  FROM (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i
        |        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
        |              FROM src))),
        |fl AS (
        |  SELECT doc_id, line_no, line, trimmed,
        |    row_number() OVER (PARTITION BY trimmed
        |      ORDER BY doc_id, line_no) AS rn
        |  FROM lines),
        |keptl AS (
        |  SELECT doc_id, line_no, line FROM fl
        |  WHERE trimmed = '' OR rn = 1),
        |kg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY line_no) AS cleaned_text
        |  FROM keptl GROUP BY doc_id),
        |tot AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nl
        |  FROM lines GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(k.n_kept, 0) AS n_kept,
        |  t.nl - coalesce(k.n_kept, 0) AS n_removed,
        |  coalesce(k.cleaned_text, '') AS cleaned_text
        |FROM tot t LEFT JOIN kg k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // epoch/repeat planner: replay the greedy waterfill over the exact
    // integer value ladder (weight_ppm * 2^(4-epoch), strict total
    // order, cumulative-token window, clamped boundary layer)
    "q197_epoch_plan" ->
      s"""WITH $epochPerCtes,
        |layers AS (
        |  SELECT p.source, p.unique_tokens, p.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
        |      AS value_scaled
        |  FROM per p CROSS JOIN generate_series(1, 4) e(epoch)),
        |alloc AS (
        |  SELECT l.*, b.budget,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM layers l CROSS JOIN b),
        |la AS (
        |  SELECT *, GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) AS layer_alloc
        |  FROM alloc),
        |plan AS (
        |  SELECT source, unique_tokens, weight_ppm,
        |    CAST(sum(layer_alloc) AS BIGINT) AS tokens_alloc,
        |    CAST(sum(CASE WHEN layer_alloc = unique_tokens THEN 1
        |      ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM la GROUP BY source, unique_tokens, weight_ppm)
        |SELECT source, unique_tokens, weight_ppm, tokens_alloc,
        |  full_epochs,
        |  (256 * (tokens_alloc - full_epochs * unique_tokens))
        |    // unique_tokens AS frac_b256,
        |  round(CAST(tokens_alloc AS DOUBLE)
        |    / CAST(unique_tokens AS DOUBLE), 6) AS epochs_r6
        |FROM plan ORDER BY source""".stripMargin,

    // epoch-plan realization audit: the q197 waterfill composed with
    // the per-doc repeat rule (full passes + md5-bucket fractional
    // pass), realized tokens vs allocation per source
    "q198_epoch_realization_audit" ->
      s"""WITH $epochPerCtes,
        |layers AS (
        |  SELECT p.source, p.unique_tokens, p.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
        |      AS value_scaled
        |  FROM per p CROSS JOIN generate_series(1, 4) e(epoch)),
        |alloc AS (
        |  SELECT l.*, b.budget,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM layers l CROSS JOIN b),
        |la AS (
        |  SELECT *, GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) AS layer_alloc
        |  FROM alloc),
        |plan AS (
        |  SELECT source, unique_tokens,
        |    CAST(sum(layer_alloc) AS BIGINT) AS tokens_alloc,
        |    CAST(sum(CASE WHEN layer_alloc = unique_tokens THEN 1
        |      ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM la GROUP BY source, unique_tokens),
        |plan2 AS (
        |  SELECT *,
        |    (256 * (tokens_alloc - full_epochs * unique_tokens))
        |      // unique_tokens AS frac_b256
        |  FROM plan),
        |rep AS (
        |  SELECT b.lang AS source, b.n_tokens,
        |    p.full_epochs + CASE WHEN
        |      CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 2))
        |        AS BIGINT) < p.frac_b256 THEN 1 ELSE 0 END AS repeats
        |  FROM base b JOIN plan2 p ON b.lang = p.source),
        |rz AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(repeats) AS BIGINT) AS doc_passes,
        |    CAST(sum(n_tokens * repeats) AS BIGINT) AS realized_tokens
        |  FROM rep GROUP BY source)
        |SELECT p.source, p.unique_tokens, p.tokens_alloc, p.full_epochs,
        |  p.frac_b256, r.n_docs, r.doc_passes, r.realized_tokens,
        |  r.realized_tokens - p.tokens_alloc AS diff_tokens
        |FROM plan2 p JOIN rz r USING (source)
        |ORDER BY p.source""".stripMargin,

    // packing-policy contrast: the q189 recursive-CTE state machine
    // replayed twice — arrival (id) order vs largest-first — joined
    // per shard
    "q199_packing_policy_contrast" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |ext AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM toks),
        |d0 AS (
        |  SELECT t.doc_id, t.n_tokens,
        |    CAST((t.doc_id - e.lo)
        |      // greatest(1, (e.hi - e.lo) // 8 + 1) AS BIGINT) AS shard
        |  FROM toks t CROSS JOIN ext e),
        |da AS (
        |  SELECT doc_id, n_tokens, shard,
        |    row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        |  FROM d0),
        |pa(shard, rn, doc_id, n_tokens, block, fill) AS (
        |  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
        |  FROM da WHERE rn = 1
        |  UNION ALL
        |  SELECT n.shard, n.rn, n.doc_id, n.n_tokens,
        |    CASE WHEN p.fill + n.n_tokens <= 64 THEN p.block
        |      ELSE p.block + 1 END,
        |    CASE WHEN p.fill + n.n_tokens <= 64 THEN p.fill + n.n_tokens
        |      ELSE n.n_tokens END
        |  FROM pa p JOIN da n ON n.shard = p.shard AND n.rn = p.rn + 1),
        |dd AS (
        |  SELECT doc_id, n_tokens, shard,
        |    row_number() OVER (PARTITION BY shard
        |      ORDER BY n_tokens DESC, doc_id) AS rn
        |  FROM d0),
        |pd(shard, rn, doc_id, n_tokens, block, fill) AS (
        |  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
        |  FROM dd WHERE rn = 1
        |  UNION ALL
        |  SELECT n.shard, n.rn, n.doc_id, n.n_tokens,
        |    CASE WHEN p.fill + n.n_tokens <= 64 THEN p.block
        |      ELSE p.block + 1 END,
        |    CASE WHEN p.fill + n.n_tokens <= 64 THEN p.fill + n.n_tokens
        |      ELSE n.n_tokens END
        |  FROM pd p JOIN dd n ON n.shard = p.shard AND n.rn = p.rn + 1),
        |ba AS (
        |  SELECT shard, block, sum(n_tokens) AS used,
        |    CAST(count(*) AS BIGINT) AS nd
        |  FROM pa GROUP BY shard, block),
        |bd AS (
        |  SELECT shard, block, sum(n_tokens) AS used,
        |    CAST(count(*) AS BIGINT) AS nd
        |  FROM pd GROUP BY shard, block),
        |sa AS (
        |  SELECT shard, CAST(sum(nd) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS arrival_blocks,
        |    CAST(sum(CASE WHEN used <= 64 THEN 64 - used ELSE 0 END)
        |      AS BIGINT) AS arrival_padding,
        |    round(CAST(sum(used) AS DOUBLE)
        |      / CAST(count(*) * 64 AS DOUBLE), 6) AS arrival_util
        |  FROM ba GROUP BY shard),
        |sd AS (
        |  SELECT shard,
        |    CAST(count(*) AS BIGINT) AS ffd_blocks,
        |    CAST(sum(CASE WHEN used <= 64 THEN 64 - used ELSE 0 END)
        |      AS BIGINT) AS ffd_padding,
        |    round(CAST(sum(used) AS DOUBLE)
        |      / CAST(count(*) * 64 AS DOUBLE), 6) AS ffd_util
        |  FROM bd GROUP BY shard)
        |SELECT sa.shard, sa.n_docs, sa.arrival_blocks, sa.arrival_padding,
        |  sa.arrival_util, sd.ffd_blocks, sd.ffd_padding, sd.ffd_util,
        |  sa.arrival_blocks - sd.ffd_blocks AS blocks_saved
        |FROM sa JOIN sd USING (shard) ORDER BY sa.shard""".stripMargin,

    // temperature-composed epoch plan: alpha=0.5 md5-bucket gate on
    // doc counts, quality ppm over the kept docs, then the waterfill
    "q201_epoch_temperature_plan" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |cnt AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM base
        |  GROUP BY lang),
        |m AS (SELECT min(c) AS mc FROM cnt),
        |thr AS (
        |  SELECT lang, CAST(floor(256 * sqrt(mc / c)) AS BIGINT) AS th
        |  FROM cnt, m),
        |kept AS (
        |  SELECT b.doc_id, b.lang, b.n_tokens
        |  FROM base b JOIN thr t ON b.lang = t.lang
        |  WHERE CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)),
        |      1, 2)) AS BIGINT) < t.th),
        |per AS (
        |  SELECT lang AS source,
        |    CAST(sum(n_tokens) AS BIGINT) AS unique_tokens,
        |    (1000000 * CAST(sum(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0
        |      END) AS BIGINT)) // CAST(count(*) AS BIGINT) AS weight_ppm
        |  FROM kept GROUP BY lang
        |  HAVING CAST(sum(n_tokens) AS BIGINT) > 0),
        |b AS (SELECT (47 * CAST(sum(unique_tokens) AS BIGINT)) // 20
        |        AS budget
        |      FROM per),
        |layers AS (
        |  SELECT p.source, p.unique_tokens, p.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
        |      AS value_scaled
        |  FROM per p CROSS JOIN generate_series(1, 4) e(epoch)),
        |alloc AS (
        |  SELECT l.*, b.budget,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM layers l CROSS JOIN b),
        |la AS (
        |  SELECT *, GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) AS layer_alloc
        |  FROM alloc),
        |plan AS (
        |  SELECT source, unique_tokens, weight_ppm,
        |    CAST(sum(layer_alloc) AS BIGINT) AS tokens_alloc,
        |    CAST(sum(CASE WHEN layer_alloc = unique_tokens THEN 1
        |      ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM la GROUP BY source, unique_tokens, weight_ppm),
        |oc AS (
        |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_docs_orig
        |  FROM base GROUP BY lang),
        |kc AS (
        |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_docs_kept
        |  FROM kept GROUP BY lang)
        |SELECT p.source, oc.n_docs_orig, kc.n_docs_kept,
        |  p.unique_tokens, p.weight_ppm, p.tokens_alloc, p.full_epochs,
        |  (256 * (p.tokens_alloc - p.full_epochs * p.unique_tokens))
        |    // p.unique_tokens AS frac_b256,
        |  round(CAST(p.tokens_alloc AS DOUBLE)
        |    / CAST(p.unique_tokens AS DOUBLE), 6) AS epochs_r6
        |FROM plan p JOIN oc USING (source) JOIN kc USING (source)
        |ORDER BY p.source""".stripMargin,

    // dedup-composed epoch plan: exact-dedup the 3x-planted corpus,
    // waterfill BOTH count relations under the deduped budget
    "q205_dedup_epoch_plan" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
        |      AS BIGINT) AS n_tokens,
        |    md5(text) AS fp
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, lang, n_tokens, fp FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, n_tokens, fp FROM base
        |  WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, lang, n_tokens, fp FROM base
        |  WHERE doc_id % 3 = 0),
        |dedup AS (
        |  SELECT doc_id, lang, n_tokens FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS k
        |    FROM corpus)
        |  WHERE doc_id = k),
        |pr AS (
        |  SELECT lang AS source,
        |    CAST(sum(n_tokens) AS BIGINT) AS unique_tokens,
        |    (1000000 * CAST(sum(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0
        |      END) AS BIGINT)) // CAST(count(*) AS BIGINT) AS weight_ppm
        |  FROM corpus GROUP BY lang
        |  HAVING CAST(sum(n_tokens) AS BIGINT) > 0),
        |pd AS (
        |  SELECT lang AS source,
        |    CAST(sum(n_tokens) AS BIGINT) AS unique_tokens,
        |    (1000000 * CAST(sum(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0
        |      END) AS BIGINT)) // CAST(count(*) AS BIGINT) AS weight_ppm
        |  FROM dedup GROUP BY lang
        |  HAVING CAST(sum(n_tokens) AS BIGINT) > 0),
        |b AS (SELECT (47 * CAST(sum(unique_tokens) AS BIGINT)) // 20
        |        AS budget
        |      FROM pd),
        |lr AS (
        |  SELECT p.source, p.unique_tokens, p.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
        |      AS value_scaled
        |  FROM pr p CROSS JOIN generate_series(1, 4) e(epoch)),
        |ar AS (
        |  SELECT l.*, b.budget,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM lr l CROSS JOIN b),
        |plr AS (
        |  SELECT source, unique_tokens,
        |    CAST(sum(GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev))) AS BIGINT)
        |      AS tokens_alloc,
        |    CAST(sum(CASE WHEN GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) = unique_tokens
        |      THEN 1 ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM ar GROUP BY source, unique_tokens),
        |ld AS (
        |  SELECT p.source, p.unique_tokens, p.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
        |      AS value_scaled
        |  FROM pd p CROSS JOIN generate_series(1, 4) e(epoch)),
        |ad AS (
        |  SELECT l.*, b.budget,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM ld l CROSS JOIN b),
        |pld AS (
        |  SELECT source, unique_tokens,
        |    CAST(sum(GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev))) AS BIGINT)
        |      AS tokens_alloc,
        |    CAST(sum(CASE WHEN GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) = unique_tokens
        |      THEN 1 ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM ad GROUP BY source, unique_tokens)
        |SELECT r.source,
        |  r.unique_tokens AS tokens_raw, r.tokens_alloc AS alloc_raw,
        |  r.full_epochs AS full_epochs_raw,
        |  round(CAST(r.tokens_alloc AS DOUBLE)
        |    / CAST(r.unique_tokens AS DOUBLE), 6) AS epochs_raw_r6,
        |  d.unique_tokens AS tokens_dedup, d.tokens_alloc AS alloc_dedup,
        |  d.full_epochs AS full_epochs_dedup,
        |  round(CAST(d.tokens_alloc AS DOUBLE)
        |    / CAST(d.unique_tokens AS DOUBLE), 6) AS epochs_dedup_r6
        |FROM plr r JOIN pld d USING (source)
        |ORDER BY r.source""".stripMargin,

    // per-source duplication mass: the q192-pattern exact closure over
    // a corpus with planted cross-source mirrors and within-source
    // clones, grouped by source with cross-source span attribution
    "q204_source_dup_mass" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, lang, ts FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, 'xx' AS lang, ts
        |  FROM base WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, lang, ts
        |  FROM base WHERE doc_id % 5 = 0),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM corpus),
        |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE)
        |    / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
        |mem AS (
        |  SELECT comp.id AS doc_id, comp.component AS cluster_id, c.lang
        |  FROM comp JOIN corpus c ON c.doc_id = comp.id),
        |span AS (
        |  SELECT cluster_id, count(DISTINCT lang) AS n_langs
        |  FROM mem GROUP BY cluster_id),
        |pl AS (
        |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM corpus GROUP BY lang),
        |cl AS (
        |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_clustered
        |  FROM mem GROUP BY lang),
        |kp AS (
        |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_kept
        |  FROM mem WHERE doc_id = cluster_id GROUP BY lang),
        |cr AS (
        |  SELECT m.lang AS source, CAST(count(*) AS BIGINT) AS n_cross
        |  FROM mem m JOIN span s ON s.cluster_id = m.cluster_id
        |    AND s.n_langs > 1
        |  GROUP BY m.lang)
        |SELECT pl.source, pl.n_docs,
        |  COALESCE(cl.n_clustered, 0) AS n_clustered,
        |  COALESCE(kp.n_kept, 0) AS n_kept_reps,
        |  COALESCE(cl.n_clustered, 0) - COALESCE(kp.n_kept, 0)
        |    AS n_removed,
        |  COALESCE(cr.n_cross, 0) AS n_cross_source
        |FROM pl LEFT JOIN cl USING (source) LEFT JOIN kp USING (source)
        |LEFT JOIN cr USING (source)
        |ORDER BY pl.source""".stripMargin,

    // epoch-budget sweep: the q197 waterfill with the budget ladder
    // folded into the window key
    "q203_epoch_budget_sweep" ->
      s"""WITH $budgetSweepCtes
        |SELECT budget_20ths, source, unique_tokens, tokens_alloc,
        |  full_epochs, frac_b256, epochs_r6
        |FROM eb_sweep ORDER BY budget_20ths, source""".stripMargin,

    // block-size sweep: the q189 recursive-CTE state machine with the
    // ladder folded into the recursion key (block_size, shard)
    "q202_block_size_sweep" ->
      s"""WITH RECURSIVE $blockSizeSweepCtes
        |SELECT block_size, n_blocks, n_overfull, padding_tokens,
        |  utilization
        |FROM bs_sweep ORDER BY block_size""".stripMargin,

    // knob-pick capstone: the five sweep relations interpolated from
    // the SHARED constants their standalone oracles also use (a fix to
    // a sweep's oracle reaches both by construction), then each knob's
    // stated rule over its sweep
    "q200_knob_pick_capstone" ->
      s"""WITH $minhashAuditCtes,
        |$ndSweepCtes,
        |$nbSweepCtes,
        |$tempSweepCtes,
        |tm_agg AS (
        |  SELECT alpha, max(n_kept) AS mx, min(n_kept) AS mn,
        |    CAST(sum(n_kept) AS BIGINT) AS tot
        |  FROM tm_kept GROUP BY alpha),
        |$cdcSweepCtes,
        |cd_sweep AS (
        |  SELECT divisor, CAST(sum(occ) AS BIGINT) AS n_chunks,
        |    CAST(sum((occ - 1) * nt) AS BIGINT) AS dup_token_mass
        |  FROM cd_perfp GROUP BY divisor),
        |$ivfSweepCtes
        |SELECT knob, rule, chosen, quality_r6, cost FROM (
        |  SELECT 'nb_threshold' AS knob,
        |    'smallest threshold with precision >= 1/2' AS rule,
        |    CAST(threshold AS DOUBLE) AS chosen, prec AS quality_r6,
        |    n_kept AS cost
        |  FROM nb_sweep
        |  WHERE threshold = (SELECT min(threshold) FROM nb_sweep
        |                     WHERE prec >= 0.5)
        |  UNION ALL
        |  SELECT 'mix_alpha', 'largest alpha with max_kept <= 2*min_kept',
        |    alpha, round(CAST(mx AS DOUBLE) / CAST(mn AS DOUBLE), 6), tot
        |  FROM tm_agg
        |  WHERE alpha = (SELECT max(alpha) FROM tm_agg WHERE mx <= 2 * mn)
        |  UNION ALL
        |  SELECT 'neardup_jaccard',
        |    'largest threshold keeping >= 1/2 of floor pair mass',
        |    threshold, mean_jaccard, n_pairs
        |  FROM nd_sweep
        |  WHERE threshold = (SELECT max(threshold) FROM nd_sweep
        |    WHERE n_pairs * 2 >= (SELECT n_pairs FROM nd_sweep
        |      WHERE threshold = (SELECT min(threshold) FROM nd_sweep)))
        |  UNION ALL
        |  SELECT 'cdc_divisor', 'largest divisor with dup_mass >= 7/10 of max',
        |    CAST(divisor AS DOUBLE),
        |    round(CAST(dup_token_mass AS DOUBLE)
        |      / CAST((SELECT max(dup_token_mass) FROM cd_sweep) AS DOUBLE),
        |      6),
        |    n_chunks
        |  FROM cd_sweep
        |  WHERE divisor = (SELECT max(divisor) FROM cd_sweep
        |    WHERE dup_token_mass * 10 >=
        |      (SELECT max(dup_token_mass) FROM cd_sweep) * 7)
        |  UNION ALL
        |  SELECT 'ivf_nprobe', 'smallest nprobe with recall >= 0.95',
        |    CAST(nprobe AS DOUBLE), recall, n_scanned
        |  FROM ip_sweep
        |  WHERE nprobe = (SELECT min(nprobe) FROM ip_sweep
        |                  WHERE recall >= 0.95)
        |) ORDER BY knob""".stripMargin,

    // knob-pick extension: the three sweeps q200 scoped out, each
    // interpolated from the SAME shared constant its standalone oracle
    // uses, then the stated one-comparison rules
    "q206_knob_pick_extension" ->
      s"""WITH RECURSIVE $minhashAuditCtes,
        |$lshSweepCtes,
        |$blockSizeSweepCtes,
        |$budgetSweepCtes,
        |eb_roll AS (
        |  SELECT budget_20ths, min(full_epochs) AS mn,
        |    min(epochs_r6) AS mne,
        |    CAST(sum(tokens_alloc) AS BIGINT) AS tot
        |  FROM eb_sweep GROUP BY budget_20ths),
        |$deltaSweepCtes,
        |dl_base05 AS (
        |  SELECT source, full_epochs AS fe5, tokens_alloc AS ta5,
        |    epochs_r6 AS er5
        |  FROM dl_sweep WHERE delta = 0.5),
        |dl_roll AS (
        |  SELECT s.delta,
        |    CAST(sum(CASE WHEN s.full_epochs <> d5.fe5 THEN 1 ELSE 0
        |      END) AS BIGINT) AS ndiff,
        |    max(round(abs(s.epochs_r6 - d5.er5), 6)) AS mxd,
        |    CAST(sum(abs(s.tokens_alloc - d5.ta5)) AS BIGINT) AS tdiff
        |  FROM dl_sweep s JOIN dl_base05 d5 USING (source)
        |  GROUP BY s.delta)
        |SELECT knob, rule, chosen, quality_r6, cost FROM (
        |  SELECT 'pack_block_size' AS knob,
        |    'smallest block size with zero overfull blocks' AS rule,
        |    CAST(block_size AS DOUBLE) AS chosen,
        |    utilization AS quality_r6, padding_tokens AS cost
        |  FROM bs_sweep
        |  WHERE block_size = (SELECT min(block_size) FROM bs_sweep
        |                      WHERE n_overfull = 0)
        |  UNION ALL
        |  SELECT 'epoch_budget_20ths',
        |    'smallest budget with every source at >= 2 full epochs',
        |    CAST(budget_20ths AS DOUBLE), mne, tot
        |  FROM eb_roll
        |  WHERE budget_20ths = (SELECT min(budget_20ths) FROM eb_roll
        |                        WHERE mn >= 2)
        |  UNION ALL
        |  SELECT 'lsh_bands',
        |    'fewest candidates at recall 1.0 (ties: fewest bands)',
        |    CAST(bands AS DOUBLE), recall, n_candidates
        |  FROM (SELECT * FROM lb_sweep WHERE recall = 1.0
        |        ORDER BY n_candidates ASC, bands ASC LIMIT 1)
        |  UNION ALL
        |  SELECT 'epoch_delta',
        |    'smallest delta matching the delta=1/2 full_epochs in every source',
        |    delta, mxd, tdiff
        |  FROM dl_roll
        |  WHERE delta = (SELECT min(delta) FROM dl_roll WHERE ndiff = 0)
        |) ORDER BY knob""".stripMargin,

    // delta-discount sweep: the q197 waterfill with the per-epoch
    // layer factor generalized to denom^(4-epoch) and the delta arm
    // folded into the window key
    "q207_epoch_delta_sweep" ->
      s"""WITH $deltaSweepCtes
        |SELECT delta, source, unique_tokens, tokens_alloc, full_epochs,
        |  frac_b256, epochs_r6
        |FROM dl_sweep ORDER BY delta, source""".stripMargin,

    // plan -> realize -> pack capstone: the q197 waterfill, the q198
    // per-doc repeat rule exploded into epoch-major instance ids, and
    // the q199 first-fit state machine replayed per SOURCE
    "q208_plan_pack_capstone" ->
      s"""WITH RECURSIVE $epochPerCtes,
        |layers AS (
        |  SELECT p.source, p.unique_tokens, p.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
        |      AS value_scaled
        |  FROM per p CROSS JOIN generate_series(1, 4) e(epoch)),
        |alloc AS (
        |  SELECT l.*, b.budget,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM layers l CROSS JOIN b),
        |la AS (
        |  SELECT *, GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) AS layer_alloc
        |  FROM alloc),
        |plan AS (
        |  SELECT source, unique_tokens,
        |    CAST(sum(layer_alloc) AS BIGINT) AS tokens_alloc,
        |    CAST(sum(CASE WHEN layer_alloc = unique_tokens THEN 1
        |      ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM la GROUP BY source, unique_tokens),
        |plan2 AS (
        |  SELECT *,
        |    (256 * (tokens_alloc - full_epochs * unique_tokens))
        |      // unique_tokens AS frac_b256
        |  FROM plan),
        |rep AS (
        |  SELECT b.doc_id, b.lang AS source, b.n_tokens,
        |    p.full_epochs + CASE WHEN
        |      CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 2))
        |        AS BIGINT) < p.frac_b256 THEN 1 ELSE 0 END AS repeats
        |  FROM base b JOIN plan2 p ON b.lang = p.source),
        |passes AS (
        |  SELECT source, doc_id, n_tokens,
        |    unnest(range(1, repeats + 1)) AS p
        |  FROM rep),
        |inst AS (
        |  SELECT source, p * 10000000 + doc_id AS instance_id, n_tokens
        |  FROM passes),
        |di AS (
        |  SELECT source, instance_id, n_tokens,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY instance_id) AS rn
        |  FROM inst),
        |pk(source, rn, n_tokens, block, fill) AS (
        |  SELECT source, rn, n_tokens, CAST(0 AS BIGINT), n_tokens
        |  FROM di WHERE rn = 1
        |  UNION ALL
        |  SELECT n.source, n.rn, n.n_tokens,
        |    CASE WHEN p.fill + n.n_tokens <= 64 THEN p.block
        |      ELSE p.block + 1 END,
        |    CASE WHEN p.fill + n.n_tokens <= 64 THEN p.fill + n.n_tokens
        |      ELSE n.n_tokens END
        |  FROM pk p JOIN di n ON n.source = p.source AND n.rn = p.rn + 1),
        |blk AS (
        |  SELECT source, block, sum(n_tokens) AS used,
        |    CAST(count(*) AS BIGINT) AS nd
        |  FROM pk GROUP BY 1, 2),
        |st AS (
        |  SELECT source, CAST(sum(nd) AS BIGINT) AS doc_passes,
        |    CAST(sum(used) AS BIGINT) AS realized_tokens,
        |    CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(CASE WHEN used > 64 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_overfull,
        |    CAST(sum(CASE WHEN used <= 64 THEN 64 - used ELSE 0 END)
        |      AS BIGINT) AS padding_tokens,
        |    round(CAST(sum(used) AS DOUBLE)
        |      / CAST(count(*) * 64 AS DOUBLE), 6) AS utilization
        |  FROM blk GROUP BY source)
        |SELECT p.source, p.tokens_alloc, p.full_epochs, st.doc_passes,
        |  st.realized_tokens,
        |  st.realized_tokens - p.tokens_alloc AS diff_tokens,
        |  st.n_blocks, st.n_overfull, st.padding_tokens, st.utilization
        |FROM plan2 p JOIN st USING (source)
        |ORDER BY p.source""".stripMargin,

    // dedup-discounted temperature sweep: the q204 closure measures
    // per-source removable mass, effective = docs - removed derives
    // the thresholds, the bucket gate runs over the UN-drained corpus
    "q209_dedup_discounted_mix" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, lang, ts FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, 'xx' AS lang, ts
        |  FROM base WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, lang, ts
        |  FROM base WHERE doc_id % 5 = 0),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM corpus),
        |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE)
        |    / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
        |mem AS (
        |  SELECT comp.id AS doc_id, comp.component AS cluster_id, c.lang
        |  FROM comp JOIN corpus c ON c.doc_id = comp.id),
        |pl AS (
        |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM corpus GROUP BY lang),
        |cl AS (
        |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_clustered
        |  FROM mem GROUP BY lang),
        |kp AS (
        |  SELECT lang AS source, CAST(count(*) AS BIGINT) AS n_kept
        |  FROM mem WHERE doc_id = cluster_id GROUP BY lang),
        |eff AS (
        |  SELECT pl.source, pl.n_docs,
        |    GREATEST(pl.n_docs - (COALESCE(cl.n_clustered, 0)
        |      - COALESCE(kp.n_kept, 0)), 0) AS eff_docs
        |  FROM pl LEFT JOIN cl USING (source)
        |  LEFT JOIN kp USING (source)),
        |m AS (SELECT min(CAST(eff_docs AS DOUBLE)) AS me FROM eff
        |      WHERE eff_docs > 0),
        |al AS (SELECT unnest([0.0, 0.25, 0.5, 0.75, 1.0]) AS alpha),
        |thr AS (
        |  SELECT al.alpha, e.source, e.n_docs, e.eff_docs,
        |    CASE WHEN e.eff_docs <= 0 THEN CAST(0 AS BIGINT)
        |      ELSE CAST(floor(256 * (CASE
        |        WHEN al.alpha = 1.0 THEN CAST(1.0 AS DOUBLE)
        |        WHEN al.alpha = 0.75 THEN sqrt(sqrt(m.me / e.eff_docs))
        |        WHEN al.alpha = 0.5 THEN sqrt(m.me / e.eff_docs)
        |        WHEN al.alpha = 0.25 THEN sqrt(m.me / e.eff_docs)
        |          * sqrt(sqrt(m.me / e.eff_docs))
        |        ELSE m.me / e.eff_docs END)) AS BIGINT) END AS thr
        |  FROM al, eff e, m),
        |bk AS (
        |  SELECT lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
        |      AS INTEGER) AS bucket
        |  FROM corpus),
        |kept AS (
        |  SELECT t.alpha, t.source, t.n_docs, t.eff_docs, t.thr,
        |    CAST(coalesce(sum(CASE WHEN b.bucket < t.thr THEN 1 ELSE 0
        |      END), 0) AS BIGINT) AS n_kept
        |  FROM thr t LEFT JOIN bk b ON b.lang = t.source
        |  GROUP BY 1, 2, 3, 4, 5),
        |tot AS (SELECT alpha, sum(n_kept) AS tt FROM kept GROUP BY alpha)
        |SELECT k.alpha, k.source, k.n_docs, k.eff_docs, k.thr, k.n_kept,
        |  CASE WHEN t.tt = 0 THEN 0.0
        |    ELSE round(CAST(k.n_kept AS DOUBLE) / CAST(t.tt AS DOUBLE), 6)
        |  END AS kept_share
        |FROM kept k JOIN tot t USING (alpha)
        |ORDER BY k.alpha, k.source""".stripMargin,

    // epoch-plan drift: the q197 waterfill with the cumulative-batch
    // arm folded into the window key, the per-(source, batch) counts
    // aggregated once, and each arm's budget derived from its own
    // cumulative corpus; drift joins each arm to the 3-batch plan
    "q212_epoch_plan_drift" ->
      s"""WITH $epochDriftCtes
        |SELECT p.nb AS n_batches, p.source, p.unique_tokens,
        |  p.tokens_alloc, p.full_epochs,
        |  round(CAST(p.tokens_alloc AS DOUBLE)
        |    / CAST(p.unique_tokens AS DOUBLE), 6) AS epochs_r6,
        |  p.full_epochs - f.fe3 AS drift_vs_final
        |FROM pln p JOIN fin f USING (source)
        |ORDER BY p.nb, p.source""".stripMargin,

    // plan-commit rule over the q212 drift: the suffix-settling read —
    // a source settles at the earliest landing from which EVERY
    // subsequent plan matches the final full_epochs (absence from an
    // early plan is unsettled); commit_batches = max settled_at
    "q213_plan_commit_rule" ->
      s"""WITH $epochDriftCtes,
        |drift AS (
        |  SELECT p.nb, p.source, p.full_epochs,
        |    p.full_epochs - f.fe3 AS d
        |  FROM pln p JOIN fin f USING (source)),
        |flags AS (
        |  SELECT source,
        |    max(CASE WHEN nb = 1 AND d = 0 THEN 1 ELSE 0 END) AS ok1,
        |    max(CASE WHEN nb = 2 AND d = 0 THEN 1 ELSE 0 END) AS ok2,
        |    max(CASE WHEN nb = 3 THEN full_epochs END)
        |      AS full_epochs_final
        |  FROM drift GROUP BY source),
        |cper AS (
        |  SELECT source,
        |    CAST(CASE WHEN ok1 = 1 AND ok2 = 1 THEN 1
        |      WHEN ok2 = 1 THEN 2 ELSE 3 END AS BIGINT)
        |      AS settled_at_batches,
        |    CAST(CASE WHEN ok1 = 1 AND ok2 = 0 THEN 1 ELSE 0 END
        |      AS BIGINT) AS flapped,
        |    full_epochs_final
        |  FROM flags)
        |SELECT p.source, p.settled_at_batches, p.flapped,
        |  p.full_epochs_final, c.commit_batches
        |FROM cper p CROSS JOIN (
        |  SELECT CAST(max(settled_at_batches) AS BIGINT)
        |    AS commit_batches FROM cper) c
        |ORDER BY p.source""".stripMargin,

    // early-commit regret: each landing's plan (with its frac_b256
    // bucket rule) applied to the FULL corpus, realized token sums per
    // (landing, source) beside the final plan's realization; the
    // source universe is the final plan's, missing plans realize 0
    "q215_early_commit_regret" ->
      s"""WITH $epochDriftCtes,
        |plnf AS (
        |  SELECT *,
        |    (256 * (tokens_alloc - full_epochs * unique_tokens))
        |      // unique_tokens AS frac_b256
        |  FROM pln),
        |rel AS (
        |  SELECT p.nb, b.lang AS source,
        |    CAST(sum(b.n_tokens * (p.full_epochs + CASE WHEN
        |      CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 2))
        |        AS BIGINT) < p.frac_b256 THEN 1 ELSE 0 END)) AS BIGINT)
        |      AS realized_tokens
        |  FROM dbase b JOIN plnf p ON b.lang = p.source
        |  GROUP BY p.nb, b.lang),
        |rf AS (
        |  SELECT source, realized_tokens AS realized_final
        |  FROM rel WHERE nb = 3)
        |SELECT l.nb AS n_batches, f.source,
        |  COALESCE(p.full_epochs, 0) AS full_epochs_at_k,
        |  COALESCE(r.realized_tokens, 0) AS realized_tokens,
        |  rf.realized_final,
        |  COALESCE(r.realized_tokens, 0) - rf.realized_final
        |    AS regret_tokens
        |FROM nbl l CROSS JOIN fin f
        |JOIN rf ON rf.source = f.source
        |LEFT JOIN plnf p ON p.nb = l.nb AND p.source = f.source
        |LEFT JOIN rel r ON r.nb = l.nb AND r.source = f.source
        |ORDER BY l.nb, f.source""".stripMargin,

    // token-gated plan commit: q215's realization read per landing
    // (each plan's repeat policy applied to the full corpus), then the
    // q213 suffix-settling logic gated on realized_tokens equality —
    // emission identity, the strictly stronger commit
    "q217_token_commit_rule" ->
      s"""WITH $epochDriftCtes,
        |plnf AS (
        |  SELECT *,
        |    (256 * (tokens_alloc - full_epochs * unique_tokens))
        |      // unique_tokens AS frac_b256
        |  FROM pln),
        |rel AS (
        |  SELECT p.nb, b.lang AS source,
        |    CAST(sum(b.n_tokens * (p.full_epochs + CASE WHEN
        |      CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 2))
        |        AS BIGINT) < p.frac_b256 THEN 1 ELSE 0 END)) AS BIGINT)
        |      AS realized_tokens
        |  FROM dbase b JOIN plnf p ON b.lang = p.source
        |  GROUP BY p.nb, b.lang),
        |rf AS (
        |  SELECT source, realized_tokens AS realized_final
        |  FROM rel WHERE nb = 3),
        |tflags AS (
        |  SELECT f.source,
        |    max(CASE WHEN r.nb = 1
        |      AND r.realized_tokens = x.realized_final
        |      THEN 1 ELSE 0 END) AS ok1,
        |    max(CASE WHEN r.nb = 2
        |      AND r.realized_tokens = x.realized_final
        |      THEN 1 ELSE 0 END) AS ok2,
        |    max(x.realized_final) AS realized_tokens_final
        |  FROM fin f JOIN rf x ON x.source = f.source
        |  LEFT JOIN rel r ON r.source = f.source
        |  GROUP BY f.source),
        |tper AS (
        |  SELECT source,
        |    CAST(CASE WHEN ok1 = 1 AND ok2 = 1 THEN 1
        |      WHEN ok2 = 1 THEN 2 ELSE 3 END AS BIGINT)
        |      AS settled_at_batches,
        |    CAST(CASE WHEN ok1 = 1 AND ok2 = 0 THEN 1 ELSE 0 END
        |      AS BIGINT) AS flapped,
        |    realized_tokens_final
        |  FROM tflags)
        |SELECT p.source, p.settled_at_batches, p.flapped,
        |  p.realized_tokens_final, c.commit_batches
        |FROM tper p CROSS JOIN (
        |  SELECT CAST(max(settled_at_batches) AS BIGINT)
        |    AS commit_batches FROM tper) c
        |ORDER BY p.source""".stripMargin,

    // pick->execute capstone: the three chain-relevant picks re-derived
    // from the SHARED sweep CTE constants (a fix to a sweep's oracle
    // reaches the pick, the decision row, and this execution replay by
    // construction), then the q208 plan->realize->pack replay run per
    // configuration (default vs picked) with the config folded into the
    // window and recursion keys
    "q210_pick_execute_capstone" ->
      s"""WITH RECURSIVE $blockSizeSweepCtes,
        |$budgetSweepCtes,
        |eb_roll2 AS (
        |  SELECT budget_20ths, min(full_epochs) AS mn
        |  FROM eb_sweep GROUP BY budget_20ths),
        |$deltaSweepCtes,
        |dl_b05 AS (
        |  SELECT source, full_epochs AS fe5
        |  FROM dl_sweep WHERE delta = 0.5),
        |dl_nd AS (
        |  SELECT s.delta,
        |    CAST(sum(CASE WHEN s.full_epochs <> d5.fe5 THEN 1 ELSE 0
        |      END) AS BIGINT) AS ndiff
        |  FROM dl_sweep s JOIN dl_b05 d5 USING (source)
        |  GROUP BY s.delta),
        |cfg AS (
        |  SELECT '1_default' AS config, CAST(2 AS BIGINT) AS dd,
        |    CAST(47 AS BIGINT) AS b20, CAST(64 AS BIGINT) AS bs
        |  UNION ALL
        |  SELECT '2_picked',
        |    (SELECT CAST(CASE WHEN min(delta) = 0.25 THEN 4
        |       WHEN min(delta) = 1.0 THEN 1 ELSE 2 END AS BIGINT)
        |     FROM dl_nd WHERE ndiff = 0),
        |    COALESCE((SELECT min(budget_20ths) FROM eb_roll2
        |              WHERE mn >= 2), 47),
        |    COALESCE((SELECT CAST(min(block_size) AS BIGINT)
        |              FROM bs_sweep WHERE n_overfull = 0), 64)),
        |ctt AS (SELECT CAST(sum(unique_tokens) AS BIGINT) AS total
        |        FROM per),
        |clayers AS (
        |  SELECT c.config, c.bs, c.b20, c.dd,
        |    (c.b20 * ctt.total) // 20 AS budget,
        |    p.source, p.unique_tokens, p.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    p.weight_ppm * (CASE e.epoch
        |      WHEN 1 THEN c.dd * c.dd * c.dd
        |      WHEN 2 THEN c.dd * c.dd
        |      WHEN 3 THEN c.dd ELSE CAST(1 AS BIGINT) END)
        |      AS value_scaled
        |  FROM per p CROSS JOIN generate_series(1, 4) e(epoch)
        |  CROSS JOIN cfg c CROSS JOIN ctt),
        |calloc AS (
        |  SELECT l.*,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      PARTITION BY l.config
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM clayers l),
        |cla AS (
        |  SELECT *, GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) AS layer_alloc
        |  FROM calloc),
        |cplan AS (
        |  SELECT config, source, unique_tokens,
        |    min(bs) AS bs, min(b20) AS b20, min(dd) AS dd,
        |    CAST(sum(layer_alloc) AS BIGINT) AS tokens_alloc,
        |    CAST(sum(CASE WHEN layer_alloc = unique_tokens THEN 1
        |      ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM cla GROUP BY config, source, unique_tokens),
        |cplan2 AS (
        |  SELECT *,
        |    (256 * (tokens_alloc - full_epochs * unique_tokens))
        |      // unique_tokens AS frac_b256
        |  FROM cplan),
        |crep AS (
        |  SELECT p.config, p.bs, b.doc_id, b.lang AS source, b.n_tokens,
        |    p.full_epochs + CASE WHEN
        |      CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 2))
        |        AS BIGINT) < p.frac_b256 THEN 1 ELSE 0 END AS repeats
        |  FROM base b JOIN cplan2 p ON b.lang = p.source),
        |cpasses AS (
        |  SELECT config, bs, source, doc_id, n_tokens,
        |    unnest(range(1, repeats + 1)) AS p
        |  FROM crep),
        |cinst AS (
        |  SELECT config, bs, source,
        |    p * 10000000 + doc_id AS instance_id, n_tokens
        |  FROM cpasses),
        |cdi AS (
        |  SELECT config, bs, source, instance_id, n_tokens,
        |    row_number() OVER (PARTITION BY config, source
        |      ORDER BY instance_id) AS rn
        |  FROM cinst),
        |cpk(config, bs, source, rn, n_tokens, block, fill) AS (
        |  SELECT config, bs, source, rn, n_tokens, CAST(0 AS BIGINT),
        |    n_tokens
        |  FROM cdi WHERE rn = 1
        |  UNION ALL
        |  SELECT n.config, n.bs, n.source, n.rn, n.n_tokens,
        |    CASE WHEN p.fill + n.n_tokens <= n.bs THEN p.block
        |      ELSE p.block + 1 END,
        |    CASE WHEN p.fill + n.n_tokens <= n.bs
        |      THEN p.fill + n.n_tokens ELSE n.n_tokens END
        |  FROM cpk p JOIN cdi n ON n.config = p.config
        |    AND n.source = p.source AND n.rn = p.rn + 1),
        |cblk AS (
        |  SELECT config, bs, source, block, sum(n_tokens) AS used,
        |    CAST(count(*) AS BIGINT) AS nd
        |  FROM cpk GROUP BY 1, 2, 3, 4),
        |cst AS (
        |  SELECT config, source,
        |    CAST(sum(nd) AS BIGINT) AS doc_passes,
        |    CAST(sum(used) AS BIGINT) AS realized_tokens,
        |    CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(CASE WHEN used > bs THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_overfull,
        |    CAST(sum(CASE WHEN used <= bs THEN bs - used ELSE 0 END)
        |      AS BIGINT) AS padding_tokens,
        |    round(CAST(sum(used) AS DOUBLE)
        |      / CAST(count(*) * bs AS DOUBLE), 6) AS utilization
        |  FROM cblk GROUP BY config, source, bs)
        |SELECT p.config, p.bs AS block_size, p.b20 AS budget_20ths,
        |  CAST(1 AS DOUBLE) / p.dd AS delta,
        |  p.source, p.tokens_alloc, p.full_epochs, st.doc_passes,
        |  st.realized_tokens,
        |  st.realized_tokens - p.tokens_alloc AS diff_tokens,
        |  st.n_blocks, st.n_overfull, st.padding_tokens, st.utilization
        |FROM cplan2 p JOIN cst st USING (config, source)
        |ORDER BY p.config, p.source""".stripMargin,

    // near-dup-discounted epoch plan: the q204 closure measures the
    // per-source keep ratio, unique tokens scale by it (HUGEINT exact
    // integer arithmetic, the DECIMAL(38,0) twin of the Spark side),
    // and the q197 waterfill replays over raw vs effective counts
    // under the effective corpus's budget
    "q211_neardup_discounted_plan" ->
      s"""WITH RECURSIVE $dupDiscountCtes,
        |lr AS (
        |  SELECT p.source, p.unique_tokens, p.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
        |      AS value_scaled
        |  FROM pr p CROSS JOIN generate_series(1, 4) e(epoch)),
        |ar AS (
        |  SELECT l.*, b.budget,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM lr l CROSS JOIN beff b),
        |plr AS (
        |  SELECT source, unique_tokens,
        |    CAST(sum(GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev))) AS BIGINT)
        |      AS tokens_alloc,
        |    CAST(sum(CASE WHEN GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) = unique_tokens
        |      THEN 1 ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM ar GROUP BY source, unique_tokens),
        |ld AS (
        |  SELECT p.source, p.unique_tokens, p.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
        |      AS value_scaled
        |  FROM pe p CROSS JOIN generate_series(1, 4) e(epoch)),
        |ad AS (
        |  SELECT l.*, b.budget,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM ld l CROSS JOIN beff b),
        |pld AS (
        |  SELECT source, unique_tokens,
        |    CAST(sum(GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev))) AS BIGINT)
        |      AS tokens_alloc,
        |    CAST(sum(CASE WHEN GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) = unique_tokens
        |      THEN 1 ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM ad GROUP BY source, unique_tokens)
        |SELECT r.source, e.n_docs, e.eff_docs,
        |  r.unique_tokens AS tokens_raw, r.tokens_alloc AS alloc_raw,
        |  r.full_epochs AS full_epochs_raw,
        |  round(CAST(r.tokens_alloc AS DOUBLE)
        |    / CAST(r.unique_tokens AS DOUBLE), 6) AS epochs_raw_r6,
        |  COALESCE(d.unique_tokens, 0) AS tokens_eff,
        |  COALESCE(d.tokens_alloc, 0) AS alloc_eff,
        |  COALESCE(d.full_epochs, 0) AS full_epochs_eff,
        |  COALESCE(round(CAST(d.tokens_alloc AS DOUBLE)
        |    / CAST(d.unique_tokens AS DOUBLE), 6), 0.0) AS epochs_eff_r6
        |FROM plr r JOIN eff e USING (source)
        |LEFT JOIN pld d USING (source)
        |ORDER BY r.source""".stripMargin,

    // near-dup-discounted pick->execute: the q211 discount CTEs feed
    // the q208 plan->realize->pack replay twice (raw vs effective
    // counts, one budget — the effective corpus's), the arm key folded
    // into the window and recursion keys; the source universe is the
    // raw corpus's (eff), so the fully-removable mirror reads zeros
    "q214_discounted_pick_execute" ->
      s"""WITH RECURSIVE $dupDiscountCtes,
        |pcfg AS (
        |  SELECT '1_raw' AS config, source, unique_tokens, weight_ppm
        |  FROM pr
        |  UNION ALL
        |  SELECT '2_effective', source, unique_tokens, weight_ppm
        |  FROM pe),
        |qlayers AS (
        |  SELECT p.config, p.source, p.unique_tokens, p.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    p.weight_ppm * (CAST(1 AS BIGINT) << (4 - e.epoch))
        |      AS value_scaled
        |  FROM pcfg p CROSS JOIN generate_series(1, 4) e(epoch)),
        |qalloc AS (
        |  SELECT l.*, b.budget,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      PARTITION BY l.config
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM qlayers l CROSS JOIN beff b),
        |qla AS (
        |  SELECT *, GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) AS layer_alloc
        |  FROM qalloc),
        |qplan AS (
        |  SELECT config, source, unique_tokens,
        |    CAST(sum(layer_alloc) AS BIGINT) AS tokens_alloc,
        |    CAST(sum(CASE WHEN layer_alloc = unique_tokens THEN 1
        |      ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM qla GROUP BY config, source, unique_tokens),
        |qplan2 AS (
        |  SELECT *,
        |    (256 * (tokens_alloc - full_epochs * unique_tokens))
        |      // unique_tokens AS frac_b256
        |  FROM qplan),
        |qbase AS (
        |  SELECT doc_id, lang, CAST(len(ts) AS BIGINT) AS n_tokens
        |  FROM corpus),
        |qrep AS (
        |  SELECT p.config, b.doc_id, b.lang AS source, b.n_tokens,
        |    p.full_epochs + CASE WHEN
        |      CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 2))
        |        AS BIGINT) < p.frac_b256 THEN 1 ELSE 0 END AS repeats
        |  FROM qbase b JOIN qplan2 p ON b.lang = p.source),
        |qpasses AS (
        |  SELECT config, source, doc_id, n_tokens,
        |    unnest(range(1, repeats + 1)) AS p
        |  FROM qrep),
        |qinst AS (
        |  SELECT config, source, p * 10000000 + doc_id AS instance_id,
        |    n_tokens
        |  FROM qpasses),
        |qdi AS (
        |  SELECT config, source, instance_id, n_tokens,
        |    row_number() OVER (PARTITION BY config, source
        |      ORDER BY instance_id) AS rn
        |  FROM qinst),
        |qpk(config, source, rn, n_tokens, block, fill) AS (
        |  SELECT config, source, rn, n_tokens, CAST(0 AS BIGINT),
        |    n_tokens
        |  FROM qdi WHERE rn = 1
        |  UNION ALL
        |  SELECT n.config, n.source, n.rn, n.n_tokens,
        |    CASE WHEN p.fill + n.n_tokens <= 64 THEN p.block
        |      ELSE p.block + 1 END,
        |    CASE WHEN p.fill + n.n_tokens <= 64 THEN p.fill + n.n_tokens
        |      ELSE n.n_tokens END
        |  FROM qpk p JOIN qdi n ON n.config = p.config
        |    AND n.source = p.source AND n.rn = p.rn + 1),
        |qblk AS (
        |  SELECT config, source, block, sum(n_tokens) AS used,
        |    CAST(count(*) AS BIGINT) AS nd
        |  FROM qpk GROUP BY 1, 2, 3),
        |qst AS (
        |  SELECT config, source,
        |    CAST(sum(nd) AS BIGINT) AS doc_passes,
        |    CAST(sum(used) AS BIGINT) AS realized_tokens,
        |    CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(CASE WHEN used > 64 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_overfull,
        |    CAST(sum(CASE WHEN used <= 64 THEN 64 - used ELSE 0 END)
        |      AS BIGINT) AS padding_tokens,
        |    round(CAST(sum(used) AS DOUBLE)
        |      / CAST(count(*) * 64 AS DOUBLE), 6) AS utilization
        |  FROM qblk GROUP BY config, source),
        |cfgs AS (SELECT '1_raw' AS config
        |         UNION ALL SELECT '2_effective')
        |SELECT c.config, e.source, e.n_docs, e.eff_docs,
        |  COALESCE(p.tokens_alloc, 0) AS tokens_alloc,
        |  COALESCE(p.full_epochs, 0) AS full_epochs,
        |  COALESCE(st.doc_passes, 0) AS doc_passes,
        |  COALESCE(st.realized_tokens, 0) AS realized_tokens,
        |  COALESCE(st.realized_tokens, 0) - COALESCE(p.tokens_alloc, 0)
        |    AS diff_tokens,
        |  COALESCE(st.n_blocks, 0) AS n_blocks,
        |  COALESCE(st.n_overfull, 0) AS n_overfull,
        |  COALESCE(st.padding_tokens, 0) AS padding_tokens,
        |  COALESCE(st.utilization, 0.0) AS utilization
        |FROM cfgs c CROSS JOIN eff e
        |LEFT JOIN qplan2 p ON p.config = c.config AND p.source = e.source
        |LEFT JOIN qst st ON st.config = c.config AND st.source = e.source
        |ORDER BY c.config, e.source""".stripMargin,

    // production-configuration capstone: the q210 pick CTEs re-derive
    // the knobs (block size, budget, delta — q206's rules, identical
    // COALESCE fallbacks), the q211/q214 discount CTEs measure the
    // effective counts, and the q208 chain replays raw vs effective
    // AT the picked knobs under the effective corpus's picked budget;
    // source universe = eff, so the mirror reads zeros
    "q216_picked_discounted_chain" ->
      s"""WITH RECURSIVE $blockSizeSweepCtes,
        |$budgetSweepCtes,
        |eb_roll2 AS (
        |  SELECT budget_20ths, min(full_epochs) AS mn
        |  FROM eb_sweep GROUP BY budget_20ths),
        |$deltaSweepCtes,
        |dl_b05 AS (
        |  SELECT source, full_epochs AS fe5
        |  FROM dl_sweep WHERE delta = 0.5),
        |dl_nd AS (
        |  SELECT s.delta,
        |    CAST(sum(CASE WHEN s.full_epochs <> d5.fe5 THEN 1 ELSE 0
        |      END) AS BIGINT) AS ndiff
        |  FROM dl_sweep s JOIN dl_b05 d5 USING (source)
        |  GROUP BY s.delta),
        |$dupDiscountCtes,
        |pck AS (
        |  SELECT
        |    COALESCE((SELECT CAST(min(block_size) AS BIGINT)
        |              FROM bs_sweep WHERE n_overfull = 0), 64) AS bs,
        |    COALESCE((SELECT min(budget_20ths) FROM eb_roll2
        |              WHERE mn >= 2), 47) AS b20,
        |    (SELECT CAST(CASE WHEN min(delta) = 0.25 THEN 4
        |       WHEN min(delta) = 1.0 THEN 1 ELSE 2 END AS BIGINT)
        |     FROM dl_nd WHERE ndiff = 0) AS dd),
        |rtt AS (SELECT CAST(sum(unique_tokens) AS BIGINT) AS total
        |        FROM pe),
        |rcfg AS (
        |  SELECT '1_raw' AS config, source, unique_tokens, weight_ppm
        |  FROM pr
        |  UNION ALL
        |  SELECT '2_effective', source, unique_tokens, weight_ppm
        |  FROM pe),
        |rlayers AS (
        |  SELECT c.config, c.source, c.unique_tokens, c.weight_ppm,
        |    CAST(e.epoch AS INTEGER) AS epoch,
        |    k.bs, k.b20, k.dd, (k.b20 * t.total) // 20 AS budget,
        |    c.weight_ppm * (CASE e.epoch
        |      WHEN 1 THEN k.dd * k.dd * k.dd
        |      WHEN 2 THEN k.dd * k.dd
        |      WHEN 3 THEN k.dd ELSE CAST(1 AS BIGINT) END)
        |      AS value_scaled
        |  FROM rcfg c CROSS JOIN generate_series(1, 4) e(epoch)
        |  CROSS JOIN pck k CROSS JOIN rtt t),
        |ralloc AS (
        |  SELECT l.*,
        |    COALESCE(sum(l.unique_tokens) OVER (
        |      PARTITION BY l.config
        |      ORDER BY l.value_scaled DESC, l.source ASC, l.epoch ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_prev
        |  FROM rlayers l),
        |rla AS (
        |  SELECT *, GREATEST(CAST(0 AS BIGINT),
        |      LEAST(unique_tokens, budget - cum_prev)) AS layer_alloc
        |  FROM ralloc),
        |rplan AS (
        |  SELECT config, source, unique_tokens, min(bs) AS bs,
        |    CAST(sum(layer_alloc) AS BIGINT) AS tokens_alloc,
        |    CAST(sum(CASE WHEN layer_alloc = unique_tokens THEN 1
        |      ELSE 0 END) AS BIGINT) AS full_epochs
        |  FROM rla GROUP BY config, source, unique_tokens),
        |rplan2 AS (
        |  SELECT *,
        |    (256 * (tokens_alloc - full_epochs * unique_tokens))
        |      // unique_tokens AS frac_b256
        |  FROM rplan),
        |rbase AS (
        |  SELECT doc_id, lang, CAST(len(ts) AS BIGINT) AS n_tokens
        |  FROM corpus),
        |rrep AS (
        |  SELECT p.config, p.bs, b.doc_id, b.lang AS source, b.n_tokens,
        |    p.full_epochs + CASE WHEN
        |      CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 2))
        |        AS BIGINT) < p.frac_b256 THEN 1 ELSE 0 END AS repeats
        |  FROM rbase b JOIN rplan2 p ON b.lang = p.source),
        |rpasses AS (
        |  SELECT config, bs, source, doc_id, n_tokens,
        |    unnest(range(1, repeats + 1)) AS p
        |  FROM rrep),
        |rinst AS (
        |  SELECT config, bs, source,
        |    p * 10000000 + doc_id AS instance_id, n_tokens
        |  FROM rpasses),
        |rdi AS (
        |  SELECT config, bs, source, instance_id, n_tokens,
        |    row_number() OVER (PARTITION BY config, source
        |      ORDER BY instance_id) AS rn
        |  FROM rinst),
        |rpk(config, bs, source, rn, n_tokens, block, fill) AS (
        |  SELECT config, bs, source, rn, n_tokens, CAST(0 AS BIGINT),
        |    n_tokens
        |  FROM rdi WHERE rn = 1
        |  UNION ALL
        |  SELECT n.config, n.bs, n.source, n.rn, n.n_tokens,
        |    CASE WHEN p.fill + n.n_tokens <= n.bs THEN p.block
        |      ELSE p.block + 1 END,
        |    CASE WHEN p.fill + n.n_tokens <= n.bs
        |      THEN p.fill + n.n_tokens ELSE n.n_tokens END
        |  FROM rpk p JOIN rdi n ON n.config = p.config
        |    AND n.source = p.source AND n.rn = p.rn + 1),
        |rblk AS (
        |  SELECT config, bs, source, block, sum(n_tokens) AS used,
        |    CAST(count(*) AS BIGINT) AS nd
        |  FROM rpk GROUP BY 1, 2, 3, 4),
        |rst AS (
        |  SELECT config, source,
        |    CAST(sum(nd) AS BIGINT) AS doc_passes,
        |    CAST(sum(used) AS BIGINT) AS realized_tokens,
        |    CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(CASE WHEN used > bs THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_overfull,
        |    CAST(sum(CASE WHEN used <= bs THEN bs - used ELSE 0 END)
        |      AS BIGINT) AS padding_tokens,
        |    round(CAST(sum(used) AS DOUBLE)
        |      / CAST(count(*) * bs AS DOUBLE), 6) AS utilization
        |  FROM rblk GROUP BY config, source, bs),
        |rcfgs AS (SELECT '1_raw' AS config
        |          UNION ALL SELECT '2_effective')
        |SELECT c.config, k.bs AS block_size, k.b20 AS budget_20ths,
        |  CAST(1 AS DOUBLE) / k.dd AS delta,
        |  e.source, e.n_docs, e.eff_docs,
        |  COALESCE(p.tokens_alloc, 0) AS tokens_alloc,
        |  COALESCE(p.full_epochs, 0) AS full_epochs,
        |  COALESCE(st.doc_passes, 0) AS doc_passes,
        |  COALESCE(st.realized_tokens, 0) AS realized_tokens,
        |  COALESCE(st.realized_tokens, 0) - COALESCE(p.tokens_alloc, 0)
        |    AS diff_tokens,
        |  COALESCE(st.n_blocks, 0) AS n_blocks,
        |  COALESCE(st.n_overfull, 0) AS n_overfull,
        |  COALESCE(st.padding_tokens, 0) AS padding_tokens,
        |  COALESCE(st.utilization, 0.0) AS utilization
        |FROM rcfgs c CROSS JOIN eff e CROSS JOIN pck k
        |LEFT JOIN rplan2 p ON p.config = c.config AND p.source = e.source
        |LEFT JOIN rst st ON st.config = c.config AND st.source = e.source
        |ORDER BY c.config, e.source""".stripMargin,

    // CDC divisor sweep: shared positional pair hashes, per-divisor
    // boundary flags + running sums, then the per-divisor rollup
    "q193_cdc_divisor_sweep" ->
      s"""WITH $cdcSweepCtes
        |SELECT divisor, CAST(sum(occ) AS BIGINT) AS n_chunks,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(CAST(sum(occ * nt) AS DOUBLE) / CAST(sum(occ) AS DOUBLE), 6)
        |    AS mean_tokens,
        |  CAST(sum((occ - 1) * nt) AS BIGINT) AS dup_token_mass
        |FROM cd_perfp GROUP BY divisor ORDER BY divisor""".stripMargin,

    // content-defined chunking: boundary when the 48-bit md5 of the
    // adjacent token pair ≡ 0 mod 8, chunks via a running boundary sum,
    // then the occurrence histogram over chunk fingerprints
    "q187_cdc_chunk_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, ts FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, list_concat(['XX'], ts) AS ts
        |  FROM base),
        |pos AS (
        |  SELECT doc_id, i, ts[i] AS tok,
        |    CASE WHEN i >= 2 AND
        |        (CAST(('0x' || substr(md5(ts[i-1] || ' ' || ts[i]), 1, 12))
        |           AS BIGINT) % 8 = 0)
        |      THEN 1 ELSE 0 END AS b
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
        |        FROM corpus)),
        |ch AS (
        |  SELECT doc_id, i, tok,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS chunk_idx
        |  FROM pos),
        |chunks AS (
        |  SELECT doc_id, chunk_idx,
        |    md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_fp,
        |    CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM ch GROUP BY doc_id, chunk_idx),
        |per_fp AS (
        |  SELECT chunk_fp, CAST(count(*) AS BIGINT) AS n_occ,
        |    max(n_tokens) AS n_tok
        |  FROM chunks GROUP BY chunk_fp)
        |SELECT n_occ, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum((n_occ - 1) * n_tok) AS BIGINT) AS dup_token_mass
        |FROM per_fp GROUP BY n_occ ORDER BY n_occ""".stripMargin,

    // temperature sweep: counts → per-(alpha, lang) sqrt-composed
    // thresholds → bucket-rule kept counts and per-alpha shares
    "q190_temperature_sweep" ->
      s"""WITH $tempSweepCtes,
        |tm_tot AS (SELECT alpha, sum(n_kept) AS tt FROM tm_kept
        |           GROUP BY alpha)
        |SELECT k.alpha, k.lang AS source, k.n_docs, k.thr, k.n_kept,
        |  round(CAST(k.n_kept AS DOUBLE) / CAST(t.tt AS DOUBLE), 6)
        |    AS kept_share
        |FROM tm_kept k JOIN tm_tot t USING (alpha)
        |ORDER BY k.alpha, source""".stripMargin,

    // first-fit packing audit: the sequential per-shard state machine
    // replayed as a recursive CTE, then the fragmentation rollup
    "q189_firstfit_fragmentation" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |ext AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM toks),
        |d0 AS (
        |  SELECT t.doc_id, t.n_tokens,
        |    CAST((t.doc_id - e.lo)
        |      // greatest(1, (e.hi - e.lo) // 8 + 1) AS BIGINT) AS shard
        |  FROM toks t CROSS JOIN ext e),
        |d AS (
        |  SELECT doc_id, n_tokens, shard,
        |    row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        |  FROM d0),
        |packed(shard, rn, doc_id, n_tokens, block, fill) AS (
        |  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT n.shard, n.rn, n.doc_id, n.n_tokens,
        |    CASE WHEN p.fill + n.n_tokens <= 64 THEN p.block
        |      ELSE p.block + 1 END,
        |    CASE WHEN p.fill + n.n_tokens <= 64 THEN p.fill + n.n_tokens
        |      ELSE n.n_tokens END
        |  FROM packed p JOIN d n ON n.shard = p.shard AND n.rn = p.rn + 1),
        |blocks AS (
        |  SELECT shard, block, sum(n_tokens) AS used,
        |    CAST(count(*) AS BIGINT) AS nd
        |  FROM packed GROUP BY shard, block)
        |SELECT shard, CAST(sum(nd) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(sum(CASE WHEN used > 64 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overfull,
        |  CAST(sum(CASE WHEN used <= 64 THEN 64 - used ELSE 0 END)
        |    AS BIGINT) AS padding_tokens,
        |  CAST(sum(CASE WHEN used > 64 THEN used - 64 ELSE 0 END)
        |    AS BIGINT) AS overflow_tokens,
        |  round(CAST(sum(used) AS DOUBLE)
        |    / CAST(count(*) * 64 AS DOUBLE), 6) AS utilization
        |FROM blocks GROUP BY shard ORDER BY shard""".stripMargin,

    // NB threshold sweep: the q184 scoring chain, integer-floor bins,
    // then per-threshold precision/recall/keep over the bin relation
    "q188_nb_threshold_sweep" ->
      s"""WITH $nbSweepCtes
        |SELECT threshold, n_kept, prec AS "precision",
        |  round(CAST(pos_kept AS DOUBLE) / CAST(pt AS DOUBLE), 6) AS recall,
        |  round(CAST(n_kept AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS keep_frac
        |FROM nb_sweep CROSS JOIN nb_tots ORDER BY threshold""".stripMargin,

    // dedup drain capstone: the q186 closure + argmax keepers, corpus
    // drained, then a SECOND independent closure proving zero residue
    "q192_dedup_drain_capstone" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, ts FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, list_concat(ts, ts[1:2]) AS ts
        |  FROM base),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM corpus),
        |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
        |q AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens FROM corpus),
        |sel AS (
        |  SELECT comp.component, comp.id,
        |    row_number() OVER (PARTITION BY comp.component
        |      ORDER BY q.n_tokens DESC, comp.id ASC) AS rn
        |  FROM comp JOIN q ON q.doc_id = comp.id),
        |dropped AS (SELECT id FROM sel WHERE rn > 1),
        |drained AS (
        |  SELECT c.doc_id, c.ts FROM corpus c
        |  WHERE c.doc_id NOT IN (SELECT id FROM dropped)),
        |sh2 AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ts) - 1),
        |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |      ELSE [array_to_string(ts, ' ')] END AS shingles
        |  FROM drained),
        |sizes2 AS (SELECT doc_id, len(shingles) AS sz FROM sh2),
        |ex2 AS (SELECT doc_id, unnest(shingles) AS s FROM sh2),
        |shared2 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex2 a JOIN ex2 b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs2 AS (
        |  SELECT id_a, id_b FROM shared2
        |  JOIN sizes2 sa ON sa.doc_id = id_a
        |  JOIN sizes2 sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
        |edges2 AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs2
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs2),
        |reach2(id, label) AS (
        |  SELECT src, src FROM edges2
        |  UNION
        |  SELECT e.dst, r.label FROM reach2 r JOIN edges2 e ON e.src = r.id),
        |comp2 AS (SELECT id, min(label) AS component FROM reach2 GROUP BY id),
        |before_row AS (
        |  SELECT '1_before' AS phase,
        |    CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
        |    CAST(count(*) AS BIGINT) AS clustered_docs,
        |    (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_docs
        |  FROM comp),
        |after_row AS (
        |  SELECT '2_after' AS phase,
        |    CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
        |    CAST(count(*) AS BIGINT) AS clustered_docs,
        |    (SELECT CAST(count(*) AS BIGINT) FROM drained) AS n_docs
        |  FROM comp2)
        |SELECT phase, n_clusters, clustered_docs, n_docs FROM before_row
        |UNION ALL
        |SELECT phase, n_clusters, clustered_docs, n_docs FROM after_row
        |ORDER BY phase""".stripMargin,

    // NB calibration audit: the q163 scoring chain replayed, then
    // width-2 integer score bins vs the true label rate
    "q184_nb_calibration_audit" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    source IN ('src0','src1','src2','src3','src4') AS y,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |tokl AS (SELECT y, unnest(ts) AS w FROM toks),
        |cw AS (
        |  SELECT w,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS cp,
        |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS cn
        |  FROM tokl GROUP BY w),
        |tot AS (
        |  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
        |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS nn,
        |    count(DISTINCT w) AS v
        |  FROM tokl),
        |pri AS (
        |  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS dp,
        |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS dn
        |  FROM toks),
        |st AS (SELECT doc_id, unnest(ts) AS w FROM toks),
        |term AS (
        |  SELECT s.doc_id,
        |    CAST(ln((COALESCE(cw.cp, 0) + CAST(1.0 AS DOUBLE))
        |      / (tot.np + CAST(1.0 AS DOUBLE) * tot.v))
        |      AS DECIMAL(18,12))
        |    - CAST(ln((COALESCE(cw.cn, 0) + CAST(1.0 AS DOUBLE))
        |      / (tot.nn + CAST(1.0 AS DOUBLE) * tot.v))
        |      AS DECIMAL(18,12)) AS t
        |  FROM st s LEFT JOIN cw ON s.w = cw.w CROSS JOIN tot),
        |sc AS (SELECT doc_id, SUM(t) AS s FROM term GROUP BY doc_id),
        |fin AS (
        |  SELECT sc.doc_id,
        |    round(CAST(sc.s + CAST(ln(pri.dp) AS DECIMAL(18,12))
        |      - CAST(ln(pri.dn) AS DECIMAL(18,12)) AS DOUBLE), 6) AS score
        |  FROM sc CROSS JOIN pri),
        |b AS (
        |  SELECT CAST(floor(f.score / CAST(2 AS DOUBLE)) AS BIGINT)
        |    AS bin, t.y
        |  FROM fin f JOIN toks t USING (doc_id))
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  round(CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS pos_rate
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    // Morton interleave replayed as integer arithmetic: bit i of each
    // key lifted to curve positions 2i / 2i+1, summed (disjoint bits)
    "q164_zorder_cells" ->
      """WITH k AS (
        |  SELECT o_custkey % 1024 AS ka, o_orderkey % 1024 AS kb
        |  FROM orders),
        |z AS (
        |  SELECT ka, kb,
        |    CAST(list_sum(list_transform(range(0, 10), i ->
        |      ((ka // (CAST(1 AS BIGINT) << i)) % 2)
        |        * (CAST(1 AS BIGINT) << (2 * i))
        |      + ((kb // (CAST(1 AS BIGINT) << i)) % 2)
        |        * (CAST(1 AS BIGINT) << (2 * i + 1)))) AS BIGINT) AS zc
        |  FROM k)
        |SELECT zc // 16384 AS bucket, CAST(count(*) AS BIGINT) AS n,
        |  min(ka) AS min_ka, max(ka) AS max_ka,
        |  min(kb) AS min_kb, max(kb) AS max_kb
        |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin,

    // JL projection replay: the ±1 sign matrix from the same md5
    // parities, both cosine folds in the engine's operand order
    "q165_jl_projected_topk" ->
      """WITH proj AS (
        |  SELECT vec_id,
        |    list_transform(range(0, 16), j ->
        |      list_sum(list_transform(range(1, 65), i ->
        |        CAST(embedding[i] AS DOUBLE) *
        |        (CASE WHEN CAST(('0x' || substr(md5('jl:'
        |             || CAST(i - 1 AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
        |             1, 12)) AS BIGINT) % 2 = 0
        |         THEN 1.0 ELSE -1.0 END))) / sqrt(16.0)) AS pv
        |  FROM embeddings),
        |qp AS (SELECT pv AS qpv FROM proj WHERE vec_id = 2),
        |qe AS (SELECT embedding AS qev FROM embeddings WHERE vec_id = 2),
        |pc AS (
        |  SELECT vec_id,
        |    CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb)
        |         ELSE 0.0 END AS pcos
        |  FROM (
        |    SELECT p.vec_id,
        |      list_sum(list_transform(range(1, 17),
        |        i -> p.pv[i] * q.qpv[i])) AS dot,
        |      sqrt(list_sum(list_transform(range(1, 17),
        |        i -> p.pv[i] * p.pv[i]))) AS na,
        |      sqrt(list_sum(list_transform(range(1, 17),
        |        i -> q.qpv[i] * q.qpv[i]))) AS nb
        |    FROM proj p CROSS JOIN qp q) s0),
        |top AS (SELECT vec_id, pcos FROM pc
        |        ORDER BY pcos DESC, vec_id LIMIT 10),
        |ec AS (
        |  SELECT vec_id,
        |    CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb)
        |         ELSE 0.0 END AS ecos
        |  FROM (
        |    SELECT e.vec_id,
        |      list_sum(list_transform(range(1, 65), i ->
        |        CAST(e.embedding[i] AS DOUBLE) * CAST(q.qev[i] AS DOUBLE)))
        |        AS dot,
        |      sqrt(list_sum(list_transform(range(1, 65), i ->
        |        CAST(e.embedding[i] AS DOUBLE)
        |          * CAST(e.embedding[i] AS DOUBLE)))) AS na,
        |      sqrt(list_sum(list_transform(range(1, 65), i ->
        |        CAST(q.qev[i] AS DOUBLE) * CAST(q.qev[i] AS DOUBLE)))) AS nb
        |    FROM embeddings e CROSS JOIN qe q) s1)
        |SELECT t.vec_id, round(t.pcos, 6) AS pcos, round(ec.ecos, 6) AS ecos
        |FROM top t JOIN ec ON ec.vec_id = t.vec_id
        |ORDER BY pcos DESC, t.vec_id""".stripMargin,

    // PaLM-style fraction rule: shared distinct 8-grams per pair over
    // the bench item's distinct-shingle total, round-6 threshold
    "q166_overlap_fraction" ->
      """WITH bench0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 25),
        |corpus0 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 25
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |    COALESCE(array_to_string(list_filter(string_split(text, ' '),
        |      w -> w <> '')[6:30], ' '), '') AS text
        |  FROM bench0),
        |csh AS (
        |  SELECT DISTINCT doc_id AS corpus_id, sh FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(ts) >= 8
        |        THEN unnest(list_transform(range(1, len(ts) - 6),
        |               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
        |                 || ts[i+3] || ' ' || ts[i+4] || ' ' || ts[i+5]
        |                 || ' ' || ts[i+6] || ' ' || ts[i+7]))
        |        ELSE array_to_string(ts, ' ') END AS sh
        |    FROM (SELECT doc_id,
        |            list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |          FROM corpus0))),
        |bsh AS (
        |  SELECT DISTINCT doc_id AS bench_id, sh FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(ts) >= 8
        |        THEN unnest(list_transform(range(1, len(ts) - 6),
        |               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
        |                 || ts[i+3] || ' ' || ts[i+4] || ' ' || ts[i+5]
        |                 || ' ' || ts[i+6] || ' ' || ts[i+7]))
        |        ELSE array_to_string(ts, ' ') END AS sh
        |    FROM (SELECT doc_id,
        |            list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |          FROM bench0))),
        |tot AS (SELECT bench_id, CAST(count(*) AS BIGINT) AS bench_total
        |        FROM bsh GROUP BY 1),
        |p AS (
        |  SELECT c.corpus_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM csh c JOIN bsh b USING (sh) GROUP BY 1, 2),
        |f AS (
        |  SELECT p.corpus_id, p.bench_id, p.n_shared, tot.bench_total,
        |    round(CAST(p.n_shared AS DOUBLE)
        |      / CAST(tot.bench_total AS DOUBLE), 6) AS overlap_frac
        |  FROM p JOIN tot USING (bench_id))
        |SELECT corpus_id, bench_id, n_shared, bench_total, overlap_frac
        |FROM f WHERE overlap_frac >= 0.3
        |ORDER BY corpus_id, bench_id""".stripMargin,

    // capstone: the q162 cut replay -> q163 NB replay on the surviving
    // clean text -> q159's per-group rank gate, chained
    "q167_curation_pipeline3" ->
      """WITH corpus AS (
        |  SELECT doc_id, lang, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, lang, source,
        |    COALESCE(array_to_string(list_filter(string_split(text, ' '),
        |      w -> w <> '')[11:40], ' '), '') AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(ts[i:i+7], ' ') AS sh
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS i
        |        FROM toks WHERE len(ts) >= 8)),
        |m AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib, a.pos AS pa, b.pos AS pb
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id),
        |isl AS (
        |  SELECT ia, ib, pa - pb AS diag, pa, pb,
        |    pa - row_number() OVER (PARTITION BY ia, ib, pa - pb
        |                            ORDER BY pa) AS grp
        |  FROM m),
        |spans AS (
        |  SELECT ib AS doc_id,
        |    CAST(min(pb) AS BIGINT) AS start_b,
        |    CAST(count(*) + 7 AS BIGINT) AS span_tokens
        |  FROM isl GROUP BY ia, ib, diag, grp
        |  HAVING count(*) + 7 >= 20),
        |ctokp AS (
        |  SELECT doc_id, i - 1 AS pos, ts[i] AS tok
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
        |        FROM toks)),
        |keptt AS (
        |  SELECT t.doc_id, t.pos, t.tok FROM ctokp t
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM spans s WHERE s.doc_id = t.doc_id
        |      AND t.pos >= s.start_b
        |      AND t.pos < s.start_b + s.span_tokens)),
        |agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |    CAST(count(*) AS BIGINT) AS kept
        |  FROM keptt GROUP BY doc_id),
        |surv AS (
        |  SELECT c.doc_id, c.lang, c.source,
        |    (c.source IN ('src0','src1','src2','src3','src4')) AS y,
        |    list_filter(string_split(a.clean_text, ' '), w -> w <> '') AS ts
        |  FROM corpus c JOIN agg a ON a.doc_id = c.doc_id
        |  WHERE a.kept >= 20),
        |tokl AS (SELECT y, unnest(ts) AS w FROM surv),
        |cw AS (
        |  SELECT w,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS cp,
        |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS cn
        |  FROM tokl GROUP BY w),
        |tot AS (
        |  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
        |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS nn,
        |    count(DISTINCT w) AS v
        |  FROM tokl),
        |pri AS (
        |  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS dp,
        |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS dn
        |  FROM surv),
        |st AS (SELECT doc_id, unnest(ts) AS w FROM surv),
        |term AS (
        |  SELECT s.doc_id,
        |    CAST(ln((COALESCE(cw.cp, 0) + CAST(1.0 AS DOUBLE))
        |      / (tot.np + CAST(1.0 AS DOUBLE) * tot.v))
        |      AS DECIMAL(18,12))
        |    - CAST(ln((COALESCE(cw.cn, 0) + CAST(1.0 AS DOUBLE))
        |      / (tot.nn + CAST(1.0 AS DOUBLE) * tot.v))
        |      AS DECIMAL(18,12)) AS t
        |  FROM st s LEFT JOIN cw ON s.w = cw.w CROSS JOIN tot),
        |sc AS (SELECT doc_id, SUM(t) AS s FROM term GROUP BY doc_id),
        |fin AS (
        |  SELECT sc.doc_id, sv.lang,
        |    round(CAST(sc.s + CAST(ln(pri.dp) AS DECIMAL(18,12))
        |      - CAST(ln(pri.dn) AS DECIMAL(18,12)) AS DOUBLE), 6) AS score
        |  FROM sc JOIN surv sv ON sv.doc_id = sc.doc_id CROSS JOIN pri),
        |g AS (SELECT lang, CAST(floor(0.25 * count(*)) AS BIGINT) AS k
        |      FROM fin GROUP BY lang),
        |r AS (SELECT fin.*, row_number()
        |        OVER (PARTITION BY lang ORDER BY score, doc_id) AS rn
        |      FROM fin)
        |SELECT r.lang, CAST(count(*) AS BIGINT) AS n_kept,
        |  min(r.doc_id) AS min_id
        |FROM r JOIN g USING (lang) WHERE r.rn > g.k
        |GROUP BY r.lang ORDER BY r.lang""".stripMargin,

    // the MG funnel provably equals the direct answer when
    // minFrac > 1/(k+1): the oracle IS the plain GROUP BY / HAVING
    "q168_mg_heavy_hitters" ->
      """WITH stream AS (
        |  SELECT unnest([event_type, 'u' || CAST(user_id AS VARCHAR)]) AS v
        |  FROM events),
        |nn AS (SELECT count(*) AS n FROM stream)
        |SELECT v, CAST(count(*) AS BIGINT) AS exact_n
        |FROM stream, nn GROUP BY v, nn.n
        |HAVING count(*) >= ceil(0.05 * nn.n)
        |ORDER BY v""".stripMargin,

    // batch IVF vs exact: q45's assignment, per-QUERY cell ranking
    // (sim desc, cell asc), both per-query top-10s, intersection
    // IVF nprobe sweep: q169's replay with the probe rank kept, a
    // 4-point ladder re-ranking top-10 from the shared candidate set
    "q194_ivf_nprobe_sweep" ->
      s"""WITH $ivfSweepCtes
        |SELECT nprobe, n_hits, recall, n_scanned
        |FROM ip_sweep ORDER BY nprobe""".stripMargin,

    "q169_ivf_recall_audit" ->
      """WITH cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS c
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
        |qs AS (SELECT vec_id AS qid, embedding AS qv
        |       FROM embeddings WHERE vec_id < 8),
        |assigned AS (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell DESC) AS rn
        |  FROM (
        |    SELECT e.vec_id, e.embedding, c.cell,
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(c.c) + 1),
        |           i -> CAST(c.c[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE))))) AS sim
        |    FROM embeddings e CROSS JOIN cents c)),
        |routing AS (
        |  SELECT qid, cell FROM (
        |    SELECT qid, cell,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY csim DESC, cell ASC) AS crk
        |    FROM (
        |      SELECT q.qid, c.cell,
        |        list_sum(list_transform(range(1, len(c.c) + 1),
        |          i -> CAST(c.c[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(range(1, len(c.c) + 1),
        |             i -> CAST(c.c[i] AS DOUBLE) * CAST(c.c[i] AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
        |             i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
        |          AS csim
        |      FROM qs q CROSS JOIN cents c) s0)
        |  WHERE crk <= 4),
        |ivf AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, vec_id ASC) AS rk
        |    FROM (
        |      SELECT r.qid, a.vec_id,
        |        list_sum(list_transform(range(1, len(a.embedding) + 1),
        |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |             i -> CAST(a.embedding[i] AS DOUBLE)
        |                  * CAST(a.embedding[i] AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
        |             i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
        |          AS cos
        |      FROM assigned a
        |      JOIN routing r ON a.cell = r.cell AND a.rn = 1
        |      JOIN qs q ON q.qid = r.qid) s1)
        |  WHERE rk <= 10),
        |ex AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, vec_id ASC) AS rk
        |    FROM (
        |      SELECT q.qid, e.vec_id,
        |        list_sum(list_transform(range(1, len(e.embedding) + 1),
        |          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |             i -> CAST(e.embedding[i] AS DOUBLE)
        |                  * CAST(e.embedding[i] AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
        |             i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
        |          AS cos
        |      FROM embeddings e CROSS JOIN qs q) s2)
        |  WHERE rk <= 10),
        |hits AS (
        |  SELECT e.qid, CAST(count(*) AS BIGINT) AS n_hits
        |  FROM ex e JOIN ivf USING (qid, vec_id) GROUP BY e.qid)
        |SELECT qs.qid, COALESCE(h.n_hits, 0) AS n_hits,
        |  round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10.0, 6) AS recall
        |FROM qs LEFT JOIN hits h ON h.qid = qs.qid
        |ORDER BY qs.qid""".stripMargin,

    // KMV replay: the k smallest DISTINCT 48-bit hashes per language
    // (set semantics, so distinct-on-hash), exact below k, the folded
    // (k-1)*2^48 constant over the k-th smallest at k
    "q170_kmv_distinct" ->
      """WITH toks AS (
        |  SELECT lang, list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |big AS (
        |  SELECT lang, ts[i] || ' ' || ts[i + 1] AS v
        |  FROM (SELECT lang, ts, unnest(range(1, len(ts))) AS i
        |        FROM toks WHERE len(ts) >= 2)),
        |h AS (
        |  SELECT DISTINCT lang,
        |    CAST(('0x' || substr(md5(v), 1, 12)) AS BIGINT) AS hv
        |  FROM big),
        |sk AS (
        |  SELECT lang, list_sort(list(hv))[1:64] AS kmv,
        |    count(*) AS nd
        |  FROM h GROUP BY lang),
        |ex AS (
        |  SELECT lang, CAST(count(DISTINCT v) AS BIGINT) AS exact_distinct
        |  FROM big GROUP BY lang)
        |SELECT sk.lang, CAST(least(sk.nd, 64) AS BIGINT) AS n_hashes,
        |  CASE WHEN sk.nd < 64 THEN CAST(sk.nd AS DOUBLE)
        |       ELSE round(17732923532771328.0 / CAST(kmv[64] AS DOUBLE), 6)
        |  END AS est_distinct,
        |  ex.exact_distinct
        |FROM sk JOIN ex USING (lang) ORDER BY sk.lang""".stripMargin,

    // curriculum positions: the q149 tier replay, then the GLOBAL
    // window the distributed operator avoids — row_number over
    // (stage, md5 shuffle hash, id), 0-based
    "q171_curriculum_order" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |ref AS (SELECT ts FROM toks
        |  WHERE source IN ('src0','src1','src2','src3','src4')),
        |rbig AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
        |        FROM ref WHERE len(ts) >= 2)),
        |cu AS (SELECT w1, count(*) AS cu FROM rbig GROUP BY w1),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM rbig GROUP BY w1, w2),
        |v AS (SELECT count(DISTINCT w) AS v
        |      FROM (SELECT unnest(ts) AS w FROM ref)),
        |big AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
        |        FROM toks WHERE len(ts) >= 2)),
        |scored AS (
        |  SELECT b.doc_id,
        |    round(CAST(SUM(CAST(ln((COALESCE(cb.cb, 0) + CAST(0.4 AS DOUBLE))
        |        / (COALESCE(cu.cu, 0) + CAST(0.4 AS DOUBLE) * v.v))
        |      AS DECIMAL(18,12))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE), 6) AS avg_logprob
        |  FROM big b
        |  LEFT JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
        |  LEFT JOIN cu ON b.w1 = cu.w1
        |  CROSS JOIN v GROUP BY b.doc_id),
        |staged AS (
        |  SELECT s.doc_id,
        |    CAST(ntile(3) OVER (PARTITION BY d.lang
        |      ORDER BY s.avg_logprob DESC, s.doc_id) AS BIGINT) AS bucket
        |  FROM scored s JOIN documents d USING (doc_id))
        |SELECT CAST(row_number() OVER (ORDER BY bucket,
        |    md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
        |    AS position,
        |  doc_id, bucket
        |FROM staged ORDER BY position""".stripMargin,

    // full-outer fingerprint diff: presence decides added/removed,
    // null-safe fingerprint equality decides changed/unchanged
    "q172_snapshot_diff" ->
      """WITH oldf AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fo
        |  FROM documents),
        |neu0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' edited v2'
        |         WHEN doc_id = 2 THEN '  ' || text || '   '
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text
        |  FROM documents WHERE doc_id % 11 = 0),
        |neuf AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fn
        |  FROM neu0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fo IS NOT DISTINCT FROM n.fn THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM oldf o FULL OUTER JOIN neuf n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // the q172 diff replay filtered to the delta, then the q27 quality
    // rules over ONLY that worklist (left join: token-less docs stay
    // counted, never admitted)
    "q173_incremental_worklist" ->
      s"""WITH oldf AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fo
         |  FROM documents),
         |neu0 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' edited v2'
         |         ELSE text END AS text
         |  FROM documents WHERE doc_id % 13 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text
         |  FROM documents WHERE doc_id % 11 = 0),
         |neuf AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fn
         |  FROM neu0),
         |diff AS (
         |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |    CASE WHEN o.doc_id IS NULL THEN 'added'
         |         WHEN n.doc_id IS NULL THEN 'removed'
         |         WHEN o.fo IS NOT DISTINCT FROM n.fn THEN 'unchanged'
         |         ELSE 'changed' END AS status
         |  FROM oldf o FULL OUTER JOIN neuf n ON o.doc_id = n.doc_id),
         |work AS (
         |  SELECT nu.doc_id, nu.text, d.status
         |  FROM neu0 nu JOIN diff d USING (doc_id)
         |  WHERE d.status IN ('added', 'changed')),
         |w AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    CAST(count(CASE WHEN lower(word) IN $stop THEN 1 END) AS BIGINT)
         |      AS n_stop
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM work)
         |  WHERE word <> '' GROUP BY doc_id),
         |adm AS (
         |  SELECT work.doc_id, work.status,
         |    (COALESCE(w.n_tokens, 0) >= 30 AND
         |     CAST(COALESCE(w.n_stop, 0) AS DOUBLE)
         |       / CAST(COALESCE(w.n_tokens, 1) AS DOUBLE) >= 0.04) AS admit
         |  FROM work LEFT JOIN w USING (doc_id))
         |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN admit THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_admitted,
         |  min(doc_id) AS min_id
         |FROM adm GROUP BY status ORDER BY status""".stripMargin,

    // the q28 argmax replay crossed with the labeled lang column:
    // per-(label, prediction) counts, label totals, round-6 fractions
    "q174_langid_confusion" ->
      s"""WITH w2 AS (
         |  SELECT doc_id, lower(word) AS word
         |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
         |        FROM documents)
         |  WHERE word <> ''),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(count(CASE WHEN word IN ('der','die','das','und','ist','nicht') THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS s_de,
         |    CAST(count(CASE WHEN word IN $stop THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS s_en,
         |    CAST(count(CASE WHEN word IN ('el','la','de','que','y','los') THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS s_es,
         |    CAST(count(CASE WHEN word IN ('le','la','les','et','des','une') THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS s_fr
         |  FROM w2 GROUP BY doc_id),
         |pred AS (
         |  SELECT doc_id,
         |    CASE WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
         |         WHEN s_es > greatest(s_de, s_en) THEN 'es'
         |         WHEN s_en > s_de THEN 'en'
         |         ELSE 'de' END AS pred_lang
         |  FROM sc),
         |lab AS (
         |  SELECT d.lang AS label, p.pred_lang
         |  FROM documents d JOIN pred p USING (doc_id)),
         |cm AS (
         |  SELECT label, pred_lang, CAST(count(*) AS BIGINT) AS n
         |  FROM lab GROUP BY 1, 2),
         |tot AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS label_total
         |  FROM lab GROUP BY 1)
         |SELECT cm.label, cm.pred_lang, cm.n, tot.label_total,
         |  round(CAST(cm.n AS DOUBLE) / CAST(tot.label_total AS DOUBLE), 6)
         |    AS frac
         |FROM cm JOIN tot USING (label)
         |ORDER BY cm.label, cm.pred_lang""".stripMargin,

    // manifest capstone: q140's mix replay -> the q27 stage rule ->
    // the q171 global-order window (seed 11) -> running-sum offsets
    // and q76's block arithmetic, all chained
    "q175_training_manifest" ->
      s"""WITH cnt AS (
         |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM documents
         |  GROUP BY lang),
         |m AS (SELECT min(c) AS mc FROM cnt),
         |thr AS (
         |  SELECT lang, CAST(floor(256 * sqrt(mc / c)) AS INTEGER) AS th
         |  FROM cnt, m),
         |kept AS (
         |  SELECT d.doc_id, d.text
         |  FROM documents d JOIN thr USING (lang)
         |  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2))
         |        AS INTEGER) < th),
         |w AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    CAST(count(CASE WHEN lower(word) IN $stop THEN 1 END) AS BIGINT)
         |      AS n_stop
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM kept)
         |  WHERE word <> '' GROUP BY doc_id),
         |staged AS (
         |  SELECT k.doc_id,
         |    CASE WHEN COALESCE(w.n_tokens, 0) >= 30 AND
         |      CAST(COALESCE(w.n_stop, 0) AS DOUBLE)
         |        / CAST(COALESCE(w.n_tokens, 1) AS DOUBLE) >= 0.04
         |      THEN 1 ELSE 2 END AS stage,
         |    CAST(COALESCE(w.n_tokens, 0) AS BIGINT) AS n_tokens
         |  FROM kept k LEFT JOIN w USING (doc_id)),
         |ordered AS (
         |  SELECT CAST(row_number() OVER (ORDER BY stage,
         |      md5('11:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
         |      AS position,
         |    doc_id, CAST(stage AS BIGINT) AS stage, n_tokens
         |  FROM staged),
         |offs AS (
         |  SELECT *,
         |    CAST(SUM(n_tokens) OVER (ORDER BY position
         |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS so
         |  FROM ordered)
         |SELECT position, doc_id, stage, n_tokens, so AS "offset",
         |  CAST(floor(so / 512.0) AS BIGINT) AS first_block,
         |  CASE WHEN n_tokens > 0
         |    THEN CAST(floor((so + n_tokens - 1) / 512.0)
         |      - floor(so / 512.0) + 1 AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS n_blocks
         |FROM offs ORDER BY position""".stripMargin,

    // edit triage: the diff replay restricted to CHANGED ids (both
    // present, fingerprints differ), then per-id 3-shingle Jaccard
    // between the old and new text
    "q176_edit_magnitude" ->
      """WITH oldt AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM documents),
        |neu0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' edited v2'
        |         WHEN doc_id % 17 = 0 THEN COALESCE(array_to_string(
        |           list_transform(range(1, len(ts) + 1),
        |             i -> ts[len(ts) - i + 1]), ' '), '')
        |         ELSE text END AS text
        |  FROM oldt WHERE doc_id % 13 <> 0),
        |ofp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fo
        |  FROM documents),
        |nfp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fn
        |  FROM neu0),
        |chg AS (
        |  SELECT o.doc_id FROM ofp o JOIN nfp n USING (doc_id)
        |  WHERE NOT (o.fo IS NOT DISTINCT FROM n.fn)),
        |osh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT t.doc_id,
        |      CASE WHEN len(t.ts) >= 3
        |        THEN unnest(list_transform(range(1, len(t.ts) - 1),
        |               i -> t.ts[i] || ' ' || t.ts[i+1] || ' ' || t.ts[i+2]))
        |        ELSE array_to_string(t.ts, ' ') END AS sh
        |    FROM oldt t JOIN chg USING (doc_id))),
        |nsh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT n.doc_id,
        |      CASE WHEN len(ts) >= 3
        |        THEN unnest(list_transform(range(1, len(ts) - 1),
        |               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
        |        ELSE array_to_string(ts, ' ') END AS sh
        |    FROM (SELECT nu.doc_id,
        |            list_filter(string_split(nu.text, ' '), w -> w <> '') AS ts
        |          FROM neu0 nu JOIN chg USING (doc_id)) n)),
        |no_ AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_old
        |        FROM osh GROUP BY 1),
        |nn_ AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new
        |        FROM nsh GROUP BY 1),
        |ns AS (
        |  SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM osh o JOIN nsh n USING (doc_id, sh) GROUP BY 1),
        |j AS (
        |  SELECT no_.doc_id, no_.n_old, nn_.n_new,
        |    COALESCE(ns.n_shared, 0) AS n_shared,
        |    round(CAST(COALESCE(ns.n_shared, 0) AS DOUBLE)
        |      / CAST(no_.n_old + nn_.n_new - COALESCE(ns.n_shared, 0)
        |        AS DOUBLE), 6) AS jaccard
        |  FROM no_ JOIN nn_ USING (doc_id)
        |  LEFT JOIN ns USING (doc_id))
        |SELECT doc_id, n_old, n_new, n_shared, jaccard,
        |  CASE WHEN jaccard >= 0.5 THEN 'minor_edit' ELSE 'rewrite' END
        |    AS edit_class
        |FROM j ORDER BY doc_id""".stripMargin,

    // LSH recall audit: full band-key replay (string_agg over the j-th
    // signature slice == the Spark concat_ws band key), candidates from
    // the band self-join, recall per exact-Jaccard decile
    // near-dup threshold sweep: the shared audit-corpus exact pairs at
    // the 0.3 floor, then per-ladder-point counts/docs/mean jaccard
    "q191_neardup_threshold_sweep" ->
      s"""WITH $minhashAuditCtes,
        |$ndSweepCtes,
        |nd_dt AS (
        |  SELECT threshold, CAST(count(DISTINCT id) AS BIGINT) AS n_docs
        |  FROM (SELECT threshold, id_a AS id FROM nd_q
        |        UNION ALL SELECT threshold, id_b AS id FROM nd_q)
        |  GROUP BY threshold)
        |SELECT s.threshold, s.n_pairs,
        |  coalesce(d.n_docs, 0) AS n_docs, s.mean_jaccard
        |FROM nd_sweep s LEFT JOIN nd_dt d USING (threshold)
        |ORDER BY threshold""".stripMargin,

    // LSH banding sweep: shared signatures, per-config band regrouping,
    // candidate volume + true-pair recall per (bands x rows) split
    "q195_lsh_band_sweep" ->
      s"""WITH $minhashAuditCtes,
        |$lshSweepCtes
        |SELECT bands, rows_per_band, n_candidates, n_found, recall
        |FROM lb_sweep ORDER BY bands""".stripMargin,

    "q177_lsh_recall_audit" ->
      s"""WITH $minhashAuditCtes,
        |bands AS (
        |  SELECT doc_id, j // 4 AS band_id,
        |    string_agg(CAST(m AS VARCHAR), '_' ORDER BY j) AS key
        |  FROM sig GROUP BY doc_id, j // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a
        |  JOIN bands b ON a.band_id = b.band_id AND a.key = b.key
        |    AND a.doc_id < b.doc_id),
        |banded AS (
        |  SELECT least(CAST(floor(jaccard * 10) AS BIGINT), 9) AS j_band,
        |    id_a, id_b,
        |    CASE WHEN EXISTS (SELECT 1 FROM cand c
        |      WHERE c.id_a = exact.id_a AND c.id_b = exact.id_b)
        |      THEN 1 ELSE 0 END AS found
        |  FROM exact)
        |SELECT j_band, CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(sum(found) AS BIGINT) AS n_found,
        |  round(CAST(sum(found) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS recall
        |FROM banded GROUP BY j_band ORDER BY j_band""".stripMargin,

    // hyperplane-LSH recall audit: rotated-variant corpus, sign-bucket
    // replay against the inlined plane constants, cosine via the q61
    // ordered-fold form, recall per cosine decile
    "q178_hyperplane_recall_audit" -> {
      val planeRows = (0 until 4).map { p =>
        val vals = graft.operators.Dedup.planeVectorValues(p, 64)
          .map(_.toString).mkString(", ")
        s"($p, [$vals])"
      }.mkString(",\n        |    ")
      s"""WITH base AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |withn AS (
        |  SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
        |      AS normv,
        |    CAST(vec_id % 5 AS DOUBLE) / CAST(5 AS DOUBLE) AS t
        |  FROM base),
        |variant AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |    list_transform(range(1, 65), i ->
        |      (CAST(1 AS DOUBLE) - t) * v[i] + t * normv *
        |        (CASE WHEN (i - 1) % 2 = 0 THEN CAST(1 AS DOUBLE)
        |              ELSE CAST(-1 AS DOUBLE) END) / CAST(8 AS DOUBLE))
        |      AS v
        |  FROM withn),
        |corpus AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL SELECT vec_id, v FROM variant),
        |planes(p, w) AS (
        |  VALUES $planeRows),
        |buck AS (
        |  SELECT c.vec_id,
        |    CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65),
        |      i -> c.v[i] * p.w[i])) >= 0
        |      THEN CAST(1 AS BIGINT) << p.p ELSE 0 END) AS BIGINT)
        |      AS bucket
        |  FROM corpus c CROSS JOIN planes p GROUP BY c.vec_id),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb,
        |    ba.bucket AS ba, bb.bucket AS bb
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |  JOIN buck ba ON ba.vec_id = a.vec_id
        |  JOIN buck bb ON bb.vec_id = b.vec_id),
        |scored AS (
        |  SELECT id_a, id_b, ba, bb,
        |    list_sum(list_transform(range(1, 65), i -> va[i] * vb[i]))
        |      AS dot,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> va[i] * va[i])))
        |      AS na,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> vb[i] * vb[i])))
        |      AS nb
        |  FROM pairs),
        |cos AS (
        |  SELECT id_a, id_b,
        |    CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb)
        |         ELSE CAST(0 AS DOUBLE) END AS cosine,
        |    CASE WHEN ba = bb THEN 1 ELSE 0 END AS found
        |  FROM scored
        |  WHERE CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb)
        |        ELSE CAST(0 AS DOUBLE) END >= 0.4)
        |SELECT least(CAST(floor(cosine * 10) AS BIGINT), 9) AS c_band,
        |  CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(sum(found) AS BIGINT) AS n_found,
        |  round(CAST(sum(found) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS recall
        |FROM cos GROUP BY c_band ORDER BY c_band""".stripMargin
    },

    // signature-fidelity audit: per true near-dup pair, the matching
    // fraction of the 32 replayed signature components vs exact Jaccard
    "q179_minhash_fidelity_audit" ->
      s"""WITH $minhashAuditCtes,
        |sigl AS (
        |  SELECT doc_id, list(m ORDER BY j) AS sig FROM sig GROUP BY doc_id)
        |SELECT e.id_a, e.id_b, round(e.jaccard, 6) AS j_exact,
        |  CAST(list_sum(list_transform(range(1, 33),
        |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
        |    AS BIGINT) AS matches,
        |  round(CAST(list_sum(list_transform(range(1, 33),
        |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
        |    AS DOUBLE) / 32.0, 6) AS j_est,
        |  round(abs(CAST(list_sum(list_transform(range(1, 33),
        |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
        |    AS DOUBLE) / 32.0 - e.jaccard), 6) AS abs_err
        |FROM exact e
        |JOIN sigl sa ON sa.doc_id = e.id_a
        |JOIN sigl sb ON sb.doc_id = e.id_b
        |ORDER BY e.id_a, e.id_b""".stripMargin,

    // hot-shingle-cap loss audit: both span variants replayed (q150's
    // gaps-and-islands machinery, string-joined shingles), the capped
    // one through the same HAVING freq <= 64 rule, then the aggregate
    // deltas
    "q183_span_cap_audit" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |corpus AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN text || ' terms of use copyright notice all rights' ||
        |           ' reserved contact us page footer'
        |      ELSE text END AS text
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    array_to_string(list_filter(string_split(text, ' '),
        |      w -> w <> '')[11:40], ' ') AS text
        |  FROM base WHERE doc_id % 10 = 0),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ts
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(ts[i:i+7], ' ') AS sh
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS i
        |        FROM toks WHERE len(ts) >= 8)),
        |ok AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 64),
        |shc AS (SELECT s.doc_id, s.pos, s.sh FROM sh s JOIN ok USING (sh)),
        |mu AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib, a.pos AS pa, b.pos AS pb
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id),
        |iu AS (
        |  SELECT ia, ib, pa - pb AS diag, pa, pb,
        |    pa - row_number() OVER (PARTITION BY ia, ib, pa - pb
        |                            ORDER BY pa) AS grp
        |  FROM mu),
        |su AS (
        |  SELECT ia AS id_a, ib AS id_b, count(*) + 7 AS span_tokens
        |  FROM iu GROUP BY ia, ib, diag, grp
        |  HAVING count(*) + 7 >= 12),
        |mc AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib, a.pos AS pa, b.pos AS pb
        |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id),
        |ic AS (
        |  SELECT ia, ib, pa - pb AS diag, pa, pb,
        |    pa - row_number() OVER (PARTITION BY ia, ib, pa - pb
        |                            ORDER BY pa) AS grp
        |  FROM mc),
        |sc AS (
        |  SELECT ia AS id_a, ib AS id_b, count(*) + 7 AS span_tokens
        |  FROM ic GROUP BY ia, ib, diag, grp
        |  HAVING count(*) + 7 >= 12),
        |pu AS (SELECT id_a, id_b, count(*) AS ns, sum(span_tokens) AS st
        |       FROM su GROUP BY id_a, id_b),
        |au AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(ns) AS BIGINT) AS n_spans,
        |         CAST(sum(st) AS BIGINT) AS span_tokens FROM pu),
        |pc AS (SELECT id_a, id_b, count(*) AS ns, sum(span_tokens) AS st
        |       FROM sc GROUP BY id_a, id_b),
        |ac AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(ns) AS BIGINT) AS n_spans,
        |         CAST(sum(st) AS BIGINT) AS span_tokens FROM pc)
        |SELECT 'capped' AS variant, n_pairs, n_spans, span_tokens FROM ac
        |UNION ALL
        |SELECT 'lost', u.n_pairs - c.n_pairs, u.n_spans - c.n_spans,
        |  u.span_tokens - c.span_tokens
        |FROM au u, ac c
        |UNION ALL
        |SELECT 'uncapped', n_pairs, n_spans, span_tokens FROM au
        |ORDER BY variant""".stripMargin,

    // mixture-realization audit: replay the q140 mix (counts, sqrt
    // threshold, md5 buckets), then realized doc/token shares vs the
    // keep-rate-implied target shares
    "q182_mixture_realization_audit" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |cnt AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM base
        |  GROUP BY lang),
        |m AS (SELECT min(c) AS mc FROM cnt),
        |thr AS (
        |  SELECT lang, c, floor(256.0 * sqrt(mc / c)) AS th FROM cnt, m),
        |w AS (
        |  SELECT lang, c * CAST(th AS DOUBLE) / CAST(256 AS DOUBLE) AS w
        |  FROM thr),
        |totw AS (
        |  SELECT CAST(sum(CAST(w AS DECIMAL(28,12))) AS DOUBLE) AS tot_w
        |  FROM w),
        |kept AS (
        |  SELECT b.lang, b.n_tokens
        |  FROM base b JOIN thr USING (lang)
        |  WHERE CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 2))
        |          AS INTEGER) < CAST(th AS INTEGER)),
        |ka AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
        |    CAST(sum(n_tokens) AS BIGINT) AS tok_kept
        |  FROM kept GROUP BY lang),
        |tk AS (
        |  SELECT CAST(sum(n_kept) AS BIGINT) AS tot_docs,
        |    CAST(sum(tok_kept) AS BIGINT) AS tot_toks
        |  FROM ka),
        |orig AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_orig FROM base
        |  GROUP BY lang)
        |SELECT o.lang, o.n_orig,
        |  COALESCE(ka.n_kept, 0) AS n_kept,
        |  COALESCE(ka.tok_kept, 0) AS tok_kept,
        |  round(CAST(COALESCE(ka.n_kept, 0) AS DOUBLE)
        |    / CAST(tk.tot_docs AS DOUBLE), 6) AS doc_share,
        |  round(CAST(COALESCE(ka.tok_kept, 0) AS DOUBLE)
        |    / CAST(tk.tot_toks AS DOUBLE), 6) AS tok_share,
        |  round(w.w / tw.tot_w, 6) AS target_share,
        |  round(abs(CAST(COALESCE(ka.n_kept, 0) AS DOUBLE)
        |    / CAST(tk.tot_docs AS DOUBLE) - w.w / tw.tot_w), 6) AS doc_err
        |FROM orig o
        |LEFT JOIN ka USING (lang)
        |JOIN w USING (lang)
        |CROSS JOIN totw tw CROSS JOIN tk
        |ORDER BY o.lang""".stripMargin,

    // PCA invariant audit: the invariant rows are literal 0.0/1.0 (their
    // values are provable, not replayed); total_ss / axes_energy_rel /
    // n_rows / n_dims are re-derived through the exact decimal sums
    "q181_pca_invariant_audit" ->
      """WITH ex AS (
        |  SELECT vec_id, i AS d, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM (SELECT vec_id, embedding,
        |        unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
        |means AS (
        |  SELECT d, CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean
        |  FROM ex GROUP BY d),
        |en AS (
        |  SELECT d, sum(CAST((x - mean) * (x - mean) AS DECIMAL(38,12))) AS e
        |  FROM ex JOIN means USING (d) GROUP BY d),
        |tot AS (SELECT sum(e) AS total FROM en),
        |top2 AS (
        |  SELECT sum(e) AS e2
        |  FROM (SELECT e FROM en ORDER BY e DESC LIMIT 2)),
        |nn AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(max(len(embedding)) AS DOUBLE) AS nd
        |  FROM embeddings)
        |SELECT metric, value FROM (
        |  SELECT 'axes_energy_rel' AS metric,
        |    (SELECT round(CAST(t2.e2 AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
        |     FROM top2 t2, tot t) AS value
        |  UNION ALL SELECT 'contraction_violations', CAST(0 AS DOUBLE)
        |  UNION ALL SELECT 'energy_defect_rel', CAST(0 AS DOUBLE)
        |  UNION ALL SELECT 'n_dims', (SELECT nd FROM nn)
        |  UNION ALL SELECT 'n_rows', (SELECT n FROM nn)
        |  UNION ALL SELECT 'pca_ge_axes', CAST(1 AS DOUBLE)
        |  UNION ALL SELECT 'score_cross_corr', CAST(0 AS DOUBLE)
        |  UNION ALL SELECT 'total_ss',
        |    (SELECT round(CAST(total AS DOUBLE), 6) FROM tot)
        |  UNION ALL SELECT 'v1_norm_defect', CAST(0 AS DOUBLE)
        |  UNION ALL SELECT 'v2_norm_defect', CAST(0 AS DOUBLE)
        |  UNION ALL SELECT 'v_orthogonality', CAST(0 AS DOUBLE))
        |ORDER BY metric""".stripMargin,

    // portable-HLL replay: registers from the same 48-bit md5 integers
    // (top 6 bits route, max-rho over the low 42), the EXACT fixed-point
    // harmonic sum, the alpha_64 estimator with linear-counting
    // correction, against the exact distinct — branch chain generated
    // identically to the Spark when-chain
    "q180_hll_audit" -> {
      val w = 42
      val rhoChain = (1 to w).map(g =>
        s"WHEN rest >= ${1L << (w - g)} THEN $g").mkString("\n        |      ")
      s"""WITH h AS (
        |  SELECT event_type,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
        |      AS BIGINT) AS h
        |  FROM events),
        |r AS (
        |  SELECT event_type, h >> 42 AS reg, h & 4398046511103 AS rest
        |  FROM h),
        |rho AS (
        |  SELECT event_type, reg,
        |    max(CASE $rhoChain ELSE 43 END) AS rho
        |  FROM r GROUP BY event_type, reg),
        |agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS present,
        |    CAST(sum(CAST(1 AS BIGINT) << (43 - rho)) AS BIGINT)
        |      AS sum_present
        |  FROM rho GROUP BY event_type),
        |est AS (
        |  SELECT event_type, 64 - present AS n_zero,
        |    sum_present + (64 - present) * CAST(8796093022208 AS BIGINT)
        |      AS sum_fp
        |  FROM agg),
        |est2 AS (
        |  SELECT event_type, n_zero, sum_fp,
        |    CAST(0.709 AS DOUBLE) * CAST(64 AS DOUBLE) * CAST(64 AS DOUBLE)
        |      * CAST(8796093022208 AS DOUBLE) / CAST(sum_fp AS DOUBLE)
        |      AS raw
        |  FROM est),
        |fin AS (
        |  SELECT event_type, CAST(n_zero AS BIGINT) AS n_zero, sum_fp,
        |    round(CASE WHEN raw <= CAST(160 AS DOUBLE) AND n_zero > 0
        |      THEN CAST(64 AS DOUBLE)
        |        * ln(CAST(64 AS DOUBLE) / CAST(n_zero AS DOUBLE))
        |      ELSE raw END, 6) AS est_distinct
        |  FROM est2),
        |ex AS (
        |  SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |  FROM events GROUP BY event_type)
        |SELECT f.event_type, f.n_zero, f.sum_fp, f.est_distinct,
        |  ex.exact_distinct,
        |  round(abs(f.est_distinct - CAST(ex.exact_distinct AS DOUBLE))
        |    / CAST(ex.exact_distinct AS DOUBLE), 6) AS rel_err
        |FROM fin f JOIN ex USING (event_type)
        |ORDER BY f.event_type""".stripMargin
    },
  )
}
