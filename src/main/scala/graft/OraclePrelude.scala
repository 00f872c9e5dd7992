package graft

import graft.core.XxHashSql
import graft.functions.Tokenizer
import graft.queries.{Advanced, AnalysisQueries, DedupQueries, SimilarityQueries}

/** Shared DuckDB replay tables for the oracle gate.
  *
  * The dedup/cluster/minhash oracle family re-expands the same chains
  * per query — the shingle table, the quadratic-in-block candidate-pair
  * join, the recursive transitive closure, the 20-stage XXH64+fmix
  * minhash replay, the quality-feature projection. Self-contained, that
  * cost ~65 min for the full sf0.1 gate (docs/oracle_times_sf01.json)
  * and forced a sampled-gate policy for 16 oracles. This object derives,
  * from the SAME single-sourced CTE text the oracles interpolate:
  *
  *  - [[statements]]: ordered `CREATE TEMP TABLE g_* AS …` DDL that
  *    materializes each shared stage ONCE per gate run;
  *  - [[fastOracles]]: a mechanically-substituted variant of each
  *    affected oracle that reads the g_* tables instead of re-deriving
  *    them. Because the replacement is a pure textual swap of a chain
  *    for a materialization OF THAT EXACT CHAIN TEXT, fast and
  *    self-contained variants are equivalent by construction (and both
  *    are gated at sf0.01 in CI fashion by scripts/check_oracle.py).
  *
  * The driver's own gate keeps consuming the unchanged, self-contained
  * `oracle_sql.json`; `oracle_prelude.json` + `oracle_sql_fast.json`
  * are additive outputs for gates that understand them. */
object OraclePrelude {

  private val re = Tokenizer.DuckDbTokenRegex

  private val minhashChain = XxHashSql.minhashBandCtes(re, 3, 32, 16)
  private val minhashFast =
    """msh AS (SELECT * FROM g_msh),
      |mmin AS (SELECT * FROM g_mmin),
      |mbh AS (SELECT * FROM g_mbh)""".stripMargin

  /** Ordered DDL: later tables build on earlier ones. */
  val statements: Seq[String] = Seq(
    s"CREATE TEMP TABLE g_sh AS WITH ${DedupQueries.ShingleCte} SELECT * FROM sh",
    s"CREATE TEMP TABLE g_jp AS WITH sh AS (SELECT * FROM g_sh), ${DedupQueries.PairCte} SELECT * FROM jp",
    s"CREATE TEMP TABLE g_cl AS WITH RECURSIVE ${DedupQueries.ClusterCtes
        .replace(DedupQueries.ShingleCte, "sh AS (SELECT * FROM g_sh)")
        .replace(DedupQueries.PairCte, "jp AS (SELECT * FROM g_jp)")} SELECT * FROM cl",
    s"CREATE TEMP TABLE g_msh AS WITH ${XxHashSql.minhashShingleCtes(re, 3)} SELECT * FROM msh",
    s"CREATE TEMP TABLE g_mmin AS WITH msh AS (SELECT * FROM g_msh), ${XxHashSql.minhashMinCtes(32)} SELECT * FROM mmin",
    s"CREATE TEMP TABLE g_mbh AS WITH mmin AS (SELECT * FROM g_mmin), ${XxHashSql.minhashFoldCtes(32, 16)} SELECT * FROM mbh",
    s"CREATE TEMP TABLE g_mver AS WITH msh AS (SELECT * FROM g_msh), " +
      s"mbh AS (SELECT * FROM g_mbh), ${XxHashSql.minhashVerifyCtes(
        XxHashSql.CappedBucketLimit)} SELECT * FROM mver",
    s"CREATE TEMP TABLE g_qf AS WITH ${AnalysisQueries.qualityFeatureCtes} SELECT * FROM f",
    s"CREATE TEMP TABLE g_whash AS WITH ${XxHashSql.winnowShingleCtes(re,
        DedupQueries.WinnowK, DedupQueries.WinnowW)}, ${XxHashSql
        .hash64Ctes("wdis", "whash", "gwx")} SELECT * FROM whash",
    s"CREATE TEMP TABLE g_bw AS WITH ${AnalysisQueries.poissonWeightCtes} SELECT doc_id, b, w FROM bw",
    // the covariance/PCA moment matrix: the n·d² product fold runs once
    // per gate instead of once per consumer (sim_covariance +
    // sim_pca_proj share it); si's n·d chain is separate so neither
    // statement drags the other's heavy CTE
    s"CREATE TEMP TABLE g_cov_sij AS WITH ${SimilarityQueries.covPCte},\n${SimilarityQueries.covSijCtes} SELECT * FROM sij",
    s"CREATE TEMP TABLE g_cov_si AS WITH ${SimilarityQueries.covPCte},\n${SimilarityQueries.covSiCtes} SELECT * FROM si",
  ) ++ compositeStatements

  /** The matching-block recursion of `adv_composite_match`, unrolled as
    * an iterative breadth-first worklist: each statement advances EVERY
    * live (pair, segment) one split and accumulates the match lengths
    * into `g_cm_m`. Per-step memory is bounded by the live segment
    * count — the monolithic `WITH RECURSIVE` holds the entire recursion
    * tree (plus its i×j scan grids) at once and OOMs DuckDB at sf0.1,
    * which forced the gate's one skip (r12 policy). Step SQL is
    * [[Advanced.compositeStepSql]] — the recursive body TEXT itself —
    * so iterative and recursive forms are the same computation by
    * construction. Measured recursion depth on this corpus is 8
    * (sf0.01 and sf0.1 share the text structure that drives it); 12
    * steps leave headroom, and the final guard raises via `error()` if
    * the worklist is not drained, so under-unrolling can never return
    * a silently-wrong result. */
  private def compositeStatements: Seq[String] = {
    val steps = 12
    Seq(
      s"CREATE TEMP TABLE g_cm_pr AS WITH ${Advanced.CompositePrCtes} SELECT * FROM pr",
      "CREATE TEMP TABLE g_cm_work AS " +
        "SELECT oa, ob, 'r' AS rid, sa0 AS sa, sb0 AS sb FROM g_cm_pr",
      "CREATE TEMP TABLE g_cm_m (oa BIGINT, ob BIGINT, mlen BIGINT)",
    ) ++ (0 until steps).flatMap { _ =>
      Seq(
        s"CREATE TEMP TABLE g_cm_next AS ${Advanced.compositeStepSql("g_cm_work")}",
        "INSERT INTO g_cm_m SELECT oa, ob, mlen FROM g_cm_next WHERE mlen > 0",
        "DROP TABLE g_cm_work",
        // segments that emptied on one side can never match again —
        // dropping them here is what makes the worklist shrink
        "CREATE TEMP TABLE g_cm_work AS SELECT * FROM g_cm_next " +
          "WHERE length(sa) > 0 AND length(sb) > 0",
        "DROP TABLE g_cm_next",
      )
    } ++ Seq(
      "CREATE TEMP TABLE g_cm_drained AS SELECT CASE WHEN count(*) > 0 " +
        "THEN error('composite-match worklist not drained: raise the " +
        "unroll depth in OraclePrelude.compositeStatements') " +
        "ELSE 0 END AS ok FROM g_cm_work",
    )
  }

  /** Longest-chain-first substitutions (ClusterCtes embeds ShingleCte
    * and PairCte; the minhash chain embeds its own segments). */
  private val substitutions: Seq[(String, String)] = Seq(
    DedupQueries.ClusterCtes -> "cl AS MATERIALIZED (SELECT * FROM g_cl)",
    // the shared candidate+verify chain of the three minhash oracles —
    // substituted BEFORE the band chain so its g_mver swap wins
    XxHashSql.minhashVerifyCtes(XxHashSql.CappedBucketLimit) ->
      "mver AS (SELECT * FROM g_mver)",
    minhashChain -> minhashFast,
    DedupQueries.PairCte -> "jp AS (SELECT * FROM g_jp)",
    DedupQueries.ShingleCte -> "sh AS (SELECT * FROM g_sh)",
    AnalysisQueries.qualityFeatureCtes ->
      s"${AnalysisQueries.qualityTokenCte},\nf AS (SELECT * FROM g_qf)",
    // both winnow oracles share one XXH64 table over the distinct
    // shingles; their upstream wdis CTEs stay defined but unused.
    // CONTRACT: this substitution keys on the hash-chain TEXT, which is
    // k-independent — it is only sound while every oracle's wdis is the
    // WinnowK/WinnowW shingle set g_whash materializes (true today: one
    // pairs oracle, one density oracle, same constants). An oracle
    // introducing a different-k wdis must use a different CTE name.
    XxHashSql.hash64Ctes("wdis", "whash", "wxx") ->
      "whash AS (SELECT * FROM g_whash)",
    XxHashSql.hash64Ctes("wdis", "whash", "wdx") ->
      "whash AS (SELECT * FROM g_whash)",
    AnalysisQueries.poissonWeightCtes ->
      ("bdoc AS (SELECT doc_id, n_chars FROM documents),\n" +
        "bw AS (SELECT * FROM g_bw)"),
    // p stays defined (the PCA projection folds over it); the heavy
    // pr/bsij and bsi chains collapse to the materialized tables
    SimilarityQueries.covMomentCtes ->
      (s"${SimilarityQueries.covPCte},\n" +
        "sij AS (SELECT * FROM g_cov_sij),\n" +
        "si AS (SELECT * FROM g_cov_si)"),
    // composite match: swap the pair chain + recursion for the
    // iteratively-materialized tables. mm must still cover EVERY pair
    // (the recursive blocks CTE seeds each pair with mlen=0), so
    // zero-match pairs come back via the LEFT JOIN's coalesce.
    (s"${Advanced.CompositePrCtes},\n${Advanced.CompositeBlocksMmCtes}") ->
      ("pr AS (SELECT * FROM g_cm_pr),\n" +
        "mm AS (SELECT pr.oa, pr.ob, CAST(coalesce(s.m, 0) AS BIGINT) AS m\n" +
        "  FROM pr LEFT JOIN (SELECT oa, ob, sum(mlen) AS m FROM g_cm_m\n" +
        "    GROUP BY oa, ob) s ON pr.oa = s.oa AND pr.ob = s.ob)"),
  )

  /** Fast variants for every oracle a substitution applies to. */
  def fastOracles(base: Map[String, String]): Map[String, String] =
    base.flatMap { case (k, sql) =>
      val fast = substitutions.foldLeft(sql) { case (s, (from, to)) =>
        s.replace(from, to)
      }
      if (fast != sql) Some(k -> fast) else None
    }
}
