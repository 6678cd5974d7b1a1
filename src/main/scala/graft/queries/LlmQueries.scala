package graft.queries

import graft.llm.{Curation, Dedup, Multimodal, Pq, Profiling, Retrieval, Similarity, TextAnalysis, VectorIndex}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Large-scale training-data pipeline operators over the documents and
  * embeddings tables — dedup (exact / MinHash-LSH / SimHash / n-gram
  * Jaccard), similarity search (brute-force + LSH-bucketed ANN), text
  * analysis, and multimodal binary-column plumbing. Hash families are
  * md5-seeded so every operator is engine-independent and each query has
  * an exact DuckDB oracle.
  */
object LlmQueries {
  import Registry.table

  /** Deterministic near-duplicate corpus: 30 distinct templates across
    * 500 docs (same group ⇒ identical; same group, different tail ⇒
    * near-duplicate). Must match `tplSql` textually.
    */
  private def tplCol: Column = concat(
    lit("the quick brown fox jumps over the lazy dog number "),
    expr("CAST(doc_id div 50 AS STRING)"),
    lit(" tail "), (col("doc_id") % 3).cast("string"))

  private val tplSql =
    """'the quick brown fox jumps over the lazy dog number ' ||
      |CAST(doc_id // 50 AS VARCHAR) || ' tail ' || CAST(doc_id % 3 AS VARCHAR)"""
      .stripMargin.replace("\n", " ")

  /** q84's exact incremental-dedup oracle — shared by the per-call
    * path (q84) and the persisted-index path (q219): probing the index
    * must be row-identical to recomputing the reference keys.
    */
  private lazy val IncrementalDedupSql: String =
    s"""WITH $shingleSql,
    |sig AS (SELECT id, k, min(md5(CAST(k AS VARCHAR) || ':' || shingle)) AS mh
    |        FROM sh, (SELECT unnest(range(0, 8)) AS k) ks GROUP BY id, k),
    |bands AS (SELECT id, k // 2 AS band, md5(string_agg(mh, ',' ORDER BY k)) AS bk
    |          FROM sig GROUP BY id, k // 2),
    |refb AS (SELECT DISTINCT band, bk FROM bands WHERE id % 3 = 0),
    |nearids AS (SELECT DISTINCT b.id FROM bands b JOIN refb USING (band, bk)
    |            WHERE b.id % 3 <> 0),
    |refh AS (SELECT DISTINCT md5(t) AS h FROM m WHERE id % 3 = 0)
    |SELECT m.id AS doc_id,
    |  CAST(CASE WHEN md5(m.t) IN (SELECT h FROM refh) THEN 1 ELSE 0 END AS BIGINT) AS exact_dup,
    |  CAST(CASE WHEN m.id IN (SELECT id FROM nearids) THEN 1 ELSE 0 END AS BIGINT) AS near_dup
    |FROM m WHERE m.id % 3 <> 0 ORDER BY doc_id""".stripMargin

  private def docsTpl(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"), tplCol.as("t"))

  /** The explicit-retrieval probe set shared by q198 (tokenize-per-
    * call) and q202 (persisted index): two real probes plus one whose
    * only term is absent from the corpus. qids are positional.
    */
  private val ExplicitProbeTerms: Seq[(Long, Seq[String])] = Seq(
    (0L, Seq("table", "scan")),
    (1L, Seq("join", "stream")),
    (2L, Seq("zzz_absent")))

  /** One oracle for both explicit-BM25 paths — the indexed path must be
    * row-identical to the per-call path by construction.
    */
  private val ExplicitBm25Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |          FROM documents),
      |tf AS MATERIALIZED (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      |      FROM tok WHERE tok <> '' GROUP BY 1, 2),
      |dl AS MATERIALIZED (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
      |      FROM tf GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |              (2000 * CAST(sum(dl) AS BIGINT) + count(*)) // (2 * count(*)) AS avdl_m
      |       FROM dl),
      |tdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
      |q AS (SELECT CAST(v.qid AS BIGINT) AS qid, v.tok, tdf.df_t
      |      FROM (VALUES (0, 'table'), (0, 'scan'), (1, 'join'),
      |                   (1, 'stream'), (2, 'zzz_absent')) AS v(qid, tok)
      |      JOIN tdf USING (tok)),
      |sc AS (SELECT q.qid, tf.doc_id,
      |              CAST(count(*) AS BIGINT) AS n_terms,
      |              CAST(sum(
      |                (2 * ((20000 * (2 * st.n_docs - 2 * q.df_t + 1) + (2 * q.df_t + 1))
      |                      // (2 * (2 * q.df_t + 1)))
      |                   * ((20000 * 44 * st.avdl_m * tf.tf
      |                       + (20 * st.avdl_m * tf.tf + 6 * st.avdl_m + 18 * dl.dl * 1000))
      |                      // (2 * (20 * st.avdl_m * tf.tf + 6 * st.avdl_m + 18 * dl.dl * 1000)))
      |                 + 10000) // 20000) AS BIGINT) AS score_bp
      |       FROM tf JOIN q USING (tok) JOIN dl USING (doc_id) CROSS JOIN st
      |       GROUP BY 1, 2)
      |SELECT qid, rnk, doc_id, n_terms, score_bp
      |FROM (SELECT qid, doc_id, n_terms, score_bp,
      |             CAST(row_number() OVER (PARTITION BY qid
      |                    ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rnk
      |      FROM sc) r
      |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** Unrolled power-iteration + Hotelling-deflation oracle chain for
    * the top-r PCA queries (q265/q266): the q230 covariance prelude,
    * then per component 8 MATERIALIZED iteration levels, the sign fix
    * (vs1..vs{r}), and between components the integer deflation
    * C -= HALF_UP_signed((vᵀCv)·vᵢ·vⱼ / (vᵀv)²) in HUGEINT — the
    * exact arithmetic [[graft.llm.Similarity.eigenvectorChain]] runs
    * in driver BigInt. Returns the WITH-block up to vs{r}; callers
    * append their final SELECT (or further CTEs after a comma).
    */
  private def pcaChainSql(r: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH e AS (SELECT vec_id, list_transform(embedding,
        |              x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS sv
        |        FROM embeddings),
        |t AS (SELECT sv, unnest(range(1, len(sv) + 1)) AS i FROM e),
        |p AS (SELECT sv, i, unnest(range(i, len(sv) + 1)) AS j FROM t),
        |c AS (SELECT CAST(i - 1 AS BIGINT) AS di, CAST(j - 1 AS BIGINT) AS dj,
        |             sv[CAST(i AS INT)] AS xi, sv[CAST(j AS INT)] AS xj
        |      FROM p),
        |a AS (SELECT di, dj, CAST(count(*) AS BIGINT) AS n,
        |             sum(xi) AS si, sum(xj) AS sj, sum(xi * xj) AS sij
        |      FROM c GROUP BY di, dj),
        |cov AS MATERIALIZED (SELECT di, dj,
        |       CAST((CASE WHEN n * sij - si * sj < 0 THEN -1 ELSE 1 END) *
        |            ((2 * abs(n * sij - si * sj) + 100 * n * n)
        |              // (2 * 100 * n * n)) AS BIGINT) AS cov_u
        |FROM a),
        |m1 AS MATERIALIZED (SELECT di AS i, dj AS j, cov_u AS c FROM cov
        |     UNION ALL SELECT dj, di, cov_u FROM cov WHERE di <> dj),
        |v1_0 AS MATERIALIZED (SELECT DISTINCT di AS i, CAST(10000 AS BIGINT) AS v FROM cov)""".stripMargin)
    for (comp <- 1 to r) {
      for (k <- 1 to 8) {
        sb.append(s""",
          |u${comp}_$k AS MATERIALIZED (SELECT m$comp.i AS i,
          |     CAST(sum(m$comp.c * v${comp}_${k - 1}.v) AS BIGINT) AS u
          |     FROM m$comp JOIN v${comp}_${k - 1} ON v${comp}_${k - 1}.i = m$comp.j GROUP BY m$comp.i),
          |s${comp}_$k AS MATERIALIZED (SELECT max(abs(u)) AS mx FROM u${comp}_$k),
          |v${comp}_$k AS MATERIALIZED (SELECT i, CASE WHEN mx = 0 THEN u
          |     ELSE CAST(sign(u) AS BIGINT) *
          |          CAST((2 * abs(u) * 10000 + mx) // (2 * mx) AS BIGINT) END AS v
          |     FROM u${comp}_$k, s${comp}_$k)""".stripMargin)
      }
      sb.append(s""",
        |sg$comp AS (SELECT CASE WHEN (SELECT v FROM v${comp}_8 WHERE v <> 0 ORDER BY i LIMIT 1) < 0
        |              THEN -1 ELSE 1 END AS s),
        |vs$comp AS MATERIALIZED (SELECT i, CAST(v * s AS BIGINT) AS v FROM v${comp}_8, sg$comp)""".stripMargin)
      if (comp < r) {
        sb.append(s""",
          |num$comp AS MATERIALIZED (SELECT CAST(sum(CAST(m$comp.c AS HUGEINT) * a.v * b.v) AS HUGEINT) AS num
          |     FROM m$comp JOIN vs$comp a ON a.i = m$comp.i JOIN vs$comp b ON b.i = m$comp.j),
          |den$comp AS MATERIALIZED (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS den FROM vs$comp),
          |m${comp + 1} AS MATERIALIZED (SELECT m$comp.i AS i, m$comp.j AS j,
          |     CASE WHEN den = 0 THEN m$comp.c
          |     ELSE CAST(m$comp.c - (CASE WHEN num * a.v * b.v < 0 THEN -1 ELSE 1 END) *
          |          CAST((2 * abs(num * a.v * b.v) + den * den) // (2 * den * den) AS HUGEINT) AS BIGINT)
          |     END AS c
          |     FROM m$comp JOIN vs$comp a ON a.i = m$comp.i JOIN vs$comp b ON b.i = m$comp.j,
          |          num$comp, den$comp),
          |v${comp + 1}_0 AS (SELECT i, CAST(10000 AS BIGINT) AS v FROM vs$comp)""".stripMargin)
      }
    }
    sb.toString
  }

  /** Shared Naive-Bayes training chain (q267/q268): a keyword-seeded
    * topic label (does the document mention "vector" — the bootstrap
    * pattern: seed a topical slice with keywords, train a classifier
    * to generalize it), the md5 80/20 split, train-split
    * hashed-token class counts, and the Laplace-smoothed micro-nat
    * weight table `wt` — exactly
    * [[graft.llm.TextAnalysis.nbTrainWeights]]'s arithmetic. Callers
    * append a final SELECT (or more CTEs after a comma).
    */
  private def lnrSql(x: String): String =
    s"CAST(round(ln(CAST($x AS DOUBLE)) * 1000000.0) AS BIGINT)"

  private val NbTrainSql: String =
    s"""WITH g AS (SELECT doc_id, CAST(list_contains(string_split(text, ' '), 'vector') AS BIGINT) AS keep FROM documents),
       |sp AS (SELECT doc_id,
       |              CAST('0x' || substr(md5('nb:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 AS pct
       |       FROM documents),
       |tt AS (SELECT d.doc_id, unnest(list_filter(string_split(d.text, ' '), t -> t <> '')) AS tok
       |       FROM documents d JOIN sp USING (doc_id) WHERE sp.pct < 80),
       |bt AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) % 64 AS bucket FROM tt),
       |cnt AS (SELECT bucket, CAST(sum(keep) AS BIGINT) AS c_pos,
       |               CAST(sum(1 - keep) AS BIGINT) AS c_neg
       |        FROM bt JOIN g USING (doc_id) GROUP BY bucket),
       |tot AS (SELECT CAST(coalesce(sum(c_pos), 0) AS BIGINT) AS tp,
       |               CAST(coalesce(sum(c_neg), 0) AS BIGINT) AS tn FROM cnt),
       |grid AS (SELECT CAST(unnest(range(64)) AS BIGINT) AS bucket),
       |wt AS MATERIALIZED (SELECT grid.bucket,
       |              CAST(COALESCE(c_pos, 0) AS BIGINT) AS c_pos,
       |              CAST(COALESCE(c_neg, 0) AS BIGINT) AS c_neg,
       |              CAST((${lnrSql("COALESCE(c_pos, 0) + 1")} - ${lnrSql("tp + 64")})
       |                 - (${lnrSql("COALESCE(c_neg, 0) + 1")} - ${lnrSql("tn + 64")}) AS BIGINT) AS w_micro
       |       FROM grid LEFT JOIN cnt USING (bucket), tot)""".stripMargin

  /** Shared unigram-LM vocabulary chain (q269/q270): frequency-weighted
    * substring candidate counts (length ≤ 4, overlaps counted), the
    * all-chars + top-multi selection, and micro-nat costs — exactly
    * [[graft.llm.TextAnalysis.unigramSeedVocab]]'s arithmetic. Ends at
    * the `voc` CTE (the `wo` word-occurrence CTE is reusable); callers
    * append a final SELECT or more CTEs after a comma.
    */
  private val UnigramVocabSql: String =
    s"""WITH wo AS (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |           FROM documents),
       |wv AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM wo GROUP BY w),
       |sx AS (SELECT w, f, unnest(range(1, strlen(w) + 1)) AS i FROM wv),
       |sy AS (SELECT w, f, i, unnest(range(i, least(i + 3, strlen(w)) + 1)) AS k FROM sx),
       |cnts AS (SELECT substr(w, CAST(i AS INT), CAST(k - i + 1 AS INT)) AS piece,
       |                CAST(sum(f) AS BIGINT) AS cnt
       |         FROM sy GROUP BY 1),
       |ch AS (SELECT piece, cnt FROM cnts WHERE strlen(piece) = 1),
       |nch AS (SELECT count(*) AS n FROM ch),
       |mu AS (SELECT r.piece, r.cnt FROM (
       |         SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
       |         FROM cnts WHERE strlen(piece) > 1) r, nch
       |       WHERE r.rk <= 48 - nch.n),
       |sel AS (SELECT * FROM ch UNION ALL SELECT * FROM mu),
       |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM sel),
       |voc AS MATERIALIZED (SELECT piece, cnt,
       |       CAST(${lnrSql("t")} - ${lnrSql("cnt")} AS BIGINT) AS cost_micro
       |       FROM sel, tt)""".stripMargin

  /** q284's oracle: the q270 unrolled forward Viterbi DP, with the
    * j = 1 branch LEFT-joined so an unseen character COALESCEs to the
    * 10⁷-micro-nat escape cost (the byte-fallback analog), over the
    * drifted corpus (every 'a' uppercased) and the ORIGINAL-corpus
    * vocabulary.
    */
  private lazy val UnigramFallbackSql: String = UnigramVocabSql + {
    val unk = 10000000L
    val sb = new StringBuilder
    sb.append(s""",
      |dt AS (SELECT doc_id, unnest(list_filter(
      |              string_split(replace(text, 'a', 'A'), ' '),
      |              t -> t <> '' AND strlen(t) <= 12)) AS w
      |       FROM documents),
      |wd AS (SELECT DISTINCT w FROM dt),
      |d0 AS (SELECT w, CAST(0 AS BIGINT) AS key FROM wd)""".stripMargin)
    for (p <- 1 to 12) {
      val one =
        s"""SELECT prev.w, prev.key + COALESCE(v.cost_micro, $unk) * 100000 + 1 AS key
           |      FROM d${p - 1} prev LEFT JOIN voc v ON v.piece = substr(prev.w, $p, 1)
           |      WHERE strlen(prev.w) >= $p""".stripMargin
      val multi = (2 to math.min(4, p)).map { j =>
        s"""SELECT prev.w, prev.key + v.cost_micro * 100000 + 1 AS key
           |      FROM d${p - j} prev JOIN voc v
           |        ON strlen(prev.w) >= $p AND v.piece = substr(prev.w, ${p - j + 1}, $j)""".stripMargin
      }
      val branches = (one +: multi).mkString("\n      UNION ALL\n      ")
      sb.append(s""",
        |d$p AS MATERIALIZED (SELECT w, min(key) AS key FROM (
        |      $branches
        |) b$p GROUP BY w)""".stripMargin)
    }
    sb.append(s""",
      |best AS (SELECT u.w, u.key FROM (
      |      ${(1 to 12).map(p => s"SELECT w, key, $p AS p FROM d$p").mkString("\n      UNION ALL\n      ")}
      |) u WHERE p = strlen(u.w)),
      |agg AS (SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |               CAST(sum(best.key % 100000) AS BIGINT) AS n_pieces,
      |               CAST(sum(best.key // 100000) AS BIGINT) AS cost_micro
      |        FROM dt JOIN best ON best.w = dt.w GROUP BY 1)
      |SELECT d.doc_id,
      |       CAST(COALESCE(agg.n_words, 0) AS BIGINT) AS n_words,
      |       CAST(COALESCE(agg.n_pieces, 0) AS BIGINT) AS n_pieces,
      |       CAST(COALESCE(agg.cost_micro, 0) AS BIGINT) AS cost_micro,
      |       CAST(CASE WHEN COALESCE(agg.n_words, 0) > 0
      |            THEN (20000 * agg.n_pieces + agg.n_words) // (2 * agg.n_words)
      |            END AS BIGINT) AS fertility_bp
      |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin)
    sb.toString
  }

  /** Unigram EM-training oracle machinery (q282/q283) — replays
    * [[graft.llm.TextAnalysis.unigramTrainVocab]] level-by-level: the
    * seed pool at an arbitrary size, then per EM round the suffix-DP
    * (12 unrolled MATERIALIZED levels, the q270 convention), the
    * smallest-optimal-j table, the canonical greedy walk (12 more
    * levels), frequency-weighted piece counts, the annealed prune, and
    * the micro-nat re-cost — all integer arithmetic and UTF-8-binary
    * tie-breaks, so the trained vocabulary hash-matches exactly.
    */
  private def unigramEmBaseSql(seedSize: Int): String =
    s"""WITH docsf AS MATERIALIZED (SELECT doc_id,
       |       array_to_string(list_filter(string_split(text, ' '),
       |         t -> t <> '' AND strlen(t) <= 12), ' ') AS text
       |     FROM documents),
       |wo AS (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |       FROM docsf),
       |wv AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS f FROM wo GROUP BY w),
       |wd AS (SELECT w FROM wv),
       |sx AS (SELECT w, f, unnest(range(1, strlen(w) + 1)) AS i FROM wv),
       |sy AS (SELECT w, f, i, unnest(range(i, least(i + 3, strlen(w)) + 1)) AS k FROM sx),
       |cnts AS (SELECT substr(w, CAST(i AS INT), CAST(k - i + 1 AS INT)) AS piece,
       |                CAST(sum(f) AS BIGINT) AS cnt
       |         FROM sy GROUP BY 1),
       |ch AS (SELECT piece, cnt FROM cnts WHERE strlen(piece) = 1),
       |nch AS (SELECT count(*) AS n FROM ch),
       |mu0 AS (SELECT r.piece, r.cnt FROM (
       |         SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
       |         FROM cnts WHERE strlen(piece) > 1) r, nch
       |       WHERE r.rk <= $seedSize - nch.n),
       |sel0 AS (SELECT * FROM ch UNION ALL SELECT * FROM mu0),
       |tt0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM sel0),
       |v0 AS MATERIALIZED (SELECT piece, cnt,
       |     CAST(${lnrSql("t")} - ${lnrSql("cnt")} AS BIGINT) AS cost_micro
       |     FROM sel0, tt0)""".stripMargin

  /** Suffix-DP levels over `wd` under vocabulary CTE `voc`: tables
    * e{pfx}{m} (best BIGINT key for the last m chars) for m = 0..12,
    * unioned as eu{pfx} (w, m, key). Appended fragment (leading comma).
    */
  private def unigramSuffixChainSql(pfx: String, voc: String): String = {
    val sb = new StringBuilder
    sb.append(s""",
      |e${pfx}0 AS (SELECT w, CAST(0 AS BIGINT) AS key FROM wd)""".stripMargin)
    for (m <- 1 to 12) {
      val branches = (1 to math.min(4, m)).map { j =>
        s"""SELECT prev.w, prev.key + v.cost_micro * 100000 + 1 AS key
           |      FROM e$pfx${m - j} prev JOIN $voc v
           |        ON strlen(prev.w) >= $m
           |       AND v.piece = substr(prev.w, CAST(strlen(prev.w) - $m + 1 AS INT), $j)""".stripMargin
      }.mkString("\n      UNION ALL\n      ")
      sb.append(s""",
        |e$pfx$m AS MATERIALIZED (SELECT w, min(key) AS key FROM (
        |      $branches
        |) b$pfx$m GROUP BY w)""".stripMargin)
    }
    sb.append(s""",
      |eu$pfx AS MATERIALIZED (
      |      ${(0 to 12).map(m => s"SELECT w, CAST($m AS BIGINT) AS m, key FROM e$pfx$m")
             .mkString("\n      UNION ALL\n      ")})""".stripMargin)
    sb.toString
  }

  /** The smallest-optimal-j table + canonical greedy walk under
    * vocabulary CTE `voc`, reading the suffix chain `eu{pfx}`: emits
    * js{pfx}, wk{pfx}_0..12, and pc{pfx} (w, piece_idx 0-based, piece)
    * — one row per piece of every word's canonical segmentation.
    * Appended fragment (leading comma).
    */
  private def unigramWalkSql(pfx: String, voc: String): String = {
    val sb = new StringBuilder
    sb.append(s""",
      |js$pfx AS MATERIALIZED (SELECT w, p, min(j) AS j FROM (
      |      SELECT a.w, strlen(a.w) - a.m AS p, jj.j
      |      FROM eu$pfx a
      |      JOIN (VALUES (1), (2), (3), (4)) jj(j) ON jj.j <= a.m
      |      JOIN eu$pfx b ON b.w = a.w AND b.m = a.m - jj.j
      |      JOIN $voc v
      |        ON v.piece = substr(a.w, CAST(strlen(a.w) - a.m + 1 AS INT), CAST(jj.j AS INT))
      |      WHERE a.m >= 1 AND a.key = b.key + v.cost_micro * 100000 + 1
      |) cj$pfx GROUP BY w, p)""".stripMargin)
    sb.append(s""",
      |wk${pfx}_0 AS (SELECT w, CAST(0 AS BIGINT) AS pos FROM wd)""".stripMargin)
    for (k <- 1 to 12) {
      sb.append(s""",
        |wk${pfx}_$k AS MATERIALIZED (SELECT pr.w, pr.pos + js.j AS pos,
        |      substr(pr.w, CAST(pr.pos + 1 AS INT), CAST(js.j AS INT)) AS piece
        |      FROM wk${pfx}_${k - 1} pr JOIN js$pfx js ON js.w = pr.w AND js.p = pr.pos
        |      WHERE pr.pos < strlen(pr.w))""".stripMargin)
    }
    sb.append(s""",
      |pc$pfx AS (${(1 to 12).map(k =>
             s"SELECT w, CAST(${k - 1} AS BIGINT) AS piece_idx, piece FROM wk${pfx}_$k")
           .mkString("\n      UNION ALL\n      ")})""".stripMargin)
    sb.toString
  }

  /** One EM round: E-step (suffix chain under v{r-1}, smallest-
    * optimal-j table, canonical walk, frequency-weighted counts),
    * annealed prune, micro-nat re-cost → CTE v{r}. `extra` is the
    * round's multi-piece surplus over the target (corpus-independent —
    * the seed surplus is vocabSize·(mult−1), so nch cancels).
    */
  private def unigramEmRoundSql(r: Int, vocabSize: Int, extra: Long): String = {
    val prevVoc = s"v${r - 1}"
    val sb = new StringBuilder
    sb.append(unigramSuffixChainSql(s"m$r", prevVoc))
    sb.append(unigramWalkSql(s"m$r", prevVoc))
    sb.append(s""",
      |cn$r AS MATERIALIZED (SELECT p.piece, CAST(sum(wv.f) AS BIGINT) AS cnt
      |      FROM pcm$r p JOIN wv USING (w) GROUP BY p.piece),
      |cd$r AS (SELECT v.piece, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      |      FROM $prevVoc v LEFT JOIN cn$r c USING (piece)),
      |kp$r AS (SELECT piece, cnt FROM cd$r WHERE strlen(piece) = 1
      |      UNION ALL
      |      SELECT piece, cnt FROM (
      |        SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
      |        FROM cd$r WHERE strlen(piece) > 1) rr$r, nch
      |      WHERE rr$r.rk <= ($vocabSize - nch.n) + $extra),
      |tt$r AS (SELECT CAST(sum(greatest(cnt, 1)) AS BIGINT) AS t FROM kp$r),
      |v$r AS MATERIALIZED (SELECT piece, cnt,
      |      CAST(${lnrSql("t")} - ${lnrSql("greatest(cnt, 1)")} AS BIGINT) AS cost_micro
      |      FROM kp$r, tt$r)""".stripMargin)
    sb.toString
  }

  /** The soft-EM pairwise log-sum-exp over negative-log micro-nat
    * masses — [[graft.llm.TextAnalysis.unigramTrainVocabSoft]]'s
    * rounding contract, replayed verbatim: correction once-rounded per
    * combine, NULL = absent branch.
    */
  private def lse2OracleSql(a: String, b: String): String =
    s"""CASE WHEN ($a) IS NULL THEN ($b) WHEN ($b) IS NULL THEN ($a)
       |ELSE least($a, $b) - CAST(round(1000000.0 * ln(1.0 + exp(
       |  -CAST(greatest($a, $b) - least($a, $b) AS DOUBLE) / 1000000.0))) AS BIGINT) END"""
      .stripMargin

  /** Soft-EM mass chain: levels z{pfx}0..12 of the prefix (F) or
    * suffix (B) negative-log masses under vocabulary CTE `voc`, the
    * lse2 fold applied in ascending piece-length order (branch j LEFT
    * JOINs level m−j and the vocab row for its piece; a missing vocab
    * row nulls the branch, exactly the Spark filter). Unioned as
    * zu{pfx} (w, m, key). Appended fragment (leading comma).
    */
  private def unigramSoftChainSql(pfx: String, voc: String,
                                  prefix: Boolean): String = {
    val sb = new StringBuilder
    sb.append(s""",
      |z${pfx}0 AS (SELECT w, CAST(0 AS BIGINT) AS key FROM wd)""".stripMargin)
    for (m <- 1 to 12) {
      val joins = (1 to math.min(4, m)).map { j =>
        val pieceExpr =
          if (prefix) s"substr(wd.w, ${m - j + 1}, $j)"
          else s"substr(wd.w, CAST(strlen(wd.w) - $m + 1 AS INT), $j)"
        s"""      LEFT JOIN z$pfx${m - j} p$j ON p$j.w = wd.w
           |      LEFT JOIN $voc v$j ON v$j.piece = $pieceExpr""".stripMargin
      }.mkString("\n")
      val fold = (1 to math.min(4, m))
        .map(j => s"(p$j.key + v$j.cost_micro)")
        .reduceLeft(lse2OracleSql)
      sb.append(s""",
        |z$pfx$m AS MATERIALIZED (SELECT wd.w, $fold AS key
        |      FROM wd
        |$joins
        |      WHERE strlen(wd.w) >= $m)""".stripMargin)
    }
    sb.append(s""",
      |zu$pfx AS MATERIALIZED (
      |      ${(0 to 12).map(m => s"SELECT w, CAST($m AS BIGINT) AS m, key FROM z$pfx$m")
             .mkString("\n      UNION ALL\n      ")})""".stripMargin)
    sb.toString
  }

  /** One SOFT-EM round: F/B mass chains under the previous vocab, the
    * posterior slot weights round(10⁶·exp(−(F(p)+cost+B−Z)/10⁶)),
    * frequency-weighted micro counts, then the trainer's annealed
    * prune + micro-nat re-cost → CTE sv{r}. Mirrors unigramEmRoundSql
    * with posterior expectations for Viterbi counts.
    */
  private def unigramSoftRoundSql(r: Int, vocabSize: Int, extra: Long): String = {
    val prevVoc = if (r == 1) "v0" else s"sv${r - 1}"
    val sb = new StringBuilder
    sb.append(unigramSoftChainSql(s"f$r", prevVoc, prefix = true))
    sb.append(unigramSoftChainSql(s"b$r", prevVoc, prefix = false))
    sb.append(s""",
      |sp$r AS MATERIALIZED (
      |      SELECT pos.w,
      |             substr(pos.w, CAST(pos.p + 1 AS INT), CAST(jj.j AS INT)) AS piece,
      |             CAST(round(1000000.0 * exp(-CAST(
      |               fa.key + v.cost_micro + bb.key - zz.key
      |             AS DOUBLE) / 1000000.0)) AS BIGINT) AS wm
      |      FROM (SELECT w, unnest(range(0, strlen(w))) AS p FROM wd) pos
      |      JOIN (VALUES (1), (2), (3), (4)) jj(j) ON jj.j <= strlen(pos.w) - pos.p
      |      JOIN $prevVoc v
      |        ON v.piece = substr(pos.w, CAST(pos.p + 1 AS INT), CAST(jj.j AS INT))
      |      JOIN zuf$r fa ON fa.w = pos.w AND fa.m = pos.p
      |      JOIN zub$r bb ON bb.w = pos.w AND bb.m = strlen(pos.w) - pos.p - jj.j
      |      JOIN zuf$r zz ON zz.w = pos.w AND zz.m = strlen(pos.w)),
      |scn$r AS MATERIALIZED (SELECT p.piece, CAST(sum(wv.f * p.wm) AS BIGINT) AS cnt
      |      FROM sp$r p JOIN wv USING (w) GROUP BY p.piece),
      |scd$r AS (SELECT v.piece, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      |      FROM $prevVoc v LEFT JOIN scn$r c USING (piece)),
      |skp$r AS (SELECT piece, cnt FROM scd$r WHERE strlen(piece) = 1
      |      UNION ALL
      |      SELECT piece, cnt FROM (
      |        SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
      |        FROM scd$r WHERE strlen(piece) > 1) srr$r, nch
      |      WHERE srr$r.rk <= ($vocabSize - nch.n) + $extra),
      |stt$r AS (SELECT CAST(sum(greatest(cnt, 1)) AS BIGINT) AS t FROM skp$r),
      |sv$r AS MATERIALIZED (SELECT piece, cnt,
      |      CAST(${lnrSql("t")} - ${lnrSql("greatest(cnt, 1)")} AS BIGINT) AS cost_micro
      |      FROM skp$r, stt$r)""".stripMargin)
    sb.toString
  }

  /** q288's full oracle: seed-96 pool, two SOFT-EM rounds, trained
    * vocab with posterior micro counts.
    */
  private def unigramSoftVocabSql: String =
    unigramEmBaseSql(96) +
      unigramSoftRoundSql(1, 48, 24L) +
      unigramSoftRoundSql(2, 48, 0L) +
      """
        |SELECT piece, cnt AS cnt_micro, cost_micro FROM sv2 ORDER BY piece""".stripMargin

  /** q289's full oracle: both trainers (hard v2, soft sv2) on the q282
    * corpus, then corpus-total VITERBI fertility under each — the
    * soft-vs-hard payoff table (serving always segments by Viterbi;
    * only training differs).
    */
  private def unigramSoftFertilitySql: String =
    unigramEmBaseSql(96) +
      unigramEmRoundSql(1, 48, 24L) +
      unigramEmRoundSql(2, 48, 0L) +
      unigramSoftRoundSql(1, 48, 24L) +
      unigramSoftRoundSql(2, 48, 0L) +
      unigramSuffixChainSql("fh", "v2") +
      unigramSuffixChainSql("fo", "sv2") +
      s"""
        |${unigramTotalsArmSql("fh", "hard")}
        |UNION ALL
        |${unigramTotalsArmSql("fo", "soft")}
        |ORDER BY vocab_kind""".stripMargin

  /** Corpus-total fertility under the vocab a suffix chain `pfx` was
    * built with: one SELECT arm for the q283 union. Word totals come
    * from the full-word suffix keys (m = strlen), weighted by corpus
    * frequency — identical to summing per-doc fertility rows.
    */
  private def unigramTotalsArmSql(pfx: String, kind: String): String =
    s"""SELECT vocab_kind, n_words, n_pieces, cost_micro,
       |       CAST((20000 * n_pieces + n_words) // (2 * n_words) AS BIGINT) AS fertility_bp
       |FROM (SELECT '$kind' AS vocab_kind,
       |             CAST(sum(wv.f) AS BIGINT) AS n_words,
       |             CAST(sum(wv.f * (bw.key % 100000)) AS BIGINT) AS n_pieces,
       |             CAST(sum(wv.f * (bw.key // 100000)) AS BIGINT) AS cost_micro
       |      FROM (SELECT w, key FROM eu$pfx WHERE m = strlen(w)) bw
       |      JOIN wv USING (w)) a$pfx""".stripMargin

  /** q282's full oracle: seed-96 pool, two EM rounds, trained vocab. */
  private def unigramEmVocabSql: String =
    unigramEmBaseSql(96) +
      unigramEmRoundSql(1, 48, 24L) +
      unigramEmRoundSql(2, 48, 0L) +
      """
        |SELECT piece, cnt, cost_micro FROM v2 ORDER BY piece""".stripMargin

  /** q286's full oracle: the q282 training chain, then the canonical
    * segmentation of every corpus token under the TRAINED vocabulary —
    * one row per emitted piece, doc-ordered.
    */
  private def unigramEncodeSql: String =
    unigramEmBaseSql(96) +
      unigramEmRoundSql(1, 48, 24L) +
      unigramEmRoundSql(2, 48, 0L) +
      unigramSuffixChainSql("en", "v2") +
      unigramWalkSql("en", "v2") +
      s""",
        |dt AS (SELECT doc_id, generate_subscripts(ws, 1) - 1 AS word_idx, unnest(ws) AS w
        |       FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
        |             FROM docsf) dws)
        |SELECT dt.doc_id, CAST(dt.word_idx AS BIGINT) AS word_idx,
        |       pc.piece_idx, pc.piece
        |FROM dt JOIN pcen pc ON pc.w = dt.w
        |ORDER BY doc_id, word_idx, piece_idx""".stripMargin

  /** q290's full oracle: the q282 training chain, costs α=1/2-annealed
    * (HALF_UP), the all-segmentations suffix mass chain under the
    * annealed vocab (the q288 lse2 contract), the position ×
    * piece-length branch-weight table with ascending-j cumulative
    * weights, then the occurrence-keyed sampled walk — 12 unrolled
    * levels, each drawing u = 48-bit md5(seed:doc:word:step) mod 10⁶
    * and advancing by the smallest j whose cumulative weight strictly
    * exceeds u·total/10⁶ — graft.llm.TextAnalysis.unigramEncodeSampled
    * replayed branch for branch.
    */
  private def unigramEncodeSampledSql: String = {
    val sb = new StringBuilder
    sb.append(unigramEmBaseSql(96))
    sb.append(unigramEmRoundSql(1, 48, 24L))
    sb.append(unigramEmRoundSql(2, 48, 0L))
    sb.append(""",
      |va AS MATERIALIZED (SELECT piece, (2 * cost_micro + 2) // 4 AS cost_micro
      |     FROM v2)""".stripMargin)
    sb.append(unigramSoftChainSql("sa", "va", prefix = false))
    sb.append(""",
      |sw AS MATERIALIZED (
      |  SELECT w, p, j, wm,
      |         CAST(sum(wm) OVER (PARTITION BY w, p ORDER BY j) AS BIGINT) AS cw,
      |         CAST(sum(wm) OVER (PARTITION BY w, p) AS BIGINT) AS tot
      |  FROM (
      |    SELECT pos.w, pos.p, jj.j,
      |           greatest(1, CAST(round(1000000.0 * exp(-CAST(
      |             va.cost_micro + br.key - bc.key AS DOUBLE) / 1000000.0)) AS BIGINT)) AS wm
      |    FROM (SELECT w, unnest(range(0, strlen(w))) AS p FROM wd) pos
      |    JOIN (VALUES (1), (2), (3), (4)) jj(j) ON jj.j <= strlen(pos.w) - pos.p
      |    JOIN va ON va.piece = substr(pos.w, CAST(pos.p + 1 AS INT), CAST(jj.j AS INT))
      |    JOIN zusa br ON br.w = pos.w AND br.m = strlen(pos.w) - pos.p - jj.j
      |    JOIN zusa bc ON bc.w = pos.w AND bc.m = strlen(pos.w) - pos.p
      |    WHERE br.key IS NOT NULL AND bc.key IS NOT NULL) wt),
      |dt AS MATERIALIZED (
      |  SELECT dws.doc_id, generate_subscripts(dws.ws, 1) - 1 AS word_idx, unnest(dws.ws) AS w
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
      |        FROM docsf) dws),
      |sk0 AS (SELECT dt.doc_id, dt.word_idx, dt.w, CAST(0 AS BIGINT) AS pos
      |        FROM dt JOIN zusa zz ON zz.w = dt.w AND zz.m = strlen(dt.w)
      |        WHERE zz.key IS NOT NULL)""".stripMargin)
    for (k <- 1 to 12) {
      sb.append(s""",
        |sk$k AS MATERIALIZED (
        |  SELECT doc_id, word_idx, w, pos + j AS pos,
        |         substr(w, CAST(pos + 1 AS INT), CAST(j AS INT)) AS piece
        |  FROM (
        |    SELECT pr.doc_id, pr.word_idx, pr.w, pr.pos, sw.j,
        |           row_number() OVER (PARTITION BY pr.doc_id, pr.word_idx
        |             ORDER BY sw.j) AS rn
        |    FROM sk${k - 1} pr
        |    JOIN sw ON sw.w = pr.w AND sw.p = pr.pos
        |    WHERE pr.pos < strlen(pr.w)
        |      AND sw.cw * 1000000 >
        |          (CAST('0x' || substr(md5('sr1:' || pr.doc_id || ':' ||
        |             pr.word_idx || ':' || ${k - 1}), 1, 12) AS BIGINT)
        |           % 1000000) * sw.tot
        |  ) c$k WHERE rn = 1)""".stripMargin)
    }
    sb.append(s"""
      |SELECT doc_id, CAST(word_idx AS BIGINT) AS word_idx,
      |       CAST(piece_idx AS BIGINT) AS piece_idx, piece
      |FROM (${(1 to 12).map(k =>
              s"SELECT doc_id, word_idx, CAST(${k - 1} AS BIGINT) AS piece_idx, piece FROM sk$k")
            .mkString("\n      UNION ALL\n      ")}) u
      |ORDER BY doc_id, word_idx, piece_idx""".stripMargin)
    sb.toString
  }

  /** q283's full oracle: the q282 chain, the plain seed-48 vocab, and
    * the corpus-total fertility of both — the EM payoff table.
    */
  private def unigramEmFertilitySql: String =
    unigramEmBaseSql(96) +
      unigramEmRoundSql(1, 48, 24L) +
      unigramEmRoundSql(2, 48, 0L) +
      s""",
        |mu48 AS (SELECT r.piece, r.cnt FROM (
        |         SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
        |         FROM cnts WHERE strlen(piece) > 1) r, nch
        |       WHERE r.rk <= 48 - nch.n),
        |sel48 AS (SELECT * FROM ch UNION ALL SELECT * FROM mu48),
        |tt48 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM sel48),
        |v48 AS MATERIALIZED (SELECT piece, cnt,
        |     CAST(${lnrSql("t")} - ${lnrSql("cnt")} AS BIGINT) AS cost_micro
        |     FROM sel48, tt48)""".stripMargin +
      unigramSuffixChainSql("fs", "v48") +
      unigramSuffixChainSql("ft", "v2") +
      s"""
        |${unigramTotalsArmSql("fs", "seed")}
        |UNION ALL
        |${unigramTotalsArmSql("ft", "trained")}
        |ORDER BY vocab_kind""".stripMargin

  /** q285's oracle: the q264 recall arithmetic at the production PQ
    * shape (m=16, 256-entry codebook, queries 300–309), with one
    * result row per swept kCand — totals over the query set, HALF_UP
    * basis points over 10·k slots.
    */
  private val RerankSizingSql: String = {
    val arms = Seq(5, 10, 25, 50).map { kc =>
      s"""SELECT CAST($kc AS BIGINT) AS k_cand,
         |       (SELECT n FROM na) AS n_adc,
         |       CAST(count(*) AS BIGINT) AS n_rr,
         |       CAST((20000 * (SELECT n FROM na) + 50) // 100 AS BIGINT) AS adc_recall_bp,
         |       CAST((20000 * count(*) + 50) // 100 AS BIGINT) AS rr_recall_bp
         |FROM ext e JOIN (
         |      SELECT c.query_id, c.neighbor_id FROM (
         |        SELECT query_id, neighbor_id,
         |               row_number() OVER (PARTITION BY query_id
         |                 ORDER BY adc_dist, neighbor_id) AS rnk FROM adc) c
         |      JOIN ex ON ex.query_id = c.query_id AND ex.neighbor_id = c.neighbor_id
         |      WHERE c.rnk <= $kc
         |      QUALIFY row_number() OVER (PARTITION BY c.query_id
         |                ORDER BY ex.d2, c.neighbor_id) <= 5
         |) rr ON rr.query_id = e.query_id AND rr.neighbor_id = e.neighbor_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
       |                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
       |           FROM embeddings),
       |v AS (SELECT vec_id, i // 4 AS sub, i % 4 AS j, qv FROM q),
       |cb AS (SELECT vec_id AS code, sub, j, qv FROM v WHERE vec_id < 256),
       |d AS MATERIALIZED (SELECT v.vec_id, v.sub, cb.code,
       |      sum((v.qv - cb.qv) * (v.qv - cb.qv)) AS dist
       |      FROM v JOIN cb ON cb.sub = v.sub AND cb.j = v.j GROUP BY 1, 2, 3),
       |a AS (SELECT vec_id, sub, code FROM
       |      (SELECT vec_id, sub, code,
       |              row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn FROM d)
       |      WHERE rn = 1),
       |adc AS MATERIALIZED (SELECT dq.vec_id AS query_id, a.vec_id AS neighbor_id,
       |        sum(dq.dist) AS adc_dist
       |        FROM d dq JOIN a ON a.sub = dq.sub AND a.code = dq.code
       |        WHERE dq.vec_id BETWEEN 300 AND 309 AND a.vec_id <> dq.vec_id
       |        GROUP BY 1, 2),
       |ex AS MATERIALIZED (SELECT qa.vec_id AS query_id, nb.vec_id AS neighbor_id,
       |              CAST(sum((qa.qv - nb.qv) * (qa.qv - nb.qv)) AS BIGINT) AS d2
       |       FROM q qa JOIN q nb ON nb.i = qa.i AND nb.vec_id <> qa.vec_id
       |       WHERE qa.vec_id BETWEEN 300 AND 309 GROUP BY 1, 2),
       |ext AS (SELECT query_id, neighbor_id FROM
       |        (SELECT query_id, neighbor_id,
       |                row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rn
       |         FROM ex) WHERE rn <= 5),
       |apx AS (SELECT query_id, neighbor_id FROM
       |        (SELECT query_id, neighbor_id,
       |                row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk
       |         FROM adc) WHERE rnk <= 5),
       |na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ext e
       |       JOIN apx x ON x.query_id = e.query_id AND x.neighbor_id = e.neighbor_id)
       |SELECT * FROM (
       |$arms
       |) u ORDER BY k_cand""".stripMargin
  }

  /** q127's exact IVF-ADC oracle — shared by the per-call path
    * (q127) and the persisted-index path (q211): the index must be
    * row-identical to recomputing assignment + codes from scratch.
    */
  private val IvfAdcSql: String =
    """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
    |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
    |cc AS (SELECT a.vec_id AS id, k.vec_id AS cent_id, sum(CAST(a.v AS DOUBLE) * CAST(k.v AS DOUBLE)) AS dp
    |       FROM e a JOIN e k ON k.i = a.i AND k.vec_id < 8 GROUP BY 1, 2),
    |cs AS (SELECT id, cent_id, dp / (na.nrm * nk.nrm) AS c
    |       FROM cc JOIN n na ON na.vec_id = id JOIN n nk ON nk.vec_id = cent_id),
    |asg AS (SELECT id, cent_id FROM
    |        (SELECT id, cent_id, row_number() OVER (PARTITION BY id ORDER BY c DESC, cent_id) AS rn FROM cs)
    |        WHERE rn = 1),
    |probe AS (SELECT id AS query_id, cent_id FROM
    |          (SELECT id, cent_id, row_number() OVER (PARTITION BY id ORDER BY c DESC, cent_id) AS rn
    |           FROM cs WHERE id BETWEEN 10 AND 19)
    |          WHERE rn <= 2),
    |q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
    |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
    |      FROM embeddings),
    |pv AS (SELECT vec_id, i // 8 AS sub, i % 8 AS j, qv FROM q),
    |pcb AS (SELECT vec_id AS code, sub, j, qv FROM pv WHERE vec_id < 16),
    |pd AS (SELECT pv.vec_id, pv.sub, pcb.code, sum((pv.qv - pcb.qv) * (pv.qv - pcb.qv)) AS dist
    |       FROM pv JOIN pcb ON pcb.sub = pv.sub AND pcb.j = pv.j GROUP BY 1, 2, 3),
    |pa AS (SELECT vec_id, sub, code FROM
    |       (SELECT vec_id, sub, code, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn FROM pd)
    |       WHERE rn = 1),
    |cand AS (SELECT p.query_id, ag.id AS neighbor_id FROM probe p
    |         JOIN asg ag ON ag.cent_id = p.cent_id AND ag.id <> p.query_id),
    |adc AS (SELECT c2.query_id, c2.neighbor_id, CAST(sum(dq.dist) AS BIGINT) AS adc_dist
    |        FROM cand c2 JOIN pa ON pa.vec_id = c2.neighbor_id
    |        JOIN pd dq ON dq.vec_id = c2.query_id AND dq.sub = pa.sub AND dq.code = pa.code
    |        GROUP BY 1, 2),
    |r AS (SELECT query_id, neighbor_id, adc_dist,
    |             row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk FROM adc)
    |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, adc_dist
    |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** Deterministic per-corpus-size BM25 index dir (the q199 fixture
    * convention): built once, reused by every later invocation —
    * including across JVMs, since openIndex re-registers the bucketed
    * tables from the on-disk manifest.
    */
  private def bm25IndexDir(s: SparkSession, dir: String, docs: DataFrame): String = {
    val tag = Registry.contentTag(docs, "doc_id", "text")
    val idx = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-bm25idx-v3-$tag")
    if (!Retrieval.indexExists(idx.toString))
      Retrieval.buildIndex(docs, "doc_id", "text", idx.toString, numBuckets = 8)
    idx.toString
  }

  /** Tombstone-delete fixtures: a fresh BM25 index (NOT the shared
    * q202 fixture — deletes mutate it) with every doc_id % 10 == 3
    * tombstoned. `compacted = false` is the Lucene pre-merge serving
    * state (deleted docs excluded, corpus stats stale); `true` runs
    * compactIndex so the deletes are physical and the index equals a
    * rebuild over the survivors. Two separate cached dirs so both
    * states persist across invocations.
    */
  private def bm25DeleteIndexDir(s: SparkSession, dir: String,
                                 docs: DataFrame,
                                 compacted: Boolean): String = {
    val tag = Registry.contentTag(docs, "doc_id", "text")
    val stage = if (compacted) "c" else "p"
    val idx = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-bm25del-$stage-v1-$tag")
    val marker = new java.io.File(idx, "_graft_ready")
    if (!marker.isFile || !Retrieval.indexExists(idx.toString)) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(idx)
      Retrieval.buildIndex(docs, "doc_id", "text", idx.toString, numBuckets = 8)
      val ids = docs.filter(col("doc_id") % 10 === 3)
        .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSeq
      Retrieval.deleteFromIndex(s, idx.toString, ids)
      if (compacted) Retrieval.compactIndex(s, idx.toString)
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }
    idx.toString
  }

  /** q278's oracle: the q202 scoring with FULL-corpus (stale)
    * statistics but deleted docs excluded from candidates — Lucene's
    * delete-before-merge semantics, verbatim.
    */
  private val DeletePendingBm25Sql: String = {
    val out = ExplicitBm25Sql.replace(
      "CROSS JOIN st\n       GROUP BY 1, 2)",
      "CROSS JOIN st\n       WHERE tf.doc_id % 10 <> 3\n       GROUP BY 1, 2)")
    require(out != ExplicitBm25Sql, "delete-filter injection failed")
    out
  }

  /** q279's oracle: the q202 scoring recomputed over the surviving
    * corpus — what a post-merge (compacted) index must equal.
    */
  private val DeleteCompactedBm25Sql: String = {
    val out = ExplicitBm25Sql.replace(
      "FROM documents", "FROM documents WHERE doc_id % 10 <> 3")
    require(out != ExplicitBm25Sql, "survivor-filter injection failed")
    out
  }

  /** q281's oracle: the q84 incremental-dedup scoring with the
    * reference restricted to the SURVIVING slice — every reference doc
    * in an EVEN template group (doc_id div 50) is tombstoned, so those
    * groups lose their entire reference and their batch docs must flip
    * near_dup 1→0 (a delete set that leaves every group partially
    * covered would not change any probe answer and prove nothing).
    * Expected to hold at BOTH stages: pending (tombstones live — the
    * sidecar dead-key exclusion is precise, not stale) and compacted
    * (deletes physical). The cross-joined stage column asserts exactly
    * that.
    */
  // lazy like IncrementalDedupSql: a strict val here would force that
  // chain before `shingleSql` initializes and bake "WITH null," in
  private lazy val DedupDeleteSql: String = {
    val survivors = IncrementalDedupSql.replace(
      "WHERE id % 3 = 0", "WHERE id % 3 = 0 AND (id // 50) % 2 = 1")
    require(survivors != IncrementalDedupSql, "survivor-filter injection failed")
    val staged = survivors
      .replace("SELECT m.id AS doc_id,",
        "SELECT st.stage, m.id AS doc_id,")
      .replace("FROM m WHERE m.id % 3 <> 0 ORDER BY doc_id",
        "FROM m CROSS JOIN (SELECT 'compacted' AS stage " +
          "UNION ALL SELECT 'pending') st " +
          "WHERE m.id % 3 <> 0 ORDER BY stage, doc_id")
    require(staged != survivors, "stage injection failed")
    staged
  }

  /** Doc-level dedup-index delete fixtures: the q219-style index built
    * from the doc_id % 3 == 0 reference slice, with every reference doc
    * in an even template group tombstoned
    * ([[graft.llm.Dedup.deleteFromDedupIndex]]) — group-complete
    * deletes, so the probe answer actually changes. `compacted = false`
    * probes through the sidecar dead-key exclusion; `true` runs
    * compactDedupIndex so the deletes are physical. Two cached dirs so
    * both states persist across invocations.
    */
  private def dedupDeleteIndexDir(s: SparkSession, dir: String,
                                  docs: DataFrame,
                                  compacted: Boolean): String = {
    val tag = Registry.contentTag(docs, "doc_id", "t")
    val stage = if (compacted) "c" else "p"
    val idx = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-didxdel-$stage-v1-$tag")
    val marker = new java.io.File(idx, "_graft_ready")
    if (!marker.isFile || !Dedup.dedupIndexExists(idx.toString)) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(idx)
      Dedup.buildDedupIndex(docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "t", idx.toString, numBuckets = 8,
        shingleN = 3, numHashes = 8, rowsPerBand = 2)
      val ids = docs
        .filter(col("doc_id") % 3 === 0 && expr("doc_id div 50") % 2 === 0)
        .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSeq
      Dedup.deleteFromDedupIndex(s, idx.toString, ids)
      if (compacted) Dedup.compactDedupIndex(s, idx.toString)
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }
    idx.toString
  }

  /** q280's oracle: the q211 IVF-ADC scoring with tombstoned vectors
    * (vec_id % 10 == 7) excluded from candidates — unlike BM25, ADC
    * carries no corpus statistics, so the pre-merge result is ALREADY
    * exactly a rebuild over the survivors.
    */
  private val DeleteIvfAdcSql: String = {
    val out = IvfAdcSql.replace(
      "JOIN asg ag ON ag.cent_id = p.cent_id AND ag.id <> p.query_id",
      "JOIN asg ag ON ag.cent_id = p.cent_id AND ag.id <> p.query_id AND ag.id % 10 <> 7")
    require(out != IvfAdcSql, "delete-filter injection failed")
    out
  }

  /** Tombstone-delete ANN fixture: the annIndexDir build with every
    * vec_id % 10 == 7 deleted afterwards (cached separately — deletes
    * mutate the index).
    */
  private def annDeleteIndexDir(s: SparkSession, dir: String,
                                emb: DataFrame): String = {
    val tag = Registry.contentTag(emb, "vec_id", "embedding")
    val idx = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-anndel-v1-$tag")
    val marker = new java.io.File(idx, "_graft_ready")
    if (!marker.isFile || !VectorIndex.indexExists(idx.toString)) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(idx)
      VectorIndex.buildIndex(emb, "vec_id", "embedding",
        coarse = emb.filter(col("vec_id") < 8),
        codebook = emb.filter(col("vec_id") < 16),
        idx.toString, numBuckets = 8)
      val ids = emb.filter(col("vec_id") % 10 === 7)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
      VectorIndex.deleteFromIndex(s, idx.toString, ids)
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }
    idx.toString
  }

  /** ANN index staged through the STREAMING ingest path — the same
    * final survivor set as [[annDeleteIndexDir]] (everything except
    * vec_id % 10 == 7) arrived at via [[graft.streaming.IndexIngest]]:
    * seed build over the even vec_ids, the odd half ingested in two
    * micro-batches (each a fenced, sub-ledgered
    * `VectorIndex.appendToIndex` behind the dedup probe — every doc
    * carries a unique synthetic text so nothing dedups away), a
    * mid-stream self-compaction after batch 2 (`compactEvery = 2`
    * merges the append-grown files of all three indexes), a takedown
    * micro-batch tombstoning vec_id % 10 == 7 across BM25 + ANN, and a
    * final compaction (`compactEvery = 1`) making the deletes
    * physical. The q280 oracle must hold bit-for-bit over an index
    * that never saw a monolithic build+delete — the metamorphic pin on
    * the whole streaming ANN lifecycle.
    */
  private def annIngestIndexDir(s: SparkSession, dir: String,
                                emb: DataFrame): String = {
    val tag = Registry.contentTag(emb, "vec_id", "embedding")
    val root = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-anning-v1-$tag")
    val (didx, bidx, aidx) =
      (s"$root/didx", s"$root/bidx", s"$root/aidx")
    val marker = new java.io.File(root, "_graft_ingested")
    if (!marker.isFile || !VectorIndex.indexExists(aidx)) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(root)
      root.mkdirs()
      val docs = emb.select(col("vec_id"),
        concat_ws(" ", Seq("a", "b", "c", "d").map(sfx =>
          concat(lit("v"), col("vec_id"), lit(sfx))): _*).as("text"),
        col("embedding"))
      val seed = docs.filter(col("vec_id") % 2 === 0)
      Dedup.buildDedupIndex(seed, "vec_id", "text", didx, numBuckets = 8,
        shingleN = 3, numHashes = 8, rowsPerBand = 2)
      Retrieval.buildIndex(seed, "vec_id", "text", bidx, numBuckets = 8)
      VectorIndex.buildIndex(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding",
        coarse = emb.filter(col("vec_id") < 8),
        codebook = emb.filter(col("vec_id") < 16),
        aidx, numBuckets = 8)
      graft.streaming.IndexIngest.processBatch(
        docs.filter(col("vec_id") % 4 === 1), 1L, "vec_id", "text",
        didx, Some(bidx), dropNear = true, compactEvery = 2,
        annIndexDir = Some(aidx), vecCol = Some("embedding"))
      graft.streaming.IndexIngest.processBatch(
        docs.filter(col("vec_id") % 4 === 3), 2L, "vec_id", "text",
        didx, Some(bidx), dropNear = true, compactEvery = 2,
        annIndexDir = Some(aidx), vecCol = Some("embedding"))
      graft.streaming.IndexIngest.processDeleteBatch(
        emb.filter(col("vec_id") % 10 === 7).select(col("vec_id")),
        0L, "vec_id", bidx, Some(aidx), compactEvery = 1)
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }
    aidx
  }

  /** Deterministic per-corpus-size IVF-PQ vector index dir (the
    * bm25IndexDir convention): built once from the even vec_ids, the odd
    * half APPENDED — so every q211 run also proves appendToIndex lands
    * bucket-aligned rows identical to a full rebuild (the q127 oracle
    * covers the union).
    */
  private def annIndexDir(s: SparkSession, dir: String, emb: DataFrame): String = {
    val tag = Registry.contentTag(emb, "vec_id", "embedding")
    val idx = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-annidx-v3-$tag")
    // marker AFTER the append — a crash between build and append would
    // otherwise leave a manifest-complete half-index reused forever
    // (the q210 marker convention); the indexExists check additionally
    // rebuilds a cached dir whose layout VERSION is stale
    val marker = new java.io.File(idx, "_graft_appended")
    if (!marker.isFile || !VectorIndex.indexExists(idx.toString)) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(idx)
      VectorIndex.buildIndex(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding",
        coarse = emb.filter(col("vec_id") < 8),
        codebook = emb.filter(col("vec_id") < 16),
        idx.toString, numBuckets = 8)
      VectorIndex.appendToIndex(emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", idx.toString)
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }
    idx.toString
  }

  /** Ids feeding the fixture-synthesis tables below, spread across the
    * session's shuffle partitions first: synthesis runs REAL encoders
    * (ImageIO PNG/BMP, AVI/WAV framers) per row inside mapPartitions,
    * and a small corpus parquet arrives as ONE scan partition — without
    * the spread every encode AND the downstream decode ran single-task
    * (measured: the whole multimodal family serialized on one core at
    * sf0.1). The repartition moves 8 bytes/row — negligible at any
    * scale — and keeps the encode stage parallel at the driver's
    * lower-core bench points too.
    */
  private def synthIds(s: SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "documents").select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions).as[Long]
  }

  /** Deterministic media column: one complete solid-color bitmap per
    * document — PNG for even ids, BMP for odd — with dimensions and RGB
    * planted by arithmetic on doc_id, encoded by ImageIO on the
    * executors. The multimodal queries decode these REAL payloads and
    * their oracles predict what the decoder must recover.
    */
  private def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    synthIds(s, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val fmt = if (id % 2 == 0) "png" else "bmp"
          val w = (id % 13).toInt + 4
          val h = (id % 7).toInt + 3
          val rgb = ((id * 37 % 256).toInt << 16) | ((id * 59 % 256).toInt << 8) |
            (id * 83 % 256).toInt
          (id, graft.fixtures.FixtureBytes.solidImage(fmt, w, h, rgb))
        }
      }.toDF("doc_id", "payload")
  }

  /** Deterministic gradient-image column (png/bmp alternating): pixel
    * values are linear ramps in (x, y) seeded by doc_id arithmetic
    * ([[graft.fixtures.FixtureBytes.gradientImage]]), so everything a
    * decoder derives from sampled pixels is oracle-predictable without
    * touching bytes. Sizes cycle (16-18 × 12-13) and the gradient seed
    * cycles mod 8, planting exact-duplicate classes (ids ≡ mod 24) and
    * cross-size near-duplicates (same seed, different size) for the
    * perceptual-hash queries.
    */
  private def gradientMediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    synthIds(s, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val fmt = if (id % 2 == 0) "png" else "bmp"
          val w = (id % 3).toInt + 16
          val h = (id % 2).toInt + 12
          val seed = ((id % 8) * 29).toInt
          (id, graft.fixtures.FixtureBytes.gradientImage(fmt, w, h, seed))
        }
      }.toDF("doc_id", "payload")
  }

  /** Deterministic video column: one complete MJPEG-in-AVI container per
    * document — (doc_id % 5) + 1 solid-color JPEG frames at dimensions
    * planted by arithmetic on doc_id, encoded by ImageIO on the
    * executors. The frame-sampling query decodes these REAL payloads.
    */
  private def videoTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    synthIds(s, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val nf = (id % 5).toInt + 1
          val w = (id % 6).toInt + 8
          val h = (id % 4).toInt + 6
          val frames = (0 until nf).map { j =>
            val rgb = (((id * 31 + j * 17) % 256).toInt << 16) |
              (((id * 53 + j * 29) % 256).toInt << 8) |
              ((id * 71 + j * 41) % 256).toInt
            (w, h, rgb)
          }
          (id, graft.fixtures.FixtureBytes.mjpegAvi(frames))
        }
      }.toDF("doc_id", "payload")
  }

  /** Deterministic video column for the perceptual-fingerprint queries:
    * one AVI per document whose frames are LOSSLESS gradient BMPs
    * (JPEG quantization would break pixel-exact oracles), dimensions
    * shared with [[gradientMediaTable]] and a per-frame gradient seed
    * planted by (doc_id, frame index) arithmetic — so the whole
    * container-walk → decode → dHash → min-fold pipeline is
    * oracle-predictable, and ids sharing (mod 5, mod 3, mod 2, mod 8)
    * classes plant exact-duplicate videos.
    */
  private def gradientAviTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    synthIds(s, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val nf = (id % 5).toInt + 1
          val w = (id % 3).toInt + 16
          val h = (id % 2).toInt + 12
          val frames = (0 until nf).map { j =>
            graft.fixtures.FixtureBytes.gradientImage("bmp", w, h,
              (((id % 8) * 29 + j * 37) % 256).toInt)
          }
          (id, graft.fixtures.FixtureBytes.framesAvi(frames, w, h))
        }
      }.toDF("doc_id", "payload")
  }

  /** Deterministic audio column: one complete PCM16 WAV per document —
    * sample rate, channel count, and every interleaved sample planted by
    * arithmetic on (doc_id, flat sample index), byte-exact via
    * `FixtureBytes.pcmWav`. The audio queries decode these REAL payloads
    * and their oracles recompute the planted integer features.
    */
  private def audioTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    synthIds(s, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val ch = (id % 2).toInt + 1
          val rate = 8000 * ((id % 3).toInt + 1)
          val n = ch * ((id % 25).toInt + 40)
          val samples = Array.tabulate(n)(i =>
            ((id * 7919 + i.toLong * 104729) % 65536 - 32768).toShort)
          (id, graft.fixtures.FixtureBytes.pcmWav(rate, ch, samples))
        }
      }.toDF("doc_id", "payload")
  }

  /** Generated DuckDB oracle for q112: per n, explode the document's
    * word n-grams, group, and take max(count×strlen) (n ≤ 4, top-gram
    * mass) or sum over count ≥ 2 (n ≥ 5, duplicated mass) — the
    * explicit-SQL restatement of `Curation.gopherRepetitionRules`'
    * in-row sorted-run pass.
    */
  private def gopherRepetitionOracle: String = {
    val topBp = Map(2 -> 2000L, 3 -> 1800L, 4 -> 1600L)
    val dupBp = Map(5 -> 1500L, 6 -> 1400L, 7 -> 1300L, 8 -> 1200L,
      9 -> 1100L, 10 -> 1000L)
    val perN = (2 to 10).map { n =>
      val gram = (0 until n).map(k => s"ws[CAST(i+$k AS INT)]").mkString(" || ' ' || ")
      val agg =
        if (n <= 4) "max(c * strlen(gram))"
        else "sum(CASE WHEN c >= 2 THEN c * strlen(gram) ELSE 0 END)"
      s"""t$n AS (SELECT doc_id, unnest(range(1, len(ws) - $n + 2)) AS i, ws
         |        FROM w WHERE len(ws) >= $n),
         |g$n AS (SELECT doc_id, gram, count(*) AS c
         |        FROM (SELECT doc_id, $gram AS gram FROM t$n) GROUP BY doc_id, gram),
         |m$n AS (SELECT doc_id, $agg AS mass FROM g$n GROUP BY doc_id)""".stripMargin
    }.mkString(",\n")
    val bpCols = (2 to 10).map { n =>
      val cName = if (n <= 4) s"top${n}_bp" else s"dup${n}_bp"
      s"""CAST((20000 * coalesce(m$n.mass, 0) + b.chars) // (2 * b.chars) AS BIGINT) AS $cName"""
    }.mkString(",\n       ")
    val flagCols = (2 to 10).map { n =>
      val (cName, fName, thr) =
        if (n <= 4) (s"top${n}_bp", s"f_top$n", topBp(n))
        else (s"dup${n}_bp", s"f_dup$n", dupBp(n))
      s"""CAST((20000 * coalesce(m$n.mass, 0) + b.chars) // (2 * b.chars) > $thr AS BIGINT) AS $fName"""
    }.mkString(",\n       ")
    val keepPred = (2 to 10).map { n =>
      val thr = if (n <= 4) topBp(n) else dupBp(n)
      s"(20000 * coalesce(m$n.mass, 0) + b.chars) // (2 * b.chars) <= $thr"
    }.mkString(" AND ")
    val joins = (2 to 10).map(n => s"LEFT JOIN m$n ON m$n.doc_id = b.doc_id")
      .mkString("\n")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |b AS (SELECT doc_id, CAST(strlen(text) - (len(string_split(text, ' ')) - 1) AS BIGINT) AS chars
       |      FROM documents),
       |$perN
       |SELECT b.doc_id,
       |       $bpCols,
       |       $flagCols,
       |       CAST($keepPred AS BIGINT) AS keep
       |FROM b
       |$joins
       |ORDER BY b.doc_id""".stripMargin
  }

  /** Word-trigram shingle oracle fragment over the template corpus. */
  private val shingleSql =
    s"""m AS (SELECT doc_id AS id, $tplSql AS t FROM documents),
       |w AS (SELECT id, string_split(t, ' ') AS ws FROM m),
       |tri AS (SELECT id, unnest(range(1, len(ws)-1)) AS i, ws FROM w),
       |sh AS (SELECT id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' || ws[CAST(i+2 AS INT)] AS shingle FROM tri)""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    // ---- Exact dedup: hash-groupBy, canonical survivor = min id
    "q30_dedup_exact" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 10 < 3, lit("common document body")).otherwise(col("text")).as("content"))
        Dedup.exactGroups(docs, "doc_id", "content")
          .orderBy("content_hash")
      },
      Some("""SELECT md5(content) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_id
             |FROM (SELECT doc_id, CASE WHEN doc_id % 10 < 3 THEN 'common document body' ELSE text END AS content
             |      FROM documents)
             |GROUP BY md5(content) ORDER BY content_hash""".stripMargin)),

    // ---- Segment-level exact substring dedup (the paragraph-dedup pass
    // at 10-word-window granularity): keep only the corpus-wide first
    // occurrence of every segment, re-assemble each doc from its kept
    // segments. First-occurrence is a min(struct) agg over distinct
    // segments; reassembly one id-keyed groupBy.
    "q89_segment_dedup" -> QueryDef(
      (s, dir) => {
        Dedup.segmentDedup(table(s, dir, "documents"), "doc_id", "text", 10)
          .orderBy("id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |segs AS (SELECT doc_id, CAST(unnest(range((len(ws) + 9) // 10)) AS BIGINT) AS seg_no, ws
             |         FROM d),
             |seg2 AS (SELECT doc_id, seg_no,
             |                array_to_string(ws[seg_no * 10 + 1 : seg_no * 10 + 10], ' ') AS seg
             |         FROM segs),
             |firsts AS (SELECT seg, min(doc_id * 4294967296 + seg_no) AS first_key
             |           FROM seg2 GROUP BY seg),
             |k AS (SELECT s.doc_id, s.seg_no, s.seg,
             |             (s.doc_id * 4294967296 + s.seg_no = f.first_key) AS keep
             |      FROM seg2 s JOIN firsts f ON s.seg = f.seg)
             |SELECT doc_id AS id, count(*) AS n_segments,
             |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |       string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY seg_no) AS deduped_text
             |FROM k GROUP BY doc_id ORDER BY id""".stripMargin)),

    // ---- MinHash + LSH near-dup candidates (shingle→minhash→band→join).
    // Signatures depend only on the text, so duplicate-heavy corpora are
    // collapsed to canonical texts first and doc pairs re-expanded through
    // the membership join — join strategy left to the planner/AQE
    // (identical texts always share all bands).
    "q31_dedup_minhash_lsh" -> QueryDef(
      (s, dir) => {
        Dedup.collapsedLshPairs(docsTpl(s, dir), "doc_id", "t",
            shingleN = 3, numHashes = 8, rowsPerBand = 2)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $shingleSql,
              |sig AS (SELECT id, k, min(md5(CAST(k AS VARCHAR) || ':' || shingle)) AS mh
              |        FROM sh, (SELECT unnest(range(0, 8)) AS k) ks GROUP BY id, k),
              |bands AS (SELECT id, k // 2 AS band, md5(string_agg(mh, ',' ORDER BY k)) AS bk
              |          FROM sig GROUP BY id, k // 2)
              |SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
              |FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- SimHash signatures (60-bit, token-vote)
    "q32_dedup_simhash" -> QueryDef(
      (s, dir) => {
        Dedup.simHash(table(s, dir, "documents"), "doc_id", "text")
          .select(col("id").as("doc_id"), col("simhash"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS hv FROM toks),
             |bits AS (SELECT doc_id, j, sum(CASE WHEN (hv >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
             |         FROM h, (SELECT unnest(range(0, 60)) AS j) js GROUP BY doc_id, j)
             |SELECT doc_id,
             |CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- SimHash near-dup pairs: band the 60-bit signature 4x15,
    // candidates share a band, survivors are within hamming <= 3.
    "q82_simhash_pairs" -> QueryDef(
      (s, dir) => {
        Dedup.simHashPairs(table(s, dir, "documents"), "doc_id", "text",
            nBands = 4, bandBits = 15, maxHamming = 3)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS hv FROM toks),
             |bits AS (SELECT doc_id, j, sum(CASE WHEN (hv >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
             |         FROM h, (SELECT unnest(range(0, 60)) AS j) js GROUP BY doc_id, j),
             |sig AS (SELECT doc_id, CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS sh
             |        FROM bits GROUP BY doc_id),
             |bands AS (SELECT doc_id, sh, b, (sh >> CAST(15 * b AS INT)) & 32767 AS bk
             |          FROM sig, (SELECT unnest(range(0, 4)) AS b) bs),
             |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sa, b.sh AS sb
             |         FROM bands a JOIN bands b ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id)
             |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
             |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- Exact n-gram Jaccard near-dup pairs (integer inter/union).
    // Scale shape: duplicate-heavy corpora collapse to canonical texts
    // first (30 here), pairwise Jaccard runs on those, and doc pairs are
    // re-expanded through the membership join — strategy left to the
    // planner/AQE, which broadcasts when a side measures small — turning
    // the skewed all-docs shingle self-join into a tiny one. Result is
    // identical to the naive pairwise form the oracle computes.
    "q33_dedup_ngram_jaccard" -> QueryDef(
      (s, dir) => {
        val docs = docsTpl(s, dir)
        // membership/sh feed multiple join branches — persist so the
        // corpus scans and shingle shuffles run once (see collapsedLshPairs)
        val membership = graft.llm.CacheRegistry.persist(
          docs.select(col("doc_id"), md5(col("t")).as("tid")))
        val texts = docs.select(md5(col("t")).as("tid"), col("t")).distinct()
        val sh = graft.llm.CacheRegistry.persist(
          Dedup.shingles(texts.withColumnRenamed("tid", "doc_id"), "doc_id", "t", 3))
        val textPairs = Dedup.ngramJaccardPairs(sh)
          .filter(col("inter_count") * 2 >= col("union_count"))
        val sizes = sh.select(col("id"), col("shingle")).distinct()
          .groupBy(col("id")).agg(count(lit(1)).as("n"))
        // cross-text doc pairs (normalize doc order)
        val cross = textPairs
          .join(membership.select(col("doc_id").as("d1"), col("tid").as("id_a")), Seq("id_a"))
          .join(membership.select(col("doc_id").as("d2"), col("tid").as("id_b")), Seq("id_b"))
          .select(least(col("d1"), col("d2")).as("doc_a"), greatest(col("d1"), col("d2")).as("doc_b"),
            col("inter_count"), col("union_count"))
        // same-text doc pairs: J = 1 by construction. One shuffle
        // (groupBy tid) + in-row pair expansion, not a self-join.
        val m2 = membership.join(sizes, membership("tid") === sizes("id"))
        val same = m2.groupBy(col("tid"))
          .agg(sort_array(collect_list(col("doc_id"))).as("ids"), first(col("n")).as("n"))
          .filter(size(col("ids")) >= 2)
          .select(col("n"), explode(expr(
            """flatten(transform(sequence(0, size(ids) - 2),
              |  i -> transform(sequence(i + 1, size(ids) - 1),
              |    j -> struct(ids[i] AS doc_a, ids[j] AS doc_b))))""".stripMargin)).as("p"))
          .select(col("p.doc_a"), col("p.doc_b"),
            col("n").as("inter_count"), col("n").as("union_count"))
        cross.union(same).orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $shingleSql,
              |ds AS (SELECT DISTINCT id, shingle FROM sh),
              |sizes AS (SELECT id, count(*) AS n FROM ds GROUP BY id),
              |inter AS (SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS inter_count
              |          FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.id < b.id
              |          GROUP BY a.id, b.id)
              |SELECT doc_a, doc_b, inter_count, (na.n + nb.n - inter_count) AS union_count
              |FROM inter JOIN sizes na ON na.id = doc_a JOIN sizes nb ON nb.id = doc_b
              |WHERE inter_count * 2 >= (na.n + nb.n - inter_count)
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- Brute-force cosine top-k (exact ANN baseline)
    "q34_embed_cosine_topk" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        Similarity.cosineTopK(emb, "vec_id", "embedding", queries, 5)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"),
            round(col("score"), 4).as("score"))
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |d AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             |             sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dp
             |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
             |      GROUP BY a.vec_id, b.vec_id),
             |sc AS (SELECT query_id, neighbor_id, dp / (na.nrm * nb.nrm) AS score
             |       FROM d JOIN n na ON na.vec_id = query_id JOIN n nb ON nb.vec_id = neighbor_id
             |       WHERE nb.nrm <> 0),
             |r AS (SELECT query_id, neighbor_id,
             |             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk, score
             |      FROM sc)
             |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, round(score, 4) AS score
             |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    // ---- Hard-negative mining: per labeled query, the 3 most-similar
    // corpus vectors with a DIFFERENT label — the near-the-margin
    // negatives a contrastive batch needs (random negatives are
    // trivially far and carry no gradient).
    "q275_hard_negatives" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
            emb.filter(col("vec_id") < 10), k = 3)
          .select(col("query_id"), col("query_label"), col("neighbor_id"),
            col("neighbor_label"), col("rank").as("rnk"),
            round(col("score"), 4).as("score"))
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
             |d AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             |             sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dp
             |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
             |      GROUP BY 1, 2),
             |sc AS (SELECT query_id, la.label AS query_label, neighbor_id,
             |              nb2.label AS neighbor_label, dp / (na.nrm * nb.nrm) AS score
             |       FROM d JOIN n na ON na.vec_id = query_id JOIN n nb ON nb.vec_id = neighbor_id
             |       JOIN lb la ON la.vec_id = query_id JOIN lb nb2 ON nb2.vec_id = neighbor_id
             |       WHERE nb.nrm <> 0 AND la.label <> nb2.label),
             |r AS (SELECT query_id, query_label, neighbor_id, neighbor_label, score,
             |             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
             |      FROM sc)
             |SELECT query_id, query_label, neighbor_id, neighbor_label,
             |       CAST(rnk AS INT) AS rnk, round(score, 4) AS score
             |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin)),

    // ---- Retrieval-eval metrics: the exact-cosine top-10 judged
    // against same-label relevance — hits@10, first relevant rank,
    // reciprocal rank (micro), precision@10 (bp), all integer-exact;
    // queries with no relevant hit report rr 0 (the MRR convention).
    "q276_ranking_metrics" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 10)
        val ranked = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
          .select(col("query_id").as("qid"), col("neighbor_id").as("id"),
            col("rank").as("rnk"))
        val rel = q.select(col("vec_id").as("qid"),
            col("label").cast("long").as("ql"))
          .join(emb.select(col("vec_id").as("id"),
            col("label").cast("long").as("nl")), col("ql") === col("nl"))
          .filter(col("qid") =!= col("id"))
          .select(col("qid"), col("id"))
        Retrieval.rankingMetrics(ranked, rel,
            q.select(col("vec_id").as("qid")), k = 10)
          .orderBy("qid")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |d AS (SELECT a.vec_id AS qid, b.vec_id AS id,
             |             sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dp
             |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
             |      GROUP BY 1, 2),
             |sc AS (SELECT qid, id, dp / (na.nrm * nb.nrm) AS score
             |       FROM d JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = id
             |       WHERE nb.nrm <> 0),
             |r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rnk
             |      FROM sc),
             |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
             |per AS (SELECT r.qid, CAST(count(*) AS BIGINT) AS n_rel_in_k,
             |               CAST(min(r.rnk) AS BIGINT) AS first_rel_rank
             |        FROM r JOIN lb lq ON lq.vec_id = r.qid
             |        JOIN lb ln2 ON ln2.vec_id = r.id
             |        WHERE r.rnk <= 10 AND lq.label = ln2.label
             |        GROUP BY 1)
             |SELECT q.vec_id AS qid,
             |       CAST(COALESCE(per.n_rel_in_k, 0) AS BIGINT) AS n_rel_in_k,
             |       per.first_rel_rank,
             |       CAST(CASE WHEN per.first_rel_rank IS NULL THEN 0
             |            ELSE (2000000 + per.first_rel_rank) // (2 * per.first_rel_rank)
             |            END AS BIGINT) AS rr_micro,
             |       CAST((20000 * COALESCE(per.n_rel_in_k, 0) + 10) // 20 AS BIGINT) AS prec_bp
             |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) q
             |LEFT JOIN per ON per.qid = q.vec_id
             |ORDER BY qid""".stripMargin)),

    // ---- Binary nDCG@10 over the same eval chain as q276: per-rank
    // discounts 10^6/log2(r+1) once-rounded on the driver and replayed
    // verbatim by the oracle — position-weighted ranking quality,
    // integer-exact end to end.
    "q277_ndcg" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 10)
        val ranked = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
          .select(col("query_id").as("qid"), col("neighbor_id").as("id"),
            col("rank").as("rnk"))
        val rel = q.select(col("vec_id").as("qid"),
            col("label").cast("long").as("ql"))
          .join(emb.select(col("vec_id").as("id"),
            col("label").cast("long").as("nl")), col("ql") === col("nl"))
          .filter(col("qid") =!= col("id"))
          .select(col("qid"), col("id"))
        Retrieval.ndcgAtK(ranked, rel, q.select(col("vec_id").as("qid")),
            k = 10)
          .orderBy("qid")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |d AS (SELECT a.vec_id AS qid, b.vec_id AS id,
             |             sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dp
             |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
             |      GROUP BY 1, 2),
             |sc AS (SELECT qid, id, dp / (na.nrm * nb.nrm) AS score
             |       FROM d JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = id
             |       WHERE nb.nrm <> 0),
             |r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rnk
             |      FROM sc),
             |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
             |disc AS (SELECT CAST(g.r AS BIGINT) AS rnk,
             |                CAST(round(1000000.0 * ln(2) / ln(g.r + 1)) AS BIGINT) AS w
             |         FROM (SELECT unnest(range(1, 11)) AS r) g),
             |dcg AS (SELECT r.qid, CAST(sum(disc.w) AS BIGINT) AS dcg
             |        FROM r JOIN lb lq ON lq.vec_id = r.qid
             |        JOIN lb ln2 ON ln2.vec_id = r.id
             |        JOIN disc ON disc.rnk = r.rnk
             |        WHERE r.rnk <= 10 AND lq.label = ln2.label
             |        GROUP BY 1),
             |nrel AS (SELECT lq.vec_id AS qid, CAST(count(*) AS BIGINT) AS nrel
             |         FROM (SELECT vec_id, label FROM lb WHERE vec_id < 10) lq
             |         JOIN lb ln2 ON ln2.label = lq.label AND ln2.vec_id <> lq.vec_id
             |         GROUP BY 1),
             |idcg AS (SELECT nrel.qid, CAST(sum(disc.w) AS BIGINT) AS idcg
             |         FROM nrel JOIN disc ON disc.rnk <= least(nrel.nrel, 10)
             |         GROUP BY 1)
             |SELECT q.vec_id AS qid,
             |       CAST(COALESCE(dcg.dcg, 0) AS BIGINT) AS dcg_micro,
             |       idcg.idcg AS idcg_micro,
             |       CAST(CASE WHEN idcg.idcg IS NULL THEN NULL
             |            ELSE (20000 * COALESCE(dcg.dcg, 0) + idcg.idcg) // (2 * idcg.idcg)
             |            END AS BIGINT) AS ndcg_bp
             |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) q
             |LEFT JOIN dcg ON dcg.qid = q.vec_id
             |LEFT JOIN idcg ON idcg.qid = q.vec_id
             |ORDER BY qid""".stripMargin)),

    // ---- LSH-bucketed ANN (sign random projections, md5-seeded planes)
    "q35_ann_lsh_bucketed" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10).select(col("vec_id"))
        Similarity.lshTopK(emb, "vec_id", "embedding", queries, 5, 8)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"),
            round(col("score"), 4).as("score"))
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |p AS (SELECT j, i, CASE WHEN CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1) AS INT) % 2 = 1
             |                        THEN 1.0 ELSE -1.0 END AS pv
             |      FROM (SELECT unnest(range(0, 8)) AS j) js, (SELECT unnest(range(0, 64)) AS i) xs),
             |proj AS (SELECT vec_id, j, sum(CAST(v AS DOUBLE) * pv) AS pr
             |         FROM e JOIN p ON p.i = e.i - 1 GROUP BY vec_id, j),
             |b AS (SELECT vec_id, CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS bucket
             |      FROM proj GROUP BY vec_id),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |d AS (SELECT a.vec_id AS query_id, b2.vec_id AS neighbor_id,
             |             sum(CAST(a.v AS DOUBLE) * CAST(b2.v AS DOUBLE)) AS dp
             |      FROM e a JOIN b ba ON ba.vec_id = a.vec_id AND a.vec_id < 10
             |      JOIN b bb ON bb.bucket = ba.bucket
             |      JOIN e b2 ON b2.vec_id = bb.vec_id AND b2.i = a.i AND b2.vec_id <> a.vec_id
             |      GROUP BY a.vec_id, b2.vec_id),
             |sc AS (SELECT query_id, neighbor_id, dp / (na.nrm * nb.nrm) AS score
             |       FROM d JOIN n na ON na.vec_id = query_id JOIN n nb ON nb.vec_id = neighbor_id
             |       WHERE nb.nrm <> 0),
             |r AS (SELECT query_id, neighbor_id,
             |             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk, score
             |      FROM sc)
             |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, round(score, 4) AS score
             |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    // ---- IVF ANN: coarse-quantizer inverted lists, 2-probe search.
    // Deterministic codebook = embeddings 0..7 (a k-means output at scale).
    "q50_ivf_ann" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val centroids = emb.filter(col("vec_id") < 8)
        val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
        Similarity.ivfTopK(emb, "vec_id", "embedding", centroids, queries, 5, 2)
          .select(col("query_id"), col("neighbor_id"), col("rank").cast("int").as("rnk"),
            round(col("score"), 4).as("score"))
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |cc AS (SELECT a.vec_id AS id, k.vec_id AS cent_id, sum(CAST(a.v AS DOUBLE) * CAST(k.v AS DOUBLE)) AS dp
             |       FROM e a JOIN e k ON k.i = a.i AND k.vec_id < 8 GROUP BY 1, 2),
             |cs AS (SELECT id, cent_id, dp / (na.nrm * nk.nrm) AS c
             |       FROM cc JOIN n na ON na.vec_id = id JOIN n nk ON nk.vec_id = cent_id),
             |asg AS (SELECT id, cent_id FROM
             |        (SELECT id, cent_id, row_number() OVER (PARTITION BY id ORDER BY c DESC, cent_id) AS rn FROM cs)
             |        WHERE rn = 1),
             |probe AS (SELECT id AS query_id, cent_id FROM
             |          (SELECT id, cent_id, row_number() OVER (PARTITION BY id ORDER BY c DESC, cent_id) AS rn
             |           FROM cs WHERE id BETWEEN 10 AND 19)
             |          WHERE rn <= 2),
             |cand AS (SELECT p.query_id, a.id AS neighbor_id FROM probe p
             |         JOIN asg a ON a.cent_id = p.cent_id AND a.id <> p.query_id), -- q50
             |d AS (SELECT c.query_id, c.neighbor_id, sum(CAST(qa.v AS DOUBLE) * CAST(nb.v AS DOUBLE)) AS dp
             |      FROM cand c JOIN e qa ON qa.vec_id = c.query_id
             |      JOIN e nb ON nb.vec_id = c.neighbor_id AND nb.i = qa.i
             |      GROUP BY 1, 2),
             |sc AS (SELECT query_id, neighbor_id, dp / (nq.nrm * nn.nrm) AS score
             |       FROM d JOIN n nq ON nq.vec_id = query_id JOIN n nn ON nn.vec_id = neighbor_id),
             |r AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk, score
             |      FROM sc)
             |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, round(score, 4) AS score
             |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    // ---- K-means Lloyd step (trains the IVF codebook): deterministic
    // md5-smallest seeds, integer-exact argmin assignment against seed
    // literals (narrow scan, zero corpus shuffles), one bounded
    // (cluster, dim) aggregation for the exact centroid update.
    "q92_kmeans_step" -> QueryDef(
      (s, dir) => {
        Similarity.kmeansStep(table(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
          .orderBy("cluster_id", "dim")
      },
      Some("""WITH seeds AS (
             |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
             |         embedding AS sv
             |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
             |q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
             |      FROM embeddings),
             |sq AS (SELECT cid, CAST(generate_subscripts(sv, 1) - 1 AS BIGINT) AS dim,
             |              CAST(round(CAST(unnest(sv) AS DOUBLE) * 10000.0) AS BIGINT) AS qs
             |       FROM seeds),
             |kd AS (SELECT q.vec_id, sq.cid, sum((q.qv - sq.qs) * (q.qv - sq.qs)) AS dist
             |       FROM q JOIN sq ON q.dim = sq.dim GROUP BY 1, 2),
             |ka AS (SELECT vec_id, cid,
             |              row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
             |       FROM kd),
             |kj AS (SELECT ka.cid AS cluster_id, q.dim, q.qv
             |       FROM ka JOIN q USING (vec_id) WHERE ka.rn = 1)
             |SELECT cluster_id, dim, count(*) AS n,
             |       CAST(CAST(sign(sum(qv)) AS BIGINT)
             |            * ((2 * abs(sum(qv)) + count(*)) // (2 * count(*))) AS DOUBLE)
             |         / 10000.0 AS mean
             |FROM kj GROUP BY 1, 2 ORDER BY cluster_id, dim""".stripMargin)),

    // ---- Language ID (stopword heuristic)
    "q36_lang_id" -> QueryDef(
      (s, dir) => {
        TextAnalysis.langId(table(s, dir, "documents"), "doc_id", "text")
          .select(col("id").as("doc_id"), col("lang_pred"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |hits AS (SELECT doc_id, l.lang, count(*) AS c FROM toks
             |         JOIN (VALUES ('en','the'),('en','and'),('en','of'),('en','to'),('en','in'),
             |                      ('es','el'),('es','la'),('es','de'),('es','que'),('es','y'),
             |                      ('de','der'),('de','die'),('de','und'),('de','das'),('de','ist'),
             |                      ('fr','le'),('fr','les'),('fr','des'),('fr','et'),('fr','une')) l(lang, sw)
             |         ON tok = sw GROUP BY doc_id, l.lang),
             |best AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang) AS rn FROM hits)
             |SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred
             |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- Quality metrics (exact integer counters + bucket)
    "q37_quality_score" -> QueryDef(
      (s, dir) => {
        TextAnalysis.qualityMetrics(table(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |CAST(length(text) AS BIGINT) AS n_chars,
             |CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
             |CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
             |CAST(len(list_filter(string_split(text, ' '), x -> x IN
             |  ('the','and','of','to','in','el','la','de','que','y','der','die','und','das','ist','le','les','des','et','une'))) AS BIGINT) AS n_stopwords,
             |CASE WHEN len(string_split(text, ' ')) < 5 THEN 'too_short'
             |     WHEN len(list_filter(string_split(text, ' '), x -> x IN
             |       ('the','and','of','to','in','el','la','de','que','y','der','die','und','das','ist','le','les','des','et','une'))) * 10 < len(string_split(text, ' '))
             |     THEN 'low_stopword' ELSE 'ok' END AS quality_bucket
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Token counting (whitespace + BPE-ish regex pieces)
    "q38_token_counts" -> QueryDef(
      (s, dir) => {
        TextAnalysis.tokenCounts(table(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe_pieces
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- TF-IDF top-3 keywords (integer-deterministic ranking)
    "q51_tfidf_keywords" -> QueryDef(
      (s, dir) => {
        TextAnalysis.tfidfTopTerms(table(s, dir, "documents"), "doc_id", "text", 3)
          .select(col("id").as("doc_id"), col("rank").cast("int").as("rnk"),
            col("term").as("top_term"), col("tf"), col("df"),
            round(col("tfidf"), 4).as("tfidf"))
          .orderBy("doc_id", "rnk")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
             |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df, tf.tf * ln(nd / df.df) AS tfidf
             |       FROM tf JOIN df USING (term), n),
             |r AS (SELECT sc.*, row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC) AS rn FROM sc)
             |SELECT doc_id, CAST(rn AS INT) AS rnk, term AS top_term, tf, df, round(tfidf, 4) AS tfidf
             |FROM r WHERE rn <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    // ---- PII redaction (email → phone → IPv4, counts on original text).
    // PII is planted deterministically from doc fields so both engines
    // see byte-identical input; regexes are RE2-compatible (Curation).
    "q52_pii_redact" -> QueryDef(
      (s, dir) => {
        val msg = concat(
          lit("contact "),
          when(col("doc_id") % 3 < 2,
            concat(lit("user"), col("doc_id").cast("string"), lit("@corp"),
              (col("doc_id") % 7).cast("string"), lit(".example.com")))
            .otherwise(lit("nobody")),
          lit(" tel "),
          when(col("doc_id") % 2 === 0,
            concat(lit("+1 415 555 "), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("none")),
          lit(" from 10."), (col("doc_id") % 200).cast("string"),
          lit(".0."), (col("doc_id") % 250).cast("string"),
          lit(" via "), col("source"))
        Curation.redactPii(
            table(s, dir, "documents").select(col("doc_id"), msg.as("msg")), "doc_id", "msg")
          .select(col("id").as("doc_id"), col("clean"),
            col("n_emails"), col("n_phones"), col("n_ips"))
          .orderBy("doc_id")
      },
      Some(s"""WITH m AS (SELECT doc_id,
             |  'contact ' || CASE WHEN doc_id % 3 < 2 THEN 'user' || CAST(doc_id AS VARCHAR) || '@corp' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' ELSE 'nobody' END ||
             |  ' tel ' || CASE WHEN doc_id % 2 = 0 THEN '+1 415 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE 'none' END ||
             |  ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) ||
             |  ' via ' || source AS msg FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(msg,
             |    '${Curation.EmailRe}', '[EMAIL]', 'g'),
             |    '${Curation.PhoneRe}', '[PHONE]', 'g'),
             |    '${Curation.Ipv4Re}', '[IP]', 'g') AS clean,
             |  CAST(len(regexp_extract_all(msg, '${Curation.EmailRe}')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(msg, '${Curation.PhoneRe}')) AS BIGINT) AS n_phones,
             |  CAST(len(regexp_extract_all(msg, '${Curation.Ipv4Re}')) AS BIGINT) AS n_ips
             |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- Repetition signals (Gopher-style): dup-word and top-bigram
    // stats per document; ties on the top bigram break lexicographically.
    "q53_repetition_stats" -> QueryDef(
      (s, dir) => {
        Curation.repetitionStats(table(s, dir, "documents"), "doc_id", "text")
          .select(col("id").as("doc_id"), col("total_words"), col("distinct_words"),
            col("top_bigram"), col("top_bigram_n"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |tot AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS total_words,
             |               CAST(len(list_distinct(ws)) AS BIGINT) AS distinct_words FROM w),
             |bg AS (SELECT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] AS bg
             |       FROM (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws FROM w)),
             |cnt AS (SELECT doc_id, bg, count(*) AS bg_n FROM bg GROUP BY 1, 2),
             |top AS (SELECT doc_id, bg AS top_bigram, bg_n AS top_bigram_n,
             |        row_number() OVER (PARTITION BY doc_id ORDER BY bg_n DESC, bg ASC) AS rn FROM cnt)
             |SELECT t.doc_id, total_words, distinct_words, top_bigram, CAST(top_bigram_n AS BIGINT) AS top_bigram_n
             |FROM tot t JOIN top USING (doc_id) WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // ---- Deterministic stratified sampling: md5-prefix thresholds per
    // stratum (en downsampled ~9%, others ~25%) — a scan-level predicate,
    // stable under retries/resume, no RNG.
    "q54_hash_sample" -> QueryDef(
      (s, dir) => {
        Curation.hashSample(table(s, dir, "documents"),
            col("doc_id"), col("lang"), Map("en" -> "18"), "40")
          .select(col("doc_id"), col("lang"), col("sample_key"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS sample_key
             |FROM documents
             |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < CASE WHEN lang = 'en' THEN '18' ELSE '40' END
             |ORDER BY doc_id""".stripMargin)),

    // ---- Greedy sequence packing per language stratum (capacity 500
    // whitespace tokens; oversized docs get their own bin). The oracle
    // replays the same sequential walk as a recursive CTE.
    "q55_sequence_pack" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("lang"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("toks"))
        Curation.packGreedy(docs, "lang", "doc_id", "toks", 500L)
          .orderBy("lang", "doc_id")
      },
      Some("""WITH RECURSIVE s AS (
             |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |  FROM documents),
             |r AS (
             |  SELECT lang, doc_id, toks, rn, CAST(0 AS BIGINT) AS bin, toks AS fill_after
             |  FROM s WHERE rn = 1
             |  UNION ALL
             |  SELECT s.lang, s.doc_id, s.toks, s.rn,
             |         CASE WHEN r.fill_after + s.toks > 500 THEN r.bin + 1 ELSE r.bin END,
             |         CASE WHEN r.fill_after + s.toks > 500 THEN s.toks ELSE r.fill_after + s.toks END
             |  FROM r JOIN s ON s.lang = r.lang AND s.rn = r.rn + 1)
             |SELECT lang, doc_id, toks, bin, fill_after FROM r ORDER BY lang, doc_id""".stripMargin)),

    // ---- Composite quality gate: integer-arithmetic rules, failed-rule
    // list in stable order, keep flag. One narrow pass, no shuffle.
    "q57_quality_gate" -> QueryDef(
      (s, dir) => {
        Curation.qualityGate(table(s, dir, "documents"), "doc_id", "text")
          .select(col("doc_id"), col("n_tokens"), col("dup_words"),
            col("top_bigram_n"), col("n_stopwords"), col("reasons"),
            col("keep").cast("long").as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
             |m AS (SELECT doc_id, text, CAST(len(ws) AS BIGINT) AS total,
             |             CAST(len(list_distinct(ws)) AS BIGINT) AS dst,
             |             CAST(len(list_filter(ws, x -> x IN ('the','a','and','of','to','in'))) AS BIGINT) AS stop_n
             |      FROM w),
             |bg AS (SELECT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] AS bg
             |       FROM (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws FROM w)),
             |tn AS (SELECT doc_id, max(n) AS top_n
             |       FROM (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2) GROUP BY doc_id),
             |sig AS (SELECT m.doc_id, total AS n_tokens, (total - dst) AS dup_words,
             |               CAST(COALESCE(tn.top_n, 0) AS BIGINT) AS top_bigram_n, stop_n AS n_stopwords,
             |               concat_ws(',',
             |                 CASE WHEN text IS NULL THEN 'null_text' END,
             |                 CASE WHEN total < 20 THEN 'too_short' END,
             |                 CASE WHEN (total - dst) * 2 > total THEN 'high_dup' END,
             |                 CASE WHEN COALESCE(tn.top_n, 0) * 8 > total THEN 'bigram_repeat' END,
             |                 CASE WHEN stop_n * 10 < total THEN 'stopword_poor' END) AS reasons
             |        FROM m LEFT JOIN tn ON m.doc_id = tn.doc_id)
             |SELECT doc_id, n_tokens, dup_words, top_bigram_n, n_stopwords, reasons,
             |       CASE WHEN reasons = '' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS keep
             |FROM sig ORDER BY doc_id""".stripMargin)),

    // ---- Corpus-wide top-20 bigrams (map-side partial agg + top-k)
    "q58_top_ngrams" -> QueryDef(
      (s, dir) => {
        Curation.topNgrams(table(s, dir, "documents"), "text", 2, 20)
          .orderBy(col("n").desc, col("gram").asc)
      },
      Some("""WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents
             |           WHERE len(string_split(text, ' ')) >= 2),
             |bg AS (SELECT ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] AS gram
             |       FROM (SELECT unnest(range(1, len(ws))) AS i, ws FROM w))
             |SELECT gram, count(*) AS n FROM bg GROUP BY gram
             |ORDER BY n DESC, gram ASC LIMIT 20""".stripMargin)),

    // ---- Int8 embedding quantization (symmetric, scale = max |x|)
    "q59_embed_quantize" -> QueryDef(
      (s, dir) => {
        Similarity.quantizeInt8(table(s, dir, "embeddings"), "vec_id", "embedding")
          .select(col("id").as("vec_id"), col("l2_norm"), col("scale"), col("q8"))
          .orderBy("vec_id")
      },
      Some("""WITH s AS (SELECT vec_id, embedding,
             |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale_raw
             |  FROM embeddings)
             |SELECT vec_id,
             |  round(sqrt(list_sum(list_transform(embedding,
             |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
             |  round(scale_raw, 4) AS scale,
             |  array_to_string(list_transform(embedding, x -> CAST(round(
             |    CASE WHEN scale_raw = 0 THEN 0.0
             |         ELSE CAST(x AS DOUBLE) * 127.0 / scale_raw END) AS BIGINT)), ',') AS q8
             |FROM s ORDER BY vec_id""".stripMargin)),

    // ---- Near-dup cluster assignment: connected components over a
    // deterministic pair graph (chains + long-range links exercise
    // transitive closure, not just cliques). component = min reachable
    // id == the canonical survivor; the oracle replays reachability as a
    // recursive CTE.
    "q56_dedup_clusters" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents").select(col("doc_id"))
        val maxId = docs.agg(max("doc_id")).first().getLong(0)
        val e1 = docs.filter(col("doc_id") % 7 < 2 && col("doc_id") + 1 <= maxId)
          .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        val e2 = docs.filter(col("doc_id") % 13 === 0 && col("doc_id") + 50 <= maxId)
          .select(col("doc_id").as("a"), (col("doc_id") + 50).as("b"))
        Dedup.connectedComponents(e1.union(e2), "a", "b")
          .select(col("id").as("doc_id"), col("comp").as("component"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE e0 AS (
             |  SELECT doc_id AS u, doc_id + 1 AS v FROM documents
             |  WHERE doc_id % 7 < 2 AND doc_id + 1 <= (SELECT max(doc_id) FROM documents)
             |  UNION ALL
             |  SELECT doc_id, doc_id + 50 FROM documents
             |  WHERE doc_id % 13 = 0 AND doc_id + 50 <= (SELECT max(doc_id) FROM documents)),
             |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
             |nodes AS (SELECT DISTINCT u AS id FROM e),
             |r AS (
             |  SELECT id AS src, id AS dst FROM nodes
             |  UNION
             |  SELECT r.src, e.v FROM r JOIN e ON e.u = r.dst)
             |SELECT src AS doc_id, min(dst) AS component FROM r GROUP BY src ORDER BY doc_id""".stripMargin)),

    // ---- Document fingerprinting (min-md5 over word 5-grams)
    "q39_fingerprint" -> QueryDef(
      (s, dir) => {
        TextAnalysis.fingerprint(table(s, dir, "documents"), "doc_id", "text")
          .select(col("id").as("doc_id"), col("fingerprint"), col("n_grams"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |g AS (SELECT doc_id, unnest(range(1, len(ws)-3)) AS i, ws FROM w),
             |sh AS (SELECT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' || ws[CAST(i+2 AS INT)]
             |              || ' ' || ws[CAST(i+3 AS INT)] || ' ' || ws[CAST(i+4 AS INT)] AS shingle FROM g)
             |SELECT doc_id, min(md5(shingle)) AS fingerprint, count(DISTINCT shingle) AS n_grams
             |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Embedding-cosine near-dup pairs (LSH-bucket blocked). The
    // synthetic corpus has no natural near-dups (max background cosine
    // ~0.51), so every 20th vector gets a deterministically perturbed
    // copy (±0.15% element-wise, cosine ~0.99999) — both engines build
    // the same corpus, so the pair set is exact.
    "q47_dedup_embed_cosine" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val dups = emb.filter(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            expr("transform(embedding, (x, i) -> CAST(x * (1.0D + (CAST(i % 7 AS DOUBLE) - 3.0D) * 0.0005D) AS FLOAT))")
              .as("embedding"))
        val corpus = emb.select(col("vec_id"), col("embedding")).union(dups)
        Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 8, 0.99)
          .select(col("id_a"), col("id_b"), round(col("score"), 4).as("score"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH base AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |e AS (
             |  SELECT vec_id, i, v FROM base
             |  UNION ALL
             |  SELECT vec_id + 1000000, i,
             |         CAST(v * (1.0 + (CAST((i-1) % 7 AS DOUBLE) - 3.0) * 0.0005) AS FLOAT)
             |  FROM base WHERE vec_id % 20 = 0
             |),
             |p AS (SELECT j, i, CASE WHEN CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1) AS INT) % 2 = 1
             |                        THEN 1.0 ELSE -1.0 END AS pv
             |      FROM (SELECT unnest(range(0, 8)) AS j) js, (SELECT unnest(range(0, 64)) AS i) xs),
             |proj AS (SELECT vec_id, j, sum(CAST(v AS DOUBLE) * pv) AS pr FROM e JOIN p ON p.i = e.i - 1 GROUP BY vec_id, j),
             |b AS (SELECT vec_id, CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS bucket
             |      FROM proj GROUP BY vec_id),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |d AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b, sum(CAST(a.v AS DOUBLE) * CAST(b2.v AS DOUBLE)) AS dp
             |      FROM e a JOIN b ba ON ba.vec_id = a.vec_id
             |      JOIN b bb ON bb.bucket = ba.bucket AND bb.vec_id > a.vec_id
             |      JOIN e b2 ON b2.vec_id = bb.vec_id AND b2.i = a.i
             |      GROUP BY 1, 2),
             |sc AS (SELECT id_a, id_b, dp / (na.nrm * nb.nrm) AS score
             |       FROM d JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b)
             |SELECT id_a, id_b, round(score, 4) AS score FROM sc WHERE score >= 0.99 ORDER BY id_a, id_b""".stripMargin)),

    // ---- Multimodal: binary image column + REAL javax.imageio decode.
    // Payloads are complete PNG/BMP bitmaps synthesized per doc_id
    // (solid color, dimensions and RGB planted by arithmetic on the id);
    // the operator decodes the actual bitmap, and the oracle verifies
    // the full encode→decode loop returns the planted ground truth —
    // the strongest check an engine without a codec can express.
    "q42_multimodal_decode" -> QueryDef(
      (s, dir) => {
        Multimodal.decodeImages(s, mediaTable(s, dir), "doc_id", "payload").toDF()
          .select(col("id").as("doc_id"), col("width"), col("height"), col("format"),
            col("avgR").as("avg_r"), col("avgG").as("avg_g"), col("avgB").as("avg_b"),
            col("nPixels").as("n_pixels"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |CAST((doc_id % 13) + 4 AS INT) AS width,
             |CAST((doc_id % 7) + 3 AS INT) AS height,
             |CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
             |CAST((doc_id * 37) % 256 AS INT) AS avg_r,
             |CAST((doc_id * 59) % 256 AS INT) AS avg_g,
             |CAST((doc_id * 83) % 256 AS INT) AS avg_b,
             |CAST(((doc_id % 13) + 4) * ((doc_id % 7) + 3) AS BIGINT) AS n_pixels
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Multimodal → embedding bridge: REAL decode, embedding from
    // the decoded pixel statistics (k/256 binary fractions — exact in
    // float AND double), then int8 quantization (media → encode →
    // compress, the serving prep path).
    "q61_media_embed_quantize" -> QueryDef(
      (s, dir) => {
        val emb = Multimodal.embedImages(s, mediaTable(s, dir), "doc_id", "payload").toDF()
        Similarity.quantizeInt8(emb, "id", "embedding")
          .select(col("id").as("doc_id"), col("l2_norm"), col("scale"), col("q8"))
          .orderBy("doc_id")
      },
      Some("""WITH m AS (SELECT doc_id,
             |    (doc_id * 37) % 256 AS r, (doc_id * 59) % 256 AS g, (doc_id * 83) % 256 AS b,
             |    (doc_id % 13) + 4 AS w, (doc_id % 7) + 3 AS h FROM documents),
             |e AS (SELECT doc_id, [r/256.0 - 0.5, g/256.0 - 0.5, b/256.0 - 0.5,
             |        w/256.0, h/256.0,
             |        CAST((w * h) % 256 AS DOUBLE)/256.0,
             |        CAST((r + g + b) % 256 AS DOUBLE)/256.0 - 0.5,
             |        CAST(doc_id % 256 AS DOUBLE)/256.0 - 0.5] AS emb
             |      FROM m),
             |s AS (SELECT doc_id, emb,
             |        list_max(list_transform(emb, x -> abs(x))) AS scale_raw FROM e)
             |SELECT doc_id,
             |  round(sqrt(list_sum(list_transform(emb, x -> x * x))), 4) AS l2_norm,
             |  round(scale_raw, 4) AS scale,
             |  array_to_string(list_transform(emb, x -> CAST(round(
             |    CASE WHEN scale_raw = 0 THEN 0.0 ELSE x * 127.0 / scale_raw END) AS BIGINT)), ',') AS q8
             |FROM s ORDER BY doc_id""".stripMargin)),

    // ---- Multimodal resize stage: REAL bitmap halving — decode, scale
    // onto a fresh raster, emit resized dimensions + channel means (a
    // solid source must stay exactly its color at any sampling).
    "q62_media_resize" -> QueryDef(
      (s, dir) => {
        Multimodal.resizeImages(s, mediaTable(s, dir), "doc_id", "payload", 2).toDF()
          .select(col("id").as("doc_id"), col("width").as("out_width"),
            col("height").as("out_height"), col("avgR").as("avg_r"),
            col("avgG").as("avg_g"), col("avgB").as("avg_b"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |CAST(greatest(((doc_id % 13) + 4) // 2, 1) AS INT) AS out_width,
             |CAST(greatest(((doc_id % 7) + 3) // 2, 1) AS INT) AS out_height,
             |CAST((doc_id * 37) % 256 AS INT) AS avg_r,
             |CAST((doc_id * 59) % 256 AS INT) AS avg_g,
             |CAST((doc_id * 83) % 256 AS INT) AS avg_b
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Multimodal: REAL video frame sampling — every-2nd-frame over
    // complete MJPEG-in-AVI containers built per document (frame count,
    // dimensions planted by arithmetic on doc_id; JPEG frames encoded by
    // ImageIO on the executors). The RIFF walk and the per-frame JPEG
    // decode are real; the oracle predicts what the parser+decoder must
    // recover, so width/height flowing through proves the decode ran.
    "q43_frame_sampling" -> QueryDef(
      (s, dir) => {
        Multimodal.sampleAviFrames(s, videoTable(s, dir), "doc_id", "payload", stride = 2)
          .toDF()
          .select(col("id").as("doc_id"), col("frame_idx"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH m AS (SELECT doc_id, (doc_id % 5) + 1 AS nf,
             |               (doc_id % 6) + 8 AS w, (doc_id % 4) + 6 AS h FROM documents)
             |SELECT doc_id, CAST(unnest(range(0, nf, 2)) AS BIGINT) AS frame_idx,
             |       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
             |FROM m ORDER BY doc_id, frame_idx""".stripMargin)),

    // ---- Deterministic training-order shuffle: md5(seed,id) key, global
    // range-sort by (key, id). Replayable epoch ordering at any scale.
    "q69_corpus_shuffle" -> QueryDef(
      (s, dir) => {
        Curation.shuffleKey(table(s, dir, "documents").select(col("doc_id")), "doc_id", "epoch1")
          .orderBy("shuffle_key", "doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST('0x' || substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS shuffle_key
             |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin)),

    // ---- Deterministic train/val/test split: hash-bucket assignment,
    // disjoint and exhaustive, one narrow pass.
    "q70_split_assign" -> QueryDef(
      (s, dir) => {
        Curation.assignSplit(table(s, dir, "documents").select(col("doc_id")), "doc_id",
            "split1", trainPct = 80, valPct = 10)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        CAST('0x' || substr(md5('split1:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 AS b
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ---- MinHash agreement per LSH candidate pair (banding
    // calibration): n_matching of k minhashes — the integer Jaccard
    // estimate the band/row thresholds were tuned against. Pairwise
    // work on post-banding candidates only.
    "q100_minhash_agreement" -> QueryDef(
      (s, dir) => {
        Dedup.minhashAgreement(docsTpl(s, dir), "doc_id", "t",
            shingleN = 3, numHashes = 8, rowsPerBand = 2)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH m AS (SELECT md5($tplSql) AS id, min($tplSql) AS t FROM documents GROUP BY 1),
              |w AS (SELECT id, string_split(t, ' ') AS ws FROM m),
              |tri AS (SELECT id, unnest(range(1, len(ws)-1)) AS i, ws FROM w),
              |sh0 AS (SELECT id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' || ws[CAST(i+2 AS INT)] AS shingle FROM tri),
              |sh AS (SELECT DISTINCT id, shingle FROM sh0),
              |sig AS (SELECT id, k, min(md5(CAST(k AS VARCHAR) || ':' || shingle)) AS mh
              |        FROM sh, (SELECT unnest(range(0, 8)) AS k) ks GROUP BY id, k),
              |bands AS (SELECT id, k // 2 AS band, md5(string_agg(mh, ',' ORDER BY k)) AS bk
              |          FROM sig GROUP BY id, k // 2),
              |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
              |          FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id)
              |SELECT p.id_a, p.id_b,
              |       CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_matching,
              |       count(*) AS k
              |FROM pairs p JOIN sig sa ON sa.id = p.id_a
              |JOIN sig sb ON sb.id = p.id_b AND sb.k = sa.k
              |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin)),

    // ---- Cluster × label contingency matrix: vectors assign to the
    // md5-seed centroids (narrow literal-embedded argmin scan, zero
    // corpus shuffles), then one bounded groupBy against the stored
    // label — the clustering-quality view (purity per cluster).
    "q97_cluster_label_matrix" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val seeds = emb
          .select(col("vec_id").cast("long").as("id"), col("embedding"))
          .withColumn("h", md5(col("id").cast("string")))
          .orderBy(col("h"), col("id")).limit(8)
          .withColumn("cluster_id",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("h"), col("id"))) - 1)
          .select(col("cluster_id").cast("long").as("cluster_id"), col("embedding"))
        Similarity.assignClusters(emb, "embedding", seeds)
          .groupBy(col("cluster_id"), col("label"))
          .agg(count(lit(1)).as("n_vectors"))
          .orderBy("cluster_id", "label")
      },
      Some("""WITH seeds AS (
             |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
             |         embedding AS sv
             |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
             |q AS (SELECT vec_id, label, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
             |      FROM embeddings),
             |sq AS (SELECT cid, CAST(generate_subscripts(sv, 1) - 1 AS BIGINT) AS dim,
             |              CAST(round(CAST(unnest(sv) AS DOUBLE) * 10000.0) AS BIGINT) AS qs
             |       FROM seeds),
             |kd AS (SELECT q.vec_id, sq.cid, sum((q.qv - sq.qs) * (q.qv - sq.qs)) AS dist
             |       FROM q JOIN sq ON q.dim = sq.dim GROUP BY 1, 2),
             |ka AS (SELECT vec_id, cid,
             |              row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
             |       FROM kd)
             |SELECT ka.cid AS cluster_id, e.label, count(*) AS n_vectors
             |FROM ka JOIN embeddings e USING (vec_id) WHERE ka.rn = 1
             |GROUP BY 1, 2 ORDER BY cluster_id, label""".stripMargin)),

    // ---- Train/test leakage audit: assign splits, then count the
    // distinct 10-word segments shared across each split pair — the
    // standard check that a held-out set does not leak training text.
    // Composition of assignSplit (narrow hash-bucket pass) and the
    // segment-overlap matrix (one groupBy, in-row pair expansion).
    "q95_split_leakage" -> QueryDef(
      (s, dir) => {
        val split = Curation.assignSplit(
          table(s, dir, "documents").select(col("doc_id"), col("text")),
          "doc_id", "split1", trainPct = 80, valPct = 10)
        Dedup.crossGroupSegmentOverlap(split, "split", "text", 10)
          .orderBy("src_a", "src_b")
      },
      Some("""WITH sp AS (SELECT doc_id, text,
             |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |FROM (SELECT doc_id, text,
             |        CAST('0x' || substr(md5('split1:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 AS b
             |      FROM documents)),
             |d AS (SELECT split, string_split(text, ' ') AS ws FROM sp),
             |segs AS (SELECT split, CAST(unnest(range((len(ws) + 9) // 10)) AS BIGINT) AS seg_no, ws
             |         FROM d),
             |seg2 AS (SELECT DISTINCT split,
             |                array_to_string(ws[seg_no * 10 + 1 : seg_no * 10 + 10], ' ') AS seg
             |         FROM segs),
             |p AS (SELECT a.split AS src_a, b.split AS src_b
             |      FROM seg2 a JOIN seg2 b ON a.seg = b.seg AND a.split < b.split)
             |SELECT src_a, src_b, count(*) AS n_shared_segments
             |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Text normalization pre-pass: ASCII lowercase, control chars →
    // space, space runs collapsed, trimmed. The probe input is mutated
    // (uppercased + padded + a tab) so the normalization is exercised.
    "q71_text_normalize" -> QueryDef(
      (s, dir) => {
        val mutated = table(s, dir, "documents")
          .select(col("doc_id"),
            concat(lit("  "), upper(col("text")), lit("\t"), lit("END  ")).as("text"))
        Curation.normalizeText(mutated, "doc_id", "text")
          .select(col("doc_id"), col("norm_text"), col("norm_len"))
          .orderBy("doc_id")
      },
      Some("""WITH m AS (SELECT doc_id, '  ' || upper(text) || chr(9) || 'END  ' AS t FROM documents),
             |n AS (SELECT doc_id,
             |        trim(regexp_replace(regexp_replace(
             |          translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
             |          '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
             |      FROM m)
             |SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS norm_len
             |FROM n ORDER BY doc_id""".stripMargin)),

    // ---- Incremental dedup: new batch (doc_id % 3 <> 0) vs the
    // already-ingested reference slice (doc_id % 3 = 0) on the template
    // corpus — exact content-hash hit + LSH band-key hit per new doc.
    "q84_incremental_dedup" -> QueryDef(
      (s, dir) => {
        val docs = docsTpl(s, dir)
        Dedup.dedupAgainst(
            docs.filter(col("doc_id") % 3 =!= 0),
            docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "t", shingleN = 3, numHashes = 8, rowsPerBand = 2)
          .orderBy("doc_id")
      },
      Some(IncrementalDedupSql)),

    // ---- The SAME incremental-dedup probe against the PERSISTED key
    // index (distinct content hashes + LSH band composites bucketed
    // over BucketedWarehouse, built from half the reference slice and
    // the other half APPENDED via the idempotent anti-join fold):
    // probing costs zero reference-corpus passes. The oracle is q84's:
    // index probing must be row-identical to recomputing the keys.
    "q219_dedup_indexed" -> QueryDef(
      (s, dir) => {
        val docs = docsTpl(s, dir)
        val tag = Registry.contentTag(docs, "doc_id", "t")
        val idx = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-didx-v2-$tag")
        val marker = new java.io.File(idx, "_graft_appended")
        if (!marker.isFile || !Dedup.dedupIndexExists(idx.toString)) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete()
          }
          rm(idx)
          Dedup.buildDedupIndex(docs.filter(col("doc_id") % 6 === 0),
            "doc_id", "t", idx.toString, numBuckets = 8,
            shingleN = 3, numHashes = 8, rowsPerBand = 2)
          Dedup.appendToDedupIndex(docs.filter(col("doc_id") % 6 === 3),
            "doc_id", "t", idx.toString)
          java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
        }
        Dedup.dedupAgainstIndex(docs.filter(col("doc_id") % 3 =!= 0),
            "doc_id", "t", idx.toString)
          .orderBy("doc_id")
      },
      Some(IncrementalDedupSql)),

    // ---- End-to-end near-dup removal: LSH pairs → connected components
    // → canonical keep decision per document. THE dedup user story in
    // one call: every doc gets its cluster's min id as keep_id; docs
    // with no near-dup keep themselves. The oracle replays the whole
    // composition (q31's band pairs + q56's reachability CTE).
    "q72_dedup_corpus" -> QueryDef(
      (s, dir) => {
        Dedup.dedupCorpus(docsTpl(s, dir), "doc_id", "t",
            shingleN = 3, numHashes = 8, rowsPerBand = 2)
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $shingleSql,
              |sig AS (SELECT id, k, min(md5(CAST(k AS VARCHAR) || ':' || shingle)) AS mh
              |        FROM sh, (SELECT unnest(range(0, 8)) AS k) ks GROUP BY id, k),
              |bands AS (SELECT id, k // 2 AS band, md5(string_agg(mh, ',' ORDER BY k)) AS bk
              |          FROM sig GROUP BY id, k // 2),
              |p AS (SELECT DISTINCT a.id AS u, b.id AS v
              |      FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id),
              |e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
              |nodes AS (SELECT DISTINCT u AS id FROM e),
              |r AS (
              |  SELECT id AS src, id AS dst FROM nodes
              |  UNION
              |  SELECT r.src, e.v FROM r JOIN e ON e.u = r.dst),
              |comp AS (SELECT src AS id, min(dst) AS comp FROM r GROUP BY src)
              |SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS keep_id,
              |       CAST(coalesce(c.comp, d.doc_id) = d.doc_id AS BIGINT) AS kept
              |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // ---- Cross-document duplicated spans (substring-level dedup, Lee
    // et al. style): maximal merged intervals of 4-gram positions whose
    // gram occurs in >= 2 distinct documents — over the REAL text
    // column, where the small vocabulary makes shared 4-grams sparse
    // but non-trivial.
    "q101_duplicate_spans" -> QueryDef(
      (s, dir) => {
        Dedup.duplicateSpans(table(s, dir, "documents"), "doc_id", "text", n = 4, minDocs = 2)
          .select(col("id").as("doc_id"), col("span_start"), col("span_end"))
          .orderBy("doc_id", "span_start")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |t AS (SELECT doc_id, unnest(range(1, len(ws) - 2)) AS i, ws FROM w WHERE len(ws) >= 4),
             |g AS (SELECT doc_id, i - 1 AS pos,
             |             ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' ||
             |             ws[CAST(i+2 AS INT)] || ' ' || ws[CAST(i+3 AS INT)] AS gram FROM t),
             |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
             |m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
             |x AS (SELECT doc_id, pos, pos + 4 AS e,
             |             max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe FROM m),
             |isl AS (SELECT doc_id, pos, e,
             |               sum(CASE WHEN maxe IS NULL OR pos > maxe THEN 1 ELSE 0 END)
             |                 OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM x)
             |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start, CAST(max(e) AS BIGINT) AS span_end
             |FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin)),

    // ---- Bigram-LM quality score (perplexity-proxy filter, CCNet
    // style). Scores are integer micro-nats rounded per DISTINCT bigram
    // BEFORE summation, so both engines aggregate identical integers in
    // any order — only one ln() per vocabulary entry must agree.
    "q102_lm_score" -> QueryDef(
      (s, dir) => {
        TextAnalysis.lmScore(table(s, dir, "documents"), "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_bigrams"), col("lp_sum_micro"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |t AS (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws FROM w WHERE len(ws) >= 2),
             |bg AS (SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i+1 AS INT)] AS w2 FROM t),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
             |v AS (SELECT count(DISTINCT tok) AS v
             |      FROM (SELECT unnest(ws) AS tok FROM w) WHERE tok <> ''),
             |sc AS (SELECT c2.w1, c2.w2,
             |              CAST(round(ln(CAST(c2.c2 + 1 AS DOUBLE) /
             |                            CAST(c1.c1 + v.v AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp
             |       FROM c2 JOIN c1 USING (w1), v)
             |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |       CAST(sum(sc.lp) AS BIGINT) AS lp_sum_micro
             |FROM bg JOIN sc ON bg.w1 = sc.w1 AND bg.w2 = sc.w2
             |GROUP BY bg.doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Deterministic source-mixture sampling (data mixing): fixed
    // per-source quotas picked by md5-of-id rank. src12's quota exceeds
    // its sf0.01 group size on purpose — the whole source is taken.
    "q103_mixture_sample" -> QueryDef(
      (s, dir) => {
        Curation.mixtureSample(table(s, dir, "documents"), "doc_id", "source",
            Map("src0" -> 15L, "src1" -> 10L, "src3" -> 20L, "src7" -> 5L, "src12" -> 30L))
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      Some("""WITH r AS (SELECT doc_id, source,
             |  row_number() OVER (PARTITION BY source
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM documents)
             |SELECT doc_id, source FROM r
             |WHERE rn <= CASE source WHEN 'src0' THEN 15 WHEN 'src1' THEN 10
             |  WHEN 'src3' THEN 20 WHEN 'src7' THEN 5 WHEN 'src12' THEN 30 ELSE 0 END
             |ORDER BY doc_id""".stripMargin)),

    // ---- Vocabulary growth curve (Heaps'-law profile): distinct word
    // trigram types within the first k docs, every 50 docs. doc_id is
    // the driver tables' dense 0-based index, so no ranking window runs
    // over the corpus. The final partial bucket's k_docs label is
    // clamped to the corpus size in both engines.
    "q104_vocab_growth" -> QueryDef(
      (s, dir) => {
        Profiling.vocabGrowth(table(s, dir, "documents"), "doc_id", "text", n = 3, step = 50)
          .orderBy("k_docs")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |t AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS i, ws FROM w WHERE len(ws) >= 3),
             |g AS (SELECT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' ||
             |             ws[CAST(i+2 AS INT)] AS gram FROM t),
             |f AS (SELECT gram, min(doc_id) AS first_rank FROM g GROUP BY gram),
             |nb AS (SELECT first_rank // 50 + 1 AS bucket, count(*) AS n_new FROM f GROUP BY 1),
             |spine AS (SELECT DISTINCT doc_id // 50 + 1 AS bucket FROM documents)
             |SELECT CAST(least(spine.bucket * 50, (SELECT max(doc_id) + 1 FROM documents)) AS BIGINT) AS k_docs,
             |       CAST(sum(coalesce(nb.n_new, 0)) OVER (ORDER BY spine.bucket) AS BIGINT) AS vocab_size
             |FROM spine LEFT JOIN nb USING (bucket)
             |ORDER BY k_docs""".stripMargin)),

    // ---- SemDeDup (cluster-scoped embedding dedup): same planted
    // near-dups as q47, but candidates come from nearest-centroid
    // cluster membership (md5-seeded, integer-exact assignment) instead
    // of LSH buckets — the published scale path where all-pairs never
    // happens because k grows with the corpus.
    "q105_semantic_dedup" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val dups = emb.filter(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            expr("transform(embedding, (x, i) -> CAST(x * (1.0D + (CAST(i % 7 AS DOUBLE) - 3.0D) * 0.0005D) AS FLOAT))")
              .as("embedding"))
        val corpus = emb.select(col("vec_id"), col("embedding")).union(dups)
        Similarity.semanticDedup(corpus, "vec_id", "embedding", k = 16, threshold = 0.99)
          .orderBy("cluster_id", "keep_id", "drop_id")
      },
      Some("""WITH base AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |e AS (
             |  SELECT vec_id, i, v FROM base
             |  UNION ALL
             |  SELECT vec_id + 1000000, i,
             |         CAST(v * (1.0 + (CAST((i-1) % 7 AS DOUBLE) - 3.0) * 0.0005) AS FLOAT)
             |  FROM base WHERE vec_id % 20 = 0
             |),
             |ids AS (SELECT DISTINCT vec_id FROM e),
             |sel AS (SELECT vec_id AS sid, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
             |        FROM ids ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
             |q AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
             |             CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT) AS qv FROM e),
             |sq AS (SELECT sel.cid, q.dim, q.qv AS qs FROM sel JOIN q ON q.vec_id = sel.sid),
             |kd AS (SELECT q.vec_id, sq.cid, sum((q.qv - sq.qs) * (q.qv - sq.qs)) AS dist
             |       FROM q JOIN sq ON sq.dim = q.dim GROUP BY 1, 2),
             |ka AS (SELECT vec_id, cid,
             |              row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM kd),
             |asg AS (SELECT vec_id, cid AS cluster_id FROM ka WHERE rn = 1),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |d AS (SELECT aa.cluster_id, a.vec_id AS keep_id, bb.vec_id AS drop_id,
             |             sum(CAST(a.v AS DOUBLE) * CAST(b2.v AS DOUBLE)) AS dp
             |      FROM e a JOIN asg aa ON aa.vec_id = a.vec_id
             |      JOIN asg bb ON bb.cluster_id = aa.cluster_id AND bb.vec_id > a.vec_id
             |      JOIN e b2 ON b2.vec_id = bb.vec_id AND b2.i = a.i
             |      GROUP BY 1, 2, 3),
             |sc AS (SELECT cluster_id, keep_id, drop_id, dp / (na.nrm * nb.nrm) AS score
             |       FROM d JOIN n na ON na.vec_id = keep_id JOIN n nb ON nb.vec_id = drop_id)
             |SELECT cluster_id, keep_id, drop_id, round(score, 4) AS score
             |FROM sc WHERE score >= 0.99 ORDER BY cluster_id, keep_id, drop_id""".stripMargin)),

    // ---- Quality-aware duplicate-cluster representatives: q72's
    // clusters over a padded template corpus (members differ in token
    // count), keeping the LONGEST member (ties -> lowest id) instead of
    // the minimum id.
    "q106_quality_rep" -> QueryDef(
      (s, dir) => {
        // the pad token carries the template-family id: a corpus-wide
        // 'pad pad pad' shingle would glue unrelated families into the
        // same LSH buckets (6M candidate pairs at sf0.1 — the boilerplate
        // pathology production dedup caps buckets against)
        val docs = table(s, dir, "documents").select(col("doc_id"),
          concat(tplCol, expr(
            "repeat(concat(' p', CAST(doc_id div 50 AS STRING)), CAST(doc_id % 5 AS INT))")).as("t"))
        Dedup.qualityRepresentatives(docs, "doc_id", "t",
            shingleN = 3, numHashes = 8, rowsPerBand = 2)
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE
              |m AS (SELECT doc_id AS id, $tplSql || repeat(' p' || CAST(doc_id // 50 AS VARCHAR), CAST(doc_id % 5 AS INT)) AS t FROM documents),
              |w AS (SELECT id, string_split(t, ' ') AS ws FROM m),
              |tri AS (SELECT id, unnest(range(1, len(ws)-1)) AS i, ws FROM w),
              |sh AS (SELECT id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' || ws[CAST(i+2 AS INT)] AS shingle FROM tri),
              |sig AS (SELECT id, k, min(md5(CAST(k AS VARCHAR) || ':' || shingle)) AS mh
              |        FROM sh, (SELECT unnest(range(0, 8)) AS k) ks GROUP BY id, k),
              |bands AS (SELECT id, k // 2 AS band, md5(string_agg(mh, ',' ORDER BY k)) AS bk
              |          FROM sig GROUP BY id, k // 2),
              |p AS (SELECT DISTINCT a.id AS u, b.id AS v
              |      FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id),
              |eg AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
              |nodes AS (SELECT DISTINCT u AS id FROM eg),
              |r AS (
              |  SELECT id AS src, id AS dst FROM nodes
              |  UNION
              |  SELECT r.src, eg.v FROM r JOIN eg ON eg.u = r.dst),
              |comp AS (SELECT src AS id, min(dst) AS comp FROM r GROUP BY src),
              |lab AS (SELECT m.id AS doc_id, coalesce(c.comp, m.id) AS cluster_id,
              |               CAST(len(string_split(m.t, ' ')) AS BIGINT) AS q_score
              |        FROM m LEFT JOIN comp c ON c.id = m.id),
              |rep AS (SELECT cluster_id, doc_id AS rep_id,
              |               row_number() OVER (PARTITION BY cluster_id ORDER BY q_score DESC, doc_id) AS rn
              |        FROM lab)
              |SELECT lab.doc_id, lab.cluster_id, lab.q_score, rep.rep_id,
              |       CAST(lab.doc_id = rep.rep_id AS BIGINT) AS kept
              |FROM lab JOIN rep ON rep.cluster_id = lab.cluster_id AND rep.rn = 1
              |ORDER BY lab.doc_id""".stripMargin)),

    // ---- Source-level blocklist (domain filtering): planted common
    // bodies make sources whose ids end 0/1/2 pure duplicates; the
    // verdict is exact-integer per source.
    "q107_source_blocklist" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents").select(col("doc_id"), col("source"),
          when(col("doc_id") % 10 < 3, lit("common document body"))
            .otherwise(col("text")).as("content"))
        Curation.sourceBlocklist(docs, "doc_id", "content", "source",
            maxDupBp = 1000L, minMeanTokens = 10L)
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |                  CASE WHEN doc_id % 10 < 3 THEN 'common document body' ELSE text END AS content
             |           FROM documents),
             |f AS (SELECT content, min(doc_id) AS first_id FROM d GROUP BY content),
             |s AS (SELECT d.source, count(*) AS n_docs,
             |             sum(CASE WHEN d.doc_id <> f.first_id THEN 1 ELSE 0 END) AS n_dups,
             |             sum(len(string_split(d.content, ' '))) AS tok_sum
             |      FROM d JOIN f USING (content) GROUP BY d.source)
             |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_dups AS BIGINT) AS n_dups,
             |       CAST((20000 * n_dups + n_docs) // (2 * n_docs) AS BIGINT) AS dup_bp,
             |       CAST((2 * tok_sum + n_docs) // (2 * n_docs) AS BIGINT) AS mean_tokens,
             |       CAST(((20000 * n_dups + n_docs) // (2 * n_docs) > 1000
             |             OR (2 * tok_sum + n_docs) // (2 * n_docs) < 10) AS BIGINT) AS blocked
             |FROM s ORDER BY source""".stripMargin)),

    // ---- N-gram novelty vs a reference snapshot (docs with id % 10 = 0):
    // distinct-3-gram miss rate per document, integer basis points.
    "q108_ngram_novelty" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        TextAnalysis.ngramNovelty(docs, docs.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", n = 3)
          .select(col("id").as("doc_id"), col("total_grams"), col("novel_grams"),
            col("novelty_bp"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |t AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS i, ws FROM w WHERE len(ws) >= 3),
             |g AS (SELECT DISTINCT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' ||
             |             ws[CAST(i+2 AS INT)] AS gram FROM t),
             |ref AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
             |per AS (SELECT g.doc_id, count(*) AS total_grams,
             |               sum(CASE WHEN ref.gram IS NULL THEN 1 ELSE 0 END) AS novel_grams
             |        FROM g LEFT JOIN ref USING (gram) GROUP BY g.doc_id)
             |SELECT d.doc_id, CAST(coalesce(per.total_grams, 0) AS BIGINT) AS total_grams,
             |       CAST(coalesce(per.novel_grams, 0) AS BIGINT) AS novel_grams,
             |       CAST(CASE WHEN coalesce(per.total_grams, 0) = 0 THEN 0
             |                 ELSE (20000 * per.novel_grams + per.total_grams) // (2 * per.total_grams)
             |            END AS BIGINT) AS novelty_bp
             |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- REAL audio decode: every payload is a complete PCM16 WAV
    // (RIFF + fmt + data) whose rate/channels/samples are planted by
    // arithmetic on doc_id; the decoder walks the container for real
    // and the oracle recomputes the integer-exact features.
    "q109_audio_features" -> QueryDef(
      (s, dir) => {
        Multimodal.decodeAudio(s, audioTable(s, dir), "doc_id", "payload").toDF()
          .select(col("id").as("doc_id"), col("sampleRate").as("sample_rate"),
            col("channels"), col("nSamples").as("n_samples"),
            col("sumAmp").as("sum_amp"), col("sumSq").as("sum_sq"),
            col("maxAbs").as("max_abs"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id, CAST(1 + doc_id % 2 AS INT) AS channels,
             |                  CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
             |                  (1 + doc_id % 2) * (40 + doc_id % 25) AS n
             |           FROM documents),
             |ix AS (SELECT doc_id, channels, sample_rate, unnest(range(n)) AS i FROM p),
             |v AS (SELECT doc_id, channels, sample_rate,
             |             (doc_id * 7919 + i * 104729) % 65536 - 32768 AS v
             |      FROM ix)
             |SELECT doc_id, sample_rate, channels,
             |       CAST(count(*) AS BIGINT) AS n_samples,
             |       CAST(sum(v) AS BIGINT) AS sum_amp,
             |       CAST(sum(v * v) AS BIGINT) AS sum_sq,
             |       CAST(max(abs(v)) AS INT) AS max_abs
             |FROM v GROUP BY doc_id, sample_rate, channels
             |ORDER BY doc_id""".stripMargin)),

    // ---- Frame-level acoustic features: the decoded sample stream cut
    // into 16-sample windows, per-window integer energy (the training
    // rows an acoustic model consumes; final partial window kept).
    "q110_audio_frame_energy" -> QueryDef(
      (s, dir) => {
        Multimodal.audioFrameEnergy(s, audioTable(s, dir), "doc_id", "payload",
            frameLen = 16).toDF()
          .select(col("id").as("doc_id"), col("frameId").as("frame_id"),
            col("nInFrame").as("n_in_frame"), col("energy"))
          .orderBy("doc_id", "frame_id")
      },
      Some("""WITH p AS (SELECT doc_id, (1 + doc_id % 2) * (40 + doc_id % 25) AS n
             |           FROM documents),
             |v AS (SELECT doc_id, unnest(range(n)) AS i FROM p),
             |e AS (SELECT doc_id, i // 16 AS frame_id,
             |             (doc_id * 7919 + i * 104729) % 65536 - 32768 AS v
             |      FROM v)
             |SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
             |       CAST(count(*) AS BIGINT) AS n_in_frame,
             |       CAST(sum(v * v) AS BIGINT) AS energy
             |FROM e GROUP BY doc_id, frame_id
             |ORDER BY doc_id, frame_id""".stripMargin)),

    // ---- Gopher quality-rule battery (Rae et al. 2021 App. A1) over
    // the raw document corpus: five independent integer-exact rule
    // flags plus the combined keep verdict — pure per-row arithmetic,
    // byte-identical on both engines.
    "q111_gopher_rules" -> QueryDef(
      (s, dir) => {
        Curation.gopherRules(table(s, dir, "documents"), "doc_id", "text",
            minWords = 10L)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
             |b AS (SELECT doc_id, text, ws, CAST(len(ws) AS BIGINT) AS n_words,
             |             CAST(strlen(text) - (len(ws) - 1) AS BIGINT) AS chars,
             |             CAST(strlen(text) - strlen(replace(text, '#', ''))
             |                  + (strlen(text) - strlen(replace(text, '...', ''))) // 3
             |               AS BIGINT) AS sym,
             |             CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alpha,
             |             CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
             |                                  s -> list_contains(ws, s))) AS BIGINT) AS n_stop
             |      FROM w),
             |m AS (SELECT doc_id, n_words,
             |             (200 * chars + n_words) // (2 * n_words) AS mean_wlen_c,
             |             (20000 * sym + n_words) // (2 * n_words) AS symbol_bp,
             |             (20000 * alpha + n_words) // (2 * n_words) AS alpha_bp,
             |             n_stop
             |      FROM b)
             |SELECT doc_id, n_words,
             |       CAST(mean_wlen_c AS BIGINT) AS mean_wlen_c,
             |       CAST(symbol_bp AS BIGINT) AS symbol_bp,
             |       CAST(alpha_bp AS BIGINT) AS alpha_bp,
             |       n_stop,
             |       CAST(n_words < 10 OR n_words > 100000 AS BIGINT) AS f_word_count,
             |       CAST(mean_wlen_c < 300 OR mean_wlen_c > 1000 AS BIGINT) AS f_word_len,
             |       CAST(symbol_bp > 1000 AS BIGINT) AS f_symbol,
             |       CAST(alpha_bp < 8000 AS BIGINT) AS f_alpha,
             |       CAST(n_stop < 2 AS BIGINT) AS f_stop,
             |       CAST((n_words < 10 OR n_words > 100000) = false
             |            AND (mean_wlen_c < 300 OR mean_wlen_c > 1000) = false
             |            AND symbol_bp <= 1000 AND alpha_bp >= 8000 AND n_stop >= 2
             |         AS BIGINT) AS keep
             |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- Gopher repetition battery (Rae et al. 2021 App. A1, n-gram
    // half): top-n-gram char mass (n=2..4) and duplicated-n-gram char
    // mass (n=5..10) in integer bp, with the published threshold flags.
    // The oracle is generated per n (explode → group → max/sum) and must
    // agree with the Spark side's single in-row sorted-run pass.
    "q112_gopher_repetition" -> QueryDef(
      (s, dir) => {
        Curation.gopherRepetitionRules(table(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(gopherRepetitionOracle)),

    // ---- Corpus-level boilerplate: a ' all rights reserved worldwide'
    // footer planted on 2/3 of documents makes its internal trigrams
    // high-document-frequency; the operator must flag exactly those (and
    // not the per-doc boundary grams) and charge each doc its bp mass.
    "q113_boilerplate" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 =!= 0, lit(" all rights reserved worldwide"))
              .otherwise(lit(""))).as("t"))
        TextAnalysis.boilerplateMass(docs, "doc_id", "t", n = 3, num = 1, denom = 5)
          .select(col("id").as("doc_id"), col("n_grams"), col("n_boiler"),
            col("boiler_bp"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, text || CASE WHEN doc_id % 3 <> 0
             |                  THEN ' all rights reserved worldwide' ELSE '' END AS t
             |           FROM documents),
             |w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM d),
             |t3 AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS i, ws
             |       FROM w WHERE len(ws) >= 3),
             |g AS (SELECT DISTINCT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)]
             |             || ' ' || ws[CAST(i+2 AS INT)] AS gram FROM t3),
             |f AS (SELECT gram, count(*) AS dfc FROM g GROUP BY gram),
             |nd AS (SELECT count(*) AS n FROM d),
             |b AS (SELECT gram, CAST(strlen(gram) AS BIGINT) AS glen
             |      FROM f, nd WHERE dfc * 5 >= n * 1),
             |p AS (SELECT g.doc_id, count(*) AS n_grams,
             |             sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler,
             |             sum(coalesce(b.glen, 0)) AS mass
             |      FROM g LEFT JOIN b USING (gram) GROUP BY g.doc_id),
             |c AS (SELECT doc_id, CAST(strlen(t) - (len(string_split(t, ' ')) - 1) AS BIGINT) AS chars
             |      FROM d)
             |SELECT c.doc_id, CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
             |       CAST(coalesce(p.n_boiler, 0) AS BIGINT) AS n_boiler,
             |       CAST((20000 * coalesce(p.mass, 0) + c.chars) // (2 * c.chars) AS BIGINT) AS boiler_bp
             |FROM c LEFT JOIN p ON p.doc_id = c.doc_id
             |ORDER BY c.doc_id""".stripMargin)),

    // ---- Moore–Lewis cross-entropy-difference selection: in-domain LM
    // from source 'src0' documents, general LM from the whole corpus;
    // per-doc delta in exact integer micro-nats (one rounded ln per
    // reference vocabulary entry, identical on both engines — the q102
    // discipline, with the unseen-bigram backoff ln(1/(c1+V)) inline).
    "q114_moore_lewis" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        TextAnalysis.mooreLewisSelect(docs, docs.filter(col("source") === "src0"),
            docs, "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
             |t AS (SELECT doc_id, source, unnest(range(1, len(ws))) AS i, ws FROM w WHERE len(ws) >= 2),
             |bg AS (SELECT doc_id, source, ws[CAST(i AS INT)] AS w1, ws[CAST(i+1 AS INT)] AS w2 FROM t),
             |c2i AS (SELECT w1, w2, count(*) AS c FROM bg WHERE source = 'src0' GROUP BY w1, w2),
             |c1i AS (SELECT w1, count(*) AS c FROM bg WHERE source = 'src0' GROUP BY w1),
             |vi AS (SELECT count(DISTINCT tok) AS v
             |       FROM (SELECT unnest(ws) AS tok FROM w WHERE source = 'src0') WHERE tok <> ''),
             |c2g AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
             |c1g AS (SELECT w1, count(*) AS c FROM bg GROUP BY w1),
             |vg AS (SELECT count(DISTINCT tok) AS v
             |       FROM (SELECT unnest(ws) AS tok FROM w) WHERE tok <> ''),
             |si AS (SELECT bg.doc_id,
             |              CAST(round(ln(CAST(coalesce(c2i.c, 0) + 1 AS DOUBLE) /
             |                            CAST(coalesce(c1i.c, 0) + vi.v AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp
             |       FROM bg LEFT JOIN c2i ON bg.w1 = c2i.w1 AND bg.w2 = c2i.w2
             |               LEFT JOIN c1i ON bg.w1 = c1i.w1, vi),
             |sg AS (SELECT bg.doc_id,
             |              CAST(round(ln(CAST(coalesce(c2g.c, 0) + 1 AS DOUBLE) /
             |                            CAST(coalesce(c1g.c, 0) + vg.v AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp
             |       FROM bg LEFT JOIN c2g ON bg.w1 = c2g.w1 AND bg.w2 = c2g.w2
             |               LEFT JOIN c1g ON bg.w1 = c1g.w1, vg),
             |pi AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS lp_in FROM si GROUP BY doc_id),
             |pg AS (SELECT doc_id, sum(lp) AS lp_gen FROM sg GROUP BY doc_id)
             |SELECT d.doc_id,
             |       CAST(coalesce(pi.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             |       CAST(coalesce(pi.lp_in, 0) AS BIGINT) AS lp_in_micro,
             |       CAST(coalesce(pg.lp_gen, 0) AS BIGINT) AS lp_gen_micro,
             |       CAST(coalesce(pi.lp_in, 0) - coalesce(pg.lp_gen, 0) AS BIGINT) AS ml_delta_micro
             |FROM documents d LEFT JOIN pi ON pi.doc_id = d.doc_id
             |LEFT JOIN pg ON pg.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- Winnowing fingerprints (MOSS): per-window minimum of md5'd
    // word 4-grams with window 4; the oracle rebuilds the same windows
    // with an explicit (window, gram) join. Docs with under 4 grams
    // winnow one window over all grams; under 4 words drop.
    "q115_winnowing" -> QueryDef(
      (s, dir) => {
        TextAnalysis.winnowingFingerprints(table(s, dir, "documents"),
            "doc_id", "text", k = 4, w = 4)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             |           WHERE len(string_split(text, ' ')) >= 4),
             |t AS (SELECT doc_id, unnest(range(1, len(ws) - 2)) AS i, ws FROM w),
             |h AS (SELECT doc_id, i, md5(ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)]
             |             || ' ' || ws[CAST(i+2 AS INT)] || ' ' || ws[CAST(i+3 AS INT)]) AS hv
             |      FROM t),
             |g AS (SELECT doc_id, count(*) AS n_grams FROM h GROUP BY doc_id),
             |win AS (SELECT doc_id, unnest(range(1, greatest(n_grams - 4 + 1, 1) + 1)) AS j,
             |               n_grams FROM g),
             |m AS (SELECT win.doc_id, win.j, min(h.hv) AS mh
             |      FROM win JOIN h ON h.doc_id = win.doc_id
             |                     AND h.i >= win.j AND h.i <= least(win.j + 3, win.n_grams)
             |      GROUP BY win.doc_id, win.j)
             |SELECT g.doc_id, CAST(g.n_grams AS BIGINT) AS n_grams,
             |       CAST(count(*) AS BIGINT) AS n_windows,
             |       CAST(count(DISTINCT m.mh) AS BIGINT) AS n_fps,
             |       min(m.mh) AS min_fp
             |FROM g JOIN m ON m.doc_id = g.doc_id
             |GROUP BY g.doc_id, g.n_grams
             |ORDER BY g.doc_id""".stripMargin)),

    // ---- Token-budget mixture planning: target weights for three
    // sources against a 1M-token budget; per-source supply, demand,
    // capped sampling rate, and centi-epoch oversampling factor — all
    // integer HALF_UP.
    "q116_mixture_plan" -> QueryDef(
      (s, dir) => {
        Curation.mixturePlan(table(s, dir, "documents"), "source", "text",
            Map("src0" -> 300000L, "src1" -> 200000L, "src3" -> 100000L),
            tokenBudget = 1000000L)
          .orderBy("source")
      },
      Some("""WITH s AS (SELECT source, count(*) AS n_docs,
             |                  sum(len(string_split(text, ' '))) AS n_tokens
             |           FROM documents GROUP BY source),
             |t(tsrc, ppm) AS (VALUES ('src0', 300000), ('src1', 200000), ('src3', 100000)),
             |r AS (SELECT s.source, s.n_docs, s.n_tokens,
             |             CAST(coalesce(t.ppm, 0) AS BIGINT) AS target_ppm,
             |             (2 * CAST(coalesce(t.ppm, 0) AS BIGINT) * 1000000 + 1000000) // 2000000 AS required_tokens
             |      FROM s LEFT JOIN t ON t.tsrc = s.source)
             |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             |       CAST(n_tokens AS BIGINT) AS n_tokens,
             |       CAST(target_ppm AS BIGINT) AS target_ppm,
             |       CAST(required_tokens AS BIGINT) AS required_tokens,
             |       CAST(least(10000, (20000 * required_tokens + n_tokens) // (2 * n_tokens)) AS BIGINT) AS sample_bp,
             |       CAST((200 * required_tokens + n_tokens) // (2 * n_tokens) AS BIGINT) AS epochs_c
             |FROM r ORDER BY source""".stripMargin)),

    // ---- Product quantization encode (Jégou et al. 2011): 8 subspaces
    // × 16 codes over the 64-dim embeddings, codebook = the sub-vectors
    // of vec_id < 16; integer-exact scaled-L2 argmin per subspace (ties
    // → lowest code). A narrow zero-shuffle scan on the Spark side.
    "q117_pq_encode" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Pq.encode(emb, "vec_id", "embedding", emb.filter(col("vec_id") < 16))
          .withColumnRenamed("id", "vec_id")
          .orderBy("vec_id", "sub")
      },
      Some("""WITH q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             |                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
             |           FROM embeddings),
             |v AS (SELECT vec_id, i // 8 AS sub, i % 8 AS j, qv FROM q),
             |cb AS (SELECT vec_id AS code, sub, j, qv FROM v WHERE vec_id < 16),
             |d AS (SELECT v.vec_id, v.sub, cb.code, sum((v.qv - cb.qv) * (v.qv - cb.qv)) AS dist
             |      FROM v JOIN cb ON cb.sub = v.sub AND cb.j = v.j GROUP BY 1, 2, 3),
             |a AS (SELECT vec_id, sub, code,
             |             row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn FROM d)
             |SELECT vec_id, sub, code FROM a WHERE rn = 1 ORDER BY vec_id, sub""".stripMargin)),

    // ---- PQ asymmetric-distance top-k: per-query distance tables over
    // the same codebook, corpus side scored by 8 table lookups on its
    // codes — the compressed-search path a billion-vector index serves.
    "q118_pq_adc_topk" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Pq.adcTopK(emb, "vec_id", "embedding", emb.filter(col("vec_id") < 16),
            emb.filter(col("vec_id") >= 20 && col("vec_id") < 30), k = 5)
          .orderBy("query_id", "rnk")
      },
      Some("""WITH q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             |                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
             |           FROM embeddings),
             |v AS (SELECT vec_id, i // 8 AS sub, i % 8 AS j, qv FROM q),
             |cb AS (SELECT vec_id AS code, sub, j, qv FROM v WHERE vec_id < 16),
             |d AS (SELECT v.vec_id, v.sub, cb.code, sum((v.qv - cb.qv) * (v.qv - cb.qv)) AS dist
             |      FROM v JOIN cb ON cb.sub = v.sub AND cb.j = v.j GROUP BY 1, 2, 3),
             |a AS (SELECT vec_id, sub, code FROM
             |      (SELECT vec_id, sub, code,
             |              row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn FROM d)
             |      WHERE rn = 1),
             |adc AS (SELECT dq.vec_id AS query_id, a.vec_id AS neighbor_id,
             |               CAST(sum(dq.dist) AS BIGINT) AS adc_dist
             |        FROM d dq JOIN a ON a.sub = dq.sub AND a.code = dq.code
             |        WHERE dq.vec_id BETWEEN 20 AND 29 AND a.vec_id <> dq.vec_id
             |        GROUP BY 1, 2),
             |r AS (SELECT query_id, neighbor_id, adc_dist,
             |             row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk
             |      FROM adc)
             |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, adc_dist
             |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    // ---- PQ recall@5 against the exact scaled-L2 top-5 — the quality
    // gate every compressed-ANN deployment measures before serving.
    "q119_pq_recall" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Pq.adcRecall(emb, "vec_id", "embedding", emb.filter(col("vec_id") < 16),
            emb.filter(col("vec_id") >= 20 && col("vec_id") < 30), k = 5)
          .orderBy("query_id")
      },
      Some("""WITH q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             |                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
             |           FROM embeddings),
             |v AS (SELECT vec_id, i // 8 AS sub, i % 8 AS j, qv FROM q),
             |cb AS (SELECT vec_id AS code, sub, j, qv FROM v WHERE vec_id < 16),
             |d AS (SELECT v.vec_id, v.sub, cb.code, sum((v.qv - cb.qv) * (v.qv - cb.qv)) AS dist
             |      FROM v JOIN cb ON cb.sub = v.sub AND cb.j = v.j GROUP BY 1, 2, 3),
             |a AS (SELECT vec_id, sub, code FROM
             |      (SELECT vec_id, sub, code,
             |              row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn FROM d)
             |      WHERE rn = 1),
             |adc AS (SELECT dq.vec_id AS query_id, a.vec_id AS neighbor_id, sum(dq.dist) AS adc_dist
             |        FROM d dq JOIN a ON a.sub = dq.sub AND a.code = dq.code
             |        WHERE dq.vec_id BETWEEN 20 AND 29 AND a.vec_id <> dq.vec_id
             |        GROUP BY 1, 2),
             |apx AS (SELECT query_id, neighbor_id FROM
             |        (SELECT query_id, neighbor_id,
             |                row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk
             |         FROM adc) WHERE rnk <= 5),
             |ex AS (SELECT qa.vec_id AS query_id, nb.vec_id AS neighbor_id,
             |              sum((qa.qv - nb.qv) * (qa.qv - nb.qv)) AS d2
             |       FROM q qa JOIN q nb ON nb.i = qa.i AND nb.vec_id <> qa.vec_id
             |       WHERE qa.vec_id BETWEEN 20 AND 29 GROUP BY 1, 2),
             |ext AS (SELECT query_id, neighbor_id FROM
             |        (SELECT query_id, neighbor_id,
             |                row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rn
             |         FROM ex) WHERE rn <= 5),
             |ov AS (SELECT e.query_id, count(*) AS n_overlap FROM ext e
             |       JOIN apx x ON x.query_id = e.query_id AND x.neighbor_id = e.neighbor_id
             |       GROUP BY 1)
             |SELECT qq.vec_id AS query_id,
             |       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
             |       CAST((20000 * coalesce(ov.n_overlap, 0) + 5) // 10 AS BIGINT) AS recall_bp
             |FROM (SELECT vec_id FROM embeddings WHERE vec_id BETWEEN 20 AND 29) qq
             |LEFT JOIN ov ON ov.query_id = qq.vec_id ORDER BY query_id""".stripMargin)),

    // ---- ADC + exact re-rank (FAISS's refine step): ADC nominates 20
    // candidates per query, only those join back to the raw vectors for
    // exact scaled-L2, top-5 by the true metric returns. The candidate
    // set is |queries|·kCand-bounded, so the join-back broadcasts.
    "q263_adc_rerank" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Pq.adcTopKReranked(emb, "vec_id", "embedding",
            emb.filter(col("vec_id") < 16),
            emb.filter(col("vec_id") >= 20 && col("vec_id") < 30),
            k = 5, kCand = 20)
          .orderBy("query_id", "rnk")
      },
      Some("""WITH q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             |                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
             |           FROM embeddings),
             |v AS (SELECT vec_id, i // 8 AS sub, i % 8 AS j, qv FROM q),
             |cb AS (SELECT vec_id AS code, sub, j, qv FROM v WHERE vec_id < 16),
             |d AS (SELECT v.vec_id, v.sub, cb.code, sum((v.qv - cb.qv) * (v.qv - cb.qv)) AS dist
             |      FROM v JOIN cb ON cb.sub = v.sub AND cb.j = v.j GROUP BY 1, 2, 3),
             |a AS (SELECT vec_id, sub, code FROM
             |      (SELECT vec_id, sub, code,
             |              row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn FROM d)
             |      WHERE rn = 1),
             |adc AS (SELECT dq.vec_id AS query_id, a.vec_id AS neighbor_id, sum(dq.dist) AS adc_dist
             |        FROM d dq JOIN a ON a.sub = dq.sub AND a.code = dq.code
             |        WHERE dq.vec_id BETWEEN 20 AND 29 AND a.vec_id <> dq.vec_id
             |        GROUP BY 1, 2),
             |cand AS (SELECT query_id, neighbor_id FROM
             |         (SELECT query_id, neighbor_id,
             |                 row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk
             |          FROM adc) WHERE rnk <= 20),
             |ex AS (SELECT qa.vec_id AS query_id, nb.vec_id AS neighbor_id,
             |              CAST(sum((qa.qv - nb.qv) * (qa.qv - nb.qv)) AS BIGINT) AS d2
             |       FROM q qa JOIN q nb ON nb.i = qa.i
             |       WHERE qa.vec_id BETWEEN 20 AND 29 GROUP BY 1, 2),
             |rr AS (SELECT c.query_id, c.neighbor_id, ex.d2,
             |              row_number() OVER (PARTITION BY c.query_id ORDER BY ex.d2, c.neighbor_id) AS rnk
             |       FROM cand c JOIN ex ON ex.query_id = c.query_id AND ex.neighbor_id = c.neighbor_id)
             |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, d2
             |FROM rr WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    // ---- Side-by-side recall@5: plain ADC vs ADC+re-rank against the
    // exact top-5 — the table that sizes the refine stage (rr >= adc
    // per query by the candidate-superset argument).
    "q264_rerank_recall" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Pq.rerankRecall(emb, "vec_id", "embedding",
            emb.filter(col("vec_id") < 16),
            emb.filter(col("vec_id") >= 20 && col("vec_id") < 30),
            k = 5, kCand = 20)
          .orderBy("query_id")
      },
      Some("""WITH q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             |                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
             |           FROM embeddings),
             |v AS (SELECT vec_id, i // 8 AS sub, i % 8 AS j, qv FROM q),
             |cb AS (SELECT vec_id AS code, sub, j, qv FROM v WHERE vec_id < 16),
             |d AS (SELECT v.vec_id, v.sub, cb.code, sum((v.qv - cb.qv) * (v.qv - cb.qv)) AS dist
             |      FROM v JOIN cb ON cb.sub = v.sub AND cb.j = v.j GROUP BY 1, 2, 3),
             |a AS (SELECT vec_id, sub, code FROM
             |      (SELECT vec_id, sub, code,
             |              row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn FROM d)
             |      WHERE rn = 1),
             |adc AS MATERIALIZED (SELECT dq.vec_id AS query_id, a.vec_id AS neighbor_id, sum(dq.dist) AS adc_dist
             |        FROM d dq JOIN a ON a.sub = dq.sub AND a.code = dq.code
             |        WHERE dq.vec_id BETWEEN 20 AND 29 AND a.vec_id <> dq.vec_id
             |        GROUP BY 1, 2),
             |apx AS (SELECT query_id, neighbor_id FROM
             |        (SELECT query_id, neighbor_id,
             |                row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk
             |         FROM adc) WHERE rnk <= 5),
             |cand AS (SELECT query_id, neighbor_id FROM
             |         (SELECT query_id, neighbor_id,
             |                 row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk
             |          FROM adc) WHERE rnk <= 20),
             |ex AS MATERIALIZED (SELECT qa.vec_id AS query_id, nb.vec_id AS neighbor_id,
             |              CAST(sum((qa.qv - nb.qv) * (qa.qv - nb.qv)) AS BIGINT) AS d2
             |       FROM q qa JOIN q nb ON nb.i = qa.i AND nb.vec_id <> qa.vec_id
             |       WHERE qa.vec_id BETWEEN 20 AND 29 GROUP BY 1, 2),
             |rrtop AS (SELECT query_id, neighbor_id FROM
             |          (SELECT c.query_id, c.neighbor_id,
             |                  row_number() OVER (PARTITION BY c.query_id ORDER BY ex.d2, c.neighbor_id) AS rnk
             |           FROM cand c JOIN ex ON ex.query_id = c.query_id AND ex.neighbor_id = c.neighbor_id)
             |          WHERE rnk <= 5),
             |ext AS (SELECT query_id, neighbor_id FROM
             |        (SELECT query_id, neighbor_id,
             |                row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rn
             |         FROM ex) WHERE rn <= 5),
             |oa AS (SELECT e.query_id, count(*) AS n FROM ext e
             |       JOIN apx x ON x.query_id = e.query_id AND x.neighbor_id = e.neighbor_id
             |       GROUP BY 1),
             |orr AS (SELECT e.query_id, count(*) AS n FROM ext e
             |        JOIN rrtop x ON x.query_id = e.query_id AND x.neighbor_id = e.neighbor_id
             |        GROUP BY 1)
             |SELECT qq.vec_id AS query_id,
             |       CAST(coalesce(oa.n, 0) AS BIGINT) AS n_adc,
             |       CAST(coalesce(orr.n, 0) AS BIGINT) AS n_rr,
             |       CAST((20000 * coalesce(oa.n, 0) + 5) // 10 AS BIGINT) AS adc_recall_bp,
             |       CAST((20000 * coalesce(orr.n, 0) + 5) // 10 AS BIGINT) AS rr_recall_bp
             |FROM (SELECT vec_id FROM embeddings WHERE vec_id BETWEEN 20 AND 29) qq
             |LEFT JOIN oa ON oa.query_id = qq.vec_id
             |LEFT JOIN orr ON orr.query_id = qq.vec_id ORDER BY query_id""".stripMargin)),

    // ---- Re-rank SIZING at a production-shaped PQ (m=16 subspaces of
    // 4 dims, 256-entry codebook — q263/q264 used a deliberately crude
    // 16-entry book to make the recall gap visible): recall@5 of plain
    // ADC vs ADC+exact-re-rank, swept over the candidate budget kCand ∈
    // {5, 10, 25, 50}, totaled over 10 queries — the table that picks
    // kCand for a deployment instead of guessing it.
    "q285_rerank_sizing" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 256)
        val qs = emb.filter(col("vec_id").between(300, 309))
        Seq(5, 10, 25, 50).map { kc =>
          Pq.rerankRecall(emb, "vec_id", "embedding", cb, qs,
              k = 5, kCand = kc, m = 16)
            .agg(sum(col("n_adc")).as("n_adc"), sum(col("n_rr")).as("n_rr"))
            .select(lit(kc.toLong).as("k_cand"), col("n_adc"), col("n_rr"),
              expr("(20000 * n_adc + 50) DIV 100").as("adc_recall_bp"),
              expr("(20000 * n_rr + 50) DIV 100").as("rr_recall_bp"))
        }.reduce(_.unionAll(_)).orderBy("k_cand")
      },
      Some(RerankSizingSql)),

    // ---- BPE merge step: corpus-weighted adjacent char-pair counts
    // over the word vocabulary — the inner loop of tokenizer training.
    "q120_bpe_merge_step" -> QueryDef(
      (s, dir) => {
        TextAnalysis.bpePairCounts(table(s, dir, "documents"), "text", topN = 20)
      },
      Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
             |v AS (SELECT word, count(*) AS freq FROM w WHERE length(word) >= 2 GROUP BY word),
             |p AS (SELECT unnest(list_transform(range(1, length(word)),
             |                    i -> substr(word, CAST(i AS INT), 2))) AS pair, freq FROM v),
             |a AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM p GROUP BY pair)
             |SELECT pair, n FROM a ORDER BY n DESC, pair LIMIT 20""".stripMargin)),

    // ---- Tokenizer fertility per source: pieces/word (bp) and
    // chars/piece (centi) — integer HALF_UP, one bounded aggregation.
    "q121_token_fertility" -> QueryDef(
      (s, dir) => {
        TextAnalysis.tokenFertility(table(s, dir, "documents"), "source", "text")
          .orderBy("source")
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(length(text)) AS BIGINT) AS n_chars,
             |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
             |       CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))) AS BIGINT) AS bpe_pieces,
             |       CAST((20000 * sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')))
             |             + sum(len(string_split(text, ' '))))
             |            // (2 * sum(len(string_split(text, ' ')))) AS BIGINT) AS fertility_bp,
             |       CAST((200 * sum(length(text))
             |             + sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))))
             |            // (2 * sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')))) AS BIGINT) AS chars_per_piece_c
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ---- Hashed-feature linear classifier (fastText-style quality
    // model): md5 token buckets, literal weight vector, in-row integer
    // score — a zero-shuffle narrow scan on the Spark side.
    "q122_hashed_classifier" -> QueryDef(
      (s, dir) => {
        TextAnalysis.hashedClassifier(table(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |w AS (SELECT doc_id,
             |             CAST('0x' || substr(md5('w:' ||
             |               CAST(CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) % 64 AS VARCHAR)), 1, 1) AS BIGINT) - 8 AS wt
             |      FROM toks),
             |s AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score FROM w GROUP BY doc_id)
             |SELECT doc_id, score,
             |       CAST(CASE WHEN score >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred_keep
             |FROM s ORDER BY doc_id""".stripMargin)),

    // ---- Train/val embedding drift: per-dim HALF_UP means of the two
    // md5-split halves in scaled integer units — the shift check before
    // trusting a held-out set. One bounded (dim) aggregation.
    "q123_split_drift" -> QueryDef(
      (s, dir) => {
        Similarity.splitDrift(table(s, dir, "embeddings"), "vec_id", "embedding",
            seed = "dr", trainPct = 80)
          .orderBy("dim")
      },
      Some("""WITH sp AS (SELECT vec_id,
             |                   CASE WHEN CAST('0x' || substr(md5('dr:' || CAST(vec_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 < 80
             |                        THEN 'train' ELSE 'val' END AS split,
             |                   embedding
             |            FROM embeddings),
             |q AS (SELECT split, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS sc
             |      FROM sp),
             |a AS (SELECT dim,
             |             CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             |             CAST(sum(CASE WHEN split = 'train' THEN sc ELSE 0 END) AS BIGINT) AS s_train,
             |             CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
             |             CAST(sum(CASE WHEN split = 'val' THEN sc ELSE 0 END) AS BIGINT) AS s_val
             |      FROM q GROUP BY dim),
             |m AS (SELECT dim, n_train, n_val,
             |             CAST(sign(s_train) AS BIGINT) * ((2 * abs(s_train) + n_train) // (2 * n_train)) AS mean_train_sc,
             |             CAST(sign(s_val) AS BIGINT) * ((2 * abs(s_val) + n_val) // (2 * n_val)) AS mean_val_sc
             |      FROM a)
             |SELECT dim, n_train, n_val, mean_train_sc, mean_val_sc,
             |       abs(mean_train_sc - mean_val_sc) AS drift_sc
             |FROM m ORDER BY dim""".stripMargin)),

    // ---- k-NN label propagation: majority label over the exact cosine
    // top-5 (q34's ranking) — weak supervision from a labeled seed set.
    "q124_knn_classify" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Similarity.knnClassify(emb, "vec_id", "embedding", "label",
            emb.filter(col("vec_id") < 10), k = 5)
          .orderBy("query_id")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |d AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             |             sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dp
             |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
             |      GROUP BY a.vec_id, b.vec_id),
             |sc AS (SELECT query_id, neighbor_id, dp / (na.nrm * nb.nrm) AS score
             |       FROM d JOIN n na ON na.vec_id = query_id JOIN n nb ON nb.vec_id = neighbor_id
             |       WHERE nb.nrm <> 0),
             |r AS (SELECT query_id, neighbor_id,
             |             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
             |      FROM sc),
             |v AS (SELECT t.query_id, CAST(em.label AS BIGINT) AS label, count(*) AS votes
             |      FROM (SELECT query_id, neighbor_id FROM r WHERE rnk <= 5) t
             |      JOIN embeddings em ON em.vec_id = t.neighbor_id GROUP BY 1, 2),
             |b AS (SELECT query_id, label, votes,
             |             row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS rn FROM v)
             |SELECT query_id, label AS pred_label, CAST(votes AS BIGINT) AS votes
             |FROM b WHERE rn = 1 ORDER BY query_id""".stripMargin)),

    // ---- LSH bucket-size histogram: the banding-calibration
    // diagnostic that catches degenerate buckets before any pair join.
    "q125_lsh_bucket_histogram" -> QueryDef(
      (s, dir) => {
        Similarity.lshBucketHistogram(table(s, dir, "embeddings"), "vec_id", "embedding",
            nPlanes = 8)
          .orderBy("bucket_size")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |p AS (SELECT j, i, CASE WHEN CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1) AS INT) % 2 = 1
             |                        THEN 1.0 ELSE -1.0 END AS pv
             |      FROM (SELECT unnest(range(0, 8)) AS j) js, (SELECT unnest(range(0, 64)) AS i) xs),
             |proj AS (SELECT vec_id, j, sum(CAST(v AS DOUBLE) * pv) AS pr
             |         FROM e JOIN p ON p.i = e.i - 1 GROUP BY vec_id, j),
             |b AS (SELECT vec_id, CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS bucket
             |      FROM proj GROUP BY vec_id),
             |h AS (SELECT bucket, count(*) AS bucket_size FROM b GROUP BY bucket)
             |SELECT CAST(bucket_size AS BIGINT) AS bucket_size, CAST(count(*) AS BIGINT) AS n_buckets
             |FROM h GROUP BY bucket_size ORDER BY bucket_size""".stripMargin)),

    // ---- Overlapping word windows (training-sequence / RAG chunking):
    // width 12, stride 8, last window clipped, short docs yield
    // themselves. In-row expansion, zero shuffles.
    "q126_chunk_windows" -> QueryDef(
      (s, dir) => {
        Curation.chunkWindows(table(s, dir, "documents"), "doc_id", "text",
            width = 12, stride = 8)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws,
             |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS l
             |           FROM documents),
             |c AS (SELECT doc_id, ws, l, greatest(1, ((l - 12 + 8 - 1) // 8) + 1) AS nc FROM w),
             |x AS (SELECT doc_id, ws, l, unnest(range(nc)) AS i FROM c)
             |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             |       CAST(least(12, l - i * 8) AS BIGINT) AS n_words,
             |       array_to_string(list_slice(ws, CAST(i * 8 + 1 AS INT), CAST(i * 8 + 12 AS INT)), ' ') AS chunk_text
             |FROM x ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---- IVF-ADC: the production billion-vector composition — coarse
    // lists (q50's quantizer) probed per query, candidates scored by PQ
    // code lookups (q118's tables). One fused narrow corpus scan.
    "q127_ivf_adc" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Pq.ivfAdcTopK(emb, "vec_id", "embedding",
            coarse = emb.filter(col("vec_id") < 8),
            codebook = emb.filter(col("vec_id") < 16),
            queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20),
            k = 5, nProbe = 2)
          .orderBy("query_id", "rnk")
      },
      Some(IvfAdcSql)),

    // ---- Multi-probe IVF recall sweep: the q127 index layout swept
    // across nprobe ∈ {1, 2, 4, 8} (8 = every list → the ADC recall
    // ceiling), reporting scored-candidate cost and mean recall@5
    // against the exact scaled-BIGINT ground truth. Candidates are
    // generated once at the widest probe and narrower settings are a
    // probe-rank filter — one corpus pass for the whole table.
    "q204_ivf_nprobe_sweep" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Pq.ivfAdcRecallByNprobe(emb, "vec_id", "embedding",
            coarse = emb.filter(col("vec_id") < 8),
            codebook = emb.filter(col("vec_id") < 16),
            queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20),
            k = 5, nProbes = Seq(1, 2, 4, 8))
          .orderBy("nprobe")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |cc AS (SELECT a.vec_id AS id, k.vec_id AS cent_id, sum(CAST(a.v AS DOUBLE) * CAST(k.v AS DOUBLE)) AS dp
             |       FROM e a JOIN e k ON k.i = a.i AND k.vec_id < 8 GROUP BY 1, 2),
             |cs AS (SELECT id, cent_id, dp / (na.nrm * nk.nrm) AS c
             |       FROM cc JOIN n na ON na.vec_id = id JOIN n nk ON nk.vec_id = cent_id),
             |asg AS (SELECT id, cent_id FROM
             |        (SELECT id, cent_id, row_number() OVER (PARTITION BY id ORDER BY c DESC, cent_id) AS rn FROM cs)
             |        WHERE rn = 1),
             |probe AS (SELECT id AS query_id, cent_id, CAST(rn AS BIGINT) AS probe_rank FROM
             |          (SELECT id, cent_id, row_number() OVER (PARTITION BY id ORDER BY c DESC, cent_id) AS rn
             |           FROM cs WHERE id BETWEEN 10 AND 19)
             |          WHERE rn <= 8),
             |q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
             |      FROM embeddings),
             |pv AS (SELECT vec_id, i // 8 AS sub, i % 8 AS j, qv FROM q),
             |pcb AS (SELECT vec_id AS code, sub, j, qv FROM pv WHERE vec_id < 16),
             |pd AS MATERIALIZED (SELECT pv.vec_id, pv.sub, pcb.code, sum((pv.qv - pcb.qv) * (pv.qv - pcb.qv)) AS dist
             |       FROM pv JOIN pcb ON pcb.sub = pv.sub AND pcb.j = pv.j GROUP BY 1, 2, 3),
             |pa AS (SELECT vec_id, sub, code FROM
             |       (SELECT vec_id, sub, code, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn FROM pd)
             |       WHERE rn = 1),
             |cand AS (SELECT p.query_id, p.probe_rank, ag.id AS neighbor_id FROM probe p
             |         JOIN asg ag ON ag.cent_id = p.cent_id AND ag.id <> p.query_id),
             |adc AS MATERIALIZED (SELECT c2.query_id, c2.probe_rank, c2.neighbor_id, CAST(sum(dq.dist) AS BIGINT) AS adc_dist
             |        FROM cand c2 JOIN pa ON pa.vec_id = c2.neighbor_id
             |        JOIN pd dq ON dq.vec_id = c2.query_id AND dq.sub = pa.sub AND dq.code = pa.code
             |        GROUP BY 1, 2, 3),
             |grid AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) AS nprobe),
             |cj AS MATERIALIZED (SELECT g.nprobe, a.query_id, a.neighbor_id, a.adc_dist
             |      FROM adc a JOIN grid g ON a.probe_rank <= g.nprobe),
             |stats AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS n_candidates FROM cj GROUP BY 1),
             |topk AS (SELECT nprobe, query_id, neighbor_id FROM
             |         (SELECT nprobe, query_id, neighbor_id,
             |                 row_number() OVER (PARTITION BY nprobe, query_id ORDER BY adc_dist, neighbor_id) AS rnk
             |          FROM cj) WHERE rnk <= 5),
             |ex AS (SELECT qa.vec_id AS query_id, nb.vec_id AS neighbor_id,
             |              sum((qa.qv - nb.qv) * (qa.qv - nb.qv)) AS d2
             |       FROM q qa JOIN q nb ON nb.i = qa.i AND nb.vec_id <> qa.vec_id
             |       WHERE qa.vec_id BETWEEN 10 AND 19 GROUP BY 1, 2),
             |ext AS (SELECT query_id, neighbor_id FROM
             |        (SELECT query_id, neighbor_id,
             |                row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rn
             |         FROM ex) WHERE rn <= 5),
             |ov AS (SELECT t.nprobe, CAST(count(*) AS BIGINT) AS n_hits FROM topk t
             |       JOIN ext e ON e.query_id = t.query_id AND e.neighbor_id = t.neighbor_id
             |       GROUP BY 1)
             |SELECT g.nprobe, CAST(coalesce(st.n_candidates, 0) AS BIGINT) AS n_candidates,
             |       CAST(coalesce(ov.n_hits, 0) AS BIGINT) AS n_hits,
             |       CAST((20000 * coalesce(ov.n_hits, 0) + 50) // 100 AS BIGINT) AS mean_recall_bp
             |FROM grid g LEFT JOIN stats st ON st.nprobe = g.nprobe
             |LEFT JOIN ov ON ov.nprobe = g.nprobe
             |ORDER BY g.nprobe""".stripMargin)),

    // ---- The SAME IVF-ADC probes served from the PERSISTED index:
    // assignment + PQ codes materialized once as cent_id-bucketed
    // parquet (built from the even vec_ids, odd half APPENDED), then
    // scoring = bucket-pruned lists scan + broadcast driver-computed
    // probe tables + graft_adc lookups — zero corpus passes. The
    // oracle is q127's: the indexed path must be row-identical to
    // recomputing everything from scratch.
    "q211_ann_indexed" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val idx = annIndexDir(s, dir, emb)
        val probes = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").cast("long"), col("embedding"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          .sortBy(_._1).toSeq
        VectorIndex.annTopKIndexed(s, idx, probes, k = 5, nProbe = 2)
          .orderBy("query_id", "rnk")
      },
      Some(IvfAdcSql)),

    // ---- Tombstoned vector deletes: the q211 probes against an index
    // with vec_id % 10 == 7 deleted — excluded immediately via the
    // broadcast anti-join, and (no corpus stats in ADC) already exactly
    // a rebuild over the survivors even before compaction.
    "q280_ann_delete" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val idx = annDeleteIndexDir(s, dir, emb)
        val probes = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").cast("long"), col("embedding"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          .sortBy(_._1).toSeq
        VectorIndex.annTopKIndexed(s, idx, probes, k = 5, nProbe = 2)
          .orderBy("query_id", "rnk")
      },
      Some(DeleteIvfAdcSql)),

    // ---- Streaming ANN ingest: the SAME survivor scoring as q280, but
    // the index was staged through IndexIngest — seed build, two
    // fenced+sub-ledgered append micro-batches behind the dedup probe,
    // a mid-stream self-compaction, a takedown batch, and a final
    // compaction making the deletes physical. Bit-equality with the
    // monolithic build+delete pins the whole streaming ANN lifecycle.
    "q287_ann_ingest_lifecycle" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val idx = annIngestIndexDir(s, dir, emb)
        val probes = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").cast("long"), col("embedding"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          .sortBy(_._1).toSeq
        VectorIndex.annTopKIndexed(s, idx, probes, k = 5, nProbe = 2)
          .orderBy("query_id", "rnk")
      },
      Some(DeleteIvfAdcSql)),

    // ---- The persisted-index serving path WITH the refine stage:
    // ADC candidates (kCand=15) from the bucket-pruned lists scan,
    // re-scored exactly against the v2 index's scaled refine sidecar,
    // top-5 by true distance — FAISS IndexRefineFlat over parquet.
    "q274_ann_indexed_rerank" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val idx = annIndexDir(s, dir, emb)
        val probes = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").cast("long"), col("embedding"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          .sortBy(_._1).toSeq
        VectorIndex.annTopKRerankedIndexed(s, idx, probes, k = 5,
            kCand = 15, nProbe = 2)
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |cc AS (SELECT a.vec_id AS id, k.vec_id AS cent_id, sum(CAST(a.v AS DOUBLE) * CAST(k.v AS DOUBLE)) AS dp
             |       FROM e a JOIN e k ON k.i = a.i AND k.vec_id < 8 GROUP BY 1, 2),
             |cs AS (SELECT id, cent_id, dp / (na.nrm * nk.nrm) AS c
             |       FROM cc JOIN n na ON na.vec_id = id JOIN n nk ON nk.vec_id = cent_id),
             |asg AS (SELECT id, cent_id FROM
             |        (SELECT id, cent_id, row_number() OVER (PARTITION BY id ORDER BY c DESC, cent_id) AS rn FROM cs)
             |        WHERE rn = 1),
             |probe AS (SELECT id AS query_id, cent_id FROM
             |          (SELECT id, cent_id, row_number() OVER (PARTITION BY id ORDER BY c DESC, cent_id) AS rn
             |           FROM cs WHERE id BETWEEN 10 AND 19)
             |          WHERE rn <= 2),
             |q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
             |      FROM embeddings),
             |pv AS (SELECT vec_id, i // 8 AS sub, i % 8 AS j, qv FROM q),
             |pcb AS (SELECT vec_id AS code, sub, j, qv FROM pv WHERE vec_id < 16),
             |pd AS MATERIALIZED (SELECT pv.vec_id, pv.sub, pcb.code, sum((pv.qv - pcb.qv) * (pv.qv - pcb.qv)) AS dist
             |       FROM pv JOIN pcb ON pcb.sub = pv.sub AND pcb.j = pv.j GROUP BY 1, 2, 3),
             |pa AS (SELECT vec_id, sub, code FROM
             |       (SELECT vec_id, sub, code, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn FROM pd)
             |       WHERE rn = 1),
             |cand AS (SELECT p.query_id, ag.id AS neighbor_id FROM probe p
             |         JOIN asg ag ON ag.cent_id = p.cent_id AND ag.id <> p.query_id),
             |adc AS MATERIALIZED (SELECT c2.query_id, c2.neighbor_id, CAST(sum(dq.dist) AS BIGINT) AS adc_dist
             |        FROM cand c2 JOIN pa ON pa.vec_id = c2.neighbor_id
             |        JOIN pd dq ON dq.vec_id = c2.query_id AND dq.sub = pa.sub AND dq.code = pa.code
             |        GROUP BY 1, 2),
             |ck AS (SELECT query_id, neighbor_id FROM
             |       (SELECT query_id, neighbor_id,
             |               row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk
             |        FROM adc) WHERE rnk <= 15),
             |ex AS (SELECT qa.vec_id AS query_id, nb.vec_id AS neighbor_id,
             |              CAST(sum((qa.qv - nb.qv) * (qa.qv - nb.qv)) AS BIGINT) AS d2
             |       FROM q qa JOIN q nb ON nb.i = qa.i
             |       WHERE qa.vec_id BETWEEN 10 AND 19 GROUP BY 1, 2),
             |rr AS (SELECT c.query_id, c.neighbor_id, ex.d2,
             |              row_number() OVER (PARTITION BY c.query_id ORDER BY ex.d2, c.neighbor_id) AS rnk
             |       FROM ck c JOIN ex ON ex.query_id = c.query_id AND ex.neighbor_id = c.neighbor_id)
             |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, d2
             |FROM rr WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    // ---- Stride-scheduled weighted interleave: the deterministic
    // data-loader order for a 3-source mixture (50/30/20) — reading in
    // (vt, source) order gives every prefix the target mix with ±1
    // deviation per source, which batch-level sampling can't promise.
    "q220_interleave_schedule" -> QueryDef(
      (s, dir) => {
        Curation.interleaveSchedule(
            table(s, dir, "documents")
              .filter(col("source").isin("src0", "src1", "src2")),
            "source", "doc_id",
            Map("src0" -> 5000L, "src1" -> 3000L, "src2" -> 2000L))
          .orderBy("vt", "source", "src_rank")
      },
      Some("""WITH d AS (SELECT source, doc_id FROM documents
             |           WHERE source IN ('src0', 'src1', 'src2')),
             |w AS (SELECT * FROM (VALUES ('src0', 5000), ('src1', 3000),
             |                            ('src2', 2000)) v(source, w)),
             |r AS (SELECT d.source, d.doc_id, CAST(w.w AS BIGINT) AS w,
             |             CAST(row_number() OVER (PARTITION BY d.source
             |               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS BIGINT) AS src_rank
             |      FROM d JOIN w USING (source))
             |SELECT source, doc_id, src_rank,
             |       (src_rank * 1000000 + w - 1) // w AS vt
             |FROM r ORDER BY vt, source, src_rank""".stripMargin)),

    // ---- Rank-normalized quality blend: length and distinct-token
    // ratio each mapped to within-source percentile rank (ties by doc
    // id; singleton source → neutral 5000), HALF_UP-averaged into one
    // composite — incomparable signal scales never touch each other.
    "q222_quality_blend" -> QueryDef(
      (s, dir) => {
        TextAnalysis.qualityBlend(table(s, dir, "documents"),
            "doc_id", "text", "source")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, source AS src,
             |                  CAST(length(text) AS BIGINT) AS len,
             |                  CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS dt,
             |                  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS nt
             |           FROM documents),
             |b AS (SELECT doc_id, src, len, (20000 * dt + nt) // (2 * nt) AS ttr
             |      FROM t WHERE nt > 0),
             |r AS (SELECT doc_id, src,
             |             CAST(row_number() OVER (PARTITION BY src ORDER BY len, doc_id) AS BIGINT) AS rl,
             |             CAST(row_number() OVER (PARTITION BY src ORDER BY ttr, doc_id) AS BIGINT) AS rt,
             |             CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS n
             |      FROM b),
             |nrm AS (SELECT doc_id, src,
             |             CASE WHEN n > 1 THEN (20000 * (rl - 1) + (n - 1)) // (2 * (n - 1)) ELSE 5000 END AS len_bp,
             |             CASE WHEN n > 1 THEN (20000 * (rt - 1) + (n - 1)) // (2 * (n - 1)) ELSE 5000 END AS ttr_bp
             |      FROM r)
             |SELECT doc_id, src, CAST(len_bp AS BIGINT) AS len_bp,
             |       CAST(ttr_bp AS BIGINT) AS ttr_bp,
             |       CAST((len_bp + ttr_bp + 1) // 2 AS BIGINT) AS blend_bp
             |FROM nrm ORDER BY doc_id""".stripMargin)),

    // ---- Spearman rank-correlation matrix between embedding dims:
    // ranks by (scaled value, id) — a total order both engines share —
    // then the exact rational 1 − 6Σd²/(n(n²−1)) in HALF_UP milli;
    // the monotone-dependence companion to the q136 covariance.
    "q243_spearman_matrix" -> QueryDef(
      (s, dir) => {
        Similarity.spearmanMatrix(table(s, dir, "embeddings"),
            "vec_id", "embedding")
          .orderBy("di", "dj")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding,
             |              x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS sv
             |        FROM embeddings),
             |x AS (SELECT vec_id, sv, unnest(range(1, len(sv) + 1)) AS d FROM e),
             |v AS (SELECT vec_id, CAST(d - 1 AS BIGINT) AS dim,
             |             sv[CAST(d AS INT)] AS xsc FROM x),
             |r AS (SELECT vec_id, dim, CAST(row_number() OVER
             |        (PARTITION BY dim ORDER BY xsc, vec_id) AS BIGINT) AS rk FROM v),
             |p AS (SELECT a.dim AS di, b.dim AS dj,
             |             (a.rk - b.rk) * (a.rk - b.rk) AS d2
             |      FROM r a JOIN r b ON a.vec_id = b.vec_id AND a.dim < b.dim),
             |s AS (SELECT di, dj, CAST(count(*) AS BIGINT) AS n, sum(d2) AS sd
             |      FROM p GROUP BY 1, 2)
             |SELECT di, dj, n,
             |       CAST(CASE WHEN n*n*n - n - 6*sd < 0 THEN -1 ELSE 1 END *
             |            ((2000 * abs(n*n*n - n - 6*sd) + (n*n*n - n))
             |              // (2 * (n*n*n - n))) AS BIGINT) AS spearman_milli
             |FROM s ORDER BY di, dj""".stripMargin)),

    // ---- Top principal direction via integer power iteration on the
    // q136 covariance: 8 fixed HALF_UP-rescaled iterations, sign
    // canonicalized — the dominant-direction diagnostic before
    // whitening. Distributed work = the covariance pass; the iteration
    // runs on the d²-bounded cell table (driver / unrolled
    // MATERIALIZED levels in the oracle).
    "q230_top_eigenvector" -> QueryDef(
      (s, dir) => {
        Similarity.topEigenvector(table(s, dir, "embeddings"), "embedding",
            iters = 8)
          .orderBy("dim")
      },
      Some {
        val sb = new StringBuilder
        sb.append(
          """WITH e AS (SELECT list_transform(embedding,
            |              x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS sv
            |        FROM embeddings),
            |t AS (SELECT sv, unnest(range(1, len(sv) + 1)) AS i FROM e),
            |p AS (SELECT sv, i, unnest(range(i, len(sv) + 1)) AS j FROM t),
            |c AS (SELECT CAST(i - 1 AS BIGINT) AS di, CAST(j - 1 AS BIGINT) AS dj,
            |             sv[CAST(i AS INT)] AS xi, sv[CAST(j AS INT)] AS xj
            |      FROM p),
            |a AS (SELECT di, dj, CAST(count(*) AS BIGINT) AS n,
            |             sum(xi) AS si, sum(xj) AS sj, sum(xi * xj) AS sij
            |      FROM c GROUP BY di, dj),
            |cov AS MATERIALIZED (SELECT di, dj,
            |       CAST((CASE WHEN n * sij - si * sj < 0 THEN -1 ELSE 1 END) *
            |            ((2 * abs(n * sij - si * sj) + 100 * n * n)
            |              // (2 * 100 * n * n)) AS BIGINT) AS cov_u
            |FROM a),
            |m AS MATERIALIZED (SELECT di AS i, dj AS j, cov_u AS c FROM cov
            |     UNION ALL SELECT dj, di, cov_u FROM cov WHERE di <> dj),
            |v0 AS MATERIALIZED (SELECT DISTINCT di AS i, CAST(10000 AS BIGINT) AS v FROM cov)""".stripMargin)
        for (k <- 1 to 8) {
          sb.append(s""",
            |u$k AS MATERIALIZED (SELECT m.i AS i, CAST(sum(m.c * v${k - 1}.v) AS BIGINT) AS u
            |     FROM m JOIN v${k - 1} ON v${k - 1}.i = m.j GROUP BY m.i),
            |s$k AS MATERIALIZED (SELECT max(abs(u)) AS mx FROM u$k),
            |v$k AS MATERIALIZED (SELECT i, CASE WHEN mx = 0 THEN u
            |     ELSE CAST(sign(u) AS BIGINT) *
            |          CAST((2 * abs(u) * 10000 + mx) // (2 * mx) AS BIGINT) END AS v
            |     FROM u$k, s$k)""".stripMargin)
        }
        sb.append(
          """,
            |sg AS (SELECT CASE WHEN (SELECT v FROM v8 WHERE v <> 0 ORDER BY i LIMIT 1) < 0
            |              THEN -1 ELSE 1 END AS s)
            |SELECT CAST(i AS BIGINT) AS dim, CAST(v * s AS BIGINT) AS loading_bp
            |FROM v8, sg ORDER BY dim""".stripMargin)
        sb.toString
      }),

    // ---- PCA projection/residual per embedding: dot with the q230
    // signed eigenvector and the off-axis energy fraction in micro —
    // the all-but-the-top per-row diagnostic; loading vector rides as
    // a literal (zero-shuffle projection scan).
    "q262_pca_projection" -> QueryDef(
      (s, dir) => {
        Similarity.pcaProjection(table(s, dir, "embeddings"),
            "vec_id", "embedding", iters = 8)
          .withColumnRenamed("id", "vec_id")
          .orderBy("vec_id")
      },
      Some {
        val sb = new StringBuilder
        sb.append(
          """WITH e AS (SELECT vec_id, list_transform(embedding,
            |              x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS sv
            |        FROM embeddings),
            |t AS (SELECT sv, unnest(range(1, len(sv) + 1)) AS i FROM e),
            |p AS (SELECT sv, i, unnest(range(i, len(sv) + 1)) AS j FROM t),
            |c AS (SELECT CAST(i - 1 AS BIGINT) AS di, CAST(j - 1 AS BIGINT) AS dj,
            |             sv[CAST(i AS INT)] AS xi, sv[CAST(j AS INT)] AS xj
            |      FROM p),
            |a AS (SELECT di, dj, CAST(count(*) AS BIGINT) AS n,
            |             sum(xi) AS si, sum(xj) AS sj, sum(xi * xj) AS sij
            |      FROM c GROUP BY di, dj),
            |cov AS MATERIALIZED (SELECT di, dj,
            |       CAST((CASE WHEN n * sij - si * sj < 0 THEN -1 ELSE 1 END) *
            |            ((2 * abs(n * sij - si * sj) + 100 * n * n)
            |              // (2 * 100 * n * n)) AS BIGINT) AS cov_u
            |FROM a),
            |m AS MATERIALIZED (SELECT di AS i, dj AS j, cov_u AS c FROM cov
            |     UNION ALL SELECT dj, di, cov_u FROM cov WHERE di <> dj),
            |v0 AS MATERIALIZED (SELECT DISTINCT di AS i, CAST(10000 AS BIGINT) AS v FROM cov)""".stripMargin)
        for (k <- 1 to 8) {
          sb.append(s""",
            |u$k AS MATERIALIZED (SELECT m.i AS i, CAST(sum(m.c * v${k - 1}.v) AS BIGINT) AS u
            |     FROM m JOIN v${k - 1} ON v${k - 1}.i = m.j GROUP BY m.i),
            |s$k AS MATERIALIZED (SELECT max(abs(u)) AS mx FROM u$k),
            |v$k AS MATERIALIZED (SELECT i, CASE WHEN mx = 0 THEN u
            |     ELSE CAST(sign(u) AS BIGINT) *
            |          CAST((2 * abs(u) * 10000 + mx) // (2 * mx) AS BIGINT) END AS v
            |     FROM u$k, s$k)""".stripMargin)
        }
        sb.append(
          """,
            |sg AS (SELECT CASE WHEN (SELECT v FROM v8 WHERE v <> 0 ORDER BY i LIMIT 1) < 0
            |              THEN -1 ELSE 1 END AS s),
            |vs AS MATERIALIZED (SELECT i, CAST(v * s AS BIGINT) AS v FROM v8, sg),
            |vv AS (SELECT CAST(sum(v * v) AS BIGINT) AS v2 FROM vs),
            |x AS (SELECT vec_id, sv, unnest(range(1, len(sv) + 1)) AS d FROM e),
            |xv AS (SELECT vec_id, CAST(d - 1 AS BIGINT) AS dim,
            |              sv[CAST(d AS INT)] AS xi FROM x),
            |pr AS (SELECT xv.vec_id, CAST(sum(xi * vs.v) AS BIGINT) AS dot,
            |              CAST(sum(xi * xi) AS BIGINT) AS norm2
            |       FROM xv JOIN vs ON vs.i = xv.dim GROUP BY 1)
            |SELECT pr.vec_id, dot, norm2,
            |       CAST(CASE WHEN norm2 > 0 AND v2 > 0 THEN
            |         (2000000 * (CAST(norm2 AS HUGEINT) * v2 - CAST(dot AS HUGEINT) * dot)
            |          + (CAST(norm2 AS HUGEINT) * v2))
            |           // (2 * CAST(norm2 AS HUGEINT) * v2)
            |       ELSE NULL END AS BIGINT) AS residual_micro
            |FROM pr CROSS JOIN vv ORDER BY vec_id""".stripMargin)
        sb.toString
      }),

    // ---- Top-2 principal directions via power iteration + Hotelling
    // deflation (all-but-the-top needs the SUBSPACE, not one axis):
    // after component 1, C -= (vᵀCv)·v·vᵀ/(vᵀv)² once-rounded signed
    // HALF_UP, then the same 8 iterations on the deflated matrix —
    // every step integer, replayed level-by-level by the oracle.
    "q265_pca_top2" -> QueryDef(
      (s, dir) => {
        Similarity.topEigenvectors(table(s, dir, "embeddings"), "embedding",
            r = 2, iters = 8)
          .orderBy("component", "dim")
      },
      Some(pcaChainSql(2) +
        """
          |SELECT component, dim, loading_bp FROM (
          |  SELECT CAST(1 AS BIGINT) AS component, CAST(i AS BIGINT) AS dim,
          |         CAST(v AS BIGINT) AS loading_bp FROM vs1
          |  UNION ALL
          |  SELECT CAST(2 AS BIGINT), CAST(i AS BIGINT), CAST(v AS BIGINT) FROM vs2
          |) t ORDER BY component, dim""".stripMargin)),

    // ---- Per-row energy split over the top-2 PCA subspace: e_c =
    // HALF_UP(10⁶·dot_c²/(norm²·|v_c|²)) per component, off = 10⁶ −
    // e1 − e2 — the all-but-the-top subspace diagnostic (loadings ride
    // as literals; the projection scan is zero-shuffle).
    "q266_pca_subspace_residual" -> QueryDef(
      (s, dir) => {
        Similarity.pcaSubspaceResidual(table(s, dir, "embeddings"),
            "vec_id", "embedding", r = 2, iters = 8)
          .withColumnRenamed("id", "vec_id")
          .orderBy("vec_id")
      },
      Some(pcaChainSql(2) +
        """,
          |vv1 AS (SELECT CAST(sum(v * v) AS BIGINT) AS v2 FROM vs1),
          |vv2 AS (SELECT CAST(sum(v * v) AS BIGINT) AS v2 FROM vs2),
          |x AS (SELECT vec_id, sv, unnest(range(1, len(sv) + 1)) AS d FROM e),
          |xv AS (SELECT vec_id, CAST(d - 1 AS BIGINT) AS dim,
          |              sv[CAST(d AS INT)] AS xi FROM x),
          |pr1 AS MATERIALIZED (SELECT xv.vec_id, CAST(sum(xi * vs1.v) AS BIGINT) AS dot,
          |              CAST(sum(xi * xi) AS BIGINT) AS norm2
          |       FROM xv JOIN vs1 ON vs1.i = xv.dim GROUP BY 1),
          |pr2 AS MATERIALIZED (SELECT xv.vec_id, CAST(sum(xi * vs2.v) AS BIGINT) AS dot
          |       FROM xv JOIN vs2 ON vs2.i = xv.dim GROUP BY 1),
          |en AS (SELECT pr1.vec_id,
          |       CASE WHEN pr1.norm2 > 0 AND vv1.v2 > 0 THEN
          |         CAST((2000000 * CAST(pr1.dot AS HUGEINT) * pr1.dot
          |               + CAST(pr1.norm2 AS HUGEINT) * vv1.v2)
          |           // (2 * CAST(pr1.norm2 AS HUGEINT) * vv1.v2) AS BIGINT)
          |       ELSE NULL END AS e1_micro,
          |       CASE WHEN pr1.norm2 > 0 AND vv2.v2 > 0 THEN
          |         CAST((2000000 * CAST(pr2.dot AS HUGEINT) * pr2.dot
          |               + CAST(pr1.norm2 AS HUGEINT) * vv2.v2)
          |           // (2 * CAST(pr1.norm2 AS HUGEINT) * vv2.v2) AS BIGINT)
          |       ELSE NULL END AS e2_micro
          |       FROM pr1 JOIN pr2 ON pr2.vec_id = pr1.vec_id, vv1, vv2)
          |SELECT vec_id, e1_micro, e2_micro,
          |       CAST(1000000 - e1_micro - e2_micro AS BIGINT) AS off_micro
          |FROM en ORDER BY vec_id""".stripMargin)),

    // ---- Matryoshka truncation sweep: exact recall@5 of prefix-dim
    // search (m ∈ {8,16,32,64}) vs full 64-dim ground truth — the
    // serve-at-fewer-dims tuning table; the m=64 row is recall 10000
    // by construction (harness self-check). One pair materialization
    // feeds every m.
    "q217_matryoshka_recall" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Similarity.matryoshkaRecall(emb, "vec_id", "embedding",
            queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20),
            k = 5, dims = Seq(8, 16, 32, 64))
          .orderBy("m_dims")
      },
      Some("""WITH q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
             |                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS v
             |           FROM embeddings),
             |pd AS MATERIALIZED (SELECT qa.vec_id AS query_id, nb.vec_id AS neighbor_id, qa.i,
             |             (qa.v - nb.v) * (qa.v - nb.v) AS sq
             |      FROM q qa JOIN q nb ON nb.i = qa.i AND nb.vec_id <> qa.vec_id
             |      WHERE qa.vec_id BETWEEN 10 AND 19),
             |grid AS (SELECT CAST(unnest([8, 16, 32, 64]) AS BIGINT) AS m_dims),
             |tr AS MATERIALIZED (SELECT g.m_dims, pd.query_id, pd.neighbor_id,
             |             CAST(sum(sq) AS BIGINT) AS d2
             |      FROM pd JOIN grid g ON pd.i <= g.m_dims GROUP BY 1, 2, 3),
             |tk AS (SELECT m_dims, query_id, neighbor_id FROM
             |       (SELECT m_dims, query_id, neighbor_id,
             |               row_number() OVER (PARTITION BY m_dims, query_id
             |                 ORDER BY d2, neighbor_id) AS rn FROM tr)
             |       WHERE rn <= 5),
             |fx AS MATERIALIZED (SELECT query_id, neighbor_id, CAST(sum(sq) AS BIGINT) AS d2
             |      FROM pd GROUP BY 1, 2),
             |ex AS (SELECT query_id, neighbor_id FROM
             |       (SELECT query_id, neighbor_id,
             |               row_number() OVER (PARTITION BY query_id
             |                 ORDER BY d2, neighbor_id) AS rn FROM fx)
             |       WHERE rn <= 5),
             |hits AS (SELECT t.m_dims, CAST(count(*) AS BIGINT) AS n_hits
             |         FROM tk t JOIN ex e ON e.query_id = t.query_id
             |           AND e.neighbor_id = t.neighbor_id GROUP BY 1)
             |SELECT g.m_dims, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
             |       CAST((20000 * coalesce(h.n_hits, 0) + 50) // 100 AS BIGINT) AS mean_recall_bp
             |FROM grid g LEFT JOIN hits h ON h.m_dims = g.m_dims
             |ORDER BY g.m_dims""".stripMargin)),

    // ---- Flesch reading-ease in exact milli-points: words / sentence
    // units / vowel-group syllables counted with pinned proxies
    // (unpunctuated docs fall back to 15-word sentence units), HALF_UP
    // integer formula on both engines. Narrow per-row arithmetic.
    "q216_readability" -> QueryDef(
      (s, dir) => {
        TextAnalysis.readability(table(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id,
             |                  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_words,
             |                  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS np,
             |                  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
             |           FROM documents),
             |s AS (SELECT doc_id, n_words,
             |             CASE WHEN np > 0 THEN np
             |                  ELSE (n_words + 14) // 15 END AS n_sentences,
             |             n_syllables
             |      FROM b WHERE n_words > 0)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |       206835 - (2 * 1015 * n_words + n_sentences) // (2 * n_sentences)
             |              - (2 * 84600 * n_syllables + n_words) // (2 * n_words) AS fre_milli
             |FROM s ORDER BY doc_id""".stripMargin)),

    // ---- Snapshot drift report: exact total-variation distance per
    // categorical column between the corpus and a refreshed snapshot
    // (here: %11 of docs dropped, %5 relabeled to lang 'xx') — the
    // check a pipeline runs before swapping a new crawl in. Integer-
    // exact on cross-multiplied counts; the most-drifted value rides
    // along.
    "q207_snapshot_drift" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val b = docs.filter(col("doc_id") % 11 =!= 0)
          .select(
            when(col("doc_id") % 5 === 0, lit("xx")).otherwise(col("lang")).as("lang"),
            col("source"))
        Profiling.categoricalDrift(docs, b, Seq("lang", "source"))
          .orderBy("col_name")
      },
      Some("""WITH b AS (SELECT CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS lang,
             |                 source
             |          FROM documents WHERE doc_id % 11 <> 0),
             |la AS (SELECT coalesce(lang, '(null)') AS v, CAST(count(*) AS BIGINT) AS n_a
             |       FROM documents GROUP BY 1),
             |lb AS (SELECT coalesce(lang, '(null)') AS v, CAST(count(*) AS BIGINT) AS n_b
             |       FROM b GROUP BY 1),
             |lj AS (SELECT coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b, coalesce(la.v, lb.v) AS v
             |       FROM la FULL OUTER JOIN lb ON lb.v = la.v),
             |lt AS (SELECT CAST(count(*) AS BIGINT) AS n_values,
             |              CAST(sum(n_a) AS BIGINT) AS tot_a,
             |              CAST(sum(n_b) AS BIGINT) AS tot_b FROM lj),
             |lagg AS (SELECT CAST(sum(abs(n_a * tot_b - n_b * tot_a)) AS BIGINT) AS s
             |         FROM lj CROSS JOIN lt),
             |ltop AS (SELECT v, CAST(abs(n_a * tot_b - n_b * tot_a) AS BIGINT) AS d
             |         FROM lj CROSS JOIN lt ORDER BY d DESC, v LIMIT 1),
             |sa AS (SELECT coalesce(source, '(null)') AS v, CAST(count(*) AS BIGINT) AS n_a
             |       FROM documents GROUP BY 1),
             |sb AS (SELECT coalesce(source, '(null)') AS v, CAST(count(*) AS BIGINT) AS n_b
             |       FROM b GROUP BY 1),
             |sj AS (SELECT coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b, coalesce(sa.v, sb.v) AS v
             |       FROM sa FULL OUTER JOIN sb ON sb.v = sa.v),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n_values,
             |              CAST(sum(n_a) AS BIGINT) AS tot_a,
             |              CAST(sum(n_b) AS BIGINT) AS tot_b FROM sj),
             |sagg AS (SELECT CAST(sum(abs(n_a * tot_b - n_b * tot_a)) AS BIGINT) AS s
             |         FROM sj CROSS JOIN st),
             |stop AS (SELECT v, CAST(abs(n_a * tot_b - n_b * tot_a) AS BIGINT) AS d
             |         FROM sj CROSS JOIN st ORDER BY d DESC, v LIMIT 1)
             |SELECT * FROM (
             |  SELECT 'lang' AS col_name, lt.n_values, lt.tot_a, lt.tot_b,
             |         (20000 * lagg.s + 2 * lt.tot_a * lt.tot_b)
             |           // (4 * lt.tot_a * lt.tot_b) AS tv_bp,
             |         ltop.v AS top_value,
             |         (20000 * ltop.d + 2 * lt.tot_a * lt.tot_b)
             |           // (4 * lt.tot_a * lt.tot_b) AS top_delta_bp
             |  FROM lt CROSS JOIN lagg CROSS JOIN ltop
             |  UNION ALL
             |  SELECT 'source', st.n_values, st.tot_a, st.tot_b,
             |         (20000 * sagg.s + 2 * st.tot_a * st.tot_b)
             |           // (4 * st.tot_a * st.tot_b),
             |         stop.v,
             |         (20000 * stop.d + 2 * st.tot_a * st.tot_b)
             |           // (4 * st.tot_a * st.tot_b)
             |  FROM st CROSS JOIN sagg CROSS JOIN stop) t
             |ORDER BY col_name""".stripMargin)),

    // ---- Term proximity ('table' vs 'scan'): per co-occurring doc,
    // occurrence counts + minimum token distance — the phrase-nearness
    // layer over bag-of-words retrieval. Entirely in-row (position
    // arrays + min fold over the token split), zero shuffles.
    "q208_term_proximity" -> QueryDef(
      (s, dir) => {
        TextAnalysis.termProximity(table(s, dir, "documents"),
            "doc_id", "text", "table", "scan")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH raw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             |                   generate_subscripts(string_split(text, ' '), 1) AS gi
             |            FROM documents),
             |tok AS (SELECT doc_id, tok,
             |               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY gi) - 1
             |                    AS BIGINT) AS i
             |        FROM raw WHERE tok <> ''),
             |a AS (SELECT doc_id, i FROM tok WHERE tok = 'table'),
             |b AS (SELECT doc_id, i FROM tok WHERE tok = 'scan'),
             |na AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_a FROM a GROUP BY 1),
             |nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_b FROM b GROUP BY 1),
             |g AS (SELECT a.doc_id, CAST(min(abs(a.i - b.i)) AS BIGINT) AS min_gap
             |      FROM a JOIN b USING (doc_id) GROUP BY 1)
             |SELECT g.doc_id, na.n_a, nb.n_b, g.min_gap
             |FROM g JOIN na USING (doc_id) JOIN nb USING (doc_id)
             |ORDER BY g.doc_id""".stripMargin)),

    // ---- Encoding-anomaly detection over a deterministically-damaged
    // corpus: %7 docs get 1–3 appended U+FFFD replacement chars (a
    // lossy decode's scar), %13 docs two BEL control chars (binary
    // leak-through). The detector must flag exactly the damaged docs
    // with exact counts; the oracle predicts them arithmetically.
    "q209_encoding_anomalies" -> QueryDef(
      (s, dir) => {
        val damaged = table(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 7 === 0,
              concat(lit(" "), repeat(lit("�"), (col("doc_id") % 3 + 1).cast("int"))))
              .otherwise(lit("")),
            when(col("doc_id") % 13 === 0, lit("\u0007\u0007"))
              .otherwise(lit(""))).as("text"))
        TextAnalysis.encodingAnomalies(damaged, "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
             |  CAST(strlen(text) AS BIGINT)
             |    + CASE WHEN doc_id % 7 = 0 THEN 1 + doc_id % 3 + 1 ELSE 0 END
             |    + CASE WHEN doc_id % 13 = 0 THEN 2 ELSE 0 END AS n_chars,
             |  CAST(CASE WHEN doc_id % 7 = 0 THEN doc_id % 3 + 1 ELSE 0 END AS BIGINT) AS n_repl,
             |  CAST(CASE WHEN doc_id % 13 = 0 THEN 2 ELSE 0 END AS BIGINT) AS n_ctl
             |  FROM documents WHERE text IS NOT NULL)
             |SELECT doc_id, n_chars, n_repl, n_ctl,
             |       (20000 * (n_repl + n_ctl) + n_chars) // (2 * n_chars) AS anomaly_bp
             |FROM d WHERE n_repl + n_ctl > 0
             |ORDER BY doc_id""".stripMargin)),

    // ---- Pairwise source divergence (count-weighted unigram LLR in
    // micro-nats): the corpus-similarity matrix behind mixture design.
    "q128_source_divergence" -> QueryDef(
      (s, dir) => {
        TextAnalysis.sourceDivergence(table(s, dir, "documents"), "source", "text")
          .orderBy("src_a", "src_b")
      },
      Some("""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
             |c AS (SELECT source, w, count(*) AS c FROM toks WHERE w <> '' GROUP BY 1, 2),
             |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY source),
             |vz AS (SELECT count(DISTINCT w) AS gv FROM c),
             |grid AS (SELECT tb.source AS src_b, vw.w, tb.n AS n_b, coalesce(cb.c, 0) AS c_b
             |         FROM (SELECT DISTINCT w FROM c) vw CROSS JOIN t tb
             |         LEFT JOIN c cb ON cb.source = tb.source AND cb.w = vw.w),
             |a AS (SELECT ca.source AS src_a, ca.w, ca.c AS c_a, ta.n AS n_a
             |      FROM c ca JOIN t ta ON ta.source = ca.source),
             |terms AS (SELECT src_a, src_b, c_a,
             |                 CAST(round(ln(CAST((c_a + 1) * (n_b + gv) AS DOUBLE) /
             |                               CAST((c_b + 1) * (n_a + gv) AS DOUBLE)) * 1000000.0) AS BIGINT) AS lt
             |          FROM a JOIN grid ON grid.w = a.w CROSS JOIN vz WHERE src_a <> src_b)
             |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_terms,
             |       CAST(sum(c_a * lt) AS BIGINT) AS div_micro
             |FROM terms GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Cross-document winnowing matches (the MOSS detector): pairs
    // sharing >= 2 distinct fingerprints via the fingerprint-bucket join.
    "q129_winnowing_matches" -> QueryDef(
      (s, dir) => {
        TextAnalysis.winnowingMatches(table(s, dir, "documents"), "doc_id", "text",
            k = 4, w = 4, minShared = 2L)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             |           WHERE len(string_split(text, ' ')) >= 4),
             |t AS (SELECT doc_id, unnest(range(1, len(ws) - 2)) AS i, ws FROM w),
             |h AS (SELECT doc_id, i, md5(ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)]
             |             || ' ' || ws[CAST(i+2 AS INT)] || ' ' || ws[CAST(i+3 AS INT)]) AS hv
             |      FROM t),
             |g AS (SELECT doc_id, count(*) AS n_grams FROM h GROUP BY doc_id),
             |win AS (SELECT doc_id, unnest(range(1, greatest(n_grams - 4 + 1, 1) + 1)) AS j,
             |               n_grams FROM g),
             |m AS (SELECT win.doc_id, win.j, min(h.hv) AS mh
             |      FROM win JOIN h ON h.doc_id = win.doc_id
             |                     AND h.i >= win.j AND h.i <= least(win.j + 3, win.n_grams)
             |      GROUP BY win.doc_id, win.j),
             |fp AS (SELECT DISTINCT doc_id, mh FROM m),
             |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
             |       FROM fp a JOIN fp b ON b.mh = a.mh AND a.doc_id < b.doc_id
             |       GROUP BY 1, 2)
             |SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
             |FROM pr WHERE n_shared >= 2 ORDER BY id_a, id_b""".stripMargin)),

    // ---- Dedup cluster-size histogram: the post-clustering health
    // report (a giant component = glued corpus, the q106 pathology).
    "q130_cluster_size_histogram" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents").select(col("doc_id"))
        val maxId = docs.agg(max("doc_id")).first().getLong(0)
        val e1 = docs.filter(col("doc_id") % 7 < 2 && col("doc_id") + 1 <= maxId)
          .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        val e2 = docs.filter(col("doc_id") % 13 === 0 && col("doc_id") + 50 <= maxId)
          .select(col("doc_id").as("a"), (col("doc_id") + 50).as("b"))
        Dedup.clusterSizeHistogram(
            Dedup.connectedComponents(e1.union(e2), "a", "b"), "comp")
          .orderBy("cluster_size")
      },
      Some("""WITH RECURSIVE e0 AS (
             |  SELECT doc_id AS u, doc_id + 1 AS v FROM documents
             |  WHERE doc_id % 7 < 2 AND doc_id + 1 <= (SELECT max(doc_id) FROM documents)
             |  UNION ALL
             |  SELECT doc_id, doc_id + 50 FROM documents
             |  WHERE doc_id % 13 = 0 AND doc_id + 50 <= (SELECT max(doc_id) FROM documents)),
             |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
             |nodes AS (SELECT DISTINCT u AS id FROM e),
             |r AS (
             |  SELECT id AS src, id AS dst FROM nodes
             |  UNION
             |  SELECT r.src, e.v FROM r JOIN e ON e.u = r.dst),
             |comp AS (SELECT src AS id, min(dst) AS component FROM r GROUP BY src),
             |sz AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
             |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
             |       CAST(count(*) AS BIGINT) AS n_clusters
             |FROM sz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin)),

    // ---- Centroid silhouette: per-vector (b²−a²)/b² in bp against the
    // q50 codebook — cluster-quality eval as a zero-shuffle narrow scan.
    "q131_silhouette" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Similarity.silhouette(emb, "vec_id", "embedding", emb.filter(col("vec_id") < 8))
          .withColumnRenamed("id", "vec_id")
          .orderBy("vec_id")
      },
      Some("""WITH q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             |                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000.0) AS BIGINT) AS qv
             |           FROM embeddings),
             |cb AS (SELECT vec_id AS cid, i, qv FROM q WHERE vec_id < 8),
             |d AS (SELECT q.vec_id, cb.cid, sum((q.qv - cb.qv) * (q.qv - cb.qv)) AS d2
             |      FROM q JOIN cb ON cb.i = q.i GROUP BY 1, 2),
             |r AS (SELECT vec_id, cid, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d),
             |ab AS (SELECT a.vec_id, a.cid AS cluster_id, CAST(a.d2 AS BIGINT) AS a2, CAST(b.d2 AS BIGINT) AS b2
             |       FROM (SELECT * FROM r WHERE rn = 1) a JOIN (SELECT * FROM r WHERE rn = 2) b USING (vec_id))
             |SELECT vec_id, cluster_id, a2, b2,
             |       CASE WHEN b2 = 0 THEN 0 ELSE (20000 * (b2 - a2) + b2) // (2 * b2) END AS s_bp
             |FROM ab ORDER BY vec_id""".stripMargin)),

    // ---- LSH ANN recall@5 vs the exact cosine top-5 — calibrates
    // nPlanes the way q119 calibrates the PQ codebook.
    "q132_lsh_recall" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Similarity.lshRecall(emb, "vec_id", "embedding",
            emb.filter(col("vec_id") < 10), k = 5, nPlanes = 8)
          .orderBy("query_id")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |xd AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             |              sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dp
             |       FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
             |       GROUP BY 1, 2),
             |xsc AS (SELECT query_id, neighbor_id, dp / (na.nrm * nb.nrm) AS score
             |        FROM xd JOIN n na ON na.vec_id = query_id JOIN n nb ON nb.vec_id = neighbor_id
             |        WHERE nb.nrm <> 0),
             |ex AS (SELECT query_id, neighbor_id FROM
             |       (SELECT query_id, neighbor_id,
             |               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
             |        FROM xsc) WHERE rnk <= 5),
             |p AS (SELECT j, i, CASE WHEN CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1) AS INT) % 2 = 1
             |                        THEN 1.0 ELSE -1.0 END AS pv
             |      FROM (SELECT unnest(range(0, 8)) AS j) js, (SELECT unnest(range(0, 64)) AS i) xs),
             |proj AS (SELECT vec_id, j, sum(CAST(v AS DOUBLE) * pv) AS pr
             |         FROM e JOIN p ON p.i = e.i - 1 GROUP BY vec_id, j),
             |b AS (SELECT vec_id, CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS bucket
             |      FROM proj GROUP BY vec_id),
             |ld AS (SELECT a.vec_id AS query_id, b2.vec_id AS neighbor_id,
             |              sum(CAST(a.v AS DOUBLE) * CAST(b2.v AS DOUBLE)) AS dp
             |       FROM e a JOIN b ba ON ba.vec_id = a.vec_id AND a.vec_id < 10
             |       JOIN b bb ON bb.bucket = ba.bucket
             |       JOIN e b2 ON b2.vec_id = bb.vec_id AND b2.i = a.i AND b2.vec_id <> a.vec_id
             |       GROUP BY 1, 2),
             |lsc AS (SELECT query_id, neighbor_id, dp / (na.nrm * nb.nrm) AS score
             |        FROM ld JOIN n na ON na.vec_id = query_id JOIN n nb ON nb.vec_id = neighbor_id
             |        WHERE nb.nrm <> 0),
             |ap AS (SELECT query_id, neighbor_id FROM
             |       (SELECT query_id, neighbor_id,
             |               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
             |        FROM lsc) WHERE rnk <= 5),
             |ov AS (SELECT x.query_id, count(*) AS n_overlap FROM ex x
             |       JOIN ap ON ap.query_id = x.query_id AND ap.neighbor_id = x.neighbor_id
             |       GROUP BY 1),
             |exn AS (SELECT query_id, count(*) AS n_exact FROM ex GROUP BY 1)
             |SELECT qq.vec_id AS query_id,
             |       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
             |       CAST(CASE WHEN coalesce(exn.n_exact, 0) = 0 THEN 10000
             |            ELSE (20000 * coalesce(ov.n_overlap, 0) + exn.n_exact)
             |                 // (2 * exn.n_exact) END AS BIGINT) AS recall_bp
             |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) qq
             |LEFT JOIN exn ON exn.query_id = qq.vec_id
             |LEFT JOIN ov ON ov.query_id = qq.vec_id ORDER BY query_id""".stripMargin)),

    // ---- Template-family detection: structural (word-length-sequence)
    // fingerprints over the template corpus — catches slot-filled
    // machine text that exact and near dedup both miss.
    "q133_template_detection" -> QueryDef(
      (s, dir) => {
        TextAnalysis.templateFingerprints(docsTpl(s, dir), "doc_id", "t", minDocs = 2L)
          .orderBy("struct_fp")
      },
      Some(s"""WITH d AS (SELECT doc_id, $tplSql AS t FROM documents),
              |f AS (SELECT doc_id, t,
              |             md5(array_to_string(list_transform(string_split(t, ' '),
              |                 w -> CAST(length(w) AS VARCHAR)), ',')) AS struct_fp
              |      FROM d)
              |SELECT struct_fp, CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(count(DISTINCT t) AS BIGINT) AS n_texts,
              |       CAST(min(doc_id) AS BIGINT) AS first_doc
              |FROM f GROUP BY struct_fp HAVING count(*) >= 2 ORDER BY struct_fp""".stripMargin)),

    // ---- Leakage-free split: assignment hashed on the duplicate
    // CLUSTER, so copies of one text always share a split.
    "q134_cluster_split" -> QueryDef(
      (s, dir) => {
        Curation.clusterSplit(table(s, dir, "documents"), "doc_id", "text",
            seed = "cs", trainPct = 80, valPct = 10)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH c AS (SELECT text, min(doc_id) AS cluster_id FROM documents GROUP BY text),
             |j AS (SELECT d.doc_id, c.cluster_id FROM documents d JOIN c ON c.text = d.text)
             |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
             |       CASE WHEN CAST('0x' || substr(md5('cs:' || CAST(cluster_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 < 80 THEN 'train'
             |            WHEN CAST('0x' || substr(md5('cs:' || CAST(cluster_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 < 90 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM j ORDER BY doc_id""".stripMargin)),

    // ---- DSIR importance weights (hashed-bigram target-vs-raw
    // log-ratio, integer micro-nats): target domain = source 'src0'.
    "q135_dsir_weights" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        TextAnalysis.dsirWeights(docs, docs.filter(col("source") === "src0"),
            "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
             |t AS (SELECT doc_id, source, unnest(range(1, len(ws))) AS i, ws FROM w WHERE len(ws) >= 2),
             |bg AS (SELECT doc_id, source,
             |              CAST('0x' || substr(md5(ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)]), 1, 12) AS BIGINT) % 256 AS bucket
             |       FROM t),
             |ct AS (SELECT bucket, count(*) AS c_t FROM bg WHERE source = 'src0' GROUP BY bucket),
             |cr AS (SELECT bucket, count(*) AS c_r FROM bg GROUP BY bucket),
             |tot AS (SELECT (SELECT CAST(sum(c_t) AS BIGINT) FROM ct) AS n_t,
             |               (SELECT CAST(sum(c_r) AS BIGINT) FROM cr) AS n_r),
             |wt AS (SELECT cr.bucket, coalesce(ct.c_t, 0) AS c_t, cr.c_r FROM cr LEFT JOIN ct USING (bucket)),
             |wm AS (SELECT bucket, CAST(round(ln(CAST((c_t + 1) * (n_r + 256) AS DOUBLE) /
             |                                    CAST((c_r + 1) * (n_t + 256) AS DOUBLE)) * 1000000.0) AS BIGINT) AS wv
             |       FROM wt CROSS JOIN tot)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, CAST(sum(wm.wv) AS BIGINT) AS dsir_micro
             |FROM bg JOIN wm USING (bucket) GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Exact upper-triangle embedding covariance (whitening/PCA
    // prep): scaled-BIGINT second moments, integer micro-unit output.
    "q136_embed_covariance" -> QueryDef(
      (s, dir) => {
        Similarity.embedCovariance(table(s, dir, "embeddings"), "embedding")
          .orderBy("di", "dj")
      },
      Some("""WITH e AS (SELECT list_transform(embedding,
             |              x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS sv
             |        FROM embeddings),
             |t AS (SELECT sv, unnest(range(1, len(sv) + 1)) AS i FROM e),
             |p AS (SELECT sv, i, unnest(range(i, len(sv) + 1)) AS j FROM t),
             |c AS (SELECT CAST(i - 1 AS BIGINT) AS di, CAST(j - 1 AS BIGINT) AS dj,
             |             sv[CAST(i AS INT)] AS xi, sv[CAST(j AS INT)] AS xj
             |      FROM p),
             |a AS (SELECT di, dj, CAST(count(*) AS BIGINT) AS n,
             |             sum(xi) AS si, sum(xj) AS sj, sum(xi * xj) AS sij
             |      FROM c GROUP BY di, dj)
             |SELECT di, dj, n,
             |       CAST((CASE WHEN n * sij - si * sj < 0 THEN -1 ELSE 1 END) *
             |            ((2 * abs(n * sij - si * sj) + 100 * n * n)
             |              // (2 * 100 * n * n)) AS BIGINT) AS cov_u
             |FROM a ORDER BY di, dj""".stripMargin)),

    // ---- Word-distribution entropy per document (lexical diversity),
    // integer micro-nats via once-rounded ln terms.
    "q137_word_entropy" -> QueryDef(
      (s, dir) => {
        TextAnalysis.wordEntropy(table(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
             |c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
             |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
             |             CAST(count(*) AS BIGINT) AS n_distinct,
             |             CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS s
             |      FROM c GROUP BY doc_id)
             |SELECT doc_id, n_words, n_distinct,
             |       CAST(CAST(round(ln(CAST(n_words AS DOUBLE)) * 1000000.0) AS BIGINT)
             |            - (2 * s + n_words) // (2 * n_words) AS BIGINT) AS entropy_micro
             |FROM a ORDER BY doc_id""".stripMargin)),

    // ---- Vocabulary coverage curve (tokenizer sizing): occurrences
    // covered by the top-V types at checkpoint sizes.
    "q138_vocab_coverage" -> QueryDef(
      (s, dir) => {
        TextAnalysis.vocabCoverage(table(s, dir, "documents"), "text",
            Seq(10L, 30L, 100L, 300L, 1000L, 3000L))
          .orderBy("vocab_size")
      },
      Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
             |c AS (SELECT w, count(*) AS c FROM w WHERE w <> '' GROUP BY w),
             |r AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS r,
             |             sum(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) AS cum
             |      FROM c),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM c)
             |SELECT CAST(r AS BIGINT) AS vocab_size, CAST(cum AS BIGINT) AS cum_tokens,
             |       CAST((20000 * cum + tot) // (2 * tot) AS BIGINT) AS coverage_bp
             |FROM r CROSS JOIN tot
             |WHERE r IN (10, 30, 100, 300, 1000, 3000)
             |ORDER BY vocab_size""".stripMargin)),

    // ---- Prefix-filtered exact Jaccard similarity join: the oracle is
    // the UNFILTERED all-pairs answer, so the hash match proves the
    // prefix filter lossless.
    "q139_jaccard_join" -> QueryDef(
      (s, dir) => {
        Dedup.jaccardJoin(table(s, dir, "documents"), "doc_id", "text", 8000L)
          .withColumnRenamed("id_a", "doc_a").withColumnRenamed("id_b", "doc_b")
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
             |        FROM documents),
             |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM t GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |                 CAST(count(*) AS BIGINT) AS n_inter
             |          FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
             |          GROUP BY a.doc_id, b.doc_id),
             |j AS (SELECT doc_a, doc_b, n_inter,
             |             sa.sz + sb.sz - n_inter AS n_union
             |      FROM inter
             |      JOIN sz sa ON sa.doc_id = doc_a
             |      JOIN sz sb ON sb.doc_id = doc_b)
             |SELECT doc_a, doc_b, n_inter, CAST(n_union AS BIGINT) AS n_union,
             |       CAST((20000 * n_inter + n_union) // (2 * n_union) AS BIGINT) AS jaccard_bp
             |FROM j WHERE 10000 * n_inter >= 8000 * n_union
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- Whitening application: exact-integer z-score reduction
    // (n·x_sc − s1)/√(n·s2 − s1²) — the scale cancels; only the final
    // divide/sqrt/round run as doubles (q68 precedent).
    "q140_whiten" -> QueryDef(
      (s, dir) => {
        Similarity.whiten(table(s, dir, "embeddings"), "vec_id", "embedding")
          .withColumnRenamed("id", "vec_id")
          .orderBy("vec_id", "dim")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding,
             |              x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS sv
             |        FROM embeddings),
             |x AS (SELECT vec_id, unnest(range(1, len(sv) + 1)) AS i, sv FROM e),
             |v AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, sv[CAST(i AS INT)] AS xsc FROM x),
             |st AS (SELECT dim, CAST(count(*) AS BIGINT) AS n, sum(xsc) AS s1,
             |              sum(xsc * xsc) AS s2
             |       FROM v GROUP BY dim)
             |SELECT vec_id, dim,
             |       CASE WHEN n * s2 - s1 * s1 <= 0 THEN 0.0
             |            ELSE round(CAST(n * xsc - s1 AS DOUBLE) /
             |                       sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)), 4)
             |       END AS w_r4
             |FROM v JOIN st USING (dim) ORDER BY vec_id, dim""".stripMargin)),

    // ---- Cross-split contamination via winnowing fingerprints: eval
    // docs sharing >= 2 distinct fingerprints with the train side.
    "q141_fp_contamination" -> QueryDef(
      (s, dir) => {
        TextAnalysis.fingerprintContamination(table(s, dir, "documents"),
            "doc_id", "text", seed = "fc", trainPct = 80)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH sp AS (SELECT doc_id, text,
             |              CASE WHEN CAST('0x' || substr(md5('fc:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 < 80
             |                   THEN 'train' ELSE 'test' END AS split
             |        FROM documents),
             |w AS (SELECT doc_id, split, string_split(text, ' ') AS ws FROM sp
             |      WHERE len(string_split(text, ' ')) >= 4),
             |t AS (SELECT doc_id, split, unnest(range(1, len(ws) - 2)) AS i, ws FROM w),
             |h AS (SELECT doc_id, split, i, md5(ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)]
             |             || ' ' || ws[CAST(i+2 AS INT)] || ' ' || ws[CAST(i+3 AS INT)]) AS hv
             |      FROM t),
             |g AS (SELECT doc_id, split, count(*) AS n_grams FROM h GROUP BY doc_id, split),
             |win AS (SELECT doc_id, split, unnest(range(1, greatest(n_grams - 4 + 1, 1) + 1)) AS j,
             |               n_grams FROM g),
             |m AS (SELECT win.doc_id, win.split, win.j, min(h.hv) AS mh
             |      FROM win JOIN h ON h.doc_id = win.doc_id
             |                     AND h.i >= win.j AND h.i <= least(win.j + 3, win.n_grams)
             |      GROUP BY win.doc_id, win.split, win.j),
             |fp AS (SELECT DISTINCT doc_id, split, mh FROM m),
             |je AS (SELECT e.doc_id, e.mh, t.doc_id AS tid
             |       FROM fp e JOIN fp t ON e.mh = t.mh
             |       WHERE e.split <> 'train' AND t.split = 'train')
             |SELECT doc_id, CAST(count(DISTINCT mh) AS BIGINT) AS n_shared_fps,
             |       CAST(count(DISTINCT tid) AS BIGINT) AS n_train_docs
             |FROM je GROUP BY doc_id HAVING count(DISTINCT mh) >= 2
             |ORDER BY doc_id""".stripMargin)),

    // ---- Collocation mining by PMI (word2phrase): top pairs by
    // ln(c12*T^2/(B*c1*c2)) in integer micro-nats, exact counts.
    "q142_collocations" -> QueryDef(
      (s, dir) => {
        TextAnalysis.collocations(table(s, dir, "documents"), "text",
            minCount = 5L, k = 20)
          .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      },
      Some("""WITH ws AS (SELECT string_split(text, ' ') AS ws FROM documents),
             |t AS (SELECT unnest(ws) AS w FROM ws),
             |uni AS (SELECT w, count(*) AS c FROM t WHERE w <> '' GROUP BY w),
             |bp AS (SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i + 1 AS INT)] AS w2
             |       FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM ws WHERE len(ws) >= 2)),
             |bi AS (SELECT w1, w2, count(*) AS n_pair FROM bp
             |       WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2 HAVING count(*) >= 5),
             |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS t,
             |               (SELECT CAST(sum(len(ws) - 1) AS BIGINT) FROM ws WHERE len(ws) >= 2) AS b)
             |SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
             |       CAST(round(ln(CAST(n_pair AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
             |                   / (CAST(b AS DOUBLE) * CAST(c1.c AS DOUBLE) * CAST(c2.c AS DOUBLE)))
             |            * 1000000.0) AS BIGINT) AS pmi_micro
             |FROM bi
             |JOIN uni c1 ON c1.w = bi.w1
             |JOIN uni c2 ON c2.w = bi.w2
             |CROSS JOIN tot
             |ORDER BY pmi_micro DESC, w1, w2 LIMIT 20""".stripMargin)),

    // ---- Apply-side of q101: cut every cross-document duplicated span
    // out of each document (Lee et al. span REMOVAL, not doc dropping).
    "q143_span_removal" -> QueryDef(
      (s, dir) => {
        Dedup.removeDuplicateSpans(table(s, dir, "documents"), "doc_id", "text",
            n = 4, minDocs = 2)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |t AS (SELECT doc_id, unnest(range(1, len(ws) - 2)) AS i, ws FROM w WHERE len(ws) >= 4),
             |g AS (SELECT doc_id, i - 1 AS pos,
             |             ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' ||
             |             ws[CAST(i+2 AS INT)] || ' ' || ws[CAST(i+3 AS INT)] AS gram FROM t),
             |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
             |m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
             |x AS (SELECT doc_id, pos, pos + 4 AS e,
             |             max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe FROM m),
             |isl AS (SELECT doc_id, pos, e,
             |               sum(CASE WHEN maxe IS NULL OR pos > maxe THEN 1 ELSE 0 END)
             |                 OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM x),
             |sp AS (SELECT doc_id, min(pos) AS s, max(e) AS e2 FROM isl GROUP BY doc_id, island),
             |wp AS (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i FROM w),
             |kp AS (SELECT wp.doc_id, wp.i, wp.ws[CAST(wp.i + 1 AS INT)] AS kw FROM wp
             |       WHERE NOT EXISTS (SELECT 1 FROM sp
             |              WHERE sp.doc_id = wp.doc_id AND wp.i >= sp.s AND wp.i < sp.e2)),
             |agg AS (SELECT doc_id, coalesce(string_agg(kw, ' ' ORDER BY i), '') AS clean_text,
             |               count(*) AS nk
             |        FROM kp GROUP BY doc_id)
             |SELECT w.doc_id, coalesce(agg.clean_text, '') AS clean_text,
             |       CAST(len(w.ws) - coalesce(agg.nk, 0) AS BIGINT) AS n_removed
             |FROM w LEFT JOIN agg USING (doc_id) ORDER BY w.doc_id""".stripMargin)),

    // ---- Distinctive vocabulary per source: Dirichlet log-odds vs the
    // rest of the corpus (Fightin' Words), top-5 per source.
    "q144_distinctive_terms" -> QueryDef(
      (s, dir) => {
        TextAnalysis.distinctiveTerms(table(s, dir, "documents"), "source", "text", k = 5)
          .orderBy("source", "delta_micro", "token")
      },
      Some("""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
             |sc AS (SELECT source, w, count(*) AS c_s FROM t WHERE w <> '' GROUP BY source, w),
             |tw AS (SELECT w, CAST(sum(c_s) AS BIGINT) AS cw FROM sc GROUP BY w),
             |st AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s FROM sc GROUP BY source),
             |vt AS (SELECT CAST(count(*) AS BIGINT) AS v, CAST(sum(cw) AS BIGINT) AS n FROM tw),
             |d AS (SELECT sc.source, sc.w, CAST(sc.c_s AS BIGINT) AS c_s,
             |             CAST(round(ln(
             |               (CAST(sc.c_s + 1 AS DOUBLE) * CAST((vt.n - st.n_s) - (tw.cw - sc.c_s) + vt.v - 1 AS DOUBLE))
             |               / (CAST(st.n_s - sc.c_s + vt.v - 1 AS DOUBLE) * CAST((tw.cw - sc.c_s) + 1 AS DOUBLE)))
             |               * 1000000.0) AS BIGINT) AS delta_micro
             |      FROM sc JOIN tw USING (w) JOIN st USING (source) CROSS JOIN vt),
             |r AS (SELECT source, w, c_s, delta_micro,
             |             row_number() OVER (PARTITION BY source
             |               ORDER BY delta_micro DESC, w) AS rn
             |      FROM d)
             |SELECT source, w AS token, c_s AS n_in_source, delta_micro
             |FROM r WHERE rn <= 5 ORDER BY source, delta_micro, token""".stripMargin)),

    // ---- Document stitching: tail-k == head-k boundary matches — the
    // crawl-shard-split recovery candidates.
    "q145_doc_stitching" -> QueryDef(
      (s, dir) => {
        Dedup.stitchCandidates(table(s, dir, "documents"), "doc_id", "text", k = 3)
          .orderBy("prev_doc", "next_doc")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |f AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 3),
             |tl AS (SELECT doc_id AS prev_doc,
             |              array_to_string(ws[-3:], ' ') AS boundary_gram FROM f),
             |hd AS (SELECT doc_id AS next_doc,
             |              array_to_string(ws[1:3], ' ') AS boundary_gram FROM f)
             |SELECT prev_doc, next_doc, boundary_gram
             |FROM tl JOIN hd USING (boundary_gram)
             |WHERE prev_doc <> next_doc
             |ORDER BY prev_doc, next_doc""".stripMargin)),

    // ---- Banding calibration: MinHash agreement (estimate) vs exact
    // shingle Jaccard, averaged per agreement level.
    "q146_minhash_calibration" -> QueryDef(
      (s, dir) => {
        Dedup.minhashCalibration(docsTpl(s, dir), "t",
            shingleN = 3, numHashes = 8, rowsPerBand = 2)
          .orderBy("n_matching")
      },
      Some(s"""WITH m AS (SELECT md5($tplSql) AS id, min($tplSql) AS t FROM documents GROUP BY 1),
              |w AS (SELECT id, string_split(t, ' ') AS ws FROM m),
              |tri AS (SELECT id, unnest(range(1, len(ws)-1)) AS i, ws FROM w),
              |sh0 AS (SELECT id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' || ws[CAST(i+2 AS INT)] AS shingle FROM tri),
              |sh AS (SELECT DISTINCT id, shingle FROM sh0),
              |sig AS (SELECT id, k, min(md5(CAST(k AS VARCHAR) || ':' || shingle)) AS mh
              |        FROM sh, (SELECT unnest(range(0, 8)) AS k) ks GROUP BY id, k),
              |bands AS (SELECT id, k // 2 AS band, md5(string_agg(mh, ',' ORDER BY k)) AS bk
              |          FROM sig GROUP BY id, k // 2),
              |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
              |          FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id),
              |agree AS (SELECT p.id_a, p.id_b,
              |                 CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_matching
              |          FROM pairs p JOIN sig sa ON sa.id = p.id_a
              |          JOIN sig sb ON sb.id = p.id_b AND sb.k = sa.k
              |          GROUP BY 1, 2),
              |sz AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY id),
              |inter AS (SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS ni
              |          FROM pairs p JOIN sh a ON a.id = p.id_a
              |          JOIN sh b ON b.id = p.id_b AND b.shingle = a.shingle
              |          GROUP BY 1, 2),
              |ex AS (SELECT g.n_matching,
              |              (20000 * coalesce(i.ni, 0) + (sa.n + sb.n - coalesce(i.ni, 0)))
              |                // (2 * (sa.n + sb.n - coalesce(i.ni, 0))) AS ebp
              |       FROM agree g
              |       LEFT JOIN inter i ON i.id_a = g.id_a AND i.id_b = g.id_b
              |       JOIN sz sa ON sa.id = g.id_a
              |       JOIN sz sb ON sb.id = g.id_b)
              |SELECT n_matching, CAST(count(*) AS BIGINT) AS n_pairs,
              |       CAST((2 * sum(ebp) + count(*)) // (2 * count(*)) AS BIGINT) AS mean_exact_bp
              |FROM ex GROUP BY n_matching ORDER BY n_matching""".stripMargin)),

    // ---- RAG chunk dedup: duplicated chunk windows across documents
    // with counts and the canonical first occurrence.
    "q147_chunk_dedup" -> QueryDef(
      (s, dir) => {
        Curation.chunkDedup(table(s, dir, "documents"), "doc_id", "text",
            width = 12, stride = 8)
          .orderBy("chunk_hash")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS ln,
             |             greatest(1, (CAST(len(ws) AS BIGINT) - 12 + 8 - 1) // 8 + 1) AS nc
             |      FROM w),
             |c AS (SELECT doc_id, unnest(range(0, nc)) AS i, ws, ln FROM n),
             |ch AS (SELECT doc_id, i AS chunk_idx,
             |              array_to_string(ws[CAST(i * 8 + 1 AS INT):CAST(i * 8 + 12 AS INT)], ' ') AS chunk_text
             |       FROM c),
             |a AS (SELECT md5(chunk_text) AS chunk_hash, CAST(count(*) AS BIGINT) AS n_chunks,
             |             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |             min({'d': doc_id, 'i': chunk_idx}) AS f
             |      FROM ch GROUP BY md5(chunk_text))
             |SELECT chunk_hash, n_chunks, n_docs,
             |       CAST(f.d AS BIGINT) AS first_doc, CAST(f.i AS BIGINT) AS first_idx
             |FROM a WHERE n_chunks >= 2 ORDER BY chunk_hash""".stripMargin)),

    // ---- Corpus report card: per-source Gopher rule flag counts and
    // keep rate (same rule semantics as q111).
    "q148_gopher_report" -> QueryDef(
      (s, dir) => {
        Curation.gopherReport(table(s, dir, "documents"), "doc_id", "source", "text",
            minWords = 10L)
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT doc_id, source, text, string_split(text, ' ') AS ws FROM documents),
             |b AS (SELECT doc_id, source, ws, CAST(len(ws) AS BIGINT) AS n_words,
             |             CAST(strlen(text) - (len(ws) - 1) AS BIGINT) AS chars,
             |             CAST(strlen(text) - strlen(replace(text, '#', ''))
             |                  + (strlen(text) - strlen(replace(text, '...', ''))) // 3
             |               AS BIGINT) AS sym,
             |             CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alpha,
             |             CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
             |                                  s -> list_contains(ws, s))) AS BIGINT) AS n_stop
             |      FROM w),
             |m AS (SELECT doc_id, source, n_words,
             |             (200 * chars + n_words) // (2 * n_words) AS mean_wlen_c,
             |             (20000 * sym + n_words) // (2 * n_words) AS symbol_bp,
             |             (20000 * alpha + n_words) // (2 * n_words) AS alpha_bp,
             |             n_stop
             |      FROM b),
             |f AS (SELECT source,
             |             CAST(n_words < 10 OR n_words > 100000 AS BIGINT) AS f_word_count,
             |             CAST(mean_wlen_c < 300 OR mean_wlen_c > 1000 AS BIGINT) AS f_word_len,
             |             CAST(symbol_bp > 1000 AS BIGINT) AS f_symbol,
             |             CAST(alpha_bp < 8000 AS BIGINT) AS f_alpha,
             |             CAST(n_stop < 2 AS BIGINT) AS f_stop,
             |             CAST((n_words < 10 OR n_words > 100000) = false
             |                  AND (mean_wlen_c < 300 OR mean_wlen_c > 1000) = false
             |                  AND symbol_bp <= 1000 AND alpha_bp >= 8000 AND n_stop >= 2
             |               AS BIGINT) AS keep
             |      FROM m)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(f_word_count) AS BIGINT) AS n_word_count,
             |       CAST(sum(f_word_len) AS BIGINT) AS n_word_len,
             |       CAST(sum(f_symbol) AS BIGINT) AS n_symbol,
             |       CAST(sum(f_alpha) AS BIGINT) AS n_alpha,
             |       CAST(sum(f_stop) AS BIGINT) AS n_stop,
             |       CAST(sum(keep) AS BIGINT) AS n_keep,
             |       CAST((20000 * sum(keep) + count(*)) // (2 * count(*)) AS BIGINT) AS keep_bp
             |FROM f GROUP BY source ORDER BY source""".stripMargin)),

    // ---- IDF-weighted exact Jaccard join: rare-token-weighted overlap
    // with the weighted prefix + length filters; the oracle is the
    // UNFILTERED all-pairs answer, so the hash match proves both
    // filters lossless. Integer weights w = N div df keep both engines
    // bit-identical.
    "q151_weighted_jaccard" -> QueryDef(
      (s, dir) => {
        Dedup.weightedJaccardJoin(table(s, dir, "documents"), "doc_id", "text", 8000L)
          .withColumnRenamed("id_a", "doc_a").withColumnRenamed("id_b", "doc_b")
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
             |        FROM documents),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
             |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY tok),
             |w AS (SELECT tok, nd // df AS w FROM dfq CROSS JOIN n),
             |tw AS (SELECT doc_id, t.tok, w FROM t JOIN w USING (tok)),
             |tot AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS wt FROM tw GROUP BY doc_id),
             |i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |             CAST(sum(a.w) AS BIGINT) AS iw
             |      FROM tw a JOIN tw b ON a.tok = b.tok AND a.doc_id < b.doc_id
             |      GROUP BY a.doc_id, b.doc_id),
             |j AS (SELECT doc_a, doc_b, iw, ta.wt + tb.wt - iw AS uw
             |      FROM i JOIN tot ta ON ta.doc_id = i.doc_a
             |             JOIN tot tb ON tb.doc_id = i.doc_b)
             |SELECT doc_a, doc_b, iw AS w_inter, uw AS w_union,
             |       (20000 * iw + uw) // (2 * uw) AS wjaccard_bp
             |FROM j WHERE 10000 * iw >= 8000 * uw
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- Pairwise source vocabulary overlap: exact token-set Jaccard
    // between sources, vocab-bounded (the set view complementing q128's
    // distributional divergence). Zero-overlap pairs kept.
    "q153_source_vocab_jaccard" -> QueryDef(
      (s, dir) => {
        TextAnalysis.sourceTokenJaccard(table(s, dir, "documents"), "source", "text")
          .orderBy("src_a", "src_b")
      },
      Some("""WITH tk AS (SELECT source AS s, unnest(string_split(text, ' ')) AS w
             |         FROM documents),
             |st AS (SELECT DISTINCT s, w FROM tk WHERE w <> ''),
             |sz AS (SELECT d.s, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
             |       FROM (SELECT DISTINCT source AS s FROM documents) d
             |       LEFT JOIN (SELECT s, count(*) AS n FROM st GROUP BY s) c
             |         ON d.s = c.s),
             |pr AS (SELECT a.s AS src_a, b.s AS src_b, a.n AS n_a, b.n AS n_b
             |       FROM sz a JOIN sz b ON a.s < b.s),
             |it AS (SELECT a.s AS src_a, b.s AS src_b, CAST(count(*) AS BIGINT) AS i
             |       FROM st a JOIN st b ON a.w = b.w AND a.s < b.s GROUP BY 1, 2)
             |SELECT src_a, src_b, COALESCE(i, 0) AS n_inter,
             |       n_a + n_b - COALESCE(i, 0) AS n_union,
             |       CASE WHEN n_a + n_b - COALESCE(i, 0) = 0 THEN 10000
             |            ELSE (20000 * COALESCE(i, 0) + (n_a + n_b - COALESCE(i, 0)))
             |              // (2 * (n_a + n_b - COALESCE(i, 0))) END AS jaccard_bp
             |FROM pr LEFT JOIN it USING (src_a, src_b)
             |ORDER BY src_a, src_b""".stripMargin)),

    // ---- Exact-count proportional stratified sample via largest-
    // remainder apportionment: exactly 100 docs allocated across
    // sources proportionally, each stratum's quota taken in
    // deterministic md5(seed:id) order.
    "q154_exact_stratified" -> QueryDef(
      (s, dir) => {
        Curation.largestRemainderSample(table(s, dir, "documents"), "doc_id", "source",
            total = 100L, seed = "lrs7")
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n
             |        FROM documents GROUP BY source),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM n),
             |q AS (SELECT source, n, (100 * n) // nt AS fl, (100 * n) % nt AS rem
             |      FROM n CROSS JOIN t),
             |e AS (SELECT CAST(100 - sum(fl) AS BIGINT) AS extra FROM q),
             |r AS (SELECT source, fl,
             |             row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q),
             |a AS (SELECT source,
             |             fl + CASE WHEN rk <= (SELECT extra FROM e) THEN 1 ELSE 0 END AS k
             |      FROM r),
             |rk AS (SELECT doc_id, source,
             |              row_number() OVER (PARTITION BY source
             |                ORDER BY substr(md5('lrs7:' || CAST(doc_id AS VARCHAR)), 1, 12),
             |                         doc_id) AS rn
             |       FROM documents)
             |SELECT doc_id, source FROM rk JOIN a USING (source)
             |WHERE rn <= k ORDER BY doc_id""".stripMargin)),

    // ---- Per-source OOV report vs the corpus top-20 vocabulary:
    // occurrence-mass OOV rate + distinct OOV type count, the
    // tokenizer-planning view. Vocab ties break by token asc.
    "q155_oov_report" -> QueryDef(
      (s, dir) => {
        TextAnalysis.oovReport(table(s, dir, "documents"), "source", "text",
            vocabSize = 20)
          .orderBy("source")
      },
      Some("""WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS w
             |         FROM documents),
             |st AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
             |       FROM tk WHERE w <> '' GROUP BY source, w),
             |tv AS (SELECT w FROM
             |         (SELECT w, sum(c) AS tc,
             |                 row_number() OVER (ORDER BY sum(c) DESC, w) AS rk
             |          FROM st GROUP BY w) WHERE rk <= 20),
             |j AS (SELECT source, st.w, c, tv.w IS NOT NULL AS iv
             |      FROM st LEFT JOIN tv ON st.w = tv.w)
             |SELECT source,
             |       CAST(sum(c) AS BIGINT) AS n_tokens,
             |       CAST(COALESCE(sum(CASE WHEN NOT iv THEN c END), 0) AS BIGINT)
             |         AS n_oov_tokens,
             |       CAST((20000 * COALESCE(sum(CASE WHEN NOT iv THEN c END), 0)
             |             + sum(c)) // (2 * sum(c)) AS BIGINT) AS oov_bp,
             |       CAST(count(CASE WHEN NOT iv THEN 1 END) AS BIGINT) AS n_oov_types
             |FROM j GROUP BY source ORDER BY source""".stripMargin)),

    // ---- Dedup aggressiveness sweep: cluster stats at three Jaccard
    // thresholds from one candidate generation; the oracle recomputes
    // each level's connected components from the exact all-pairs sets.
    "q156_threshold_sweep" -> QueryDef(
      (s, dir) => {
        Dedup.thresholdSweep(table(s, dir, "documents"), "doc_id", "text",
            Seq(8000L, 9000L, 9600L))
          .orderBy("threshold_bp")
      },
      Some("""WITH RECURSIVE
             |t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
             |      FROM documents),
             |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY doc_id),
             |i AS (SELECT a.doc_id AS pa, b.doc_id AS pb, CAST(count(*) AS BIGINT) AS ni
             |      FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
             |      GROUP BY a.doc_id, b.doc_id),
             |p AS (SELECT pa, pb, ni, sa.n + sb.n - ni AS nu
             |      FROM i JOIN sz sa ON sa.doc_id = pa JOIN sz sb ON sb.doc_id = pb),
             |e1 AS (SELECT pa AS u, pb AS v FROM p WHERE 10000 * ni >= 8000 * nu
             |       UNION SELECT pb, pa FROM p WHERE 10000 * ni >= 8000 * nu),
             |n1 AS (SELECT DISTINCT u AS id FROM e1),
             |r1 AS (SELECT id AS src, id AS dst FROM n1
             |       UNION SELECT r1.src, e1.v FROM r1 JOIN e1 ON e1.u = r1.dst),
             |s1 AS (SELECT src, min(dst) AS comp FROM r1 GROUP BY src),
             |c1 AS (SELECT comp, CAST(count(*) AS BIGINT) AS csz FROM s1 GROUP BY comp),
             |e2 AS (SELECT pa AS u, pb AS v FROM p WHERE 10000 * ni >= 9000 * nu
             |       UNION SELECT pb, pa FROM p WHERE 10000 * ni >= 9000 * nu),
             |n2 AS (SELECT DISTINCT u AS id FROM e2),
             |r2 AS (SELECT id AS src, id AS dst FROM n2
             |       UNION SELECT r2.src, e2.v FROM r2 JOIN e2 ON e2.u = r2.dst),
             |s2 AS (SELECT src, min(dst) AS comp FROM r2 GROUP BY src),
             |c2 AS (SELECT comp, CAST(count(*) AS BIGINT) AS csz FROM s2 GROUP BY comp),
             |e3 AS (SELECT pa AS u, pb AS v FROM p WHERE 10000 * ni >= 9600 * nu
             |       UNION SELECT pb, pa FROM p WHERE 10000 * ni >= 9600 * nu),
             |n3 AS (SELECT DISTINCT u AS id FROM e3),
             |r3 AS (SELECT id AS src, id AS dst FROM n3
             |       UNION SELECT r3.src, e3.v FROM r3 JOIN e3 ON e3.u = r3.dst),
             |s3 AS (SELECT src, min(dst) AS comp FROM r3 GROUP BY src),
             |c3 AS (SELECT comp, CAST(count(*) AS BIGINT) AS csz FROM s3 GROUP BY comp)
             |SELECT * FROM (
             |  SELECT CAST(8000 AS BIGINT) AS threshold_bp,
             |         (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_docs_clustered,
             |         (SELECT CAST(count(*) AS BIGINT) FROM c1) AS n_clusters,
             |         COALESCE((SELECT max(csz) FROM c1), 0) AS max_cluster,
             |         (SELECT CAST(count(*) AS BIGINT) FROM s1)
             |           - (SELECT CAST(count(*) AS BIGINT) FROM c1) AS n_removable
             |  UNION ALL
             |  SELECT CAST(9000 AS BIGINT),
             |         (SELECT CAST(count(*) AS BIGINT) FROM s2),
             |         (SELECT CAST(count(*) AS BIGINT) FROM c2),
             |         COALESCE((SELECT max(csz) FROM c2), 0),
             |         (SELECT CAST(count(*) AS BIGINT) FROM s2)
             |           - (SELECT CAST(count(*) AS BIGINT) FROM c2)
             |  UNION ALL
             |  SELECT CAST(9600 AS BIGINT),
             |         (SELECT CAST(count(*) AS BIGINT) FROM s3),
             |         (SELECT CAST(count(*) AS BIGINT) FROM c3),
             |         COALESCE((SELECT max(csz) FROM c3), 0),
             |         (SELECT CAST(count(*) AS BIGINT) FROM s3)
             |           - (SELECT CAST(count(*) AS BIGINT) FROM c3))
             |ORDER BY threshold_bp""".stripMargin)),

    // ---- Classifier reliability curve: hashed-classifier score bins
    // vs the Gopher rule battery's keep rate — the check before
    // swapping rule filtering for classifier filtering. Explicit floor
    // binning so both engines bin negative scores identically.
    "q157_classifier_calibration" -> QueryDef(
      (s, dir) => {
        Curation.classifierCalibration(table(s, dir, "documents"), "doc_id", "text",
            binWidth = 8L, minWords = 10L)
          .orderBy("score_bin")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |          FROM documents),
             |w AS (SELECT doc_id,
             |             CAST('0x' || substr(md5('w:' ||
             |               CAST(CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) % 64
             |                    AS VARCHAR)), 1, 1) AS BIGINT) - 8 AS wt
             |      FROM toks),
             |sc AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score FROM w GROUP BY doc_id),
             |gw AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
             |gb AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words,
             |              CAST(strlen(text) - (len(ws) - 1) AS BIGINT) AS chars,
             |              CAST(strlen(text) - strlen(replace(text, '#', ''))
             |                   + (strlen(text) - strlen(replace(text, '...', ''))) // 3
             |                AS BIGINT) AS sym,
             |              CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alpha,
             |              CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
             |                                   st -> list_contains(ws, st))) AS BIGINT) AS n_stop
             |       FROM gw),
             |gm AS (SELECT doc_id, n_words,
             |              (200 * chars + n_words) // (2 * n_words) AS mwc,
             |              (20000 * sym + n_words) // (2 * n_words) AS sbp,
             |              (20000 * alpha + n_words) // (2 * n_words) AS abp,
             |              n_stop
             |       FROM gb),
             |g AS (SELECT doc_id,
             |             CAST((n_words < 10 OR n_words > 100000) = false
             |                  AND (mwc < 300 OR mwc > 1000) = false
             |                  AND sbp <= 1000 AND abp >= 8000 AND n_stop >= 2
             |               AS BIGINT) AS keep
             |      FROM gm),
             |j AS (SELECT CASE WHEN score >= 0 THEN score // 8
             |                  ELSE -((7 - score) // 8) END AS score_bin, keep
             |      FROM sc JOIN g USING (doc_id))
             |SELECT score_bin, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(keep) AS BIGINT) AS n_keep,
             |       (20000 * CAST(sum(keep) AS BIGINT) + count(*)) // (2 * count(*)) AS keep_bp
             |FROM j GROUP BY score_bin ORDER BY score_bin""".stripMargin)),

    // ---- Dedup provenance audit: each removed near-dup cluster member
    // (capped per cluster) linked to its kept representative — the
    // takedown/compliance trail over the q139-exact clusters.
    "q158_dup_provenance" -> QueryDef(
      (s, dir) => {
        val pairs = Dedup.jaccardJoin(table(s, dir, "documents"), "doc_id", "text", 8000L)
          .select(col("id_a"), col("id_b"))
        val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
        Dedup.clusterProvenance(cc, "id", "comp", maxPerGroup = 3)
          .orderBy("keep_id", "dup_rank")
      },
      Some("""WITH RECURSIVE
             |t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
             |      FROM documents),
             |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY doc_id),
             |i AS (SELECT a.doc_id AS pa, b.doc_id AS pb, CAST(count(*) AS BIGINT) AS ni
             |      FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
             |      GROUP BY a.doc_id, b.doc_id),
             |p AS (SELECT pa, pb, ni, sa.n + sb.n - ni AS nu
             |      FROM i JOIN sz sa ON sa.doc_id = pa JOIN sz sb ON sb.doc_id = pb),
             |e1 AS (SELECT pa AS u, pb AS v FROM p WHERE 10000 * ni >= 8000 * nu
             |       UNION SELECT pb, pa FROM p WHERE 10000 * ni >= 8000 * nu),
             |n1 AS (SELECT DISTINCT u AS id FROM e1),
             |r1 AS (SELECT id AS src, id AS dst FROM n1
             |       UNION SELECT r1.src, e1.v FROM r1 JOIN e1 ON e1.u = r1.dst),
             |s1 AS (SELECT src, min(dst) AS comp FROM r1 GROUP BY src),
             |rk AS (SELECT src AS dup_id, comp,
             |              row_number() OVER (PARTITION BY comp ORDER BY src) AS rn,
             |              min(src) OVER (PARTITION BY comp) AS keep_id
             |       FROM s1)
             |SELECT keep_id, dup_id, CAST(rn - 1 AS BIGINT) AS dup_rank
             |FROM rk WHERE rn > 1 AND rn <= 4
             |ORDER BY keep_id, dup_rank""".stripMargin)),

    // ---- Greedy maximum-coverage selection: 4 documents picked one at
    // a time, each adding the most not-yet-covered distinct tokens —
    // the diversity-first seed/eval-set picker. The oracle unrolls the
    // same greedy levels as chained CTEs (the q156 sweep precedent).
    "q159_greedy_cover" -> QueryDef(
      (s, dir) => {
        Curation.greedyCover(table(s, dir, "documents"), "doc_id", "text", k = 4)
          .orderBy("pick_rank")
      },
      Some(greedyCoverOracle(4))),

    // ---- TextRank keyword scores: PageRank over the undirected
    // adjacent-token co-occurrence graph, 6 integer-exact iterations —
    // the structural-keyword signal raw frequency misses.
    "q161_textrank" -> QueryDef(
      (s, dir) => {
        TextAnalysis.textRank(table(s, dir, "documents"), "text", iters = 6)
          .orderBy("token")
      },
      Some("""WITH ws AS (SELECT string_split(text, ' ') AS ws FROM documents),
             |x AS (SELECT ws, unnest(range(1, len(ws))) AS i FROM ws WHERE len(ws) >= 2),
             |b AS (SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i + 1 AS INT)] AS w2 FROM x
             |      WHERE ws[CAST(i AS INT)] <> '' AND ws[CAST(i + 1 AS INT)] <> ''),
             |e0 AS (SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM
             |        (SELECT w1 AS u, w2 AS v FROM b
             |         UNION ALL SELECT w2 AS u, w1 AS v FROM b) sym
             |       GROUP BY u, v),
             |outd AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM e0 GROUP BY u),
             |e AS (SELECT e0.u, e0.v, e0.w, outd.outw FROM e0 JOIN outd USING (u)),
             |nodes AS (SELECT u AS n FROM e0 UNION SELECT v FROM e0),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
             |r0 AS (SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes)""".stripMargin
        + OracleGen.pageRankChain(6)
        + "\nSELECT n AS token, r AS rank_micro FROM r6 ORDER BY token")),

    // ---- Perceptual hash (dHash) over REAL decoded gradient images:
    // 9×8 nearest-neighbor sample → integer luma → difference bits as
    // two 32-bit halves. The oracle recomputes the hash from doc_id
    // arithmetic alone — a match proves the whole encode→decode→
    // sample→luma→bit pipeline end-to-end.
    "q163_image_dhash" -> QueryDef(
      (s, dir) => {
        Multimodal.dHashImages(s, gradientMediaTable(s, dir), "doc_id", "payload")
          .toDF()
          .select(col("id").as("doc_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("dhashA").as("dhash_a"), col("dhashB").as("dhash_b"))
          .orderBy("doc_id")
      },
      Some(dhashOracleCte +
        "\nSELECT doc_id, w AS width, h AS height, dhash_a, dhash_b FROM hsh ORDER BY doc_id")),

    // ---- Perceptual near-duplicate pairs: 16-bit-band bucketing over
    // the dHash halves (lossless for hamming ≤ 3 by pigeonhole), two-
    // popcount verification. Oracle is the UNBUCKETED all-pairs answer,
    // proving the band join lossless at the gate.
    "q164_image_neardup" -> QueryDef(
      (s, dir) => {
        val hashes = Multimodal.dHashImages(s, gradientMediaTable(s, dir),
          "doc_id", "payload").toDF()
        Multimodal.dhashNearDupPairs(hashes, "id", maxHamming = 2)
          .withColumnRenamed("id_a", "doc_a").withColumnRenamed("id_b", "doc_b")
          .orderBy("doc_a", "doc_b")
      },
      Some(dhashOracleCte + """
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.dhash_a, b.dhash_a))
        |            + bit_count(xor(a.dhash_b, b.dhash_b)) AS BIGINT) AS hamming
        |FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dhash_a, b.dhash_a))
        |      + bit_count(xor(a.dhash_b, b.dhash_b)) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- Audio energy-delta fingerprint over REAL decoded PCM16 WAVs:
    // 33 assignment-rule frames, per-frame integer energy, 32
    // difference bits — the audio analogue of q163, oracle-predicted
    // from doc_id arithmetic alone.
    "q165_audio_fingerprint" -> QueryDef(
      (s, dir) => {
        Multimodal.audioFingerprints(s, audioFpTable(s, dir), "doc_id", "payload")
          .toDF()
          .select(col("id").as("doc_id"), col("nSamples").as("n_samples"), col("fp"))
          .orderBy("doc_id")
      },
      Some(audioFpOracleCte +
        "\nSELECT p.doc_id, CAST(p.n AS BIGINT) AS n_samples, fp.fp" +
        "\nFROM fp JOIN p ON p.doc_id = fp.doc_id ORDER BY p.doc_id")),

    // ---- Audio near-duplicate pairs: four 8-bit band buckets over the
    // 32-bit fingerprint (pigeonhole-lossless for hamming ≤ 3), one-
    // popcount verification against the unbucketed all-pairs oracle.
    "q166_audio_neardup" -> QueryDef(
      (s, dir) => {
        val hashes = Multimodal.audioFingerprints(s, audioFpTable(s, dir),
          "doc_id", "payload").toDF()
        Multimodal.fp32NearDupPairs(hashes, "id", "fp", maxHamming = 3)
          .withColumnRenamed("id_a", "doc_a").withColumnRenamed("id_b", "doc_b")
          .orderBy("doc_a", "doc_b")
      },
      Some(audioFpOracleCte + """
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- Language-ID eval: the q36 heuristic scored against the
    // ground-truth lang column as a confusion matrix; share_bp is each
    // cell's HALF_UP share of its truth row (diagonal = recall).
    "q168_langid_eval" -> QueryDef(
      (s, dir) => {
        TextAnalysis.langIdConfusion(table(s, dir, "documents"), "text", "lang")
          .orderBy("lang_true", "lang_pred")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |hits AS (SELECT doc_id, l.lang, count(*) AS c FROM toks
             |         JOIN (VALUES ('en','the'),('en','and'),('en','of'),('en','to'),('en','in'),
             |                      ('es','el'),('es','la'),('es','de'),('es','que'),('es','y'),
             |                      ('de','der'),('de','die'),('de','und'),('de','das'),('de','ist'),
             |                      ('fr','le'),('fr','les'),('fr','des'),('fr','et'),('fr','une')) l(lang, sw)
             |         ON tok = sw GROUP BY doc_id, l.lang),
             |best AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang) AS rn FROM hits),
             |pred AS (SELECT d.doc_id, d.lang AS lang_true, COALESCE(b.lang, 'und') AS lang_pred
             |         FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1),
             |cells AS (SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
             |          FROM pred GROUP BY lang_true, lang_pred),
             |tot AS (SELECT lang_true, sum(n_docs) AS t FROM cells GROUP BY lang_true)
             |SELECT c.lang_true, c.lang_pred, c.n_docs,
             |       CAST((20000 * c.n_docs + t.t) // (2 * t.t) AS BIGINT) AS share_bp
             |FROM cells c JOIN tot t USING (lang_true)
             |ORDER BY lang_true, lang_pred""".stripMargin)),

    // ---- Full BPE training loop: 8 iterations of count-pairs → argmax
    // → greedy corpus-wide merge, emitting the learned merge table (the
    // tokenizer-prep artifact; q120 is one unrolled step). The oracle
    // unrolls the loop as chained CTEs, representing each word as a
    // chr(31)-delimited symbol string so the merge is one non-
    // overlapping left-to-right replace — exactly the greedy semantics.
    "q171_bpe_train" -> QueryDef(
      (s, dir) => {
        TextAnalysis.bpeTrain(table(s, dir, "documents"), "text", merges = 8)
          .orderBy("step")
      },
      Some(bpeTrainOracle(8))),

    // ---- Per-video perceptual fingerprint: AVI walk → dHash of every
    // 2nd frame (lossless BMP frames keep the pixels oracle-exact) →
    // field-wise MIN of the two 32-bit halves. The oracle recomputes
    // every sampled frame's hash from (doc_id, frame) arithmetic alone.
    "q172_video_fingerprint" -> QueryDef(
      (s, dir) => {
        Multimodal.videoFingerprints(s, gradientAviTable(s, dir),
            "doc_id", "payload", stride = 2)
          .toDF()
          .select(col("id").as("doc_id"), col("nFrames").as("n_frames"),
            col("nSampled").as("n_sampled"),
            col("fpA").as("fp_a"), col("fpB").as("fp_b"))
          .orderBy("doc_id")
      },
      Some(videoFpOracleCte +
        "\nSELECT doc_id, n_frames, n_sampled, fp_a, fp_b FROM fp ORDER BY doc_id")),

    // ---- Video near-duplicate pairs: the q164 banded-hamming bucket
    // join over the per-video min-fold fingerprints (lossless for
    // hamming ≤ 3 by pigeonhole), against the unbucketed all-pairs
    // oracle — closing the image/audio/video near-dup triangle.
    "q173_video_neardup" -> QueryDef(
      (s, dir) => {
        val fps = Multimodal.videoFingerprints(s, gradientAviTable(s, dir),
          "doc_id", "payload", stride = 2).toDF()
        Multimodal.videoNearDupPairs(fps, "id", maxHamming = 2)
          .withColumnRenamed("id_a", "doc_a").withColumnRenamed("id_b", "doc_b")
          .orderBy("doc_a", "doc_b")
      },
      Some(videoFpOracleCte + """
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.fp_a, b.fp_a))
        |            + bit_count(xor(a.fp_b, b.fp_b)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp_a, b.fp_a))
        |      + bit_count(xor(a.fp_b, b.fp_b)) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- Incremental IVF maintenance: a systematically-drifted new
    // batch assigned to the EXISTING q131-style codebook (no retrain);
    // per-list growth + residual drift in bp tells the operator when
    // the centroids stopped describing the data. Assignment and
    // residuals are the silhouette kernel's integer-exact distances.
    "q174_ivf_incremental" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val batch = emb.filter(col("vec_id") % 3 === 0)
          .select((col("vec_id") + 2000000L).as("vec_id"),
            expr("transform(embedding, (x, i) -> " +
              "CAST(x * 1.02D + 0.001D * CAST(i % 5 AS DOUBLE) AS FLOAT))")
              .as("embedding"))
        Similarity.ivfIncrementalStats(emb, batch, "vec_id", "embedding",
            emb.filter(col("vec_id") < 16))
          .orderBy("cluster_id")
      },
      Some("""WITH b0 AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             |                  unnest(embedding) AS v FROM embeddings),
             |nb AS (SELECT vec_id + 2000000 AS vec_id, i,
             |              CAST(CAST(v AS DOUBLE) * CAST(1.02 AS DOUBLE)
             |                   + CAST(0.001 AS DOUBLE) * CAST((i - 1) % 5 AS DOUBLE) AS FLOAT) AS v
             |       FROM b0 WHERE vec_id % 3 = 0),
             |qb AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
             |              CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT) AS qv FROM b0),
             |qn AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
             |              CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT) AS qv FROM nb),
             |cb AS (SELECT vec_id AS cid, dim, qv FROM qb WHERE vec_id < 16),
             |rb AS (SELECT vec_id, cid, d2,
             |              row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             |       FROM (SELECT q.vec_id, cb.cid, sum((q.qv - cb.qv) * (q.qv - cb.qv)) AS d2
             |             FROM qb q JOIN cb ON cb.dim = q.dim GROUP BY 1, 2)),
             |sb AS (SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_base,
             |              sum(d2) AS ssb FROM rb WHERE rn = 1 GROUP BY 1),
             |rn2 AS (SELECT vec_id, cid, d2,
             |              row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             |       FROM (SELECT q.vec_id, cb.cid, sum((q.qv - cb.qv) * (q.qv - cb.qv)) AS d2
             |             FROM qn q JOIN cb ON cb.dim = q.dim GROUP BY 1, 2)),
             |sn AS (SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_new,
             |              sum(d2) AS ssn FROM rn2 WHERE rn = 1 GROUP BY 1),
             |cl AS (SELECT DISTINCT vec_id AS cluster_id FROM embeddings WHERE vec_id < 16),
             |m AS (SELECT cl.cluster_id, COALESCE(sb.n_base, 0) AS n_base,
             |             COALESCE(sn.n_new, 0) AS n_new, sb.ssb, sn.ssn
             |      FROM cl LEFT JOIN sb USING (cluster_id) LEFT JOIN sn USING (cluster_id)),
             |r2 AS (SELECT cluster_id, CAST(n_base AS BIGINT) AS n_base,
             |              CAST(n_new AS BIGINT) AS n_new,
             |              CASE WHEN n_base > 0
             |                   THEN CAST((20000 * n_new + n_base) // (2 * n_base) AS BIGINT) END AS growth_bp,
             |              CASE WHEN n_base > 0
             |                   THEN CAST((2 * ssb + n_base) // (2 * n_base) AS BIGINT) END AS resid_base,
             |              CASE WHEN n_new > 0
             |                   THEN CAST((2 * ssn + n_new) // (2 * n_new) AS BIGINT) END AS resid_new
             |       FROM m)
             |SELECT cluster_id, n_base, n_new, growth_bp, resid_base, resid_new,
             |       CASE WHEN resid_base > 0 AND resid_new IS NOT NULL
             |            THEN CAST((20000 * resid_new + resid_base) // (2 * resid_base) AS BIGINT) END AS drift_bp
             |FROM r2 ORDER BY cluster_id""".stripMargin)),

    // ---- BPE tokenization with the LEARNED merge table: train 8
    // merges (q171), then tokenize the corpus with them — per-document
    // fertility under the real tokenizer, not the q128 regex proxy.
    // The merge chain applies to the distinct-word vocabulary; counts
    // join back and aggregate per document.
    "q176_bpe_tokenize" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val merges = TextAnalysis.bpeTrain(docs, "text", merges = 8)
        TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", merges)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(bpeApplyOracle(8))),

    // ---- Asymmetric containment join: pairs where the smaller word
    // set sits mostly inside the other — the subset-duplication that
    // Jaccard structurally misses (J ≈ |A|/|B| → 0 for an embedded
    // boilerplate page). Oracle is the unfiltered all-pairs answer,
    // proving the asymmetric prefix/bitmask candidates lossless.
    "q177_containment_join" -> QueryDef(
      (s, dir) => {
        Dedup.containmentJoin(table(s, dir, "documents"), "doc_id", "text", 8000L)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
             |          FROM documents),
             |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY doc_id),
             |i AS (SELECT a.doc_id AS pa, b.doc_id AS pb, CAST(count(*) AS BIGINT) AS ni
             |      FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2)
             |SELECT pa AS id_a, pb AS id_b, ni AS n_inter, sa.n AS n_a, sb.n AS n_b,
             |       CAST((20000 * ni + sa.n) // (2 * sa.n) AS BIGINT) AS cont_a_bp,
             |       CAST((20000 * ni + sb.n) // (2 * sb.n) AS BIGINT) AS cont_b_bp
             |FROM i JOIN sz sa ON sa.doc_id = pa JOIN sz sb ON sb.doc_id = pb
             |WHERE 10000 * ni >= 8000 * least(sa.n, sb.n)
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- Deterministic Poisson bootstrap of the mean document length:
    // 40 resamples whose per-row weights are md5-derived Poisson(1)
    // counts (exact 48-bit integer thresholds), so the replicate
    // spread — the metric's confidence interval — is engine-exact.
    "q178_bootstrap_mean" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_words"))
        Profiling.bootstrapMeans(docs, "doc_id", "n_words",
            replicates = 40, seed = "graft")
          .orderBy("replicate")
      },
      Some("""WITH v AS (SELECT CAST(doc_id AS VARCHAR) AS id,
             |                 CAST(len(string_split(text, ' ')) AS BIGINT) AS v
             |          FROM documents),
             |b AS (SELECT unnest(range(0, 40)) AS r),
             |w0 AS (SELECT r, v,
             |              CAST('0x' || substr(md5('graft:' || CAST(r AS VARCHAR) || ':' || id), 1, 12)
             |                   AS BIGINT) AS u
             |       FROM b CROSS JOIN v),
             |w AS (SELECT r, v,
             |             CASE WHEN u < 103548857136060 THEN 0
             |                  WHEN u < 207097714272121 THEN 1
             |                  WHEN u < 258872142840152 THEN 2
             |                  WHEN u < 276130285696162 THEN 3
             |                  ELSE 4 END AS w
             |      FROM w0),
             |a AS (SELECT r AS replicate, CAST(sum(w) AS BIGINT) AS n_eff,
             |             CAST(sum(w * v) AS BIGINT) AS sum_wv
             |      FROM w GROUP BY r)
             |SELECT replicate, n_eff, sum_wv,
             |       CASE WHEN n_eff > 0 THEN
             |         CAST(sign(sum_wv) * ((200 * abs(sum_wv) + n_eff) // (2 * n_eff)) AS BIGINT)
             |       END AS mean_centi
             |FROM a ORDER BY replicate""".stripMargin)),

    // ---- Padding-waste report for length-bucketed batching: every doc
    // in the smallest bucket that fits its token count, waste = padded
    // minus real tokens in HALF_UP bp — the FLOPs-on-pad-tokens number
    // that decides whether the bucket ladder needs retuning.
    "q179_padding_waste" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(size(split(col("text"), " ")).cast("long").as("n_tokens"))
        Curation.paddingWaste(docs, "n_tokens", Seq(16L, 32L, 64L, 128L))
          .orderBy("bucket")
      },
      Some("""WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |          FROM documents),
             |b AS (SELECT n,
             |             COALESCE(list_filter([CAST(16 AS BIGINT), 32, 64, 128],
             |                                  x -> x >= n)[1], -1) AS bucket
             |      FROM d),
             |a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             |             CAST(sum(n) AS BIGINT) AS sum_tokens
             |      FROM b GROUP BY bucket),
             |p AS (SELECT bucket, n_docs, sum_tokens,
             |             CASE WHEN bucket = -1 THEN sum_tokens
             |                  ELSE bucket * n_docs END AS padded_tokens
             |      FROM a)
             |SELECT bucket, n_docs, sum_tokens, padded_tokens,
             |       CASE WHEN padded_tokens > 0
             |         THEN CAST((20000 * (padded_tokens - sum_tokens) + padded_tokens)
             |                   // (2 * padded_tokens) AS BIGINT)
             |         ELSE CAST(0 AS BIGINT) END AS waste_bp
             |FROM p ORDER BY bucket""".stripMargin)),

    // ---- BM25 top-k retrieval: 8 probe queries of 3 high-df terms
    // each, integer-exact Okapi scoring (k1=1.2, b=0.75 carried as one
    // exact fraction; rational RSJ idf in bp), top-5 docs per query.
    // The seed-expansion / domain-probe primitive over the token index.
    "q180_bm25_topk" -> QueryDef(
      (s, dir) => {
        Retrieval.bm25TopK(table(s, dir, "documents"), "doc_id", "text",
            nQueries = 8, termsPerQuery = 3, k = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("qid", "rnk")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |          FROM documents),
             |tf AS MATERIALIZED (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
             |      FROM tok WHERE tok <> '' GROUP BY 1, 2),
             |dl AS MATERIALIZED (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |      FROM tf GROUP BY 1),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |              (2000 * CAST(sum(dl) AS BIGINT) + count(*)) // (2 * count(*)) AS avdl_m
             |       FROM dl),
             |tdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
             |qt AS (SELECT tok, df_t,
             |              CAST(row_number() OVER (ORDER BY df_t DESC, tok) AS BIGINT) AS rk
             |       FROM tdf ORDER BY df_t DESC, tok LIMIT 24),
             |q AS (SELECT tok, df_t, (rk - 1) // 3 AS qid FROM qt),
             |sc AS (SELECT q.qid, tf.doc_id,
             |              CAST(count(*) AS BIGINT) AS n_terms,
             |              CAST(sum(
             |                (2 * ((20000 * (2 * st.n_docs - 2 * q.df_t + 1) + (2 * q.df_t + 1))
             |                      // (2 * (2 * q.df_t + 1)))
             |                   * ((20000 * 44 * st.avdl_m * tf.tf
             |                       + (20 * st.avdl_m * tf.tf + 6 * st.avdl_m + 18 * dl.dl * 1000))
             |                      // (2 * (20 * st.avdl_m * tf.tf + 6 * st.avdl_m + 18 * dl.dl * 1000)))
             |                 + 10000) // 20000) AS BIGINT) AS score_bp
             |       FROM tf JOIN q USING (tok) JOIN dl USING (doc_id) CROSS JOIN st
             |       GROUP BY 1, 2)
             |SELECT qid, rnk, doc_id, n_terms, score_bp
             |FROM (SELECT qid, doc_id, n_terms, score_bp,
             |             CAST(row_number() OVER (PARTITION BY qid
             |                    ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rnk
             |      FROM sc) r
             |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

    // ---- Shard manifest: per-source sequential layout cut into
    // 2000-token shards by start offset — doc counts, token load, id
    // range, and fill ratio per shard, the writer's plan for ~even
    // training shards.
    "q181_shard_plan" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("toks"))
        Curation.shardPlan(docs, "source", "doc_id", "toks", 2000L)
          .orderBy("source", "shard_ix")
      },
      Some("""WITH d AS (SELECT source, doc_id,
             |                 CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
             |          FROM documents),
             |c AS (SELECT source, doc_id, toks,
             |             CAST(sum(toks) OVER (PARTITION BY source ORDER BY doc_id
             |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |      FROM d),
             |s AS (SELECT source, doc_id, toks,
             |             (cum - toks) // 2000 AS shard_ix FROM c),
             |a AS (SELECT source, shard_ix, CAST(count(*) AS BIGINT) AS n_docs,
             |             CAST(sum(toks) AS BIGINT) AS shard_tokens,
             |             CAST(min(doc_id) AS BIGINT) AS first_id,
             |             CAST(max(doc_id) AS BIGINT) AS last_id
             |      FROM s GROUP BY 1, 2)
             |SELECT source, shard_ix, n_docs, shard_tokens, first_id, last_id,
             |       (20000 * shard_tokens + 2000) // 4000 AS fill_bp
             |FROM a ORDER BY source, shard_ix""".stripMargin)),

    // ---- Silence trim plan over REAL WAVs with planted dead air: the
    // first (doc_id%5) and last (doc_id%3) 16-sample frames are zeroed;
    // the trim offsets must recover exactly the planted voiced region.
    "q182_audio_silence_trim" -> QueryDef(
      (s, dir) => {
        Multimodal.audioSilenceTrim(s, audioTrimTable(s, dir), "doc_id", "payload",
            frameLen = 16, thrPerSample = 0L)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id, (doc_id % 5) * 16 AS z1,
             |                  160 - (doc_id % 3) * 16 AS hi
             |           FROM documents),
             |v AS (SELECT doc_id, z1, hi, unnest(range(160)) AS i FROM p),
             |sm AS (SELECT doc_id, i,
             |              CASE WHEN i >= z1 AND i < hi
             |                   THEN (doc_id * 7919 + i * 104729) % 65536 - 32768
             |                   ELSE 0 END AS v
             |       FROM v),
             |f AS (SELECT doc_id, i // 16 AS frame_id,
             |             CAST(count(*) AS BIGINT) AS nif,
             |             CAST(sum(v * v) AS BIGINT) AS energy
             |      FROM sm GROUP BY 1, 2),
             |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
             |             CAST(sum(nif) AS BIGINT) AS n_samples,
             |             min(CASE WHEN energy > 0 THEN frame_id END) AS fv,
             |             max(CASE WHEN energy > 0 THEN frame_id END) AS lv
             |      FROM f GROUP BY 1)
             |SELECT doc_id, n_samples, n_frames,
             |       CAST(COALESCE(fv, -1) AS BIGINT) AS first_voiced,
             |       CAST(COALESCE(lv, -1) AS BIGINT) AS last_voiced,
             |       CAST(COALESCE(fv * 16, n_samples) AS BIGINT) AS trim_start,
             |       CAST(CASE WHEN lv IS NULL THEN n_samples
             |                 ELSE least((lv + 1) * 16, n_samples) END AS BIGINT) AS trim_end,
             |       CAST(CASE WHEN lv IS NULL THEN 0
             |                 ELSE least((lv + 1) * 16, n_samples) - fv * 16
             |            END AS BIGINT) AS kept_samples
             |FROM g ORDER BY doc_id""".stripMargin)),

    // ---- Embedding outlier quarantine: per label, the 3 vectors
    // farthest (exact integer squared L2 on round(x·10³) milli-units)
    // from the label's signed-HALF_UP integer centroid — mislabeled /
    // garbage candidates for review.
    "q184_embed_outliers" -> QueryDef(
      (s, dir) => {
        Similarity.embedOutliers(table(s, dir, "embeddings"), "vec_id", "label",
            "embedding", k = 3)
          .select(col("grp").as("label"), col("rnk"), col("id").as("vec_id"),
            col("dist_sq"))
          .orderBy("label", "rnk")
      },
      Some("""WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
             |  FROM embeddings),
             |ex AS MATERIALIZED (SELECT vec_id, label, i, qv[CAST(i AS INT)] AS qval
             |      FROM (SELECT vec_id, label, qv,
             |                   unnest(range(1, len(qv) + 1)) AS i
             |            FROM q)),
             |cs AS (SELECT label, i, CAST(sum(qval) AS BIGINT) AS s,
             |              CAST(count(*) AS BIGINT) AS n
             |       FROM ex GROUP BY 1, 2),
             |cen AS (SELECT label, i,
             |               CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
             |                    ELSE -((2 * (-s) + n) // (2 * n)) END AS c
             |        FROM cs),
             |d AS (SELECT ex.vec_id, ex.label,
             |             CAST(sum((qval - c) * (qval - c)) AS BIGINT) AS dist_sq
             |      FROM ex JOIN cen ON cen.label = ex.label AND cen.i = ex.i
             |      GROUP BY 1, 2)
             |SELECT label, rnk, vec_id, dist_sq
             |FROM (SELECT label, vec_id, dist_sq,
             |             CAST(row_number() OVER (PARTITION BY label
             |                    ORDER BY dist_sq DESC, vec_id) AS BIGINT) AS rnk
             |      FROM d) r
             |WHERE rnk <= 3 ORDER BY label, rnk""".stripMargin)),

    // ---- Crawl-refresh snapshot diff: snapshot B deterministically
    // drops %11 docs, revises %7 docs, and adds shifted %13 docs;
    // the diff must classify every id added/removed/changed/unchanged.
    "q186_snapshot_diff" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val a = docs.select(col("doc_id"), col("text"))
        val b = docs.filter(col("doc_id") % 11 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
              .otherwise(col("text")).as("text"))
          .union(docs.filter(col("doc_id") % 13 === 0)
            .select((col("doc_id") + 100000L).as("doc_id"),
              concat(lit("new "), col("doc_id").cast("string")).as("text")))
        Dedup.snapshotDiff(a, b, "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH a AS (SELECT doc_id, text FROM documents),
             |b AS (SELECT doc_id,
             |             CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
             |                  ELSE text END AS text
             |      FROM documents WHERE doc_id % 11 <> 0
             |      UNION ALL
             |      SELECT doc_id + 100000, 'new ' || CAST(doc_id AS VARCHAR)
             |      FROM documents WHERE doc_id % 13 = 0)
             |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             |       CASE WHEN a.doc_id IS NULL THEN 'added'
             |            WHEN b.doc_id IS NULL THEN 'removed'
             |            WHEN md5(COALESCE(a.text, '')) <> md5(COALESCE(b.text, ''))
             |              THEN 'changed'
             |            ELSE 'unchanged' END AS status
             |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ---- Exact classifier AUC vs the Gopher rule labels: integer
    // Mann–Whitney with doubled midranks — the threshold-free check on
    // the q157 calibration corpus.
    "q189_classifier_auc" -> QueryDef(
      (s, dir) => {
        Curation.classifierAuc(table(s, dir, "documents"), "doc_id", "text",
          minWords = 10L)
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |          FROM documents),
             |w AS (SELECT doc_id,
             |             CAST('0x' || substr(md5('w:' ||
             |               CAST(CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) % 64
             |                    AS VARCHAR)), 1, 1) AS BIGINT) - 8 AS wt
             |      FROM toks),
             |sc AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score FROM w GROUP BY doc_id),
             |gw AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
             |gb AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words,
             |              CAST(strlen(text) - (len(ws) - 1) AS BIGINT) AS chars,
             |              CAST(strlen(text) - strlen(replace(text, '#', ''))
             |                   + (strlen(text) - strlen(replace(text, '...', ''))) // 3
             |                AS BIGINT) AS sym,
             |              CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alpha,
             |              CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
             |                                   st -> list_contains(ws, st))) AS BIGINT) AS n_stop
             |       FROM gw),
             |gm AS (SELECT doc_id, n_words,
             |              (200 * chars + n_words) // (2 * n_words) AS mwc,
             |              (20000 * sym + n_words) // (2 * n_words) AS sbp,
             |              (20000 * alpha + n_words) // (2 * n_words) AS abp,
             |              n_stop
             |       FROM gb),
             |g AS (SELECT doc_id,
             |             CAST((n_words < 10 OR n_words > 100000) = false
             |                  AND (mwc < 300 OR mwc > 1000) = false
             |                  AND sbp <= 1000 AND abp >= 8000 AND n_stop >= 2
             |               AS BIGINT) AS keep
             |      FROM gm),
             |j AS (SELECT score, keep FROM sc JOIN g USING (doc_id)),
             |bs AS (SELECT score, CAST(count(*) AS BIGINT) AS c,
             |              CAST(sum(keep) AS BIGINT) AS p
             |       FROM j GROUP BY 1),
             |r AS (SELECT score, c, p,
             |             CAST(COALESCE(sum(c) OVER (ORDER BY score
             |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |               AS BIGINT) AS cum
             |      FROM bs),
             |a AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
             |             CAST(sum(c - p) AS BIGINT) AS n_neg,
             |             CAST(sum(p * (2 * cum + c + 1)) AS BIGINT) AS r2
             |      FROM r)
             |SELECT n_pos, n_neg,
             |       CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(-1 AS BIGINT)
             |            ELSE CAST((20000 * (r2 - n_pos * (n_pos + 1)) + 2 * n_pos * n_neg)
             |                      // (4 * n_pos * n_neg) AS BIGINT) END AS auc_bp
             |FROM a""".stripMargin)),

    // ---- Naive Bayes TRAINING (keyword-seeded topic distillation:
    // fit the generative model to the mentions-"vector" label on the
    // md5-80% split). Training is one (bucket, class) token count;
    // weights are once-rounded micro-nat log-likelihood ratios.
    "q267_nb_train" -> QueryDef(
      (s, dir) => {
        val labeled = table(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            array_contains(split(col("text"), " "), "vector")
              .cast("long").as("keep"))
        TextAnalysis.nbTrainWeights(
            Curation.assignSplit(labeled, "doc_id", "nb", 80, 20)
              .filter(col("split") === "train"),
            "doc_id", "text", "keep")
          .orderBy("bucket")
      },
      Some(NbTrainSql +
        """
          |SELECT bucket, c_pos, c_neg, w_micro FROM wt ORDER BY bucket""".stripMargin)),

    // ---- The trained model scoring the HELD-OUT split, judged by
    // exact Mann-Whitney AUC against the seed labels — the full
    // train -> score -> evaluate chain, integer end to end.
    "q268_nb_auc" -> QueryDef(
      (s, dir) => {
        val labeled = table(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            array_contains(split(col("text"), " "), "vector")
              .cast("long").as("keep"))
        val withSplit = Curation.assignSplit(labeled, "doc_id", "nb", 80, 20)
        val weights = TextAnalysis.nbTrainWeights(
          withSplit.filter(col("split") === "train"), "doc_id", "text", "keep")
        val scored = TextAnalysis.nbScore(
          withSplit.filter(col("split") =!= "train"), "doc_id", "text", weights)
        Curation.aucFromScores(
          scored.join(labeled.select(col("doc_id").as("id"), col("keep")),
            Seq("id")),
          "score_micro", "keep")
      },
      Some(NbTrainSql +
        """,
          |vt AS (SELECT d.doc_id, unnest(list_filter(string_split(d.text, ' '), t -> t <> '')) AS tok
          |       FROM documents d JOIN sp USING (doc_id) WHERE sp.pct >= 80),
          |vb AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) % 64 AS bucket FROM vt),
          |vsum AS (SELECT vb.doc_id, CAST(sum(wt.w_micro) AS BIGINT) AS s
          |         FROM vb JOIN wt USING (bucket) GROUP BY 1),
          |sc AS (SELECT d.doc_id, CAST(COALESCE(vsum.s, 0) AS BIGINT) AS score
          |       FROM (SELECT doc_id FROM documents JOIN sp USING (doc_id)
          |             WHERE sp.pct >= 80) d
          |       LEFT JOIN vsum USING (doc_id)),
          |j AS (SELECT sc.score, g.keep FROM sc JOIN g USING (doc_id)),
          |bs AS (SELECT score, CAST(count(*) AS BIGINT) AS c,
          |              CAST(sum(keep) AS BIGINT) AS p
          |       FROM j GROUP BY 1),
          |r AS (SELECT score, c, p,
          |             CAST(COALESCE(sum(c) OVER (ORDER BY score
          |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |               AS BIGINT) AS cum
          |      FROM bs),
          |a AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
          |             CAST(sum(c - p) AS BIGINT) AS n_neg,
          |             CAST(sum(p * (2 * cum + c + 1)) AS BIGINT) AS r2
          |      FROM r)
          |SELECT n_pos, n_neg,
          |       CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(-1 AS BIGINT)
          |            ELSE CAST((20000 * (r2 - n_pos * (n_pos + 1)) + 2 * n_pos * n_neg)
          |                      // (4 * n_pos * n_neg) AS BIGINT) END AS auc_bp
          |FROM a""".stripMargin)),

    // ---- Unigram-LM tokenizer seeding (Kudo 2018's init round): all
    // word substrings <= 4 chars scored by frequency-weighted
    // occurrence count; vocab = every single char + top multi-char
    // pieces; costs = -ln p in once-rounded micro-nats.
    "q269_unigram_vocab" -> QueryDef(
      (s, dir) => {
        TextAnalysis.unigramSeedVocab(table(s, dir, "documents"), "text",
            vocabSize = 48, maxPiece = 4)
          .orderBy("piece")
      },
      Some(UnigramVocabSql +
        """
          |SELECT piece, cnt, cost_micro FROM voc ORDER BY piece""".stripMargin)),

    // ---- Viterbi segmentation fertility per doc against the q269
    // vocabulary: the in-row DP state is ONE BIGINT (cost*1e5 + pieces)
    // so integer min IS the lexicographic (cost, pieces) optimum — the
    // oracle replays the DP as 12 unrolled position levels.
    "q270_unigram_fertility" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val vocab = TextAnalysis.unigramSeedVocab(docs, "text",
          vocabSize = 48, maxPiece = 4)
        // words longer than the oracle's 12 unrolled DP levels are
        // filtered on BOTH engines (corpus max is 8 — a no-op guard)
        val filtered = docs.select(col("doc_id"),
          array_join(filter(split(col("text"), " "),
            w => w =!= lit("") && length(w) <= 12), " ").as("text"))
        TextAnalysis.unigramFertility(filtered, "doc_id", "text", vocab,
            maxPiece = 4)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(UnigramVocabSql + {
        val sb = new StringBuilder
        sb.append(s""",
          |wd AS (SELECT DISTINCT w FROM wo WHERE strlen(w) <= 12),
          |d0 AS (SELECT w, CAST(0 AS BIGINT) AS key FROM wd)""".stripMargin)
        for (p <- 1 to 12) {
          val branches = (1 to math.min(4, p)).map { j =>
            s"""SELECT prev.w, prev.key + v.cost_micro * 100000 + 1 AS key
               |      FROM d${p - j} prev JOIN voc v
               |        ON strlen(prev.w) >= $p AND v.piece = substr(prev.w, ${p - j + 1}, $j)""".stripMargin
          }.mkString("\n      UNION ALL\n      ")
          sb.append(s""",
            |d$p AS MATERIALIZED (SELECT w, min(key) AS key FROM (
            |      $branches
            |) b$p GROUP BY w)""".stripMargin)
        }
        sb.append(s""",
          |best AS (SELECT u.w, u.key FROM (
          |      ${(1 to 12).map(p => s"SELECT w, key, $p AS p FROM d$p").mkString("\n      UNION ALL\n      ")}
          |) u WHERE p = strlen(u.w)),
          |dt AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
          |              t -> t <> '' AND strlen(t) <= 12)) AS w
          |       FROM documents),
          |agg AS (SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS n_words,
          |               CAST(sum(best.key % 100000) AS BIGINT) AS n_pieces,
          |               CAST(sum(best.key // 100000) AS BIGINT) AS cost_micro
          |        FROM dt JOIN best ON best.w = dt.w GROUP BY 1)
          |SELECT d.doc_id,
          |       CAST(COALESCE(agg.n_words, 0) AS BIGINT) AS n_words,
          |       CAST(COALESCE(agg.n_pieces, 0) AS BIGINT) AS n_pieces,
          |       CAST(COALESCE(agg.cost_micro, 0) AS BIGINT) AS cost_micro,
          |       CAST(CASE WHEN COALESCE(agg.n_words, 0) > 0
          |            THEN (20000 * agg.n_pieces + agg.n_words) // (2 * agg.n_words)
          |            END AS BIGINT) AS fertility_bp
          |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
          |ORDER BY d.doc_id""".stripMargin)
        sb.toString
      })),

    // ---- Hybrid retrieval via reciprocal-rank fusion: per query (docs
    // 10..19), the BM25 top-10 (query terms = the doc's 3 smallest
    // distinct tokens) fused with the exact-cosine top-10 over the
    // aligned embeddings by RRF-60 — rank fusion needs no cross-arm
    // score calibration, which is why hybrid stacks serve it.
    "q271_rrf_fusion" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val emb = table(s, dir, "embeddings")
        val qt = docs.filter(col("doc_id").between(10, 19))
          .select(col("doc_id").as("qid"),
            explode(slice(array_sort(array_distinct(
              filter(split(col("text"), " "), t => t =!= lit("")))), 1, 3))
              .as("tok"))
        val sparse = Retrieval.bm25TopKFor(docs, "doc_id", "text", qt, k = 10)
          .select(col("qid"), col("id"), col("rnk"))
        val dense = Similarity.cosineTopK(emb, "vec_id", "embedding",
            emb.filter(col("vec_id").between(10, 19)), 10)
          .select(col("query_id").as("qid"), col("neighbor_id").as("id"),
            col("rank").cast("long").as("rnk"))
        Retrieval.rrfFuse(sparse, dense, k = 10)
          .select(col("qid"), col("rrf_rnk"), col("id"), col("rrf_micro"),
            col("rnk_a").as("bm25_rnk"), col("rnk_b").as("cos_rnk"))
          .orderBy("qid", "rrf_rnk")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |          FROM documents),
             |tf AS MATERIALIZED (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
             |      FROM tok WHERE tok <> '' GROUP BY 1, 2),
             |dl AS MATERIALIZED (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |      FROM tf GROUP BY 1),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |              (2000 * CAST(sum(dl) AS BIGINT) + count(*)) // (2 * count(*)) AS avdl_m
             |       FROM dl),
             |tdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
             |qt AS (SELECT doc_id AS qid,
             |              unnest(list_slice(list_sort(list_distinct(
             |                list_filter(string_split(text, ' '), t -> t <> ''))), 1, 3)) AS tok
             |       FROM documents WHERE doc_id BETWEEN 10 AND 19),
             |q AS (SELECT DISTINCT qt.qid, qt.tok, tdf.df_t FROM qt JOIN tdf USING (tok)),
             |sc AS (SELECT q.qid, tf.doc_id,
             |              CAST(sum(
             |                (2 * ((20000 * (2 * st.n_docs - 2 * q.df_t + 1) + (2 * q.df_t + 1))
             |                      // (2 * (2 * q.df_t + 1)))
             |                   * ((20000 * 44 * st.avdl_m * tf.tf
             |                       + (20 * st.avdl_m * tf.tf + 6 * st.avdl_m + 18 * dl.dl * 1000))
             |                      // (2 * (20 * st.avdl_m * tf.tf + 6 * st.avdl_m + 18 * dl.dl * 1000)))
             |                 + 10000) // 20000) AS BIGINT) AS score_bp
             |       FROM tf JOIN q USING (tok) JOIN dl USING (doc_id) CROSS JOIN st
             |       GROUP BY 1, 2),
             |ca AS (SELECT qid, doc_id AS id, CAST(rnk AS BIGINT) AS rnk_a FROM
             |       (SELECT qid, doc_id, score_bp,
             |               row_number() OVER (PARTITION BY qid
             |                 ORDER BY score_bp DESC, doc_id) AS rnk FROM sc) r
             |       WHERE rnk <= 10),
             |e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM e GROUP BY vec_id),
             |d AS (SELECT a.vec_id AS qid, b.vec_id AS id,
             |             sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dp
             |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id BETWEEN 10 AND 19
             |        AND a.vec_id <> b.vec_id
             |      GROUP BY 1, 2),
             |cos AS (SELECT qid, id, dp / (na.nrm * nb.nrm) AS score
             |        FROM d JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = id
             |        WHERE nb.nrm <> 0),
             |cb AS (SELECT qid, id, CAST(rnk AS BIGINT) AS rnk_b FROM
             |       (SELECT qid, id,
             |               row_number() OVER (PARTITION BY qid
             |                 ORDER BY score DESC, id) AS rnk FROM cos) r
             |       WHERE rnk <= 10),
             |f AS (SELECT qid, id, ca.rnk_a, cb.rnk_b,
             |             (CASE WHEN ca.rnk_a IS NULL THEN 0
             |                   ELSE (2000000 + (60 + ca.rnk_a)) // (2 * (60 + ca.rnk_a)) END
             |              + CASE WHEN cb.rnk_b IS NULL THEN 0
             |                     ELSE (2000000 + (60 + cb.rnk_b)) // (2 * (60 + cb.rnk_b)) END)
             |               AS rrf_micro
             |      FROM ca FULL JOIN cb USING (qid, id))
             |SELECT qid, CAST(rrf_rnk AS BIGINT) AS rrf_rnk, id,
             |       CAST(rrf_micro AS BIGINT) AS rrf_micro,
             |       rnk_a AS bm25_rnk, rnk_b AS cos_rnk
             |FROM (SELECT qid, id, rnk_a, rnk_b, rrf_micro,
             |             row_number() OVER (PARTITION BY qid
             |               ORDER BY rrf_micro DESC, id) AS rrf_rnk FROM f) t
             |WHERE rrf_rnk <= 10 ORDER BY qid, rrf_rnk""".stripMargin)),

    // ---- Exact duplicated-span profile (Lee et al. 2022 ExactSubstr,
    // hash-join form): per doc, how many of its 5-token sliding spans
    // occur in >= 2 distinct docs — the boilerplate/quotation signal
    // doc-level dedup misses. Hash-keyed aggregations only, no pair
    // join anywhere.
    "q272_duplicated_spans" -> QueryDef(
      (s, dir) => {
        Dedup.duplicatedSpans(table(s, dir, "documents"), "doc_id", "text",
            k = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id,
             |                 list_filter(string_split(text, ' '), t -> t <> '') AS ws
             |          FROM documents),
             |sp AS MATERIALIZED (SELECT doc_id,
             |            md5(array_to_string(list_slice(ws, CAST(i + 1 AS INT), CAST(i + 5 AS INT)), ' ')) AS h
             |      FROM (SELECT doc_id, ws,
             |                   unnest(range(0, greatest(len(ws) - 5 + 1, 0))) AS i
             |            FROM w)),
             |g AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
             |                     FROM sp GROUP BY h) t WHERE nd >= 2),
             |per AS (SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             |               CAST(sum(CASE WHEN g.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
             |        FROM sp LEFT JOIN g ON g.h = sp.h GROUP BY 1)
             |SELECT d.doc_id,
             |       CAST(COALESCE(per.n_spans, 0) AS BIGINT) AS n_spans,
             |       CAST(COALESCE(per.n_dup, 0) AS BIGINT) AS n_dup_spans,
             |       CAST(CASE WHEN per.n_spans > 0
             |            THEN (20000 * per.n_dup + per.n_spans) // (2 * per.n_spans)
             |            END AS BIGINT) AS dup_bp
             |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- PII redaction over deterministically-injected contact info
    // (the synthetic corpus carries none): emails -> <EMAIL>, IPv4 ->
    // <IP>, phone runs -> <PHONE>, in that order, with per-stage
    // counts for the audit trail. Pure regex pipeline, zero shuffles.
    "q273_pii_redact" -> QueryDef(
      (s, dir) => {
        val pii = table(s, dir, "documents").select(col("doc_id"),
          concat(col("text"), lit(" reach user"), col("doc_id").cast("string"),
            lit("@example.com or +1 (555) 010-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7")).as("text"))
        TextAnalysis.redactPii(pii, "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
             |    text || ' reach user' || CAST(doc_id AS VARCHAR) ||
             |    '@example.com or +1 (555) 010-' ||
             |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             |    ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t0
             |  FROM documents),
             |s1 AS (SELECT doc_id,
             |    CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0)) AS BIGINT) AS n_emails,
             |    regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
             |  FROM p),
             |s2 AS (SELECT doc_id, n_emails,
             |    CAST(len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', 0)) AS BIGINT) AS n_ipv4,
             |    regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
             |  FROM s1),
             |s3 AS (SELECT doc_id, n_emails, n_ipv4,
             |    CAST(len(regexp_extract_all(t2, '\+?\d[\d() .-]{6,}\d', 0)) AS BIGINT) AS n_phones,
             |    regexp_replace(t2, '\+?\d[\d() .-]{6,}\d', '<PHONE>', 'g') AS t3
             |  FROM s2)
             |SELECT doc_id, t3 AS text_redacted, n_emails, n_ipv4, n_phones
             |FROM s3 ORDER BY doc_id""".stripMargin)),

    // ---- Johnson–Lindenstrauss ±1 reduction to 8 dims: deterministic
    // Achlioptas sign matrix from md5("j:i"), exact integer projections
    // and norms over the milli-quantized embeddings — shuffle-free.
    "q190_jl_reduce" -> QueryDef(
      (s, dir) => {
        Similarity.jlReduce(table(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
          .withColumnRenamed("id", "vec_id")
          .orderBy("vec_id")
      },
      Some("""WITH q AS (SELECT vec_id,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
             |  FROM embeddings),
             |y AS (SELECT vec_id,
             |    list_transform(range(8), j ->
             |      CAST(COALESCE(list_sum(list_transform(range(len(qv)), i ->
             |        CASE WHEN substr(md5(CAST(j AS VARCHAR) || ':' ||
             |                             CAST(i AS VARCHAR)), 1, 1) < '8'
             |             THEN 1 ELSE -1 END * qv[CAST(i + 1 AS INT)])), 0)
             |        AS BIGINT)) AS yv
             |  FROM q)
             |SELECT vec_id, array_to_string(yv, ',') AS reduced,
             |       CAST(list_sum(list_transform(yv, v -> v * v)) AS BIGINT) AS norm_sq
             |FROM y ORDER BY vec_id""".stripMargin)),

    // ---- α=1/2 temperature mixture: isqrt source weights + largest-
    // remainder allocation of a 100k-token budget — planned counts sum
    // exactly to the budget.
    "q191_temperature_mixture" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("toks"))
        Curation.temperatureMixture(docs, "source", "toks", budget = 100000L)
          .orderBy("source")
      },
      Some("""WITH n AS (SELECT source,
             |                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
             |          FROM documents GROUP BY 1),
             |w AS (SELECT source, n_tokens,
             |             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight
             |      FROM n),
             |t AS (SELECT greatest(CAST(sum(weight) AS BIGINT), 1) AS tw FROM w),
             |b AS (SELECT source, n_tokens, weight,
             |             (100000 * weight) // tw AS base,
             |             (100000 * weight) % tw AS rem
             |      FROM w CROSS JOIN t),
             |lo AS (SELECT CAST(100000 - sum(base) AS BIGINT) AS leftover FROM b),
             |r AS (SELECT source, n_tokens, weight, base, rem,
             |             CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rk
             |      FROM b)
             |SELECT r.source, r.n_tokens, r.weight,
             |       (20000 * r.weight + t.tw) // (2 * t.tw) AS share_bp,
             |       CAST(r.base + CASE WHEN r.rk <= lo.leftover THEN 1 ELSE 0 END
             |         AS BIGINT) AS planned_tokens
             |FROM r CROSS JOIN lo CROSS JOIN t ORDER BY r.source""".stripMargin)),

    // ---- Label-centroid cosine affinity: exact integer dots over the
    // signed-HALF_UP milli-quant centroids, isqrt norms, signed-HALF_UP
    // cosine bp — the embedding-space proximity matrix between slices.
    "q192_centroid_affinity" -> QueryDef(
      (s, dir) => {
        Similarity.centroidAffinity(table(s, dir, "embeddings"), "label", "embedding")
          .orderBy("label_a", "label_b")
      },
      Some("""WITH q AS (SELECT CAST(label AS BIGINT) AS grp,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
             |  FROM embeddings),
             |ex AS MATERIALIZED (SELECT grp, i, qv[CAST(i AS INT)] AS qval
             |      FROM (SELECT grp, qv, unnest(range(1, len(qv) + 1)) AS i FROM q)),
             |cs AS (SELECT grp, i, CAST(sum(qval) AS BIGINT) AS s,
             |              CAST(count(*) AS BIGINT) AS n
             |       FROM ex GROUP BY 1, 2),
             |cen AS MATERIALIZED (SELECT grp, i,
             |               CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
             |                    ELSE -((2 * (-s) + n) // (2 * n)) END AS c
             |        FROM cs),
             |d AS (SELECT a.grp AS la, b.grp AS lb, CAST(sum(a.c * b.c) AS BIGINT) AS dot
             |      FROM cen a JOIN cen b ON a.i = b.i AND a.grp < b.grp
             |      GROUP BY 1, 2),
             |nr AS (SELECT grp, CAST(floor(sqrt(CAST(sum(c * c) AS DOUBLE))) AS BIGINT) AS nrm
             |       FROM cen GROUP BY 1)
             |SELECT d.la AS label_a, d.lb AS label_b, d.dot,
             |       CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN CAST(0 AS BIGINT)
             |            WHEN d.dot >= 0
             |              THEN (20000 * d.dot + na.nrm * nb.nrm) // (2 * na.nrm * nb.nrm)
             |            ELSE -((20000 * (-d.dot) + na.nrm * nb.nrm) // (2 * na.nrm * nb.nrm))
             |       END AS cos_bp
             |FROM d JOIN nr na ON na.grp = d.la JOIN nr nb ON nb.grp = d.lb
             |ORDER BY label_a, label_b""".stripMargin)),

    // ---- Per-dimension embedding quartiles over milli-quantized
    // values — the whitening/normalization QA table (a dimension whose
    // IQR collapses or whose median drifts from 0 is a preprocessing
    // bug). Integer inputs keep the interpolated quantiles exact.
    "q193_embed_dim_quantiles" -> QueryDef(
      (s, dir) => {
        val dims = table(s, dir, "embeddings")
          .select(posexplode(expr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
            .as(Seq("dim", "q")))
          .select(col("dim").cast("long").as("dim"), col("q"))
        Profiling.groupQuantiles(dims, "dim", "q", Seq(0.25, 0.5, 0.75))
          .orderBy("dim", "q_idx")
      },
      Some("""WITH e AS (SELECT list_transform(embedding,
             |                    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
             |           FROM embeddings),
             |d AS (SELECT CAST(i - 1 AS BIGINT) AS dim, qv[CAST(i AS INT)] AS q
             |      FROM (SELECT qv, unnest(range(1, len(qv) + 1)) AS i FROM e)),
             |g AS (SELECT dim, count(*) AS n,
             |             quantile_cont(q, [0.25, 0.5, 0.75]) AS qs
             |      FROM d GROUP BY 1)
             |SELECT dim, CAST(generate_subscripts(qs, 1) - 1 AS BIGINT) AS q_idx,
             |       round(unnest(qs), 4) AS q_value, n
             |FROM g ORDER BY dim, q_idx""".stripMargin)),

    // ---- Shard integrity manifest: the q181 layout plus a commutative
    // md5-sum content checksum per shard — any dropped / duplicated /
    // substituted member moves the sum, no ordering required.
    "q194_shard_checksums" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("text"),
            size(split(col("text"), " ")).cast("long").as("toks"))
        Curation.shardChecksums(docs, "source", "doc_id", "toks", "text", 2000L)
          .orderBy("source", "shard_ix")
      },
      Some("""WITH d AS (SELECT source, doc_id, text,
             |                 CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
             |          FROM documents),
             |c AS (SELECT source, doc_id, text, toks,
             |             CAST(sum(toks) OVER (PARTITION BY source ORDER BY doc_id
             |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |      FROM d),
             |s AS (SELECT source, (cum - toks) // 2000 AS shard_ix, toks,
             |             CAST('0x' || substr(md5(COALESCE(text, '')), 1, 12) AS BIGINT) AS h
             |      FROM c)
             |SELECT source, shard_ix, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(toks) AS BIGINT) AS shard_tokens,
             |       CAST(sum(h) AS BIGINT) AS content_sum
             |FROM s GROUP BY 1, 2 ORDER BY source, shard_ix""".stripMargin)),

    // ---- Per-source duplicate pressure: docs vs distinct content
    // digests and the dup share in HALF_UP bp — which crawl sources
    // are duplicate mills, read before tuning dedup budgets per
    // source. One map-side-combinable shuffle of (source, digest).
    "q196_dup_pressure" -> QueryDef(
      (s, dir) => {
        table(s, dir, "documents")
          .select(col("source"), md5(coalesce(col("text"), lit(""))).as("graft_h"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("graft_h")).as("n_distinct"))
          .withColumn("dup_bp", expr(
            "(20000 * (n_docs - n_distinct) + n_docs) DIV (2 * n_docs)"))
          .orderBy("source")
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(count(DISTINCT md5(COALESCE(text, ''))) AS BIGINT) AS n_distinct,
             |       (20000 * (count(*) - count(DISTINCT md5(COALESCE(text, '')))) + count(*))
             |         // (2 * count(*)) AS dup_bp
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ---- Deterministic hard negatives: within each language bucket,
    // the next 3 md5-ring neighbors per anchor, exact-dup digests
    // skipped — reproducible contrastive pairs, one window shuffle.
    "q197_hard_negatives" -> QueryDef(
      (s, dir) => {
        Curation.hardNegatives(table(s, dir, "documents"), "doc_id", "text",
            "lang", k = 3)
          .orderBy("doc_id", "neg_rank")
      },
      Some("""WITH b AS (SELECT doc_id, lang, md5(COALESCE(text, '')) AS h,
             |                 md5('neg:' || CAST(doc_id AS VARCHAR)) AS sk
             |          FROM documents),
             |l AS (SELECT doc_id, lang, h,
             |             lead(doc_id, 1) OVER w AS n1, lead(h, 1) OVER w AS h1,
             |             lead(doc_id, 2) OVER w AS n2, lead(h, 2) OVER w AS h2,
             |             lead(doc_id, 3) OVER w AS n3, lead(h, 3) OVER w AS h3
             |      FROM b WINDOW w AS (PARTITION BY lang ORDER BY sk, doc_id)),
             |u AS (SELECT doc_id, lang, CAST(1 AS BIGINT) AS neg_rank, n1 AS neg_id, h1 AS nh FROM l
             |      UNION ALL
             |      SELECT doc_id, lang, 2, n2, h2 FROM l
             |      UNION ALL
             |      SELECT doc_id, lang, 3, n3, h3 FROM l)
             |SELECT u.doc_id, u.lang, u.neg_rank, u.neg_id
             |FROM u JOIN b ON b.doc_id = u.doc_id
             |WHERE u.neg_id IS NOT NULL AND u.nh <> b.h
             |ORDER BY u.doc_id, u.neg_rank""".stripMargin)),

    // ---- BM25 with CALLER-SUPPLIED queries (the graft.Search path):
    // two real probe queries plus one whose only term is absent from
    // the corpus (contributes nothing, produces no rows).
    "q198_bm25_explicit" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val terms = ExplicitProbeTerms.flatMap { case (q, ts) => ts.map((q, _)) }
          .toDF("qid", "tok")
        Retrieval.bm25TopKFor(table(s, dir, "documents"), "doc_id", "text",
            terms, k = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("qid", "rnk")
      },
      Some(ExplicitBm25Sql)),

    // ---- Incremental index maintenance: the index is built from the
    // EVEN-id half of the corpus and the odd half arrives later as an
    // appendToIndex batch (postings appended bucket-aligned, terms
    // re-aggregated, stats folded). Scoring the same probes must be
    // row-identical to q198's full-corpus oracle — postings, dfs and
    // the avdl numerator are all additive for disjoint ids.
    "q210_bm25_index_append" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "text")
        val idx = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-bm25apx-v3-$tag")
        val marker = new java.io.File(idx, "_graft_appended")
        if (!marker.isFile) {
          // wipe partial state from an interrupted earlier run, then
          // build-even + append-odd exactly once
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete()
          }
          rm(idx)
          Retrieval.buildIndex(docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", idx.toString, numBuckets = 8)
          Retrieval.appendToIndex(docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text", idx.toString)
          java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
        }
        Retrieval.bm25TopKIndexed(s, idx.toString,
            ExplicitProbeTerms.map(_._2), k = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("qid", "rnk")
      },
      Some(ExplicitBm25Sql)),

    // ---- The SAME probes scored from the PERSISTED inverted index
    // (postings bucketed by tok over BucketedWarehouse, doc length
    // denormalized in): buildIndex runs once per session/corpus, then
    // scoring is a bucket-pruned postings scan + broadcast query join
    // — zero corpus passes, one bounded shuffle. The oracle is
    // q198's: the indexed path must be row-identical to the
    // tokenize-per-call path.
    "q202_bm25_indexed" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val idx = bm25IndexDir(s, dir, docs)
        Retrieval.bm25TopKIndexed(s, idx,
            ExplicitProbeTerms.map(_._2), k = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("qid", "rnk")
      },
      Some(ExplicitBm25Sql)),

    // ---- Tombstoned deletes, pre-merge (Lucene semantics): deleted
    // docs never appear in results, corpus stats stay stale until
    // compaction — the takedown path that needs no index rewrite.
    "q278_bm25_delete" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val idx = bm25DeleteIndexDir(s, dir, docs, compacted = false)
        Retrieval.bm25TopKIndexed(s, idx,
            ExplicitProbeTerms.map(_._2), k = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("qid", "rnk")
      },
      Some(DeletePendingBm25Sql)),

    // ---- The same index after compaction applies the tombstones:
    // postings physically dropped, vocabulary and stats recomputed —
    // must be bit-identical to a rebuild over the surviving corpus.
    "q279_bm25_delete_compacted" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val idx = bm25DeleteIndexDir(s, dir, docs, compacted = true)
        Retrieval.bm25TopKIndexed(s, idx,
            ExplicitProbeTerms.map(_._2), k = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("qid", "rnk")
      },
      Some(DeleteCompactedBm25Sql)),

    // ---- Doc-level dedup-index takedown: the q219 probe against an
    // index with half its reference slice tombstoned, at BOTH stages —
    // tombstones pending (dead keys excluded precisely via the doc→key
    // sidecars) and after compaction (deletes physical, key tables
    // recomputed from surviving sidecar rows). Both stages must equal
    // recomputing the keys over the SURVIVING reference — the rebuild
    // equivalence that closes the compliance loop the content-addressed
    // key tables used to force onto a full rebuild.
    "q281_dedup_index_delete" -> QueryDef(
      (s, dir) => {
        val docs = docsTpl(s, dir)
        val batch = docs.filter(col("doc_id") % 3 =!= 0)
        val pend = Dedup.dedupAgainstIndex(batch, "doc_id", "t",
            dedupDeleteIndexDir(s, dir, docs, compacted = false))
          .withColumn("stage", lit("pending"))
        val comp = Dedup.dedupAgainstIndex(batch, "doc_id", "t",
            dedupDeleteIndexDir(s, dir, docs, compacted = true))
          .withColumn("stage", lit("compacted"))
        pend.unionByName(comp)
          .select(col("stage"), col("doc_id"), col("exact_dup"), col("near_dup"))
          .orderBy("stage", "doc_id")
      },
      Some(DedupDeleteSql)),

    // ---- Unigram-LM EM TRAINING (Kudo 2018's loop; q269 was only the
    // init round): seed a 2× candidate pool, two hard-EM rounds
    // (Viterbi E-step over distinct words — suffix DP + canonical
    // smallest-j walk, all in-row — annealed prune, micro-nat re-cost).
    // The oracle replays every level: 12 suffix-DP CTEs + the j* table
    // + 12 walk CTEs per round, then the prune/re-cost arithmetic.
    "q282_unigram_em_vocab" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val filtered = docs.select(col("doc_id"),
          array_join(filter(split(col("text"), " "),
            w => w =!= lit("") && length(w) <= 12), " ").as("text"))
        TextAnalysis.unigramTrainVocab(filtered, "text", vocabSize = 48,
            maxPiece = 4, iters = 2, seedMultiplier = 2)
          .orderBy("piece")
      },
      Some(unigramEmVocabSql)),

    // ---- The EM payoff, measured: corpus-total Viterbi fertility and
    // segmentation cost under the plain seed-48 vocabulary vs the
    // EM-trained 48 — the trained row must carry the lower (or equal)
    // totals, and the oracle pins both rows exactly.
    "q283_unigram_em_fertility" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val filtered = docs.select(col("doc_id"),
          array_join(filter(split(col("text"), " "),
            w => w =!= lit("") && length(w) <= 12), " ").as("text"))
        val seed = TextAnalysis.unigramSeedVocab(filtered, "text",
          vocabSize = 48, maxPiece = 4)
        val trained = TextAnalysis.unigramTrainVocab(filtered, "text",
          vocabSize = 48, maxPiece = 4, iters = 2, seedMultiplier = 2)
        def arm(vocab: org.apache.spark.sql.DataFrame, kind: String) =
          TextAnalysis.unigramFertility(filtered, "doc_id", "text", vocab,
              maxPiece = 4)
            .agg(sum(col("n_words")).as("n_words"),
              sum(col("n_pieces")).as("n_pieces"),
              sum(col("cost_micro")).as("cost_micro"))
            .select(lit(kind).as("vocab_kind"), col("n_words"),
              col("n_pieces"), col("cost_micro"),
              expr("(20000 * n_pieces + n_words) DIV (2 * n_words)")
                .as("fertility_bp"))
        arm(seed, "seed").unionAll(arm(trained, "trained"))
          .orderBy("vocab_kind")
      },
      Some(unigramEmFertilitySql)),

    // ---- SOFT-EM unigram training (Kudo 2018's actual E-step, where
    // q282 is the hard-Viterbi stand-in): posterior piece expectations
    // over ALL segmentations via forward/backward mass chains in
    // once-rounded micro-nat log-sum-exp — the oracle replays every
    // level of both chains, the posterior slot weights, and the
    // prune/re-cost arithmetic, so the trained vocab hash-matches.
    "q288_unigram_soft_vocab" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val filtered = docs.select(col("doc_id"),
          array_join(filter(split(col("text"), " "),
            w => w =!= lit("") && length(w) <= 12), " ").as("text"))
        TextAnalysis.unigramTrainVocabSoft(filtered, "text", vocabSize = 48,
            maxPiece = 4, iters = 2, seedMultiplier = 2)
          .orderBy("piece")
      },
      Some(unigramSoftVocabSql)),

    // ---- The soft-vs-hard payoff, measured: corpus-total Viterbi
    // fertility under the hard-EM and soft-EM vocabularies trained on
    // the same corpus at the same size (serving always segments by
    // Viterbi; only the training counts differ). The soft arm must not
    // regress the hard arm's fertility — pinned by CorpusOpsSpec; the
    // oracle pins both rows exactly.
    "q289_unigram_soft_fertility" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val filtered = docs.select(col("doc_id"),
          array_join(filter(split(col("text"), " "),
            w => w =!= lit("") && length(w) <= 12), " ").as("text"))
        val hard = TextAnalysis.unigramTrainVocab(filtered, "text",
          vocabSize = 48, maxPiece = 4, iters = 2, seedMultiplier = 2)
        val soft = TextAnalysis.unigramTrainVocabSoft(filtered, "text",
          vocabSize = 48, maxPiece = 4, iters = 2, seedMultiplier = 2)
        def arm(vocab: org.apache.spark.sql.DataFrame, kind: String) =
          TextAnalysis.unigramFertility(filtered, "doc_id", "text", vocab,
              maxPiece = 4)
            .agg(sum(col("n_words")).as("n_words"),
              sum(col("n_pieces")).as("n_pieces"),
              sum(col("cost_micro")).as("cost_micro"))
            .select(lit(kind).as("vocab_kind"), col("n_words"),
              col("n_pieces"), col("cost_micro"),
              expr("(20000 * n_pieces + n_words) DIV (2 * n_words)")
                .as("fertility_bp"))
        arm(hard, "hard").unionAll(arm(soft, "soft"))
          .orderBy("vocab_kind")
      },
      Some(unigramSoftFertilitySql)),

    // ---- TOKENIZE the corpus with the q282-trained vocabulary — the
    // serving side of the trainer (q283 only counts; a pipeline needs
    // the piece sequences). One row per piece of every token's
    // canonical Viterbi segmentation; DP + walk run once per DISTINCT
    // word and join back, so corpus-sized work is one explode + join.
    "q286_unigram_encode" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val filtered = docs.select(col("doc_id"),
          array_join(filter(split(col("text"), " "),
            w => w =!= lit("") && length(w) <= 12), " ").as("text"))
        val trained = TextAnalysis.unigramTrainVocab(filtered, "text",
          vocabSize = 48, maxPiece = 4, iters = 2, seedMultiplier = 2)
        TextAnalysis.unigramEncode(filtered, "doc_id", "text", trained,
            maxPiece = 4)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id", "word_idx", "piece_idx")
      },
      Some(unigramEncodeSql)),

    // ---- Subword-regularization sampling (Kudo 2018): every corpus
    // token re-segmented by an α=1/2-annealed draw from the full
    // segmentation posterior (forward-filtering backward-sampling over
    // the lattice, deterministic md5 uniforms per occurrence+step) —
    // the training-time augmentation q286's canonical Viterbi encode
    // cannot express. The oracle replays mass chain, weight table, and
    // the 12-step sampled walk branch for branch.
    "q290_unigram_encode_sampled" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val filtered = docs.select(col("doc_id"),
          array_join(filter(split(col("text"), " "),
            w => w =!= lit("") && length(w) <= 12), " ").as("text"))
        val trained = TextAnalysis.unigramTrainVocab(filtered, "text",
          vocabSize = 48, maxPiece = 4, iters = 2, seedMultiplier = 2)
        TextAnalysis.unigramEncodeSampled(filtered, "doc_id", "text", trained,
            maxPiece = 4, alphaNum = 1L, alphaDen = 2L, seed = "sr1")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id", "word_idx", "piece_idx")
      },
      Some(unigramEncodeSampledSql)),

    // ---- Concat-and-chunk sequence layout (the GPT-style packing mode
    // q55's whole-doc binning cannot express): docs laid end to end in
    // the deterministic md5 shuffle order, the token stream sliced into
    // 512-slot training sequences, boundary-crossing docs SPLIT. The
    // Spark side computes global token offsets with the two-phase
    // prefix sum (no unpartitioned window); the oracle IS the
    // unpartitioned window — tractable at sf, which is exactly why the
    // operator must not be.
    "q292_concat_chunk" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"),
            size(filter(split(col("text"), " "), w => w =!= lit("")))
              .cast("long").as("toks"))
        Curation.concatChunk(docs, "doc_id", "toks", seqLen = 512L,
            seed = "ep1")
          .withColumnRenamed("id", "doc_id")
          .orderBy("seq_id", "seg_start")
      },
      Some("""WITH d AS (SELECT doc_id,
             |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS toks,
             |  CAST('0x' || substr(md5('ep1:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS sk
             |  FROM documents),
             |p AS (SELECT doc_id, toks,
             |  CAST(COALESCE(sum(toks) OVER (ORDER BY sk, doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
             |  FROM d WHERE toks > 0),
             |seg AS (SELECT doc_id, toks, s,
             |  unnest(range(s // 512, (s + toks - 1) // 512 + 1)) AS k FROM p)
             |SELECT k AS seq_id, doc_id,
             |  greatest(s, k * 512) - k * 512 AS seg_start,
             |  greatest(s, k * 512) - s AS doc_off,
             |  least(s + toks, (k + 1) * 512) - greatest(s, k * 512) AS n_toks
             |FROM seg ORDER BY seq_id, seg_start""".stripMargin)),

    // ---- Encode round-trip audit: every corpus token reassembled from
    // its emitted pieces must equal itself — the invariant a serving
    // tokenizer checks after loading an artifact (a torn vocab or a
    // train/serve maxPiece mismatch shows up as n_mismatch > 0 here
    // before it silently degrades a training corpus).
    "q293_encode_roundtrip" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val filtered = docs.select(col("doc_id"),
          array_join(filter(split(col("text"), " "),
            w => w =!= lit("") && length(w) <= 12), " ").as("text"))
        val trained = TextAnalysis.unigramTrainVocab(filtered, "text",
          vocabSize = 48, maxPiece = 4, iters = 2, seedMultiplier = 2)
        val enc = TextAnalysis.unigramEncode(filtered, "doc_id", "text",
          trained, maxPiece = 4)
        TextAnalysis.encodeRoundTripAudit(filtered, "doc_id", "text", enc)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(unigramEmBaseSql(96) +
        unigramEmRoundSql(1, 48, 24L) +
        unigramEmRoundSql(2, 48, 0L) +
        unigramSuffixChainSql("rt", "v2") +
        unigramWalkSql("rt", "v2") +
        """,
          |dt AS (SELECT doc_id, generate_subscripts(ws, 1) - 1 AS word_idx, unnest(ws) AS w
          |       FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
          |             FROM docsf) dws),
          |rb AS (SELECT dt.doc_id, dt.word_idx, any_value(dt.w) AS w,
          |       string_agg(pc.piece, '' ORDER BY pc.piece_idx) AS rebuilt
          |       FROM dt LEFT JOIN pcrt pc ON pc.w = dt.w
          |       GROUP BY dt.doc_id, dt.word_idx)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
          |       CAST(count(rebuilt) AS BIGINT) AS n_encoded,
          |       CAST(COALESCE(sum(CASE WHEN rebuilt IS NOT NULL AND rebuilt <> w
          |         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_mismatch,
          |       CAST(0 AS BIGINT) AS n_phantom
          |FROM rb GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Byte-fallback fertility (the SentencePiece escape analog):
    // scoring a corpus with ALPHABET DRIFT (every 'a' uppercased —
    // 'A' is outside the training alphabet) stays total, each unseen
    // char segmenting as its own piece at the escape cost, where the
    // strict q270 semantics would NULL every drifted document.
    "q284_unigram_fertility_fallback" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val filtered = docs.select(col("doc_id"),
          array_join(filter(split(col("text"), " "),
            w => w =!= lit("") && length(w) <= 12), " ").as("text"))
        // vocab trained on the ORIGINAL corpus (the q269 chain); only
        // the scoring corpus drifts
        val vocab = TextAnalysis.unigramSeedVocab(docs, "text",
          vocabSize = 48, maxPiece = 4)
        val drifted = filtered.select(col("doc_id"),
          regexp_replace(col("text"), "a", "A").as("text"))
        TextAnalysis.unigramFertility(drifted, "doc_id", "text", vocab,
            maxPiece = 4, unkCostMicro = Some(10000000L))
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(UnigramFallbackSql)),

    // ---- Source-diversified retrieval: the q198 probes with at most 2
    // survivors per (query, source) before the global top-5 — no
    // duplicate-mill source monopolizes a slate.
    "q200_bm25_diversified" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val terms = Seq((0L, "table"), (0L, "scan"), (1L, "join"),
          (1L, "stream")).toDF("qid", "tok")
        Retrieval.bm25DiversifiedFor(table(s, dir, "documents"), "doc_id", "text",
            "source", terms, k = 5, maxPerSource = 2)
          .withColumnRenamed("id", "doc_id")
          .orderBy("qid", "rnk")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |          FROM documents),
             |tf AS MATERIALIZED (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
             |      FROM tok WHERE tok <> '' GROUP BY 1, 2),
             |dl AS MATERIALIZED (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |      FROM tf GROUP BY 1),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |              (2000 * CAST(sum(dl) AS BIGINT) + count(*)) // (2 * count(*)) AS avdl_m
             |       FROM dl),
             |tdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
             |q AS (SELECT CAST(v.qid AS BIGINT) AS qid, v.tok, tdf.df_t
             |      FROM (VALUES (0, 'table'), (0, 'scan'), (1, 'join'),
             |                   (1, 'stream')) AS v(qid, tok)
             |      JOIN tdf USING (tok)),
             |sc AS (SELECT q.qid, tf.doc_id,
             |              CAST(count(*) AS BIGINT) AS n_terms,
             |              CAST(sum(
             |                (2 * ((20000 * (2 * st.n_docs - 2 * q.df_t + 1) + (2 * q.df_t + 1))
             |                      // (2 * (2 * q.df_t + 1)))
             |                   * ((20000 * 44 * st.avdl_m * tf.tf
             |                       + (20 * st.avdl_m * tf.tf + 6 * st.avdl_m + 18 * dl.dl * 1000))
             |                      // (2 * (20 * st.avdl_m * tf.tf + 6 * st.avdl_m + 18 * dl.dl * 1000)))
             |                 + 10000) // 20000) AS BIGINT) AS score_bp
             |       FROM tf JOIN q USING (tok) JOIN dl USING (doc_id) CROSS JOIN st
             |       GROUP BY 1, 2),
             |ws AS (SELECT sc.qid, sc.doc_id, d.source, sc.n_terms, sc.score_bp,
             |              row_number() OVER (PARTITION BY sc.qid, d.source
             |                ORDER BY sc.score_bp DESC, sc.doc_id) AS src_rnk
             |       FROM sc JOIN documents d USING (doc_id))
             |SELECT qid, rnk, doc_id, source, n_terms, score_bp
             |FROM (SELECT qid, doc_id, source, n_terms, score_bp,
             |             CAST(row_number() OVER (PARTITION BY qid
             |                    ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rnk
             |      FROM ws WHERE src_rnk <= 2) r
             |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

    // ---- Retrieve-then-rerank with pseudo-relevance feedback: BM25
    // top-20 candidates, Rocchio centroid of the top-3, exact integer
    // dot rerank to a top-10 — the two-stage pipeline, end to end.
    "q201_bm25_prf_rerank" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val terms = Seq((0L, "table"), (0L, "scan"), (1L, "join"),
          (1L, "stream")).toDF("qid", "tok")
        Retrieval.bm25PrfRerank(table(s, dir, "documents"),
            table(s, dir, "embeddings"), "doc_id", "text", "vec_id", "embedding",
            terms, kCand = 20, kSeed = 3, k = 10)
          .withColumnRenamed("id", "doc_id")
          .orderBy("qid", "prf_rnk")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |          FROM documents),
             |tf AS MATERIALIZED (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
             |      FROM tok WHERE tok <> '' GROUP BY 1, 2),
             |dl AS MATERIALIZED (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |      FROM tf GROUP BY 1),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |              (2000 * CAST(sum(dl) AS BIGINT) + count(*)) // (2 * count(*)) AS avdl_m
             |       FROM dl),
             |tdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
             |q AS (SELECT CAST(v.qid AS BIGINT) AS qid, v.tok, tdf.df_t
             |      FROM (VALUES (0, 'table'), (0, 'scan'), (1, 'join'),
             |                   (1, 'stream')) AS v(qid, tok)
             |      JOIN tdf USING (tok)),
             |sc AS (SELECT q.qid, tf.doc_id,
             |              CAST(count(*) AS BIGINT) AS n_terms,
             |              CAST(sum(
             |                (2 * ((20000 * (2 * st.n_docs - 2 * q.df_t + 1) + (2 * q.df_t + 1))
             |                      // (2 * (2 * q.df_t + 1)))
             |                   * ((20000 * 44 * st.avdl_m * tf.tf
             |                       + (20 * st.avdl_m * tf.tf + 6 * st.avdl_m + 18 * dl.dl * 1000))
             |                      // (2 * (20 * st.avdl_m * tf.tf + 6 * st.avdl_m + 18 * dl.dl * 1000)))
             |                 + 10000) // 20000) AS BIGINT) AS score_bp
             |       FROM tf JOIN q USING (tok) JOIN dl USING (doc_id) CROSS JOIN st
             |       GROUP BY 1, 2),
             |cand AS MATERIALIZED (
             |       SELECT qid, doc_id, score_bp,
             |              CAST(row_number() OVER (PARTITION BY qid
             |                     ORDER BY score_bp DESC, doc_id) AS BIGINT) AS bm25_rnk
             |       FROM sc QUALIFY bm25_rnk <= 20),
             |qv AS (SELECT vec_id AS doc_id,
             |              list_transform(embedding,
             |                x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
             |       FROM embeddings),
             |cv AS MATERIALIZED (SELECT cand.qid, cand.doc_id, cand.score_bp,
             |              cand.bm25_rnk, qv.qv
             |       FROM cand JOIN qv USING (doc_id)),
             |ex AS (SELECT qid, doc_id, bm25_rnk, i, qv[CAST(i AS INT)] AS qval
             |       FROM (SELECT qid, doc_id, bm25_rnk, qv,
             |                    unnest(range(1, len(qv) + 1)) AS i
             |             FROM cv)),
             |cs AS (SELECT qid, i, CAST(sum(qval) AS BIGINT) AS s,
             |              CAST(count(*) AS BIGINT) AS n
             |       FROM ex WHERE bm25_rnk <= 3 GROUP BY 1, 2),
             |cen AS (SELECT qid, i,
             |               CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
             |                    ELSE -((2 * (-s) + n) // (2 * n)) END AS c
             |        FROM cs),
             |d AS (SELECT ex.qid, ex.doc_id, CAST(sum(ex.qval * cen.c) AS BIGINT) AS dot
             |      FROM ex JOIN cen ON cen.qid = ex.qid AND cen.i = ex.i
             |      GROUP BY 1, 2)
             |SELECT cv.qid, r.prf_rnk, cv.doc_id, cv.bm25_rnk, cv.score_bp, r.dot
             |FROM (SELECT qid, doc_id, dot,
             |             CAST(row_number() OVER (PARTITION BY qid
             |                    ORDER BY dot DESC, doc_id) AS BIGINT) AS prf_rnk
             |      FROM d) r
             |JOIN cv ON cv.qid = r.qid AND cv.doc_id = r.doc_id
             |WHERE r.prf_rnk <= 10 ORDER BY cv.qid, r.prf_rnk""".stripMargin)),

    // ---- Bradley–Terry preference aggregation (Preference
    // .bradleyTerry): pairwise "winner beat loser" judgments — the
    // reward-model data-prep primitive — reduce to per-item strengths
    // via 6 integer-exact MM iterations. The fixture synthesizes a
    // 12-item tournament from doc_id arithmetic where the higher
    // index wins 70% of meetings; the oracle rebuilds the SAME win
    // counts and unrolls the pinned update as MATERIALIZED CTE levels
    // (OracleGen.bradleyTerryChain — the q160/q171 precedent).
    "q320_bradley_terry" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val i = col("doc_id") % 12
        val j = (col("doc_id") % 12 + 1 + col("doc_id") % 5) % 12
        val hi = col("doc_id") % 10 < 7
        val pairs = docs.select(
            when(hi, greatest(i, j)).otherwise(least(i, j)).as("winner"),
            when(hi, least(i, j)).otherwise(greatest(i, j)).as("loser"))
          .groupBy("winner", "loser")
          .agg(count(lit(1)).as("n"))
        graft.llm.Preference.bradleyTerry(pairs, "winner", "loser", "n",
            iters = 6)
          .orderBy("item")
      },
      Some(s"""WITH p AS (SELECT doc_id, doc_id % 12 AS i,
              |    (doc_id % 12 + 1 + doc_id % 5) % 12 AS j FROM documents),
              |pr AS (SELECT
              |    CASE WHEN doc_id % 10 < 7 THEN greatest(i, j)
              |         ELSE least(i, j) END AS w,
              |    CASE WHEN doc_id % 10 < 7 THEN least(i, j)
              |         ELSE greatest(i, j) END AS l
              |  FROM p),
              |dir AS (SELECT w, l, CAST(count(*) AS BIGINT) AS n FROM pr
              |        GROUP BY w, l),
              |g AS MATERIALIZED (SELECT i, j, CAST(sum(n) AS BIGINT) AS n FROM (
              |    SELECT w AS i, l AS j, n FROM dir
              |    UNION ALL SELECT l, w, n FROM dir) t GROUP BY i, j),
              |wn AS MATERIALIZED (SELECT nodes.i,
              |    CAST(coalesce(ws.n, 0) AS BIGINT) AS wi
              |  FROM (SELECT DISTINCT i FROM g) nodes
              |  LEFT JOIN (SELECT w AS i, CAST(sum(n) AS BIGINT) AS n FROM dir
              |             GROUP BY w) ws USING (i)),
              |r0 AS MATERIALIZED (SELECT i, CAST(1000000 AS BIGINT) AS r FROM wn)${OracleGen.bradleyTerryChain(6)}
              |SELECT i AS item, r AS strength_micro FROM r6
              |ORDER BY item""".stripMargin)),

    // ---- Inter-rater agreement (Preference.fleissKappa): a 5-rater
    // panel labels every document into 4 classes with a deterministic
    // rater-dependent rule, and Fleiss' kappa reports
    // how much better than chance the panel agrees — the data-quality
    // gate run on annotation batches before their labels train
    // anything. Pinned micro-unit divisions; the oracle replays every
    // step (the only signed division uses the sign-split both engines
    // compute identically).
    "q321_rater_agreement" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val ratings = docs.select(col("doc_id").as("item"),
            explode(sequence(lit(0), lit(4))).as("rater"))
          .withColumn("label",
            (col("item") * (col("rater") + 3) + col("rater")) % 4)
        graft.llm.Preference.fleissKappa(ratings, "item", "rater", "label",
            ratersPerItem = 5)
          .orderBy("n_items")
      },
      Some("""WITH r AS (SELECT doc_id AS item, unnest(range(0, 5)) AS rater
             |          FROM documents),
             |l AS (SELECT item, rater,
             |        (item * (rater + 3) + rater) % 4 AS label FROM r),
             |cnt AS (SELECT item, label, CAST(count(*) AS BIGINT) AS nik
             |        FROM l GROUP BY item, label),
             |pi AS (SELECT item,
             |         CAST(((sum(nik * nik) - 5) * 1000000) // 20 AS BIGINT) AS p_i
             |       FROM cnt GROUP BY item),
             |pb AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
             |         CAST(sum(p_i) AS BIGINT) // CAST(count(*) AS BIGINT) AS p_bar
             |       FROM pi),
             |qk AS (SELECT label, CAST(sum(nik) AS BIGINT) AS q FROM cnt
             |       GROUP BY label),
             |pk AS (SELECT (q * 1000000) // ((SELECT n_items FROM pb) * 5) AS p
             |       FROM qk),
             |pe AS (SELECT CAST(sum(p * p) AS BIGINT) // 1000000 AS p_e FROM pk)
             |SELECT pb.n_items, CAST(5 AS BIGINT) AS raters_per_item,
             |  pb.p_bar AS p_bar_micro, pe.p_e AS p_e_micro,
             |  CASE WHEN pe.p_e >= 1000000 THEN CAST(NULL AS BIGINT)
             |       ELSE CAST(sign(pb.p_bar - pe.p_e) AS BIGINT) *
             |         ((abs(pb.p_bar - pe.p_e) * 1000000) // (1000000 - pe.p_e))
             |  END AS kappa_micro
             |FROM pb, pe ORDER BY n_items""".stripMargin)),

    // ---- Preference length-bias audit: pair adjacent documents as
    // (chosen-candidate, rejected-candidate), decide winners by a
    // deterministic rule, and report the LONGER response's win rate
    // per length-delta bucket (HALF_UP basis points) — the standard
    // diagnostic run on preference data before reward-model training,
    // where a longer-wins skew flags verbosity bias in raters or
    // judges. Ties on length are excluded (no "longer" exists). One
    // self-join on the pair id + one aggregation; lengths come from
    // the corpus's own n_chars.
    "q322_preference_length_bias" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val a = docs.filter(col("doc_id") % 2 === 0)
          .select(expr("doc_id DIV 2").as("pid"), col("n_chars").as("len_a"))
        val b = docs.filter(col("doc_id") % 2 === 1)
          .select(expr("doc_id DIV 2").as("pid"), col("n_chars").as("len_b"))
        a.join(b, "pid")
          .filter(col("len_a") =!= col("len_b"))
          .withColumn("delta", abs(col("len_a") - col("len_b")))
          .withColumn("longer_wins",
            (col("pid") * 7 + col("delta")) % 10 < 6)
          .withColumn("bucket", expr(
            """CASE WHEN delta < 10 THEN '0-9'
              |     WHEN delta < 100 THEN '10-99'
              |     WHEN delta < 1000 THEN '100-999'
              |     ELSE '1000+' END""".stripMargin))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("longer_wins"), 1L).otherwise(0L)).as("graft_w"))
          .select(col("bucket"), col("n_pairs"),
            expr("(2 * 10000 * graft_w + n_pairs) DIV (2 * n_pairs)")
              .as("longer_win_bp"))
          .orderBy("bucket")
      },
      Some("""WITH a AS (SELECT doc_id // 2 AS pid, n_chars AS len_a
             |          FROM documents WHERE doc_id % 2 = 0),
             |b AS (SELECT doc_id // 2 AS pid, n_chars AS len_b
             |      FROM documents WHERE doc_id % 2 = 1),
             |p AS (SELECT a.pid, len_a, len_b, abs(len_a - len_b) AS delta
             |      FROM a JOIN b USING (pid) WHERE len_a <> len_b),
             |t AS (SELECT CASE WHEN delta < 10 THEN '0-9'
             |               WHEN delta < 100 THEN '10-99'
             |               WHEN delta < 1000 THEN '100-999'
             |               ELSE '1000+' END AS bucket,
             |        CASE WHEN (pid * 7 + delta) % 10 < 6 THEN 1 ELSE 0 END AS w
             |      FROM p)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST((2 * 10000 * sum(w) + count(*)) // (2 * count(*)) AS BIGINT)
             |    AS longer_win_bp
             |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // ---- Position-bias audit for judged pairs: every pair is judged
    // TWICE with the candidates' presentation order swapped, and the
    // audit reports the per-source rate of verdict FLIPS (HALF_UP bp)
    // — the standard consistency check on LLM-judge preference data,
    // where order-sensitive verdicts flag position bias. The verdict
    // rule plants flips on every 4th pair; the oracle replays the
    // two-trial synthesis and the distinct-verdict fold verbatim.
    "q323_position_flip_rate" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val judged = docs.filter(col("doc_id") % 2 === 0)
          .select(expr("doc_id DIV 2").as("pid"), col("source"),
            explode(sequence(lit(0), lit(1))).as("trial"))
          .withColumn("verdict", expr(
            """CASE WHEN (pid + trial * (CASE WHEN pid % 4 = 0 THEN 1 ELSE 0 END))
              |          % 2 = 0
              |     THEN 'chose_a' ELSE 'chose_b' END""".stripMargin))
        judged.groupBy(col("pid"), col("source"))
          .agg(countDistinct(col("verdict")).as("graft_nv"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("graft_nv") === 2, 1L).otherwise(0L)).as("n_flipped"))
          .select(col("source"), col("n_pairs"), col("n_flipped"),
            expr("(2 * 10000 * n_flipped + n_pairs) DIV (2 * n_pairs)")
              .as("flip_bp"))
          .orderBy("source")
      },
      Some("""WITH j AS (
             |  SELECT doc_id // 2 AS pid, source, unnest(range(0, 2)) AS trial
             |  FROM documents WHERE doc_id % 2 = 0),
             |v AS (SELECT pid, source,
             |    CASE WHEN (pid + trial * (CASE WHEN pid % 4 = 0 THEN 1 ELSE 0 END))
             |              % 2 = 0
             |         THEN 'chose_a' ELSE 'chose_b' END AS verdict
             |  FROM j),
             |f AS (SELECT pid, source, count(DISTINCT verdict) AS nv
             |      FROM v GROUP BY pid, source)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST(sum(CASE WHEN nv = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flipped,
             |  CAST((2 * 10000 * sum(CASE WHEN nv = 2 THEN 1 ELSE 0 END)
             |        + count(*)) // (2 * count(*)) AS BIGINT) AS flip_bp
             |FROM f GROUP BY source ORDER BY source""".stripMargin)))

  /** Deterministic audio column with PLANTED dead air for the silence
    * trim query: 160-sample PCM16 mono WAVs whose first (doc_id%5) and
    * last (doc_id%3) 16-sample frames are zeros around the usual LCG
    * sample stream — the oracle recovers the voiced region by
    * arithmetic.
    */
  private def audioTrimTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    synthIds(s, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val z1 = (id % 5).toInt * 16
          val hi = 160 - (id % 3).toInt * 16
          val samples = Array.tabulate(160) { i =>
            if (i >= z1 && i < hi)
              (((id * 7919L + i.toLong * 104729L) % 65536L) - 32768L).toShort
            else 0.toShort
          }
          (id, graft.fixtures.FixtureBytes.pcmWav(8000, 1, samples))
        }
      }.toDF("doc_id", "payload")
  }

  /** Deterministic audio column for the fingerprint queries: PCM16 mono
    * WAVs whose sample stream depends only on doc_id % 8 (the seed
    * class) while the clip LENGTH cycles doc_id % 3 — planting
    * exact-duplicate classes (ids ≡ mod 24) under the REAL encode →
    * decode → fingerprint pipeline.
    */
  private def audioFpTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    synthIds(s, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 198 + (id % 3).toInt * 16
          val seed = (id % 8) * 7919L * 31L
          val samples = Array.tabulate(n)(i =>
            (((seed + i.toLong * 104729L) % 65536L) - 32768L).toShort)
          (id, graft.fixtures.FixtureBytes.pcmWav(8000, 1, samples))
        }
      }.toDF("doc_id", "payload")
  }

  /** Shared oracle CTE computing every document's audio fingerprint
    * purely from doc_id arithmetic — the planted sample formula, the
    * assignment-rule frames, integer energies, and difference bits,
    * mirrored in SQL.
    */
  private def audioFpOracleCte: String =
    """WITH p AS (SELECT doc_id, 198 + (doc_id % 3) * 16 AS n,
      |                  (doc_id % 8) * 7919 * 31 AS sd FROM documents),
      |ix AS (SELECT doc_id, n, sd, unnest(range(0, n)) AS i FROM p),
      |sm AS (SELECT doc_id, n, i, ((sd + i * 104729) % 65536) - 32768 AS s FROM ix),
      |en AS (SELECT doc_id, (i * 33) // n AS f, CAST(sum(s * s) AS BIGINT) AS e
      |       FROM sm GROUP BY doc_id, (i * 33) // n),
      |bits AS (SELECT a.doc_id, a.f, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
      |         FROM en a JOIN en b ON b.doc_id = a.doc_id AND b.f = a.f + 1
      |         WHERE a.f < 32),
      |fp AS (SELECT doc_id, CAST(sum(bit * (CAST(1 AS BIGINT) << f)) AS BIGINT) AS fp
      |       FROM bits GROUP BY doc_id)""".stripMargin

  /** Shared oracle CTE computing every document's dHash halves (and
    * image size) purely from doc_id arithmetic — the gradient pixel
    * formula, the 9×8 floor-sample, the integer luma, and the
    * difference bits, mirrored in SQL.
    */
  // a def, not a val: the query map's initializer above reads this
  // during object construction, before a later val would be assigned
  private def dhashOracleCte: String =
    """WITH p AS (SELECT doc_id, 16 + doc_id % 3 AS w, 12 + doc_id % 2 AS h,
      |                  (doc_id % 8) * 29 AS s FROM documents),
      |gy AS (SELECT doc_id, w, h, s, unnest(range(0, 8)) AS y FROM p),
      |gx AS (SELECT doc_id, w, h, s, y, unnest(range(0, 9)) AS x FROM gy),
      |pix AS (SELECT doc_id, y, x,
      |         (299 * ((s + 11 * ((x * w) // 9) + 23 * ((y * h) // 8)) % 256)
      |        + 587 * ((s +  7 * ((x * w) // 9) + 31 * ((y * h) // 8)) % 256)
      |        + 114 * ((s + 13 * ((x * w) // 9) + 17 * ((y * h) // 8)) % 256)) // 1000 AS gray
      |        FROM gx),
      |bits AS (SELECT a.doc_id, a.y, a.x,
      |               CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
      |         FROM pix a JOIN pix b ON b.doc_id = a.doc_id AND b.y = a.y
      |                              AND b.x = a.x + 1
      |         WHERE a.x < 8),
      |hsh AS (SELECT bits.doc_id, p.w, p.h,
      |          CAST(sum(CASE WHEN y < 4
      |                        THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x))
      |                        ELSE 0 END) AS BIGINT) AS dhash_a,
      |          CAST(sum(CASE WHEN y >= 4
      |                        THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x))
      |                        ELSE 0 END) AS BIGINT) AS dhash_b
      |        FROM bits JOIN p ON p.doc_id = bits.doc_id
      |        GROUP BY bits.doc_id, p.w, p.h)""".stripMargin

  /** Shared oracle CTE for the video-fingerprint queries: recomputes
    * each sampled frame's dHash from the [[gradientAviTable]] plant
    * ((doc_id, frame j) arithmetic, the [[dhashOracleCte]] formula with
    * the per-frame seed), then folds the per-frame halves with MIN into
    * the per-video fingerprint `fp(doc_id, n_frames, n_sampled, fp_a,
    * fp_b)`.
    */
  private def videoFpOracleCte: String =
    """WITH p AS (SELECT doc_id, doc_id % 5 + 1 AS nf, 16 + doc_id % 3 AS w,
      |                  12 + doc_id % 2 AS h FROM documents),
      |sf AS (SELECT doc_id, nf, w, h, j, ((doc_id % 8) * 29 + j * 37) % 256 AS s
      |       FROM (SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS j FROM p)
      |       WHERE j % 2 = 0),
      |gy AS (SELECT doc_id, j, w, h, s, unnest(range(0, 8)) AS y FROM sf),
      |gx AS (SELECT doc_id, j, w, h, s, y, unnest(range(0, 9)) AS x FROM gy),
      |pix AS (SELECT doc_id, j, y, x,
      |         (299 * ((s + 11 * ((x * w) // 9) + 23 * ((y * h) // 8)) % 256)
      |        + 587 * ((s +  7 * ((x * w) // 9) + 31 * ((y * h) // 8)) % 256)
      |        + 114 * ((s + 13 * ((x * w) // 9) + 17 * ((y * h) // 8)) % 256)) // 1000 AS gray
      |        FROM gx),
      |bits AS (SELECT a.doc_id, a.j, a.y, a.x,
      |               CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
      |         FROM pix a JOIN pix b ON b.doc_id = a.doc_id AND b.j = a.j
      |                              AND b.y = a.y AND b.x = a.x + 1
      |         WHERE a.x < 8),
      |fh AS (SELECT doc_id, j,
      |          CAST(sum(CASE WHEN y < 4
      |                        THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x))
      |                        ELSE 0 END) AS BIGINT) AS dhash_a,
      |          CAST(sum(CASE WHEN y >= 4
      |                        THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x))
      |                        ELSE 0 END) AS BIGINT) AS dhash_b
      |        FROM bits GROUP BY doc_id, j),
      |fp AS (SELECT fh.doc_id, CAST(max(p.nf) AS BIGINT) AS n_frames,
      |              CAST(count(*) AS BIGINT) AS n_sampled,
      |              min(dhash_a) AS fp_a, min(dhash_b) AS fp_b
      |       FROM fh JOIN p ON p.doc_id = fh.doc_id
      |       GROUP BY fh.doc_id)""".stripMargin

  /** DuckDB oracle for [[Curation.greedyCover]] at depth `k`: level i
    * filters the tokens still uncovered after level i−1's cumulative
    * cover, counts per remaining doc (LEFT JOIN keeps zero-gain docs),
    * and takes the (gain DESC, doc_id) argmax — exactly the operator's
    * tie rule.
    */
  /** DuckDB oracle for [[TextAnalysis.bpeTrain]], `k` unrolled merge
    * levels. Each word is a wrapped symbol string `␟s₁␟␟s₂␟…` (chr(31)
    * never occurs in the corpus), so applying the winning merge (a, b)
    * is one `replace('␟a␟␟b␟' → '␟ab␟')` — non-overlapping left-to-
    * right, the exact greedy BPE semantics, with per-symbol delimiters
    * so adjacent matches never share boundary characters. An exhausted
    * level's argmax CTE is empty and contributes no output row (the
    * CASE guard keeps the vocabulary unchanged from there on). Every
    * level CTE is MATERIALIZED: DuckDB inlines CTEs by default and
    * each level references its predecessor several times, so the
    * un-materialized chain re-scans the corpus exponentially.
    */
  /** The shared `k`-level training chain: CTEs v0..v$k (each carrying
    * the original word for the apply-side join) and b1..b$k (the
    * per-level argmax).
    */
  private def bpeChainCte(k: Int): String = {
    val sep2 = "chr(31)||chr(31)"
    val sb = new StringBuilder
    sb.append(
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |vw AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS f FROM toks
        |       WHERE length(w) >= 2 GROUP BY w),
        |v0 AS MATERIALIZED (SELECT w, chr(31) || array_to_string(string_split(w, ''), chr(31)||chr(31))
        |              || chr(31) AS wr, f FROM vw)""".stripMargin)
    for (i <- 1 to k) {
      val p = i - 1
      sb.append(s""",
        |s$i AS MATERIALIZED (SELECT list_transform(string_split(wr, $sep2),
        |                              x -> trim(x, chr(31))) AS syms, f FROM v$p),
        |p$i AS MATERIALIZED (SELECT u.pr.a AS a, u.pr.b AS b, CAST(sum(f) AS BIGINT) AS n
        |        FROM (SELECT unnest([{'a': syms[j], 'b': syms[j+1]}
        |                             for j in range(1, len(syms))]) AS pr, f
        |              FROM s$i WHERE len(syms) >= 2) u
        |        GROUP BY 1, 2),
        |b$i AS MATERIALIZED (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
        |v$i AS MATERIALIZED (SELECT w, CASE WHEN (SELECT count(*) FROM b$i) = 0 THEN wr
        |               ELSE replace(wr,
        |                 chr(31)||(SELECT a FROM b$i)||$sep2||(SELECT b FROM b$i)||chr(31),
        |                 chr(31)||(SELECT a FROM b$i)||(SELECT b FROM b$i)||chr(31)) END AS wr,
        |               f FROM v$p)""".stripMargin)
    }
    sb.toString
  }

  private def bpeTrainOracle(k: Int): String = {
    val rows = (1 to k).map { i =>
      s"SELECT CAST($i AS BIGINT) AS step, a AS sym_a, b AS sym_b, a||b AS merged, n FROM b$i"
    }.mkString("\nUNION ALL\n")
    bpeChainCte(k) + s"\nSELECT * FROM (\n$rows\n) ORDER BY step"
  }

  /** DuckDB oracle for [[TextAnalysis.bpeTokenCounts]] over the
    * [[TextAnalysis.bpeTrain]] merge table at depth `k`: the final
    * chain level v$k already holds every trained word's fully-merged
    * form, so a word's token count is its symbol-string part count;
    * under-2-char words (outside the training vocab) count 1.
    */
  private def bpeApplyOracle(k: Int): String =
    bpeChainCte(k) + s""",
      |wt AS MATERIALIZED (SELECT w,
      |        CAST(len(string_split(wr, chr(31)||chr(31))) AS BIGINT) AS nt FROM v$k),
      |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |              CAST(sum(CASE WHEN wt.nt IS NULL THEN 1 ELSE wt.nt END) AS BIGINT) AS n_tokens
      |       FROM dw LEFT JOIN wt ON wt.w = dw.w GROUP BY doc_id)
      |SELECT doc_id, n_words, n_tokens,
      |       CAST((20000 * n_tokens + n_words) // (2 * n_words) AS BIGINT) AS tokens_per_word_bp
      |FROM dt ORDER BY doc_id""".stripMargin

  private def greedyCoverOracle(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        |      FROM documents),
        |ids AS (SELECT DISTINCT doc_id FROM t),
        |g1 AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS gain FROM t GROUP BY t.doc_id),
        |w1 AS (SELECT doc_id, gain FROM g1 ORDER BY gain DESC, doc_id LIMIT 1),
        |c1 AS (SELECT DISTINCT tok FROM t WHERE doc_id IN (SELECT doc_id FROM w1))""".stripMargin)
    for (i <- 2 to k) {
      val p = i - 1
      val picked = (1 until i).map(j => s"SELECT doc_id FROM w$j").mkString(" UNION ALL ")
      sb.append(s""",
        |u$i AS (SELECT doc_id, tok FROM t WHERE tok NOT IN (SELECT tok FROM c$p)),
        |g$i AS (SELECT ids.doc_id, CAST(count(u.tok) AS BIGINT) AS gain
        |        FROM ids LEFT JOIN u$i u ON u.doc_id = ids.doc_id
        |        WHERE ids.doc_id NOT IN ($picked)
        |        GROUP BY ids.doc_id),
        |w$i AS (SELECT doc_id, gain FROM g$i ORDER BY gain DESC, doc_id LIMIT 1),
        |c$i AS (SELECT tok FROM c$p UNION
        |        SELECT tok FROM t WHERE doc_id IN (SELECT doc_id FROM w$i))""".stripMargin)
    }
    val rows = (1 to k).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS pick_rank, doc_id, gain,
         |       (SELECT CAST(count(*) AS BIGINT) FROM c$i) AS covered_total FROM w$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    sb.append(s"\nSELECT * FROM (\n$rows\n) ORDER BY pick_rank")
    sb.toString
  }
}
