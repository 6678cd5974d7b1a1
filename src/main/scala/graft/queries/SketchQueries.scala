package graft.queries

import graft.llm.{Sketches, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Approximate-query sketches and corpus-profiling operators (HLL,
  * count-min, weighted sampling, contamination check, embedding stats).
  * Every estimate is computed from integer sketch state + IEEE-exact
  * double ops, so the DuckDB oracles reproduce the values bit-for-bit —
  * the approximation is deterministic, not a rows-only check.
  */
object SketchQueries {
  import Registry.table

  val defs: Map[String, QueryDef] = Map(
    // ---- HyperLogLog distinct users per event type, next to the exact
    // count the sketch is standing in for at scale.
    "q64_hll_distinct" -> QueryDef(
      (s, dir) => {
        val ev = table(s, dir, "events")
        val exact = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
        Sketches.hllDistinct(ev, "event_type", "user_id")
          .join(exact, Seq("event_type"))
          .select(col("event_type"), col("n_exact"), col("hll_estimate"), col("empty_buckets"))
          .orderBy("event_type")
      },
      Some("""WITH h AS (SELECT event_type, user_id,
             |            CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
             |          FROM events),
             |r AS (SELECT event_type, hv % 64 AS bucket,
             |             CASE WHEN hv // 64 = 0 THEN 55 ELSE 55 - length(bin(hv // 64)) END AS rho
             |      FROM h),
             |m AS (SELECT event_type, bucket, max(rho) AS mx FROM r GROUP BY 1, 2),
             |sk AS (SELECT event_type,
             |              CAST(sum(CAST(1 AS BIGINT) << (55 - mx)) AS BIGINT) AS s_present,
             |              count(*) AS n_buckets
             |       FROM m GROUP BY 1),
             |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
             |SELECT sk.event_type, ex.n_exact,
             |  round((CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)) * CAST(36028797018963968 AS DOUBLE) /
             |        CAST(s_present + (64 - n_buckets) * 36028797018963968 AS DOUBLE), 4) AS hll_estimate,
             |  CAST(64 - n_buckets AS BIGINT) AS empty_buckets
             |FROM sk JOIN ex ON ex.event_type = sk.event_type
             |ORDER BY sk.event_type""".stripMargin)),

    // ---- Deterministic KLL/MRL quantile sketch over document token
    // counts. At the test corpus sizes every md5-assigned stream stays
    // under its level-0 capacity, so the sketch is EXACT and the
    // oracle is the plain rank lookup — the gate checks the whole
    // distributed path (stream hashing, per-stream ladders, driver
    // union, HALF_UP probe arithmetic) in its lossless regime; the
    // compaction regime is pinned by PropertySpec's rank-error
    // envelope (it is deliberately not oracle-SQL-expressible).
    "q203_kll_quantiles" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("toks"))
        Sketches.kllQuantiles(docs, "doc_id", "toks",
            Seq(1000L, 2500L, 5000L, 7500L, 9900L), k = 2048, parts = 8)
          .orderBy("q_bp")
      },
      Some("""WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
             |          FROM documents),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
             |r AS (SELECT toks, CAST(row_number() OVER (ORDER BY toks) AS BIGINT) AS rk
             |      FROM d),
             |p AS (SELECT CAST(unnest([1000, 2500, 5000, 7500, 9900]) AS BIGINT) AS q_bp),
             |t AS (SELECT p.q_bp,
             |             greatest(CAST(1 AS BIGINT),
             |                      (2 * p.q_bp * n.n + 10000) // 20000) AS target,
             |             n.n AS n
             |      FROM p CROSS JOIN n)
             |SELECT t.q_bp, r.toks AS est_value, t.n AS n_rows
             |FROM t JOIN r ON r.rk = t.target
             |ORDER BY t.q_bp""".stripMargin)),

    // ---- HLL set operations: per event-type pair, the union estimate
    // from per-bucket-max MERGED registers and the inclusion-exclusion
    // intersection — the cross-segment audience-overlap matrix from
    // bounded sketch state.
    "q187_hll_overlap" -> QueryDef(
      (s, dir) => {
        Sketches.hllOverlap(table(s, dir, "events"), "event_type", "user_id")
          .orderBy("ga", "gb")
      },
      Some("""WITH h AS (SELECT event_type AS g,
             |            CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
             |          FROM events),
             |r AS (SELECT g, hv % 64 AS bucket,
             |             CASE WHEN hv // 64 = 0 THEN 55
             |                  ELSE 55 - length(bin(hv // 64)) END AS rho
             |      FROM h WHERE hv IS NOT NULL),
             |m AS (SELECT g, bucket, max(rho) AS mx FROM r GROUP BY 1, 2),
             |sk AS (SELECT g, CAST(sum(CAST(1 AS BIGINT) << (55 - mx)) AS BIGINT) AS sp,
             |              count(*) AS nb
             |       FROM m GROUP BY 1),
             |e AS (SELECT g, round((CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE))
             |               * CAST(36028797018963968 AS DOUBLE) /
             |               CAST(sp + (64 - nb) * 36028797018963968 AS DOUBLE), 4) AS est
             |      FROM sk),
             |p AS (SELECT a.g AS ga, b.g AS gb, a.est AS est_a, b.est AS est_b
             |      FROM e a JOIN e b ON a.g < b.g),
             |mr AS (SELECT p.ga, p.gb, m.bucket, max(m.mx) AS mx
             |       FROM p JOIN m ON m.g = p.ga OR m.g = p.gb GROUP BY 1, 2, 3),
             |usk AS (SELECT ga, gb, CAST(sum(CAST(1 AS BIGINT) << (55 - mx)) AS BIGINT) AS sp,
             |               count(*) AS nb
             |        FROM mr GROUP BY 1, 2),
             |ue AS (SELECT ga, gb, round((CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE))
             |               * CAST(36028797018963968 AS DOUBLE) /
             |               CAST(sp + (64 - nb) * 36028797018963968 AS DOUBLE), 4) AS est_union
             |       FROM usk)
             |SELECT p.ga, p.gb, p.est_a, p.est_b, ue.est_union,
             |       round(greatest(CAST(0 AS DOUBLE), p.est_a + p.est_b - ue.est_union), 4)
             |         AS est_inter
             |FROM p JOIN ue USING (ga, gb)
             |ORDER BY ga, gb""".stripMargin)),

    // ---- Count-min heavy hitters: top-20 tokens' exact counts next to
    // their 4×256 sketch estimates.
    "q65_cms_heavy_hitters" -> QueryDef(
      (s, dir) => {
        val toks = table(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
        Sketches.cmsHeavyHitters(toks, "token", d = 4, w = 256, k = 20)
          .orderBy("token")
      },
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
             |tk AS (SELECT token FROM toks WHERE token <> ''),
             |rows_ AS (SELECT unnest(range(0, 4)) AS r),
             |sk AS (SELECT r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token), 1, 12) AS BIGINT) % 256 AS c,
             |              count(*) AS cnt
             |       FROM tk, rows_ GROUP BY 1, 2),
             |ex AS (SELECT token, count(*) AS n_exact FROM tk GROUP BY 1
             |       ORDER BY n_exact DESC, token LIMIT 20),
             |cand AS (SELECT token, n_exact, r,
             |                CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token), 1, 12) AS BIGINT) % 256 AS c
             |         FROM ex, rows_)
             |SELECT token, n_exact, CAST(min(cnt) AS BIGINT) AS cm_estimate
             |FROM cand JOIN sk USING (r, c)
             |GROUP BY 1, 2 ORDER BY token""".stripMargin)),

    // ---- Deterministic weighted sample: 50 docs, weight-biased toward
    // large n_chars (priority = hash/weight; not exact ∝-weight
    // Efraimidis–Spirakis sampling, which would need libm's pow/ln)
    "q66_weighted_sample" -> QueryDef(
      (s, dir) => {
        Sketches.weightedSample(table(s, dir, "documents"), "doc_id", "n_chars", 50)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars, sample_hash FROM (
             |  SELECT doc_id, n_chars,
             |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS sample_hash
             |  FROM documents WHERE n_chars > 0
             |  ORDER BY CAST(sample_hash AS DOUBLE) / CAST(n_chars AS DOUBLE), doc_id
             |  LIMIT 50)
             |ORDER BY doc_id""".stripMargin)),

    // ---- Benchmark-contamination check: train docs sharing any word
    // trigram with a benchmark doc (doc_id % 97 = 0), with the count.
    "q67_contamination" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
        TextAnalysis.crossNgramOverlap(
            docs.filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0),
            "doc_id", "text", n = 3, minShared = 1L)
          .orderBy("train_doc", "bench_doc")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |g AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS i, ws FROM w),
             |sh AS (SELECT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' || ws[CAST(i+2 AS INT)] AS s FROM g),
             |b AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 97 = 0),
             |t AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
             |SELECT t.doc_id AS train_doc, b.doc_id AS bench_doc, count(*) AS n_shared
             |FROM t JOIN b ON t.s = b.s
             |GROUP BY 1, 2 ORDER BY train_doc, bench_doc""".stripMargin)),

    // ---- Per-dimension embedding mean/std from exact integer sums
    "q68_embed_dim_stats" -> QueryDef(
      (s, dir) => {
        Similarity.dimStats(table(s, dir, "embeddings"), "embedding")
          .orderBy("dim")
      },
      Some("""WITH e AS (SELECT generate_subscripts(embedding, 1) AS sub, unnest(embedding) AS x
             |           FROM embeddings),
             |sc AS (SELECT CAST(sub - 1 AS BIGINT) AS dim,
             |              CAST(round(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT) AS scaled
             |       FROM e),
             |a AS (SELECT dim, count(*) AS n,
             |             CAST(sum(CAST(scaled AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
             |             CAST(sum(CAST(scaled AS DECIMAL(38,0)) * CAST(scaled AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
             |      FROM sc GROUP BY dim)
             |SELECT dim, n,
             |  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 10000000.0, 4) AS mean,
             |  round(sqrt(greatest(
             |          CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) -
             |          (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)),
             |          0.0)) / 10000000.0, 4) AS std
             |FROM a ORDER BY dim""".stripMargin)))
}
