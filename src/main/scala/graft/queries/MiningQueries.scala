package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Sources.table
import graft.dedup.Dedup
import graft.ops.Exprs
import graft.sim.Similarity
import graft.text.TextAnalysis

/**
 * Round-6 frontier operators: Pareto/skyline extraction, margin-based
 * bitext mining, exact shared-span measurement on near-dup candidates,
 * sketch-certified quantiles, mean-shift changepoint detection,
 * deterministic negative sampling for contrastive training, and robust
 * (trimmed/winsorized) statistics. Reference analog: none (SURVEY.md
 * §2.1 — the reference is a reporting app); these extend the engine the
 * way the dedup/ANN family does. Every arithmetic step is replayed by
 * the DuckDB oracle: integer-micro scores, picked-element order
 * statistics, md5-derived sampling keys, and `CAST(x AS DOUBLE)`
 * spellings wherever a fraction must multiply a count so both engines
 * run the identical IEEE-double expression.
 */
object MiningQueries {

  // ------------------------------------------------------------- skyline

  /** 2-D Pareto frontier (skyline) of orders on (minimize price,
   * minimize date): every order not STRICTLY dominated (a.price <
   * b.price AND a.date < b.date) survives. The oracle is the textbook
   * NOT EXISTS anti-join; this side never runs the quadratic form —
   * phase 1 prunes with a constant-size price-bucket table (bucket =
   * price div 1000, so the table is bounded by the price RANGE, not the
   * row count; broadcast) whose strictly-earlier-bucket running min
   * dominates away almost every row, and phase 2 runs the exact
   * strictly-smaller-price check over the tiny survivor set. Pruning is
   * sound because strict dominance is transitive (every pruned row has
   * an explicit dominator; every skyline row survives phase 1), so the
   * survivor-only exact pass equals the full-set skyline. The phase-2
   * window is single-partition BY DESIGN: it runs post-prune over
   * O(skyline + bucket ties) rows, never over the fact table. */
  val q201Skyline: Q = Q("q201_skyline",
    """WITH o AS (SELECT o_orderkey AS okey, o_totalprice AS price,
                         CAST(o_orderdate AS DATE) AS d FROM orders
                  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL)
       SELECT CAST(b.okey AS BIGINT) AS okey, b.price AS price,
              strftime(b.d, '%Y-%m-%d') AS order_date
       FROM o b
       WHERE NOT EXISTS (SELECT 1 FROM o a
                         WHERE a.price < b.price AND a.d < b.d)
       ORDER BY okey""") { (s, d) =>
    // null coords gated on BOTH sides: a null date would be "never
    // dominated" under the oracle's NULL comparison but pruned by the
    // phase-1 prevmin >= d filter here
    val o = table(s, d, "orders")
      .filter(col("o_totalprice").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_orderkey").as("okey"),
        col("o_totalprice").as("price"), to_date(col("o_orderdate")).as("d"))
    val pbExpr = floor(col("price") / 1000).cast("long")
    val bmin = o.groupBy(pbExpr.as("pb")).agg(min("d").as("dmin"))
    val wb = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, -1)
    val bpre = bmin.withColumn("prevmin", min("dmin").over(wb))
      .select(col("pb"), col("prevmin"))
    val surv = o.withColumn("pb", pbExpr)
      .join(broadcast(bpre), Seq("pb"), "left")
      .filter(col("prevmin").isNull || col("prevmin") >= col("d"))
      .localCheckpoint() // tiny post-prune set; phase 2 reads it twice
    val byPrice = surv.groupBy("price").agg(min("d").as("dp"))
    val wp = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    val pm = byPrice.withColumn("m", min("dp").over(wp))
      .select(col("price"), col("m"))
    surv.join(broadcast(pm), Seq("price"))
      .filter(col("m").isNull || col("m") >= col("d"))
      .select(col("okey"), col("price"),
        date_format(col("d"), "yyyy-MM-dd").as("order_date"))
      .orderBy("okey")
  }

  // ------------------------------------------------------- bitext mining

  /** Margin-based bitext mining (the Artetxe–Schwenk shape a parallel-
   * corpus builder runs): for each English anchor (bounded id slice —
   * constant absolute probe size at any corpus scale), the best Spanish
   * neighbor is accepted only when its cosine clearly beats the
   * runner-up (s1 >= 1.05 * s2, integer-micro compare — no float
   * boundary) and clears an absolute floor. The anchor side is
   * broadcast ([[Similarity.bruteForceTopK]]: BroadcastNestedLoop, no
   * cartesian shuffle); the full-corpus scale path is q59's banded
   * hyperplane LSH feeding the same margin test. */
  val q202BitextMining: Q = {
    import graft.queries.TextQueries.unitCte
    Q("q202_bitext_mining",
      s"""WITH $unitCte,
        wl AS (SELECT u.vec_id, dd.lang, u.u
               FROM u JOIN documents dd ON dd.doc_id = u.vec_id),
        sc AS (SELECT q.vec_id AS en_id, c.vec_id AS es_id,
                      CAST(round(round(list_dot_product(q.u, c.u), 4)*1000000) AS BIGINT) AS sm
               FROM wl q JOIN wl c ON q.lang = 'en' AND c.lang = 'es'
               WHERE q.vec_id < 300),
        r AS (SELECT en_id, es_id, sm,
                     row_number() OVER (PARTITION BY en_id ORDER BY sm DESC, es_id) AS rk
              FROM sc),
        t AS (SELECT en_id,
                     max(CASE WHEN rk = 1 THEN es_id END) AS es_id,
                     max(CASE WHEN rk = 1 THEN sm END) AS s1_micro,
                     max(CASE WHEN rk = 2 THEN sm END) AS s2_micro
              FROM r WHERE rk <= 2 GROUP BY en_id)
        SELECT CAST(en_id AS BIGINT) AS en_id, CAST(es_id AS BIGINT) AS es_id,
               s1_micro, s2_micro
        FROM t WHERE s1_micro*100 >= s2_micro*105 AND s1_micro >= 100000
        ORDER BY en_id""") { (s, d) =>
      val docs = table(s, d, "documents").select(col("doc_id"), col("lang"))
      val emb = table(s, d, "embeddings")
      val wl = emb.join(docs, col("vec_id") === col("doc_id")).drop("doc_id")
      val en = wl.filter(col("lang") === "en" && col("vec_id") < 300)
      val es = wl.filter(col("lang") === "es")
      Similarity.bruteForceTopK(en, es, k = 2)
        .withColumn("sm", round(col("sim") * 1e6).cast("long"))
        .groupBy(col("qid").as("en_id"))
        .agg(max(when(col("rank") === 1, col("nid"))).as("es_id"),
          max(when(col("rank") === 1, col("sm"))).as("s1_micro"),
          max(when(col("rank") === 2, col("sm"))).as("s2_micro"))
        .filter(col("s1_micro") * 100 >= col("s2_micro") * 105 &&
          col("s1_micro") >= 100000)
        .orderBy("en_id")
    }
  }

  // ------------------------------------------------------- shared spans

  /** Exact longest-shared-token-run per MinHash candidate pair (the Lee
   * et al. exact-substring check a dedup pipeline runs AFTER candidate
   * generation): positional 3-shingle hashes are joined within each
   * candidate pair, runs of consecutive matching positions at a fixed
   * offset are measured with the islands trick (pos - row_number is
   * constant inside a run), and the pair's span is the longest run + 2
   * tokens. Candidates with zero shared shingles keep span 0 via the
   * left join (the q123 lesson). Scale: the positional-shingle table is
   * semi-join pruned to candidate members first, the match join is
   * keyed on (doc, shingle-hash) — never all-pairs, never unkeyed. */
  val q203SharedSpan: Q = {
    import graft.queries.TextQueries.minhashPairCtes
    Q("q203_shared_span",
      s"""WITH $minhashPairCtes,
        mem AS (SELECT DISTINCT doc_id FROM
                  (SELECT i AS doc_id FROM pairs UNION ALL SELECT j FROM pairs)),
        ps0 AS (SELECT doc_id, w, unnest(range(1, len(w)-1)) AS pos
                FROM tok JOIN mem USING (doc_id) WHERE len(w) >= 3),
        ps AS (SELECT doc_id, pos,
                      ('0x'||substr(md5(w[pos]||' '||w[pos+1]||' '||w[pos+2]),1,15))::BIGINT AS h
               FROM ps0),
        m AS (SELECT p.i, p.j, a.pos AS pa, b.pos AS pb
              FROM pairs p
              JOIN ps a ON a.doc_id = p.i
              JOIN ps b ON b.doc_id = p.j AND b.h = a.h),
        r AS (SELECT i, j, pb - pa AS off, pa,
                     pa - row_number() OVER (PARTITION BY i, j, pb - pa ORDER BY pa) AS grp
              FROM m),
        runs AS (SELECT i, j, count(*) AS rl FROM r GROUP BY i, j, off, grp),
        sp AS (SELECT i, j, max(rl) + 2 AS st FROM runs GROUP BY i, j)
        SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
               CAST(coalesce(sp.st, 0) AS BIGINT) AS span_tokens
        FROM pairs p LEFT JOIN sp ON sp.i = p.i AND sp.j = p.j
        ORDER BY i, j""") { (s, d) =>
      val docs = table(s, d, "documents")
      val pairs = Dedup.minhashCandidates(
          docs.filter(size(TextAnalysis.tokens(col("text"))) >= 3))
        .select("i", "j").localCheckpoint()
      val members = pairs.select(col("i").as("doc_id"))
        .unionByName(pairs.select(col("j").as("doc_id"))).distinct()
      val ps = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 3)
        .join(members, Seq("doc_id"), "left_semi")
        .withColumn("pos", explode(sequence(lit(1), size(col("w")) - 2)))
        .select(col("doc_id"), col("pos"),
          Exprs.md5Long(concat_ws(" ",
            element_at(col("w"), col("pos")),
            element_at(col("w"), col("pos") + 1),
            element_at(col("w"), col("pos") + 2))).as("h"))
        .localCheckpoint() // one tokenize pass feeds both join sides
      val m = pairs
        .join(ps.select(col("doc_id").as("i"), col("pos").as("pa"), col("h")),
          Seq("i"))
        .join(ps.select(col("doc_id").as("j"), col("pos").as("pb"), col("h")),
          Seq("j", "h"))
      val runs = m.withColumn("off", col("pb") - col("pa"))
        .withColumn("grp", col("pa") - row_number().over(
          Window.partitionBy("i", "j", "off").orderBy("pa")))
        .groupBy("i", "j", "off", "grp").agg(count(lit(1)).as("rl"))
      val spans = runs.groupBy("i", "j").agg((max("rl") + 2).as("st"))
      pairs.join(spans, Seq("i", "j"), "left")
        .select(col("i"), col("j"),
          coalesce(col("st"), lit(0L)).cast("long").as("span_tokens"))
        .orderBy("i", "j")
    }
  }

  // ------------------------------------------- sketch-certified quantiles

  /** Quantile sketch with an oracle-checked certification: per event
   * type, exact PICKED p50/p90/p99 (element at rank floor(q*(n-1))+1 —
   * replayable order statistics) plus booleans asserting Spark's
   * GK-sketch `percentile_approx(accuracy=1000)` landed within its
   * published rank-error envelope (±2n/1000+1 ranks, read off the same
   * ranked pass). At 100 TB only the one-pass mergeable sketch runs;
   * this query IS the certification that its bound holds. Fraction
   * arithmetic is spelled CAST(q AS DOUBLE)*(n-1) on both engines so
   * the rank computation is the identical IEEE expression. */
  val q204QuantileSketch: Q = Q("q204_quantile_sketch",
    """WITH e AS (SELECT event_type, event_id, value FROM events
                  WHERE value IS NOT NULL),
       r AS (SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM e),
       g AS (SELECT event_type, n,
               max(CASE WHEN rn = CAST(floor(CAST(0.5 AS DOUBLE)*(n-1)) AS BIGINT)+1 THEN value END) AS p50,
               max(CASE WHEN rn = CAST(floor(CAST(0.9 AS DOUBLE)*(n-1)) AS BIGINT)+1 THEN value END) AS p90,
               max(CASE WHEN rn = CAST(floor(CAST(0.99 AS DOUBLE)*(n-1)) AS BIGINT)+1 THEN value END) AS p99
             FROM r GROUP BY event_type, n)
       SELECT event_type, CAST(n AS BIGINT) AS n, p50, p90, p99,
              TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
       FROM g ORDER BY event_type""") { (s, d) =>
    val ev = table(s, d, "events").filter(col("value").isNotNull)
    val wT = Window.partitionBy("event_type")
    val ranked = ev
      .withColumn("rn", row_number().over(wT.orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(wT))
    def rk(q: Double) = floor(lit(q).cast("double") * (col("n") - 1)) + 1
    val delta = ceil(col("n") * 2.0 / 1000).cast("long") + 1
    def pick(r: org.apache.spark.sql.Column, as: String) =
      max(when(col("rn") === r, col("value"))).as(as)
    val ex = ranked.groupBy(col("event_type"), col("n")).agg(
      pick(rk(0.5), "p50"), pick(rk(0.9), "p90"), pick(rk(0.99), "p99"),
      pick(greatest(rk(0.5) - delta, lit(1L)), "lo50"),
      pick(least(rk(0.5) + delta, col("n")), "hi50"),
      pick(greatest(rk(0.9) - delta, lit(1L)), "lo90"),
      pick(least(rk(0.9) + delta, col("n")), "hi90"),
      pick(greatest(rk(0.99) - delta, lit(1L)), "lo99"),
      pick(least(rk(0.99) + delta, col("n")), "hi99"))
    val ap = ev.groupBy("event_type").agg(percentile_approx(col("value"),
      array(lit(0.5), lit(0.9), lit(0.99)), lit(1000)).as("ap"))
    def okCol(i: Int, lo: String, hi: String) =
      (element_at(col("ap"), i) >= col(lo) && element_at(col("ap"), i) <= col(hi))
    ex.join(broadcast(ap), "event_type")
      .select(col("event_type"), col("n").cast("long").as("n"),
        col("p50"), col("p90"), col("p99"),
        okCol(1, "lo50", "hi50").as("ok50"),
        okCol(2, "lo90", "hi90").as("ok90"),
        okCol(3, "lo99", "hi99").as("ok99"))
      .orderBy("event_type")
  }

  // ------------------------------------------------- changepoint detection

  /** Mean-shift changepoint (binary-segmentation step) per event type:
   * over the daily-count series, every split point scores the absolute
   * gap between the prefix and suffix mean (exact integer milli-counts
   * from BIGINT prefix sums — `div` floor on non-negative operands
   * matches DuckDB `//`), and the argmax split (earliest day on ties)
   * is the detected drift point. All windows are partitioned by type
   * over the bounded day spine — nothing scales with raw row count
   * after the first groupBy. */
  val q205Changepoint: Q = Q("q205_changepoint",
    """WITH dc AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                          count(*) AS x
                   FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
       w AS (SELECT event_type, day, x,
               sum(x) OVER (PARTITION BY event_type ORDER BY day) AS cum,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
               sum(x) OVER (PARTITION BY event_type) AS s,
               count(*) OVER (PARTITION BY event_type) AS tt
             FROM dc),
       sc AS (SELECT event_type, day,
                (cum*1000) // t AS pre_milli,
                ((s-cum)*1000) // (tt-t) AS post_milli
              FROM w WHERE t < tt),
       b AS (SELECT event_type, day, pre_milli, post_milli,
               abs(pre_milli - post_milli) AS score_milli,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY abs(pre_milli - post_milli) DESC, day) AS rk
             FROM sc)
       SELECT event_type, day AS split_day,
              CAST(score_milli AS BIGINT) AS score_milli,
              CAST(pre_milli AS BIGINT) AS pre_milli,
              CAST(post_milli AS BIGINT) AS post_milli
       FROM b WHERE rk = 1 ORDER BY event_type""") { (s, d) =>
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
    val sc = table(s, d, "events").filter(col("ts").isNotNull)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("cum",
        sum("x").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t", row_number().over(wOrd))
      .withColumn("s", sum("x").over(wAll))
      .withColumn("tt", count(lit(1)).over(wAll))
      .filter(col("t") < col("tt"))
      .withColumn("pre_milli", expr("(cum*1000) div t"))
      .withColumn("post_milli", expr("((s-cum)*1000) div (tt-t)"))
      .withColumn("score_milli", abs(col("pre_milli") - col("post_milli")))
    sc.withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("score_milli").desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("score_milli"), col("pre_milli"), col("post_milli"))
      .orderBy("event_type")
  }

  // ------------------------------------------------- negative sampling

  /** Deterministic negative sampling for contrastive training: per
   * anchor (bounded id slice, broadcast), candidates must carry a
   * DIFFERENT label and sit below a similarity ceiling (true negatives,
   * not unlabeled near-dups), and the 5 picks per anchor follow the
   * md5(anchor_seed) order — the seeded-shuffle trick (q28/q102) that
   * makes "random" sampling reproducible at any partitioning. One
   * corpus scan; the pair pass is anchor-bounded, never quadratic. */
  val q206NegativeSampling: Q = {
    import graft.queries.TextQueries.unitCte
    Q("q206_negative_sampling",
      s"""WITH $unitCte,
        l AS (SELECT u.vec_id, u.u, e.label FROM u
              JOIN embeddings e USING (vec_id)),
        a AS (SELECT vec_id AS aid, u AS au, label AS al FROM l WHERE vec_id < 100),
        sc AS (SELECT a.aid, c.vec_id AS nid,
                      CAST(round(round(list_dot_product(a.au, c.u), 4)*1000000) AS BIGINT) AS sim_micro,
                      md5(CAST(a.aid AS VARCHAR)||'_'||CAST(c.vec_id AS VARCHAR)) AS hk
               FROM a JOIN l c ON c.label <> a.al),
        f AS (SELECT aid, nid, sim_micro,
                     row_number() OVER (PARTITION BY aid ORDER BY hk, nid) AS pick_rank
              FROM sc WHERE sim_micro < 200000)
        SELECT CAST(aid AS BIGINT) AS anchor_id, CAST(nid AS BIGINT) AS neg_id,
               CAST(pick_rank AS BIGINT) AS pick_rank, sim_micro
        FROM f WHERE pick_rank <= 5 ORDER BY anchor_id, pick_rank""") { (s, d) =>
      val u = Similarity.withUnitVec(table(s, d, "embeddings"), "embedding", "u")
        .select(col("vec_id"), col("label"), col("u")).localCheckpoint()
      val a = u.filter(col("vec_id") < 100)
        .select(col("vec_id").as("aid"), col("label").as("al"), col("u").as("au"))
      val w = Window.partitionBy("aid").orderBy(col("hk"), col("vec_id"))
      u.crossJoin(broadcast(a)).filter(col("label") =!= col("al"))
        .withColumn("sim_micro",
          round(round(Similarity.dot(col("au"), col("u")), 4) * 1e6).cast("long"))
        .filter(col("sim_micro") < 200000)
        .withColumn("hk", md5(concat(col("aid").cast("string"), lit("_"),
          col("vec_id").cast("string"))))
        .withColumn("pick_rank", row_number().over(w).cast("long"))
        .filter(col("pick_rank") <= 5)
        .select(col("aid").as("anchor_id"), col("vec_id").as("neg_id"),
          col("pick_rank"), col("sim_micro"))
        .orderBy("anchor_id", "pick_rank")
    }
  }

  // ---------------------------------------------------- robust statistics

  /** Trimmed + winsorized means per event type over integer-micro
   * values: picked p10/p90 thresholds from one ranked pass, trimmed
   * mean over the inner rank band, winsorized mean in CLOSED FORM
   * ((r10-1)·v10 + inner sum + (n-r90)·v90 — no second clamp scan).
   * All sums are BIGINT-exact at any partitioning; divisions are
   * floor-on-non-negative so Spark `div` ≡ DuckDB `//`. */
  val q207TrimmedStats: Q = Q("q207_trimmed_stats",
    """WITH e AS (SELECT event_type, event_id,
                         CAST(round(value*1000000) AS BIGINT) AS vm
                  FROM events WHERE value IS NOT NULL),
       r AS (SELECT event_type, vm,
               row_number() OVER (PARTITION BY event_type ORDER BY vm, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM e),
       g AS (SELECT event_type, n,
               CAST(floor(CAST(0.1 AS DOUBLE)*(n-1)) AS BIGINT)+1 AS r10,
               CAST(floor(CAST(0.9 AS DOUBLE)*(n-1)) AS BIGINT)+1 AS r90,
               sum(vm) AS sv,
               max(CASE WHEN rn = CAST(floor(CAST(0.1 AS DOUBLE)*(n-1)) AS BIGINT)+1 THEN vm END) AS p10,
               max(CASE WHEN rn = CAST(floor(CAST(0.9 AS DOUBLE)*(n-1)) AS BIGINT)+1 THEN vm END) AS p90,
               sum(CASE WHEN rn >= CAST(floor(CAST(0.1 AS DOUBLE)*(n-1)) AS BIGINT)+1
                         AND rn <= CAST(floor(CAST(0.9 AS DOUBLE)*(n-1)) AS BIGINT)+1
                        THEN vm ELSE 0 END) AS tsum
             FROM r GROUP BY event_type, n)
       SELECT event_type, CAST(n AS BIGINT) AS n,
              p10 AS p10_micro, p90 AS p90_micro,
              CAST(sv // n AS BIGINT) AS mean_micro,
              CAST(tsum // (r90 - r10 + 1) AS BIGINT) AS trimmed_mean_micro,
              CAST(((r10-1)*p10 + tsum + (n - r90)*p90) // n AS BIGINT) AS winsor_mean_micro
       FROM g ORDER BY event_type""") { (s, d) =>
    val wT = Window.partitionBy("event_type")
    val ranked = table(s, d, "events").filter(col("value").isNotNull)
      .withColumn("vm", round(col("value") * 1e6).cast("long"))
      .withColumn("rn", row_number().over(wT.orderBy(col("vm"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(wT))
    def rk(q: Double) = floor(lit(q).cast("double") * (col("n") - 1)).cast("long") + 1
    ranked.groupBy(col("event_type"), col("n")).agg(
        sum("vm").as("sv"),
        max(when(col("rn") === rk(0.1), col("vm"))).as("p10_micro"),
        max(when(col("rn") === rk(0.9), col("vm"))).as("p90_micro"),
        sum(when(col("rn") >= rk(0.1) && col("rn") <= rk(0.9), col("vm"))
          .otherwise(0L)).as("tsum"))
      .withColumn("r10", rk(0.1))
      .withColumn("r90", rk(0.9))
      .select(col("event_type"), col("n").cast("long").as("n"),
        col("p10_micro"), col("p90_micro"),
        expr("sv div n").as("mean_micro"),
        expr("tsum div (r90 - r10 + 1)").as("trimmed_mean_micro"),
        expr("((r10-1)*p10_micro + tsum + (n - r90)*p90_micro) div n")
          .as("winsor_mean_micro"))
      .orderBy("event_type")
  }

  // ------------------------------------------ prefix-filter similarity join

  /** EXACT set-similarity self-join (Jaccard ≥ 0.5 over distinct token
   * sets) via prefix filtering — the AllPairs/SSJoin algorithm, the
   * deterministic complement to MinHash: order each doc's tokens by
   * ascending corpus frequency and index only the first
   * s − ceil(t·s) + 1 (any qualifying pair MUST share a prefix token
   * under a global order, so recall is 1.0 by construction, not with
   * probability). Candidates equi-join on prefix tokens (the RAREST
   * tokens — selective by design), then exact intersection sizes run
   * only on candidates; the threshold is the integer test
   * 19·|A∩B| ≥ 9·(|A|+|B|) (⇔ J ≥ 0.9), no float anywhere. The oracle is
   * the INDEPENDENT quadratic definition (with the sound size filter
   * 3·min ≥ sa+sb), so completeness of the prefix scheme is
   * hash-checked, not assumed. Scale: vocab-sized frequency table,
   * per-doc windows, token-keyed candidate join — never all-pairs. */
  val q208SetsimJoin: Q = Q("q208_setsim_join",
    """WITH tokd AS (SELECT doc_id,
            list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS ts
          FROM documents),
       sz AS (SELECT doc_id, ts, len(ts) AS s FROM tokd),
       p AS (SELECT a.doc_id AS i, b.doc_id AS j, a.s AS sa, b.s AS sb,
                    len(list_intersect(a.ts, b.ts)) AS inter
             FROM sz a JOIN sz b
               ON a.doc_id < b.doc_id AND 19*least(a.s, b.s) >= 9*(a.s + b.s))
       SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
              CAST(inter AS BIGINT) AS inter_n,
              CAST(sa + sb - inter AS BIGINT) AS union_n
       FROM p WHERE 19*inter >= 9*(sa + sb)
       ORDER BY i, j""") { (s, d) =>
    import org.apache.spark.sql.graft.ColumnBridge
    // token sets as SORTED 60-bit hash arrays: the candidate explosion on
    // a templated corpus makes the verify pass the whole cost, so every
    // per-pair comparison must be a primitive-long merge (native
    // SortedLongIntersectCount), not a per-row string hash set. Exact
    // modulo 60-bit collisions (~|vocab|²/2⁶¹); the string-based oracle
    // hash-checks that no collision bites.
    val hashed = ColumnBridge.column(graft.functions.Md5LongArray(
      ColumnBridge.expression(TextAnalysis.tokens(col("text")))))
    val tokSets = table(s, d, "documents")
      .select(col("doc_id"), array_sort(array_distinct(hashed)).as("hs"))
      .withColumn("s", size(col("hs")))
      .localCheckpoint() // feeds frequency count, prefix build, and verify
    val ex = tokSets.select(col("doc_id"), col("s"), explode(col("hs")).as("h"))
    val freq = ex.groupBy("h").agg(count(lit(1)).as("cf"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("cf"), col("h"))
    val prefix = ex.join(freq, "h")
      .withColumn("r", row_number().over(wDoc))
      .filter(col("r") <= col("s") - ceil(col("s") * 0.9).cast("long") + 1)
      .select(col("doc_id"), col("h"), col("s"), col("r"))
    val cand = prefix
      .select(col("doc_id").as("i"), col("h"), col("s").as("sa"), col("r").as("ra"))
      .join(prefix
        .select(col("doc_id").as("j"), col("h"), col("s").as("sb"), col("r").as("rb")),
        Seq("h"))
      .filter(col("i") < col("j"))
      // sound prunes (no qualifying pair removed): size compatibility
      // (I ≤ min ⇒ 19·min ≥ 9·(sa+sb)) and the PPJoin positional bound
      // (overlap ≤ min(sa−ra, sb−rb) + 1 at a matching prefix position)
      .filter(least(col("sa"), col("sb")) * 19 >= (col("sa") + col("sb")) * 9)
      .filter((least(col("sa") - col("ra"), col("sb") - col("rb")) + 1) * 19 >=
        (col("sa") + col("sb")) * 9)
      .select("i", "j").distinct()
    val interCol = ColumnBridge.column(graft.functions.SortedLongIntersectCount(
      ColumnBridge.expression(col("ha")), ColumnBridge.expression(col("hb"))))
    cand
      .join(tokSets.select(col("doc_id").as("i"), col("hs").as("ha"), col("s").as("sa")), Seq("i"))
      .join(tokSets.select(col("doc_id").as("j"), col("hs").as("hb"), col("s").as("sb")), Seq("j"))
      .withColumn("inter", interCol)
      .filter(col("inter") * 19 >= (col("sa") + col("sb")) * 9)
      .select(col("i"), col("j"), col("inter").cast("long").as("inter_n"),
        (col("sa") + col("sb") - col("inter")).cast("long").as("union_n"))
      .orderBy("i", "j")
  }

  val all: Seq[Q] = Seq(q201Skyline, q202BitextMining, q203SharedSpan,
    q204QuantileSketch, q205Changepoint, q206NegativeSampling,
    q207TrimmedStats, q208SetsimJoin)
}
