package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Exprs

/**
 * Mergeable summary sketches for approximate query processing at scale,
 * built on the engine's replayable 60-bit md5 hash ([[Exprs.md5Long]])
 * so every estimate is bit-reproducible in any engine — estimates use
 * INTEGER arithmetic only (`div`, not float division). The one
 * documented exception to the no-libm rule is [[distributionProfile]]'s
 * entropy term: `ln` is unavoidable there, so each term is quantized to
 * integer micro-nats before the sum — aggregation-order-proof, though a
 * term landing within an ULP of a rounding boundary could in principle
 * differ across runtimes (same accepted trade as BM25/PMI/surprisal).
 *
 * Scale shape (the reason sketches exist at 100 TB): each operator's
 * state is FIXED-SIZE per group — k hashes (KMV), d×w cells (count-min),
 * m bits (Bloom) — so the shuffle carries sketch cells, not raw keys,
 * and sketches from disjoint partitions/days merge associatively
 * (min-of-k ∪ min-of-k, cell-wise +, bit OR). The exact pre-aggregates
 * here (distinct, groupBy) all benefit from map-side partial
 * aggregation; nothing materializes the raw key universe on one node.
 */
object Sketches {

  /** The KMV scale: hashes are uniform on [0, 2^60). */
  val HashSpace: Long = 1L << 60

  /**
   * K-minimum-values (KMV / bottom-k) distinct-count sketch, one row per
   * group: the k smallest distinct key hashes, the k-th smallest `theta`,
   * and the classic unbiased estimate `(k-1) / (theta / 2^60)` computed
   * as integer `(2^60 div theta) * (k-1)`.
   *
   * Returns (groupCols*, n_kept, theta, est_distinct). Groups with fewer
   * than k distinct keys report their EXACT count (n_kept < k) and
   * est_distinct = n_kept.
   */
  def kmvDistinct(df: DataFrame, key: Column, groupCols: Seq[String],
                  k: Int): DataFrame = {
    val grp = groupCols.map(col)
    // null keys are excluded: count(DISTINCT key) ignores them, their
    // hash is null (which Spark sorts FIRST asc but DuckDB LAST — a
    // cross-engine divergence), and a null in a bottom-k slot would
    // shift theta
    val hashed = df.filter(key.isNotNull)
      .select((grp :+ Exprs.md5Long(key).as("h")): _*).distinct()
    // two-phase bottom-k: per-(group, scan-partition) heads first, so a
    // hot group never funnels ALL its distinct hashes through one task —
    // min-k of per-partition min-k's equals the global min-k (the same
    // set algebra the streaming KMV fold relies on). The distinct above
    // already spread each group hash-uniformly across partitions.
    val wPart = Window.partitionBy((grp :+ col("__pid")): _*)
      .orderBy(col("h").asc)
    val partial = hashed
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rk", row_number().over(wPart))
      .filter(col("__rk") <= k)
      .drop("__pid", "__rk")
    val w = Window.partitionBy(grp: _*).orderBy(col("h").asc)
    partial
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("theta"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"($HashSpace div theta) * ${k - 1}")))
  }

  /**
   * Per-day KMV sketches merged over a trailing `window`-day sliding
   * window — THE mergeable-sketch use case: build bottom-k once per
   * day, then answer "distinct keys in the last N days ending at D"
   * for every D by re-ranking the union of ≤ window·k sketch hashes
   * (min-k of min-k's equals the global min-k). The window fan-out
   * ships ONLY sketch rows (≤ k per day per offset), never raw keys —
   * at 100 TB the daily sketches are a few KB each while the exact
   * sliding distinct would rescan the window's raw keys every day.
   *
   * Input: `dayIdx` an integer day number; only target days that
   * actually appear in the input are emitted (leading partial windows
   * included — n_kept < k reports the window's exact count, the
   * [[kmvDistinct]] contract). Returns
   * (td, n_kept, theta, est_distinct).
   */
  def kmvSlidingDistinct(df: DataFrame, key: Column, dayIdx: Column,
                         k: Int, window: Int): DataFrame = {
    require(window >= 1, s"kmvSlidingDistinct requires window >= 1 (got $window)")
    val hashed = df.filter(key.isNotNull && dayIdx.isNotNull)
      .select(dayIdx.cast("long").as("d"), Exprs.md5Long(key).as("h"))
      .distinct()
    val wDay = Window.partitionBy("d").orderBy(col("h").asc)
    val daily = hashed.withColumn("rk", row_number().over(wDay))
      .filter(col("rk") <= k).select("d", "h")
      .localCheckpoint() // day list + window fan-out both read it
    val days = daily.select(col("d").as("td")).distinct()
    val fan = daily
      .select(col("d"), col("h"),
        explode(expr(s"sequence(0, ${window - 1})")).as("off"))
      .select((col("d") + col("off")).as("td"), col("h"))
      .join(days, "td")
      .distinct() // the same key hash can enter through several days
    val wTd = Window.partitionBy("td").orderBy(col("h").asc)
    fan.withColumn("rk", row_number().over(wTd)).filter(col("rk") <= k)
      .groupBy("td")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("theta"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"($HashSpace div theta) * ${k - 1}")))
  }

  /**
   * KMV set-operation sketch over TWO keyed sets A and B (audience
   * overlap without exact distinct): take the k smallest hashes of
   * A ∪ B; within that sample count members of A, of B, and of both.
   * Because the bottom-k of the union is a uniform sample of the
   * distinct union, `n_both / k` is an unbiased Jaccard estimate —
   * reported as integer ppm alongside union/intersection size estimates
   * (inclusion–exclusion on the union estimate, all `div` arithmetic).
   *
   * Input: df with `key` and boolean columns `inA`/`inB` (a key may be
   * in both). One row out: (n_kept, theta, n_a, n_b, n_both,
   * est_union, est_intersection, jaccard_ppm).
   */
  def kmvSetOps(df: DataFrame, key: Column, inA: Column, inB: Column,
                k: Int): DataFrame = {
    // null keys excluded for the same reasons as [[kmvDistinct]]
    val sides = df.filter(key.isNotNull)
      .select(Exprs.md5Long(key).as("h"),
        inA.as("a"), inB.as("b"))
      .groupBy("h")
      .agg(max(col("a")).as("a"), max(col("b")).as("b"))
    // bottom-k via orderBy+limit = TakeOrdered (per-partition heads +
    // driver merge of k) — a global row_number window would move every
    // distinct hash to one partition
    sides.orderBy(col("h").asc).limit(k)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("theta"),
        count(when(col("a"), 1)).as("n_a"),
        count(when(col("b"), 1)).as("n_b"),
        count(when(col("a") && col("b"), 1)).as("n_both"))
      .withColumn("est_union",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"($HashSpace div theta) * ${k - 1}")))
      // n_kept = 0 (empty input) must report zeros, not divide by zero
      .withColumn("est_intersection",
        when(col("n_kept") === 0, lit(0L))
          .otherwise(expr("est_union * n_both div n_kept")))
      .withColumn("jaccard_ppm",
        when(col("n_kept") === 0, lit(0L))
          .otherwise(expr("n_both * 1000000 div n_kept")))
  }

  /** Row-d hash of a key into [0, width): `md5Long(key # d) mod width`. */
  /** The ONE '#'-salted hash-position contract both sketch families'
    * oracles replay: `md5long(key || '#j') mod width`. */
  private def saltedPos(key: Column, salt: Int, width: Int): Column =
    pmod(Exprs.md5Long(concat(key.cast("string"), lit("#" + salt))),
      lit(width.toLong))

  def cmPos(key: Column, d: Int, width: Int): Column = saltedPos(key, d, width)

  /**
   * Count-min sketch build: d×width cells, cell (d, pos) = total count
   * of keys whose row-d hash lands on pos. The sketch is the aggregate —
   * `groupBy(d, pos).sum` — so the shuffle carries ≤ d·width rows no
   * matter how many keys stream through; daily sketches merge cell-wise.
   */
  def countMinBuild(df: DataFrame, key: Column, depth: Int,
                    width: Int): DataFrame = {
    val rows = (0 until depth).map(d =>
      struct(lit(d).as("d"), cmPos(key, d, width).as("pos")))
    df.select(explode(array(rows: _*)).as("cell"))
      .groupBy(col("cell.d").as("d"), col("cell.pos").as("pos"))
      .agg(count(lit(1)).as("c"))
  }

  /**
   * Count-min point query: estimate = min over rows d of cell
   * (d, h_d(key)). The sketch side is tiny (≤ d·width rows) and is
   * BROADCAST — the probe never shuffles. Upward-biased by design
   * (collisions only add); `est >= exact` always. An absent cell counts
   * as 0 (left join + coalesce), so a key never seen by the build still
   * gets its correct estimate of 0 instead of vanishing.
   */
  def countMinQuery(sketch: DataFrame, probes: DataFrame, key: Column,
                    depth: Int, width: Int): DataFrame = {
    val withPos = (0 until depth).foldLeft(
      probes.withColumn("__k", key.cast("string"))) { (acc, d) =>
      acc.withColumn(s"__p$d", cmPos(col("__k"), d, width))
    }
    val joined = (0 until depth).foldLeft(withPos) { (acc, d) =>
      acc.join(
        broadcast(sketch.filter(col("d") === d)
          .select(col("pos").as(s"__p$d"), col("c").as(s"__cr$d"))),
        Seq(s"__p$d"), "left")
        .withColumn(s"__c$d", coalesce(col(s"__cr$d"), lit(0L)))
    }
    val est = least((0 until depth).map(d => col(s"__c$d")): _*)
    joined.withColumn("est", est)
      .drop(("__k" +: (0 until depth)
        .flatMap(d => Seq(s"__p$d", s"__c$d", s"__cr$d"))): _*)
  }

  /** Position of hash j of a key in an m-bit Bloom filter (same salted
    * contract as [[cmPos]] — shared [[saltedPos]]). */
  def bloomPos(key: Column, j: Int, m: Int): Column = saltedPos(key, j, m)

  /**
   * Bloom filter build: the m-bit array packed into m/64 long words
   * (word = pos div 64, mask = OR of 1 << (pos mod 64)) — at most m/64
   * rows out of any build-side cardinality, the per-partition bit OR
   * doing the compaction map-side.
   */
  def bloomBuild(df: DataFrame, key: Column, numHashes: Int,
                 m: Int): DataFrame = {
    val rows = (0 until numHashes).map(j => bloomPos(key, j, m))
    df.select(explode(array(rows: _*)).as("pos"))
      .select((col("pos") / 64).cast("long").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy("word")
      .agg(expr("bit_or(bit)").as("mask"))
  }

  /**
   * Bloom membership probe: `numHashes` BROADCAST equi-joins against the
   * ≤ m/64-row word table, testing one bit each — entirely map-side on
   * the probe, the idiomatic "pre-filter the big fact table before the
   * real join" shape (Spark's own runtime row-level bloom does exactly
   * this; here it is an explicit, composable operator). Adds boolean
   * `passCol`. Arithmetic right-shift is safe for bit 63: the sign fill
   * only touches bits above the one `& 1` keeps.
   */
  def bloomProbe(words: DataFrame, probe: DataFrame, key: Column,
                 numHashes: Int, m: Int, passCol: String): DataFrame = {
    val tagged = (0 until numHashes).foldLeft(probe) { (acc, j) =>
      val pos = bloomPos(key, j, m)
      acc.withColumn(s"__w$j", (pos / 64).cast("long"))
        .withColumn(s"__b$j", (pos % 64).cast("int"))
        .join(broadcast(words.select(col("word").as(s"__w$j"),
          col("mask").as(s"__m$j"))), Seq(s"__w$j"), "left")
        .withColumn(s"__hit$j",
          coalesce(expr(s"(shiftright(__m$j, __b$j) & 1) = 1"), lit(false)))
    }
    tagged
      .withColumn(passCol,
        (0 until numHashes).map(j => col(s"__hit$j")).reduce(_ && _))
      .drop((0 until numHashes)
        .flatMap(j => Seq(s"__w$j", s"__b$j", s"__m$j", s"__hit$j")): _*)
  }

  /**
   * Distribution concentration profile per group: Shannon entropy and
   * Gini impurity of the `value` histogram within each `groupCols` group.
   * Entropy is quantized PER TERM — `round(c * ln(n/c) / n * 1e6)` to
   * integer micro-nats BEFORE the sum — so the result is independent of
   * aggregation order; Gini is exact integer arithmetic throughout
   * (`1e6 - sum(c²)·1e6 div n²`). Two aggregates over the histogram —
   * both with map-side partials; state is bounded by distinct values
   * per group.
   *
   * Overflow headroom: `sum(c²)·1e6` stays inside a signed long while
   * every group has < ~3.0×10⁶ rows (worst case: all rows on one
   * value). For bigger groups, pre-aggregate the value domain into
   * buckets first — the profile of a bucketed histogram is the
   * standard recourse, same as an equi-depth histogram's.
   *
   * Returns (groupCols*, n, n_values, entropy_micro, gini_micro).
   */
  def distributionProfile(df: DataFrame, groupCols: Seq[String],
                          value: Column): DataFrame = {
    val grp = groupCols.map(col)
    val hist = df.select((grp :+ value.as("__v")): _*)
      .groupBy((grp :+ col("__v")): _*)
      .agg(count(lit(1)).as("c"))
    val withN = hist.withColumn("n",
      sum("c").over(Window.partitionBy(grp: _*)))
    withN
      .withColumn("ent_term",
        round(col("c") * log(col("n").cast("double") / col("c"))
          / col("n") * 1e6, 0).cast("long"))
      .groupBy(grp: _*)
      .agg(max("n").as("n"), count(lit(1)).as("n_values"),
        sum("ent_term").as("entropy_micro"),
        sum(col("c") * col("c")).as("ss"))
      .withColumn("gini_micro", expr("1000000 - ss * 1000000 div (n * n)"))
      .drop("ss")
  }

  // ------------------------------------------------- bottom-k quantiles

  /**
   * Mergeable bottom-k quantile sketch column
   * ([[graft.functions.BottomKSketchAgg]]): the k (hash, value) pairs
   * with smallest (hash, value), i.e. a deterministic uniform row
   * sample when `h` is a uniform row hash. Bounded memory per buffer,
   * map-side combined, persists as `array<struct<h,v>>` — the
   * percentile companion to the HLL register rollup: per-day sketches
   * merge by union-then-trim with no re-scan of raw events.
   */
  def bottomKSketch(h: Column, v: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BottomKSketchAgg(
      ColumnBridge.expression(h), ColumnBridge.expression(v), k)
      .toAggregateExpression())
  }

  /**
   * Merge persisted bottom-k sketches (`skCol`: array<struct<h,v>>,
   * `nCol`: rows summarized per sketch) into ONE global sample and
   * estimate picked-rank quantiles from it: explode the bounded sketch
   * rows, keep the global bottom-k by (h, v) — exactly the sketch the
   * whole corpus would have produced — and pick the sample element at
   * rank floor(q·(m−1))+1 per requested quantile. Input and state are
   * both O(#sketches · k); raw data is never touched. Returns one row
   * (n, m, q<1000q> ...) — e.g. q500 for the median.
   */
  def mergeBottomKQuantiles(sketches: DataFrame, skCol: Column, nCol: Column,
                            k: Int, qs: Seq[Double]): DataFrame = {
    val tot = sketches.agg(sum(nCol).as("n"))
    val samp = sketches
      .select(explode(skCol).as("e"))
      .select(col("e.h").as("h"), col("e.v").as("v"))
      .orderBy("h", "v").limit(k) // global bottom-k of the union
      .localCheckpoint() // bounded ≤ k rows; size + picks both read it
    val m = samp.agg(count(lit(1)).as("m"))
    val ranked = samp
      // membership is bottom-k by (h, v); the quantile pick ranks the
      // KEPT sample by VALUE (h as deterministic tiebreak)
      .withColumn("rn", row_number().over(
        Window.orderBy("v", "h")).cast("long")) // global but ≤ k rows
      .crossJoin(broadcast(m))
    val picks = qs.map { q =>
      max(when(col("rn") ===
        (floor(lit(q).cast("double") * (col("m") - 1)) + 1), col("v")))
        .as(s"q${(q * 1000).round}")
    }
    ranked.agg(max("m").as("m"), picks: _*)
      .crossJoin(broadcast(tot))
      .select(col("n") +: col("m") +:
        qs.map(q => col(s"q${(q * 1000).round}")): _*)
  }
}
