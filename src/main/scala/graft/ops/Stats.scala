package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact order-statistics and distribution-shape operators, all defined
 * so any engine reproduces them bit-for-bit: medians/percentiles are
 * PICKED elements (the value at a deterministic rank, never an
 * interpolated average), ratios are integer ppm, and every rank has a
 * total order (value, then tiebreak key).
 *
 * Scale shape: each operator is one window over the group key plus one
 * aggregate — the window shuffle is the only exchange, and the
 * aggregate's state per group is O(1). Nothing collects to the driver.
 */
object Stats {

  /** Lower median per group: the element at rank (n+1) div 2 in
   * (value, tiebreak) order — exact, no interpolation. Null values are
   * excluded up front (they sort FIRST under asc and would both shift
   * the rank and get picked as a "median"). Returns
   * (groupCols*, n, med). */
  def lowerMedian(df0: DataFrame, groupCols: Seq[String], value: Column,
                  tiebreak: Column): DataFrame = {
    val df = df0.filter(value.isNotNull)
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(value.asc, tiebreak.asc)
    df.withColumn("__v", value)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(grp: _*)))
      .groupBy(grp: _*)
      .agg(max("__n").as("n"),
        max(when(col("__rn") === expr("(__n + 1) div 2"), col("__v")))
          .as("med"))
  }

  /**
   * Robust outlier count per group via the median-absolute-deviation
   * rule: |v - median| > k × MAD, both medians exact lower medians.
   * Join-free: the median and the MAD are unbounded-partition window
   * maxes over the SAME group key, so the whole operator is one scan,
   * one hash exchange, and two in-partition sorts. Returns
   * (groupCols*, n, med, mad, n_outliers).
   */
  def madOutliers(df0: DataFrame, groupCols: Seq[String], value: Column,
                  tiebreak: Column, k: Int): DataFrame = {
    // nulls sort first and would corrupt both medians — exclude up front
    val df = df0.filter(value.isNotNull)
    val grp = groupCols.map(col)
    val wAll = Window.partitionBy(grp: _*)
    val wOrd = Window.partitionBy(grp: _*)
      .orderBy(col("__v").asc, col("__t").asc)
    val wOrd2 = Window.partitionBy(grp: _*)
      .orderBy(col("__d").asc, col("__t").asc)
    df.select((grp :+ value.as("__v") :+ tiebreak.as("__t")): _*)
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("med",
        max(when(col("__rn") === expr("(__n + 1) div 2"), col("__v")))
          .over(wAll))
      .withColumn("__d", abs(col("__v") - col("med")))
      .withColumn("__rn2", row_number().over(wOrd2))
      .withColumn("mad",
        max(when(col("__rn2") === expr("(__n + 1) div 2"), col("__d")))
          .over(wAll))
      .groupBy(grp: _*)
      .agg(max("__n").as("n"), max("med").as("med"), max("mad").as("mad"),
        count(when(col("__d") > col("mad") * k, 1)).as("n_outliers"))
  }

  /**
   * Quantile normalization: each row's value mapped to its empirical
   * quantile in ppm within its group — `(rank-1) * 1e6 div (n-1)` over
   * the (value, tiebreak) total order. The feature-scaling step that
   * makes heterogenous columns comparable; one window shuffle. Adds
   * `q_ppm`.
   *
   * SKEW CAVEAT (the [[acf]]/[[skewReport]] doc convention): the
   * per-group rank window is intrinsic to the operator's semantics —
   * every row needs its exact rank — so a single giant group serializes
   * its sort on one partition. Size groups accordingly (feature/metric
   * groups, not an id-free global normalize); for a rank-free
   * approximation at unbounded group sizes, map values through the
   * mergeable bottom-k quantile sketch ([[graft.sketch.Sketches]],
   * q257/q258) instead.
   */
  def quantileNormalize(df: DataFrame, groupCols: Seq[String],
                        value: Column, tiebreak: Column): DataFrame = {
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(value.asc, tiebreak.asc)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(grp: _*)))
      .withColumn("q_ppm",
        when(col("__n") === 1, 0L)
          .otherwise(expr("(__rn - 1) * 1000000 div (__n - 1)")))
      .drop("__rn", "__n")
  }

  /**
   * Group-size skew report for a prospective shuffle key: key count,
   * row count, the biggest key's share (ppm), picked p50/p90/p99 group
   * sizes (element at rank ceil(q·n_keys) in (size, key) order), and
   * `skew_ratio_ppm` = max_size / mean_size in ppm (1e6 = perfectly
   * balanced). THE pre-flight check before choosing a partition key at
   * 100 TB — and the key-count table it audits scales with DISTINCT
   * KEYS (billions for an id column), so rank-picking must never sort
   * it on one partition. Recipe: aggregate to a group-SIZE histogram
   * (`groupBy(c).count()` — bounded by distinct sizes, which grow like
   * √rows, not keys) and take each quantile by cumulative-weight walk:
   * the element at rank r in (size, key) order is min size with
   * cum_keys ≥ r, identical to the row_number pick, per-key sort
   * nowhere in the plan.
   */
  /**
   * PACF via Durbin–Levinson from ACF values `r(0)=ρ₁ .. r(p-1)=ρ_p`
   * (Box–Jenkins order identification: PACF(k) is the lag-k AR
   * coefficient with lags 1..k-1 partialled out; an AR(p) series cuts
   * off after lag p). Driver-side over the BOUNDED lag table — the
   * recursion is O(p²) on ≤ a handful of lags, never a corpus pass.
   * Arithmetic is strictly left-associated (num −= φ·ρ one term at a
   * time, v ← v·(1−φ²)) so an unrolled SQL replay with the same
   * association is bit-identical. A null ρ (empty series) or a zero
   * innovation variance (|ρ|=1 degenerate series) nulls that lag and
   * every later one, matching SQL null propagation through nullif.
   */
  def pacfFromAcf(r: Array[Option[Double]]): Array[Option[Double]] = {
    val p = r.length
    val a = Array.ofDim[Double](p + 1, p + 1)
    val out = Array.fill[Option[Double]](p)(None)
    var v = 1.0
    var dead = false
    var k = 1
    while (k <= p && !dead) {
      if (r(k - 1).isEmpty || v == 0.0) dead = true
      else {
        var num = r(k - 1).get
        var j = 1
        while (j < k) { num -= a(k - 1)(j) * r(k - 1 - j).get; j += 1 }
        val akk = num / v
        a(k)(k) = akk
        j = 1
        while (j < k) { a(k)(j) = a(k - 1)(j) - akk * a(k - 1)(k - j); j += 1 }
        v = v * (1.0 - akk * akk)
        out(k - 1) = Some(akk)
      }
      k += 1
    }
    out
  }

  def skewReport(df: DataFrame, key: Column, dim: String): DataFrame = {
    val counts = df.select(key.cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))
    // size histogram: the ONLY pass over the key-scaled table; bounded
    // output, checkpointed because totals + the cumulative walk read it
    val h = counts.groupBy("c").agg(count(lit(1)).as("m")).localCheckpoint()
    val t = h.agg(sum("m").as("nk"), sum(col("c") * col("m")).as("nr"),
      max("c").as("mx"))
    val wc = Window.orderBy("c") // bounded by distinct sizes
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.select(col("c"), sum("m").over(wc).as("cum"))
      .crossJoin(broadcast(t))
    def pick(rank: String, name: String) =
      cum.filter(col("cum") >= expr(rank)).agg(min("c").as(name))
    t.select(col("nk").as("n_keys"), col("nr").as("n_rows"),
        col("mx").as("max_c"))
      .crossJoin(broadcast(pick("(nk + 1) div 2", "p50_c")))
      .crossJoin(broadcast(pick("(9 * nk + 9) div 10", "p90_c")))
      .crossJoin(broadcast(pick("(99 * nk + 99) div 100", "p99_c")))
      .select(lit(dim).as("dim"), col("n_keys"), col("n_rows"), col("max_c"),
        // max/mean as one exact integer ratio — dividing by a
        // pre-truncated integer mean (n_rows div n_keys) misreports by
        // up to 2× when mean group size is small. Headroom: the
        // max_c·1e6·n_keys product fits BIGINT while
        // max_c·n_keys ≤ 9.2e12 (max_c ≤ mean·skew keeps this ~n_rows·
        // skew — revisit past trillion-row inputs).
        expr("max_c * 1000000 * n_keys div n_rows").as("skew_ratio_ppm"),
        expr("max_c * 1000000 div n_rows").as("max_share_ppm"),
        col("p50_c"), col("p90_c"), col("p99_c"))
  }

  /**
   * Categorical distribution drift between two slices A and B of one
   * keyed stream: add-one-smoothed KL(A‖B), KL(B‖A), and Jensen–Shannon
   * divergence over the union vocabulary, each quantized PER TERM to
   * integer micro-nats before the sum (order-proof). One
   * vocabulary-bounded aggregate + one broadcast of the 1-row totals —
   * the "did yesterday's corpus shift" monitor: state is O(vocab), never
   * O(rows). Returns one row (n_a, n_b, vocab, kl_ab_micro, kl_ba_micro,
   * jsd_micro).
   */
  def categoricalDrift(df: DataFrame, value: Column,
                       isA: Column): DataFrame = {
    val counts = df.select(value.as("__v"), isA.as("__a"))
      .groupBy("__v")
      .agg(count(when(col("__a"), 1)).as("ca"),
        count(when(!col("__a"), 1)).as("cb"))
    val totals = counts.agg(sum("ca").as("na"), sum("cb").as("nb"),
      count(lit(1)).as("v"))
    counts.join(broadcast(totals))
      .withColumn("pa", (col("ca") + 1).cast("double") / (col("na") + col("v")))
      .withColumn("pb", (col("cb") + 1).cast("double") / (col("nb") + col("v")))
      .withColumn("m", (col("pa") + col("pb")) / 2)
      .withColumn("t_ab", round(col("pa") * log(col("pa") / col("pb")) * 1e6, 0).cast("long"))
      .withColumn("t_ba", round(col("pb") * log(col("pb") / col("pa")) * 1e6, 0).cast("long"))
      .withColumn("t_js",
        round((col("pa") * log(col("pa") / col("m"))
          + col("pb") * log(col("pb") / col("m"))) / 2 * 1e6, 0).cast("long"))
      .agg(max("na").as("n_a"), max("nb").as("n_b"), max("v").as("vocab"),
        sum("t_ab").as("kl_ab_micro"), sum("t_ba").as("kl_ba_micro"),
        sum("t_js").as("jsd_micro"))
  }

  /**
   * Pearson chi-square contributions for a two-way contingency table:
   * observed cell counts vs independence expectation
   * `rowTotal·colTotal/n`, each cell's `(o-e)²/e` quantized to integer
   * micros then summed per row value (order-proof). Only OBSERVED cells
   * contribute — an o=0 cell is never materialized, so on sparse tables
   * the statistic is a lower bound (dense tables, like hours×types, are
   * exact). The table is |rows|×|cols| — tiny after one map-combined
   * aggregate. Returns
   * (rowCol, n, chi2_micro) per row value; the caller sums for the
   * global statistic.
   */
  def chiSquareByRow(df: DataFrame, rowVal: Column,
                     colVal: Column): DataFrame = {
    val cells = df.select(rowVal.as("__r"), colVal.as("__c"))
      .groupBy("__r", "__c").agg(count(lit(1)).as("o"))
    val w = Window.partitionBy(lit(1))
    cells
      .withColumn("rt", sum("o").over(Window.partitionBy("__r")))
      .withColumn("ct", sum("o").over(Window.partitionBy("__c")))
      .withColumn("n", sum("o").over(w))
      .withColumn("e",
        col("rt").cast("double") * col("ct") / col("n"))
      .withColumn("t",
        round((col("o") - col("e")) * (col("o") - col("e")) / col("e") * 1e6, 0)
          .cast("long"))
      .groupBy(col("__r"))
      .agg(max("rt").as("n"), sum("t").as("chi2_micro"))
  }

  /**
   * Benford first-significant-digit audit of a numeric column: per
   * digit 1–9 the observed count, observed frequency (ppm), the
   * Benford expectation `log10(1 + 1/d)` (ppm), and the absolute
   * deviation — the classic fabricated-data screen. Map-side digit
   * extraction, 9-row aggregate. Values below 1 are excluded (for
   * (0,1) the integer-part digit is 0, not the first significant
   * digit — rescale such columns before auditing).
   */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    val counts = df
      .filter(value >= 1)
      .select(substring(floor(value).cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    // all nine digits always emit a row: a digit that NEVER occurs is
    // the strongest fabrication signal (dev_ppm = its full Benford
    // expectation) — without the spine that row would silently vanish
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").as("digit"))
      .join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("total", sum("n").over())
    digits
      .withColumn("obs_ppm",
        when(col("total") > 0, expr("n * 1000000 div total")).otherwise(0L))
      .withColumn("benford_ppm",
        round(log10(lit(1.0) + lit(1.0) / col("digit")) * 1e6, 0).cast("long"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
      .drop("total")
  }

  /**
   * Shared binned two-population table behind [[ksBinned]] and
   * [[mannWhitneyBinned]]: equi-width bins of `value` with per-group
   * counts. The bin table is bounded by the VALUE RANGE over binWidth,
   * never the row count — that bound is what licenses the cumulative
   * windows downstream. Rows where either column is null are excluded.
   */
  private def binCounts(df: DataFrame, value: Column, inGroup1: Column,
                        binWidth: Double): DataFrame =
    df.filter(value.isNotNull && inGroup1.isNotNull)
      .select(floor(value / binWidth).cast("long").as("bin"),
        inGroup1.as("g1"))
      .groupBy("bin").agg(
        count(when(col("g1"), 1)).as("c1"),
        count(when(!col("g1"), 1)).as("c2"))

  /**
   * Two-sample Kolmogorov–Smirnov statistic over equi-width BINNED
   * CDFs — exact for the binned distributions. Each CDF quantizes to
   * micro units independently (cum·10⁶ div n), so the statistic stays
   * BIGINT-safe at any row count where cum₁·n₂ would overflow. Returns
   * one row (n1, n2, ks_micro, at_bin) with the peak-gap bin picked by
   * smallest bin on ties.
   */
  def ksBinned(df: DataFrame, value: Column, inGroup1: Column,
               binWidth: Double): DataFrame = {
    val b = binCounts(df, value, inGroup1, binWidth)
    val n = b.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val win = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = b
      .select(col("bin"), sum("c1").over(win).as("cum1"),
        sum("c2").over(win).as("cum2"))
      .crossJoin(broadcast(n))
      .select(col("bin"),
        abs(expr("cum1 * 1000000 div n1 - cum2 * 1000000 div n2"))
          .as("d_micro"))
      .localCheckpoint() // bounded bin table; max + argmax both read it
    val mx = dd.agg(max("d_micro").as("ks_micro"))
    val am = dd.join(broadcast(mx), col("d_micro") === col("ks_micro"))
      .agg(min("bin").as("at_bin"))
    n.crossJoin(broadcast(mx)).crossJoin(broadcast(am))
      .select(col("n1"), col("n2"), col("ks_micro"), col("at_bin"))
  }

  /**
   * Mann–Whitney U over the same equi-width bins — the rank-based
   * location test (KS sees shape, U sees stochastic dominance). Tie
   * handling is the textbook midrank kept integer by DOUBLING every
   * rank: midrank×2 of a bin = 2·(count before) + (count within) + 1,
   * so R1×2, U1×2 and the AUC effect size in ppm are exact BIGINT.
   * Returns one row (n1, n2, u1_x2, auc_ppm).
   */
  def mannWhitneyBinned(df: DataFrame, value: Column, inGroup1: Column,
                        binWidth: Double): DataFrame = {
    val b = binCounts(df, value, inGroup1, binWidth)
      .localCheckpoint() // bounded bin table; totals + rank walk read it
    val n = b.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val win = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r1 = b
      .withColumn("cb", coalesce(sum(col("c1") + col("c2")).over(win), lit(0L)))
      .agg(sum(expr("c1 * (2 * cb + c1 + c2 + 1)")).as("r1_x2"))
    r1.crossJoin(broadcast(n))
      .select(col("n1"), col("n2"),
        expr("r1_x2 - n1 * (n1 + 1)").as("u1_x2"),
        expr("(r1_x2 - n1 * (n1 + 1)) * 500000 div (n1 * n2)").as("auc_ppm"))
  }

  /**
   * Calibration table over equi-width score bins — the reliability
   * diagram a classifier-driven curation pipeline audits before
   * trusting its quality scores: per bin, trials, positives, observed
   * positive rate in ppm, the overall base rate, and the bin's
   * contribution to expected calibration error (n·|rate − overall|
   * div N, summing to ECE across rows). All integer ppm; the bin table
   * is bounded by the score RANGE over binWidth. Rows where either
   * column is null are excluded. Returns
   * (bin, n, pos, rate_ppm, overall_ppm, ece_contrib_ppm).
   */
  def calibrationBinned(df: DataFrame, score: Column, label: Column,
                        binWidth: Double): DataFrame = {
    val b = df.filter(score.isNotNull && label.isNotNull)
      .select(floor(score / binWidth).cast("long").as("bin"),
        label.as("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        count(when(col("y"), 1)).as("pos"))
    val tot = b.agg(sum("n").as("nn"), sum("pos").as("pp"))
    b.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("pos"),
        expr("pos * 1000000 div n").as("rate_ppm"),
        expr("pp * 1000000 div nn").as("overall_ppm"),
        expr("n * abs(pos * 1000000 div n - pp * 1000000 div nn) div nn")
          .as("ece_contrib_ppm"))
  }

  /**
   * Autocorrelation of an ALREADY-DENSE ordered series at lags
   * 1..maxLag (the caller densifies gaps first — a zero-volume period
   * is an input, not a hole). Integer skeleton: each term is centered
   * as n·x − Σx (exact BIGINT at any partitioning), all lag products
   * ride ONE bounded window pass (maxLag leads over the series order),
   * and the only floating-point step is the final num/den division.
   * The window is global BY DESIGN: the input is an aggregated series
   * bounded by its calendar/grid, never a fact table. Magnitude bound:
   * centering as c = n·x − Σx makes den = Σc² scale like n³·var(x), so
   * the skeleton is partitioning-exact but NOT magnitude-unbounded —
   * c·c silently wraps int64 once n·max|x| approaches 2³¹ (e.g. a
   * decade of days × per-day counts ≳ 5·10⁵). Callers with larger
   * series should pre-scale `value` (divide by a constant) before
   * calling; the acf ratio is scale-invariant. Returns
   * (lag, num, den, acf) — num/den NULL-safe on an empty series.
   */
  def acf(series: DataFrame, orderCol: Column, value: Column,
          maxLag: Int): DataFrame = {
    val base = series.select(orderCol.as("ord"), value.cast("long").as("x"))
    val tot = base.agg(count(lit(1)).cast("long").as("n"), sum("x").as("sx"))
    val cen = base.crossJoin(broadcast(tot))
      .withColumn("c", col("n") * col("x") - col("sx"))
    val win = Window.orderBy("ord")
    val led = cen.select(col("c") +:
      (1 to maxLag).map(l => lead(col("c"), l).over(win).as(s"c$l")): _*)
    val aggCols = sum(col("c") * col("c")).as("den") +:
      (1 to maxLag).map(l => sum(col("c") * col(s"c$l")).as(s"n$l"))
    val agg = led.agg(aggCols.head, aggCols.tail: _*)
    val lags = (1 to maxLag).map(l =>
      struct(lit(l.toLong).as("lag"), col(s"n$l").as("num")))
    agg.select(explode(array(lags: _*)).as("e"), col("den"))
      .select(col("e.lag").as("lag"), col("e.num").as("num"), col("den"),
        expr("CAST(num AS DOUBLE) / nullif(den, 0)").as("acf"))
  }
}
