package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.Confirm

/** Remaining SURVEY.md §2 inventory items: the confirmation-message
  * pipeline (EP app_confirmaciones) and the probe→cascade pattern
  * (S4 row-limited probe + J7 dependent-distinct cascade). */
object ExtraQueries {

  /** Spanish weekday name CASE over DuckDB's dayofweek (Sunday=0). */
  private val dayNameSql =
    """CASE dayofweek(fecha) WHEN 0 THEN 'domingo' WHEN 1 THEN 'lunes'
       WHEN 2 THEN 'martes' WHEN 3 THEN 'miércoles' WHEN 4 THEN 'jueves'
       WHEN 5 THEN 'viernes' ELSE 'sábado' END"""

  private val monthNameSql =
    """CASE month(fecha) WHEN 1 THEN 'enero' WHEN 2 THEN 'febrero'
       WHEN 3 THEN 'marzo' WHEN 4 THEN 'abril' WHEN 5 THEN 'mayo'
       WHEN 6 THEN 'junio' WHEN 7 THEN 'julio' WHEN 8 THEN 'agosto'
       WHEN 9 THEN 'septiembre' WHEN 10 THEN 'octubre'
       WHEN 11 THEN 'noviembre' ELSE 'diciembre' END"""

  val q52Confirmations: Q = Q("q52_confirmations",
    s"""WITH first AS (
         SELECT o_custkey, CAST(o_orderdate AS DATE) AS fecha, o_orderkey,
                o_orderpriority
         FROM orders
         QUALIFY row_number() OVER (PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
                                    ORDER BY o_orderkey) = 1),
       msg AS (
         SELECT c_custkey, fecha, o_orderkey,
                '+5730012' || lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') AS telefono,
                c_name || '|' ||
                $dayNameSql || ' ' || day(fecha) || ' de ' || $monthNameSql ||
                ' de ' || year(fecha) || '|' || o_orderpriority || '|' ||
                '+5730012' || lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') AS variable
         FROM first JOIN customer ON o_custkey = c_custkey)
       SELECT c_custkey, strftime(fecha, '%Y-%m-%d') AS fecha, o_orderkey,
              telefono, variable
       FROM msg WHERE c_custkey < 300 ORDER BY c_custkey, fecha""") { (s, d) =>
    Confirm.confirmations(table(s, d, "orders"), table(s, d, "customer"))
      .filter(col("c_custkey") < 300)
      .withColumn("fecha", date_format(col("fecha"), "yyyy-MM-dd"))
      .orderBy("c_custkey", "fecha")
  }

  val q53ProbeCascade: Q = Q("q53_probe_cascade",
    """WITH probe AS (SELECT DISTINCT o_orderpriority FROM orders
                      WHERE o_orderkey < 1000)
       SELECT o_orderpriority, count(DISTINCT o_orderstatus) AS n_status,
              count(*) AS n
       FROM orders
       WHERE o_orderpriority IN (SELECT o_orderpriority FROM probe)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
    val o = table(s, d, "orders")
    val probe = o.filter(col("o_orderkey") < 1000)
      .select("o_orderpriority").distinct()
    o.join(probe, Seq("o_orderpriority"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_orderstatus").as("n_status"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** Sketch aggregates for the 100 TB path: HLL distinct + approximate
   * median next to their exact counterparts. Raw sketch values are
   * algorithm-specific (no cross-engine equality), so the query emits
   * the exact values plus ERROR-BOUND VERDICTS — the sketch must land
   * within 3×rsd of the exact distinct and inside the exact 45-55%
   * quantile band — and the oracle asserts those verdicts are all TRUE.
   * A drifting sketch now fails the hash gate instead of going unnoticed
   * (previously rows-only; bounds were spec-asserted in RelationalSpec). */
  val q56Sketches: Q = Q("q56_sketches",
    """SELECT l_returnflag,
              CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,
              TRUE AS hll_within_rsd, TRUE AS median_within_band
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    table(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct("l_orderkey").as("exact_distinct"),
        approx_count_distinct("l_orderkey", 0.02).as("approx_distinct"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx_median"),
        expr("percentile(l_extendedprice, 0.45)").as("q45"),
        expr("percentile(l_extendedprice, 0.55)").as("q55"))
      .select(col("l_returnflag"), col("exact_distinct"),
        (abs(col("approx_distinct") - col("exact_distinct"))
          <= col("exact_distinct") * 0.06 + 1).as("hll_within_rsd"),
        (col("approx_median") >= col("q45") &&
          col("approx_median") <= col("q55")).as("median_within_band"))
      .orderBy("l_returnflag")
  }

  /** D2 — configured partitioner with pinned groups: URGENT deals only
   * into partitions {1,3}, LOW only into {2,4}, everything else across
   * all 4 — the md5-seeded ordering, per-width ntile deal and pinned
   * mapping are all replayed in the oracle, so the custom partition
   * CONFIG semantics (not just the balanced D1 deal, q28) are
   * hash-checked. */
  val q69PartitionConfig: Q = Q("q69_partition_config",
    """WITH a AS (SELECT o_orderkey AS id, o_orderpriority AS grupo,
                         md5(CAST(o_orderkey AS VARCHAR) || '|' || '42') AS k
                  FROM orders WHERE o_orderkey < 4000),
       t AS (SELECT id, grupo,
                    ntile(4) OVER w AS t4,
                    ntile(2) OVER w AS t2
             FROM a WINDOW w AS (PARTITION BY grupo ORDER BY k, id)),
       p AS (SELECT id, grupo,
                    CASE WHEN grupo = '1-URGENT' THEN ([1, 3])[t2]
                         WHEN grupo = '5-LOW' THEN ([2, 4])[t2]
                         ELSE t4 END AS partition_id
             FROM t)
       SELECT CAST(partition_id AS BIGINT) AS partition_id, grupo,
              count(DISTINCT id) AS n_ids, count(*) AS n_rows
       FROM p GROUP BY 1, 2 ORDER BY partition_id, grupo""") { (s, d) =>
    val orders = table(s, d, "orders").filter(col("o_orderkey") < 4000)
      .select(col("o_orderkey").as("id"), col("o_orderpriority").as("grupo"))
    val assigned = graft.ops.Windows.seededNtileConfigured(
      orders, "grupo", "id", n = 4,
      allowed = Map("1-URGENT" -> Seq(1, 3), "5-LOW" -> Seq(2, 4)))
    graft.ops.Windows.partitionStats(assigned, "partition_id", "grupo", "id")
      .select(col("partition_id").cast("long").as("partition_id"),
        col("grupo"), col("n_ids"), col("n_rows"))
  }

  /** S5/S8 — CSV sink + scan round-trip, hash-gated: nation is written
   * to a headered CSV and read back with its parquet schema; the oracle
   * reads the PARQUET truth, so any value/type/quoting loss in the CSV
   * path breaks the hash. */
  val q70CsvRoundtrip: Q = Q("q70_csv_roundtrip",
    """SELECT n_nationkey, n_name, n_regionkey
       FROM nation ORDER BY n_nationkey""") { (s, d) =>
    val dir = graft.io.Sources.scratchDir("graft_csv_rt")
    val nation = table(s, d, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    s.read.option("header", "true").schema(nation.schema).csv(dir)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
  }

  /** S3 — header-offset scan, hash-gated: region is exported to a CSV
   * with a 3-line report preamble above the header (the reference's
   * `header=N` sheet shape); `csvHeaderOffset` must recover exactly the
   * parquet truth the oracle reads. */
  val q72HeaderOffset: Q = Q("q72_header_offset",
    """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
       FROM region ORDER BY r_regionkey""") { (s, d) =>
    val dir = java.nio.file.Paths.get(graft.io.Sources.scratchDir("graft_hdr_q"))
    val f = dir.resolve("report.csv")
    val rows = table(s, d, "region")
      .select(col("r_regionkey"), col("r_name")).orderBy("r_regionkey")
      .collect() // region is a 5-row dimension; this builds the fixture, not the plan
      .map(r => s"${r.getInt(0)};${r.getString(1)}")
    java.nio.file.Files.write(f,
      ("REPORTE REGIONES;\nGenerado: fixture;\n;\n" +
        "r_regionkey;r_name\n" + rows.mkString("\n") + "\n").getBytes("UTF-8"))
    graft.io.Sources.csvHeaderOffset(s, f.toString, skipLines = 3, sep = ";")
      .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
      .orderBy("r_regionkey")
  }

  /** S6 — table-presence validation as a hash-gated verdict (closes the
   * last SURVEY row that was test-only): one row per required table with
   * its present flag, plus a negative control proving the check actually
   * FIRES on a missing name (a validator that never rejects is no
   * validator). The oracle pins every verdict TRUE. */
  val q127RequireTables: Q = Q("q127_require_tables",
    """SELECT tbl, present FROM (VALUES
         ('__negative_control', TRUE), ('customer', TRUE),
         ('documents', TRUE), ('embeddings', TRUE), ('events', TRUE),
         ('lineitem', TRUE), ('nation', TRUE), ('orders', TRUE),
         ('part', TRUE), ('region', TRUE), ('supplier', TRUE))
         AS t(tbl, present)
       ORDER BY tbl""") { (s, d) =>
    import s.implicits._
    // the real check: throws (query fails loudly) if any table is gone
    graft.io.Sources.requireTables(s, d, graft.io.Sources.tableNames)
    // negative control: a bogus name MUST be rejected
    val missingCaught =
      try { graft.io.Sources.requireTables(s, d, Seq("graft_no_such_table")); false }
      catch { case _: IllegalArgumentException => true }
    (graft.io.Sources.tableNames.map(n =>
      (n, new java.io.File(s"$d/$n.parquet").exists())) :+
      ("__negative_control", missingCaught))
      .toDF("tbl", "present").orderBy("tbl")
  }

  /** D4 — comparar_particiones equivalence check (app.py:183-209) as a
   * hash-gated single-row verdict: the seeded deal's invariants —
   * chunks DISJOINT (no id in two partitions), union = input, sizes
   * within a group differ ≤1, and two independent runs produce
   * IDENTICAL assignments. Disjoint/total/balanced are genuinely
   * replayed by the oracle over the same md5 deal; determinism is
   * Spark-side real (two runs compared) and oracle-pinned TRUE. */
  val q128PartitionEquiv: Q = Q("q128_partition_equiv",
    """WITH a AS (SELECT o_orderkey AS id, o_orderpriority AS grupo,
                         md5(CAST(o_orderkey AS VARCHAR) || '|' || '42') AS k
                  FROM orders WHERE o_orderkey < 4000),
       t AS (SELECT id, grupo,
                    ntile(4) OVER (PARTITION BY grupo ORDER BY k, id) AS pid
             FROM a),
       sz AS (SELECT grupo, pid, count(DISTINCT id) AS sz FROM t GROUP BY 1, 2)
       SELECT CAST((SELECT count(DISTINCT id) FROM a) AS BIGINT) AS n_ids,
              CAST((SELECT count(*) FROM sz) AS BIGINT) AS n_chunks,
              (SELECT count(*) = count(DISTINCT id) FROM t) AS disjoint,
              (SELECT count(*) FROM t) = (SELECT count(DISTINCT id) FROM a) AS total,
              (SELECT bool_and(mx - mn <= 1) FROM
                 (SELECT grupo, max(sz) AS mx, min(sz) AS mn
                  FROM sz GROUP BY grupo)) AS balanced,
              TRUE AS deterministic""") { (s, d) =>
    val orders = table(s, d, "orders").filter(col("o_orderkey") < 4000)
      .select(col("o_orderkey").as("id"), col("o_orderpriority").as("grupo"))
    def deal() = graft.ops.Windows.seededNtile(
      orders, Seq("grupo"), "id", n = 4).select("id", "grupo", "partition_id")
    val a1 = deal().localCheckpoint() // consumed by 3 verdict branches
    val sizes = a1.groupBy("grupo", "partition_id")
      .agg(countDistinct("id").as("sz"))
    val balanced = sizes.groupBy("grupo")
      .agg((max("sz") - min("sz") <= 1).as("b"))
      .agg(min(col("b")).as("balanced")) // bool min = AND
    val counts = a1.agg(count(lit(1)).as("n_rows"),
      countDistinct("id").as("n_ids"))
    val nChunks = sizes.agg(count(lit(1)).as("n_chunks"))
    // "union = input" must compare against the INPUT's distinct ids —
    // comparing a1 against itself would hold even if the deal dropped rows
    val inputIds = orders.agg(countDistinct("id").as("n_input_ids"))
    // determinism: a second independent run must agree on every id
    val mismatches = a1.join(deal().withColumnRenamed("partition_id", "p2"),
        Seq("id", "grupo"))
      .filter(col("partition_id") =!= col("p2"))
      .agg(count(lit(1)).as("n_bad"))
    counts.crossJoin(broadcast(nChunks)).crossJoin(broadcast(balanced))
      .crossJoin(broadcast(inputIds)).crossJoin(broadcast(mismatches))
      .select(col("n_ids"), col("n_chunks"),
        (col("n_rows") === col("n_ids")).as("disjoint"),
        (col("n_rows") === col("n_input_ids")).as("total"),
        col("balanced"),
        (col("n_bad") === 0).as("deterministic"))
  }

  /** Heavy-hitters sketch vs exact (q56 pattern): a deterministic skewed
   * key stream — ~70% of orders collapse onto 3 hot keys, the rest stay
   * unique — aggregated by the bounded-memory Misra–Gries sketch with
   * only 64 counters (far fewer than the distinct-key count, so the
   * sketch genuinely decrements/evicts). The hash gate pins the
   * GUARANTEED properties per hot key: present in the sketch (its count
   * clears the N/(m+1) survival bound), estimate ≤ exact, undercount ≤
   * N/(m+1). Exact counts are fully replayed by the oracle; the raw
   * tail-survivor set is deliberately NOT gated (merge-order-dependent
   * by design). */
  val q129HeavyHitters: Q = Q("q129_heavy_hitters",
    """WITH k AS (SELECT CASE WHEN o_orderkey % 10 < 7
                              THEN 'hot_' || CAST(o_orderkey % 3 AS VARCHAR)
                              ELSE 'cold_' || CAST(o_orderkey AS VARCHAR) END AS k
                  FROM orders),
       e AS (SELECT k, count(*) AS n_exact FROM k GROUP BY k
             ORDER BY n_exact DESC, k LIMIT 3)
       SELECT k, n_exact, TRUE AS present, TRUE AS est_le_exact,
              TRUE AS err_within_bound
       FROM e ORDER BY k""") { (s, d) =>
    val m = 64
    val keyed = table(s, d, "orders").select(
      when(col("o_orderkey") % 10 < 7,
        concat(lit("hot_"), (col("o_orderkey") % 3).cast("string")))
        .otherwise(concat(lit("cold_"), col("o_orderkey").cast("string")))
        .as("k"))
      .localCheckpoint() // sketch, confirmation pass and N all read it
    // the scale shape end-to-end: sketch bounds the candidates, the
    // exact count+top-k runs ONLY over sketch survivors (≤m distinct
    // keys reach the exact aggregate — never the full key universe)
    val sketch = graft.curation.Curation.heavyHitters(keyed, col("k"), m)
      .localCheckpoint() // ≤m rows; feeds the semi join AND the est join
    val confirmed = keyed
      .join(broadcast(sketch.select(col("token").as("k"))), Seq("k"), "left_semi")
      .groupBy("k").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("k").asc).limit(3)
    val n = keyed.agg(count(lit(1)).as("n_total"))
    confirmed
      .join(sketch.withColumnRenamed("token", "k"), Seq("k"), "left")
      .crossJoin(broadcast(n))
      .select(col("k"), col("n_exact"),
        col("est").isNotNull.as("present"),
        (col("est") <= col("n_exact")).as("est_le_exact"),
        (col("n_exact") - col("est") <= col("n_total") / (m + 1)).as("err_within_bound"))
      .orderBy("k")
  }

  /** HLL sketch PERSISTENCE + rollup — the incremental-distinct pattern
   * a 100 TB metrics pipeline runs: per-day DataSketches HLL sketches of
   * the user set are computed once, persisted as a binary sketch table,
   * and later rollups UNION-MERGE the stored sketches instead of
   * re-scanning raw events (30 days of events collapse to 30 sketch
   * rows; a month-over-month distinct is then sketch-table-sized).
   * Exact daily/global distincts are fully replayed by the oracle;
   * sketch estimates ride as 5%-band verdicts (lgConfigK=12 rsd is
   * ~1.6%; q56 pattern — raw sketch bytes are algorithm-internal and
   * never gated). */
  val q133HllRollup: Q = Q("q133_hll_rollup",
    """WITH e AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
       per AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
               FROM e GROUP BY day),
       g AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS merged_exact FROM e)
       SELECT day, exact_distinct, TRUE AS day_est_within_5pct,
              (SELECT merged_exact FROM g) AS merged_exact,
              TRUE AS merged_est_within_5pct
       FROM per ORDER BY day""") { (s, d) =>
    val dir = graft.io.Sources.scratchDir("graft_hll")
    table(s, d, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"),
        count_distinct(col("user_id")).as("exact_distinct"))
      .write.mode("overwrite").parquet(s"$dir/daily_sketches")
    val sketches = s.read.parquet(s"$dir/daily_sketches")
    val merged = sketches.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("m_est"))
      .crossJoin(broadcast(table(s, d, "events")
        .agg(count_distinct(col("user_id")).as("merged_exact"))))
    sketches
      .withColumn("day_est", expr("hll_sketch_estimate(sk)"))
      .crossJoin(broadcast(merged))
      .select(col("day"), col("exact_distinct"),
        (abs(col("day_est") - col("exact_distinct"))
          <= col("exact_distinct") * 0.05).as("day_est_within_5pct"),
        col("merged_exact"),
        (abs(col("m_est") - col("merged_exact"))
          <= col("merged_exact") * 0.05).as("merged_est_within_5pct"))
      .orderBy("day")
  }

  /** S5/S8 sibling for the columnar interchange format: orders (BIGINT /
   * VARCHAR / DOUBLE / TIMESTAMP columns) round-trips through an ORC
   * sink+scan, and the aggregate over the round-tripped copy must equal
   * the oracle's parquet truth — types, timestamps, and money survive
   * the format boundary or the hash breaks. */
  val q260OrcRoundtrip: Q = Q("q260_orc_roundtrip",
    """SELECT o_orderpriority, count(*) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total,
       strftime(max(o_orderdate), '%Y-%m-%d') AS max_day
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
    val dir = graft.io.Sources.scratchDir("graft_orc_rt")
    table(s, d, "orders").write.mode("overwrite").orc(dir)
    s.read.orc(dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,6)")), 2)
          .cast("double").as("total"),
        date_format(max("o_orderdate"), "yyyy-MM-dd").as("max_day"))
      .orderBy("o_orderpriority")
  }

  /** Reproducibility manifest: per table, the row count and an
   * order-independent 60-bit key checksum (bit-XOR of the md5-prefix
   * hash of each row's key — XOR is commutative/associative, so the
   * checksum is exact at any partitioning and never overflows). This
   * is the manifest a reproducible training run records next to its
   * config: re-run the ingest, re-hash, diff one 10-row table. One
   * map-side scan per table. */
  val q271Manifest: Q = {
    val keys = Seq(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey * 10 + l_linenumber",
      "events" -> "event_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    val oracle = keys.map { case (t, k) =>
      s"""SELECT '$t' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(bit_xor(${graft.ops.Exprs.md5LongSql.format(k)}) AS BIGINT) AS key_xor
          FROM $t"""
    }.mkString("\n       UNION ALL ")
    Q("q271_manifest", s"SELECT * FROM ($oracle) ORDER BY tbl") { (s, d) =>
      keys.map { case (t, k) =>
        table(s, d, t)
          .select(graft.ops.Exprs.md5Long(expr(k)).as("h"))
          .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("key_xor"))
          .select(lit(t).as("tbl"), col("n_rows"), col("key_xor"))
      }.reduce(_ unionAll _).orderBy("tbl")
    }
  }

  /** Referential-integrity audit over every FK edge of the schema —
   * the data-quality gate a warehouse load runs before publishing:
   * per edge, child rows, null keys, orphans and orphan ppm. Scan
   * discipline (round-9 rework of the checkpoint-heavy shape that ran
   * ×3.1 at 10× data — and of a first rework whose stacked
   * groupBy(edge, key) distinct-key shuffle alone measured 5.4 s at
   * 10×): edges are split by PARENT KEY CARDINALITY, read from parquet
   * footer row counts (a metadata-only count, no data scan).
   *
   *  - Small-parent edges (dimensions — the common case): every child
   *    table is scanned ONCE, its FK columns exploded map-side into a
   *    stacked (edge, key) stream that probes ONE BROADCAST of the
   *    stacked distinct parent key sets; the per-edge totals/null/
   *    orphan counts come straight off a groupBy(edge) whose partial
   *    aggregation collapses to 7 rows per task — the child fact is
   *    NEVER shuffled, not even to distinct its keys.
   *  - Big-parent edges (parent keys past the broadcast budget, where
   *    a driver collect is the plan shape that cannot survive scale):
   *    per edge, the child pre-aggregates to distinct-key counts on
   *    the BARE LONG key (no edge-label payload in the shuffle) and
   *    shuffle-hash-joins the parent's distinct key set — key-table vs
   *    key-table, the at-scale RI recipe.
   *
   * The split threshold is the broadcast budget (~4M keys ≈ 32 MB
   * hashed relation, executor-memory bounded); at harness scale every
   * parent is a broadcast, at warehouse scale orders-sized parents
   * switch themselves to the shuffle path with no code change. ZERO
   * checkpoints, zero repeated fact scans, one tiny exchange. A
   * literal zero-count seed row per edge keeps the 7-row contract even
   * against an empty child table. Orphan ppm divides by NON-NULL child
   * keys (a null FK is a separate defect class, counted on its own). */
  val q302FkAudit: Q = {
    // (edge label, child table, child key, parent table, parent key)
    val edges = Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
    val sql = edges.map { case (label, ct, ck, pt, pk) =>
      s"""SELECT '$label' AS edge,
            (SELECT CAST(count(*) AS BIGINT) FROM $ct) AS n_child,
            (SELECT CAST(count(*) AS BIGINT) FROM $ct WHERE $ck IS NULL) AS n_null_key,
            (SELECT CAST(count(*) AS BIGINT) FROM $ct
             WHERE $ck IS NOT NULL
               AND $ck NOT IN (SELECT $pk FROM $pt WHERE $pk IS NOT NULL)) AS n_orphan"""
    }.mkString("\nUNION ALL\n")
    Q("q302_fk_audit",
      s"""WITH a AS ($sql)
         SELECT edge, n_child, n_null_key, n_orphan,
                CASE WHEN n_child - n_null_key = 0 THEN 0
                     ELSE n_orphan * 1000000 // (n_child - n_null_key) END AS orphan_ppm
         FROM a ORDER BY edge""") { (s, d) =>
      // ---- totals: ONE scan per child table, a single-row map-side
      // aggregate covering every FK column at once (no explode, no
      // shuffle — partial aggregation collapses to 1 row per task),
      // fanned out to per-edge rows from that 1-row frame. An empty
      // child table still aggregates to its count-0 row, so the 7-row
      // contract holds with no seed. ----
      val totals = edges.groupBy(_._2).toSeq.map { case (ct, es) =>
        val aggs = count(lit(1)).as("n_rows") +: es.zipWithIndex.map {
          case ((_, _, ck, _, _), i) =>
            sum(when(col(ck).isNull, 1L).otherwise(0L)).as(s"nn$i")
        }
        table(s, d, ct).agg(aggs.head, aggs.tail: _*)
          .select(explode(array(es.zipWithIndex.map { case ((label, _, _, _, _), i) =>
            struct(lit(label).as("edge"), col("n_rows").as("n_child"),
              coalesce(col(s"nn$i"), lit(0L)).as("n_null_key"))
          }: _*)).as("t"))
          .select(col("t.edge").as("edge"), col("t.n_child").as("n_child"),
            col("t.n_null_key").as("n_null_key"))
      }.reduce(_ unionByName _)
      // parent cardinality from parquet footer row counts (count() on a
      // bare scan is metadata-only) decides broadcast vs shuffle per edge
      val parentRows: Map[(String, String), Long] =
        edges.map(e => (e._4, e._5)).distinct.map { case (pt, pk) =>
          (pt, pk) -> table(s, d, pt).count()
        }.toMap
      val bcastMaxKeys = 4000000L // ≈32 MB hashed relation of longs
      // ---- matches: per edge, a LEFT SEMI probe of the parent key set
      // on the BARE LONG key (LongHashedRelation, the fastest probe
      // path) aggregated to one row map-side. A semi join tolerates
      // duplicate build-side keys, so the parent ships RAW — no
      // distinct(), no parent shuffle. Parents past the broadcast
      // budget (a driver collect cannot survive scale) switch to a
      // shuffle-hash semi join with the child pre-aggregated to
      // distinct-key counts — key-table vs key-table. Shared parents
      // (nation) build identical broadcast subtrees that AQE reuses. ----
      val matches = edges.map { case (label, ct, ck, pt, pk) =>
        val child = table(s, d, ct).filter(col(ck).isNotNull)
          .select(col(ck).cast("long").as("key"))
        val parent = table(s, d, pt).filter(col(pk).isNotNull)
          .select(col(pk).cast("long").as("key"))
        val matched =
          if (parentRows((pt, pk)) <= bcastMaxKeys)
            child.join(broadcast(parent), Seq("key"), "left_semi")
              .agg(count(lit(1)).as("n_matched"))
          else
            child.groupBy("key").agg(count(lit(1)).as("cnt"))
              .join(parent.hint("SHUFFLE_HASH"), Seq("key"), "left_semi")
              .agg(coalesce(sum("cnt"), lit(0L)).as("n_matched"))
        matched.select(lit(label).as("edge"), col("n_matched"))
      }.reduce(_ unionByName _)
      totals.join(matches, Seq("edge"), "left")
        .select(col("edge"), col("n_child"), col("n_null_key"),
          (col("n_child") - col("n_null_key") -
            coalesce(col("n_matched"), lit(0L))).as("n_orphan"))
        .select(col("edge"), col("n_child"), col("n_null_key"), col("n_orphan"),
          when(col("n_child") - col("n_null_key") === 0, 0L)
            .otherwise(expr("n_orphan * 1000000 div (n_child - n_null_key)"))
            .as("orphan_ppm"))
        .orderBy("edge")
    }
  }

  /** Consistent-hash ring resharding report — the shard-movement
   * arithmetic behind scaling a stateful service from 8 to 9 nodes,
   * beside the naive `hash mod N` strawman. 16 virtual nodes per
   * physical node at md5₆₀("ring:node:vnode") positions; a key owns to
   * the vnode minimizing (pos − h) mod 2⁶⁰ (clockwise distance — the
   * Karger ring). Output per (scheme, node): keys owned after the
   * resize and how many MOVED IN — the ring moves ≈1/9 of keys
   * (only those between the new node's vnodes and their predecessors)
   * where mod-N reshuffles ≈8/9, which is the entire point of
   * consistent hashing. Complements q291's rendezvous variant.
   *
   * Scale shape: the 144-row vnode table broadcasts; ownership is the
   * key stream × vnodes with a map-side partial MIN(struct(dist,
   * node, v)) — no window over the blown-up stream, and the keys
   * table is a checkpointed dimension projection. (At fact-scale keys
   * the same ring folds into a sorted-array literal probed by a pure
   * map-side expression; the aggregate shape here keeps the oracle a
   * line-for-line window replay.) All positions/distances are exact
   * md5₆₀ integers, so DuckDB replays ownership key for key. */
  val q319HashRing: Q = {
    val P = "1152921504606846976" // 2^60: md5Long's value domain
    val label = "'ring:' || CAST(n.node AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)"
    Q("q319_hash_ring",
      s"""WITH keys AS (SELECT c_custkey AS k,
              ${graft.ops.Exprs.md5LongSql.format("c_custkey")} AS h
            FROM customer),
         vn AS (SELECT n.node, v.v,
                  ${graft.ops.Exprs.md5LongSql.format(label)} AS pos
                FROM range(9) n(node), range(16) v(v)),
         a8 AS (SELECT k, node FROM (
                  SELECT k, node, v, (pos - h + $P) % $P AS dist
                  FROM keys CROSS JOIN vn WHERE node < 8)
                QUALIFY row_number() OVER (
                  PARTITION BY k ORDER BY dist, node, v) = 1),
         a9 AS (SELECT k, node FROM (
                  SELECT k, node, v, (pos - h + $P) % $P AS dist
                  FROM keys CROSS JOIN vn)
                QUALIFY row_number() OVER (
                  PARTITION BY k ORDER BY dist, node, v) = 1),
         f AS (SELECT 'ring' AS scheme, a9.node AS node,
                      CASE WHEN a8.node <> a9.node THEN 1 ELSE 0 END AS moved
               FROM a8 JOIN a9 USING (k)
               UNION ALL
               SELECT 'mod', h % 9,
                      CASE WHEN h % 8 <> h % 9 THEN 1 ELSE 0 END
               FROM keys)
         SELECT scheme, CAST(node AS BIGINT) AS node,
                CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(moved) AS BIGINT) AS n_moved_in,
                CAST(sum(moved) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS moved_in_ppm
         FROM f GROUP BY 1, 2 ORDER BY scheme, node""") { (s, d) =>
      val keys = table(s, d, "customer")
        .select(col("c_custkey").as("k"),
          graft.ops.Exprs.md5Long(col("c_custkey")).as("h"))
        .localCheckpoint() // dimension projection feeds both rings + mod
      val vn = s.range(9).select(col("id").as("node"))
        .crossJoin(broadcast(s.range(16).select(col("id").as("v"))))
        .select(col("node"), col("v"),
          graft.ops.Exprs.md5Long(concat(lit("ring:"),
            col("node").cast("string"), lit(":"),
            col("v").cast("string"))).as("pos"))
      def owners(ring: org.apache.spark.sql.DataFrame, as: String) =
        keys.crossJoin(broadcast(ring))
          .withColumn("dist", expr(s"(pos - h + $P) % $P"))
          .groupBy("k")
          .agg(min(struct(col("dist"), col("node"), col("v"))).as("m"))
          .select(col("k"), col("m.node").as(as))
      val ring = owners(vn.filter(col("node") < 8), "n8")
        .join(owners(vn, "n9"), "k")
        .select(lit("ring").as("scheme"), col("n9").as("node"),
          when(col("n8") =!= col("n9"), 1L).otherwise(0L).as("moved"))
      val mod = keys.select(lit("mod").as("scheme"),
        pmod(col("h"), lit(9L)).as("node"),
        when(pmod(col("h"), lit(8L)) =!= pmod(col("h"), lit(9L)), 1L)
          .otherwise(0L).as("moved"))
      ring.unionByName(mod)
        .groupBy("scheme", "node")
        .agg(count(lit(1)).as("n_keys"), sum("moved").as("n_moved_in"))
        .select(col("scheme"), col("node").cast("long").as("node"),
          col("n_keys"), col("n_moved_in"),
          expr("n_moved_in * 1000000 div n_keys").as("moved_in_ppm"))
        .orderBy("scheme", "node")
    }
  }

  val all: Seq[Q] = Seq(q52Confirmations, q53ProbeCascade, q56Sketches,
    q69PartitionConfig, q70CsvRoundtrip, q72HeaderOffset,
    q127RequireTables, q128PartitionEquiv, q129HeavyHitters, q133HllRollup,
    q260OrcRoundtrip, q271Manifest, q302FkAudit, q319HashRing)
}
