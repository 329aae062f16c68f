package graft.operators

import graft.core.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Generic data-profiling operator — the data-quality pass a training
  * pipeline runs before touching a new source: per-column row/null/
  * distinct counts plus min/max, emitted in long format so the output
  * schema is independent of the profiled table's schema (same open-schema
  * principle as the props map). One aggregation per column over a shared
  * cached scan; Spark runs them as parallel jobs.
  */
object Profiler {

  /** Long-format profile: (column, n_rows, n_null, n_distinct, min, max)
    * with min/max rendered as strings for schema stability.
    * ONE scan: all 5·N aggregates run in a single pass, then the
    * one-row result unpivots with stack() — no per-column rescan. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    require(columns.forall(c => !c.contains("`") && !c.contains("'")),
      "column names with quote characters are not supported by the stack unpivot")
    val aggs = columns.flatMap(c => Seq(
      count(lit(1)).as(s"${c}__n"),
      sum(col(c).isNull.cast("long")).as(s"${c}__null"),
      count_distinct(col(c)).as(s"${c}__dist"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${columns.length}, " + columns.map(c =>
      s"'$c', `${c}__n`, `${c}__null`, `${c}__dist`, `${c}__min`, `${c}__max`")
      .mkString(", ") +
      ") AS (column, n_rows, n_null, n_distinct, min_value, max_value)"
    row.selectExpr(stackExpr)
  }
}

object ProfilerOps extends QueryModule {

  /** p2 — EMBEDDING-column profile: per-DIMENSION stats over the vector
    * column (n, min, max, integer-exact sum and sum-of-squares over the
    * 1e3-quantized values) — the drift/health check a feature store runs
    * on every embedding refresh: a dimension whose range collapses or
    * whose second moment jumps flags a broken encoder upstream. One
    * posexplode + one groupBy(dim); integer sums keep it engine-exact
    * (mean/variance derive downstream as sum/n). */
  def profileEmbeddings(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(posexplode(graft.core.Exact.quantize(col("embedding"), 1000)))
      .groupBy(col("pos").as("dim"))
      .agg(count(lit(1)).as("n"), min(col("col")).as("min_q"),
        max(col("col")).as("max_q"), sum(col("col")).as("sum_q"),
        sum(col("col") * col("col")).as("sumsq_q"))
      .orderBy(col("dim"))

  val profileEmbeddingsSql: String =
    s"""SELECT i - 1 AS dim, count(*) AS n,
      |  min(v) AS min_q, max(v) AS max_q,
      |  CAST(sum(v) AS BIGINT) AS sum_q,
      |  CAST(sum(v * v) AS BIGINT) AS sumsq_q
      |FROM (
      |  SELECT unnest(${graft.core.Exact.sqlQuantize("embedding", 1000)}) AS v,
      |    unnest(generate_series(1, len(embedding))) AS i
      |  FROM embeddings)
      |GROUP BY i - 1 ORDER BY dim""".stripMargin

  /** p3 — CORRELATION SUFFICIENT STATISTICS: the five exact sums Pearson
    * r needs (n, Σx, Σy, Σxy, Σx², Σy²) per group, emitted as the EXACT
    * decimals' canonical scale-4 strings (DuckDB's client layer floats
    * raw DECIMAL columns, so strings are the type-stable exact carrier); the float arithmetic happens downstream
    * in whatever precision the consumer wants. Emitting doubles here was
    * last-ulp fragile: Spark converts an exact decimal with one correct
    * rounding (BigDecimal.doubleValue) while DuckDB divides the scaled
    * integer as a double — two roundings — and Σy² at sf0.001 landed on
    * a value where they disagree. The drift-vs-price health check a
    * feature pipeline runs per shard — one map-side-combined groupBy. */
  def correlationStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val out = DecimalType(38, 4)
    val x = col("l_quantity").cast(DecimalType(12, 2))
    val y = col("l_extendedprice").cast(DecimalType(12, 2))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(out).cast("string").as("sum_x"),
        sum(y).cast(out).cast("string").as("sum_y"),
        sum(x * y).cast(out).cast("string").as("sum_xy"),
        sum(x * x).cast(out).cast("string").as("sum_x2"),
        sum(y * y).cast(out).cast("string").as("sum_y2"))
      .orderBy(col("l_returnflag"))
  }

  val correlationStatsSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(CAST(sum(x) AS DECIMAL(38,4)) AS VARCHAR) AS sum_x,
      |  CAST(CAST(sum(y) AS DECIMAL(38,4)) AS VARCHAR) AS sum_y,
      |  CAST(CAST(sum(x * y) AS DECIMAL(38,4)) AS VARCHAR) AS sum_xy,
      |  CAST(CAST(sum(x * x) AS DECIMAL(38,4)) AS VARCHAR) AS sum_x2,
      |  CAST(CAST(sum(y * y) AS DECIMAL(38,4)) AS VARCHAR) AS sum_y2
      |FROM (SELECT l_returnflag,
      |        CAST(l_quantity AS DECIMAL(12,2)) AS x,
      |        CAST(l_extendedprice AS DECIMAL(12,2)) AS y
      |      FROM lineitem)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** p4 — K-MEANS FIT CURVE: corpus inertia (Σ min dist², exact bigint)
    * of the embedding space against the [[graft.ml.KMeans]] centroids
    * after 0, 1 and 2 Lloyd rounds — the convergence telemetry a model-
    * fitting pipeline logs per round (round 0 = the raw seeds; with
    * integer-truncated means the curve is *observed* non-increasing here,
    * though truncation voids Lloyd's guarantee in general — which is why
    * it must be measured, not assumed). Engine-exact, so the oracle
    * replays all three rounds as chained CTEs. */
  def kmeansInertia(s: SparkSession, d: String): DataFrame = {
    import graft.ml.KMeans
    val data = Tables.embeddings(s, d).select(col("vec_id").as("id"),
      graft.core.Exact.quantize(col("embedding"), 1000).as("qv"))
    val rows = (0 to 2).map { r =>
      val (_, centroids) = KMeans.fit(data, k = 8, rounds = r)
      KMeans.inertia(
        data.withColumn("qq", graft.functions.DotProductL(col("qv"), col("qv"))),
        centroids)
        .select(lit(r).as("round"), col("inertia"))
    }
    rows.reduce(_ union _).orderBy(col("round"))
  }

  val kmeansInertiaSql: String = {
    val dot = (a: String, b: String) =>
      s"CAST(list_sum(list_transform(list_zip($a, $b), z -> z[1] * z[2])) AS BIGINT)"
    // argmin assignment against centroid frame `c`, keeping the distance
    def assign(c: String, out: String) =
      s"""$out AS (
         |  SELECT id, qv, qq, cell, dd FROM (
         |    SELECT e.id, e.qv, e.qq, c.cell,
         |      e.qq + c.cc - 2 * ${dot("e.qv", "c.cv")} AS dd,
         |      row_number() OVER (PARTITION BY e.id ORDER BY
         |        e.qq + c.cc - 2 * ${dot("e.qv", "c.cv")}, c.cell) AS rn
         |    FROM qn e CROSS JOIN $c c)
         |  WHERE rn = 1)""".stripMargin
    def update(a: String, out: String) =
      s"""${out}d AS (
         |  SELECT cell, i, CAST(sum(v) AS BIGINT) // count(*) AS m
         |  FROM (SELECT cell, unnest(qv) AS v,
         |          unnest(generate_series(1, len(qv))) AS i FROM $a)
         |  GROUP BY cell, i),
         |$out AS (
         |  SELECT cell, cv, ${dot("cv", "cv")} AS cc
         |  FROM (SELECT cell, list(m ORDER BY i) AS cv FROM ${out}d GROUP BY cell))""".stripMargin
    s"""WITH q AS (
      |  SELECT vec_id AS id, ${graft.core.Exact.sqlQuantize("embedding", 1000)} AS qv
      |  FROM embeddings),
      |qn AS (SELECT id, qv, ${dot("qv", "qv")} AS qq FROM q),
      |c0 AS (SELECT id AS cell, qv AS cv, ${dot("qv", "qv")} AS cc FROM q WHERE id < 8),
      |${assign("c0", "a0")},
      |${update("a0", "c1")},
      |${assign("c1", "a1")},
      |${update("a1", "c2")},
      |${assign("c2", "a2")}
      |SELECT 0 AS round, CAST(sum(dd) AS BIGINT) AS inertia FROM a0
      |UNION ALL SELECT 1, CAST(sum(dd) AS BIGINT) FROM a1
      |UNION ALL SELECT 2, CAST(sum(dd) AS BIGINT) FROM a2
      |ORDER BY round""".stripMargin
  }

  def profileCustomer(s: SparkSession, d: String): DataFrame =
    Profiler.profile(Tables.customer(s, d),
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
      .orderBy(col("column"))

  val profileCustomerSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  CAST(sum(CAST($c IS NULL AS BIGINT)) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM customer""".stripMargin
    Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      .map(one).mkString("\nUNION ALL\n") + "\nORDER BY \"column\""
  }

  /** p5 — FIXED-BIN HISTOGRAM SKETCH of a money column (prices in exact
    * cents): 20 equi-width integer bins over the observed [min, max],
    * with per-bin and cumulative counts. This is the profile you
    * actually compute at 100 TB — bounded mergeable state (20 counters
    * per partition, one map-side combine) where q22's exact percentiles
    * need a full sort — and the cumulative column brackets any quantile
    * to a bin without touching the data again. Bin width is
    * ((max−min) div 20) + 1, which provably lands max in bin 19;
    * empty bins are emitted explicitly (a silent gap reads as "no data
    * between these prices" either way, so say so with a zero). */
  def priceHistogram(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = Tables.lineitem(s, d)
      .select(expr("cast(round(l_extendedprice * 100) as bigint)").as("c"))
    val st = cents.agg(min(col("c")).as("mn"), max(col("c")).as("mx"))
      .withColumn("w", expr("((mx - mn) div 20) + 1"))
      .where(col("mn").isNotNull) // empty input → zero bins, not 20 null rows
    val counts = cents.crossJoin(broadcast(st))
      .select(expr("(c - mn) div w").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val bins = s.range(0, 20).toDF("bin").crossJoin(broadcast(st))
      .select(col("bin"), (col("mn") + col("bin") * col("w")).as("lo_cents"),
        (col("mn") + (col("bin") + 1) * col("w") - 1).as("hi_cents"))
    val wCum = Window.orderBy(col("bin"))
    bins.join(counts, Seq("bin"), "left")
      .select(col("bin"), col("lo_cents"), col("hi_cents"),
        coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("cum", sum(col("n")).over(wCum))
      .orderBy(col("bin"))
  }

  val priceHistogramSql: String =
    """WITH c AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
      |st AS (
      |  SELECT min(c) AS mn, max(c) AS mx,
      |    ((max(c) - min(c)) // 20) + 1 AS w FROM c),
      |counts AS (
      |  SELECT (c - mn) // w AS bin, count(*) AS n
      |  FROM c CROSS JOIN st GROUP BY 1),
      |bins AS (
      |  SELECT g.b AS bin, mn + g.b * w AS lo_cents,
      |    mn + (g.b + 1) * w - 1 AS hi_cents
      |  FROM st CROSS JOIN generate_series(0, 19) g(b))
      |SELECT bin, lo_cents, hi_cents, CAST(coalesce(n, 0) AS BIGINT) AS n,
      |  CAST(sum(coalesce(n, 0)) OVER (ORDER BY bin) AS BIGINT) AS cum
      |FROM bins LEFT JOIN counts USING (bin) ORDER BY bin""".stripMargin

  /** p6 — COUNT-MIN SKETCH over the corpus vocabulary, with its exact
    * counterpart: 4 hash rows × 64 buckets of summed word frequencies
    * (256 counters of bounded MERGEABLE state — the heavy-hitter
    * profile a 100 TB corpus keeps where exact per-word tables don't
    * fit), probed with the top-20 words so the gate pins estimate vs
    * truth (CM never under-estimates; collisions only inflate). The
    * bucket hash is two hex digits of `md5("<d>|" + word)` — computed
    * with the SAME expression in Spark and DuckDB, so the gate is
    * hash-exact across engines. Built here from the word-count table to
    * share work with the probe selection; at scale the sketch sums
    * occurrences directly in one map-side-combinable pass (identical
    * bucket sums, no exact table needed). */
  /** Hash row `dd`'s bucket for the `word` column — two hex digits of
    * md5("<dd>|" + word) mod 64, the expression the DuckDB oracle
    * mirrors verbatim. Shared by batch p6 and streaming st19 so the
    * twins can never drift. */
  private[graft] def cmBucket(dd: Int) = expr(
    s"""((locate(substring(md5(concat('$dd|', word)), 31, 1), '0123456789abcdef') - 1) * 16
       | + locate(substring(md5(concat('$dd|', word)), 32, 1), '0123456789abcdef') - 1) % 64""".stripMargin)

  def countMin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // NULL text contributes zero tokens — the oracle's
    // unnest(string_split_regex(trim(NULL))) drops the row, and the
    // streaming twin st19 filters identically, so all three agree.
    val toks = Tables.documents(s, d)
      .where(col("text").isNotNull)
      .select(col("text")).as[String]
      .flatMap(_.trim.split("\\s+"))
      .toDF("word")
    countMinOf(toks)
  }

  /** [[countMin]] over an explicit one-column `word` token frame — the
    * estimate-vs-TRUTH spec drives this directly (the round-11 lesson:
    * a mirrored oracle faithfully reproduces a degenerate hash, so only
    * a ground-truth comparison can catch one). */
  private[graft] def countMinOf(toks: DataFrame): DataFrame = {
    val wc = toks.groupBy("word").agg(count(lit(1)).as("n"))
      .localCheckpoint() // reused three times below
    val hb = wc.select(col("word"), col("n"),
      explode(array((0 until 4).map(dd =>
        struct(lit(dd).as("d"), cmBucket(dd).as("bucket"))): _*)).as("db"))
      .select(col("word"), col("n"), col("db.d").as("d"), col("db.bucket").as("bucket"))
    val sketch = hb.groupBy("d", "bucket").agg(sum(col("n")).as("bsum"))
    val probes = wc.orderBy(col("n").desc, col("word").asc).limit(20)
    probes.select(col("word"), col("n").as("exact_n"))
      .join(hb.select(col("word"), col("d"), col("bucket")), "word")
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy(col("word"), col("exact_n"))
      .agg(min(col("bsum")).as("cm_n"))
      .orderBy(col("exact_n").desc, col("word").asc)
  }

  val countMinSql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents),
      |wc AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
      |dep AS (SELECT unnest(generate_series(0, 3)) AS d),
      |hb AS (
      |  SELECT w.word, w.n, d.d,
      |    ((strpos('0123456789abcdef', substr(md5(CAST(d.d AS VARCHAR) || '|' || w.word), 31, 1)) - 1) * 16
      |     + strpos('0123456789abcdef', substr(md5(CAST(d.d AS VARCHAR) || '|' || w.word), 32, 1)) - 1) % 64 AS bucket
      |  FROM wc w CROSS JOIN dep d),
      |sk AS (SELECT d, bucket, sum(n) AS bsum FROM hb GROUP BY d, bucket),
      |probe AS (SELECT word, n FROM wc ORDER BY n DESC, word ASC LIMIT 20)
      |SELECT p.word, CAST(p.n AS BIGINT) AS exact_n, CAST(min(s.bsum) AS BIGINT) AS cm_n
      |FROM probe p JOIN hb ON hb.word = p.word
      |JOIN sk s ON s.d = hb.d AND s.bucket = hb.bucket
      |GROUP BY p.word, p.n
      |ORDER BY exact_n DESC, p.word ASC""".stripMargin

  /** p7 — HLL ESTIMATE vs EXACT: the harmonic-mean estimator applied to
    * t15's register table, per source, beside the true distinct count
    * and the signed error in permille — the calibration table that
    * tells an operator what m = 16 registers actually buys (at ~25 docs
    * per source the raw estimator sits in its known small-range bias
    * regime; the table SHOWS that rather than hiding it, which is the
    * point of a measured sketch family: p5 histogram, p6 count-min, p7
    * HLL). Everything is fixed-point integer — `S = Σ 2^(32−min(M_j,32))`
    * is an exact integer (absent buckets contribute 2³²; ranks past 32
    * floor to zero), and `est = (673·256·2³²) div (1000·S)` is the
    * α₁₆ m² 2³² / S harmonic form under integer division — so both
    * engines agree to the last digit. Ranks are binary leading zeros
    * (the round-12 estimate-vs-truth catch: hex-digit ranks under a
    * binary weighting collapsed estimates ~4× per decade, identically
    * on both engines). Merge story unchanged from t15: registers
    * max-merge across shards; the estimate is a 16-row-per-source
    * fold. */
  def hllEstimate(s: SparkSession, d: String): DataFrame = {
    val h = md5(coalesce(col("text"), lit("")))
    val docs = Tables.documents(s, d).select(col("source"), h.as("h"))
    hllEstimateFrom(s, docs, TextAnalysis.hllRegisters(s, d))
  }

  /** [[hllEstimate]] over explicit `(source, h)` rows and a register
    * table — driven directly by the estimate-vs-truth spec on corpora of
    * known cardinality. */
  private[graft] def hllEstimateFrom(s: SparkSession, docs: DataFrame,
                                     regs: DataFrame): DataFrame = {
    val sources = docs.select(col("source")).distinct()
    val full = sources.crossJoin(s.range(0, 16).toDF("bucket"))
      .join(regs, Seq("source", "bucket"), "left")
      .withColumn("m", coalesce(col("max_rank"), lit(0)))
    // fixed-point 2⁻ᴹ accumulator at scale 2³², clamped at M = 32 (ranks
    // can reach 61 since the round-12 binary-rank fix; contributions
    // below 2⁻³² floor to zero — a documented fixed-point truncation)
    val ssum = full.groupBy(col("source"))
      .agg(sum(expr("shiftleft(cast(1 as bigint), 32 - least(m, 32))")).as("sm"))
    val exact = docs.groupBy(col("source"))
      .agg(count_distinct(col("h")).as("n_exact"))
    exact.join(ssum, "source")
      .withColumn("est", expr("(cast(673 as bigint) * 256 * 4294967296) div (1000 * sm)"))
      .withColumn("err_permille", expr("((est - n_exact) * 1000) div n_exact"))
      .select(col("source"), col("n_exact"), col("est"), col("err_permille"))
      .orderBy(col("source"))
  }

  val hllEstimateSql: String =
    """WITH h AS (
      |  SELECT source, md5(coalesce(text, '')) AS h FROM documents),
      |regs AS (
      |  SELECT source, bucket, max(rank) AS max_rank FROM (
      |    SELECT source, bucket,
      |      CASE WHEN z = 15 THEN 61 ELSE
      |        4 * z + (CASE WHEN strpos('123456789abcdef', substr(hx, z + 1, 1)) >= 8 THEN 0
      |                      WHEN strpos('123456789abcdef', substr(hx, z + 1, 1)) >= 4 THEN 1
      |                      WHEN strpos('123456789abcdef', substr(hx, z + 1, 1)) >= 2 THEN 2
      |                      ELSE 3 END) + 1 END AS rank
      |    FROM (
      |      SELECT source, hx, length(regexp_extract(hx, '^0*')) AS z,
      |        CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS INT) AS bucket
      |      FROM (SELECT source, h, substr(h, 2, 15) AS hx FROM h)))
      |  GROUP BY source, bucket),
      |fb AS (
      |  SELECT s.source, g.b AS bucket, coalesce(r.max_rank, 0) AS m
      |  FROM (SELECT DISTINCT source FROM h) s
      |  CROSS JOIN generate_series(0, 15) g(b)
      |  LEFT JOIN regs r ON r.source = s.source AND r.bucket = g.b),
      |ssum AS (
      |  SELECT source, CAST(sum(CAST(1 AS BIGINT) << (32 - least(m, 32))) AS BIGINT) AS sm
      |  FROM fb GROUP BY source),
      |ex AS (SELECT source, count(DISTINCT h) AS n_exact FROM h GROUP BY source)
      |SELECT source, n_exact, est,
      |  ((est - n_exact) * 1000) // n_exact AS err_permille
      |FROM (
      |  SELECT e.source, CAST(e.n_exact AS BIGINT) AS n_exact,
      |    (CAST(673 AS BIGINT) * 256 * 4294967296) // (1000 * m.sm) AS est
      |  FROM ex e JOIN ssum m ON m.source = e.source)
      |ORDER BY source""".stripMargin

  /** p8 — FREQUENCY SPECTRUM (count-of-counts): for each occurrence
    * count k, the number of vocabulary words seen exactly k times — the
    * Good–Turing input table and the profile that tells a corpus
    * curator how heavy the singleton tail is (smoothing mass, hapax
    * ratio, Zipf fit all read straight off it). Two map-side-combinable
    * aggregations; the result is O(distinct k) ≈ O(log corpus) rows, so
    * it is one of the cheapest corpus-wide profiles that exists at any
    * scale. Tokenization shared with p6 (NULL text drops the row). */
  def frequencySpectrum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .where(col("text").isNotNull)
      .select(col("text")).as[String]
      .flatMap(_.trim.split("\\s+"))
      .toDF("word")
    toks.groupBy("word").agg(count(lit(1)).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_words"))
      .orderBy(col("k"))
  }

  val frequencySpectrumSql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents),
      |wc AS (SELECT word, count(*) AS k FROM toks GROUP BY word)
      |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_words
      |FROM wc GROUP BY k ORDER BY k""".stripMargin

  /** p9 — MISRA-GRIES-PREFILTERED HEAVY HITTERS: corpus words with
    * frequency ≥ ⌈total/2000⌉, computed WITHOUT shuffling the full
    * token stream. Stage 1 runs a k=4096-counter Misra-Gries sketch
    * per partition (one map pass, bounded memory) and ships only the
    * surviving candidate words; stage 2 recounts candidates exactly via
    * a semi-join — the t32 Bloom pattern applied to frequency instead
    * of membership. No false negatives by pigeonhole: a word absent
    * from EVERY partition sketch has count ≤ Σₚ totalₚ/(k+1) =
    * total/4097 < total/2000 ≤ the threshold, so every true heavy
    * hitter reaches the exact stage, and stage 2 removes all false
    * positives. The threshold rides as a broadcast scalar (integer
    * ceil), never a driver read. */
  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .where(col("text").isNotNull)
      .select(col("text")).as[String]
      .flatMap(_.trim.split("\\s+"))
    heavyHittersOf(toks, k = 4096, denom = 2000L)
  }

  private[graft] def heavyHittersOf(toks: org.apache.spark.sql.Dataset[String],
      k: Int, denom: Long): DataFrame = {
    import toks.sparkSession.implicits._
    val cands = toks.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { w =>
        if (counts.contains(w) || counts.size < k) {
          counts(w) = counts.getOrElse(w, 0L) + 1L
        } else {
          // classic MG step: a full sketch + unseen word decrements all
          val dead = counts.iterator.collect { case (key, 1L) => key }.toList
          counts.mapValuesInPlace((_, v) => v - 1L)
          dead.foreach(counts.remove)
        }
      }
      counts.keysIterator
    }.toDF("word").distinct()
    val words = toks.toDF("word")
    val tot = words.agg(count(lit(1)).as("tot"))
    words.join(cands, Seq("word"), "left_semi")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .crossJoin(tot)
      .where(col("n") >= expr(s"(tot + ${denom - 1}) div $denom"))
      .select(col("word"), col("n"))
      .orderBy(col("n").desc, col("word"))
  }

  val heavyHittersSql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
      |  FROM documents WHERE text IS NOT NULL),
      |wc AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
      |tot AS (SELECT count(*) AS t FROM toks)
      |SELECT word, CAST(n AS BIGINT) AS n FROM wc, tot
      |WHERE n >= (t + 1999) // 2000
      |ORDER BY n DESC, word""".stripMargin

  /** p10 — EXACT GROUPED QUANTILES by cumulative value-bucket histogram:
    * the inverse-CDF (type-1) quantile q_p = smallest v with
    * #(values ≤ v) ≥ ⌈p·n/100⌉, computed WITHOUT sorting raw rows.
    * Spark's exact `percentile` buffers every value of a group in one
    * aggregator (driver-sized state at 100 TB) and approx_percentile
    * can't be oracle-gated; this shape aggregates (group, value) →
    * count FIRST (map-side combinable — a billion-row group shrinks to
    * its distinct values before the shuffle), cumulative-sums the
    * counts per group, and reads every requested percentile out of ONE
    * pass with conditional min aggregates. Same hub-safety argument as
    * g34's count-above-threshold H-index: the only per-group sort runs
    * over distinct VALUES, not rows. Integer-exact throughout (prices
    * as cents, ⌈⌉ via cum·100 ≥ p·n), so both engines agree to the
    * digit. Gate: order-total quantiles per order priority. */
  def exactQuantiles(s: SparkSession, d: String): DataFrame =
    quantilesOf(
      Tables.orders(s, d).select(col("o_orderpriority").as("g"),
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)").as("v")),
      Seq(50, 90, 99))
      .orderBy(col("g"))

  /** Inverse-CDF quantiles of (g, v) rows for integer percents — the
    * seam st30's merged read reuses, so the batch gate and the streaming
    * twin can never drift. */
  private[graft] def quantilesOf(gv: DataFrame, pcts: Seq[Int]): DataFrame =
    quantilesOfCounts(
      gv.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt")), pcts)

  private[graft] def quantilesOfCounts(counts: DataFrame, pcts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    cum.groupBy(col("g"))
      .agg(pcts.map(p =>
          min(when(col("cum") * 100 >= col("n") * p, col("v"))).as(s"p${p}_cents")).head,
        pcts.tail.map(p =>
          min(when(col("cum") * 100 >= col("n") * p, col("v"))).as(s"p${p}_cents")): _*)
  }

  val exactQuantilesSql: String =
    """WITH v AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |c AS (SELECT g, v, count(*) AS cnt FROM v GROUP BY 1, 2),
      |cum AS (
      |  SELECT g, v, sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum,
      |         sum(cnt) OVER (PARTITION BY g) AS n
      |  FROM c)
      |SELECT g,
      |  CAST(min(CASE WHEN cum * 100 >= n * 50 THEN v END) AS BIGINT) AS p50_cents,
      |  CAST(min(CASE WHEN cum * 100 >= n * 90 THEN v END) AS BIGINT) AS p90_cents,
      |  CAST(min(CASE WHEN cum * 100 >= n * 99 THEN v END) AS BIGINT) AS p99_cents
      |FROM cum GROUP BY g ORDER BY g""".stripMargin

  /** p21 — MERGEABLE QUANTILE SKETCH (bottom-k-by-hash / KMV uniform
    * sample): p10's exact histogram quantiles assume the value-bucket
    * spectrum is bounded; the 100 TB tier also wants a sketch whose
    * state is bounded REGARDLESS of the value distribution. Per group,
    * keep the k rows with the SMALLEST md5(value#id) draw keys — a
    * uniform hash makes "bottom k keys" a uniform k-sample, and the
    * bottom-k set is a semilattice (merge = union + re-truncate:
    * associative, commutative, IDEMPOTENT — re-delivered partials are
    * absorbed, the property count-based sketches lack). The engine
    * carries it through [[graft.functions.BottomKAggS]] — O(k) buffers
    * with map-side combine, so shuffle volume per group is ≤ k rows no
    * matter how many billions the group holds; the quantile read is
    * p10's own inverse-CDF over the sample ([[quantilesOfCounts]] —
    * one shared seam, so sketch and exact can never disagree about
    * quantile semantics, only about sampling error).
    *
    * Determinism discipline: the draw key is md5 (identical hex in both
    * engines), so the gate's oracle can restate the SAME selection via
    * row_number — that pins cross-engine agreement of the mechanism,
    * while the ACCURACY claim lives in the estimate-vs-truth spec
    * (rank error vs exact p10 bounded by the DKW envelope for k=256 —
    * never an oracle mirror, the g38/HLL house rule). Hash-draw
    * pitfall note: the draw ORDERS by the full 128-bit hex, no mod-k
    * anywhere, so the polynomial-mod degeneracy the memory rule warns
    * about cannot arise. */
  def sketchQuantiles(s: SparkSession, d: String): DataFrame =
    sketchQuantilesOf(
      Tables.orders(s, d).select(col("o_orderpriority").as("g"),
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)").as("v"),
        col("o_orderkey").as("id")),
      SketchK, Seq(50, 90, 99))
      .orderBy(col("g"))

  /** Sample size per group: 256 draws ⇒ DKW rank error ≲ 10% of the
    * group at 99% confidence — the profiling tier's accuracy; bump k
    * for tighter envelopes, state stays k rows/group. */
  private[graft] val SketchK = 256

  /** The draw-keyed rows: (g, hk, v) with hk = md5("v#id"). */
  private[graft] def drawKeyed(gvi: DataFrame): DataFrame =
    gvi.select(col("g").cast("string").as("g"),
      md5(concat_ws("#", col("v").cast("string"), col("id").cast("string")))
        .as("hk"),
      col("v").cast("long").as("v"))

  /** Bottom-k draw keys per group over (g, hk, v) rows — the sketch
    * state AND its merge: feeding unioned partial samples back through
    * this is the semilattice merge (spec-pinned idempotent/commutative/
    * order-blind). */
  private[graft] def bottomK(ghv: DataFrame, k: Int): DataFrame = {
    val s = ghv.sparkSession
    import s.implicits._
    val agg = new graft.functions.BottomKAggS(k)
    ghv.select(col("g"), col("hk"), col("v")).as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("samp"))
      .flatMap { case (g, samp) => samp.map { case (hk, v) => (g, hk, v) } }
      .toDF("g", "hk", "v")
  }

  /** [[sketchQuantiles]] over an explicit (g, v, id) frame. */
  private[graft] def sketchQuantilesOf(gvi: DataFrame, k: Int,
      pcts: Seq[Int]): DataFrame =
    quantilesOfCounts(
      bottomK(drawKeyed(gvi), k)
        .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt")),
      pcts)

  val sketchQuantilesSql: String =
    s"""WITH v AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
      |    o_orderkey AS id
      |  FROM orders),
      |h AS (
      |  SELECT g, v,
      |    md5(CAST(v AS VARCHAR) || '#' || CAST(id AS VARCHAR)) AS hk
      |  FROM v),
      |r AS (
      |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY hk, v) AS rn
      |  FROM h),
      |samp AS (SELECT g, v FROM r WHERE rn <= $SketchK),
      |c AS (SELECT g, v, count(*) AS cnt FROM samp GROUP BY 1, 2),
      |cum AS (
      |  SELECT g, v, sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum,
      |         sum(cnt) OVER (PARTITION BY g) AS n
      |  FROM c)
      |SELECT g,
      |  CAST(min(CASE WHEN cum * 100 >= n * 50 THEN v END) AS BIGINT) AS p50_cents,
      |  CAST(min(CASE WHEN cum * 100 >= n * 90 THEN v END) AS BIGINT) AS p90_cents,
      |  CAST(min(CASE WHEN cum * 100 >= n * 99 THEN v END) AS BIGINT) AS p99_cents
      |FROM cum GROUP BY g ORDER BY g""".stripMargin

  /** p22 — MERGEABLE Misra–Gries heavy hitters: p9 already prefilters
    * token heavy hitters with a per-partition MG pass, but that form is
    * one-shot — its sketches are unioned as candidate SETS, and st25's
    * docstring names the resulting limitation outright ("MG sketches are
    * not [losslessly mergeable]"), which is why st25 falls back to
    * vocabulary-sized exact partials per batch. p22 carries the summary
    * the OTHER way: [[graft.functions.MisraGriesAgg]] implements the
    * PODS'12 mergeable-summaries construction (sum counters pointwise,
    * subtract the (m+1)-th largest, drop non-positive), so the m-counter
    * bound and the n/(m+1) error guarantee survive ARBITRARY combine
    * trees — a normal map-side-combining aggregate here, and bounded
    * m-rows-per-batch state in the st63 twin where st25 needs the whole
    * vocabulary. Pass 2 exactly recounts the ≤ m survivors and filters
    * by the true threshold `cnt · k > n`, so the final answer is EXACT
    * and merge-shape-blind (MG counter VALUES are order-sensitive; the
    * superset guarantee is not) — which is what lets a plain
    * GROUP-BY/HAVING oracle state it. The driver sees only the ≤ m
    * candidates (bounded read). Gate value: length(bin(orderkey)) —
    * frequencies double per bucket, so the top buckets genuinely clear
    * the 1/8 bar while most values don't. */
  def mgHeavyHitters(s: SparkSession, d: String): DataFrame =
    mgHeavyHittersOf(
      Tables.lineitem(s, d)
        .select(expr("cast(length(bin(l_orderkey)) as long)").as("v")),
      HhM, HhK)
      .orderBy(col("v"))

  private[graft] val HhM = 16 // summary counters (error ≤ n/17)
  private[graft] val HhK = 8  // heavy = more than n/8 occurrences

  /** Pass 1: the MG candidate values — at most `m` of them, the one
    * driver-side read this operator makes. */
  private[graft] def mgCandidates(v: DataFrame, m: Int): Seq[Long] = {
    val s = v.sparkSession
    import s.implicits._
    val agg = new graft.functions.MisraGriesAgg(m)
    v.select(col("v")).as[Long].select(agg.toColumn)
      .collect().headOption.map(_.keys.toSeq.sorted).getOrElse(Seq.empty)
  }

  /** [[mgHeavyHitters]] over an explicit single-column `v` frame. */
  private[graft] def mgHeavyHittersOf(df: DataFrame, m: Int, k: Int): DataFrame = {
    val cands = mgCandidates(df, m)
    if (cands.isEmpty)
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("v BIGINT, n_rows BIGINT"))
    // pass 2: exact recount of the ≤ m candidates against the full scan;
    // the 1-row total rides a broadcast (the house 1-row crossJoin)
    val counts = df.where(col("v").isin(cands: _*))
      .groupBy(col("v")).agg(count(lit(1)).as("n_rows"))
    val tot = df.agg(count(lit(1)).as("n"))
    counts.crossJoin(broadcast(tot))
      .where(col("n_rows") * k > col("n"))
      .select(col("v"), col("n_rows"))
  }

  val mgHeavyHittersSql: String =
    s"""WITH b AS (SELECT CAST(length(bin(l_orderkey)) AS BIGINT) AS v
      |           FROM lineitem),
      |t AS (SELECT count(*) AS n FROM b),
      |c AS (SELECT v, count(*) AS cnt FROM b GROUP BY v)
      |SELECT v, cnt AS n_rows FROM c, t WHERE cnt * $HhK > n
      |ORDER BY v""".stripMargin

  /** p11 — EXACT GROUPED MODE over the value-bucket histogram: the most
    * frequent value per group with a deterministic lowest-value
    * tie-break, plus the group's distinct-value and row counts. Same
    * hub-safety argument as p10: the raw rows collapse to (group, value)
    * counts map-side FIRST, and the only per-group ranking runs over
    * distinct VALUES — a billion-row group costs its value spectrum.
    * (SQL `mode()` leaves ties unspecified, so both engines state the
    * argmax explicitly.) */
  def groupedMode(s: SparkSession, d: String): DataFrame =
    modeOf(Tables.lineitem(s, d).select(col("l_returnflag").as("g"),
      col("l_quantity").cast("long").as("v")))
      .orderBy(col("g"))

  private[graft] def modeOf(gv: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = gv.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("g")).orderBy(col("cnt").desc, col("v").asc)
    val mode = counts.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("g"), col("v").as("mode_v"), col("cnt").as("n_mode"))
    val per = counts.groupBy(col("g"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("cnt")).as("n_rows"))
    mode.join(per, "g")
  }

  val groupedModeSql: String =
    """WITH c AS (
      |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v, count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (
      |  SELECT g, v AS mode_v, cnt AS n_mode,
      |    row_number() OVER (PARTITION BY g ORDER BY cnt DESC, v ASC) AS rn
      |  FROM c),
      |p AS (
      |  SELECT g, count(*) AS n_distinct, CAST(sum(cnt) AS BIGINT) AS n_rows
      |  FROM c GROUP BY g)
      |SELECT m.g, mode_v, n_mode, n_distinct, n_rows
      |FROM m JOIN p ON m.g = p.g WHERE rn = 1 ORDER BY m.g""".stripMargin

  /** p12 — REFERENTIAL-INTEGRITY AUDIT: orphan foreign-key counts
    * across the whole star schema — the expectations pass a pipeline
    * runs BEFORE joining 100 TB on those keys, because an orphan that
    * would silently vanish in an inner join (or explode a row count in
    * an outer one) should be a measured number first. One fixed row per
    * relationship; explicit zeros are the point (they PROVE
    * cleanliness; a missing row proves nothing). Each check is a
    * left-anti join of child keys against distinct parent keys — the
    * parent side collapses to its key set before any shuffle, and no
    * check touches a non-key column. */
  def referentialAudit(s: SparkSession, d: String): DataFrame = {
    def orphans(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame =
      child.select(col(key).as("k")).where(col("k").isNotNull)
        .join(parent.select(col(pkey).as("k")).distinct(), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("chk"), col("n_orphans"))
    val li = Tables.lineitem(s, d)
    Seq(
      orphans("customer_nationkey", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey"),
      orphans("lineitem_orderkey", li, "l_orderkey",
        Tables.orders(s, d), "o_orderkey"),
      orphans("lineitem_partkey", li, "l_partkey",
        Tables.part(s, d), "p_partkey"),
      orphans("lineitem_suppkey", li, "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"),
      orphans("nation_regionkey", Tables.nation(s, d), "n_regionkey",
        Tables.region(s, d), "r_regionkey"),
      orphans("orders_custkey", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"),
      orphans("supplier_nationkey", Tables.supplier(s, d), "s_nationkey",
        Tables.nation(s, d), "n_nationkey"),
    ).reduce[DataFrame](_ unionByName _).orderBy(col("chk"))
  }

  val referentialAuditSql: String = {
    val checks = Seq(
      ("customer_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("lineitem_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("nation_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
      ("orders_custkey", "orders", "o_custkey", "customer", "c_custkey"),
      ("supplier_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ).map { case (nm, c, k, p, pk) =>
      s"""SELECT '$nm' AS chk,
         |  (SELECT count(*) FROM $c
         |   WHERE $k IS NOT NULL AND $k NOT IN (SELECT $pk FROM $p)) AS n_orphans""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""SELECT chk, n_orphans FROM (
      |  $checks)
      |ORDER BY chk""".stripMargin
  }

  /** p13 — FUNCTIONAL-DEPENDENCY AUDIT: does X determine Y? For each
    * candidate FD the violation profile a schema-inference / data-
    * contract pass needs before trusting a column as a derivable
    * attribute: distinct determinant groups, groups carrying >1
    * dependent value, and the minimal row-repair count Σ(|Y per X|−1).
    * The candidate list mixes FDs that HOLD on TPC-H-shaped data
    * (nation→region, the PK FDs — explicit zeros prove them) with ones
    * that don't (order→supplier fans out per line). Shape: each check
    * collapses to DISTINCT (x, y) pairs BEFORE any counting — the
    * shuffle carries the pair cardinality, not the table — then two
    * map-combinable aggregations; null determinants and dependents are
    * excluded by the stated contract (SQL NULL ≠ NULL would make every
    * null row its own vacuous group). */
  def fdAudit(s: SparkSession, d: String): DataFrame = {
    def check(name: String, df: DataFrame, det: String, dep: String): DataFrame =
      df.select(col(det).as("x"), col(dep).as("y"))
        .where(col("x").isNotNull && col("y").isNotNull)
        .distinct()
        .groupBy(col("x")).agg(count(lit(1)).as("ny"))
        .agg(count(lit(1)).as("n_groups"),
          coalesce(sum(when(col("ny") > 1, 1L).otherwise(0L)), lit(0L)).as("n_bad_groups"),
          coalesce(sum(col("ny") - 1), lit(0L)).as("n_violations"))
        .select(lit(name).as("fd"), col("n_groups"), col("n_bad_groups"),
          col("n_violations"))
    Seq(
      check("customer_nation_to_segment", Tables.customer(s, d), "c_nationkey", "c_mktsegment"),
      check("lineitem_order_to_supplier", Tables.lineitem(s, d), "l_orderkey", "l_suppkey"),
      check("nation_to_region", Tables.nation(s, d), "n_nationkey", "n_regionkey"),
      check("orders_to_custkey", Tables.orders(s, d), "o_orderkey", "o_custkey"),
      check("part_brand_to_type", Tables.part(s, d), "p_brand", "p_type"),
      check("part_to_brand", Tables.part(s, d), "p_partkey", "p_brand"),
    ).reduce[DataFrame](_ unionByName _).orderBy(col("fd"))
  }

  /** The fixed FD report rows, shared with st41's maintained audit. */
  private[graft] val FdNames: Seq[String] = Seq(
    "customer_nation_to_segment", "lineitem_order_to_supplier",
    "nation_to_region", "orders_to_custkey", "part_brand_to_type",
    "part_to_brand")

  val fdAuditSql: String = {
    val checks = Seq(
      ("customer_nation_to_segment", "customer", "c_nationkey", "c_mktsegment"),
      ("lineitem_order_to_supplier", "lineitem", "l_orderkey", "l_suppkey"),
      ("nation_to_region", "nation", "n_nationkey", "n_regionkey"),
      ("orders_to_custkey", "orders", "o_orderkey", "o_custkey"),
      ("part_brand_to_type", "part", "p_brand", "p_type"),
      ("part_to_brand", "part", "p_partkey", "p_brand"),
    ).map { case (nm, t, x, y) =>
      s"""SELECT '$nm' AS fd, count(*) AS n_groups,
         |  CAST(coalesce(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_bad_groups,
         |  CAST(coalesce(sum(ny - 1), 0) AS BIGINT) AS n_violations
         |FROM (SELECT x, count(*) AS ny FROM (
         |        SELECT DISTINCT $x AS x, $y AS y FROM $t
         |        WHERE $x IS NOT NULL AND $y IS NOT NULL)
         |      GROUP BY x)""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""SELECT * FROM (
      |  $checks)
      |ORDER BY fd""".stripMargin
  }

  /** p14 — BENFORD FIRST-DIGIT AUDIT: the leading-significant-digit
    * distribution of o_totalprice against Benford's law — the anomaly
    * screen auditors and data-quality monitors run on naturally-grown
    * monetary columns (synthetic/fabricated/truncated feeds bend the
    * curve long before any row-level rule fires; TPC-H prices are
    * uniform-ish, so a LARGE measured delta here is itself the
    * demonstration that the audit detects non-Benford data). The digit
    * comes from the DECIMAL(12,2) canonical string (both engines
    * render it identically — the p3 exact-carrier rule), never from
    * float log10 whose boundary cells would disagree; expectations are
    * the 9 rounded-ppm literals stated in BOTH engines, and shares are
    * truncating-ppm integer division. Always 9 rows (digit dim
    * left-joins the counts), with NULL shares on an empty column
    * rather than a fake zero. One map-side-combinable groupBy plus a
    * broadcast 1-row total. */
  def benfordAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val benford = BenfordPpm.toSeq.map { case (dg, p) => (dg, p) }
      .toDF("digit", "benford_ppm")
    val first = regexp_extract(
      col("o_totalprice").cast(DecimalType(12, 2)).cast("string"), "[1-9]", 0)
    val counts = Tables.orders(s, d)
      .select(first.as("fd")).where(col("fd") =!= "")
      .select(col("fd").cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(coalesce(sum(col("n")), lit(0L)).as("tot"))
    benford.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        expr("CASE WHEN tot > 0 THEN (1000000 * coalesce(n, 0L)) div tot END")
          .as("share_ppm"),
        col("benford_ppm"))
      .withColumn("delta_ppm", col("share_ppm") - col("benford_ppm"))
      .orderBy(col("digit"))
  }

  /** round(log10(1 + 1/d)·10⁶) — the literal expectation table, shared
    * with the oracle text and pinned by the spec against math.log10. */
  private[graft] val BenfordPpm: Seq[(Long, Long)] = Seq(
    1L -> 301030L, 2L -> 176091L, 3L -> 124939L, 4L -> 96910L,
    5L -> 79181L, 6L -> 66947L, 7L -> 57992L, 8L -> 51153L, 9L -> 45757L)

  val benfordAuditSql: String = {
    val values = BenfordPpm.map { case (dg, p) => s"($dg, $p)" }.mkString(", ")
    s"""WITH f AS (
      |  SELECT regexp_extract(
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), '[1-9]') AS fd
      |  FROM orders),
      |c AS (SELECT CAST(fd AS BIGINT) AS digit, count(*) AS n
      |      FROM f WHERE fd <> '' GROUP BY 1),
      |t AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS tot FROM c),
      |b(digit, benford_ppm) AS (VALUES $values)
      |SELECT CAST(b.digit AS BIGINT) AS digit,
      |  CAST(coalesce(c.n, 0) AS BIGINT) AS n,
      |  CASE WHEN t.tot > 0
      |    THEN CAST((1000000 * coalesce(c.n, 0)) // t.tot AS BIGINT) END AS share_ppm,
      |  CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
      |  CASE WHEN t.tot > 0
      |    THEN CAST((1000000 * coalesce(c.n, 0)) // t.tot - b.benford_ppm AS BIGINT)
      |  END AS delta_ppm
      |FROM b LEFT JOIN c ON c.digit = b.digit CROSS JOIN t
      |ORDER BY digit""".stripMargin
  }

  /** p15 — JOIN-SIZE AUDIT: the output cardinality and hot-key ceiling
    * of every star-schema join, computed from per-key COUNT HISTOGRAMS
    * before the join runs — |A⋈B| = Σ_k cA(k)·cB(k) exactly, and
    * max cA·cB is the largest single-key output (the number that says
    * "salt this" before a 100 TB shuffle discovers it the hard way).
    * Two groupBy-count passes and one key-equi-join of the HISTOGRAMS
    * (cardinality = distinct keys, not rows) per relationship — the
    * audit costs a scan, the join it predicts costs a shuffle. The
    * oracle is deliberately a DIFFERENT computation: it runs the TRUE
    * join and counts rows, so the gate proves the histogram formula
    * equals reality, not that two copies of the formula agree. */
  def joinSizeAudit(s: SparkSession, d: String): DataFrame = {
    def est(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String): DataFrame = {
      val la = left.where(col(lk).isNotNull)
        .groupBy(col(lk).as("k")).agg(count(lit(1)).as("ca"))
      val rb = right.where(col(rk).isNotNull)
        .groupBy(col(rk).as("k")).agg(count(lit(1)).as("cb"))
      val nl = la.agg(coalesce(sum(col("ca")), lit(0L)).as("n_left"))
      val nr = rb.agg(coalesce(sum(col("cb")), lit(0L)).as("n_right"))
      val j = la.join(rb, "k")
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("est_rows"),
          coalesce(max(col("ca") * col("cb")), lit(0L)).as("max_key_rows"))
      nl.crossJoin(nr).crossJoin(j) // three 1-row frames
        .select(lit(name).as("jn"), col("n_left"), col("n_right"),
          col("est_rows"), col("max_key_rows"))
    }
    Seq(
      est("customer_orders", Tables.customer(s, d), "c_custkey",
        Tables.orders(s, d), "o_custkey"),
      est("nation_customer", Tables.nation(s, d), "n_nationkey",
        Tables.customer(s, d), "c_nationkey"),
      est("orders_lineitem", Tables.orders(s, d), "o_orderkey",
        Tables.lineitem(s, d), "l_orderkey"),
      est("part_lineitem", Tables.part(s, d), "p_partkey",
        Tables.lineitem(s, d), "l_partkey"),
      est("supplier_lineitem", Tables.supplier(s, d), "s_suppkey",
        Tables.lineitem(s, d), "l_suppkey"),
    ).reduce[DataFrame](_ unionByName _).orderBy(col("jn"))
  }

  val joinSizeAuditSql: String = {
    val checks = Seq(
      ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
      ("nation_customer", "nation", "n_nationkey", "customer", "c_nationkey"),
      ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
      ("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
      ("supplier_lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"),
    ).map { case (nm, lt, lk, rt, rk) =>
      s"""SELECT '$nm' AS jn,
         |  (SELECT count(*) FROM $lt WHERE $lk IS NOT NULL) AS n_left,
         |  (SELECT count(*) FROM $rt WHERE $rk IS NOT NULL) AS n_right,
         |  (SELECT count(*) FROM $lt l JOIN $rt r ON l.$lk = r.$rk) AS est_rows,
         |  (SELECT CAST(coalesce(max(ca * cb), 0) AS BIGINT) FROM
         |     (SELECT $lk AS k, count(*) AS ca FROM $lt
         |      WHERE $lk IS NOT NULL GROUP BY 1) a
         |     JOIN (SELECT $rk AS k, count(*) AS cb FROM $rt
         |      WHERE $rk IS NOT NULL GROUP BY 1) b USING (k)) AS max_key_rows""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""SELECT * FROM (
      |  $checks)
      |ORDER BY jn""".stripMargin
  }

  /** p16 — KEY-SKEW GINI: the Lorenz-curve Gini coefficient of each
    * join-key frequency distribution, exact and in ppm — the single
    * number behind every salting/broadcast decision this library makes
    * (g40's spectrum SHOWS the skew; p16 scores it, so a pipeline can
    * alert on "this key got 20 points more unequal since yesterday").
    * For counts x₁ ≤ … ≤ xₙ, G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx); the
    * rank sum collapses to VALUE BUCKETS: a run of m keys sharing count
    * c after r predecessors contributes c·(m·r + m(m+1)/2), so the only
    * ordered pass runs over distinct COUNT VALUES per audited column
    * (the p10/g34 hub-safety discipline — a billion-key column costs
    * its count spectrum, and the window is partitioned per audited
    * column, never global). Integer-exact end to end: all terms are
    * BIGINT products of counts (m(m+1) is always even, so `div 2` is
    * exact), and the final ratio ships as `gini_ppm` with the exact
    * num/den pair beside it. BIGINT envelope: n·total ≤ 9.2×10¹⁸ —
    * beyond that (≳10⁹ keys × 10⁹ rows) the two product columns move
    * to DECIMAL(38,0), a one-line swap. */
  def skewGini(s: SparkSession, d: String): DataFrame = {
    val keyed = Seq(
      Tables.lineitem(s, d).select(lit("lineitem.l_partkey").as("tag"),
        col("l_partkey").cast("long").as("k")),
      Tables.lineitem(s, d).select(lit("lineitem.l_suppkey").as("tag"),
        col("l_suppkey").cast("long").as("k")),
      Tables.orders(s, d).select(lit("orders.o_custkey").as("tag"),
        col("o_custkey").cast("long").as("k")),
      Tables.events(s, d).select(lit("events.user_id").as("tag"),
        col("user_id").cast("long").as("k")),
    ).reduce(_ unionByName _)
    giniOf(keyed).orderBy(col("tag"))
  }

  /** Gini over (tag, k) occurrence rows — property-tested on hand
    * distributions (uniform → 0, one-hot → (n−1)/n) and fuzzed against
    * the O(n log n) sorted-rank formula. */
  private[graft] def giniOf(keyed: DataFrame): DataFrame =
    giniOfCounts(
      keyed.groupBy(col("tag"), col("k")).agg(count(lit(1)).as("c")))

  /** The same coefficient over per-key occurrence COUNTS (tag, k, c) —
    * the seam st50's merged streaming partials share with batch p16
    * (occurrence counts are additive, so a monitor maintains them
    * per-batch and re-derives the Gini at read). */
  private[graft] def giniOfCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = counts.groupBy(col("tag"), col("c")).agg(count(lit(1)).as("m"))
    val w = Window.partitionBy(col("tag")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    buckets.withColumn("r", coalesce(sum(col("m")).over(w), lit(0L)))
      .groupBy(col("tag")).agg(
        sum(col("m")).as("n_keys"),
        sum(col("c") * col("m")).as("total"),
        sum(expr("c * (m * r + (m * (m + 1)) div 2)")).as("s"))
      .select(col("tag"), col("n_keys"), col("total"),
        (lit(2L) * col("s") - (col("n_keys") + lit(1L)) * col("total")).as("num"),
        (col("n_keys") * col("total")).as("den"))
      .withColumn("gini_ppm", expr("(1000000 * num) div den"))
  }

  val skewGiniSql: String =
    """WITH keyed AS (
      |  SELECT 'lineitem.l_partkey' AS tag, CAST(l_partkey AS BIGINT) AS k FROM lineitem
      |  UNION ALL SELECT 'lineitem.l_suppkey', CAST(l_suppkey AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'orders.o_custkey', CAST(o_custkey AS BIGINT) FROM orders
      |  UNION ALL SELECT 'events.user_id', CAST(user_id AS BIGINT) FROM events),
      |cnt AS (SELECT tag, k, count(*) AS c FROM keyed GROUP BY 1, 2),
      |b AS (SELECT tag, c, count(*) AS m FROM cnt GROUP BY 1, 2),
      |r AS (
      |  SELECT tag, c, m,
      |    COALESCE(sum(m) OVER (PARTITION BY tag ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
      |  FROM b),
      |a AS (
      |  SELECT tag, CAST(sum(m) AS BIGINT) AS n_keys,
      |    CAST(sum(c * m) AS BIGINT) AS total,
      |    CAST(sum(c * (m * r + (m * (m + 1)) // 2)) AS BIGINT) AS s
      |  FROM r GROUP BY tag)
      |SELECT tag, n_keys, total,
      |  CAST(2 * s - (n_keys + 1) * total AS BIGINT) AS num,
      |  CAST(n_keys * total AS BIGINT) AS den,
      |  CAST((1000000 * (2 * s - (n_keys + 1) * total)) // (n_keys * total) AS BIGINT) AS gini_ppm
      |FROM a ORDER BY tag""".stripMargin

  /** p17 — MAD OUTLIER SCREEN: robust per-group anomaly counts via the
    * median absolute deviation — the screen that survives the outliers
    * it hunts (a z-score's mean and σ are dragged by the very anomalies
    * being flagged; the median and MAD have 50% breakdown). Per group:
    * type-1 median m (p10's inverse-CDF over value buckets), deviations
    * |v − m|, their type-1 median MAD, and the count of rows with
    * |v − m| > 3·MAD. Two value-bucket histogram passes (the p10/g34
    * hub-safety argument both times — per-group sorts ride distinct
    * VALUES), the per-group scalars ride back as broadcast dims, and
    * everything is integer cents so both engines agree to the digit.
    * Flag rule stated strictly (> 3·MAD): with MAD = 0 — over half the
    * group at one value — any deviation at all is an outlier, the
    * conventional degenerate-MAD reading. */
  def madOutliers(s: SparkSession, d: String): DataFrame = {
    val gv = Tables.orders(s, d).select(col("o_orderpriority").as("g"),
      expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)").as("v"))
    madOutliersOf(gv).orderBy(col("g"))
  }

  /** MAD screen over explicit (g, v) rows — property-tested on hand
    * groups (exact type-1 medians on even counts, MAD = 0 degeneracy)
    * and fuzzed against a local sort-based recount. */
  private[graft] def madOutliersOf(gv: DataFrame): DataFrame =
    madOutliersOfCounts(
      gv.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt")))

  /** The same screen over a (g, v, cnt) VALUE-BUCKET HISTOGRAM — the
    * seam st49's merged streaming partials share with batch p17: both
    * median passes and the outlier count read the histogram, so the
    * state a streaming monitor keeps per group is its value spectrum,
    * never its rows. */
  private[graft] def madOutliersOfCounts(counts: DataFrame): DataFrame = {
    val med = quantilesOfCounts(counts, Seq(50))
      .select(col("g"), col("p50_cents").as("m"))
    val dev = counts.join(broadcast(med), "g")
      .withColumn("dv", abs(col("v") - col("m")))
    val devCounts = dev.groupBy(col("g"), col("dv").as("v"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = quantilesOfCounts(devCounts, Seq(50))
      .select(col("g"), col("p50_cents").as("mad_cents"))
    dev.join(broadcast(mad), "g")
      .groupBy(col("g"))
      .agg(max(col("m")).as("median_cents"), // constant within the group
        max(col("mad_cents")).as("mad_cents"),
        sum(col("cnt")).as("n_rows"),
        sum(when(col("dv") > lit(3L) * col("mad_cents"), col("cnt")).otherwise(0L))
          .as("n_outliers"))
  }

  val madOutliersSql: String =
    """WITH v AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |c1 AS (SELECT g, v, count(*) AS cnt FROM v GROUP BY 1, 2),
      |cum1 AS (
      |  SELECT g, v, sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum,
      |         sum(cnt) OVER (PARTITION BY g) AS n
      |  FROM c1),
      |med AS (SELECT g, min(CASE WHEN cum * 100 >= n * 50 THEN v END) AS m
      |        FROM cum1 GROUP BY g),
      |dev AS (SELECT v.g, abs(v.v - med.m) AS dv, med.m
      |        FROM v JOIN med ON v.g = med.g),
      |c2 AS (SELECT g, dv, count(*) AS cnt FROM dev GROUP BY 1, 2),
      |cum2 AS (
      |  SELECT g, dv, sum(cnt) OVER (PARTITION BY g ORDER BY dv) AS cum,
      |         sum(cnt) OVER (PARTITION BY g) AS n
      |  FROM c2),
      |mad AS (SELECT g, min(CASE WHEN cum * 100 >= n * 50 THEN dv END) AS mad_cents
      |        FROM cum2 GROUP BY g)
      |SELECT dev.g, CAST(max(dev.m) AS BIGINT) AS median_cents,
      |  CAST(max(mad.mad_cents) AS BIGINT) AS mad_cents,
      |  count(*) AS n_rows,
      |  CAST(sum(CASE WHEN dev.dv > 3 * mad.mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev JOIN mad ON dev.g = mad.g
      |GROUP BY dev.g ORDER BY dev.g""".stripMargin

  /** p18 — CATEGORICAL CONTINGENCY LIFT AUDIT: for each audited column
    * pair, every observed value combination with its exact association
    * lift — observed/expected-under-independence as t41's staged fixed
    * point `((10⁶·n_ab div n_a)·N) div n_b` — the column-dependence
    * screen a profiler runs beside p3's numeric correlations: lift ≈
    * 10⁶ means the columns are independent at that cell, ≫ means the
    * combination co-occurs (a functional dependency shows as one cell
    * per left value at ≈ N/n_b ratio), ≪ means structural exclusion
    * (e.g. an order status that never carries a priority — the
    * data-contract smell p13's exact FDs cannot see because it is
    * statistical, not functional). Three map-combinable aggregations
    * (cells, two marginals) + equi-joins keyed by (pair, value); the
    * per-pair totals ride a broadcast dim. Cell count is bounded by the
    * product of the columns' cardinalities, not by rows — billions of
    * rows collapse map-side. */
  def contingencyLift(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .select(lit("lineitem.returnflag*linestatus").as("pair"),
        col("l_returnflag").as("a"), col("l_linestatus").as("b"))
      .unionByName(Tables.orders(s, d)
        .select(lit("orders.orderstatus*orderpriority").as("pair"),
          col("o_orderstatus").as("a"), col("o_orderpriority").as("b")))
    contingencyScore(
      pairs.groupBy(col("pair"), col("a"), col("b")).agg(count(lit(1)).as("n_ab")))
      .orderBy(col("pair"), col("a"), col("b"))
  }

  /** Lift scoring over (pair, a, b, n_ab) CELL COUNTS — the seam st51's
    * merged streaming partials share with batch p18 (cell counts are
    * additive; marginals and totals re-derive from the cells, so the
    * state a monitor keeps per pair is its contingency table). */
  private[graft] def contingencyScore(cells: DataFrame): DataFrame = {
    val margA = cells.groupBy(col("pair"), col("a")).agg(sum(col("n_ab")).as("n_a"))
    val margB = cells.groupBy(col("pair"), col("b")).agg(sum(col("n_ab")).as("n_b"))
    val tot = cells.groupBy(col("pair")).agg(sum(col("n_ab")).as("n_total"))
    cells
      .join(margA, Seq("pair", "a"))
      .join(margB, Seq("pair", "b"))
      .join(broadcast(tot), Seq("pair"))
      .withColumn("lift_ppm",
        expr("(((1000000 * n_ab) div n_a) * n_total) div n_b"))
      .select(col("pair"), col("a"), col("b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_total"), col("lift_ppm"))
  }

  val contingencyLiftSql: String =
    """WITH p AS (
      |  SELECT 'lineitem.returnflag*linestatus' AS pair,
      |    l_returnflag AS a, l_linestatus AS b FROM lineitem
      |  UNION ALL
      |  SELECT 'orders.orderstatus*orderpriority',
      |    o_orderstatus, o_orderpriority FROM orders),
      |cells AS (SELECT pair, a, b, count(*) AS n_ab FROM p GROUP BY 1, 2, 3),
      |ma AS (SELECT pair, a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM cells GROUP BY 1, 2),
      |mb AS (SELECT pair, b, CAST(sum(n_ab) AS BIGINT) AS n_b FROM cells GROUP BY 1, 2),
      |t AS (SELECT pair, CAST(sum(n_ab) AS BIGINT) AS n_total FROM cells GROUP BY 1)
      |SELECT cells.pair, cells.a, cells.b, CAST(n_ab AS BIGINT) AS n_ab,
      |  n_a, n_b, n_total,
      |  CAST((((1000000 * n_ab) // n_a) * n_total) // n_b AS BIGINT) AS lift_ppm
      |FROM cells
      |JOIN ma ON ma.pair = cells.pair AND ma.a = cells.a
      |JOIN mb ON mb.pair = cells.pair AND mb.b = cells.b
      |JOIN t ON t.pair = cells.pair
      |ORDER BY cells.pair, cells.a, cells.b""".stripMargin

  /** p19 — SLICE DRIFT AUDIT: the train/serve (or yesterday/today)
    * distribution-shift screen every ML monitoring stack runs — a
    * reference slice's value histogram compared bucket-by-bucket with a
    * current slice's, as EXACT INTEGERS so the audit is engine-exact:
    * per bucket, the cross-multiplied residual
    * `drift_x = n_cur·N_ref − n_ref·N_cur` (zero exactly when the
    * bucket's share is identical in both slices; PSI/chi² are monotone
    * consumers of it) and the share ratio in ppm via the t41 staged
    * fixed point (NULL when the bucket is absent from the reference —
    * the novel-value arm a ratio cannot express). Buckets are fixed
    * $50k-width cents ranges — deterministic arithmetic, not sampled
    * quantiles, so the audit reproduces from the data alone. Shape:
    * two map-combinable histograms + one tiny full-outer merge on the
    * bucket id; totals ride a 1-row broadcast. No float logs anywhere
    * (the p14/a12 rule) — the log-scaled PSI is downstream arithmetic
    * over exact shares. */
  def sliceDrift(s: SparkSession, d: String): DataFrame = {
    val bucketed = Tables.orders(s, d)
      .select((col("o_custkey") % 2 === 0).as("is_ref"),
        (graft.core.Exact.dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .select(col("is_ref"), expr("cents div 5000000").as("bucket"))
    val hist = bucketed.groupBy(col("bucket"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_cur"))
    sliceDriftOfHist(hist)
  }

  /** The drift derivation over a merged (bucket, n_ref, n_cur) histogram —
    * shared by batch p19 and the st55 streaming twin, whose additive
    * partials sum to exactly this input. */
  private[graft] def sliceDriftOfHist(hist: DataFrame): DataFrame = {
    val tot = hist.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    hist.join(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        (col("n_cur") * col("t_ref") - col("n_ref") * col("t_cur")).as("drift_x"),
        when(col("n_ref") > 0,
          expr("((1000000 * n_cur) div n_ref) * t_ref div t_cur"))
          .as("share_ratio_ppm"))
      .orderBy(col("bucket"))
  }

  val sliceDriftSql: String =
    """WITH b AS (
      |  SELECT o_custkey % 2 = 0 AS is_ref,
      |    (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) // 5000000 AS bucket
      |  FROM orders),
      |h AS (
      |  SELECT bucket,
      |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
      |  FROM b GROUP BY bucket),
      |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
      |             CAST(sum(n_cur) AS BIGINT) AS t_cur FROM h)
      |SELECT bucket, n_ref, n_cur,
      |  CAST(n_cur * t_ref - n_ref * t_cur AS BIGINT) AS drift_x,
      |  CASE WHEN n_ref > 0
      |    THEN CAST(((1000000 * n_cur) // n_ref) * t_ref // t_cur AS BIGINT)
      |  END AS share_ratio_ppm
      |FROM h CROSS JOIN t ORDER BY bucket""".stripMargin

  /** p20 — KOLMOGOROV–SMIRNOV DRIFT STATISTIC (exact, bucketed): where
    * p19 reads each bucket's share residual, the KS view asks the
    * sharper distributional question — the maximum CUMULATIVE gap
    * between the two slices' distribution functions, the statistic the
    * classical two-sample test thresholds. Exact-integer formulation:
    * at every $1k-cents bucket boundary b, the cross-multiplied gap
    * `dx(b) = |cumref(b)·T_cur − cumcur(b)·T_ref|` (zero exactly where
    * the CDFs agree; KS's D = max dx / (T_ref·T_cur), a monotone
    * consumer left to the reader so no division precision enters the
    * gate). The cumulative pass rides the bucket SPECTRUM (hundreds of
    * rows — p17's value-bucket discipline: the window is metadata-
    * sized, never a data-row sort); the argmax bucket reports WHERE the
    * distributions diverge most, min bucket on ties. Telescoping pins
    * the tail: dx at the last bucket is exactly 0. */
  def ksDrift(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = Tables.orders(s, d)
      .select((col("o_custkey") % 2 === 0).as("is_ref"),
        (graft.core.Exact.dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .select(col("is_ref"), expr("cents div 100000").as("bucket"))
    val hist = bucketed.groupBy(col("bucket"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_cur"))
    ksDriftOfHist(hist)
  }

  /** The KS derivation over a merged (bucket, n_ref, n_cur) histogram —
    * shared by batch p20 and the st59 streaming twin (same additive
    * partials as p19/st55, different read). */
  private[graft] def ksDriftOfHist(hist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    hist
      .select(col("bucket"), sum(col("n_ref")).over(w).as("cum_ref"),
        sum(col("n_cur")).over(w).as("cum_cur"))
      .join(broadcast(tot))
      .select(col("bucket"), col("t_ref"), col("t_cur"),
        abs(col("cum_ref") * col("t_cur") - col("cum_cur") * col("t_ref")).as("dx"))
      .agg(max(col("t_ref")).as("t_ref"), max(col("t_cur")).as("t_cur"),
        max(col("dx")).as("max_dx"),
        (max(struct(col("dx"), (lit(0L) - col("bucket")).as("nb")))
          .getField("nb") * -1).as("at_bucket"))
  }

  val ksDriftSql: String =
    """WITH b AS (
      |  SELECT o_custkey % 2 = 0 AS is_ref,
      |    (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) // 100000 AS bucket
      |  FROM orders),
      |h AS (
      |  SELECT bucket,
      |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
      |  FROM b GROUP BY bucket),
      |c AS (
      |  SELECT bucket,
      |    CAST(sum(n_ref) OVER (ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_ref,
      |    CAST(sum(n_cur) OVER (ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cur
      |  FROM h),
      |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
      |             CAST(sum(n_cur) AS BIGINT) AS t_cur FROM h),
      |dx AS (
      |  SELECT bucket, t_ref, t_cur,
      |    abs(cum_ref * t_cur - cum_cur * t_ref) AS dx
      |  FROM c CROSS JOIN t)
      |SELECT t_ref, t_cur, CAST(max(dx) AS BIGINT) AS max_dx,
      |  CAST((SELECT min(bucket) FROM dx i
      |        WHERE i.dx = (SELECT max(dx) FROM dx)) AS BIGINT) AS at_bucket
      |FROM dx GROUP BY t_ref, t_cur""".stripMargin

  override val defs: ListMap[String, QueryDef] = ListMap(
    "p1_profile_customer" -> QueryDef(profileCustomer, Some(profileCustomerSql)),
    "p2_profile_embeddings" -> QueryDef(profileEmbeddings, Some(profileEmbeddingsSql)),
    "p3_correlation_stats" -> QueryDef(correlationStats, Some(correlationStatsSql)),
    "p4_kmeans_inertia" -> QueryDef(kmeansInertia, Some(kmeansInertiaSql)),
    "p5_price_histogram" -> QueryDef(priceHistogram, Some(priceHistogramSql)),
    "p6_countmin_sketch" -> QueryDef(countMin, Some(countMinSql)),
    "p7_hll_estimate"   -> QueryDef(hllEstimate, Some(hllEstimateSql)),
    "p8_frequency_spectrum" -> QueryDef(frequencySpectrum, Some(frequencySpectrumSql)),
    "p9_heavy_hitters" -> QueryDef(heavyHitters, Some(heavyHittersSql)),
    "p10_exact_quantiles" -> QueryDef(exactQuantiles, Some(exactQuantilesSql)),
    "p11_grouped_mode" -> QueryDef(groupedMode, Some(groupedModeSql)),
    "p12_referential_audit" -> QueryDef(referentialAudit, Some(referentialAuditSql)),
    "p13_fd_audit" -> QueryDef(fdAudit, Some(fdAuditSql)),
    "p14_benford_audit" -> QueryDef(benfordAudit, Some(benfordAuditSql)),
    "p15_join_size_audit" -> QueryDef(joinSizeAudit, Some(joinSizeAuditSql)),
    "p16_skew_gini" -> QueryDef(skewGini, Some(skewGiniSql)),
    "p17_mad_outliers" -> QueryDef(madOutliers, Some(madOutliersSql)),
    "p18_contingency_lift" -> QueryDef(contingencyLift, Some(contingencyLiftSql)),
    "p19_slice_drift" -> QueryDef(sliceDrift, Some(sliceDriftSql)),
    "p20_ks_drift" -> QueryDef(ksDrift, Some(ksDriftSql)),
    "p21_sketch_quantiles" -> QueryDef(sketchQuantiles, Some(sketchQuantilesSql)),
    "p22_mg_heavy_hitters" -> QueryDef(mgHeavyHitters, Some(mgHeavyHittersSql)),
  )
}
