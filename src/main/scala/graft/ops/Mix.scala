package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix construction: budgeted selection over a corpus — the step
  * after hygiene where a mix is assembled as "this many tokens of X".
  *
  * Scale shape: one shuffle on the group key. Use a FINE-GRAINED group
  * (registered domain, (lang, source) pairs) at corpus scale — the running
  * sum is a per-group ordered prefix, so a group's rows sort inside one
  * task's spill budget exactly like the capPerDomain window. A
  * handful-of-groups key (bare lang over the whole crawl) concentrates the
  * corpus into that many window tasks — the anti-pattern; for such keys
  * use [[Mix.tokenBudgetPerGroupBucketed]], the two-phase prefix sum that
  * spreads the sort over (group x bucket) tasks and reconciles exact
  * running totals with a tiny per-bucket offset frame.
  */
object Mix {

  /** Keep each group's prefix (in `orderBy` order) until the group's
    * running `tokensCol` total would exceed `budget` — token-budgeted
    * selection ("200k tokens per domain, earliest crawls first"). The
    * running total is nondecreasing (token counts are nonnegative), so
    * `running <= budget` IS the prefix rule: the first overflowing doc and
    * everything after it are dropped. Returns the input columns plus
    * `running_tokens` (the inclusive per-group prefix sum — kept in the
    * output so budget accounting is auditable downstream).
    *
    * One window per group key: right when groups are fine-grained (domains,
    * (lang, source) pairs). For COARSE keys use
    * [[tokenBudgetPerGroupBucketed]] — see the object doc. */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: Column,
      orderBy: Seq[Column], tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(groupCol).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_tokens", sum(tokensCol).over(w))
      .where(col("running_tokens") <= budget)
  }

  /** Two-phase (bucketed) [[tokenBudgetPerGroup]] for COARSE group keys —
    * identical output, different plan: instead of sorting each group's
    * whole row set inside one window task (a corpus-in-N-tasks bottleneck
    * when N = a handful of languages), phase 1 computes within-(group,
    * bucket) running sums — the big sort, spread over #groups x #buckets
    * tasks — and phase 2 window-sums the per-bucket TOTALS into exclusive
    * per-group offsets (a #groups x #buckets frame, metadata-sized at any
    * corpus scale) that are joined back and added.
    *
    * `bucketCol` must be ORDER-ALIGNED with `orderBy` within each group:
    * orderBy(r1) <= orderBy(r2) must imply bucket(r1) <= bucket(r2) —
    * e.g. a coarse prefix of the order key (`doc_id / 1000000`, a crawl
    * date when ordering by timestamp). Alignment is what makes
    * offset + within-bucket-running equal the global running sum exactly.
    * Pinned equal to the window formulation in OpsSpec. */
  def tokenBudgetPerGroupBucketed(df: DataFrame, groupCol: Column,
      bucketCol: Column, orderBy: Seq[Column], tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val keyed = df.withColumn("_grp", groupCol).withColumn("_bkt", bucketCol)
    val wIn = Window.partitionBy(col("_grp"), col("_bkt")).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = keyed.withColumn("_within", sum(tokensCol).over(wIn))
    // exclusive prefix of bucket totals per group — the tiny frame
    val wOff = Window.partitionBy(col("_grp")).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("_grp"), col("_bkt"))
      .agg(sum(tokensCol).as("_bktTotal"))
      .withColumn("_offset", coalesce(sum(col("_bktTotal")).over(wOff), lit(0L)))
      .select(col("_grp").as("_og"), col("_bkt").as("_ob"), col("_offset"))
    // null-SAFE join keys: the window formulation puts NULL-keyed rows in
    // their own partition and emits them — the offset join must match
    // them too for the documented plan equivalence to hold
    within.join(offsets,
        col("_grp") <=> col("_og") && col("_bkt") <=> col("_ob"))
      .withColumn("running_tokens", col("_offset") + col("_within"))
      .where(col("running_tokens") <= budget)
      .select(df.columns.map(col).toSeq :+ col("running_tokens"): _*)
  }

  /** Deterministic holdout assignment (train/validation/test) — the split
    * step of a training-data pipeline. Membership is a PURE FUNCTION of
    * (salt, id): `bucket` = the first 4 hex chars of md5("&lt;salt&gt;:&lt;id&gt;")
    * (16 bits — 65536 buckets), compared lexicographically against the
    * fraction thresholds (fixed-width lowercase hex, so string order IS
    * numeric order). That buys three properties random sampling lacks:
    * the split is stable across runs, machines and partitionings; a doc
    * never migrates between splits when the corpus grows (new docs land
    * in their own buckets, existing assignments are untouched — the
    * contamination guarantee a held-out set needs); and within ANY
    * subpopulation (a language, a domain) the hash is uniform, so the
    * split is stratified in expectation with no per-group pass. Distinct
    * `salt`s give independent splits of the same corpus.
    *
    * Granularity note: hash the DEDUP KEY, not an arbitrary row id — on a
    * corpus with near-duplicates, split AFTER dedup (or hash a canonical
    * url / cluster id) or twins straddle the train/test boundary.
    *
    * Scale shape: a narrow map (codegen'd md5 + substring + CASE), zero
    * exchanges. Returns the input columns plus `bucket` and `split`. */
  def holdoutSplit(df: DataFrame, idCol: Column, testFrac: Double = 0.1,
      valFrac: Double = 0.1, salt: String = "split"): DataFrame = {
    // withColumn would silently REPLACE same-named input columns — an
    // already-split frame must fail loudly, not get quietly re-dealt
    require(!df.columns.contains("bucket") && !df.columns.contains("split"),
      "holdoutSplit adds 'bucket'/'split' columns but the input already has one")
    val (testHex, valHex) = holdoutThresholds(testFrac, valFrac)
    df.withColumn("bucket",
        substring(md5(concat_ws(":", lit(salt), idCol.cast("string"))), 1, 4))
      .withColumn("split",
        when(col("bucket") < testHex, "test")
          .when(col("bucket") < valHex, "validation")
          .otherwise("train"))
  }

  /** The two 4-hex-char cut points for [[holdoutSplit]]: test below the
    * first, validation below the second, train otherwise. Capped at ffff
    * so both thresholds stay fixed-width (a 5-char '10000' would break
    * the lexicographic-equals-numeric invariant). */
  private[graft] def holdoutThresholds(
      testFrac: Double, valFrac: Double): (String, String) = {
    require(testFrac >= 0 && valFrac >= 0 && testFrac + valFrac < 1,
      s"fractions must be nonnegative and sum below 1: $testFrac/$valFrac")
    def hex(f: Double) = f"${math.min(0xffffL, math.round(f * 65536))}%04x"
    (hex(testFrac), hex(testFrac + valFrac))
  }

  /** [[holdoutSplit]]'s bucket as a DuckDB SQL fragment — generated so
    * the two engines share one definition (the d13/d04 pattern). */
  private[graft] def holdoutBucketSql(idExpr: String, salt: String): String = {
    require(salt.matches("[A-Za-z0-9_-]+"), s"salt must be SQL-literal-safe: $salt")
    s"substr(md5('$salt:' || CAST($idExpr AS VARCHAR)), 1, 4)"
  }

  /** [[holdoutSplit]]'s assignment CASE as a DuckDB SQL fragment, with
    * the SAME generated thresholds as the Spark plan. */
  private[graft] def holdoutSplitSql(bucketExpr: String, testFrac: Double,
      valFrac: Double): String = {
    val (t, v) = holdoutThresholds(testFrac, valFrac)
    s"CASE WHEN $bucketExpr < '$t' THEN 'test' " +
      s"WHEN $bucketExpr < '$v' THEN 'validation' ELSE 'train' END"
  }

  /** Deterministic per-group downsampling — the mix-REWEIGHTING step of a
    * training pipeline (keep 50% of English, 10% of the boilerplate-heavy
    * tail, ...): a row survives iff its hash bucket (same md5-prefix
    * scheme as [[holdoutSplit]], DIFFERENT salt) falls below its group's
    * sampling fraction. The hash-bucket properties are what distinguish
    * this from `sample()`/`sampleBy()`: membership is a pure function of
    * (salt, id) — identical across runs, machines and partitionings, and
    * a re-run over a GROWN corpus keeps every previously-kept row (new
    * rows only fill in), so downstream artifacts stay reproducible.
    * Composes with [[holdoutSplit]] through salt independence: the
    * sampling decision is uncorrelated with the split assignment, so
    * sampling preserves the split proportions in expectation. Groups
    * absent from `fractions` keep `default`; a fraction >= 1 keeps the
    * whole group (no threshold-string compare — "10000" would break the
    * fixed-width lexicographic invariant).
    *
    * Scale shape: zero exchanges — one codegen'd md5 + substring + CASE
    * per row, exactly as expensive as reading (id, group) once. */
  def hashSample(df: DataFrame, idCol: Column, groupCol: Column,
      fractions: Map[String, Double], default: Double = 1.0,
      salt: String = "sample"): DataFrame = {
    // empty fractions + default < 1 is uniform hash sampling (legitimate);
    // empty + default 1.0 would be a silent no-op — fail loudly instead
    require(fractions.nonEmpty || default < 1.0,
      "sampling with no group fractions and default 1.0 is a no-op")
    (fractions.values ++ Seq(default)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"sampling fraction out of [0,1]: $f"))
    val bucket = substring(md5(concat_ws(":", lit(salt), idCol.cast("string"))), 1, 4)
    def keepAt(f: Double): Column =
      if (f >= 1.0) lit(true) else bucket < lit(sampleThresholdHex(f))
    val keep = fractions.toSeq.sortBy(_._1)
      .foldRight(keepAt(default)) { case ((g, f), els) =>
        when(groupCol === g, keepAt(f)).otherwise(els)
      }
    df.where(keep)
  }

  /** 4-hex-char keep threshold for a fraction < 1 (>= 1 is handled as a
    * keep-all condition, never a threshold string). */
  private[graft] def sampleThresholdHex(f: Double): String = {
    require(f >= 0.0 && f < 1.0, s"threshold needs a fraction in [0,1): $f")
    f"${math.min(0xffffL, math.round(f * 65536))}%04x"
  }

  /** [[hashSample]]'s keep predicate as a DuckDB SQL fragment generated
    * from the SAME fractions and threshold arithmetic as the Spark plan
    * (the d13/d04 pattern); `groupExpr` values are compared as strings. */
  private[graft] def hashSampleSql(bucketExpr: String, groupExpr: String,
      fractions: Map[String, Double], default: Double = 1.0): String = {
    def keepAt(f: Double): String =
      if (f >= 1.0) "TRUE" else s"$bucketExpr < '${sampleThresholdHex(f)}'"
    val whens = fractions.toSeq.sortBy(_._1).map { case (g, f) =>
      require(g.matches("[A-Za-z0-9_-]+"), s"group must be SQL-literal-safe: $g")
      s"WHEN $groupExpr = '$g' THEN ${keepAt(f)}"
    }.mkString(" ")
    s"CASE $whens ELSE ${keepAt(default)} END"
  }
}
