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
}
