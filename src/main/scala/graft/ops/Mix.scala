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
  * task's spill budget exactly like the capPerDomain window; a
  * handful-of-groups key (bare lang over the whole crawl) concentrates the
  * corpus into that many tasks and is the documented anti-pattern.
  */
object Mix {

  /** Keep each group's prefix (in `orderBy` order) until the group's
    * running `tokensCol` total would exceed `budget` — token-budgeted
    * selection ("200k tokens per domain, earliest crawls first"). The
    * running total is nondecreasing (token counts are nonnegative), so
    * `running <= budget` IS the prefix rule: the first overflowing doc and
    * everything after it are dropped. Returns the input columns plus
    * `running_tokens` (the inclusive per-group prefix sum — kept in the
    * output so budget accounting is auditable downstream). */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: Column,
      orderBy: Seq[Column], tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(groupCol).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_tokens", sum(tokensCol).over(w))
      .where(col("running_tokens") <= budget)
  }
}
