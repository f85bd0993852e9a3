package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group ordinary-least-squares fits — the "is this metric drifting"
  * aggregate behind trend monitors, decay detection, and per-entity
  * feature extraction (slope-of-activity as a model feature).
  *
  * Everything reduces to the five classic OLS sums, so a fit is ONE
  * map-side-combined aggregation per group — no window, no sort, shuffle
  * bounded by O(groups) — plus one groups-sized join to center x first
  * (below). Portability follows the repo's indicator conventions: integer
  * sums stay exact integers, double sums ride the round-4 → DECIMAL(28,4)
  * path so they are independent of partitioning and summation order, and
  * the closing formula is a fixed chain of correctly-rounded IEEE ops —
  * bit-identical in any engine, the DuckDB oracle included.
  */
object Regression {

  private def dec(c: org.apache.spark.sql.Column) =
    round(c, 4).cast(DecimalType(28, 4))

  /** Per-group OLS line y = intercept + slope·(x − x0), x0 = the group's
    * min x (LONG-castable `xCol`, e.g. epoch seconds).
    *
    * Centering x at the group minimum is what makes the sums safe at
    * scale: raw epoch seconds square to ~3e18 per row and a 100 TB
    * group's Σx² would overflow any fixed-width accumulator, while
    * centered x spans only the group's time range. Slope is shift-
    * invariant, so this changes nothing but conditioning; the intercept
    * is reported AT x0 (the fitted value at the group's first x),
    * documented in the column name. Σx and Σx² are exact DECIMAL(38,0)
    * integers, Σy and Σxy ride the decimal round-trip, and slope /
    * intercept are computed in doubles from those exact components —
    * slope NULL when x is constant (zero variance).
    *
    * Output: (groupCol, n, x0, slope, intercept_at_x0).
    */
  def linearTrend(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val base = df.select(col(groupCol), col(xCol).cast("long").as("_x"),
      col(yCol).cast("double").as("_y"))
    val x0 = base.groupBy(col(groupCol)).agg(min(col("_x")).as("x0"))
    // FORCED broadcast (r15): the x0 side is one row per group, but its
    // pre-execution size ESTIMATE scales with the input, so past ~sf1 the
    // planner flipped this to a sort-merge join that shuffled the ENTIRE
    // fact side (measured at sf3: 3.0M rows / 41 MB shuffle-written vs 85
    // rows at sf1 — the q85 exponent bend in the triple-decade probe).
    // The hint pins the join to the groups-sized reality. Like every
    // groups-grain broadcast in the engine (labelCentroidStats' centroid
    // table, the quantile bounds when AQE sizes them), this requires the
    // GROUP DOMAIN to fit in a broadcast — a per-group trend fit whose
    // output is one row per group already assumes that.
    base.join(broadcast(x0), Seq(groupCol))
      .withColumn("_xs", col("_x") - col("x0"))
      .groupBy(col(groupCol), col("x0"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_xs").cast(DecimalType(38, 0))).as("_sx"),
        sum((col("_xs") * col("_xs")).cast(DecimalType(38, 0))).as("_sxx"),
        sum(dec(col("_y"))).as("_sy"),
        sum(dec(col("_xs") * col("_y"))).as("_sxy"))
      .withColumn("_num",
        col("n").cast("double") * col("_sxy").cast("double") -
          col("_sx").cast("double") * col("_sy").cast("double"))
      .withColumn("_den",
        col("n").cast("double") * col("_sxx").cast("double") -
          col("_sx").cast("double") * col("_sx").cast("double"))
      .withColumn("slope",
        when(col("_den") > 0.0, round(col("_num") / col("_den"), 6)))
      .withColumn("intercept_at_x0",
        when(col("_den") > 0.0,
          round((col("_sy").cast("double") -
            col("_num") / col("_den") * col("_sx").cast("double")) /
            col("n").cast("double"), 4)))
      .select(col(groupCol), col("n"), col("x0"), col("slope"),
        col("intercept_at_x0"))
  }
}
