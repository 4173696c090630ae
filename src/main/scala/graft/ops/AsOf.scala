package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — J9, beyond reference parity: for every probe
 * row, the LATEST build row with `build.ts <= probe.ts` in the same key
 * (left semantics: probes with no prior build keep nulls).
 *
 * Spark has no native ASOF JOIN, and the naive formulation — a theta join
 * on `b.ts <= p.ts` plus a max-per-probe — explodes O(probes × builds) per
 * key before the reduction. The scale-correct form used here: UNION the
 * tagged streams, ONE shuffle+sort by (key, ts), and a running
 * `last(_, ignoreNulls)` window carries the build attributes forward —
 * linear in rows, a single exchange, fully codegen'd.
 *
 * Tie rules (deterministic): a build at exactly probe.ts matches
 * (inclusive bound — builds sort before probes at equal ts); among builds
 * with identical (key, ts) the greatest build-column tuple wins.
 */
object AsOf {

  /**
   * @param probes    left side; must have `key`, `ts`, `probeCols`
   * @param builds    right side; must have `key`, `ts`, `buildCols`
   * @param buildCols build attributes carried to the probe as `asof_<col>`
   */
  def join(probes: DataFrame, builds: DataFrame, key: String, ts: String,
           probeCols: Seq[String], buildCols: Seq[String]): DataFrame = {
    val tagged = probes
      .select((Seq(key, ts) ++ probeCols).map(col): _*)
      .withColumn("__build", lit(0))
      .unionByName(
        builds.select((Seq(key, ts) ++ buildCols).map(col): _*)
          .withColumn("__build", lit(1)),
        allowMissingColumns = true)
    val order = col(ts).asc +: col("__build").desc +: buildCols.map(col(_).asc_nulls_first)
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = buildCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    carried.where(col("__build") === 0)
      .select((Seq(key, ts) ++ probeCols ++ buildCols.map(c => s"asof_$c")).map(col): _*)
  }
}
