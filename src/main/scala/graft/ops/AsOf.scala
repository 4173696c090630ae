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
    // ONE struct is carried, not one last() per column: per-column carries
    // with ignoreNulls would mix attributes from DIFFERENT build rows when a
    // build attribute is null (the probe must see the single matched row,
    // nulls included — ASOF semantics). The struct is null on probe rows
    // (so ignoreNulls skips them) and non-null on every build row.
    val buildStruct = when(col("__build") === 1, struct(buildCols.map(col): _*))
    val carried = tagged.withColumn("__asof", last(buildStruct, ignoreNulls = true).over(w))
    carried.where(col("__build") === 0)
      .select(Seq(key, ts).map(col) ++ probeCols.map(col) ++
        buildCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
