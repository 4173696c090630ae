package graft.table

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bucketed co-located joins (SURVEY scale design: "co-locate joins via
 * bucketing or pre-partitioning"): two tables bucketed + sorted on the join
 * key join WITHOUT any shuffle exchange — the physical layout IS the
 * exchange, amortized at write time across every future join.
 */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("join of co-bucketed tables plans with zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_inventory")

    val orders = (0 until 5000).map(i => (i.toLong, s"scene_$i", (i * 37 % 997).toDouble))
      .toDF("doc_id", "scene", "size")
    val inventory = (0 until 5000 by 3).map(i => (i.toLong, s"T${i % 24}"))
      .toDF("doc_id", "tile_id")

    orders.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_orders")
    inventory.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_inventory")

    val joined = spark.table("b_orders")
      .join(spark.table("b_inventory").hint("merge"), "doc_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

    assert(joined.count() == inventory.count())
    // anti-join resume over the same buckets is also exchange-free
    val anti = spark.table("b_orders")
      .join(spark.table("b_inventory").hint("merge"), Seq("doc_id"), "left_anti")
    assert(!anti.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(anti.count() == 5000 - inventory.count())
  }
}
