package graft.tools

import org.apache.spark.sql.functions._

/**
 * Read-degradation probe for merge-on-read: builds an IcebergLite table of
 * `nFiles` key-disjoint files, stacks `maxStack` equality-delete commits
 * (each an O(updates) [[graft.table.IcebergLite.mergeOnRead]] batch), and
 * times a full read at checkpoints along the way — the curve that justifies
 * [[graft.table.IcebergLite.maintain]]'s policy. Ends by running maintain
 * (policy forces a compact) and re-timing: the read must return to the
 * clean-scan baseline.
 * `sbt "runMain graft.tools.MorScale [nFiles] [rowsPerFile] [maxStack]"`.
 */
object MorScale {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 32
    val rowsPer = if (args.length > 1) args(1).toLong else 100000L
    val maxStack = if (args.length > 2) args(2).toInt else 32
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.table.IcebergLite

    val root = java.nio.file.Files.createTempDirectory("graft_mor_scale")
    val t = root.resolve("t").toString
    val n = nFiles * rowsPer
    val base = spark.range(n).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"), (col("id") % 97).as("w"))
      .repartitionByRange(nFiles, col("k"))
    IcebergLite.append(spark, base, t, Seq("k"), "base")

    def timedRead(): Double = {
      val t0 = System.nanoTime()
      IcebergLite.read(spark, t).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    timedRead() // warm
    val checkpoints = Seq(0, 1, 2, 4, 8, 16, 32).filter(_ <= maxStack)
    val walls = scala.collection.mutable.LinkedHashMap[Int, Double]()
    walls(0) = timedRead()
    (1 to maxStack).foreach { i =>
      // each batch supersedes a distinct 1k-key slice (strided so every
      // base file group is touched — the worst case for the anti-merge)
      val up = spark.range(1000).select((col("id") * (n / 1000) + i).as("k"),
        lit(s"M$i").as("v"), lit(-i.toLong).as("w"))
      IcebergLite.mergeOnRead(spark, t, up, Seq("k"), Seq("k"), s"mor$i")
      if (checkpoints.contains(i)) walls(i) = timedRead()
    }
    // policy kicks in: pending deletes (maxStack files) >> 8 → sorted
    // compact (re-clusters on k, restoring the original appends' layout)
    val maintained = IcebergLite.maintain(spark, t, Seq("k"), "maint",
      IcebergLite.MaintenancePolicy(sortBy = Seq("k")))
    require(maintained.compacted.isDefined, "policy should have triggered")
    require(IcebergLite.readSnapshot(t).get.deletes.isEmpty, "compact must clear deletes")
    val wClean = math.min(timedRead(), timedRead())
    val rows = IcebergLite.read(spark, t).count()
    graft.Fs.deleteRecursively(root)
    println(f"""{"probe":"mor_scale","files":$nFiles,"rows":$n,""" +
      walls.map { case (k, w) => f""""read_s_at_$k":$w%.3f""" }.mkString(",") +
      f""","read_s_after_maintain":$wClean%.3f,""" +
      f""""degradation_at_${maxStack}":${walls(maxStack) / walls(0)}%.2f,""" +
      f""""recovery":${wClean / walls(0)}%.2f,"rows_after":$rows}""")
    spark.stop()
  }
}
