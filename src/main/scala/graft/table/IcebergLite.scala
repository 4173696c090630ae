package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Iceberg-format-inspired table layout (SURVEY §4.2): partitioned Parquet
 * data files + JSON snapshot manifests with per-file row counts and
 * column min/max, committed by atomic pointer swap. No Iceberg runtime jar
 * exists in this environment (verified; coursier offline), so the layout is
 * implemented in-repo; the read path is plain `spark.read.parquet` over
 * manifest-selected files, so swapping in real Iceberg later is an I/O-layer
 * change only.
 *
 * Layout:
 * {{{
 *   <table>/data/<commit-uuid>/part-*.parquet
 *   <table>/_graft_meta/snapshot-<N>.json     // files + stats + schema
 *   <table>/_graft_meta/CURRENT               // atomic pointer: "N"
 * }}}
 *
 * Scale notes: manifest min/max over the Morton cell id gives partition
 * pruning for spatial range scans (children of a parent cell are an id
 * range — CellIndexSpec "locality"); stats are collected in ONE extra pass
 * grouped by `input_file_name()`, not per-file reads.
 */
object IcebergLite {

  case class FileEntry(path: String, rows: Long, min: Map[String, String], max: Map[String, String])
  case class Snapshot(id: Long, parent: Long, schemaJson: String, files: Seq[FileEntry])

  private def metaDir(table: String): Path = Paths.get(table, "_graft_meta")

  def currentSnapshotId(table: String): Option[Long] = {
    val cur = metaDir(table).resolve("CURRENT")
    if (Files.exists(cur)) Some(Files.readString(cur).trim.toLong) else None
  }

  def readSnapshot(table: String): Option[Snapshot] =
    currentSnapshotId(table).map { id =>
      parseSnapshot(Files.readString(metaDir(table).resolve(s"snapshot-$id.json")))
    }

  /** A specific historical snapshot (None if it never existed). */
  def snapshotAt(table: String, id: Long): Option[Snapshot] = {
    val p = metaDir(table).resolve(s"snapshot-$id.json")
    if (Files.exists(p)) Some(parseSnapshot(Files.readString(p))) else None
  }

  /** All snapshot ids, oldest first — the table's commit lineage. */
  def snapshots(table: String): Seq[Long] = {
    val d = metaDir(table)
    if (!Files.exists(d)) Nil
    else {
      val st = Files.list(d) // must be closed: leaks a directory fd otherwise
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("snapshot-") =>
          s.stripPrefix("snapshot-").stripSuffix(".json").toLong }
        .toSeq.sorted
      finally st.close()
    }
  }

  /** Time-travel read: the table exactly as of snapshot `id` (Iceberg's
    * `VERSION AS OF`). Files of later commits are invisible. */
  def readAt(spark: SparkSession, table: String, id: Long): DataFrame = {
    val snap = snapshotAt(table, id).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $id in $table"))
    readFiles(spark, snap, snap.files)
  }

  /** Scan `files` under `snap`'s pinned schema. The explicit schema is what
    * makes [[addColumn]] evolution work: files written before the column
    * existed read it back as null (and a pre-evolution snapshot, pinning
    * the old schema, never shows the column at all). */
  private def readFiles(spark: SparkSession, snap: Snapshot,
                        files: Seq[FileEntry]): DataFrame = {
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files.map(_.path): _*)
  }

  /**
   * Append `df` as a new snapshot (previous files retained). `statsCols`
   * are indexed with min/max for pruning. Commit protocol:
   * write data → write snapshot-N.json → atomic move CURRENT.
   * A crash before the final move leaves the table at the previous snapshot
   * (uncommitted data dir is unreferenced) — the resume semantics the
   * reference gets from SAC_DONE re-scans (SURVEY §2.10).
   */
  def append(spark: SparkSession, df: DataFrame, table: String,
             statsCols: Seq[String], commitId: String): Snapshot = {
    writeData(df, table, commitId)
    commitWritten(spark, df.schema.json, table, statsCols, commitId)
  }

  /** Phase 1 of [[append]]: write the data files only (no snapshot yet).
    * Until [[commitWritten]] runs, the files are unreferenced — a crash here
    * is invisible to readers, exactly the SAC_DONE re-scan semantics. */
  def writeData(df: DataFrame, table: String, commitId: String): Unit =
    df.write.mode("overwrite").parquet(Paths.get(table, "data", commitId).toString)

  /**
   * Compaction (Iceberg's `rewrite_data_files`): read the current snapshot,
   * rewrite it as ONE fresh commit, and swap in a snapshot that references
   * ONLY the compacted files. Old files stay on disk — historical snapshots
   * still time-travel ([[readAt]]) — but the live read path stops paying
   * per-file open cost for the accumulated incremental commits. At 100 TB
   * the small-files problem is a metadata-health problem: a table fed by
   * per-stage appends grows O(commits × partitions) files without this.
   */
  def compact(spark: SparkSession, table: String, statsCols: Seq[String],
              commitId: String): Snapshot = {
    val cur = read(spark, table) // snapshot-pinned file list: safe self-read
    writeData(cur, table, commitId)
    commitWritten(spark, cur.schema.json, table, statsCols, commitId, keepPrev = false)
  }

  /** Phase 2 of [[append]]: stat the files written by [[writeData]] and swap
    * the snapshot pointer. Split out so a caller can inspect the write's
    * observed metrics (e.g. rows-in) before deciding to commit.
    * `keepPrev = false` makes the new snapshot reference only this commit's
    * files (a replacing commit — compaction / overwrite semantics). */
  def commitWritten(spark: SparkSession, schemaJson: String, table: String,
                    statsCols: Seq[String], commitId: String,
                    keepPrev: Boolean = true): Snapshot = {
    val dataDir = Paths.get(table, "data", commitId)
    // one-pass per-file stats
    val statAggs = statsCols.flatMap(c =>
      Seq(min(col(c)).cast("string").as(s"min_$c"), max(col(c)).cast("string").as(s"max_$c")))
    val stats = spark.read.parquet(dataDir.toString)
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"), statAggs: _*)
      .collect()
    val entries = stats.map { r =>
      FileEntry(r.getAs[String]("path"), r.getAs[Long]("rows"),
        statsCols.map(c => c -> String.valueOf(r.getAs[Any](s"min_$c"))).toMap,
        statsCols.map(c => c -> String.valueOf(r.getAs[Any](s"max_$c"))).toMap)
    }.toSeq.sortBy(_.path)

    val parent = currentSnapshotId(table).getOrElse(-1L)
    val prevFiles = if (keepPrev) readSnapshot(table).map(_.files).getOrElse(Nil) else Nil
    commitSnapshot(table, Snapshot(parent + 1, parent, schemaJson, prevFiles ++ entries))
  }

  /** Write snapshot-N.json, then atomically swap CURRENT — the commit tail
    * shared by data commits and metadata-only commits. */
  private def commitSnapshot(table: String, snap: Snapshot): Snapshot = {
    Files.createDirectories(metaDir(table))
    Files.writeString(metaDir(table).resolve(s"snapshot-${snap.id}.json"), renderSnapshot(snap))
    val tmp = metaDir(table).resolve("CURRENT.tmp")
    Files.writeString(tmp, snap.id.toString)
    Files.move(tmp, metaDir(table).resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  /**
   * Schema evolution (Iceberg's `ALTER TABLE ADD COLUMN`): a METADATA-ONLY
   * commit — a new snapshot with the same file list and the widened schema.
   * No data file is rewritten: old files simply lack the column, and the
   * read path (which applies the snapshot schema) backfills null. At 100 TB
   * this is the whole point — adding a column to a petabyte table must be
   * an O(1) pointer swap, never a rewrite. Time travel to a pre-evolution
   * snapshot reads the old schema (each snapshot pins its own).
   */
  def addColumn(table: String, name: String, sqlType: String): Snapshot = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(!schema.fieldNames.contains(name), s"column $name already exists")
    val widened = schema.add(name, sqlType, nullable = true)
    commitSnapshot(table, Snapshot(snap.id + 1, snap.id, widened.json, snap.files))
  }

  /** Read the current snapshot, pruning files by numeric range predicates
    * `col -> (lo, hi)` against manifest min/max (file skipped iff its range
    * provably misses). */
  def read(spark: SparkSession, table: String,
           prune: Map[String, (Double, Double)] = Map.empty): DataFrame = {
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val keep = snap.files.filter { f =>
      prune.forall { case (c, (lo, hi)) =>
        (f.min.get(c), f.max.get(c)) match {
          case (Some(mn), Some(mx)) if mn != "null" && mx != "null" =>
            !(mx.toDouble < lo || mn.toDouble > hi)
          case _ => true
        }
      }
    }
    readFiles(spark, snap, keep)
  }

  /** Files selected under pruning (for tests/metrics). */
  def selectedFiles(table: String, prune: Map[String, (Double, Double)]): Seq[String] = {
    val snap = readSnapshot(table).getOrElse(return Nil)
    snap.files.filter { f =>
      prune.forall { case (c, (lo, hi)) =>
        (f.min.get(c), f.max.get(c)) match {
          case (Some(mn), Some(mx)) if mn != "null" && mx != "null" =>
            !(mx.toDouble < lo || mn.toDouble > hi)
          case _ => true
        }
      }
    }.map(_.path)
  }

  // --- minimal JSON (no external deps) -----------------------------------

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case '\r' => "\\r"
    case '\t' => "\\t"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  private def renderSnapshot(s: Snapshot): String = {
    def m(mm: Map[String, String]) =
      mm.toSeq.sortBy(_._1).map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val files = s.files.map(f =>
      s"""{"path":"${esc(f.path)}","rows":${f.rows},"min":${m(f.min)},"max":${m(f.max)}}""")
      .mkString("[", ",", "]")
    s"""{"id":${s.id},"parent":${s.parent},"schema":"${esc(s.schemaJson)}","files":$files}"""
  }

  /** Tiny recursive-descent JSON parser for our own snapshot format. */
  private[table] def parseSnapshot(js: String): Snapshot = {
    val p = new JsonP(js)
    val obj = p.parse().asInstanceOf[Map[String, Any]]
    val files = obj("files").asInstanceOf[List[Any]].map { fo =>
      val f = fo.asInstanceOf[Map[String, Any]]
      FileEntry(f("path").asInstanceOf[String],
        f("rows").asInstanceOf[Double].toLong,
        f("min").asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.toString },
        f("max").asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.toString })
    }
    Snapshot(obj("id").asInstanceOf[Double].toLong, obj("parent").asInstanceOf[Double].toLong,
      obj("schema").asInstanceOf[String], files)
  }
}

/** Minimal JSON parser (objects/arrays/strings/numbers/bools/null). */
private[table] class JsonP(s: String) {
  private var i = 0
  private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
  def parse(): Any = { ws(); parseValue() }
  private def parseValue(): Any = s.charAt(i) match {
    case '{' =>
      i += 1; ws()
      val b = Map.newBuilder[String, Any]
      if (s.charAt(i) == '}') { i += 1 }
      else {
        var done = false
        while (!done) {
          ws(); val k = parseString(); ws(); require(s.charAt(i) == ':'); i += 1; ws()
          b += k -> parseValue(); ws()
          if (s.charAt(i) == ',') i += 1 else { require(s.charAt(i) == '}'); i += 1; done = true }
        }
      }
      b.result()
    case '[' =>
      i += 1; ws()
      val b = List.newBuilder[Any]
      if (s.charAt(i) == ']') { i += 1 }
      else {
        var done = false
        while (!done) {
          ws(); b += parseValue(); ws()
          if (s.charAt(i) == ',') i += 1 else { require(s.charAt(i) == ']'); i += 1; done = true }
        }
      }
      b.result()
    case '"' => parseString()
    case 't' => i += 4; true
    case 'f' => i += 5; false
    case 'n' => i += 4; null
    case _ =>
      val start = i
      while (i < s.length && "-+.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(start, i).toDouble
  }
  private def parseString(): String = {
    require(s.charAt(i) == '"'); i += 1
    val sb = new StringBuilder
    while (s.charAt(i) != '"') {
      if (s.charAt(i) == '\\') {
        i += 1
        s.charAt(i) match {
          case 'n' => sb += '\n'; case 'r' => sb += '\r'; case 't' => sb += '\t'
          case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
          case c => sb += c
        }
      } else sb += s.charAt(i)
      i += 1
    }
    i += 1
    sb.toString
  }
}
