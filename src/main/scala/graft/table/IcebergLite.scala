package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
 * grouped by `input_file_name()`, not per-file reads; `statsExprs` extends
 * the manifest to derived values (e.g. min/max over a nested span field,
 * pruning band-filter scans file-level). Schema evolution is complete and
 * always metadata-only: ADD (null backfill), DROP, RENAME (logical →
 * physical name mapping — the name-mapping form of Iceberg's field-ID
 * indirection), each snapshot pinning its own schema for time travel.
 * [[merge]] is a copy-on-write MERGE upsert with crash-retry idempotence.
 */
object IcebergLite {

  /** `seq` = id of the snapshot whose commit added the file — equality
    * deletes ([[mergeOnRead]]) apply only to files with a LOWER seq, the
    * sequence-number scoping real Iceberg v2 uses. Old manifests parse with
    * seq 0 (every delete applies — the conservative reading).
    * `bloom` maps column name → path of a per-file [[Bloom]] sidecar
    * (written by commits with `bloomCols`); point-lookup reads probe it
    * AFTER min/max, files without one are conservatively kept. */
  case class FileEntry(path: String, rows: Long, min: Map[String, String],
                       max: Map[String, String], seq: Long = 0L,
                       partition: Map[String, String] = Map.empty,
                       bloom: Map[String, String] = Map.empty)

  /** An equality-delete file: parquet of key tuples (PHYSICAL column names
    * `keys`) at `path`, committed at snapshot `seq`. A data row is deleted
    * iff its key tuple appears in a delete file with seq > the row's file
    * seq. */
  case class DeleteEntry(path: String, seq: Long, keys: Seq[String])

  /**
   * One field of a table's partition spec — Iceberg's HIDDEN partitioning:
   * the spec lives in table metadata, writers derive the partition value
   * from `source` via `transform` automatically (callers never manage a
   * layout column), and data files land under `p_<name>=<value>/`
   * directories inside each commit. Readers prune on the per-file
   * partition value BEFORE consulting column min/max stats.
   *
   * Transforms (the Iceberg spec set, plus a spatial one):
   *  - `identity`      — the source value itself
   *  - `bucket[N]`     — `pmod(murmur3(source), N)`
   *  - `truncate[W]`   — numeric: `floor(source / W) * W`; string: prefix W
   *  - `year`/`month`/`day` — calendar truncation of a date/timestamp
   *  - `cell[R]`       — MIN covering [[graft.cells.CellIndex]] cell of a
   *    WKT geometry at resolution R. A footprint spanning several cells is
   *    stored ONCE (under its min cell — no replication, table row count
   *    is exact); commits additionally auto-index the full cover range
   *    per file (`cover_<name>` stats), and [[readAoi]] prunes on that
   *    range, so spanning footprints are never lost to pruning. This is
   *    the manifest-layer form of the reference's S3 prefix-scoped listing
   *    (`utils/prep_utils.py:368-387` — one prefix per granule/tile).
   */
  case class PartitionField(name: String, source: String, transform: String)

  private val BucketT = """bucket\[(\d+)\]""".r
  private val TruncateT = """truncate\[(\d+)\]""".r
  private val CellT = """cell\[(\d+)\]""".r

  /** Directory/column name a partition field writes under. A plain prefix
    * (no underscore): `_`-prefixed directories are hidden from Hadoop
    * listings, which would break the stats pass. */
  private def partColName(f: PartitionField): String = s"p_${f.name}"

  /** `renames` maps LOGICAL column name → PHYSICAL (in-file) column name
    * for fields whose logical name has diverged via [[renameColumn]] —
    * the name-mapping form of Iceberg's field-ID indirection. Data files
    * always store physical names; reads substitute physical names into the
    * pinned schema and alias back; renames are O(1) metadata commits. */
  /** `commitIds` is the cumulative ledger of every commitId ever committed
    * to the table — carried forward (and unioned) by every commit, so the
    * crash-retry idempotence guard ([[alreadyCommitted]]) is one read of the
    * CURRENT snapshot instead of a scan of all history: O(1) per commit on
    * a 10k-commit table, and still refusing a replay after the original
    * commit's snapshots (or even its files) have been expired. */
  /** A table's declared write clustering (Iceberg's `write.sort-order` /
    * sort-order metadata): once set, EVERY writer lays its batch out by it
    * — linear range-sort or z-order interleave over `cols` — and
    * [[compact]] defaults to it, so per-file min/max stays tight without
    * each caller re-stating the layout. */
  case class SortOrder(cols: Seq[String], zorder: Boolean = false)

  /** `manifests` is the snapshot's on-disk file-list layout: paths of
    * IMMUTABLE manifest files (each a JSON array of [[FileEntry]]) whose
    * concatenation is `files`. Consecutive snapshots SHARE manifest files —
    * [[persistSnapshot]] reuses every parent manifest whose entries are
    * carried unchanged and writes only the delta — so an append's metadata
    * write is O(new files), not O(table files). In memory `files` is always
    * fully materialized; `manifests` is bookkeeping for the write side and
    * expiry. Empty for legacy inline-files snapshots (their next commit
    * converts). */
  case class Snapshot(id: Long, parent: Long, schemaJson: String, files: Seq[FileEntry],
                      renames: Map[String, String] = Map.empty,
                      deletes: Seq[DeleteEntry] = Nil,
                      commitIds: Set[String] = Set.empty,
                      spec: Seq[PartitionField] = Nil,
                      order: Option[SortOrder] = None,
                      manifests: Seq[String] = Nil) {
    def physical(logical: String): String = renames.getOrElse(logical, logical)
  }

  /** Snapshot-JSON parses since JVM start — a test-visible metadata-read
    * meter ([[IcebergLiteSpec]] asserts the idempotence guard stays O(1)
    * in these as history grows). */
  val metaParses = new java.util.concurrent.atomic.AtomicLong(0)

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

  /**
   * Incremental append scan (Iceberg's `incrementalAppendScan`): the rows
   * ADDED by snapshots with id in `(fromId, toId]` — the primitive behind
   * process-only-new-data pipeline runs, where a daily job over a 100 TB
   * table opens only that day's files instead of re-scanning the table.
   * `fromId = -1` means "since before the first snapshot". File selection
   * is metadata-only: every file records its committing snapshot (`seq`),
   * so the delta is exactly `seq ∈ (fromId, toId]` — no data file of an
   * earlier commit is opened, or even listed into the scan.
   *
   * Every snapshot in the range must be row-ADDITIVE: parent files carried
   * unchanged and no new equality deletes (plain appends, schema-evolution
   * metadata commits). Replacing commits — compaction, CoW merge, MoR
   * upsert, rollback — have no well-defined append delta, and the scan
   * refuses them, exactly as Iceberg's incremental append scan does; read
   * the full snapshot instead across such a boundary.
   */
  def readIncremental(spark: SparkSession, table: String,
                      fromId: Long, toId: Long): DataFrame = {
    val (to, delta) = incrementalDelta(table, fromId, toId)
    readFiles(spark, to, delta)
  }

  /** [[readIncremental]] with the same metadata pruning [[readWhere]] gives
    * a full scan: the `(fromId, toId]` delta's FILE LIST is filtered through
    * partition values, manifest min/max, and Bloom sidecars before anything
    * opens — a follower subscribed to one region/key-range pays only that
    * slice of each increment, not the whole append. The residual predicate
    * still applies row-level, so results ≡
    * `readIncremental(...).where(predicate)`. */
  def readIncrementalWhere(spark: SparkSession, table: String,
                           fromId: Long, toId: Long, predicate: Column): DataFrame = {
    val (to, delta) = incrementalDelta(table, fromId, toId)
    val b = extractBounds(spark, to, predicate)
    val files = surviving(to.copy(files = delta), b.num, Map.empty, b.inNum, b.inStr,
      b.str, partitionPrune(to, b)).filter(bloomKeeps(to, _, b))
    readFiles(spark, to, files).where(predicate)
  }

  /** Validate that every snapshot in `(fromId, toId]` is row-additive and
    * return `toId`'s snapshot plus the delta's file entries. */
  private def incrementalDelta(table: String, fromId: Long,
                               toId: Long): (Snapshot, Seq[FileEntry]) = {
    val to = snapshotAt(table, toId).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $toId in $table"))
    var cur = to
    var done = false
    while (!done) {
      if (cur.id == fromId) done = true
      else {
        require(cur.id > fromId, s"snapshot $fromId is not an ancestor of $toId in $table")
        if (cur.parent < 0) {
          require(fromId == -1L, s"snapshot $fromId is not an ancestor of $toId in $table")
          done = true
        } else {
          val p = snapshotAt(table, cur.parent).getOrElse(throw new IllegalStateException(
            s"snapshot ${cur.parent} of $table is missing (expired?) - incremental range unreadable"))
          val curPaths = cur.files.map(_.path).toSet
          // delete sets compared by ENTRY (path, seq), not count: a commit
          // swapping one delete for another while carrying all parent files
          // would pass a size check yet have no well-defined append delta
          require(p.files.forall(f => curPaths.contains(f.path))
              && cur.deletes.map(d => (d.path, d.seq)).toSet
                == p.deletes.map(d => (d.path, d.seq)).toSet,
            s"snapshot ${cur.id} of $table is a replacing or delete commit - incremental " +
              "append scan is undefined across it; read the full snapshot instead")
          // files ADDED at this commit must carry a seq inside the requested
          // range, or the delta selection below would silently drop them —
          // pre-upgrade manifests parse with seq 0, and a table whose
          // lineage says otherwise must refuse loudly, not return an
          // incomplete delta (the same conservatism replacing commits get)
          val parentPaths = p.files.map(_.path).toSet
          cur.files.filterNot(f => parentPaths.contains(f.path)).foreach { f =>
            require(f.seq > fromId && f.seq <= toId,
              s"file ${f.path} added by snapshot ${cur.id} of $table records seq ${f.seq} " +
                s"outside ($fromId, $toId] - pre-upgrade manifest; read the full snapshot instead")
          }
          cur = p
        }
      }
    }
    (to, to.files.filter(f => f.seq > fromId && f.seq <= toId))
  }

  /** Scan `files` under `snap`'s pinned schema, applying the snapshot's
    * equality deletes ([[mergeOnRead]]). Files are grouped by commit seq;
    * each group anti-joins the delete files committed AFTER it (delete seq
    * > file seq) — a group with no applicable deletes scans clean, so a
    * compacted or CoW-maintained table pays zero merge cost at read. The
    * explicit schema is what makes [[addColumn]] evolution work: files
    * written before the column existed read it back as null (and a
    * pre-evolution snapshot, pinning the old schema, never shows the column
    * at all). Renamed columns are read under their PHYSICAL in-file name
    * and aliased back to the snapshot's logical name ([[renameColumn]]).
    * Dropping a column that is still a pending delete key is unsupported
    * (compact first). */
  private def readFiles(spark: SparkSession, snap: Snapshot,
                        files: Seq[FileEntry]): DataFrame = {
    def applicable(seq: Long) = snap.deletes.filter(_.seq > seq)
    if (snap.deletes.isEmpty || files.forall(f => applicable(f.seq).isEmpty))
      readFilesRaw(spark, snap, files)
    else {
      val invRenames = snap.renames.map(_.swap)
      files.groupBy(_.seq).toSeq.sortBy(_._1).map { case (seq, fs) =>
        applicable(seq).foldLeft(readFilesRaw(spark, snap, fs)) { (df, d) =>
          val logicalKeys = d.keys.map(pk => invRenames.getOrElse(pk, pk))
          val keys = spark.read.parquet(d.path).select(
            d.keys.zip(logicalKeys).map { case (p, l) => col(p).as(l) }.toSeq: _*)
          df.join(keys, logicalKeys, "left_anti")
        }
      }.reduce(_.unionByName(_))
    }
  }

  private def readFilesRaw(spark: SparkSession, snap: Snapshot,
                           files: Seq[FileEntry]): DataFrame = {
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (snap.renames.isEmpty)
      spark.read.schema(schema).parquet(files.map(_.path): _*)
    else {
      val physSchema = org.apache.spark.sql.types.StructType(
        schema.fields.map(f => f.copy(name = snap.physical(f.name))))
      spark.read.schema(physSchema).parquet(files.map(_.path): _*)
        .select(schema.fields.map(f => col(snap.physical(f.name)).as(f.name)).toSeq: _*)
    }
  }

  /** Rename a DataFrame's logical columns to the table's physical names
    * before writing (identity when the table has no renames). */
  private def toPhysical(df: DataFrame, table: String): DataFrame =
    readSnapshot(table).filter(_.renames.nonEmpty) match {
      case Some(snap) =>
        df.select(df.columns.map(c => col(c).as(snap.physical(c))).toSeq: _*)
      case None => df
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
             statsCols: Seq[String], commitId: String,
             bloomCols: Seq[String] = Nil): Snapshot = {
    val (aligned, schemaJson) = alignForAppend(df, table)
    writeData(aligned, table, commitId)
    commitWritten(spark, schemaJson, table, statsCols, commitId,
      bloomCols = bloomCols)
  }

  /** Schema enforcement on append (Iceberg writes are schema-checked; a
    * mismatched batch must never become a de-facto schema replacement —
    * before this guard, appending `k:int` to a `k:long` table silently
    * swapped the pinned schema and made every OLD file unreadable, and a
    * batch missing a column silently hid that column's data). Columns are
    * matched BY NAME (order-free, like parquet reads); types must agree
    * ignoring nullability; the snapshot keeps the TABLE's schema json, so
    * appends never churn schema history. Evolve explicitly with
    * [[addColumn]]/[[renameColumn]]/[[dropColumn]], or replace with
    * [[overwrite]]. */
  private def alignForAppend(df: DataFrame, table: String): (DataFrame, String) =
    readSnapshot(table) match {
      case None => (df, df.schema.json)
      case Some(snap) =>
        val pinned = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        (alignToSchema(df, pinned, table, "append"), snap.schemaJson)
    }

  /** Validate a write batch against the table's pinned schema (matched BY
    * NAME, order-free, nullability-insensitive) and return it in schema
    * order. Used by append and the merge pair — selecting by name alone
    * would let a type-drifted batch write parquet the pinned schema can't
    * read back. */
  private def alignToSchema(df: DataFrame,
                            pinned: org.apache.spark.sql.types.StructType,
                            table: String, op: String): DataFrame = {
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => f.name -> f.dataType.catalogString).toMap
    require(shape(df.schema) == shape(pinned),
      s"$op schema mismatch for $table: table has " +
        s"${shape(pinned).toSeq.sorted.mkString(", ")} but the batch has " +
        s"${shape(df.schema).toSeq.sorted.mkString(", ")} — evolve with " +
        "addColumn/renameColumn/dropColumn or replace with overwrite")
    df.select(pinned.fieldNames.map(col).toSeq: _*)
  }

  /** [[append]] with merge-style crash-retry idempotence: if ANY snapshot
    * already references files under `data/<commitId>/`, the call is a
    * metadata-checked no-op returning the current snapshot. The primitive a
    * resumable incremental consumer needs — one commit per increment, keyed
    * by the increment id, survives a crash between the table commit and the
    * consumer's own checkpoint advance ([[graft.streaming.Streams.drainTableIncrement]]). */
  def appendIdempotent(spark: SparkSession, df: DataFrame, table: String,
                       statsCols: Seq[String], commitId: String): Snapshot = {
    // Per-commitId claim: CONCURRENT attempts at the same commitId share
    // the data/<commitId>/ directory, so the loser's overwrite could orphan
    // the winner's just-committed file paths. The claim serializes the
    // check-write-commit for one commitId only — attempts at different
    // commitIds still run fully in parallel. (Crash-orphaned claims age out
    // like the commit lock; sequential replays — the common path — pay one
    // create+delete.)
    if (alreadyCommitted(table, commitId)) readSnapshot(table).get
    else withClaim(table, commitId) {
      if (alreadyCommitted(table, commitId)) readSnapshot(table).get
      else append(spark, df, table, statsCols, commitId)
    }
  }

  /** O_EXCL claim scoped to one commitId (see [[appendIdempotent]]). */
  private def withClaim[T](table: String, commitId: String,
                           staleMs: Long = 300000L)(body: => T): T = {
    Files.createDirectories(metaDir(table))
    val claim = metaDir(table).resolve(
      s"claim-${commitId.replaceAll("[^a-zA-Z0-9_.-]", "_")}.lock")
    var held = false
    while (!held) {
      try { Files.createFile(claim); held = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          try {
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(claim).toMillis
            if (age > staleMs) Files.deleteIfExists(claim) else Thread.sleep(20)
          } catch { case _: java.nio.file.NoSuchFileException => () }
      }
    }
    try body finally Files.deleteIfExists(claim)
  }

  /** Has `commitId` ever been committed to `table`? O(1): one read of the
    * current snapshot's cumulative commitId ledger. Pre-upgrade tables
    * (snapshots without the ledger) fall back to the historical file-path
    * scan — upgraded transparently by their next commit, which starts the
    * ledger from the full history. */
  def alreadyCommitted(table: String, commitId: String): Boolean =
    readSnapshot(table) match {
      case None => false
      case Some(s) if s.commitIds.nonEmpty => s.commitIds.contains(commitId)
      case Some(_) => historicalCommitIds(table).contains(commitId)
    }

  /** Commit ids recoverable from snapshot history's file paths (legacy
    * tables whose snapshots predate the ledger). */
  private def historicalCommitIds(table: String): Set[String] = {
    val DataId = ".*/data/([^/]+)/[^/]*".r
    val DelId = ".*/deletes/([^/]+)/[^/]*".r
    snapshots(table).flatMap(id => snapshotAt(table, id).toSeq.flatMap(s =>
      s.files.map(_.path) ++ s.deletes.map(_.path))).collect {
      case DataId(c) => c
      case DelId(c) => c
    }.toSet
  }

  /** Phase 1 of [[append]]: write the data files only (no snapshot yet).
    * Until [[commitWritten]] runs, the files are unreferenced — a crash here
    * is invisible to readers, exactly the SAC_DONE re-scan semantics.
    * Takes LOGICAL column names; renamed columns are stored under their
    * stable physical names so every data file of the table is uniform.
    * A table with a partition spec lays this commit's files out by derived
    * partition value (HIDDEN partitioning — the caller passes raw rows). */
  def writeData(df: DataFrame, table: String, commitId: String): Unit =
    writeDataSpec(df, table, commitId, readSnapshot(table).map(_.spec).getOrElse(Nil))

  /** [[writeData]] without the declared-SortOrder pass — for [[compact]],
    * which owns its clustering AND its size-targeted file count. */
  private def writeDataRaw(df: DataFrame, table: String, commitId: String): Unit =
    writeDataSpec(df, table, commitId,
      readSnapshot(table).map(_.spec).getOrElse(Nil), applyOrder = false)

  private def writeDataSpec(df: DataFrame, table: String, commitId: String,
                            spec: Seq[PartitionField],
                            applyOrder: Boolean = true,
                            snapOverride: Option[Snapshot] = None): Unit = {
    val dir = Paths.get(table, "data", commitId).toString
    // cross-lineage collision guard: data/<commitId>/ is one namespace, so
    // while branches are staged a commitId already on SOME branch's ledger
    // must not be written again from anywhere — mode(overwrite) would
    // clobber that lineage's committed files. Zero cost when no branch
    // exists; writers on a branch pre-check their own ledger and refuse
    // before reaching here ([[appendToBranch]]).
    branches(table).foreach { case (b, hid) =>
      snapshotAt(table, hid).foreach { h =>
        require(!h.commitIds.contains(commitId),
          s"commitId $commitId is already committed on branch $b of $table " +
            "(or its fork history); publish or drop the branch, or use a " +
            "different commitId")
      }
    }
    // …and the SAME guard against CURRENT's (main's) ledger: a branch write
    // whose commitId main committed after the fork — or a plain append
    // replaying a committed id — would mode(overwrite) files the committed
    // snapshot references, corrupting the table before any optimistic check
    // runs. Idempotent replays never reach here (appendIdempotent / merge /
    // mergeOnRead / deleteKeys / compact all pre-check alreadyCommitted).
    readSnapshot(table).foreach { cur =>
      val mainLedger =
        if (cur.commitIds.nonEmpty) cur.commitIds else historicalCommitIds(table)
      require(!mainLedger.contains(commitId),
        s"commitId $commitId is already committed on $table's main lineage; " +
          "replaying a committed id would overwrite its referenced files — " +
          "use appendIdempotent for crash-retries, or a different commitId")
    }
    val snap = snapOverride.orElse(readSnapshot(table))
    val physFn = snap.map(s => s.physical _).getOrElse(identity[String] _)
    val phys = toPhysical(df, table)
    val order = if (applyOrder) snap.flatMap(_.order) else None
    // the declared SortOrder's clustering expression(s), in PHYSICAL names;
    // z-order quantizes against THIS BATCH's bounds (per-batch locality —
    // cross-batch unification is compact's job, exactly as in Iceberg)
    def orderExprs(o: SortOrder): Seq[Column] =
      if (!o.zorder) o.cols.map(c => col(physFn(c)))
      else {
        val aggs = o.cols.flatMap(c => Seq(
          min(col(physFn(c))).cast("double").as(s"lo_$c"),
          max(col(physFn(c))).cast("double").as(s"hi_$c")))
        val b = phys.agg(aggs.head, aggs.tail: _*).collect()(0)
        def d(n: String): Double =
          Option(b.getAs[java.lang.Double](n)).fold(Double.NaN)(_.doubleValue)
        Seq(ZOrder.zvalue(o.cols.map(c =>
          col(physFn(c)) -> (d(s"lo_$c"), d(s"hi_$c")))))
      }
    if (spec.isEmpty) {
      val out = order.fold(phys) { o =>
        val es = orderExprs(o)
        phys.repartitionByRange(es: _*).sortWithinPartitions(es: _*)
      }
      out.write.mode("overwrite").parquet(dir)
    } else {
      val withP = spec.foldLeft(phys)((acc, f) =>
        acc.withColumn(partColName(f), partitionExpr(f, df.schema, physFn)))
      // one repartition by partition value clusters each partition's rows
      // into as few files as the value's volume needs; partitionBy then
      // routes them into p_<name>=<value>/ dirs (values are NOT stored in
      // the files — the layout and the manifest carry them). A declared
      // SortOrder additionally sorts WITHIN each partition's rows.
      val parts = spec.map(f => col(partColName(f)))
      val clustered = withP.repartition(parts: _*)
      order.fold(clustered)(o => clustered.sortWithinPartitions(parts ++ orderExprs(o): _*))
        .write.mode("overwrite")
        .partitionBy(spec.map(partColName): _*)
        .parquet(dir)
    }
  }

  /** The hidden-partition derivation for one spec field (logical `source`
    * resolved to its physical column). */
  private def partitionExpr(f: PartitionField,
                            schema: org.apache.spark.sql.types.StructType,
                            phys: String => String): Column = {
    import org.apache.spark.sql.types._
    val src = col(phys(f.source))
    def srcType: DataType = schema.fields.find(_.name == f.source)
      .getOrElse(throw new IllegalArgumentException(
        s"partition source ${f.source} not in schema")).dataType
    f.transform match {
      case "identity" => src
      case BucketT(n) => pmod(hash(src), lit(n.toInt))
      case TruncateT(w) => srcType match {
        case StringType => substring(src, 1, w.toInt)
        case _: NumericType => (floor(src / w.toInt) * w.toInt).cast(srcType)
        case t => throw new IllegalArgumentException(s"truncate on ${t.simpleString}")
      }
      case "year" => date_format(src, "yyyy")
      case "month" => date_format(src, "yyyy-MM")
      case "day" => date_format(src, "yyyy-MM-dd")
      case CellT(r) =>
        array_min(graft.functions.GeoFunctions.cellCoverUdf(src, lit(r.toInt)))
      case t => throw new IllegalArgumentException(s"unknown partition transform $t")
    }
  }

  /** Create a table with a partition spec in its first commit. The spec is
    * table metadata from then on: every later [[append]]/[[merge]]/
    * [[compact]] lays its files out by the same derived values without the
    * caller repeating anything. */
  def createPartitioned(spark: SparkSession, df: DataFrame, table: String,
                        spec: Seq[PartitionField], statsCols: Seq[String],
                        commitId: String): Snapshot = {
    require(currentSnapshotId(table).isEmpty, s"$table already exists")
    require(spec.nonEmpty, "empty partition spec; use append")
    spec.foreach { f =>
      require(df.schema.fieldNames.contains(f.source),
        s"partition source ${f.source} not in schema")
      require(!df.schema.fieldNames.contains(partColName(f)),
        s"column ${partColName(f)} collides with partition field ${f.name}")
    }
    writeDataSpec(df, table, commitId, spec)
    commitWritten(spark, df.schema.json, table, statsCols, commitId,
      specOverride = Some(spec))
  }

  /**
   * Partition-spec EVOLUTION (Iceberg's spec evolution): a METADATA-ONLY
   * commit that changes how FUTURE commits lay out their files — add
   * partitioning to a plain table, re-bucket, change granularity, or drop
   * it (`Nil`). Existing data files keep their old layout and their
   * recorded per-file partition values; pruning is per-file (a file with no
   * value for a spec field is conservatively kept), so a mixed-layout table
   * stays correct through any number of evolutions. The next [[compact]]
   * rewrites everything into the current spec, unifying the layout. At
   * 100 TB this is the only sane path: re-partitioning by rewrite is a
   * full-table job you schedule, not a side effect of changing the spec.
   */
  def evolveSpec(table: String, newSpec: Seq[PartitionField]): Snapshot = retryOnConflict() {
    import org.apache.spark.sql.types.{DataType, StructType}
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(newSpec.map(_.name).distinct.size == newSpec.size,
      s"duplicate partition field names in ${newSpec.map(_.name)}")
    newSpec.foreach { f =>
      require(schema.fieldNames.contains(f.source),
        s"partition source ${f.source} not in schema")
      require(!schema.fieldNames.contains(partColName(f)),
        s"column ${partColName(f)} collides with partition field ${f.name}")
      partitionExpr(f, schema, snap.physical) // validates the transform
    }
    commitSnapshot(table, snap.copy(id = snap.id + 1, parent = snap.id, spec = newSpec))
  }

  /**
   * Declare (or change) the table's write SortOrder — a METADATA-ONLY
   * commit (Iceberg's `replaceSortOrder`). From then on every
   * [[append]]/[[merge]]/[[mergeOnRead]]/[[overwrite]] clusters its batch
   * by it (range-sort, or z-order bit-interleave over the batch's bounds)
   * and [[compact]] defaults to it table-wide, so per-file min/max stats
   * stay tight without any caller re-stating the layout. Existing files
   * keep their layout until the next compaction — exactly like spec
   * evolution. Pass `None` to clear.
   */
  def setSortOrder(table: String, order: Option[SortOrder]): Snapshot = retryOnConflict() {
    import org.apache.spark.sql.types.{DataType, NumericType, StructType}
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    order.foreach { o =>
      require(o.cols.nonEmpty && o.cols.distinct.size == o.cols.size,
        s"bad sort-order columns ${o.cols}")
      val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
      o.cols.foreach { c =>
        val f = schema.fields.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(s"sort-order column $c not in schema"))
        if (o.zorder) require(f.dataType.isInstanceOf[NumericType],
          s"z-order needs numeric columns; $c is ${f.dataType.simpleString}")
      }
      if (o.zorder) require(o.cols.size >= 2 && o.cols.size <= 3,
        s"z-order takes 2 or 3 columns, got ${o.cols.size}")
    }
    commitSnapshot(table, snap.copy(id = snap.id + 1, parent = snap.id, order = order))
  }

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
              commitId: String, targetFileBytes: Long = 128L << 20,
              sortBy: Seq[String] = Nil, zorderBy: Seq[String] = Nil,
              bloomCols: Seq[String] = Nil): Snapshot = {
    require(sortBy.isEmpty || zorderBy.isEmpty,
      "sortBy and zorderBy are alternative clustering strategies; pick one")
    // crash-retry contract (same as append/merge/deleteKeys): replaying a
    // COMPLETED compact would lazily self-read the current snapshot's files
    // from data/<commitId>/ and then mode(overwrite) that same directory —
    // a read-from/overwrite-to-same-path corrupting the committed snapshot
    if (alreadyCommitted(table, commitId)) return readSnapshot(table).get
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    // explicit clustering args win; otherwise the table's declared
    // SortOrder (setSortOrder) decides — compact is where per-batch write
    // clustering gets unified table-wide
    require(snap.spec.isEmpty || (sortBy.isEmpty && zorderBy.isEmpty),
      "a partitioned table's compact layout comes from its spec (+ declared " +
        "SortOrder for within-partition clustering via setSortOrder); " +
        "explicit sortBy/zorderBy would be silently ignored")
    val (effSort, effZ) =
      if (sortBy.nonEmpty || zorderBy.nonEmpty) (sortBy, zorderBy)
      else snap.order.map(o => if (o.zorder) (Nil, o.cols) else (o.cols, Nil))
        .getOrElse((Nil, Nil))
    val cur = read(spark, table) // snapshot-pinned file list: safe self-read
    // A MoR-degraded read is a union whose partition count is the SUM of its
    // legs' — written as-is, a 33-leg union splinters into ~1000 files and
    // the "compacted" table reads slower than the debt it retired. Coalesce
    // to the size-targeted file count (floored at cluster width so the
    // rewrite and subsequent scans stay parallel). Spec'd tables get their
    // clustering from writeDataSpec's partition-value repartition instead.
    val bytes = snap.files.map { f =>
      val p = Paths.get(f.path.stripPrefix("file:"))
      if (Files.exists(p)) Files.size(p) else 0L
    }.sum
    val target = math.max(1, math.max(
      math.ceil(bytes.toDouble / targetFileBytes).toInt,
      math.min(spark.sparkContext.defaultParallelism, cur.rdd.getNumPartitions)))
    // Sorted rewrite (Iceberg's rewrite_data_files sort strategy): a MoR
    // union interleaves update rows with base rows, so the unsorted rewrite
    // loses the clustering the original appends had — bigger files (worse
    // parquet encoding) and overlapping manifest min/max (no pruning).
    // Range-partition + sortWithinPartitions on `sortBy` restores both.
    val out =
      if (snap.spec.nonEmpty) cur // layout clustering comes from the spec
      else if (effZ.nonEmpty) {
        // Z-order rewrite (Iceberg's z-order strategy): global bounds in one
        // pass, then range-partition + sort on the interleaved key — every
        // zorderBy column gets ~multiplicatively tight per-file min/max, so
        // conjunctive range reads (AOI scans) prune on ALL of them at once.
        val aggs = effZ.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"lo_$c"),
          max(col(c)).cast("double").as(s"hi_$c")))
        val b = cur.agg(aggs.head, aggs.tail: _*).collect()(0)
        // all-null/empty bounds degrade to a constant dimension (no NPE)
        def d(n: String): Double =
          Option(b.getAs[java.lang.Double](n)).fold(Double.NaN)(_.doubleValue)
        val z = ZOrder.zvalue(effZ.map(c =>
          col(c) -> (d(s"lo_$c"), d(s"hi_$c"))))
        cur.repartitionByRange(target, z).sortWithinPartitions(z)
      }
      else if (effSort.nonEmpty)
        cur.repartitionByRange(target, effSort.map(col): _*)
          .sortWithinPartitions(effSort.map(col): _*)
      else if (cur.rdd.getNumPartitions > target) cur.coalesce(target)
      else cur
    // spec'd tables cluster in writeDataSpec (partition repartition + the
    // declared order within partitions); unpartitioned rewrites clustered
    // RIGHT HERE with the size-targeted file count, so skip the order pass
    if (snap.spec.nonEmpty) writeData(out, table, commitId)
    else writeDataRaw(out, table, commitId)
    commitWritten(spark, cur.schema.json, table, statsCols, commitId,
      keepPrev = false, basedOn = Some(snap), bloomCols = bloomCols)
  }

  /** Phase 2 of [[append]]: stat the files written by [[writeData]] and swap
    * the snapshot pointer. Split out so a caller can inspect the write's
    * observed metrics (e.g. rows-in) before deciding to commit.
    * `keepPrev = false` makes the new snapshot reference only this commit's
    * files (a replacing commit — compaction / overwrite semantics). */
  def commitWritten(spark: SparkSession, schemaJson: String, table: String,
                    statsCols: Seq[String], commitId: String,
                    keepPrev: Boolean = true,
                    statsExprs: Map[String, (Column, Column)] = Map.empty,
                    carryFiles: Seq[FileEntry] = Nil,
                    carryDeletes: Seq[DeleteEntry] = Nil,
                    autoStats: Boolean = true,
                    specOverride: Option[Seq[PartitionField]] = None,
                    basedOn: Option[Snapshot] = None,
                    bloomCols: Seq[String] = Nil,
                    toBranch: Option[String] = None): Snapshot = {
    val dataDir = Paths.get(table, "data", commitId)
    // `basedOn` pins the snapshot an operation PLANNED against (merge's
    // file pruning, compact's self-read): building the commit from any
    // fresher snapshot would slip past the optimistic parent check with
    // stale carries. Unpinned callers (plain appends) read fresh.
    val prev = basedOn.orElse(readSnapshot(table))
    val phys = prev.map(s => s.physical _).getOrElse(identity[String] _)
    val spec = specOverride.orElse(prev.map(_.spec)).getOrElse(Nil)
    // cell-partitioned tables auto-index each file's FULL cover range
    // (min/max over every covering cell, not just the min cell the layout
    // uses) — [[readAoi]]'s pruning layer for spanning footprints
    val cellStatsExprs = spec.collect {
      case f @ PartitionField(_, src, CellT(r)) =>
        val cover = graft.functions.GeoFunctions.cellCoverUdf(col(phys(src)), lit(r.toInt))
        s"cover_${f.name}" -> (array_min(cover), array_max(cover))
    }.toMap
    // Auto-stats (Iceberg's write.metadata.metrics default): a commit with
    // NO explicit stats request still indexes every top-level atomic column
    // (capped at 32 for metadata size), so pruned reads and file-targeted
    // MERGE work on tables written before the caller thought about stats.
    // Explicit statsCols/statsExprs keep full control when given;
    // autoStats = false opts out entirely (and models pre-auto-stats
    // tables in specs).
    val effStatsCols =
      if (statsCols.nonEmpty || statsExprs.nonEmpty || !autoStats) statsCols
      else {
        import org.apache.spark.sql.types._
        DataType.fromJson(schemaJson).asInstanceOf[StructType].fields.collect {
          case f if f.dataType.isInstanceOf[NumericType] ||
            f.dataType == StringType || f.dataType == BooleanType ||
            f.dataType == DateType || f.dataType == TimestampType => f.name
        }.take(32).toSeq
      }
    // one-pass per-file stats; plain statsCols index the column itself,
    // statsExprs carry (per-row lo, per-row hi) Columns for derived values
    // — e.g. min/max over a nested array field, which prunes band-filter
    // scans at the file level without any flat column materialized
    val effStatsExprs = statsExprs ++ cellStatsExprs
    val statNames = effStatsCols ++ effStatsExprs.keys.toSeq.sorted
    val statAggs = effStatsCols.flatMap(c =>
      Seq(min(col(phys(c))).cast("string").as(s"min_$c"),
        max(col(phys(c))).cast("string").as(s"max_$c"))) ++
      effStatsExprs.toSeq.sortBy(_._1).flatMap { case (n, (lo, hi)) =>
        Seq(min(lo).cast("string").as(s"min_$n"), max(hi).cast("string").as(s"max_$n"))
      }
    // explicit PHYSICAL schema: skips the footer-inference job every commit
    // would otherwise pay (data files store physical column names)
    val physSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fields.map(f => f.copy(name = phys(f.name))))
    val stats = spark.read.schema(physSchema).parquet(dataDir.toString)
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"), statAggs: _*)
      .collect()
    // parent MUST derive from the same `prev` the snapshot content is built
    // from: a separate CURRENT read here could see a concurrent commit that
    // `prev` predates, making the optimistic parent check pass on a
    // snapshot that silently drops that commit's files (lost update)
    val parent = prev.map(_.id).getOrElse(-1L)
    // partition values are carried by the hive-style path segments the
    // spec-aware write laid down (p_<name>=<value>); a null partition value
    // writes __HIVE_DEFAULT_PARTITION__, recorded as no value → the file is
    // conservatively kept by every partition prune. Segments are stored
    // UNESCAPED: partitionBy path-escapes ':', '/', '%', '=', '#', … as %XX
    // (Spark's escapePathName), while partitionPrune compares raw predicate
    // literals — recording the escaped form would wrongly prune files whose
    // string partition value contains any escapable character
    val PartSeg = "([^/=]+)=([^/]+)".r
    def partOf(path: String): Map[String, String] =
      if (spec.isEmpty) Map.empty
      else {
        val names = spec.map(partColName).toSet
        path.split('/').collect {
          case PartSeg(n, v) if names.contains(n) && v != "__HIVE_DEFAULT_PARTITION__" =>
            n.stripPrefix("p_") -> unescapePathSegment(v)
        }.toMap
      }
    // per-file Bloom sidecars (see [[Bloom]]): one extra pass hashing each
    // bloom column with codegen'd xxhash64, one OR-merged bit array per
    // (file × column), written as small binaries under blooms/<commitId>/ —
    // the snapshot JSON carries only their paths
    val blooms: Map[(String, String), String] =
      if (bloomCols.isEmpty || stats.isEmpty) Map.empty
      else {
        val mBits = Bloom.sizeBits(stats.map(_.getAs[Long]("rows")).max)
        val agg = udaf(new Bloom.Agg(mBits))
        val bAggs = bloomCols.map(c => agg(xxhash64(col(phys(c)))).as(s"bloom_$c"))
        val bDir = Paths.get(table, "blooms", commitId)
        Files.createDirectories(bDir)
        spark.read.schema(physSchema).parquet(dataDir.toString)
          .groupBy(input_file_name().as("path"))
          .agg(bAggs.head, bAggs.tail: _*)
          .collect().zipWithIndex.flatMap { case (r, i) =>
            bloomCols.map { c =>
              val p = bDir.resolve(s"f${i}_$c.bloom")
              Files.write(p, r.getAs[Array[Byte]](s"bloom_$c"))
              (fsPath(r.getAs[String]("path")), c) -> p.toString
            }
          }.toMap
      }
    val entries = stats.map { r =>
      val path = fsPath(r.getAs[String]("path"))
      FileEntry(path, r.getAs[Long]("rows"),
        statNames.map(c => c -> String.valueOf(r.getAs[Any](s"min_$c"))).toMap,
        statNames.map(c => c -> String.valueOf(r.getAs[Any](s"max_$c"))).toMap,
        seq = parent + 1, partition = partOf(path),
        bloom = bloomCols.flatMap(c => blooms.get((path, c)).map(c -> _)).toMap)
    }.toSeq.sortBy(_.path)

    // keepPrev carries the whole previous state (append); a replacing commit
    // carries only what the caller vouches for: carryFiles — prior entries
    // kept BY REFERENCE (file-targeted merge) — and carryDeletes, the
    // equality deletes still pending against those carried files
    val prevFiles = if (keepPrev) prev.map(_.files).getOrElse(Nil) else Nil
    val prevDeletes = if (keepPrev) prev.map(_.deletes).getOrElse(Nil) else Nil
    // cumulative commitId ledger: ALWAYS carried (even by replacing
    // commits) so the idempotence guard stays O(1) and survives expiry; a
    // legacy table's first post-upgrade commit seeds it from full history
    val ledger = prev.map(s =>
      if (s.commitIds.nonEmpty) s.commitIds else historicalCommitIds(table))
      .getOrElse(Set.empty[String]) + commitId
    // A PURE append (carries the whole previous state, adds only this
    // commit's files) rebases mechanically onto a concurrently-advanced
    // table: restamp the new entries' seq, keep everything of the new
    // current. Replacing commits and file-targeted merges were computed
    // FROM a specific parent — those conflict loudly instead.
    val prevSchema = prev.map(_.schemaJson)
    val pureAppend = keepPrev && carryFiles.isEmpty && carryDeletes.isEmpty
    val rebase: Snapshot => Option[Snapshot] =
      if (!pureAppend) null
      else cur => {
        val curLedger =
          if (cur.commitIds.nonEmpty) cur.commitIds else historicalCommitIds(table)
        if (curLedger.contains(commitId)) None // racing idempotent replay: done
        else if (cur.spec != spec) throw new CommitConflictException(
          s"$table partition spec changed while appending $commitId; re-run")
        else if (cur.schemaJson != prevSchema.getOrElse(schemaJson))
          throw new CommitConflictException(
            s"$table schema evolved while appending $commitId; re-run")
        else Some(Snapshot(cur.id + 1, cur.id, schemaJson,
          cur.files ++ entries.map(_.copy(seq = cur.id + 1)),
          cur.renames, cur.deletes, curLedger + commitId, cur.spec, cur.order))
      }
    commitSnapshot(table, Snapshot(parent + 1, parent, schemaJson,
      prevFiles ++ carryFiles ++ entries, prev.map(_.renames).getOrElse(Map.empty),
      prevDeletes ++ carryDeletes, ledger, spec, prev.flatMap(_.order)),
      rebase, toBranch)
  }

  /** `input_file_name()` returns the Hadoop Path URI form — %XX-encoded on
    * top of any Hive path escaping in partition dir segments. Decode it to
    * the plain on-disk filesystem path BEFORE recording: every consumer
    * (read-back, `Files.size`, the orphan sweep's referenced-set compare)
    * expects the literal path, and for a partition value with escapable
    * characters the URI form simply does not resolve. */
  private def fsPath(p: String): String =
    try new java.net.URI(p).getPath catch {
      case _: java.net.URISyntaxException => p.stripPrefix("file:")
    }

  /** Inverse of Spark's `escapePathName` (%XX, uppercase hex): a '%'
    * followed by two hex digits decodes to that char; anything else is
    * literal. '%' itself is in Spark's escape set, so every %XX sequence in
    * a written partition dir segment is an escape — the decode is lossless. */
  private[table] def unescapePathSegment(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hi = Character.digit(s.charAt(i + 1), 16)
        val lo = Character.digit(s.charAt(i + 2), 16)
        if (hi >= 0 && lo >= 0) { sb.append(((hi << 4) | lo).toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** A commit found the table advanced past the snapshot it was computed
    * from, and the operation cannot be rebased mechanically (replacing
    * commits, file-targeted merges, metadata ops). Re-run the operation
    * against the new current snapshot. */
  class CommitConflictException(msg: String) extends RuntimeException(msg)

  /** Serialize commits to one table via an O_EXCL lock file (the local-FS
    * stand-in for an Iceberg catalog's atomic pointer CAS). A lock older
    * than `staleMs` is presumed orphaned by a dead committer and broken —
    * commits are short (write one JSON + rename), so a live holder never
    * ages that much. */
  private def withCommitLock[T](table: String, staleMs: Long = 60000L)(body: => T): T = {
    Files.createDirectories(metaDir(table))
    val lock = metaDir(table).resolve("COMMIT.lock")
    var held = false
    while (!held) {
      try { Files.createFile(lock); held = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          try {
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(lock).toMillis
            if (age > staleMs) Files.deleteIfExists(lock) else Thread.sleep(5)
          } catch { case _: java.nio.file.NoSuchFileException => () }
      }
    }
    // live-holder heartbeat: the typical commit is "write one JSON + rename",
    // but the amortized manifest merge (every ManifestMergeCount commits) and
    // the stats/bloom passes are O(table files) — a holder legitimately
    // exceeding staleMs would get its lock stolen and the steal lets two
    // committers allocate the same snapshot id (lost commit). Bumping the
    // lock's mtime every staleMs/4 keeps a LIVE holder's lock perpetually
    // fresh, so the stale-break fires only for genuinely dead committers.
    val beat = new Thread(() => {
      try while (!Thread.currentThread().isInterrupted) {
        Thread.sleep(staleMs / 4)
        Files.setLastModifiedTime(lock,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      } catch {
        case _: InterruptedException => () // normal release
        case _: java.io.IOException => () // lock gone: nothing left to guard
      }
    }, s"graft-commit-lock-heartbeat")
    beat.setDaemon(true)
    beat.start()
    try body finally { beat.interrupt(); Files.deleteIfExists(lock) }
  }

  /** Unconditional snapshot write + CURRENT swap. Callers must hold the
    * commit lock and have validated the parent.
    *
    * Two-level metadata (Iceberg's manifest list): the file list is laid
    * out as immutable manifest files SHARED across snapshots. Every parent
    * manifest whose entries are carried unchanged (same path, same seq,
    * same stats) is referenced by path; only the remainder — the commit's
    * new or rewritten entries — goes into one new manifest. An append on a
    * 100k-file table therefore writes O(new files) metadata bytes, not a
    * fresh 100k-entry JSON; without this, metadata write amplification is
    * O(files × commits). Manifest files are written BEFORE the CURRENT
    * swap, so a crash strands only an unreferenced manifest
    * ([[removeOrphanFiles]] reaps it). The returned snapshot's file order
    * is the canonical on-disk order (reused manifests first), so the value
    * a committer holds matches what every later parse reads. */
  /** Manifests per snapshot before a full merge (Iceberg's
    * `commit.manifest.min-count-to-merge`): bounds the snapshot's path
    * list — without it the path list itself re-grows per commit and the
    * metadata write is quadratic again, just with a smaller constant. */
  private val ManifestMergeCount = 64

  private def writeManifest(table: String, id: Long, entries: Seq[FileEntry]): String = {
    val mf = metaDir(table).resolve(s"manifest-$id-${System.nanoTime()}.json")
    Files.writeString(mf, entries.map(renderFileEntry).mkString("[", ",", "]"))
    manifestCache.put(mf.toString, entries)
    mf.toString
  }

  private def persistSnapshot(table: String, snap: Snapshot,
                              pointerFile: Option[Path] = None): Snapshot = {
    val parentManifests = snapshotAt(table, snap.parent).map(_.manifests).getOrElse(Nil)
    val byKey = snap.files.map(f => f.path -> f).toMap
    val reused = parentManifests.filter(p =>
      loadManifest(p).forall(e => byKey.get(e.path).contains(e)))
    val reusedPaths = reused.flatMap(loadManifest).map(_.path).toSet
    val remainder = snap.files.filterNot(f => reusedPaths.contains(f.path))
    val canonicalFiles = reused.flatMap(loadManifest) ++ remainder
    // amortized manifest merge: one O(files) rewrite every ManifestMergeCount
    // commits keeps the per-snapshot path list (and so the snapshot JSON)
    // bounded; old manifests stay on disk for the snapshots that still
    // reference them and expire with them
    val refs =
      if (reused.size >= ManifestMergeCount)
        Seq(writeManifest(table, snap.id, canonicalFiles))
      else reused ++ (if (remainder.isEmpty) Nil
        else Seq(writeManifest(table, snap.id, remainder)))
    val canonical = snap.copy(files = canonicalFiles, manifests = refs)
    Files.writeString(metaDir(table).resolve(s"snapshot-${snap.id}.json"),
      renderSnapshot(canonical))
    val pointer = pointerFile.getOrElse(metaDir(table).resolve("CURRENT"))
    if (pointer.getParent != null) Files.createDirectories(pointer.getParent)
    // dotted tmp name: a crash-orphaned tmp must not be listed as a branch
    val tmp = pointer.resolveSibling("." + pointer.getFileName.toString + ".tmp")
    Files.writeString(tmp, snap.id.toString)
    Files.move(tmp, pointer,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    canonical
  }

  /** Optimistic-concurrency commit tail shared by data commits and
    * metadata-only commits (Iceberg's commit protocol): under the table's
    * commit lock, verify the table is still at `snap.parent`. If another
    * writer advanced it, `rebase` (when the operation is mechanically
    * rebasable — pure appends) recomputes the snapshot against the new
    * current (`None` = the commit turns out to be already applied, e.g. a
    * racing idempotent replay); otherwise the commit fails loudly with
    * [[CommitConflictException]] and the caller re-runs. */
  private def commitSnapshot(table: String, snap: Snapshot,
                             rebase: Snapshot => Option[Snapshot] = null,
                             toBranch: Option[String] = None): Snapshot =
    withCommitLock(table) {
      // snapshot ids are allocated TABLE-GLOBALLY fresh under the lock:
      // while a branch is staged, parent+1 on either lineage could collide
      // with the other's existing snapshot file (main at 2 + staged 3 →
      // a main commit must take 4, not overwrite 3). The commit's NEW file
      // entries are stamped seq = snap.id by the builder, so they remap
      // with the id.
      def persistFresh(s: Snapshot, pointer: Option[Path]): Snapshot = {
        val fresh = snapshots(table).lastOption.map(_ + 1L).getOrElse(0L)
        val out = if (fresh == s.id) s else s.copy(id = fresh,
          files = s.files.map(f => if (f.seq == s.id) f.copy(seq = fresh) else f),
          deletes = s.deletes.map(d => if (d.seq == s.id) d.copy(seq = fresh) else d))
        persistSnapshot(table, out, pointer)
      }
      toBranch match {
        case Some(b) =>
          // branch commits CAS the BRANCH pointer, never CURRENT; no
          // mechanical rebase — staging branches are single-writer,
          // conflicts are loud
          val headId = branches(table).getOrElse(b,
            throw new IllegalArgumentException(s"no branch $b in $table"))
          if (headId != snap.parent) throw new CommitConflictException(
            s"branch $b of $table advanced to $headId while committing " +
              s"against ${snap.parent}; re-run")
          persistFresh(snap, Some(branchesDir(table).resolve(b)))
        case None =>
          val cur = readSnapshot(table)
          val curId = cur.map(_.id).getOrElse(-1L)
          if (curId == snap.parent) persistFresh(snap, None)
          else if (rebase != null) rebase(cur.get) match {
            case Some(s) => persistFresh(s, None)
            case None => cur.get
          }
          else throw new CommitConflictException(
            s"$table advanced to snapshot $curId while committing against ${snap.parent}; re-run")
      }
    }

  /** Re-run `body` when a concurrent commit invalidated its snapshot read —
    * the optimistic-retry loop for metadata-only ops, whose whole
    * read-modify-write is cheap to redo. */
  private def retryOnConflict[T](attempts: Int = 5)(body: => T): T = {
    var left = attempts
    while (true) {
      try return body
      catch { case e: CommitConflictException =>
        left -= 1; if (left == 0) throw e
      }
    }
    throw new IllegalStateException("unreachable")
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
  def addColumn(table: String, name: String, sqlType: String): Snapshot = retryOnConflict() {
    import org.apache.spark.sql.types.{DataType, StructType}
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(!schema.fieldNames.contains(name), s"column $name already exists")
    // The new column's default physical name is its logical name — but if
    // that physical name was EVER used by this table (current columns, or
    // a column since renamed/dropped whose bytes remain in retained data
    // files), reusing it would RESURRECT the old values instead of
    // null-backfilling. Mint a fresh physical name instead — the same
    // effect Iceberg gets from never reusing field IDs. The scan is
    // metadata-only (historical snapshot schemas, no file reads).
    val historicalPhysical = snapshots(table).flatMap(id =>
      snapshotAt(table, id).toSeq.flatMap { s =>
        val sch = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
        sch.fieldNames.map(s.physical).toSeq
      }).toSet
    val widened = schema.add(name, sqlType, nullable = true)
    val newRenames =
      if (!historicalPhysical.contains(name)) snap.renames
      else {
        var v = snap.id + 1
        while (historicalPhysical.contains(s"${name}__v$v")) v += 1
        snap.renames + (name -> s"${name}__v$v")
      }
    // copy() so pending equality deletes and the commitId ledger survive a
    // schema-evolution commit (dropping them would resurrect MoR-deleted rows)
    commitSnapshot(table, snap.copy(id = snap.id + 1, parent = snap.id,
      schemaJson = widened.json, renames = newRenames))
  }

  /** Schema evolution: DROP COLUMN — a metadata-only commit (new snapshot,
    * same files, narrowed schema). Data files keep the bytes; the pinned
    * read schema simply stops projecting them, and time travel to a
    * pre-drop snapshot still sees the column. O(1) at any table size. */
  def dropColumn(table: String, name: String): Snapshot = retryOnConflict() {
    import org.apache.spark.sql.types.{DataType, StructType}
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(schema.fieldNames.contains(name), s"no column $name")
    val narrowed = StructType(schema.fields.filterNot(_.name == name))
    require(narrowed.nonEmpty, "cannot drop the last column")
    require(snap.deletes.forall(d => !d.keys.contains(snap.physical(name))),
      s"column $name is a pending equality-delete key; compact first")
    require(!snap.spec.exists(_.source == name),
      s"column $name is a partition source; drop the partition field first")
    require(!snap.order.exists(_.cols.contains(name)),
      s"column $name is in the table's sort order; setSortOrder first")
    commitSnapshot(table, snap.copy(id = snap.id + 1, parent = snap.id,
      schemaJson = narrowed.json, renames = snap.renames - name))
  }

  /** Schema evolution: RENAME COLUMN — a metadata-only commit. Data files
    * keep the original (physical) column name; the snapshot records the
    * logical→physical mapping and the read path aliases it back — the
    * name-mapping equivalent of Iceberg's field-ID rename, O(1) at any
    * table size. Appends after the rename write the physical name, so the
    * table's files stay uniform. Time travel to a pre-rename snapshot sees
    * the old name. */
  def renameColumn(table: String, from: String, to: String): Snapshot = retryOnConflict() {
    import org.apache.spark.sql.types.{DataType, StructType}
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(schema.fieldNames.contains(from), s"no column $from")
    require(!schema.fieldNames.contains(to), s"column $to already exists")
    val physicalName = snap.physical(from)
    val renamed = StructType(schema.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f))
    // the partition spec tracks the LOGICAL source name — it follows renames
    // (the hidden-partitioning contract: the layout never cares what the
    // column is called today)
    val renamedSpec = snap.spec.map(f =>
      if (f.source == from) f.copy(source = to) else f)
    // the sort order, like the spec, tracks LOGICAL names across renames
    val renamedOrder = snap.order.map(o =>
      o.copy(cols = o.cols.map(c => if (c == from) to else c)))
    commitSnapshot(table, snap.copy(id = snap.id + 1, parent = snap.id,
      schemaJson = renamed.json, renames = (snap.renames - from) + (to -> physicalName),
      spec = renamedSpec, order = renamedOrder))
  }

  /**
   * MERGE (upsert): rows of `updates` replace current rows sharing their
   * `keyCols` tuple; unmatched update rows are inserted — the ODC index
   * sink's natural table form (idempotent dataset upsert,
   * `utils/dataset_index_from_s3_bucket.py:41-131` — per-dataset, never
   * whole-index), Iceberg's copy-on-write MERGE strategy.
   *
   * FILE-TARGETED: only files whose manifest key min/max intersects the
   * update batch's key range are rewritten; every provably-disjoint file is
   * carried BY REFERENCE into the new snapshot (same path, same bytes). A
   * daily upsert of 0.1% of a 100 TB table therefore rewrites only the
   * files holding those keys, not the table — cost scales with touched
   * files (tools.MergeScale measures this). Files lacking key stats are
   * conservatively rewritten; the rewrite commit always collects stats for
   * `keyCols`, so any table maintained by merge becomes prunable even if
   * its original appends never indexed the keys.
   *
   * One probe job over the (small) updates side computes BOTH the
   * duplicate-key refusal (duplicate keys in one batch make "upsert"
   * ambiguous) and the per-key-column ranges that drive the pruning — the
   * old separate duplicate-count action is folded in, so the check is free.
   * Re-issuing the SAME commitId (crash-retry) is a metadata-checked no-op;
   * time travel to the pre-merge snapshot is intact. Fact-table streams
   * still take append + anti-join (Checkpoint); [[mergeOnRead]] is the
   * write-cheap/read-cost variant of the same contract.
   */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
            keyCols: Seq[String], statsCols: Seq[String], commitId: String): Snapshot = {
    if (alreadyCommitted(table, commitId)) return readSnapshot(table).get
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val aligned = alignToSchema(updates, schema, table, "merge")
    val probeAggs = Seq(
      count(lit(1)).as("__n"),
      // struct() so tuples containing nulls still count as distinct values
      countDistinct(struct(keyCols.map(col): _*)).as("__nd")) ++
      keyCols.flatMap(c => Seq(min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")))
    val pr = updates.agg(probeAggs.head, probeAggs.tail: _*).collect()(0)
    require(pr.getAs[Long]("__n") == pr.getAs[Long]("__nd"),
      s"merge updates contain duplicate ${keyCols.mkString(",")} keys")
    val numericKey = keyCols.map(c => c -> schema.fields.find(_.name == c)
      .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])).toMap
    val range = keyCols.flatMap { c =>
      (Option(pr.getAs[String](s"__min_$c")), Option(pr.getAs[String](s"__max_$c"))) match {
        case (Some(lo), Some(hi)) => Some(c -> (lo, hi))
        case _ => None // all-null key column in updates: no range to prune on
      }
    }.toMap
    // a file can hold a matched key tuple only if EVERY key column's stored
    // range overlaps the batch range — one provably-disjoint column clears it
    def disjoint(f: FileEntry, c: String): Boolean =
      (f.min.get(c), f.max.get(c), range.get(c)) match {
        case (Some(mn), Some(mx), Some((lo, hi))) if mn != "null" && mx != "null" =>
          if (numericKey(c)) mx.toDouble < lo.toDouble || mn.toDouble > hi.toDouble
          else mx < lo || mn > hi
        case _ => false // stat or range missing: conservatively touched
      }
    val (carried, touched) = snap.files.partition(f => keyCols.exists(disjoint(f, _)))
    val retained = readFiles(spark, snap, touched) // applies pending deletes
      .join(aligned.select(keyCols.map(col): _*), keyCols, "left_anti")
    writeData(retained.unionByName(aligned), table, commitId)
    commitWritten(spark, snap.schemaJson, table, (statsCols ++ keyCols).distinct,
      commitId, keepPrev = false, carryFiles = carried,
      // carried files were not rewritten, so deletes pending against them
      // must survive the commit; deletes with no carried target are dropped
      carryDeletes = snap.deletes.filter(d => carried.exists(_.seq < d.seq)),
      basedOn = Some(snap))
  }

  /**
   * MERGE-ON-READ upsert — the other half of Iceberg's upsert story (v2
   * equality deletes): the write is O(updates) regardless of table size.
   * The commit appends the update rows as ordinary data files AND an
   * equality-delete file of the batch's key tuples; no existing file is
   * touched. The read path ([[readFiles]]) anti-joins each data file group
   * against the delete files committed after it, so superseded rows vanish
   * at scan time. Cost model vs [[merge]] (CoW): MoR writes nothing it
   * doesn't have to but taxes every subsequent read with the anti-merge;
   * CoW pays the rewrite once and reads clean. [[compact]] applies all
   * pending deletes and resets the read path to clean scans. Same
   * duplicate-key refusal and commitId crash-retry idempotence as [[merge]];
   * time travel across delete commits shows each snapshot's own visible
   * row set.
   */
  def mergeOnRead(spark: SparkSession, table: String, updates: DataFrame,
                  keyCols: Seq[String], statsCols: Seq[String], commitId: String): Snapshot = {
    if (alreadyCommitted(table, commitId)) return readSnapshot(table).get
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val aligned = alignToSchema(updates, schema, table, "mergeOnRead")
    val nDup = updates.agg(count(lit(1)).as("__n"),
      countDistinct(struct(keyCols.map(col): _*)).as("__nd")).collect()(0)
    require(nDup.getAs[Long]("__n") == nDup.getAs[Long]("__nd"),
      s"merge updates contain duplicate ${keyCols.mkString(",")} keys")
    // delete file: the batch's key tuples under stable PHYSICAL names —
    // written BEFORE the snapshot swap, so a crash leaves both unreferenced
    val delDir = Paths.get(table, "deletes", commitId)
    toPhysical(updates.select(keyCols.map(col): _*), table)
      .coalesce(1).write.mode("overwrite").parquet(delDir.toString)
    val delFile = {
      val st = Files.list(delDir)
      try st.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted.head
      finally st.close()
    }
    writeData(aligned, table, commitId)
    val physKeys = keyCols.map(snap.physical)
    val nextId = snap.id + 1
    commitWritten(spark, snap.schemaJson, table, (statsCols ++ keyCols).distinct,
      commitId, keepPrev = true,
      carryDeletes = Seq(DeleteEntry(delFile, nextId, physKeys)),
      basedOn = Some(snap))
  }

  /** Row-level DELETE (Iceberg's `DELETE FROM ... WHERE key IN ...`, the
    * equality-delete flavor): an O(keys) commit that writes ONLY a delete
    * file — no data rewritten, no rows replaced. Read-side semantics,
    * maintenance folding ([[compact]]/[[maintain]]), [[rowCount]] refusal,
    * and time travel are exactly [[mergeOnRead]]'s, minus the update rows.
    * `keys` must match the key columns' pinned types (a silently-cast key
    * would delete nothing); crash-retry idempotent by commitId. */
  def deleteKeys(spark: SparkSession, table: String, keys: DataFrame,
                 keyCols: Seq[String], commitId: String): Snapshot = retryOnConflict() {
    if (alreadyCommitted(table, commitId)) readSnapshot(table).get
    else {
      val snap = readSnapshot(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot in $table"))
      val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      require(keyCols.nonEmpty && keyCols.forall(schema.fieldNames.contains),
        s"delete keys ${keyCols.mkString(",")} not all in $table's schema")
      val sel = keys.select(keyCols.map(col): _*)
      val want = keyCols.map(c => c -> schema(c).dataType.catalogString).toMap
      val got = sel.schema.fields.map(f => f.name -> f.dataType.catalogString).toMap
      require(got == want,
        s"deleteKeys type mismatch for $table: table has ${want.toSeq.sorted
          .mkString(", ")} but the batch has ${got.toSeq.sorted.mkString(", ")}")
      val delDir = Paths.get(table, "deletes", commitId)
      toPhysical(sel.distinct(), table)
        .coalesce(1).write.mode("overwrite").parquet(delDir.toString)
      val delFile = {
        val st = Files.list(delDir)
        try st.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".parquet")).toSeq.sorted.head
        finally st.close()
      }
      val physKeys = keyCols.map(snap.physical)
      commitSnapshot(table, snap.copy(id = snap.id + 1, parent = snap.id,
        deletes = snap.deletes :+ DeleteEntry(delFile, snap.id + 1, physKeys),
        commitIds = snap.commitIds + commitId))
    }
  }

  /** Cherry-pick (Iceberg's `cherrypick_snapshot`): apply ONE staged
    * snapshot's append delta onto the CURRENT snapshot — the
    * single-increment publish that still works after main has advanced,
    * where [[fastForward]] (whole-branch publish) refuses. The staged
    * snapshot must be a pure append relative to its parent (the only shape
    * [[appendToBranch]] produces); its delta files are adopted BY REFERENCE
    * (no data copied), restamped into main's lineage, and its commitId
    * joins main's ledger — so a re-pick of the same increment is an
    * idempotent no-op. The pick itself advances main, so the BRANCH can no
    * longer fast-forward; publish its remaining increments by further picks
    * (oldest first) or re-stage. Schema and partition spec must not have
    * diverged (the files' layout is the staged lineage's). */
  def cherryPick(spark: SparkSession, table: String, stagedId: Long): Snapshot =
    retryOnConflict() {
      val s = snapshotAt(table, stagedId).getOrElse(
        throw new IllegalArgumentException(s"no snapshot $stagedId in $table"))
      val p = snapshotAt(table, s.parent).getOrElse(throw new IllegalStateException(
        s"snapshot ${s.parent} of $table is missing (expired?) - cannot verify " +
          "the staged delta"))
      val sPaths = s.files.map(_.path).toSet
      require(p.files.forall(f => sPaths.contains(f.path))
          && s.deletes.map(d => (d.path, d.seq)).toSet
            == p.deletes.map(d => (d.path, d.seq)).toSet,
        s"snapshot $stagedId of $table is not a pure append over its parent - " +
          "only append increments can be cherry-picked")
      val cids = s.commitIds -- p.commitIds
      require(cids.size == 1,
        s"snapshot $stagedId of $table added ${cids.size} commitIds (expected 1)")
      val cid = cids.head
      val cur = readSnapshot(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot in $table"))
      if (cur.commitIds.contains(cid)) cur // already picked (or fast-forwarded)
      else {
        require(cur.schemaJson == s.schemaJson && cur.spec == s.spec
            && cur.renames == s.renames,
          s"$table's schema/spec/renames diverged from the staged lineage; " +
            "re-stage against the current snapshot instead")
        val delta = s.files.filter(_.seq == s.id)
        commitSnapshot(table, Snapshot(cur.id + 1, cur.id, cur.schemaJson,
          cur.files ++ delta.map(_.copy(seq = cur.id + 1)), cur.renames,
          cur.deletes, cur.commitIds + cid, cur.spec, cur.order))
      }
    }

  /** When to fold pending merge-on-read state back into clean data files.
    * Every stacked equality-delete commit taxes subsequent reads with one
    * more broadcast anti-join per older file group ([[readFiles]]); the
    * MorScale probe measures the degradation curve. Thresholds are in
    * pending delete FILES and BYTES — the two quantities that grow with
    * unmaintained upsert streams. */
  case class MaintenancePolicy(maxPendingDeleteFiles: Int = 8,
                               maxPendingDeleteBytes: Long = 64L << 20,
                               sortBy: Seq[String] = Nil,
                               keepSnapshots: Option[Int] = None,
                               orphansOlderThanMillis: Option[Long] = None)

  /** What one [[maintain]] tick did (None/0 where a leg didn't trigger). */
  case class MaintenanceReport(compacted: Option[Snapshot],
                               expiredSnapshots: Seq[Long], expiredFiles: Int,
                               orphansDeleted: Int, orphanBytes: Long)

  /** (count, total bytes) of the current snapshot's pending equality-delete
    * files — the read-path debt [[maintain]] bounds. */
  def pendingDeletes(table: String): (Int, Long) =
    readSnapshot(table).map { s =>
      val bytes = s.deletes.map { d =>
        val p = Paths.get(d.path.stripPrefix("file:"))
        if (Files.exists(p)) Files.size(p) else 0L
      }.sum
      (s.deletes.size, bytes)
    }.getOrElse((0, 0L))

  /**
   * Auto-maintenance (the scheduled-job form of Iceberg's maintenance
   * actions, all behind one policy): (1) if the table's pending
   * merge-on-read deletes exceed the policy, [[compact]] — applying every
   * pending delete and resetting reads to clean scans; (2) if
   * `keepSnapshots` is set, [[expireSnapshots]] down to that window
   * (consumer retention floor still applies); (3) if
   * `orphansOlderThanMillis` is set, [[removeOrphanFiles]] older than it.
   * Called after each upsert batch (or on a schedule), this bounds read
   * degradation at the policy knee AND storage at the retention window,
   * regardless of how many commits a stream stacks. Each leg is idempotent,
   * so a crash mid-tick re-runs safely.
   */
  def maintain(spark: SparkSession, table: String, statsCols: Seq[String],
               commitId: String,
               policy: MaintenancePolicy = MaintenancePolicy()): MaintenanceReport = {
    val (nDel, bytes) = pendingDeletes(table)
    val compacted =
      if (nDel > policy.maxPendingDeleteFiles || bytes > policy.maxPendingDeleteBytes)
        Some(compact(spark, table, statsCols, commitId, sortBy = policy.sortBy))
      else None
    val (expIds, expFiles) = policy.keepSnapshots
      .map(expireSnapshots(table, _)).getOrElse((Nil, 0))
    val (orphN, orphB) = policy.orphansOlderThanMillis
      .map(removeOrphanFiles(table, _)).getOrElse((0, 0L))
    MaintenanceReport(compacted, expIds, expFiles, orphN, orphB)
  }

  /** INSERT OVERWRITE: replace the table's entire content with `df` as one
    * replacing commit (history still time-travels until expired). The
    * re-baseline landing step for a follower whose incremental range was
    * expired ([[graft.streaming.Streams.drainTableIncrement]]). */
  def overwrite(spark: SparkSession, df: DataFrame, table: String,
                statsCols: Seq[String], commitId: String): Snapshot = {
    writeData(df, table, commitId)
    commitWritten(spark, df.schema.json, table, statsCols, commitId, keepPrev = false)
  }

  // --- registered consumers (retention floor) ----------------------------

  private def consumersDir(table: String): Path = metaDir(table).resolve("consumers")

  /** Register (or advance) a named follower's consumed position. A consumer
    * at position `snapshotId` needs snapshots ≥ that id to stay readable for
    * its next incremental tick — [[expireSnapshots]] refuses to expire past
    * the minimum registered position, so a slow follower can never be
    * stranded by retention (Iceberg's own expire/streaming-read hazard,
    * closed here by making the consumer set part of table metadata). */
  def registerConsumer(table: String, name: String, snapshotId: Long): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"bad consumer name $name")
    val d = consumersDir(table)
    Files.createDirectories(d)
    val tmp = d.resolve(s".$name.tmp")
    Files.writeString(tmp, snapshotId.toString)
    Files.move(tmp, d.resolve(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Registered followers and their consumed positions. */
  def consumers(table: String): Map[String, Long] = {
    val d = consumersDir(table)
    if (!Files.exists(d)) Map.empty
    else {
      val st = Files.list(d)
      try st.iterator().asScala
        .filterNot(_.getFileName.toString.startsWith("."))
        .map(p => p.getFileName.toString -> Files.readString(p).trim.toLong)
        .toMap
      finally st.close()
    }
  }

  /** Drop a follower from the retention floor (it no longer pins history). */
  def deregisterConsumer(table: String, name: String): Unit =
    Files.deleteIfExists(consumersDir(table).resolve(name))

  // --- named tags (pinned time travel) ------------------------------------

  private def tagsDir(table: String): Path = metaDir(table).resolve("tags")

  /** Name a snapshot (Iceberg's tag refs): `readTag` resolves the name and
    * [[expireSnapshots]] pins the tagged snapshot exactly — unlike a
    * consumer's FLOOR, a tag protects only its own snapshot, so tagging a
    * monthly release never blocks the history between releases from
    * expiring. Re-tagging an existing name moves it (atomic replace). */
  def setTag(table: String, name: String, snapshotId: Long): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"bad tag name $name")
    require(snapshotAt(table, snapshotId).isDefined,
      s"no snapshot $snapshotId in $table to tag")
    val d = tagsDir(table)
    Files.createDirectories(d)
    val tmp = d.resolve(s".$name.tmp")
    Files.writeString(tmp, snapshotId.toString)
    Files.move(tmp, d.resolve(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** All tags and the snapshot ids they pin. */
  def tags(table: String): Map[String, Long] = {
    val d = tagsDir(table)
    if (!Files.exists(d)) Map.empty
    else {
      val st = Files.list(d)
      try st.iterator().asScala
        .filterNot(_.getFileName.toString.startsWith("."))
        .map(p => p.getFileName.toString -> Files.readString(p).trim.toLong)
        .toMap
      finally st.close()
    }
  }

  /** Drop a tag; its snapshot becomes expirable again. */
  def dropTag(table: String, name: String): Unit =
    Files.deleteIfExists(tagsDir(table).resolve(name))

  /** Time travel by name: [[readAt]] of the tagged snapshot. */
  def readTag(spark: SparkSession, table: String, name: String): DataFrame =
    readAt(spark, table, tags(table).getOrElse(name,
      throw new IllegalArgumentException(s"no tag $name in $table")))

  // --- branches (write-audit-publish) -------------------------------------

  private def branchesDir(table: String): Path = metaDir(table).resolve("branches")

  /** Fork a writable branch at `fromId` (default: the current snapshot) —
    * Iceberg branch refs, here as the write-audit-publish primitive: stage
    * commits on the branch with [[appendToBranch]], audit them with
    * [[readBranch]] (or any validation over it), then publish atomically
    * with [[fastForward]]. Main readers never see staged data; an abandoned
    * branch is just [[dropBranch]] + the orphan sweep. Branch heads pin
    * their snapshot against [[expireSnapshots]] like tags do. */
  def createBranch(table: String, name: String, fromId: Long = -1L): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"bad branch name $name")
    val id = if (fromId >= 0L) fromId else currentSnapshotId(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(snapshotAt(table, id).isDefined, s"no snapshot $id in $table to branch from")
    require(!branches(table).contains(name), s"branch $name already exists in $table")
    val d = branchesDir(table)
    Files.createDirectories(d)
    val tmp = d.resolve(s".$name.tmp")
    Files.writeString(tmp, id.toString)
    Files.move(tmp, d.resolve(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** All branches and their head snapshot ids. */
  def branches(table: String): Map[String, Long] = {
    val d = branchesDir(table)
    if (!Files.exists(d)) Map.empty
    else {
      val st = Files.list(d)
      try st.iterator().asScala
        .filterNot(_.getFileName.toString.startsWith("."))
        .map(p => p.getFileName.toString -> Files.readString(p).trim.toLong)
        .toMap
      finally st.close()
    }
  }

  /** Abandon a branch; its staged snapshots stop being pinned (retention
    * and the orphan sweep reclaim them on their own schedules). */
  def dropBranch(table: String, name: String): Unit =
    Files.deleteIfExists(branchesDir(table).resolve(name))

  /** The audit read: the branch head's full state (fork-point data plus
    * everything staged since). */
  def readBranch(spark: SparkSession, table: String, name: String): DataFrame =
    readAt(spark, table, branches(table).getOrElse(name,
      throw new IllegalArgumentException(s"no branch $name in $table")))

  /** [[append]] onto a branch: same schema check, layout (the branch
    * lineage's spec + declared SortOrder), stats, and commit protocol, but
    * the snapshot's parent is the BRANCH head and the commit CASes the
    * branch pointer — CURRENT (what main readers see) never moves. Staged
    * snapshot ids are allocated table-globally under the commit lock, so
    * concurrent main commits can never collide with staged ones. Branches
    * are single-writer staging areas: a concurrent branch advance conflicts
    * loudly (no mechanical rebase), and a reused commitId is refused
    * against the branch lineage's ledger. */
  def appendToBranch(spark: SparkSession, df: DataFrame, table: String,
                     branch: String, statsCols: Seq[String],
                     commitId: String): Snapshot = {
    val headId = branches(table).getOrElse(branch,
      throw new IllegalArgumentException(s"no branch $branch in $table"))
    val head = snapshotAt(table, headId).getOrElse(throw new IllegalStateException(
      s"branch $branch head $headId of $table is missing (expired?)"))
    val ledger =
      if (head.commitIds.nonEmpty) head.commitIds else historicalCommitIds(table)
    require(!ledger.contains(commitId),
      s"commitId $commitId already committed on $table's $branch lineage")
    val pinned = org.apache.spark.sql.types.DataType.fromJson(head.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val aligned = alignToSchema(df, pinned, table, s"appendToBranch($branch)")
    writeDataSpec(aligned, table, commitId, head.spec, snapOverride = Some(head))
    commitWritten(spark, head.schemaJson, table, statsCols, commitId,
      basedOn = Some(head), toBranch = Some(branch))
  }

  /** Publish: atomically move CURRENT to the branch head. Legal only while
    * the current snapshot is still an ancestor of the head (nothing
    * published since the fork) — otherwise the swap would silently drop
    * main's newer commits, so it conflicts loudly and the caller re-stages.
    * The branch pointer survives (drop it when done); re-running after
    * success is a no-op swap to the same id. */
  def fastForward(table: String, branch: String): Snapshot = withCommitLock(table) {
    val headId = branches(table).getOrElse(branch,
      throw new IllegalArgumentException(s"no branch $branch in $table"))
    val head = snapshotAt(table, headId).getOrElse(throw new IllegalStateException(
      s"branch $branch head $headId of $table is missing (expired?)"))
    val cur = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    var p = head
    while (p.id != cur.id && p.parent >= 0L)
      p = snapshotAt(table, p.parent).getOrElse(throw new IllegalStateException(
        s"snapshot ${p.parent} of $table is missing (expired?) - " +
          s"branch $branch lineage unverifiable"))
    if (p.id != cur.id) throw new CommitConflictException(
      s"$table advanced past branch $branch's fork point (current ${cur.id} " +
        s"not on the branch lineage); re-stage against the new current and re-run")
    val cf = metaDir(table).resolve("CURRENT")
    val tmp = cf.resolveSibling(".CURRENT.tmp")
    Files.writeString(tmp, headId.toString)
    Files.move(tmp, cf,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    head
  }

  /** Exact row count from manifest metadata alone — zero files opened, the
    * `SELECT count(*)` short-circuit every table format's snapshot summary
    * exists for. `None` when pending equality deletes ([[mergeOnRead]])
    * make the per-file counts an overcount; [[compact]] (or any
    * [[maintain]] tick that triggers it) restores the fast path. */
  def rowCount(table: String): Option[Long] = {
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    if (snap.deletes.nonEmpty) None else Some(snap.files.map(_.rows).sum)
  }

  /**
   * Snapshot retention (Iceberg's `expire_snapshots`): drop all but the
   * newest `keepLast` snapshots of the CURRENT lineage and DELETE every
   * data/delete file referenced only by the expired ones. This is the
   * bound on the time-travel window —
   * without it a 100 TB table's storage grows with every replacing commit
   * forever (compaction/merge keep old files alive purely for history).
   * Expired snapshot ids stop time-traveling; kept ones are untouched.
   * Registered consumers ([[registerConsumer]]) raise a retention floor:
   * snapshots at or above the minimum registered position are NEVER
   * expired, so a follower's next [[readIncremental]] stays readable.
   * Tagged snapshots ([[setTag]]) are pinned individually — a tag keeps
   * exactly its snapshot (and, through the reference set, its files) while
   * untagged history around it still expires. Live branches pin their FULL
   * lineage (staged snapshots plus the history [[fastForward]]'s ancestor
   * walk crosses); a dropped branch's snapshots become unreachable and
   * expire on the next pass whatever their ids.
   * Idempotent and crash-safe: a crash mid-delete leaves orphaned files
   * that nothing references, and a re-run re-reaps them. Returns
   * (expired snapshot ids, deleted file count).
   */
  def expireSnapshots(table: String, keepLast: Int): (Seq[Long], Int) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val all = snapshots(table)
    val floor = consumers(table).values.minOption
    def lineage(from: Long): Set[Long] = {
      var out = Set.empty[Long]
      var id = from
      while (id >= 0 && !out.contains(id)) {
        out += id
        id = snapshotAt(table, id).map(_.parent).getOrElse(-1L)
      }
      out
    }
    // Retention is REACHABILITY-based, not id-window-based: keep the newest
    // keepLast snapshots OF THE CURRENT LINEAGE, every tagged snapshot, and
    // every live branch's full lineage (fastForward's ancestor walk needs
    // it). An ABANDONED branch's snapshots are expirable whatever their
    // ids — a plain "keep the newest N ids" would let a dropped branch's
    // high ids occupy the keep window forever and could even expire the
    // CURRENT snapshot itself (dangling pointer). On linear histories this
    // is exactly the old keep-last-N behavior.
    val curKeep = currentSnapshotId(table)
      .map(c => lineage(c).toSeq.sorted.takeRight(keepLast).toSet)
      .getOrElse(Set.empty[Long])
    val keepSet = curKeep ++ tags(table).values ++
      branches(table).values.flatMap(lineage)
    val expired = all.filterNot(keepSet.contains).filter(id => floor.forall(id < _))
    val kept = all.filterNot(expired.contains)
    if (expired.isEmpty) return (Nil, 0)
    val keptSnaps = kept.flatMap(snapshotAt(table, _))
    def paths(s: Snapshot): Seq[String] =
      s.files.map(_.path) ++ s.deletes.map(_.path) ++ s.files.flatMap(_.bloom.values)
    val referenced = keptSnaps.flatMap(paths).toSet
    // normalize: manifest paths may carry a file: scheme prefix
    def toFsPath(p: String) = Paths.get(p.stripPrefix("file:"))
    val candidates = expired.flatMap(snapshotAt(table, _)).flatMap(paths).distinct
      .filterNot(referenced.contains)
    var deleted = 0
    candidates.foreach { p =>
      if (Files.deleteIfExists(toFsPath(p))) deleted += 1
    }
    // prune commit dirs left with only write residue (_SUCCESS, .crc):
    // once no .parquet remains, nothing kept can reference the dir
    candidates.map(p => toFsPath(p).getParent).distinct.foreach { d =>
      try if (d != null && Files.exists(d)) {
        val st = Files.list(d)
        val hasData = try st.iterator().asScala.exists(_.toString.endsWith(".parquet"))
                      finally st.close()
        if (!hasData) graft.Fs.deleteRecursively(d)
      } catch { case _: java.io.IOException => () }
    }
    // manifests referenced only by expired snapshots go with them
    val keptManifests = keptSnaps.flatMap(_.manifests).toSet
    expired.flatMap(snapshotAt(table, _)).flatMap(_.manifests).distinct
      .filterNot(keptManifests.contains)
      .foreach(p => Files.deleteIfExists(Paths.get(p)))
    expired.foreach(id => Files.deleteIfExists(metaDir(table).resolve(s"snapshot-$id.json")))
    (expired, deleted)
  }

  /**
   * Orphan-file cleanup (Iceberg's `remove_orphan_files`) — the third leg
   * of the maintenance triad next to [[compact]] and [[expireSnapshots]].
   * The commit protocol writes data/delete files FIRST and swaps the
   * snapshot pointer LAST, so a crash between the two (or an optimistic-
   * concurrency retry that re-wrote under a new layout) strands files no
   * snapshot references — invisible to [[expireSnapshots]], which only
   * reaps files the EXPIRED snapshots referenced. This walks `data/`,
   * `deletes/`, and `blooms/`, deletes every file absent from ALL retained
   * snapshots' manifests, and prunes directories left empty.
   *
   * `olderThanMillis` is the concurrent-writer guard (Iceberg defaults to
   * 3 days): a writer that has written its files but not yet committed its
   * snapshot looks exactly like crash residue, so only files whose mtime is
   * older than `now - olderThanMillis` are eligible. Pass 0 only when no
   * other writer can be in flight (tests, single-writer maintenance
   * windows). Write residue (`_SUCCESS`, `.crc`) is kept wherever the
   * directory still holds referenced parquet and reaped with the directory
   * otherwise. Idempotent: a re-run finds nothing. Returns
   * (files deleted, bytes reclaimed).
   */
  def removeOrphanFiles(table: String,
                        olderThanMillis: Long = 3L * 24 * 3600 * 1000,
                        nowMillis: Long = System.currentTimeMillis): (Int, Long) = {
    val referenced = snapshots(table).flatMap(snapshotAt(table, _)).flatMap(s =>
      s.files.map(_.path) ++ s.deletes.map(_.path) ++ s.files.flatMap(_.bloom.values))
      .map(p => Paths.get(p.stripPrefix("file:")).toAbsolutePath.normalize).toSet
    val cutoff = nowMillis - olderThanMillis
    var deleted = 0
    var bytes = 0L
    Seq("data", "deletes", "blooms").map(Paths.get(table, _)).filter(Files.exists(_)).foreach { root =>
      val st = Files.walk(root)
      val all = try st.iterator().asScala.toVector finally st.close()
      val (dirs, files) = all.partition(Files.isDirectory(_))
      val survivors = scala.collection.mutable.Set.empty[Path] // dirs still holding data
      files.foreach { f =>
        val abs = f.toAbsolutePath.normalize
        val isData = abs.toString.endsWith(".parquet") || abs.toString.endsWith(".bloom")
        val orphan = isData && !referenced.contains(abs) &&
          Files.getLastModifiedTime(f).toMillis < cutoff
        if (orphan) {
          bytes += Files.size(f); Files.delete(f); deleted += 1
        } else if (isData) survivors += abs.getParent
      }
      // residue and empty dirs: deepest-first, keep any dir (or ancestor of
      // one) that still holds referenced data
      def keeps(d: Path): Boolean = survivors.exists(_.startsWith(d.toAbsolutePath.normalize))
      dirs.sortBy(-_.getNameCount).filterNot(_ == root).foreach { d =>
        if (Files.exists(d) && !keeps(d)) {
          val ls = Files.list(d)
          val residueOnly = try ls.iterator().asScala.forall { c =>
            val n = c.getFileName.toString
            !Files.isDirectory(c) && (n == "_SUCCESS" || n.endsWith(".crc")) &&
              Files.getLastModifiedTime(c).toMillis < cutoff
          } finally ls.close()
          if (residueOnly) graft.Fs.deleteRecursively(d)
        }
      }
    }
    // stranded manifests: written before a CURRENT swap that never happened
    // (crash, lost commit race) — referenced by no snapshot, same age guard
    val keptManifests = snapshots(table).flatMap(snapshotAt(table, _))
      .flatMap(_.manifests).map(p => Paths.get(p).toAbsolutePath.normalize).toSet
    val md = metaDir(table)
    if (Files.exists(md)) {
      val st = Files.list(md)
      val manifests = try st.iterator().asScala
        .filter(_.getFileName.toString.startsWith("manifest-")).toVector
      finally st.close()
      manifests.foreach { m =>
        if (!keptManifests.contains(m.toAbsolutePath.normalize) &&
            Files.getLastModifiedTime(m).toMillis < cutoff) {
          bytes += Files.size(m); Files.delete(m); deleted += 1
        }
      }
    }
    (deleted, bytes)
  }

  /** Rollback (Iceberg's `rollback_to_snapshot`): a METADATA-ONLY commit
    * that restores the table to snapshot `id`'s exact state (files, schema,
    * renames, pending deletes) under a NEW snapshot id — history is never
    * rewritten, so the rolled-back-over snapshots still time-travel and a
    * second rollback can restore them. O(1) at any table size. `id` may be
    * ANY retained snapshot — Iceberg's `set_current_snapshot` semantics —
    * including a tagged restore point whose intermediate lineage has
    * expired, or (explicitly, as an admin override) a staged branch
    * snapshot; the guarded publish path for branches is [[fastForward]]. */
  def rollbackTo(table: String, id: Long): Snapshot = retryOnConflict() {
    val target = snapshotAt(table, id).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $id in $table"))
    val curSnap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    // ledger is the union: the rolled-back-over commits WERE committed, and
    // a crash-retry of one of them after the rollback must stay a no-op
    commitSnapshot(table, target.copy(id = curSnap.id + 1, parent = curSnap.id,
      commitIds = curSnap.commitIds ++ target.commitIds))
  }

  /** Per-file PARTITION-VALUE constraints — evaluated BEFORE column
    * min/max stats ([[surviving]]); a partition value is a single exact
    * value per file, so membership/range checks are exact, not ranges of
    * ranges. Files without a value for a constrained field (pre-spec
    * commits, null partitions) are conservatively kept. */
  private[table] case class PartPrune(in: Map[String, Set[String]] = Map.empty,
                                      rangeNum: Map[String, (Double, Double)] = Map.empty,
                                      rangeStr: Map[String, (Option[String], Option[String])] = Map.empty) {
    def isEmpty: Boolean = in.isEmpty && rangeNum.isEmpty && rangeStr.isEmpty
    def keeps(f: FileEntry): Boolean =
      in.forall { case (n, vs) => f.partition.get(n).forall(vs.contains) } &&
        rangeNum.forall { case (n, (lo, hi)) =>
          f.partition.get(n).forall { v => val d = v.toDouble; d >= lo && d <= hi } } &&
        rangeStr.forall { case (n, (lo, hi)) =>
          f.partition.get(n).forall(v => !(lo.exists(v < _) || hi.exists(v > _))) }
  }

  private def surviving(snap: Snapshot, prune: Map[String, (Double, Double)],
                        pruneStr: Map[String, (String, String)],
                        pruneInNum: Map[String, Seq[Double]] = Map.empty,
                        pruneInStr: Map[String, Seq[String]] = Map.empty,
                        pruneStrOpt: Map[String, (Option[String], Option[String])] = Map.empty,
                        partPrune: PartPrune = PartPrune())
      : Seq[FileEntry] =
    snap.files.filter(partPrune.keeps).filter { f =>
      def stats(c: String): Option[(String, String)] =
        (f.min.get(c), f.max.get(c)) match {
          case (Some(mn), Some(mx)) if mn != "null" && mx != "null" => Some((mn, mx))
          case _ => None // stat missing or all-null file: conservatively kept
        }
      prune.forall { case (c, (lo, hi)) =>
        stats(c).forall { case (mn, mx) => !(mx.toDouble < lo || mn.toDouble > hi) }
      } && pruneStr.forall { case (c, (lo, hi)) =>
        stats(c).forall { case (mn, mx) => !(mx < lo || mn > hi) } // lexicographic
      } && pruneInNum.forall { case (c, vs) =>
        // IN-list: kept iff ANY candidate value can be in the file's range —
        // tighter than collapsing the set to its [min,max] envelope when the
        // set has gaps spanning whole files
        stats(c).forall { case (mn, mx) =>
          val (lo, hi) = (mn.toDouble, mx.toDouble); vs.exists(v => v >= lo && v <= hi)
        }
      } && pruneInStr.forall { case (c, vs) =>
        stats(c).forall { case (mn, mx) => vs.exists(v => v >= mn && v <= mx) }
      } && pruneStrOpt.forall { case (c, (lo, hi)) =>
        // one-sided lexicographic bounds are sound on their own: max < lo
        // (or min > hi) proves every row misses, whatever the other side
        stats(c).forall { case (mn, mx) =>
          !(lo.exists(mx < _) || hi.exists(mn > _)) }
      }
    }

  /** Read the current snapshot, pruning files against manifest min/max:
    * `prune` takes numeric ranges, `pruneStr` lexicographic string ranges
    * (a point lookup is `(v, v)` — e.g. a band-name filter against a
    * nested-span stats entry). A file is skipped iff its recorded range
    * PROVABLY misses; files without the stat are conservatively kept. */
  def read(spark: SparkSession, table: String,
           prune: Map[String, (Double, Double)] = Map.empty,
           pruneStr: Map[String, (String, String)] = Map.empty): DataFrame = {
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    readFiles(spark, snap, surviving(snap, prune, pruneStr))
  }

  /**
   * Filter-pushdown read (what a DataSourceV2 `SupportsPushDownFilters`
   * would hand the scan): extract conjunctive range constraints on
   * top-level columns from `predicate`, prune the snapshot's files against
   * the manifest min/max BEFORE the scan, then apply the full predicate to
   * the surviving rows. The manifest is the coarse layer ABOVE parquet's
   * own row-group skipping — at 100 TB it is the difference between
   * opening every file and opening only candidates. Anything not
   * expressible as a per-column bound (OR trees, UDFs, multi-column
   * expressions) simply contributes no pruning — results are always the
   * plain `read(...).where(predicate)`.
   */
  def readWhere(spark: SparkSession, table: String, predicate: Column): DataFrame =
    readWhereSnap(spark, table, readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table")), predicate)

  /** [[readWhere]] at a retained historical snapshot — pruned time travel
    * (a tagged release + an AOI/key predicate opens only that release's
    * matching files). The snapshot's own manifest stats, partition values,
    * and Bloom sidecars drive the pruning, so a historical read scales the
    * same way a current one does. */
  def readWhereAt(spark: SparkSession, table: String, id: Long,
                  predicate: Column): DataFrame =
    readWhereSnap(spark, table, snapshotAt(table, id).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $id in $table")), predicate)

  private def readWhereSnap(spark: SparkSession, table: String, snap: Snapshot,
                            predicate: Column): DataFrame = {
    val b = extractBounds(spark, snap, predicate)
    val files = surviving(snap, b.num, Map.empty, b.inNum, b.inStr, b.str,
      partitionPrune(snap, b)).filter(bloomKeeps(snap, _, b))
    readFiles(spark, snap, files).where(predicate)
  }

  /** Sidecar byte cache for [[bloomKeeps]] — filters are immutable once
    * written, so staleness is impossible; crude size bound only. */
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  /** Bloom probe for one file against the predicate's equality points: the
    * file survives unless SOME conjunct's whole value set provably misses
    * its filter. Missing sidecars, unprobeable types, and lossy literal
    * casts all conservatively keep the file — the residual predicate runs
    * regardless, so this can only skip work, never rows. */
  private def bloomKeeps(snap: Snapshot, f: FileEntry, b: Bounds): Boolean = {
    if (f.bloom.isEmpty || b.points.isEmpty) return true
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    def filterBytes(path: String): Option[Array[Byte]] =
      Option(bloomCache.computeIfAbsent(path, { p =>
        try {
          if (bloomCache.size > 512) bloomCache.clear()
          Files.readAllBytes(Paths.get(p.stripPrefix("file:")))
        } catch { case _: java.io.IOException => null } // keep conservatively
      }))
    // a point contributes a definite hash only if the literal converts to
    // the column's stored type LOSSLESSLY (the analyzer may have widened the
    // column side: intCol = 5L arrives as a LongType literal)
    def hashOf(v: Any, vt: DataType, ct: DataType): Option[Long] =
      if (vt == ct) Some(Bloom.hashLiteral(v, ct))
      else if (Cast.canCast(vt, ct) && Cast.canCast(ct, vt)) {
        val down = Cast(Literal.create(v, vt), ct).eval(null)
        val back = if (down == null) null else Cast(Literal.create(down, ct), vt).eval(null)
        if (down != null && back == v) Some(Bloom.hashLiteral(down, ct)) else None
      } else None
    b.points.forall { case (c, conjuncts) =>
      (f.bloom.get(c), schema.fields.find(_.name == c).map(_.dataType)) match {
        case (Some(path), Some(ct)) => filterBytes(path).forall { bytes =>
          conjuncts.forall(set => set.exists {
            case (v, vt) => hashOf(v, vt, ct).forall(Bloom.mightContain(bytes, _))
          })
        }
        case _ => true // no filter for this column (or unknown type): keep
      }
    }
  }

  /**
   * Map the predicate's per-SOURCE-column bounds ([[extractBounds]]) through
   * the table's partition spec into per-FILE partition-value constraints —
   * the layer Iceberg evaluates before any column stats. Each transform maps
   * bounds conservatively: identity passes them through, `bucket[N]` maps
   * equality points/IN-lists to their murmur3 bucket, `truncate[W]` floors
   * numeric bounds (truncation is monotone), and `year`/`month`/`day` take
   * the ISO-string prefix (also monotone). Value sets on numeric identity
   * fields collapse to their envelope here — the stats layer still exploits
   * the gaps per file. `cell[]` fields contribute nothing (spatial pruning
   * is [[readAoi]]'s cover-range check).
   */
  private[table] def partitionPrune(snap: Snapshot, b: Bounds): PartPrune = {
    import org.apache.spark.sql.types._
    if (snap.spec.isEmpty) return PartPrune()
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    var in = Map.empty[String, Set[String]]
    var rn = Map.empty[String, (Double, Double)]
    var rs = Map.empty[String, (Option[String], Option[String])]
    snap.spec.foreach { f =>
      val srcT = schema.fields.find(_.name == f.source).map(_.dataType)
      f.transform match {
        case "identity" =>
          b.num.get(f.source).foreach(r => rn += f.name -> r)
          b.inNum.get(f.source).filter(_.nonEmpty)
            .foreach(vs => rn += f.name -> (vs.min, vs.max))
          if (srcT.contains(StringType) || srcT.contains(DateType)) {
            // timestamp partition values are URL-escaped in paths (colons)
            // — no lexicographic guarantee, so only strings/dates prune here
            b.str.get(f.source).foreach(r => rs += f.name -> r)
            b.inStr.get(f.source).foreach(vs => in += f.name -> vs.toSet)
          }
        case BucketT(n) =>
          val pts: Seq[Any] = srcT match {
            case Some(LongType) =>
              b.num.get(f.source).collect { case (lo, hi) if lo == hi && lo.isWhole => Seq(lo.toLong) }
                .getOrElse(b.inNum.getOrElse(f.source, Nil).filter(_.isWhole).map(_.toLong))
            case Some(IntegerType) =>
              b.num.get(f.source).collect { case (lo, hi) if lo == hi && lo.isWhole => Seq(lo.toInt) }
                .getOrElse(b.inNum.getOrElse(f.source, Nil).filter(_.isWhole).map(_.toInt))
            case Some(StringType) =>
              b.str.get(f.source).collect { case (Some(lo), Some(hi)) if lo == hi => Seq(lo) }
                .getOrElse(b.inStr.getOrElse(f.source, Nil))
            case _ => Nil
          }
          if (pts.nonEmpty)
            in += f.name -> pts.map(v => bucketOf(v, srcT.get, n.toInt).toString).toSet
        case TruncateT(w) => srcT match {
          case Some(_: NumericType) => b.num.get(f.source).foreach { case (lo, hi) =>
            def tr(x: Double) =
              if (x.isInfinite) x else math.floor(x / w.toInt) * w.toInt
            rn += f.name -> (tr(lo), tr(hi))
          }
          case Some(StringType) => b.str.get(f.source).foreach { case (lo, hi) =>
            rs += f.name -> (lo.map(_.take(w.toInt)), hi.map(_.take(w.toInt)))
          }
          case _ => ()
        }
        case "year" => b.str.get(f.source).foreach { case (lo, hi) =>
          rs += f.name -> (lo.map(_.take(4)), hi.map(_.take(4))) }
        case "month" => b.str.get(f.source).foreach { case (lo, hi) =>
          rs += f.name -> (lo.map(_.take(7)), hi.map(_.take(7))) }
        case "day" => b.str.get(f.source).foreach { case (lo, hi) =>
          rs += f.name -> (lo.map(_.take(10)), hi.map(_.take(10))) }
        case _ => ()
      }
    }
    PartPrune(in, rn, rs)
  }

  /** The bucket a literal lands in — the same murmur3 (seed 42) + pmod the
    * spec-aware write's `pmod(hash(col), N)` computes, evaluated on the
    * driver via the identical Catalyst expressions. */
  private def bucketOf(v: Any, dt: org.apache.spark.sql.types.DataType, n: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
    Pmod(new Murmur3Hash(Seq(Literal.create(v, dt))), Literal(n))
      .eval(null).asInstanceOf[Int]
  }

  /**
   * AOI-scoped read of a `cell[R]`-partitioned table: candidate cells =
   * the AOI's cover at R; a file survives iff its auto-collected
   * `cover_<field>` range ([[commitWritten]]) can contain a candidate —
   * partition-grouped files carry tight cover ranges, so an AOI read opens
   * only the partitions the AOI touches, under full snapshot isolation.
   * Exactness does not depend on the pruning: footprints spanning several
   * cells are stored once (min cell) but their file's cover range includes
   * every spanned cell, and the residual `st_intersects` filter runs on all
   * surviving rows. Files without cover stats are conservatively kept.
   */
  def readAoi(spark: SparkSession, table: String, aoiWkt: String): DataFrame = {
    val snap = readSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val (f, res) = snap.spec.collectFirst {
      case pf @ PartitionField(_, _, CellT(r)) => (pf, r.toInt)
    }.getOrElse(throw new IllegalArgumentException(
      s"$table has no cell[] partition field"))
    val cells = graft.geom.Geo.cellCoverWkt(aoiWkt, res).sorted
    val statName = s"cover_${f.name}"
    val files = snap.files.filter { fe =>
      (fe.min.get(statName), fe.max.get(statName)) match {
        case (Some(mn), Some(mx)) if mn != "null" && mx != "null" =>
          val lo = mn.toLong; val hi = mx.toLong
          var i = java.util.Arrays.binarySearch(cells, lo)
          if (i < 0) i = -i - 1
          i < cells.length && cells(i) <= hi
        case _ => true
      }
    }
    readFiles(spark, snap, files)
      .where(graft.functions.GeoFunctions.stIntersectsUdf(lit(aoiWkt), col(f.source)))
  }

  /** `points` carries the RAW typed equality constraints (each inner Seq is
    * one `= v` / `IN (…)` conjunct's value set, kept exact for [[Bloom]]
    * membership probes — the num/str views above collapse types to the
    * stats domain, which is fine for ranges but loses the bits hashing
    * needs). */
  private[table] case class Bounds(num: Map[String, (Double, Double)],
                                   str: Map[String, (Option[String], Option[String])],
                                   inNum: Map[String, Seq[Double]],
                                   inStr: Map[String, Seq[String]],
                                   points: Map[String, Seq[Seq[(Any, org.apache.spark.sql.types.DataType)]]] = Map.empty)

  /** Conjunctive per-column bound extraction from an arbitrary predicate.
    * Handles literal-vs-attribute comparisons (either side), IN lists,
    * StartsWith (prefix → lexicographic range), monotone up-CASTs wrapping
    * the attribute (the shape type coercion produces for `intCol > 5L`),
    * foldable expressions on the literal side (Cast of a literal), and
    * DATE/TIMESTAMP columns — whose manifest stats are `cast(c AS string)`
    * ISO forms, lexicographically order-consistent, so bounds convert to
    * conservative ISO strings (timestamps to whole-second precision).
    * Anything else contributes no bound; the full predicate is always
    * re-applied to surviving rows, so bounds only ever need to be
    * conservative, never exact. */
  private[table] def extractBounds(spark: SparkSession, snap: Snapshot,
                                   predicate: Column): Bounds = {
    import org.apache.spark.sql.catalyst.expressions.{And, Cast, EqualNullSafe, EqualTo,
      Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual,
      AttributeReference, StartsWith}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.types._
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    def fieldType(c: String) = schema.fields.find(_.name == c).map(_.dataType)
    val num = scala.collection.mutable.Map.empty[String, (Double, Double)]
    val str = scala.collection.mutable.Map.empty[String, (Option[String], Option[String])]
    val inNum = scala.collection.mutable.Map.empty[String, Seq[Double]]
    val inStr = scala.collection.mutable.Map.empty[String, Seq[String]]
    val points = scala.collection.mutable.Map.empty[String, Seq[Seq[(Any, DataType)]]]
    def addPoints(c: String, vs: Seq[(Any, DataType)]): Unit =
      points(c) = points.getOrElse(c, Nil) :+ vs
    // attribute possibly wrapped in a monotone widening cast (what type
    // coercion inserts): the bound transfers to the underlying column
    def name(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case c: Cast => name(c.child).filter(n =>
        fieldType(n).exists(ft => Cast.canUpCast(ft, c.dataType)))
      case _ => None
    }
    def litVal(e: Expression): Option[(Any, DataType)] =
      if (e.foldable) Option(e.eval(null)).map(v => (v, e.dataType)) else None
    // convert an evaluated literal to this column's STAT domain: numeric
    // columns compare as doubles; string columns lexicographically; date /
    // timestamp columns through their `cast AS string` ISO forms (floor'd
    // to days / whole seconds — conservative in both directions because the
    // residual predicate runs regardless)
    val sessionZone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    def tsSecondString(micros: Long): String = {
      val fl = Math.floorDiv(micros, 1000000L)
      java.time.LocalDateTime.ofInstant(java.time.Instant.ofEpochSecond(fl), sessionZone)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    }
    def dateString(v: Any, vt: DataType): Option[String] = vt match {
      case DateType => Some(java.time.LocalDate.ofEpochDay(v.toString.toLong).toString)
      case TimestampType => Some(java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(Math.floorDiv(v.toString.toLong, 1000000L)),
        sessionZone).toLocalDate.toString)
      case _ => None
    }
    def addNum(c: String, lo: Option[Double], hi: Option[Double]): Unit = {
      val (l0, h0) = num.getOrElse(c, (Double.NegativeInfinity, Double.PositiveInfinity))
      num(c) = (lo.map(math.max(l0, _)).getOrElse(l0), hi.map(math.min(h0, _)).getOrElse(h0))
    }
    def addStr(c: String, lo: Option[String], hi: Option[String]): Unit = {
      val (l0, h0) = str.getOrElse(c, (None, None))
      str(c) = (lo.map(v => l0.filter(_ > v).getOrElse(v)).orElse(l0),
        hi.map(v => h0.filter(_ < v).getOrElse(v)).orElse(h0))
    }
    def add(c: String, lo: Option[(Any, DataType)], hi: Option[(Any, DataType)]): Unit =
      fieldType(c) match {
        case Some(_: NumericType) =>
          addNum(c, lo.map(_._1.toString.toDouble), hi.map(_._1.toString.toDouble))
        case Some(StringType) =>
          addStr(c, lo.collect { case (v, StringType) => v.toString },
            hi.collect { case (v, StringType) => v.toString })
        case Some(DateType) =>
          addStr(c, lo.flatMap((dateString _).tupled), hi.flatMap((dateString _).tupled))
        case Some(TimestampType) =>
          // whole-second bounds; hi extended past any sub-second suffix
          addStr(c, lo.collect { case (v, TimestampType) => tsSecondString(v.toString.toLong) },
            hi.collect { case (v, TimestampType) => tsSecondString(v.toString.toLong) + "\uffff" })
        case _ => () // non-atomic or unknown column: no pruning from this leaf
      }
    def addIn(c: String, vs: Seq[(Any, DataType)]): Unit = fieldType(c) match {
      case Some(_: NumericType) =>
        val set = vs.map(_._1.toString.toDouble)
        inNum(c) = inNum.get(c).map(_.intersect(set)).getOrElse(set)
      case Some(StringType) | Some(DateType) =>
        val set = vs.flatMap { case (v, vt) =>
          if (vt == StringType) Some(v.toString) else dateString(v, vt) }
        if (set.size == vs.size) // every value converted, else no pruning
          inStr(c) = inStr.get(c).map(_.intersect(set)).getOrElse(set)
      case _ => ()
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a, b) => cmpEq(a, b)
      case EqualNullSafe(a, b) => cmpEq(a, b)
      case GreaterThan(a, b) => cmpGt(a, b)
      case GreaterThanOrEqual(a, b) => cmpGt(a, b)
      case LessThan(a, b) => cmpGt(b, a)
      case LessThanOrEqual(a, b) => cmpGt(b, a)
      case In(a, list) if list.forall(_.foldable) =>
        name(a).foreach { c =>
          val vs = list.flatMap(litVal)
          if (vs.size == list.size && vs.nonEmpty) { addIn(c, vs); addPoints(c, vs) }
        }
      case StartsWith(a, p) =>
        // any string with prefix P sorts in [P, P + U+FFFF...]; closed
        // interval keeps edge files, residual predicate trims rows
        name(a).zip(litVal(p)).foreach {
          case (c, (v, StringType)) if fieldType(c).contains(StringType) =>
            addStr(c, Some(v.toString), Some(v.toString + "\uffff"))
          case _ => ()
        }
      case _ => () // OR / UDF / complex leaf: contributes no bound
    }
    def cmpEq(a: Expression, b: Expression): Unit = {
      name(a).zip(litVal(b)).foreach { case (c, v) => add(c, Some(v), Some(v)); addPoints(c, Seq(v)) }
      name(b).zip(litVal(a)).foreach { case (c, v) => add(c, Some(v), Some(v)); addPoints(c, Seq(v)) }
    }
    // a > b (and a >= b — closed intervals make them the same bound)
    def cmpGt(a: Expression, b: Expression): Unit = {
      name(a).zip(litVal(b)).foreach { case (c, v) => add(c, Some(v), None) }
      name(b).zip(litVal(a)).foreach { case (c, v) => add(c, None, Some(v)) }
    }
    // analyze the predicate against an EMPTY frame carrying the snapshot
    // schema: the analyzer resolves attributes/casts exactly as the real
    // scan will, and the walk sees plain Catalyst comparison nodes (the
    // raw Column is a lazy ColumnNode wrapper in Spark 4)
    val analyzed = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .where(predicate).queryExecution.analyzed
    analyzed.collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }
      .foreach(walk)
    Bounds(num.toMap, str.toMap, inNum.toMap, inStr.toMap, points.toMap)
  }

  /** Files selected under pruning (for tests/metrics). */
  def selectedFiles(table: String, prune: Map[String, (Double, Double)],
                    pruneStr: Map[String, (String, String)] = Map.empty): Seq[String] = {
    val snap = readSnapshot(table).getOrElse(return Nil)
    surviving(snap, prune, pruneStr).map(_.path)
  }

  // --- minimal JSON (no external deps) -----------------------------------

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case '\r' => "\\r"
    case '\t' => "\\t"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  private def jm(mm: Map[String, String]): String =
    mm.toSeq.sortBy(_._1).map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")

  private def renderFileEntry(f: FileEntry): String = {
    val part = if (f.partition.isEmpty) "" else s""","partition":${jm(f.partition)}"""
    val blm = if (f.bloom.isEmpty) "" else s""","bloom":${jm(f.bloom)}"""
    s"""{"path":"${esc(f.path)}","rows":${f.rows},"min":${jm(f.min)},"max":${jm(f.max)},"seq":${f.seq}$part$blm}"""
  }

  private def renderSnapshot(s: Snapshot): String = {
    def m(mm: Map[String, String]) = jm(mm)
    // two-level layout: when the snapshot has a manifest plan, the file
    // list lives in the (shared, immutable) manifest files and the
    // snapshot carries only their paths
    val files =
      if (s.manifests.nonEmpty)
        s""""manifests":${s.manifests.map(p => s""""${esc(p)}"""").mkString("[", ",", "]")}"""
      else s""""files":${s.files.map(renderFileEntry).mkString("[", ",", "]")}"""
    val ren = if (s.renames.isEmpty) "" else s""","renames":${m(s.renames)}"""
    val del = if (s.deletes.isEmpty) "" else s.deletes.map(d =>
      s"""{"path":"${esc(d.path)}","seq":${d.seq},"keys":${d.keys.map(k => s""""${esc(k)}"""").mkString("[", ",", "]")}}""")
      .mkString(""","deletes":[""", ",", "]")
    val cids = if (s.commitIds.isEmpty) "" else
      s.commitIds.toSeq.sorted.map(c => s""""${esc(c)}"""")
        .mkString(""","commit_ids":[""", ",", "]")
    val spec = if (s.spec.isEmpty) "" else s.spec.map(f =>
      s"""{"name":"${esc(f.name)}","source":"${esc(f.source)}","transform":"${esc(f.transform)}"}""")
      .mkString(""","spec":[""", ",", "]")
    val ord = s.order.map(o =>
      s""","order":{"cols":${o.cols.map(c => s""""${esc(c)}"""").mkString("[", ",", "]")},"zorder":${o.zorder}}""")
      .getOrElse("")
    s"""{"id":${s.id},"parent":${s.parent},"schema":"${esc(s.schemaJson)}",$files$ren$del$cids$spec$ord}"""
  }

  private def parseFileEntry(fo: Any): FileEntry = {
    val f = fo.asInstanceOf[Map[String, Any]]
    FileEntry(f("path").asInstanceOf[String],
      f("rows").asInstanceOf[Double].toLong,
      f("min").asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.toString },
      f("max").asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.toString },
      f.get("seq").map(_.asInstanceOf[Double].toLong).getOrElse(0L),
      f.get("partition").map(_.asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.toString }).getOrElse(Map.empty),
      f.get("bloom").map(_.asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.toString }).getOrElse(Map.empty))
  }

  /** Manifest-file loads (cache misses) since JVM start — the metadata-read
    * meter for the two-level layout: re-reading a table whose manifests are
    * cached costs zero manifest loads however long its history. */
  val manifestLoads = new java.util.concurrent.atomic.AtomicLong(0)

  /** Manifest files are IMMUTABLE once written (never appended, never
    * rewritten under the same path), so caching by path can never go stale.
    * Crude size bound only. */
  private val manifestCache = new java.util.concurrent.ConcurrentHashMap[String, Seq[FileEntry]]()

  private def loadManifest(path: String): Seq[FileEntry] =
    manifestCache.computeIfAbsent(path, { p =>
      manifestLoads.incrementAndGet()
      if (manifestCache.size > 4096) manifestCache.clear()
      new JsonP(Files.readString(Paths.get(p))).parse()
        .asInstanceOf[List[Any]].map(parseFileEntry)
    })

  /** Tiny recursive-descent JSON parser for our own snapshot format. */
  private[table] def parseSnapshot(js: String): Snapshot = {
    metaParses.incrementAndGet()
    val p = new JsonP(js)
    val obj = p.parse().asInstanceOf[Map[String, Any]]
    val manifests = obj.get("manifests")
      .map(_.asInstanceOf[List[Any]].map(_.toString)).getOrElse(Nil)
    val files = manifests.flatMap(loadManifest) ++
      obj.get("files").map(_.asInstanceOf[List[Any]].map(parseFileEntry)).getOrElse(Nil)
    val deletes = obj.get("deletes").map(_.asInstanceOf[List[Any]].map { dd =>
      val d = dd.asInstanceOf[Map[String, Any]]
      DeleteEntry(d("path").asInstanceOf[String], d("seq").asInstanceOf[Double].toLong,
        d("keys").asInstanceOf[List[Any]].map(_.toString))
    }).getOrElse(Nil)
    Snapshot(obj("id").asInstanceOf[Double].toLong, obj("parent").asInstanceOf[Double].toLong,
      obj("schema").asInstanceOf[String], files,
      obj.get("renames").map(_.asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.toString }).getOrElse(Map.empty),
      deletes,
      obj.get("commit_ids").map(_.asInstanceOf[List[Any]].map(_.toString).toSet)
        .getOrElse(Set.empty),
      obj.get("spec").map(_.asInstanceOf[List[Any]].map { so =>
        val f = so.asInstanceOf[Map[String, Any]]
        PartitionField(f("name").asInstanceOf[String],
          f("source").asInstanceOf[String], f("transform").asInstanceOf[String])
      }).getOrElse(Nil),
      obj.get("order").map { oo =>
        val o = oo.asInstanceOf[Map[String, Any]]
        SortOrder(o("cols").asInstanceOf[List[Any]].map(_.toString),
          o("zorder").asInstanceOf[Boolean])
      },
      manifests)
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
