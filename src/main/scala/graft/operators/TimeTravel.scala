package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-level time travel: a commit-ledger read for BASE tables —
  * the same [[graft.index.FoldProtocol]] machinery every index kind
  * already serves as-of from, pointed at row data instead of postings
  * or vectors. `q_scd2`/`q_cdc_delta` SIMULATE history by slicing
  * columns; this is the real thing: appends, keyed upserts and
  * deletes land as ledgered commits, and `readEventsAsOf` replays the
  * table exactly as it stood after any commit.
  *
  * Layout (the index convention, verbatim):
  *   `<root>/data/seed` — commit 0 (initial load)
  *   `<root>/data/b<i>` — ledgered append/upsert commit i
  *   `<root>/tombstones/d<i>` — ledgered delete commit i
  * Every row carries its `_commit` id, so an UPSERT needs no
  * tombstone: the reader resolves each key to its highest committed
  * version ≤ the horizon with ONE struct-max aggregate (no window —
  * max(struct(_commit, cols)) merges map-side, the
  * `q_record_linkage` device), and the fold protocol's as-of read
  * already scopes both the visible commit dirs and the delete batches
  * to the horizon, honesty guards included (a compaction that
  * collapsed the horizon's history REFUSES rather than lies).
  *
  * Scale: a read as-of costs the horizon's committed dirs — partition
  * pruning and pushdown apply per dir exactly as on any parquet
  * table; the per-key version resolution is one map-side-combining
  * aggregate keyed by the table key. Nothing is replayed row-by-row
  * and no log is scanned: the ledger file is one atomic-replace text
  * file, the data dirs ARE the commits.
  */
object TimeTravel {

  private val DataSchema =
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, _commit BIGINT"

  private[graft] def protocol(path: String) =
    new graft.index.FoldProtocol(path, "_table_ledger")

  private def land(p: graft.index.FoldProtocol, rows: DataFrame,
      sub: String, commit: Long): Unit =
    rows
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withColumn("_commit", lit(commit))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"${p.dir("data")}/$sub")

  /** Initial load of a ledgered table: the rows land as the `seed`
    * sub-root at commit 0 (the non-batch dir every as-of horizon can
    * see — `committedDirsAsOf` requires one).
    */
  def initLedgeredTable(rows: DataFrame, root: String): Unit =
    land(protocol(root), rows, "seed", 0L)

  /** Append one commit of rows, EXACTLY ONCE under replay — new keys
    * insert, re-emitted keys UPSERT (the reader resolves each key to
    * its highest committed version, so an update is just the new
    * version at this commit's id; no tombstone, no rewrite of
    * history). A ledgered commitId is a committed no-op (returns
    * false); the b-dir write carries overwrite semantics, so a replay
    * after a mid-write crash rewrites the same dir; the atomic ledger
    * replace is the commit point.
    */
  def appendCommit(rows: DataFrame, root: String, commitId: Long): Boolean =
    protocol(root).fold(commitId, Seq("data")) {
      land(protocol(root), rows, s"b$commitId", commitId)
    }

  /** Tombstone a batch of keys as one ledgered delete commit,
    * EXACTLY ONCE under replay — rows vanish from every read whose
    * horizon ≥ this commit and stay visible below it.
    */
  def deleteCommit(ids: DataFrame, root: String, commitId: Long): Boolean =
    protocol(root).delete(commitId) {
      protocol(root).stageTombstones(
        ids.select(col("event_id")), "event_id", commitId)
    }

  /** Build-if-absent the ledgered-events gate fixture — four commits
    * with DISTINCT ledger ids so every id is a distinguishable
    * horizon (the `ensureAsOfBm25Index` convention):
    *   seed (id 0): initial load, event_id % 3 = 0
    *   b1: append, event_id % 3 = 1
    *   b2: upsert — inserts event_id % 3 = 2 AND re-emits
    *       event_id % 6 = 0 with value + 100 (a keyed update: the
    *       higher `_commit` version wins at read)
    *   d3: delete, event_id % 5 = 0 (victims span all three waves)
    */
  def ensureLedgeredEvents(s: SparkSession, d: String): String = {
    val suffix = d.replaceAll("\\W", "_")
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      s"graft_table_ledger$suffix").toString
    // Completeness is SCHEMA-GATED (names AND types), not just
    // ledger-gated: a fixture root built by an older build (fewer
    // columns, or an INT _commit) must rebuild, not serve stale
    // shapes — the NB/DSIR model-root lesson.
    val expected = org.apache.spark.sql.types.StructType.fromDDL(DataSchema)
      .fields.map(f => (f.name, f.dataType)).toSeq
    Layout.ensurePublishedDir(s, root)(
      r => protocol(r).deletedBatches().contains(3L) &&
        scala.util.Try(
          s.read.parquet(s"${protocol(r).dir("data")}/seed")
            .schema.fields.map(f => (f.name, f.dataType)).toSeq == expected)
          .getOrElse(false)
    ) { staging =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      initLedgeredTable(ev.filter(col("event_id") % 3 === 0), staging)
      appendCommit(ev.filter(col("event_id") % 3 === 1), staging, 1L)
      appendCommit(ev.filter(col("event_id") % 3 === 2)
        .unionByName(ev.filter(col("event_id") % 6 === 0)
          .withColumn("value", col("value") + 100.0)), staging, 2L)
      deleteCommit(ev.filter(col("event_id") % 5 === 0), staging, 3L)
    }
    root
  }

  /** The table exactly as it stood after ledger commit `asOf`, WITH
    * each key's winning `_commit` id — the resolution core every read
    * path shares: committed dirs and delete batches ≤ the horizon
    * (fold-protocol as-of read), then per-key resolution to the
    * highest committed version via one struct-max aggregate.
    *
    * The read schema is the HORIZON'S OWN SHAPE: the UNION of every
    * committed dir ≤ asOf (newest dir's field order first, then any
    * column only older dirs carry). Probing only the newest dir would
    * be wrong the moment a plain [[appendCommit]] (fixed ingest shape)
    * lands after an [[appendCommitEvolved]] add-column commit: the
    * narrower dir would become the newest and silently drop the added
    * column from every horizon ≥ its commit even though the data is on
    * disk — and a later [[vacuum]] would stage the narrowed shape into
    * `c<floor>`, destroying the evolved values below the floor. The
    * union keeps the horizon schema monotone nondecreasing regardless
    * of which writer landed last; dirs missing a column read it as
    * NULL. One driver-side parquet footer read per committed dir.
    */
  private def resolvedAsOf(s: SparkSession, root: String,
      asOf: Long): DataFrame = {
    val p = protocol(root)
    val dirs = p.committedDirsAsOf("data", asOf)
    val sch = physicalSchemaAsOf(s, root, asOf)
    val rest = sch.fieldNames.toSeq
      .filterNot(n => n == "event_id" || n == "_commit")
    p.readCommittedStrippedAsOf(s, "data", "event_id", asOf)(r =>
        s.read.schema(sch).parquet(r))
      .groupBy(col("event_id"))
      .agg(max(struct((col("_commit") +: rest.map(col)): _*)).as("v"))
      .select(col("event_id") +: col("v._commit").as("_commit") +:
        rest.map(n => col(s"v.$n").as(n)): _*)
  }

  /** The horizon's PHYSICAL schema: the union across every committed
    * data dir ≤ asOf (see [[resolvedAsOf]]'s doc for why the union,
    * not the newest dir alone). Driver-side footer reads only.
    */
  private def physicalSchemaAsOf(s: SparkSession, root: String,
      asOf: Long): org.apache.spark.sql.types.StructType = {
    val p = protocol(root)
    val dirs = p.committedDirsAsOf("data", asOf)
    val newest = dirs.maxBy(d => p.dirOrd(d.substring(d.lastIndexOf('/') + 1)))
    val base = s.read.parquet(newest).schema
    val extra = dirs.filterNot(_ == newest)
      .flatMap(d => s.read.parquet(d).schema.fields)
      .filterNot(f => base.fieldNames.contains(f.name))
      .distinctBy(_.name)
    org.apache.spark.sql.types.StructType(base.fields ++ extra)
  }

  // ---- column mapping (rename/drop without rewrite) ----
  //
  // The Iceberg/Delta-style logical-name indirection: data dirs keep
  // every column under its PHYSICAL name (the name it was born with,
  // never rewritten), and ledgered mapping commits under the `colmap`
  // kind re-bind physical -> logical per horizon — a rename (or drop)
  // is one tiny parquet row plus a ledger entry, horizons below it
  // keep serving the old name (or the column), horizons at or above
  // serve the new view. The mapping read is a driver-side collect of
  // a <= |columns| x |mapping commits| frame.

  /** The horizon's physical→logical binding: absent physical = itself,
    * `Some(l)` = serve as `l`, `None` = dropped at or below `asOf`.
    * Per physical column the NEWEST mapping commit ≤ asOf wins.
    */
  private def mappingAsOf(s: SparkSession, root: String,
      asOf: Long): Map[String, Option[String]] = {
    val dirs = protocol(root).committedDirsOrEmpty("colmap")
      .filter { d =>
        val n = d.substring(d.lastIndexOf('/') + 1)
        n.matches("b\\d+") && n.drop(1).toLong <= asOf
      }
    if (dirs.isEmpty) Map.empty
    else s.read.parquet(dirs: _*)
      .select(col("physical"), col("logical"), col("_commit"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (phys, rows) =>
        val newest = rows.maxBy(_.getLong(2))
        phys -> Option(newest.getString(1))
      }
  }

  /** Current logical name of each physical column (identity unless a
    * mapping commit re-bound it; dropped columns are absent).
    */
  private def logicalView(s: SparkSession, root: String,
      asOf: Long): Map[String, String] = {
    val m = mappingAsOf(s, root, asOf)
    physicalSchemaAsOf(s, root, asOf).fieldNames.toSeq
      .filterNot(_ == "_commit")
      .flatMap(p => m.getOrElse(p, Some(p)).map(l => p -> l))
      .toMap
  }

  private def stageMapping(s: SparkSession, root: String,
      physical: String, logical: Option[String], commitId: Long): Boolean = {
    import s.implicits._
    protocol(root).fold(commitId, Seq("colmap")) {
      Seq((physical, logical, commitId))
        .toDF("physical", "logical", "_commit")
        .coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"${protocol(root).dir("colmap")}/b$commitId")
    }
  }

  /** RENAME a column as one ledgered commit, no data rewrite: horizons
    * ≥ this commit serve the column as `to`, horizons below keep `from`
    * — both reading the same physical bytes. Refuses to rename the
    * table key, a column the current horizon does not serve, or onto a
    * name the current horizon already serves. Exactly once under
    * replay.
    */
  def renameColumnCommit(s: SparkSession, root: String,
      from: String, to: String, commitId: Long): Boolean = {
    require(from != "event_id" && to != "event_id",
      "the table key event_id cannot be renamed")
    val view = logicalView(s, root, Long.MaxValue)
    val phys = view.collectFirst { case (p, l) if l == from => p }
    require(phys.nonEmpty,
      s"rename: no column named '$from' at the current horizon " +
        s"(serving: ${view.values.toSeq.sorted.mkString(", ")})")
    require(!view.values.toSet.contains(to),
      s"rename: '$to' already names a served column")
    stageMapping(s, root, phys.get, Some(to), commitId)
  }

  /** DROP a column as one ledgered commit, no data rewrite: horizons ≥
    * this commit serve without it, horizons below — which need it —
    * KEEP serving it from the same physical bytes (the mapping makes
    * the drop-refusal unnecessary: nothing any surviving horizon needs
    * is destroyed; physical reclamation of the bytes would be a
    * rewrite op, deliberately not this one). The table key refuses.
    */
  def dropColumnCommit(s: SparkSession, root: String,
      name: String, commitId: Long): Boolean = {
    require(name != "event_id", "the table key event_id cannot be dropped")
    val view = logicalView(s, root, Long.MaxValue)
    val phys = view.collectFirst { case (p, l) if l == name => p }
    require(phys.nonEmpty,
      s"drop: no column named '$name' at the current horizon")
    stageMapping(s, root, phys.get, None, commitId)
  }

  /** [[appendCommit]] for rows carrying the CURRENT LOGICAL shape —
    * the write path after a rename: logical names re-bind to their
    * physical columns before landing (so the on-disk layout never
    * forks on a rename), then the evolved append's superset check and
    * land run on physical names as usual.
    */
  def appendCommitMapped(rows: DataFrame, root: String,
      commitId: Long): Boolean = {
    val s = rows.sparkSession
    val toPhys = logicalView(s, root, Long.MaxValue)
      .collect { case (p, l) if l != p => l -> p }
    val mapped = toPhys.foldLeft(rows) { case (f, (l, p)) =>
      if (f.columns.contains(l)) f.withColumnRenamed(l, p) else f
    }
    appendCommitEvolved(mapped, root, commitId)
  }

  /** The events table exactly as it stood after ledger commit `asOf` —
    * [[resolvedAsOf]] minus the bookkeeping `_commit` column, with the
    * horizon's column mapping applied (renames re-bound, dropped
    * columns hidden; identity when no mapping commit ≤ asOf exists).
    */
  def readEventsAsOf(s: SparkSession, root: String, asOf: Long): DataFrame = {
    val m = mappingAsOf(s, root, asOf)
    m.foldLeft(resolvedAsOf(s, root, asOf).drop("_commit")) {
      case (f, (phys, logOpt)) =>
        if (!f.columns.contains(phys)) f
        else logOpt match {
          case Some(l) if l == phys => f
          case Some(l) => f.withColumnRenamed(phys, l)
          case None => f.drop(phys)
        }
    }
  }

  // ---- change data feed (net-effect diff between two horizons) ----

  /** The NET-EFFECT change feed between two ledger horizons: every key
    * whose resolved state differs between `from` (exclusive) and `to`
    * (inclusive), classified Delta-CDF-style as `insert`,
    * `update_preimage`/`update_postimage` (both sides of a rewrite) or
    * `delete`, with the image columns flattened next to the key in the
    * `to` horizon's shape (pre-images NULL-fill columns the `from`
    * horizon did not yet carry).
    *
    * Scale: the ledger's commit dirs ARE the stored change files — the
    * candidate set reads ONLY the window's `b<id>` dirs and `d<id>`
    * tombstone batches (never the full history), resolves each touched
    * key's net op with one struct-max aggregate, and pays exactly ONE
    * key-scoped probe of the `from` state for pre-images and
    * insert-vs-update classification. At a 100 TB table with hourly
    * commits the feed costs the delta plus one join against the base,
    * not a two-snapshot diff. Net-effect semantics resolve
    * intra-window churn: a key inserted then deleted inside the window
    * emits NOTHING, a key deleted then re-added emits an update (or an
    * insert if it was invisible at `from`), and multiple rewrites
    * collapse to one pre/post pair.
    *
    * Honesty: serving requires horizon `from` to be readable — a
    * vacuum whose floor is above `from` makes the window's start state
    * unreadable, and the read REFUSES through [[resolvedAsOf]]'s
    * honesty guard rather than diffing against a lie. That same guard
    * guarantees every window data dir is a pure per-commit `b<id>`:
    * a `c<floor>` dir with floor inside the window would have tripped
    * the `from`-horizon refusal first.
    */
  def changesBetween(s: SparkSession, root: String,
      from: Long, to: Long): DataFrame = {
    require(from <= to,
      s"change window ($from, $to] is empty-or-inverted: from must be <= to")
    val p = protocol(root)
    val sch = physicalSchemaAsOf(s, root, to)
    val rest = sch.fieldNames.toSeq
      .filterNot(n => n == "event_id" || n == "_commit")
    def name(d: String) = d.substring(d.lastIndexOf('/') + 1)
    val writes = windowWrites(s, sch, rest,
      p.committedDirsAsOf("data", to)
        .filter(d => p.dirOrd(name(d)) > from))
    val dels = windowDels(s, sch,
      p.committedDirsOrEmpty("tombstones").filter { d =>
        val n = name(d)
        n.matches("d\\d+") && {
          val id = n.drop(1).toLong; id > from && id <= to
        }
      })
    classifyNetChanges(sch, rest, writes, dels, resolvedAsOf(s, root, from))
  }

  private def emptyOf(s: SparkSession,
      st: org.apache.spark.sql.types.StructType): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)

  /** The window's net writes: the given commit dirs unioned and
    * resolved per key to the latest version (`_wc` = its commit).
    */
  private def windowWrites(s: SparkSession,
      sch: org.apache.spark.sql.types.StructType, rest: Seq[String],
      dirs: Seq[String]): DataFrame = dirs match {
    case Nil =>
      emptyOf(s, org.apache.spark.sql.types.StructType(
        Seq(sch("event_id"), sch("_commit").copy(name = "_wc")) ++
          rest.map(sch(_))))
    case ds =>
      s.read.schema(sch).parquet(ds: _*)
        .groupBy(col("event_id"))
        .agg(max(struct((col("_commit") +: rest.map(col)): _*)).as("v"))
        .select(col("event_id") +: col("v._commit").as("_wc") +:
          rest.map(n => col(s"v.$n").as(n)): _*)
  }

  /** The window's net deletes: tombstone dirs → per key the latest
    * delete's ledger id (`_dc`).
    */
  private def windowDels(s: SparkSession,
      sch: org.apache.spark.sql.types.StructType,
      dirs: Seq[String]): DataFrame = dirs match {
    case Nil =>
      emptyOf(s, org.apache.spark.sql.types.StructType(Seq(
        sch("event_id"), sch("_commit").copy(name = "_dc"))))
    case ds =>
      ds.map { d =>
        s.read.parquet(d)
          .select(col("event_id"),
            lit(d.substring(d.lastIndexOf('/') + 1).drop(1).toLong)
              .as("_dc"))
      }.reduce(_.unionByName(_))
        .groupBy(col("event_id")).agg(max(col("_dc")).as("_dc"))
  }

  /** The shared net-effect classification core of [[changesBetween]]
    * and [[changesBetweenBranch]]: latest write vs latest delete per
    * touched key, pre-image probe, Delta-CDF change rows.
    */
  private def classifyNetChanges(
      sch: org.apache.spark.sql.types.StructType, rest: Seq[String],
      writes: DataFrame, dels: DataFrame, pre: DataFrame): DataFrame = {
    val preCols = pre.columns.toSet
    val preSel = pre.select(col("event_id") +: col("_commit").as("_pc") +:
      rest.map(n => (if (preCols.contains(n)) col(n)
        else lit(null).cast(sch(n).dataType)).as(s"_pre_$n")): _*)

    val joined = writes.join(dels, Seq("event_id"), "full_outer")
      .join(preSel, Seq("event_id"), "left")
    val isWrite = col("_wc").isNotNull &&
      (col("_dc").isNull || col("_dc") < col("_wc"))
    val isDel = col("_dc").isNotNull &&
      (col("_wc").isNull || col("_wc") < col("_dc"))
    val preExists = col("_pc").isNotNull
    val post = struct(rest.map(col): _*)
    val preImg = struct(rest.map(n => col(s"_pre_$n").as(n)): _*)
    def tagged(ct: String, img: org.apache.spark.sql.Column) =
      struct(lit(ct).as("_change_type"), img.as("_img"))
    // No otherwise-branch: the fall-through NULL array explodes to
    // zero rows — exactly the net-no-op cases (insert-then-delete
    // inside the window; a tombstone for a key invisible at `from`).
    val changes =
      when(isWrite && preExists,
        array(tagged("update_preimage", preImg),
          tagged("update_postimage", post)))
        .when(isWrite, array(tagged("insert", post)))
        .when(isDel && preExists, array(tagged("delete", preImg)))
    joined
      .select(col("event_id"), explode(changes).as("_c"))
      .select(col("event_id"), col("_c._change_type").as("_change_type"),
        col("_c._img.*"))
  }

  // ---- zero-copy branching ----
  //
  // A BRANCH is a new root holding only a `_branch` manifest (base
  // root + fork commit) plus its own ledger, commit dirs and
  // tombstones: creation writes ONE file, copies ZERO data — the base
  // dirs are referenced in place (the Iceberg-refs / Delta-shallow-
  // clone shape). Reads compose the base's as-of machinery at the
  // fork horizon with the branch's own ledgered commits, resolving
  // keys across both with the standard struct-max; branch writes
  // can never perturb the base (they land under the branch root
  // only), and base maintenance stays honest by construction: a base
  // vacuum whose floor exceeds the fork point makes the fork horizon
  // unreadable, so every branch read REFUSES through the base's own
  // compaction guard instead of serving a lie.

  private def branchManifestPath(root: String) =
    new org.apache.hadoop.fs.Path(root, "_branch")

  /** A RELATIVE base ref resolves against the branch root's parent —
    * the sibling layout a staged-and-published fixture needs (an
    * absolute path recorded inside a staging dir would dangle after
    * the publish rename) and the portable choice when a whole
    * warehouse moves. Absolute refs pass through.
    */
  private def resolveBase(branchRoot: String, base: String): String =
    if (base.startsWith("/") || base.contains(":/")) base
    else new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(branchRoot).getParent, base).toString

  /** Fork a branch of a ledgered table at `forkCommit`: one manifest
    * write, zero data movement. The fork point must be a committed
    * ledger horizon of the base (seed = 0 counts), servable TODAY —
    * probed through the base's honesty guards. Refuses to overwrite
    * an existing branch. `baseRoot` may be a sibling-relative name
    * (see [[resolveBase]]).
    */
  def createBranch(s: SparkSession, baseRoot: String,
      branchRoot: String, forkCommit: Long): Unit = {
    val bp = protocol(resolveBase(branchRoot, baseRoot))
    require((bp.allLedgerIds() + 0L).contains(forkCommit),
      s"fork point $forkCommit is not a committed ledger horizon of " +
        s"$baseRoot (committed: ${(bp.allLedgerIds() + 0L).toSeq.sorted
          .mkString(", ")})")
    bp.committedDirsAsOf("data", forkCommit)
    val path = branchManifestPath(branchRoot)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(!fs.exists(path), s"branch at $branchRoot already exists")
    val tmp = new org.apache.hadoop.fs.Path(branchRoot, ".branch.tmp")
    val out = fs.create(tmp, true)
    out.write(s"$baseRoot\n$forkCommit\n".getBytes("UTF-8"))
    out.close()
    require(fs.rename(tmp, path),
      s"branch manifest rename failed at $path")
  }

  private def branchManifest(s: SparkSession,
      branchRoot: String): (String, Long) = {
    val path = branchManifestPath(branchRoot)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"no branch manifest at $branchRoot")
    val in = fs.open(path)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = txt.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    (resolveBase(branchRoot, lines.head), lines(1).toLong)
  }

  /** [[appendCommit]] onto a branch: lands under the BRANCH root's own
    * ledger and dirs (the base never changes), exactly once. Branch
    * commit ids must sit above the fork point — ids at or below it
    * would be ambiguous against the base history the branch shares.
    */
  def appendCommitBranch(rows: DataFrame, branchRoot: String,
      commitId: Long): Boolean = {
    val (_, fork) = branchManifest(rows.sparkSession, branchRoot)
    require(commitId > fork,
      s"branch commit $commitId must be above the fork point $fork")
    appendCommit(rows, branchRoot, commitId)
  }

  /** [[deleteCommit]] on a branch: the tombstones land branch-side and
    * hide base and branch rows at branch horizons ≥ the commit — the
    * base itself keeps serving them.
    */
  def deleteCommitBranch(ids: DataFrame, branchRoot: String,
      commitId: Long): Boolean = {
    val (_, fork) = branchManifest(ids.sparkSession, branchRoot)
    require(commitId > fork,
      s"branch delete $commitId must be above the fork point $fork")
    deleteCommit(ids, branchRoot, commitId)
  }

  // ---- incremental replication (the ledger as a change feed) ----

  /** Replay `src`'s ledgered commits onto `dst` — incremental table
    * replication with the ledger as the change feed. The seed state
    * copies once (when dst has none); then every committed fold
    * re-lands its commit dir's rows and every committed delete its
    * tombstone keys, in ledger order UNDER THE SAME IDS — so
    * replication is idempotent (committed ids no-op), crash-resumable
    * (a rerun continues wherever it stopped), incremental (cost ∝ the
    * commits dst lacks — the dirs ARE the change files), and
    * horizon-preserving (every src horizon is a dst horizon, so
    * consumers time-travel the replica too). Refuses, rather than
    * silently diverging, when per-commit history dst still needs has
    * been vacuumed away on src — replicate-before-vacuum is the
    * operational contract, the same honesty trade every as-of read
    * makes. Returns the number of commits applied this call (seed
    * copy included).
    */
  def mirrorCommits(s: SparkSession, src: String, dst: String): Int = {
    val sp = protocol(src)
    val dp = protocol(dst)
    def name(dd: String) = dd.substring(dd.lastIndexOf('/') + 1)
    val srcData = sp.committedDirsOrEmpty("data")
    val foldDirs = srcData.filter(dd => name(dd).matches("b\\d+"))
      .map(dd => name(dd).drop(1).toLong -> dd).toMap
    val delDirs = sp.committedDirsOrEmpty("tombstones")
      .filter(dd => name(dd).matches("d\\d+"))
      .map(dd => name(dd).drop(1).toLong -> dd).toMap
    var applied = 0
    val dstSeeded = dp.committedDirsOrEmpty("data")
      .exists(dd => !name(dd).matches("[bd]\\d+"))
    if (!dstSeeded) {
      val srcSeed = srcData.find(dd => name(dd) == "seed")
      require(srcSeed.nonEmpty,
        s"cannot bootstrap replica at $dst: src $src has no seed dir " +
          "(vacuumed past its seed — replicate before vacuuming)")
      initLedgeredTable(s.read.parquet(srcSeed.get), dst)
      applied += 1
    }
    val done = dp.allLedgerIds()
    (sp.foldedBatches() ++ sp.deletedBatches()).toSeq.sorted
      .filterNot(done.contains).foreach { id =>
        if (sp.foldedBatches().contains(id)) {
          require(foldDirs.contains(id),
            s"cannot mirror commit $id: src per-commit dir was " +
              "vacuumed away (replicate before vacuuming)")
          if (appendCommit(s.read.parquet(foldDirs(id)), dst, id))
            applied += 1
        } else {
          require(delDirs.contains(id),
            s"cannot mirror delete $id: src tombstone batch was " +
              "vacuumed away (replicate before vacuuming)")
          if (deleteCommit(s.read.parquet(delDirs(id))
              .select(col("event_id")), dst, id))
            applied += 1
        }
      }
    applied
  }

  /** FAST-FORWARD merge of a branch back into its base: replays the
    * branch's ledgered commits onto the base under the same ids
    * ([[mirrorCommits]] — the branch dirs are the change files).
    * Refuses unless every base ledger id above the fork point is
    * already one of the branch's own (base unchanged since the fork,
    * or a crashed earlier merge being resumed): a DIVERGED base needs
    * conflict resolution, deliberately not this op — the caller forks
    * anew and rebases. Idempotent and crash-resumable like every
    * replay; the branch stays a valid (now redundant) ref afterwards.
    */
  def mergeBranchFF(s: SparkSession, branchRoot: String): Int = {
    val (base, fork) = branchManifest(s, branchRoot)
    val brIds = protocol(branchRoot).allLedgerIds()
    val foreign = (protocol(base).allLedgerIds() + 0L)
      .filter(i => i > fork && !brIds.contains(i))
    require(foreign.isEmpty,
      s"fast-forward refused: base at $base advanced past the fork " +
        s"$fork with foreign commit(s) ${foreign.toSeq.sorted.mkString(", ")}")
    mirrorCommits(s, branchRoot, base)
  }

  /** The branch's table as of branch-ledger commit `asOf`: base
    * committed state at min(fork, asOf) — so pre-fork horizons serve
    * the shared history — unioned with the branch's own commits ≤
    * asOf, keys resolved across both by the standard struct-max, then
    * branch tombstones in (fork, asOf] applied by ledger order (a
    * winner re-added above the delete survives it).
    */
  def readEventsAsOfBranch(s: SparkSession, branchRoot: String,
      asOf: Long): DataFrame =
    resolvedAsOfBranch(s, branchRoot, asOf).drop("_commit")

  /** [[changesBetween]] for a BRANCH: the net-effect feed between two
    * branch-view horizons, fork-aware — a window reaching below the
    * fork reads the BASE's commit dirs and tombstone batches in
    * (from, min(fork, to)] next to the branch's own in (from, to]
    * (branch ids sit above the fork by construction), and pre-images
    * come from the branch-resolved start state. A replica consuming a
    * branch pays the same delta-only cost as on a flat table; base
    * honesty guards fire through the fork-horizon listing exactly as
    * they do for branch reads.
    */
  def changesBetweenBranch(s: SparkSession, branchRoot: String,
      from: Long, to: Long): DataFrame = {
    require(from <= to,
      s"change window ($from, $to] is empty-or-inverted: from must be <= to")
    val (base, fork) = branchManifest(s, branchRoot)
    val bp = protocol(base)
    val p = protocol(branchRoot)
    def name(dd: String) = dd.substring(dd.lastIndexOf('/') + 1)
    val sch = physicalSchemaAsOf(s, base, math.min(fork, to))
    val rest = sch.fieldNames.toSeq
      .filterNot(n => n == "event_id" || n == "_commit")
    val baseWin =
      if (from >= fork) Nil
      else bp.committedDirsAsOf("data", math.min(fork, to))
        .filter(dd => bp.dirOrd(name(dd)) > from)
    val brWin = p.committedDirsOrEmpty("data").filter { dd =>
      val n = name(dd)
      n.matches("b\\d+") && {
        val id = n.drop(1).toLong; id > from && id <= to
      }
    }
    def delsIn(proto: graft.index.FoldProtocol, hi: Long) =
      proto.committedDirsOrEmpty("tombstones").filter { dd =>
        val n = name(dd)
        n.matches("d\\d+") && {
          val id = n.drop(1).toLong; id > from && id <= hi
        }
      }
    val delDirs =
      (if (from >= fork) Nil else delsIn(bp, math.min(fork, to))) ++
        delsIn(p, to)
    classifyNetChanges(sch, rest,
      windowWrites(s, sch, rest, baseWin ++ brWin),
      windowDels(s, sch, delDirs),
      resolvedAsOfBranch(s, branchRoot, from))
  }

  /** [[readEventsAsOfBranch]] keeping each key's winning `_commit` —
    * the branch twin of [[resolvedAsOf]], shared by the branch read
    * and the branch change feed.
    */
  private def resolvedAsOfBranch(s: SparkSession, branchRoot: String,
      asOf: Long): DataFrame = {
    val (base, fork) = branchManifest(s, branchRoot)
    val baseRows = protocol(base).readCommittedStrippedAsOf(
      s, "data", "event_id", math.min(fork, asOf))(r => s.read.parquet(r))
    val p = protocol(branchRoot)
    def name(dd: String) = dd.substring(dd.lastIndexOf('/') + 1)
    val brDirs = p.committedDirsOrEmpty("data").filter { dd =>
      val n = name(dd)
      n.matches("b\\d+") && n.drop(1).toLong <= asOf
    }
    val withBranch = brDirs.foldLeft(baseRows)((f, dir) =>
      f.unionByName(s.read.parquet(dir), allowMissingColumns = true))
    val rest = withBranch.columns.toSeq
      .filterNot(n => n == "event_id" || n == "_commit")
    val resolved = withBranch.groupBy(col("event_id"))
      .agg(max(struct((col("_commit") +: rest.map(col)): _*)).as("v"))
      .select(col("event_id") +: col("v._commit").as("_commit") +:
        rest.map(n => col(s"v.$n").as(n)): _*)
    val tombs = p.committedDirsOrEmpty("tombstones").filter { dd =>
      val n = name(dd)
      n.matches("d\\d+") && {
        val i = n.drop(1).toLong; i > fork && i <= asOf
      }
    }
    val out = tombs match {
      case Nil => resolved
      case ds =>
        val t = ds.map { dd =>
          s.read.parquet(dd).select(col("event_id").as("_t_id"),
            lit(name(dd).drop(1).toLong).as("_dc"))
        }.reduce(_.unionByName(_))
          .groupBy(col("_t_id")).agg(max(col("_dc")).as("_dc"))
        resolved.join(t,
          resolved("event_id") === t("_t_id") &&
            resolved("_commit") <= t("_dc"), "left_anti")
    }
    out
  }

  /** Append one commit that may ADD columns to the table — the
    * schema-evolution twin of [[appendCommit]] (which pins the fixed
    * ingest shape). The new shape must be a SUPERSET of the currently
    * committed one (add-column only — drops/renames would make older
    * horizons unreadable); reads at horizons ≥ this commit serve the
    * widened shape with pre-change rows NULL in the added columns,
    * reads below it serve the old shape untouched. The superset check
    * is one driver-side footer read against the newest committed dir.
    */
  def appendCommitEvolved(rows: DataFrame, root: String,
      commitId: Long): Boolean = {
    val p = protocol(root)
    require(rows.columns.contains("event_id"),
      "evolved commit must carry the table key event_id")
    val dirs = p.committedDirsOrEmpty("data")
    if (dirs.nonEmpty) {
      val newest = dirs.maxBy(d =>
        p.dirOrd(d.substring(d.lastIndexOf('/') + 1)))
      val prev = rows.sparkSession.read.parquet(newest)
        .schema.fieldNames.toSet - "_commit"
      val missing = prev -- rows.columns.toSet
      require(missing.isEmpty,
        s"schema evolution is add-column only: commit $commitId is " +
          s"missing previously committed column(s) ${missing.mkString(", ")}")
    }
    p.fold(commitId, Seq("data")) {
      rows.withColumn("_commit", lit(commitId))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"${p.dir("data")}/b$commitId")
    }
  }

  /** Ledger retention: compact every commit ≤ `floor` into ONE
    * resolved `c<floor>` dir and reclaim their per-commit dirs (and
    * the delete batches ≤ floor they already absorbed) — the missing
    * half of the time-travel lifecycle: at an hourly ingest cadence
    * (the reference's own envelope) a keep-everything ledger is
    * unbounded small-dir growth with no way to reclaim.
    *
    * Semantics: every horizon ≥ floor reads EXACTLY as before (the
    * `c<floor>` dir holds each key's resolved winning version as of
    * floor, `_commit` preserved, so the reader's struct-max resolution
    * sees the same winners); horizons < floor REFUSE with the honesty
    * guard every index compaction already speaks
    * (`committedDirsAsOf`'s "compaction collapsed the per-fold
    * history" require) — physical reclamation traded for ledger
    * history below the floor, never a silent lie.
    *
    * Crash-safe and exactly-once, the index-compaction way: the
    * resolved state stages into a dot-dir `committedDirs` cannot see,
    * ONE atomic rename makes it `c<floor>` — THE commit point, because
    * the protocol's compaction-supersedes rule
    * ([[graft.index.FoldProtocol.committedDirsOrEmpty]]) hides the
    * collapsed sources the instant the c-dir lands — then the sources
    * are dropped as pure reclamation. A crash before the rename
    * changes nothing (replay recomputes); a crash after it serves
    * exactly the post-vacuum view and the replay (c-dir already
    * present) just finishes the drops. A fully-vacuumed floor is a
    * committed no-op (returns false). The ledger itself is never
    * rewritten: replayed commitIds keep short-circuiting after their
    * dirs are gone. The requested floor normalizes to the newest
    * committed id at or below it, and a vacuum that would detach a
    * surviving tombstone REFUSES (see
    * [[graft.index.FoldProtocol.requireNoDetachedSurvivors]]).
    * Writer-lease-guarded like every index publish.
    */
  def vacuum(s: SparkSession, root: String, floorRequested: Long): Boolean =
    protocol(root).vacuumKinds(s, floorRequested, Seq(
      "data" -> ((floor, staging) =>
        resolvedAsOf(s, root, floor)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(staging))))

  /** Build-if-absent the VACUUMED-table gate fixture: the same four
    * commits as [[ensureLedgeredEvents]], then [[vacuum]] at floor 2 —
    * so horizons 2 and 3 survive (and must read hash-equal to the
    * unvacuumed root's) while 0 and 1 are reclaimed. Completeness is
    * the vacuum's POST-state (c2 present with its _SUCCESS, seed
    * gone, the final delete ledgered): a root from a crashed vacuum
    * rebuilds rather than serving a half-reclaimed layout.
    */
  def ensureVacuumedEvents(s: SparkSession, d: String): String = {
    val suffix = d.replaceAll("\\W", "_")
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      s"graft_table_vacuum$suffix").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Layout.ensurePublishedDir(s, root)(r =>
      protocol(r).deletedBatches().contains(3L) &&
        fs.exists(new org.apache.hadoop.fs.Path(
          s"${protocol(r).dir("data")}/c2", "_SUCCESS")) &&
        !fs.exists(new org.apache.hadoop.fs.Path(
          s"${protocol(r).dir("data")}/seed"))
    ) { staging =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      initLedgeredTable(ev.filter(col("event_id") % 3 === 0), staging)
      appendCommit(ev.filter(col("event_id") % 3 === 1), staging, 1L)
      appendCommit(ev.filter(col("event_id") % 3 === 2)
        .unionByName(ev.filter(col("event_id") % 6 === 0)
          .withColumn("value", col("value") + 100.0)), staging, 2L)
      deleteCommit(ev.filter(col("event_id") % 5 === 0), staging, 3L)
      vacuum(s, staging, 2L)
    }
    root
  }

  /** Build-if-absent the schema-evolution gate fixture: two commits in
    * the original five-column shape, then an [[appendCommitEvolved]]
    * add-column commit (a DOUBLE `score` = value × 2) that both
    * inserts the last third of the corpus AND upserts the
    * event_id % 6 = 0 keys to fill their new column — so horizons 0–1
    * serve the old shape and horizon 2 the widened one, with
    * non-upserted pre-change rows NULL in `score`.
    */
  def ensureEvolvedEvents(s: SparkSession, d: String): String = {
    val suffix = d.replaceAll("\\W", "_")
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      s"graft_table_evolve$suffix").toString
    Layout.ensurePublishedDir(s, root)(r =>
      protocol(r).foldedBatches().contains(2L) &&
        // schema-gated on the evolved commit (the NB/DSIR lesson): a
        // root built before the add-column shape rebuilds, not serves
        scala.util.Try(
          s.read.parquet(s"${protocol(r).dir("data")}/b2")
            .columns.contains("score")).getOrElse(false)
    ) { staging =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      initLedgeredTable(ev.filter(col("event_id") % 3 === 0), staging)
      appendCommit(ev.filter(col("event_id") % 3 === 1), staging, 1L)
      appendCommitEvolved(
        ev.filter(col("event_id") % 3 === 2)
          .unionByName(ev.filter(col("event_id") % 6 === 0))
          .withColumn("score", col("value") * 2.0),
        staging, 2L)
    }
    root
  }

  /** Build-if-absent the RENAME-evolution gate fixture: two data
    * commits in the original shape, a ledgered RENAME of `value` →
    * `reading` (commit 2, mapping-only — no data rewrite), then a
    * mapped append carrying the NEW logical shape (commit 3) — so
    * horizons 0–1 serve `value`, horizons 2–3 serve `reading`, and the
    * post-rename write lands on the same physical column.
    */
  def ensureRenamedEvents(s: SparkSession, d: String): String = {
    val suffix = d.replaceAll("\\W", "_")
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      s"graft_table_rename$suffix").toString
    Layout.ensurePublishedDir(s, root)(r =>
      protocol(r).foldedBatches() == Set(1L, 2L, 3L) &&
        scala.util.Try(
          s.read.parquet(s"${protocol(r).dir("colmap")}/b2")
            .columns.contains("physical")).getOrElse(false)
    ) { staging =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      initLedgeredTable(ev.filter(col("event_id") % 3 === 0), staging)
      appendCommit(ev.filter(col("event_id") % 3 === 1), staging, 1L)
      renameColumnCommit(s, staging, "value", "reading", 2L)
      appendCommitMapped(
        ev.filter(col("event_id") % 3 === 2)
          .withColumnRenamed("value", "reading"), staging, 3L)
    }
    root
  }

  /** One horizon of the `q_table_asof` oracle: per event_type count
    * and DECIMAL-exact value total of the table AS OF that commit,
    * recomputed from the raw table by the same modular commit
    * definitions as [[ensureLedgeredEvents]] — shared with
    * `q_table_vacuum`, whose whole point is that surviving horizons
    * keep this oracle unchanged.
    */
  private def asOfHorizonSql(h: Int): String =
    s"""SELECT CAST($h AS BIGINT) AS horizon, event_type,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total_value
       |FROM (
       |  SELECT event_type,
       |    CASE WHEN $h >= 2 AND event_id % 6 = 0
       |         THEN value + 100 ELSE value END AS v
       |  FROM events
       |  WHERE event_id % 3 <= ${math.min(h, 2)}
       |    AND NOT ($h >= 3 AND event_id % 5 = 0))
       |GROUP BY event_type""".stripMargin

  /** One horizon of the as-of readout shared by `q_table_asof` and
    * `q_table_vacuum` — per event_type count + DECIMAL-exact total.
    */
  private def asOfHorizonFrame(s: SparkSession, root: String,
      h: Int): DataFrame =
    readEventsAsOf(s, root, h.toLong)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)"))
          .cast("double").as("total_value"))
      .select(lit(h.toLong).as("horizon"), col("event_type"),
        col("n"), col("total_value"))

  /** Build-if-absent the BRANCH gate fixture — two roots under one
    * published parent: `main` gets the standard four-commit lifecycle
    * (seed %3=0, b1 %3=1, b2 upsert +100 on %6=0 plus %3=2 inserts,
    * d3 delete %5=0); `exp` forks off main AT COMMIT 1 and diverges —
    * its b2 upserts %6=0 to value+500 and inserts the %3=2 wave at
    * DOUBLED values, its d3 deletes %7=0. Completeness = both
    * ledgers' final deletes plus the branch manifest.
    */
  def ensureBranchedEvents(s: SparkSession, d: String): (String, String) = {
    val suffix = d.replaceAll("\\W", "_")
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      s"graft_table_branch$suffix").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Layout.ensurePublishedDir(s, root)(r =>
      protocol(s"$r/main").deletedBatches().contains(3L) &&
        protocol(s"$r/exp").deletedBatches().contains(3L) &&
        fs.exists(branchManifestPath(s"$r/exp"))
    ) { staging =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val main = s"$staging/main"
      val exp = s"$staging/exp"
      initLedgeredTable(ev.filter(col("event_id") % 3 === 0), main)
      appendCommit(ev.filter(col("event_id") % 3 === 1), main, 1L)
      createBranch(s, "main", exp, 1L)
      appendCommitBranch(
        ev.filter(col("event_id") % 3 === 2)
          .withColumn("value", col("value") * 2.0)
          .unionByName(ev.filter(col("event_id") % 6 === 0)
            .withColumn("value", col("value") + 500.0)), exp, 2L)
      deleteCommitBranch(ev.filter(col("event_id") % 7 === 0), exp, 3L)
      // main continues independently AFTER the fork
      appendCommit(ev.filter(col("event_id") % 3 === 2)
        .unionByName(ev.filter(col("event_id") % 6 === 0)
          .withColumn("value", col("value") + 100.0)), main, 2L)
      deleteCommit(ev.filter(col("event_id") % 5 === 0), main, 3L)
    }
    (s"$root/main", s"$root/exp")
  }

  /** Build-if-absent the REPLICA gate fixture: [[mirrorCommits]] from
    * the four-commit ledgered root into a fresh replica — whose four
    * horizons must then read exactly like the source's (`q_table_asof`
    * oracle verbatim).
    */
  def ensureMirroredEvents(s: SparkSession, d: String): String = {
    val suffix = d.replaceAll("\\W", "_")
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      s"graft_table_mirror$suffix").toString
    Layout.ensurePublishedDir(s, root)(r =>
      protocol(r).deletedBatches().contains(3L) &&
        protocol(r).foldedBatches() == Set(1L, 2L)
    ) { staging =>
      mirrorCommits(s, ensureLedgeredEvents(s, d), staging)
    }
    root
  }

  /** Build-if-absent the MERGED-branch gate fixture: main stops at
    * commit 1, `exp` forks there and diverges (the
    * [[ensureBranchedEvents]] branch lifecycle), then a fast-forward
    * merge replays the branch onto main — whose head must now read as
    * the branch head did.
    */
  def ensureMergedBranchEvents(s: SparkSession, d: String): String = {
    val suffix = d.replaceAll("\\W", "_")
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      s"graft_table_brmerge$suffix").toString
    Layout.ensurePublishedDir(s, root)(r =>
      protocol(s"$r/main").deletedBatches().contains(3L) &&
        protocol(s"$r/main").foldedBatches() == Set(1L, 2L)
    ) { staging =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val main = s"$staging/main"
      val exp = s"$staging/exp"
      initLedgeredTable(ev.filter(col("event_id") % 3 === 0), main)
      appendCommit(ev.filter(col("event_id") % 3 === 1), main, 1L)
      createBranch(s, "main", exp, 1L)
      appendCommitBranch(
        ev.filter(col("event_id") % 3 === 2)
          .withColumn("value", col("value") * 2.0)
          .unionByName(ev.filter(col("event_id") % 6 === 0)
            .withColumn("value", col("value") + 500.0)), exp, 2L)
      deleteCommitBranch(ev.filter(col("event_id") % 7 === 0), exp, 3L)
      mergeBranchFF(s, exp)
    }
    s"$root/main"
  }

  /** Visibility of an events key at horizon `h` under the modular
    * commit definitions of [[ensureLedgeredEvents]] — the oracle-side
    * twin of the ledger read, shared by the CDF legs.
    */
  private def cdfVis(h: Int): String =
    s"(event_id % 3 <= ${math.min(h, 2)} AND NOT ($h >= 3 AND event_id % 5 = 0))"

  /** The value a visible key serves at horizon `h` (the b2 upsert
    * flips event_id % 6 = 0 keys to value + 100 from horizon 2 on).
    */
  private def cdfVal(h: Int): String =
    if (h >= 2) "CASE WHEN event_id % 6 = 0 THEN value + 100 ELSE value END"
    else "value"

  /** Whether a key got a new committed version inside window (f, t] —
    * the oracle's update detector (seed writes % 3 = 0 at commit 0,
    * b1 writes % 3 = 1, b2 writes % 3 = 2 plus the % 6 = 0 re-emits).
    */
  private def cdfWroteIn(f: Int, t: Int): String = {
    val cs = Seq(
      if (f < 1 && t >= 1) Some("event_id % 3 = 1") else None,
      if (f < 2 && t >= 2) Some("(event_id % 3 = 2 OR event_id % 6 = 0)")
      else None).flatten
    if (cs.isEmpty) "FALSE" else cs.mkString("(", " OR ", ")")
  }

  /** One window of the `q_table_cdf` oracle: the four change classes
    * derived set-theoretically from the two horizon states — insert =
    * visible at `t` only, delete = visible at `f` only, update = both
    * plus a committed rewrite in the window (pre-image valued at `f`,
    * post-image at `t`) — aggregated per event_type with an id-sum
    * content checksum.
    */
  private def cdfWindowSql(f: Int, t: Int): String = {
    def leg(ct: String, pred: String, v: String) =
      s"""SELECT '${f}_$t' AS win, '$ct' AS change_type, event_type,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum,
         |  CAST(sum(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total
         |FROM (SELECT event_id, event_type, $v AS v FROM events
         |      WHERE $pred)
         |GROUP BY event_type""".stripMargin
    Seq(
      leg("insert", s"${cdfVis(t)} AND NOT ${cdfVis(f)}", cdfVal(t)),
      leg("update_preimage",
        s"${cdfVis(t)} AND ${cdfVis(f)} AND ${cdfWroteIn(f, t)}", cdfVal(f)),
      leg("update_postimage",
        s"${cdfVis(t)} AND ${cdfVis(f)} AND ${cdfWroteIn(f, t)}", cdfVal(t)),
      leg("delete", s"${cdfVis(f)} AND NOT ${cdfVis(t)}", cdfVal(f)))
      .mkString("\nUNION ALL\n")
  }

  /** The windows `q_table_cdf` gates: insert-only (0,1], the full mix
    * (1,3] and (0,3] (the latter exercising intra-window churn — keys
    * inserted at b1 then deleted at d3 must net to NOTHING), and the
    * delete-only (2,3] whose pre-images must carry the UPSERTED
    * value + 100 state, not the original.
    */
  private val CdfWindows = Seq((0, 1), (1, 3), (2, 3), (0, 3))

  /** One horizon of the flagship-as-of oracle: the reference snapshot
    * shape (two typed streams joined on their hour, filtered to the
    * LEFT stream's max hour) recomputed over the horizon's visible
    * rows — insert/upsert/delete visibility injected by the same
    * modular commit definitions as `q_table_asof`.
    */
  private def flagshipHorizonSql(h: Int): String =
    s"""base$h AS (
       |  SELECT event_id, user_id, event_type,
       |    CASE WHEN $h >= 2 AND event_id % 6 = 0
       |         THEN value + 100 ELSE value END AS value,
       |    strftime(ts, '%Y-%m-%d') AS d, strftime(ts, '%H') AS hh
       |  FROM events
       |  WHERE event_id % 3 <= ${math.min(h, 2)}
       |    AND NOT ($h >= 3 AND event_id % 5 = 0)),
       |t$h AS (SELECT d, hh, user_id AS err_user, value AS err_value,
       |          event_id AS err_id
       |        FROM base$h WHERE event_type = 'error'),
       |w$h AS (SELECT d, hh, user_id AS click_user, value AS click_value,
       |          event_id AS click_id
       |        FROM base$h WHERE event_type = 'click'),
       |m$h AS (
       |  SELECT CAST($h AS BIGINT) AS horizon, d, hh,
       |    err_user, err_value, err_id, click_user, click_value, click_id
       |  FROM t$h JOIN w$h USING (d, hh)
       |  WHERE strptime(d || ' ' || hh, '%Y-%m-%d %H') =
       |    (SELECT max(strptime(d || ' ' || hh, '%Y-%m-%d %H'))
       |     FROM t$h))""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // The FLAGSHIP pattern time-traveled: the reference's
    // latest-snapshot query (traffic-only MAX, USING join, F1/J1/J2/A1)
    // served against the ledgered table at every past commit — "the
    // snapshot as of any past hour" the round-15 verdict called out as
    // the free upgrade once base tables speak as-of. The MAX is
    // horizon-scoped (each horizon's newest ERROR hour over its own
    // visible rows), so both WHICH hour is latest and WHAT that hour
    // contains travel with the ledger.
    QuerySpec(
      "q_flagship_asof",
      "WITH " + (0 to 3).map(flagshipHorizonSql).mkString(",\n") + "\n" +
        (0 to 3).map(h => s"SELECT * FROM m$h")
          .mkString("\nUNION ALL ")) { (s, d) =>
      val root = ensureLedgeredEvents(s, d)
      Par.buildAll((0 to 3).toSeq) { h =>
        val base = readEventsAsOf(s, root, h)
          .withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
          .withColumn("hh", date_format(col("ts"), "HH"))
        val t = base.filter(col("event_type") === "error")
          .select(col("d"), col("hh"), col("user_id").as("err_user"),
            col("value").as("err_value"), col("event_id").as("err_id"))
        val w = base.filter(col("event_type") === "click")
          .select(col("d"), col("hh"), col("user_id").as("click_user"),
            col("value").as("click_value"), col("event_id").as("click_id"))
        val hourTs =
          to_timestamp(concat_ws(" ", col("d"), col("hh")), "yyyy-MM-dd HH")
        val mx = t.agg(max(hourTs).as("mts"))
        t.join(w, Seq("d", "hh"), "inner")
          .join(broadcast(mx), hourTs === col("mts"))
          .select(lit(h.toLong).as("horizon"), col("d"), col("hh"),
            col("err_user"), col("err_value"), col("err_id"),
            col("click_user"), col("click_value"), col("click_id"))
      }.reduce(_.unionByName(_))
    },

    // The four-horizon readout: per (horizon, event_type), row count
    // and DECIMAL-exact value total of the table AS OF that commit —
    // insert visibility, the upsert's value+100 flip at horizon 2, and
    // the delete at horizon 3 all land in the aggregates. The oracle
    // recomputes each horizon's visible state from the raw table by
    // the same modular commit definitions.
    QuerySpec(
      "q_table_asof",
      (0 to 3).map(asOfHorizonSql).mkString("\nUNION ALL\n")) { (s, d) =>
      val root = ensureLedgeredEvents(s, d)
      // independent horizons built concurrently (guide §2.6 — the
      // q_table_asof_rename convention: per-horizon ledger listings
      // would otherwise serialize ×4)
      Par.buildAll((0 to 3).toSeq)(asOfHorizonFrame(s, root, _))
        .reduce(_.unionByName(_))
    },

    // Ledger retention: the four-commit table VACUUMED at floor 2 —
    // the surviving horizons (2: post-upsert, 3: post-delete) must
    // keep the UNVACUUMED oracle unchanged (same modular SQL as
    // q_table_asof's h=2,3 branches), proving the resolved c2 dir is
    // value-identical to the per-commit history it replaced. The
    // below-floor refusal and replay exactly-once are pinned in
    // TimeTravelSpec (refusals have no SQL value image).
    QuerySpec(
      "q_table_vacuum",
      (2 to 3).map(asOfHorizonSql).mkString("\nUNION ALL\n")) { (s, d) =>
      val root = ensureVacuumedEvents(s, d)
      (2 to 3).map(asOfHorizonFrame(s, root, _)).reduce(_.unionByName(_))
    },

    // RENAME evolution via column mapping: commit 2 re-binds `value` →
    // `reading` with ONE tiny ledgered mapping row (no data rewrite —
    // the Iceberg/Delta logical-name indirection), and commit 3
    // appends rows in the NEW logical shape onto the same physical
    // column. Horizons straddle the rename: 0–1 serve the old name,
    // 2–3 the new, every horizon reading the same bytes; the measured
    // column's logical name rides in the output so the oracle pins
    // WHICH name each horizon serves, not just the values.
    QuerySpec(
      "q_table_asof_rename",
      (0 to 3).map { h =>
        val wave = Seq(0, 1, 1, 2)(h)
        val name = if (h >= 2) "reading" else "value"
        s"""SELECT CAST($h AS BIGINT) AS horizon, event_type,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total,
           |  '$name' AS value_col
           |FROM events WHERE event_id % 3 <= $wave
           |GROUP BY event_type""".stripMargin
      }.mkString("\nUNION ALL\n")) { (s, d) =>
      val root = ensureRenamedEvents(s, d)
      Par.buildAll((0 to 3).toSeq) { h =>
        val t = readEventsAsOf(s, root, h.toLong)
        val mc = if (t.columns.contains("reading")) "reading" else "value"
        t.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col(mc).cast("decimal(12,2)")).cast("double").as("total"))
          .select(lit(h.toLong).as("horizon"), col("event_type"),
            col("n"), col("total"), lit(mc).as("value_col"))
      }.reduce(_.unionByName(_))
    },

    // Schema evolution on a ledgered table: commit 2 ADDS a `score`
    // column (inserting the last third and upserting the % 6 = 0 keys
    // to fill it). Horizons straddle the change: 0–1 serve the
    // original five-column shape (width 5, no score to count), 2 the
    // widened one (width 6) with exactly the insert+upsert rows
    // scored and everything else NULL — add-column semantics, not a
    // backfill.
    QuerySpec(
      "q_table_asof_schema",
      (0 to 2).map { h =>
        val width = if (h >= 2) 6 else 5
        val scored =
          if (h >= 2)
            """CAST(count(CASE WHEN event_id % 3 = 2 OR event_id % 6 = 0
              |             THEN 1 END) AS BIGINT) AS scored,
              |  CAST(sum(CASE WHEN event_id % 3 = 2 OR event_id % 6 = 0
              |           THEN CAST(value * 2 AS DECIMAL(12,2)) END)
              |    AS DOUBLE) AS total_score""".stripMargin
          else
            "CAST(0 AS BIGINT) AS scored,\n" +
              "  CAST(NULL AS DOUBLE) AS total_score"
        s"""SELECT CAST($h AS BIGINT) AS horizon,
           |  CAST($width AS BIGINT) AS width,
           |  CAST(count(*) AS BIGINT) AS n,
           |  $scored
           |FROM events WHERE event_id % 3 <= ${math.min(h, 2)}""".stripMargin
      }.mkString("\nUNION ALL\n")) { (s, d) =>
      val root = ensureEvolvedEvents(s, d)
      Par.buildAll((0 to 2).toSeq) { h =>
        val t = readEventsAsOf(s, root, h.toLong)
        val scored =
          if (t.columns.contains("score"))
            Seq(count(col("score")).as("scored"),
              sum(col("score").cast("decimal(12,2)"))
                .cast("double").as("total_score"))
          else
            Seq(lit(0L).as("scored"),
              lit(null).cast("double").as("total_score"))
        t.agg(count(lit(1)).as("n"), scored: _*)
          .select(lit(h.toLong).as("horizon"),
            lit(t.columns.length.toLong).as("width"),
            col("n"), col("scored"), col("total_score"))
      }.reduce(_.unionByName(_))
    },

    // DESCRIBE HISTORY as a query: one row per ledgered commit —
    // kind (seed / append / delete), row count and an id-sum content
    // checksum read from the commit's OWN dir (the ledger's dirs ARE
    // the history; no log replay, one footer-bounded aggregate per
    // commit). The operational readout every lakehouse exposes; the
    // oracle recomputes each commit's content from the modular
    // definitions.
    QuerySpec(
      "q_table_history",
      """SELECT CAST(0 AS BIGINT) AS commit_id, 'seed' AS kind,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM events WHERE event_id % 3 = 0
        |UNION ALL
        |SELECT 1, 'append', CAST(count(*) AS BIGINT),
        |  CAST(sum(event_id) AS BIGINT)
        |FROM events WHERE event_id % 3 = 1
        |UNION ALL
        |SELECT 2, 'append', CAST(count(*) AS BIGINT),
        |  CAST(sum(event_id) AS BIGINT)
        |FROM events WHERE event_id % 3 = 2 OR event_id % 6 = 0
        |UNION ALL
        |SELECT 3, 'delete', CAST(count(*) AS BIGINT),
        |  CAST(sum(event_id) AS BIGINT)
        |FROM events WHERE event_id % 5 = 0""".stripMargin) { (s, d) =>
      val root = ensureLedgeredEvents(s, d)
      val p = protocol(root)
      def name(dir: String) = dir.substring(dir.lastIndexOf('/') + 1)
      def kindOf(n: String) =
        if (n == "seed") "seed"
        else if (n.startsWith("b")) "append"
        else if (n.startsWith("d")) "delete"
        else "compact"
      val dirs = p.committedDirsOrEmpty("data") ++
        p.committedDirsOrEmpty("tombstones")
      dirs.map { dir =>
        val n = name(dir)
        // the commit id is the dir's OWN ledger id — NOT dirOrd, which
        // deliberately orders d-dirs at 0 for tombstone scoping
        val id = if (n.matches("[bcd]\\d+")) n.drop(1).toLong else 0L
        s.read.parquet(dir)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("event_id")).as("id_sum"))
          .select(lit(id).as("commit_id"),
            lit(kindOf(n)).as("kind"), col("n_rows"), col("id_sum"))
      }.reduce(_.unionByName(_))
    },

    // Change data feed: the net-effect diff between two ledger
    // horizons, classified insert / update_preimage / update_postimage
    // / delete — read from ONLY the window's commit dirs + tombstone
    // batches plus one key-scoped probe of the start state (the
    // ledger's b-dirs double as stored change files; no two-snapshot
    // diff). Four windows cover insert-only, the full mix, delete-only
    // with UPSERTED pre-images, and intra-window churn (inserted-then-
    // deleted keys must net to nothing). Aggregated per (window,
    // change class, event_type) with an id-sum content checksum and
    // DECIMAL-exact value totals; the oracle derives each class
    // set-theoretically from the two horizon states.
    QuerySpec(
      "q_table_cdf",
      CdfWindows.map { case (f, t) => cdfWindowSql(f, t) }
        .mkString("\nUNION ALL\n")) { (s, d) =>
      val root = ensureLedgeredEvents(s, d)
      Par.buildAll(CdfWindows) { case (f, t) =>
        changesBetween(s, root, f.toLong, t.toLong)
          .groupBy(col("_change_type"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("event_id")).as("id_sum"),
            sum(col("value").cast("decimal(12,2)"))
              .cast("double").as("total"))
          .select(lit(s"${f}_$t").as("win"),
            col("_change_type").as("change_type"), col("event_type"),
            col("n"), col("id_sum"), col("total"))
      }.reduce(_.unionByName(_))
    },

    // Incremental view maintenance OFF the change feed: a per-type
    // (count, DECIMAL-exact total) aggregate maintained from horizon 1
    // to horizon 3 by applying changesBetween(1, 3) — inserts and
    // update post-images add, deletes and update pre-images subtract —
    // must land bit-identical to the from-scratch horizon-3 aggregate
    // (both emitted, labeled 'incr'/'full'; the oracle computes the
    // horizon-3 state once under both labels). At 100 TB this is WHY
    // the feed exists: refreshing a downstream aggregate costs the
    // delta plus one key-scoped base probe instead of a full rescan.
    QuerySpec(
      "q_incr_agg_cdf",
      Seq("incr", "full").map(lbl =>
        s"""SELECT '$lbl' AS path, event_type,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total
           |FROM (SELECT event_type, ${cdfVal(3)} AS v FROM events
           |      WHERE ${cdfVis(3)})
           |GROUP BY event_type""".stripMargin)
        .mkString("\nUNION ALL\n")) { (s, d) =>
      val root = ensureLedgeredEvents(s, d)
      val base = readEventsAsOf(s, root, 1L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("bn"),
          sum(col("value").cast("decimal(12,2)")).as("bt"))
      val sign = when(
        col("_change_type").isin("insert", "update_postimage"), 1)
        .otherwise(-1)
      val delta = changesBetween(s, root, 1L, 3L)
        .groupBy(col("event_type"))
        .agg(sum(when(col("_change_type") === "insert", 1L)
            .when(col("_change_type") === "delete", -1L)
            .otherwise(0L)).as("dn"),
          sum((col("value").cast("decimal(12,2)") * sign)
            .cast("decimal(22,2)")).as("dt"))
      val zero = lit(0).cast("decimal(22,2)")
      val incr = base.join(delta, Seq("event_type"), "full_outer")
        .select(lit("incr").as("path"), col("event_type"),
          (coalesce(col("bn"), lit(0L)) +
            coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("bt").cast("decimal(22,2)"), zero) +
            coalesce(col("dt"), zero)).cast("double").as("total"))
        .filter(col("n") > 0)
      val full = readEventsAsOf(s, root, 3L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)"))
            .cast("double").as("total"))
        .select(lit("full").as("path"), col("event_type"),
          col("n"), col("total"))
      incr.unionByName(full)
    },

    // Zero-copy BRANCHING: `exp` forks off `main` at commit 1 with one
    // manifest write (no data copied — base dirs referenced in
    // place), then the two lines diverge: the branch upserts %6=0 to
    // value+500 and inserts the %3=2 wave DOUBLED, deletes %7=0; main
    // runs its standard +100/delete-%5 lifecycle. Four readouts pin
    // the isolation: the shared pre-fork history served THROUGH the
    // branch (base@1), both branch horizons (divergent values +
    // branch-only deletes), and main's head — untouched by anything
    // the branch did. A base vacuum above the fork refuses branch
    // reads (spec-pinned; refusals have no SQL image).
    QuerySpec(
      "q_table_branch", {
        def leg(ref: String, h: Int, pred: String, v: String) =
          s"""SELECT '$ref' AS ref, CAST($h AS BIGINT) AS horizon,
             |  event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(event_id) AS BIGINT) AS id_sum,
             |  CAST(sum(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM (SELECT event_id, event_type, $v AS v FROM events
             |      WHERE $pred)
             |GROUP BY event_type""".stripMargin
        val branchV =
          """CASE WHEN event_id % 6 = 0 THEN value + 500
            |       WHEN event_id % 3 = 2 THEN value * 2
            |       ELSE value END""".stripMargin
        Seq(
          leg("base", 1, "event_id % 3 <= 1", "value"),
          leg("branch", 2, "TRUE", branchV),
          leg("branch", 3, "NOT event_id % 7 = 0", branchV),
          leg("main", 3, "NOT event_id % 5 = 0",
            "CASE WHEN event_id % 6 = 0 THEN value + 100 ELSE value END"))
          .mkString("\nUNION ALL\n")
      }) { (s, d) =>
      val (main, exp) = ensureBranchedEvents(s, d)
      def agg(df: DataFrame, ref: String, h: Int): DataFrame =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"),
            sum(col("value").cast("decimal(12,2)"))
              .cast("double").as("total"))
          .select(lit(ref).as("ref"), lit(h.toLong).as("horizon"),
            col("event_type"), col("n"), col("id_sum"), col("total"))
      agg(readEventsAsOfBranch(s, exp, 1L), "base", 1)
        .unionByName(agg(readEventsAsOfBranch(s, exp, 2L), "branch", 2))
        .unionByName(agg(readEventsAsOfBranch(s, exp, 3L), "branch", 3))
        .unionByName(agg(readEventsAsOf(s, main, 3L), "main", 3))
    },

    // Incremental REPLICATION: the four-commit table replayed onto a
    // fresh replica through mirrorCommits (the ledger as the change
    // feed — seed copy + per-commit re-lands under the same ids), so
    // the replica is horizon-preserving: all four as-of readouts must
    // match the SOURCE's oracle verbatim. Idempotent resume, count
    // accounting and the vacuumed-src refusal are spec-pinned.
    QuerySpec(
      "q_table_mirror",
      (0 to 3).map(asOfHorizonSql).mkString("\nUNION ALL\n")) { (s, d) =>
      val root = ensureMirroredEvents(s, d)
      // concurrent horizons — the q_table_asof note
      Par.buildAll((0 to 3).toSeq)(asOfHorizonFrame(s, root, _))
        .reduce(_.unionByName(_))
    },

    // FAST-FORWARD branch merge: main froze at the fork, the branch
    // diverged (+500 upserts, doubled %3=2 inserts, %7=0 deletes),
    // and the merge replayed it onto main under the same ids — main's
    // three horizons must now read as the branch's did (shared
    // history below the fork included). The diverged-base refusal and
    // merge idempotency are spec-pinned.
    QuerySpec(
      "q_table_branch_merge", {
        val branchV =
          """CASE WHEN event_id % 6 = 0 THEN value + 500
            |       WHEN event_id % 3 = 2 THEN value * 2
            |       ELSE value END""".stripMargin
        Seq(
          (1, "event_id % 3 <= 1", "value"),
          (2, "TRUE", branchV),
          (3, "NOT event_id % 7 = 0", branchV)).map { case (h, pred, v) =>
          s"""SELECT CAST($h AS BIGINT) AS horizon, event_type,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(event_id) AS BIGINT) AS id_sum,
             |  CAST(sum(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM (SELECT event_id, event_type, $v AS v FROM events
             |      WHERE $pred)
             |GROUP BY event_type""".stripMargin
        }.mkString("\nUNION ALL\n")
      }) { (s, d) =>
      val main = ensureMergedBranchEvents(s, d)
      Par.buildAll((1 to 3).toSeq) { h =>
        readEventsAsOf(s, main, h.toLong)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"),
            sum(col("value").cast("decimal(12,2)"))
              .cast("double").as("total"))
          .select(lit(h.toLong).as("horizon"), col("event_type"),
            col("n"), col("id_sum"), col("total"))
      }.reduce(_.unionByName(_))
    },

    // The change feed on a BRANCH, fork-aware: window (0,2] crosses
    // the fork (the base's b1 appends next to the branch's divergent
    // b2 — and the MAIN line's own post-fork commits must NOT leak
    // in), (1,3] is branch-only (its divergent upserts, doubled
    // inserts and %7 deletes), and (2,3] is delete-only with
    // pre-images carrying the BRANCH-updated state (+500 / doubled) —
    // the replica-of-a-branch consumer pattern, oracled from the
    // branch's own modular visibility/value definitions.
    QuerySpec(
      "q_table_branch_cdf", {
        def vis(h: Int) = {
          val w = h match {
            case 0 => "event_id % 3 = 0"
            case 1 => "event_id % 3 <= 1"
            case _ => "TRUE"
          }
          if (h >= 3) s"($w AND NOT event_id % 7 = 0)" else s"($w)"
        }
        def v(h: Int) =
          if (h >= 2)
            """CASE WHEN event_id % 6 = 0 THEN value + 500
              |       WHEN event_id % 3 = 2 THEN value * 2
              |       ELSE value END""".stripMargin
          else "value"
        def wrote(f: Int, t: Int) = {
          val cs = Seq(
            if (f < 1 && t >= 1) Some("event_id % 3 = 1") else None,
            if (f < 2 && t >= 2)
              Some("(event_id % 3 = 2 OR event_id % 6 = 0)")
            else None).flatten
          if (cs.isEmpty) "FALSE" else cs.mkString("(", " OR ", ")")
        }
        def leg(f: Int, t: Int, ct: String, pred: String, vv: String) =
          s"""SELECT '${f}_$t' AS win, '$ct' AS change_type, event_type,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(event_id) AS BIGINT) AS id_sum,
             |  CAST(sum(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM (SELECT event_id, event_type, $vv AS v FROM events
             |      WHERE $pred)
             |GROUP BY event_type""".stripMargin
        Seq((0, 2), (1, 3), (2, 3)).map { case (f, t) =>
          Seq(
            leg(f, t, "insert", s"${vis(t)} AND NOT ${vis(f)}", v(t)),
            leg(f, t, "update_preimage",
              s"${vis(t)} AND ${vis(f)} AND ${wrote(f, t)}", v(f)),
            leg(f, t, "update_postimage",
              s"${vis(t)} AND ${vis(f)} AND ${wrote(f, t)}", v(t)),
            leg(f, t, "delete", s"${vis(f)} AND NOT ${vis(t)}", v(f)))
            .mkString("\nUNION ALL\n")
        }.mkString("\nUNION ALL\n")
      }) { (s, d) =>
      val (_, exp) = ensureBranchedEvents(s, d)
      // independent windows built concurrently (the q_table_cdf note —
      // each window's construction runs ledger listings that would
      // otherwise serialize ×3, guide §2.6)
      Par.buildAll(Seq((0, 2), (1, 3), (2, 3))) { case (f, t) =>
        changesBetweenBranch(s, exp, f.toLong, t.toLong)
          .groupBy(col("_change_type"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"),
            sum(col("value").cast("decimal(12,2)"))
              .cast("double").as("total"))
          .select(lit(s"${f}_$t").as("win"),
            col("_change_type").as("change_type"), col("event_type"),
            col("n"), col("id_sum"), col("total"))
      }.reduce(_.unionByName(_))
    }
  )
}
