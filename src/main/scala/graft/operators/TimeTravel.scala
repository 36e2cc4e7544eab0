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

  /** The events table exactly as it stood after ledger commit `asOf`:
    * committed dirs and delete batches ≤ the horizon (fold-protocol
    * as-of read), then per-key resolution to the highest committed
    * version via one struct-max aggregate.
    */
  def readEventsAsOf(s: SparkSession, root: String, asOf: Long): DataFrame =
    protocol(root)
      .readCommittedStrippedAsOf(s, "data", "event_id", asOf)(r =>
        s.read.schema(DataSchema).parquet(r))
      .groupBy(col("event_id"))
      .agg(max(struct(col("_commit"), col("ts"), col("user_id"),
        col("event_type"), col("value"))).as("v"))
      .select(col("event_id"), col("v.ts").as("ts"),
        col("v.user_id").as("user_id"),
        col("v.event_type").as("event_type"),
        col("v.value").as("value"))

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
      (0 to 3).map { h =>
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
      (0 to 3).map { h =>
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
      }.mkString("\nUNION ALL\n")) { (s, d) =>
      val root = ensureLedgeredEvents(s, d)
      (0 to 3).map { h =>
        readEventsAsOf(s, root, h)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)"))
              .cast("double").as("total_value"))
          .select(lit(h.toLong).as("horizon"), col("event_type"),
            col("n"), col("total_value"))
      }.reduce(_.unionByName(_))
    }
  )
}
