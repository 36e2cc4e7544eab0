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
    "event_id BIGINT, event_type STRING, value DOUBLE, _commit INT"

  private[graft] def protocol(path: String) =
    new graft.index.FoldProtocol(path, "_table_ledger")

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
    Layout.ensurePublishedDir(s, root)(
      r => protocol(r).deletedBatches().contains(3L)
    ) { staging =>
      val p = protocol(staging)
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      def land(rows: DataFrame, sub: String, commit: Int): Unit =
        rows.withColumn("_commit", lit(commit))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"${p.dir("data")}/$sub")
      land(ev.filter(col("event_id") % 3 === 0), "seed", 0)
      p.fold(1L, Seq("data")) {
        land(ev.filter(col("event_id") % 3 === 1), "b1", 1)
      }
      p.fold(2L, Seq("data")) {
        land(ev.filter(col("event_id") % 3 === 2)
          .unionByName(ev.filter(col("event_id") % 6 === 0)
            .withColumn("value", col("value") + 100.0)), "b2", 2)
      }
      p.delete(3L) {
        p.stageTombstones(
          ev.filter(col("event_id") % 5 === 0).select(col("event_id")),
          "event_id", 3L)
      }
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
      .agg(max(struct(col("_commit"), col("event_type"), col("value")))
        .as("v"))
      .select(col("event_id"), col("v.event_type").as("event_type"),
        col("v.value").as("value"))

  val specs: Seq[QuerySpec] = Seq(

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
