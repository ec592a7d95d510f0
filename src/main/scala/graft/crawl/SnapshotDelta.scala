package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl snapshot diffing — per-URL verdicts between two crawl rounds.
  *
  * A continuous crawler (the reference's whole premise — README.md:2-11,
  * and the CommonCrawl monthly-snapshot model its `CommonCrawlFetcher`
  * consumes) keeps re-capturing the same key space; the first question
  * every downstream asks of two rounds is "what actually changed?".
  * The reference answers it implicitly, one URL at a time, through the
  * crawl DB's state merge (`urldb/DefaultUrlStateMerger.java:42`); this
  * operator answers it as a set operation over whole snapshots — the
  * form an incremental corpus build wants: recrawl/refresh only the
  * CHANGED verdicts ([[RevisitPolicy]] consumes capture history; the
  * delta feeds it only the URLs worth re-scoring), re-ingest only
  * ADDED ∪ CHANGED ([[graft.operators.CorpusIngest]]'s batch), retire
  * GONE from the standing stores.
  *
  * Verdicts, keyed on the snapshot key (SURT / normalized URL / doc id):
  *  - `ADDED`     — present only in the new snapshot
  *  - `GONE`      — present only in the old snapshot
  *  - `CHANGED`   — present in both, content digest differs
  *  - `UNCHANGED` — present in both, same digest (timestamps may move;
  *                  content identity is digest-defined, the CDX
  *                  convention)
  *
  * Scale shape: ONE full-outer equi-join on the key — both sides shuffle
  * once on the key they are naturally keyed by, then every verdict is a
  * map-side projection. Snapshots persisted through
  * [[graft.operators.CorpusLayout.writeBucketed]] on the key column join
  * exchange-free (the q108 plan shape), which is the 100 TB posture:
  * monthly snapshots are written bucketed once and every subsequent
  * delta is a zero-shuffle zip of co-bucketed files. Inputs must be
  * key-unique per snapshot (a snapshot IS a keyed state image; CDX
  * multi-capture logs reduce to latest-capture-per-key first — that is
  * [[RevisitPolicy]]'s input shape, not this one's).
  */
object SnapshotDelta {

  /** Diff two snapshots. Output: (key, verdict, old_digest, new_digest,
    * old_ts, new_ts) — one row per key in either snapshot; absent-side
    * digest/ts columns are null.
    */
  def delta(
      oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, digestCol: String, tsCol: String): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("key"),
      col(digestCol).as("old_digest"), col(tsCol).as("old_ts"))
    val n = newSnap.select(col(keyCol).as("key"),
      col(digestCol).as("new_digest"), col(tsCol).as("new_ts"))
    o.join(n, Seq("key"), "full_outer")
      .withColumn("verdict",
        when(col("old_digest").isNull, lit("ADDED"))
          .when(col("new_digest").isNull, lit("GONE"))
          .when(col("old_digest") === col("new_digest"), lit("UNCHANGED"))
          .otherwise(lit("CHANGED")))
      .select(col("key"), col("verdict"), col("old_digest"),
        col("new_digest"), col("old_ts"), col("new_ts"))
  }

  /** [[delta]] fed straight from two rounds' CDX sidecars
    * ([[graft.sources.CdxLookup.allEntries]]): each side is first
    * reduced to its LATEST capture per SURT key (max (ts, digest) — the
    * 14-digit fixed-width timestamp makes lexicographic = chronological),
    * which is the keyed state image [[delta]] requires; the content
    * digest the writer recorded ([[graft.sinks.Sinks.cdxIndex]]) is the
    * change fingerprint. This is the whole-archive diff of two crawl
    * rounds with no state but the sidecars themselves.
    */
  def fromCdx(oldEntries: DataFrame, newEntries: DataFrame): DataFrame = {
    def latest(e: DataFrame) = e
      .groupBy(col("surt"))
      .agg(max(struct(col("ts"), col("digest"))).as("cap"))
      .select(col("surt"), col("cap.digest").as("digest"),
        col("cap.ts").as("ts"))
    delta(latest(oldEntries), latest(newEntries), "surt", "digest", "ts")
  }

  /** The delta's summary row — (verdict, n_urls) — the four counters a
    * crawl round reports (and alerts on: a GONE spike means a dead
    * sitemap or a collapsed host, an UNCHANGED collapse means the
    * revisit policy is over-fetching). One hash aggregate over the
    * delta's projection.
    */
  def deltaStats(d: DataFrame): DataFrame =
    d.groupBy(col("verdict")).agg(count(lit(1)).as("n_urls"))

  /** The recrawl feed: keys a continuous pipeline acts on — ADDED and
    * CHANGED rows (new content to fetch/ingest), with the new snapshot's
    * digest and timestamp. GONE handling (store retirement) is a
    * separate, slower-cadence decision; UNCHANGED is noise by
    * construction.
    */
  def toIngest(d: DataFrame): DataFrame =
    d.filter(col("verdict").isin("ADDED", "CHANGED"))
      .select(col("key"), col("verdict"), col("new_digest"),
        col("new_ts"))
}
