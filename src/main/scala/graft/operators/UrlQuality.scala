package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-shape quality filtering — the RefinedWeb/C4 "URL filtering" stage
  * that runs BEFORE any content is fetched or scored: spam/SEO/trap URLs
  * advertise themselves structurally (calendar traps and session IDs are
  * digit-heavy, faceted-search traps are parameter-heavy, keyword-stuffed
  * hosts pile up subdomain labels). The reference filters URLs only by
  * validity/domain (ValidUrlsFilter); a training-data crawl also wants
  * this cheap shape gate at frontier-insertion time, where dropping a URL
  * costs nothing and fetching it costs a request plus downstream
  * processing.
  *
  * All features are integers (counts and a fixed-point percent), so the
  * whole frame is engine-exact and oracle-hashable. Scale shape: pure
  * projection — no shuffle at any frontier size; compose with
  * [[gate]]'s filter or the frontier's insert path.
  */
object UrlQuality {

  private def host(u: Column): Column =
    regexp_extract(u, "^[a-z]+://([^/?#]+)", 1)
  private def path(u: Column): Column =
    regexp_extract(u, "^[a-z]+://[^/?#]+([^?#]*)", 1)
  private def query(u: Column): Column =
    regexp_extract(u, "\\?([^#]*)", 1)

  /** Per-URL structural features: length, host label count, path depth
    * (non-empty segments), query parameter count, digit percentage of
    * the whole URL (fixed-point, `100·digits div len`).
    */
  def features(df: DataFrame, urlCol: String): DataFrame =
    df.select(col(urlCol).as("url"),
        host(col(urlCol)).as("h"), path(col(urlCol)).as("p"),
        query(col(urlCol)).as("q"))
      .select(col("url"),
        length(col("url")).cast("long").as("url_len"),
        size(split(col("h"), "\\.")).cast("long").as("n_host_labels"),
        size(expr("filter(split(p, '/'), x -> x != '')")).cast("long")
          .as("path_depth"),
        when(col("q") === "", 0L)
          .otherwise(size(split(col("q"), "&")).cast("long")).as("n_params"),
        expr("(100 * length(regexp_replace(url, '[^0-9]', '')))" +
          " div greatest(length(url), 1)").as("digit_pct"))

  /** Drop URLs whose shape exceeds any threshold — the insert-time gate.
    * Defaults follow the common web-pipeline heuristics (deep paths,
    * parameter explosions, and digit-dominated URLs are trap-shaped).
    * Every feature is row-local, so this is a pure filter — unlike the
    * aggregation-backed gates (blocklist, stratum), no join is ever
    * needed and the frontier is scanned exactly once.
    */
  def gate(
      df: DataFrame, urlCol: String,
      maxDepth: Long = 8, maxParams: Long = 4,
      maxDigitPct: Long = 40, maxLen: Long = 512): DataFrame = {
    val u = col(urlCol)
    val q = query(u)
    val depth =
      size(expr(s"filter(split(regexp_extract($urlCol," +
        " '^[a-z]+://[^/?#]+([^?#]*)', 1), '/'), x -> x != '')"))
    val nParams = when(q === "", 0L).otherwise(size(split(q, "&")).cast("long"))
    val digitPct = expr(s"(100 * length(regexp_replace($urlCol," +
      s" '[^0-9]', ''))) div greatest(length($urlCol), 1)")
    df.filter(depth <= maxDepth && nParams <= maxParams &&
      digitPct <= maxDigitPct && length(u) <= maxLen)
  }
}
