package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + domain keys — the web-native front of the
  * pipeline (crawl dedup by canonical URL, per-domain quotas, domain
  * blocklists, and host-locality layout all key on these columns, and at
  * crawl scale URL-level dedup runs BEFORE any content op because it
  * needs no page bytes).
  *
  * Canonical form (each rule deterministic, order fixed):
  *   1. fragment dropped;
  *   2. scheme and host lowercased;
  *   3. default port stripped (http:80, https:443) — non-default ports
  *      and mismatched scheme/port pairs kept;
  *   4. tracking params dropped (`utm_*`, `fbclid`), `?` dropped when the
  *      query empties; non-tracking params kept in original order
  *      (reordering would conflate distinct resources);
  *   5. empty path → `/`, trailing slash stripped from non-root paths.
  *
  * Built ONLY from split/substr/lower/list ops whose semantics are
  * identical in Spark and DuckDB (no parse_url, no regex class
  * divergence), so the q_url oracle replays every rule verbatim. All
  * expressions are codegen'd column ops — zero shuffle, map-side.
  *
  * Preconditions (documented, fixture-guaranteed): absolute URLs with
  * exactly one `://`. `registeredDomain` is the public-suffix-LITE rule
  * (last two host labels) — a real deployment swaps in the PSL table as
  * a broadcast join; the column contract is unchanged.
  */
object UrlOps {

  private def beforeFirst(c: Column, d: String) = substring_index(c, d, 1)

  /** Canonical URL per the five rules above. */
  def canonicalize(url: Column): Column = {
    val noFrag = beforeFirst(url, "#")
    val scheme = lower(beforeFirst(noFrag, "://"))
    val rest = substring_index(noFrag, "://", -1)
    // authority ends at the first '/' OR '?' (query can follow the host
    // directly: https://a.org?id=1)
    val hostport = beforeFirst(beforeFirst(rest, "/"), "?")
    val pathq = rest.substr(length(hostport) + 1, length(rest))
    val path0 = beforeFirst(pathq, "?")
    val query0 = pathq.substr(length(path0) + 2, length(pathq))
    val hp0 = beforeFirst(hostport, ":")
    val host = lower(hp0)
    val port = hostport.substr(length(hp0) + 2, length(hostport))
    val portPart = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val keptQ = array_join(filter(split(query0, "&"),
      p => !(substring(p, 1, 4) === "utm_" || beforeFirst(p, "=") === "fbclid")),
      "&")
    val qPart = when(keptQ === "", lit("")).otherwise(concat(lit("?"), keptQ))
    val cPath = when(path0 === "", lit("/"))
      .when(length(path0) > 1 && path0.substr(length(path0), lit(1)) === "/",
        path0.substr(lit(1), length(path0) - 1))
      .otherwise(path0)
    concat(scheme, lit("://"), host, portPart, cPath, qPart)
  }

  /** Lowercased host of a CANONICAL url (scheme already lowered, port
    * possibly present). */
  def hostOf(canonUrl: Column): Column =
    beforeFirst(beforeFirst(substring_index(canonUrl, "://", -1), "/"), ":")

  /** Public-suffix-lite registered domain: last two host labels (the
    * whole host when it has fewer). */
  def registeredDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    when(size(parts) < 2, host)
      .otherwise(array_join(slice(parts, -2, 2), "."))
  }

  /** Reversed-host locality key (org.example.www) — range-partitioning on
    * it co-locates a site's pages. */
  def hostReversed(host: Column): Column =
    array_join(reverse(split(host, "\\.")), ".")

  /** url → (canon_url, host, registered_domain, host_rev) appended. */
  def urlStats(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val withCanon = df.withColumn("canon_url", canonicalize(col(urlCol)))
    withCanon.withColumn("host", hostOf(col("canon_url")))
      .withColumn("registered_domain", registeredDomain(col("host")))
      .withColumn("host_rev", hostReversed(col("host")))
  }

  /** URL-level dedup: first-crawled row per canonical URL wins
    * (min warc_ts, doc_id tie-break) — the crawl-side dedup that runs
    * before any content is fetched into the pipeline. One
    * map-side-combinable groupBy + equi-join, no window funnel. */
  def dedupByCanonUrl(pages: DataFrame, tsCol: String = "warc_ts",
                      idCol: String = "doc_id"): DataFrame = {
    val withCanon = pages.withColumn("canon_url", canonicalize(col("url")))
    val winners = withCanon.groupBy("canon_url")
      .agg(min(struct(col(tsCol), col(idCol))).as("w"))
      .select(col("canon_url"), col(s"w.$idCol").as(idCol))
    withCanon.join(winners, Seq("canon_url", idCol), "left_semi")
  }
}
