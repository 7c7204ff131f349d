package graft.pipeline

import org.apache.spark.sql.types._

/** Typed config + schemas for the reference-parity pipeline.
  *
  * Mirrors the observable I/O contracts of the reference (FIXTURES.md;
  * citations into /root/reference): query descriptors
  * (`src/config.py.default:31-40`), the bulk-search row shape
  * (`src/Datalake2Anomali.py:297-300,342-375`), advisories
  * (`src/Datalake2Anomali.py:422-437`) and the tipreport models
  * (`src/models.py:6-19`).
  */
object Model {

  /** One configured Datalake query (the dimension table for join J1).
    * `anomali_itype` is the per-query override map (J3). */
  case class QueryDescriptor(
      query_hash: String,
      dataset_name: String,
      anomali_severity: String,
      anomali_itype: Map[String, String] = Map.empty)

  /** Engine config — field-for-field the reference's config surface
    * (`src/config.py.default`). Divergence (documented in SURVEY §7.3):
    * `expirationHours` is honored; the reference hard-codes 1h and
    * ignores its own `anomali_expiration_period`
    * (`src/Datalake2Anomali.py:62` vs `src/config.py.default:20`). */
  case class PipelineConfig(
      anomaliClassification: String = "private",
      defaultItype: Map[String, String] = Map(
        "domain" -> "suspicious_domain",
        "srcip" -> "actor_ip",
        "url" -> "suspicious_url",
        "email" -> "suspicious_email",
        "md5" -> "mal_md5"),
      tagsTlp: String = "white",
      expirationHours: Int = 1,
      runAsCron: Boolean = false,
      uploadFrequencyHours: Int = 1,
      addDtlTags: Boolean = false,
      datalakeQueries: Seq[QueryDescriptor] = Nil,
      /** Greedy sink batch bound in serialized bytes (K1). */
      maxPayloadBytes: Long = 1L << 20,
      /** Transport config (`ssl_verify` / `proxies`,
        * `src/config.py.default:46-50`) — applied UNIFORMLY to every
        * endpoint via [[httpConf]], unlike the reference which passes
        * them to 1 of its 4 call sites. */
      sslVerify: Boolean = true,
      proxyHost: Option[String] = None,
      proxyPort: Int = 3128) {
    /** The one [[Http.Conf]] every connector built from this config
      * shares. */
    def httpConf: Http.Conf = Http.Conf(
      tlsVerify = sslVerify, proxyHost = proxyHost, proxyPort = proxyPort)
  }

  /** Decoded bulk-search row: the positional `threat[0..4]` list
    * (`src/Datalake2Anomali.py:342-375`) with names, tagged by its
    * originating query (the connector adds `query_hash`, turning the
    * reference's join-by-list-position J1 into an equi-join). */
  case class IocRow(
      query_hash: String,
      atom_type: String,
      atom_value: String,
      hashes_md5: Option[String],
      threat_scores: Seq[Int],
      threat_tags: Seq[String] = Nil)

  val iocRowSchema: StructType = StructType(Seq(
    StructField("query_hash", StringType, nullable = false),
    StructField("atom_type", StringType, nullable = false),
    StructField("atom_value", StringType, nullable = false),
    StructField("hashes_md5", StringType, nullable = true),
    StructField("threat_scores", ArrayType(IntegerType), nullable = false),
    StructField("threat_tags", ArrayType(StringType), nullable = true)))

  /** WorldWatch advisory after html enrichment (S2 + S5). */
  case class Advisory(
      id: Long,
      title: String,
      tags: Seq[String],
      timestamp_created: String,
      timestamp_updated: String,
      html: String)

  /** Sink-state row for the MERGE probe (S3: one row per existing
    * tipreport, keyed by the world_watch_{id} tag). */
  case class TipReportState(ww_id: Long, tip_id: Long, modified_ts: String)
}
