package graft.pipeline

import Model._

/** Typed config loading (S6): the reference's `config.py` +
  * env-var credentials (`src/config.py.default`,
  * `src/Datalake2Anomali.py:268-269`) become one JSON document parsed
  * into [[Model.PipelineConfig]] — declared, validated, and testable
  * instead of an imported Python module. Unknown keys are ignored;
  * missing keys take the reference's defaults. */
object ConfigLoader {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  def fromJson(json: String): PipelineConfig = {
    val j = JsonMethods.parse(json)
    def str(path: String, dflt: String): String =
      (j \ path) match { case JString(s) => s; case _ => dflt }
    def int(path: String, dflt: Int): Int =
      (j \ path) match { case JInt(i) => i.toInt; case _ => dflt }
    def bool(path: String, dflt: Boolean): Boolean =
      (j \ path) match { case JBool(b) => b; case _ => dflt }
    def strMap(v: JValue): Map[String, String] = v match {
      case JObject(fields) => fields.collect {
        case (k, JString(s)) => k -> s
      }.toMap
      case _ => Map.empty
    }
    val dfltItype = PipelineConfig().defaultItype
    val queries = (j \ "datalake_queries") match {
      case JArray(qs) => qs.map { q =>
        QueryDescriptor(
          query_hash = (q \ "query_hash") match { case JString(s) => s; case _ => null },
          dataset_name = (q \ "dataset_name") match { case JString(s) => s; case _ => null },
          anomali_severity = (q \ "anomali_severity") match { case JString(s) => s; case _ => null },
          anomali_itype = strMap(q \ "anomali_itype"))
      }
      case _ => Nil
    }
    val proxy = parseProxies(j \ "proxies")
    PipelineConfig(
      anomaliClassification = str("anomali_classification", "private"),
      defaultItype = (j \ "default_itype") match {
        case o: JObject => strMap(o); case _ => dfltItype
      },
      tagsTlp = str("tags_tlp", "white"),
      expirationHours = int("anomali_expiration_period", 1),
      runAsCron = bool("run_as_cron", false),
      uploadFrequencyHours = int("upload_frequency", 1),
      addDtlTags = bool("add_dtl_tags", false),
      datalakeQueries = queries,
      maxPayloadBytes = (j \ "max_payload_bytes") match {
        case JInt(i) => i.toLong   // parse as Long: a 4 GB limit must
        case _ => 1L << 20         // not wrap through Int
      },
      sslVerify = bool("ssl_verify", dflt = true),
      proxyHost = proxy._1,
      proxyPort = proxy._2)
  }

  /** The reference's `proxies` map uses Python-requests format
    * (`{"https": "http://host:port", ...}`,
    * `src/config.py.default:46-47`): take the https entry (falling
    * back to http) and parse it as a URI — host and port come from
    * the structured parse, so credentials (`http://u:p@host:3128`),
    * paths, and bracketed IPv6 literals all resolve to the right
    * host instead of a silently broken one. URI rejects some
    * hostnames that requests (and real resolvers) accept — notably
    * underscores, as in docker-style `corp_proxy:3128` — so a
    * bare `host[:port]` authority (no path, no userinfo) that URI
    * can't parse falls back to a plain rsplit-on-':' — the
    * pre-round-6 behavior for exactly the configs that used to
    * work. Anything else the URI parser can't extract a host from
    * fails loudly: a mis-typed proxy config must not degrade into a
    * direct-connection ProxySelector at runtime. Proxy AUTH is
    * intentionally unsupported (as in `java.net.http` itself, which
    * ignores userInfo) — an entry carrying credentials still yields
    * host+port. */
  private def parseProxies(v: org.json4s.JValue): (Option[String], Int) = {
    import org.json4s._
    val url = v match {
      case JObject(fields) =>
        val m = fields.collect { case (k, JString(s)) => k -> s }.toMap
        m.get("https").orElse(m.get("http"))
      case _ => None
    }
    url.map(_.trim).filter(_.nonEmpty) match {
      case None => (None, 3128)
      case Some(raw) =>
        // requests also accepts scheme-less "host:port"; give the URI
        // parser an authority to work with in that case
        val withScheme =
          if (raw.contains("://")) raw else s"http://$raw"
        val parsed =
          try {
            val u = java.net.URI.create(withScheme)
            Option(u.getHost).map(h =>
              (h, if (u.getPort >= 0) u.getPort else 3128))
          } catch { case _: IllegalArgumentException => None }
        parsed.orElse(hostPortFallback(withScheme)) match {
          case Some((h, p)) => (Some(h), p)
          case None => throw new IllegalArgumentException(
            s"unparseable proxies entry '$raw': expected " +
              "[scheme://][user:pass@]host[:port] (note: hostnames " +
              "with underscores are accepted via the host:port " +
              "fallback only when the entry has no path or userinfo)")
        }
    }
  }

  /** Bare-authority rescue for hostnames java.net.URI rejects (RFC
    * 3986 forbids '_' in reg-names; requests and real resolvers
    * accept them). Only fires for `scheme://host[:port]` shapes —
    * no '/', '?', '#' or '@' after the scheme — so a genuinely
    * malformed entry still throws above. */
  private def hostPortFallback(
      withScheme: String): Option[(String, Int)] = {
    val auth = withScheme.substring(withScheme.indexOf("://") + 3)
    if (auth.isEmpty || auth.exists("/?#@".contains(_))) None
    else auth.lastIndexOf(':') match {
      case -1 => Some((auth, 3128))
      case i =>
        val (h, ps) = (auth.substring(0, i), auth.substring(i + 1))
        // digits-only FIRST (Integer.parseInt would accept a leading
        // '+'/'-' — a sign-prefixed port is malformed and must fall
        // through to the loud error), then toIntOption so an all-digit
        // string beyond Int range, or a port outside 1-65535, falls
        // through the same way
        val port = Option(ps).filter(p => p.nonEmpty && p.forall(_.isDigit))
          .flatMap(_.toIntOption).filter(p => p > 0 && p <= 65535)
        if (h.nonEmpty) port.map((h, _)) else None
    }
  }

  def fromFile(path: String): PipelineConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
