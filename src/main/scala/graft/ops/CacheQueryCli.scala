package graft.ops

import graft.functions.Fnv1a

/** Cache-query CLI client (reference: bin/kenshin-cache-query.py): resolve
  * which cache instance owns the metric by the fnv1a shard
  * (get_instance_of_metric, rurouni/utils.py:107-108), hit that instance's
  * HTTP endpoint, print the datapoints. Usage:
  *
  *   graft.ops.CacheQueryCli <metric> [--server host] [--ports p0,p1,...]
  *
  * `--ports` lists one query port per cache instance in instance order —
  * the ConfigParser CACHE_QUERY_PORT table of the reference client.
  */
object CacheQueryCli {

  /** Shard-routed query: pick `ports(shard(metric))`, GET /query, return
    * the raw JSON body. Separated from main for in-process testing.
    */
  def query(server: String, ports: Seq[Int], metric: String): String = {
    require(ports.nonEmpty, "at least one cache instance port is required")
    val port = ports(Fnv1a.shard(metric, ports.length))
    get(s"http://$server:$port/query?metric=${enc(metric)}")
  }

  def fetch(server: String, ports: Seq[Int], metric: String,
            from: Long, until: Long, now: Long): String = {
    require(ports.nonEmpty, "at least one cache instance port is required")
    val port = ports(Fnv1a.shard(metric, ports.length))
    get(s"http://$server:$port/fetch?metric=${enc(metric)}&from=$from&until=$until&now=$now")
  }

  /** Glob find across ALL cache instances: the namespace is sharded BY
    * METRIC (fnv1a), so any instance can own series under any node — the
    * client fans the /find query to every port, OR-merges the leaf/branch
    * flags per path, and re-sorts (the multi-instance analog of
    * graphite-web merging finder results across its CLUSTER_SERVERS).
    */
  def find(server: String, ports: Seq[Int], query: String): String = {
    require(ports.nonEmpty, "at least one cache instance port is required")
    val nodeRe = """\{"path":"((?:[^"\\]|\\.)*)","leaf":(true|false),"branch":(true|false)\}""".r
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, (Boolean, Boolean)]
    ports.distinct.foreach { port =>
      val body = get(s"http://$server:$port/find?query=${enc(query)}")
      nodeRe.findAllMatchIn(body).foreach { m =>
        val (p, l, b) = (m.group(1), m.group(2).toBoolean, m.group(3).toBoolean)
        val prev = merged.getOrElse(p, (false, false))
        merged(p) = (prev._1 || l, prev._2 || b)
      }
    }
    merged.toSeq.sortBy(_._1).map { case (p, (l, b)) =>
      s"""{"path":"$p","leaf":$l,"branch":$b}"""
    }.mkString("""{"nodes":[""", ",", "]}")
  }

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")

  private def get(url: String): String = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(30000)
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = try scala.io.Source.fromInputStream(stream, "UTF-8").mkString
      finally stream.close()
    if (code >= 400) throw new java.io.IOException(s"HTTP $code from $url: $body")
    body
  }

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    require(positional.length == 1,
      "usage: CacheQueryCli <metric|globQuery> [--find] [--server host] [--ports p0,p1,...]")
    val target = positional(0)
    def opt(name: String, default: String): String =
      args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }
        .getOrElse(default)
    val server = opt("server", "127.0.0.1")
    val ports = opt("ports", "7002").split(",").toSeq.map(_.trim.toInt)
    if (args.contains("--find")) println(find(server, ports, target))
    else println(query(server, ports, target))
  }
}
