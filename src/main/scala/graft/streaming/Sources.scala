package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A pluggable streaming source, keyed by URI scheme.
  *
  * The reference addresses stream inputs by URI — `kafka://topic`,
  * `kinesis://stream`, and CDC variants spelled `<scheme>+cdc://…`
  * (pkg/ingestr/operator.go:596-640, :229-324). This sandbox has no broker
  * jars, so the only bundled implementation is the file-backed stand-in —
  * but the OPERATORS ([[Streams.cdcApply]], dedup, windowing, sessionize)
  * only ever see the DataFrame this trait returns. Dropping a kafka jar in
  * means registering one more [[StreamSource]]; no operator code changes.
  */
trait StreamSource {
  /** URI scheme this source serves (lowercase, without any `+cdc` suffix). */
  def scheme: String

  /** Resolve a URI to an unbounded streaming DataFrame. */
  def load(spark: SparkSession, uri: java.net.URI,
           options: Map[String, String] = Map.empty): DataFrame
}

/** The file-backed broker stand-in: `file:///path/to/events.parquet`.
  * Delegates to [[Streams.eventStream]] (content-keyed staging dir, symlink
  * fan-out for at-least-once replay via the `copies` option). */
object FileEventSource extends StreamSource {
  override val scheme = "file"
  override def load(spark: SparkSession, uri: java.net.URI,
                    options: Map[String, String]): DataFrame =
    Streams.eventStream(spark, uri.getPath,
      copies = options.getOrElse("copies", "1").toInt)
}

/** The REAL kafka connector mapping: `kafka://host:port/topic` →
  * `readStream.format("kafka")`. Compiles with zero kafka dependency (the
  * data source resolves by NAME at runtime), so the library ships it
  * everywhere; [[StreamSources]] activates it only when the
  * spark-sql-kafka connector is actually on the classpath, keeping
  * `forUri`'s "registered schemes" error honest in jarless deployments.
  * Extra reader options pass through verbatim (`startingOffsets`,
  * `kafka.*` security settings, …). */
object KafkaEventSource extends StreamSource {
  override val scheme = "kafka"

  /** Pure `kafka://host:port/topic` → (bootstrap servers, topic) mapping —
    * the connector-independent half of the kafka source, testable in
    * jarless deployments (the jar-gated half is only the
    * `format("kafka")` call below). */
  def connection(uri: java.net.URI): (String, String) = {
    val topic = Option(uri.getPath).map(_.stripPrefix("/")).getOrElse("")
    require(topic.nonEmpty, s"kafka URI needs a topic path: $uri")
    // URI.getHost is null for RFC-invalid hostnames (docker underscores);
    // fall back to the raw authority rather than building "null:9092"
    val bootstrap = Option(uri.getHost) match {
      case Some(h) => s"$h:${if (uri.getPort > 0) uri.getPort else 9092}"
      case None => Option(uri.getAuthority).getOrElse(
        throw new IllegalArgumentException(s"kafka URI needs a broker host: $uri"))
    }
    (bootstrap, topic)
  }

  override def load(spark: SparkSession, uri: java.net.URI,
                    options: Map[String, String]): DataFrame = {
    val (bootstrap, topic) = connection(uri)
    options.foldLeft(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)) { case (r, (k, v)) => r.option(k, v) }
      .load()
  }
}

/** Scheme → [[StreamSource]] registry with `<scheme>+cdc` URI parsing. */
object StreamSources {
  private val registry =
    new scala.collection.concurrent.TrieMap[String, StreamSource]()
  register(FileEventSource)
  if (kafkaConnectorPresent) register(KafkaEventSource)

  /** True iff the spark-sql-kafka connector jar is on the classpath.
    * initialize=false + LinkageError catch: a half-present connector
    * (jar without its transitive deps) must report absent, not blow up
    * this object's static init and take every scheme down with it. */
  def kafkaConnectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider",
        false, getClass.getClassLoader)
      true
    } catch {
      case _: ClassNotFoundException => false
      case _: LinkageError => false
    }

  def register(src: StreamSource): Unit = registry.put(src.scheme, src)

  /** Parsed stream address: the source to read from and whether the URI
    * requested CDC semantics (`postgres+cdc://…` ⇒ changes apply through
    * [[Streams.cdcApply]] instead of plain append). */
  final case class Resolved(source: StreamSource, uri: java.net.URI, cdc: Boolean)

  /** Resolve `kafka://t`, `file:///p`, `mysql+cdc://db/t`, … — unknown
    * schemes fail fast, naming what IS registered. */
  def forUri(rawUri: String): Resolved = {
    val uri = java.net.URI.create(rawUri)
    val rawScheme = Option(uri.getScheme).getOrElse(
      throw new IllegalArgumentException(s"stream URI has no scheme: $rawUri"))
    val (scheme, cdc) = rawScheme.toLowerCase.split('+') match {
      case Array(s, "cdc") => (s, true)
      case Array(s)        => (s, false)
      case _ => throw new IllegalArgumentException(
        s"unsupported stream URI scheme '$rawScheme' (expected scheme or scheme+cdc)")
    }
    val src = registry.getOrElse(scheme, throw new IllegalArgumentException(
      s"no stream source registered for scheme '$scheme' " +
        s"(registered: ${registry.keys.toSeq.sorted.mkString(", ")})"))
    Resolved(src, uri, cdc)
  }
}
