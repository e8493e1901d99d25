package graft.serving

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{Ontology, PropertyGraph}
import graft.operators.{ClosureIndex, OneHop, QueryGraph}

/**
 * One named graph hosted by a [[MultiGraph]] session: the columnar
 * frames plus the per-graph derived artifacts a lookup needs (subclass
 * closure and its driver-side index), and the cached frames that belong
 * EXCLUSIVELY to this graph. `owned` is the release contract: frames a
 * co-hosted graph shares (e.g. the store-backed primary tables two
 * logical graphs slice differently) must NOT be listed, so releasing
 * one graph never cold-starts its neighbors.
 */
final case class HostedGraph(graph: PropertyGraph,
                             closure: Option[DataFrame] = None,
                             index: Option[ClosureIndex] = None,
                             owned: Seq[DataFrame] = Nil)

/**
 * Multi-graph serving session — the analytics twin of the reference
 * hosting one engine instance per KG config in a single process and
 * routing requests by endpoint name with a default fallback
 * (ref: /root/reference/app/app/main.py:50-69 builds the name -> engine
 * map, :210-218 routes `/<kp_endpoint_name>/query` and bare `/query`,
 * 404s unknown names; the default endpoint is the lexicographically
 * smallest name, main.py:64).
 *
 * Spark-first posture: N graphs warm in ONE SparkSession. The frames
 * live in the SparkContext-wide CacheManager, so co-hosting costs one
 * cached copy per DISTINCT table — logical graphs that slice the same
 * store share its cache entries — and the per-graph state this class
 * adds is only routing metadata plus a prepared-plan cache keyed
 * (graph, query key): a repeat probe against graph A re-executes A's
 * already-analyzed/optimized/compiled DataFrame, and graph B's probes
 * never collide with it (per-graph plan isolation, spec-pinned).
 * Releasing a graph drops exactly its hosted entry, its prepared
 * plans, and the frames it `owned` — co-hosted graphs keep serving
 * warm (the session-side twin of restarting one KP without the
 * others).
 */
final class MultiGraph(val spark: SparkSession, ont: Ontology) {

  /** A hosted entry carries a session-unique VERSION stamped at
   * registration; prepared plans key on (name, version, query key), so
   * a plan built against a superseded registration — even one whose
   * build was in flight when `register` replaced the graph and purged
   * the name — lands under the dead version and can never serve the
   * new graph's probes (the purge races registration; the version
   * doesn't). */
  private final class Hosted(val version: Long, val g: HostedGraph)
  private val hosted = new ConcurrentHashMap[String, Hosted]()
  private val prepared =
    new ConcurrentHashMap[(String, Long, String), DataFrame]()
  private val versionGen = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Host `g` under `name` (replaces any previous holder of the name —
   * its prepared plans are dropped, and the fresh version stamp keeps
   * any in-flight stale build from re-inserting one). Returns this for
   * chaining. */
  def register(name: String, g: HostedGraph): this.type = {
    require(name.nonEmpty, "graph name must be non-empty")
    val prev = hosted.put(name, new Hosted(versionGen.incrementAndGet(), g))
    if (prev != null) dropPrepared(name)
    this
  }

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    hosted.keySet().asScala.toSeq.sorted
  }

  /** The default graph: the lexicographically smallest hosted name —
   * the same rule the reference uses to pick the default endpoint
   * (main.py:64 `min(plover_endpoints_map)`). */
  def defaultName: String = {
    val ns = names
    require(ns.nonEmpty, "no graphs hosted")
    ns.head
  }

  /** Route a probe: an explicit name must be hosted (unknown names
   * fail loudly, the session-side 404 — main.py:218); None falls back
   * to the default graph (the bare `/query` route). */
  def resolve(name: Option[String]): (String, HostedGraph) = {
    val (n, h) = resolveVersioned(name)
    (n, h.g)
  }

  private def resolveVersioned(name: Option[String]): (String, Hosted) = {
    val n = name.getOrElse(defaultName)
    val h = hosted.get(n)
    if (h == null)
      throw new NoSuchElementException(
        s"graph endpoint '$n' does not exist (hosted: ${names.mkString(", ")})")
    (n, h)
  }

  /** Per-graph prepared-plan cache: build-once, re-execute per call
   * (the same prepared-statement discipline as the single-graph
   * serving path, but keyed by graph so co-hosted graphs' plans never
   * alias). Entries are built outside the map's bin lock; a racing
   * duplicate build is harmless — both plans are pure. */
  def preparedPlan(graphName: Option[String], key: String)
                  (build: (String, HostedGraph) => DataFrame): DataFrame = {
    val (n, h) = resolveVersioned(graphName)
    val k = (n, h.version, key)
    val hit = prepared.get(k)
    if (hit != null) hit
    else {
      val df = build(n, h.g)
      val raced = prepared.putIfAbsent(k, df)
      if (raced != null) raced else df
    }
  }

  /** One-hop TRAPI-style lookup against the routed graph, through the
   * per-graph prepared-plan cache (`cacheKey` identifies the probe
   * shape; callers issuing ad-hoc probes can pass a fresh key). */
  def answer(cacheKey: String, qg: QueryGraph, graphName: Option[String] = None,
             maxEdges: Option[Long] = None): DataFrame =
    preparedPlan(graphName, cacheKey) { (_, g) =>
      OneHop.answer(spark, g.graph, ont, qg,
        closure = g.closure, expandSubclasses = g.closure.isDefined,
        maxEdges = maxEdges, index = g.index).matches
    }

  /** Batched lookup serving against the routed graph — answerBatch
   * through the same per-graph prepared-plan cache as `answer` (the
   * routed twin of the reference's batch endpoints: `/<kp>` routing
   * composed with the pair/id LIST lookups, plover.py:1934/:1982).
   * One Spark job per call however many probes ride the batch; a
   * different graph name compiles its own plan, so co-hosted graphs'
   * batch plans never alias. */
  def answerBatch(cacheKey: String, probes: Seq[(String, QueryGraph)],
                  graphName: Option[String] = None): DataFrame =
    preparedPlan(graphName, cacheKey) { (_, g) =>
      OneHop.answerBatch(spark, g.graph, ont, probes,
        closure = g.closure, expandSubclasses = g.closure.isDefined,
        index = g.index)
    }

  /** Diagnostic: live prepared-plan entries for `name` (any version) —
   * lets co-hosting smokes assert release really drained a graph's
   * plan footprint rather than inferring it from behavior. */
  private[graft] def preparedCount(name: String): Int = {
    val it = prepared.keySet.iterator()
    var n = 0
    while (it.hasNext) if (it.next()._1 == name) n += 1
    n
  }

  private def dropPrepared(name: String): Unit = {
    val it = prepared.keySet.iterator()
    while (it.hasNext) if (it.next()._1 == name) it.remove()
  }

  /** Retire ONE graph: de-register it, drop its prepared plans, and
   * unpersist only the frames it owned. Co-hosted graphs keep their
   * caches and prepared plans untouched (spec-pinned isolation). */
  def release(name: String): Unit = {
    val h = hosted.remove(name)
    dropPrepared(name)
    if (h != null) h.g.owned.foreach(_.unpersist())
  }

  def releaseAll(): Unit = names.foreach(release)
}
