package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column

import graft.operators.{Curation, Similarity, Summarize, TextAnalysis}

/** A named, swappable Column transformation — the engine's model-call
  * seam. The reference runs real model stages (LLM summarize,
  * embedding service: summarize_utils.py:60-93, embed flow in
  * article_summary assets); this engine ships deterministic offline
  * stand-ins for them. A deployment with live model access replaces a
  * stage by registering a plugin under the same name (e.g. a
  * `mapInPandas`-backed batch client wrapped into a Column) — every
  * call site that resolves through [[ColumnPlugins]] picks it up, and
  * no query code changes.
  */
trait ColumnPlugin {
  /** Registry key; later registrations under the same name win. */
  def name: String
  /** Build the output Column from argument Columns. Implementations
    * must be pure plan construction — no driver-side data access.
    */
  def apply(args: Seq[Column]): Column
}

/** Process-wide plugin registry, pre-loaded with the engine's default
  * stand-ins:
  *
  *  - `summarize` (M1): extractive bullet summary,
  *    [[Summarize.extractiveSummaryRaw]]
  *  - `statement_status` (M2): rule-based fact-check classifier,
  *    [[Summarize.statementStatus]]
  *  - `embed` (M3): hashing-trick bag-of-words embedding,
  *    [[Similarity.hashEmbedding]]
  *
  * Also reachable from pure SQL as `graft_call('<name>', args...)`
  * (registered by [[graft.GraftExtensions]]); the name is resolved at
  * plan time, so plugins registered after session start are visible.
  */
object ColumnPlugins {

  private val registry = new ConcurrentHashMap[String, ColumnPlugin]()

  def register(p: ColumnPlugin): Unit = registry.put(p.name, p)

  /** Convenience registration from a plain function. */
  def register(name: String)(fn: Seq[Column] => Column): Unit = {
    val n = name
    register(new ColumnPlugin {
      def name: String = n
      def apply(args: Seq[Column]): Column = fn(args)
    })
  }

  def apply(name: String)(args: Column*): Column = {
    val p = registry.get(name)
    if (p == null) throw new NoSuchElementException(
      s"no ColumnPlugin '$name' registered; have: ${names.mkString(", ")}")
    p(args)
  }

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSeq.sorted
  }

  private def arity1(name: String, args: Seq[Column]): Column = {
    require(args.length == 1, s"plugin '$name' expects 1 argument")
    args.head
  }

  register("summarize") { args =>
    Summarize.extractiveSummaryRaw(arity1("summarize", args))
  }
  register("statement_status") { args =>
    Summarize.statementStatus(arity1("statement_status", args))
  }
  register("embed") { args =>
    Similarity.hashEmbedding(arity1("embed", args))
  }
  // curation scalar stages, so `spark.sql` pipelines can quality-gate,
  // split, and scrub without leaving SQL
  register("quality") { args =>
    TextAnalysis.qualityScore(arity1("quality", args))
  }
  register("hash_split") { args =>
    Curation.hashSplit(arity1("hash_split", args))
  }
  register("scrub_pii") { args =>
    Curation.scrubPii(arity1("scrub_pii", args))
  }
}
