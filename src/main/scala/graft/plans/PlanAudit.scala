package graft.plans

import org.apache.spark.sql.DataFrame

/** Machine-readable audit of a physical plan's scale-killers — the
  * parser behind the permanent PlanAuditSpec gate.
  *
  * Round-7 history is the reason this exists as CODE and not a manual
  * sweep: the round-7 "zero SinglePartition" claim grepped the one-line
  * spelling `Exchange SinglePartition`, which the FORMATTED explain
  * never prints (it splits the node header `(13) Exchange` from its
  * `Arguments: SinglePartition, ...` line), so the claim silently went
  * stale. This parser reads the formatted explain the way the round-8
  * manual audit did: every node's detail block (Input/Arguments/
  * Functions), plus the tree section for child resolution, across the
  * main plan AND all `===== Subqueries =====` sections.
  *
  * What it surfaces (the four shapes that cannot survive a 100×
  * scale-up when they sit over data-sized input):
  *   - Exchange nodes with `SinglePartition` arguments — legitimate
  *     only over bounded tables (1-row global-agg partials, ≤256-row
  *     bucket totals, documented bounded domains);
  *   - `CartesianProduct` — never legitimate on this surface;
  *   - Window nodes whose windowspecdefinition has NO partition keys —
  *     a global sort of the window's input through one task;
  *   - `BroadcastNestedLoopJoin` whose build side is NOT the
  *     structural 1-row scalar-attach shape (keys-empty aggregate
  *     broadcast) — a data-dependent nested loop unless the build is
  *     bounded by construction and inventoried.
  */
object PlanAudit {

  /** One operator node of a formatted plan: header id/name plus the
    * detail-block fields (`Input`, `Arguments`, `Functions`, ...), the
    * ids of its tree children, and — for ReusedExchange — the id of
    * the exchange it aliases. */
  case class Node(id: Int, name: String, fields: Map[String, String],
                  children: Seq[Int], reuses: Option[Int] = None) {
    def input: String = fields.getOrElse("Input", "")
    def arguments: String = fields.getOrElse("Arguments", "")
    def functions: String = fields.getOrElse("Functions", "")
  }

  /** The audit-relevant view of one query plan. */
  case class Report(nodes: Map[Int, Node],
                    singlePartitionExchanges: Seq[Node],
                    cartesianProducts: Seq[Node],
                    globalWindows: Seq[Node],
                    broadcastNestedLoops: Seq[Node]) {
    /** The producer feeding an exchange (partial-agg detection). */
    def childOf(n: Node): Option[Node] =
      n.children.headOption.flatMap(nodes.get)
    /** Resolve ReusedExchange aliases to the real node. */
    def resolve(n: Node): Node =
      n.reuses.flatMap(nodes.get).getOrElse(n)
  }

  // the optional trailing `, Statistics(...)` appears on AQE QueryStage
  // tree lines in EXECUTED plans (the streaming micro-batch capture);
  // without it those nodes vanish from the tree and every child chain
  // through them breaks
  private val TreeLine =
    """^([ :+\-]*)\*?\s*([A-Za-z][^()]*?)\s*\((\d+)\)(?:,.*)?\s*$""".r
  private val DetailHeader = """^\((\d+)\)\s+(\S.*?)\s*$""".r
  private val FieldLine = """^([A-Za-z][A-Za-z ]*?)(?: \[\d+\])?: (.*)$""".r

  private val ReuseHeader =
    """^\((\d+)\)\s+ReusedExchange \[Reuses operator id: (\d+)\].*$""".r

  /** Parse a formatted explain string into audit nodes. */
  def parse(formatted: String): Map[Int, Node] = {
    val lines = formatted.linesIterator.toVector
    // pass 1: tree lines -> (depth, id) in order; children of a node
    // at depth d = the depth d+3 entries before the next entry at
    // depth <= d (trees restart in subquery sections; the depth gate
    // keeps blocks separate)
    val tree = lines.flatMap {
      case TreeLine(prefix, _, id) => Some((prefix.length, id.toInt))
      case _ => None
    }
    val childMap: Map[Int, Seq[Int]] = tree.zipWithIndex.map {
      case ((depth, id), i) =>
        id -> tree.drop(i + 1)
          .takeWhile { case (d, _) => d > depth }
          .collect { case (d, cid) if d == depth + 3 => cid }
    }.toMap
    // pass 2: detail blocks "(id) Name" followed by "Field: value"
    val nodes = scala.collection.mutable.Map[Int, Node]()
    var current: Option[(Int, String)] = None
    var fields = Map.empty[String, String]
    def flush(): Unit = current.foreach { case (id, name) =>
      // keep the FIRST block per id (subquery reuse can repeat ids)
      if (!nodes.contains(id))
        nodes(id) = Node(id, name, fields, childMap.getOrElse(id, Nil))
    }
    lines.foreach {
      case ReuseHeader(id, target) =>
        flush(); current = None
        val nid = id.toInt
        if (!nodes.contains(nid))
          nodes(nid) = Node(nid, "ReusedExchange", Map.empty,
            childMap.getOrElse(nid, Nil), reuses = Some(target.toInt))
      case DetailHeader(id, name) =>
        flush(); current = Some((id.toInt, name)); fields = Map.empty
      case FieldLine(k, v) if current.isDefined =>
        fields = fields.updated(k.trim, v)
      case l if l.trim.isEmpty => flush(); current = None
      case _ => ()
    }
    flush()
    nodes.toMap
  }

  /** True when a windowspecdefinition in `arguments` has no partition
    * columns: partition keys precede the ordering expressions, and
    * ordering expressions are marked ` ASC`/` DESC`, so a spec whose
    * FIRST top-level argument carries a sort marker is global. */
  private[plans] def hasGlobalWindowSpec(arguments: String): Boolean = {
    var idx = arguments.indexOf("windowspecdefinition(")
    while (idx >= 0) {
      val start = idx + "windowspecdefinition(".length
      // first top-level argument: scan to the first ',' (or the
      // spec's closing ')') at paren depth 0
      var depth = 0
      var i = start
      var end = -1
      while (i < arguments.length && end < 0) {
        arguments(i) match {
          case ',' if depth == 0 => end = i
          case ')' if depth == 0 => end = i
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ => ()
        }
        i += 1
      }
      val firstArg =
        arguments.substring(start, if (end >= 0) end else arguments.length)
      if (firstArg.contains(" ASC") || firstArg.contains(" DESC"))
        return true
      idx = arguments.indexOf("windowspecdefinition(", idx + 1)
    }
    false
  }

  /** Audit one DataFrame's physical plan (triggers planning only). */
  def audit(df: DataFrame): Report =
    auditFormatted(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

  /** Audit an already-rendered formatted explain — the entry point for
    * plans not reachable through a DataFrame handle: streaming
    * micro-batch executions captured by a QueryExecutionListener and
    * IncrementalExecutions pulled off a running StreamingQuery
    * (StreamPlanAuditSpec). Classifiers identical to [[audit]]. */
  def auditFormatted(formatted: String): Report = {
    val nodes = parse(formatted)
    Report(
      nodes,
      nodes.values.toSeq.sortBy(_.id).filter(n =>
        n.name.startsWith("Exchange") &&
          n.arguments.startsWith("SinglePartition")),
      nodes.values.toSeq.sortBy(_.id)
        .filter(_.name.startsWith("CartesianProduct")),
      nodes.values.toSeq.sortBy(_.id).filter(n =>
        n.name.startsWith("Window") &&
          hasGlobalWindowSpec(n.arguments)),
      nodes.values.toSeq.sortBy(_.id)
        .filter(_.name.startsWith("BroadcastNestedLoopJoin")))
  }

  /** A single-partition exchange whose producer is a map-side partial
    * aggregate with NO grouping keys is the unavoidable final pass of
    * a GLOBAL aggregate: its input is one pre-combined row per
    * upstream partition (KBs), not the data. Spark aggregate nodes are
    * entirely Partial or entirely Final, and a keys-empty aggregate
    * feeding a SinglePartition exchange is exactly the 1-row-per-
    * partition shape (grouped partials shuffle by hashpartitioning,
    * never SinglePartition). */
  def isPartialAggFinalPass(report: Report, ex: Node): Boolean =
    report.childOf(ex).exists { c =>
      c.name.contains("Aggregate") &&
        (c.fields.getOrElse("Keys", "") == "[]" ||
          (!c.fields.contains("Keys") && c.functions.contains("partial_")))
    }

  /** A BroadcastNestedLoopJoin is the SCALAR-ATTACH shape (a 1-row
    * broadcast crossJoined onto the stream — corpus totals, percentile
    * bounds, fitted parameters) when its broadcast side bottoms out in
    * a keys-empty aggregate: the exchange then carries exactly one row
    * by construction, and a 1-row build side is a constant attach, not
    * a nested loop. Walks through row-preserving-or-reducing wrappers
    * (Project/Filter/Subquery) and resolves ReusedExchange aliases. A
    * BNLJ whose build side is anything else (a data-dependent
    * non-equi broadcast join) is NOT excused by this rule and must be
    * inventoried per query. */
  def isScalarBroadcastBNLJ(report: Report, bnlj: Node): Boolean = {
    def descend(n: Node, depth: Int): Boolean = {
      if (depth > 8) false
      else {
        val r = report.resolve(n)
        if (r.name.contains("Aggregate"))
          r.fields.getOrElse("Keys", "x") == "[]"
        else if (r.name.startsWith("Project") ||
                 r.name.startsWith("Filter") ||
                 r.name.startsWith("Subquery") ||
                 r.name.startsWith("BroadcastExchange") ||
                 r.name.startsWith("ColumnarToRow") ||
                 // AQE wrappers: pre-execution plans (the 281-query
                 // batch gate) never carry these, but EXECUTED plans —
                 // the streaming micro-batch executions
                 // StreamPlanAuditSpec captures — wrap every exchange
                 // in a QueryStage and shuffle reads in AQEShuffleRead;
                 // all are row-preserving pass-throughs for this walk
                 r.name.startsWith("BroadcastQueryStage") ||
                 r.name.startsWith("ShuffleQueryStage") ||
                 r.name.startsWith("ResultQueryStage") ||
                 r.name.startsWith("TableCacheQueryStage") ||
                 r.name.startsWith("AQEShuffleRead") ||
                 r.name.startsWith("Exchange"))
          r.children.headOption.flatMap(report.nodes.get)
            .exists(descend(_, depth + 1))
        else false
      }
    }
    bnlj.children.flatMap(report.nodes.get)
      .exists(c => (c.name.startsWith("BroadcastExchange") ||
        c.name.startsWith("BroadcastQueryStage") ||
        c.name.startsWith("ReusedExchange")) && descend(c, 0))
  }
}
