package graft.engine

/**
 * Minimal directed graph with the operations the reference needs from
 * networkx (reference graph.py:14,67-105; earthmover.py:192-249): cycle
 * check, topological order, ancestors/descendants, selector pruning with
 * dead-branch removal. ~100 LoC instead of a graph dependency.
 */
final case class Dag(nodes: Set[String], edges: Set[(String, String)]) {

  private lazy val out: Map[String, Set[String]] =
    edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap.withDefaultValue(Set.empty)
  private lazy val in: Map[String, Set[String]] =
    edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap.withDefaultValue(Set.empty)

  def predecessors(n: String): Set[String] = in(n)

  def topologicalOrder: List[String] = {
    val indeg = scala.collection.mutable.Map[String, Int](nodes.toSeq.map(n => n -> in(n).size): _*)
    val queue = scala.collection.mutable.PriorityQueue[String]()(Ordering[String].reverse)
    indeg.collect { case (n, 0) => n }.foreach(queue.enqueue(_))
    val order = List.newBuilder[String]
    var seen = 0
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      order += n
      seen += 1
      out(n).foreach { m =>
        indeg(m) -= 1
        if (indeg(m) == 0) queue.enqueue(m)
      }
    }
    if (seen != nodes.size)
      throw new IllegalArgumentException(
        s"the config is not a DAG: cycle among ${nodes.filter(n => indeg(n) > 0).toList.sorted.mkString(", ")}")
    order.result()
  }

  def ancestors(n: String): Set[String] = {
    val seen = scala.collection.mutable.Set[String]()
    def walk(x: String): Unit = in(x).foreach(p => if (seen.add(p)) walk(p))
    walk(n); seen.toSet
  }

  def descendants(n: String): Set[String] = {
    val seen = scala.collection.mutable.Set[String]()
    def walk(x: String): Unit = out(x).foreach(c => if (seen.add(c)) walk(c))
    walk(n); seen.toSet
  }

  /** Selector pruning (earthmover.py:225-249): comma/wildcard selector
    * matches node short names; keep matches ∪ ancestors ∪ descendants, then
    * repeatedly delete terminal nodes that are not destinations. */
  def select(selector: String, isDestination: String => Boolean): Dag = {
    if (selector == "*" || selector.isEmpty) return this
    val patterns = selector.split(",").map(_.trim).filter(_.nonEmpty)
    val regexes = patterns.map(p => ("^" + p.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c => java.util.regex.Pattern.quote(c.toString)
    } + "$").r)
    def short(n: String): String = n.substring(n.indexOf('.') + 1)
    val matched = nodes.filter(n => regexes.exists(r => r.matches(short(n)) || r.matches(n)))
    if (matched.isEmpty)
      throw new IllegalArgumentException(s"selector '$selector' matches no nodes")
    // matches ∪ descendants, then close over ancestors of everything kept:
    // a kept descendant (e.g. a join) needs ALL its parents, not only the
    // ones on the selected path — the reference keeps just
    // matches ∪ ancestors ∪ descendants (graph.py:93-101), which leaves such
    // joins without inputs.
    val withDesc = matched.flatMap(n => descendants(n) + n)
    var keep = withDesc.flatMap(n => ancestors(n) + n)
    // dead-branch removal: terminal non-destinations serve nothing
    var changed = true
    while (changed) {
      val terminalNonDest = keep.filter(n =>
        !isDestination(n) && out(n).intersect(keep).isEmpty)
      changed = terminalNonDest.nonEmpty
      keep = keep -- terminalNonDest
    }
    Dag(keep, edges.filter { case (a, b) => keep(a) && keep(b) })
  }
}
