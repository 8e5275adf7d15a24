package graft.pipes

/** The decode side of `eds.biaffine_dep_parser` — re-expression of
  * `/root/reference/edsnlp/pipes/trainable/biaffine_dep_parser/
  * biaffine_dep_parser.py:22-246`: given arc SCORES from a model (torch
  * stays injected), pick each token's head either greedily or as the
  * maximum spanning arborescence (Chu-Liu/Edmonds) with the reference's
  * one-root constraint. Pure math, row-local on executors; the scores
  * matrix for a sentence is tiny, so the O(n^3) contraction bound is
  * irrelevant at any corpus scale.
  *
  * Convention: node 0 is the artificial ROOT; `scores(dep)(head)` is
  * the score of attaching `dep` to `head`. Output `heads(dep)` with
  * `heads(0) = 0`.
  */
object DepDecoder {

  /** Greedy decoding (`decoding_mode="greedy"`): per-dependent argmax.
    * May produce cycles/multiple roots — that is the documented
    * tradeoff of the reference's greedy mode too.
    */
  def greedy(scores: Array[Array[Double]]): Array[Int] = {
    val n = scores.length
    val heads = new Array[Int](n)
    var v = 1
    while (v < n) {
      var best = Double.NegativeInfinity
      var bh = 0
      var h = 0
      while (h < n) {
        if (h != v && scores(v)(h) > best) { best = scores(v)(h); bh = h }
        h += 1
      }
      heads(v) = bh
      v += 1
    }
    heads
  }

  /** Chu-Liu/Edmonds maximum spanning arborescence rooted at 0. */
  def mst(scores: Array[Array[Double]]): Array[Int] = {
    val n = scores.length
    chuLiuEdmonds(Array.tabulate(n, n)((d, h) =>
      if (d == h || d == 0) Double.NegativeInfinity else scores(d)(h)))
  }

  /** MST with the reference's ONE-ROOT constraint
    * (`chuliu_edmonds_one_root`): exactly one token attaches to the
    * artificial root. If the unconstrained tree already has one root
    * child it is returned; otherwise each root-child candidate is tried
    * with all other root arcs banned and the best-scoring tree wins.
    */
  def mstOneRoot(scores: Array[Array[Double]]): Array[Int] = {
    val n = scores.length
    val base = mst(scores)
    val rootChildren = (1 until n).filter(base(_) == 0)
    if (rootChildren.size <= 1) return base
    var best: Array[Int] = null
    var bestScore = Double.NegativeInfinity
    rootChildren.foreach { r =>
      val banned = Array.tabulate(n, n) { (d, h) =>
        if (h == 0 && d != r) Double.NegativeInfinity else scores(d)(h)
      }
      val t = mst(banned)
      val s = treeScore(scores, t)
      if (s > bestScore) { bestScore = s; best = t }
    }
    best
  }

  private def treeScore(
      scores: Array[Array[Double]], heads: Array[Int]): Double = {
    var s = 0.0
    var v = 1
    while (v < heads.length) { s += scores(v)(heads(v)); v += 1 }
    s
  }

  /** Recursive contraction form of Chu-Liu/Edmonds over a mutable score
    * matrix (`biaffine_dep_parser.py:125-224` structure: greedy pick →
    * find cycle → contract → recurse → expand).
    */
  private def chuLiuEdmonds(s: Array[Array[Double]]): Array[Int] = {
    val n = s.length
    val heads = new Array[Int](n)
    var v = 1
    while (v < n) {
      var bh = 0
      var best = Double.NegativeInfinity
      var h = 0
      while (h < n) {
        if (s(v)(h) > best) { best = s(v)(h); bh = h }
        h += 1
      }
      heads(v) = bh
      v += 1
    }
    findCycle(heads) match {
      case None => heads
      case Some(cycle) =>
        val inCycle = cycle.toSet
        val cycleScore = cycle.map(c => s(c)(heads(c))).sum
        // contracted graph: cycle becomes node `rep`
        val rep = cycle.head
        val ns = Array.fill(n, n)(Double.NegativeInfinity)
        // bookkeeping: for arcs into the cycle remember which member
        // receives; for arcs out of the cycle which member emits
        val enterVia = Array.fill(n)(-1)
        val leaveVia = Array.fill(n)(-1)
        for (d <- 0 until n; h <- 0 until n
            if s(d)(h) > Double.NegativeInfinity) {
          val dIn = inCycle.contains(d)
          val hIn = inCycle.contains(h)
          if (!dIn && !hIn) ns(d)(h) = math.max(ns(d)(h), s(d)(h))
          else if (dIn && !hIn) {
            // entering the cycle at d: break d's cycle arc
            val w = cycleScore - s(d)(heads(d)) + s(d)(h)
            if (w > ns(rep)(h)) { ns(rep)(h) = w; enterVia(h) = d }
          } else if (!dIn && hIn) {
            if (s(d)(h) > ns(d)(rep)) {
              ns(d)(rep) = s(d)(h); leaveVia(d) = h
            }
          }
        }
        val sub = chuLiuEdmonds(ns)
        val out = new Array[Int](n)
        // cycle arcs kept except where the chosen entry breaks in
        val entry = enterVia(sub(rep))
        cycle.foreach(c => out(c) = heads(c))
        out(entry) = sub(rep)
        for (d <- 1 until n if !inCycle.contains(d)) {
          out(d) = if (sub(d) == rep) leaveVia(d) else sub(d)
        }
        out
    }
  }

  private def findCycle(heads: Array[Int]): Option[Seq[Int]] = {
    val n = heads.length
    val state = new Array[Int](n) // 0 unseen, 1 in-progress, 2 done
    var v = 1
    while (v < n) {
      if (state(v) == 0) {
        var path = List.empty[Int]
        var cur = v
        while (cur != 0 && state(cur) == 0) {
          state(cur) = 1
          path ::= cur
          cur = heads(cur)
        }
        if (cur != 0 && state(cur) == 1) {
          // found a cycle: collect from cur around
          val cyc = path.takeWhile(_ != cur) :+ cur
          return Some(cyc)
        }
        path.foreach(state(_) = 2)
      }
      v += 1
    }
    None
  }
}
