package graft.nlp

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Approximate (fuzzy) terminology matching over char n-gram profiles —
  * the re-expression of the simstring matcher
  * (`/root/reference/edsnlp/matchers/simstring.py:52-316`, measures
  * `:45-50`): terms are indexed once into an inverted char-trigram index
  * with feature counts; candidate document windows (1..maxTokens visible
  * tokens) are scored by dice/jaccard/cosine/overlap similarity and kept
  * above a threshold.
  *
  * The index implements the simstring feature-count filter: a window with
  * q features can only match terms whose feature count lies in the
  * measure-dependent [minSize(q), maxSize(q)] band, so most terms are
  * never touched. The index is driver-built and ships in the task closure
  * (broadcast-equivalent); matching is row-local.
  */
final class FuzzyMatcher private (
    label: String,
    ngramToTerms: Map[String, Array[Int]],
    termFeatures: Array[Set[String]],
    termTexts: Array[String],
    measure: String,
    threshold: Double,
    maxTokens: Int,
    windowPad: String) extends Serializable {

  import FuzzyMatcher.ngrams

  private def sizeBand(q: Int): (Int, Int) = measure match {
    case "dice" =>
      (math.ceil(threshold / (2 - threshold) * q).toInt,
        math.floor((2 - threshold) / threshold * q).toInt)
    case "jaccard" =>
      (math.ceil(threshold * q).toInt, math.floor(q / threshold).toInt)
    case "cosine" =>
      (math.ceil(threshold * threshold * q).toInt,
        math.floor(q / (threshold * threshold)).toInt)
    case _ => (1, Int.MaxValue) // overlap
  }

  private def sim(overlap: Int, qa: Int, qb: Int): Double = measure match {
    case "dice" => 2.0 * overlap / (qa + qb)
    case "jaccard" => overlap.toDouble / (qa + qb - overlap)
    case "cosine" => overlap / math.sqrt(qa.toDouble * qb.toDouble)
    case _ => overlap.toDouble / math.min(qa, qb)
  }

  def findMatches(tokens: Array[Token], text: String): Seq[Ent] = {
    val visible = tokens.iterator.zipWithIndex
      .filter { case (t, _) => !t.excluded && !Normalizer.isSpace(t) }
      .map(_._2).toArray
    val out = new ArrayBuffer[Ent]
    var s = 0
    while (s < visible.length) {
      var w = 1
      while (w <= maxTokens && s + w <= visible.length) {
        val first = tokens(visible(s))
        val last = tokens(visible(s + w - 1))
        val windowNorm = tokens.slice(visible(s), visible(s + w - 1) + 1)
          .filter(t => !t.excluded)
          .map(t => if (Normalizer.isSpace(t)) " " else t.norm).mkString
        val feats = ngrams(windowPad + windowNorm + windowPad)
        if (feats.nonEmpty) {
          val (lo, hi) = sizeBand(feats.size)
          val counts = new mutable.HashMap[Int, Int]
          feats.foreach { g =>
            ngramToTerms.get(g).foreach(_.foreach { tid =>
              counts.update(tid, counts.getOrElse(tid, 0) + 1)
            })
          }
          var best: Option[(Int, Double)] = None
          counts.foreach { case (tid, overlap) =>
            val tb = termFeatures(tid).size
            if (tb >= lo && tb <= hi) {
              val sc = sim(overlap, feats.size, tb)
              if (sc >= threshold && best.forall(_._2 < sc))
                best = Some((tid, sc))
            }
          }
          best.foreach { case (tid, sc) =>
            out += Ent(first.begin, last.end, label,
              text.substring(first.begin, last.end),
              Map("term" -> termTexts(tid),
                "similarity" -> String.format(java.util.Locale.ROOT,
                  "%.4f", Double.box(sc))))
          }
        }
        w += 1
      }
      s += 1
    }
    // overlap resolution by SIMILARITY first (then length, then
    // position): an exact "doliprane" (sim 1.0) must beat the longer
    // "de doliprane" window — the reference's simstring matcher keeps
    // the best-scoring candidate, not the longest
    val claimed = new ArrayBuffer[(Int, Int)]
    out.toSeq
      .sortBy(e => (-e.attrs("similarity").toDouble,
        -(e.end - e.begin), e.begin))
      .filter { e =>
        val free =
          !claimed.exists { case (b, en) => e.begin < en && e.end > b }
        if (free) claimed += ((e.begin, e.end))
        free
      }
      .sortBy(_.begin)
  }
}

object FuzzyMatcher {
  private val pad = "##"

  private[nlp] def ngrams(s: String, n: Int = 3): Set[String] =
    if (s.length < n) Set(s) else s.sliding(n).toSet

  /** Build from a list of terminology terms. */
  def build(
      label: String,
      terms: Seq[String],
      measure: String = "dice",
      threshold: Double = 0.75,
      maxTokens: Int = 4): FuzzyMatcher = {
    val norm = terms.map(t =>
      Normalizer.mapChars(t.toLowerCase).replaceAll("\\s+", " ").trim)
    val feats = norm.map(t => ngrams(pad + t + pad)).toArray
    val inv = new mutable.HashMap[String, ArrayBuffer[Int]]
    feats.zipWithIndex.foreach { case (fs, i) =>
      fs.foreach(g => inv.getOrElseUpdate(g, new ArrayBuffer[Int]) += i)
    }
    new FuzzyMatcher(label,
      inv.view.mapValues(_.toArray).toMap, feats, terms.toArray,
      measure, threshold, maxTokens, pad)
  }
}
