package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NER / span-attribute evaluation aggregations — the reduce layer of the
  * reference (`/root/reference/edsnlp/metrics/ner.py:34-190`,
  * `span_attribute.py:52-340`, prf `metrics/__init__.py:33-46`), restated
  * relationally: set semantics via joins on the (doc, begin, end, label)
  * key, per-label AND micro P/R/F1 in one pass via grouping sets.
  *
  * Inputs are entity tables: (doc_id, begin, end, label [, attr...]).
  * All aggregations are partial-aggregated map-side; the grouping-sets
  * form computes per-label and micro rows in a single shuffle.
  */
object NerMetrics {

  private def prf(tp: Column, nPred: Column, nGold: Column): Seq[Column] = {
    val p = tp / greatest(nPred, lit(1L))
    val r = tp / greatest(nGold, lit(1L))
    Seq(
      round(p, 4).as("precision"),
      round(r, 4).as("recall"),
      round(when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 4)
        .as("f1"),
      tp.as("tp"), nPred.as("n_pred"), nGold.as("n_gold"))
  }

  /** Exact-span NER metric: per-label rows plus a micro row
    * (label = 'micro'), one pass (`ner.py:34-64` computes both
    * simultaneously).
    *
    * Set semantics on ALL THREE counters — the reference builds sets of
    * (begin, end, label), so duplicate identical spans in either input
    * must not deflate precision/recall. [[setCounts]] realizes the sets,
    * the intersection and the per-label counts from a single union-flag
    * shuffle (one exchange where the round-1 `intersect` form planned
    * four).
    */
  /** Set-semantics (tp, n_pred, n_gold) per `groupCol` in ONE data-sized
    * shuffle: union both sides with membership flags, groupBy the full
    * item key with max-flags (this IS the distinct AND the intersection
    * — no separate distincts, no join), then a small groupBy(groupCol)
    * that partial-aggregates map-side. Shared by [[nerExact]] and
    * [[spanAttribute]]; inputs need NOT be pre-distinct'd.
    */
  private def setCounts(
      p: DataFrame, g: DataFrame, key: Seq[String],
      groupCol: String): DataFrame = {
    val u = p.select(key.map(col) :+ lit(1).as("p") :+ lit(0).as("g"): _*)
      .unionByName(
        g.select(key.map(col) :+ lit(0).as("p") :+ lit(1).as("g"): _*))
    u.groupBy(key.map(col): _*)
      .agg(max(col("p")).as("in_p"), max(col("g")).as("in_g"))
      .groupBy(col(groupCol))
      .agg(sum(col("in_p") * col("in_g")).cast("long").as("tp"),
        sum(col("in_p")).cast("long").as("np"),
        sum(col("in_g")).cast("long").as("ng"))
  }

  def nerExact(pred: DataFrame, gold: DataFrame): DataFrame = {
    val key = Seq("doc_id", "begin", "end", "label")
    val p = pred.select(key.map(col): _*)
    val g = gold.select(key.map(col): _*)
    val counts = setCounts(p, g, key, "label")
    val perLabel = counts.select(
      col("label") +: prf(col("tp").cast("double"), col("np"), col("ng")): _*)
    val micro = counts.agg(sum("tp").as("tp"), sum("np").as("np"),
      sum("ng").as("ng"))
      .select(lit("micro").as("label") +:
        prf(col("tp").cast("double"), col("np"), col("ng")): _*)
    perLabel.unionByName(micro)
  }

  /** Char-level NER metric: explode each span into its char positions
    * (`sequence(begin, end-1)`) then exact-set logic. NOTE this weights
    * entities by their character length — it is NOT the reference's
    * token metric (`ner.py:66-99` counts tokens); see [[nerToken]] for
    * that. Kept as the tokenization-free variant (useful when no text is
    * at hand to tokenize).
    */
  def nerChar(pred: DataFrame, gold: DataFrame): DataFrame = {
    def toPositions(df: DataFrame): DataFrame =
      df.filter(col("end") > col("begin")) // zero-length spans (legal in
        // BRAT) would make sequence() count DOWN and fabricate positions
        .select(col("doc_id"), col("label"),
          explode(sequence(col("begin"), col("end") - 1)).as("pos"))
        // no distinct: setCounts dedups on the item key in its own pass
        .withColumnRenamed("pos", "begin")
        .withColumn("end", col("begin") + 1)
    nerExact(toPositions(pred), toPositions(gold))
  }

  /** Token-level NER metric matching `ner.py:66-99`: each span becomes
    * the set of TOKEN INDICES it overlaps (items `(doc_id, token_i,
    * label)`), so scores count tokens — an 8-token entity weighs 8, a
    * 40-char one does not weigh 40. Needs the doc text to tokenize:
    * `docs` is `(idCol, textCol)`; spans join to their doc's tokens by
    * char-interval overlap (per-doc local, no window).
    */
  def nerToken(pred: DataFrame, gold: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // drop whitespace tokens before indexing: spaCy docs have no bare
    // space tokens, so the reference's token.i never counts them
    val tokUdf = udf((text: String) =>
      graft.nlp.Tokenizer.tokenize(text)
        .filter(t => t.text.exists(!_.isWhitespace))
        .zipWithIndex.map { case (t, i) => (i, t.begin, t.end) })
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokUdf(col(textCol))).as("t"))
      .select(col("doc_id"), col("t._1").as("ti"),
        col("t._2").as("tb"), col("t._3").as("te"))
    def items(spans: DataFrame): DataFrame =
      spans.select(col("doc_id"), col("begin"), col("end"), col("label"))
        .join(toks, Seq("doc_id"))
        .filter(col("tb") < col("end") && col("te") > col("begin"))
        .select(col("doc_id"), col("ti").as("begin"),
          (col("ti") + 1).as("end"), col("label"))
    nerExact(items(pred), items(gold))
  }

  /** Overlap-tolerant metric with a Dice threshold — the full reference
    * semantics (`ner.py:101-190`): a PRED span counts when its best
    * same-label gold Dice reaches the threshold; a GOLD span counts when
    * its best-Dice pred over ALL labels reaches the threshold AND that
    * argmax pred carries the same label. The two sides can disagree, so
    * p = tp/n_pred, r = tp_gold/n_gold, and f is the harmonic
    * `2/(n_pred/tp + n_gold/tp_gold)` (0 when either side is empty;
    * p/r default to 1 on empty denominators). Span units are whatever
    * the caller's begin/end are in — the reference counts TOKENS.
    * Distributed shape: two doc-equi joins + per-span max aggregations,
    * no window.
    */
  def nerOverlap(
      pred: DataFrame, gold: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val p = pred.select(col("doc_id"), col("begin"), col("end"),
      col("label")).distinct().alias("p")
    val g = gold.select(col("doc_id"), col("begin"), col("end"),
      col("label")).distinct().alias("g")
    val inter = greatest(lit(0),
      least(col("p.end"), col("g.end")) -
        greatest(col("p.begin"), col("g.begin")))
    val dice = inter.cast("double") * 2.0 /
      ((col("p.end") - col("p.begin")) + (col("g.end") - col("g.begin")))
    // pred side: best dice among SAME-LABEL golds
    val predBest = p.join(g,
        col("p.doc_id") === col("g.doc_id") &&
          col("p.label") === col("g.label"), "left")
      .groupBy(col("p.doc_id"), col("p.begin"), col("p.end"),
        col("p.label").as("label"))
      .agg(max(when(col("g.begin").isNotNull, dice).otherwise(-1.0))
        .as("best"))
    // gold side: best dice among ALL preds, argmax label must agree
    val goldBest = g.join(p,
        col("p.doc_id") === col("g.doc_id"), "left")
      .groupBy(col("g.doc_id"), col("g.begin"), col("g.end"),
        col("g.label").as("label"))
      .agg(max(when(col("p.begin").isNotNull,
          struct(dice.as("d"), col("p.label").as("pl"))))
        .as("m"))
    def withMicro(df: DataFrame): DataFrame =
      df.unionByName(df.withColumn("label", lit("micro")))
    val counts = withMicro(
        predBest.select(col("label"),
          when(col("best") >= threshold, 1L).otherwise(0L).as("tp"),
          lit(1L).as("np"), lit(0L).as("tpg"), lit(0L).as("ng")))
      .unionByName(withMicro(
        goldBest.select(col("label"), lit(0L).as("tp"),
          lit(0L).as("np"),
          when(col("m").isNotNull && col("m.d") >= threshold &&
            col("m.pl") === col("label"), 1L).otherwise(0L).as("tpg"),
          lit(1L).as("ng"))))
      .groupBy("label")
      .agg(sum("tp").as("tp"), sum("np").as("np"),
        sum("tpg").as("tpg"), sum("ng").as("ng"))
    counts.select(
      col("label"),
      round(when(col("np") === 0, 1.0)
        .otherwise(col("tp") / col("np")), 4).as("precision"),
      round(when(col("ng") === 0, 1.0)
        .otherwise(col("tpg") / col("ng")), 4).as("recall"),
      round(when(col("tp") > 0 && col("tpg") > 0,
        lit(2.0) / (col("np") / col("tp") + col("ng") / col("tpg")))
        .otherwise(0.0), 4).as("f1"),
      col("tp"), col("np").as("n_pred"), col("ng").as("n_gold"))
  }

  /** Span-attribute classification metric matching
    * `span_attribute.py:52-340`: items are `(doc_id, begin, end, attr,
    * value)` SETS built from BOTH sides independently (spans present on
    * only one side count against precision/recall — no inner-join
    * narrowing), scored per-attribute plus micro with the reference's prf
    * (`metrics/__init__.py:33-46`: `p = 1 if tp == n_pred`, `f =
    * 2·tp/max(1, n_pred+n_gold)`). With the reference's default
    * `include_falsy=False`, falsy values (null, '', 'false', '0') are not
    * items.
    */
  def spanAttribute(
      pred: DataFrame, gold: DataFrame, attrs: Seq[String],
      includeFalsy: Boolean = false,
      splitByValues: Boolean = false): DataFrame = {
    def items(df: DataFrame): DataFrame = {
      val av = array(attrs.map(a => struct(lit(a).as("attr"),
        col(a).cast("string").as("value"))): _*)
      val base0 = df.select(col("doc_id"), col("begin"), col("end"),
        explode(av).as("av"))
        .select(col("doc_id"), col("begin"), col("end"),
          col("av.attr").as("attr"), col("av.value").as("value"))
      // split_by_values (span_attribute.py): per-(attr, value) rows —
      // the group label becomes "attr=value", micro is unchanged
      val base =
        if (splitByValues) base0.withColumn("attr",
          concat(col("attr"), lit("="), col("value")))
        else base0
      val kept =
        if (includeFalsy) base.filter(col("value").isNotNull)
        else base.filter(col("value").isNotNull &&
          !lower(col("value")).isin("", "false", "0", "none"))
      kept // setCounts dedups on the item key
    }
    val key = Seq("doc_id", "begin", "end", "attr", "value")
    val p = items(pred)
    val g = items(gold)
    val counts = setCounts(p, g, key, "attr")
    val withMicro = counts.unionByName(
      counts.agg(sum("tp").as("tp"), sum("np").as("np"),
        sum("ng").as("ng")).select(lit("micro").as("attr"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("np"), lit(0L)).as("np"),
        coalesce(col("ng"), lit(0L)).as("ng")))
    withMicro.select(col("attr"),
      round(when(col("tp") === col("np"), lit(1.0))
        .otherwise(col("tp") / col("np")), 4).as("precision"),
      round(when(col("tp") === col("ng"), lit(1.0))
        .otherwise(col("tp") / col("ng")), 4).as("recall"),
      round(lit(2.0) * col("tp") /
        greatest(col("np") + col("ng"), lit(1L)), 4).as("f1"),
      col("tp"), col("np").as("n_pred"), col("ng").as("n_gold"))
  }

  /** Attribute accuracy over MATCHED spans only (inner join on the span
    * key) — a deliberate narrowing of [[spanAttribute]] for the common
    * "how often do the two sides agree where they both found the span"
    * question; unmatched spans are excluded by construction.
    */
  def spanAttributeAccuracy(
      pred: DataFrame, gold: DataFrame, attr: String): DataFrame = {
    val key = Seq("doc_id", "begin", "end", "label")
    val joined = pred.select((key :+ attr).map(col): _*)
      .withColumnRenamed(attr, "pred_value")
      .join(gold.select((key :+ attr).map(col): _*)
        .withColumnRenamed(attr, "gold_value"), key)
    joined.agg(
      count(lit(1)).as("n_spans"),
      round(avg(when(col("pred_value") === col("gold_value"), 1.0)
        .otherwise(0.0)), 4).as("accuracy"))
  }
}
