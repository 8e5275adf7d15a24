package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CoNLL-U reader (`/root/reference/edsnlp/data/conll.py:107-160`): each
  * blank-line-separated block is a sentence; `#`-lines are metadata; data
  * lines are 10 tab-separated columns (ID FORM LEMMA UPOS XPOS FEATS HEAD
  * DEPREL DEPS MISC). One output row per sentence with a words array —
  * the schema of FIXTURES.md §5.
  *
  * Distribution: whole files read in executors; block split + field parse
  * are row-local expressions (split/filter/transform), no UDF.
  */
object Conll {

  private val cols = Seq("ID", "FORM", "LEMMA", "UPOS", "XPOS", "FEATS",
    "HEAD", "DEPREL", "DEPS", "MISC")

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("source_file"), col("value"))
    raw
      .select(col("source_file"),
        posexplode(split(col("value"), "\\n\\s*\\n")).as(Seq("sent_id", "block")))
      .filter(trim(col("block")) =!= "")
      .withColumn("lines",
        filter(split(col("block"), "\n"),
          l => trim(l) =!= "" && !l.startsWith("#")))
      .withColumn("words",
        transform(col("lines"), l => {
          val f = split(l, "\t")
          // try_element_at: a truncated data line yields null fields
          // instead of an ANSI INVALID_ARRAY_INDEX job failure
          struct(cols.zipWithIndex.map { case (name, i) =>
            try_element_at(f, lit(i + 1)).as(name)
          }: _*)
        }))
      .filter(size(col("words")) > 0)
      .select(col("source_file"), col("sent_id"), col("words"))
  }
}
