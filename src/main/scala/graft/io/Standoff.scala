package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** BRAT standoff source/sink (`.txt` + `.ann` pairs) — the re-expression of
  * `/root/reference/edsnlp/data/standoff.py` (parser `:37-277`, reader
  * `:278-343`, writer `:344-400`) as a Spark source: both file sets are
  * read distributed (`wholetext`), paired by basename with an equi-join,
  * and the `.ann` grammar (T/A/M/#/R lines) is parsed row-locally into the
  * nested entity schema of FIXTURES.md §3 (fragments, attributes, notes;
  * newline-split fragments merged).
  *
  * Scale: file reads parallelize across executors; the basename join is
  * between two file-sized tables (broadcastable); no driver round-trip.
  * For millions of small files the production move is packing into
  * sequence/parquet first — the parser itself is unchanged.
  */
object Standoff {

  case class Fragment(begin: Int, end: Int)
  case class BratEntity(
      entity_id: String,
      label: String,
      text: String,
      fragments: Seq[Fragment],
      attributes: Map[String, String],
      notes: Seq[String])

  case class BratRelation(
      relation_id: String, label: String, arg1: String, arg2: String)

  private val entityLine =
    "^(T\\d+)\\t([^\\s]+) ([^\\t]+)\\t(.*)$".r
  private val attrLine =
    "^([AM]\\d+)\\t([^\\s]+) ([TE]\\d+)(?: (.*))?$".r
  private val noteLine =
    "^(#\\d+)\\tAnnotatorNotes ([TE]\\d+)\\t(.*)$".r
  private val relationLine =
    "^(R\\d+)\\t([^\\s]+) Arg1:([TE]\\d+) Arg2:([TE]\\d+)\\s*$".r

  /** Parse one .ann file's content against its text. */
  def parseAnn(text: String, ann: String,
      mergeSpacedFragments: Boolean = true): Seq[BratEntity] =
    parseAnnFull(text, ann, mergeSpacedFragments)._1

  /** Full parse: (entities, relations). */
  def parseAnnFull(text: String, ann: String,
      mergeSpacedFragments: Boolean = true)
      : (Seq[BratEntity], Seq[BratRelation]) = {
    if (ann == null || ann.isEmpty) return (Nil, Nil)
    val relations = mutable.ArrayBuffer.empty[BratRelation]
    val entities = mutable.LinkedHashMap.empty[String, BratEntity]
    ann.split("\n").iterator.map(_.stripLineEnd).filter(_.nonEmpty)
      .foreach {
        case entityLine(id, label, span, mention) =>
          // lenient end-to-end: a malformed span list (missing offset,
          // non-numeric, out of text bounds) skips THIS line, like every
          // other unrecognized line — one bad annotation must not poison
          // a corpus load
          scala.util.Try {
            val ranges = span.split(";").toSeq.map { s =>
              val parts = s.trim.split("\\s+")
              (parts(0).toInt, parts(1).toInt)
            }.sorted
            val frags = mutable.ArrayBuffer.empty[Fragment]
            ranges.foreach { case (b, e) =>
              if (mergeSpacedFragments && frags.nonEmpty &&
                text != null && frags.last.end <= b && b <= text.length &&
                frags.last.end >= 0 &&
                text.substring(frags.last.end, b).trim.isEmpty)
                frags(frags.size - 1) = frags.last.copy(end = e)
              else frags += Fragment(b, e)
            }
            entities(id) =
              BratEntity(id, label, mention, frags.toSeq, Map.empty, Nil)
          }
        case attrLine(_, name, target, value) =>
          entities.get(target).foreach { e =>
            // bool coercion on read mirrors converters.py:297-306
            val v = Option(value).getOrElse("true")
            entities(target) = e.copy(attributes = e.attributes + (name -> v))
          }
        case noteLine(_, target, note) =>
          entities.get(target).foreach { e =>
            entities(target) = e.copy(notes = e.notes :+ note)
          }
        case relationLine(id, label, a1, a2) =>
          relations += BratRelation(id, label, a1, a2)
        case _ => // events (E lines) and unrecognized lines: lenient skip
      }
    (entities.values.toSeq, relations.toSeq)
  }

  // single parse per row: one UDF yields both layers as a struct
  private val parseFullUdf = udf((text: String, ann: String) =>
    parseAnnFull(text, ann))

  private def basename(c: org.apache.spark.sql.Column) =
    regexp_extract(c, "([^/]+)\\.(txt|ann)$", 1)

  /** Read a directory of {doc}.txt + {doc}.ann into
    * (doc_id, text, entities).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val txt = spark.read.option("wholetext", "true").text(s"$dir/*.txt")
      .select(basename(input_file_name()).as("doc_id"),
        col("value").as("text"))
    val ann = spark.read.option("wholetext", "true").text(s"$dir/*.ann")
      .select(basename(input_file_name()).as("doc_id"),
        col("value").as("ann"))
    txt.join(ann, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        parseFullUdf(col("text"), coalesce(col("ann"), lit("")))
          .as("parsed"))
      .select(col("doc_id"), col("text"),
        col("parsed._1").as("entities"),
        col("parsed._2").as("relations"))
  }

  /** Write (doc_id, text, entities[, relations]) back to {doc}.txt +
    * {doc}.ann — full round trip: attributes, annotator notes, and (when
    * the column is present) relations are re-emitted. Executor-local
    * writes (`foreachPartition`), no driver bottleneck.
    */
  def write(df: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val hasRelations = df.columns.contains("relations")
    val cols =
      if (hasRelations) Seq("doc_id", "text", "entities", "relations")
      else Seq("doc_id", "text", "entities")
    df.select(cols.map(col): _*).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val docId = r.getString(0)
          val text = r.getString(1)
          val sb = new StringBuilder
          var attrId = 1
          var noteId = 1
          r.getSeq[org.apache.spark.sql.Row](2).foreach { e =>
            val id = e.getAs[String]("entity_id")
            val label = e.getAs[String]("label")
            val frags = e.getSeq[org.apache.spark.sql.Row](3)
              .map(f => s"${f.getInt(0)} ${f.getInt(1)}")
              .mkString(";")
            val mention = e.getAs[String]("text")
            sb.append(s"$id\t$label $frags\t$mention\n")
            e.getAs[Map[String, String]]("attributes").toSeq.sortBy(_._1)
              .foreach { case (k, v) =>
                sb.append(s"A$attrId\t$k $id $v\n")
                attrId += 1
              }
            e.getSeq[String](5).foreach { note =>
              sb.append(s"#$noteId\tAnnotatorNotes $id\t$note\n")
              noteId += 1
            }
          }
          if (hasRelations)
            r.getSeq[org.apache.spark.sql.Row](3).foreach { rel =>
              sb.append(s"${rel.getString(0)}\t${rel.getString(1)} " +
                s"Arg1:${rel.getString(2)} Arg2:${rel.getString(3)}\n")
            }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"$docId.txt"), text)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"$docId.ann"), sb.toString)
        }
    }
  }
}
