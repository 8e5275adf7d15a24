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

  /** One event argument: role name -> T/E target (`standoff.py:166-179`). */
  case class BratEventArg(role: String, ref_id: String)
  case class BratEvent(
      event_id: String,
      arguments: Seq[BratEventArg],
      attributes: Map[String, String])

  /** Full .ann parse result. `corrupt_lines` holds the lines that carry
    * an annotation prefix (T/A/M/R/E/#) but fail their grammar — in
    * lenient mode they are skipped AND surfaced (never a silent drop);
    * in strict mode the first one throws, like the reference's
    * `BratParsingError` (`standoff.py:37-40, 88-197`).
    */
  case class ParsedAnn(
      entities: Seq[BratEntity],
      relations: Seq[BratRelation],
      events: Seq[BratEvent],
      corrupt_lines: Seq[String])

  final class BratParsingException(line: String)
    extends IllegalArgumentException(s"unrecognized Brat line: $line")

  private val entityLine =
    "^(T\\d+)\\t([^\\s]+) ([^\\t]+)\\t(.*)$".r
  private val attrLine =
    "^([AM]\\d+)\\t([^\\s]+) ([TE]\\d+)(?: (.*))?$".r
  private val noteLine =
    "^(#\\d+)\\tAnnotatorNotes ([TE]\\d+)\\t(.*)$".r
  private val relationLine =
    "^(R\\d+)\\t([^\\s]+) Arg1:([TE]\\d+) Arg2:([TE]\\d+)\\s*$".r
  private val eventLine = "^(E\\d+)\\t(.+)$".r
  private val eventPart = "(\\S+):([TE]\\d+)".r

  /** Parse one .ann file's content against its text. */
  def parseAnn(text: String, ann: String,
      mergeSpacedFragments: Boolean = true): Seq[BratEntity] =
    parseAnnAll(text, ann, mergeSpacedFragments).entities

  /** Back-compat pair view: (entities, relations). */
  def parseAnnFull(text: String, ann: String,
      mergeSpacedFragments: Boolean = true)
      : (Seq[BratEntity], Seq[BratRelation]) = {
    val p = parseAnnAll(text, ann, mergeSpacedFragments)
    (p.entities, p.relations)
  }

  /** Full parse: entities + relations + events (E lines), with
    * strict/lenient malformed-line handling.
    */
  def parseAnnAll(text: String, ann: String,
      mergeSpacedFragments: Boolean = true,
      strict: Boolean = false): ParsedAnn = {
    if (ann == null || ann.isEmpty) return ParsedAnn(Nil, Nil, Nil, Nil)
    val relations = mutable.ArrayBuffer.empty[BratRelation]
    val entities = mutable.LinkedHashMap.empty[String, BratEntity]
    val events = mutable.LinkedHashMap.empty[String, BratEvent]
    val corrupt = mutable.ArrayBuffer.empty[String]
    def bad(line: String): Unit =
      if (strict) throw new BratParsingException(line)
      else corrupt += line
    ann.split("\n").iterator.map(_.stripLineEnd).filter(_.nonEmpty)
      .foreach { line =>
        line match {
          case entityLine(id, label, span, mention) =>
            // a malformed span list (missing offset, non-numeric) fails
            // THIS line only in lenient mode — one bad annotation must
            // not poison a corpus load — but is still counted
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
            }.getOrElse(bad(line))
          case attrLine(_, name, target, value) =>
            // bool coercion on read mirrors converters.py:297-306;
            // E targets route to events (standoff.py:134-144)
            val v = Option(value).getOrElse("true")
            if (target.startsWith("E"))
              events.get(target).foreach { ev =>
                events(target) =
                  ev.copy(attributes = ev.attributes + (name -> v))
              }
            else entities.get(target).foreach { e =>
              entities(target) =
                e.copy(attributes = e.attributes + (name -> v))
            }
          case noteLine(_, target, note) =>
            entities.get(target).foreach { e =>
              entities(target) = e.copy(notes = e.notes :+ note)
            }
          case relationLine(id, label, a1, a2) =>
            relations += BratRelation(id, label, a1, a2)
          case eventLine(id, argsTxt) =>
            val args = eventPart.findAllMatchIn(argsTxt)
              .map(m => BratEventArg(m.group(1), m.group(2))).toSeq
            if (args.isEmpty) bad(line)
            else events(id) = BratEvent(id, args, Map.empty)
          case other
            if other.headOption.exists("TAMRE#".contains(_)) &&
              other.length > 1 && other(1).isDigit =>
            // annotation-shaped but grammar-failed: corrupt, not ignorable
            bad(other)
          case _ => // non-annotation lines: ignored, like the reference
        }
      }
    ParsedAnn(entities.values.toSeq, relations.toSeq,
      events.values.toSeq, corrupt.toSeq)
  }

  private def basename(c: org.apache.spark.sql.Column) =
    regexp_extract(c, "([^/]+)\\.(txt|ann)$", 1)

  /** Read a directory of {doc}.txt + {doc}.ann into (doc_id, text,
    * entities, relations, events, corrupt_lines, n_corrupt_lines).
    *
    * `strict = true` mirrors the reference default (`standoff.py` raises
    * `BratParsingError`): the job fails on the first malformed
    * annotation line. Lenient (default here, the batch-engine call)
    * skips malformed lines but SURFACES them per doc — aggregate
    * `sum(n_corrupt_lines)` for the corpus-level corruption report.
    */
  def read(spark: SparkSession, dir: String,
      strict: Boolean = false): DataFrame =
    // DataSource V2 path ([[graft.sources.BratDataSource]]): driver
    // plans bounded splits over the .txt listing, the partition reader
    // pairs each with its .ann sibling, and column pruning skips .ann
    // parsing entirely when no annotation column is required
    spark.read.format("brat").option("strict", strict.toString).load(dir)

  /** Write (doc_id, text, entities[, relations]) back to {doc}.txt +
    * {doc}.ann — full round trip: attributes, annotator notes, and (when
    * the column is present) relations are re-emitted. Executor-local
    * writes (`foreachPartition`), no driver bottleneck.
    */
  def write(df: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val hasRelations = df.columns.contains("relations")
    val hasEvents = df.columns.contains("events")
    val cols = Seq("doc_id", "text", "entities") ++
      (if (hasRelations) Seq("relations") else Nil) ++
      (if (hasEvents) Seq("events") else Nil)
    val relIdx = 3
    val evtIdx = if (hasRelations) 4 else 3
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
            r.getSeq[org.apache.spark.sql.Row](relIdx).foreach { rel =>
              sb.append(s"${rel.getString(0)}\t${rel.getString(1)} " +
                s"Arg1:${rel.getString(2)} Arg2:${rel.getString(3)}\n")
            }
          if (hasEvents)
            r.getSeq[org.apache.spark.sql.Row](evtIdx).foreach { ev =>
              val id = ev.getAs[String]("event_id")
              val args = ev.getSeq[org.apache.spark.sql.Row](1)
                .map(a => s"${a.getString(0)}:${a.getString(1)}")
                .mkString(" ")
              sb.append(s"$id\t$args\n")
              ev.getAs[Map[String, String]]("attributes").toSeq
                .sortBy(_._1).foreach { case (k, v) =>
                  sb.append(s"A$attrId\t$k $id $v\n")
                  attrId += 1
                }
            }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"$docId.txt"), text)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"$docId.ann"), sb.toString)
        }
    }
  }
}
