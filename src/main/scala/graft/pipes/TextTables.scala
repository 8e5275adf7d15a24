package graft.pipes

import scala.collection.mutable.ArrayBuffer

import graft.nlp.Ent

/** Text-table detection (`eds.tables`, `/root/reference/edsnlp/pipes/misc/
  * tables/tables.py:15-275`): consecutive lines containing column
  * delimiters (| or ¦) form a table span; `toCells` exposes the
  * row/cell relation (`to_pd_table` analog — relationally, explode to a
  * (table_id, row, col, cell) table).
  */
object TextTables {

  case class Cell(row: Int, col: Int, begin: Int, end: Int, text: String)

  /** Table spans over the raw text. `minRows` mirrors the reference's
    * `min_rows` knob (tables.py, test_tables.py `min_rows=3`): shorter
    * delimiter-line runs are not tables.
    */
  def findTables(text: String, minRows: Int = 2): Seq[Ent] = {
    if (text == null) return Nil
    val out = new ArrayBuffer[Ent]
    var lineStart = 0
    var tableStart = -1
    var tableEnd = -1
    var nRows = 0
    def flush(): Unit = {
      if (tableStart >= 0 && nRows >= minRows)
        out += Ent(tableStart, tableEnd, "table",
          text.substring(tableStart, tableEnd),
          Map("n_rows" -> nRows.toString))
      tableStart = -1
      nRows = 0
    }
    (text + "\n").split("\n", -1).foreach { line =>
      val isRow = line.contains('|') || line.contains('¦')
      if (isRow) {
        if (tableStart < 0) tableStart = lineStart
        tableEnd = math.min(lineStart + line.length, text.length)
        nRows += 1
      } else flush()
      lineStart += line.length + 1
    }
    flush()
    out.toSeq
  }

  /** Explode one table span into its cells. */
  def toCells(text: String, table: Ent): Seq[Cell] = {
    val body = text.substring(table.begin, table.end)
    val cells = new ArrayBuffer[Cell]
    var row = 0
    var offset = table.begin
    body.split("\n", -1).foreach { line =>
      var col = 0
      var cellStart = 0
      var i = 0
      while (i <= line.length) {
        if (i == line.length || line(i) == '|' || line(i) == '¦') {
          val raw = line.substring(cellStart, i)
          val trimmed = raw.trim
          if (trimmed.nonEmpty) {
            val lead = raw.indexOf(trimmed)
            cells += Cell(row, col,
              offset + cellStart + lead,
              offset + cellStart + lead + trimmed.length, trimmed)
          }
          col += 1
          cellStart = i + 1
        }
        i += 1
      }
      row += 1
      offset += line.length + 1
    }
    cells.toSeq
  }
}
