package graft.tools

import java.util.regex.Pattern
import org.apache.spark.sql.SparkSession

/** Per-pattern pollution-regex cost on the real corpus (dev tool). */
object ProfRegex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .appName("prof-regex").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sample = graft.relational.Tables.documents(spark, sfDir)
      .select("text").limit(2000).collect().map(_.getString(0))
    val pats = Seq(
      "bars" -> "(?i)([nbw]|_|-|=){5,}",
      "web" -> "www\\.\\S*|\\S*@\\S*|\\S*\\.(?:fr|com|net|org)\\b",
      "hyphen" -> "(?<![\\W\\d_])-\\n",
      "doctor" -> "(?mi)(^((dr)|(pr))(\\.|\\s|of).*)+",
      "info1" -> ("(?s)(=====+\\s*)?(Les\\s*donn[ée]es\\s*administratives,\\s*sociales\\s*" +
        "|I?nfo\\s*rmation\\s*aux?\\s*patients?" +
        "|L['’]AP-HP\\s*collecte\\s*vos\\s*donn[ée]es\\s*administratives)" +
        ".{0,2000}?https?://\\S*droit-opposition[\\s.]*"),
      "imprime" -> "(?im)^\\s*imprim.\\sle\\s\\d\\d/\\d\\d/\\d\\d\\d\\d\\b[^\\n]{0,30}$",
      "pagepat" -> "(?im)^\\d\\d?/\\d\\d?\\s?[^\\n]*\\n?pat[^\\n]*(\\n?courrier valid[^\\n]*)?",
      "ipp" -> "(?i)[^\\n]*\\b\\d\\d/\\d\\d/\\d\\d\\d\\d\\b[^\\n]*80\\d{8}[^\\n]*",
      "info2" -> ("(?s)L['’]Assistance\\s*Publique\\s*-\\s*H[ôo]pitaux\\s*de\\s*Paris\\s*" +
        "\\(?AP-HP\\)?\\s*a\\s*cr[éee]{1,2}\\s*une\\s*base\\s*de\\s*donn[ée]es" +
        ".{0,2000}?https?://\\S*droit-opposition[\\s.]*"),
      "tobacco" -> ("(?si)l['’]arr[êe]t\\s*du\\s*tabac\\s*permet\\s*de\\s*diminuer\\s*le\\s*" +
        "risque\\s*de\\s*maladie\\s*cardiovasculaire\\.")
    ).map { case (n, p) => (n, Pattern.compile(p)) }
    pats.foreach { case (name, p) =>
      val t0 = System.nanoTime()
      var hits = 0
      sample.foreach { t =>
        val m = p.matcher(t)
        while (m.find()) hits += 1
      }
      println(f"PROFR $name%-8s ${(System.nanoTime() - t0) / 1e9}%8.3f s  hits=$hits")
    }
    spark.stop()
  }
}
