package graft

import java.nio.file.{Files, Paths}
import graft.model.{GraftOntology => O}

/** Diagnostic main: dump the fixture ontology as JSON so external
 * tooling (e.g. tools/refbaseline.py, which runs the REFERENCE engine
 * on the exported fixture KGX to record a latency baseline) consumes
 * the exact DAG/mixin/canonical tables this engine queries with —
 * hand-duplicating them in Python would silently drift.
 * Args: [outPath] (default target/ontology.json). */
object OntologyExport {
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jarr(xs: Iterable[String]): String =
    xs.toSeq.sorted.map(jstr).mkString("[", ",", "]")

  private def jmapArr(m: Map[String, Set[String]]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jarr(v) }
      .mkString("{", ",", "}")

  private def jmapStr(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val out = Paths.get(if (args.nonEmpty) args(0) else "target/ontology.json")
    val o = O.ontology
    val json =
      s"""{
         |"parents":${jmapArr(o.parents)},
         |"mixins":${jarr(o.mixins)},
         |"mixin_direct_map":${jmapArr(o.mixinDirectMap)},
         |"symmetric":${jarr(o.symmetric)},
         |"canonical_of":${jmapStr(o.canonicalOf)},
         |"inverse_of":${jmapStr(o.inverseOf)},
         |"root_category":${jstr(o.rootCategory)},
         |"root_predicate":${jstr(o.rootPredicate)}
         |}""".stripMargin
    if (out.getParent != null) Files.createDirectories(out.getParent)
    Files.write(out, json.getBytes("UTF-8"))
    println(s"[ontology-export] wrote $out")
  }
}
