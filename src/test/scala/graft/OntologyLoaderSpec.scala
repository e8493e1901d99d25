package graft

import java.nio.file.Files

import graft.model.{GraftOntology => O}
import graft.sources.OntologyLoader

/** Ontology term-table loading: round-trip the fixture ontology and load
 * a hand-written file (closing the "no real-ontology loader" gap — the
 * reference pulls the Biolink model over HTTP at startup,
 * biolink_helper.py:1-54; air-gapped deployments ship it as a file). */
class OntologyLoaderSpec extends SparkSpec {

  test("round-trip: GraftOntology -> TSV -> Ontology preserves semantics") {
    val path = Files.createTempDirectory("ont").resolve("terms.tsv").toString
    OntologyLoader.writeTsv(O.ontology, path)
    val loaded = OntologyLoader.fromFile(spark, path, "tsv")
    assert(loaded.parents == O.ontology.parents)
    assert(loaded.mixins == O.ontology.mixins)
    assert(loaded.mixinDirectMap == O.ontology.mixinDirectMap)
    assert(loaded.symmetric == O.ontology.symmetric)
    assert(loaded.canonicalOf == O.ontology.canonicalOf)
    assert(loaded.inverseOf == O.ontology.inverseOf)
    // semantic spot checks survive the trip
    assert(loaded.descendants(O.Actor, includeMixins = false) ==
      O.ontology.descendants(O.Actor, includeMixins = false))
    assert(loaded.considerBidirectional(O.AdjacentTo, Set(O.AdjacentTo)))
  }

  test("loads a hand-written term table with typed flags") {
    val dir = Files.createTempDirectory("ont2")
    val path = dir.resolve("mini.tsv").toString
    Files.writeString(java.nio.file.Path.of(path),
      "name\tparents\tis_mixin\tmixin_direct_mappings\tis_symmetric\tcanonical_predicate\n" +
        "x:root\t\tfalse\t\ttrue\t\n" +
        "x:child\tx:root\tfalse\t\tfalse\t\n" +
        "x:mix\tx:root\ttrue\tx:child\tfalse\t\n" +
        "x:inv\tx:child\tfalse\t\tfalse\tx:child\n")
    val ont = OntologyLoader.fromFile(spark, path, "tsv")
    assert(ont.parents("x:child") == Set("x:root"))
    assert(ont.mixins == Set("x:mix"))
    assert(ont.mixinDirectMap("x:mix") == Set("x:child"))
    assert(ont.symmetric == Set("x:root"))
    assert(ont.canonical("x:inv") == "x:child")
    assert(ont.descendants("x:root").contains("x:child"))
  }
}
