package graft

import java.nio.file.Files

import graft.model.{GraftOntology => O}
import graft.sources.KgxSource
import graft.sources.KgxSource.KgxConfig
import org.apache.spark.sql.functions._

/** KGX ingest: typed value parsing, array splitting, TSV + JSONL (+gz),
 * round-trip (ref: /root/reference/app/app/plover.py:458-551). */
class KgxSourceSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("TSV: value typing mirrors _load_value") {
    val dir = tmpDir("kgx-tsv")
    Files.writeString(java.nio.file.Path.of(dir, "nodes.tsv"),
      "id\tname\tcategory\tscore\tflag\tmissing\tnote\n" +
        "n1\tAlpha\tgraft:Part,graft:Tradeable\t42\tTrue\tnull\thello\n" +
        "n2\tBeta\tgraft:Nation\t3.5\tf\tNone\t\n")
    val nodes = KgxSource.readNodes(spark, s"$dir/nodes.tsv", "tsv")
      .orderBy("id").collect()
    val n1 = nodes(0)
    assert(n1.getSeq[String](n1.fieldIndex("categories")).toList == List("graft:Part", "graft:Tradeable"))
    assert(n1.getAs[Map[String, Double]]("num_attrs") == Map("score" -> 42.0))
    assert(n1.getAs[Map[String, String]]("attrs") ==
      Map("flag" -> "true", "note" -> "hello")) // 'null' cell pruned
    val n2 = nodes(1)
    assert(n2.getAs[Map[String, Double]]("num_attrs") == Map("score" -> 3.5))
    assert(n2.getAs[Map[String, String]]("attrs") == Map("flag" -> "false"))
  }

  test("TSV: negative numbers stay strings (reference isdigit semantics)") {
    val dir = tmpDir("kgx-neg")
    Files.writeString(java.nio.file.Path.of(dir, "nodes.tsv"),
      "id\tname\tcategory\tbal\nn1\tX\tgraft:Part\t-5.5\n")
    val n = KgxSource.readNodes(spark, s"$dir/nodes.tsv", "tsv").collect()(0)
    assert(n.getAs[Map[String, String]]("attrs") == Map("bal" -> "-5.5"))
    assert(n.getAs[Map[String, Double]]("num_attrs").isEmpty)
  }

  test("TSV: multi-dot values like 1.2.3 stay strings (regression: dropped from both maps)") {
    val dir = tmpDir("kgx-ver")
    Files.writeString(java.nio.file.Path.of(dir, "nodes.tsv"),
      "id\tname\tcategory\tver\nn1\tX\tgraft:Part\t1.2.3\n")
    val n = KgxSource.readNodes(spark, s"$dir/nodes.tsv", "tsv").collect()(0)
    assert(n.getAs[Map[String, String]]("attrs") == Map("ver" -> "1.2.3"))
    assert(n.getAs[Map[String, Double]]("num_attrs").isEmpty)
  }

  test("JSONL: typed columns keep their JSON types") {
    val dir = tmpDir("kgx-jsonl")
    Files.writeString(java.nio.file.Path.of(dir, "edges.jsonl"),
      """{"id":"e1","subject":"a","object":"b","predicate":"graft:located_in","weight":2.5,"tags":["x","y"],"ok":true}""" + "\n" +
        """{"id":"e2","subject":"b","object":"c","predicate":"graft:part_of","weight":1,"tags":["z"],"ok":false}""" + "\n")
    val edges = KgxSource.readEdges(spark, s"$dir/edges.jsonl", "jsonl")
      .orderBy("edge_id").collect()
    val e1 = edges(0)
    assert(e1.getAs[String]("predicate") == "graft:located_in")
    assert(e1.getAs[Map[String, Double]]("num_attrs") == Map("weight" -> 2.5))
    assert(e1.getMap[String, Any](e1.fieldIndex("list_attrs")).mapValues(_.asInstanceOf[scala.collection.Seq[String]].toList).toMap == Map("tags" -> List("x", "y")))
    assert(e1.getAs[Map[String, String]]("attrs") == Map("ok" -> "true"))
    assert(edges(1).getAs[Map[String, String]]("attrs") == Map("ok" -> "false"))
  }

  test("gzipped TSV reads transparently") {
    val dir = tmpDir("kgx-gz")
    val content = "id\tname\tcategory\nn1\tX\tgraft:Part\n"
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/nodes.tsv.gz"))
    gz.write(content.getBytes("UTF-8")); gz.close()
    val nodes = KgxSource.readNodes(spark, s"$dir/nodes.tsv.gz", "tsv").collect()
    assert(nodes.length == 1 && nodes(0).getAs[String]("id") == "n1")
  }

  test("unknown format is rejected") {
    intercept[IllegalArgumentException] {
      KgxSource.readRaw(spark, "/nonexistent", "csv")
    }
  }

  test("streaming KGX ingest: canonicalization applies per micro-batch") {
    val dir = tmpDir("kgx-stream")
    // placed_by is non-canonical: the builder must flip it mid-stream
    Files.writeString(java.nio.file.Path.of(dir, "edges1.tsv"),
      "id\tsubject\tobject\tpredicate\tweight\n" +
        "e1\tORD:1\tCUST:1\tgraft:placed_by\t2\n" +
        "e2\tCUST:2\tNAT:1\tgraft:located_in\t3\n")
    val stream = KgxSource.readEdgesStream(spark, dir,
      columns = Seq("id", "subject", "object", "predicate", "weight"))
    val canonical = graft.sources.GraphBuilder.canonicalizeEdges(
      graft.sources.GraphBuilder.pruneEmptyAttrs(stream), O.ontology)
    val q = canonical.writeStream.format("memory").queryName("kgx_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("kgx_stream")
      .select("edge_id", "subject", "object", "predicate")
      .orderBy("edge_id").collect()
    assert(rows.length == 2)
    // e1 flipped to canonical CUST placed ORD
    assert(rows(0).getString(1) == "CUST:1" && rows(0).getString(2) == "ORD:1")
    assert(rows(0).getString(3) == graft.model.GraftOntology.Placed)
    assert(rows(1).getString(3) == graft.model.GraftOntology.LocatedIn)
    // typed parsing still applies in streaming mode
    val w = spark.table("kgx_stream").orderBy("edge_id")
      .select("num_attrs").collect()(0).getAs[Map[String, Double]](0)
    assert(w == Map("weight" -> 2.0))
  }

  test("fetchToSpool: url basename, as-served bytes, md5 sidecar, idempotent re-fetch") {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(tmpDir("kgx-url-src"), "drop.tsv.gz")
    Files.createDirectories(src.getParent)
    val payload = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    Files.write(src, payload)
    val spool = tmpDir("kgx-url-spool")
    // query/fragment are stripped from the spooled name (plover.py:316)
    val url = src.toUri.toString + "?version=3#frag"
    val dest = KgxSource.fetchToSpool(url, spool)
    assert(dest.getFileName.toString == "drop.tsv.gz")
    // bytes land AS SERVED (no decompress/transform)
    assert(Files.readAllBytes(dest).sameElements(payload))
    val sidecar = dest.resolveSibling(".drop.tsv.gz.md5")
    assert(Files.exists(sidecar))
    // idempotent re-fetch: matching sidecar short-circuits (unchanged mtime)
    val t0 = Files.getLastModifiedTime(dest)
    KgxSource.fetchToSpool(url, spool)
    assert(Files.getLastModifiedTime(dest) == t0)
    // corrupted spool file no longer matches its sidecar -> re-fetched
    Files.write(dest, Array[Byte](1, 2, 3))
    KgxSource.fetchToSpool(url, spool)
    assert(Files.readAllBytes(dest).sameElements(payload))
    // unreachable URL fails after bounded retries
    intercept[RuntimeException] {
      KgxSource.fetchToSpool(src.toUri.toString + ".missing", spool,
        retries = 2, backoffMillis = 1L)
    }
  }

  test("equivMapFromDump: jsonl and tsv dumps, identity rows, min-preferred tie-break") {
    import graft.operators.Normalizer
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("nodenorm")
    Files.createDirectories(Paths.get(dir))
    // B:1 is claimed by two clusters -> min preferred id (NAT:1) wins
    Files.write(Paths.get(dir, "dump.jsonl"),
      ("""{"id":"NAT:1","equivalent_identifiers":["A:1","B:1"]}""" + "\n" +
       """{"id":"NAT:2","equivalent_identifiers":["B:1"]}""" + "\n" +
       """{"id":"REG:9","equivalent_identifiers":[]}""" + "\n").getBytes("UTF-8"))
    val m = Normalizer.equivMapFromDump(spark, s"$dir/dump.jsonl", "jsonl")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("A:1" -> "NAT:1", "B:1" -> "NAT:1",
      "NAT:1" -> "NAT:1", "NAT:2" -> "NAT:2", "REG:9" -> "REG:9"))
    Files.write(Paths.get(dir, "dump.tsv"),
      ("id\tequivalent_identifiers\nNAT:1\tA:1|B:1\nNAT:2\tB:1\nREG:9\t\n")
        .getBytes("UTF-8"))
    val mt = Normalizer.equivMapFromDump(spark, s"$dir/dump.tsv", "tsv")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mt == m)
  }

  test("round-trip: fixture graph -> KGX TSV(gz) -> PropertyGraph preserves core") {
    val sfDir = "/root/testdata/sf0.001"
    val g = graft.sources.TpchGraph(spark, sfDir)
    val out = tmpDir("kgx-rt")
    KgxSource.writeTsv(g, out, attrColumns = Seq("mktsegment"), compress = true)
    val cfg = KgxConfig(arrayProperties = Set("category", "tags"))
    val g2 = graft.model.PropertyGraph(
      KgxSource.readNodes(spark, s"$out/nodes", "tsv", cfg),
      KgxSource.readEdges(spark, s"$out/edges", "tsv", cfg))
    assert(g2.nodes.count() == g.nodes.count())
    assert(g2.edges.count() == g.edges.count())
    // categories survive the delimiter round-trip
    val cats = g2.nodes.where(col("id") === "PART:1")
      .select("categories").collect()(0).getSeq[String](0).toSet
    assert(cats == Set(O.Part, O.Tradeable))
    // edge cores identical as sets
    val before = g.edges.select("edge_id", "subject", "object", "predicate")
    val after = g2.edges.select("edge_id", "subject", "object", "predicate")
    assert(before.exceptAll(after).count() == 0)
    assert(after.exceptAll(before).count() == 0)
  }
}
