package graft

import graft.model.{GraftOntology => O}
import graft.sources.GraphBuilder
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Ingest transforms (ref: /root/reference/app/app/plover.py:725-1380). */
class GraphBuilderSpec extends SparkSpec {

  import spark.implicits._

  test("pruneToMostSpecific drops proper non-mixin ancestors, keeps mixins") {
    val nodes = Seq(("n1", "x")).toDF("id", "name")
      .withColumn("categories",
        typedLit(Seq(O.Part, O.Item, O.Entity, O.Tradeable)))
    val res = GraphBuilder.pruneToMostSpecific(nodes, O.ontology)
      .select("categories").as[Seq[String]].head()
    // Item and Entity are proper ancestors of Part => dropped;
    // Tradeable is a mixin => kept.
    assert(res.toSet == Set(O.Part, O.Tradeable))
  }

  private def edgeDF(pred: String, qp: String = null) =
    Seq(("e1", "a", "b")).toDF("edge_id", "subject", "object")
      .withColumn("predicate", lit(pred))
      .withColumn("qualified_predicate", lit(qp).cast("string"))
      .withColumn("object_direction", lit(null).cast("string"))
      .withColumn("object_aspect", lit(null).cast("string"))
      .withColumn("primary_knowledge_source", lit("infores:x"))
      .withColumn("attrs", typedLit(Map.empty[String, String]))
      .withColumn("num_attrs", typedLit(Map.empty[String, Double]))
      .withColumn("list_attrs", typedLit(Map.empty[String, Seq[String]]))

  test("canonicalizeEdges flips non-canonical predicates") {
    val res = GraphBuilder.canonicalizeEdges(edgeDF(O.PlacedBy), O.ontology)
      .select("subject", "object", "predicate").head()
    assert(res == Row("b", "a", O.Placed))
    val same = GraphBuilder.canonicalizeEdges(edgeDF(O.LocatedIn), O.ontology)
      .select("subject", "object", "predicate").head()
    assert(same == Row("a", "b", O.LocatedIn))
  }

  test("coerceTrialPhases maps known codes to enums, leaves 3.5 numeric") {
    val e = edgeDF(O.LocatedIn)
      .withColumn("num_attrs", typedLit(Map("phase" -> 2.5, "other" -> 7.0)))
    val res = GraphBuilder.coerceTrialPhases(e, Seq("phase")).head()
    val attrs = res.getAs[Map[String, String]]("attrs")
    val nums = res.getAs[Map[String, Double]]("num_attrs")
    assert(attrs("phase") == "clinical_trial_phase_2_to_3")
    assert(!nums.contains("phase") && nums("other") == 7.0)

    val unmapped = edgeDF(O.LocatedIn)
      .withColumn("num_attrs", typedLit(Map("phase" -> 3.5)))
    val res2 = GraphBuilder.coerceTrialPhases(unmapped, Seq("phase")).head()
    assert(res2.getAs[Map[String, Double]]("num_attrs")("phase") == 3.5)
    assert(!res2.getAs[Map[String, String]]("attrs").contains("phase"))
  }

  test("zipListAttrs zips parallel arrays, nulls empties, drops all-null structs") {
    val e = edgeDF(O.LocatedIn)
      .withColumn("list_attrs",
        typedLit(Map("a" -> Seq("x", "", ""), "b" -> Seq("1", "2", ""))))
    val res = GraphBuilder.zipListAttrs(e, Map("z" -> Seq("a", "b"))).head()
    val z = res.getSeq[Row](res.fieldIndex("z"))
    assert(z.map(r => (Option(r.getString(0)), Option(r.getString(1)))).toList ==
      List((Some("x"), Some("1")), (None, Some("2")))) // 3rd all-empty dropped
    assert(res.getMap[String, Any](res.fieldIndex("list_attrs")).isEmpty)
  }

  test("zipListAttrs coerces nested trial-phase strings") {
    val e = edgeDF(O.LocatedIn)
      .withColumn("list_attrs", typedLit(Map("tp" -> Seq("2", "3.5", "0.5"))))
    val res = GraphBuilder.zipListAttrs(e, Map("z" -> Seq("tp")),
      trialPhaseProps = Set("tp")).head()
    assert(res.getSeq[Row](res.fieldIndex("z")).map(_.getString(0)).toList ==
      List("clinical_trial_phase_2", "3.5", "pre_clinical_research_phase"))
  }

  test("zipListAttrs handles empty arrays (regression: sequence(1,0) crash)") {
    val e = edgeDF(O.LocatedIn)
      .withColumn("list_attrs",
        typedLit(Map("a" -> Seq.empty[String], "b" -> Seq.empty[String])))
    val res = GraphBuilder.zipListAttrs(e, Map("z" -> Seq("a", "b"))).head()
    assert(res.getSeq[Row](res.fieldIndex("z")).isEmpty)
  }

  test("zipListAttrs raises on length mismatch") {
    val e = edgeDF(O.LocatedIn)
      .withColumn("list_attrs", typedLit(Map("a" -> Seq("x"), "b" -> Seq("1", "2"))))
    val ex = intercept[Exception] {
      GraphBuilder.zipListAttrs(e, Map("z" -> Seq("a", "b"))).collect()
    }
    assert(ex.getMessage.contains("zip length mismatch") ||
      Option(ex.getCause).exists(_.getMessage.contains("zip length mismatch")))
  }

  test("zipListAttrs rejects overlapping zip specs") {
    val e = edgeDF(O.LocatedIn)
    val ex = intercept[IllegalArgumentException] {
      GraphBuilder.zipListAttrs(e, Map("z1" -> Seq("a"), "z2" -> Seq("a", "b")))
    }
    assert(ex.getMessage.contains("same property"))
  }

  test("pruneEmptyAttrs drops empty strings and nulls") {
    val e = edgeDF(O.LocatedIn)
      .withColumn("attrs", typedLit(Map("keep" -> "v", "drop" -> "")))
    val res = GraphBuilder.pruneEmptyAttrs(e).head()
    assert(res.getAs[Map[String, String]]("attrs") == Map("keep" -> "v"))
  }

  test("pruneEmptyAttrs drops empty and all-empty lists, keeps partly-filled ones and 0.0") {
    val e = edgeDF(O.LocatedIn)
      .withColumn("num_attrs", typedLit(Map("zero" -> 0.0)))
      .withColumn("list_attrs", typedLit(Map(
        "empty" -> Seq.empty[String],
        "all_blank" -> Seq("", ""),
        "partial" -> Seq("", "x"))))
    val res = GraphBuilder.pruneEmptyAttrs(e).head()
    // _is_empty: scalar 0 is NON-empty; [] and ["",""] are empty
    assert(res.getAs[Map[String, Double]]("num_attrs") == Map("zero" -> 0.0))
    assert(res.getAs[Map[String, Seq[String]]]("list_attrs").keySet == Set("partial"))
  }
}
