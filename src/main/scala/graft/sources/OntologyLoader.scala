package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Ontology

/**
 * Load a real ontology (e.g. an exported Biolink model) into the driver's
 * `Ontology` from a term table — TSV or JSONL, optionally gzipped, via the
 * same reader/typing rules as KgxSource.
 *
 * The reference resolves the live Biolink model over HTTP at startup
 * (ref: /root/reference/app/app/biolink_helper.py:1-54); in an
 * air-gapped/cluster deployment the model is instead shipped as a file.
 * Expected columns (extra columns ignored):
 *
 *   name                    term curie (required)
 *   parents                 delimited array of parent terms
 *   is_mixin                t/f
 *   mixin_direct_mappings   delimited array (only meaningful for mixins)
 *   is_symmetric            t/f (predicates)
 *   canonical_predicate     the canonical form, when this term is a
 *                           non-canonical inverse
 *
 * Ontologies are O(10^3) terms, so collecting to the driver is the right
 * altitude — the closure is computed once and query expansion emits
 * literal lists that push into scans (see model.Ontology).
 */
object OntologyLoader {

  val ArrayColumns: Set[String] = Set("parents", "mixin_direct_mappings")

  def fromFile(spark: SparkSession, path: String, format: String,
               delimiter: String = ","): Ontology =
    fromFrame(KgxSource.readRaw(spark, path, format), delimiter)

  /** Build from any DataFrame with the term-table columns. */
  def fromFrame(df: DataFrame, delimiter: String = ","): Ontology = {
    import org.apache.spark.sql.functions._
    val cols = df.columns.toSet
    def arrCol(c: String) =
      if (!cols.contains(c)) typedLit(Seq.empty[String])
      else df.schema(c).dataType match {
        case org.apache.spark.sql.types.ArrayType(_, _) =>
          coalesce(transform(col(c), _.cast("string")), typedLit(Seq.empty[String]))
        case _ => coalesce(
          filter(split(col(c), java.util.regex.Pattern.quote(delimiter)),
            _ =!= lit("")),
          typedLit(Seq.empty[String]))
      }
    def boolCol(c: String) =
      if (!cols.contains(c)) lit(false)
      else lower(col(c).cast("string")).isin("t", "true")
    def strCol(c: String) =
      if (!cols.contains(c)) lit(null).cast("string") else col(c).cast("string")

    val rows = df.select(
      col("name").cast("string").as("name"),
      arrCol("parents").as("parents"),
      boolCol("is_mixin").as("is_mixin"),
      arrCol("mixin_direct_mappings").as("mappings"),
      boolCol("is_symmetric").as("is_symmetric"),
      strCol("canonical_predicate").as("canonical"))
      .collect()

    val parents = rows.iterator
      .filter(_.getSeq[String](1).nonEmpty)
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    val mixins = rows.iterator.filter(_.getBoolean(2)).map(_.getString(0)).toSet
    val mixinMap = rows.iterator
      .filter(r => r.getBoolean(2) && r.getSeq[String](3).nonEmpty)
      .map(r => r.getString(0) -> r.getSeq[String](3).toSet).toMap
    val symmetric = rows.iterator.filter(_.getBoolean(4)).map(_.getString(0)).toSet
    val canonicalOf = rows.iterator
      .filter(r => !r.isNullAt(5) && r.getString(5).nonEmpty &&
        r.getString(5) != r.getString(0))
      .map(r => r.getString(0) -> r.getString(5)).toMap
    val inverseOf = canonicalOf.map(_.swap)

    Ontology(parents = parents, mixins = mixins, mixinDirectMap = mixinMap,
      symmetric = symmetric, canonicalOf = canonicalOf, inverseOf = inverseOf)
  }

  /** Export an Ontology as a term-table TSV (round-trip twin of fromFile). */
  def writeTsv(ont: Ontology, path: String, delimiter: String = ","): Unit = {
    val sb = new StringBuilder
    sb.append("name\tparents\tis_mixin\tmixin_direct_mappings\tis_symmetric\tcanonical_predicate\n")
    // terms only covers the parent DAG; inverses/mixins/symmetric terms can
    // exist outside it
    val all = ont.terms ++ ont.canonicalOf.keySet ++ ont.mixins ++ ont.symmetric
    for (t <- all.toSeq.sorted) {
      val parents = ont.parents.getOrElse(t, Set.empty).toSeq.sorted.mkString(delimiter)
      val mappings = ont.mixinDirectMap.getOrElse(t, Set.empty).toSeq.sorted.mkString(delimiter)
      sb.append(s"$t\t$parents\t${ont.mixins(t)}\t$mappings\t${ont.symmetric(t)}\t" +
        s"${ont.canonicalOf.getOrElse(t, "")}\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Path.of(path), sb.toString)
  }
}
