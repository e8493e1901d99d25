package graft.model

/**
 * The fixture ontology used by the TPC-H-derived test graph (and specs).
 * Shaped like a miniature Biolink model: category DAG, predicate DAG with
 * mixins, symmetric predicates, canonical/inverse predicate pairs, and
 * qualifier-value hierarchies (directions/aspects), so every semantic
 * feature of the reference engine is exercisable deterministically.
 */
object GraftOntology {

  // ---- categories -------------------------------------------------------
  val Entity = "graft:Entity"
  val Place = "graft:Place"
  val Region = "graft:Region"
  val Nation = "graft:Nation"
  val Actor = "graft:Actor"
  val Customer = "graft:Customer"
  val Supplier = "graft:Supplier"
  val Item = "graft:Item"
  val Part = "graft:Part"
  val Order = "graft:Order"
  val Tradeable = "graft:Tradeable" // mixin category

  // ---- predicates -------------------------------------------------------
  val RelatedTo = "graft:related_to" // root, symmetric
  val AffiliatedWith = "graft:affiliated_with"
  val ConnectedTo = "graft:connected_to" // mixin predicate
  val LocatedIn = "graft:located_in"
  val LocationOf = "graft:location_of" // non-canonical inverse
  val PartOf = "graft:part_of"
  val HasPart = "graft:has_part" // non-canonical inverse
  val Transacts = "graft:transacts"
  val Placed = "graft:placed"
  val PlacedBy = "graft:placed_by" // non-canonical inverse
  val ContainsItem = "graft:contains_item"
  val ContainedIn = "graft:contained_in" // non-canonical inverse
  val SuppliedBy = "graft:supplied_by"
  val Supplies = "graft:supplies" // non-canonical inverse
  val AdjacentTo = "graft:adjacent_to" // symmetric
  val SubclassOf = "graft:subclass_of"
  val SuperclassOf = "graft:superclass_of" // non-canonical inverse
  val Ships = "graft:ships" // qualified predicate on lineitem edges

  // ---- qualifier values -------------------------------------------------
  val Flagged = "graft:flagged" // parent of both directions below
  val Returned = "graft:returned" // l_returnflag = R
  val Accepted = "graft:accepted" // l_returnflag = A
  val Status = "graft:status" // parent of both aspects below
  val Open = "graft:open" // l_linestatus = O
  val Finished = "graft:finished" // l_linestatus = F

  val ontology: Ontology = Ontology(
    parents = Map(
      // categories
      Place -> Set(Entity),
      Region -> Set(Place),
      Nation -> Set(Place),
      Actor -> Set(Entity),
      Customer -> Set(Actor),
      Supplier -> Set(Actor),
      Item -> Set(Entity),
      Part -> Set(Item, Tradeable),
      Order -> Set(Entity),
      Tradeable -> Set(Entity),
      // predicates
      AffiliatedWith -> Set(RelatedTo),
      ConnectedTo -> Set(RelatedTo),
      LocatedIn -> Set(AffiliatedWith, ConnectedTo),
      PartOf -> Set(AffiliatedWith),
      Transacts -> Set(RelatedTo),
      Placed -> Set(Transacts),
      ContainsItem -> Set(Transacts),
      SuppliedBy -> Set(Transacts),
      Ships -> Set(Transacts),
      AdjacentTo -> Set(RelatedTo),
      SubclassOf -> Set(RelatedTo),
      // qualifier values
      Returned -> Set(Flagged),
      Accepted -> Set(Flagged),
      Open -> Set(Status),
      Finished -> Set(Status)
    ),
    mixins = Set(Tradeable, ConnectedTo),
    mixinDirectMap = Map(
      Tradeable -> Set(Part),
      ConnectedTo -> Set(LocatedIn)
    ),
    symmetric = Set(RelatedTo, AdjacentTo),
    canonicalOf = Map(
      LocationOf -> LocatedIn,
      HasPart -> PartOf,
      PlacedBy -> Placed,
      ContainedIn -> ContainsItem,
      Supplies -> SuppliedBy,
      SuperclassOf -> SubclassOf
    ),
    inverseOf = Map(
      LocatedIn -> LocationOf,
      PartOf -> HasPart,
      Placed -> PlacedBy,
      ContainsItem -> ContainedIn,
      SuppliedBy -> Supplies,
      SubclassOf -> SuperclassOf
    ),
    rootCategory = Entity,
    rootPredicate = RelatedTo
  )
}
