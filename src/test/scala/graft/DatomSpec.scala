package graft

import graft.datom.Datoms

/** Port of the reference's `DatomsSpec.scala:85-127` scenario: find an
  * actor by name via AVET, movies referencing the actor via VAET, movie
  * names via EAVT — plus the one-plan [[Datoms.navigate]] equivalent.
  */
class DatomSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Datoms.fromFacts(spark, Seq(
    ("p1", "person/name", "Keanu Reeves", 1L),
    ("p2", "person/name", "Carrie-Anne Moss", 1L),
    ("m1", "movie/name", "The Matrix", 2L),
    ("m1", "movie/year", 1999.0, 2L),
    ("m1", "movie/cast_ref", "p1", 2L),
    ("m1", "movie/cast_ref2_ref", "p2", 2L),
    ("m2", "movie/name", "John Wick", 3L),
    ("m2", "movie/cast_ref", "p1", 3L),
    ("m3", "movie/name", "Memento", 4L),
    ("m3", "movie/cast_ref", "p3", 4L)))

  test("AVET: entity by attribute value") {
    val es = Datoms.entitiesByAttrText(df, "person/name", "Keanu Reeves")
      .as[String].collect().toSeq
    assert(es == Seq("p1"))
  }

  test("VAET: reverse reference lookup") {
    val movies = Datoms.entitiesByRef(df, "movie/cast_ref", "p1")
      .as[String].collect().sorted.toSeq
    assert(movies == Seq("m1", "m2"))
  }

  test("EAVT: attributes of one entity in key order") {
    val attrs = Datoms.attrOfEntity(df, "m1", "movie/name")
      .select("vText").as[String].collect().toSeq
    assert(attrs == Seq("The Matrix"))
  }

  test("navigate = the reference's manual index-nested-loop join as one plan") {
    val res = Datoms.navigate(df, "person/name", "Keanu Reeves",
      "movie/cast_ref", "movie/name")
      .select("vText").as[String].collect().sorted.toSeq
    assert(res == Seq("John Wick", "The Matrix"))
  }

  test("orderings are permutations of the same rows") {
    val n = df.count()
    assert(Datoms.eavt(df).inOrder().count() == n)
    assert(Datoms.avet(df).inOrder().count() == n)
    assert(Datoms.vaet(df).inOrder().count() == n)
  }
}
