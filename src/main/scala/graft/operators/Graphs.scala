package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by degree orientation — the distributed-graph
  * classic (Suri & Vassilvitskii 2011, "Counting Triangles and the Curse
  * of the Last Reducer"). Naive wedge-join explodes on high-degree hubs
  * (a degree-d node contributes d² wedges); orienting every edge from its
  * (degree, id)-SMALLER endpoint to the larger one caps each node's
  * out-degree at O(√m), so the wedge join is m^{3/2} total work spread
  * evenly — no last-reducer hotspot at 100 TB edge scale.
  */
object Graphs {

  /** @param edges two-column frame of UNDIRECTED edges (any direction,
    *              duplicates/self-loops tolerated — canonicalized here).
    * @return one row per triangle corner: (node, n_triangles); the global
    *         count is `sum(n_triangles) / 3`.
    */
  def triangleCorners(edges: DataFrame, srcCol: String = "src",
                      dstCol: String = "dst"): DataFrame = {
    // canonical undirected edge set (a < b), self-loops dropped
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient by (degree, id): lower endpoint points at higher
    val oriented = e
      .join(deg.toDF("a", "da"), "a")
      .join(deg.toDF("b", "db"), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // wedges u→v, u→w (v < w canonically) closed by an oriented v↔w edge
    val wedges = oriented.toDF("u", "v")
      .join(oriented.toDF("u", "w"), "u")
      .filter(col("v") < col("w"))
    val closed = wedges.join(
      oriented.select(
        least(col("u"), col("v")).as("v"), greatest(col("u"), col("v")).as("w")),
      Seq("v", "w"), "left_semi")
    closed
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
