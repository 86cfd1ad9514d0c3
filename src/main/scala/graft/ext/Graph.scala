package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Graph analytics over relational co-occurrence graphs — the
 * entity-graph shapes a data pipeline derives from its fact tables
 * (suppliers co-serving an order, users co-editing a doc): degree
 * statistics and EXACT triangle counting.
 *
 * Triangle counting is the classic distributed-join benchmark: with
 * edges canonicalized `a < b`, triangles are exactly the matches of
 * e(a,b) ⋈ e(b,c) ⋈ e(a,c) with a < b < c — two equi-joins, integer-
 * exact, no iteration. Scale notes: the wedge join (e ⋈ e on the
 * middle vertex) is the quadratic step — its fan-out is Σ_v deg(v)²,
 * so the canonical a<b orientation matters (it bounds each wedge list
 * by the HIGHER-degree endpoint's out-neighbors, the standard
 * degree-ordering trick that keeps hub vertices from exploding), and
 * the closing edge joins as a semi-join-shaped probe.
 */
object Graph {

  /** Distinct undirected co-occurrence edges (a < b) between values of
    * `nodeCol` sharing a `groupCol` value. The pair fan-out is map-side
    * (self-join within groups), reduced by `distinct` before anything
    * downstream — bounded by groups × k² for k co-members, the
    * relational-graph norm. */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, nodeCol: String): DataFrame = {
    val q = (n: String) => graft.ColName.topCol(n)
    val l = df.select(q(groupCol).alias("__g"), q(nodeCol).alias("a")).distinct()
    val r = df.select(q(groupCol).alias("__g"), q(nodeCol).alias("b")).distinct()
    l.join(r, "__g").filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact triangle count plus node/edge counts, one row. Edges must be
    * canonical (a < b, distinct) — [[coOccurrenceEdges]] output. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e1 = edges.select(col("a").alias("x"), col("b").alias("y"))
    val e2 = edges.select(col("a").alias("y"), col("b").alias("z"))
    val e3 = edges.select(col("a").alias("x"), col("b").alias("z"))
    val wedges = e1.join(e2, "y") // x < y < z by construction
    val triangles = wedges.join(e3, Seq("x", "z"))
    val nNodes = edges.select(col("a").alias("n"))
      .union(edges.select(col("b").alias("n"))).distinct().count()
    val nEdges = edges.count()
    val nTri = triangles.count()
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((nNodes, nEdges, nTri)).toDF("n_nodes", "n_edges", "n_triangles")
  }

  /** Per-node degree table (undirected, canonical edges in). */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").alias("node"))
      .union(edges.select(col("b").alias("node")))
      .groupBy("node").agg(count(lit(1)).alias("degree"))

  /**
   * PageRank by power iteration over the undirected graph (each edge
   * contributes both directions, so out-degree = degree):
   * `r'(v) = (1−d)/N + d · Σ_{u~v} r(u)/deg(u)`, a fixed
   * `iterations` rounds from the uniform start. Output:
   * (node, rank·6dp).
   *
   * Scale shape: per round ONE equi-join (ranks ⋈ out-edges) feeding a
   * partial-aggregatable sum per destination, then a left join back to
   * the node list so isolated-from-incoming nodes keep the teleport
   * term. Lineage is cut with an eager localCheckpoint per round —
   * same hazard as [[hopDistances]]. Every node of a canonical edge
   * list has degree ≥ 1, so there is no dangling-mass correction term.
   *
   * Determinism note: the per-node neighbor sum is a float sum (order
   * differs across engines at ~1e-14 relative); 6-dp rounding on values
   * of magnitude ≥ (1−d)/N leaves orders of magnitude of slack.
   */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = edges.sparkSession
    val sym = edges.select(col("a").alias("src"), col("b").alias("dst"))
      .union(edges.select(col("b").alias("src"), col("a").alias("dst")))
      .localCheckpoint(true)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).alias("deg"))
      .localCheckpoint(true)
    val nodes = deg.select(col("src").alias("node")).localCheckpoint(true)
    val n = nodes.count()
    val teleport = (1.0 - damping) / n
    var rank = nodes.select(col("node"), lit(1.0 / n).alias("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = rank.alias("__r")
        .join(deg.alias("__g"), col("__r.node") === col("__g.src"))
        .join(sym.alias("__s"), col("__r.node") === col("__s.src"))
        .select(col("__s.dst").alias("node"),
          (col("__r.r") / col("__g.deg")).alias("c"))
        .groupBy("node").agg(sum("c").alias("in_sum"))
      rank = nodes.alias("__n")
        .join(contribs.alias("__c"), col("__n.node") === col("__c.node"), "left")
        .select(col("__n.node").alias("node"),
          (lit(teleport) + lit(damping) * coalesce(col("__c.in_sum"), lit(0.0)))
            .alias("r"))
        .localCheckpoint(true)
    }
    rank.select(col("node"), round(col("r"), 6).alias("rank"))
  }

  /**
   * Multi-source BFS hop distances, exact: for every node within
   * `maxHops` undirected hops of a seed, the minimum hop count.
   * Unreachable (or farther) nodes are absent. Output: (node, dist).
   *
   * Each of the maxHops rounds is one equi-join (current distances →
   * neighbors at +1) plus a partial-aggregatable min — the standard
   * iterative frontier relaxation; the distance table is re-persisted
   * per round and the previous one released (O(1) lineage, like the
   * connected-components loop). Distances only shrink, so re-relaxing
   * already-settled nodes is harmless — no frontier bookkeeping needed
   * at these hop counts.
   */
  def hopDistances(edges: DataFrame, seeds: Seq[Long], maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    // eager localCheckpoint per round: each round references the
    // previous distance table TWICE (relax source + union), so without
    // a lineage cut the logical plan doubles every round and the
    // analyzer cost goes exponential (the same hazard the connected-
    // components loop guards against). Checkpoint blocks also make the
    // cache releases below safe — no recompute chain survives.
    val sym = edges.select(col("a").alias("src"), col("b").alias("dst"))
      .union(edges.select(col("b").alias("src"), col("a").alias("dst")))
      .localCheckpoint(true)
    var dist = seeds.toDF("node").select(col("node"), lit(0L).alias("dist"))
      .localCheckpoint(true)
    for (_ <- 1 to maxHops) {
      // string-qualified aliases: `dist` already derives from `sym`
      // after round 1, so df(col) references would be an ambiguous
      // self-join
      val next = dist.alias("__d")
        .join(sym.alias("__s"), col("__d.node") === col("__s.src"))
        .select(col("__s.dst").alias("node"),
          (col("__d.dist") + 1L).alias("dist"))
      dist = dist.union(next)
        .groupBy("node").agg(min("dist").alias("dist"))
        .localCheckpoint(true)
    }
    dist
  }
}
