package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Graph.pageRank]] gates: equality with a driver-side reference power
  * iteration under the operator's exact rounding rules, partition
  * invariance, and the teleport/dangling-leak semantics. */
class GraphSpec extends SparkSpecBase {

  private val s_ = spark
  import s_.implicits._

  /** Reference power iteration replicating the operator's determinism
    * contract: DECIMAL(28,14) HALF_UP per-edge contributions, exact
    * decimal accumulation, rank rounded HALF_UP to `roundTo` per round,
    * teleport = (1.0 - damping) / n in double. */
  private def refPageRank(
      edges: Seq[(Long, Long)], rounds: Int, damping: Double, roundTo: Int)
      : Map[Long, Double] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    val teleport = (1.0 - damping) / n
    def rnd(x: Double, s: Int): Double =
      new JBD(x).setScale(s, RoundingMode.HALF_UP).doubleValue()
    var rank: Map[Long, Double] = nodes.map(_ -> rnd(1.0 / n, roundTo)).toMap
    (1 to rounds).foreach { _ =>
      val mass = scala.collection.mutable.Map.empty[Long, JBD]
      edges.foreach { case (u, v) =>
        val c = new JBD(rank(u) / outdeg(u)).setScale(14, RoundingMode.HALF_UP)
        mass(v) = mass.get(v).map(_.add(c)).getOrElse(c)
      }
      rank = nodes.map { v =>
        val m = mass.get(v).map(_.doubleValue()).getOrElse(0.0)
        v -> rnd(teleport + damping * m, roundTo)
      }.toMap
    }
    rank
  }

  private val g = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 2L), (4L, 3L), (5L, 1L))

  test("matches the reference power iteration exactly (rounded ranks in/out)") {
    val got = Graph.pageRank(g.toDF("pid", "nid"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === refPageRank(g, rounds = 4, damping = 0.85, roundTo = 10))
  }

  test("partition-invariant: a reshuffled edge list yields identical ranks") {
    val base = Graph.pageRank(g.toDF("pid", "nid"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val shuffled = Graph.pageRank(
        g.reverse.toDF("pid", "nid").repartition(7, col("nid")), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base === shuffled)
  }

  test("sink-less nodes keep only teleport mass; incoming mass raises rank") {
    // 4 and 5 have no in-edges: rank = teleport exactly after round 1+
    val out = Graph.pageRank(g.toDF("pid", "nid"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val teleport = 0.15 / 5
    assert(math.abs(out(4L) - teleport) < 1e-9)
    assert(math.abs(out(5L) - teleport) < 1e-9)
    // 1 receives from 2,3,5 — strictly more central than the sources-only nodes
    assert(out(1L) > out(4L) && out(2L) > out(4L) && out(3L) > out(4L))
    // dangling leak: total mass strictly below 1 once a dangling node
    // (none here: every node has out-edges) — with this graph mass is
    // conserved up to rounding, so the sum stays near 1
    assert(math.abs(out.values.sum - 1.0) < 1e-3)
  }

  test("triangleStats: hand-built graph — K4 plus a pendant edge") {
    val sp = spark
    import sp.implicits._
    // K4 on {1,2,3,4}: 6 edges, 4 triangles, degrees all 3 -> wedges 12
    // pendant 4-5 adds: edge 7, degree(4)=4, degree(5)=1 -> wedges 12-3+6=15
    val k4 = for (i <- 1 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val edges = (k4 :+ ((4L, 5L))).toDF("x", "y")
    val r = Graph.triangleStats(edges, "x", "y").collect().head
    assert(r.getAs[Long]("n_nodes") === 5L)
    assert(r.getAs[Long]("n_edges") === 7L)
    assert(r.getAs[Long]("n_wedges") === 15L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Double]("transitivity") === 0.8) // 12/15
  }

  test("triangleStats: normalizes direction, dedupes, drops loops; empty wedges -> NULL") {
    val sp = spark
    import sp.implicits._
    // duplicate + reversed + self-loop forms of one triangle
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (1L, 2L)).toDF("x", "y")
    val r = Graph.triangleStats(edges, "x", "y").collect().head
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("n_triangles") === 1L)
    assert(r.getAs[Double]("transitivity") === 1.0)
    val lonely = Seq((1L, 2L), (3L, 4L)).toDF("x", "y")
    val r2 = Graph.triangleStats(lonely, "x", "y").collect().head
    assert(r2.getAs[Long]("n_wedges") === 0L)
    assert(r2.isNullAt(r2.fieldIndex("transitivity")))
  }

  test("triangleStats equals a brute-force census on random graphs") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 20
      val edges = (for (i <- 1 to n; j <- (i + 1) to n
        if rnd.nextDouble() < 0.25) yield (i.toLong, j.toLong)).toSeq
      val es = edges.toSet
      val brute = (for (a <- 1 to n; b <- (a + 1) to n; c <- (b + 1) to n
        if es((a.toLong, b.toLong)) && es((b.toLong, c.toLong)) &&
          es((a.toLong, c.toLong))) yield 1).size
      val r = Graph.triangleStats(edges.toDF("x", "y"), "x", "y")
        .collect().head
      assert(r.getAs[Long]("n_triangles") === brute.toLong, s"trial $trial")
    }
  }

  test("triangleStats: skewed hub graph — degree-ordered orientation counts once") {
    val sp = spark
    import sp.implicits._
    // one hot vertex 0 connected to 1..200 (a template family's hub in a
    // near-dup graph), plus a rim path i-(i+1) closing a fan of triangles.
    // Lexicographic orientation would wedge-join all 200 hub edges at the
    // hub's partition (d²/2 probes on one key); degree-ordered points every
    // hub edge AT the hub, so wedges form at the degree-2..3 rim vertices.
    val hub = (1 to 200).map(i => (0L, i.toLong))
    val rim = (1 until 200).map(i => (i.toLong, (i + 1).toLong))
    val r = Graph.triangleStats((hub ++ rim).toDF("x", "y"), "x", "y")
      .collect().head
    // each rim edge (i, i+1) closes exactly one triangle with the hub
    assert(r.getAs[Long]("n_triangles") === 199L)
    assert(r.getAs[Long]("n_nodes") === 201L)
    assert(r.getAs[Long]("n_edges") === 399L)
    // wedges: hub d=200 -> 19900; rim interior (2..199 have d=3) -> 3 each;
    // rim ends 1,200 have d=2 -> 1 each. 19900 + 198*3 + 2 = 20496
    assert(r.getAs[Long]("n_wedges") === 20496L)
  }

  /** Sequential reference of [[Graph.labelPropagation]]'s pinned
    * semantics: synchronous rounds, per-node neighbor-label majority,
    * ties to the smallest label. */
  private def refLpa(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nbrs = (pairs ++ pairs.map(_.swap)).groupMap(_._1)(_._2)
    var labels: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
    (1 to rounds).foreach { _ =>
      labels = nbrs.map { case (v, ns) =>
        val counts = ns.groupMapReduce(labels)(_ => 1L)(_ + _)
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def engineLpa(pairs: Seq[(Long, Long)], rounds: Int,
      parts: Int = 4): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    Graph.labelPropagation(pairs.toDF("ia", "ib").repartition(parts), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labelPropagation equals the sequential reference on random graphs") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val pairs = (for (i <- 1L to 25L; j <- (i + 1) to 25L
        if rnd.nextDouble() < 0.15) yield (i, j)).toSeq
      if (pairs.nonEmpty)
        assert(engineLpa(pairs, 4) === refLpa(pairs, 4), s"trial $trial")
    }
  }

  test("labelPropagation separates two dense communities joined by one edge") {
    // two 4-cliques bridged by a single edge: connected components would
    // report ONE component; LPA must keep two labels
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val got = engineLpa(cliqueA ++ cliqueB :+ (4L -> 11L), rounds = 4)
    assert(got.filterKeys(_ <= 4).values.toSet.size === 1)
    assert(got.filterKeys(_ >= 11).values.toSet.size === 1)
    assert(got(1L) !== got(14L), "bridge must not merge the communities")
  }

  test("labelPropagation: fixed synchronous rounds pin the bipartite oscillation") {
    // a single edge oscillates under synchronous updates: after every
    // round each endpoint holds the OTHER's previous label — fixed round
    // counts make both parities deterministic (and match the reference)
    val e = Seq((1L, 2L))
    assert(engineLpa(e, 1) === refLpa(e, 1))
    assert(engineLpa(e, 2) === refLpa(e, 2))
    assert(engineLpa(e, 1) === Map(1L -> 2L, 2L -> 1L))
    assert(engineLpa(e, 2) === Map(1L -> 1L, 2L -> 2L))
  }

  test("labelPropagation is invariant to input partitioning") {
    val rnd = new scala.util.Random(7)
    val pairs = (for (i <- 1L to 30L; j <- (i + 1) to 30L
      if rnd.nextDouble() < 0.12) yield (i, j)).toSeq
    assert(engineLpa(pairs, 3, parts = 1) === engineLpa(pairs, 3, parts = 8))
  }

  test("labelPropagation accepts STRING node ids (the min_by argmax)") {
    // same topology as the bridged-cliques test, ids mapped to doc-id
    // strings — "smallest label" follows binary UTF-8 order
    val sp = spark
    import sp.implicits._
    def id(i: Long) = f"doc-$i%03d"
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (id(i), id(j))
    val cliqueB = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (id(i), id(j))
    val pairs = (cliqueA ++ cliqueB :+ (id(4) -> id(11))).toDF("ia", "ib")
    val got = Graph.labelPropagation(pairs, rounds = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.filterKeys(_ <= id(4)).values.toSet.size === 1)
    assert(got.filterKeys(_ >= id(11)).values.toSet.size === 1)
    assert(got(id(1)) !== got(id(14)), "bridge must not merge the communities")
    // agrees with the numeric run under the order-preserving id map
    val numeric = engineLpa(
      (cliqueA ++ cliqueB :+ (id(4) -> id(11))).map { case (a, b) =>
        (a.drop(4).toLong, b.drop(4).toLong) }, rounds = 4)
    assert(got === numeric.map { case (k, v) => id(k) -> id(v) })
  }

  /** Reference modularity from the definition: Q_c = e_c/m − (d_c/2m)². */
  private def refModularity(pairs: Seq[(Long, Long)],
      labels: Map[Long, Long]): Map[Long, Double] = {
    val m = pairs.size.toDouble
    val deg = (pairs.map(_._1) ++ pairs.map(_._2)).groupMapReduce(identity)(_ => 1L)(_ + _)
    val comms = labels.values.toSet
    comms.map { c =>
      val eIn = pairs.count { case (a, b) => labels(a) == c && labels(b) == c }
      val dSum = deg.collect { case (v, d) if labels(v) == c => d }.sum
      val num = 4L * pairs.size * eIn - dSum * dSum
      c -> BigDecimal(num.toDouble / (4.0 * m * m))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("modularity: two bridged cliques score high; contributions match the definition") {
    val sp = spark
    import sp.implicits._
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val pairs = (cliqueA ++ cliqueB :+ (4L -> 11L)).toSeq
    val labels = engineLpa(pairs, 4)
    val got = Graph.modularity(pairs.toDF("ia", "ib"),
        labels.toSeq.toDF("id", "comm"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("contrib")).toMap
    val want = refModularity(pairs, labels)
    assert(got === want)
    // genuine two-community structure: total Q well above random
    assert(got.values.sum > 0.3)
  }

  test("modularity: everything in one community scores ~0 (Q = -(d/2m)^2 residue)") {
    val sp = spark
    import sp.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L))
    val got = Graph.modularity(pairs.toDF("ia", "ib"), labels.toDF("id", "comm"))
      .collect()
    assert(got.length === 1)
    // e_in = m, d_sum = 2m -> contrib = 1 - 1 = 0 exactly
    assert(got.head.getAs[Double]("contrib") === 0.0)
    assert(got.head.getAs[Long]("e_in") === 3L)
    assert(got.head.getAs[Long]("d_sum") === 6L)
  }

  test("modularity: a community with zero internal edges contributes negatively") {
    val sp = spark
    import sp.implicits._
    // bipartite edge with each endpoint its own community
    val pairs = Seq((1L, 2L))
    val labels = Seq((1L, 1L), (2L, 2L))
    val got = Graph.modularity(pairs.toDF("ia", "ib"), labels.toDF("id", "comm"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("e_in"), r.getAs[Double]("contrib")))
    // Q_c = 0/m - (1/(2*1))^2 = -0.25 for each endpoint community
    assert(got.toSeq === Seq((1L, 0L, -0.25), (2L, 0L, -0.25)))
  }
}
