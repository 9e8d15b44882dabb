package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Star-contraction connected components vs a driver-side union-find
  * ground truth — the property the DuckDB recursive-CTE oracle can't
  * stress (it only sees the near-dup graph the corpus happens to have).
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** test-only ground truth */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    for ((u, v) <- edges) {
      val (ru, rv) = (find(u.toInt), find(v.toInt))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    // path-compress to root = component min (roots are minimal by the
    // max-attaches-to-min union rule above)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def check(n: Int, edges: Seq[(Long, Long)]): Unit = {
    val truth = unionFind(n, edges)
    val got = ConnectedComponents.run(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
    assert(got.keySet == touched, "output must cover exactly the nodes with edges")
    for ((node, label) <- got)
      assert(label == truth(node), s"node $node: got $label, want ${truth(node)}")
  }

  test("random graphs match union-find (30 seeds)") {
    for (seed <- 1 to 30) {
      val rnd = new Random(seed)
      val n = 2 + rnd.nextInt(40)
      val m = rnd.nextInt(3 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (u, v) => u != v }
      if (edges.nonEmpty) check(n, edges)
    }
  }

  test("a long chain collapses to one component (the O(log n)-rounds case)") {
    val n = 64
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
    check(n, chain)
    val labels = ConnectedComponents.run(chain.toDF("u", "v"))
      .as[(Long, Long)].collect()
    assert(labels.length == n && labels.forall(_._2 == 0L))
  }

  test("duplicate / reversed / self-loop edges are tolerated") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (3L, 4L))
    val got = ConnectedComponents.run(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("empty edge set yields an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(ConnectedComponents.run(empty).count() == 0)
  }
}
