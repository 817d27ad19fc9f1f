package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels over `array<double>` columns (reference F1–F5,
  * SURVEY.md §2.6) expressed with Spark's codegen'd higher-order
  * functions — no UDFs, so every kernel stays inside whole-stage
  * codegen and works for runtime-chosen dimensionality.
  */
object VecOps {

  /** Element-wise a - b. */
  def sub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)

  /** Element-wise a + b. */
  def add(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** Scale by a scalar column. */
  def scale(a: Column, s: Column): Column = transform(a, x => x * s)

  /** Sum of squares (reference: embedder_pytorch.py:622). */
  def sqNorm(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** Euclidean norm with the reference's 1e-6 guard
    * (embedder_pytorch.py:622-623). */
  def norm(a: Column): Column = sqrt(sqNorm(a))

  /** Squared Euclidean distance between two vectors (cdist kernel,
    * embedder_pytorch.py:580). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, v) => s + v)

  /** Dot product (used by cosine similarity over embeddings). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  /** Cosine similarity with zero-norm guard. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(sqNorm(a)) * sqrt(sqNorm(b)) + lit(1e-12))

  /** Midpoint of two points (embedder_pytorch.py:784-785). */
  def midpoint(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => (x + y) / 2.0)

  /** 4-point centroid (embedder_pytorch.py:722). */
  def centroid4(a: Column, b: Column, c: Column, d: Column): Column =
    zip_with(zip_with(a, b, (x, y) => x + y), zip_with(c, d, (x, y) => x + y),
      (s1, s2) => (s1 + s2) / 4.0)

  /** 2D orientation determinant sign on the first two coordinates
    * (embedder_pytorch.py:760-763): sign((b-a) × (c-a)). */
  def orient2d(ax: Column, ay: Column, bx: Column, by: Column,
               cx: Column, cy: Column): Column =
    signum((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))

  /** Proper segment intersection p1-p2 vs q1-q2 on first two dims
    * (embedder_pytorch.py:738-774): o1*o2<0 && o3*o4<0. */
  def segmentsIntersect(p1: Column, p2: Column, q1: Column, q2: Column): Column = {
    def x(c: Column) = element_at(c, 1)
    def y(c: Column) = element_at(c, 2)
    val o1 = orient2d(x(p1), y(p1), x(p2), y(p2), x(q1), y(q1))
    val o2 = orient2d(x(p1), y(p1), x(p2), y(p2), x(q2), y(q2))
    val o3 = orient2d(x(q1), y(q1), x(q2), y(q2), x(p1), y(p1))
    val o4 = orient2d(x(q1), y(q1), x(q2), y(q2), x(p2), y(p2))
    (o1 * o2 < 0) && (o3 * o4 < 0)
  }

  /** Per-dimension sum aggregate for a groupBy over an array column:
    * builds d scalar `sum` columns (partial+final hash agg — ONE
    * shuffle) and reassembles the array. Beats posexplode+collect_list
    * (two shuffles + sort) at any scale.
    */
  def sumVec(dim: Int, vecCol: String): Seq[Column] =
    (0 until dim).map(i => sum(element_at(col(vecCol), i + 1)).as(s"_s$i"))

  def assembleVec(dim: Int): Column =
    array((0 until dim).map(i => col(s"_s$i")): _*)

  /** Fixed-dimension squared distance: plain per-component arithmetic,
    * fully whole-stage-codegen'd (higher-order zip_with/aggregate are
    * interpreted per row — measured ~10× slower in the kNN hot path). */
  def sqDistFixed(dim: Int, a: Column, b: Column): Column =
    (0 until dim).map { i =>
      val d = element_at(a, i + 1) - element_at(b, i + 1)
      d * d
    }.reduce(_ + _)

  /** groupBy(key).sum over an array column, reassembled: ONE shuffle. */
  def sumVecBy(df: org.apache.spark.sql.DataFrame, key: String, dim: Int,
               vecCol: String): org.apache.spark.sql.DataFrame = {
    val cs = sumVec(dim, vecCol)
    df.groupBy(key).agg(cs.head, cs.tail: _*)
      .select(col(key), assembleVec(dim).as(vecCol))
  }
}
