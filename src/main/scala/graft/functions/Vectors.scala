package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns,
  * built from higher-order functions so the arithmetic stays inside
  * whole-stage codegen and runs sequentially left-to-right (bit-for-bit
  * deterministic — important for oracle comparisons and reproducible
  * pipelines).
  */
object Vectors {

  /** Elementwise cast to double — float32 embeddings widen exactly. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential dot product in double precision — a native codegen
    * Expression (tight primitive loop inside whole-stage codegen). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dot(a, b)

  /** HOF reference formulation of [[dot]]: same result bit-for-bit,
    * kept as the slow oracle the codegen kernel is tested against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity: dot / (||a|| * ||b||), fused single-pass
    * codegen kernel. Null-propagating; zero vectors yield null. */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosine(a, b)

  /** HOF reference formulation of [[cosine]] (oracle for tests). */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val na = sqrt(dotHof(a, a))
    val nb = sqrt(dotHof(b, b))
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(d / (na * nb))
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Sign bit of the projection of v onto an anchor vector: the unit of
    * random-hyperplane LSH. */
  def projectionBit(v: Column, anchor: Column): Column =
    when(dot(v, anchor) >= 0.0, lit(1)).otherwise(lit(0))
}
