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

  // ---- int8 quantization (4× memory/bandwidth for ANN scans) ----

  /** Symmetric max-abs int8 scale: `max(|v_i|) / 127` — the
    * faiss/ONNX per-vector symmetric scheme. 0.0 for all-zero or
    * empty vectors (codes then quantize to 0 by contract). */
  def int8Scale(v: Column): Column =
    coalesce(array_max(transform(v, x => abs(x))).cast("double"), lit(0.0)) /
      lit(127.0)

  /** Quantized codes for a vector given its STAGED scale column
    * (pass an attribute, not an inline [[int8Scale]] expression —
    * Catalyst re-evaluates non-attribute subexpressions inside the
    * lambda per element, turning O(d) into O(d²)). Codes are
    * round-half-away(v/scale) in [-127, 127] as tinyint; a zero
    * scale yields all-zero codes. */
  def int8Codes(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0).cast("tinyint")))
      .otherwise(transform(v,
        x => round(x.cast("double") / scale, 0).cast("tinyint")))

  /** Dequantized approximation: `codes_i * scale`. Reconstruction
    * error is bounded by scale/2 per component (half a quantization
    * step). */
  def int8Dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Exact integer dot product of two code arrays (the hot loop of a
    * quantized ANN scan — integer multiply-accumulate, no floats
    * until the final rescale): a native codegen Expression, tight
    * primitive loop with long accumulation. */
  def int8Dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotInt8(a, b)

  /** HOF reference formulation of [[int8Dot]]: same result, kept as
    * the slow oracle the codegen kernel is tested against (measured
    * ~5× slower on the 20× ANN scan). */
  def int8DotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)
}
