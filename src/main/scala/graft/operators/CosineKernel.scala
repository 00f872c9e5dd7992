package graft.operators

import org.apache.spark.sql.catalyst.util.ArrayData

/** Scalar cosine kernel shared by interpreted eval and generated code
  * (top-level object => static forwarder, callable from Janino). The
  * arithmetic order is the engine-wide cosine contract: left-to-right
  * accumulation, then dot / (sqrt(na) * sqrt(nb)) — see
  * [[Similarity.CosineSim]]. */
object CosineKernel {
  /** [[sim]] against a plain double[] codeword (the [[AnnKernels]]
    * reference-object form) — identical arithmetic order. */
  def simArr(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    var j = n
    while (j < a.numElements()) { val x = a.getDouble(j); na += x * x; j += 1 }
    j = n
    while (j < b.length) { val y = b(j); nb += y * y; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def sim(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // tail of the longer array still contributes to its own norm,
    // matching transform(a, x*x) over the full array
    var j = n
    while (j < a.numElements()) { val x = a.getDouble(j); na += x * x; j += 1 }
    j = n
    while (j < b.numElements()) { val y = b.getDouble(j); nb += y * y; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
