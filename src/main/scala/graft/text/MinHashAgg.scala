package graft.text

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Single-buffer MinHash signature aggregator (the custom
  * `Aggregator[IN,BUF,OUT]` surface from SURVEY.md §4): one Array[Long]
  * buffer of k running minima per group, updated in place per shingle and
  * merged element-wise — versus the expression-based path in
  * [[Dedup.minhashSignatures]] which plans k separate min-aggregates.
  * Identical results (same XXH64 seeding as `xxhash64(lit(i), shingle)`),
  * same partial-aggregation shape; this form keeps the aggregation one
  * buffer wide no matter how large k gets.
  */
class MinHashAgg(k: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val u = UTF8String.fromString(shingle)
    var i = 0
    while (i < k) {
      // mirror of Spark's xxhash64(lit(i), col): the int child hashes
      // with the default seed 42, and its result seeds the string hash
      val seeded = XXH64.hashInt(i, 42L)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), seeded)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  def finish(r: Array[Long]): Array[Long] = r

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
