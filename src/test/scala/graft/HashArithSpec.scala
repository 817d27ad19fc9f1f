package graft

import org.apache.spark.sql.functions._
import graft.functions.HashArith

/** MulAddWrap: the ANSI-safe wrap-arithmetic expression behind the
  * Kirsch–Mitzenmacher MinHash family (Dedup.minhashSignatures). */
class HashArithSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def evalOne(b: Long, m: Long, s: Long): Long = {
    import spark.implicits._
    Seq((b, m, s)).toDF("b", "m", "s")
      .select(HashArith.mulAddWrap(col("b"), col("m"), col("s")).as("r"))
      .collect()(0).getLong(0)
  }

  test("wraps like Java two's complement where ANSI +/* would throw") {
    assert(evalOne(Long.MaxValue, 1L, 1L) == Long.MinValue)
    assert(evalOne(0L, 2L, Long.MaxValue) == -2L)
    // -1 * MinValue itself wraps back to MinValue; the sum then wraps
    // -2^63 + -2^63 = -2^64 ≡ 0
    assert(evalOne(Long.MinValue, -1L, Long.MinValue) == 0L)
    // and plain in-range arithmetic is just arithmetic
    assert(evalOne(7L, 3L, 5L) == 22L)
    // the session default really is ANSI (the reason this expression
    // exists): the same computation via native ops throws
    assertThrows[Exception] {
      import spark.implicits._
      Seq(Long.MaxValue).toDF("x").select(col("x") + lit(1L)).collect()
    }
  }

  test("matches the interpreted (non-codegen) eval path bit for bit") {
    val e = HashArith.MulAddWrap(
      org.apache.spark.sql.catalyst.expressions.Literal(1234567891011L),
      org.apache.spark.sql.catalyst.expressions.Literal(63L),
      org.apache.spark.sql.catalyst.expressions.Literal(-987654321987654321L))
    assert(e.eval(null) == 1234567891011L + 63L * -987654321987654321L)
  }

  test("null-intolerant: any null operand yields null") {
    import spark.implicits._
    val r = Seq((Some(1L), Option.empty[Long]))
      .toDF("a", "b")
      .select(HashArith.mulAddWrap(col("a"), col("b"), lit(3L)).as("r"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("stays inside whole-stage codegen (hot-aggregate contract)") {
    // spark.range, not a LocalRelation — ConvertToLocalRelation folds
    // the latter before any physical planning, which would vacuously
    // pass/fail this assert
    val p = spark.range(10)
      .select(HashArith.mulAddWrap(col("id"), lit(5L), col("id")))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"codegen absent:\n$p")
  }

  test("KM family replay: signature values match an independent model") {
    // hand model of h_i = h1 + i*(h2|1) over wrapped longs, vs the
    // DataFrame pipeline used by minhashSignatures
    import spark.implicits._
    val rows = Seq((11L, -3L), (Long.MaxValue - 5, 17L))
    val got = rows.toDF("h1", "h2")
      .select((0 until 4).map(i =>
        HashArith.mulAddWrap(col("h1"), lit(i.toLong),
          col("h2").bitwiseOR(lit(1L))).as(s"h$i")): _*)
      .collect()
    rows.zip(got).foreach { case ((h1, h2), r) =>
      (0 until 4).foreach { i =>
        assert(r.getLong(i) == h1 + i.toLong * (h2 | 1L), s"i=$i h1=$h1 h2=$h2")
      }
    }
  }
}
