package graft

import org.apache.spark.sql.functions._

import graft.functions.{ByteFunctions, DibFunctions}

/** Equivalence proofs for the codegen byte/DIB expressions against the
  * legacy column formulations they replaced (the conv(hex(substr))
  * accessor and the aggregate() HOF folds). Random binary payloads,
  * in-range AND out-of-range positions — the optimization is only valid
  * if every value is bit-identical. */
class ByteExpressionSpec extends SparkSpec {

  // deterministic pseudo-random payloads, varying lengths incl. empty
  private def payloads = spark.range(200).select(
    col("id"),
    // md5 chain sliced to id%37 bytes: all byte values occur
    expr("substr(concat(unhex(md5(cast(id as string))), " +
      "unhex(md5(cast(id + 1000 as string)))), 1, cast(id % 37 as int))")
      .as("payload"))

  private def legacyU8(bin: org.apache.spark.sql.Column,
                       pos: org.apache.spark.sql.Column) =
    coalesce(conv(hex(bin.substr(pos.cast("int"), lit(1))), 16, 10)
      .cast("long"), lit(0L))

  test("byte_at matches conv(hex(substr)) on every position incl. out-of-range") {
    val probed = payloads
      .withColumn("pos", explode(sequence(lit(-3L), lit(40L))))
      .select(
        coalesce(ByteFunctions.byteAt(col("payload"), col("pos")), lit(0L))
          .as("fast"),
        legacyU8(col("payload"), col("pos")).as("ref"))
    assert(probed.filter(col("fast") =!= col("ref")).isEmpty)
  }

  test("dib_row_sums matches the aggregate() fold bit-for-bit") {
    val rows = payloads.filter(length(col("payload")) >= 12)
      .withColumn("row_off", (col("id") % 5) + 1)
      .withColumn("width", (col("id") % 4) + 1)
    val p = col("payload")
    val rowOff = col("row_off")
    val zero = struct(lit(0L).as("b"), lit(0L).as("g"), lit(0L).as("r"),
      lit(0L).as("w"))
    val fold = aggregate(
      sequence(lit(0L), col("width") - 1), zero,
      (acc, x) => {
        val base = rowOff + x * 3
        val b = legacyU8(p, base)
        val g = legacyU8(p, base + 1)
        val r = legacyU8(p, base + 2)
        struct((acc.getField("b") + b).as("b"),
          (acc.getField("g") + g).as("g"),
          (acc.getField("r") + r).as("r"),
          (acc.getField("w") + (x + 1) * (b + g + r)).as("w"))
      })
    val cmp = rows.select(
      DibFunctions.dibRowSums(p, rowOff, col("width")).as("fast"),
      fold.as("ref"))
    assert(cmp.filter(
      col("fast").getItem(0) =!= col("ref.b") ||
        col("fast").getItem(1) =!= col("ref.g") ||
        col("fast").getItem(2) =!= col("ref.r") ||
        col("fast").getItem(3) =!= col("ref.w")).isEmpty)
  }

  test("dib_ahash matches the two-fold column form bit-for-bit") {
    val rows = payloads.filter(length(col("payload")) >= 8)
      .withColumn("frame_off", (col("id") % 3) + 1)
      .withColumn("width", (col("id") % 3) + 1)   // 1..3
      .withColumn("height", (col("id") % 2) + 1)  // 1..2
    val p = col("payload")
    val stride = expr("((width * 3 + 3) DIV 4) * 4")
    def lumaAt(i: org.apache.spark.sql.Column) = {
      val x = pmod(i, col("width"))
      val r = ((i - x) / col("width")).cast("long")
      val base = col("frame_off") + r * stride + x * 3
      legacyU8(p, base) + legacyU8(p, base + 1) + legacyU8(p, base + 2)
    }
    val npix = col("width") * col("height")
    val total = aggregate(sequence(lit(0L), npix - 1), lit(0L),
      (acc, i) => acc + lumaAt(i))
    val bits = aggregate(sequence(lit(0L), npix - 1), lit(0L),
      (acc, i) => acc +
        when(lumaAt(i) * npix >= col("total"),
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L)))
    val cmp = rows
      .withColumn("total", total)
      .select(
        DibFunctions.dibAHash(p, col("frame_off"), col("width"), col("height"))
          .as("fast"),
        bits.as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).isEmpty)
  }

  test("byte_at and dib folds participate in whole-stage codegen") {
    val plan = payloads.select(
      ByteFunctions.byteAt(col("payload"), lit(1L)).as("b"),
      DibFunctions.dibAHash(col("payload"), lit(1L), lit(2L), lit(2L)).as("h"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen span:\n$plan")
  }
}
