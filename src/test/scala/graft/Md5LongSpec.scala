package graft

import graft.functions.Md5Long
import org.apache.spark.sql.functions._

/** Bit-parity of the native md5→BIGINT kernels against the Column
  * compositions they replaced (conv/substring hex-string chains), which
  * themselves carry the DuckDB cross-engine contract
  * (`md5_number_upper`, `('0x' || substr(md5(x),1,n))::BIGINT`).
  * Any drift here would silently break every HLL/CMS/checksum/DSIR
  * value oracle, so the equivalence is pinned over adversarial inputs:
  * empty string, multi-byte UTF-8, digests whose byte 7 sets the sign
  * bit, nulls.
  */
class Md5LongSpec extends SparkSpec {
  import spark.implicits._

  private val inputs: Seq[String] = Seq(
    "", "a", "abc", "0", "-1", "doc:42", "shard:17", "temp:9",
    "¡unicode é ö ñ 漢字!", "the quick brown fox", "\n\t|",
    "9223372036854775807") ++ (0 until 200).map(i => s"k$i:${i * 37}")

  private def legacyNum(c: org.apache.spark.sql.Column) =
    (0 until 8).map(i =>
      shiftleft(conv(substring(md5(c), 2 * i + 1, 2), 16, 10).cast("long"),
        8 * i))
      .reduce((a, b) => a.bitwiseOR(b))

  test("md5_num == little-endian conv-chain composition (incl. sign bit)") {
    val df = inputs.toDF("s")
      .select(Md5Long.md5_num(col("s")).as("fast"),
        legacyNum(col("s")).as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
    // the contract is only interesting if some digest exercises the
    // sign bit (byte 7 ≥ 0x80 → negative long)
    assert(df.filter(col("fast") < 0).count() > 0)
  }

  test("md5_prefix(n) == conv(substring(md5, 1, n), 16, 10) for n ∈ {6, 11, 15}") {
    Seq(6, 11, 15).foreach { n =>
      val df = inputs.toDF("s")
        .select(Md5Long.md5_prefix(col("s"), n).as("fast"),
          conv(substring(md5(col("s")), 1, n), 16, 10).cast("long").as("slow"))
      assert(df.filter(col("fast") =!= col("slow")).count() == 0, s"n=$n")
      assert(df.filter(col("fast") < 0).count() == 0, s"n=$n non-negative")
    }
  }

  test("LocalHash.xxBucket == pmod(xxhash64(k), m) — the serve-side " +
    "bucket prune's driver evaluation matches the index build's hash") {
    Seq(32L, 1024L).foreach { m =>
      val df = inputs.toDF("s")
        .select(col("s"), pmod(xxhash64(col("s")), lit(m)).as("b"))
      df.collect().foreach { r =>
        assert(graft.functions.LocalHash.xxBucket(r.getString(0), m)
          == r.getLong(1), s"key=${r.getString(0)} m=$m")
      }
    }
    assert(graft.functions.LocalHash.bucketsOf(inputs, 32L)
      == inputs.map(graft.functions.LocalHash.xxBucket(_, 32L))
        .distinct.sorted)
  }

  test("null propagates; non-string input casts like the legacy form") {
    val df = Seq(Some(7L), None).toDF("v")
      .select(Md5Long.md5_num(col("v").cast("string")).as("fast"),
        legacyNum(col("v").cast("string")).as("slow"))
    val got = df.collect()
    assert(got.forall(r => (r.isNullAt(0) && r.isNullAt(1)) ||
      r.getLong(0) == r.getLong(1)))
  }
}
