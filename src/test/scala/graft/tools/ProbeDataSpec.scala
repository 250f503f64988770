package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ProbeData's driver-side precomputed sign pattern to the
  * Catalyst expression it replaced (`pmod(xxhash64(i, lit(r)), 2)`
  * parity): the derived probe corpora must stay BIT-IDENTICAL across
  * the refactor, or scale exponents stop being comparable across
  * rounds.
  */
class ProbeDataSpec extends SparkSpec {
  import spark.implicits._

  test("signPattern equals the Catalyst xxhash64-parity expression for every (dim, replica)") {
    val dim = 64
    for (r <- 1 to 5) {
      val catalystSigns = Seq(1).toDF("x")
        .select(transform(sequence(lit(0), lit(dim - 1)),
          i => when(pmod(xxhash64(i, lit(r)), lit(2)) === 0, lit(-1.0f)).otherwise(lit(1.0f))).as("s"))
        .as[Seq[Float]].head()
      assert(ProbeData.signPattern(dim, r).toSeq == catalystSigns, s"replica $r diverged")
    }
  }

  test("sign patterns are distinct across replicas (no cross-replica clone vectors)") {
    val pats = (1 to 100).map(r => ProbeData.signPattern(64, r).toSeq)
    assert(pats.distinct.size == 100)
  }
}
