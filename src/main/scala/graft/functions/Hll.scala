package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet,
  * Meunier 2007) with m = 64 registers (p = 6) — the third mergeable
  * sketch next to count-min ([[HeavyHitters]]) and Space-Saving.
  *
  * Engine-portable by construction (the whole point of this
  * implementation; the same arithmetic replays as plain SQL in the
  * DuckDB oracle):
  *  - the hash is the first 8 hex chars of md5(id-as-string) mod
  *    2^31 (md5 is the repo's portable content hash, identical on
  *    both engines). An avalanche hash is REQUIRED here: the repo's
  *    LCG/multiplicative family is fine for sampling but keeps
  *    sequential ids lattice-correlated, which skews register
  *    occupancy and rho statistics (measured +40-90% estimate error
  *    on sequential ids vs ±13% with md5);
  *  - register index = top 6 bits, rho = 26 - msb(low 25 bits)
  *    computed via the base-2 digit string (`conv`/`bin`), an exact
  *    integer on both engines;
  *  - the harmonic sum runs over EXACT integers: sum of 2^(26-rho)
  *    longs (<= 64 * 2^26 per group, far inside BIGINT), so the
  *    estimate is ONE double division — order-independent, no
  *    float-accumulation drift anywhere.
  *
  * At scale: the register update is a map-side max, so the shuffle
  * carries <= |groups| x 64 rows no matter the corpus; the same
  * shape runs batch (groupBy) and streaming (complete-mode stateful
  * agg with |groups| x 64 state rows) — see `users_hll` /
  * `streaming_hll` in SparkEntry.
  *
  * Accuracy: RSE = 1.04/sqrt(64) = 13% in the raw-estimator regime
  * (n >> m) and tight under linear counting (n <~ m). The classic
  * bias hump around n = 2-3x m (est just past the 2.5m switchover)
  * is deliberately NOT patched — HLL++'s empirical bias tables are
  * engine-specific constants that would break oracle portability;
  * HllSpec pins the supported regimes.
  *
  * Reference scope note: the reference engine has no sketches; this
  * is part of the beyond-reference pipeline layer (SURVEY §2).
  */
object Hll {

  val m = 64 // registers (p = 6)
  private val alphaM2 = 0.709 * 4096 // alpha_64 * m^2

  /** Portable 31-bit avalanche hash: first 8 md5 hex chars of the
    * id's decimal string, mod 2^31. */
  def hash(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(2147483648L))

  /** Register index (0..63): top 6 of the 31 hash bits. */
  def reg(h: Column): Column = (h / lit(33554432L)).cast("long")

  /** Rank rho (1..26): leading zeros in the low 25 bits, plus one —
    * via the binary digit string, exact on both engines. */
  def rho(h: Column): Column = {
    val w = pmod(h, lit(33554432L))
    when(w === 0, lit(26L))
      .otherwise(lit(26L) -
        length(conv(w.cast("string"), 10, 2)).cast("long"))
  }

  /** Per-group register table: (groupCols..., reg, mx). Map-side max;
    * the shuffle carries <= |groups| x 64 rows. Registers never hit
    * by a hash are ABSENT (handled by [[estimate]]'s zero-register
    * term) — the table is also the sketch's merge form (union two
    * corpora = elementwise max of their register tables).
    */
  def registers(df: DataFrame, idCol: String,
      groupCols: Seq[String]): DataFrame = {
    val h = hash(col(idCol))
    df.select(groupCols.map(col) :+ reg(h).as("reg") :+ rho(h).as("rho"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("mx"))
  }

  /** Finish a register table to (groupCols..., hll_est): exact
    * integer harmonic sum + the small-range linear-counting
    * correction (est <= 2.5m with empty registers). */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(26 - mx AS INT))"))
          .as("s_present"),
        count(lit(1)).as("n_present"))
      .select(groupCols.map(col) :+
        (col("s_present") + (lit(64L) - col("n_present")) * lit(67108864L))
          .as("s_int") :+
        (lit(64L) - col("n_present")).as("v"): _*)
    val estRaw = lit(alphaM2) * lit(67108864.0) / col("s_int")
    agg.select(groupCols.map(col) :+
      when(estRaw <= 160.0 && col("v") > 0,
        lit(64.0) * log(lit(64.0) / col("v"))).otherwise(estRaw)
        .as("hll_est"): _*)
  }
}
