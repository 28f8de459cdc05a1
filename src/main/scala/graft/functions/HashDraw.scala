package graft.functions

/** Cross-engine deterministic draws: a "random" quantity computed as a pure
  * function of an entity-keyed string — the first 60 bits of md5(key).
  * DuckDB reproduces the identical value with
  * `CAST('0x' || substr(md5(key), 1, 15) AS BIGINT)`, which is what makes
  * RNG-driven operators (the bus simulation's draws, the SimHash bit basis)
  * hash-checkable by the DuckDB oracle. The reference's unseeded
  * `random.random()` (lakehouse_part2_spark_processing.py:362,408) can never
  * be. Keyed draws also beat a sequential seeded PRNG at scale: no draw
  * depends on how many draws came before it, so rows can be generated in
  * any partition order, on any number of executors, with retries.
  */
object HashDraw {

  /** First 15 hex chars (60 bits) of md5(key), as a non-negative Long. */
  def draw(key: String): Long =
    draw(java.security.MessageDigest.getInstance("MD5"), key)

  /** Same, with a caller-held digest instance — use inside per-partition
    * kernels to amortize `getInstance` over the partition ( `digest()`
    * resets the instance, so reuse is safe).
    */
  def draw(md: java.security.MessageDigest, key: String): Long = {
    val d = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex chars = first 7 bytes + high nibble of the 8th
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** The DuckDB expression computing exactly [[draw]] of the same key. */
  def sql(keyExpr: String): String =
    s"CAST('0x' || substr(md5($keyExpr), 1, 15) AS BIGINT)"
}
