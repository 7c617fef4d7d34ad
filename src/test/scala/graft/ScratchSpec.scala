package graft

/** The scratch-dir conf (VERDICT r4 #6): query modules resolve scratch
  * space through spark.graft.scratchDir instead of absolute path literals.
  */
class ScratchSpec extends SparkSpec {

  test("scratch dir defaults and follows the session conf") {
    spark.conf.unset(Scratch.ConfKey)
    assert(Scratch.dir(spark, "x") == s"${Scratch.Default}/x")
    spark.conf.set(Scratch.ConfKey, "/root/repo/target/test-tmp/alt-scratch")
    try assert(Scratch.dir(spark, "x")
      == "/root/repo/target/test-tmp/alt-scratch/x")
    finally spark.conf.unset(Scratch.ConfKey)
  }

  test("an IO round-trip query lands in the configured scratch dir") {
    val alt = "/root/repo/target/test-tmp/scratch-redirect"
    spark.conf.set(Scratch.ConfKey, alt)
    try {
      SparkEntry.queries("s2_parquet_roundtrip")(spark, sfDir).collect()
      assert(new java.io.File(s"$alt/s2_orders").exists())
    } finally spark.conf.unset(Scratch.ConfKey)
  }
}
