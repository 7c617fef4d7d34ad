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

  test("default is disk-backed; tmpfs is strictly an opt-in with headroom") {
    // VERDICT r7 advice: a /dev/shm default ENOSPCs in any stock container
    // (64 MB shm). The default must live under java.io.tmpdir; Sessions
    // .local opts into tmpfs only after checking real usable space.
    assert(Scratch.Default.startsWith(
      sys.props.getOrElse("java.io.tmpdir", "/tmp").stripSuffix("/")))
    assert(!Scratch.Default.startsWith("/dev/shm"))
  }

  test("sweep removes the per-run scratch tree, and only a graft_qtmp one") {
    val root = "/root/repo/target/test-tmp/sweep-check/graft_qtmp"
    spark.conf.set(Scratch.ConfKey, root)
    try {
      val probe = new java.io.File(s"$root/some_query/part-0")
      probe.getParentFile.mkdirs()
      java.nio.file.Files.writeString(probe.toPath, "ephemeral")
      Scratch.sweep(spark)
      assert(!new java.io.File(root).exists(), "sweep must delete the tree")

      // a conf pointing anywhere else must be refused, not recursed into
      val guarded = "/root/repo/target/test-tmp/sweep-guard"
      new java.io.File(s"$guarded/keep").mkdirs()
      spark.conf.set(Scratch.ConfKey, guarded)
      Scratch.sweep(spark)
      assert(new java.io.File(s"$guarded/keep").exists(),
        "sweep must refuse roots that are not a graft_qtmp leaf")
    } finally spark.conf.unset(Scratch.ConfKey)
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
