package graft.streaming

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

/** Spool lifecycle hygiene for [[DeltaFrame]]: auto-placed spools may
  * land on tmpfs (RAM), so a leaked dir is leaked memory. Pins the
  * three defenses: (1) a JVM shutdown hook deletes live auto-placed
  * spools on abnormal exit (simulated by invoking the hook body
  * directly — forking a JVM to really kill it would test the JDK, not
  * us); (2) an age-based orphan sweep at construction removes
  * `graft-delta-*` dirs a killed JVM left behind without touching a
  * concurrent healthy JVM's fresh spools; (3) tmpfs placement is
  * capacity-checked and a low-space spool migrates to disk instead of
  * failing with ENOSPC. */
class DeltaFrameHygieneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmpParent =
    new java.io.File(System.getProperty("java.io.tmpdir"))

  test("simulated kill: shutdown-hook body deletes live auto-placed " +
      "spools; a reconstructed frame starts clean") {
    import spark.implicits._
    val d = new DeltaFrame(spark, "killme", compactEvery = 3)
    d.append(Seq((1L, "a")).toDF("k", "v"))
    val root = new java.io.File(d.rootDir)
    assert(root.isDirectory, "spool root must exist while live")
    // the kill path: same body the JVM shutdown hook runs
    DeltaFrame.shutdownCleanup()
    assert(!root.exists(), "shutdown cleanup must delete the spool")
    // reconstruct: a fresh frame works and no stale dir of the killed
    // one remains
    val d2 = new DeltaFrame(spark, "killme", compactEvery = 3)
    d2.append(Seq((2L, "b")).toDF("k", "v"))
    assert(d2.read.count() === 1)
    assert(!root.exists())
    d2.delete()
    assert(!new java.io.File(d2.rootDir).exists())
  }

  test("orphan sweep removes aged graft-delta-* dirs but spares " +
      "fresh ones (concurrent healthy JVMs)") {
    val now = System.currentTimeMillis()
    val stale = new java.io.File(tmpParent, "graft-delta-stale-spec")
    val fresh = new java.io.File(tmpParent, "graft-delta-fresh-spec")
    try {
      assert(stale.mkdirs() || stale.isDirectory)
      assert(fresh.mkdirs() || fresh.isDirectory)
      assert(stale.setLastModified(now - DeltaFrame.OrphanAgeMs - 60000L))
      DeltaFrame.sweepOrphans(parents = Seq(tmpParent), force = true)
      assert(!stale.exists(), "aged orphan must be swept")
      assert(fresh.exists(), "fresh dir (live elsewhere) must survive")
    } finally {
      stale.delete(); fresh.delete(); ()
    }
  }

  test("a spool idle past the age cutoff but carrying a fresh " +
      "heartbeat (live in ANOTHER process) survives the sweep") {
    val now = System.currentTimeMillis()
    // simulates a concurrent JVM's spool: root mtime hours old (reads
    // don't touch it; the stream folds daily), heartbeat fresh because
    // that JVM's refresher daemon is alive
    val idle = new java.io.File(tmpParent, "graft-delta-idlelive-spec")
    val dead = new java.io.File(tmpParent, "graft-delta-deadhb-spec")
    try {
      assert(idle.mkdirs() || idle.isDirectory)
      assert(dead.mkdirs() || dead.isDirectory)
      val hb = new java.io.File(idle, DeltaFrame.HeartbeatFile)
      assert(hb.createNewFile() || hb.exists())
      val deadHb = new java.io.File(dead, DeltaFrame.HeartbeatFile)
      assert(deadHb.createNewFile() || deadHb.exists())
      val old = now - DeltaFrame.OrphanAgeMs - 60000L
      assert(idle.setLastModified(old))
      assert(dead.setLastModified(old))
      assert(deadHb.setLastModified(old)) // owner stopped refreshing
      DeltaFrame.sweepOrphans(parents = Seq(tmpParent), force = true)
      assert(idle.exists(),
        "fresh heartbeat must prove cross-process liveness")
      assert(!dead.exists(),
        "stale heartbeat + stale root = orphan, must be swept")
    } finally {
      new java.io.File(idle, DeltaFrame.HeartbeatFile).delete()
      idle.delete(); dead.delete(); ()
    }
  }

  test("the owning JVM's refresher touches live spools' heartbeats") {
    import spark.implicits._
    val d = new DeltaFrame(spark, "hbspec", compactEvery = 3)
    try {
      d.append(Seq((1L, "a")).toDF("k", "v"))
      val hb = new java.io.File(new java.io.File(d.rootDir),
        DeltaFrame.HeartbeatFile)
      assert(hb.exists(), "registration must create the heartbeat")
      val old = System.currentTimeMillis() - 3600000L
      assert(hb.setLastModified(old))
      DeltaFrame.refreshHeartbeats() // the daemon thread's body
      assert(hb.lastModified() > old, "refresh must advance mtime")
    } finally d.delete()
  }

  test("tmpfs placement is capacity-gated (pure predicate) and a " +
      "spool migrates to disk preserving contents") {
    import spark.implicits._
    assert(DeltaFrame.tmpfsEligible(DeltaFrame.TmpfsMinFreeBytes))
    assert(!DeltaFrame.tmpfsEligible(DeltaFrame.TmpfsMinFreeBytes - 1))

    val d = new DeltaFrame(spark, "migr", compactEvery = 10)
    d.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    d.append(Seq((3L, "c")).toDF("k", "v"))
    val oldRoot = new java.io.File(d.rootDir)
    // low tmpfs space is not reproducible on demand — drive the same
    // path append() takes when usable space crosses the floor
    d.migrateToDisk()
    assert(!d.rootDir.startsWith("/dev/shm"),
      "migration target must be the disk temp dir")
    assert(!oldRoot.exists(), "old root must be reclaimed")
    assert(TestSpark.rows(d.read) ===
      Set(Seq("1", "a"), Seq("2", "b"), Seq("3", "c")))
    // the migrated spool keeps folding
    d.append(Seq((4L, "d")).toDF("k", "v"))
    assert(d.read.count() === 4)
    d.delete()
    assert(!new java.io.File(d.rootDir).exists())
  }
}
