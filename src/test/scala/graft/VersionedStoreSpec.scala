package graft

import graft.core.VersionedStore
import org.apache.hadoop.fs.Path

/** The versioned-store primitives in isolation (the integration story —
  * pinned reads, flips under load, advisor-gated rebuilds — lives in
  * VectorOpsSpec/ServeSpec): claim exclusivity under real thread races,
  * TTL takeover, publish idempotence, numeric version resolution past the
  * 8-digit format, and the minAge vacuum contract.
  */
class VersionedStoreSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-vstore").toString + "/store"

  test("claim is exclusive under a 16-thread race; release reopens it") {
    val root = freshRoot()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val wins = Await.result(
      Future.sequence((1 to 16).toList.map(_ =>
        Future(VersionedStore.claim(spark, root, 7L, ttlMs = 60000L)))),
      2.minutes)
    assert(wins.count(identity) == 1, s"exactly one claimant may win: $wins")
    // held lease refuses a fresh claimant...
    assert(!VersionedStore.claim(spark, root, 7L, ttlMs = 60000L))
    // ...and a release reopens the version for the next writer
    VersionedStore.release(spark, root, 7L)
    assert(VersionedStore.claim(spark, root, 7L, ttlMs = 60000L))
  }

  test("a stale lease is taken over by exactly one of two racing takeovers") {
    val root = freshRoot()
    assert(VersionedStore.claim(spark, root, 3L, ttlMs = 60000L))
    // the holder "crashed": backdate its lease past the TTL, so takeover
    // candidates see a stale lease while the eventual winner's fresh
    // lease stays live (ttl=0 would make EVERY lease instantly stale —
    // by contract that setting means steal-anytime)
    val lease = new java.io.File(
      new java.net.URI(s"file:$root/manifest/claim_v00000003").getPath)
    assert(lease.exists() && lease.setLastModified(
      System.currentTimeMillis() - 10L * 60 * 1000))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val wins = Await.result(
      Future.sequence((1 to 2).toList.map(_ =>
        Future(VersionedStore.claim(spark, root, 3L, ttlMs = 60000L)))),
      2.minutes)
    assert(wins.count(identity) == 1, s"one takeover wins: $wins")
    // a lease on a PUBLISHED version is inert: claim refuses outright
    VersionedStore.publish(spark, root, 3L)
    assert(!VersionedStore.claim(spark, root, 3L, ttlMs = 0L),
      "a published version is never claimable again")
  }

  test("publish is crash-retry idempotent and resolution is numeric past " +
    "8 digits") {
    val root = freshRoot()
    VersionedStore.publish(spark, root, 1L)
    VersionedStore.publish(spark, root, 1L) // the retry: no-op, no error
    assert(VersionedStore.currentVersion(spark, root) == Some(1L))
    // 9-digit version (the %08d format overflows its width): still the max
    VersionedStore.publish(spark, root, 100000000L)
    assert(VersionedStore.currentVersion(spark, root) == Some(100000000L))
    assert(VersionedStore.resolve(spark, root).endsWith("v100000000"))
    // and a LEXICALLY larger but numerically smaller name does not shadow it
    VersionedStore.publish(spark, root, 99999999L)
    assert(VersionedStore.currentVersion(spark, root) == Some(100000000L))
  }

  test("vacuum honors keepLast and the minAge grace window") {
    val root = freshRoot()
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1L to 4L).foreach { v =>
      fs.mkdirs(new Path(VersionedStore.versionDir(root, v)))
      VersionedStore.publish(spark, root, v)
    }
    // all supersessions happened milliseconds ago: a long grace keeps all
    assert(VersionedStore.vacuum(spark, root, keepLast = 1,
      minAgeMs = 10L * 60 * 1000) == Nil)
    // no grace: everything but the newest goes, dirs and pointers both
    assert(VersionedStore.vacuum(spark, root, keepLast = 1) == Seq(1L, 2L, 3L))
    assert(!fs.exists(new Path(VersionedStore.versionDir(root, 1L))))
    assert(VersionedStore.currentVersion(spark, root) == Some(4L))
    // keepLast is validated
    intercept[IllegalArgumentException](
      VersionedStore.vacuum(spark, root, keepLast = 0))
  }

  test("a lease stolen mid-build aborts the publish loudly instead of " +
    "blessing a possibly multi-writer directory") {
    val root = freshRoot()
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(VersionedStore.versionDir(root, 1L)))
    VersionedStore.publish(spark, root, 1L)
    val e = intercept[IllegalArgumentException] {
      VersionedStore.buildNext(spark, root, ttlMs = 60000L) { dir =>
        fs.mkdirs(new Path(dir))
        // the steal: a mis-fired takeover replaces our lease with its own
        val cl = new Path(s"$root/manifest/claim_v00000002")
        fs.delete(cl, false)
        val out = fs.create(cl, true)
        out.write("thief-token".getBytes("UTF-8")); out.close()
      }
    }
    assert(e.getMessage.contains("lost mid-build"))
    assert(VersionedStore.currentVersion(spark, root) == Some(1L),
      "a stolen-lease build must not publish")
    // holdsLease is the primitive: false for a lease this process lost
    assert(!VersionedStore.holdsLease(spark, root, 2L))
  }

  test("init builds v1 exactly once under concurrency; buildNext refuses " +
    "a live lease and a double-init") {
    val root = freshRoot()
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dirs = Await.result(
      Future.sequence((1 to 4).toList.map(_ => Future(
        VersionedStore.init(spark, root, ttlMs = 60000L) { dir =>
          built.incrementAndGet()
          val fs = new Path(dir).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          fs.mkdirs(new Path(dir))
        }))),
      2.minutes)
    assert(built.get() == 1, "exactly one initializer builds")
    assert(dirs.distinct.size == 1 && dirs.head.endsWith("v00000001"))
    intercept[IllegalArgumentException](
      VersionedStore.init(spark, root, ttlMs = 60000L)(_ => ()))
    // buildNext publishes v2; while its lease is held a second builder is
    // refused loudly (simulate with a manual claim on v3)
    val v2 = VersionedStore.buildNext(spark, root, ttlMs = 60000L) { dir =>
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path(dir))
    }
    assert(v2.endsWith("v00000002"))
    assert(VersionedStore.claim(spark, root, 3L, ttlMs = 60000L))
    val e = intercept[IllegalArgumentException](
      VersionedStore.buildNext(spark, root, ttlMs = 60000L)(_ => ()))
    assert(e.getMessage.contains("build lease"))
    assert(VersionedStore.currentVersion(spark, root) == Some(2L))
  }
}
