package graft

import graft.index.FoldProtocol
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

/** Conformance exercise for the [[FoldProtocol.CommitPrimitive]] trait —
  * the object-store shim surface: every protocol lifecycle and steal
  * scenario must hold under BOTH the default in-process primitive
  * (stamp check + atomic rename under the root's JVM lock) and a fake
  * with genuine object-store semantics (conditional PUT: compare the
  * lease object's content and land the pointer object as ONE
  * linearizable server-side operation — NO rename, NO lock shared with
  * the JVM's lease mutations). Green under both proves the trait
  * surface actually suffices for an S3/GCS deployment: nothing in the
  * protocol's exactly-once story secretly depends on rename atomicity
  * or on the in-process rootLock.
  */
class CommitPrimitiveConformanceSpec extends SparkSpec {
  import spark.implicits._

  /** Object-store conditional PUT: the "store server" (its own monitor,
    * standing in for the store's internal linearization of conditional
    * writes — deliberately NOT [[FoldProtocol]]'s rootLock) reads the
    * lease object's content (the etag of a content-addressed pointer)
    * and, iff it matches the expected fence, replaces the destination
    * object in one shot. No staging sibling, no rename — a PUT is the
    * store's atomic object swap. This is exactly the If-Match request
    * an S3/GCS deployment issues per table-format log commit.
    */
  object FakeObjectStoreCommitPrimitive extends FoldProtocol.CommitPrimitive {
    private val serverLock = new Object
    val puts = new AtomicInteger(0)
    def replaceIfFenced(conf: org.apache.hadoop.conf.Configuration,
        root: String, dst: org.apache.hadoop.fs.Path, content: Array[Byte],
        leaseFile: org.apache.hadoop.fs.Path,
        expectFence: Option[String]): Boolean = serverLock.synchronized {
      val f = dst.getFileSystem(conf)
      val fenceHolds = expectFence.forall { stamp =>
        try {
          f.exists(leaseFile) && {
            val in = f.open(leaseFile)
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().map(_.trim).find(_.nonEmpty).contains(stamp)
            finally in.close()
          }
        } catch { case _: java.io.IOException => false }
      }
      if (!fenceHolds) false
      else {
        val out = f.create(dst, true) // PUT: direct overwrite, no rename
        try out.write(content) finally out.close()
        puts.incrementAndGet()
        true
      }
    }
  }

  private def underPrimitive(p: FoldProtocol.CommitPrimitive)(
      body: => Unit): Unit = {
    val prev = FoldProtocol.commitPrimitive
    FoldProtocol.commitPrimitive = p
    try body finally FoldProtocol.commitPrimitive = prev
  }

  private def writeDir(dir: String, rows: Seq[Long]): Unit =
    rows.toDF("v").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)

  private val primitives: Seq[(String, FoldProtocol.CommitPrimitive)] = Seq(
    "LockedCommitPrimitive" -> FoldProtocol.LockedCommitPrimitive,
    "FakeObjectStoreCommitPrimitive" -> FakeObjectStoreCommitPrimitive)

  for ((pname, prim) <- primitives) {

    test(s"$pname: the full leased lifecycle — folds, replay " +
      "short-circuit, delete, manifest publish — commits identically") {
      underPrimitive(prim) {
        val root = tmpDir(s"conform-life-$pname")
        val p = new FoldProtocol(root, "_ledger")
        writeDir(s"$root/data/seed", Seq(1L, 2L))
        p.withLease("lifecycle") {
          assert(p.fold(1L, Seq("data")) {
            writeDir(s"$root/data/b1", Seq(3L))
          })
          assert(!p.fold(1L, Seq("data")) {
            fail("a ledgered batch must not re-stage")
          }, "replay must short-circuit")
          assert(p.fold(2L, Seq("data")) {
            writeDir(s"$root/data/b2", Seq(4L))
          })
          assert(p.delete(0L) { writeDir(s"$root/tombstones/d0", Seq(2L)) })
          // manifest publish (compaction shape) through the primitive
          writeDir(s"$root/.data.staging", Seq(1L, 3L, 4L))
          p.publishDir(".data.staging", "data")
        }
        assert(p.foldedBatches() == Set(1L, 2L))
        assert(p.deletedBatches() == Set(0L))
        assert(p.resolveKind("data") == "data.g1")
        assert(spark.read.parquet(p.dir("data")).as[Long].collect()
          .sorted.toSeq == Seq(1L, 3L, 4L))
      }
    }

    test(s"$pname: a steal landing INSIDE the verify→replace window is " +
      "refused by the primitive's own conditional semantics") {
      underPrimitive(prim) {
        // does not install the wrapper below via commitPrimitive —
        // wrap here so the steal fires after the advisory verifyFence
        // passed, leaving the refusal entirely to the primitive
        val root = tmpDir(s"conform-steal-$pname")
        val p = new FoldProtocol(root, "_ledger")
        val lease = new org.apache.hadoop.fs.Path(root, "_writer_lease")
        val lfs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val fired = new AtomicReference(false)
        val wrapper = new FoldProtocol.CommitPrimitive {
          def replaceIfFenced(conf: org.apache.hadoop.conf.Configuration,
              r: String, dst: org.apache.hadoop.fs.Path,
              content: Array[Byte], leaseFile: org.apache.hadoop.fs.Path,
              expectFence: Option[String]): Boolean = {
            if (!fired.get()) {
              fired.set(true)
              // the steal: plain lease-file ops, NOT routed through the
              // primitive and NOT holding any lock the fake shares
              lfs.delete(lease, false)
              val out = lfs.create(lease, false)
              try out.write(
                s"window-thief@${System.currentTimeMillis()}"
                  .getBytes("UTF-8"))
              finally out.close()
            }
            prim.replaceIfFenced(conf, r, dst, content, leaseFile,
              expectFence)
          }
        }
        FoldProtocol.commitPrimitive = wrapper
        val err = intercept[IllegalStateException] {
          p.withLease("victim") { p.commit("11") }
        }
        assert(err.getMessage.contains("conditional commit failed"),
          s"the conditional replace must refuse, got: ${err.getMessage}")
        assert(p.foldedBatches().isEmpty,
          "the victim's entry must never reach the ledger")
        lfs.delete(lease, false)
        // window clear: the same commit lands through the primitive
        FoldProtocol.commitPrimitive = prim
        p.withLease("legit") { p.commit("11") }
        assert(p.foldedBatches() == Set(11L))
      }
    }

    test(s"$pname: the staged-dir guard fails a fold whose staged data " +
      "vanished, through this primitive's commit path too") {
      underPrimitive(prim) {
        val root = tmpDir(s"conform-guard-$pname")
        val p = new FoldProtocol(root, "_ledger")
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        p.withLease("guarded") {
          val err = intercept[IllegalStateException] {
            p.fold(5L, Seq("data")) {
              writeDir(s"$root/data/b5", Seq(5L))
              fs.delete(new org.apache.hadoop.fs.Path(s"$root/data/b5"),
                true)
            }
          }
          assert(err.getMessage.contains("staged-dir guard failed"))
        }
        assert(p.foldedBatches().isEmpty)
      }
    }
  }

  test("FakeObjectStoreCommitPrimitive really lands commits as PUTs " +
    "(no rename): the leased ledger replaces all route through it") {
    FakeObjectStoreCommitPrimitive.puts.set(0)
    underPrimitive(FakeObjectStoreCommitPrimitive) {
      val root = tmpDir("conform-puts")
      val p = new FoldProtocol(root, "_ledger")
      p.withLease("counting") { p.commit("1"); p.commit("2") }
      assert(p.foldedBatches() == Set(1L, 2L))
    }
    assert(FakeObjectStoreCommitPrimitive.puts.get() == 2,
      "both leased ledger commits must have landed as conditional PUTs")
  }
}
