package graft.log

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Test-side view of a storage backend, so the commit-protocol suites
  * (RecoverySpec crash matrix, GenerationSpec flip protocol,
  * LinearizabilitySpec) run against BOTH adapters:
  *
  *  - `posix` — the filesystem semantics the store has always run on;
  *  - `object` — S3 semantics per the reference's own simulation
  *    (no rename, no locks, conditional put, list-after-write,
  *    atomic whole-object PUT — /root/reference/sim/src/s3.rs).
  *
  * The harness owns the backend-specific parts of CRASH FABRICATION:
  * a dead writer's leftover is a torn or whole FILE on POSIX, but on
  * an object store a PUT either completed (whole object, listed) or
  * never happened — torn objects do not exist, so the torn-write
  * fault degenerates to "nothing landed".
  */
sealed trait BackendHarness {
  def label: String
  /** Fresh root governed by this backend (registers it first). */
  def freshRoot(prefix: String): String
  /** Re-materialize a dead writer's COMPLETED data put (crash sim). */
  def restoreDead(root: String, dir: Path, name: String, bytes: Array[Byte]): Unit
  /** Whether a kill mid-write can leave a torn, footerless data file
    * (POSIX yes; object stores never — PUT is atomic). */
  def supportsTorn: Boolean
  /** Data-file names visible to the PROTOCOL's listing under dir. */
  def listData(root: String, dir: Path): Set[String]
  /** Fabricate a whole published data file (e.g. a crashed
    * compaction's completed generation rewrite). */
  def fabricate(root: String, dir: Path, recs: Seq[DirectParquet.Rec]): Unit
  /** Whether a prefix still holds any data object. */
  def dataExists(root: String, dir: Path): Boolean
}

object BackendHarness {
  val all: Seq[BackendHarness] =
    Seq(PosixHarness, ObjectHarness, HttpHarness, FlakyHttpHarness)

  /** One shared localhost object server per test JVM (keys are
    * canonical absolute paths, so a single server serves every root). */
  lazy val sharedHttpEndpoint: String = HttpObjectServer.start()._2

  /** One shared fault-injecting proxy in front of [[sharedHttpEndpoint]]
    * (seeded; every request identity faulted at most once, so bounded
    * client retries always make progress — see NetFaultProxy). */
  lazy val sharedFlakyEndpoint: String = {
    val (_, ep, controls) = NetFaultProxy.start(sharedHttpEndpoint, seed = 17L)
    controls.faultP = 0.20
    ep
  }

  object PosixHarness extends BackendHarness {
    val label = "posix"
    val supportsTorn = true
    def freshRoot(prefix: String): String =
      Files.createTempDirectory(prefix).toString
    def restoreDead(root: String, dir: Path, name: String,
                    bytes: Array[Byte]): Unit = {
      Files.createDirectories(dir)
      Files.write(dir.resolve(name), bytes)
      ()
    }
    def listData(root: String, dir: Path): Set[String] =
      PosixBackend.listData(dir).map(_.getFileName.toString).toSet
    def fabricate(root: String, dir: Path, recs: Seq[DirectParquet.Rec]): Unit = {
      DirectParquet.writeBatch(dir.toString, recs)
      ()
    }
    def dataExists(root: String, dir: Path): Boolean =
      PosixBackend.dataExists(dir)
  }

  object ObjectHarness extends BackendHarness {
    val label = "object"
    val supportsTorn = false
    def freshRoot(prefix: String): String = {
      val root = Files.createTempDirectory(prefix).toString
      ObjectStoreBackend.install(root)
      root
    }
    private def backend(root: String): ObjectStoreBackend =
      StorageBackend.forRoot(root).asInstanceOf[ObjectStoreBackend]
    def restoreDead(root: String, dir: Path, name: String,
                    bytes: Array[Byte]): Unit =
      backend(root).putDataBytes(dir.resolve(name), bytes)
    def listData(root: String, dir: Path): Set[String] =
      backend(root).listData(dir).map(_.getFileName.toString).toSet
    def fabricate(root: String, dir: Path, recs: Seq[DirectParquet.Rec]): Unit = {
      val scratch = Files.createTempDirectory("graft-fab")
      val f = java.nio.file.Paths.get(
        DirectParquet.writeBatch(scratch.toString, recs))
      backend(root).putData(f, dir.resolve(f.getFileName))
    }
    def dataExists(root: String, dir: Path): Boolean =
      backend(root).dataExists(dir)
  }

  /** Real-endpoint variant: same S3 semantics as ObjectHarness but
    * every protocol operation is an actual HTTP round trip to
    * [[sharedHttpEndpoint]] — request/response boundaries, encoding,
    * and server-side CAS atomicity are all exercised for real (the
    * reference's object_store_http analog). Cross-PROCESS coverage on
    * the same server is HttpCrossProcessSpec. */
  object HttpHarness extends BackendHarness {
    val label = "http"
    val supportsTorn = false
    def freshRoot(prefix: String): String = {
      val root = Files.createTempDirectory(prefix).toString
      HttpObjectBackend.install(root, sharedHttpEndpoint)
      root
    }
    private def backend(root: String): HttpObjectBackend =
      StorageBackend.forRoot(root).asInstanceOf[HttpObjectBackend]
    def restoreDead(root: String, dir: Path, name: String,
                    bytes: Array[Byte]): Unit =
      backend(root).putDataBytes(dir.resolve(name), bytes)
    def listData(root: String, dir: Path): Set[String] =
      backend(root).listData(dir).map(_.getFileName.toString).toSet
    def fabricate(root: String, dir: Path, recs: Seq[DirectParquet.Rec]): Unit = {
      val scratch = Files.createTempDirectory("graft-fab")
      val f = java.nio.file.Paths.get(
        DirectParquet.writeBatch(scratch.toString, recs))
      backend(root).putData(f, dir.resolve(f.getFileName))
    }
    def dataExists(root: String, dir: Path): Boolean =
      backend(root).dataExists(dir)
  }

  /** HTTP adapter behind the seeded fault-injecting proxy: every
    * protocol call can be dropped, lose its response, be duplicated,
    * or delayed — the turmoil-network discipline (sim/src/net.rs)
    * applied to the one backend that talks a real wire. Suites
    * iterating `all` thus run the crash matrix and the
    * linearizability workloads under network faults too; the
    * at-most-once fault rule keeps them deterministic. */
  object FlakyHttpHarness extends BackendHarness {
    val label = "flaky-http"
    val supportsTorn = false
    def freshRoot(prefix: String): String = {
      val root = Files.createTempDirectory(prefix).toString
      HttpObjectBackend.install(root, sharedFlakyEndpoint)
      root
    }
    private def backend(root: String): HttpObjectBackend =
      StorageBackend.forRoot(root).asInstanceOf[HttpObjectBackend]
    def restoreDead(root: String, dir: Path, name: String,
                    bytes: Array[Byte]): Unit =
      backend(root).putDataBytes(dir.resolve(name), bytes)
    def listData(root: String, dir: Path): Set[String] =
      backend(root).listData(dir).map(_.getFileName.toString).toSet
    def fabricate(root: String, dir: Path, recs: Seq[DirectParquet.Rec]): Unit = {
      val scratch = Files.createTempDirectory("graft-fab")
      val f = java.nio.file.Paths.get(
        DirectParquet.writeBatch(scratch.toString, recs))
      backend(root).putData(f, dir.resolve(f.getFileName))
    }
    def dataExists(root: String, dir: Path): Boolean =
      backend(root).dataExists(dir)
  }
}
