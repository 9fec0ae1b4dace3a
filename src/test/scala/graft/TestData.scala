package graft

/** Locates the driver-generated parquet fixtures for specs.
  *
  * The root is overridable (`-Dgraft.testdata=...` or env
  * `GRAFT_TESTDATA`) so the suite isn't welded to this machine's
  * layout; specs `assume(TestData.available(sf))` so a missing
  * fixture skips the test cleanly instead of dying in an opaque
  * `AnalysisException` mid-plan.
  */
object TestData {
  val root: String = sys.props.get("graft.testdata")
    .orElse(sys.env.get("GRAFT_TESTDATA"))
    .getOrElse("/root/testdata")

  def sf(scale: String): String = s"$root/$scale"

  def available(sfDir: String): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sfDir))

  /** The one fixture guard every spec shares: resolves the scale dir
    * and CANCELS (not fails) the calling test when the
    * driver-generated parquet isn't present on this machine.
    */
  def requireSf(scale: String): String = {
    val d = sf(scale)
    org.scalatest.Assertions.assume(available(d), s"testdata missing at $d")
    d
  }
}
