package graft

import org.scalatest.funsuite.AnyFunSuite

/** The COVERAGE.md header count lagged the gate registry two rounds
  * running (round-11 and round-12 verdicts); instead of another manual
  * edit, the ledger is now a spec-asserted derivative of the registry:
  * the header's "N/N passing" must equal `SparkEntry.queries.size`, so
  * landing a gate without updating the ledger fails the build.
  */
class CoverageLedgerSpec extends AnyFunSuite {

  test("COVERAGE.md header count equals the registered gate count") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = """\*\*(\d+)/(\d+) passing as of round (\d+)\*\*""".r
      .findFirstMatchIn(text)
      .getOrElse(fail("COVERAGE.md header lost its '**N/N passing as of round R**' line"))
    val registered = SparkEntry.queries.size
    assert(m.group(1).toInt === registered && m.group(2).toInt === registered,
      s"COVERAGE.md header says ${m.group(1)}/${m.group(2)} but " +
        s"SparkEntry registers $registered gates — update the ledger header")
  }
}
