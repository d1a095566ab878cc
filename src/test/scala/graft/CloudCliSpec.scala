package graft

/** Smoke coverage for the [[Cloud]] reference-parity CLI: each of the
  * three modes (taxon / family / host — the three reference scripts)
  * parses its flag set and writes non-empty node/edge viz JSON over
  * the sf0.001 corpus, and the flag overloads dispatch correctly. */
class CloudCliSpec extends SparkSpec {
  private def tmpOut(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), s"cloudcli_$tag").toString

  private def jsonLines(path: String): Long =
    spark.read.json(path).count()

  test("flag parsing: the three reference flag sets dispatch to the right mode") {
    val t = Cloud.parseArgs(Seq("-t", "Tequatrovirus", "-d", "0.15"))
    assert(t.taxon.contains("Tequatrovirus") && t.dist.contains(0.15)
      && t.family.isEmpty && t.host.isEmpty)
    val f = Cloud.parseArgs(Seq("-f", "Herelleviridae", "-t", "genus"))
    assert(f.family.contains("Herelleviridae") && f.taxon.contains("genus"))
    val h = Cloud.parseArgs(Seq("-g", "Cellulophaga", "--thres", "0.25", "--harsh"))
    assert(h.host.contains("Cellulophaga") && h.harsh
      && h.taxon.contains("0.25"), "host-mode -t/--thres rides the shared slot")
    intercept[IllegalArgumentException](Cloud.parseArgs(Seq("--bogus")))
  }

  test("taxon mode writes node/edge viz JSON (reference gdb.py surface)") {
    val out = tmpOut("tax")
    val written = Cloud.run(spark, Cloud.parseArgs(Seq(
      "-t", graph.TestGraph.Taxon, "-d", "0.10", "--data", SF, "--out", out)))
    assert(written.toSet == Set(s"$out/nodes", s"$out/edges"))
    assert(jsonLines(s"$out/nodes") > 0, "taxon cloud nodes written")
    assert(jsonLines(s"$out/edges") > 0, "taxon cloud edges written")
    val node = spark.read.json(s"$out/nodes").columns.toSet
    assert(node == Set("phage", "attrs"), s"pyvis attr blob schema: $node")
  }

  test("family mode colours by rank and writes the induced edges") {
    val out = tmpOut("fam")
    val written = Cloud.run(spark, Cloud.parseArgs(Seq(
      "-f", graph.TestGraph.Family, "-t", "subfamily", "-d", "0.10",
      "--data", SF, "--out", out)))
    assert(written.size == 2)
    val nodes = spark.read.json(s"$out/nodes")
    assert(nodes.count() > 0 && nodes.columns.toSet ==
      Set("phage", "color", "size", "title"))
    assert(jsonLines(s"$out/edges") > 0)
    // the -t overload rejects a non-rank value in family mode
    intercept[IllegalArgumentException] {
      Cloud.run(spark, Cloud.parseArgs(Seq(
        "-f", graph.TestGraph.Family, "-t", "NotARank", "--data", SF)))
    }
  }

  test("host mode honors --harsh and the hex source palette") {
    val out = tmpOut("host")
    Cloud.run(spark, Cloud.parseArgs(Seq(
      "-g", graph.TestGraph.HostGenus, "-t", "0.10", "--harsh",
      "--data", SF, "--out", out)))
    val nodes = spark.read.json(s"$out/nodes")
    assert(nodes.count() > 0)
    import org.apache.spark.sql.functions.col
    val colors = nodes.select(col("color")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(colors.subsetOf(Set("#8acb4a", "#39dede", "#f1e653",
      "#9b4aed", "#c734df", "#ffffff")), s"host palette only: $colors")
  }
}
