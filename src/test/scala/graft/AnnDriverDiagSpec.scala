package graft

/** Driver-visible ANN census diagnostics (r17 verdict "Next round" #1a).
  *
  * Background: q_ann_build / q_ann_delta / q_ann_stats fail `hash_match`
  * in the DRIVER's oracle gate (16/16 rows, schema ok, byte-stable across
  * r16 and r17) while the builder's identical-tooling local gate passes
  * 552/552 reproducibly. Local evidence is exhausted: at sf0.01 the Spark
  * engine, the DuckDB oracle, and an independent pure-Python replay
  * (tools/ann_margin_audit.py) agree BYTE-FOR-BYTE, and every argmax /
  * argmin decision in the assignment has a relative margin ≥ 9.1e-5 —
  * eleven orders of magnitude above double precision, so no
  * IEEE-conforming environment can flip a single cell or code.
  *
  * This spec runs the three census queries through the exact registry
  * entry points the driver verifies, prints the full 16-row results, and
  * asserts them against the committed three-way-agreed values. The print
  * is repeated from a JVM shutdown hook so it lands in the LAST ~3 KB of
  * the `sbt test` output — the window the driver archives as
  * VERIFY_r18.json's test_tail. Outcomes, either way decisive:
  *   - test PASSES in the driver's run → the engine's values in the
  *     driver environment equal the local three-way-agreed values, so
  *     the driver-gate divergence is on its ORACLE side (or in its
  *     compare), not in this repo's engine;
  *   - test FAILS there → the assertion message carries the actual
  *     engine rows, localizing the divergence to specific cells.
  */
class AnnDriverDiagSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  // Three-way agreed values at sf0.01 (Spark = DuckDB 1.0.0 = Python
  // replay; see tools/ann_margin_audit.py and OPTIMIZATION_r18.md).
  private val expected = Map(
    "q_ann_build" ->
      ("0:28:27999999667197:618:1:475;1:31:30999999576350:714:2:471;2:46:46000000169625:1157:3:499;" +
        "3:24:24000000384898:684:4:496;4:31:30999999904890:862:5:493;5:30:30000000232404:859:6:437;" +
        "6:37:37000000268472:1090:7:466;7:40:39999999926098:1302:8:497;8:20:20000000599031:595:9:489;" +
        "9:32:31999999512159:835:10:488;10:23:23000000124152:624:11:465;11:30:30000000205460:818:12:478;" +
        "12:33:33000000667062:972:13:481;13:29:28999999550716:758:14:498;14:30:29999999665105:862:15:492;" +
        "15:35:34999999780567:955:16:469"),
    "q_ann_delta" ->
      ("0:14:16:29999999471008;1:13:11:24000000102705;2:15:15:30000000395865;3:20:18:37999999699705;" +
        "4:20:13:32999999776982;5:9:15:24000000249389;6:17:15:31999999564658;7:16:19:34999999562087;" +
        "8:16:19:35000000339440;9:23:19:41999999843960;10:12:8:20000000222841;11:17:16:33000000519564;" +
        "12:18:20:38000000288966;13:11:16:26999999278475;14:11:12:23000000466048;15:17:18:35000000452493"),
    "q_ann_stats" ->
      ("0:28:25650809872778:1171092706436;1:31:29102055091931:1186988727190;2:46:43540624940352:1209237018062;" +
        "3:24:20859871143873:1090552142268;4:31:27227320254434:1070842820518;5:30:28585596001727:1206720901214;" +
        "6:37:33895718984874:1225661457799;7:40:37130717066400:1143759492587;8:20:19065190107784:1128482886866;" +
        "9:32:32507667408710:1243285382421;10:23:22730620921018:1152005281589;11:30:30594103556958:1322260628046;" +
        "12:33:33282837808144:1295024489136;13:29:28332757971272:1159999855474;14:30:29612061238109:1186312429185;" +
        "15:35:34806808064245:1185098010073"))

  test("ANN census values at sf0.01 match the three-way-agreed rows (driver-visible)") {
    assume(new java.io.File(s"$sf01/embeddings.parquet").exists())
    val lines = Seq("q_ann_build", "q_ann_delta", "q_ann_stats").map { n =>
      val rows = SparkEntry.queries(n)(spark, sf01).collect()
        .map(_.toSeq.map {
          case d: java.math.BigDecimal => d.toBigInteger.toString
          case v => String.valueOf(v)
        }.mkString(":")).mkString(";")
      println(s"ANNDIAG $n $rows")
      n -> rows
    }
    AnnDriverDiagSpec.record(lines.map { case (n, r) => s"ANNDIAG $n $r" })
    lines.foreach { case (n, rows) =>
      assert(rows == expected(n),
        s"$n engine census diverged from the three-way-agreed values; actual=$rows")
    }
  }
}

object AnnDriverDiagSpec {
  @volatile private var pending: Seq[String] = Nil
  private lazy val hookOnce: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      // reprint at JVM exit: suite-order output can bury the in-test
      // print outside the driver's 3 KB tail capture; the hook's output
      // lands after ScalaTest's summary, inside the window
      pending.foreach(println)
      System.out.flush()
    }))
  def record(lines: Seq[String]): Unit = { hookOnce; pending = lines }
}
