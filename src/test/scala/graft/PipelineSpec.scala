package graft

import java.nio.file.{Files, Path}

import graft.pipeline.{Dashboard, HeartFailureEtl}

/** Golden end-to-end test (SURVEY §5.2 item 3): miniature hospital
  * CSVs per FIXTURES.md §1 through the full composed pipeline;
  * asserts the exact output schema and row set, then the dashboard
  * queries over the sink.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(dir: Path, name: String, lines: String*): String = {
    val f = dir.resolve(name)
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  // FIXTURES.md §1.1: leading zeros, mixed measures, unparseable
  // metrics, a passthrough column, a facility with no hospital match.
  private lazy val fixtures: (String, String) = {
    val dir = Files.createTempDirectory("graft_golden")
    val readm = writeCsv(dir, "readmissions.csv",
      "Facility ID,Facility Name,State,Measure Name,Number of Discharges,Excess Readmission Ratio,Start Date",
      "010001,Readm Name A,XX,READM-30-HF-HRRP,250,1.0502,07/01/2021",
      "050002,Readm Name B,YY,READM-30-HF-HRRP,N/A,0.9800,07/01/2021",       // dropped: N/A discharges
      "010001,Readm Name A,XX,READM-30-AMI-HRRP,100,1.2000,07/01/2021",      // dropped: other measure
      "060003,Readm Name C,ZZ,READM-30-HF-HRRP,80,Too Few to Report,07/01/2021", // dropped: bad ratio
      "070004,Readm Name D,WW,READM-30-HF-HRRP,55,0.8800,07/01/2021",        // dropped: no hospital match
      "050002,Readm Name B,YY,READM-30-HF-HRRP,120,1.1000,07/01/2021")
    val hosp = writeCsv(dir, "hospital_info.csv",
      "Facility ID,Facility Name,City/Town,State,Hospital Type,Hospital Ownership,Phone Number",
      "010001,True Name A,Springfield,AL,Acute Care,Government,555-0001",
      "050002,True Name B,Rivertown,,Acute Care,Proprietary,555-0002",        // null state
      "090009,True Name E,Lakeside,CA,Critical Access,Voluntary,555-0009")    // no readm match
    (readm, hosp)
  }

  test("golden E2E: schema and row set match the reference chain exactly") {
    val (readmCsv, hospCsv) = fixtures
    val out = Files.createTempDirectory("graft_golden_out").resolve("hf").toString
    val result = HeartFailureEtl.run(spark, readmCsv, hospCsv, out)

    // Schema: readmissions cols minus state/facility_name, plus the 5
    // non-key hospital cols; no extra/index columns (FIXTURES.md §1.3).
    assert(result.columns.toSeq == Seq(
      "facility_id", "measure_name", "number_of_discharges",
      "excess_readmission_ratio", "start_date",
      "facility_name", "city_town", "state", "hospital_type",
      "hospital_ownership"))

    val rows = result
      .select("facility_id", "number_of_discharges", "excess_readmission_ratio",
        "facility_name", "state", "start_date")
      .as[(String, Double, Double, String, Option[String], String)]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      ("010001", 250.0, 1.0502, "True Name A", Some("AL"), "07/01/2021"),
      ("050002", 120.0, 1.1000, "True Name B", None, "07/01/2021")))
  }

  test("golden E2E: overwrite semantics — rerun replaces, not appends") {
    val (readmCsv, hospCsv) = fixtures
    val out = Files.createTempDirectory("graft_golden_out2").resolve("hf").toString
    HeartFailureEtl.run(spark, readmCsv, hospCsv, out)
    val second = HeartFailureEtl.run(spark, readmCsv, hospCsv, out)
    assert(second.count() == 2)
  }

  test("golden E2E: fully-filtered input yields an empty frame with intact schema") {
    val dir = Files.createTempDirectory("graft_golden_empty")
    val readm = writeCsv(dir, "readmissions.csv",
      "Facility ID,Facility Name,State,Measure Name,Number of Discharges,Excess Readmission Ratio,Start Date",
      "010001,A,XX,READM-30-AMI-HRRP,100,1.2,07/01/2021") // wrong measure only
    val hosp = writeCsv(dir, "hospital_info.csv",
      "Facility ID,Facility Name,City/Town,State,Hospital Type,Hospital Ownership,Phone Number",
      "010001,True A,Springfield,AL,Acute Care,Government,555-0001")
    val out = dir.resolve("hf").toString
    val result = HeartFailureEtl.run(spark, readm, hosp, out)
    assert(result.count() == 0)
    assert(result.columns.length == 10) // schema survives an empty write
    assert(Dashboard.totalHospitals(result).as[Long].head() == 0L)
    // null-skipping mean over zero rows is null, like pandas mean of empty
    assert(Dashboard.averageRatio(result).collect().head.isNullAt(0))
  }

  test("dashboard queries over the golden sink") {
    val (readmCsv, hospCsv) = fixtures
    val out = Files.createTempDirectory("graft_golden_out3").resolve("hf").toString
    HeartFailureEtl.run(spark, readmCsv, hospCsv, out)
    val df = Dashboard.load(spark, out)
    try {
      assert(Dashboard.totalHospitals(df).as[Long].head() == 2L)
      assert(math.abs(Dashboard.averageRatio(df).as[Double].head() - 1.0751) < 1e-12)
      // pandas groupby drops the null state: only AL remains
      val byState = Dashboard.ratioByState(df)
        .as[(String, Double)].collect().toMap
      assert(byState.keySet == Set("AL"))
      assert(byState("AL") == 1.0502)
      // top-1 highest/lowest with facility tiebreaker
      assert(Dashboard.topHospitals(df, highest = true, 1)
        .select("facility_id").as[String].head() == "050002")
      assert(Dashboard.topHospitals(df, highest = false, 1)
        .select("facility_id").as[String].head() == "010001")
    } finally df.unpersist()
  }

  test("observed pipeline: stage counts ride the write action, no extra jobs") {
    val (readmCsv, hospCsv) = fixtures
    val (result, probes) = HeartFailureEtl.transformObserved(
      graft.ops.Ingest.csvChecked(spark, readmCsv, HeartFailureEtl.readmissionsSchema),
      graft.ops.Ingest.csvChecked(spark, hospCsv, HeartFailureEtl.hospitalInfoSchema))
    val out = Files.createTempDirectory("graft_golden_obs").resolve("hf").toString
    graft.ops.Sink.writeParquet(result, out)
    // the reference's logged counts (etl_script.py:100,120), collected
    // by the ONE write job above: 3 records survive coerce+dropna+
    // measure filter (010001, 050002, 070004); 070004 then drops in
    // the join (no hospital match) -> 2 final rows
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(probes.keySet == Set("hf_filtered", "final"))
      assert(probes("hf_filtered").get("n_rows") == 3L)
      assert(probes("final").get("n_rows") == 2L)
      // reading the metrics must run NO job — the accumulators were
      // filled by the write action (listener added after the write, so
      // it only sees jobs started by the get() calls above)
      Thread.sleep(300) // listener delivery is async
      assert(jobs == 0, s"Observation.get triggered $jobs Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
