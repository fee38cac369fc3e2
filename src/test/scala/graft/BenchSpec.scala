package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness tests for the bench's stall-robustness machinery (round-7
  * verdict #5): suspect detection against committed local medians, and
  * the reference-medians parser that arms it. Pure JVM — no Spark
  * session, so this suite stays millisecond-cheap apart from the one
  * deliberate >5 s synthetic stall.
  */
class BenchSpec extends AnyFunSuite {

  test("suspect rule: threshold is max(3x local median, 1s)") {
    // sub-second keys flag only past the 1 s floor (round-9 verdict #1
    // lowered it from 5 s: ten sub-5 s keys sat at 5-10x local with no
    // resample), so sub-second jitter still never flags...
    assert(!Bench.isSuspect(0.9, Some(0.1)))
    // ...but a 0.19 s key stalled to 1.97 s (the round-9 text_stats
    // case) now does
    assert(Bench.isSuspect(1.97, Some(0.19)))
    assert(Bench.isSuspect(1.1, Some(0.1)))
    // slow keys flag at 3x their own median, not the floor
    assert(!Bench.isSuspect(8.9, Some(3.0)))
    assert(Bench.isSuspect(9.1, Some(3.0)))
    // no committed reference -> never suspect (new key, unknown cost)
    assert(!Bench.isSuspect(100.0, None))
  }

  test("sub-floor suspect rule: median >2x local with flat job counts " +
      "flags under the 1 s floor (r11 punch #7, trigger lowered r12 #2)") {
    // the json_roundtrip class: 0.869 s median vs 0.185 s local = 4.70x,
    // 2 jobs flat every run — under the 1 s floor no RUN ever flags, but
    // the KEY must now earn resamples
    assert(!Bench.isSuspect(0.869, Some(0.185)))
    assert(Bench.isSubFloorSuspect(0.869, Some(0.185), Seq(2, 2, 2)))
    // the r12 dark zone: dedup_repeated_spans at 2.31x local (2.43 s vs
    // 1.05), flat 5 jobs — the old 3x line left it unresampled
    assert(Bench.isSubFloorSuspect(2.43, Some(1.05), Seq(5, 5, 5)))
    // in-band median: quiet (2x exactly does not flag — strict >)
    assert(!Bench.isSubFloorSuspect(0.25, Some(0.185), Seq(2, 2, 2)))
    assert(!Bench.isSubFloorSuspect(2.10, Some(1.05), Seq(5, 5, 5)))
    // job-count drift = the plan changed, not the environment —
    // resampling cannot adjudicate that; it must stay visible as-is
    assert(!Bench.isSubFloorSuspect(0.869, Some(0.185), Seq(2, 3, 2)))
    // no committed reference / zero reference / no runs: never flags
    assert(!Bench.isSubFloorSuspect(0.869, None, Seq(2, 2, 2)))
    assert(!Bench.isSubFloorSuspect(0.869, Some(0.0), Seq(2, 2, 2)))
    assert(!Bench.isSubFloorSuspect(0.869, Some(0.185), Seq.empty))
    // slow keys keep flagging through the original per-run rule; the
    // sub-floor rule also covers them when only the median is inflated
    assert(Bench.isSubFloorSuspect(9.1, Some(3.0), Seq(7, 7, 7)))
  }

  test("jitter rule: sub-half-second keys re-sample on a 2x median " +
      "move regardless of job counts (r15 verdict #3)") {
    // the stream_session_window case: 0.300 s local median, run medians
    // 0.610 s (exactly 2.03x) — jitter on a 0.3 s key; must earn
    // resamples even though isSubFloorSuspect would also fire here
    assert(Bench.isJitterSuspect(0.610, Some(0.300)))
    // ...and crucially WITHOUT the flat-job-count requirement the
    // sub-floor rule imposes (a job wobble on a 0.3 s key is noise)
    assert(!Bench.isSubFloorSuspect(0.610, Some(0.300), Seq(2, 3, 2)))
    // keys at/above the 0.5 s reference line are NOT jitter class —
    // they stay governed by the sub-floor rule's plan-flatness logic
    assert(!Bench.isJitterSuspect(1.2, Some(0.5)))
    assert(!Bench.isJitterSuspect(4.0, Some(1.0)))
    // in-band sub-second medians stay quiet (strict > 2x)
    assert(!Bench.isJitterSuspect(0.60, Some(0.300)))
    assert(!Bench.isJitterSuspect(0.45, Some(0.300)))
    // no / degenerate reference: never flags
    assert(!Bench.isJitterSuspect(0.9, None))
    assert(!Bench.isJitterSuspect(0.9, Some(0.0)))
  }

  test("synthetic stall: a sleeping run trips the suspect flag") {
    // Exercise the rule through a real timed stall, the way Bench.main
    // times a run — a 1.2 s sleep against a 0.2 s committed median must
    // flag (threshold max(0.6, 1.0) = 1 s), and a fast run must not.
    val t0 = System.nanoTime()
    Thread.sleep(1200)
    val stalled = (System.nanoTime() - t0) / 1e9
    assert(Bench.isSuspect(stalled, Some(0.2)))
    val f0 = System.nanoTime()
    Thread.sleep(10)
    val fast = (System.nanoTime() - f0) / 1e9
    assert(!Bench.isSuspect(fast, Some(0.2)))
  }

  test("refMedians parses line 1 of a committed bench artifact") {
    val p = java.nio.file.Files.createTempFile("bench_ref", ".json")
    java.nio.file.Files.writeString(p,
      """{"metric":"total","value":9.000,"unit":"sec","runs":3,""" +
        """"n_queries":2,"queries":{"q1_agg":0.194,"dedup_exact":1.250},""" +
        """"sf":"/root/testdata/sf0.1","failed":[]}""" + "\n" +
        """{"metric":"detail","queries":{}}""" + "\n")
    val ref = Bench.refMedians(p.toString)
    assert(ref === Map("q1_agg" -> 0.194, "dedup_exact" -> 1.25))
    java.nio.file.Files.delete(p)
    // value field outside the queries map must not leak in
    assert(!ref.contains("value"))
  }

  test("refCanaryMedian reads the committed canary median from line 2; " +
      "disarms on missing file, missing line, or missing canary") {
    // r12 punch #3: the box factor divides this run's canary median by
    // the committed quiet-box one — both read the same artifact schema
    val p = java.nio.file.Files.createTempFile("bench_canary", ".json")
    java.nio.file.Files.writeString(p,
      """{"metric":"total","value":9.000,"queries":{"q1_agg":0.194}}""" +
        "\n" +
        """{"metric":"detail","runs":3,"sf":"x","ref":"y","canary":[""" +
        """{"pass":1,"edge":"start","sec":0.167,"gc_ms":0},""" +
        """{"pass":1,"edge":"end","sec":0.046,"gc_ms":0},""" +
        """{"pass":2,"edge":"start","sec":0.042,"gc_ms":0}],""" +
        """"queries":{}}""" + "\n")
    // sorted canary secs: 0.042, 0.046, 0.167 → median 0.046 (the
    // gc_ms integers must not be swept into the sec regex)
    assert(Bench.refCanaryMedian(p.toString).contains(0.046))
    java.nio.file.Files.delete(p)
    assert(Bench.refCanaryMedian("/nonexistent/bench.json").isEmpty)
    val one = java.nio.file.Files.createTempFile("bench_oneline", ".json")
    java.nio.file.Files.writeString(one, """{"metric":"total"}""" + "\n")
    assert(Bench.refCanaryMedian(one.toString).isEmpty)
    java.nio.file.Files.delete(one)
  }

  test("refMedians disarms (empty) on a missing or malformed file") {
    assert(Bench.refMedians("/nonexistent/path/bench.json").isEmpty)
    val p = java.nio.file.Files.createTempFile("bench_bad", ".json")
    java.nio.file.Files.writeString(p, "not a bench artifact\n")
    assert(Bench.refMedians(p.toString).isEmpty)
    java.nio.file.Files.delete(p)
  }

  test("refMedians disarm is LOUD when the file exists but drifts " +
      "(pretty-printed artifact), silent when the file is simply absent") {
    // round-10 verdict #3: an empty parse of an EXISTING reference file
    // silently disarmed suspect detection — indistinguishable from a
    // healthy quiet run. The warning names the path.
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val p = java.nio.file.Files.createTempFile("bench_pretty", ".json")
    java.nio.file.Files.writeString(p,
      "{\n  \"metric\": \"total\",\n  \"queries\": {\n" +
        "    \"q1_agg\": 0.194\n  }\n}\n") // pretty-printed: line 1 = "{"
    assert(Bench.refMedians(p.toString, warnings += _).isEmpty)
    assert(warnings.exists(w => w.contains("DISARMED") &&
      w.contains(p.toString)), s"no loud disarm: $warnings")
    java.nio.file.Files.delete(p)
    // absent file stays a silent (normal first-run) disarm
    warnings.clear()
    assert(Bench.refMedians("/nonexistent/path/bench.json",
      warnings += _).isEmpty)
    assert(warnings.isEmpty, s"absent file must not warn: $warnings")
  }

  test("noisy-box guard: box_warn flags factors outside [1/1.5, 1.5] " +
      "in both directions (r14 verdict #7)") {
    // the r14 gate case: 2.738x hot box must warn
    assert(Bench.boxWarn(Some(2.738)))
    assert(Bench.boxWarn(Some(1.51)))
    // the r14 outlier-baseline trap: a too-FAST canary also warns
    assert(Bench.boxWarn(Some(0.60)))
    // quiet band: no warning
    assert(!Bench.boxWarn(Some(1.0)))
    assert(!Bench.boxWarn(Some(1.49)))
    assert(!Bench.boxWarn(Some(0.70)))
    // no canary/reference: reporting disarms, never warns
    assert(!Bench.boxWarn(None))
  }

  test("canary self-agreement: q75/q25 spread over the sample " +
      "population; disagreement past the calibrated line withholds " +
      "normalization (r18 verdict #5, line calibrated in SOAK_r19)") {
    // tight population: spread ~1, agreement holds
    val tight = Seq.fill(18)(0.020) ++ Seq(0.021, 0.019)
    assert(Bench.canarySpread(tight) <= Bench.CanaryAgreeFactor)
    // the measured HEALTHY regime (SOAK_r19 siblings: systematic
    // 1.245-1.285 spread from load-adjacent mid-suite probes, while
    // normalization tightened the cross-sibling band) must pass
    val healthy = Seq(0.016, 0.017, 0.018, 0.018, 0.019, 0.020,
      0.021, 0.022, 0.023, 0.023, 0.024, 0.024)
    assert(Bench.canarySpread(healthy) <= Bench.CanaryAgreeFactor,
      s"systematic load spread must not trip: ${Bench.canarySpread(healthy)}")
    // the SOAK_r18 failure mode: samples banding ~1.5x of each other —
    // the instrument disagrees with itself
    val wild = Seq(0.015, 0.016, 0.016, 0.017, 0.024, 0.026,
      0.015, 0.026, 0.017, 0.025, 0.024, 0.027)
    assert(Bench.canarySpread(wild) > Bench.CanaryAgreeFactor,
      s"genuine disagreement must trip: ${Bench.canarySpread(wild)}")
    // the BOUNDARY, pinned on both sides (r19 review: the calibration
    // opened a 1.285-1.4 gray zone — deliberate tolerance between the
    // measured healthy band and the r18 pathology; these vectors keep
    // the line from drifting silently)
    val gray = Seq(0.016, 0.017, 0.017, 0.018, 0.019, 0.020,
      0.021, 0.022, 0.0248, 0.025, 0.025, 0.026) // q75/q25 ~ 1.38
    assert(Bench.canarySpread(gray) <= Bench.CanaryAgreeFactor,
      s"inside the calibrated tolerance: ${Bench.canarySpread(gray)}")
    val past = Seq(0.016, 0.017, 0.017, 0.018, 0.019, 0.020,
      0.021, 0.022, 0.0263, 0.027, 0.027, 0.028) // q75/q25 ~ 1.46
    assert(Bench.canarySpread(past) > Bench.CanaryAgreeFactor,
      s"past the line must trip: ${Bench.canarySpread(past)}")
    // one hot outlier in an otherwise tight population must NOT break
    // agreement (quartiles, not max/min — the whole point of the
    // larger interleaved population)
    val oneHot = Seq.fill(16)(0.020) ++ Seq(0.021, 0.019, 0.060)
    assert(Bench.canarySpread(oneHot) <= Bench.CanaryAgreeFactor)
    // too few samples to judge: neutral
    assert(Bench.canarySpread(Seq(0.02, 0.09)) == 1.0)
    assert(Bench.canarySpread(Nil) == 1.0)
  }
}
