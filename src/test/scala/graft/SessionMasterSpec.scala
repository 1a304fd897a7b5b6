package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forked-JVM check target: prints the master and shuffle-partition
  * setting `Evolution.session()` actually resolved. Runs in a FRESH JVM
  * (the suite's shared session would win `getOrCreate()` and mask the
  * decision under test).
  */
object SessionMasterCheck {
  def main(args: Array[String]): Unit = {
    val spark = Evolution.session("session-master-check")
    // print AFTER the session exists so a builder override would show
    println(s"CHECK master=${spark.sparkContext.master} " +
      s"shuffle=${spark.conf.get("spark.sql.shuffle.partitions")}")
    spark.stop()
  }
}

/** VERDICT r12 §1 (cluster deployability): `Evolution.session()` must not
  * force `local[N]` / `spark.sql.shuffle.partitions=32` when a master is
  * already configured — `spark-submit --master yarn|k8s://…` communicates
  * the cluster master via the `spark.master` system property, and the old
  * unconditional `.master(local[$cpus])` overrode it back into local
  * mode, gating every CLI entry point at real scale. Each case forks a
  * fresh JVM because the decision happens at session construction.
  */
class SessionMasterSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Fork SessionMasterCheck with the given -D props / env, return the
    * CHECK line.
    */
  private def forkCheck(props: Seq[String],
                        env: Map[String, String]): String = {
    val java = s"${sys.props("java.home")}/bin/java"
    val cmd = (Seq(java) ++ addOpens ++ props ++ Seq(
      "-Dspark.ui.enabled=false", // keep the forked JVM port-free; unrelated to the master decision
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.SessionMasterCheck")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val pe = pb.environment()
    env.foreach { case (k, v) => pe.put(k, v) }
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val rc = p.waitFor()
    assert(rc == 0, s"forked session check failed (rc=$rc):\n$out")
    out.linesIterator.find(_.startsWith("CHECK "))
      .getOrElse(fail(s"no CHECK line in forked output:\n$out"))
  }

  test("preset spark.master survives session(): no local[N] override, " +
    "no shuffle-partition pin") {
    val line = forkCheck(Seq("-Dspark.master=local[2]"), Map.empty)
    assert(line.contains("master=local[2]"), line)
    // the cluster's own parallelism defaults apply — NOT the local pin
    // (Spark default 200; the point is it is not SPARK_GRAFT_CPUS)
    assert(line.contains("shuffle=200"), line)
  }

  test("no configured master: local[$SPARK_GRAFT_CPUS] fallback with " +
    "shuffle parallelism pinned to the core count (harness behavior unchanged)") {
    val line = forkCheck(Seq.empty, Map("SPARK_GRAFT_CPUS" -> "3"))
    assert(line.contains("master=local[3]"), line)
    assert(line.contains("shuffle=3"), line)
  }
}
