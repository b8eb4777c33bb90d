package graft

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the state update (SURVEY §5.2#3):
  * over random snapshots and states,
  *  1. output keys = snapshot keys ∪ surviving state keys, exactly once
  *  2. evicted keys are exactly those at-or-older than the horizon
  *  3. flight_last_contact is monotone non-decreasing per key
  *  4. is_first_contact is never null after the transition
  *  5. zero-fill: absent-side numeric columns carry the 0 sentinel
  */
class StateUpdatePropertiesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val T = 1712338230
  private val horizon = T - 1200L

  private case class St(key: String, lc: Int, vel: Double, vr: Double)
  private case class Src(key: String, lc: Int, takeoff: Int, flc: Int,
      traj: Option[String], ifc: Option[Boolean])

  private val keyGen = Gen.chooseNum(0, 30).map(i => f"k$i%02d")
  private val stGen = for {
    k <- keyGen
    vel <- Gen.chooseNum(0.0, 300.0)
    vr <- Gen.chooseNum(-10.0, 10.0)
  } yield St(k, T, vel, vr)
  private val srcGen = for {
    k <- keyGen
    age <- Gen.chooseNum(0, 2400) // straddles the 20-min horizon
    takeoff <- Gen.oneOf(0, T - 3600)
    traj <- Gen.option(Gen.oneOf("climb", "descend", "other"))
    ifc <- Gen.option(Gen.oneOf(true, false))
  } yield Src(k, T - age, 0, T - age, traj, ifc)

  private def distinctBy[A, K](xs: List[A])(f: A => K): List[A] =
    xs.groupBy(f).values.map(_.head).toList

  test("state update invariants hold for random inputs") {
    val prop = Prop.forAll(
      Gen.listOfN(20, stGen), Gen.listOfN(20, srcGen)) { (stsRaw, srcRaw) =>
      val sts = distinctBy(stsRaw)(_.key)
      val srcs = distinctBy(srcRaw)(_.key)
      val states = spark.createDataFrame(
        spark.sparkContext.parallelize(sts.map(s => Row(s.key, s.lc.toLong,
          java.lang.Double.valueOf(s.vel), java.lang.Double.valueOf(s.vr)))),
        Schemas.states)
      val source = spark.createDataFrame(
        spark.sparkContext.parallelize(srcs.map(s => Row(s.key,
          Integer.valueOf(s.lc), java.lang.Double.valueOf(1.0),
          java.lang.Double.valueOf(1.0), Integer.valueOf(s.takeoff),
          Integer.valueOf(s.flc), s.traj.orNull,
          s.ifc.map(java.lang.Boolean.valueOf).orNull))),
        Schemas.source)

      val out = ActiveFlightsJob.stateUpdate(states, source, horizon)
        .collect().toList
      val outKeys = out.map(_.getString(0))
      val surviving = srcs.filter(_.flc > horizon).map(_.key).toSet
      val expectedKeys = sts.map(_.key).toSet ++ surviving

      val keysOnce = outKeys.sorted == expectedKeys.toList.sorted
      val evictionExact = srcs.filter(_.flc <= horizon)
        .forall(s => sts.exists(_.key == s.key) || !outKeys.contains(s.key))
      val monotone = out.forall { r =>
        val flc = r.getInt(5)
        srcs.find(_.key == r.getString(0)).forall(_.flc <= flc)
      }
      val ifcNeverNull = out.forall(!_.isNullAt(7))
      val zeroFill = out.filter(r => !sts.exists(_.key == r.getString(0)))
        .forall(r => r.getInt(1) == 0 && r.getDouble(2) == 0.0 &&
          r.getDouble(3) == 0.0)

      keysOnce && evictionExact && monotone && ifcNeverNull && zeroFill
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }
}
