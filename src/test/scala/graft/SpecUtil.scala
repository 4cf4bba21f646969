package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{
  AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Shared spec helpers — ONE definition each of the reference hash and
  * the AQE-aware plan traversal (drifted copies across specs were a
  * review finding: a fix to the traversal on a Spark upgrade must not
  * need applying in several places).
  */
object SpecUtil {

  /** The sample_hash md5-prefix rank (8-hex form), reimplemented
    * independently of the library (java MessageDigest, not Spark
    * functions) for reference models.
    */
  def md5Rank(docId: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Collect over an EXECUTED plan, traversing INTO AQE query stages
    * (plain TreeNode traversal stops at stage leaves) but NOT into
    * ReusedExchange (whose child is the shared original — a reused
    * subtree must not be visited twice).
    */
  def collectPlan[A](p: SparkPlan)(
      pf: PartialFunction[SparkPlan, A]): Seq[A] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: ReusedExchangeExec => Seq()
      case o => o.children
    }
    pf.lift(p).toSeq ++ kids.flatMap(collectPlan(_)(pf))
  }
}
