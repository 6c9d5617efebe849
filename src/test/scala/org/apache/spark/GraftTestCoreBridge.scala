package org.apache.spark

/** Test-only bridge: `SparkContext.checkpointDir` is `private[spark]`
  * with a setter but no public unset, and the test JVM shares ONE
  * session across all suites — a suite that exercises the reliable-
  * checkpoint path must restore the no-dir default afterwards or every
  * later suite's iterative loops silently switch to disk checkpoints.
  */
object GraftTestCoreBridge {
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None
}
