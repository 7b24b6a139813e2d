package graft.engine

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/**
 * `show_progress` (reference nodes/node.py:59-60 wraps each node compute in
 * a dask ProgressBar): the Spark-native equivalent is stage-level progress
 * from the scheduler bus. The engine registers this listener for the span
 * of a run when the project (or any node) sets `show_progress: true`, and
 * destination writes carry a job description naming the node, so progress
 * lines are attributable.
 *
 * The output stream is captured at construction: listener callbacks fire on
 * the listener-bus thread, where the caller's Console.err binding (a
 * thread-local) would not be visible.
 */
final class Progress(out: java.io.PrintStream) extends SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val desc = Option(si.details).map(_.takeWhile(_ != '\n')).getOrElse("")
    out.println(
      s"[progress] stage ${si.stageId} (${si.name.takeWhile(_ != '(').trim}): " +
        s"${si.numTasks} tasks, ${si.taskMetrics.executorRunTime} ms" +
        (if (desc.nonEmpty) s" — $desc" else ""))
  }
}
