package graft.workflow

import scala.collection.mutable

/** Synchronous, deterministic event bus — the engine's analog of the
  * reference's notification server driving control edges
  * (workflow.py:114-120, SURVEY.md §2.2 O3/O4). Events published while a
  * handler runs are queued and drained in order, so cascades
  * (MODEL_GENERATED → validate → MODEL_VALIDATED → predict) execute
  * sequentially and tests are deterministic (SURVEY.md §7.4 item 3).
  */
final class EventBus {
  private val handlers =
    mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String => Unit]]
  private val queue = mutable.Queue.empty[(String, String)]
  private var draining = false
  private val seen = mutable.ArrayBuffer.empty[(String, String)]

  def subscribe(event: String)(h: String => Unit): Unit =
    handlers.getOrElseUpdate(event, mutable.ArrayBuffer.empty) += h

  def publish(event: String, payload: String): Unit = {
    queue.enqueue(event -> payload)
    if (!draining) {
      draining = true
      try {
        while (queue.nonEmpty) {
          val (e, p) = queue.dequeue()
          seen += (e -> p)
          handlers.getOrElse(e, Nil).foreach(_(p))
        }
      } finally draining = false
    }
  }

  /** Ordered log of every published event (for tests/inspection). */
  def log: Seq[(String, String)] = seen.toSeq
}

object Events {
  val ModelGenerated = "MODEL_GENERATED"
  val ModelValidated = "MODEL_VALIDATED"
  val ModelDeployed = "MODEL_DEPLOYED"
  val ModelDeprecated = "MODEL_DEPRECATED"
  val JobFinished = "JOB_FINISHED"
}
