package graft.streaming

import scala.collection.mutable
import graft.ports.{QueueMessage, QueueSource}

/** SQS test double with real visibility semantics: received messages go
  * in-flight (invisible to further receives) until deleted; `redeliver()`
  * simulates visibility-timeout expiry, making un-acked messages visible
  * again. */
final class InMemoryQueue extends QueueSource {

  private case class Entry(id: Int, body: String, var inFlight: Boolean)
  private val entries = mutable.LinkedHashMap.empty[Int, Entry]
  private var nextId = 0
  private val receipts = mutable.Map.empty[String, Int]

  def send(body: String): Unit = synchronized {
    entries(nextId) = Entry(nextId, body, inFlight = false)
    nextId += 1
  }

  override def receive(maxMessages: Int, waitSeconds: Int): Seq[QueueMessage] = synchronized {
    val visible = entries.values.filter(!_.inFlight).take(maxMessages).toSeq
    visible.map { e =>
      e.inFlight = true
      val receipt = s"rh-${e.id}-${receipts.size}"
      receipts(receipt) = e.id
      QueueMessage(e.body, receipt)
    }
  }

  override def delete(receiptHandle: String): Unit = synchronized {
    receipts.remove(receiptHandle).foreach(entries.remove)
  }

  /** Visibility timeout expiry: all in-flight messages become receivable. */
  def redeliver(): Unit = synchronized { entries.values.foreach(_.inFlight = false) }

  def size: Int = synchronized { entries.size }
}
