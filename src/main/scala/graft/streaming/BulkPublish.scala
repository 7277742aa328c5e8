package graft.streaming

/** Bulk publish result types (reference: RapidsConnection.kt:13-29) —
  * per-index outcomes; any failure is fatal for the batch
  * (KafkaRapid.kt:64-99: a failed send stops the rapid; in Spark the
  * streaming query fails and restarts from the checkpoint).
  */
final case class OutgoingMessage(body: String, key: Option[String] = None)
final case class SentMessage(index: Int, message: OutgoingMessage)
final case class FailedMessage(index: Int, message: OutgoingMessage, error: Throwable)

object BulkPublish {

  /** Publish a batch through `send`, collecting per-index outcomes. */
  def apply(messages: Seq[OutgoingMessage])(
      send: OutgoingMessage => Unit): (Seq[SentMessage], Seq[FailedMessage]) = {
    val results = messages.zipWithIndex.map { case (m, i) =>
      try { send(m); Left(SentMessage(i, m)) }
      catch { case e: Exception => Right(FailedMessage(i, m, e)) }
    }
    (results.collect { case Left(s) => s }, results.collect { case Right(f) => f })
  }
}
