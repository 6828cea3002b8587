package graft.streaming

/** Consumer smoke test — parity with the reference's operational
  * consumer check (`kafka_consumer_test.py:12-57`): report the topic's
  * partitions, read a bounded batch of messages (≤10 within a 10 s
  * timeout), and when the read comes back empty, list the available
  * topics as the diagnostic instead.
  *
  * Like [[TopicAdmin]], the wire client is abstracted behind
  * [[ConsumerSmoke.ConsumerOps]]: this sandbox ships no kafka-clients
  * jar, so the KafkaConsumer binding cannot compile here. All decisions
  * the reference script makes — bounded consumption, the
  * empty-vs-success branch, what lands in the report — are pure code
  * below, spec-asserted against an in-memory fake. A production binding
  * is a ~15-line ConsumerOps impl over KafkaConsumer (subscribe + poll
  * loop with `consumer_timeout_ms` semantics).
  */
object ConsumerSmoke {

  final case class Message(partition: Int, offset: Long, value: String)

  /** What the script prints, as data: the partition set, the (bounded)
    * messages read, and — only when nothing was read — the topic
    * listing fallback (`kafka_consumer_test.py:47-53`). */
  final case class Report(
      topic: String,
      partitions: Set[Int],
      messages: Seq[Message],
      availableTopics: Option[Seq[String]]) {
    def succeeded: Boolean = messages.nonEmpty
  }

  /** Minimal consumer surface the script uses. */
  trait ConsumerOps {
    def partitionsFor(topic: String): Set[Int]

    /** Up to `max` messages within `timeoutMs` (the reference's
      * consumer_timeout_ms + break-at-10 loop). */
    def poll(topic: String, max: Int, timeoutMs: Long): Seq[Message]

    def listTopics(): Seq[String]
  }

  /** The reference smoke sequence with its exact bounds: topic
    * `ecommerce-orders`, ≤10 messages, 10 s timeout. */
  def run(ops: ConsumerOps, topic: String = "ecommerce-orders",
          maxMessages: Int = 10, timeoutMs: Long = 10000L): Report = {
    require(maxMessages > 0, "maxMessages must be positive")
    val parts = ops.partitionsFor(topic)
    val msgs = ops.poll(topic, maxMessages, timeoutMs).take(maxMessages)
    val topics = if (msgs.isEmpty) Some(ops.listTopics().sorted) else None
    Report(topic, parts, msgs, topics)
  }
}
