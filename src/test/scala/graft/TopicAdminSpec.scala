package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.TopicAdmin
import graft.streaming.TopicAdmin.{AdminOps, TopicSpec}

/** Request-building-level parity with the reference admin scripts
  * (`setup_kafka_topics.py`, `delete_kafka_topics.py`), asserted against
  * an in-memory broker-state fake: no kafka-clients jar exists in this
  * sandbox (see TopicAdmin scaladoc), so the wire binding is a trait and
  * the scripts' decision logic is what gets verified.
  */
class TopicAdminSpec extends AnyFunSuite {

  /** In-memory broker state recording every request made. */
  private class FakeOps(initial: Set[String],
                        failDelete: Set[String] = Set.empty,
                        failCreate: Set[String] = Set.empty) extends AdminOps {
    var topics: Set[String] = initial
    var createRequests: Vector[TopicSpec] = Vector.empty
    var deleteRequests: Vector[String] = Vector.empty
    def listTopics(): Set[String] = topics
    def createTopics(specs: Seq[TopicSpec]): Map[String, Either[Throwable, Unit]] = {
      createRequests ++= specs
      specs.map { s =>
        if (failCreate(s.name)) s.name -> Left(new RuntimeException("TopicExistsException"))
        else { topics += s.name; s.name -> Right(()) }
      }.toMap
    }
    def deleteTopics(names: Seq[String]): Map[String, Either[Throwable, Unit]] = {
      deleteRequests ++= names
      names.map { n =>
        if (failDelete(n)) n -> Left(new RuntimeException("delete timed out"))
        else { topics -= n; n -> Right(()) }
      }.toMap
    }
  }

  test("topic specs carry the reference's exact configs") {
    // setup_kafka_topics.py:113-130: 3 partitions, RF 2; orders 7-day
    // retention, alerts 3-day, both delete cleanup
    assert(TopicAdmin.OrdersTopic === TopicSpec("ecommerce-orders", 3, 2,
      Map("retention.ms" -> "604800000", "cleanup.policy" -> "delete")))
    assert(TopicAdmin.AlertsTopic === TopicSpec("ecommerce-alerts", 3, 2,
      Map("retention.ms" -> "259200000", "cleanup.policy" -> "delete")))
    // unknown topic falls to the NewTopic defaults (partitions=3, RF=2)
    assert(TopicAdmin.specFor("other") === TopicSpec("other", 3, 2, Map.empty))
  }

  test("forceRecreate deletes only existing topics, then creates known specs") {
    val ops = new FakeOps(initial = Set("ecommerce-orders", "unrelated"))
    val report = TopicAdmin.forceRecreate(ops,
      Seq("ecommerce-orders", "ecommerce-alerts"))
    // alerts didn't exist → no delete request for it (script filters by
    // list_topics first, setup_kafka_topics.py:56-57)
    assert(ops.deleteRequests === Vector("ecommerce-orders"))
    // both are known specs → both created, with full configs
    assert(ops.createRequests.map(_.name).sorted === Vector("ecommerce-alerts", "ecommerce-orders"))
    assert(ops.createRequests.forall(s => s.partitions == 3 && s.replicationFactor == 2))
    assert(report.deleted === Seq("ecommerce-orders"))
    assert(report.created === Seq("ecommerce-alerts", "ecommerce-orders"))
    assert(report.failed.isEmpty)
    assert(report.finalTopics === Set("ecommerce-orders", "ecommerce-alerts", "unrelated"))
  }

  test("forceRecreate drops unknown topic names instead of inventing configs") {
    // setup_kafka_topics.py:133-135: filtered_config keeps only names in
    // topics_config — an unknown name is deleted (if present) but never
    // recreated
    val ops = new FakeOps(initial = Set("stale-topic"))
    val report = TopicAdmin.forceRecreate(ops, Seq("stale-topic", "ecommerce-orders"))
    assert(ops.deleteRequests === Vector("stale-topic"))
    assert(ops.createRequests.map(_.name) === Vector("ecommerce-orders"))
    assert(report.finalTopics === Set("ecommerce-orders"))
  }

  test("forceRecreate surfaces per-topic failures without aborting the rest") {
    val ops = new FakeOps(initial = Set("ecommerce-orders", "ecommerce-alerts"),
      failDelete = Set("ecommerce-orders"))
    val report = TopicAdmin.forceRecreate(ops,
      Seq("ecommerce-orders", "ecommerce-alerts"))
    assert(report.deleted === Seq("ecommerce-alerts"))
    assert(report.failed.keySet === Set("delete:ecommerce-orders"))
    // creation still attempted for both (script continues past errors)
    assert(ops.createRequests.map(_.name).sorted === Vector("ecommerce-alerts", "ecommerce-orders"))
  }

  test("deleteGuarded without force consults confirm once; decline deletes nothing") {
    val ops = new FakeOps(initial = Set("ecommerce-orders", "ecommerce-alerts"))
    var asked: Option[Seq[String]] = None
    val report = TopicAdmin.deleteGuarded(ops,
      Seq("ecommerce-orders", "missing-topic"), force = false) { names =>
      asked = Some(names); false
    }
    // prompt sees only the EXISTING subset (delete_kafka_topics.py:29-36)
    assert(asked === Some(Seq("ecommerce-orders")))
    assert(ops.deleteRequests.isEmpty)
    assert(report.deleted.isEmpty)
    assert(report.finalTopics === Set("ecommerce-orders", "ecommerce-alerts"))
  }

  test("deleteGuarded with force skips confirmation and deletes existing subset") {
    val ops = new FakeOps(initial = Set("ecommerce-orders", "ecommerce-alerts"))
    val report = TopicAdmin.deleteGuarded(ops,
      Seq("ecommerce-alerts", "missing-topic"), force = true) { _ =>
      fail("force must not prompt"); false
    }
    assert(ops.deleteRequests === Vector("ecommerce-alerts"))
    assert(report.deleted === Seq("ecommerce-alerts"))
    assert(report.finalTopics === Set("ecommerce-orders"))
  }

  test("deleteGuarded with nothing to delete never prompts") {
    val ops = new FakeOps(initial = Set("other"))
    TopicAdmin.deleteGuarded(ops, Seq("ecommerce-orders"), force = false) { _ =>
      fail("no existing topics must not prompt"); false
    }
    assert(ops.deleteRequests.isEmpty)
  }

  // ------------------------------------------------------ ConsumerSmoke

  import graft.streaming.ConsumerSmoke
  import graft.streaming.ConsumerSmoke.Message

  private class FakeConsumer(msgs: Seq[Message],
                             topics: Seq[String]) extends ConsumerSmoke.ConsumerOps {
    var listedTopics = 0
    override def partitionsFor(topic: String): Set[Int] = Set(0, 1, 2)
    override def poll(topic: String, max: Int, timeoutMs: Long): Seq[Message] =
      msgs.take(max)
    override def listTopics(): Seq[String] = { listedTopics += 1; topics }
  }

  test("consumer smoke reads at most 10 messages and skips the topic listing") {
    val msgs = (1 to 25).map(i => Message(i % 3, i.toLong, s"order-$i"))
    val ops = new FakeConsumer(msgs, Seq("ecommerce-orders"))
    val report = ConsumerSmoke.run(ops)
    assert(report.succeeded)
    assert(report.messages.size === 10) // the script's break-at-10
    assert(report.messages === msgs.take(10))
    assert(report.partitions === Set(0, 1, 2))
    assert(report.availableTopics.isEmpty, "listing only runs on empty reads")
    assert(ops.listedTopics === 0)
  }

  test("consumer smoke on an empty topic falls back to listing topics") {
    val ops = new FakeConsumer(Seq.empty,
      Seq("ecommerce-orders", "ecommerce-alerts", "__consumer_offsets"))
    val report = ConsumerSmoke.run(ops)
    assert(!report.succeeded)
    assert(report.messages.isEmpty)
    // sorted listing (kafka_consumer_test.py:49-51 prints the topic set)
    assert(report.availableTopics ===
      Some(Seq("__consumer_offsets", "ecommerce-alerts", "ecommerce-orders")))
    assert(ops.listedTopics === 1)
  }
}
