package graft.streaming

/** Operational topic administration — parity with the reference's admin
  * scripts (`setup_kafka_topics.py`, `delete_kafka_topics.py`): force
  * delete + recreate the pipeline's topics with their retention configs,
  * and guarded topic deletion.
  *
  * The wire client is abstracted behind [[TopicAdmin.AdminOps]]: this
  * sandbox ships NO kafka-clients jar (checked `/opt/spark/jars` and the
  * offline coursier cache), so the `org.apache.kafka.clients.admin
  * .AdminClient` binding cannot compile here — exactly the S1/K2
  * situation. Everything the reference scripts decide — topic specs
  * (partitions / replication factor / retention), existence filtering,
  * delete-then-create sequencing, confirm-vs-force semantics — lives in
  * pure code below and is spec-asserted against an in-memory fake. A
  * production binding is a ~10-line AdminOps impl over AdminClient
  * (`createTopics(new NewTopic(name, partitions, rf).configs(configs))`).
  */
object TopicAdmin {

  /** One topic's creation request — the fields of kafka-admin's NewTopic
    * the reference sets (`setup_kafka_topics.py:79-84`). */
  final case class TopicSpec(
      name: String,
      partitions: Int,
      replicationFactor: Short,
      configs: Map[String, String])

  /** The reference's topic configurations, verbatim
    * (`setup_kafka_topics.py:113-130`): 3 partitions × RF 2, 7-day
    * retention for orders, 3-day for alerts, delete cleanup. */
  val OrdersTopic: TopicSpec = TopicSpec(
    "ecommerce-orders", partitions = 3, replicationFactor = 2,
    Map("retention.ms" -> "604800000", "cleanup.policy" -> "delete"))

  val AlertsTopic: TopicSpec = TopicSpec(
    "ecommerce-alerts", partitions = 3, replicationFactor = 2,
    Map("retention.ms" -> "259200000", "cleanup.policy" -> "delete"))

  val DefaultTopics: Seq[TopicSpec] = Seq(OrdersTopic, AlertsTopic)

  /** Spec defaults when a topic has no explicit configuration
    * (`setup_kafka_topics.py:81-82`: partitions 3, RF 2). */
  def specFor(name: String): TopicSpec =
    DefaultTopics.find(_.name == name)
      .getOrElse(TopicSpec(name, partitions = 3, replicationFactor = 2, Map.empty))

  /** Minimal admin surface the scripts use: list / create / delete.
    * Implementations must make create and delete idempotent-or-throw per
    * topic (kafka futures do); the orchestration below never calls
    * delete or create for a topic that the pre-flight list says would
    * fail the existence check. */
  trait AdminOps {
    def listTopics(): Set[String]
    def createTopics(specs: Seq[TopicSpec]): Map[String, Either[Throwable, Unit]]
    def deleteTopics(names: Seq[String]): Map[String, Either[Throwable, Unit]]
  }

  /** Outcome of a setup/delete run, for callers and specs. */
  final case class AdminReport(
      deleted: Seq[String],
      created: Seq[String],
      failed: Map[String, String],
      finalTopics: Set[String])

  /** Force delete + recreate (`setup_kafka_topics.py`'s main flow):
    * delete the requested topics that exist, then create the requested
    * topics that have a known spec — the script's `filtered_config`
    * drops unknown names rather than inventing configs
    * (`setup_kafka_topics.py:133-135`). */
  def forceRecreate(ops: AdminOps, topics: Seq[String]): AdminReport = {
    val existing = ops.listTopics()
    val toDelete = topics.filter(existing.contains)
    val delRes = if (toDelete.nonEmpty) ops.deleteTopics(toDelete) else Map.empty[String, Either[Throwable, Unit]]
    val specs = topics.filter(t => DefaultTopics.exists(_.name == t)).map(specFor)
    val createRes = if (specs.nonEmpty) ops.createTopics(specs) else Map.empty[String, Either[Throwable, Unit]]
    val failed =
      delRes.collect { case (t, Left(e)) => s"delete:$t" -> e.getMessage } ++
        createRes.collect { case (t, Left(e)) => s"create:$t" -> e.getMessage }
    AdminReport(
      deleted = delRes.collect { case (t, Right(())) => t }.toSeq.sorted,
      created = createRes.collect { case (t, Right(())) => t }.toSeq.sorted,
      failed = failed.toMap,
      finalTopics = ops.listTopics())
  }

  /** Guarded deletion (`delete_kafka_topics.py`): only topics that exist
    * are deleted; without `force`, `confirm` is consulted once with the
    * to-delete list and a decline deletes nothing (the script's
    * yes/no prompt, `delete_kafka_topics.py:39-42`). */
  def deleteGuarded(ops: AdminOps, topics: Seq[String], force: Boolean)
                   (confirm: Seq[String] => Boolean): AdminReport = {
    val existing = ops.listTopics()
    val toDelete = topics.filter(existing.contains)
    val proceed = toDelete.nonEmpty && (force || confirm(toDelete))
    val delRes = if (proceed) ops.deleteTopics(toDelete) else Map.empty[String, Either[Throwable, Unit]]
    AdminReport(
      deleted = delRes.collect { case (t, Right(())) => t }.toSeq.sorted,
      created = Seq.empty,
      failed = delRes.collect { case (t, Left(e)) => s"delete:$t" -> e.getMessage }.toMap,
      finalTopics = ops.listTopics())
  }
}
