package graft.core

/** EMR fleet instance selection — the reference's price-aware
  * optimizer (ascii-hydra `pipes/instance_config.py:127-166,358-370`,
  * enums `resources/emr_constants.py:4-99`) as pure functions over an
  * in-memory catalog. Live AWS pricing calls are out of scope (zero
  * egress); the selection *algorithm* — the tested surface — is here.
  */
object InstanceSelection {

  final case class InstanceType(
      name: String,          // e.g. "m6id.2xlarge"
      memoryGB: Double,
      vcpu: Int,
      storageGB: Double,
      instanceFamilyId: String,
      price: Option[Double] = None) {
    /** `add_prefix_suffix_to_instances`: split on the dot. */
    def prefix: String = name.split("\\.", 2)(0)
    def suffix: String = name.split("\\.", 2).lift(1).getOrElse("")
  }

  /** Ordered size suffixes (`emr_constants.py:Suffix` — order is the
    * enum's declaration order, faithfully including 6xl < 8xl < 9xl
    * before 3xl/4xl: the filter is "at most this index"). */
  val suffixOrder: Seq[String] = Seq(
    "small", "medium", "large", "xlarge", "2xlarge", "6xlarge", "8xlarge",
    "9xlarge", "3xlarge", "4xlarge", "10xlarge", "12xlarge", "16xlarge",
    "18xlarge", "24xlarge", "32xlarge", "48xlarge")

  /** `Suffix.index_of`: −1 for unknown suffixes. */
  def suffixIndex(s: String): Int = suffixOrder.indexOf(s)

  /** Numeric criteria are ≥ filters; family/prefix are exact; suffix
    * keeps sizes at-or-below the given one (`filter_instances`). */
  final case class Criteria(
      memoryGB: Option[Double] = None,
      vcpu: Option[Int] = None,
      storageGB: Option[Double] = None,
      instanceFamilyId: Option[String] = None,
      prefix: Option[String] = None,
      maxSuffix: Option[String] = None)

  def filterInstances(instances: Seq[InstanceType], c: Criteria): Seq[InstanceType] = {
    val bySuffix: Seq[InstanceType] = c.maxSuffix match {
      case Some(s) =>
        val target = suffixIndex(s)
        // invalid suffix → no suffix filtering (reference returns None
        // from filter_by_enum and keeps the previous list — faithfully
        // treat as no-op)
        if (target == -1) instances
        else instances.filter(i => suffixIndex(i.suffix) <= target)
      case None => instances
    }
    bySuffix
      .filter(i => c.memoryGB.forall(i.memoryGB >= _))
      .filter(i => c.vcpu.forall(i.vcpu >= _))
      .filter(i => c.storageGB.forall(i.storageGB >= _))
      .filter(i => c.instanceFamilyId.forall(i.instanceFamilyId == _))
      .filter(i => c.prefix.forall(i.prefix == _))
  }

  /** `get_instance_w_price`: cheapest first, ties broken by MORE
    * memory then MORE vcpu (you pay the same, take the bigger box);
    * top n. Unpriced instances are unrankable → dropped. */
  def cheapest(instances: Seq[InstanceType], n: Int = 15): Seq[InstanceType] =
    instances.filter(_.price.isDefined)
      .sortBy(i => (i.price.get, -i.memoryGB, -i.vcpu))
      .take(n)

  /** Spot bid as percent of on-demand (`BaseConfig` rule + EMR fleet
    * `spot_bid_price_percent`). */
  def spotBid(onDemand: Double, percent: Double): Double = {
    require(percent > 1.0 && percent <= 100.0, s"bid percent $percent out of (1,100]")
    onDemand * percent / 100.0
  }
}
