package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract is merged from per-tier registry objects with `++`,
  * which SILENTLY overrides duplicate keys — a query name registered in two
  * tiers would shadow one implementation without any error. This spec turns
  * that into a failure, and pins that every tier stays within the size
  * budget that motivated the round-9 split.
  */
class RegistrySpec extends AnyFunSuite {

  private val tiers: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("Aggregates", registry.RegistryAggregates.queries, registry.RegistryAggregates.oracleSql),
    ("Core", registry.RegistryCore.queries, registry.RegistryCore.oracleSql),
    ("Dedup", registry.RegistryDedup.queries, registry.RegistryDedup.oracleSql),
    ("Events", registry.RegistryEvents.queries, registry.RegistryEvents.oracleSql),
    ("Joins", registry.RegistryJoins.queries, registry.RegistryJoins.oracleSql),
    ("Quality", registry.RegistryQuality.queries, registry.RegistryQuality.oracleSql),
    ("SimGraph", registry.RegistrySimGraph.queries, registry.RegistrySimGraph.oracleSql),
    ("Text", registry.RegistryText.queries, registry.RegistryText.oracleSql))

  test("query names are globally unique across tiers (++ merge can't shadow)") {
    val all = tiers.flatMap { case (t, q, _) => q.keys.map(_ -> t) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"duplicate query names across tiers: ${dups.map { case (k, v) => s"$k in ${v.map(_._2)}" }}")
    assert(all.size === SparkEntry.queries.size,
      "merged map lost entries — a tier key collision swallowed them")
  }

  test("each tier's oracle keys match its own query keys (no cross-tier drift)") {
    tiers.foreach { case (t, q, o) =>
      assert(q.keySet === o.keySet,
        s"tier $t: queries and oracleSql keys diverge: " +
          s"${(q.keySet diff o.keySet) ++ (o.keySet diff q.keySet)}")
    }
  }

  test("no registry tier regrows past the split's size budget") {
    tiers.foreach { case (t, q, _) =>
      assert(q.size <= 100,
        s"tier $t has ${q.size} queries — split it before it becomes the next monolith")
    }
  }

  test("scale referees attach only to registered queries; slices only to referees") {
    val refs = SparkEntry.scaleOracleSql.keySet
    assert(refs.subsetOf(SparkEntry.queries.keySet),
      s"scale referee for unregistered query: ${refs diff SparkEntry.queries.keySet}")
    assert(refs.subsetOf(SparkEntry.oracleSql.keySet),
      "a scale referee may only REPLACE a primary oracle at wide scale, never substitute for one")
    assert(SparkEntry.scaleSparkSql.keySet.subsetOf(refs),
      s"spark-side slice without a referee: ${SparkEntry.scaleSparkSql.keySet diff refs}")
    // The set is the nine quadratic-oracle queries from SURVEY §R9/§R10
    // plus s17 (r11: its primary oracle is disk-bound at sf10 — the
    // referee is a two-leg soundness+sliced-completeness reformulation,
    // see RegistrySimGraph.scaleOracleSql). Growing this set is a
    // deliberate act, not a drive-by.
    assert(refs === Set("d3b_minhash_highsim", "d7_dup_clusters",
      "d10_incremental_dedup", "d16_cluster_reps", "d18_jaccard_join",
      "d19_containment", "d20_edit_distance", "d32_bag_jaccard",
      "g10_association_rules", "s17_ann_oracle"),
      s"scale-referee set changed: $refs — update SURVEY and this pin together")
  }
}
