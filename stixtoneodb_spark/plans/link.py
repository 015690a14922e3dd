"""S4 — triple linking: resolve subj/obj text against the canonical map.

Reference correspondence: ref resolution is the reference's core relational
content — SRO ``source_ref``/``target_ref`` looked up by id against the
node index (A10), with dangling refs *skipped, logged, and the load
continues* (A11; /root/reference/README.md:83-85; golden dangling cases
testfull.json:3759-3781).  Here the id index becomes two hash joins against
the canonical map, and the dangling skip becomes a left_anti side output
that is counted, never fatal.

Scale notes: the canonical map (distinct entity names) is orders of
magnitude smaller than the triple stream → broadcast it explicitly.  If the
map outgrows broadcast (10^9 entities), drop the hint and let AQE pick SMJ
with skew-split; hot canonical ids on the triple side are handled by
AQE skew join plus optional salting (functions.ids.salt_col).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stixtoneodb_spark.functions.textfns import canonical_name


@dataclass
class LinkResult:
    linked: DataFrame   # (conv_id, turn_idx, subj_id, pred, obj_id, subj_label, obj_label, confidence)
    dropped: DataFrame  # triples with >=1 unresolvable endpoint + reason


def hot_cold_join(
    stream: DataFrame,
    mapdf: DataFrame,
    key: str,
    hot_keys: DataFrame,
    how: str = "left",
) -> DataFrame:
    """Skew-safe stream ⋈ dictionary join on a hot-key-prone column.

    The north rule demands explicit handling of hot entities: a plain
    shuffle join on entity name puts every mention of a popular entity
    into one task (AQE's skew split does not fire below its byte
    thresholds, so mid-sized skew silently serializes).  Standard split:

    - ``hot_keys`` (names above a corpus-relative frequency floor) is
      BOUNDED by construction (≤ total/floor rows), so the hot slice of
      the dictionary broadcasts; hot stream rows join map-side with no
      shuffle at all — the skew never reaches an exchange.
    - cold rows shuffle-join the cold dictionary slice; every cold key
      is below the floor, so no partition can be dominated by one key.

    Routing uses one broadcast membership probe (hot_keys is tiny); hot
    rows can only match hot dictionary rows and vice versa, so the union
    preserves exact ``how`` semantics for disjoint key slices.
    """
    flag = F.broadcast(hot_keys.select(F.col("name").alias(key), F.lit(True).alias("_hot")))
    hot_map = F.broadcast(
        mapdf.join(hot_keys.select(F.col("name").alias(key)), key, "left_semi")
    )
    cold_map = mapdf.join(hot_keys.select(F.col("name").alias(key)), key, "left_anti")
    s = stream.join(flag, key, "left")
    hot_rows = s.where(F.col("_hot").isNotNull()).drop("_hot").join(hot_map, key, how)
    cold_rows = s.where(F.col("_hot").isNull()).drop("_hot").join(cold_map, key, how)
    return hot_rows.unionByName(cold_rows)


def link_triples(
    triples: DataFrame,
    canon: DataFrame,
    broadcast_map: bool = False,
    hot_names: DataFrame | None = None,
) -> LinkResult:
    """Join raw triples to canonical ids on both endpoints.

    ``canon``: (name, canonical_id, canonical_label) from canonicalize.

    Default is NO forced broadcast: the canonical map grows with the
    corpus (one row per distinct entity name), and pushing it through the
    driver serializes a cost that a shuffle join spreads across executors
    — AQE still converts to broadcast at runtime when the map is actually
    small.  Pass ``broadcast_map=True`` only for fixed, known-tiny maps.

    ``hot_names``: optional (name) frame of corpus-hot entity names (the
    pipeline derives it from mention frequencies).  When given, both
    endpoint joins run through ``hot_cold_join``: popular entities — the
    overwhelming majority of triple endpoints, since triples are about
    the entities people talk about — resolve via a broadcast of the hot
    dictionary slice with no shuffle, and only the long tail (rare +
    dangling endpoints) pays a shuffle join, with no per-key hotspot by
    construction.
    """
    cmap = F.broadcast(canon) if broadcast_map else canon

    t = triples.withColumn("subj_name", canonical_name(F.col("subj_text"))).withColumn(
        "obj_name", canonical_name(F.col("obj_text"))
    )
    subj_map = cmap.select(
        F.col("name").alias("subj_name"),
        F.col("canonical_id").alias("subj_id"),
        F.col("canonical_label").alias("subj_label"),
    )
    obj_map = cmap.select(
        F.col("name").alias("obj_name"),
        F.col("canonical_id").alias("obj_id"),
        F.col("canonical_label").alias("obj_label"),
    )
    if hot_names is not None:
        joined = hot_cold_join(
            hot_cold_join(t, subj_map, "subj_name", hot_names, "left"),
            obj_map,
            "obj_name",
            hot_names,
            "left",
        )
    else:
        joined = t.join(subj_map, "subj_name", "left").join(obj_map, "obj_name", "left")

    linked = joined.where(
        F.col("subj_id").isNotNull() & F.col("obj_id").isNotNull()
    ).select(
        "conv_id", "turn_idx", "subj_id", "pred", "obj_id", "subj_label", "obj_label", "confidence"
    )
    # Dangling side output (A11): reason string mirrors the reference's log
    # lines ("references to non-existent objects", README.md:84).
    dropped = joined.where(
        F.col("subj_id").isNull() | F.col("obj_id").isNull()
    ).select(
        "conv_id",
        "turn_idx",
        "subj_text",
        "pred",
        "obj_text",
        F.when(F.col("subj_id").isNull() & F.col("obj_id").isNull(), "both_unresolved")
        .when(F.col("subj_id").isNull(), "subj_unresolved")
        .otherwise("obj_unresolved")
        .alias("reason"),
    )
    return LinkResult(linked=linked, dropped=dropped)
