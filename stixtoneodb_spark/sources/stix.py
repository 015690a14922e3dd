"""STIX 2.x bundle → property-graph nodes/edges (reference-parity core).

Re-expresses the reference loader's whole behavior surface as DataFrame
ops, one mapping per reference operator (SURVEY §2 Part A):

- bundle-file scan (StixToNeoDB.scala:52, README.md:69-72)
    → ``spark.read.option("multiLine", true).json`` + ``explode(objects)``
- NDJSON "-x" line mode (StixToNeoDB.scala:54-55, README.md:78-82)
    → ``spark.read.json`` (native line mode) — the scale path
- zip-of-bundles scan (StixToNeoDB.scala:51, README.md:71-72)
    → staged extraction then the bundle reader per entry
- type dispatch SDO→node / SRO→edge (README.md:15-17, logback.xml:29-30)
    → plain ``where`` filters on the ``type`` column
- ref resolution by id index (A10) → joins against the object-id universe
- dangling-ref skip-and-count (A11, README.md:83-85; golden dangling cases
  testfull.json:3759-3781) → left_anti side outputs
- sub-structure flattening (A8, changes.md:41-43) → ``posexplode`` +
  deterministic sha2 child keys
- MERGE on id / append-to-existing-db (A9, README.md:75)
    → ``dropDuplicates("id")`` + catalog.merge_upsert
- malformed ids load fine (testfull.json:67 ``indicator--3tgverxfryjnujnu``)
    → ids are opaque strings, never validated

Edge-resolution semantics (pinned empirically against the golden corpus,
SURVEY §2.1): SRO edges require BOTH endpoints to resolve; embedded-ref
edges (created_by_ref, object_marking_refs, object_refs, object_ref,
where_sighted_refs) require the *target* to resolve in the full object-id
universe; sighting edges require sighting_of_ref to resolve.
"""

from __future__ import annotations

import os
import zipfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stixtoneodb_spark.functions.ids import child_id

EDGE_KINDS = ("relationship", "sighting")  # object types that become edges, not nodes

# Explicit union schema over every STIX 2.x spec field observed in the
# golden corpus (SURVEY §1.2/§1.3: "never schema inference in production" —
# inference is non-deterministic under partial data).  String-keyed spec
# maps (observables `objects`, language `contents`, `hashes`) are REAL
# MapType here, where inference had frozen the corpus's particular keys
# ("0"/"1", "de"/"fr", "MD1"...) into struct fields.  Ids and timestamps
# stay strings: the reference loads malformed ids verbatim
# (testfull.json:67) and round-trips variable-precision RFC-3339.
# Custom `x_*` properties (changes.md:40-43) are open-tail by design:
# extend this DDL per deployment; the NDJSON reader additionally retains
# the raw line in ``props`` so unknown fields are never lost.
STIX_OBJECT_SCHEMA_DDL = """
    aliases array<string>,
    contact_information string,
    contents map<string,map<string,string>>,
    count bigint,
    created string,
    created_by_ref string,
    definition map<string,string>,
    definition_type string,
    description string,
    external_references array<struct<description:string,external_id:string,hashes:map<string,string>,source_name:string,url:string>>,
    first_observed string,
    first_seen string,
    goals array<string>,
    granular_markings array<struct<marking_ref:string,selectors:array<string>>>,
    id string,
    identity_class string,
    kill_chain_phases array<struct<kill_chain_name:string,phase_name:string>>,
    labels array<string>,
    last_observed string,
    last_seen string,
    modified string,
    name string,
    number_observed bigint,
    object_marking_refs array<string>,
    object_modified string,
    object_ref string,
    object_refs array<string>,
    objective string,
    objects map<string,struct<hashes:map<string,string>,mime_type:string,name:string,name_enc:string,payload_bin:string,type:string>>,
    pattern string,
    primary_motivation string,
    published string,
    relationship_type string,
    resource_level string,
    roles array<string>,
    secondary_motivations array<string>,
    sectors array<string>,
    sighting_of_ref string,
    sophistication string,
    source_ref string,
    target_ref string,
    type string,
    valid_from string,
    where_sighted_refs array<string>
"""

# Per-type spec fields materialized as typed node columns (A7 depth —
# the reference's NodesMaker projects these per type [LIB]; a wide
# nullable projection is the columnar equivalent: property-level queries
# hit real columns instead of parsing ``props`` JSON per row).
TYPED_NODE_FIELDS = (
    "description",        # most SDOs
    "pattern",            # indicator
    "valid_from",         # indicator
    "identity_class",     # identity
    "contact_information",  # identity
    "sectors",            # identity
    "labels",             # malware / tool / indicator / threat-actor
    "aliases",            # threat-actor / intrusion-set / campaign
    "roles",              # threat-actor
    "goals",              # threat-actor / intrusion-set
    "sophistication",     # threat-actor
    "primary_motivation",  # threat-actor / intrusion-set
    "resource_level",     # threat-actor / intrusion-set
    "first_seen",         # campaign / intrusion-set
    "last_seen",          # campaign / intrusion-set
    "objective",          # campaign
    "published",          # report
    "definition_type",    # marking-definition
)

EMBEDDED_REF_FIELDS: dict[str, bool] = {
    # field -> is_array
    "created_by_ref": False,
    "object_ref": False,
    "object_marking_refs": True,
    "object_refs": True,
}


def object_schema() -> "T.StructType":
    """The frozen union object schema as a StructType."""
    import pyspark.sql.types as T  # noqa: PLC0415

    return T.StructType.fromDDL(STIX_OBJECT_SCHEMA_DDL)


def read_bundle(spark: SparkSession, path: str) -> DataFrame:
    """Whole-document bundle parse → one row per STIX object.

    Lossless like the reference's `-f` mode (StixToNeoDB.scala:52; the
    reference keeps custom properties — changes.md:40-43): the bundle is
    split into per-object raw JSON strings **JVM-side** via VariantType
    (``parse_json`` keeps every field, modeled or not), then each object
    string goes through the same explicit-schema ``from_json`` as the
    NDJSON path.  ``props`` therefore retains custom ``x_*`` properties
    that the frozen union schema does not model — no inference anywhere,
    no Python in the loop.

    Scale note: one bundle document = one input row (wholetext), the same
    non-splittable unit as ``multiLine`` JSON — bundles are an ingest-edge
    format; NDJSON is the scale path.
    """
    raw = spark.read.text(path, wholetext=True)
    objects = raw.select(
        F.explode(
            F.expr("variant_get(try_parse_json(value), '$.objects', 'array<variant>')")
        ).alias("obj")
    ).select(F.to_json("obj").alias("props"))
    parsed = objects.select(F.from_json("props", object_schema()).alias("obj"), "props")
    return parsed.select("obj.*", "props")


def read_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """`-x` line mode: one STIX object per line — record-at-a-time and
    constant-memory like the reference's loadLargeTextFile
    (StixToNeoDB.scala:54-55), but parallel.

    Lossless + explicit-schema: the raw line is read as text and parsed
    with ``from_json`` against the frozen union schema, so (a) no
    inference anywhere, (b) ``props`` keeps the ORIGINAL bytes — custom
    ``x_*`` properties survive even though the typed columns don't model
    them, and (c) malformed lines yield a null ``id`` and are counted by
    the A5 validity gate instead of aborting the load (README.md:83-85
    skip-and-continue)."""
    raw = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    parsed = raw.select(
        F.from_json("value", object_schema()).alias("obj"),
        F.col("value").alias("props"),
    )
    return parsed.select("obj.*", "props")


def read_zip(spark: SparkSession, path: str, staging_dir: str) -> DataFrame:
    """Zip-of-bundles: extract `.json`/`.stix` entries (README.md:71-72)
    to a staging dir, then parse each as a bundle. Driver-side unzip is
    acceptable: archives are an ingest-edge format; table scans are the
    production path."""
    os.makedirs(staging_dir, exist_ok=True)
    extracted = []
    with zipfile.ZipFile(path) as zf:
        for entry in zf.namelist():
            if entry.endswith((".json", ".stix")) and not entry.startswith("__MACOSX"):
                extracted.append(zf.extract(entry, staging_dir))
    frames = [read_bundle(spark, p) for p in extracted]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def read_zip_ndjson(spark: SparkSession, path: str, staging_dir: str) -> DataFrame:
    """`-x` + zip: archive entries holding one STIX object per LINE — the
    reference's ``loadLargeZipTextFile`` (StixToNeoDB.scala:55), which
    iterates zip entries and feeds each through the same line-at-a-time
    reader as plain `-x` mode.  We extract entries to a staging dir
    (driver-side, same ingest-edge rationale as ``read_zip``) and hand
    the whole directory to ``read_ndjson`` — one distributed text scan
    over all entries, identical parse/validate/lossless-props semantics
    to the plain NDJSON path (graph-signature parity is pinned by
    tests/test_stix_parity.py)."""
    os.makedirs(staging_dir, exist_ok=True)
    extracted = []
    with zipfile.ZipFile(path) as zf:
        for entry in zf.namelist():
            if not entry.endswith("/") and not entry.startswith("__MACOSX"):
                extracted.append(zf.extract(entry, staging_dir))
    if not extracted:
        raise ValueError(f"no entries in archive {path}")
    return read_ndjson(spark, [p for p in extracted])


@dataclass
class StixGraph:
    nodes: DataFrame
    edges: DataFrame          # all resolvable edges (SRO + sighting + embedded)
    children: DataFrame       # flattened sub-structure records
    dropped_edges: DataFrame  # dangling refs: (src_id, kind, ref, reason)


def build_graph(objects: DataFrame) -> StixGraph:
    """The reference's NodesMaker/RelationsMaker equivalent, set-at-a-time.

    ``objects``: one row per STIX object with at least (type, id) and the
    optional ref/substructure columns the corpus carries.
    """
    objects = objects.dropDuplicates(["id"])  # MERGE-on-id within batch (A9/A15)
    cols = set(objects.columns)

    # -- id universe for ref resolution (broadcast: ids are tiny vs refs) --
    id_universe = objects.select(F.col("id").alias("ref_target"))

    # -- nodes: everything that is not an edge-kind object (A6 dispatch),
    # with the per-type spec fields as REAL typed columns (A7: the
    # NodesMaker-style projection — property queries need no JSON parse) --
    typed = [F.col(f) for f in TYPED_NODE_FIELDS if f in cols]
    nodes = objects.where(~F.col("type").isin(*EDGE_KINDS)).select(
        "id",
        F.col("type").alias("node_type"),
        (F.col("name") if "name" in cols else F.lit(None).cast("string")).alias("label"),
        (F.col("created") if "created" in cols else F.lit(None).cast("string")).alias("created"),
        (F.col("modified") if "modified" in cols else F.lit(None).cast("string")).alias("modified"),
        *typed,
        "props",
    )

    def resolve(df: DataFrame, ref_col: str) -> tuple[DataFrame, DataFrame]:
        tgt = F.broadcast(id_universe)
        ok = df.join(tgt, df[ref_col] == tgt.ref_target, "left_semi")
        bad = df.join(tgt, df[ref_col] == tgt.ref_target, "left_anti")
        return ok, bad

    dropped: list[DataFrame] = []

    def note_dropped(df: DataFrame, kind: str, ref_col: str) -> None:
        dropped.append(
            df.select(
                F.col("id").alias("src_id"),
                F.lit(kind).alias("kind"),
                F.col(ref_col).alias("ref"),
                F.lit("unresolved_ref").alias("reason"),
            )
        )

    # -- SRO edges: both endpoints must resolve (A10/A11) --
    rels = objects.where(F.col("type") == "relationship").select(
        "id", "source_ref", "relationship_type", "target_ref", "created", "modified"
    )
    ok_src, bad_src = resolve(rels, "source_ref")
    ok_both, bad_dst = resolve(ok_src, "target_ref")
    note_dropped(bad_src, "relationship", "source_ref")
    note_dropped(bad_dst, "relationship", "target_ref")
    sro_edges = ok_both.select(
        "id",
        F.col("source_ref").alias("src"),
        F.col("target_ref").alias("dst"),
        F.col("relationship_type").alias("rel_type"),
        "created",
        "modified",
    )

    edge_frames = [sro_edges]

    # -- sighting edges: where_sighted --sighted--> sighting_of (both must
    # resolve; the fully-dangling golden sighting is skipped + counted) --
    if "sighting_of_ref" in cols:
        sightings = objects.where(F.col("type") == "sighting").select(
            "id",
            "sighting_of_ref",
            F.explode_outer("where_sighted_refs").alias("where_ref"),
            "created",
            "modified",
        )
        ok_sof, bad_sof = resolve(sightings, "sighting_of_ref")
        note_dropped(bad_sof, "sighting", "sighting_of_ref")
        ok_wr, bad_wr = resolve(ok_sof.where(F.col("where_ref").isNotNull()), "where_ref")
        note_dropped(bad_wr, "sighting", "where_ref")
        edge_frames.append(
            ok_wr.select(
                child_id(F.col("id"), "sighted", F.col("where_ref")).alias("id"),
                F.col("where_ref").alias("src"),
                F.col("sighting_of_ref").alias("dst"),
                F.lit("sighted").alias("rel_type"),
                "created",
                "modified",
            )
        )

    # -- embedded-ref edges: target must resolve in the id universe --
    for field, is_array in EMBEDDED_REF_FIELDS.items():
        if field not in cols:
            continue
        if is_array:
            refs = objects.where(F.size(F.col(field)) > 0).select(
                "id", F.explode(field).alias("ref"), "created", "modified"
            )
        else:
            refs = objects.where(F.col(field).isNotNull()).select(
                "id", F.col(field).alias("ref"), "created", "modified"
            )
        ok, bad = resolve(refs, "ref")
        note_dropped(bad, field, "ref")
        edge_frames.append(
            ok.select(
                child_id(F.col("id"), field, F.col("ref")).alias("id"),
                F.col("id").alias("src"),
                F.col("ref").alias("dst"),
                F.lit(field.removesuffix("s").removesuffix("_ref") or field).alias("rel_type"),
                "created",
                "modified",
            )
        )

    edges = edge_frames[0]
    for f in edge_frames[1:]:
        edges = edges.unionByName(f)

    # -- sub-structure flattening (A8): child records with deterministic keys --
    child_frames = []
    for field in ("kill_chain_phases", "external_references", "granular_markings"):
        if field not in cols:
            continue
        child_frames.append(
            objects.where(F.size(F.col(field)) > 0)
            .select("id", F.posexplode(field).alias("pos", "child"))
            .select(
                child_id(
                    F.col("id"), field, F.concat_ws(":", F.col("pos"), F.to_json("child"))
                ).alias("child_key"),
                F.col("id").alias("parent_id"),
                F.lit(field).alias("kind"),
                F.to_json("child").alias("payload"),
            )
        )
    if "objects" in cols:  # observed-data observables map (testfull.json:17-32)
        # JSON inference renders the string-keyed observables map as a
        # struct with one field per key ("0", "1", ...); iterate the
        # inferred fields to recover map-entry semantics generically.
        obj_type = dict(zip(objects.schema.names, [f.dataType for f in objects.schema.fields]))[
            "objects"
        ]
        import pyspark.sql.types as _T  # noqa: PLC0415

        if isinstance(obj_type, _T.StructType):
            entries = F.array(
                *[
                    F.struct(
                        F.lit(f.name).alias("okey"), F.to_json(F.col("objects").getField(f.name)).alias("oval")
                    )
                    for f in obj_type.fields
                ]
            )
        else:  # genuine MapType (explicit-schema path)
            entries = F.transform(
                F.map_entries("objects"),
                lambda e: F.struct(e.key.alias("okey"), F.to_json(e.value).alias("oval")),
            )
        child_frames.append(
            objects.where(F.col("type") == "observed-data")
            .select("id", F.explode(entries).alias("e"))
            .where(F.col("e.oval").isNotNull())
            .select(
                child_id(F.col("id"), "observable", F.col("e.okey")).alias("child_key"),
                F.col("id").alias("parent_id"),
                F.lit("observable").alias("kind"),
                F.col("e.oval").alias("payload"),
            )
        )
    children = child_frames[0]
    for f in child_frames[1:]:
        children = children.unionByName(f)

    dropped_all = dropped[0]
    for d in dropped[1:]:
        dropped_all = dropped_all.unionByName(d)

    return StixGraph(nodes=nodes, edges=edges, children=children, dropped_edges=dropped_all)
