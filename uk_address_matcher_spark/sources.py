"""Ingestion connectors: CSV / JSON / parquet address tables.

Mirrors the reference's entry paths on Spark readers:
 - EPC-style CSV (examples/match_epc_to_os.py:24-45): header CSV with
   ADDRESS1..3 / POSTCODE / LMK_KEY columns, concat_ws'd into the
   (unique_id, address_concat, postcode) contract.
 - Companies-House-style JSON (scripts/generate_better_tfs.py:50-77):
   nested `data.address` objects; the `->>'premises'` path ops become
   struct-field access after spark.read.json schema inference, with the
   same UK-country filter and concat_ws assembly.

Both return the flat input contract every pipeline entry point takes
(cleaning, linkage, to_documents). At scale these are plain distributed
scans: CSV/JSON parsing parallelises per file-split, and the projection
prunes to three columns before anything shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UK_COUNTRIES = [
    "England",
    "United Kingdom",
    "Scotland",
    "Wales",
    "Northern Ireland",
    "Great Britain",
]


def read_addresses_csv(
    spark: SparkSession,
    path: str,
    id_col: str = "LMK_KEY",
    address_cols: tuple[str, ...] = ("ADDRESS1", "ADDRESS2", "ADDRESS3"),
    postcode_col: str = "POSTCODE",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """EPC-style certificates CSV -> (unique_id, address_concat, postcode).

    concat_ws skips NULL address lines, matching the reference's
    `concat_ws(' ', ADDRESS1, ADDRESS2, ADDRESS3)`
    (match_epc_to_os.py:35-43).
    """
    raw = spark.read.csv(path, header=True, inferSchema=False)
    return raw.select(
        F.col(id_col).cast("string").alias("unique_id"),
        F.concat_ws(" ", *[F.col(c) for c in address_cols]).alias("address_concat"),
        F.col(postcode_col).alias("postcode"),
        *[F.col(c) for c in extra_cols],
    )


def read_addresses_json(
    spark: SparkSession, path: str, file_identifier: str = "ch"
) -> DataFrame:
    """Companies-House-style JSON -> (unique_id, address_concat, postcode).

    Replays generate_better_tfs.py:50-77: unique_id =
    '<identifier>_<row_number>', address_concat = concat_ws of
    premises/address_line_1/address_line_2/locality/region, UK-country
    (or NULL) filter. DuckDB's `data -> 'address' ->> 'premises'` JSON
    path ops map to struct-field access on the inferred schema —
    spark.read.json infers `data.address.premises` as a real column, so
    the path expressions are column references, not string parsing.

    row_number here runs over a global window ONLY to reproduce the
    reference's id scheme; it is ordered by company_number (a stable
    business key), so the SAME record gets the SAME unique_id on every
    re-ingestion at any partitioning — joins against previously ingested
    outputs stay valid. For 100-TB ingestion prefer
    monotonically_increasing_id (per-partition, no single-reducer
    window) and pass ids through instead.
    """
    raw = spark.read.json(path)
    addr = F.col("data").getField("address")
    picked = raw.select(
        F.col("company_number"),
        addr.getField("premises").alias("premises"),
        addr.getField("address_line_1").alias("address_line_1"),
        addr.getField("address_line_2").alias("address_line_2"),
        addr.getField("country").alias("country"),
        addr.getField("locality").alias("locality"),
        addr.getField("postal_code").alias("postal_code"),
        addr.getField("region").alias("region"),
    ).filter(F.col("country").isin(UK_COUNTRIES) | F.col("country").isNull())
    from pyspark.sql import Window

    # full deterministic ordering: company_number alone is not unique in
    # dirty registry extracts, and a tie broken arbitrarily would hand
    # the SAME record a DIFFERENT unique_id on re-ingestion
    w = Window.orderBy(
        "company_number", "postal_code", "premises", "address_line_1",
        "address_line_2", "locality", "region",
    )
    return picked.withColumn("__rn", F.row_number().over(w)).select(
        F.concat(F.lit(f"{file_identifier}_"), F.col("__rn").cast("string")).alias(
            "unique_id"
        ),
        F.concat_ws(
            " ", "premises", "address_line_1", "address_line_2", "locality", "region"
        ).alias("address_concat"),
        F.col("postal_code").alias("postcode"),
    )


def write_addresses_parquet(df: DataFrame, path: str, compression: str = "zstd"):
    """COPY ... TO (FORMAT parquet, COMPRESSION zstd) equivalent
    (generate_better_tfs.py:78-82)."""
    df.write.mode("overwrite").option("compression", compression).parquet(path)


def sample_addresses(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Deterministic random sample of ``n`` rows — the reference's
    `ORDER BY random() LIMIT n` workflow (examples/fhrs/match_fhrs_to_os.py:41-42,
    scripts/epc_accuracy_from_labels.py:34) with a seed so reruns pick the
    SAME records. The order key is a CONTENT hash (xxhash64 over the row's
    columns + seed), not rand(seed): Spark seeds rand per (partition,
    row-offset), so a rand-ordered sample silently changes whenever the
    upstream partitioning does — content hashing makes the same seed pick
    the same rows under any partitioning or cluster layout (the same
    property hash_sample has). Ties are only possible between fully
    identical rows, where either pick is the same sample.

    Map-typed columns (e.g. second-pass outputs carrying
    map<string,bigint> histograms) are excluded from the hash — Spark
    disallows hashing MapType — so any frame with at least one hashable
    column samples fine; the sample is still content-keyed on every
    hashable column."""
    from pyspark.sql import types as T

    def hashable(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(hashable(f.dataType) for f in dt.fields)
        return True

    cols = [f.name for f in df.schema.fields if hashable(f.dataType)]
    if not cols:
        raise ValueError(
            "sample_addresses: every column is map-typed (unhashable); "
            "drop or convert a column, or sample before deriving maps"
        )
    key = F.xxhash64(*[F.col(c) for c in cols], F.lit(seed))
    return df.orderBy(key).limit(n)


def hash_sample(
    df: DataFrame, modulus: int = 10, remainder: int = 0, id_col: str = "unique_id"
) -> DataFrame:
    """The reference scripts' ``hash(unique_id) % 10 = 0`` sampling idiom
    (e.g. scripts/epc_accuracy_from_labels.py:34): deterministic AND
    partition-independent — the same record is always in or out of the
    sample regardless of cluster layout, unlike rand()-ordered sampling."""
    return df.filter(F.abs(F.xxhash64(F.col(id_col))) % modulus == remainder)


def repartition_by_postcode_locality(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Range-partition a flat address table by postcode so records that
    block together are physically co-located (the reference's `ORDER BY
    postcode` ingest guidance, readme.md:52-53 +
    examples/example_matching.py:42-43): blocking keys are postcode-prefixed,
    so range partitioning turns the blocking shuffle into mostly-local
    exchanges and gives parquet writers run-length-friendly postcode runs."""
    if num_partitions is not None:
        return df.repartitionByRange(num_partitions, "postcode")
    return df.repartitionByRange("postcode")
