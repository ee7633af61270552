"""Round-16 block part 2 — catalog-metadata depth (§2.AO): partition
inventory via SHOW PARTITIONS over a partitioned warehouse table, and the
table-properties lifecycle (TBLPROPERTIES at CREATE, ALTER SET / UNSET,
SHOW TBLPROPERTIES as a relation).

These are the two catalog surfaces the §2.X census still lacked: the
existing ops enumerate columns/types/DESCRIBE-AS-JSON; neither touches the
PARTITION metadata a warehouse actually routes queries with, nor the
property bag deployments hang retention/ownership metadata on.

Scale posture: partition-inventory reads are pure metadata (SHOW
PARTITIONS lists directory names, never data); the verification read-back
groups by the partition column, which prunes to per-partition file
listings. The property ops are catalog-only — constant cost at any data
scale."""

from __future__ import annotations

import glob
import hashlib
import os
import re
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.functions.portable import (
    stable_rounded_sum,
    stable_rounded_sum_sql,
)
from ai_dataingestion_spark.registry import Tables, register_views

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _corpus_suffix(sf_dir: str) -> str:
    """Stable per-corpus table-name suffix (the join_bucketed convention,
    operators/extended.py): sanitized leaf + path hash so scratch tiers
    can't collide and '/' never reaches a table identifier."""
    canon = os.path.realpath(sf_dir)
    leaf = re.sub(r"[^0-9A-Za-z_]", "_", os.path.basename(canon))
    return f"{leaf}_{hashlib.md5(canon.encode()).hexdigest()[:6]}"


def _build_partitioned_table(
    spark: SparkSession, tab: str, df: DataFrame, part_col: str
) -> None:
    """Crash-safe partitioned-table build — same temp-name + rename
    protocol as operators/extended.py:_build_bucket_table (write under
    ``{tab}_w{pid}``, reap only dead-owner temps, clear the stale final
    dir, rename last) so a killed run can never leave a half-written
    table bound to the final name."""
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for stale in glob.glob(f"{warehouse}/{tab}_w*"):
        pid_part = stale.rsplit("_w", 1)[-1]
        try:
            os.kill(int(pid_part), 0)
            continue  # owner alive: leave its in-progress write alone
        except ValueError:
            pass
        except ProcessLookupError:
            pass
        except PermissionError:
            continue
        shutil.rmtree(stale, ignore_errors=True)
    tmp = f"{tab}_w{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    (
        df.write.partitionBy(part_col)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(tmp)
    )
    shutil.rmtree(f"{warehouse}/{tab}", ignore_errors=True)
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {tab}")
    # RENAME moves the table DIRECTORY but the catalog's per-partition
    # locations still point under the temp name — reads silently see zero
    # partitions (SHOW PARTITIONS, pure metadata, still lists them).
    # RECOVER PARTITIONS rescans the renamed directory and re-points the
    # partition specs.
    spark.sql(f"ALTER TABLE {tab} RECOVER PARTITIONS")


# ---------------------------------------------------------------------------
# catalog_show_partitions_inventory — SHOW PARTITIONS as a checked relation
# ---------------------------------------------------------------------------


@register(
    "catalog_show_partitions_inventory",
    oracle=f"""
SELECT coalesce(CAST((o_orderkey % 8 + 8) % 8 AS VARCHAR),
                '{_HIVE_NULL}') AS pk_bucket,
       count(*) AS n_rows,
       {stable_rounded_sum_sql("o_totalprice", 2)} AS price_sum
FROM orders
GROUP BY 1
""",
)
def catalog_show_partitions_inventory(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition metadata as a first-class relation: orders lands in a
    warehouse table partitioned by an 8-way key bucket, SHOW PARTITIONS
    enumerates the catalog's partition directory entries ('pk_bucket=3',
    with NULL keys under Hive's __HIVE_DEFAULT_PARTITION__), and each
    listed partition is verified against a partition-pruned read-back
    (count + price sum per partition — the groupBy key IS the partition
    column, so the scan prunes per-directory). The oracle recomputes the
    same inventory from the raw source — so a partition the writer
    dropped, duplicated, or mis-bucketed hash-fails. The numeric bucket
    key keeps partition values escape-free (unicode-tier order columns
    never reach the directory names). At 100 TB this is the layout-audit
    every partitioned sink needs: SHOW PARTITIONS is pure metadata and
    the read-back is one pruned pass; the build cost is paid once per
    corpus (the crash-safe rename protocol of the bucketed-join
    tables)."""
    t = Tables(spark, sf_dir)
    suffix = _corpus_suffix(sf_dir)
    tab = f"opart_{suffix}"
    if not spark.catalog.tableExists(tab):
        src = t.orders.select(
            "o_orderkey",
            "o_totalprice",
            F.expr("cast((o_orderkey % 8 + 8) % 8 as string)").alias(
                "pk_bucket"
            ),
        )
        _build_partitioned_table(spark, tab, src, "pk_bucket")
    listed = (
        spark.sql(f"SHOW PARTITIONS {tab}")
        .select(
            F.substring_index(F.col("partition"), "=", -1).alias("pk_bucket")
        )
    )
    counts = (
        spark.table(tab)
        .groupBy(
            F.coalesce(F.col("pk_bucket"), F.lit(_HIVE_NULL)).alias(
                "pk_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            stable_rounded_sum("o_totalprice", 2).alias("price_sum"),
        )
    )
    # inner join: a partition must BOTH be listed in the catalog AND
    # carry the source's rows to survive into the checked relation
    return listed.join(counts, "pk_bucket").select(
        "pk_bucket", "n_rows", "price_sum"
    )


# ---------------------------------------------------------------------------
# catalog_tblproperties_roundtrip — CREATE/SET/UNSET/SHOW TBLPROPERTIES
# ---------------------------------------------------------------------------


@register(
    "catalog_tblproperties_roundtrip",
    oracle="""
SELECT * FROM (VALUES
  ('graft.retention', '30d'),
  ('graft.tier', 'silver')
) AS t(key, value)
""",
)
def catalog_tblproperties_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The table-property lifecycle, round-tripped through the catalog:
    CREATE TABLE ... TBLPROPERTIES seeds two properties
    (owner=ingest, tier=gold), ALTER TABLE SET overwrites one and adds
    another (tier→silver, retention=30d), ALTER TABLE UNSET removes the
    owner — so SHOW TBLPROPERTIES must surface EXACTLY
    {retention: 30d, tier: silver} under the graft.* namespace (engine-
    internal properties are filtered out; the oracle pins the expected
    bag as literals). The scratch table is per-process-named, built from
    the 5-row region dimension, and dropped before the result returns —
    SHOW TBLPROPERTIES is an eagerly-executed command, so its relation
    survives the drop. Catalog-only: constant cost at any scale."""
    register_views(spark, sf_dir)
    tab = f"graft_tprops_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {tab}")
    spark.sql(
        f"""
        CREATE TABLE {tab} USING parquet
        TBLPROPERTIES ('graft.owner' = 'ingest', 'graft.tier' = 'gold')
        AS SELECT r_regionkey FROM region
        """
    )
    try:
        spark.sql(
            f"ALTER TABLE {tab} SET TBLPROPERTIES"
            " ('graft.retention' = '30d', 'graft.tier' = 'silver')"
        )
        spark.sql(f"ALTER TABLE {tab} UNSET TBLPROPERTIES ('graft.owner')")
        props = spark.sql(f"SHOW TBLPROPERTIES {tab}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tab}")
    return props.where(F.col("key").startswith("graft.")).select(
        "key", "value"
    )
