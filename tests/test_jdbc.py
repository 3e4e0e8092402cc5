"""JDBC source/sink round-trip against embedded Derby (bundled with Spark).

Covers S3 (JDBC scan with projection+predicate pushed into the remote SQL)
and S5 (batched JDBC append) with a real database engine — single-JVM
embedded mode, which local[*] shares.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from presencia_etl_spark.sources.readers import read_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


class TestJdbcRoundTrip:
    def test_write_read_pushdown(self, spark, tmp_path):
        url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
        table = f"t_{uuid.uuid4().hex[:8]}"
        src = spark.range(0, 1000).select(
            F.col("id").alias("K"),
            (F.col("id") % 7).alias("V"),
            F.concat(F.lit("name_"), F.col("id")).alias("NAME"),
        )
        (
            src.write.format("jdbc")
            .option("url", url)
            .option("driver", DRIVER)
            .option("dbtable", table)
            .option("batchsize", 200)
            .mode("overwrite")
            .save()
        )

        back = read_jdbc(spark, url, table, properties={"driver": DRIVER})
        assert back.count() == 1000

        # Projection + predicate must reach the remote SQL (S3 semantics).
        q = back.select("K", "V").filter(F.col("V") == 3)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "V" in plan
        rows = q.collect()
        assert len(rows) == len([i for i in range(1000) if i % 7 == 3])
        assert all(r["V"] == 3 for r in rows)

        # Partitioned (sharded) read returns the same data.
        sharded = read_jdbc(
            spark,
            url,
            table,
            properties={"driver": DRIVER},
            partition_column="K",
            num_partitions=4,
            lower_bound=0,
            upper_bound=1000,
        )
        assert sharded.rdd.getNumPartitions() == 4
        assert sharded.count() == 1000

        # Append mode (S5) adds rows without clobbering.
        src.limit(10).write.format("jdbc").option("url", url).option(
            "driver", DRIVER
        ).option("dbtable", table).mode("append").save()
        assert read_jdbc(spark, url, table, properties={"driver": DRIVER}).count() == 1010
