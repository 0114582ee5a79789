"""JDBC scan (SURVEY §2.1 S4): real round-trip against an in-process
embedded Derby database (bundled with Spark), exercising the
range-partitioned-cursor options of `tables.load_jdbc` — the reconciliation
source pattern of the reference (`migration_validation/reconciliation.py:189`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.tables import load_jdbc

URL = "jdbc:derby:memory:jdbctest;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_table(spark):
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.execute("CREATE TABLE legacy_orders (id INT, amount DOUBLE)")
    for i in range(40):
        st.execute(f"INSERT INTO legacy_orders VALUES ({i}, {i * 1.5})")
    st.close()
    conn.close()
    return "legacy_orders"


def test_jdbc_partitioned_scan(spark, derby_table):
    """Partitioned read opens `num_partitions` parallel range cursors —
    the plan must carry that parallelism, and values must round-trip."""
    df = load_jdbc(spark, URL, derby_table,
                   partition_column="id", num_partitions=4,
                   lower_bound=0, upper_bound=40, driver=DRIVER)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 40
    got = df.agg(F.sum("id").alias("s"),
                 F.sum("amount").alias("a")).collect()[0]
    assert got.s == sum(range(40))
    assert abs(got.a - sum(i * 1.5 for i in range(40))) < 1e-9


def test_jdbc_single_cursor_scan(spark, derby_table):
    """Without a partition column the whole table arrives through one
    connection (the dim-table path)."""
    df = load_jdbc(spark, URL, derby_table, driver=DRIVER)
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 40


def test_jdbc_pushdown_filter(spark, derby_table):
    """Catalyst pushes the filter into the JDBC source query — the scan's
    PushedFilters must carry it (no full-table pull + local filter)."""
    df = load_jdbc(spark, URL, derby_table,
                   partition_column="id", num_partitions=2,
                   lower_bound=0, upper_bound=40, driver=DRIVER)
    plan = df.filter(F.col("id") >= 30)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual" in plan
    assert df.filter(F.col("id") >= 30).count() == 10


def test_partition_column_requires_bounds(spark):
    """partition_column without bounds must fail with a clear Python
    ValueError — str(None) used to reach the JVM as the literal \"None\"
    and die in a NumberFormatException."""
    import pytest

    from redshift_to_lakehouse_migration_spark.tables import load_jdbc

    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        load_jdbc(spark, "jdbc:derby:memory:nope", "t",
                  partition_column="id")
