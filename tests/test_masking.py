"""Role-gated PII masking (masking.py) — the access_controls.sql twin:
SQL mask functions, and the secure masked VIEW with the IS_MEMBER-analog
role flag in both positions."""

from __future__ import annotations

from redshift_to_lakehouse_migration_spark.masking import (
    create_masked_view,
    register_sql_functions,
)


def _people(spark):
    return spark.createDataFrame(
        [(1, "Alice Smith", "alice.smith@example.com", "BUILDING"),
         (2, "Bo", "bo@ex.org", "MACHINERY"),
         (3, None, None, "AUTOMOBILE")],
        "id int, name string, email string, segment string")


def test_sql_mask_functions(spark):
    register_sql_functions(spark)
    row = spark.sql(
        "SELECT mask_name('Alice Smith') AS n, "
        "mask_email('alice.smith@example.com') AS e, "
        "mask_name(NULL) AS nn, mask_email('not-an-email') AS ne"
    ).collect()[0]
    assert row.n == "A**********"
    assert row.e == "al***@example.com"
    assert row.nn is None
    assert row.ne == "***"


def test_masked_view_masks_pii_and_passes_rest(spark):
    create_masked_view(spark, _people(spark), "v_people_masked",
                       name_cols=("name",), email_cols=("email",))
    rows = {r.id: r for r in spark.sql(
        "SELECT * FROM v_people_masked").collect()}
    assert rows[1].name == "A**********"
    assert rows[1].email == "al***@example.com"
    assert rows[1].segment == "BUILDING"       # non-PII untouched
    assert rows[2].name == "B*"
    assert rows[3].name is None and rows[3].email == "***"
    # same column names as the base table: consumers don't change SQL
    assert [f.name for f in spark.table("v_people_masked").schema.fields] \
        == ["id", "name", "email", "segment"]


def test_masked_view_role_flag_passes_through(spark):
    """A pii_authorized session (IS_MEMBER analog) sees raw values through
    the SAME view name."""
    create_masked_view(spark, _people(spark), "v_people_privileged",
                       name_cols=("name",), email_cols=("email",),
                       unmasked=True)
    rows = {r.id: r for r in spark.sql(
        "SELECT * FROM v_people_privileged").collect()}
    assert rows[1].name == "Alice Smith"
    assert rows[1].email == "alice.smith@example.com"


def test_masked_view_leaves_no_raw_base_view(spark):
    """The masked view must be the ONLY registration: an earlier
    implementation staged the raw DataFrame as a discoverable
    __{view}_base temp view (trivially bypassing the mask) which could
    not even be dropped (temp views resolve lazily)."""
    create_masked_view(spark, _people(spark), "v_leak_check",
                       name_cols=("name",), email_cols=("email",))
    views = [v.name for v in spark.catalog.listTables()
             if v.tableType == "TEMPORARY" or v.isTemporary]
    assert "v_leak_check" in views
    assert not any("v_leak_check" in v and v != "v_leak_check"
                   for v in views), views
    # and the view itself is masked
    r = spark.sql("SELECT name FROM v_leak_check WHERE id = 1").collect()[0]
    assert r.name == "A" + "*" * (len("Alice Smith") - 1)
