"""PII masking (SURVEY §2.10: the reference's only engine-evaluable UDFs).

The reference defines SQL scalar functions `mask_email` / `mask_name` gated
by `IS_MEMBER` role checks and a masked view
(`governance/access_controls.sql:57-105`). OSS Spark has no `IS_MEMBER`;
we model the role check as an explicit ``unmasked`` flag (session/config
driven) and provide both column-expression builders and SQL-function
registration (`spark.sql("CREATE TEMPORARY FUNCTION ...")` — Spark ≥3.5 SQL
UDFs), so both the DataFrame and SQL surfaces exist.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def mask_email(col: str | Column) -> Column:
    """LEFT(email,2) ‖ '***@' ‖ domain (`access_controls.sql:57-63`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | ~c.contains("@"), F.lit("***")
    ).otherwise(
        F.concat(F.substring(c, 1, 2), F.lit("***@"),
                 F.substring_index(c, "@", -1))
    )


def mask_name(col: str | Column) -> Column:
    """First char + '*' × (len−1) (`access_controls.sql:65-70`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (F.length(c) == 0), F.lit(None)).otherwise(
        F.concat(F.substring(c, 1, 1),
                 F.repeat(F.lit("*"), F.greatest(F.length(c) - 1, F.lit(0))))
    )


def masked(col: str | Column, mask_fn, unmasked: bool) -> Column:
    """Role-gated masking: pass-through for privileged sessions
    (`IS_MEMBER('pii_readers')` analog)."""
    c = F.col(col) if isinstance(col, str) else col
    return c if unmasked else mask_fn(c)


def create_masked_view(spark: SparkSession, base, view_name: str,
                       name_cols: tuple[str, ...] = (),
                       email_cols: tuple[str, ...] = (),
                       unmasked: bool = False) -> None:
    """Secure masked VIEW — the `v_dim_policy_masked` twin
    (`governance/access_controls.sql:76-105`): PII columns pass through
    the registered mask_* SQL functions, everything else unchanged.
    The reference gates on ``IS_MEMBER('pii_authorized')`` inside the
    functions; OSS Spark has no group membership, so the role check is the
    explicit ``unmasked`` flag — a privileged session builds the view
    pass-through, an unprivileged one masked, same consumer SQL either way.

    The masked columns are built with the registered mask_* SQL functions
    directly over ``base`` (selectExpr) and ONLY the masked result is
    registered as a view — no intermediate raw-data view exists for a
    consumer to discover, which an earlier ``__{view}_base`` staging view
    violated (temp views resolve lazily, so a staging view cannot be
    dropped after creation; it had to go entirely). ``view_name`` must be
    a single-part name without dots — a Spark temp-view constraint
    (TEMP_VIEW_NAME_TOO_MANY_NAME_PARTS), not a choice here.
    """
    # backtick-quote column names inside the selectExpr strings (hostile
    # column names: quotes, spaces — same discipline as catalog.quote_ident)
    def q(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    register_sql_functions(spark)
    cols = []
    for c in base.columns:
        qc = q(c)
        if not unmasked and c in name_cols:
            cols.append(f"mask_name({qc}) AS {qc}")
        elif not unmasked and c in email_cols:
            cols.append(f"mask_email({qc}) AS {qc}")
        else:
            cols.append(qc)
    base.selectExpr(*cols).createOrReplaceTempView(view_name)


def register_sql_functions(spark: SparkSession) -> None:
    """SQL-surface twins (CREATE FUNCTION ... RETURN, Spark ≥3.5)."""
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION mask_email(email STRING)
        RETURNS STRING
        RETURN CASE
            WHEN email IS NULL OR NOT contains(email, '@') THEN '***'
            ELSE concat(substring(email, 1, 2), '***@',
                        substring_index(email, '@', -1))
        END
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION mask_name(name STRING)
        RETURNS STRING
        RETURN CASE
            WHEN name IS NULL OR length(name) = 0 THEN NULL
            ELSE concat(substring(name, 1, 1),
                        repeat('*', greatest(length(name) - 1, 0)))
        END
    """)
