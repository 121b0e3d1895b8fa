"""SQL-database source (S8): Spark JDBC wrapper with a SQLAlchemy-URL
front door.

Reference parity: ``processors/_impl/plotting_impl.py:109-119`` accepts
any SQLAlchemy URL (``sqlite:///…``, ``postgresql://…``) plus a query
string and pulls the result into the plot pipeline. Spark's native
equivalent is ``spark.read.format("jdbc")`` — scale-shaped when given a
``partition_column`` (N concurrent range-partitioned reads instead of
one connection streaming the whole table through the driver).

The sandbox ships no JDBC driver jars, so the reader is an injectable
seam: production uses the real ``spark.read``, tests inject a fake and
assert the exact option set this module assembles. The URL translation
and option assembly — the actual logic — are pure and fully tested.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

#: SQLAlchemy dialect -> (jdbc scheme, default driver class)
_DIALECTS = {
    "sqlite": ("jdbc:sqlite:{path}", "org.sqlite.JDBC"),
    "postgresql": ("jdbc:postgresql://{host}{port}/{db}", "org.postgresql.Driver"),
    "postgres": ("jdbc:postgresql://{host}{port}/{db}", "org.postgresql.Driver"),
    "mysql": ("jdbc:mysql://{host}{port}/{db}", "com.mysql.cj.jdbc.Driver"),
    "mssql": ("jdbc:sqlserver://{host}{port};databaseName={db}",
              "com.microsoft.sqlserver.jdbc.SQLServerDriver"),
    "oracle": ("jdbc:oracle:thin:@{host}{port}/{db}", "oracle.jdbc.OracleDriver"),
}


def sqlalchemy_url_to_jdbc(url: str) -> tuple[str, dict]:
    """Translate a SQLAlchemy URL to (jdbc_url, credential/driver opts).

    Accepts the forms the reference accepts (``sqlite:///file.db``,
    ``postgresql://user:pw@host:5432/db``); already-``jdbc:`` URLs pass
    through untouched.
    """
    if url.startswith("jdbc:"):
        return url, {}
    dialect = re.split(r"[+:]", url, 1)[0].lower()
    if dialect not in _DIALECTS:
        raise ValueError(f"unsupported SQL dialect {dialect!r} in url {url!r}")
    template, driver = _DIALECTS[dialect]
    # normalize "dialect+driver://" (sqlalchemy) to "dialect://" for parsing
    parsed = urlparse(re.sub(r"^[^:/]+", dialect, url, count=1))
    opts: dict = {"driver": driver}
    # query-string params carry through as JDBC options (sslmode etc) —
    # dropping them would silently disable e.g. TLS requirements
    opts.update(dict(parse_qsl(parsed.query)))
    if dialect == "sqlite":
        # exactly ONE leading slash is the URL separator; the rest is
        # the path: sqlite:///rel.db -> rel.db, sqlite:////abs.db -> /abs.db
        path = parsed.path[1:] if parsed.path.startswith("/") else parsed.path
        return template.format(path=path), opts
    if parsed.username:
        opts["user"] = unquote(parsed.username)
    if parsed.password:
        opts["password"] = unquote(parsed.password)
    jdbc_url = template.format(
        host=parsed.hostname or "localhost",
        port=f":{parsed.port}" if parsed.port else "",
        db=(parsed.path or "/").lstrip("/"),
    )
    return jdbc_url, opts


def read_sql(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    *,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    options: dict | None = None,
    reader=None,
) -> DataFrame:
    """Read a SQL table or query through Spark's JDBC source.

    Exactly one of ``table``/``query`` is required. With
    ``partition_column`` + bounds + ``num_partitions`` the read fans out
    to N range-partitioned connections (the 100 TB shape: without it,
    JDBC is a single-connection stream and belongs only on small dims).

    ``reader`` injects the DataFrameReader seam for tests/engines
    without driver jars; defaults to ``spark.read``.
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    jdbc_url, url_opts = sqlalchemy_url_to_jdbc(url)
    opts = {**url_opts, "url": jdbc_url, "fetchsize": str(fetch_size)}
    if table is not None:
        opts["dbtable"] = table
    else:
        # subquery pushdown: the database runs the query, Spark reads rows
        opts["query"] = query
    if driver:
        opts["driver"] = driver
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        if "query" in opts:
            raise ValueError("partitioned reads require table=, not query=")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    if options:
        opts.update(options)
    reader = reader if reader is not None else spark.read
    return reader.format("jdbc").options(**opts).load()
