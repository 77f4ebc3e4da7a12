"""Driver-side PostgreSQL client protocol.

The reference opens a fresh libpq connection per catalog call
(postgres.rb:288-298 ``with_connection``) — ~6-10 connects per table copy.
Here one client = one long-lived JDBC connection reused for every metadata
query and DDL statement of a copy run; only row transfer goes through Spark
executors.

``JvmJdbcClient`` rides Spark's own JVM (java.sql.DriverManager via py4j),
so the PostgreSQL JDBC driver jar that the executors use for the bulk
transfer also serves the driver-side catalog calls — no extra Python
dependency (psycopg2 is deliberately not required).
"""

from __future__ import annotations

import threading
from typing import Any, Protocol


class PgClient(Protocol):
    """What transport/catalog need from a connection. Tests provide fakes."""

    def fetch(self, sql: str) -> list[tuple]:
        """Run a query, return all rows."""
        ...

    def execute(self, sql: str) -> None:
        """Run a statement (DDL/DML), autocommit."""
        ...

    def execute_transaction(self, statements: list[str]) -> None:
        """Run statements atomically (BEGIN … COMMIT, rollback on error)."""
        ...


class JvmJdbcClient:
    """PgClient over Spark's JVM JDBC (py4j → java.sql).

    Requires the PostgreSQL JDBC driver on the Spark classpath
    (spark.jars / spark.jars.packages org.postgresql:postgresql).
    """

    def __init__(self, spark: Any, jdbc_url: str, user: str, password: str):
        self._jvm = spark._jvm
        props = self._jvm.java.util.Properties()
        props.setProperty("user", user)
        props.setProperty("password", password)
        self._conn = self._jvm.java.sql.DriverManager.getConnection(jdbc_url, props)
        # One java.sql.Connection serves all driver-side calls; statements
        # from concurrent copy threads must not interleave with a
        # transaction's autocommit toggling (a thread's DDL joining another
        # thread's open transaction would be absorbed by its rollback).
        self._lock = threading.RLock()

    def fetch(self, sql: str) -> list[tuple]:
        with self._lock:
            stmt = self._conn.createStatement()
            try:
                rs = stmt.executeQuery(sql)
                ncols = rs.getMetaData().getColumnCount()
                rows = []
                while rs.next():
                    rows.append(tuple(rs.getObject(i + 1) for i in range(ncols)))
                return rows
            finally:
                stmt.close()

    def execute(self, sql: str) -> None:
        with self._lock:
            stmt = self._conn.createStatement()
            try:
                stmt.execute(sql)
            finally:
                stmt.close()

    def execute_transaction(self, statements: list[str]) -> None:
        # hold the lock for the WHOLE transaction so no other thread's
        # statement joins it
        with self._lock:
            self._conn.setAutoCommit(False)
            try:
                for sql in statements:
                    stmt = self._conn.createStatement()
                    try:
                        stmt.execute(sql)
                    finally:
                        stmt.close()
                self._conn.commit()
            except Exception:
                self._conn.rollback()
                raise
            finally:
                self._conn.setAutoCommit(True)

    def close(self) -> None:
        self._conn.close()
