"""PgClient over the ``psql`` CLI — the zero-dependency driver-side client.

The reference shells out to psql for everything (lib/pgcp/transport.rb:66-110
drives ``psql -c 'COPY ... TO STDOUT' | psql -c 'COPY ... FROM STDIN'``).
``JvmJdbcClient`` (client.py) is the first-choice client here, but it needs
the PostgreSQL JDBC driver jar on Spark's classpath; this client needs only
the ``psql`` binary, so catalog introspection, DDL, and the COPY transfer
path (copy_csv.py) can run end-to-end with no extra jars or Python drivers.

Intended for CATALOG/DDL/metadata statements (the only place transport uses
``fetch``); bulk rows move via COPY, never through ``fetch``. Because psql
output is untyped text, ``fetch`` applies coercion rules (int/float/bool/
NULL below) that are exact for pg_catalog/information_schema queries and
MIN/MAX bounds, but would mis-type a user TEXT value that happens to equal
``t``/``f`` or look numeric — don't use it as a general row reader.
"""

from __future__ import annotations

import re
import subprocess

from pgcp_spark.config import DbConfig

# psql prints NULL as this marker (set via \pset null) so NULL, empty
# string, and the literal letters stay distinguishable in -A output
NULL_MARKER = "\\N[NULL]"
_FIELD_SEP = "\x1f"  # ASCII unit separator: never appears in identifiers
_INT_RE = re.compile(r"^-?\d+$")
_FLOAT_RE = re.compile(r"^-?\d+\.\d+([eE][+-]?\d+)?$")


def _coerce(value: str):
    if value == NULL_MARKER:
        return None
    if value == "t":
        return True
    if value == "f":
        return False
    if _INT_RE.match(value):
        return int(value)
    if _FLOAT_RE.match(value):
        return float(value)
    return value


class PsqlCliClient:
    """PgClient implementation backed by one ``psql`` subprocess per call.

    Matches the reference's process model (a fresh connection per statement,
    postgres.rb:288-298) rather than JvmJdbcClient's long-lived connection —
    acceptable for the handful of metadata calls per table copy.
    """

    def __init__(self, cfg: DbConfig):
        self.cfg = cfg

    # ---------------- PgClient protocol ----------------

    def fetch(self, sql: str) -> list[tuple]:
        out = self._run(["-A", "-t", "-F", _FIELD_SEP, "-P", f"null={NULL_MARKER}", "-c", sql])
        rows = []
        for line in out.splitlines():
            rows.append(tuple(_coerce(v) for v in line.split(_FIELD_SEP)))
        return rows

    def execute(self, sql: str) -> None:
        self._run(["-c", sql])

    def execute_transaction(self, statements: list[str]) -> None:
        # One psql invocation, explicit BEGIN/COMMIT, ON_ERROR_STOP: on any
        # failure psql exits before COMMIT and the server rolls back — the
        # same atomicity JvmJdbcClient gets from setAutoCommit(False).
        script = "BEGIN;\n" + ";\n".join(statements) + ";\nCOMMIT;\n"
        self._run([], stdin=script)

    # ---------------- internals ----------------

    def base_args(self) -> list[str]:
        cfg = self.cfg
        return [
            "psql",
            "-X",  # ignore ~/.psqlrc
            "-q",
            "-v",
            "ON_ERROR_STOP=1",
            "-h",
            cfg.host,
            "-p",
            str(cfg.port),
            "-U",
            cfg.user,
            "-d",
            cfg.dbname,
        ]

    def _run(self, args: list[str], stdin: str | None = None) -> str:
        proc = subprocess.run(
            self.base_args() + args,
            input=stdin,
            capture_output=True,
            text=True,
            env={"PGPASSWORD": self.cfg.password, "PATH": "/usr/bin:/usr/local/bin:/bin"},
        )
        if proc.returncode != 0:
            raise RuntimeError(f"psql failed ({proc.returncode}): {proc.stderr.strip()}")
        return proc.stdout
