"""Connection configuration.

Reference parity: lib/pgcp_runner.rb:17,46-53 + .pgcp.yml.sample:1-11 —
a YAML map ``databases.<alias>.{user,password,dbname,host[,port]}`` with
port defaulting to 5432 (transport.rb:15-17). Same YAML shape here,
translated to a JDBC URL + properties for Spark and to a DSN for
driver-side catalog statements.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

try:
    import yaml
except ImportError:  # pyyaml is optional; JSON configs also accepted
    yaml = None

import json

DEFAULT_PORT = 5432
DEFAULT_CONFIG_PATH = "~/.pgcp.yml"


@dataclass(frozen=True)
class DbConfig:
    host: str
    dbname: str
    user: str
    password: str = ""
    port: int = DEFAULT_PORT

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.dbname}"

    @property
    def jdbc_properties(self) -> dict[str, str]:
        return {
            "user": self.user,
            "password": self.password,
            "driver": "org.postgresql.Driver",
        }


@dataclass(frozen=True)
class Config:
    databases: dict[str, DbConfig] = field(default_factory=dict)

    def database(self, alias: str) -> DbConfig:
        if alias not in self.databases:
            raise KeyError(
                f"database alias {alias!r} not in config (have: {sorted(self.databases)})"
            )
        return self.databases[alias]


def load_config(path: str | None = None) -> Config:
    """Load YAML (or JSON) config from ``path`` or ~/.pgcp.yml
    (pgcp_runner.rb:46-53)."""
    cfg_path = os.path.expanduser(path or DEFAULT_CONFIG_PATH)
    with open(cfg_path) as f:
        text = f.read()
    if yaml is not None:
        raw = yaml.safe_load(text)
    else:
        raw = json.loads(text)
    return parse_config(raw)


def parse_config(raw: dict) -> Config:
    dbs = {}
    for alias, c in (raw.get("databases") or {}).items():
        dbs[alias] = DbConfig(
            host=c["host"],
            dbname=c["dbname"],
            user=c["user"],
            password=str(c.get("password", "")),
            port=int(c.get("port", DEFAULT_PORT)),
        )
    return Config(databases=dbs)
