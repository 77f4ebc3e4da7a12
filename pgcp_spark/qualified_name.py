"""Schema-qualified table names.

Reference parity: lib/pgcp/qualified_name.rb:1-21 — the reference's only
first-class data object. Accepts either ("schema", "table") or one
"schema.table" string; str() renders the qualified form.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class QualifiedName:
    schema_name: str
    table_name: str

    @classmethod
    def parse(cls, name: str, table_name: str | None = None) -> QualifiedName:
        """qualified_name.rb:4-12 semantics: two args → (schema, table);
        one arg → split on the first '.'; no dot → schema 'public'."""
        if table_name is not None:
            return cls(name, table_name)
        if "." in name:
            schema, _, table = name.partition(".")
            if not schema or not table:
                raise ValueError(f"invalid qualified name: {name!r}")
            return cls(schema, table)
        if not name:
            raise ValueError("qualified name cannot be empty")
        return cls("public", name)

    def __str__(self) -> str:
        return f"{self.schema_name}.{self.table_name}"

    @property
    def quoted(self) -> str:
        """Identifier-quoted form — the reference interpolates names raw
        (SURVEY.md Q6, injection-prone); we always quote."""
        return f'{quote_ident(self.schema_name)}.{quote_ident(self.table_name)}'


def quote_ident(ident: str) -> str:
    """PostgreSQL identifier quoting (doubles embedded quotes)."""
    escaped = ident.replace('"', '""')
    return f'"{escaped}"'


def quote_literal(text: str) -> str:
    """PostgreSQL string-literal quoting for catalog predicates."""
    escaped = text.replace("'", "''")
    return f"'{escaped}'"
