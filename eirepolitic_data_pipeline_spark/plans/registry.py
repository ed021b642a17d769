"""Config-driven table registry — SURVEY §1.3.

The reference declares 31 tables in YAML (`configs/oireachtas/tables.yml`,
loader `extract/oireachtas/schemas.py:37-65`) with names only (untyped) and
separate write policies (`write_policies.yml`). Here the registry is typed:
each column maps to a Spark type, compiled once to a StructType; write
policies and FK edges ride along on the TableDef.

Layer inference mirrors `schemas.py:68-76`: a table name's prefix
(raw_/silver_/gold_/control_) decides its medallion layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.merge import WritePolicy

_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "array<string>": T.ArrayType(T.StringType()),
    "array<float>": T.ArrayType(T.FloatType()),
    "array<double>": T.ArrayType(T.DoubleType()),
}

LAYERS = ("raw", "silver", "gold", "control")


def infer_layer(table_name: str) -> str:
    for layer in LAYERS:
        if table_name.startswith(layer + "_"):
            return layer
    return "silver"


@dataclass(frozen=True)
class TableDef:
    name: str
    columns: Sequence[tuple[str, str]]  # (name, type-name)
    policy: WritePolicy
    layer: str = ""
    cadence: str = "weekly"
    endpoint: Optional[str] = None
    #: storage clustering for merge-heavy fact tables: persist bucketed on
    #: these keys so every refresh's merge plans without re-shuffling the
    #: table (io/bucketing.py; the catalog records it in the manifest)
    bucket_keys: Sequence[str] = ()

    @property
    def schema(self) -> T.StructType:
        return T.StructType([
            T.StructField(cname, _TYPE_MAP.get(ctype, T.StringType()), True)
            for cname, ctype in self.columns
        ])

    @property
    def column_names(self) -> list[str]:
        return [c for c, _ in self.columns]

    def conform(self, df):
        """Declared-schema projection (reference P1 `reindex(columns=...)`):
        select declared columns in order, add missing as typed nulls, cast
        present ones to the declared type. Declared schema wins."""
        cols = []
        present = set(df.columns)
        for cname, ctype in self.columns:
            spark_t = _TYPE_MAP.get(ctype, T.StringType())
            if cname in present:
                # try_cast, not cast: silver rows are strings with blank ==
                # missing; ANSI cast('' AS DATE) throws, while the reference
                # coerces unparseable values to null (errors="coerce").
                cols.append(F.col(cname).try_cast(spark_t).alias(cname))
            else:
                cols.append(F.lit(None).cast(spark_t).alias(cname))
        return df.select(*cols)


class TableRegistry:
    """Loads {tables: {name: {columns, primary_key, ...}}} YAML (or an
    equivalent dict) into TableDefs."""

    def __init__(self, tables: dict[str, TableDef]):
        self.tables = tables

    @classmethod
    def from_dict(cls, cfg: dict) -> "TableRegistry":
        out: dict[str, TableDef] = {}
        for name, spec in cfg.get("tables", {}).items():
            raw_cols = spec.get("columns", [])
            columns = []
            for c in raw_cols:
                if isinstance(c, str):
                    columns.append((c, "string"))
                else:  # {name: type}
                    ((cname, ctype),) = c.items()
                    # validate at LOAD, not at use: an unknown type name
                    # (a 'biginteger' typo) silently becoming string would
                    # make downstream numeric comparisons lexicographic
                    # with nothing flagging the misdeclaration
                    if ctype not in _TYPE_MAP:
                        raise ValueError(
                            f"table {name!r} column {cname!r}: unknown "
                            f"type {ctype!r}; expected one of "
                            f"{sorted(_TYPE_MAP)}")
                    columns.append((cname, ctype))
            pol = spec.get("write_policy", {})
            policy = WritePolicy(
                mode=pol.get("mode", "snapshot_replace"),
                primary_key=tuple(spec.get("primary_key", [])),
                business_key=tuple(pol.get("business_key", [])),
                valid_from=pol.get("valid_from"),
                valid_to=pol.get("valid_to"),
                is_current=pol.get("is_current"),
                foreign_keys=tuple(
                    (fk["column"], fk["parent_table"], fk["parent_column"],
                     bool(fk.get("nullable", False)))
                    for fk in pol.get("foreign_keys", [])),
            )
            layer = spec.get("layer", infer_layer(name))
            if layer not in LAYERS:
                raise ValueError(
                    f"table {name!r}: unknown layer {layer!r}; expected "
                    f"one of {LAYERS} (in_build_order ranks by layer)")
            out[name] = TableDef(
                name=name, columns=tuple(columns), policy=policy,
                layer=layer,
                cadence=spec.get("cadence", "weekly"),
                endpoint=spec.get("endpoint"),
                bucket_keys=tuple(spec.get("bucket_by", [])),
            )
        return cls(out)

    @classmethod
    def from_yaml(cls, path: str) -> "TableRegistry":
        try:
            import yaml  # provided transitively by pyspark deps when present
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "pyyaml not available; use TableRegistry.from_dict or install pyyaml"
            ) from e
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))

    def __getitem__(self, name: str) -> TableDef:
        return self.tables[name]

    def in_build_order(self) -> list[TableDef]:
        """Reference refresh ordering (`oireachtas_refresh_inputs.py:102-107`):
        silver dims → gold → control tables forced to the tail."""
        rank = {"raw": 0, "silver": 1, "gold": 2, "control": 3}
        return sorted(self.tables.values(), key=lambda td: (rank[td.layer], td.name))
