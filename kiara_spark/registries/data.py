"""Data registry: value catalog, aliases, and the Parquet warehouse.

Re-expresses the reference's DataRegistry + alias registry + data stores
(``src/kiara/registries/data/__init__.py``, ``registries/aliases``,
``data_store/filesystem_store.py``) as: an in-memory value catalog, an alias
map (``alias -> value_id``), and a Parquet warehouse directory for persisted
table values with JSON sidecar metadata (pedigree, schema, hash).

Value dedup on store (reference ``data/__init__.py:848-948``): a value whose
content hash already exists in the warehouse is not re-written — the existing
dataset is reused.  For DataFrame values this costs one hashing scan; callers
can opt out (``dedup=False``) when the scan is not worth it (huge one-off
writes).
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

from ..values import ORPHAN, Value, ValueSchema

if TYPE_CHECKING:
    from ..context import KiaraContext


class DataRegistry:
    def __init__(self, context: "KiaraContext", warehouse_path: str | None = None):
        self._context = context
        self._values: dict[str, Value] = {}
        self._aliases: dict[str, str] = {}  # alias -> value_id
        self._hash_index: dict[str, str] = {}  # content_hash -> store path
        self._scalar_index: dict[str, str] = {}  # scalar content_hash -> value_id
        self.warehouse_path = warehouse_path or os.path.join(
            context.base_path, "warehouse"
        )
        os.makedirs(self.warehouse_path, exist_ok=True)
        self._load_hash_index()
        # alias -> dataset path for persisted values (survives restarts;
        # reference alias archives, ``registries/aliases/__init__.py:98+``).
        self._stored_aliases: dict[str, str] = {}
        self._load_stored_aliases()

    # -- registration -----------------------------------------------------
    def register_data(
        self, data, data_type: str = "table", pedigree=ORPHAN, schema: ValueSchema | None = None
    ) -> Value:
        schema = schema or ValueSchema(type=data_type)
        dtype = self._context.type_registry.get(schema.type, **schema.type_config)
        value = Value(data=dtype.validate(data), schema=schema, pedigree=pedigree)
        # scalar dedup-by-content on registration (reference
        # data/__init__.py:848-948): identical scalar inputs resolve to the
        # SAME value id, which is what makes the value_id job-cache strategy
        # hit across repeated binds.  DataFrames are exempt here (hashing
        # them costs a scan — that's the opt-in data_hash strategy).
        if not isinstance(value.data, DataFrame):
            try:
                key = value.content_hash()
            except Exception:
                key = None
            if key is not None:
                if key in self._scalar_index:
                    return self._values[self._scalar_index[key]]
                self._scalar_index[key] = value.value_id
        self._values[value.value_id] = value
        return value

    def register_value(self, value: Value) -> Value:
        self._values[value.value_id] = value
        return value

    # -- resolution (reference data/__init__.py:123-207) ------------------
    def get_value(self, ref: str | Value) -> Value:
        """Resolve ``Value`` | ``value:<uuid>`` | ``alias:<name>`` | bare
        alias/uuid.  Aliases persisted in a previous context load lazily from
        the warehouse on first reference."""
        if isinstance(ref, Value):
            return ref
        if ref.startswith("value:"):
            ref = ref[len("value:"):]
        elif ref.startswith("alias:"):
            ref = self._resolve_alias(ref[len("alias:"):])
        elif ref in self._aliases or ref in self._stored_aliases:
            ref = self._resolve_alias(ref)
        if ref not in self._values:
            raise KeyError(f"no value for ref {ref!r}")
        return self._values[ref]

    def _resolve_alias(self, alias: str) -> str:
        if alias in self._aliases:
            return self._aliases[alias]
        if alias in self._stored_aliases:
            value = self.load_value(self._stored_aliases[alias])
            self._aliases[alias] = value.value_id
            return value.value_id
        raise KeyError(f"no alias {alias!r}")

    # -- aliases ----------------------------------------------------------
    def register_alias(self, alias: str, value: Value | str) -> None:
        value_id = value.value_id if isinstance(value, Value) else value
        self._aliases[alias] = value_id

    @property
    def aliases(self) -> dict[str, str]:
        out = {a: f"stored:{p}" for a, p in self._stored_aliases.items()}
        out.update(self._aliases)
        return out

    def _aliases_file(self) -> str:
        return os.path.join(self.warehouse_path, "_aliases.json")

    def _load_stored_aliases(self) -> None:
        if os.path.isfile(self._aliases_file()):
            with open(self._aliases_file()) as f:
                self._stored_aliases = json.load(f)

    def _persist_alias(self, alias: str, path: str) -> None:
        self._stored_aliases[alias] = path
        with open(self._aliases_file(), "w") as f:
            json.dump(self._stored_aliases, f, indent=1, sort_keys=True)

    # -- persistence ------------------------------------------------------
    def _sidecar(self, path: str) -> str:
        return os.path.join(path, "_kiara_value.json")

    def _load_hash_index(self) -> None:
        if not os.path.isdir(self.warehouse_path):
            return
        for name in os.listdir(self.warehouse_path):
            meta = self._sidecar(os.path.join(self.warehouse_path, name))
            if os.path.isfile(meta):
                with open(meta) as f:
                    info = json.load(f)
                if h := info.get("content_hash"):
                    self._hash_index[h] = os.path.join(self.warehouse_path, name)

    def store_value(self, value: Value, alias: str | None = None, dedup: bool = True) -> str:
        """Persist a table value to the warehouse; returns the dataset path.

        Dedup-by-hash mirrors reference ``_find_existing_value``; the sidecar
        records pedigree so lineage survives restarts.
        """
        if not isinstance(value.data, DataFrame):
            raise TypeError("store_value currently persists table values only")
        content_hash = value.content_hash() if dedup else None
        if content_hash and content_hash in self._hash_index:
            path = self._hash_index[content_hash]
        else:
            path = os.path.join(self.warehouse_path, value.value_id)
            value.data.write.mode("overwrite").parquet(path)
            with open(self._sidecar(path), "w") as f:
                json.dump(
                    {
                        "value_id": value.value_id,
                        "type": value.schema.type,
                        "content_hash": content_hash,
                        "pedigree": {
                            "module_type": value.pedigree.module_type,
                            "module_config": value.pedigree.module_config,
                            "inputs": dict(value.pedigree.inputs),
                        },
                        "spark_schema": value.data.schema.jsonValue(),
                    },
                    f,
                )
            if content_hash:
                self._hash_index[content_hash] = path
        if alias:
            self.register_alias(alias, value)
            self._persist_alias(alias, path)
        return path

    def load_value(self, path: str) -> Value:
        """Rehydrate a stored table value (lazy — just a parquet scan plan).
        Pedigree from the sidecar is restored so lineage survives restarts."""
        from ..values import ValuePedigree

        df = self._context.spark.read.parquet(path)
        meta_path = self._sidecar(path)
        info = {}
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                info = json.load(f)
        ped = ORPHAN
        if p := info.get("pedigree"):
            if p.get("module_type") and p["module_type"] != ORPHAN.module_type:
                ped = ValuePedigree(
                    module_type=p["module_type"],
                    module_config=p.get("module_config") or {},
                    inputs=p.get("inputs") or {},
                )
        value = Value(
            data=df,
            schema=ValueSchema(type=info.get("type", "table")),
            value_id=info.get("value_id"),
            pedigree=ped,
        )
        self._values[value.value_id] = value
        return value

    # -- lineage (reference value.py:917-925) ------------------------------
    def lineage(self, value: Value | str, _depth: int = 0) -> dict:
        """Walk pedigree records into a nested provenance tree."""
        v = self.get_value(value)
        node = {
            "value_id": v.value_id,
            "type": v.schema.type,
            "module": v.pedigree.module_type,
        }
        if not v.pedigree.is_orphan and _depth < 50:
            node["inputs"] = {
                k: self.lineage(vid, _depth + 1) if vid in self._values else {"value_id": vid}
                for k, vid in v.pedigree.inputs.items()
            }
        return node
