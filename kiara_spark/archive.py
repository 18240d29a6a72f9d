"""Portable value archives — the reference's ``.kiarchive`` export/import
surface (``src/kiara/interfaces/python_api/base_api.py`` export_values /
import_archive; golden-file tests ``tests/test_archives/``) re-expressed for
a Parquet world.

An archive is a plain directory (trivially tar-able):

    archive/
      manifest.json            # archive-level metadata + alias map + lineage
      values/<value_id>/       # one Parquet dataset per exported table value
        ...parquet files...

Export walks the pedigree chain and records the full provenance tree in the
manifest; datasets are exported for the requested values (lineage ancestors
are recorded as metadata-only nodes unless ``include_ancestors``).  Import
registers every shipped dataset in the target context and restores aliases.

Scale note: export/import move data through ``DataFrameWriter``/``read`` —
distributed Parquet IO, no driver materialization; the manifest is tiny
driver-side JSON.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

from .values import ORPHAN, Value, ValuePedigree, ValueSchema

if TYPE_CHECKING:
    from .context import KiaraContext

MANIFEST_NAME = "manifest.json"
ARCHIVE_FORMAT_VERSION = 1


def export_archive(
    context: "KiaraContext",
    refs: list[str] | dict[str, str],
    archive_path: str,
    include_ancestors: bool = True,
) -> dict:
    """Export values (by alias/uuid ref) into a portable archive directory.

    ``refs``: list of refs (aliases become archive aliases) or a mapping
    ``archive_alias -> ref``.  Returns the manifest dict.
    """
    if isinstance(refs, list):
        refs = {r: r for r in refs}
    os.makedirs(os.path.join(archive_path, "values"), exist_ok=True)

    exported: dict[str, dict] = {}
    aliases: dict[str, str] = {}

    def _export_value(value: Value, ship_data: bool) -> None:
        if value.value_id in exported:
            return
        node = {
            "value_id": value.value_id,
            "type": value.schema.type,
            "pedigree": {
                "module_type": value.pedigree.module_type,
                "module_config": value.pedigree.module_config,
                "inputs": dict(value.pedigree.inputs),
            },
            "has_data": False,
        }
        if ship_data and isinstance(value.data, DataFrame):
            dest = os.path.join(archive_path, "values", value.value_id)
            value.data.write.mode("overwrite").parquet(dest)
            node["has_data"] = True
            node["spark_schema"] = value.data.schema.jsonValue()
        exported[value.value_id] = node
        if not value.pedigree.is_orphan:
            for upstream_id in value.pedigree.inputs.values():
                try:
                    upstream = context.data_registry.get_value(upstream_id)
                except KeyError:
                    continue
                _export_value(upstream, ship_data=include_ancestors)

    for archive_alias, ref in refs.items():
        value = context.data_registry.get_value(ref)
        aliases[archive_alias] = value.value_id
        _export_value(value, ship_data=True)

    manifest = {
        "format_version": ARCHIVE_FORMAT_VERSION,
        "aliases": aliases,
        "values": exported,
    }
    with open(os.path.join(archive_path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def import_archive(context: "KiaraContext", archive_path: str,
                   alias_prefix: str = "") -> dict[str, Value]:
    """Import an archive: register every shipped dataset (lazy parquet scans)
    and restore aliases (optionally prefixed).  Returns alias -> Value."""
    with open(os.path.join(archive_path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != ARCHIVE_FORMAT_VERSION:
        raise ValueError(
            f"unsupported archive format {manifest.get('format_version')!r}")

    loaded: dict[str, Value] = {}
    for value_id, node in manifest["values"].items():
        if not node.get("has_data"):
            continue
        df = context.spark.read.parquet(
            os.path.join(archive_path, "values", value_id))
        ped = ORPHAN
        p = node.get("pedigree") or {}
        if p.get("module_type") and p["module_type"] != ORPHAN.module_type:
            ped = ValuePedigree(module_type=p["module_type"],
                                module_config=p.get("module_config") or {},
                                inputs=p.get("inputs") or {})
        value = Value(data=df, schema=ValueSchema(type=node.get("type", "table")),
                      value_id=value_id, pedigree=ped)
        context.data_registry.register_value(value)
        loaded[value_id] = value

    out: dict[str, Value] = {}
    for alias, value_id in manifest["aliases"].items():
        if value_id in loaded:
            name = f"{alias_prefix}{alias}"
            context.data_registry.register_alias(name, value_id)
            out[name] = loaded[value_id]
    return out
