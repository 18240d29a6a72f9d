"""KiaraContext: the engine's session object.

One SparkSession + four registries (types, modules/operations, data, jobs) +
a driver-side runner: bind inputs -> cache probe -> compose lazy DataFrames ->
record pedigree.  Mirrors the reference's API surface (``run_job``,
``queue_job``, operations, aliases — ``src/kiara/interfaces/python_api/
kiara_api.py:105-147``) while Spark does all data-parallel execution.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession

from .datatypes import TypeRegistry
from .modules import KiaraModule, ModuleRegistry
from .operations import OperationRegistry
from .registries.data import DataRegistry
from .registries.jobs import JobRegistry
from .values import Value, ValueMap
from .session import build_spark, configure_existing


class KiaraContext:
    def __init__(
        self,
        spark: SparkSession | None = None,
        base_path: str | None = None,
        cache_strategy: str | None = None,
        runtime_profile: str | None = None,
    ):
        cache_strategy = (cache_strategy
                          or os.environ.get("KIARA_SPARK_CACHE", "value_id"))
        # Runtime profile (reference KiaraRuntimeConfig.runtime_profile,
        # context/runtime_config.py:35-38): under "dharpa" the API requires
        # a job comment and force-persists outputs (base_api.py:2923-2934)
        # — the DH provenance discipline.  Deliberate deviation: the
        # reference DEFAULTS to "dharpa"; here the default is "default"
        # (opt in via KIARA_SPARK_RUNTIME_PROFILE=dharpa) so programmatic
        # engine use is not comment-gated.
        runtime_profile = (runtime_profile
                           or os.environ.get("KIARA_SPARK_RUNTIME_PROFILE")
                           or "default")
        if runtime_profile not in ("default", "dharpa"):
            raise ValueError(
                f"unknown runtime profile {runtime_profile!r} "
                f"(expected 'default' or 'dharpa')")
        self.runtime_profile = runtime_profile
        self.spark = configure_existing(spark) if spark else build_spark()
        # KIARA_SPARK_HOME makes contexts durable across processes (the
        # reference's context directory); default is an ephemeral tempdir.
        self.base_path = (base_path or os.environ.get("KIARA_SPARK_HOME")
                          or tempfile.mkdtemp(prefix="kiara_spark_"))
        os.makedirs(self.base_path, exist_ok=True)

        self.type_registry = TypeRegistry()
        self.module_registry = ModuleRegistry()
        self.operation_registry = OperationRegistry(self.module_registry)
        self.data_registry = DataRegistry(self)
        self.job_registry = JobRegistry(self, strategy=cache_strategy)

        from . import operators  # registers all built-in modules/operations

        operators.register_all(self)

        # third-party extension seam: load kiara_spark.{modules,data_types,
        # operations,plugin} entry points, mirroring the reference's
        # pyproject.toml:129-193 + src/kiara/utils/class_loading.py
        from .plugins import discover_entry_point_plugins

        self.plugin_infos = discover_entry_point_plugins(self)
        self._render_registry = None

    @property
    def render_registry(self):
        """Template renderers (pipeline/value/operation -> html/markdown),
        built lazily — reference RenderRegistry
        (``src/kiara/registries/rendering/__init__.py``)."""
        if self._render_registry is None:
            from .renderers import RenderRegistry

            self._render_registry = RenderRegistry(self)
        return self._render_registry

    # -- input binding (reference analyze/bind phase, base_api queue_manifest) --
    def _bind_inputs(self, module: KiaraModule, inputs: Mapping[str, Any]) -> ValueMap:
        from .modules import InvalidInputsError

        bound: dict[str, Value] = {}
        for field_name, schema in module.inputs_schema.items():
            if schema.is_constant:
                if field_name in inputs:
                    raise InvalidInputsError(
                        {field_name: "field is a constant, can't be set"})
                raw = schema.default
            elif field_name in inputs:
                raw = inputs[field_name]
                # an explicit None for an OPTIONAL field means "not set"
                # (reference SpecialValue semantics, utils/rendering.py:38-40
                # — rendered scripts bind None for unset optional inputs);
                # required fields keep the missing-required error path
                if raw is None and schema.optional:
                    continue
            elif schema.default is not None:
                raw = schema.default
            else:
                continue  # missing-required check happens in module.run
            if isinstance(raw, Value):
                bound[field_name] = raw
            elif isinstance(raw, str) and (
                raw.startswith(("alias:", "value:"))
                or (
                    # bare-name alias resolution only where the schema wants
                    # a non-scalar: a literal string input that happens to
                    # collide with an alias must stay a string
                    schema.type not in ("string", "bytes", "integer",
                                        "float", "boolean", "dict", "none")
                    and raw in self.data_registry.aliases
                )
            ):
                # value-ref resolution at bind time (reference
                # ``registries/data/__init__.py:123-207``)
                bound[field_name] = self.data_registry.get_value(raw)
            else:
                bound[field_name] = self.data_registry.register_data(
                    raw, data_type=schema.type, schema=schema
                )
        return ValueMap(bound)

    # -- public API -------------------------------------------------------
    def create_module(self, module_type: str, module_config: dict | None = None) -> KiaraModule:
        return self.module_registry.create_module(module_type, module_config)

    def run_job(
        self,
        operation: str,
        inputs: Mapping[str, Any] | None = None,
        operation_config: dict | None = None,
        save: str | None = None,
    ) -> ValueMap:
        """Resolve operation/module name, bind, cache-probe, execute.

        ``save``: persist table outputs to the warehouse under this alias
        (``<save>.<field>`` when several) AND archive the job record, so an
        identical job in a future context is a cache hit without executing
        (reference ``kiara run --save`` + job archives)."""
        op = self.operation_registry.resolve(operation)
        config = dict(op.module_config)
        if operation_config:
            config.update(operation_config)
        module = self.create_module(op.module_type, config)
        bound = self._bind_inputs(module, inputs or {})
        record = self.job_registry.execute_job(module, bound)
        if save:
            self.job_registry.persist_record(record)
            fields = [n for n, v in record.outputs.items()
                      if isinstance(v.data, DataFrame)]
            for n in fields:
                alias = save if len(fields) == 1 else f"{save}.{n}"
                self.data_registry.store_value(record.outputs[n], alias=alias)
        return record.outputs

    def run_pipeline(self, config, inputs: Mapping[str, Any] | None = None) -> ValueMap:
        """Execute a pipeline config/dict/file with per-step cache probes."""
        from .pipeline.runner import run_pipeline as _run

        return _run(self, config, inputs or {})

    def queue_job(self, operation: str, inputs: Mapping[str, Any] | None = None, **kw):
        """Alias for run_job — execution is lazy DataFrame composition, so
        'queueing' and 'running' coincide on the driver; Spark defers real work."""
        return self.run_job(operation, inputs, **kw)

    # -- convenience ------------------------------------------------------
    def register_table(self, df: DataFrame, alias: str | None = None) -> Value:
        v = self.data_registry.register_data(df, data_type="table")
        if alias:
            self.data_registry.register_alias(alias, v)
        return v

    def load_tables(self, sf_dir: str, tables: list[str] | None = None) -> dict[str, Value]:
        """Register the standard testdata tables as aliased values."""
        from .io import load_tables as _load

        out = {}
        for t, df in _load(self.spark, sf_dir, tables).items():
            out[t] = self.register_table(df, alias=t)
            df.createOrReplaceTempView(t)
        return out

    def get_value(self, ref) -> Value:
        return self.data_registry.get_value(ref)

    def store_value(self, ref, alias: str | None = None) -> str:
        """Persist a value to the warehouse (dedup by content hash);
        optionally under a restart-surviving alias."""
        return self.data_registry.store_value(self.get_value(ref), alias=alias)

    def export_archive(self, refs, archive_path: str, **kw) -> dict:
        """Export values + lineage into a portable archive directory
        (reference ``.kiarchive``; ``tests/test_archives``)."""
        from .archive import export_archive as _export

        return _export(self, refs, archive_path, **kw)

    def import_archive(self, archive_path: str, alias_prefix: str = "",
                       **kw) -> dict:
        from .archive import import_archive as _import

        return _import(self, archive_path, alias_prefix=alias_prefix, **kw)

    @property
    def operations(self) -> list[str]:
        return self.operation_registry.operation_ids

    @property
    def modules(self) -> list[str]:
        return self.module_registry.module_type_names
