"""Interactive, versioned workflows.

Re-expresses the reference's ``Workflow``
(``src/kiara/interfaces/python_api/workflow.py:144+``): an incrementally
assembled pipeline with mutable current inputs, step-wise execution, and
persisted state snapshots.  Steps accumulate into the same
``PipelineConfig`` the batch engine runs, so ``process()`` is one lazy
Catalyst plan per run, and the per-step job cache makes successive
``process()`` calls after small edits re-execute only what changed.

Snapshots are JSON records (steps + inputs + output value ids) appended to
``<base_path>/workflows/<alias>.json`` — the restart-surviving history the
reference keeps in its workflow archives.
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING, Any, Mapping

from pyspark.sql import DataFrame

if TYPE_CHECKING:
    from .context import KiaraContext
    from .values import ValueMap


class Workflow:
    def __init__(self, context: "KiaraContext", alias: str):
        self._context = context
        self.alias = alias
        self._steps: list[dict] = []
        self._input_aliases: dict[str, str] = {}
        self._output_aliases: dict[str, str] = {}
        self._inputs: dict[str, Any] = {}
        self._last_outputs: "ValueMap | None" = None
        self._snapshots: list[dict] = []
        self._path = os.path.join(context.base_path, "workflows", f"{alias}.json")
        if os.path.isfile(self._path):
            with open(self._path) as f:
                saved = json.load(f)
            self._steps = saved.get("steps", [])
            self._input_aliases = saved.get("input_aliases", {})
            self._output_aliases = saved.get("output_aliases", {})
            self._snapshots = saved.get("snapshots", [])

    # -- assembly ---------------------------------------------------------
    def add_step(
        self,
        operation: str,
        step_id: str | None = None,
        module_config: dict | None = None,
        input_links: Mapping[str, str] | None = None,
    ) -> str:
        """Append a step; ``input_links`` values are ``"step_id.field"``."""
        step_id = step_id or f"step_{len(self._steps) + 1}_{operation.replace('.', '_')}"
        if any(s["step_id"] == step_id for s in self._steps):
            raise ValueError(f"duplicate step id {step_id!r}")
        op = self._context.operation_registry.resolve(operation)
        config = dict(op.module_config)
        if module_config:
            config.update(module_config)
        self._steps.append({
            "step_id": step_id,
            "module_type": op.module_type,
            "module_config": config,
            "input_links": dict(input_links or {}),
        })
        return step_id

    def set_input(self, name: str, value: Any) -> None:
        self._inputs[name] = value

    def set_inputs(self, **values: Any) -> None:
        self._inputs.update(values)

    def alias_input(self, step_field: str, alias: str) -> None:
        self._input_aliases[step_field] = alias

    def alias_output(self, step_field: str, alias: str) -> None:
        self._output_aliases[step_field] = alias

    # -- execution --------------------------------------------------------
    @property
    def pipeline_config(self) -> dict:
        return {
            "pipeline_name": self.alias,
            "steps": [dict(s) for s in self._steps],
            "input_aliases": dict(self._input_aliases),
            "output_aliases": dict(self._output_aliases),
        }

    def process(self) -> "ValueMap":
        """Run the assembled pipeline over current inputs.  Unchanged steps
        are job-cache hits; only edited/downstream steps execute."""
        if not self._steps:
            raise ValueError("workflow has no steps")
        self._last_outputs = self._context.run_pipeline(
            self.pipeline_config, self._inputs)
        return self._last_outputs

    @property
    def current_outputs(self) -> "ValueMap | None":
        return self._last_outputs

    # -- versioning -------------------------------------------------------
    def snapshot(self, save: bool = True) -> dict:
        """Record (and by default persist) the workflow state: structure,
        scalar inputs, and output value ids of the last run."""
        snap = {
            "ts": time.time(),
            "steps": [dict(s) for s in self._steps],
            "inputs": {
                k: v for k, v in self._inputs.items()
                if not isinstance(v, DataFrame)
            },
            "outputs": {
                k: v.value_id for k, v in (self._last_outputs or {}).items()
            },
        }
        self._snapshots.append(snap)
        if save:
            os.makedirs(os.path.dirname(self._path), exist_ok=True)
            with open(self._path, "w") as f:
                json.dump({
                    "alias": self.alias,
                    "steps": self._steps,
                    "input_aliases": self._input_aliases,
                    "output_aliases": self._output_aliases,
                    "snapshots": self._snapshots,
                }, f, indent=1, default=str)
        return snap

    @property
    def snapshots(self) -> list[dict]:
        return list(self._snapshots)
