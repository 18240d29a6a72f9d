"""Pipeline structure analysis: execution DAG, stages, pipeline I/O schemas.

Re-expresses ``PipelineStructure`` (``src/kiara/models/module/pipeline/
structure.py:86-758``) without networkx: topological stage extraction with the
reference's default "early" layering (``stages.py:92-115`` — a step runs in
the first stage after all its producers), pipeline inputs = unlinked step
inputs (aliased per config), pipeline outputs = aliased step outputs.

Spark consequence (SURVEY §2.4): stages matter only for *driver-side
sequencing of module invocation*; data never materializes between steps —
each step's output DataFrames flow lazily into consumers, so Catalyst
optimizes the whole pipeline as one plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from .config import PipelineConfig, PipelineStep, StepValueRef


@dataclass
class PipelineInput:
    alias: str
    step_id: str
    field_name: str


@dataclass
class PipelineOutput:
    alias: str
    step_id: str
    field_name: str


class PipelineStructure:
    def __init__(self, config: PipelineConfig, module_registry):
        self.config = config
        self._modules = {
            s.step_id: module_registry.create_module(s.module_type, s.module_config)
            for s in config.steps
        }
        self._steps = {s.step_id: s for s in config.steps}
        self._validate_links()
        self.stages: list[list[str]] = self._extract_stages()
        self.pipeline_inputs: list[PipelineInput] = self._compute_inputs()
        self.pipeline_outputs: list[PipelineOutput] = self._compute_outputs()

    def step(self, step_id: str) -> PipelineStep:
        return self._steps[step_id]

    def module_for(self, step_id: str):
        return self._modules[step_id]

    # -- validation -------------------------------------------------------
    def _validate_links(self) -> None:
        for s in self.config.steps:
            for field_name, refs in s.input_links.items():
                for ref in refs:
                    if ref.step_id not in self._steps:
                        raise ValueError(
                            f"step {s.step_id!r} links {field_name!r} to unknown step {ref.step_id!r}")
                    producer = self._modules[ref.step_id]
                    if ref.value_name not in producer.outputs_schema:
                        raise ValueError(
                            f"step {s.step_id!r} links to missing output "
                            f"{ref.step_id}.{ref.value_name}")
                if field_name not in self._modules[s.step_id].inputs_schema:
                    raise ValueError(
                        f"step {s.step_id!r} has no input field {field_name!r}")

    # -- DAG layering ("early" strategy, reference stages.py:92-115) -------
    def _extract_stages(self) -> list[list[str]]:
        deps = {
            s.step_id: {ref.step_id for refs in s.input_links.values() for ref in refs}
            for s in self.config.steps
        }
        stages: list[list[str]] = []
        placed: set[str] = set()
        remaining = dict(deps)
        while remaining:
            ready = sorted(sid for sid, d in remaining.items() if d <= placed)
            if not ready:
                raise ValueError(f"cycle detected among steps: {sorted(remaining)}")
            stages.append(ready)
            placed.update(ready)
            for sid in ready:
                del remaining[sid]
        return stages

    # -- pipeline I/O -----------------------------------------------------
    def _compute_inputs(self) -> list[PipelineInput]:
        out = []
        for s in self.config.steps:
            module = self._modules[s.step_id]
            for field_name, schema in module.inputs_schema.items():
                if field_name in s.input_links:
                    continue
                # a field satisfied by the step's module_config is not a
                # pipeline input (kiara semantics: config binds before
                # inputs — mirrors _cfg()'s config-first resolution)
                if field_name in s.module_config:
                    continue
                # constants are fixed by module_config and can never be
                # supplied from outside (reference modules/__init__.py:121)
                if schema.is_constant:
                    continue
                key = f"{s.step_id}.{field_name}"
                alias = self.config.input_aliases.get(key, key.replace(".", "__"))
                out.append(PipelineInput(alias, s.step_id, field_name))
        return out

    def _compute_outputs(self) -> list[PipelineOutput]:
        if self.config.output_aliases:
            return [
                PipelineOutput(alias, *key.split(".", 1))
                for key, alias in self.config.output_aliases.items()
            ]
        # default: every terminal step output, aliased step__field
        consumed = {
            (ref.step_id, ref.value_name)
            for s in self.config.steps
            for refs in s.input_links.values()
            for ref in refs
        }
        out = []
        for s in self.config.steps:
            for field_name in self._modules[s.step_id].outputs_schema:
                if (s.step_id, field_name) not in consumed:
                    out.append(PipelineOutput(f"{s.step_id}__{field_name}", s.step_id, field_name))
        return out

    @property
    def execution_graph(self) -> dict[str, list[str]]:
        """step_id -> downstream step_ids (for explain/UI)."""
        g: dict[str, list[str]] = {s.step_id: [] for s in self.config.steps}
        for s in self.config.steps:
            for refs in s.input_links.values():
                for ref in refs:
                    if s.step_id not in g[ref.step_id]:
                        g[ref.step_id].append(s.step_id)
        return g
