"""Pipeline configuration: kiara's JSON/YAML pipeline format.

Re-expresses ``PipelineConfig`` / ``PipelineStep``
(``src/kiara/models/module/pipeline/__init__.py:474-806``): a pipeline is a
list of steps (module_type + module_config + input_links) plus optional
input/output aliases.  Formats accepted, mirroring the reference's examples
(``tests/resources/pipelines/logic/logic_2.json``):

{
  "pipeline_name": "logic_2",
  "steps": [
    {"module_type": "logic.and", "step_id": "and_1"},
    {"module_type": "logic.and", "step_id": "and_2",
     "input_links": {"a": "and_1.y"}}
  ],
  "input_aliases":  {"and_1.a": "a", "and_1.b": "b", "and_2.b": "c"},
  "output_aliases": {"and_2.y": "y"}
}

Input link values may be ``"step.field"`` strings or lists of them.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Mapping


@dataclass(frozen=True)
class StepValueRef:
    """A ``step_id.output_field`` reference (reference value_refs.py)."""

    step_id: str
    value_name: str

    @classmethod
    def parse(cls, ref: str) -> "StepValueRef":
        step_id, _, value_name = ref.partition(".")
        if not value_name:
            raise ValueError(f"invalid step ref {ref!r}, want 'step_id.field'")
        return cls(step_id, value_name)


@dataclass
class PipelineStep:
    step_id: str
    module_type: str
    module_config: dict = field(default_factory=dict)
    # field -> upstream refs; >1 ref means the inputs merge into a list
    # (reference allows list-valued input_links, pipeline/__init__.py:474+)
    input_links: dict[str, list[StepValueRef]] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, data: Mapping) -> "PipelineStep":
        raw_links = data.get("input_links", {}) or {}
        links = {}
        for field_name, ref in raw_links.items():
            refs = ref if isinstance(ref, list) else [ref]
            if not refs:
                raise ValueError(f"empty input_links list for {field_name!r}")
            links[field_name] = [StepValueRef.parse(r) for r in refs]
        step_id = data.get("step_id") or data["module_type"].replace(".", "_")
        return cls(
            step_id=step_id,
            module_type=data["module_type"],
            module_config=dict(data.get("module_config", {}) or {}),
            input_links=links,
        )


@dataclass
class PipelineConfig:
    pipeline_name: str
    steps: list[PipelineStep]
    input_aliases: dict[str, str] = field(default_factory=dict)   # "step.field" -> alias
    output_aliases: dict[str, str] = field(default_factory=dict)  # "step.field" -> alias
    doc: str = ""

    @staticmethod
    def _normalize_alias_keys(aliases: Mapping, step_ids: list[str]) -> dict[str, str]:
        """Accept both this engine's ``step.field`` alias keys and the
        reference's ``step__field`` form (``pipeline/__init__.py:446-471``).
        Step ids may themselves contain underscores, so ``__`` keys resolve
        by longest-step-id match."""
        out: dict[str, str] = {}
        by_len = sorted(step_ids, key=len, reverse=True)
        for key, alias in (aliases or {}).items():
            if "." not in key and "__" in key:
                for sid in by_len:
                    if key.startswith(f"{sid}__"):
                        key = f"{sid}.{key[len(sid) + 2:]}"
                        break
                else:
                    raise ValueError(f"alias key {key!r} matches no step id")
            out[key] = alias
        return out

    @classmethod
    def from_config(cls, data: Mapping) -> "PipelineConfig":
        steps = [PipelineStep.from_dict(s) for s in data["steps"]]
        ids = [s.step_id for s in steps]
        if len(set(ids)) != len(ids):
            raise ValueError(f"duplicate step ids: {ids}")
        return cls(
            pipeline_name=data.get("pipeline_name", "pipeline"),
            steps=steps,
            input_aliases=cls._normalize_alias_keys(
                data.get("input_aliases", {}), ids),
            output_aliases=cls._normalize_alias_keys(
                data.get("output_aliases", {}), ids),
            doc=str(data.get("documentation", data.get("doc", ""))),
        )

    def to_config(self) -> dict:
        """Canonical JSON-serializable dict — the hashable identity of the
        pipeline used by the pipeline-level job cache (``from_config``
        round-trips it).  Deterministic: plain dicts and sorted-key JSON
        hashing downstream make identical pipelines hash identically
        regardless of how they were loaded (file, dict, or object)."""
        return {
            "pipeline_name": self.pipeline_name,
            "doc": self.doc,
            "steps": [
                {
                    "step_id": s.step_id,
                    "module_type": s.module_type,
                    "module_config": dict(s.module_config),
                    "input_links": {
                        f: [f"{r.step_id}.{r.value_name}" for r in refs]
                        for f, refs in s.input_links.items()
                    },
                }
                for s in self.steps
            ],
            "input_aliases": dict(self.input_aliases),
            "output_aliases": dict(self.output_aliases),
        }

    @classmethod
    def from_file(cls, path: str) -> "PipelineConfig":
        with open(path) as f:
            if path.endswith((".yaml", ".yml")):
                try:
                    import yaml  # optional dependency

                    data = yaml.safe_load(f)
                except ImportError as e:  # pragma: no cover
                    raise RuntimeError("pyyaml not available; use JSON pipelines") from e
            else:
                data = json.load(f)
        cfg = cls.from_config(data)
        if cfg.pipeline_name == "pipeline":
            cfg.pipeline_name = path.rsplit("/", 1)[-1].split(".")[0]
        return cfg
