"""Operation registry: named, fully-configured module instances.

Reference: operations are minted from modules by operation types with id
patterns like ``create.<tgt>.from.<src>``, ``<type>_filter.<name>``,
``export.<src>.as.<profile>`` (``src/kiara/operations/included_core_operations/``,
entry points ``pyproject.toml:180-192``).  Here an Operation is simply
``(operation_id, module_type, module_config, doc)``; modules register their
own operation ids at import time, and every module is also runnable by its
bare module name (the reference's ``custom_module`` operation type).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Operation:
    operation_id: str
    module_type: str
    module_config: dict = field(default_factory=dict)
    doc: str = ""
    operation_type: str = "custom_module"


class OperationRegistry:
    def __init__(self, module_registry):
        self._module_registry = module_registry
        self._operations: dict[str, Operation] = {}

    def register(self, op: Operation) -> None:
        self._operations[op.operation_id] = op

    def register_all(self, ops: list[Operation]) -> None:
        for op in ops:
            self.register(op)

    def resolve(self, name: str) -> Operation:
        """Operation id first, bare module type second (reference resolution
        order in ``BaseAPI.queue_job``, ``base_api.py:2994``)."""
        if name in self._operations:
            return self._operations[name]
        if name in self._module_registry:
            return Operation(operation_id=name, module_type=name)
        raise KeyError(f"no operation or module named {name!r}")

    @property
    def operation_ids(self) -> list[str]:
        return sorted(self._operations)

    def by_type(self, operation_type: str) -> list[Operation]:
        return [o for o in self._operations.values() if o.operation_type == operation_type]


# The minting conventions — reference operation types
# (``src/kiara/operations/included_core_operations/`` + ``pipeline.py``),
# each with the id pattern its operations follow.
OPERATION_TYPE_DOCS: dict[str, str] = {
    "custom_module": "A module run under its own name, no id convention.",
    "pipeline": "A pipeline config registered as a runnable operation.",
    "deserialize": "Load persisted/serialized data: `deserialize.<type>.to"
                   "__<profile>` / `load.*`.",
    "extract_metadata": "Profile a value into a metadata dict: "
                        "`extract.<type>.metadata`.",
    "pretty_print": "Human-readable rendering: `pretty_print.<src>.as."
                    "<target>`.",
    "create_from": "Type conversion imports: `create.<tgt>.from.<src>`.",
    "import_data": "Onboard external data: `import.local.file` / "
                   "`import.local.file_bundle`.",
    "export_as": "Persist values to external formats: `export.<src>.as."
                 "<profile>`.",
    "render_value": "Template rendering: `render.<src>.as.<tgt>`.",
    "filter": "Value-preserving row/column filters: `<type>_filter.<name>`.",
}
